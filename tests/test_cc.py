"""Connected-components correctness on one combined graph.

All shapes are packed into a single disjoint edge list so the iterative
algorithm runs ONCE (each star round costs seconds of Spark job overhead
locally): a long chain (the chain-link shape hot LSH buckets emit — must
converge in O(log n) rounds), a star, a triangle component, duplicate +
reversed edges, and self-loops."""

from dupion_spark.operators.connected_components import (
    attach_singletons,
    connected_components,
)

CHAIN = [(f"c{i:03d}", f"c{i + 1:03d}") for i in range(8)]
STAR = [("hub", f"leaf{i}") for i in range(8)]
TRIANGLE = [("t_a", "t_b"), ("t_b", "t_c"), ("t_a", "t_c")]
MESSY = [("m_b", "m_a"), ("m_a", "m_b"), ("m_b", "m_a"), ("m_a", "m_a")]
EDGES = CHAIN + STAR + TRIANGLE + MESSY


def test_combined_graph(spark):
    df = spark.createDataFrame(EDGES, "id_l string, id_r string")
    nodes = spark.createDataFrame(
        [(n,) for n in {x for e in EDGES for x in e} | {"solo1", "solo2"}],
        "image_id string",
    )
    assign = {
        r["image_id"]: r["cluster_root"]
        for r in attach_singletons(connected_components(df), nodes).collect()
    }
    # chain: all 9 nodes collapse to the minimum in O(log n) rounds
    chain_nodes = {f"c{i:03d}" for i in range(9)}
    assert {assign[n] for n in chain_nodes} == {"c000"}
    # star
    star_nodes = {"hub"} | {f"leaf{i}" for i in range(8)}
    assert len({assign[n] for n in star_nodes}) == 1
    # triangle
    assert assign["t_a"] == assign["t_b"] == assign["t_c"] == "t_a"
    # duplicate/reversed/self-loop edges
    assert assign["m_a"] == assign["m_b"] == "m_a"
    # components stay separate
    roots = {assign["c000"], assign["hub"], assign["t_a"], assign["m_a"]}
    assert len(roots) == 4
    # singletons are their own clusters
    assert assign["solo1"] == "solo1" and assign["solo2"] == "solo2"
    # total coverage
    assert len(assign) == len(nodes.collect())
