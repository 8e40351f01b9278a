"""Truth-table test for the P1 shadow rules (dupion/src/output/groups.rs:4-56).

Hand-computed expectations for every rule over a fixture covering all the
branch-relevant group shapes:

  g1: 2 members, 0 shadowed  (n_visible = 2)
  g2: 2 members, 2 shadowed  (n_visible = 0)
  g3: 2 members, 1 shadowed  (n_visible = 1)   <- the rule-2 special case
  g4: 3 members, 1 shadowed  (n_visible = 2)
  g5: 1 member               (always dropped: groups need > 1 members)

Reference semantics: hide_shadowed = {0: false, 1: nv==0, 2: nv!=1, 3: true};
skip the group when hide_shadowed && nv <= 1; members = visible-only when
hiding, all otherwise.
"""

from __future__ import annotations

import pytest

from dupion_spark.operators.groups import groups_with_shadow_rule

CLUSTERS = [
    ("a", "g1"), ("b", "g1"),
    ("c", "g2"), ("d", "g2"),
    ("e", "g3"), ("f", "g3"),
    ("g", "g4"), ("h", "g4"), ("i", "g4"),
    ("j", "g5"),
]
SHADOWED = {"c", "d", "f", "i"}

# rule -> {cluster_root: expected sorted member list}
EXPECTED = {
    0: {"g1": ["a", "b"], "g2": ["c", "d"], "g3": ["e", "f"], "g4": ["g", "h", "i"]},
    1: {"g1": ["a", "b"], "g3": ["e", "f"], "g4": ["g", "h", "i"]},
    2: {"g1": ["a", "b"], "g3": ["e", "f"], "g4": ["g", "h"]},
    3: {"g1": ["a", "b"], "g4": ["g", "h"]},
}


@pytest.fixture(scope="module")
def tables(spark):
    clusters = spark.createDataFrame(CLUSTERS, "image_id string, cluster_root string")
    shadows = spark.createDataFrame(
        [(m, m in SHADOWED) for m, _ in CLUSTERS], "image_id string, shadowed boolean"
    )
    return clusters.cache(), shadows.cache()


@pytest.mark.parametrize("rule", [0, 1, 2, 3])
def test_shadow_rule_truth_table(tables, rule):
    clusters, shadows = tables
    out = groups_with_shadow_rule(clusters, shadows, rule=rule)
    got = {r["cluster_root"]: sorted(r["members"]) for r in out.collect()}
    assert got == EXPECTED[rule], f"rule {rule}: {got}"


def test_shadow_rule_counts(tables):
    clusters, shadows = tables
    out = {r["cluster_root"]: r for r in groups_with_shadow_rule(clusters, shadows, 0).collect()}
    assert out["g4"]["n_members"] == 3
    assert out["g4"]["n_shadowed"] == 1
    assert out["g4"]["n_visible"] == 2


def test_shadow_rule_rejects_bad_rule(tables):
    clusters, shadows = tables
    with pytest.raises(ValueError):
        groups_with_shadow_rule(clusters, shadows, rule=4)
