"""Tree output (P2/O3/O4/P4 graft, reference output/tree.rs:26-151).

Hand-computed expectations: child sort (icon_prio ASC, clamped-dups DESC,
size DESC, name ASC), DUPS/UNIQ labels, <=4-member preview, archive
dual-nature 'A' icon, and the nested JSON assembly.
"""

from __future__ import annotations

import json

import pytest

from dupion_spark.operators.rollup import rollup_table
from dupion_spark.operators.tree import assemble_tree_json, tree_rows

# (image_id, byte_len, byte_sha256, pixel_sha256) — d1/d2 share pixels (dup),
# u1..u3 unique. p2's content equals p1's (twin partitions).
HASHES = [
    ("d1", 100, "b1", b"P1"),
    ("d2", 100, "b2", b"P1"),
    ("u1", 500, "b3", b"P3"),
    ("u2", 50, "b4", b"P4"),
    ("u3", 999, "b5", b"P5"),
]
PARTS = [
    ("d1", "pA", "r0"),
    ("u1", "pA", "r1"),
    ("u2", "pA", "r2"),
    ("d2", "pB", "r0"),
    ("u3", "pC", "r0"),
]


@pytest.fixture(scope="module")
def rows(spark):
    hashes = spark.createDataFrame(
        HASHES, "image_id string, byte_len long, byte_sha256 string, pixel_sha256 binary"
    )
    parts = spark.createDataFrame(PARTS, "image_id string, part_key string, rel_name string")
    roll = rollup_table(hashes, parts)
    return tree_rows(hashes, parts, roll).cache()


def test_file_child_sort_dups_first_then_size(rows):
    got = {
        r["name"]: (r["child_rank"], r["label"])
        for r in rows.filter("parent = 'pA'").collect()
    }
    # d1 is duplicated (clamp 2) -> first despite u1 being 5x larger;
    # u1 (500) then u2 (50) by size desc
    assert got["r0"][0] == 1 and got["r0"][1] == "DUPS F r0 100"
    assert got["r1"][0] == 2 and got["r1"][1] == "UNIQ F r1 500"
    assert got["r2"][0] == 3 and got["r2"][1] == "UNIQ F r2 50"


def test_dup_preview_lists_group_members(rows):
    r0 = rows.filter("parent = 'pA' and name = 'r0'").collect()[0]
    assert r0["preview"] == "d1;d2"
    u1 = rows.filter("parent = 'pA' and name = 'r1'").collect()[0]
    assert u1["preview"] == ""


def test_dir_nodes_rank_under_root(rows):
    dirs = {r["name"]: r for r in rows.filter("parent = ''").collect()}
    assert set(dirs) == {"pA", "pB", "pC"}
    assert all(r["icon"] == "D" and r["icon_prio"] == 0 for r in dirs.values())
    # pA and pB are NOT rollup twins (different member sets); every partition
    # here is unique at the rollup level except none — check dups fields
    assert dirs["pA"]["dups"] == 1
    # sort under root: all prio 0, all unique -> size desc (pA=650, pC=999, pB=100)
    assert dirs["pC"]["child_rank"] == 1  # 999
    assert dirs["pA"]["child_rank"] == 2  # 650
    assert dirs["pB"]["child_rank"] == 3  # 100


def test_archive_gets_dual_nature_icon(spark):
    hashes = spark.createDataFrame(
        [("arc", 10, "ba", b"PA"), ("arc/m0", 20, "bm", b"PM")],
        "image_id string, byte_len long, byte_sha256 string, pixel_sha256 binary",
    )
    parts = spark.createDataFrame(
        [("arc/m0", "arc", "m0")], "image_id string, part_key string, rel_name string"
    )
    roll = rollup_table(hashes, parts)
    dirs = tree_rows(hashes, parts, roll).filter("parent = ''").collect()
    assert len(dirs) == 1
    assert dirs[0]["icon"] == "A" and dirs[0]["icon_prio"] == 1


def test_assemble_tree_json_nests_and_expands(rows):
    doc = json.loads(assemble_tree_json(rows))
    # root keys are the three partition labels
    labels = sorted(doc)
    assert any(k.startswith("UNIQ D pA") for k in labels)
    pa = next(v for k, v in doc.items() if "pA" in k)
    dup_key = next(k for k in pa if k.startswith("DUPS"))
    assert pa[dup_key] == {"d1": " ", "d2": " "}
