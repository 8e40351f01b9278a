"""The scaling-fixture writer must produce parquet the page-selective verify
gather can exploit: no dictionary encoding on the blob column and pages of at
most a few rows. parquet-mr only *checks* the page-size budget every
`parquet.page.size.row.check.min` records (default 100), so without the
explicit row-check options every page held ~100 blobs (~4.5 MB) and ANY
realistic candidate density covered ~every page — the gather's density
cutoff then (correctly) routed 100% of row groups to whole-chunk fallback
and the fast path never engaged (round-4 verdict finding #2).
"""

from __future__ import annotations

import glob
import os

import pyarrow.parquet as pq

from dupion_spark.functions.pagegather import GatherStats, read_binary_rows
from dupion_spark.sources.synth_spark import generate_scaling_fixture


def test_fixture_pages_are_gatherable(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("fixture") / "imgs")
    df = generate_scaling_fixture(spark, out, 1500)
    assert df.count() == 1500

    files = sorted(glob.glob(out + "/*.parquet"))
    assert files
    # the largest file: files-per-write (and so pages-per-file) follows the
    # session's task split, and a tiny file can hold too few pages for the
    # selectivity assertions below to be non-vacuous
    f = max(files, key=os.path.getsize)
    pf = pq.ParquetFile(f)
    col = pf.metadata.row_group(0).column(1)
    assert col.path_in_schema == "bytes"
    assert "PLAIN_DICTIONARY" not in col.encodings
    assert "RLE_DICTIONARY" not in col.encodings

    n = pf.metadata.row_group(0).num_rows
    st = GatherStats()
    got = read_binary_rows(f, 0, "bytes", [0, n - 1], st)
    assert len(got) == 2 and all(isinstance(b, bytes) for b in got)
    # pages hold a handful of blobs, not ~100: the row-check options are live
    assert n / st.pages_total <= 32
    # and a 2-row gather is page-SELECTIVE: at most the 2 pages holding the
    # requested rows are decompressed, and bytes follow the touched-page
    # share of the chunk (a fixed fraction would be parallelism-dependent —
    # this failed at 4 pages/file where 2 touched pages are 46% of bytes)
    assert st.pages_read <= 2 < st.pages_total
    assert st.bytes_read <= st.bytes_total * (st.pages_read / st.pages_total) * 1.6


def test_append_delta_extends_sequence_without_touching_existing(
    spark, tmp_path_factory
):
    """append_scaling_delta is the daily-append input shape for the
    incremental-resume demo: rows [start, start+n) of the SAME deterministic
    sequence land in NEW part files, existing part files keep their
    (size, mtime_ns) fingerprints — the exact per-file validity the per-row
    resume (pipeline._features) keys row reuse on."""
    from dupion_spark.sources.checkpoint import file_fingerprints
    from dupion_spark.sources.synth_spark import append_scaling_delta

    out = str(tmp_path_factory.mktemp("fixture") / "imgs")
    generate_scaling_fixture(spark, out, 300)
    before = file_fingerprints(out)

    append_scaling_delta(spark, out, 300, 100)
    after = file_fingerprints(out)

    # every pre-existing file is byte- and mtime-identical
    assert all(after[f] == fp for f, fp in before.items())
    new_files = set(after) - set(before)
    assert new_files

    df = spark.read.parquet(out)
    ids = [r["image_id"] for r in df.select("image_id").collect()]
    assert len(ids) == 400 and len(set(ids)) == 400
    assert sorted(ids) == [f"s{i:010d}" for i in range(400)]

    # delta rows are the same rows a from-scratch 400-row fixture generates
    # (content depends only on (seed, i), never on which write emitted it)
    ref_dir = str(tmp_path_factory.mktemp("fixture_ref") / "imgs")
    ref = generate_scaling_fixture(spark, ref_dir, 400)
    got = {r["image_id"]: r for r in df.collect()}
    want = {r["image_id"]: r for r in ref.collect()}
    assert all(
        got[k]["bytes"] == want[k]["bytes"]
        and got[k]["caption"] == want[k]["caption"]
        and got[k]["phash"] == want[k]["phash"]
        for k in want
    )
