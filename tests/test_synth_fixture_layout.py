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
