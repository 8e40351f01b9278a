"""Page-selective parquet reads (functions/pagegather): byte-for-byte
equivalence vs pyarrow on every supported shape, material decompress savings
on sparse gathers, and hard fallback triggers outside the envelope.

No Spark needed — the module is pure file-format code.
"""

from __future__ import annotations

import random

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from dupion_spark.functions.pagegather import (
    GatherStats,
    Unsupported,
    read_binary_rows,
)


def _write(tmp_path, table, name="t.parquet", **kw):
    path = str(tmp_path / name)
    pq.write_table(table, path, **kw)
    return path


def _blob_table(n=400, blob=2000, nulls=False, seed=0):
    rng = random.Random(seed)
    vals = [
        None if nulls and i % 17 == 0
        else bytes(rng.getrandbits(8) for _ in range(blob))
        for i in range(n)
    ]
    return pa.table({"bytes": pa.array(vals, type=pa.binary())})


def _check_equiv(path, column="bytes", positions=None, rg=0):
    pf = pq.ParquetFile(path)
    n = pf.metadata.row_group(rg).num_rows
    if positions is None:
        positions = sorted(random.Random(7).sample(range(n), min(9, n)))
    st = GatherStats()
    # cap 1.0: equivalence tests exercise the page path even at densities the
    # production default would hand to the pyarrow fallback
    got = read_binary_rows(path, rg, column, positions, st,
                           max_page_fraction=1.0)
    ref = (
        pf.read_row_group(rg, columns=[column])
        .column(column)
        .take(pa.array(positions, type=pa.int64()))
        .to_pylist()
    )
    norm = [
        None if g is None else (g if isinstance(r, bytes) else g.decode())
        for g, r in zip(got, ref)
    ]
    assert norm == ref
    return st


@pytest.mark.parametrize("codec", ["snappy", "zstd", "gzip", "none"])
def test_plain_multi_page_codecs(tmp_path, codec):
    path = _write(
        tmp_path, _blob_table(), use_dictionary=False, write_batch_size=32,
        data_page_size=16 * 1024, compression=codec,
    )
    st = _check_equiv(path)
    assert st.pages_total > 10
    # 9 positions can touch at most 9 pages
    assert st.pages_read <= 9
    assert st.bytes_read < st.bytes_total * 0.85


def test_nullable_plain(tmp_path):
    path = _write(
        tmp_path, _blob_table(nulls=True), use_dictionary=False,
        data_page_size=16 * 1024, write_batch_size=32,
    )
    # hit both null and non-null positions explicitly
    _check_equiv(path, positions=[0, 17, 34, 35, 399])


def test_dictionary_encoded(tmp_path):
    # few distinct values -> stays dictionary-encoded; reader must pull the
    # dict page and decode RLE indices
    vals = [b"alpha", b"beta", b"gamma", None] * 100
    t = pa.table({"bytes": pa.array(vals, type=pa.binary())})
    path = _write(tmp_path, t, data_page_size=4 * 1024, write_batch_size=32)
    _check_equiv(path, positions=[0, 1, 3, 201, 399])


def test_string_column(tmp_path):
    t = pa.table({"s": pa.array([f"row-{i}" * 7 for i in range(300)])})
    path = _write(tmp_path, t, use_dictionary=False, data_page_size=4 * 1024,
                  write_batch_size=32)
    _check_equiv(path, column="s")


def test_multi_row_group(tmp_path):
    path = _write(
        tmp_path, _blob_table(n=600), use_dictionary=False,
        data_page_size=16 * 1024, row_group_size=200, write_batch_size=32,
    )
    for rg in range(3):
        _check_equiv(path, rg=rg)


def test_sparse_gather_savings(tmp_path):
    """The whole point: 2 rows out of 400 should decompress ~2 pages, not the
    chunk."""
    path = _write(
        tmp_path, _blob_table(), use_dictionary=False, data_page_size=16 * 1024,
        write_batch_size=32,
    )
    st = GatherStats()
    read_binary_rows(path, 0, "bytes", [5, 390], st)
    assert st.pages_read <= 2
    # 2 of 13 pages (page size floors at the 32-value batch granularity)
    assert st.bytes_read <= st.bytes_total * 0.25


def test_dense_positions_defer_to_fallback(tmp_path):
    """When candidates cover most pages the selective walk is pure overhead
    vs pyarrow's C++ whole-chunk read — dense requests must raise Unsupported
    so the caller's fallback path takes over."""
    path = _write(
        tmp_path, _blob_table(), use_dictionary=False, data_page_size=16 * 1024,
        write_batch_size=32,
    )
    with pytest.raises(Unsupported, match="dense"):
        read_binary_rows(path, 0, "bytes", list(range(0, 400, 2)))
    # an explicit cap of 1.0 keeps the page path available for equivalence runs
    got = read_binary_rows(path, 0, "bytes", list(range(0, 400, 2)),
                           max_page_fraction=1.0)
    assert len(got) == 200


def test_duplicate_and_unsorted_positions(tmp_path):
    path = _write(tmp_path, _blob_table(n=50), use_dictionary=False)
    got = read_binary_rows(path, 0, "bytes", [9, 3, 9, 0],
                           max_page_fraction=1.0)
    ref = (
        pq.ParquetFile(path).read_row_group(0).column("bytes")
        .take(pa.array([9, 3, 9, 0])).to_pylist()
    )
    assert got == ref


def test_fallback_v2_pages(tmp_path):
    path = _write(
        tmp_path, _blob_table(n=50), use_dictionary=False,
        data_page_version="2.0",
    )
    with pytest.raises(Unsupported):
        read_binary_rows(path, 0, "bytes", [1])


def test_fallback_non_byte_array(tmp_path):
    t = pa.table({"x": pa.array(range(100), type=pa.int64())})
    path = _write(tmp_path, t)
    with pytest.raises(Unsupported):
        read_binary_rows(path, 0, "x", [1])


def test_fallback_missing_column(tmp_path):
    path = _write(tmp_path, _blob_table(n=10))
    with pytest.raises(Unsupported):
        read_binary_rows(path, 0, "nope", [1])


def test_random_positions_property(tmp_path):
    rng = random.Random(123)
    path = _write(
        tmp_path, _blob_table(n=777, blob=300, nulls=True, seed=3),
        use_dictionary=False, data_page_size=8 * 1024, row_group_size=300,
        write_batch_size=32,
    )
    pf = pq.ParquetFile(path)
    for trial in range(20):
        rg = rng.randrange(pf.metadata.num_row_groups)
        n = pf.metadata.row_group(rg).num_rows
        positions = [rng.randrange(n) for _ in range(rng.randrange(1, 12))]
        got = read_binary_rows(path, rg, "bytes", positions,
                               max_page_fraction=1.0)
        ref = (
            pf.read_row_group(rg, columns=["bytes"]).column("bytes")
            .take(pa.array(positions, type=pa.int64())).to_pylist()
        )
        assert got == ref, f"trial {trial} rg {rg}"
