"""Parquet footer thrift walk vs pyarrow's OWN metadata API — the
independent-reference pin for the fields no SQL oracle can replay
(byte sizes, codecs), plus fault-contract coverage."""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from quickstart_streaming_agents_spark.operators.parquet_meta import (
    parquet_file_meta,
)


def _write(table: pa.Table, **kw) -> bytes:
    sink = pa.BufferOutputStream()
    pq.write_table(table, sink, **kw)
    return sink.getvalue().to_pybytes()


def _ref(b: bytes):
    return pq.ParquetFile(pa.BufferReader(b)).metadata


@pytest.mark.parametrize("n,rg", [(1, 10), (37, 16), (100, 100), (64, 16)])
def test_footer_matches_pyarrow_metadata(n, rg):
    b = _write(
        pa.table({"id": list(range(n)), "val": [f"v{j}" for j in range(n)],
                  "f": [j * 0.5 for j in range(n)]}),
        row_group_size=rg,
    )
    m = parquet_file_meta(b)
    ref = _ref(b)
    assert m["num_rows"] == ref.num_rows
    assert len(m["row_groups"]) == ref.num_row_groups
    assert m["n_leaf_columns"] == ref.num_columns
    assert m["created_by"] == ref.created_by
    for gi, g in enumerate(m["row_groups"]):
        rref = ref.row_group(gi)
        assert g["num_rows"] == rref.num_rows
        assert g["total_byte_size"] == rref.total_byte_size
        assert g["n_col_chunks"] == rref.num_columns
        assert g["total_compressed_size"] == sum(
            rref.column(c).total_compressed_size
            for c in range(rref.num_columns)
        )


def test_footer_codec_extraction():
    t = pa.table({"x": [1, 2, 3]})
    snappy = parquet_file_meta(_write(t, compression="snappy"))
    none = parquet_file_meta(_write(t, compression="none"))
    gzip = parquet_file_meta(_write(t, compression="gzip"))
    # parquet.thrift CompressionCodec: 0=UNCOMPRESSED, 1=SNAPPY, 2=GZIP
    assert snappy["row_groups"][0]["codecs"] == [1]
    assert none["row_groups"][0]["codecs"] == [0]
    assert gzip["row_groups"][0]["codecs"] == [2]


def test_footer_nested_schema_leaf_count():
    # a struct column contributes its LEAVES, not itself
    t = pa.table({
        "id": [1, 2],
        "s": pa.array([{"a": 1, "b": "x"}, {"a": 2, "b": "y"}],
                      type=pa.struct([("a", pa.int64()), ("b", pa.string())])),
    })
    b = _write(t)
    assert parquet_file_meta(b)["n_leaf_columns"] == _ref(b).num_columns == 3


def test_footer_fault_contract():
    with pytest.raises(ValueError):
        parquet_file_meta(b"not parquet")
    good = _write(pa.table({"x": [1]}))
    with pytest.raises(ValueError):
        parquet_file_meta(good[:-2])  # torn magic
    # footer_len pointing past the payload
    bad = good[-12:]  # len field + PAR1 only, footer bytes missing
    with pytest.raises(ValueError):
        parquet_file_meta(bad)


def test_footer_tail_only_payload_parses():
    """The binaryFile-tail ingest shape: footer+len+magic without the
    data pages still parses (the 100 TB manifest-audit path)."""
    full = _write(pa.table({"x": list(range(20))}), row_group_size=8)
    import struct as st

    (flen,) = st.unpack_from("<I", full, len(full) - 8)
    tail = full[len(full) - 8 - flen :]
    m = parquet_file_meta(tail)
    assert m["num_rows"] == 20
    assert [g["num_rows"] for g in m["row_groups"]] == [8, 8, 4]
