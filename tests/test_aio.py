"""Async API variants (aio.py) — the reference's async_collect/async_freeze
surface (crates/python/python/cryo/_collect.py:53-143)."""

from __future__ import annotations

import asyncio

import pytest

import cryo_spark
from cryo_spark import aio


@pytest.fixture(scope="module")
def frozen(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("aio")
    src = str(base / "in.parquet")
    cryo_spark.write_sequences(src, n=1_000, seed=5)
    out = str(base / "out")
    stats = asyncio.run(
        aio.async_freeze(spark, src, out, target_tokens=50_000))
    assert stats["n_encoded"] > 0 and stats["n_failed"] == 0
    return src, out


def test_async_freeze_then_collect_spark(spark, frozen):
    src, out = frozen
    df = asyncio.run(aio.async_collect(spark, out))
    assert df.count() == 1_000


def test_async_collect_formats(spark, frozen):
    _, out = frozen

    async def run():
        pdf = await aio.async_collect(spark, out, output_format="pandas")
        rows = await aio.async_collect(spark, out, output_format="list")
        cols = await aio.async_collect(spark, out, output_format="dict")
        tbl = await aio.async_collect(spark, out, output_format="arrow")
        return pdf, rows, cols, tbl

    pdf, rows, cols, tbl = asyncio.run(run())
    assert len(pdf) == len(rows) == tbl.num_rows == 1_000
    assert sorted(cols) == sorted(pdf.columns)
    assert len(cols["doc_id"]) == 1_000
    assert rows[0].keys() == cols.keys()


def test_async_collect_concurrent(spark, frozen):
    """Two awaits interleave on one loop — the non-blocking property the
    async surface exists for."""
    _, out = frozen

    async def run():
        a, b = await asyncio.gather(
            aio.async_collect(spark, out, output_format="pandas"),
            aio.async_collect(spark, out, output_format="pandas"),
        )
        return a, b

    a, b = asyncio.run(run())
    assert len(a) == len(b) == 1_000


def test_async_encode_decode_roundtrip(spark, frozen):
    src, _ = frozen

    async def run():
        df = spark.read.parquet(src)
        enc = await aio.async_encode(df, target_tokens=50_000)
        dec = await aio.async_decode(enc)
        return dec.count()

    assert asyncio.run(run()) == 1_000


def test_bad_format_rejected(spark, frozen):
    _, out = frozen
    with pytest.raises(ValueError, match="unknown output format"):
        asyncio.run(aio.async_collect(spark, out, output_format="polars"))
