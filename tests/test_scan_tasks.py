"""Scan-task planning units (no Spark): packing, spanning, estimates."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from cryo_spark.sources import column_values, pack_tasks, scan_meta


def test_pack_tasks_spans_files():
    # 6 files of 3 row groups x 10 bytes; target 45 -> tasks cross files
    meta = [(f"f{i}", [10, 10, 10]) for i in range(6)]
    tasks = pack_tasks(meta, 45)
    total_rgs = sum(sum(c) for _, _, c in tasks)
    assert total_rgs == 18
    assert len(tasks) == 4  # 180 bytes / 45
    # a task holds segments from more than one file
    assert any(len(paths) > 1 for paths, _, _ in tasks)
    # coverage: every (file, rg) exactly once
    seen = set()
    for paths, starts, counts in tasks:
        for p, s, c in zip(paths, starts, counts):
            for rg in range(s, s + c):
                assert (p, rg) not in seen
                seen.add((p, rg))
    assert len(seen) == 18


def test_pack_tasks_splits_large_file():
    meta = [("big", [30] * 10)]
    tasks = pack_tasks(meta, 60)
    assert len(tasks) == 5
    assert all(p == ["big"] for p, _, _ in tasks)


@pytest.mark.parametrize("target", [1, 7, 10, 29, 30, 31, 1000])
def test_pack_tasks_total_coverage(target):
    meta = [("a", [3, 7, 2]), ("b", [9]), ("c", [1, 1, 1, 1])]
    tasks = pack_tasks(meta, target)
    got = sorted(
        (p, s + i)
        for paths, starts, counts in tasks
        for p, s, c in zip(paths, starts, counts)
        for i in range(c)
    )
    assert got == sorted((f, rg) for f, szs in meta for rg in range(len(szs)))


def test_scan_meta_and_column_bytes(tmp_path):
    t = pa.table({
        "doc_id": pa.array([f"doc-{i:012d}" for i in range(100)]),
        "tokens": pa.array([list(range(i % 7 + 1)) for i in range(100)],
                           type=pa.list_(pa.int32())),
        "n_tok": pa.array(np.arange(100) % 7 + 1, pa.int32()),
    })
    p = str(tmp_path / "t.parquet")
    pq.write_table(t, p, row_group_size=32)
    meta = scan_meta(p)
    assert len(meta) == 1 and len(meta[0][1]) == 4  # 100/32 -> 4 row groups
    n_values = int((np.arange(100) % 7 + 1).sum())
    assert column_values(p, "tokens") == n_values  # exact, from footers
    assert column_values(p, "n_tok") == 100
