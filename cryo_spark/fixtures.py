"""Deterministic synthetic `sequences` table generator — FIXTURES.md §1.

Input shape mandated by BASELINE.json:input_hint:
  (doc_id: string, tokens: array<int32>, n_tok: int32, source: string)

All generation is seeded numpy (seed=42 default); no external data. The
edge-case rows required by FIXTURES.md are injected at fixed doc indices
so every codec branch is exercised at every scale.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

VOCAB = 50_257
SOURCES = ["web", "code", "books", "wiki", "chat"]
SOURCE_PROBS = [0.62, 0.18, 0.10, 0.06, 0.04]

SCHEMA = pa.schema(
    [
        pa.field("doc_id", pa.string(), nullable=False),
        pa.field("tokens", pa.list_(pa.int32()), nullable=False),
        pa.field("n_tok", pa.int32(), nullable=False),
        pa.field("source", pa.string(), nullable=False),
    ]
)


def generate_sequences(n: int, seed: int = 42, id_offset: int = 0) -> pa.Table:
    """Build the synthetic table fully vectorized; deterministic for
    (n, seed, id_offset).

    ``id_offset`` shifts the doc_id range to [id_offset, id_offset+n) so
    independently generated shards compose into one table with globally
    unique keys (the 10x disk-proof input is built this way — each
    shard's token stream derives from its own seed, and per-shard token
    totals stay below the int32 offset ceiling).
    """
    rng = np.random.default_rng(seed)
    # lengths: clipped lognormal around ~200 tokens
    lengths = np.clip(
        rng.lognormal(mean=np.log(200), sigma=1.0, size=n).astype(np.int64), 1, 4096
    )
    source_idx = rng.choice(len(SOURCES), size=n, p=SOURCE_PROBS)

    # ----- edge-case rows at fixed indices (if n large enough) ---------------
    # i % 1000 == 0 -> length-1; ==1 -> all-equal; ==2 -> strictly increasing;
    # ==3 -> contains 0 and 2^31-1; ==4 -> vocab<=16; ==5 -> high-entropy uniform
    marks = np.arange(n) % 1000
    lengths[marks == 0] = 1
    lengths[marks == 3] = np.maximum(lengths[marks == 3], 4)

    total = int(lengths.sum())
    # zipfian token stream over the vocab
    flat = (rng.zipf(1.2, total) % VOCAB).astype(np.int32)

    ends = np.cumsum(lengths)
    starts = ends - lengths

    def fill(rows: np.ndarray, maker) -> None:
        for r in rows:
            s, e = int(starts[r]), int(ends[r])
            flat[s:e] = maker(e - s, r)

    fill(np.flatnonzero(marks == 1), lambda ln, r: np.full(ln, r % VOCAB, np.int32))
    fill(np.flatnonzero(marks == 2), lambda ln, r: (np.arange(ln) + r) % (2**31 - 1))
    fill(
        np.flatnonzero(marks == 3),
        lambda ln, r: np.concatenate(
            ([0, 2**31 - 1], (np.arange(ln - 2) + r) % VOCAB)
        ).astype(np.int32),
    )
    fill(np.flatnonzero(marks == 4), lambda ln, r: (np.arange(ln) * (r + 1)) % 16)
    fill(
        np.flatnonzero(marks == 5),
        lambda ln, r: np.random.default_rng(r).integers(0, 2**31 - 1, ln, dtype=np.int32),
    )

    doc_ids = pa.array(
        [f"doc-{i:012d}" for i in range(id_offset, id_offset + n)],
        type=pa.string())
    offsets = np.zeros(n + 1, dtype=np.int32)
    np.cumsum(lengths, out=offsets[1:])
    tokens = pa.ListArray.from_arrays(pa.array(offsets), pa.array(flat, type=pa.int32()))
    n_tok = pa.array(lengths.astype(np.int32), type=pa.int32())
    source = pa.array([SOURCES[i] for i in source_idx], type=pa.string())
    return pa.table(
        {"doc_id": doc_ids, "tokens": tokens, "n_tok": n_tok, "source": source},
        schema=SCHEMA,
    )


def write_sequences(path: str, n: int, seed: int = 42, shards: int = 1) -> str:
    """Write the synthetic table as parquet (snappy; the *input*, not the ref).

    Small row groups so a distributed scan can split the file — a single
    row group would serialize the whole read into one Spark task. With
    ``shards`` > 1, writes a directory of that many files (the shape a
    real distributed ingest produces) so scan parallelism is file-level.
    """
    table = generate_sequences(n, seed)
    if shards <= 1:
        pq.write_table(table, path, compression="snappy", row_group_size=8192)
        return path
    import os

    os.makedirs(path, exist_ok=True)
    step = (n + shards - 1) // shards
    for i in range(shards):
        part = table.slice(i * step, step)
        if part.num_rows:
            pq.write_table(
                part,
                f"{path}/part-{i:05d}.parquet",
                compression="snappy",
                row_group_size=8192,
            )
    return path


def generate_sequences_skewed(n: int, seed: int = 42, alpha: float = 1.5,
                              heavy_share: float = 0.8,
                              heavy_source: str = "web",
                              lengths_model: str = "zipf",
                              id_offset: int = 0) -> pa.Table:
    """Adversarial-skew variant (r3 verdict item 6): one source holds
    ``heavy_share`` of the TOKEN MASS and doc lengths are Zipf-``alpha``
    (or the main fixture's lognormal with ``lengths_model='lognormal'``
    — the shape used for the SCALING run on skewed input, where the
    corpus must still reach ~2B tokens at 6.4M docs).

    Same schema/id format as generate_sequences so it drops into every
    layout/freeze path. Construction: lengths clipped to [1, 4096],
    source draw per SOURCE_PROBS, then the heavy source's lengths are
    scaled so its token share hits ~heavy_share (re-clipped, so the
    achieved share is asserted by the tests, not assumed).
    Deterministic for (n, seed, alpha, heavy_share, id_offset).
    """
    rng = np.random.default_rng(seed)
    if lengths_model == "lognormal":
        lengths = np.clip(
            rng.lognormal(mean=np.log(200), sigma=1.0, size=n)
            .astype(np.int64), 1, 4096)
    else:
        lengths = np.clip(rng.zipf(alpha, n).astype(np.int64), 1, 4096)
    source_idx = rng.choice(len(SOURCES), size=n, p=SOURCE_PROBS)
    heavy = source_idx == SOURCES.index(heavy_source)
    # iterate: the 4096 clip truncates the scaled tail, so one scaling
    # pass undershoots the share; a few deterministic passes converge
    for _ in range(6):
        h_sum, o_sum = int(lengths[heavy].sum()), int(lengths[~heavy].sum())
        if not (h_sum and o_sum):
            break
        if h_sum >= heavy_share / (1 - heavy_share) * o_sum:
            break
        want = heavy_share / (1 - heavy_share) * o_sum
        lengths[heavy] = np.clip(
            (lengths[heavy] * (want / h_sum)).astype(np.int64), 1, 4096)
    total = int(lengths.sum())
    flat = (rng.zipf(1.2, total) % VOCAB).astype(np.int32)
    doc_ids = pa.array(
        [f"doc-{i:012d}" for i in range(id_offset, id_offset + n)],
        type=pa.string())
    offsets = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(lengths, out=offsets[1:])
    tokens = pa.LargeListArray.from_arrays(
        pa.array(offsets, type=pa.int64()), pa.array(flat, type=pa.int32())
    ).cast(pa.list_(pa.int32()))
    return pa.table(
        {"doc_id": doc_ids, "tokens": tokens,
         "n_tok": pa.array(lengths.astype(np.int32), type=pa.int32()),
         "source": pa.array([SOURCES[i] for i in source_idx],
                            type=pa.string())},
        schema=SCHEMA,
    )


def write_sequences_skewed(path: str, n: int, seed: int = 42,
                           alpha: float = 1.5, heavy_share: float = 0.8,
                           shards: int = 1) -> str:
    table = generate_sequences_skewed(n, seed, alpha, heavy_share)
    if shards <= 1:
        pq.write_table(table, path, compression="snappy",
                       row_group_size=8192)
        return path
    import os

    os.makedirs(path, exist_ok=True)
    step = (n + shards - 1) // shards
    for i in range(shards):
        part = table.slice(i * step, step)
        if part.num_rows:
            pq.write_table(part, f"{path}/part-{i:05d}.parquet",
                           compression="snappy", row_group_size=8192)
    return path


def _write_big_shard(args: tuple) -> int:
    path, i, n_i, seed, id_offset, variant = args
    if variant == "skewed":
        part = generate_sequences_skewed(
            n_i, seed=seed + i, lengths_model="lognormal",
            id_offset=id_offset)
    else:
        part = generate_sequences(n_i, seed=seed + i, id_offset=id_offset)
    pq.write_table(part, f"{path}/part-{i:05d}.parquet",
                   compression="snappy", row_group_size=8192)
    return int(part.column("n_tok").to_numpy().sum())


def write_sequences_big(path: str, n: int, seed: int = 42,
                        shards: int = 64, processes: int = 16,
                        variant: str = "standard") -> int:
    """Multi-process sharded generator for inputs too big for one table.

    Composes ``shards`` independently seeded shards (seed+i, disjoint
    id_offset ranges) into one parquet directory — deterministic for
    (n, seed, shards), any process count. Returns total tokens. Exists
    for the 10x disk-backed scale proof: a single generate_sequences
    call at 60M docs would hold ~80 GB in one arrow table and overflow
    its int32 list offsets.
    """
    import multiprocessing as mp
    import os

    os.makedirs(path, exist_ok=True)
    step = (n + shards - 1) // shards
    jobs = []
    for i in range(shards):
        n_i = min(step, n - i * step)
        if n_i > 0:
            jobs.append((path, i, n_i, seed, i * step, variant))
    with mp.get_context("spawn").Pool(processes) as pool:
        totals = pool.map(_write_big_shard, jobs)
    return int(sum(totals))


def reference_zstd_bytes(table: pa.Table, path: str) -> int:
    """Size of the cryo-equivalent output: parquet+zstd of the payload columns.

    The reference delegates compression to the parquet writer with a
    codec flag (/root/reference/crates/cli/src/parse/file_output.rs:124-130);
    zstd is its strongest menu entry — this is the byte budget our
    engine's total enc_bytes must not exceed (FIXTURES.md §3).
    """
    import os

    pq.write_table(table.select(["tokens", "n_tok", "source"]), path, compression="zstd")
    return os.path.getsize(path)


# ---------------------------------------------------------------------------
# embeddings table (TESTDATA.md shape: vec_id int64, embedding list<float32>,
# label int32) — the second table family the engine freezes (tablespec.py)
# ---------------------------------------------------------------------------

EMBEDDINGS_SCHEMA = pa.schema(
    [
        pa.field("vec_id", pa.int64(), nullable=False),
        pa.field("embedding", pa.list_(pa.float32()), nullable=False),
        pa.field("label", pa.int32(), nullable=False),
    ]
)


def generate_embeddings(n: int, dim: int = 32, seed: int = 7) -> pa.Table:
    """Deterministic embeddings table; exercises both float codec shapes.

    Every 3rd vector is quantized to 3 decimals (the ALP-friendly case);
    the rest stay full-precision normals (the byte-plane/fbss case).
    Finite values only, so Spark-side equality joins are exact on bits.
    """
    rng = np.random.default_rng(seed)
    flat = rng.standard_normal(n * dim).astype(np.float32)
    quant_rows = np.arange(n) % 3 == 0
    q = np.repeat(quant_rows, dim)
    flat[q] = np.round(flat[q] * 1000) / np.float32(1000)
    offsets = np.arange(0, (n + 1) * dim, dim, dtype=np.int32)
    emb = pa.ListArray.from_arrays(
        pa.array(offsets), pa.array(flat, type=pa.float32())
    )
    return pa.table(
        {
            "vec_id": pa.array(np.arange(n, dtype=np.int64) * 7 + 3),
            "embedding": emb,
            "label": pa.array(
                rng.integers(0, 20, n).astype(np.int32), type=pa.int32()
            ),
        },
        schema=EMBEDDINGS_SCHEMA,
    )


def write_embeddings(path: str, n: int, dim: int = 32, seed: int = 7) -> str:
    pq.write_table(generate_embeddings(n, dim, seed), path,
                   compression="snappy", row_group_size=4096)
    return path
