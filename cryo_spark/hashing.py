"""Vectorized 64-bit string hashing shared by planner and encode kernels.

The chunk layout needs ONE hash of ``doc_id`` computed identically in
two places: the driver-side histogram pass and the executor-side
assignment kernel (layout.py). Both run the same numpy kernel below, so
no JVM hash function is involved and the bucket of a row is a pure
function of its bytes — parallelism-invariant (FIXTURES.md §4), the
property the reference gets from hashing nothing at all (its chunks are
key ranges, /root/reference/crates/freeze/src/types/chunks/number_chunk.rs:92-106).

The function is an xxhash/murmur-style word-wise mix: strings are
zero-padded into an (n, n_words) little-endian uint64 matrix, folded
word-by-word (the Python-level loop is over ``ceil(max_len/8)``
iterations, not rows), then finalized with an avalanche. Quality needs
are bucketing-grade, not cryptographic.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

_P1 = np.uint64(0x9E3779B185EBCA87)
_P2 = np.uint64(0xC2B2AE3D27D4EB4F)
_P3 = np.uint64(0x165667B19E3779F9)


def _rotl(v: np.ndarray, r: int) -> np.ndarray:
    r_ = np.uint64(r)
    inv = np.uint64(64 - r)
    return (v << r_) | (v >> inv)


def hash_utf8(arr: pa.Array | pa.ChunkedArray, seed: int = 0) -> np.ndarray:
    """Hash each utf8 string to uint64; vectorized, no per-row Python."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    if arr.type != pa.string():
        arr = arr.cast(pa.string())
    n = len(arr)
    if n == 0:
        return np.empty(0, dtype=np.uint64)
    off = arr.offset
    offsets = np.frombuffer(arr.buffers()[1], dtype=np.int32)[off : off + n + 1]
    data = np.frombuffer(arr.buffers()[2], dtype=np.uint8)
    lengths = np.diff(offsets).astype(np.int64)
    max_len = int(lengths.max()) if n else 0
    n_words = max(1, (max_len + 7) // 8)

    padded = np.zeros(n * n_words * 8, dtype=np.uint8)
    total = int(offsets[-1] - offsets[0])
    if total:
        starts = (offsets[:-1] - offsets[0]).astype(np.int64)
        row = np.repeat(np.arange(n, dtype=np.int64) * (n_words * 8), lengths)
        intra = np.arange(total, dtype=np.int64) - np.repeat(starts, lengths)
        padded[row + intra] = data[offsets[0] : offsets[-1]]
    words = padded.view("<u8").reshape(n, n_words)

    with np.errstate(over="ignore"):
        h = np.full(n, np.uint64(seed) * _P1 ^ _P2, dtype=np.uint64)
        for i in range(n_words):
            # Only rows whose bytes actually extend into word i take this
            # mix step; otherwise the hash of a string would depend on the
            # longest string in its batch (planner and executor batch rows
            # differently, so that would break the parallelism-invariance
            # contract the whole chunk layout rests on).
            mixed = _rotl(h ^ (words[:, i] * _P1), 31) * _P2
            h = np.where(lengths > 8 * i, mixed, h)
        h ^= np.uint64(0x165667B19E3779F9) + lengths.astype(np.uint64)
        # avalanche (xxhash64 finalizer)
        h ^= h >> np.uint64(33)
        h *= _P2
        h ^= h >> np.uint64(29)
        h *= _P3
        h ^= h >> np.uint64(32)
    return h


def bucket_of(arr: pa.Array | pa.ChunkedArray, n_buckets: int, seed: int = 0) -> np.ndarray:
    """Stable bucket in [0, n_buckets) per string."""
    return (hash_utf8(arr, seed=seed) % np.uint64(n_buckets)).astype(np.int64)


def murmur3_int32(x: np.ndarray, seed: int = 42) -> np.ndarray:
    """Spark-compatible Murmur3_x86_32 of int32 values (F.hash / HashPartitioning).

    Bit-exact with Catalyst's ``Murmur3Hash`` on IntegerType (verified
    against ``F.hash`` and ``spark_partition_id``), which lets the
    planner *invert* Spark's shuffle placement — see partition_keys().
    """

    def rotl(v: np.ndarray, r: int) -> np.ndarray:
        return (v << np.uint32(r)) | (v >> np.uint32(32 - r))

    with np.errstate(over="ignore"):
        k = x.astype(np.uint32) * np.uint32(0xCC9E2D51)
        k = rotl(k, 15) * np.uint32(0x1B873593)
        h = np.uint32(seed) ^ k
        h = rotl(h, 13) * np.uint32(5) + np.uint32(0xE6546B64)
        h ^= np.uint32(4)  # length in bytes
        h ^= h >> np.uint32(16)
        h *= np.uint32(0x85EBCA6B)
        h ^= h >> np.uint32(13)
        h *= np.uint32(0xC2B2AE35)
        h ^= h >> np.uint32(16)
    return h.view(np.int32)


def partition_keys(n_parts: int) -> np.ndarray:
    """int32 keys k[r] with ``pmod(murmur3(k[r]), n_parts) == r`` for each r.

    ``df.repartition(n_parts, col)`` places a row in partition
    ``pmod(F.hash(col), n_parts)``; emitting ``k[cid % n_parts]`` as the
    shuffle column therefore round-robins chunks over partitions with
    ZERO placement skew — hash placement alone leaves a Poisson tail
    (max/mean ≈ 1.8 at 1000 chunks / 64 partitions) that directly
    multiplies reduce-stage wall time.
    """
    keys = np.full(n_parts, -1, dtype=np.int64)
    found = 0
    base = 0
    batch = max(1024, 4 * n_parts)
    while found < n_parts:
        cand = np.arange(base, base + batch, dtype=np.int32)
        res = murmur3_int32(cand).astype(np.int64) % n_parts
        res[res < 0] += n_parts
        for c, r in zip(cand, res):
            if keys[r] < 0:
                keys[r] = c
                found += 1
                if found == n_parts:
                    break
        base += batch
    return keys.astype(np.int32)


# ---------------------------------------------------------------------------
# per-chunk key Bloom filters (point-lookup pruning under the hash layout)
#
# Chunk placement is hash-bucketed, so a chunk's [min_key, max_key] spans
# nearly the whole key space and zone-map range pruning is useless for
# point lookups — every chunk's range "contains" every key. A small Bloom
# filter over the chunk's key strings (same hash_utf8 the layout already
# uses) restores O(matching chunks) point reads: ~10 bits/key => ~1% false
# positives, so a 1-key lookup decodes the 1 true chunk plus ~1% noise
# instead of all of them. The parquet column-index/bloom idiom applied to
# this layout.
# ---------------------------------------------------------------------------

BLOOM_K = 6
_BLOOM_MIN_BITS = 1 << 10
_BLOOM_MAX_BITS = 1 << 20  # 128 KiB cap per chunk


def _bloom_bits(n_keys: int) -> int:
    bits = _BLOOM_MIN_BITS
    while bits < 10 * n_keys and bits < _BLOOM_MAX_BITS:
        bits <<= 1
    return bits


def _bloom_indices(h: np.ndarray, bits: int):
    """k index arrays via double hashing of the 64-bit key hash."""
    h = h.astype(np.uint64)
    h1 = h & np.uint64(0xFFFFFFFF)
    h2 = (h >> np.uint64(32)) | np.uint64(1)
    m = np.uint64(bits)
    with np.errstate(over="ignore"):
        return [((h1 + np.uint64(i) * h2) % m) for i in range(BLOOM_K)]


def hash_i64(vals: np.ndarray) -> np.ndarray:
    """64-bit hashes of integer values (splitmix64 finalizer).

    The integer-value twin of hash_utf8 for Bloom filters over numeric
    column CONTENT (e.g. distinct token ids per chunk) — one mul/xor
    chain per value, vectorized, no string round-trip."""
    z = vals.astype(np.int64).view(np.uint64).copy()
    with np.errstate(over="ignore"):
        z += np.uint64(0x9E3779B97F4A7C15)
        z ^= z >> np.uint64(30)
        z *= np.uint64(0xBF58476D1CE4E9B5)
        z ^= z >> np.uint64(27)
        z *= np.uint64(0x94D049BB133111EB)
        z ^= z >> np.uint64(31)
    return z


def bloom_build(h: np.ndarray) -> bytes:
    """Packed Bloom filter over 64-bit key hashes (hash_utf8 output).

    Bit layout: bit (idx & 7) of byte (idx >> 3) — packbits with
    little bitorder reproduces it byte-identically while replacing the
    former np.bitwise_or.at scatter (~10x slower; duplicate-index
    fancy SET of a bool is safe where duplicate-index |= is not)."""
    bits = _bloom_bits(len(h))
    flags = np.zeros(bits, dtype=bool)
    for idx in _bloom_indices(h, bits):
        flags[idx.astype(np.int64)] = True
    return np.packbits(flags, bitorder="little").tobytes()


def bloom_test(bloom: bytes, h: np.ndarray) -> np.ndarray:
    """Per-key possibly-present bools (no false negatives)."""
    arr = np.frombuffer(bloom, dtype=np.uint8)
    bits = len(arr) << 3
    out = np.ones(len(h), dtype=bool)
    for idx in _bloom_indices(h, bits):
        byte = arr[(idx >> np.uint64(3)).astype(np.int64)]
        out &= ((byte >> (idx & np.uint64(7)).astype(np.uint8)) & 1).astype(bool)
    return out
