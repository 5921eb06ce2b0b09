"""Second-seed synthetic testdata generator (r3 verdict item 9).

Regenerates the full 10-table driver corpus (TPC-H-ish star schema +
events/documents/embeddings) with a DIFFERENT seed but the same
schemas, value domains, key containment, scaling rules and planted
structure (near-dup documents ~0.99 jaccard, near-dup embeddings
cosine > 0.95), then the full oracle sweep runs once against it:

    python tools/gen_testdata.py /tmp/testdata_seedB/sf0.01 --sf 0.01 --seed 1337
    python tools/check_oracles.py /tmp/testdata_seedB/sf0.01

The point is guarding against oracles that accidentally pin a
seed-specific coincidence of the driver corpus: every query must
hash-match DuckDB on data it has never seen. Domains (ASCII-only text,
value magnitudes, ts windows) are matched because several oracles'
EXACTNESS arguments depend on them (byte==codepoint hashing, integer
overflow headroom) — that is part of the corpus contract, not a
coincidence.
"""

from __future__ import annotations

import argparse
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

REGIONS = ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"]
SEGMENTS = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]
PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
PTYPES = ["ECONOMY", "LARGE", "MEDIUM", "PROMO", "SMALL", "STANDARD"]
ADJS = ["small", "red", "blue", "large", "green", "shiny", "dull", "spring",
        "metal", "plated"]
NOUNS = ["ring", "widget", "bolt", "gear", "cog", "pin", "plate", "rod",
         "cap", "nut"]
EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]
LANGS = ["en", "de", "es", "fr", "zh"]
LANG_P = [0.6, 0.1, 0.1, 0.1, 0.1]
VOCAB = ["key", "agg", "row", "scan", "slow", "fast", "table", "value",
         "part", "hash", "merge", "batch", "join", "sort", "read", "write",
         "plan", "cost", "disk", "page", "cache", "index", "group", "limit",
         "a", "the", "of", "and"]

_EPOCH_1995 = np.datetime64("1995-01-01")
_EPOCH_2024 = np.datetime64("2024-01-01")


def _ts_col(days: np.ndarray, base: np.datetime64) -> pa.Array:
    us = (days * 86_400_000_000).astype("int64")
    return pa.array(base.astype("datetime64[us]").astype(np.int64) + us,
                    type=pa.timestamp("us"))


def _round2(x: np.ndarray) -> np.ndarray:
    return np.round(x, 2)


def gen(out_dir: str, sf: float, seed: int) -> None:
    os.makedirs(out_dir, exist_ok=True)
    rng = np.random.default_rng(seed)

    n_cust = max(150, int(150_000 * sf))
    n_supp = max(10, int(10_000 * sf))
    n_part = max(200, int(200_000 * sf))
    n_ord = max(1_500, int(1_500_000 * sf))
    n_li = max(6_000, int(6_000_000 * sf))
    n_ev = max(1_000, int(1_000_000 * sf))
    n_doc = max(500, int(50_000 * sf))
    n_emb = max(500, int(20_000 * sf))

    def w(name: str, table: pa.Table) -> None:
        pq.write_table(table, os.path.join(out_dir, f"{name}.parquet"))

    w("region", pa.table({
        "r_regionkey": pa.array(range(5), pa.int32()),
        "r_name": pa.array(REGIONS)}))
    w("nation", pa.table({
        "n_nationkey": pa.array(range(25), pa.int32()),
        "n_name": pa.array([f"NATION_{i}" for i in range(25)]),
        "n_regionkey": pa.array(rng.integers(0, 5, 25), pa.int32())}))
    w("customer", pa.table({
        "c_custkey": pa.array(range(n_cust), pa.int64()),
        "c_name": pa.array([f"Customer#{i:09d}" for i in range(n_cust)]),
        "c_nationkey": pa.array(rng.integers(0, 25, n_cust), pa.int32()),
        "c_acctbal": _round2(rng.uniform(-999.99, 9999.99, n_cust)),
        "c_mktsegment": pa.array(
            [SEGMENTS[i] for i in rng.integers(0, 5, n_cust)])}))
    w("supplier", pa.table({
        "s_suppkey": pa.array(range(n_supp), pa.int64()),
        "s_name": pa.array([f"Supplier#{i:09d}" for i in range(n_supp)]),
        "s_nationkey": pa.array(rng.integers(0, 25, n_supp), pa.int32()),
        "s_acctbal": _round2(rng.uniform(-999.99, 9999.99, n_supp))}))
    w("part", pa.table({
        "p_partkey": pa.array(range(n_part), pa.int64()),
        "p_name": pa.array([f"{ADJS[a]} {NOUNS[b]}" for a, b in zip(
            rng.integers(0, len(ADJS), n_part),
            rng.integers(0, len(NOUNS), n_part))]),
        "p_brand": pa.array(
            [f"Brand#{i}" for i in rng.integers(1, 26, n_part)]),
        "p_type": pa.array([PTYPES[i] for i in rng.integers(0, 6, n_part)]),
        "p_size": pa.array(rng.integers(1, 51, n_part), pa.int32()),
        "p_retailprice": _round2(rng.uniform(900.0, 999.9, n_part))}))

    odate_days = rng.integers(0, 2404, n_ord)  # 1995-01-01 .. 2001-08-01
    w("orders", pa.table({
        "o_orderkey": pa.array(range(n_ord), pa.int64()),
        "o_custkey": pa.array(rng.integers(0, n_cust, n_ord), pa.int64()),
        "o_orderstatus": pa.array(
            [["F", "O", "P"][i] for i in
             rng.choice(3, n_ord, p=[0.48, 0.48, 0.04])]),
        "o_totalprice": _round2(rng.uniform(1_000, 500_000, n_ord)),
        "o_orderdate": _ts_col(odate_days, _EPOCH_1995),
        "o_orderpriority": pa.array(
            [PRIORITIES[i] for i in rng.integers(0, 5, n_ord)])}))

    li_ord = rng.integers(0, n_ord, n_li)
    w("lineitem", pa.table({
        "l_orderkey": pa.array(li_ord, pa.int64()),
        "l_partkey": pa.array(rng.integers(0, n_part, n_li), pa.int64()),
        "l_suppkey": pa.array(rng.integers(0, n_supp, n_li), pa.int64()),
        "l_linenumber": pa.array(rng.integers(1, 8, n_li), pa.int32()),
        "l_quantity": rng.integers(1, 51, n_li).astype(np.float64),
        "l_extendedprice": _round2(rng.uniform(1_000, 100_000, n_li)),
        "l_discount": _round2(rng.integers(0, 11, n_li) / 100.0),
        "l_tax": _round2(rng.integers(0, 9, n_li) / 100.0),
        "l_returnflag": pa.array(
            [["A", "N", "R"][i] for i in
             rng.choice(3, n_li, p=[0.25, 0.5, 0.25])]),
        "l_linestatus": pa.array(
            [["F", "O"][i] for i in rng.integers(0, 2, n_li)]),
        "l_shipdate": _ts_col(odate_days[li_ord]
                              + rng.integers(1, 96, n_li), _EPOCH_1995)}))

    ev_gaps = rng.exponential(30.0 * 86_400 / n_ev, n_ev)
    ev_ts = np.cumsum(ev_gaps) / 86_400.0  # days, increasing
    w("events", pa.table({
        "event_id": pa.array(range(n_ev), pa.int64()),
        "ts": _ts_col(ev_ts, _EPOCH_2024),
        "user_id": pa.array(
            rng.integers(0, max(1, int(15_000 * sf)), n_ev), pa.int64()),
        "event_type": pa.array(
            [EVENT_TYPES[i] for i in
             rng.choice(5, n_ev, p=[0.5, 0.05, 0.1, 0.05, 0.3])]),
        "value": _round2(rng.uniform(0.01, 490.0, n_ev)),
        "props": pa.array(
            [('{"k": %d}' % k) for k in rng.integers(1, 100, n_ev)])}))

    # documents: ASCII word salad + planted near-dups (~0.99 jaccard)
    texts: list[str] = []
    for i in range(n_doc):
        if i > 0 and rng.random() < 0.05:
            donor = texts[int(rng.integers(0, i))].split(" ")
            pos = int(rng.integers(0, len(donor)))
            donor[pos] = VOCAB[int(rng.integers(0, len(VOCAB)))]
            texts.append(" ".join(donor))
            continue
        n_words = int(rng.integers(10, 110))
        texts.append(" ".join(
            VOCAB[j] for j in rng.integers(0, len(VOCAB), n_words)))
    w("documents", pa.table({
        "doc_id": pa.array(range(n_doc), pa.int64()),
        "text": pa.array(texts),
        "lang": pa.array([LANGS[i] for i in rng.choice(5, n_doc, p=LANG_P)]),
        "source": pa.array(
            [f"src{i}" for i in rng.integers(0, 20, n_doc)]),
        "n_chars": pa.array([len(t) for t in texts], pa.int64())}))

    # embeddings: dim 64 float32 + planted cosine near-dups
    dim = 64
    X = rng.normal(0, 0.12, (n_emb, dim)).astype(np.float32)
    for i in range(1, n_emb):
        if rng.random() < 0.08:
            j = int(rng.integers(0, i))
            X[i] = (X[j] + rng.normal(0, 0.004, dim).astype(np.float32))
    w("embeddings", pa.table({
        "vec_id": pa.array(range(n_emb), pa.int64()),
        "embedding": pa.array([row for row in X.tolist()],
                              pa.list_(pa.float32())),
        "label": pa.array(rng.integers(0, 10, n_emb), pa.int32())}))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("out_dir")
    ap.add_argument("--sf", type=float, default=0.01)
    ap.add_argument("--seed", type=int, default=1337)
    args = ap.parse_args()
    gen(args.out_dir, args.sf, args.seed)
    print(f"wrote 10 tables to {args.out_dir} (sf={args.sf}, "
          f"seed={args.seed})")


if __name__ == "__main__":
    main()
