"""Seeded generator for the driver's parquet testdata layout at ANY scale
factor — the scaling-slope instrument (VERDICT r11 #4).

The driver ships sf{0.001,0.01,0.1} read-only; measuring how query wall
time scales with data volume needs a larger tier. This reproduces the ten
tables (`region nation customer supplier part orders lineitem events
documents embeddings`) with byte-compatible schemas (timestamp[us] NTZ,
list<float> embeddings) and the distributions observed on the shipped
sf0.1 (documented per table below), at arbitrary sf. It is NOT the
driver's generator and makes no byte-identity claim against the shipped
dirs — slope runs therefore generate BOTH ends (e.g. gen-sf0.1 and
gen-sf1) from THIS generator so the ratio is apples-to-apples, and a
stat-parity check against the shipped sf0.1 validates the shapes.

Deterministic under a fixed seed: same (sf, seed) -> same tables.

Usage:
    python tools/testdata_gen.py OUT_DIR SF [SEED]
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

# Row counts are linear in sf, anchored to the shipped sf0.1 tier
# (TESTDATA.md: lineitem 600k at sf0.1). nation/region are fixed dims.
ROWS_PER_SF = {
    "customer": 150_000,
    "supplier": 10_000,
    "part": 200_000,
    "orders": 1_500_000,
    "lineitem": 6_000_000,
    "events": 1_000_000,
    "documents": 50_000,
    "embeddings": 20_000,
}
N_USERS_PER_SF = 15_000  # events.user_id domain (1,500 at sf0.1)

REGIONS = ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"]
SEGMENTS = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]
PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
P_TYPES = ["ECONOMY", "LARGE", "MEDIUM", "PROMO", "SMALL", "STANDARD"]
P_ADJS = ["blue", "cold", "hot", "large", "new", "old", "red", "small"]
P_NOUNS = ["anvil", "bolt", "gear", "gizmo", "plate", "ring", "rod", "widget"]
EVENT_TYPES = ["view", "click", "purchase", "signup", "error"]
LANGS = ["en", "zh", "es", "fr", "de"]
LANG_P = [0.40, 0.15, 0.15, 0.15, 0.15]
# The 31-word corpus vocabulary of the shipped documents table.
VOCAB = [
    "a", "agg", "batch", "big", "column", "customer", "data", "dup",
    "fast", "filter", "group", "hash", "join", "key", "line", "merge",
    "order", "part", "query", "row", "scan", "slow", "small", "sort",
    "spark", "stream", "table", "the", "value", "vector", "window",
]

DAY_US = 86_400_000_000


def _ts_us(iso_day: str) -> int:
    return (
        np.datetime64(iso_day, "us") - np.datetime64("1970-01-01", "us")
    ).astype(np.int64)


def _write(out_dir: str, name: str, table: pa.Table) -> None:
    pq.write_table(table, os.path.join(out_dir, f"{name}.parquet"))


def _tscol(epoch_us: np.ndarray) -> pa.Array:
    return pa.array(epoch_us.astype("datetime64[us]"), pa.timestamp("us"))


def generate(out_dir: str, sf: float, seed: int = 42) -> None:
    os.makedirs(out_dir, exist_ok=True)
    rng = np.random.default_rng(seed)
    n = {t: max(1, int(round(c * sf))) for t, c in ROWS_PER_SF.items()}
    n_users = max(1, int(round(N_USERS_PER_SF * sf)))

    # region / nation: fixed dims, nation i -> region i % 5.
    _write(out_dir, "region", pa.table({
        "r_regionkey": pa.array(range(5), pa.int32()),
        "r_name": REGIONS,
    }))
    _write(out_dir, "nation", pa.table({
        "n_nationkey": pa.array(range(25), pa.int32()),
        "n_name": [f"NATION_{i}" for i in range(25)],
        "n_regionkey": pa.array([i % 5 for i in range(25)], pa.int32()),
    }))

    # customer: uniform nation, acctbal ~ U(-1000, 10000) cents.
    k = n["customer"]
    _write(out_dir, "customer", pa.table({
        "c_custkey": pa.array(np.arange(k), pa.int64()),
        "c_name": [f"Customer#{i:09d}" for i in range(k)],
        "c_nationkey": pa.array(rng.integers(0, 25, k), pa.int32()),
        "c_acctbal": np.round(rng.uniform(-1000, 10000, k), 2),
        "c_mktsegment": pa.array(
            np.array(SEGMENTS)[rng.integers(0, 5, k)], pa.string()),
    }))

    k = n["supplier"]
    _write(out_dir, "supplier", pa.table({
        "s_suppkey": pa.array(np.arange(k), pa.int64()),
        "s_name": [f"Supplier#{i:09d}" for i in range(k)],
        "s_nationkey": pa.array(rng.integers(0, 25, k), pa.int32()),
        "s_acctbal": np.round(rng.uniform(-1000, 10000, k), 2),
    }))

    # part: "adj noun" names from the 8x8 sets, Brand#1..25, size 1..50,
    # retailprice 900 + (i % 1000)/10 (the shipped tier's 1000-value comb).
    k = n["part"]
    adj = np.array(P_ADJS)[rng.integers(0, 8, k)]
    noun = np.array(P_NOUNS)[rng.integers(0, 8, k)]
    _write(out_dir, "part", pa.table({
        "p_partkey": pa.array(np.arange(k), pa.int64()),
        "p_name": pa.array(np.char.add(np.char.add(adj, " "), noun),
                           pa.string()),
        "p_brand": pa.array(
            [f"Brand#{b}" for b in rng.integers(1, 26, k)], pa.string()),
        "p_type": pa.array(np.array(P_TYPES)[rng.integers(0, 6, k)],
                           pa.string()),
        "p_size": pa.array(rng.integers(1, 51, k), pa.int32()),
        "p_retailprice": np.round(900.0 + (np.arange(k) % 1000) / 10.0, 2),
    }))

    # orders: day-granular dates uniform over [1995-01-01, 2001-08-01],
    # totalprice ~ U(1000, 500000).
    k = n["orders"]
    o_lo, o_hi = _ts_us("1995-01-01"), _ts_us("2001-08-01")
    o_days = (o_hi - o_lo) // DAY_US + 1
    _write(out_dir, "orders", pa.table({
        "o_orderkey": pa.array(np.arange(k), pa.int64()),
        "o_custkey": pa.array(rng.integers(0, n["customer"], k), pa.int64()),
        "o_orderstatus": pa.array(
            np.array(["O", "P", "F"])[rng.integers(0, 3, k)], pa.string()),
        "o_totalprice": np.round(rng.uniform(1000, 500000, k), 2),
        "o_orderdate": _tscol(o_lo + rng.integers(0, o_days, k) * DAY_US),
        "o_orderpriority": pa.array(
            np.array(PRIORITIES)[rng.integers(0, 5, k)], pa.string()),
    }))

    # lineitem: orderkeys drawn uniformly over orders (so ~e^-4 of orders
    # get no line, matching the shipped tier's 147k/150k), linenumber =
    # position within the order (1..7 wrap), qty integer 1..50, price
    # independent U(900, 105000), discount 0..0.10 and tax 0..0.08 in
    # cent steps, shipdate day-granular over its own observed range
    # (independent of o_orderdate in the shipped tier).
    k = n["lineitem"]
    okeys = np.sort(rng.integers(0, n["orders"], k))
    # position within each run of equal orderkeys, vectorized
    starts = np.flatnonzero(np.r_[True, okeys[1:] != okeys[:-1]])
    pos = np.arange(k) - np.repeat(starts, np.diff(np.r_[starts, k]))
    s_lo, s_hi = _ts_us("1995-01-02"), _ts_us("2001-11-04")
    s_days = (s_hi - s_lo) // DAY_US + 1
    _write(out_dir, "lineitem", pa.table({
        "l_orderkey": pa.array(okeys, pa.int64()),
        "l_partkey": pa.array(rng.integers(0, n["part"], k), pa.int64()),
        "l_suppkey": pa.array(rng.integers(0, n["supplier"], k), pa.int64()),
        "l_linenumber": pa.array((pos % 7 + 1).astype(np.int32), pa.int32()),
        "l_quantity": rng.integers(1, 51, k).astype(np.float64),
        "l_extendedprice": np.round(rng.uniform(900, 105000, k), 2),
        "l_discount": rng.integers(0, 11, k) / 100.0,
        "l_tax": rng.integers(0, 9, k) / 100.0,
        "l_returnflag": pa.array(
            np.array(["A", "N", "R"])[rng.integers(0, 3, k)], pa.string()),
        "l_linestatus": pa.array(
            np.array(["O", "F"])[rng.integers(0, 2, k)], pa.string()),
        "l_shipdate": _tscol(s_lo + rng.integers(0, s_days, k) * DAY_US),
    }))

    # events: Poisson arrivals over the fixed 30-day window (sorted
    # uniforms => strictly-ascending-with-jitter like the shipped tier;
    # density scales with sf, the calendar does not), value ~ Exp(50),
    # props a tiny JSON object.
    k = n["events"]
    e_lo = _ts_us("2024-01-01")
    ts = np.sort(rng.integers(0, 30 * DAY_US, k)) + e_lo
    kvals = rng.integers(0, 100, k)
    _write(out_dir, "events", pa.table({
        "event_id": pa.array(np.arange(k), pa.int64()),
        "ts": _tscol(ts),
        "user_id": pa.array(rng.integers(0, n_users, k), pa.int64()),
        "event_type": pa.array(
            np.array(EVENT_TYPES)[rng.integers(0, 5, k)], pa.string()),
        "value": np.round(rng.exponential(50.0, k), 2),
        "props": pa.array([f'{{"k": {v}}}' for v in kvals], pa.string()),
    }))

    # documents: 10..100 words uniform from the 31-word vocabulary,
    # lang ~ (en .40, others .15), source = src{doc_id % 20}. The shipped
    # tier carries planted duplicate structure (8/5000 exact-dup texts;
    # doc_minhash_lsh surfaces ~256 near-dup rows at sf0.1), which drives
    # the dedup operators' candidate-pair counts — so plant ~2.5 % near
    # dups (an earlier doc's text with 1-3 words substituted) and ~0.2 %
    # exact dups here too, or the dedup slopes would measure a corpus
    # with no duplicates to find.
    k = n["documents"]
    wc = rng.integers(10, 101, k)
    words = np.array(VOCAB)[rng.integers(0, len(VOCAB), (k, 100))]
    texts = [" ".join(words[i, : wc[i]]) for i in range(k)]
    for i in rng.choice(k, max(1, int(k * 0.025)), replace=False):
        if i == 0:
            continue
        src_words = texts[int(rng.integers(0, i))].split(" ")
        for _ in range(int(rng.integers(1, 4))):
            src_words[int(rng.integers(0, len(src_words)))] = VOCAB[
                int(rng.integers(0, len(VOCAB)))
            ]
        texts[i] = " ".join(src_words)
    for i in rng.choice(k, max(1, int(k * 0.002)), replace=False):
        if i > 0:
            texts[i] = texts[int(rng.integers(0, i))]
    _write(out_dir, "documents", pa.table({
        "doc_id": pa.array(np.arange(k), pa.int64()),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(rng.choice(LANGS, k, p=LANG_P), pa.string()),
        "source": pa.array([f"src{i % 20}" for i in range(k)], pa.string()),
        "n_chars": pa.array([len(t) for t in texts], pa.int64()),
    }))

    # embeddings: unit-normalized 64-dim gaussians (the shipped tier's
    # labels carry no centroid structure), labels uniform 0..9.
    k = n["embeddings"]
    vec = rng.standard_normal((k, 64)).astype(np.float32)
    vec /= np.linalg.norm(vec, axis=1, keepdims=True)
    _write(out_dir, "embeddings", pa.table({
        "vec_id": pa.array(np.arange(k), pa.int64()),
        "embedding": pa.FixedSizeListArray.from_arrays(
            pa.array(vec.reshape(-1), pa.float32()), 64
        ).cast(pa.list_(pa.float32())),
        "label": pa.array(rng.integers(0, 10, k), pa.int32()),
    }))


def main() -> None:
    if len(sys.argv) < 3:
        sys.exit("usage: testdata_gen.py OUT_DIR SF [SEED]")
    out_dir, sf = sys.argv[1], float(sys.argv[2])
    seed = int(sys.argv[3]) if len(sys.argv) > 3 else 42
    generate(out_dir, sf, seed)
    print(f"wrote sf={sf} tables to {out_dir}")


if __name__ == "__main__":
    main()
