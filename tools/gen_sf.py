#!/usr/bin/env python3
"""Generate TPC-H-shape tables matching /root/testdata's schemas and
value domains at an arbitrary scale factor, for SCALE-HEADROOM benches
(plan-shape + wall-clock growth). NOT a correctness input: the oracle
gate always runs on the driver's own sf0.01 data.

Usage: python3 tools/gen_sf.py <sf> <outdir>   # e.g. 1 /tmp/sf1

Schemas/domains mirrored from the driver's sf0.1 output (seed differs;
distributions match: uniform keys, Poisson(4)-clamped lines per order,
1995-2001 date range, the same enum domains).
"""
import sys
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

sf = float(sys.argv[1])
out = sys.argv[2]
rng = np.random.default_rng(4242)

N_CUST = int(150_000 * sf)
N_SUPP = int(10_000 * sf)
N_PART = int(200_000 * sf)
N_ORD = int(1_500_000 * sf)

DAY_US = 86_400_000_000
T0 = np.datetime64("1995-01-01", "us").astype("int64")
DATE_SPAN_DAYS = 2404  # 1995-01-01 .. 2001-08-01


def write(name, table):
    pq.write_table(table, f"{out}/{name}.parquet")
    print(name, table.num_rows)


def ts_us(days_int64):
    return (T0 + days_int64 * DAY_US).astype("datetime64[us]")


import os
os.makedirs(out, exist_ok=True)

write("region", pa.table({
    "r_regionkey": pa.array(np.arange(5, dtype=np.int32)),
    "r_name": ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"]}))

write("nation", pa.table({
    "n_nationkey": pa.array(np.arange(25, dtype=np.int32)),
    "n_name": [f"NATION_{i}" for i in range(25)],
    "n_regionkey": pa.array((np.arange(25) % 5).astype(np.int32))}))

write("customer", pa.table({
    "c_custkey": pa.array(np.arange(N_CUST, dtype=np.int64)),
    "c_name": [f"Customer#{i:09d}" for i in range(N_CUST)],
    "c_nationkey": pa.array(rng.integers(0, 25, N_CUST).astype(np.int32)),
    "c_acctbal": np.round(rng.uniform(-1000, 10000, N_CUST), 2),
    "c_mktsegment": pa.array(np.array(
        ["MACHINERY", "AUTOMOBILE", "HOUSEHOLD", "BUILDING", "FURNITURE"]
    )[rng.integers(0, 5, N_CUST)])}))

write("supplier", pa.table({
    "s_suppkey": pa.array(np.arange(N_SUPP, dtype=np.int64)),
    "s_name": [f"Supplier#{i:09d}" for i in range(N_SUPP)],
    "s_nationkey": pa.array(rng.integers(0, 25, N_SUPP).astype(np.int32)),
    "s_acctbal": np.round(rng.uniform(-1000, 10000, N_SUPP), 2)}))

adjectives = ["large", "hot", "blue", "old", "cold", "red", "small", "dark"]
nouns = ["ring", "bolt", "plate", "tube", "cap", "wheel", "gear", "pin"]
write("part", pa.table({
    "p_partkey": pa.array(np.arange(N_PART, dtype=np.int64)),
    "p_name": [f"{adjectives[i % 8]} {nouns[(i // 8) % 8]}"
               for i in range(N_PART)],
    "p_brand": pa.array([f"Brand#{i}" for i in
                         rng.integers(1, 26, N_PART)]),
    "p_type": pa.array(np.array(
        ["ECONOMY", "MEDIUM", "SMALL", "LARGE", "STANDARD", "PROMO"]
    )[rng.integers(0, 6, N_PART)]),
    "p_size": pa.array(rng.integers(1, 51, N_PART).astype(np.int32)),
    "p_retailprice": np.round(900.0 + (np.arange(N_PART) % 1000) * 0.1, 2)}))

o_days = rng.integers(0, DATE_SPAN_DAYS, N_ORD)
write("orders", pa.table({
    "o_orderkey": pa.array(np.arange(N_ORD, dtype=np.int64)),
    "o_custkey": pa.array(rng.integers(0, N_CUST, N_ORD)),
    "o_orderstatus": pa.array(np.array(["O", "F", "P"])[
        rng.choice(3, N_ORD, p=[0.48, 0.48, 0.04])]),
    "o_totalprice": np.round(rng.uniform(1000, 500000, N_ORD), 2),
    "o_orderdate": pa.array(ts_us(o_days)),
    "o_orderpriority": pa.array(np.array(
        ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
    )[rng.integers(0, 5, N_ORD)])}))

lines_per_order = np.clip(rng.poisson(4, N_ORD), 1, 17)
l_orderkey = np.repeat(np.arange(N_ORD, dtype=np.int64), lines_per_order)
NL = len(l_orderkey)
l_qty = rng.integers(1, 51, NL).astype(np.float64)
l_price = np.round(900.0 + rng.uniform(0, 1000, NL) * 0.1, 2)
ship_days = np.repeat(o_days, lines_per_order) + rng.integers(1, 96, NL)
write("lineitem", pa.table({
    "l_orderkey": pa.array(l_orderkey),
    "l_partkey": pa.array(rng.integers(0, N_PART, NL)),
    "l_suppkey": pa.array(rng.integers(0, N_SUPP, NL)),
    "l_linenumber": pa.array(rng.integers(1, 8, NL).astype(np.int32)),
    "l_quantity": l_qty,
    "l_extendedprice": np.round(l_qty * l_price, 2),
    "l_discount": np.round(rng.integers(0, 11, NL) * 0.01, 2),
    "l_tax": np.round(rng.integers(0, 9, NL) * 0.01, 2),
    "l_returnflag": pa.array(np.array(["N", "A", "R"])[
        rng.choice(3, NL, p=[0.5, 0.25, 0.25])]),
    "l_linestatus": pa.array(np.array(["O", "F"])[rng.integers(0, 2, NL)]),
    "l_shipdate": pa.array(ts_us(ship_days))}))

# ---------------------------------------------------------------- docs
# documents + embeddings mirroring the driver's corpus shape (same
# vocabulary/length/lang/near-dup-plant distributions, different seed):
# 30-word shared vocabulary, 10-100 words/doc, every 20th doc a
# near-dup of its predecessor (one word swapped for the rare 'dup'
# marker), lang ~ en-heavy, 20 uniform sources; embeddings are 64-d
# label-clustered unit vectors with every 20th a one-dim-nudged copy.

VOCAB = np.array(
    ("spark window merge table column vector stream value data small "
     "join filter big group hash customer sort order slow line part "
     "fast the row agg key query a scan batch").split())
N_DOCS = int(50_000 * sf)
N_VEC = int(20_000 * sf)

doc_lens = rng.integers(10, 101, N_DOCS)
texts = []
langs_arr = np.array(["en", "de", "es", "fr", "zh"])
doc_langs = langs_arr[rng.choice(5, N_DOCS, p=[0.41, 0.14, 0.15, 0.15, 0.15])]
for i in range(N_DOCS):
    if i % 20 == 0 and i > 0:
        words = texts[i - 1].split(" ")
        words[int(rng.integers(0, len(words)))] = "dup"
        texts.append(" ".join(words))
    else:
        texts.append(" ".join(VOCAB[rng.integers(0, len(VOCAB), doc_lens[i])]))
write("documents", pa.table({
    "doc_id": pa.array(np.arange(N_DOCS, dtype=np.int64)),
    "text": pa.array(texts),
    "lang": pa.array(doc_langs),
    "source": pa.array([f"src{i % 20}" for i in
                        rng.integers(0, 20, N_DOCS)]),
    "n_chars": pa.array(np.array([len(t) for t in texts], dtype=np.int64))}))

centroids = rng.normal(0, 1, (10, 64))
vlabels = (np.arange(N_VEC) % 10).astype(np.int32)
vecs = centroids[vlabels] + rng.normal(0, 0.3, (N_VEC, 64))
vecs = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
for i in range(0, N_VEC, 20):
    if i > 0:
        vecs[i] = vecs[i - 1]
        vecs[i][int(rng.integers(0, 64))] += 0.01
        vlabels[i] = vlabels[i - 1]
write("embeddings", pa.table({
    "vec_id": pa.array(np.arange(N_VEC, dtype=np.int64)),
    "embedding": pa.array([v.astype(np.float32) for v in vecs],
                          type=pa.list_(pa.float32())),
    "label": pa.array(vlabels)}))

# -------------------------------------------------------------- events
# events stream table mirroring the driver's shape (same schema,
# domains and distributions, different seed): N = 1M*sf rows over the
# SAME fixed 30-day Jan-2024 window (scaling raises event density, the
# way a busier stream actually scales), uniform event types, user_id
# in [0, 15000*sf), value ~ Exp(mean 50) rounded to cents, props a
# tiny JSON with k in [0, 100).
N_EV = int(1_000_000 * sf)
N_USERS = max(int(15_000 * sf), 1)
ev_ts = np.sort(rng.integers(0, 30 * DAY_US, N_EV))
T_EV0 = np.datetime64("2024-01-01", "us").astype("int64")
write("events", pa.table({
    "event_id": pa.array(np.arange(N_EV, dtype=np.int64)),
    "ts": pa.array((T_EV0 + ev_ts).astype("datetime64[us]")),
    "user_id": pa.array(rng.integers(0, N_USERS, N_EV)),
    "event_type": pa.array(np.array(
        ["click", "view", "purchase", "signup", "error"])[
        rng.integers(0, 5, N_EV)]),
    "value": np.round(rng.exponential(50.0, N_EV), 2),
    "props": pa.array(["{\"k\": %d}" % k for k in
                       rng.integers(0, 100, N_EV)])}))
