#!/usr/bin/env python3
"""Deterministic synthetic-table generator for scale factors the driver
does not ship (the driver provides sf{0.001,0.01,0.1}; SF1 certification
needs one decade more).

Replicates the shape of /root/testdata/sf0.1 as re-profiled in round 10
— schema (incl. parquet physical types: us timestamps for orders/
lineitem AND events, the type family the driver ships as of 2026-08-13;
round 5 profiled ms/ns, Tables.events accepts both via its normalizing
seam), int32 narrow columns, value grains (2-dec money, 1-dec
retail price, cent-step discount/tax), distributions (uniform keys,
Poisson-4 lineitems per order as a side effect of uniform l_orderkey,
Exp(50) event values, 30-word document vocabulary with ~5%% near-dup
copies mutated with the 'dup' token, unit-normalized 64-dim embeddings)
and the driver's scaling rules (documents = max(500, 50000*sf),
embeddings = max(500, 20000*sf), event users = max(15, 15000*sf)).

This is NOT the driver's generator and does not reproduce its rows; it
produces the same data family at a new scale so Spark-vs-DuckDB
correctness can be certified one decade above the driver's gate.

Usage: python3 tools/gen_sf.py 1.0 /tmp/sf1
"""
import sys
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

REGIONS = ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"]
SEGMENTS = ["MACHINERY", "BUILDING", "AUTOMOBILE", "FURNITURE", "HOUSEHOLD"]
STATUSES = ["O", "P", "F"]
PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
PNAME_W1 = ["blue", "cold", "hot", "large", "new", "old", "red", "small"]
PNAME_W2 = ["anvil", "bolt", "gear", "gizmo", "plate", "ring", "rod", "widget"]
PTYPES = ["ECONOMY", "LARGE", "MEDIUM", "PROMO", "SMALL", "STANDARD"]
EVENT_TYPES = ["signup", "click", "purchase", "error", "view"]
LANGS = ["en", "zh", "fr", "es", "de"]
LANG_P = [0.4, 0.15, 0.15, 0.15, 0.15]
DOC_VOCAB = ("spark window merge table column vector stream value data "
             "small join filter big group hash customer sort order slow "
             "line part fast row the agg key query a scan batch").split()
assert len(DOC_VOCAB) == 30

DAY_MS = 86_400_000
ORDER_EPOCH_MS = 788_918_400_000      # 1995-01-01
ORDER_DAYS = 2405                     # ..2001-08-01 inclusive
SHIP_EPOCH_MS = ORDER_EPOCH_MS + DAY_MS  # 1995-01-02
SHIP_DAYS = 2499                      # ..2001-11-04 inclusive
EVENT_EPOCH_US = 1_704_067_200_000_000  # 2024-01-01
EVENT_SPAN_US = 30 * 86_400_000_000     # 30 days


def write(path, table):
    pq.write_table(table, path, compression="snappy")
    print(f"  {path}: {table.num_rows} rows")


def money(rng, n, lo, hi, dec=2):
    return np.round(rng.uniform(lo, hi, n), dec)


def main(sf, out):
    rng = np.random.default_rng(42)
    n_cust = max(15, int(150_000 * sf))
    n_supp = max(10, int(10_000 * sf))
    n_part = max(20, int(200_000 * sf))
    n_ord = max(150, int(1_500_000 * sf))
    n_li = max(600, int(6_000_000 * sf))
    n_ev = max(1000, int(1_000_000 * sf))
    n_users = max(15, int(15_000 * sf))
    n_doc = max(500, int(50_000 * sf))
    n_emb = max(500, int(20_000 * sf))

    write(f"{out}/region.parquet", pa.table({
        "r_regionkey": pa.array(range(5), pa.int32()),
        "r_name": REGIONS}))

    write(f"{out}/nation.parquet", pa.table({
        "n_nationkey": pa.array(range(25), pa.int32()),
        "n_name": [f"NATION_{k}" for k in range(25)],
        "n_regionkey": pa.array([k % 5 for k in range(25)], pa.int32())}))

    write(f"{out}/customer.parquet", pa.table({
        "c_custkey": pa.array(np.arange(n_cust), pa.int64()),
        "c_name": [f"Customer#{i:09d}" for i in range(n_cust)],
        "c_nationkey": pa.array(rng.integers(0, 25, n_cust), pa.int32()),
        "c_acctbal": money(rng, n_cust, -1000, 10000),
        "c_mktsegment": np.array(SEGMENTS)[rng.integers(0, 5, n_cust)]}))

    write(f"{out}/supplier.parquet", pa.table({
        "s_suppkey": pa.array(np.arange(n_supp), pa.int64()),
        "s_name": [f"Supplier#{i:09d}" for i in range(n_supp)],
        "s_nationkey": pa.array(rng.integers(0, 25, n_supp), pa.int32()),
        "s_acctbal": money(rng, n_supp, -1000, 10000)}))

    w1 = np.array(PNAME_W1)[rng.integers(0, 8, n_part)]
    w2 = np.array(PNAME_W2)[rng.integers(0, 8, n_part)]
    write(f"{out}/part.parquet", pa.table({
        "p_partkey": pa.array(np.arange(n_part), pa.int64()),
        "p_name": [f"{a} {b}" for a, b in zip(w1, w2)],
        "p_brand": [f"Brand#{k}" for k in rng.integers(1, 26, n_part)],
        "p_type": np.array(PTYPES)[rng.integers(0, 6, n_part)],
        "p_size": pa.array(rng.integers(1, 51, n_part), pa.int32()),
        "p_retailprice": money(rng, n_part, 900, 1000, dec=1)}))

    odate = ORDER_EPOCH_MS + rng.integers(0, ORDER_DAYS, n_ord) * DAY_MS
    write(f"{out}/orders.parquet", pa.table({
        "o_orderkey": pa.array(np.arange(n_ord), pa.int64()),
        "o_custkey": pa.array(rng.integers(0, n_cust, n_ord), pa.int64()),
        "o_orderstatus": np.array(STATUSES)[rng.integers(0, 3, n_ord)],
        "o_totalprice": money(rng, n_ord, 1000, 500000),
        "o_orderdate": pa.array(odate * 1000, pa.timestamp("us")),
        "o_orderpriority": np.array(PRIORITIES)[rng.integers(0, 5, n_ord)]}))

    sdate = SHIP_EPOCH_MS + rng.integers(0, SHIP_DAYS, n_li) * DAY_MS
    write(f"{out}/lineitem.parquet", pa.table({
        "l_orderkey": pa.array(rng.integers(0, n_ord, n_li), pa.int64()),
        "l_partkey": pa.array(rng.integers(0, n_part, n_li), pa.int64()),
        "l_suppkey": pa.array(rng.integers(0, n_supp, n_li), pa.int64()),
        "l_linenumber": pa.array(rng.integers(1, 8, n_li), pa.int32()),
        "l_quantity": rng.integers(1, 51, n_li).astype(np.float64),
        "l_extendedprice": money(rng, n_li, 900, 105000),
        "l_discount": rng.integers(0, 11, n_li) / 100.0,
        "l_tax": rng.integers(0, 9, n_li) / 100.0,
        "l_returnflag": np.array(["A", "N", "R"])[rng.integers(0, 3, n_li)],
        "l_linestatus": np.array(["F", "O"])[rng.integers(0, 2, n_li)],
        "l_shipdate": pa.array(sdate * 1000, pa.timestamp("us"))}))

    ts = np.sort(rng.integers(0, EVENT_SPAN_US, n_ev)) + EVENT_EPOCH_US
    write(f"{out}/events.parquet", pa.table({
        "event_id": pa.array(np.arange(n_ev), pa.int64()),
        "ts": pa.array(ts, pa.timestamp("us")),
        "user_id": pa.array(rng.integers(0, n_users, n_ev), pa.int64()),
        "event_type": np.array(EVENT_TYPES)[rng.integers(0, 5, n_ev)],
        "value": np.round(rng.exponential(50.0, n_ev), 2),
        "props": [f'{{"k": {k}}}' for k in rng.integers(0, 100, n_ev)]}))

    texts = []
    for i in range(n_doc):
        if i > 0 and rng.random() < 0.05:
            toks = texts[rng.integers(0, i)].split()
            toks[rng.integers(0, len(toks))] = "dup"
            texts.append(" ".join(toks))
        else:
            ln = rng.integers(10, 101)
            texts.append(" ".join(np.array(DOC_VOCAB)[rng.integers(0, 30, ln)]))
    write(f"{out}/documents.parquet", pa.table({
        "doc_id": pa.array(np.arange(n_doc), pa.int64()),
        "text": texts,
        "lang": np.array(LANGS)[rng.choice(5, n_doc, p=LANG_P)],
        "source": [f"src{k}" for k in rng.integers(0, 20, n_doc)],
        "n_chars": pa.array([len(t) for t in texts], pa.int64())}))

    vecs = rng.standard_normal((n_emb, 64))
    vecs = (vecs / np.linalg.norm(vecs, axis=1, keepdims=True)).astype(np.float32)
    write(f"{out}/embeddings.parquet", pa.table({
        "vec_id": pa.array(np.arange(n_emb), pa.int64()),
        "embedding": pa.array(list(vecs), pa.list_(pa.float32())),
        "label": pa.array(rng.integers(0, 10, n_emb), pa.int32())}))


if __name__ == "__main__":
    import os
    sf, out = float(sys.argv[1]), sys.argv[2]
    os.makedirs(out, exist_ok=True)
    main(sf, out)
