#!/usr/bin/env python
"""Generate a deterministic sf1-shaped scale fixture (r11, VERDICT r10
#2).  /root/testdata is driver-owned and read-only, and no sf1 tier
exists there — this produces a 10×-sf0.1 dataset with the SAME schemas,
value formats and distribution shapes (verified against the sf0.1
tables) under /root/sf1_selfgen, for the opt-in heavy-family scaling
runs recorded in SCALE.md.  Seeded numpy throughout — re-running
produces byte-identical tables.

NOT oracle data: the driver's correctness gates stay on its own
sf0.001/0.01/0.1; this fixture exists purely so the widened heavy
chains can be measured above the driver-bound sf0.1 saturation point.

Usage: python tools/r11_gen_sf1.py [outdir] (default /root/sf1_selfgen)
"""
from __future__ import annotations

import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

OUT = sys.argv[1] if len(sys.argv) > 1 else "/root/sf1_selfgen"
SCALE = 10  # over sf0.1

N_CUSTOMER = 15_000 * SCALE
N_SUPPLIER = 1_000 * SCALE
N_PART = 20_000 * SCALE
N_ORDERS = 150_000 * SCALE
N_LINEITEM = 600_000 * SCALE
N_EVENTS = 100_000 * SCALE
N_USERS = 1_500 * SCALE
N_DOCS = 5_000 * SCALE
# embeddings follow the fixture's own 4×-per-decade trend (500 @ sf0.01
# → 2000 @ sf0.1): quadratic-candidate families stay measurable without
# hour-long passes
N_EMB = 8_000

rng = np.random.RandomState(42)

VOCAB = (
    "spark line column order small sort fast value scan batch part "
    "query agg table hash key group filter stream customer slow vector "
    "join shuffle cache disk read write plan stage task"
).split()
MKTSEG = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]
PTYPES = ["ECONOMY", "LARGE", "MEDIUM", "PROMO", "STANDARD"]
PNAMES1 = ["large", "hot", "small", "cold", "dim", "light"]
PNAMES2 = ["ring", "bolt", "washer", "spring", "cap", "plate"]
PRIORITIES = [
    "1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW",
]
EVENT_TYPES = ["click", "view", "purchase", "signup", "error"]
LANGS = (["en"] * 6) + ["zh", "de", "fr", "es"]


def write(name: str, table: pa.Table) -> None:
    import os

    os.makedirs(OUT, exist_ok=True)
    pq.write_table(table, f"{OUT}/{name}.parquet")
    print(f"wrote {name}: {table.num_rows} rows")


def day_range(lo: str, hi: str, n: int) -> np.ndarray:
    lo_d = np.datetime64(lo)
    hi_d = np.datetime64(hi)
    span = (hi_d - lo_d).astype(int)
    return lo_d + rng.randint(0, span + 1, n).astype("timedelta64[D]")


def main() -> None:
    # region / nation: fixed dimensions, copied shape-exact
    write("region", pa.table({
        "r_regionkey": pa.array(range(5), pa.int32()),
        "r_name": ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"],
    }))
    write("nation", pa.table({
        "n_nationkey": pa.array(range(25), pa.int32()),
        "n_name": [f"NATION_{i}" for i in range(25)],
        "n_regionkey": pa.array([i % 5 for i in range(25)], pa.int32()),
    }))

    write("customer", pa.table({
        "c_custkey": pa.array(np.arange(N_CUSTOMER), pa.int64()),
        "c_name": [f"Customer#{i:09d}" for i in range(N_CUSTOMER)],
        "c_nationkey": pa.array(rng.randint(0, 25, N_CUSTOMER), pa.int32()),
        "c_acctbal": np.round(rng.uniform(-1000, 10000, N_CUSTOMER), 2),
        "c_mktsegment": [MKTSEG[i] for i in rng.randint(0, 5, N_CUSTOMER)],
    }))
    write("supplier", pa.table({
        "s_suppkey": pa.array(np.arange(N_SUPPLIER), pa.int64()),
        "s_name": [f"Supplier#{i:09d}" for i in range(N_SUPPLIER)],
        "s_nationkey": pa.array(rng.randint(0, 25, N_SUPPLIER), pa.int32()),
        "s_acctbal": np.round(rng.uniform(-1000, 10000, N_SUPPLIER), 2),
    }))
    write("part", pa.table({
        "p_partkey": pa.array(np.arange(N_PART), pa.int64()),
        "p_name": [
            f"{PNAMES1[a]} {PNAMES2[b]}"
            for a, b in zip(
                rng.randint(0, len(PNAMES1), N_PART),
                rng.randint(0, len(PNAMES2), N_PART),
            )
        ],
        "p_brand": [f"Brand#{i}" for i in rng.randint(1, 26, N_PART)],
        "p_type": [PTYPES[i] for i in rng.randint(0, 5, N_PART)],
        "p_size": pa.array(rng.randint(1, 51, N_PART), pa.int32()),
        "p_retailprice": np.round(900 + 0.1 * np.arange(N_PART) % 1000, 2),
    }))

    odate = day_range("1995-01-01", "2001-08-01", N_ORDERS)
    write("orders", pa.table({
        "o_orderkey": pa.array(np.arange(N_ORDERS), pa.int64()),
        "o_custkey": pa.array(
            rng.randint(0, N_CUSTOMER, N_ORDERS), pa.int64()
        ),
        "o_orderstatus": [
            "OFP"[i] for i in rng.randint(0, 3, N_ORDERS)
        ],
        "o_totalprice": np.round(rng.uniform(1000, 400000, N_ORDERS), 2),
        "o_orderdate": pa.array(
            odate.astype("datetime64[us]"), pa.timestamp("us")
        ),
        "o_orderpriority": [
            PRIORITIES[i] for i in rng.randint(0, 5, N_ORDERS)
        ],
    }))

    lkey = rng.randint(0, N_ORDERS, N_LINEITEM).astype(np.int64)
    lkey.sort()
    # linenumber: position within order, 1-based (orders average 4
    # lines; the sort above groups lines per order)
    ln = np.ones(N_LINEITEM, np.int32)
    same = np.concatenate([[False], lkey[1:] == lkey[:-1]])
    run = 0
    for i in range(N_LINEITEM):
        run = run + 1 if same[i] else 1
        ln[i] = run
    qty = rng.randint(1, 51, N_LINEITEM).astype(float)
    ship = odate[lkey] + rng.randint(1, 96, N_LINEITEM).astype(
        "timedelta64[D]"
    )
    write("lineitem", pa.table({
        "l_orderkey": pa.array(lkey, pa.int64()),
        "l_partkey": pa.array(rng.randint(0, N_PART, N_LINEITEM), pa.int64()),
        "l_suppkey": pa.array(
            rng.randint(0, N_SUPPLIER, N_LINEITEM), pa.int64()
        ),
        "l_linenumber": pa.array(ln, pa.int32()),
        "l_quantity": qty,
        "l_extendedprice": np.round(rng.uniform(900, 105000, N_LINEITEM), 2),
        "l_discount": np.round(rng.randint(0, 11, N_LINEITEM) / 100.0, 2),
        "l_tax": np.round(rng.randint(0, 9, N_LINEITEM) / 100.0, 2),
        "l_returnflag": ["NAR"[i] for i in rng.randint(0, 3, N_LINEITEM)],
        "l_linestatus": ["OF"[i] for i in rng.randint(0, 2, N_LINEITEM)],
        "l_shipdate": pa.array(
            ship.astype("datetime64[us]"), pa.timestamp("us")
        ),
    }))

    # events: 30-day window, sorted by ts, sequential event_id
    ts_us = np.sort(
        rng.randint(
            0, 30 * 86400 * 1_000_000, N_EVENTS, dtype=np.int64
        )
    ) + np.datetime64("2024-01-01").astype("datetime64[us]").astype(np.int64)
    write("events", pa.table({
        "event_id": pa.array(np.arange(N_EVENTS), pa.int64()),
        "ts": pa.array(ts_us, pa.timestamp("us")),
        "user_id": pa.array(rng.randint(0, N_USERS, N_EVENTS), pa.int64()),
        "event_type": [EVENT_TYPES[i] for i in rng.randint(0, 5, N_EVENTS)],
        "value": np.round(rng.uniform(0, 560, N_EVENTS), 2),
        "props": [f'{{"k": {k}}}' for k in rng.randint(0, 100, N_EVENTS)],
    }))

    # documents: word-soup over the 31-word vocab, 8–100 words
    n_words = rng.randint(8, 101, N_DOCS)
    texts = [
        " ".join(
            VOCAB[j] for j in rng.randint(0, len(VOCAB), n_words[i])
        )
        for i in range(N_DOCS)
    ]
    write("documents", pa.table({
        "doc_id": pa.array(np.arange(N_DOCS), pa.int64()),
        "text": texts,
        "lang": [LANGS[i] for i in rng.randint(0, len(LANGS), N_DOCS)],
        "source": [f"src{i}" for i in rng.randint(0, 20, N_DOCS)],
        "n_chars": pa.array([len(t) for t in texts], pa.int64()),
    }))

    emb = rng.standard_normal((N_EMB, 64)).astype(np.float32)
    write("embeddings", pa.table({
        "vec_id": pa.array(np.arange(N_EMB), pa.int64()),
        "embedding": pa.array(
            [e.tolist() for e in emb], pa.list_(pa.float32())
        ),
        "label": pa.array(rng.randint(0, 10, N_EMB), pa.int32()),
    }))


if __name__ == "__main__":
    main()
