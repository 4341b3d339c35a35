"""Generate an sfN-LIKE test-table directory for optimization timing.

The driver's round-end measurement escalates to a driver-generated scale
factor (BENCH_r06.json: sf 1.0) whose generator we do not have; this tool
synthesizes tables with the SAME schemas and measured distributions as
/root/testdata/sf0.1 (see OPTIMIZATION_r07.md §measurement) at a chosen
multiple, so per-query timings can be taken at driver-like scale.

TIMING ONLY — correctness oracles keep running on the pristine
/root/testdata/sf* dirs; nothing in the engine reads this output.

Usage: python tools/gen_scale_data.py <out_dir> <multiple-of-sf0.1>
e.g.   python tools/gen_scale_data.py /dev/shm/sfX10 10
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

VOCAB = (
    "a agg batch big column customer data dup fast filter group hash join "
    "key line merge order part query row scan slow small sort spark stream "
    "table the value vector window"
).split()
LANGS = ["en"] * 8 + ["zh"] * 3 + ["es"] * 3 + ["fr"] * 3 + ["de"] * 3


def gen_documents(rng, n, out):
    # uniform word choice from the 31-word vocab ('dup' downweighted as
    # measured), doc length uniform 10..100, 20 sources
    probs = np.full(len(VOCAB), 1.0 / len(VOCAB))
    probs[VOCAB.index("dup")] = 0.001
    probs /= probs.sum()
    lens = rng.integers(10, 101, n)
    total = int(lens.sum())
    words = rng.choice(np.array(VOCAB), size=total, p=probs)
    texts, pos = [], 0
    for ln in lens:
        texts.append(" ".join(words[pos:pos + ln]))
        pos += ln
    # a sprinkle of exact duplicates (measured ~0.16%)
    for i in rng.choice(n, max(1, n // 600), replace=False):
        texts[int(i)] = texts[int(rng.integers(0, n))]
    tb = pa.table({
        "doc_id": pa.array(np.arange(n), pa.int64()),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array([LANGS[int(x)] for x in rng.integers(0, len(LANGS), n)], pa.string()),
        "source": pa.array([f"src{int(x)}" for x in rng.integers(0, 20, n)], pa.string()),
        "n_chars": pa.array([len(t) for t in texts], pa.int64()),
    })
    pq.write_table(tb, out)


def gen_embeddings(rng, n, out):
    v = rng.standard_normal((n, 64)).astype(np.float32)
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    tb = pa.table({
        "vec_id": pa.array(np.arange(n), pa.int64()),
        "embedding": pa.array(list(v), pa.list_(pa.float32())),
        "label": pa.array(rng.integers(0, 10, n).astype(np.int32), pa.int32()),
    })
    pq.write_table(tb, out)


def gen_tpch(rng, mult, d):
    n_cust, n_ord, n_li = 15000 * mult, 150000 * mult, 600000 * mult
    n_part, n_supp = 20000 * mult, 1000 * mult
    seg = np.array(["FURNITURE", "MACHINERY", "AUTOMOBILE", "BUILDING", "HOUSEHOLD"])
    pq.write_table(pa.table({
        "c_custkey": pa.array(np.arange(n_cust), pa.int64()),
        "c_name": pa.array([f"Customer#{i:09d}" for i in range(n_cust)]),
        "c_nationkey": pa.array(rng.integers(0, 25, n_cust).astype(np.int32), pa.int32()),
        "c_acctbal": pa.array(np.round(rng.uniform(-999, 9999, n_cust), 2)),
        "c_mktsegment": pa.array(seg[rng.integers(0, 5, n_cust)]),
    }), f"{d}/customer.parquet")
    stat = np.array(["O", "F", "P"])
    prio = np.array(["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"])
    base = np.datetime64("1995-01-01")
    pq.write_table(pa.table({
        "o_orderkey": pa.array(np.arange(n_ord), pa.int64()),
        "o_custkey": pa.array(rng.integers(0, n_cust, n_ord), pa.int64()),
        "o_orderstatus": pa.array(stat[rng.integers(0, 3, n_ord)]),
        "o_totalprice": pa.array(np.round(rng.uniform(900, 450000, n_ord), 2)),
        "o_orderdate": pa.array(base + rng.integers(0, 2405, n_ord).astype("timedelta64[D]")),
        "o_orderpriority": pa.array(prio[rng.integers(0, 5, n_ord)]),
    }), f"{d}/orders.parquet")
    rf = np.array(["N", "R", "A"])
    ls = np.array(["F", "O"])
    pq.write_table(pa.table({
        "l_orderkey": pa.array(rng.integers(0, n_ord, n_li), pa.int64()),
        "l_partkey": pa.array(rng.integers(0, n_part, n_li), pa.int64()),
        "l_suppkey": pa.array(rng.integers(0, n_supp, n_li), pa.int64()),
        "l_linenumber": pa.array(rng.integers(1, 8, n_li).astype(np.int32), pa.int32()),
        "l_quantity": pa.array(rng.integers(1, 51, n_li).astype(np.float64)),
        "l_extendedprice": pa.array(np.round(rng.uniform(900, 105000, n_li), 2)),
        "l_discount": pa.array(np.round(rng.integers(0, 11, n_li) * 0.01, 2)),
        "l_tax": pa.array(np.round(rng.integers(0, 9, n_li) * 0.01, 2)),
        "l_returnflag": pa.array(rf[rng.integers(0, 3, n_li)]),
        "l_linestatus": pa.array(ls[rng.integers(0, 2, n_li)]),
        "l_shipdate": pa.array(base + rng.integers(1, 2500, n_li).astype("timedelta64[D]")),
    }), f"{d}/lineitem.parquet")
    pq.write_table(pa.table({
        "p_partkey": pa.array(np.arange(n_part), pa.int64()),
        "p_name": pa.array([f"part {i}" for i in range(n_part)]),
        "p_brand": pa.array([f"Brand#{int(x)}" for x in rng.integers(10, 56, n_part)]),
        "p_type": pa.array([f"TYPE {int(x)}" for x in rng.integers(0, 150, n_part)]),
        "p_size": pa.array(rng.integers(1, 51, n_part).astype(np.int32), pa.int32()),
        "p_retailprice": pa.array(np.round(rng.uniform(900, 2000, n_part), 2)),
    }), f"{d}/part.parquet")
    pq.write_table(pa.table({
        "s_suppkey": pa.array(np.arange(n_supp), pa.int64()),
        "s_name": pa.array([f"Supplier#{i:09d}" for i in range(n_supp)]),
        "s_nationkey": pa.array(rng.integers(0, 25, n_supp).astype(np.int32), pa.int32()),
        "s_acctbal": pa.array(np.round(rng.uniform(-999, 9999, n_supp), 2)),
    }), f"{d}/supplier.parquet")
    pq.write_table(pa.table({
        "n_nationkey": pa.array(np.arange(25, dtype=np.int64), pa.int32()),
        "n_name": pa.array([f"NATION{i}" for i in range(25)]),
        "n_regionkey": pa.array((np.arange(25) % 5).astype(np.int32), pa.int32()),
    }), f"{d}/nation.parquet")
    pq.write_table(pa.table({
        "r_regionkey": pa.array(np.arange(5).astype(np.int32), pa.int32()),
        "r_name": pa.array([f"REGION{i}" for i in range(5)]),
    }), f"{d}/region.parquet")


def gen_events(rng, n, n_users, d):
    types = np.array(["view", "click", "purchase", "signup", "error"])
    base = np.datetime64("2024-01-01T00:00:00", "us")
    span_us = 30 * 86400 * 1_000_000
    ts = base + np.sort(rng.integers(0, span_us, n)).astype("timedelta64[us]")
    pq.write_table(pa.table({
        "event_id": pa.array(np.arange(n), pa.int64()),
        "ts": pa.array(ts),
        "user_id": pa.array(rng.integers(0, n_users, n), pa.int64()),
        "event_type": pa.array(types[rng.integers(0, 5, n)]),
        "value": pa.array(np.round(rng.uniform(0, 100, n), 3)),
        "props": pa.array([f'{{"k": {int(x)}}}' for x in rng.integers(0, 100, n)]),
    }), f"{d}/events.parquet")


def main():
    out, mult = sys.argv[1], int(sys.argv[2])
    os.makedirs(out, exist_ok=True)
    rng = np.random.default_rng(7)
    gen_documents(rng, 5000 * mult, f"{out}/documents.parquet")
    gen_embeddings(rng, 2000 * mult, f"{out}/embeddings.parquet")
    gen_tpch(rng, mult, out)
    gen_events(rng, 100000 * mult, 1500 * mult, out)
    open(f"{out}/_DONE", "w").close()
    print(f"wrote {out} at {mult}x sf0.1")


if __name__ == "__main__":
    main()
