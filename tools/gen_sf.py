#!/usr/bin/env python3
"""Dev-only generator for LARGER scale factors of the driver's synthetic
tables (TESTDATA.md). The driver's own /root/testdata is read-only and tops
out at sf0.1; scale-evidence runs (SURVEY §6) need sf >= 1. This mirrors the
observed shapes of the driver data — same schemas (incl. timestamp[ns]
events), same fixed 31-word document vocabulary, 20 sources, 5 langs,
unit-normalized 64-dim float32 embeddings with injected near-dups, same
linear row scaling (lineitem 6M/sf, events 1M/sf with 15k users/sf,
documents 50k/sf, embeddings 20k/sf) — so per-key timings are comparable
with the sf0.1 bench, just bigger. NOT part of the shipped library; NOT a
replacement for the driver's data (correctness still gates on sf0.01).

Usage: python3 tools/gen_sf.py <sf> <outdir> [--zipf | --zipf-graph]
       e.g. 1 /root/repo/data/sf1

--zipf: write ONLY the documents table, drawn from a 50k-word Zipfian
(power-law) vocabulary instead of the driver's fixed 31 words, same
length/near-dup/exact-dup structure. Purpose (SURVEY §6): the shingle
dedups' sf5 superlinearity is diagnosed as a uniform-df artifact of the
31-word vocabulary (every shingle's df ≈ 450, so ANY single-shingle
candidate scheme eats the Σ cdf·fdf posting-collision stream); a natural
corpus has power-law df, almost all shingles rare, and the same plans
should scale ~linearly. The zipf dirs exist to measure exactly that.

--zipf-graph: write ONLY region/nation/orders/lineitem (the inputs the
graph family builds its customer<->supplier edges from), with o_custkey
and l_suppkey drawn ZIPFIAN (alpha=1.2) instead of uniform — a web-graph
degree skew where the top supplier absorbs ~15-20%% of all lineitems.
Purpose (r14 verdict item): the TPC-H-derived graph the loops are benched
on has a benign (near-uniform) degree distribution, so `hash(src, N)`
partitioning looks safe by construction; at 100 TB web-graph skew a hub's
entire edge list lands in ONE task. This fixture measures exactly that
failure mode on q_pagerank/q_hits/q_label_prop — same row counts as the
default mode, one changed variable (the key distributions).
"""
import sys, json
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

sf = float(sys.argv[1])
out = sys.argv[2]
zipf = "--zipf" in sys.argv[3:]
zipf_graph = "--zipf-graph" in sys.argv[3:]
rng = np.random.default_rng(42)
import os
os.makedirs(out, exist_ok=True)

N_NATION, N_REGION = 25, 5
n_cust = int(150_000 * sf)
n_supp = int(10_000 * sf)
n_part = int(200_000 * sf)
n_ord = int(1_500_000 * sf)
n_li = int(6_000_000 * sf)
n_ev = int(1_000_000 * sf)
n_users = int(15_000 * sf)
n_docs = max(500, int(50_000 * sf))
n_vecs = max(500, int(20_000 * sf))

def write(name, table):
    pq.write_table(table, f"{out}/{name}.parquet")
    print(name, table.num_rows)

if zipf:
    # Zipfian vocabulary: 50k words, p(rank k) ∝ 1/k^1.1 — the standard
    # natural-text shape. Document structure (lengths, 2.5% mutated
    # near-dups, 0.2% exact dups) matches the default mode exactly, so a
    # probe on this dir isolates ONE variable: the vocabulary's df curve.
    V = 50_000
    zvocab = np.array([f"w{i:05d}" for i in range(V)])
    zp = 1.0 / np.arange(1, V + 1) ** 1.1
    zcdf = np.cumsum(zp / zp.sum())
    # one inverse-CDF lookup per word via searchsorted (rng.choice(p=...)
    # would rebuild the 50k-entry CDF per call — O(n_docs x V))
    def zdraw(k):
        return zvocab[np.searchsorted(zcdf, rng.random(k), side="right")]
    texts = []
    lens = rng.integers(10, 101, n_docs)
    for i in range(n_docs):
        r = rng.random()
        if i > 10 and r < 0.002:
            texts.append(texts[rng.integers(0, i)])
        elif i > 10 and r < 0.025:
            w = texts[rng.integers(0, i)].split(" ")
            for wd in zdraw(2):
                w[rng.integers(0, len(w))] = wd
            texts.append(" ".join(w))
        else:
            texts.append(" ".join(zdraw(lens[i])))
    write("documents", pa.table({
        "doc_id": pa.array(np.arange(n_docs), pa.int64()),
        "text": texts,
        "lang": pa.array(rng.choice(np.array(["en", "zh", "fr", "es", "de"]),
                                    n_docs, p=[0.41, 0.15, 0.15, 0.15, 0.14])),
        "source": pa.array([f"src{i % 20}" for i in range(n_docs)]),
        "n_chars": pa.array(np.array([len(t) for t in texts]), pa.int64()),
    }))
    print("done (zipf documents only)", out)
    sys.exit(0)

if zipf_graph:
    # power-law key draw: p(rank k) ∝ 1/k^1.2 over n ids, one
    # inverse-CDF searchsorted per row (the --zipf trick). Ranks are
    # SHUFFLED onto ids so the hub keys are not 0,1,2,... — partition
    # placement must not accidentally correlate with key order.
    def zipf_keys(n_ids, n_rows):
        p = 1.0 / np.arange(1, n_ids + 1) ** 1.2
        cdf = np.cumsum(p / p.sum())
        perm = rng.permutation(n_ids)
        return perm[np.searchsorted(cdf, rng.random(n_rows), side="right")]
    for t in ("region", "nation"):
        write(t, pq.read_table(f"/root/testdata/sf0.1/{t}.parquet"))
    odate = (d0z := np.datetime64("1995-01-01").astype("datetime64[ms]").astype(np.int64)) + \
        rng.integers(0, 2400, n_ord) * 86_400_000
    write("orders", pa.table({
        "o_orderkey": pa.array(np.arange(n_ord), pa.int64()),
        "o_custkey": pa.array(zipf_keys(n_cust, n_ord), pa.int64()),
        "o_orderstatus": pa.array(np.array(["O", "P", "F"])[rng.integers(0, 3, n_ord)]),
        "o_totalprice": np.round(rng.uniform(1000, 500_000, n_ord), 2),
        "o_orderdate": pa.array(odate, pa.timestamp("ms")),
        "o_orderpriority": pa.array(np.array(
            ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"])[
            rng.integers(0, 5, n_ord)]),
    }))
    lo = rng.integers(0, n_ord, n_li)
    lo.sort()
    write("lineitem", pa.table({
        "l_orderkey": pa.array(lo, pa.int64()),
        "l_partkey": pa.array(rng.integers(0, n_part, n_li), pa.int64()),
        "l_suppkey": pa.array(zipf_keys(n_supp, n_li), pa.int64()),
        "l_linenumber": pa.array(np.ones(n_li, np.int32), pa.int32()),
        "l_quantity": rng.integers(1, 51, n_li).astype(np.float64),
        "l_extendedprice": np.round(rng.uniform(900, 105_000, n_li), 2),
        "l_discount": np.round(rng.integers(0, 11, n_li) / 100.0, 2),
        "l_tax": np.round(rng.integers(0, 9, n_li) / 100.0, 2),
        "l_returnflag": pa.array(np.array(["A", "N", "R"])[rng.integers(0, 3, n_li)]),
        "l_linestatus": pa.array(np.array(["O", "F"])[rng.integers(0, 2, n_li)]),
        "l_shipdate": pa.array(odate[lo] + rng.integers(1, 96, n_li) * 86_400_000,
                               pa.timestamp("ms")),
    }))
    print("done (zipf-graph orders+lineitem only)", out)
    sys.exit(0)

# region / nation: copy the driver's literal tables (fixed at every sf)
for t in ("region", "nation"):
    write(t, pq.read_table(f"/root/testdata/sf0.1/{t}.parquet"))

SEGS = ["MACHINERY", "AUTOMOBILE", "HOUSEHOLD", "BUILDING", "FURNITURE"]
write("customer", pa.table({
    "c_custkey": pa.array(np.arange(n_cust), pa.int64()),
    "c_name": [f"Customer#{i:09d}" for i in range(n_cust)],
    "c_nationkey": pa.array(rng.integers(0, N_NATION, n_cust), pa.int32()),
    "c_acctbal": np.round(rng.uniform(-999, 9999, n_cust), 2),
    "c_mktsegment": pa.array(np.array(SEGS)[rng.integers(0, 5, n_cust)]),
}))

write("supplier", pa.table({
    "s_suppkey": pa.array(np.arange(n_supp), pa.int64()),
    "s_name": [f"Supplier#{i:09d}" for i in range(n_supp)],
    "s_nationkey": pa.array(rng.integers(0, N_NATION, n_supp), pa.int32()),
    "s_acctbal": np.round(rng.uniform(-999, 9999, n_supp), 2),
}))

ADJ = ["large", "hot", "blue", "small", "dim", "cold", "red", "green"]
NOUN = ["ring", "bolt", "case", "disk", "tube", "cap", "clip", "pin"]
write("part", pa.table({
    "p_partkey": pa.array(np.arange(n_part), pa.int64()),
    "p_name": [f"{ADJ[i % 8]} {NOUN[(i // 8) % 8]}" for i in range(n_part)],
    "p_brand": pa.array([f"Brand#{i % 25}" for i in range(n_part)]),
    "p_type": pa.array(np.array(
        ["LARGE", "ECONOMY", "SMALL", "STANDARD", "MEDIUM", "PROMO"])[
        rng.integers(0, 6, n_part)]),
    "p_size": pa.array(rng.integers(1, 51, n_part), pa.int32()),
    "p_retailprice": np.round(900.0 + 0.1 * (np.arange(n_part) % 11000), 2),
}))

day_ms = 86_400_000
d0 = np.datetime64("1995-01-01").astype("datetime64[ms]").astype(np.int64)
d1 = np.datetime64("2001-08-01").astype("datetime64[ms]").astype(np.int64)
odate = (d0 + (rng.integers(0, (d1 - d0) // day_ms + 1, n_ord)) * day_ms)
write("orders", pa.table({
    "o_orderkey": pa.array(np.arange(n_ord), pa.int64()),
    "o_custkey": pa.array(rng.integers(0, n_cust, n_ord), pa.int64()),
    "o_orderstatus": pa.array(np.array(["O", "P", "F"])[rng.integers(0, 3, n_ord)]),
    "o_totalprice": np.round(rng.uniform(1000, 500_000, n_ord), 2),
    "o_orderdate": pa.array(odate, pa.timestamp("ms")),
    "o_orderpriority": pa.array(np.array(
        ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"])[
        rng.integers(0, 5, n_ord)]),
}))

# lineitem: ~4 lines/order (Poisson), shipdate = orderdate + 1..95 days
lo = rng.integers(0, n_ord, n_li)
lo.sort()
linenum = np.ones(n_li, np.int32)
same = np.concatenate([[False], lo[1:] == lo[:-1]])
run = np.zeros(n_li, np.int64)
idx = np.arange(n_li)
start = np.where(~same, idx, 0)
np.maximum.accumulate(start, out=start)
linenum = (idx - start + 1).astype(np.int32)
ship = odate[lo] + rng.integers(1, 96, n_li) * day_ms
write("lineitem", pa.table({
    "l_orderkey": pa.array(lo, pa.int64()),
    "l_partkey": pa.array(rng.integers(0, n_part, n_li), pa.int64()),
    "l_suppkey": pa.array(rng.integers(0, n_supp, n_li), pa.int64()),
    "l_linenumber": pa.array(linenum, pa.int32()),
    "l_quantity": rng.integers(1, 51, n_li).astype(np.float64),
    "l_extendedprice": np.round(rng.uniform(900, 105_000, n_li), 2),
    "l_discount": np.round(rng.integers(0, 11, n_li) / 100.0, 2),
    "l_tax": np.round(rng.integers(0, 9, n_li) / 100.0, 2),
    "l_returnflag": pa.array(np.array(["A", "N", "R"])[rng.integers(0, 3, n_li)]),
    "l_linestatus": pa.array(np.array(["O", "F"])[rng.integers(0, 2, n_li)]),
    "l_shipdate": pa.array(ship, pa.timestamp("ms")),
}))

# events: 30 days of 2024-01, ns timestamps (the driver's TIMESTAMP(NANOS)
# quirk is part of the read path under test), 5 types, exp(50) values
t0 = np.datetime64("2024-01-01").astype("datetime64[ns]").astype(np.int64)
span = 30 * 86_400 * 1_000_000_000 - 1
ets = t0 + rng.integers(0, span, n_ev)
write("events", pa.table({
    "event_id": pa.array(np.arange(n_ev), pa.int64()),
    "ts": pa.array(ets, pa.timestamp("ns")),
    "user_id": pa.array(rng.integers(0, n_users, n_ev), pa.int64()),
    "event_type": pa.array(np.array(
        ["signup", "click", "purchase", "error", "view"])[rng.integers(0, 5, n_ev)]),
    "value": np.round(np.minimum(rng.exponential(50.0, n_ev), 600.0), 2),
    "props": [json.dumps({"k": int(k)}) for k in rng.integers(0, 100, n_ev)],
}))

# documents: fixed 31-word vocabulary (pulled from the driver's own data so
# shingle/df characteristics match), 10-100 words, ~2.5% near-dups (copy an
# earlier doc, mutate 2 words) + ~0.2% exact dups — the observed structure
vocab = sorted({w for t in pq.read_table(
    "/root/testdata/sf0.1/documents.parquet", columns=["text"])["text"].to_pylist()
    for w in t.split(" ")})
assert len(vocab) == 31, len(vocab)
vocab = np.array(vocab)
LANGS = np.array(["en", "zh", "fr", "es", "de"])
lang_p = np.array([0.41, 0.15, 0.15, 0.15, 0.14])
texts, langs = [], rng.choice(LANGS, n_docs, p=lang_p)
lens = rng.integers(10, 101, n_docs)
for i in range(n_docs):
    r = rng.random()
    if i > 10 and r < 0.002:
        texts.append(texts[rng.integers(0, i)])
    elif i > 10 and r < 0.025:
        w = texts[rng.integers(0, i)].split(" ")
        for _ in range(2):
            w[rng.integers(0, len(w))] = vocab[rng.integers(0, 31)]
        texts.append(" ".join(w))
    else:
        texts.append(" ".join(vocab[rng.integers(0, 31, lens[i])]))
write("documents", pa.table({
    "doc_id": pa.array(np.arange(n_docs), pa.int64()),
    "text": texts,
    "lang": pa.array(langs),
    "source": pa.array([f"src{i % 20}" for i in range(n_docs)]),
    "n_chars": pa.array(np.array([len(t) for t in texts]), pa.int64()),
}))

# embeddings: unit-normalized 64-dim float32, labels 0..9 (no cluster
# structure, matching the driver), ~1% injected near-dups (cos ~ 0.995)
dim = 64
v = rng.standard_normal((n_vecs, dim)).astype(np.float32)
ndup = n_vecs // 100
src = rng.integers(0, n_vecs, ndup)
dst = rng.integers(0, n_vecs, ndup)
v[dst] = v[src] + 0.1 * rng.standard_normal((ndup, dim)).astype(np.float32)
v /= np.linalg.norm(v, axis=1, keepdims=True)
write("embeddings", pa.table({
    "vec_id": pa.array(np.arange(n_vecs), pa.int64()),
    "embedding": pa.array(list(v), pa.list_(pa.float32())),
    "label": pa.array(rng.integers(0, 10, n_vecs), pa.int32()),
}))
print("done", out)
