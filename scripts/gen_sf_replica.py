"""Deterministic sf1.0 TIMING replica, scaled from /root/testdata/sf0.1.

Usage: python scripts/gen_sf_replica.py   (writes /root/sf1.0)

NOT the driver's generator — a workload-shape replica for local measurement
only (the driver regenerates its own sf1.0 at round end).  Key properties
reproduced: dense 0..N-1 keys, same date/time ranges, Poisson(~4) lines per
order, 31-word document vocab with ~4.7% shared-prefix near-dups and ~0.16%
exact dups, per-label Gaussian embeddings (x4 per decade), single parquet
file per table with default (~1M-row) row groups.
"""
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import os, json

SRC = "/root/testdata/sf0.1"
DST = "/root/sf1.0"
os.makedirs(DST, exist_ok=True)
rng = np.random.default_rng(4242)


def read(name, cols=None):
    return pq.read_table(f"{SRC}/{name}.parquet", columns=cols).to_pandas()


def write(name, df, schema_src):
    src_schema = pq.ParquetFile(f"{SRC}/{schema_src}.parquet").schema_arrow
    t = pa.Table.from_pandas(df, preserve_index=False).cast(
        pa.schema([src_schema.field(i) for i in range(len(src_schema.names))]))
    pq.write_table(t, f"{DST}/{name}.parquet")
    print(name, len(df), "rows ->", os.path.getsize(f"{DST}/{name}.parquet") // 1024, "KB")


def resample(series, n):
    vals = series.to_numpy()
    return vals[rng.integers(0, len(vals), n)]


# --- tiny dims: copy ---
for name in ("region", "nation"):
    pq.write_table(pq.read_table(f"{SRC}/{name}.parquet"), f"{DST}/{name}.parquet")
    print(name, "copied")

N_CUST, N_SUPP, N_PART, N_ORD, N_LI, N_EV, N_DOC, N_EMB = (
    150_000, 10_000, 200_000, 1_500_000, 6_000_000, 1_000_000, 50_000, 8_000)

# --- customer ---
c = read("customer")
cust = pd.DataFrame({
    "c_custkey": np.arange(N_CUST, dtype=np.int64),
    "c_name": [f"Customer#{i:09d}" for i in range(N_CUST)],
    "c_nationkey": resample(c.c_nationkey, N_CUST),
    "c_acctbal": resample(c.c_acctbal, N_CUST),
    "c_mktsegment": resample(c.c_mktsegment, N_CUST),
})
write("customer", cust, "customer")

# --- supplier ---
s = read("supplier")
supp = pd.DataFrame({
    "s_suppkey": np.arange(N_SUPP, dtype=np.int64),
    "s_name": [f"Supplier#{i:09d}" for i in range(N_SUPP)],
    "s_nationkey": resample(s.s_nationkey, N_SUPP),
    "s_acctbal": resample(s.s_acctbal, N_SUPP),
})
write("supplier", supp, "supplier")

# --- part ---
p = read("part")
part = pd.DataFrame({
    "p_partkey": np.arange(N_PART, dtype=np.int64),
    "p_name": resample(p.p_name, N_PART),
    "p_brand": resample(p.p_brand, N_PART),
    "p_type": resample(p.p_type, N_PART),
    "p_size": resample(p.p_size, N_PART),
    "p_retailprice": resample(p.p_retailprice, N_PART),
})
write("part", part, "part")

# --- orders ---
o = read("orders")
odate = resample(o.o_orderdate, N_ORD)
orders = pd.DataFrame({
    "o_orderkey": np.arange(N_ORD, dtype=np.int64),
    "o_custkey": rng.integers(0, N_CUST, N_ORD),
    "o_orderstatus": resample(o.o_orderstatus, N_ORD),
    "o_totalprice": resample(o.o_totalprice, N_ORD),
    "o_orderdate": odate,
    "o_orderpriority": resample(o.o_orderpriority, N_ORD),
})
write("orders", orders, "orders")

# --- lineitem ---
li = read("lineitem")
okey = np.sort(rng.integers(0, N_ORD, N_LI))
lin = pd.DataFrame({
    "l_orderkey": okey,
    "l_partkey": rng.integers(0, N_PART, N_LI),
    "l_suppkey": rng.integers(0, N_SUPP, N_LI),
    "l_quantity": resample(li.l_quantity, N_LI),
    "l_extendedprice": resample(li.l_extendedprice, N_LI),
    "l_discount": resample(li.l_discount, N_LI),
    "l_tax": resample(li.l_tax, N_LI),
    "l_returnflag": resample(li.l_returnflag, N_LI),
    "l_linestatus": resample(li.l_linestatus, N_LI),
    "l_shipdate": resample(li.l_shipdate, N_LI),
})
lin["l_linenumber"] = (lin.groupby("l_orderkey").cumcount() + 1).astype(np.int32)
lin = lin[[c for c in li.columns]]
write("lineitem", lin, "lineitem")

# --- events ---
ev = read("events")
ts0 = ev.ts.min().value
ts1 = ev.ts.max().value
ts = np.sort(rng.integers(ts0, ts1, N_EV))
ts = (ts // 1000) * 1000  # whole microseconds so the us cast is lossless
events = pd.DataFrame({
    "event_id": np.arange(N_EV, dtype=np.int64),
    "ts": pd.to_datetime(ts),
    "user_id": rng.integers(0, 15_000, N_EV),
    "event_type": resample(ev.event_type, N_EV),
    "value": resample(ev.value, N_EV),
    "props": [f'{{"k": {k}}}' for k in rng.integers(0, 100, N_EV)],
})
write("events", events, "events")

# --- documents ---
d = read("documents")
words = pd.Series(" ".join(d.text).split())
vocab, wcounts = np.unique(words.to_numpy(), return_counts=True)
wp = wcounts / wcounts.sum()
lens = np.array([len(t.split()) for t in d.text])
doc_lens = lens[rng.integers(0, len(lens), N_DOC)]
texts = []
for L in doc_lens:
    texts.append(" ".join(vocab[rng.choice(len(vocab), L, p=wp)]))
# plant near-dups (~4.7%): overwrite with a copy of an earlier doc, mutating the tail
n_near = int(N_DOC * 0.047)
idx = rng.choice(np.arange(1, N_DOC), n_near, replace=False)
for i in idx:
    src_i = rng.integers(0, i)
    w = texts[src_i].split()
    k = max(1, len(w) // 10)
    tail = vocab[rng.choice(len(vocab), k, p=wp)]
    texts[i] = " ".join(w[:-k] + list(tail))
# plant exact dups (~0.16%)
for i in rng.choice(np.arange(1, N_DOC), int(N_DOC * 0.0016), replace=False):
    texts[i] = texts[rng.integers(0, i)]
docs = pd.DataFrame({
    "doc_id": np.arange(N_DOC, dtype=np.int64),
    "text": texts,
    "lang": resample(d.lang, N_DOC),
    "source": [f"src{i}" for i in rng.integers(0, 20, N_DOC)],
})
docs["n_chars"] = docs.text.str.len().astype(np.int64)
write("documents", docs, "documents")

# --- embeddings ---
e = read("embeddings")
emb = np.stack(e.embedding.to_numpy())
labels = e.label.to_numpy()
new_labels = resample(e.label, N_EMB)
out = np.empty((N_EMB, emb.shape[1]), dtype=np.float32)
for lab in np.unique(labels):
    mu = emb[labels == lab].mean(0)
    sd = emb[labels == lab].std(0) + 1e-6
    m = new_labels == lab
    out[m] = (mu + sd * rng.standard_normal((m.sum(), emb.shape[1]))).astype(np.float32)
embdf = pd.DataFrame({
    "vec_id": np.arange(N_EMB, dtype=np.int64),
    "embedding": [out[i] for i in range(N_EMB)],
    "label": new_labels,
})
write("embeddings", embdf, "embeddings")

open(f"{DST}/_DONE", "w").close()
print("done")
