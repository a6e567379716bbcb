#!/usr/bin/env python3
"""Generate scale-probe fixtures (SCALE x sf0.1; SCALE=10 -> sf1,
SCALE=100 -> sf10) for the heavy tables — events, documents,
embeddings — plus sf0.1 copies of the dimension/TPC-H tables, into an
sf-dir layout Verify/Bench/check.py can point at directly.

Seed-deterministic (seed=42), matched to the driver fixtures'
measured shapes (schemas, value distributions, monotone event ts,
unit-norm embeddings, doc vocab + planted near-dups). This is a SCALE
probe, not a correctness oracle transfer: check.py re-derives the
DuckDB oracle on this same data, so the probe is self-consistent; the
distributions only need to stress the same plan shapes 10x harder.

Usage: python3 scripts/gen_sf1.py [outDir] [scale]   (default: testdata_sf1 10)
"""
import os
import shutil
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"
OUT = sys.argv[1] if len(sys.argv) > 1 else "testdata_sf1"
SCALE = int(sys.argv[2]) if len(sys.argv) > 2 else 10

N_EVENTS = 100_000 * SCALE
N_USERS = 1_500 * SCALE
N_DOCS = 5_000 * SCALE
N_VECS = 2_000 * SCALE
DIM = 64

VOCAB = ("spark window merge table column vector stream value data small "
         "join filter big group hash customer sort order slow line part "
         "fast the row agg key query a scan batch").split()
EVENT_TYPES = ["signup", "purchase", "view", "click", "error"]
T0 = np.datetime64("2024-01-01T00:00:00", "us").astype(np.int64)
T1 = np.datetime64("2024-01-31T00:00:00", "us").astype(np.int64)


def gen_events(rng):
    ts = np.sort(rng.integers(T0, T1, N_EVENTS))  # monotone event log
    value = np.round(rng.exponential(50.0, N_EVENTS), 2)
    k = rng.integers(0, 100, N_EVENTS)
    tbl = pa.table({
        "event_id": pa.array(np.arange(N_EVENTS), pa.int64()),
        "ts": pa.array(ts, pa.timestamp("us")),
        "user_id": pa.array(rng.integers(0, N_USERS, N_EVENTS), pa.int64()),
        "event_type": pa.array(
            np.array(EVENT_TYPES)[rng.integers(0, 5, N_EVENTS)]),
        "value": pa.array(value, pa.float64()),
        "props": pa.array(['{"k": %d}' % x for x in k]),
    })
    pq.write_table(tbl, f"{OUT}/events.parquet")


def gen_documents(rng):
    langs = np.array(["en", "zh", "fr", "es", "de"])
    lang_p = [0.41, 0.1475, 0.1475, 0.1475, 0.1475]
    texts = []
    for i in range(N_DOCS):
        r = rng.random()
        if i > 10 and r < 0.0016:  # exact duplicate of an earlier doc
            texts.append(texts[rng.integers(0, i)])
        elif i > 10 and r < 0.0116:  # near-dup: copy + planted 'dup' marks
            words = texts[rng.integers(0, i)].split()
            for pos in rng.integers(0, len(words), 3):
                words[pos] = "dup"
            texts.append(" ".join(words))
        else:
            n = rng.integers(8, 106)
            texts.append(" ".join(np.array(VOCAB)[rng.integers(0, len(VOCAB), n)]))
    tbl = pa.table({
        "doc_id": pa.array(np.arange(N_DOCS), pa.int64()),
        "text": pa.array(texts),
        "lang": pa.array(langs[rng.choice(5, N_DOCS, p=lang_p)]),
        "source": pa.array(["src%d" % s for s in rng.integers(0, 20, N_DOCS)]),
        "n_chars": pa.array([len(t) for t in texts], pa.int64()),
    })
    pq.write_table(tbl, f"{OUT}/documents.parquet")


def gen_embeddings(rng):
    v = rng.standard_normal((N_VECS, DIM)).astype(np.float32)
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    tbl = pa.table({
        "vec_id": pa.array(np.arange(N_VECS), pa.int64()),
        "embedding": pa.array(list(v), pa.list_(pa.float32())),
        "label": pa.array(rng.integers(0, 10, N_VECS), pa.int32()),
    })
    pq.write_table(tbl, f"{OUT}/embeddings.parquet")


def main():
    os.makedirs(OUT, exist_ok=True)
    rng = np.random.default_rng(42)
    gen_events(rng)
    gen_documents(rng)
    gen_embeddings(rng)
    # dims / TPC-H tables stay at sf0.1 — the probe scales the heavy
    # tables; relational queries are not in the sf1 subset
    for t in ["region", "nation", "customer", "supplier", "part",
              "orders", "lineitem"]:
        shutil.copyfile(f"{SRC}/{t}.parquet", f"{OUT}/{t}.parquet")
    for t in ["events", "documents", "embeddings"]:
        n = pq.ParquetFile(f"{OUT}/{t}.parquet").metadata.num_rows
        print(f"{t}: {n} rows")


if __name__ == "__main__":
    main()
