"""Generate an sfN-equivalent fixture set by key-offset replication of
the driver's sf0.1 tables (VERDICT r10 task 1: the 100 TB story needs a
measurement ABOVE sf0.1, and the driver ships nothing bigger).

Replication, not re-synthesis: every copy k of a fact/dim row is the
original row with its primary and foreign keys offset by k*stride
(stride = 1 + max key, so copies never collide), which preserves the
driver fixtures' value distributions, join fan-outs, NULL patterns and
skew EXACTLY — a 10x run then measures scale, not a different dataset.
Referential integrity holds because every FK is offset by ITS parent's
stride, so copy k's lineitems join copy k's orders/parts/suppliers.

Per-table decisions (TPC-H conventions + workload-shape reasoning):
- region/nation: single copy — fixed-size dims at every TPC-H SF.
- customer/supplier/part/orders/lineitem: key-offset copies; dates and
  measures untouched (10x density per date == scaling the business).
- events: event_id and user_id both offset (user cardinality must grow
  with scale or per-user windows develop artificial skew).
- documents: doc_id offset AND the text re-tokenized per copy with a
  copy-suffix on every token (`w` -> `w~k`).  The suffix is a token
  BIJECTION: within-copy token-set Jaccard — what the MinHash/LSH and
  ngram dedup family estimates (operators/dedup.py _SHINGLE_W=1) — is
  preserved exactly, while cross-copy token sets are disjoint, so the
  near-dup pair count scales LINEARLY (x10) like a real corpus instead
  of quadratically (10 verbatim copies of every doc would make every
  LSH bucket 10x deeper and candidate pairs 100x — a duplicated-corpus
  stress test, not a scale-up).  n_chars is recomputed (== len(text),
  the fixture invariant).  lang/source distributions untouched.
- embeddings: vec_id offset; vector np.roll'ed by k (norm-preserving,
  decorrelates copies so cosine top-k neighbours stay within-copy and
  ANN cell/bucket occupancy scales instead of collapsing onto 10-way
  exact ties); label untouched.

Output: one PLAIN parquet file per table (DuckDB `read_parquet` needs a
file, not a directory) with bounded row groups so Spark's scan can
split it (`spark.sql.files.maxPartitionBytes`) — the driver's sf0.1
files are single-row-group, which is exactly the single-task-scan floor
the soak must NOT inherit at 10x.

Usage: python scripts/gen_scale_fixtures.py [--mult 10] [--out DIR]
      [--src /root/testdata/sf0.1]
Deterministic — no RNG anywhere; rerunning overwrites byte-identically.
Properties (FK integrity, token bijection, n_chars invariant, norm
preservation) are pinned by tests/test_scale_fixtures.py at mult=2
over sf0.001.
"""
from __future__ import annotations

import argparse
import os
import re

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"

# (table, [key columns to offset, each by its OWN table-of-origin stride])
KEYED = {
    "customer": {"c_custkey": "customer"},
    "supplier": {"s_suppkey": "supplier"},
    "part": {"p_partkey": "part"},
    "orders": {"o_orderkey": "orders", "o_custkey": "customer"},
    "lineitem": {"l_orderkey": "orders", "l_partkey": "part",
                 "l_suppkey": "supplier"},
    "events": {"event_id": "events", "user_id": "events_user"},
    "documents": {"doc_id": "documents"},
    "embeddings": {"vec_id": "embeddings"},
}
PK = {"customer": "c_custkey", "supplier": "s_suppkey",
      "part": "p_partkey", "orders": "o_orderkey",
      "events": "event_id", "documents": "doc_id",
      "embeddings": "vec_id"}
FIXED = ("region", "nation")


def _strides(tables: dict[str, pd.DataFrame]) -> dict[str, int]:
    s = {name: int(tables[name][col].max()) + 1 for name, col in PK.items()}
    s["events_user"] = int(tables["events"]["user_id"].max()) + 1
    return s


def _suffix_tokens(text: str | None, k: int) -> str | None:
    if text is None:
        return None
    return re.sub(r"\S+", lambda m: f"{m.group(0)}~{k}", text)


def replicate(mult: int, out_dir: str, src: str = SRC) -> None:
    os.makedirs(out_dir, exist_ok=True)
    tables = {t: pd.read_parquet(os.path.join(src, f"{t}.parquet"))
              for t in list(KEYED) + list(FIXED)}
    strides = _strides(tables)

    for t in FIXED:
        _write(out_dir, t, tables[t], src)

    for t, fks in KEYED.items():
        base = tables[t]
        copies = []
        for k in range(mult):
            c = base.copy(deep=False)
            for col, origin in fks.items():
                c[col] = base[col] + k * strides[origin]
            if t == "documents" and k > 0:
                txt = base["text"].map(lambda s, k=k: _suffix_tokens(s, k))
                c["text"] = txt
                c["n_chars"] = txt.str.len().astype("int64")
            if t == "embeddings" and k > 0:
                c["embedding"] = base["embedding"].map(
                    lambda v, k=k: np.roll(np.asarray(v), k))
            copies.append(c)
        _write(out_dir, t, pd.concat(copies, ignore_index=True), src)


def _write(out_dir: str, t: str, df: pd.DataFrame,
           src: str = SRC) -> None:
    # carry the SOURCE file's arrow schema so types (int32 keys, float
    # list embeddings, us timestamps) survive the pandas round-trip
    want = pq.ParquetFile(os.path.join(src, f"{t}.parquet")).schema_arrow
    want = pa.schema([want.field(i) for i in range(len(want.names))])
    tab = pa.Table.from_pandas(df, schema=want, preserve_index=False)
    rg = max(65536, len(df) // 32)
    pq.write_table(tab, os.path.join(out_dir, f"{t}.parquet"),
                   row_group_size=rg, compression="snappy")
    f = pq.ParquetFile(os.path.join(out_dir, f"{t}.parquet"))
    print(f"{t}: {f.metadata.num_rows} rows, {f.metadata.num_row_groups} rg")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--mult", type=int, default=10)
    ap.add_argument("--out", default="/root/repo/.soak/sf1")
    ap.add_argument("--src", default=SRC)
    a = ap.parse_args()
    replicate(a.mult, a.out, a.src)
