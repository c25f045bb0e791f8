"""Build a K-times scaled copy of an sf directory for scale-sweep runs.

Purpose: the driver ships sf{0.001,0.01,0.1}; the 100 TB posture claims
in SCALING.md deserve a measured data point beyond sf0.1. This tool
replicates every fact table K times with per-replica key offsets so the
result behaves like a legitimately larger corpus rather than K stacked
duplicates:

- TPC-H facts (customer/orders/lineitem/part/supplier): every key column
  gets a per-replica offset of exactly (max_key + 1), so FK integrity
  holds within each replica and the derived graphs (cs, pc) grow as
  disjoint components — linear growth, which is what adding new
  customers/parts to a warehouse actually does. nation/region are
  dimensions and stay fixed.
- documents: doc_id offset; text is deterministically WORD-PERMUTED per
  replica (seeded random shuffle of the word list). This preserves the
  token multiset (token counts, language histograms, quality metrics
  keep their distributions) while destroying shingle/n-gram identity,
  so replicas are NOT near-duplicates of each other — the
  dup-group-size distribution of the corpus is preserved instead of
  being inflated K-fold, which would turn every LSH bucket into a
  K^2 candidate clique and measure the synthetic replication rather
  than the engine. (A plain ROTATION is not enough: rotating a word
  sequence preserves every k-gram except the k-1 at the seam, so
  rotated replicas are ~0.95-Jaccard near-duplicates in shingle
  space — measured as a 17x dedup_minhash_lsh blowup at 10x before
  the permutation fix.)
- embeddings: vec_id offset; the vector's DIMENSIONS are permuted by a
  per-replica seeded random permutation (norm- and distribution-
  preserving, cosine-neighborhood destroying) for the same reason.
  (A plain np.roll is not enough: roll wraps modulo the dimension
  count, so for K > dim replica k and replica k+dim get byte-identical
  vectors — exact cross-replica duplicate cliques, the same
  accidental-structure failure as the rotation-vs-permutation lesson
  above. Seeded permutations are collision-free for any K: two
  replicas coincide only if their permutations are equal, ~1/dim!.)
- events: event_id and user_id offset per replica (new users, same
  time window — the realistic shape of traffic growth). NOTE: the uu
  co-occurrence graph densifies superlinearly under this (documented
  policy in bench.py/SCALING.md) because co-occurrence is keyed on
  (event_type, hour) cells shared across replicas; uu-graph queries
  are therefore measured as their own family in the sweep.

Ids stay tightly packed (offset = max+1), so even K=100 keeps user ids
< 2^22 — inside the documented bit-packing domain of random_walks/MIS.

Usage: python tools/make_scaled_data.py SRC_DIR OUT_DIR K
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

# fact table -> key columns that get the per-replica offset
FACT_KEYS = {
    "customer": ["c_custkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "part": ["p_partkey"],
    "supplier": ["s_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
DIMENSIONS = ["nation", "region"]

# key column -> the table that owns it (strides must be consistent
# across referencing tables: orders.o_custkey uses customer's stride)
KEY_OWNER_COL = {
    "o_custkey": ("customer", "c_custkey"),
    "l_orderkey": ("orders", "o_orderkey"),
    "l_partkey": ("part", "p_partkey"),
    "l_suppkey": ("supplier", "s_suppkey"),
}


def _strides(src: str) -> dict[str, int]:
    """stride per key column = max over the OWNING table + 1."""
    strides: dict[str, int] = {}
    for table, keys in FACT_KEYS.items():
        path = os.path.join(src, f"{table}.parquet")
        tbl = pq.read_table(path, columns=[k for k in keys if k not in KEY_OWNER_COL])
        for col in tbl.column_names:
            strides[col] = int(pa.compute.max(tbl[col]).as_py()) + 1
    for col, (_, owner_col) in KEY_OWNER_COL.items():
        strides[col] = strides[owner_col]
    return strides


def _permute_words(text: str, k: int, doc_id: int) -> str:
    """Word permutation can only decorrelate docs with >= 2 words; a
    0/1-word doc would be byte-identical across all K replicas (a
    K-clique of exact duplicates per doc). Salt those with a replica
    token so the dup-group distribution stays preserved for arbitrary
    SRC corpora (the shipped sf0.1 has none, but the tool must not
    silently reintroduce the inflated-dup-group problem elsewhere)."""
    if not isinstance(text, str):
        return text
    words = text.split()
    if len(words) < 2:
        return f"{text} r{k}x{doc_id}".strip()
    rs = np.random.RandomState((k * 1_000_003 + doc_id * 7919) % (2**31 - 1))
    return " ".join(words[i] for i in rs.permutation(len(words)))


def _replica(df: pd.DataFrame, table: str, k: int, strides: dict[str, int]) -> pd.DataFrame:
    out = df.copy(deep=False)
    for col in FACT_KEYS[table]:
        out[col] = df[col] + k * strides[col]
    if table == "documents" and k > 0:
        permuted = [
            _permute_words(t, k, i)
            for i, t in zip(df["doc_id"], df["text"])
        ]
        out["text"] = permuted
        out["n_chars"] = [len(t) if isinstance(t, str) else None for t in permuted]
        out["n_chars"] = out["n_chars"].astype(df["n_chars"].dtype)
    if table == "embeddings" and k > 0:
        mat = np.stack([np.asarray(v, dtype=np.float32) for v in df["embedding"]])
        rs = np.random.RandomState((k * 2_000_029) % (2**31 - 1))
        perm = rs.permutation(mat.shape[1])
        out["embedding"] = list(mat[:, perm])
    return out


def build(src: str, out: str, K: int) -> None:
    os.makedirs(out, exist_ok=True)
    strides = _strides(src)
    for table in DIMENSIONS:
        pq.write_table(pq.read_table(os.path.join(src, f"{table}.parquet")),
                       os.path.join(out, f"{table}.parquet"))
    for table in FACT_KEYS:
        df = pd.read_parquet(os.path.join(src, f"{table}.parquet"))
        schema = pq.ParquetFile(os.path.join(src, f"{table}.parquet")).schema_arrow
        dest = os.path.join(out, f"{table}.parquet")
        writer = pq.ParquetWriter(dest, schema)
        try:
            for k in range(K):
                rep = _replica(df, table, k, strides)
                writer.write_table(pa.Table.from_pandas(rep, schema=schema,
                                                        preserve_index=False))
        finally:
            writer.close()
        print(f"{table}: {len(df)} x {K} -> {dest}", flush=True)


if __name__ == "__main__":
    src, out, K = sys.argv[1], sys.argv[2], int(sys.argv[3])
    build(src, out, K)
