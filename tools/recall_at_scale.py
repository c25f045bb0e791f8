"""Measure ANN recall at a >=1M-vector point (round-7 verdict item 7b).

The per-round sweep measures recall at p1/p10/p100 of the embeddings
table (2k/20k/200k vectors). Both adaptive rules — the sketch's
Hamming cut (`ann_cut_for`) and IVF's (nlist, nprobe) — are tier
functions of COUNT(*) whose curves were VALIDATED only up to 200k.
This tool extends the measurement past the committed tiers: it builds
an embeddings-ONLY K-replica corpus (default K=512 -> 1,024,000
vectors; same per-replica dimension-permutation scheme as
tools/make_scaled_data.py, so replicas are cosine-decorrelated), then
records recall@10 of the registered 64-query batch for both index
paths against the exact baseline, plus the adaptive parameters chosen
and wall times.

Usage: python tools/recall_at_scale.py [K] [--out OUT.json]
Prints one JSON object; the round's SWEEP artifact embeds it under
"recall_at_scale".
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SRC = "/root/testdata/sf0.1/embeddings.parquet"
OUT_DIR = "/tmp/fgs_scaled/emb_recall"


def build_embeddings(k_reps: int) -> str:
    """K-replicate the sf0.1 embeddings table with vec_id offsets and
    per-replica seeded dimension permutations (the make_scaled_data
    scheme — norm-preserving, cosine-neighborhood destroying, so the
    scaled corpus is not K stacked duplicate neighborhoods)."""
    dest_dir = f"{OUT_DIR}/k{k_reps}"
    dest = os.path.join(dest_dir, "embeddings.parquet")
    if os.path.exists(dest):
        return dest_dir
    os.makedirs(dest_dir, exist_ok=True)
    df = pd.read_parquet(SRC)
    stride = int(df["vec_id"].max()) + 1
    mat = np.stack([np.asarray(v, dtype=np.float32) for v in df["embedding"]])
    schema = pq.ParquetFile(SRC).schema_arrow
    writer = pq.ParquetWriter(dest, schema)
    try:
        for k in range(k_reps):
            rep = df.copy(deep=False)
            rep["vec_id"] = df["vec_id"] + k * stride
            if k > 0:
                rs = np.random.RandomState((k * 2_000_029) % (2**31 - 1))
                rep["embedding"] = list(mat[:, rs.permutation(mat.shape[1])])
            writer.write_table(
                pa.Table.from_pandas(rep, schema=schema, preserve_index=False)
            )
    finally:
        writer.close()
    return dest_dir


def main() -> int:
    k_reps = int(sys.argv[1]) if len(sys.argv) > 1 and sys.argv[1].isdigit() else 512
    out_path = None
    if "--out" in sys.argv:
        out_path = sys.argv[sys.argv.index("--out") + 1]

    sf_dir = build_embeddings(k_reps)

    from flink_graph_spark.functions import similarity as sim
    from flink_graph_spark.plans.session import get_spark, tune_session
    from flink_graph_spark.sources.tables import load_table

    spark = get_spark("recall-at-scale")
    tune_session(spark)
    emb = load_table(spark, sf_dir, "embeddings")
    n_rows = emb.count()

    # box-health probe, same shape as bench.py / scale_sweep.py
    sc = spark.sparkContext
    sc.parallelize(range(32), 32).count()
    samples = sorted(
        (lambda t0: (sc.parallelize(range(32), 32).count(), time.time() - t0)[1])(
            time.time()
        )
        * 1000
        for _ in range(9)
    )
    probe_ms = round(samples[4], 1)

    t0 = time.time()
    exact = {
        (r["query_id"], r["vec_id"])
        for r in sim.ann_topk_bruteforce(emb, 64, 10).collect()
    }
    t_brute = round(time.time() - t0, 2)

    result = {
        "n_vectors": n_rows,
        "k_replicas": k_reps,
        "n_queries": 64,
        "k": 10,
        "probe_ms_per_job": probe_ms,
        "brute_sec": t_brute,
        "paths": {},
    }
    nlist, nprobe = sim.ivf_params_for(n_rows)
    for name, df, params in (
        ("ann_topk_lsh", sim.ann_topk_lsh(emb, 64, 10),
         {"cut": sim.ann_cut_for(n_rows)}),
        ("ann_topk_ivf", sim.ann_topk_ivf(emb, 64, 10),
         {"nlist": nlist, "nprobe": nprobe}),
    ):
        t0 = time.time()
        got = {(r["query_id"], r["vec_id"]) for r in df.collect()}
        result["paths"][name] = {
            "recall": round(len(exact & got) / len(exact), 4),
            "sec": round(time.time() - t0, 2),
            **params,
        }
    spark.stop()
    line = json.dumps(result)
    print(line)
    if out_path:
        with open(out_path, "w") as fh:
            fh.write(line + "\n")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
