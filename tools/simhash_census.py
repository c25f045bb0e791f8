"""Census the simhash band-join pair structure at one scale point.

Round-8 verdict item 4: `simhash_near_dup`'s sweep exponent drifted
1.14 (SWEEP_r06) -> 1.48 (SWEEP_r08) with no plan change and (verified
by git archaeology) byte-identical generator code/seeds, so the drift
is either environmental or the K-clique pair model's own curve. This
tool measures the model's INPUT — counting, not timing, so it is
scheduler-noise-insensitive:

The model: simhash is a bag-of-words fingerprint and the scaled-data
word permutation preserves every doc's token multiset, so all K
replicas of a doc carry byte-identical fingerprints. Each original doc
therefore forms a K-clique in band space (its replicas agree on ALL
bands), and candidate pairs grow ~K^2 BY CONSTRUCTION of the synthetic
corpus — the same generator-densification class as the uu family
(SCALING.md §8) and the documented r6 attribution. Expected counts:

  cells(K)      : every band cell's membership grows exactly x K
  join_pairs(K) = K^2 * join_pairs(1)      (sum over cells of C(m,2))
  ham0_pairs(K) = C(K,2)*D + K^2 * ham0_pairs(1)   (replica cliques)

so the time model is t(K) = c + a*K + b*K^2 and the measured exponent
between p10 and p100 RISES toward 2 as the quadratic term dominates —
a property of the synthetic corpus, not a plan defect.

Usage: python tools/simhash_census.py SF_DIR [--timed N]
Prints one JSON line. --timed N additionally runs the registered
simhash_near_dup query N times (fresh plan each pass) and reports
wall seconds + the box probe, for solo-vs-in-sweep comparison.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from flink_graph_spark.functions import dedup as dd  # noqa: E402
from flink_graph_spark.plans.session import get_spark, tune_session  # noqa: E402
from flink_graph_spark.sources.tables import load_table  # noqa: E402


def main() -> int:
    sf_dir = sys.argv[1]
    timed = 0
    if "--timed" in sys.argv:
        timed = int(sys.argv[sys.argv.index("--timed") + 1])

    spark = get_spark("simhash-census")
    tune_session(spark)

    docs = dd.with_synthetic_dups(load_table(spark, sf_dir, "documents"))
    fp = dd.simhash(docs).persist()
    n_docs = fp.count()

    band_w = dd.SIMHASH_BITS // dd.SIMHASH_NEAR_BANDS
    mask = (1 << band_w) - 1
    cells = fp.select(
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(b).alias("band"),
                    F.shiftright("simhash", b * band_w)
                    .bitwiseAND(F.lit(mask)).alias("key"),
                )
                for b in range(dd.SIMHASH_NEAR_BANDS)
            ])
        ).alias("bk")
    ).groupBy("bk.band", "bk.key").agg(F.count("*").alias("m"))
    join_pairs, max_cell = cells.agg(
        F.sum(F.expr("m * (m - 1) / 2")).cast("long"),
        F.max("m"),
    ).first()

    ham0 = fp.groupBy("simhash").agg(F.count("*").alias("m"))
    ham0_pairs, fp_classes = ham0.agg(
        F.sum(F.expr("m * (m - 1) / 2")).cast("long"),
        F.count("*"),
    ).first()
    fp.unpersist()

    out = {
        "sf_dir": sf_dir,
        "n_docs": int(n_docs),
        "join_pairs": int(join_pairs),
        "max_band_cell": int(max_cell),
        "ham0_pairs": int(ham0_pairs),
        "fingerprint_classes": int(fp_classes),
    }

    if timed:
        sc = spark.sparkContext
        sc.parallelize(range(32), 32).count()
        samples = sorted(
            (lambda t0: (sc.parallelize(range(32), 32).count(),
                         time.time() - t0)[1])(time.time()) * 1000
            for _ in range(9)
        )
        out["probe_ms_per_job"] = round(samples[4], 1)
        passes = []
        for _ in range(timed):
            t0 = time.time()
            n_out = dd.simhash_near_dup(
                dd.with_synthetic_dups(load_table(spark, sf_dir, "documents"))
            ).count()
            passes.append(round(time.time() - t0, 2))
        out["timed_sec"] = passes
        out["out_pairs"] = int(n_out)

    spark.stop()
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
