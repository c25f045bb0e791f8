"""Partition-size census for the wedge/adjacency family at a scale point.

SWEEP_r06 showed `jaccard_part_copurchase` surviving the 100x point
only by spilling ~42 GB, and triangle/adamic-adar dying on disk — all
three attach per-vertex neighbor arrays to an edge frame. The claimed
defense is that this is a SINGLE-BOX capacity cliff, not a plan
defect: on a cluster every executor holds only its own partitions of
the wide intermediate, so per-node memory is bounded by
max-partition-size x (partitions per node), while local[32] pays the
whole frame on one disk. This tool turns that argument into numbers:
for the p100 part-copurchase graph it records, per shuffle partition
of the edge-with-arrays intermediate,

  rows, attached array elements, and estimated bytes (8 B/element),

and prints total / max / p95 partition sizes plus the hub profile of
the adjacency itself (max / p99 degree). "Bounded per-node on a
cluster" is then checkable arithmetic: max_partition_bytes x
ceil(shuffle_partitions / executors) = per-executor footprint.

Usage: python tools/wedge_census.py [sf_dir] [--out OUT.json]
"""

from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/fgs_scaled/sf10"
    out_path = None
    if "--out" in sys.argv:
        out_path = sys.argv[sys.argv.index("--out") + 1]

    import pyspark.sql.functions as F

    from flink_graph_spark.plans.session import get_spark, tune_session
    from flink_graph_spark.sources.graphs import part_copurchase_graph

    spark = get_spark("wedge-census")
    tune_session(spark)
    g = part_copurchase_graph(spark, sf_dir)
    e = g.edges.select("src", "dst")

    adj = (
        e.select(F.col("src").alias("id"), F.col("dst").alias("nbr"))
        .unionByName(e.select(F.col("dst").alias("id"), F.col("src").alias("nbr")))
        .groupBy("id")
        .agg(F.sort_array(F.collect_set("nbr")).alias("ns"))
    )
    deg = adj.select(F.size("ns").alias("d"))
    hub = deg.agg(
        F.count("*").alias("n_vertices"),
        F.max("d").alias("max_degree"),
        F.expr("percentile_approx(d, 0.99)").alias("p99_degree"),
        F.sum("d").alias("total_adj_elements"),
    ).collect()[0]

    a = adj.select(F.col("id").alias("src"), F.col("ns").alias("na"))
    b = adj.select(F.col("id").alias("dst"), F.col("ns").alias("nb"))
    wide = e.join(a, "src").join(b, "dst").select(
        (F.size("na") + F.size("nb")).alias("elems")
    )
    parts = (
        wide.withColumn("pid", F.spark_partition_id())
        .groupBy("pid")
        .agg(F.count("*").alias("rows"), F.sum("elems").alias("elems"))
        .collect()
    )
    rows = sorted(int(p["elems"]) * 8 for p in parts)
    total = sum(rows)

    # ceil-based quantile (ADVICE r7: int(len*0.95)-1 picks the p80
    # element at len=10, and rows[-1] raises on an empty frame)
    def _q(sorted_rows: list[int], q: float) -> int:
        import math as _m

        return sorted_rows[min(len(sorted_rows) - 1,
                               _m.ceil(q * len(sorted_rows)) - 1)]

    wide_stats = (
        {
            "partitions": len(rows),
            "total_gb": round(total / 1e9, 2),
            "max_partition_mb": round(rows[-1] / 1e6, 1),
            "p95_partition_mb": round(_q(rows, 0.95) / 1e6, 1),
            "median_partition_mb": round(_q(rows, 0.50) / 1e6, 1),
        }
        if rows
        else {"partitions": 0, "total_gb": 0.0}
    )
    result = {
        "sf_dir": sf_dir,
        "n_edges": e.count(),
        "n_vertices": int(hub["n_vertices"]),
        "max_degree": int(hub["max_degree"]),
        "p99_degree": int(hub["p99_degree"]),
        "adjacency_total_mb": round(int(hub["total_adj_elements"]) * 8 / 1e6, 1),
        "wide_intermediate": wide_stats,
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
