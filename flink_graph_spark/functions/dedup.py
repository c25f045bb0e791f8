"""Deduplication over ``documents`` — exact, n-gram Jaccard,
MinHash+LSH, SimHash (north-star extension, SURVEY.md §2.10).

Scale design (100 TB posture):
* Everything is inverted-index shaped: explode shingles → hash-join on
  shingle/bucket → aggregate. Never an O(n²) cross join — candidate
  pairs only ever come from shared buckets.
* MinHash signatures are computed in ONE hash-aggregate pass (16
  min-aggs over the exploded shingle frame), then banded; band size 1
  with K=16 permutations (b=16, r=1 — recall ≈ 1-(1-s)^16, high for
  s ≥ 0.3; candidates confirmed with exact Jaccard so precision is
  exact).
* All hashing is md5-derived integer arithmetic (functions/hashing.py)
  so the whole LSH pipeline — signatures, buckets, candidates,
  confirmation — is bit-identical in DuckDB and fully oracle-checked,
  which is rare for MinHash implementations.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .hashing import MINHASH_A, MINHASH_B, MINHASH_P, NUM_MINHASHES, h32
from .text import DOC_SHINGLES_SQL, DOC_TOK_SQL, SHINGLES_EXPR, doc_shingles

# ---- exact dedup -----------------------------------------------------

def with_synthetic_dups(docs: DataFrame) -> DataFrame:
    """documents ∪ copies of every 100th doc (id offset 1e6) — the
    corpus has no exact duplicates, so tests/queries inject some to
    exercise the keep-min-id mapping.
    """
    dups = docs.filter(F.col("doc_id") % 100 == 0).select(
        (F.col("doc_id") + F.lit(1_000_000)).alias("doc_id"), "text"
    )
    return docs.select("doc_id", "text").unionByName(dups)


DD_SQL = """
dd AS MATERIALIZED (
    SELECT doc_id, text FROM documents
    UNION ALL
    SELECT doc_id + 1000000 AS doc_id, text FROM documents
    WHERE doc_id % 100 = 0
)"""


def dedup_exact(docs_with_dups: DataFrame) -> DataFrame:
    """(doc_id, keep_id) for every removed duplicate: hash-groupBy on
    full text, keep the min id per group. The canonical exact-dedup
    plan: one shuffle on the text hash, no pairwise comparison.
    """
    keep = docs_with_dups.groupBy("text").agg(F.min("doc_id").alias("keep_id"))
    return (
        docs_with_dups.join(keep, "text")
        .filter(F.col("doc_id") != F.col("keep_id"))
        .select("doc_id", "keep_id")
    )


DEDUP_EXACT_SQL = """
SELECT d.doc_id, m.keep_id
FROM dd d
JOIN (SELECT text, MIN(doc_id) AS keep_id FROM dd GROUP BY text) m
  ON d.text = m.text
WHERE d.doc_id <> m.keep_id"""


def dedup_exact_stats(docs: DataFrame) -> DataFrame:
    return docs.agg(
        F.count("*").alias("n_docs"),
        F.countDistinct("text").alias("n_distinct_texts"),
        (F.count("*") - F.countDistinct("text")).alias("n_dup_docs"),
    )


DEDUP_EXACT_STATS_SQL = """
SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(COUNT(DISTINCT text) AS BIGINT) AS n_distinct_texts,
       CAST(COUNT(*) - COUNT(DISTINCT text) AS BIGINT) AS n_dup_docs
FROM documents"""


# ---- exact n-gram Jaccard (inverted index) ---------------------------

def _pair_jaccard(sh: DataFrame) -> DataFrame:
    """(da, db, jaccard) for all pairs sharing ≥1 shingle — inverted
    index join, intersection counts, |A|+|B|-∩ union sizes.
    """
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("sz"))
    a = sh.select(F.col("doc_id").alias("da"), "s")
    b = sh.select(F.col("doc_id").alias("db"), "s")
    inter = (
        a.join(b, ["s"])
        .filter(F.col("da") < F.col("db"))
        .groupBy("da", "db")
        .agg(F.count("*").alias("inter"))
    )
    sa = sizes.select(F.col("doc_id").alias("da"), F.col("sz").alias("sza"))
    sb = sizes.select(F.col("doc_id").alias("db"), F.col("sz").alias("szb"))
    return (
        inter.join(sa, "da")
        .join(sb, "db")
        .select(
            "da",
            "db",
            F.round(
                F.col("inter").cast("double")
                / (F.col("sza") + F.col("szb") - F.col("inter")),
                6,
            ).alias("jaccard"),
        )
    )


def dedup_ngram_topk(docs: DataFrame, k: int = 50) -> DataFrame:
    """Top-k most similar pairs by exact 3-gram Jaccard (deterministic
    (jaccard DESC, da, db) order)."""
    return (
        _pair_jaccard(doc_shingles(docs))
        .orderBy(F.desc("jaccard"), F.asc("da"), F.asc("db"))
        .limit(k)
    )


PAIR_JACCARD_SQL = """
sh_sizes AS MATERIALIZED (
    SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS sz FROM doc_shingles GROUP BY 1
),
pair_inter AS MATERIALIZED (
    SELECT a.doc_id AS da, b.doc_id AS db, CAST(COUNT(*) AS BIGINT) AS inter
    FROM doc_shingles a
    JOIN doc_shingles b ON a.s = b.s AND a.doc_id < b.doc_id
    GROUP BY 1, 2
),
pair_jaccard AS MATERIALIZED (
    SELECT p.da, p.db,
           ROUND(CAST(p.inter AS DOUBLE) / (sa.sz + sb.sz - p.inter), 6)
               AS jaccard
    FROM pair_inter p
    JOIN sh_sizes sa ON p.da = sa.doc_id
    JOIN sh_sizes sb ON p.db = sb.doc_id
)"""

DEDUP_NGRAM_TOPK_SQL = """
SELECT da, db, jaccard FROM pair_jaccard
ORDER BY jaccard DESC, da ASC, db ASC LIMIT 50"""


# ---- MinHash + LSH ---------------------------------------------------

def minhash_signatures(sh: DataFrame) -> DataFrame:
    """(doc_id, k, mh): K min-hashes in a single hash-aggregate pass
    over the exploded shingle frame, then unpivoted.
    """
    hashed = sh.select("doc_id", h32(F.col("s")).alias("h"))
    aggs = [
        F.min(
            (F.lit(MINHASH_A[k]) * F.col("h") + F.lit(MINHASH_B[k]))
            % F.lit(MINHASH_P)
        ).alias(f"mh_{k}")
        for k in range(NUM_MINHASHES)
    ]
    wide = hashed.groupBy("doc_id").agg(*aggs)
    stack = ", ".join(f"{k}, mh_{k}" for k in range(NUM_MINHASHES))
    return wide.selectExpr(
        "doc_id", f"stack({NUM_MINHASHES}, {stack}) AS (k, mh)"
    )


def dedup_minhash_lsh(docs: DataFrame, threshold: float = 0.05) -> DataFrame:
    """LSH candidates (shared (k, minhash) bucket) confirmed with exact
    Jaccard ≥ threshold → (da, db, jaccard).

    Scale shape: exact Jaccard is computed ONLY for candidate pairs —
    per-doc shingle-set arrays are joined onto the (small) candidate
    list and intersected in place with ``array_intersect``. The full
    inverted-index pair join (``_pair_jaccard``) is never built here:
    on a skewed corpus a single hot shingle makes that self-join
    quadratic, while the candidate set stays ~linear in the number of
    true near-dups.
    """
    # one shuffle: explode shingles → collect_set per doc (dedupe in agg)
    arrs = (
        docs.select("doc_id", F.explode(F.expr(SHINGLES_EXPR)).alias("s"))
        .groupBy("doc_id")
        .agg(F.collect_set("s").alias("ss"))
        .persist()
    )
    # exploded distinct-shingle view derived narrowly from the arrays
    sh = arrs.select("doc_id", F.explode("ss").alias("s"))
    sigs = minhash_signatures(sh)
    a = sigs.select(F.col("doc_id").alias("da"), "k", "mh")
    b = sigs.select(F.col("doc_id").alias("db"), "k", "mh")
    cand = (
        a.join(b, ["k", "mh"])
        .filter(F.col("da") < F.col("db"))
        .select("da", "db")
        .distinct()
    )
    confirmed = (
        cand.join(arrs.select(F.col("doc_id").alias("da"), F.col("ss").alias("sa")), "da")
        .join(arrs.select(F.col("doc_id").alias("db"), F.col("ss").alias("sb")), "db")
        .withColumn("inter", F.size(F.array_intersect("sa", "sb")))
        .withColumn(
            "jaccard",
            F.round(
                F.col("inter").cast("double")
                / (F.size("sa") + F.size("sb") - F.col("inter")),
                6,
            ),
        )
        .filter(F.col("jaccard") >= threshold)
    )
    return confirmed.select("da", "db", "jaccard")


def minhash_sql_parts() -> str:
    params = ", ".join(
        f"({k}, {MINHASH_A[k]}, {MINHASH_B[k]})" for k in range(NUM_MINHASHES)
    )
    return f"""
mh_params AS (SELECT * FROM (VALUES {params}) AS t(k, a, b)),
doc_sh_h AS MATERIALIZED (
    SELECT doc_id, CAST(concat('0x', substr(md5(s), 1, 8)) AS BIGINT) AS h
    FROM doc_shingles
),
mh_sigs AS MATERIALIZED (
    SELECT doc_id, p.k, MIN((p.a * h.h + p.b) % {MINHASH_P}) AS mh
    FROM doc_sh_h h CROSS JOIN mh_params p
    GROUP BY 1, 2
),
mh_cand AS MATERIALIZED (
    SELECT DISTINCT a.doc_id AS da, b.doc_id AS db
    FROM mh_sigs a
    JOIN mh_sigs b ON a.k = b.k AND a.mh = b.mh AND a.doc_id < b.doc_id
)"""


DEDUP_MINHASH_SQL = """
SELECT c.da, c.db, j.jaccard
FROM mh_cand c
JOIN pair_jaccard j ON c.da = j.da AND c.db = j.db
WHERE j.jaccard >= 0.05"""


# ---- SimHash ---------------------------------------------------------

SIMHASH_BITS = 60


def simhash(docs: DataFrame) -> DataFrame:
    """60-bit SimHash over token hashes: each token votes ±1 per bit,
    simhash bit j = 1 iff the vote sum is positive.

    Implemented as an explode over (token × bit) — exact and portable.
    At very large scale the same result comes from a pandas-UDF
    popcount accumulation per partition; this relational form is kept
    as the oracle-matched reference implementation.
    """
    tok_h = (
        docs.select("doc_id", F.explode(F.split("text", " ")).alias("tok"))
        .select(
            "doc_id",
            F.expr(
                "cast(conv(substring(md5(tok), 1, 15), 16, 10) as bigint)"
            ).alias("h"),
        )
    )
    bits = tok_h.select(
        "doc_id", "h", F.explode(F.sequence(F.lit(0), F.lit(SIMHASH_BITS - 1))).alias("j")
    )
    bitsums = bits.groupBy("doc_id", "j").agg(
        F.sum(
            F.expr(
                "CASE WHEN (h & shiftleft(cast(1 as bigint), cast(j as int)))"
                " <> 0 THEN 1 ELSE -1 END"
            )
        ).alias("s")
    )
    return bitsums.groupBy("doc_id").agg(
        F.sum(
            F.expr(
                "CASE WHEN s > 0 THEN shiftleft(cast(1 as bigint),"
                " cast(j as int)) ELSE cast(0 as bigint) END"
            )
        ).cast("long").alias("simhash")
    )


SIMHASH_CTES_SQL = f"""
tok_h AS MATERIALIZED (
    SELECT doc_id,
           CAST(concat('0x', substr(md5(tok), 1, 15)) AS BIGINT) AS h
    FROM (SELECT doc_id, unnest(t) AS tok FROM doc_tok)
),
bitsums AS MATERIALIZED (
    SELECT doc_id, j,
           SUM(CASE WHEN (h & (CAST(1 AS BIGINT) << j)) <> 0
                    THEN 1 ELSE -1 END) AS s
    FROM tok_h
    CROSS JOIN (SELECT unnest(generate_series(0, {SIMHASH_BITS - 1})) AS j)
    GROUP BY 1, 2
)"""

SIMHASH_FINAL_SQL = """
SELECT doc_id,
       CAST(SUM(CASE WHEN s > 0 THEN (CAST(1 AS BIGINT) << j)
                     ELSE 0 END) AS BIGINT) AS simhash
FROM bitsums GROUP BY 1"""
