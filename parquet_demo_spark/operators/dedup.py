"""Deduplication surface: exact, upsert/last-write-wins, MinHash+LSH,
SimHash, n-gram Jaccard (SURVEY §2B S23/S24 + charter extensions).

The reference's only dedup-adjacent operator is Mongo upsert-by-PK
(`examples/ingest_parquet_to_mongo_bulk.py:108-116`, composite key at
`README.md:76`) — re-expressed here as last-write-wins window dedup (S24).
The rest is the LLM-pipeline dedup suite a 100 TB corpus needs.

Scale design:

- Exact dedup is a hash groupBy (map-side partial, AQE-coalesced).
- MinHash signatures are computed with per-doc array ops (array_distinct
  BEFORE explode — dedup inside the row, no shuffle), then K hash
  functions via a broadcast params table; candidate pairs come from
  banding (pairs only form inside a band bucket — never the O(n²)
  all-pairs join).
- SimHash is one explode over 32 bit positions — linear in tokens.
- All hashes are the engine's own deterministic 31-polynomial rolling
  hash (functions.poly_hash) so the DuckDB oracle reproduces them
  bit-for-bit; neither engine's builtin hash() matches the other.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from parquet_demo_spark.catalog import load
from parquet_demo_spark.functions import (
    HASH_MOD,
    dsum,
    poly_hash,
    poly_hash_sql,
    tokens,
)
from parquet_demo_spark.registry import register

# ---------------------------------------------------------------------------
# S23 exact dedup
# ---------------------------------------------------------------------------


@register(
    "q23_dedup_exact",
    oracle="""
    SELECT COUNT(*) AS n_unique
    FROM (SELECT DISTINCT user_id, event_type FROM events)
    """,
    doc="S23 exact dedup: dropDuplicates on a key subset (hash groupBy; "
    "partial aggregation makes this one shuffle of distinct keys only).",
)
def q23(spark: SparkSession, sf: str) -> DataFrame:
    e = load(spark, sf, "events")
    return e.dropDuplicates(["user_id", "event_type"]).agg(
        F.count("*").alias("n_unique")
    )


# ---------------------------------------------------------------------------
# S24 upsert / last-write-wins (reference R14)
# ---------------------------------------------------------------------------


@register(
    "q24_upsert_latest",
    oracle="""
    SELECT COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
    FROM (
      SELECT value FROM (
        SELECT value,
               ROW_NUMBER() OVER (PARTITION BY user_id, event_type
                                  ORDER BY ts DESC, event_id DESC) AS rn
        FROM events)
      WHERE rn = 1)
    """,
    doc="S24 upsert semantics (reference `_bulk.py:108-116` ReplaceOne by "
    "composite PK): last-write-wins via row_number over the version order.",
)
def q24(spark: SparkSession, sf: str) -> DataFrame:
    e = load(spark, sf, "events")
    w = W.partitionBy("user_id", "event_type").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    return (
        e.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .agg(F.count("*").alias("n"), dsum("value", "sum_value"))
    )


# ---------------------------------------------------------------------------
# MinHash + LSH banding (charter)
# ---------------------------------------------------------------------------

# K=8 permutations h_i(x) = (a_i*x + b_i) mod P, banded 2 rows/band → 4 bands.
_MINHASH_PARAMS = [
    (0, 7, 3),
    (1, 13, 17),
    (2, 31, 29),
    (3, 101, 97),
    (4, 257, 251),
    (5, 1009, 1013),
    (6, 8191, 8209),
    (7, 524287, 524309),
]

_MINHASH_ORACLE = f"""
WITH tok AS (
  SELECT DISTINCT doc_id, token FROM (
    SELECT doc_id,
           unnest(string_split_regex(lower(text), '[^a-z]+')) AS token
    FROM documents)
  WHERE length(token) > 3
),
th AS (SELECT doc_id, {poly_hash_sql('token')} AS h FROM tok),
params(i, a, b) AS (VALUES {','.join(f'({i},{a},{b})' for i, a, b in _MINHASH_PARAMS)}),
mh AS (
  SELECT doc_id, i, MIN((a * h + b) % {HASH_MOD}) AS mh
  FROM th CROSS JOIN params GROUP BY doc_id, i
),
bands AS (
  SELECT doc_id, CAST(FLOOR(i / 2.0) AS BIGINT) AS band,
         CAST(SUM(CASE WHEN i % 2 = 0 THEN mh * 131 ELSE mh END) AS BIGINT) AS sig
  FROM mh GROUP BY doc_id, CAST(FLOOR(i / 2.0) AS BIGINT)
),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bands a JOIN bands b
    ON a.band = b.band AND a.sig = b.sig AND a.doc_id < b.doc_id
)
SELECT COUNT(*) AS n_candidate_pairs FROM cand
"""


@register(
    "q43_minhash_lsh",
    oracle=_MINHASH_ORACLE,
    doc="MinHash (K=8) + LSH banding (4 bands × 2 rows): near-dup candidate "
    "pair count. Shingle→minhash→band→bucket-join; pairs only form inside "
    "band buckets, never via all-pairs comparison.",
)
def q43(spark: SparkSession, sf: str) -> DataFrame:
    docs = load(spark, sf, "documents")
    # distinct tokens per doc, dedup'd inside the row (no shuffle)
    tok = docs.select(
        "doc_id",
        F.explode(
            F.array_distinct(
                F.filter(tokens("text"), lambda t: F.length(t) > 3)
            )
        ).alias("token"),
    )
    th = tok.select("doc_id", poly_hash("token").alias("h"))
    params = F.broadcast(
        load_params(spark, _MINHASH_PARAMS, "i int, a bigint, b bigint")
    )
    mh = (
        th.crossJoin(params)
        .groupBy("doc_id", "i")
        .agg(F.min((F.col("a") * F.col("h") + F.col("b")) % HASH_MOD).alias("mh"))
    )
    bands = mh.groupBy(
        "doc_id", F.floor(F.col("i") / 2.0).cast("bigint").alias("band")
    ).agg(
        F.sum(
            F.when(F.col("i") % 2 == 0, F.col("mh") * 131).otherwise(F.col("mh"))
        )
        .cast("bigint")
        .alias("sig")
    )
    a = bands.alias("a")
    b = bands.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.sig") == F.col("b.sig"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .distinct()
    )
    return cand.agg(F.count("*").alias("n_candidate_pairs"))


def load_params(spark: SparkSession, rows, schema: str) -> DataFrame:
    return spark.createDataFrame(rows, schema)


# ---------------------------------------------------------------------------
# SimHash (charter)
# ---------------------------------------------------------------------------

_SIMHASH_ORACLE = f"""
WITH tok AS (
  SELECT DISTINCT doc_id, token FROM (
    SELECT doc_id,
           unnest(string_split_regex(lower(text), '[^a-z]+')) AS token
    FROM documents WHERE doc_id < 100)
  WHERE token <> ''
),
th AS (SELECT doc_id, {poly_hash_sql('token')} AS h FROM tok),
bits AS (
  SELECT doc_id, b,
         SUM(CASE WHEN CAST(FLOOR(h / POWER(2, b)) AS BIGINT) % 2 = 1
                  THEN 1 ELSE -1 END) AS s
  FROM th CROSS JOIN (SELECT unnest(range(0, 32)) AS b)
  GROUP BY doc_id, b
)
SELECT doc_id,
       CAST(SUM(CASE WHEN s > 0 THEN CAST(POWER(2, b) AS BIGINT) ELSE 0 END)
            AS BIGINT) AS simhash
FROM bits GROUP BY doc_id ORDER BY doc_id
"""


@register(
    "q44_simhash",
    oracle=_SIMHASH_ORACLE,
    doc="SimHash (32-bit) document fingerprints from token polynomial "
    "hashes: per-bit weighted vote, linear in corpus size (the all-pairs "
    "hamming search would use these via bit-banding).",
)
def q44(spark: SparkSession, sf: str) -> DataFrame:
    docs = load(spark, sf, "documents").filter(F.col("doc_id") < 100)
    tok = docs.select(
        "doc_id",
        F.explode(
            F.array_distinct(F.filter(tokens("text"), lambda t: t != ""))
        ).alias("token"),
    )
    th = tok.select("doc_id", poly_hash("token").alias("h"))
    bits = (
        th.select(
            "doc_id", "h", F.explode(F.sequence(F.lit(0), F.lit(31))).alias("b")
        )
        .groupBy("doc_id", "b")
        .agg(
            F.sum(
                F.when(
                    F.floor(F.col("h") / F.pow(F.lit(2), F.col("b"))).cast(
                        "bigint"
                    )
                    % 2
                    == 1,
                    1,
                ).otherwise(-1)
            ).alias("s")
        )
    )
    return (
        bits.groupBy("doc_id")
        .agg(
            F.sum(
                F.when(
                    F.col("s") > 0, F.pow(F.lit(2), F.col("b")).cast("bigint")
                ).otherwise(F.lit(0))
            )
            .cast("bigint")
            .alias("simhash")
        )
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# n-gram (character shingle) Jaccard (charter)
# ---------------------------------------------------------------------------

_JACCARD_ORACLE = """
WITH sh AS (
  SELECT doc_id, shingle FROM (
    SELECT doc_id,
           unnest(list_distinct(list_transform(
             range(1, length(lower(text)) - 1),
             i -> substr(lower(text), CAST(i AS INTEGER), 3)))) AS shingle
    FROM documents WHERE doc_id < 300)
),
sizes AS (SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_common
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
)
SELECT COUNT(*) AS n_similar_pairs FROM (
  SELECT doc_a, doc_b,
         CAST(n_common AS DOUBLE) / (sa.sz + sb.sz - n_common) AS jacc
  FROM inter
  JOIN sizes sa ON sa.doc_id = doc_a
  JOIN sizes sb ON sb.doc_id = doc_b)
WHERE jacc >= 0.5
"""


@register(
    "q45_ngram_jaccard",
    oracle=_JACCARD_ORACLE,
    doc="Character 3-gram Jaccard near-dup: distinct shingles per doc "
    "(array_distinct in-row), shared-shingle join, |A∩B|/(|A|+|B|-|A∩B|) "
    "≥ 0.5. Bounded to doc_id<300 (the LSH variants are the scale path).",
)
def q45(spark: SparkSession, sf: str) -> DataFrame:
    docs = load(spark, sf, "documents").filter(F.col("doc_id") < 300)
    lowered = F.lower(F.col("text"))
    sh = docs.select(
        "doc_id",
        F.explode(
            F.array_distinct(
                F.transform(
                    F.sequence(F.lit(1), F.length(lowered) - 2),
                    lambda i: F.substring(lowered, i, F.lit(3)),
                )
            )
        ).alias("shingle"),
    )
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("sz"))
    a = sh.alias("a")
    b = sh.alias("b")
    inter = (
        a.join(
            b,
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .agg(F.count("*").alias("n_common"))
    )
    sa = sizes.alias("sa")
    sb = sizes.alias("sb")
    jacc = (
        inter.join(sa, F.col("doc_a") == F.col("sa.doc_id"))
        .join(sb, F.col("doc_b") == F.col("sb.doc_id"))
        .select(
            "doc_a",
            "doc_b",
            (
                F.col("n_common").cast("double")
                / (F.col("sa.sz") + F.col("sb.sz") - F.col("n_common"))
            ).alias("jacc"),
        )
    )
    return jacc.filter(F.col("jacc") >= 0.5).agg(
        F.count("*").alias("n_similar_pairs")
    )
