"""Similarity-search surface: exact cosine top-k, batch ANN, IVF-style
cell-restricted ANN, embedding near-dup (SURVEY §2B S27 + charter).

Embeddings are plain `array<float>` columns; all vector math is
higher-order functions (zip_with/transform/aggregate) — JVM-side, no
Python, no UDF. Reductions are sequential left-to-right in both Spark
(`aggregate`) and the DuckDB oracle (`list_reduce` with a prepended
zero), so dot products are bit-identical across engines.

Scale design: brute force is the correctness baseline (O(n·q), fine for
one query or a broadcast batch of queries). The scale path is
IVF-style cell restriction (q52): a coarse quantizer assigns each vector
to a cell — here the fixture's `label` column stands in for the
centroid assignment — and the search joins only within the probed cell,
turning all-pairs into per-cell joins. With a real centroid table the
cell assignment is one broadcast-join argmin pass; the per-cell search
is unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from parquet_demo_spark.catalog import load
from parquet_demo_spark.functions import cosine, mean6, mean6_sql
from parquet_demo_spark.registry import register

# DuckDB twin of functions.dot/l2_norm/cosine: sequential list_reduce.
_DOT_SQL = (
    "list_reduce(list_prepend(0.0::DOUBLE, "
    "list_transform(list_zip({a}, {b}), p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE))), "
    "(acc, v) -> acc + v)"
)


def _cos_sql(a: str, b: str) -> str:
    dot = _DOT_SQL.format(a=a, b=b)
    na = _DOT_SQL.format(a=a, b=a)
    nb = _DOT_SQL.format(a=b, b=b)
    return f"({dot} / (sqrt({na}) * sqrt({nb})))"


@register(
    "q27_cosine_topk",
    oracle=f"""
    WITH target AS (SELECT embedding AS e0 FROM embeddings WHERE vec_id = 0)
    SELECT vec_id, ROUND({_cos_sql('embedding', 'e0')}, 4) AS cos_sim
    FROM embeddings CROSS JOIN target
    WHERE vec_id <> 0
    ORDER BY cos_sim DESC, vec_id LIMIT 5
    """,
    doc="S27 exact cosine top-5 neighbors of vec_id=0: brute-force scan "
    "with the 1-row target broadcast; TakeOrderedAndProject keeps it one "
    "pass with a size-5 heap per partition.",
)
def q27(spark: SparkSession, sf: str) -> DataFrame:
    emb = load(spark, sf, "embeddings")
    target = emb.filter(F.col("vec_id") == 0).select(
        F.col("embedding").alias("e0")
    )
    return (
        emb.filter(F.col("vec_id") != 0)
        .crossJoin(F.broadcast(target))
        .select(
            "vec_id",
            F.round(cosine(F.col("embedding"), F.col("e0")), 4).alias("cos_sim"),
        )
        .orderBy(F.col("cos_sim").desc(), "vec_id")
        .limit(5)
    )


@register(
    "q51_ann_bruteforce_batch",
    oracle=f"""
    WITH q AS (SELECT vec_id AS qid, embedding AS qe FROM embeddings WHERE vec_id < 5),
    scored AS (
      SELECT qid, vec_id,
             ROUND({_cos_sql('embedding', 'qe')}, 4) AS cos_sim
      FROM embeddings CROSS JOIN q
      WHERE vec_id <> qid
    )
    SELECT qid, vec_id, cos_sim FROM (
      SELECT qid, vec_id, cos_sim,
             CAST(ROW_NUMBER() OVER (PARTITION BY qid
                   ORDER BY cos_sim DESC, vec_id) AS BIGINT) AS rn
      FROM scored)
    WHERE rn <= 3
    ORDER BY qid, cos_sim DESC, vec_id
    """,
    doc="Batch brute-force ANN baseline: 5 query vectors broadcast against "
    "the corpus, per-query top-3 via window. O(n·q) — the correctness "
    "baseline every ANN variant is measured against.",
)
def q51(spark: SparkSession, sf: str) -> DataFrame:
    emb = load(spark, sf, "embeddings")
    q = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qe")
    )
    scored = (
        emb.crossJoin(F.broadcast(q))
        .filter(F.col("vec_id") != F.col("qid"))
        .select(
            "qid",
            "vec_id",
            F.round(cosine(F.col("embedding"), F.col("qe")), 4).alias("cos_sim"),
        )
    )
    w = W.partitionBy("qid").orderBy(F.col("cos_sim").desc(), "vec_id")
    return (
        scored.withColumn("rn", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rn") <= 3)
        .select("qid", "vec_id", "cos_sim")
        .orderBy("qid", F.col("cos_sim").desc(), "vec_id")
    )


@register(
    "q52_ann_ivf_cell",
    oracle=f"""
    WITH q AS (SELECT vec_id AS qid, embedding AS qe, label AS qcell
               FROM embeddings WHERE vec_id < 5),
    scored AS (
      SELECT qid, vec_id,
             ROUND({_cos_sql('embedding', 'qe')}, 4) AS cos_sim
      FROM embeddings e JOIN q ON e.label = q.qcell
      WHERE vec_id <> qid
    )
    SELECT qid, vec_id, cos_sim FROM (
      SELECT qid, vec_id, cos_sim,
             CAST(ROW_NUMBER() OVER (PARTITION BY qid
                   ORDER BY cos_sim DESC, vec_id) AS BIGINT) AS rn
      FROM scored)
    WHERE rn <= 3
    ORDER BY qid, cos_sim DESC, vec_id
    """,
    doc="IVF-style ANN: search only the query's coarse cell (fixture "
    "`label` = cell assignment; in production an argmin-over-centroids "
    "broadcast pass computes it). Equi-join on cell replaces the cross "
    "join — per-cell work, the 100 TB scale path.",
)
def q52(spark: SparkSession, sf: str) -> DataFrame:
    emb = load(spark, sf, "embeddings")
    q = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("qid"),
        F.col("embedding").alias("qe"),
        F.col("label").alias("qcell"),
    )
    scored = (
        emb.join(F.broadcast(q), emb.label == q.qcell)
        .filter(F.col("vec_id") != F.col("qid"))
        .select(
            "qid",
            "vec_id",
            F.round(cosine(F.col("embedding"), F.col("qe")), 4).alias("cos_sim"),
        )
    )
    w = W.partitionBy("qid").orderBy(F.col("cos_sim").desc(), "vec_id")
    return (
        scored.withColumn("rn", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rn") <= 3)
        .select("qid", "vec_id", "cos_sim")
        .orderBy("qid", F.col("cos_sim").desc(), "vec_id")
    )


# Deterministic pseudo-random hyperplanes: h_j[i] = ((i*31 + j*17) % 7) - 3,
# j = 0..7 → an 8-bit sign bucket. Integer dot products are exact, so the
# bucket assignment is engine-independent (no FP sign flips at 0 — the
# strict >0 test is on an integer).
_N_PLANES = 8


def _bucket_sql(emb: str) -> str:
    bits = []
    for j in range(_N_PLANES):
        dot = (
            f"list_reduce(list_prepend(0::BIGINT, list_transform(range(1, 65), "
            f"i -> CAST(FLOOR(CAST({emb}[i] AS DOUBLE) * 1000) AS BIGINT) "
            f"* (((i - 1) * 31 + {j} * 17) % 7 - 3))), (a, b) -> a + b)"
        )
        bits.append(f"(CASE WHEN {dot} > 0 THEN {2 ** j} ELSE 0 END)")
    return " + ".join(bits)


@register(
    "q69_ann_lsh_hyperplane",
    oracle=f"""
    WITH b AS (
      SELECT vec_id, embedding, CAST({_bucket_sql('embedding')} AS BIGINT) AS bucket
      FROM embeddings
    ),
    q AS (SELECT vec_id AS qid, embedding AS qe, bucket AS qb FROM b WHERE vec_id < 5),
    scored AS (
      SELECT qid, vec_id, ROUND({_cos_sql('embedding', 'qe')}, 4) AS cos_sim
      FROM b JOIN q ON b.bucket = q.qb
      WHERE vec_id <> qid
    )
    SELECT qid, vec_id, cos_sim FROM (
      SELECT qid, vec_id, cos_sim,
             ROW_NUMBER() OVER (PARTITION BY qid
                   ORDER BY cos_sim DESC, vec_id) AS rn
      FROM scored)
    WHERE rn <= 3
    ORDER BY qid, cos_sim DESC, vec_id
    """,
    doc="LSH-bucketed ANN (random-hyperplane signs → 8-bit bucket, "
    "integer-exact assignment): candidates come from an equi-join on "
    "the bucket — the second scale path beside IVF cells (q52). "
    "Same-bucket probability rises with cosine similarity.",
)
def q69(spark: SparkSession, sf: str) -> DataFrame:
    emb = load(spark, sf, "embeddings")
    scaled = F.transform(
        F.col("embedding"),
        lambda x: F.floor(x.cast("double") * 1000).cast("bigint"),
    )
    base = emb.select("vec_id", "embedding", scaled.alias("sv"))

    def bit(j: int):
        dot = F.aggregate(
            F.zip_with(
                F.col("sv"),
                F.array(
                    *[F.lit((i * 31 + j * 17) % 7 - 3) for i in range(64)]
                ),
                lambda x, w: x * w,
            ),
            F.lit(0).cast("bigint"),
            lambda acc, v: acc + v,
        )
        return F.when(dot > 0, F.lit(2**j)).otherwise(F.lit(0))

    bucket = bit(0)
    for j in range(1, _N_PLANES):
        bucket = bucket + bit(j)
    b = base.select(
        "vec_id", "embedding", bucket.cast("bigint").alias("bucket")
    )
    q = b.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("qid"),
        F.col("embedding").alias("qe"),
        F.col("bucket").alias("qb"),
    )
    scored = (
        b.join(F.broadcast(q), b.bucket == q.qb)
        .filter(F.col("vec_id") != F.col("qid"))
        .select(
            "qid",
            "vec_id",
            F.round(cosine(F.col("embedding"), F.col("qe")), 4).alias("cos_sim"),
        )
    )
    w = W.partitionBy("qid").orderBy(F.col("cos_sim").desc(), "vec_id")
    return (
        scored.withColumn("rn", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rn") <= 3)
        .select("qid", "vec_id", "cos_sim")
        .orderBy("qid", F.col("cos_sim").desc(), "vec_id")
    )


@register(
    "q53_embedding_neardup",
    oracle=f"""
    SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
           ROUND({_cos_sql('a.embedding', 'b.embedding')}, 4) AS cos_sim
    FROM embeddings a JOIN embeddings b
      ON a.label = b.label AND a.vec_id < b.vec_id
    WHERE a.vec_id < 400 AND b.vec_id < 400
    ORDER BY cos_sim DESC, vec_a, vec_b LIMIT 20
    """,
    doc="Embedding-cosine near-dup: top-20 most-similar pairs within "
    "coarse cells (label-blocked — the blocking that makes pairwise "
    "near-dup feasible at scale), among vec_id<400.",
)
def q53(spark: SparkSession, sf: str) -> DataFrame:
    emb = load(spark, sf, "embeddings").filter(F.col("vec_id") < 400)
    a = emb.alias("a")
    b = emb.alias("b")
    pairs = a.join(
        b,
        (F.col("a.label") == F.col("b.label"))
        & (F.col("a.vec_id") < F.col("b.vec_id")),
    ).select(
        F.col("a.vec_id").alias("vec_a"),
        F.col("b.vec_id").alias("vec_b"),
        F.round(cosine(F.col("a.embedding"), F.col("b.embedding")), 4).alias(
            "cos_sim"
        ),
    )
    return pairs.orderBy(F.col("cos_sim").desc(), "vec_a", "vec_b").limit(20)


# ---------------------------------------------------------------------------
# q103 — distributed k-means (Lloyd), 2 fixed iterations, deterministic init
# ---------------------------------------------------------------------------

_KM_K = 8
_KM_DIM = 64

_KM_D2_SQL = (
    "list_reduce(list_prepend(0.0::DOUBLE, "
    "list_transform(range(1, 65), "
    "i -> (CAST(e.embedding[i] AS DOUBLE) - c.c[i]) "
    "* (CAST(e.embedding[i] AS DOUBLE) - c.c[i]))), "
    "(acc, v) -> acc + v)"
)


def _km_assign_sql(cent: str) -> str:
    return f"""
  SELECT vec_id, cid, embedding, d2,
         ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d2, cid) AS rn
  FROM (
    SELECT e.vec_id, c.cid, e.embedding, {_KM_D2_SQL} AS d2
    FROM emb e CROSS JOIN {cent} c)
"""


_KM_ORACLE = f"""
WITH emb AS (
  SELECT vec_id, embedding FROM embeddings WHERE len(embedding) >= {_KM_DIM}
),
cent0 AS (
  SELECT vec_id AS cid,
         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS c
  FROM embeddings WHERE vec_id < {_KM_K}
),
a1 AS ({_km_assign_sql('cent0')}),
cent1 AS (
  SELECT cid, list(cval ORDER BY pos) AS c FROM (
    SELECT cid, j AS pos, {{mean6}} AS cval
    FROM (SELECT cid, embedding FROM a1 WHERE rn = 1)
    CROSS JOIN (SELECT unnest(range({_KM_DIM})) AS j)
    GROUP BY cid, j)
  GROUP BY cid
),
a2 AS ({_km_assign_sql('cent1')})
SELECT cid AS cluster, COUNT(*) AS n_points,
       {{mean6_d2}} AS avg_d2
FROM a2 WHERE rn = 1 GROUP BY cid ORDER BY cid
"""


def _km_assign(emb: DataFrame, cent: DataFrame) -> DataFrame:
    """Nearest-centroid assignment: (vec_id, cid, embedding, d2).

    Lexicographic struct-min keeps the argmin deterministic under ties
    (d2 first, then cid — same ordering as the oracle's ROW_NUMBER).
    """
    d2 = F.aggregate(
        F.zip_with(
            F.col("embedding"),
            F.col("c"),
            lambda x, y: (x.cast("double") - y) * (x.cast("double") - y),
        ),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    scored = emb.crossJoin(F.broadcast(cent)).withColumn("d2", d2)
    return (
        scored.groupBy("vec_id")
        .agg(
            F.min(
                F.struct(F.col("d2"), F.col("cid"), F.col("embedding"))
            ).alias("m")
        )
        .select(
            "vec_id",
            F.col("m.cid").alias("cid"),
            F.col("m.embedding").alias("embedding"),
            F.col("m.d2").alias("d2"),
        )
    )


def _km_update(assigned: DataFrame) -> DataFrame:
    """Per-cluster mean6 centroid from the assigned vectors."""
    ex = assigned.select(
        "cid", F.posexplode("embedding").alias("pos", "val")
    )
    dims = ex.groupBy("cid", "pos").agg(mean6("val").alias("cval"))
    return dims.groupBy("cid").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "cval"))),
            lambda s: s["cval"],
        ).alias("c")
    )


@register(
    "q103_kmeans_lloyd",
    oracle=_KM_ORACLE.format(
        mean6=mean6_sql("embedding[j + 1]"), mean6_d2=mean6_sql("d2")
    ),
    doc="Distributed Lloyd's k-means (K=8, 2 fixed iterations, "
    "deterministic init = the K lowest vec_ids): assign via a broadcast "
    "crossJoin against the K-row centroid table with a lexicographic "
    "struct-min argmin (no window shuffle), update via posexplode + "
    "per-(cid, pos) mean6 partials — the iterative-ML-on-Spark shape. "
    "Each iteration is one broadcast pass over the vectors plus one "
    "centroid-sized aggregation; nothing quadratic, nothing driver-side "
    "(a K-row centroid table is the only thing that would ever "
    "collect). Cross-engine determinism: distances are pure double "
    "arithmetic over explicit DOUBLE casts (identical IEEE ops both "
    "engines), centroid means use the q85 round->decimal-sum recipe, "
    "ties break on cid. Reports per-cluster size and mean squared "
    "distance after iteration 2.",
)
def q103(spark: SparkSession, sf: str) -> DataFrame:
    # slice to exactly _KM_DIM dims: the oracle hard-codes range(64), so
    # a wider vector must not leak extra dimensions into d2/centroids
    # (q85's fail-loudly rule — >= filter alone would silently diverge)
    emb = (
        load(spark, sf, "embeddings")
        .filter(F.size("embedding") >= _KM_DIM)
        .select("vec_id", F.slice("embedding", 1, _KM_DIM).alias("embedding"))
    )
    cent0 = (
        load(spark, sf, "embeddings")
        .filter(F.col("vec_id") < _KM_K)
        .select(
            F.col("vec_id").alias("cid"),
            F.transform(
                F.slice("embedding", 1, _KM_DIM),
                lambda x: x.cast("double"),
            ).alias("c"),
        )
    )
    a1 = _km_assign(emb, cent0)
    cent1 = _km_update(a1.select("cid", "embedding"))
    a2 = _km_assign(emb, cent1)
    return (
        a2.groupBy(F.col("cid").alias("cluster"))
        .agg(
            F.count("*").alias("n_points"),
            mean6(F.col("d2")).alias("avg_d2"),
        )
        .orderBy("cluster")
    )
