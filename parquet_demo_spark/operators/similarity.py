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

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from parquet_demo_spark.catalog import load
from parquet_demo_spark.functions import (
    cosine,
    dot,
    l2_norm,
    mean6,
    mean6_sql,
    micro6_sql,
)
from parquet_demo_spark.registry import register, register_phases

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


_Q51_ORACLE = f"""
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
    """


@register(
    "q51_ann_bruteforce_batch",
    oracle=_Q51_ORACLE,
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


_Q52_ORACLE = f"""
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
    """


@register(
    "q52_ann_ivf_cell",
    oracle=_Q52_ORACLE,
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


# per-table coordinate multipliers, distinct mod 7 — a mere plane-index
# shift would NOT work: with 31 ≡ 17 ≡ 3 (mod 7) the "shifted" tables
# reuse the same hyperplane family in rotated bit order, yielding
# identical vector partitions and zero recall gain from OR-ing tables
_TABLE_MULT = (31, 29, 23, 19)


def _bucket_sql(emb: str, table: int = 0) -> str:
    """8-bit sign bucket; ``table`` selects an independent hyperplane
    family (q127's multi-table LSH). table=0 is q69's original bucket."""
    mult = _TABLE_MULT[table]
    bits = []
    for j in range(_N_PLANES):
        dot = (
            f"list_reduce(list_prepend(0::BIGINT, list_transform(range(1, 65), "
            f"i -> CAST(FLOOR(CAST({emb}[i] AS DOUBLE) * 1000) AS BIGINT) "
            f"* (((i - 1) * {mult} + {j} * 17) % 7 - 3))), (a, b) -> a + b)"
        )
        bits.append(f"(CASE WHEN {dot} > 0 THEN {2 ** j} ELSE 0 END)")
    return " + ".join(bits)


_Q69_ORACLE = f"""
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
    """


@register(
    "q69_ann_lsh_hyperplane",
    oracle=_Q69_ORACLE,
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


# --- q126: ANN recall gate (VERDICT r5 #3) --------------------------------
#
# Two protocols, because they answer different questions:
#
# - "fixture": recall@3 of q52 (IVF cell) / q69 (LSH bucket) against q51's
#   brute-force truth on the raw embeddings table. The fixture vectors are
#   i.i.d. noise (measured within-label avg cosine ≈ across-label ≈ 0), so
#   ANY partition-restricted search is information-theoretically capped at
#   its candidate fraction (~10% for 10 cells, ~1/256 for 8-bit buckets) —
#   the honest number is near-chance and documents that floor.
# - "planted": the standard near-duplicate retrieval eval. Three
#   deterministic perturbed copies of each probe are added to the corpus
#   (cos ≈ 0.99 to their source); recall then measures what ANN is FOR —
#   whether the cell/bucket structure retrieves genuinely-similar items.
#   Planted rows inherit the probe's cell (a real coarse quantizer would
#   co-assign near-identical vectors) and get their LSH bucket from their
#   own perturbed values, so the LSH row also exercises hash stability
#   under perturbation.
#
# All arithmetic is sequential double ops identical in both engines
# (same expression, same order), scores rounded before ranking, vec_id
# tie-breaks — hash-checkable.

_PROBE_PERTURB_SQL = (
    "list_transform(range(1, 65), i -> p.qe[i] "
    "+ 0.02 * s.p * (((i-1)*37 + s.p*11) % 5 - 2))"
)


def _recall_block_sql(tag: str, corpus: str, pred: str) -> str:
    return f"""
    scored_{tag} AS (
      SELECT q.qid, c.vec_id, ROUND({_cos_sql('c.e', 'q.qe')}, 4) AS cs
      FROM {corpus} c JOIN probes q ON {pred}
      WHERE c.vec_id <> q.qid
    ),
    top_{tag} AS (
      SELECT qid, vec_id FROM (
        SELECT qid, vec_id,
               ROW_NUMBER() OVER (PARTITION BY qid
                     ORDER BY cs DESC, vec_id) AS rn
        FROM scored_{tag}) WHERE rn <= 3
    )"""


def _recall_rows_sql(protocol: str, method: str, truth: str, approx: str) -> str:
    return f"""
      SELECT '{protocol}' AS protocol, '{method}' AS method, t.qid,
             SUM(CASE WHEN m.vec_id IS NOT NULL THEN 1 ELSE 0 END) AS hits_q,
             COUNT(*) AS truth_q
      FROM top_{truth} t LEFT JOIN top_{approx} m
        ON t.qid = m.qid AND t.vec_id = m.vec_id
      GROUP BY t.qid"""


_RECALL_ORACLE = f"""
    WITH base AS (
      SELECT CAST(vec_id AS BIGINT) AS vec_id, label,
             list_transform(embedding, v -> CAST(v AS DOUBLE)) AS e
      FROM embeddings
    ),
    probes AS (
      SELECT vec_id AS qid, label AS qlabel, e AS qe,
             CAST({_bucket_sql('e')} AS BIGINT) AS qbkt
      FROM base WHERE vec_id < 5
    ),
    planted AS (
      SELECT CAST(1000000 + p.qid * 10 + s.p AS BIGINT) AS vec_id,
             p.qlabel AS label,
             {_PROBE_PERTURB_SQL} AS e
      FROM probes p CROSS JOIN (SELECT unnest([1, 2, 3]) AS p) s
    ),
    fc AS (
      SELECT vec_id, label, e, CAST({_bucket_sql('e')} AS BIGINT) AS bkt
      FROM base
    ),
    pc AS (
      SELECT vec_id, label, e, CAST({_bucket_sql('e')} AS BIGINT) AS bkt
      FROM (SELECT * FROM base UNION ALL SELECT * FROM planted)
    ),
    {_recall_block_sql('f_truth', 'fc', 'TRUE')},
    {_recall_block_sql('f_ivf', 'fc', 'c.label = q.qlabel')},
    {_recall_block_sql('f_lsh', 'fc', 'c.bkt = q.qbkt')},
    {_recall_block_sql('p_truth', 'pc', 'TRUE')},
    {_recall_block_sql('p_ivf', 'pc', 'c.label = q.qlabel')},
    {_recall_block_sql('p_lsh', 'pc', 'c.bkt = q.qbkt')},
    per_q AS (
      {_recall_rows_sql('fixture', 'ivf_cell', 'f_truth', 'f_ivf')}
      UNION ALL
      {_recall_rows_sql('fixture', 'lsh_hyperplane', 'f_truth', 'f_lsh')}
      UNION ALL
      {_recall_rows_sql('planted', 'ivf_cell', 'p_truth', 'p_ivf')}
      UNION ALL
      {_recall_rows_sql('planted', 'lsh_hyperplane', 'p_truth', 'p_lsh')}
    )
    SELECT protocol, method,
           ROUND(AVG(hits_q * 1.0 / truth_q), 4) AS recall_at_3,
           CAST(SUM(hits_q) AS BIGINT) AS hits,
           CAST(SUM(truth_q) AS BIGINT) AS truth_rows
    FROM per_q GROUP BY protocol, method ORDER BY protocol, method
    """


def _hyperplane_bucket_expr(e, table: int = 0) -> "F.Column":
    """8-bit sign bucket of a double-array column; twin of _bucket_sql.

    The original interpreted-fold form (Spark does not codegen
    higher-order lambdas): per row it evaluates 8 planes x (64
    transform + 64 zip + 64 fold) interpreted lambda steps, re-deriving
    the scaled vector for every plane. Kept as the reference the
    vectorized :func:`_hyperplane_bucket` is equivalence-pinned
    against (tests/test_quantization_helpers.py)."""
    sv = F.transform(e, lambda x: F.floor(x * 1000).cast("bigint"))
    mult = _TABLE_MULT[table]

    def bit(j: int):
        dot = F.aggregate(
            F.zip_with(
                sv,
                F.array(
                    *[F.lit((i * mult + j * 17) % 7 - 3) for i in range(64)]
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
    return bucket.cast("bigint")


def _hyperplane_bucket(e, table: int = 0) -> "F.Column":
    """8-bit sign bucket of a double-array column; twin of _bucket_sql.

    Vectorized (guide §4.2): the bucket is pure INTEGER arithmetic —
    floor(x*1000) is exact on IEEE doubles and the plane weights are
    small ints — so a NumPy int64 matmul per Arrow batch produces the
    bit-identical bucket the interpreted 8-plane fold chain did at
    ~1500x fewer interpreted steps per row (the fold dominated the
    q126/q127 build phases: 27 s -> ~2 s). Degenerate rows (NULL,
    wrong length, non-finite element) reproduce the fold's semantics:
    every plane's dot goes NULL there, so every bit takes the
    otherwise(0) branch and the bucket is 0."""
    mult = _TABLE_MULT[table]
    weights = np.array(
        [
            [(i * mult + j * 17) % 7 - 3 for i in range(64)]
            for j in range(_N_PLANES)
        ],
        dtype=np.int64,
    )
    pow2 = np.array([1 << j for j in range(_N_PLANES)], dtype=np.int64)

    @F.pandas_udf("bigint")
    def bucket(col: pd.Series) -> pd.Series:
        import math

        out = np.zeros(len(col), dtype=np.int64)
        for n, arr in enumerate(col):
            if arr is None or len(arr) != 64:
                continue
            try:
                sv = np.fromiter(
                    (math.floor(x * 1000.0) for x in arr),
                    dtype=np.int64,
                    count=64,
                )
            except (ValueError, OverflowError, TypeError):
                continue  # NaN/inf/None element: fold-NULL => bucket 0
            dots = weights @ sv
            out[n] = int(pow2[dots > 0].sum())
        return pd.Series(out, dtype="int64")

    return bucket(e)


def _top3(corpus: DataFrame, probes: DataFrame, pred) -> DataFrame:
    # per-ROW norms ride in from the build when present (__nrm/__qn —
    # the r15 q183 pattern, guide §1.2): the pair step then runs ONE
    # interpreted fold (the dot) instead of three. dot/(nrm*qn) is the
    # identical double expression tree cosine() builds — same sqrt,
    # same multiply order — so scores are bit-identical.
    if "__nrm" in corpus.columns and "__qn" in probes.columns:
        cs = dot(F.col("e"), F.col("qe")) / (
            F.col("__nrm") * F.col("__qn")
        )
    else:
        cs = cosine(F.col("e"), F.col("qe"))
    scored = (
        corpus.join(F.broadcast(probes), pred)
        .filter(F.col("vec_id") != F.col("qid"))
        .select("qid", "vec_id", F.round(cs, 4).alias("cs"))
    )
    w = W.partitionBy("qid").orderBy(F.col("cs").desc(), "vec_id")
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("qid", "vec_id")
    )


def _recall_row(
    truth: DataFrame, approx: DataFrame, protocol: str, method: str
) -> DataFrame:
    per_q = (
        truth.join(
            approx.withColumn("hit", F.lit(1)), ["qid", "vec_id"], "left"
        )
        .groupBy("qid")
        .agg(
            F.sum(F.coalesce(F.col("hit"), F.lit(0))).alias("hits_q"),
            F.count("*").alias("truth_q"),
        )
    )
    return per_q.agg(
        F.avg(F.col("hits_q") / F.col("truth_q")).alias("_r"),
        F.sum("hits_q").cast("bigint").alias("hits"),
        F.sum("truth_q").cast("bigint").alias("truth_rows"),
    ).select(
        F.lit(protocol).alias("protocol"),
        F.lit(method).alias("method"),
        F.round(F.col("_r"), 4).alias("recall_at_3"),
        "hits",
        "truth_rows",
    )


def _planted_sets(
    spark: SparkSession, sf: str
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """(base, probes, planted) for the recall protocols (q126/q127):
    double-cast corpus, the 5 probes, and 3 deterministic perturbed
    copies of each probe (cos ≈ 0.99 to their source)."""
    emb = load(spark, sf, "embeddings")
    base = emb.select(
        F.col("vec_id").cast("bigint").alias("vec_id"),
        "label",
        F.transform(F.col("embedding"), lambda x: x.cast("double")).alias("e"),
    )
    probes = base.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("qid"),
        F.col("label").alias("qlabel"),
        F.col("e").alias("qe"),
    )
    reps = probes.select(
        "qid",
        "qlabel",
        "qe",
        F.explode(F.array(F.lit(1), F.lit(2), F.lit(3))).alias("p"),
    )
    planted = reps.select(
        (F.lit(1000000) + F.col("qid") * 10 + F.col("p"))
        .cast("bigint")
        .alias("vec_id"),
        F.col("qlabel").alias("label"),
        F.transform(
            F.col("qe"),
            lambda x, i: x
            + F.lit(0.02)
            * F.col("p")
            * ((i * 37 + F.col("p") * 11) % 5 - 2),
        ).alias("e"),
    )
    return base, probes, planted


@register(
    "q126_ann_recall_at_3",
    oracle=_RECALL_ORACLE,
    doc="ANN quality gate (VERDICT r5 #3): recall@3 of the two scale "
    "paths — IVF cell restriction (q52's shape) and hyperplane-LSH "
    "buckets (q69's shape) — against brute-force ground truth over the "
    "same 5 probes, under two protocols: the raw fixture (i.i.d. noise "
    "vectors, so recall is capped at the candidate fraction — the "
    "honest floor) and planted near-duplicates (three deterministic "
    "perturbed copies of each probe; measures whether the structures "
    "retrieve genuinely-similar items). Deterministic end-to-end, "
    "hash-checkable; `hits`/`truth_rows` expose the raw intersection "
    "so a recall change is attributable.",
)
def q126(spark: SparkSession, sf: str) -> DataFrame:
    return _q126_read(spark, sf, _q126_build(spark, sf))


def _q126_build(spark: SparkSession, sf: str):
    """Build phase: the pinned bucketed corpus/probe frames (the ANN
    structures — bucket assignments — are computed and materialized
    here; eight _top3 branches reference them downstream). Per-row L2
    norms ride into the checkpoints (guide §1.2 — a per-row quantity
    computed once at build, not once per scored pair)."""
    base, probes, planted = _planted_sets(spark, sf)
    probes = (
        probes.withColumn("qbkt", _hyperplane_bucket(F.col("qe")))
        .withColumn("__qn", l2_norm(F.col("qe")))
        .localCheckpoint()
    )
    fc = (
        base.withColumn("bkt", _hyperplane_bucket(F.col("e")))
        .withColumn("__nrm", l2_norm(F.col("e")))
        .localCheckpoint()
    )
    pc = (
        base.unionByName(planted)
        .withColumn("bkt", _hyperplane_bucket(F.col("e")))
        .withColumn("__nrm", l2_norm(F.col("e")))
        .localCheckpoint()
    )
    return probes, fc, pc


def _q126_read(spark: SparkSession, sf: str, state) -> DataFrame:
    """Read phase: the bucketed candidate searches, the brute-force
    truth passes they're graded against, and the recall rows. Each
    protocol's truth pass is computed ONCE (lazy checkpoint) — the two
    method rows per protocol grade against the same truth, and the
    brute-force pass is the read's dominant pair count (guide §1.2)."""
    probes, fc, pc = state
    f_truth = _top3(fc, probes, F.lit(True)).localCheckpoint(eager=False)
    p_truth = _top3(pc, probes, F.lit(True)).localCheckpoint(eager=False)
    rows = [
        _recall_row(
            f_truth,
            _top3(fc, probes, F.col("label") == F.col("qlabel")),
            "fixture",
            "ivf_cell",
        ),
        _recall_row(
            f_truth,
            _top3(fc, probes, F.col("bkt") == F.col("qbkt")),
            "fixture",
            "lsh_hyperplane",
        ),
        _recall_row(
            p_truth,
            _top3(pc, probes, F.col("label") == F.col("qlabel")),
            "planted",
            "ivf_cell",
        ),
        _recall_row(
            p_truth,
            _top3(pc, probes, F.col("bkt") == F.col("qbkt")),
            "planted",
            "lsh_hyperplane",
        ),
    ]
    out = rows[0]
    for r in rows[1:]:
        out = out.unionByName(r)
    return out.orderBy("protocol", "method")


register_phases("q126_ann_recall_at_3", _q126_build, _q126_read)


# --- q127: multi-table LSH — the recall lever, measured -------------------

_N_TABLES = 4


def _mt_pairs_sql(tables: list[int]) -> str:
    """Distinct (qid, vec_id) candidates matching in ANY listed table."""
    selects = [
        f"SELECT q.qid, c.vec_id FROM pc c JOIN probes q "
        f"ON c.b{t} = q.qb{t} WHERE c.vec_id <> q.qid"
        for t in tables
    ]
    return " UNION ".join(selects)  # UNION (not ALL): distinct pairs


_MT_ORACLE = f"""
    WITH base AS (
      SELECT CAST(vec_id AS BIGINT) AS vec_id, label,
             list_transform(embedding, v -> CAST(v AS DOUBLE)) AS e
      FROM embeddings
    ),
    probes0 AS (
      SELECT vec_id AS qid, label AS qlabel, e AS qe
      FROM base WHERE vec_id < 5
    ),
    planted AS (
      SELECT CAST(1000000 + p.qid * 10 + s.p AS BIGINT) AS vec_id,
             p.qlabel AS label,
             {_PROBE_PERTURB_SQL} AS e
      FROM probes0 p CROSS JOIN (SELECT unnest([1, 2, 3]) AS p) s
    ),
    pc AS (
      SELECT vec_id, e,
             {", ".join(f"CAST({_bucket_sql('e', t)} AS BIGINT) AS b{t}" for t in range(_N_TABLES))}
      FROM (SELECT * FROM base UNION ALL SELECT * FROM planted)
    ),
    probes AS (
      SELECT qid, qe,
             {", ".join(f"CAST({_bucket_sql('qe', t)} AS BIGINT) AS qb{t}" for t in range(_N_TABLES))}
      FROM probes0
    ),
    scored_truth AS (
      SELECT q.qid, c.vec_id, ROUND({_cos_sql('c.e', 'q.qe')}, 4) AS cs
      FROM pc c JOIN probes q ON TRUE WHERE c.vec_id <> q.qid
    ),
    top_truth AS (
      SELECT qid, vec_id FROM (
        SELECT qid, vec_id, ROW_NUMBER() OVER (PARTITION BY qid
               ORDER BY cs DESC, vec_id) AS rn FROM scored_truth)
      WHERE rn <= 3
    ),
    pairs1 AS ({_mt_pairs_sql([0])}),
    pairs4 AS ({_mt_pairs_sql(list(range(_N_TABLES)))}),
    scored1 AS (
      SELECT p.qid, p.vec_id, ROUND({_cos_sql('c.e', 'q.qe')}, 4) AS cs
      FROM pairs1 p JOIN pc c ON p.vec_id = c.vec_id
      JOIN probes q ON p.qid = q.qid
    ),
    scored4 AS (
      SELECT p.qid, p.vec_id, ROUND({_cos_sql('c.e', 'q.qe')}, 4) AS cs
      FROM pairs4 p JOIN pc c ON p.vec_id = c.vec_id
      JOIN probes q ON p.qid = q.qid
    ),
    top1 AS (
      SELECT qid, vec_id FROM (
        SELECT qid, vec_id, ROW_NUMBER() OVER (PARTITION BY qid
               ORDER BY cs DESC, vec_id) AS rn FROM scored1)
      WHERE rn <= 3
    ),
    top4 AS (
      SELECT qid, vec_id FROM (
        SELECT qid, vec_id, ROW_NUMBER() OVER (PARTITION BY qid
               ORDER BY cs DESC, vec_id) AS rn FROM scored4)
      WHERE rn <= 3
    ),
    per_q AS (
      SELECT 'lsh_1table' AS method, t.qid,
             SUM(CASE WHEN m.vec_id IS NOT NULL THEN 1 ELSE 0 END) AS hits_q,
             COUNT(*) AS truth_q
      FROM top_truth t LEFT JOIN top1 m
        ON t.qid = m.qid AND t.vec_id = m.vec_id
      GROUP BY t.qid
      UNION ALL
      SELECT 'lsh_4tables', t.qid,
             SUM(CASE WHEN m.vec_id IS NOT NULL THEN 1 ELSE 0 END),
             COUNT(*)
      FROM top_truth t LEFT JOIN top4 m
        ON t.qid = m.qid AND t.vec_id = m.vec_id
      GROUP BY t.qid
    )
    SELECT method,
           ROUND(AVG(hits_q * 1.0 / truth_q), 4) AS recall_at_3,
           CAST(SUM(hits_q) AS BIGINT) AS hits,
           CAST(SUM(truth_q) AS BIGINT) AS truth_rows,
           CASE WHEN method = 'lsh_1table'
                THEN (SELECT CAST(COUNT(*) AS BIGINT) FROM pairs1)
                ELSE (SELECT CAST(COUNT(*) AS BIGINT) FROM pairs4)
           END AS n_candidates
    FROM per_q GROUP BY method ORDER BY method
    """


@register(
    "q127_ann_lsh_multitable",
    oracle=_MT_ORACLE,
    doc="Multi-table LSH, the published recall lever measured (closes "
    "q126's two single-table misses): 4 independent 8-plane hyperplane "
    "tables, candidates = distinct pairs matching in ANY table — each "
    "table is still a banded equi-join, so the scale posture is "
    "unchanged while the per-pair collision probability compounds. "
    "Planted-near-dup protocol (q126's); reports recall@3 AND the "
    "candidate count per method, so the recall-vs-candidates trade is "
    "explicit and hash-checked.",
)
def q127(spark: SparkSession, sf: str) -> DataFrame:
    return _q127_read(spark, sf, _q127_build(spark, sf))


def _q127_build(spark: SparkSession, sf: str):
    """Build phase: the 4 hyperplane tables' bucket assignments, pinned
    (eight join branches reference them; each would otherwise replan
    the 4×64-literal bucket expressions — measured 8.2s → ~2s)."""
    base, probes0, planted = _planted_sets(spark, sf)
    pc = base.unionByName(planted).select("vec_id", "e")
    for t in range(_N_TABLES):
        pc = pc.withColumn(f"b{t}", _hyperplane_bucket(F.col("e"), t))
    pc = pc.withColumn("__nrm", l2_norm(F.col("e")))
    probes = probes0.select("qid", "qe")
    for t in range(_N_TABLES):
        probes = probes.withColumn(
            f"qb{t}", _hyperplane_bucket(F.col("qe"), t)
        )
    probes = probes.withColumn("__qn", l2_norm(F.col("qe")))
    return pc.localCheckpoint(), probes.localCheckpoint()


def _q127_read(spark: SparkSession, sf: str, state) -> DataFrame:
    """Read phase: per-table candidate joins, exact re-scores, truth
    pass, recall + candidate counts per method."""
    from functools import reduce

    pc, probes = state
    # ONE brute-force truth pass graded against by both method rows
    # (lazy checkpoint — it was replanned per method before)
    truth = _top3(pc, probes, F.lit(True)).localCheckpoint(eager=False)

    def pairs_for(tables: list[int]) -> DataFrame:
        parts = [
            pc.join(
                F.broadcast(probes), F.col(f"b{t}") == F.col(f"qb{t}")
            )
            .filter(F.col("vec_id") != F.col("qid"))
            .select("qid", "vec_id")
            for t in tables
        ]
        return reduce(lambda a, b: a.unionByName(b), parts).distinct()

    def method_row(tables: list[int], method: str) -> DataFrame:
        pairs = pairs_for(tables)
        scored = (
            pairs.join(pc.select("vec_id", "e", "__nrm"), "vec_id")
            .join(
                F.broadcast(probes.select("qid", "qe", "__qn")), "qid"
            )
            .select(
                "qid",
                "vec_id",
                # dot/(nrm*qn): cosine()'s expression tree with the
                # per-row norms precomputed at build — bit-identical
                F.round(
                    dot(F.col("e"), F.col("qe"))
                    / (F.col("__nrm") * F.col("__qn")),
                    4,
                ).alias("cs"),
            )
        )
        w = W.partitionBy("qid").orderBy(F.col("cs").desc(), "vec_id")
        top = (
            scored.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= 3)
            .select("qid", "vec_id")
        )
        rec = _recall_row(truth, top, "planted", method).drop("protocol")
        n_cand = pairs.agg(
            F.count("*").cast("bigint").alias("n_candidates")
        )
        return rec.crossJoin(F.broadcast(n_cand))

    return (
        method_row([0], "lsh_1table")
        .unionByName(method_row(list(range(_N_TABLES)), "lsh_4tables"))
        .orderBy("method")
    )


register_phases("q127_ann_lsh_multitable", _q127_build, _q127_read)


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


# ---------------------------------------------------------------------------
# q183 — semantic dedup (SemDeDup shape): k-means cells -> intra-cell
# cosine near-dups -> canonical survivor per epsilon-ball
# ---------------------------------------------------------------------------

_SEMDEDUP_TAU = 0.35

_Q183_ORACLE = f"""
WITH emb AS (
  SELECT vec_id, embedding[1:{_KM_DIM}] AS embedding
  FROM embeddings WHERE len(embedding) >= {_KM_DIM}
),
cent0 AS (
  SELECT vec_id AS cid,
         list_transform(embedding[1:{_KM_DIM}], x -> CAST(x AS DOUBLE)) AS c
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
a2 AS ({_km_assign_sql('cent1')}),
cells AS (SELECT vec_id, cid, embedding FROM a2 WHERE rn = 1),
pairs AS (
  SELECT a.cid AS cid, b.vec_id AS vec_id,
         ROUND({_cos_sql('a.embedding', 'b.embedding')}, 4) AS cs
  FROM cells a JOIN cells b
    ON a.cid = b.cid AND a.vec_id < b.vec_id
),
dups AS (
  SELECT DISTINCT cid, vec_id FROM pairs WHERE cs >= {_SEMDEDUP_TAU}
)
SELECT c.cid AS cluster,
       CAST(COUNT(*) AS BIGINT) AS n_members,
       CAST(COUNT(d.vec_id) AS BIGINT) AS n_dups,
       CAST(COUNT(*) - COUNT(d.vec_id) AS BIGINT) AS n_kept
FROM cells c LEFT JOIN dups d
  ON c.cid = d.cid AND c.vec_id = d.vec_id
GROUP BY c.cid ORDER BY cluster
"""


@register(
    "q183_semantic_dedup",
    oracle=_Q183_ORACLE.format(mean6=mean6_sql("embedding[j + 1]")),
    doc="Semantic dedup — the SemDeDup/D4 recipe (public design) "
    "composed from primitives the suite already pins: cluster the "
    "embeddings with q103's deterministic Lloyd pass (K=8, init = K "
    "lowest vec_ids, one update), compute pairwise cosine ONLY within "
    "each cluster (q53's blocking idea with learned cells instead of "
    "labels — the join is an equi-join on cid, never corpus×corpus), "
    "flag a vector as a semantic duplicate when it lies within the "
    "epsilon-ball (cos >= 0.35 on this synthetic corpus) of a LOWER-id "
    "cluster-mate (the paper's keep-one-per-ball policy with lowest-id "
    "canonical, q113's deterministic-survivor idea without needing a "
    "transitive closure), and keep the rest. Per-cluster "
    "(members, dups, kept) rows hash-checked against the same "
    "deterministic centroids in DuckDB. Scale: cells are the blocking "
    "unit — production sizes K with the corpus so intra-cell pairwise "
    "stays bounded (the SemDeDup design point); assignment is one "
    "broadcast pass; nothing quadratic across cells (plan-asserted).",
)
def q183(spark: SparkSession, sf: str) -> DataFrame:
    emb = (
        load(spark, sf, "embeddings")
        .filter(F.size("embedding") >= _KM_DIM)
        .select(
            "vec_id", F.slice("embedding", 1, _KM_DIM).alias("embedding")
        )
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
    # pinned once: cells feeds both sides of the pair join AND the
    # final per-cluster rollup — without the checkpoint the assignment
    # (broadcast scan + argmin) would re-run three times. The L2 norm
    # rides INTO the checkpoint: it is a per-ROW quantity, so paying it
    # per PAIR inside cosine() tripled the quadratic step's interpreted
    # higher-order folds (dot + two norms) — dot/(na*nb) is the exact
    # same double arithmetic (sqrt per row, multiply per pair) with one
    # fold per pair instead of three (guide §1.2: per-task work on the
    # only quadratic term in the plan).
    cells = (
        _km_assign(emb, cent1)
        .select(
            "vec_id",
            "cid",
            "embedding",
            l2_norm(F.col("embedding")).alias("__n"),
        )
        .localCheckpoint()
    )
    lo = cells.select(
        "cid",
        F.col("vec_id").alias("va"),
        F.col("embedding").alias("ea"),
        F.col("__n").alias("na"),
    )
    hi = cells.select(
        "cid", "vec_id", F.col("embedding").alias("eb"), F.col("__n").alias("nb")
    )
    dups = (
        lo.join(hi, "cid")  # equi-join on the cell: the blocking step
        .filter(F.col("va") < F.col("vec_id"))
        .filter(
            F.round(
                dot(F.col("ea"), F.col("eb"))
                / (F.col("na") * F.col("nb")),
                4,
            )
            >= F.lit(_SEMDEDUP_TAU)
        )
        .select("cid", "vec_id")
        .dropDuplicates()
        .withColumn("__dup", F.lit(1))
    )
    return (
        cells.join(dups, ["cid", "vec_id"], "left")
        .groupBy(F.col("cid").alias("cluster"))
        .agg(
            F.count("*").cast("bigint").alias("n_members"),
            F.count("__dup").cast("bigint").alias("n_dups"),
            (F.count("*") - F.count("__dup"))
            .cast("bigint")
            .alias("n_kept"),
        )
        .orderBy("cluster")
    )


# --- q132: IVF with a REAL coarse quantizer (k-means cells), measured -----
#
# q52's cell restriction uses the fixture `label` as the cell assignment;
# its docstring promises "with a real centroid table the assignment is
# one broadcast-join argmin pass". q132 keeps that promise end-to-end
# with hash-checked results: Lloyd centroids (q103's operator, one
# update iteration from the deterministic K-lowest-vec_id init), argmin
# cell assignment for the whole planted corpus, cell-restricted search,
# recall@3 vs brute force — the full production IVF loop.

_Q132_D2 = (
    "list_reduce(list_prepend(0.0::DOUBLE, list_transform(range(1, 65), "
    "i -> (e.e[i] - c.c[i]) * (e.e[i] - c.c[i]))), (acc, v) -> acc + v)"
)


def _q132_assign_sql(cent: str) -> str:
    return f"""
  SELECT vec_id, cid, e, d2,
         ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d2, cid) AS rn
  FROM (
    SELECT e.vec_id, c.cid, e.e, {_Q132_D2} AS d2
    FROM corpus e CROSS JOIN {cent} c)
"""


_Q132_ORACLE = f"""
    WITH base AS (
      SELECT CAST(vec_id AS BIGINT) AS vec_id, label,
             list_transform(embedding, v -> CAST(v AS DOUBLE)) AS e
      FROM embeddings
    ),
    probes0 AS (
      SELECT vec_id AS qid, label AS qlabel, e AS qe
      FROM base WHERE vec_id < 5
    ),
    planted AS (
      SELECT CAST(1000000 + p.qid * 10 + s.p AS BIGINT) AS vec_id,
             p.qlabel AS label,
             {_PROBE_PERTURB_SQL} AS e
      FROM probes0 p CROSS JOIN (SELECT unnest([1, 2, 3]) AS p) s
    ),
    corpus AS (
      SELECT vec_id, e FROM base UNION ALL SELECT vec_id, e FROM planted
    ),
    cent0 AS (SELECT vec_id AS cid, e AS c FROM base WHERE vec_id < 8),
    a1 AS ({_q132_assign_sql('cent0')}),
    cent1 AS (
      SELECT cid, list(cval ORDER BY pos) AS c FROM (
        SELECT cid, j AS pos, {mean6_sql('e[j + 1]')} AS cval
        FROM (SELECT cid, e FROM a1 WHERE rn = 1)
        CROSS JOIN (SELECT unnest(range(64)) AS j)
        GROUP BY cid, j)
      GROUP BY cid
    ),
    a2 AS ({_q132_assign_sql('cent1')}),
    cells AS (SELECT vec_id, cid FROM a2 WHERE rn = 1),
    probes AS (
      SELECT p.qid, p.qe, cc.cid AS qcell
      FROM probes0 p JOIN cells cc ON p.qid = cc.vec_id
    ),
    scored_truth AS (
      SELECT q.qid, c.vec_id, ROUND({_cos_sql('c.e', 'q.qe')}, 4) AS cs
      FROM corpus c JOIN probes q ON TRUE WHERE c.vec_id <> q.qid
    ),
    top_truth AS (
      SELECT qid, vec_id FROM (
        SELECT qid, vec_id, ROW_NUMBER() OVER (PARTITION BY qid
               ORDER BY cs DESC, vec_id) AS rn FROM scored_truth)
      WHERE rn <= 3
    ),
    pairs AS (
      SELECT q.qid, c.vec_id
      FROM corpus c JOIN cells cc ON c.vec_id = cc.vec_id
      JOIN probes q ON cc.cid = q.qcell
      WHERE c.vec_id <> q.qid
    ),
    scored AS (
      SELECT p.qid, p.vec_id, ROUND({_cos_sql('c.e', 'q.qe')}, 4) AS cs
      FROM pairs p JOIN corpus c ON p.vec_id = c.vec_id
      JOIN probes q ON p.qid = q.qid
    ),
    topk AS (
      SELECT qid, vec_id FROM (
        SELECT qid, vec_id, ROW_NUMBER() OVER (PARTITION BY qid
               ORDER BY cs DESC, vec_id) AS rn FROM scored)
      WHERE rn <= 3
    ),
    per_q AS (
      SELECT t.qid,
             SUM(CASE WHEN m.vec_id IS NOT NULL THEN 1 ELSE 0 END) AS hits_q,
             COUNT(*) AS truth_q
      FROM top_truth t LEFT JOIN topk m
        ON t.qid = m.qid AND t.vec_id = m.vec_id
      GROUP BY t.qid
    )
    SELECT 'ivf_kmeans_k8' AS method,
           ROUND(AVG(hits_q * 1.0 / truth_q), 4) AS recall_at_3,
           CAST(SUM(hits_q) AS BIGINT) AS hits,
           CAST(SUM(truth_q) AS BIGINT) AS truth_rows,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM pairs) AS n_candidates
    FROM per_q
    """


@register(
    "q132_ann_ivf_kmeans",
    oracle=_Q132_ORACLE,
    doc="IVF with a REAL coarse quantizer, end-to-end (closes q52's "
    "label-as-cell stand-in): Lloyd centroids (q103's operator, one "
    "update from the deterministic K-lowest init), broadcast argmin "
    "cell assignment over the planted corpus, cell-restricted search, "
    "recall@3 vs brute force plus the candidate count — the production "
    "IVF loop, hash-checked. Scale: the quantizer is one broadcast "
    "pass + a K×64 aggregate; search joins per cell; nothing quadratic.",
)
def q132(spark: SparkSession, sf: str) -> DataFrame:
    return _q132_read(spark, sf, _q132_build(spark, sf))


def _q132_build(spark: SparkSession, sf: str):
    """Build phase: coarse-quantizer training + pinned cell-assigned
    corpus/probes — the IVF structure."""
    base, probes0, planted = _planted_sets(spark, sf)
    corpus = (
        base.select("vec_id", "e")
        .unionByName(planted.select("vec_id", "e"))
        .localCheckpoint()  # referenced by assign, truth, and scoring
    )
    corpus_emb = corpus.select("vec_id", F.col("e").alias("embedding"))
    cent0 = base.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("cid"), F.col("e").alias("c")
    )
    a1 = _km_assign(corpus_emb, cent0)
    cent1 = _km_update(a1.select("cid", "embedding"))
    cells = _km_assign(corpus_emb, cent1).select("vec_id", "cid")
    probes = (
        probes0.select("qid", "qe")
        .join(cells, F.col("qid") == F.col("vec_id"))
        .select("qid", "qe", F.col("cid").alias("qcell"))
        .localCheckpoint()
    )
    pc = corpus.join(cells, "vec_id").localCheckpoint()
    return probes, pc


def _q132_read(spark: SparkSession, sf: str, state) -> DataFrame:
    """Read phase: cell-restricted search, truth pass, recall row."""
    probes, pc = state
    truth = _top3(pc, probes, F.lit(True))
    pairs = (
        pc.join(F.broadcast(probes), F.col("cid") == F.col("qcell"))
        .filter(F.col("vec_id") != F.col("qid"))
        .select("qid", "vec_id")
    )
    scored = (
        pairs.join(pc.select("vec_id", "e"), "vec_id")
        .join(F.broadcast(probes.select("qid", "qe")), "qid")
        .select(
            "qid",
            "vec_id",
            F.round(cosine(F.col("e"), F.col("qe")), 4).alias("cs"),
        )
    )
    w = W.partitionBy("qid").orderBy(F.col("cs").desc(), "vec_id")
    top = (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("qid", "vec_id")
    )
    rec = _recall_row(truth, top, "planted", "ivf_kmeans_k8").drop(
        "protocol"
    )
    n_cand = pairs.agg(F.count("*").cast("bigint").alias("n_candidates"))
    return rec.crossJoin(F.broadcast(n_cand))


register_phases("q132_ann_ivf_kmeans", _q132_build, _q132_read)


# --- q137: product quantization (PQ) with ADC scoring, measured -----------
#
# The third leg of the scale-ANN tripod: IVF restricts WHICH vectors a
# probe scores (q52/q132), LSH buckets do the same by random projection
# (q69/q127), PQ compresses HOW each score is computed — a 64-dim f32
# vector becomes M=4 one-byte codes (64× smaller), and a probe's
# distance to any vector is a sum of M table lookups instead of 64
# multiplies (asymmetric distance computation, ADC). At 100 TB the
# codes for ten billion vectors fit in cluster memory where the raw
# vectors never could; production systems compose IVF×PQ (restrict,
# then score compressed). Public design: Jégou et al., "Product
# Quantization for Nearest Neighbor Search", TPAMI 2011.

_PQ_M, _PQ_SUB, _PQ_K = 4, 16, 8

_PQ_SUB_D2 = (
    "list_reduce(list_prepend(0.0::DOUBLE, list_transform(range(1, 17), "
    "i -> (s.sub[i] - c.c[i]) * (s.sub[i] - c.c[i]))), (acc, v) -> acc + v)"
)

_PQ_FULL_D2 = (
    "list_reduce(list_prepend(0.0::DOUBLE, list_transform(range(1, 65), "
    "i -> (c.e[i] - q.qe[i]) * (c.e[i] - q.qe[i]))), (acc, v) -> acc + v)"
)


def _pq_assign_sql(cent: str) -> str:
    return f"""
  SELECT vec_id, m, cid, sub, d2,
         ROW_NUMBER() OVER (PARTITION BY vec_id, m ORDER BY d2, cid) AS rn
  FROM (
    SELECT s.vec_id, s.m, c.cid, s.sub, {_PQ_SUB_D2} AS d2
    FROM subs s JOIN {cent} c ON s.m = c.m)
"""


# shared CTE chain through the ADC score table (q137 tops it at 3;
# q151 additionally re-ranks the top-10 exactly)
_PQ_ORACLE_CTES = f"""
    WITH base AS (
      SELECT CAST(vec_id AS BIGINT) AS vec_id, label,
             list_transform(embedding, v -> CAST(v AS DOUBLE)) AS e
      FROM embeddings
    ),
    probes0 AS (
      SELECT vec_id AS qid, label AS qlabel, e AS qe
      FROM base WHERE vec_id < 5
    ),
    planted AS (
      SELECT CAST(1000000 + p.qid * 10 + s.p AS BIGINT) AS vec_id,
             p.qlabel AS label,
             {_PROBE_PERTURB_SQL} AS e
      FROM probes0 p CROSS JOIN (SELECT unnest([1, 2, 3]) AS p) s
    ),
    corpus AS (
      SELECT vec_id, e FROM base UNION ALL SELECT vec_id, e FROM planted
    ),
    ms AS (SELECT unnest(range({_PQ_M})) AS m),
    subs AS (
      SELECT vec_id, m,
             list_transform(range(1, 17), i -> e[m * 16 + i]) AS sub
      FROM corpus CROSS JOIN ms
    ),
    cent0 AS (
      SELECT m, vec_id AS cid,
             list_transform(range(1, 17), i -> e[m * 16 + i]) AS c
      FROM base CROSS JOIN ms WHERE vec_id < {_PQ_K}
    ),
    a1 AS ({_pq_assign_sql('cent0')}),
    cent1 AS (
      SELECT m, cid, list(cval ORDER BY pos) AS c FROM (
        SELECT m, cid, j AS pos, {{mean6}} AS cval
        FROM (SELECT m, cid, sub FROM a1 WHERE rn = 1)
        CROSS JOIN (SELECT unnest(range(16)) AS j)
        GROUP BY m, cid, j)
      GROUP BY m, cid
    ),
    codes AS (
      SELECT vec_id, m, cid AS code
      FROM ({_pq_assign_sql('cent1')}) WHERE rn = 1
    ),
    qsubs AS (
      SELECT qid, m,
             list_transform(range(1, 17), i -> qe[m * 16 + i]) AS sub
      FROM probes0 CROSS JOIN ms
    ),
    dist_tab AS (
      SELECT s.qid, s.m, c.cid,
             {micro6_sql(_PQ_SUB_D2)} AS dmicro
      FROM qsubs s JOIN cent1 c ON s.m = c.m
    ),
    adc AS (
      SELECT d.qid, k.vec_id, SUM(d.dmicro) AS adist
      FROM codes k JOIN dist_tab d ON k.m = d.m AND k.code = d.cid
      WHERE k.vec_id <> d.qid
      GROUP BY d.qid, k.vec_id
    ),
    topk AS (
      SELECT qid, vec_id FROM (
        SELECT qid, vec_id, ROW_NUMBER() OVER (PARTITION BY qid
               ORDER BY adist, vec_id) AS rn FROM adc)
      WHERE rn <= 3
    ),
    scored_truth AS (
      SELECT q.qid, c.vec_id, {_PQ_FULL_D2} AS d2
      FROM corpus c CROSS JOIN probes0 q WHERE c.vec_id <> q.qid
    ),
    top_truth AS (
      SELECT qid, vec_id FROM (
        SELECT qid, vec_id, ROW_NUMBER() OVER (PARTITION BY qid
               ORDER BY d2, vec_id) AS rn FROM scored_truth)
      WHERE rn <= 3
    )"""

_Q137_ORACLE = (
    _PQ_ORACLE_CTES
    + """,
    per_q AS (
      SELECT t.qid,
             SUM(CASE WHEN m.vec_id IS NOT NULL THEN 1 ELSE 0 END) AS hits_q,
             COUNT(*) AS truth_q
      FROM top_truth t LEFT JOIN topk m
        ON t.qid = m.qid AND t.vec_id = m.vec_id
      GROUP BY t.qid
    )
    SELECT 'pq_adc_m4x8' AS method,
           ROUND(AVG(hits_q * 1.0 / truth_q), 4) AS recall_at_3,
           CAST(SUM(hits_q) AS BIGINT) AS hits,
           CAST(SUM(truth_q) AS BIGINT) AS truth_rows,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM corpus) AS n_encoded
    FROM per_q
    """
)

_Q151_RERANK_C = 10

_Q151_ORACLE = (
    _PQ_ORACLE_CTES
    + f""",
    cand AS (
      SELECT qid, vec_id FROM (
        SELECT qid, vec_id, ROW_NUMBER() OVER (PARTITION BY qid
               ORDER BY adist, vec_id) AS rn FROM adc)
      WHERE rn <= {_Q151_RERANK_C}
    ),
    rr AS (
      SELECT q.qid, c.vec_id, {_PQ_FULL_D2} AS d2
      FROM cand JOIN corpus c ON cand.vec_id = c.vec_id
                JOIN probes0 q ON cand.qid = q.qid
    ),
    top_rr AS (
      SELECT qid, vec_id FROM (
        SELECT qid, vec_id, ROW_NUMBER() OVER (PARTITION BY qid
               ORDER BY d2, vec_id) AS rn FROM rr)
      WHERE rn <= 3
    ),
    per_q AS (
      SELECT 'pq_adc_m4x8' AS method, 0 AS n_rerank, t.qid,
             SUM(CASE WHEN m.vec_id IS NOT NULL THEN 1 ELSE 0 END) AS hits_q,
             COUNT(*) AS truth_q
      FROM top_truth t LEFT JOIN topk m
        ON t.qid = m.qid AND t.vec_id = m.vec_id
      GROUP BY t.qid
      UNION ALL
      SELECT 'pq_adc_rerank{_Q151_RERANK_C}' AS method,
             {_Q151_RERANK_C} AS n_rerank, t.qid,
             SUM(CASE WHEN m.vec_id IS NOT NULL THEN 1 ELSE 0 END) AS hits_q,
             COUNT(*) AS truth_q
      FROM top_truth t LEFT JOIN top_rr m
        ON t.qid = m.qid AND t.vec_id = m.vec_id
      GROUP BY t.qid
    )
    SELECT method,
           ROUND(AVG(hits_q * 1.0 / truth_q), 4) AS recall_at_3,
           CAST(SUM(hits_q) AS BIGINT) AS hits,
           CAST(SUM(truth_q) AS BIGINT) AS truth_rows,
           CAST(MAX(n_rerank) AS BIGINT) AS n_rerank_candidates
    FROM per_q GROUP BY method ORDER BY method
    """
)


def _pq_subspaces(df: DataFrame, vec_col: str, id_cols: list[str]) -> DataFrame:
    """Explode a 64-dim vector into (id..., m, sub[16]) subvector rows."""
    slices = F.array(
        *[
            F.slice(F.col(vec_col), m * _PQ_SUB + 1, _PQ_SUB)
            for m in range(_PQ_M)
        ]
    )
    return df.select(
        *id_cols, F.posexplode(slices).alias("m", "sub")
    )


def _pq_sub_d2():
    return F.aggregate(
        F.zip_with(
            F.col("sub"), F.col("c"), lambda x, y: (x - y) * (x - y)
        ),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _pq_assign(subs: DataFrame, cent: DataFrame) -> DataFrame:
    """Per-(vec_id, m) nearest sub-centroid: struct-min argmin, ties on
    cid — the same determinism recipe as _km_assign."""
    scored = subs.join(F.broadcast(cent), "m").withColumn(
        "d2", _pq_sub_d2()
    )
    return (
        scored.groupBy("vec_id", "m")
        .agg(
            F.min(F.struct(F.col("d2"), F.col("cid"), F.col("sub"))).alias(
                "a"
            )
        )
        .select(
            "vec_id",
            "m",
            F.col("a.cid").alias("cid"),
            F.col("a.sub").alias("sub"),
        )
    )


@register(
    "q137_ann_pq_adc",
    oracle=_Q137_ORACLE.format(mean6=mean6_sql("sub[j + 1]")),
    doc="Product quantization with ADC scoring, hash-checked end-to-end "
    "(Jégou et al. 2011, the compression leg of scale ANN alongside "
    "IVF q132 and multi-table LSH q127): 64-dim vectors split into "
    "M=4 16-dim subspaces, one deterministic Lloyd iteration per "
    "subspace (K=8, init = 8 lowest vec_ids — q103's recipe), corpus "
    "encoded to 4 one-byte codes (64x smaller than f32), probe "
    "distances computed as SUM of M lookup-table entries (micro-unit "
    "BIGINTs, so the ADC sum is exact and order-free in both engines), "
    "recall@3 vs exact-L2 truth on the planted protocol. Scale: "
    "codebooks are K x M rows broadcast both directions; the ADC scan "
    "is one broadcast join over the code table + a (qid, vec_id) sum — "
    "linear, shuffle-light, and the code table is what fits in memory "
    "at 10^10 vectors. Compose with q132's IVF cells to restrict the "
    "scan before ADC-scoring it (IVF-PQ).",
)
def q137(spark: SparkSession, sf: str) -> DataFrame:
    return _q137_read(spark, sf, _pq_adc_frames(spark, sf))


def _q137_build(spark: SparkSession, sf: str):
    """Build phase: codebooks + corpus ENCODING + truth, pinned — the
    PQ structure a deployment would hold in memory."""
    return _pq_adc_frames(spark, sf, pin=True)


def _q137_read(spark: SparkSession, sf: str, state) -> DataFrame:
    """Read phase: the ADC lookup-table scan + top-3 + recall."""
    corpus, probes0, adc, truth = state
    w = W.partitionBy("qid").orderBy("adist", "vec_id")
    top = (
        adc.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("qid", "vec_id")
    )
    rec = _recall_row(truth, top, "planted", "pq_adc_m4x8").drop("protocol")
    n_enc = corpus.agg(F.count("*").cast("bigint").alias("n_encoded"))
    return rec.crossJoin(F.broadcast(n_enc))


register_phases("q137_ann_pq_adc", _q137_build, _q137_read)


def _pq_full_d2():
    return F.aggregate(
        F.zip_with(
            F.col("e"), F.col("qe"), lambda x, y: (x - y) * (x - y)
        ),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _pq_encode(
    base: DataFrame,
    corpus: DataFrame,
    probes0: DataFrame,
    pin: bool = False,
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Train the PQ codebooks (q137's recipe: one deterministic Lloyd
    iteration per subspace from the K-lowest init), encode ``corpus``
    to codes, and build the probes' ADC lookup table. Returns
    (codes, dist_tab, sub-centroids)."""
    from parquet_demo_spark.functions import micro6

    subs = _pq_subspaces(corpus, "e", ["vec_id"]).localCheckpoint()
    cent0 = _pq_subspaces(
        base.filter(F.col("vec_id") < _PQ_K).select(
            F.col("vec_id").alias("cid"), "e"
        ),
        "e",
        ["cid"],
    ).select("m", "cid", F.col("sub").alias("c"))
    a1 = _pq_assign(subs, cent0)
    # per-(m, cid, pos) mean6 partials -> rebuilt 16-dim sub-centroids
    ex = a1.select("m", "cid", F.posexplode("sub").alias("pos", "val"))
    dims = ex.groupBy("m", "cid", "pos").agg(mean6("val").alias("cval"))
    cent1 = dims.groupBy("m", "cid").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "cval"))),
            lambda s: s["cval"],
        ).alias("c")
    )
    codes = _pq_assign(subs, cent1).select(
        "vec_id", "m", F.col("cid").alias("code")
    )
    if pin:
        codes = codes.localCheckpoint()
    dist_tab = _pq_dist_tab(probes0, cent1)
    return codes, dist_tab, cent1


def _pq_dist_tab(probes0: DataFrame, cent1: DataFrame) -> DataFrame:
    """The probe-side ADC lookup table: per (qid, m, sub-centroid) the
    micro-unit distance of the probe's m-th subvector to the centroid.
    QUERY-time work (depends on the probe), computed from the (stored)
    codebooks — K x M rows per probe, broadcast-sized."""
    from parquet_demo_spark.functions import micro6

    qsubs = _pq_subspaces(
        probes0.select("qid", F.col("qe").alias("e")), "e", ["qid"]
    )
    return (
        qsubs.join(F.broadcast(cent1), "m")
        .withColumn("dmicro", micro6(_pq_sub_d2()))
        .select("qid", "m", "cid", "dmicro")
    )


def _pq_adc(codes: DataFrame, dist_tab: DataFrame) -> DataFrame:
    """ADC scores per (qid, vec_id): sum of M lookup-table entries."""
    return (
        codes.join(
            F.broadcast(dist_tab.withColumnRenamed("cid", "code")),
            ["m", "code"],
        )
        .filter(F.col("vec_id") != F.col("qid"))
        .groupBy("qid", "vec_id")
        .agg(F.sum("dmicro").alias("adist"))
    )


def _pq_adc_frames(
    spark: SparkSession, sf: str, pin: bool = False
) -> tuple[DataFrame, DataFrame, DataFrame, DataFrame]:
    """The shared PQ pipeline (q137/q151): returns (corpus, probes0,
    adc scores per (qid, vec_id), exact-L2 top-3 truth). ``pin=True``
    additionally materializes the corpus CODES and the truth (the
    bench build phase: encoding is build, the ADC scan is the query)."""
    base, probes0, planted = _planted_sets(spark, sf)
    corpus = (
        base.select("vec_id", "e")
        .unionByName(planted.select("vec_id", "e"))
        .localCheckpoint()
    )
    codes, dist_tab, _ = _pq_encode(base, corpus, probes0, pin=pin)
    adc = _pq_adc(codes, dist_tab)
    scored_truth = (
        corpus.crossJoin(F.broadcast(probes0.select("qid", "qe")))
        .filter(F.col("vec_id") != F.col("qid"))
        .withColumn("d2", _pq_full_d2())
    )
    wt = W.partitionBy("qid").orderBy("d2", "vec_id")
    truth = (
        scored_truth.withColumn("rn", F.row_number().over(wt))
        .filter(F.col("rn") <= 3)
        .select("qid", "vec_id")
    )
    if pin:
        truth = truth.localCheckpoint()
    return corpus, probes0, adc, truth


@register(
    "q151_ann_pq_rerank",
    oracle=_Q151_ORACLE.format(mean6=mean6_sql("sub[j + 1]")),
    doc="PQ/ADC with an exact re-rank stage (VERDICT r6 #4 — Jégou et "
    "al.'s own production fix for ADC quantization error): the ADC "
    "pass returns its top-10 candidates per probe, those 10 rows join "
    "back to the RAW vectors and re-score with exact L2, and the final "
    "top-3 is taken from the exact scores. Both rows are reported — "
    "pq_adc_m4x8 (no re-rank, q137's 0.9333 recall) and pq_adc_rerank10 "
    "— with the candidate budget, so the hash check pins the recall "
    "improvement itself, not just the winner. Scale: the re-rank is "
    "candidates x exact, never corpus x corpus — 10 rows per probe join "
    "the corpus by vec_id (a broadcast-able key join), so at 10^10 "
    "vectors the exact-scoring cost is O(probes x C), and the corpus "
    "read is a point-lookup pattern an id-bucketed layout serves "
    "without a shuffle.",
)
def q151(spark: SparkSession, sf: str) -> DataFrame:
    return _q151_read(spark, sf, _pq_adc_frames(spark, sf, pin=True))


def _q151_read(spark: SparkSession, sf: str, state) -> DataFrame:
    """Read phase: ADC scan (pinned — two branches read the scores),
    top-C candidate cut, exact re-rank, both recall rows."""
    corpus, probes0, adc, truth = state
    adc = adc.localCheckpoint()  # two branches read the ADC scores
    w = W.partitionBy("qid").orderBy("adist", "vec_id")
    ranked = adc.withColumn("rn", F.row_number().over(w))
    top_plain = ranked.filter(F.col("rn") <= 3).select("qid", "vec_id")
    cand = ranked.filter(F.col("rn") <= _Q151_RERANK_C).select(
        "qid", "vec_id"
    )
    # exact re-scoring of ONLY the candidates: C rows per probe join the
    # raw vectors by id — never corpus x corpus
    rr = (
        cand.join(corpus, "vec_id")
        .join(F.broadcast(probes0.select("qid", "qe")), "qid")
        .withColumn("d2", _pq_full_d2())
    )
    wrr = W.partitionBy("qid").orderBy("d2", "vec_id")
    top_rr = (
        rr.withColumn("rn", F.row_number().over(wrr))
        .filter(F.col("rn") <= 3)
        .select("qid", "vec_id")
    )
    rec_plain = (
        _recall_row(truth, top_plain, "planted", "pq_adc_m4x8")
        .drop("protocol")
        .withColumn("n_rerank_candidates", F.lit(0).cast("bigint"))
    )
    rec_rr = (
        _recall_row(
            truth, top_rr, "planted", f"pq_adc_rerank{_Q151_RERANK_C}"
        )
        .drop("protocol")
        .withColumn(
            "n_rerank_candidates", F.lit(_Q151_RERANK_C).cast("bigint")
        )
    )
    return rec_plain.unionByName(rec_rr).orderBy("method")


register_phases("q151_ann_pq_rerank", _q137_build, _q151_read)


# --- q153: IVF nprobe sweep on a boundary-planted protocol ------------------

_Q153_D2_EC = (
    "list_reduce(list_prepend(0.0::DOUBLE, list_transform(range(1, 65), "
    "i -> (e.e[i] - c.c[i]) * (e.e[i] - c.c[i]))), (acc, v) -> acc + v)"
)
_Q153_D2_QC = (
    "list_reduce(list_prepend(0.0::DOUBLE, list_transform(range(1, 65), "
    "i -> (p.qe[i] - c.c[i]) * (p.qe[i] - c.c[i]))), (acc, v) -> acc + v)"
)

_Q153_ORACLE = f"""
    WITH base AS (
      SELECT CAST(vec_id AS BIGINT) AS vec_id,
             list_transform(embedding, v -> CAST(v AS DOUBLE)) AS e
      FROM embeddings
    ),
    probes0 AS (SELECT vec_id AS qid, e AS qe FROM base WHERE vec_id < 5),
    cent0 AS (SELECT vec_id AS cid, e AS c FROM base WHERE vec_id < 8),
    a1 AS (
      SELECT vec_id, cid, e,
             ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d2, cid) AS rn
      FROM (SELECT e.vec_id, c.cid, e.e, {_Q153_D2_EC} AS d2
            FROM base e CROSS JOIN cent0 c)
    ),
    cent1 AS (
      SELECT cid, list(cval ORDER BY pos) AS c FROM (
        SELECT cid, j AS pos, {mean6_sql('e[j + 1]')} AS cval
        FROM (SELECT cid, e FROM a1 WHERE rn = 1)
        CROSS JOIN (SELECT unnest(range(64)) AS j)
        GROUP BY cid, j)
      GROUP BY cid
    ),
    qrank AS (
      SELECT qid, qe, cid, c,
             ROW_NUMBER() OVER (PARTITION BY qid ORDER BY d2, cid) AS rnk
      FROM (SELECT p.qid, p.qe, c.cid, c.c, {_Q153_D2_QC} AS d2
            FROM probes0 p CROSS JOIN cent1 c)
    ),
    planted AS (
      SELECT CAST(2000000 + qid * 10 + s.p AS BIGINT) AS vec_id,
             list_transform(range(1, 65), i -> qe[i]
               + (CAST(0.4 AS DOUBLE) + CAST(0.15 AS DOUBLE) * s.p)
                 * (c[i] - qe[i])) AS e
      FROM (SELECT qid, qe, c FROM qrank WHERE rnk = 2)
      CROSS JOIN (SELECT unnest([1, 2, 3]) AS p) s
    ),
    corpus AS (
      SELECT vec_id, e FROM base UNION ALL SELECT vec_id, e FROM planted
    ),
    a2 AS (
      SELECT vec_id, cid,
             ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d2, cid) AS rn
      FROM (SELECT e.vec_id, c.cid, {_Q153_D2_EC} AS d2
            FROM corpus e CROSS JOIN cent1 c)
    ),
    cells AS (SELECT vec_id, cid FROM a2 WHERE rn = 1),
    scored_truth AS (
      SELECT q.qid, c.vec_id, ROUND({_cos_sql('c.e', 'q.qe')}, 4) AS cs
      FROM corpus c CROSS JOIN probes0 q WHERE c.vec_id <> q.qid
    ),
    top_truth AS (
      SELECT qid, vec_id FROM (
        SELECT qid, vec_id, ROW_NUMBER() OVER (PARTITION BY qid
               ORDER BY cs DESC, vec_id) AS rn FROM scored_truth)
      WHERE rn <= 3
    ),
    probed AS (SELECT qid, cid, rnk FROM qrank WHERE rnk <= 3),
    pairs AS (
      SELECT n.np, q.qid, cc.vec_id
      FROM (SELECT unnest([1, 2, 3]) AS np) n
      JOIN probed q ON q.rnk <= n.np
      JOIN cells cc ON cc.cid = q.cid
      WHERE cc.vec_id <> q.qid
    ),
    scored AS (
      SELECT p.np, p.qid, p.vec_id,
             ROUND({_cos_sql('c.e', 'q.qe')}, 4) AS cs
      FROM pairs p JOIN corpus c ON p.vec_id = c.vec_id
      JOIN probes0 q ON p.qid = q.qid
    ),
    topk AS (
      SELECT np, qid, vec_id FROM (
        SELECT np, qid, vec_id, ROW_NUMBER() OVER (PARTITION BY np, qid
               ORDER BY cs DESC, vec_id) AS rn FROM scored)
      WHERE rn <= 3
    ),
    cand_n AS (SELECT np, COUNT(*) AS n_cand FROM pairs GROUP BY np),
    per_q AS (
      SELECT n.np, t.qid,
             SUM(CASE WHEN m.vec_id IS NOT NULL THEN 1 ELSE 0 END) AS hits_q,
             COUNT(*) AS truth_q
      FROM (SELECT unnest([1, 2, 3]) AS np) n
      CROSS JOIN top_truth t
      LEFT JOIN topk m
        ON m.np = n.np AND t.qid = m.qid AND t.vec_id = m.vec_id
      GROUP BY n.np, t.qid
    )
    SELECT 'ivf_k8_nprobe' || CAST(p.np AS VARCHAR) AS method,
           CAST(p.np AS BIGINT) AS nprobe,
           ROUND(AVG(hits_q * 1.0 / truth_q), 4) AS recall_at_3,
           CAST(SUM(hits_q) AS BIGINT) AS hits,
           CAST(SUM(truth_q) AS BIGINT) AS truth_rows,
           CAST(MAX(c.n_cand) AS BIGINT) AS n_candidates
    FROM per_q p JOIN cand_n c ON p.np = c.np
    GROUP BY p.np ORDER BY nprobe
    """


@register(
    "q153_ann_ivf_nprobe",
    oracle=_Q153_ORACLE,
    doc="IVF nprobe sweep on a BOUNDARY-planted protocol (VERDICT r6 "
    "#6): q132's single-cell search is exposed by planting, for each "
    "probe, three vectors blended toward the probe's SECOND-nearest "
    "centroid (beta = 0.55/0.70/0.85 along the qe->c2 segment) — all "
    "three stay in the probe's exact top-3 (cos 0.96/0.88/0.65, far "
    "above the ~0.42 corpus max), but the far blends cross the Voronoi "
    "boundary into the rank-2 cell, so nprobe=1 provably misses them. "
    "The query probes the 1, 2, and 3 nearest centroids and reports "
    "recall@3 + candidate count per nprobe — the classic recall/cost "
    "trade, hash-checked (centroids via the q103 mean6 recipe, blends "
    "and distances as identical sequential double ops in both engines, "
    "scores rounded before ranking). Scale: probing p cells multiplies "
    "candidates by ~p, never corpus size; the per-cell join stays an "
    "equi-join on cid.",
)
def q153(spark: SparkSession, sf: str) -> DataFrame:
    return _q153_read(spark, sf, _q153_build(spark, sf))


def _q153_build(spark: SparkSession, sf: str):
    """Build phase: quantizer training, boundary plants, cell-assigned
    corpus, probe cell ranking, and the pinned truth."""
    base, probes0, _ = _planted_sets(spark, sf)
    corpus0 = base.select("vec_id", "e")
    emb0 = corpus0.select("vec_id", F.col("e").alias("embedding"))
    cent0 = base.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("cid"), F.col("e").alias("c")
    )
    a1 = _km_assign(emb0, cent0)
    cent1 = _km_update(a1.select("cid", "embedding")).localCheckpoint()
    qd2 = F.aggregate(
        F.zip_with(F.col("qe"), F.col("c"), lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    wq = W.partitionBy("qid").orderBy("d2", "cid")
    qr = (
        probes0.select("qid", "qe")
        .crossJoin(F.broadcast(cent1))
        .withColumn("d2", qd2)
        .withColumn("rnk", F.row_number().over(wq))
        .filter(F.col("rnk") <= 3)
        .localCheckpoint()  # probed cells + blend source, read per nprobe
    )
    second = qr.filter(F.col("rnk") == 2).select(
        "qid", "qe", F.col("c").alias("c2")
    )
    reps = second.select(
        "qid",
        "qe",
        "c2",
        F.explode(F.array(F.lit(1), F.lit(2), F.lit(3))).alias("p"),
    )
    planted = reps.select(
        (F.lit(2000000) + F.col("qid") * 10 + F.col("p"))
        .cast("bigint")
        .alias("vec_id"),
        F.zip_with(
            "qe",
            "c2",
            lambda x, y: x
            + (F.lit(0.4) + F.lit(0.15) * F.col("p")) * (y - x),
        ).alias("e"),
    )
    corpus = corpus0.unionByName(planted).localCheckpoint()
    cells = _km_assign(
        corpus.select("vec_id", F.col("e").alias("embedding")), cent1
    ).select("vec_id", "cid")
    pc = corpus.join(cells, "vec_id").localCheckpoint()
    truth = _top3(pc, probes0.select("qid", "qe"), F.lit(True)).localCheckpoint()
    return probes0, qr, pc, truth


def _q153_read(spark: SparkSession, sf: str, state) -> DataFrame:
    """Read phase: the per-nprobe cell-restricted searches + recall."""
    probes0, qr, pc, truth = state
    out = None
    for np_ in (1, 2, 3):
        probed = qr.filter(F.col("rnk") <= np_).select("qid", "cid")
        pairs = (
            pc.join(F.broadcast(probed), "cid")
            .filter(F.col("vec_id") != F.col("qid"))
            .select("qid", "vec_id")
        )
        scored = (
            pairs.join(pc.select("vec_id", "e"), "vec_id")
            .join(F.broadcast(probes0.select("qid", "qe")), "qid")
            .select(
                "qid",
                "vec_id",
                F.round(cosine(F.col("e"), F.col("qe")), 4).alias("cs"),
            )
        )
        w = W.partitionBy("qid").orderBy(F.col("cs").desc(), "vec_id")
        top = (
            scored.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= 3)
            .select("qid", "vec_id")
        )
        rec = (
            _recall_row(truth, top, "planted", f"ivf_k8_nprobe{np_}")
            .drop("protocol")
            .withColumn("nprobe", F.lit(np_).cast("bigint"))
        )
        n_cand = pairs.agg(
            F.count("*").cast("bigint").alias("n_candidates")
        )
        row = rec.crossJoin(F.broadcast(n_cand)).select(
            "method",
            "nprobe",
            "recall_at_3",
            "hits",
            "truth_rows",
            "n_candidates",
        )
        out = row if out is None else out.unionByName(row)
    return out.orderBy("nprobe")


register_phases("q153_ann_ivf_nprobe", _q153_build, _q153_read)


# --- q156: IVF x PQ composition — the production ANN stack -----------------

_Q156_ORACLE = (
    _PQ_ORACLE_CTES
    + f""",
    icent0 AS (SELECT vec_id AS cid, e AS c FROM base WHERE vec_id < 8),
    ia1 AS (
      SELECT vec_id, cid, e,
             ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d2, cid) AS rn
      FROM (SELECT e.vec_id, c.cid, e.e, {_Q153_D2_EC} AS d2
            FROM corpus e CROSS JOIN icent0 c)
    ),
    icent1 AS (
      SELECT cid, list(cval ORDER BY pos) AS c FROM (
        SELECT cid, j AS pos, {{imean6}} AS cval
        FROM (SELECT cid, e FROM ia1 WHERE rn = 1)
        CROSS JOIN (SELECT unnest(range(64)) AS j)
        GROUP BY cid, j)
      GROUP BY cid
    ),
    ia2 AS (
      SELECT vec_id, cid,
             ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d2, cid) AS rn
      FROM (SELECT e.vec_id, c.cid, {_Q153_D2_EC} AS d2
            FROM corpus e CROSS JOIN icent1 c)
    ),
    cells AS (SELECT vec_id, cid FROM ia2 WHERE rn = 1),
    qrank AS (
      SELECT qid, cid,
             ROW_NUMBER() OVER (PARTITION BY qid ORDER BY d2, cid) AS rnk
      FROM (SELECT p.qid, c.cid, {_Q153_D2_QC} AS d2
            FROM probes0 p CROSS JOIN icent1 c)
    ),
    cand AS (
      SELECT q.qid, cc.vec_id
      FROM (SELECT qid, cid FROM qrank WHERE rnk <= 2) q
      JOIN cells cc ON cc.cid = q.cid
      WHERE cc.vec_id <> q.qid
    ),
    radc AS (
      SELECT cand.qid, k.vec_id, SUM(d.dmicro) AS adist
      FROM cand
      JOIN codes k ON cand.vec_id = k.vec_id
      JOIN dist_tab d
        ON d.qid = cand.qid AND k.m = d.m AND k.code = d.cid
      GROUP BY cand.qid, k.vec_id
    ),
    cand10 AS (
      SELECT qid, vec_id FROM (
        SELECT qid, vec_id, ROW_NUMBER() OVER (PARTITION BY qid
               ORDER BY adist, vec_id) AS rn FROM radc)
      WHERE rn <= 10
    ),
    rr AS (
      SELECT q.qid, c.vec_id, {_PQ_FULL_D2} AS d2
      FROM cand10 JOIN corpus c ON cand10.vec_id = c.vec_id
                  JOIN probes0 q ON cand10.qid = q.qid
    ),
    top_rr AS (
      SELECT qid, vec_id FROM (
        SELECT qid, vec_id, ROW_NUMBER() OVER (PARTITION BY qid
               ORDER BY d2, vec_id) AS rn FROM rr)
      WHERE rn <= 3
    ),
    per_q AS (
      SELECT t.qid,
             SUM(CASE WHEN m.vec_id IS NOT NULL THEN 1 ELSE 0 END) AS hits_q,
             COUNT(*) AS truth_q
      FROM top_truth t LEFT JOIN top_rr m
        ON t.qid = m.qid AND t.vec_id = m.vec_id
      GROUP BY t.qid
    )
    SELECT 'ivfpq_np2_rerank10' AS method,
           ROUND(AVG(hits_q * 1.0 / truth_q), 4) AS recall_at_3,
           CAST(SUM(hits_q) AS BIGINT) AS hits,
           CAST(SUM(truth_q) AS BIGINT) AS truth_rows,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM cand) AS n_candidates,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM corpus) AS n_encoded
    FROM per_q
    """
)


@register(
    "q156_ann_ivfpq",
    oracle=_Q156_ORACLE.format(
        mean6=mean6_sql("sub[j + 1]"), imean6=mean6_sql("e[j + 1]")
    ),
    doc="IVF x PQ with exact re-rank — the PRODUCTION ANN stack "
    "(Jégou's IVFADC), composed end-to-end and hash-checked: the IVF "
    "coarse quantizer (q132's Lloyd recipe) restricts each probe to "
    "its 2 nearest cells' members, the PQ codes (q137's codebooks) "
    "ADC-score ONLY those candidates via the probe's lookup table, "
    "the top-10 ADC survivors re-score exactly against the raw "
    "vectors (q151's re-rank), and recall@3 is measured against "
    "brute-force L2 truth, with the candidate count exposing the "
    "pruning. Each stage is individually proven (q132/q137/q151/"
    "q153); this row pins their COMPOSITION — restrict, then "
    "compress-score, then exact-verify. The index PERSISTS as parquet "
    "tables — corpus partitioned by IVF cell (probed-cells reads open "
    "only their cell dirs, the search-index pruning story), codes, "
    "codebooks — built once and served from storage; only the "
    "probe-side lookup table is computed per query. Scale: the scan "
    "is |probed cells| of the corpus, each scored as M one-byte code "
    "lookups, and only probes x 10 rows ever touch a raw vector — "
    "the layout that serves 10^10 vectors from memory. "
    "operators/similarity.py.",
)
def q156(spark: SparkSession, sf: str) -> DataFrame:
    return _q156_read(spark, sf, _q156_build(spark, sf))


def _q156_build(spark: SparkSession, sf: str):
    """Build phase — the vector index PERSISTED as lakehouse tables:
    the cell-assigned corpus, the PQ codes, the PQ sub-centroid
    codebooks, the probes' ranked cells, and the exact truth are each
    written as parquet (cached per (sf, pid) like the stored search
    index); the read phase serves entirely from storage, computing only
    the probe-side ADC lookup table at query time. This is the
    build-once/serve-forever deployment shape: at 10^10 vectors the
    codes table is what a serving fleet maps into memory."""
    import os
    import tempfile

    base_dir = os.path.join(
        tempfile.gettempdir(),
        "spark_graft_ivfpq",
        f"{sf.strip('/').replace('/', '_')}_pid{os.getpid()}",
    )
    # _READY2: the stored-table set grew (icent1, for q160's streaming
    # maintenance) — a v1 marker from an earlier build in the same
    # process must not satisfy the check
    marker = os.path.join(base_dir, "_READY2")
    if not os.path.exists(marker):
        base, probes0, planted = _planted_sets(spark, sf)
        corpus = (
            base.select("vec_id", "e")
            .unionByName(planted.select("vec_id", "e"))
            .localCheckpoint()
        )
        emb = corpus.select("vec_id", F.col("e").alias("embedding"))
        icent0 = base.filter(F.col("vec_id") < 8).select(
            F.col("vec_id").alias("cid"), F.col("e").alias("c")
        )
        ia1 = _km_assign(emb, icent0)
        icent1 = _km_update(
            ia1.select("cid", "embedding")
        ).localCheckpoint()
        cells = _km_assign(emb, icent1).select("vec_id", "cid")
        pc = corpus.join(cells, "vec_id")
        qd2 = F.aggregate(
            F.zip_with(
                F.col("qe"), F.col("c"), lambda x, y: (x - y) * (x - y)
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        wq = W.partitionBy("qid").orderBy("d2", "cid")
        qr = (
            probes0.select("qid", "qe")
            .crossJoin(F.broadcast(icent1))
            .withColumn("d2", qd2)
            .withColumn("rnk", F.row_number().over(wq))
            .filter(F.col("rnk") <= 2)
            .select("qid", "cid")
        )
        codes, _, pcent1 = _pq_encode(base, corpus, probes0, pin=True)
        scored_truth = (
            corpus.crossJoin(F.broadcast(probes0.select("qid", "qe")))
            .filter(F.col("vec_id") != F.col("qid"))
            .withColumn("d2", _pq_full_d2())
        )
        wt = W.partitionBy("qid").orderBy("d2", "vec_id")
        truth = (
            scored_truth.withColumn("rn", F.row_number().over(wt))
            .filter(F.col("rn") <= 3)
            .select("qid", "vec_id")
        )
        for name, df in (
            # pc partitioned by IVF cell: a probed-cells read opens
            # only its cells' dirs — same pruning story as the
            # term-bucketed search index
            ("pc", pc.repartition("cid")),
            ("codes", codes),
            ("pcent1", pcent1),
            # the coarse centroids persist too: q160's maintenance
            # stream assigns NEW vectors to cells against this frozen
            # table (never retrained per batch)
            ("icent1", icent1),
            ("qr", qr),
            ("probes", probes0.select("qid", "qe")),
            ("truth", truth),
        ):
            w = df.write.mode("overwrite")
            if name == "pc":
                w = w.partitionBy("cid")
            w.parquet(os.path.join(base_dir, name))
        open(marker, "w").close()
    load = lambda n: spark.read.parquet(os.path.join(base_dir, n))  # noqa: E731
    return (
        load("pc").select("vec_id", "e").alias("corpus"),
        load("probes"),
        load("qr"),
        load("pc"),
        load("codes"),
        load("pcent1"),
        load("truth"),
        load("icent1"),
    )


def _q156_read(spark: SparkSession, sf: str, state) -> DataFrame:
    """Read phase, entirely from the stored index tables:
    cell-restricted candidates -> ADC on candidates (probe lookup
    table computed from the stored codebooks) -> exact re-rank of the
    top-10 -> recall."""
    corpus, probes0, qr, pc, codes, pcent1, truth = state[:7]
    dist_tab = _pq_dist_tab(probes0, pcent1)
    cand = (
        pc.join(F.broadcast(qr), "cid")
        .filter(F.col("vec_id") != F.col("qid"))
        .select("qid", "vec_id")
        .localCheckpoint()  # read by the ADC join and the count
    )
    adc = (
        cand.join(codes, "vec_id")
        .join(
            F.broadcast(dist_tab.withColumnRenamed("cid", "code")),
            ["qid", "m", "code"],
        )
        .groupBy("qid", "vec_id")
        .agg(F.sum("dmicro").alias("adist"))
    )
    w = W.partitionBy("qid").orderBy("adist", "vec_id")
    cand10 = (
        adc.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 10)
        .select("qid", "vec_id")
    )
    rr = (
        cand10.join(corpus, "vec_id")
        .join(F.broadcast(probes0.select("qid", "qe")), "qid")
        .withColumn("d2", _pq_full_d2())
    )
    wrr = W.partitionBy("qid").orderBy("d2", "vec_id")
    top_rr = (
        rr.withColumn("rn", F.row_number().over(wrr))
        .filter(F.col("rn") <= 3)
        .select("qid", "vec_id")
    )
    rec = _recall_row(truth, top_rr, "planted", "ivfpq_np2_rerank10").drop(
        "protocol"
    )
    n_cand = cand.agg(F.count("*").cast("bigint").alias("n_candidates"))
    n_enc = corpus.agg(F.count("*").cast("bigint").alias("n_encoded"))
    return (
        rec.crossJoin(F.broadcast(n_cand)).crossJoin(F.broadcast(n_enc))
    )


register_phases("q156_ann_ivfpq", _q156_build, _q156_read)


# --- q158: scalar quantization (SQ8) — the third compression flavor -------

_Q158_CODE = (
    "CASE WHEN hh[i] = ll[i] THEN 0 ELSE CAST(least(greatest(floor("
    "(e[i] - ll[i]) * CAST(255 AS DOUBLE) / (hh[i] - ll[i])), 0), 255) "
    "AS BIGINT) END"
)
_Q158_QCODE = _Q158_CODE.replace("e[i]", "qe[i]")
_Q158_D2INT = (
    "list_reduce(list_prepend(CAST(0 AS BIGINT), list_transform("
    "range(1, 65), i -> (q.qc[i] - c.c[i]) * (q.qc[i] - c.c[i]))), "
    "(acc, v) -> acc + v)"
)

_Q158_ORACLE = f"""
    WITH base AS (
      SELECT CAST(vec_id AS BIGINT) AS vec_id, label,
             list_transform(embedding, v -> CAST(v AS DOUBLE)) AS e
      FROM embeddings
    ),
    probes0 AS (
      SELECT vec_id AS qid, label AS qlabel, e AS qe
      FROM base WHERE vec_id < 5
    ),
    planted AS (
      SELECT CAST(1000000 + p.qid * 10 + s.p AS BIGINT) AS vec_id,
             p.qlabel AS label,
             {_PROBE_PERTURB_SQL} AS e
      FROM probes0 p CROSS JOIN (SELECT unnest([1, 2, 3]) AS p) s
    ),
    corpus AS (
      SELECT vec_id, e FROM base UNION ALL SELECT vec_id, e FROM planted
    ),
    exploded AS (
      SELECT unnest(e) AS val, unnest(range(1, 65)) AS pos FROM corpus
    ),
    lohi AS (
      SELECT pos, MIN(val) AS lo, MAX(val) AS hi
      FROM exploded GROUP BY pos
    ),
    arrs AS (
      SELECT list(lo ORDER BY pos) AS ll, list(hi ORDER BY pos) AS hh
      FROM lohi
    ),
    codes AS (
      SELECT vec_id,
             list_transform(range(1, 65), i -> {_Q158_CODE}) AS c
      FROM corpus, arrs
    ),
    qcodes AS (
      SELECT qid,
             list_transform(range(1, 65), i -> {_Q158_QCODE}) AS qc
      FROM probes0, arrs
    ),
    scored AS (
      SELECT q.qid, c.vec_id, {_Q158_D2INT} AS d2i
      FROM codes c CROSS JOIN qcodes q WHERE c.vec_id <> q.qid
    ),
    topk AS (
      SELECT qid, vec_id FROM (
        SELECT qid, vec_id, ROW_NUMBER() OVER (PARTITION BY qid
               ORDER BY d2i, vec_id) AS rn FROM scored)
      WHERE rn <= 3
    ),
    scored_truth AS (
      SELECT q.qid, c.vec_id, {_PQ_FULL_D2} AS d2
      FROM corpus c CROSS JOIN probes0 q WHERE c.vec_id <> q.qid
    ),
    top_truth AS (
      SELECT qid, vec_id FROM (
        SELECT qid, vec_id, ROW_NUMBER() OVER (PARTITION BY qid
               ORDER BY d2, vec_id) AS rn FROM scored_truth)
      WHERE rn <= 3
    ),
    per_q AS (
      SELECT t.qid,
             SUM(CASE WHEN m.vec_id IS NOT NULL THEN 1 ELSE 0 END) AS hits_q,
             COUNT(*) AS truth_q
      FROM top_truth t LEFT JOIN topk m
        ON t.qid = m.qid AND t.vec_id = m.vec_id
      GROUP BY t.qid
    )
    SELECT 'sq8' AS method,
           ROUND(AVG(hits_q * 1.0 / truth_q), 4) AS recall_at_3,
           CAST(SUM(hits_q) AS BIGINT) AS hits,
           CAST(SUM(truth_q) AS BIGINT) AS truth_rows,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM corpus) AS n_encoded,
           CAST(64 AS BIGINT) AS bytes_per_vector
    FROM per_q
    """


@register(
    "q158_ann_sq8",
    oracle=_Q158_ORACLE,
    doc="Scalar quantization (SQ8) ANN, hash-checked — the third "
    "compression flavor beside PQ/ADC (q137) and the binary-ish LSH "
    "sketches: each of the 64 dims quantizes independently to one "
    "byte on the corpus' per-dim [min, max] range (256 levels), an 8x "
    "compression over f64 (4x over f32) with NO codebook training, "
    "and search is integer L2 over the codes — the distance arithmetic "
    "is exact BIGINT, so unlike every float-scored ANN row there is "
    "zero rounding surface in the ranking itself (the only doubles are "
    "the quantization thresholds, identical expressions both engines). "
    "recall@3 vs exact-L2 truth on the planted protocol — SQ8's "
    "per-dim resolution keeps near-dup structure that i.i.d. corpora "
    "stress hard. Scale: the lo/hi table is 64 rows computed in one "
    "pass (min/max — no summation order issues), codes are a map-side "
    "projection, and the scan is a linear integer-SIMD-friendly pass; "
    "production composes it with IVF cells like q156 composes PQ. "
    "Faiss's SQ8 is the public design.",
)
def q158(spark: SparkSession, sf: str) -> DataFrame:
    return _q158_read(spark, sf, _q158_build(spark, sf))


def _q158_build(spark: SparkSession, sf: str):
    """Build phase: per-dim ranges + corpus/probe codes + pinned truth."""
    base, probes0, planted = _planted_sets(spark, sf)
    corpus = (
        base.select("vec_id", "e")
        .unionByName(planted.select("vec_id", "e"))
        .localCheckpoint()
    )
    ex = corpus.select(F.posexplode("e").alias("pos", "val"))
    lohi = ex.groupBy("pos").agg(
        F.min("val").alias("lo"), F.max("val").alias("hi")
    )
    arrs = lohi.groupBy().agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "lo"))),
            lambda s: s["lo"],
        ).alias("ll"),
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "hi"))),
            lambda s: s["hi"],
        ).alias("hh"),
    )

    def _code(vec_col: str):
        def one(x, i):
            lo = F.element_at(F.col("ll"), i + 1)
            hi = F.element_at(F.col("hh"), i + 1)
            q = F.least(
                F.greatest(
                    F.floor((x - lo) * F.lit(255.0) / (hi - lo)),
                    F.lit(0).cast("bigint"),
                ),
                F.lit(255).cast("bigint"),
            )
            return F.when(hi == lo, F.lit(0).cast("bigint")).otherwise(q)

        return F.transform(F.col(vec_col), one)

    codes = (
        corpus.crossJoin(F.broadcast(arrs))
        .select("vec_id", _code("e").alias("c"))
        .localCheckpoint()
    )
    qcodes = (
        probes0.select("qid", "qe")
        .crossJoin(F.broadcast(arrs))
        .select("qid", _code("qe").alias("qc"))
        .localCheckpoint()
    )
    scored_truth = (
        corpus.crossJoin(F.broadcast(probes0.select("qid", "qe")))
        .filter(F.col("vec_id") != F.col("qid"))
        .withColumn("d2", _pq_full_d2())
    )
    wt = W.partitionBy("qid").orderBy("d2", "vec_id")
    truth = (
        scored_truth.withColumn("rn", F.row_number().over(wt))
        .filter(F.col("rn") <= 3)
        .select("qid", "vec_id")
        .localCheckpoint()
    )
    return corpus, codes, qcodes, truth


def _q158_read(spark: SparkSession, sf: str, state) -> DataFrame:
    """Read phase: the integer-L2 code scan + top-3 + recall."""
    corpus, codes, qcodes, truth = state
    d2i = F.aggregate(
        F.zip_with(
            F.col("qc"), F.col("c"), lambda a, b: (a - b) * (a - b)
        ),
        F.lit(0).cast("bigint"),
        lambda acc, v: acc + v,
    )
    scored = (
        codes.crossJoin(F.broadcast(qcodes))
        .filter(F.col("vec_id") != F.col("qid"))
        .withColumn("d2i", d2i)
    )
    w = W.partitionBy("qid").orderBy("d2i", "vec_id")
    top = (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("qid", "vec_id")
    )
    rec = _recall_row(truth, top, "planted", "sq8").drop("protocol")
    n_enc = corpus.agg(F.count("*").cast("bigint").alias("n_encoded"))
    return (
        rec.crossJoin(F.broadcast(n_enc))
        .withColumn("bytes_per_vector", F.lit(64).cast("bigint"))
    )


register_phases("q158_ann_sq8", _q158_build, _q158_read)


# --- q160: streaming ANN index maintenance (VERDICT r7 #3) -----------------
#
# q155 proved the recipe for TEXT (stream edits -> one atomic
# tombstone-carrying merge per micro-batch into the inverted index);
# this composes the same recipe with the persisted IVF x PQ tables
# (q156): new vectors stream in, are encoded against the FROZEN coarse
# centroids and PQ codebooks (never retrained per batch — the
# production contract: codebooks version separately from data), and
# upsert into a vec_id-keyed merge store holding (cell, codes, raw
# vector); deletes ride as tombstone rows; doc-level LWW on edit_ts
# rejects late out-of-order edits. The final search served from the
# stream-maintained store hash-checks against the SAME oracle as the
# fresh batch rebuild (q156) — stream-maintained search ≡ rebuild,
# recall row included.


def ann_index_batch_applier(
    spark: SparkSession, store, icent1: DataFrame, pcent1: DataFrame
):
    """The q160 foreachBatch applier, factored out of
    :func:`stream_maintain_ann_index` so scale checks can time the
    REAL per-batch path (watermark probe + frozen-codebook encode +
    tombstones + one atomic merge + watermark commit) without driving
    a stream. Batch rows: (vec_id, e, edit_ts, op).

    ``store`` may be a :class:`MergeOnReadStore`: the commit becomes
    one O(batch) delta append instead of the COW bucket rewrite
    (q182's law on the vector index), via the store-polymorphic
    commit_upserts_and_tombstones."""

    from parquet_demo_spark.sources.merge_store import admission_watermarks
    from parquet_demo_spark.sources.mor_store import (
        commit_upserts_and_tombstones,
    )

    wm = admission_watermarks(store, keys=("vec_id",))

    def _apply_batch(batch_df: DataFrame, epoch_id: int) -> None:
        from parquet_demo_spark.tuning import store_plan_scope

        # one size decision for the whole batch: a sub-threshold
        # (index + watermark + batch) runs the admission probe, the
        # frozen-codebook encode, and both commits under the minimal
        # plan (tuning.py)
        with store_plan_scope(spark, (store.root, wm.root), batch_df):
            _apply_batch_scoped(batch_df)

    def _apply_batch_scoped(batch_df: DataFrame) -> None:
        # no standalone batch-emptiness probe: ``winners.isEmpty()``
        # below subsumes it (empty batch ⇒ empty winners), so the
        # common non-empty batch pays one admission action, not two
        if wm.current_version() is None and store.has_data():
            # one-time migration: a pre-watermark (batch-built) codes
            # table seeds the side store from its own rows — the last
            # full scan this stream will ever do
            wm.merge(
                store.read(spark)
                .groupBy("vec_id")
                .agg(F.max("edit_ts").alias("edit_ts"))
            )
        w = W.partitionBy("vec_id").orderBy(
            F.col("edit_ts").desc(), F.col("op")
        )
        latest = (
            batch_df.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .drop("__rn")
            # computed ONCE: the probe's bucket collect and the winners
            # materialization below both consume the window dedup
            .localCheckpoint(eager=False)
        )
        if wm.current_version() is not None:
            cur_ts = wm.probe(spark, latest.select("vec_id")).select(
                "vec_id", F.col("edit_ts").alias("__cur_ts")
            )
            latest = (
                latest.join(cur_ts, "vec_id", "left")
                .filter(
                    F.col("__cur_ts").isNull()
                    | (F.col("edit_ts") > F.col("__cur_ts"))
                )
                .drop("__cur_ts")
            )
        winners = latest.localCheckpoint(eager=False)  # read by encode + tombstones
        if winners.isEmpty():
            return
        ups = winners.filter(F.col("op") == "upsert").select(
            "vec_id", "e", "edit_ts"
        )
        # encode against the FROZEN structures — identical per-row
        # arithmetic to the batch build, so stream-maintained state is
        # bit-identical to a rebuild over the same winning edits
        cells = _km_assign(
            ups.select("vec_id", F.col("e").alias("embedding")),
            icent1,
        ).select("vec_id", "cid")
        subs = _pq_subspaces(ups.select("vec_id", "e"), "e", ["vec_id"])
        codes = (
            _pq_assign(subs, pcent1)
            .groupBy("vec_id")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("m", "cid"))),
                    lambda s: s["cid"],
                ).alias("codes")
            )
        )
        # materialize the encoding ONCE: the broadcast-argmin crossJoins
        # are the batch's expensive step and both the merge and the
        # tombstone typing consume the frame
        enc = (
            ups.join(cells, "vec_id")
            .join(codes, "vec_id")
            .select("vec_id", "edit_ts", "cid", "codes", "e")
            .localCheckpoint(eager=False)
        )
        if not store.has_data():
            # deletes against an empty store are no-ops by definition;
            # an all-delete first batch also encodes NOTHING — merging
            # the empty frame would commit a zero-bucket v0 with no
            # file to derive a schema from, so skip (the watermark
            # below still records the deletes' timestamps)
            if not enc.isEmpty():
                store.merge(enc)
        else:
            # ONE atomic commit per batch: deletes ride as tombstone
            # rows (NULL cid) through the same merge the upserts use —
            # q155's crash-safety recipe on the vector index. Column
            # order comes from the manifest (metadata), types from the
            # encoded frame's own schema — no index read.
            dels = winners.filter(F.col("op") == "delete")
            cols = store.table_columns()
            types = {f.name: f.dataType for f in enc.schema.fields}
            tombstones = dels.select(
                *[
                    F.col(c)
                    if c in ("vec_id", "edit_ts")
                    else F.lit(None).cast(types[c]).alias(c)
                    for c in cols
                ]
            )
            src = enc.select(*cols).unionByName(tombstones)
            commit_upserts_and_tombstones(store, src, "cid")
        # watermark commit LAST (crash ⇒ replay ⇒ idempotent re-apply);
        # covers deletes too, so their watermark outlives their rows
        wm.merge(winners.select("vec_id", "edit_ts"), conditional=True)

    return _apply_batch


def stream_maintain_ann_index(
    spark: SparkSession,
    source_dir: str,
    schema,
    store,
    checkpoint: str,
    icent1: DataFrame,
    pcent1: DataFrame,
    max_files_per_trigger: int = 1,
):
    """Maintain a persisted ANN index from a stream of vector edits.

    Source rows: (vec_id, e array<double>, edit_ts, op in
    {'upsert','delete'}). Per micro-batch: LWW-collapse within the
    batch, drop rows not newer than the store's committed edit_ts for
    that vec_id (late/out-of-order edits), encode the surviving
    upserts against the FROZEN structures (IVF cell via broadcast
    argmin on ``icent1``; M one-byte PQ codes via ``pcent1``), and
    commit ONE atomic merge: tombstone rows (NULL cell — a real cell
    id is never null) delete, fresh rows update-or-insert. A crash can
    never leave a vector half-replaced, and replaying a batch is
    idempotent (same winners, same commit content).

    Admission is o(index) (VERDICT r8 #4): the per-vector LWW
    watermark lives in a vec_id-keyed side store (``<root>_wm`` — see
    :func:`admission_watermarks`) probed bucket-pruned with the
    batch's vec_ids, NOT derived from the codes table. The watermark
    survives deletion: a deleted vector keeps its row, so a LATE
    stale upsert (older edit_ts arriving after the delete) is still
    rejected instead of resurrecting the vector with stale data.

    Scale: each batch costs its winners' encoding (a broadcast
    crossJoin against K-row centroid tables), a bucket-pruned probe
    of the one-row-per-vector watermark table, plus a PK-bucket-pruned
    store rewrite — never a scan of the existing index; the 10^10-
    vector codes table follows the day's vector churn without a
    rebuild, exactly how the text index follows document edits.
    """

    _apply_batch = ann_index_batch_applier(spark, store, icent1, pcent1)
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(source_dir)
        .writeStream.foreachBatch(_apply_batch)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


@register(
    "q160_ann_stream_maintenance",
    oracle=_Q156_ORACLE.format(
        mean6=mean6_sql("sub[j + 1]"), imean6=mean6_sql("e[j + 1]")
    ).replace("'ivfpq_np2_rerank10'", "'ivfpq_stream_maintained'"),
    doc="Streaming ANN index maintenance, hash-checked against the "
    "FRESH-REBUILD oracle (VERDICT r7 #3): three micro-batch files "
    "stream vector edits through readStream -> foreachBatch into a "
    "vec_id-keyed merge store holding (IVF cell, PQ codes, raw "
    "vector) — batch 0 inserts the base corpus plus WRONG versions of "
    "the planted vectors and junk vectors (edit_ts=1), batch 1 "
    "replaces the planted vectors with their correct versions "
    "(edit_ts=3), batch 2 delivers LATE stale rewrites of the planted "
    "vectors (edit_ts=2, must NOT apply — LWW) and deletes of the "
    "junk (edit_ts=4, tombstone rows through the same atomic merge). "
    "Every batch encodes against the FROZEN coarse centroids and PQ "
    "codebooks from the original q156 build; the final IVF x PQ "
    "search served from the stream-maintained store returns the "
    "IDENTICAL recall/candidate row as q156's batch-built index — "
    "proving stream-maintained search ≡ fresh rebuild, the property "
    "that lets a 10^10-vector index follow the day's churn without a "
    "rebuild. operators/similarity.py stream_maintain_ann_index.",
)
def q160(spark: SparkSession, sf: str) -> DataFrame:
    return _q160_read(spark, sf, _q160_build(spark, sf))


def _q160_build(spark: SparkSession, sf: str):
    """Build phase: the frozen q156 index tables + the three
    deterministic vector-edit batch files."""
    import glob
    import os
    import shutil

    from pyspark.sql import types as T

    from parquet_demo_spark.operators.merge import _scratch_root

    state = _q156_build(spark, sf)
    base, probes0, planted = _planted_sets(spark, sf)
    neg = lambda col: F.transform(col, lambda v: -v)  # noqa: E731
    wrong = planted.select(
        "vec_id", neg(F.col("e")).alias("e")
    )  # deterministic WRONG version of every planted vector
    junk = base.filter(F.col("vec_id") < 10).select(
        (F.lit(2000000) + F.col("vec_id")).cast("bigint").alias("vec_id"),
        F.transform(F.col("e"), lambda v: v * 2).alias("e"),
    )
    b0 = (
        base.select("vec_id", "e")
        .unionByName(wrong)
        .unionByName(junk)
        .select(
            "vec_id",
            "e",
            F.lit(1).cast("bigint").alias("edit_ts"),
            F.lit("upsert").alias("op"),
        )
    )
    b1 = planted.select(
        "vec_id",
        "e",
        F.lit(3).cast("bigint").alias("edit_ts"),
        F.lit("upsert").alias("op"),
    )
    b2 = wrong.select(
        "vec_id",
        "e",
        F.lit(2).cast("bigint").alias("edit_ts"),  # stale: must lose LWW
        F.lit("upsert").alias("op"),
    ).unionByName(
        junk.select(
            "vec_id",
            F.lit(None).cast("array<double>").alias("e"),
            F.lit(4).cast("bigint").alias("edit_ts"),
            F.lit("delete").alias("op"),
        )
    )
    root = _scratch_root("q160", sf)
    src = os.path.join(root, "incoming")
    os.makedirs(src)
    schema = T.StructType(
        [
            T.StructField("vec_id", T.LongType()),
            T.StructField("e", T.ArrayType(T.DoubleType())),
            T.StructField("edit_ts", T.LongType()),
            T.StructField("op", T.StringType()),
        ]
    )
    for i, b in enumerate((b0, b1, b2)):
        d = os.path.join(root, f"scratch{i}")
        b.coalesce(1).write.mode("overwrite").parquet(d)
        [part] = glob.glob(os.path.join(d, "part-*.parquet"))
        shutil.move(part, os.path.join(src, f"batch{i}.parquet"))
        shutil.rmtree(d)
    return root, src, schema, state


def _q160_read(spark: SparkSession, sf: str, state) -> DataFrame:
    """Operation under test: the maintenance stream into a fresh store,
    then the full IVF x PQ search (q156's read path) served from the
    stream-maintained tables."""
    from parquet_demo_spark.operators.merge import _fresh_dir
    from parquet_demo_spark.sources.merge_store import ParquetMergeStore

    root, src, schema, q156_state = state
    _, probes0, qr, _, _, pcent1, truth, icent1 = q156_state
    store = ParquetMergeStore(
        _fresh_dir(root, "vecidx"),
        keys=("vec_id",),
        version_cols=("edit_ts",),
        num_buckets=8,
    )
    q = stream_maintain_ann_index(
        spark,
        src,
        schema,
        store,
        _fresh_dir(root, "ckpt"),
        icent1,
        pcent1,
    )
    q.awaitTermination()
    snap = store.read(spark).localCheckpoint()  # final maintained index
    pc = snap.select("vec_id", "e", "cid")
    codes = snap.select(
        "vec_id", F.posexplode("codes").alias("m", "code")
    )
    corpus = snap.select("vec_id", "e")
    dist_tab = _pq_dist_tab(probes0, pcent1)
    cand = (
        pc.join(F.broadcast(qr), "cid")
        .filter(F.col("vec_id") != F.col("qid"))
        .select("qid", "vec_id")
        .localCheckpoint()
    )
    adc = (
        cand.join(codes, "vec_id")
        .join(
            F.broadcast(dist_tab.withColumnRenamed("cid", "code")),
            ["qid", "m", "code"],
        )
        .groupBy("qid", "vec_id")
        .agg(F.sum("dmicro").alias("adist"))
    )
    w = W.partitionBy("qid").orderBy("adist", "vec_id")
    cand10 = (
        adc.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 10)
        .select("qid", "vec_id")
    )
    rr = (
        cand10.join(corpus, "vec_id")
        .join(F.broadcast(probes0.select("qid", "qe")), "qid")
        .withColumn("d2", _pq_full_d2())
    )
    wrr = W.partitionBy("qid").orderBy("d2", "vec_id")
    top_rr = (
        rr.withColumn("rn", F.row_number().over(wrr))
        .filter(F.col("rn") <= 3)
        .select("qid", "vec_id")
    )
    rec = _recall_row(
        truth, top_rr, "planted", "ivfpq_stream_maintained"
    ).drop("protocol")
    n_cand = cand.agg(F.count("*").cast("bigint").alias("n_candidates"))
    n_enc = corpus.agg(F.count("*").cast("bigint").alias("n_encoded"))
    return (
        rec.crossJoin(F.broadcast(n_cand)).crossJoin(F.broadcast(n_enc))
    )


register_phases("q160_ann_stream_maintenance", _q160_build, _q160_read)
