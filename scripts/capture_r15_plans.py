#!/usr/bin/env python
"""Capture round-15 before/after physical plans under plans/r15/.

"Before" plans replay the pre-round-15 expressions inline (the exact
forms the round replaced — kept verbatim in the equivalence tests);
"after" plans come from the live code. The store-commit pair shows the
SAME logical write planned outside vs inside tuning.plan_scope — the
scope is an action-time conf, so it never appears in a declared
query's returned plan (those are byte-identical before/after; the
observable change is job scheduling, evidenced by the A/B job counts
in OPTIMIZATION_r15.md).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r15")


def explain_str(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def write(name: str, df) -> None:
    os.makedirs(OUT, exist_ok=True)
    with open(os.path.join(OUT, name), "w") as fh:
        fh.write(explain_str(df))
    print("wrote", name)


def main() -> None:
    from pyspark.sql import functions as F

    from parquet_demo_spark import tuning
    from parquet_demo_spark.catalog import load
    from parquet_demo_spark.registry import all_queries
    from parquet_demo_spark.session import get_spark

    spark = get_spark(app_name="capture_r15_plans")
    qs = all_queries()

    # --- q183: pairwise cosine -> precomputed-norm dot -------------------
    # after = live code
    write("q183_semantic_dedup_after.txt", qs["q183_semantic_dedup"].spark(spark, SF))
    # before = the replaced form: cosine() (dot + two norms) per pair
    import parquet_demo_spark.operators.similarity as sim
    from parquet_demo_spark.functions import cosine

    emb = (
        load(spark, SF, "embeddings")
        .filter(F.size("embedding") >= sim._KM_DIM)
        .select("vec_id", F.slice("embedding", 1, sim._KM_DIM).alias("embedding"))
    )
    cent0 = (
        load(spark, SF, "embeddings")
        .filter(F.col("vec_id") < sim._KM_K)
        .select(
            F.col("vec_id").alias("cid"),
            F.transform(
                F.slice("embedding", 1, sim._KM_DIM), lambda x: x.cast("double")
            ).alias("c"),
        )
    )
    a1 = sim._km_assign(emb, cent0)
    cent1 = sim._km_update(a1.select("cid", "embedding"))
    cells = sim._km_assign(emb, cent1).select("vec_id", "cid", "embedding").localCheckpoint()
    lo = cells.select("cid", F.col("vec_id").alias("va"), F.col("embedding").alias("ea"))
    hi = cells.select("cid", "vec_id", F.col("embedding").alias("eb"))
    dups = (
        lo.join(hi, "cid")
        .filter(F.col("va") < F.col("vec_id"))
        .filter(F.round(cosine(F.col("ea"), F.col("eb")), 4) >= F.lit(sim._SEMDEDUP_TAU))
        .select("cid", "vec_id")
        .dropDuplicates()
        .withColumn("__dup", F.lit(1))
    )
    before_q183 = (
        cells.join(dups, ["cid", "vec_id"], "left")
        .groupBy(F.col("cid").alias("cluster"))
        .agg(
            F.count("*").cast("bigint").alias("n_members"),
            F.count("__dup").cast("bigint").alias("n_dups"),
            (F.count("*") - F.count("__dup")).cast("bigint").alias("n_kept"),
        )
        .orderBy("cluster")
    )
    write("q183_semantic_dedup_before.txt", before_q183)

    # --- q197/q200: interpreted fold chain -> memoized ArrowEvalPython ---
    write("q197_apply_tokenizer_after.txt", qs["q197_apply_tokenizer"].spark(spark, SF))
    from parquet_demo_spark.operators.text import _q197_seg_spark

    docs = load(spark, SF, "documents").select("doc_id", "lang", "text")
    pieces_per_token = f"size(split(substring({_q197_seg_spark()}, 2), '\\\\|'))"
    per_doc = docs.select(
        "lang",
        F.expr(
            "aggregate(filter(split(lower(text), '[^a-z]+'), "
            "t -> t <> ''), 0L, (acc, t) -> acc + 1L)"
        ).alias("n_words"),
        F.expr(
            "aggregate(filter(split(lower(text), '[^a-z]+'), "
            f"t -> t <> ''), 0L, (acc, t) -> acc + {pieces_per_token})"
        ).alias("n_pieces"),
    )
    before_q197 = (
        per_doc.filter(F.col("n_words") > 0)
        .groupBy("lang")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.sum("n_words").cast("bigint").alias("n_words"),
            F.sum("n_pieces").cast("bigint").alias("n_pieces"),
        )
        .orderBy("lang")
    )
    write("q197_apply_tokenizer_before.txt", before_q197)

    q200 = qs["q200_bpe_train_then_apply"]
    st200 = q200.build(spark, SF)
    write("q200_bpe_train_then_apply_after.txt", q200.read(spark, SF, st200))

    # --- q136: interpreted fold bucket id -> binary-search CASE tree -----
    # the plan that changed is the BUILD's clustered rewrite (the read
    # plan is layout-independent); capture the rewrite frame both ways
    from parquet_demo_spark.layout import zorder_key

    li = load(spark, SF, "lineitem").select(
        "l_partkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    new_frame = (
        li.withColumn("__z", zorder_key(li, ["l_partkey", "l_suppkey"]))
        .repartitionByRange(32, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
    )
    write("q136_zorder_rewrite_after.txt", new_frame)

    def old_key(df, cols, bits=6):
        n_cuts = (1 << bits) - 1
        probs = [(i + 1) / (1 << bits) for i in range(n_cuts)]
        casted = df.select(*[F.col(c).cast("double").alias(c) for c in cols])
        all_cuts = casted.approxQuantile(cols, probs, 1e-3)
        k = len(cols)
        z = F.lit(0).cast("long")
        for i, (c, cuts) in enumerate(zip(cols, all_cuts)):
            arr = F.array(*[F.lit(float(x)) for x in cuts])
            bucket = F.aggregate(
                arr,
                F.lit(0),
                lambda acc, cut: acc
                + F.when(F.col(c).cast("double") >= cut, 1).otherwise(0),
            )
            for j in range(bits):
                bit = F.shiftright(bucket, j).bitwiseAND(F.lit(1))
                z = z.bitwiseOR(F.shiftleft(bit.cast("long"), j * k + (k - 1 - i)))
        return z

    old_frame = (
        li.withColumn("__z", old_key(li, ["l_partkey", "l_suppkey"]))
        .repartitionByRange(32, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
    )
    write("q136_zorder_rewrite_before.txt", old_frame)
    # the declared query's returned plan (unchanged by the rewrite)
    st136 = qs["q136_zorder_box_scan"].build(spark, SF)
    write(
        "q136_zorder_box_scan_read_after.txt",
        qs["q136_zorder_box_scan"].read(spark, SF, st136),
    )

    # --- representative store commit write: scope off vs on --------------
    # the exact frame a ParquetMergeStore.merge materializes (touched-
    # bucket union + PK window), planned under the session posture and
    # under the small-input scope. This is the plan-shape evidence for
    # tuning.py: AdaptiveSparkPlan gone, Exchange hashpartitioning
    # sized 4 instead of 32.
    from pyspark.sql import Window

    def commit_frame():
        # built fresh per capture: a Dataset caches its queryExecution,
        # and the scope's conf is read at PLANNING time
        ev = load(spark, SF, "events")
        w = Window.partitionBy("user_id", "event_type").orderBy(
            F.col("__from_upsert").desc()
        )
        return (
            ev.filter(F.col("event_id") % 2 == 1)
            .withColumn("__from_upsert", F.lit(1))
            .unionByName(
                ev.filter(F.col("event_id") % 2 == 0).withColumn(
                    "__from_upsert", F.lit(0)
                )
            )
            .withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .drop("__rn", "__from_upsert")
        )

    write("store_commit_write_before.txt", commit_frame())
    with tuning.plan_scope(spark, 1):
        write("store_commit_write_after.txt", commit_frame())


if __name__ == "__main__":
    main()
