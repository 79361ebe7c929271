"""End-to-end training-data curation pipeline (charter composition).

One composed run of the engine's curation operators over a documents
parquet — the pipeline a user would actually run nightly, as opposed to
the per-operator registry queries that verify each stage in isolation:

    read → language filter → length band → min token count
         → exact dedup → MinHash near-dup collapse → hash split
         → partitioned parquet write

Every stage is the same code path its registry twin hash-checks
(q46/q88 conditions, q23 exact dedup, q43+q76 near-dup clustering,
q79 split routing), so the pipeline's correctness is inherited from the
per-stage oracles. All decisions are content-derived (polynomial hash,
MinHash signatures) — re-running on reshuffled input produces the
identical output set, which is what makes incremental corpus rebuilds
diffable.

Scale posture: stages 1–4 are row-local filters fused into one scan;
exact dedup shuffles (text-key groupBy); near-dup collapse runs banded
MinHash + hash-min connected components (never all-pairs); the split
routing is row-local again. The per-stage counts reported to the CLI
each cost one aggregate job over the fused plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from parquet_demo_spark.functions import poly_hash, tokens
from parquet_demo_spark.operators.dedup import (
    connected_components,
    minhash_candidate_pairs,
)


def curate(
    spark: SparkSession,
    input_path: str,
    out_dir: str | None,
    lang: str = "en",
    min_chars: int = 100,
    max_chars: int = 2000,
    min_tokens: int = 20,
    dry_run: bool = False,
) -> dict[str, int]:
    """Run the full curation pipeline; return per-stage survivor counts.

    ``out_dir`` receives the surviving documents partitioned by
    ``split=`` (hive layout) unless ``dry_run`` — the split column is a
    deterministic content-hash route (80/10/10), so downstream loaders
    partition-prune per split.
    """
    docs = spark.read.parquet(input_path)
    counts: dict[str, int] = {"s0_input": docs.count()}

    ntok = F.size(F.filter(tokens("text"), lambda t: t != ""))
    by_lang = docs.filter(F.col("lang") == lang)
    counts["s1_lang"] = by_lang.count()

    by_len = by_lang.filter(F.col("n_chars").between(min_chars, max_chars))
    counts["s2_len"] = by_len.count()

    by_tok = by_len.filter(ntok >= min_tokens)
    counts["s3_tok"] = by_tok.count()

    # exact dedup: keep the lowest doc_id per identical text (q23's
    # distinct, made deterministic about WHICH copy survives).
    # persist(): `exact` feeds the s4 count, the MinHash pair build AND
    # the survivor anti-join — without pinning it, the scan→filter→
    # text-window pipeline would recompute for each consumer.
    w = W.partitionBy("text").orderBy("doc_id")
    exact = (
        by_tok.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
        .persist()
    )
    try:
        counts["s4_exact_dedup"] = exact.count()

        # near-dup collapse: banded MinHash candidates → connected
        # components → keep each cluster's minimum doc_id (the CC label
        # IS the component minimum under hash-min propagation)
        pairs = minhash_candidate_pairs(exact).select(
            F.col("doc_a").alias("a"), F.col("doc_b").alias("b")
        )
        labels = connected_components(pairs)
        dropped = labels.filter(F.col("v") != F.col("label")).select(
            F.col("v").alias("doc_id")
        )
        b = poly_hash("text") % 100
        split = (
            F.when(b < 80, "train").when(b < 90, "val").otherwise("test")
        )
        routed = (
            exact.join(dropped, "doc_id", "left_anti")
            .withColumn("split", split)
            .persist()  # consumed by s5 count, the write, and s6 tallies
        )
        try:
            counts["s5_neardup_dedup"] = routed.count()
            if not dry_run:
                if out_dir is None:
                    raise ValueError("out_dir is required unless dry_run")
                routed.write.mode("overwrite").partitionBy(
                    "split"
                ).parquet(out_dir)
            for row in (
                routed.groupBy("split").agg(F.count("*").alias("n")).collect()
            ):
                counts[f"s6_split_{row['split']}"] = row["n"]
        finally:
            routed.unpersist()
    finally:
        exact.unpersist()
    return counts
