"""Training-data pipeline operators: decontamination, splits, sampling,
redaction, domain mixing, resampling, outlier filtering.

These are the curation steps a large-scale LLM training-data pipeline
runs after dedup (operators/dedup.py) and quality scoring
(operators/text.py):

- benchmark decontamination (q78): drop corpus documents that share
  n-gram passages with an evaluation/benchmark set (Brown et al. /
  GPT-3 appendix-style 8-gram overlap);
- deterministic train/val/test split (q79): hash-bucket routing, so the
  split is stable under reshuffles, re-runs, and engine changes;
- stratified sampling (q80): per-stratum hash sampling with an exact,
  reproducible keep set (no RNG — the sample is a pure function of the
  data);
- PII-style redaction (q81): regexp masking of digit runs in
  identifier-bearing columns, reported as masked-shape histograms;
- time-series resample + gap-fill (q82): hourly grid per bucket with
  empty buckets materialized (sequence/explode ⇄ generate_series);
- domain mixing (q83): per-source target keep-rates applied via hash
  thresholds — the deterministic form of sampling-weights mixing;
- IQR outlier filter (q84): per-group Tukey fences over exact
  interpolated quartiles.

Scale notes (100 TB posture): every operator here is a single
declarative plan — hash thresholds and regexp masks are pure row-local
column expressions (map-side only, no shuffle); the splits/sampling
aggregates shuffle only the tiny per-group tallies; decontamination
joins the corpus against the (small) benchmark shingle set and applies a
document-frequency cut before the join so no hot shingle can explode it.
No RNG anywhere: sampling decisions hash document CONTENT, so adding
executors, reordering files, or re-running yields byte-identical splits
— the property that matters when a 100 TB corpus is re-materialized.

Reference parity: the reference repo (alxmancilla/parquet-demo) has no
curation surface; these extend the engine per the charter's
training-data-pipeline requirement (SURVEY §2B S23–S28 neighborhood).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from parquet_demo_spark.catalog import load
from parquet_demo_spark.functions import (
    qround,
    chunk_starts,
    chunk_starts_sql,
    chunk_text,
    chunk_text_sql,
    df_cut,
    df_cut_sql,
    mean6,
    mean6_sql,
    poly_hash,
    poly_hash_sql,
    tokens,
)
from parquet_demo_spark.registry import register

# ---------------------------------------------------------------------------
# q78 — benchmark decontamination (8-gram overlap)
# ---------------------------------------------------------------------------

# Drop shingles present in more than this many corpus docs before the
# overlap join: a boilerplate 8-gram shared by thousands of documents is
# not contamination evidence, and cutting it bounds the join fan-out at
# any corpus size (same mechanism as q26/q45).
_Q78_MAX_DF = 100


@register(
    "q78_decontaminate",
    oracle=f"""
    WITH base AS (
      SELECT doc_id, doc_id % 20 = 0 AS is_bench,
             list_filter(string_split_regex(lower(text), '[^a-z]+'),
                         t -> t <> '') AS tk
      FROM documents
    ),
    win AS (
      SELECT doc_id, is_bench,
             unnest(list_distinct(list_transform(
               range(1, len(tk) - 6),
               j -> array_to_string(tk[j:j+7], ' ')))) AS shingle
      FROM base WHERE len(tk) >= 8
    ),
    corpus AS (
      SELECT doc_id, shingle FROM win WHERE NOT is_bench
      {df_cut_sql('shingle', _Q78_MAX_DF)}
    ),
    bench AS (SELECT DISTINCT shingle FROM win WHERE is_bench),
    hits AS (
      SELECT DISTINCT c.doc_id FROM corpus c JOIN bench b USING (shingle)
    )
    SELECT (SELECT COUNT(*) FROM hits) AS n_contaminated,
           (SELECT COUNT(*) FROM base WHERE NOT is_bench)
             - (SELECT COUNT(*) FROM hits) AS n_clean,
           (SELECT COUNT(*) FROM base WHERE is_bench) AS n_bench
    """,
    doc="Benchmark decontamination: corpus docs sharing any 8-token "
    "shingle with the benchmark set (doc_id%20=0 here) are flagged. "
    "Shingles are built and dedup'd in-row before the explode; a "
    f"document-frequency cut (> {_Q78_MAX_DF} docs) drops boilerplate "
    "shingles before the join, so the overlap join is benchmark-sized, "
    "not corpus-sized.",
)
def q78(spark: SparkSession, sf: str) -> DataFrame:
    docs = load(spark, sf, "documents")
    base = docs.select(
        "doc_id",
        (F.col("doc_id") % 20 == 0).alias("is_bench"),
        F.filter(tokens("text"), lambda t: t != "").alias("tk"),
    )
    tk = F.col("tk")
    shingles = F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), F.size(tk) - 7),
            lambda j: F.array_join(F.slice(tk, j, 8), " "),
        )
    )
    win = base.filter(F.size(tk) >= 8).select(
        "doc_id", "is_bench", F.explode(shingles).alias("shingle")
    )
    corpus = df_cut(
        win.filter(~F.col("is_bench")).select("doc_id", "shingle"),
        "shingle",
        _Q78_MAX_DF,
    )
    bench = win.filter(F.col("is_bench")).select("shingle").distinct()
    hits = corpus.join(bench, "shingle").select("doc_id").distinct()
    n_hits = hits.agg(F.count("*").alias("n_contaminated"))
    totals = base.agg(
        F.sum(F.when(~F.col("is_bench"), 1).otherwise(0))
        .cast("bigint")
        .alias("_n_corpus"),
        F.sum(F.when(F.col("is_bench"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_bench"),
    )
    return n_hits.crossJoin(totals).select(
        "n_contaminated",
        (F.col("_n_corpus") - F.col("n_contaminated")).alias("n_clean"),
        "n_bench",
    )


# ---------------------------------------------------------------------------
# q79 — deterministic train/val/test split
# ---------------------------------------------------------------------------


@register(
    "q79_train_split",
    oracle=f"""
    SELECT CASE WHEN b < 80 THEN 'train'
                WHEN b < 90 THEN 'val'
                ELSE 'test' END AS split,
           COUNT(*) AS n_docs,
           SUM(n_chars)::BIGINT AS sum_chars
    FROM (SELECT {poly_hash_sql('text')} % 100 AS b, n_chars
          FROM documents)
    GROUP BY split ORDER BY split
    """,
    doc="Deterministic 80/10/10 split routed by a content hash — stable "
    "under re-runs, file reordering, and engine swaps (no RNG). The hash "
    "is a pure row-local expression; only the 3-row tally shuffles.",
)
def q79(spark: SparkSession, sf: str) -> DataFrame:
    docs = load(spark, sf, "documents")
    b = poly_hash("text") % 100
    split = (
        F.when(b < 80, "train").when(b < 90, "val").otherwise("test")
    )
    return (
        docs.select(split.alias("split"), "n_chars")
        .groupBy("split")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_chars").cast("bigint").alias("sum_chars"),
        )
        .orderBy("split")
    )


# ---------------------------------------------------------------------------
# q80 — stratified (per-source) hash sampling
# ---------------------------------------------------------------------------


@register(
    "q80_stratified_sample",
    oracle=f"""
    SELECT source,
           COUNT(*) AS n_total,
           SUM(CASE WHEN ph % 10 = 0 THEN 1 ELSE 0 END)::BIGINT
             AS n_sampled
    FROM (SELECT source, {poly_hash_sql('text')} AS ph FROM documents)
    GROUP BY source ORDER BY source
    """,
    doc="Stratified ~10% sample per source stratum via content-hash "
    "threshold: the keep set is an exact, reproducible function of the "
    "data (contrast TABLESAMPLE, whose result is engine- and "
    "partitioning-dependent). Row-local decision, tally-only shuffle.",
)
def q80(spark: SparkSession, sf: str) -> DataFrame:
    docs = load(spark, sf, "documents")
    return (
        docs.select("source", (poly_hash("text") % 10).alias("m"))
        .groupBy("source")
        .agg(
            F.count("*").alias("n_total"),
            F.sum(F.when(F.col("m") == 0, 1).otherwise(0))
            .cast("bigint")
            .alias("n_sampled"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# q81 — PII-style redaction (digit masking) as masked-shape histograms
# ---------------------------------------------------------------------------


@register(
    "q81_pii_redaction",
    oracle="""
    SELECT entity, masked, n FROM (
      SELECT 'customer_name' AS entity,
             regexp_replace(c_name, '[0-9]', '#', 'g') AS masked,
             COUNT(*) AS n
      FROM customer GROUP BY masked
      UNION ALL
      SELECT 'event_props' AS entity,
             regexp_replace(props, '[0-9]', '#', 'g') AS masked,
             COUNT(*) AS n
      FROM events GROUP BY masked)
    ORDER BY entity, masked
    """,
    doc="Redaction pass: digit runs masked to '#' in identifier-bearing "
    "columns, reported as masked-shape histograms (the audit artifact a "
    "redaction job emits). regexp_replace is a row-local JVM expression; "
    "masked-shape cardinality is tiny so the tally shuffle is trivial.",
)
def q81(spark: SparkSession, sf: str) -> DataFrame:
    cust = load(spark, sf, "customer")
    ev = load(spark, sf, "events")
    a = (
        cust.select(
            F.regexp_replace("c_name", "[0-9]", "#").alias("masked")
        )
        .groupBy("masked")
        .agg(F.count("*").alias("n"))
        .select(F.lit("customer_name").alias("entity"), "masked", "n")
    )
    b = (
        ev.select(F.regexp_replace("props", "[0-9]", "#").alias("masked"))
        .groupBy("masked")
        .agg(F.count("*").alias("n"))
        .select(F.lit("event_props").alias("entity"), "masked", "n")
    )
    return a.unionByName(b).orderBy("entity", "masked")


# ---------------------------------------------------------------------------
# q82 — hourly resample with gap-fill
# ---------------------------------------------------------------------------


@register(
    "q82_resample_gapfill",
    oracle="""
    WITH ev AS (
      SELECT user_id % 10 AS bucket, date_trunc('hour', ts) AS hr
      FROM events
    ),
    b AS (SELECT MIN(hr) AS lo, MAX(hr) AS hi FROM ev),
    grid AS (
      SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS hr FROM b
    ),
    cells AS (
      SELECT g.hr, r.range AS bucket FROM grid g CROSS JOIN range(10) r
    ),
    cnt AS (
      SELECT bucket, hr, COUNT(*) AS c FROM ev GROUP BY bucket, hr
    )
    SELECT cells.bucket,
           COUNT(*) AS n_hours,
           SUM(CASE WHEN cnt.c IS NULL THEN 1 ELSE 0 END)::BIGINT
             AS n_empty,
           COALESCE(SUM(cnt.c), 0)::BIGINT AS n_events
    FROM cells LEFT JOIN cnt
      ON cells.bucket = cnt.bucket AND cells.hr = cnt.hr
    GROUP BY cells.bucket ORDER BY cells.bucket
    """,
    doc="Time-series resample: hourly grid per user bucket with empty "
    "hours materialized (sequence/explode ⇄ generate_series) — the "
    "gap-fill shape behind rate/coverage dashboards. The grid derives "
    "from a 1-row bounds aggregate and broadcasts to the left join; "
    "per-cell counts partially aggregate map-side.",
)
def q82(spark: SparkSession, sf: str) -> DataFrame:
    ev = load(spark, sf, "events").select(
        (F.col("user_id") % 10).alias("bucket"),
        F.date_trunc("hour", "ts").alias("hr"),
    )
    bounds = ev.agg(F.min("hr").alias("lo"), F.max("hr").alias("hi"))
    grid = bounds.select(
        F.explode(
            F.sequence("lo", "hi", F.expr("INTERVAL 1 HOUR"))
        ).alias("hr")
    )
    buckets = ev.sparkSession.range(10).select(F.col("id").alias("bucket"))
    cells = grid.crossJoin(F.broadcast(buckets))
    cnt = ev.groupBy("bucket", "hr").agg(F.count("*").alias("c"))
    joined = cells.join(cnt, ["bucket", "hr"], "left")
    return (
        joined.groupBy("bucket")
        .agg(
            F.count("*").alias("n_hours"),
            F.sum(F.when(F.col("c").isNull(), 1).otherwise(0))
            .cast("bigint")
            .alias("n_empty"),
            F.coalesce(F.sum("c"), F.lit(0)).cast("bigint").alias("n_events"),
        )
        .orderBy("bucket")
    )


# ---------------------------------------------------------------------------
# q83 — domain mixing via per-source hash keep-rates
# ---------------------------------------------------------------------------

# Target keep-rate (percent) per source group: the mixing weights a
# training run assigns to domains (e.g. curated > web crawl > logs).
_Q83_WEIGHTS = (
    ("src0", 100), ("src1", 100),  # curated: keep everything
    ("src2", 50), ("src3", 50), ("src4", 50),  # mid-trust: half
)
_Q83_DEFAULT_PCT = 20  # long-tail sources: keep 20%


@register(
    "q83_domain_mix",
    oracle=f"""
    WITH w(source, pct) AS (
      VALUES {", ".join(f"('{s}', {p})" for s, p in _Q83_WEIGHTS)}
    ),
    d AS (
      SELECT doc.source,
             COALESCE(w.pct, {_Q83_DEFAULT_PCT}) AS pct,
             {poly_hash_sql('doc.text')} % 100 AS b
      FROM documents doc LEFT JOIN w ON doc.source = w.source
    )
    SELECT source, pct::BIGINT AS pct, COUNT(*) AS n_total,
           SUM(CASE WHEN b < pct THEN 1 ELSE 0 END)::BIGINT AS n_kept
    FROM d GROUP BY source, pct ORDER BY source
    """,
    doc="Domain mixing: per-source target keep-rates applied via a "
    "content-hash threshold — the deterministic form of mixture-weight "
    "sampling. The weights dimension is a literal broadcast join; the "
    "keep decision is row-local.",
)
def q83(spark: SparkSession, sf: str) -> DataFrame:
    docs = load(spark, sf, "documents")
    weights = docs.sparkSession.createDataFrame(
        list(_Q83_WEIGHTS), "source string, pct int"
    )
    d = docs.join(F.broadcast(weights), "source", "left").select(
        "source",
        F.coalesce("pct", F.lit(_Q83_DEFAULT_PCT))
        .cast("bigint")
        .alias("pct"),
        (poly_hash("text") % 100).alias("b"),
    )
    return (
        d.groupBy("source", "pct")
        .agg(
            F.count("*").alias("n_total"),
            F.sum(F.when(F.col("b") < F.col("pct"), 1).otherwise(0))
            .cast("bigint")
            .alias("n_kept"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# q84 — IQR (Tukey-fence) outlier filter per group
# ---------------------------------------------------------------------------


@register(
    "q84_iqr_outliers",
    oracle="""
    WITH q AS (
      SELECT l_returnflag,
             FLOOR(quantile_cont(l_extendedprice, 0.25) * 100 + 0.5) / 100
               AS q1,
             FLOOR(quantile_cont(l_extendedprice, 0.75) * 100 + 0.5) / 100
               AS q3
      FROM lineitem GROUP BY l_returnflag
    )
    SELECT l.l_returnflag,
           COUNT(*) AS n_rows,
           SUM(CASE WHEN l.l_extendedprice < q.q1 - 1.5 * (q.q3 - q.q1)
                      OR l.l_extendedprice > q.q3 + 1.5 * (q.q3 - q.q1)
                    THEN 1 ELSE 0 END)::BIGINT AS n_outliers,
           FLOOR((q.q1 - 1.5 * (q.q3 - q.q1)) * 100 + 0.5) / 100 AS lo_fence,
           FLOOR((q.q3 + 1.5 * (q.q3 - q.q1)) * 100 + 0.5) / 100 AS hi_fence
    FROM lineitem l JOIN q ON l.l_returnflag = q.l_returnflag
    GROUP BY l.l_returnflag, q.q1, q.q3 ORDER BY l.l_returnflag
    """,
    doc="Per-group Tukey fences: exact interpolated quartiles (tiny "
    "per-group result, broadcast back over the fact scan), fences "
    "computed from 2-dp-rounded quartiles so the double arithmetic is "
    "bit-identical cross-engine (determinism rule: ROUND before "
    "deriving comparison bounds from computed doubles). Exact "
    "percentile buffers each group's values — the TEACHING shape; at "
    "100 TB use q84c (histogram-exact, bounded memory, measured ~3x "
    "faster at 60M rows) or q84b (sketch) for the fence pass — the "
    "two-pass broadcast shape stays identical across all three.",
)
def q84(spark: SparkSession, sf: str) -> DataFrame:
    li = load(spark, sf, "lineitem")
    # one percentile(array(...)) call: both quartiles share a single
    # per-group value buffer (two separate calls each buffer the full
    # group — measured 2x the aggregation time)
    pct = F.percentile(
        "l_extendedprice", F.array(F.lit(0.25), F.lit(0.75))
    )
    q = li.groupBy("l_returnflag").agg(
        qround(pct.getItem(0), 2).alias("q1"),
        qround(pct.getItem(1), 2).alias("q3"),
    )
    iqr = F.col("q3") - F.col("q1")
    lo = F.col("q1") - 1.5 * iqr
    hi = F.col("q3") + 1.5 * iqr
    joined = li.join(F.broadcast(q), "l_returnflag")
    p = F.col("l_extendedprice")
    return (
        joined.groupBy("l_returnflag", "q1", "q3")
        .agg(
            F.count("*").alias("n_rows"),
            F.sum(F.when((p < lo) | (p > hi), 1).otherwise(0))
            .cast("bigint")
            .alias("n_outliers"),
        )
        .select(
            "l_returnflag",
            "n_rows",
            "n_outliers",
            qround(lo, 2).alias("lo_fence"),
            qround(hi, 2).alias("hi_fence"),
        )
        .orderBy("l_returnflag")
    )


@register(
    "q84b_iqr_outliers_approx",
    oracle=None,  # sketch-based: bounded-diff-tested vs exact q84 instead
    doc="The 100 TB fence pass for q84: identical two-pass broadcast "
    "shape, but the quartiles come from approx_percentile (KLL-style "
    "mergeable sketch, fixed-size per group) instead of F.percentile's "
    "ObjectHashAggregate value buffer. Exact mode buffers every group's "
    "values and measured 3x at 10x scale (BASELINE.md) — a hot group at "
    "100x is an OOM; the sketch is O(1/accuracy) per group regardless "
    "of group size. accuracy=10000 bounds rank error at ~0.01%; "
    "tests/test_udfs_and_approx.py pins the fence drift vs exact q84. "
    "No SQL oracle by design (DuckDB's approx sketch differs); the "
    "driver records a rows-only check.",
)
def q84b(spark: SparkSession, sf: str) -> DataFrame:
    li = load(spark, sf, "lineitem")
    pct = F.percentile_approx(
        "l_extendedprice", F.array(F.lit(0.25), F.lit(0.75)), F.lit(10000)
    )
    q = li.groupBy("l_returnflag").agg(
        qround(pct.getItem(0), 2).alias("q1"),
        qround(pct.getItem(1), 2).alias("q3"),
    )
    iqr = F.col("q3") - F.col("q1")
    lo = F.col("q1") - 1.5 * iqr
    hi = F.col("q3") + 1.5 * iqr
    joined = li.join(F.broadcast(q), "l_returnflag")
    p = F.col("l_extendedprice")
    return (
        joined.groupBy("l_returnflag", "q1", "q3")
        .agg(
            F.count("*").alias("n_rows"),
            F.sum(F.when((p < lo) | (p > hi), 1).otherwise(0))
            .cast("bigint")
            .alias("n_outliers"),
        )
        .select(
            "l_returnflag",
            "n_rows",
            "n_outliers",
            qround(lo, 2).alias("lo_fence"),
            qround(hi, 2).alias("hi_fence"),
        )
        .orderBy("l_returnflag")
    )


# ---------------------------------------------------------------------------
# q85 — per-label embedding centroids (first 8 dimensions)
# ---------------------------------------------------------------------------


@register(
    "q85_label_centroids",
    oracle=f"""
    SELECT label, j AS pos,
           COUNT(*) AS n,
           {mean6_sql('embedding[j + 1]')} AS centroid
    FROM embeddings CROSS JOIN (SELECT unnest(range(8)) AS j)
    WHERE len(embedding) >= 8
    GROUP BY label, j ORDER BY label, j
    """,
    doc="Per-label centroid of the first 8 embedding dimensions — the "
    "class-prototype aggregate behind IVF coarse quantizers (q52) and "
    "embedding-space dataset cartography. Cross-engine determinism: each "
    "float is rounded to 6dp FIRST (round agrees across engines), then "
    "decimal-summed (exact, order-independent — a 10,000-partition sum "
    "equals DuckDB's sequential one), then averaged in double and "
    "re-rounded. posexplode keeps the expansion in-row; only the "
    "(label, pos) partial sums shuffle.",
)
def q85(spark: SparkSession, sf: str) -> DataFrame:
    emb = load(spark, sf, "embeddings")
    # len >= 8 on BOTH sides: DuckDB's CROSS JOIN range(8) would emit a
    # (label, pos) cell (counting the NULL position) for a short vector
    # while posexplode emits nothing — a variable-width fixture must
    # fail loudly, not silently diverge.
    ex = (
        emb.filter(F.size("embedding") >= 8)
        .select("label", F.posexplode("embedding").alias("pos", "val"))
        .filter(F.col("pos") < 8)
    )
    return (
        ex.groupBy("label", F.col("pos").cast("bigint").alias("pos"))
        .agg(
            F.count("*").alias("n"),
            mean6("val").alias("centroid"),
        )
        .orderBy("label", "pos")
    )


# ---------------------------------------------------------------------------
# q88 — curation funnel (single-pass conditional aggregation)
# ---------------------------------------------------------------------------


@register(
    "q88_curation_funnel",
    oracle="""
    WITH d AS (
      SELECT lang, n_chars, text,
             len(list_filter(string_split_regex(lower(text), '[^a-z]+'),
                             t -> t <> '')) AS ntok
      FROM documents
    )
    SELECT COUNT(*) AS s0_all,
           SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END)::BIGINT AS s1_lang,
           SUM(CASE WHEN lang = 'en' AND n_chars BETWEEN 100 AND 2000
                    THEN 1 ELSE 0 END)::BIGINT AS s2_len,
           SUM(CASE WHEN lang = 'en' AND n_chars BETWEEN 100 AND 2000
                         AND ntok >= 20
                    THEN 1 ELSE 0 END)::BIGINT AS s3_tok,
           COUNT(DISTINCT CASE WHEN lang = 'en'
                                    AND n_chars BETWEEN 100 AND 2000
                                    AND ntok >= 20
                               THEN text END) AS s4_dedup
    FROM d
    """,
    doc="Curation funnel: language filter → length band → minimum token "
    "count → exact text dedup, reported as per-stage survivor counts. "
    "ONE scan: every stage is a conditional aggregate over the same "
    "pass (not one scan per stage), so the funnel costs the same as a "
    "single profile query at any corpus size; the distinct-text stage "
    "is the only shuffle and only over stage-3 survivors.",
)
def q88(spark: SparkSession, sf: str) -> DataFrame:
    docs = load(spark, sf, "documents")
    ntok = F.size(F.filter(tokens("text"), lambda t: t != ""))
    c1 = F.col("lang") == "en"
    c2 = c1 & F.col("n_chars").between(100, 2000)
    c3 = c2 & (ntok >= 20)
    one = lambda c: F.sum(F.when(c, 1).otherwise(0)).cast("bigint")
    return docs.agg(
        F.count("*").alias("s0_all"),
        one(c1).alias("s1_lang"),
        one(c2).alias("s2_len"),
        one(c3).alias("s3_tok"),
        F.countDistinct(F.when(c3, F.col("text"))).alias("s4_dedup"),
    )


# ---------------------------------------------------------------------------
# q89 — label affinity: aggregate-then-pairwise centroid cosine
# ---------------------------------------------------------------------------


@register(
    "q89_label_affinity",
    oracle=f"""
    WITH ex AS (
      SELECT label, j AS pos,
             {mean6_sql('embedding[j + 1]')} AS c
      FROM embeddings CROSS JOIN (SELECT unnest(range(64)) AS j)
      WHERE len(embedding) >= 64
      GROUP BY label, j
    ),
    cent AS (
      SELECT label, list(c ORDER BY pos) AS v FROM ex GROUP BY label
    ),
    pairs AS (
      SELECT a.label AS label_a, b.label AS label_b,
             list_reduce(list_prepend(0.0,
               list_transform(range(1, 65), i -> a.v[i] * b.v[i])),
               (acc, x) -> acc + x) AS dot,
             sqrt(list_reduce(list_prepend(0.0,
               list_transform(range(1, 65), i -> a.v[i] * a.v[i])),
               (acc, x) -> acc + x)) AS na,
             sqrt(list_reduce(list_prepend(0.0,
               list_transform(range(1, 65), i -> b.v[i] * b.v[i])),
               (acc, x) -> acc + x)) AS nb
      FROM cent a JOIN cent b ON a.label <> b.label
    )
    SELECT label_a, label_b, cos FROM (
      SELECT label_a, label_b,
             ROUND(dot / (na * nb), 6) AS cos,
             ROW_NUMBER() OVER (PARTITION BY label_a
                                ORDER BY dot / (na * nb) DESC, label_b)
               AS rk
      FROM pairs)
    WHERE rk = 1 ORDER BY label_a
    """,
    doc="Nearest-neighbor label per label by centroid cosine — the "
    "aggregate-then-pairwise pattern: reduce N rows to K centroids "
    "FIRST (K=10 here), then do the quadratic comparison on K rows, "
    "never on N. Centroids use the q85 determinism recipe (round → "
    "decimal sum → average); dot/norm are sequential in-row folds, "
    "bit-identical across engines.",
)
def q89(spark: SparkSession, sf: str) -> DataFrame:
    emb = load(spark, sf, "embeddings")
    # width guard mirrors q85: len(embedding) >= 64 on both engines.
    ex = (
        emb.filter(F.size("embedding") >= 64)
        .select("label", F.posexplode("embedding").alias("pos", "val"))
        .filter(F.col("pos") < 64)
        .groupBy("label", "pos")
        .agg(mean6("val").alias("c"))
    )
    cent = ex.groupBy("label").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "c"))),
            lambda s: s["c"],
        ).alias("v")
    )
    a = cent.select(F.col("label").alias("label_a"), F.col("v").alias("va"))
    b = cent.select(F.col("label").alias("label_b"), F.col("v").alias("vb"))
    seq_dot = lambda x, y: F.aggregate(
        F.zip_with(x, y, lambda p, q: p * q),
        F.lit(0.0),
        lambda acc, t: acc + t,
    )
    pairs = (
        a.join(F.broadcast(b), F.col("label_a") != F.col("label_b"))
        .withColumn("dot", seq_dot(F.col("va"), F.col("vb")))
        .withColumn("na", F.sqrt(seq_dot(F.col("va"), F.col("va"))))
        .withColumn("nb", F.sqrt(seq_dot(F.col("vb"), F.col("vb"))))
    )
    from pyspark.sql import Window as W

    w = W.partitionBy("label_a").orderBy(
        (F.col("dot") / (F.col("na") * F.col("nb"))).desc(), "label_b"
    )
    return (
        pairs.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select(
            "label_a",
            "label_b",
            F.round(F.col("dot") / (F.col("na") * F.col("nb")), 6).alias(
                "cos"
            ),
        )
        .orderBy("label_a")
    )


# ---------------------------------------------------------------------------
# q90 — length-bucketed batching (deciles over token count)
# ---------------------------------------------------------------------------


@register(
    "q90_length_batching",
    oracle="""
    WITH d AS (
      SELECT doc_id, n_chars,
             NTILE(10) OVER (ORDER BY n_chars, doc_id) AS decile
      FROM documents
    )
    SELECT decile::BIGINT AS decile,
           COUNT(*) AS n_docs,
           MIN(n_chars)::BIGINT AS min_chars,
           MAX(n_chars)::BIGINT AS max_chars
    FROM d GROUP BY decile ORDER BY decile
    """,
    doc="Length-bucketed batching: docs ntile'd into 10 length deciles "
    "(padding-efficient batch construction groups similar-length "
    "sequences). Deterministic because the ntile order (n_chars, "
    "doc_id) is total. The assignment is computed DISTRIBUTED: a "
    "two-pass global row_number (operators/distributed.range_prefix — "
    "range partition + local ranks + offset broadcast) fed into "
    "ntile's closed-form bucket arithmetic (first n%10 buckets hold "
    "ceil(n/10) rows), in exact integer DIV — bit-identical to "
    "ntile(10) OVER a global window with no single-task stage.",
)
def q90(spark: SparkSession, sf: str) -> DataFrame:
    from parquet_demo_spark.operators.distributed import range_prefix

    docs = load(spark, sf, "documents")
    ranked = range_prefix(
        docs.select("doc_id", "n_chars"),
        ["n_chars", "doc_id"],
        row_col="__r",
        total_rows_col="__n",
    )
    # ntile(10) in closed form from (rank, n): buckets 1..(n%10) hold
    # ceil(n/10) rows, the rest floor(n/10); integer DIV keeps the
    # bucket math exact at any n (double division would wobble near
    # boundaries for 1e12-row ranks)
    decile = F.expr(
        "CAST(CASE WHEN __r <= (__n % 10) * (__n DIV 10 + 1) "
        "THEN (__r + (__n DIV 10)) DIV (__n DIV 10 + 1) "
        "ELSE (__n % 10) + (__r - (__n % 10) * (__n DIV 10 + 1) "
        "+ GREATEST(__n DIV 10, 1) - 1) DIV GREATEST(__n DIV 10, 1) "
        "END AS BIGINT)"
    )
    return (
        ranked.select(
            "doc_id",
            "n_chars",
            decile.alias("decile"),
        )
        .groupBy("decile")
        .agg(
            F.count("*").alias("n_docs"),
            F.min("n_chars").cast("bigint").alias("min_chars"),
            F.max("n_chars").cast("bigint").alias("max_chars"),
        )
        .orderBy("decile")
    )


# ---------------------------------------------------------------------------
# q91 — greedy sequence packing by running token budget
# ---------------------------------------------------------------------------

_Q91_BIN_TOKENS = 512


@register(
    "q91_sequence_packing",
    oracle=f"""
    WITH d AS (
      SELECT doc_id,
             len(list_filter(string_split_regex(lower(text), '[^a-z]+'),
                             t -> t <> '')) AS ntok
      FROM documents
    ),
    packed AS (
      SELECT doc_id, ntok,
             CAST(FLOOR((SUM(ntok) OVER (ORDER BY doc_id
                           ROWS UNBOUNDED PRECEDING) - ntok)
                        / {_Q91_BIN_TOKENS}) AS BIGINT) AS bin
      FROM d
    )
    SELECT COUNT(DISTINCT bin) AS n_bins,
           COUNT(*) AS n_docs,
           SUM(ntok)::BIGINT AS total_tokens,
           MAX(bin_tokens)::BIGINT AS max_bin_tokens
    FROM packed
    JOIN (SELECT bin AS b2, SUM(ntok) AS bin_tokens
          FROM packed GROUP BY bin) ON bin = b2
    """,
    doc="Sequence packing: docs assigned to ~"
    f"{_Q91_BIN_TOKENS}-token training bins by a running token count in "
    "doc order (the streaming-friendly approximation of greedy "
    "first-fit packing). The running sum is the DISTRIBUTED two-pass "
    "prefix scan (operators/distributed.range_prefix): range-partition "
    "on doc order, per-partition local sums, metadata-sized offset "
    "broadcast — bit-identical to a global window with every stage "
    "parallel (no single-task funnel at 100 TB).",
)
def q91(spark: SparkSession, sf: str) -> DataFrame:
    from parquet_demo_spark.operators.distributed import range_prefix

    docs = load(spark, sf, "documents")
    d = docs.select(
        "doc_id",
        F.size(F.filter(tokens("text"), lambda t: t != "")).alias("ntok"),
    )
    pre = range_prefix(
        d, ["doc_id"], value_col="ntok", cum_col="__cum"
    )
    packed = pre.select(
        "doc_id",
        "ntok",
        F.floor(
            (F.col("__cum") - F.col("ntok")) / _Q91_BIN_TOKENS
        )
        .cast("bigint")
        .alias("bin"),
    )
    bins = packed.groupBy("bin").agg(F.sum("ntok").alias("bin_tokens"))
    return packed.join(bins, "bin").agg(
        F.countDistinct("bin").alias("n_bins"),
        F.count("*").alias("n_docs"),
        F.sum("ntok").cast("bigint").alias("total_tokens"),
        F.max("bin_tokens").cast("bigint").alias("max_bin_tokens"),
    )


# ---------------------------------------------------------------------------
# q92 — column profile (nulls / distincts / extremes per column)
# ---------------------------------------------------------------------------


@register(
    "q92_column_profile",
    oracle="""
    SELECT 'event_type' AS col,
           COUNT(*) - COUNT(event_type) AS n_nulls,
           COUNT(DISTINCT event_type) AS n_distinct,
           MIN(event_type) AS min_s, MAX(event_type) AS max_s
    FROM events
    UNION ALL
    SELECT 'props', COUNT(*) - COUNT(props), COUNT(DISTINCT props),
           MIN(props), MAX(props)
    FROM events
    UNION ALL
    SELECT 'user_id', COUNT(*) - COUNT(user_id),
           COUNT(DISTINCT user_id),
           CAST(MIN(user_id) AS VARCHAR), CAST(MAX(user_id) AS VARCHAR)
    FROM events
    ORDER BY col
    """,
    doc="Data-profiling pass: per-column null count, distinct count, "
    "extremes — the ingest-time quality report (reference R19's metrics "
    "are throughput-side; this is the content-side twin). One pruned "
    "single-column branch per profiled column, unioned — N countDistinct "
    "in one agg would go through Catalyst's Expand rewrite, shuffling "
    "N x rows with the WIDEST column replicated into every lane "
    "(measured 4x slower on string-heavy props); separate branches each "
    "scan exactly one column and map-side-collapse to distinct partials.",
)
def q92(spark: SparkSession, sf: str) -> DataFrame:
    ev = load(spark, sf, "events")

    def branch(c: str) -> DataFrame:
        # min/max aggregate in the column's OWN type (numeric extremes
        # for numeric columns), rendered as string only at the edge
        return ev.select(c).agg(
            F.lit(c).alias("col"),
            (F.count("*") - F.count(c)).alias("n_nulls"),
            F.countDistinct(c).alias("n_distinct"),
            F.min(c).cast("string").alias("min_s"),
            F.max(c).cast("string").alias("max_s"),
        ).select("col", "n_nulls", "n_distinct", "min_s", "max_s")

    return (
        branch("event_type")
        .unionByName(branch("props"))
        .unionByName(branch("user_id"))
        .orderBy("col")
    )


# ---------------------------------------------------------------------------
# q147 — gap-fill with linear interpolation
# ---------------------------------------------------------------------------


@register(
    "q147_linear_interpolation",
    oracle="""
    WITH ev AS (
      SELECT user_id % 10 AS bucket,
             time_bucket(INTERVAL '15 minutes', ts) AS hr,
             CAST(ROUND(value * 100, 0) AS BIGINT) AS cents
      FROM events
    ),
    b AS (SELECT MIN(hr) AS lo, MAX(hr) AS hi FROM ev),
    grid AS (
      SELECT unnest(generate_series(lo, hi, INTERVAL 15 MINUTES)) AS hr
      FROM b
    ),
    cells AS (
      SELECT g.hr, r.range AS bucket FROM grid g CROSS JOIN range(10) r
    ),
    vals AS (
      SELECT bucket, hr, SUM(cents) AS v FROM ev GROUP BY bucket, hr
    ),
    joined AS (
      SELECT cells.bucket, cells.hr, vals.v,
             ROW_NUMBER() OVER (PARTITION BY cells.bucket
                                ORDER BY cells.hr) AS idx
      FROM cells LEFT JOIN vals
        ON cells.bucket = vals.bucket AND cells.hr = vals.hr
    ),
    fenced AS (
      SELECT bucket, hr, v, idx,
             LAST_VALUE(v IGNORE NULLS) OVER w_prev AS pv,
             LAST_VALUE(CASE WHEN v IS NOT NULL THEN idx END IGNORE NULLS)
               OVER w_prev AS pi,
             FIRST_VALUE(v IGNORE NULLS) OVER w_next AS nv,
             FIRST_VALUE(CASE WHEN v IS NOT NULL THEN idx END IGNORE NULLS)
               OVER w_next AS ni
      FROM joined
      WINDOW
        w_prev AS (PARTITION BY bucket ORDER BY idx
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
        w_next AS (PARTITION BY bucket ORDER BY idx
                   ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
    ),
    interp AS (
      SELECT bucket,
             v IS NOT NULL AS known,
             v IS NULL AND pv IS NOT NULL AND nv IS NOT NULL AS gap,
             CASE WHEN v IS NULL AND pv IS NOT NULL AND nv IS NOT NULL
               THEN ROUND(
                 CAST(pv AS DOUBLE)
                 + (CAST(nv AS DOUBLE) - CAST(pv AS DOUBLE))
                   * (CAST(idx - pi AS DOUBLE) / CAST(ni - pi AS DOUBLE)),
                 4)
             END AS iv
      FROM fenced
    )
    SELECT bucket,
           CAST(SUM(CASE WHEN known THEN 1 ELSE 0 END) AS BIGINT)
             AS n_known,
           CAST(SUM(CASE WHEN gap THEN 1 ELSE 0 END) AS BIGINT) AS n_gap,
           CAST(SUM(CASE WHEN NOT known AND NOT gap THEN 1 ELSE 0 END)
                AS BIGINT) AS n_edge,
           CAST(COALESCE(SUM(CAST(iv AS DECIMAL(18,9))), 0) AS DOUBLE)
             AS interp_sum
    FROM interp
    GROUP BY bucket ORDER BY bucket
    """,
    doc="Gap-fill with LINEAR INTERPOLATION: a 15-minute grid per "
    "user bucket (fine enough to leave real gaps at every fixture "
    "SF), where missing cells take the straight line between "
    "their nearest known neighbors — pandas.interpolate('linear') "
    "semantics as pure window algebra. The neighbor search is two "
    "ignore-nulls running windows (last known value/index up to the "
    "row, first known after), so the whole fill is one partitioned "
    "window pass — no self-join, no UDF, nothing quadratic in the "
    "grid. Cell values are exact integer cents (deterministic), the "
    "interpolated value rounds to 4 decimals and accumulates in "
    "decimal, so the driver hash-checks the fill math itself. Edge "
    "cells (no neighbor on one side) stay null and are counted, not "
    "invented. Scale: windows partition by series key — a 100 TB "
    "store of a million series interpolates as a million independent "
    "partitions; the grid rows are hours × series, never events².",
)
def q147(spark: SparkSession, sf: str) -> DataFrame:
    from pyspark.sql import Window as W

    ev = load(spark, sf, "events").select(
        (F.col("user_id") % 10).alias("bucket"),
        F.window("ts", "15 minutes")["start"].alias("hr"),
        F.round(F.col("value") * 100, 0).cast("bigint").alias("cents"),
    )
    bounds = ev.agg(F.min("hr").alias("lo"), F.max("hr").alias("hi"))
    grid = bounds.select(
        F.explode(
            F.sequence("lo", "hi", F.expr("INTERVAL 15 MINUTES"))
        ).alias("hr")
    )
    buckets = ev.sparkSession.range(10).select(F.col("id").alias("bucket"))
    cells = grid.crossJoin(F.broadcast(buckets))
    vals = ev.groupBy("bucket", "hr").agg(F.sum("cents").alias("v"))
    w_ord = W.partitionBy("bucket").orderBy("hr")
    joined = (
        cells.join(vals, ["bucket", "hr"], "left")
        .withColumn("idx", F.row_number().over(w_ord))
    )
    w_prev = W.partitionBy("bucket").orderBy("idx").rowsBetween(
        W.unboundedPreceding, 0
    )
    w_next = W.partitionBy("bucket").orderBy("idx").rowsBetween(
        0, W.unboundedFollowing
    )
    known_idx = F.when(F.col("v").isNotNull(), F.col("idx"))
    fenced = joined.select(
        "bucket",
        "v",
        "idx",
        F.last("v", ignorenulls=True).over(w_prev).alias("pv"),
        F.last(known_idx, ignorenulls=True).over(w_prev).alias("pi"),
        F.first("v", ignorenulls=True).over(w_next).alias("nv"),
        F.first(known_idx, ignorenulls=True).over(w_next).alias("ni"),
    )
    is_gap = (
        F.col("v").isNull()
        & F.col("pv").isNotNull()
        & F.col("nv").isNotNull()
    )
    iv = F.when(
        is_gap,
        F.round(
            F.col("pv").cast("double")
            + (F.col("nv").cast("double") - F.col("pv").cast("double"))
            * (
                (F.col("idx") - F.col("pi")).cast("double")
                / (F.col("ni") - F.col("pi")).cast("double")
            ),
            4,
        ),
    )
    return (
        fenced.select(
            "bucket",
            F.col("v").isNotNull().alias("known"),
            is_gap.alias("gap"),
            iv.alias("iv"),
        )
        .groupBy("bucket")
        .agg(
            F.sum(F.when(F.col("known"), 1).otherwise(0))
            .cast("bigint")
            .alias("n_known"),
            F.sum(F.when(F.col("gap"), 1).otherwise(0))
            .cast("bigint")
            .alias("n_gap"),
            F.sum(
                F.when(~F.col("known") & ~F.col("gap"), 1).otherwise(0)
            )
            .cast("bigint")
            .alias("n_edge"),
            F.coalesce(
                F.sum(F.col("iv").cast("decimal(18,9)")), F.lit(0)
            )
            .cast("double")
            .alias("interp_sum"),
        )
        .orderBy("bucket")
    )


@register(
    "q84c_iqr_outliers_exact_histogram",
    oracle="""
    WITH q AS (
      SELECT l_returnflag,
             FLOOR(quantile_cont(l_extendedprice, 0.25) * 100 + 0.5) / 100
               AS q1,
             FLOOR(quantile_cont(l_extendedprice, 0.75) * 100 + 0.5) / 100
               AS q3
      FROM lineitem GROUP BY l_returnflag
    )
    SELECT l.l_returnflag,
           COUNT(*) AS n_rows,
           SUM(CASE WHEN l.l_extendedprice < q.q1 - 1.5 * (q.q3 - q.q1)
                      OR l.l_extendedprice > q.q3 + 1.5 * (q.q3 - q.q1)
                    THEN 1 ELSE 0 END)::BIGINT AS n_outliers,
           FLOOR((q.q1 - 1.5 * (q.q3 - q.q1)) * 100 + 0.5) / 100 AS lo_fence,
           FLOOR((q.q3 + 1.5 * (q.q3 - q.q1)) * 100 + 0.5) / 100 AS hi_fence
    FROM lineitem l JOIN q ON l.l_returnflag = q.l_returnflag
    GROUP BY l.l_returnflag, q.q1, q.q3 ORDER BY l.l_returnflag
    """,
    doc="EXACT interpolated quartiles WITHOUT the per-group value "
    "buffer — closes q84's documented 100 TB hazard (the one "
    "perf-weak item): instead of F.percentile's ObjectHashAggregate "
    "buffering every group's values (GC swings 9.9-27.7s at 60M rows, "
    "OOM risk on a hot group), the quartiles come from a VALUE "
    "HISTOGRAM — groupBy(group, value) counts, a cumulative-count "
    "window per group, and the two order statistics bracketing rank "
    "(N-1)*p located by their [cum_prev, cum) interval, linearly "
    "interpolated exactly as quantile_cont defines. Memory is bounded "
    "by DISTINCT (group, value) pairs (prices: a fixed domain) "
    "regardless of row count, every step is a shuffle-friendly "
    "aggregate/window, and the result is EXACT — same oracle as q84, "
    "so the hash proves histogram == quantile_cont to the cent. The "
    "classic selection-by-counting design (public; textbook "
    "distributed order statistics). Fences + outlier pass identical "
    "to q84's broadcast second pass.",
)
def q84c(spark: SparkSession, sf: str) -> DataFrame:
    from pyspark.sql import Window as W

    li = load(spark, sf, "lineitem")
    hist = li.groupBy("l_returnflag", "l_extendedprice").agg(
        F.count("*").alias("cnt")
    )
    wcum = (
        W.partitionBy("l_returnflag")
        .orderBy("l_extendedprice")
        .rowsBetween(W.unboundedPreceding, 0)
    )
    h = (
        hist.withColumn("cum", F.sum("cnt").over(wcum))
        .withColumn("cum_prev", F.col("cum") - F.col("cnt"))
        .withColumn(
            "n", F.sum("cnt").over(W.partitionBy("l_returnflag"))
        )
    )

    def order_stat(idx):
        """The value whose [cum_prev, cum) interval holds 0-based idx."""
        return F.max(
            F.when(
                (F.col("cum_prev") <= idx) & (F.col("cum") > idx),
                F.col("l_extendedprice"),
            )
        )

    def rank(p):
        return (F.col("n") - 1) * F.lit(p)

    qs = h.groupBy("l_returnflag").agg(
        order_stat(F.floor(rank(0.25))).alias("v1lo"),
        order_stat(F.floor(rank(0.25)) + 1).alias("v1hi"),
        order_stat(F.floor(rank(0.75))).alias("v3lo"),
        order_stat(F.floor(rank(0.75)) + 1).alias("v3hi"),
        F.max("n").alias("n"),
    )

    def interp(p, vlo, vhi):
        r = (F.col("n") - 1) * F.lit(p)
        frac = r - F.floor(r)
        hi = F.coalesce(F.col(vhi), F.col(vlo))
        return F.col(vlo) + frac * (hi - F.col(vlo))

    q = qs.select(
        "l_returnflag",
        qround(interp(0.25, "v1lo", "v1hi"), 2).alias("q1"),
        qround(interp(0.75, "v3lo", "v3hi"), 2).alias("q3"),
    )
    iqr = F.col("q3") - F.col("q1")
    lo = F.col("q1") - 1.5 * iqr
    hi = F.col("q3") + 1.5 * iqr
    joined = li.join(F.broadcast(q), "l_returnflag")
    p = F.col("l_extendedprice")
    return (
        joined.groupBy("l_returnflag", "q1", "q3")
        .agg(
            F.count("*").alias("n_rows"),
            F.sum(F.when((p < lo) | (p > hi), 1).otherwise(0))
            .cast("bigint")
            .alias("n_outliers"),
        )
        .select(
            "l_returnflag",
            "n_rows",
            "n_outliers",
            qround(lo, 2).alias("lo_fence"),
            qround(hi, 2).alias("hi_fence"),
        )
        .orderBy("l_returnflag")
    )


# --- corpus mixture builders (q173 exact / q175 epoch-repeat / q176 ---------
# approx): ONE shared scaffolding — the group fold, token counts, frozen
# hash, weight table, and need derivation are load-bearing for the
# "mixtures compose bit-for-bit" claim, so they exist exactly once on
# each side (Spark helpers + one oracle CTE string) instead of three
# drifting copies.

_MIX_WEIGHTS = [("g0", 0.4), ("g1", 0.3), ("g2", 0.2), ("g3", 0.1)]


def _mix_ctes(budget_fn: str) -> str:
    """Shared DuckDB CTE chain: base docs (group, token count, frozen
    hash + its 10000-bucket fold), per-group totals, weights, budget
    (MIN = largest achievable without up-sampling, MAX = consume the
    largest source exactly once), and integer token needs."""
    cases = " ".join(
        f"WHEN '{g}' THEN CAST({w} AS DOUBLE)"
        for g, w in _MIX_WEIGHTS[:-1]
    )
    return f"""base AS (
  SELECT doc_id,
         'g' || CAST(CAST(regexp_extract(source, '([0-9]+)', 1) AS INT)
                     % 4 AS VARCHAR) AS grp,
         CAST(len(list_filter(string_split_regex(lower(text), '[^a-z]+'),
                              t -> t <> '')) AS BIGINT) AS tok,
         {poly_hash_sql("CAST(doc_id AS VARCHAR)")} AS h,
         {poly_hash_sql("CAST(doc_id AS VARCHAR)")} % 10000 AS hb
  FROM documents
),
totals AS (
  SELECT grp, CAST(SUM(tok) AS BIGINT) AS tokens_total FROM base GROUP BY grp
),
w AS (
  SELECT grp, tokens_total,
         CASE grp {cases}
                  ELSE CAST({_MIX_WEIGHTS[-1][1]} AS DOUBLE) END AS wt
  FROM totals
),
b AS (SELECT {budget_fn}(tokens_total / wt) AS budget FROM w),
need AS (
  SELECT grp, tokens_total,
         CAST(FLOOR(wt * (SELECT budget FROM b)) AS BIGINT) AS need_tokens
  FROM w
)"""


def _mixture_base(docs: DataFrame) -> DataFrame:
    """(doc_id, grp, tok, h, hb): group fold, token count, frozen hash."""
    h = poly_hash(F.col("doc_id").cast("string"))
    return docs.select(
        "doc_id",
        F.concat(
            F.lit("g"),
            (
                F.regexp_extract("source", r"(\d+)", 1).cast("int") % 4
            ).cast("string"),
        ).alias("grp"),
        F.size(F.filter(tokens("text"), lambda t: t != ""))
        .cast("bigint")
        .alias("tok"),
        h.alias("h"),
        (h % 10000).alias("hb"),
    )


def _mixture_need(base: DataFrame, budget_fn) -> DataFrame:
    """(grp, tokens_total, need_tokens) for the target weights under a
    budget rule (F.min: no up-sampling; F.max: largest source = one
    epoch)."""
    wt = F.col("grp")
    expr = None
    for g, w in _MIX_WEIGHTS[:-1]:
        expr = (
            F.when(wt == g, F.lit(w))
            if expr is None
            else expr.when(wt == g, F.lit(w))
        )
    expr = expr.otherwise(F.lit(_MIX_WEIGHTS[-1][1])).cast("double")
    totals = base.groupBy("grp").agg(
        F.sum("tok").cast("bigint").alias("tokens_total")
    )
    w = totals.withColumn("wt", expr)
    budget = w.agg(
        budget_fn(F.col("tokens_total") / F.col("wt")).alias("budget")
    )
    return (
        w.crossJoin(F.broadcast(budget))
        .select(
            "grp",
            "tokens_total",
            F.floor(F.col("wt") * F.col("budget"))
            .cast("bigint")
            .alias("need_tokens"),
        )
    )


def _mix_agg_left(need: DataFrame, grouped: DataFrame, cols) -> DataFrame:
    """need LEFT JOIN per-group aggregates, zero-backfilled (a group
    whose selection is empty still reports its totals/needs)."""
    out = need.join(grouped, "grp", "left")
    return out.select(
        "grp",
        *[
            F.coalesce(F.col(c), F.lit(0).cast("bigint")).alias(c)
            for c in cols
        ],
        "tokens_total",
        "need_tokens",
    )


_Q173_ORACLE = f"""
WITH {_mix_ctes("MIN")},
ranked AS (
  SELECT base.*, SUM(tok) OVER (PARTITION BY grp ORDER BY h, doc_id) AS cum
  FROM base
),
sel AS (
  SELECT r.grp, r.tok FROM ranked r JOIN need n USING (grp)
  WHERE r.cum - r.tok < n.need_tokens
)
SELECT n.grp,
       CAST(COUNT(s.tok) AS BIGINT) AS n_docs_kept,
       CAST(COALESCE(SUM(s.tok), 0) AS BIGINT) AS tokens_kept,
       n.tokens_total, n.need_tokens
FROM need n LEFT JOIN sel s ON n.grp = s.grp
GROUP BY n.grp, n.tokens_total, n.need_tokens
ORDER BY n.grp
"""


@register(
    "q173_corpus_mixture",
    oracle=_Q173_ORACLE,
    doc="Training-corpus mixture builder (the Dolma/Pile-style "
    "weighted-source recipe): sources fold into 4 groups with target "
    "token weights (0.4/0.3/0.2/0.1); the token budget is the largest "
    "achievable WITHOUT up-sampling (min over groups of total/weight), "
    "and each group keeps a deterministic hash-ordered PREFIX of its "
    "docs until the group's token need is met — the doc crossing the "
    "boundary is kept (closed prefix). Selection order is the frozen "
    "cross-engine poly_hash of doc_id, so the mixture is reproducible "
    "bit-for-bit across engines and epochs; per-group kept "
    "docs/tokens vs totals/needs are hash-checked. Scale: one "
    "token-count pass, one tiny broadcast of per-group needs, and the "
    "EXACT per-group prefix as a distributed two-pass scan "
    "(operators/distributed.range_prefix: range partition on (grp, "
    "h), partition-local running sums, offset broadcast) — with only "
    "4 groups a per-group window would serialize each group's ENTIRE "
    "corpus through one task; q176 is the no-shuffle approximate "
    "sibling. operators/pipeline.py.",
)
def q173(spark: SparkSession, sf: str) -> DataFrame:
    from parquet_demo_spark.operators.distributed import range_prefix

    base = _mixture_base(
        load(spark, sf, "documents").select("doc_id", "text", "source")
    )
    need = _mixture_need(base, F.min)
    pre = range_prefix(
        base,
        ["h", "doc_id"],
        group_cols=["grp"],
        value_col="tok",
        cum_col="cum",
    )
    sel = (
        pre.join(F.broadcast(need), "grp")
        .filter(F.col("cum") - F.col("tok") < F.col("need_tokens"))
    )
    return _mix_agg_left(
        need,
        sel.groupBy("grp").agg(
            F.count("*").cast("bigint").alias("n_docs_kept"),
            F.sum("tok").cast("bigint").alias("tokens_kept"),
        ),
        ["n_docs_kept", "tokens_kept"],
    ).orderBy("grp")


_Q175_ORACLE = f"""
WITH {_mix_ctes("MAX")},
plan_t AS (
  SELECT grp, tokens_total, need_tokens,
         CAST(FLOOR(need_tokens / tokens_total) AS BIGINT)
           AS full_epochs,
         need_tokens - CAST(FLOOR(need_tokens / tokens_total) AS BIGINT)
           * tokens_total AS rem_tokens
  FROM need
),
full_rows AS (
  SELECT b.grp, b.tok,
         unnest(generate_series(0, CAST(p.full_epochs AS INT) - 1)) AS epoch
  FROM base b JOIN plan_t p USING (grp)
  WHERE p.full_epochs > 0
),
ranked AS (
  SELECT base.*, SUM(tok) OVER (PARTITION BY grp ORDER BY h, doc_id) AS cum
  FROM base
),
rem_rows AS (
  SELECT r.grp, r.tok, CAST(p.full_epochs AS INT) AS epoch
  FROM ranked r JOIN plan_t p USING (grp)
  WHERE p.rem_tokens > 0 AND r.cum - r.tok < p.rem_tokens
),
mixture AS (
  SELECT grp, tok, epoch FROM full_rows
  UNION ALL SELECT grp, tok, epoch FROM rem_rows
)
SELECT p.grp,
       CAST(COUNT(m.tok) AS BIGINT) AS n_rows_sampled,
       CAST(COALESCE(SUM(m.tok), 0) AS BIGINT) AS tokens_sampled,
       CAST(COUNT(DISTINCT m.epoch) AS BIGINT) AS n_epochs,
       p.tokens_total, p.need_tokens
FROM plan_t p LEFT JOIN mixture m ON p.grp = m.grp
GROUP BY p.grp, p.tokens_total, p.need_tokens
ORDER BY p.grp
"""


@register(
    "q175_epoch_mixture_upsampling",
    oracle=_Q175_ORACLE,
    doc="Epoch-repeat mixture with UP-sampling — q173's complement for "
    "the regime where the token budget exceeds small sources' totals "
    "(the multi-epoch training recipe): budget = max over groups of "
    "total/weight (the LARGEST source is consumed exactly once), each "
    "group contributes floor(need/total) FULL epochs (explode over a "
    "sequence — no data duplication until the scan materializes the "
    "epoch column) plus a deterministic hash-ordered closed-prefix "
    "remainder tagged as the final partial epoch. Per-group sampled "
    "rows/tokens/epoch-count vs totals/needs hash-checked; same "
    "frozen poly_hash order as q173, so the two mixtures compose. "
    "Scale: full epochs are a zero-shuffle row multiplier at scan "
    "time; the remainder prefix runs as the distributed two-pass "
    "scan (operators/distributed.range_prefix), never a per-group "
    "single-task window. operators/pipeline.py.",
)
def q175(spark: SparkSession, sf: str) -> DataFrame:
    base = _mixture_base(
        load(spark, sf, "documents").select("doc_id", "text", "source")
    )
    plan = (
        _mixture_need(base, F.max)
        .withColumn(
            "full_epochs",
            (F.col("need_tokens") / F.col("tokens_total"))
            .cast("bigint"),
        )
        .withColumn(
            "rem_tokens",
            F.col("need_tokens")
            - F.col("full_epochs") * F.col("tokens_total"),
        )
    )
    full_rows = (
        base.join(F.broadcast(plan), "grp")
        .filter(F.col("full_epochs") > 0)
        .select(
            "grp",
            "tok",
            F.explode(
                F.sequence(
                    F.lit(0).cast("int"),
                    (F.col("full_epochs") - 1).cast("int"),
                )
            ).alias("epoch"),
        )
    )
    from parquet_demo_spark.operators.distributed import range_prefix

    pre = range_prefix(
        base,
        ["h", "doc_id"],
        group_cols=["grp"],
        value_col="tok",
        cum_col="cum",
    )
    rem_rows = (
        pre.join(F.broadcast(plan), "grp")
        .filter(
            (F.col("rem_tokens") > 0)
            & (F.col("cum") - F.col("tok") < F.col("rem_tokens"))
        )
        .select(
            "grp", "tok", F.col("full_epochs").cast("int").alias("epoch")
        )
    )
    mixture = full_rows.unionByName(rem_rows)
    return _mix_agg_left(
        plan,
        mixture.groupBy("grp").agg(
            F.count("*").cast("bigint").alias("n_rows_sampled"),
            F.sum("tok").cast("bigint").alias("tokens_sampled"),
            F.countDistinct("epoch").cast("bigint").alias("n_epochs"),
        ),
        ["n_rows_sampled", "tokens_sampled", "n_epochs"],
    ).orderBy("grp")


_Q176_ORACLE = f"""
WITH {_mix_ctes("MIN")},
keep AS (
  SELECT grp, tokens_total, need_tokens,
         CAST(FLOOR(CAST(10000 AS DOUBLE) * need_tokens / tokens_total)
              AS BIGINT) AS keep_bp
  FROM need
),
sel AS (
  SELECT b.grp, b.tok FROM base b JOIN keep k USING (grp)
  WHERE b.hb < k.keep_bp
)
SELECT k.grp,
       CAST(COUNT(s.tok) AS BIGINT) AS n_docs_kept,
       CAST(COALESCE(SUM(s.tok), 0) AS BIGINT) AS tokens_kept,
       k.tokens_total, k.need_tokens, k.keep_bp
FROM keep k LEFT JOIN sel s ON k.grp = s.grp
GROUP BY k.grp, k.tokens_total, k.need_tokens, k.keep_bp
ORDER BY k.grp
"""


@register(
    "q176_approx_mixture_nosort",
    oracle=_Q176_ORACLE,
    doc="The NO-SORT approximate mixture — q173's 100 TB path made "
    "first-class and hash-checked: instead of the exact per-group "
    "cumulative-prefix (one sort per group), keep docs whose "
    "poly_hash falls under floor(10000 * need/total) of 10000 hash "
    "buckets — a pure FILTER, zero shuffle beyond the token-total "
    "agg, deterministic and engine-independent. Token mass tracks the "
    "target within sampling error (each doc is an independent "
    "keep/drop; the per-group kept tokens are reported against "
    "need_tokens so the error is visible in the checked row, not "
    "hidden). The exact q173 and this filter share the same hash, so "
    "a pipeline can prototype with the filter and switch to the exact "
    "prefix without re-shuffling doc identity. operators/pipeline.py.",
)
def q176(spark: SparkSession, sf: str) -> DataFrame:
    base = _mixture_base(
        load(spark, sf, "documents").select("doc_id", "text", "source")
    )
    keep = _mixture_need(base, F.min).withColumn(
        "keep_bp",
        F.floor(
            F.lit(10000.0) * F.col("need_tokens") / F.col("tokens_total")
        ).cast("bigint"),
    )
    sel = base.join(F.broadcast(keep), "grp").filter(
        F.col("hb") < F.col("keep_bp")
    )
    out = _mix_agg_left(
        keep,
        sel.groupBy("grp").agg(
            F.count("*").cast("bigint").alias("n_docs_kept"),
            F.sum("tok").cast("bigint").alias("tokens_kept"),
        ),
        ["n_docs_kept", "tokens_kept"],
    )
    return out.join(
        keep.select("grp", "keep_bp"), "grp"
    ).select(
        "grp",
        "n_docs_kept",
        "tokens_kept",
        "tokens_total",
        "need_tokens",
        "keep_bp",
    ).orderBy("grp")


# ---------------------------------------------------------------------------
# q178 — exact-k per-stratum reservoir (deterministic content-hash order)
# ---------------------------------------------------------------------------


@register(
    "q178_group_reservoir",
    oracle=f"""
    SELECT lang, doc_id, rk FROM (
      SELECT lang, doc_id,
             ROW_NUMBER() OVER (
               PARTITION BY lang ORDER BY ph, doc_id)::BIGINT AS rk
      FROM (SELECT lang, doc_id, {poly_hash_sql('text')} AS ph
            FROM documents))
    WHERE rk <= 4
    ORDER BY lang, rk
    """,
    doc="Exact-k per-stratum reservoir: EXACTLY 4 documents per lang, "
    "chosen as the k smallest by (content poly-hash, doc_id) — the "
    "fixed-quota complement of q80's rate-based stratified sample "
    "('give me exactly 10k eval docs per language', not '~1%'). No "
    "RNG: the keep set is a pure function of document content, so "
    "re-runs, reshuffles, and engine swaps reproduce it bit-for-bit "
    "(a distributed reservoir with random tags can't promise that). "
    "Scale shape: the rank<=k filter compiles to WindowGroupLimit "
    "(plan-asserted) — every map task keeps at most k rows per "
    "stratum BEFORE the shuffle, so the exchange carries "
    "O(k x strata x tasks) rows, never the corpus, even with only 5 "
    "hot lang keys.",
)
def q178(spark: SparkSession, sf: str) -> DataFrame:
    from pyspark.sql import Window as W

    docs = load(spark, sf, "documents")
    w = W.partitionBy("lang").orderBy("ph", "doc_id")
    return (
        docs.select("lang", "doc_id", poly_hash("text").alias("ph"))
        .withColumn("rk", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rk") <= 4)
        .select("lang", "doc_id", "rk")
        .orderBy("lang", "rk")
    )


# ---------------------------------------------------------------------------
# q184 — temperature-weighted domain mixture (alpha-sampling)
# ---------------------------------------------------------------------------


@register(
    "q184_temperature_mixture",
    oracle=f"""
    WITH counts AS (
      SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs
      FROM documents GROUP BY source
    ),
    rates AS (
      SELECT source, n_docs,
             CAST(LEAST(1000000,
                        FLOOR(2.0 / sqrt(CAST(n_docs AS DOUBLE))
                              * 1000000)) AS BIGINT) AS rate_ppm
      FROM counts
    ),
    sampled AS (
      SELECT d.source AS source
      FROM documents d JOIN rates r ON d.source = r.source
      WHERE {poly_hash_sql(
          "concat(CAST(d.doc_id AS VARCHAR), ':', d.source)")}
            % 1000000 < r.rate_ppm
    ),
    agg AS (
      SELECT source, CAST(COUNT(*) AS BIGINT) AS n_sampled
      FROM sampled GROUP BY source
    )
    SELECT r.source AS source, r.n_docs AS n_docs,
           r.rate_ppm AS rate_ppm,
           CAST(COALESCE(a.n_sampled, 0) AS BIGINT) AS n_sampled
    FROM rates r LEFT JOIN agg a USING (source)
    ORDER BY source
    """,
    doc="Temperature-weighted domain mixture — the alpha-sampling "
    "recipe every large-scale LM data pipeline applies to flatten "
    "domain skew (sample domain d with mass proportional to "
    "n_d^alpha; alpha = 1/2 here, i.e. temperature 2): per-domain "
    "acceptance rate = min(1, K/sqrt(n_d)) with K=2, materialized as "
    "an integer ppm threshold, and a document is kept iff its "
    "content-independent poly_hash(doc_id ':' source) lands under the "
    "threshold. Fully deterministic cross-engine: sqrt and divide are "
    "IEEE-correctly-rounded in both engines, the threshold floors to "
    "integer ppm, and the hash has an exact DuckDB twin — no RNG, so "
    "re-runs and engine swaps reproduce the mixture bit-for-bit "
    "(q79/q80's splitting law applied to mixture building). Scale "
    "shape: one tiny groupBy for the counts, the rate table "
    "BROADCAST back onto the corpus, acceptance a pure JVM-side "
    "filter — the corpus never shuffles (plan-asserted).",
)
def q184(spark: SparkSession, sf: str) -> DataFrame:
    docs = load(spark, sf, "documents").select("doc_id", "source")
    rates = (
        docs.groupBy("source")
        .agg(F.count("*").cast("bigint").alias("n_docs"))
        .withColumn(
            "rate_ppm",
            F.least(
                F.lit(1000000).cast("bigint"),
                F.floor(
                    F.lit(2.0)
                    / F.sqrt(F.col("n_docs").cast("double"))
                    * 1000000
                ).cast("bigint"),
            ),
        )
    )
    sampled = (
        docs.join(F.broadcast(rates.select("source", "rate_ppm")), "source")
        .filter(
            poly_hash(
                F.concat(
                    F.col("doc_id").cast("string"),
                    F.lit(":"),
                    F.col("source"),
                )
            )
            % 1000000
            < F.col("rate_ppm")
        )
        .groupBy("source")
        .agg(F.count("*").cast("bigint").alias("n_sampled"))
    )
    return (
        rates.join(sampled, "source", "left")
        .select(
            "source",
            "n_docs",
            "rate_ppm",
            F.coalesce(F.col("n_sampled"), F.lit(0))
            .cast("bigint")
            .alias("n_sampled"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# q186 — overlapping document chunking (RAG / context-window prep)
# ---------------------------------------------------------------------------


@register(
    "q186_overlap_chunking",
    oracle=f"""
    WITH c AS (
      SELECT doc_id, source, u.s AS start,
             length({chunk_text_sql("coalesce(text, '')", "u.s")})
               AS chunk_chars
      FROM documents,
           {chunk_starts_sql("coalesce(text, '')")} AS u(s)
    ),
    per_doc AS (
      SELECT source, doc_id, CAST(COUNT(*) AS BIGINT) AS nc,
             CAST(SUM(chunk_chars) AS BIGINT) AS cc
      FROM c GROUP BY source, doc_id
    )
    SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(nc) AS BIGINT) AS n_chunks,
           CAST(SUM(cc) AS BIGINT) AS sum_chunk_chars,
           CAST(MAX(nc) AS BIGINT) AS max_chunks_per_doc
    FROM per_doc GROUP BY source ORDER BY source
    """,
    doc="Overlapping document chunking — the RAG / context-window "
    "prep step (fixed-size character windows, 600 chars at stride "
    "480 = 20% overlap, the public LangChain/LlamaIndex recipe): "
    "each document explodes into ceil(len/stride) chunks whose ids "
    "are (doc_id, start) — a pure function of content position, so "
    "re-chunking is idempotent and chunk references stay stable "
    "across reruns. Checked rows are per-source chunk inventories "
    "(docs, chunks, chunk chars, max chunks per doc). Scale shape: "
    "chunking is MAP-SIDE (sequence + explode + substr, whole-stage "
    "codegen, no UDF); the only shuffles are the two partial-agg "
    "rollups — a 100 TB corpus chunks at scan speed with no "
    "data-sized exchange of the text itself.",
)
def q186(spark: SparkSession, sf: str) -> DataFrame:
    docs = load(spark, sf, "documents").select(
        "doc_id",
        "source",
        F.coalesce(F.col("text"), F.lit("")).alias("text"),
    )
    chunks = docs.select(
        "doc_id",
        "source",
        "text",
        F.explode(chunk_starts("text")).alias("start"),
    ).select(
        "doc_id",
        "source",
        F.length(chunk_text("text", F.col("start"))).alias("chunk_chars"),
    )
    per_doc = chunks.groupBy("source", "doc_id").agg(
        F.count("*").cast("bigint").alias("nc"),
        F.sum("chunk_chars").cast("bigint").alias("cc"),
    )
    return (
        per_doc.groupBy("source")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.sum("nc").cast("bigint").alias("n_chunks"),
            F.sum("cc").cast("bigint").alias("sum_chunk_chars"),
            F.max("nc").cast("bigint").alias("max_chunks_per_doc"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# q187 — hashed-feature importance selection (DSIR-shape)
# ---------------------------------------------------------------------------

# Hashed n-gram feature space (DSIR, Xie et al. 2023 uses 10k buckets
# over uni+bigrams; 64 unigram buckets here keeps the sf0.01 oracle
# fast while exercising the identical plan shape).
_Q187_BUCKETS = 64
_Q187_TOP_K = 20


@register(
    "q187_importance_selection",
    oracle=f"""
    WITH tok0 AS (
      SELECT doc_id, lang,
             unnest(string_split_regex(lower(text), '[^a-z]+')) AS token
      FROM documents
    ),
    tok AS (
      SELECT doc_id, lang,
             {poly_hash_sql("token")} % {_Q187_BUCKETS} AS bucket
      FROM tok0 WHERE token <> ''
    ),
    bt AS (
      SELECT bucket,
             CAST(COUNT(*) AS BIGINT) AS cnt_r,
             CAST(COUNT(*) FILTER (WHERE lang = 'en') AS BIGINT) AS cnt_t
      FROM tok GROUP BY bucket
    ),
    tot AS (
      SELECT CAST(SUM(cnt_r) AS BIGINT) AS t_r,
             CAST(SUM(cnt_t) AS BIGINT) AS t_t
      FROM bt
    ),
    w AS (
      SELECT bucket,
             CAST(FLOOR((CAST(cnt_t AS DOUBLE) / CAST(t_t AS DOUBLE)
                       - CAST(cnt_r AS DOUBLE) / CAST(t_r AS DOUBLE))
                        * 1000000) AS BIGINT) AS w_ppm
      FROM bt, tot
    ),
    db AS (
      SELECT doc_id, lang, bucket, CAST(COUNT(*) AS BIGINT) AS c
      FROM tok GROUP BY doc_id, lang, bucket
    )
    SELECT db.doc_id AS doc_id, db.lang AS lang,
           CAST(SUM(db.c * w.w_ppm) AS BIGINT) AS score_ppm
    FROM db JOIN w USING (bucket)
    GROUP BY db.doc_id, db.lang
    ORDER BY score_ppm DESC, doc_id LIMIT {_Q187_TOP_K}
    """,
    doc="Hashed-feature importance selection — the DSIR recipe (Data "
    "Selection via Importance Resampling, Xie et al. 2023, public): "
    "tokens hash into a fixed bucket space, a tiny per-bucket "
    "distribution table is estimated for the TARGET corpus (lang='en' "
    "stands in for the curated target) and the RAW corpus, and each "
    "document scores by how far its bucket mass leans toward the "
    "target. The per-bucket weight is the first-order surrogate of "
    "the DSIR log-ratio — (p_target(b) - p_raw(b)) floored to integer "
    "ppm — chosen over ln() because multiply/divide/floor are "
    "IEEE-correctly-rounded in both engines (ln is not guaranteed "
    "bit-identical), so the selection reproduces exactly cross-engine; "
    "weights are bounded by ±1e6 ppm, so doc scores never overflow "
    "BIGINT at any corpus size. Scale shape: the weight table is "
    "BUCKETS rows (metadata-sized) and BROADCAST onto the per-(doc,"
    "bucket) counts; the corpus shuffles only as partial-agg'd "
    "(doc,bucket) tallies; the final cut is a TakeOrdered heap, never "
    "a global sort (both plan-asserted).",
)
def q187(spark: SparkSession, sf: str) -> DataFrame:
    docs = load(spark, sf, "documents").select("doc_id", "lang", "text")
    tok = (
        docs.select(
            "doc_id",
            "lang",
            F.explode(tokens("text")).alias("token"),
        )
        .filter(F.col("token") != "")
        .select(
            "doc_id",
            "lang",
            (poly_hash("token") % _Q187_BUCKETS).alias("bucket"),
        )
    )
    db = tok.groupBy("doc_id", "lang", "bucket").agg(
        F.count("*").cast("bigint").alias("c")
    )
    # the bucket distributions fold from db's metadata-sized tallies —
    # the corpus tokenizes/explodes exactly ONCE, not once per rollup
    bt = db.groupBy("bucket").agg(
        F.sum("c").cast("bigint").alias("cnt_r"),
        F.sum(F.when(F.col("lang") == "en", F.col("c")).otherwise(0))
        .cast("bigint")
        .alias("cnt_t"),
    )
    tot = bt.agg(
        F.sum("cnt_r").cast("bigint").alias("t_r"),
        F.sum("cnt_t").cast("bigint").alias("t_t"),
    )
    w = bt.crossJoin(F.broadcast(tot)).select(
        "bucket",
        F.floor(
            (
                F.col("cnt_t").cast("double") / F.col("t_t").cast("double")
                - F.col("cnt_r").cast("double") / F.col("t_r").cast("double")
            )
            * 1000000
        )
        .cast("bigint")
        .alias("w_ppm"),
    )
    return (
        db.join(F.broadcast(w), "bucket")
        .groupBy("doc_id", "lang")
        .agg(F.sum(F.col("c") * F.col("w_ppm")).cast("bigint").alias("score_ppm"))
        .orderBy(F.col("score_ppm").desc(), "doc_id")
        .limit(_Q187_TOP_K)
    )


# ---------------------------------------------------------------------------
# q193 — k-anonymity audit (privacy gate over quasi-identifiers)
# ---------------------------------------------------------------------------

_Q193_K = 5
_Q193_BAND = 500  # chars per length band (quasi-identifier coarsening)


@register(
    "q193_k_anonymity",
    oracle=f"""
    WITH g AS (
      SELECT lang, source, CAST(n_chars // {_Q193_BAND} AS BIGINT) AS band,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM documents GROUP BY lang, source, band
    )
    SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS n_groups,
           CAST(SUM(CASE WHEN n < {_Q193_K} THEN 1 ELSE 0 END) AS BIGINT)
             AS n_small_groups,
           CAST(SUM(CASE WHEN n < {_Q193_K} THEN n ELSE 0 END) AS BIGINT)
             AS n_docs_at_risk,
           CAST(FLOOR(CAST(SUM(CASE WHEN n < {_Q193_K} THEN n ELSE 0 END)
                           AS DOUBLE)
                      / CAST(SUM(n) AS DOUBLE) * 1000000) AS BIGINT)
             AS risk_ppm
    FROM g GROUP BY lang ORDER BY lang
    """,
    doc="k-anonymity audit — the privacy gate a release pipeline runs "
    "before publishing a corpus (Sweeney 2002, public): group "
    "documents by their quasi-identifier tuple (lang, source, "
    f"{_Q193_BAND}-char length band), flag groups smaller than "
    f"k={_Q193_K} (a document alone in its quasi-identifier cell is "
    "re-identifiable), and report per-language group counts, at-risk "
    "document counts, and the integer-ppm suppression rate a "
    "k-anonymous release would need. Complements q81's PII redaction "
    "(masking direct identifiers does not fix quasi-identifier "
    "uniqueness). Scale shape: two partial-agg'd rollups — the "
    "quasi-identifier groupBy shuffles only (lang, source, band) "
    "tallies, never documents; all integer arithmetic plus one final "
    "IEEE divide/floor, bit-identical cross-engine.",
)
def q193(spark: SparkSession, sf: str) -> DataFrame:
    g = (
        load(spark, sf, "documents")
        .select(
            "lang",
            "source",
            F.floor(F.col("n_chars") / _Q193_BAND)
            .cast("bigint")
            .alias("band"),
        )
        .groupBy("lang", "source", "band")
        .agg(F.count("*").cast("bigint").alias("n"))
    )
    small = F.col("n") < _Q193_K
    return (
        g.groupBy("lang")
        .agg(
            F.count("*").cast("bigint").alias("n_groups"),
            F.sum(F.when(small, 1).otherwise(0))
            .cast("bigint")
            .alias("n_small_groups"),
            F.sum(F.when(small, F.col("n")).otherwise(0))
            .cast("bigint")
            .alias("n_docs_at_risk"),
            F.floor(
                F.sum(F.when(small, F.col("n")).otherwise(0)).cast("double")
                / F.sum("n").cast("double")
                * 1000000
            )
            .cast("bigint")
            .alias("risk_ppm"),
        )
        .orderBy("lang")
    )
