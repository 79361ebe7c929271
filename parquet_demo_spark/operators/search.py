"""Inverted-index text retrieval: posting lists, conjunctive and phrase
search, tf-idf ranking (SURVEY §2B S25/S26 adjacent — the retrieval side
of the text stack).

A training-data pipeline needs keyword retrieval at corpus scale:
contamination probes ("which documents contain this benchmark's
phrase?"), targeted curation ("every doc mentioning X and Y"), and
ranked audit samples. Scanning 100 TB of text per probe is the wrong
plan; the classic answer (public design — Lucene/ES segments,
Spark-built offline indexes) is an inverted index: one row per
(term, doc) with the term's positions, stored bucketed BY TERM HASH so
a query for k terms opens only the k buckets holding their postings —
partition pruning does for text search what PK-bucket pruning does for
the merge store's point reads.

Tokenization is the engine-wide ``functions.tokens`` ([a-z]+ runs of
``lower(text)``), so index-based results are oracle-checkable against
DuckDB recomputing the same tokens per document.

Scale posture:
- Build: one posexplode + groupBy(term, doc) — a single shuffle of the
  token stream, the same cost class as the TF-IDF/Zipf queries; write
  is partition-parallel parquet partitioned by term bucket.
- Query: terms → bucket ids (pure hash, no lookup); postings read is
  O(matching buckets); the candidate set (doc ids) is then a
  broadcast-sized join back to the corpus for display columns. Nothing
  rescans the text.
- Incremental maintenance: postings are keyed (term, doc_id) — exactly
  a ParquetMergeStore PK — so a corpus delta upserts its postings
  without rebuilding the index (tested in tests/test_search.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from parquet_demo_spark.catalog import load
from parquet_demo_spark.functions import (
    chunk_starts,
    chunk_starts_sql,
    chunk_text,
    chunk_text_sql,
    poly_hash,
    poly_hash_sql,
    tokens,
)
from parquet_demo_spark.registry import register, register_phases

_DEFAULT_BUCKETS = 1024


def _stored_index_build(spark: SparkSession, sf: str):
    """Shared bench build phase for the search queries: materialize the
    inverted index in its PRODUCTION form — parquet partitioned by term
    bucket — so the timed read phase is the deployed path (bucket-dir
    pruning included), not an in-plan index recompute."""
    import os
    import tempfile

    docs = load(spark, sf, "documents")
    base = os.path.join(
        tempfile.gettempdir(),
        "spark_graft_searchidx",
        f"{sf.strip('/').replace('/', '_')}_pid{os.getpid()}",
    )
    pdir = os.path.join(base, "postings")
    ddir = os.path.join(base, "dl")
    marker = os.path.join(base, "_READY")
    if not os.path.exists(marker):
        write_index(inverted_index(docs), pdir)
        # doc lengths stored WITH the index (Lucene's norms file):
        # BM25 must never scan the full postings at query time
        doc_lengths(spark.read.parquet(pdir)).write.mode(
            "overwrite"
        ).parquet(ddir)
        open(marker, "w").close()
    n_docs = docs.count()
    return pdir, ddir, n_docs


def inverted_index(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_buckets: int = _DEFAULT_BUCKETS,
) -> DataFrame:
    """Posting lists: (term, doc_id, tf, positions, bucket).

    ``positions`` are indices into the doc's token array (sorted), so
    adjacency queries (phrases) are position arithmetic, never a text
    rescan. ``bucket = pmod(hash(term), B)`` is the storage key: a
    stored index partitioned by it serves a k-term query from k bucket
    dirs.
    """
    toks = docs.select(
        F.col(id_col),
        F.posexplode(tokens(text_col)).alias("pos", "term"),
    ).filter(F.col("term") != "")
    return (
        toks.groupBy("term", id_col)
        .agg(
            F.count("*").cast("bigint").alias("tf"),
            F.sort_array(F.collect_list("pos")).alias("positions"),
        )
        .withColumn(
            "bucket", F.pmod(F.hash(F.col("term")), F.lit(num_buckets))
        )
    )


def write_index(index: DataFrame, path: str) -> None:
    """Persist postings partitioned by term bucket (the pruning key)."""
    index.write.mode("overwrite").partitionBy("bucket").parquet(path)


def search_all_terms(
    index: DataFrame, terms: list[str], id_col: str = "doc_id"
) -> DataFrame:
    """Conjunctive (AND) search: docs containing EVERY query term.

    Returns (doc_id, tf_total). The postings filter is
    ``term IN (...)`` — on a stored index this is partition pruning to
    the terms' buckets plus a pushed-down dictionary filter; the
    surviving postings (k terms × their docs) group per doc and keep
    docs matching all k. No step touches the corpus text.
    """
    k = len(set(terms))
    return (
        index.filter(F.col("term").isin(list(terms)))
        .groupBy(id_col)
        .agg(
            F.countDistinct("term").alias("__nt"),
            F.sum("tf").cast("bigint").alias("tf_total"),
        )
        .filter(F.col("__nt") == k)
        .drop("__nt")
    )


def search_phrase(
    index: DataFrame, first: str, second: str, id_col: str = "doc_id"
) -> DataFrame:
    """Exact bigram search: docs where ``second`` immediately follows
    ``first`` in token order; returns (doc_id, n_occ).

    Position arithmetic on the two terms' postings — occurrences are
    the first-term positions whose successor index appears in the
    second term's positions. Longer phrases chain the same join; cost
    is the two posting lists, never the corpus.
    """
    if first == second:
        raise ValueError("phrase terms must differ (self-bigram ambiguous)")
    a = index.filter(F.col("term") == first).select(
        F.col(id_col), F.col("positions").alias("__pa")
    )
    b = index.filter(F.col("term") == second).select(
        F.col(id_col), F.col("positions").alias("__pb")
    )
    return (
        a.join(b, id_col)
        .select(
            F.col(id_col),
            F.size(
                F.filter(
                    F.col("__pa"),
                    lambda p: F.array_contains(F.col("__pb"), p + 1),
                )
            )
            .cast("bigint")
            .alias("n_occ"),
        )
        .filter(F.col("n_occ") > 0)
    )


def search_ranked_tfidf(
    index: DataFrame,
    n_docs: int,
    terms: list[str],
    top_k: int = 20,
    id_col: str = "doc_id",
) -> DataFrame:
    """Disjunctive (OR) search ranked by tf·idf, top-k docs.

    idf = ln(N/df) with df from the postings themselves; the per-term
    contribution rounds to 6 decimals and accumulates in decimal so
    the score — and therefore the top-k cut — is deterministic across
    engines (the q104 convention). Ranking ties break by doc id.
    """
    hits = index.filter(F.col("term").isin(list(terms)))
    df_per_term = hits.groupBy("term").agg(
        F.countDistinct(id_col).alias("__df")
    )
    scored = (
        hits.join(F.broadcast(df_per_term), "term")
        .select(
            F.col(id_col),
            F.round(
                F.col("tf")
                * F.log(F.lit(float(n_docs)) / F.col("__df")),
                6,
            ).alias("__contrib"),
        )
        .groupBy(id_col)
        .agg(
            F.sum(F.col("__contrib").cast("decimal(18,9)"))
            .cast("double")
            .alias("score")
        )
    )
    # top-k as orderBy().limit(): plans TakeOrderedAndProject —
    # per-partition heaps + a driver merge of k rows — instead of
    # funneling every scored doc through one task's global window.
    # Identical total order (score desc, id asc) → identical rows.
    return scored.orderBy(F.col("score").desc(), F.col(id_col)).limit(
        top_k
    )


_TOKS = "string_split_regex(lower(text), '[^a-z]+')"


@register(
    "q144_keyword_search_and",
    oracle=f"""
    WITH m AS (
      SELECT doc_id, n_chars,
             len(list_filter({_TOKS}, x -> x = 'dup')) AS tf1,
             len(list_filter({_TOKS}, x -> x = 'scan')) AS tf2,
             len(list_filter({_TOKS}, x -> x = 'merge')) AS tf3
      FROM documents)
    SELECT CAST(doc_id AS BIGINT) AS doc_id,
           CAST(n_chars AS BIGINT) AS n_chars,
           CAST(tf1 + tf2 + tf3 AS BIGINT) AS tf_total
    FROM m WHERE tf1 > 0 AND tf2 > 0 AND tf3 > 0
    ORDER BY doc_id
    """,
    doc="Conjunctive keyword search THROUGH the inverted index: "
    "postings (term, doc_id, tf, positions) built once from the "
    "corpus, then docs containing all of {dup, scan, merge} resolved "
    "from postings alone — term-IN filter, group per doc, keep "
    "count==3 — and joined back to the corpus only for display "
    "columns. The oracle recomputes per-doc term counts directly from "
    "the text, so the hash check proves the index is a lossless "
    "representation of term membership and tf. Scale: a stored index "
    "is partitioned by hash(term); this query opens 3 posting buckets "
    "of a 100 TB corpus's index, never the text.",
)
def q144(spark: SparkSession, sf: str) -> DataFrame:
    docs = load(spark, sf, "documents")
    idx = inverted_index(docs)
    hits = search_all_terms(idx, ["dup", "scan", "merge"])
    return (
        hits.join(docs.select("doc_id", "n_chars"), "doc_id")
        .select(
            F.col("doc_id").cast("bigint").alias("doc_id"),
            F.col("n_chars").cast("bigint").alias("n_chars"),
            F.col("tf_total"),
        )
        .orderBy("doc_id")
    )


@register(
    "q145_phrase_search",
    oracle=r"""
    SELECT CAST(doc_id AS BIGINT) AS doc_id,
           CAST(n_occ AS BIGINT) AS n_occ
    FROM (
      SELECT doc_id,
             len(regexp_extract_all(
               regexp_replace(lower(text), '[^a-z]+', ' ', 'g'),
               '\bkey value\b')) AS n_occ
      FROM documents)
    WHERE n_occ > 0
    ORDER BY doc_id
    """,
    doc="Exact-phrase (bigram) search via posting-list position "
    "arithmetic: occurrences of 'key value' are the positions p in "
    "'key''s postings with p+1 in 'value''s postings — two posting "
    "rows per doc, zero text rescans. The oracle counts the same "
    "bigram by regex over the space-normalized text (token adjacency "
    "== single-space adjacency after [^a-z]+ → ' '), so the hash "
    "check proves the positions arrays encode true token order. This "
    "is the contamination-probe shape: 'which training docs contain "
    "this benchmark phrase?' answered from the index of a 100 TB "
    "corpus by opening two term buckets.",
)
def q145(spark: SparkSession, sf: str) -> DataFrame:
    docs = load(spark, sf, "documents")
    idx = inverted_index(docs)
    return (
        search_phrase(idx, "key", "value")
        .select(
            F.col("doc_id").cast("bigint").alias("doc_id"),
            F.col("n_occ"),
        )
        .orderBy("doc_id")
    )


@register(
    "q146_ranked_search_tfidf",
    oracle=f"""
    WITH tf AS (
      SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf
      FROM (
        SELECT doc_id, unnest({_TOKS}) AS term FROM documents)
      WHERE term IN ('dup', 'vector', 'stream')
      GROUP BY doc_id, term),
    idf AS (
      SELECT term, COUNT(DISTINCT doc_id) AS df FROM tf GROUP BY term),
    n AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs FROM documents),
    scored AS (
      SELECT tf.doc_id,
             CAST(SUM(CAST(ROUND(tf.tf * ln(n.n_docs / idf.df), 6)
                           AS DECIMAL(18,9))) AS DOUBLE) AS score
      FROM tf, idf, n WHERE tf.term = idf.term
      GROUP BY tf.doc_id)
    SELECT CAST(doc_id AS BIGINT) AS doc_id, score
    FROM (
      SELECT doc_id, score,
             ROW_NUMBER() OVER (ORDER BY score DESC, doc_id) AS r
      FROM scored)
    WHERE r <= 20
    ORDER BY doc_id
    """,
    doc="Ranked (OR) retrieval from the inverted index: docs scored "
    "sum(tf × ln(N/df)) over query terms {dup, vector, stream}, "
    "top-20 by (score, doc_id). df comes from the postings themselves "
    "(no corpus pass); per-term contributions round to 6 decimals and "
    "accumulate in decimal so the cut is engine-deterministic (q104 "
    "convention). The rare term 'dup' (df≈5%) dominating the common "
    "ones is the idf sanity check baked into the hash. Scale: "
    "postings for 3 terms + a broadcast df table; the window ranks "
    "only scored docs (candidate set), not the corpus.",
)
def q146(spark: SparkSession, sf: str) -> DataFrame:
    docs = load(spark, sf, "documents")
    idx = inverted_index(docs)
    n_docs = docs.count()
    return (
        search_ranked_tfidf(idx, n_docs, ["dup", "vector", "stream"])
        .select(F.col("doc_id").cast("bigint").alias("doc_id"), "score")
        .orderBy("doc_id")
    )


def doc_lengths(index: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Per-doc token counts (sum of tf) — the BM25 side table. Compute
    ONCE at index-build time and store it next to the postings (what
    Lucene's norms file is); recomputing it per query would make every
    BM25 query scan the whole index."""
    return index.groupBy(id_col).agg(
        F.sum("tf").cast("bigint").alias("dl")
    )


def search_ranked_bm25(
    index: DataFrame,
    n_docs: int,
    terms: list[str],
    k1: float = 1.2,
    b: float = 0.75,
    top_k: int = 20,
    id_col: str = "doc_id",
    dl: DataFrame | None = None,
) -> DataFrame:
    """Okapi BM25 ranked retrieval, top-k docs (Robertson et al. —
    public design; k1=1.2, b=0.75 are the standard defaults).

    score(D) = sum_t idf(t) * tf * (k1+1) / (tf + k1*(1-b + b*|D|/avgdl))
    with the Lucene-smoothed idf(t) = ln((N-df+0.5)/(df+0.5) + 1).

    The doc-length table |D| is ONE small aggregate over the postings
    (sum of tf per doc — no corpus pass), broadcast back onto the query
    terms' postings; pass a precomputed ``dl`` (from
    :func:`doc_lengths`, stored at index-build time) so the query never
    scans the full index — without it this falls back to computing the
    table in-plan (fine for one-shot use, wrong at 100 TB). avgdl is
    the exact bigint token total divided once (engine-deterministic).
    Per-term contributions round to 6 decimals and accumulate in
    decimal (the q146/q104 convention) so the top-k cut is stable
    across engines. Ties break by doc id.
    """
    if n_docs <= 0:
        # an empty corpus has no average doc length; the well-defined
        # answer is "no hits", not a ZeroDivisionError at plan build
        return (
            index.select(
                F.col(id_col),
                F.lit(0.0).alias("score"),
            ).limit(0)
        )
    if dl is None:
        dl = doc_lengths(index, id_col)
    dl = dl.select(F.col(id_col), F.col("dl").alias("__dl"))
    total_tokens = dl.agg(F.sum("__dl").cast("bigint")).first()[0] or 0
    avgdl = total_tokens / n_docs  # exact ints, one IEEE division
    hits = index.filter(F.col("term").isin(list(terms)))
    df_per_term = hits.groupBy("term").agg(
        F.countDistinct(id_col).alias("__df")
    )
    idf = F.log(
        (F.lit(float(n_docs)) - F.col("__df") + F.lit(0.5))
        / (F.col("__df") + F.lit(0.5))
        + F.lit(1.0)
    )
    denom = F.col("tf") + F.lit(k1) * (
        F.lit(1.0 - b)
        + F.lit(b) * (F.col("__dl").cast("double") / F.lit(avgdl))
    )
    scored = (
        hits.join(F.broadcast(df_per_term), "term")
        # no broadcast hint on dl: at scale the doc-length table is the
        # BIG side (one row per corpus doc) and the matched postings are
        # the small one — AQE picks the right build side per run
        .join(dl, id_col)
        .select(
            F.col(id_col),
            F.round(
                idf * (F.col("tf") * F.lit(k1 + 1.0)) / denom, 6
            ).alias("__contrib"),
        )
        .groupBy(id_col)
        .agg(
            F.sum(F.col("__contrib").cast("decimal(18,9)"))
            .cast("double")
            .alias("score")
        )
    )
    # TakeOrderedAndProject top-k (see search_ranked_tfidf): same
    # total order as a global row_number cut, no single-task window.
    return scored.orderBy(F.col("score").desc(), F.col(id_col)).limit(
        top_k
    )


@register(
    "q152_ranked_search_bm25",
    oracle=f"""
    WITH dls AS (
      SELECT doc_id,
             CAST(len(list_filter({_TOKS}, x -> x <> '')) AS BIGINT) AS dl
      FROM documents),
    n AS (
      SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs,
             CAST(SUM(dl) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS avgdl
      FROM dls),
    tf AS (
      SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf
      FROM (
        SELECT doc_id, unnest({_TOKS}) AS term FROM documents)
      WHERE term IN ('dup', 'vector', 'stream')
      GROUP BY doc_id, term),
    idf AS (
      SELECT term, COUNT(DISTINCT doc_id) AS df FROM tf GROUP BY term),
    scored AS (
      SELECT tf.doc_id,
             CAST(SUM(CAST(ROUND(
               ln((n.n_docs - idf.df + 0.5) / (idf.df + 0.5) + 1.0)
               * (tf.tf * CAST(2.2 AS DOUBLE))
               / (tf.tf + CAST(1.2 AS DOUBLE)
                  * (CAST(0.25 AS DOUBLE) + CAST(0.75 AS DOUBLE)
                     * (dls.dl / n.avgdl))), 6)
               AS DECIMAL(18,9))) AS DOUBLE) AS score
      FROM tf, idf, n, dls
      WHERE tf.term = idf.term AND tf.doc_id = dls.doc_id
      GROUP BY tf.doc_id)
    SELECT CAST(doc_id AS BIGINT) AS doc_id, score
    FROM (
      SELECT doc_id, score,
             ROW_NUMBER() OVER (ORDER BY score DESC, doc_id) AS r
      FROM scored)
    WHERE r <= 20
    ORDER BY doc_id
    """,
    doc="BM25 ranked retrieval from the inverted index (VERDICT r6 #5 — "
    "Robertson/Okapi k1=1.2, b=0.75, Lucene-smoothed idf): what a real "
    "retrieval stack runs where q146's tf-idf is the teaching baseline. "
    "Doc lengths are one small postings aggregate (sum of tf per doc — "
    "no corpus pass) broadcast onto the query terms' postings; avgdl "
    "is the exact bigint token total divided once, so both engines "
    "compute the identical double. Per-term contributions follow the "
    "q146 determinism recipe (round 6, decimal accumulate, ties by "
    "doc_id). The same query terms as q146 {dup, vector, stream} keep "
    "the rare-term ('dup') dominance sanity baked into the hash, now "
    "with BM25's tf saturation and length normalization — a long doc "
    "stuffed with 'stream' ranks BELOW a short focused one, which is "
    "the behavioral delta vs q146 the top-20 cut encodes. Scale: "
    "3 posting buckets + two broadcast-sized side tables; the window "
    "ranks only the candidate set.",
)
def q152(spark: SparkSession, sf: str) -> DataFrame:
    docs = load(spark, sf, "documents")
    idx = inverted_index(docs)
    n_docs = docs.count()
    return (
        search_ranked_bm25(idx, n_docs, ["dup", "vector", "stream"])
        .select(F.col("doc_id").cast("bigint").alias("doc_id"), "score")
        .orderBy("doc_id")
    )


# --- bench build/read phase splits (VERDICT r6 #1) --------------------------
# The monolithic registry fns above recompute the index in-plan (what the
# driver hash-checks); the phased pair reads the STORED index — same
# values, and the timed path is the one a deployment actually runs.


def _q144_read(spark: SparkSession, sf: str, state) -> DataFrame:
    path, _, _ = state
    idx = spark.read.parquet(path)
    docs = load(spark, sf, "documents")
    hits = search_all_terms(idx, ["dup", "scan", "merge"])
    return (
        hits.join(docs.select("doc_id", "n_chars"), "doc_id")
        .select(
            F.col("doc_id").cast("bigint").alias("doc_id"),
            F.col("n_chars").cast("bigint").alias("n_chars"),
            F.col("tf_total"),
        )
        .orderBy("doc_id")
    )


def _q145_read(spark: SparkSession, sf: str, state) -> DataFrame:
    path, _, _ = state
    idx = spark.read.parquet(path)
    return (
        search_phrase(idx, "key", "value")
        .select(
            F.col("doc_id").cast("bigint").alias("doc_id"),
            F.col("n_occ"),
        )
        .orderBy("doc_id")
    )


def _q146_read(spark: SparkSession, sf: str, state) -> DataFrame:
    path, _, n_docs = state
    idx = spark.read.parquet(path)
    return (
        search_ranked_tfidf(idx, n_docs, ["dup", "vector", "stream"])
        .select(F.col("doc_id").cast("bigint").alias("doc_id"), "score")
        .orderBy("doc_id")
    )


def _q152_read(spark: SparkSession, sf: str, state) -> DataFrame:
    path, dl_path, n_docs = state
    idx = spark.read.parquet(path)
    dl = spark.read.parquet(dl_path)
    return (
        search_ranked_bm25(idx, n_docs, ["dup", "vector", "stream"], dl=dl)
        .select(F.col("doc_id").cast("bigint").alias("doc_id"), "score")
        .orderBy("doc_id")
    )


register_phases("q144_keyword_search_and", _stored_index_build, _q144_read)
register_phases("q145_phrase_search", _stored_index_build, _q145_read)
register_phases("q146_ranked_search_tfidf", _stored_index_build, _q146_read)
register_phases("q152_ranked_search_bm25", _stored_index_build, _q152_read)


def index_batch_applier(spark: SparkSession, store):
    """The q155 foreachBatch applier, factored out of
    :func:`stream_maintain_index` so scale checks can time the REAL
    per-batch path (admission probe + tokenize + tombstones + one
    atomic merge + watermark commit) without driving a stream. Batch
    rows: (doc_id, text, edit_ts).

    ``store`` may be a :class:`MergeOnReadStore` (q182): admission,
    tokenization, and stale-key derivation are identical, but the
    commit is a single O(batch) ``commit_delta`` — fresh postings as
    upserts, stale keys as 'd' tombstone ops — instead of the COW
    bucket rewrite, so the per-batch cost stays flat at any index
    size (BASELINE 'MOR vs COW'). The watermark side store stays COW:
    it is doc_id-keyed and one-row-per-doc, so its batches prune to
    their own few buckets. Store polymorphism rides the shared
    has_data/table_columns facade + commit_upserts_and_tombstones —
    no isinstance branching here."""
    from parquet_demo_spark.sources.merge_store import admission_watermarks
    from parquet_demo_spark.sources.mor_store import (
        commit_upserts_and_tombstones,
    )

    wm = admission_watermarks(store, keys=("doc_id",))

    def _apply_batch(batch_df: DataFrame, epoch_id: int) -> None:
        from parquet_demo_spark.tuning import store_plan_scope

        # one size decision for the whole batch: a sub-threshold
        # (index + watermark + batch) runs the admission probe, the
        # tokenize, and both commits under the minimal plan (tuning.py)
        with store_plan_scope(spark, (store.root, wm.root), batch_df):
            _apply_batch_scoped(batch_df)

    def _apply_batch_scoped(batch_df: DataFrame) -> None:
        # no standalone batch-emptiness probe: ``winners.isEmpty()``
        # below subsumes it (empty batch ⇒ empty winners), so the
        # common non-empty batch pays one admission action, not two
        # (r16 job census: the extra isEmpty was one of 13 jobs/batch)
        if wm.current_version() is None and store.has_data():
            # one-time migration: a pre-watermark (batch-built) index
            # seeds the side store from its own rows — the last full
            # scan this stream will ever do
            wm.merge(
                store.read(spark)
                .groupBy("doc_id")
                .agg(
                    F.max("edit_ts").alias("edit_ts"),
                    F.collect_set("term").alias("terms"),
                )
            )
        w = Window.partitionBy("doc_id").orderBy(F.col("edit_ts").desc())
        latest = (
            batch_df.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .drop("__rn")
            # computed ONCE: the probe's bucket collect and the winners
            # materialization below both consume the window dedup —
            # without this checkpoint each re-ran it over the raw batch
            .localCheckpoint(eager=False)
        )
        prior_terms = None
        if wm.current_version() is not None:
            probe = wm.probe(spark, latest.select("doc_id")).select(
                "doc_id",
                F.col("edit_ts").alias("__cur_ts"),
                F.col("terms").alias("__cur_terms"),
            )
            latest = (
                latest.join(probe, "doc_id", "left")
                .filter(
                    F.col("__cur_ts").isNull()
                    | (F.col("edit_ts") > F.col("__cur_ts"))
                )
                .drop("__cur_ts")
            )
            prior_terms = "__cur_terms"
        winners = latest.localCheckpoint(eager=False)  # read twice below
        if winners.isEmpty():
            return
        # materialize the postings ONCE: they feed the stale anti-join,
        # the merge source, and the watermark term sets — three
        # consumers that would each re-tokenize the batch otherwise
        fresh = (
            inverted_index(winners.select("doc_id", "text", "edit_ts"))
            .drop("bucket")
            .join(winners.select("doc_id", "edit_ts"), "doc_id")
            .localCheckpoint(eager=False)
        )
        if not store.has_data():
            # an all-tokenless first batch produces no postings; merging
            # it would commit a zero-bucket v0 (no file to derive a
            # schema from on later reads) — skip, the watermark below
            # still records the edits
            if not fresh.isEmpty():
                store.merge(fresh)
        else:
            # ONE atomic commit per batch: stale keys ride along as
            # tombstone rows (NULL tf — a real posting's tf is always
            # >= 1) and a matched-delete clause drops them, so a crash
            # can never leave a doc's postings half-replaced. The
            # stale set comes from the probed term sets, NOT an index
            # scan: stored keys = explode(winner's recorded terms),
            # minus the fresh tokenization's keys.
            stored_keys = winners.select(
                "doc_id",
                F.explode(
                    F.coalesce(
                        F.col(prior_terms)
                        if prior_terms
                        else F.lit(None).cast("array<string>"),
                        F.array().cast("array<string>"),
                    )
                ).alias("term"),
            )
            stale = stored_keys.join(
                fresh.select("term", "doc_id"),
                ["term", "doc_id"],
                "left_anti",
            )
            cols = store.table_columns()
            types = {f.name: f.dataType for f in fresh.schema.fields}
            tombstones = stale.select(
                *[
                    F.col(c)
                    if c in ("term", "doc_id")
                    else F.lit(None).cast(types[c]).alias(c)
                    for c in cols
                ]
            )
            src = fresh.select(*cols).unionByName(tombstones)
            commit_upserts_and_tombstones(store, src, "tf")
        # watermark commit LAST (crash ⇒ replay ⇒ idempotent re-apply):
        # per winner, the applied edit_ts + its indexed term set
        # (empty array for docs tokenized to nothing — the row itself
        # is the surviving watermark)
        new_terms = (
            winners.select("doc_id").join(
                fresh.groupBy("doc_id").agg(
                    F.collect_set("term").alias("terms")
                ),
                "doc_id",
                "left",
            )
        ).select(
            "doc_id",
            F.coalesce(
                F.col("terms"), F.array().cast("array<string>")
            ).alias("terms"),
        )
        wm.merge(
            winners.select("doc_id", "edit_ts").join(
                new_terms, "doc_id"
            ),
            conditional=True,
        )

    return _apply_batch


def stream_maintain_index(
    spark: SparkSession,
    source_dir: str,
    schema,
    store,
    checkpoint: str,
    max_files_per_trigger: int = 1,
):
    """Streaming incremental index maintenance (VERDICT r6 #7): the
    q135 exactly-once-ingest pattern applied to the search index.

    ``readStream`` over a document source (rows: doc_id, text,
    edit_ts) → ``foreachBatch`` → postings upsert + stale-postings
    delete into a (term, doc_id)-keyed :class:`ParquetMergeStore`.
    Each micro-batch:

    1. collapses to the latest edit per doc WITHIN the batch, then
       drops docs whose stored postings already carry a NEWER edit_ts —
       doc-level last-write-wins, so out-of-order file arrival and
       foreachBatch's at-least-once redelivery both converge to the
       latest-edit index (the q135 exactly-once recipe, lifted from
       row-level to document-level because one edit replaces a SET of
       posting rows);
    2. deletes the winners' stale postings (stored (term, doc_id) keys
       the fresh tokenization no longer produces — covers terms removed
       by the edit AND docs edited to empty);
    3. merges the fresh postings (replacing rows for persisting terms).

    Admission AND stale-key discovery are o(index) (VERDICT r8 #4):
    the doc_id-keyed side store (``<root>_wm`` — see
    :func:`admission_watermarks`) holds, per doc, the last-applied
    ``edit_ts`` plus the doc's CURRENT indexed term set. Both
    questions a batch must answer — "is this edit newer than what's
    applied?" and "which stored (term, doc_id) keys does the new
    tokenization no longer produce?" — become one bucket-pruned probe
    with the batch's doc_ids, never a scan of the (term, doc_id)
    postings (whose composite key cannot prune a doc-only lookup).
    The watermark survives emptying: a doc edited to no terms keeps
    its row (terms = []), so a late stale edit after the emptying is
    still rejected.

    Cost per batch: the winners' postings, one probe of the
    one-row-per-doc side table, and a PK-bucket-pruned rewrite of
    touched postings buckets. A stream-maintained index over a 100 TB
    corpus pays for the day's edited docs, not a rebuild.
    """
    _apply_batch = index_batch_applier(spark, store)
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(source_dir)
        .writeStream.foreachBatch(_apply_batch)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


# shared by q155 (COW) and q182 (merge-on-read): both streams must
# converge to the SAME index — the oracle tokenizes each doc's winning
# edit only
_STREAM_IDX_ORACLE = f"""
    WITH winning AS (
      SELECT doc_id,
             CASE WHEN doc_id % 7 = 0 THEN substring(text, 1, 120)
                  WHEN doc_id % 11 = 0 THEN ''
                  ELSE text END AS text
      FROM documents
    ),
    postings AS (
      SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf
      FROM (
        SELECT doc_id, unnest({_TOKS}) AS term FROM winning)
      WHERE term <> ''
      GROUP BY doc_id, term
    )
    SELECT CAST(doc_id % 10 AS BIGINT) AS bucket,
           CAST(COUNT(*) AS BIGINT) AS n_postings,
           CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
           CAST(SUM(tf) AS BIGINT) AS sum_tf
    FROM postings GROUP BY 1 ORDER BY 1
    """


@register(
    "q155_stream_index_maintenance",
    oracle=_STREAM_IDX_ORACLE,
    doc="Streaming incremental index maintenance, hash-checked "
    "end-to-end (VERDICT r6 #7's optional registry row): three "
    "micro-batch files stream through readStream -> foreachBatch -> "
    "postings upsert + stale-postings delete into a (term, doc_id)-"
    "keyed merge store — batch 0 indexes every document (edit_ts=1), "
    "batch 1 re-edits every doc_id%%7 doc to its 120-char prefix "
    "(edit_ts=3), and batch 2 delivers LATE, OUT-OF-ORDER edits: a "
    "stale edit_ts=2 rewrite of the same %%7 docs (must NOT apply — "
    "doc-level last-write-wins) and an edit_ts=2 emptying of the %%11 "
    "docs (every posting must disappear). The returned per-bucket "
    "aggregate of the store's committed postings hash-checks against "
    "an oracle that tokenizes only each doc's WINNING edit — so the "
    "check covers micro-batch sequencing, doc-level LWW, stale-"
    "posting deletion, and emptied-doc removal in one row set. Scale: "
    "each batch costs its winners' postings (PK-bucket pruned "
    "rewrite), never the index; this is how a 100 TB corpus index "
    "follows the day's edits without a rebuild. "
    "operators/search.py stream_maintain_index.",
)
def q155(spark: SparkSession, sf: str) -> DataFrame:
    return _q155_read(spark, sf, _q155_build(spark, sf))


def _q155_build(spark: SparkSession, sf: str, tag: str = "q155"):
    """Build phase: the three deterministic edit-batch source files.

    ``tag`` keys the scratch root — q182 (the merge-on-read twin)
    builds the SAME batches under its own directory so the two
    queries' build/read phases can never wipe each other's stores."""
    import glob
    import os
    import shutil

    from pyspark.sql import types as T

    from parquet_demo_spark.operators.merge import _scratch_root

    docs = load(spark, sf, "documents").select("doc_id", "text")
    root = _scratch_root(tag, sf)
    src = os.path.join(root, "incoming")
    os.makedirs(src)
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
            T.StructField("edit_ts", T.LongType()),
        ]
    )
    b0 = docs.select(
        F.col("doc_id").cast("bigint"),
        "text",
        F.lit(1).cast("bigint").alias("edit_ts"),
    )
    b1 = (
        docs.filter(F.col("doc_id") % 7 == 0)
        .select(
            F.col("doc_id").cast("bigint"),
            F.substring("text", 1, 120).alias("text"),
            F.lit(3).cast("bigint").alias("edit_ts"),
        )
    )
    b2 = (
        docs.filter(F.col("doc_id") % 7 == 0)
        .select(
            F.col("doc_id").cast("bigint"),
            F.lit("stale edit placeholder").alias("text"),
            F.lit(2).cast("bigint").alias("edit_ts"),
        )
        .unionByName(
            docs.filter(
                (F.col("doc_id") % 11 == 0) & (F.col("doc_id") % 7 != 0)
            ).select(
                F.col("doc_id").cast("bigint"),
                F.lit("").alias("text"),
                F.lit(2).cast("bigint").alias("edit_ts"),
            )
        )
    )
    for i, b in enumerate((b0, b1, b2)):
        d = os.path.join(root, f"scratch{i}")
        b.coalesce(1).write.mode("overwrite").parquet(d)
        [part] = glob.glob(os.path.join(d, "part-*.parquet"))
        shutil.move(part, os.path.join(src, f"batch{i}.parquet"))
        shutil.rmtree(d)
    return root, src, schema


def _q155_read(spark: SparkSession, sf: str, state) -> DataFrame:
    """Operation under test: the maintenance stream into a fresh store,
    then the per-bucket postings aggregate."""
    from parquet_demo_spark.operators.merge import _fresh_dir
    from parquet_demo_spark.sources.merge_store import ParquetMergeStore

    root, src, schema = state
    store = ParquetMergeStore(
        _fresh_dir(root, "idx"),
        keys=("term", "doc_id"),
        version_cols=("edit_ts",),
        num_buckets=8,
    )
    q = stream_maintain_index(
        spark, src, schema, store, _fresh_dir(root, "ckpt")
    )
    q.awaitTermination()
    return (
        store.read(spark)
        .groupBy((F.col("doc_id") % 10).cast("bigint").alias("bucket"))
        .agg(
            F.count("*").cast("bigint").alias("n_postings"),
            F.countDistinct("doc_id").cast("bigint").alias("n_docs"),
            F.sum("tf").cast("bigint").alias("sum_tf"),
        )
        .orderBy("bucket")
    )


register_phases(
    "q155_stream_index_maintenance", _q155_build, _q155_read
)


@register(
    "q182_stream_index_mor",
    oracle=_STREAM_IDX_ORACLE,
    doc="q155's maintenance stream re-run against a MERGE-ON-READ "
    "store (sources/mor_store.py): the SAME three micro-batches — "
    "full index, prefix re-edits, late stale + emptying edits — "
    "through the same applier, but every commit is an O(batch) delta "
    "append (fresh postings as upserts, stale keys as 'd' tombstone "
    "ops) instead of a bucket rewrite; the resolved read must "
    "converge to byte-identical postings (the oracle is SHARED with "
    "q155). The read phase also compacts and re-aggregates from the "
    "pure base, so the hash covers overlay resolution AND the "
    "fold-then-truncate compaction in one row set. This is the "
    "100 TB maintenance shape: per-batch cost flat in index size "
    "(BASELINE 'MOR vs COW'), the rewrite amortized to the "
    "compaction cadence.",
)
def q182(spark: SparkSession, sf: str) -> DataFrame:
    return _q182_read(spark, sf, _q182_build(spark, sf))


def _q182_build(spark: SparkSession, sf: str):
    return _q155_build(spark, sf, tag="q182")


def _q182_read(spark: SparkSession, sf: str, state) -> DataFrame:
    """Operation under test: the maintenance stream into a fresh MOR
    store, the resolved per-bucket aggregate, compact, and the same
    aggregate from the pure base — both snapshots must agree (their
    union ANTI-joins to empty, leaving the resolved rows)."""
    from parquet_demo_spark.operators.merge import _fresh_dir
    from parquet_demo_spark.sources.mor_store import MergeOnReadStore

    root, src, schema = state
    store = MergeOnReadStore(
        _fresh_dir(root, "mor"),
        keys=("term", "doc_id"),
        version_cols=("edit_ts",),
        num_buckets=8,
    )
    q = stream_maintain_index(
        spark, src, schema, store, _fresh_dir(root, "mckpt")
    )
    q.awaitTermination()

    def _agg(df: DataFrame) -> DataFrame:
        return (
            df.groupBy(
                (F.col("doc_id") % 10).cast("bigint").alias("bucket")
            )
            .agg(
                F.count("*").cast("bigint").alias("n_postings"),
                F.countDistinct("doc_id").cast("bigint").alias("n_docs"),
                F.sum("tf").cast("bigint").alias("sum_tf"),
            )
        )

    resolved = _agg(store.read(spark)).localCheckpoint()
    store.compact(spark)
    compacted = _agg(store.base.read(spark))
    # exceptAll is symmetric-checked: any drift between the resolved
    # overlay and the compacted base leaves residue rows and breaks
    # the hash (row counts would differ from the oracle's)
    drift = resolved.exceptAll(compacted).unionAll(
        compacted.exceptAll(resolved)
    )
    return resolved.unionByName(drift).orderBy("bucket")


register_phases("q182_stream_index_mor", _q182_build, _q182_read)


# ---------------------------------------------------------------------------
# q188 — hashed-TF chunk retrieval (feature-hashing RAG, end to end)
# ---------------------------------------------------------------------------

# The chunk grid is functions.chunk_starts/chunk_text — the SAME grid
# q186 chunks with, so chunk ids (doc_id, start) are interchangeable
# between the chunker and retrieval by construction.
_Q188_DIMS = 1024  # feature-hashing dimensionality (hashing trick)
_Q188_QUERY = "window merge scan window"  # repeated token: tf=2 path
_Q188_TOP_K = 10


@register(
    "q188_hashed_tf_retrieval",
    oracle=f"""
    WITH ch AS (
      SELECT doc_id, u.s AS start,
             {chunk_text_sql("coalesce(text, '')", "u.s")} AS ctext
      FROM documents,
           {chunk_starts_sql("coalesce(text, '')")} AS u(s)
    ),
    ct0 AS (
      SELECT doc_id, start,
             unnest(string_split_regex(lower(ctext), '[^a-z]+')) AS token
      FROM ch
    ),
    cb AS (
      SELECT doc_id, start,
             {poly_hash_sql("token")} % {_Q188_DIMS} AS bucket,
             CAST(COUNT(*) AS BIGINT) AS c
      FROM ct0 WHERE token <> ''
      GROUP BY doc_id, start, bucket
    ),
    qt0 AS (
      SELECT unnest(string_split_regex(lower('{_Q188_QUERY}'),
                                       '[^a-z]+')) AS token
    ),
    qb AS (
      SELECT {poly_hash_sql("token")} % {_Q188_DIMS} AS bucket,
             CAST(COUNT(*) AS BIGINT) AS qc
      FROM qt0 WHERE token <> '' GROUP BY bucket
    ),
    qn AS (SELECT CAST(SUM(qc * qc) AS BIGINT) AS norm_q FROM qb),
    pc AS (
      SELECT cb.doc_id, cb.start,
             CAST(SUM(cb.c * cb.c) AS BIGINT) AS norm_c,
             CAST(SUM(cb.c * COALESCE(qb.qc, 0)) AS BIGINT) AS dot
      FROM cb LEFT JOIN qb USING (bucket)
      GROUP BY cb.doc_id, cb.start
    )
    SELECT pc.doc_id AS doc_id, CAST(pc.start AS BIGINT) AS start,
           pc.dot AS dot,
           CAST(FLOOR(CAST(pc.dot AS DOUBLE)
                      / sqrt(CAST(pc.norm_c * qn.norm_q AS DOUBLE))
                      * 1000000 + 0.5) AS BIGINT) AS cos_ppm
    FROM pc, qn WHERE pc.dot > 0
    ORDER BY cos_ppm DESC, doc_id, start LIMIT {_Q188_TOP_K}
    """,
    doc="Feature-hashing chunk retrieval — the embedding-free RAG "
    "pipeline end to end: q186's overlapping chunker (600/480, stable "
    "(doc_id, start) chunk ids) feeds a hashing-trick vectorizer "
    "(token -> poly_hash % 1024, the public Weinberger et al. 2009 "
    "recipe), and a literal query string is vectorized by the SAME "
    "featurization; chunks rank by cosine against the query. All "
    "counts and dot products are exact integers; the single cosine is "
    "one IEEE divide + sqrt quantized to integer ppm, so ranking and "
    "values reproduce bit-for-bit cross-engine. Scale shape: chunking "
    "+ featurization are MAP-SIDE (explode/substr/hash, whole-stage "
    "codegen); the query vector and its norm are metadata-sized and "
    "BROADCAST; the corpus shuffles only as partial-agg'd "
    "(chunk, bucket) tallies; the final cut is a TakeOrdered heap "
    "(plan-asserted) — no chunk x chunk or corpus-sized sort anywhere.",
)
def q188(spark: SparkSession, sf: str) -> DataFrame:
    docs = load(spark, sf, "documents").select(
        "doc_id", F.coalesce(F.col("text"), F.lit("")).alias("text")
    )
    chunks = docs.select(
        "doc_id",
        F.explode(chunk_starts("text")).alias("start"),
        "text",
    ).select(
        "doc_id",
        "start",
        chunk_text("text", F.col("start")).alias("ctext"),
    )
    cb = (
        chunks.select(
            "doc_id", "start", F.explode(tokens("ctext")).alias("token")
        )
        .filter(F.col("token") != "")
        .groupBy(
            "doc_id",
            "start",
            (poly_hash("token") % _Q188_DIMS).alias("bucket"),
        )
        .agg(F.count("*").cast("bigint").alias("c"))
    )
    qb = (
        spark.range(1)
        .select(F.explode(tokens(F.lit(_Q188_QUERY))).alias("token"))
        .filter(F.col("token") != "")
        .groupBy((poly_hash("token") % _Q188_DIMS).alias("bucket"))
        .agg(F.count("*").cast("bigint").alias("qc"))
    )
    qn = qb.agg(
        F.sum(F.col("qc") * F.col("qc")).cast("bigint").alias("norm_q")
    )
    pc = (
        cb.join(F.broadcast(qb), "bucket", "left")
        .groupBy("doc_id", "start")
        .agg(
            F.sum(F.col("c") * F.col("c")).cast("bigint").alias("norm_c"),
            F.sum(F.col("c") * F.coalesce(F.col("qc"), F.lit(0)))
            .cast("bigint")
            .alias("dot"),
        )
        .filter(F.col("dot") > 0)
    )
    return (
        pc.crossJoin(F.broadcast(qn))
        .select(
            "doc_id",
            F.col("start").cast("bigint").alias("start"),
            "dot",
            F.floor(
                F.col("dot").cast("double")
                / F.sqrt((F.col("norm_c") * F.col("norm_q")).cast("double"))
                * F.lit(1000000.0)
                + F.lit(0.5)
            )
            .cast("bigint")
            .alias("cos_ppm"),
        )
        .orderBy(F.col("cos_ppm").desc(), "doc_id", "start")
        .limit(_Q188_TOP_K)
    )
