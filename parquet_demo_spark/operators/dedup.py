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
    df_cut,
    df_cut_sql,
    dsum,
    poly_hash,
    poly_hash_sql,
    qround,
    tokens,
)
from parquet_demo_spark.registry import register, register_phases

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

# K=8 permutations h_i(x) = (a_i*x + b_i) mod P, banded 4 rows/band →
# 2 bands (collision probability ≈ J⁴ per band: tight enough that the
# fixture's shared vocabulary doesn't flood the buckets). Shingles are
# word BIGRAMS — the ~40-word fixture vocabulary makes unigram minhashes
# collide globally (measured: 3900-doc buckets → 30M pairs at sf0.1);
# bigrams give a ~1600-element shingle space and 20k candidates.
# Row schema: (i, a, b, band, w) with w = 131^(i mod 4), the weight that
# folds the band's 4 minhashes into one 63-bit signature.
_MINHASH_PARAMS = [
    (0, 7, 3, 0, 1),
    (1, 13, 17, 0, 131),
    (2, 31, 29, 0, 17161),
    (3, 101, 97, 0, 2248091),
    (4, 257, 251, 1, 1),
    (5, 1009, 1013, 1, 131),
    (6, 8191, 8209, 1, 17161),
    (7, 524287, 524309, 1, 2248091),
]

# the frozen family's band count: every doc with >=2 tokens emits
# exactly one signature row PER band (minhash_band_signatures), which is
# what lets streaming maintenance derive a winner's stale keys without
# reading the index (stream_maintain_dedup_index)
N_BANDS = len({bnd for _, _, _, bnd, _ in _MINHASH_PARAMS})

def _mh_exprs_sql() -> list[str]:
    return [
        f"MIN(({a} * h + {b}) % {HASH_MOD})" for _, a, b, _, _ in _MINHASH_PARAMS
    ]


def _sig_sql(band: int) -> str:
    terms = [
        f"mh{i} * {w}" for i, _, _, bnd, w in _MINHASH_PARAMS if bnd == band
    ]
    return " + ".join(terms)


def _minhash_cand_ctes(doc_where: str = "", src: str = "documents") -> str:
    """CTE chain ``toks → sh → dict → th → mh → bands → cand`` shared by
    the q43 count oracle, the q76 clustering oracle, and (with
    ``src='winning'``) the q166 stream-maintenance oracle."""
    return f"""
toks AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(text), '[^a-z]+'),
                     t -> t <> '') AS tk
  FROM {src} {doc_where}
),
sh AS (
  SELECT doc_id,
         unnest(list_distinct(list_transform(
           range(1, len(tk)), j -> tk[j] || '_' || tk[j+1]))) AS shingle
  FROM toks
),
dict AS (
  SELECT shingle, {poly_hash_sql('shingle')} AS h
  FROM (SELECT DISTINCT shingle FROM sh)
),
th AS (SELECT doc_id, h FROM sh JOIN dict USING (shingle)),
mh AS (
  SELECT doc_id,
         {', '.join(f'{e} AS mh{i}' for i, e in enumerate(_mh_exprs_sql()))}
  FROM th GROUP BY doc_id
),
bands AS (
  SELECT doc_id, 0 AS band, CAST({_sig_sql(0)} AS BIGINT) AS sig FROM mh
  UNION ALL
  SELECT doc_id, 1 AS band, CAST({_sig_sql(1)} AS BIGINT) AS sig FROM mh
),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bands a JOIN bands b
    ON a.band = b.band AND a.sig = b.sig AND a.doc_id < b.doc_id
)"""


_MINHASH_ORACLE = f"""
WITH {_minhash_cand_ctes()}
SELECT COUNT(*) AS n_candidate_pairs FROM cand
"""




@register(
    "q43_minhash_lsh",
    oracle=_MINHASH_ORACLE,
    doc="MinHash (K=8) + LSH banding (2 bands × 4 rows) over word-bigram "
    "shingles: near-dup candidate pair count. All 8 minhashes are "
    "columns of ONE groupBy (no ×K row explosion); pairs only form "
    "inside band buckets, never via all-pairs comparison.",
)
def q43(spark: SparkSession, sf: str) -> DataFrame:
    docs = load(spark, sf, "documents")
    cand = minhash_candidate_pairs(docs)
    return cand.agg(F.count("*").alias("n_candidate_pairs"))


def minhash_candidate_pairs(docs: DataFrame) -> DataFrame:
    """docs(doc_id, text) → distinct candidate pairs (doc_a < doc_b)."""
    return band_candidate_pairs(minhash_band_signatures(docs))


def minhash_band_signatures(docs: DataFrame) -> DataFrame:
    """docs(doc_id, text) → (doc_id, band, sig): the LSH banding state.

    Factored out of :func:`minhash_candidate_pairs` so streaming
    maintenance (q166) encodes micro-batches with the SAME frozen hash
    family — stream-maintained band rows are bit-identical to a batch
    rebuild over the same winning edits. Docs with fewer than two
    tokens produce no shingles and therefore no band rows (an emptied
    doc drops out of the index entirely).
    """
    # Bind the token array to a column BEFORE referencing it inside the
    # shingle lambda: an unbound expression is re-evaluated on every
    # element_at call → O(tokens²) per doc (measured 15× slower).
    base = docs.select(
        "doc_id", F.filter(tokens("text"), lambda t: t != "").alias("tk")
    )
    # < 2 tokens ⇒ no bigram shingles; filtering BEFORE the transform
    # also keeps sequence(1, size-1) ascending — Spark's sequence runs
    # DESCENDING when start > stop, so an empty token array would
    # otherwise drive element_at out of bounds (hit by q166's
    # edited-to-empty documents; plain corpora never produce it)
    base = base.filter(F.size("tk") >= 2)
    tk = F.col("tk")
    # distinct bigram shingles per doc, built inside the row (no shuffle)
    shingles = F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), F.size(tk) - 1),
            lambda j: F.concat(
                F.element_at(tk, j), F.lit("_"), F.element_at(tk, j + 1)
            ),
        )
    )
    sh = base.select("doc_id", F.explode(shingles).alias("shingle"))
    th = sh.select("doc_id", poly_hash("shingle").alias("h"))
    # all K minhashes as columns of a single aggregation (no ×K rows)
    mh = th.groupBy("doc_id").agg(
        *[
            F.min((F.lit(a) * F.col("h") + F.lit(b)) % HASH_MOD).alias(f"mh{i}")
            for i, a, b, _, _ in _MINHASH_PARAMS
        ]
    )

    def sig(band: int):
        terms = [
            F.col(f"mh{i}") * F.lit(w)
            for i, _, _, bnd, w in _MINHASH_PARAMS
            if bnd == band
        ]
        out = terms[0]
        for t in terms[1:]:
            out = out + t
        return out.cast("bigint")

    return mh.select(
        "doc_id", F.lit(0).cast("bigint").alias("band"), sig(0).alias("sig")
    ).unionAll(
        mh.select(
            "doc_id", F.lit(1).cast("bigint").alias("band"), sig(1).alias("sig")
        )
    )


def band_candidate_pairs(bands: DataFrame) -> DataFrame:
    """(doc_id, band, sig) → distinct candidate pairs (doc_a < doc_b).

    Pairs only form inside a (band, sig) bucket — the equi-join keys —
    never via all-pairs comparison, so cost tracks bucket sizes."""
    a = bands.alias("a")
    b = bands.alias("b")
    return (
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


def load_params(spark: SparkSession, rows, schema: str) -> DataFrame:
    return spark.createDataFrame(rows, schema)


# ---------------------------------------------------------------------------
# SimHash (charter)
# ---------------------------------------------------------------------------

def _simhash_fp_sql(doc_bound: int) -> str:
    """Fingerprint CTE block shared by the q44 and q96 oracles."""
    return f"""
WITH tok AS (
  SELECT DISTINCT doc_id, token FROM (
    SELECT doc_id,
           unnest(string_split_regex(lower(text), '[^a-z]+')) AS token
    FROM documents WHERE doc_id < {doc_bound})
  WHERE token <> ''
),
th AS (SELECT doc_id, {poly_hash_sql('token')} AS h FROM tok),
bits AS (
  SELECT doc_id, b,
         SUM(CASE WHEN CAST(FLOOR(h / POWER(2, b)) AS BIGINT) % 2 = 1
                  THEN 1 ELSE -1 END) AS s
  FROM th CROSS JOIN (SELECT unnest(range(0, 32)) AS b)
  GROUP BY doc_id, b
),
fp AS (
  SELECT doc_id,
         CAST(SUM(CASE WHEN s > 0 THEN CAST(POWER(2, b) AS BIGINT) ELSE 0 END)
              AS BIGINT) AS simhash
  FROM bits GROUP BY doc_id
)"""


_SIMHASH_ORACLE = (
    _simhash_fp_sql(100)
    + "\nSELECT doc_id, simhash FROM fp ORDER BY doc_id"
)


@register(
    "q44_simhash",
    oracle=_SIMHASH_ORACLE,
    doc="SimHash (32-bit) document fingerprints from token polynomial "
    "hashes: per-bit weighted vote, linear in corpus size (q96 does the "
    "sub-quadratic hamming search over these via bit-banding).",
)
def q44(spark: SparkSession, sf: str) -> DataFrame:
    docs = load(spark, sf, "documents").filter(F.col("doc_id") < 100)
    return simhash_fingerprints(docs).orderBy("doc_id")


def simhash_fingerprints(docs: DataFrame) -> DataFrame:
    """(doc_id, simhash BIGINT): 32-bit SimHash per document.

    Per-bit weighted vote over the distinct-token polynomial hashes —
    linear in corpus size; the bit explode (32 rows/token) stays in-row
    until the (doc_id, b) partial aggregation, which combines map-side.
    """
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
    return bits.groupBy("doc_id").agg(
        F.sum(
            F.when(
                F.col("s") > 0, F.pow(F.lit(2), F.col("b")).cast("bigint")
            ).otherwise(F.lit(0))
        )
        .cast("bigint")
        .alias("simhash")
    )


_Q96_BOUND = 200

_Q96_ORACLE = (
    _simhash_fp_sql(_Q96_BOUND)
    + """,
bands AS (
  SELECT doc_id, simhash, b AS band,
         CAST(FLOOR(simhash / POWER(256, b)) AS BIGINT) % 256 AS band_val
  FROM fp CROSS JOIN (SELECT unnest(range(0, 4)) AS b)
),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
         a.simhash AS ha, b.simhash AS hb
  FROM bands a JOIN bands b
    ON a.band = b.band AND a.band_val = b.band_val AND a.doc_id < b.doc_id
)
SELECT doc_a, doc_b,
       CAST(bit_count(xor(ha, hb)) AS BIGINT) AS hamming
FROM cand WHERE bit_count(xor(ha, hb)) <= 1
ORDER BY doc_a, doc_b
"""
)


@register(
    "q96_simhash_neardup",
    oracle=_Q96_ORACLE,
    doc="SimHash near-dup search: 32-bit fingerprints (q44's operator) "
    "banded into 4x8-bit blocks; candidate pairs meet only inside a "
    "shared (band, value) bucket — by pigeonhole any pair within "
    "hamming distance 3 shares at least one intact band, so the "
    "bucket equi-join has full recall for the verify threshold of 1 "
    "used here (the fixture is dense with near-identical docs). Verification "
    "is popcount(xor) on two i64s — no text comparison ever happens. "
    "At 100 TB: fingerprints are 8 bytes/doc, bands shuffle-join on "
    "(band, value) like any equi-key, and the quadratic blow-up is "
    "bounded per bucket (hot buckets would get the q43 df-cut).",
)
def q96(spark: SparkSession, sf: str) -> DataFrame:
    docs = load(spark, sf, "documents").filter(F.col("doc_id") < _Q96_BOUND)
    fp = simhash_fingerprints(docs)
    bands = fp.select(
        "doc_id",
        "simhash",
        F.explode(F.sequence(F.lit(0), F.lit(3))).alias("band"),
    ).withColumn(
        "band_val",
        F.floor(F.col("simhash") / F.pow(F.lit(256), F.col("band"))).cast(
            "bigint"
        )
        % 256,
    )
    a = bands.select(
        F.col("doc_id").alias("doc_a"),
        F.col("simhash").alias("ha"),
        "band",
        "band_val",
    )
    b = bands.select(
        F.col("doc_id").alias("doc_b"),
        F.col("simhash").alias("hb"),
        "band",
        "band_val",
    )
    cand = (
        a.join(b, ["band", "band_val"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b", "ha", "hb")
        .distinct()
    )
    hamming = F.bit_count(F.col("ha").bitwiseXOR(F.col("hb"))).cast("bigint")
    return (
        cand.withColumn("hamming", hamming)
        .filter(F.col("hamming") <= 1)
        .select("doc_a", "doc_b", "hamming")
        .orderBy("doc_a", "doc_b")
    )


# ---------------------------------------------------------------------------
# Dedup clusters: connected components over candidate pairs (charter)
# ---------------------------------------------------------------------------

_CLUSTERS_ORACLE = """
WITH RECURSIVE
pairs AS (
  SELECT doc_id % 50 AS a, (doc_id * 7 + 3) % 50 AS b
  FROM documents WHERE doc_id < 200
),
edges AS (  -- undirected, no self-loops
  SELECT a, b FROM pairs WHERE a <> b
  UNION SELECT b, a FROM pairs WHERE a <> b
),
verts AS (SELECT DISTINCT a AS v FROM edges),
reach(src, dst) AS (
  SELECT v, v FROM verts
  UNION
  SELECT r.src, e.b FROM reach r JOIN edges e ON r.dst = e.a
),
comp AS (SELECT src AS v, MIN(dst) AS label FROM reach GROUP BY src)
SELECT COUNT(DISTINCT label) AS n_clusters,
       CAST(MAX(sz) AS BIGINT) AS max_cluster_size,
       COUNT(*) AS n_vertices
FROM comp JOIN (SELECT label AS l2, COUNT(*) AS sz FROM comp GROUP BY label)
  ON label = l2
"""


@register(
    "q64_dedup_clusters",
    oracle=_CLUSTERS_ORACLE,
    doc="Dedup clusters = connected components over a candidate-pair "
    "graph, via iterative hash-min label propagation (driver loop of "
    "join+min until fixpoint, localCheckpoint per iteration to cut "
    "lineage). Oracle is a recursive-CTE transitive closure. The graph "
    "here is a deterministic synthetic pair set exercising the CC "
    "operator in isolation; q76 runs the same operator on REAL "
    "MinHash+LSH candidate pairs.",
)
def q64(spark: SparkSession, sf: str) -> DataFrame:
    docs = load(spark, sf, "documents").filter(F.col("doc_id") < 200)
    pairs = docs.select(
        (F.col("doc_id") % 50).alias("a"),
        ((F.col("doc_id") * 7 + 3) % 50).alias("b"),
    ).filter(F.col("a") != F.col("b"))
    labels = connected_components(pairs)
    return _cluster_summary(labels)


def connected_components(
    pairs: DataFrame,
    max_iters: int = 20,
    broadcast_frontier_max: int = 2_000_000,
) -> DataFrame:
    """pairs(a, b) → labels(v, label): frontier hash-min propagation.

    Undirects the edge set, then iterates label(v) ← min(label(v),
    min label of neighbors) until fixpoint, with ``localCheckpoint``
    per iteration so iteration N+1 never replans N's lineage.

    Three scale measures keep per-iteration cost proportional to the
    ACTIVE part of the graph, not its full size (VERDICT r5 #2 — the
    naive loop re-shuffled every edge and every label each round, the
    measured scale-killer at the 100× tier):

    - **Frontier-only propagation.** Labels propagate only FROM
      vertices whose label changed last iteration. Identical results,
      iteration for iteration: an unchanged neighbor's label was
      already folded into v's label the round after that neighbor last
      changed (all vertices start "changed"), and hash-min is monotone,
      so re-sending it is a no-op. Late iterations touch only the
      frontier's incident edges instead of every edge.
    - **Pinned edge partitioning.** Edges are hash-repartitioned on the
      propagation key ONCE before the checkpoint; ``localCheckpoint``
      preserves ``outputPartitioning``, so non-broadcast iterations
      never re-shuffle the edge set — only the (shrinking) frontier
      moves. Labels likewise stay hash(v)-partitioned through each
      checkpoint, and neighbor-min arrives hash(a)-partitioned from its
      own aggregation, so the label-update join is exchange-free too.
    - **Broadcast frontier.** Once the frontier fits comfortably in a
      broadcast (≤ ``broadcast_frontier_max`` rows of two longs), the
      edge join becomes a broadcast hash join: zero shuffle, no sort,
      edges scanned in place from the checkpoint.

    Each iteration is then one partial-aggregated shuffle of the
    frontier's incident edges (or none, once broadcasting); iterations
    ≈ component diameter, bounded for LSH candidate graphs by the band
    structure.
    """
    edges = (
        pairs.select("a", "b")
        .unionAll(pairs.select(F.col("b").alias("a"), F.col("a").alias("b")))
        .distinct()
        # pin hash(b) partitioning through the checkpoint: every
        # iteration joins on edges.b, so the edge set must never move
        # again. Materializing once also stops each iteration replanning
        # edges' full upstream lineage (for q76 that is the whole
        # MinHash+LSH candidate pipeline — measured ~3.5s/run at sf0.1,
        # ~1.3s with edges pinned)
        .repartition(F.col("b"))
        .localCheckpoint()
    )
    labels = (
        edges.select(F.col("a").alias("v"))
        .distinct()
        .withColumn("label", F.col("v"))
        .localCheckpoint()
    )
    frontier = labels  # every vertex starts changed (label = v)
    frontier_size = labels.count()
    for _ in range(max_iters):  # diameter bound; early-exits on fixpoint
        src = (
            F.broadcast(frontier)
            if frontier_size <= broadcast_frontier_max
            else frontier
        )
        neighbor_min = (
            edges.join(src, edges.b == src.v)
            .groupBy("a")
            .agg(F.min("label").alias("nmin"))
        )
        # carry the PREVIOUS label through the checkpoint so the frontier
        # is a filter on already-materialized rows — not an extra join
        # job against the prior iteration per round
        stepped = (
            labels.join(neighbor_min, labels.v == neighbor_min.a, "left")
            .select(
                "v",
                F.col("label").alias("prev"),
                F.least(
                    F.col("label"), F.coalesce(F.col("nmin"), F.col("label"))
                ).alias("label"),
            )
            .localCheckpoint()  # cut lineage: iteration N+1 must not replan N
        )
        frontier = stepped.filter(F.col("label") != F.col("prev")).select(
            "v", "label"
        )
        frontier_size = frontier.count()
        labels = stepped.select("v", "label")
        if frontier_size == 0:
            return labels
    # exhausting the iteration budget means some component's diameter
    # exceeds max_iters: the labels are NOT a fixpoint and returning them
    # would silently report too many clusters
    raise RuntimeError(
        f"connected_components did not converge in {max_iters} iterations"
        " — raise max_iters (diameter bound) for this graph"
    )


def _cluster_summary(labels: DataFrame) -> DataFrame:
    sizes = labels.groupBy("label").agg(F.count("*").alias("sz"))
    return labels.join(sizes, "label").agg(
        F.countDistinct("label").alias("n_clusters"),
        F.max("sz").cast("bigint").alias("max_cluster_size"),
        F.count("*").alias("n_vertices"),
    )


_Q76_DOC_BOUND = 500  # bounds the oracle's recursive closure, not the op

_REAL_CLUSTERS_ORACLE = f"""
WITH RECURSIVE {_minhash_cand_ctes(f"WHERE doc_id < {_Q76_DOC_BOUND}")},
edges AS (  -- undirected, no self-loops
  SELECT doc_a AS a, doc_b AS b FROM cand WHERE doc_a <> doc_b
  UNION SELECT doc_b, doc_a FROM cand WHERE doc_a <> doc_b
),
verts AS (SELECT DISTINCT a AS v FROM edges),
reach(src, dst) AS (
  SELECT v, v FROM verts
  UNION
  SELECT r.src, e.b FROM reach r JOIN edges e ON r.dst = e.a
),
comp AS (SELECT src AS v, MIN(dst) AS label FROM reach GROUP BY src)
SELECT COUNT(DISTINCT label) AS n_clusters,
       CAST(MAX(sz) AS BIGINT) AS max_cluster_size,
       COUNT(*) AS n_vertices
FROM comp JOIN (SELECT label AS l2, COUNT(*) AS sz FROM comp GROUP BY label)
  ON label = l2
"""


@register(
    "q76_dedup_clusters_minhash",
    oracle=_REAL_CLUSTERS_ORACLE,
    doc="End-to-end near-dup clustering: MinHash+LSH candidate pairs "
    "(q43's operator, unchanged) fed into hash-min connected components "
    "(q64's operator, unchanged) — the composition a dedup pipeline "
    "actually runs. The fixture slice yields a plural component "
    "structure (~30 clusters, max ≈ 22), so the check is non-trivial. "
    "Oracle: the same minhash CTEs + a recursive-CTE transitive closure.",
)
def q76(spark: SparkSession, sf: str) -> DataFrame:
    docs = load(spark, sf, "documents").filter(
        F.col("doc_id") < _Q76_DOC_BOUND
    )
    cand = minhash_candidate_pairs(docs).select(
        F.col("doc_a").alias("a"), F.col("doc_b").alias("b")
    )
    return _cluster_summary(connected_components(cand))


# ---------------------------------------------------------------------------
# Duplicate passage detection (charter — substring-dedup approximation)
# ---------------------------------------------------------------------------


@register(
    "q66_duplicate_passages",
    oracle="""
    WITH win AS (
      SELECT doc_id,
             unnest(list_distinct(list_transform(
               range(1, len(tk) - 6),
               j -> array_to_string(tk[j:j+7], ' ')))) AS passage
      FROM (
        SELECT doc_id,
               list_filter(string_split_regex(lower(text), '[^a-z]+'),
                           t -> t <> '') AS tk
        FROM documents WHERE doc_id < 500)
      WHERE len(tk) >= 8
    ),
    rep AS (
      SELECT passage, COUNT(DISTINCT doc_id) AS ndocs
      FROM win GROUP BY passage HAVING COUNT(DISTINCT doc_id) >= 2
    )
    SELECT (SELECT COUNT(*) FROM rep) AS n_repeated_passages,
           COUNT(DISTINCT w.doc_id) AS n_docs_affected
    FROM win w JOIN rep r ON w.passage = r.passage
    """,
    doc="Duplicate-passage detection (substring-dedup approximation, Lee "
    "et al. style): 8-token rolling windows per doc, windows shared by "
    "≥2 docs flagged. Windows are built in-row (transform over slice) "
    "and dedup'd before the explode; only distinct window strings "
    "shuffle.",
)
def q66(spark: SparkSession, sf: str) -> DataFrame:
    docs = load(spark, sf, "documents").filter(F.col("doc_id") < 500)
    base = docs.select(
        "doc_id", F.filter(tokens("text"), lambda t: t != "").alias("tk")
    ).filter(F.size("tk") >= 8)
    tk = F.col("tk")
    windows = F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), F.size(tk) - 7),
            lambda j: F.array_join(F.slice(tk, j, 8), " "),
        )
    )
    win = base.select("doc_id", F.explode(windows).alias("passage"))
    rep = (
        win.groupBy("passage")
        .agg(F.countDistinct("doc_id").alias("ndocs"))
        .filter(F.col("ndocs") >= 2)
    )
    affected = win.join(rep, "passage").agg(
        F.countDistinct("doc_id").alias("n_docs_affected")
    )
    n_rep = rep.agg(F.count("*").alias("n_repeated_passages"))
    return n_rep.crossJoin(affected)


# ---------------------------------------------------------------------------
# n-gram (character shingle) Jaccard (charter)
# ---------------------------------------------------------------------------

_Q45_MAX_DF = 150  # drop shingles present in > this many docs pre-join

_JACCARD_ORACLE = f"""
WITH sh0 AS (
  SELECT doc_id, shingle FROM (
    SELECT doc_id,
           unnest(list_distinct(list_transform(
             range(1, length(lower(text)) - 1),
             i -> substr(lower(text), CAST(i AS INTEGER), 3)))) AS shingle
    FROM documents WHERE doc_id < 300)
),
sh AS (
  SELECT doc_id, shingle FROM sh0
  {df_cut_sql('shingle', _Q45_MAX_DF)}
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
    doc="Character 3-gram Jaccard near-dup over the rare-shingle space: "
    "distinct shingles per doc (array_distinct in-row), a document-"
    f"frequency cut dropping shingles present in > {_Q45_MAX_DF} docs, "
    "then shared-shingle join, |A∩B|/(|A|+|B|-|A∩B|) ≥ 0.5. The DF cut is "
    "the scale mechanism — it removes the hot join keys that make the "
    "self-join quadratic, at any corpus size; sizes and intersections are "
    "both computed on the filtered space so Jaccard stays consistent. "
    "doc_id<300 only bounds the oracle fixture; the LSH variants (q43) "
    "are the sub-quadratic path.",
)
def q45(spark: SparkSession, sf: str) -> DataFrame:
    docs = load(spark, sf, "documents").filter(F.col("doc_id") < 300)
    # bind lower(text) to a column before the lambda references it
    # (unbound: re-evaluated per substring call → O(len²) per doc)
    base = docs.select("doc_id", F.lower(F.col("text")).alias("lt"))
    lowered = F.col("lt")
    sh = base.select(
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
    # rows are distinct (doc_id, shingle), so the per-shingle count is
    # document frequency (see functions.df_cut)
    sh = df_cut(sh, "shingle", _Q45_MAX_DF)
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


# ---------------------------------------------------------------------------
# q113 — canonical selection: keep the best-quality doc per near-dup cluster
# ---------------------------------------------------------------------------

_Q113_QUALITY_SQL = f"""
  SELECT doc_id,
         CAST(FLOOR(100 * CAST(n_stop AS DOUBLE) / n_tokens
                    + CAST(LEAST(n_tokens, 100) AS DOUBLE)) AS BIGINT)
           AS quality
  FROM (
    SELECT doc_id,
           CAST(len(list_filter(string_split_regex(lower(text), '[^a-z]+'),
                                t -> t <> '')) AS BIGINT) AS n_tokens,
           CAST(len(list_filter(string_split_regex(lower(text), '[^a-z]+'),
                                t -> list_contains(['the','a','of','and'], t)))
                AS BIGINT) AS n_stop
    FROM documents WHERE doc_id < {_Q76_DOC_BOUND})
  WHERE n_tokens >= 1
"""

_Q113_ORACLE = f"""
WITH RECURSIVE {_minhash_cand_ctes(f"WHERE doc_id < {_Q76_DOC_BOUND}")},
edges AS (
  SELECT doc_a AS a, doc_b AS b FROM cand WHERE doc_a <> doc_b
  UNION SELECT doc_b, doc_a FROM cand WHERE doc_a <> doc_b
),
verts AS (SELECT DISTINCT a AS v FROM edges),
reach(src, dst) AS (
  SELECT v, v FROM verts
  UNION
  SELECT r.src, e.b FROM reach r JOIN edges e ON r.dst = e.a
),
comp AS (SELECT src AS v, MIN(dst) AS label FROM reach GROUP BY src),
q AS ({_Q113_QUALITY_SQL}),
member AS (
  SELECT q.doc_id, q.quality, comp.label
  FROM q JOIN comp ON q.doc_id = comp.v
),
best AS (
  SELECT label, doc_id, quality FROM (
    SELECT label, doc_id, quality,
           ROW_NUMBER() OVER (PARTITION BY label
                              ORDER BY quality DESC, doc_id) AS rn
    FROM member)
  WHERE rn = 1
),
singles AS (
  SELECT doc_id, quality FROM q
  WHERE doc_id NOT IN (SELECT v FROM comp)
)
SELECT (SELECT COUNT(*) FROM q) AS n_docs,
       (SELECT COUNT(*) FROM member) AS n_in_clusters,
       (SELECT COUNT(DISTINCT label) FROM member) AS n_clusters,
       (SELECT COUNT(*) FROM singles)
         + (SELECT COUNT(*) FROM best) AS n_kept,
       (SELECT COALESCE(SUM(quality), 0) FROM singles)::BIGINT
         + (SELECT COALESCE(SUM(quality), 0) FROM best)::BIGINT
         AS kept_quality_sum
"""


@register(
    "q113_keep_best_quality",
    oracle=_Q113_ORACLE,
    doc="Canonical selection — the step after clustering in a real "
    "dedup pipeline: within each near-dup cluster (q76's MinHash+LSH → "
    "connected components, unchanged) keep the HIGHEST-QUALITY member "
    "(q47's integer score; ties to the lowest doc_id via struct-max on "
    "(quality, -doc_id)) instead of an arbitrary survivor. Singletons "
    "keep themselves. One broadcast-sized labels table joined back to "
    "the quality scores; summary row hash-checked against the "
    "recursive-CTE closure + window argmax oracle.",
)
def q113(spark: SparkSession, sf: str) -> DataFrame:
    docs = load(spark, sf, "documents").filter(
        F.col("doc_id") < _Q76_DOC_BOUND
    )
    tk = F.filter(tokens("text"), lambda t: t != "")
    n_tokens = F.size(tk).cast("bigint")
    n_stop = F.size(
        F.filter(tk, lambda t: t.isin("the", "a", "of", "and"))
    ).cast("bigint")
    quality = F.floor(
        100 * n_stop.cast("double") / n_tokens
        + F.least(n_tokens, F.lit(100)).cast("double")
    ).cast("bigint")
    # localCheckpoint: q is ~500 tiny rows feeding the member join, the
    # singleton anti-join, and (via member) the per-label argmax — pinned
    # once, the regex tokenization pipeline runs once instead of 3x
    # (same pattern connected_components uses for its edge set)
    q = (
        docs.select("doc_id", n_tokens.alias("nt"), quality.alias("quality"))
        .filter(F.col("nt") >= 1)
        .drop("nt")
        .localCheckpoint()
    )
    pairs = minhash_candidate_pairs(docs).select(
        F.col("doc_a").alias("a"), F.col("doc_b").alias("b")
    )
    labels = connected_components(pairs)
    member = q.join(labels, q.doc_id == labels.v).select(
        "doc_id", "quality", "label"
    )
    # ONE pass over member: per-label size + quality-argmax together,
    # then a single global roll-up (three separate agg branches would
    # re-execute the member join per branch)
    per_label = member.groupBy("label").agg(
        F.count("*").alias("n_i"),
        F.max(F.struct(F.col("quality"), (-F.col("doc_id")))).alias("m"),
    )
    stats_m = per_label.agg(
        F.coalesce(F.sum("n_i"), F.lit(0))
        .cast("bigint")
        .alias("n_in_clusters"),
        F.count("*").alias("n_clusters"),
        F.coalesce(F.sum(F.col("m.quality")), F.lit(0))
        .cast("bigint")
        .alias("_qb"),
    )
    singles = q.join(
        labels.select(F.col("v").alias("doc_id")), "doc_id", "left_anti"
    )
    stats_s = singles.agg(
        F.count("*").alias("_ns"),
        F.coalesce(F.sum("quality"), F.lit(0)).cast("bigint").alias("_qs"),
    )
    # n_docs = members + singletons: q partitions exactly into the two
    # (member = q semi-join comp, singles = q anti-join comp)
    return stats_m.crossJoin(stats_s).select(
        (F.col("n_in_clusters") + F.col("_ns")).alias("n_docs"),
        "n_in_clusters",
        "n_clusters",
        (F.col("_ns") + F.col("n_clusters")).alias("n_kept"),
        (F.col("_qs") + F.col("_qb")).alias("kept_quality_sum"),
    )


# ---------------------------------------------------------------------------
# q122 — LSH candidates → exact Jaccard verification (the production path)
# ---------------------------------------------------------------------------

_Q122_BOUND = 300

_Q122_ORACLE = f"""
WITH {_minhash_cand_ctes(f"WHERE doc_id < {_Q122_BOUND}")},
sets AS (
  SELECT doc_id,
         list_distinct(list_transform(
           range(1, len(tk)), j -> tk[j] || '_' || tk[j+1])) AS sh
  FROM toks WHERE len(tk) >= 2
),
verified AS (
  SELECT c.doc_a, c.doc_b,
         FLOOR(CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
               / CAST(len(list_distinct(list_concat(a.sh, b.sh))) AS DOUBLE)
               * 1000000 + 0.5) / 1000000 AS jaccard
  FROM cand c
  JOIN sets a ON c.doc_a = a.doc_id
  JOIN sets b ON c.doc_b = b.doc_id
)
SELECT doc_a, doc_b, jaccard
FROM verified
ORDER BY jaccard DESC, doc_a, doc_b
LIMIT 20
"""


@register(
    "q122_lsh_verify_jaccard",
    oracle=_Q122_ORACLE,
    doc="The verify stage of the production near-dup pipeline: MinHash+"
    "LSH candidate pairs (q43's operator) are checked against their "
    "EXACT bigram-shingle Jaccard — candidates x exact, never corpus x "
    "corpus (q45's df-cut all-pairs is the correctness baseline; this "
    "composition is what actually runs at 100 TB: candidate count ~ "
    "linear, each verification an in-row set op on two pre-built "
    "shingle arrays). The per-doc shingle-set table joins in by doc_id "
    "on BOTH sides of the pair; the integer-ratio jaccard is "
    "floor-quantized (qround contract).",
)
def q122(spark: SparkSession, sf: str) -> DataFrame:
    docs = load(spark, sf, "documents").filter(
        F.col("doc_id") < _Q122_BOUND
    )
    cand = minhash_candidate_pairs(docs)
    base = docs.select(
        "doc_id", F.filter(tokens("text"), lambda t: t != "").alias("tk")
    )
    tk = F.col("tk")
    shingles = F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), F.size(tk) - 1),
            lambda j: F.concat(
                F.element_at(tk, j), F.lit("_"), F.element_at(tk, j + 1)
            ),
        )
    )
    sets = base.filter(F.size(tk) >= 2).select(
        "doc_id", shingles.alias("sh")
    )
    a = sets.select(F.col("doc_id").alias("doc_a"), F.col("sh").alias("sha"))
    b = sets.select(F.col("doc_id").alias("doc_b"), F.col("sh").alias("shb"))
    jaccard = qround(
        F.size(F.array_intersect(F.col("sha"), F.col("shb"))).cast("double")
        / F.size(F.array_union(F.col("sha"), F.col("shb"))).cast("double"),
        6,
    )
    return (
        cand.join(a, "doc_a")
        .join(b, "doc_b")
        .select("doc_a", "doc_b", jaccard.alias("jaccard"))
        .orderBy(F.col("jaccard").desc(), "doc_a", "doc_b")
        .limit(20)
    )


# ---------------------------------------------------------------------------
# Streaming dedup-index maintenance (q166) — the q155/q160 recipe for LSH
# ---------------------------------------------------------------------------


def stream_maintain_dedup_index(
    spark: SparkSession,
    source_dir: str,
    schema,
    store,
    checkpoint: str,
    max_files_per_trigger: int = 1,
):
    """Maintain a persisted MinHash-LSH band table from a document
    edit stream — the third leg of the streaming-maintenance trilogy
    (text index q155, ANN codes q160, now the dedup index).

    Source rows: (doc_id, text, edit_ts). Per micro-batch:

    1. collapse to the latest edit per doc WITHIN the batch, then drop
       docs whose stored band rows already carry a NEWER edit_ts —
       doc-level last-write-wins, so out-of-order arrival and
       foreachBatch's at-least-once redelivery both converge to the
       latest-edit index;
    2. encode the winners with the FROZEN hash family
       (:func:`minhash_band_signatures` — the same arithmetic as the
       batch build, so stream-maintained rows are bit-identical to a
       rebuild over the same winning edits);
    3. commit ONE atomic merge: fresh (band, doc_id, sig) rows
       update-or-insert; stale keys ride along as tombstone rows
       (NULL sig — a real signature is never NULL) and a
       matched-delete clause drops them, covering docs edited to
       nothing (< 2 tokens ⇒ no shingles ⇒ no band rows). A crash can
       never leave a doc half-replaced, and replaying a batch is
       idempotent.

    Admission is o(index) (VERDICT r8 #4): the per-doc LWW watermark
    lives in a doc_id-keyed side store (``<root>_wm``, one row per
    doc — see :func:`admission_watermarks`) probed bucket-pruned with
    the batch's doc_ids, NOT derived from the band table (whose
    (band, doc_id) key cannot prune a doc-only probe and whose rows
    vanish on emptying — a deleted doc keeps its watermark, so a late
    stale edit after an emptying is still rejected). Stale keys need
    no index read either: the frozen family emits ALL bands for any
    doc with ≥2 tokens, so a winner's stale set is exactly
    {every band} when its new encoding is empty, and ∅ otherwise
    (same-key sig changes are updates, not deletes).

    Scale: each batch costs its winners' signatures (per-doc array
    ops, one groupBy), a bucket-pruned probe of the watermark table,
    and a PK-bucket-pruned rewrite of the touched (band, doc_id)
    buckets — never a scan of the index. Near-dup candidates against
    the maintained table come from :func:`band_candidate_pairs` (or a
    batch-vs-store equi-join on (band, sig) for incremental "what
    does today's data collide with" checks); a 100 TB corpus' dedup
    index follows the day's edits without a rebuild.
    """
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(source_dir)
        .writeStream.foreachBatch(dedup_index_batch_applier(spark, store))
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def dedup_index_batch_applier(spark: SparkSession, store):
    """The per-micro-batch applier :func:`stream_maintain_dedup_index`
    commits through — factored out so scale checks time the REAL
    admission + tombstone + merge path (VERDICT r8 #4: timing bare
    ``store.merge`` bypassed the admission step and left the '~flat
    per batch' claim unproven).

    ``store`` may be a :class:`MergeOnReadStore`: a (band, doc_id)
    batch touches essentially every bucket (band values spread the
    hash), so the COW rewrite has the same bucket-size growth term as
    the text leg — the MOR path commits the batch as one O(batch)
    delta append instead (same semantics, q182's law applied here),
    via the store-polymorphic commit_upserts_and_tombstones."""
    from parquet_demo_spark.sources.merge_store import admission_watermarks
    from parquet_demo_spark.sources.mor_store import (
        commit_upserts_and_tombstones,
    )

    wm = admission_watermarks(store, keys=("doc_id",))

    def _apply_batch(batch_df: DataFrame, epoch_id: int) -> None:
        from parquet_demo_spark.tuning import store_plan_scope

        # one size decision for the whole batch: a sub-threshold
        # (index + watermark + batch) runs the admission probe, the
        # encode, and both commits under the minimal plan (tuning.py)
        with store_plan_scope(spark, (store.root, wm.root), batch_df):
            _apply_batch_scoped(batch_df)

    def _apply_batch_scoped(batch_df: DataFrame) -> None:
        # no standalone batch-emptiness probe: ``winners.isEmpty()``
        # below subsumes it (empty batch ⇒ empty winners), so the
        # common non-empty batch pays one admission action, not two
        if wm.current_version() is None and store.has_data():
            # one-time migration: a pre-watermark (batch-built) band
            # table seeds the side store from its own rows — the last
            # full scan this stream will ever do
            wm.merge(
                store.read(spark)
                .groupBy("doc_id")
                .agg(F.max("edit_ts").alias("edit_ts"))
            )
        w = W.partitionBy("doc_id").orderBy(F.col("edit_ts").desc())
        latest = (
            batch_df.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .drop("__rn")
            # computed ONCE: the probe's bucket collect and the winners
            # materialization below both consume the window dedup
            .localCheckpoint(eager=False)
        )
        if wm.current_version() is not None:
            cur_ts = wm.probe(spark, latest.select("doc_id")).select(
                "doc_id", F.col("edit_ts").alias("__cur_ts")
            )
            latest = (
                latest.join(cur_ts, "doc_id", "left")
                .filter(
                    F.col("__cur_ts").isNull()
                    | (F.col("edit_ts") > F.col("__cur_ts"))
                )
                .drop("__cur_ts")
            )
        winners = latest.localCheckpoint(eager=False)  # read by encode + tombstones
        if winners.isEmpty():
            return
        # materialize the encoding ONCE: it feeds the emptiness check,
        # the tombstone anti-join, and the merge — without the
        # checkpoint the minhash (the batch's expensive step) would
        # recompute per consumer
        fresh = (
            minhash_band_signatures(winners.select("doc_id", "text"))
            .join(winners.select("doc_id", "edit_ts"), "doc_id")
            .localCheckpoint(eager=False)
        )
        empty_store = not store.has_data()
        if empty_store:
            if not fresh.isEmpty():
                store.merge(fresh.select("band", "doc_id", "sig", "edit_ts"))
        else:
            # stale keys WITHOUT reading the index: the frozen family
            # emits one row per band or none per doc, so only winners
            # whose new encoding is empty have stale rows — every band
            # of theirs. Band ids come from the family itself (not
            # range(count): nothing guarantees contiguity), and column
            # types from the encoded frame's own schema (the stream's
            # caller-supplied schema may not be bigint-shaped).
            band_ids = sorted(
                {bnd for _, _, _, bnd, _ in _MINHASH_PARAMS}
            )
            types = {f.name: f.dataType for f in fresh.schema.fields}
            emptied = winners.select("doc_id", "edit_ts").join(
                fresh.select("doc_id"), "doc_id", "left_anti"
            )
            # tombstones carry the WINNER's edit_ts (the search and ANN
            # appliers' convention): the delete is versioned like any
            # other action, so the commit never depends on the implicit
            # "no fresh row co-occurs for an emptied doc" invariant —
            # if one ever did, LWW would resolve it by recency instead
            # of silently dropping the tombstone (ADVICE r10)
            tombstones = emptied.select(
                F.explode(
                    F.array(
                        *[
                            F.lit(b).cast(types["band"])
                            for b in band_ids
                        ]
                    )
                ).alias("band"),
                F.col("doc_id").cast(types["doc_id"]).alias("doc_id"),
                F.col("edit_ts").cast(types["edit_ts"]).alias("edit_ts"),
            ).select(
                "band",
                "doc_id",
                F.lit(None).cast(types["sig"]).alias("sig"),
                "edit_ts",
            )
            src = fresh.select(
                "band", "doc_id", "sig", "edit_ts"
            ).unionByName(tombstones)
            if not src.isEmpty():
                commit_upserts_and_tombstones(store, src, "sig")
        # watermark commit LAST: a crash before this point replays the
        # batch (wm behind ⇒ re-admitted ⇒ idempotent re-apply);
        # conditional so replays can never move a watermark backwards
        wm.merge(winners.select("doc_id", "edit_ts"), conditional=True)

    return _apply_batch


_Q166_ORACLE = f"""
WITH winning AS (
  SELECT doc_id,
         CASE WHEN doc_id % 7 = 0 THEN substring(text, 1, 120)
              WHEN doc_id % 11 = 0 THEN ''
              ELSE text END AS text
  FROM documents
),
{_minhash_cand_ctes(src="winning")}
SELECT (SELECT CAST(COUNT(DISTINCT doc_id) AS BIGINT) FROM bands)
         AS n_indexed_docs,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM bands) AS n_band_rows,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM cand) AS n_candidate_pairs
"""


@register(
    "q166_dedup_stream_maintenance",
    oracle=_Q166_ORACLE,
    doc="Streaming incremental MinHash-LSH dedup-index maintenance, "
    "hash-checked end-to-end — the q155 recipe (readStream -> "
    "foreachBatch -> ONE atomic tombstone-riding merge per batch) "
    "applied to the (band, doc_id)-keyed signature store: batch 0 "
    "indexes every document (edit_ts=1), batch 1 re-edits every "
    "doc_id%%7 doc to its 120-char prefix (edit_ts=3, signatures "
    "change in place), batch 2 delivers LATE edits: a stale "
    "edit_ts=2 rewrite of the %%7 docs (must NOT apply — doc-level "
    "LWW) and an edit_ts=2 emptying of the %%11 docs (their band "
    "rows must disappear via tombstone-delete). The final "
    "(n_indexed_docs, n_band_rows, n_candidate_pairs) triple "
    "hash-checks against an oracle that runs the FROZEN hash family "
    "over only each doc's winning edit — covering micro-batch "
    "sequencing, LWW, signature replacement, emptied-doc removal, "
    "and LSH banding in one row. Scale: each batch pays its winners' "
    "signatures + a bucket-pruned rewrite, never the index; "
    "candidates stay banded equi-joins. operators/dedup.py "
    "stream_maintain_dedup_index.",
)
def q166(spark: SparkSession, sf: str) -> DataFrame:
    return _q166_read(spark, sf, _q166_build(spark, sf))


def _q166_build(spark: SparkSession, sf: str):
    """Build phase: the three deterministic edit-batch source files
    (same edit scenario as q155, driving the dedup index instead)."""
    import glob
    import os
    import shutil

    from pyspark.sql import types as T

    from parquet_demo_spark.operators.merge import _scratch_root

    docs = load(spark, sf, "documents").select("doc_id", "text")
    root = _scratch_root("q166", sf)
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
    b1 = docs.filter(F.col("doc_id") % 7 == 0).select(
        F.col("doc_id").cast("bigint"),
        F.substring("text", 1, 120).alias("text"),
        F.lit(3).cast("bigint").alias("edit_ts"),
    )
    b2 = (
        docs.filter(F.col("doc_id") % 7 == 0)
        .select(
            F.col("doc_id").cast("bigint"),
            F.lit("stale edit that must not apply").alias("text"),
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


def _q166_read(spark: SparkSession, sf: str, state) -> DataFrame:
    """Operation under test: the maintenance stream into a fresh store,
    then the (docs, band rows, candidate pairs) summary of the
    committed state."""
    from parquet_demo_spark.operators.merge import _fresh_dir
    from parquet_demo_spark.sources.merge_store import ParquetMergeStore

    root, src, schema = state
    store = ParquetMergeStore(
        _fresh_dir(root, "lsh"),
        keys=("band", "doc_id"),
        version_cols=("edit_ts",),
        num_buckets=8,
    )
    q = stream_maintain_dedup_index(
        spark, src, schema, store, _fresh_dir(root, "ckpt")
    )
    q.awaitTermination()
    bands = store.read(spark).select("doc_id", "band", "sig")
    n_docs = bands.agg(
        F.countDistinct("doc_id").cast("bigint").alias("n_indexed_docs"),
        F.count("*").cast("bigint").alias("n_band_rows"),
    )
    n_pairs = band_candidate_pairs(bands).agg(
        F.count("*").cast("bigint").alias("n_candidate_pairs")
    )
    return n_docs.crossJoin(n_pairs)


register_phases("q166_dedup_stream_maintenance", _q166_build, _q166_read)


# ---------------------------------------------------------------------------
# Incremental dedup check against the maintained index (q167)
# ---------------------------------------------------------------------------


def incremental_dedup_candidates(
    incoming: DataFrame, stored_bands: DataFrame
) -> DataFrame:
    """New docs (doc_id, text) × stored band table → distinct
    (new_doc, corpus_doc) collision candidates.

    THE production dedup flow at 100 TB: today's batch is encoded with
    the frozen hash family and equi-joined against the STORED corpus
    index on (band, sig) — cost is the batch's signatures plus one
    shuffle join against band rows, never a corpus re-encode and never
    an all-pairs comparison. Docs already present in the index should
    be excluded from ``stored_bands`` (or filtered out of the result)
    by the caller; self-matches (same doc_id) are dropped here.
    """
    fresh = minhash_band_signatures(incoming).select(
        F.col("doc_id").alias("new_doc"), "band", "sig"
    )
    corpus = stored_bands.select(
        F.col("doc_id").alias("corpus_doc"), "band", "sig"
    )
    return (
        fresh.join(corpus, ["band", "sig"])
        .filter(F.col("new_doc") != F.col("corpus_doc"))
        .select("new_doc", "corpus_doc")
        .distinct()
    )


def build_admission_layout(
    bands: DataFrame, table: str, buckets: int = 16
) -> None:
    """Persist the band table as a Spark BUCKETED table on the
    admission join key (VERDICT r8 #4, second half).

    The maintenance store is keyed (band, doc_id) — the right layout
    for per-doc rewrites, the wrong one for q167's admission equi-join
    on (band, sig): every admission batch would shuffle the WHOLE
    stored table to the join key. Writing a secondary layout with
    ``bucketBy(N, band, sig)`` + ``sortBy`` registers the
    co-location in the catalog, so the join plans with NO Exchange on
    the stored side — only the (small) batch shuffles to N partitions,
    or broadcasts. At 100 TB this is the difference between admission
    costing o(batch) and re-shuffling the index daily; the layout is
    append-maintainable (Spark bucketed tables preserve bucketing on
    INSERT INTO), so the streaming maintenance path can keep it
    current incrementally.
    """
    import os
    import shutil

    spark = bands.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    # a PRIOR PROCESS' managed-table dir with no catalog entry (crash,
    # or a fresh session over the same warehouse) still blocks CREATE
    # with LOCATION_ALREADY_EXISTS — clear it
    wh = spark.conf.get("spark.sql.warehouse.dir")
    loc = os.path.join(wh.removeprefix("file:"), table)
    if os.path.exists(loc):
        shutil.rmtree(loc)
    (
        bands.select("band", "sig", "doc_id")
        .write.format("parquet")
        .bucketBy(buckets, "band", "sig")
        .sortBy("band", "sig")
        .mode("overwrite")
        .saveAsTable(table)
    )


def append_admission_layout(delta: DataFrame, table: str) -> None:
    """Incrementally maintain the bucketed admission layout: append a
    day's new band rows with ``insertInto`` — Spark writes the delta
    bucketed by the table's recorded (band, sig) spec, so the
    no-Exchange join property survives the append (plan-asserted in
    tests). Append-ONLY by design: an edited doc's superseded
    signatures remain until the next :func:`build_admission_layout`
    rebuild, surfacing only as extra LSH candidates — false positives
    the verify stage (q122's Jaccard gate) already filters, never
    false negatives. The rebuild cadence trades storage for candidate
    precision, exactly like a search index's segment merges.
    """
    delta.select("band", "sig", "doc_id").write.insertInto(table)


_Q167_ORACLE = f"""
WITH {_minhash_cand_ctes()},
cross_pairs AS (
  SELECT DISTINCT n.doc_id AS new_doc, c.doc_id AS corpus_doc
  FROM bands n JOIN bands c ON n.band = c.band AND n.sig = c.sig
  WHERE n.doc_id % 5 = 0 AND c.doc_id % 5 <> 0
)
SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM cross_pairs) AS n_cross_pairs,
       (SELECT CAST(COUNT(DISTINCT new_doc) AS BIGINT) FROM cross_pairs)
         AS n_flagged_new_docs
"""


@register(
    "q167_incremental_dedup_check",
    oracle=_Q167_ORACLE,
    doc="Incremental near-dup admission check — the production flow a "
    "100 TB training corpus actually runs: the corpus (doc_id%%5<>0) "
    "is indexed ONCE into the (band, doc_id)-keyed signature store; "
    "the incoming batch (doc_id%%5=0) is encoded with the frozen hash "
    "family and equi-joined against the STORED band table on "
    "(band, sig), so admission costs the batch's signatures + one "
    "shuffle join — never a corpus re-encode, never all-pairs. "
    "Returns (collision pairs, flagged new docs), hash-checked "
    "against an oracle that bands the full corpus fresh. "
    "operators/dedup.py incremental_dedup_candidates.",
)
def q167(spark: SparkSession, sf: str) -> DataFrame:
    return _q167_read(spark, sf, _q167_build(spark, sf))


def _q167_build(spark: SparkSession, sf: str):
    """Build phase: batch-index the corpus half into a fresh store,
    then derive the (band, sig)-bucketed admission layout from it —
    the one-time cost that makes every later admission batch
    shuffle-free on the stored side."""
    import os
    import re

    from parquet_demo_spark.operators.merge import _scratch_root
    from parquet_demo_spark.sources.merge_store import ParquetMergeStore

    docs = load(spark, sf, "documents").select("doc_id", "text")
    root = _scratch_root("q167", sf)
    store = ParquetMergeStore(
        os.path.join(root, "lsh"),
        keys=("band", "doc_id"),
        num_buckets=8,
    )
    corpus_bands = minhash_band_signatures(
        docs.filter(F.col("doc_id") % 5 != 0)
    ).select("band", "doc_id", "sig")
    store.merge(corpus_bands)
    table = "dedup_admission_" + re.sub(
        r"\W+", "_", f"{sf.strip('/')}_{os.getpid()}"
    )
    build_admission_layout(store.read(spark), table, buckets=8)
    return store, table


def _q167_read(spark: SparkSession, sf: str, state) -> DataFrame:
    """Operation under test: admit the incoming batch through the
    stored BUCKETED layout — the catalog's co-location metadata plans
    the (band, sig) equi-join with no Exchange on the stored side."""
    _store, table = state
    docs = load(spark, sf, "documents").select("doc_id", "text")
    incoming = docs.filter(F.col("doc_id") % 5 == 0)
    cand = incremental_dedup_candidates(
        incoming, spark.table(table).select("doc_id", "band", "sig")
    )
    return cand.agg(
        F.count("*").cast("bigint").alias("n_cross_pairs"),
        F.countDistinct("new_doc").cast("bigint").alias(
            "n_flagged_new_docs"
        ),
    )


register_phases("q167_incremental_dedup_check", _q167_build, _q167_read)
