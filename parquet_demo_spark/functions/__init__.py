"""Deterministic expression helpers shared by the query surface.

These encode the SURVEY §2B determinism conventions that make Spark
results hash-identical to the DuckDB oracle:

- float aggregates go through a per-row ``DECIMAL(18,2)`` cast so the
  aggregation is exact and order-independent (FP addition is not
  associative; decimal addition is — this is what makes a 32-partition
  Spark sum equal a single-threaded DuckDB sum, and a 10,000-partition
  sum at 100 TB equal both);
- never CAST a computed double straight to decimal: Spark rounds the
  shortest decimal repr, DuckDB the true binary value - they diverge at
  exact .xx5 expansions. Compute in decimal space from raw columns, or
  ROUND(x, s) first (round agrees across engines; a rounded double sits
  far from any cast boundary);
- final scalars are rendered as DOUBLE (decimal→double is correctly
  rounded in both engines) and ROUNDed where a division is involved;
- computed integers are always BIGINT (DuckDB's SUM(BIGINT) is HUGEINT,
  Spark's is BIGINT — explicit casts on both sides keep schemas aligned).

Everything here returns Column expressions built from
``pyspark.sql.functions`` — JVM-side, codegen'd, no Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

DEC = "decimal(18,2)"


def dec2(col: Column | str) -> Column:
    """Per-row exact-decimal view of a float column (order-independent sums)."""
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(DEC)


def dsum(col: Column | str, alias: str) -> Column:
    """Exact decimal SUM rendered as DOUBLE: SUM(CAST(x AS DEC(18,2)))::DOUBLE."""
    return F.sum(dec2(col)).cast("double").alias(alias)


def davg(col: Column | str, alias: str) -> Column:
    """Order-independent AVG: decimal sum / count, floor-quantized to 2dp.

    Sum-of-decimals / count is the tie-prone mean construction (see
    :func:`micro6`), so the render is floor(x*100+0.5)/100 — oracle
    twins must spell the same FLOOR form, not ROUND."""
    c = F.col(col) if isinstance(col, str) else col
    q = F.sum(dec2(c)).cast("double") / F.count(c).cast("double")
    return (F.floor(q * F.lit(100.0) + F.lit(0.5)) / F.lit(100.0)).alias(alias)


def bsum(col: Column | str, alias: str) -> Column:
    """BIGINT-typed sum (DuckDB would return HUGEINT without the cast)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c).cast("bigint").alias(alias)


# --- deterministic token / text helpers (text analysis + dedup surface) ---

TOKEN_RE = "[^a-z]+"


def tokens(col: Column | str) -> Column:
    """Lowercased [a-z]+ tokens of a text column as an array<string>.

    ``split`` on the complement class leaves '' at the edges; callers
    filter those after explode (matches DuckDB string_split_regex).
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.split(F.lower(c), TOKEN_RE)


# Polynomial rolling hash over a string, identical in Spark and DuckDB SQL:
#   h = fold(chars, 0, (acc, ch) -> (acc * 31 + unicode(ch)) % 2^31-1)
# Used for document fingerprinting / minhash where both engines must agree
# (neither engine's built-in hash() matches the other's).
HASH_MOD = 2_147_483_647  # 2^31 - 1, keeps acc*31+cp < 2^63 (no overflow)


def poly_hash(col: Column | str) -> Column:
    """Deterministic 31-polynomial string hash, JVM-side via aggregate()."""
    c = F.col(col) if isinstance(col, str) else col
    return F.aggregate(
        F.transform(F.split(c, ""), lambda ch: F.ascii(ch).cast("bigint")),
        F.lit(0).cast("bigint"),
        lambda acc, cp: (acc * F.lit(31) + cp) % F.lit(HASH_MOD),
    )


def poly_hash_sql(expr: str) -> str:
    """DuckDB-SQL twin of :func:`poly_hash` over a string expression.

    The CASE guard totalizes the empty string: DuckDB's unicode('') is
    -1 where Spark's ascii('') is 0 (only reachable for '' input —
    char-split never yields '' elements otherwise)."""
    return (
        f"list_reduce(list_prepend(0::BIGINT, "
        f"list_transform(string_split({expr}, ''), "
        f"ch -> CASE WHEN ch = '' THEN 0::BIGINT ELSE unicode(ch)::BIGINT END)), "
        f"(acc, cp) -> (acc * 31 + cp) % {HASH_MOD})"
    )


# --- vector helpers (similarity surface) ---


def dot(a: Column, b: Column) -> Column:
    """Dot product of two array<float> columns via zip_with + aggregate.

    Double accumulation left-to-right; with ROUND at the final render both
    engines agree (SURVEY §7 risk register: FP determinism).
    """
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


# --- document-frequency cut (near-dup / decontamination scale mechanism) ---


def df_cut(df, key: str, max_df: int):
    """Drop rows whose ``key`` value occurs in more than ``max_df`` rows.

    Callers pass distinct (doc, key) rows, so the per-key count IS
    document frequency. This is the mechanism that keeps shared-key
    self-joins bounded at any corpus size (max_df² pairs per key); the
    window shuffles by ``key`` — the same hash the downstream join uses,
    so the cut adds no extra exchange. Shared by q26/q45/q78 with
    :func:`df_cut_sql` as the oracle-side twin.
    """
    from pyspark.sql import Window as W

    w = W.partitionBy(key)
    return (
        df.withColumn("_df", F.count("*").over(w))
        .filter(F.col("_df") <= max_df)
        .drop("_df")
    )


def df_cut_sql(key: str, max_df: int) -> str:
    """DuckDB QUALIFY clause mirroring :func:`df_cut`."""
    return f"QUALIFY COUNT(*) OVER (PARTITION BY {key}) <= {max_df}"


# --- 6-dp deterministic mean (embedding centroid recipe) ---


def micro6(col: Column | str) -> Column:
    """Quantize a double to integer micro-units: floor(x*1e6 + 0.5).

    Pure IEEE ops (multiply, add, floor) — bit-identical across engines
    at ANY input. ``ROUND(double, 6)`` is NOT: Spark rounds the
    shortest decimal repr (BigDecimal.valueOf) while DuckDB multiplies
    by 1e6 and rounds the double product, and the two disagree on
    near-tie values (measured: mean 0.616992/192 = 0.0032134999999999998
    renders 0.003213 in Spark, 0.003214 in DuckDB — a real sf0.1
    failure). Sums of short decimals divided by counts land on such
    ties easily, so every final rendering of a sum/count mean goes
    through this quantization instead of ROUND. Twin: :func:`micro6_sql`.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.floor(c.cast("double") * F.lit(1e6) + F.lit(0.5))


def micro6_sql(expr: str) -> str:
    return f"CAST(FLOOR(CAST({expr} AS DOUBLE) * 1000000 + 0.5) AS BIGINT)"


def qround(col: Column | str, ndigits: int) -> Column:
    """Deterministic cross-engine rounding: floor(x*10^n + 0.5)/10^n.

    Use instead of ROUND when the value can sit on an exact decimal
    tie — quantile interpolation of 2-dp prices (frac 0.5 → x.xx5),
    fences derived as 1.5x a 2-dp IQR, ratios of decimal-exact sums.
    ROUND diverges across engines on those ties (see :func:`micro6`);
    irrational-valued expressions (ln, sqrt, corr, cosine) stay on
    ROUND — their tie probability is ~1e-11 and the oracles spell ROUND
    today. Twin: :func:`qround_sql`.
    """
    c = F.col(col) if isinstance(col, str) else col
    scale = 10**ndigits
    return F.floor(c.cast("double") * F.lit(float(scale)) + F.lit(0.5)) / F.lit(
        float(scale)
    )


def qround_sql(expr: str, ndigits: int) -> str:
    scale = 10**ndigits
    return f"FLOOR(CAST({expr} AS DOUBLE) * {scale} + 0.5) / {scale}"


def mean6(col: Column | str) -> Column:
    """Order-independent, engine-identical 6-dp mean of a float column.

    Recipe: quantize each value to integer micro-units via
    :func:`micro6` (deterministic where ROUND is not — see its doc),
    sum the integers (exact, associative — a 10,000-partition sum
    equals a sequential one), average in double, re-quantize the mean
    to whole micros, render as micros/1e6 (single IEEE division).
    Twin: :func:`mean6_sql`.
    """
    c = F.col(col) if isinstance(col, str) else col
    s = F.sum(micro6(c)).cast("double")
    return F.floor(s / F.count("*") + F.lit(0.5)) / F.lit(1e6)


def mean6_sql(expr: str) -> str:
    """DuckDB twin of :func:`mean6` over a SQL expression."""
    return (
        f"FLOOR(CAST(SUM({micro6_sql(expr)}) AS DOUBLE)"
        f" / COUNT(*) + 0.5) / 1000000"
    )


# --- overlapping chunk grid (RAG prep) -------------------------------------
# ONE grid shared by the chunker (q186) and chunk retrieval (q188): chunk
# ids are (doc_id, start), a pure function of content position, and the
# interchangeability of those ids across queries holds only while both
# read the grid from here.

CHUNK_CHARS = 600
CHUNK_STRIDE = 480  # 20% overlap between consecutive chunks


def chunk_starts(col: Column | str) -> Column:
    """0-based start offsets of the overlapping chunk grid over a text
    column, as an array (explode for one row per chunk). Empty text
    still yields one chunk at start 0. Twin: :func:`chunk_starts_sql`."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sequence(
        F.lit(0),
        F.greatest(F.length(c) - 1, F.lit(0)),
        F.lit(CHUNK_STRIDE),
    )


def chunk_starts_sql(expr: str) -> str:
    """DuckDB lateral-unnest fragment mirroring :func:`chunk_starts`
    (append ``AS u(s)`` at the call site)."""
    return f"unnest(range(0, greatest(length({expr}), 1), {CHUNK_STRIDE}))"


def chunk_text(col: Column | str, start: Column) -> Column:
    """The chunk's text at a 0-based grid offset. Twin:
    :func:`chunk_text_sql`."""
    c = F.col(col) if isinstance(col, str) else col
    return c.substr(start + 1, F.lit(CHUNK_CHARS))


def chunk_text_sql(expr: str, start_expr: str) -> str:
    return (
        f"substring({expr}, CAST({start_expr} AS INTEGER) + 1, "
        f"{CHUNK_CHARS})"
    )


def epoch_us(col: Column | str) -> Column:
    """Microseconds since 1970-01-01 00:00:00, timestamp-type-agnostic.

    ``F.unix_micros`` accepts only TIMESTAMP (LTZ) and raises
    DATATYPE_MISMATCH on TIMESTAMP_NTZ — which is exactly what a naive
    ``timestamp[us]`` parquet column becomes under
    ``spark.sql.parquet.inferTimestampNTZ.enabled`` (the driver's
    session reads the testdata that way). Diffing against the NTZ epoch
    after an explicit NTZ cast works for both types: NTZ input is a
    no-op cast (no session-timezone dependency at all), LTZ input
    renders through the session zone (UTC in this engine, session.py),
    so both agree with the DuckDB oracle's naive-µs ``epoch`` semantics.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.timestamp_diff(
        "MICROSECOND",
        F.lit("1970-01-01 00:00:00").cast("timestamp_ntz"),
        c.cast("timestamp_ntz"),
    )
