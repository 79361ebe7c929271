"""The ONE Delta-CDF change classifier both table stores share.

Every CDC surface in the engine — the copy-on-write store's
snapshot-diff :func:`~parquet_demo_spark.sources.merge_store.changes_between`,
its per-commit stored-feed materialization (``_derive_changes``), and
the merge-on-read store's log-derived
:meth:`~parquet_demo_spark.sources.mor_store.MergeOnReadStore.changes_between`
— emits rows under the same law (Delta Lake's Change Data Feed
tagging, public `delta-io` semantics):

- a candidate key absent from the old state → ``insert``
- present with any non-key column changed → ``update_postimage``
  (+ the old row as ``update_preimage`` when requested)
- an upsert whose row EQUALS its old row → dropped (a rewrite is not
  a change; the feed reports state transitions, not write attempts)
- a key present in the old state and gone from the new → ``delete``
  (the old row), and a delete of an absent key → dropped (a no-op
  tombstone must not surface)

Round 13 shipped that law as three hand-mirrored copies (the r13
review's own deferred finding); this module is the extraction —
either store hands the classifier its resolved candidate frames and
gets the tagged feed back. All comparisons are ``eqNullSafe`` (NULL is
a value, per the stores' PK law), and old-row presence is tracked by
an explicit tag column rather than a key column's nullness, so a
matched old row with NULL key columns can never masquerade as an
insert.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

CHANGE_TYPE = "_change_type"


def classify_changes(
    pre: DataFrame | None,
    post_u: DataFrame,
    gone: DataFrame | None,
    cols: list[str],
    keys: list[str],
    include_preimages: bool,
) -> DataFrame:
    """Tag candidate rows with their Delta-CDF change type.

    ``pre`` holds the candidate keys' OLD rows (``None`` when no old
    state exists — every ``post_u`` row is then an insert), ``post_u``
    the candidate keys' NEW upsert rows, ``gone`` the already-resolved
    OLD rows of deleted keys (``None`` for surfaces that cannot delete,
    e.g. a merge commit's feed). All three frames carry exactly
    ``cols``; the result carries ``cols + [_change_type]``.

    The candidate frames are expected to be per-key resolved (one row
    per key on each side) — the callers' snapshot/LWW machinery owns
    that; this function owns only the classification law, so the law
    can never drift between stores again.
    """
    deletes = (
        gone.select(*cols).withColumn(CHANGE_TYPE, F.lit("delete"))
        if gone is not None
        else None
    )
    if pre is None:
        post = post_u.select(*cols).withColumn(
            CHANGE_TYPE, F.lit("insert")
        )
        return post if deletes is None else post.unionByName(deletes)
    old_tagged = pre.select(
        F.lit(1).alias("__old_present"),
        *[F.col(c).alias(f"__old_{c}") for c in cols],
    )
    cond = [F.col(k).eqNullSafe(F.col(f"__old_{k}")) for k in keys]
    joined = post_u.select(*cols).join(old_tagged, cond, "left")
    differs = F.lit(False)
    for c in cols:
        if c not in keys:
            differs = differs | ~F.col(c).eqNullSafe(
                F.col(f"__old_{c}")
            )
    is_insert = F.col("__old_present").isNull()
    changed = joined.filter(is_insert | differs)
    out = changed.withColumn(
        CHANGE_TYPE,
        F.when(is_insert, F.lit("insert")).otherwise(
            F.lit("update_postimage")
        ),
    ).select(*cols, CHANGE_TYPE)
    if include_preimages:
        pres = (
            changed.filter(~is_insert)
            .select(*[F.col(f"__old_{c}").alias(c) for c in cols])
            .withColumn(CHANGE_TYPE, F.lit("update_preimage"))
        )
        out = out.unionByName(pres)
    return out if deletes is None else out.unionByName(deletes)
