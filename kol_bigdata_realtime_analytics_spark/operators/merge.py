"""MERGE INTO — apply a keyed changelog (upserts + deletes) to a base table.

The lakehouse maintenance primitive the reference performs implicitly by
re-overwriting Silver tables from scratch every run (`batch/etl/
bronze_to_silver.py:122-140` re-derives the full table to apply what is
really a small daily delta); Iceberg/Delta spell it ``MERGE INTO``. Here it
is one composable operator with the scale-correct physical shape.

Scale shape — the base table NEVER shuffles. The naive plan is a full-outer
join on the key (one shuffle of base + delta); but a CDC batch is orders of
magnitude smaller than the table it amends, so the merge decomposes into

  1. base LEFT JOIN broadcast(delta)  — carry / update / delete per row,
  2. delta upserts ANTI JOIN broadcast(base-keys … no: anti join runs
     broadcast the *delta* side again (left_anti preserves the delta side),
  3. UNION the surviving base rows with the fresh inserts.

Both joins broadcast the delta; the 100-TB base is read once, streamed
through two codegen'd stages, and written back partition-aligned. When the
delta is genuinely large (backfill), pass ``broadcast_delta=False`` and the
same logical plan runs as two hash-shuffle joins keyed on the merge key —
bucket both tables by that key at write time and even those exchanges
disappear.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def merge_changelog(
    base: DataFrame,
    delta: DataFrame,
    key: str,
    op_col: str = "op",
    upsert_op: str = "U",
    delete_op: str = "D",
    broadcast_delta: bool = True,
) -> DataFrame:
    """Apply ``delta`` (key + op + full payload columns) onto ``base``.

    Semantics (ANSI/Delta MERGE with the three standard clauses):
      - key matched,     op=U -> row replaced by the delta payload
      - key matched,     op=D -> row deleted
      - key not matched, op=U -> row inserted
      - key not matched, op=D -> no-op
      - key only in base      -> row carried unchanged

    ``delta`` must carry the same payload columns as ``base`` (values for
    delete rows are ignored). Output schema = base schema + ``merge_action``
    (carry|update|insert) so callers can audit what the merge did.
    """
    payload = [c for c in base.columns if c != key]
    d = delta.select(
        F.col(key),
        F.col(op_col).alias("__op"),
        *[F.col(c).alias(f"__new_{c}") for c in payload],
    )
    d_b = F.broadcast(d) if broadcast_delta else d

    matched = base.join(d_b, key, "left")
    survivors = matched.filter(
        F.col("__op").isNull() | (F.col("__op") != F.lit(delete_op))
    ).select(
        F.col(key),
        *[
            F.when(F.col("__op") == upsert_op, F.col(f"__new_{c}"))
            .otherwise(F.col(c))
            .alias(c)
            for c in payload
        ],
        F.when(F.col("__op") == upsert_op, F.lit("update"))
        .otherwise(F.lit("carry"))
        .alias("merge_action"),
    )

    upserts = delta.filter(F.col(op_col) == upsert_op)
    if broadcast_delta:
        # Inserts = upserts whose key is NOT in base. Anti-joining the delta
        # against base keys directly would shuffle the 100-TB base's key
        # column; instead reuse the broadcast join above to find which
        # upsert keys ARE in base (a result bounded by |delta|), broadcast
        # THAT, and anti-join the delta against it. Base never shuffles.
        matched_upsert_keys = matched.filter(F.col("__op") == upsert_op).select(key)
        inserts_src = upserts.join(F.broadcast(matched_upsert_keys), key, "left_anti")
    else:
        inserts_src = upserts.join(base.select(key), key, "left_anti")
    inserts = inserts_src.select(
        F.col(key), *payload, F.lit("insert").alias("merge_action")
    )
    return survivors.unionByName(inserts)


def changelog_from_snapshots(
    old: DataFrame, new: DataFrame, key: str, fingerprint: Column
) -> DataFrame:
    """Derive the minimal changelog that turns snapshot ``old`` into ``new``:
    upserts for added/changed keys, deletes for vanished keys. The inverse of
    :func:`merge_changelog` — ``merge(old, changelog) == new``. One
    full-outer join on fingerprinted keys; at scale run it per partition of
    a shared partitioning (both snapshots bucketed by key)."""
    o = old.select(F.col(key), fingerprint.alias("__old_fp"))
    n = new.select(*new.columns, fingerprint.alias("__new_fp"))
    j = n.join(o, key, "full_outer")
    return (
        j.filter(F.col("__new_fp").isNull() | (~F.col("__new_fp").eqNullSafe(F.col("__old_fp"))))
        .withColumn(
            "op", F.when(F.col("__new_fp").isNull(), F.lit("D")).otherwise(F.lit("U"))
        )
        .drop("__old_fp", "__new_fp")
    )
