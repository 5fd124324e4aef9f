"""Change-data-capture apply: compact a multi-version change feed
(latest-wins per key) and merge it into a snapshot with full
insert / update / delete semantics.

Extends the C family (joins/merge — SURVEY.md §2-C; c11 is SCD-1 upsert,
c14 is SCD-2 history): this is the lakehouse MERGE shape that also
handles deletes and out-of-order duplicate change records, i.e. what a
Debezium/stream-ingest compaction job runs at every sync point.

Scale design (100 TB): compaction is one key-partitioned window over the
feed (the feed is the small side — a day of changes, not the snapshot);
the apply is a single full-outer shuffle join keyed on the primary key.
Snapshot-side partitioning by key (bucketing) makes the join co-located,
and the op filter drops deleted keys before any downstream agg sees
them. No driver materialization, no iteration.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def cdc_compact(
    changes: DataFrame, key: str, seq: str, op_col: str = "op"
) -> DataFrame:
    """Latest-wins compaction: keep only the highest-``seq`` change per
    key. The window order is TOTAL — (seq, op, *payload columns) all
    descending — so the winner is deterministic under any partitioning,
    spill, or retry. Feeds should never emit two ops at one seq, but the
    operator must not be order-dependent if they do: without the payload
    tiebreak, two changes with identical (key, seq, op) but different
    payloads would get an arbitrary row_number winner that only LOOKED
    stable because a single-partition window sort happens to be stable."""
    from pyspark.sql.types import ArrayType, MapType, StructType

    def orderable(dt) -> bool:
        if isinstance(dt, MapType):
            return False
        if isinstance(dt, ArrayType):
            return orderable(dt.elementType)
        if isinstance(dt, StructType):
            return all(orderable(f.dataType) for f in dt.fields)
        return True

    # unorderable payload types (maps, nested maps) sort via their
    # canonical JSON text; everything else orders natively
    tiebreak = [
        F.desc(fld.name) if orderable(fld.dataType) else F.desc(F.to_json(fld.name))
        for fld in changes.schema.fields
        if fld.name not in (key, seq, op_col)
    ]
    w = Window.partitionBy(key).orderBy(F.desc(seq), F.desc(op_col), *tiebreak)
    return (
        changes.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def cdc_apply(
    base: DataFrame,
    latest: DataFrame,
    key: str,
    payload_cols: list[str],
    op_col: str = "op",
) -> DataFrame:
    """Apply a compacted change feed to a snapshot:

    - op 'D' removes the key;
    - op 'I'/'U' takes the change's payload (insert if the key is new);
    - keys without a change keep the snapshot payload.

    Returns (key, *payload_cols).
    """
    lat = latest.select(
        F.col(key).alias("_ck"),
        F.col(op_col).alias("_op"),
        *[F.col(c).alias(f"_c_{c}") for c in payload_cols],
    )
    joined = base.join(lat, base[key] == lat["_ck"], "full_outer")
    # payload selection keys on the OP being present, not on the payload
    # value: an update that sets a column to NULL must win over the
    # snapshot value (coalesce would silently resurrect it)
    return joined.filter(
        F.coalesce(F.col("_op"), F.lit("K")) != F.lit("D")
    ).select(
        F.coalesce(base[key], F.col("_ck")).alias(key),
        *[
            F.when(F.col("_op").isNotNull(), F.col(f"_c_{c}"))
            .otherwise(base[c])
            .alias(c)
            for c in payload_cols
        ],
    )
