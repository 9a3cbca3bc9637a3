"""Change-data-capture apply: fold a change feed (insert/update/delete
events with per-key sequence numbers) onto a base snapshot.

The reference's serving layer re-loads whole tables per run
(`/root/reference/dags/coin_data_pipeline_optimized.py` rebuilds the
coin table and upserts row-by-row); a 100 TB lakehouse instead applies
an incremental change feed to the previous snapshot. This operator is
that apply step, expressed as one partial-aggregable reduction:

    snapshot' = latest-op-per-key(base-as-version-0 UNION feed),
                dropping keys whose winning op is a delete.

Scale design
------------
* ONE shuffle, keyed on the primary key: `groupBy(key).agg(max_by(...))`
  runs with map-side partial aggregation, so each executor first
  collapses its local ops per key and only the per-key winners cross
  the wire — the feed (small) never forces a re-shuffle of the base
  beyond the single key-partitioned exchange.
* No window function: `max_by(struct(op, payload...), seq)` is an
  ordinary aggregate, cheaper than row_number-over-partition because it
  needs no per-key sort buffer, only a running max.
* Deterministic: callers must supply unique `seq` per key within the
  feed (CDC logs do — it's the log offset); the base snapshot enters at
  version 0, below every feed sequence.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

OP_DELETE = "D"


def apply_changes(
    base: DataFrame,
    feed: DataFrame,
    key: str,
    seq_col: str = "seq",
    op_col: str = "op",
) -> DataFrame:
    """Apply a change feed onto ``base`` and return the new snapshot.

    ``feed`` must carry ``key``, every payload column of ``base``,
    ``seq_col`` (BIGINT, unique per key, > 0) and ``op_col`` ('I'/'U'
    upsert, 'D' delete). The result has the base's columns plus
    ``version`` = the highest applied sequence per key (0 for untouched
    base rows).
    """
    payload = [c for c in base.columns if c != key]
    cols = [key, *payload, seq_col, op_col]
    versioned_base = base.withColumns(
        {seq_col: F.lit(0).cast("bigint"), op_col: F.lit("I")}
    ).select(*cols)
    union = versioned_base.unionByName(feed.select(*cols))
    winners = union.groupBy(key).agg(
        F.max_by(F.struct(op_col, *payload), F.col(seq_col)).alias("_w"),
        F.max(seq_col).cast("bigint").alias("version"),
    )
    return winners.where(F.col(f"_w.{op_col}") != OP_DELETE).select(
        key, *[F.col(f"_w.{c}").alias(c) for c in payload], "version"
    )
