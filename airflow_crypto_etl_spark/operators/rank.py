"""Distributed total-order rank statistics (row_number / ntile /
percent_rank / per-group rank / per-group running sum / exact
per-group percentiles) with NO single-partition sort.

The naive Spark form of an exact rank statistic —
``row_number().over(Window.orderBy(...))`` — plans an unpartitioned
WindowExec: "Moving all data to a single partition", one worker sorts
the whole relation. Fine at sf0.1, fatal at 100 TB. This module is the
two-pass replacement the round-5 verdict asked for, with one design
change that matters for correctness:

**Why literal boundaries instead of repartitionByRange.** The obvious
primitive (``repartitionByRange`` + ``sortWithinPartitions`` + per-
partition counts + offset-added rank) has a replay hazard: Spark's
RangePartitioner draws its reservoir sample with a seed derived from
the shuffle RDD's id, and every action re-plans the query into fresh
RDDs. The counts job and the final job therefore sample boundaries
INDEPENDENTLY — on a nondeterministically-ordered upstream (any hash
aggregate) the two jobs can disagree about which partition a row lands
in, silently corrupting the offsets. Instead we make bucket assignment
a PURE FUNCTION of the row: boundary split points are collected ONCE
(one ``approx_percentile`` job, bounded output) and embedded as plan
literals; any number of jobs then agree by construction. Boundary
quality only affects balance, never correctness.

Heavy keys: a value that spans multiple quantile boundaries (e.g.
``m_cents = 0`` for every non-purchasing user) would collapse into one
giant bucket. Duplicated boundaries are therefore sub-split by the
tiebreak column's quantiles within that value (one extra bounded agg),
so even a majority-mass value spreads over many buckets.

Pass 2 collects per-(bucket[, group]) counts/sums — bounded by
``buckets × |groups|`` rows — and turns them into literal offsets, so
the published plan is ONE partitioned window over balanced buckets
plus codegen'd literal arithmetic: no unpartitioned WindowExec, no
broadcast side, no second shuffle. The tradeoff is two bounded driver
jobs per call (the input relation is computed for the boundary and
cell passes); callers ranking an expensive relation should cache it
(``operators.dedup.register_cache``).

Order keys MUST form a total order (include a unique tiebreak) — that
is also what makes the statistics engine-reproducible, and every call
site in the query registry already does.

Provenance: engine extension (the reference's pandas callables sort
in-memory, e.g. `/root/reference/dags/coin_data_pipeline_optimized.py`
rank-style post-processing); the two-pass distributed rank is the
classic parallel-sort offset construction (TeraSort-style).
"""

from __future__ import annotations

from collections import Counter
from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# (column name, ascending) — the public order spec. Nulls unsupported
# (rank statistics over aggregates never produce them here).
OrderSpec = Sequence[tuple[str, bool]]

_PCT_ACCURACY = 10000
_MAX_HEAVY = 16
_FALLBACK_BUCKETS = 32
# driver state is buckets × |groups| cells; 128 quantile buckets keep
# that bounded while still splitting any realistic sort across a fleet
_MAX_BUCKETS = 128


def _n_buckets(df: DataFrame, buckets: int | None) -> int:
    if buckets is not None:
        return max(1, min(buckets, _MAX_BUCKETS))
    try:
        n = int(df.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    except (TypeError, ValueError):
        n = _FALLBACK_BUCKETS
    return max(1, min(n, _MAX_BUCKETS))


def _order_exprs(order: OrderSpec) -> list[Column]:
    return [F.col(c).asc() if asc else F.col(c).desc() for c, asc in order]


def _splits(df: DataFrame, order: OrderSpec, nb: int) -> list[tuple]:
    """Driver pass 1: split points ``(lead_value, tie_value | None)``
    from one bounded approx_percentile job; duplicated boundaries
    (heavy lead values) are sub-split by tiebreak quantiles."""
    if nb <= 1:
        return []
    lead = order[0][0]
    probs = [i / nb for i in range(1, nb)]
    row = df.agg(
        F.percentile_approx(F.col(lead), probs, _PCT_ACCURACY).alias("b")
    ).first()
    bounds = list(row["b"]) if row is not None and row["b"] is not None else []
    if not bounds:
        return []
    mult = Counter(bounds)
    heavy = [v for v in sorted(mult) if mult[v] >= 2][:_MAX_HEAVY]
    tie_sub: dict = {}
    if heavy and len(order) > 1:
        tie_col = order[1][0]
        aggs = [
            F.percentile_approx(
                F.when(F.col(lead) == F.lit(v), F.col(tie_col)),
                [j / (mult[v] + 1) for j in range(1, mult[v] + 1)],
                _PCT_ACCURACY,
            ).alias(f"__t{i}")
            for i, v in enumerate(heavy)
        ]
        trow = df.agg(*aggs).first()
        for i, v in enumerate(heavy):
            vals = trow[f"__t{i}"]
            if vals:
                tie_sub[v] = sorted(set(vals))
    splits: list[tuple] = []
    for v in sorted(mult):
        if v in tie_sub:
            splits.extend((v, t) for t in tie_sub[v])
        else:
            splits.append((v, None))
    return splits


def _beyond(split: tuple, order: OrderSpec) -> Column:
    """Row strictly beyond ``split`` in ORDER direction (bucket
    indicator). Monotone w.r.t. the full lexicographic order, so the
    indicator sum is a valid bucket index for any split set."""
    lead, lead_asc = order[0]
    v, t = split
    lead_gt = F.col(lead) > F.lit(v) if lead_asc else F.col(lead) < F.lit(v)
    if t is None:
        return lead_gt
    tie, tie_asc = order[1]
    tie_gt = F.col(tie) > F.lit(t) if tie_asc else F.col(tie) < F.lit(t)
    return lead_gt | ((F.col(lead) == F.lit(v)) & tie_gt)


def _bucket_col(splits: list[tuple], order: OrderSpec) -> Column:
    b: Column = F.lit(0)
    for s in splits:
        b = b + _beyond(s, order).cast("int")
    return b


def _when_chain(key_cols: Sequence[str], mapping: dict, default) -> Column:
    """CASE chain ``(key_tuple) -> literal`` for SMALL mappings
    (|groups| entries), evaluated in whole-stage codegen."""
    expr: Column = F.lit(default)
    for key, val in mapping.items():
        cond = None
        for c, k in zip(key_cols, key):
            eq = F.col(c) == F.lit(k)
            cond = eq if cond is None else cond & eq
        expr = F.when(cond, F.lit(val)).otherwise(expr)
    return expr


def _offset_join(
    d: DataFrame, key_cols: Sequence[str], mapping: dict, out_col: str
) -> DataFrame:
    """Attach a literal BIGINT per key tuple via a broadcast equi-join
    of a driver-built bounded table (buckets × groups rows). A CASE
    chain would also work but makes the optimizer chew on thousands of
    nested conditionals when the bucket count is large — the join form
    is O(1) expression depth at any scale."""
    from pyspark.sql.types import LongType, StructField, StructType

    fields = [StructField(c, d.schema[c].dataType) for c in key_cols]
    fields.append(StructField(out_col, LongType()))
    schema = StructType(fields)
    rows = [tuple(k) + (int(v),) for k, v in mapping.items()]
    lut = d.sparkSession.createDataFrame(rows, schema)
    joined = d.join(F.broadcast(lut), on=list(key_cols), how="left")
    return joined.withColumn(out_col, F.coalesce(F.col(out_col), F.lit(0).cast("long")))


def _rank_frame(
    df: DataFrame, order: OrderSpec, out: str, buckets: int | None
) -> tuple[DataFrame, int]:
    """Shared core: df + global 1-based row_number (BIGINT ``out``),
    plus the driver-known total row count."""
    nb = _n_buckets(df, buckets)
    splits = _splits(df, order, nb)
    bucket = _bucket_col(splits, order)
    cells = (
        df.select(bucket.alias("__gr_b"))
        .groupBy("__gr_b")
        .agg(F.count(F.lit(1)).alias("__c"))
        .collect()
    )
    offsets: dict[tuple, int] = {}
    run = 0
    for r in sorted(cells, key=lambda r: r["__gr_b"]):
        offsets[(r["__gr_b"],)] = run
        run += r["__c"]
    d = _offset_join(df.withColumn("__gr_b", bucket), ["__gr_b"], offsets, "__gr_off")
    w = Window.partitionBy("__gr_b").orderBy(*_order_exprs(order))
    return (
        d.withColumn(out, F.row_number().over(w).cast("long") + F.col("__gr_off"))
        .drop("__gr_b", "__gr_off"),
        run,
    )


def ranked(
    df: DataFrame, order: OrderSpec, out: str = "rn", buckets: int | None = None
) -> DataFrame:
    """Global 1-based row_number over a total order, distributed: one
    partitioned window over quantile-balanced buckets + literal
    offsets. Exact twin of ``row_number().over(Window.orderBy(...))``
    for unique order keys, with no single-partition sort."""
    return _rank_frame(df, order, out, buckets)[0]


def ranked_ntile(
    df: DataFrame,
    order: OrderSpec,
    k: int,
    out: str = "ntile",
    buckets: int | None = None,
) -> DataFrame:
    """Distributed exact ``ntile(k)``: SQL semantics (first ``n % k``
    tiles carry one extra row), derived from the global row_number and
    the driver-known total by pure integer literal arithmetic."""
    d, n = _rank_frame(df, order, "__gr_rn", buckets)
    base, rem = divmod(n, k)
    rn = F.col("__gr_rn")
    if n == 0:
        tile: Column = F.lit(None).cast("int")
    elif base == 0:
        tile = rn.cast("int")
    else:
        cutoff = rem * (base + 1)
        big = F.expr(f"(__gr_rn + {base}) DIV {base + 1}")
        small = F.expr(f"{rem} + (__gr_rn - {cutoff} + {base} - 1) DIV {base}")
        tile = (F.when(rn <= F.lit(cutoff), big).otherwise(small)).cast("int")
    return d.withColumn(out, tile).drop("__gr_rn")


def ranked_percent_rank(
    df: DataFrame, order: OrderSpec, out: str = "p", buckets: int | None = None
) -> DataFrame:
    """Distributed exact ``percent_rank()``: (rn−1)/(n−1) with the
    driver-known total as a literal — the identical IEEE division the
    window function performs, so values hash-match the oracle."""
    d, n = _rank_frame(df, order, "__gr_rn", buckets)
    if n <= 1:
        p: Column = F.lit(0.0)
    else:
        p = (F.col("__gr_rn") - F.lit(1)).cast("double") / F.lit(float(n - 1))
    return d.withColumn(out, p).drop("__gr_rn")


def _group_cells(
    df: DataFrame,
    group_cols: Sequence[str],
    order: OrderSpec,
    buckets: int | None,
    sum_col: str | None = None,
) -> tuple[Column, list]:
    """Shared per-group core: buckets come from the ORDER columns only
    (numeric, globally quantile-balanced — group columns may be any
    type); one bounded cells job keyed (bucket, *groups) with counts
    (and an optional exact sum), returned in bucket-ascending order so
    callers can accumulate per-group carry-ins."""
    nb = _n_buckets(df, buckets)
    splits = _splits(df, list(order), nb)
    bucket = _bucket_col(splits, list(order))
    aggs = [F.count(F.lit(1)).alias("__c")]
    if sum_col is not None:
        aggs.append(F.sum(sum_col).alias("__s"))
    cells = df.groupBy(bucket.alias("__gr_b"), *group_cols).agg(*aggs).collect()
    cells.sort(key=lambda r: r["__gr_b"])
    return bucket, cells


def grouped_rank(
    df: DataFrame,
    group_cols: Sequence[str],
    order: OrderSpec,
    out: str = "rn",
    buckets: int | None = None,
) -> DataFrame:
    """Per-group 1-based row_number withOUT one-partition-per-group:
    rows bucket by the order columns' quantiles (monotone w.r.t. the
    order), the window partitions by (bucket, *groups) — balanced even
    when there are only 3 giant groups — and each cell adds a literal
    carry-in: the count of same-group rows in earlier buckets. Exact
    twin of ``row_number().over(Window.partitionBy(*groups)
    .orderBy(...))``. Driver state is bounded by buckets × |groups| —
    group cardinality must be modest (with plentiful groups the plain
    partitioned window is already balanced; use that)."""
    bucket, cells = _group_cells(df, group_cols, order, buckets)
    carry: dict[tuple, int] = {}
    seen: dict[tuple, int] = {}
    for r in cells:
        g = tuple(r[c] for c in group_cols)
        carry[(r["__gr_b"],) + g] = seen.get(g, 0)
        seen[g] = seen.get(g, 0) + r["__c"]
    d = _offset_join(
        df.withColumn("__gr_b", bucket), ["__gr_b", *group_cols], carry, "__gr_cin"
    )
    w = Window.partitionBy("__gr_b", *group_cols).orderBy(*_order_exprs(order))
    return (
        d.withColumn(out, F.row_number().over(w).cast("long") + F.col("__gr_cin"))
        .drop("__gr_b", "__gr_cin")
    )


def grouped_cumsum(
    df: DataFrame,
    group_cols: Sequence[str],
    order: OrderSpec,
    value_col: str,
    out: str = "cum",
    total_out: str | None = None,
    buckets: int | None = None,
) -> DataFrame:
    """Per-group running sum (ROWS UNBOUNDED PRECEDING → CURRENT) over
    a total order, distributed: within-(bucket, group) running sums
    from ONE partitioned window + literal carry-in offsets (the exact
    sum of the group's mass in earlier buckets, from the bounded cells
    pass). ``total_out`` optionally emits the group's grand total as a
    literal (what `sum() over (partition by g)` would cost another
    pass for). Exact for integer values (the call sites quantize
    first); group cardinality must be modest."""
    bucket, cells = _group_cells(df, group_cols, order, buckets, sum_col=value_col)
    carry: dict[tuple, int] = {}
    totals: dict[tuple, int] = {}
    for r in cells:
        g = tuple(r[c] for c in group_cols)
        s = r["__s"] or 0
        carry[(r["__gr_b"],) + g] = totals.get(g, 0)
        totals[g] = totals.get(g, 0) + s
    d = _offset_join(
        df.withColumn("__gr_b", bucket), ["__gr_b", *group_cols], carry, "__gr_cin"
    )
    w = (
        Window.partitionBy("__gr_b", *group_cols)
        .orderBy(*_order_exprs(order))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    d = d.withColumn(out, F.sum(value_col).over(w).cast("long") + F.col("__gr_cin"))
    if total_out is not None:
        d = d.withColumn(
            total_out, _when_chain(list(group_cols), totals, 0).cast("long")
        )
    return d.drop("__gr_b", "__gr_cin")


def grouped_percentiles(
    df: DataFrame,
    group_col: str,
    value_col: str,
    ps: Sequence[float],
    tiebreak: str,
    buckets: int | None = None,
) -> DataFrame:
    """Exact per-group percentiles (SQL ``percentile`` / DuckDB
    ``quantile_cont`` type-7 interpolation) without concentrating each
    group into one sort task — the measured q_winsorize 100 TB lesson
    (BASELINE.md: the per-group exact sort rode spill thresholds at the
    4× probe). The group's sorted positions come from ``grouped_rank``
    over (value, tiebreak); only the two covering rows per (group, p)
    survive the filter, and the interpolation fractions are literals.
    Output: one row per group with ``p_<pct>`` columns."""
    order: OrderSpec = [(value_col, True), (tiebreak, True)]
    bucket, cells = _group_cells(df, [group_col], order, buckets)
    carry: dict[tuple, int] = {}
    group_n: dict = {}
    for r in cells:
        g = r[group_col]
        carry[(r["__gr_b"], g)] = group_n.get(g, 0)
        group_n[g] = group_n.get(g, 0) + r["__c"]
    d = _offset_join(
        df.withColumn("__gr_b", bucket), ["__gr_b", group_col], carry, "__gr_cin"
    )
    w = Window.partitionBy("__gr_b", group_col).orderBy(*_order_exprs(order))
    rn = F.row_number().over(w).cast("long") + F.col("__gr_cin")
    d = d.withColumn("__gr_rn", rn)
    # covering ranks per (group, p): pos = p·(n−1), rows floor(pos)+1
    # and ceil(pos)+1; keep only those rows, then assemble literally
    need: dict = {}  # group -> set of ranks
    plan: dict = {}  # (group, p) -> (floor_rank, ceil_rank, frac)
    for g, n in group_n.items():
        for p in ps:
            pos = p * (n - 1)
            fr, cr = int(pos) + 1, -int(-pos // 1) + 1
            frac = pos - int(pos)
            plan[(g, p)] = (fr, cr, frac)
            need.setdefault(g, set()).update((fr, cr))
    keep: Column = F.lit(False)
    for g, ranks in need.items():
        keep = keep | (
            (F.col(group_col) == F.lit(g)) & F.col("__gr_rn").isin(sorted(ranks))
        )
    slim = d.where(keep)
    aggs = []
    for p in ps:
        vf: Column = F.lit(None).cast("double")
        vc: Column = F.lit(None).cast("double")
        frac: Column = F.lit(0.0)
        for g in group_n:
            fr, cr, fx = plan[(g, p)]
            is_g = F.col(group_col) == F.lit(g)
            vf = F.when(is_g & (F.col("__gr_rn") == F.lit(fr)), F.col(value_col).cast("double")).otherwise(vf)
            vc = F.when(is_g & (F.col("__gr_rn") == F.lit(cr)), F.col(value_col).cast("double")).otherwise(vc)
            frac = F.when(is_g, F.lit(fx)).otherwise(frac)
        # Spark percentile's interpolation order: (1−d)·lo + d·hi when
        # the covering rows differ, else the exact row value — the same
        # doubles the previous WindowExec-free percentile agg produced
        name = f"p_{str(p).replace('.', '_')}"
        mf = F.max(frac)
        aggs.append(
            F.when(
                mf > 0, (F.lit(1.0) - mf) * F.max(vf) + mf * F.max(vc)
            ).otherwise(F.max(vf)).alias(name)
        )
    return slim.groupBy(group_col).agg(*aggs)


def literal_frame(df: DataFrame) -> DataFrame:
    """Materialize a BOUNDED result (per-group percentile bounds, a few
    rows) as a literal LocalRelation, cutting its lineage. Without
    this, a downstream operator that itself runs boundary actions
    (e.g. a second grouped_percentiles pass over a frame that joins
    this one) re-executes the whole upstream plan once per action —
    measured 71 s for q_mad_outliers' two-pass form at the sf1 leg.
    Driver state is len(df) rows: callers must only pass frames whose
    cardinality is bounded by construction (one row per group)."""
    rows = df.collect()
    return df.sparkSession.createDataFrame(rows, df.schema)
