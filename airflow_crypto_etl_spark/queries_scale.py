"""Warehouse-modeling and data-layout queries beyond the reference surface.

The reference's warehouse layer is a plain star schema with upserts
(`/root/reference/dags/coin_data_pipeline_optimized.py:87-104,923-933`);
these queries add the modeling/layout techniques a 100 TB lake needs on
top of it:

- SCD2 validity intervals (dimension history instead of overwrite-in-place
  — the scalable answer to the reference's `ON CONFLICT DO UPDATE`);
- blocked fuzzy matching (edit-distance join with *complete* length-band
  blocking — candidate pairs scale with bucket sizes, never |R|×|S|);
- Z-order (Morton) clustering keys (multi-dimensional data layout so a
  2-D range predicate prunes parquet row groups on both columns).

All three are oracle-checked: integer/date-only arithmetic, no floating
terms in values (the Morton y-bucket divides by a power of two, so the
double division is exact in both engines).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .queries import _t

# ---------------------------------------------------------------------------
# SCD2 — slowly-changing-dimension type 2 intervals
# ---------------------------------------------------------------------------


def q_scd2_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Build SCD2 validity intervals from the orders history: one version
    row per (customer, order date) carrying the day's winning attribute
    (max-orderkey tiebreak), valid until the customer's next version.
    ``lead() OVER (PARTITION BY key ORDER BY date)`` — a single shuffle by
    customer; no self-join against the history."""
    o = _t(spark, sf_dir, "orders")
    versions = o.groupBy(
        "o_custkey", F.to_date("o_orderdate").alias("valid_from")
    ).agg(F.max_by("o_orderpriority", "o_orderkey").alias("priority"))
    w = Window.partitionBy("o_custkey").orderBy("valid_from")
    return (
        versions.withColumn("valid_to", F.lead("valid_from").over(w))
        .withColumn("is_current", F.col("valid_to").isNull())
        .select("o_custkey", "priority", "valid_from", "valid_to", "is_current")
    )


ORACLE_SCD2 = """
WITH versions AS (
    SELECT o_custkey,
           CAST(o_orderdate AS DATE) AS valid_from,
           arg_max(o_orderpriority, o_orderkey) AS priority
    FROM orders
    GROUP BY 1, 2
)
SELECT o_custkey, priority, valid_from,
       lead(valid_from) OVER w AS valid_to,
       lead(valid_from) OVER w IS NULL AS is_current
FROM versions
WINDOW w AS (PARTITION BY o_custkey ORDER BY valid_from)
"""


# ---------------------------------------------------------------------------
# Fuzzy join — edit-distance matching with complete length-band blocking
# ---------------------------------------------------------------------------


def q_fuzzy_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edit-distance self-join over distinct part names, blocked on string
    length: ``levenshtein(a,b) <= 2`` implies ``|len(a)-len(b)| <= 2``, so
    registering each right-side name under its 5 neighboring length buckets
    is a *complete* blocking scheme — the equi-join on bucket produces every
    qualifying pair exactly once (the length delta is unique per pair), and
    candidate volume scales with per-bucket counts instead of |R|×|S|."""
    names = _t(spark, sf_dir, "part").select("p_name").distinct()
    a = names.select(
        F.col("p_name").alias("name_a"), F.length("p_name").alias("len_a")
    )
    b = names.select(
        F.col("p_name").alias("name_b"),
        F.explode(
            F.array([F.length("p_name") + F.lit(d) for d in range(-2, 3)])
        ).alias("bucket"),
    )
    return (
        a.join(b, a.len_a == b.bucket)
        .filter(
            (F.col("name_a") < F.col("name_b"))
            & (F.levenshtein("name_a", "name_b") <= 2)
        )
        .select(
            "name_a",
            "name_b",
            F.levenshtein("name_a", "name_b").alias("edit_dist"),
        )
    )


ORACLE_FUZZY = """
WITH names AS (SELECT DISTINCT p_name FROM part)
SELECT a.p_name AS name_a, b.p_name AS name_b,
       CAST(levenshtein(a.p_name, b.p_name) AS INTEGER) AS edit_dist
FROM names a
JOIN names b ON a.p_name < b.p_name
WHERE levenshtein(a.p_name, b.p_name) <= 2
"""


# ---------------------------------------------------------------------------
# Z-order — Morton clustering key for multi-dimensional layout
# ---------------------------------------------------------------------------

_MORTON_BITS = 6


def _morton_expr(x: str, y: str, intdiv: str) -> str:
    """Bit-interleave two 6-bit values with integer arithmetic only
    (no engine-specific bitwise operators): z = Σ bit_i(x)·4^i + bit_i(y)·2·4^i."""
    terms = []
    for i in range(_MORTON_BITS):
        p = 2**i
        terms.append(f"(({x} {intdiv} {p}) % 2) * {4 ** i}")
        terms.append(f"(({y} {intdiv} {p}) % 2) * {2 * 4 ** i}")
    return " + ".join(terms)


_ZX = "(p_size % 64)"
# /2 is a power-of-two divide: exact in IEEE double, so floor() agrees
# across engines with no shortest-string-vs-binary rounding hazard.
_ZY_SPARK = "(CAST(floor(p_retailprice / 2) AS INT) % 64)"
_ZY_DUCK = "(CAST(floor(p_retailprice / 2) AS INTEGER) % 64)"


def q_zorder_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Morton (Z-order) clustering key over (p_size, price bucket). Sorting
    a table by this key before writing gives row-group locality in BOTH
    dimensions, so a 2-D range predicate prunes parquet row groups that a
    single-column sort cannot (asserted on real files in
    tests/test_scale_features.py)."""
    part = _t(spark, sf_dir, "part")
    return part.select(
        "p_partkey",
        F.expr(_morton_expr(_ZX, _ZY_SPARK, "div")).cast("long").alias("zkey"),
    )


ORACLE_ZORDER = f"""
SELECT p_partkey,
       CAST({_morton_expr(_ZX, _ZY_DUCK, "//")} AS BIGINT) AS zkey
FROM part
"""


QUERIES_SCALE = {
    "q_scd2_intervals": q_scd2_intervals,
    "q_fuzzy_join": q_fuzzy_join,
    "q_zorder_key": q_zorder_key,
}

ORACLE_SCALE = {
    "q_scd2_intervals": ORACLE_SCD2,
    "q_fuzzy_join": ORACLE_FUZZY,
    "q_zorder_key": ORACLE_ZORDER,
}


# ---------------------------------------------------------------------------
# Continuous-aggregate rollup hierarchy (hypertable-style)
# ---------------------------------------------------------------------------


def q_rollup_hierarchy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Timeseries rollup hierarchy: the DAILY aggregate is derived by
    re-aggregating HOURLY partials (count + decimal sum — both
    merge-associative), never by rescanning raw events. This is the
    continuous-aggregate / hypertable pattern: at 100 TB the raw scan
    happens once into the finest rollup and every coarser resolution is
    a cheap reaggregation of partials. The oracle aggregates raw events
    straight to daily — the result must be identical, which is exactly
    the partial-aggregation associativity guarantee."""
    ev = _t(spark, sf_dir, "events")
    hourly = ev.groupBy(
        F.date_trunc("hour", "ts").alias("h"), "event_type"
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("value").cast("decimal(18,4)")).alias("s"),
    )
    return (
        hourly.groupBy(F.to_date("h").alias("day"), "event_type")
        .agg(
            F.sum("n").alias("n_events"),
            F.sum("s").cast("decimal(18,4)").alias("sum_value"),
        )
    )


ORACLE_ROLLUP_HIERARCHY = """
SELECT date_trunc('day', ts) AS day, event_type,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(sum(CAST(value AS DECIMAL(18,4))) AS DECIMAL(18,4)) AS sum_value
FROM events
GROUP BY 1, 2
"""

QUERIES_SCALE["q_rollup_hierarchy"] = q_rollup_hierarchy
ORACLE_SCALE["q_rollup_hierarchy"] = ORACLE_ROLLUP_HIERARCHY
