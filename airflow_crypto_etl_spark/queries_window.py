"""Analytic-window / scalar-function breadth battery.

The reference has no window functions (SURVEY.md §2.6) and a minimal
scalar surface (§2.9) — these queries are the engine-extension coverage
a Spark-first engine gets from Catalyst for free, each oracle-checked:
full frame-spec windows (rows/range), ranking family, grouping sets,
exact percentiles, array/map/higher-order functions, calendar
generation, lateral explode, deterministic sampling, and the ORC
format round-trip.

Determinism policy matches queries.py: decimal sums, unique window
tiebreakers, no rounding of derived doubles except at declared 4dp
output precision, engine-portable integer hashing for sampling.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .functions.hashing import MERSENNE_P, affine_hash, affine_hash_sql
from .queries import _DEC, _t

# ---------------------------------------------------------------------------
# Window family
# ---------------------------------------------------------------------------

def q_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag/lead over each customer's order history: previous order price
    and days until the next order. One shuffle on the partition key
    serves all four window expressions (same window spec)."""
    o = _t(spark, sf_dir, "orders").filter(F.col("o_custkey") < 500)
    w = Window.partitionBy("o_custkey").orderBy(F.to_date("o_orderdate").asc(), F.col("o_orderkey").asc())
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.to_date("o_orderdate").alias("order_date"),
        F.round(F.lag("o_totalprice", 1).over(w), 4).alias("prev_price"),
        F.round(F.lead("o_totalprice", 1).over(w), 4).alias("next_price"),
        F.datediff(F.lead(F.to_date("o_orderdate"), 1).over(w), F.to_date("o_orderdate")).alias(
            "days_to_next"
        ),
    )


ORACLE_LAG_LEAD = """
SELECT o_custkey, o_orderkey, CAST(o_orderdate AS DATE) AS order_date,
       round(lag(o_totalprice, 1) OVER w, 4)  AS prev_price,
       round(lead(o_totalprice, 1) OVER w, 4) AS next_price,
       CAST(date_diff('day', CAST(o_orderdate AS DATE),
                      lead(CAST(o_orderdate AS DATE), 1) OVER w) AS INTEGER) AS days_to_next
FROM orders
WHERE o_custkey < 500
WINDOW w AS (PARTITION BY o_custkey ORDER BY CAST(o_orderdate AS DATE) ASC, o_orderkey ASC)
"""


def q_ntile_cume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ranking family — rank, dense_rank, percent_rank, cume_dist,
    ntile — over customers by balance within nation. The ORDER BY ends
    in the unique custkey so every rank is deterministic."""
    c = _t(spark, sf_dir, "customer").filter(F.col("c_nationkey") < 5)
    w = Window.partitionBy("c_nationkey").orderBy(F.col("c_acctbal").desc(), F.col("c_custkey").asc())
    return c.select(
        "c_nationkey",
        "c_custkey",
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
        F.round(F.percent_rank().over(w), 4).alias("prnk"),
        F.round(F.cume_dist().over(w), 4).alias("cume"),
        F.ntile(4).over(w).alias("quartile"),
    )


ORACLE_NTILE_CUME = """
SELECT c_nationkey, c_custkey,
       CAST(rank() OVER w AS INTEGER)        AS rnk,
       CAST(dense_rank() OVER w AS INTEGER)  AS drnk,
       round(percent_rank() OVER w, 4)       AS prnk,
       round(cume_dist() OVER w, 4)          AS cume,
       CAST(ntile(4) OVER w AS INTEGER)      AS quartile
FROM customer
WHERE c_nationkey < 5
WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey ASC)
"""


def q_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE frame: trailing-90-day spend per customer. The ordering
    column is an integer day number so the range frame is engine-exact;
    the summed measure is decimal."""
    o = _t(spark, sf_dir, "orders").filter(F.col("o_custkey") < 300)
    day = F.datediff(F.to_date("o_orderdate"), F.lit("1995-01-01").cast("date"))
    w = Window.partitionBy("o_custkey").orderBy(day).rangeBetween(-90, 0)
    return o.select(
        "o_custkey",
        "o_orderkey",
        day.alias("day_no"),
        F.sum(F.col("o_totalprice").cast(_DEC)).over(w).alias("spend_90d"),
    )


ORACLE_RANGE_FRAME = f"""
SELECT o_custkey, o_orderkey,
       CAST(date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS INTEGER) AS day_no,
       CAST(sum(CAST(o_totalprice AS {_DEC})) OVER (
         PARTITION BY o_custkey
         ORDER BY date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE))
         RANGE BETWEEN 90 PRECEDING AND CURRENT ROW) AS DOUBLE) AS spend_90d
FROM orders
WHERE o_custkey < 300
"""


def q_first_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    """first_value / last_value / nth_value with an explicit full-
    partition frame (the default frame would make last_value the
    running last — the classic window pitfall)."""
    s = _t(spark, sf_dir, "supplier")
    w = (
        Window.partitionBy("s_nationkey")
        .orderBy(F.col("s_acctbal").desc(), F.col("s_suppkey").asc())
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return s.select(
        "s_nationkey",
        "s_suppkey",
        F.first("s_suppkey").over(w).alias("richest"),
        F.last("s_suppkey").over(w).alias("poorest"),
        F.nth_value("s_suppkey", 2).over(w).alias("runner_up"),
    )


ORACLE_FIRST_LAST = """
SELECT s_nationkey, s_suppkey,
       first_value(s_suppkey) OVER w  AS richest,
       last_value(s_suppkey) OVER w   AS poorest,
       nth_value(s_suppkey, 2) OVER w AS runner_up
FROM supplier
WINDOW w AS (PARTITION BY s_nationkey ORDER BY s_acctbal DESC, s_suppkey ASC
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
"""


# ---------------------------------------------------------------------------
# Aggregation extensions
# ---------------------------------------------------------------------------

def q_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPING SETS — per-status, per-priority, and grand-total rows in
    one pass (Catalyst plans a single Expand + aggregate, not three
    scans). SQL surface via a temp view."""
    o = _t(spark, sf_dir, "orders")
    o.createOrReplaceTempView("orders_gs")
    return spark.sql(
        f"""
        SELECT COALESCE(o_orderstatus, 'ALL')   AS status,
               COALESCE(o_orderpriority, 'ALL') AS priority,
               count(*)                          AS n,
               sum(CAST(o_totalprice AS {_DEC})) AS total
        FROM orders_gs
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        """
    )


ORACLE_GROUPING_SETS = f"""
SELECT COALESCE(o_orderstatus, 'ALL')   AS status,
       COALESCE(o_orderpriority, 'ALL') AS priority,
       CAST(count(*) AS BIGINT)          AS n,
       CAST(sum(CAST(o_totalprice AS {_DEC})) AS DOUBLE) AS total
FROM orders
GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
"""


def q_percentile_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact linear-interpolation percentiles (the sort-based exact
    form, not the approximate sketch) per group. Computed on the
    integral-valued quantity column where the interpolation arithmetic
    is IEEE-exact in both engines."""
    li = _t(spark, sf_dir, "lineitem")
    pct = F.expr("percentile(l_quantity, array(0.25D, 0.5D, 0.75D, 0.95D))")
    return (
        li.groupBy("l_returnflag")
        .agg(pct.alias("p"))
        .select(
            "l_returnflag",
            F.element_at("p", 1).alias("p25"),
            F.element_at("p", 2).alias("p50"),
            F.element_at("p", 3).alias("p75"),
            F.element_at("p", 4).alias("p95"),
        )
    )


ORACLE_PERCENTILE_EXACT = """
SELECT l_returnflag,
       quantile_cont(l_quantity, 0.25) AS p25,
       quantile_cont(l_quantity, 0.50) AS p50,
       quantile_cont(l_quantity, 0.75) AS p75,
       quantile_cont(l_quantity, 0.95) AS p95
FROM lineitem
GROUP BY l_returnflag
"""


def q_array_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array aggregation: per-order sorted line lists. collect_list is
    partition-order-dependent, so it is always array_sort-ed before
    leaving the operator; serialized to CSV for the cross-engine hash."""
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 2000)
    return li.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).alias("n_lines"),
        F.array_join(F.array_sort(F.collect_list("l_linenumber")), ",").alias("lines_csv"),
        F.array_join(F.array_sort(F.collect_list("l_partkey")), ",").alias("parts_csv"),
        F.sum(F.col("l_quantity").cast(_DEC)).alias("qty_sum"),
    )


ORACLE_ARRAY_AGG = f"""
SELECT l_orderkey,
       CAST(count(*) AS BIGINT) AS n_lines,
       array_to_string(list_sort(list(l_linenumber)), ',') AS lines_csv,
       array_to_string(list_sort(list(l_partkey)), ',')    AS parts_csv,
       CAST(sum(CAST(l_quantity AS {_DEC})) AS DOUBLE) AS qty_sum
FROM lineitem
WHERE l_orderkey < 2000
GROUP BY l_orderkey
"""


# ---------------------------------------------------------------------------
# Scalar-function batteries
# ---------------------------------------------------------------------------

def q_higher_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher-order array functions over the embedding column: filter /
    transform / exists / sequential-fold aggregate — all codegen'd
    JVM-side, no UDF. The fold mirrors operators.similarity.dot."""
    e = _t(spark, sf_dir, "embeddings")
    v = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    sum_sq = F.aggregate(
        F.transform(v, lambda x: x * x), F.lit(0.0).cast("double"), lambda a, x: a + x
    )
    return e.select(
        "vec_id",
        F.size(F.filter(v, lambda x: x > 0)).alias("n_pos"),
        F.round(sum_sq, 4).alias("sum_sq"),
        F.round(F.array_max(F.transform(v, F.abs)), 4).alias("max_abs"),
        F.exists(v, lambda x: x > 2.5).alias("has_large"),
    )


ORACLE_HIGHER_ORDER = """
WITH u AS (SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v FROM embeddings)
SELECT vec_id,
       CAST(len(list_filter(v, x -> x > 0)) AS INTEGER) AS n_pos,
       round(list_reduce(list_prepend(0.0::DOUBLE, list_transform(v, x -> x * x)),
                         (a, x) -> a + x), 4) AS sum_sq,
       round(list_max(list_transform(v, x -> abs(x))), 4) AS max_abs,
       len(list_filter(v, x -> x > 2.5)) > 0 AS has_large
FROM u
"""


def q_map_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map functions: parse a kv-string into a map (str_to_map), extract
    by key, enumerate sorted keys — the oracle computes the same values
    straight from the source columns, proving the map round-trip."""
    c = _t(spark, sf_dir, "customer").filter(F.col("c_custkey") < 1000)
    kv = F.concat(
        F.lit("seg="), F.col("c_mktsegment"), F.lit(";nat="), F.col("c_nationkey").cast("string")
    )
    m = F.str_to_map(kv, F.lit(";"), F.lit("="))
    return c.select(
        "c_custkey",
        F.element_at(m, "seg").alias("seg"),
        F.element_at(m, "nat").cast("int").alias("nat"),
        F.size(m).alias("n_keys"),
        F.array_join(F.array_sort(F.map_keys(m)), ",").alias("keys_csv"),
    )


ORACLE_MAP_FUNCS = """
SELECT c_custkey, c_mktsegment AS seg, c_nationkey AS nat,
       2 AS n_keys, 'nat,seg' AS keys_csv
FROM customer WHERE c_custkey < 1000
"""


def q_bitwise(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise surface: AND / OR / XOR / shifts — exact int64 in any
    engine."""
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 500)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.col("l_orderkey").bitwiseAND(F.col("l_partkey")).alias("k_and"),
        F.col("l_orderkey").bitwiseOR(F.col("l_partkey")).alias("k_or"),
        F.col("l_orderkey").bitwiseXOR(F.col("l_partkey")).alias("k_xor"),
        F.shiftleft(F.col("l_linenumber"), 3).alias("ln_shl"),
        F.shiftright(F.col("l_partkey"), 2).alias("pk_shr"),
    )


ORACLE_BITWISE = """
SELECT l_orderkey, l_linenumber,
       l_orderkey & l_partkey  AS k_and,
       l_orderkey | l_partkey  AS k_or,
       xor(l_orderkey, l_partkey) AS k_xor,
       CAST(l_linenumber << 3 AS INTEGER) AS ln_shl,
       l_partkey >> 2 AS pk_shr
FROM lineitem WHERE l_orderkey < 500
"""


def q_null_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NULL-handling battery: nullif / coalesce / least / greatest /
    null-safe equality over a column with genuine zeros."""
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 1000)
    nz_tax = F.nullif(F.round("l_tax", 4), F.lit(0.0))
    return li.select(
        "l_orderkey",
        "l_linenumber",
        nz_tax.alias("nz_tax"),
        F.coalesce(nz_tax, F.lit(-1.0)).alias("tax_or_neg1"),
        F.round(F.least("l_tax", "l_discount"), 4).alias("lo"),
        F.round(F.greatest("l_tax", "l_discount"), 4).alias("hi"),
        F.col("l_tax").eqNullSafe(F.col("l_discount")).alias("tax_eq_disc"),
    )


ORACLE_NULL_FUNCS = """
SELECT l_orderkey, l_linenumber,
       nullif(round(l_tax, 4), 0.0) AS nz_tax,
       coalesce(nullif(round(l_tax, 4), 0.0), -1.0) AS tax_or_neg1,
       round(least(l_tax, l_discount), 4)    AS lo,
       round(greatest(l_tax, l_discount), 4) AS hi,
       l_tax IS NOT DISTINCT FROM l_discount AS tax_eq_disc
FROM lineitem WHERE l_orderkey < 1000
"""


def q_sequence_months(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar generation: sequence() builds the month spine, orders
    left-join onto it so empty months survive with zero counts — the
    standard gap-filling shape for time series."""
    months = spark.range(1).select(
        F.explode(
            F.sequence(
                F.lit("1997-01-01").cast("date"),
                F.lit("1997-12-01").cast("date"),
                F.expr("interval 1 month"),
            )
        ).alias("month_start")
    )
    o = (
        _t(spark, sf_dir, "orders")
        .filter(F.year("o_orderdate") == 1997)
        .groupBy(F.trunc(F.to_date("o_orderdate"), "month").alias("m"))
        .agg(F.count(F.lit(1)).alias("cnt"), F.sum(F.col("o_totalprice").cast(_DEC)).alias("total"))
    )
    return months.join(o, months.month_start == o.m, "left").select(
        "month_start",
        F.coalesce("cnt", F.lit(0)).alias("n_orders"),
        F.coalesce(F.col("total"), F.lit(0).cast(_DEC)).alias("month_total"),
    )


ORACLE_SEQUENCE_MONTHS = f"""
WITH months AS (
  SELECT CAST(unnest(generate_series(DATE '1997-01-01', DATE '1997-12-01', INTERVAL 1 MONTH)) AS DATE) AS month_start),
agg AS (
  SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS m,
         CAST(count(*) AS BIGINT) AS cnt,
         sum(CAST(o_totalprice AS {_DEC})) AS total
  FROM orders WHERE year(o_orderdate) = 1997 GROUP BY 1)
SELECT month_start,
       COALESCE(cnt, 0) AS n_orders,
       CAST(COALESCE(total, CAST(0 AS {_DEC})) AS DOUBLE) AS month_total
FROM months LEFT JOIN agg ON month_start = m
"""


def q_posexplode_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lateral positional explode: token stream with positions — the
    generator-node (UDTF-shaped) surface."""
    from .operators.text import tokens_col

    d = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 20)
    return d.select("doc_id", F.posexplode(tokens_col("text")).alias("pos", "token"))


ORACLE_POSEXPLODE_TOKENS = """
WITH t AS (
  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS toks
  FROM documents WHERE doc_id < 20),
ex AS (
  SELECT doc_id,
         unnest(list_transform(range(1, len(toks) + 1),
                               i -> {'pos': i - 1, 'token': toks[i]})) AS e
  FROM t)
SELECT doc_id, CAST(e.pos AS INTEGER) AS pos, e.token AS token FROM ex
"""


def q_sample_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 10% sample via the portable affine hash on the key
    (not rand() — reproducible across engines, partitionings, and
    re-runs), aggregated per group. The scale pattern for sampled
    profiling of a 100 TB fact."""
    li = _t(spark, sf_dir, "lineitem")
    keep = (affine_hash(F.col("l_orderkey") * 10 + F.col("l_linenumber"), F.lit(3)) % 100) < 10
    return (
        li.filter(keep)
        .groupBy("l_returnflag")
        .agg(F.count(F.lit(1)).alias("n_sampled"), F.sum(F.col("l_quantity").cast(_DEC)).alias("qty"))
    )


ORACLE_SAMPLE_HASH = f"""
SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n_sampled,
       CAST(sum(CAST(l_quantity AS {_DEC})) AS DOUBLE) AS qty
FROM lineitem
WHERE ({affine_hash_sql('(l_orderkey * 10 + l_linenumber)', '3')}) % 100 < 10
GROUP BY l_returnflag
"""


def q_scan_orc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORC format round-trip (columnar alternative to parquet, built
    into Spark): write the part dim to ORC, read it back with explicit
    schema, aggregate."""
    import shutil

    from .queries import _scratch

    p = _t(spark, sf_dir, "part")
    tmp = _scratch(spark, "orc_roundtrip")
    shutil.rmtree(tmp, ignore_errors=True)
    p.write.mode("overwrite").orc(tmp)
    back = spark.read.schema(
        T.StructType(
            [
                T.StructField("p_partkey", T.LongType()),
                T.StructField("p_name", T.StringType()),
                T.StructField("p_brand", T.StringType()),
                T.StructField("p_type", T.StringType()),
                T.StructField("p_size", T.IntegerType()),
                T.StructField("p_retailprice", T.DoubleType()),
            ]
        )
    ).orc(tmp)
    return back.groupBy("p_brand").agg(
        F.count(F.lit(1)).alias("n_parts"),
        F.sum(F.col("p_retailprice").cast(_DEC)).alias("retail_total"),
        F.max("p_size").alias("max_size"),
    )


ORACLE_SCAN_ORC = f"""
SELECT p_brand, CAST(count(*) AS BIGINT) AS n_parts,
       CAST(sum(CAST(p_retailprice AS {_DEC})) AS DOUBLE) AS retail_total,
       max(p_size) AS max_size
FROM part GROUP BY p_brand
"""


def q_partition_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hive-style partition pruning end-to-end: write the fact
    partitioned by ship year (dynamic overwrite — the reference's
    dt={ds} layout, SURVEY §2.1 S4/K3), read it back filtering ONE
    partition value, aggregate. The filter must prune at directory
    listing (PartitionFilters — asserted in test_tpch_plans), so a
    100 TB lake scans one year, not all."""
    import shutil

    from .queries import _scratch

    li = _t(spark, sf_dir, "lineitem")
    tmp = _scratch(spark, "part_prune")
    shutil.rmtree(tmp, ignore_errors=True)
    (
        li.select(
            "l_orderkey", "l_returnflag", "l_quantity", F.year("l_shipdate").alias("ship_year")
        )
        .write.mode("overwrite")
        .partitionBy("ship_year")
        .parquet(tmp)
    )
    back = spark.read.parquet(tmp).filter(F.col("ship_year") == 1997)
    return back.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n_rows"), F.sum(F.col("l_quantity").cast(_DEC)).alias("qty")
    )


ORACLE_PARTITION_PRUNE = f"""
SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n_rows,
       CAST(sum(CAST(l_quantity AS {_DEC})) AS DOUBLE) AS qty
FROM lineitem WHERE year(l_shipdate) = 1997
GROUP BY l_returnflag
"""


QUERIES_WINDOW = {
    "q_lag_lead": q_lag_lead,
    "q_ntile_cume": q_ntile_cume,
    "q_range_frame": q_range_frame,
    "q_first_last": q_first_last,
    "q_grouping_sets": q_grouping_sets,
    "q_percentile_exact": q_percentile_exact,
    "q_array_agg": q_array_agg,
    "q_higher_order": q_higher_order,
    "q_map_funcs": q_map_funcs,
    "q_bitwise": q_bitwise,
    "q_null_funcs": q_null_funcs,
    "q_sequence_months": q_sequence_months,
    "q_posexplode_tokens": q_posexplode_tokens,
    "q_sample_hash": q_sample_hash,
    "q_scan_orc": q_scan_orc,
    "q_partition_prune": q_partition_prune,
}

ORACLE_WINDOW = {
    "q_lag_lead": ORACLE_LAG_LEAD,
    "q_ntile_cume": ORACLE_NTILE_CUME,
    "q_range_frame": ORACLE_RANGE_FRAME,
    "q_first_last": ORACLE_FIRST_LAST,
    "q_grouping_sets": ORACLE_GROUPING_SETS,
    "q_percentile_exact": ORACLE_PERCENTILE_EXACT,
    "q_array_agg": ORACLE_ARRAY_AGG,
    "q_higher_order": ORACLE_HIGHER_ORDER,
    "q_map_funcs": ORACLE_MAP_FUNCS,
    "q_bitwise": ORACLE_BITWISE,
    "q_null_funcs": ORACLE_NULL_FUNCS,
    "q_sequence_months": ORACLE_SEQUENCE_MONTHS,
    "q_posexplode_tokens": ORACLE_POSEXPLODE_TOKENS,
    "q_sample_hash": ORACLE_SAMPLE_HASH,
    "q_scan_orc": ORACLE_SCAN_ORC,
    "q_partition_prune": ORACLE_PARTITION_PRUNE,
}


def q_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot (melt): the gold-metrics wide row becomes (key, metric,
    value) long form — the serving-layer reshape for metric stores."""
    li = _t(spark, sf_dir, "lineitem")
    wide = li.groupBy("l_returnflag").agg(
        F.sum(F.col("l_quantity").cast(_DEC)).cast("double").alias("sum_qty"),
        F.sum(F.col("l_extendedprice").cast(_DEC)).cast("double").alias("sum_price"),
        F.count(F.lit(1)).cast("double").alias("n_rows"),
    )
    return wide.unpivot(
        ids=["l_returnflag"],
        values=["sum_qty", "sum_price", "n_rows"],
        variableColumnName="metric",
        valueColumnName="value",
    )


ORACLE_UNPIVOT = f"""
WITH wide AS (
  SELECT l_returnflag,
         CAST(sum(CAST(l_quantity AS {_DEC})) AS DOUBLE)      AS sum_qty,
         CAST(sum(CAST(l_extendedprice AS {_DEC})) AS DOUBLE) AS sum_price,
         CAST(count(*) AS DOUBLE)                             AS n_rows
  FROM lineitem GROUP BY l_returnflag)
SELECT l_returnflag, metric, value
FROM wide UNPIVOT (value FOR metric IN (sum_qty, sum_price, n_rows))
"""


def q_try_cast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Error-safe casts: try_cast yields NULL instead of failing the
    job — the quarantine path of the silver contract (the strict path
    is enforce_contract/ANSI, q_contract_enforce)."""
    p = _t(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.regexp_extract("p_brand", "#(\\d+)$", 1).try_cast("int").alias("brand_num"),
        F.col("p_type").try_cast("int").alias("type_as_int"),  # always NULL, never an error
        F.col("p_size").cast("string").try_cast("int").alias("size_roundtrip"),
    )


ORACLE_TRY_CAST = """
SELECT p_partkey,
       TRY_CAST(regexp_extract(p_brand, '#(\\d+)$', 1) AS INTEGER) AS brand_num,
       TRY_CAST(p_type AS INTEGER) AS type_as_int,
       TRY_CAST(CAST(p_size AS VARCHAR) AS INTEGER) AS size_roundtrip
FROM part
"""

QUERIES_WINDOW["q_unpivot"] = q_unpivot
ORACLE_WINDOW["q_unpivot"] = ORACLE_UNPIVOT
QUERIES_WINDOW["q_try_cast"] = q_try_cast
ORACLE_WINDOW["q_try_cast"] = ORACLE_TRY_CAST


def q_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted skew join: same RESULT as the plain equi-join (the oracle
    is the plain join), different physical distribution — each hot key
    splits across `salt` reducers. The driver check proves salting is
    result-transparent."""
    from .operators.joins import salted_join

    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_extendedprice", "l_discount")
    o = _t(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_orderpriority"
    )
    joined = salted_join(li, o, key="l_orderkey", salt=8)
    return joined.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_lines"),
        F.sum((F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(_DEC)).alias("revenue"),
    )


ORACLE_SALTED_JOIN = f"""
SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n_lines,
       CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS {_DEC})) AS DOUBLE) AS revenue
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY o_orderpriority
"""


def q_bucketed_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bucketed co-located join: both sides persisted bucketed+sorted on
    the join key, then joined exchange-free (shuffle paid once at write
    time — the 100 TB answer for repeated fact⋈fact joins). Result
    equals the plain join; the zero-Exchange plan is asserted in
    tests."""
    from .operators.joins import bucketed_tables

    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_orderstatus")
    # session-unique table names: two concurrent sessions sharing the
    # warehouse dir must not race on the same bucketed-table location
    import os as _os

    from .queries import reap_stale, session_suffix

    sfx = session_suffix(spark)
    t_li, t_o = f"aces_bkt_li_{sfx}", f"aces_bkt_o_{sfx}"
    # reap PAST sessions' table data (a fresh session's catalog never
    # lists them, only their warehouse dirs persist; > 1 h old = dead)
    wh = spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse").removeprefix("file:")
    reap_stale(
        _os.path.join(wh, "aces_bkt_*"),
        keep={_os.path.join(wh, t_li), _os.path.join(wh, t_o)},
    )
    bucketed_tables(
        {t_li: li, t_o: o.withColumnRenamed("o_orderkey", "l_orderkey")},
        key="l_orderkey",
        n_buckets=8,
    )
    j = spark.table(t_li).join(spark.table(t_o), "l_orderkey")
    return j.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n_lines"),
        F.sum(F.col("l_quantity").cast(_DEC)).alias("qty"),
    )


ORACLE_BUCKETED_JOIN = f"""
SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS n_lines,
       CAST(sum(CAST(l_quantity AS {_DEC})) AS DOUBLE) AS qty
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY o_orderstatus
"""

QUERIES_WINDOW["q_salted_join"] = q_salted_join
ORACLE_WINDOW["q_salted_join"] = ORACLE_SALTED_JOIN
QUERIES_WINDOW["q_bucketed_join"] = q_bucketed_join
ORACLE_WINDOW["q_bucketed_join"] = ORACLE_BUCKETED_JOIN


def q_corr_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistics from exact moments: mean, population variance, and
    Pearson correlation assembled from DECIMAL power sums, with the
    float math applied only to the (exact, association-order-free)
    sums. Native corr()/var_pop() merge co-moments in partition order —
    fp-nondeterministic across partitionings; this form hashes
    identically everywhere. The groupBy is still one partial+final
    hash aggregate carrying five sums."""
    li = _t(spark, sf_dir, "lineitem")
    x = F.col("l_quantity").cast("decimal(12,4)")
    y = F.col("l_extendedprice").cast("decimal(12,4)")
    g = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(x).alias("sx"),
        F.sum(y).alias("sy"),
        F.sum(x * x).alias("sxx"),
        F.sum(y * y).alias("syy"),
        F.sum(x * y).alias("sxy"),
    )
    n = F.col("n").cast("double")
    sx, sy = F.col("sx").cast("double"), F.col("sy").cast("double")
    sxx, syy, sxy = F.col("sxx").cast("double"), F.col("syy").cast("double"), F.col("sxy").cast("double")
    return g.select(
        "l_returnflag",
        "n",
        F.round(sx / n, 4).alias("mean_qty"),
        F.round((sxx - sx * sx / n) / n, 4).alias("var_pop_qty"),
        F.round(
            (n * sxy - sx * sy) / F.sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)), 4
        ).alias("corr_qty_price"),
    )


ORACLE_CORR_EXACT = """
WITH g AS (
  -- DECIMAL(19,4) inputs: DuckDB's product type is then DECIMAL(38,8)
  -- (a (12,4) input caps the product at DECIMAL(18,8), which price^2
  -- overflows); values are identical to Spark's (25,8)-exact products.
  SELECT l_returnflag,
         CAST(count(*) AS BIGINT) AS n,
         CAST(sum(CAST(l_quantity AS DECIMAL(19,4))) AS DOUBLE) AS sx,
         CAST(sum(CAST(l_extendedprice AS DECIMAL(19,4))) AS DOUBLE) AS sy,
         CAST(sum(CAST(l_quantity AS DECIMAL(19,4)) * CAST(l_quantity AS DECIMAL(19,4))) AS DOUBLE) AS sxx,
         CAST(sum(CAST(l_extendedprice AS DECIMAL(19,4)) * CAST(l_extendedprice AS DECIMAL(19,4))) AS DOUBLE) AS syy,
         CAST(sum(CAST(l_quantity AS DECIMAL(19,4)) * CAST(l_extendedprice AS DECIMAL(19,4))) AS DOUBLE) AS sxy
  FROM lineitem GROUP BY l_returnflag)
SELECT l_returnflag, n,
       round(sx / n, 4) AS mean_qty,
       round((sxx - sx * sx / n) / n, 4) AS var_pop_qty,
       round((n * sxy - sx * sy) / sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)), 4) AS corr_qty_price
FROM (SELECT l_returnflag, CAST(n AS DOUBLE) AS n_d, n, sx, sy, sxx, syy, sxy FROM g)
"""

QUERIES_WINDOW["q_corr_exact"] = q_corr_exact
ORACLE_WINDOW["q_corr_exact"] = ORACLE_CORR_EXACT


def q_interval_arith(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval arithmetic: timestamp ± INTERVAL, month arithmetic with
    end-of-month clamping (add_months), and unit-true diffs
    (timestampdiff) — the shipping-latency calculation shape."""
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 2000)
    o = _t(spark, sf_dir, "orders")
    j = li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
    return j.select(
        "l_orderkey",
        "l_linenumber",
        F.expr("timestampdiff(HOUR, o_orderdate, l_shipdate)").alias("latency_hours"),
        F.expr("timestampdiff(DAY, o_orderdate, l_shipdate)").alias("latency_days"),
        (F.col("o_orderdate") + F.expr("interval 45 days")).cast("date").alias("due_date"),
        F.add_months(F.to_date("o_orderdate"), 3).alias("quarter_later"),
        (F.col("l_shipdate") > F.col("o_orderdate") + F.expr("interval 45 days")).alias("is_late"),
    )


ORACLE_INTERVAL_ARITH = """
SELECT l_orderkey, l_linenumber,
       CAST(date_diff('hour', o_orderdate, l_shipdate) AS BIGINT) AS latency_hours,
       CAST(date_diff('day', o_orderdate, l_shipdate) AS BIGINT)  AS latency_days,
       CAST(o_orderdate + INTERVAL 45 DAY AS DATE)                AS due_date,
       CAST(CAST(o_orderdate AS DATE) + INTERVAL 3 MONTH AS DATE) AS quarter_later,
       l_shipdate > o_orderdate + INTERVAL 45 DAY                 AS is_late
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE l_orderkey < 2000
"""

QUERIES_WINDOW["q_interval_arith"] = q_interval_arith
ORACLE_WINDOW["q_interval_arith"] = ORACLE_INTERVAL_ARITH


def q_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-width histogram via width_bucket: one pass, fixed bucket
    count — the profiling shape that replaces collecting a column to
    the driver."""
    li = _t(spark, sf_dir, "lineitem")
    b = F.width_bucket(F.col("l_extendedprice"), F.lit(0.0), F.lit(110000.0), F.lit(11))
    return (
        li.groupBy(b.alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.min("l_extendedprice"), 4).alias("lo"),
            F.round(F.max("l_extendedprice"), 4).alias("hi"),
        )
    )


ORACLE_HISTOGRAM = """
-- width_bucket(x, 0, 110000, 11) spelled arithmetically (no width_bucket in DuckDB)
SELECT CAST(CASE WHEN l_extendedprice < 0 THEN 0
                 WHEN l_extendedprice >= 110000.0 THEN 12
                 ELSE floor(l_extendedprice / 10000.0) + 1 END AS BIGINT) AS bucket,
       CAST(count(*) AS BIGINT) AS n,
       round(min(l_extendedprice), 4) AS lo,
       round(max(l_extendedprice), 4) AS hi
FROM lineitem GROUP BY 1
"""


def q_mode_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic exact mode per group: count per value, then
    max_by with an explicit (count desc, value asc) tiebreak — native
    mode() leaves ties engine-defined, this form hashes identically
    everywhere."""
    li = _t(spark, sf_dir, "lineitem")
    counts = li.groupBy("l_returnflag", "l_quantity").agg(F.count(F.lit(1)).alias("cnt"))
    return counts.groupBy("l_returnflag").agg(
        F.max_by("l_quantity", F.struct(F.col("cnt"), (-F.col("l_quantity")).cast("double"))).alias(
            "mode_qty"
        ),
        F.max("cnt").alias("mode_count"),
    )


ORACLE_MODE_EXACT = """
WITH counts AS (
  SELECT l_returnflag, l_quantity, CAST(count(*) AS BIGINT) AS cnt
  FROM lineitem GROUP BY 1, 2),
ranked AS (
  SELECT l_returnflag, l_quantity, cnt,
         row_number() OVER (PARTITION BY l_returnflag ORDER BY cnt DESC, l_quantity ASC) AS rn
  FROM counts)
SELECT l_returnflag, l_quantity AS mode_qty,
       (SELECT max(cnt) FROM counts c WHERE c.l_returnflag = ranked.l_returnflag) AS mode_count
FROM ranked WHERE rn = 1
"""


def q_string_surgery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String-surgery battery: split_part, translate, repeat, left/
    right slices, position — engine-portable subset."""
    c = _t(spark, sf_dir, "customer").filter(F.col("c_custkey") < 1000)
    return c.select(
        "c_custkey",
        F.split_part(F.col("c_name"), F.lit("_"), F.lit(1)).alias("name_head"),
        F.translate(F.col("c_mktsegment"), "AEIOU", "aeiou").alias("seg_lower_vowels"),
        F.repeat(F.lit("*"), F.col("c_nationkey") % 5).alias("stars"),
        F.substring(F.col("c_name"), 1, 4).alias("left4"),
        F.right(F.col("c_name"), F.lit(3)).alias("right3"),
        F.instr(F.col("c_name"), "_").alias("us_pos"),
    )


ORACLE_STRING_SURGERY = """
SELECT c_custkey,
       split_part(c_name, '_', 1) AS name_head,
       translate(c_mktsegment, 'AEIOU', 'aeiou') AS seg_lower_vowels,
       repeat('*', c_nationkey % 5) AS stars,
       substring(c_name, 1, 4) AS left4,
       right(c_name, 3) AS right3,
       CAST(strpos(c_name, '_') AS INTEGER) AS us_pos
FROM customer WHERE c_custkey < 1000
"""

QUERIES_WINDOW["q_histogram"] = q_histogram
ORACLE_WINDOW["q_histogram"] = ORACLE_HISTOGRAM
QUERIES_WINDOW["q_mode_exact"] = q_mode_exact
ORACLE_WINDOW["q_mode_exact"] = ORACLE_MODE_EXACT
QUERIES_WINDOW["q_string_surgery"] = q_string_surgery
ORACLE_WINDOW["q_string_surgery"] = ORACLE_STRING_SURGERY


def q_histogram_equiheight(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-HEIGHT histogram (the equi-width twin's counterpart —
    q_histogram): 10 ntile bins per event type, ordered by (value, id)
    so tie placement is deterministic, emitting per-bin count and exact
    value bounds. One window sort per group, one partial agg — the
    standard quantile-sketch verification query."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy("value", "event_id")
    binned = ev.select("event_type", "value", F.ntile(10).over(w).alias("bin"))
    return binned.groupBy("event_type", "bin").agg(
        F.count(F.lit(1)).alias("n"),
        F.min("value").alias("lo"),
        F.max("value").alias("hi"),
    )


ORACLE_HISTOGRAM_EQUIHEIGHT = """
WITH b AS (
  SELECT event_type, value,
         ntile(10) OVER (PARTITION BY event_type ORDER BY value, event_id) AS bin
  FROM events)
SELECT event_type, CAST(bin AS INTEGER) AS bin,
       CAST(count(*) AS BIGINT) AS n,
       min(value) AS lo, max(value) AS hi
FROM b GROUP BY 1, 2
"""

QUERIES_WINDOW["q_histogram_equiheight"] = q_histogram_equiheight
ORACLE_WINDOW["q_histogram_equiheight"] = ORACLE_HISTOGRAM_EQUIHEIGHT


def q_lateral_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL subquery (SQL:2016 surface): per nation, the
    top-2 customers by balance. Catalyst decorrelates the
    ORDER-BY-LIMIT lateral into a per-key window top-k — no
    nation-by-nation re-execution — so the SQL convenience form costs
    the same as the hand-written rank window (q_topk_per_group)."""
    _t(spark, sf_dir, "nation").createOrReplaceTempView("nation_lat")
    _t(spark, sf_dir, "customer").createOrReplaceTempView("customer_lat")
    return spark.sql(
        """
        SELECT n.n_name, t.c_custkey, t.c_acctbal
        FROM nation_lat n,
        LATERAL (
          SELECT c_custkey, c_acctbal FROM customer_lat c
          WHERE c.c_nationkey = n.n_nationkey
          ORDER BY c_acctbal DESC, c_custkey ASC LIMIT 2
        ) t
        """
    )


ORACLE_LATERAL_TOPK = """
SELECT n.n_name, t.c_custkey, t.c_acctbal
FROM nation n,
LATERAL (
  SELECT c_custkey, c_acctbal FROM customer c
  WHERE c.c_nationkey = n.n_nationkey
  ORDER BY c_acctbal DESC, c_custkey ASC LIMIT 2
) t
"""

QUERIES_WINDOW["q_lateral_topk"] = q_lateral_topk
ORACLE_WINDOW["q_lateral_topk"] = ORACLE_LATERAL_TOPK
