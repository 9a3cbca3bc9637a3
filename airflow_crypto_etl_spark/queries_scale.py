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

from .operators import layout as lo
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

# The Morton interleave itself lives in operators.layout (one canonical
# implementation, round-4: the dual-dialect generator replaced the
# arithmetic div/mod form that used to live here). Operand order: the
# price bucket rides layout's FIRST operand (odd/upper bit of each
# pair), p_size the second — the same bit assignment (and therefore the
# same zkey values) as the original arithmetic form.
_MORTON_BITS = 6


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
        F.expr(lo.zvalue_sql(_ZY_SPARK, _ZX, bits=_MORTON_BITS)).cast("long").alias("zkey"),
    )


ORACLE_ZORDER = f"""
SELECT p_partkey,
       CAST({lo.zvalue_duck_sql(_ZY_DUCK, _ZX, bits=_MORTON_BITS)} AS BIGINT) AS zkey
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
       CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
FROM events
GROUP BY 1, 2
"""

QUERIES_SCALE["q_rollup_hierarchy"] = q_rollup_hierarchy
ORACLE_SCALE["q_rollup_hierarchy"] = ORACLE_ROLLUP_HIERARCHY


# ---------------------------------------------------------------------------
# CDC apply — latest-per-key with tombstones
# ---------------------------------------------------------------------------


def q_cdc_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Apply a change feed: keep each key's latest record (version order =
    (ts, event_id)), dropping keys whose latest change is a tombstone
    ('error' here). Implemented as a max_by struct aggregate — one hash
    aggregate with map-side partials, skew-immune (no per-key sort, unlike
    the row_number form the oracle uses)."""
    ev = _t(spark, sf_dir, "events")
    latest = ev.groupBy("user_id").agg(
        F.max_by(
            F.struct("event_id", "event_type", "value"),
            F.struct("ts", "event_id"),
        ).alias("r")
    )
    return (
        latest.filter(F.col("r.event_type") != "error")
        .select(
            "user_id",
            F.col("r.event_id").alias("event_id"),
            F.col("r.event_type").alias("event_type"),
            F.col("r.value").alias("value"),
        )
    )


ORACLE_CDC_APPLY = """
WITH r AS (
    SELECT user_id, event_id, event_type, value,
           row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
    FROM events
)
SELECT user_id, event_id, event_type, value
FROM r WHERE rn = 1 AND event_type <> 'error'
"""


# ---------------------------------------------------------------------------
# Stratified sampling — per-stratum deterministic rates
# ---------------------------------------------------------------------------


def q_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified sample with per-stratum rates (urgent 50%, high 20%,
    rest 5%) decided by the portable affine hash of the key — not rand():
    reproducible across engines, partitionings, and re-runs, and the
    filter stays inside whole-stage codegen. The 100 TB pattern for
    class-balanced training subsets."""
    from .functions.hashing import affine_hash

    o = _t(spark, sf_dir, "orders")
    h = affine_hash(F.col("o_orderkey"), F.lit(5)) % 100
    rate = (
        F.when(F.col("o_orderpriority") == "1-URGENT", 50)
        .when(F.col("o_orderpriority") == "2-HIGH", 20)
        .otherwise(5)
    )
    return (
        o.filter(h < rate)
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_sampled"),
            F.sum(F.col("o_totalprice").cast("decimal(18,4)")).alias("sum_price"),
        )
    )


def _stratified_oracle() -> str:
    from .functions.hashing import affine_hash_sql

    h = affine_hash_sql("o_orderkey", "5")
    return f"""
SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n_sampled,
       CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_price
FROM orders
WHERE ({h}) % 100 < CASE o_orderpriority
                      WHEN '1-URGENT' THEN 50
                      WHEN '2-HIGH' THEN 20
                      ELSE 5 END
GROUP BY o_orderpriority
"""


# ---------------------------------------------------------------------------
# Distinctive terms — per-document TF ranking with DF pruning
# ---------------------------------------------------------------------------


def q_distinctive_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 distinctive terms per document: term frequency ranked after
    pruning corpus-common terms (document frequency > 20% of docs — the
    stopword effect, computed from the data, not a list). All ordering
    keys are integers/strings, so the ranking is bit-exact across
    engines — no float tf-idf in the comparison path."""
    docs = _t(spark, sf_dir, "documents")
    words = docs.select(
        "doc_id",
        F.explode(
            F.filter(F.split(F.lower(F.col("text")), " "), lambda t: t != "")
        ).alias("term"),
    )
    tf = words.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    df = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    nd = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    cand = (
        tf.join(df, "term")
        .crossJoin(F.broadcast(nd))
        .filter(F.col("df") * 5 <= F.col("n_docs"))
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("tf").desc(), F.col("term").asc())
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 3)
        .select("doc_id", "term", "tf", "rank")
    )


ORACLE_DISTINCTIVE_TERMS = """
WITH words AS (
    SELECT doc_id,
           unnest(list_filter(string_split(lower(text), ' '), t -> t <> '')) AS term
    FROM documents
),
tf AS (SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf FROM words GROUP BY 1, 2),
df AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
nd AS (SELECT count(*) AS n_docs FROM documents),
r AS (
    SELECT tf.doc_id, tf.term, tf.tf,
           row_number() OVER (PARTITION BY tf.doc_id ORDER BY tf.tf DESC, tf.term ASC) AS rank
    FROM tf JOIN df USING (term), nd
    WHERE df * 5 <= n_docs
)
SELECT doc_id, term, tf, CAST(rank AS INTEGER) AS rank FROM r WHERE rank <= 3
"""

QUERIES_SCALE["q_cdc_apply"] = q_cdc_apply
ORACLE_SCALE["q_cdc_apply"] = ORACLE_CDC_APPLY
QUERIES_SCALE["q_stratified_sample"] = q_stratified_sample
ORACLE_SCALE["q_stratified_sample"] = _stratified_oracle()
QUERIES_SCALE["q_distinctive_terms"] = q_distinctive_terms
ORACLE_SCALE["q_distinctive_terms"] = ORACLE_DISTINCTIVE_TERMS


# ---------------------------------------------------------------------------
# Recursive CTE — calendar spine with gap-fill (Spark 4.1 WITH RECURSIVE)
# ---------------------------------------------------------------------------


def q_recursive_spine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Monthly calendar spine generated by a RECURSIVE CTE (bounded
    recursion, one row per step), left-joined against monthly order
    counts so empty months surface as zeros — the gap-filling shape
    reporting needs. Recursion depth = months in the fixed data span
    (84), far under the engine's recursion level limit."""
    o = _t(spark, sf_dir, "orders")
    o.createOrReplaceTempView("orders_rec")
    return spark.sql(
        """
        WITH RECURSIVE spine(m) AS (
            SELECT DATE '1995-01-01'
            UNION ALL
            SELECT m + INTERVAL '1' MONTH FROM spine WHERE m < DATE '2001-12-01'
        ),
        monthly AS (
            SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS mo,
                   count(*) AS n
            FROM orders_rec GROUP BY 1
        )
        SELECT m AS month, COALESCE(n, 0) AS n_orders
        FROM spine LEFT JOIN monthly ON mo = m
        """
    )


ORACLE_RECURSIVE_SPINE = """
WITH RECURSIVE spine(m) AS (
    SELECT DATE '1995-01-01'
    UNION ALL
    SELECT m + INTERVAL 1 MONTH FROM spine WHERE m < DATE '2001-12-01'
),
monthly AS (
    SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS mo,
           CAST(count(*) AS BIGINT) AS n
    FROM orders GROUP BY 1
)
SELECT m AS month, COALESCE(n, 0) AS n_orders
FROM spine LEFT JOIN monthly ON mo = m
"""


# ---------------------------------------------------------------------------
# Variant — semi-structured extraction via the VARIANT type (Spark 4)
# ---------------------------------------------------------------------------


def q_variant_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured access through VARIANT: ``parse_json`` once into a
    typed variant column, then ``variant_get`` typed extraction — the
    binary-encoded path that replaces repeated string re-parsing
    (get_json_object) on hot columns. Rolled up into integer deciles so
    every compared value is exact."""
    ev = _t(spark, sf_dir, "events")
    k = F.expr("variant_get(parse_json(props), '$.k', 'long')")
    return (
        ev.select((k - k % 10).alias("k_decile"), k.alias("k"))
        .groupBy("k_decile")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("k").alias("sum_k"))
    )


ORACLE_VARIANT_JSON = """
WITH x AS (
    SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) AS k FROM events
)
SELECT k - k % 10 AS k_decile, CAST(count(*) AS BIGINT) AS n, sum(k) AS sum_k
FROM x GROUP BY 1
"""


# ---------------------------------------------------------------------------
# XML — built-in XML source round-trip (Spark 4)
# ---------------------------------------------------------------------------


def q_scan_xml(spark: SparkSession, sf_dir: str) -> DataFrame:
    """XML format round-trip (built into Spark 4): write the supplier dim
    as XML rows, read it back with an explicit schema, aggregate per
    nation. Exercises the remaining built-in semi-structured source
    beside csv/json/parquet/orc (q_scan_csv/q_scan_parquet/q_scan_orc)."""
    import tempfile

    sup = _t(spark, sf_dir, "supplier")
    out = tempfile.mkdtemp(prefix="aces_xml_") + "/supplier_xml"
    (
        sup.write.mode("overwrite")
        .option("rowTag", "supplier")
        .format("xml")
        .save(out)
    )
    back = (
        spark.read.schema("s_suppkey bigint, s_name string, s_nationkey int, s_acctbal double")
        .option("rowTag", "supplier")
        .format("xml")
        .load(out)
    )
    return back.groupBy("s_nationkey").agg(
        F.count(F.lit(1)).alias("n_suppliers"),
        F.sum(F.col("s_acctbal").cast("decimal(18,4)")).alias("sum_acctbal"),
    )


ORACLE_SCAN_XML = """
SELECT s_nationkey, CAST(count(*) AS BIGINT) AS n_suppliers,
       CAST(sum(CAST(s_acctbal AS DECIMAL(18,4))) AS DOUBLE) AS sum_acctbal
FROM supplier GROUP BY s_nationkey
"""

QUERIES_SCALE["q_recursive_spine"] = q_recursive_spine
ORACLE_SCALE["q_recursive_spine"] = ORACLE_RECURSIVE_SPINE
QUERIES_SCALE["q_variant_json"] = q_variant_json
ORACLE_SCALE["q_variant_json"] = ORACLE_VARIANT_JSON
QUERIES_SCALE["q_scan_xml"] = q_scan_xml
ORACLE_SCALE["q_scan_xml"] = ORACLE_SCAN_XML


# ---------------------------------------------------------------------------
# Deterministic weighted PageRank over the event-transition graph
# ---------------------------------------------------------------------------


def q_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two power-iteration rounds of weighted PageRank over the
    per-event-type user-transition graph, with dangling-mass
    redistribution. Incoming mass is floor-quantized to integers at
    2^40 before every shuffled sum, so the whole recursion is
    bit-reproducible on any partitioning — the oracle unrolls both
    iterations in SQL and must hash-match exactly."""
    from .operators import graph as gr

    ev = _t(spark, sf_dir, "events")
    edges = gr.transition_edges(ev)
    nodes = ev.select("user_id").distinct()
    pr = gr.pagerank(edges, nodes, damping=0.85, iters=2)
    return pr.select(F.col("node").alias("user_id"), "pr")


_PR_Q = "1099511627776.0"  # 2^40


def _pr_iter_sql(prev: str, tag: str) -> str:
    """One unrolled PageRank iteration: integer-quantized contributions
    (same pinned op order as operators.graph.pagerank), dangling mass,
    blend. Emits CTEs c{tag}, d{tag}, pr{tag}."""
    return f"""
c{tag} AS (
  SELECT e.dst AS node,
         SUM(CAST(floor(p.pr * e.w / o.outw * {_PR_Q}) AS BIGINT)) AS sq
  FROM edges e JOIN outw o ON e.src = o.src JOIN {prev} p ON p.node = e.src
  GROUP BY e.dst),
d{tag} AS (
  SELECT COALESCE(SUM(CAST(floor(p.pr * {_PR_Q} / (SELECT n FROM params)) AS BIGINT)), 0) AS dq
  FROM {prev} p LEFT JOIN outw o ON p.node = o.src WHERE o.src IS NULL),
pr{tag} AS (
  SELECT nd.node,
         (1.0 - 0.85) / (SELECT n FROM params)
         + 0.85 * (CAST(COALESCE(c.sq, 0) + (SELECT dq FROM d{tag}) AS DOUBLE) / {_PR_Q}) AS pr
  FROM nodes nd LEFT JOIN c{tag} c ON nd.node = c.node)"""


ORACLE_PAGERANK = f"""
WITH seq AS (
  SELECT user_id,
         lead(user_id) OVER (PARTITION BY event_type ORDER BY ts, event_id) AS dst
  FROM events),
edges AS (
  SELECT user_id AS src, dst, CAST(COUNT(*) AS BIGINT) AS w
  FROM seq WHERE dst IS NOT NULL AND dst <> user_id GROUP BY 1, 2),
nodes AS (SELECT DISTINCT user_id AS node FROM events),
params AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM nodes),
outw AS (SELECT src, SUM(w) AS outw FROM edges GROUP BY src),
pr0 AS (SELECT node, 1.0 / (SELECT n FROM params) AS pr FROM nodes),
{_pr_iter_sql('pr0', '1')},
{_pr_iter_sql('pr1', '2')}
SELECT node AS user_id, pr FROM pr2
"""

QUERIES_SCALE["q_pagerank"] = q_pagerank
ORACLE_SCALE["q_pagerank"] = ORACLE_PAGERANK


# ---------------------------------------------------------------------------
# Point-in-time (PIT) join: facts to the SCD2 version valid at fact time
# ---------------------------------------------------------------------------


def q_scd2_pit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time dimension lookup — every lineitem joined to the
    customer-dimension VERSION valid at its ship date. Because SCD2
    intervals partition time, PIT reduces to an AS-OF join on
    (customer, valid_from <= ship, latest) — so the engine composes
    scd2 version-building with the cogrouped merge_asof operator (one
    shuffle per side, no interval self-join, no pair materialization).
    The oracle uses DuckDB's NATIVE ASOF JOIN — two independent
    implementations of PIT semantics must agree. Published compactly as
    per-priority fact counts."""
    from .operators import joins as jn

    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    versions = (
        o.groupBy("o_custkey", F.to_date("o_orderdate").alias("valid_from"))
        .agg(F.max_by("o_orderpriority", "o_orderkey").alias("priority"))
        .select(
            "o_custkey", F.col("valid_from").cast("timestamp").alias("vts"), "priority"
        )
    )
    facts = li.join(
        o.select("o_orderkey", "o_custkey"), li.l_orderkey == F.col("o_orderkey")
    ).select(
        "o_custkey", F.to_date("l_shipdate").cast("timestamp").alias("sts")
    )
    pit = jn.asof_join(
        facts, versions, on="o_custkey", left_ts="sts", right_ts="vts",
        right_cols=["priority"],
    )
    return pit.groupBy(F.col("r_priority").alias("priority")).agg(
        F.count(F.lit(1)).alias("n_lines")
    )


ORACLE_SCD2_PIT = """
WITH versions AS (
  SELECT o_custkey, CAST(CAST(o_orderdate AS DATE) AS TIMESTAMP) AS vts,
         arg_max(o_orderpriority, o_orderkey) AS priority
  FROM orders GROUP BY 1, 2),
facts AS (
  SELECT o.o_custkey, CAST(CAST(l.l_shipdate AS DATE) AS TIMESTAMP) AS sts
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey),
pit AS (
  SELECT f.o_custkey, v.priority
  FROM facts f ASOF JOIN versions v
    ON f.o_custkey = v.o_custkey AND f.sts >= v.vts)
SELECT priority, CAST(COUNT(*) AS BIGINT) AS n_lines FROM pit GROUP BY priority
"""

QUERIES_SCALE["q_scd2_pit"] = q_scd2_pit
ORACLE_SCALE["q_scd2_pit"] = ORACLE_SCD2_PIT


def q_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle count on the (undirected) user-transition graph via
    degree orientation — out-degrees bounded by O(sqrt(E)) so the wedge
    join cannot blow up on hubs; two equi-joins, each triangle counted
    once."""
    from .operators import graph as gr

    ev = _t(spark, sf_dir, "events")
    return gr.triangle_count(gr.transition_edges(ev))


ORACLE_TRIANGLES = """
WITH seq AS (
  SELECT user_id,
         lead(user_id) OVER (PARTITION BY event_type ORDER BY ts, event_id) AS dst
  FROM events),
edges AS (
  SELECT user_id AS src, dst FROM seq WHERE dst IS NOT NULL AND dst <> user_id),
und AS (SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b FROM edges),
deg AS (SELECT node, COUNT(*) AS d
        FROM (SELECT a AS node FROM und UNION ALL SELECT b AS node FROM und)
        GROUP BY node),
orient AS (
  SELECT CASE WHEN (da.d < db.d) OR (da.d = db.d AND u.a < u.b) THEN u.a ELSE u.b END AS u,
         CASE WHEN (da.d < db.d) OR (da.d = db.d AND u.a < u.b) THEN u.b ELSE u.a END AS v
  FROM und u JOIN deg da ON u.a = da.node JOIN deg db ON u.b = db.node)
SELECT CAST(COUNT(*) AS BIGINT) AS n_triangles
FROM orient e1 JOIN orient e2 ON e1.v = e2.u
JOIN orient e3 ON e3.u = e1.u AND e3.v = e2.v
"""

QUERIES_SCALE["q_triangles"] = q_triangles
ORACLE_SCALE["q_triangles"] = ORACLE_TRIANGLES


def q_markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-normalized transition matrix of the user hand-off graph:
    P(dst | src) = w / out-weight — one partial-agg groupBy + one
    equi-join with the out-weight table; the division is a single
    exact IEEE op (integer/integer) so probabilities hash-match."""
    from .operators import graph as gr

    ev = _t(spark, sf_dir, "events")
    edges = gr.transition_edges(ev)
    outw = edges.groupBy("src").agg(F.sum("w").alias("outw"))
    return edges.join(outw, "src").select(
        "src", "dst", "w", (F.col("w").cast("double") / F.col("outw")).alias("p")
    )


ORACLE_MARKOV = """
WITH seq AS (
  SELECT user_id,
         lead(user_id) OVER (PARTITION BY event_type ORDER BY ts, event_id) AS dst
  FROM events),
edges AS (
  SELECT user_id AS src, dst, CAST(COUNT(*) AS BIGINT) AS w
  FROM seq WHERE dst IS NOT NULL AND dst <> user_id GROUP BY 1, 2),
outw AS (SELECT src, CAST(SUM(w) AS BIGINT) AS outw FROM edges GROUP BY src)
SELECT e.src, e.dst, e.w, CAST(e.w AS DOUBLE) / o.outw AS p
FROM edges e JOIN outw o ON e.src = o.src
"""


def q_khop_reach(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-hop reach per seed node (the influence/diffusion primitive):
    distinct nodes reachable in ≤2 directed hops, excluding the seed.
    Hop 2 is one self-equi-join of the edge list; reach sets stay as
    (seed, node) pairs and collapse in a count-distinct — never
    collected or exploded into arrays."""
    from .operators import graph as gr

    ev = _t(spark, sf_dir, "events")
    edges = gr.transition_edges(ev).select("src", "dst")
    seeds = [0, 1, 2, 3, 4]
    h1 = edges.where(F.col("src").isin(seeds)).select(
        F.col("src").alias("seed"), F.col("dst").alias("node")
    )
    e2 = edges.select(F.col("src").alias("node"), F.col("dst").alias("node2"))
    h2 = h1.join(e2, "node").select("seed", F.col("node2").alias("node"))
    reach = h1.unionByName(h2).where(F.col("seed") != F.col("node")).distinct()
    return reach.groupBy("seed").agg(F.countDistinct("node").alias("n_reach"))


ORACLE_KHOP = """
WITH seq AS (
  SELECT user_id,
         lead(user_id) OVER (PARTITION BY event_type ORDER BY ts, event_id) AS dst
  FROM events),
edges AS (
  SELECT DISTINCT user_id AS src, dst
  FROM seq WHERE dst IS NOT NULL AND dst <> user_id),
h1 AS (SELECT src AS seed, dst AS node FROM edges WHERE src IN (0, 1, 2, 3, 4)),
h2 AS (SELECT h1.seed, e.dst AS node FROM h1 JOIN edges e ON h1.node = e.src),
reach AS (SELECT DISTINCT seed, node FROM (SELECT * FROM h1 UNION ALL SELECT * FROM h2)
          WHERE seed <> node)
SELECT seed, CAST(COUNT(DISTINCT node) AS BIGINT) AS n_reach FROM reach GROUP BY seed
"""

QUERIES_SCALE["q_markov_transitions"] = q_markov_transitions
ORACLE_SCALE["q_markov_transitions"] = ORACLE_MARKOV
QUERIES_SCALE["q_khop_reach"] = q_khop_reach
ORACLE_SCALE["q_khop_reach"] = ORACLE_KHOP


def q_bloom_prefilter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit broadcast bloom pre-filter (operators/joins.bloom_build
    / bloom_probe): rich-customer keys folded into 2048 32-bit words
    with the engine-portable hashes, probed by every distinct orders
    customer. Published as the filter's confusion counts — including
    n_false_neg, which the bloom guarantee pins to 0 — so both the bit
    mechanics AND the no-false-negative property are hash-checked."""
    from .operators import joins as jn

    c = (
        _t(spark, sf_dir, "customer")
        .where(F.col("c_acctbal") > 9000)
        .select("c_custkey")
    )
    o = _t(spark, sf_dir, "orders")
    bloom = jn.bloom_build(c, "c_custkey")
    probed = jn.bloom_probe(o, "o_custkey", bloom)
    exact = c.select(F.col("c_custkey").alias("k"), F.lit(True).alias("is_member"))
    res = probed.join(exact, "k", "left").select(
        "k", "bloom_pass", F.coalesce("is_member", F.lit(False)).alias("is_member")
    )
    return res.agg(
        F.count(F.lit(1)).alias("n_probe_keys"),
        F.sum(F.col("is_member").cast("bigint")).alias("n_members"),
        F.sum(F.col("bloom_pass").cast("bigint")).alias("n_pass"),
        F.sum((F.col("bloom_pass") & ~F.col("is_member")).cast("bigint")).alias(
            "n_false_pos"
        ),
        F.sum((~F.col("bloom_pass") & F.col("is_member")).cast("bigint")).alias(
            "n_false_neg"
        ),
    )


from .operators.joins import BLOOM_K as _BK  # noqa: E402
from airflow_crypto_etl_spark.functions.hashing import affine_hash_sql as _ah  # noqa: E402

ORACLE_BLOOM_PREFILTER = f"""
WITH keys AS (
  SELECT DISTINCT c_custkey AS k FROM customer WHERE c_acctbal > 9000),
pos AS (
  SELECT k, ({_ah('k', 'j')}) % 65536 AS pos
  FROM keys CROSS JOIN range(0, {_BK}) t(j)),
words AS (
  SELECT pos >> 5 AS word_idx,
         bit_or(CAST(1 AS BIGINT) << CAST(pos % 32 AS INTEGER)) AS mask
  FROM pos GROUP BY 1),
probe AS (SELECT DISTINCT o_custkey AS k FROM orders),
ppos AS (
  SELECT k, ({_ah('k', 'j')}) % 65536 AS pos
  FROM probe CROSS JOIN range(0, {_BK}) t(j)),
tested AS (
  SELECT ppos.k,
         MIN(((COALESCE(words.mask, 0) >> CAST(ppos.pos % 32 AS INTEGER)) & 1) = 1)
           AS bloom_pass
  FROM ppos LEFT JOIN words ON (ppos.pos >> 5) = words.word_idx
  GROUP BY ppos.k),
res AS (
  SELECT t.k, t.bloom_pass, (keys.k IS NOT NULL) AS is_member
  FROM tested t LEFT JOIN keys ON t.k = keys.k)
SELECT CAST(COUNT(*) AS BIGINT) AS n_probe_keys,
       CAST(SUM(CASE WHEN is_member THEN 1 ELSE 0 END) AS BIGINT) AS n_members,
       CAST(SUM(CASE WHEN bloom_pass THEN 1 ELSE 0 END) AS BIGINT) AS n_pass,
       CAST(SUM(CASE WHEN bloom_pass AND NOT is_member THEN 1 ELSE 0 END) AS BIGINT)
         AS n_false_pos,
       CAST(SUM(CASE WHEN NOT bloom_pass AND is_member THEN 1 ELSE 0 END) AS BIGINT)
         AS n_false_neg
FROM res
"""

QUERIES_SCALE["q_bloom_prefilter"] = q_bloom_prefilter
ORACLE_SCALE["q_bloom_prefilter"] = ORACLE_BLOOM_PREFILTER


def q_label_prop(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two synchronous label-propagation rounds over the symmetrized
    user-transition graph, reported as community sizes. All-integer
    state with total-order tiebreaks (weight desc, label asc), so the
    oracle unrolls both rounds in SQL and must hash-match exactly —
    the community structure is a function of the data alone, not of
    partitioning or visit order."""
    from .operators import graph as gr

    ev = _t(spark, sf_dir, "events")
    edges = gr.transition_edges(ev)
    nodes = ev.select(F.col("user_id").alias("node")).distinct()
    labels = gr.label_propagation(edges, nodes, iters=2)
    return labels.groupBy(F.col("lbl").alias("community")).agg(
        F.count(F.lit(1)).alias("n_members"),
        F.min("node").alias("min_node"),
    )


_LP_ITER = """
s{tag} AS (
  SELECT u.dst AS node, l.lbl AS lbl, CAST(SUM(u.w) AS BIGINT) AS wsum
  FROM und u JOIN {prev} l ON u.src = l.node
  GROUP BY u.dst, l.lbl),
b{tag} AS (
  SELECT node, lbl AS new_lbl FROM (
    SELECT node, lbl,
           row_number() OVER (PARTITION BY node ORDER BY wsum DESC, lbl ASC) AS rn
    FROM s{tag}) WHERE rn = 1),
l{tag} AS (
  SELECT p.node, coalesce(b.new_lbl, p.lbl) AS lbl
  FROM {prev} p LEFT JOIN b{tag} b ON p.node = b.node)"""

ORACLE_LABEL_PROP = f"""
WITH seq AS (
  SELECT user_id,
         lead(user_id) OVER (PARTITION BY event_type ORDER BY ts, event_id) AS dst
  FROM events),
edges AS (
  SELECT user_id AS src, dst, CAST(COUNT(*) AS BIGINT) AS w
  FROM seq WHERE dst IS NOT NULL AND dst <> user_id GROUP BY 1, 2),
und AS (
  SELECT src, dst, CAST(SUM(w) AS BIGINT) AS w FROM (
    SELECT src, dst, w FROM edges
    UNION ALL
    SELECT dst AS src, src AS dst, w FROM edges)
  GROUP BY src, dst),
l0 AS (
  SELECT DISTINCT user_id AS node, user_id AS lbl FROM events),
{_LP_ITER.format(tag=1, prev="l0")},
{_LP_ITER.format(tag=2, prev="l1")}
SELECT lbl AS community,
       CAST(count(*) AS BIGINT) AS n_members,
       CAST(min(node) AS BIGINT) AS min_node
FROM l2 GROUP BY lbl
"""

QUERIES_SCALE["q_label_prop"] = q_label_prop
ORACLE_SCALE["q_label_prop"] = ORACLE_LABEL_PROP


# ---------------------------------------------------------------------------
# Interval-overlap self-join (round 6): concurrent-shipment pairs.
# The classic time-interval join that naive engines plan as a cartesian
# range join; here it is an EQUI-join on the natural partition key
# (l_partkey) with the overlap range predicate applied post-match, so
# candidate pairs scale with per-key group size (bounded ~tens of line
# items per part in TPC-H-shaped data at any SF), never |R|x|S|.
# ---------------------------------------------------------------------------


def q_overlap_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per part brand: how many UNORDERED pairs of line items of the
    same part have overlapping handling windows [shipdate, shipdate +
    floor(quantity) days], and the average overlap length in days.

    Plan: derive the interval once, self-equi-join on l_partkey (one
    sort-merge shuffle keyed on partkey — co-partitioned, no cartesian),
    order the pair by (orderkey, linenumber) to count each pair once,
    broadcast part for the brand rollup. All arithmetic is integer/date;
    the single double division is the final average (pinned both sides).
    """
    li = _t(spark, sf_dir, "lineitem").select(
        "l_partkey",
        "l_orderkey",
        "l_linenumber",
        F.to_date("l_shipdate").alias("_s"),
        F.date_add(
            F.to_date("l_shipdate"), F.floor("l_quantity").cast("int")
        ).alias("_e"),
    )
    a = li.alias("a")
    b = li.alias("b")
    pairs = a.join(
        b,
        (F.col("a.l_partkey") == F.col("b.l_partkey"))
        & (F.col("a._s") <= F.col("b._e"))
        & (F.col("b._s") <= F.col("a._e"))
        & (
            (F.col("a.l_orderkey") < F.col("b.l_orderkey"))
            | (
                (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
                & (F.col("a.l_linenumber") < F.col("b.l_linenumber"))
            )
        ),
        "inner",
    ).select(
        F.col("a.l_partkey").alias("l_partkey"),
        (
            F.datediff(
                F.least(F.col("a._e"), F.col("b._e")),
                F.greatest(F.col("a._s"), F.col("b._s")),
            )
            + 1
        ).alias("_ov"),
    )
    p = _t(spark, sf_dir, "part").select("p_partkey", "p_brand")
    return (
        pairs.join(F.broadcast(p), pairs.l_partkey == p.p_partkey)
        .groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            (
                F.sum("_ov").cast("double") / F.count(F.lit(1)).cast("double")
            ).alias("avg_overlap_days"),
        )
    )


ORACLE_OVERLAP_PAIRS = """
WITH li AS (
  SELECT l_partkey, l_orderkey, l_linenumber,
         CAST(l_shipdate AS DATE) AS s,
         CAST(l_shipdate AS DATE) + CAST(floor(l_quantity) AS INT) AS e
  FROM lineitem),
pairs AS (
  SELECT a.l_partkey,
         date_diff('day', greatest(a.s, b.s), least(a.e, b.e)) + 1 AS ov
  FROM li a JOIN li b
    ON a.l_partkey = b.l_partkey
   AND a.s <= b.e AND b.s <= a.e
   AND (a.l_orderkey < b.l_orderkey
        OR (a.l_orderkey = b.l_orderkey AND a.l_linenumber < b.l_linenumber)))
SELECT p_brand,
       CAST(count(*) AS BIGINT) AS n_pairs,
       CAST(sum(ov) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS avg_overlap_days
FROM pairs JOIN part ON l_partkey = p_partkey
GROUP BY p_brand
"""

QUERIES_SCALE["q_overlap_pairs"] = q_overlap_pairs
ORACLE_SCALE["q_overlap_pairs"] = ORACLE_OVERLAP_PAIRS


# ---------------------------------------------------------------------------
# Closed-form distributed linear models (operators/linalg.py): ridge
# regression and a one-step Newton logistic fit. The data pass is ONE
# partial-agg shuffle producing exact-decimal Gram sums; the solve is a
# shared SQL expression tree (Cramer 3x3) both engines evaluate
# verbatim, so the doubles agree bit-for-bit.
# ---------------------------------------------------------------------------

from .operators import linalg as la  # noqa: E402

_RIDGE_LAM = 1.0


def q_ridge_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-returnflag ridge fit of l_extendedprice on (l_quantity,
    l_discount), unpenalized intercept, lam=1. One shuffle carrying 10
    decimal sums per group; Cramer epilogue + R-squared over the sums."""
    li = _t(spark, sf_dir, "lineitem")
    g = la.gram_aggregate(
        li,
        ["l_returnflag"],
        F.col("l_quantity").cast("decimal(18,4)"),
        F.col("l_discount").cast("decimal(18,4)"),
        F.col("l_extendedprice").cast("decimal(18,4)"),
    )
    b0s, b1s, b2s = la.ridge_beta_sql(_RIDGE_LAM)
    b = (
        g.withColumn("b0", F.expr(b0s))
        .withColumn("b1", F.expr(b1s))
        .withColumn("b2", F.expr(b2s))
    )
    return b.select(
        "l_returnflag",
        "n",
        F.round("b0", 6).alias("beta0"),
        F.round("b1", 6).alias("beta1"),
        F.round("b2", 6).alias("beta2"),
        F.round(F.expr(la.r2_sql()), 6).alias("r2"),
    )


ORACLE_RIDGE_REGRESSION = f"""
WITH s AS ({la.gram_sums_sql(
    "FROM lineitem",
    "CAST(l_quantity AS DECIMAL(18,4))",
    "CAST(l_discount AS DECIMAL(18,4))",
    "CAST(l_extendedprice AS DECIMAL(18,4))",
    group="l_returnflag,",
)}),
b AS (SELECT *, {la.ridge_beta_sql(_RIDGE_LAM)[0]} AS b0,
               {la.ridge_beta_sql(_RIDGE_LAM)[1]} AS b1,
               {la.ridge_beta_sql(_RIDGE_LAM)[2]} AS b2
      FROM s)
SELECT l_returnflag, n,
       round(b0, 6) AS beta0, round(b1, 6) AS beta1, round(b2, 6) AS beta2,
       round({la.r2_sql()}, 6) AS r2
FROM b
"""

QUERIES_SCALE["q_ridge_regression"] = q_ridge_regression
ORACLE_SCALE["q_ridge_regression"] = ORACLE_RIDGE_REGRESSION


_LOGIT_LAM = 0.5


def q_logistic_newton(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One Newton/IRLS step (from beta=0) of L2-logistic P(returnflag='R')
    on (l_quantity, l_discount). Feeding y as the exact decimal (y-1/2)
    makes the gradient the plain moment sums; the Hessian is the scaled
    Gram matrix — so the SAME one-shuffle sufficient statistics as
    q_ridge_regression fit a classifier. Global model: single row."""
    li = _t(spark, sf_dir, "lineitem")
    yc = F.expr(
        "CAST(CASE WHEN l_returnflag = 'R' THEN 0.5 ELSE -0.5 END AS DECIMAL(2,1))"
    )
    g = la.gram_aggregate(
        li,
        [],
        F.col("l_quantity").cast("decimal(18,4)"),
        F.col("l_discount").cast("decimal(18,4)"),
        yc,
    )
    b0s, b1s, b2s = la.newton_beta_sql(_LOGIT_LAM)
    return g.select(
        "n",
        F.round(F.expr(b0s), 6).alias("beta0"),
        F.round(F.expr(b1s), 6).alias("beta1"),
        F.round(F.expr(b2s), 6).alias("beta2"),
    )


ORACLE_LOGISTIC_NEWTON = f"""
WITH s AS ({la.gram_sums_sql(
    "FROM lineitem",
    "CAST(l_quantity AS DECIMAL(18,4))",
    "CAST(l_discount AS DECIMAL(18,4))",
    "CAST(CASE WHEN l_returnflag = 'R' THEN 0.5 ELSE -0.5 END AS DECIMAL(2,1))",
)})
SELECT n,
       round({la.newton_beta_sql(_LOGIT_LAM)[0]}, 6) AS beta0,
       round({la.newton_beta_sql(_LOGIT_LAM)[1]}, 6) AS beta1,
       round({la.newton_beta_sql(_LOGIT_LAM)[2]}, 6) AS beta2
FROM s
"""

QUERIES_SCALE["q_logistic_newton"] = q_logistic_newton
ORACLE_SCALE["q_logistic_newton"] = ORACLE_LOGISTIC_NEWTON


# ---------------------------------------------------------------------------
# KMV (k-minimum-values / theta) sketch set intersection: estimate
# |users(click) AND users(view)| from two bottom-k hash sketches, with
# the exact answer computed alongside (the q_ann_recall pattern: the
# truth is in-engine, the estimator is what ships to 100 TB).
# ---------------------------------------------------------------------------

_KMV_K = 64
_KMV_SEED = 11


def q_kmv_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theta-sketch intersection (Beyer et al. 2007 KMV; theta-sketch
    set operations a la DataSketches): the union's k smallest
    deterministic member hashes, each carrying its set-membership flags,
    estimate |A∪B| via (k−1)·P/θ and the Jaccard via the flagged
    fraction of the sketch. The bottom-k plans as TakeOrderedAndProject
    (per-partition local top-k, then a driver merge of #partitions·k
    rows — NO global sort, no giant partition); the membership flags
    ride the same pass, so intersection costs nothing extra. Separately
    built per-set sketches would combine to EXACTLY this frame
    (θ_union ≤ θ_set puts every flagged survivor inside its set's own
    sketch), so the one-pass form is the mergeable semantics, fused.
    When the union is smaller than k the estimate degrades to exact by
    construction. The exact intersection is computed alongside (the
    q_ann_recall pattern: in-engine truth next to the estimator)."""
    from .functions.hashing import MERSENNE_P, affine_hash

    ev = _t(spark, sf_dir, "events")
    flags = (
        ev.filter(F.col("event_type").isin("click", "view"))
        .select("event_type", "user_id")
        .distinct()
        .select(
            affine_hash(F.col("user_id"), F.lit(_KMV_SEED)).alias("h"),
            (F.col("event_type") == "click").cast("int").alias("in_a"),
            (F.col("event_type") == "view").cast("int").alias("in_b"),
        )
        .groupBy("h")
        .agg(F.max("in_a").alias("in_a"), F.max("in_b").alias("in_b"))
    )
    sku = flags.orderBy("h").limit(_KMV_K)
    m = sku.agg(
        F.count(F.lit(1)).alias("n_sk"),
        F.max("h").alias("theta"),
        F.sum(((F.col("in_a") == 1) & (F.col("in_b") == 1)).cast("bigint")).alias(
            "n_both"
        ),
    )
    exact = flags.agg(
        F.count(F.lit(1)).alias("exact_union"),
        F.sum(((F.col("in_a") == 1) & (F.col("in_b") == 1)).cast("bigint")).alias(
            "exact_intersect"
        ),
    )
    # 1-row x 1-row combine: broadcast scalar bind (allowlisted pattern)
    est_union = F.when(
        F.col("n_sk") < F.lit(_KMV_K),
        F.col("n_sk").cast("double"),
    ).otherwise(
        F.lit(float(_KMV_K - 1))
        * F.lit(float(MERSENNE_P))
        / F.col("theta").cast("double")
    )
    est_j = F.col("n_both").cast("double") / F.col("n_sk").cast("double")
    return (
        m.join(F.broadcast(exact))
        .withColumn("est_union", F.round(est_union, 6))
        .withColumn("est_jaccard", F.round(est_j, 6))
        .withColumn("est_intersect", F.round(est_j * est_union, 6))
        .select(
            F.lit(_KMV_K).cast("int").alias("k"),
            "n_sk",
            "est_union",
            "est_jaccard",
            "est_intersect",
            "exact_union",
            "exact_intersect",
        )
    )


ORACLE_KMV_INTERSECT = f"""
WITH du AS (
  SELECT DISTINCT event_type, user_id FROM events
  WHERE event_type IN ('click', 'view')),
flags AS (
  SELECT h, max(in_a) AS in_a, max(in_b) AS in_b
  FROM (SELECT {_ah('user_id', str(_KMV_SEED))} AS h,
               CASE WHEN event_type = 'click' THEN 1 ELSE 0 END AS in_a,
               CASE WHEN event_type = 'view' THEN 1 ELSE 0 END AS in_b
        FROM du)
  GROUP BY h),
sku AS (SELECT * FROM flags ORDER BY h LIMIT {_KMV_K}),
m AS (
  SELECT CAST(count(*) AS BIGINT) AS n_sk,
         max(h) AS theta,
         CAST(sum(CASE WHEN in_a = 1 AND in_b = 1 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_both
  FROM sku),
ex AS (
  SELECT CAST(count(*) AS BIGINT) AS exact_union,
         CAST(sum(CASE WHEN in_a = 1 AND in_b = 1 THEN 1 ELSE 0 END) AS BIGINT)
           AS exact_intersect
  FROM flags)
SELECT CAST({_KMV_K} AS INT) AS k, n_sk,
       round(CASE WHEN n_sk < {_KMV_K} THEN CAST(n_sk AS DOUBLE)
                  ELSE CAST({float(_KMV_K - 1)!r} AS DOUBLE) * CAST({{P}}.0 AS DOUBLE)
                       / CAST(theta AS DOUBLE) END, 6) AS est_union,
       round(CAST(n_both AS DOUBLE) / CAST(n_sk AS DOUBLE), 6) AS est_jaccard,
       round((CAST(n_both AS DOUBLE) / CAST(n_sk AS DOUBLE))
             * (CASE WHEN n_sk < {_KMV_K} THEN CAST(n_sk AS DOUBLE)
                     ELSE CAST({float(_KMV_K - 1)!r} AS DOUBLE) * CAST({{P}}.0 AS DOUBLE)
                          / CAST(theta AS DOUBLE) END), 6) AS est_intersect,
       exact_union, exact_intersect
FROM m CROSS JOIN ex
"""

from .functions.hashing import MERSENNE_P as _MP  # noqa: E402

ORACLE_KMV_INTERSECT = ORACLE_KMV_INTERSECT.replace("{P}", str(_MP))

QUERIES_SCALE["q_kmv_intersect"] = q_kmv_intersect
ORACLE_SCALE["q_kmv_intersect"] = ORACLE_KMV_INTERSECT


# ---------------------------------------------------------------------------
# Streaming model maintenance: the q_ridge_regression sufficient
# statistics kept incrementally by a stateful stream, closed with the
# SAME shared Cramer epilogue. The mergeable-sufficient-statistics
# property q_ridge_regression exploits spatially (partial aggregation
# across partitions) is exploited temporally here (micro-batch folds):
# integer sums make the final state bit-identical either way.
# ---------------------------------------------------------------------------

_SG_LAM = 1.0


def q_stream_gram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type ridge fit of value on (hour-of-day, day-of-month)
    whose Gram/moment sums are maintained by a streaming stateful fold
    (applyInPandasWithState, O(1) integer state per key) instead of a
    batch aggregation. The serving view takes the latest state per key
    (max_by n — batching-invariant because integer sums are), scales
    the exact ten-thousandths back to value units, and applies the
    identical ridge_beta_sql epilogue as the batch family — so the
    oracle is simply the BATCH computation of the same sums: any
    drift between incremental and batch maintenance fails the hash."""
    from .streaming.windows import streaming_gram_per_type

    upd = streaming_gram_per_type(spark, sf_dir)
    sums = ["sx1", "sx2", "sy", "sx11", "sx12", "sx22", "sx1y", "sx2y", "syy"]
    latest = upd.groupBy("event_type").agg(
        F.max("n").alias("n"), *[F.max_by(c, "n").alias(c) for c in sums]
    )
    sc = {"sy": 1e4, "sx1y": 1e4, "sx2y": 1e4, "syy": 1e8}
    d = latest.select(
        "event_type",
        "n",
        F.col("n").cast("double").alias("n_d"),
        *[
            (F.col(c).cast("double") / F.lit(sc[c])).alias(f"{c}_d")
            if c in sc
            else F.col(c).cast("double").alias(f"{c}_d")
            for c in sums
        ],
    )
    b0s, b1s, b2s = la.ridge_beta_sql(_SG_LAM)
    b = (
        d.withColumn("b0", F.expr(b0s))
        .withColumn("b1", F.expr(b1s))
        .withColumn("b2", F.expr(b2s))
    )
    return b.select(
        "event_type",
        "n",
        F.round("b0", 6).alias("beta0"),
        F.round("b1", 6).alias("beta1"),
        F.round("b2", 6).alias("beta2"),
        F.round(F.expr(la.r2_sql()), 6).alias("r2"),
    )


def _sg_oracle() -> str:
    b0s, b1s, b2s = la.ridge_beta_sql(_SG_LAM)
    return f"""
WITH f AS (
  SELECT event_type,
         CAST(hour(ts) AS BIGINT) AS x1,
         CAST(day(ts) AS BIGINT) AS x2,
         CAST(CAST(value AS DECIMAL(18,4)) * 10000 AS BIGINT) AS yq
  FROM events),
s AS (
  SELECT event_type,
         CAST(count(*) AS BIGINT) AS n,
         CAST(count(*) AS DOUBLE) AS n_d,
         CAST(sum(x1) AS DOUBLE) AS sx1_d,
         CAST(sum(x2) AS DOUBLE) AS sx2_d,
         CAST(sum(yq) AS DOUBLE) / 10000.0 AS sy_d,
         CAST(sum(x1 * x1) AS DOUBLE) AS sx11_d,
         CAST(sum(x1 * x2) AS DOUBLE) AS sx12_d,
         CAST(sum(x2 * x2) AS DOUBLE) AS sx22_d,
         CAST(sum(x1 * yq) AS DOUBLE) / 10000.0 AS sx1y_d,
         CAST(sum(x2 * yq) AS DOUBLE) / 10000.0 AS sx2y_d,
         CAST(sum(yq * yq) AS DOUBLE) / 100000000.0 AS syy_d
  FROM f GROUP BY event_type),
b AS (SELECT *, {b0s} AS b0, {b1s} AS b1, {b2s} AS b2 FROM s)
SELECT event_type, n,
       round(b0, 6) AS beta0, round(b1, 6) AS beta1, round(b2, 6) AS beta2,
       round({la.r2_sql()}, 6) AS r2
FROM b
"""


ORACLE_STREAM_GRAM = _sg_oracle()

QUERIES_SCALE["q_stream_gram"] = q_stream_gram
ORACLE_SCALE["q_stream_gram"] = ORACLE_STREAM_GRAM


# ---------------------------------------------------------------------------
# Join-key skew profiler: the measurement you run BEFORE choosing a
# join strategy (broadcast vs salted vs plain shuffle).
# ---------------------------------------------------------------------------


def q_skew_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Key-distribution profile for the two hottest join keys
    (events.user_id, lineitem.l_orderkey): row count, distinct keys,
    the heaviest key's frequency and share, and the skew factor
    max/avg — the number that decides whether operators/joins
    .salted_join earns its extra exchange. Two partial-agg passes per
    key (key counts, then a 1-row rollup of the counts); all-integer
    until the published ratios. The per-key counts relation is the
    only shuffled state (one row per distinct key)."""
    def profile(df: DataFrame, key: str, label: str) -> DataFrame:
        freq = df.groupBy(F.col(key).alias("k")).agg(F.count(F.lit(1)).alias("f"))
        return freq.agg(
            F.lit(label).alias("source_key"),
            F.sum("f").cast("bigint").alias("n_rows"),
            F.count(F.lit(1)).alias("n_keys"),
            F.max("f").cast("bigint").alias("max_freq"),
        ).select(
            "source_key",
            "n_rows",
            "n_keys",
            "max_freq",
            F.round(
                F.col("n_rows").cast("double") / F.col("n_keys").cast("double"), 6
            ).alias("avg_freq"),
            F.round(
                F.col("max_freq").cast("double")
                * F.col("n_keys").cast("double")
                / F.col("n_rows").cast("double"),
                6,
            ).alias("skew_factor"),
            F.round(
                F.col("max_freq").cast("double") / F.col("n_rows").cast("double"), 6
            ).alias("top_share"),
        )
    ev = _t(spark, sf_dir, "events")
    li = _t(spark, sf_dir, "lineitem")
    return profile(ev, "user_id", "events.user_id").unionByName(
        profile(li, "l_orderkey", "lineitem.l_orderkey")
    )


def _skew_sql(table: str, key: str) -> str:
    return f"""
SELECT '{table}.{key}' AS source_key,
       CAST(sum(f) AS BIGINT) AS n_rows,
       CAST(count(*) AS BIGINT) AS n_keys,
       CAST(max(f) AS BIGINT) AS max_freq,
       round(CAST(sum(f) AS DOUBLE) / CAST(count(*) AS DOUBLE), 6) AS avg_freq,
       round(CAST(max(f) AS DOUBLE) * CAST(count(*) AS DOUBLE)
             / CAST(sum(f) AS DOUBLE), 6) AS skew_factor,
       round(CAST(max(f) AS DOUBLE) / CAST(sum(f) AS DOUBLE), 6) AS top_share
FROM (SELECT {key}, CAST(count(*) AS BIGINT) AS f FROM {table} GROUP BY {key})
"""


ORACLE_SKEW_PROFILE = f"""
{_skew_sql('events', 'user_id')}
UNION ALL
{_skew_sql('lineitem', 'l_orderkey')}
"""

QUERIES_SCALE["q_skew_profile"] = q_skew_profile
ORACLE_SCALE["q_skew_profile"] = ORACLE_SKEW_PROFILE
