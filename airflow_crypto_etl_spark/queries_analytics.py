"""Event/corpus analytics staples a reference user would reach for
next: funnel conversion, cohort retention, per-group winsorization,
quality-aware dedup, domain capping, and PMI collocations. Each query
has a DuckDB oracle twin built from the same exact-integer /
fixed-op-order arithmetic as the Spark plan.

Scale notes are per-query; the shared theme is: aggregate small (per
group / per user / per token) BEFORE any join, broadcast the small
side, and keep every hot-path expression inside codegen.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .functions.hashing import affine_hash_sql
from .operators import rank as rk
from .queries import _t

# ---------------------------------------------------------------------------
# Funnel conversion (signup → click → purchase)
# ---------------------------------------------------------------------------


def q_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-touch funnel: a user converts stage k if their first
    stage-k event is at-or-after their first stage-(k-1) event. One
    aggregation pass builds per-user first-touch timestamps (partial
    agg, one shuffle on user_id), the stage counts are a single global
    rollup of boolean flags — no joins, no window. At 100 TB the
    per-user frame is the only shuffled state and it is one row per
    user."""
    ev = _t(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "signup", F.col("ts"))).alias("t_signup"),
        F.min(F.when(F.col("event_type") == "click", F.col("ts"))).alias("t_click"),
        F.min(F.when(F.col("event_type") == "purchase", F.col("ts"))).alias("t_purchase"),
    )
    s1 = F.col("t_signup").isNotNull()
    s2 = s1 & F.col("t_click").isNotNull() & (F.col("t_click") >= F.col("t_signup"))
    s3 = s2 & F.col("t_purchase").isNotNull() & (F.col("t_purchase") >= F.col("t_click"))
    return per_user.agg(
        F.count(F.when(s1, 1)).alias("n_signup"),
        F.count(F.when(s2, 1)).alias("n_signup_click"),
        F.count(F.when(s3, 1)).alias("n_signup_click_purchase"),
    )


ORACLE_FUNNEL = """
WITH per_user AS (
  SELECT user_id,
         min(CASE WHEN event_type = 'signup' THEN ts END) AS t_signup,
         min(CASE WHEN event_type = 'click' THEN ts END) AS t_click,
         min(CASE WHEN event_type = 'purchase' THEN ts END) AS t_purchase
  FROM events GROUP BY user_id)
SELECT CAST(count(CASE WHEN t_signup IS NOT NULL THEN 1 END) AS BIGINT) AS n_signup,
       CAST(count(CASE WHEN t_signup IS NOT NULL AND t_click >= t_signup THEN 1 END) AS BIGINT)
         AS n_signup_click,
       CAST(count(CASE WHEN t_signup IS NOT NULL AND t_click >= t_signup
                        AND t_purchase >= t_click THEN 1 END) AS BIGINT)
         AS n_signup_click_purchase
FROM per_user
"""


# ---------------------------------------------------------------------------
# Cohort retention
# ---------------------------------------------------------------------------


def q_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classic cohort grid: users grouped by first-seen day, counted on
    each later active day as (cohort_day, day_offset, n_users). Two
    aggregations — per-user first day (one row per user), then distinct
    (user, day) activity joined to it — the join's build side is the
    per-user cohort map (one row per user; at true scale this is a
    shuffle-hash join on user_id, already co-partitioned from the first
    agg)."""
    ev = _t(spark, sf_dir, "events").withColumn("day", F.to_date("ts"))
    cohort = ev.groupBy("user_id").agg(F.min("day").alias("cohort_day"))
    active = ev.select("user_id", "day").distinct()
    return (
        active.join(cohort, "user_id")
        .groupBy("cohort_day", F.datediff("day", "cohort_day").alias("day_offset"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_users"))
    )


ORACLE_COHORT_RETENTION = """
WITH cohort AS (
  SELECT user_id, min(CAST(ts AS DATE)) AS cohort_day FROM events GROUP BY user_id),
active AS (
  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events)
SELECT cohort_day, datediff('day', cohort_day, day) AS day_offset,
       CAST(count(*) AS BIGINT) AS n_users
FROM active JOIN cohort USING (user_id)
GROUP BY cohort_day, day_offset
"""


# ---------------------------------------------------------------------------
# Per-group winsorization (outlier clipping for training signals)
# ---------------------------------------------------------------------------


def q_winsorize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorize event values to each type's exact [p05, p95]: the
    bounds come from the DISTRIBUTED exact per-group percentile
    (operators/rank.grouped_percentiles — quantile-literal buckets +
    one partitioned window; the covering two rows per (group, p) are
    interpolated with Spark percentile's own (1−d)·lo + d·hi), then
    broadcast back over the fact. The previous ``percentile()`` agg
    concentrated each group into one sort task — the measured 100 TB
    lesson (BASELINE.md: 4× probe 2.7→10.2 riding spill thresholds).
    Clipped values rounded at 6dp: the interpolation can differ in the
    last ulp across engines (same guard as q_stats)."""
    ev = _t(spark, sf_dir, "events")
    bounds = rk.literal_frame(
        rk.grouped_percentiles(
            ev, "event_type", "value", [0.05, 0.95], tiebreak="event_id"
        ).select(
            "event_type",
            F.col("p_0_05").alias("p_lo"),
            F.col("p_0_95").alias("p_hi"),
        )
    )
    return (
        ev.join(F.broadcast(bounds), "event_type")
        .select(
            "event_id",
            "event_type",
            "value",
            F.round(F.greatest("p_lo", F.least("p_hi", F.col("value"))), 6).alias("value_w"),
        )
    )


ORACLE_WINSORIZE = """
WITH bounds AS (
  SELECT event_type,
         quantile_cont(value, 0.05) AS p_lo,
         quantile_cont(value, 0.95) AS p_hi
  FROM events GROUP BY event_type)
SELECT event_id, event_type, value,
       round(greatest(p_lo, least(p_hi, value)), 6) AS value_w
FROM events JOIN bounds USING (event_type)
"""


# ---------------------------------------------------------------------------
# Quality-aware dedup (keep the best copy of each duplicate group)
# ---------------------------------------------------------------------------


def q_dedup_keep_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup that keeps the BEST copy, not an arbitrary one: among
    exact-text duplicates, elect the doc with the highest quality
    score (ties → lowest doc_id). The corpus is doubled with a
    perturbed-quality copy so the election is exercised. One groupBy
    with a struct-max partial aggregate — the shuffle carries one
    candidate per (text, partition), identical to exact_dedup's scale
    shape (fingerprints, not bodies, would key the group at 100 TB)."""
    from .operators.text import quality_score

    base = quality_score(_t(spark, sf_dir, "documents")).select(
        "doc_id", "text", "quality_score"
    )
    # shifted copy with damped quality: the original must win its pair
    twin = base.select(
        (F.col("doc_id") + 1000000).alias("doc_id"),
        "text",
        (F.col("quality_score") * 0.5).alias("quality_score"),
    )
    corpus = base.unionByName(twin)
    best = F.max(
        F.struct(
            F.col("quality_score").alias("q"),
            (-F.col("doc_id")).alias("neg_id"),
        )
    ).alias("b")
    return (
        corpus.groupBy("text")
        .agg(best, F.count(F.lit(1)).cast("long").alias("n_copies"))
        .select(
            (-F.col("b.neg_id")).cast("long").alias("doc_id"),
            F.round(F.col("b.q"), 6).alias("quality_score"),
            "n_copies",
        )
    )


def _quality_sql(doc_src: str) -> str:
    """DuckDB twin of operators.text.quality_score over ``doc_src``
    (mirrors ORACLE_QUALITY_SCORE in queries_ext)."""
    from .operators.text import STOPWORDS

    toks = "list_filter(string_split(text, ' '), t -> t <> '')"
    en = ", ".join(f"'{w}'" for w in STOPWORDS["en"])
    return f"""
  SELECT doc_id, text,
         CASE WHEN len({toks}) > 0 THEN
           least(CAST(len({toks}) AS DOUBLE) / 100.0, 1.0) * 0.4
           + (len(list_distinct({toks})) / len({toks})) * 0.4
           + least((len(list_filter({toks}, t -> t IN ({en}))) * 5.0) / len({toks}), 1.0) * 0.2
         ELSE 0.0 END AS quality_score
  FROM {doc_src}
"""


ORACLE_DEDUP_KEEP_BEST = f"""
WITH scored AS ({_quality_sql('documents')}),
corpus AS (
  SELECT doc_id, text, quality_score FROM scored
  UNION ALL
  SELECT doc_id + 1000000, text, quality_score * 0.5 FROM scored)
SELECT CAST(-(max(struct_pack(q := quality_score, neg_id := -doc_id)).neg_id) AS BIGINT)
         AS doc_id,
       round(max(struct_pack(q := quality_score, neg_id := -doc_id)).q, 6) AS quality_score,
       CAST(count(*) AS BIGINT) AS n_copies
FROM corpus GROUP BY text
"""


# ---------------------------------------------------------------------------
# Domain capping (uniform deterministic k-cap per source)
# ---------------------------------------------------------------------------

_CAP_K = 10
_CAP_HASH = affine_hash_sql("doc_id", "3")


def q_cap_per_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain capping — every training-mixture pipeline's "no domain
    exceeds N docs" step: a deterministic uniform k-sample per source
    via rank over an affine id hash (portable integer arithmetic, so
    the elected sample is engine-identical). Window over the group key
    is one shuffle; at 100 TB a hot domain is pre-thinned by filtering
    on hash < (k / est_count) quantile before the exact rank — same
    two-phase shape as topk_per_group."""
    d = _t(spark, sf_dir, "documents")
    h = F.expr(_CAP_HASH)
    w = Window.partitionBy("source").orderBy(h.asc(), F.col("doc_id").asc())
    return (
        d.select("doc_id", "source", h.alias("h"))
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= _CAP_K)
        .select("doc_id", "source", F.col("rk").cast("int").alias("rk"))
    )


ORACLE_CAP_PER_SOURCE = f"""
WITH ranked AS (
  SELECT doc_id, source,
         ROW_NUMBER() OVER (PARTITION BY source ORDER BY {_CAP_HASH}, doc_id) AS rk
  FROM documents)
SELECT doc_id, source, CAST(rk AS INTEGER) AS rk FROM ranked WHERE rk <= {_CAP_K}
"""


# ---------------------------------------------------------------------------
# PMI collocations (token-pair association)
# ---------------------------------------------------------------------------

_COLL_DF_MIN = 5      # a pair is only as reliable as its members
_COLL_DF_FRAC = 0.95  # stop-token ceiling: in >=95% of docs => no signal
_COLL_MIN_PAIR = 5
_COLL_MIN_PMI = 0.02


def q_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus collocations by pointwise mutual information:
    pmi(a,b) = ln(c_ab · N / (c_a · c_b)) over distinct-token document
    incidence. Tokens with df < df_min (unreliable) or df ≥ 95% of the
    corpus (stop-tokens: no association signal) are pruned BEFORE the
    per-doc pair build. The pair build is keyed on doc_id, so its
    fan-out is (per-doc surviving vocabulary)² — bounded by document
    length, never corpus size; the df prune is a broadcast semi-join.
    Counts are exact integers and N enters as a broadcast 1-row
    aggregate; the PMI double is a single ln of an exact ratio —
    engine-identical. Thresholded (not top-k) so the result set has no
    float tie-break."""
    d = _t(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id",
        F.explode(
            F.array_distinct(F.expr("filter(split(text, ' '), t -> t <> '')"))
        ).alias("tok"),
    )
    n_docs = d.agg(F.count(F.lit(1)).alias("n_docs"))
    df_tok = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("c_tok"))
    kept = df_tok.crossJoin(F.broadcast(n_docs)).filter(
        (F.col("c_tok") >= _COLL_DF_MIN)
        & (F.col("c_tok") <= _COLL_DF_FRAC * F.col("n_docs"))
    ).select("tok", "c_tok")
    toks_k = toks.join(F.broadcast(kept), "tok")
    a = toks_k.select("doc_id", F.col("tok").alias("tok_a"), F.col("c_tok").alias("c_a"))
    b = toks_k.select("doc_id", F.col("tok").alias("tok_b"), F.col("c_tok").alias("c_b"))
    pairs = (
        a.join(b, "doc_id")
        .filter(F.col("tok_a") < F.col("tok_b"))
        .groupBy("tok_a", "tok_b", "c_a", "c_b")
        .agg(F.count(F.lit(1)).alias("c_ab"))
        .filter(F.col("c_ab") >= _COLL_MIN_PAIR)
    )
    out = pairs.crossJoin(F.broadcast(n_docs)).select(
        "tok_a",
        "tok_b",
        F.col("c_ab").cast("long").alias("c_ab"),
        F.log(F.col("c_ab") * F.col("n_docs") / (F.col("c_a") * F.col("c_b"))).alias("pmi"),
    )
    return out.filter(F.col("pmi") >= _COLL_MIN_PMI)


ORACLE_COLLOCATIONS = f"""
WITH toks AS (
  SELECT doc_id, unnest(list_distinct(list_filter(string_split(text, ' '), t -> t <> ''))) AS tok
  FROM documents),
df_tok AS (
  SELECT tok, count(*) AS c_tok FROM toks GROUP BY tok
  HAVING count(*) >= {_COLL_DF_MIN}
     AND count(*) <= {_COLL_DF_FRAC} * (SELECT count(*) FROM documents)),
kept AS (SELECT toks.doc_id, toks.tok, df_tok.c_tok FROM toks JOIN df_tok USING (tok)),
pairs AS (
  SELECT a.tok AS tok_a, b.tok AS tok_b, a.c_tok AS c_a, b.c_tok AS c_b, count(*) AS c_ab
  FROM kept a JOIN kept b ON a.doc_id = b.doc_id AND a.tok < b.tok
  GROUP BY 1, 2, 3, 4
  HAVING count(*) >= {_COLL_MIN_PAIR})
SELECT tok_a, tok_b, CAST(c_ab AS BIGINT) AS c_ab,
       ln(c_ab * (SELECT count(*) FROM documents) / (c_a * c_b)) AS pmi
FROM pairs
WHERE ln(c_ab * (SELECT count(*) FROM documents) / (c_a * c_b)) >= {_COLL_MIN_PMI}
"""


QUERIES_ANALYTICS = {
    "q_funnel": q_funnel,
    "q_cohort_retention": q_cohort_retention,
    "q_winsorize": q_winsorize,
    "q_dedup_keep_best": q_dedup_keep_best,
    "q_cap_per_source": q_cap_per_source,
    "q_collocations": q_collocations,
}

ORACLE_ANALYTICS = {
    "q_funnel": ORACLE_FUNNEL,
    "q_cohort_retention": ORACLE_COHORT_RETENTION,
    "q_winsorize": ORACLE_WINSORIZE,
    "q_dedup_keep_best": ORACLE_DEDUP_KEEP_BEST,
    "q_cap_per_source": ORACLE_CAP_PER_SOURCE,
    "q_collocations": ORACLE_COLLOCATIONS,
}


# ---------------------------------------------------------------------------
# Ordered funnel / sequence detection (MATCH_RECOGNIZE-style, via
# layered conditional running-max windows)
# ---------------------------------------------------------------------------

_SEQ_GAP_US = 7 * 24 * 3600 * 1_000_000  # one week per step


def q_funnel_ordered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered three-step funnel with per-step time bounds — a purchase
    CONVERTS only if a click precedes it within a week AND a view
    precedes that click within a week (strict order, not mere
    presence; the complement of q_funnel's first-touch counting).

    Spark has no MATCH_RECOGNIZE; the pattern compiles to two layered
    conditional running-max windows over one (user, time) sort:
    pass 1 attaches "latest prior view" to every row; pass 2 runs a
    running max over "click timestamps that had a qualifying view",
    which purchases then test. Both passes share the same partitioning
    — ONE Exchange + sort at scale. Timestamps compare as integer
    microseconds (epoch_us twin on the oracle side)."""
    ev = _t(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        "event_type",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("us"),
    )
    before = (
        Window.partitionBy("user_id")
        .orderBy("us", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    p1 = ev.withColumn(
        "last_view_us",
        F.max(F.when(F.col("event_type") == "view", F.col("us"))).over(before),
    )
    ok_click = F.when(
        (F.col("event_type") == "click")
        & (F.col("last_view_us").isNotNull())
        & (F.col("us") - F.col("last_view_us") <= F.lit(_SEQ_GAP_US)),
        F.col("us"),
    )
    p2 = p1.withColumn("ok_click_us", F.max(ok_click).over(before))
    converted = (
        (F.col("event_type") == "purchase")
        & F.col("ok_click_us").isNotNull()
        & (F.col("us") - F.col("ok_click_us") <= F.lit(_SEQ_GAP_US))
    )
    return p2.groupBy("user_id").agg(
        F.sum((F.col("event_type") == "purchase").cast("bigint")).alias("n_purchases"),
        F.sum(converted.cast("bigint")).alias("n_converted"),
    )


# Tie-free frames: both 1-PRECEDING scans order by (us, event_id) within
# user_id; event_id is globally unique in events, so the order is TOTAL
# and the two window scans cannot disagree (determinism-audit rule).
ORACLE_FUNNEL_ORDERED = f"""
WITH ev AS (
  SELECT user_id, event_id, event_type, epoch_us(ts) AS us FROM events),
p1 AS (
  SELECT *,
         max(CASE WHEN event_type = 'view' THEN us END)
           OVER (PARTITION BY user_id ORDER BY us, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS last_view_us
  FROM ev),
p2 AS (
  SELECT *,
         max(CASE WHEN event_type = 'click' AND last_view_us IS NOT NULL
                       AND us - last_view_us <= {_SEQ_GAP_US} THEN us END)
           OVER (PARTITION BY user_id ORDER BY us, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS ok_click_us
  FROM p1)
SELECT user_id,
       CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS n_purchases,
       CAST(sum(CASE WHEN event_type = 'purchase' AND ok_click_us IS NOT NULL
                          AND us - ok_click_us <= {_SEQ_GAP_US} THEN 1 ELSE 0 END) AS BIGINT)
         AS n_converted
FROM p2 GROUP BY user_id
"""

QUERIES_ANALYTICS["q_funnel_ordered"] = q_funnel_ordered
ORACLE_ANALYTICS["q_funnel_ordered"] = ORACLE_FUNNEL_ORDERED


# ---------------------------------------------------------------------------
# Per-group OLS trend (slope/intercept from exact power sums)
# ---------------------------------------------------------------------------


def q_trend_ols(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Least-squares trend of value over time per event type:
    slope/intercept assembled from EXACT power sums — x as integer
    epoch-hours, y and x·y as DECIMAL(38,4) (merge-order-free) — then
    one pinned double expression, so the regression hash-matches
    cross-engine. One partial-agg shuffle; 100 TB shape is identical
    (five sums per group)."""
    ev = _t(spark, sf_dir, "events")
    x = F.floor(F.unix_timestamp(F.col("ts").cast("timestamp")) / F.lit(3600)).cast(
        "bigint"
    )
    y = F.col("value").cast("decimal(18,4)")
    s = (
        ev.select("event_type", x.alias("x"), y.alias("y"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("x").alias("sx"),
            F.sum("y").alias("sy"),
            F.sum(F.col("x") * F.col("y")).alias("sxy"),
            F.sum(F.col("x") * F.col("x")).alias("sxx"),
        )
    )
    n = F.col("n").cast("double")
    sx = F.col("sx").cast("double")
    sy = F.col("sy").cast("double")
    sxy = F.col("sxy").cast("double")
    sxx = F.col("sxx").cast("double")
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    intercept = (sy - slope * sx) / n
    return s.select(
        "event_type", "n", slope.alias("slope"), intercept.alias("intercept")
    )


ORACLE_TREND_OLS = """
WITH s AS (
  SELECT event_type,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(x) AS BIGINT) AS sx,
         SUM(y) AS sy,
         SUM(x * y) AS sxy,
         CAST(SUM(x * x) AS BIGINT) AS sxx
  FROM (SELECT event_type,
               CAST(floor(epoch(ts) / 3600) AS BIGINT) AS x,
               CAST(value AS DECIMAL(18,4)) AS y
        FROM events)
  GROUP BY event_type)
SELECT event_type, n,
       (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
         / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
         AS slope,
       (CAST(sy AS DOUBLE)
          - ((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
             / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)))
            * CAST(sx AS DOUBLE))
         / CAST(n AS DOUBLE) AS intercept
FROM s
"""

QUERIES_ANALYTICS["q_trend_ols"] = q_trend_ols
ORACLE_ANALYTICS["q_trend_ols"] = ORACLE_TREND_OLS


# ---------------------------------------------------------------------------
# Chi-square independence (integer-quantized term sum — order-free)
# ---------------------------------------------------------------------------

_CHI_Q = 1048576.0  # 2^20 term quantization


def q_chi_square(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson chi-square statistic for independence of event_type vs
    day-of-week. Each cell's term is the exact rational
    (o·n − r·c)² / (n·r·c) — integer numerator and denominator, so the
    per-cell double is ONE deterministic IEEE division — then terms are
    floor-quantized at 2^20 and summed as integers (the PageRank
    trick), making the statistic bit-reproducible under any shuffle
    order. One partial-agg pass for cells, broadcast margins."""
    ev = _t(spark, sf_dir, "events")
    cells = ev.groupBy(
        "event_type", F.dayofweek(F.col("ts").cast("timestamp")).alias("dow")
    ).agg(F.count(F.lit(1)).alias("o"))
    rows = cells.groupBy("event_type").agg(F.sum("o").alias("r"))
    cols = cells.groupBy("dow").agg(F.sum("o").alias("c"))
    n = ev.count()
    num = F.col("o") * F.lit(n) - F.col("r") * F.col("c")
    term = (num * num).cast("double") / (F.lit(n) * F.col("r") * F.col("c")).cast(
        "double"
    )
    q = (
        cells.join(F.broadcast(rows), "event_type")
        .join(F.broadcast(cols), "dow")
        .select(F.floor(term * F.lit(_CHI_Q)).alias("tq"))
    )
    return q.agg(
        (F.sum("tq").cast("double") / F.lit(_CHI_Q)).alias("chi2"),
        F.count(F.lit(1)).alias("n_cells"),
    )


ORACLE_CHI_SQUARE = f"""
WITH cells AS (
  SELECT event_type, dayofweek(ts) + 1 AS dow, CAST(COUNT(*) AS BIGINT) AS o
  FROM events GROUP BY 1, 2),
r AS (SELECT event_type, CAST(SUM(o) AS BIGINT) AS r FROM cells GROUP BY event_type),
c AS (SELECT dow, CAST(SUM(o) AS BIGINT) AS c FROM cells GROUP BY dow),
n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM events),
terms AS (
  SELECT CAST(floor(
           (CAST((o * n.n - r.r * c.c) * (o * n.n - r.r * c.c) AS DOUBLE)
            / CAST(n.n * r.r * c.c AS DOUBLE)) * {_CHI_Q}) AS BIGINT) AS tq
  FROM cells JOIN r USING (event_type) JOIN c USING (dow) CROSS JOIN n)
SELECT CAST(SUM(tq) AS DOUBLE) / {_CHI_Q} AS chi2,
       CAST(COUNT(*) AS BIGINT) AS n_cells
FROM terms
"""

QUERIES_ANALYTICS["q_chi_square"] = q_chi_square
ORACLE_ANALYTICS["q_chi_square"] = ORACLE_CHI_SQUARE


def q_rag_sentences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sentence-boundary RAG chunking (operators.llm_prep.
    chunk_by_sentences). The synthetic corpus has no sentence
    punctuation, so the query synthesizes a 3-sentence document from
    deterministic substrings (same trick as the PII fixture) — the
    splitter, per-sentence token counts and chunk assignment are all
    genuinely exercised."""
    from .operators.llm_prep import chunk_by_sentences

    d = _t(spark, sf_dir, "documents").select(
        "doc_id",
        F.concat_ws(
            ". ",
            F.substring("text", 1, 80),
            F.substring("text", 41, 90),
            F.col("text"),
        ).alias("text"),
    )
    return chunk_by_sentences(d, capacity=64)


ORACLE_RAG_SENTENCES = """
WITH s AS (
  SELECT doc_id, CAST(i - 1 AS BIGINT) AS sent_idx,
         CAST(len(list_filter(string_split(arr[i], ' '), t -> t <> '')) AS INTEGER)
           AS n_tokens
  FROM (SELECT doc_id, arr, unnest(range(1, len(arr) + 1)) AS i
        FROM (SELECT doc_id,
                     string_split_regex(
                       concat_ws('. ', substring(text, 1, 80),
                                 substring(text, 41, 90), text),
                       '\\. ') AS arr
              FROM documents))),
c AS (
  SELECT *, SUM(n_tokens) OVER (PARTITION BY doc_id ORDER BY sent_idx
                                ROWS UNBOUNDED PRECEDING) AS cum
  FROM s)
SELECT doc_id, CAST(sent_idx AS INTEGER) AS sent_idx, n_tokens,
       CAST(floor(CAST(cum - n_tokens AS DOUBLE) / 64) AS INTEGER) AS chunk_id
FROM c
"""

QUERIES_ANALYTICS["q_rag_sentences"] = q_rag_sentences
ORACLE_ANALYTICS["q_rag_sentences"] = ORACLE_RAG_SENTENCES


# ---------------------------------------------------------------------------
# Data profiling (one-pass column statistics, long format)
# ---------------------------------------------------------------------------


def q_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-pass data profile of the orders table — per-column row/null/
    distinct counts plus numeric min/max, published long-format (the
    ingestion-QA report every pipeline emits before accepting a drop).
    One aggregation job; exact distincts (the table's profiled columns
    are low-cardinality — for high-cardinality profiling swap in
    approx_count_distinct, the HLL member already covered)."""
    o = _t(spark, sf_dir, "orders")
    agg = o.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("o_totalprice").isNull().cast("bigint")).alias("null_price"),
        F.countDistinct("o_orderstatus").alias("d_status"),
        F.sum(F.col("o_orderstatus").isNull().cast("bigint")).alias("null_status"),
        F.countDistinct("o_orderpriority").alias("d_priority"),
        F.sum(F.col("o_orderpriority").isNull().cast("bigint")).alias("null_priority"),
        F.min("o_totalprice").cast("double").alias("min_price"),
        F.max("o_totalprice").cast("double").alias("max_price"),
        F.countDistinct("o_custkey").alias("d_cust"),
    )
    return agg.selectExpr(
        "stack(3, "
        " 'o_orderstatus', n, null_status, d_status, CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE),"
        " 'o_orderpriority', n, null_priority, d_priority, CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE),"
        " 'o_totalprice', n, null_price, CAST(NULL AS BIGINT), min_price, max_price"
        ") AS (col_name, n_rows, n_null, n_distinct, min_val, max_val)"
    )


ORACLE_PROFILE = """
WITH a AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CASE WHEN o_totalprice IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_price,
         CAST(COUNT(DISTINCT o_orderstatus) AS BIGINT) AS d_status,
         CAST(SUM(CASE WHEN o_orderstatus IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_status,
         CAST(COUNT(DISTINCT o_orderpriority) AS BIGINT) AS d_priority,
         CAST(SUM(CASE WHEN o_orderpriority IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_priority,
         CAST(MIN(o_totalprice) AS DOUBLE) AS min_price,
         CAST(MAX(o_totalprice) AS DOUBLE) AS max_price
  FROM orders)
SELECT 'o_orderstatus' AS col_name, n AS n_rows, null_status AS n_null,
       d_status AS n_distinct, CAST(NULL AS DOUBLE) AS min_val, CAST(NULL AS DOUBLE) AS max_val FROM a
UNION ALL
SELECT 'o_orderpriority', n, null_priority, d_priority, NULL, NULL FROM a
UNION ALL
SELECT 'o_totalprice', n, null_price, CAST(NULL AS BIGINT), min_price, max_price FROM a
"""

QUERIES_ANALYTICS["q_profile"] = q_profile
ORACLE_ANALYTICS["q_profile"] = ORACLE_PROFILE


# ---------------------------------------------------------------------------
# Exact higher moments: skewness + excess kurtosis from decimal sums
# ---------------------------------------------------------------------------


def q_skew_kurtosis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population skewness and kurtosis per event type from EXACT
    decimal power sums S1..S4 (merge-order-free; the corr-exact family
    extended to higher moments), assembled in one pinned double
    epilogue — Spark's builtin skewness()/kurtosis() are running-update
    aggregates whose float state depends on merge order; this form
    hash-matches any engine."""
    ev = _t(spark, sf_dir, "events")
    # integer value-units: w = value·10^4 exactly (via the decimal cast),
    # so w, w², w³ stay in int64 and w⁴ in DECIMAL(38,0) — every power
    # sum is an exact integer on any engine (DuckDB runs them in HUGEINT)
    w = (F.col("value").cast("decimal(18,4)") * F.lit(10000)).cast("bigint")
    s = ev.select("event_type", w.alias("w")).groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("w").alias("s1"),
        F.sum((F.col("w") * F.col("w")).cast("decimal(38,0)")).alias("s2"),
        F.sum(
            (F.col("w") * F.col("w")).cast("decimal(38,0)") * F.col("w")
        ).alias("s3"),
        F.sum(
            (F.col("w") * F.col("w")).cast("decimal(38,0)") * (F.col("w") * F.col("w"))
        ).alias("s4"),
    )
    n = F.col("n").cast("double")
    s1 = F.col("s1").cast("double") / F.lit(1.0e4)
    s2 = F.col("s2").cast("double") / F.lit(1.0e8)
    s3 = F.col("s3").cast("double") / F.lit(1.0e12)
    s4 = F.col("s4").cast("double") / F.lit(1.0e16)
    mu = s1 / n
    m2 = s2 / n - mu * mu
    m3 = s3 / n - F.lit(3.0) * mu * (s2 / n) + F.lit(2.0) * mu * mu * mu
    m4 = (
        s4 / n
        - F.lit(4.0) * mu * (s3 / n)
        + F.lit(6.0) * mu * mu * (s2 / n)
        - F.lit(3.0) * mu * mu * mu * mu
    )
    return s.select(
        "event_type",
        "n",
        (m3 / (m2 * F.sqrt(m2))).alias("skewness"),
        (m4 / (m2 * m2) - F.lit(3.0)).alias("excess_kurtosis"),
    )


ORACLE_SKEW_KURTOSIS = """
WITH s AS (
  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
         SUM(w) AS s1, SUM(w*w) AS s2,
         SUM(CAST(w AS HUGEINT) * w * w) AS s3,
         SUM(CAST(w AS HUGEINT) * w * w * w) AS s4
  FROM (SELECT event_type,
               CAST(CAST(value AS DECIMAL(18,4)) * 10000 AS BIGINT) AS w
        FROM events)
  GROUP BY event_type),
d AS (
  SELECT event_type, n,
         CAST(n AS DOUBLE) AS nd,
         CAST(s1 AS DOUBLE) / 1e4 AS s1, CAST(s2 AS DOUBLE) / 1e8 AS s2,
         CAST(s3 AS DOUBLE) / 1e12 AS s3, CAST(s4 AS DOUBLE) / 1e16 AS s4
  FROM s),
m AS (
  SELECT event_type, n, s1 / nd AS mu,
         s2 / nd - (s1 / nd) * (s1 / nd) AS m2,
         s3 / nd - 3.0 * (s1 / nd) * (s2 / nd) + 2.0 * (s1 / nd) * (s1 / nd) * (s1 / nd) AS m3,
         s4 / nd - 4.0 * (s1 / nd) * (s3 / nd) + 6.0 * (s1 / nd) * (s1 / nd) * (s2 / nd)
           - 3.0 * (s1 / nd) * (s1 / nd) * (s1 / nd) * (s1 / nd) AS m4
  FROM d)
SELECT event_type, n,
       m3 / (m2 * sqrt(m2)) AS skewness,
       m4 / (m2 * m2) - 3.0 AS excess_kurtosis
FROM m
"""

QUERIES_ANALYTICS["q_skew_kurtosis"] = q_skew_kurtosis
ORACLE_ANALYTICS["q_skew_kurtosis"] = ORACLE_SKEW_KURTOSIS


# ---------------------------------------------------------------------------
# Time-to-convert distribution
# ---------------------------------------------------------------------------


def q_time_to_convert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution of first-view → first-purchase latency: per-user
    first-touch timestamps in one partial-agg pass (integer epoch
    seconds — exact), then exact quartiles of the latency in a one-row
    rollup. Rounded at 4dp like q_stats: exact-percentile interpolation
    can differ in the last ulp across engines."""
    ev = _t(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(
        F.min(
            F.when(F.col("event_type") == "view", F.unix_timestamp(F.col("ts").cast("timestamp")))
        ).alias("t_view"),
        F.min(
            F.when(F.col("event_type") == "purchase", F.unix_timestamp(F.col("ts").cast("timestamp")))
        ).alias("t_buy"),
    )
    lat = per_user.where(
        F.col("t_view").isNotNull() & F.col("t_buy").isNotNull() & (F.col("t_buy") >= F.col("t_view"))
    ).select((F.col("t_buy") - F.col("t_view")).alias("secs"))
    return lat.agg(
        F.count(F.lit(1)).alias("n_converted"),
        F.round(F.expr("percentile(secs, 0.25)"), 4).alias("p25_secs"),
        F.round(F.expr("percentile(secs, 0.5)"), 4).alias("median_secs"),
        F.round(F.expr("percentile(secs, 0.75)"), 4).alias("p75_secs"),
    )


ORACLE_TIME_TO_CONVERT = """
WITH per_user AS (
  SELECT user_id,
         min(CASE WHEN event_type = 'view' THEN CAST(floor(epoch(ts)) AS BIGINT) END) AS t_view,
         min(CASE WHEN event_type = 'purchase' THEN CAST(floor(epoch(ts)) AS BIGINT) END) AS t_buy
  FROM events GROUP BY user_id),
lat AS (
  SELECT t_buy - t_view AS secs FROM per_user
  WHERE t_view IS NOT NULL AND t_buy IS NOT NULL AND t_buy >= t_view)
SELECT CAST(COUNT(*) AS BIGINT) AS n_converted,
       round(quantile_cont(secs, 0.25), 4) AS p25_secs,
       round(quantile_cont(secs, 0.5), 4) AS median_secs,
       round(quantile_cont(secs, 0.75), 4) AS p75_secs
FROM lat
"""

QUERIES_ANALYTICS["q_time_to_convert"] = q_time_to_convert
ORACLE_ANALYTICS["q_time_to_convert"] = ORACLE_TIME_TO_CONVERT


# ---------------------------------------------------------------------------
# Gini concentration (exact decimal cumulative form)
# ---------------------------------------------------------------------------


def q_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini coefficient of customer spend per market segment —
    G = (2·Σᵢ i·xᵢ) / (n·Σx) − (n+1)/n over ascending per-customer
    totals. Spend totals are exact decimals, ranks are ints, so both
    Σ-terms are exact; the epilogue is a pinned double chain. Per-
    segment window sort (one shuffle), then a one-row-per-segment
    rollup."""
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    spend = (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("c_mktsegment", "o_custkey")
        .agg(F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("x"))
    )
    w = Window.partitionBy("c_mktsegment").orderBy("x", "o_custkey")
    ranked = spend.withColumn("i", F.row_number().over(w))
    agg = ranked.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum(F.col("x") * F.col("i")).alias("sxi"),
    )
    n = F.col("n").cast("double")
    return agg.select(
        "c_mktsegment",
        "n",
        (
            F.lit(2.0) * F.col("sxi").cast("double") / (n * F.col("sx").cast("double"))
            - (n + F.lit(1.0)) / n
        ).alias("gini"),
    )


ORACLE_GINI = """
WITH spend AS (
  SELECT c.c_mktsegment, o.o_custkey,
         SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS x
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
  GROUP BY 1, 2),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY c_mktsegment ORDER BY x, o_custkey) AS i
  FROM spend),
agg AS (
  SELECT c_mktsegment, CAST(COUNT(*) AS BIGINT) AS n, SUM(x) AS sx, SUM(x * i) AS sxi
  FROM ranked GROUP BY c_mktsegment)
SELECT c_mktsegment, n,
       2.0 * CAST(sxi AS DOUBLE) / (CAST(n AS DOUBLE) * CAST(sx AS DOUBLE))
         - (CAST(n AS DOUBLE) + 1.0) / CAST(n AS DOUBLE) AS gini
FROM agg
"""

QUERIES_ANALYTICS["q_gini"] = q_gini
ORACLE_ANALYTICS["q_gini"] = ORACLE_GINI


def q_dau_wau(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling distinct actives — DAU, trailing-7-day WAU, and the
    stickiness ratio per observed day. Windowed COUNT DISTINCT does
    not partial-aggregate, so the scale-right plan is the day fan-out:
    dedupe to (user, day) FIRST (one partial-agg shuffle collapses the
    event stream), explode each pair onto the ≤7 trailing days it
    serves (bounded ×7, linear), and count distinct per target day —
    state is (users × 7 days), never (users × events). Days with no
    events contribute no row; the spine join keeps only observed days
    so both engines agree on the domain."""
    ev = _t(spark, sf_dir, "events")
    per_day = ev.select(
        F.to_date(F.col("ts").cast("timestamp")).alias("d"), "user_id"
    ).distinct()
    dau = per_day.groupBy("d").agg(F.countDistinct("user_id").alias("dau"))
    expanded = per_day.select(
        F.explode(F.sequence(F.col("d"), F.date_add(F.col("d"), 6))).alias("day"),
        "user_id",
    )
    wau = (
        expanded.join(per_day.select(F.col("d").alias("day")).distinct(), "day")
        .groupBy("day")
        .agg(F.countDistinct("user_id").alias("wau"))
    )
    return (
        dau.join(wau, dau.d == wau.day)
        .select(
            "d",
            "dau",
            "wau",
            (F.col("dau").cast("double") / F.col("wau").cast("double")).alias(
                "stickiness"
            ),
        )
    )


ORACLE_DAU_WAU = """
WITH per_day AS (
  SELECT DISTINCT CAST(ts AS DATE) AS d, user_id FROM events),
dau AS (
  SELECT d, CAST(count(DISTINCT user_id) AS BIGINT) AS dau
  FROM per_day GROUP BY d),
expanded AS (
  SELECT CAST(unnest(range(d, d + INTERVAL 7 DAY, INTERVAL 1 DAY)) AS DATE) AS day,
         user_id
  FROM per_day),
spine AS (SELECT DISTINCT d AS day FROM per_day),
wau AS (
  SELECT e.day, CAST(count(DISTINCT e.user_id) AS BIGINT) AS wau
  FROM expanded e JOIN spine USING (day) GROUP BY e.day)
SELECT dau.d, dau.dau, wau.wau,
       CAST(dau.dau AS DOUBLE) / CAST(wau.wau AS DOUBLE) AS stickiness
FROM dau JOIN wau ON dau.d = wau.day
"""

QUERIES_ANALYTICS["q_dau_wau"] = q_dau_wau
ORACLE_ANALYTICS["q_dau_wau"] = ORACLE_DAU_WAU


def q_new_vs_returning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-day split of active users into first-ever-seen vs returning.
    Two partial-agg passes: per-user first day (one row per user), then
    the (user, day) actives joined against it — the first-day table is
    user-count sized and broadcast-eligible. New + returning = DAU by
    construction (law-tested)."""
    ev = _t(spark, sf_dir, "events")
    per_day = ev.select(
        F.to_date(F.col("ts").cast("timestamp")).alias("d"), "user_id"
    ).distinct()
    first_day = per_day.groupBy("user_id").agg(F.min("d").alias("first_d"))
    return (
        per_day.join(first_day, "user_id")
        .groupBy("d")
        .agg(
            F.count(F.when(F.col("d") == F.col("first_d"), 1)).alias("n_new"),
            F.count(F.when(F.col("d") != F.col("first_d"), 1)).alias("n_returning"),
        )
    )


ORACLE_NEW_VS_RETURNING = """
WITH per_day AS (
  SELECT DISTINCT CAST(ts AS DATE) AS d, user_id FROM events),
fd AS (SELECT user_id, min(d) AS first_d FROM per_day GROUP BY user_id)
SELECT d,
       CAST(count(CASE WHEN d = first_d THEN 1 END) AS BIGINT) AS n_new,
       CAST(count(CASE WHEN d <> first_d THEN 1 END) AS BIGINT) AS n_returning
FROM per_day JOIN fd USING (user_id)
GROUP BY d
"""

QUERIES_ANALYTICS["q_new_vs_returning"] = q_new_vs_returning
ORACLE_ANALYTICS["q_new_vs_returning"] = ORACLE_NEW_VS_RETURNING


def q_decile_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decile lift table — the model-evaluation staple: users ranked
    by an activity score into ntile(10) buckets (total order via the
    user-id tiebreak), per-decile positive rate vs the overall rate
    (positive = a big-spender purchase, value > 150 — a label with
    both classes present, unlike bare purchase which every user has).
    All ratios are integer-ratio IEEE divisions written identically in
    both engines. The decile assignment is the DISTRIBUTED exact ntile
    (operators/rank.py): quantile-literal buckets + one partitioned
    window + literal offsets — no single-partition sort even though the
    tile is exact down to the user_id tiebreak."""
    ev = _t(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("score"),
        F.max(
            F.when(
                (F.col("event_type") == "purchase") & (F.col("value") > 150.0), 1
            ).otherwise(0)
        ).alias("label"),
    )
    d = rk.ranked_ntile(
        per_user, [("score", False), ("user_id", True)], 10, out="decile"
    )
    agg = d.groupBy("decile").agg(
        F.count(F.lit(1)).alias("n_users"),
        F.sum("label").alias("n_converted"),
    )
    tot = Window.partitionBy()
    conv_rate = F.col("n_converted").cast("double") / F.col("n_users").cast("double")
    overall = F.sum("n_converted").over(tot).cast("double") / F.sum("n_users").over(
        tot
    ).cast("double")
    return agg.select(
        "decile",
        "n_users",
        "n_converted",
        conv_rate.alias("conv_rate"),
        (conv_rate / overall).alias("lift"),
    )


ORACLE_DECILE_LIFT = """
WITH per_user AS (
  SELECT user_id, CAST(count(*) AS BIGINT) AS score,
         max(CASE WHEN event_type = 'purchase' AND value > 150.0 THEN 1 ELSE 0 END) AS label
  FROM events GROUP BY user_id),
d AS (
  SELECT *, ntile(10) OVER (ORDER BY score DESC, user_id ASC) AS decile
  FROM per_user),
agg AS (
  SELECT decile, CAST(count(*) AS BIGINT) AS n_users,
         CAST(sum(label) AS BIGINT) AS n_converted
  FROM d GROUP BY decile)
SELECT decile, n_users, n_converted,
       CAST(n_converted AS DOUBLE) / CAST(n_users AS DOUBLE) AS conv_rate,
       (CAST(n_converted AS DOUBLE) / CAST(n_users AS DOUBLE))
         / (CAST(sum(n_converted) OVER () AS DOUBLE)
            / CAST(sum(n_users) OVER () AS DOUBLE)) AS lift
FROM agg
"""

QUERIES_ANALYTICS["q_decile_lift"] = q_decile_lift
ORACLE_ANALYTICS["q_decile_lift"] = ORACLE_DECILE_LIFT


def q_auc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact ROC AUC via the rank form of the Mann-Whitney U statistic:
    AUC = (Σ ranks of positives − P(P+1)/2) / (P·N), with tied scores
    getting the average rank of their tie group — computed as
    (min_rn + max_rn)/2 from a single row_number pass, so ties are
    handled exactly and every quantity before the final division is an
    integer or half-integer. One per-user collapse, one DISTRIBUTED
    total-order rank (operators/rank.py — partitioned window over
    quantile-literal buckets, no single-partition sort), one tie-group
    agg."""
    ev = _t(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("score"),
        F.max(
            F.when(
                (F.col("event_type") == "purchase") & (F.col("value") > 150.0), 1
            ).otherwise(0)
        ).alias("label"),
    )
    ranked = rk.ranked(per_user, [("score", True), ("user_id", True)], out="rn")
    ties = ranked.groupBy("score").agg(
        ((F.min("rn") + F.max("rn")).cast("double") / F.lit(2.0)).alias("avg_rank")
    )
    j = ranked.join(F.broadcast(ties), "score")
    agg = j.agg(
        F.sum(F.when(F.col("label") == 1, F.col("avg_rank"))).alias("s_pos"),
        F.sum("label").alias("p"),
        F.count(F.lit(1)).alias("n_total"),
    )
    p = F.col("p").cast("double")
    n = (F.col("n_total") - F.col("p")).cast("double")
    return agg.select(
        F.col("p").alias("n_pos"),
        (F.col("n_total") - F.col("p")).alias("n_neg"),
        ((F.col("s_pos") - p * (p + F.lit(1.0)) / F.lit(2.0)) / (p * n)).alias("auc"),
    )


ORACLE_AUC = """
WITH per_user AS (
  SELECT user_id, CAST(count(*) AS BIGINT) AS score,
         max(CASE WHEN event_type = 'purchase' AND value > 150.0 THEN 1 ELSE 0 END) AS label
  FROM events GROUP BY user_id),
ranked AS (
  SELECT *, row_number() OVER (ORDER BY score ASC, user_id ASC) AS rn
  FROM per_user),
ties AS (
  SELECT score, CAST(min(rn) + max(rn) AS DOUBLE) / 2.0 AS avg_rank
  FROM ranked GROUP BY score),
agg AS (
  SELECT sum(CASE WHEN label = 1 THEN avg_rank END) AS s_pos,
         CAST(sum(label) AS BIGINT) AS p,
         CAST(count(*) AS BIGINT) AS n_total
  FROM ranked JOIN ties USING (score))
SELECT p AS n_pos,
       n_total - p AS n_neg,
       (s_pos - CAST(p AS DOUBLE) * (CAST(p AS DOUBLE) + 1.0) / 2.0)
         / (CAST(p AS DOUBLE) * CAST(n_total - p AS DOUBLE)) AS auc
FROM agg
"""

QUERIES_ANALYTICS["q_auc"] = q_auc
ORACLE_ANALYTICS["q_auc"] = ORACLE_AUC


# ---------------------------------------------------------------------------
# CEP pattern with NEGATION: view -> purchase within 30 minutes with NO
# error event strictly between. MATCH_RECOGNIZE-class semantics (the
# negated-event clause q_funnel_ordered's layered windows cannot see)
# compiled to one (user, time) sort: a running error count turns "no
# error between" into an integer equality between the purchase row and
# the carried view row.
# ---------------------------------------------------------------------------

_CEP_GAP_US = 30 * 60 * 1_000_000  # 30 minutes


def q_cep_pattern(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per user: purchases matched by the pattern
    ``view  (no 'error')*  purchase`` within 30 minutes, plus the mean
    view->purchase latency of the matches.

    Plan shape: ONE Exchange on user_id + one sort — the running error
    count (rows-unbounded sum) and the carried latest-view struct share
    the same window frame, then a plain groupBy. The negation is exact:
    err_cum(purchase) − err_cum(view) counts error events strictly
    between the two rows (neither endpoint is an 'error'). Latency sums
    are integer microseconds; the mean is the single pinned double
    division, guarded for match-free users (ANSI)."""
    ev = _t(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        "event_type",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("us"),
    )
    upto = (
        Window.partitionBy("user_id")
        .orderBy("us", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    before = (
        Window.partitionBy("user_id")
        .orderBy("us", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    p1 = ev.withColumn(
        "err_cum",
        F.sum((F.col("event_type") == "error").cast("bigint")).over(upto),
    )
    view_struct = F.when(
        F.col("event_type") == "view",
        F.struct(
            F.col("us").alias("v_us"),
            F.col("event_id").alias("v_eid"),
            F.col("err_cum").alias("v_err"),
        ),
    )
    p2 = p1.withColumn("lv", F.max(view_struct).over(before))
    matched = (
        (F.col("event_type") == "purchase")
        & F.col("lv").isNotNull()
        & (F.col("us") - F.col("lv.v_us") <= F.lit(_CEP_GAP_US))
        & (F.col("err_cum") - F.col("lv.v_err") == 0)
    )
    g = p2.groupBy("user_id").agg(
        F.sum((F.col("event_type") == "purchase").cast("bigint")).alias("n_purchases"),
        F.sum(matched.cast("bigint")).alias("n_matched"),
        F.sum(F.when(matched, F.col("us") - F.col("lv.v_us"))).alias("_lat_us"),
    )
    avg_s = F.when(
        F.col("n_matched") > 0,
        F.round(
            F.col("_lat_us").cast("double")
            / (F.col("n_matched").cast("double") * F.lit(1_000_000.0)),
            6,
        ),
    )
    return g.select("user_id", "n_purchases", "n_matched", avg_s.alias("avg_latency_s"))


# Tie-free frames: every scan orders by (us, event_id) within user_id;
# event_id is globally unique, so the order is TOTAL.
ORACLE_CEP_PATTERN = f"""
WITH e AS (
  SELECT user_id, event_id, event_type, epoch_us(ts) AS us FROM events),
p1 AS (
  SELECT *, sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
              OVER (PARTITION BY user_id ORDER BY us, event_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS err_cum
  FROM e),
p2 AS (
  SELECT *, max(CASE WHEN event_type = 'view'
                     THEN struct_pack(v_us := us, v_eid := event_id, v_err := err_cum)
                END)
              OVER (PARTITION BY user_id ORDER BY us, event_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS lv
  FROM p1),
m AS (
  SELECT user_id, event_type,
         (event_type = 'purchase' AND lv IS NOT NULL
          AND us - lv.v_us <= {_CEP_GAP_US}
          AND err_cum - lv.v_err = 0) AS matched,
         us - lv.v_us AS lat_us
  FROM p2)
SELECT user_id,
       CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT)
         AS n_purchases,
       CAST(sum(CASE WHEN matched THEN 1 ELSE 0 END) AS BIGINT) AS n_matched,
       CASE WHEN sum(CASE WHEN matched THEN 1 ELSE 0 END) > 0
            THEN round(CAST(sum(CASE WHEN matched THEN lat_us END) AS DOUBLE)
                       / (CAST(sum(CASE WHEN matched THEN 1 ELSE 0 END) AS DOUBLE)
                          * 1000000.0), 6)
       END AS avg_latency_s
FROM m GROUP BY user_id
"""

QUERIES_ANALYTICS["q_cep_pattern"] = q_cep_pattern
ORACLE_ANALYTICS["q_cep_pattern"] = ORACLE_CEP_PATTERN


# ---------------------------------------------------------------------------
# Linear multi-touch attribution: each purchase's value is split evenly
# across the user's view/click touches in the preceding 30 minutes.
# ---------------------------------------------------------------------------

_ATTR_GAP_US = 30 * 60 * 1_000_000
_ATTR_Q = 10_000  # value quantum: decimal(18,4) -> integer ten-thousandths


def q_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per user: purchase value attributed to 'view' vs 'click' touches
    (linear attribution over the 30-minute lookback), plus the value no
    touch can claim.

    Plan shape: ONE Exchange on user_id + one sort — the per-purchase
    touch counts are conditional sums over a RANGE frame
    ``[us-30min, us-1]`` (value-based, so tie order inside an instant
    cannot matter), then a plain groupBy. Credit arithmetic is exact
    integers end-to-end: value is lossless decimal(18,4) scaled to
    bigint ten-thousandths, each touch type's share is
    ``value_q * n_type DIV n_total`` (integer division — deterministic
    in both engines, unlike double ratios), and the published doubles
    divide the integer sums once. Purchases with no touch in window
    land in ``unattributed``; integer-division remainders (at most
    n_total-1 quanta per purchase) stay unclaimed by construction and
    are NOT silently re-added."""
    ev = _t(spark, sf_dir, "events").select(
        "user_id",
        "event_type",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("us"),
        (F.col("value").cast("decimal(18,4)") * _ATTR_Q).cast("bigint").alias("vq"),
    )
    lookback = (
        Window.partitionBy("user_id")
        .orderBy("us")
        .rangeBetween(-_ATTR_GAP_US, -1)
    )
    p = (
        ev.withColumn(
            "n_view",
            F.sum((F.col("event_type") == "view").cast("bigint")).over(lookback),
        )
        .withColumn(
            "n_click",
            F.sum((F.col("event_type") == "click").cast("bigint")).over(lookback),
        )
        .filter(F.col("event_type") == "purchase")
        .select(
            "user_id",
            "vq",
            F.coalesce("n_view", F.lit(0)).alias("n_view"),
            F.coalesce("n_click", F.lit(0)).alias("n_click"),
        )
        .withColumn("n_tot", F.col("n_view") + F.col("n_click"))
        .withColumn(
            "attr_view_q",
            F.when(F.col("n_tot") > 0, F.expr("(vq * n_view) DIV n_tot")).otherwise(
                F.lit(0)
            ),
        )
        .withColumn(
            "attr_click_q",
            F.when(F.col("n_tot") > 0, F.expr("(vq * n_click) DIV n_tot")).otherwise(
                F.lit(0)
            ),
        )
        .withColumn(
            "unattr_q", F.when(F.col("n_tot") == 0, F.col("vq")).otherwise(F.lit(0))
        )
    )
    g = p.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_purchases"),
        F.sum("attr_view_q").alias("_av"),
        F.sum("attr_click_q").alias("_ac"),
        F.sum("unattr_q").alias("_un"),
    )
    qd = F.lit(float(_ATTR_Q))
    return g.select(
        "user_id",
        "n_purchases",
        (F.col("_av").cast("double") / qd).alias("attr_view"),
        (F.col("_ac").cast("double") / qd).alias("attr_click"),
        (F.col("_un").cast("double") / qd).alias("unattributed"),
    )


ORACLE_ATTRIBUTION = f"""
WITH e AS (
  SELECT user_id, event_type, epoch_us(ts) AS us,
         CAST(CAST(value AS DECIMAL(18,4)) * {_ATTR_Q} AS BIGINT) AS vq
  FROM events),
p AS (
  SELECT user_id, vq,
         coalesce(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
           OVER w, 0) AS n_view,
         coalesce(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
           OVER w, 0) AS n_click,
         event_type
  FROM e
  WINDOW w AS (PARTITION BY user_id ORDER BY us
               RANGE BETWEEN {_ATTR_GAP_US} PRECEDING AND 1 PRECEDING)),
c AS (
  SELECT user_id, vq, n_view + n_click AS n_tot, n_view, n_click
  FROM p WHERE event_type = 'purchase')
SELECT user_id,
       CAST(count(*) AS BIGINT) AS n_purchases,
       CAST(sum(CASE WHEN n_tot > 0 THEN (vq * n_view) // n_tot ELSE 0 END)
            AS DOUBLE) / {_ATTR_Q}.0 AS attr_view,
       CAST(sum(CASE WHEN n_tot > 0 THEN (vq * n_click) // n_tot ELSE 0 END)
            AS DOUBLE) / {_ATTR_Q}.0 AS attr_click,
       CAST(sum(CASE WHEN n_tot = 0 THEN vq ELSE 0 END)
            AS DOUBLE) / {_ATTR_Q}.0 AS unattributed
FROM c GROUP BY user_id
"""

QUERIES_ANALYTICS["q_attribution"] = q_attribution
ORACLE_ANALYTICS["q_attribution"] = ORACLE_ATTRIBUTION


# ---------------------------------------------------------------------------
# Clickstream path mining: most common 3-step event-type paths
# ---------------------------------------------------------------------------

_PATHS_K = 20


def q_event_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 three-step event-type paths across all user journeys
    (the classic clickstream "what do users do next" table). One sort
    per user partition builds the consecutive-step trigrams with two
    lead()s — no self-joins, no explode of materialized paths — then a
    partial-agg count and a TakeOrderedAndProject top-k (count DESC,
    path ASC tie-break, so the cut is deterministic). At 100 TB the
    shuffled state is one row per distinct trigram (|event_types|^3
    bounded), not per event."""
    ev = _t(spark, sf_dir, "events").select(
        "user_id",
        "event_type",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("us"),
        "event_id",
    )
    w = Window.partitionBy("user_id").orderBy("us", "event_id")
    t = (
        ev.withColumn("t2", F.lead("event_type", 1).over(w))
        .withColumn("t3", F.lead("event_type", 2).over(w))
        .where(F.col("t2").isNotNull() & F.col("t3").isNotNull())
    )
    g = t.groupBy(
        F.col("event_type").alias("step1"),
        F.col("t2").alias("step2"),
        F.col("t3").alias("step3"),
    ).agg(F.count(F.lit(1)).alias("n"))
    return g.orderBy(
        F.col("n").desc(), "step1", "step2", "step3"
    ).limit(_PATHS_K)


ORACLE_EVENT_PATHS = f"""
WITH e AS (
  SELECT user_id, event_type, epoch_us(ts) AS us, event_id FROM events),
t AS (
  SELECT event_type AS step1,
         lead(event_type, 1) OVER w AS step2,
         lead(event_type, 2) OVER w AS step3
  FROM e
  WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id))
SELECT step1, step2, step3, CAST(count(*) AS BIGINT) AS n
FROM t WHERE step2 IS NOT NULL AND step3 IS NOT NULL
GROUP BY step1, step2, step3
ORDER BY n DESC, step1, step2, step3
LIMIT {_PATHS_K}
"""

QUERIES_ANALYTICS["q_event_paths"] = q_event_paths
ORACLE_ANALYTICS["q_event_paths"] = ORACLE_EVENT_PATHS


def q_theil_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil T inequality index (r7) of order value per priority class:
    T = (1/n) Σ (x/μ)·ln(x/μ). Group means come from EXACT decimal sums
    (one partial-agg pass, broadcast back as a 5-row join); the per-row
    terms are floor-quantized to integer nano-units before summing, so
    the distributed sum is order-free and bit-identical to the oracle's.
    Complements q_gini (rank-based) with the entropy-based measure that
    decomposes across subgroups.

    KNOWN PORTABILITY RISK (ADVICE r7, accepted): floor(x·ln(x)·1e9)
    depends on JVM Math.log and DuckDB std::log agreeing bitwise —
    neither guarantees correctly-rounded ln, so a 1-ULP divergence
    landing exactly on a floor boundary would flip one nano-unit term
    and fail the hash compare. Empirically green at sf0.01/sf1 and
    covered by the determinism audit; unlike the pure integer/quantized
    patterns this row is NOT provably portable — if a libm/JDK bump
    ever fails exactly this query (or q_dp_noisy_count's geometric
    ladder, which shares the idiom), this is why."""
    o = _t(spark, sf_dir, "orders")
    g = (
        o.groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("_s"),
        )
        .withColumn("mu", F.col("_s").cast("double") / F.col("n"))
        .select("o_orderpriority", "n", "mu")
    )
    r = F.col("o_totalprice") / F.col("mu")
    term = F.floor(r * F.log(r) * F.lit(1000000000.0)).cast("bigint")
    j = o.join(F.broadcast(g), "o_orderpriority")
    t = j.groupBy("o_orderpriority").agg(
        F.max("n").alias("n"),
        F.max("mu").alias("mean_price"),
        F.sum(term).alias("_q"),
    )
    return t.select(
        "o_orderpriority",
        "n",
        "mean_price",
        ((F.col("_q").cast("double") / F.lit(1000000000.0)) / F.col("n")).alias(
            "theil"
        ),
    )


ORACLE_THEIL_INDEX = """
WITH g AS (
  SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS mu
  FROM orders GROUP BY 1),
t AS (
  SELECT o.o_orderpriority,
         CAST(floor((o_totalprice / mu) * ln(o_totalprice / mu)
                    * 1000000000.0) AS BIGINT) AS q
  FROM orders o JOIN g USING (o_orderpriority))
SELECT t.o_orderpriority, g.n, g.mu AS mean_price,
       (CAST(sum(q) AS DOUBLE) / 1000000000.0) / g.n AS theil
FROM t JOIN g ON t.o_orderpriority = g.o_orderpriority
GROUP BY t.o_orderpriority, g.n, g.mu
"""

QUERIES_ANALYTICS["q_theil_index"] = q_theil_index
ORACLE_ANALYTICS["q_theil_index"] = ORACLE_THEIL_INDEX
