"""Experimentation & evaluation battery: the measurement layer a team
runs ON TOP of the ETL output — distinct-count sketches, A/B tests,
survival curves, search ranking, customer segmentation, record linkage,
forecast backtesting, and distribution profiling. The reference stops at
Gold tables (/root/reference/dags/coin_data_pipeline_optimized.py
builds daily aggregates); these are the queries its consumers would run
next, re-expressed as partial-aggregable Spark plans with DuckDB oracle
twins.

House arithmetic rules (see queries_quality.py / OPERATORS.md):
integer/rational forms wherever possible (cents quantization, rational
BM25 idf, exact binary 2^-k register sums); ln() only where the 4-dp
driver normalization gives orders-of-magnitude headroom over libm ulp
drift; every oracle casts bare literals to DOUBLE (DuckDB parses them
as DECIMAL).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .functions.hashing import MERSENNE_P, affine_hash, affine_hash_sql
from .operators import rank as rk
from .operators import text as tx
from .operators.dedup import register_cache
from .queries import _t

QUERIES_EXPERIMENTS: dict = {}
ORACLE_EXPERIMENTS: dict = {}

# ---------------------------------------------------------------------------
# HyperLogLog distinct-count sketch (Flajolet et al. 2007), portable
# ---------------------------------------------------------------------------

_HLL_P = 6
_HLL_M = 1 << _HLL_P  # 64 registers
_HLL_SALT = 11
# alpha_64 from the HLL paper: 0.7213 / (1 + 1.079/m) tabulated for m=64
_HLL_ALPHA = 0.709


def hll_registers(ev: DataFrame, key: str = "user_id") -> DataFrame:
    """The HLL register array (bucket, m_j) for a key column — ONE
    partial-aggregable groupBy(max) with 64 rows of state. Exposed so
    the mergeability law (registers of a union == element-wise max of
    per-shard registers) is testable; that law is what makes the
    sketch a 100 TB citizen."""
    h = affine_hash(F.col(key), F.lit(_HLL_SALT))
    w = F.floor(h / F.lit(_HLL_M)).cast("bigint")  # /64 is exact in binary
    rho = F.when(w == 0, F.lit(26)).otherwise(F.lit(25) - F.floor(F.log2(w)).cast("bigint"))
    return (
        ev.select((h % _HLL_M).alias("bucket"), rho.alias("rho"))
        .groupBy("bucket")
        .agg(F.max("rho").alias("m_j"))
    )


def q_hll_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog distinct-user sketch with ENGINE-PORTABLE hashing:
    h = affine_hash(user_id) (31-bit), register j = h mod 64, and
    rho = leading zeros of the remaining 25-bit word + 1 (floor(log2)
    is exact — its argument is an integer and log2 of the bracketing
    powers of two is representable). The register array is ONE
    partial-aggregable groupBy(max) — 64 rows of state no matter the
    input size, and registers from disjoint shards merge by
    element-wise max (law-tested), which is the whole point at 100 TB:
    a distinct count over any partitioning with 64 longs of traffic.
    2^-M_j terms are exact binary fractions, so sum_inv is bit-exact;
    the small-range linear-counting correction m·ln(m/V) applies below
    2.5m (ln headroom vs 4-dp normalization ≈ 1e11 ulp)."""
    ev = _t(spark, sf_dir, "events")
    regs = hll_registers(ev)
    sk = regs.agg(
        F.count(F.lit(1)).alias("n_present"),
        F.sum(F.pow(F.lit(2.0), -F.col("m_j"))).alias("sum_present"),
    ).select(
        (F.lit(_HLL_M) - F.col("n_present")).cast("bigint").alias("v_zero"),
        (F.col("sum_present") + (F.lit(_HLL_M) - F.col("n_present")).cast("double")).alias(
            "sum_inv"
        ),
    )
    exact = ev.agg(F.countDistinct("user_id").alias("exact_distinct"))
    est_raw = F.lit(_HLL_ALPHA) * F.lit(float(_HLL_M * _HLL_M)) / F.col("sum_inv")
    out = sk.crossJoin(F.broadcast(exact)).select(
        F.lit(_HLL_M).cast("bigint").alias("m"),
        "v_zero",
        "sum_inv",
        est_raw.alias("est_raw"),
        F.when(
            (est_raw <= F.lit(2.5 * _HLL_M)) & (F.col("v_zero") > 0),
            F.lit(float(_HLL_M)) * F.log(F.lit(float(_HLL_M)) / F.col("v_zero").cast("double")),
        )
        .otherwise(est_raw)
        .alias("est_corrected"),
        "exact_distinct",
    )
    return out


ORACLE_HLL_DISTINCT = f"""
WITH regs AS (
  SELECT ({affine_hash_sql('user_id', str(_HLL_SALT))}) % {_HLL_M} AS bucket,
         max(CASE WHEN CAST(floor(({affine_hash_sql('user_id', str(_HLL_SALT))}) / {_HLL_M}) AS BIGINT) = 0
                  THEN 26
                  ELSE 25 - CAST(floor(log2(CAST(floor(({affine_hash_sql('user_id', str(_HLL_SALT))}) / {_HLL_M}) AS BIGINT))) AS BIGINT)
             END) AS m_j
  FROM events GROUP BY 1),
sk AS (
  SELECT CAST({_HLL_M} - count(*) AS BIGINT) AS v_zero,
         sum(pow(CAST(2.0 AS DOUBLE), -m_j)) + CAST({_HLL_M} - count(*) AS DOUBLE) AS sum_inv
  FROM regs),
ex AS (SELECT CAST(count(DISTINCT user_id) AS BIGINT) AS exact_distinct FROM events)
SELECT CAST({_HLL_M} AS BIGINT) AS m, v_zero, sum_inv,
       CAST({_HLL_ALPHA} AS DOUBLE) * CAST({_HLL_M * _HLL_M} AS DOUBLE) / sum_inv AS est_raw,
       CASE WHEN CAST({_HLL_ALPHA} AS DOUBLE) * CAST({_HLL_M * _HLL_M} AS DOUBLE) / sum_inv
                 <= CAST({2.5 * _HLL_M} AS DOUBLE) AND v_zero > 0
            THEN CAST({_HLL_M} AS DOUBLE) * ln(CAST({_HLL_M} AS DOUBLE) / CAST(v_zero AS DOUBLE))
            ELSE CAST({_HLL_ALPHA} AS DOUBLE) * CAST({_HLL_M * _HLL_M} AS DOUBLE) / sum_inv
       END AS est_corrected,
       exact_distinct
FROM sk CROSS JOIN ex
"""

QUERIES_EXPERIMENTS["q_hll_distinct"] = q_hll_distinct
ORACLE_EXPERIMENTS["q_hll_distinct"] = ORACLE_HLL_DISTINCT


# ---------------------------------------------------------------------------
# A/B experiment readout: two-proportion z-test on a deterministic split
# ---------------------------------------------------------------------------

_AB_SALT = 5
# shared batch/stream conversion definition: streaming_ab_monitor's
# emission must hash-join 1:1 with the offline scorecards, so the arm
# salt and this predicate are imported there, never re-literalized
# (r5 ADVICE)
CONVERSION_VALUE_MIN = 150.0


def conversion_pred():
    """The experiment's conversion event: a high-value purchase."""
    return (F.col("event_type") == "purchase") & (
        F.col("value") > F.lit(CONVERSION_VALUE_MIN)
    )


def q_ab_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Experiment readout: users deterministically hash-split into
    arms A/B, conversion = user ever made a HIGH-VALUE purchase
    (value > 150, the same label as q_auc — plain "ever purchased"
    saturates both arms at rate 1.0 and the z denominator degenerates
    to 0), and the pooled
    two-proportion z statistic. One per-user partial-agg pass (the
    only shuffle, keyed on user_id), then a 2-row arm rollup pivoted
    into one row — at 100 TB nothing but the per-user collapse moves.
    All counts integer; the rates and z are divisions/sqrt written in
    the same order in both engines (sqrt is IEEE-exact)."""
    ev = _t(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(
        F.max(
            ((F.col("event_type") == "purchase") & (F.col("value") > 150.0)).cast("int")
        ).alias("converted")
    )
    arm = (affine_hash(F.col("user_id"), F.lit(_AB_SALT)) % 2 == 0).alias("in_a")
    arms = per_user.select(arm, "converted").agg(
        F.count(F.when(F.col("in_a"), 1)).alias("n_a"),
        F.count(F.when(~F.col("in_a"), 1)).alias("n_b"),
        F.sum(F.when(F.col("in_a"), F.col("converted"))).alias("c_a"),
        F.sum(F.when(~F.col("in_a"), F.col("converted"))).alias("c_b"),
    )
    pa = F.col("c_a").cast("double") / F.col("n_a").cast("double")
    pb = F.col("c_b").cast("double") / F.col("n_b").cast("double")
    pp = (F.col("c_a") + F.col("c_b")).cast("double") / (F.col("n_a") + F.col("n_b")).cast(
        "double"
    )
    se = F.sqrt(
        pp
        * (F.lit(1.0) - pp)
        * (F.lit(1.0) / F.col("n_a").cast("double") + F.lit(1.0) / F.col("n_b").cast("double"))
    )
    return arms.select(
        "n_a",
        "n_b",
        "c_a",
        "c_b",
        pa.alias("rate_a"),
        pb.alias("rate_b"),
        (pa - pb).alias("lift"),
        ((pa - pb) / se).alias("z_stat"),
    )


ORACLE_AB_TEST = f"""
WITH per_user AS (
  SELECT user_id,
         ({affine_hash_sql('user_id', str(_AB_SALT))}) % 2 = 0 AS in_a,
         max(CASE WHEN event_type = 'purchase' AND value > 150.0 THEN 1 ELSE 0 END) AS converted
  FROM events GROUP BY 1),
arms AS (
  SELECT CAST(count(CASE WHEN in_a THEN 1 END) AS BIGINT) AS n_a,
         CAST(count(CASE WHEN NOT in_a THEN 1 END) AS BIGINT) AS n_b,
         CAST(sum(CASE WHEN in_a THEN converted END) AS BIGINT) AS c_a,
         CAST(sum(CASE WHEN NOT in_a THEN converted END) AS BIGINT) AS c_b
  FROM per_user)
SELECT n_a, n_b, c_a, c_b,
       CAST(c_a AS DOUBLE) / CAST(n_a AS DOUBLE) AS rate_a,
       CAST(c_b AS DOUBLE) / CAST(n_b AS DOUBLE) AS rate_b,
       CAST(c_a AS DOUBLE) / CAST(n_a AS DOUBLE)
         - CAST(c_b AS DOUBLE) / CAST(n_b AS DOUBLE) AS lift,
       (CAST(c_a AS DOUBLE) / CAST(n_a AS DOUBLE)
         - CAST(c_b AS DOUBLE) / CAST(n_b AS DOUBLE))
       / sqrt(CAST(c_a + c_b AS DOUBLE) / CAST(n_a + n_b AS DOUBLE)
              * (CAST(1.0 AS DOUBLE) - CAST(c_a + c_b AS DOUBLE) / CAST(n_a + n_b AS DOUBLE))
              * (CAST(1.0 AS DOUBLE) / CAST(n_a AS DOUBLE)
                 + CAST(1.0 AS DOUBLE) / CAST(n_b AS DOUBLE))) AS z_stat
FROM arms
"""

QUERIES_EXPERIMENTS["q_ab_test"] = q_ab_test
ORACLE_EXPERIMENTS["q_ab_test"] = ORACLE_AB_TEST


# ---------------------------------------------------------------------------
# Kaplan-Meier survival: first touch → first purchase, censored at last
# activity
# ---------------------------------------------------------------------------


def q_kaplan_meier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan-Meier survival curve of time-to-first-purchase: per user,
    t0 = first event day, event = first purchase day (always ≥ t0 by
    construction — one partial-agg pass, no join-back), censored at the
    last active day otherwise. The life table aggregates to DISTINCT
    durations BEFORE any window (≤ horizon-days rows, bounded however
    big the input), then n_at_risk comes from one preceding-exclusive
    cumulative sum and S(t) = exp(Σ ln((n-d)/n)) over the closed prefix.
    A zero factor (everyone at risk dies) is tracked with a cumulative
    flag so ln(0) is never evaluated (DuckDB raises on it); survival is
    pinned to 0.0 from that step on. Emits the classic KM step rows:
    event-time, n_risk, n_event, n_censored, survival."""
    ev = _t(spark, sf_dir, "events").select(
        "user_id", F.to_date(F.col("ts").cast("timestamp")).alias("day"), "event_type"
    )
    per_user = ev.groupBy("user_id").agg(
        F.min("day").alias("d0"),
        F.min(F.when(F.col("event_type") == "purchase", F.col("day"))).alias("d_buy"),
        F.max("day").alias("d_last"),
    )
    dur = F.when(
        F.col("d_buy").isNotNull(), F.datediff(F.col("d_buy"), F.col("d0"))
    ).otherwise(F.datediff(F.col("d_last"), F.col("d0")))
    evt = F.when(F.col("d_buy").isNotNull(), 1).otherwise(0)
    tab = per_user.select(dur.alias("dur_days"), evt.alias("evt"))
    counts = tab.groupBy("dur_days").agg(
        F.sum("evt").alias("n_event"),
        (F.count(F.lit(1)) - F.sum("evt")).alias("n_censored"),
        F.count(F.lit(1)).alias("n_at"),
    )
    tot = Window.partitionBy()
    prior = Window.orderBy("dur_days").rowsBetween(Window.unboundedPreceding, -1)
    upto = Window.orderBy("dur_days").rowsBetween(Window.unboundedPreceding, 0)
    n_risk = F.sum("n_at").over(tot) - F.coalesce(F.sum("n_at").over(prior), F.lit(0))
    stepped = counts.withColumn("n_risk", n_risk)
    factor = (F.col("n_risk") - F.col("n_event")).cast("double") / F.col("n_risk").cast(
        "double"
    )
    stepped = stepped.withColumn(
        "ln_f", F.log(F.when(factor > 0, factor).otherwise(F.lit(1.0)))
    ).withColumn("zeroed", F.max((factor <= 0).cast("int")).over(upto))
    surv = F.when(F.col("zeroed") == 1, F.lit(0.0)).otherwise(
        F.exp(F.sum("ln_f").over(upto))
    )
    return (
        stepped.withColumn("survival", surv)
        .where(F.col("n_event") > 0)
        .select("dur_days", "n_risk", "n_event", "n_censored", "survival")
    )


# Tie-free frame: the 1-PRECEDING scan orders by dur_days, the
# grouped-by key of the life table — unique per row, order is TOTAL.
ORACLE_KAPLAN_MEIER = """
WITH ev AS (
  SELECT user_id, CAST(ts AS DATE) AS day, event_type FROM events),
per_user AS (
  SELECT user_id, min(day) AS d0,
         min(CASE WHEN event_type = 'purchase' THEN day END) AS d_buy,
         max(day) AS d_last
  FROM ev GROUP BY 1),
tab AS (
  SELECT CASE WHEN d_buy IS NOT NULL
              THEN CAST(date_diff('day', d0, d_buy) AS INT)
              ELSE CAST(date_diff('day', d0, d_last) AS INT) END AS dur_days,
         CASE WHEN d_buy IS NOT NULL THEN 1 ELSE 0 END AS evt
  FROM per_user),
counts AS (
  SELECT dur_days, CAST(sum(evt) AS BIGINT) AS n_event,
         CAST(count(*) - sum(evt) AS BIGINT) AS n_censored,
         CAST(count(*) AS BIGINT) AS n_at
  FROM tab GROUP BY 1),
stepped AS (
  SELECT *,
         CAST(sum(n_at) OVER () AS BIGINT)
           - CAST(coalesce(sum(n_at) OVER (ORDER BY dur_days
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS n_risk
  FROM counts),
flagged AS (
  SELECT *,
         ln(CASE WHEN CAST(n_risk - n_event AS DOUBLE) / CAST(n_risk AS DOUBLE) > 0
                 THEN CAST(n_risk - n_event AS DOUBLE) / CAST(n_risk AS DOUBLE)
                 ELSE CAST(1.0 AS DOUBLE) END) AS ln_f,
         max(CASE WHEN n_risk - n_event <= 0 THEN 1 ELSE 0 END)
           OVER (ORDER BY dur_days ROWS UNBOUNDED PRECEDING) AS zeroed
  FROM stepped)
SELECT dur_days, n_risk, n_event, n_censored,
       CASE WHEN zeroed = 1 THEN CAST(0.0 AS DOUBLE)
            ELSE exp(sum(ln_f) OVER (ORDER BY dur_days ROWS UNBOUNDED PRECEDING))
       END AS survival
FROM flagged WHERE n_event > 0
"""

QUERIES_EXPERIMENTS["q_kaplan_meier"] = q_kaplan_meier
ORACLE_EXPERIMENTS["q_kaplan_meier"] = ORACLE_KAPLAN_MEIER


# ---------------------------------------------------------------------------
# BM25 search ranking over the document corpus
# ---------------------------------------------------------------------------

_BM25_TERMS = ("spark", "merge", "window")
_BM25_K = 15
_BM25_K1 = 1.25  # exact binary, so the literal is identical in both engines
_BM25_B = 0.75


def q_bm25(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 ranking of the corpus for a fixed query (terms 'spark',
    'merge', 'window'): the rational idf form (N−df+0.5)/(df+0.5) (no
    ln — the same bit-exact choice as tfidf_topk), k1=1.25 / b=0.75
    chosen exact-binary so both engines parse identical doubles. Plan:
    doc-term counts (partial-agg), the 3-term df table broadcast, doc
    lengths joined on doc_id, the corpus-size/avg-length scalar a
    1-row broadcast — the only full-width shuffle is the doc-length
    join, keyed on doc_id. Top-k by (score desc, doc_id) is
    orderBy+limit — Spark plans TakeOrderedAndProject (per-partition
    heap + driver merge, never a global sort); the rank column is a
    window over the ALREADY-LIMITED k rows (bounded, allowlisted in
    the no-unpartitioned-window gate)."""
    docs = _t(spark, sf_dir, "documents")
    tf = tx.term_frequencies(docs).where(F.col("term").isin(*_BM25_TERMS))
    dl = docs.select("doc_id", F.size(tx.tokens_col("text")).cast("bigint").alias("dl"))
    stats = dl.agg(
        F.count(F.lit(1)).cast("double").alias("n_docs"),
        (F.sum("dl").cast("double") / F.count(F.lit(1)).cast("double")).alias("avgdl"),
    )
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df_term"))
    idf = (F.col("n_docs") - F.col("df_term").cast("double") + F.lit(0.5)) / (
        F.col("df_term").cast("double") + F.lit(0.5)
    )
    denom = F.col("tf").cast("double") + F.lit(_BM25_K1) * (
        F.lit(1.0)
        - F.lit(_BM25_B)
        + F.lit(_BM25_B) * F.col("dl").cast("double") / F.col("avgdl")
    )
    term_score = idf * F.col("tf").cast("double") * F.lit(_BM25_K1 + 1.0) / denom
    scored = (
        tf.join(F.broadcast(dfreq), "term")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .groupBy("doc_id")
        .agg(F.sum(term_score).alias("score"), F.count(F.lit(1)).alias("n_terms_matched"))
    )
    topk = scored.orderBy(F.col("score").desc(), F.col("doc_id").asc()).limit(_BM25_K)
    w = Window.orderBy(F.col("score").desc(), F.col("doc_id").asc())
    return topk.withColumn("rank", F.row_number().over(w)).select(
        "rank", "doc_id", "score", "n_terms_matched"
    )


_BM25_TERMS_SQL = ", ".join(f"'{t}'" for t in _BM25_TERMS)

ORACLE_BM25 = f"""
WITH toks AS (
  SELECT doc_id, list_filter(string_split(text, ' '), t -> t <> '') AS toks
  FROM documents),
tf AS (
  SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
  FROM (SELECT doc_id, unnest(toks) AS term FROM toks)
  WHERE term IN ({_BM25_TERMS_SQL}) GROUP BY 1, 2),
dl AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS dl FROM toks),
stats AS (
  SELECT CAST(count(*) AS DOUBLE) AS n_docs,
         CAST(sum(dl) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS avgdl
  FROM dl),
dfreq AS (SELECT term, CAST(count(*) AS BIGINT) AS df_term FROM tf GROUP BY 1),
scored AS (
  SELECT t.doc_id,
         sum((stats.n_docs - CAST(d.df_term AS DOUBLE) + CAST(0.5 AS DOUBLE))
             / (CAST(d.df_term AS DOUBLE) + CAST(0.5 AS DOUBLE))
             * CAST(t.tf AS DOUBLE) * CAST({_BM25_K1 + 1.0} AS DOUBLE)
             / (CAST(t.tf AS DOUBLE) + CAST({_BM25_K1} AS DOUBLE)
                * (CAST(1.0 AS DOUBLE) - CAST({_BM25_B} AS DOUBLE)
                   + CAST({_BM25_B} AS DOUBLE) * CAST(l.dl AS DOUBLE) / stats.avgdl)))
           AS score,
         CAST(count(*) AS BIGINT) AS n_terms_matched
  FROM tf t JOIN dfreq d ON t.term = d.term
  JOIN dl l ON t.doc_id = l.doc_id
  CROSS JOIN stats
  GROUP BY t.doc_id)
SELECT rank, doc_id, score, n_terms_matched FROM (
  SELECT *, CAST(row_number() OVER (ORDER BY score DESC, doc_id ASC) AS INT) AS rank
  FROM scored)
WHERE rank <= {_BM25_K}
"""

QUERIES_EXPERIMENTS["q_bm25"] = q_bm25
ORACLE_EXPERIMENTS["q_bm25"] = ORACLE_BM25


# ---------------------------------------------------------------------------
# RFM customer segmentation (recency / frequency / monetary quintiles)
# ---------------------------------------------------------------------------


def q_rfm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM segmentation: per user, recency = days from last activity to
    the corpus horizon (a 1-row broadcast scalar — no empty-partition
    window over users), frequency = event count, monetary = purchase
    cents (integer-quantized, exact). Quintiles via the DISTRIBUTED
    exact ntile (operators/rank.py — quantile-literal buckets + one
    partitioned window each, heavy values like m_cents=0 sub-split by
    the user_id tiebreak) so the assignment is total-ordered,
    engine-stable, and never a single-partition sort. The per-user
    collapse is cached (session-scoped, operators.dedup.release_caches)
    because three rank passes and their bounded boundary jobs reuse
    it. The three quintiles are computed INDEPENDENTLY off the cached
    base and equi-joined back on user_id, with an explicit small
    bucket count — CHAINING the rank passes stacked each pass's
    ~127-term bucket-indicator expression into the next pass's plan
    and its driver-side boundary jobs, which was pure Catalyst
    planning time (the r10 sweep's slowest slot: 98 s → 8 s measured
    at sf0.01; an ntile value depends only on the base ordering, so
    the published rows are unchanged). Output: the (r,f,m) segment
    grid with user counts and revenue."""
    ev = _t(spark, sf_dir, "events").select(
        "user_id",
        F.to_date(F.col("ts").cast("timestamp")).alias("day"),
        "event_type",
        F.floor(F.col("value") * F.lit(100.0)).cast("bigint").alias("cents"),
    )
    per_user = ev.groupBy("user_id").agg(
        F.max("day").alias("last_day"),
        F.count(F.lit(1)).alias("freq"),
        F.coalesce(
            F.sum(F.when(F.col("event_type") == "purchase", F.col("cents"))), F.lit(0)
        ).alias("m_cents"),
    )
    horizon = per_user.agg(F.max("last_day").alias("horizon"))
    base = per_user.crossJoin(F.broadcast(horizon)).select(
        "user_id",
        F.datediff(F.col("horizon"), F.col("last_day")).alias("r_days"),
        "freq",
        "m_cents",
    )
    base = register_cache(base.select("user_id", "r_days", "freq", "m_cents"))
    r = rk.ranked_ntile(
        base.select("user_id", "r_days"),
        [("r_days", True), ("user_id", True)], 5, out="r_quint", buckets=16,
    ).select("user_id", "r_quint")
    f = rk.ranked_ntile(
        base.select("user_id", "freq"),
        [("freq", False), ("user_id", True)], 5, out="f_quint", buckets=16,
    ).select("user_id", "f_quint")
    m = rk.ranked_ntile(
        base.select("user_id", "m_cents"),
        [("m_cents", False), ("user_id", True)], 5, out="m_quint", buckets=16,
    ).select("user_id", "m_cents", "m_quint")
    scored = m.join(r, "user_id").join(f, "user_id")
    return scored.groupBy("r_quint", "f_quint", "m_quint").agg(
        F.count(F.lit(1)).alias("n_users"),
        (F.sum("m_cents").cast("double") / F.lit(100.0)).alias("revenue"),
    )


ORACLE_RFM = """
WITH ev AS (
  SELECT user_id, CAST(ts AS DATE) AS day, event_type,
         CAST(floor(value * 100.0) AS BIGINT) AS cents
  FROM events),
per_user AS (
  SELECT user_id, max(day) AS last_day, CAST(count(*) AS BIGINT) AS freq,
         CAST(coalesce(sum(CASE WHEN event_type = 'purchase' THEN cents END), 0)
              AS BIGINT) AS m_cents
  FROM ev GROUP BY 1),
h AS (SELECT max(last_day) AS horizon FROM per_user),
base AS (
  SELECT user_id,
         CAST(date_diff('day', last_day, horizon) AS INT) AS r_days,
         freq, m_cents
  FROM per_user CROSS JOIN h),
scored AS (
  SELECT user_id, m_cents,
         CAST(ntile(5) OVER (ORDER BY r_days ASC, user_id ASC) AS INT) AS r_quint,
         CAST(ntile(5) OVER (ORDER BY freq DESC, user_id ASC) AS INT) AS f_quint,
         CAST(ntile(5) OVER (ORDER BY m_cents DESC, user_id ASC) AS INT) AS m_quint
  FROM base)
SELECT r_quint, f_quint, m_quint, CAST(count(*) AS BIGINT) AS n_users,
       CAST(sum(m_cents) AS DOUBLE) / CAST(100.0 AS DOUBLE) AS revenue
FROM scored GROUP BY 1, 2, 3
"""

QUERIES_EXPERIMENTS["q_rfm"] = q_rfm
ORACLE_EXPERIMENTS["q_rfm"] = ORACLE_RFM


# ---------------------------------------------------------------------------
# Record linkage: blocked Levenshtein near-match histogram
# ---------------------------------------------------------------------------

_LEV_MAX = 2


def q_edit_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Record-linkage candidate screen: customer-name pairs BLOCKED by
    nation (the blocking key bounds the per-block quadratic — at 100 TB
    use a finer key such as name-prefix+nation, same plan shape), then
    Levenshtein with Spark's built-in early-exit threshold (distance
    computation abandons a row once it exceeds the bound — the
    C-side band optimization). Output is the distance histogram with
    pair counts and distinct left members, all integers. The self-join
    shuffles on the block key only; names never leave the JVM."""
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_name", "c_nationkey")
    a = c.alias("a")
    b = c.alias("b")
    pairs = a.join(
        b,
        (F.col("a.c_nationkey") == F.col("b.c_nationkey"))
        & (F.col("a.c_custkey") < F.col("b.c_custkey")),
    )
    dist = F.levenshtein(F.col("a.c_name"), F.col("b.c_name"), _LEV_MAX + 1)
    near = pairs.select(dist.alias("lev_dist"), F.col("a.c_custkey").alias("left_key")).where(
        (F.col("lev_dist") >= 0) & (F.col("lev_dist") <= _LEV_MAX)
    )
    return near.groupBy("lev_dist").agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.countDistinct("left_key").alias("n_left_members"),
    )


ORACLE_EDIT_DISTANCE = f"""
WITH pairs AS (
  SELECT a.c_custkey AS left_key,
         CAST(levenshtein(a.c_name, b.c_name) AS INT) AS lev_dist
  FROM customer a JOIN customer b
    ON a.c_nationkey = b.c_nationkey AND a.c_custkey < b.c_custkey)
SELECT lev_dist, CAST(count(*) AS BIGINT) AS n_pairs,
       CAST(count(DISTINCT left_key) AS BIGINT) AS n_left_members
FROM pairs WHERE lev_dist <= {_LEV_MAX} GROUP BY 1
"""

QUERIES_EXPERIMENTS["q_edit_distance"] = q_edit_distance
ORACLE_EXPERIMENTS["q_edit_distance"] = ORACLE_EDIT_DISTANCE


# ---------------------------------------------------------------------------
# Forecast backtest: seasonal-naive (lag-7) with MAE / RMSE / sMAPE
# ---------------------------------------------------------------------------

_FC_LAG = 7


def q_forecast_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonal-naive forecast backtest: daily value per event type
    (integer cents — exact), forecast = the value 7 rows earlier in
    the per-type day series, errors aggregated per type. MAE and RMSE
    accumulate INTEGER absolute/squared cent errors (shuffle-order-
    free) with the divisions and sqrt at the very end; sMAPE is the
    only per-day double ratio. Window partitioned by event_type — no
    global sort; the daily collapse is the only shuffled state."""
    ev = _t(spark, sf_dir, "events").select(
        "event_type",
        F.to_date(F.col("ts").cast("timestamp")).alias("day"),
        F.floor(F.col("value") * F.lit(100.0)).cast("bigint").alias("cents"),
    )
    daily = ev.groupBy("event_type", "day").agg(F.sum("cents").alias("actual"))
    w = Window.partitionBy("event_type").orderBy("day")
    fc = daily.withColumn("forecast", F.lag("actual", _FC_LAG).over(w)).where(
        F.col("forecast").isNotNull()
    )
    err = F.abs(F.col("actual") - F.col("forecast"))
    return fc.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_days_eval"),
        (F.sum(err).cast("double") / F.count(F.lit(1)).cast("double") / F.lit(100.0)).alias(
            "mae"
        ),
        (
            F.sqrt(F.sum(err * err).cast("double") / F.count(F.lit(1)).cast("double"))
            / F.lit(100.0)
        ).alias("rmse"),
        F.avg(
            F.lit(2.0)
            * err.cast("double")
            / (F.col("actual") + F.col("forecast")).cast("double")
        ).alias("smape"),
    )


ORACLE_FORECAST_EVAL = f"""
WITH ev AS (
  SELECT event_type, CAST(ts AS DATE) AS day,
         CAST(floor(value * 100.0) AS BIGINT) AS cents
  FROM events),
daily AS (
  SELECT event_type, day, CAST(sum(cents) AS BIGINT) AS actual
  FROM ev GROUP BY 1, 2),
fc AS (
  SELECT *, lag(actual, {_FC_LAG}) OVER (PARTITION BY event_type ORDER BY day) AS forecast
  FROM daily)
SELECT event_type, CAST(count(*) AS BIGINT) AS n_days_eval,
       CAST(sum(abs(actual - forecast)) AS DOUBLE) / CAST(count(*) AS DOUBLE)
         / CAST(100.0 AS DOUBLE) AS mae,
       sqrt(CAST(sum((actual - forecast) * (actual - forecast)) AS DOUBLE)
            / CAST(count(*) AS DOUBLE)) / CAST(100.0 AS DOUBLE) AS rmse,
       avg(CAST(2.0 AS DOUBLE) * CAST(abs(actual - forecast) AS DOUBLE)
           / CAST(actual + forecast AS DOUBLE)) AS smape
FROM fc WHERE forecast IS NOT NULL GROUP BY 1
"""

QUERIES_EXPERIMENTS["q_forecast_eval"] = q_forecast_eval
ORACLE_EXPERIMENTS["q_forecast_eval"] = ORACLE_FORECAST_EVAL


# ---------------------------------------------------------------------------
# Shannon entropy profile of the event-type mix per day
# ---------------------------------------------------------------------------


def q_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily Shannon entropy of the event-type mix, in bits — the
    standard drift/diversity profile next to [[q_ks_drift]]. Uses the
    count identity H = ln(N) − (Σ c·ln c)/N so only integer counts
    reach ln() (4-dp normalization headroom dwarfs libm ulp drift).
    Two partial-agg passes ((day,type) then day) — nothing else
    shuffles; at 100 TB both collapse map-side first."""
    ev = _t(spark, sf_dir, "events").select(
        F.to_date(F.col("ts").cast("timestamp")).alias("day"), "event_type"
    )
    by_type = ev.groupBy("day", "event_type").agg(F.count(F.lit(1)).alias("c"))
    per_day = by_type.groupBy("day").agg(
        F.sum("c").alias("n_events"),
        F.sum(F.col("c").cast("double") * F.log(F.col("c").cast("double"))).alias("s_clogc"),
        F.count(F.lit(1)).alias("n_types"),
    )
    h_nats = F.log(F.col("n_events").cast("double")) - F.col("s_clogc") / F.col(
        "n_events"
    ).cast("double")
    return per_day.select(
        "day",
        "n_events",
        "n_types",
        (h_nats / F.log(F.lit(2.0))).alias("h_bits"),
    )


ORACLE_ENTROPY = """
WITH ev AS (
  SELECT CAST(ts AS DATE) AS day, event_type FROM events),
by_type AS (
  SELECT day, event_type, CAST(count(*) AS BIGINT) AS c
  FROM ev GROUP BY 1, 2),
per_day AS (
  SELECT day, CAST(sum(c) AS BIGINT) AS n_events,
         sum(CAST(c AS DOUBLE) * ln(CAST(c AS DOUBLE))) AS s_clogc,
         CAST(count(*) AS BIGINT) AS n_types
  FROM by_type GROUP BY 1)
SELECT day, n_events, n_types,
       (ln(CAST(n_events AS DOUBLE)) - s_clogc / CAST(n_events AS DOUBLE))
         / ln(CAST(2.0 AS DOUBLE)) AS h_bits
FROM per_day
"""

QUERIES_EXPERIMENTS["q_entropy"] = q_entropy
ORACLE_EXPERIMENTS["q_entropy"] = ORACLE_ENTROPY


# ---------------------------------------------------------------------------
# CUPED variance-reduced experiment readout (Deng et al. 2013)
# ---------------------------------------------------------------------------

_CUPED_SPLIT_DAY = 16  # days 1-15 = pre-period covariate, 16+ = outcome


def q_cuped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUPED adjusted A/B readout: pre-period purchase spend as the
    covariate X, post-period spend as the outcome Y, theta = cov(X,Y)
    / var(X) estimated on the pooled population, and each arm's mean
    adjusted by theta·(x̄_arm − x̄). Per-user (x, y) cents are exact
    integers from ONE partial-agg pass; the five pooled moments
    (ΣX, ΣY, ΣXY, ΣX², n) are exact integer sums (x·y ≲ 2^39 per
    user — no overflow at any SF that fits int64 row counts) with the
    two Welford-style ratios taken in doubles at the very end, in the
    same order in both engines. Everything after the per-user collapse
    is 1-row/2-row state — the canonical 'big data, small sufficient
    statistics' experiment pipeline."""
    ev = _t(spark, sf_dir, "events").select(
        "user_id",
        F.dayofmonth(F.to_date(F.col("ts").cast("timestamp"))).alias("dom"),
        "event_type",
        F.floor(F.col("value") * F.lit(100.0)).cast("bigint").alias("cents"),
    )
    buy = F.col("event_type") == "purchase"
    per_user = ev.groupBy("user_id").agg(
        F.coalesce(
            F.sum(F.when(buy & (F.col("dom") < _CUPED_SPLIT_DAY), F.col("cents"))), F.lit(0)
        ).alias("x"),
        F.coalesce(
            F.sum(F.when(buy & (F.col("dom") >= _CUPED_SPLIT_DAY), F.col("cents"))), F.lit(0)
        ).alias("y"),
    ).withColumn("in_a", affine_hash(F.col("user_id"), F.lit(_AB_SALT)) % 2 == 0)
    mom = per_user.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    ).select(
        "n",
        (F.col("sx").cast("double") / F.col("n").cast("double")).alias("mean_x"),
        (
            (F.col("sxy").cast("double") - F.col("sx").cast("double") * F.col("sy").cast("double") / F.col("n").cast("double"))
            / (F.col("sxx").cast("double") - F.col("sx").cast("double") * F.col("sx").cast("double") / F.col("n").cast("double"))
        ).alias("theta"),
    )
    arms = per_user.agg(
        F.count(F.when(F.col("in_a"), 1)).alias("n_a"),
        F.count(F.when(~F.col("in_a"), 1)).alias("n_b"),
        F.sum(F.when(F.col("in_a"), F.col("y"))).alias("sy_a"),
        F.sum(F.when(~F.col("in_a"), F.col("y"))).alias("sy_b"),
        F.sum(F.when(F.col("in_a"), F.col("x"))).alias("sx_a"),
        F.sum(F.when(~F.col("in_a"), F.col("x"))).alias("sx_b"),
    )
    my_a = F.col("sy_a").cast("double") / F.col("n_a").cast("double") / F.lit(100.0)
    my_b = F.col("sy_b").cast("double") / F.col("n_b").cast("double") / F.lit(100.0)
    mx_a = F.col("sx_a").cast("double") / F.col("n_a").cast("double") / F.lit(100.0)
    mx_b = F.col("sx_b").cast("double") / F.col("n_b").cast("double") / F.lit(100.0)
    mean_x_d = F.col("mean_x") / F.lit(100.0)
    adj_a = my_a - F.col("theta") * (mx_a - mean_x_d)
    adj_b = my_b - F.col("theta") * (mx_b - mean_x_d)
    return arms.crossJoin(F.broadcast(mom)).select(
        "n_a",
        "n_b",
        F.col("theta"),
        my_a.alias("mean_y_a"),
        my_b.alias("mean_y_b"),
        (my_a - my_b).alias("raw_lift"),
        adj_a.alias("adj_y_a"),
        adj_b.alias("adj_y_b"),
        (adj_a - adj_b).alias("cuped_lift"),
    )


ORACLE_CUPED = f"""
WITH ev AS (
  SELECT user_id, date_part('day', CAST(ts AS DATE)) AS dom, event_type,
         CAST(floor(value * 100.0) AS BIGINT) AS cents
  FROM events),
per_user AS (
  SELECT user_id,
         CAST(coalesce(sum(CASE WHEN event_type = 'purchase' AND dom < {_CUPED_SPLIT_DAY}
                                THEN cents END), 0) AS BIGINT) AS x,
         CAST(coalesce(sum(CASE WHEN event_type = 'purchase' AND dom >= {_CUPED_SPLIT_DAY}
                                THEN cents END), 0) AS BIGINT) AS y,
         ({affine_hash_sql('user_id', str(_AB_SALT))}) % 2 = 0 AS in_a
  FROM ev GROUP BY user_id),
mom AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         CAST(sum(x) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS mean_x,
         (CAST(sum(x * y) AS DOUBLE)
            - CAST(sum(x) AS DOUBLE) * CAST(sum(y) AS DOUBLE) / CAST(count(*) AS DOUBLE))
         / (CAST(sum(x * x) AS DOUBLE)
            - CAST(sum(x) AS DOUBLE) * CAST(sum(x) AS DOUBLE) / CAST(count(*) AS DOUBLE))
           AS theta
  FROM per_user),
arms AS (
  SELECT CAST(count(CASE WHEN in_a THEN 1 END) AS BIGINT) AS n_a,
         CAST(count(CASE WHEN NOT in_a THEN 1 END) AS BIGINT) AS n_b,
         CAST(sum(CASE WHEN in_a THEN y END) AS BIGINT) AS sy_a,
         CAST(sum(CASE WHEN NOT in_a THEN y END) AS BIGINT) AS sy_b,
         CAST(sum(CASE WHEN in_a THEN x END) AS BIGINT) AS sx_a,
         CAST(sum(CASE WHEN NOT in_a THEN x END) AS BIGINT) AS sx_b
  FROM per_user)
SELECT n_a, n_b, theta,
       CAST(sy_a AS DOUBLE) / CAST(n_a AS DOUBLE) / CAST(100.0 AS DOUBLE) AS mean_y_a,
       CAST(sy_b AS DOUBLE) / CAST(n_b AS DOUBLE) / CAST(100.0 AS DOUBLE) AS mean_y_b,
       CAST(sy_a AS DOUBLE) / CAST(n_a AS DOUBLE) / CAST(100.0 AS DOUBLE)
         - CAST(sy_b AS DOUBLE) / CAST(n_b AS DOUBLE) / CAST(100.0 AS DOUBLE) AS raw_lift,
       CAST(sy_a AS DOUBLE) / CAST(n_a AS DOUBLE) / CAST(100.0 AS DOUBLE)
         - theta * (CAST(sx_a AS DOUBLE) / CAST(n_a AS DOUBLE) / CAST(100.0 AS DOUBLE)
                    - mean_x / CAST(100.0 AS DOUBLE)) AS adj_y_a,
       CAST(sy_b AS DOUBLE) / CAST(n_b AS DOUBLE) / CAST(100.0 AS DOUBLE)
         - theta * (CAST(sx_b AS DOUBLE) / CAST(n_b AS DOUBLE) / CAST(100.0 AS DOUBLE)
                    - mean_x / CAST(100.0 AS DOUBLE)) AS adj_y_b,
       (CAST(sy_a AS DOUBLE) / CAST(n_a AS DOUBLE) / CAST(100.0 AS DOUBLE)
         - theta * (CAST(sx_a AS DOUBLE) / CAST(n_a AS DOUBLE) / CAST(100.0 AS DOUBLE)
                    - mean_x / CAST(100.0 AS DOUBLE)))
       - (CAST(sy_b AS DOUBLE) / CAST(n_b AS DOUBLE) / CAST(100.0 AS DOUBLE)
         - theta * (CAST(sx_b AS DOUBLE) / CAST(n_b AS DOUBLE) / CAST(100.0 AS DOUBLE)
                    - mean_x / CAST(100.0 AS DOUBLE))) AS cuped_lift
FROM arms CROSS JOIN mom
"""

QUERIES_EXPERIMENTS["q_cuped"] = q_cuped
ORACLE_EXPERIMENTS["q_cuped"] = ORACLE_CUPED


# ---------------------------------------------------------------------------
# Mergeable histogram quantile sketch vs exact percentiles
# ---------------------------------------------------------------------------

_QS_WIDTH = 5.0
_QS_QUANTILES = (0.5, 0.9, 0.99)


def q_quantile_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantile estimation from a MERGEABLE fixed-width histogram:
    bucket = floor(value/5) is one partial-aggregable groupBy whose
    state is bounded by the value domain (~100 buckets), never by the
    row count — the shape that answers p50/p90/p99 over 100 TB with a
    shuffle measured in kilobytes. Estimates interpolate linearly
    inside the covering bucket from one preceding-exclusive cumulative
    window over the ~100-row collapse; the exact percentile rides
    along to expose the sketch error — via the DISTRIBUTED rank
    percentile (operators/rank.grouped_percentiles under a constant
    group), not the single-task ``percentile()`` agg it replaces, so
    even the verification kernel has no full-relation sort task.
    Exact-percentile interpolation is rounded at 4dp (last-ulp
    divergence across engines, the q_time_to_convert precedent)."""
    ev = _t(spark, sf_dir, "events").select("event_id", "value")
    hist = (
        ev.groupBy(F.floor(F.col("value") / F.lit(_QS_WIDTH)).cast("bigint").alias("b"))
        .agg(F.count(F.lit(1)).alias("c"))
    )
    tot = Window.partitionBy()
    prior = Window.orderBy("b").rowsBetween(Window.unboundedPreceding, -1)
    hist = hist.withColumn("n", F.sum("c").over(tot)).withColumn(
        "cum_prev", F.coalesce(F.sum("c").over(prior), F.lit(0))
    )
    ests = []
    for q in _QS_QUANTILES:
        t = F.lit(q) * F.col("n").cast("double")
        inside = (t - F.col("cum_prev").cast("double")) / F.col("c").cast("double")
        est = (F.col("b").cast("double") + inside) * F.lit(_QS_WIDTH)
        covering = (F.col("cum_prev").cast("double") < t) & (
            (F.col("cum_prev") + F.col("c")).cast("double") >= t
        )
        ests.append(F.max(F.when(covering, est)).alias(f"p{int(q * 100)}_sketch"))
    sk = hist.agg(*ests)
    exact = rk.grouped_percentiles(
        ev.withColumn("_g", F.lit(1)), "_g", "value", list(_QS_QUANTILES),
        tiebreak="event_id",
    ).select(
        *[
            F.round(F.col(f"p_{str(q).replace('.', '_')}"), 4).alias(
                f"p{int(q * 100)}_exact"
            )
            for q in _QS_QUANTILES
        ]
    )
    return sk.crossJoin(F.broadcast(exact))


# Tie-free frame: ORDER BY b, the grouped-by histogram bucket —
# unique per row, order is TOTAL.
ORACLE_QUANTILE_SKETCH = f"""
WITH hist AS (
  SELECT CAST(floor(value / {_QS_WIDTH}) AS BIGINT) AS b, CAST(count(*) AS BIGINT) AS c
  FROM events GROUP BY 1),
cum AS (
  SELECT *, CAST(sum(c) OVER () AS BIGINT) AS n,
         CAST(coalesce(sum(c) OVER (ORDER BY b
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS cum_prev
  FROM hist),
sk AS (
  SELECT
    {", ".join(
        f"max(CASE WHEN CAST(cum_prev AS DOUBLE) < CAST({q} AS DOUBLE) * CAST(n AS DOUBLE)"
        f" AND CAST(cum_prev + c AS DOUBLE) >= CAST({q} AS DOUBLE) * CAST(n AS DOUBLE)"
        f" THEN (CAST(b AS DOUBLE) + (CAST({q} AS DOUBLE) * CAST(n AS DOUBLE)"
        f" - CAST(cum_prev AS DOUBLE)) / CAST(c AS DOUBLE)) * {_QS_WIDTH} END)"
        f" AS p{int(q * 100)}_sketch"
        for q in _QS_QUANTILES
    )}
  FROM cum),
ex AS (
  SELECT
    {", ".join(
        f"round(quantile_cont(value, CAST({q} AS DOUBLE)), 4) AS p{int(q * 100)}_exact"
        for q in _QS_QUANTILES
    )}
  FROM events)
SELECT * FROM sk CROSS JOIN ex
"""

QUERIES_EXPERIMENTS["q_quantile_sketch"] = q_quantile_sketch
ORACLE_EXPERIMENTS["q_quantile_sketch"] = ORACLE_QUANTILE_SKETCH


# ---------------------------------------------------------------------------
# Deterministic Poisson-bootstrap confidence interval
# ---------------------------------------------------------------------------

_BOOT_R = 200
_BOOT_SALT = 29
_BOOT_STRIDE = 1009  # > _BOOT_R so (user, replicate) keys never collide
# Poisson(1) CDF ladder: P(W <= k) for k = 0..5; weights capped at 6
_POIS_CDF = (
    0.36787944117144233,
    0.7357588823428847,
    0.9196986029286058,
    0.9810118431238463,
    0.9963401531726563,
    0.9994058151824183,
)


def q_bootstrap_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Poisson bootstrap CI for mean per-user purchase spend — THE
    resampling scheme that distributes (Chamandy et al., Google 2012):
    each (user, replicate) draws an independent Poisson(1) weight, so
    no replicate needs a global sample-with-replacement pass. The
    weight is DETERMINISTIC: u = affine_hash(user·1009 + r)/P uniform
    in [0,1) stepped through the Poisson CDF ladder (17-digit literals,
    identical doubles in both engines). Per-user spend collapses first
    (integer cents); the replicate fan-out is over users×200, weighted
    sums are exact integers, and the percentile CI reads off the
    200-row replicate frame. At 100 TB: fan-out stays proportional to
    users, every aggregation partial — no shuffle carries more than
    (R × arms) rows. Point estimate and the 2.5%/97.5% bounds rounded
    at 4dp (exact-percentile interpolation, q_time_to_convert
    precedent)."""
    ev = _t(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(
        F.coalesce(
            F.sum(
                F.when(
                    F.col("event_type") == "purchase",
                    F.floor(F.col("value") * F.lit(100.0)).cast("bigint"),
                )
            ),
            F.lit(0),
        ).alias("cents")
    )
    fan = per_user.select(
        "user_id", "cents", F.explode(F.sequence(F.lit(0), F.lit(_BOOT_R - 1))).alias("r")
    )
    # mod-P reduce BEFORE the stride multiply: user_id*1009 alone
    # overflows int64 once ids pass ~9e15 (and a billion-id corpus
    # would overflow inside affine_hash's a*x product) — (id mod P) is
    # < 2^31, so (id mod P)*1009 + r < 2^42 and the affine product
    # stays < 2^62. ANSI mode would have made the overflow an error,
    # not a wrong answer, but the reduction makes it correct everywhere.
    combined = ((F.col("user_id") % MERSENNE_P) * _BOOT_STRIDE + F.col("r")) % MERSENNE_P
    u = affine_hash(combined, F.lit(_BOOT_SALT)).cast("double") / F.lit(float(MERSENNE_P))
    w = (
        F.when(u < _POIS_CDF[0], 0)
        .when(u < _POIS_CDF[1], 1)
        .when(u < _POIS_CDF[2], 2)
        .when(u < _POIS_CDF[3], 3)
        .when(u < _POIS_CDF[4], 4)
        .when(u < _POIS_CDF[5], 5)
        .otherwise(6)
    )
    reps = (
        fan.select("r", "cents", w.alias("w"))
        .groupBy("r")
        .agg(
            F.sum(F.col("w") * F.col("cents")).alias("wsum"),
            F.sum("w").alias("wn"),
        )
        .where(F.col("wn") > 0)
        .select(
            (F.col("wsum").cast("double") / F.col("wn").cast("double") / F.lit(100.0)).alias(
                "rep_mean"
            )
        )
    )
    ci = reps.agg(
        F.count(F.lit(1)).alias("n_replicates"),
        F.round(F.expr("percentile(rep_mean, 0.025)"), 4).alias("ci_lo"),
        F.round(F.expr("percentile(rep_mean, 0.975)"), 4).alias("ci_hi"),
    )
    point = per_user.agg(
        (
            F.sum("cents").cast("double") / F.count(F.lit(1)).cast("double") / F.lit(100.0)
        ).alias("point_mean")
    )
    return ci.crossJoin(F.broadcast(point)).select(
        "n_replicates", "point_mean", "ci_lo", "ci_hi"
    )


_BOOT_U = affine_hash_sql(
    f"(((user_id % {MERSENNE_P}) * {_BOOT_STRIDE} + r) % {MERSENNE_P})", str(_BOOT_SALT)
)

ORACLE_BOOTSTRAP_CI = f"""
WITH per_user AS (
  SELECT user_id,
         CAST(coalesce(sum(CASE WHEN event_type = 'purchase'
                                THEN CAST(floor(value * 100.0) AS BIGINT) END), 0)
              AS BIGINT) AS cents
  FROM events GROUP BY 1),
fan AS (
  SELECT user_id, cents, CAST(unnest(range(0, {_BOOT_R})) AS BIGINT) AS r
  FROM per_user),
weighted AS (
  SELECT r, cents,
         CASE WHEN CAST(({_BOOT_U}) AS DOUBLE) / CAST({MERSENNE_P} AS DOUBLE) < {_POIS_CDF[0]!r} THEN 0
              WHEN CAST(({_BOOT_U}) AS DOUBLE) / CAST({MERSENNE_P} AS DOUBLE) < {_POIS_CDF[1]!r} THEN 1
              WHEN CAST(({_BOOT_U}) AS DOUBLE) / CAST({MERSENNE_P} AS DOUBLE) < {_POIS_CDF[2]!r} THEN 2
              WHEN CAST(({_BOOT_U}) AS DOUBLE) / CAST({MERSENNE_P} AS DOUBLE) < {_POIS_CDF[3]!r} THEN 3
              WHEN CAST(({_BOOT_U}) AS DOUBLE) / CAST({MERSENNE_P} AS DOUBLE) < {_POIS_CDF[4]!r} THEN 4
              WHEN CAST(({_BOOT_U}) AS DOUBLE) / CAST({MERSENNE_P} AS DOUBLE) < {_POIS_CDF[5]!r} THEN 5
              ELSE 6 END AS w
  FROM fan),
reps AS (
  SELECT r, CAST(sum(w * cents) AS DOUBLE) / CAST(sum(w) AS DOUBLE)
              / CAST(100.0 AS DOUBLE) AS rep_mean
  FROM weighted GROUP BY r HAVING sum(w) > 0),
ci AS (
  SELECT CAST(count(*) AS BIGINT) AS n_replicates,
         round(quantile_cont(rep_mean, CAST(0.025 AS DOUBLE)), 4) AS ci_lo,
         round(quantile_cont(rep_mean, CAST(0.975 AS DOUBLE)), 4) AS ci_hi
  FROM reps),
pt AS (
  SELECT CAST(sum(cents) AS DOUBLE) / CAST(count(*) AS DOUBLE)
           / CAST(100.0 AS DOUBLE) AS point_mean
  FROM per_user)
SELECT n_replicates, point_mean, ci_lo, ci_hi FROM ci CROSS JOIN pt
"""

QUERIES_EXPERIMENTS["q_bootstrap_ci"] = q_bootstrap_ci
ORACLE_EXPERIMENTS["q_bootstrap_ci"] = ORACLE_BOOTSTRAP_CI


# ---------------------------------------------------------------------------
# Audience overlap: pairwise Jaccard between event-type user sets
# ---------------------------------------------------------------------------


def q_audience_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise audience overlap: for every pair of event types, the
    Jaccard similarity of their user sets. The (type, user) frame
    dedupes in one partial-agg pass; the pair fan-out self-joins ON
    user_id (co-partitioned, never cartesian) and its width is bounded
    by |types|² per user, not by events. |A∪B| = |A|+|B|−|A∩B| keeps
    everything integer until one division per pair."""
    aud = _t(spark, sf_dir, "events").select("event_type", "user_id").distinct()
    sizes = aud.groupBy("event_type").agg(F.count(F.lit(1)).alias("n_users"))
    a = aud.alias("a")
    b = aud.alias("b")
    inter = (
        a.join(
            b,
            (F.col("a.user_id") == F.col("b.user_id"))
            & (F.col("a.event_type") < F.col("b.event_type")),
        )
        .groupBy(
            F.col("a.event_type").alias("type_a"), F.col("b.event_type").alias("type_b")
        )
        .agg(F.count(F.lit(1)).alias("n_both"))
    )
    sa = sizes.select(F.col("event_type").alias("type_a"), F.col("n_users").alias("n_a"))
    sb = sizes.select(F.col("event_type").alias("type_b"), F.col("n_users").alias("n_b"))
    out = inter.join(F.broadcast(sa), "type_a").join(F.broadcast(sb), "type_b")
    union = F.col("n_a") + F.col("n_b") - F.col("n_both")
    return out.select(
        "type_a",
        "type_b",
        "n_a",
        "n_b",
        "n_both",
        (F.col("n_both").cast("double") / union.cast("double")).alias("jaccard"),
    )


ORACLE_AUDIENCE_OVERLAP = """
WITH aud AS (SELECT DISTINCT event_type, user_id FROM events),
sizes AS (
  SELECT event_type, CAST(count(*) AS BIGINT) AS n_users FROM aud GROUP BY 1),
inter AS (
  SELECT a.event_type AS type_a, b.event_type AS type_b,
         CAST(count(*) AS BIGINT) AS n_both
  FROM aud a JOIN aud b
    ON a.user_id = b.user_id AND a.event_type < b.event_type
  GROUP BY 1, 2)
SELECT i.type_a, i.type_b, sa.n_users AS n_a, sb.n_users AS n_b, i.n_both,
       CAST(i.n_both AS DOUBLE) / CAST(sa.n_users + sb.n_users - i.n_both AS DOUBLE)
         AS jaccard
FROM inter i
JOIN sizes sa ON i.type_a = sa.event_type
JOIN sizes sb ON i.type_b = sb.event_type
"""

QUERIES_EXPERIMENTS["q_audience_overlap"] = q_audience_overlap
ORACLE_EXPERIMENTS["q_audience_overlap"] = ORACLE_AUDIENCE_OVERLAP


# ---------------------------------------------------------------------------
# Difference-in-differences estimate on the hash split
# ---------------------------------------------------------------------------


def q_diff_in_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Difference-in-differences: per-user pre/post purchase spend
    (the q_cuped period split), arm means from the SAME single
    per-user collapse, DiD = (ȳA_post − ȳA_pre) − (ȳB_post − ȳB_pre).
    Sufficient statistics are 8 exact integers (per-arm Σpre, Σpost,
    n); only the four means and their differences are doubles, taken
    in the same order in both engines. One shuffle total at any
    scale."""
    ev = _t(spark, sf_dir, "events").select(
        "user_id",
        F.dayofmonth(F.to_date(F.col("ts").cast("timestamp"))).alias("dom"),
        "event_type",
        F.floor(F.col("value") * F.lit(100.0)).cast("bigint").alias("cents"),
    )
    buy = F.col("event_type") == "purchase"
    per_user = ev.groupBy("user_id").agg(
        F.coalesce(
            F.sum(F.when(buy & (F.col("dom") < _CUPED_SPLIT_DAY), F.col("cents"))), F.lit(0)
        ).alias("pre"),
        F.coalesce(
            F.sum(F.when(buy & (F.col("dom") >= _CUPED_SPLIT_DAY), F.col("cents"))), F.lit(0)
        ).alias("post"),
    ).withColumn("in_a", affine_hash(F.col("user_id"), F.lit(_AB_SALT)) % 2 == 0)
    s = per_user.agg(
        F.count(F.when(F.col("in_a"), 1)).alias("n_a"),
        F.count(F.when(~F.col("in_a"), 1)).alias("n_b"),
        F.sum(F.when(F.col("in_a"), F.col("pre"))).alias("pre_a"),
        F.sum(F.when(F.col("in_a"), F.col("post"))).alias("post_a"),
        F.sum(F.when(~F.col("in_a"), F.col("pre"))).alias("pre_b"),
        F.sum(F.when(~F.col("in_a"), F.col("post"))).alias("post_b"),
    )
    def mean(tot, n):
        return F.col(tot).cast("double") / F.col(n).cast("double") / F.lit(100.0)
    delta_a = mean("post_a", "n_a") - mean("pre_a", "n_a")
    delta_b = mean("post_b", "n_b") - mean("pre_b", "n_b")
    return s.select(
        "n_a",
        "n_b",
        mean("pre_a", "n_a").alias("mean_pre_a"),
        mean("post_a", "n_a").alias("mean_post_a"),
        mean("pre_b", "n_b").alias("mean_pre_b"),
        mean("post_b", "n_b").alias("mean_post_b"),
        delta_a.alias("delta_a"),
        delta_b.alias("delta_b"),
        (delta_a - delta_b).alias("did"),
    )


ORACLE_DIFF_IN_DIFF = f"""
WITH ev AS (
  SELECT user_id, date_part('day', CAST(ts AS DATE)) AS dom, event_type,
         CAST(floor(value * 100.0) AS BIGINT) AS cents
  FROM events),
per_user AS (
  SELECT user_id,
         CAST(coalesce(sum(CASE WHEN event_type = 'purchase' AND dom < {_CUPED_SPLIT_DAY}
                                THEN cents END), 0) AS BIGINT) AS pre,
         CAST(coalesce(sum(CASE WHEN event_type = 'purchase' AND dom >= {_CUPED_SPLIT_DAY}
                                THEN cents END), 0) AS BIGINT) AS post,
         ({affine_hash_sql('user_id', str(_AB_SALT))}) % 2 = 0 AS in_a
  FROM ev GROUP BY user_id),
s AS (
  SELECT CAST(count(CASE WHEN in_a THEN 1 END) AS BIGINT) AS n_a,
         CAST(count(CASE WHEN NOT in_a THEN 1 END) AS BIGINT) AS n_b,
         CAST(sum(CASE WHEN in_a THEN pre END) AS BIGINT) AS pre_a,
         CAST(sum(CASE WHEN in_a THEN post END) AS BIGINT) AS post_a,
         CAST(sum(CASE WHEN NOT in_a THEN pre END) AS BIGINT) AS pre_b,
         CAST(sum(CASE WHEN NOT in_a THEN post END) AS BIGINT) AS post_b
  FROM per_user)
SELECT n_a, n_b,
       CAST(pre_a AS DOUBLE) / CAST(n_a AS DOUBLE) / CAST(100.0 AS DOUBLE) AS mean_pre_a,
       CAST(post_a AS DOUBLE) / CAST(n_a AS DOUBLE) / CAST(100.0 AS DOUBLE) AS mean_post_a,
       CAST(pre_b AS DOUBLE) / CAST(n_b AS DOUBLE) / CAST(100.0 AS DOUBLE) AS mean_pre_b,
       CAST(post_b AS DOUBLE) / CAST(n_b AS DOUBLE) / CAST(100.0 AS DOUBLE) AS mean_post_b,
       CAST(post_a AS DOUBLE) / CAST(n_a AS DOUBLE) / CAST(100.0 AS DOUBLE)
         - CAST(pre_a AS DOUBLE) / CAST(n_a AS DOUBLE) / CAST(100.0 AS DOUBLE) AS delta_a,
       CAST(post_b AS DOUBLE) / CAST(n_b AS DOUBLE) / CAST(100.0 AS DOUBLE)
         - CAST(pre_b AS DOUBLE) / CAST(n_b AS DOUBLE) / CAST(100.0 AS DOUBLE) AS delta_b,
       (CAST(post_a AS DOUBLE) / CAST(n_a AS DOUBLE) / CAST(100.0 AS DOUBLE)
         - CAST(pre_a AS DOUBLE) / CAST(n_a AS DOUBLE) / CAST(100.0 AS DOUBLE))
       - (CAST(post_b AS DOUBLE) / CAST(n_b AS DOUBLE) / CAST(100.0 AS DOUBLE)
         - CAST(pre_b AS DOUBLE) / CAST(n_b AS DOUBLE) / CAST(100.0 AS DOUBLE)) AS did
FROM s
"""

QUERIES_EXPERIMENTS["q_diff_in_diff"] = q_diff_in_diff
ORACLE_EXPERIMENTS["q_diff_in_diff"] = ORACLE_DIFF_IN_DIFF


# ---------------------------------------------------------------------------
# Model calibration: reliability bins + Brier score
# ---------------------------------------------------------------------------

_CAL_BINS = 10


def q_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calibration readout for the q_auc score/label pair (score =
    per-user event count, label = high-value purchase): scores map to
    [0,1] via percent_rank with a user_id tiebreak (integer-ratio
    exact), decile reliability bins compare mean predicted vs observed
    rate, and the Brier score rides along per bin (Σ(p−y)² decomposes
    over bins; the global Brier is the n-weighted bin mean — law-
    tested). The rank-to-[0,1] map is the DISTRIBUTED percent_rank
    (operators/rank.py — same IEEE division, no single-partition
    sort); every bin statistic is a single division of exact sums at
    the end."""
    ev = _t(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("score"),
        F.max(
            ((F.col("event_type") == "purchase") & (F.col("value") > 150.0)).cast("int")
        ).alias("label"),
    )
    ranked = rk.ranked_percent_rank(
        per_user, [("score", True), ("user_id", True)], out="p"
    )
    binned = ranked.withColumn(
        "bin",
        F.least(
            F.floor(F.col("p") * F.lit(float(_CAL_BINS))).cast("int"),
            F.lit(_CAL_BINS - 1),
        ),
    )
    return binned.groupBy("bin").agg(
        F.count(F.lit(1)).alias("n"),
        F.avg("p").alias("mean_pred"),
        (F.sum("label").cast("double") / F.count(F.lit(1)).cast("double")).alias("obs_rate"),
        F.avg(
            (F.col("p") - F.col("label").cast("double"))
            * (F.col("p") - F.col("label").cast("double"))
        ).alias("brier"),
    )


ORACLE_CALIBRATION = f"""
WITH per_user AS (
  SELECT user_id, CAST(count(*) AS BIGINT) AS score,
         max(CASE WHEN event_type = 'purchase' AND value > 150.0 THEN 1 ELSE 0 END) AS label
  FROM events GROUP BY 1),
ranked AS (
  SELECT *, percent_rank() OVER (ORDER BY score ASC, user_id ASC) AS p
  FROM per_user),
binned AS (
  SELECT *, least(CAST(floor(p * CAST({_CAL_BINS} AS DOUBLE)) AS INT), {_CAL_BINS - 1}) AS bin
  FROM ranked)
SELECT bin, CAST(count(*) AS BIGINT) AS n,
       avg(p) AS mean_pred,
       CAST(sum(label) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS obs_rate,
       avg((p - CAST(label AS DOUBLE)) * (p - CAST(label AS DOUBLE))) AS brier
FROM binned GROUP BY 1
"""

QUERIES_EXPERIMENTS["q_calibration"] = q_calibration
ORACLE_EXPERIMENTS["q_calibration"] = ORACLE_CALIBRATION


# ---------------------------------------------------------------------------
# Log-rank test: KM cohorts compared across the A/B arms
# ---------------------------------------------------------------------------


def q_logrank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Log-rank test comparing time-to-first-purchase between the two
    hash arms — the inferential companion to [[q_kaplan_meier]]. The
    stratified life table aggregates per (arm, duration) FIRST, the
    joint event times come from the combined table, and at each event
    time arm A contributes observed d_A, expected d·n_A/n and
    hypergeometric variance d(n−d)n_A·n_B/(n²(n−1)). Observed and d
    are integers; expected/variance are per-row rationals summed as
    doubles with the chi-square ratio at the very end. Everything
    after the per-user collapse is bounded by the duration domain.
    Emits one row: O_A, E_A, variance, chi2 (1 df)."""
    ev = _t(spark, sf_dir, "events").select(
        "user_id", F.to_date(F.col("ts").cast("timestamp")).alias("day"), "event_type"
    )
    per_user = ev.groupBy("user_id").agg(
        F.min("day").alias("d0"),
        F.min(F.when(F.col("event_type") == "purchase", F.col("day"))).alias("d_buy"),
        F.max("day").alias("d_last"),
    )
    dur = F.when(
        F.col("d_buy").isNotNull(), F.datediff(F.col("d_buy"), F.col("d0"))
    ).otherwise(F.datediff(F.col("d_last"), F.col("d0")))
    evt = F.when(F.col("d_buy").isNotNull(), 1).otherwise(0)
    arm_a = (affine_hash(F.col("user_id"), F.lit(_AB_SALT)) % 2 == 0).cast("int")
    tab = per_user.select(dur.alias("dur"), evt.alias("evt"), arm_a.alias("a"))
    cells = tab.groupBy("dur").agg(
        F.sum("evt").alias("d"),
        F.count(F.lit(1)).alias("n_at"),
        F.sum(F.col("evt") * F.col("a")).alias("d_a"),
        F.sum("a").alias("n_at_a"),
    )
    tot = Window.partitionBy()
    prior = Window.orderBy("dur").rowsBetween(Window.unboundedPreceding, -1)
    cells = (
        cells.withColumn(
            "n_risk",
            F.sum("n_at").over(tot) - F.coalesce(F.sum("n_at").over(prior), F.lit(0)),
        )
        .withColumn(
            "n_risk_a",
            F.sum("n_at_a").over(tot) - F.coalesce(F.sum("n_at_a").over(prior), F.lit(0)),
        )
        .where((F.col("d") > 0) & (F.col("n_risk") > 1))
    )
    n, na, d = (
        F.col("n_risk").cast("double"),
        F.col("n_risk_a").cast("double"),
        F.col("d").cast("double"),
    )
    expected = d * na / n
    variance = (
        d * (n - d) * na * (n - na) / (n * n * (n - F.lit(1.0)))
    )
    agg = cells.agg(
        F.sum("d_a").alias("o_a"),
        F.sum(expected).alias("e_a"),
        F.sum(variance).alias("var_a"),
    )
    dev = F.col("o_a").cast("double") - F.col("e_a")
    return agg.select(
        "o_a", "e_a", "var_a", (dev * dev / F.col("var_a")).alias("chi2")
    )


# Tie-free frames: both 1-PRECEDING scans order by dur, the
# grouped-by key of the joint life table — unique per row, TOTAL.
ORACLE_LOGRANK = f"""
WITH ev AS (
  SELECT user_id, CAST(ts AS DATE) AS day, event_type FROM events),
per_user AS (
  SELECT user_id, min(day) AS d0,
         min(CASE WHEN event_type = 'purchase' THEN day END) AS d_buy,
         max(day) AS d_last
  FROM ev GROUP BY 1),
tab AS (
  SELECT CASE WHEN d_buy IS NOT NULL
              THEN CAST(date_diff('day', d0, d_buy) AS INT)
              ELSE CAST(date_diff('day', d0, d_last) AS INT) END AS dur,
         CASE WHEN d_buy IS NOT NULL THEN 1 ELSE 0 END AS evt,
         CASE WHEN ({affine_hash_sql('user_id', str(_AB_SALT))}) % 2 = 0
              THEN 1 ELSE 0 END AS a
  FROM per_user),
cells AS (
  SELECT dur, CAST(sum(evt) AS BIGINT) AS d, CAST(count(*) AS BIGINT) AS n_at,
         CAST(sum(evt * a) AS BIGINT) AS d_a, CAST(sum(a) AS BIGINT) AS n_at_a
  FROM tab GROUP BY 1),
risk AS (
  SELECT *,
         CAST(sum(n_at) OVER () AS BIGINT)
           - CAST(coalesce(sum(n_at) OVER (ORDER BY dur
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS n_risk,
         CAST(sum(n_at_a) OVER () AS BIGINT)
           - CAST(coalesce(sum(n_at_a) OVER (ORDER BY dur
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS n_risk_a
  FROM cells),
kept AS (SELECT * FROM risk WHERE d > 0 AND n_risk > 1),
agg AS (
  SELECT CAST(sum(d_a) AS BIGINT) AS o_a,
         sum(CAST(d AS DOUBLE) * CAST(n_risk_a AS DOUBLE) / CAST(n_risk AS DOUBLE)) AS e_a,
         sum(CAST(d AS DOUBLE) * CAST(n_risk - d AS DOUBLE)
             * CAST(n_risk_a AS DOUBLE) * CAST(n_risk - n_risk_a AS DOUBLE)
             / (CAST(n_risk AS DOUBLE) * CAST(n_risk AS DOUBLE)
                * (CAST(n_risk AS DOUBLE) - CAST(1.0 AS DOUBLE)))) AS var_a
  FROM kept)
SELECT o_a, e_a, var_a,
       (CAST(o_a AS DOUBLE) - e_a) * (CAST(o_a AS DOUBLE) - e_a) / var_a AS chi2
FROM agg
"""

QUERIES_EXPERIMENTS["q_logrank"] = q_logrank
ORACLE_EXPERIMENTS["q_logrank"] = ORACLE_LOGRANK


# ---------------------------------------------------------------------------
# Mann-Whitney U rank-sum test between the A/B arms
# ---------------------------------------------------------------------------


def q_mann_whitney(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Whitney U comparing purchase-value distributions between
    the hash arms — the nonparametric companion to [[q_ab_test]].
    Tie-averaged ranks come from the q_auc construction (one
    row_number window over milli-quantized values, (min+max)/2 per
    tie group — integers/half-integers, exact); the tie-corrected
    variance needs only Σ(t³−t) over tie-group sizes (exact integer).
    U, its null mean, and z are divisions/sqrt at the very end. The
    rank runs over purchase rows only via the DISTRIBUTED total-order
    rank (operators/rank.py) — the single-partition sort this family
    used to plan is gone; the purchase frame is cached because the
    rank's bounded boundary/cells jobs reuse it."""
    ev = _t(spark, sf_dir, "events")
    arm_a = affine_hash(F.col("user_id"), F.lit(_AB_SALT)) % 2 == 0
    x = (
        ev.where(F.col("event_type") == "purchase")
        .select(
            F.floor(F.col("value") * F.lit(1000.0)).cast("bigint").alias("v"),
            arm_a.cast("int").alias("a"),
            "event_id",
        )
    )
    x = register_cache(x)
    ranked = rk.ranked(x, [("v", True), ("event_id", True)], out="rn")
    ties = ranked.groupBy("v").agg(
        ((F.min("rn") + F.max("rn")).cast("double") / F.lit(2.0)).alias("avg_rank"),
        F.count(F.lit(1)).alias("t"),
    )
    joined = ranked.join(ties, "v")
    agg = joined.agg(
        F.sum("a").alias("n_a"),
        (F.count(F.lit(1)) - F.sum("a")).alias("n_b"),
        F.sum(F.when(F.col("a") == 1, F.col("avg_rank"))).alias("r_a"),
    )
    tie_term = ties.agg(
        F.sum(F.col("t") * F.col("t") * F.col("t") - F.col("t")).alias("tie_cubes")
    )
    na, nb = F.col("n_a").cast("double"), F.col("n_b").cast("double")
    n = na + nb
    u_a = F.col("r_a") - na * (na + F.lit(1.0)) / F.lit(2.0)
    var = (
        na * nb / F.lit(12.0)
        * ((n + F.lit(1.0)) - F.col("tie_cubes").cast("double") / (n * (n - F.lit(1.0))))
    )
    return agg.crossJoin(F.broadcast(tie_term)).select(
        "n_a",
        "n_b",
        u_a.alias("u_a"),
        ((u_a - na * nb / F.lit(2.0)) / F.sqrt(var)).alias("z_stat"),
    )


ORACLE_MANN_WHITNEY = f"""
WITH x AS (
  SELECT CAST(floor(value * 1000.0) AS BIGINT) AS v,
         CASE WHEN ({affine_hash_sql('user_id', str(_AB_SALT))}) % 2 = 0
              THEN 1 ELSE 0 END AS a,
         event_id
  FROM events WHERE event_type = 'purchase'),
ranked AS (
  SELECT *, row_number() OVER (ORDER BY v ASC, event_id ASC) AS rn FROM x),
ties AS (
  SELECT v, CAST(min(rn) + max(rn) AS DOUBLE) / CAST(2.0 AS DOUBLE) AS avg_rank,
         CAST(count(*) AS BIGINT) AS t
  FROM ranked GROUP BY v),
agg AS (
  SELECT CAST(sum(a) AS BIGINT) AS n_a,
         CAST(count(*) - sum(a) AS BIGINT) AS n_b,
         sum(CASE WHEN a = 1 THEN avg_rank END) AS r_a
  FROM ranked JOIN ties USING (v)),
tt AS (SELECT CAST(sum(t * t * t - t) AS BIGINT) AS tie_cubes FROM ties)
SELECT n_a, n_b,
       r_a - CAST(n_a AS DOUBLE) * (CAST(n_a AS DOUBLE) + CAST(1.0 AS DOUBLE))
               / CAST(2.0 AS DOUBLE) AS u_a,
       (r_a - CAST(n_a AS DOUBLE) * (CAST(n_a AS DOUBLE) + CAST(1.0 AS DOUBLE))
                / CAST(2.0 AS DOUBLE)
        - CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE) / CAST(2.0 AS DOUBLE))
       / sqrt(CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE) / CAST(12.0 AS DOUBLE)
              * ((CAST(n_a AS DOUBLE) + CAST(n_b AS DOUBLE) + CAST(1.0 AS DOUBLE))
                 - CAST(tie_cubes AS DOUBLE)
                   / ((CAST(n_a AS DOUBLE) + CAST(n_b AS DOUBLE))
                      * (CAST(n_a AS DOUBLE) + CAST(n_b AS DOUBLE) - CAST(1.0 AS DOUBLE)))))
         AS z_stat
FROM agg CROSS JOIN tt
"""

QUERIES_EXPERIMENTS["q_mann_whitney"] = q_mann_whitney
ORACLE_EXPERIMENTS["q_mann_whitney"] = ORACLE_MANN_WHITNEY


# ---------------------------------------------------------------------------
# Effect size: Cohen's d / Hedges' g between the arms
# ---------------------------------------------------------------------------


def q_effect_size(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Standardized effect size of per-user spend between the arms:
    Cohen's d from the pooled SD and Hedges' small-sample correction
    g = d·(1 − 3/(4n−9)). Sufficient statistics are six exact integer
    sums (per-arm n, Σx, Σx² in cents) from one per-user collapse;
    every double op is written in the same order in both engines.
    The whole statistic travels as ~3 longs per arm at any scale."""
    ev = _t(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(
        F.coalesce(
            F.sum(
                F.when(
                    F.col("event_type") == "purchase",
                    F.floor(F.col("value") * F.lit(100.0)).cast("bigint"),
                )
            ),
            F.lit(0),
        ).alias("x")
    ).withColumn("in_a", affine_hash(F.col("user_id"), F.lit(_AB_SALT)) % 2 == 0)
    s = per_user.agg(
        F.count(F.when(F.col("in_a"), 1)).alias("n_a"),
        F.count(F.when(~F.col("in_a"), 1)).alias("n_b"),
        F.sum(F.when(F.col("in_a"), F.col("x"))).alias("sx_a"),
        F.sum(F.when(~F.col("in_a"), F.col("x"))).alias("sx_b"),
        F.sum(F.when(F.col("in_a"), F.col("x") * F.col("x"))).alias("sxx_a"),
        F.sum(F.when(~F.col("in_a"), F.col("x") * F.col("x"))).alias("sxx_b"),
    )
    na, nb = F.col("n_a").cast("double"), F.col("n_b").cast("double")
    mean_a = F.col("sx_a").cast("double") / na / F.lit(100.0)
    mean_b = F.col("sx_b").cast("double") / nb / F.lit(100.0)
    ss_a = F.col("sxx_a").cast("double") - F.col("sx_a").cast("double") * F.col(
        "sx_a"
    ).cast("double") / na
    ss_b = F.col("sxx_b").cast("double") - F.col("sx_b").cast("double") * F.col(
        "sx_b"
    ).cast("double") / nb
    sp = F.sqrt((ss_a + ss_b) / (na + nb - F.lit(2.0))) / F.lit(100.0)
    d = (mean_a - mean_b) / sp
    g = d * (F.lit(1.0) - F.lit(3.0) / (F.lit(4.0) * (na + nb) - F.lit(9.0)))
    return s.select(
        "n_a",
        "n_b",
        mean_a.alias("mean_a"),
        mean_b.alias("mean_b"),
        sp.alias("pooled_sd"),
        d.alias("cohens_d"),
        g.alias("hedges_g"),
    )


ORACLE_EFFECT_SIZE = f"""
WITH per_user AS (
  SELECT user_id,
         CAST(coalesce(sum(CASE WHEN event_type = 'purchase'
                                THEN CAST(floor(value * 100.0) AS BIGINT) END), 0)
              AS BIGINT) AS x,
         ({affine_hash_sql('user_id', str(_AB_SALT))}) % 2 = 0 AS in_a
  FROM events GROUP BY user_id),
s AS (
  SELECT CAST(count(CASE WHEN in_a THEN 1 END) AS BIGINT) AS n_a,
         CAST(count(CASE WHEN NOT in_a THEN 1 END) AS BIGINT) AS n_b,
         CAST(sum(CASE WHEN in_a THEN x END) AS BIGINT) AS sx_a,
         CAST(sum(CASE WHEN NOT in_a THEN x END) AS BIGINT) AS sx_b,
         CAST(sum(CASE WHEN in_a THEN x * x END) AS BIGINT) AS sxx_a,
         CAST(sum(CASE WHEN NOT in_a THEN x * x END) AS BIGINT) AS sxx_b
  FROM per_user),
c AS (
  SELECT *,
         CAST(sx_a AS DOUBLE) / CAST(n_a AS DOUBLE) / CAST(100.0 AS DOUBLE) AS mean_a,
         CAST(sx_b AS DOUBLE) / CAST(n_b AS DOUBLE) / CAST(100.0 AS DOUBLE) AS mean_b,
         sqrt(((CAST(sxx_a AS DOUBLE) - CAST(sx_a AS DOUBLE) * CAST(sx_a AS DOUBLE)
                  / CAST(n_a AS DOUBLE))
               + (CAST(sxx_b AS DOUBLE) - CAST(sx_b AS DOUBLE) * CAST(sx_b AS DOUBLE)
                  / CAST(n_b AS DOUBLE)))
              / (CAST(n_a AS DOUBLE) + CAST(n_b AS DOUBLE) - CAST(2.0 AS DOUBLE)))
           / CAST(100.0 AS DOUBLE) AS pooled_sd
  FROM s)
SELECT n_a, n_b, mean_a, mean_b, pooled_sd,
       (mean_a - mean_b) / pooled_sd AS cohens_d,
       (mean_a - mean_b) / pooled_sd
         * (CAST(1.0 AS DOUBLE) - CAST(3.0 AS DOUBLE)
            / (CAST(4.0 AS DOUBLE) * (CAST(n_a AS DOUBLE) + CAST(n_b AS DOUBLE))
               - CAST(9.0 AS DOUBLE))) AS hedges_g
FROM c
"""

QUERIES_EXPERIMENTS["q_effect_size"] = q_effect_size
ORACLE_EXPERIMENTS["q_effect_size"] = ORACLE_EFFECT_SIZE


# ---------------------------------------------------------------------------
# Daily sample-ratio-mismatch (SRM) guardrail
# ---------------------------------------------------------------------------


def q_srm_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The #1 real-world experiment guardrail: daily sample-ratio
    mismatch. For each day, distinct active users per arm and the
    1-df chi-square against the expected 50/50 split — a drifting
    assignment (bot traffic, logging loss, redirect bugs) shows up
    here before any metric moves. One (day, user) dedup pass, one
    (day, arm) rollup; counts integer, chi2 = (n_a−n_b)²/(n_a+n_b)
    one division per day."""
    ev = _t(spark, sf_dir, "events").select(
        F.to_date(F.col("ts").cast("timestamp")).alias("day"), "user_id"
    ).distinct()
    arm_a = (affine_hash(F.col("user_id"), F.lit(_AB_SALT)) % 2 == 0).cast("int")
    daily = ev.select("day", arm_a.alias("a")).groupBy("day").agg(
        F.sum("a").alias("n_a"), (F.count(F.lit(1)) - F.sum("a")).alias("n_b")
    )
    diff = (F.col("n_a") - F.col("n_b")).cast("double")
    return daily.select(
        "day",
        "n_a",
        "n_b",
        (diff * diff / (F.col("n_a") + F.col("n_b")).cast("double")).alias("chi2"),
    )


ORACLE_SRM_CHECK = f"""
WITH ev AS (
  SELECT DISTINCT CAST(ts AS DATE) AS day, user_id FROM events),
daily AS (
  SELECT day,
         CAST(sum(CASE WHEN ({affine_hash_sql('user_id', str(_AB_SALT))}) % 2 = 0
                       THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
         CAST(sum(CASE WHEN ({affine_hash_sql('user_id', str(_AB_SALT))}) % 2 = 0
                       THEN 0 ELSE 1 END) AS BIGINT) AS n_b
  FROM ev GROUP BY 1)
SELECT day, n_a, n_b,
       CAST(n_a - n_b AS DOUBLE) * CAST(n_a - n_b AS DOUBLE)
         / CAST(n_a + n_b AS DOUBLE) AS chi2
FROM daily
"""

QUERIES_EXPERIMENTS["q_srm_check"] = q_srm_check
ORACLE_EXPERIMENTS["q_srm_check"] = ORACLE_SRM_CHECK


# ---------------------------------------------------------------------------
# Streaming experiment monitor (the A/B readout, live)
# ---------------------------------------------------------------------------


def q_stream_ab(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly per-arm event/conversion counts computed BY THE STREAMING
    ENGINE (availableNow bounded replay, complete mode) — the live
    dashboard twin of [[q_ab_test]]. Same affine-hash arm split as
    every batch readout here, so online and offline scorecards join
    1:1. Deterministic replay → fully hash-checked against plain
    SQL."""
    from .streaming.windows import streaming_ab_monitor

    return streaming_ab_monitor(spark, sf_dir)


ORACLE_STREAM_AB = f"""
WITH ev AS (
  SELECT date_trunc('hour', ts) AS window_start,
         CASE WHEN ({affine_hash_sql('user_id', str(_AB_SALT))}) % 2 = 0
              THEN 'A' ELSE 'B' END AS arm,
         CASE WHEN event_type = 'purchase' AND value > 150.0 THEN 1 ELSE 0 END AS conv
  FROM events)
SELECT window_start, arm, CAST(count(*) AS BIGINT) AS n_events,
       CAST(sum(conv) AS BIGINT) AS n_conv,
       CAST(sum(conv) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS conv_rate
FROM ev GROUP BY 1, 2
"""

QUERIES_EXPERIMENTS["q_stream_ab"] = q_stream_ab
ORACLE_EXPERIMENTS["q_stream_ab"] = ORACLE_STREAM_AB


# ---------------------------------------------------------------------------
# Population Stability Index between the hash halves
# ---------------------------------------------------------------------------

_PSI_WIDTH = 50.0  # value domain ~0-500 → ~10 buckets
_PSI_SALT = 23  # same event-hash halves as queries_quality.q_ks_drift


def q_psi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population Stability Index — the model-monitoring drift metric
    next to [[q_ks_drift]]/[[q_cusum_drift]]: fixed-width value buckets
    (domain-bounded, mergeable — same shape as the quantile sketch),
    per-half proportions, PSI = Σ (p_a−p_b)·ln(p_a/p_b). Proportions
    are integer-ratio divisions; ln of their ratio has 4-dp headroom.
    Empty-on-one-side buckets use the standard ε=1e-6 floor (exact
    literal both engines). One partial-agg groupBy; the rollup is
    ~10 rows. Also emits the bucket count and max per-bucket
    contribution for triage."""
    ev = _t(spark, sf_dir, "events").select(
        F.floor(F.col("value") / F.lit(_PSI_WIDTH)).cast("bigint").alias("b"),
        (affine_hash(F.col("event_id"), F.lit(_PSI_SALT)) % 2 == 0).alias("in_a"),
    )
    counts = ev.groupBy("b").agg(
        F.count(F.when(F.col("in_a"), 1)).alias("ca"),
        F.count(F.when(~F.col("in_a"), 1)).alias("cb"),
    )
    tot = Window.partitionBy()
    eps = F.lit(1e-06)
    pa = F.greatest(
        F.col("ca").cast("double") / F.sum("ca").over(tot).cast("double"), eps
    )
    pb = F.greatest(
        F.col("cb").cast("double") / F.sum("cb").over(tot).cast("double"), eps
    )
    per_bucket = counts.select(((pa - pb) * F.log(pa / pb)).alias("contrib"))
    return per_bucket.agg(
        F.count(F.lit(1)).alias("n_buckets"),
        F.sum("contrib").alias("psi"),
        F.max("contrib").alias("max_contrib"),
    )


ORACLE_PSI = f"""
WITH ev AS (
  SELECT CAST(floor(value / {_PSI_WIDTH}) AS BIGINT) AS b,
         ({affine_hash_sql('event_id', str(_PSI_SALT))}) % 2 = 0 AS in_a
  FROM events),
counts AS (
  SELECT b, CAST(count(CASE WHEN in_a THEN 1 END) AS BIGINT) AS ca,
         CAST(count(CASE WHEN NOT in_a THEN 1 END) AS BIGINT) AS cb
  FROM ev GROUP BY 1),
per_bucket AS (
  SELECT (greatest(CAST(ca AS DOUBLE) / CAST(sum(ca) OVER () AS DOUBLE),
                   CAST(1e-06 AS DOUBLE))
          - greatest(CAST(cb AS DOUBLE) / CAST(sum(cb) OVER () AS DOUBLE),
                     CAST(1e-06 AS DOUBLE)))
         * ln(greatest(CAST(ca AS DOUBLE) / CAST(sum(ca) OVER () AS DOUBLE),
                       CAST(1e-06 AS DOUBLE))
              / greatest(CAST(cb AS DOUBLE) / CAST(sum(cb) OVER () AS DOUBLE),
                         CAST(1e-06 AS DOUBLE))) AS contrib
  FROM counts)
SELECT CAST(count(*) AS BIGINT) AS n_buckets, sum(contrib) AS psi,
       max(contrib) AS max_contrib
FROM per_bucket
"""

QUERIES_EXPERIMENTS["q_psi"] = q_psi
ORACLE_EXPERIMENTS["q_psi"] = ORACLE_PSI


# ---------------------------------------------------------------------------
# Heterogeneous treatment effect: per-spend-quintile lift
# ---------------------------------------------------------------------------


def q_hte_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Segment-level treatment effects: conversion lift per monetary
    quintile — does the experiment help whales or minnows? Quintiles
    come from the SAME total-order DISTRIBUTED ntile as [[q_rfm]]
    (pre-treatment-style covariate, so the split is orthogonal to the
    arm hash); per (quintile, arm) the conversion rollup is integer
    counts and the lift one subtraction of two divisions. The rank
    runs over the per-user collapse with no single-partition sort;
    everything downstream is 10 rows."""
    ev = _t(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(
        F.coalesce(
            F.sum(
                F.when(
                    F.col("event_type") == "purchase",
                    F.floor(F.col("value") * F.lit(100.0)).cast("bigint"),
                )
            ),
            F.lit(0),
        ).alias("m_cents"),
        F.max(
            ((F.col("event_type") == "purchase") & (F.col("value") > 150.0)).cast("int")
        ).alias("converted"),
    ).withColumn("in_a", affine_hash(F.col("user_id"), F.lit(_AB_SALT)) % 2 == 0)
    seg = rk.ranked_ntile(
        per_user, [("m_cents", False), ("user_id", True)], 5, out="m_quint"
    )
    grid = seg.groupBy("m_quint").agg(
        F.count(F.when(F.col("in_a"), 1)).alias("n_a"),
        F.count(F.when(~F.col("in_a"), 1)).alias("n_b"),
        F.coalesce(F.sum(F.when(F.col("in_a"), F.col("converted"))), F.lit(0)).alias("c_a"),
        F.coalesce(F.sum(F.when(~F.col("in_a"), F.col("converted"))), F.lit(0)).alias("c_b"),
    )
    # tiny segments can leave an arm empty — rate is undefined (null),
    # not a division error (ANSI mode raises on /0)
    ra = F.when(
        F.col("n_a") > 0, F.col("c_a").cast("double") / F.col("n_a").cast("double")
    )
    rb = F.when(
        F.col("n_b") > 0, F.col("c_b").cast("double") / F.col("n_b").cast("double")
    )
    return grid.select(
        "m_quint", "n_a", "n_b", "c_a", "c_b",
        ra.alias("rate_a"), rb.alias("rate_b"), (ra - rb).alias("lift"),
    )


ORACLE_HTE_SEGMENTS = f"""
WITH per_user AS (
  SELECT user_id,
         CAST(coalesce(sum(CASE WHEN event_type = 'purchase'
                                THEN CAST(floor(value * 100.0) AS BIGINT) END), 0)
              AS BIGINT) AS m_cents,
         max(CASE WHEN event_type = 'purchase' AND value > 150.0 THEN 1 ELSE 0 END)
           AS converted,
         ({affine_hash_sql('user_id', str(_AB_SALT))}) % 2 = 0 AS in_a
  FROM events GROUP BY user_id),
seg AS (
  SELECT *, CAST(ntile(5) OVER (ORDER BY m_cents DESC, user_id ASC) AS INT) AS m_quint
  FROM per_user),
grid AS (
  SELECT m_quint,
         CAST(count(CASE WHEN in_a THEN 1 END) AS BIGINT) AS n_a,
         CAST(count(CASE WHEN NOT in_a THEN 1 END) AS BIGINT) AS n_b,
         CAST(coalesce(sum(CASE WHEN in_a THEN converted END), 0) AS BIGINT) AS c_a,
         CAST(coalesce(sum(CASE WHEN NOT in_a THEN converted END), 0) AS BIGINT) AS c_b
  FROM seg GROUP BY 1)
SELECT m_quint, n_a, n_b, c_a, c_b,
       CASE WHEN n_a > 0 THEN CAST(c_a AS DOUBLE) / CAST(n_a AS DOUBLE) END AS rate_a,
       CASE WHEN n_b > 0 THEN CAST(c_b AS DOUBLE) / CAST(n_b AS DOUBLE) END AS rate_b,
       (CASE WHEN n_a > 0 THEN CAST(c_a AS DOUBLE) / CAST(n_a AS DOUBLE) END)
         - (CASE WHEN n_b > 0 THEN CAST(c_b AS DOUBLE) / CAST(n_b AS DOUBLE) END) AS lift
FROM grid
"""

QUERIES_EXPERIMENTS["q_hte_segments"] = q_hte_segments
ORACLE_EXPERIMENTS["q_hte_segments"] = ORACLE_HTE_SEGMENTS


# ---------------------------------------------------------------------------
# Jensen-Shannon divergence between the two halves of the month
# ---------------------------------------------------------------------------


def q_jsd(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Jensen-Shannon divergence between the event-type mix of the
    first and second half of the month — the symmetric, bounded
    ([0, ln 2]) member of the drift family ([[q_psi]], [[q_ks_drift]]).
    JSD = H(m) − (H(p)+H(q))/2 with m the midpoint mixture; every
    H uses the count identity from [[q_entropy]] so only integer-ratio
    proportions reach ln. One (half, type) partial-agg collapse
    (≤ 2·|types| rows) does all the work."""
    ev = _t(spark, sf_dir, "events").select(
        (F.dayofmonth(F.to_date(F.col("ts").cast("timestamp"))) < _CUPED_SPLIT_DAY).alias(
            "first_half"
        ),
        "event_type",
    )
    cells = ev.groupBy("event_type").agg(
        F.count(F.when(F.col("first_half"), 1)).alias("cp"),
        F.count(F.when(~F.col("first_half"), 1)).alias("cq"),
    )
    tot = Window.partitionBy()
    np_, nq = F.sum("cp").over(tot).cast("double"), F.sum("cq").over(tot).cast("double")
    p = F.col("cp").cast("double") / np_
    q = F.col("cq").cast("double") / nq
    m = (p + q) / F.lit(2.0)
    term = (
        F.when(p > 0, p * F.log(p)).otherwise(F.lit(0.0))
        + F.when(q > 0, q * F.log(q)).otherwise(F.lit(0.0))
    ) / F.lit(2.0) - F.when(m > 0, m * F.log(m)).otherwise(F.lit(0.0))
    per_type = cells.select(term.alias("contrib"), np_.alias("n_p"), nq.alias("n_q"))
    return per_type.groupBy("n_p", "n_q").agg(
        F.sum("contrib").alias("jsd_nats"),
        (F.sum("contrib") / F.log(F.lit(2.0))).alias("jsd_bits"),
    )


ORACLE_JSD = f"""
WITH ev AS (
  SELECT date_part('day', CAST(ts AS DATE)) < {_CUPED_SPLIT_DAY} AS first_half,
         event_type
  FROM events),
cells AS (
  SELECT event_type,
         CAST(count(CASE WHEN first_half THEN 1 END) AS BIGINT) AS cp,
         CAST(count(CASE WHEN NOT first_half THEN 1 END) AS BIGINT) AS cq
  FROM ev GROUP BY 1),
per_type AS (
  SELECT ((CASE WHEN CAST(cp AS DOUBLE) / CAST(sum(cp) OVER () AS DOUBLE) > 0
                THEN CAST(cp AS DOUBLE) / CAST(sum(cp) OVER () AS DOUBLE)
                     * ln(CAST(cp AS DOUBLE) / CAST(sum(cp) OVER () AS DOUBLE))
                ELSE CAST(0.0 AS DOUBLE) END
           + CASE WHEN CAST(cq AS DOUBLE) / CAST(sum(cq) OVER () AS DOUBLE) > 0
                  THEN CAST(cq AS DOUBLE) / CAST(sum(cq) OVER () AS DOUBLE)
                       * ln(CAST(cq AS DOUBLE) / CAST(sum(cq) OVER () AS DOUBLE))
                  ELSE CAST(0.0 AS DOUBLE) END) / CAST(2.0 AS DOUBLE)
          - CASE WHEN (CAST(cp AS DOUBLE) / CAST(sum(cp) OVER () AS DOUBLE)
                       + CAST(cq AS DOUBLE) / CAST(sum(cq) OVER () AS DOUBLE))
                      / CAST(2.0 AS DOUBLE) > 0
                 THEN (CAST(cp AS DOUBLE) / CAST(sum(cp) OVER () AS DOUBLE)
                       + CAST(cq AS DOUBLE) / CAST(sum(cq) OVER () AS DOUBLE))
                      / CAST(2.0 AS DOUBLE)
                      * ln((CAST(cp AS DOUBLE) / CAST(sum(cp) OVER () AS DOUBLE)
                            + CAST(cq AS DOUBLE) / CAST(sum(cq) OVER () AS DOUBLE))
                           / CAST(2.0 AS DOUBLE))
                 ELSE CAST(0.0 AS DOUBLE) END) AS contrib,
         CAST(sum(cp) OVER () AS DOUBLE) AS n_p,
         CAST(sum(cq) OVER () AS DOUBLE) AS n_q
  FROM cells)
SELECT n_p, n_q, sum(contrib) AS jsd_nats,
       sum(contrib) / ln(CAST(2.0 AS DOUBLE)) AS jsd_bits
FROM per_type GROUP BY 1, 2
"""

QUERIES_EXPERIMENTS["q_jsd"] = q_jsd
ORACLE_EXPERIMENTS["q_jsd"] = ORACLE_JSD


# ---------------------------------------------------------------------------
# Spearman rank correlation (exact, tie-averaged) frequency vs spend
# ---------------------------------------------------------------------------


def q_spearman(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact Spearman rank correlation between per-user event frequency
    and purchase spend: tie-averaged ranks for BOTH variables via the
    q_auc construction (row_number window + per-value (min+max)/2 —
    half-integers, exact), then Pearson on the ranks from five exact
    sums (Σr, Σs, Σrs, Σr², Σs² — half-integer arithmetic stays exact
    in doubles far beyond any realistic n), one sqrt/division at the
    end. Two DISTRIBUTED total-order ranks (operators/rank.py) over
    the cached per-user collapse, everything else 1-row state."""
    ev = _t(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("f"),
        F.coalesce(
            F.sum(
                F.when(
                    F.col("event_type") == "purchase",
                    F.floor(F.col("value") * F.lit(100.0)).cast("bigint"),
                )
            ),
            F.lit(0),
        ).alias("m"),
    )
    per_user = register_cache(per_user)
    rn = rk.ranked(per_user, [("f", True), ("user_id", True)], out="rf")
    rn = rk.ranked(rn, [("m", True), ("user_id", True)], out="rm")
    tie_f = rn.groupBy("f").agg(
        ((F.min("rf") + F.max("rf")).cast("double") / F.lit(2.0)).alias("r")
    )
    tie_m = rn.groupBy("m").agg(
        ((F.min("rm") + F.max("rm")).cast("double") / F.lit(2.0)).alias("s")
    )
    j = rn.join(tie_f, "f").join(tie_m, "m")
    agg = j.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("r").alias("sr"),
        F.sum("s").alias("ss"),
        F.sum(F.col("r") * F.col("s")).alias("srs"),
        F.sum(F.col("r") * F.col("r")).alias("srr"),
        F.sum(F.col("s") * F.col("s")).alias("sss"),
    )
    n = F.col("n").cast("double")
    cov = F.col("srs") - F.col("sr") * F.col("ss") / n
    vr = F.col("srr") - F.col("sr") * F.col("sr") / n
    vs = F.col("sss") - F.col("ss") * F.col("ss") / n
    return agg.select("n", (cov / F.sqrt(vr * vs)).alias("spearman_rho"))


ORACLE_SPEARMAN = """
WITH per_user AS (
  SELECT user_id, CAST(count(*) AS BIGINT) AS f,
         CAST(coalesce(sum(CASE WHEN event_type = 'purchase'
                                THEN CAST(floor(value * 100.0) AS BIGINT) END), 0)
              AS BIGINT) AS m
  FROM events GROUP BY 1),
rn AS (
  SELECT *, row_number() OVER (ORDER BY f ASC, user_id ASC) AS rf,
         row_number() OVER (ORDER BY m ASC, user_id ASC) AS rm
  FROM per_user),
tie_f AS (
  SELECT f, CAST(min(rf) + max(rf) AS DOUBLE) / CAST(2.0 AS DOUBLE) AS r
  FROM rn GROUP BY f),
tie_m AS (
  SELECT m, CAST(min(rm) + max(rm) AS DOUBLE) / CAST(2.0 AS DOUBLE) AS s
  FROM rn GROUP BY m),
agg AS (
  SELECT CAST(count(*) AS BIGINT) AS n, sum(r) AS sr, sum(s) AS ss,
         sum(r * s) AS srs, sum(r * r) AS srr, sum(s * s) AS sss
  FROM rn JOIN tie_f USING (f) JOIN tie_m USING (m))
SELECT n,
       (srs - sr * ss / CAST(n AS DOUBLE))
         / sqrt((srr - sr * sr / CAST(n AS DOUBLE))
                * (sss - ss * ss / CAST(n AS DOUBLE))) AS spearman_rho
FROM agg
"""

QUERIES_EXPERIMENTS["q_spearman"] = q_spearman
ORACLE_EXPERIMENTS["q_spearman"] = ORACLE_SPEARMAN


# ---------------------------------------------------------------------------
# Cohort LTV curve: cumulative revenue per user by cohort age
# ---------------------------------------------------------------------------


def q_cohort_ltv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort LTV curves: users grouped by first-seen day, cumulative
    purchase revenue per cohort member by day offset — the growth
    twin of [[q_cohort_retention]]'s activity grid. Revenue cells are
    integer cents from a (cohort, offset) partial-agg collapse; the
    running sum is one per-cohort ordered window over ≤ horizon rows;
    cum_ltv = cum_cents / cohort_size / 100 is a single exact-integer
    division chain per cell. The first-day join build side is one row
    per user and co-partitioned with the event shuffle at scale."""
    ev = _t(spark, sf_dir, "events").select(
        "user_id",
        F.to_date(F.col("ts").cast("timestamp")).alias("day"),
        "event_type",
        F.floor(F.col("value") * F.lit(100.0)).cast("bigint").alias("cents"),
    )
    first = ev.groupBy("user_id").agg(F.min("day").alias("cohort_day"))
    sizes = first.groupBy("cohort_day").agg(F.count(F.lit(1)).alias("cohort_size"))
    cells = (
        ev.join(first, "user_id")
        .where(F.col("event_type") == "purchase")
        .groupBy(
            "cohort_day",
            F.datediff(F.col("day"), F.col("cohort_day")).alias("day_offset"),
        )
        .agg(F.sum("cents").alias("rev_cents"))
    )
    w = Window.partitionBy("cohort_day").orderBy("day_offset").rowsBetween(
        Window.unboundedPreceding, 0
    )
    cum = cells.withColumn("cum_cents", F.sum("rev_cents").over(w))
    return cum.join(F.broadcast(sizes), "cohort_day").select(
        "cohort_day",
        "day_offset",
        "cohort_size",
        (F.col("rev_cents").cast("double") / F.lit(100.0)).alias("revenue"),
        (
            F.col("cum_cents").cast("double")
            / F.col("cohort_size").cast("double")
            / F.lit(100.0)
        ).alias("cum_ltv_per_user"),
    )


ORACLE_COHORT_LTV = """
WITH ev AS (
  SELECT user_id, CAST(ts AS DATE) AS day, event_type,
         CAST(floor(value * 100.0) AS BIGINT) AS cents
  FROM events),
first AS (SELECT user_id, min(day) AS cohort_day FROM ev GROUP BY 1),
sizes AS (
  SELECT cohort_day, CAST(count(*) AS BIGINT) AS cohort_size
  FROM first GROUP BY 1),
cells AS (
  SELECT f.cohort_day,
         CAST(date_diff('day', f.cohort_day, e.day) AS INT) AS day_offset,
         CAST(sum(e.cents) AS BIGINT) AS rev_cents
  FROM ev e JOIN first f ON e.user_id = f.user_id
  WHERE e.event_type = 'purchase'
  GROUP BY 1, 2),
cum AS (
  SELECT *, CAST(sum(rev_cents) OVER (PARTITION BY cohort_day ORDER BY day_offset
              ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_cents
  FROM cells)
SELECT c.cohort_day, c.day_offset, s.cohort_size,
       CAST(c.rev_cents AS DOUBLE) / CAST(100.0 AS DOUBLE) AS revenue,
       CAST(c.cum_cents AS DOUBLE) / CAST(s.cohort_size AS DOUBLE)
         / CAST(100.0 AS DOUBLE) AS cum_ltv_per_user
FROM cum c JOIN sizes s ON c.cohort_day = s.cohort_day
"""

QUERIES_EXPERIMENTS["q_cohort_ltv"] = q_cohort_ltv
ORACLE_EXPERIMENTS["q_cohort_ltv"] = ORACLE_COHORT_LTV


# ---------------------------------------------------------------------------
# A/B power analysis from the observed rates
# ---------------------------------------------------------------------------


def q_power_ab(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Experiment planning readout: per-arm sample size required to
    detect the OBSERVED rate difference at alpha=0.05 (two-sided) /
    80% power — n = (z_a·√(2p̄q̄) + z_b·√(p_a q_a + p_b q_b))² / Δ²,
    computed from the same integer conversion counts as [[q_ab_test]].
    z constants are 17-digit literals (identical doubles in both
    engines); one ceil at the end. The answer to 'how much longer
    must this test run', straight from the sufficient statistics."""
    za = 1.959963984540054  # Phi^-1(0.975)
    zb = 0.8416212335729143  # Phi^-1(0.80)
    ev = _t(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(
        F.max(
            ((F.col("event_type") == "purchase") & (F.col("value") > 150.0)).cast("int")
        ).alias("converted")
    ).withColumn("in_a", affine_hash(F.col("user_id"), F.lit(_AB_SALT)) % 2 == 0)
    s = per_user.agg(
        F.count(F.when(F.col("in_a"), 1)).alias("n_a"),
        F.count(F.when(~F.col("in_a"), 1)).alias("n_b"),
        F.sum(F.when(F.col("in_a"), F.col("converted"))).alias("c_a"),
        F.sum(F.when(~F.col("in_a"), F.col("converted"))).alias("c_b"),
    )
    pa = F.col("c_a").cast("double") / F.col("n_a").cast("double")
    pb = F.col("c_b").cast("double") / F.col("n_b").cast("double")
    pbar = (F.col("c_a") + F.col("c_b")).cast("double") / (
        F.col("n_a") + F.col("n_b")
    ).cast("double")
    delta = pa - pb
    num = F.lit(za) * F.sqrt(F.lit(2.0) * pbar * (F.lit(1.0) - pbar)) + F.lit(
        zb
    ) * F.sqrt(pa * (F.lit(1.0) - pa) + pb * (F.lit(1.0) - pb))
    return s.select(
        pa.alias("rate_a"),
        pb.alias("rate_b"),
        delta.alias("observed_delta"),
        F.ceil(num * num / (delta * delta)).cast("bigint").alias("n_per_arm_required"),
    )


ORACLE_POWER_AB = f"""
WITH per_user AS (
  SELECT user_id,
         max(CASE WHEN event_type = 'purchase' AND value > 150.0 THEN 1 ELSE 0 END)
           AS converted,
         ({affine_hash_sql('user_id', str(_AB_SALT))}) % 2 = 0 AS in_a
  FROM events GROUP BY user_id),
s AS (
  SELECT CAST(count(CASE WHEN in_a THEN 1 END) AS BIGINT) AS n_a,
         CAST(count(CASE WHEN NOT in_a THEN 1 END) AS BIGINT) AS n_b,
         CAST(sum(CASE WHEN in_a THEN converted END) AS BIGINT) AS c_a,
         CAST(sum(CASE WHEN NOT in_a THEN converted END) AS BIGINT) AS c_b
  FROM per_user),
c AS (
  SELECT CAST(c_a AS DOUBLE) / CAST(n_a AS DOUBLE) AS pa,
         CAST(c_b AS DOUBLE) / CAST(n_b AS DOUBLE) AS pb,
         CAST(c_a + c_b AS DOUBLE) / CAST(n_a + n_b AS DOUBLE) AS pbar
  FROM s)
SELECT pa AS rate_a, pb AS rate_b, pa - pb AS observed_delta,
       CAST(ceil((CAST(1.959963984540054 AS DOUBLE)
                    * sqrt(CAST(2.0 AS DOUBLE) * pbar * (CAST(1.0 AS DOUBLE) - pbar))
                  + CAST(0.8416212335729143 AS DOUBLE)
                    * sqrt(pa * (CAST(1.0 AS DOUBLE) - pa)
                           + pb * (CAST(1.0 AS DOUBLE) - pb)))
                 * (CAST(1.959963984540054 AS DOUBLE)
                    * sqrt(CAST(2.0 AS DOUBLE) * pbar * (CAST(1.0 AS DOUBLE) - pbar))
                  + CAST(0.8416212335729143 AS DOUBLE)
                    * sqrt(pa * (CAST(1.0 AS DOUBLE) - pa)
                           + pb * (CAST(1.0 AS DOUBLE) - pb)))
                 / ((pa - pb) * (pa - pb))) AS BIGINT) AS n_per_arm_required
FROM c
"""

QUERIES_EXPERIMENTS["q_power_ab"] = q_power_ab
ORACLE_EXPERIMENTS["q_power_ab"] = ORACLE_POWER_AB


# ---------------------------------------------------------------------------
# Association rules over event-type baskets
# ---------------------------------------------------------------------------


def q_basket_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket association rules over per-user event-type sets:
    for each unordered type pair, support, both directional
    confidences P(B|A) and P(A|B), and lift — the directional reading
    of [[q_audience_overlap]]'s symmetric Jaccard. Same bounded
    co-occurrence plan (dedup pass, user-keyed self-join, |types|²
    fan-out per user), integer counts end-to-end with one division per
    statistic; lift is written (n_both·N)/(n_a·n_b) so a single
    integer product feeds a single division."""
    aud = _t(spark, sf_dir, "events").select("event_type", "user_id").distinct()
    n_users = aud.select("user_id").distinct().count()
    sizes = aud.groupBy("event_type").agg(F.count(F.lit(1)).alias("n_users"))
    a = aud.alias("a")
    b = aud.alias("b")
    inter = (
        a.join(
            b,
            (F.col("a.user_id") == F.col("b.user_id"))
            & (F.col("a.event_type") < F.col("b.event_type")),
        )
        .groupBy(
            F.col("a.event_type").alias("type_a"), F.col("b.event_type").alias("type_b")
        )
        .agg(F.count(F.lit(1)).alias("n_both"))
    )
    sa = sizes.select(F.col("event_type").alias("type_a"), F.col("n_users").alias("n_a"))
    sb = sizes.select(F.col("event_type").alias("type_b"), F.col("n_users").alias("n_b"))
    out = inter.join(F.broadcast(sa), "type_a").join(F.broadcast(sb), "type_b")
    return out.select(
        "type_a",
        "type_b",
        "n_both",
        (F.col("n_both").cast("double") / F.lit(float(n_users))).alias("support"),
        (F.col("n_both").cast("double") / F.col("n_a").cast("double")).alias("conf_a_to_b"),
        (F.col("n_both").cast("double") / F.col("n_b").cast("double")).alias("conf_b_to_a"),
        (
            (F.col("n_both") * F.lit(n_users)).cast("double")
            / (F.col("n_a") * F.col("n_b")).cast("double")
        ).alias("lift"),
    )


ORACLE_BASKET_RULES = """
WITH aud AS (SELECT DISTINCT event_type, user_id FROM events),
nu AS (SELECT CAST(count(DISTINCT user_id) AS BIGINT) AS n_users FROM aud),
sizes AS (
  SELECT event_type, CAST(count(*) AS BIGINT) AS n FROM aud GROUP BY 1),
inter AS (
  SELECT a.event_type AS type_a, b.event_type AS type_b,
         CAST(count(*) AS BIGINT) AS n_both
  FROM aud a JOIN aud b
    ON a.user_id = b.user_id AND a.event_type < b.event_type
  GROUP BY 1, 2)
SELECT i.type_a, i.type_b, i.n_both,
       CAST(i.n_both AS DOUBLE) / CAST(nu.n_users AS DOUBLE) AS support,
       CAST(i.n_both AS DOUBLE) / CAST(sa.n AS DOUBLE) AS conf_a_to_b,
       CAST(i.n_both AS DOUBLE) / CAST(sb.n AS DOUBLE) AS conf_b_to_a,
       CAST(i.n_both * nu.n_users AS DOUBLE) / CAST(sa.n * sb.n AS DOUBLE) AS lift
FROM inter i
JOIN sizes sa ON i.type_a = sa.event_type
JOIN sizes sb ON i.type_b = sb.event_type
CROSS JOIN nu
"""

QUERIES_EXPERIMENTS["q_basket_rules"] = q_basket_rules
ORACLE_EXPERIMENTS["q_basket_rules"] = ORACLE_BASKET_RULES


# ---------------------------------------------------------------------------
# Streaming quantile serving view: q_quantile_sketch's mergeable
# histogram maintained by the streaming engine, closed with the same
# interpolation epilogue.
# ---------------------------------------------------------------------------


def q_stream_quantile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """p50/p90/p99 estimates whose ~100-bucket histogram state comes
    from a streaming aggregation (complete mode) instead of a batch
    groupBy — the serving-layer shape for "current latency quantiles"
    over an unbounded stream. Integer bucket counts are batching-
    invariant, so the BATCH histogram SQL is the oracle: any
    incremental-maintenance drift fails the hash. The interpolation
    windows run over the bounded bucket rollup (domain-bounded, same
    allowlist bound as q_quantile_sketch)."""
    from .streaming.windows import streaming_value_histogram

    hist = streaming_value_histogram(spark, sf_dir, _QS_WIDTH)
    tot = Window.partitionBy()
    prior = Window.orderBy("b").rowsBetween(Window.unboundedPreceding, -1)
    hist = hist.withColumn("n", F.sum("c").over(tot)).withColumn(
        "cum_prev", F.coalesce(F.sum("c").over(prior), F.lit(0))
    )
    ests = []
    for q in _QS_QUANTILES:
        t = F.lit(q) * F.col("n").cast("double")
        inside = (t - F.col("cum_prev").cast("double")) / F.col("c").cast("double")
        est = (F.col("b").cast("double") + inside) * F.lit(_QS_WIDTH)
        covering = (F.col("cum_prev").cast("double") < t) & (
            (F.col("cum_prev") + F.col("c")).cast("double") >= t
        )
        ests.append(F.max(F.when(covering, est)).alias(f"p{int(q * 100)}_stream"))
    return hist.agg(*ests)


# Tie-free frame: ORDER BY b, the grouped-by histogram bucket —
# unique per row, order is TOTAL.
ORACLE_STREAM_QUANTILE = f"""
WITH hist AS (
  SELECT CAST(floor(value / {_QS_WIDTH}) AS BIGINT) AS b, CAST(count(*) AS BIGINT) AS c
  FROM events GROUP BY 1),
cum AS (
  SELECT *, CAST(sum(c) OVER () AS BIGINT) AS n,
         CAST(coalesce(sum(c) OVER (ORDER BY b
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS cum_prev
  FROM hist)
SELECT
  {", ".join(
      f"max(CASE WHEN CAST(cum_prev AS DOUBLE) < CAST({q} AS DOUBLE) * CAST(n AS DOUBLE)"
      f" AND CAST(cum_prev + c AS DOUBLE) >= CAST({q} AS DOUBLE) * CAST(n AS DOUBLE)"
      f" THEN (CAST(b AS DOUBLE) + (CAST({q} AS DOUBLE) * CAST(n AS DOUBLE)"
      f" - CAST(cum_prev AS DOUBLE)) / CAST(c AS DOUBLE)) * {_QS_WIDTH} END)"
      f" AS p{int(q * 100)}_stream"
      for q in _QS_QUANTILES
  )}
FROM cum
"""

QUERIES_EXPERIMENTS["q_stream_quantile"] = q_stream_quantile
ORACLE_EXPERIMENTS["q_stream_quantile"] = ORACLE_STREAM_QUANTILE


# ---------------------------------------------------------------------------
# Per-group HLL: one 64-register sketch per event type
# ---------------------------------------------------------------------------


def q_hll_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q_hll_distinct per event type — the GROUP BY form of the
    mergeable distinct sketch (the shape of "distinct users per
    segment per day over 100 TB": one groupBy(max) whose state is
    64 longs PER GROUP, shards merging by element-wise max). Same
    engine-portable hashing and linear-counting correction as the
    global sketch; exact per-group distinct rides along to expose the
    error."""
    ev = _t(spark, sf_dir, "events")
    h = affine_hash(F.col("user_id"), F.lit(_HLL_SALT))
    w = F.floor(h / F.lit(_HLL_M)).cast("bigint")
    rho = F.when(w == 0, F.lit(26)).otherwise(
        F.lit(25) - F.floor(F.log2(w)).cast("bigint")
    )
    regs = (
        ev.select("event_type", (h % _HLL_M).alias("bucket"), rho.alias("rho"))
        .groupBy("event_type", "bucket")
        .agg(F.max("rho").alias("m_j"))
    )
    sk = regs.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_present"),
        F.sum(F.pow(F.lit(2.0), -F.col("m_j"))).alias("sum_present"),
    ).select(
        "event_type",
        (F.lit(_HLL_M) - F.col("n_present")).cast("bigint").alias("v_zero"),
        (
            F.col("sum_present")
            + (F.lit(_HLL_M) - F.col("n_present")).cast("double")
        ).alias("sum_inv"),
    )
    exact = ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("exact_distinct")
    )
    est_raw = F.lit(_HLL_ALPHA) * F.lit(float(_HLL_M * _HLL_M)) / F.col("sum_inv")
    return sk.join(F.broadcast(exact), "event_type").select(
        "event_type",
        "v_zero",
        "sum_inv",
        est_raw.alias("est_raw"),
        F.when(
            (est_raw <= F.lit(2.5 * _HLL_M)) & (F.col("v_zero") > 0),
            F.lit(float(_HLL_M))
            * F.log(F.lit(float(_HLL_M)) / F.col("v_zero").cast("double")),
        )
        .otherwise(est_raw)
        .alias("est_corrected"),
        "exact_distinct",
    )


ORACLE_HLL_GROUPS = f"""
WITH regs AS (
  SELECT event_type,
         ({affine_hash_sql('user_id', str(_HLL_SALT))}) % {_HLL_M} AS bucket,
         max(CASE WHEN CAST(floor(({affine_hash_sql('user_id', str(_HLL_SALT))}) / {_HLL_M}) AS BIGINT) = 0
                  THEN 26
                  ELSE 25 - CAST(floor(log2(CAST(floor(({affine_hash_sql('user_id', str(_HLL_SALT))}) / {_HLL_M}) AS BIGINT))) AS BIGINT)
             END) AS m_j
  FROM events GROUP BY 1, 2),
sk AS (
  SELECT event_type,
         CAST({_HLL_M} - count(*) AS BIGINT) AS v_zero,
         sum(pow(CAST(2.0 AS DOUBLE), -m_j)) + CAST({_HLL_M} - count(*) AS DOUBLE) AS sum_inv
  FROM regs GROUP BY event_type),
ex AS (
  SELECT event_type, CAST(count(DISTINCT user_id) AS BIGINT) AS exact_distinct
  FROM events GROUP BY event_type)
SELECT sk.event_type, v_zero, sum_inv,
       CAST({_HLL_ALPHA} AS DOUBLE) * CAST({_HLL_M * _HLL_M} AS DOUBLE) / sum_inv AS est_raw,
       CASE WHEN CAST({_HLL_ALPHA} AS DOUBLE) * CAST({_HLL_M * _HLL_M} AS DOUBLE) / sum_inv
                 <= CAST({2.5 * _HLL_M} AS DOUBLE) AND v_zero > 0
            THEN CAST({_HLL_M} AS DOUBLE) * ln(CAST({_HLL_M} AS DOUBLE) / CAST(v_zero AS DOUBLE))
            ELSE CAST({_HLL_ALPHA} AS DOUBLE) * CAST({_HLL_M * _HLL_M} AS DOUBLE) / sum_inv
       END AS est_corrected,
       exact_distinct
FROM sk JOIN ex ON ex.event_type = sk.event_type
"""

QUERIES_EXPERIMENTS["q_hll_groups"] = q_hll_groups
ORACLE_EXPERIMENTS["q_hll_groups"] = ORACLE_HLL_GROUPS


# ---------------------------------------------------------------------------
# Sequential A/B monitoring: calendar-day cumulative z statistic against
# an O'Brien-Fleming-shaped boundary (group-sequential testing — the
# "peek every day without inflating alpha" readout). Arm populations are
# fixed (hash assignment); information accrues as conversions ARRIVE: on
# each calendar day the monitor sees every user's first high-value
# purchase to date. Information fraction = conversions so far / total
# conversions (the binary-outcome accrual approximation, stated so the
# oracle replays it exactly).
# ---------------------------------------------------------------------------

_SEQ_C = 2.25  # OBF shape constant, exact binary (9/4)


def q_sequential_ab(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Group-sequential experiment monitor: for every calendar day, the
    pooled two-proportion z over conversions ACCRUED so far (a user
    converts on the day of their first high-value purchase) vs the
    O'Brien-Fleming-shaped boundary C/sqrt(information fraction).
    One per-user collapse (the only row-scale shuffle), a per-day
    conversion rollup left-joined onto the distinct-day calendar,
    cumulative window over that bounded day-domain relation
    (allowlisted), arm totals as a 1-row broadcast. Days before the
    first conversion, and days where EVERY enrolled user has converted,
    are excluded (pp = 0 or pp = 1 makes se = 0: no z). Integer counts
    throughout; divisions and sqrt written identically in both
    engines."""
    ev = _t(spark, sf_dir, "events")
    hv = (F.col("event_type") == "purchase") & (F.col("value") > 150.0)
    day = F.to_date(F.col("ts").cast("timestamp"))
    per_user = ev.groupBy("user_id").agg(
        F.min(F.when(hv, day)).alias("conv_day")
    )
    in_a = affine_hash(F.col("user_id"), F.lit(_AB_SALT)) % 2 == 0
    tagged = per_user.select(in_a.alias("in_a"), "conv_day")
    conv = (
        tagged.where(F.col("conv_day").isNotNull())
        .groupBy(F.col("conv_day").alias("day"))
        .agg(
            F.sum(F.when(F.col("in_a"), 1).otherwise(0)).alias("d_c_a"),
            F.sum(F.when(~F.col("in_a"), 1).otherwise(0)).alias("d_c_b"),
        )
    )
    cal = ev.select(day.alias("day")).distinct()
    joined = cal.join(conv, "day", "left").select(
        "day",
        F.coalesce("d_c_a", F.lit(0)).alias("d_c_a"),
        F.coalesce("d_c_b", F.lit(0)).alias("d_c_b"),
    )
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    cum = joined.select(
        "day",
        F.sum("d_c_a").over(w).alias("c_a"),
        F.sum("d_c_b").over(w).alias("c_b"),
    )
    tot = tagged.agg(
        F.sum(F.when(F.col("in_a"), 1).otherwise(0)).alias("n_a"),
        F.sum(F.when(~F.col("in_a"), 1).otherwise(0)).alias("n_b"),
        F.sum(F.when(F.col("conv_day").isNotNull(), 1).otherwise(0)).alias("tot_c"),
    )
    j = cum.crossJoin(F.broadcast(tot))
    pa = F.col("c_a").cast("double") / F.col("n_a").cast("double")
    pb = F.col("c_b").cast("double") / F.col("n_b").cast("double")
    pp = (F.col("c_a") + F.col("c_b")).cast("double") / (
        F.col("n_a") + F.col("n_b")
    ).cast("double")
    se = F.sqrt(
        pp
        * (F.lit(1.0) - pp)
        * (
            F.lit(1.0) / F.col("n_a").cast("double")
            + F.lit(1.0) / F.col("n_b").cast("double")
        )
    )
    frac = (F.col("c_a") + F.col("c_b")).cast("double") / F.col("tot_c").cast("double")
    z = (pa - pb) / se
    boundary = F.lit(_SEQ_C) / F.sqrt(frac)
    # pp = 0 (no conversions yet) AND pp = 1 (every enrolled user
    # converted) both make se = 0: exclude both ends so z never divides
    # by zero — engines disagree on 0/0 double semantics (NULL vs NaN).
    return j.where(
        (F.col("c_a") + F.col("c_b") > 0)
        & (F.col("c_a") + F.col("c_b") < F.col("n_a") + F.col("n_b"))
    ).select(
        "day",
        "n_a",
        "n_b",
        "c_a",
        "c_b",
        z.alias("z_stat"),
        boundary.alias("boundary"),
        (F.abs(z) > boundary).cast("int").alias("crossed"),
    )


ORACLE_SEQUENTIAL_AB = f"""
WITH per_user AS (
  SELECT user_id,
         min(CASE WHEN event_type = 'purchase' AND value > 150.0
                  THEN CAST(ts AS DATE) END) AS conv_day
  FROM events GROUP BY user_id),
tagged AS (
  SELECT ({affine_hash_sql('user_id', str(_AB_SALT))}) % 2 = 0 AS in_a, conv_day
  FROM per_user),
conv AS (
  SELECT conv_day AS day,
         sum(CASE WHEN in_a THEN 1 ELSE 0 END) AS d_c_a,
         sum(CASE WHEN NOT in_a THEN 1 ELSE 0 END) AS d_c_b
  FROM tagged WHERE conv_day IS NOT NULL GROUP BY conv_day),
cal AS (SELECT DISTINCT CAST(ts AS DATE) AS day FROM events),
joined AS (
  SELECT cal.day, coalesce(d_c_a, 0) AS d_c_a, coalesce(d_c_b, 0) AS d_c_b
  FROM cal LEFT JOIN conv ON conv.day = cal.day),
cum AS (
  SELECT day,
         CAST(sum(d_c_a) OVER w AS BIGINT) AS c_a,
         CAST(sum(d_c_b) OVER w AS BIGINT) AS c_b
  FROM joined
  WINDOW w AS (ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
tot AS (
  SELECT CAST(sum(CASE WHEN in_a THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
         CAST(sum(CASE WHEN NOT in_a THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
         CAST(sum(CASE WHEN conv_day IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS tot_c
  FROM tagged)
SELECT day, n_a, n_b, c_a, c_b,
       (CAST(c_a AS DOUBLE) / CAST(n_a AS DOUBLE)
        - CAST(c_b AS DOUBLE) / CAST(n_b AS DOUBLE))
       / sqrt((CAST(c_a + c_b AS DOUBLE) / CAST(n_a + n_b AS DOUBLE))
              * (1.0 - CAST(c_a + c_b AS DOUBLE) / CAST(n_a + n_b AS DOUBLE))
              * (1.0 / CAST(n_a AS DOUBLE) + 1.0 / CAST(n_b AS DOUBLE))) AS z_stat,
       CAST({_SEQ_C} AS DOUBLE)
         / sqrt(CAST(c_a + c_b AS DOUBLE) / CAST(tot_c AS DOUBLE)) AS boundary,
       CAST(CASE WHEN abs(
            (CAST(c_a AS DOUBLE) / CAST(n_a AS DOUBLE)
             - CAST(c_b AS DOUBLE) / CAST(n_b AS DOUBLE))
            / sqrt((CAST(c_a + c_b AS DOUBLE) / CAST(n_a + n_b AS DOUBLE))
                   * (1.0 - CAST(c_a + c_b AS DOUBLE) / CAST(n_a + n_b AS DOUBLE))
                   * (1.0 / CAST(n_a AS DOUBLE) + 1.0 / CAST(n_b AS DOUBLE))))
          > CAST({_SEQ_C} AS DOUBLE)
            / sqrt(CAST(c_a + c_b AS DOUBLE) / CAST(tot_c AS DOUBLE))
        THEN 1 ELSE 0 END AS INT) AS crossed
FROM cum CROSS JOIN tot
WHERE c_a + c_b > 0 AND c_a + c_b < n_a + n_b
"""

QUERIES_EXPERIMENTS["q_sequential_ab"] = q_sequential_ab
ORACLE_EXPERIMENTS["q_sequential_ab"] = ORACLE_SEQUENTIAL_AB


# ---------------------------------------------------------------------------
# Tabular-ML feature preparation (r8): smoothed target encoding + the
# hashing trick — the two classical leakage-prone feature transforms a
# training-data platform has to compute AT SCALE with exact arithmetic.
# ---------------------------------------------------------------------------

_TE_SMOOTH = 20  # pseudo-count m in (sum + m*prior) / (n + m)


def q_target_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Smoothed target encoding of the supplier key's mod-25 band
    (a high-cardinality-category stand-in) against the binary target
    "line item was returned" (l_returnflag = 'R'): enc = (n_pos +
    m·prior) / (n + m) with pseudo-count m=20 — the empirical-Bayes
    shrinkage that keeps rare categories from memorizing the label.

    Exactness: n/n_pos are integer counts, the prior is one exact
    integer ratio, and the encoding is single IEEE double ops on those
    exact inputs — bit-reproducible under any shuffle order. Scale
    shape: ONE partial-agg groupBy over the (few) categories plus a
    1-row broadcast prior; the fact table never shuffles."""
    li = _t(spark, sf_dir, "lineitem").withColumn(
        "supp_band", (F.col("l_suppkey") % 25).cast("int")
    )
    flag = F.when(F.col("l_returnflag") == "R", 1).otherwise(0)
    g = li.groupBy("supp_band").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(flag).cast("bigint").alias("n_pos"),
    )
    tot = li.agg(
        F.count(F.lit(1)).alias("_gn"),
        F.sum(flag).cast("bigint").alias("_gpos"),
    )
    prior = F.col("_gpos").cast("double") / F.col("_gn").cast("double")
    enc = (F.col("n_pos").cast("double") + F.lit(float(_TE_SMOOTH)) * prior) / (
        F.col("n").cast("double") + F.lit(float(_TE_SMOOTH))
    )
    return (
        g.crossJoin(F.broadcast(tot))
        .select(
            "supp_band",
            "n",
            "n_pos",
            F.round(enc, 6).alias("target_enc"),
        )
    )


ORACLE_TARGET_ENCODE = f"""
WITH li AS (SELECT *, CAST(l_suppkey % 25 AS INT) AS supp_band FROM lineitem),
g AS (
  SELECT supp_band, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS BIGINT) AS n_pos
  FROM li GROUP BY supp_band),
tot AS (
  SELECT CAST(count(*) AS BIGINT) AS gn,
         CAST(sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS BIGINT) AS gpos
  FROM li)
SELECT supp_band, n, n_pos,
       round((CAST(n_pos AS DOUBLE) + {float(_TE_SMOOTH)!r} * (CAST(gpos AS DOUBLE) / CAST(gn AS DOUBLE)))
             / (CAST(n AS DOUBLE) + {float(_TE_SMOOTH)!r}), 6) AS target_enc
FROM g CROSS JOIN tot
"""

QUERIES_EXPERIMENTS["q_target_encode"] = q_target_encode
ORACLE_EXPERIMENTS["q_target_encode"] = ORACLE_TARGET_ENCODE


_FH_BUCKETS = 256


def q_feature_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hashing-trick vectorization audit: every token maps to
    char_hash(token) mod 256 (the fixed-width feature space of
    Weinberger et al. 2009), published as the per-bucket manifest
    (total occurrences, docs touched, distinct tokens — the collision
    profile that decides whether 2^k buckets suffice). Map-side
    explode + ONE partial-agg groupBy over a bounded 256-row domain;
    exact distinct counts stay per-bucket (bounded fan-in)."""
    from .functions.hashing import char_hash

    d = _t(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id", F.explode(F.expr("filter(split(text, ' '), t -> t <> '')")).alias("tok")
    )
    b = toks.withColumn("bucket", char_hash(F.col("tok")) % _FH_BUCKETS)
    return (
        b.groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_occurrences"),
            F.count_distinct("doc_id").alias("n_docs"),
            F.count_distinct("tok").alias("n_distinct_tokens"),
        )
        .select(
            F.col("bucket").cast("int").alias("bucket"),
            "n_occurrences", "n_docs", "n_distinct_tokens",
        )
    )


def _feature_hash_oracle() -> str:
    from .functions.hashing import char_hash_sql

    return f"""
WITH toks AS (
  SELECT doc_id, unnest(list_filter(string_split(text, ' '), t -> t <> '')) AS tok
  FROM documents),
b AS (SELECT doc_id, tok, ({char_hash_sql('tok')}) % {_FH_BUCKETS} AS bucket FROM toks)
SELECT CAST(bucket AS INT) AS bucket,
       CAST(count(*) AS BIGINT) AS n_occurrences,
       CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
       CAST(count(DISTINCT tok) AS BIGINT) AS n_distinct_tokens
FROM b GROUP BY bucket
"""


QUERIES_EXPERIMENTS["q_feature_hash"] = q_feature_hash
ORACLE_EXPERIMENTS["q_feature_hash"] = _feature_hash_oracle()
