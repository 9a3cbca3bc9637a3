"""Corpus-quality and robust-statistics queries — the model-based
filtering and robust-profiling passes a pretraining data pipeline runs
after the heuristic filters in ``operators/text.py`` / ``llm_prep.py``:

- bigram LM quality scoring (the engine-portable analog of CCNet's
  KenLM perplexity filter — no ``ln()``, so the DuckDB oracle is
  bit-identical; see ``operators/text.tfidf_topk`` for the rule),
- vocabulary coverage / OOV rate (tokenizer-fit diagnostics),
- weighted systematic sampling (deterministic, integer threshold
  crossing — the rand()-free counterpart of A-ES weighted reservoirs),
- IQR and MAD outlier profiling (robust fences on quantized values so
  interpolated quantiles stay exact cross-engine),
- top user paths (sequence mining over the event stream),
- Cramér's V effect size (closing the chi-square analysis loop),
- Pareto-frontier skyline, last-touch attribution, Benford audit,
- BPE merge-pair counting + apply (see ``operators/bpe.py`` for the
  full iterative trainer), held-out backoff LM scoring, and
  per-source percent-rank quantile normalization.

Exactness rules shared with the rest of the repo: integer/rational
arithmetic wherever a sum crosses a shuffle (order-free), single
IEEE ops for any double epilogue, and the PageRank 2^20 floor
quantization for per-term double contributions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .functions.hashing import affine_hash, affine_hash_sql, char_hash, char_hash_sql
from .operators import rank as rk
from .operators.text import tokens_col
from .queries import _t

_Q = 1 << 20  # term quantizer (the PageRank / chi-square trick)

# ---------------------------------------------------------------------------
# Bigram LM quality score (CCNet-style model filter, log-free)
# ---------------------------------------------------------------------------


def q_lm_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document bigram language-model score: the average corpus
    conditional probability p(w2|w1) = c(w1,w2)/c(w1,·) over the doc's
    bigrams — high for documents whose word transitions look like the
    corpus, low for shuffled/boilerplate text. This is the quality
    signal CCNet gets from KenLM perplexity, re-expressed log-free so
    the oracle parity is exact: each term is ONE integer-ratio IEEE
    division, floor-quantized at 2^20 and summed as integers (shuffle-
    order-free), with a single pinned double division at the end.

    Scale: the bigram stream is derived in codegen (sequence+transform
    over the token array, no window, no shuffle) and aggregated in ONE
    pass to per-doc terms (doc_id,w1,w2,m); the corpus counts c(w1,w2)
    and c(w1,·) are then re-sums OF that compact relation (sum of m over
    doc, then over w2), so the raw occurrence stream is scanned exactly
    once and the localCheckpoint that feeds the three consumers holds
    distinct-bigrams-per-doc rows, not occurrences — strictly less
    storage and shuffle than checkpointing the occurrence stream itself
    (which an earlier revision did; exact agreement test kept).
    """
    return lm_score_docs(_t(spark, sf_dir, "documents"))


def lm_score_docs(docs_df: DataFrame) -> DataFrame:
    """DataFrame-parameterized core of :func:`q_lm_score` (probe-able
    on inflated corpora)."""
    docs = (
        docs_df
        .select("doc_id", tokens_col("text").alias("toks"))
        .where(F.size("toks") >= 2)
    )
    bg = docs.selectExpr(
        "doc_id",
        "explode(transform(sequence(1, size(toks) - 1),"
        " i -> struct(toks[i-1] AS w1, toks[i] AS w2))) AS b",
    ).select("doc_id", "b.w1", "b.w2")
    # one occurrence-stream pass; the compact per-doc term relation is
    # materialized (gapfill localCheckpoint precedent, timeseries.py)
    # because the corpus counts AND the final join both consume it
    dterm = (
        bg.groupBy("doc_id", "w1", "w2")
        .agg(F.count(F.lit(1)).alias("m"))
        .localCheckpoint(eager=True)
    )
    c12 = dterm.groupBy("w1", "w2").agg(F.sum("m").alias("c12"))
    c1 = c12.groupBy("w1").agg(F.sum("c12").alias("c1"))
    prob = c12.join(c1, "w1").select(
        "w1",
        "w2",
        F.floor(
            (F.col("c12").cast("double") / F.col("c1").cast("double")) * F.lit(_Q)
        ).alias("tq"),
    )
    return (
        dterm.join(prob, ["w1", "w2"])
        .groupBy("doc_id")
        .agg(
            F.sum("m").alias("n_bigrams"),
            (
                F.sum(F.col("m") * F.col("tq")).cast("double")
                / (F.sum("m").cast("double") * F.lit(float(_Q)))
            ).alias("lm_score"),
        )
    )


ORACLE_LM_SCORE = f"""
WITH t AS (
  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS toks
  FROM documents),
bg AS (
  SELECT doc_id,
         unnest(list_transform(range(1, len(toks)),
                               i -> {{'w1': toks[i], 'w2': toks[i+1]}})) AS b
  FROM t WHERE len(toks) >= 2),
pairs AS (SELECT doc_id, b.w1 AS w1, b.w2 AS w2 FROM bg),
c12 AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS c12 FROM pairs GROUP BY 1, 2),
c1 AS (SELECT w1, CAST(count(*) AS BIGINT) AS c1 FROM pairs GROUP BY 1),
prob AS (
  SELECT w1, w2,
         CAST(floor((CAST(c12 AS DOUBLE) / CAST(c1 AS DOUBLE)) * {_Q}) AS BIGINT) AS tq
  FROM c12 JOIN c1 USING (w1)),
dterm AS (
  SELECT doc_id, w1, w2, CAST(count(*) AS BIGINT) AS m FROM pairs GROUP BY 1, 2, 3)
SELECT doc_id,
       CAST(sum(m) AS BIGINT) AS n_bigrams,
       CAST(sum(m * tq) AS DOUBLE) / (CAST(sum(m) AS DOUBLE) * {float(_Q)}) AS lm_score
FROM dterm JOIN prob USING (w1, w2)
GROUP BY doc_id
"""

# ---------------------------------------------------------------------------
# Vocabulary coverage / OOV rate
# ---------------------------------------------------------------------------

_VOCAB_K = 100


def q_oov_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Out-of-vocabulary rate per language against the corpus top-100
    token vocabulary — the coverage diagnostic run before fixing a
    tokenizer vocab size. The vocabulary is total-ordered (count desc,
    term asc) so the top-k boundary is deterministic; membership is a
    broadcast left join; the per-lang rollup is one partial agg. At
    100 TB the token stream never shuffles for the membership test —
    only the tiny vocab moves."""
    toks = _t(spark, sf_dir, "documents").select(
        "lang", F.explode(tokens_col("text")).alias("term")
    )
    vocab = (
        toks.groupBy("term")
        .agg(F.count(F.lit(1)).alias("n_occ"))
        .orderBy(F.col("n_occ").desc(), F.col("term").asc())
        .limit(_VOCAB_K)
        .select("term", F.lit(1).alias("in_vocab"))
    )
    return (
        toks.join(F.broadcast(vocab), "term", "left")
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.count(F.when(F.col("in_vocab").isNull(), 1)).alias("n_oov"),
        )
        .withColumn(
            "oov_rate", F.col("n_oov").cast("double") / F.col("n_tokens").cast("double")
        )
    )


ORACLE_OOV_RATE = f"""
WITH toks AS (
  SELECT lang, unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS term
  FROM documents),
vocab AS (
  SELECT term FROM (
    SELECT term, count(*) AS n_occ FROM toks GROUP BY term
    ORDER BY n_occ DESC, term ASC LIMIT {_VOCAB_K})),
flagged AS (
  SELECT t.lang, CASE WHEN v.term IS NULL THEN 1 END AS oov
  FROM toks t LEFT JOIN vocab v USING (term))
SELECT lang,
       CAST(count(*) AS BIGINT) AS n_tokens,
       CAST(count(oov) AS BIGINT) AS n_oov,
       CAST(count(oov) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS oov_rate
FROM flagged GROUP BY lang
"""

# ---------------------------------------------------------------------------
# Weighted systematic sampling (deterministic, integer thresholds)
# ---------------------------------------------------------------------------

_WS_N = 10  # target samples per stratum
_WS_SALT = 11


def q_sample_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Size-weighted systematic sample: per language, order documents
    by the portable affine hash (a deterministic shuffle), take the
    running sum of weights (n_chars), and keep each document as many
    times as the count of thresholds j·total/n it crosses — computed
    entirely in BIGINT as floor((cum·n)/total) − floor(((cum−w)·n)/total),
    so there is no rand(), no float, and any engine replays it exactly.
    Heavy documents (w > total/n) legitimately get n_copies ≥ 2, as in
    classic PPS systematic sampling.

    Scale: the per-stratum running sum is the DISTRIBUTED grouped
    cumsum (operators/rank.grouped_cumsum): hash-order quantile
    buckets, one window partitioned by (bucket, lang), literal
    carry-ins — a handful of giant strata no longer serialize into
    one sort task each; the stratum totals ride along as literals."""
    d = (
        _t(spark, sf_dir, "documents")
        .select("doc_id", "lang", F.col("n_chars").alias("w"))
        .withColumn("h", affine_hash(F.col("doc_id"), F.lit(_WS_SALT)))
    )
    d = rk.grouped_cumsum(
        d,
        ["lang"],
        [("h", True), ("doc_id", True)],
        "w",
        out="cum",
        total_out="total",
    )
    d = d.withColumn(
        "n_copies",
        F.expr(f"(cum * {_WS_N}) div total - ((cum - w) * {_WS_N}) div total"),
    )
    return d.where(F.col("n_copies") >= 1).select("doc_id", "lang", "w", "n_copies")


ORACLE_SAMPLE_WEIGHTED = f"""
WITH d AS (
  SELECT doc_id, lang, n_chars AS w,
         {affine_hash_sql('doc_id', str(_WS_SALT))} AS h
  FROM documents),
c AS (
  SELECT doc_id, lang, w,
         sum(w) OVER (PARTITION BY lang ORDER BY h, doc_id
                      ROWS UNBOUNDED PRECEDING) AS cum,
         sum(w) OVER (PARTITION BY lang) AS total
  FROM d)
SELECT doc_id, lang, CAST(w AS BIGINT) AS w,
       CAST((cum * {_WS_N}) // total - ((cum - w) * {_WS_N}) // total AS BIGINT)
         AS n_copies
FROM c
WHERE (cum * {_WS_N}) // total - ((cum - w) * {_WS_N}) // total >= 1
"""

# ---------------------------------------------------------------------------
# IQR outlier profiling (quantized values so quantiles are exact)
# ---------------------------------------------------------------------------


def q_iqr_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tukey-fence outlier profile per event type. Values are floor-
    quantized to integer milli-units FIRST, so the interpolated Q1/Q3
    land on exact binary fractions and Spark's ``(1−g)a + gb`` and
    DuckDB's ``a + (b−a)g`` interpolation orders produce the identical
    double (raw continuous doubles would differ in the last ULP between
    the two formulas). Fences use 1.5·IQR with g ∈ {0.25, 0.75}, all
    exact. Q1/Q3 ride the DISTRIBUTED per-group percentile
    (operators/rank.grouped_percentiles) — the ``percentile()`` agg
    it replaces collected each event type's values into one task, the
    measured q_winsorize 100 TB lesson — then a broadcast join +
    counting pass over the fact."""
    ev = _t(spark, sf_dir, "events").withColumn(
        "vq", F.floor(F.col("value") * F.lit(1000.0)).cast("bigint")
    )
    b = rk.literal_frame(
        rk.grouped_percentiles(
            ev, "event_type", "vq", [0.25, 0.75], tiebreak="event_id"
        ).select(
            "event_type",
            F.col("p_0_25").alias("q1_milli"),
            F.col("p_0_75").alias("q3_milli"),
        )
    )
    j = ev.join(F.broadcast(b), "event_type")
    iqr = F.col("q3_milli") - F.col("q1_milli")
    lo = F.col("q1_milli") - F.lit(1.5) * iqr
    hi = F.col("q3_milli") + F.lit(1.5) * iqr
    return j.groupBy("event_type", "q1_milli", "q3_milli").agg(
        F.count(F.when((F.col("vq") < lo) | (F.col("vq") > hi), 1)).alias("n_outliers"),
        F.count(F.lit(1)).alias("n_total"),
    )


ORACLE_IQR_OUTLIERS = """
WITH ev AS (
  SELECT event_type, CAST(floor(value * 1000.0) AS BIGINT) AS vq FROM events),
b AS (
  SELECT event_type,
         quantile_cont(vq, 0.25) AS q1_milli,
         quantile_cont(vq, 0.75) AS q3_milli
  FROM ev GROUP BY event_type)
SELECT ev.event_type, q1_milli, q3_milli,
       CAST(count(CASE WHEN vq < q1_milli - 1.5 * (q3_milli - q1_milli)
                         OR vq > q3_milli + 1.5 * (q3_milli - q1_milli)
                  THEN 1 END) AS BIGINT) AS n_outliers,
       CAST(count(*) AS BIGINT) AS n_total
FROM ev JOIN b USING (event_type)
GROUP BY ev.event_type, q1_milli, q3_milli
"""

# ---------------------------------------------------------------------------
# MAD robust outliers (median absolute deviation)
# ---------------------------------------------------------------------------

_MAD_K = 3.0 * 1.4826  # 3-sigma equivalent under normality


def q_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust z-score outliers: |v − median| > 3·1.4826·MAD, on milli-
    quantized values (medians of integers / half-integers interpolate
    exactly — same rationale as q_iqr_outliers). The MAD tolerates up
    to 50% contamination where stddev-based fences break. Both medians
    ride the DISTRIBUTED per-group percentile
    (operators/rank.grouped_percentiles — the ``percentile()`` aggs
    they replace collected each event type into one task, the measured
    q_winsorize 100 TB lesson), each joined back by broadcast, then
    the counting scan."""
    ev = _t(spark, sf_dir, "events").withColumn(
        "vq", F.floor(F.col("value") * F.lit(1000.0)).cast("bigint")
    )
    med = rk.literal_frame(
        rk.grouped_percentiles(
            ev, "event_type", "vq", [0.5], tiebreak="event_id"
        ).select("event_type", F.col("p_0_5").alias("med"))
    )
    dev = ev.join(F.broadcast(med), "event_type").withColumn(
        "dev", F.abs(F.col("vq") - F.col("med"))
    )
    mad = rk.literal_frame(
        rk.grouped_percentiles(
            dev, "event_type", "dev", [0.5], tiebreak="event_id"
        ).select("event_type", F.col("p_0_5").alias("mad"))
    )
    j = dev.join(F.broadcast(mad), "event_type")
    return j.groupBy("event_type", "med", "mad").agg(
        F.count(F.when(F.col("dev") > F.lit(_MAD_K) * F.col("mad"), 1)).alias(
            "n_outliers"
        ),
        F.count(F.lit(1)).alias("n_total"),
    )


ORACLE_MAD_OUTLIERS = f"""
WITH ev AS (
  SELECT event_type, CAST(floor(value * 1000.0) AS BIGINT) AS vq FROM events),
med AS (
  SELECT event_type, quantile_cont(vq, 0.5) AS med FROM ev GROUP BY event_type),
dev AS (
  SELECT ev.event_type, med, abs(vq - med) AS dev FROM ev JOIN med USING (event_type)),
mad AS (
  SELECT event_type, med, quantile_cont(dev, 0.5) AS mad
  FROM dev GROUP BY event_type, med)
SELECT dev.event_type, dev.med, mad,
       CAST(count(CASE WHEN dev > {_MAD_K} * mad THEN 1 END) AS BIGINT) AS n_outliers,
       CAST(count(*) AS BIGINT) AS n_total
FROM dev JOIN (SELECT event_type, mad FROM mad) m USING (event_type)
GROUP BY dev.event_type, dev.med, mad
"""

# ---------------------------------------------------------------------------
# Top user paths (sequence mining)
# ---------------------------------------------------------------------------

_PATH_LEN = 5


def q_top_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 most common user journeys: each user's first 5 events
    (ordered by ts with event_id tiebreak — total order, so the path
    string is deterministic) joined into a '>' path, counted, top-10
    with a path-string tiebreak. One window pass keyed on user, one
    partial-agg rollup on path, a TakeOrdered top-k — the user frame
    is the only shuffled state."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    r = ev.withColumn("rn", F.row_number().over(w)).where(F.col("rn") <= _PATH_LEN)
    paths = r.groupBy("user_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("rn", "event_type"))),
                lambda s: s["event_type"],
            ),
            ">",
        ).alias("path")
    )
    return (
        paths.groupBy("path")
        .agg(F.count(F.lit(1)).alias("n_users"))
        .orderBy(F.col("n_users").desc(), F.col("path").asc())
        .limit(10)
    )


ORACLE_TOP_PATHS = f"""
WITH r AS (
  SELECT user_id, event_type,
         row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
  FROM events),
p AS (
  SELECT user_id, string_agg(event_type, '>' ORDER BY rn) AS path
  FROM r WHERE rn <= {_PATH_LEN} GROUP BY user_id)
SELECT path, CAST(count(*) AS BIGINT) AS n_users
FROM p GROUP BY path
ORDER BY n_users DESC, path ASC LIMIT 10
"""

# ---------------------------------------------------------------------------
# Cramér's V (effect size for the chi-square independence test)
# ---------------------------------------------------------------------------


def q_cramers_v(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cramér's V = sqrt(χ² / (n·(min(r,c)−1))) for event_type vs
    day-of-week — the effect size that makes q_chi_square's statistic
    comparable across table shapes. χ² reuses the exact-rational
    2^20-quantized term sum (shuffle-order-free); r and c come from the
    same cells rollup (one Expand for the two distincts); the epilogue
    is one division and one IEEE sqrt — both single deterministic ops.
    n is a driver-side count collapsed to a literal (the chi-square
    precedent), keeping the plan join-free."""
    ev = _t(spark, sf_dir, "events")
    n = ev.count()
    cells = ev.groupBy(
        "event_type", F.dayofweek(F.col("ts").cast("timestamp")).alias("dow")
    ).agg(F.count(F.lit(1)).alias("o"))
    rows = cells.groupBy("event_type").agg(F.sum("o").alias("r"))
    cols = cells.groupBy("dow").agg(F.sum("o").alias("c"))
    num = F.col("o") * F.lit(n) - F.col("r") * F.col("c")
    term = (num * num).cast("double") / (F.lit(n) * F.col("r") * F.col("c")).cast(
        "double"
    )
    q = (
        cells.join(F.broadcast(rows), "event_type")
        .join(F.broadcast(cols), "dow")
        .select(
            F.floor(term * F.lit(_Q)).alias("tq"),
            "event_type",
            "dow",
        )
    )
    agg = q.agg(
        (F.sum("tq").cast("double") / F.lit(_Q)).alias("chi2"),
        F.countDistinct("event_type").alias("r_cnt"),
        F.countDistinct("dow").alias("c_cnt"),
    )
    return agg.select(
        "chi2",
        F.lit(n).alias("n"),
        (F.least("r_cnt", "c_cnt") - F.lit(1)).alias("dof_min"),
        F.sqrt(
            F.col("chi2")
            / (F.lit(n) * (F.least("r_cnt", "c_cnt") - F.lit(1))).cast("double")
        ).alias("cramers_v"),
    )


ORACLE_CRAMERS_V = f"""
WITH cells AS (
  SELECT event_type, dayofweek(ts) + 1 AS dow, CAST(COUNT(*) AS BIGINT) AS o
  FROM events GROUP BY 1, 2),
r AS (SELECT event_type, CAST(SUM(o) AS BIGINT) AS r FROM cells GROUP BY event_type),
c AS (SELECT dow, CAST(SUM(o) AS BIGINT) AS c FROM cells GROUP BY dow),
n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM events),
terms AS (
  SELECT CAST(floor(
           (CAST((o * n.n - r.r * c.c) * (o * n.n - r.r * c.c) AS DOUBLE)
            / CAST(n.n * r.r * c.c AS DOUBLE)) * {_Q}) AS BIGINT) AS tq,
         cells.event_type, cells.dow
  FROM cells JOIN r USING (event_type) JOIN c USING (dow) CROSS JOIN n),
agg AS (
  SELECT CAST(SUM(tq) AS DOUBLE) / {_Q} AS chi2,
         CAST(COUNT(DISTINCT event_type) AS BIGINT) AS r_cnt,
         CAST(COUNT(DISTINCT dow) AS BIGINT) AS c_cnt
  FROM terms)
SELECT chi2, n.n AS n,
       CAST(least(r_cnt, c_cnt) - 1 AS BIGINT) AS dof_min,
       sqrt(chi2 / CAST(n.n * (least(r_cnt, c_cnt) - 1) AS DOUBLE)) AS cramers_v
FROM agg CROSS JOIN n
"""

QUERIES_QUALITY = {
    "q_lm_score": q_lm_score,
    "q_oov_rate": q_oov_rate,
    "q_sample_weighted": q_sample_weighted,
    "q_iqr_outliers": q_iqr_outliers,
    "q_mad_outliers": q_mad_outliers,
    "q_top_paths": q_top_paths,
    "q_cramers_v": q_cramers_v,
}

ORACLE_QUALITY = {
    "q_lm_score": ORACLE_LM_SCORE,
    "q_oov_rate": ORACLE_OOV_RATE,
    "q_sample_weighted": ORACLE_SAMPLE_WEIGHTED,
    "q_iqr_outliers": ORACLE_IQR_OUTLIERS,
    "q_mad_outliers": ORACLE_MAD_OUTLIERS,
    "q_top_paths": ORACLE_TOP_PATHS,
    "q_cramers_v": ORACLE_CRAMERS_V,
}

# ---------------------------------------------------------------------------
# Pareto frontier (skyline query)
# ---------------------------------------------------------------------------


def q_pareto_frontier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-brand Pareto frontier of (minimize retail price, maximize
    size): a part is on the skyline iff no other part of the brand is
    both cheaper-or-equal and larger-or-equal (with one strict). The
    classic O(n log n) sweep: sort by (price asc, size desc) and keep a
    row iff its size strictly exceeds the running max over all STRICTLY
    preceding rows — equal-(price,size) duplicates resolve to the
    first by partkey, making the kept set total-ordered and engine-
    deterministic. One window pass per brand (brands parallelize the
    sort); no self-join, no quadratic dominance check."""
    p = _t(spark, sf_dir, "part")
    w = (
        Window.partitionBy("p_brand")
        .orderBy(F.col("p_retailprice").asc(), F.col("p_size").desc(), F.col("p_partkey").asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    flagged = p.withColumn("prev_max_size", F.max("p_size").over(w))
    return flagged.where(
        F.col("prev_max_size").isNull() | (F.col("p_size") > F.col("prev_max_size"))
    ).select("p_brand", "p_partkey", "p_retailprice", "p_size")


# Tie-free frame: ORDER BY (..., p_partkey ASC) — p_partkey is the
# unique part key, so the order is TOTAL within each brand.
ORACLE_PARETO_FRONTIER = """
WITH flagged AS (
  SELECT p_brand, p_partkey, p_retailprice, CAST(p_size AS INTEGER) AS p_size,
         max(p_size) OVER (PARTITION BY p_brand
                           ORDER BY p_retailprice ASC, p_size DESC, p_partkey ASC
                           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
           AS prev_max_size
  FROM part)
SELECT p_brand, p_partkey, p_retailprice, p_size
FROM flagged
WHERE prev_max_size IS NULL OR p_size > prev_max_size
"""

# ---------------------------------------------------------------------------
# Last-touch attribution
# ---------------------------------------------------------------------------

_TOUCHES = ("click", "view", "signup")


def q_attribution_last_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Marketing-style last-touch attribution: each purchase is
    credited to the user's most recent PRECEDING touch event (click/
    view/signup — errors and purchases never get credit); purchases
    with no prior touch credit 'direct'. One window pass per user
    (last-ignore-nulls over strictly preceding rows), then a partial-
    agg rollup per channel. Revenue is milli-quantized before the sum
    so the per-channel total is an integer — shuffle-order-free — with
    one pinned double division at the end."""
    return attribution_events(_t(spark, sf_dir, "events"))


def attribution_events(ev: DataFrame) -> DataFrame:
    """DataFrame-parameterized core of :func:`q_attribution_last_touch`."""
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    touch = F.when(F.col("event_type").isin(*_TOUCHES), F.col("event_type"))
    attributed = ev.withColumn(
        "channel", F.coalesce(F.last(touch, ignorenulls=True).over(w), F.lit("direct"))
    ).where(F.col("event_type") == "purchase")
    return attributed.groupBy("channel").agg(
        F.count(F.lit(1)).alias("n_purchases"),
        (
            F.sum(F.floor(F.col("value") * F.lit(1000.0)).cast("bigint")).cast("double")
            / F.lit(1000.0)
        ).alias("revenue"),
    )


_TOUCH_LIST = ", ".join(f"'{t}'" for t in _TOUCHES)

# Tie-free frame: ORDER BY (ts, event_id) — event_id is globally
# unique, so the order is TOTAL within each user partition.
ORACLE_ATTRIBUTION_LAST_TOUCH = f"""
WITH marked AS (
  SELECT user_id, event_type, value,
         last_value(CASE WHEN event_type IN ({_TOUCH_LIST}) THEN event_type END
                    IGNORE NULLS)
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prior_touch
  FROM events)
SELECT coalesce(prior_touch, 'direct') AS channel,
       CAST(count(*) AS BIGINT) AS n_purchases,
       CAST(sum(CAST(floor(value * 1000.0) AS BIGINT)) AS DOUBLE) / 1000.0 AS revenue
FROM marked
WHERE event_type = 'purchase'
GROUP BY coalesce(prior_touch, 'direct')
"""

# ---------------------------------------------------------------------------
# Benford first-digit profile
# ---------------------------------------------------------------------------

# Benford expectations inlined as shortest-roundtrip literals computed
# ONCE here — both engines parse the identical decimal text to the
# identical IEEE double, so no engine evaluates a transcendental.
import math as _math

_BENFORD = {d: repr(_math.log10(1.0 + 1.0 / d)) for d in range(1, 10)}


def q_benford(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law audit of the value column: the distribution of
    first significant digits vs the log expectation — a standard
    fabricated-data / unit-mix screen. The digit is extracted from the
    milli-quantized INTEGER (first char of its decimal string — no
    float log10 anywhere); expected shares are compile-time literals.
    One partial-agg groupBy to 9 rows, then a 9-row window for the
    total — nothing else moves."""
    ev = _t(spark, sf_dir, "events")
    digit = F.substring(
        F.floor(F.col("value") * F.lit(1000.0)).cast("bigint").cast("string"), 1, 1
    ).cast("int")
    counts = ev.groupBy(digit.alias("digit")).agg(F.count(F.lit(1)).alias("n"))
    total = F.sum("n").over(Window.partitionBy())
    expected = F.coalesce(
        *[F.when(F.col("digit") == d, F.lit(float(lit))) for d, lit in _BENFORD.items()]
    )
    return counts.select(
        "digit",
        "n",
        (F.col("n").cast("double") / total.cast("double")).alias("share"),
        expected.alias("benford_p"),
        F.abs(F.col("n").cast("double") / total.cast("double") - expected).alias(
            "abs_dev"
        ),
    )


_BENFORD_CASE = " ".join(f"WHEN digit = {d} THEN {lit}" for d, lit in _BENFORD.items())

ORACLE_BENFORD = f"""
WITH counts AS (
  SELECT CAST(substring(CAST(CAST(floor(value * 1000.0) AS BIGINT) AS VARCHAR), 1, 1)
              AS INTEGER) AS digit,
         CAST(count(*) AS BIGINT) AS n
  FROM events GROUP BY 1),
t AS (SELECT digit, n, sum(n) OVER () AS total FROM counts)
SELECT digit, n,
       CAST(n AS DOUBLE) / CAST(total AS DOUBLE) AS share,
       CAST((CASE {_BENFORD_CASE} END) AS DOUBLE) AS benford_p,
       abs(CAST(n AS DOUBLE) / CAST(total AS DOUBLE)
           - CAST((CASE {_BENFORD_CASE} END) AS DOUBLE)) AS abs_dev
FROM t
"""

QUERIES_QUALITY["q_pareto_frontier"] = q_pareto_frontier
QUERIES_QUALITY["q_attribution_last_touch"] = q_attribution_last_touch
QUERIES_QUALITY["q_benford"] = q_benford
ORACLE_QUALITY["q_pareto_frontier"] = ORACLE_PARETO_FRONTIER
ORACLE_QUALITY["q_attribution_last_touch"] = ORACLE_ATTRIBUTION_LAST_TOUCH
ORACLE_QUALITY["q_benford"] = ORACLE_BENFORD

# ---------------------------------------------------------------------------
# BPE merge-pair counting (the tokenizer-training unit step)
# ---------------------------------------------------------------------------


def q_bpe_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The counting step of one BPE training iteration: corpus-wide
    adjacent-CHARACTER-pair frequencies, weighted by word frequency —
    the top pair is what BPE would merge next. The scale-critical move
    is aggregating to the (word, count) vocabulary FIRST: pair
    explosion then runs over distinct words (≪ token occurrences), the
    standard trick that makes BPE training feasible on a 100 TB corpus.
    Two partial-agg shuffles and a TakeOrdered top-k; the pair stream
    is pure codegen (sequence+transform+substring, no UDF)."""
    toks = _t(spark, sf_dir, "documents").select(
        F.explode(tokens_col("text")).alias("word")
    )
    words = toks.groupBy("word").agg(F.count(F.lit(1)).alias("n"))
    pairs = words.where(F.length("word") >= 2).selectExpr(
        "n",
        "explode(transform(sequence(1, length(word) - 1),"
        " i -> struct(substring(word, i, 1) AS a, substring(word, i+1, 1) AS b))) AS p",
    )
    return (
        pairs.groupBy("p.a", "p.b")
        .agg(F.sum("n").alias("n_pairs"))
        .orderBy(F.col("n_pairs").desc(), F.col("a").asc(), F.col("b").asc())
        .limit(10)
    )


ORACLE_BPE_PAIRS = """
WITH toks AS (
  SELECT unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS word
  FROM documents),
words AS (SELECT word, CAST(count(*) AS BIGINT) AS n FROM toks GROUP BY word),
pairs AS (
  SELECT n, unnest(list_transform(range(1, length(word)),
                                  i -> {'a': word[i], 'b': word[i+1]})) AS p
  FROM words WHERE length(word) >= 2)
SELECT p.a AS a, p.b AS b, CAST(sum(n) AS BIGINT) AS n_pairs
FROM pairs GROUP BY 1, 2
ORDER BY n_pairs DESC, a ASC, b ASC LIMIT 10
"""

# ---------------------------------------------------------------------------
# Per-source quantile normalization (mixture-balancing feature prep)
# ---------------------------------------------------------------------------


def q_quantile_norm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Percentile-normalize a per-document feature (n_chars) WITHIN its
    source, so scores are comparable across sources before mixture
    weighting — percent_rank = (rank−1)/(n−1) is a ratio of integers
    (one IEEE division, engine-exact), with doc_id as the tiebreak so
    ranks are total. One window pass per source; sources parallelize
    the sort."""
    d = _t(spark, sf_dir, "documents")
    w = Window.partitionBy("source").orderBy("n_chars", "doc_id")
    return d.select(
        "doc_id",
        "source",
        "n_chars",
        F.percent_rank().over(w).alias("pct_rank"),
    )


ORACLE_QUANTILE_NORM = """
SELECT doc_id, source, n_chars,
       percent_rank() OVER (PARTITION BY source ORDER BY n_chars, doc_id)
         AS pct_rank
FROM documents
"""

QUERIES_QUALITY["q_bpe_pairs"] = q_bpe_pairs
QUERIES_QUALITY["q_quantile_norm"] = q_quantile_norm
ORACLE_QUALITY["q_bpe_pairs"] = ORACLE_BPE_PAIRS
ORACLE_QUALITY["q_quantile_norm"] = ORACLE_QUANTILE_NORM

# ---------------------------------------------------------------------------
# BPE apply (engine fold vs closed-form oracle)
# ---------------------------------------------------------------------------


def q_bpe_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Apply the corpus's TOP BPE merge with the real engine fold
    (``operators/bpe.merge_pair_col``) and report per-document symbol
    counts. The oracle never folds: for a single merge, greedy
    left-to-right application removes exactly
    (len − len(replace(word, ab, ''))) / 2 symbols per word — a closed
    form that independently cross-checks the fold's overlap semantics
    corpus-wide. The top pair is a 1-row TakeOrdered collected on the
    driver (the k-means-centroid precedent); the counting scan then
    applies the merge to every token occurrence, keyed per doc, in one
    pass."""
    from .operators import bpe

    docs = _t(spark, sf_dir, "documents")
    top = (
        bpe.pair_counts(bpe.word_vocab(docs))
        .orderBy(F.col("n_pairs").desc(), F.col("a").asc(), F.col("b").asc())
        .limit(1)
        .collect()
    )
    a, b = top[0]["a"], top[0]["b"]
    toks = docs.select("doc_id", F.explode(tokens_col("text")).alias("word"))
    pieces = bpe.merge_pair_col(F.split("word", ""), a, b)
    return toks.select("doc_id", "word", pieces.alias("p")).groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_words"),
        F.sum(F.length("word")).alias("n_symbols_before"),
        F.sum(F.size("p")).alias("n_pieces"),
    )


ORACLE_BPE_APPLY = """
WITH toksd AS (
  SELECT doc_id, unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS word
  FROM documents),
words AS (SELECT word, CAST(count(*) AS BIGINT) AS n FROM toksd GROUP BY word),
pairs AS (
  SELECT n, unnest(list_transform(range(1, length(word)),
                                  i -> {'a': word[i], 'b': word[i+1]})) AS p
  FROM words WHERE length(word) >= 2),
top1 AS (
  SELECT p.a AS a, p.b AS b FROM pairs GROUP BY 1, 2
  ORDER BY CAST(sum(n) AS BIGINT) DESC, a ASC, b ASC LIMIT 1)
SELECT doc_id,
       CAST(count(*) AS BIGINT) AS n_words,
       CAST(sum(length(word)) AS BIGINT) AS n_symbols_before,
       CAST(sum(length(word)
                - (length(word) - length(replace(word, a || b, ''))) // 2)
            AS BIGINT) AS n_pieces
FROM toksd CROSS JOIN top1
GROUP BY doc_id
"""

QUERIES_QUALITY["q_bpe_apply"] = q_bpe_apply
ORACLE_QUALITY["q_bpe_apply"] = ORACLE_BPE_APPLY

# ---------------------------------------------------------------------------
# Interpolated backoff LM scoring (train/held-out split)
# ---------------------------------------------------------------------------

_LM_LAMBDA = 0.75  # bigram weight; 1-λ backs off to the unigram
_LM_SALT = 17


def q_lm_backoff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Held-out language-model scoring with unigram backoff: the
    corpus is split in half by the portable hash (train/score), a
    bigram model is fit on the train half, and every SCORE-half
    document gets the average interpolated probability
    λ·p(w2|w1) + (1−λ)·p(w2) over its bigrams — bigrams unseen in
    training genuinely exercise the backoff (unseen words score 0).
    Still log-free: each term is at most two integer-ratio divisions
    and one fixed-order weighted add, floor-quantized at 2^20 and
    summed as integers. Train-side totals are driver-collapsed
    literals; the model tables join broadcast-small onto the scored
    bigram stream."""
    docs = _t(spark, sf_dir, "documents")
    is_train = affine_hash(F.col("doc_id"), F.lit(_LM_SALT)) % 2 == 0
    train, score = docs.where(is_train), docs.where(~is_train)

    def bigrams(d: DataFrame) -> DataFrame:
        base = d.select("doc_id", tokens_col("text").alias("toks")).where(
            F.size("toks") >= 2
        )
        return base.selectExpr(
            "doc_id",
            "explode(transform(sequence(1, size(toks) - 1),"
            " i -> struct(toks[i-1] AS w1, toks[i] AS w2))) AS b",
        ).select("doc_id", "b.w1", "b.w2")

    tb = bigrams(train)
    c12 = tb.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c12"))
    c1 = tb.groupBy("w1").agg(F.count(F.lit(1)).alias("c1"))
    uni = (
        train.select(F.explode(tokens_col("text")).alias("w2"))
        .groupBy("w2")
        .agg(F.count(F.lit(1)).alias("cu"))
    )
    t_total = train.select(F.sum(F.size(tokens_col("text")))).collect()[0][0]

    sb = bigrams(score).groupBy("doc_id", "w1", "w2").agg(
        F.count(F.lit(1)).alias("m")
    )
    joined = (
        sb.join(c12.join(c1, "w1"), ["w1", "w2"], "left")
        .join(uni, "w2", "left")
    )
    p2 = F.coalesce(F.col("c12").cast("double") / F.col("c1").cast("double"), F.lit(0.0))
    p1 = F.coalesce(F.col("cu").cast("double") / F.lit(float(t_total)), F.lit(0.0))
    term = F.lit(_LM_LAMBDA) * p2 + F.lit(1.0 - _LM_LAMBDA) * p1
    tq = F.floor(term * F.lit(_Q))
    return joined.groupBy("doc_id").agg(
        F.sum("m").alias("n_bigrams"),
        (
            F.sum(F.col("m") * tq).cast("double")
            / (F.sum("m").cast("double") * F.lit(float(_Q)))
        ).alias("backoff_score"),
    )


ORACLE_LM_BACKOFF = f"""
WITH split AS (
  SELECT *, ({affine_hash_sql('doc_id', str(_LM_SALT))}) % 2 = 0 AS is_train
  FROM documents),
ttoks AS (
  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS toks
  FROM split WHERE is_train),
tb AS (
  SELECT unnest(list_transform(range(1, len(toks)),
                               i -> {{'w1': toks[i], 'w2': toks[i+1]}})) AS b
  FROM ttoks WHERE len(toks) >= 2),
c12 AS (SELECT b.w1 AS w1, b.w2 AS w2, CAST(count(*) AS BIGINT) AS c12 FROM tb GROUP BY 1, 2),
c1 AS (SELECT b.w1 AS w1, CAST(count(*) AS BIGINT) AS c1 FROM tb GROUP BY 1),
uni AS (
  SELECT u.w2, CAST(count(*) AS BIGINT) AS cu FROM (
    SELECT unnest(toks) AS w2 FROM ttoks) u GROUP BY 1),
tt AS (SELECT CAST(sum(len(toks)) AS DOUBLE) AS t_total FROM ttoks),
stoks AS (
  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS toks
  FROM split WHERE NOT is_train),
sb0 AS (
  SELECT doc_id, unnest(list_transform(range(1, len(toks)),
                                       i -> {{'w1': toks[i], 'w2': toks[i+1]}})) AS b
  FROM stoks WHERE len(toks) >= 2),
sb AS (
  SELECT doc_id, b.w1 AS w1, b.w2 AS w2, CAST(count(*) AS BIGINT) AS m
  FROM sb0 GROUP BY 1, 2, 3),
model AS (
  SELECT c12.w1 AS w1, c12.w2 AS w2, c12.c12 AS c12n, c1.c1 AS c1n
  FROM c12 JOIN c1 USING (w1)),
terms AS (
  SELECT sb.doc_id, sb.m,
         CAST(floor(({_LM_LAMBDA} * coalesce(CAST(model.c12n AS DOUBLE) / CAST(model.c1n AS DOUBLE), 0.0)
                     + {1.0 - _LM_LAMBDA} * coalesce(CAST(uni.cu AS DOUBLE) / tt.t_total, 0.0))
                    * {_Q}) AS BIGINT) AS tq
  FROM sb
  LEFT JOIN model ON sb.w1 = model.w1 AND sb.w2 = model.w2
  LEFT JOIN uni ON sb.w2 = uni.w2
  CROSS JOIN tt)
SELECT doc_id,
       CAST(sum(m) AS BIGINT) AS n_bigrams,
       CAST(sum(m * tq) AS DOUBLE) / (CAST(sum(m) AS DOUBLE) * {float(_Q)}) AS backoff_score
FROM terms GROUP BY doc_id
"""

QUERIES_QUALITY["q_lm_backoff"] = q_lm_backoff
ORACLE_QUALITY["q_lm_backoff"] = ORACLE_LM_BACKOFF

# ---------------------------------------------------------------------------
# Drift detection: two-sample KS and CUSUM change detection
# ---------------------------------------------------------------------------

_KS_SALT = 23


def q_ks_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov drift statistic between the two
    deterministic hash halves of the event stream: D = max over values
    of |ECDF_A − ECDF_B|, computed exactly — per distinct (milli-
    quantized) value, cumulative counts from one ordered window, each
    ECDF one integer-ratio division, the max order-free. The canonical
    production check that yesterday's feed still looks like today's;
    on identically-distributed halves D should be small (law-tested).
    One groupBy to distinct values, one global value-ordered window
    (at 100 TB: range-partition the sort or bucket values first)."""
    ev = _t(spark, sf_dir, "events").select(
        F.floor(F.col("value") * F.lit(1000.0)).cast("bigint").alias("vq"),
        (affine_hash(F.col("event_id"), F.lit(_KS_SALT)) % 2 == 0).alias("in_a"),
    )
    counts = ev.groupBy("vq").agg(
        F.count(F.when(F.col("in_a"), 1)).alias("ca"),
        F.count(F.when(~F.col("in_a"), 1)).alias("cb"),
    )
    w = Window.orderBy("vq").rowsBetween(Window.unboundedPreceding, 0)
    tot = Window.partitionBy()
    ecdf_a = F.sum("ca").over(w).cast("double") / F.sum("ca").over(tot).cast("double")
    ecdf_b = F.sum("cb").over(w).cast("double") / F.sum("cb").over(tot).cast("double")
    per_value = counts.select(
        F.abs(ecdf_a - ecdf_b).alias("gap"),
        F.sum("ca").over(tot).alias("n_a"),
        F.sum("cb").over(tot).alias("n_b"),
    )
    return per_value.groupBy("n_a", "n_b").agg(F.max("gap").alias("ks_d"))


ORACLE_KS_DRIFT = f"""
WITH ev AS (
  SELECT CAST(floor(value * 1000.0) AS BIGINT) AS vq,
         ({affine_hash_sql('event_id', str(_KS_SALT))}) % 2 = 0 AS in_a
  FROM events),
counts AS (
  SELECT vq,
         CAST(count(CASE WHEN in_a THEN 1 END) AS BIGINT) AS ca,
         CAST(count(CASE WHEN NOT in_a THEN 1 END) AS BIGINT) AS cb
  FROM ev GROUP BY vq),
g AS (
  SELECT abs(CAST(sum(ca) OVER (ORDER BY vq ROWS UNBOUNDED PRECEDING) AS DOUBLE)
               / CAST(sum(ca) OVER () AS DOUBLE)
             - CAST(sum(cb) OVER (ORDER BY vq ROWS UNBOUNDED PRECEDING) AS DOUBLE)
               / CAST(sum(cb) OVER () AS DOUBLE)) AS gap,
         CAST(sum(ca) OVER () AS BIGINT) AS n_a,
         CAST(sum(cb) OVER () AS BIGINT) AS n_b
  FROM counts)
SELECT n_a, n_b, max(gap) AS ks_d FROM g GROUP BY n_a, n_b
"""


def q_cusum_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM change-point screen per event type: daily mean deviations
    from the type's global mean, accumulated in an ordered window; the
    maximum |S_t| locates distribution shifts. ALL-INTEGER until the
    final scale division: daily sums and counts are exact, the
    deviation term is day_sum·N − day_n·TOTAL (integers — no
    per-day division), so the running sum is shuffle-order-free and
    the oracle hash-matches bit-exactly. Report max |S_t| normalized
    by N·1000 (milli-units) per type."""
    ev = _t(spark, sf_dir, "events").select(
        "event_type",
        F.to_date(F.col("ts").cast("timestamp")).alias("d"),
        F.floor(F.col("value") * F.lit(1000.0)).cast("bigint").alias("vq"),
    )
    daily = ev.groupBy("event_type", "d").agg(
        F.sum("vq").alias("day_sum"), F.count(F.lit(1)).alias("day_n")
    )
    tot = Window.partitionBy("event_type")
    daily = daily.withColumn("tot_sum", F.sum("day_sum").over(tot)).withColumn(
        "tot_n", F.sum("day_n").over(tot)
    )
    dev = F.col("day_sum") * F.col("tot_n") - F.col("day_n") * F.col("tot_sum")
    w = Window.partitionBy("event_type").orderBy("d").rowsBetween(
        Window.unboundedPreceding, 0
    )
    s = daily.withColumn("cusum", F.sum(dev).over(w))
    return s.groupBy("event_type", "tot_n").agg(
        (
            F.max(F.abs(F.col("cusum"))).cast("double")
            / (F.col("tot_n") * F.lit(1000.0)).cast("double")
        ).alias("max_cusum"),
        F.count(F.lit(1)).alias("n_days"),
    )


ORACLE_CUSUM_DRIFT = """
WITH ev AS (
  SELECT event_type, CAST(ts AS DATE) AS d,
         CAST(floor(value * 1000.0) AS BIGINT) AS vq
  FROM events),
daily AS (
  SELECT event_type, d, CAST(sum(vq) AS BIGINT) AS day_sum,
         CAST(count(*) AS BIGINT) AS day_n
  FROM ev GROUP BY 1, 2),
t AS (
  SELECT *, CAST(sum(day_sum) OVER (PARTITION BY event_type) AS BIGINT) AS tot_sum,
            CAST(sum(day_n) OVER (PARTITION BY event_type) AS BIGINT) AS tot_n
  FROM daily),
s AS (
  SELECT event_type, tot_n,
         CAST(sum(day_sum * tot_n - day_n * tot_sum)
              OVER (PARTITION BY event_type ORDER BY d ROWS UNBOUNDED PRECEDING)
              AS BIGINT) AS cusum
  FROM t)
SELECT event_type, tot_n,
       CAST(max(abs(cusum)) AS DOUBLE) / CAST(tot_n * 1000.0 AS DOUBLE) AS max_cusum,
       CAST(count(*) AS BIGINT) AS n_days
FROM s GROUP BY event_type, tot_n
"""

QUERIES_QUALITY["q_ks_drift"] = q_ks_drift
QUERIES_QUALITY["q_cusum_drift"] = q_cusum_drift
ORACLE_QUALITY["q_ks_drift"] = ORACLE_KS_DRIFT
ORACLE_QUALITY["q_cusum_drift"] = ORACLE_CUSUM_DRIFT


# ---------------------------------------------------------------------------
# Curriculum sharding: quality-ordered training stages
# ---------------------------------------------------------------------------

_CURR_STAGES = 4
_CURR_Q = 1 << 20  # score quantizer for the order-free stage mean


def q_curriculum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curriculum-learning shard table: the corpus ordered by the
    Gopher-style quality score (ascending — noisy docs first, cleanest
    last, the anti-curriculum variant just flips the order literal) and
    cut into 4 equal-frequency stages with the DISTRIBUTED exact ntile
    (operators/rank.ranked_ntile — no single-partition sort; ties
    total-ordered by doc_id). Per stage: doc count, exact token budget,
    and the mean/extremes of the score — the table a training scheduler
    consumes to draw stage-k batches. Stage means are 2^20
    floor-quantized per-doc then integer-summed (shuffle-order-free)."""
    from .operators.text import quality_score

    scored = (
        quality_score(_t(spark, sf_dir, "documents"))
        .select(
            "doc_id",
            "n_tokens",
            "quality_score",
            F.floor(F.col("quality_score") * F.lit(float(_CURR_Q)))
            .cast("bigint")
            .alias("sq"),
        )
        # materialize once (lm_score's localCheckpoint precedent): the
        # rank primitive's boundary actions would otherwise re-run the
        # tokenizing score pass 3x; the checkpoint holds 4 small
        # columns per doc, not text
        .localCheckpoint(eager=True)
    )
    staged = rk.ranked_ntile(
        scored, [("quality_score", True), ("doc_id", True)], _CURR_STAGES, out="stage"
    )
    g = staged.groupBy("stage").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("token_budget"),
        F.sum("sq").alias("_ssq"),
        F.round(F.min("quality_score"), 6).alias("min_score"),
        F.round(F.max("quality_score"), 6).alias("max_score"),
    )
    mean = F.col("_ssq").cast("double") / (
        F.col("n_docs").cast("double") * F.lit(float(_CURR_Q))
    )
    return g.select(
        "stage",
        "n_docs",
        F.col("token_budget").cast("bigint").alias("token_budget"),
        F.round(mean, 6).alias("mean_score"),
        "min_score",
        "max_score",
    ).orderBy("stage")


def _curriculum_oracle() -> str:
    from .queries_analytics import _quality_sql

    return f"""
WITH scored AS (
  SELECT doc_id,
         CAST(len(list_filter(string_split(text, ' '), t -> t <> '')) AS INTEGER)
           AS n_tokens,
         quality_score,
         CAST(floor(quality_score * {float(_CURR_Q)!r}) AS BIGINT) AS sq
  FROM ({_quality_sql('documents')})),
staged AS (
  SELECT *, ntile({_CURR_STAGES}) OVER (ORDER BY quality_score, doc_id) AS stage
  FROM scored)
SELECT CAST(stage AS INT) AS stage,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_tokens) AS BIGINT) AS token_budget,
       round(CAST(sum(sq) AS DOUBLE) / (CAST(count(*) AS DOUBLE) * {float(_CURR_Q)!r}), 6)
         AS mean_score,
       round(min(quality_score), 6) AS min_score,
       round(max(quality_score), 6) AS max_score
FROM staged GROUP BY stage ORDER BY stage
"""


ORACLE_CURRICULUM = _curriculum_oracle()

QUERIES_QUALITY["q_curriculum"] = q_curriculum
ORACLE_QUALITY["q_curriculum"] = ORACLE_CURRICULUM


_EPOCH_REPS = {1: 1, 2: 2, 3: 3, 4: 4}  # noisiest once, cleanest 4 epochs


def q_epoch_upsample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-weighted epoch upsampling (r8): the corpus's quality
    quartiles (same distributed ntile as q_curriculum) are repeated
    1/2/3/4 epochs — noisiest once, cleanest four times (the
    data-constrained scaling recipe) — and every (doc, copy) gets a
    stable hash shard (operators/llm_prep.epoch_upsample). Published as
    the per-(stage, shard) manifest a training scheduler consumes:
    row count, distinct docs, exact token budget."""
    from .operators import llm_prep as lp
    from .operators.text import quality_score

    scored = (
        quality_score(_t(spark, sf_dir, "documents"))
        .select("doc_id", "n_tokens", "quality_score")
        # same materialization rationale as q_curriculum: the rank
        # primitive's boundary actions would re-run the tokenizing
        # score pass 3x otherwise
        .localCheckpoint(eager=True)
    )
    staged = rk.ranked_ntile(
        scored, [("quality_score", True), ("doc_id", True)], _CURR_STAGES,
        out="stage", buckets=16,  # small explicit bucket count: the
        # default (min(shuffle.partitions, 128)) builds a ~127-term
        # bucket indicator expression — planning cost, not exactness
        # (the ntile is exact at any bucket count)
    )
    fan = lp.epoch_upsample(staged, _EPOCH_REPS)
    return (
        fan.groupBy("stage", "shard")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.count_distinct(F.col("doc_id")).alias("n_docs"),
            F.sum("n_tokens").cast("bigint").alias("token_budget"),
        )
        .select("stage", F.col("shard").cast("int").alias("shard"),
                "n_rows", "n_docs", "token_budget")
    )


def _epoch_upsample_oracle() -> str:
    from .operators.llm_prep import EPOCH_STRIDE
    from .functions.hashing import MERSENNE_P
    from .queries_analytics import _quality_sql

    combined = f"(((doc_id % {MERSENNE_P}) * {EPOCH_STRIDE} + epoch_copy) % {MERSENNE_P})"
    return f"""
WITH scored AS (
  SELECT doc_id,
         CAST(len(list_filter(string_split(text, ' '), t -> t <> '')) AS INTEGER)
           AS n_tokens,
         quality_score
  FROM ({_quality_sql('documents')})),
staged AS (
  SELECT *, ntile({_CURR_STAGES}) OVER (ORDER BY quality_score, doc_id) AS stage
  FROM scored),
fan AS (
  SELECT doc_id, n_tokens, stage, unnest(range(0, stage)) AS epoch_copy
  FROM staged),
sharded AS (
  SELECT *, ({affine_hash_sql(combined, '17')}) % 16 AS shard FROM fan)
SELECT CAST(stage AS INT) AS stage, CAST(shard AS INT) AS shard,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
       CAST(sum(n_tokens) AS BIGINT) AS token_budget
FROM sharded GROUP BY stage, shard
"""


ORACLE_EPOCH_UPSAMPLE = _epoch_upsample_oracle()

QUERIES_QUALITY["q_epoch_upsample"] = q_epoch_upsample
ORACLE_QUALITY["q_epoch_upsample"] = ORACLE_EPOCH_UPSAMPLE


# ---------------------------------------------------------------------------
# Privacy audits (r7): k-anonymity report + l-diversity violations —
# the re-identification checks a curation pipeline runs before a
# user-derived projection ships (engine extension; the reference's
# coin-market rows are public and carry no privacy surface).
# ---------------------------------------------------------------------------


def q_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity audit of the customer projection under QI =
    (nation, market segment, acctbal kilo-band), k = 10: one partial-
    agg groupBy over the QI, one 1-row rollup. The kilo-band makes the
    QI fine enough that violating groups actually exist at test scale."""
    from .operators import privacy as pv

    c = _t(spark, sf_dir, "customer")
    band = F.floor(F.col("c_acctbal") / 1000.0).cast("bigint").alias("bal_band")
    return pv.k_anonymity_report(c, ["c_nationkey", "c_mktsegment", band], k=10)


ORACLE_K_ANONYMITY = """
WITH g AS (
  SELECT c_nationkey, c_mktsegment,
         CAST(floor(c_acctbal / 1000.0) AS BIGINT) AS bal_band,
         CAST(count(*) AS BIGINT) AS grp_n
  FROM customer GROUP BY 1, 2, 3)
SELECT CAST(10 AS INT) AS k,
       CAST(count(*) AS BIGINT) AS n_groups,
       CAST(sum(CASE WHEN grp_n < 10 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_violating_groups,
       CAST(sum(CASE WHEN grp_n < 10 THEN grp_n ELSE 0 END) AS BIGINT)
         AS n_rows_at_risk,
       CAST(sum(CASE WHEN grp_n < 10 THEN grp_n ELSE 0 END) AS DOUBLE)
         / CAST(sum(grp_n) AS DOUBLE) AS risk_frac,
       min(grp_n) AS min_group_size
FROM g
"""

QUERIES_QUALITY["q_k_anonymity"] = q_k_anonymity
ORACLE_QUALITY["q_k_anonymity"] = ORACLE_K_ANONYMITY


def q_l_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """l-diversity violations in orders under QI = (priority, order
    date), sensitive = order status, l = 3: QI groups whose sensitive
    attribute takes < 3 distinct values (k-anonymous-but-leaking
    groups). One hash aggregate with an exact per-group count-distinct."""
    from .operators import privacy as pv

    o = _t(spark, sf_dir, "orders")
    return pv.l_diversity_violations(
        o, ["o_orderpriority", "o_orderdate"], "o_orderstatus", l=3
    )


ORACLE_L_DIVERSITY = """
SELECT o_orderpriority, o_orderdate,
       CAST(count(*) AS BIGINT) AS grp_n,
       CAST(count(DISTINCT o_orderstatus) AS BIGINT) AS l_distinct
FROM orders GROUP BY 1, 2
HAVING count(DISTINCT o_orderstatus) < 3
"""

QUERIES_QUALITY["q_l_diversity"] = q_l_diversity
ORACLE_QUALITY["q_l_diversity"] = ORACLE_L_DIVERSITY


def q_dp_noisy_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Differentially-private-SHAPED noisy counts (r7): per-event-type
    counts with two-sided geometric (discrete Laplace) noise at
    epsilon = 0.5 — the exact mechanism a DP release pipeline applies
    to a histogram (Ghosh et al. 2009: noise = G1 − G2 with
    G = floor(ln(u)/−epsilon), geometric from a uniform).

    DETERMINISM CAVEAT, stated loudly: the uniforms here are SEEDED
    from the group key (affine hash → (h+1)/P in (0,1]), which makes
    the mechanism reproducible for oracle checking but gives NO privacy
    guarantee — a real release swaps the two hash-uniforms for true
    randomness; everything else (sensitivity-1 counts, the geometric
    ladder, the epsilon accounting column) is the production shape.
    Scale: one partial-agg groupBy; noise is per-GROUP arithmetic on
    the 1-row-per-type rollup."""
    from .operators import privacy as _pv  # noqa: F401  (family anchor)

    ev = _t(spark, sf_dir, "events")
    g = ev.groupBy("event_type").agg(F.count(F.lit(1)).alias("n_true"))
    key = char_hash(F.col("event_type"))
    p = float((1 << 31) - 1)
    eps = 0.5

    def geom(salt: int):
        u = (affine_hash(key, F.lit(salt)) + F.lit(1).cast("bigint")) / F.lit(p)
        return F.floor(F.log(u) / F.lit(-eps)).cast("bigint")

    noise = geom(101) - geom(202)
    return g.select(
        "event_type",
        "n_true",
        noise.alias("noise"),
        (F.col("n_true") + noise).alias("n_noisy"),
        F.lit(eps).alias("epsilon"),
    )


_DPN_P = (1 << 31) - 1
_DPN_KEY = char_hash_sql("event_type")
_DPN_G1 = (
    f"CAST(floor(ln((({affine_hash_sql(_DPN_KEY, '101')}) + 1)"
    f" / {float(_DPN_P)!r}) / -0.5) AS BIGINT)"
)
_DPN_G2 = (
    f"CAST(floor(ln((({affine_hash_sql(_DPN_KEY, '202')}) + 1)"
    f" / {float(_DPN_P)!r}) / -0.5) AS BIGINT)"
)

ORACLE_DP_NOISY_COUNT = f"""
WITH g AS (
  SELECT event_type, CAST(count(*) AS BIGINT) AS n_true
  FROM events GROUP BY 1)
SELECT event_type, n_true,
       ({_DPN_G1}) - ({_DPN_G2}) AS noise,
       n_true + ({_DPN_G1}) - ({_DPN_G2}) AS n_noisy,
       CAST(0.5 AS DOUBLE) AS epsilon
FROM g
"""

QUERIES_QUALITY["q_dp_noisy_count"] = q_dp_noisy_count
ORACLE_QUALITY["q_dp_noisy_count"] = ORACLE_DP_NOISY_COUNT
