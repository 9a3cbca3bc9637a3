"""Independent cross-checks for the round-6 session analytics:
q_attribution's RANGE-window credit model re-derived via an explicit
purchase x touch JOIN (different plan family, same semantics), and
q_event_paths conservation laws."""

from __future__ import annotations

from pyspark.sql import functions as F

from airflow_crypto_etl_spark.queries_analytics import (
    QUERIES_ANALYTICS,
    _ATTR_GAP_US,
    _ATTR_Q,
)
from airflow_crypto_etl_spark.sources.tables import load_table

from conftest import SF_DIR


def test_attribution_matches_join_form(spark):
    """The window-frame counts must equal an explicit interval join:
    for each purchase, touches with p.us - gap <= t.us < p.us."""
    got = {
        r.user_id: r
        for r in QUERIES_ANALYTICS["q_attribution"](spark, SF_DIR).collect()
    }
    ev = load_table(spark, SF_DIR, "events").select(
        "user_id", "event_type",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("us"),
        (F.col("value").cast("decimal(18,4)") * _ATTR_Q).cast("bigint").alias("vq"),
    )
    p = ev.where(F.col("event_type") == "purchase").select(
        "user_id", F.col("us").alias("p_us"), "vq"
    )
    t = ev.where(F.col("event_type").isin("view", "click")).select(
        F.col("user_id").alias("t_uid"), F.col("event_type").alias("t_type"),
        F.col("us").alias("t_us"),
    )
    pairs = p.join(
        t,
        (F.col("t_uid") == F.col("user_id"))
        & (F.col("t_us") < F.col("p_us"))
        & (F.col("p_us") - F.col("t_us") <= F.lit(_ATTR_GAP_US)),
        "left",
    )
    per_p = pairs.groupBy("user_id", "p_us", "vq").agg(
        F.sum((F.col("t_type") == "view").cast("bigint")).alias("nv"),
        F.sum((F.col("t_type") == "click").cast("bigint")).alias("nc"),
    ).fillna(0, ["nv", "nc"]).withColumn("nt", F.col("nv") + F.col("nc"))
    agg = per_p.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_purchases"),
        F.sum(F.when(F.col("nt") > 0, F.expr("(vq * nv) DIV nt")).otherwise(F.lit(0))).alias("av"),
        F.sum(F.when(F.col("nt") > 0, F.expr("(vq * nc) DIV nt")).otherwise(F.lit(0))).alias("ac"),
        F.sum(F.when(F.col("nt") == 0, F.col("vq")).otherwise(F.lit(0))).alias("un"),
    )
    brute = {r.user_id: r for r in agg.collect()}
    assert set(got) == set(brute)
    for u, b in brute.items():
        g = got[u]
        assert g.n_purchases == b.n_purchases, u
        assert round(g.attr_view * _ATTR_Q) == b.av, u
        assert round(g.attr_click * _ATTR_Q) == b.ac, u
        assert round(g.unattributed * _ATTR_Q) == b.un, u


def test_attribution_conserves_value(spark):
    """attributed(view) + attributed(click) + unattributed +
    integer-division remainders == total purchase value exactly."""
    out = QUERIES_ANALYTICS["q_attribution"](spark, SF_DIR)
    tot = out.agg(
        F.sum((F.col("attr_view") * _ATTR_Q).cast("bigint")).alias("av"),
        F.sum((F.col("attr_click") * _ATTR_Q).cast("bigint")).alias("ac"),
        F.sum((F.col("unattributed") * _ATTR_Q).cast("bigint")).alias("un"),
    ).collect()[0]
    ev = load_table(spark, SF_DIR, "events")
    pq = (
        ev.where(F.col("event_type") == "purchase")
        .agg(F.sum((F.col("value").cast("decimal(18,4)") * _ATTR_Q).cast("bigint")))
        .collect()[0][0]
    )
    claimed = tot.av + tot.ac + tot.un
    assert claimed <= pq  # remainders are never re-added
    # remainder per purchase < n_touches quanta; bound loosely
    n_p = ev.where(F.col("event_type") == "purchase").count()
    assert pq - claimed < n_p * 1000


def test_event_paths_counts_conserve(spark):
    """Sum of all trigram counts == total trigrams == sum over users of
    max(0, n_events - 2); top-20 must be a subset with descending n."""
    ev = load_table(spark, SF_DIR, "events")
    per_user = ev.groupBy("user_id").count().collect()
    total_trigrams = sum(max(0, r["count"] - 2) for r in per_user)
    out = QUERIES_ANALYTICS["q_event_paths"](spark, SF_DIR).collect()
    ns = [r.n for r in out]
    assert ns == sorted(ns, reverse=True)
    assert sum(ns) <= total_trigrams
    assert len(out) == min(20, 5 ** 3)
