"""Laws for the closed-form linear-model family (operators/linalg.py)
and the round-6 query additions they back — verified against NUMPY
solves on the raw rows, i.e. an oracle *independent* of the shared-SQL
epilogue both engines evaluate in the parity gate.

Also: the KMV sketch's estimator accuracy law, and a brute-force EXISTS
cross-check of q_cep_pattern's negated-pattern semantics (the running
error count is provably equivalent to "exists ANY preceding view within
the gap with zero errors strictly between" — asserted here on real
data, not just the structurally-identical DuckDB twin)."""

from __future__ import annotations

import duckdb
import numpy as np
import pytest
from pyspark.sql import functions as F

from airflow_crypto_etl_spark.operators import linalg as la
from airflow_crypto_etl_spark.queries_analytics import QUERIES_ANALYTICS
from airflow_crypto_etl_spark.queries_market import QUERIES_MARKET
from airflow_crypto_etl_spark.queries_scale import QUERIES_SCALE
from airflow_crypto_etl_spark.sources.tables import load_table

from conftest import SF_DIR


def _lineitem_xy(spark):
    rows = (
        load_table(spark, SF_DIR, "lineitem")
        .select("l_returnflag", "l_quantity", "l_discount", "l_extendedprice")
        .collect()
    )
    by_flag: dict[str, list[tuple[float, float, float]]] = {}
    for r in rows:
        by_flag.setdefault(r.l_returnflag, []).append(
            (float(r.l_quantity), float(r.l_discount), float(r.l_extendedprice))
        )
    return by_flag


def test_det3_matches_numpy():
    m = [[3.5, -1.25, 2.0], [0.5, 4.0, -3.0], [7.25, 1.0, 0.125]]
    sql = la.det3([[repr(v) for v in row] for row in m])
    got = duckdb.sql(f"SELECT CAST({sql} AS DOUBLE) AS d").fetchone()[0]
    assert got == pytest.approx(float(np.linalg.det(np.array(m))), rel=1e-12)


def test_ridge_matches_numpy_normal_equations(spark):
    lam = 1.0
    out = {
        r.l_returnflag: r
        for r in QUERIES_SCALE["q_ridge_regression"](spark, SF_DIR).collect()
    }
    for flag, pts in _lineitem_xy(spark).items():
        X = np.array([[1.0, q, d] for q, d, _ in pts])
        y = np.array([p for _, _, p in pts])
        A = X.T @ X + lam * np.diag([0.0, 1.0, 1.0])
        beta = np.linalg.solve(A, X.T @ y)
        r = out[flag]
        assert r.n == len(pts)
        for got, want in zip((r.beta0, r.beta1, r.beta2), beta):
            assert got == pytest.approx(want, rel=1e-5, abs=1e-5), flag
        resid = y - X @ beta
        r2 = 1.0 - float(resid @ resid) / float(((y - y.mean()) ** 2).sum())
        assert r.r2 == pytest.approx(r2, abs=1e-5), flag


def test_logistic_newton_matches_numpy(spark):
    lam = 0.5
    rows = (
        load_table(spark, SF_DIR, "lineitem")
        .select("l_returnflag", "l_quantity", "l_discount")
        .collect()
    )
    X = np.array([[1.0, float(r.l_quantity), float(r.l_discount)] for r in rows])
    yc = np.array([0.5 if r.l_returnflag == "R" else -0.5 for r in rows])
    # One Newton step from beta=0: (0.25*X'X + lam*I)^-1 X'(y - 1/2)
    beta = np.linalg.solve(0.25 * (X.T @ X) + lam * np.eye(3), X.T @ yc)
    got = QUERIES_SCALE["q_logistic_newton"](spark, SF_DIR).collect()[0]
    assert got.n == len(rows)
    for g, want in zip((got.beta0, got.beta1, got.beta2), beta):
        assert g == pytest.approx(want, rel=1e-5, abs=6e-7)  # query rounds at 6 dp


def test_kmv_estimator_accuracy_and_bounds(spark):
    r = QUERIES_SCALE["q_kmv_intersect"](spark, SF_DIR).collect()[0]
    assert r.n_sk <= r.k
    if r.n_sk < r.k:  # union smaller than k: estimator degrades to exact
        assert r.est_union == pytest.approx(float(r.exact_union))
        assert r.est_intersect == pytest.approx(float(r.exact_intersect))
    else:  # k=64 -> rel. std ~ 1/sqrt(62) ~ 13%; 4 sigma bound
        assert r.est_union == pytest.approx(r.exact_union, rel=0.5)
    assert 0.0 <= r.est_jaccard <= 1.0


def test_cep_pattern_matches_bruteforce_exists(spark):
    """matched(purchase) <=> EXISTS preceding view within 30 min with no
    error strictly between — independent quadratic-join oracle (the
    running-count form is the scale-safe equivalent; errors accumulate,
    so the LATEST view fails only if every earlier one does)."""
    got = {
        r.user_id: r
        for r in QUERIES_ANALYTICS["q_cep_pattern"](spark, SF_DIR).collect()
    }
    ev = load_table(spark, SF_DIR, "events").select(
        "user_id", "event_id", "event_type",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("us"),
    )
    ev.createOrReplaceTempView("cep_ev")
    brute = {
        r.user_id: r
        for r in spark.sql(
            """
            WITH pr AS (
              SELECT p.user_id, p.event_id AS p_eid, p.us AS p_us,
                     v.event_id AS v_eid, v.us AS v_us
              FROM cep_ev p JOIN cep_ev v
                ON v.user_id = p.user_id AND p.event_type = 'purchase'
               AND v.event_type = 'view'
               AND (v.us, v.event_id) < (p.us, p.event_id)
               AND p.us - v.us <= 1800000000),
            ok AS (
              SELECT DISTINCT user_id, p_eid FROM pr
              WHERE NOT EXISTS (
                SELECT 1 FROM cep_ev x
                WHERE x.user_id = pr.user_id AND x.event_type = 'error'
                  AND (x.us, x.event_id) > (pr.v_us, pr.v_eid)
                  AND (x.us, x.event_id) < (pr.p_us, pr.p_eid))),
            base AS (
              SELECT user_id, count(*) AS n_purchases FROM cep_ev
              WHERE event_type = 'purchase' GROUP BY user_id)
            SELECT base.user_id, base.n_purchases,
                   coalesce(m.n_matched, 0) AS n_matched
            FROM base LEFT JOIN (
              SELECT user_id, count(*) AS n_matched FROM ok GROUP BY user_id
            ) m ON m.user_id = base.user_id
            """
        ).collect()
    }
    users_with_purchases = {u for u, r in got.items() if r.n_purchases > 0}
    assert users_with_purchases == set(brute)
    for u, b in brute.items():
        assert (got[u].n_purchases, got[u].n_matched) == (
            b.n_purchases,
            b.n_matched,
        ), u


def test_sharpe_signs_agree_with_mean_return(spark):
    """Sharpe/Sortino share the mean-return numerator: published signs
    must agree with each other and with a pandas recomputation."""
    import pandas as pd

    out = QUERIES_MARKET["q_sharpe"](spark, SF_DIR).toPandas()
    assert len(out) > 0
    for _, r in out.iterrows():
        if pd.notna(r.sharpe) and pd.notna(r.sortino):
            assert np.sign(r.sharpe) == np.sign(r.sortino) or (
                r.sharpe == 0 and r.sortino == 0
            )
        assert 0.0 <= r.hit_rate <= 1.0
        assert r.n >= 1
