"""Law tests for the experimentation & evaluation battery
(queries_experiments.py). Oracle parity is covered by the registry
sweep; these pin algebraic invariants that would not surface as a hash
mismatch if both engines drifted together: HLL register mergeability,
KM monotone telescoping, the z-statistic formula, BM25 against a plain
Python scorer, ntile balance, Levenshtein against a reference DP, and
entropy bounds."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from airflow_crypto_etl_spark import queries_experiments as qe
from airflow_crypto_etl_spark.queries import _t


def test_hll_registers_merge_by_elementwise_max(spark, sf_dir):
    """The distributed-correctness law: sketching two disjoint shards
    and max-merging the registers must equal sketching the union —
    this is exactly what partial aggregation does per-partition at
    scale, so it is the property the 100 TB path rests on."""
    ev = _t(spark, sf_dir, "events").select("user_id", "event_id")
    full = {r["bucket"]: r["m_j"] for r in qe.hll_registers(ev).collect()}
    a = qe.hll_registers(ev.where(F.col("event_id") % 2 == 0)).collect()
    b = qe.hll_registers(ev.where(F.col("event_id") % 2 == 1)).collect()
    merged: dict = {}
    for r in list(a) + list(b):
        merged[r["bucket"]] = max(merged.get(r["bucket"], 0), r["m_j"])
    assert merged == full


def test_hll_estimate_near_exact(spark, sf_dir):
    row = qe.q_hll_distinct(spark, sf_dir).collect()[0]
    assert row["m"] == 64
    # raw estimate is the harmonic form of sum_inv
    assert abs(row["est_raw"] - 0.709 * 64 * 64 / row["sum_inv"]) < 1e-9
    # m=64 → standard error 1.04/8 = 13%; allow 3 sigma either way
    assert abs(row["est_corrected"] - row["exact_distinct"]) <= 0.4 * row["exact_distinct"]


def test_kaplan_meier_monotone_and_first_step(spark, sf_dir):
    rows = sorted(qe.q_kaplan_meier(spark, sf_dir).collect(), key=lambda r: r["dur_days"])
    assert rows, "no KM event steps"
    prev = 1.0
    for r in rows:
        assert 0.0 <= r["survival"] <= prev + 1e-12
        assert 0 < r["n_event"] <= r["n_risk"]
        prev = r["survival"]
    # at the first event time there are no prior steps: S = (n-d)/n exactly
    first = rows[0]
    expect = (first["n_risk"] - first["n_event"]) / first["n_risk"]
    assert abs(first["survival"] - expect) < 1e-9


def test_ab_test_formula(spark, sf_dir):
    r = qe.q_ab_test(spark, sf_dir).collect()[0]
    n_users = _t(spark, sf_dir, "events").select("user_id").distinct().count()
    assert r["n_a"] + r["n_b"] == n_users
    pa, pb = r["c_a"] / r["n_a"], r["c_b"] / r["n_b"]
    pp = (r["c_a"] + r["c_b"]) / (r["n_a"] + r["n_b"])
    se = math.sqrt(pp * (1 - pp) * (1 / r["n_a"] + 1 / r["n_b"]))
    assert abs(r["rate_a"] - pa) < 1e-12 and abs(r["rate_b"] - pb) < 1e-12
    assert abs(r["z_stat"] - (pa - pb) / se) < 1e-9


def test_bm25_matches_python_scorer(spark, sf_dir):
    docs = {
        r["doc_id"]: [t for t in r["text"].split(" ") if t]
        for r in _t(spark, sf_dir, "documents").select("doc_id", "text").collect()
    }
    n = float(len(docs))
    avgdl = sum(len(t) for t in docs.values()) / n
    df = {
        term: sum(1 for toks in docs.values() if term in toks) for term in qe._BM25_TERMS
    }
    k1, b = qe._BM25_K1, qe._BM25_B
    scores = {}
    for did, toks in docs.items():
        s = 0.0
        for term in qe._BM25_TERMS:
            tf = toks.count(term)
            if tf:
                idf = (n - df[term] + 0.5) / (df[term] + 0.5)
                s += idf * tf * (k1 + 1.0) / (tf + k1 * (1 - b + b * len(toks) / avgdl))
        if s:
            scores[did] = s
    want = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[: qe._BM25_K]
    got = sorted(qe.q_bm25(spark, sf_dir).collect(), key=lambda r: r["rank"])
    assert [r["doc_id"] for r in got] == [d for d, _ in want]
    for r, (_, s) in zip(got, want):
        assert abs(r["score"] - s) < 1e-9


def test_rfm_quintiles_balanced_and_conserve_users(spark, sf_dir):
    grid = qe.q_rfm(spark, sf_dir).collect()
    n_users = _t(spark, sf_dir, "events").select("user_id").distinct().count()
    assert sum(r["n_users"] for r in grid) == n_users
    # ntile law: each dimension's marginal bucket sizes differ by <= 1
    for dim in ("r_quint", "f_quint", "m_quint"):
        marg: dict = {}
        for r in grid:
            marg[r[dim]] = marg.get(r[dim], 0) + r["n_users"]
        assert sorted(marg) == [1, 2, 3, 4, 5]
        assert max(marg.values()) - min(marg.values()) <= 1


def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def test_edit_distance_matches_reference_dp(spark, sf_dir):
    custs = _t(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_nationkey"
    ).collect()
    want: dict = {}
    by_nation: dict = {}
    for r in custs:
        by_nation.setdefault(r["c_nationkey"], []).append(r)
    for rows in by_nation.values():
        rows = sorted(rows, key=lambda r: r["c_custkey"])
        for i, a in enumerate(rows):
            for b in rows[i + 1 :]:
                d = _lev(a["c_name"], b["c_name"])
                if d <= qe._LEV_MAX:
                    want[d] = want.get(d, 0) + 1
    got = {r["lev_dist"]: r["n_pairs"] for r in qe.q_edit_distance(spark, sf_dir).collect()}
    assert got == want


def test_forecast_eval_matches_pandas(spark, sf_dir):
    daily = (
        _t(spark, sf_dir, "events")
        .select(
            "event_type",
            F.to_date(F.col("ts").cast("timestamp")).alias("day"),
            F.floor(F.col("value") * 100.0).cast("bigint").alias("cents"),
        )
        .groupBy("event_type", "day")
        .agg(F.sum("cents").alias("actual"))
        .collect()
    )
    series: dict = {}
    for r in daily:
        series.setdefault(r["event_type"], []).append((r["day"], r["actual"]))
    got = {r["event_type"]: r for r in qe.q_forecast_eval(spark, sf_dir).collect()}
    for et, pts in series.items():
        pts.sort()
        pairs = [(a, f) for (_, a), (_, f) in zip(pts[qe._FC_LAG :], pts)]
        if not pairs:
            assert et not in got
            continue
        mae = sum(abs(a - f) for a, f in pairs) / len(pairs) / 100.0
        assert got[et]["n_days_eval"] == len(pairs)
        assert abs(got[et]["mae"] - mae) < 1e-9


def test_entropy_bounds(spark, sf_dir):
    rows = qe.q_entropy(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert -1e-12 <= r["h_bits"] <= math.log2(r["n_types"]) + 1e-12


def test_cuped_theta_and_lift_formula(spark, sf_dir):
    ev = (
        _t(spark, sf_dir, "events")
        .select(
            "user_id",
            F.dayofmonth(F.to_date(F.col("ts").cast("timestamp"))).alias("dom"),
            "event_type",
            F.floor(F.col("value") * 100.0).cast("bigint").alias("cents"),
        )
        .collect()
    )
    xs: dict = {}
    ys: dict = {}
    for r in ev:
        xs.setdefault(r["user_id"], 0)
        ys.setdefault(r["user_id"], 0)
        if r["event_type"] == "purchase":
            if r["dom"] < qe._CUPED_SPLIT_DAY:
                xs[r["user_id"]] += r["cents"]
            else:
                ys[r["user_id"]] += r["cents"]
    n = len(xs)
    sx, sy = sum(xs.values()), sum(ys.values())
    sxy = sum(xs[u] * ys[u] for u in xs)
    sxx = sum(x * x for x in xs.values())
    theta = (sxy - sx * sy / n) / (sxx - sx * sx / n)
    row = qe.q_cuped(spark, sf_dir).collect()[0]
    assert row["n_a"] + row["n_b"] == n
    assert abs(row["theta"] - theta) < 1e-9
    assert abs(row["raw_lift"] - (row["mean_y_a"] - row["mean_y_b"])) < 1e-12
    assert abs(row["cuped_lift"] - (row["adj_y_a"] - row["adj_y_b"])) < 1e-12
    # CUPED preserves the POOLED mean: weighted adj means == weighted raw means
    pooled_raw = (row["mean_y_a"] * row["n_a"] + row["mean_y_b"] * row["n_b"]) / n
    pooled_adj = (row["adj_y_a"] * row["n_a"] + row["adj_y_b"] * row["n_b"]) / n
    assert abs(pooled_raw - pooled_adj) < 1e-9


def test_quantile_sketch_within_bucket_width(spark, sf_dir):
    row = qe.q_quantile_sketch(spark, sf_dir).collect()[0]
    for q in (50, 90, 99):
        sk, ex = row[f"p{q}_sketch"], row[f"p{q}_exact"]
        assert sk is not None and ex is not None
        # the interpolated estimate lives inside the covering bucket,
        # so it can miss the exact percentile by at most one width
        assert abs(sk - ex) <= qe._QS_WIDTH + 1e-9


def test_bootstrap_ci_brackets_point_and_is_deterministic(spark, sf_dir):
    a = qe.q_bootstrap_ci(spark, sf_dir).collect()[0]
    b = qe.q_bootstrap_ci(spark, sf_dir).collect()[0]
    assert a == b  # hash-derived weights: bit-identical on rerun
    assert a["n_replicates"] == qe._BOOT_R
    assert a["ci_lo"] <= a["ci_hi"]
    # Poisson bootstrap of a mean over a non-degenerate sample: the
    # point estimate should fall inside (or at worst on) the 95% CI
    assert a["ci_lo"] - 1e-9 <= a["point_mean"] <= a["ci_hi"] + 1e-9


def test_audience_overlap_bounds(spark, sf_dir):
    rows = qe.q_audience_overlap(spark, sf_dir).collect()
    types = {
        r["event_type"]
        for r in _t(spark, sf_dir, "events").select("event_type").distinct().collect()
    }
    k = len(types)
    assert len(rows) <= k * (k - 1) // 2
    for r in rows:
        assert r["type_a"] < r["type_b"]
        assert 0 < r["n_both"] <= min(r["n_a"], r["n_b"])
        union = r["n_a"] + r["n_b"] - r["n_both"]
        assert abs(r["jaccard"] - r["n_both"] / union) < 1e-12
        assert 0.0 < r["jaccard"] <= 1.0


def test_diff_in_diff_formula(spark, sf_dir):
    r = qe.q_diff_in_diff(spark, sf_dir).collect()[0]
    assert abs(r["delta_a"] - (r["mean_post_a"] - r["mean_pre_a"])) < 1e-12
    assert abs(r["delta_b"] - (r["mean_post_b"] - r["mean_pre_b"])) < 1e-12
    assert abs(r["did"] - (r["delta_a"] - r["delta_b"])) < 1e-12
    # same split and periods as q_cuped: arm sizes must agree
    c = qe.q_cuped(spark, sf_dir).collect()[0]
    assert (r["n_a"], r["n_b"]) == (c["n_a"], c["n_b"])


def test_calibration_brier_decomposition(spark, sf_dir):
    rows = qe.q_calibration(spark, sf_dir).collect()
    n_users = _t(spark, sf_dir, "events").select("user_id").distinct().count()
    assert sum(r["n"] for r in rows) == n_users
    for r in rows:
        assert 0.0 <= r["obs_rate"] <= 1.0
        assert 0.0 <= r["mean_pred"] <= 1.0
    # bins are ordered in predicted probability by construction
    by_bin = sorted(rows, key=lambda r: r["bin"])
    preds = [r["mean_pred"] for r in by_bin]
    assert preds == sorted(preds)
    # global Brier equals the n-weighted mean of per-bin Briers AND a
    # direct recompute from the per-user frame
    global_brier = sum(r["brier"] * r["n"] for r in rows) / n_users
    per_user = (
        _t(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("score"),
            F.max(
                ((F.col("event_type") == "purchase") & (F.col("value") > 150.0)).cast("int")
            ).alias("label"),
        )
        .collect()
    )
    ranked = sorted(per_user, key=lambda r: (r["score"], r["user_id"]))
    n = len(ranked)
    # percent_rank with ties: rank of first peer / (n-1)
    first_at: dict = {}
    for i, r in enumerate(ranked):
        first_at.setdefault(r["score"], i)
    direct = sum(
        (first_at[r["score"]] / (n - 1) - r["label"]) ** 2 for r in ranked
    ) / n
    assert abs(global_brier - direct) < 1e-9


def test_logrank_against_python_life_table(spark, sf_dir):
    from airflow_crypto_etl_spark.functions.hashing import KNUTH, MERSENNE_P

    ev = (
        _t(spark, sf_dir, "events")
        .select(
            "user_id",
            F.to_date(F.col("ts").cast("timestamp")).alias("day"),
            "event_type",
        )
        .collect()
    )
    users: dict = {}
    for r in ev:
        u = users.setdefault(r["user_id"], {"d0": r["day"], "buy": None, "last": r["day"]})
        u["d0"] = min(u["d0"], r["day"])
        u["last"] = max(u["last"], r["day"])
        if r["event_type"] == "purchase":
            u["buy"] = r["day"] if u["buy"] is None else min(u["buy"], r["day"])
    a_hash = lambda x: ((1 + qe._AB_SALT * KNUTH) % MERSENNE_P * x
                        + (7 + qe._AB_SALT * 40503) % MERSENNE_P) % MERSENNE_P
    tab = []
    for uid, u in users.items():
        if u["buy"] is not None:
            tab.append(((u["buy"] - u["d0"]).days, 1, int(a_hash(uid) % 2 == 0)))
        else:
            tab.append(((u["last"] - u["d0"]).days, 0, int(a_hash(uid) % 2 == 0)))
    cells: dict = {}
    for dur, evt, a in tab:
        c = cells.setdefault(dur, [0, 0, 0, 0])  # d, n_at, d_a, n_at_a
        c[0] += evt
        c[1] += 1
        c[2] += evt * a
        c[3] += a
    n_risk, n_risk_a = len(tab), sum(a for _, _, a in tab)
    o = e = v = 0.0
    for dur in sorted(cells):
        d, n_at, d_a, n_at_a = cells[dur]
        if d > 0 and n_risk > 1:
            o += d_a
            e += d * n_risk_a / n_risk
            v += (
                d * (n_risk - d) * n_risk_a * (n_risk - n_risk_a)
                / (n_risk * n_risk * (n_risk - 1))
            )
        n_risk -= n_at
        n_risk_a -= n_at_a
    r = qe.q_logrank(spark, sf_dir).collect()[0]
    assert r["o_a"] == o
    assert abs(r["e_a"] - e) < 1e-9
    assert abs(r["var_a"] - v) < 1e-9
    assert abs(r["chi2"] - (o - e) ** 2 / v) < 1e-9


def _arm_a(uid):
    from airflow_crypto_etl_spark.functions.hashing import KNUTH, MERSENNE_P

    a = (1 + qe._AB_SALT * KNUTH) % MERSENNE_P
    b = (7 + qe._AB_SALT * 40503) % MERSENNE_P
    return (a * uid + b) % MERSENNE_P % 2 == 0


def test_mann_whitney_against_python_ranks(spark, sf_dir):
    rows = (
        _t(spark, sf_dir, "events")
        .where(F.col("event_type") == "purchase")
        .select(
            F.floor(F.col("value") * 1000.0).cast("bigint").alias("v"),
            "user_id",
        )
        .collect()
    )
    import math as m

    samples = sorted((r["v"], 1 if _arm_a(r["user_id"]) else 0) for r in rows)
    n = len(samples)
    # tie-averaged ranks
    ranks: dict = {}
    i = 0
    vals = [v for v, _ in samples]
    while i < n:
        j = i
        while j < n and vals[j] == vals[i]:
            j += 1
        ranks[vals[i]] = (i + 1 + j) / 2  # avg of ranks i+1 .. j
        i = j
    n_a = sum(a for _, a in samples)
    n_b = n - n_a
    r_a = sum(ranks[v] for v, a in samples if a)
    u_a = r_a - n_a * (n_a + 1) / 2
    tie_cubes = 0
    from collections import Counter

    for t in Counter(vals).values():
        tie_cubes += t * t * t - t
    var = n_a * n_b / 12 * ((n + 1) - tie_cubes / (n * (n - 1)))
    z = (u_a - n_a * n_b / 2) / m.sqrt(var)
    got = qe.q_mann_whitney(spark, sf_dir).collect()[0]
    assert (got["n_a"], got["n_b"]) == (n_a, n_b)
    assert abs(got["u_a"] - u_a) < 1e-9
    assert abs(got["z_stat"] - z) < 1e-9


def test_effect_size_against_python_moments(spark, sf_dir):
    import math as m

    per_user = (
        _t(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(
            F.coalesce(
                F.sum(
                    F.when(
                        F.col("event_type") == "purchase",
                        F.floor(F.col("value") * 100.0).cast("bigint"),
                    )
                ),
                F.lit(0),
            ).alias("x")
        )
        .collect()
    )
    xa = [r["x"] for r in per_user if _arm_a(r["user_id"])]
    xb = [r["x"] for r in per_user if not _arm_a(r["user_id"])]
    na, nb = len(xa), len(xb)
    mean_a, mean_b = sum(xa) / na / 100, sum(xb) / nb / 100
    ss_a = sum(x * x for x in xa) - sum(xa) ** 2 / na
    ss_b = sum(x * x for x in xb) - sum(xb) ** 2 / nb
    sp = m.sqrt((ss_a + ss_b) / (na + nb - 2)) / 100
    d = (mean_a - mean_b) / sp
    g = d * (1 - 3 / (4 * (na + nb) - 9))
    got = qe.q_effect_size(spark, sf_dir).collect()[0]
    assert (got["n_a"], got["n_b"]) == (na, nb)
    assert abs(got["mean_a"] - mean_a) < 1e-9
    assert abs(got["pooled_sd"] - sp) < 1e-9
    assert abs(got["cohens_d"] - d) < 1e-9
    assert abs(got["hedges_g"] - g) < 1e-9


def test_srm_check_chi2_and_conservation(spark, sf_dir):
    rows = qe.q_srm_check(spark, sf_dir).collect()
    assert rows
    daily_users = (
        _t(spark, sf_dir, "events")
        .select(F.to_date(F.col("ts").cast("timestamp")).alias("day"), "user_id")
        .distinct()
        .groupBy("day")
        .count()
        .collect()
    )
    want = {r["day"]: r["count"] for r in daily_users}
    for r in rows:
        assert r["n_a"] + r["n_b"] == want[r["day"]]
        expect = (r["n_a"] - r["n_b"]) ** 2 / (r["n_a"] + r["n_b"])
        assert abs(r["chi2"] - expect) < 1e-9


def test_stream_ab_matches_batch_rollup(spark, sf_dir):
    """The streaming emission must equal the batch groupBy twin row for
    row (bounded replay determinism), and each window's arm counts must
    reconcile with the global event count."""
    got = {(r["window_start"], r["arm"]): r for r in qe.q_stream_ab(spark, sf_dir).collect()}
    batch = (
        _t(spark, sf_dir, "events")
        .select(
            F.date_trunc("hour", F.col("ts").cast("timestamp")).alias("window_start"),
            F.when(qe.affine_hash(F.col("user_id"), F.lit(qe._AB_SALT)) % 2 == 0, "A")
            .otherwise("B")
            .alias("arm"),
            ((F.col("event_type") == "purchase") & (F.col("value") > 150.0))
            .cast("int")
            .alias("conv"),
        )
        .groupBy("window_start", "arm")
        .agg(F.count(F.lit(1)).alias("n_events"), F.sum("conv").alias("n_conv"))
        .collect()
    )
    assert len(batch) == len(got)
    total = 0
    for r in batch:
        g = got[(r["window_start"], r["arm"])]
        assert (g["n_events"], g["n_conv"]) == (r["n_events"], r["n_conv"])
        total += r["n_events"]
    assert total == _t(spark, sf_dir, "events").count()


def test_psi_symmetric_halves_small_and_formula(spark, sf_dir):
    r = qe.q_psi(spark, sf_dir).collect()[0]
    # iid hash halves of the same distribution: PSI well under the
    # classic 0.1 "no shift" threshold, and non-negative (each term
    # (pa-pb)·ln(pa/pb) >= 0)
    assert 0.0 <= r["psi"] < 0.1
    assert r["max_contrib"] <= r["psi"] + 1e-12
    assert r["n_buckets"] >= 2


def test_hte_segments_reconcile_with_global_ab(spark, sf_dir):
    rows = qe.q_hte_segments(spark, sf_dir).collect()
    ab = qe.q_ab_test(spark, sf_dir).collect()[0]
    assert sum(r["n_a"] for r in rows) == ab["n_a"]
    assert sum(r["n_b"] for r in rows) == ab["n_b"]
    assert sum(r["c_a"] for r in rows) == ab["c_a"]
    assert sum(r["c_b"] for r in rows) == ab["c_b"]
    for r in rows:
        if r["rate_a"] is not None and r["rate_b"] is not None:
            assert abs(r["lift"] - (r["rate_a"] - r["rate_b"])) < 1e-12
        for rate in (r["rate_a"], r["rate_b"]):
            assert rate is None or 0.0 <= rate <= 1.0


def test_jsd_bounds(spark, sf_dir):
    r = qe.q_jsd(spark, sf_dir).collect()[0]
    # JSD is symmetric and bounded: 0 <= JSD <= ln 2 (== 1 bit)
    assert -1e-12 <= r["jsd_nats"] <= math.log(2) + 1e-12
    assert abs(r["jsd_bits"] - r["jsd_nats"] / math.log(2)) < 1e-12
    assert r["n_p"] > 0 and r["n_q"] > 0


def test_spearman_against_python_ranks(spark, sf_dir):
    per_user = (
        _t(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("f"),
            F.coalesce(
                F.sum(
                    F.when(
                        F.col("event_type") == "purchase",
                        F.floor(F.col("value") * 100.0).cast("bigint"),
                    )
                ),
                F.lit(0),
            ).alias("m"),
        )
        .collect()
    )

    def tie_ranks(vals):
        order = sorted(range(len(vals)), key=lambda i: vals[i])
        ranks = [0.0] * len(vals)
        i = 0
        while i < len(order):
            j = i
            while j < len(order) and vals[order[j]] == vals[order[i]]:
                j += 1
            avg = (i + 1 + j) / 2
            for k in range(i, j):
                ranks[order[k]] = avg
            i = j
        return ranks

    fs = [r["f"] for r in per_user]
    ms = [r["m"] for r in per_user]
    rf, rm = tie_ranks(fs), tie_ranks(ms)
    n = len(fs)
    sr, ss = sum(rf), sum(rm)
    srs = sum(a * b for a, b in zip(rf, rm))
    srr = sum(a * a for a in rf)
    sss = sum(b * b for b in rm)
    rho = (srs - sr * ss / n) / math.sqrt(
        (srr - sr * sr / n) * (sss - ss * ss / n)
    )
    got = qe.q_spearman(spark, sf_dir).collect()[0]
    assert got["n"] == n
    assert abs(got["spearman_rho"] - rho) < 1e-9
    assert -1.0 - 1e-12 <= got["spearman_rho"] <= 1.0 + 1e-12


def test_cohort_ltv_monotone_and_conserves_revenue(spark, sf_dir):
    rows = qe.q_cohort_ltv(spark, sf_dir).collect()
    assert rows
    by_cohort: dict = {}
    for r in rows:
        by_cohort.setdefault(r["cohort_day"], []).append(r)
    total = 0.0
    for curve in by_cohort.values():
        curve.sort(key=lambda r: r["day_offset"])
        prev = 0.0
        for r in curve:
            assert r["cum_ltv_per_user"] >= prev - 1e-12  # LTV never decreases
            prev = r["cum_ltv_per_user"]
            assert r["day_offset"] >= 0
            total += r["revenue"]
    want = (
        _t(spark, sf_dir, "events")
        .where(F.col("event_type") == "purchase")
        .agg((F.sum(F.floor(F.col("value") * 100.0).cast("bigint")) / 100.0).alias("t"))
        .collect()[0]["t"]
    )
    assert abs(total - want) < 1e-6


def test_power_ab_formula(spark, sf_dir):
    import math as m

    r = qe.q_power_ab(spark, sf_dir).collect()[0]
    pa, pb = r["rate_a"], r["rate_b"]
    pbar = None
    ab = qe.q_ab_test(spark, sf_dir).collect()[0]
    assert abs(pa - ab["rate_a"]) < 1e-12 and abs(pb - ab["rate_b"]) < 1e-12
    pbar = (ab["c_a"] + ab["c_b"]) / (ab["n_a"] + ab["n_b"])
    za, zb = 1.959963984540054, 0.8416212335729143
    num = za * m.sqrt(2 * pbar * (1 - pbar)) + zb * m.sqrt(
        pa * (1 - pa) + pb * (1 - pb)
    )
    want = m.ceil(num * num / (pa - pb) ** 2)
    assert r["n_per_arm_required"] == want
    assert r["n_per_arm_required"] > 0


def test_basket_rules_consistent_with_audience_overlap(spark, sf_dir):
    rules = {(r["type_a"], r["type_b"]): r for r in qe.q_basket_rules(spark, sf_dir).collect()}
    overlap = {
        (r["type_a"], r["type_b"]): r for r in qe.q_audience_overlap(spark, sf_dir).collect()
    }
    n_users = _t(spark, sf_dir, "events").select("user_id").distinct().count()
    assert set(rules) == set(overlap)
    for key, r in rules.items():
        o = overlap[key]
        assert r["n_both"] == o["n_both"]
        assert abs(r["conf_a_to_b"] - r["n_both"] / o["n_a"]) < 1e-12
        assert abs(r["conf_b_to_a"] - r["n_both"] / o["n_b"]) < 1e-12
        assert abs(r["support"] - r["n_both"] / n_users) < 1e-12
        assert abs(r["lift"] - r["n_both"] * n_users / (o["n_a"] * o["n_b"])) < 1e-12
        assert 0.0 < r["conf_a_to_b"] <= 1.0 and 0.0 < r["conf_b_to_a"] <= 1.0


def test_sequential_ab_final_day_equals_fixed_horizon(spark, sf_dir):
    """On the last monitored day all conversions have accrued, so the
    monitor's z must equal q_ab_test's fixed-horizon z (same label,
    same arms), the boundary must equal the bare OBF constant
    (information fraction = 1), and cumulative conversions must
    telescope to the arm totals."""
    mon = qe.q_sequential_ab(spark, sf_dir).orderBy("day").collect()
    assert len(mon) >= 2
    last = mon[-1]
    fixed = qe.q_ab_test(spark, sf_dir).collect()[0]
    assert (last.c_a, last.c_b) == (fixed.c_a, fixed.c_b)
    assert (last.n_a, last.n_b) == (fixed.n_a, fixed.n_b)
    assert abs(last.z_stat - fixed.z_stat) < 1e-12
    assert abs(last.boundary - qe._SEQ_C) < 1e-12
    # cumulative counts are nondecreasing day over day
    for prev, cur in zip(mon, mon[1:]):
        assert cur.c_a >= prev.c_a and cur.c_b >= prev.c_b
