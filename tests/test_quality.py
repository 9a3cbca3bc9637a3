"""Law tests for the corpus-quality / robust-statistics battery
(queries_quality.py). Oracle parity is covered by test_oracle_parity's
registry sweep; these pin the algebraic invariants that would not show
up as a hash mismatch if both engines drifted together."""

from __future__ import annotations

from pyspark.sql import functions as F

from airflow_crypto_etl_spark import queries_quality as qq
from airflow_crypto_etl_spark.operators.text import tokens_col
from airflow_crypto_etl_spark.queries import _t


def test_lm_score_bounds_and_bigram_counts(spark, sf_dir):
    res = qq.q_lm_score(spark, sf_dir)
    toks = (
        _t(spark, sf_dir, "documents")
        .select("doc_id", F.size(tokens_col("text")).alias("n_tokens"))
        .where(F.col("n_tokens") >= 2)
    )
    j = res.join(toks, "doc_id", "full").collect()
    assert j, "empty LM score result"
    for r in j:
        # every multi-token doc scores, and n_bigrams == n_tokens - 1
        assert r["n_bigrams"] is not None and r["n_tokens"] is not None
        assert r["n_bigrams"] == r["n_tokens"] - 1
        # average conditional probability is a probability (floor
        # quantization can only shrink it, never push it past 1)
        assert 0.0 <= r["lm_score"] <= 1.0


def test_oov_rate_bounds(spark, sf_dir):
    rows = qq.q_oov_rate(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0 <= r["n_oov"] <= r["n_tokens"]
        assert abs(r["oov_rate"] - r["n_oov"] / r["n_tokens"]) < 1e-12
    # a top-100 vocabulary must cover SOMETHING in every language
    assert any(r["n_oov"] < r["n_tokens"] for r in rows)


def test_weighted_sample_exact_target_per_stratum(spark, sf_dir):
    """Systematic PPS law: the copies per stratum sum to EXACTLY the
    target n — floor(total·n/total) − floor(0) telescopes — and every
    document's inclusion count is ≤ ceil(w·n/total) + 1."""
    res = qq.q_sample_weighted(spark, sf_dir)
    per_lang = {r["lang"]: r["s"] for r in res.groupBy("lang").agg(F.sum("n_copies").alias("s")).collect()}
    langs = [r["lang"] for r in _t(spark, sf_dir, "documents").select("lang").distinct().collect()]
    assert set(per_lang) == set(langs)
    assert all(s == qq._WS_N for s in per_lang.values()), per_lang


def test_iqr_and_mad_outlier_counts_bounded(spark, sf_dir):
    iqr = qq.q_iqr_outliers(spark, sf_dir).collect()
    mad = qq.q_mad_outliers(spark, sf_dir).collect()
    assert len(iqr) == len(mad) > 0
    for r in iqr:
        assert 0 <= r["n_outliers"] <= r["n_total"]
        assert r["q1_milli"] <= r["q3_milli"]
        # Tukey fences at 1.5 IQR flag a minority tail, not the bulk
        assert r["n_outliers"] < 0.25 * r["n_total"]
    for r in mad:
        assert 0 <= r["n_outliers"] <= r["n_total"]
        assert r["mad"] >= 0


def test_top_paths_total_order_and_user_budget(spark, sf_dir):
    rows = qq.q_top_paths(spark, sf_dir).collect()
    assert 0 < len(rows) <= 10
    counts = [r["n_users"] for r in rows]
    assert counts == sorted(counts, reverse=True)
    n_users = _t(spark, sf_dir, "events").select("user_id").distinct().count()
    assert sum(counts) <= n_users
    # each path has at most _PATH_LEN stages
    assert all(len(r["path"].split(">")) <= qq._PATH_LEN for r in rows)


def test_cramers_v_in_unit_interval(spark, sf_dir):
    r = qq.q_cramers_v(spark, sf_dir).collect()[0]
    assert r["chi2"] >= 0
    assert r["dof_min"] >= 1
    assert 0.0 <= r["cramers_v"] <= 1.0


def test_pareto_frontier_no_dominated_rows(spark, sf_dir):
    """Skyline law: within a brand, no kept row is weakly dominated by
    any OTHER part row (cheaper-or-equal AND larger-or-equal with one
    strict), and every dropped row IS dominated by some kept row."""
    front = qq.q_pareto_frontier(spark, sf_dir).collect()
    parts = _t(spark, sf_dir, "part").select(
        "p_brand", "p_partkey", "p_retailprice", "p_size"
    ).collect()
    by_brand: dict = {}
    for r in parts:
        by_brand.setdefault(r["p_brand"], []).append(r)
    kept = {(r["p_brand"], r["p_partkey"]) for r in front}
    for r in front:
        rivals = by_brand[r["p_brand"]]
        for o in rivals:
            if o["p_partkey"] == r["p_partkey"]:
                continue
            dominates = (
                o["p_retailprice"] <= r["p_retailprice"]
                and o["p_size"] >= r["p_size"]
                and (
                    o["p_retailprice"] < r["p_retailprice"]
                    or o["p_size"] > r["p_size"]
                )
            )
            # equal-(price,size) twins: only the lowest partkey is kept
            twin = (
                o["p_retailprice"] == r["p_retailprice"]
                and o["p_size"] == r["p_size"]
            )
            assert not dominates or twin, (r, o)
    for brand, rivals in by_brand.items():
        for r in rivals:
            if (brand, r["p_partkey"]) in kept:
                continue
            assert any(
                o["p_retailprice"] <= r["p_retailprice"]
                and o["p_size"] >= r["p_size"]
                and (brand, o["p_partkey"]) in kept
                for o in rivals
                if o["p_partkey"] != r["p_partkey"]
            ), f"dropped but undominated: {r}"


def test_attribution_conserves_purchases_and_revenue(spark, sf_dir):
    res = qq.q_attribution_last_touch(spark, sf_dir).collect()
    ev = _t(spark, sf_dir, "events").where(F.col("event_type") == "purchase")
    n_purch = ev.count()
    assert sum(r["n_purchases"] for r in res) == n_purch
    channels = {r["channel"] for r in res}
    assert channels <= set(qq._TOUCHES) | {"direct"}
    # milli-quantized revenue conservation across channels
    total_milli = ev.select(
        F.sum(F.floor(F.col("value") * 1000.0).cast("bigint")).alias("s")
    ).collect()[0]["s"]
    assert abs(sum(r["revenue"] for r in res) - total_milli / 1000.0) < 1e-6


def test_benford_shares_sum_to_one(spark, sf_dir):
    rows = qq.q_benford(spark, sf_dir).collect()
    assert {r["digit"] for r in rows} <= set(range(1, 10))
    assert abs(sum(r["share"] for r in rows) - 1.0) < 1e-9
    # Benford expectations themselves sum to 1
    assert abs(sum(r["benford_p"] for r in rows) - 1.0) < 1e-9 or len(rows) < 9
    for r in rows:
        assert abs(r["abs_dev"] - abs(r["share"] - r["benford_p"])) < 1e-12


def test_bpe_pairs_against_python_recount(spark, sf_dir):
    """Exact cross-check: the top-10 weighted char-pair counts equal a
    driver-side pure-python recount over the same tokens."""
    rows = qq.q_bpe_pairs(spark, sf_dir).collect()
    texts = [r["text"] for r in _t(spark, sf_dir, "documents").select("text").collect()]
    from collections import Counter

    counts: Counter = Counter()
    for t in texts:
        for w in [x for x in t.split(" ") if x]:
            for i in range(len(w) - 1):
                counts[(w[i], w[i + 1])] += 1
    want = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    got = [((r["a"], r["b"]), r["n_pairs"]) for r in rows]
    assert got == want


def test_quantile_norm_bounds_and_extremes(spark, sf_dir):
    rows = qq.q_quantile_norm(spark, sf_dir).collect()
    by_src: dict = {}
    for r in rows:
        by_src.setdefault(r["source"], []).append(r)
    for src, rs in by_src.items():
        ranks = sorted(r["pct_rank"] for r in rs)
        assert ranks[0] == 0.0 and ranks[-1] == 1.0
        assert all(0.0 <= x <= 1.0 for x in ranks)
        # ordering by pct_rank must agree with ordering by (n_chars, doc_id)
        ordered = sorted(rs, key=lambda r: (r["n_chars"], r["doc_id"]))
        assert [r["pct_rank"] for r in ordered] == sorted(
            r["pct_rank"] for r in rs
        )


def test_lm_backoff_bounds_and_split_discipline(spark, sf_dir):
    res = qq.q_lm_backoff(spark, sf_dir)
    rows = res.collect()
    assert rows
    from airflow_crypto_etl_spark.functions.hashing import affine_hash

    docs = _t(spark, sf_dir, "documents")
    score_ids = {
        r["doc_id"]
        for r in docs.where(
            affine_hash(F.col("doc_id"), F.lit(qq._LM_SALT)) % 2 != 0
        ).select("doc_id").collect()
    }
    got_ids = {r["doc_id"] for r in rows}
    # only held-out docs are scored (multi-token ones)
    assert got_ids <= score_ids
    for r in rows:
        # interpolated probability stays a probability
        assert 0.0 <= r["backoff_score"] <= 1.0
        assert r["n_bigrams"] >= 1
    # the held-out corpus must contain bigrams unseen in training —
    # otherwise the backoff path is untested data-side
    held = docs.where(~(affine_hash(F.col("doc_id"), F.lit(qq._LM_SALT)) % 2 == 0))
    train = docs.where(affine_hash(F.col("doc_id"), F.lit(qq._LM_SALT)) % 2 == 0)

    def _bigrams(d):
        from airflow_crypto_etl_spark.operators.text import tokens_col

        base = d.select(tokens_col("text").alias("toks")).where(F.size("toks") >= 2)
        return base.selectExpr(
            "explode(transform(sequence(1, size(toks) - 1),"
            " i -> struct(toks[i-1] AS w1, toks[i] AS w2))) AS b"
        ).select("b.w1", "b.w2").distinct()

    unseen = _bigrams(held).join(_bigrams(train), ["w1", "w2"], "left_anti").count()
    assert unseen > 0


def test_dau_wau_and_new_returning_consistency(spark, sf_dir):
    """Cross-query conservation: per day, n_new + n_returning == dau;
    wau >= dau; stickiness in (0, 1]."""
    from airflow_crypto_etl_spark import queries_analytics as qa

    dw = {r["d"]: r for r in qa.q_dau_wau(spark, sf_dir).collect()}
    nr = {r["d"]: r for r in qa.q_new_vs_returning(spark, sf_dir).collect()}
    assert set(dw) == set(nr) and dw
    for d, r in dw.items():
        assert nr[d]["n_new"] + nr[d]["n_returning"] == r["dau"]
        assert r["wau"] >= r["dau"] >= 1
        assert 0.0 < r["stickiness"] <= 1.0
    # every user is new exactly once
    total_new = sum(r["n_new"] for r in nr.values())
    n_users = _t(spark, sf_dir, "events").select("user_id").distinct().count()
    assert total_new == n_users


def test_auc_and_decile_lift_laws(spark, sf_dir):
    """AUC in [0,1]; a perfect-score sanity twin (score := label)
    yields AUC near 1; decile lift weighted-averages to 1.0 and user
    counts conserve."""
    from airflow_crypto_etl_spark import queries_analytics as qa

    r = qa.q_auc(spark, sf_dir).collect()[0]
    assert r["n_pos"] > 0 and r["n_neg"] > 0
    assert 0.0 <= r["auc"] <= 1.0

    lift = qa.q_decile_lift(spark, sf_dir).collect()
    assert sorted(x["decile"] for x in lift) == list(range(1, 11))
    n_users = _t(spark, sf_dir, "events").select("user_id").distinct().count()
    assert sum(x["n_users"] for x in lift) == n_users
    tot_conv = sum(x["n_converted"] for x in lift)
    weighted = sum(x["lift"] * x["n_converted"] for x in lift if x["n_converted"])
    # Σ lift_d · conv_d = Σ (rate_d/overall) · conv_d... direct identity:
    # Σ n_users_d · rate_d = tot_conv, so Σ lift_d · n_users_d = n_users
    assert abs(sum(x["lift"] * x["n_users"] for x in lift) - n_users) < 1e-6 * n_users
    assert tot_conv > 0 and weighted > 0


def test_ks_drift_small_on_iid_halves_and_large_on_shift(spark, sf_dir):
    """On two hash-halves of the SAME distribution, D stays small; a
    deliberately shifted comparison would exceed it by an order of
    magnitude (sanity direction, not a calibrated test)."""
    r = qq.q_ks_drift(spark, sf_dir).collect()[0]
    assert r["n_a"] > 0 and r["n_b"] > 0
    assert abs(r["n_a"] - r["n_b"]) < 0.2 * (r["n_a"] + r["n_b"])
    assert 0.0 <= r["ks_d"] <= 1.0
    # iid halves of ~5k each: KS critical value at alpha=0.001 is
    # ~1.95*sqrt(2/n) ~= 0.055; a drifted feed would sit far above
    assert r["ks_d"] < 0.1


def test_cusum_drift_bounds(spark, sf_dir):
    rows = qq.q_cusum_drift(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["n_days"] >= 1
        assert r["max_cusum"] >= 0.0
        # |S_t| <= t * max|dev| and the final S_T telescopes to 0, so
        # the normalized statistic stays below the value range width
        assert r["max_cusum"] < 500.0 * r["n_days"]
