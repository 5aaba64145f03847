"""Round-13 operators: Mann-Whitney U, Brown-Forsythe (Levene) W,
classical OLS daily trend, hapax/lexical-richness stats.  Each test
pins the result against an independent pure-Python computation on a
corpus small enough to verify by hand (the DuckDB differential sweep
is the scale gate)."""

from __future__ import annotations

import math

import pytest

from parcial_bigdata_spark.operators import analytics as ana
from parcial_bigdata_spark.operators import text as t


def _r(x, k):
    return math.floor(x * 10**k + 0.5) / 10**k


class TestMannWhitney:
    def test_hand_computed_ties(self, spark):
        # A: [1, 2, 2, 5]   R: [2, 3, 5, 5, 6]
        # pooled ranks: 1->1; 2,2,2 -> avg 3; 3->5; 5,5,5 -> avg 7; 6->9
        # R_a = 1 + 3 + 3 + 7 = 14, U_a = 14 - 4*5/2 = 4
        rows = [("A", 1.0), ("A", 2.0), ("A", 2.0), ("A", 5.0),
                ("R", 2.0), ("R", 3.0), ("R", 5.0), ("R", 5.0),
                ("R", 6.0), ("N", 50.0)]  # N-flag row must be ignored
        li = spark.createDataFrame(
            rows, "l_returnflag string, l_quantity double"
        )
        out = ana.mann_whitney_quantity(li).collect()[0]
        assert (out["n_a"], out["n_b"]) == (4, 5)
        assert out["u_stat"] == 4.0
        # ties: c = [1, 3, 1, 3, 1] -> sum(c^3 - c) = 24 + 24 = 48
        assert out["tie_term"] == 48
        na, nb, n, ties, u = 4.0, 5.0, 9.0, 48.0, 4.0
        mu = na * nb / 2.0
        sigma2 = (na * nb / 12.0) * ((n + 1) - ties / (n * (n - 1)))
        z = (u - mu) / math.sqrt(sigma2)
        assert out["z_score"] == pytest.approx(_r(z, 6), abs=1e-12)
        assert out["significant_95"] == (abs(z) > 1.959964)

    def test_no_ties_symmetric(self, spark):
        # identical distributions: z == 0 exactly, U = n_a*n_b/2
        rows = [("A", float(v)) for v in (1, 3, 5)] + [
            ("R", float(v)) for v in (2, 4, 6)
        ]
        li = spark.createDataFrame(
            rows, "l_returnflag string, l_quantity double"
        )
        out = ana.mann_whitney_quantity(li).collect()[0]
        # ranks 1..6, R_a = 1+3+5 = 9, U_a = 9 - 6 = 3; mu = 4.5
        assert out["u_stat"] == 3.0
        assert out["tie_term"] == 0
        assert not out["significant_95"]

    def test_degenerate_inputs_null_not_raise(self, spark):
        # one group empty: U and z undefined (NULL), no ANSI
        # DIVIDE_BY_ZERO from the sigma2 expression
        li = spark.createDataFrame(
            [("A", 1.0), ("A", 2.0)],
            "l_returnflag string, l_quantity double",
        )
        out = ana.mann_whitney_quantity(li).collect()[0]
        assert (out["n_a"], out["n_b"]) == (2, 0)
        assert out["u_stat"] is None and out["z_score"] is None
        # every pooled value tied: sigma = 0 -> z NULL, U defined
        li2 = spark.createDataFrame(
            [("A", 5.0), ("A", 5.0), ("R", 5.0)],
            "l_returnflag string, l_quantity double",
        )
        out2 = ana.mann_whitney_quantity(li2).collect()[0]
        # dr = 2*0+3+1 = 4, r2a = 2*4 = 8, U_a = (8 - 2*3)/2 = 1.0
        assert out2["u_stat"] == 1.0
        assert out2["z_score"] is None


class TestLeveneValue:
    def test_hand_computed_two_groups(self, spark):
        import datetime as dt

        t0 = dt.datetime(2024, 1, 1)
        xs = [1.0, 2.0, 3.0, 4.0, 100.0]   # lower median 3
        ys = [10.0, 10.0, 10.0, 10.0]      # median 10, zero deviations
        rows = [(i, "X", t0, 1, v) for i, v in enumerate(xs)] + [
            (100 + i, "Y", t0, 2, v) for i, v in enumerate(ys)
        ]
        ev = spark.createDataFrame(
            rows, "event_id long, event_type string, ts timestamp,"
            " user_id long, value double",
        )
        out = ana.levene_value_by_type(ev).collect()[0]
        assert (out["k_groups"], out["n_total"]) == (2, 9)
        assert (out["df1"], out["df2"]) == (1, 7)
        # z_X = [2,1,0,1,97]: sz=101 sq=9415; z_Y all 0
        sz, n_x = 101.0, 5.0
        zbar_g = sz / n_x
        num = n_x * zbar_g * zbar_g - 9.0 * (sz / 9.0) ** 2
        den = 9415.0 - sz * (sz / n_x)
        w = ((9.0 - 2.0) / 1.0) * num / den
        assert out["mean_abs_dev"] == pytest.approx(_r(sz / 9.0, 6), abs=1e-12)
        assert out["w_stat"] == pytest.approx(_r(w, 4), abs=1e-12)

    def test_null_values_excluded(self, spark):
        import datetime as dt

        # NULL values must not enter n, the median frame, or the
        # deviation moments (cross-engine NULLS FIRST/LAST hazard)
        rows = [(0, "X", dt.datetime(2024, 1, 1), 1, None)] + [
            (i, "X", dt.datetime(2024, 1, 1), 1, v)
            for i, v in enumerate([1.0, 2.0, 3.0], start=1)
        ]
        ev = spark.createDataFrame(
            rows, "event_id long, event_type string, ts timestamp,"
            " user_id long, value double",
        )
        out = ana.levene_value_by_type(ev).collect()[0]
        assert out["n_total"] == 3  # the NULL row is gone
        # median 2, z = [1,0,1] -> mean abs dev 2/3
        assert out["mean_abs_dev"] == pytest.approx(_r(2 / 3, 6))

    def test_even_group_lower_median(self, spark):
        import datetime as dt

        # even n: the LOWER median (first v with 2*cum >= n) is 2, not 2.5
        rows = [(i, "X", dt.datetime(2024, 1, 1), 1, v)
                for i, v in enumerate([1.0, 2.0, 3.0, 4.0])]
        ev = spark.createDataFrame(
            rows, "event_id long, event_type string, ts timestamp,"
            " user_id long, value double",
        )
        out = ana.levene_value_by_type(ev).collect()[0]
        # z about med=2: [1,0,1,2] -> mean abs dev = 1.0; W undefined
        # for a single group (df1 = 0) -> NULL, not a raise
        assert out["mean_abs_dev"] == pytest.approx(1.0)
        assert out["w_stat"] is None
        assert out["df1"] == 0


class TestOlsDailyTrend:
    def test_perfect_line(self, spark):
        rows = [(1, "1998-01-01", 10.0), (2, "1998-01-02", 20.0),
                (3, "1998-01-03", 30.0)]
        orders = spark.createDataFrame(
            rows, "o_orderkey long, o_orderdate string, o_totalprice double"
        ).withColumn("o_orderdate", orders_ts("o_orderdate"))
        out = ana.ols_daily_trend(orders).collect()[0]
        assert out["n_days"] == 3
        assert out["slope_per_day"] == pytest.approx(10.0)
        assert out["intercept"] == pytest.approx(10.0)
        assert out["r_squared"] == pytest.approx(1.0)

    def test_single_day_null_fit(self, spark):
        # sxx = 0: the fit is undefined -> NULLs, not DIVIDE_BY_ZERO
        orders = spark.createDataFrame(
            [(1, "1998-01-01", 10.0), (2, "1998-01-01", 20.0)],
            "o_orderkey long, o_orderdate string, o_totalprice double",
        ).withColumn("o_orderdate", orders_ts("o_orderdate"))
        out = ana.ols_daily_trend(orders).collect()[0]
        assert out["n_days"] == 1
        assert out["slope_per_day"] is None
        assert out["r_squared"] is None

    def test_flat_series_r2_null(self, spark):
        # syy_c = 0 (perfectly flat): slope 0, R^2 is 0/0 -> NULL
        orders = spark.createDataFrame(
            [(1, "1998-01-01", 10.0), (2, "1998-01-02", 10.0)],
            "o_orderkey long, o_orderdate string, o_totalprice double",
        ).withColumn("o_orderdate", orders_ts("o_orderdate"))
        out = ana.ols_daily_trend(orders).collect()[0]
        assert out["slope_per_day"] == 0.0
        assert out["r_squared"] is None

    def test_daily_sums_and_noise(self, spark):
        # two orders on day 0 sum before the fit; day indexes skip a gap
        rows = [(1, "1998-01-01", 4.0), (2, "1998-01-01", 6.0),
                (3, "1998-01-02", 14.0), (4, "1998-01-04", 26.0)]
        orders = spark.createDataFrame(
            rows, "o_orderkey long, o_orderdate string, o_totalprice double"
        ).withColumn("o_orderdate", orders_ts("o_orderdate"))
        out = ana.ols_daily_trend(orders).collect()[0]
        ts_, ys = [0.0, 1.0, 3.0], [10.0, 14.0, 26.0]
        n = 3.0
        st, stt = sum(ts_), sum(x * x for x in ts_)
        sy, sty = sum(ys), sum(x * y for x, y in zip(ts_, ys))
        syy = sum(y * y for y in ys)
        sxx, sxy = n * stt - st * st, n * sty - st * sy
        syy_c = n * syy - sy * sy
        slope = sxy / sxx
        assert out["slope_per_day"] == pytest.approx(_r(slope, 6), abs=1e-12)
        assert out["intercept"] == pytest.approx(
            _r((sy - slope * st) / n, 2), abs=1e-12
        )
        assert out["r_squared"] == pytest.approx(
            _r(sxy * sxy / (sxx * syy_c), 6), abs=1e-12
        )


class TestHapaxStats:
    def test_hand_computed(self, spark):
        docs = spark.createDataFrame(
            [(1, "a b a c", "en", "s", 7), (2, "b d", "en", "s", 3)],
            "doc_id long, text string, lang string, source string,"
            " n_chars long",
        )
        out = t.hapax_stats(docs).collect()[0]
        # counts: a2 b2 c1 d1
        assert (out["n_tokens"], out["vocab_size"], out["hapax_count"]) == (
            6, 4, 2,
        )
        assert out["hapax_share"] == pytest.approx(0.5)
        assert out["type_token_ratio"] == pytest.approx(_r(4 / 6, 6))
        assert out["herdan_c"] == pytest.approx(
            _r(math.log(4) / math.log(6), 6), abs=1e-12
        )

    def test_degenerate_single_token(self, spark):
        # ln(1) = 0: Herdan's C undefined -> NULL, not DIVIDE_BY_ZERO
        docs = spark.createDataFrame(
            [(1, "hello", "en", "s", 5)],
            "doc_id long, text string, lang string, source string,"
            " n_chars long",
        )
        out = t.hapax_stats(docs).collect()[0]
        assert (out["n_tokens"], out["vocab_size"]) == (1, 1)
        assert out["hapax_share"] == 1.0
        assert out["herdan_c"] is None

    def test_normalization_and_empty_tokens(self, spark):
        # punctuation collapses to spaces; casing folds; empties dropped
        docs = spark.createDataFrame(
            [(1, "Hello, HELLO!! world...", "en", "s", 23)],
            "doc_id long, text string, lang string, source string,"
            " n_chars long",
        )
        out = t.hapax_stats(docs).collect()[0]
        assert (out["n_tokens"], out["vocab_size"], out["hapax_count"]) == (
            3, 2, 1,
        )


def orders_ts(col):
    from pyspark.sql import functions as F

    return F.to_timestamp(col)


class TestChi2Independence:
    def test_hand_computed_2x2(self, spark):
        # 2x2 table: rows F/O, cols A/B with counts [[10, 20], [30, 40]]
        rows = (
            [("F", "A")] * 10 + [("F", "B")] * 20
            + [("O", "A")] * 30 + [("O", "B")] * 40
        )
        orders = spark.createDataFrame(
            [(i, s, p) for i, (s, p) in enumerate(rows)],
            "o_orderkey long, o_orderstatus string, o_orderpriority string",
        )
        out = ana.chi2_independence(orders).collect()[0]
        assert (out["n_total"], out["n_row_cats"], out["n_col_cats"]) == (
            100, 2, 2,
        )
        assert out["dof"] == 1
        # expected: e = rn*cn/N; chi2 = sum (n-e)^2/e
        chi2 = 0.0
        for n, rn, cn in [(10, 30, 40), (20, 30, 60), (30, 70, 40),
                          (40, 70, 60)]:
            e = rn * (cn / 100.0)
            chi2 += (n - e) * (n - e) / e
        assert out["chi2"] == pytest.approx(round(chi2, 4), abs=1e-9)
        assert out["cramers_v"] == pytest.approx(
            _r(math.sqrt(chi2 / 100.0), 6), abs=1e-9
        )

    def test_single_category_null_v(self, spark):
        orders = spark.createDataFrame(
            [(1, "F", "A"), (2, "F", "A"), (3, "F", "A")],
            "o_orderkey long, o_orderstatus string, o_orderpriority string",
        )
        out = ana.chi2_independence(orders).collect()[0]
        assert out["dof"] == 0
        assert out["chi2"] == 0.0
        assert out["cramers_v"] is None

    def test_empty_input_matches_oracle_arithmetic(self, spark):
        # fully-empty (or all-NULL-category) input: the oracle's
        # count-over-empty-CTE arithmetic yields n_row_cats=0,
        # n_col_cats=0, dof=(0-1)*(0-1)=1, NULL n_total/chi2/cramers_v;
        # the operator must coalesce its F.first-over-empty-agg NULLs to
        # the same values (round-13 ADVICE degenerate alignment)
        orders = spark.createDataFrame(
            [(1, None, None)],
            "o_orderkey long, o_orderstatus string, o_orderpriority string",
        )
        out = ana.chi2_independence(orders).collect()[0]
        assert (out["n_row_cats"], out["n_col_cats"], out["dof"]) == (
            0, 0, 1,
        )
        assert out["n_total"] is None
        assert out["chi2"] is None
        assert out["cramers_v"] is None


class TestKendallTau:
    def test_perfect_concordance(self, spark):
        li = spark.createDataFrame(
            [("x", 1.0, 0.01), ("x", 2.0, 0.02), ("x", 3.0, 0.03)],
            "l_returnflag string, l_quantity double, l_discount double",
        )
        out = ana.kendall_tau_quantity_discount(li).collect()[0]
        assert (out["concordant"], out["discordant"]) == (3.0, 0.0)
        assert out["tau_b"] == pytest.approx(1.0)

    def test_hand_computed_with_ties(self, spark):
        # pairs over (q, d): (1,.01) (1,.02) (2,.01) (2,.02) (2,.02)
        # x-pairs (xb > xa): (1,.01)-(2,*): vs .01 tie, .02 conc x2
        #                    (1,.02)-(2,.01) disc; (1,.02)-(2,.02) tie x2
        # C = 2, D = 1; ties: t_x: n=2,3 -> t1 = 1 + 3 = 4
        # t_y: n=2 (.01), 3 (.02) -> t2 = 1 + 3 = 4; n0 = 10
        data = [(1.0, 0.01), (1.0, 0.02), (2.0, 0.01), (2.0, 0.02),
                (2.0, 0.02)]
        li = spark.createDataFrame(
            [("x", q, d) for q, d in data],
            "l_returnflag string, l_quantity double, l_discount double",
        )
        out = ana.kendall_tau_quantity_discount(li).collect()[0]
        assert (out["concordant"], out["discordant"]) == (2.0, 1.0)
        tau = (2 - 1) / math.sqrt((10 - 4) * (10 - 4))
        assert out["tau_b"] == pytest.approx(_r(tau, 6), abs=1e-12)

    def test_all_tied_null_tau(self, spark):
        li = spark.createDataFrame(
            [("x", 5.0, 0.01)] * 4,
            "l_returnflag string, l_quantity double, l_discount double",
        )
        out = ana.kendall_tau_quantity_discount(li).collect()[0]
        assert out["tau_b"] is None


class TestRunsTest:
    def test_hand_computed_alternating(self, spark):
        # daily revenue 1,9,1,9,1,9 -> median 1 (lower), days equal to
        # the median DROP, leaving 3 above -> one run of 3... build a
        # clearer series instead: 1,9,2,8,3,7 -> lower median 3;
        # drop the 3-day; signs by date: 1:below 9:above 2:below
        # 8:above 7:above -> runs B,A,B,A,A -> R=4, n1=3, n2=2
        vals = [1.0, 9.0, 2.0, 8.0, 3.0, 7.0]
        orders = spark.createDataFrame(
            [(i, f"1998-01-0{i+1}", v) for i, v in enumerate(vals)],
            "o_orderkey long, o_orderdate string, o_totalprice double",
        ).withColumn("o_orderdate", orders_ts("o_orderdate"))
        out = ana.runs_test_daily_revenue(orders).collect()[0]
        assert (out["n_above"], out["n_below"], out["n_runs"]) == (3, 2, 4)
        n1, n2, r = 3.0, 2.0, 4.0
        mu = 2 * n1 * n2 / (n1 + n2) + 1
        s2 = (2 * n1 * n2 * (2 * n1 * n2 - n1 - n2)
              / ((n1 + n2) ** 2 * (n1 + n2 - 1)))
        assert out["z_score"] == pytest.approx(
            _r((r - mu) / math.sqrt(s2), 6), abs=1e-12
        )

    def test_flat_series_null_z(self, spark):
        orders = spark.createDataFrame(
            [(i, f"1998-01-0{i+1}", 10.0) for i in range(4)],
            "o_orderkey long, o_orderdate string, o_totalprice double",
        ).withColumn("o_orderdate", orders_ts("o_orderdate"))
        out = ana.runs_test_daily_revenue(orders).collect()[0]
        # every day equals the median: all dropped, z undefined
        assert out["z_score"] is None


class TestKruskalWallis:
    """stats_kruskal_wallis (round 15): k-group rank omnibus on the
    cent grid — hand-computed H with ties, and the degenerate tiers."""

    def _ev(self, spark, rows):
        return spark.createDataFrame(rows, "event_type string, value double")

    def test_hand_computed_with_ties(self, spark):
        # a: [1, 2], b: [2, 3], c: [5] -> pooled ranks 1, 2.5, 2.5, 4, 5
        # R_a = 3.5, R_b = 6.5, R_c = 5; H = .4*52.25 - 18 = 2.9
        # tie term: one block of 2 -> 6; corr = 1 - 6/120 = .95
        rows = [("a", 1.0), ("a", 2.0), ("b", 2.0), ("b", 3.0), ("c", 5.0)]
        out = ana.kruskal_wallis_value(self._ev(spark, rows)).collect()[0]
        assert (out["n_total"], out["k_groups"], out["df"]) == (5, 3, 2)
        assert out["tie_term"] == 6
        assert out["h_stat"] == pytest.approx(_r(2.9 / 0.95, 4), abs=1e-12)

    def test_two_groups_matches_mann_whitney_z_squared(self, spark):
        # with k = 2 and no ties, H equals z² from the rank-sum normal
        # approximation (the classical identity) up to rounding
        rows = [("a", float(v)) for v in (1, 3, 5, 9)] + [
            ("b", float(v)) for v in (2, 4, 6, 8)
        ]
        out = ana.kruskal_wallis_value(self._ev(spark, rows)).collect()[0]
        # ranks 1..8: R_a = 1+3+5+8 = 17, R_b = 19; N = 8
        h = 12.0 / (8 * 9) * (17.0**2 / 4 + 19.0**2 / 4) - 3 * 9
        assert out["tie_term"] == 0
        assert out["h_stat"] == pytest.approx(_r(h, 4), abs=1e-12)

    def test_degenerate_single_group_and_all_tied(self, spark):
        one = ana.kruskal_wallis_value(
            self._ev(spark, [("a", 1.0), ("a", 2.0)])
        ).collect()[0]
        assert one["k_groups"] == 1 and one["h_stat"] is None
        tied = ana.kruskal_wallis_value(
            self._ev(spark, [("a", 7.0), ("b", 7.0), ("c", 7.0)])
        ).collect()[0]
        # every pooled value tied: correction term hits 0 -> NULL, no
        # ANSI DIVIDE_BY_ZERO
        assert tied["tie_term"] == 24 and tied["h_stat"] is None

    def test_null_values_excluded(self, spark):
        rows = [("a", 1.0), ("a", None), ("b", 2.0), ("b", 3.0)]
        out = ana.kruskal_wallis_value(self._ev(spark, rows)).collect()[0]
        assert out["n_total"] == 3


class TestMannKendall:
    """events_mann_kendall_trend (round 15): exact integer S + tie
    term, continuity-corrected z — hand-computed goldens."""

    def _ev(self, spark, days_counts):
        import datetime as dt
        rows = []
        eid = 0
        for day, n in enumerate(days_counts):
            for _ in range(n):
                rows.append(
                    (eid, dt.datetime(2024, 1, 1 + day, 12, 0, 0))
                )
                eid += 1
        return spark.createDataFrame(rows, "event_id long, ts timestamp")

    def test_hand_computed_with_ties(self, spark):
        # daily counts [3, 5, 4, 5]: S = +1+1+1-1+0+1 = 3
        # ties: one pair of 5s -> t(t-1)(2t+5) = 2*1*9 = 18
        # var = (4*3*13 - 18)/18 = 138/18; z = (3-1)/sqrt(var)
        out = ana.mann_kendall_daily(
            self._ev(spark, [3, 5, 4, 5])
        ).collect()[0]
        assert (out["n_days"], out["s_stat"], out["tie_term"]) == (4, 3, 18)
        z = 2.0 / math.sqrt(138.0 / 18.0)
        assert out["z_score"] == pytest.approx(_r(z, 6), abs=1e-12)
        assert not out["significant_95"]

    def test_strictly_increasing(self, spark):
        # counts [1,2,3,4,5]: S = 10 (all pairs +1), tie term 0
        out = ana.mann_kendall_daily(
            self._ev(spark, [1, 2, 3, 4, 5])
        ).collect()[0]
        assert (out["s_stat"], out["tie_term"]) == (10, 0)
        var = 5 * 4 * 15 / 18.0
        assert out["z_score"] == pytest.approx(_r(9 / math.sqrt(var), 6))

    def test_degenerate_flat_and_single_day(self, spark):
        flat = ana.mann_kendall_daily(
            self._ev(spark, [2, 2, 2])
        ).collect()[0]
        # every count tied: tie term == n(n-1)(2n+5) -> var 0 -> NULL
        assert flat["s_stat"] == 0 and flat["z_score"] is None
        one = ana.mann_kendall_daily(self._ev(spark, [4])).collect()[0]
        assert one["n_days"] == 1 and one["z_score"] is None


class TestSeasonalMannKendall:
    """events_seasonal_mann_kendall (round 15): within-weekday sign
    census, exact 18*Var season sum — hand-computed golden."""

    def test_hand_computed_two_seasons(self, spark):
        import datetime as dt
        rows, eid = [], 0
        # season A (3 same-weekday dates, counts 2/3/4): S_A = 3,
        # var18_A = 3*2*11 = 66, no ties
        for day, n in zip((1, 8, 15), (2, 3, 4)):
            for _ in range(n):
                rows.append((eid, dt.datetime(2024, 1, day, 9, 0, 0)))
                eid += 1
        # season B (2 dates, counts 5/5): S_B = 0, tie 2*1*9 = 18,
        # var18_B = 2*1*9 - 18 = 0
        for day in (2, 9):
            for _ in range(5):
                rows.append((eid, dt.datetime(2024, 1, day, 9, 0, 0)))
                eid += 1
        out = ana.seasonal_mann_kendall_daily(
            spark.createDataFrame(rows, "event_id long, ts timestamp")
        ).collect()[0]
        assert (out["n_days"], out["n_seasons"]) == (5, 2)
        assert (out["s_stat"], out["tie_term"]) == (3, 18)
        z = 2.0 / math.sqrt(66.0 / 18.0)
        assert out["z_score"] == pytest.approx(_r(z, 6), abs=1e-12)

    def test_weekly_cycle_is_invisible(self, spark):
        import datetime as dt
        # a pure weekly cycle (every Monday 5 events, every Tuesday 1)
        # with NO drift: within each season counts are constant ->
        # S = 0 and variance 0 -> z NULL (all-tied degenerate), where
        # the NON-seasonal test would see large |S| noise across days
        rows, eid = [], 0
        for week in range(3):
            for _ in range(5):
                rows.append((eid, dt.datetime(2024, 1, 1 + 7 * week)))
                eid += 1
            rows.append((eid, dt.datetime(2024, 1, 2 + 7 * week)))
            eid += 1
        out = ana.seasonal_mann_kendall_daily(
            spark.createDataFrame(rows, "event_id long, ts timestamp")
        ).collect()[0]
        assert out["s_stat"] == 0 and out["z_score"] is None

    def test_pre_epoch_weekdays_match_oracle(self, spark):
        """Round-15 advice (medium): Spark pmod(datediff, 7) is always
        in [0, 6] but DuckDB '%' is sign-preserving, so a bare '% 7' in
        the oracle put pre-1970 dates in NEGATIVE wd buckets — splitting
        the seasons differently from the engine (extra singleton
        seasons, different S / var / z).  The oracle now uses the
        double-mod non-negative form; this corpus straddles the epoch
        so both engines must merge 1969-12-31 (datediff -1, wd 6) into
        the same season as 1970-01-07 (datediff 6, wd 6)."""
        import datetime as dt

        import duckdb
        import pandas as pd

        from parcial_bigdata_spark.plans.registry import ORACLES

        rows, eid = [], 0
        # season wd=6: 1969-12-31 (2 events) + 1970-01-07 (5 events)
        # -> one sign pair ONLY if the pre-epoch day lands in wd 6
        for day, n in ((dt.datetime(1969, 12, 31), 2),
                       (dt.datetime(1970, 1, 7), 5),
                       # season wd=0: 1970-01-01 (1) + 1970-01-08 (3)
                       (dt.datetime(1970, 1, 1), 1),
                       (dt.datetime(1970, 1, 8), 3)):
            for _ in range(n):
                rows.append((eid, day))
                eid += 1
        out = ana.seasonal_mann_kendall_daily(
            spark.createDataFrame(rows, "event_id long, ts timestamp")
        ).collect()[0]
        # the merge itself: 2 two-day seasons, not 3 (one negative-wd
        # singleton is exactly what the broken oracle produced)
        assert (out["n_days"], out["n_seasons"]) == (4, 2)
        assert out["s_stat"] == 2
        con = duckdb.connect()
        ev = pd.DataFrame(rows, columns=["event_id", "ts"]).astype(
            {"ts": "datetime64[us]"}
        )
        # the registry oracle's events projection names every column
        ev["user_id"], ev["event_type"] = 1, "view"
        ev["value"], ev["props"] = 1.0, "{}"
        con.register("events", ev)
        ora = con.execute(
            ORACLES["events_seasonal_mann_kendall"]
        ).df().iloc[0]
        for col in ("n_days", "n_seasons", "s_stat", "tie_term"):
            assert int(ora[col]) == out[col], col
        assert ora["z_score"] == pytest.approx(out["z_score"], abs=1e-12)
        assert bool(ora["significant_95"]) == out["significant_95"]
