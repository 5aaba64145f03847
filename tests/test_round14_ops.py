"""Round-14 operators: Spearman rho, one-way ANOVA, Markov transition
census, lagged cross-correlation.  Each test pins the result against an
independent pure-Python computation on a corpus small enough to verify
by hand (the DuckDB differential sweep is the scale gate)."""

from __future__ import annotations

import datetime
import math

import pytest

from parcial_bigdata_spark.operators import analytics as ana


def _r(x, k):
    return math.floor(x * 10**k + 0.5) / 10**k


def _avg_ranks(vals):
    """Tie-averaged ranks of a list, as a value -> rank dict."""
    s = sorted(vals)
    ranks = {}
    i = 0
    while i < len(s):
        j = i
        while j < len(s) and s[j] == s[i]:
            j += 1
        ranks[s[i]] = (i + 1 + j) / 2.0
        i = j
    return ranks


def _pearson(xs, ys):
    n = float(len(xs))
    sx, sy = sum(xs), sum(ys)
    sxx = sum(x * x for x in xs)
    syy = sum(y * y for y in ys)
    sxy = sum(x * y for x, y in zip(xs, ys))
    vx, vy = n * sxx - sx * sx, n * syy - sy * sy
    if vx <= 0 or vy <= 0:
        return None
    return (n * sxy - sx * sy) / math.sqrt(vx * vy)


class TestSpearmanRho:
    def test_hand_computed_with_ties(self, spark):
        data = [(1.0, 0.01), (1.0, 0.02), (2.0, 0.01), (2.0, 0.02),
                (2.0, 0.02), (3.0, 0.03)]
        li = spark.createDataFrame(
            [("x", q, d) for q, d in data],
            "l_returnflag string, l_quantity double, l_discount double",
        )
        out = ana.spearman_rho_quantity_discount(li).collect()[0]
        assert out["n_rows"] == 6
        assert (out["n_x_levels"], out["n_y_levels"]) == (3, 3)
        rx = _avg_ranks([q for q, _ in data])
        ry = _avg_ranks([d for _, d in data])
        rho = _pearson([rx[q] for q, _ in data], [ry[d] for _, d in data])
        assert out["rho"] == pytest.approx(_r(rho, 6), abs=1e-9)

    def test_perfect_monotone(self, spark):
        li = spark.createDataFrame(
            [("x", float(i), i / 100.0) for i in range(1, 6)],
            "l_returnflag string, l_quantity double, l_discount double",
        )
        out = ana.spearman_rho_quantity_discount(li).collect()[0]
        assert out["rho"] == pytest.approx(1.0)

    def test_all_tied_axis_null(self, spark):
        li = spark.createDataFrame(
            [("x", 5.0, d) for d in (0.01, 0.02, 0.03)],
            "l_returnflag string, l_quantity double, l_discount double",
        )
        out = ana.spearman_rho_quantity_discount(li).collect()[0]
        assert out["rho"] is None


class TestAnovaOneway:
    def test_hand_computed_three_groups(self, spark):
        groups = {"a": [1.0, 2.0, 3.0], "b": [2.0, 4.0], "c": [6.0, 8.0, 10.0]}
        rows = [
            (i, t, v)
            for i, (t, v) in enumerate(
                (t, v) for t, vs in groups.items() for v in vs
            )
        ]
        ev = spark.createDataFrame(
            rows, "event_id long, event_type string, value double"
        )
        out = ana.anova_oneway_value(ev).collect()[0]
        vals = [v for vs in groups.values() for v in vs]
        n, k = len(vals), len(groups)
        grand = sum(vals) / n
        ssb = sum(len(vs) * (sum(vs) / len(vs) - grand) ** 2
                  for vs in groups.values())
        ssw = sum((v - sum(vs) / len(vs)) ** 2
                  for vs in groups.values() for v in vs)
        f = (ssb / (k - 1)) / (ssw / (n - k))
        assert (out["k_groups"], out["n_total"]) == (k, n)
        assert (out["df1"], out["df2"]) == (k - 1, n - k)
        assert out["ss_between"] == pytest.approx(_r(ssb, 4), abs=1e-9)
        assert out["ss_within"] == pytest.approx(_r(ssw, 4), abs=1e-9)
        assert out["f_stat"] == pytest.approx(_r(f, 4), abs=1e-9)

    def test_single_group_null_f(self, spark):
        ev = spark.createDataFrame(
            [(1, "a", 1.0), (2, "a", 2.0)],
            "event_id long, event_type string, value double",
        )
        out = ana.anova_oneway_value(ev).collect()[0]
        assert out["k_groups"] == 1
        assert out["df1"] == 0
        assert out["f_stat"] is None

    def test_zero_within_variance_null_f(self, spark):
        ev = spark.createDataFrame(
            [(1, "a", 1.0), (2, "a", 1.0), (3, "b", 2.0), (4, "b", 2.0)],
            "event_id long, event_type string, value double",
        )
        out = ana.anova_oneway_value(ev).collect()[0]
        assert out["ss_within"] == 0.0
        assert out["f_stat"] is None


def _ts(s):
    return datetime.datetime.fromisoformat(s)


class TestMarkovTransitions:
    def test_hand_computed_sequences(self, spark):
        # user 1: a -> b -> a   (a>b, b>a); user 2: b -> b   (b>b)
        rows = [
            (1, 1, _ts("2026-01-01T00:00:00"), "a"),
            (2, 1, _ts("2026-01-01T00:01:00"), "b"),
            (3, 1, _ts("2026-01-01T00:02:00"), "a"),
            (4, 2, _ts("2026-01-01T00:00:00"), "b"),
            (5, 2, _ts("2026-01-01T00:03:00"), "b"),
        ]
        ev = spark.createDataFrame(
            rows, "event_id long, user_id long, ts timestamp,"
            " event_type string",
        )
        out = {
            (r["prev_type"], r["next_type"]): r
            for r in ana.markov_event_transitions(ev).collect()
        }
        assert out[("a", "b")]["n_trans"] == 1
        assert out[("a", "b")]["p_next"] == 1.0
        assert out[("b", "a")]["n_trans"] == 1
        assert out[("b", "a")]["p_next"] == 0.5
        assert out[("b", "b")]["n_trans"] == 1
        assert out[("b", "b")]["p_next"] == 0.5
        assert len(out) == 3

    def test_tiebreak_on_event_id(self, spark):
        # identical ts: the sequence must order by event_id, so the
        # transition is a -> b (not b -> a) on both engines
        t0 = _ts("2026-01-01T00:00:00")
        ev = spark.createDataFrame(
            [(10, 1, t0, "a"), (20, 1, t0, "b")],
            "event_id long, user_id long, ts timestamp, event_type string",
        )
        out = ana.markov_event_transitions(ev).collect()
        assert len(out) == 1
        assert (out[0]["prev_type"], out[0]["next_type"]) == ("a", "b")


class TestLagXcorr:
    def test_hand_computed_shifted_series(self, spark):
        # clicks at hours 0..3: [3, 1, 4, 1]; purchases = clicks shifted
        # +1 hour -> xcorr at lag 1 is exactly 1.0 over the overlap
        base = _ts("2026-01-01T00:00:00")
        rows = []
        eid = 0
        clicks = [3, 1, 4, 1]
        for h, c in enumerate(clicks):
            for _ in range(c):
                eid += 1
                rows.append((eid, 1, base + datetime.timedelta(hours=h),
                             "click"))
            for _ in range(c):
                eid += 1
                rows.append((eid, 1,
                             base + datetime.timedelta(hours=h + 1),
                             "purchase"))
        ev = spark.createDataFrame(
            rows, "event_id long, user_id long, ts timestamp,"
            " event_type string",
        )
        out = {r["lag_hours"]: r
               for r in ana.lag_xcorr_click_purchase(ev).collect()}
        # spine covers hours 0..4 (5 hours); lag L pairs n = 5 - L hours
        assert out[0]["n_hours"] == 5
        assert out[1]["n_hours"] == 4
        # lags past the spine have no aligned pairs: no row at all
        assert 5 not in out and 6 not in out
        assert out[0]["n_a_events"] == sum(clicks)
        # lag-1 overlap pairs: ca hours 0..3 = clicks, cb hours 1..4 =
        # clicks shifted -> identical vectors, r = 1
        assert out[1]["xcorr"] == pytest.approx(1.0)
        # lag 0 pairs (ca, cb) over hours 0..4:
        ca = clicks + [0]
        cb = [0] + clicks
        r0 = _pearson([float(x) for x in ca], [float(y) for y in cb])
        assert out[0]["xcorr"] == pytest.approx(_r(r0, 6), abs=1e-9)

    def test_constant_series_null(self, spark):
        base = _ts("2026-01-01T00:00:00")
        rows = []
        for h in range(3):
            rows.append((h * 2 + 1, 1, base + datetime.timedelta(hours=h),
                         "click"))
            rows.append((h * 2 + 2, 1, base + datetime.timedelta(hours=h),
                         "purchase"))
        ev = spark.createDataFrame(
            rows, "event_id long, user_id long, ts timestamp,"
            " event_type string",
        )
        out = {r["lag_hours"]: r
               for r in ana.lag_xcorr_click_purchase(ev).collect()}
        # both series constant 1 on every spine hour: variance 0 -> NULL
        assert out[0]["xcorr"] is None


class TestStreamingJoinTailAudit:
    def test_identity_and_stream_batch_agreement(self, spark):
        # the audit's contract on a bounded ordered replay: streamed
        # matched pairs equal the batch join's, and emitted nulls +
        # retained tail equal batch unmatched — per day, exactly
        import os

        from parcial_bigdata_spark.streaming.windows import (
            outer_join_tail_audit,
        )

        sf_dir = "/root/testdata/sf0.001"
        if not os.path.isdir(sf_dir):
            import pytest as _pytest

            _pytest.skip("driver testdata not present")
        rows = outer_join_tail_audit(
            spark, os.path.join(sf_dir, "events.parquet")
        ).collect()
        assert rows, "audit produced no days"
        for r in rows:
            assert r["n_matched_stream"] == r["n_matched_batch"], r
            assert r["n_expired_unmatched"] >= 0 and \
                r["n_tail_retained"] >= 0, r
