"""Round-12 operators: Welch t-test, Poisson rate test, CUSUM alarms,
Holt smoothing, boilerplate n-grams, JS divergence, common-neighbor
link prediction, price elasticity, weekday seasonality, PCA spectrum.
Each test pins the result against an independent pure-Python/numpy
computation on a corpus small enough to verify by hand (the DuckDB
differential sweep is the scale gate)."""

from __future__ import annotations

import datetime as dt
import math

import pytest
from pyspark.sql import functions as F

from parcial_bigdata_spark.operators import aggregations as agg
from parcial_bigdata_spark.operators import analytics as ana
from parcial_bigdata_spark.operators import graph as g
from parcial_bigdata_spark.operators import similarity as sim
from parcial_bigdata_spark.operators import text as t


def _events(spark, day_counts, event_type="click"):
    """One event per count unit, on consecutive days starting Jan 1."""
    t0 = dt.datetime(2024, 1, 1, 12, 0)
    rows = []
    eid = 0
    for day, c in enumerate(day_counts):
        for _ in range(c):
            rows.append(
                (eid, event_type, t0 + dt.timedelta(days=day), 1, 1.0)
            )
            eid += 1
    return spark.createDataFrame(
        rows,
        "event_id long, event_type string, ts timestamp, "
        "user_id long, value double",
    )


class TestWelchTTest:
    def test_matches_textbook_formula(self, spark):
        a_vals = [100.0, 120.0, 130.0, 90.0]
        b_vals = [200.0, 210.0, 190.0]
        rows = [(i, "F", v) for i, v in enumerate(a_vals)] + [
            (100 + i, "O", v) for i, v in enumerate(b_vals)
        ]
        orders = spark.createDataFrame(
            rows, "o_orderkey long, o_orderstatus string, o_totalprice double"
        )
        out = ana.welch_ttest_by_status(orders).collect()[0]

        def stats(vs):
            n = len(vs)
            m = sum(vs) / n
            var = sum((v - m) ** 2 for v in vs) / (n - 1)
            return n, m, var

        na, ma, va = stats(a_vals)
        nb, mb, vb = stats(b_vals)
        texp = (ma - mb) / math.sqrt(va / na + vb / nb)
        assert out["n_a"] == na and out["n_b"] == nb
        assert out["mean_a"] == pytest.approx(ma, abs=1e-6)
        # variances are reported at 2 dp (ulp-vs-grid note in the op)
        assert out["var_a"] == pytest.approx(va, abs=5e-3)
        assert out["var_b"] == pytest.approx(vb, abs=5e-3)
        assert out["t_stat"] == pytest.approx(texp, abs=1e-5)
        sa, sb = va / na, vb / nb
        dof = (sa + sb) ** 2 / (sa**2 / (na - 1) + sb**2 / (nb - 1))
        assert out["welch_dof"] == pytest.approx(dof, abs=1e-5)
        assert out["significant_95"] == (abs(texp) > 1.959964)


class TestPoissonRateTest:
    def test_step_rate_flags(self, spark):
        # 2/day for days 1-15, 8/day for days 16-30: strong step
        ev = _events(spark, [2] * 15 + [8] * 15, "error")
        out = {
            r["event_type"]: r
            for r in ana.poisson_rate_test(ev).collect()
        }["error"]
        c1, c2 = 2 * 15, 8 * 15
        z = (c1 - c2) / math.sqrt(c1 + c2)
        assert out["c1"] == c1 and out["c2"] == c2
        assert out["z_score"] == pytest.approx(z, abs=1e-6)
        assert bool(out["significant_95"]) is True


class TestCusumAlarms:
    def test_step_shift_alarms_after_shift_not_before(self, spark):
        # flat 10/day baseline for 14 days, then a +5 sd-ish... baseline
        # needs nonzero variance: alternate 9/11 (var=1.07), then jump
        base = [9, 11] * 7
        shifted = [20] * 10
        ev = _events(spark, base + shifted)
        rows = ana.cusum_alarms(ev).collect()
        by_day = {r["d"].day: r for r in rows}
        # pre-shift days never alarm; the shift is caught within 2 days
        assert not any(by_day[d]["alarm"] for d in range(1, 15))
        assert by_day[16]["alarm"] or by_day[17]["alarm"]

    def test_zero_variance_baseline_yields_nulls(self, spark):
        ev = _events(spark, [5] * 20)
        rows = ana.cusum_alarms(ev).collect()
        assert all(r["cusum"] is None and r["alarm"] is None for r in rows)

    def test_replays_page_recursion_exactly(self, spark):
        counts = [3, 1, 4, 1, 5, 9, 2, 6, 5, 3, 5, 8, 9, 7, 9, 3, 2, 3]
        ev = _events(spark, counts)
        rows = ana.cusum_alarms(ev).orderBy("d").collect()
        n = 14
        s_sum = sum(counts[:n])
        q_sum = sum(c * c for c in counts[:n])
        mu = s_sum / n
        var = (q_sum - s_sum * (s_sum / n)) / (n - 1)
        sigma = var**0.5
        s = 0.0
        for r, x in zip(rows, counts):
            s = max(0.0, s + (x - mu) / sigma - 0.5)
            assert r["cusum"] == math.floor(s * 1e6 + 0.5) / 1e6


class TestHoltSmoothing:
    def test_linear_series_forecasts_linearly(self, spark):
        # x_t = 5 + 2t: Holt's state converges geometrically to
        # (level=x_t, trend=2); 40 points put the transient below 1e-4
        counts = [5 + 2 * i for i in range(40)]
        ev = _events(spark, counts)
        rows = ana.holt_linear_smoothing(ev).orderBy("horizon_days").collect()
        last = counts[-1]
        for r in rows:
            assert r["trend"] == pytest.approx(2.0, abs=1e-4)
            assert r["forecast"] == pytest.approx(
                last + 2 * r["horizon_days"], abs=1e-3
            )

    def test_replays_recursion_exactly(self, spark):
        counts = [3, 7, 4, 9, 2, 8, 6]
        ev = _events(spark, counts)
        rows = ana.holt_linear_smoothing(ev).orderBy("horizon_days").collect()
        level, trend = float(counts[0]), float(counts[1] - counts[0])
        for x in counts[2:]:
            prev = level
            level = 0.5 * x + 0.5 * (level + trend)
            trend = 0.25 * (level - prev) + 0.75 * trend
        assert rows[0]["level"] == math.floor(level * 1e6 + 0.5) / 1e6
        assert rows[2]["forecast"] == math.floor(
            (level + 3 * trend) * 1e6 + 0.5
        ) / 1e6


class TestBoilerplateNgrams:
    def test_shared_shingle_found_with_doc_frequency(self, spark):
        chrome = "all rights reserved contact us today"
        docs = spark.createDataFrame(
            [
                (1, f"alpha beta gamma {chrome}", "en", "a", 1),
                (2, f"{chrome} delta epsilon", "en", "a", 1),
                (3, f"zeta eta {chrome} theta", "en", "b", 1),
                (4, "nothing shared here at all whatsoever okay", "en", "b", 1),
            ],
            "doc_id long, text string, lang string, source string, n_chars long",
        )
        out = t.boilerplate_ngrams(docs).collect()
        top = out[0]
        assert top["doc_freq"] == 3
        assert "rights reserved contact us" in top["gram"]
        assert top["doc_share"] == pytest.approx(0.75, abs=1e-6)
        # doc 4 shares nothing: no gram reaches doc_freq 4
        assert all(r["doc_freq"] <= 3 for r in out)

    def test_within_doc_repeat_counts_once(self, spark):
        ngram = "one two three four five"
        docs = spark.createDataFrame(
            [
                (1, f"{ngram} {ngram} {ngram}", "en", "a", 1),
                (2, "unrelated words only here now yes", "en", "a", 1),
            ],
            "doc_id long, text string, lang string, source string, n_chars long",
        )
        out = t.boilerplate_ngrams(docs, min_docs=1).collect()
        row = {r["gram"]: r for r in out}[ngram]
        assert row["doc_freq"] == 1  # array_distinct per doc


class TestJsDivergence:
    def test_identical_source_has_zero_divergence(self, spark):
        docs = spark.createDataFrame(
            [
                (1, "a b c d", "en", "only", 1),
                (2, "a b c d", "en", "only", 1),
            ],
            "doc_id long, text string, lang string, source string, n_chars long",
        )
        out = t.js_divergence_by_source(docs).collect()
        assert len(out) == 1
        assert out[0]["jsd"] == pytest.approx(0.0, abs=1e-9)

    def test_disjoint_vocabulary_is_log2_bounded(self, spark):
        docs = spark.createDataFrame(
            [
                (1, "a a a a", "en", "s1", 1),
                (2, "b b b b", "en", "s2", 1),
            ],
            "doc_id long, text string, lang string, source string, n_chars long",
        )
        out = {r["source"]: r for r in t.js_divergence_by_source(docs).collect()}
        # P = {a:1}, Q = {a:.5, b:.5}: JSD = 0.5*log2(4/3) + 0.25*log2... the
        # closed form: 0.5*1*log2(1/0.75) + 0.5*(0.5*log2(0.5/0.75)) + 0.5*0.5
        expected = 0.5 * math.log2(1 / 0.75) + 0.5 * (
            0.5 * math.log2(0.5 / 0.75)
        ) + 0.5 * 0.5
        assert out["s1"]["jsd"] == pytest.approx(expected, abs=1e-4)
        assert out["s2"]["jsd"] == pytest.approx(expected, abs=1e-4)


class TestCommonNeighbors:
    def test_square_graph(self, spark):
        # square 1-2-3-4-1: (1,3) and (2,4) are the non-adjacent pairs,
        # each with 2 common neighbors and union = 2+2-2 = 2 → J = 1.0
        edges = spark.createDataFrame(
            [(1, 2), (2, 3), (3, 4), (4, 1)], "src long, dst long"
        )
        out = g.common_neighbor_scores(edges).collect()
        assert {(r["u"], r["v"]) for r in out} == {(1, 3), (2, 4)}
        for r in out:
            assert r["common"] == 2
            assert r["jaccard"] == pytest.approx(1.0)

    def test_hub_cap_excludes_wedges_through_hubs(self, spark):
        # star: hub 0 connected to 1..5; with max_degree=3 the hub is
        # not a valid middle, so NO candidate pairs survive
        edges = spark.createDataFrame(
            [(0, i) for i in range(1, 6)], "src long, dst long"
        )
        assert g.common_neighbor_scores(edges, max_degree=3).count() == 0
        # uncapped, every leaf pair shares the hub
        out = g.common_neighbor_scores(edges, max_degree=10).collect()
        assert len(out) == 10  # C(5,2) leaf pairs
        assert all(r["common"] == 1 for r in out)


class TestPriceElasticity:
    def test_known_loglog_slope(self, spark):
        # quantity = 100 / price  →  ln q = ln 100 − 1·ln p: slope −1, r²=1
        parts = spark.createDataFrame(
            [(i, f"p{i}", "B1", "t", 1, float(p)) for i, p in enumerate([2, 4, 8, 16])],
            "p_partkey long, p_name string, p_brand string, p_type string,"
            " p_size int, p_retailprice double",
        )
        li = spark.createDataFrame(
            [(i, i, 100.0 / p) for i, p in enumerate([2, 4, 8, 16])],
            "l_orderkey long, l_partkey long, l_quantity double",
        )
        out = agg.price_elasticity_by_brand(li, parts).collect()[0]
        assert out["elasticity"] == pytest.approx(-1.0, abs=1e-4)
        assert out["r2"] == pytest.approx(1.0, abs=1e-4)
        assert out["intercept"] == pytest.approx(math.log(100.0), abs=1e-4)


class TestWeekdaySeasonality:
    def test_hot_weekday_index(self, spark):
        # 14 days starting Mon Jan 1 2024: 8 events every Monday, 1
        # otherwise → Monday mean 8, grand mean (2*8+12*1)/14 = 2
        counts = [8, 1, 1, 1, 1, 1, 1] * 2
        ev = _events(spark, counts)
        rows = {r["dow"]: r for r in ana.weekday_seasonality(ev).collect()}
        # Spark dayofweek: Monday = 2
        assert rows[2]["n_events"] == 16
        assert rows[2]["mean_daily"] == pytest.approx(8.0)
        assert rows[2]["seasonal_index"] == pytest.approx(8.0 / 2.0)
        assert rows[3]["seasonal_index"] == pytest.approx(0.5)


class TestPcaSpectrum:
    def _emb(self, spark):
        import numpy as np

        rng = np.random.default_rng(7)
        # rank-2 structure in 6 dims + small noise
        basis = rng.normal(size=(2, 6))
        rows = []
        for i in range(80):
            v = rng.normal(size=2) @ basis + 0.01 * rng.normal(size=6)
            rows.append((i, [float(x) for x in v], 0))
        return spark.createDataFrame(
            rows, "vec_id long, embedding array<float>, label int"
        )

    def test_rank2_spectrum_and_trace_invariant(self, spark):
        emb = self._emb(spark)
        spec = sim.pca_variance_spectrum(emb).collect()
        assert [r["component"] for r in spec] == list(range(1, 7))
        # two dominant axes explain ~everything
        assert spec[0]["cumulative_ratio"] < 1.0
        assert spec[1]["cumulative_ratio"] > 0.99
        # eigenvalues descending
        eigs = [r["eigenvalue"] for r in spec]
        assert eigs == sorted(eigs, reverse=True)
        audit = sim.pca_trace_audit(emb).collect()[0]
        assert audit["trace"] == audit["sum_eigenvalues"]
        assert audit["trace"] == pytest.approx(sum(eigs), abs=1e-4)

    def test_degenerate_corpus_emits_null_ratios(self, spark):
        # constant embeddings: trace == 0 — ratios must be NULL, not a
        # ZeroDivisionError on the driver (round-13 advice)
        emb = spark.createDataFrame(
            [(i, [1.0, 2.0, 3.0], 0) for i in range(5)],
            "vec_id long, embedding array<float>, label int",
        )
        spec = sim.pca_variance_spectrum(emb).collect()
        assert [r["component"] for r in spec] == [1, 2, 3]
        assert all(r["eigenvalue"] == 0.0 for r in spec)
        assert all(r["explained_ratio"] is None for r in spec)
        assert all(r["cumulative_ratio"] is None for r in spec)


class TestBootstrapCI:
    def test_ci_brackets_mean_and_replays_hash(self, spark):
        import math as m

        rows = [(i, "purchase", dt.datetime(2024, 1, 1), 1, float(10 + i % 5))
                for i in range(200)]
        ev = spark.createDataFrame(
            rows, "event_id long, event_type string, ts timestamp,"
            " user_id long, value double"
        )
        out = ana.bootstrap_mean_ci(ev).collect()[0]
        mean = sum(10 + i % 5 for i in range(200)) / 200
        assert out["n_events"] == 200
        assert out["mean_value"] == pytest.approx(mean, abs=1e-6)
        assert out["ci_lo"] <= out["mean_value"] <= out["ci_hi"]
        # python replay of the FULL hash (h0 -> xor-shift/multiply
        # avalanche h1 -> h) across ALL 32 resamples, reproducing
        # ci_lo/ci_hi exactly — a regression in any avalanche step
        # moves a weight and breaks the equality (round-13 advice:
        # the old replay stopped at h0, so the containment assertion
        # passed only incidentally)
        T = ana._POISSON1_T32
        means = []
        for b in range(32):
            ws, vs = 0, 0.0
            for i in range(200):
                h0 = ((i % 1048573) * 2654435761 + b * 40503 + 7) % 2**32
                h1 = ((h0 ^ (h0 >> 16)) * 49979687) % 2**32
                h = h1 ^ (h1 >> 15)
                w = next((k for k, t in enumerate(T) if h < t), 8)
                ws += w
                vs += w * (10 + i % 5)
            means.append(vs / ws)
        means.sort()
        lo_idx = int(0.025 * 31 + 0.5)       # 0-based nearest-rank
        hi_idx = int(0.975 * 31 + 0.5)
        assert out["ci_lo"] == m.floor(means[lo_idx] * 1e6 + 0.5) / 1e6
        assert out["ci_hi"] == m.floor(means[hi_idx] * 1e6 + 0.5) / 1e6
        assert len(set(means)) > 1  # the avalanche actually moves weight


class TestConversionLatency:
    def test_known_latencies(self, spark):
        t0 = dt.datetime(2024, 1, 1)
        rows = []
        # users 1..10: view at t0, purchase h hours later (h = user)
        eid = 0
        for u in range(1, 11):
            rows.append((eid, "view", t0, u, 1.0)); eid += 1
            rows.append(
                (eid, "purchase", t0 + dt.timedelta(hours=u), u, 1.0)
            ); eid += 1
        # user 11 views but never purchases
        rows.append((eid, "view", t0, 11, 1.0))
        ev = spark.createDataFrame(
            rows, "event_id long, event_type string, ts timestamp,"
            " user_id long, value double"
        )
        out = ana.conversion_latency_percentiles(ev).collect()[0]
        assert out["n_converted"] == 10 and out["n_viewers"] == 11
        assert out["conversion_rate"] == pytest.approx(10 / 11, abs=1e-6)
        # hours = 1..10: ceil-covering picks p50 -> 5, p90 -> 9, p99 -> 10
        assert out["p50_hours"] == 5
        assert out["p90_hours"] == 9
        assert out["p99_hours"] == 10

    def test_zero_conversions_still_one_row(self, spark):
        # viewers exist but nobody converts: the report must be ONE row
        # with n_converted=0, rate 0.0, NULL percentiles — the oracle's
        # always-one-row shape (round-13 advice)
        t0 = dt.datetime(2024, 1, 1)
        rows = [
            (0, "view", t0, 1, 1.0),
            (1, "view", t0, 2, 1.0),
            # user 3 purchased BEFORE their first view: not converted
            (2, "purchase", t0, 3, 1.0),
            (3, "view", t0 + dt.timedelta(hours=1), 3, 1.0),
        ]
        ev = spark.createDataFrame(
            rows, "event_id long, event_type string, ts timestamp,"
            " user_id long, value double",
        )
        got = ana.conversion_latency_percentiles(ev).collect()
        assert len(got) == 1
        out = got[0]
        assert out["n_converted"] == 0 and out["n_viewers"] == 3
        assert out["conversion_rate"] == 0.0
        assert out["p50_hours"] is None
        assert out["p90_hours"] is None
        assert out["p99_hours"] is None


class TestBigramEntropy:
    def test_deterministic_text_has_zero_conditional_entropy(self, spark):
        # 'a b a b ...': every context word fully determines the next
        docs = spark.createDataFrame(
            [(1, "a b " * 50, "en", "s", 1)],
            "doc_id long, text string, lang string, source string,"
            " n_chars long",
        )
        out = t.bigram_conditional_entropy(docs).collect()[0]
        assert out["conditional_entropy"] == pytest.approx(0.0, abs=1e-3)
        assert out["unigram_entropy"] == pytest.approx(1.0, abs=1e-3)

    def test_uniform_random_pairs_near_unigram_entropy(self, spark):
        import random

        rng = random.Random(5)
        text = " ".join(rng.choice("abcd") for _ in range(4000))
        docs = spark.createDataFrame(
            [(1, text, "en", "s", 1)],
            "doc_id long, text string, lang string, source string,"
            " n_chars long",
        )
        out = t.bigram_conditional_entropy(docs).collect()[0]
        # iid stream: H(w2|w1) ~ H(w1) ~ 2 bits
        assert out["conditional_entropy"] == pytest.approx(2.0, abs=0.05)


class TestPeriodogram:
    def test_pure_daily_cycle_concentrates_at_24h(self, spark):
        import math as m

        t0 = dt.datetime(2024, 1, 1)
        rows, eid = [], 0
        for hour in range(24 * 28):
            c = 10 + round(5 * m.cos(2 * m.pi * hour / 24))
            for _ in range(c):
                rows.append(
                    (eid, "click", t0 + dt.timedelta(hours=hour), 1, 1.0)
                )
                eid += 1
        ev = spark.createDataFrame(
            rows, "event_id long, event_type string, ts timestamp,"
            " user_id long, value double",
        )
        out = {r["period_hours"]: r for r in ana.hourly_periodogram(ev).collect()}
        assert out[24]["amplitude"] == pytest.approx(5.0, abs=0.2)
        assert out[24]["variance_share"] > 0.95
        assert out[168]["variance_share"] < 0.05
        assert out[12]["variance_share"] < 0.05


class TestHarmonicCloseness:
    def test_path_graph_values(self, spark):
        # path 1-2-3-4-5-6-7, seeds = all nodes (n_seeds big). For seed 1:
        # d = 1,2,3,4 within 4 hops -> H = 1 + 1/2 + 1/3 + 1/4
        edges = spark.createDataFrame(
            [(i, i + 1) for i in range(1, 7)], "src long, dst long"
        )
        out = {r["u"] if "u" in r else r["seed"]: r
               for r in g.harmonic_closeness(edges, n_seeds=7).collect()}
        h_end = 1 + 0.5 + 1 / 3 + 0.25
        assert out[1]["n_within_ball"] == 4
        assert out[1]["harmonic_closeness"] == pytest.approx(h_end, abs=1e-6)
        # middle node 4 reaches everything: 2 at d1, 2 at d2, 2 at d3
        assert out[4]["n_within_ball"] == 6
        assert out[4]["harmonic_closeness"] == pytest.approx(
            2 + 1 + 2 / 3, abs=1e-6
        )


class TestComponentSizeHistogram:
    def test_hand_graph(self, spark):
        from parcial_bigdata_spark.operators import dedup as dd

        docs = spark.createDataFrame(
            [(i, f"t{i}", "en", "s", 10) for i in range(1, 8)],
            "doc_id long, text string, lang string, source string,"
            " n_chars long",
        )
        # components: {1,2,3} (chain), {4,5}; 6,7 singletons
        pairs = spark.createDataFrame(
            [(1, 2), (2, 3), (4, 5)], "doc_a long, doc_b long"
        )
        out = {r["component_size"]: r
               for r in dd.component_size_histogram(docs, pairs).collect()}
        assert out[1]["n_components"] == 2 and out[1]["n_removable"] == 0
        assert out[2]["n_components"] == 1 and out[2]["n_removable"] == 1
        assert out[3]["n_components"] == 1 and out[3]["n_removable"] == 2
        assert sum(r["n_docs"] for r in out.values()) == 7


class TestRichClub:
    def test_clique_plus_pendants(self, spark):
        from parcial_bigdata_spark.operators import graph as gg

        # K5 clique (nodes 1..5) + a pendant leaf on each clique node:
        # top-5 by degree IS the clique (deg 5 vs 1) -> coefficient 1.0
        edges = [(a, b) for a in range(1, 6) for b in range(a + 1, 6)]
        edges += [(i, 100 + i) for i in range(1, 6)]
        e = spark.createDataFrame(edges, "src long, dst long")
        out = {r["club_size"]: r
               for r in gg.rich_club_coefficients(e, ks=(5, 10)).collect()}
        assert out[5]["n_edges_within"] == 10
        assert out[5]["coefficient"] == pytest.approx(1.0)
        # the 10-club includes all 10 nodes: 15 edges of 45 possible
        assert out[10]["n_edges_within"] == 15
        assert out[10]["coefficient"] == pytest.approx(15 / 45, abs=1e-6)


class TestNelsonAalen:
    def test_hazard_matches_life_table(self, spark):
        import datetime as dtt

        from parcial_bigdata_spark.operators import analytics as an

        d0 = dtt.datetime(2024, 1, 1)
        # cust 1: orders at day 0, 10 (gap 10 observed; tail censored at
        # horizon day 40 - 30); cust 2: one order day 0 (censored 40)
        orders = spark.createDataFrame(
            [
                (1, 1, d0),
                (2, 1, d0 + dtt.timedelta(days=10)),
                (3, 2, d0),
                (4, 3, d0 + dtt.timedelta(days=40)),
            ],
            "o_orderkey long, o_custkey long, o_orderdate timestamp",
        )
        rows = {r["bin_start_days"]: r
                for r in an.nelson_aalen_hazard(orders).collect()}
        # life table: bin 0 (days 0-29): events=1 (gap 10), censored=1
        # (cust3 tail 0); bin 30: censored=2 (cust1 tail 30, cust2 40)
        assert rows[0]["n_at_risk"] == 4
        assert rows[0]["n_events"] == 1
        h0 = 1 / 4
        assert rows[0]["cum_hazard"] == pytest.approx(h0, abs=1e-6)
        assert rows[30]["cum_hazard"] == pytest.approx(h0, abs=1e-6)
        assert rows[30]["fh_survival"] == pytest.approx(
            math.exp(-h0), abs=1e-6
        )


class TestImageHistogram:
    def test_bins_match_closed_form(self, spark):
        from parcial_bigdata_spark.operators import multimodal as mm

        docs = spark.createDataFrame(
            [(i, f"t{i}", "en", "s", 10) for i in range(1, 6)],
            "doc_id long, text string, lang string, source string,"
            " n_chars long",
        )
        out = mm.image_channel_histogram(docs).collect()
        got = {(r["channel"], r["bin"]): r["n_pixels"] for r in out}
        expected: dict = {}
        for d in range(1, 6):
            w, h = 4 + d % 12, 4 + (d * 7) % 8
            for y in range(h):
                for x in range(w):
                    for ci, c in enumerate("bgr"):
                        b = ((d + 3 * x + 5 * y + 11 * ci) % 256) // 16
                        expected[(c, b)] = expected.get((c, b), 0) + 1
        assert got == expected
