"""Round-11 operators: hourly autocorrelation, Benford audit, degree
assortativity, diagonal-Mahalanobis embedding outliers, GIF frame
census, curriculum ordering.  Each test pins the result against an
independent pure-Python/numpy computation on a corpus small enough to
verify by hand (the DuckDB differential sweep is the scale gate)."""

from __future__ import annotations

import datetime as dt
import math

import pytest
from pyspark.sql import functions as F

from parcial_bigdata_spark.operators import analytics as ana
from parcial_bigdata_spark.operators import graph as g
from parcial_bigdata_spark.operators import multimodal as mm
from parcial_bigdata_spark.operators import profiling as prof
from parcial_bigdata_spark.operators import sampling as samp
from parcial_bigdata_spark.operators import similarity as sim


def _pearson(xs, ys):
    n = len(xs)
    sx, sy = sum(xs), sum(ys)
    sxy = sum(x * y for x, y in zip(xs, ys))
    sxx = sum(x * x for x in xs)
    syy = sum(y * y for y in ys)
    num = n * sxy - sx * sy
    den = math.sqrt((n * sxx - sx * sx) * (n * syy - sy * sy))
    return num / den


class TestHourlyAutocorrelation:
    def _events(self, spark, counts):
        t0 = dt.datetime(2024, 1, 1)
        rows = []
        eid = 0
        for hour, c in enumerate(counts):
            for _ in range(c):
                rows.append((eid, "click", t0 + dt.timedelta(hours=hour), 1, 1.0))
                eid += 1
        return spark.createDataFrame(
            rows, "event_id long, event_type string, ts timestamp, "
            "user_id long, value double"
        )

    def test_lag1_matches_python(self, spark):
        counts = [3, 1, 4, 1, 5, 9, 2, 6, 5, 3, 5, 8]
        ev = self._events(spark, counts)
        rows = {
            r.lag_hours: r
            for r in ana.hourly_autocorrelation(ev, lags=(1, 3)).collect()
            if r.event_type == "click"
        }
        exp1 = _pearson(counts[:-1], counts[1:])
        exp3 = _pearson(counts[:-3], counts[3:])
        assert rows[1].n_pairs == len(counts) - 1
        assert rows[1].autocorr == pytest.approx(exp1, abs=1e-6)
        assert rows[3].autocorr == pytest.approx(exp3, abs=1e-6)

    def test_missing_hours_count_as_zero(self, spark):
        # events only in hours 0 and 2: the dense grid inserts hour 1 = 0
        ev = self._events(spark, [2, 0, 2])
        [row] = [
            r for r in ana.hourly_autocorrelation(ev, lags=(1,)).collect()
        ]
        assert row.n_pairs == 2  # (h0,h1), (h1,h2) — the zero hour exists
        assert row.autocorr == pytest.approx(_pearson([2, 0], [0, 2]), abs=1e-6)

    def test_constant_series_is_null(self, spark):
        ev = self._events(spark, [2, 2, 2, 2])
        [row] = ana.hourly_autocorrelation(ev, lags=(1,)).collect()
        assert row.autocorr is None


class TestBenfordAudit:
    def test_counts_and_chisq_match_python(self, spark):
        amounts = [1.5, 19.99, 123.0, 2.0, 250.75, 31.0, 999.99, 1000.0, 0.5]
        orders = spark.createDataFrame(
            [(i, a) for i, a in enumerate(amounts)],
            "o_orderkey long, o_totalprice double",
        )
        rows = {r.first_digit: r for r in prof.benford_audit(orders).collect()}
        assert set(rows) == set(range(1, 10))
        kept = [a for a in amounts if a >= 1]  # 0.5 excluded
        n = len(kept)
        obs = {d: 0 for d in range(1, 10)}
        for a in kept:
            obs[int(str(int(math.floor(a)))[0])] += 1
        for d in range(1, 10):
            p = prof.BENFORD_SHARES[d]
            assert rows[d].n_amounts == obs[d]
            assert rows[d].observed_share == pytest.approx(obs[d] / n, abs=1e-6)
            assert rows[d].expected_share == p
            dev = obs[d] - n * p
            assert rows[d].chisq_term == pytest.approx(
                dev * dev / (n * p), abs=1e-6
            )

    def test_power_of_ten_buckets_as_one(self, spark):
        # 1000.0 must land in digit 1 — floor(log10) based extraction
        # can misbucket it; the string path cannot
        orders = spark.createDataFrame(
            [(1, 1000.0), (2, 10.0), (3, 100.0)],
            "o_orderkey long, o_totalprice double",
        )
        rows = {r.first_digit: r for r in prof.benford_audit(orders).collect()}
        assert rows[1].n_amounts == 3


class TestDegreeAssortativity:
    def _r(self, spark, edges):
        df = spark.createDataFrame(edges, "src long, dst long")
        return g.degree_assortativity(df).collect()[0]

    def test_star_is_disassortative(self, spark):
        row = self._r(spark, [(0, i) for i in range(1, 6)])
        # star: Pearson of (deg a, deg b) over directed pairs = -1
        assert row.n_nodes == 6 and row.n_edges == 5
        assert row.assortativity == pytest.approx(-1.0, abs=1e-6)

    def test_matches_python(self, spark):
        edges = [(1, 2), (2, 3), (3, 4), (4, 1), (1, 3)]
        row = self._r(spark, edges)
        deg = {}
        for u, v in edges:
            deg[u] = deg.get(u, 0) + 1
            deg[v] = deg.get(v, 0) + 1
        xs, ys = [], []
        for u, v in edges:
            xs += [deg[u], deg[v]]
            ys += [deg[v], deg[u]]
        assert row.assortativity == pytest.approx(_pearson(xs, ys), abs=1e-6)

    def test_regular_graph_is_null(self, spark):
        # 4-cycle: every degree 2 — zero variance
        row = self._r(spark, [(1, 2), (2, 3), (3, 4), (4, 1)])
        assert row.assortativity is None


class TestMahalanobisOutliers:
    def test_matches_numpy(self, spark):
        import numpy as np

        rng = [[float(i % 3), float((i * 7) % 5), 0.5] for i in range(10)]
        rng[7] = [9.0, -9.0, 0.5]  # the planted outlier
        emb = spark.createDataFrame(
            [(i, v, 0) for i, v in enumerate(rng)],
            "vec_id long, embedding array<float>, label int",
        )
        rows = sim.mahalanobis_outliers(emb, top_n=3).collect()
        arr = np.array(rng, dtype=np.float64)
        mu = arr.mean(axis=0)
        var = arr.var(axis=0)
        keep = var > 1e-12  # the constant dim 3 must be excluded
        d2 = (((arr - mu) ** 2)[:, keep] / var[keep]).sum(axis=1)
        assert rows[0].vec_id == 7
        assert rows[0].n_dims_used == 2
        assert rows[0].mahalanobis_sq == pytest.approx(d2[7], rel=1e-5)
        order = sorted(range(10), key=lambda i: (-d2[i], i))[:3]
        assert [r.vec_id for r in rows] == order


class TestGifFrameCensus:
    def _docs(self, spark, ids):
        return spark.createDataFrame(
            [(i, "t", "en", "web", 1) for i in ids],
            "doc_id long, text string, lang string, source string, n_chars long",
        )

    def test_closed_form(self, spark):
        ids = [0, 1, 7, 104, 999]
        out = {
            r.media_id: r
            for r in mm.gif_frame_census(
                mm.synth_gif_corpus(self._docs(spark, ids))
            ).collect()
        }
        for i in ids:
            n, delay, sub = 1 + i % 5, 1 + i % 100, 1 + i % 3
            r = out[i]
            assert r.n_frames == n
            assert r.n_extensions == n
            assert r.lzw_data_bytes == n * sub
            assert r.total_delay_cs == n * delay
            assert r.byte_len == 14 + n * (22 + i % 3)

    def test_corpus_is_valid_gif(self, spark):
        [row] = mm.synth_gif_corpus(self._docs(spark, [42])).collect()
        blob = bytes(row.content)
        assert blob[:6] == b"GIF89a" and blob[-1] == 0x3B

    def test_corrupt_payload_raises(self, spark):
        media = spark.createDataFrame(
            [(1, bytearray(b"GIF89a" + b"\x00" * 7 + b"\x99"), "image/gif", "s")],
            "media_id long, content binary, media_type string, source string",
        )
        with pytest.raises(Exception, match="unknown GIF block|truncated"):
            mm.gif_frame_census(media).collect()


class TestCurriculumOrder:
    def test_bands_and_interleave(self, spark):
        rows = [(i, "t", "en", "web", n) for i, n in enumerate(
            [100, 600, 1500, 3000, 5000, 120, 700, 9000]
        )]
        docs = spark.createDataFrame(
            rows, "doc_id long, text string, lang string, source string, "
            "n_chars long"
        )
        out = samp.curriculum_order(docs).collect()
        by_id = {r.doc_id: r for r in out}
        assert by_id[0].band == 0 and by_id[5].band == 0
        assert by_id[1].band == 1 and by_id[6].band == 1
        assert by_id[2].band == 2 and by_id[3].band == 3
        assert by_id[4].band == 4 and by_id[7].band == 4
        # round-robin: rank-1 of every band precedes rank-2 of any band
        for r in out:
            assert r.schedule_pos == (r.band_rank - 1) * 5 + r.band
        positions = [r.schedule_pos for r in out]
        assert len(set(positions)) == len(positions)
        # deterministic across runs
        again = [r.schedule_pos for r in samp.curriculum_order(docs).collect()]
        assert sorted(again) == sorted(positions)


class TestOrderBacklog:
    def test_cumsum_and_zero_fill(self, spark):
        d = dt.datetime
        orders = spark.createDataFrame(
            [(1, d(2024, 1, 1)), (2, d(2024, 1, 1)), (3, d(2024, 1, 3))],
            "o_orderkey long, o_orderdate timestamp",
        )
        lineitem = spark.createDataFrame(
            [(1, d(2024, 1, 2)), (1, d(2024, 1, 4)), (2, d(2024, 1, 2))],
            "l_orderkey long, l_shipdate timestamp",
        )
        rows = ana.order_backlog_timeseries(orders, lineitem).collect()
        # order 1 completes Jan 4 (last line), order 2 Jan 2; order 3 never
        assert [(r.day.day, r.placed, r.completed, r.open_backlog)
                for r in rows] == [
            (1, 2, 0, 2), (2, 0, 1, 1), (3, 1, 0, 2), (4, 0, 1, 1),
        ]


class TestFulfillmentPercentiles:
    def test_exact_lower_value_selection(self, spark):
        d = dt.datetime(2024, 1, 1)
        orders = spark.createDataFrame(
            [(i, "1-URGENT", d) for i in range(10)],
            "o_orderkey long, o_orderpriority string, o_orderdate timestamp",
        )
        # latencies 1..10 days
        lineitem = spark.createDataFrame(
            [(i, d + dt.timedelta(days=i + 1)) for i in range(10)],
            "l_orderkey long, l_shipdate timestamp",
        )
        [row] = ana.fulfillment_percentiles(orders, lineitem).collect()
        # ceil selection: p50 -> 5th smallest = 5, p90 -> 9th = 9,
        # p99 -> ceil(9.9) = 10th = 10
        assert (row.n_orders, row.p50_days, row.p90_days, row.p99_days) == (
            10, 5, 9, 10,
        )


class TestImportanceWeights:
    def test_uniform_target(self, spark):
        docs = spark.createDataFrame(
            [(i, "t", "en", "a" if i < 3 else "b", 10) for i in range(4)],
            "doc_id long, text string, lang string, source string, n_chars long",
        )
        rows = {r.source: r for r in samp.importance_weights(docs).collect()}
        assert rows["a"].n_docs == 3 and rows["b"].n_docs == 1
        assert rows["a"].actual_share == pytest.approx(0.75, abs=1e-6)
        assert rows["a"].target_share == pytest.approx(0.5, abs=1e-6)
        assert rows["a"].weight == pytest.approx(4 / 6, abs=1e-6)
        assert rows["b"].weight == pytest.approx(2.0, abs=1e-6)


class TestMediaDedupCensus:
    def test_constructed_collisions_collapse(self, spark):
        docs = spark.createDataFrame(
            [(i, "t", "en", "web", 1) for i in (0, 192, 384, 1)],
            "doc_id long, text string, lang string, source string, n_chars long",
        )
        rows = {
            r.media_type: r
            for r in mm.media_dedup_census(mm.synth_image_corpus(docs)).collect()
        }
        # 0/192/384 share (fmt=png, w, h) — byte-identical payloads
        assert rows["png"].n_media == 3
        assert rows["png"].n_distinct_payloads == 1
        assert rows["png"].n_dup_groups == 1
        assert rows["png"].max_copies == 3
        assert rows["bmp"].n_media == 1 and rows["bmp"].n_dup_groups == 0


class TestReviewFixes:
    """Round-11 self-review regressions."""

    def test_mad_outliers_tolerates_nulls(self, spark):
        rows = [
            (1, "a", 1.0), (2, "a", 2.0), (3, "a", 3.0),
            (4, "a", None),          # null value
            (5, None, 9.0),          # null type
            (6, "b", None), (7, "b", None),  # all-null type
        ]
        ev = spark.createDataFrame(
            rows, "event_id long, event_type string, value double"
        )
        out = {r.event_type: r for r in ana.mad_outliers(ev).collect()}
        assert set(out) == {"a"}  # null-keyed and all-null types dropped
        assert out["a"].n_events == 3
        assert out["a"].median_value == 2.0
        assert out["a"].mad == 1.0

    def test_gif_truncated_gce_is_valueerror(self, spark):
        blob = b"GIF89a" + b"\x00" * 7 + b"\x21\xf9"
        media = spark.createDataFrame(
            [(1, bytearray(blob), "image/gif", "s")],
            "media_id long, content binary, media_type string, source string",
        )
        with pytest.raises(Exception, match="ValueError.*truncated GIF"):
            mm.gif_frame_census(media).collect()

    def test_fake_pixel_decode_ignores_pil(self, spark):
        # grayscale PNG (color type 0): the stdlib tier declines it; in
        # FAKE mode the deterministic byte-length fake must stand in
        # regardless of whether the box has PIL
        import struct
        import zlib

        ihdr = struct.pack(">II", 5, 4) + bytes([8, 0, 0, 0, 0])
        blob = (
            b"\x89PNG\r\n\x1a\n"
            + struct.pack(">I", 13) + b"IHDR" + ihdr
            + struct.pack(">I", zlib.crc32(b"IHDR" + ihdr))
        )
        media = spark.createDataFrame(
            [(1, bytearray(blob), "image/png", "s")],
            "media_id long, content binary, media_type string, source string",
        )
        [row] = mm.decode_pixels(media, use_fake_decode=True).collect()
        # the fake reports payload length as every channel sum
        assert row.sum_b == len(blob) == row.sum_g == row.sum_r


class TestChangePoint:
    def test_planted_step_found(self, spark):
        t0 = dt.datetime(2024, 1, 1)
        rows, eid = [], 0
        for day, c in enumerate([2, 2, 2, 2, 10, 10, 10, 10]):
            for _ in range(c):
                rows.append((eid, "a", t0 + dt.timedelta(days=day)))
                eid += 1
        ev = spark.createDataFrame(
            rows, "event_id long, event_type string, ts timestamp"
        )
        [row] = ana.daily_change_point(ev).collect()
        assert row.split_after_day == t0 + dt.timedelta(days=3)
        assert (row.n_days_before, row.n_days_after) == (4, 4)
        assert row.mean_before == 2.0 and row.mean_after == 10.0

    def test_missing_days_are_zero(self, spark):
        # days 0 and 3 only: the grid inserts zero days 1-2, so the
        # best split is after the single busy day 0
        t0 = dt.datetime(2024, 1, 1)
        rows = [(i, "a", t0) for i in range(6)] + [
            (9, "a", t0 + dt.timedelta(days=3))
        ]
        ev = spark.createDataFrame(
            rows, "event_id long, event_type string, ts timestamp"
        )
        [row] = ana.daily_change_point(ev).collect()
        assert row.split_after_day == t0
        assert row.n_days_before == 1 and row.n_days_after == 3


class TestParetoShare:
    def test_known_concentration(self, spark):
        # 100 customers: one whale with 901, 99 with 1 each -> total 1000
        rows = [(0, 0, 901.0)] + [(i, i, 1.0) for i in range(1, 100)]
        orders = spark.createDataFrame(
            rows, "o_orderkey long, o_custkey long, o_totalprice double"
        )
        out = {r.top_pct: r for r in ana.pareto_revenue_share(orders).collect()}
        assert out[1].n_customers == 1
        assert out[1].revenue_share == pytest.approx(0.901, abs=1e-6)
        assert out[10].n_customers == 10
        assert out[10].revenue_share == pytest.approx(0.91, abs=1e-6)


class TestCompactionPlan:
    def test_bins_respect_quota_rule(self, spark):
        from parcial_bigdata_spark.operators import merge as mg

        li = spark.createDataFrame(
            [(i,) for i in range(2000)], "l_orderkey long"
        )
        out = mg.compaction_plan(li, n_files=10, target_rows=500).collect()
        # 10 files x 200 rows, target 500: cum boundaries every 500 rows
        # -> bins of at most ceil(500/200)=3 files
        assert sum(r.n_files for r in out) == 10
        assert sum(r.total_rows for r in out) == 2000
        assert all(r.n_files <= 3 for r in out)
        # deterministic across runs
        again = mg.compaction_plan(li, n_files=10, target_rows=500).collect()
        assert out == again
