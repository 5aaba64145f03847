"""Round-16 operators: McNemar's paired before/after conversion test
(plus siblings added this round).  Each test pins the result against a
hand-computed corpus small enough to verify by inspection, and the
paired-boundary test runs the DuckDB oracle side-by-side (the
differential sweep is the scale gate).

Reference behavior parity: the reference repo has no statistics
surface at all (its 252 LoC are ingest/API glue — SURVEY.md §2);
these are part of the declared analytics extension tier.
"""

from __future__ import annotations

import datetime as dt

import pytest

from parcial_bigdata_spark.operators import analytics as ana


def _ev_rows(spec):
    """spec: list of (user_id, event_type, datetime)."""
    return [
        (i, u, t, ts, float(i), "{}")
        for i, (u, t, ts) in enumerate(spec)
    ]


_EV_SCHEMA = (
    "event_id long, user_id long, event_type string, ts timestamp,"
    " value double, props string"
)


class TestMcNemarPaired:
    def test_hand_computed_with_midpoint_boundary(self, spark):
        """b = 4 (u1, u2, u3 purchase only in H1; u6 purchases EXACTLY
        at the integer-microsecond midpoint — the <= boundary puts it
        in H1), c = 0, concordant users u4 (both halves) and u5
        (neither): chi2_cc = (|4-0|-1)^2 / 4 = 2.25, not significant."""
        t0 = dt.datetime(2024, 1, 1)    # min ts
        t1 = dt.datetime(2024, 1, 31)   # max ts
        mid = dt.datetime(2024, 1, 16)  # exact integer midpoint
        rows = _ev_rows([
            (1, "purchase", dt.datetime(2024, 1, 2)),
            (1, "view", dt.datetime(2024, 1, 30)),
            (2, "purchase", dt.datetime(2024, 1, 3)),
            (2, "view", dt.datetime(2024, 1, 29)),
            (3, "purchase", dt.datetime(2024, 1, 4)),
            (4, "purchase", dt.datetime(2024, 1, 5)),
            (4, "purchase", dt.datetime(2024, 1, 29)),
            (5, "view", t0),
            (5, "view", t1),
            (6, "purchase", mid),
        ])
        out = ana.mcnemar_purchase_halves(
            spark.createDataFrame(rows, _EV_SCHEMA)
        ).collect()[0]
        assert out["n_users"] == 6
        assert (out["h1_only"], out["h2_only"]) == (4, 0)
        assert out["chi2_cc"] == pytest.approx(2.25, abs=1e-12)
        assert out["significant_95"] is False

    def test_matches_duckdb_oracle(self, spark):
        """Engine vs oracle on a corpus with discordance BOTH ways —
        b = 1, c = 2, so the continuity-corrected statistic lands on
        exactly 0.0 (|b-c| = 1), a value the b+c > 0 guard must still
        report as 0.0, not NULL."""
        import duckdb
        import pandas as pd

        from parcial_bigdata_spark.plans.registry import ORACLES

        spec = [
            (1, "purchase", dt.datetime(2024, 3, 1)),
            (2, "purchase", dt.datetime(2024, 3, 25)),
            (3, "purchase", dt.datetime(2024, 3, 2)),
            (3, "purchase", dt.datetime(2024, 3, 26)),
            (4, "view", dt.datetime(2024, 3, 1)),
            (4, "view", dt.datetime(2024, 3, 27)),
            (5, "purchase", dt.datetime(2024, 3, 24)),
        ]
        rows = _ev_rows(spec)
        out = ana.mcnemar_purchase_halves(
            spark.createDataFrame(rows, _EV_SCHEMA)
        ).collect()[0]
        # window 3/1..3/27, midpoint 3/14: b = {1}, c = {2, 5}
        assert (out["h1_only"], out["h2_only"]) == (1, 2)
        con = duckdb.connect()
        ev = pd.DataFrame(
            rows,
            columns=["event_id", "user_id", "event_type", "ts", "value",
                     "props"],
        ).astype({"ts": "datetime64[us]"})
        con.register("events", ev)
        ora = con.execute(ORACLES["stats_mcnemar_paired"]).df().iloc[0]
        for col in ("n_users", "h1_only", "h2_only"):
            assert int(ora[col]) == out[col], col
        assert ora["chi2_cc"] == pytest.approx(out["chi2_cc"], abs=1e-12)
        assert bool(ora["significant_95"]) == out["significant_95"]

    def test_zero_discordant_is_null(self, spark):
        """b = c = 0 (every user concordant): the statistic is
        undefined — NULL on both engines, never a 0/0 NaN."""
        rows = _ev_rows([
            (1, "purchase", dt.datetime(2024, 1, 2)),
            (1, "purchase", dt.datetime(2024, 1, 30)),
            (2, "view", dt.datetime(2024, 1, 1)),
            (2, "view", dt.datetime(2024, 1, 31)),
        ])
        out = ana.mcnemar_purchase_halves(
            spark.createDataFrame(rows, _EV_SCHEMA)
        ).collect()[0]
        assert (out["h1_only"], out["h2_only"]) == (0, 0)
        assert out["chi2_cc"] is None and out["significant_95"] is None


class TestFriedmanBlocks:
    @staticmethod
    def _counts_rows(spec):
        """spec: {user: {type: count}} -> event rows."""
        rows, eid = [], 0
        t0 = dt.datetime(2024, 5, 1)
        for u, types in spec.items():
            for t, n in types.items():
                for _ in range(n):
                    rows.append((eid, u, t, t0, 1.0, "{}"))
                    eid += 1
        return rows

    def test_hand_computed_with_ties_and_incomplete_block(self, spark):
        """4 complete blocks, one tied pair (u4 view == click), u5
        incomplete (view only, excluded): ranks R = (6.5, 7.5, 10),
        A = 55.5, C = 48 -> chi2_F = 2 * 6.5 / 7.5 = 1.733333."""
        rows = self._counts_rows({
            1: {"view": 1, "click": 2, "purchase": 3},
            2: {"view": 1, "click": 2, "purchase": 3},
            3: {"view": 3, "click": 2, "purchase": 1},
            4: {"view": 1, "click": 1, "purchase": 2},
            5: {"view": 7},
        })
        out = ana.friedman_activity_blocks(
            spark.createDataFrame(rows, _EV_SCHEMA)
        ).collect()[0]
        assert (out["n_blocks"], out["k_treatments"], out["df"]) == (4, 3, 2)
        assert out["chi2_f"] == pytest.approx(1.733333, abs=1e-6)
        assert out["significant_95"] is False

    def test_matches_duckdb_oracle(self, spark):
        import duckdb
        import pandas as pd

        from parcial_bigdata_spark.plans.registry import ORACLES

        rows = self._counts_rows({
            1: {"view": 5, "click": 1, "purchase": 2},
            2: {"view": 4, "click": 1, "purchase": 1},
            3: {"view": 6, "click": 2, "purchase": 1},
            4: {"view": 3, "click": 1, "purchase": 1},
            5: {"view": 9, "click": 2, "purchase": 1},
            6: {"click": 4},
        })
        out = ana.friedman_activity_blocks(
            spark.createDataFrame(rows, _EV_SCHEMA)
        ).collect()[0]
        con = duckdb.connect()
        ev = pd.DataFrame(
            rows,
            columns=["event_id", "user_id", "event_type", "ts", "value",
                     "props"],
        ).astype({"ts": "datetime64[us]"})
        con.register("events", ev)
        ora = con.execute(ORACLES["stats_friedman_blocks"]).df().iloc[0]
        for col in ("n_blocks", "k_treatments", "df"):
            assert int(ora[col]) == out[col], col
        assert ora["chi2_f"] == pytest.approx(out["chi2_f"], abs=1e-12)
        assert bool(ora["significant_95"]) == out["significant_95"]

    def test_fully_tied_blocks_are_null(self, spark):
        """Every user has identical counts across all types: all ranks
        tied in every block -> denominator 0 -> NULL statistic."""
        rows = self._counts_rows({
            1: {"view": 2, "click": 2, "purchase": 2},
            2: {"view": 1, "click": 1, "purchase": 1},
        })
        out = ana.friedman_activity_blocks(
            spark.createDataFrame(rows, _EV_SCHEMA)
        ).collect()[0]
        assert out["n_blocks"] == 2
        assert out["chi2_f"] is None and out["significant_95"] is None
