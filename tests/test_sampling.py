"""Tests for the sampling/split/packing operator family."""

from __future__ import annotations

from pyspark.sql import functions as F

from parcial_bigdata_spark.operators import sampling

DOC_SCHEMA = "doc_id long, text string, lang string, source string, n_chars long"


def _docs(spark, n=200):
    rows = [
        (i, " ".join(["tok"] * (10 + i % 40)), "en" if i % 3 else "fr", "web", 100 + i)
        for i in range(n)
    ]
    return spark.createDataFrame(rows, DOC_SCHEMA)


def test_split_assign_deterministic_and_partitions_everything(spark):
    docs = _docs(spark)
    a = sampling.split_assign(docs).collect()
    b = sampling.split_assign(docs).collect()
    assert a == b  # md5-keyed, not rand(): stable across runs
    assert sum(r.n_docs for r in a) == 200
    assert {r.split for r in a} <= {"train", "val", "test"}
    # train should dominate at 80/10/10
    train = sum(r.n_docs for r in a if r.split == "train")
    assert train > 100


def test_split_assign_stable_under_corpus_growth(spark):
    """A document's split must not change when more docs arrive —
    the property md5-bucketing buys over rand(seed) or ntile."""
    small, big = _docs(spark, 50), _docs(spark, 200)
    bucket = sampling._md5_bucket("doc_id")
    s = {r.doc_id: r.b for r in small.select("doc_id", bucket.alias("b")).collect()}
    g = {r.doc_id: r.b for r in big.select("doc_id", bucket.alias("b")).collect()}
    assert all(g[k] == v for k, v in s.items())


def test_stratified_sample_exact_n_per_stratum(spark):
    docs = _docs(spark)
    out = sampling.stratified_sample_exact(docs, n_per_lang=5).collect()
    by_lang = {}
    for r in out:
        by_lang.setdefault(r.lang, []).append(r.rn)
    assert set(by_lang) == {"en", "fr"}
    assert all(sorted(v) == [1, 2, 3, 4, 5] for v in by_lang.values())


def test_quota_sample_caps_defaults_and_drops(spark):
    rows = [(i, "t", "en", f"src{i % 3}", 1) for i in range(30)]  # 10 docs/source
    docs = spark.createDataFrame(rows, DOC_SCHEMA)
    out = sampling.quota_sample_by_source(
        docs, quotas={"src0": 4, "src1": 0, "src2": 99}, default_quota=7
    ).collect()
    by_src = {}
    for r in out:
        by_src[r.source] = by_src.get(r.source, 0) + 1
    # src0 capped at 4; src1 dropped; src2 over-asked → takes all 10
    assert by_src == {"src0": 4, "src2": 10}


def test_epoch_repeat_oversamples_and_drops(spark):
    rows = [(i, "t", "en", f"src{i % 3}", 1) for i in range(9)]  # 3 docs/source
    docs = spark.createDataFrame(rows, DOC_SCHEMA)
    out = {
        r.source: (r.n_rows, r.n_docs, r.max_epoch)
        for r in sampling.epoch_repeat_summary(
            docs, epochs={"src0": 3, "src1": 0}, default_epochs=1
        ).collect()
    }
    # src0 ×3, src1 dropped, src2 default ×1
    assert out == {"src0": (9, 3, 3), "src2": (3, 3, 1)}


def test_pack_sequences_respects_budget_layout(spark):
    docs = spark.createDataFrame(
        [
            (1, " ".join(["t"] * 60), "en", "web", 1),
            (2, " ".join(["t"] * 60), "en", "web", 1),
            (3, " ".join(["t"] * 60), "en", "web", 1),
            (4, " ".join(["t"] * 10), "fr", "web", 1),
        ],
        DOC_SCHEMA,
    )
    rows = sampling.pack_sequences(docs, budget=100).collect()
    got = {(r.lang, r.bin): (r.n_docs, r.total_tokens, r.first_doc, r.last_doc) for r in rows}
    # en: cumsum-exclusive 0,60,120 → bins 0,0,1
    assert got[("en", 0)] == (2, 120, 1, 2)
    assert got[("en", 1)] == (1, 60, 3, 3)
    assert got[("fr", 0)] == (1, 10, 4, 4)


def test_temperature_mixture_flattens_shares(spark):
    # 80/20 corpus at tau=2: weights sqrt(80):sqrt(20) = 2:1 exactly,
    # so tempered shares are 2/3 vs 1/3 (vs raw 0.8/0.2)
    rows = [(i, "t", "en", "big", 1) for i in range(80)] + [
        (100 + i, "t", "en", "small", 1) for i in range(20)
    ]
    docs = spark.createDataFrame(rows, DOC_SCHEMA)
    out = {
        r.source: (r.n_docs, r.raw_share, r.tempered_share, r.target_docs, r.repeat_factor)
        for r in sampling.temperature_mixture(docs, tau=2.0, budget=100).collect()
    }
    assert out["big"] == (80, 0.8, 0.6667, 66, 0.83)  # 66/80 = 0.825, HALF_UP
    assert out["small"] == (20, 0.2, 0.3333, 33, 1.65)


def test_temperature_mixture_integer_boundary_snap(spark):
    """Equal-sized sources put budget·w/tw EXACTLY on an integer — the
    case where a 1-ulp summation-order difference flips floor() to
    target−1 (observed live at sf0.1 before the r12 snap fix).  Four
    25-doc sources at any tau must draw exactly 25 each, never 24."""
    rows = [
        (100 * s + i, "t", "en", f"src{s}", 1)
        for s in range(4)
        for i in range(25)
    ]
    docs = spark.createDataFrame(rows, DOC_SCHEMA)
    for tau in (1.0, 2.0, 3.0):
        out = sampling.temperature_mixture(docs, tau=tau, budget=100)
        assert [r.target_docs for r in out.collect()] == [25, 25, 25, 25]


def test_chunk_documents_overlapping_windows(spark):
    """10 tokens, chunk=4, stride=3 → starts 0/3/6/9; the tail window
    carries only the 1 remaining token; overlap regions repeat."""
    df = spark.createDataFrame(
        [(1, "t0 t1 t2 t3 t4 t5 t6 t7 t8 t9", "en", "web", 29)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    out = sampling.chunk_documents(df, chunk_size=4, stride=3).collect()
    got = [(r.chunk_id, r.chunk_start, r.chunk_tokens, r.chunk_text) for r in out]
    assert got == [
        (0, 0, 4, "t0 t1 t2 t3"),
        (1, 3, 4, "t3 t4 t5 t6"),
        (2, 6, 4, "t6 t7 t8 t9"),
        (3, 9, 1, "t9"),
    ]


def test_chunk_documents_rejects_bad_params(spark):
    import pytest

    df = spark.createDataFrame([(1, "a b", "en", "web", 3)],
                               "doc_id long, text string, lang string, source string, n_chars long")
    with pytest.raises(ValueError):
        sampling.chunk_documents(df, chunk_size=0)
    with pytest.raises(ValueError):
        sampling.chunk_documents(df, stride=-1)


def test_leakage_safe_split_colocates_near_dups(spark, documents):
    """Docs 1, 2, 3 form one near-dup component — whatever split the
    component draws, all three land there together (the leakage the
    per-doc split cannot prevent), and the summary counts components."""
    out = sampling.leakage_safe_split(documents, threshold=0.6).collect()
    total_docs = sum(r.n_docs for r in out)
    total_comps = sum(r.n_components for r in out)
    assert total_docs == 5
    # components: {1,2,3} as one, 4 and 5 as singletons
    assert total_comps == 3
    # the 3-doc component is indivisible: no split may hold exactly 1 or
    # 2 docs MORE than its component count would allow — check directly
    # by recomputing the assignment
    from pyspark.sql import functions as F

    from parcial_bigdata_spark.operators.dedup import (
        duplicate_components,
        jaccard_pairs,
    )
    from parcial_bigdata_spark.operators.sampling import _md5_bucket

    comps = duplicate_components(jaccard_pairs(documents, threshold=0.6))
    assigned = documents.join(comps, "doc_id", "left").withColumn(
        "comp", F.coalesce(F.col("comp"), F.col("doc_id"))
    )
    b = _md5_bucket("comp")
    split = (
        F.when(b < 80, "train").when(b < 90, "val").otherwise("test")
    )
    rows = assigned.select("doc_id", "comp", split.alias("split")).collect()
    by_doc = {r.doc_id: r.split for r in rows}
    assert by_doc[1] == by_doc[2] == by_doc[3]


def test_price_histogram_buckets(spark):
    from parcial_bigdata_spark.operators.aggregations import price_histogram

    df = spark.createDataFrame(
        [(1, 1, "O", 100.0, None, "x"), (2, 1, "O", 24999.99, None, "x"),
         (3, 1, "O", 25000.0, None, "x"), (4, 1, "O", 60000.5, None, "x")],
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    )
    out = {r.bucket: (r.bucket_low, r.n_orders, r.min_price, r.max_price)
           for r in price_histogram(df).collect()}
    assert out == {
        0: (0.0, 2, 100.0, 24999.99),
        1: (25000.0, 1, 25000.0, 25000.0),
        2: (50000.0, 1, 60000.5, 60000.5),
    }


def test_equidepth_histogram_balances_buckets(spark):
    """Quantile-bucketed histogram: 100 distinct uniform prices → 10
    buckets of exactly 10 orders each, with contiguous non-overlapping
    [min, max] ranges."""
    from parcial_bigdata_spark.operators.aggregations import (
        equidepth_histogram,
    )

    df = spark.createDataFrame(
        [(i, 1, "O", float(1000 + i * 10), None, "x") for i in range(100)],
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    )
    rows = equidepth_histogram(df).collect()
    assert [r.bucket for r in rows] == list(range(10))
    assert all(r.n_orders == 10 for r in rows)
    for a, b in zip(rows, rows[1:]):
        assert a.max_price < b.min_price


def test_pps_systematic_sample_exact_k_and_weighting(spark):
    """PPS invariants: per-source picks total exactly k; a document
    dominating the weight mass collects multiple picks; output is a
    pure function of (doc_id, source, n_chars) — re-evaluation with
    shuffled input order is identical."""
    rows = [(i, "t", "en", "s1", 100) for i in range(50)]
    rows += [(100, "t", "en", "s2", 100_000)]  # dominant: ~24 of 25 picks
    rows += [(101 + i, "t", "en", "s2", 100) for i in range(30)]
    docs = spark.createDataFrame(rows, DOC_SCHEMA)
    out = sampling.pps_systematic_sample(docs, k_per_source=25).collect()
    by_src: dict = {}
    for r in out:
        by_src.setdefault(r.source, 0)
        by_src[r.source] += r.n_picks
    assert by_src == {"s1": 25, "s2": 25}
    dom = [r for r in out if r.doc_id == 100]
    assert dom and dom[0].n_picks >= 20
    again = sampling.pps_systematic_sample(
        docs.orderBy(F.rand(7)), k_per_source=25
    ).collect()
    assert sorted(map(tuple, again)) == sorted(map(tuple, out))


def test_quota_sample_plan_prunes_map_side(spark):
    """The literal max-quota pre-filter must restore WindowGroupLimit —
    without it the rank bound lives behind the quota join and the window
    shuffles the whole corpus into |sources| partitions."""
    from parcial_bigdata_spark.operators.sampling import quota_sample_by_source

    docs = spark.createDataFrame(
        [(i, f"src{i % 3}") for i in range(60)], "doc_id long, source string"
    )
    out = quota_sample_by_source(docs, quotas={"src0": 3, "src1": 5}, default_quota=2)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan
    rows = out.collect()
    per_src = {}
    for r in rows:
        per_src.setdefault(r.source, []).append(r.rn)
    assert sorted(per_src["src0"]) == [1, 2, 3]
    assert sorted(per_src["src1"]) == [1, 2, 3, 4, 5]
    assert sorted(per_src["src2"]) == [1, 2]


def test_shuffle_shards_contract(spark, documents):
    """Deterministic training-order shuffle: every doc exactly once,
    contiguous 1..k positions per shard, fully reproducible, and a
    different seed yields a different order (that's the point of
    reseeding per epoch)."""
    from parcial_bigdata_spark.operators import sampling as S

    a = S.shuffle_shards(documents, n_shards=2, seed="e0").collect()
    b = S.shuffle_shards(documents, n_shards=2, seed="e0").collect()
    assert a == b
    assert sorted(r.doc_id for r in a) == [1, 2, 3, 4, 5]
    by_shard = {}
    for r in a:
        by_shard.setdefault(r.shard, []).append(r.pos)
    for shard, poss in by_shard.items():
        assert poss == list(range(1, len(poss) + 1)), shard
    c = S.shuffle_shards(documents, n_shards=2, seed="e1").collect()
    assert [(r.doc_id) for r in c] != [(r.doc_id) for r in a]


def test_price_boxplot_quartiles_and_fences(spark):
    """Golden boxplot: 0..100 step 10 plus one far outlier — exact
    interpolated quartiles and Tukey-fence counts."""
    from parcial_bigdata_spark.operators.aggregations import price_boxplot

    vals = [float(v) for v in range(0, 101, 10)] + [1000.0]
    df = spark.createDataFrame(
        [(i, 1, "O", v, None, "x") for i, v in enumerate(vals)],
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    )
    row = price_boxplot(df).collect()[0]
    # 12 values: percentile_cont(0.25) at index 2.75 -> 27.5, etc.
    assert row.n_orders == 12
    assert row.q1 == 27.5
    assert row.median == 55.0
    assert row.q3 == 82.5
    assert row.iqr == 55.0
    assert row.n_low_outliers == 0          # fence at -55
    assert row.n_high_outliers == 1         # 1000 > 165


def test_token_length_histogram_exact_boundaries(spark):
    """Power-of-two boundaries are exact: 1 token → bucket 0, 2 → 1,
    1023 → 9, 1024 → 10; empty text → bucket -1."""
    docs = spark.createDataFrame(
        [
            (1, "t", "en", "s", 1),
            (2, "t t", "en", "s", 3),
            (3, " ".join(["t"] * 1023), "en", "s", 1),
            (4, " ".join(["t"] * 1024), "en", "s", 1),
            (5, "", "en", "s", 0),
        ],
        DOC_SCHEMA,
    )
    out = {r.bucket: (r.n_docs, r.min_tokens, r.max_tokens)
           for r in sampling.token_length_histogram(docs).collect()}
    assert out[-1] == (1, 0, 0)
    assert out[0] == (1, 1, 1)
    assert out[1] == (1, 2, 2)
    assert out[9] == (1, 1023, 1023)
    assert out[10] == (1, 1024, 1024)


def test_negative_sample_pairs_properties(spark):
    """Structural guarantees: exactly k negatives per doc, every doc
    appears as a negative exactly k times, never a self-pair, and the
    assignment is a pure function of the corpus (two runs identical)."""
    from collections import Counter

    from parcial_bigdata_spark.operators.sampling import (
        negative_sample_pairs,
    )

    docs = spark.createDataFrame(
        [(i,) for i in range(41)], "doc_id long"
    )
    rows = negative_sample_pairs(docs, k=3).collect()
    assert len(rows) == 41 * 3
    per_doc = Counter(r.doc_id for r in rows)
    as_neg = Counter(r.neg_doc_id for r in rows)
    assert set(per_doc.values()) == {3} and set(as_neg.values()) == {3}
    assert all(r.doc_id != r.neg_doc_id for r in rows)
    again = negative_sample_pairs(docs, k=3).collect()
    assert {tuple(r) for r in rows} == {tuple(r) for r in again}
    # a single doc has no valid negative: empty output, not a self-pair
    one = spark.createDataFrame([(7,)], "doc_id long")
    assert negative_sample_pairs(one).count() == 0


def test_temporal_split_embargo_visible(spark):
    import datetime as dt

    rows = [
        (1, dt.datetime(2024, 1, 10), 1, "click", 1.0, "{}"),   # train
        (2, dt.datetime(2024, 1, 19, 23), 2, "click", 1.0, "{}"),  # train
        (3, dt.datetime(2024, 1, 20), 1, "click", 1.0, "{}"),   # embargo
        (4, dt.datetime(2024, 1, 21, 23), 3, "click", 1.0, "{}"),  # embargo
        (5, dt.datetime(2024, 1, 22), 1, "click", 1.0, "{}"),   # test
    ]
    ev = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    out = {
        r.split: (r.n_events, r.n_users)
        for r in sampling.temporal_split(ev).collect()
    }
    # the embargoed stratum is REPORTED, not silently dropped
    assert out == {"train": (2, 2), "embargo": (2, 2), "test": (1, 1)}


def test_temporal_split_rejects_negative_embargo(spark):
    import pytest

    with pytest.raises(ValueError, match="embargo"):
        sampling.temporal_split(spark.range(1), embargo_days=-1)


def test_group_kfold_partitions_users_exactly(spark):
    import datetime as dt

    ev = spark.createDataFrame(
        [
            (i, dt.datetime(2024, 1, 1), i % 40, "click", 1.0, "{}")
            for i in range(200)
        ],
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    rows = sampling.group_kfold(ev, k=4).collect()
    # every fold in range, counts partition the corpus exactly: a user
    # lands in ONE fold, so fold user counts sum to the 40 users and
    # event counts to the 200 events
    assert all(0 <= r.fold < 4 for r in rows)
    assert sum(r.n_users for r in rows) == 40
    assert sum(r.n_events for r in rows) == 200
    # deterministic: pure function of the ids
    assert rows == sampling.group_kfold(ev, k=4).collect()


def test_group_kfold_rejects_k_below_two(spark):
    import pytest

    with pytest.raises(ValueError, match="k must be"):
        sampling.group_kfold(spark.range(1), k=1)


def test_hourly_ohlc_bookends_and_volume(spark):
    import datetime as dt

    from parcial_bigdata_spark.operators import aggregations

    h = dt.datetime(2024, 1, 1, 10)
    rows = [
        # one hour, ts order: open 5.0 (first), close 9.0 (last)
        (1, h.replace(minute=0), 1, "a", 5.0, "{}"),
        (2, h.replace(minute=30), 1, "a", 1.0, "{}"),
        (3, h.replace(minute=59), 1, "a", 9.0, "{}"),
        # same-ts tie broken by event_id: open eid 4, close eid 5
        (4, h.replace(hour=11), 1, "a", 7.0, "{}"),
        (5, h.replace(hour=11), 1, "a", 3.0, "{}"),
    ]
    ev = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    out = {r.hour.hour: r for r in aggregations.hourly_ohlc(ev).collect()}
    b10, b11 = out[10], out[11]
    assert (b10.open, b10.close, b10.high, b10.low) == (5.0, 9.0, 9.0, 1.0)
    assert (b10.volume, b10.n_events) == (15.0, 3)
    assert (b11.open, b11.close) == (7.0, 3.0)


def test_abc_classes_exact_cutoffs(spark):
    from parcial_bigdata_spark.operators import aggregations

    # revenues 80, 15, 5 (discount 0): cumulative shares 0.80, 0.95, 1.0
    # -> boundary parts classify A and B via the exact integer cutoffs
    rows = [
        (1, 101, 1, 1, 1.0, 80.0, 0.0, 0.0, "N", "O", None),
        (2, 102, 1, 1, 1.0, 15.0, 0.0, 0.0, "N", "O", None),
        (3, 103, 1, 1, 1.0, 5.0, 0.0, 0.0, "N", "O", None),
    ]
    li = spark.createDataFrame(
        rows,
        "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber int, "
        "l_quantity double, l_extendedprice double, l_discount double, "
        "l_tax double, l_returnflag string, l_linestatus string, "
        "l_shipdate timestamp",
    )
    out = {r.abc_class: r for r in aggregations.abc_revenue_classes(li).collect()}
    assert (out["A"].n_parts, out["A"].class_revenue) == (1, 80.0)
    assert (out["B"].n_parts, out["B"].class_revenue) == (1, 15.0)
    assert (out["C"].n_parts, out["C"].class_revenue) == (1, 5.0)


def test_undersample_balance_caps_at_min_class(spark):
    docs = spark.createDataFrame(
        [(1, "a", "en", "w", 10), (2, "b", "en", "w", 20), (3, "c", "en", "w", 30),
         (4, "d", "es", "w", 40),
         (5, "e", "fr", "w", 50), (6, "f", "fr", "w", 60)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    out = {r.lang: r for r in sampling.undersample_balance(docs).collect()}
    # min class (es) has 1 doc -> every language keeps exactly 1
    assert all(r.n_kept == 1 for r in out.values())
    assert (out["en"].n_docs, out["en"].n_dropped) == (3, 2)
    assert (out["es"].n_docs, out["es"].n_dropped) == (1, 0)
    # kept_chars is the chars of the md5-chosen survivor, not a mean
    assert out["es"].kept_chars == 40


def test_nation_supplier_hhi_monopoly_and_duopoly(spark):
    import datetime as dt

    from parcial_bigdata_spark.operators import aggregations

    li = spark.createDataFrame(
        [
            # nation A: one supplier -> HHI 1.0
            (1, 1, 10, 1, 1.0, 100.0, 0.0, 0.0, "N", "O",
             dt.datetime(2024, 1, 1)),
            # nation B: two equal suppliers -> HHI 0.5
            (2, 2, 20, 1, 1.0, 50.0, 0.0, 0.0, "N", "O",
             dt.datetime(2024, 1, 1)),
            (3, 3, 21, 1, 1.0, 50.0, 0.0, 0.0, "N", "O",
             dt.datetime(2024, 1, 1)),
        ],
        "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber int, "
        "l_quantity double, l_extendedprice double, l_discount double, "
        "l_tax double, l_returnflag string, l_linestatus string, "
        "l_shipdate timestamp",
    )
    supp = spark.createDataFrame(
        [(10, "s10", 0, 0.0), (20, "s20", 1, 0.0), (21, "s21", 1, 0.0)],
        "s_suppkey long, s_name string, s_nationkey int, s_acctbal double",
    )
    nat = spark.createDataFrame(
        [(0, "AAA", 0), (1, "BBB", 0)],
        "n_nationkey int, n_name string, n_regionkey int",
    )
    out = {
        r.n_name: r
        for r in aggregations.nation_supplier_hhi(li, supp, nat).collect()
    }
    assert (out["AAA"].n_suppliers, out["AAA"].hhi) == (1, 1.0)
    assert (out["BBB"].n_suppliers, out["BBB"].hhi) == (2, 0.5)
