"""Sampling / split / packing operators for training-data pipelines.

The reference has no sampling surface (it loads every row,
`lambda/subirDB.py:102-116`); these are the north-star extension
operators a 100 TB corpus pipeline needs: deterministic train/val/test
splits, exact per-stratum sampling, and context-window sequence packing.

Every operator keys its randomness off ``md5`` of a stable id — not
``rand()`` — so assignments are reproducible across runs, engines, and
cluster sizes (the property a training pipeline actually needs: a doc's
split never changes when the corpus grows).  All are single-shuffle:
hash-partition on the stratum key, window or aggregate inside it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _md5_bucket(id_col: str, n_buckets: int = 100):
    """Deterministic [0, n_buckets) bucket from the md5 of an id.

    First 4 hex chars → 16 bits → modulo.  Row-local (no shuffle), and
    engine-portable: md5 is md5 everywhere, unlike hash()/rand(seed)
    whose implementations differ per engine."""
    hex4 = F.substring(F.md5(F.col(id_col).cast("string")), 1, 4)
    return F.conv(hex4, 16, 10).cast("int") % n_buckets


def split_assign(
    documents: DataFrame, train_pct: int = 80, val_pct: int = 10
) -> DataFrame:
    """Assign every document to train/val/test by md5 bucket of doc_id
    and summarize the split per language.  The assignment is a row-local
    projection — at 100 TB this is a zero-shuffle map; only the tiny
    (split × lang) summary aggregates."""
    bucket = _md5_bucket("doc_id")
    split = (
        F.when(bucket < train_pct, "train")
        .when(bucket < train_pct + val_pct, "val")
        .otherwise("test")
    )
    return (
        documents.select(split.alias("split"), "lang", "n_chars")
        .groupBy("split", "lang")
        .agg(F.count("*").alias("n_docs"), F.sum("n_chars").alias("total_chars"))
        .orderBy("split", "lang")
    )


def stratified_sample_exact(documents: DataFrame, n_per_lang: int = 20) -> DataFrame:
    """Exactly ``n_per_lang`` documents per language, chosen by md5
    order — a deterministic uniform draw (md5 is uniform over ids and
    independent of the sort order the data arrived in).

    One shuffle on the stratum key; ``row_number`` + filter is the
    rank-k pattern WindowGroupLimit prunes to per-partition top-k before
    the exchange, so the shuffle carries ≤ n_per_lang rows per upstream
    partition, not the corpus."""
    w = Window.partitionBy("lang").orderBy(
        F.md5(F.col("doc_id").cast("string")).asc(), F.col("doc_id").asc()
    )
    return (
        documents.select("doc_id", "lang", F.row_number().over(w).alias("rn"))
        .where(F.col("rn") <= n_per_lang)
        .select("doc_id", "lang", "rn")
        .orderBy("lang", "rn")
    )


DEFAULT_QUOTAS = {"src0": 30, "src1": 10, "src2": 5, "src3": 0}


def quota_sample_by_source(
    documents: DataFrame,
    quotas: dict[str, int] | None = None,
    default_quota: int = 8,
) -> DataFrame:
    """Corpus mixing: cap each source at its quota (unlisted sources get
    ``default_quota``; a 0 quota drops the source), drawing
    deterministically by md5 order.  The quota table is tiny → broadcast
    left join + coalesce.  Over-asking (quota > available) just takes
    everything — the cap is a min, not a requirement.

    The rank filter is applied in two stages on purpose: the exact
    per-source bound references the joined quota column, which
    WindowGroupLimit cannot see — filtered only there, the window
    shuffles the WHOLE corpus into |sources| hot partitions.  Capping
    first at the LITERAL max quota (known driver-side from the dict)
    restores the pushdown: each upstream partition forwards ≤ max-quota
    rows per source, and the exact per-source cap prunes the remainder
    after the join (lossless: quota ≤ max quota).  Plan-shape pinned by
    test_quota_sample_plan_prunes_map_side."""
    quotas = DEFAULT_QUOTAS if quotas is None else quotas
    spark = documents.sparkSession
    qdf = spark.createDataFrame(list(quotas.items()), "source string, quota int")
    max_quota = max([*quotas.values(), default_quota])
    w = Window.partitionBy("source").orderBy(
        F.md5(F.col("doc_id").cast("string")).asc(), F.col("doc_id").asc()
    )
    return (
        documents.select("doc_id", "source", F.row_number().over(w).alias("rn"))
        .where(F.col("rn") <= F.lit(max_quota))
        .join(F.broadcast(qdf), on="source", how="left")
        .where(F.col("rn") <= F.coalesce(F.col("quota"), F.lit(default_quota)))
        .select("doc_id", "source", "rn")
        .orderBy("source", "rn")
    )


DEFAULT_EPOCHS = {"src0": 3, "src1": 2, "src2": 0}


def epoch_repeat_summary(
    documents: DataFrame,
    epochs: dict[str, int] | None = None,
    default_epochs: int = 1,
) -> DataFrame:
    """Corpus mixing by oversampling: repeat each source's documents
    ``n_epochs`` times (0 drops the source) and summarize the resulting
    mix.  Repetition is ``explode(sequence(...))`` — a row-local
    generator, no join against itself, no driver loop; at 100 TB the
    repeated rows never materialize outside the downstream pipeline
    that consumes them.  Spark's ``sequence`` reverses direction when
    start > stop, so 0-epoch sources are filtered BEFORE the explode
    rather than relying on an empty sequence."""
    epochs = DEFAULT_EPOCHS if epochs is None else epochs
    spark = documents.sparkSession
    edf = spark.createDataFrame(list(epochs.items()), "source string, n_epochs int")
    repeated = (
        documents.join(F.broadcast(edf), on="source", how="left")
        .select(
            "doc_id",
            "source",
            F.coalesce(F.col("n_epochs"), F.lit(default_epochs)).alias("n_epochs"),
        )
        .where(F.col("n_epochs") >= 1)
        .select(
            "doc_id",
            "source",
            F.explode(F.sequence(F.lit(1), F.col("n_epochs"), F.lit(1))).alias("epoch"),
        )
    )
    return (
        repeated.groupBy("source")
        .agg(
            F.count("*").alias("n_rows"),
            F.countDistinct("doc_id").alias("n_docs"),
            F.max("epoch").alias("max_epoch"),
        )
        .orderBy("source")
    )


def temperature_mixture(
    documents: DataFrame, tau: float = 2.0, budget: int = 1000
) -> DataFrame:
    """Temperature-based corpus mixing (the mT5-style sampling schedule):
    per-source sampling share ∝ n_s^(1/τ), flattening the raw size
    distribution so small sources are not drowned out (τ=1 keeps raw
    proportions; τ→∞ approaches uniform).

    Emits the mixing plan per source: raw vs tempered share, the target
    document count for a ``budget``-doc draw, and the repeat factor
    (targets above a source's size mean oversampling epochs — see
    ``epoch_repeat_summary`` for the row-level mechanism; the md5-rank
    draw in ``quota_sample_by_source`` executes sub-size targets).

    Cost: one map-side-combined count per source plus a 1-row total —
    both tiny at any scale; the plan itself never touches row data."""
    counts = documents.groupBy("source").agg(F.count("*").alias("n_docs"))
    weighted = counts.withColumn("w", F.pow(F.col("n_docs").cast("double"), 1.0 / tau))
    totals = weighted.agg(
        F.sum("w").alias("tw"), F.sum("n_docs").alias("tn")
    )
    # snap the quotient to the 1e-9 grid BEFORE flooring: tw is a sum
    # of doubles whose partial-sum order differs between engines (and
    # between Spark plans), and equal-sized sources put budget·w/tw
    # EXACTLY on an integer — observed live at sf0.1 (20×250 docs →
    # 50 ± 1 ulp flooring to 49 or 50 by summation order).  The snap
    # absorbs the ulp jitter; a mathematically non-integer quotient is
    # never within 5e-10 of an integer at these magnitudes.
    quotient = F.lit(float(budget)) * F.col("w") / F.col("tw")
    snapped = F.floor(quotient * F.lit(1e9) + F.lit(0.5)) / F.lit(1e9)
    target = F.floor(snapped).cast("long")
    return (
        weighted.crossJoin(F.broadcast(totals))
        .select(
            "source",
            "n_docs",
            F.round(F.col("n_docs") / F.col("tn"), 4).alias("raw_share"),
            F.round(F.col("w") / F.col("tw"), 4).alias("tempered_share"),
            target.alias("target_docs"),
            F.round(target.cast("double") / F.col("n_docs"), 2).alias("repeat_factor"),
        )
        .orderBy("source")
    )


def pack_sequences(documents: DataFrame, budget: int = 2048) -> DataFrame:
    """Pack documents into token-budget bins per language
    (context-window packing for LLM training).  Documents are laid out
    in deterministic doc_id order as one concatenated token stream cut
    every ``budget`` tokens; a document's bin is where it STARTS
    (exclusive running total div budget), so a document straddling a
    cut is accounted to its starting bin and that bin's total_tokens
    can exceed the budget by up to one document's length — the
    concat-and-cut layout LLM training uses (sequences are split at
    the boundary), NOT first-fit bin packing (no bin ever ends early).
    Computed as one window cumsum instead of a driver loop.  One
    shuffle on the stratum key; bin stats aggregate on (lang, bin)
    which inherits that partitioning."""
    tokens = F.size(F.split("text", " "))
    w = (
        Window.partitionBy("lang")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    with_bin = documents.select(
        "doc_id",
        "lang",
        tokens.alias("n_tokens"),
        F.floor(F.coalesce(F.sum(tokens).over(w), F.lit(0)) / budget)
        .cast("long")
        .alias("bin"),
    )
    return (
        with_bin.groupBy("lang", "bin")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").alias("total_tokens"),
            F.min("doc_id").alias("first_doc"),
            F.max("doc_id").alias("last_doc"),
        )
        .orderBy("lang", "bin")
    )


def chunk_documents(
    documents: DataFrame, chunk_size: int = 32, stride: int = 24
) -> DataFrame:
    """Overlapping context-window chunks — the sharding step that turns
    long documents into fixed-size training sequences (stride < chunk
    size overlaps consecutive windows so no boundary context is lost).

    Entirely row-local: token split, a stride-stepped ``sequence`` of
    start offsets, one ``explode`` — zero shuffle, linear in corpus
    size, and the explode factor is bounded by ceil(len/stride), so
    partition sizes stay predictable at 100 TB (no skew amplification
    beyond document length itself, which upstream length filters cap)."""
    if stride <= 0 or chunk_size <= 0:
        raise ValueError("chunk_size and stride must be positive")
    from parcial_bigdata_spark.operators.text import normalized

    toks = F.split(normalized(F.col("text")), " ")
    starts = F.sequence(F.lit(0), F.greatest(F.size(toks) - 1, F.lit(0)), F.lit(stride))
    chunked = documents.select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        toks.alias("toks"),
        F.explode(starts).alias("chunk_start"),
    )
    return chunked.select(
        "doc_id",
        F.expr(f"chunk_start div {stride}").alias("chunk_id"),
        "chunk_start",
        F.least(F.lit(chunk_size), F.col("n_tokens") - F.col("chunk_start")).alias(
            "chunk_tokens"
        ),
        F.array_join(
            F.slice(F.col("toks"), F.col("chunk_start") + 1, F.lit(chunk_size)), " "
        ).alias("chunk_text"),
    ).orderBy("doc_id", "chunk_id")


def leakage_safe_split(
    documents: DataFrame,
    threshold: float = 0.6,
    train_pct: int = 80,
    val_pct: int = 10,
) -> DataFrame:
    """Near-dup-aware train/val/test split: the md5 bucket is taken on
    the document's DUPLICATE COMPONENT id (connected components over the
    near-dup pair graph; singletons use their own doc_id), so every near
    duplicate of a test document lands in test with it — the split-
    leakage failure mode plain per-doc bucketing cannot prevent.

    Cost on top of the plain split: the near-dup pair graph + CC label
    propagation (both already linear/bucketed — see jaccard_pairs /
    duplicate_components); the split itself stays a row-local projection
    of the component id.  Summary reports docs, distinct components, and
    chars per split."""
    from parcial_bigdata_spark.operators.dedup import (
        duplicate_components,
        jaccard_pairs,
    )

    comps = duplicate_components(jaccard_pairs(documents, threshold=threshold))
    assigned = documents.join(comps, "doc_id", "left").withColumn(
        "comp", F.coalesce(F.col("comp"), F.col("doc_id"))
    )
    bucket = _md5_bucket("comp")
    split = (
        F.when(bucket < train_pct, "train")
        .when(bucket < train_pct + val_pct, "val")
        .otherwise("test")
    )
    return (
        assigned.select(split.alias("split"), "comp", "n_chars")
        .groupBy("split")
        .agg(
            F.count("*").alias("n_docs"),
            F.countDistinct("comp").alias("n_components"),
            F.sum("n_chars").alias("total_chars"),
        )
        .orderBy("split")
    )


def negative_sample_pairs(documents: DataFrame, k: int = 3) -> DataFrame:
    """Deterministic negative sampling for contrastive training: pair
    every document with ``k`` pseudo-random OTHER documents via modular
    offsets on the md5-shuffled rank line — offset_j =
    max(1, ⌊n·j/(k+1)⌋), partner rank = ((r−1+offset_j) mod n)+1.

    Why this construction over rejection sampling: it is a pure
    function of the corpus (reproducible epochs, engine-portable — the
    repo's md5 convention), every doc gets EXACTLY k negatives, no
    self-pairs (offsets land in [1, n−1] for n ≥ 2), and every doc
    appears as a negative exactly k times — the balanced-coverage
    property random draws only approach in expectation.

    The rank line is ``scale.distributed_rank`` over a 60-bit numeric
    projection of the md5 (15 hex chars — the sketch pass needs a
    numeric; doc_id tie-break covers the astronomically unlikely prefix
    collision), so there is no single-task global sort; the partner
    lookup is ONE slim rank-equi self-join.  Corpora with n < 2 emit
    nothing (a self-pair is never a valid negative)."""
    from parcial_bigdata_spark.operators.scale import distributed_rank

    h15 = F.conv(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 15), 16, 10
    ).cast("long")
    ranked = distributed_rank(
        documents.select("doc_id", h15.alias("h")),
        "h",
        "doc_id",
        out_col="r",
    ).select("doc_id", "r")
    n_frame = ranked.agg(F.count(F.lit(1)).alias("n"))
    offs = F.explode(
        F.array(*[F.lit(j) for j in range(1, k + 1)])
    ).alias("neg_idx")
    probes = (
        ranked.crossJoin(F.broadcast(n_frame))
        .where(F.col("n") >= 2)
        .select("doc_id", "r", "n", offs)
        .withColumn(
            "pr",
            (
                (
                    F.col("r")
                    - 1
                    + F.greatest(
                        F.lit(1),
                        F.floor(F.col("n") * F.col("neg_idx") / (k + 1)),
                    )
                )
                % F.col("n")
            )
            + 1,
        )
    )
    partners = ranked.select(
        F.col("r").alias("pr"), F.col("doc_id").alias("neg_doc_id")
    )
    return (
        probes.join(partners, "pr")
        .select("doc_id", "neg_idx", "neg_doc_id")
        .orderBy("doc_id", "neg_idx")
    )


def pps_systematic_sample(
    documents: DataFrame, k_per_source: int = 25
) -> DataFrame:
    """Deterministic probability-proportional-to-size (PPS) systematic
    sample: exactly ``k_per_source`` picks per source, where a
    document's selection probability is proportional to its length —
    the corpus-curation draw that samples BYTES uniformly rather than
    documents uniformly (a 100-char doc and a 10k-char doc are not the
    same amount of training signal).

    Classic systematic PPS: lay the documents on a line in a
    deterministic pseudorandom order (md5 of doc_id), each occupying a
    segment of width = its weight, and pick the k boundary-crossing
    segments at every W/k stride.  The boundary test is INTEGER-EXACT
    — ``(cum·k) div W`` transitions, no float priorities — so the
    DuckDB oracle matches bit-for-bit (a float formulation like
    Efraimidis-Spirakis u^(1/w) keys would hinge on cross-engine pow()
    ulps).  A document wider than the stride yields multiple picks
    (n_picks > 1) — the correct PPS semantics for dominant items.

    One source-keyed shuffle: the running-sum window and the per-source
    total share the exchange; document payloads never ride it."""
    w = F.greatest(F.col("n_chars").cast("bigint"), F.lit(1))
    order = Window.partitionBy("source").orderBy(
        F.md5(F.col("doc_id").cast("string")).asc(), F.col("doc_id").asc()
    )
    keyed = documents.select("doc_id", "source", w.alias("w")).select(
        "doc_id",
        "source",
        "w",
        F.sum("w").over(order).alias("cum"),
        F.sum("w").over(Window.partitionBy("source")).alias("total_w"),
    )
    # DIV, not `/`: float division then truncation could misplace an
    # exactly-divisible boundary; integer DIV keeps the claim exact
    k = int(k_per_source)
    hi = F.expr(f"(cum * {k}) DIV total_w")
    lo = F.expr(f"((cum - w) * {k}) DIV total_w")
    return (
        keyed.select(
            "doc_id",
            "source",
            "w",
            (hi - lo).alias("n_picks"),
            lo.alias("first_pick"),
        )
        .where(F.col("n_picks") > 0)
        .orderBy("source", "first_pick")
    )


def shuffle_shards(
    documents: DataFrame, n_shards: int = 8, seed: str = "seed0"
) -> DataFrame:
    """Deterministic corpus shuffle + sharding — the training-order op:
    every epoch's data loader wants the corpus in a reproducible
    pseudorandom order, materialized as N shard files read in parallel.

    Order key = md5(seed:doc_id) — engine-portable (md5 is md5
    everywhere; hash()/rand(seed) differ per engine), uniform, and
    reseedable per epoch.  Shard = 16-bit md5 prefix mod N (row-local),
    position = row_number within the shard ordered by the key — so
    there is NO global sort: the one exchange hash-partitions by shard
    and each shard sorts independently.  At cluster scale the shard
    count IS the sort parallelism — pick n_shards ≥ executor slots
    (real pipelines use 1024+ shards of a few hundred MB each); the
    projection carries only ids + keys, so document payloads never
    ride this shuffle (writers join the plan back on doc_id).
    """
    key = F.md5(
        F.concat_ws(":", F.lit(seed), F.col("doc_id").cast("string"))
    )
    keyed = documents.select(
        "doc_id",
        key.alias("k"),
        (F.conv(F.substring(key, 1, 4), 16, 10).cast("int") % n_shards).alias(
            "shard"
        ),
    )
    w = Window.partitionBy("shard").orderBy(
        F.col("k").asc(), F.col("doc_id").asc()
    )
    return (
        keyed.select(
            "doc_id", "shard", F.row_number().over(w).alias("pos")
        )
        .orderBy("shard", "pos")
    )


def token_length_histogram(documents: DataFrame) -> DataFrame:
    """Per-source sequence-length profile in power-of-two buckets — the
    planning input for context-window packing (which budget wastes the
    least padding) and the first chart of any corpus report.

    Entirely row-local until one tiny groupBy: bucket = floor(log2(
    tokens)) computed as the integer bit length (no float log — exact
    at every boundary: 512 tokens lands in [512,1024), not in a
    float-fuzzed neighbor), then counts and token totals partial-
    aggregate map-side."""
    toks = F.size(F.filter(F.split("text", " "), lambda x: x != ""))
    # integer log2 via bit-shift loop unrolled as a CASE over the
    # meaningful range: documents beyond 2^20 tokens bucket together
    bucket = F.when(toks <= 0, F.lit(-1))
    for b in range(20):
        bucket = bucket.when(toks < F.lit(2 ** (b + 1)), F.lit(b))
    bucket = bucket.otherwise(F.lit(20))
    return (
        documents.select("source", toks.alias("n_tokens"), bucket.alias("bucket"))
        .groupBy("source", "bucket")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("total_tokens"),
            F.min("n_tokens").alias("min_tokens"),
            F.max("n_tokens").alias("max_tokens"),
        )
        .orderBy("source", "bucket")
    )


def temporal_split(
    events: DataFrame,
    train_end: str = "2024-01-20",
    embargo_days: int = 2,
) -> DataFrame:
    """Leakage-safe TEMPORAL train/test split with an embargo gap
    (`sample_temporal_split`) — the forecasting/financial-ML eval
    protocol: train strictly before ``train_end``, test only after an
    ``embargo_days`` quarantine, so serially-correlated rows adjacent
    to the boundary can't leak target information across it.  The
    embargoed rows are REPORTED as their own split — dropped data is
    visible accounting, never silent.

    Row-local split assignment (zero-shuffle at any scale) + one tiny
    (split × type) summary aggregate; day arithmetic stays on
    date_trunc'd timestamps so both engines bucket identically."""
    if embargo_days < 0:
        raise ValueError("temporal_split: embargo_days must be >= 0")
    cut = F.to_timestamp(F.lit(train_end))
    test_start = cut + F.expr(f"interval {embargo_days} days")
    split = (
        F.when(F.col("ts") < cut, "train")
        .when(F.col("ts") < test_start, "embargo")
        .otherwise("test")
    )
    day = F.date_trunc("day", F.col("ts"))
    return (
        events.select(split.alias("split"), "event_type", "user_id", day.alias("day"))
        .groupBy("split", "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
            F.min("day").alias("first_day"),
            F.max("day").alias("last_day"),
        )
        .orderBy("split", "event_type")
    )


def group_kfold(events: DataFrame, k: int = 5) -> DataFrame:
    """Deterministic GROUP-aware k-fold assignment over users
    (`sample_group_kfold`) — cross-validation folds where no user's
    rows straddle folds (per-entity leakage control, sklearn's
    GroupKFold with a portable hash instead of stateful chunking).

    fold(user) = md5(user_id) 16-bit prefix mod k — row-local, pure
    function of the id (stable under reruns, re-partitioning, and data
    arrival order), engine-portable (md5 is md5 everywhere; hash()/
    rand(seed) are not).  Zero-shuffle assignment + one tiny per-fold
    summary; the distinct-user count per fold is the balance audit."""
    if k < 2:
        raise ValueError("group_kfold: k must be >= 2")
    fold = (_md5_bucket("user_id", 2**16) % k).alias("fold")
    return (
        events.select(fold, "user_id", "event_id")
        .groupBy("fold")
        .agg(
            F.countDistinct("user_id").alias("n_users"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .orderBy("fold")
    )


def undersample_balance(documents: DataFrame) -> DataFrame:
    """Class-balancing UNDERSAMPLER summary (`sample_undersample_balance`):
    cap every language at the size of the SMALLEST language class,
    drawing deterministically by md5 order — the classifier-training
    rebalance that throws away majority-class excess instead of
    duplicating minority rows (its oversampling sibling is
    ``epoch_repeat``).

    The per-class keep list is the md5-ranked prefix (stable under
    reruns and arrival order, WindowGroupLimit prunes the rank
    map-side); the min-class size is a 1-row broadcast aggregate.
    Output is the per-class accounting: kept counts are exactly equal
    across classes by construction."""
    counts = documents.groupBy("lang").agg(F.count(F.lit(1)).alias("__n"))
    floor_n = counts.agg(F.min("__n").alias("__m"))
    w = Window.partitionBy("lang").orderBy(
        F.md5(F.col("doc_id").cast("string")).asc(), F.col("doc_id").asc()
    )
    ranked = documents.select(
        "lang", "n_chars", F.row_number().over(w).alias("__rn")
    ).crossJoin(F.broadcast(floor_n))
    return (
        ranked.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum((F.col("__rn") <= F.col("__m")).cast("long")).alias("n_kept"),
            F.sum((F.col("__rn") > F.col("__m")).cast("long")).alias("n_dropped"),
            F.sum(
                F.when(F.col("__rn") <= F.col("__m"), F.col("n_chars"))
            ).alias("kept_chars"),
        )
        .orderBy("lang")
    )


def curriculum_order(
    documents: DataFrame, bands: tuple[int, ...] = (500, 1000, 2000, 4000)
) -> DataFrame:
    """Curriculum training order (`sample_curriculum_order`): documents
    are banded by length (short-and-easy first is the standard
    curriculum heuristic; the band edges are explicit literals) and the
    schedule round-robins across bands — position
    (band_rank − 1)·n_bands + band — so early training sees every
    difficulty tier while still leading with the easy mass.  Within a
    band the order is the md5 line (the sampling-family convention:
    deterministic, reshuffle-free, engine-portable).

    Positions are a deterministic TOTAL ORDER, not a dense sequence —
    once a band is exhausted its residues go unused (documented, not a
    bug: the consumer sorts by schedule_pos).

    Scale: band assignment is row-local; the within-band rank rides
    :func:`~parcial_bigdata_spark.operators.scale.distributed_rank`
    (bands are few and huge — the exact mega-group case a partitioned
    window serializes)."""
    from parcial_bigdata_spark.operators.scale import distributed_rank

    band = F.lit(len(bands))
    for i, edge in reversed(list(enumerate(bands))):
        band = F.when(F.col("n_chars") < edge, F.lit(i)).otherwise(band)
    hashed = documents.select(
        "doc_id",
        "n_chars",
        band.cast("int").alias("band"),
        F.conv(
            F.substring(F.md5(F.col("doc_id").cast("string")), 1, 15), 16, 10
        )
        .cast("bigint")
        .alias("__h"),
    )
    ranked = distributed_rank(
        hashed, "__h", "doc_id", part_cols=["band"], out_col="__r"
    )
    n_bands = len(bands) + 1
    return ranked.select(
        "doc_id",
        "band",
        F.col("__r").alias("band_rank"),
        ((F.col("__r") - 1) * n_bands + F.col("band")).alias("schedule_pos"),
    ).orderBy("schedule_pos")


def importance_weights(documents: DataFrame) -> DataFrame:
    """Per-source importance weights that reweight the corpus to the
    UNIFORM source mixture (`sample_importance_weights`) — the standard
    fix when one crawl dominates a training mix: weight_s =
    target_share / actual_share, so example-level loss scaling (or
    weighted sampling) equalizes source influence without moving data.

    Exact: shares and weights are single divisions of exact counts —
    weight_s = n_total / (n_sources · n_s) — computed in ONE fixed IEEE
    sequence from the two integers, then the shared round-6.  Scale:
    one map-side count per source; the 1-row total broadcasts."""
    from parcial_bigdata_spark.functions.money import ratio_round

    counts = documents.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs")
    )
    totals = counts.agg(
        F.sum("n_docs").alias("__total"),
        F.count(F.lit(1)).alias("__k"),
    )
    n = F.col("n_docs").cast("double")
    tot = F.col("__total").cast("double")
    k = F.col("__k").cast("double")
    return (
        counts.crossJoin(F.broadcast(totals))
        .select(
            "source",
            "n_docs",
            ratio_round(n / tot, 6).alias("actual_share"),
            ratio_round(F.lit(1.0) / k, 6).alias("target_share"),
            ratio_round(tot / (k * n), 6).alias("weight"),
        )
        .orderBy("source")
    )
