"""Deterministic hash sampling (SURVEY.md §2B D10 as a real operator).

`rand(seed)`-based sampling is partitioning-dependent in Spark (the
seed is per-partition), so re-runs with different splits sample
different rows — useless for reproducible corpus construction.
Hash-gating on a KEY is partitioning-invariant, engine-portable, and
stable under re-runs, appends, and backfills: a row's membership
depends only on its key. The hash bucket is the first byte of
md5(key), derived with the same instr-over-hex-digits arithmetic the
SimHash template uses — the identical expression runs on Spark SQL and
on the DuckDB oracle, so sampling is exactly verifiable.

Stratified sampling falls out for free: a uniform hash gate keeps
≈ rate of EVERY stratum (hash is independent of any stratum column),
with no per-stratum state, shuffle, or two-pass sizing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def hash_bucket_sql(key_expr: str) -> str:
    """Portable SQL for the 0..255 bucket of md5(key_expr) — identical
    text works in Spark SQL and DuckDB (both have md5/substr/instr)."""
    d1 = f"(instr('0123456789abcdef', substr(md5({key_expr}), 1, 1)) - 1)"
    d2 = f"(instr('0123456789abcdef', substr(md5({key_expr}), 2, 1)) - 1)"
    return f"({d1} * 16 + {d2})"


def hash_sample(df: DataFrame, key_col: str, keep_of_256: int) -> DataFrame:
    """Keep rows whose md5-bucket < keep_of_256 (rate ≈ keep_of_256/256).

    Deterministic per key: the same key is always in or always out —
    which also means sampling is CONSISTENT across tables sharing the
    key (sample orders and lineitem at the same rate and the sampled
    lineitem rows still join their sampled orders).
    """
    bucket = F.expr(hash_bucket_sql(f"CAST({key_col} AS STRING)"))
    return df.filter(bucket < F.lit(int(keep_of_256)))


def hex_u32_sql(hex_expr: str) -> str:
    """Portable SQL for the u32 spelled by the FIRST 8 digits of an
    existing lowercase-hex string expression — same text runs on Spark
    SQL and DuckDB. Building block for hash_u32_sql and for consumers
    that already hold an md5 digest column (KMV sketch normalization)."""
    # BIGINT accumulator: 8 hex digits exceed INT32 and Spark's ANSI
    # mode (default-on in Spark 4) faults on overflow instead of wrapping
    acc = "CAST(0 AS BIGINT)"
    for i in range(1, 9):
        d = f"(instr('0123456789abcdef', substr({hex_expr}, {i}, 1)) - 1)"
        acc = f"({acc} * 16 + {d})"
    return acc


def hash_u32_sql(key_expr: str) -> str:
    """Portable SQL for a 32-bit uniform hash of key_expr (first 8 hex
    digits of md5) — same text runs on Spark SQL and DuckDB."""
    return hex_u32_sql(f"md5({key_expr})")


def weighted_sample(df: DataFrame, key_col: str, weight_col: str,
                    k: int) -> DataFrame:
    """Weighted-without-replacement sample of k rows: sequential Poisson
    sampling (Ohlsson) — rank by u/w ascending, keep the k smallest.

    Classic A-ES uses u^(1/w); pow is libm-specific and last-ulp
    divergent across engines, while the u/w formulation is an
    established approximate-πps estimator using ONLY IEEE-exact
    division — the sampled set is bit-reproducible and cross-engine
    verifiable. u is the 32-bit md5 fraction of the key (never 0), so
    membership is partitioning-invariant and stable under re-runs, like
    hash_sample. Weights must be > 0.

    Plans as TakeOrderedAndProject: each partition keeps a k-heap of
    (key, tiebreak) — no global sort, linear scan at any scale.
    """
    u = (
        (F.expr(hash_u32_sql(f"CAST({key_col} AS STRING)")) + 1).cast("double")
        / F.lit(4294967297.0)
    )
    skey = u / F.col(weight_col)
    return (
        df.withColumn("sample_key", skey)
        .orderBy("sample_key", key_col)
        .limit(k)
    )


def per_source_cap(documents: DataFrame, n_per_source: int = 10,
                   n_salts: int = 64) -> DataFrame:
    """Per-domain quota: keep at most `n_per_source` docs per source,
    best-first (longest n_chars, ties by doc_id) — the per-domain cap
    every web-corpus recipe applies so no single domain dominates
    training data (C4/RefinedWeb-style).

    Skew is the whole problem here: a hot domain can hold a large
    fraction of the corpus, and a single window over source would send
    all of it to one reducer. TWO-PHASE top-k instead: phase 1 ranks
    within (source, doc_id%n_salts) sub-partitions — the hot domain's
    rows spread over n_salts reducers and each sub-partition keeps at
    most n_per_source rows; phase 2 ranks the <= n_salts*n_per_source
    survivors per source. Global top-N per source is always a subset of
    the union of per-salt top-Ns, so the result is EXACTLY the naive
    single-window answer (the oracle runs the naive form).
    """
    from pyspark.sql import Window

    order = [F.desc("n_chars"), F.asc("doc_id")]
    phase1 = Window.partitionBy(
        "source", F.pmod(F.col("doc_id"), F.lit(n_salts))
    ).orderBy(*order)
    survivors = (
        documents.select("doc_id", "source", "n_chars")
        .withColumn("__rn", F.row_number().over(phase1))
        .filter(F.col("__rn") <= n_per_source)
        .drop("__rn")
    )
    phase2 = Window.partitionBy("source").orderBy(*order)
    return (
        survivors.withColumn("rank", F.row_number().over(phase2))
        .filter(F.col("rank") <= n_per_source)
    )


def domain_mixture_rates(df: DataFrame, domain_col: str = "source",
                         tau: float = 0.5,
                         target_rows: int = 1000) -> DataFrame:
    """Temperature-based domain mixing: per-domain sampling rates
    q_i ∝ n_i^τ, the recipe multilingual/web-corpus pipelines use to
    keep head domains from drowning the tail (τ=1 is proportional,
    τ=0 is uniform; τ≈0.3–0.7 is the usual training mixture).

    rate_i = min(1, target_rows · q_i / n_i) — the per-domain keep
    probability that realizes the tempered mixture in expectation,
    capped so no domain is oversampled. Rates are rounded to 6 decimals
    (hash-canonicalization + the downstream gate compares the SAME
    rounded value in both engines).

    τ=0.5 is computed as sqrt, which IEEE requires correctly rounded —
    the whole computation is then bit-identical across engines (pow is
    libm-specific, sqrt is not). One tiny groupBy + a broadcast of the
    per-domain table: nothing here scales with corpus size except the
    initial count.
    """
    w = F.sqrt(F.col("n_docs").cast("double")) if tau == 0.5 else (
        F.pow(F.col("n_docs").cast("double"), F.lit(float(tau)))
    )
    counts = df.groupBy(domain_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_docs")
    ).withColumn("__w", w)
    tot = counts.agg(F.sum("__w").alias("__tw"))
    rate = F.round(
        F.least(
            F.lit(1.0),
            F.lit(float(target_rows)) * (F.col("__w") / F.col("__tw"))
            / F.col("n_docs").cast("double"),
        ),
        6,
    )
    return (
        counts.crossJoin(F.broadcast(tot))
        .select(domain_col, "n_docs", rate.alias("rate"))
    )


def domain_mixture_sample(df: DataFrame, domain_col: str = "source",
                          key_col: str = "doc_id", tau: float = 0.5,
                          target_rows: int = 1000) -> DataFrame:
    """Materialize the tempered mixture: md5-gate each row at its
    domain's rate (hash_u32(key)/2^32 < rate). Membership is a pure
    function of (key, rate) — partitioning-invariant, stable under
    re-runs/appends, and exactly verifiable cross-engine because both
    the rate (rounded) and the hash (md5 template) are engine-identical.
    The rates table is broadcast; the corpus is never shuffled."""
    rates = domain_mixture_rates(df, domain_col, tau, target_rows)
    u = F.expr(hash_u32_sql(f"CAST({key_col} AS STRING)")).cast("double") / F.lit(
        4294967296.0
    )
    return (
        df.join(F.broadcast(rates), domain_col)
        .filter(u < F.col("rate"))
        .select(key_col, domain_col, "rate")
    )


def epoch_mixture_rates(df: DataFrame, domain_col: str = "source",
                        tau: float = 0.5,
                        target_rows: int = 1000) -> DataFrame:
    """`domain_mixture_rates` WITHOUT the min(1,·) cap: per-domain
    EPOCH counts for a training mixture that may up-sample.

    Real training mixtures repeat scarce high-value domains (the
    Llama/Gopher mixture tables list per-source epochs like 2.45 or
    3.0, not keep-rates) — a rate capped at 1 can only down-sample.
    epochs_i = target_rows · q_i / n_i with q_i ∝ n_i^τ; values above
    1 mean every doc appears ⌊e⌋ times plus once more with probability
    frac(e). Same determinism contract as the rate variant: sqrt for
    τ=0.5 (correctly rounded per IEEE, engine-identical) and the final
    epochs rounded to 6 decimals so both engines gate on the SAME
    number. Only the per-domain count scales with the corpus.
    """
    w = F.sqrt(F.col("n_docs").cast("double")) if tau == 0.5 else (
        F.pow(F.col("n_docs").cast("double"), F.lit(float(tau)))
    )
    counts = df.groupBy(domain_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_docs")
    ).withColumn("__w", w)
    tot = counts.agg(F.sum("__w").alias("__tw"))
    epochs = F.round(
        F.lit(float(target_rows)) * (F.col("__w") / F.col("__tw"))
        / F.col("n_docs").cast("double"),
        6,
    )
    return (
        counts.crossJoin(F.broadcast(tot))
        .select(domain_col, "n_docs", epochs.alias("epochs"))
    )


def epoch_mixture_sample(df: DataFrame, domain_col: str = "source",
                         key_col: str = "doc_id", tau: float = 0.5,
                         target_rows: int = 1000) -> DataFrame:
    """Materialize an epoch-aware mixture: each row is REPLICATED
    ⌊epochs⌋ times, plus one more copy when its md5 gate lands under
    frac(epochs) — deterministic multi-epoch up/down-sampling in one
    pass (copy indices let the downstream shuffle interleave epochs).

    n_copies is a pure function of (key, epochs): stable under re-runs
    and appends, exactly reproducible cross-engine (rounded epochs,
    md5-template hash, integer floor). The ':epoch' salt decorrelates
    this gate from the plain mixture/sample gates on the same key.
    Scale shape: broadcast the per-domain epochs table, explode by a
    per-row integer — no shuffle of the corpus at all; output size is
    target_rows in expectation.
    """
    rates = epoch_mixture_rates(df, domain_col, tau, target_rows)
    u = F.expr(
        hash_u32_sql(f"CAST({key_col} AS STRING) || ':epoch'")
    ).cast("double") / F.lit(4294967296.0)
    base = F.floor(F.col("epochs")).cast("long")
    n_copies = (base + (u < (F.col("epochs") - base)).cast("long")).alias(
        "n_copies"
    )
    return (
        df.join(F.broadcast(rates), domain_col)
        .select(key_col, domain_col, "epochs", n_copies)
        .filter(F.col("n_copies") > 0)
        .select(
            key_col, domain_col, "epochs",
            F.explode(
                F.sequence(F.lit(1).cast("long"), F.col("n_copies"))
            ).alias("copy"),
        )
    )


def train_val_test_split(df: DataFrame, key_col: str,
                         train_of_256: int = 204,
                         val_of_256: int = 230) -> DataFrame:
    """Deterministic 3-way split from the md5 bucket of the row key:
    bucket < train_of_256 → train, < val_of_256 → val, else test
    (defaults ≈ 80/10/10).

    Same invariances as hash_sample: membership is a pure function of
    the key, so the split is stable under re-runs, appends, backfills,
    and repartitioning, and CONSISTENT across tables sharing the key —
    a doc's chunks land in the doc's split, never across the
    train/test boundary (leakage-safe by construction). Zero shuffle:
    the split is a projected column, not a partitioning.
    """
    bucket = F.expr(hash_bucket_sql(f"CAST({key_col} AS STRING)"))
    split = (
        F.when(bucket < train_of_256, F.lit("train"))
        .when(bucket < val_of_256, F.lit("val"))
        .otherwise(F.lit("test"))
    )
    return df.withColumn("split", split)


def corpus_shuffle(df: DataFrame, key_col: str, n_shards: int = 64,
                   salt: str = "epoch0") -> DataFrame:
    """Deterministic global shuffle for training-order randomization.

    Training runs need the corpus in a random-but-REPRODUCIBLE order
    (re-runs, resumed jobs, and multi-epoch schedules must agree).
    `ORDER BY rand()` is neither (per-partition seeds), and a true
    global sort by a random key is a range exchange whose sampled
    boundaries also aren't run-stable. Instead both levels are pure
    functions of the key: shard = md5-hash(salt ∥ key) mod n_shards,
    position = rank of the full 32-bit hash within the shard. Vary
    `salt` per epoch for a fresh permutation.

    One hash-partition exchange + a per-shard sort (each task sorts
    ~corpus/n_shards rows — raise n_shards with corpus size); the
    shard-major, position-minor order IS the global permutation, so a
    writer emits one file per shard and readers stream files in name
    order. No global sort, no sampled boundaries, bit-stable anywhere.
    """
    from pyspark.sql import Window as W

    # salt is a caller-chosen free string interpolated into a SQL
    # literal — double any single quotes so "epoch's" parses.
    esc = salt.replace("'", "''")
    h = F.expr(hash_u32_sql(f"concat('{esc}', ':', CAST({key_col} AS STRING))"))
    keyed = df.withColumn("__h", h).withColumn(
        "shard", F.pmod(F.col("__h"), F.lit(n_shards)).cast("int")
    )
    pos = F.row_number().over(
        W.partitionBy("shard").orderBy(F.col("__h"), F.col(key_col))
    )
    return keyed.withColumn("pos", pos).drop("__h")


def curriculum_order(df: DataFrame, quality_col: str = "n_chars",
                     key_col: str = "doc_id", n_shards: int = 16,
                     salt: str = "curriculum0") -> DataFrame:
    """Curriculum ordering: quality-descending bands, deterministic
    shuffle within each band.

    Curriculum-style training schedules feed the highest-quality slice
    first; a naive global ORDER BY quality would both funnel the corpus
    through one range sort AND destroy intra-band randomness. Instead:
    band 1..4 by EXACT quartiles of `quality_col` (band 1 = top
    quartile, trained first — thresholds are one broadcast aggregate
    row, the perplexity_stratified_sample pattern), then the
    corpus_shuffle discipline inside each band (md5 shard + in-shard
    position, both pure functions of the key). Global training order =
    (band, shard, pos): a writer emits one file per (band, shard) and
    readers stream band-major — no global sort, bit-stable anywhere,
    fresh permutation per `salt`.

    Output: (key, quality, band, shard, pos) for every row.
    """
    from pyspark.sql import Window as W

    qs = df.agg(
        F.expr(
            f"percentile({quality_col}, array(0.25D, 0.5D, 0.75D))"
        ).alias("__qs")
    ).select(
        F.col("__qs")[0].alias("__q1"),
        F.col("__qs")[1].alias("__q2"),
        F.col("__qs")[2].alias("__q3"),
    )
    band = (
        F.when(F.col(quality_col) >= F.col("__q3"), F.lit(1))
        .when(F.col(quality_col) >= F.col("__q2"), F.lit(2))
        .when(F.col(quality_col) >= F.col("__q1"), F.lit(3))
        .otherwise(F.lit(4))
    )
    esc = salt.replace("'", "''")
    h = F.expr(
        hash_u32_sql(f"concat('{esc}', ':', CAST({key_col} AS STRING))")
    )
    keyed = (
        df.crossJoin(F.broadcast(qs))
        .select(
            key_col, quality_col,
            band.cast("int").alias("band"), h.alias("__h"),
        )
        .withColumn(
            "shard", F.pmod(F.col("__h"), F.lit(n_shards)).cast("long")
        )
    )
    pos = F.row_number().over(
        W.partitionBy("band", "shard").orderBy(F.col("__h"), F.col(key_col))
    )
    return keyed.withColumn("pos", pos.cast("long")).drop("__h")


def corpus_shuffle_write(df: DataFrame, path: str, key_col: str,
                         n_shards: int = 64, salt: str = "epoch0") -> None:
    """Materialize the permutation: one file per shard, rows in
    position order — readers concatenate files by shard id to stream
    the corpus in shuffled order."""
    out = corpus_shuffle(df, key_col, n_shards, salt)
    (
        out.repartition(n_shards, F.col("shard"))
        .sortWithinPartitions("shard", "pos")
        .write.mode("overwrite")
        .partitionBy("shard")
        .parquet(path)
    )


def perplexity_stratified_sample(
    scored: DataFrame,
    nll_col: str = "nll",
    key_col: str = "doc_id",
    keep_of_256: tuple[int, int, int] = (64, 192, 64),
) -> DataFrame:
    """CCNet-style perplexity-stratified sampling: split the scored
    corpus into head/middle/tail terciles of LM negative log-likelihood
    and hash-gate each band at its own rate (the classic mix keeps the
    middle band hardest — head is boilerplate-like, tail is noise-like).

    Thresholds are ONE exact-percentile aggregate row broadcast back
    (the rfm_scores pattern — a global ntile would funnel the corpus
    through one sort); band membership is a codegen'd CASE; the gate is
    the md5-bucket of the key — partitioning-invariant, re-run-stable,
    and exactly mirrored by the oracle. Rows with NULL nll (docs too
    short to score) land in 'unscored' and are kept at the tail rate.

    Emits every row with (band, kept) so callers can audit rates;
    filtering kept IS the sample.
    """
    from aws_data_pipeline_ads_spark.operators.cache import persist_tracked

    # scored feeds BOTH the threshold aggregate and the banded output —
    # Spark materializes no shared subplans, so without the cache the
    # caller's scoring pipeline (e.g. the unigram LM) runs twice.
    scored = persist_tracked(scored)
    qs = scored.agg(
        F.expr(
            f"percentile({nll_col}, array(1.0D/3.0D, 2.0D/3.0D))"
        ).alias("__qs")
    ).select(
        F.col("__qs")[0].alias("__t1"), F.col("__qs")[1].alias("__t2")
    )
    bucket = F.expr(hash_bucket_sql(f"CAST({key_col} AS STRING)"))
    band = (
        F.when(F.col(nll_col).isNull(), F.lit("unscored"))
        .when(F.col(nll_col) < F.col("__t1"), F.lit("head"))
        .when(F.col(nll_col) < F.col("__t2"), F.lit("middle"))
        .otherwise(F.lit("tail"))
    )
    head, mid, tail = (int(x) for x in keep_of_256)
    rate = (
        F.when(F.col("band") == "head", F.lit(head))
        .when(F.col("band") == "middle", F.lit(mid))
        .otherwise(F.lit(tail))
    )
    return (
        scored.crossJoin(F.broadcast(qs))
        .withColumn("band", band)
        .withColumn("kept", bucket < rate)
        .drop("__t1", "__t2")
    )
