"""Deterministic, content-addressed sampling and dataset splits.

Training pipelines need samples and train/val/test splits that are
(a) reproducible across runs, engines, and cluster sizes, (b) stable
under data re-partitioning, and (c) consistent per entity (the same
document always lands in the same split, so no train/test leakage when
the corpus is re-processed). ``rand(seed)`` gives none of these — it
depends on partition layout. Hashing the entity key does: bucket =
first 8 hex chars of md5(key) as an int, mod n. md5 is identical in
every engine, so the DuckDB oracle reproduces the exact same rows.

At 100 TB this is a stateless per-row filter — no shuffle, pushes
nothing, scales with scan bandwidth.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def hash_bucket(key: Column, n: int = 100) -> Column:
    """Stable bucket in [0, n): md5-based, engine-independent."""
    from tada_spark.functions.text import md5_hash32

    return F.pmod(md5_hash32(key.cast("string")), n)


def deterministic_sample(df: DataFrame, key: str, pct: int, *, n: int = 100) -> DataFrame:
    """Keep ~pct% of rows, chosen by key content — same rows every run,
    every engine, every partition count."""
    return df.filter(hash_bucket(F.col(key), n) < pct)


def assign_split(
    df: DataFrame,
    key: str,
    *,
    train_pct: int = 80,
    val_pct: int = 10,
    out: str = "split",
) -> DataFrame:
    """Add a train/val/test split column keyed on content hash. An
    entity keeps its split forever — append-only corpora never leak
    val/test rows into train."""
    b = hash_bucket(F.col(key), 100)
    return df.withColumn(
        out,
        F.when(F.col(key).isNull(), F.lit(None).cast("string"))  # null key ⇒ null split
        .when(b < train_pct, F.lit("train"))
        .when(b < train_pct + val_pct, F.lit("val"))
        .otherwise(F.lit("test")),
    )


def stratified_sample(
    df: DataFrame, key: str, strata_col: str, rates: dict[str, int], *, n: int = 100
) -> DataFrame:
    """Per-stratum deterministic sampling: rates maps stratum value →
    percent kept (unlisted strata drop). The class-rebalancing primitive
    (downsample dominant languages/sources) with the same
    content-addressed stability as deterministic_sample."""
    b = hash_bucket(F.col(key), n)
    rate = F.coalesce(
        *[F.when(F.col(strata_col) == F.lit(s), F.lit(p)) for s, p in rates.items()],
        F.lit(0),
    )
    return df.filter(b < rate)


def sequence_pack(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    token_count_col: str = "n_tokens",
    shard_col: str = "source",
    seq_len: int = 2048,
) -> DataFrame:
    """Contiguous sequence packing for training-batch assembly: within
    each shard, documents are laid out in id order as one token stream
    and each doc is assigned the fixed-length sequence its FIRST token
    lands in (bin = start_offset // seq_len).

    Packing is inherently sequential, so the distributed contract is
    shard-local: one shuffle on ``shard_col`` (the corpus's natural
    sharding — source, crawl snapshot, path prefix), a running-sum
    window WITHIN the shard, never a global single-partition window.
    Deterministic: same inputs → same layout on any cluster. Output:
    (id, shard, n_tokens, start_offset, bin) — a downstream writer
    groups by (shard, bin) to emit packed sequences.
    """
    from pyspark.sql.window import Window

    w = (
        Window.partitionBy(shard_col)
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    start = (F.sum(token_count_col).over(w) - F.col(token_count_col)).alias("start_offset")
    return df.select(
        id_col,
        shard_col,
        F.col(token_count_col),
        start,
    ).withColumn(
        # integer-exact floor division: (a - a%s)/s divides an exact
        # multiple, so the double quotient is exact — plain a/s trunc
        # could land on the wrong side of an integer boundary at large
        # offsets, where DuckDB's // never does
        "bin",
        (
            (F.col("start_offset") - F.pmod(F.col("start_offset"), F.lit(seq_len)))
            / F.lit(seq_len)
        ).cast("long"),
    )


def domain_mix_weights(
    df: DataFrame, domain_col: str, *, temperature_sqrt: bool = True
) -> DataFrame:
    """Temperature-based domain mixing weights — the multilingual /
    multi-domain sampling knob (alpha-smoothed sampling a la mC4/XLM-R):
    raw proportional sampling starves low-resource domains, so weights
    are computed on n^alpha instead of n. alpha = 0.5 here (sqrt), the
    one exponent whose float path is EXACT cross-engine: IEEE sqrt is
    correctly rounded, the result is quantized to integer 1e-6 units
    (floor(x*1e6 + 0.5)), and the normalizing sum is integer — no
    transcendental pow(), no order-dependent double accumulation, so
    the oracle hash-matches bit-for-bit.

    Output per domain: n_docs, weight (share of the alpha-smoothed
    mass), boost (weight / raw share — >1 means the domain is
    up-sampled). 100 TB shape: one hash-agg shuffle to k domain rows,
    then k-row arithmetic with two 1-row scalar broadcasts.
    """
    from tada_spark.plans.semantics import round_det

    counts = df.groupBy(F.col(domain_col).alias("domain")).agg(
        F.count("*").alias("n_docs")
    )
    # integer-quantized sqrt(n): exact on both engines
    q = F.floor(F.sqrt(F.col("n_docs")) * F.lit(1e6) + F.lit(0.5)).cast("long")
    quant = counts.select("domain", "n_docs", q.alias("q"))
    totals = quant.agg(
        F.sum("q").alias("q_total"), F.sum("n_docs").alias("n_total")
    )
    return (
        quant.crossJoin(F.broadcast(totals))
        .select(
            "domain",
            "n_docs",
            round_det(F.col("q") / F.col("q_total"), 6).alias("weight"),
            round_det(
                (F.col("q") / F.col("q_total")) / (F.col("n_docs") / F.col("n_total")), 6
            ).alias("boost"),
        )
    )


def domain_cap(
    df: DataFrame, domain_col: str, key: str, cap: int
) -> DataFrame:
    """Hard per-domain cap — keep at most ``cap`` rows per domain,
    chosen by content-addressed hash order (md5 of the entity key), the
    companion primitive to temperature weighting: weights rebalance the
    sampler, the cap bounds any single domain's absolute volume (the
    anti-boilerplate guard for over-crawled domains). Hash order makes
    the kept set reproducible across runs, engines and partition
    layouts — never rand() or arrival order.

    100 TB shape: one shuffle on the domain key; the per-domain
    row_number window is the standard top-N-per-group plan (per-
    partition heaps under AQE). Heavily skewed domains (one domain =
    half the corpus) should pre-filter with a percentage gate
    (stratified_sample) before the exact cap.
    """
    from pyspark.sql.window import Window

    from tada_spark.functions.text import md5_hash32

    # nulls-LAST on both sort keys: a NULL entity key hashes to NULL,
    # which Spark's bare asc() ranks FIRST (always kept at the expense
    # of a real row) while SQL ASC ranks it last — pin the SQL order
    w = Window.partitionBy(domain_col).orderBy(
        md5_hash32(F.col(key).cast("string")).asc_nulls_last(),
        F.col(key).asc_nulls_last(),
    )
    return (
        df.withColumn("__rn__", F.row_number().over(w))
        .filter(F.col("__rn__") <= cap)
        .drop("__rn__")
    )


def temperature_resample(
    df: DataFrame,
    domain_col: str,
    key: str,
    target_total: int,
) -> DataFrame:
    """The ACTING half of temperature mixing (domain_mix_weights is the
    report): materialize a ``target_total``-row corpus whose per-domain
    quotas follow the alpha=0.5 smoothed weights, rows chosen per
    domain by content-addressed md5 order (reproducible across runs,
    engines and partition layouts — the domain_cap discipline).

    Quotas stay integer end-to-end: q = floor(sqrt(n)*1e6+0.5),
    quota_d = (q_d · target_total) div q_total — integral division on a
    DECIMAL(38,0) product (Int128: a 1e9-row domain gives q ≈ 3.2e10,
    and q·target_total would overflow a long for targets ≥ ~3e8; the
    decimal product cannot, and DIV is exact — no double division
    anywhere, so engines agree on every quota; the oracle mirrors with
    HUGEINT `//`). A domain with fewer rows than its quota just yields
    what it has; flooring keeps Σ quotas ≤ target_total.

    100 TB shape: one hash-agg to k domain rows, the k-row quota table
    broadcasts back onto the corpus, and the per-domain selection is
    the standard top-N-per-group window on the domain shuffle.
    """
    from pyspark.sql.window import Window

    from tada_spark.functions.text import md5_hash32

    counts = df.groupBy(F.col(domain_col).alias("__dom__")).agg(F.count("*").alias("n_docs"))
    q = F.floor(F.sqrt(F.col("n_docs")) * F.lit(1e6) + F.lit(0.5)).cast("long")
    quant = counts.select("__dom__", q.alias("q"))
    totals = quant.agg(F.sum("q").alias("q_total"))
    quotas = (
        quant.crossJoin(F.broadcast(totals))
        .withColumn(
            "quota",
            F.expr(
                f"CAST((CAST(q AS DECIMAL(38,0)) * CAST({int(target_total)} AS DECIMAL(38,0)))"
                " DIV q_total AS BIGINT)"
            ),
        )
        .select("__dom__", "quota")
    )
    w = Window.partitionBy(domain_col).orderBy(
        md5_hash32(F.col(key).cast("string")).asc_nulls_last(),
        F.col(key).asc_nulls_last(),
    )
    return (
        df.withColumn("__rn__", F.row_number().over(w))
        .join(F.broadcast(quotas), F.col(domain_col) == F.col("__dom__"))
        .filter(F.col("__rn__") <= F.col("quota"))
        .drop("__dom__", "__rn__", "quota")
    )


def _aes_priority_e6(key: str, weight: Column) -> Column:
    """The Efraimidis-Spirakis priority both weighted samplers draw:
    E_i = -ln(u_i)/w_i with a content-addressed md5 uniform ("ws#" salt,
    1048576/1048577 scaling) and det_ln, e6 floor-quantized. ONE
    definition — the global and per-group samplers previously carried
    verbatim copies, so a fix to one could silently miss the other."""
    from tada_spark.functions.text import md5_hash32
    from tada_spark.plans.semantics import det_ln

    u = (
        F.pmod(
            md5_hash32(F.concat(F.lit("ws#"), F.col(key).cast("string"))), F.lit(1048576)
        )
        + F.lit(1)
    ).cast("double") / F.lit(1048577.0)
    pri = (F.lit(0.0) - det_ln(u)) / weight.cast("double")
    return F.floor(pri * F.lit(1e6) + F.lit(0.5)).cast("long")


def weighted_sample(
    df: DataFrame,
    weight: Column,
    k: int,
    *,
    key: str = "doc_id",
    out: str = "priority_e6",
) -> DataFrame:
    """Weighted sampling WITHOUT replacement via exponential clocks
    (Efraimidis-Spirakis A-ES): each row draws E_i = -ln(u_i)/w_i —
    an Exp(w_i) variate — and the k SMALLEST win; that is exactly a
    weighted draw without replacement. The uniform u_i is
    content-addressed (md5 of the key, the repo's reproducible-sampling
    discipline — never rand()), and the ln is det_ln
    (plans/semantics.py), so priorities are bit-identical across
    engines, runs and partition layouts; the e6-quantized priority is
    emitted for oracle comparison.

    100 TB shape: priorities are a narrow scan-speed map; the k winners
    come from TakeOrderedAndProject (per-partition heaps + k-row merge),
    never a global sort. Weights must be > 0 (caller contract). Rows
    with a NULL key are dropped up front: a null key hashes to a NULL
    priority, which Spark's bare asc() would rank FIRST (hijacking the
    sample) while SQL engines rank it last — and sampling without a
    stable identity is meaningless anyway.
    """
    df = df.filter(F.col(key).isNotNull())
    return (
        df.withColumn(out, _aes_priority_e6(key, weight))
        # NULLS LAST, matching the DuckDB oracle: a NULL weight gives a
        # NULL priority, and Spark's bare asc() (NULLS FIRST) would put
        # that row in the k winners every run
        .orderBy(F.col(out).asc_nulls_last(), F.col(key).asc())
        .limit(k)
    )


def weighted_sample_per_group(
    df: DataFrame,
    group_col: str,
    weight: Column,
    k: int,
    *,
    key: str = "doc_id",
    out: str = "priority_e6",
) -> DataFrame:
    """Stratified weighted sampling without replacement: k rows PER
    GROUP, drawn with probability ∝ weight inside each group — the
    same exponential-clock priorities as weighted_sample (A-ES,
    content-addressed md5 uniforms + det_ln, bit-deterministic), with
    the global top-k replaced by a per-group row_number window. The
    per-domain counterpart domain_cap picks by plain hash order; this
    one respects weights.

    100 TB shape: one shuffle on the group key; the per-group selection
    is the standard top-N-per-group window (per-partition heaps under
    AQE). NULL keys are dropped (the weighted_sample contract).
    """
    from pyspark.sql.window import Window

    df = df.filter(F.col(key).isNotNull())
    w = Window.partitionBy(group_col).orderBy(
        F.col(out).asc_nulls_last(), F.col(key).asc()
    )
    return (
        df.withColumn(out, _aes_priority_e6(key, weight))
        .withColumn("__rn__", F.row_number().over(w))
        .filter(F.col("__rn__") <= k)
        .drop("__rn__")
    )


def length_bucket_batches(
    df: DataFrame,
    *,
    batch_size: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
    shard_col: str = "source",
) -> DataFrame:
    """Length-bucketed training-batch assembly — the padding-efficiency
    step beside sequence_pack: docs bucket by token-count magnitude
    (integer bit_length, the det_ln range-reduction trick — no log),
    order deterministically by content hash inside each (shard,
    bucket), and group into fixed-size batches. Emits per-batch stats:
    doc count, token total, the batch's max length, and the padding
    waste fraction (n·max − Σtokens)/(n·max) a pad-to-longest collator
    would spend, floor-e6-quantized.

    Exactness: token counts, buckets and batch numbering are pure
    integer arithmetic on md5-ordered rows; the waste fraction is one
    double division of exact longs — identical IEEE tree both engines.
    The bucket is LENGTH(BIN(tokens)) on both engines; blank/NULL docs
    count zero tokens and BIN(0) = '0' puts them in bucket 1 (pinned,
    oracle-mirrored).

    100 TB shape: batch numbering is (shard, bucket)-local — the data-
    parallel assembly a sharded loader runs, so the row_number windows
    partition on (shard, bucket) and never funnel the corpus through
    one partition; ONE shuffle, then an O(batches) aggregate.
    """
    from pyspark.sql.window import Window

    from tada_spark.functions.text import token_count

    txt = F.coalesce(F.col(text_col), F.lit(""))
    # the canonical whitespace tokenizer — an inline re-implementation
    # here would silently drift from text.token_count (and the oracles
    # that mirror it) one site at a time
    toks = token_count(txt)
    base = df.filter(F.col(id_col).isNotNull() & F.col(shard_col).isNotNull()).select(
        F.col(shard_col).alias("shard"),
        F.col(id_col).alias("did"),
        F.md5(txt).alias("h"),
        toks.cast("long").alias("tokens"),
    )
    bucket = F.length(F.bin(F.col("tokens"))).alias("bucket")
    w = Window.partitionBy("shard", "bucket").orderBy("h", "did")
    # integral div (the quantile_normalize idiom): exact at any row
    # count, matching the oracle's // — never a double round-trip
    numbered = (
        base.select("shard", "did", "h", "tokens", bucket)
        .withColumn("__rn__", F.row_number().over(w) - F.lit(1))
        .withColumn("batch_id", F.expr(f"CAST(__rn__ DIV {int(batch_size)} AS BIGINT)"))
        .drop("__rn__")
    )
    agg = numbered.groupBy("shard", "bucket", "batch_id").agg(
        F.count("*").alias("n_docs"),
        F.sum("tokens").alias("total_tokens"),
        F.max("tokens").alias("max_tokens"),
    )
    nd = F.col("n_docs").cast("double")
    mx = F.col("max_tokens").cast("double")
    waste = F.when(
        F.col("max_tokens") > 0,
        F.floor(
            (nd * mx - F.col("total_tokens").cast("double")) / (nd * mx) * F.lit(1e6)
            + F.lit(0.5)
        ).cast("long"),
    ).otherwise(F.lit(0).cast("long"))
    return agg.select(
        "shard", "bucket", "batch_id", "n_docs", "total_tokens", "max_tokens",
        waste.alias("padding_waste_e6"),
    )


def dsir_scores(
    docs: DataFrame,
    target: Column,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 1024,
) -> DataFrame:
    """DSIR-style importance scores for data selection (Xie et al.
    2023, "Data Selection for Language Models via Importance
    Resampling"): hashed-n-gram bag-of-features importance weights
    log(p_target(b) / q_source(b)) summed over each document's feature
    occurrences. ``target`` is a boolean Column marking the
    high-quality subset whose distribution the selection should move
    the corpus toward; the source distribution is the whole input.

    Determinism (so a SQL oracle can hash-match): features are
    unigrams + '_'-joined bigrams of the whitespace tokenization,
    bucketed by the oracle-replicable md5 32-bit hash mod n_buckets;
    the Laplace-smoothed probability RATIO per bucket is formed from
    exact integer cross-products, logged with det_ln (the
    transcendental-free shared-expression ln), and quantized to
    integer millionths BEFORE the per-document sum — float order can
    never flip the result. Classic DSIR then resamples with Gumbel
    noise; the verifiable analog here returns the exact scores, and
    callers take the deterministic top-k.

    Scale shape: explode(features) → TWO bounded aggregates (bucket
    counts cap at n_buckets cells per partition via map-side combine),
    scalar totals recovered by an unpartitioned window over the
    n_buckets-row weight table (bounded, never over the corpus), then
    one broadcast join of that table back onto the exploded features
    and a per-document sum — the only corpus-sized shuffle.

    Magnitude bound: the integer cross-products (c+1)·(total+B) must
    stay under 2^53 for the double division — holds to ~1e8 docs per
    bucket × 1e8 total features; beyond that, pre-scale both counts.
    """
    from pyspark.sql.window import Window

    from tada_spark.functions.text import md5_hash32
    from tada_spark.plans.semantics import det_ln

    toks = F.expr(rf"filter(split(lower(trim({text_col})), '\\s+'), x -> x != '')")
    feats_expr = (
        "CASE WHEN size(__tk__) >= 2 THEN concat(__tk__, "
        "transform(sequence(1, size(__tk__) - 1), i -> concat(__tk__[i-1], '_', __tk__[i]))) "
        "ELSE __tk__ END"
    )
    fb = (
        docs.filter(F.length(F.trim(F.col(text_col))) > 0)
        .select(F.col(id_col), target.alias("__tgt__"), toks.alias("__tk__"))
        .select(id_col, "__tgt__", F.explode(F.expr(feats_expr)).alias("__feat__"))
        .select(
            id_col,
            "__tgt__",
            # the coalesce is a semantic no-op (__feat__ explodes from
            # arrays of non-null token strings, so the hash is never
            # NULL) but makes bucket provably non-nullable: the
            # broadcast join below otherwise infers IsNotNull(bucket)
            # and pushes it through this Project, evaluating the md5
            # bucket hash TWICE per exploded feature (plan-confirmed
            # by the r10 DUP_EXPR audit)
            F.coalesce(
                md5_hash32(F.concat(F.lit("dsir#"), F.col("__feat__"))) % F.lit(n_buckets),
                F.lit(0),
            ).alias("bucket"),
        )
    )
    counts = fb.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("cq"),
        F.count(F.when(F.col("__tgt__"), F.lit(1))).alias("ct"),
    )
    w = Window.partitionBy()  # over <= n_buckets rows, bounded by construction
    b = F.lit(n_buckets).cast("long")
    totals = counts.select(
        "bucket",
        "cq",
        "ct",
        F.sum("cq").over(w).alias("q_tot"),
        F.sum("ct").over(w).alias("t_tot"),
    )
    ratio = ((F.col("ct") + 1) * (F.col("q_tot") + b)).cast("double") / (
        (F.col("cq") + 1) * (F.col("t_tot") + b)
    ).cast("double")
    weights = totals.select(
        "bucket",
        F.floor(det_ln(ratio) * F.lit(1e6) + F.lit(0.5)).cast("long").alias("lw_e6"),
    )
    return (
        fb.join(F.broadcast(weights), "bucket")
        .groupBy(id_col)
        .agg(F.sum("lw_e6").alias("score_e6"), F.count(F.lit(1)).alias("n_feats"))
    )


def epoch_shuffle(
    df: DataFrame, id_col: str = "doc_id", *, n_epochs: int = 3, n_shards: int = 8
) -> DataFrame:
    """Deterministic multi-epoch training order: every epoch gets a
    DIFFERENT but fully reproducible permutation of the corpus by
    ordering on md5(epoch#id) — the shuffle-between-epochs training
    loops need, with none of rand()'s partition-layout dependence.
    Order is assigned SHARD-LOCALLY (shard = stable md5 bucket of the
    id, so a document keeps its shard across epochs): a window
    partitioned by (epoch, shard) rather than a global sort — the same
    scale idiom as sequence packing, because a global per-epoch
    row_number would funnel the corpus through one partition. Readers
    consume shards in parallel and concatenate; the permutation is the
    pair (shard, pos)."""
    from pyspark.sql.window import Window

    from tada_spark.functions.text import md5_hash32

    epochs = F.explode(F.array(*[F.lit(i) for i in range(n_epochs)])).alias("epoch")
    base = df.select(F.col(id_col), epochs)
    shard = hash_bucket(F.col(id_col), n_shards)
    okey = md5_hash32(
        F.concat(F.lit("ep"), F.col("epoch").cast("string"), F.lit("#"), F.col(id_col).cast("string"))
    )
    w = Window.partitionBy("epoch", "shard").orderBy("okey", id_col)
    return (
        base.select(id_col, "epoch", shard.alias("shard"), okey.alias("okey"))
        .withColumn("pos", F.row_number().over(w) - F.lit(1))
        .drop("okey")
    )
