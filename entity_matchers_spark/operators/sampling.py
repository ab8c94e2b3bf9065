"""Training-mix sampling: stratified subsampling and epoch upsampling.

A 100-TB pretraining pipeline rarely trains on the crawl as-is: each
(language, source, quality-bucket) stratum gets its own keep-rate
(downsample the boilerplate-heavy sources) and its own epoch count
(repeat the high-quality slice 2.3x). Both operators below are pure
map-side row expressions — no shuffle, no state, no driver participation —
so they scale with the scan and compose with any upstream filter.

The sampling decision is a deterministic hash-uniform, not ``rand()``:
``u(id) = int(md5(salt || id)[:8]) / 2^32``. That makes runs reproducible
across retries/partitions (a hard requirement for resumable pipelines — the
same doc makes the same decision after a task retry), lets the DuckDB
oracle replay the exact decision, and matches how the reference seeds all
randomness for determinism (SEED_NUM=11037,
/root/reference/bert-int/basic_bert_unit/Param.py:10; seeded fold
sampling, /root/reference/src/preprocess_datasets/create_k_folds.py:6-31).

Fractional epochs use the same trick: ``epochs=2.3`` yields 2 copies
always plus a 3rd copy for the 30% of ids whose (differently-salted) hash
falls under 0.3 — in expectation exactly 2.3 epochs, deterministic per id.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_U32 = 4294967296.0  # 2^32


def hash_uniform(col: Column | str, salt: str) -> Column:
    """Deterministic U[0,1) from md5(salt || value) — first 8 hex digits as
    a 32-bit integer over 2^32. Engine-reproducible: DuckDB spells it
    ``('0x'||substr(md5(salt||v),1,8))::UBIGINT / 4294967296.0``."""
    c = F.col(col) if isinstance(col, str) else col
    h = F.conv(F.substring(F.md5(F.concat(F.lit(salt), c.cast("string"))), 1, 8), 16, 10)
    return h.cast("double") / F.lit(_U32)


def _rate_expr(rates: dict[str, float], stratum: Column, default: float) -> Column:
    expr: Column | None = None
    for key, rate in sorted(rates.items()):
        cond = stratum == F.lit(key)
        expr = F.when(cond, F.lit(float(rate))) if expr is None else expr.when(cond, F.lit(float(rate)))
    return F.lit(float(default)) if expr is None else expr.otherwise(F.lit(float(default)))


def stratified_sample(
    df: DataFrame,
    rates: dict[str, float],
    stratum_col: str = "lang",
    id_col: str = "doc_id",
    default_rate: float = 0.0,
    salt: str = "strat:",
) -> DataFrame:
    """Keep each row iff its deterministic uniform falls under its
    stratum's keep-rate. Pure filter: predicate-pushdown friendly, no
    shuffle, exact same decision on task retry."""
    rate = _rate_expr(rates, F.col(stratum_col), default_rate)
    return df.where(hash_uniform(F.col(id_col), salt) < rate)


def epoch_upsample(
    df: DataFrame,
    epochs: dict[str, float],
    stratum_col: str = "lang",
    id_col: str = "doc_id",
    default_epochs: float = 1.0,
    salt: str = "epoch:",
    copy_col: str = "copy",
) -> DataFrame:
    """Repeat each row ``floor(e)`` times plus one more for the ``frac(e)``
    share of ids (deterministic hash-uniform), emitting a 0-based
    ``copy_col`` index. ``epochs=0.5`` is a downsample, ``2.3`` an
    upsample; expectation is exactly ``e`` copies per row.

    Map-side ``explode(sequence(...))`` — the row multiplies inside its own
    partition, no shuffle. Downstream shuffles see the post-epoch volume,
    which is the honest cost of training-mix repetition.
    """
    e = _rate_expr(epochs, F.col(stratum_col), default_epochs)
    base = F.floor(e).cast("int")
    extra = (hash_uniform(F.col(id_col), salt) < (e - F.floor(e))).cast("int")
    n = (base + extra).alias("_n_copies")
    out = df.withColumn("_n_copies", n).where(F.col("_n_copies") > 0)
    return (
        out.withColumn(copy_col, F.explode(F.sequence(F.lit(0), F.col("_n_copies") - 1)))
        .drop("_n_copies")
    )


def domain_cap(
    df: DataFrame,
    max_per_key: int,
    key_col: str = "source",
    id_col: str = "doc_id",
    salt: str = "cap:",
) -> DataFrame:
    """Keep at most ``max_per_key`` rows per key (per-domain head-cap — the
    anti-spam control every crawl pipeline applies before mixing: one SEO
    farm must not dominate a source bucket).

    Selection is a RANDOM-but-deterministic subset, not first-k by id:
    rows are ranked inside their key by the md5-uniform (ties on id), so
    the kept sample is unbiased w.r.t. crawl order yet stable across
    retries and replayable by the oracle.

    Scale shape: one shuffle on ``key_col`` + a rank. Spark's window sorts
    each key's rows; for k << key size on truly giant keys, the same
    semantics pre-thin with a per-partition partial top-k (the rank is on
    a fixed per-row hash, so partial top-k commutes) — at the fixture's
    key sizes the straight window is the faster plan.
    """
    from pyspark.sql import Window

    w = Window.partitionBy(key_col).orderBy(
        hash_uniform(F.col(id_col), salt).asc(), F.col(id_col).asc()
    )
    return (
        df.withColumn("_rk", F.row_number().over(w))
        .where(F.col("_rk") <= max_per_key)
        .drop("_rk")
    )


# --- DSIR importance resampling -------------------------------------------------


def hashed_ngram_buckets(text_col: Column | str, buckets: int) -> Column:
    """Hashed n-gram features (DSIR, Xie et al. 2023, arXiv:2302.03169):
    token unigrams + bigrams, each hashed into one of ``buckets`` integer
    buckets. Returns one bucket id per feature OCCURRENCE (counts matter,
    so no dedup). md5-derived, hence engine-reproducible in the oracle as
    ``('0x'||substr(md5(g),1,8))::UBIGINT::BIGINT % buckets``."""
    from entity_matchers_spark.functions.shingles import token_shingles, tokens

    c = F.col(text_col) if isinstance(text_col, str) else text_col
    grams = F.concat(tokens(c), token_shingles(c, n=2, distinct=False))
    return F.transform(
        grams,
        lambda g: F.pmod(
            F.conv(F.substring(F.md5(g), 1, 8), 16, 10).cast("long"), F.lit(buckets)
        ).cast("int"),
    )


def dsir_weights(
    raw: DataFrame,
    target: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    buckets: int = 4096,
) -> DataFrame:
    """(id, n_feats, logw): per-raw-doc DSIR importance weight
    ``log w(x) = Σ_b n_b(x) · (log p_b − log q_b)`` where p/q are add-1-
    smoothed bag-of-hashed-ngram models fit on the target / raw corpus.

    High logw = "looks like the target distribution" — the data-selection
    score used to pick pretraining data matching a high-quality target
    (DSIR §3; the hashed-ngram generative model makes fitting two corpora
    a pair of bucket-count aggregations).

    Scale shape: both models are ``buckets`` rows (a constant, ~10^4),
    aggregated with map-side partial combine from one explode each —
    nothing grows with corpus size except the two linear scans. The
    per-bucket log-ratio table is broadcast back onto the raw side's
    exploded features; the final per-doc sum is one partial-aggregated
    shuffle on doc id. At 10^12 docs every stage is linear and the only
    state is 2·buckets counters.
    """
    raw_feats = raw.select(
        F.col(id_col).alias("id"),
        F.explode(hashed_ngram_buckets(F.col(text_col), buckets)).alias("b"),
    )
    tgt_feats = target.select(
        F.explode(hashed_ngram_buckets(F.col(text_col), buckets)).alias("b")
    )
    raw_cnt = raw_feats.groupBy("b").agg(F.count("*").alias("cq"))
    tgt_cnt = tgt_feats.groupBy("b").agg(F.count("*").alias("cp"))
    spark = raw.sparkSession
    all_b = spark.range(buckets).select(F.col("id").cast("int").alias("b"))
    model = (
        all_b.join(tgt_cnt, "b", "left")
        .join(raw_cnt, "b", "left")
        .select(
            "b",
            F.coalesce("cp", F.lit(0)).alias("cp"),
            F.coalesce("cq", F.lit(0)).alias("cq"),
        )
    )
    totals = model.agg(F.sum("cp").alias("np"), F.sum("cq").alias("nq"))
    ratio = model.crossJoin(F.broadcast(totals)).select(
        "b",
        (
            F.log((F.col("cp") + 1).cast("double") / (F.col("np") + buckets).cast("double"))
            - F.log((F.col("cq") + 1).cast("double") / (F.col("nq") + buckets).cast("double"))
        ).alias("lr"),
    )
    per_doc = (
        raw_feats.join(F.broadcast(ratio), "b")
        .groupBy("id")
        .agg(F.count("*").alias("n_feats"), F.sum("lr").alias("logw"))
    )
    return (
        raw.select(F.col(id_col).alias("id"))
        .join(per_doc, "id", "left")
        .select(
            "id",
            F.coalesce("n_feats", F.lit(0)).alias("n_feats"),
            F.coalesce("logw", F.lit(0.0)).alias("logw"),
        )
    )


def dsir_resample(
    raw: DataFrame,
    target: DataFrame,
    k: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    buckets: int = 4096,
    salt: str = "dsir:",
) -> DataFrame:
    """(id, n_feats, logw, gumbel, key): Gumbel-top-k sample of ``k`` raw
    docs ∝ their DSIR importance weights — sampling without replacement as
    one global top-k (Gumbel-max trick: argtop-k of logw + Gumbel noise is
    distributed as weighted sampling without replacement).

    The Gumbel draw is the deterministic md5-uniform (retry-stable,
    oracle-replayable): ``g = -log(-log(u))`` with u floored at 1e-12.
    The ranking key is rounded to 6 dp BEFORE comparison so both engines
    rank identically despite non-associative float sums; ties break on id.
    ``orderBy().limit(k)`` is Spark's distributed TakeOrdered — per-
    partition partial top-k then a k-row reduce, no global sort.
    """
    w = dsir_weights(raw, target, id_col=id_col, text_col=text_col, buckets=buckets)
    u = hash_uniform(F.col("id"), salt)
    g = -F.log(-F.log(F.greatest(u, F.lit(1e-12))))
    keyed = w.select(
        "id",
        "n_feats",
        F.round("logw", 6).alias("logw"),
        F.round(g, 6).alias("gumbel"),
        F.round(F.col("logw") + g, 6).alias("key"),
    )
    return keyed.orderBy(F.col("key").desc(), F.col("id").asc()).limit(k)


def temperature_mix(
    df: DataFrame,
    budget: int,
    id_col: str = "doc_id",
    source_col: str = "source",
    salt: str = "tmix:",
) -> DataFrame:
    """(id, source, copies): temperature-scaled source mixing — the
    mT5/XLM-R recipe: a training budget of ``budget`` documents is split
    across sources proportionally to n_s^0.5 (temperature exponent 0.5),
    which upsamples low-resource sources and downsamples the head.

    Per-source targets use ONLY integer arithmetic after one IEEE sqrt:
    s_fp = round(sqrt(n_s) * 1e6) per source (sqrt is correctly rounded by
    the IEEE 754 standard, so identical in any engine — an arbitrary pow()
    would not be), target_s = budget * s_fp // sum(s_fp). Per-doc copies
    then follow the epoch_upsample convention: floor(target/n) guaranteed
    copies plus one extra when hash_uniform(id) < (target mod n)/n — an
    expected-count fractional part that needs NO per-source sort, so a
    90%-one-source crawl never funnels into a single window partition.
    """
    src = df.groupBy(F.col(source_col).alias("source")).agg(F.count("*").alias("n_s"))
    s_fp = F.round(F.sqrt(F.col("n_s").cast("double")) * 1e6).cast("long")
    src = src.withColumn("s_fp", s_fp)
    tot = src.agg(F.sum("s_fp").alias("tot_fp"))
    targets = src.crossJoin(F.broadcast(tot)).select(
        "source",
        "n_s",
        # integer division (div), never double-divide-then-truncate: a
        # correctly-rounded double quotient can land on the wrong side of
        # an integer boundary and disagree with another engine's // there
        F.expr(f"(cast({int(budget)} as bigint) * s_fp) div tot_fp").alias("target"),
    )
    out = df.select(F.col(id_col).alias("id"), F.col(source_col).alias("source")).join(
        F.broadcast(targets), "source"
    )
    base_copies = F.expr("target div n_s")
    frac = (F.col("target") % F.col("n_s")) / F.col("n_s").cast("double")
    extra = (hash_uniform(F.col("id"), salt) < frac).cast("int")
    return out.select(
        "id", "source", (base_copies + extra).cast("long").alias("copies")
    )


# --- A-ES weighted sampling without replacement ---------------------------------


def weighted_sample(
    df: DataFrame,
    k: int,
    weight_col: str,
    strata_cols: tuple[str, ...] = (),
    id_col: str = "doc_id",
    salt: str = "aes:",
    quant: int = 10**9,
) -> DataFrame:
    """Weighted sampling WITHOUT replacement: keep ``k`` rows (per stratum)
    with inclusion probability proportional to ``weight_col``, one pass,
    no driver state — Efraimidis & Spirakis (2006) A-ES: each row draws
    ``u = U(0,1)`` and the k LARGEST keys ``u^(1/w)`` are the sample.

    This is the sampler a training-mix pipeline wants when
    ``temperature_mix`` has produced per-document weights and the shard
    budget is a fixed COUNT (not a rate): ``stratified_sample`` keeps a
    rate, ``domain_cap`` keeps a uniform k — A-ES keeps a weighted k,
    exactly, in one distributed pass (the classic single-pass distributed
    weighted-reservoir construction).

    Determinism & cross-engine parity: ``u`` is the md5-uniform (salted id,
    offset by +0.5/2^32 so u > 0 and ln(u) is finite), and rows are ranked
    by ``key_q = round(quant * ln(u)/w)`` — monotone in ``u^(1/w)`` since
    ``ln`` is increasing and ``ln(u) < 0``. The quantized-integer key (same
    device as ``bcubed``/``monge_elkan``) absorbs last-ulp libm differences
    between engines; ties break on id ascending. Rows with ``w <= 0`` are
    excluded (zero weight = zero inclusion mass, as in the paper).

    Scale shape: one map-side key expression + one shuffle on the strata
    key + a per-stratum top-k window (WindowGroupLimit pushes the k-cut
    map-side in Spark ≥ 3.5, so the shuffle carries ~k rows per partition
    per stratum, not the stratum). With ``strata_cols=()`` every row
    competes in one global sample; the plan is still the partial-top-k
    shape, not a single-partition sort.
    """
    from pyspark.sql import Window

    c_id = F.col(id_col)
    h = F.conv(
        F.substring(F.md5(F.concat(F.lit(salt), c_id.cast("string"))), 1, 8), 16, 10
    ).cast("double")
    u = (h + F.lit(0.5)) / F.lit(_U32)
    key_q = F.round(F.log(u) / F.col(weight_col).cast("double") * F.lit(float(quant))).cast("long")
    keyed = df.where(F.col(weight_col) > 0).withColumn("key_q", key_q)
    parts = [F.col(c) for c in strata_cols] if strata_cols else [F.lit(0)]
    w = Window.partitionBy(*parts).orderBy(F.col("key_q").desc(), c_id.asc())
    return (
        keyed.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= k)
    )


def cluster_split(
    clusters: DataFrame,
    fractions: tuple[float, ...] = (0.8, 0.1, 0.1),
    names: tuple[str, ...] = ("train", "valid", "test"),
    cluster_col: str = "cluster_id",
    salt: str = "split:",
) -> DataFrame:
    """Leakage-free train/valid/test assignment: the split decision is a
    function of the CLUSTER id, never the document id, so an entire
    near-dup/entity cluster lands in exactly one split — the guard that
    keeps a test document's near-duplicate out of train (row-level splits
    leak heavily on a web corpus, where ~30-50% of pages have near-dups;
    Lee et al. 2022 measure the resulting eval inflation).

    ``clusters`` is any (id, cluster_col) table — the transitive-cluster
    output of ``neardup_resolve``/``er_clusters``. One md5-uniform per
    cluster id mapped through the cumulative fraction boundaries; pure
    map-side expression, deterministic per retry, oracle-replayable.

    The reference's k-fold splitter draws folds row-wise over labeled
    links (/root/reference/src/preprocess_datasets/create_k_folds.py:6-31)
    — safe there because OpenEA link sets are already 1-1 deduped; on a
    raw web corpus the cluster-level decision is the correct analog.
    """
    u = hash_uniform(F.col(cluster_col), salt)
    bounds = []
    acc = 0.0
    for f in fractions[:-1]:
        acc += f
        bounds.append(acc)
    expr = F.lit(names[-1])
    for name, b in zip(reversed(names[:-1]), reversed(bounds)):
        expr = F.when(u < F.lit(b), F.lit(name)).otherwise(expr)
    return clusters.withColumn("split", expr)
