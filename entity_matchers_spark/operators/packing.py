"""Training-data layout: sequence packing, global shuffle, token chunking.

The last mile of a pretraining pipeline is layout, not filtering: the
cleaned corpus must become (a) a deterministic global permutation split
into shards, and (b) fixed-length token sequences (concatenate-and-chunk).
Both are "order the whole corpus" problems, which is exactly what a naive
Spark plan gets wrong — ``Window.orderBy(...)`` with no partition key
collapses 100 TB onto ONE task. Every operator here is built around a
**distributed prefix sum** instead: order keys are uniform md5 hashes, so
their fixed-width hex prefix defines ``4096`` pre-sorted buckets; the
global running total = (exclusive sum over the 4096 per-bucket totals —
a broadcast-size table) + (per-bucket running total — a window over
~1/4096th of the data). Two narrow shuffles, no single-task stage, and
the result is byte-identical to the single-window semantics, which is what
the DuckDB oracles replay.

Determinism matches the repo convention (seeded md5, not ``rand()``):
the same doc lands in the same shard / sequence after any task retry, and
the oracle can recompute every decision. The reference pins all of its
sampling the same way (SEED_NUM=11037,
/root/reference/bert-int/basic_bert_unit/Param.py:10).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from entity_matchers_spark.functions.shingles import tokens

# Uniform-hash bucket prefix width (hex chars): 3 -> 4096 buckets. The
# bucket id is a PREFIX of the order key, so (bucket, key) sorts exactly
# like (key): two-level cumulative sums telescope into the global one.
_BUCKET_HEX = 3


def _order_key(id_col: str, salt: str):
    """md5(salt || id) hex — the deterministic global permutation key.
    Lowercase hex in both engines, so string comparison agrees."""
    return F.md5(F.concat(F.lit(salt), F.col(id_col).cast("string")))


def global_shuffle(
    df: DataFrame,
    n_shards: int,
    id_col: str = "doc_id",
    salt: str = "shuf:",
) -> DataFrame:
    """(id, shard, pos): deterministic global shuffle into ``n_shards``
    training shards — shard = md5-hash mod n_shards, pos = the row's rank
    within its shard under the same hash order (ties on id).

    This is the "global shuffle" every epoch-0 dataloader wants: a seeded
    permutation of the corpus that any worker can recompute locally.
    Changing ``salt`` is a re-shuffle; nothing else moves.

    Scale shape: shard assignment is a map-side expression (no shuffle at
    all until the write); ``pos`` is one shuffle on ``shard`` + a sort of
    ~corpus/n_shards rows per task. n_shards grows with the corpus (1e5
    shards at 100 TB keeps each window ~1 GB), so no stage ever sees more
    than one shard. Contrast with ``Window.orderBy(hash)`` over the whole
    table: same semantics, one task, dead at scale.
    """
    k = _order_key(id_col, salt)
    h = F.conv(F.substring(k, 1, 8), 16, 10).cast("long")
    out = df.select(
        F.col(id_col).alias("id"),
        F.pmod(h, F.lit(n_shards)).cast("int").alias("shard"),
        k.alias("_k"),
    )
    w = Window.partitionBy("shard").orderBy(F.col("_k").asc(), F.col("id").asc())
    return (
        out.withColumn("pos", (F.row_number().over(w) - 1).cast("long"))
        .select("id", "shard", "pos")
    )


def _global_exclusive_cumsum(
    df: DataFrame, val_col: str, key_col: str, id_col: str
) -> DataFrame:
    """Adds ``_start`` = sum of ``val_col`` over all rows strictly before
    this one in (key_col, id_col) order — WITHOUT a global single-partition
    window.

    Distributed prefix sum: ``key_col`` is a uniform md5 hex string, so its
    first ``_BUCKET_HEX`` chars split the corpus into 4096 equal buckets
    that sort in key order. Per-bucket running totals are a window over
    1/4096th of the data; the 4096 bucket totals are a broadcast-size table
    whose own exclusive cumsum (tiny single-partition window — 4096 rows)
    gives each bucket's global offset. Integer arithmetic throughout, so
    the result is bit-exact against the oracle's single global window.
    """
    bucketed = df.withColumn("_bkt", F.substring(F.col(key_col), 1, _BUCKET_HEX))
    w_in = (
        Window.partitionBy("_bkt")
        .orderBy(F.col(key_col).asc(), F.col(id_col).asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    intra = bucketed.withColumn(
        "_intra", F.coalesce(F.sum(val_col).over(w_in), F.lit(0)).cast("long")
    )
    totals = bucketed.groupBy("_bkt").agg(F.sum(val_col).cast("long").alias("_tot"))
    w_b = Window.orderBy("_bkt").rowsBetween(Window.unboundedPreceding, -1)
    offsets = totals.select(
        "_bkt", F.coalesce(F.sum("_tot").over(w_b), F.lit(0)).cast("long").alias("_off")
    )
    return (
        intra.join(F.broadcast(offsets), "_bkt")
        .withColumn("_start", (F.col("_off") + F.col("_intra")).cast("long"))
        .drop("_bkt", "_intra", "_off")
    )


def global_rank(
    df: DataFrame, key_col: str, id_col: str, out_col: str = "rank"
) -> DataFrame:
    """Adds ``out_col`` = the row's 0-based rank under ``(key_col, id_col)``
    ascending order — the distributed-prefix-sum specialization with every
    row weighing 1, so no stage ever sorts more than one bucket's worth.

    The bucket id is a prefix of ``key_col``, so this is exact for ANY
    string key (prefix order is consistent with full-key order), not just
    uniform hashes; non-uniform keys skew bucket SIZES (a window partition
    is one task — widen ``_BUCKET_HEX`` if a prefix dominates the corpus).
    Equal keys are tie-broken by ``id_col`` — total order, so
    the rank is unique and oracle-reproducible (``row_number() OVER
    (ORDER BY key, id) - 1``)."""
    return (
        _global_exclusive_cumsum(
            df.withColumn("_one", F.lit(1)), "_one", key_col, id_col
        )
        .withColumn(out_col, F.col("_start"))
        .drop("_one", "_start")
    )


def pack_sequences(
    df: DataFrame,
    seq_len: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    salt: str = "pack:",
) -> DataFrame:
    """Concatenate-and-chunk sequence packing: lay every document's tokens
    end-to-end in a deterministic (md5-keyed) global order and cut the
    stream into ``seq_len``-token training sequences. Emits one row per doc:

    ``(id, n_tok, start, first_seq, last_seq, offset)`` — the doc's tokens
    occupy global positions ``[start, start + n_tok)``; they appear in
    sequences ``first_seq..last_seq`` starting at ``offset`` inside
    ``first_seq``. This is the classic GPT-style packing (no padding; docs
    may straddle sequence boundaries), published as the default in the
    open LLM-data literature, and the coordinates are exactly what a
    shard writer needs to emit token streams without ever materializing
    the concatenation.

    Scale shape: one token-count scan (map-side) + the distributed prefix
    sum of :func:`_global_exclusive_cumsum` — two narrow shuffles, tasks
    bounded by corpus/4096, never a global sort on one task. All integer
    math: bit-exact vs the oracle's single-window SQL.
    """
    k = _order_key(id_col, salt)
    base = df.select(
        F.col(id_col).alias("id"),
        F.size(tokens(F.col(text_col))).cast("long").alias("n_tok"),
        k.alias("_k"),
    )
    summed = _global_exclusive_cumsum(base, "n_tok", "_k", "id")
    L = F.lit(int(seq_len)).cast("long")
    start = F.col("_start")
    last_tok = start + F.greatest(F.col("n_tok") - 1, F.lit(0)).cast("long")
    return summed.select(
        "id",
        "n_tok",
        start.alias("start"),
        (start / L).cast("long").alias("first_seq"),
        (last_tok / L).cast("long").alias("last_seq"),
        F.pmod(start, L).cast("long").alias("offset"),
    )


def chunk_tokens(
    df: DataFrame,
    window: int,
    stride: int,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Sliding-window token chunking (RAG/embedding-prep layout): each doc
    becomes chunks of ``window`` tokens starting every ``stride`` tokens,
    the last chunk shortened to end at the doc boundary. Chunk count is
    ``1 + ceil(max(0, n - window) / stride)`` — the standard overlap
    formula (every token is covered, no chunk is fully contained in the
    previous one).

    Emits ``(id, chunk_id, start_tok, n_tok, chunk_text)``.

    Scale shape: pure map-side — tokenize, ``posexplode`` a per-row
    ``sequence`` of starts, slice. No shuffle, no state; the row multiplies
    inside its own partition exactly like :func:`epoch_upsample`, so the
    operator composes with any upstream filter and scales with the scan.
    """
    W = F.lit(int(window)).cast("long")
    S = F.lit(int(stride)).cast("long")
    toks = tokens(F.col(text_col))
    n = F.size(toks).cast("long")
    n_chunks = (
        F.lit(1).cast("long")
        + ((F.greatest(n - W, F.lit(0)) + S - 1) / S).cast("long")
    )
    base = df.select(
        F.col(id_col).alias("id"), toks.alias("_toks"), n.alias("_n"),
        F.sequence(F.lit(0).cast("long"), n_chunks - 1).alias("_idx"),
    )
    exploded = base.select(
        "id", "_toks", "_n", F.posexplode("_idx").alias("chunk_id", "_i")
    ).withColumn("start_tok", (F.col("_i") * S).cast("long"))
    return exploded.select(
        "id",
        F.col("chunk_id").cast("long").alias("chunk_id"),
        "start_tok",
        F.least(W, F.col("_n") - F.col("start_tok")).cast("long").alias("n_tok"),
        F.array_join(
            F.slice(F.col("_toks"), F.col("start_tok").cast("int") + 1, int(window)),
            " ",
        ).alias("chunk_text"),
    )


def zorder_key(a, b, bits: int = 16):
    """Morton (Z-order) interleaving of the low ``bits`` of two
    non-negative integer columns: bit i of ``a`` lands at position 2i,
    bit i of ``b`` at 2i+1. The multi-dimensional clustering key behind
    Iceberg/Delta Z-ORDER layout: range-partitioning by this key gives
    files that are simultaneously tight in BOTH dimensions, so min/max
    file statistics prune scans filtered on either column.

    Built as an unrolled chain of shift/mask/or expressions — pure
    integer arithmetic, whole-stage codegen, and mechanically replayable
    in the SQL oracle (``zorder_key_sql`` emits the same expression).
    Inputs are masked to ``bits`` (callers quantize coarser dimensions
    first); 2·bits ≤ 62 keeps the key in a BIGINT.
    """
    a = F.col(a) if isinstance(a, str) else a
    b = F.col(b) if isinstance(b, str) else b
    mask = (1 << bits) - 1
    a = a.cast("long").bitwiseAND(F.lit(mask))
    b = b.cast("long").bitwiseAND(F.lit(mask))
    z = F.lit(0).cast("long")
    for i in range(bits):
        z = z.bitwiseOR(
            F.shiftleft(a.bitwiseAND(F.lit(1 << i)), i)
        ).bitwiseOR(
            F.shiftleft(b.bitwiseAND(F.lit(1 << i)), i + 1)
        )
    return z


def zorder_key_sql(a: str, b: str, bits: int = 16) -> str:
    """The SQL replay of :func:`zorder_key` (same unrolled expression)."""
    mask = (1 << bits) - 1
    am = f"(({a})::BIGINT & {mask})"
    bm = f"(({b})::BIGINT & {mask})"
    terms = []
    for i in range(bits):
        terms.append(f"(({am} & {1 << i}) << {i})")
        terms.append(f"(({bm} & {1 << i}) << {i + 1})")
    return "(" + " | ".join(terms) + ")"


def zorder_layout(
    df: DataFrame,
    dim_a: str,
    dim_b: str,
    id_col: str,
    n_files: int = 64,
    bits: int = 16,
) -> DataFrame:
    """(…, zkey, file_id): Z-order layout assignment — every row keyed by
    the Morton interleave of its two dimensions and bucketed into
    ``n_files`` equal-population output files by GLOBAL zkey rank (the
    distributed prefix-sum rank shape used across this module — md5-bucket
    two-level cumulative sums, no single-task window; here the bucket IS
    the zkey's top bits, which are already uniform enough for layout: file
    boundaries land on zkey order statistics computed exactly).

    The write itself (`df.repartitionByRange(n_files, "zkey")` +
    per-file min/max stats) is the caller's sink step; this operator
    returns the assignment so the decision is oracle-verifiable.
    """
    keyed = df.withColumn("zkey", zorder_key(dim_a, dim_b, bits))
    # exact equal-population file split: global rank via two-level prefix
    # sum over the (zkey, tiebreak) order — same discipline as
    # global_shuffle, reusing its bucket decomposition on the zkey's hex
    n = keyed.count()
    w_bucket = Window.partitionBy("_bk").orderBy("zkey", id_col)
    bucketed = keyed.withColumn(
        "_bk", F.shiftrightunsigned(F.col("zkey"), max(0, 2 * bits - 12))
    )
    per_bucket = bucketed.groupBy("_bk").agg(F.count("*").alias("_bn"))
    w_tot = Window.orderBy("_bk").rowsBetween(Window.unboundedPreceding, -1)
    offsets = per_bucket.withColumn("_off", F.coalesce(F.sum("_bn").over(w_tot), F.lit(0))).select("_bk", "_off")
    ranked = (
        bucketed.withColumn("_rn", F.row_number().over(w_bucket) - 1)
        .join(F.broadcast(offsets), "_bk")
        .withColumn("_rank", F.col("_rn") + F.col("_off"))
    )
    return ranked.withColumn(
        "file_id", F.least(F.floor(F.col("_rank") * n_files / F.lit(n)).cast("int"), F.lit(n_files - 1))
    ).drop("_bk", "_rn", "_off", "_rank")
