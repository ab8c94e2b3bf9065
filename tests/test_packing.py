"""Training-data layout operators: pack_sequences / global_shuffle /
chunk_tokens — each verified against an independent driver-side Python
reference that replays the single-global-window semantics the distributed
prefix-sum decomposition must reproduce bit-exactly."""

from __future__ import annotations

import hashlib

import pytest


def _md5(s: str) -> str:
    return hashlib.md5(s.encode()).hexdigest()


@pytest.fixture()
def word_docs(spark):
    rows = [
        (0, "alpha beta gamma delta"),
        (1, "one two three four five six seven eight nine ten"),
        (2, "x"),
        (3, "lorem ipsum dolor sit amet consectetur"),
        (4, "a b c d e f g"),
        (5, "solo"),
        (6, "   padded    whitespace   tokens   "),
        (7, "repeat repeat repeat repeat repeat repeat repeat repeat repeat"),
    ]
    return rows, spark.createDataFrame(rows, "doc_id long, text string")


def test_pack_sequences_matches_global_window_reference(spark, word_docs):
    from entity_matchers_spark.operators.packing import pack_sequences

    rows, docs = word_docs
    L = 5
    out = {r.id: r for r in pack_sequences(docs, seq_len=L).collect()}

    # Python reference: single global ordering by (md5('pack:'||id), id).
    counts = {i: len(t.split()) for i, t in rows}
    order = sorted(counts, key=lambda i: (_md5(f"pack:{i}"), i))
    start, expect = 0, {}
    for i in order:
        n = counts[i]
        expect[i] = (n, start, start // L, (start + max(n - 1, 0)) // L, start % L)
        start += n
    assert len(out) == len(rows)
    for i, (n, st, fs, ls, off) in expect.items():
        r = out[i]
        assert (r.n_tok, r.start, r.first_seq, r.last_seq, r.offset) == (n, st, fs, ls, off)
    # The packed stream is gapless: starts are exactly the exclusive cumsum.
    assert sum(counts.values()) == start


def test_pack_sequences_straddles_sequence_boundaries(spark):
    from entity_matchers_spark.operators.packing import pack_sequences

    docs = spark.createDataFrame(
        [(i, " ".join(["w"] * 7)) for i in range(10)], "doc_id long, text string"
    )
    out = pack_sequences(docs, seq_len=16).collect()
    # 10 docs x 7 tokens = 70 tokens -> sequences 0..4; some doc must straddle.
    assert max(r.last_seq for r in out) == (70 - 1) // 16
    assert any(r.first_seq != r.last_seq for r in out)
    # Every doc fits within [first_seq, last_seq] by construction.
    for r in out:
        assert r.first_seq * 16 + r.offset == r.start
        assert r.first_seq <= r.last_seq


def test_global_shuffle_is_a_deterministic_permutation(spark, word_docs):
    from entity_matchers_spark.operators.packing import global_shuffle

    rows, docs = word_docs
    out = [(r.id, r.shard, r.pos) for r in global_shuffle(docs, n_shards=3).collect()]
    assert len(out) == len(rows)
    # Reference: shard = first-8-hex of md5 mod 3; pos = rank within shard.
    ref_shard = {i: int(_md5(f"shuf:{i}")[:8], 16) % 3 for i, _ in rows}
    by_shard: dict[int, list[int]] = {}
    for i, _ in rows:
        by_shard.setdefault(ref_shard[i], []).append(i)
    ref_pos = {}
    for s, ids in by_shard.items():
        for p, i in enumerate(sorted(ids, key=lambda i: (_md5(f"shuf:{i}"), i))):
            ref_pos[i] = p
    for i, s, p in out:
        assert s == ref_shard[i] and p == ref_pos[i]
    # Re-running yields the identical permutation (retry-stable).
    again = {(r.id, r.shard, r.pos) for r in global_shuffle(docs, n_shards=3).collect()}
    assert again == set(out)
    # A different salt is a different permutation of the same rows.
    other = {(r.id, r.shard, r.pos) for r in
             global_shuffle(docs, n_shards=3, salt="shuf2:").collect()}
    assert {t[0] for t in other} == {i for i, _ in rows}
    assert other != again


def test_chunk_tokens_standard_overlap_formula(spark):
    from entity_matchers_spark.operators.packing import chunk_tokens

    docs = spark.createDataFrame(
        [
            (1, " ".join(f"t{i}" for i in range(10))),  # n=10, W=8, S=4 -> 2 chunks
            (2, "a b c"),                               # n < W -> 1 chunk
            (3, " ".join(f"u{i}" for i in range(16))),  # n=16 -> chunks at 0,4,8
        ],
        "doc_id long, text string",
    )
    out = chunk_tokens(docs, window=8, stride=4).collect()
    got = {}
    for r in out:
        got.setdefault(r.id, []).append((r.chunk_id, r.start_tok, r.n_tok, r.chunk_text))
    for v in got.values():
        v.sort()
    # n=10: 1 + ceil((10-8)/4) = 2 chunks; the tail chunk is shortened.
    assert [c[:3] for c in got[1]] == [(0, 0, 8), (1, 4, 6)]
    assert got[1][0][3] == " ".join(f"t{i}" for i in range(8))
    assert got[1][1][3] == " ".join(f"t{i}" for i in range(4, 10))
    # n=3 < W: a single whole-doc chunk.
    assert got[2] == [(0, 0, 3, "a b c")]
    # n=16: 1 + ceil(8/4) = 3 chunks, last one exactly flush.
    assert [c[:3] for c in got[3]] == [(0, 0, 8), (1, 4, 8), (2, 8, 8)]
    # Coverage invariant: every token index is inside some chunk.
    for i, t in [(1, 10), (2, 3), (3, 16)]:
        covered = set()
        for _, st, n, _ in got[i]:
            covered |= set(range(st, st + n))
        assert covered == set(range(t))


def test_corpus_rollup_grains_are_consistent(spark):
    """ROLLUP emits (d1,d2), (d1), and () grains whose counts/sums nest
    exactly; the grand total matches the raw table."""
    from entity_matchers_spark.operators.text_analysis import corpus_rollup

    docs = spark.createDataFrame(
        [
            (1, "one two three", "en", "web"),
            (2, "quatre cinq", "fr", "web"),
            (3, "six seven eight nine", "en", "books"),
            (4, "dix", "fr", "web"),
            (5, "ten eleven", "en", "web"),
        ],
        "doc_id long, text string, lang string, source string",
    )
    rows = {(r.lang, r.source): r for r in corpus_rollup(docs).collect()}
    # grains: 3 leaf combos + 2 langs + 1 total
    assert set(rows) == {
        ("en", "web"), ("en", "books"), ("fr", "web"),
        ("en", "(all)"), ("fr", "(all)"), ("(all)", "(all)"),
    }
    total = rows[("(all)", "(all)")]
    assert total.n_docs == 5 and total.total_tokens == 12
    assert rows[("en", "(all)")].n_docs == 3
    assert (
        rows[("en", "web")].n_docs + rows[("en", "books")].n_docs
        == rows[("en", "(all)")].n_docs
    )
    # per-lang token sums nest into the total
    assert (
        rows[("en", "(all)")].total_tokens + rows[("fr", "(all)")].total_tokens
        == total.total_tokens
    )
    # median of fr/web chars: docs 2 ("quatre cinq"=11) and 4 ("dix"=3) -> 7.0
    assert rows[("fr", "(all)")].median_chars == 7.0
    assert total.max_chars == max(len(t) for _, t, _, _ in
                                  [(1, "one two three", 0, 0),
                                   (2, "quatre cinq", 0, 0),
                                   (3, "six seven eight nine", 0, 0),
                                   (4, "dix", 0, 0),
                                   (5, "ten eleven", 0, 0)])


def test_zorder_key_matches_reference_interleave(spark):
    from entity_matchers_spark.operators.packing import zorder_key

    def ref(a, b, bits=16):
        z = 0
        for i in range(bits):
            z |= ((a >> i) & 1) << (2 * i)
            z |= ((b >> i) & 1) << (2 * i + 1)
        return z

    rows = [(0, 0), (1, 0), (0, 1), (3, 5), (65535, 65535), (70000, 2)]
    df = spark.createDataFrame(rows, "a long, b long")
    got = {(r.a, r.b): r.z for r in df.withColumn("z", zorder_key("a", "b")).collect()}
    for a, b in rows:
        assert got[(a, b)] == ref(a & 0xFFFF, b & 0xFFFF), (a, b)


def test_zorder_layout_files_are_zkey_ranges(spark):
    """file_id must be monotone in (zkey, id) and files equal-population."""
    import itertools

    from entity_matchers_spark.operators.packing import zorder_layout

    rows = [(i, (i * 37) % 100, (i * 91) % 100) for i in range(400)]
    df = spark.createDataFrame(rows, "id long, x long, y long")
    out = zorder_layout(df, "x", "y", id_col="id", n_files=8).collect()
    srt = sorted(out, key=lambda r: (r.zkey, r.id))
    fids = [r.file_id for r in srt]
    assert fids == sorted(fids)            # monotone -> files are zkey ranges
    sizes = [len(list(g)) for _, g in itertools.groupby(fids)]
    assert sizes == [50] * 8               # exact equal population
