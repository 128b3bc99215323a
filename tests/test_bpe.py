"""Semantic tests for the BPE trainer (operators/bpe.py).

Registry parity gates doc_bpe_merges / doc_bpe_tokens against DuckDB;
these pin the ALGORITHM on hand-checkable corpora — the classic
Sennrich merge example, greedy overlapping-pair semantics, and
deterministic tie-breaking.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from flink_tank_spark.operators import bpe


def _train(spark, words_with_counts, n):
    df = spark.createDataFrame(words_with_counts, "word string, cnt long")
    return bpe.train_merges(bpe.seed_symbols(df), n)


def test_classic_merge_sequence(spark):
    # Sennrich-style toy vocabulary: 'es' dominates, then 'est', 'est</w>'.
    corpus = [("newest", 6), ("widest", 3), ("low", 5), ("lower", 2)]
    merges = _train(spark, corpus, 3)
    assert [(m.left, m.right) for m in merges] == [
        ("e", "s"),
        ("es", "t"),
        ("est", "</w>"),
    ]
    assert merges[0].count == 9  # newest(6) + widest(3)


def test_greedy_overlap_and_application(spark):
    # 'aaa' with pair (a,a): greedy left-to-right merges the FIRST two
    # only — {aa}{a}, the standard BPE behavior the brace representation
    # preserves under single-pass replace.
    merges = _train(spark, [("aaa", 10)], 1)
    assert (merges[0].left, merges[0].right) == ("a", "a")
    seeded = bpe.seed_symbols(
        spark.createDataFrame([("aaa", 1)], "word string, cnt long")
    )
    out = bpe.apply_merges(seeded, merges).collect()[0]
    assert out["syms"] == "{aa}{a}{</w>}"
    tok = (
        bpe.apply_merges(seeded, merges)
        .select(bpe.token_count_col().alias("n"))
        .collect()[0]["n"]
    )
    assert tok == 3


def test_tie_break_is_lexicographic(spark):
    # 'ba' and 'cd' pairs both occur once -> (b,a) sorts before (c,d)
    merges = _train(spark, [("ba", 1), ("cd", 1)], 1)
    assert (merges[0].left, merges[0].right) == ("a", "</w>") or True
    # counts: pairs are (b,a),(a,</w>),(c,d),(d,</w>) each 1; lexicographic
    # min is (a,</w>)
    assert (merges[0].left, merges[0].right) == ("a", "</w>")


def test_word_counts_is_weighted_and_lowercased(spark):
    docs = spark.createDataFrame(
        [(1, "The the THE cat"), (2, "cat dog")], "doc_id long, text string"
    )
    got = {
        r["word"]: r["cnt"] for r in bpe.word_counts(docs).collect()
    }
    assert got == {"the": 3, "cat": 2, "dog": 1}


def _train_inc(spark, words_with_counts, n, ce=4):
    df = spark.createDataFrame(words_with_counts, "word string, cnt long")
    return bpe.train_merges_incremental(bpe.seed_symbols(df), n, checkpoint_every=ce)


def test_incremental_equals_naive_on_toy(spark):
    corpus = [("newest", 6), ("widest", 3), ("low", 5), ("lower", 2)]
    naive = _train(spark, corpus, 6)
    inc = _train_inc(spark, corpus, 6)
    assert [(m.step, m.left, m.right, m.count) for m in inc] == [
        (m.step, m.left, m.right, m.count) for m in naive
    ]


def test_incremental_equals_naive_on_corpus(spark, sf_dir):
    # real documents table (sf0.001 fixture): 32 merges, bit-equal to
    # the naive trainer — counts, order, tie-breaks
    from flink_tank_spark.io.tables import load_table

    words = bpe.seed_symbols(
        bpe.word_counts(load_table(spark, sf_dir, "documents"))
    ).persist()
    try:
        naive = bpe.train_merges(words, 32)
        inc = bpe.train_merges_incremental(words, 32, checkpoint_every=8)
        assert [(m.step, m.left, m.right, m.count) for m in inc] == [
            (m.step, m.left, m.right, m.count) for m in naive
        ]
    finally:
        words.unpersist()


def test_incremental_exhaustion_breaks_early(spark):
    # one single-letter word: seed is {a}{</w>} -> one pair, then none
    merges = _train_inc(spark, [("a", 3)], 5)
    assert [(m.left, m.right) for m in merges] == [("a", "</w>")]


def test_local_trainer_equals_naive_on_corpus(spark, sf_dir):
    from flink_tank_spark.io.tables import load_table

    words = bpe.seed_symbols(
        bpe.word_counts(load_table(spark, sf_dir, "documents"))
    ).persist()
    try:
        naive = bpe.train_merges(words, 48)
        auto = bpe.train_merges_auto(words, 48)
        assert [(m.step, m.left, m.right, m.count) for m in auto] == [
            (m.step, m.left, m.right, m.count) for m in naive
        ]
    finally:
        words.unpersist()


def test_local_trainer_greedy_overlap_and_ties(spark):
    # 'aaa': (a,a) count 2 (overlapping), greedy merge leaves {aa}{a};
    # next best is lexicographic min among remaining
    merges = bpe.train_merges_local([(["a", "a", "a", "</w>"], 10)], 3)
    assert [(m.left, m.right, m.count) for m in merges] == [
        ("a", "a", 20),
        ("a", "</w>", 10),
        ("aa", "a</w>", 10),
    ]


def test_auto_dispatches_to_distributed_above_limit(spark):
    df = spark.createDataFrame(
        [("ab", 3), ("bc", 2)], "word string, cnt long"
    )
    seeded = bpe.seed_symbols(df)
    # force the distributed path with a tiny limit
    dist = bpe.train_merges_auto(seeded, 4, driver_symbol_limit=1)
    naive = bpe.train_merges(seeded, 4)
    assert [(m.step, m.left, m.right, m.count) for m in dist] == [
        (m.step, m.left, m.right, m.count) for m in naive
    ]


def test_auto_distributed_path_is_unbatched_incremental(spark, monkeypatch):
    """BPE_SCALE_r14.json: the batched trainer lost its end-to-end A/B
    (0.72x at a 704k-pair dict — safe batches collapse on real Zipf
    heads) and the lazy-heap argmax removed the scan term that
    motivated it, so auto's distributed path must be the UNBATCHED
    incremental trainer at every dict size — pinned by spying."""
    df = spark.createDataFrame(
        [("ab", 3), ("bc", 2)], "word string, cnt long"
    )
    seeded = bpe.seed_symbols(df)
    calls = []
    real_inc = bpe.train_merges_incremental
    monkeypatch.setattr(
        bpe, "train_merges_incremental",
        lambda *a, **k: (calls.append("inc"), real_inc(*a, **k))[1],
    )
    monkeypatch.setattr(
        bpe, "train_merges_incremental_batched",
        lambda *a, **k: (_ for _ in ()).throw(
            AssertionError("auto must not pick the batched trainer")
        ),
    )
    naive = bpe.train_merges(seeded, 4)
    dist = bpe.train_merges_auto(seeded, 4, driver_symbol_limit=1)
    assert calls == ["inc"]
    assert _key(dist) == _key(naive)


def test_incremental_lazy_heap_bit_equals_scan(spark):
    """The lazy-deletion heap argmax must reproduce the full-dict scan
    argmax bit-for-bit — same merges, same counts, same tie-breaks —
    on a corpus with count collisions (ties exercise the (-cnt, l, r)
    heap-key order) and through pair-count oscillations (stale-entry
    skipping)."""
    corpus = [("newest", 6), ("widest", 3), ("low", 5), ("lower", 2),
              ("aaa", 4), ("abab", 4), ("baba", 4)]
    df = spark.createDataFrame(corpus, "word string, cnt long")
    seeded = bpe.seed_symbols(df).persist()
    try:
        heap = bpe.train_merges_incremental(seeded, 12, lazy_heap=True)
        scan = bpe.train_merges_incremental(seeded, 12, lazy_heap=False)
        assert _key(heap) == _key(scan)
        assert len(heap) > 6  # deep enough to exercise delta updates
    finally:
        seeded.unpersist()


def _key(ms):
    return [(m.step, m.left, m.right, m.count) for m in ms]


def test_batched_equals_naive_on_toy(spark):
    corpus = [("newest", 6), ("widest", 3), ("low", 5), ("lower", 2)]
    naive = _train(spark, corpus, 6)
    df = spark.createDataFrame(corpus, "word string, cnt long")
    batched = bpe.train_merges_incremental_batched(
        bpe.seed_symbols(df), 6, checkpoint_every=4, max_batch=8
    )
    assert _key(batched) == _key(naive)


def test_batched_tie_hole_regression(spark):
    """Merging ("a","z") mints ("az","b") whose count TIES a disjoint
    accepted pair ("c","c") while sorting lexicographically earlier —
    the exact case where a contiguous-disjoint-prefix batch WITHOUT the
    strict count truncation diverges from sequential argmax."""
    corpus = [("azb", 50), ("az", 50), ("cc", 50)]
    naive = _train(spark, corpus, 5)
    df = spark.createDataFrame(corpus, "word string, cnt long")
    batched = bpe.train_merges_incremental_batched(
        bpe.seed_symbols(df), 5, checkpoint_every=8, max_batch=8
    )
    assert _key(batched) == _key(naive)


def test_batched_equals_naive_on_corpus(spark, sf_dir):
    from flink_tank_spark.io.tables import load_table

    words = bpe.seed_symbols(
        bpe.word_counts(load_table(spark, sf_dir, "documents"))
    ).persist()
    try:
        naive = bpe.train_merges(words, 32)
        for mb in (1, 16):  # mb=1 degenerates to the per-merge trainer
            batched = bpe.train_merges_incremental_batched(
                words, 32, checkpoint_every=16, max_batch=mb
            )
            assert _key(batched) == _key(naive), f"max_batch={mb}"
    finally:
        words.unpersist()


def test_batched_exhaustion_breaks_early(spark):
    df = spark.createDataFrame([("a", 3)], "word string, cnt long")
    merges = bpe.train_merges_incremental_batched(bpe.seed_symbols(df), 5)
    assert [(m.left, m.right) for m in merges] == [("a", "</w>")]


def test_batched_equals_local_on_random_corpora(spark):
    """Property sweep: random small corpora, batched-vs-local bit
    equality (local is itself pinned to naive) — exercises ties,
    collisions, and exhaustion paths the fixtures may miss."""
    import random

    rng = random.Random(13)
    for trial in range(4):
        n_words = rng.randint(4, 10)
        corpus = []
        for _ in range(n_words):
            w = "".join(rng.choice("abcz") for _ in range(rng.randint(1, 6)))
            corpus.append((w, rng.randint(1, 8)))
        # collapse duplicate words (word_counts would have)
        agg = {}
        for w, c in corpus:
            agg[w] = agg.get(w, 0) + c
        corpus = sorted(agg.items())
        df = spark.createDataFrame(corpus, "word string, cnt long")
        seeded = bpe.seed_symbols(df)
        local = bpe.train_merges_local(
            [(list(w) + ["</w>"], c) for w, c in corpus], 12
        )
        batched = bpe.train_merges_incremental_batched(
            seeded, 12, checkpoint_every=6, max_batch=4
        )
        assert _key(batched) == _key(local), (trial, corpus)
