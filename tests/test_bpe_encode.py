"""bpe_encode (B154): certified merge-list replay on unseen text.

The load-bearing claim (argued in apply_merges_to_words' docstring):
rank-ordered whole-symbol replace passes ≡ the classic
lowest-rank-first bpe() loop (encode_word — the core the B54 Arrow
encoder memoizes). These tests pin it word-for-word on trained
merges, on adversarial self-overlapping merges, and end-to-end on
held-out text.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from nass_summary_spark.operators.bpe import (
    SYM_SEP,
    apply_merges_to_words,
    bpe_encode_replay,
    bpe_train_distributed,
    encode_word,
)


def _seg_map(spark, words, merges):
    vocab = spark.createDataFrame([(w,) for w in words], "word string")
    return {
        r["word"]: (r["seg"], r["n_tokens"])
        for r in apply_merges_to_words(vocab, merges).collect()
    }


def test_replay_matches_classic_loop_on_trained_merges(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    train = docs.where(F.col("source") != "src0")
    merges = [
        (r["pair_left"], r["pair_right"])
        for r in bpe_train_distributed(train, "text", n_merges=10)
        .orderBy("rank")
        .collect()
    ]
    assert len(merges) == 10
    ranks = {p: i for i, p in enumerate(merges)}
    # held-out vocabulary: words the trainer never saw included
    unseen = [
        r["word"]
        for r in docs.where(F.col("source") == "src0")
        .select(
            F.explode(
                F.split(F.lower("text"), "[^a-z]+")
            ).alias("word")
        )
        .where(F.col("word").rlike("^[a-z]{2,}$"))
        .distinct()
        .collect()
    ]
    unseen += ["zzzqx", "tablescan", "aggregation"]  # guaranteed-unseen
    got = _seg_map(spark, unseen, merges)
    for w in unseen:
        want = encode_word(w, ranks, use_eow=False)
        seg, ntok = got[w]
        assert seg.split(SYM_SEP) == want, (w, seg, want)
        assert ntok == len(want)
        assert "".join(want) == w  # round-trip


def test_replay_matches_classic_loop_self_overlap(spark):
    # (a,a) then (aa,aa): the overlap cases where one-at-a-time and
    # single-pass scans could plausibly diverge
    merges = [("a", "a"), ("aa", "aa"), ("aa", "b")]
    ranks = {p: i for i, p in enumerate(merges)}
    words = ["aa", "aaa", "aaaa", "aaaaa", "aab", "aaab", "baaaab"]
    got = _seg_map(spark, words, merges)
    for w in words:
        want = encode_word(w, ranks, use_eow=False)
        assert got[w][0].split(SYM_SEP) == want, (w, got[w][0], want)


def test_replay_late_merge_does_not_unlock_early_merge(spark):
    # r1 creates 'ab'; r2 consumes it; r3 is ('x','c') — a pair that
    # never newly appears after later merges (the invariant the
    # rank-order equivalence rests on)
    merges = [("a", "b"), ("c", "ab"), ("x", "c")]
    ranks = {p: i for i, p in enumerate(merges)}
    for w in ["xcab", "xcabxcab", "cabx"]:
        got = _seg_map(spark, [w], merges)[w][0].split(SYM_SEP)
        assert got == encode_word(w, ranks, use_eow=False)


def test_encode_replay_totals(spark):
    docs = spark.createDataFrame(
        [(1, "aa bb aa cc"), (2, "aa aa"), (3, "zz")],
        "doc_id int, text string",
    )
    merges = [("a", "a")]
    out = {
        r["doc_id"]: r
        for r in bpe_encode_replay(docs, "doc_id", "text", merges).collect()
    }
    assert out[1]["n_words"] == 4 and out[1]["n_chars"] == 8
    # 'aa' -> 1 token, 'bb'/'cc' -> 2 tokens each
    assert out[1]["n_tokens"] == 1 + 2 + 1 + 2
    assert out[2]["n_tokens"] == 2 and out[2]["tokens_per_word"] == 1.0
    assert out[3]["n_tokens"] == 2  # unseen word falls back to chars
