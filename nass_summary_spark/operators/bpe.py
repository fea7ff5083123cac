"""Byte-pair-encoding vocabulary induction and encoding (Sennrich et
al. 2016; the GPT-2/sentencepiece training shape) as a distributed
pipeline stage.

The scale decomposition every real BPE trainer uses: the corpus-wide
work is ONE word-count aggregation (tokens shuffle once as (word,
count) partials — partial aggregation makes the exchange
vocabulary-sized, not corpus-sized); the merge loop then runs over
the *word-frequency table*, which is capped (``max_words``) exactly
like HF tokenizers' / sentencepiece's frequency-table training — a
bounded model artifact, not data.  The trained merge list is then a
broadcast model: encoding is an Arrow-batched map stage with
per-executor word→tokens memoization (real corpora repeat words;
the memo hit rate is the Zipf mass).

No SQL oracle exists for the merge loop (iterative, order-dependent)
— the demo query is rows-only; correctness is pinned by property
tests instead: round-trip (concatenating a word's tokens restores the
word), prefix-determinism (same input → same merges), and the
monotone token-count bound (encoded length ≤ character length).
"""

from __future__ import annotations

from typing import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StructField,
    StructType,
)

from nass_summary_spark.functions.text import words

EOW = "\x00"  # end-of-word sentinel: words are whitespace-split, NUL never survives


def word_counts(df: DataFrame, text_col: str, max_words: int) -> list[tuple[str, int]]:
    """Corpus word-frequency table, capped to the ``max_words`` most
    frequent (count desc, word asc — deterministic).  The single
    corpus-wide shuffle of the whole trainer."""
    wc = (
        df.select(F.explode(words(F.col(text_col))).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("c"))
        .orderBy(F.col("c").desc(), F.col("w").asc())
        .limit(max_words)
        .collect()
    )
    return [(r["w"], r["c"]) for r in wc]


def bpe_train(
    df: DataFrame,
    text_col: str,
    n_merges: int = 200,
    max_words: int = 10000,
) -> list[tuple[str, str]]:
    """Learn ``n_merges`` BPE merges from the capped word-frequency
    table.  Ties in pair frequency break lexicographically so the
    merge list is a pure function of the table."""
    vocab: dict[tuple[str, ...], int] = {}
    for w, c in word_counts(df, text_col, max_words):
        vocab[tuple(w) + (EOW,)] = c

    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pairs: dict[tuple[str, str], int] = {}
        for sym, c in vocab.items():
            for a, b in zip(sym, sym[1:]):
                pairs[(a, b)] = pairs.get((a, b), 0) + c
        if not pairs:
            break
        best = max(pairs.items(), key=lambda kv: (kv[1], kv[0][0], kv[0][1]))
        if best[1] < 2:
            break
        (a, b), _ = best
        merges.append((a, b))
        merged = a + b
        new_vocab: dict[tuple[str, ...], int] = {}
        for sym, c in vocab.items():
            out: list[str] = []
            i = 0
            while i < len(sym):
                if i + 1 < len(sym) and sym[i] == a and sym[i + 1] == b:
                    out.append(merged)
                    i += 2
                else:
                    out.append(sym[i])
                    i += 1
            new_vocab[tuple(out)] = new_vocab.get(tuple(out), 0) + c
        vocab = new_vocab
    return merges


def encode_word(
    word: str,
    ranks: dict[tuple[str, str], int],
    use_eow: bool = True,
) -> list[str]:
    """Apply merges in rank order to one word (GPT-2 ``bpe()``
    loop). ``use_eow=False`` runs the loop over the bare character
    sequence — the alphabet :func:`bpe_train_distributed` trains on
    (its wrapped-symbol words carry no end-of-word sentinel)."""
    sym = list(word) + ([EOW] if use_eow else [])
    while len(sym) > 1:
        best_rank = None
        best_i = -1
        for i, pair in enumerate(zip(sym, sym[1:])):
            r = ranks.get(pair)
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_rank is None:
            break
        sym[best_i : best_i + 2] = [sym[best_i] + sym[best_i + 1]]
    return sym


_ENC_SCHEMA_FIELDS = [
    StructField("n_words", LongType(), False),
    StructField("n_bpe_tokens", LongType(), False),
    StructField("n_unique_tokens", IntegerType(), False),
]


def bpe_encode(
    df: DataFrame,
    id_col: str,
    text_col: str,
    merges: list[tuple[str, str]],
) -> DataFrame:
    """Encode every document with the broadcast merge list: emits
    (id, n_words, n_bpe_tokens, n_unique_tokens).  Arrow-batched
    ``mapInPandas``; a per-executor word→len memo turns the Zipf head
    into dictionary hits so the per-token Python cost amortizes away.

    Tokenization happens JVM-side with the SAME :func:`words` column
    function the trainer's :func:`word_counts` uses — the Python stage
    only consumes the pre-split array.  (A Python ``.lower().split()``
    here would segment differently on Unicode whitespace such as NBSP
    — Java ``\\s+`` is ASCII-only — and locale-sensitive case
    mappings, silently diverging from the trained vocabulary and from
    ``whitespace_token_count``.)
    """
    id_field = df.select(id_col).schema.fields[0]
    schema = StructType([id_field] + _ENC_SCHEMA_FIELDS)
    ranks = {pair: i for i, pair in enumerate(merges)}

    def encode(batches: Iterator["pandas.DataFrame"]) -> Iterator["pandas.DataFrame"]:  # noqa: F821
        import pandas as pd

        memo: dict[str, list[str]] = {}

        def enc(w: str) -> list[str]:
            got = memo.get(w)
            if got is None:
                got = memo[w] = encode_word(w, ranks)
            return got

        for b in batches:
            rows = []
            for rid, ws in zip(b[id_col], b["__words"]):
                toks: list[str] = []
                for w in ws:
                    toks.extend(enc(w))
                rows.append((rid, len(ws), len(toks), len(set(toks))))
            yield pd.DataFrame(
                rows, columns=[id_col, "n_words", "n_bpe_tokens", "n_unique_tokens"]
            )

    pre_split = df.select(id_col, words(F.col(text_col)).alias("__words"))
    return pre_split.mapInPandas(encode, schema)


# ---------------------------------------------------------------------------
# Distributed merge training (B136): the merge loop as DataFrame ops
# ---------------------------------------------------------------------------

#: symbol wrapper for the distributed trainer: each symbol renders as
#: ``|sym|`` and a word is the concatenation of its wrapped symbols
#: (``"ab" -> "|a||b|"``). The double separator makes string
#: ``replace('|a||b|', '|ab|')`` EXACTLY the greedy left-to-right BPE
#: merge scan: a match must span whole symbols (both sides anchored
#: at wrappers), and non-overlapping replacement consumes pairs the
#: same way the classic pointer walk does. Words are restricted to
#: ``[a-z]{2,}`` so the wrapper char never collides.
SYM_SEP = "|"
WORD_RE = "^[a-z]{2,}$"


def _wrapped_words(df: DataFrame, text_col: str) -> DataFrame:
    """Word-frequency table with wrapped-symbol rendering:
    ``(w, c)`` where w = ``|c1||c2|...|ck|``. ONE corpus-wide
    combinable shuffle; everything after is vocabulary-sized."""
    toks = df.select(
        F.explode(
            F.split(F.lower(F.col(text_col)), "[^a-z]+")
        ).alias("word")
    ).where(F.col("word").rlike(WORD_RE))
    return (
        toks.groupBy("word")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
        .select(
            F.concat(
                F.lit(SYM_SEP),
                F.concat_ws(SYM_SEP * 2, F.split("word", "")),
                F.lit(SYM_SEP),
            ).alias("w"),
            "c",
        )
    )


def bpe_train_distributed(
    df: DataFrame,
    text_col: str,
    n_merges: int = 12,
) -> DataFrame:
    """Learn ``n_merges`` BPE merges with the merge loop itself as
    DataFrame operations — unlike :func:`bpe_train` (which collects
    the word table to the driver), the vocabulary here stays
    distributed: per-iteration pair counts are one combinable
    aggregation over the word table, the argmax pair is the only
    driver-side scalar (count desc, left asc, right asc — fully
    deterministic), and the merge applies as a literal
    whole-symbol ``replace`` column expression.

    Scale shape: the corpus is touched ONCE (word histogram); each
    of the ``n_merges`` iterations shuffles only the vocabulary-sized
    pair relation. The word table persists up front, so iteration k
    replays k cheap string replaces over the vocabulary, never the
    corpus. Ties and greedy-scan semantics are exactly replayable in
    SQL (:func:`bpe_merge_oracle_ctes`), so the trained merge table
    carries a FULL oracle.

    Returns ``(rank, pair_left, pair_right, merged, pair_count)``.
    """
    from nass_summary_spark.functions.smalldf import local_struct_df

    spark = df.sparkSession
    words_df = _wrapped_words(df, text_col).persist()
    merges, _ = _merge_loop(words_df, n_merges)
    return local_struct_df(
        spark,
        "rank int, pair_left string, pair_right string,"
        " merged string, pair_count bigint",
        merges,
    )


def _merge_loop(
    words_df: DataFrame, n_merges: int
) -> tuple[list[tuple], DataFrame]:
    """The shared merge loop: returns the learned merges AND the
    final rewritten vocabulary (each word's segmentation under the
    learned merges — the apply-side artifact)."""
    sep2 = SYM_SEP * 2
    merges: list[tuple] = []
    for k in range(1, n_merges + 1):
        syms = F.split(
            F.expr("substring(w, 2, length(w) - 2)"), "\\|\\|"
        ).alias("s")
        pairs = (
            words_df.select(syms, "c")
            .select(
                F.explode(
                    F.expr(
                        "transform(slice(s, 1, size(s) - 1),"
                        " (x, i) -> struct(x AS l,"
                        " element_at(s, i + 2) AS r))"
                    )
                ).alias("p"),
                "c",
            )
            .groupBy("p.l", "p.r")
            .agg(F.sum("c").alias("pc"))
        )
        best = pairs.orderBy(
            F.col("pc").desc(), F.col("l").asc(), F.col("r").asc()
        ).limit(1).collect()
        if not best or best[0]["pc"] < 2:
            break
        l, r, pc = best[0]["l"], best[0]["r"], int(best[0]["pc"])
        merges.append((k, l, r, l + r, pc))
        pat = f"{SYM_SEP}{l}{sep2}{r}{SYM_SEP}"
        rep = f"{SYM_SEP}{l}{r}{SYM_SEP}"
        words_df = words_df.select(
            F.expr(
                "replace(w, "
                f"'{pat}', '{rep}')"
            ).alias("w"),
            "c",
        )
    return merges, words_df


def bpe_segment_stats(
    df: DataFrame,
    text_col: str,
    key_col: str,
    n_merges: int = 12,
) -> DataFrame:
    """Train-then-apply composite: learn ``n_merges`` merges on the
    whole corpus (:func:`bpe_train_distributed`'s loop), then score
    each ``key_col`` group's compression under the learned
    vocabulary — tokens/word and tokens/char per group. The fertility
    readout a tokenizer-budget decision actually needs: a source
    whose tokens-per-word stays near chars-per-word is paying full
    character price (out-of-distribution for the learned merges).

    The apply side is a JOIN, not a re-scan: the loop's final
    vocabulary IS each word's segmentation, so per-group stats come
    from (group, word) counts joined to the broadcast word →
    token-count map. Exact integer sums; two closing divisions.
    """
    words_df = _wrapped_words(df, text_col).persist()
    _, final = _merge_loop(words_df, n_merges)
    seg = final.select(
        F.expr("replace(w, '|', '')").alias("word"),
        F.size(
            F.split(F.expr("substring(w, 2, length(w) - 2)"), "\\|\\|")
        ).cast("bigint").alias("__ntok"),
    )
    per_key = (
        df.select(
            key_col,
            F.explode(
                F.split(F.lower(F.col(text_col)), "[^a-z]+")
            ).alias("word"),
        )
        .where(F.col("word").rlike(WORD_RE))
        .groupBy(key_col, "word")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    )
    j = per_key.join(F.broadcast(seg), "word")
    agg = j.groupBy(key_col).agg(
        F.sum("cnt").alias("n_words"),
        F.sum(F.col("cnt") * F.col("__ntok")).alias("n_tokens"),
        F.sum(F.col("cnt") * F.length("word").cast("bigint")).alias(
            "n_chars"
        ),
    )
    return agg.select(
        key_col,
        "n_words",
        "n_tokens",
        "n_chars",
        F.round(
            F.col("n_tokens").cast("double")
            / F.col("n_words").cast("double"),
            6,
        ).alias("tokens_per_word"),
        F.round(
            F.col("n_tokens").cast("double")
            / F.col("n_chars").cast("double"),
            6,
        ).alias("compression_ratio"),
    ).orderBy(key_col)


def bpe_merge_oracle_ctes(n_merges: int, docs_rel: str = "documents") -> str:
    """DuckDB replay of :func:`bpe_train_distributed` as a chained
    CTE (the label_propagation_oracle_ctes device): level k derives
    pair counts from w{k-1}, picks the same (count desc, left, right)
    argmax, and rewrites the vocabulary with the same whole-symbol
    replace. Returns the full ``WITH ... SELECT`` statement."""
    # w{k} is referenced TWICE per level (pair counts + rewrite):
    # without MATERIALIZED, inlining doubles the plan per level and
    # the parquet scan replicates 2^n times (observed as an
    # fd-exhaustion IOException at n=12)
    parts = [
        f"""w0 AS MATERIALIZED (
      SELECT '|' || array_to_string(string_split(word, ''), '||')
               || '|' AS w,
             CAST(COUNT(*) AS BIGINT) AS c
      FROM (
        SELECT unnest(string_split_regex(lower(text), '[^a-z]+')) AS word
        FROM {docs_rel}
      ) WHERE regexp_matches(word, '{WORD_RE}')
      GROUP BY 1
    )"""
    ]
    for k in range(1, int(n_merges) + 1):
        parts.append(
            f"""pc{k} AS (
      SELECT s[i] AS l, s[i + 1] AS r, CAST(SUM(c) AS BIGINT) AS pc
      FROM (SELECT string_split(trim(w, '|'), '||') AS s, c
            FROM w{k - 1})
      CROSS JOIN unnest(range(1, len(s))) AS u(i)
      GROUP BY 1, 2
    ),
    b{k} AS (
      SELECT l, r, pc FROM pc{k}
      ORDER BY pc DESC, l ASC, r ASC LIMIT 1
    ),
    w{k} AS MATERIALIZED (
      SELECT replace(w,
               '|' || (SELECT l FROM b{k}) || '||'
                   || (SELECT r FROM b{k}) || '|',
               '|' || (SELECT l FROM b{k})
                   || (SELECT r FROM b{k}) || '|') AS w, c
      FROM w{k - 1}
    )"""
        )
    finals = "\n      UNION ALL ".join(
        f"SELECT {k} AS rank, l AS pair_left, r AS pair_right,"
        f" l || r AS merged, pc AS pair_count FROM b{k}"
        for k in range(1, int(n_merges) + 1)
    )
    return (
        "WITH "
        + ",\n    ".join(parts)
        + f"\n    SELECT * FROM ({finals}) ORDER BY rank"
    )


def bpe_segment_oracle(
    n_merges: int, key_col: str, docs_rel: str = "documents"
) -> str:
    """DuckDB replay of :func:`bpe_segment_stats`: re-learn the
    merges with the same chained CTE, then read each word's token
    count off the FINAL vocabulary and join per-key word counts."""
    chain = bpe_merge_oracle_ctes(n_merges, docs_rel)
    chain = chain[: chain.rindex("\n    SELECT * FROM")]
    return (
        chain
        + f""",
    seg AS (
      SELECT replace(w, '|', '') AS word,
             CAST(len(string_split(trim(w, '|'), '||')) AS BIGINT)
               AS ntok
      FROM w{int(n_merges)}
    ),
    pk AS (
      SELECT {key_col}, word, CAST(COUNT(*) AS BIGINT) AS cnt
      FROM (
        SELECT {key_col},
               unnest(string_split_regex(lower(text), '[^a-z]+')) AS word
        FROM {docs_rel}
      ) WHERE regexp_matches(word, '{WORD_RE}')
      GROUP BY 1, 2
    ),
    st AS (
      SELECT {key_col},
        CAST(SUM(cnt) AS BIGINT) AS n_words,
        CAST(SUM(cnt * ntok) AS BIGINT) AS n_tokens,
        CAST(SUM(cnt * length(word)) AS BIGINT) AS n_chars
      FROM pk JOIN seg USING (word)
      GROUP BY 1
    )
    SELECT {key_col}, n_words, n_tokens, n_chars,
      ROUND(CAST(n_tokens AS DOUBLE) / CAST(n_words AS DOUBLE), 6)
        AS tokens_per_word,
      ROUND(CAST(n_tokens AS DOUBLE) / CAST(n_chars AS DOUBLE), 6)
        AS compression_ratio
    FROM st ORDER BY {key_col}"""
    )


# ---------------------------------------------------------------------------
# Certified corpus-scale encode (B154): merge-list replay on unseen text
# ---------------------------------------------------------------------------

def apply_merges_to_words(
    vocab: DataFrame,
    merges: list[tuple[str, str]],
    word_col: str = "word",
) -> DataFrame:
    """Segment every word of a (distinct) word relation under a
    TRAINED merge list, as rank-ordered whole-symbol ``replace``
    passes over the ``|sym|`` wrapped rendering — the same device
    the distributed trainer rewrites its vocabulary with, now run on
    words the trainer may never have seen (the corpus-scale encode
    path the rows-only B54 Arrow encoder serves; this one is pure
    JVM string expressions and exactly SQL-replayable).

    Equivalence to the classic lowest-rank-first ``bpe()`` loop
    (:func:`encode_word` with ``use_eow=False``): applying merges in
    rank order with one left-to-right non-overlapping pass each IS
    the classic loop, because a pass can only create pairs involving
    its newly merged symbol, and any RANKED pair containing merge
    k's symbol was necessarily learned after rank k — so no
    lower-rank opportunity ever appears behind the cursor. Pinned
    word-for-word against :func:`encode_word` in tests.

    Scale shape: ``n_merges`` chained ``replace`` projections over
    the DISTINCT word relation (vocabulary-sized — the Zipf memo in
    relational form), one whole-stage-codegen stage, no shuffle.
    Output: ``(word, seg, n_tokens)`` where ``seg`` joins the
    word's tokens with '|'.
    """
    sep2 = SYM_SEP * 2
    w = F.concat(
        F.lit(SYM_SEP),
        F.concat_ws(sep2, F.split(F.col(word_col), "")),
        F.lit(SYM_SEP),
    )
    for l, r in merges:
        w = F.replace(
            w,
            F.lit(f"{SYM_SEP}{l}{sep2}{r}{SYM_SEP}"),
            F.lit(f"{SYM_SEP}{l}{r}{SYM_SEP}"),
        )
    toks = F.split(F.expr("substring(__w, 2, length(__w) - 2)"), "\\|\\|")
    return (
        vocab.select(word_col, w.alias("__w"))
        .select(
            word_col,
            F.array_join(toks, SYM_SEP).alias("seg"),
            F.size(toks).cast("bigint").alias("n_tokens"),
        )
    )


def bpe_encode_replay(
    df: DataFrame,
    id_col: str,
    text_col: str,
    merges: list[tuple[str, str]],
) -> DataFrame:
    """Per-document BPE encoding stats under a trained merge list,
    via :func:`apply_merges_to_words` on the corpus' distinct words
    joined back to per-(id, word) counts — the corpus is scanned
    once for the word histogram; the merge replay runs over the
    vocabulary only; the broadcast segmentation join never shuffles
    facts. Tokenization domain matches the trainer
    (lower, ``[^a-z]+`` split, ``[a-z]{2,}`` words). Output:
    ``(id, n_words, n_tokens, n_chars, tokens_per_word)``."""
    # the (id, word) histogram feeds the distinct-word replay AND
    # the segmentation join — persist it or both branches replay the
    # corpus explode (the r9 plan-audit lesson)
    per_doc = (
        df.select(
            id_col,
            F.explode(
                F.split(F.lower(F.col(text_col)), "[^a-z]+")
            ).alias("word"),
        )
        .where(F.col("word").rlike(WORD_RE))
        .groupBy(id_col, "word")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
        .persist()
    )
    seg = apply_merges_to_words(
        per_doc.select("word").distinct(), merges
    )
    j = per_doc.join(F.broadcast(seg), "word")
    agg = j.groupBy(id_col).agg(
        F.sum("cnt").alias("n_words"),
        F.sum(F.col("cnt") * F.col("n_tokens")).alias("n_tokens"),
        F.sum(
            F.col("cnt") * F.length("word").cast("bigint")
        ).alias("n_chars"),
    )
    return agg.select(
        id_col,
        "n_words",
        "n_tokens",
        "n_chars",
        F.round(
            F.col("n_tokens").cast("double")
            / F.col("n_words").cast("double"),
            6,
        ).alias("tokens_per_word"),
    )
