"""Named quality-filter rule battery (Gopher/MassiveText rules).

The reference pipeline filters rows by suppression markers
(``nass.sql:75`` drops ``(D)``/``(NA)``/``(S)``); the training-data
analogue is the published MassiveText document-filter battery
(Rae et al. 2021, "Scaling Language Models: ... Gopher", App. A1.1):
fixed, auditable per-document rules rather than a learned score
(that is B50/B106 ``quality_classifier``). This module is the
rule-battery side: every rule is a named boolean so a curation run
can report WHICH rule dropped a document — the audit question a
single keep-score cannot answer.

Design constraints (house conventions):

- **Integer-exact decisions.** Every threshold is evaluated as
  integer arithmetic (``5*n_alpha >= 4*n_words``), never as a float
  ratio compared to a float literal — so no FP boundary can disagree
  between Spark and the DuckDB oracle, and the flags are
  reproducible bit-for-bit at any partitioning.
- **Map-only.** All features are higher-order-function projections
  over the per-document words array — no UDF, no explode, no
  shuffle. At 100 TB this is a pure scan stage that pipelines into
  whatever consumes the flags.
- **Bounded per-doc cost.** The repetition feature (count of the
  most frequent word) is O(distinct_words × words) per document via
  ``array_distinct`` + ``filter`` — quadratic only in the per-doc
  vocabulary, which is bounded (and tiny relative to I/O); the
  alternative (explode + groupBy) would shuffle the full token
  stream.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from nass_summary_spark.functions.text import words

#: The Gopher stop-word battery (Rae et al. 2021 App. A1.1): a doc
#: must contain at least MIN_STOPWORD_HITS occurrences drawn from
#: this fixed 8-word list.
GOPHER_STOPWORDS: tuple[str, ...] = (
    "the", "be", "to", "of", "and", "that", "have", "with",
)

#: Rule thresholds — (name, value) pairs kept as integers so both
#: engines compare exactly. Word-count bounds follow the paper;
#: ratio thresholds are expressed as exact rationals below.
MIN_WORDS = 50
MAX_WORDS = 100_000
MIN_MEAN_WORD_LEN = 3  # chars per word, inclusive lower bound
MAX_MEAN_WORD_LEN = 10
MIN_STOPWORD_HITS = 2

#: Symbol pattern counted for the symbol-to-word ratio rule
#: (hash marks and ellipses, per the paper).
SYMBOL_RE = r"#|\.\.\."


def gopher_features(text: Column | str) -> dict[str, Column]:
    """Integer feature columns the rule battery is decided on.

    All are exact BIGINT counts derived from the lower-cased
    whitespace word array (``functions.text.words``), mirrored
    one-for-one by the DuckDB oracle fragments in
    ``plans/queries.py``.
    """
    t = F.col(text) if isinstance(text, str) else text
    ws = words(t)
    n_words = F.size(ws).cast("bigint")
    sum_word_chars = F.aggregate(
        ws, F.lit(0).cast("bigint"), lambda acc, w: acc + F.length(w)
    )
    stop_arr = F.array(*[F.lit(s) for s in GOPHER_STOPWORDS])
    n_stop = F.size(F.filter(ws, lambda w: F.array_contains(stop_arr, w))).cast(
        "bigint"
    )
    n_alpha_words = F.size(F.filter(ws, lambda w: w.rlike("[a-z]"))).cast("bigint")
    n_symbols = F.regexp_count(t, F.lit(SYMBOL_RE)).cast("bigint")
    # count of the most frequent word: per-doc HOF, no shuffle
    max_word_count = F.coalesce(
        F.array_max(
            F.transform(
                F.array_distinct(ws),
                lambda d: F.size(F.filter(ws, lambda w: w == d)),
            )
        ),
        F.lit(0),
    ).cast("bigint")
    return {
        "n_words": n_words,
        "sum_word_chars": sum_word_chars,
        "n_stop": n_stop,
        "n_alpha_words": n_alpha_words,
        "n_symbols": n_symbols,
        "max_word_count": max_word_count,
    }


def gopher_rules(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Attach the named rule flags + overall ``keep`` to every row.

    Rules (each an exact integer comparison):

    - ``word_count_ok``:     MIN_WORDS ≤ n_words ≤ MAX_WORDS
    - ``mean_word_len_ok``:  3 ≤ sum_word_chars / n_words ≤ 10,
      evaluated as ``3·n ≤ chars ≤ 10·n``
    - ``symbol_ratio_ok``:   symbols / n_words ≤ 0.1 → ``10·sym ≤ n``
    - ``alpha_word_ok``:     ≥80% of words contain a letter →
      ``5·alpha ≥ 4·n``
    - ``stopword_ok``:       ≥2 hits from the 8-word Gopher list
    - ``repetition_ok``:     most frequent word ≤ 10% of tokens →
      ``10·max_count ≤ n``
    - ``keep``: conjunction of all six.
    """
    f = gopher_features(text_col)
    n = f["n_words"]
    flags = {
        "word_count_ok": (n >= MIN_WORDS) & (n <= MAX_WORDS),
        "mean_word_len_ok": (
            (F.lit(MIN_MEAN_WORD_LEN) * n <= f["sum_word_chars"])
            & (f["sum_word_chars"] <= F.lit(MAX_MEAN_WORD_LEN) * n)
        ),
        "symbol_ratio_ok": F.lit(10) * f["n_symbols"] <= n,
        "alpha_word_ok": F.lit(5) * f["n_alpha_words"] >= F.lit(4) * n,
        "stopword_ok": f["n_stop"] >= MIN_STOPWORD_HITS,
        "repetition_ok": F.lit(10) * f["max_word_count"] <= n,
    }
    keep = None
    for c in flags.values():
        keep = c if keep is None else keep & c
    return df.select(
        id_col,
        f["n_words"].alias("n_words"),
        f["n_stop"].alias("n_stop"),
        f["max_word_count"].alias("max_word_count"),
        *[c.alias(name) for name, c in flags.items()],
        keep.alias("keep"),
    )


#: sentence boundary: one-or-more terminal marks (optionally
#: followed by closing quotes/brackets) — shared with the oracle.
SENTENCE_SPLIT_RE = r"[.!?]+[\"')\]]*"


def sentence_stats(
    df: DataFrame,
    text_col: str,
    id_col: str,
    round_to: int = 6,
) -> DataFrame:
    """Per-document sentence segmentation statistics — the
    sentence-grain layer under the word-grain Gopher rules (B112):
    run-on text (no terminal punctuation), chopped boilerplate (tiny
    "sentences"), and list-like pages (huge ones) all show up here
    before any model-based scorer runs.

    Split on terminal-punctuation runs (shared regexp constant),
    trim, drop empties; word counts by whitespace split. Map-only
    HOF/regexp projection — scan-stage at any scale, and every
    number is integer arithmetic plus one closing division, so the
    demo carries a FULL oracle.

    Output: ``(id, n_sentences, n_sentence_words,
    avg_sentence_words, max_sentence_words, ends_terminal)``.
    """
    def ws_trim(c):
        # trim() strips only spaces on both engines; sentences need
        # full whitespace trimming (\n, \t) or word counts pick up
        # empty tokens
        return F.regexp_replace(
            F.regexp_replace(c, r"^\s+", ""), r"\s+$", ""
        )

    t = ws_trim(F.coalesce(F.col(text_col), F.lit("")))
    sents = F.filter(
        F.transform(F.split(t, SENTENCE_SPLIT_RE), ws_trim),
        lambda s: F.length(s) > 0,
    )
    wc = F.transform(
        sents, lambda s: F.size(F.split(s, r"\s+"))
    )
    n_sent = F.size(sents).cast("bigint")
    n_words = F.aggregate(
        wc, F.lit(0).cast("bigint"), lambda a, x: a + x
    )
    max_words = F.array_max(F.concat(F.array(F.lit(0)), wc)).cast(
        "bigint"
    )
    ends = t.rlike(SENTENCE_SPLIT_RE + "$").cast("int")
    return df.select(
        id_col,
        n_sent.alias("n_sentences"),
        n_words.alias("n_sentence_words"),
        F.round(
            F.when(
                n_sent > 0,
                n_words.cast("double") / n_sent.cast("double"),
            ),
            round_to,
        ).alias("avg_sentence_words"),
        max_words.alias("max_sentence_words"),
        ends.alias("ends_terminal"),
    )


def sentence_stats_oracle_sql(
    source_sql: str, id_sql: str, text_sql: str
) -> str:
    """DuckDB replay of :func:`sentence_stats`."""
    pat = SENTENCE_SPLIT_RE.replace("'", "''")

    def ws_trim(expr):
        return (
            f"regexp_replace(regexp_replace({expr},"
            r" '^\s+', ''), '\s+$', '')"
        )

    t = ws_trim(f"COALESCE({text_sql}, '')")
    sents = (
        f"list_filter(list_transform(string_split_regex({t},"
        f" '{pat}'), s -> {ws_trim('s')}),"
        " s -> length(s) > 0)"
    )
    return f"""
    WITH b AS (
      SELECT {id_sql} AS __id, {t} AS t, {sents} AS sents
      FROM {source_sql}
    ),
    w AS (
      SELECT __id, t, len(sents) AS n_sent,
        list_transform(sents,
                       s -> len(string_split_regex(s, '\\s+'))) AS wc
      FROM b
    )
    SELECT __id AS {id_sql},
      CAST(n_sent AS BIGINT) AS n_sentences,
      CAST(COALESCE(list_sum(wc), 0) AS BIGINT) AS n_sentence_words,
      ROUND(CASE WHEN n_sent > 0
        THEN CAST(COALESCE(list_sum(wc), 0) AS DOUBLE)
             / CAST(n_sent AS DOUBLE) END, 6) AS avg_sentence_words,
      CAST(COALESCE(list_max(wc), 0) AS BIGINT) AS max_sentence_words,
      CASE WHEN regexp_matches(t, '{pat}$')
           THEN 1 ELSE 0 END AS ends_terminal
    FROM w
    """
