"""Text-analysis column functions for the training-data pipeline
block (SURVEY.md §2 B8–B11).

All pure Spark SQL expressions (codegen, no Python UDFs): at 100 TB
these run per-document in the scan stage, so they must stay JVM-side.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: Tiny per-language stopword sets for the n-gram/stopword language-ID
#: heuristic. Deliberately small and deterministic so the DuckDB
#: oracle can mirror them as IN-lists.
LANG_STOPWORDS: dict[str, list[str]] = {
    "en": ["the", "a", "of", "and", "to", "in", "is", "that", "it", "for"],
    "es": ["el", "la", "de", "y", "que", "en", "los", "del", "se", "las"],
    "fr": ["le", "la", "de", "et", "les", "des", "un", "une", "du", "est"],
    "de": ["der", "die", "das", "und", "zu", "den", "von", "mit", "ist", "im"],
    "zh": ["的", "了", "是", "在", "我", "有", "和", "就", "不", "人"],
}

#: A BPE-ish tokenizer regex: runs of letters, runs of digits, or a
#: single non-space symbol — approximates byte-pair pre-tokenization
#: (GPT-2 style split) well enough for token accounting.
BPE_ISH_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"

FINGERPRINT_MOD = (1 << 31) - 1  # Mersenne prime 2^31-1
FINGERPRINT_BASE = 257


def _col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def words(text: Column | str) -> Column:
    """Lower-cased whitespace word array, empty strings removed."""
    toks = F.split(F.lower(F.trim(_col(text))), r"\s+")
    return F.filter(toks, lambda t: t != "")


def ngrams_from_words(w: Column | str, n: int = 3) -> Column:
    """``array<string>`` of ALL n-word grams (with multiplicity, in
    document order) from a words array, in LINEAR time per document.

    The naive form — ``transform(sequence(...), i -> array_join(
    slice(w, i, n)))`` — re-evaluates the full ``w`` subtree per
    element (lambda bodies are interpreted, and Catalyst's
    CollapseProject re-inlines staged projections), making shingling
    O(words²) per document. Instead we ``arrays_zip`` the words array
    with its shifted selves once per row and let the lambda touch
    only its own zip variable.

    Documents shorter than n words yield an empty array.
    """
    w = _col(w)
    shifted = [
        F.slice(w, i + 1, F.greatest(F.size(w) - i, F.lit(0))).alias(f"s{i}")
        for i in range(n)
    ]
    z = F.arrays_zip(*shifted)
    joined = F.transform(
        z, lambda s: F.concat_ws(" ", *[s[f"s{i}"] for i in range(n)])
    )
    return F.when(
        F.size(w) >= n,
        F.slice(joined, 1, F.size(w) - (n - 1)),
    ).otherwise(F.array().cast("array<string>"))


def char_ngrams(text: Column | str, n: int = 3) -> Column:
    """``array<string>`` of ALL character n-grams (with multiplicity,
    in order) — the fastText-shaped featurization for language id.

    Linear time per document via the same arrays_zip device as
    :func:`ngrams_from_words` (a ``transform(sequence(...),
    i -> substring(t, i, n))`` form re-evaluates the text subtree per
    element): split to a per-char array ONCE, zip it with its shifted
    selves, concat inside the zip variable. Unicode-safe (split("")
    yields CHARACTERS, matching DuckDB's character-based substr), so
    both engines gram multibyte text identically. Texts shorter than
    n chars yield an empty array.
    """
    chars = F.filter(F.split(_col(text), ""), lambda c: c != "")
    shifted = [
        F.slice(
            chars, i + 1, F.greatest(F.size(chars) - i, F.lit(0))
        ).alias(f"s{i}")
        for i in range(n)
    ]
    z = F.arrays_zip(*shifted)
    joined = F.transform(
        z, lambda s: F.concat(*[s[f"s{i}"] for i in range(n)])
    )
    return F.when(
        F.size(chars) >= n,
        F.slice(joined, 1, F.size(chars) - (n - 1)),
    ).otherwise(F.array().cast("array<string>"))


def shingles_from_words(w: Column | str, n: int = 3) -> Column:
    """``array<string>`` of n-word shingles (distinct) from a words
    array — :func:`ngrams_from_words` deduplicated (set semantics for
    Jaccard / minhash)."""
    return F.array_distinct(ngrams_from_words(w, n))


def word_shingles(text: Column | str, n: int = 3) -> Column:
    """Shingles straight from text (words computed inline, once per
    row — the per-element work references only the zip variable)."""
    return shingles_from_words(words(text), n)


def whitespace_token_count(text: Column | str) -> Column:
    return F.size(words(text)).cast("bigint")


def bpe_ish_token_count(text: Column | str) -> Column:
    """Count BPE-ish tokens via regexp_count — no explode, no UDF."""
    return F.regexp_count(_col(text), F.lit(BPE_ISH_RE)).cast("bigint")


def langid_scores(text: Column | str) -> list[tuple[str, Column]]:
    """(lang, stopword-hit-count) score columns for each language."""
    w = words(text)
    out = []
    for lang, stops in LANG_STOPWORDS.items():
        stop_arr = F.array(*[F.lit(s) for s in stops])
        score = F.size(F.filter(w, lambda t: F.array_contains(stop_arr, t)))
        out.append((lang, score.cast("bigint")))
    return out


def langid_best(text: Column | str) -> Column:
    """argmax language by stopword hits; ties broken by declaration
    order of LANG_STOPWORDS; 'und' (undetermined) when no stopword
    hits at all."""
    scores = langid_scores(text)
    max_score = F.greatest(*[s for _, s in scores])
    return F.when(max_score > 0, _argmax_lang(scores)).otherwise(F.lit("und"))


def _argmax_lang(scores: list[tuple[str, Column]]) -> Column:
    """Fold a deterministic argmax: first language (in LANG_STOPWORDS
    order) achieving the maximum score."""
    max_score = F.greatest(*[s for _, s in scores])
    expr = F.lit("und")
    for lang, s in reversed(scores):
        expr = F.when(s == max_score, F.lit(lang)).otherwise(expr)
    return expr


def quality_features(text: Column | str) -> dict[str, Column]:
    """Quality-scoring features: char length, word count, mean word
    length, punctuation ratio, stopword(en) ratio."""
    t = _col(text)
    w = words(t)
    n_chars = F.length(t).cast("bigint")
    n_words = F.size(w).cast("bigint")
    punct = F.regexp_count(t, F.lit(r"[^\w\s]")).cast("bigint")
    stop_arr = F.array(*[F.lit(s) for s in LANG_STOPWORDS["en"]])
    stop_hits = F.size(F.filter(w, lambda x: F.array_contains(stop_arr, x))).cast("bigint")
    safe_words = F.greatest(n_words, F.lit(1)).cast("double")
    return {
        "n_chars": n_chars,
        "n_words": n_words,
        "mean_word_len": F.round((n_chars - (n_words - 1)) / safe_words, 4),
        "punct_ratio": F.round(punct / F.greatest(n_chars, F.lit(1)).cast("double"), 4),
        "stopword_ratio": F.round(stop_hits / safe_words, 4),
    }


def readability_features(text: Column | str) -> dict[str, Column]:
    """Readability scoring (Flesch reading-ease family) from three
    deterministic counts — the curation signal for audience-level
    filtering that length/punct ratios can't see:

    * sentences: runs of terminal punctuation (``[.!?]+``), floored
      at 1 so fragments don't divide by zero;
    * syllables: VOWEL-GROUP approximation (runs of ``[aeiouy]``
      per lowercased text) — the standard dictionary-free estimator,
      exact enough for corpus-level ranking and, unlike dictionary
      syllabification, reproducible in any engine with POSIX
      regexes;
    * flesch = 206.835 − 1.015·(words/sentences) −
      84.6·(syllables/words), the classic coefficients.

    Pure ``regexp_count`` projections — JVM-side, no UDF, no
    shuffle; identical arithmetic in the DuckDB oracle.
    """
    t = _col(text)
    n_words = F.greatest(F.size(words(t)), F.lit(1)).cast("double")
    n_sents = F.greatest(
        F.regexp_count(t, F.lit(r"[.!?]+")), F.lit(1)
    ).cast("double")
    n_syll = F.greatest(
        F.regexp_count(F.lower(t), F.lit(r"[aeiouy]+")), F.lit(1)
    ).cast("double")
    flesch = (
        F.lit(206.835)
        - F.lit(1.015) * (n_words / n_sents)
        - F.lit(84.6) * (n_syll / n_words)
    )
    return {
        "n_sentences": n_sents.cast("bigint"),
        "n_syllables": n_syll.cast("bigint"),
        "words_per_sentence": F.round(n_words / n_sents, 4),
        "syllables_per_word": F.round(n_syll / n_words, 4),
        "flesch": F.round(flesch, 4),
    }


def rolling_fingerprint(text: Column | str) -> Column:
    """Order-sensitive document fingerprint: polynomial rolling hash
    over word token hashes, mod 2^61-1.

    fp = fold(tokens, 0, (acc, t) -> (acc*BASE + h(t)) % M) where
    h(t) is the md5-derived 32-bit token hash (portable across
    engines — see vectors.token_hash64). Overflow discipline:
    acc < 2^31, so acc*257 + h < 2^40 — safely inside int64 in any
    engine.
    """
    from nass_summary_spark.functions.vectors import token_hash64

    w = words(text)
    return F.aggregate(
        w,
        F.lit(0).cast("bigint"),
        lambda acc, t: (acc * FINGERPRINT_BASE + token_hash64(t, bits=32))
        % FINGERPRINT_MOD,
    )


#: Scrub patterns: character-class-only regexes, valid and identical
#: in Java regex (Spark) and RE2 (DuckDB) — no lookaround, no \b.
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
URL_RE = r"https?://[^\s]+"
PHONE_RE = r"\+?[0-9][0-9()\-. ]{7,}[0-9]"


def scrub_pii(text: Column | str) -> Column:
    """Redact emails, URLs, and phone-like digit runs with typed
    placeholder tokens. Pure ``regexp_replace`` chain — codegen'd,
    no UDF; the 100 TB path is a map-only projection. URL first so
    an address inside a URL doesn't leave a dangling scheme."""
    c = _col(text)
    c = F.regexp_replace(c, URL_RE, "<URL>")
    c = F.regexp_replace(c, EMAIL_RE, "<EMAIL>")
    c = F.regexp_replace(c, PHONE_RE, "<PHONE>")
    return c


def normalize_text(text: Column | str) -> Column:
    """Canonical form for dedup/fingerprinting: lowercase, strip
    non-alphanumerics to spaces, collapse whitespace runs, trim."""
    c = F.lower(_col(text))
    c = F.regexp_replace(c, r"[^a-z0-9\s]", " ")
    c = F.regexp_replace(c, r"\s+", " ")
    return F.trim(c)


def normalize_url(url: Column | str) -> Column:
    """Canonicalize a URL for dedup keying (RefinedWeb-style URL-level
    dedup): lowercase, strip scheme and ``www.``, drop the fragment,
    drop ``utm_*`` tracking params, trim dangling ``?``/``&`` and the
    trailing slash. Pure regexp chain — map-side, codegen, and
    byte-identical in DuckDB (its ``regexp_replace`` needs the 'g'
    flag where Spark replaces all matches by default).

    The utm strip is anchored at a ``?``/``&`` boundary (keeping the
    separator) so a parameter merely *containing* "utm_" mid-name is
    never clipped; the follow-up passes collapse the separator runs
    left behind by consecutive stripped params. Holds for arbitrary
    URLs, not just the synthesized test ones (unit-tested on the
    adversarial shapes: ``?xutm_a=1&b=2``, ``?utm_a&utm_b&c``,
    repeated ``/?``)."""
    c = F.lower(F.trim(_col(url)))
    c = F.regexp_replace(c, r"^https?://", "")
    c = F.regexp_replace(c, r"^www\.", "")
    c = F.regexp_replace(c, r"#.*$", "")
    c = F.regexp_replace(c, r"([?&])utm_[^&#]*", "$1")
    c = F.regexp_replace(c, r"&&+", "&")
    c = F.regexp_replace(c, r"\?&", "?")
    c = F.regexp_replace(c, r"[?&]+$", "")
    c = F.regexp_replace(c, r"/\?", "?")
    c = F.regexp_replace(c, r"/$", "")
    return c
