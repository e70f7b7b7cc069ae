"""Text-analysis Column builders (LLM-pipeline extensions, SURVEY.md §7
phase 6 — no reference counterpart).

All pure built-in expressions (split / transform / aggregate / regexp) so
they run JVM-side inside whole-stage codegen — no Python in the hot path.
Designed for 100 TB document tables: every function is a per-row map,
no shuffle, no UDF.
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import Column
from pyspark.sql import functions as F

#: BPE-ish tokenizer: letter runs, digit runs, single punctuation marks.
BPEISH_TOKEN_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"

#: Marker stopwords per language for the n-gram/stopword language-ID
#: heuristic. Order matters: ties break toward the earlier entry.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "a", "in", "is"),
    "de": ("der", "die", "und", "das", "ist", "nicht"),
    "fr": ("le", "la", "et", "les", "des", "est"),
    "es": ("el", "la", "los", "que", "es", "y"),
    "zh": ("的", "是", "了", "在", "我"),
}

PUNCT_RE = r"[^A-Za-z0-9\s]"
FINGERPRINT_MOD = 1_000_000_007


def words(text: Column | str) -> Column:
    """Lowercased whitespace tokens."""
    c = F.col(text) if isinstance(text, str) else text
    return F.split(F.lower(F.trim(c)), r"\s+")


def whitespace_token_count(text: Column | str) -> Column:
    return F.size(words(text))


def bpeish_token_count(text: Column | str) -> Column:
    """Token count under the BPE-ish regex tokenizer."""
    c = F.col(text) if isinstance(text, str) else text
    return F.size(F.regexp_extract_all(c, F.lit(BPEISH_TOKEN_RE), 0))


def punct_count(text: Column | str) -> Column:
    c = F.col(text) if isinstance(text, str) else text
    return F.size(F.regexp_extract_all(c, F.lit(PUNCT_RE), 0))


def stopword_count(text: Column | str, markers: Sequence[str]) -> Column:
    w = words(text)
    return F.size(F.filter(w, lambda x: x.isin(*markers)))


def lang_scores(text: Column | str, markers: Mapping[str, Sequence[str]] | None = None) -> dict[str, Column]:
    """Per-language marker-stopword hit counts."""
    markers = markers or LANG_MARKERS
    return {lang: stopword_count(text, ms) for lang, ms in markers.items()}


def lang_id(text: Column | str, markers: Mapping[str, Sequence[str]] | None = None) -> Column:
    """Argmax language with deterministic first-listed tie-break; 'und'
    (undetermined) when no marker hits at all."""
    markers = markers or LANG_MARKERS
    scores = lang_scores(text, markers)
    items = list(scores.items())
    best_lang, best_score = F.lit(items[0][0]), items[0][1]
    for lang, score in items[1:]:
        better = score > best_score
        best_lang = F.when(better, F.lit(lang)).otherwise(best_lang)
        best_score = F.when(better, score).otherwise(best_score)
    return F.when(best_score <= 0, F.lit("und")).otherwise(best_lang)


def quality_features(
    text: Column | str, words_col: Column | None = None
) -> dict[str, Column]:
    """Length / punctuation / stopword quality features (the classic
    pre-training quality-filter signals).

    Pass a staged ``words_col`` attribute on hot paths so the tokenizer
    isn't re-inlined into every feature expression."""
    c = F.col(text) if isinstance(text, str) else text
    w = words_col if words_col is not None else words(c)
    n_words = F.size(w)
    n_chars = F.length(c)
    stop_hits = F.size(F.filter(w, lambda x: x.isin(*LANG_MARKERS["en"])))
    return {
        "n_chars": n_chars.cast("int"),
        "n_words": n_words.cast("int"),
        "avg_word_len": F.round(
            F.aggregate(w, F.lit(0).cast("long"), lambda acc, x: acc + F.length(x))
            / F.greatest(n_words, F.lit(1)),
            4,
        ),
        "punct_ratio": F.round(
            punct_count(c) / F.greatest(n_chars, F.lit(1)).cast("double"), 6
        ),
        "stopword_ratio": F.round(
            stop_hits / F.greatest(n_words, F.lit(1)).cast("double"), 6
        ),
    }


def word_bigrams(words_col: Column) -> Column:
    """Adjacent word pairs ``"w_i w_{i+1}"`` of a token array (empty for
    single-token docs). Pure array expression: ``zip_with`` over two
    shifted slices, no explode, no shuffle."""
    n = F.size(words_col)
    return F.zip_with(
        F.slice(words_col, F.lit(1), F.greatest(n - 1, F.lit(0))),
        F.slice(words_col, F.lit(2), F.greatest(n - 1, F.lit(0))),
        lambda a, b: F.concat(a, F.lit(" "), b),
    )


def repetition_features(words_col: Column) -> dict[str, Column]:
    """Gopher-style repetition signals computable per-row (no shuffle):
    distinct-word ratio and duplicate-bigram fraction. The remaining
    signal — most-frequent-word share — needs a token-keyed aggregation
    and lives in the ``doc_repetition_stats`` query, not here."""
    n_words = F.size(words_col)
    bg = word_bigrams(words_col)
    n_bg = F.size(bg)
    return {
        "uniq_word_ratio": F.round(
            F.size(F.array_distinct(words_col))
            / F.greatest(n_words, F.lit(1)).cast("double"),
            6,
        ),
        "dup_bigram_frac": F.round(
            F.when(n_bg <= 0, F.lit(0.0)).otherwise(
                1.0 - F.size(F.array_distinct(bg)) / n_bg.cast("double")
            ),
            6,
        ),
    }


def rolling_fingerprint(text: Column | str, mod: int = FINGERPRINT_MOD) -> Column:
    """Order-sensitive document fingerprint: polynomial rolling hash over
    per-word codes ``7*len(word) + ascii(first_char)`` folded left with
    ``acc*31 + code (mod p)``. Deterministic and engine-portable."""
    w = words(text)
    codes = F.transform(
        w, lambda x: (F.length(x) * 7 + F.ascii(F.substring(x, 1, 1))).cast("long")
    )
    return F.aggregate(
        codes, F.lit(0).cast("long"), lambda acc, x: (acc * 31 + x) % mod
    )
