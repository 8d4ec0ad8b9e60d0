"""Text analysis expression library: tokenization, shingling, quality
scoring, language-ID profiles — all JVM-side Column expressions (no UDFs),
the profiling/filtering toolkit of a large-scale training-data pipeline.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F
from stockmarketdata_dwb_etl_spark.functions.exact import portable_round

#: Tiny stopword profiles for the heuristic language scorer. Real systems
#: use char-n-gram models; the mechanics (profile overlap → argmax) are the
#: same and that is what the engine exercises.
LANG_PROFILES: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and", "to"),
    "es": ("el", "la", "de", "y", "que"),
    "de": ("der", "die", "das", "und", "zu"),
}

#: BPE-ish tokenizer: word pieces or single non-space punctuation.
BPE_TOKEN_RE = r"[A-Za-z0-9_]+|[^A-Za-z0-9_\s]"


def tokenize(text: Column) -> Column:
    """Whitespace tokenization, empty tokens dropped."""
    return F.filter(F.split(text, " "), lambda w: w != "")


def word_shingles(words: Column, k: int = 3) -> Column:
    """k-word shingles: ['a','b','c','d'] → ['a b c','b c d'] (k=3).
    Empty array when the document has fewer than k words.

    Implementation note: built from k aligned ``slice``s folded with
    ``zip_with``, NOT ``transform`` + ``element_at``. Higher-order-function
    lambdas are not common-subexpression-eliminated, so an ``element_at``
    formulation re-evaluates the whole ``words`` expression (often a
    ``filter(split(text))``) per element per position — ~3k× per row. The
    slice/zip form references ``words`` only k+1 times."""
    n = F.size(words)
    cnt = F.greatest(n - (k - 1), F.lit(0))
    out = F.slice(words, 1, cnt)
    for j in range(1, k):
        out = F.zip_with(
            out,
            F.slice(words, j + 1, cnt),
            lambda a, b: F.concat_ws(" ", a, b),
        )
    return out


def lang_scores(words: Column) -> dict[str, Column]:
    """Stopword-profile overlap score per language (distinct-word hits)."""
    distinct_words = F.array_distinct(words)
    return {
        lang: F.size(
            F.array_intersect(
                distinct_words, F.array(*[F.lit(w) for w in profile])
            )
        )
        for lang, profile in LANG_PROFILES.items()
    }


def quality_exprs(text: Column) -> dict[str, Column]:
    """Quality-scoring feature battery (length / punctuation / stopword /
    token statistics) used to filter training corpora."""
    words = tokenize(text)
    n_chars = F.length(text)
    n_tokens = F.size(words)
    n_bpe = F.size(F.regexp_extract_all(text, F.lit(BPE_TOKEN_RE), 0))
    n_punct = F.size(F.regexp_extract_all(text, F.lit(r"[^A-Za-z0-9_\s]"), 0))
    n_stop = F.size(
        F.array_intersect(
            F.array_distinct(words),
            F.array(*[F.lit(w) for w in LANG_PROFILES["en"]]),
        )
    )
    return {
        "n_chars": n_chars.cast("int"),
        "n_tokens": n_tokens.cast("int"),
        "n_bpe_tokens": n_bpe.cast("int"),
        "punct_ratio": portable_round(n_punct.cast("double") / n_chars, 4),
        "stopword_hits": n_stop.cast("int"),
        "mean_token_len": portable_round(
            (n_chars - n_tokens + 1).cast("double") / F.nullif(n_tokens, F.lit(0)), 4
        ),
    }
