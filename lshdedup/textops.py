"""Text-analysis operators for a training-data pipeline (graft extras;
NOT in the reference — first-class per the build brief): token counting,
quality scoring, language-ID heuristic, document fingerprinting.

All hot-path operators are native column expressions (codegen, SQL-oracle
checkable); only the rolling-hash fingerprint needs a vectorized UDF.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import LongType

# tiny built-in stopword lists for the language-ID heuristic
STOPWORDS = {
    "en": ["the", "a", "of", "and", "to", "in", "is", "it", "for", "on"],
    "es": ["el", "la", "de", "y", "que", "en", "un", "una", "los", "por"],
    "fr": ["le", "la", "de", "et", "que", "en", "un", "une", "les", "pour"],
}


def tokens_expr(text: Column | str, sep: str = " ") -> Column:
    text = F.col(text) if isinstance(text, str) else text
    return F.split(text, sep)


def token_count_expr(text: Column | str) -> Column:
    """Whitespace token count (BPE-ish regex variant below)."""
    return F.size(tokens_expr(text))


def bpe_ish_token_count_expr(text: Column | str) -> Column:
    """Sub-word-ish token count: split on word/non-word boundaries —
    a cheap deterministic stand-in for a BPE tokenizer's token count."""
    text = F.col(text) if isinstance(text, str) else text
    # count alnum runs + punctuation singletons
    words = F.size(F.filter(F.split(text, "[^0-9A-Za-z]+"), lambda t: F.length(t) > 0))
    punct = F.length(F.regexp_replace(text, "[0-9A-Za-z\\s]", ""))
    return words + punct


def stopword_count_expr(text: Column | str, lang: str = "en") -> Column:
    toks = tokens_expr(text)
    arr = F.array(*[F.lit(w) for w in STOPWORDS[lang]])
    return F.size(F.filter(toks, lambda t: F.array_contains(arr, F.lower(t))))


def quality_features(text: Column | str) -> dict[str, Column]:
    """Integer/ratio quality features: length, token stats, punct &
    stopword ratios."""
    text = F.col(text) if isinstance(text, str) else text
    toks = tokens_expr(text)
    n_tokens = F.size(toks)
    n_chars = F.length(text)
    n_distinct = F.size(F.array_distinct(toks))
    n_punct = F.length(F.regexp_replace(text, "[0-9A-Za-z\\s]", ""))
    n_stop = stopword_count_expr(text)
    return {
        "n_chars": n_chars,
        "n_tokens": n_tokens,
        "n_distinct_tokens": n_distinct,
        "n_punct": n_punct,
        "n_stopwords": n_stop,
        "distinct_ratio": n_distinct.cast("double") / n_tokens,
        "punct_ratio": n_punct.cast("double") / F.greatest(n_chars, F.lit(1)),
        "stopword_ratio": n_stop.cast("double") / n_tokens,
    }


def quality_score_expr(text: Column | str) -> Column:
    """Scalar quality score in [0,1]: rewards mid-length docs with diverse
    tokens and low punctuation density.  Deterministic arithmetic only."""
    feats = quality_features(text)
    length_term = F.least(feats["n_tokens"].cast("double") / 64.0, F.lit(1.0))
    # no rounding: the expression tree mirrors the SQL oracle exactly, so
    # IEEE doubles match bit-for-bit
    return (
        0.5 * length_term
        + 0.35 * feats["distinct_ratio"]
        + 0.15 * (1.0 - F.least(feats["punct_ratio"] * 4.0, F.lit(1.0)))
    )


def lang_scores(text: Column | str) -> dict[str, Column]:
    return {lang: stopword_count_expr(text, lang) for lang in STOPWORDS}


def lang_id_expr(text: Column | str) -> Column:
    """argmax over per-language stopword hits; tie → 'und'.  Pure CASE
    logic so a SQL oracle can reproduce it exactly."""
    s = lang_scores(text)
    en, es, fr = s["en"], s["es"], s["fr"]
    best = F.greatest(en, es, fr)
    return (
        F.when(best == 0, F.lit("und"))
        .when((en == best) & (es < best) & (fr < best), F.lit("en"))
        .when((es == best) & (en < best) & (fr < best), F.lit("es"))
        .when((fr == best) & (en < best) & (es < best), F.lit("fr"))
        .otherwise(F.lit("und"))
    )


def md5_fingerprint_expr(text: Column | str) -> Column:
    """Exact content fingerprint (md5 hex) — the SQL-checkable one."""
    text = F.col(text) if isinstance(text, str) else text
    return F.md5(text)


def rolling_fingerprint_udf(window: int = 16, keep_mod: int = 8):
    """Winnowing-style rolling-hash fingerprint: polynomial rolling hash
    over a sliding byte window, keep hashes ≡ 0 (mod keep_mod), xor-fold to
    one int64.  Robust to local edits outside kept windows; vectorized via
    the same flat-buffer trick as shingling."""
    B = np.uint64(257)

    @F.pandas_udf(LongType())
    def fp(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
        mul = B ** np.uint64(window - 1)
        np.seterr(over="ignore")  # uint64 rolling hash wraps by design
        for batch in batches:
            out = np.zeros(len(batch), dtype=np.uint64)
            for i, t in enumerate(batch):
                data = np.frombuffer((t or "").encode("utf-8"), dtype=np.uint8)
                if data.size < window:
                    from lshdedup.hashing import fnv1a_bytes

                    out[i] = np.uint64(fnv1a_bytes(bytes(data)))
                    continue
                # rolling hash via cumulative powers (vectorized per doc)
                h = np.uint64(0)
                hashes = np.empty(data.size - window + 1, dtype=np.uint64)
                for j in range(window):
                    h = h * B + np.uint64(data[j])
                hashes[0] = h
                for j in range(1, hashes.size):
                    h = (h - np.uint64(data[j - 1]) * mul) * B + np.uint64(
                        data[j + window - 1]
                    )
                    hashes[j] = h
                kept = hashes[hashes % np.uint64(keep_mod) == 0]
                out[i] = np.bitwise_xor.reduce(kept) if kept.size else hashes.min()
            yield pd.Series(out.view(np.int64))

    return fp
