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


def rolling_fingerprint_scalar(
    data: bytes, window: int = 16, keep_mod: int = 8
) -> int:
    """Reference (per-document) semantics of the rolling fingerprint —
    the spec the batched UDF is pinned against in tests: polynomial rolling
    hash h_j = Σ 257^(w-1-i)·byte[j+i] (mod 2^64) over every window, keep
    hashes ≡ 0 (mod keep_mod), xor-fold; no window → FNV-1a of the whole
    doc; no kept window → min hash."""
    from lshdedup.hashing import fnv1a_bytes

    arr = np.frombuffer(data, dtype=np.uint8)
    if arr.size < window:
        return int(np.uint64(fnv1a_bytes(data)))
    B = np.uint64(257)
    with np.errstate(over="ignore"):
        h = np.uint64(0)
        hashes = np.empty(arr.size - window + 1, dtype=np.uint64)
        for j in range(window):
            h = h * B + np.uint64(arr[j])
        hashes[0] = h
        mul = B ** np.uint64(window - 1)
        for j in range(1, hashes.size):
            h = (h - np.uint64(arr[j - 1]) * mul) * B + np.uint64(arr[j + window - 1])
            hashes[j] = h
    kept = hashes[hashes % np.uint64(keep_mod) == 0]
    return int(np.bitwise_xor.reduce(kept) if kept.size else hashes.min())


def rolling_fingerprints_batch(
    raws: list[bytes], window: int = 16, keep_mod: int = 8
) -> np.ndarray:
    """Batched rolling fingerprints — bit-identical to
    rolling_fingerprint_scalar per row (pinned by tests/test_textops.py),
    with NO per-row or per-byte Python:

      * all >=window docs concatenate into ONE byte buffer; the rolling
        hash is recomputed directly per window position as `window` (16)
        vector passes h = h*B + byte over ALL positions at once —
        bit-equal to the incremental update mod 2^64;
      * per-row xor-fold / kept-count / min all via ufunc.reduceat on the
        row-segmented window array;
      * <window docs hash in one fnv1a_varlen pass.
    """
    from lshdedup.hashing import fnv1a_varlen, ragged_valid_indices

    n = len(raws)
    out = np.zeros(n, dtype=np.uint64)
    lens = np.fromiter((len(r) for r in raws), count=n, dtype=np.int64)
    short = lens < window
    if short.any():
        out[short] = fnv1a_varlen([raws[i] for i in np.flatnonzero(short)])
    long_ix = np.flatnonzero(~short)
    if long_ix.size == 0:
        return out
    flat = np.frombuffer(b"".join(raws[i] for i in long_ix), dtype=np.uint8)
    llens = lens[long_ix]
    offs = np.zeros(long_ix.size + 1, dtype=np.int64)
    np.cumsum(llens, out=offs[1:])
    bounds = np.stack([offs[:-1], offs[:-1] + (llens - window + 1)], axis=1)
    windows = np.lib.stride_tricks.sliding_window_view(flat, window)
    B = np.uint64(257)
    h = np.zeros(windows.shape[0], dtype=np.uint64)
    with np.errstate(over="ignore"):
        for j in range(window):
            h *= B
            h += windows[:, j]
    idx, wlens = ragged_valid_indices(bounds)  # row-owned window positions
    hv = h[idx]
    starts = np.zeros(long_ix.size, dtype=np.int64)
    np.cumsum(wlens[:-1], out=starts[1:])
    mask = hv % np.uint64(keep_mod) == 0
    xorred = np.bitwise_xor.reduceat(np.where(mask, hv, np.uint64(0)), starts)
    cnt = np.add.reduceat(mask.astype(np.int64), starts)
    mins = np.minimum.reduceat(hv, starts)
    out[long_ix] = np.where(cnt > 0, xorred, mins)
    return out


def rolling_fingerprint_udf(window: int = 16, keep_mod: int = 8):
    """Winnowing-style rolling-hash fingerprint: polynomial rolling hash
    over a sliding byte window, keep hashes ≡ 0 (mod keep_mod), xor-fold to
    one int64.  Robust to local edits outside kept windows; one batched
    numpy pass per Arrow batch (rolling_fingerprints_batch)."""

    @F.pandas_udf(LongType())
    def fp(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
        for batch in batches:
            raws = [(t or "").encode("utf-8") for t in batch]
            yield pd.Series(
                rolling_fingerprints_batch(raws, window, keep_mod).view(np.int64)
            )

    return fp
