"""Text-analysis operators: token counting, quality scoring, language ID,
document fingerprinting. All Catalyst-native expressions (regexp/array
built-ins), so they fuse into the document scan — no UDFs, no extra stage.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

def nfc_normalized(col: Column | str) -> Column:
    """Unicode NFC normalization — the canonical-composition step an LLM
    text pipeline runs before hashing/dedup (composed vs decomposed accents
    would otherwise defeat exact dedup). Spark SQL has no unicode-normalize
    builtin, so this is a legitimate Arrow-batched pandas stage
    (DuckDB mirror: ``nfc_normalize``)."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("string")
    def _nfc(s: pd.Series) -> pd.Series:
        import unicodedata

        return s.map(
            lambda x: unicodedata.normalize("NFC", x) if x is not None else None
        )

    return _nfc(col)


# BPE-ish pre-tokenizer: letter runs | digit runs | single non-space symbol.
BPE_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"
PUNCT_RE = r"[^A-Za-z0-9\s]"

# Marker stopwords per language for the n-gram-free heuristic language ID.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "is", "a"),
    "de": ("der", "die", "und", "ist", "das", "ein"),
    "fr": ("le", "la", "et", "les", "des", "une"),
    "es": ("el", "los", "que", "una", "por", "con"),
}
EN_STOPWORDS = ("the", "a", "an", "and", "or", "of", "to", "in", "is", "it")


def ws_token_count(text: Column) -> Column:
    """Whitespace token count (reference tokenizer arity, src/main.cpp:239-242)."""
    return F.size(F.split(F.trim(text), r"\s+"))


def bpe_ish_token_count(text: Column) -> Column:
    """Approximate BPE token count via the letters/digits/symbol pre-split."""
    return F.size(F.regexp_extract_all(text, F.lit(BPE_RE), 0))


def token_array(text: Column) -> Column:
    return F.split(F.lower(F.trim(text)), r"\s+")


def marker_hits(toks: Column, markers: tuple[str, ...]) -> Column:
    """How many tokens appear in the marker list — pure array expression."""
    marker_arr = F.array(*[F.lit(m) for m in markers])
    return F.size(F.filter(toks, lambda t: F.array_contains(marker_arr, t)))


def quality_features(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document quality signals: length, alpha/punct ratios, mean token
    length, stopword ratio. Mirrors common pretraining-corpus filters."""
    text = F.col(text_col)
    toks = token_array(text)
    n_chars = F.length(text).cast("long")
    alpha_chars = F.length(F.regexp_replace(text, "[^A-Za-z]", "")).cast("long")
    punct_chars = F.length(text) - F.length(F.regexp_replace(text, PUNCT_RE, ""))
    n_toks = F.size(toks).cast("long")
    return docs.select(
        "doc_id",
        n_chars.alias("n_chars"),
        n_toks.alias("n_tokens"),
        (alpha_chars.cast("double") / n_chars).alias("alpha_ratio"),
        (punct_chars.cast("double") / n_chars).alias("punct_ratio"),
        (n_chars.cast("double") / n_toks).alias("chars_per_token"),
        (
            marker_hits(toks, EN_STOPWORDS).cast("double") / n_toks
        ).alias("stopword_ratio"),
    )


def language_id(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Heuristic language ID: argmax of per-language marker-stopword hits,
    deterministic tie-break in fixed language order, 'und' when no hits."""
    toks = token_array(F.col(text_col))
    hit_cols = {lang: marker_hits(toks, markers) for lang, markers in LANG_MARKERS.items()}
    best = F.greatest(*hit_cols.values())
    pred = F.when(best == 0, F.lit("und"))
    for lang in LANG_MARKERS:  # fixed insertion order = deterministic tie-break
        pred = pred.when(hit_cols[lang] == best, F.lit(lang))
    return docs.select(
        "doc_id",
        *[hit_cols[lang].cast("long").alias(f"hits_{lang}") for lang in LANG_MARKERS],
        pred.alias("lang_pred"),
    )


def fingerprints(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Content fingerprints: md5/sha256 of normalized text plus a 53-bit
    polynomial rolling hash (base-257 Horner over chars) computed with a
    JVM-side ``aggregate`` fold — the streaming-friendly fingerprint that an
    incremental pipeline can maintain per chunk. Modulus 2^53-111 keeps
    ``acc*257`` inside signed-64 range (ANSI-safe, DuckDB-replicable)."""
    norm = F.lower(F.trim(F.regexp_replace(F.col(text_col), r"\s+", " ")))
    rolling = F.aggregate(
        F.transform(F.split(norm, ""), lambda ch: F.ascii(ch).cast("long")),
        F.lit(0).cast("long"),
        lambda acc, c: F.pmod(acc * 257 + c, F.lit(9007199254740881)),
    )
    return docs.select(
        "doc_id",
        F.md5(norm).alias("md5_hex"),
        F.sha2(norm, 256).alias("sha256_hex"),
        rolling.alias("rolling_hash"),
    )
