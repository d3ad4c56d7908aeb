"""Text analysis over document tables (training-data-pipeline ops):
token counting, quality scoring, language-ID heuristic, fingerprinting.

Everything is a pure column expression (split / regexp / aggregate) so it
stays inside whole-stage codegen, and every op has an exact ANSI-SQL twin
for the oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# tiny per-language stopword marker sets for the n-gram/stopword heuristic
LANG_MARKERS = {
    "en": ["the", "a", "of", "and"],
    "es": ["el", "la", "de", "y"],
    "de": ["der", "die", "und", "das"],
    "fr": ["le", "la", "et", "les"],
    "zh": ["的", "是", "了", "在"],
}
STOPWORDS = ["the", "a", "of", "and", "is", "to", "in"]


def token_count_col(text: Column) -> Column:
    """Whitespace token count (BPE-ish estimate = chars/4 also provided by
    ``bpe_estimate_col``)."""
    return F.size(F.split(text, " "))


def bpe_estimate_col(text: Column) -> Column:
    """Classic chars/4 BPE token estimate, ceil'd."""
    return F.ceil(F.length(text) / 4).cast("long")


def quality_features(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text",
) -> DataFrame:
    """→ per-doc quality features: n_tokens, n_chars, mean_token_len,
    distinct_ratio, stopword_ratio, punct_ratio. The standard cheap
    pretraining-quality screens."""
    t = F.col(text_col)
    words = F.split(t, " ")
    n_tokens = F.size(words)
    stop_hits = F.size(F.filter(words, lambda w: w.isin(STOPWORDS)))
    punct = F.length(t) - F.length(F.regexp_replace(t, r"[^\w\s]", ""))
    return docs.select(
        F.col(id_col),
        n_tokens.alias("n_tokens"),
        F.length(t).alias("n_chars_measured"),
        (F.length(F.concat_ws("", words)) / n_tokens).alias("mean_token_len"),
        (F.size(F.array_distinct(words)) / n_tokens).alias("distinct_ratio"),
        (stop_hits / n_tokens).alias("stopword_ratio"),
        (punct / F.length(t)).alias("punct_ratio"),
    )


def language_id(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text",
) -> DataFrame:
    """→ (id, pred_lang, marker_hits): argmax over per-language marker-word
    hit counts; tie/zero → 'und'. A deterministic heuristic — the point is
    the distributed scoring pattern, not linguistic accuracy."""
    words = F.split(F.col(text_col), " ")
    scores = [
        F.size(F.filter(words, lambda w: w.isin(LANG_MARKERS[lang]))).alias(f"_s_{lang}")
        for lang in LANG_MARKERS
    ]
    scored = docs.select(F.col(id_col), *scores)
    langs = list(LANG_MARKERS)
    best = F.greatest(*[F.col(f"_s_{l}") for l in langs])
    pred = F.lit("und")
    # first language (in fixed order) achieving the max, if max > 0
    for lang in reversed(langs):
        pred = F.when(
            (F.col(f"_s_{lang}") == best) & (best > 0), F.lit(lang)).otherwise(pred)
    return scored.select(
        F.col(id_col), pred.alias("pred_lang"), best.alias("marker_hits"))


def fingerprint(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text", n: int = 4,
) -> DataFrame:
    """→ (id, fingerprint): min-md5 over word n-grams (winnowing-style
    document fingerprint; rolling-hash analog built from engine-portable
    md5). Equal fingerprints ⇒ shared rare n-gram ⇒ near-dup signal."""
    from .dedup import word_shingles

    sh = word_shingles(docs, id_col, text_col, n)
    return sh.groupBy(id_col).agg(
        F.min(F.md5(F.col("shingle"))).alias("fingerprint"))
