"""Text-analysis operators for training-data pipelines: language ID,
quality scoring, token counting, fingerprinting.  All JVM-side column
expressions (whole-stage codegen) — no Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

__all__ = ["tokens_col", "token_count", "quality_features", "lang_id",
           "fingerprint", "LANG_MARKERS"]

# tiny deterministic marker lexicons (n-gram-heuristic language ID; a real
# deployment swaps in fastText — same operator shape)
LANG_MARKERS = {
    "en": ["the", "and", "of", "to", "is"],
    "de": ["der", "die", "und", "ist", "nicht"],
    "fr": ["le", "la", "et", "est", "les"],
    "es": ["el", "la", "que", "de", "es"],
    "zh": ["的", "是", "了", "在", "我"],
}


def tokens_col(text_col: str = "text"):
    return F.expr(f"filter(split({text_col}, ' '), t -> t <> '')")


def token_count(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Whitespace + BPE-ish token estimates per doc: word count and a
    subword estimate (chars/4 heuristic + punctuation splits)."""
    toks = tokens_col(text_col)
    n_words = F.size(toks)
    n_chars = F.length(text_col)
    punct = n_chars - F.length(F.regexp_replace(text_col, r"[\.,;:!\?]", ""))
    return docs.withColumns({
        "n_words": n_words,
        "n_chars_txt": n_chars,
        "n_punct": punct,
        "n_tokens_bpe_est": F.ceil(n_chars / 4 + punct).cast("long"),
    })


def quality_features(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Length / punctuation / stopword-ratio features + a quality verdict
    (the filter stage of a pretraining pipeline)."""
    toks = tokens_col(text_col)
    n = F.size(toks)
    mean_len = (F.aggregate(toks, F.lit(0.0),
                            lambda a, t: a + F.length(t)) / n)
    stop = F.size(F.array_intersect(
        toks, F.array(*[F.lit(w) for ws in LANG_MARKERS.values() for w in ws])))
    upper_ratio = (F.length(F.regexp_replace(text_col, r"[^A-Z]", ""))
                   / F.greatest(F.length(text_col), F.lit(1)))
    out = docs.withColumns({
        "n_words": n,
        "mean_word_len": F.round(mean_len, 4),
        "stopword_hits": stop,
        "upper_ratio": F.round(upper_ratio, 4),
    })
    return out.withColumn(
        "quality_ok",
        (F.col("n_words") >= 10) & (F.col("mean_word_len").between(2.0, 12.0))
        & (F.col("upper_ratio") < 0.3))


def lang_id(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Marker-lexicon language ID: score = marker hits per language (over
    distinct tokens), predict argmax with deterministic tiebreak."""
    toks = F.array_distinct(tokens_col(text_col))
    scores = F.array(*[
        F.struct(
            F.size(F.array_intersect(
                toks, F.array(*[F.lit(w) for w in ws]))).alias("hits"),
            F.lit(lang).alias("lang"))
        for lang, ws in sorted(LANG_MARKERS.items())])
    best = F.array_max(F.transform(
        scores, lambda s: F.struct(s.getField("hits").alias("hits"),
                                   s.getField("lang").alias("lang"))))
    return docs.withColumn("pred_lang",
                           F.when(best.getField("hits") > 0,
                                  best.getField("lang")).otherwise("und"))


def fingerprint(docs: DataFrame, id_col: str = "doc_id",
                text_col: str = "text", shingle_n: int = 3,
                keep: int = 4) -> DataFrame:
    """Winnowing-style fingerprint: the ``keep`` smallest shingle hashes
    per doc (rolling-hash sketch; equal fingerprints ⇒ near-identical)."""
    sh = F.expr(
        f"flatten(transform("
        f" array(filter(split({text_col}, ' '), t -> t <> '')),"
        f" toks -> CASE WHEN size(toks) >= {shingle_n} THEN"
        f"   transform(sequence(0, size(toks) - {shingle_n}),"
        f"     i -> xxhash64(concat_ws(' ', slice(toks, i + 1, {shingle_n}))))"
        f" ELSE array(xxhash64(concat_ws(' ', toks))) END))")
    return docs.select(
        id_col,
        F.slice(F.array_sort(sh), 1, keep).alias("fingerprint"),
        F.size(tokens_col(text_col)).alias("n_words"))
