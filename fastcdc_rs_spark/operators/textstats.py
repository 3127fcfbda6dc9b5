"""Text-analysis operators for training-data pipelines.

All JVM-side built-ins (regex counts, length ratios) with exact DuckDB
oracle twins — no Python in the hot path:

* ``token_stats``     — token/char counts, avg token length;
* ``quality_scores``  — length, punctuation ratio, stopword ratio,
  uppercase ratio, digit ratio + a composite keep/drop quality score;
* ``language_stats``  — per-language corpus aggregates;
* ``doc_fingerprint`` — deterministic content fingerprint (portable md5);
* ``langid_heuristic``— n-gram-free stopword-vote language guess (a stub
  of a real LID model; deterministic and oracle-expressible).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from ..functions.portable import md5_long

__all__ = [
    "token_stats",
    "bpe_token_stats",
    "quality_scores",
    "language_stats",
    "doc_fingerprint",
    "langid_heuristic",
    "corpus_keep_mask",
    "vocabulary_topk",
]

# GPT-2-style pre-tokenizer (portable subset: works identically in Java
# regex and RE2/DuckDB): contractions, optionally-space-prefixed letter
# runs, digit runs, punctuation runs, residual whitespace. Whitespace is
# an explicit class because Java's \s includes \x0B (vertical tab) while
# RE2's does not — the explicit class pins identical semantics.
_WS = r" \t\n\x0B\f\r"
BPE_SPLIT_PATTERN = (
    r"'(?:[sdmt]|ll|ve|re)| ?[A-Za-z]+| ?[0-9]+"
    rf"| ?[^A-Za-z0-9{_WS}]+|[{_WS}]+"
)

_STOPWORDS = ("the", "of", "and", "to", "in", "is", "for", "with", "on", "that")

# English-by-stopword-density threshold shared by langid_heuristic,
# corpus_keep_mask, and their DuckDB oracle twins (__spark_entry__.py
# interpolates it) — tune it in ONE place.
EN_STOPWORD_DENSITY = 0.02


def _n_tokens(text_col: str):
    # tokens = whitespace-run count + 1 on trimmed text (trim means no
    # leading/trailing run, so split() would yield no empty fields and
    # size(split(t, '\\s+')) == regexp_count + 1 exactly) — counts the
    # separators without materializing the token array per row
    t = F.trim(F.col(text_col))
    return F.when(F.length(t) == 0, F.lit(0)).otherwise(
        F.regexp_count(t, F.lit(r"\s+")) + F.lit(1)
    )


# Java-regex \s character class, spelled out for `translate`-based
# counting: counting occurrences of a fixed char CLASS does not need the
# regex engine — length(x) - length(translate(x, chars, '')) is the same
# count at a fraction of the per-row cost (regexp_replace re-scans with
# NFA state per char; translate is a char-map lookup). Guide §1.2 step 2.
_WS_CHARS = " \t\n\x0b\f\r"
_PUNCT_CHARS = ".,;:!?'\""
_DIGIT_CHARS = "0123456789"
_UPPER_CHARS = "ABCDEFGHIJKLMNOPQRSTUVWXYZ"


def _count_chars(t, chars: str):
    """Number of occurrences in ``t`` of any char in ``chars`` (exact
    replacement for length(regexp_replace(t, '[^chars]', '')))."""
    return F.length(t) - F.length(F.translate(t, chars, ""))


def token_stats(docs: DataFrame, text_col: str = "text",
                id_col: str = "doc_id") -> DataFrame:
    """(doc_id, n_tokens, n_chars, avg_token_len)."""
    n_tok = _n_tokens(text_col)
    n_chars = F.length(F.col(text_col))
    n_spaces = _count_chars(F.col(text_col), _WS_CHARS)
    return docs.select(
        F.col(id_col),
        n_tok.alias("n_tokens"),
        n_chars.alias("n_chars"),
        F.round(
            F.when(n_tok > 0, (n_chars - n_spaces).cast("double") / n_tok.cast("double"))
            .otherwise(F.lit(0.0)),
            6,
        ).alias("avg_token_len"),
    )


def bpe_token_stats(docs: DataFrame, text_col: str = "text",
                    id_col: str = "doc_id") -> DataFrame:
    """(doc_id, n_bpe_tokens, n_word_tokens, n_number_tokens): token counts
    under the BPE-ish pre-tokenizer split (the count an LLM training
    pipeline budgets by), all JVM-side. ``regexp_count`` (same engine,
    same non-overlapping match semantics as ``regexp_extract_all``)
    counts matches without materializing a per-row array of every
    matched substring."""
    t = F.col(text_col)
    return docs.select(
        F.col(id_col),
        F.regexp_count(t, F.lit(BPE_SPLIT_PATTERN)).alias("n_bpe_tokens"),
        F.regexp_count(t, F.lit(r" ?[A-Za-z]+")).alias("n_word_tokens"),
        F.regexp_count(t, F.lit(r" ?[0-9]+")).alias("n_number_tokens"),
    )


def quality_scores(docs: DataFrame, text_col: str = "text",
                   id_col: str = "doc_id") -> DataFrame:
    """Per-doc quality features + composite score in [0, 1]."""
    t = F.col(text_col)
    n_chars = F.length(t).cast("double")
    safe = F.when(n_chars > 0, n_chars).otherwise(F.lit(1.0))
    # char-class counts via translate (see _count_chars): three regex
    # passes per row replaced by three char-map scans, same counts
    punct = _count_chars(t, _PUNCT_CHARS).cast("double") / safe
    digits = _count_chars(t, _DIGIT_CHARS).cast("double") / safe
    upper = _count_chars(t, _UPPER_CHARS).cast("double") / safe
    n_tok = _n_tokens(text_col).cast("double")
    stop_pattern = r"(?i)\b(" + "|".join(_STOPWORDS) + r")\b"
    n_stop = F.when(
        n_chars > 0,
        F.regexp_count(t, F.lit(stop_pattern)).cast("double"),
    ).otherwise(F.lit(0.0))
    stop_ratio = F.when(n_tok > 0, n_stop / n_tok).otherwise(F.lit(0.0))
    length_ok = F.when((n_tok >= 10) & (n_tok <= 100000), F.lit(1.0)).otherwise(F.lit(0.0))
    score = (
        length_ok * 0.4
        + F.when(stop_ratio >= 0.05, F.lit(0.3)).otherwise(F.lit(0.0))
        + F.when(punct <= 0.2, F.lit(0.15)).otherwise(F.lit(0.0))
        + F.when(digits <= 0.3, F.lit(0.15)).otherwise(F.lit(0.0))
    )
    return docs.select(
        F.col(id_col),
        F.round(punct, 6).alias("punct_ratio"),
        F.round(digits, 6).alias("digit_ratio"),
        F.round(upper, 6).alias("upper_ratio"),
        F.round(stop_ratio, 6).alias("stopword_ratio"),
        F.round(score, 6).alias("quality_score"),
    )


def language_stats(docs: DataFrame, text_col: str = "text",
                   lang_col: str = "lang") -> DataFrame:
    """Per-language aggregates: doc count, mean length, mean tokens."""
    n_tok = _n_tokens(text_col)
    return (
        docs.groupBy(lang_col)
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.round(F.avg(F.length(F.col(text_col))), 6).alias("avg_chars"),
            F.round(F.avg(n_tok.cast("double")), 6).alias("avg_tokens"),
        )
    )


def doc_fingerprint(docs: DataFrame, text_col: str = "text",
                    id_col: str = "doc_id") -> DataFrame:
    """(doc_id, fingerprint): deterministic 60-bit content fingerprint of
    the whitespace-normalized lowercase text."""
    norm = F.regexp_replace(F.lower(F.trim(F.col(text_col))), r"\s+", " ")
    return docs.select(F.col(id_col), md5_long(norm).alias("fingerprint"))


def langid_heuristic(docs: DataFrame, text_col: str = "text",
                     id_col: str = "doc_id") -> DataFrame:
    """(doc_id, lang_guess): 'en' when English stopword density >= 2%,
    else 'other'. A deterministic, oracle-expressible placeholder for a
    real LID model (which would be a Pandas-UDF over a fastText-style
    table; the Spark plumbing is identical)."""
    n_tok = _n_tokens(text_col).cast("double")
    stop_pattern = r"(?i)\b(" + "|".join(_STOPWORDS) + r")\b"
    n_stop = F.regexp_count(F.col(text_col), F.lit(stop_pattern)).cast("double")
    ratio = F.when(n_tok > 0, n_stop / n_tok).otherwise(F.lit(0.0))
    return docs.select(
        F.col(id_col),
        F.when(ratio >= EN_STOPWORD_DENSITY, F.lit("en"))
        .otherwise(F.lit("other"))
        .alias("lang_guess"),
    )


def corpus_keep_mask(docs: DataFrame, q_min: float = 0.7,
                     text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(doc_id, quality_score, lang_guess, is_duplicate, keep): the
    C4-style cleaning decision composed from this module's stages.

    keep = quality >= ``q_min`` AND English by stopword density AND not an
    exact duplicate. Quality and language come from ONE map pass over the
    text (``quality_scores`` already carries the stopword density the LID
    heuristic needs — the rounded ratio, so the decision is reproducible
    across engines); the duplicate flag adds exact dedup's single
    text-hash shuffle; the final join is a doc_id equi-join. At CC scale
    this is one scan + two shuffles total for a full keep/drop pass.
    """
    from .dedup import dedup_flags

    q = quality_scores(docs, text_col, id_col)
    lang = F.when(
        F.col("stopword_ratio") >= EN_STOPWORD_DENSITY, F.lit("en")
    ).otherwise(F.lit("other"))
    qm = q.select(id_col, "quality_score", lang.alias("lang_guess"))
    flags = dedup_flags(docs, text_col, id_col).select(id_col, "is_duplicate")
    return qm.join(flags, id_col).select(
        id_col,
        "quality_score",
        "lang_guess",
        "is_duplicate",
        (
            (F.col("quality_score") >= q_min)
            & (F.col("lang_guess") == "en")
            & (~F.col("is_duplicate"))
        ).alias("keep"),
    )


def vocabulary_topk(docs: DataFrame, k: int = 20,
                    text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(token, df, total, rank): corpus vocabulary by document frequency —
    the wordcount-at-scale pattern. Explode + hash aggregate (map-side
    partial combine shrinks the shuffle to distinct tokens per partition);
    the global top-k window runs over the aggregated token frame, never
    the exploded rows. Ties break (df desc, total desc, token asc) so the
    ranking is deterministic.
    """
    from pyspark.sql import Window

    toks = docs.select(
        F.col(id_col),
        F.explode(F.split(F.trim(F.col(text_col)), r"\s+")).alias("token"),
    ).where(F.col("token") != "")
    agg = toks.groupBy("token").agg(
        F.countDistinct(id_col).alias("df"),
        F.count(F.lit(1)).alias("total"),
    )
    # top-k FIRST via orderBy+limit (planned as TakeOrderedAndProject —
    # every partition contributes its local top k, only k rows reach the
    # driver), THEN the row_number window over just those k rows. The
    # old global no-partition window pulled the ENTIRE vocabulary into
    # one task to sort (guide §2.5) — identical output, since the window
    # ranked by exactly this sort order and kept rank <= k.
    order = [F.desc("df"), F.desc("total"), F.asc("token")]
    topk = agg.orderBy(*order).limit(k)
    w = Window.orderBy(*order)
    return topk.withColumn("rank", F.row_number().over(w))
