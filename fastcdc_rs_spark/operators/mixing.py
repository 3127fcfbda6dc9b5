"""Corpus curation operators: deterministic stratified sampling (data
mixing) and repetition scoring (training-data pipeline ops).

* ``stratified_sample`` — per-stratum keep rates (the "30% web / 10% of
  language X" data-mixing step every LLM corpus build runs). The draw is
  a DETERMINISTIC hash-Bernoulli on (doc_id, seed) — not ``rand()`` — so
  the sample is reproducible across runs, engines, retries, and resumed
  jobs: re-running a failed partition keeps exactly the same documents,
  which is what makes sampling compatible with checkpoint/resume (B13)
  and with the DuckDB oracle.
* ``repetition_scores`` — the Gopher-style repetition quality signals:
  the fraction of token n-gram occurrences taken by the single most
  frequent n-gram, and the fraction that are repeats of an earlier
  occurrence. High values flag boilerplate/spam for the keep-mask.

Both are pure JVM expressions + aggregations (no UDFs) and both have
exact DuckDB twins via the portable md5 hash (functions/portable.py).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from ..functions.plan_safe import explode_once
from ..functions.portable import md5_long

__all__ = ["stratified_sample", "repetition_scores"]

_BUCKETS = 1_000_000  # hash-Bernoulli resolution: rates quantize to 1e-6


def stratified_sample(
    docs: DataFrame,
    rates: dict[str, float],
    default_rate: float = 1.0,
    strata_col: str = "lang",
    seed: int = 0,
    id_col: str = "doc_id",
) -> DataFrame:
    """Rows of ``docs`` kept with probability ``rates[stratum]``
    (``default_rate`` for unlisted strata), deterministically in
    (doc_id, seed).

    Scale shape: the rate table is a handful of rows — broadcast join,
    no shuffle of the corpus at all; the filter is a pure map stage that
    composes with scan pruning. Changing ``seed`` redraws the whole
    sample; keeping it fixed makes downsampling idempotent across
    re-runs.
    """
    spark = docs.sparkSession
    # INTEGER cutoffs, not rate*1e6 in float: 0.1*1e6 is 100000.00000000001
    # in IEEE double, so a doc whose hash bucket lands exactly on the
    # boundary would be kept by a float comparison but dropped by an
    # exact-decimal engine (the DuckDB oracle) — integer cutoffs on both
    # sides make the boundary bit-identical. Rates quantize to 1e-6.
    # collision-safe internal column (a user "_cut" column must survive
    # untouched, like plan_safe's ordinal column)
    cut_col = "__graft_cut"
    cut_rows = [(k, int(round(float(v) * _BUCKETS))) for k, v in sorted(rates.items())]
    cut_df = spark.createDataFrame(cut_rows, f"{strata_col} string, {cut_col} long")
    default_cut = int(round(float(default_rate) * _BUCKETS))
    bucket = md5_long(
        F.concat(F.col(id_col).cast("string"), F.lit(f":{seed}"))
    ) % F.lit(_BUCKETS)
    return (
        docs.join(F.broadcast(cut_df), strata_col, "left")
        .withColumn(cut_col, F.coalesce(cut_col, F.lit(default_cut)))
        .where(bucket < F.col(cut_col))
        .drop(cut_col)
    )


def repetition_scores(docs: DataFrame, n: int = 3, text_col: str = "text",
                      id_col: str = "doc_id") -> DataFrame:
    """(doc_id, n_grams, top_gram_frac, dup_gram_frac) — repetition
    signals over token n-gram OCCURRENCES (not the distinct set):

    * ``top_gram_frac`` = occurrences of the most frequent n-gram / all
      n-gram occurrences (Gopher's "fraction in most common n-gram");
    * ``dup_gram_frac`` = fraction of occurrences that repeat an earlier
      one = 1 - distinct/total (Gopher's "fraction in duplicated
      n-grams" shape).

    Docs with fewer than n tokens score on their whole token sequence
    (one occurrence, both fractions degenerate: top=1, dup=0). One
    explode + two aggregations, shuffled on (doc, gram) then doc.
    """
    from .dedup import token_gram_expr

    # Round 7: everything is a per-doc property of the OCCURRENCE multiset,
    # so it computes MAP-SIDE from the per-doc occurrence-hash array —
    # the old explode → groupBy(doc, gram) → groupBy(doc) shape shuffled
    # the full occurrence table twice for counts each doc already had
    # locally (guide §2.4). The top-gram multiplicity is an O(d·n)
    # array scan per doc (filter per distinct gram), bounded by the
    # document's own gram count. Values identical: same md5 hash space,
    # same counts.
    grams = token_gram_expr(text_col, n, distinct=False)
    occ = F.transform(grams, lambda g: md5_long(g))
    sized = docs.select(
        F.col(id_col),
        occ.alias("_occ"),
        F.array_distinct(occ).alias("_dis"),
    )
    n_grams = F.size("_occ").cast("long")
    top = F.array_max(
        F.transform(
            "_dis",
            lambda g: F.size(F.filter("_occ", lambda x: x == g)),
        )
    ).cast("long")
    n_distinct = F.size("_dis").cast("long")
    return sized.select(
        F.col(id_col),
        n_grams.alias("n_grams"),
        F.round(top / n_grams, 6).alias("top_gram_frac"),
        F.round((n_grams - n_distinct) / n_grams, 6).alias("dup_gram_frac"),
    )
