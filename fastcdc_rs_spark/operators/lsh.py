"""LSH banding + candidate-pair generation (SURVEY.md §2.B B6/B8/B12).

Band keys are computed kernel-side (kernel/signatures.band_hashes, one
Arrow pass with the MinHash) and arrive here exploded as
(doc_id, band_id, band_hash); docs sharing any band key are candidates.

``candidate_pairs`` generates (a, b) pairs per bucket with explicit skew
handling: buckets up to ``bucket_cap`` docs emit all pairs; larger
buckets — boilerplate bands, giant clusters — emit *star* pairs (every
member against the bucket minimum) instead of the quadratic all-pairs
set. Star edges preserve the bucket's connectivity for
connected-components clustering, so recall of the *clustering* survives
the cap while join fan-out stays linear; the drop is observable in the
returned metrics (``capped_buckets``/``capped_docs``) rather than silent.

Bucket statistics come from a WINDOW over the band key, not an
aggregate+join: count and min ride the same single shuffle+sort of the
band table, where the join formulation shuffles it twice (once into the
aggregate, once into the join) — measured 2x faster at 800k docs
(30.7 s -> 15.6 s at 4 cores) with per-stage N->4N efficiency 0.995.
Only the post-filter collision rows (a small fraction of the
mostly-singleton band space) are persisted for the two pair branches.
Skew exposure is identical to the join form — either way every row of a
bucket co-locates in one task to compute its size — and the downstream
cap bounds what that task emits; the window's sort runs over equal-key
runs, so the giant bucket costs a linear scan, not a real sort.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

from ..functions.plan_safe import explode_once

__all__ = ["candidate_pairs"]


def candidate_pairs(bands_df: DataFrame, bucket_cap: int = 64,
                    id_col: str = "doc_id") -> tuple[DataFrame, DataFrame]:
    """Distinct candidate pairs (a < b) from band buckets; also returns a
     1-row metrics DataFrame with bucket statistics (nothing is dropped
    silently — capped buckets degrade to star pairs, counted here).

    If ``bands_df`` carries a ``_sz`` column (a per-doc constant — the
    pipeline passes the distinct shingle-set size), the pairs come out
    annotated with ``_sz_a``/``_sz_b``: the sizes ride the band window's
    one shuffle for free, so the downstream size-ratio prune
    (operators/verify.py) becomes a FILTER on the pair rows instead of
    two shuffle joins — two exchanges and their AQE barriers deleted
    from the verify critical path.
    """
    has_sz = "_sz" in bands_df.columns
    # ONE shuffle of the band table: bucket size and min doc ride a
    # whole-partition window frame (no ORDER BY → no running-frame
    # semantics, one pass per bucket). Giant buckets are never
    # materialized as row-level lists: only small buckets (<= cap
    # members) use collect_list below, so no single row can exceed
    # cap * 16 bytes regardless of data skew.
    w = Window.partitionBy("band_id", "band_hash")
    if has_sz:
        # struct min orders on the leading id field (ids are distinct per
        # bucket), so this is the min doc's (id, size) record — the star
        # branch needs the hub's size without another lookup
        min_expr = F.min(
            F.struct(F.col(id_col).alias("id"), F.col("_sz").alias("sz"))
        ).over(w)
    else:
        min_expr = F.struct(F.min(id_col).over(w).alias("id"))
    annotated = (
        bands_df
        .withColumn("bucket_size", F.count(F.lit(1)).over(w))
        .withColumn("_bmin", min_expr)
        .where(F.col("bucket_size") > 1)
        .persist()
    )
    # Materialize the window EAGERLY: the small-pairs and star-pairs
    # branches below (and the prune joins downstream) are submitted as
    # concurrent AQE stages, and on a cold cache they contend for the
    # same uncomputed blocks (recompute or lock-wait — both burn a core
    # slot) — measured as two identical ~21 s jobs at 800k docs/4 cores
    # where the window runs once in ~13 s. One count() fills the cache
    # at full parallelism; every branch then reads blocks. At 1 core the
    # contention cannot express (tasks serialize), so this was a pure
    # scale-efficiency leak, not a throughput bug.
    annotated.count()
    # cache ownership: `annotated` feeds both pair branches and the
    # metrics below; callers that materialize the pairs (the pipeline,
    # jobs) release it via the _graft_caches attribute — a long-lived
    # session running many queries back-to-back must not accumulate
    # cached band tables.

    if has_sz:
        member = F.struct(F.col(id_col).alias("id"), F.col("_sz").alias("sz"))
        pair_expr = F.filter(
            F.flatten(
                F.transform(
                    "members",
                    lambda x: F.transform(
                        "members",
                        lambda y: F.struct(
                            x["id"].alias("a"), y["id"].alias("b"),
                            x["sz"].alias("_sz_a"), y["sz"].alias("_sz_b"),
                        ),
                    ),
                )
            ),
            lambda p: p["a"] < p["b"],
        )
        out_cols = ["a", "b", "_sz_a", "_sz_b"]
        star_cols = [
            F.col("_bmin.id").alias("a"), F.col(id_col).alias("b"),
            F.col("_bmin.sz").alias("_sz_a"), F.col("_sz").alias("_sz_b"),
        ]
    else:
        member = F.col(id_col)
        pair_expr = F.filter(
            F.flatten(
                F.transform(
                    "members",
                    lambda x: F.transform(
                        "members", lambda y: F.struct(x.alias("a"), y.alias("b"))
                    ),
                )
            ),
            lambda p: p["a"] < p["b"],
        )
        out_cols = ["a", "b"]
        star_cols = [F.col("_bmin.id").alias("a"), F.col(id_col).alias("b")]
    # the cache is hash-partitioned on the band key, so this groupBy (and
    # the metrics aggregations below) run without another exchange
    small_pairs = explode_once(
        annotated.where(F.col("bucket_size") <= bucket_cap)
        .groupBy("band_id", "band_hash")
        .agg(F.collect_list(member).alias("members")),
        pair_expr,
        "p",
    ).select(*[F.col(f"p.{c}").alias(c) for c in out_cols])

    star_pairs = (
        annotated.where(F.col("bucket_size") > bucket_cap)
        .select(*star_cols)
        .where(F.col("a") < F.col("b"))
    )

    # (Round-7 A/B, rejected: deduping inside a-partitions via
    # repartition("a") + row_number so the verify degree window could
    # reuse the partitioning saved an exchange on paper but measured
    # flat at 50k docs — and dropDuplicates' map-side partial
    # aggregation shrinks the pre-shuffle pair stream where the
    # repartition form ships every duplicate. Keep the aggregate form.)
    pairs = small_pairs.unionByName(star_pairs).dropDuplicates(["a", "b"])

    # bucket stats (collision buckets only) in ONE cache scan: each
    # bucket is represented by its min member (`_bmin.id` rides every
    # row off the window), so per-bucket aggregates become row-wise
    # sums over min-member rows — no per-bucket groupBy shuffle. The
    # log2 histogram (B14 skew observable) groups those ~n_buckets rows
    # into <= 64 size classes (map-side partial agg; the exchange ships
    # 64 rows), and the 1-row summary folds over the classes. The
    # earlier shape (groupBy(band_id, band_hash).first + two more aggs)
    # cost three jobs and a full-width shuffle of the bucket keys for
    # pure observability.
    is_min = F.col(id_col) == F.col("_bmin.id")
    classes = (
        annotated.where(is_min)
        .groupBy(
            F.ceil(F.log2("bucket_size")).cast("int").alias("log2_size")
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.max("bucket_size").alias("mx"),
            F.sum(
                F.when(F.col("bucket_size") > bucket_cap, 1).otherwise(0)
            ).alias("cb"),
            F.sum(
                F.when(F.col("bucket_size") > bucket_cap, F.col("bucket_size"))
                .otherwise(0)
            ).alias("cd"),
        )
    )
    # coalesce to 0: with no collision buckets the classes frame is
    # empty and bare sums would yield NULL where the pre-round-6 shape
    # yielded 0 (round-6 ADVICE: jobs/dedup_job.py emits this dict raw)
    metrics = classes.agg(
        F.coalesce(F.sum("n"), F.lit(0)).alias("buckets"),
        F.coalesce(F.max("mx"), F.lit(0)).alias("max_bucket"),
        F.coalesce(F.sum("cb"), F.lit(0)).alias("capped_buckets"),
        F.coalesce(F.sum("cd"), F.lit(0)).alias("capped_docs"),
        F.map_from_entries(
            F.sort_array(F.collect_list(F.struct("log2_size", "n")))
        ).alias("bucket_hist"),
    )
    pairs._graft_caches = [annotated]  # released by release_caches()
    return pairs, metrics
