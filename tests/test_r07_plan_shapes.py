"""Round-7 plan-shape pins for the restructured off-bench operators.

Each of these operators was rewritten in round 7 from a shuffle-heavy
shape to a map-side one (OPTIMIZATION_r07.md items 8/11/12), with the
before/after `.explain("formatted")` evidence committed under
plans/r07/. These tests pin the AFTER shape so a refactor cannot
silently reintroduce the old exchanges; the output values themselves
are pinned by the DuckDB oracle twins (tests/test_entry_oracle.py).
"""

from __future__ import annotations

SF = "/root/testdata/sf0.001"


def _docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet")


def test_repetition_scores_map_only_plan(spark):
    # item 12: all three output columns are properties of a doc's own
    # occurrence multiset — the operator must stay one map pass (the old
    # explode -> groupBy(doc, gram) -> groupBy(doc) shuffled the full
    # occurrence table twice).
    from fastcdc_rs_spark.operators.mixing import repetition_scores
    from fastcdc_rs_spark.plans import executed_plan

    plan = executed_plan(repetition_scores(_docs(spark), n=3))
    assert "Exchange" not in plan, plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan, plan
    assert plan.count("FileScan parquet") == 1, plan


def test_simhash_sql_map_side_plan(spark):
    # item 11: the 60-bit majority folds per doc over the distinct
    # gram-hash array — no grams x bits crossJoin (60x row blow-up), no
    # joins or aggregation exchanges at all before the caller's orderBy.
    import __spark_entry__ as em
    from fastcdc_rs_spark.plans import executed_plan

    plan = executed_plan(em._simhash_sql_df(spark, SF))
    # the only allowed Exchange is the entry's deliberate round-robin
    # input spread (REPARTITION_BY_NUM); no aggregation/join may add a
    # required-distribution (ENSURE_REQUIREMENTS / hashpartitioning) one
    assert "ENSURE_REQUIREMENTS" not in plan, plan
    assert "hashpartitioning" not in plan, plan
    assert "Join" not in plan and "CartesianProduct" not in plan, plan
    assert plan.count("FileScan parquet") == 1, plan


def test_vocabulary_topk_take_ordered_plan(spark):
    # item 8: the top-k is explicit (orderBy + limit plans as
    # TakeOrderedAndProject) rather than dependent on the optimizer's
    # window-group-limit inference, and no residual rank filter remains
    # above the window.
    from fastcdc_rs_spark.operators.textstats import vocabulary_topk
    from fastcdc_rs_spark.plans import executed_plan

    plan = executed_plan(vocabulary_topk(_docs(spark), k=20))
    assert "TakeOrderedAndProject" in plan, plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan, plan
