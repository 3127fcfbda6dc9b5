"""Relational operators: semantic unit tests on tiny frames plus
physical-plan quality (pushdown, broadcast dims, no cartesian)."""

from __future__ import annotations

import datetime as dt

import pyspark.sql.functions as F

from fastcdc_rs_spark.operators.relational import (
    late_order_priority,
    pricing_summary,
    revenue_by_nation,
    top_customers_per_nation,
)
from fastcdc_rs_spark.plans import (
    assert_broadcast_join,
    assert_no_cartesian,
    assert_pushed_filter,
    assert_read_schema,
)

SF = "/root/testdata/sf0.001"


def _t(spark, name):
    return spark.read.parquet(f"{SF}/{name}.parquet")


def test_pricing_summary_semantics(spark):
    ts = dt.datetime
    rows = [
        # flag, status, qty, ext, disc, tax, shipdate
        ("A", "F", 10.0, 100.00, 0.10, 0.05, ts(1996, 1, 1)),
        ("A", "F", 20.0, 200.00, 0.00, 0.00, ts(1996, 1, 2)),
        ("A", "F", 5.0, 50.00, 0.05, 0.02, ts(2005, 1, 1)),  # after cutoff
        ("R", "O", 1.0, 10.00, 0.02, 0.01, ts(1997, 6, 1)),
    ]
    li = spark.createDataFrame(
        rows,
        "l_returnflag string, l_linestatus string, l_quantity double, "
        "l_extendedprice double, l_discount double, l_tax double, "
        "l_shipdate timestamp",
    )
    out = {(r.l_returnflag, r.l_linestatus): r
           for r in pricing_summary(li, cutoff="2000-09-02").collect()}
    af = out[("A", "F")]
    assert af.sum_qty == 30 and af.count_order == 2
    assert af.sum_base_price == 300.0
    # 100*0.9 + 200*1.0 = 290; charge = 90*1.05 + 200 = 294.5
    assert af.sum_disc_price == 290.0
    assert af.sum_charge == 294.5
    assert af.avg_qty == 15.0 and af.avg_disc == 0.05
    assert ("A", "F") in out and len(out) == 2


def test_revenue_and_topn_on_driver_tables(spark):
    rev = revenue_by_nation(
        _t(spark, "customer"), _t(spark, "orders"),
        _t(spark, "lineitem"), _t(spark, "nation"),
    )
    rows = rev.collect()
    assert len(rows) > 0
    assert all(r.revenue > 0 for r in rows)

    top = top_customers_per_nation(
        _t(spark, "customer"), _t(spark, "orders"), _t(spark, "nation"), k=3
    ).collect()
    by_nation: dict[str, list] = {}
    for r in top:
        by_nation.setdefault(r.n_name, []).append(r)
    for rs in by_nation.values():
        assert len(rs) <= 3
        rs = sorted(rs, key=lambda r: r.rank)
        assert [r.rank for r in rs] == list(range(1, len(rs) + 1))
        revs = [r.revenue for r in rs]
        assert revs == sorted(revs, reverse=True)


def test_late_order_priority_semi_join(spark):
    out = late_order_priority(_t(spark, "orders"), _t(spark, "lineitem"))
    rows = out.collect()
    n_late = sum(r.n_late_orders for r in rows)
    total = _t(spark, "orders").count()
    assert 0 < n_late <= total  # semi-join counts orders at most once


def test_customers_without_orders_anti_join(spark):
    from fastcdc_rs_spark.operators.relational import customers_without_orders

    out = customers_without_orders(_t(spark, "customer"), _t(spark, "orders"))
    rows = out.collect()
    custs_with = {
        r[0] for r in _t(spark, "orders").select("o_custkey").distinct().collect()
    }
    got = {r.c_custkey for r in rows}
    assert got.isdisjoint(custs_with)
    assert len(got) + len(custs_with) == _t(spark, "customer").count()
    # plan: the orders side is pruned to the join key at the scan
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "LeftAnti" in plan, plan
    assert "ReadSchema: struct<o_custkey:bigint>" in plan, plan
    # value-bearing variant (the driver query): restricting the orders
    # side makes the anti-set non-empty
    import pyspark.sql.functions as F

    urgent = _t(spark, "orders").where(F.col("o_orderpriority") == "1-URGENT")
    some = customers_without_orders(_t(spark, "customer"), urgent)
    assert some.count() > 0


def test_plan_pricing_summary_pushdown(spark):
    df = pricing_summary(_t(spark, "lineitem"))
    plan = assert_pushed_filter(df, "LessThanOrEqual(l_shipdate")
    # column pruning: only the 7 needed columns are read
    assert_read_schema(
        df,
        "struct<l_quantity:double,l_extendedprice:double,l_discount:double,"
        "l_tax:double,l_returnflag:string,l_linestatus:string,"
        "l_shipdate:timestamp>",
        absent="l_partkey",
    )
    assert "CartesianProduct" not in plan


def test_plan_revenue_broadcasts_dimension(spark):
    df = revenue_by_nation(
        _t(spark, "customer"), _t(spark, "orders"),
        _t(spark, "lineitem"), _t(spark, "nation"),
    )
    assert_broadcast_join(df)
    assert_no_cartesian(df)
    # orderdate range filter is pushed to the orders scan
    assert_pushed_filter(df, "GreaterThanOrEqual(o_orderdate")


def test_plan_topn_window_on_aggregate(spark):
    df = top_customers_per_nation(
        _t(spark, "customer"), _t(spark, "orders"), _t(spark, "nation"), k=3
    )
    plan = assert_broadcast_join(df)
    # the window input is the aggregated per-customer frame: the plan's
    # Window node must sit above a HashAggregate, not above the raw scan
    assert "Window" in plan and "HashAggregate" in plan
