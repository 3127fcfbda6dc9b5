"""Salted-join exactness (B12)."""

from __future__ import annotations

import pyspark.sql.functions as F

from fastcdc_rs_spark.operators.skew import salted_join


def test_salted_join_exact(spark):
    # power-law probe: one hot key with 5000 rows, 50 cold keys
    probe = spark.range(5000).select(
        F.lit("hot").alias("k"), F.col("id").alias("v")
    ).unionByName(
        spark.range(50).select(
            F.concat(F.lit("cold"), F.col("id")).alias("k"), F.col("id").alias("v")
        )
    )
    build = spark.createDataFrame(
        [("hot", 1.0)] + [(f"cold{i}", float(i)) for i in range(50)], "k string, w double"
    )
    salted = salted_join(probe, build, ["k"], n_salts=8)
    plain = probe.join(build, "k")
    assert salted.count() == plain.count() == 5050
    assert salted.agg(F.sum("v")).first()[0] == plain.agg(F.sum("v")).first()[0]
    assert "_salt" not in salted.columns
