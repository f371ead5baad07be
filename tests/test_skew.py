"""Salted skew-mitigation operators: result-identity with the unsalted
plans, on data with a manufactured hot key."""

from __future__ import annotations

from pyspark.sql import functions as F

from ingestion_pipeline_spark.operators.skew import salted_collect_list, salted_join


def _sorted_rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_salted_join_equals_plain_join_on_hot_key(spark):
    # 90% of facts hit one dim key — the shape AQE skew stats flag
    facts = spark.range(2000).select(
        F.col("id").alias("fk"),
        F.when(F.col("id") % 10 < 9, F.lit(7)).otherwise(F.col("id") % 100).alias("k"),
    )
    dim = spark.range(100).select(F.col("id").alias("k"), (F.col("id") * 2).alias("attr"))

    plain = facts.join(dim, "k").select("k", "fk", "attr")
    salted = salted_join(facts, dim, "k", salt_from=F.col("fk"), n_salts=8).select(
        "k", "fk", "attr"
    )
    assert _sorted_rows(salted) == _sorted_rows(plain)
    # salt never leaks into the schema
    assert salted.columns == plain.columns


def test_salted_join_left_outer_keeps_unmatched_facts(spark):
    facts = spark.range(50).select(F.col("id").alias("fk"), (F.col("id") % 60).alias("k"))
    dim = spark.range(10).select(F.col("id").alias("k"), F.lit("d").alias("attr"))
    plain = facts.join(dim, "k", "left").select("k", "fk", "attr")
    salted = salted_join(
        facts, dim, "k", salt_from=F.col("fk"), n_salts=4, how="left"
    ).select("k", "fk", "attr")
    assert _sorted_rows(salted) == _sorted_rows(plain)


def test_salted_collect_equals_single_stage_collect(spark):
    df = spark.range(3000).select(
        (F.col("id") % 3).alias("g"), F.col("id").alias("v")
    )
    plain = df.groupBy("g").agg(F.sort_array(F.collect_list("v")).alias("values"))
    salted = salted_collect_list(df, ["g"], "v", salt_from=F.col("v"), n_salts=8)
    assert _sorted_rows(salted.select("g", F.col("values").cast("string"))) == _sorted_rows(
        plain.select("g", F.col("values").cast("string"))
    )
