"""Connected-components dedup clustering + sketch-aggregate accuracy."""

from __future__ import annotations

from pyspark.sql import functions as F

from ingestion_pipeline_spark.operators.graph import connected_components, dup_clusters


def test_connected_components_chain_triangle(spark):
    # chain 1-2-3-4 (diameter 3), triangle 10-11-12, isolated pair 20-21
    edges = spark.createDataFrame(
        [(2, 1), (2, 3), (3, 4), (10, 11), (11, 12), (10, 12), (21, 20)],
        "src bigint, dst bigint",
    )
    got = {
        (r["n"], r["component"]) for r in connected_components(edges).collect()
    }
    assert got == {
        (1, 1), (2, 1), (3, 1), (4, 1),
        (10, 10), (11, 10), (12, 10),
        (20, 20), (21, 20),
    }


def test_dup_clusters_singletons_and_survivors(spark):
    ids = spark.createDataFrame([(i,) for i in range(1, 8)], "doc_id bigint")
    pairs = spark.createDataFrame(
        [(1, 5), (5, 6), (2, 3)], "id_a bigint, id_b bigint"
    )
    assigned = dup_clusters(ids, pairs, "doc_id")
    got = {(r["doc_id"], r["component"]) for r in assigned.collect()}
    assert got == {
        (1, 1), (5, 1), (6, 1),   # one cluster via 1-5-6
        (2, 2), (3, 2),
        (4, 4), (7, 7),           # untouched docs are singletons
    }
    survivors = {
        r["doc_id"]
        for r in assigned.filter(F.col("doc_id") == F.col("component")).collect()
    }
    assert survivors == {1, 2, 4, 7}


def test_sketch_aggregates_accuracy(spark, sf_dir):
    from ingestion_pipeline_spark.sources.parquet_tables import table

    ev = table(spark, sf_dir, "events")
    exact = {
        r["event_type"]: (r["users"], r["p50"])
        for r in ev.groupBy("event_type")
        .agg(
            F.count_distinct("user_id").alias("users"),
            F.expr("percentile(value, 0.5)").alias("p50"),
        )
        .collect()
    }
    approx = {
        r["event_type"]: (r["approx_users"], r["value_quantiles"][0])
        for r in ev.groupBy("event_type")
        .agg(
            F.approx_count_distinct("user_id", rsd=0.02).alias("approx_users"),
            F.percentile_approx("value", [0.5, 0.95, 0.99], 10_000).alias(
                "value_quantiles"
            ),
        )
        .collect()
    }
    assert exact.keys() == approx.keys()
    for etype, (users, p50) in exact.items():
        a_users, a_p50 = approx[etype]
        assert abs(a_users - users) / users <= 0.05
        spread_ref = max(abs(p50), 1e-9)
        assert abs(a_p50 - p50) / spread_ref <= 0.05


def test_dataset_split_stable_under_repartitioning(spark, sf_dir):
    from ingestion_pipeline_spark.functions.sampling import (
        dataset_split,
        deterministic_sample,
    )
    from ingestion_pipeline_spark.sources.parquet_tables import table
    from pyspark.sql import functions as F

    docs = table(spark, sf_dir, "documents")
    a = {r["doc_id"]: r["split"] for r in docs.select(
        "doc_id", dataset_split(F.col("doc_id")).alias("split")).collect()}
    b = {r["doc_id"]: r["split"] for r in docs.repartition(13).select(
        "doc_id", dataset_split(F.col("doc_id")).alias("split")).collect()}
    assert a == b  # partitioning-independent (sample()/sampleBy() are not)

    n = len(a)
    from collections import Counter
    frac = {k: v / n for k, v in Counter(a.values()).items()}
    assert 0.7 <= frac["train"] <= 0.9
    assert 0.04 <= frac.get("val", 0) <= 0.18
    assert 0.04 <= frac.get("test", 0) <= 0.18

    kept = docs.filter(deterministic_sample(F.col("doc_id"), 0.25)).count()
    assert 0.15 <= kept / n <= 0.35
