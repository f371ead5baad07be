"""Token-budget selection and unigram-surprisal properties
(registry_ext17)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F


def test_budget_select_is_quality_prefix_and_budget_bound(spark, sf_dir):
    from ingestion_pipeline_spark.functions.text import quality_score, token_count
    from ingestion_pipeline_spark.plans.registry_ext17 import (
        _BUDGET,
        pipeline_token_budget_select,
    )
    from ingestion_pipeline_spark.sources.parquet_tables import table

    out = pipeline_token_budget_select(spark, sf_dir).cache()
    # every admitted doc started within budget
    assert out.filter(F.col("cum") - F.col("n_tokens") >= _BUDGET).count() == 0

    # the admitted set is exactly the best-quality prefix: recompute the
    # full ordering and check the selection is rank <= |admitted| per source
    docs = table(spark, sf_dir, "documents")
    full = docs.select(
        "doc_id",
        "source",
        token_count(F.col("text")).alias("n_tokens"),
        F.round(quality_score(F.col("text")), 6).alias("quality"),
    ).filter(F.col("n_tokens") > 0)
    from pyspark.sql import Window

    rk = F.row_number().over(
        Window.partitionBy("source").orderBy(F.col("quality").desc(), F.col("doc_id"))
    )
    ranked = full.withColumn("rk", rk)
    n_admitted = out.groupBy("source").agg(F.count("*").alias("n_adm"))
    prefix = (
        ranked.join(n_admitted, "source")
        .filter(F.col("rk") <= F.col("n_adm"))
        .select("doc_id")
    )
    sym_diff = prefix.join(out.select("doc_id"), "doc_id", "full")
    assert (
        sym_diff.filter(F.col("doc_id").isNull()).count() == 0
        and prefix.count() == out.count()
    )


def test_unigram_surprisal_bounds(spark, sf_dir):
    from ingestion_pipeline_spark.functions.text import word_tokens
    from ingestion_pipeline_spark.plans.registry_ext17 import tx_unigram_surprisal
    from ingestion_pipeline_spark.sources.parquet_tables import table

    out = tx_unigram_surprisal(spark, sf_dir).cache()
    docs = table(spark, sf_dir, "documents")
    total = docs.select(
        F.explode(word_tokens(F.lower(F.col("text")))).alias("w")
    ).count()
    n_docs_with_tokens = docs.filter(
        F.size(word_tokens(F.lower(F.col("text")))) > 0
    ).count()
    assert out.count() == n_docs_with_tokens

    # 0 < surprisal <= log2(total): p(word) ranges (1/total, 1]
    hi = math.log2(total) + 1e-6
    assert out.filter(
        (F.col("mean_surprisal") <= 0) | (F.col("mean_surprisal") > hi)
    ).count() == 0


def test_bloom_novel_equals_plain_antijoin(spark, sf_dir):
    from pyspark.sql import functions as F

    from ingestion_pipeline_spark.operators.dedup import content_md5
    from ingestion_pipeline_spark.plans.registry_ext18 import (
        _BATCH_SPLIT,
        d_bloom_novel_docs,
    )
    from ingestion_pipeline_spark.sources.parquet_tables import table

    out = {tuple(r) for r in d_bloom_novel_docs(spark, sf_dir).collect()}
    docs = table(spark, sf_dir, "documents").select(
        "doc_id", "source", content_md5(F.col("text")).alias("h")
    )
    corpus_h = docs.filter(F.col("doc_id") < _BATCH_SPLIT).select("h").distinct()
    plain = {
        tuple(r)
        for r in docs.filter(F.col("doc_id") >= _BATCH_SPLIT)
        .join(corpus_h, "h", "left_anti")
        .select("doc_id", "source")
        .collect()
    }
    # sketch false positives cost extra confirm work but never change
    # the answer; false negatives are impossible (all k positions of a
    # present hash are set) — so the result is exactly the anti-join
    assert out == plain
