"""Properties of the training-prep tranche (registry_ext15): sequence
packing invariants, mixture-rebalance bounds and determinism, semantic
dedup survivor rules."""

from __future__ import annotations

from pyspark.sql import functions as F


def _rows(df):
    return {tuple(r) for r in df.collect()}


def test_pack_sequences_invariants(spark, sf_dir):
    from ingestion_pipeline_spark.plans.registry_ext15 import (
        _SEQ_LEN,
        pipeline_pack_sequences,
    )

    out = pipeline_pack_sequences(spark, sf_dir).cache()
    bad = out.filter(
        (F.col("n_tokens") <= 0)
        | (F.col("chunk_offset") < 0)
        | (F.col("chunk_offset") >= _SEQ_LEN)
        | (F.col("chunk_last") < F.col("chunk_first"))
        | (F.col("n_chunks") != F.col("chunk_last") - F.col("chunk_first") + 1)
    )
    assert bad.count() == 0

    # Streams are gapless: within a source ordered by doc_id, each doc
    # starts exactly where the previous one ended (offset math restated
    # from the cumulative sum).
    from pyspark.sql import Window

    w = Window.partitionBy("source").orderBy("doc_id")
    start = F.col("chunk_first") * _SEQ_LEN + F.col("chunk_offset")
    gaps = (
        out.withColumn("start", start)
        .withColumn("prev_end", F.lag(F.col("start") + F.col("n_tokens")).over(w))
        .filter(F.col("prev_end").isNotNull() & (F.col("start") != F.col("prev_end")))
    )
    assert gaps.count() == 0

    # Per-source chunk count = ceil(total_tokens / seq_len).
    agg = out.groupBy("source").agg(
        F.sum("n_tokens").alias("total"), F.max("chunk_last").alias("last_chunk")
    )
    off = agg.filter(
        F.col("last_chunk") != F.floor((F.col("total") - 1) / _SEQ_LEN)
    )
    assert off.count() == 0


def test_domain_mixture_bounds_and_determinism(spark, sf_dir):
    from ingestion_pipeline_spark.plans.registry_ext15 import d_domain_mixture

    out = d_domain_mixture(spark, sf_dir).cache()
    rows = out.collect()
    assert rows, "mixture table must not be empty"
    for r in rows:
        assert 0 <= r["n_after"] <= r["n_before"]
        assert 0 < r["threshold"] <= 65536
        # a source already at/below its target share is kept whole
        if r["threshold"] == 65536:
            assert r["n_after"] == r["n_before"]
    # deterministic: a second independent plan yields the identical table
    assert _rows(out) == _rows(d_domain_mixture(spark, sf_dir))


def test_semantic_dedup_survivor_rules(spark, sf_dir):
    from ingestion_pipeline_spark.plans.registry_ext15 import d_semantic_dedup
    from ingestion_pipeline_spark.sources.parquet_tables import table

    out = d_semantic_dedup(spark, sf_dir).cache()
    n_vec = table(spark, sf_dir, "embeddings").count()
    n_out = out.count()
    assert 0 < n_out <= n_vec

    # clusters come from the 16 seed centroids; survivors are distinct
    assert out.filter((F.col("cluster") < 0) | (F.col("cluster") >= 16)).count() == 0
    assert out.select("vec_id").distinct().count() == n_out

    # deterministic: an independent plan yields the identical survivor set
    assert _rows(out) == _rows(d_semantic_dedup(spark, sf_dir))

    # no surviving pair within a cluster is above the dedup threshold —
    # the defining property, recomputed directly on the survivor set
    emb = table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    surv = out.join(emb, "vec_id")
    from ingestion_pipeline_spark.operators import similarity as sim

    cos_np = sim.cosine_pairs_np()
    a = surv.select(F.col("cluster"), F.col("vec_id").alias("ia"), F.col("embedding").alias("va"))
    b = surv.select(F.col("cluster"), F.col("vec_id").alias("ib"), F.col("embedding").alias("vb"))
    close = (
        a.join(b, ["cluster"])
        .filter(F.col("ia") < F.col("ib"))
        .withColumn("sim", F.round(cos_np(F.col("va"), F.col("vb")), 6))
        .filter(F.col("sim") >= 0.35)
    )
    assert close.count() == 0
