"""build_post_dedup.py must stay in lockstep with the queries it mirrors.

The post-dedup scale measurement (SCALE.md round-8 addendum) is only
valid while the tool's survivor rules equal the registry's own dedup
semantics:

- ``document_survivors`` mirrors
  plans/registry_ext65.py::pipeline_dedup_cascade stage-for-stage, so
  its survivor COUNT must equal the cascade's near_dup-stage
  ``docs_out`` on the same fixture.
- ``embedding_survivors`` drops exactly the distinct id_b side of the
  d_embedding_near_dups edge list, so survivors + dropped must
  partition the vector set, and no survivor may appear as id_b.

If either assertion breaks, the tool drifted from the registry and
every number it produces is measuring something else.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.build_post_dedup import document_survivors, embedding_survivors


def test_document_survivors_match_cascade_docs_out(spark, sf_dir):
    from ingestion_pipeline_spark.plans import REGISTRY

    got = document_survivors(spark, sf_dir).count()
    cascade = {
        r["stage"]: r.asDict()
        for r in REGISTRY["pipeline_dedup_cascade"].spark(spark, sf_dir).collect()
    }
    assert got == cascade["near_dup"]["docs_out"]
    # and the exact stage's keep-set is what the near stage starts from
    assert cascade["near_dup"]["docs_in"] == cascade["exact"]["docs_out"]


def test_embedding_survivors_complement_the_edge_drops(spark, sf_dir):
    from pyspark.sql import functions as F

    from ingestion_pipeline_spark.plans import REGISTRY

    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    surv = embedding_survivors(spark, sf_dir)
    edges = REGISTRY["d_embedding_near_dups"].spark(spark, sf_dir)
    dropped = edges.select(F.col("id_b").alias("vec_id")).distinct()
    assert surv.count() + dropped.count() == emb.count()
    assert surv.join(dropped, "vec_id").count() == 0
    # survivor set is edge-free by construction: rebuilding the
    # near-dup graph on survivors alone must yield zero edges
    surv_ids = surv.select("vec_id")
    both = edges.join(
        surv_ids.withColumnRenamed("vec_id", "id_a"), "id_a"
    ).join(surv_ids.withColumnRenamed("vec_id", "id_b"), "id_b")
    assert both.count() == 0
