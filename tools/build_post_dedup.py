"""Build the POST-DEDUP replica the graph diagnostics deploy against.

SCALE.md's 100x sweeps show the candidate-pair-graph family
(g_triangle_counts, d_lpa_communities, d_pagerank_neardup,
d_personalized_pagerank, d_dup_clusters) growing superlinearly on the
faithful replica: the input GRAPH grows quadratically/cubically in
dup-family size (100-copy families are near-cliques), while each
operator stays linear in its edges. The documented production answer
is to run those diagnostics on the post-dedup corpus, where the
family cliques are removed by construction. This tool turns that
claim into a measurement: it materializes the post-dedup replica, so
the SAME registry queries can be timed against it with

    SPARK_GRAFT_SCALE_DIR=.scale/sf100x-dedup python tools/scale_smoke.py \
        100 g_triangle_counts d_lpa_communities d_pagerank_neardup \
        d_personalized_pagerank d_dup_clusters

What it writes into --out:

- ``embeddings.parquet``: survivors of the embedding near-dup drop
  rule — drop any vec_id that appears as id_b in the
  d_embedding_near_dups edge list (id_a < id_b, cosine >= 0.3 within
  the label block), i.e. keep only vectors with no lower-id near-dup
  partner. The survivor set is edge-free by construction; what the
  diagnostics then measure is the real residual graph cost, not the
  dup-family cliques.
- ``documents.parquet``: pipeline_dedup_cascade survivors (exact
  stage: keep min doc_id per normalized-text md5; near stage: drop
  any doc whose top-K lower-id LSH candidates contain an exact
  3-gram-Jaccard >= 0.5 partner). The drop rule here mirrors
  plans/registry_ext65.py::pipeline_dedup_cascade stage-for-stage —
  same kernels (minhash_md5_slots, jaccard3_bp), same constants —
  but materializes the SURVIVOR ID SET the 2-row attrition report
  aggregates away.
- symlinks for every other table, so any registry query runs
  unchanged against the derived dir.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def embedding_survivors(spark, base: str):
    from pyspark.sql import functions as F

    from ingestion_pipeline_spark.plans import REGISTRY

    emb = spark.read.parquet(os.path.join(base, "embeddings.parquet"))
    edges = REGISTRY["d_embedding_near_dups"].spark(spark, base)
    dropped = edges.select(F.col("id_b").alias("vec_id")).distinct()
    return emb.join(dropped, "vec_id", "left_anti")


def document_survivors(spark, base: str):
    """Cascade survivor ids — registry_ext65.pipeline_dedup_cascade's
    drop rule, keeping the rows it counts."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from ingestion_pipeline_spark.operators.dedup import (
        jaccard3_bp,
        minhash_md5_slots,
    )
    from ingestion_pipeline_spark.operators.relational import spread
    from ingestion_pipeline_spark.plans.registry_ext65 import (
        _N_BANDS,
        _N_HASHES,
        _NEAR_BP,
        _VERIFY_K,
    )

    docs = spark.read.parquet(os.path.join(base, "documents.parquet"))
    norm = F.md5(F.regexp_replace(F.trim(F.lower(F.col("text"))), r"\s+", " "))
    s1 = docs.groupBy(norm.alias("__h")).agg(F.min("doc_id").alias("doc_id"))
    d1 = docs.join(s1.select("doc_id"), "doc_id")

    mh8 = minhash_md5_slots(_N_HASHES)
    sig = (
        spread(d1.select("doc_id", "text"), min_partitions=8)
        .select("doc_id", "text", mh8(F.col("text")).alias("__mh"))
        .select(
            "doc_id",
            "text",
            *[F.col("__mh").getItem(i).alias(f"mh_{i}") for i in range(_N_HASHES)],
        )
        .filter(F.col("mh_0").isNotNull())
        .persist()
    )
    bands = sig.select(
        "doc_id",
        F.posexplode(
            F.array(
                *[
                    F.concat(F.col(f"mh_{2 * b}"), F.col(f"mh_{2 * b + 1}"))
                    for b in range(_N_BANDS)
                ]
            )
        ).alias("band", "bucket"),
    )
    left, right = bands.alias("l"), bands.alias("r")
    pnb = (
        left.join(
            right,
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.bucket") == F.col("r.bucket"))
            & (F.col("l.doc_id") < F.col("r.doc_id")),
        )
        .select(F.col("l.doc_id").alias("id_a"), F.col("r.doc_id").alias("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("nb"))
    )
    ranked = pnb.withColumn(
        "rk",
        F.row_number().over(Window.partitionBy("id_b").orderBy(F.desc("nb"), "id_a")),
    )
    jac = jaccard3_bp(3)
    drops = (
        ranked.filter(F.col("rk") <= _VERIFY_K)
        .join(sig.select(F.col("doc_id").alias("id_a"), F.col("text").alias("ta")), "id_a")
        .join(sig.select(F.col("doc_id").alias("id_b"), F.col("text").alias("tb")), "id_b")
        .filter(jac(F.col("ta"), F.col("tb")) >= _NEAR_BP)
        .select(F.col("id_b").alias("doc_id"))
        .distinct()
    )
    return docs.join(s1.select("doc_id"), "doc_id").join(drops, "doc_id", "left_anti")


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--base", default=".scale/sf100x-work")
    ap.add_argument("--out", default=".scale/sf100x-dedup")
    args = ap.parse_args()
    base, out = os.path.abspath(args.base), os.path.abspath(args.out)

    from ingestion_pipeline_spark.session import get_spark

    spark = get_spark("build-post-dedup")
    os.makedirs(out, exist_ok=True)
    counts: dict[str, int] = {}

    t0 = time.perf_counter()
    emb = embedding_survivors(spark, base)
    emb.write.mode("overwrite").parquet(os.path.join(out, "embeddings.parquet"))
    counts["embeddings_survivors"] = spark.read.parquet(
        os.path.join(out, "embeddings.parquet")
    ).count()
    emb_s = round(time.perf_counter() - t0, 1)
    spark.catalog.clearCache()

    t0 = time.perf_counter()
    doc = document_survivors(spark, base)
    doc.write.mode("overwrite").parquet(os.path.join(out, "documents.parquet"))
    counts["documents_survivors"] = spark.read.parquet(
        os.path.join(out, "documents.parquet")
    ).count()
    doc_s = round(time.perf_counter() - t0, 1)

    for t in TABLES:
        if t in ("documents", "embeddings"):
            continue
        link = os.path.join(out, f"{t}.parquet")
        if not os.path.exists(link):
            os.symlink(os.path.join(base, f"{t}.parquet"), link)

    print(
        json.dumps(
            {
                "base": base,
                "out": out,
                "counts": counts,
                "embedding_dedup_sec": emb_s,
                "document_dedup_sec": doc_s,
            }
        )
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
