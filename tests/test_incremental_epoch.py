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


def test_mixture_manifest_incremental_equals_batch(spark, sf_dir, tmp_path):
    """Streaming twin for ``pipeline_mixture_manifest`` (verdict r6
    #6): the manifest's reprocessing-stability claim — content-hash
    draws mean new corpus batches never flip old accept decisions —
    proven through a real foreachBatch stream, the epoch-shuffle
    pattern applied to mixture sampling.  Per batch only the NEW docs
    are drawn (stateless map, no corpus read); the accumulated state
    joined with the full-corpus tilt table equals the batch query row
    for row; and under a FROZEN tilt table the accept set over batch-1
    docs is byte-identical whether evaluated after batch 1 or after
    all batches arrived."""
    from ingestion_pipeline_spark.plans.registry_ext64 import (
        mixture_accept,
        mixture_draw,
        mixture_tilts,
    )

    docs = (
        table(spark, sf_dir, "documents")
        .select("doc_id", "source", "n_chars")
        .orderBy("doc_id")
        .collect()
    )
    third = len(docs) // 3
    chunks = [
        [
            {"doc_id": r["doc_id"], "source": r["source"],
             "n_chars": r["n_chars"]}
            for r in part
        ]
        for part in (docs[:third], docs[third : 2 * third], docs[2 * third :])
    ]

    state_dir = str(tmp_path / "mix_state")
    batch_sizes: list[int] = []

    def handle(batch_df, _bid):
        # stateless half: draw ONLY the new docs — one hash per doc,
        # no corpus read, no reshuffle of prior state
        out = batch_df.select(
            "doc_id", "source", mixture_draw(F.col("doc_id")).alias("draw")
        )
        batch_sizes.append(out.count())
        out.write.mode("append").parquet(state_dir)

    _stream_batches(
        spark, tmp_path, chunks, handle,
        "doc_id long, source string, n_chars long",
    )
    assert len(batch_sizes) == 3 and sum(batch_sizes) == len(docs)
    assert all(n < len(docs) for n in batch_sizes), "no batch saw the corpus"

    # read-side merge: accumulated draws + full-corpus tilts == the
    # registered batch query, tuple for tuple (draws are reused from
    # state — recomputing them would defeat the incremental claim)
    acc = spark.read.parquet(state_dir)
    tilt_full = mixture_tilts(table(spark, sf_dir, "documents"))
    inc = {
        (r["doc_id"], r["source"], r["tilt_exp"], r["draw"])
        for r in acc.join(F.broadcast(tilt_full), "source")
        .filter(
            F.col("draw")
            < F.expr("shiftleft(CAST(1 AS BIGINT), CAST(tilt_exp AS INT))")
        )
        .select("doc_id", "source", "tilt_exp", "draw")
        .collect()
    }
    full = {
        (r["doc_id"], r["source"], r["tilt_exp"], r["draw"])
        for r in query_map()["pipeline_mixture_manifest"](
            spark, sf_dir
        ).collect()
    }
    assert inc == full

    # stability law: FREEZE the tilt table at the batch-1 snapshot;
    # the accept decisions over batch-1 docs must be identical when
    # re-evaluated after the full corpus arrived — growth never flips
    # an old decision under a frozen tilt
    first = spark.createDataFrame(
        chunks[0], "doc_id long, source string, n_chars long"
    )
    frozen_tilt = mixture_tilts(first).collect()
    frozen_df = spark.createDataFrame(frozen_tilt)
    accept_then = {
        r["doc_id"] for r in mixture_accept(first, frozen_df).collect()
    }
    first_ids = {c["doc_id"] for c in chunks[0]}
    all_df = spark.createDataFrame(
        [c for ch in chunks for c in ch],
        "doc_id long, source string, n_chars long",
    )
    accept_later = {
        r["doc_id"]
        for r in mixture_accept(all_df, frozen_df).collect()
        if r["doc_id"] in first_ids
    }
    assert accept_then == accept_later
