"""Multimodal plumbing tests — binaryFile source, Arrow-batched feature
extraction (decode stubbed — libs not in container), frame sampling."""

from __future__ import annotations

import pytest

from ingestion_pipeline_spark.operators import multimodal as mm


@pytest.fixture(scope="module")
def media_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("media")
    (d / "a.img").write_bytes(b"\x89IMG" + bytes(range(200)))
    (d / "b.img").write_bytes(b"\x89IMG" + bytes(range(100)))
    (d / "c.vid").write_bytes(b"VID0" + bytes(range(250)) * 2)
    return str(d)


def test_read_media_dir_schema(spark, media_dir):
    df = mm.read_media_dir(spark, media_dir, "image", glob="*.img")
    rows = df.collect()
    assert len(rows) == 2
    assert df.columns == ["path", "modality", "content", "length"]
    assert all(r["length"] > 0 and r["content"] is not None for r in rows)


def test_extract_features_deterministic(spark, media_dir):
    df = mm.read_media_dir(spark, media_dir, "image", glob="*.img")
    a = {r["path"]: r["feature_hash"] for r in mm.extract_features(df).collect()}
    b = {r["path"]: r["feature_hash"] for r in mm.extract_features(df).collect()}
    assert a == b
    assert len(set(a.values())) == 2  # distinct content → distinct features


def test_decode_error_isolated(spark, media_dir):
    def broken(content: bytes, modality: str) -> dict:
        raise ValueError("corrupt")

    df = mm.read_media_dir(spark, media_dir, "image", glob="*.img")
    rows = mm.extract_features(df, decode_fn=broken).collect()
    assert len(rows) == 2
    assert all(r["feature_hash"] is None for r in rows)  # W7: nulls, not job failure


def test_sample_frames(spark, media_dir):
    vid = mm.read_media_dir(spark, media_dir, "video", glob="*.vid")
    frames = mm.sample_frames(vid, every_nth=30).collect()
    assert len(frames) >= 1
    assert all(r["frame_idx"] % 30 == 0 for r in frames)


def test_resize_images_deterministic_and_isolated(spark, media_dir):
    media = mm.read_media_dir(spark, media_dir, "image", glob="*.img")
    out = mm.resize_images(media, width=64, height=64).collect()
    assert len(out) == 2
    by_path = {r["path"]: r for r in out}
    for r in out:
        assert r["out_width"] == 64 and r["out_height"] == 64
        assert r["thumbnail"] is not None
        assert len(r["thumbnail"]) == 64 * 64 // 256 + 16
    # deterministic: same inputs -> same thumbnails
    again = {r["path"]: r["thumbnail"] for r in mm.resize_images(
        media, width=64, height=64).collect()}
    assert all(bytes(again[p]) == bytes(by_path[p]["thumbnail"]) for p in again)

    def broken(content, w, h):
        raise ValueError("corrupt")

    degraded = mm.resize_images(media, resize_fn=broken).collect()
    assert all(r["thumbnail"] is None for r in degraded)  # W7: no job failure


def test_chunk_audio_offsets(spark, media_dir):
    media = mm.read_media_dir(spark, media_dir, "audio", glob="c.vid")
    # length 504 bytes; 100-byte chunks -> 6 chunks, last one short
    chunks = mm.chunk_audio(media, chunk_ms=100, bytes_per_ms=1).collect()
    assert [c["chunk_idx"] for c in chunks] == list(range(6))
    assert chunks[0]["byte_start"] == 0 and chunks[0]["byte_end"] == 100
    assert chunks[-1]["byte_start"] == 500 and chunks[-1]["byte_end"] == 504


def test_average_hash_semantics(spark):
    """aHash invariants: identical payloads collide; a sub-threshold
    byte nudge (stays on the same side of the mean) keeps the hash; a
    mean-crossing change moves exactly that bit (Hamming distance 1);
    short payloads hash to NULL."""
    from ingestion_pipeline_spark.operators.multimodal import average_hash32

    base = bytes(range(32))  # mean 15.5 -> bits for 16..31
    nudged = bytes([31]) + base[1:]  # byte0 0->31: 31*32=992 > total? total=496+31=527... crosses
    same_side = bytes([1]) + base[1:]  # byte0 0->1: stays below mean
    rows = [
        ("a", base), ("b", base), ("c", same_side), ("d", nudged), ("short", b"tiny"),
    ]
    df = spark.createDataFrame(rows, "path STRING, content BINARY")
    got = {r["path"]: r["ahash32"] for r in average_hash32(df).collect()}
    assert got["a"] == got["b"] is not None
    assert got["short"] is None
    # python reference
    def ref(b):
        total = sum(b[:32])
        h = 0
        for i, v in enumerate(b[:32]):
            if v * 32 > total:
                h |= 1 << (31 - i)
        return h
    for k, payload in [("a", base), ("c", same_side), ("d", nudged)]:
        assert got[k] == ref(payload)
    # sub-threshold nudge: byte0 1*32=32 < total -> bit unchanged, and the
    # total shift doesn't flip any other byte's comparison here
    assert bin(got["a"] ^ got["c"]).count("1") <= 1
