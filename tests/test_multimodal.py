"""Multimodal plumbing tests: mapInPandas batch contracts, frame
sampling math, and the explicit decode stub."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from simpleetlpipeline_spark.functions import multimodal as M


def test_decode_media_rejects_compressed_containers():
    """Formats needing codec libraries refuse explicitly (no
    plausible-but-wrong decode); BMP/WAV are the real tier."""
    with pytest.raises(ValueError, match="unsupported media container"):
        M.decode_media(b"\x89PNG..." + b"\x00" * 60, "image")


def test_decode_bmp_wav_roundtrip():
    """Real-decode tier: encode -> decode recovers exact pixel and
    sample bytes, including row-stride padding and bottom-up order
    (pixels come back TOP-row-major) and the WAV RIFF chunk walk."""
    import numpy as np

    data = bytes(range(32, 32 + M.BMP_W * M.BMP_H * 3))
    img = M.decode_media(M._encode_bmp(data))
    assert img["kind"] == "image"
    assert (img["width"], img["height"]) == (M.BMP_W, M.BMP_H)
    assert img["pixels"].reshape(-1).tobytes() == data

    # short payload zero-pads
    assert int(M.decode_media(
        M._encode_bmp(b"ab"))["pixels"].sum()) == ord("a") + ord("b")

    wav = M.decode_media(M._encode_wav(bytes(range(40, 104))))
    assert wav["kind"] == "audio"
    assert wav["sample_rate"] == M.WAV_RATE
    assert wav["n_channels"] == 1
    assert np.array_equal(
        wav["samples"][:64],
        np.arange(40, 104, dtype=np.int16))

    # non-PCM WAV refuses rather than mis-decoding
    import struct

    blob = bytearray(M._encode_wav(b"xy"))
    struct.pack_into("<H", blob, 20, 3)  # fmt 3 = IEEE float
    with pytest.raises(ValueError, match="unsupported WAV"):
        M.decode_wav(bytes(blob))


def test_documents_fixture_is_ascii(spark, sf_dir):
    """media_decode_report's DuckDB oracle models text bytes as
    unicode codepoints (codepoint == byte) and empty text as a
    zero content_sum, so the documents corpus must stay non-empty
    ASCII; a regenerated non-ASCII fixture should fail HERE, not as
    an unexplained hash-red in the driver gate."""
    from simpleetlpipeline_spark.io import read_table

    bad = (
        read_table(spark, sf_dir, "documents")
        .filter((F.length("text") == 0)
                | (F.octet_length("text") != F.length("text")))
        .count())
    assert bad == 0


def test_media_table_schema(spark, sf_dir):
    df = M.media_table(spark, sf_dir)
    assert dict(df.dtypes) == {
        "media_id": "bigint", "media_type": "string", "payload": "binary"}
    types = {r["media_type"] for r in df.select("media_type").distinct().collect()}
    assert types == {"image", "audio", "video"}


def test_frame_sample_counts(spark, sf_dir):
    rows = M.frame_sample(spark, sf_dir).collect()
    cat = {r["media_id"]: r["n_bytes"]
           for r in M.media_catalog(spark, sf_dir).collect()}
    for r in rows:
        n_frames = math.ceil(cat[r["media_id"]] / M.FRAME_BYTES)
        assert r["n_frames"] == n_frames
        assert r["n_kept"] == math.ceil(n_frames / M.FRAME_STRIDE)
        assert len(r["sampled_payload"]) <= cat[r["media_id"]]


def test_meta_extract_deterministic_and_bounded(spark, sf_dir):
    a = {r["media_id"]: (r["width"], r["height"], r["duration_s"])
         for r in M.media_meta_extract(spark, sf_dir).collect()}
    b = {r["media_id"]: (r["width"], r["height"], r["duration_s"])
         for r in M.media_meta_extract(spark, sf_dir).collect()}
    assert a == b
    assert all(1 <= w <= 1920 and 1 <= h <= 1080 for w, h, _ in a.values())


def test_images_have_zero_duration(spark, sf_dir):
    rows = M.media_meta_extract(spark, sf_dir).collect()
    assert all(
        (r["duration_s"] == 0) == (r["media_type"] == "image") for r in rows)


def test_feature_extract_deterministic_unit_norm(spark, sf_dir):
    import math

    a = {r["media_id"]: list(r["features"])
         for r in M.media_features(spark, sf_dir).collect()}
    b = {r["media_id"]: list(r["features"])
         for r in M.media_features(spark, sf_dir).collect()}
    assert a == b
    for v in a.values():
        assert len(v) == 16
        assert abs(math.sqrt(sum(x * x for x in v)) - 1.0) < 1e-5


def test_resize_halves_decoded_dims(spark, sf_dir):
    meta = {r["media_id"]: (r["width"], r["height"])
            for r in M.media_meta_extract(spark, sf_dir).collect()}
    res = {r["media_id"]: (r["width"], r["height"])
           for r in M.media_resize(spark, sf_dir).collect()}
    for mid, (w, h) in meta.items():
        assert res[mid] == (max(1, w // 2), max(1, h // 2))


def test_media_table_from_dir_contract(spark, tmp_path):
    """binaryFile ingest must produce the exact media_table schema
    contract and feed the same downstream kernels as the fabricated
    table (meta extract + frame sampling run unchanged on it)."""
    from simpleetlpipeline_spark.functions.multimodal import (
        extract_meta,
        media_table_from_dir,
        sample_frames,
    )

    files = {
        "a.jpg": b"\xff\xd8fakejpegbytes" * 20,
        "sub/b.mp3": b"ID3fakeaudio" * 40,
        "sub/deep/c.mp4": b"\x00\x00ftypmp4" * 64,
        "notes.txt": b"not media at all",
    }
    for rel, payload in files.items():
        p = tmp_path / rel
        p.parent.mkdir(parents=True, exist_ok=True)
        p.write_bytes(payload)

    media = media_table_from_dir(spark, str(tmp_path))
    assert [f.name for f in media.schema.fields] == [
        "media_id", "media_type", "payload"]
    rows = media.collect()
    assert len(rows) == 4
    by_type = {}
    for r in rows:
        by_type.setdefault(r["media_type"], []).append(bytes(r["payload"]))
    assert sorted(by_type) == ["audio", "image", "other", "video"]
    assert by_type["image"] == [files["a.jpg"]]       # payload verbatim
    assert by_type["audio"] == [files["sub/b.mp3"]]   # recursive lookup
    assert len({r["media_id"] for r in rows}) == 4    # ids unique

    meta = {r["media_id"]: r for r in extract_meta(media).collect()}
    assert len(meta) == 4
    for r in rows:
        assert meta[r["media_id"]]["n_bytes"] == len(bytes(r["payload"]))

    fs = sample_frames(media, frame_bytes=16, stride=2).collect()
    for r in fs:
        assert r["n_kept"] == (r["n_frames"] + 1) // 2


def test_media_ingest_rollup_binaryfile_path(spark, sf_dir):
    """The real-ingest catalog entry: fixture dir built from the
    documents table, scanned via binaryFile, rolled up per type with
    planted byte-identical duplicates detected."""
    from simpleetlpipeline_spark.functions.multimodal import (
        _ingest_fixture_dir,
        media_ingest_rollup,
    )
    import os

    root = _ingest_fixture_dir(spark, sf_dir)
    n_files = len(os.listdir(root))
    # sf0.001: 500 docs -> 50 selected (doc_id%10==0) + 10 copies
    assert n_files == 60
    rows = {r["media_type"]: r for r in
            media_ingest_rollup(spark, sf_dir).collect()}
    assert sorted(rows) == ["audio", "image", "video"]
    assert sum(r["n_files"] for r in rows.values()) == 60
    # every planted *_copy.* twin is a duplicate payload
    assert sum(r["n_dup_files"] for r in rows.values()) >= 10
    assert all(r["total_bytes"] > 0 and r["total_width"] > 0
               for r in rows.values())
    # rebuild is a no-op when the completeness marker exists
    assert _ingest_fixture_dir(spark, sf_dir) == root
