"""Multimodal operator tests: the decode step is a documented deterministic
fake (real codecs absent in this environment — SURVEY brief: stub the codec,
make the Spark-side schema/partitioning/batch plumbing real and test THAT);
resize / features / frame-sample are real vectorized math, verified against
straightforward per-row Python oracles."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from pyspark.sql import functions as F

from parquet_main_spark.operators.multimodal import (
    IMG_MAGIC,
    audio_meta,
    decode_images,
    image_features,
    resize_images,
    sample_frames,
    synth_audio_blobs,
    synth_image_blobs,
)

N = 60


def _expected_image(i: int):
    w = 8 + i % 9
    h = 6 + i % 7
    j = np.arange(w * h, dtype=np.int64)
    px = ((i * 2654435761 + j * 40503) % 256).astype(np.uint8)
    return w, h, px


def test_decode_images_fake_codec(spark):
    decoded = decode_images(synth_image_blobs(spark, N)).toPandas().set_index("media_id")
    assert len(decoded) == N
    for i in (0, 7, 41, N - 1):
        w, h, px = _expected_image(i)
        row = decoded.loc[i]
        assert (row["width"], row["height"], row["channels"]) == (w, h, 1)
        assert bytes(row["pixels"]) == px.tobytes()


def test_decode_rejects_garbage_and_truncated(spark):
    df = spark.createDataFrame(
        [(0, bytes(b"NOPE") + b"\x00" * 100),
         (1, IMG_MAGIC + struct.pack("<HHB", 100, 100, 1) + b"\x01" * 10),
         (2, None),
         (3, b"")],
        "media_id bigint, blob binary",
    )
    out = decode_images(df).toPandas().sort_values("media_id")
    assert out["width"].tolist() == [0, 0, 0, 0]
    assert [len(p) for p in out["pixels"]] == [0, 0, 0, 0]


def test_resize_and_features_match_numpy_oracle(spark):
    decoded = decode_images(synth_image_blobs(spark, N))
    small = resize_images(decoded, 4, 3).toPandas().set_index("media_id")
    feats = image_features(decoded).toPandas().set_index("media_id")
    for i in (3, 22, 50):
        w, h, px = _expected_image(i)
        img = px.reshape(h, w, 1)
        yi = (np.arange(3) * h // 3)
        xi = (np.arange(4) * w // 4)
        want = img[yi[:, None], xi[None, :], :].ravel()
        assert bytes(small.loc[i]["pixels"]) == want.tobytes()
        assert small.loc[i]["width"] == 4 and small.loc[i]["height"] == 3
        f = feats.loc[i]
        assert f["n_pixels"] == w * h
        assert abs(f["mean_px"] - px.mean()) < 1e-9
        assert abs(f["std_px"] - px.std()) < 1e-9


def test_sample_frames_matches_python_oracle(spark):
    docs = spark.createDataFrame(
        [(0, bytes(range(256)) * 5),          # 5 full 256B frames
         (1, b"x" * 100),                     # no complete frame
         (2, None),                           # null blob
         (3, bytes(reversed(range(256))) * 9 + b"tail")],  # 9 frames + tail
        "doc_id bigint, blob binary",
    )
    out = sample_frames(docs, frame_bytes=256, every_n=4,
                        blob_col="blob", key_col="doc_id").toPandas()
    got = {(r.media_id, r.frame_idx): bytes(r.frame) for r in out.itertuples()}
    want = {}
    for did, blob in [(0, bytes(range(256)) * 5), (1, b"x" * 100),
                      (3, bytes(reversed(range(256))) * 9 + b"tail")]:
        for fi in range(0, len(blob) // 256, 4):
            want[(did, fi)] = blob[fi * 256:(fi + 1) * 256]
    assert got == want


def test_audio_meta(spark):
    import struct

    import numpy as np

    from parquet_main_spark.operators.multimodal import (
        AUD_MAGIC, PCM_SHIFT, PX_K1, PX_K2,
    )

    blobs = {r["media_id"]: bytes(r["blob"])
             for r in synth_audio_blobs(spark, 30).collect()}
    meta = audio_meta(synth_audio_blobs(spark, 30)).toPandas().set_index("media_id")
    assert len(meta) == 30
    for i in (0, 1, 2, 29):
        rate = (8000, 16000, 44100)[i % 3]
        ch = 1 + i % 2
        n_pcm = rate // 100 * ch * 2
        # header AND PCM bytes pinned from the arithmetic alone (the corpus
        # must stay SQL-derivable; rng PCM was r4's un-oracle-able trap)
        j = np.arange(n_pcm, dtype=np.int64)
        pcm = ((i * PX_K1 + j * PX_K2 + PCM_SHIFT) % 256).astype(np.uint8)
        assert blobs[i] == (AUD_MAGIC + struct.pack("<IHH", rate, ch, 16)
                            + pcm.tobytes())
        row = meta.loc[i]
        assert (row["sample_rate"], row["channels"], row["bits"]) == (rate, ch, 16)
        assert row["duration_ms"] == n_pcm * 1000 // (rate * ch * 2)
        assert row["pcm_sum"] == int(pcm.astype(np.int64).sum())


def test_audio_meta_rejects_garbage(spark):
    """Short / wrong-magic blobs zero out instead of mis-parsing."""
    df = spark.createDataFrame(
        [(0, b"FAUDxx"), (1, b"NOPE" + b"\x00" * 20), (2, None)],
        "media_id bigint, blob binary")
    rows = {r["media_id"]: r for r in audio_meta(df).collect()}
    for i in (0, 1, 2):
        assert rows[i]["sample_rate"] == 0 and rows[i]["pcm_sum"] == 0


def test_decode_not_implemented_without_fake(spark):
    df = synth_image_blobs(spark, 4)
    with pytest.raises(Exception) as exc:
        decode_images(df, allow_fake=False).collect()
    assert "NotImplementedError" in str(exc.value) or isinstance(
        exc.value, NotImplementedError
    )


def test_media_blobs_roundtrip_through_engine(spark, tmp_path):
    """The multimodal columns ride the ENGINE: encode the fake-media corpus
    (binary blob column), scan it back, decode — end-to-end through the
    columnar format, not just through mapInArrow."""
    from parquet_main_spark.operators.decode import scan
    from parquet_main_spark.operators.encode import EncodeConfig, encode_table

    media = synth_image_blobs(spark, N)
    out = str(tmp_path / "media")
    encode_table(spark, media, EncodeConfig(out_dir=out, bucket_key="media_id",
                                            buckets=2, block_size=16,
                                            snapshot_id="m1"))
    back = scan(spark, out)
    decoded = decode_images(back).toPandas().set_index("media_id")
    assert len(decoded) == N
    w, h, px = _expected_image(17)
    assert bytes(decoded.loc[17]["pixels"]) == px.tobytes()
