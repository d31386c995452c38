"""Multimodal (image/audio/video) operators over opaque binary columns.

The model: media rides the engine as `binary` blobs next to typed metadata
columns (the reference's BYTE_ARRAY path carries arbitrary bytes the same
way, StringWriteSupport.java binary branch). Decode / resize / feature
extraction / frame sampling are Arrow-batched `mapInArrow` stages — schema,
partitioning, UDF signature and batch shape are REAL and tested; only the
actual image/audio codec is stubbed (PIL/soundfile are not installed in this
environment): `decode_images` tries the real decoder first and otherwise
uses a documented deterministic fake header format, or raises
`NotImplementedError` when `allow_fake=False`.

Fake image blob layout (what `synth_image_blobs` writes and the fake decoder
parses): 4-byte magic b"FIMG", uint16 LE width, uint16 LE height, uint8
channels, then width*height*channels payload bytes (grayscale pixels).
Fake audio blob layout: 4-byte magic b"FAUD", uint32 LE sample_rate, uint16
LE channels, uint16 LE bits_per_sample, then PCM payload bytes.

Scale notes (100 TB): every stage is one `mapInArrow` pass — no shuffle, no
driver collect; per-batch work is numpy-vectorized (the only per-row Python
is the ragged-image resize loop, bounded by Arrow batch size and dominated
by the numpy resample itself). Frame sampling gathers all sampled bytes with
ONE fancy-index `np.take` per batch and rebuilds the output binary column
from a single contiguous buffer.
"""

from __future__ import annotations

import struct
from typing import Iterator

import numpy as np
import pyarrow as pa

from pyspark.sql import DataFrame

IMG_MAGIC = b"FIMG"
AUD_MAGIC = b"FAUD"
_IMG_HDR = 4 + 2 + 2 + 1  # magic, w, h, channels
_AUD_HDR = 4 + 4 + 2 + 2  # magic, rate, channels, bits


def _real_image_decoder():
    """Real decoder hook: present only when PIL is importable (not in this
    container). Returns None -> callers fall back to the fake codec."""
    try:  # pragma: no cover - PIL absent in the target environment
        from PIL import Image  # noqa: F401

        return Image
    except ImportError:
        return None


def _blob_np(blob_arr: pa.Array) -> tuple[np.ndarray, np.ndarray, np.ndarray | None]:
    """binary array -> (byte offsets int64[n+1], flat uint8 buffer, notnull
    mask or None) straight from the Arrow buffers."""
    if isinstance(blob_arr, pa.ChunkedArray):
        blob_arr = blob_arr.combine_chunks()
    big = blob_arr.cast(pa.large_binary())
    mask = np.asarray(big.is_valid()) if big.null_count else None
    offsets = np.frombuffer(big.buffers()[1], dtype=np.int64)[
        big.offset : big.offset + len(big) + 1
    ]
    data = big.buffers()[2]
    flat = (np.frombuffer(data, dtype=np.uint8) if data is not None
            else np.empty(0, dtype=np.uint8))
    return offsets, flat, mask


def _bin_from_parts(parts_off: np.ndarray, flat: np.ndarray) -> pa.Array:
    """(int64 offsets, contiguous uint8 buffer) -> binary array, zero-copy."""
    return pa.Array.from_buffers(
        pa.large_binary(), len(parts_off) - 1,
        [None, pa.py_buffer(parts_off.tobytes()), pa.py_buffer(flat.tobytes())],
    ).cast(pa.binary())


# ------------------------------------------------------------------ synth

#: Pixel value of flat index j in fake image media_id — plain BIGINT
#: arithmetic (Knuth multiplicative hash) so a SQL oracle (DuckDB) can
#: recompute every pixel exactly; same trick as the IVF codebook
#: (queries.py). Both factors keep media_id*K1 + j*K2 far below 2^63.
PX_K1 = 2654435761
PX_K2 = 40503
#: audio PCM bytes use the same arithmetic shifted by this constant, so an
#: audio blob with the same media_id differs from the image's pixels while
#: staying exactly SQL-derivable
PCM_SHIFT = 101


def synth_image_blobs(spark, n: int, partitions: int = 4) -> DataFrame:
    """Deterministic fake-image corpus: (media_id bigint, blob binary).
    Dimensions and pixels derive from media_id alone via integer arithmetic
    (``px[j] = (media_id*PX_K1 + j*PX_K2) % 256``), so any two runs, the
    tests' expectations, AND a pure-SQL oracle agree byte-for-byte."""

    def gen(it: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for batch in it:
            ids = batch.column("id").to_numpy()
            blobs = []
            for i in ids:
                w = 8 + int(i) % 9          # 8..16
                h = 6 + int(i) % 7          # 6..12
                j = np.arange(w * h, dtype=np.int64)
                px = ((int(i) * PX_K1 + j * PX_K2) % 256).astype(np.uint8)
                blobs.append(IMG_MAGIC + struct.pack("<HHB", w, h, 1) + px.tobytes())
            yield pa.RecordBatch.from_arrays(
                [pa.array(ids, type=pa.int64()), pa.array(blobs, type=pa.binary())],
                ["media_id", "blob"],
            )

    return spark.range(0, n, numPartitions=partitions).mapInArrow(
        gen, "media_id bigint, blob binary"
    )


def synth_audio_blobs(spark, n: int, partitions: int = 4) -> DataFrame:
    """Deterministic fake-audio corpus: (media_id bigint, blob binary).
    PCM bytes are plain BIGINT arithmetic just like the image pixels
    (``pcm[j] = (media_id*PX_K1 + j*PX_K2 + PCM_SHIFT) % 256``, 10 ms of
    16-bit samples), so the tests' expectations AND a pure-SQL oracle can
    re-derive every byte — rng-sourced PCM was the same un-oracle-able trap
    the image corpus escaped in round 5."""

    def gen(it: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for batch in it:
            ids = batch.column("id").to_numpy()
            blobs = []
            for i in ids:
                rate = (8000, 16000, 44100)[int(i) % 3]
                ch = 1 + int(i) % 2
                j = np.arange(rate // 100 * ch * 2, dtype=np.int64)  # 10 ms
                pcm = ((int(i) * PX_K1 + j * PX_K2 + PCM_SHIFT) % 256).astype(np.uint8)
                blobs.append(AUD_MAGIC + struct.pack("<IHH", rate, ch, 16)
                             + pcm.tobytes())
            yield pa.RecordBatch.from_arrays(
                [pa.array(ids, type=pa.int64()), pa.array(blobs, type=pa.binary())],
                ["media_id", "blob"],
            )

    return spark.range(0, n, numPartitions=partitions).mapInArrow(
        gen, "media_id bigint, blob binary"
    )


# ------------------------------------------------------------------ decode

DECODE_SCHEMA = "media_id bigint, width int, height int, channels int, pixels binary"


def decode_images(df: DataFrame, blob_col: str = "blob", key_col: str = "media_id",
                  allow_fake: bool = True) -> DataFrame:
    """Opaque blobs -> (width, height, channels, raw pixel buffer).

    The real-codec path is STUBBED (PIL is not wired even where importable);
    with ``allow_fake=True`` (the test/bench path) the documented fake
    header is parsed instead, otherwise NotImplementedError. One mapInArrow
    pass, header fields parsed vectorized from the flat byte buffer."""
    if not allow_fake:
        real = "importable" if _real_image_decoder() is not None else "not installed"
        raise NotImplementedError(
            f"real image decoding is not wired (PIL {real}); pass "
            "allow_fake=True to parse the deterministic fake format"
        )

    def run(it: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for batch in it:
            keys = batch.column(key_col)
            off, flat, mask = _blob_np(batch.column(blob_col))
            lens = np.diff(off)
            starts = off[:-1]
            ok = lens >= _IMG_HDR
            if mask is not None:
                ok &= mask
            # vectorized header parse: gather the 9 header bytes of each blob
            flat_safe = flat if len(flat) else np.zeros(1, dtype=np.uint8)
            hdr_idx = starts[:, None] + np.arange(_IMG_HDR)[None, :]
            hdr = flat_safe[np.minimum(hdr_idx, len(flat_safe) - 1)]
            magic_ok = (hdr[:, :4] == np.frombuffer(IMG_MAGIC, np.uint8)).all(axis=1)
            ok &= magic_ok
            w = (hdr[:, 4].astype(np.int32) | (hdr[:, 5].astype(np.int32) << 8))
            h = (hdr[:, 6].astype(np.int32) | (hdr[:, 7].astype(np.int32) << 8))
            c = hdr[:, 8].astype(np.int32)
            ok &= lens >= _IMG_HDR + w.astype(np.int64) * h * c
            w, h, c = np.where(ok, w, 0), np.where(ok, h, 0), np.where(ok, c, 0)
            # pixel payloads: one gather into a contiguous buffer
            sizes = (w.astype(np.int64) * h * c)
            pout = np.zeros(len(sizes) + 1, dtype=np.int64)
            np.cumsum(sizes, out=pout[1:])
            if pout[-1]:
                # one gather for every payload byte: position-within-segment
                # (arange minus repeated segment starts) + repeated sources
                seg = np.arange(pout[-1]) - np.repeat(pout[:-1], sizes)
                px_idx = np.repeat(starts + _IMG_HDR, sizes) + seg
                pixels_flat = flat[px_idx]
            else:
                pixels_flat = np.empty(0, dtype=np.uint8)
            yield pa.RecordBatch.from_arrays(
                [keys, pa.array(w, type=pa.int32()), pa.array(h, type=pa.int32()),
                 pa.array(c, type=pa.int32()), _bin_from_parts(pout, pixels_flat)],
                ["media_id", "width", "height", "channels", "pixels"],
            )

    return df.mapInArrow(run, DECODE_SCHEMA)


# ------------------------------------------------------------------ resize

def resize_images(decoded: DataFrame, out_w: int, out_h: int) -> DataFrame:
    """Nearest-neighbor resample of decoded pixel buffers to (out_w, out_h).
    REAL math (numpy index grids); ragged input dims force a per-row loop but
    each row is one vectorized gather."""

    def run(it: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for batch in it:
            w = batch.column("width").to_numpy()
            h = batch.column("height").to_numpy()
            c = batch.column("channels").to_numpy()
            off, flat, _ = _blob_np(batch.column("pixels"))
            outs = []
            for i in range(len(w)):
                if w[i] == 0 or h[i] == 0:
                    outs.append(np.zeros(out_w * out_h * max(int(c[i]), 1),
                                         dtype=np.uint8))
                    continue
                img = flat[off[i]: off[i + 1]].reshape(int(h[i]), int(w[i]), int(c[i]))
                yi = (np.arange(out_h) * h[i] // out_h).astype(np.int64)
                xi = (np.arange(out_w) * w[i] // out_w).astype(np.int64)
                outs.append(img[yi[:, None], xi[None, :], :].ravel())
            sizes = np.array([len(o) for o in outs], dtype=np.int64)
            pout = np.zeros(len(outs) + 1, dtype=np.int64)
            np.cumsum(sizes, out=pout[1:])
            flat_out = (np.concatenate(outs) if outs else np.empty(0, np.uint8))
            yield pa.RecordBatch.from_arrays(
                [batch.column("media_id"),
                 pa.array(np.full(len(w), out_w, dtype=np.int32)),
                 pa.array(np.full(len(w), out_h, dtype=np.int32)),
                 batch.column("channels"), _bin_from_parts(pout, flat_out)],
                ["media_id", "width", "height", "channels", "pixels"],
            )

    return decoded.mapInArrow(run, DECODE_SCHEMA)


# ----------------------------------------------------------------- features

def image_features(decoded: DataFrame) -> DataFrame:
    """Per-image brightness stats from the raw pixel buffer — one pass of
    vectorized prefix-sum segment sums per batch (no per-row Python).

    Emits both the float stats (mean/std) and the EXACT integer moments
    ``sum_px``/``sum_sq`` (int64 prefix sums — exact for any image below
    ~2^53 total brightness) so downstream aggregations can stay in integer
    space and match a SQL oracle digit-for-digit."""

    def run(it: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for batch in it:
            off, flat, _ = _blob_np(batch.column("pixels"))
            lens = np.diff(off)
            fl = flat.astype(np.int64)
            nz = np.maximum(lens, 1)
            # exact segment sums via prefix sums (reduceat mis-handles
            # zero-length trailing segments)
            c1 = np.zeros(len(fl) + 1, dtype=np.int64)
            np.cumsum(fl, out=c1[1:])
            c2 = np.zeros(len(fl) + 1, dtype=np.int64)
            np.cumsum(fl * fl, out=c2[1:])
            s1 = c1[off[1:]] - c1[off[:-1]]
            s2 = c2[off[1:]] - c2[off[:-1]]
            mean = s1 / nz
            var = np.maximum(s2 / nz - mean * mean, 0.0)
            yield pa.RecordBatch.from_arrays(
                [batch.column("media_id"), pa.array(lens, type=pa.int64()),
                 pa.array(s1, type=pa.int64()), pa.array(s2, type=pa.int64()),
                 pa.array(mean), pa.array(np.sqrt(var))],
                ["media_id", "n_pixels", "sum_px", "sum_sq", "mean_px", "std_px"],
            )

    return decoded.mapInArrow(
        run,
        "media_id bigint, n_pixels bigint, sum_px bigint, sum_sq bigint, "
        "mean_px double, std_px double",
    )


# ------------------------------------------------------------- frame sample

def sample_frames(df: DataFrame, frame_bytes: int, every_n: int,
                  blob_col: str = "blob", key_col: str = "doc_id") -> DataFrame:
    """Treat each blob as concatenated fixed-size frames (the video analog);
    emit every ``every_n``-th complete frame as its own row
    (key, frame_idx, frame). Per batch: frame counts from the offsets, ONE
    np.repeat for keys, ONE broadcasted fancy-index gather for all sampled
    frame bytes — no per-frame Python, no shuffle."""
    if frame_bytes <= 0 or every_n <= 0:
        raise ValueError("frame_bytes and every_n must be positive")
    key_ddl = df.schema[key_col].dataType.simpleString()  # key type passes through

    def run(it: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for batch in it:
            keys = batch.column(key_col).to_numpy(zero_copy_only=False)
            off, flat, mask = _blob_np(batch.column(blob_col))
            n_frames = np.diff(off) // frame_bytes
            if mask is not None:
                n_frames = np.where(mask, n_frames, 0)
            n_sampled = (n_frames + every_n - 1) // every_n
            total = int(n_sampled.sum())
            out_keys = np.repeat(keys, n_sampled)
            # frame_idx within each row: 0, every_n, 2*every_n, ...
            row_pos = np.arange(total) - np.repeat(
                np.concatenate([[0], np.cumsum(n_sampled)[:-1]]), n_sampled
            )
            frame_idx = row_pos * every_n
            frame_starts = np.repeat(off[:-1], n_sampled) + frame_idx * frame_bytes
            if total:
                gather = frame_starts[:, None] + np.arange(frame_bytes)[None, :]
                flat_out = flat[gather.ravel()]
            else:
                flat_out = np.empty(0, dtype=np.uint8)
            pout = np.arange(total + 1, dtype=np.int64) * frame_bytes
            yield pa.RecordBatch.from_arrays(
                [pa.array(out_keys, type=batch.column(key_col).type),
                 pa.array(frame_idx, type=pa.int64()),
                 _bin_from_parts(pout, flat_out)],
                ["media_id", "frame_idx", "frame"],
            )

    return df.mapInArrow(run, f"media_id {key_ddl}, frame_idx bigint, frame binary")


# ------------------------------------------------------------------- audio

def audio_meta(df: DataFrame, blob_col: str = "blob",
               key_col: str = "media_id") -> DataFrame:
    """Parse the fake audio header vectorized: (sample_rate, channels, bits,
    duration_ms) plus ``pcm_sum`` — the exact int64 sum of the PCM payload
    bytes (prefix-sum segment sums, same kernel as image_features), so
    downstream checks cover the CONTENT, not just the header. Real
    soundfile decode is stubbed the same way as images."""

    def run(it: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for batch in it:
            keys = batch.column(key_col)
            off, flat, mask = _blob_np(batch.column(blob_col))
            lens = np.diff(off)
            starts = off[:-1]
            ok = lens >= _AUD_HDR
            if mask is not None:
                ok &= mask
            flat_safe = flat if len(flat) else np.zeros(1, dtype=np.uint8)
            hdr_idx = starts[:, None] + np.arange(_AUD_HDR)[None, :]
            hdr = flat_safe[np.minimum(hdr_idx, len(flat_safe) - 1)]
            ok &= (hdr[:, :4] == np.frombuffer(AUD_MAGIC, np.uint8)).all(axis=1)
            u = hdr.astype(np.int64)
            rate = u[:, 4] | (u[:, 5] << 8) | (u[:, 6] << 16) | (u[:, 7] << 24)
            ch = u[:, 8] | (u[:, 9] << 8)
            bits = u[:, 10] | (u[:, 11] << 8)
            rate, ch, bits = (np.where(ok, x, 0) for x in (rate, ch, bits))
            denom = np.maximum(rate * ch * np.maximum(bits, 1) // 8, 1)
            dur_ms = np.where(ok, (lens - _AUD_HDR) * 1000 // denom, 0)
            c1 = np.zeros(len(flat) + 1, dtype=np.int64)
            np.cumsum(flat.astype(np.int64), out=c1[1:])
            pcm_lo = np.minimum(starts + _AUD_HDR, off[1:])
            pcm_sum = np.where(ok, c1[off[1:]] - c1[pcm_lo], 0)
            yield pa.RecordBatch.from_arrays(
                [keys, pa.array(rate.astype(np.int32)),
                 pa.array(ch.astype(np.int32)), pa.array(bits.astype(np.int32)),
                 pa.array(dur_ms.astype(np.int64)),
                 pa.array(pcm_sum.astype(np.int64))],
                ["media_id", "sample_rate", "channels", "bits", "duration_ms",
                 "pcm_sum"],
            )

    return df.mapInArrow(
        run,
        "media_id bigint, sample_rate int, channels int, bits int, "
        "duration_ms bigint, pcm_sum bigint",
    )
