"""Deterministic Common-Crawl-style synthetic webpages table (FIXTURES.md F1).

Schema = the north-rule input_hint: (url string, warc_ts timestamp,
html binary, text string, lang string). Generation is pure-function-of-row-id
(splitmix64), so ANY partitioning yields the same logical table — no
external data, seed fixed, vectorized numpy inside mapInArrow over
spark.range. Zipf-skewed hosts and lang ("en" ~45%) provide the skew hot
spot the north rule's salting story targets.
"""

from __future__ import annotations

from functools import partial
from typing import Iterator

import numpy as np
import pyarrow as pa

from pyspark.sql import DataFrame, SparkSession

SEED = 42
N_HOSTS = 1000
N_VOCAB = 10_000
N_LANGS = 40

_LANGS = [
    "en", "zh", "es", "de", "fr", "ja", "ru", "pt", "it", "nl",
    "pl", "tr", "ar", "ko", "sv", "cs", "fa", "id", "vi", "el",
    "hu", "da", "fi", "no", "th", "he", "ro", "uk", "bg", "hr",
    "lt", "sk", "sl", "et", "lv", "sr", "ms", "hi", "bn", "ta",
][:N_LANGS]


def _splitmix64(x: np.ndarray) -> np.ndarray:
    """Deterministic per-row 64-bit mix (public splitmix64 constants)."""
    z = (x + np.uint64(0x9E3779B97F4A7C15)).astype(np.uint64)
    z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return z ^ (z >> np.uint64(31))


def _zipf_pick(u: np.ndarray, n_items: int, s: float) -> np.ndarray:
    """Map uniform uint64 draws to zipf(s)-distributed item indices."""
    ranks = np.arange(1, n_items + 1, dtype=np.float64)
    w = ranks ** (-s)
    cdf = np.cumsum(w / w.sum())
    uf = (u >> np.uint64(11)).astype(np.float64) / float(1 << 53)
    return np.searchsorted(cdf, uf, side="left").clip(0, n_items - 1)


_VOCAB = None


def _vocab() -> np.ndarray:
    global _VOCAB
    if _VOCAB is None:
        rng = np.random.default_rng(SEED)
        lengths = rng.integers(3, 10, N_VOCAB)
        letters = rng.integers(0, 26, int(lengths.sum()))
        chars = np.frombuffer((letters + 97).astype(np.uint8).tobytes(), dtype="S1")
        words, pos = [], 0
        for L in lengths:
            words.append(chars[pos : pos + L].tobytes().decode())
            pos += L
        _VOCAB = np.array(words, dtype=object)
    return _VOCAB


def _gen_batch(ids: np.ndarray) -> pa.RecordBatch:
    import binascii

    import pyarrow.compute as pc

    i = ids.astype(np.uint64)
    h1 = _splitmix64(i)
    h2 = _splitmix64(i + np.uint64(1_000_000_007))
    h3 = _splitmix64(i + np.uint64(2_000_000_011))

    host_idx = _zipf_pick(h1, N_HOSTS, 1.2)
    lang_idx = _zipf_pick(h2, N_LANGS, 1.5)
    langs = np.array(_LANGS, dtype=object)[lang_idx]

    # urls: https://host{k}.example.com/p/{hex(h3)}-{i} (unique per row)
    hex8 = np.frombuffer(
        binascii.hexlify((h3 >> np.uint64(32)).astype(">u4").tobytes()), dtype="S8"
    ).astype("U8")
    urls = np.char.add(
        np.char.add(
            np.char.add(
                np.char.add("https://host", host_idx.astype("U4")), ".example.com/p/"
            ),
            hex8,
        ),
        np.char.add("-", ids.astype("U12")),
    ).astype(object)

    # warc_ts: 2025-01-01 + (i mod 86_400_000) seconds, micros precision
    base_us = np.int64(1_735_689_600_000_000)  # 2025-01-01T00:00:00Z
    ts_us = base_us + (ids % 86_400_000) * 1_000_000

    # text: n_words in [50, 400) zipf-vocab word salad, seeded by i
    vocab = _vocab()
    n_words = (50 + (h1 % np.uint64(350))).astype(np.int64)
    total = int(n_words.sum())
    starts = np.zeros(len(ids) + 1, dtype=np.int64)
    np.cumsum(n_words, out=starts[1:])
    pos_in_row = np.arange(total, dtype=np.uint64) - np.repeat(starts[:-1], n_words).astype(np.uint64)
    word_seed = np.repeat(h2, n_words) + pos_in_row
    widx = _zipf_pick(_splitmix64(word_seed), N_VOCAB, 1.3)
    flat_words = vocab[widx]
    texts = pc.binary_join(
        pa.LargeListArray.from_arrays(
            pa.array(starts, type=pa.int64()), pa.array(flat_words, type=pa.string())
        ),
        pa.scalar(" "),
    )
    html = pc.cast(
        pc.binary_join_element_wise(
            pa.scalar("<html><body>"), texts, pa.scalar("</body></html>"), pa.scalar("")
        ),
        pa.binary(),
    )

    return pa.RecordBatch.from_arrays(
        [
            pa.array(urls, type=pa.string()),
            pa.array(ts_us, type=pa.int64()).cast(pa.timestamp("us", tz="UTC")),
            html,
            pc.cast(texts, pa.string()),
            pa.array(langs, type=pa.string()),
        ],
        names=["url", "warc_ts", "html", "text", "lang"],
    )


def _gen_fn(it: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
    for batch in it:
        ids = batch.column("id").to_numpy()
        yield _gen_batch(ids)


def webpages(spark: SparkSession, n_rows: int, partitions: int = 32) -> DataFrame:
    """The synthetic input table — same logical content for any seed-fixed
    n_rows regardless of partitioning."""
    base = spark.range(0, n_rows, 1, partitions)
    schema = "url string, warc_ts timestamp, html binary, text string, lang string"
    return base.mapInArrow(_gen_fn, schema)
