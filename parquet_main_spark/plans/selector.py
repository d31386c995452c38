"""Codec auto-selection from sampled statistics (the "encoding selection").

Analog of the reference's selection machinery: the external decision carried
into writers via EncContext + EncValuesWriterFactory dispatch
(EncValuesWriterFactory.java:69-102, EncContext.java:30-43), the pre-scan
bit-length stats (ParquetWriterHelper.java:60-100) and the dictionary
viability test (DictionaryValuesWriter.java:119-128 shouldFallBack /
isCompressionSatisfying). Unlike the reference's ThreadLocal side channel,
our plan is DATA: a ``{column: codec}`` dict computed on the driver from a
sampled-stats pass and broadcast into the encode UDF (SURVEY.md §2.4 C2).

Selection = per-codec size estimation from the sample + pick the minimum;
FSST's ratio is MEASURED by compressing the sample corpus (no guessing).
"""

from __future__ import annotations

from typing import Any

import numpy as np

from ..codecs import APPLICABLE, INT_TYPES, VAR_TYPES
from ..codecs.bitpack import bit_width
from ..codecs.fsst import probe_ratio
from ..codecs.strutil import to_blob

KMV_K = 256


def _kmv(values: np.ndarray) -> list[int]:
    """k-minimum-values sketch of 64-bit value hashes — mergeable distinct
    estimator (per-partition sketches union exactly, unlike raw counts)."""
    import pandas as pd

    h = pd.util.hash_pandas_object(pd.Series(values), index=False).to_numpy()
    h = np.unique(h)
    return h[:KMV_K].tolist() if len(h) <= KMV_K else np.partition(h, KMV_K)[:KMV_K].tolist()


def kmv_estimate(sketches: list[list[int]]) -> int:
    """Union cardinality from merged KMV sketches."""
    merged = np.unique(np.concatenate([np.asarray(s, dtype=np.uint64) for s in sketches if s]))
    if len(merged) == 0:
        return 0
    if len(merged) < KMV_K:
        return int(len(merged))
    kth = float(np.sort(merged)[KMV_K - 1])
    return max(KMV_K, int((KMV_K - 1) * (2.0**64) / max(kth, 1.0)))


def column_sample_stats(values: np.ndarray, logical_type: str,
                        assume_sorted: bool = False,
                        delta_guard_bits: int = 0,
                        uniq_cap: int = 0) -> dict[str, Any]:
    """Stats over a dense (non-null) sample of one column — one vectorized
    pass (the reference's scanIntBitLength analog, generalized).

    ``assume_sorted``: the encoder sorts blocks by the order_by keys, so for
    THOSE columns shared-prefix overlap is measured on a sorted sub-sample;
    for every other column the blocks see arrival order, and measuring
    sorted overlap would overestimate the prefix codec (it beat dict for
    2-char lang codes that way).

    ``uniq_cap`` > 0: additionally emit the sample's EXACT distinct values
    (``uniq``, JSON-serializable) when there are at most that many — the
    global-dictionary candidates ride back with the stats so no separate
    distinct-aggregation job has to rescan the table (encode-side per-block
    fallback covers any value the sample missed)."""
    n = len(values)
    st: dict[str, Any] = {"n": n, "type": logical_type}
    if n == 0:
        st.update(card=0, avg_run=1.0, raw_bytes=0, kmv=[])
        if uniq_cap > 0:
            st["uniq"] = []
        return st
    st["kmv"] = _kmv(values)

    def _emit_uniq(u: np.ndarray) -> None:
        if uniq_cap > 0:
            st["uniq"] = u.tolist() if len(u) <= uniq_cap else None
    if logical_type in VAR_TYPES:
        lengths, blob = to_blob(values, binary=logical_type == "binary")
        uniq = np.unique(values)
        if logical_type != "binary":  # bytes aren't JSON; binary never gdicts
            _emit_uniq(uniq)
        card = len(uniq)
        runs = 1 + int((values[1:] != values[:-1]).sum())
        dict_bytes = int(sum(len(s.encode() if isinstance(s, str) else s) for s in uniq))
        # ratio estimate only: 1 MiB of corpus is plenty (measured ratios at
        # 1/2/4 MiB agree to ~0.5% on web text, far inside the selector's
        # 5% hysteresis), and compressing a whole 25 MiB sample per task is
        # bandwidth the bus doesn't have — the stats wave is serial time the
        # N->4N criterion pays at every core count. probe_ratio measures
        # from table-building alone (no application pass): together ~4x
        # cheaper than the round-5 compress_corpus(2 MiB) probe.
        fsst_ratio = probe_ratio(bytes(blob[: 1 << 20]))
        from ..codecs import prefix as _prefix

        # prefix probe capped by BYTES, not values: 2048 html blobs are
        # ~4 MiB of per-value Python encode — for long values far fewer
        # suffice for a per-byte ratio
        n_sub = min(len(values), 2048)
        if n_sub and float(lengths[:n_sub].sum()) > (512 << 10):
            n_sub = max(64, int(np.searchsorted(
                np.cumsum(lengths[:n_sub]), 512 << 10)) + 1)
        sub = values[:n_sub]
        if assume_sorted:
            sub = np.sort(sub)
        try:
            praw = sum(len(s.encode() if isinstance(s, str) else s) for s in sub) + 4 * len(sub)
            prefix_ratio = len(_prefix.encode(sub, binary=logical_type == "binary")) / max(1, praw)
        except ValueError:
            prefix_ratio = 1.0
        st.update(
            prefix_ratio=prefix_ratio,
            card=card,
            avg_run=n / runs,
            raw_bytes=int(lengths.sum()) + 8 * n,
            avg_len=float(lengths.mean()),
            dict_bytes=dict_bytes,
            avg_uniq_len=dict_bytes / max(1, card),
            fsst_ratio=fsst_ratio,
        )
        return st
    v = np.ascontiguousarray(values, dtype=np.float64 if logical_type in ("float32", "float64") else np.int64)
    if assume_sorted:
        # the encoder sorts every bucket by the order_by keys, so THOSE
        # columns' run/delta stats must be measured on sorted values —
        # unsorted arrival made sequential ids look delta-hostile (round-3
        # stress: vec_id picked rle at ~3x the bytes of delta)
        v = np.sort(v)
    uniq = np.unique(v)
    _emit_uniq(uniq)
    runs = 1 + int((v[1:] != v[:-1]).sum())
    st.update(card=len(uniq), avg_run=n / runs, raw_bytes=v.nbytes)
    if logical_type in INT_TYPES or logical_type == "bool":
        vi = v.astype(np.int64)
        span = int(vi.max()) - int(vi.min())
        st["span_bits"] = bit_width(span)
        if n > 1:
            d = np.diff(vi)
            st["sorted_frac"] = float((d >= 0).mean())
            st["delta_bits"] = bit_width(int(np.abs(d).max()) * 2)
            if assume_sorted:
                # the sample is GLOBALLY sorted but the encoder sorts per
                # HASH BUCKET, where consecutive deltas are ~buckets x
                # larger — widen by log2(buckets) so delta isn't selected
                # off an underestimate
                st["delta_bits"] = min(64, st["delta_bits"] + delta_guard_bits)
        else:
            st["sorted_frac"], st["delta_bits"] = 1.0, 0
    return st


def estimate_sizes(st: dict[str, Any]) -> dict[str, float]:
    """Estimated encoded bytes per applicable codec, per sampled value."""
    n = max(1, st["n"])
    lt = st["type"]
    card = max(1, st.get("card", 1))
    id_bits = bit_width(card - 1)
    avg_run = max(1.0, st.get("avg_run", 1.0))
    est: dict[str, float] = {}
    for codec in APPLICABLE[lt]:
        if codec == "plain":
            est[codec] = st["raw_bytes"]
        elif codec == "dict":
            if lt in VAR_TYPES:
                dict_bytes = st.get("dict_bytes", st["raw_bytes"])
            else:
                dict_bytes = card * 8
            # ids are RLE'd: runs of ids mirror runs of values
            ids_bytes = min(n * id_bits / 8, (n / avg_run) * (2 + (id_bits + 7) // 8))
            est[codec] = dict_bytes + ids_bytes + 16
        elif codec == "rle":
            w = st.get("span_bits", 1) if lt != "bool" else 1
            est[codec] = min(n * w / 8, (n / avg_run) * (2 + (w + 7) // 8)) + 8
        elif codec == "for":
            est[codec] = n * st.get("span_bits", 64) / 8 + (n / 512 + 1) * 9
        elif codec == "delta":
            # only pays off when mostly sorted; penalize otherwise
            bits = st.get("delta_bits", 64)
            penalty = 1.0 if st.get("sorted_frac", 0) > 0.9 else 4.0
            est[codec] = n * bits / 8 * penalty + (n / 512 + 1) * 9
        elif codec == "fsst":
            est[codec] = st["raw_bytes"] * st.get("fsst_ratio", 1.0) + n  # + lengths
        elif codec == "prefix":
            est[codec] = st["raw_bytes"] * st.get("prefix_ratio", 1.0)
    return est


def choose_codec(st: dict[str, Any]) -> str:
    """Pick the codec with the lowest estimated size; deterministic
    tie-break by APPLICABLE order. Dictionary is rejected outright when
    cardinality is too high to pay (the shouldFallBack analog)."""
    if st["n"] == 0:
        return "plain"
    est = estimate_sizes(st)
    if "dict" in est and st.get("card", 0) > 0.5 * st["n"]:
        del est["dict"]  # dictionary can't pay: nearly all values distinct
    order = {c: i for i, c in enumerate(APPLICABLE[st["type"]])}
    best = min(est.items(), key=lambda kv: (kv[1], order[kv[0]]))[0]
    # hysteresis on var-len data (100-TB rule): a codec that saves under 5%
    # of the bytes still pays its full encode+decode CPU on every block —
    # e.g. fsst/prefix eking ~1% out of embedding float bytes via shared
    # exponent prefixes. Marginal wins go to plain (whose var-len blobs get
    # the block-level zstd wrap anyway).
    if (st["type"] in VAR_TYPES and best != "plain" and "plain" in est
            and est[best] > 0.95 * est["plain"]):
        return "plain"
    return best
