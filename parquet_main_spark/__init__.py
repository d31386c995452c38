"""parquet_main_spark — a PySpark-native per-column lightweight-compression engine.

Brand-new implementation (not a port) with the capabilities of the reference
Java fork of the Apache Parquet column layer (harperjiang/parquet-main):

- per-column lightweight codecs: dictionary (order-preserving, sorted),
  RLE/bit-packed hybrid, frame-of-reference + bit-packing (the reference's
  VARLEN_BIT_PACKED), delta, FSST-style string compression, plain
  (reference inventory: SURVEY.md §2.2, e.g.
  values/vbp/VarlenBitPackingValuesWriter.java:31-131,
  values/dictionary/OnePassOrderPreservingDictionaryValuesWriter.java:22-269)
- codec auto-selection from sampled statistics
  (EncValuesWriterFactory.java:48-227 analog)
- block-level zone-map pruning and dictionary predicate translation
  (impl/SkippingColumnReaderImpl.java:64-1043, column/Dictionary.java:107-132
  analogs)
- partition-parallel encode with per-bucket lineage/checkpoint + resume

All kernels are vectorized numpy/Arrow inside pandas UDFs — never per-row
Python in the hot path.
"""

__version__ = "0.3.0"


def __getattr__(name):
    # lazy public API (keeps `import parquet_main_spark` free of pyspark cost)
    if name in ("EncodeConfig", "EncodeResult", "encode_table", "read_meta"):
        from .operators import encode as _e

        return getattr(_e, name)
    if name in ("Predicate", "And", "Or", "Not", "scan", "scan_many",
                "scan_count", "pruning_report", "lookup"):
        from .operators import decode as _d

        return getattr(_d, name)
    if name in ("scan_minmax", "scan_distinct", "scan_topk"):
        from .operators import aggregates as _a

        return getattr(_a, name)
    if name in ("verify_table", "repair_buckets"):
        from .operators import verify as _v

        return getattr(_v, name)
    if name == "get_spark":
        from .session import get_spark

        return get_spark
    if name == "register_datasource":
        from .sources.datasource import register

        return register
    if name in ("encode_stream", "scan_batches", "compact_batches", "list_batches"):
        from .streaming import ingest as _i

        return getattr(_i, name)
    if name == "rollup_stream":
        from .streaming.rollup import rollup_stream

        return rollup_stream
    if name == "threshold_crossings":
        from .streaming.state import threshold_crossings

        return threshold_crossings
    if name in ("decode_images", "resize_images", "image_features",
                "sample_frames", "audio_meta"):
        from .operators import multimodal as _m

        return getattr(_m, name)
    raise AttributeError(name)
