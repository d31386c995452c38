#!/usr/bin/env python3
"""Generate reference correctness fixtures (FIXTURES.md F1).

For the deterministic synthetic webpages table at a given row count:

- per-column SHA-256 of the canonical column byte-serialization in canonical
  order (sorted by url — the engine's intra-bucket encode order), i.e. the
  "reference round-trip" oracle: parquet round-trips are lossless, so the
  source columns ARE the reference decoder's output;
- per-column compressed-size tally of the REFERENCE-EQUIVALENT encoding:
  parquet with dictionary encoding enabled and no block compression — the
  reference's write configuration (UNCOMPRESSED codec, dictionary writers;
  reference: ParquetWriterBuilder.java:49-59 builds UNCOMPRESSED,
  EncValuesWriterFactory dictionary defaults). Our engine's per-column
  enc_bytes must be <= these tallies (BASELINE.md compressed-size row).

Pure numpy/pyarrow — no Spark needed (the generator is a pure function of
row id). Usage: python3 scripts/make_fixtures.py [rows ...] (default 1000).
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from parquet_main_spark.functions.arrow import arrow_to_dense, canonical_sha  # noqa: E402
from parquet_main_spark.sources.webpages import _gen_batch  # noqa: E402

LOGICAL = {"url": "string", "warc_ts": "timestamp", "html": "binary",
           "text": "string", "lang": "string"}


def build(rows: int) -> dict:
    tbl = pa.Table.from_batches(
        [_gen_batch(np.arange(start, min(start + 65536, rows), dtype=np.int64))
         for start in range(0, rows, 65536)]
    )
    order = pa.compute.sort_indices(tbl.column("url"))
    tbl = tbl.take(order)  # canonical order: sorted by url

    digests, ref_bytes = {}, {}
    for col, lt in LOGICAL.items():
        vals, mask = arrow_to_dense(tbl.column(col), lt)
        digests[col] = canonical_sha(vals, mask, lt)
        # reference-equivalent encoding: parquet, dictionary on, UNCOMPRESSED
        one = pa.table({col: tbl.column(col)})
        tmp = f"/tmp/_refenc_{col}.parquet"
        pq.write_table(one, tmp, compression="NONE", use_dictionary=True)
        meta = pq.ParquetFile(tmp).metadata
        total = sum(
            meta.row_group(rg).column(0).total_compressed_size
            for rg in range(meta.num_row_groups)
        )
        ref_bytes[col] = int(total)
        os.remove(tmp)
    return {"rows": rows, "order": "url", "digests": digests,
            "reference_compressed_bytes": ref_bytes}


def main() -> None:
    rows_list = [int(a) for a in sys.argv[1:]] or [1000]
    os.makedirs(os.path.join(REPO, "tests", "fixtures"), exist_ok=True)
    for rows in rows_list:
        fx = build(rows)
        path = os.path.join(REPO, "tests", "fixtures", f"digests_{rows}.json")
        with open(path, "w") as f:
            json.dump(fx, f, indent=2, sort_keys=True)
        print(path, json.dumps(fx["reference_compressed_bytes"]))


if __name__ == "__main__":
    main()
