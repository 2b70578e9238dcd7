#!/usr/bin/env python
"""Land the expected frame for the ``multimodal_features_real``
catalog query — the one driver-checkable query whose values pass
through REAL codec bytes (WAV/PPM/PNG/JPEG), which no SQL engine can
replay. The synthesis + decode run here in PURE PYTHON (no Spark, no
DataFrame, no mapInPandas): ids 0..4999 cover sf0.1's documents, and
every smaller driver scale is a doc_id-prefix subset, so the oracle
SQL joins this parquet to the live ``documents`` view and stays
scale-free across driver scales.

Regenerate after ANY codec or synthesis change:
    python tools/make_multimodal_fixture.py
(the committed parquet is the oracle; a stale fixture fails the
driver compare loudly, never silently).
"""
import hashlib
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyarrow as pa  # noqa: E402
import pyarrow.parquet as pq  # noqa: E402

from database_convertor_spark.operators.multimodal import (  # noqa: E402
    StdlibDecodeBackend,
    synthesize_payload,
)

N_IDS = 5000
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "tests", "fixtures", "multimodal_real_expected.parquet")


def main() -> None:
    backend = StdlibDecodeBackend()
    rows = {"media_id": [], "kind": [], "n_bytes": [], "checksum": [],
            "f0": [], "f5": []}
    for mid in range(N_IDS):
        _, kind, payload, _ = synthesize_payload(mid)
        feats = backend.features(payload, kind)
        rows["media_id"].append(mid)
        rows["kind"].append(kind)
        rows["n_bytes"].append(len(payload))
        rows["checksum"].append(hashlib.md5(payload).hexdigest())
        rows["f0"].append(round(feats[0], 4))
        rows["f5"].append(round(feats[5], 4))
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    table = pa.table({
        "media_id": pa.array(rows["media_id"], pa.int64()),
        "kind": pa.array(rows["kind"], pa.string()),
        "n_bytes": pa.array(rows["n_bytes"], pa.int64()),
        "checksum": pa.array(rows["checksum"], pa.string()),
        "f0": pa.array(rows["f0"], pa.float64()),
        "f5": pa.array(rows["f5"], pa.float64()),
    })
    pq.write_table(table, OUT)
    print(f"wrote {OUT}: {table.num_rows} rows")


if __name__ == "__main__":
    main()
