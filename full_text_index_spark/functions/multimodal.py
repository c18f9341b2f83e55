"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Real decode (image/audio/video) libraries are not in this container, so the
decode step is a clearly-marked deterministic stub — but the Spark-side
plumbing is real and tested: binary columns flow through an Arrow-batched
``mapInPandas`` with a stable schema, the batch shape a production
feature-extractor (resize / frame-sample / embed) would use.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FEATURE_SCHEMA = (
    "doc_id long, n_bytes long, header_hex string, checksum long, fake_feature double"
)


def decode_payload(payload: bytes) -> np.ndarray:
    """Placeholder for a real media decode (PIL/libav/etc. not available).

    Raises NotImplementedError — callers use `fake_decode` in tests; swap
    this in production with the real decoder.
    """
    raise NotImplementedError("media decode libraries are not available in this build")


def _fake_decode(buf: np.ndarray) -> float:
    """Deterministic fake 'feature': mean byte value — stands in for a real
    decoded-feature reduction, exercising the same batch shape."""
    return float(buf.mean()) if len(buf) else 0.0


def binary_features(docs_with_payload: DataFrame) -> DataFrame:
    """(doc_id, payload binary) → typed metadata + stub feature, via
    Arrow-batched mapInPandas (vectorized; payload never hits the driver)."""

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            n = len(pdf)
            out = {
                "doc_id": pdf["doc_id"].to_numpy(dtype=np.int64),
                "n_bytes": np.zeros(n, dtype=np.int64),
                "header_hex": np.empty(n, dtype=object),
                "checksum": np.zeros(n, dtype=np.int64),
                "fake_feature": np.zeros(n, dtype=np.float64),
            }
            for i, payload in enumerate(pdf["payload"]):
                buf = np.frombuffer(payload, dtype=np.uint8)
                out["n_bytes"][i] = len(buf)
                out["header_hex"][i] = bytes(buf[:8]).hex().upper()
                out["checksum"][i] = int(buf.sum(dtype=np.int64)) % 2_147_483_647
                out["fake_feature"][i] = _fake_decode(buf)
            yield pd.DataFrame(out)

    return docs_with_payload.select("doc_id", "payload").mapInPandas(
        extract, schema=FEATURE_SCHEMA
    )


def documents_as_payload(docs: DataFrame) -> DataFrame:
    """Wrap the text column as a binary payload (the testdata has no real
    media column; the wrapper exercises identical plumbing)."""
    return docs.select(
        "doc_id", F.encode(F.col("text"), "UTF-8").alias("payload")
    )
