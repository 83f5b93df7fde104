"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Design (what a 100 TB multimodal pipeline needs from the engine):

- payloads are **opaque ``binary`` columns** with a sibling metadata
  struct (mime kind, byte size) — never decoded by Catalyst;
- decode / feature-extract run as **Arrow-batched** ``mapInPandas``
  (one Python worker per partition, whole column batches — not
  row-at-a-time), keeping the Python boundary off the per-row path;
- partitioning: payload rows are large, so ``maxRecordsPerFile`` and
  smaller ``files.maxPartitionBytes`` keep batch memory bounded.

The image/audio codec libraries are not in this container, so
``decode_image`` is a clearly-marked stub; ``extract_features`` uses a
deterministic byte-level extractor so the Spark-side plumbing (schema,
UDF signature, batch shape) is real and oracle-testable.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_bytes", T.IntegerType()),
        T.StructField("first_byte", T.IntegerType()),
        T.StructField("last_byte", T.IntegerType()),
    ]
)


def attach_binary_payload(
    df: DataFrame, text_col: str, id_col: str, kind: str = "text/plain"
) -> DataFrame:
    """Wrap a column as an opaque binary payload + metadata struct."""
    payload = F.encode(F.col(text_col), "UTF-8")
    return df.select(
        F.col(id_col),
        payload.alias("payload"),
        F.struct(
            F.lit(kind).alias("kind"),
            F.length(payload).alias("n_bytes"),
        ).alias("meta"),
    )


def decode_image(payload: bytes) -> "object":
    """Decode an image payload to pixels.

    STUB: pillow/opencv are not available in this container. The
    surrounding Spark plumbing (binary column in, feature batch out)
    is exercised by ``extract_features``.
    """
    raise NotImplementedError(
        "image decode requires pillow/opencv; not available in this environment"
    )


def extract_features(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Arrow-batched feature extraction over binary payloads.

    Deterministic byte-level features (stand-in for a real
    decoder+CNN): byte length, first byte, last byte. ``mapInPandas``
    receives whole Arrow batches — the shape a real decode UDF uses.
    """

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf["payload"]
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "n_bytes": payloads.map(len).astype("int32"),
                    "first_byte": payloads.map(
                        lambda b: b[0] if len(b) else -1
                    ).astype("int32"),
                    "last_byte": payloads.map(
                        lambda b: b[-1] if len(b) else -1
                    ).astype("int32"),
                }
            )

    return df.select(F.col(id_col), "payload").mapInPandas(_extract, FEATURE_SCHEMA)
