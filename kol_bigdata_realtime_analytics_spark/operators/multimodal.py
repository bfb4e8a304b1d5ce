"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride through the engine as `binary` columns with a typed
metadata struct. The decode / feature-extract step is a `mapInPandas`
Arrow-batched operator — the image/audio libraries are NOT in this container,
so the actual decode is a clearly-marked deterministic stub; the Spark-side
contract (schema, batch iteration, partitioning) is real and tested.

At 100 TB the pattern matters more than the stub: mapInPandas streams Arrow
record batches through the Python worker without per-row pickling, binary
payloads never shuffle (feature extraction happens before any groupBy), and
the output schema is fixed so downstream stages stay columnar.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: output schema of the (stub) decoder — what a real image decoder would emit
DECODE_SCHEMA = (
    "doc_id long, byte_len long, width long, height long, n_frames long"
)


def with_binary_payload(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Pack a text column as utf-8 binary + metadata struct (mime, byte_len).

    Stand-in for reading real image/audio bytes; the engine-side handling
    (binary column + struct metadata) is exactly what production would use.
    """
    payload = F.encode(F.col(text_col), "utf-8")
    return df.select(
        F.col(id_col).alias("doc_id"),
        payload.alias("payload"),
        F.struct(
            F.lit("application/octet-stream").alias("mime"),
            F.octet_length(F.col(text_col)).cast("long").alias("byte_len"),
        ).alias("meta"),
    )


def _decode_stub(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """STUB decoder: a real implementation would `PIL.Image.open(BytesIO(b))`
    / `av.open` here. This container has no image/audio libs, so we emit
    deterministic fake dimensions derived from the byte length — the Arrow
    batch shape, schema, and iteration pattern are the real thing."""
    for pdf in batches:
        byte_len = pdf["payload"].map(len).astype("int64")
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"].astype("int64"),
                "byte_len": byte_len,
                "width": byte_len % 640,
                "height": (byte_len * 7) % 480,
                "n_frames": byte_len % 16,
            }
        )


def decode_features(df: DataFrame) -> DataFrame:
    """Run the Arrow-batched decode operator over (doc_id, payload) rows.

    Repartitioned first: decode is CPU-bound per row, so a coarse input (one
    file split) must spread across cores/executors before the Python stage.
    """
    par = df.sparkSession.sparkContext.defaultParallelism
    return (
        df.select("doc_id", "payload")
        .repartition(par)
        .mapInPandas(_decode_stub, schema=DECODE_SCHEMA)
    )
