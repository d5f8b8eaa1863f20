"""Multimodal column plumbing — opaque binary payloads + typed metadata.

The reference records media only as link URLs (img src extraction at
/root/reference/src/crawler/content/extractor.py:124-184) and the corpus
carries them as ``media_ref`` spans (BASELINE.json input_hint). A
training-data pipeline additionally moves the *payloads*: this module defines
the Spark-side contract for image/audio/video columns —

    media(doc: long|string, payload: binary, media_type: string,
          n_bytes: long, payload_sha: string)

and the decode / feature-extract stage as Arrow-batched ``mapInPandas``.

The sandbox has no image/audio codecs, so ``decode_features`` ships two
backends behind one schema:
  - ``fake``  (default): deterministic features derived arithmetically from
    the payload bytes (width/height = first two bytes, mean_byte = mean of
    all bytes). Fully testable, and exactly reproducible by the DuckDB oracle.
  - ``real``: raises NotImplementedError with the intended call (PIL/librosa)
    — the marked stub required when codecs are absent.

Partitioning note (100 TB): payloads dominate bytes, so media rows must be
partitioned independently of their documents (by hash60(payload_sha) buckets,
not by host) and joined back to docs only after feature extraction reduces
them to scalar columns; mapInPandas batch size is bounded by
``spark.sql.execution.arrow.maxRecordsPerBatch`` to keep executor memory flat.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

def feature_schema(doc_type: T.DataType) -> T.StructType:
    """Output schema of decode_features; ``doc`` keeps the input's key type
    (long doc ids in the fixtures, canonical-URL strings in the crawl's
    media table)."""
    return T.StructType(
        [
            T.StructField("doc", doc_type, False),
            T.StructField("width", T.IntegerType(), True),
            T.StructField("height", T.IntegerType(), True),
            T.StructField("mean_byte", T.DoubleType(), True),
        ]
    )


def synth_media(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Deterministic stand-in payload column: md5(text) digest bytes.

    Gives every doc a 16-byte binary payload with typed metadata — the same
    shape a real fetch pipeline would produce, synthesized so the plumbing is
    testable without codecs (and reproducible in oracle SQL from the hex).
    """
    payload = F.unhex(F.md5(F.col(text_col)))
    return df.select(
        F.col(id_col).alias("doc"),
        payload.alias("payload"),
        F.lit("image/x-fake").alias("media_type"),
        F.length(payload).cast("long").alias("n_bytes"),
        F.md5(F.col(text_col)).alias("payload_sha"),
    )


def decode_features(media: DataFrame, backend: str = "fake") -> DataFrame:
    """Arrow-batched decode / feature-extract over the payload column.

    ``fake``: width = payload[0], height = payload[1], mean_byte = mean of all
    payload bytes rounded to 4 dp — pure arithmetic, value-checkable.
    ``real``: the PIL/librosa path, stubbed in this container.
    """
    if backend == "real":
        raise NotImplementedError(
            "real media decode needs PIL/librosa (not in this container); "
            "wire: Image.open(io.BytesIO(payload)) inside the same mapInPandas"
        )

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf["payload"]
            yield pd.DataFrame(
                {
                    "doc": pdf["doc"],  # key passes through, whatever its type
                    "width": payloads.map(lambda b: int(b[0])).astype("int32"),
                    "height": payloads.map(lambda b: int(b[1])).astype("int32"),
                    "mean_byte": payloads.map(
                        lambda b: round(sum(b) / len(b), 4)
                    ).astype("float64"),
                }
            )

    schema = feature_schema(media.schema["doc"].dataType)
    return media.select("doc", "payload").mapInPandas(_decode, schema)
