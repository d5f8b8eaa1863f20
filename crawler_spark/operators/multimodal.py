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
from pyspark.sql import DataFrame, Window
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


def resize_image(
    media: DataFrame, out_w: int = 2, out_h: int = 2, backend: str = "fake"
) -> DataFrame:
    """Image-resize stage: Arrow-batched 1-row-in/1-row-out ``mapInPandas``.

    ``fake``: the 16-byte payload is read as a 4x4 grayscale image and
    average-pooled (integer floor) to 2x2 — deterministic, oracle-checkable
    pixel arithmetic with the same batch shape a real resampler has.
    ``real``: the PIL path (Image.open -> .resize((w,h)) -> tobytes()),
    stubbed because this container ships no codecs.
    Output: (doc, p00, p01, p10, p11) — the pooled pixels as ints (scalar
    columns travel onward; the payload stays behind, see module note).
    """
    if backend == "real":
        raise NotImplementedError(
            "real resize needs PIL (not in this container); wire: "
            "Image.open(io.BytesIO(payload)).resize((out_w, out_h)) inside "
            "the same mapInPandas"
        )
    if (out_w, out_h) != (2, 2):
        raise ValueError("fake backend pins the 4x4 -> 2x2 pooling geometry")

    _POOLS = (
        ("p00", (0, 1, 4, 5)),
        ("p01", (2, 3, 6, 7)),
        ("p10", (8, 9, 12, 13)),
        ("p11", (10, 11, 14, 15)),
    )

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"doc": pdf["doc"]}
            for name, ix in _POOLS:
                out[name] = (
                    pdf["payload"]
                    .map(lambda b, ix=ix: (b[ix[0]] + b[ix[1]] + b[ix[2]] + b[ix[3]]) // 4)
                    .astype("int32")
                )
            yield pd.DataFrame(out)

    schema = T.StructType(
        [T.StructField("doc", media.schema["doc"].dataType, False)]
        + [T.StructField(n, T.IntegerType(), True) for n, _ in _POOLS]
    )
    return media.select("doc", "payload").mapInPandas(_resize, schema)


def frame_sample(
    media: DataFrame, stride: int = 3, backend: str = "fake"
) -> DataFrame:
    """Video frame-sampling stage: ``mapInPandas`` with 1-row-in/N-rows-out
    batch shape (each payload explodes into its sampled frames).

    ``fake``: each payload byte is one 'frame'; every ``stride``-th is kept.
    ``real``: the PyAV path (av.open -> decode(video=0) keyframe stride),
    stubbed because this container ships no codecs.
    Output: (doc, frame_idx, frame_val).
    """
    if backend == "real":
        raise NotImplementedError(
            "real frame sampling needs PyAV/ffmpeg (not in this container); "
            "wire: av.open(io.BytesIO(payload)).decode(video=0) with the "
            "same stride inside this mapInPandas"
        )

    def _sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            docs, idxs, vals = [], [], []
            for doc, b in zip(pdf["doc"], pdf["payload"]):
                for i in range(0, len(b), stride):
                    docs.append(doc)
                    idxs.append(i)
                    vals.append(int(b[i]))
            yield pd.DataFrame(
                {
                    "doc": pd.Series(docs, dtype=pdf["doc"].dtype),
                    "frame_idx": pd.Series(idxs, dtype="int32"),
                    "frame_val": pd.Series(vals, dtype="int32"),
                }
            )

    schema = T.StructType(
        [
            T.StructField("doc", media.schema["doc"].dataType, False),
            T.StructField("frame_idx", T.IntegerType(), False),
            T.StructField("frame_val", T.IntegerType(), False),
        ]
    )
    return media.select("doc", "payload").mapInPandas(_sample, schema)


def dhash_bits(media: DataFrame, backend: str = "fake") -> DataFrame:
    """Perceptual difference-hash (dHash) of the decoded image: bit i set
    when pixel[i] > pixel[i+1] over the row-major grayscale pixel sequence —
    the standard near-duplicate image fingerprint (adjacent-gradient signs
    survive rescaling/re-encoding that byte-exact hashing does not).

    ``fake``: the 16-byte payload IS the pixel sequence -> a 15-bit hash,
    pure arithmetic, reproducible by the DuckDB oracle from the md5 hex.
    ``real``: the PIL path (grayscale resize to 9x8 -> 64-bit dHash),
    stubbed because this container ships no codecs.
    Output: (doc, simhash) — named for dedup.simhash_pairs interop.
    """
    if backend == "real":
        raise NotImplementedError(
            "real dHash needs PIL (not in this container); wire: "
            "Image.open(io.BytesIO(payload)).convert('L').resize((9, 8)) "
            "then adjacent-pixel comparisons inside the same mapInPandas"
        )

    def _dhash(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc": pdf["doc"],
                    "simhash": pdf["payload"]
                    .map(
                        lambda b: sum(
                            1 << i for i in range(len(b) - 1) if b[i] > b[i + 1]
                        )
                    )
                    .astype("int64"),
                }
            )

    schema = T.StructType(
        [
            T.StructField("doc", media.schema["doc"].dataType, False),
            T.StructField("simhash", T.LongType(), False),
        ]
    )
    return media.select("doc", "payload").mapInPandas(_dhash, schema)


def dhash_pairs(
    media: DataFrame, max_hamming: int = 2, backend: str = "fake"
) -> DataFrame:
    """Perceptual image near-dup pairs: hamming(dhash_a, dhash_b) <=
    ``max_hamming``, candidates via dedup.simhash_pairs' pigeonhole chunk
    join (equality joins on hash chunks — never all-pairs, the same plan
    shape that carries the text SimHash family to 10^10 rows). fake backend
    hash width is 15 bits (16 pixels - 1)."""
    from crawler_spark.operators.dedup import simhash_pairs

    return simhash_pairs(
        dhash_bits(media, backend), max_hamming=max_hamming, bits=15
    )


def caption_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    spans_col: str = "spans",
    text_kinds: tuple = ("text", "main", "title"),
) -> DataFrame:
    """Image-text pair mining from interleaved documents (the CLIP/LAION
    training-pair extraction step): each media span pairs with the NEAREST
    text span of the same document by span-offset distance — ties prefer
    the preceding span (how captions sit in real pages), then the lower
    offset. Output: (doc, media_pos, media_ref, caption, caption_offset,
    distance), media_pos numbering media spans in offset order (the media
    table's convention).

    Scale shape: spans explode inside their document and re-meet through a
    doc-keyed equality join + per-media top-1 window — all shuffles are on
    the doc id, no cross-document traffic, and per-doc span counts are
    bounded (tens), so the join fan-out is flat at any corpus size.
    """
    sp = docs.select(
        F.col(id_col).alias("doc"), F.explode(F.col(spans_col)).alias("s")
    )
    media = sp.where(F.col("s.kind") == "media").select(
        "doc",
        F.col("s.media_ref").alias("media_ref"),
        F.col("s.offset").alias("moff"),
    )
    w_pos = Window.partitionBy("doc").orderBy("moff")
    media = media.withColumn(
        "media_pos", (F.row_number().over(w_pos) - 1).cast("long")
    )
    text = sp.where(F.col("s.kind").isin(*text_kinds)).select(
        "doc",
        F.col("s.text").alias("caption"),
        F.col("s.offset").alias("toff"),
    )
    cand = media.join(text, "doc").withColumn(
        "distance", F.abs(F.col("moff") - F.col("toff")).cast("long")
    )
    w = Window.partitionBy("doc", "media_pos").orderBy(
        "distance",
        F.when(F.col("toff") > F.col("moff"), F.lit(1)).otherwise(F.lit(0)),
        "toff",
    )
    return (
        cand.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select(
            "doc",
            "media_pos",
            "media_ref",
            "caption",
            F.col("toff").cast("long").alias("caption_offset"),
            "distance",
        )
    )
