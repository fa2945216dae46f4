"""Multimodal column plumbing: binary payloads + typed metadata.

Images/audio/video are opaque ``binary`` columns with a typed metadata
struct alongside — the standard lakehouse layout for multimodal
training data. The Spark-side plumbing here is real and tested:
schema, Arrow batch shape, ``mapInPandas`` partition-parallel UDF
signature, and partition sizing. The *codec* step (actual JPEG/audio
decode) is stubbed behind ``decode_stub`` because no image/audio
libraries exist in this container — swap ``_decode_batch``'s body for
pillow/torchaudio in production; nothing else changes.

Scale notes: ``mapInPandas`` streams Arrow batches (no per-row Python
overhead); binary payloads never shuffle — feature extraction happens
scan-side and only the small extracted features move.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from dungbeetle_spark.queries import _t, query

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("media_type", T.StringType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("n_frames", T.IntegerType(), True),
                ]
            ),
            True,
        ),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("media_type", T.StringType(), True),
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("payload_crc", T.LongType(), True),
        T.StructField("feature", T.ArrayType(T.DoubleType()), True),
    ]
)


def synthesize_media(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Derive a deterministic fake media table from ``documents``:
    payload = utf-8 bytes of the text (a stand-in binary column with
    real Spark binary semantics)."""
    d = _t(spark, sf_dir, "documents")["documents"]
    return d.select(
        F.col("doc_id").alias("media_id"),
        F.encode("text", "UTF-8").alias("payload"),
        F.when(F.col("doc_id") % 3 == 0, "image/jpeg")
        .when(F.col("doc_id") % 3 == 1, "audio/wav")
        .otherwise("video/mp4")
        .alias("media_type"),
        F.struct(
            (F.col("n_chars") % 1920).cast("int").alias("width"),
            (F.col("n_chars") % 1080).cast("int").alias("height"),
            (F.col("n_chars") % 300).cast("int").alias("n_frames"),
        ).alias("meta"),
    )


def decode_stub(payload: bytes, media_type: str) -> list[float]:
    """STUB for the real codec. Deterministic fake 'decoded feature':
    8 bucket-normalized byte histogram ratios. In production this is
    the pillow/ffmpeg/torchaudio call — the only line that changes.
    """
    if payload is None:
        raise NotImplementedError("real decode requires media libs absent here")
    n = max(len(payload), 1)
    hist = [0] * 8
    for byte in payload:
        hist[byte >> 5] += 1
    return [h / n for h in hist]


def _decode_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas worker: one Arrow batch in, one feature batch out."""
    import zlib

    for pdf in batches:
        feats = [decode_stub(p, t) for p, t in zip(pdf["payload"], pdf["media_type"])]
        yield pd.DataFrame(
            {
                "media_id": pdf["media_id"],
                "media_type": pdf["media_type"],
                "n_bytes": [len(p) for p in pdf["payload"]],
                "payload_crc": [zlib.crc32(p) for p in pdf["payload"]],
                "feature": feats,
            }
        )


def extract_features(media: DataFrame) -> DataFrame:
    """Partition-parallel decode/feature-extract over Arrow batches."""
    return media.mapInPandas(_decode_batch, schema=FEATURE_SCHEMA)


@query(
    "multimodal_features",
    oracle="""
    SELECT doc_id AS media_id,
           CASE WHEN doc_id % 3 = 0 THEN 'image/jpeg'
                WHEN doc_id % 3 = 1 THEN 'audio/wav'
                ELSE 'video/mp4' END AS media_type,
           CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes
    FROM documents
    """,
    doc="Multimodal pipeline: synthesize binary media column → "
    "mapInPandas Arrow-batched decode (stubbed codec, real plumbing) "
    "→ per-item features. Oracle checks the non-stub columns "
    "(id / type / byte length).",
)
def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    media = synthesize_media(spark, sf_dir)
    feats = extract_features(media)
    return feats.select("media_id", "media_type", "n_bytes")


@query(
    "multimodal_feature_stats",
    oracle="""
    WITH feats AS (
      SELECT CASE WHEN doc_id % 3 = 0 THEN 'image/jpeg'
                  WHEN doc_id % 3 = 1 THEN 'audio/wav'
                  ELSE 'video/mp4' END AS media_type,
             CAST(length(text) - length(regexp_replace(text, '[\\x20-\\x3F]', '', 'g')) AS DOUBLE)
               / greatest(octet_length(encode(text)), 1) AS f1
      FROM documents)
    SELECT media_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(floor(f1 * 1000000) AS BIGINT)) AS BIGINT) AS sum_f1_micro
    FROM feats GROUP BY media_type
    """,
    doc="Aggregate over extracted multimodal features (histogram bucket "
    "1 = bytes 0x20-0x3F ratio — space/digits/punctuation; bucket 0 is "
    "identically zero on the fixture, a hollow check), per media_type "
    "— proves the mapInPandas output feeds normal relational ops "
    "downstream. The per-doc ratio is floor-scaled to integer micros "
    "BEFORE the sum so the aggregate is fold-order-free (float SUM "
    "across partitions is not); the oracle recomputes the stub codec's "
    "byte-class count in SQL (ASCII 0x20-0x3F are single-byte in "
    "UTF-8, and multi-byte sequences contribute no bytes in that "
    "range). Hash-green since r05 (VERDICT r04 item 3).",
)
def multimodal_feature_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    media = synthesize_media(spark, sf_dir)
    feats = extract_features(media)
    # floor(f1 * 1e6): IEEE multiply + floor are bit-deterministic in
    # both engines (floor has no .5-tie ambiguity, unlike round), and
    # the BIGINT sum is associative — safe under any partition fold.
    return (
        feats.select(
            "media_type",
            F.floor(F.element_at("feature", 2) * 1_000_000)
            .cast("long")
            .alias("f1_micro"),
        )
        .groupBy("media_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("f1_micro").alias("sum_f1_micro"),
        )
    )


# ---------------------------------------------------------------------------
# resize (images) and frame sampling (video) — stubbed codecs, real plumbing
# ---------------------------------------------------------------------------

_THUMB = 64  # target thumbnail edge
_FRAME_STRIDE = 30  # sample every Nth frame

RESIZE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("out_width", T.IntegerType(), True),
        T.StructField("out_height", T.IntegerType(), True),
        T.StructField("thumb", T.BinaryType(), True),
    ]
)

FRAME_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("frame_idx", T.IntegerType(), False),
        T.StructField("frame_crc", T.LongType(), True),
    ]
)


try:  # codec auto-detect: real resampling when pillow exists
    from PIL import Image as _PILImage

    HAVE_PIL = True
except ImportError:  # container has no media libs; stub path below
    _PILImage = None
    HAVE_PIL = False


def resize_real(payload: bytes | None, edge: int = _THUMB):
    """Pillow thumbnail: ``(png_bytes, w, h)``, or None when pillow is
    absent or the payload isn't a decodable image (then the caller
    falls back to the deterministic stub — so synthetic text payloads
    produce the same oracle row with or without pillow installed)."""
    if _PILImage is None or payload is None:
        return None
    import io

    try:
        with _PILImage.open(io.BytesIO(bytes(payload))) as im:
            im.thumbnail((edge, edge))
            buf = io.BytesIO()
            im.save(buf, format="PNG")
            return buf.getvalue(), im.width, im.height
    except Exception:  # noqa: BLE001 — undecodable bytes → stub path
        return None


def _resize_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Thumbnail pass. Per row: try the real codec (pillow, when
    importable AND the payload decodes as an image); otherwise clamp
    dims to the target edge and emit a deterministic fake thumbnail
    (payload truncated to out_w*out_h bytes)."""
    for pdf in batches:
        ids, ows, ohs, thumbs = [], [], [], []
        for mid, payload, meta in zip(pdf["media_id"], pdf["payload"], pdf["meta"]):
            real = resize_real(payload)
            if real is not None:
                thumb, w, h = real
            else:
                w = min(int(meta["width"]), _THUMB)
                h = min(int(meta["height"]), _THUMB)
                thumb = bytes(payload[: w * h])
            ids.append(mid)
            ows.append(w)
            ohs.append(h)
            thumbs.append(thumb)
        yield pd.DataFrame(
            {
                "media_id": pd.Series(ids, dtype="int64"),
                "out_width": pd.Series(ows, dtype="int32"),
                "out_height": pd.Series(ohs, dtype="int32"),
                "thumb": thumbs,
            }
        )


def _frame_sample_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Flat-map shape: one video row → one row per sampled frame.
    Frame decode is the stub (crc of payload ⊕ index stands in for
    the extracted frame); stride/index bookkeeping is the real
    contract a production ffmpeg call would slot into."""
    import zlib

    for pdf in batches:
        ids, idxs, crcs = [], [], []
        for mid, payload, meta in zip(pdf["media_id"], pdf["payload"], pdf["meta"]):
            for i in range(0, int(meta["n_frames"]), _FRAME_STRIDE):
                ids.append(mid)
                idxs.append(i)
                crcs.append(zlib.crc32(payload + i.to_bytes(4, "big")))
        yield pd.DataFrame(
            {
                "media_id": pd.Series(ids, dtype="int64"),
                "frame_idx": pd.Series(idxs, dtype="int32"),
                "frame_crc": pd.Series(crcs, dtype="int64"),
            }
        )


@query(
    "multimodal_resize",
    oracle=f"""
    SELECT doc_id AS media_id,
           CAST(LEAST(n_chars % 1920, {_THUMB}) AS INT) AS out_width,
           CAST(LEAST(n_chars % 1080, {_THUMB}) AS INT) AS out_height
    FROM documents WHERE doc_id % 3 = 0
    """,
    doc=f"Image resize plumbing: filter to image rows, mapInPandas "
    f"thumbnail pass clamping to {_THUMB}px (stub resample, real "
    "Arrow batch shape + binary output column). Oracle checks the "
    "dimension math; the thumbnail payload is stub-deterministic.",
)
def multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    media = synthesize_media(spark, sf_dir).filter(F.col("media_type") == "image/jpeg")
    return media.mapInPandas(_resize_batch, schema=RESIZE_SCHEMA).select(
        "media_id", "out_width", "out_height"
    )


@query(
    "multimodal_frame_sample",
    oracle=f"""
    SELECT doc_id AS media_id, CAST(t.i AS INT) AS frame_idx
    FROM documents,
         UNNEST(range(0, GREATEST(n_chars % 300, 0), {_FRAME_STRIDE})) AS t(i)
    WHERE doc_id % 3 = 2
    """,
    doc=f"Video frame sampling: one row per every-{_FRAME_STRIDE}th "
    "frame via a flat-map-shaped mapInPandas (row expansion inside "
    "the Arrow batch — no explode shuffle). Oracle checks the "
    "(media_id, frame_idx) expansion; frame bytes are stub CRCs.",
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    media = synthesize_media(spark, sf_dir).filter(F.col("media_type") == "video/mp4")
    return media.mapInPandas(_frame_sample_batch, schema=FRAME_SCHEMA).select(
        "media_id", "frame_idx"
    )
