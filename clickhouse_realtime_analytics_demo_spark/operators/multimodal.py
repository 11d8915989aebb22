"""Multimodal columns for training-data pipelines.

Images/audio/video are carried as opaque ``binary`` payload columns
with a typed metadata struct, exactly how a 100 TB lake stores them
(payload bytes inline for small assets or an object-store URI for
large ones; metadata always structured and queryable without touching
bytes).

Spark-side plumbing here is real and tested: schemas, Arrow-batched
``mapInPandas`` transforms with bounded batch sizes, partition-count
preservation, and deterministic *fake* codecs. The actual byte-level
decode (JPEG/PNG/audio frames) is stubbed: the image/audio libraries
are not in this container, so ``decode_image``/``decode_audio`` raise
``NotImplementedError`` unless ``fake=True``, in which case a
documented deterministic stand-in (byte-histogram features, payload-
derived dimensions) runs instead. Swapping the stub for PIL/ffmpeg
changes ONE inner function; none of the Spark plumbing moves.

Why mapInPandas and not a scalar UDF: batch-level control. Each Arrow
batch holds whole rows of payload bytes; decoding wants to amortize
codec setup per batch and bound peak memory via
``spark.sql.execution.arrow.maxRecordsPerBatch`` — the standard knob
for binary-heavy pipelines (set it low, e.g. 64, when payloads are
MB-sized).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator
from typing import TYPE_CHECKING

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

if TYPE_CHECKING:  # pandas only in the executor path
    import pandas as pd

# ------------------------------------------------------------- schemas

# Typed metadata carried next to every payload — queryable (filter,
# group, join) without deserializing a single payload byte.
MEDIA_META = T.StructType(
    [
        T.StructField("media_type", T.StringType()),  # image | audio | video
        T.StructField("format", T.StringType()),  # jpeg | png | wav | mp4 ...
        T.StructField("width", T.IntegerType()),  # px (image/video) or null
        T.StructField("height", T.IntegerType()),
        T.StructField("duration_ms", T.LongType()),  # audio/video or null
        T.StructField("size_bytes", T.LongType()),
    ]
)

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("doc_id", T.LongType()),  # provenance link
        T.StructField("payload", T.BinaryType()),
        T.StructField("meta", MEDIA_META),
    ]
)

IMAGE_FEATURES = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("byte_mean", T.DoubleType()),
        T.StructField("byte_entropy", T.DoubleType()),
        T.StructField("phash", T.LongType()),  # perceptual-hash stand-in
    ]
)

FRAME_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("frame_index", T.IntegerType(), False),
        T.StructField("frame_payload", T.BinaryType()),
    ]
)


# ---------------------------------------------------- fake (stub) codec


def _fake_decode_dims(payload: bytes) -> tuple[int, int]:
    """Deterministic stand-in for image dimension decode: derive
    (width, height) from the payload digest. Stable across runs,
    machines, and partitionings."""
    d = hashlib.sha256(payload).digest()
    return 16 + d[0] % 240, 16 + d[1] % 240


def pil_available() -> bool:
    """True when a real image codec (PIL) is importable."""
    try:
        import PIL.Image  # noqa: F401

        return True
    except ImportError:
        return False


def _pil_decode(payload: bytes) -> dict:
    """Real image decode via PIL: true dimensions + an 8x8 average-
    hash perceptual fingerprint; byte-level stats stay payload-based
    so the field set matches the stub exactly."""
    import io
    import math

    from PIL import Image

    img = Image.open(io.BytesIO(payload))
    img.load()
    w, h = img.size
    gray = img.convert("L").resize((8, 8))
    px = list(gray.getdata())
    mean_px = sum(px) / 64
    bits = 0
    for i, v in enumerate(px):
        if v >= mean_px:
            bits |= 1 << i
    phash = bits - (1 << 64) if bits >= (1 << 63) else bits  # signed int64
    n = len(payload)
    counts: dict[int, int] = {}
    for b in payload:
        counts[b] = counts.get(b, 0) + 1
    entropy = -sum((c / n) * math.log2(c / n) for c in counts.values()) if n else 0.0
    return {
        "width": w,
        "height": h,
        "n_bytes": n,
        "byte_mean": sum(payload) / n if n else 0.0,
        "byte_entropy": entropy,
        "phash": phash,
    }


def decode_image(payload: bytes, *, fake: bool | None = None) -> dict:
    """Decode one image payload to a feature dict.

    ``fake=None`` (default) auto-selects: the real PIL decode when
    the library is importable, else the deterministic byte-level
    stand-in (histogram stats + sha-derived dims) — so the stub
    boundary vanishes on deployments that ship an image codec.
    ``fake=False`` demands the real codec and raises without one;
    ``fake=True`` forces the stub (used by the synthetic-corpus
    queries, whose payloads are not real image bytes).
    """
    if fake is None:
        fake = not pil_available()
    if not fake:
        if not pil_available():
            raise NotImplementedError(
                "real image decode requires an image library (PIL/torchvision); "
                "re-run with fake=True for the deterministic stub"
            )
        return _pil_decode(payload)
    import math

    n = len(payload)
    counts: dict[int, int] = {}
    for b in payload:
        counts[b] = counts.get(b, 0) + 1
    mean = sum(payload) / n if n else 0.0
    entropy = -sum((c / n) * math.log2(c / n) for c in counts.values()) if n else 0.0
    w, h = _fake_decode_dims(payload)
    phash = int.from_bytes(hashlib.sha256(payload).digest()[:8], "big", signed=True)
    return {
        "width": w,
        "height": h,
        "n_bytes": n,
        "byte_mean": mean,
        "byte_entropy": entropy,
        "phash": phash,
    }


# ------------------------------------------------- distributed plumbing


def extract_image_features(media: DataFrame, *, fake: bool = False) -> DataFrame:
    """payload -> IMAGE_FEATURES via Arrow-batched mapInPandas.

    Plan shape: narrow map, no shuffle — feature extraction runs where
    the payload partition lives, which is the only viable layout when
    payloads are MB-scale and the table is 100 TB. Output partition
    count equals input partition count.
    """

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for pdf in batches:
            feats = [decode_image(bytes(p), fake=fake) for p in pdf["payload"]]
            out = pd.DataFrame(feats)
            out.insert(0, "media_id", pdf["media_id"].values)
            yield out

    return media.select("media_id", "payload").mapInPandas(run, schema=IMAGE_FEATURES)


def resize_images(media: DataFrame, width: int, height: int, *, fake: bool = False) -> DataFrame:
    """payload -> resized payload (same schema), mapInPandas.

    The fake resize is a deterministic re-digest tagged with the target
    dims — it preserves the real operator's contract (binary in,
    binary out, metadata updated) without an image library.
    """
    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("payload", T.BinaryType()),
            T.StructField("meta", MEDIA_META),
        ]
    )

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for pdf in batches:
            if not fake:
                raise NotImplementedError("real resize requires an image library")
            payloads = [
                hashlib.sha256(bytes(p) + f":{width}x{height}".encode()).digest()
                for p in pdf["payload"]
            ]
            metas = [
                {
                    "media_type": "image",
                    "format": "raw",
                    "width": width,
                    "height": height,
                    "duration_ms": None,
                    "size_bytes": len(p),
                }
                for p in payloads
            ]
            yield pd.DataFrame(
                {"media_id": pdf["media_id"].values, "payload": payloads, "meta": metas}
            )

    return media.select("media_id", "payload").mapInPandas(run, schema=out_schema)


def sample_frames(media: DataFrame, every_ms: int = 1000, *, fake: bool = False) -> DataFrame:
    """video payload -> one row per sampled frame (FRAME_SCHEMA).

    Row-expanding mapInPandas: output rows >= input rows, still no
    shuffle. Frame count comes from meta.duration_ms; the fake frame
    payload is a per-index digest of the source payload.
    """

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for pdf in batches:
            if not fake:
                raise NotImplementedError("real frame sampling requires a video library")
            ids, idxs, frames = [], [], []
            for mid, p, dur in zip(
                pdf["media_id"], pdf["payload"], pdf["duration_ms"], strict=True
            ):
                n_frames = max(1, int(dur or 0) // every_ms)
                for i in range(n_frames):
                    ids.append(mid)
                    idxs.append(i)
                    frames.append(hashlib.sha256(bytes(p) + i.to_bytes(4, "big")).digest())
            yield pd.DataFrame(
                {"media_id": ids, "frame_index": idxs, "frame_payload": frames}
            )

    return media.select(
        "media_id", "payload", F.col("meta.duration_ms").alias("duration_ms")
    ).mapInPandas(run, schema=FRAME_SCHEMA)


# ----------------------------------------------------- synthetic corpus


def synthesize_media(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Deterministic MEDIA_SCHEMA table derived from the documents
    table (the container has no real media files). Payload = utf-8 text
    bytes; metadata mirrors what an ingest scanner would record. Pure
    JVM expressions — the synthesis itself is codegen'd, no Python.
    """
    payload = F.encode(F.col(text_col), "UTF-8")
    return docs.select(
        F.col(id_col).alias("media_id"),
        F.col(id_col).alias("doc_id"),
        payload.alias("payload"),
        F.struct(
            F.lit("image").alias("media_type"),
            F.lit("fake").alias("format"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            (F.length(payload).cast("bigint") * 10).alias("duration_ms"),
            F.length(payload).cast("bigint").alias("size_bytes"),
        ).alias("meta"),
    )
