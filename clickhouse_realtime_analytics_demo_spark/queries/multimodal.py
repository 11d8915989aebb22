"""Multimodal-pipeline queries (beyond-reference surface).

The media table is synthesized deterministically from ``documents``
(no real media files in the container; operators/multimodal.py
documents the stub boundary). The metadata paths are pure JVM
expressions and oracle-checked. The Arrow/mapInPandas decode path is
pinned two ways: the REAL-codec roundtrips (``media_wav_stats``,
``media_png_stats``) synthesize genuine WAV/PNG payloads whose
duration/dimension/pixel stats are arithmetic identities an oracle
states independently, while the stub-decode queries stay rows-only
(sha-digest features have no DuckDB twin) and are unit-tested against
the driver-side codec in tests/test_multimodal.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from clickhouse_realtime_analytics_demo_spark.catalog import table
from clickhouse_realtime_analytics_demo_spark.operators import multimodal
from clickhouse_realtime_analytics_demo_spark.queries.registry import register


@register(
    "media_meta_stats",
    oracle="""
    SELECT COUNT(*) AS n_assets,
           CAST(SUM(octet_length(CAST(text AS BLOB))) AS BIGINT) AS total_bytes,
           CAST(SUM(octet_length(CAST(text AS BLOB)) * 10) AS BIGINT) AS total_duration_ms,
           CAST(MIN(octet_length(CAST(text AS BLOB))) AS BIGINT) AS min_bytes,
           CAST(MAX(octet_length(CAST(text AS BLOB))) AS BIGINT) AS max_bytes
    FROM documents
    """,
)
def media_meta_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Metadata-only scan of the media table: aggregate typed metadata
    without touching payload bytes — the query pattern that makes
    binary columns cheap to govern at 100 TB (column pruning skips the
    payload entirely; verify via ReadSchema in explain)."""
    media = multimodal.synthesize_media(table(spark, sf_dir, "documents"))
    return media.agg(
        F.count("*").alias("n_assets"),
        F.sum("meta.size_bytes").alias("total_bytes"),
        F.sum("meta.duration_ms").alias("total_duration_ms"),
        F.min("meta.size_bytes").alias("min_bytes"),
        F.max("meta.size_bytes").alias("max_bytes"),
    )


@register(
    "media_frame_sample",
    oracle="""
    SELECT doc_id AS media_id,
           CAST(unnest(generate_series(0,
                GREATEST(CAST(octet_length(CAST(text AS BLOB)) * 10 AS BIGINT) // 1000, 1) - 1))
             AS INTEGER) AS frame_index
    FROM documents
    WHERE doc_id < 200
    ORDER BY media_id, frame_index
    """,
)
def media_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling through the row-expanding mapInPandas operator:
    one row per 1000 ms of duration_ms. The (media_id, frame_index)
    spine is oracle-checked; frame payload bytes are covered by unit
    tests."""
    docs = table(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    media = multimodal.synthesize_media(docs)
    return (
        multimodal.sample_frames(media, every_ms=1000, fake=True)
        .select("media_id", "frame_index")
        .orderBy("media_id", "frame_index")
    )


@register("media_image_features")  # rows-only: sha-digest features have no SQL twin
def media_image_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-batched image feature extraction (fake codec) aggregated
    per provenance doc source — the decode/score stage of a multimodal
    curation pipeline."""
    docs = table(spark, sf_dir, "documents").filter(F.col("doc_id") < 500)
    media = multimodal.synthesize_media(docs)
    feats = multimodal.extract_image_features(media, fake=True)
    joined = feats.join(docs.select(F.col("doc_id").alias("media_id"), "source"), "media_id")
    return (
        joined.groupBy("source")
        .agg(
            F.count("*").alias("n_images"),
            F.round(F.avg("byte_entropy"), 4).alias("avg_entropy"),
            F.round(F.avg("byte_mean"), 4).alias("avg_byte_mean"),
            F.approx_count_distinct("phash").alias("distinct_phash"),
        )
        .orderBy("source")
    )


@register(
    "media_wav_stats",
    oracle="""
    SELECT lang,
           COUNT(*) AS n_assets,
           CAST(SUM(2 * n_chars) AS BIGINT) AS total_duration_ms,
           CAST(MIN(8000) AS INT) AS sample_rate,
           CAST(MAX(16) AS INT) AS bits_per_sample,
           CAST(SUM(CAST(n_chars AS BIGINT) * 32) AS BIGINT) AS total_pcm_bytes
    FROM documents
    WHERE doc_id < 300
    GROUP BY lang ORDER BY lang
    """,
)
def media_wav_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Real-codec audio roundtrip through Arrow plumbing: synthesize
    genuine PCM WAV payloads (RIFF writer, mapInPandas) and parse them
    back with the pure-Python header decoder
    (operators/multimodal.py::decode_audio, fake=None auto-selects the
    real parse for sniffed WAVs). duration_ms = 2 x n_chars at 8 kHz
    by construction, so the oracle states the roundtrip identity
    independently — a wrong header write OR a wrong parse breaks the
    hash match."""
    docs = table(spark, sf_dir, "documents").filter(F.col("doc_id") < 300)
    media = multimodal.synthesize_wav_media(docs)
    feats = multimodal.extract_audio_features(media)
    joined = feats.join(
        docs.select(F.col("doc_id").alias("media_id"), "lang"), "media_id"
    )
    return (
        joined.groupBy("lang")
        .agg(
            F.count("*").alias("n_assets"),
            F.sum("duration_ms").alias("total_duration_ms"),
            F.min("sample_rate").alias("sample_rate"),
            F.max("bits_per_sample").alias("bits_per_sample"),
            F.sum("n_bytes").alias("total_pcm_bytes"),
        )
        .orderBy("lang")
    )


@register(
    "media_png_stats",
    # The image twin of media_wav_stats, now through a COMPRESSED
    # format: synthesize_png_media's gradient gives closed-form
    # dimensions and pixel stats (w = 8 + doc_id%5, h = 5 + doc_id%4,
    # base = doc_id%180, byte_mean = base + (w-1)/2 + (h-1),
    # content bytes = 3*w*h), which this SQL states independently of
    # the codec. byte_mean terms are exact multiples of 0.5 far below
    # 2^52, so the double SUM is order-independent and hash-stable.
    oracle="""
    SELECT lang,
           COUNT(*) AS n_assets,
           CAST(SUM(8 + doc_id % 5) AS BIGINT) AS total_width,
           CAST(SUM(5 + doc_id % 4) AS BIGINT) AS total_height,
           CAST(SUM(3 * (8 + doc_id % 5) * (5 + doc_id % 4)) AS BIGINT)
             AS total_content_bytes,
           SUM((doc_id % 180) + (8 + doc_id % 5 - 1) / 2.0 + (5 + doc_id % 4 - 1))
             AS sum_byte_mean
    FROM documents
    WHERE doc_id < 300
    GROUP BY lang ORDER BY lang
    """,
)
def media_png_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Real compressed-codec image roundtrip through Arrow plumbing:
    synthesize genuine PNG payloads (stdlib deflate writer cycling all
    five filter types, mapInPandas) and decode them back with the
    pure-Python inflate+defilter parser
    (operators/multimodal.py::_parse_png via decode_image fake=None).
    Width/height/content-bytes/byte-mean are arithmetic identities of
    doc_id by construction, so the oracle pins the write→read
    roundtrip end to end — a wrong filter on write OR a wrong
    defilter on read breaks the hash match."""
    docs = table(spark, sf_dir, "documents").filter(F.col("doc_id") < 300)
    media = multimodal.synthesize_png_media(docs)
    feats = multimodal.extract_image_features(media)
    joined = feats.join(
        docs.select(F.col("doc_id").alias("media_id"), "lang"), "media_id"
    )
    return (
        joined.groupBy("lang")
        .agg(
            F.count("*").alias("n_assets"),
            F.sum("width").alias("total_width"),
            F.sum("height").alias("total_height"),
            F.sum("n_bytes").alias("total_content_bytes"),
            F.sum("byte_mean").alias("sum_byte_mean"),
        )
        .orderBy("lang")
    )


@register(
    "media_video_frames",
    # The VIDEO roundtrip (r9): synthesize_avi_media's constant frames
    # give closed-form (doc_id, frame_index) identities through FOUR
    # codec layers — AVI container write, DIB/MJPG frame encode, frame
    # decode + PNG re-encode in sample_frames, PNG decode in feature
    # extraction. At 5 fps and every_ms=200 the sampler hits each
    # frame exactly once, so the spine is generate_series over the
    # per-doc frame count.
    oracle="""
    SELECT d.doc_id AS media_id,
           CAST(s.i AS INTEGER) AS frame_index,
           CAST(8 + d.doc_id % 5 AS INTEGER) AS width,
           CAST(5 + d.doc_id % 4 AS INTEGER) AS height,
           CAST((d.doc_id * 7 + s.i * 13) % 256 AS DOUBLE) AS byte_mean
    FROM documents d
    JOIN (SELECT unnest(generate_series(0, 8)) AS i) s
      ON s.i < 2 + d.doc_id % 7
    WHERE d.doc_id < 240
    ORDER BY media_id, frame_index
    """,
)
def media_video_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL video frame sampling end to end (r9 — closes the last
    env-blocked media stub for the DIB/MJPG tier): synthesize genuine
    AVI clips (uncompressed DIB for even docs, MJPG reusing the
    baseline-JPEG encoder for odd), sample one frame per 200 ms with
    the real tier (container walk + frame decode + PNG re-encode,
    operators/multimodal.py::sample_frames fake=None), then decode
    each sampled PNG back to features. (media_id, frame_index) ride
    packed through the feature extractor's media_id column."""
    docs = table(spark, sf_dir, "documents").filter(F.col("doc_id") < 240)
    media = multimodal.synthesize_avi_media(docs)
    frames = multimodal.sample_frames(media, every_ms=200)
    packed = frames.select(
        (F.col("media_id") * 100 + F.col("frame_index")).alias("media_id"),
        F.col("frame_payload").alias("payload"),
    )
    feats = multimodal.extract_image_features(packed)
    return feats.select(
        F.expr("media_id div 100").alias("media_id"),
        (F.col("media_id") % 100).cast("int").alias("frame_index"),
        "width",
        "height",
        "byte_mean",
    ).orderBy("media_id", "frame_index")


@register(
    "media_adpcm_stats",
    # The COMPRESSED-audio twin of media_wav_stats (r9, VERDICT #7):
    # whole-block IMA-ADPCM payloads make every parsed field a
    # closed-form function of doc_id (blocks = 1 + doc_id%4, 505
    # samples/block at 8 kHz, 256 bytes/block, 4 bits/sample), stated
    # here with no knowledge of the codec.
    oracle="""
    SELECT lang,
           COUNT(*) AS n_assets,
           CAST(SUM(((1 + doc_id % 4) * 505 * 1000) // 8000) AS BIGINT)
             AS total_duration_ms,
           CAST(MIN(8000) AS INT) AS sample_rate,
           CAST(MAX(4) AS INT) AS bits_per_sample,
           CAST(SUM((1 + doc_id % 4) * 256) AS BIGINT) AS total_adpcm_bytes
    FROM documents
    WHERE doc_id < 300
    GROUP BY lang ORDER BY lang
    """,
)
def media_adpcm_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IMA-ADPCM write→parse roundtrip through Arrow plumbing:
    synthesize genuine compressed WAVs (integer ADPCM encoder +
    fmt-0x11/fact RIFF writer, mapInPandas) and parse them back with
    the extended pure-Python header walk
    (operators/multimodal.py::_parse_wav via decode_audio fake=None).
    Block-count arithmetic is a doc_id identity, so the oracle pins
    the samples-per-block duration math end to end; the sample-level
    decoder itself is pinned by tests/test_adpcm.py."""
    docs = table(spark, sf_dir, "documents").filter(F.col("doc_id") < 300)
    media = multimodal.synthesize_adpcm_media(docs)
    feats = multimodal.extract_audio_features(media)
    joined = feats.join(
        docs.select(F.col("doc_id").alias("media_id"), "lang"), "media_id"
    )
    return (
        joined.groupBy("lang")
        .agg(
            F.count("*").alias("n_assets"),
            F.sum("duration_ms").alias("total_duration_ms"),
            F.min("sample_rate").alias("sample_rate"),
            F.max("bits_per_sample").alias("bits_per_sample"),
            F.sum("n_bytes").alias("total_adpcm_bytes"),
        )
        .orderBy("lang")
    )


@register(
    "media_gif_stats",
    # The palette-codec (LZW + interlace) twin of media_png_stats:
    # synthesize_gif_media's gradient gives the same closed-form
    # identities (w = 8 + doc_id%5, h = 6 + doc_id%4, base =
    # doc_id%200, byte_mean = base + (w-1)/2 + (h-1), content bytes =
    # 3*w*h) stated here with no knowledge of the codec; byte_mean
    # terms are exact multiples of 0.5, so the double SUM is
    # order-independent and hash-stable.
    oracle="""
    SELECT lang,
           COUNT(*) AS n_assets,
           CAST(SUM(8 + doc_id % 5) AS BIGINT) AS total_width,
           CAST(SUM(6 + doc_id % 4) AS BIGINT) AS total_height,
           CAST(SUM(3 * (8 + doc_id % 5) * (6 + doc_id % 4)) AS BIGINT)
             AS total_content_bytes,
           SUM((doc_id % 200) + (8 + doc_id % 5 - 1) / 2.0 + (6 + doc_id % 4 - 1))
             AS sum_byte_mean
    FROM documents
    WHERE doc_id < 300
    GROUP BY lang ORDER BY lang
    """,
)
def media_gif_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GIF write→read roundtrip through Arrow plumbing (r9, VERDICT
    #3): synthesize genuine GIF payloads (variable-width LZW encoder,
    half interlaced, mapInPandas) and decode them back with the
    pure-Python LZW + de-interlace parser
    (operators/multimodal.py::_parse_gif via decode_image fake=None).
    Dimensions and pixel stats are arithmetic identities of doc_id by
    construction, so the oracle pins the roundtrip end to end."""
    docs = table(spark, sf_dir, "documents").filter(F.col("doc_id") < 300)
    media = multimodal.synthesize_gif_media(docs)
    feats = multimodal.extract_image_features(media)
    joined = feats.join(
        docs.select(F.col("doc_id").alias("media_id"), "lang"), "media_id"
    )
    return (
        joined.groupBy("lang")
        .agg(
            F.count("*").alias("n_assets"),
            F.sum("width").alias("total_width"),
            F.sum("height").alias("total_height"),
            F.sum("n_bytes").alias("total_content_bytes"),
            F.sum("byte_mean").alias("sum_byte_mean"),
        )
        .orderBy("lang")
    )


@register(
    "media_jpeg_stats",
    # The LOSSY-codec roundtrip: synthesize_jpeg_media's constant
    # 8×8 tiles are DC-only blocks, exact under a flat quant step of
    # 8, so width/height/content-bytes/byte-mean are closed-form
    # functions of doc_id that this SQL states with no knowledge of
    # the codec. Per-media rows (no cross-row float sums); the tile
    # count is a power of two so AVG is exactly representable and
    # hash-stable on both engines.
    oracle="""
    WITH params AS (
        SELECT doc_id,
               CASE doc_id % 3 WHEN 0 THEN 1 WHEN 1 THEN 2 ELSE 4 END AS tx,
               CASE doc_id % 2 WHEN 0 THEN 1 ELSE 2 END AS ty
        FROM documents WHERE doc_id < 240
    )
    SELECT p.doc_id AS media_id,
           CAST(8 * p.tx AS INTEGER) AS width,
           CAST(8 * p.ty AS INTEGER) AS height,
           CAST(64 * p.tx * p.ty AS BIGINT) AS content_bytes,
           AVG(CAST((p.doc_id * 7 + s.t * 13) % 256 AS DOUBLE)) AS byte_mean
    FROM params p
    JOIN (SELECT unnest(generate_series(0, 7)) AS t) s ON s.t < p.tx * p.ty
    GROUP BY p.doc_id, p.tx, p.ty
    ORDER BY media_id
    """,
)
def media_jpeg_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Baseline-JPEG write→read roundtrip through Arrow plumbing:
    synthesize genuine JPEG payloads (FDCT + Annex-K Huffman entropy
    coder, mapInPandas) and decode them back with the pure-Python
    baseline decoder (operators/jpeg_codec.py::parse_jpeg via
    decode_image fake=None — the decoder rebuilds Huffman/quant
    tables from the file's own DQT/DHT, sharing no constants with
    the writer). Dimensions and pixel stats are closed-form
    identities of doc_id (DC-only blocks: JPEG's lossless corner),
    so the oracle pins the full marker/Huffman/DC-prediction/IDCT
    path end to end."""
    docs = table(spark, sf_dir, "documents").filter(F.col("doc_id") < 240)
    media = multimodal.synthesize_jpeg_media(docs)
    feats = multimodal.extract_image_features(media)
    return feats.select(
        "media_id",
        "width",
        "height",
        F.col("n_bytes").alias("content_bytes"),
        "byte_mean",
    ).orderBy("media_id")


@register(
    "media_resize_roundtrip",
    # Constant images are the resize identity: box-averaging a
    # constant is the constant, so restricting to the constant
    # members of the JPEG corpus (doc_id % 6 = 0 ⇒ one 8×8 tile)
    # gives closed-form outputs for the WHOLE three-stage chain —
    # synthesize JPEG → decode+box-resample+re-encode PNG → decode
    # PNG. Output raster is RGB (3 bytes/px), value (doc_id*7) % 256.
    oracle="""
    SELECT doc_id AS media_id,
           CAST(4 AS INTEGER) AS width,
           CAST(4 AS INTEGER) AS height,
           CAST(48 AS BIGINT) AS content_bytes,
           CAST((doc_id * 7) % 256 AS DOUBLE) AS byte_mean
    FROM documents
    WHERE doc_id < 600 AND doc_id % 6 = 0
    ORDER BY media_id
    """,
)
def media_resize_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Real image resize through the pure codec tier, pinned end to
    end: baseline-JPEG payloads (operators/jpeg_codec.py) are decoded,
    box-average resampled to 4×4 and re-encoded as PNG
    (operators/multimodal.py::resize_images fake=None), then decoded
    AGAIN by the PNG parser for feature extraction — three independent
    Arrow mapInPandas stages whose composition must reproduce the
    closed-form constants. Any defect in the JPEG decode, the
    resampler, the PNG write or the PNG read breaks the hash."""
    docs = table(spark, sf_dir, "documents").filter(
        (F.col("doc_id") < 600) & (F.col("doc_id") % 6 == 0)
    )
    media = multimodal.synthesize_jpeg_media(docs)
    resized = multimodal.resize_images(media, 4, 4)
    feats = multimodal.extract_image_features(resized)
    return feats.select(
        "media_id",
        "width",
        "height",
        F.col("n_bytes").alias("content_bytes"),
        "byte_mean",
    ).orderBy("media_id")
