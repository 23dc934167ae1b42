"""Multimodal columns: opaque binary payloads + typed metadata.

Model (BASELINE.json north-star): media travels as ``binary`` columns with
a metadata struct; decode / feature-extract / resize / frame-sample are
Arrow-batched ``mapInPandas`` stages.  The container has no image/audio
codecs, so the *decode* step is stubbed (NotImplementedError for real
codecs, a deterministic byte-level fake for tests) — but the Spark-side
plumbing (schema, batching, partitioning, UDF signatures) is real and
oracle-tested.

At 100 TB: payloads stay columnar (parquet binary), metadata predicates
prune at scan time (e.g. ``width >= 64`` never touches payload bytes), and
mapInPandas streams Arrow batches without materializing a partition.

Container-HEADER introspection, unlike decode, needs no codec and is
implemented for real (r6): :func:`parse_media_headers` reads PNG/IHDR
and RIFF/WAVE metadata straight out of the payload bytes in pure
Catalyst — the stage that populates the typed metadata those pruning
predicates run on.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "doc_id long, media_type string, payload binary, "
    "width int, height int, sample_rate int"
)


def media_fixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic media table derived from documents: the utf-8 text
    bytes play the role of an encoded payload; metadata derives from
    n_chars.  (Mirrorable in SQL: payload = encode(text).)"""
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return d.select(
        "doc_id",
        F.when(F.col("doc_id") % 3 == 0, "image")
        .when(F.col("doc_id") % 3 == 1, "audio")
        .otherwise("video")
        .alias("media_type"),
        F.encode(F.col("text"), "UTF-8").alias("payload"),
        (F.col("n_chars") % 640).cast("int").alias("width"),
        (F.col("n_chars") % 480).cast("int").alias("height"),
        F.lit(16000).alias("sample_rate"),
    )


def decode_media(df: DataFrame, codec: str = "fake") -> DataFrame:
    """Decode stage.  ``codec='fake'`` extracts deterministic byte-level
    features (length, byte-sum, first byte); any real codec name raises —
    the hook is where PIL/ffmpeg-backed decoders plug in on a real cluster.
    """
    if codec != "fake":
        raise NotImplementedError(
            f"codec {codec!r} requires media libraries not present in this "
            "environment; plug a decoder into decode_media()"
        )

    def feats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payload = pdf["payload"]
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"],
                "media_type": pdf["media_type"],
                "byte_len": payload.map(len).astype("int64"),
                "byte_sum": payload.map(lambda b: sum(b)).astype("int64"),
                "first_byte": payload.map(lambda b: b[0] if len(b) else None).astype("int64"),
            })

    return df.mapInPandas(
        feats, "doc_id long, media_type string, byte_len long, byte_sum long, first_byte long"
    )


def resize_media(df: DataFrame, target_w: int = 224, target_h: int = 224,
                 backend: str = "fake") -> DataFrame:
    """Resize stage plumbing: payload in, payload out with updated typed
    metadata — the schema/batch shape a PIL/ffmpeg-backed resize would
    have.  ``backend='fake'`` deterministically truncates or tile-pads the
    payload to ``target_w * target_h`` bytes (so output size is exactly
    what a real w x h x 1 resample would produce); real backends raise
    until a decoder is plugged in.

    Scale note: runs inside mapInPandas over Arrow batches — payload bytes
    never leave the executor, and the stage preserves partitioning (no
    shuffle)."""
    if backend != "fake":
        raise NotImplementedError(
            f"backend {backend!r} requires media libraries not present in "
            "this environment; plug a resampler into resize_media()"
        )
    target = target_w * target_h

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            def fit(b: bytes) -> bytes:
                if len(b) >= target:
                    return b[:target]
                if not b:
                    return bytes(target)
                reps = -(-target // len(b))  # ceil-div tile pad
                return (b * reps)[:target]

            yield pd.DataFrame({
                "doc_id": pdf["doc_id"],
                "media_type": pdf["media_type"],
                "payload": pdf["payload"].map(fit),
                "width": target_w,
                "height": target_h,
            })

    return df.mapInPandas(
        resize,
        "doc_id long, media_type string, payload binary, "
        "width int, height int",
    )


def frame_sample(df: DataFrame, every_n_bytes: int = 64) -> DataFrame:
    """Frame-sampling stage shape: one output row per sampled offset
    (UDTF-style fan-out through mapInPandas)."""

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {"doc_id": [], "offset": [], "frame_byte": []}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                for off in range(0, len(payload), every_n_bytes):
                    rows["doc_id"].append(doc_id)
                    rows["offset"].append(off)
                    rows["frame_byte"].append(payload[off])
            yield pd.DataFrame(rows)

    return df.mapInPandas(sample, "doc_id long, offset long, frame_byte long")


MEDIA_FEATURES_SQL = """
    SELECT doc_id,
           CASE WHEN doc_id % 3 = 0 THEN 'image'
                WHEN doc_id % 3 = 1 THEN 'audio'
                ELSE 'video' END AS media_type,
           CAST(octet_length(encode(text)) AS BIGINT) AS byte_len,
           CAST(list_sum(list_transform(string_split(text, ''), c -> ascii(c))) AS BIGINT) AS byte_sum,
           CAST(ascii(substr(text, 1, 1)) AS BIGINT) AS first_byte
    FROM documents
"""


def media_dedup(df: DataFrame) -> DataFrame:
    """Exact media deduplication by PAYLOAD BYTES — no codec required,
    which is precisely why it's the first dedup any multimodal corpus
    gets: identical files dedup before a single decoder runs.  Keeper =
    lowest doc_id per (media_type, md5(payload), byte length); the
    length rides along so a (vanishingly unlikely) md5 collision across
    different sizes can't merge.

    Returns ``(doc_id, media_type, keeper_id, is_canonical)``.

    Scale: one map pass hashes payloads (bytes never shuffle — only the
    32-hex digest does) + one combinable min per hash group."""
    hashed = df.select(
        "doc_id", "media_type",
        F.md5(F.col("payload")).alias("h"),
        F.length(F.col("payload")).alias("blen"),
    )
    keepers = hashed.groupBy("media_type", "h", "blen").agg(
        F.min("doc_id").alias("keeper_id"))
    return (
        hashed.join(keepers, ["media_type", "h", "blen"])
        .select(
            "doc_id", "media_type", "keeper_id",
            (F.col("doc_id") == F.col("keeper_id")).alias("is_canonical"),
        )
    )


def media_dedup_sql() -> str:
    """DuckDB mirror over the deterministic media fixture (payload =
    utf-8 text bytes; same routing expression as media_fixture)."""
    return """
        WITH m AS (
            SELECT doc_id,
                   CASE WHEN doc_id % 3 = 0 THEN 'image'
                        WHEN doc_id % 3 = 1 THEN 'audio'
                        ELSE 'video' END AS media_type,
                   md5(text) AS h,  -- md5 hashes utf-8 bytes: same
                                    -- digest as Spark's md5(payload)
                   octet_length(encode(text)) AS blen
            FROM documents
        ),
        k AS (
            SELECT media_type, h, blen, min(doc_id) AS keeper_id
            FROM m GROUP BY 1, 2, 3
        )
        SELECT m.doc_id, m.media_type, k.keeper_id,
               (m.doc_id = k.keeper_id) AS is_canonical
        FROM m JOIN k USING (media_type, h, blen)
    """


# ---------------------------------------------------------------------------
# Container-header introspection (r6): REAL byte-level parsing, no codecs
# ---------------------------------------------------------------------------

PNG_SIG_HEX = "89504e470d0a1a0a"  # \x89PNG\r\n\x1a\n


def _be32(payload, off1: int):
    """Big-endian uint32 at 1-based byte offset (PNG ints are BE)."""
    return F.conv(F.hex(F.substring(payload, off1, 4)), 16, 10).cast("long")


def _le(payload, off1: int, nbytes: int):
    """Little-endian uint at 1-based byte offset (RIFF/WAV ints are LE)."""
    total = F.lit(0).cast("long")
    for i in range(nbytes):
        byte = F.conv(F.hex(F.substring(payload, off1 + i, 1)), 16, 10) \
            .cast("long")
        total = total + byte * F.lit(1 << (8 * i)).cast("long")
    return total


def media_headers_fixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Media table whose payloads carry REAL container headers built
    byte-for-byte in Catalyst: PNG signature + IHDR (big-endian dims),
    or a RIFF/WAVE fmt chunk (little-endian rate/channels), followed by
    the text bytes as the 'encoded stream'.  Header fields derive
    deterministically from n_chars so an external oracle can predict
    exactly what a correct parser must read back."""
    from hbase_indexer_spark.functions.bytes_codec import encode_int

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    width = (F.lit(1) + F.col("n_chars") % 640).cast("int")
    height = (F.lit(1) + F.col("n_chars") % 480).cast("int")
    rate = (F.lit(16000) * (F.lit(1) + F.col("n_chars") % 3)).cast("int")
    channels = (F.lit(1) + F.col("n_chars") % 2).cast("int")

    def le_bytes(col, nbytes: int):
        # little-endian byte string of an int column: per-byte unhex
        parts = [
            F.unhex(F.lpad(F.hex((col.cast("long") / F.lit(1 << (8 * i)))
                                 .cast("long") % 256), 2, "0"))
            for i in range(nbytes)
        ]
        return F.concat(*parts)

    png = F.concat(
        F.unhex(F.lit(PNG_SIG_HEX)),
        F.unhex(F.lit("0000000d")),          # IHDR length 13
        F.encode(F.lit("IHDR"), "UTF-8"),
        encode_int(width), encode_int(height),
        F.unhex(F.lit("08")),                # bit depth 8
        F.unhex(F.lit("06")),                # color type RGBA
        F.encode(F.col("text"), "UTF-8"),
    )
    wav = F.concat(
        F.encode(F.lit("RIFF"), "UTF-8"),
        F.unhex(F.lit("00000000")),          # riff size (unused here)
        F.encode(F.lit("WAVEfmt "), "UTF-8"),
        le_bytes(F.lit(16), 4),              # fmt chunk size
        le_bytes(F.lit(1), 2),               # PCM
        le_bytes(channels, 2),
        le_bytes(rate, 4),
        le_bytes(rate * channels * 2, 4),    # byte rate
        le_bytes(channels * 2, 2),           # block align
        le_bytes(F.lit(16), 2),              # bits per sample
        F.encode(F.col("text"), "UTF-8"),
    )
    return d.select(
        "doc_id",
        F.when(F.col("doc_id") % 3 == 0, png)
        .when(F.col("doc_id") % 3 == 1, wav)
        .otherwise(F.encode(F.col("text"), "UTF-8"))
        .alias("payload"),
    )


def parse_media_headers(df: DataFrame,
                        payload_col: str = "payload") -> DataFrame:
    """REAL container-header introspection in pure Catalyst (whole-stage
    codegen, zero Python): detect PNG (8-byte signature + IHDR) and
    RIFF/WAVE, and read the typed metadata out of the raw bytes —
    big-endian dims for PNG, little-endian rate/channels/bits for WAV.
    Unknown containers yield ``container='unknown'`` with NULL fields.

    This is the metadata-extraction stage a multimodal pipeline runs
    BEFORE any decoder: predicate pushdown on (width, sample_rate, ...)
    then prunes which payloads a real codec ever touches.  The decode
    stage itself stays stubbed (`decode_media`) — header introspection
    needs no codec, so it is implemented for real.

    Returns ``(doc_id, container, width, height, bit_depth, channels,
    sample_rate, bits_per_sample, payload_bytes)``."""
    p = F.col(payload_col)
    is_png = (F.length(p) >= 26) & (
        F.hex(F.substring(p, 1, 8)) == PNG_SIG_HEX.upper())
    is_wav = (F.length(p) >= 36) & \
        (F.substring(p, 1, 4) == F.encode(F.lit("RIFF"), "UTF-8")) & \
        (F.substring(p, 9, 4) == F.encode(F.lit("WAVE"), "UTF-8"))
    return df.select(
        "doc_id",
        F.when(is_png, "png").when(is_wav, "wav").otherwise("unknown")
        .alias("container"),
        F.when(is_png, _be32(p, 17)).cast("long").alias("width"),
        F.when(is_png, _be32(p, 21)).cast("long").alias("height"),
        F.when(is_png, F.conv(F.hex(F.substring(p, 25, 1)), 16, 10)
               .cast("long")).alias("bit_depth"),
        F.when(is_wav, _le(p, 23, 2)).alias("channels"),
        F.when(is_wav, _le(p, 25, 4)).alias("sample_rate"),
        F.when(is_wav, _le(p, 35, 2)).alias("bits_per_sample"),
        F.length(p).cast("long").alias("payload_bytes"),
    )


def media_header_parse_sql() -> str:
    """Oracle: predicts what a CORRECT parser must read back from the
    fixture's generated headers — the analytic ground truth of the
    encode→parse round trip (header fields are functions of n_chars;
    payload length = header size + utf-8 text bytes)."""
    return """
        SELECT doc_id,
               CASE WHEN doc_id % 3 = 0 THEN 'png'
                    WHEN doc_id % 3 = 1 THEN 'wav'
                    ELSE 'unknown' END AS container,
               CASE WHEN doc_id % 3 = 0
                    THEN CAST(1 + n_chars % 640 AS BIGINT) END AS width,
               CASE WHEN doc_id % 3 = 0
                    THEN CAST(1 + n_chars % 480 AS BIGINT) END AS height,
               CASE WHEN doc_id % 3 = 0 THEN CAST(8 AS BIGINT) END
                   AS bit_depth,
               CASE WHEN doc_id % 3 = 1
                    THEN CAST(1 + n_chars % 2 AS BIGINT) END AS channels,
               CASE WHEN doc_id % 3 = 1
                    THEN CAST(16000 * (1 + n_chars % 3) AS BIGINT) END
                   AS sample_rate,
               CASE WHEN doc_id % 3 = 1 THEN CAST(16 AS BIGINT) END
                   AS bits_per_sample,
               CAST(octet_length(encode(text))
                    + CASE WHEN doc_id % 3 = 0 THEN 26
                           WHEN doc_id % 3 = 1 THEN 36
                           ELSE 0 END AS BIGINT) AS payload_bytes
        FROM documents
    """
