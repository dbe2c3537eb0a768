"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride through the engine as ``binary`` columns with a
metadata struct; decode / feature-extraction / resize / frame-sampling run
as Arrow-batched ``mapInPandas`` stages.  Header-level metadata extraction
(format + dimensions for PNG/JPEG/GIF/BMP) is REAL — pure struct
arithmetic, no codec library (``parse_image_header``).  Full pixel decode
remains the one env-blocked seam: swap any ``bytes → meta`` callable in
via ``extract_media_metadata(decoder=...)`` without touching the plan,
batching, or schema (the contract the seam test pins); unrecognized
payloads fall back to the deterministic ``decode_image_stub``.

Scale notes: binary payloads make rows wide — repartition by a size-aware
key before CPU-heavy decode stages so Arrow batches stay bounded
(``maxRecordsPerBatch``), and keep metadata-only branches on a pruned
projection that never deserializes the payload.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_META_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("format", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
    ]
)


def attach_payload(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Build a synthetic media table from a text table: payload = utf-8 bytes.

    Stands in for real image/audio bytes so the binary-column plumbing is
    exercised end-to-end with deterministic content.
    """
    return df.select(
        F.col(id_col).alias("media_id"),
        F.encode(F.col(text_col), "UTF-8").alias("payload"),
    )


def decode_image_stub(payload: bytes) -> dict:
    """STUB decoder — deterministic fake of an image header parse.

    A real implementation would call PIL/libvips here. NotImplementedError is
    deliberately NOT raised so pipelines can run end-to-end; the fake derives
    metadata purely from the byte content (stable across engines/runs).
    """
    n = len(payload)
    return {
        "n_bytes": n,
        "format": "fake/raw",
        "width": int(n % 640),
        "height": int((n * 7) % 480),
    }


def _jpeg_dims(b: bytes) -> tuple[int, int] | None:
    """Walk JPEG segments to the first SOF frame header (C0-CF excluding
    the non-frame C4/C8/CC) and read (width, height)."""
    i, n = 2, len(b)
    while i + 4 <= n:
        if b[i] != 0xFF:
            return None
        marker = b[i + 1]
        if marker == 0xFF:  # fill byte
            i += 1
            continue
        if marker in (0x01,) or 0xD0 <= marker <= 0xD9:  # standalone
            i += 2
            continue
        seg_len = int.from_bytes(b[i + 2 : i + 4], "big")
        if seg_len < 2:
            return None
        if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
            # the frame header must DECLARE the 5 bytes we read past the
            # length field (precision + height + width); a shorter seg_len
            # means those bytes belong to the NEXT segment — truncated/
            # malformed, refuse rather than return confident garbage
            if seg_len < 7 or i + 9 > n:
                return None
            height = int.from_bytes(b[i + 5 : i + 7], "big")
            width = int.from_bytes(b[i + 7 : i + 9], "big")
            return (width, height)
        i += 2 + seg_len
    return None


# DIB header sizes of the BMP variants in circulation — bytes 14-18 of a
# real .bmp are one of these; ASCII text that merely starts with 'BM'
# essentially never is, which is what keeps text payloads out of the bmp
# branch (the PNG/JPEG magics contain non-UTF-8 bytes, so only the
# all-ASCII 'BM'/'GIF8xa' magics can collide with text at all)
_BMP_DIB_SIZES = frozenset({12, 40, 52, 56, 64, 108, 124})
_MAX_PLAUSIBLE_DIM = 1 << 24  # no real image is 16M pixels wide


def _plausible(width: int, height: int) -> bool:
    return 0 < width < _MAX_PLAUSIBLE_DIM and 0 < height < _MAX_PLAUSIBLE_DIM


def parse_image_header(payload: bytes) -> dict | None:
    """Pure-Python image header parse — magic + dimensions via struct
    arithmetic, NO codec library — for the three commonest web formats
    plus BMP.  Returns {n_bytes, format, width, height} or None when the
    payload is not a recognized (and sufficiently complete) image.

    This upgrades the decode seam's DEFAULT from a fake to a real parser
    for metadata extraction (the 100 TB corpus-triage pass: dimensions,
    format mix, aspect filtering) while full pixel decode stays behind the
    ``decoder=`` seam for when codec libraries exist.

    Misclassification guard: dims are plausibility-gated (0 < dim < 2^24,
    so a crafted u32 can never wrap negative through an int32 cast), a
    JPEG SOF must declare the bytes it is read from, and the all-ASCII
    'BM' magic is discriminated by the fixed DIB-header-size whitelist
    (prose starting with 'BM' stays on the stub path).  The one residual
    ambiguity is text beginning literally with 'GIF87a'/'GIF89a' — the
    same call libmagic makes; route such corpora through an explicit
    ``decoder=`` if they exist.
    """
    n = len(payload)
    if n >= 24 and payload[:8] == b"\x89PNG\r\n\x1a\n":
        # IHDR is mandated first: width/height big-endian u32 at 16/20.
        # Plausibility-gate the dims: a crafted u32 past 2^31 would
        # otherwise wrap negative through Arrow's unsafe int32 cast
        width = int.from_bytes(payload[16:20], "big")
        height = int.from_bytes(payload[20:24], "big")
        if payload[12:16] != b"IHDR" or not _plausible(width, height):
            return None
        return {"n_bytes": n, "format": "png", "width": width, "height": height}
    if n >= 10 and payload[:6] in (b"GIF87a", b"GIF89a"):
        width = int.from_bytes(payload[6:8], "little")
        height = int.from_bytes(payload[8:10], "little")
        if not _plausible(width, height):
            return None
        return {"n_bytes": n, "format": "gif", "width": width, "height": height}
    if n >= 4 and payload[:2] == b"\xff\xd8":
        dims = _jpeg_dims(payload)
        if dims is None or not _plausible(*dims):
            return None
        return {"n_bytes": n, "format": "jpeg", "width": dims[0], "height": dims[1]}
    if n >= 26 and payload[:2] == b"BM":
        # 'BM' is valid ASCII, so text payloads can reach here — the DIB
        # header size at bytes 14-18 is the discriminator: real BMPs carry
        # one of a handful of fixed values, prose never does
        if int.from_bytes(payload[14:18], "little") not in _BMP_DIB_SIZES:
            return None
        width = int.from_bytes(payload[18:22], "little", signed=True)
        height = abs(int.from_bytes(payload[22:26], "little", signed=True))
        if not _plausible(width, height):
            return None
        return {"n_bytes": n, "format": "bmp", "width": width, "height": height}
    return None


def decode_image_header(payload: bytes) -> dict:
    """The engine's default decoder: REAL header parse for PNG/JPEG/GIF/BMP
    (``parse_image_header``), deterministic stub for everything else — so
    non-image payloads keep the stub's stable metadata while planted real
    headers get true dimensions.  Full pixel decode remains the one
    env-blocked seam (swap in a PIL-backed callable via ``decoder=``)."""
    parsed = parse_image_header(payload)
    return parsed if parsed is not None else decode_image_stub(payload)


def parallelize_for_decode(media: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Ensure a decode stage gets enough partitions to use every core.

    Small parquet inputs arrive as ONE split (a 1 MB file never crosses
    maxPartitionBytes), which serializes the whole Python decode behind a
    single Arrow worker. Cluster-sized inputs already have many splits and
    pass through untouched — the repartition only fires when the input has
    fewer partitions than the session's parallelism.
    """
    if media.isStreaming:
        # .rdd is illegal on a streaming frame; micro-batch sizing is the
        # source's job (maxFilesPerTrigger / maxOffsetsPerTrigger)
        return media
    target = (
        min_partitions
        if min_partitions is not None
        else media.sparkSession.sparkContext.defaultParallelism
    )
    if media.rdd.getNumPartitions() < target:
        return media.repartition(target)
    return media


def extract_media_metadata(
    media: DataFrame, parallelize: bool = True, decoder=None
) -> DataFrame:
    """mapInPandas decode stage: (media_id, payload) → MEDIA_META_SCHEMA.

    Arrow-batched; one Python roundtrip per batch, not per row. This is the
    pattern every real decode/resize/frame-sample stage follows. Input is
    spread across the session's cores first (see parallelize_for_decode) —
    decode is the Python-side stage where partition count IS the speedup.

    ``decoder`` is the swap seam: any ``bytes → {n_bytes, format, width,
    height}`` callable (e.g. a PIL header parse once codec libraries are
    available) slots in without touching the plan, batching, or schema;
    the default is the deterministic stub.  The callable ships to
    executors inside the mapInPandas closure: define it in an
    executor-importable module (cloudpickle serializes module-level
    functions by REFERENCE) or as a closure/lambda (serialized by value).
    """
    if parallelize:
        media = parallelize_for_decode(media)
    decode = decoder if decoder is not None else decode_image_header

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            metas = [decode(p) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].astype("int64"),
                    "n_bytes": [m["n_bytes"] for m in metas],
                    "format": [m["format"] for m in metas],
                    "width": [m["width"] for m in metas],
                    "height": [m["height"] for m in metas],
                }
            )

    return media.mapInPandas(decode_batches, MEDIA_META_SCHEMA)


def sample_frames(media: DataFrame, every_n_bytes: int = 64) -> DataFrame:
    """Frame-sampling stand-in: emit one "frame" row per N payload bytes
    (media_id, frame_no, offset). Native posexplode over a computed range —
    the row-multiplying shape of real video frame sampling, without a codec.
    """
    n = F.length("payload")
    frames = F.sequence(F.lit(0), F.greatest((n / every_n_bytes).cast("int") - 1, F.lit(0)))
    return media.select(
        "media_id", F.posexplode(frames).alias("frame_no", "offset_idx")
    ).select(
        "media_id",
        F.col("frame_no").cast("long").alias("frame_no"),
        (F.col("offset_idx") * every_n_bytes).cast("long").alias("offset"),
    )
