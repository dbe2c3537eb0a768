"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride through the engine as ``binary`` columns with a
metadata struct; decode / feature-extraction / resize / frame-sampling run
as Arrow-batched ``mapInPandas`` stages.  Header-level metadata extraction
is REAL — pure struct arithmetic, no codec library — for six image
formats (PNG/JPEG/GIF/BMP/WebP/TIFF, ``parse_image_header``), four audio
containers (WAV fmt-chunk, FLAC STREAMINFO, Ogg Opus/Vorbis, MP3
ID3v2/frame header → sample rate / channels / duration where the head
carries it), and MP4 video (ftyp + moov-lite track dims / duration) via
``parse_media_container``.  Full pixel/sample decode remains the one
env-blocked seam: swap any ``bytes → meta`` callable in via
``extract_media_metadata(decoder=...)`` without touching the plan,
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
        # audio/video container fields (r12) — null for image payloads;
        # width/height are null for audio-only payloads
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("channels", T.IntegerType()),
        T.StructField("duration_ms", T.LongType()),
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
        if marker == 0xDA:
            # SOS reached without a SOF frame header: in a valid JPEG SOF
            # always precedes SOS, and walking on would treat entropy-coded
            # scan bytes as segments — a fake SOF pattern inside scan data
            # then parses as confident garbage dims. Refuse instead.
            return None
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


def _webp_dims(b: bytes) -> tuple[int, int] | None:
    """Dimensions from the first WebP chunk after the RIFF/WEBP preamble —
    all three container variants (RIFF container spec + VP8/VP8L bitstream
    headers, both public):

    * ``VP8X`` (extended): canvas width-1 / height-1 as 24-bit LE at
      payload offsets 4 and 7.
    * ``VP8 `` (lossy): 3-byte frame tag, then the mandatory start code
      ``9D 01 2A``, then 14-bit width / height in two LE u16s (top 2 bits
      are the scaling field).
    * ``VP8L`` (lossless): signature byte ``0x2F``, then width-1 /
      height-1 as back-to-back 14-bit fields in a 32-bit LE word.

    The start-code / signature bytes double as the misclassification
    guard — a truncated or alien RIFF refuses rather than guessing."""
    fourcc = b[12:16]
    p = 20  # chunk payload start (12 RIFF preamble + 4 fourcc + 4 size)
    if fourcc == b"VP8X" and len(b) >= p + 10:
        width = int.from_bytes(b[p + 4 : p + 7], "little") + 1
        height = int.from_bytes(b[p + 7 : p + 10], "little") + 1
        return (width, height)
    if fourcc == b"VP8 " and len(b) >= p + 10:
        if b[p + 3 : p + 6] != b"\x9d\x01\x2a":  # mandatory start code
            return None
        width = int.from_bytes(b[p + 6 : p + 8], "little") & 0x3FFF
        height = int.from_bytes(b[p + 8 : p + 10], "little") & 0x3FFF
        return (width, height)
    if fourcc == b"VP8L" and len(b) >= p + 5:
        if b[p] != 0x2F:  # mandatory signature byte
            return None
        word = int.from_bytes(b[p + 1 : p + 5], "little")
        width = (word & 0x3FFF) + 1
        height = ((word >> 14) & 0x3FFF) + 1
        return (width, height)
    return None


def _wav_meta(b: bytes) -> dict | None:
    """Walk RIFF/WAVE chunks to the mandatory ``fmt `` chunk (channels,
    sample rate, byte rate) and the ``data`` chunk (declared size →
    duration).  Chunk sizes are DECLARED — the data payload need not be
    present (triage over truncated heads still works); duration comes
    from the declared size, so a lying header yields a lying duration,
    same trust model as every header sniffer."""
    n = len(b)
    i = 12
    sample_rate = channels = byte_rate = None
    data_size = None
    while i + 8 <= n:
        cid = b[i : i + 4]
        size = int.from_bytes(b[i + 4 : i + 8], "little")
        if cid == b"fmt " and size >= 16 and i + 24 <= n:
            channels = int.from_bytes(b[i + 10 : i + 12], "little")
            sample_rate = int.from_bytes(b[i + 12 : i + 16], "little")
            byte_rate = int.from_bytes(b[i + 16 : i + 20], "little")
        elif cid == b"data" and data_size is None:
            data_size = size
        i += 8 + size + (size & 1)  # chunks are word-aligned
    if sample_rate is None or channels is None:
        return None  # no fmt chunk in the available bytes: refuse
    if not (0 < channels <= 64 and 0 < sample_rate < 1_000_000):
        return None  # implausible fmt values — corrupt, not audio
    # duration computed AFTER the walk so the non-canonical data-before-fmt
    # chunk order (seen from real writers) still yields it
    duration_ms = (
        data_size * 1000 // byte_rate if data_size is not None and byte_rate
        else None
    )
    return {
        "n_bytes": n,
        "format": "wav",
        "width": None,
        "height": None,
        "sample_rate": sample_rate,
        "channels": channels,
        "duration_ms": _clamp_duration(duration_ms),
    }


_MP3_SAMPLE_RATES = {  # MPEG version bits -> sample-rate table (Hz)
    3: (44100, 48000, 32000),  # MPEG1
    2: (22050, 24000, 16000),  # MPEG2
    0: (11025, 12000, 8000),   # MPEG2.5
}


def _mp3_frame_rate(b: bytes, i: int) -> int | None:
    """Sample rate from an MPEG audio frame header at offset i, or None if
    the four bytes there are not a valid Layer III header."""
    if i + 4 > len(b) or b[i] != 0xFF or (b[i + 1] & 0xE0) != 0xE0:
        return None
    version = (b[i + 1] >> 3) & 0x3
    layer = (b[i + 1] >> 1) & 0x3
    bitrate_idx = (b[i + 2] >> 4) & 0xF
    sr_idx = (b[i + 2] >> 2) & 0x3
    if version == 1 or layer != 1 or sr_idx == 3 or bitrate_idx == 15:
        # reserved version / rate / bitrate index; layer III only — every
        # reserved field rejected shrinks the random-binary false-positive
        # surface (crawl corpora are full of 0xFF-dense compressed junk)
        return None
    return _MP3_SAMPLE_RATES[version][sr_idx]


def _mp3_meta(b: bytes) -> dict | None:
    """MP3: either a bare MPEG Layer III frame sync (FF Ex) at offset 0,
    or an ID3v2 tag ('ID3' + version + flags + 4 syncsafe size bytes)
    followed by a frame sync after the tag.  'ID3' is printable ASCII, so
    the guard is structural: the version byte must be a real ID3v2
    version (2/3/4), the four size bytes must be syncsafe (<0x80), and a
    valid frame header must confirm where the tag says audio starts —
    prose starting with the letters 'ID3' fails those together.  Channels
    come from the frame's mode field; duration needs the full frame walk
    (VBR) and stays null."""
    n = len(b)
    start = 0
    if b[:3] == b"ID3":
        if n < 10 or b[3] not in (2, 3, 4):
            return None
        size_bytes = b[6:10]
        if any(x & 0x80 for x in size_bytes):
            return None  # not syncsafe -> not a real ID3v2 header
        tag_size = (
            (size_bytes[0] << 21) | (size_bytes[1] << 14)
            | (size_bytes[2] << 7) | size_bytes[3]
        )
        start = 10 + tag_size
        if b[5] & 0x10:  # ID3v2.4 footer flag: 10 more bytes before audio
            start += 10
        if start + 4 > n:
            return None  # audio starts beyond the available head: refuse
    sample_rate = _mp3_frame_rate(b, start)
    if sample_rate is None:
        return None
    mode = (b[start + 3] >> 6) & 0x3
    return {
        "n_bytes": n,
        "format": "mp3",
        "width": None,
        "height": None,
        "sample_rate": sample_rate,
        "channels": 1 if mode == 3 else 2,
        "duration_ms": None,  # needs the full frame walk (VBR-safe)
    }


def _tiff_dims(b: bytes) -> tuple[int, int] | None:
    """TIFF: 'II*\\0' (little-endian) or 'MM\\0*' (big-endian), then the
    first IFD — ImageWidth (tag 256) and ImageLength (tag 257) as SHORT
    or LONG entry values.  The magic contains NUL bytes, so prose can
    never reach this branch."""
    n = len(b)
    if n < 8:
        return None
    if b[:4] == b"II*\x00":
        endian = "little"
    elif b[:4] == b"MM\x00*":
        endian = "big"
    else:
        return None
    ifd = int.from_bytes(b[4:8], endian)
    if ifd + 2 > n:
        return None
    count = int.from_bytes(b[ifd : ifd + 2], endian)
    width = height = None
    for k in range(count):
        e = ifd + 2 + 12 * k
        if e + 12 > n:
            break
        tag = int.from_bytes(b[e : e + 2], endian)
        typ = int.from_bytes(b[e + 2 : e + 4], endian)
        cnt = int.from_bytes(b[e + 4 : e + 8], endian)
        # count must be 1: with count>1 the value slot holds a file
        # OFFSET (TIFF spec), which would read as confident garbage dims
        if tag in (256, 257) and typ in (3, 4) and cnt == 1:
            # SHORT values sit left-justified in the 4-byte value slot
            nbytes = 2 if typ == 3 else 4
            val = int.from_bytes(b[e + 8 : e + 8 + nbytes], endian)
            if tag == 256:
                width = val
            else:
                height = val
    if width is None or height is None:
        return None
    return (width, height)


def _flac_meta(b: bytes) -> dict | None:
    """FLAC: 'fLaC' magic, then the mandatory STREAMINFO metadata block
    (spec: it MUST be first).  Sample rate (20 bits), channels-1 (3
    bits), and total samples (36 bits) sit in the 8 bytes after the
    block-/frame-size fields — pure bit arithmetic on the public
    layout."""
    n = len(b)
    if n < 26 or b[:4] != b"fLaC" or (b[4] & 0x7F) != 0:
        return None  # first block must be STREAMINFO (type 0)
    packed = int.from_bytes(b[18:26], "big")
    sample_rate = packed >> 44
    channels = ((packed >> 41) & 0x7) + 1
    total_samples = packed & ((1 << 36) - 1)
    if not (0 < sample_rate < 1_000_000):
        return None
    return {
        "n_bytes": n,
        "format": "flac",
        "width": None,
        "height": None,
        "sample_rate": sample_rate,
        "channels": channels,
        "duration_ms": _clamp_duration(
            total_samples * 1000 // sample_rate if total_samples else None
        ),
    }


def _ogg_meta(b: bytes) -> dict | None:
    """Ogg: 'OggS' page header (version 0), then the first packet — an
    'OpusHead' (channel count u8, input rate LE u32) or a Vorbis
    identification header (\\x01vorbis: channels u8, rate LE u32).
    Unrecognized codecs AND implausible declared values still classify as
    ogg with null fields — the container magic is real either way, only
    the codec-declared numbers are untrusted."""
    n = len(b)
    if n < 28 or b[:4] != b"OggS" or b[4] != 0:
        return None
    nsegs = b[26]
    p = 27 + nsegs  # first packet starts after the segment table
    sample_rate = channels = None
    if b[p : p + 8] == b"OpusHead" and n >= p + 16:
        channels = b[p + 9]
        sample_rate = int.from_bytes(b[p + 12 : p + 16], "little")
    elif b[p : p + 7] == b"\x01vorbis" and n >= p + 16:
        channels = b[p + 11]
        sample_rate = int.from_bytes(b[p + 12 : p + 16], "little")
    is_opus = b[p : p + 8] == b"OpusHead"
    if sample_rate is not None and not (0 < sample_rate < 1_000_000):
        sample_rate = None  # lying codec header; the container is still Ogg
    if channels is not None and not (0 < channels <= 64):
        channels = None
    # duration: the LAST page's granule position counts PCM samples —
    # only available when the payload holds the end of the stream
    # (header-only reads keep null).  Opus granules tick at 48 kHz
    # regardless of the input rate (RFC 7845); Vorbis at the declared
    # rate.  rfind can land on 'OggS' bytes inside codec data, so the
    # value is best-effort and rides the plausibility clamp.
    duration_ms = None
    gr_rate = 48_000 if is_opus else sample_rate
    last = b.rfind(b"OggS")
    if last > 0 and gr_rate and last + 14 <= n and b[last + 4] == 0:
        granule = int.from_bytes(b[last + 6 : last + 14], "little")
        if granule not in (0, (1 << 64) - 1):  # 0 = header page, -1 = none
            duration_ms = _clamp_duration(granule * 1000 // gr_rate)
    return {
        "n_bytes": n,
        "format": "ogg",
        "width": None,
        "height": None,
        "sample_rate": sample_rate,
        "channels": channels,
        "duration_ms": duration_ms,
    }


def _mp4_boxes(b: bytes, start: int, end: int):
    """Yield (type, payload_start, payload_end) for ISO-BMFF boxes in
    b[start:end]; stops at the first malformed size (bounds are clamped so
    a lying size can't index past the available bytes)."""
    i = start
    while i + 8 <= end:
        size = int.from_bytes(b[i : i + 4], "big")
        btype = b[i + 4 : i + 8]
        hdr = 8
        if size == 1:  # 64-bit largesize
            if i + 16 > end:
                return
            size = int.from_bytes(b[i + 8 : i + 16], "big")
            hdr = 16
        elif size == 0:  # box extends to end of enclosing scope
            size = end - i
        if size < hdr:
            return
        yield (btype, i + hdr, min(i + size, end))
        i += size


# ISO-BMFF major brands that are IMAGES, not video — without this an
# AVIF/HEIC payload (ftyp like any mp4) would be mislabeled as video in
# the format-mix triage
_BMFF_IMAGE_BRANDS = {
    b"avif": "avif", b"avis": "avif",
    b"heic": "heic", b"heix": "heic",
    b"mif1": "heif", b"msf1": "heif",
}


def _bmff_image_meta(b: bytes, fmt: str) -> dict:
    """Dimensions for a BMFF-container image (AVIF/HEIC): meta (a FullBox
    — 4 version/flags bytes after the header) → iprp → ipco → first ispe
    property (version/flags + width u32be + height u32be).  Dims stay
    null when the property boxes aren't in the available head."""
    n = len(b)
    width = height = None
    for btype, ps, pe in _mp4_boxes(b, 0, n):
        if btype != b"meta":
            continue
        for t1, s1, e1 in _mp4_boxes(b, ps + 4, pe):  # skip FullBox prefix
            if t1 != b"iprp":
                continue
            for t2, s2, e2 in _mp4_boxes(b, s1, e1):
                if t2 != b"ipco":
                    continue
                for t3, s3, e3 in _mp4_boxes(b, s2, e2):
                    if t3 == b"ispe" and e3 - s3 >= 12:
                        w = int.from_bytes(b[s3 + 4 : s3 + 8], "big")
                        h = int.from_bytes(b[s3 + 8 : s3 + 12], "big")
                        if _plausible(w, h):
                            width, height = w, h
                        break
                break
            break
        break
    return {
        "n_bytes": n,
        "format": fmt,
        "width": width,
        "height": height,
        "sample_rate": None,
        "channels": None,
        "duration_ms": None,
    }


def _mp4_meta(b: bytes) -> dict | None:
    """ISO-BMFF 'moov-lite' walk: classify by the ftyp box (must be the
    file's first box per the spec), then best-effort extract duration
    (moov/mvhd: timescale + duration, v0/v1) and the first video track's
    dimensions (moov/trak/tkhd: 16.16 fixed-point width/height).  ``moov``
    commonly sits at the END of a non-faststart file, so a header-only
    payload classifies as mp4 with null dims/duration rather than
    refusing — format-mix triage works either way.  Image brands
    (AVIF/HEIC/HEIF) dispatch to the ispe-property walk instead of being
    mislabeled as video."""
    n = len(b)
    if n < 12 or b[4:8] != b"ftyp":
        return None
    img_fmt = _BMFF_IMAGE_BRANDS.get(b[8:12])
    if img_fmt is not None:
        return _bmff_image_meta(b, img_fmt)
    width = height = None
    duration_ms = None
    for btype, ps, pe in _mp4_boxes(b, 0, n):
        if btype != b"moov":
            continue
        for ityp, ips, ipe in _mp4_boxes(b, ps, pe):
            if ityp == b"mvhd" and ipe - ips >= 4:
                ver = b[ips]
                if ver == 0 and ipe - ips >= 20:
                    timescale = int.from_bytes(b[ips + 12 : ips + 16], "big")
                    duration = int.from_bytes(b[ips + 16 : ips + 20], "big")
                elif ver == 1 and ipe - ips >= 32:
                    timescale = int.from_bytes(b[ips + 20 : ips + 24], "big")
                    duration = int.from_bytes(b[ips + 24 : ips + 32], "big")
                else:
                    continue
                # the all-ones duration is the spec's "unknown" sentinel
                # (common in fragmented/non-faststart files) — and any
                # lying u64 would overflow the Arrow int64 conversion
                # downstream, so clamp to the plausibility window
                sentinel = (1 << (32 if ver == 0 else 64)) - 1
                if timescale > 0 and duration != sentinel:
                    duration_ms = _clamp_duration(duration * 1000 // timescale)
            elif ityp == b"trak" and width is None:
                for ttyp, tps, tpe in _mp4_boxes(b, ips, ipe):
                    if ttyp != b"tkhd" or tpe - tps < 4:
                        continue
                    # fixed-point width/height offsets WITHIN the tkhd
                    # payload (version..matrix): v0 76, v1 88
                    off = 76 if b[tps] == 0 else 88
                    if tpe - tps >= off + 8:
                        w = int.from_bytes(b[tps + off : tps + off + 4], "big") >> 16
                        h = int.from_bytes(b[tps + off + 4 : tps + off + 8], "big") >> 16
                        if w > 0 and h > 0:  # audio tracks carry 0x0
                            width, height = w, h
                    break
        break
    return {
        "n_bytes": n,
        "format": "mp4",
        "width": width,
        "height": height,
        "sample_rate": None,
        "channels": None,
        "duration_ms": _clamp_duration(duration_ms),
    }


# DIB header sizes of the BMP variants in circulation — bytes 14-18 of a
# real .bmp are one of these; ASCII text that merely starts with 'BM'
# essentially never is, which is what keeps text payloads out of the bmp
# branch (the PNG/JPEG magics contain non-UTF-8 bytes, so only the
# all-ASCII 'BM'/'GIF8xa' magics can collide with text at all)
_BMP_DIB_SIZES = frozenset({12, 40, 52, 56, 64, 108, 124})
_MAX_PLAUSIBLE_DIM = 1 << 24  # no real image is 16M pixels wide
# duration clamp: headers DECLARE durations, and corrupt/sentinel values
# (mvhd all-ones = "unknown", lying muxers) must not flow downstream —
# an unclamped u64 duration*1000 overflows Arrow's int64 conversion and
# kills the whole mapInPandas stage on ONE bad file. 30 days bounds any
# plausible single media file.
_MAX_PLAUSIBLE_DURATION_MS = 30 * 24 * 60 * 60 * 1000


def _clamp_duration(duration_ms: int | None) -> int | None:
    if duration_ms is None or not (0 <= duration_ms <= _MAX_PLAUSIBLE_DURATION_MS):
        return None
    return duration_ms


def _plausible(width: int, height: int) -> bool:
    return 0 < width < _MAX_PLAUSIBLE_DIM and 0 < height < _MAX_PLAUSIBLE_DIM


def parse_image_header(payload: bytes) -> dict | None:
    """Pure-Python image header parse — magic + dimensions via struct
    arithmetic, NO codec library — for the four commonest web formats
    (PNG/JPEG/GIF/WebP) plus BMP and TIFF.  Returns {n_bytes, format,
    width, height} or None when the payload is not a recognized (and
    sufficiently complete) image.

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
    if n >= 20 and payload[:4] == b"RIFF" and payload[8:12] == b"WEBP":
        dims = _webp_dims(payload)
        if dims is None or not _plausible(*dims):
            return None
        return {"n_bytes": n, "format": "webp", "width": dims[0], "height": dims[1]}
    if n >= 8 and payload[:4] in (b"II*\x00", b"MM\x00*"):
        dims = _tiff_dims(payload)
        if dims is None or not _plausible(*dims):
            return None
        return {"n_bytes": n, "format": "tiff", "width": dims[0], "height": dims[1]}
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


def parse_media_container(payload: bytes) -> dict | None:
    """Header-level sniff across all three media classes: images
    (PNG/JPEG/GIF/BMP/WebP/TIFF via ``parse_image_header``), audio (WAV
    RIFF fmt-chunk, FLAC STREAMINFO, Ogg Opus/Vorbis identification
    headers, MP3 ID3v2/frame sync → sample rate / channels / duration
    where the head carries it), and MP4 video (ftyp brand + moov-lite →
    track dims / mvhd duration).  Returns the full MEDIA_META_SCHEMA
    field dict or None when the payload matches no known container."""
    img = parse_image_header(payload)
    if img is not None:
        return {**img, "sample_rate": None, "channels": None, "duration_ms": None}
    if len(payload) >= 12 and payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        return _wav_meta(payload)
    if payload[:4] == b"fLaC":
        return _flac_meta(payload)
    if payload[:4] == b"OggS":
        return _ogg_meta(payload)
    if payload[:3] == b"ID3" or (
        len(payload) >= 2 and payload[0] == 0xFF and (payload[1] & 0xE0) == 0xE0
    ):
        return _mp3_meta(payload)
    return _mp4_meta(payload)


def decode_image_header(payload: bytes) -> dict:
    """REAL header parse for the image formats ``parse_image_header``
    covers (PNG/JPEG/GIF/BMP/WebP/TIFF), deterministic stub for everything
    else — so non-image payloads keep the stub's stable metadata while
    planted real headers get true dimensions.  Full pixel decode remains
    the one env-blocked seam (swap in a PIL-backed callable via
    ``decoder=``)."""
    parsed = parse_image_header(payload)
    return parsed if parsed is not None else decode_image_stub(payload)


def decode_media_header(payload: bytes) -> dict:
    """The engine's default decoder (r12): REAL header parse for the full
    container vocabulary — png/gif/jpeg/bmp/webp/tiff/avif/heic images,
    wav/flac/ogg/mp3 audio, mp4 video (``parse_media_container``) —
    deterministic stub fallback for everything else."""
    parsed = parse_media_container(payload)
    return parsed if parsed is not None else decode_image_stub(payload)


def try_codec_decoder():
    """Guarded-import probe (r12): when the runtime has a codec stack
    (PIL/Pillow), return a decoder that opens the actual image — true
    format/dimensions for EVERY format PIL knows (TIFF, AVIF via plugins,
    …), not just the five the struct sniffer covers — falling back to the
    header sniff / stub on undecodable payloads.  Returns None in
    codec-less sandboxes (this container), so the header sniffer stays the
    default there with zero behavior change.

    The returned callable captures the resolved ``Image`` object, so it
    ships to executors by reference when PIL is a real installed package
    (importable on workers) and by value when a test injects a fake."""
    try:
        from PIL import Image
    except ImportError:
        return None

    def codec_decoder(payload: bytes) -> dict:
        import io

        try:
            img = Image.open(io.BytesIO(payload))
            width, height = img.size
            return {
                "n_bytes": len(payload),
                "format": (img.format or "img").lower(),
                "width": int(width),
                "height": int(height),
            }
        except Exception:  # noqa: BLE001 — any undecodable payload
            return decode_media_header(payload)

    return codec_decoder


def default_decoder():
    """Resolve the engine's default decoder at plan-build time: the
    codec-backed decoder when one is importable, else the pure-Python
    header sniffer.  The seam (``extract_media_metadata(decoder=...)``)
    is unchanged either way — a future sandbox with Pillow auto-upgrades
    with no code edit."""
    return try_codec_decoder() or decode_media_header


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
    decode = decoder if decoder is not None else default_decoder()

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            metas = [decode(p) for p in pdf["payload"]]
            # the audio/video fields are OPTIONAL in the decoder contract
            # (.get) so pre-r12 decoders — including user-injected ones —
            # keep working unchanged; pandas nullable Int64/float carry the
            # Nones through Arrow as proper SQL nulls
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].astype("int64"),
                    "n_bytes": [m["n_bytes"] for m in metas],
                    "format": [m["format"] for m in metas],
                    "width": pd.array(
                        [m["width"] for m in metas], dtype="Int32"
                    ),
                    "height": pd.array(
                        [m["height"] for m in metas], dtype="Int32"
                    ),
                    "sample_rate": pd.array(
                        [m.get("sample_rate") for m in metas], dtype="Int32"
                    ),
                    "channels": pd.array(
                        [m.get("channels") for m in metas], dtype="Int32"
                    ),
                    "duration_ms": pd.array(
                        [m.get("duration_ms") for m in metas], dtype="Int64"
                    ),
                }
            )

    return media.mapInPandas(decode_batches, MEDIA_META_SCHEMA)


def _plausible_media(min_dim: int, aspect_bounds: tuple[float, float]):
    """Column predicate: does a decoded row look like usable training
    media?  Images gate on minimum dimension + aspect-ratio bounds (the
    standard web-crawl icon/banner filter); audio rows gate on a sane
    sample rate; rows with neither (stub fallbacks, header-only MP4s)
    fail — they need a real decode before use."""
    lo, hi = aspect_bounds
    w, h = F.col("width"), F.col("height")
    img_ok = (
        w.isNotNull() & h.isNotNull()
        & (w >= min_dim) & (h >= min_dim)
        & (w / h >= lo) & (w / h <= hi)
    )
    audio_ok = F.col("sample_rate").isNotNull() & F.col("sample_rate").between(
        100, 768_000
    )
    # stub fallbacks FABRICATE dims (decode_image_stub's n%640 x 7n%480),
    # so they must fail regardless of what those numbers look like — an
    # unrecognized payload needs a real decode before it can count as
    # usable media
    return (
        (F.col("format") != "fake/raw")
        & F.when(w.isNotNull() | h.isNotNull(), img_ok).otherwise(audio_ok)
    )


def media_triage(
    meta: DataFrame,
    min_dim: int = 32,
    aspect_bounds: tuple[float, float] = (0.2, 5.0),
) -> DataFrame:
    """Corpus-level format-mix table over ``extract_media_metadata``
    output — the first question a 100 TB multimodal crawl gets asked:
    what formats, how many bytes, what dimensions, how much survives the
    plausibility gates.  One hash aggregate keyed on |formats| distinct
    values (k-bounded: the sniffer emits a fixed format vocabulary), with
    map-side partial aggregation; never touches payload bytes."""
    return (
        meta.groupBy("format")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum(
                _plausible_media(min_dim, aspect_bounds).cast("long")
            ).alias("n_plausible"),
            F.sum("n_bytes").cast("long").alias("total_bytes"),
            F.round(F.avg("n_bytes"), 2).alias("avg_bytes"),
            F.median("width").alias("p50_width"),
            F.median("height").alias("p50_height"),
        )
    )


def filter_media(
    meta: DataFrame,
    formats: list[str] | None = None,
    min_dim: int = 32,
    aspect_bounds: tuple[float, float] = (0.2, 5.0),
    max_bytes: int | None = None,
) -> DataFrame:
    """Survivor selection for a decode/training pipeline: keep rows whose
    metadata passes the plausibility gates (see ``_plausible_media``),
    optionally restricted to a format whitelist and a payload size cap.
    Pure row-local predicates — pushes down, no shuffle."""
    out = meta.filter(_plausible_media(min_dim, aspect_bounds))
    if formats is not None:
        out = out.filter(F.col("format").isin(list(formats)))
    if max_bytes is not None:
        out = out.filter(F.col("n_bytes") <= max_bytes)
    return out


def sample_frames_by_duration(
    meta: DataFrame, every_ms: int = 1000, max_frames_per_media: int = 100_000
) -> DataFrame:
    """Time-based frame sampling for rows whose container declared a real
    duration (MP4 mvhd, WAV/FLAC data-derived): one (media_id, frame_no,
    t_ms) row per ``every_ms`` of runtime, t < duration.  Native
    sequence+posexplode — the row-multiplying shape of real video frame
    extraction, driven by actual timeline length instead of byte count
    (``sample_frames``).

    ``max_frames_per_media`` is an EXPLICIT per-row cap: durations are
    header-DECLARED (the sniffers clamp to a 30-day plausibility window,
    but 30 days at a fine ``every_ms`` is still millions of rows), and an
    unbounded sequence over one lying file would blow Spark's array
    limit.  Rows hitting the cap emit exactly ``max_frames_per_media``
    frames — truncation is visible as frame_no == cap-1."""
    dur = F.col("duration_ms")
    idx = F.sequence(
        F.lit(0),
        F.least(
            F.greatest(
                (F.ceil(dur / every_ms) - 1).cast("long"), F.lit(0).cast("long")
            ),
            F.lit(max_frames_per_media - 1).cast("long"),
        ),
    )
    return (
        meta.filter(dur.isNotNull() & (dur > 0))
        .select("media_id", F.posexplode(idx).alias("frame_no", "step"))
        .select(
            "media_id",
            F.col("frame_no").cast("long").alias("frame_no"),
            (F.col("step") * every_ms).cast("long").alias("t_ms"),
        )
    )


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
