"""Multimodal column plumbing: images/audio/video as opaque binary
columns with typed metadata, processed by Arrow-batched pandas
transforms over ``mapInPandas``.

``DECODERS`` holds two kernels: ``"fake"`` parses the deterministic
synthetic header (the default for plumbing tests), and ``"real"``
parses genuine PNG / JPEG / GIF / WAV / FLAC / MP4 container headers
in pure Python — dimensions, sample rate, frame counts — with no
codec libraries.

Beyond headers, the formats stdlib can FULLY decode get real payload
kernels: PNG pixels (zlib inflate + scanline unfilter —
:func:`decode_png_pixels`, :func:`image_pixel_stats`,
:func:`resize_images`) and WAV PCM samples
(:func:`decode_wav_samples`, :func:`audio_sample_stats`). Formats
whose payload needs an entropy codec (JPEG scan data, FLAC
subframes, MP4 samples) raise ``NotImplementedError`` inside the
kernels and surface as keep-and-flag ``error`` rows — the documented
environment gate — while the Spark-side plumbing (mapInPandas,
schemas, Arrow batching, partition flow) is identical and real for
every format.
"""

from __future__ import annotations

import struct
from typing import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# media payload header for the deterministic fake codec:
#   4s kind | H width | H height | I n_frames
_HEADER = struct.Struct("<4sHHI")

#: hard ceiling on a single PNG's decoded byte size (height ×
#: (width·channels + 1)). Rows declaring more are flagged as
#: malformed instead of letting a decompression bomb allocate
#: executor memory — 256 MiB covers a 9000×9000 RGBA frame, far past
#: curation-corpus imagery; raise it for genuine large-format work.
PNG_MAX_DECODED_BYTES = 256 * 1024 * 1024

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField("meta", T.MapType(T.StringType(), T.StringType())),
    ]
)


def encode_fake_media(
    media_id: int, kind: str, width: int, height: int, n_frames: int = 1
) -> bytes:
    """Deterministic synthetic payload (used by tests in place of real
    image/audio bytes)."""
    body = bytes(
        (media_id * 31 + i * 7) % 256 for i in range(min(width * height, 256))
    )
    return _HEADER.pack(kind[:4].ljust(4).encode(), width, height, n_frames) + body


def _fake_decode(payload: bytes) -> dict:
    kind, width, height, n_frames = _HEADER.unpack(payload[: _HEADER.size])
    body = payload[_HEADER.size:]
    return {
        "kind": kind.decode().strip(),
        "width": int(width),
        "height": int(height),
        "n_frames": int(n_frames),
        "n_bytes": len(payload),
        "checksum": sum(body) % 65536,
    }


def _real_decode(payload: bytes) -> dict:
    """Container-header decoder for real media bytes — pure Python, no
    codec libraries. Parses PNG (IHDR), JPEG (SOF marker walk), GIF
    (logical screen), WAV (RIFF fmt/data), FLAC (STREAMINFO), and
    ISO-BMFF/MP4 (moov → mvhd/tkhd) headers; pixel/sample/entropy
    decode still needs codec libs and stays out of scope here.

    Feature mapping into the generic FEATURE_SCHEMA:
      image: width/height = pixels, n_frames = 1
      wav/flac: width = sample_rate, height = bits_per_sample,
             n_frames = sample frames
      mp4:  width/height = first track's pixels (0 if audio-only),
             n_frames = duration in whole timescale seconds
    """
    import binascii

    n_bytes = len(payload)
    checksum = binascii.crc32(payload) % 65536
    if payload[:8] == b"\x89PNG\r\n\x1a\n":
        # first chunk must be IHDR: len(4) "IHDR" width(4) height(4)
        if payload[12:16] != b"IHDR":
            raise ValueError("malformed PNG: IHDR not first chunk")
        width, height = struct.unpack(">II", payload[16:24])
        return {"kind": "png", "width": int(width), "height": int(height),
                "n_frames": 1, "n_bytes": n_bytes, "checksum": checksum}
    if payload[:6] in (b"GIF87a", b"GIF89a"):
        width, height = struct.unpack("<HH", payload[6:10])
        return {"kind": "gif", "width": int(width), "height": int(height),
                "n_frames": 1, "n_bytes": n_bytes, "checksum": checksum}
    if payload[:2] == b"\xff\xd8":
        # JPEG: walk the marker stream to the first SOF frame header
        # (FFC0..FFCF excluding DHT/JPG/DAC), which carries
        # precision(1) height(2) width(2) — the standard baseline AND
        # progressive dimension source. Entropy decode still needs a
        # codec lib; dims/structure do not.
        pos = 2
        while pos + 4 <= n_bytes:
            if payload[pos] != 0xFF:
                raise ValueError("malformed JPEG: lost marker sync")
            marker = payload[pos + 1]
            if marker == 0xFF:  # fill byte
                pos += 1
                continue
            if marker in (0x01, *range(0xD0, 0xD8)):  # standalone
                pos += 2
                continue
            if marker == 0xD9:  # EOI before any SOF
                break
            (seg_len,) = struct.unpack(">H", payload[pos + 2:pos + 4])
            if 0xC0 <= marker <= 0xCF and marker not in (
                0xC4, 0xC8, 0xCC
            ):
                height, width = struct.unpack(
                    ">HH", payload[pos + 5:pos + 9]
                )
                return {
                    "kind": "jpeg", "width": int(width),
                    "height": int(height), "n_frames": 1,
                    "n_bytes": n_bytes, "checksum": checksum,
                }
            if marker == 0xDA:  # SOS: entropy data follows, no SOF seen
                break
            pos += 2 + seg_len
        raise ValueError("malformed JPEG: no SOF frame header found")
    if payload[:4] == b"fLaC":
        # FLAC: the first metadata block MUST be STREAMINFO (type 0,
        # 34 bytes). Its tail u64 packs sample_rate(20) channels-1(3)
        # bits-1(5) total_samples(36). Same feature mapping as WAV:
        # width = sample_rate, height = bits_per_sample, n_frames =
        # inter-channel sample frames. Entropy (subframe) decode needs
        # a codec lib; the header does not.
        if len(payload) < 42 or (payload[4] & 0x7F) != 0:
            raise ValueError(
                "malformed FLAC: STREAMINFO not first metadata block"
            )
        (packed,) = struct.unpack(">Q", payload[18:26])
        rate = packed >> 44
        bits = ((packed >> 36) & 0x1F) + 1
        total = packed & ((1 << 36) - 1)
        return {"kind": "flac", "width": int(rate), "height": int(bits),
                "n_frames": int(total), "n_bytes": n_bytes,
                "checksum": checksum}
    if payload[4:8] == b"ftyp":
        # ISO-BMFF (MP4/MOV/M4A): walk top-level boxes to moov, then
        # moov children for mvhd (timescale/duration) and the first
        # tkhd (track dims, 16.16 fixed). width/height = track pixels
        # (0 for audio-only), n_frames = media duration in WHOLE
        # timescale seconds — sample tables (stts/stsz) and frame
        # decode stay codec-library territory.
        def boxes(lo: int, hi: int):
            pos = lo
            while pos + 8 <= hi:
                (blen,) = struct.unpack(">I", payload[pos:pos + 4])
                btyp = payload[pos + 4:pos + 8]
                if blen < 8:
                    break  # 64-bit/zero-size boxes: out of scope
                yield btyp, pos + 8, min(pos + blen, hi)
                pos += blen

        width = height = secs = 0
        for typ, lo, hi in boxes(0, n_bytes):
            if typ != b"moov":
                continue
            # size guards are VERSION-AWARE (ADVICE r10): v1 boxes
            # carry 64-bit times, so mvhd v1 reads up to ilo+32 and
            # tkhd v1 up to tlo+96 — a truncated v1 box must fall
            # through to the documented malformed-ValueError path,
            # never raise struct.error from an executor
            for ityp, ilo, ihi in boxes(lo, hi):
                if ityp == b"mvhd" and ihi - ilo >= 20:
                    ver = payload[ilo]
                    if ver == 1:
                        if ihi - ilo < 32:
                            raise ValueError(
                                "malformed MP4: truncated mvhd v1 box"
                            )
                        (ts,) = struct.unpack(
                            ">I", payload[ilo + 20:ilo + 24]
                        )
                        (dur,) = struct.unpack(
                            ">Q", payload[ilo + 24:ilo + 32]
                        )
                    else:
                        ts, dur = struct.unpack(
                            ">II", payload[ilo + 12:ilo + 20]
                        )
                    secs = int(dur // max(ts, 1))
                elif ityp == b"trak" and not (width or height):
                    for ttyp, tlo, thi in boxes(ilo, ihi):
                        if ttyp == b"tkhd" and thi - tlo >= 84:
                            ver = payload[tlo]
                            if ver == 1 and thi - tlo < 96:
                                raise ValueError(
                                    "malformed MP4: truncated tkhd "
                                    "v1 box"
                                )
                            off = tlo + (88 if ver == 1 else 76)
                            w16, h16 = struct.unpack(
                                ">II", payload[off:off + 8]
                            )
                            width, height = w16 >> 16, h16 >> 16
            return {"kind": "mp4", "width": int(width),
                    "height": int(height), "n_frames": int(secs),
                    "n_bytes": n_bytes, "checksum": checksum}
        raise ValueError("malformed MP4: no moov box found")
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        # walk RIFF chunks for fmt and data
        pos, rate, bits, channels, data_len = 12, 0, 0, 1, 0
        while pos + 8 <= n_bytes:
            cid = payload[pos:pos + 4]
            (clen,) = struct.unpack("<I", payload[pos + 4:pos + 8])
            if cid == b"fmt ":
                channels, rate = struct.unpack("<HI", payload[pos + 10:pos + 16])
                (bits,) = struct.unpack("<H", payload[pos + 22:pos + 24])
            elif cid == b"data":
                data_len = clen
            pos += 8 + clen + (clen & 1)  # chunks are word-aligned
        frame_size = max(1, channels * max(bits, 8) // 8)
        return {"kind": "wav", "width": int(rate), "height": int(bits),
                "n_frames": int(data_len // frame_size),
                "n_bytes": n_bytes, "checksum": checksum}
    raise ValueError(
        "unsupported media container (expected PNG, JPEG, GIF, WAV, "
        "FLAC, or ISO-BMFF/MP4); full pixel/sample decode requires "
        "codec libraries not present here"
    )


def write_png(width: int, height: int, pixel_fn=None) -> bytes:
    """Minimal real PNG encoder (stdlib zlib only) — grayscale 8-bit,
    used to exercise DECODERS['real'] with genuine image bytes."""
    import binascii
    import zlib

    def chunk(tag: bytes, body: bytes) -> bytes:
        crc = binascii.crc32(tag + body) & 0xFFFFFFFF
        return struct.pack(">I", len(body)) + tag + body + struct.pack(">I", crc)

    pixel_fn = pixel_fn or (lambda x, y: (x * 7 + y * 13) % 256)
    raw = b"".join(
        b"\x00" + bytes(pixel_fn(x, y) % 256 for x in range(width))
        for y in range(height)
    )
    ihdr = struct.pack(">IIBBBBB", width, height, 8, 0, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def write_jpeg_headers(width: int, height: int) -> bytes:
    """Structurally valid JPEG marker stream (SOI + JFIF APP0 + DQT
    stub + SOF0 + SOS + EOI) — real header layout for exercising the
    SOF dimension parser; carries no entropy-coded scan data."""
    app0 = b"JFIF\x00\x01\x02\x00\x00\x01\x00\x01\x00\x00"
    dqt = b"\x00" + bytes(64)
    sof0 = struct.pack(">BHHB", 8, height, width, 1) + b"\x01\x11\x00"

    def seg(marker: int, body: bytes) -> bytes:
        return struct.pack(">BBH", 0xFF, marker, len(body) + 2) + body

    return (
        b"\xff\xd8"
        + seg(0xE0, app0)
        + seg(0xDB, dqt)
        + seg(0xC0, sof0)
        + seg(0xDA, b"\x01\x01\x00\x00\x3f\x00")
        + b"\xff\xd9"
    )


def write_flac_headers(
    sample_rate: int, bits: int, total_samples: int
) -> bytes:
    """Structurally valid FLAC stream head (fLaC magic + last-block
    STREAMINFO) — real header layout for exercising the STREAMINFO
    parser; carries no audio frames."""
    packed = (
        (sample_rate << 44)
        | (0 << 41)  # channels-1 (mono)
        | ((bits - 1) << 36)
        | (total_samples & ((1 << 36) - 1))
    )
    body = (
        struct.pack(">HH", 4096, 4096)  # min/max block size
        + bytes(6)  # min/max frame size (unknown)
        + struct.pack(">Q", packed)
        + bytes(16)  # md5 of unencoded audio (unknown)
    )
    return b"fLaC" + bytes([0x80]) + len(body).to_bytes(3, "big") + body


def write_mp4_headers(
    width: int, height: int, timescale: int = 1000, duration: int = 0
) -> bytes:
    """Minimal ISO-BMFF skeleton (ftyp + moov{mvhd, trak{tkhd}}) —
    real box layout for exercising the mvhd/tkhd parser; carries no
    sample data."""
    def box(typ: bytes, body: bytes) -> bytes:
        return struct.pack(">I", len(body) + 8) + typ + body

    ftyp = box(b"ftyp", b"isom" + struct.pack(">I", 512) + b"isomiso2")
    mvhd = box(
        b"mvhd",
        bytes(4)  # version 0 + flags
        + bytes(8)  # creation/modification time
        + struct.pack(">II", timescale, duration)
        + struct.pack(">I", 0x00010000) + struct.pack(">H", 0x0100)
        + bytes(10) + bytes(36) + bytes(24) + struct.pack(">I", 2),
    )
    tkhd = box(
        b"tkhd",
        bytes(4) + bytes(8) + struct.pack(">I", 1) + bytes(4)
        + struct.pack(">I", duration) + bytes(8)
        + bytes(8)  # layer/alt-group/volume/reserved
        + bytes(36)  # identity matrix slot (zeros fine for the probe)
        + struct.pack(">II", width << 16, height << 16),
    )
    return ftyp + box(b"moov", mvhd + box(b"trak", tkhd))


DECODERS: dict[str, Callable[[bytes], dict]] = {
    "fake": _fake_decode,
    "real": _real_decode,
}

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_frames", T.IntegerType()),
        T.StructField("n_bytes", T.IntegerType()),
        T.StructField("checksum", T.IntegerType()),
    ]
)


def extract_features(df: DataFrame, decoder: str = "fake") -> DataFrame:
    """Decode/inspect binary payloads distributed: Arrow batches in,
    Arrow batches out (``mapInPandas``), never a row-at-a-time UDF."""
    decode = DECODERS[decoder]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [decode(p) for p in pdf["payload"]]
            out = pd.DataFrame(feats)
            out.insert(0, "media_id", pdf["media_id"].values)
            yield out[
                ["media_id", "kind", "width", "height", "n_frames",
                 "n_bytes", "checksum"]
            ]

    return df.mapInPandas(run, schema=FEATURE_SCHEMA)


def sample_frames(
    df: DataFrame, every_nth: int = 2, decoder: str = "fake"
) -> DataFrame:
    """Frame sampling for video-kind payloads: one output row per kept
    frame index — the plumbing for frame-level pipelines."""
    decode = DECODERS[decoder]
    schema = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("frame_idx", T.IntegerType()),
            T.StructField("frame_key", T.StringType()),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                info = decode(payload)
                for idx in range(0, info["n_frames"], every_nth):
                    rows.append(
                        (int(mid), idx, f"{mid}:{idx}:{info['checksum']}")
                    )
            yield pd.DataFrame(
                rows, columns=["media_id", "frame_idx", "frame_key"]
            )

    return df.mapInPandas(run, schema=schema)


def resize_stub(df: DataFrame, width: int, height: int) -> DataFrame:
    """Resize plumbing: records target dims in metadata; the pixel
    kernel is environment-gated (see DECODERS['real'])."""
    return df.withColumn(
        "meta",
        F.map_concat(
            F.coalesce(
                F.col("meta"),
                F.create_map().cast("map<string,string>"),
            ),
            F.create_map(
                F.lit("target_w"), F.lit(str(width)),
                F.lit("target_h"), F.lit(str(height)),
            ),
        ),
    )


# ---------------------------------------------------------------------------
# real PAYLOAD decode — the formats stdlib can fully decode
# ---------------------------------------------------------------------------
# PNG's only compression is zlib DEFLATE and its filters are simple
# per-scanline predictors, so full pixel access needs no codec
# library; WAV PCM is raw samples behind a RIFF header. Everything
# codec-bound (JPEG entropy decode, FLAC subframes, MP4 sample data)
# stays behind NotImplementedError — the documented environment gate
# — while the Spark-side plumbing (mapInPandas kernels, schemas,
# Arrow batching) is identical for every format.


def decode_png_pixels(payload: bytes):
    """Full PNG pixel decode, stdlib + numpy only: IDAT inflate +
    per-scanline unfilter (None/Sub/Up/Average/Paeth). Supports the
    8-bit gray / RGB / RGBA color types (0/2/6); palette and 16-bit
    variants raise NotImplementedError (re-encode upstream). Returns
    a ``(height, width, channels)`` uint8 ndarray."""
    import zlib

    import numpy as np

    if payload[:8] != b"\x89PNG\r\n\x1a\n" or payload[12:16] != b"IHDR":
        raise ValueError("not a PNG (or IHDR not first chunk)")
    width, height = struct.unpack(">II", payload[16:24])
    bit_depth, color_type = payload[24], payload[25]
    if payload[26] != 0 or payload[28] != 0:
        raise NotImplementedError(
            "nonzero PNG compression/interlace method"
        )
    channels = {0: 1, 2: 3, 6: 4}.get(color_type)
    if channels is None or bit_depth != 8:
        raise NotImplementedError(
            f"PNG color_type={color_type} bit_depth={bit_depth}: only "
            "8-bit gray/RGB/RGBA decode without a codec library"
        )
    # walk chunks, concatenating IDAT
    idat = bytearray()
    pos = 8
    while pos + 8 <= len(payload):
        (clen,) = struct.unpack(">I", payload[pos:pos + 4])
        ctyp = payload[pos + 4:pos + 8]
        if ctyp == b"IDAT":
            idat += payload[pos + 8:pos + 8 + clen]
        elif ctyp == b"IEND":
            break
        pos += 12 + clen  # len + type + body + crc
    # bounded inflate (ADVICE r11): a crafted small PNG declaring
    # large dimensions (or an IDAT stream inflating past them —
    # the classic decompression bomb) must flag the ROW, not
    # MemoryError the executor. The declared-geometry cap rejects
    # absurd headers before allocating; decompressobj with
    # max_length stops the inflate at expected+1 bytes, so a bomb
    # costs at most one image worth of memory.
    stride = width * channels
    expected = height * (stride + 1)
    if expected > PNG_MAX_DECODED_BYTES:
        raise ValueError(
            f"PNG declares {width}x{height}x{channels} = {expected} "
            f"decoded bytes, over the {PNG_MAX_DECODED_BYTES} cap"
        )
    inflater = zlib.decompressobj()
    raw = inflater.decompress(bytes(idat), expected + 1)
    if len(raw) != expected or not inflater.eof:
        # wrong size, over-long stream (bomb), or a stream truncated
        # before its trailer that happens to yield exactly `expected`
        # bytes — the unbounded zlib.decompress flagged that last case
        # too (self-review r12)
        raise ValueError("malformed PNG: IDAT size mismatch")
    raw = np.frombuffer(raw, dtype=np.uint8).reshape(
        height, stride + 1
    )
    filters, data = raw[:, 0], raw[:, 1:].astype(np.int64)
    out = np.zeros_like(data)
    prior = np.zeros(stride, dtype=np.int64)
    bpp = channels  # bytes per pixel at depth 8
    for y in range(height):
        row = data[y].copy()
        f = filters[y]
        if f == 0:  # None
            cur = row
        elif f == 1:  # Sub: left within the row — sequential scan
            cur = row
            for x in range(bpp, stride):
                cur[x] = (cur[x] + cur[x - bpp]) & 0xFF
        elif f == 2:  # Up: fully vectorized
            cur = (row + prior) & 0xFF
        elif f == 3:  # Average
            cur = row
            for x in range(stride):
                left = cur[x - bpp] if x >= bpp else 0
                cur[x] = (cur[x] + ((left + prior[x]) >> 1)) & 0xFF
        elif f == 4:  # Paeth
            cur = row
            for x in range(stride):
                a = cur[x - bpp] if x >= bpp else 0
                b = prior[x]
                c = prior[x - bpp] if x >= bpp else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (
                    b if pb <= pc else c
                )
                cur[x] = (cur[x] + pred) & 0xFF
        else:
            raise ValueError(f"malformed PNG: unknown filter {f}")
        out[y] = cur
        prior = cur
    return out.astype(np.uint8).reshape(height, width, channels)


def encode_png(arr) -> bytes:
    """Encode a ``(h, w)`` or ``(h, w, channels)`` uint8 ndarray as a
    real PNG (filter 0, one zlib stream) — gray / RGB / RGBA by
    channel count. The write half of :func:`decode_png_pixels`, used
    by :func:`resize_images` to re-encode resized payloads."""
    import binascii
    import zlib

    import numpy as np

    a = np.ascontiguousarray(arr, dtype=np.uint8)
    if a.ndim == 2:
        a = a[:, :, None]
    h, w, ch = a.shape
    color_type = {1: 0, 3: 2, 4: 6}.get(ch)
    if color_type is None:
        raise ValueError(f"unsupported channel count {ch}")

    def chunk(tag: bytes, body: bytes) -> bytes:
        crc = binascii.crc32(tag + body) & 0xFFFFFFFF
        return (
            struct.pack(">I", len(body)) + tag + body
            + struct.pack(">I", crc)
        )

    rows = np.concatenate(
        [np.zeros((h, 1), dtype=np.uint8), a.reshape(h, w * ch)],
        axis=1,
    )
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(rows.tobytes()))
        + chunk(b"IEND", b"")
    )


def decode_wav_samples(payload: bytes):
    """Full WAV PCM sample decode (stdlib struct + numpy): returns
    ``(samples, sample_rate)`` with samples a ``(frames, channels)``
    int32 ndarray. 8-bit (unsigned) and 16-bit (signed LE) PCM;
    compressed WAV formats raise NotImplementedError."""
    import numpy as np

    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, fmt_code, rate, bits, channels = 12, 1, 0, 0, 1
    data = b""
    n = len(payload)
    while pos + 8 <= n:
        cid = payload[pos:pos + 4]
        (clen,) = struct.unpack("<I", payload[pos + 4:pos + 8])
        if cid == b"fmt ":
            fmt_code, channels, rate = struct.unpack(
                "<HHI", payload[pos + 8:pos + 16]
            )
            (bits,) = struct.unpack("<H", payload[pos + 22:pos + 24])
        elif cid == b"data":
            data = payload[pos + 8:pos + 8 + clen]
        pos += 8 + clen + (clen & 1)
    if fmt_code != 1:
        raise NotImplementedError(
            f"WAV format code {fmt_code}: only PCM decodes without a "
            "codec library"
        )
    if bits == 16:
        samples = np.frombuffer(
            data[: len(data) // 2 * 2], dtype="<i2"
        ).astype(np.int32)
    elif bits == 8:
        samples = (
            np.frombuffer(data, dtype=np.uint8).astype(np.int32) - 128
        )
    else:
        raise NotImplementedError(f"WAV PCM bit depth {bits}")
    frames = len(samples) // max(channels, 1)
    return samples[: frames * channels].reshape(frames, channels), rate


PIXEL_STATS_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("channels", T.IntegerType()),
        T.StructField("mean", T.DoubleType()),
        T.StructField("std", T.DoubleType()),
        T.StructField("min", T.IntegerType()),
        T.StructField("max", T.IntegerType()),
        T.StructField("entropy", T.DoubleType()),
        T.StructField("error", T.StringType()),
    ]
)


def _content_stats(values, ndigits: int = 6) -> dict:
    """Shared content-statistics kernel: mean/std/min/max + Shannon
    entropy over the EXACT integer value distribution (unique-value
    counts, not a range-binned histogram — bin edges would depend on
    the data range and defeat a SQL ``GROUP BY v`` oracle). For
    byte-ish integer data every intermediate (sums, means, squared
    deviations) is exactly representable in float64, so an oracle
    reproduces mean/std bit-for-bit; rounding covers the last-ulp
    libm variance in log2."""
    from decimal import ROUND_HALF_UP, Decimal

    import numpy as np

    def _r(x: float) -> float:
        # HALF-AWAY rounding, matching SQL ROUND (Spark/DuckDB).
        # Python's round() is banker's, and byte-valued data makes
        # mean/entropy exact DYADIC rationals that land exactly on
        # .5 boundaries — the two rules then disagree for real.
        return float(
            Decimal(repr(float(x))).quantize(
                Decimal(1).scaleb(-ndigits), rounding=ROUND_HALF_UP
            )
        )

    flat = values.reshape(-1).astype(np.float64)
    _, counts = np.unique(values.reshape(-1), return_counts=True)
    p = counts / flat.size
    return {
        "mean": _r(flat.mean()),
        "std": _r(flat.std()),
        "min": int(values.min()),
        "max": int(values.max()),
        "entropy": _r(-(p * np.log2(p)).sum()),
    }


def image_pixel_stats(df: DataFrame) -> DataFrame:
    """REAL pixel-content features over a binary image column —
    per-image mean/std/min/max/entropy from the full decoded bitmap
    (decode_png_pixels), the content signal a curation gate needs
    beyond container dims (flat/blank images, synthetic gradients,
    near-zero-entropy screenshots). Arrow-batched ``mapInPandas``;
    rows whose payload needs a codec library (JPEG entropy data, ...)
    report ``error`` instead of failing the job — the same
    keep-and-flag contract as pipeline quality gates."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                base = {
                    "media_id": int(mid), "kind": None, "width": None,
                    "height": None, "channels": None, "mean": None,
                    "std": None, "min": None, "max": None,
                    "entropy": None, "error": None,
                }
                try:
                    px = decode_png_pixels(payload)
                    h, w, ch = px.shape
                    base.update(
                        kind="png", width=w, height=h, channels=ch,
                        **_content_stats(px),
                    )
                except Exception as exc:  # noqa: BLE001 — the
                    # keep-and-flag contract: truncated/corrupt
                    # bytes raise struct.error / zlib.error /
                    # IndexError from inside the decoders, and a
                    # single bad row must flag, never kill the job
                    base["error"] = str(exc)
                rows.append(base)
            yield pd.DataFrame(rows)

    return df.mapInPandas(run, schema=PIXEL_STATS_SCHEMA)


def audio_sample_stats(df: DataFrame) -> DataFrame:
    """REAL sample-content features over a binary audio column: per
    clip mean/std/min/max/entropy of the PCM samples plus rate and
    frame count (decode_wav_samples). Same keep-and-flag error
    contract as :func:`image_pixel_stats`."""
    schema = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("sample_rate", T.IntegerType()),
            T.StructField("n_frames", T.IntegerType()),
            T.StructField("channels", T.IntegerType()),
            T.StructField("mean", T.DoubleType()),
            T.StructField("std", T.DoubleType()),
            T.StructField("min", T.IntegerType()),
            T.StructField("max", T.IntegerType()),
            T.StructField("entropy", T.DoubleType()),
            T.StructField("error", T.StringType()),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                base = {
                    "media_id": int(mid), "sample_rate": None,
                    "n_frames": None, "channels": None, "mean": None,
                    "std": None, "min": None, "max": None,
                    "entropy": None, "error": None,
                }
                try:
                    samples, rate = decode_wav_samples(payload)
                    base.update(
                        sample_rate=int(rate),
                        n_frames=int(samples.shape[0]),
                        channels=int(samples.shape[1]),
                        **_content_stats(samples),
                    )
                except Exception as exc:  # noqa: BLE001 — the
                    # keep-and-flag contract: truncated/corrupt
                    # bytes raise struct.error / zlib.error /
                    # IndexError from inside the decoders, and a
                    # single bad row must flag, never kill the job
                    base["error"] = str(exc)
                rows.append(base)
            yield pd.DataFrame(rows)

    return df.mapInPandas(run, schema=schema)


def resize_images(
    df: DataFrame, width: int, height: int
) -> DataFrame:
    """REAL image resize over a binary column: decode → deterministic
    nearest-neighbor resample (numpy index mapping — no codec, no
    interpolation-library variance across hosts) → re-encode as PNG.
    Returns the input schema with ``payload`` replaced and the target
    dims stamped into ``meta``; undecodable payloads pass through
    UNCHANGED with an ``resize_error`` meta entry (keep-and-flag).
    Row-local mapInPandas — no shuffle at any corpus size."""
    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("kind", T.StringType()),
            T.StructField("payload", T.BinaryType()),
            T.StructField(
                "meta", T.MapType(T.StringType(), T.StringType())
            ),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            payloads, metas = [], []
            for payload, meta in zip(pdf["payload"], pdf["meta"]):
                meta = dict(meta or {})
                meta["target_w"] = str(width)
                meta["target_h"] = str(height)
                try:
                    px = decode_png_pixels(payload)
                    h, w, _ = px.shape
                    ys = np.minimum(
                        (np.arange(height) * h) // height, h - 1
                    )
                    xs = np.minimum(
                        (np.arange(width) * w) // width, w - 1
                    )
                    payloads.append(encode_png(px[ys][:, xs]))
                except Exception as exc:  # noqa: BLE001 — the
                    # keep-and-flag contract: truncated/corrupt
                    # bytes raise struct.error / zlib.error /
                    # IndexError from inside the decoders, and a
                    # single bad row must flag, never kill the job
                    meta["resize_error"] = str(exc)
                    payloads.append(payload)
                metas.append(meta)
            out = pdf.copy()
            out["payload"] = payloads
            out["meta"] = metas
            yield out[["media_id", "kind", "payload", "meta"]]

    return df.mapInPandas(run, schema=out_schema)
