"""Multimodal column plumbing: images/audio/video as opaque binary
columns with typed metadata, processed by Arrow-batched pandas
transforms over ``mapInPandas``.

The decode kernels (image decode, audio resample, video frame
sampling) need codec libraries that are NOT available in this
container — they are stubbed behind ``DECODERS``: the default
deterministic fake parses our synthetic header so the Spark-side
plumbing (schema, batching, partition flow) is real and tested;
swapping in a real decoder is a one-line registration.
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


def _real_decode(payload: bytes) -> dict:  # pragma: no cover - stub
    raise NotImplementedError(
        "real image/audio decoding requires codec libraries (Pillow/"
        "torchaudio/ffmpeg) not present in this environment; register a "
        "decoder via DECODERS['real'] when available"
    )


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
