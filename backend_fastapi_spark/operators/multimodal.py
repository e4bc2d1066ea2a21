"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

Media libs (PIL/ffmpeg/librosa) are not in this container, so the actual
decode is STUBBED (``decode_media`` raises NotImplementedError; the
deterministic fake below stands in for tests). What IS real — and what
matters at 100 TB — is the Spark-side plumbing:

- schema: (media_id LONG, kind STRING, payload BINARY, meta MAP<STRING,STRING>)
- partition-friendly batch processing via ``mapInPandas`` (Arrow batches of
  binary columns, decoder state initialized once per partition)
- feature output as typed columns, joinable back by media_id

Swapping the fake for a real decoder changes only ``_decode_payload``.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("meta", T.MapType(T.StringType(), T.StringType()), True),
    ]
)

FEATURE_SCHEMA = (
    "media_id long, kind string, n_bytes long, checksum string, "
    "width int, height int, duration_ms long"
)


def decode_media(payload: bytes, kind: str):
    """Real decoder entry point — requires media libraries not present in
    this environment."""
    raise NotImplementedError(
        "media decoding requires PIL/ffmpeg/librosa; deploy with the media "
        "runtime image and replace _decode_payload"
    )


def _decode_payload(payload: bytes, kind: str) -> tuple[int, int, int]:
    """Deterministic FAKE decode for tests: derives (width, height,
    duration_ms) from a content hash — stable stand-in with the same
    signature the real decoder would have."""
    h = hashlib.md5(payload or b"").digest()
    width = 16 + h[0] % 64
    height = 16 + h[1] % 64
    duration = (int.from_bytes(h[2:4], "big") % 10_000) if kind != "image" else 0
    return width, height, duration


def extract_features(media: DataFrame) -> DataFrame:
    """mapInPandas feature extraction over binary payloads. Arrow moves the
    bytes in columnar batches; per-partition init happens once (where a real
    decoder would load its codec)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # (real decoder: initialize codec/session here, once per partition)
        for pdf in batches:
            out = []
            for r in pdf.itertuples(index=False):
                payload = bytes(r.payload) if r.payload is not None else b""
                w, hgt, dur = _decode_payload(payload, r.kind)
                out.append(
                    (
                        r.media_id,
                        r.kind,
                        len(payload),
                        hashlib.md5(payload).hexdigest(),
                        w,
                        hgt,
                        dur,
                    )
                )
            yield pd.DataFrame(
                out,
                columns=[
                    "media_id",
                    "kind",
                    "n_bytes",
                    "checksum",
                    "width",
                    "height",
                    "duration_ms",
                ],
            )

    return media.mapInPandas(run, schema=FEATURE_SCHEMA)


FRAME_SCHEMA = "media_id long, frame_idx int, frame_checksum string"


def sample_frames(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame sampling plumbing: one output row per sampled frame
    (fan-out inside mapInPandas — rows expand, partitions stay put). The
    frame decode itself is the stubbed step; checksums here derive
    deterministically from (payload, frame_idx) so the batch shape,
    ordering, and join-back semantics are real and testable."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for r in pdf.itertuples(index=False):
                if r.kind != "video":
                    continue
                payload = bytes(r.payload) if r.payload is not None else b""
                _, _, duration = _decode_payload(payload, r.kind)
                n_frames = max(1, duration // every_ms)
                for i in range(n_frames):
                    out.append(
                        (
                            r.media_id,
                            i,
                            hashlib.md5(payload + i.to_bytes(4, "big")).hexdigest(),
                        )
                    )
            yield pd.DataFrame(
                out, columns=["media_id", "frame_idx", "frame_checksum"]
            )

    return media.mapInPandas(run, schema=FRAME_SCHEMA)
