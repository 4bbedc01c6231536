"""Multimodal columns: images/audio/video as opaque binary + typed metadata.

The Spark-side plumbing (schemas, partitioning, Arrow batch shape, UDF
signatures) is real and tested; the actual codec work is STUBBED because
this environment ships no image/audio libraries. Each decode function
raises ``NotImplementedError`` unless ``fake=True``, in which case it
produces a deterministic fake derived from the bytes — so the pipeline
shape (including batch sizes and schema evolution) is exercised end-to-end.

Replacing a stub in production = swapping the marked section for
PIL/torchaudio/pyav calls inside the same mapInPandas generator.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame

ASSET_SCHEMA = (
    "asset_id string, url string, kind string, payload binary, "
    "meta struct<mime:string, width:int, height:int, duration_ms:long>"
)

IMAGE_FEATURES_SCHEMA = (
    "asset_id string, width int, height int, mean_luma double, phash long"
)

FRAME_SAMPLE_SCHEMA = (
    "asset_id string, frame_index int, ts_ms long, frame binary"
)


def _fake_dims(payload: bytes) -> tuple[int, int]:
    digest = hashlib.blake2b(payload or b"", digest_size=4).digest()
    return 64 + digest[0] % 192, 64 + digest[1] % 192


def decode_image_features(assets: DataFrame, fake: bool = False) -> DataFrame:
    """images → (width, height, mean luma, perceptual hash).

    Real implementation: PIL decode + 8x8 DCT pHash — STUBBED.
    """

    def process(batches):
        import pandas as pd

        for batch in batches:
            rows = []
            for row in batch.itertuples(index=False):
                if row.kind != "image":
                    continue
                if not fake:
                    raise NotImplementedError(
                        "image decoding requires PIL — not available in this "
                        "environment; pass fake=True for plumbing tests"
                    )
                # --- STUB: deterministic fake decode -----------------------
                payload = bytes(row.payload or b"")
                width, height = _fake_dims(payload)
                digest = hashlib.blake2b(payload, digest_size=16).digest()
                mean_luma = digest[2] / 255.0
                phash = int.from_bytes(digest[8:16], "big", signed=True)
                # -----------------------------------------------------------
                rows.append(
                    {
                        "asset_id": row.asset_id,
                        "width": width,
                        "height": height,
                        "mean_luma": mean_luma,
                        "phash": phash,
                    }
                )
            yield pd.DataFrame(
                rows, columns=["asset_id", "width", "height", "mean_luma", "phash"]
            )

    return assets.mapInPandas(process, schema=IMAGE_FEATURES_SCHEMA)


def sample_video_frames(assets: DataFrame, every_ms: int = 1000,
                        max_frames: int = 8, fake: bool = False) -> DataFrame:
    """videos → sampled frames (one output row per frame).

    Real implementation: pyav keyframe iteration — STUBBED.
    """

    def process(batches):
        import pandas as pd

        for batch in batches:
            rows = []
            for row in batch.itertuples(index=False):
                if row.kind != "video":
                    continue
                if not fake:
                    raise NotImplementedError(
                        "video decoding requires pyav — not available; pass "
                        "fake=True for plumbing tests"
                    )
                # --- STUB: deterministic fake frames ------------------------
                payload = bytes(row.payload or b"")
                meta = row.meta or {}
                duration = (
                    meta.get("duration_ms") if isinstance(meta, dict)
                    else getattr(meta, "duration_ms", None)
                ) or 4000
                n = min(max_frames, max(1, duration // every_ms))
                for i in range(int(n)):
                    frame = hashlib.blake2b(
                        payload + i.to_bytes(4, "big"), digest_size=32
                    ).digest()
                    rows.append(
                        {
                            "asset_id": row.asset_id,
                            "frame_index": i,
                            "ts_ms": i * every_ms,
                            "frame": frame,
                        }
                    )
                # -----------------------------------------------------------
            yield pd.DataFrame(
                rows, columns=["asset_id", "frame_index", "ts_ms", "frame"]
            )

    return assets.mapInPandas(process, schema=FRAME_SAMPLE_SCHEMA)
