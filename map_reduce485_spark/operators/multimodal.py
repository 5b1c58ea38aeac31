"""Multimodal (image/audio/video) operators over binary columns.

Design: payloads are opaque `binary` columns; metadata is typed columns
alongside.  Decode / feature-extract / resize / frame-sample run as
Arrow-batched Pandas UDFs via `mapInPandas` — one Python process per
executor core, whole Arrow record batches per call, never per-row Python.

The container has no image/audio codec libraries, so the real decoders
raise `NotImplementedError` behind an import-try; a deterministic fake
(`fake_decode_image_meta`) exercises the identical plumbing and is what the
oracle-checked query uses.  Swapping in a real codec changes ONE function
body and nothing about the distributed plan.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

try:  # real codec path — absent in this environment by design
    from PIL import Image  # noqa: F401

    _HAS_PIL = True
except ImportError:
    _HAS_PIL = False


def decode_image_meta(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Real image decode (requires Pillow — STUB: not available here)."""
    if not _HAS_PIL:
        raise NotImplementedError(
            "image codec not available in this environment; "
            "use fake_decode_image_meta for the verified plumbing path"
        )
    raise NotImplementedError("real decode intentionally left to deployment environments")


def fake_decode_image_meta(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Deterministic stand-in for image decode: derives width/height/mode
    from the payload length (stable across runs and engines).

    Input batches: (doc_id: int64, payload: bytes).  Output:
    (doc_id, width, height, n_pixels, mode).  Vectorized pandas ops over
    each Arrow batch — the exact shape a real decoder would use."""
    for pdf in batches:
        n = pdf["payload"].str.len().astype("int64")
        width = n % 640 + 1
        height = (n * 7) % 480 + 1
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "width": width,
                "height": height,
                "n_pixels": width * height,
                "mode": "RGB",
            }
        )


def frame_sample_stub(payload: bytes, every_n: int = 30) -> list[bytes]:
    """Video frame sampling (STUB — no video codec in this environment)."""
    raise NotImplementedError("video codec not available in this environment")


def audio_features_stub(payload: bytes, sample_rate: int = 16_000) -> dict:
    """Audio feature extraction (STUB — no audio codec in this environment)."""
    raise NotImplementedError("audio codec not available in this environment")
