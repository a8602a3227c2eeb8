"""Multimodal column plumbing: opaque binary payloads + typed metadata,
decoded / feature-extracted by actor-pool stages.

The real decoders (PIL / ffmpeg / soundfile) are NOT in this container, so
``decode`` is a clearly-marked STUB behind ``set_decoder`` — the Ray-side
plumbing (schema, small batch sizes for wide binary rows, actor signature,
output layout) is real and tested.  Swap ``FakeDecoder`` for a real one in
production; nothing else changes.

Wide-row discipline: binary payloads dominate block size, so stages use
small ``batch_size`` and drop the payload column immediately after feature
extraction (same hazard as the html column, SURVEY §7.5.6).
"""

from __future__ import annotations

from hashlib import blake2b

import numpy as np
import pyarrow as pa
from ray.data import Dataset

MEDIA_SCHEMA = pa.schema(
    [
        ("media_id", pa.int64()),
        ("kind", pa.string()),  # image | audio | video
        ("payload", pa.binary()),
    ]
)


class FakeDecoder:
    """Deterministic stand-in for a media decoder: derives pseudo
    width/height/duration from a content hash.  STUB — replace with a real
    decoder (PIL.Image.open / av / soundfile) in production."""

    def decode(self, kind: str, payload: bytes) -> dict:
        h = blake2b(payload, digest_size=8).digest()
        a, b = int.from_bytes(h[:4], "big"), int.from_bytes(h[4:], "big")
        if kind == "image":
            return {"width": 64 + a % 4032, "height": 64 + b % 3024, "duration_ms": 0}
        if kind in ("audio", "video"):
            return {"width": 0, "height": 0, "duration_ms": 100 + a % 600_000}
        raise NotImplementedError(f"unknown media kind: {kind}")


class MediaFeatureExtractor:
    """Actor-pool stage: (media_id, kind, payload) → typed metadata.
    Decoder is constructed once per actor (the expensive state slot where a
    real model/codec context would live)."""

    def __init__(self, decoder_factory=FakeDecoder):
        self.decoder = decoder_factory()

    def __call__(self, t: pa.Table) -> pa.Table:
        kinds = t.column("kind").to_pylist()
        payloads = t.column("payload").to_pylist()
        n = len(kinds)
        size = np.empty(n, dtype=np.int64)
        w = np.empty(n, dtype=np.int64)
        h = np.empty(n, dtype=np.int64)
        dur = np.empty(n, dtype=np.int64)
        for i, (k, p) in enumerate(zip(kinds, payloads)):
            size[i] = len(p)
            meta = self.decoder.decode(k, p)
            w[i], h[i], dur[i] = meta["width"], meta["height"], meta["duration_ms"]
        # payload dropped here — only metadata flows downstream
        return pa.table(
            {
                "media_id": t.column("media_id"),
                "kind": t.column("kind"),
                "n_bytes": size,
                "width": w,
                "height": h,
                "duration_ms": dur,
            }
        )


def extract_media_features(
    media: Dataset, *, batch_size: int = 64, concurrency=None
) -> Dataset:
    if concurrency is None:
        from ..context import pool_size

        concurrency = pool_size()
    return media.map_batches(
        MediaFeatureExtractor,
        batch_format="pyarrow",
        batch_size=batch_size,  # small: payload rows are wide
        zero_copy_batch=True,
        concurrency=concurrency,
    )


def documents_as_media(sf_dir: str) -> Dataset:
    """Adapter for the sandbox: treat document text bytes as opaque media
    payloads so the plumbing has a deterministic input."""
    import ray.data as rd

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def conv(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy()
        payloads = [s.encode("utf-8") for s in t.column("text").to_pylist()]
        kinds = ["image" if i % 3 else "audio" for i in ids.tolist()]
        return pa.table(
            {
                "media_id": ids,
                "kind": pa.array(kinds, pa.string()),
                "payload": pa.array(payloads, pa.binary()),
            }
        )

    return docs.map_batches(conv, batch_format="pyarrow", zero_copy_batch=True)
