"""Multimodal column plumbing: opaque binary payloads + typed metadata,
decoded / feature-extracted by actor-pool stages.

``HeaderDecoder`` (the default) does REAL decode for everything the
container header carries: PNG/JPEG/GIF/BMP dimensions and WAV duration,
parsed with zero dependencies.  Full pixel/sample decode (PIL / ffmpeg /
soundfile) is NOT in this container, so unrecognized payloads fall back
to the clearly-marked ``FakeDecoder`` stub — the Ray-side plumbing
(schema, small batch sizes for wide binary rows, actor signature, output
layout) is identical either way; swap the decoder factory in production
and nothing else changes.

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


def parse_image_dims(p: bytes) -> tuple[int, int] | None:
    """True (width, height) from container headers, zero dependencies:
    PNG IHDR, JPEG SOF0/1/2 (marker walk), GIF logical screen, BMP
    BITMAPINFOHEADER.  None when the payload is not a recognized image."""
    if len(p) >= 24 and p[:8] == b"\x89PNG\r\n\x1a\n" and p[12:16] == b"IHDR":
        return (
            int.from_bytes(p[16:20], "big"),
            int.from_bytes(p[20:24], "big"),
        )
    if len(p) >= 4 and p[:2] == b"\xff\xd8":  # JPEG: walk the marker stream
        i = 2
        while i + 9 < len(p):
            if p[i] != 0xFF:
                return None
            marker = p[i + 1]
            if marker == 0xD8 or 0xD0 <= marker <= 0xD9:
                i += 2
                continue
            seglen = int.from_bytes(p[i + 2 : i + 4], "big")
            # SOF0-15 carry dimensions, except DHT(C4)/JPG(C8)/DAC(CC)
            if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
                if i + 9 <= len(p):
                    h = int.from_bytes(p[i + 5 : i + 7], "big")
                    w = int.from_bytes(p[i + 7 : i + 9], "big")
                    return (w, h)
                return None
            i += 2 + seglen
        return None
    if len(p) >= 10 and p[:6] in (b"GIF87a", b"GIF89a"):
        return (
            int.from_bytes(p[6:8], "little"),
            int.from_bytes(p[8:10], "little"),
        )
    if len(p) >= 26 and p[:2] == b"BM":
        hdr = int.from_bytes(p[14:18], "little")
        if hdr >= 40:
            w = int.from_bytes(p[18:22], "little")
            h = int.from_bytes(p[22:26], "little", signed=True)
            return (w, abs(h))
    return None


def parse_wav_duration_ms(p: bytes) -> int | None:
    """Duration of a RIFF/WAVE payload from the fmt byte-rate and the data
    chunk size — header walk only, no sample decode."""
    if len(p) < 12 or p[:4] != b"RIFF" or p[8:12] != b"WAVE":
        return None
    i = 12
    byte_rate, data_size = None, None
    while i + 8 <= len(p):
        cid = p[i : i + 4]
        size = int.from_bytes(p[i + 4 : i + 8], "little")
        if cid == b"fmt " and i + 24 <= len(p):
            byte_rate = int.from_bytes(p[i + 16 : i + 20], "little")
        elif cid == b"data":
            data_size = size
        i += 8 + size + (size & 1)  # chunks are word-aligned
    if byte_rate and data_size is not None:
        return int(round(data_size / byte_rate * 1000))
    return None


class HeaderDecoder:
    """Real decode for the formats whose metadata lives in the container
    header (no codec needed): PNG / JPEG / GIF / BMP dimensions, WAV
    duration.  Payloads that aren't a recognized container fall back to
    the deterministic FakeDecoder (video and compressed audio stay
    stubbed — their codecs aren't in this container)."""

    def __init__(self):
        self._fallback = FakeDecoder()

    def decode(self, kind: str, payload: bytes) -> dict:
        if kind == "image":
            dims = parse_image_dims(payload)
            if dims is not None:
                return {"width": dims[0], "height": dims[1], "duration_ms": 0}
        elif kind == "audio":
            dur = parse_wav_duration_ms(payload)
            if dur is not None:
                return {"width": 0, "height": 0, "duration_ms": dur}
        return self._fallback.decode(kind, payload)


class MediaFeatureExtractor:
    """Actor-pool stage: (media_id, kind, payload) → typed metadata.
    Decoder is constructed once per actor (the expensive state slot where a
    real model/codec context would live)."""

    def __init__(self, decoder_factory=HeaderDecoder):
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
