"""A second REAL, dependency-free image codec for the multimodal override
seam: PNG (8-bit truecolor RGB/RGBA, non-interlaced) in pure
stdlib-zlib/struct/numpy.

Where `bmpcodec.py` proves the seam with the simplest possible container,
PNG is the format a web crawl actually contains alongside JPEG — and its
decode is a genuine codec: chunked container parse, DEFLATE inflate, and
the five scanline predictors (None/Sub/Up/Average/Paeth) undone exactly
per the spec. The encoder can emit any fixed filter type, which the tests
use to force every decode predictor path.

Scale note: Sub/Average/Paeth undo has a sequential left-neighbor
dependency, vectorized across channels but looped across pixels-per-row —
fine for the thumbnails/test fixtures this container can hold. A 100 TB
deployment swaps in libpng/Pillow via the same one-method override; the
schema, batch sizing, actor signature and payload-drop discipline are all
inherited unchanged (see `multimodal.py` design notes).

Reference analogue: the per-record decode step of
`radiant/tasks/vcf/snv/germline/occurrence.py` — heavy per-worker codec
state in ``__init__``, compact typed features out.
"""

from __future__ import annotations

import hashlib
import struct
import zlib

import numpy as np

from radiant_portal_pipeline_ray.stages.multimodal import (
    ImageFeatureStage,
    ImageResizeStage,
)
from radiant_portal_pipeline_ray.stages.bmpcodec import nn_resample

_SIG = b"\x89PNG\r\n\x1a\n"


def encode_png(pixels: np.ndarray, filter_type: int = 0) -> bytes:
    """PNG from an (h, w, 3|4) uint8 array, every scanline filtered with
    ``filter_type`` (0..4) — non-zero types exist to exercise the decoder's
    predictor paths deterministically."""
    if pixels.ndim != 3 or pixels.shape[2] not in (3, 4):
        raise ValueError("expected (h, w, 3|4) uint8 pixels")
    if not 0 <= filter_type <= 4:
        raise ValueError(f"bad filter type {filter_type}")
    h, w, ch = pixels.shape
    color = 2 if ch == 3 else 6
    px = pixels.astype(np.int32)
    raw = bytearray()
    prev = np.zeros((w, ch), np.int32)
    for y in range(h):
        line = px[y]
        left = np.zeros((w, ch), np.int32)
        left[1:] = line[:-1]
        up = prev
        upleft = np.zeros((w, ch), np.int32)
        upleft[1:] = prev[:-1]
        if filter_type == 0:
            out = line
        elif filter_type == 1:
            out = line - left
        elif filter_type == 2:
            out = line - up
        elif filter_type == 3:
            out = line - ((left + up) >> 1)
        else:  # Paeth
            p = left + up - upleft
            pa_ = np.abs(p - left)
            pb = np.abs(p - up)
            pc_ = np.abs(p - upleft)
            pred = np.where(
                (pa_ <= pb) & (pa_ <= pc_),
                left,
                np.where(pb <= pc_, up, upleft),
            )
            out = line - pred
        raw.append(filter_type)
        raw += (out & 0xFF).astype(np.uint8).tobytes()
        prev = line

    def chunk(ctype: bytes, data: bytes) -> bytes:
        body = ctype + data
        return struct.pack(">I", len(data)) + body + struct.pack(
            ">I", zlib.crc32(body) & 0xFFFFFFFF
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    return (
        _SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(raw), 6))
        + chunk(b"IEND", b"")
    )


def decode_png(payload: bytes) -> np.ndarray:
    """Decode 8-bit truecolor (RGB/RGBA) non-interlaced PNG to an
    (h, w, ch) uint8 array, undoing all five scanline predictors."""
    if payload[:8] != _SIG:
        raise ValueError("not a PNG payload")
    pos = 8
    w = h = color = None
    idat: list[bytes] = []
    while pos + 8 <= len(payload):
        (length,), ctype = struct.unpack_from(">I", payload, pos), payload[
            pos + 4 : pos + 8
        ]
        data = payload[pos + 8 : pos + 8 + length]
        if ctype == b"IHDR":
            w, h, bitd, color, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", data
            )
            if bitd != 8 or color not in (2, 6) or comp or filt or interlace:
                raise ValueError(
                    "unsupported PNG variant (need 8-bit RGB/RGBA, "
                    f"non-interlaced; got depth={bitd} color={color} "
                    f"interlace={interlace})"
                )
        elif ctype == b"IDAT":
            idat.append(data)
        elif ctype == b"IEND":
            break
        pos += 12 + length
    if w is None or not idat:
        raise ValueError("truncated PNG (no IHDR/IDAT)")
    ch = 3 if color == 2 else 4
    stride = w * ch
    raw = np.frombuffer(zlib.decompress(b"".join(idat)), np.uint8)
    if len(raw) != h * (stride + 1):
        raise ValueError("PNG scanline payload length mismatch")
    raw = raw.reshape(h, stride + 1)
    filters = raw[:, 0]
    lines = raw[:, 1:].astype(np.int32).reshape(h, w, ch)
    out = np.empty((h, w, ch), np.int32)
    prev = np.zeros((w, ch), np.int32)
    for y in range(h):
        f = int(filters[y])
        line = lines[y]
        if f == 0:
            rec = line.copy()
        elif f == 1:  # Sub: cumulative left sum, mod 256
            rec = np.cumsum(line, axis=0) & 0xFF
        elif f == 2:  # Up
            rec = (line + prev) & 0xFF
        elif f == 3:  # Average: sequential in x, vector across channels
            rec = np.empty_like(line)
            left = np.zeros(ch, np.int32)
            for x in range(w):
                left = (line[x] + ((left + prev[x]) >> 1)) & 0xFF
                rec[x] = left
        elif f == 4:  # Paeth
            rec = np.empty_like(line)
            left = np.zeros(ch, np.int32)
            upleft = np.zeros(ch, np.int32)
            for x in range(w):
                up = prev[x]
                p = left + up - upleft
                pa_ = np.abs(p - left)
                pb = np.abs(p - up)
                pc_ = np.abs(p - upleft)
                pred = np.where(
                    (pa_ <= pb) & (pa_ <= pc_),
                    left,
                    np.where(pb <= pc_, up, upleft),
                )
                left = (line[x] + pred) & 0xFF
                rec[x] = left
                upleft = up
        else:
            raise ValueError(f"bad PNG filter type {f} on row {y}")
        out[y] = rec
        prev = rec
    return out.astype(np.uint8)


class PngFeatureStage(ImageFeatureStage):
    """Real decode override: features = [meanR, meanG, meanB, w/1000,
    h/1000, alpha_frac] zero-padded to ``dim`` (alpha_frac = 0 for RGB)."""

    def _decode_stub(self, payload: bytes) -> np.ndarray:
        px = decode_png(payload)
        h, w, ch = px.shape
        feats = np.zeros(self.dim, dtype=np.float64)
        feats[:3] = px[:, :, :3].reshape(-1, 3).mean(axis=0) / 255.0
        feats[3] = w / 1000.0
        feats[4] = h / 1000.0
        if ch == 4:
            feats[5] = float((px[:, :, 3] < 255).mean())
        return feats


class PngResizeStage(ImageResizeStage):
    """Real resample override: witness = md5 of the actually-resized PNG
    bytes (filter-0 re-encode, deterministic)."""

    def _resize_stub(self, payload: bytes, out_w: int, out_h: int) -> str:
        resized = nn_resample(decode_png(payload), out_w, out_h)
        return hashlib.md5(encode_png(resized)).hexdigest()
