"""A REAL, dependency-free image codec exercising the multimodal override
points: 24-bit uncompressed BMP encode/decode in pure numpy/struct, plus the
two documented one-method subclasses —

- ``BmpFeatureStage`` overrides ``ImageFeatureStage._decode_stub`` with a
  real pixel decode (features = mean RGB + dims),
- ``BmpResizeStage`` overrides ``ImageResizeStage._resize_stub`` with a real
  nearest-neighbor resample (decode → index → re-encode → md5 witness).

This is the proof that the stub boundary is a working extension seam, not
dead plumbing: swap ``_decode_bmp`` for Pillow/libjpeg in a real deployment
and nothing else changes (schema, batch sizing, actor signature, payload-drop
discipline all inherited). Reference analogue: the per-record decode step of
`radiant/tasks/vcf/snv/germline/occurrence.py` — heavy codec state per worker,
compact typed features out.
"""

from __future__ import annotations

import hashlib
import struct

import numpy as np

from radiant_portal_pipeline_ray.stages.multimodal import (
    ImageFeatureStage,
    ImageResizeStage,
)


def encode_bmp(pixels: np.ndarray) -> bytes:
    """24-bit uncompressed bottom-up BMP from an (h, w, 3) RGB uint8 array."""
    h, w, _ = pixels.shape
    row_raw = w * 3
    pad = (-row_raw) % 4
    img_size = (row_raw + pad) * h
    header = struct.pack("<2sIHHI", b"BM", 14 + 40 + img_size, 0, 0, 54)
    info = struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, img_size, 2835, 2835, 0, 0
    )
    rows = []
    for y in range(h - 1, -1, -1):  # bottom-up row order
        bgr = pixels[y, :, ::-1].tobytes()
        rows.append(bgr + b"\x00" * pad)
    return header + info + b"".join(rows)


def decode_bmp(payload: bytes) -> np.ndarray:
    """Parse the subset emitted by :func:`encode_bmp`: 24bpp BI_RGB
    bottom-up. Returns an (h, w, 3) RGB uint8 array."""
    magic, _, _, _, offset = struct.unpack_from("<2sIHHI", payload, 0)
    if magic != b"BM":
        raise ValueError("not a BMP payload")
    _, w, h, _, bpp, comp = struct.unpack_from("<IiiHHI", payload, 14)
    if bpp != 24 or comp != 0 or h <= 0:
        raise ValueError(f"unsupported BMP variant (bpp={bpp}, comp={comp}, h={h})")
    stride = (w * 3 + 3) // 4 * 4
    rows = np.frombuffer(payload, dtype=np.uint8, count=stride * h, offset=offset)
    rows = rows.reshape(h, stride)[:, : w * 3].reshape(h, w, 3)
    return rows[::-1, :, ::-1].copy()  # flip to top-down, BGR → RGB


def nn_resample(px: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    """Nearest-neighbor resample via pure index arithmetic (deterministic)."""
    h, w, _ = px.shape
    ys = (np.arange(out_h) * h) // out_h
    xs = (np.arange(out_w) * w) // out_w
    return px[ys][:, xs]


class BmpFeatureStage(ImageFeatureStage):
    """Real decode override: features = [meanR, meanG, meanB, w/1000, h/1000]
    zero-padded to ``dim``."""

    def _decode_stub(self, payload: bytes) -> np.ndarray:
        px = decode_bmp(payload)
        h, w, _ = px.shape
        feats = np.zeros(self.dim, dtype=np.float64)
        feats[:3] = px.reshape(-1, 3).mean(axis=0) / 255.0
        feats[3] = w / 1000.0
        feats[4] = h / 1000.0
        return feats


class BmpResizeStage(ImageResizeStage):
    """Real resample override: the witness signature is the md5 of the
    actually-resized BMP bytes (vs the stub's payload-hash chain)."""

    def _resize_stub(self, payload: bytes, out_w: int, out_h: int) -> str:
        resized = nn_resample(decode_bmp(payload), out_w, out_h)
        return hashlib.md5(encode_bmp(resized)).hexdigest()
