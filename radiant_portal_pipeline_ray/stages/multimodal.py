"""Multimodal (image/audio/video) stages: opaque ``binary`` payload columns
with typed metadata, processed by actor-pool ``map_batches`` stages.

The decode kernels themselves are STUBBED (this container ships no
image/audio codecs — Pillow/ffmpeg/torchaudio are absent); the Ray-side
plumbing is real and tested: schema contracts, batch sizing for wide binary
rows, actor signatures, and output layout. Swap ``_decode_stub`` for a real
codec by subclassing and overriding one method.

Design notes for 100 TB payloads:
- keep these stages in ``batch_format="pyarrow"`` (binary columns do not
  round-trip pandas cleanly) with SMALL ``batch_size`` (payload × batch ×
  concurrency must fit the worker heap — guide "Memory-aware"),
- decode once, emit compact features, DROP the payload column before any
  shuffle (project-before-shuffle, same rule as dropping ``html`` early).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

#: schema contract for a media table
MEDIA_SCHEMA = pa.schema(
    [
        pa.field("media_id", pa.int64()),
        pa.field("payload", pa.binary()),
        pa.field("mime", pa.string()),
        pa.field("width", pa.int32()),
        pa.field("height", pa.int32()),
    ]
)

FEATURE_DIM = 16


class DecodeError(NotImplementedError):
    pass


class ImageFeatureStage:
    """Actor-pool stage: payload binary → fixed-dim feature vector.

    ``strict=True`` raises ``DecodeError`` (clearly-marked stub boundary);
    the default deterministic fake derives features from the md5 digest of
    the payload — exactly reproducible by any SQL engine's ``md5()``, so the
    whole pipeline (not just row counts) is oracle-checkable while the real
    codec stays a one-method override.
    """

    def __init__(self, strict: bool = False, dim: int = FEATURE_DIM):
        self.strict = strict
        self.dim = dim
        # real implementations load their model/codec HERE, once per actor

    def _decode_stub(self, payload: bytes) -> np.ndarray:
        if self.strict:
            raise DecodeError(
                "image decode requires a codec not present in this environment; "
                "override ImageFeatureStage._decode_stub with a real decoder"
            )
        digest = hashlib.md5(payload).digest()[: self.dim]
        # (byte - 127.5)/128 values are exact dyadic rationals — identical in
        # float64 here and DOUBLE in the SQL oracle
        return (np.frombuffer(digest, dtype=np.uint8).astype(np.float64) - 127.5) / 128.0

    def __call__(self, batch: pa.Table) -> pa.Table:
        feats = []
        for payload in batch.column("payload").to_pylist():
            feats.append(
                None if payload is None else self._decode_stub(payload).tolist()
            )
        out = batch.drop_columns(["payload"])  # project before any shuffle
        return out.append_column(
            pa.field("features", pa.list_(pa.float64())),
            pa.array(feats, type=pa.list_(pa.float64())),
        )


class FrameSampleStage:
    """Video-shaped stub: emit one row per sampled frame offset (flat-map
    1→N, CSQ-explode shape). Frame payload decode is stubbed; offsets and
    row-explosion plumbing are real."""

    def __init__(self, every_n_bytes: int = 1024, max_frames: int = 8):
        self.every = every_n_bytes
        self.max_frames = max_frames

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, frame_no, offsets = [], [], []
        mids = batch.column("media_id").to_pylist()
        for i, payload in enumerate(batch.column("payload").to_pylist()):
            if payload is None:
                continue
            n = min(self.max_frames, max(1, len(payload) // self.every))
            for f in range(n):
                ids.append(mids[i])
                frame_no.append(f)
                offsets.append(f * self.every)
        return pa.table(
            {
                "media_id": pa.array(ids, type=pa.int64()),
                "frame_no": pa.array(frame_no, type=pa.int32()),
                "byte_offset": pa.array(offsets, type=pa.int64()),
            }
        )


def synth_media_table(n: int, seed: int = 3) -> pa.Table:
    """Deterministic fake media table for tests/benchmarks."""
    rng = np.random.default_rng(seed)
    payloads = [rng.integers(0, 256, size=int(s), dtype=np.uint8).tobytes()
                for s in rng.integers(512, 8192, size=n)]
    return pa.table(
        {
            "media_id": pa.array(range(n), type=pa.int64()),
            "payload": pa.array(payloads, type=pa.binary()),
            "mime": pa.array(["image/fake"] * n),
            "width": pa.array(rng.integers(16, 256, n).astype(np.int32)),
            "height": pa.array(rng.integers(16, 256, n).astype(np.int32)),
        }
    )


class ImageResizeStage:
    """Actor-pool stage: aspect-preserving resize of a binary image payload
    into a target box (decode/resample kernel stubbed; the dimension
    arithmetic, schema contract and payload-drop discipline are real).

    Output dims fit the LONGEST side to the box in exact integer floor
    arithmetic — ``out = max(1, side*target // max(w, h))`` — and the
    stubbed "resized payload" is witnessed by a deterministic signature
    ``md5(md5(payload) + '-' + out_wxout_h)``, so a SQL oracle can check
    every value. ``strict=True`` raises at the stub boundary."""

    def __init__(self, target_w: int = 224, target_h: int = 224, strict: bool = False):
        self.tw, self.th, self.strict = target_w, target_h, strict
        # real implementations initialize their codec/resampler HERE

    def _resize_stub(self, payload: bytes, out_w: int, out_h: int) -> str:
        if self.strict:
            raise DecodeError(
                "image resize requires a codec not present in this "
                "environment; override ImageResizeStage._resize_stub"
            )
        inner = hashlib.md5(payload).hexdigest()
        return hashlib.md5(f"{inner}-{out_w}x{out_h}".encode()).hexdigest()

    def __call__(self, batch: pa.Table) -> pa.Table:
        w = batch.column("width").to_numpy(zero_copy_only=False).astype(np.int64)
        h = batch.column("height").to_numpy(zero_copy_only=False).astype(np.int64)
        long_side = np.maximum(np.maximum(w, h), 1)
        # NOTE target box is square here (tw == th fits either orientation);
        # exact integer floor keeps the SQL oracle bit-identical
        out_w = np.maximum(1, (w * self.tw) // long_side)
        out_h = np.maximum(1, (h * self.th) // long_side)
        sigs = [
            None if p is None else self._resize_stub(p, int(ow), int(oh))
            for p, ow, oh in zip(
                batch.column("payload").to_pylist(), out_w, out_h
            )
        ]
        return pa.table(
            {
                "media_id": batch.column("media_id"),
                "width": pa.array(w, type=pa.int64()),
                "height": pa.array(h, type=pa.int64()),
                "out_w": pa.array(out_w, type=pa.int64()),
                "out_h": pa.array(out_h, type=pa.int64()),
                "resized_sig": pa.array(sigs, type=pa.string()),
            }
        )  # payload dropped: project-before-shuffle
