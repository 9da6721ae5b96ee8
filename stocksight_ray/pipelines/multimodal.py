"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed by actor-pool ``map_batches`` stages.

The decode kernels themselves are STUBBED (no image/audio libraries in this
environment — each stage accepts a ``decoder`` callable and ships with a
deterministic fake used by tests).  The Ray-side contract is real:
  - schema: (id:int64, payload:binary, mime:string, meta:struct/json)
  - small batch sizes for wide binary rows (payload × batch_size × actor
    concurrency must fit the worker heap; default batch_size=16)
  - actor-pool stages: decoder state (codec tables, a model) is built once
    per actor in __init__
  - output layout: fixed-shape feature vectors as list<float32>, or resized
    payloads as binary, never Python objects.
"""

from __future__ import annotations

import hashlib
import json
from typing import Callable, Optional

import numpy as np
import pyarrow as pa

DEFAULT_BINARY_BATCH = 16


def fake_decode_image(payload: bytes) -> np.ndarray:
    """Deterministic stand-in for an image decoder: derive a (8, 8, 3) uint8
    'pixel' array from the payload bytes via sha256 expansion.  Replace with
    a real decoder (PIL/cv2) in production."""
    out = np.empty(8 * 8 * 3, dtype=np.uint8)
    h = payload or b""
    chunk = b""
    i = 0
    while i < out.size:
        chunk = hashlib.sha256(chunk + h).digest()
        take = min(len(chunk), out.size - i)
        out[i : i + take] = np.frombuffer(chunk[:take], dtype=np.uint8)
        i += take
    return out.reshape(8, 8, 3)


class ImageFeatureStage:
    """Actor-pool stage: payload binary → fixed-dim float32 feature vector.

    __init__ loads decoder/model state once per actor.  With the default
    stub decoder the 'features' are per-channel means/stds + a byte
    histogram — deterministic and shape-stable, which is what the pipeline
    contract (schema + resumability) needs tested."""

    FEATURE_DIM = 22

    def __init__(self, decoder: Optional[Callable[[bytes], np.ndarray]] = None):
        self.decode = decoder or fake_decode_image

    def __call__(self, batch: pa.Table) -> pa.Table:
        feats = []
        for payload in batch["payload"].to_pylist():
            try:
                img = self.decode(payload)
            except Exception:
                feats.append(np.zeros(self.FEATURE_DIM, dtype=np.float32))
                continue
            f = np.concatenate(
                [
                    img.mean(axis=(0, 1)),
                    img.std(axis=(0, 1)),
                    np.histogram(img, bins=16, range=(0, 256))[0].astype(np.float64)
                    / img.size,
                ]
            ).astype(np.float32)
            feats.append(f)
        return pa.table(
            {
                "id": batch["id"],
                "features": pa.array(
                    [f.tolist() for f in feats], pa.list_(pa.float32())
                ),
            }
        )


class FrameSampleStage:
    """Actor-pool stage: 'video' payload → first-N 'frames' as binary rows
    (flat_map-style expansion inside map_batches).  Real implementation
    would seek keyframes; the stub slices the payload deterministically."""

    def __init__(self, num_frames: int = 4, frame_bytes: int = 64,
                 decoder: Optional[Callable[[bytes, int, int], list]] = None):
        self.num_frames = num_frames
        self.frame_bytes = frame_bytes
        self.decoder = decoder

    def _frames(self, payload: bytes):
        if self.decoder is not None:
            return self.decoder(payload, self.num_frames, self.frame_bytes)
        p = payload or b""
        return [
            p[i * self.frame_bytes : (i + 1) * self.frame_bytes]
            for i in range(self.num_frames)
            if p[i * self.frame_bytes : (i + 1) * self.frame_bytes]
        ]

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, frame_idx, frames = [], [], []
        for rid, payload in zip(
            batch["id"].to_pylist(), batch["payload"].to_pylist()
        ):
            for fi, fr in enumerate(self._frames(payload)):
                ids.append(rid)
                frame_idx.append(fi)
                frames.append(fr)
        return pa.table(
            {
                "id": pa.array(ids, pa.int64()),
                "frame_idx": pa.array(frame_idx, pa.int32()),
                "frame": pa.array(frames, pa.binary()),
            }
        )


def audio_decode_stub(payload: bytes) -> np.ndarray:
    """STUB — a real build plugs soundfile/ffmpeg here."""
    raise NotImplementedError(
        "audio decoding requires an audio library not present in this "
        "environment; pass a decoder callable to AudioFeatureStage"
    )


class AudioFeatureStage:
    """Actor-pool stage contract for audio: payload → fixed-dim features.
    Decode is stubbed (NotImplementedError) unless a decoder is injected."""

    FEATURE_DIM = 8

    def __init__(self, decoder: Optional[Callable[[bytes], np.ndarray]] = None):
        self.decode = decoder or audio_decode_stub

    def __call__(self, batch: pa.Table) -> pa.Table:
        feats = []
        for payload in batch["payload"].to_pylist():
            wav = self.decode(payload)  # raises for the stub — by design
            f = np.asarray(
                [
                    wav.mean(), wav.std(), wav.min(), wav.max(),
                    np.abs(np.diff(wav)).mean() if wav.size > 1 else 0.0,
                    float(np.sqrt((wav.astype(np.float64) ** 2).mean())),
                    float(wav.size), 0.0,
                ],
                dtype=np.float32,
            )
            feats.append(f)
        return pa.table(
            {
                "id": batch["id"],
                "features": pa.array([f.tolist() for f in feats], pa.list_(pa.float32())),
            }
        )


def image_features(ds, *, concurrency: int = 4,
                   batch_size: int = DEFAULT_BINARY_BATCH,
                   decoder: Optional[Callable] = None):
    """payload binary → feature vectors; small batches because binary rows
    are wide (see module docstring)."""
    return ds.map_batches(
        ImageFeatureStage,
        fn_constructor_kwargs={"decoder": decoder},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


def sample_frames(ds, *, num_frames: int = 4, concurrency: int = 4,
                  batch_size: int = DEFAULT_BINARY_BATCH):
    return ds.map_batches(
        FrameSampleStage,
        fn_constructor_kwargs={"num_frames": num_frames},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


def synth_binary_table(n: int, seed: int = 3, payload_bytes: int = 256) -> pa.Table:
    """Deterministic synthetic binary-payload table for tests/benches."""
    ids = np.arange(n, dtype=np.int64)
    payloads = [
        hashlib.sha256(f"{seed}:{i}".encode()).digest() * (payload_bytes // 32 + 1)
        for i in range(n)
    ]
    payloads = [p[:payload_bytes] for p in payloads]
    metas = [json.dumps({"w": 8, "h": 8, "c": 3}) for _ in range(n)]
    return pa.table(
        {
            "id": pa.array(ids),
            "payload": pa.array(payloads, pa.binary()),
            "mime": pa.array(["image/fake"] * n, pa.string()),
            "meta": pa.array(metas, pa.string()),
        }
    )


class ImageResizeStage:
    """Actor-pool stage: payload binary → resized pixel array (flattened
    uint8 list column + out_w/out_h).  The decode is the stub (no image
    libs in this environment, module docstring); the RESIZE itself is a
    real vectorized block-mean / nearest-neighbor kernel over the decoded
    (H, W, C) array, so the Ray-side contract — schema, batch size, actor
    state in __init__, deterministic output — is fully exercised."""

    def __init__(self, out_w: int = 4, out_h: int = 4,
                 decoder: Optional[Callable[[bytes], np.ndarray]] = None):
        self.decode = decoder or fake_decode_image
        self.out_w = out_w
        self.out_h = out_h

    def _resize(self, img: np.ndarray) -> np.ndarray:
        h, w, c = img.shape
        if h % self.out_h == 0 and w % self.out_w == 0:
            # exact block mean (antialiased downscale)
            return (
                img.reshape(self.out_h, h // self.out_h,
                            self.out_w, w // self.out_w, c)
                .mean(axis=(1, 3))
                .astype(np.uint8)
            )
        # nearest neighbor for non-divisible targets
        yi = (np.arange(self.out_h) * h // self.out_h)
        xi = (np.arange(self.out_w) * w // self.out_w)
        return img[yi][:, xi]

    def __call__(self, batch: pa.Table) -> pa.Table:
        pixels = []
        for payload in batch["payload"].to_pylist():
            try:
                img = self.decode(payload)
                pixels.append(self._resize(img).reshape(-1).tolist())
            except Exception:
                pixels.append(None)
        n = batch.num_rows
        return pa.table({
            "id": batch["id"],
            "pixels": pa.array(pixels, pa.list_(pa.uint8())),
            "out_w": pa.array([self.out_w] * n, pa.int32()),
            "out_h": pa.array([self.out_h] * n, pa.int32()),
        })


def resize_images(ds, *, out_w: int = 4, out_h: int = 4, concurrency: int = 4,
                  batch_size: int = DEFAULT_BINARY_BATCH,
                  decoder: Optional[Callable] = None):
    """payload binary → resized pixels; actor pool, small binary batches."""
    return ds.map_batches(
        ImageResizeStage,
        fn_constructor_kwargs={
            "out_w": out_w, "out_h": out_h, "decoder": decoder,
        },
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )
