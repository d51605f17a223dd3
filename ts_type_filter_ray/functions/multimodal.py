"""Multimodal columns: opaque ``binary`` payloads with typed metadata,
decoded / feature-extracted by actor-pool ``map_batches`` stages.

The image/audio codec libraries are NOT in this container, so the decode
kernels are STUBS: :class:`MediaDecodeStage` accepts a pluggable decoder;
the default :func:`real_decode` raises ``NotImplementedError`` with the
integration note, and :class:`FakeDecoder` is a deterministic stand-in
(blake2b-seeded features) so the Ray-side plumbing — schema, batch
sizing, actor signature, output layout — is real and tested.

Schema: ``item_id:int64, kind:string (image|audio|video),
payload:binary, meta:string (JSON: width/height/sample_rate/...)``.

Scale notes: payloads are large → small ``batch_size`` (default 16) and
``batch_format="pyarrow"`` (binary columns do not round-trip pandas
cleanly); one decode actor per CPU; outputs written partitioned per
input shard.
"""

from __future__ import annotations

import hashlib
import json

import numpy as np
import pyarrow as pa
from ray.data import Dataset

FEATURE_DIM = 8


def real_decode(payload: bytes, kind: str, meta: dict) -> np.ndarray:
    """STUB — real decoding needs Pillow / torchaudio / pyav, none of
    which ship in this container. Swap in via
    ``MediaDecodeStage(decoder=...)`` when available."""
    raise NotImplementedError(
        "media decoding requires image/audio codec libraries not present "
        "in this environment; inject a decoder into MediaDecodeStage")


class FakeDecoder:
    """Deterministic stand-in decoder: payload bytes → FEATURE_DIM float32
    features derived from a blake2b digest. Stable across processes."""

    def __call__(self, payload: bytes, kind: str, meta: dict) -> np.ndarray:
        digest = hashlib.blake2b(payload, digest_size=4 * FEATURE_DIM).digest()
        raw = np.frombuffer(digest, dtype=np.uint32).astype(np.float64)
        return (raw / np.float64(2**32)).astype(np.float32)


class MediaDecodeStage:
    """Actor-pool stage: decode payloads → feature vectors.

    The decoder is constructed ONCE per actor (model-load analog); each
    batch decodes payloads and emits ``(item_id, kind, n_bytes,
    features:list<float>)``.
    """

    def __init__(self, decoder=None):
        self._decode = decoder if decoder is not None else real_decode

    def __call__(self, batch: pa.Table) -> pa.Table:
        feats, sizes = [], []
        for item in batch.to_pylist():
            meta = json.loads(item.get("meta") or "{}")
            payload = item["payload"]
            sizes.append(len(payload))
            feats.append(self._decode(payload, item["kind"], meta).tolist())
        return pa.table({
            "item_id": batch["item_id"],
            "kind": batch["kind"],
            "n_bytes": pa.array(sizes, type=pa.int64()),
            "features": pa.array(feats, type=pa.list_(pa.float32())),
        })


def decode_media(ds: Dataset, decoder=None, batch_size: int = 16,
                 concurrency=(1, 8)) -> Dataset:
    return ds.map_batches(MediaDecodeStage, fn_constructor_args=(decoder,),
                          batch_format="pyarrow", batch_size=batch_size,
                          concurrency=concurrency)


class FrameSampleStage:
    """Actor-pool stage: sample every k-th "frame" of a video payload.

    Real frame extraction is stubbed the same way as decode; the fake
    treats the payload as a byte stream chunked into fixed-size frames —
    the partitioning/batching shape is what matters here.
    """

    def __init__(self, every_k: int = 10, frame_bytes: int = 256):
        self._k = every_k
        self._frame_bytes = frame_bytes

    def __call__(self, batch: pa.Table) -> pa.Table:
        item_ids, frame_idx, frames = [], [], []
        for item in batch.to_pylist():
            payload = item["payload"]
            n_frames = max(1, len(payload) // self._frame_bytes)
            for f in range(0, n_frames, self._k):
                item_ids.append(item["item_id"])
                frame_idx.append(f)
                frames.append(payload[f * self._frame_bytes:
                                      (f + 1) * self._frame_bytes])
        return pa.table({
            "item_id": pa.array(item_ids, type=pa.int64()),
            "frame_idx": pa.array(frame_idx, type=pa.int32()),
            "frame": pa.array(frames, type=pa.binary()),
        })


def frame_sample(ds: Dataset, every_k: int = 10, frame_bytes: int = 256,
                 batch_size: int = 16, concurrency=(1, 8)) -> Dataset:
    """Video payloads → sampled frames (flat_map shape: one row per
    sampled frame)."""
    return ds.map_batches(FrameSampleStage,
                          fn_constructor_args=(every_k, frame_bytes),
                          batch_format="pyarrow", batch_size=batch_size,
                          concurrency=concurrency)


def real_resize(pixels: np.ndarray, th: int, tw: int) -> np.ndarray:
    """STUB — real image resampling needs Pillow/opencv, not present in
    this container. Inject a kernel into ResizeStage when available."""
    raise NotImplementedError(
        "image resizing requires codec/imaging libraries not present in "
        "this environment; inject a kernel into ResizeStage")


def _nearest_resize(pixels: np.ndarray, th: int, tw: int) -> np.ndarray:
    """Deterministic stand-in kernel: nearest-neighbor subsample of a 2-D
    byte grid (the vectorized index arithmetic IS the real shape; only
    the interpolation quality is fake)."""
    h, w = pixels.shape
    ri = (np.arange(th) * h) // th
    ci = (np.arange(tw) * w) // tw
    return pixels[ri[:, None], ci[None, :]]


class ResizeStage:
    """Actor-pool stage: resize image payloads to (target_h, target_w).

    The fake path interprets the payload as a row-major byte grid whose
    width rides in ``meta`` (falling back to a square-ish guess) —
    schema, batch sizing and the vectorized index arithmetic are real;
    swap ``kernel=`` for a Pillow/opencv resampler when available.
    Output: (item_id, height, width, resized:binary).
    """

    def __init__(self, target_h: int = 16, target_w: int = 16, kernel=None):
        self._th = target_h
        self._tw = target_w
        self._kernel = kernel if kernel is not None else _nearest_resize

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, outs = [], []
        for item in batch.to_pylist():
            payload = item["payload"]
            meta = json.loads(item.get("meta") or "{}")
            w = int(meta.get("width", 0)) or max(1, int(len(payload) ** 0.5))
            h = max(1, len(payload) // w)
            grid = np.frombuffer(payload[:h * w], dtype=np.uint8).reshape(h, w)
            outs.append(self._kernel(grid, self._th, self._tw).tobytes())
            ids.append(item["item_id"])
        n = len(ids)
        return pa.table({
            "item_id": pa.array(ids, type=pa.int64()),
            "height": pa.array([self._th] * n, type=pa.int32()),
            "width": pa.array([self._tw] * n, type=pa.int32()),
            "resized": pa.array(outs, type=pa.binary()),
        })


def resize_media(ds: Dataset, target_h: int = 16, target_w: int = 16,
                 kernel=None, batch_size: int = 16,
                 concurrency=(1, 8)) -> Dataset:
    return ds.map_batches(ResizeStage,
                          fn_constructor_args=(target_h, target_w, kernel),
                          batch_format="pyarrow", batch_size=batch_size,
                          concurrency=concurrency)


def synthesize_media_table(n: int, seed: int = 42) -> pa.Table:
    """Deterministic fake media rows for plumbing tests."""
    import random
    rng = random.Random(seed)
    kinds = ["image", "audio", "video"]
    rows = {"item_id": [], "kind": [], "payload": [], "meta": []}
    for i in range(n):
        kind = kinds[i % 3]
        size = rng.randint(200, 4000)
        rows["item_id"].append(i)
        rows["kind"].append(kind)
        rows["payload"].append(rng.randbytes(size))
        rows["meta"].append(json.dumps({"n_bytes": size, "kind": kind}))
    return pa.table({
        "item_id": pa.array(rows["item_id"], type=pa.int64()),
        "kind": pa.array(rows["kind"], type=pa.string()),
        "payload": pa.array(rows["payload"], type=pa.binary()),
        "meta": pa.array(rows["meta"], type=pa.string()),
    })
