"""Multimodal column plumbing: image/audio/video ride as opaque binary
columns with typed metadata; decode / feature-extract / resize /
frame-sample are actor-pool map_batches stages.

The container has no media libraries (no PIL/ffmpeg/torchvision), so
the DECODE KERNEL is stubbed: ``backend="stub"`` produces a
deterministic fake decode (seeded from the payload bytes), and
``backend="real"`` raises NotImplementedError at actor construction
with the exact dependency needed. Everything AROUND the kernel — the
schema contract, batch sizing for large binary payloads, actor
signature, output layout — is real and tested (tests/test_multimodal).

Schema contract:

    media: (media_id:int64, kind:string in {image,audio,video},
            payload:binary, meta:string json {width,height,...})

Scale notes: binary payloads dominate block size -> small batch_size
(default 32) and pyarrow batch format end-to-end (binary columns do
not survive pandas round-trips cleanly); feature outputs drop the
payload column immediately so raw bytes never travel past the decode
stage.
"""

from __future__ import annotations

import json
import zlib

import numpy as np
import pyarrow as pa

FEATURE_DIM = 32


class MediaDecoder:
    """Actor-pool decode/feature stage. __init__ loads the (stub) model
    once per actor; __call__ maps a batch of payloads to fixed-dim
    feature vectors + decoded metadata."""

    def __init__(self, backend: str = "stub", feature_dim: int = FEATURE_DIM):
        if backend != "stub":
            raise NotImplementedError(
                "real media decoding needs PIL/ffmpeg, which are not in "
                "this environment; use backend='stub'"
            )
        self.feature_dim = feature_dim
        # stand-in for model load: a fixed projection matrix
        rng = np.random.default_rng(13)
        self.proj = rng.standard_normal((256, feature_dim))

    def _fake_decode(self, payload: bytes) -> np.ndarray:
        """Deterministic pseudo-decode: byte histogram of the payload
        (a real backend would return pixels/samples here)."""
        hist = np.bincount(
            np.frombuffer(payload, dtype=np.uint8), minlength=256
        ).astype(np.float64)
        n = hist.sum()
        return hist / n if n else hist

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("media_id").to_numpy()
        kinds = batch.column("kind").to_pylist()
        payloads = batch.column("payload").to_pylist()
        metas = batch.column("meta").to_pylist()
        feats = np.stack([self._fake_decode(p) @ self.proj for p in payloads])
        sizes = np.fromiter((len(p) for p in payloads), dtype=np.int64,
                            count=len(payloads))
        checksums = np.fromiter((zlib.crc32(p) for p in payloads),
                                dtype=np.int64, count=len(payloads))
        widths = []
        for m in metas:
            try:
                widths.append(int(json.loads(m).get("width", -1)))
            except (json.JSONDecodeError, TypeError):
                widths.append(-1)
        # payload column intentionally dropped here
        return pa.table(
            {
                "media_id": pa.array(ids, type=pa.int64()),
                "kind": pa.array(kinds, type=pa.string()),
                "bytes_len": pa.array(sizes),
                "checksum": pa.array(checksums),
                "width": pa.array(widths, type=pa.int64()),
                "features": pa.array(
                    [f.tolist() for f in feats], type=pa.list_(pa.float64())
                ),
            }
        )


def media_features(ds, *, concurrency: int = 2, batch_size: int = 32,
                   backend: str = "stub"):
    """media table -> feature table. Small batch_size: payloads are the
    block-size driver (ray_guide memory pitfalls)."""
    from rse_ray.util import clamp_pool

    concurrency = clamp_pool(concurrency)
    return ds.map_batches(
        MediaDecoder,
        fn_constructor_kwargs={"backend": backend},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


def make_fake_media_table(n: int = 64, seed: int = 5) -> pa.Table:
    """Deterministic fake media corpus for tests/demos."""
    rng = np.random.default_rng(seed)
    kinds = ["image", "audio", "video"]
    rows = {"media_id": [], "kind": [], "payload": [], "meta": []}
    for i in range(n):
        kind = kinds[i % 3]
        payload = rng.integers(0, 256, size=int(rng.integers(64, 2048))).astype(
            np.uint8
        ).tobytes()
        rows["media_id"].append(i)
        rows["kind"].append(kind)
        rows["payload"].append(payload)
        rows["meta"].append(json.dumps({"width": int(rng.integers(16, 512)),
                                        "height": int(rng.integers(16, 512))}))
    return pa.table(
        {
            "media_id": pa.array(rows["media_id"], type=pa.int64()),
            "kind": pa.array(rows["kind"], type=pa.string()),
            "payload": pa.array(rows["payload"], type=pa.binary()),
            "meta": pa.array(rows["meta"], type=pa.string()),
        }
    )
