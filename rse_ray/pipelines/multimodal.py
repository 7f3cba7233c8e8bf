"""Multimodal column plumbing: image/audio/video ride as opaque binary
columns with typed metadata; decode / feature-extract / resize /
frame-sample are actor-pool map_batches stages.

The container has no media libraries (no PIL/ffmpeg/torchvision).
Two decode paths exist:

  * ``backend="real"`` — an actual decode with pure numpy + stdlib
    zlib (functions/media.py + functions/jpeg.py): 24-bit BMP,
    compressed 8-bit RGB PNG, and baseline-sequential JPEG images
    (dispatched on container magic) and PCM s16 WAV audio. Bytes go
    in, pixel/sample arrays come out, and the features are computed
    from the decoded arrays; a golden features parquet written by
    the GENERATOR (from the raw arrays pre-encode — for the lossy
    JPEG rows, from ``jpeg_reference_pixels``, the mathematically
    defined quant->dequant->IDCT reconstruction computed before any
    bytes exist) oracles the full encode->ship->decode->feature
    round trip bit-exactly.
  * ``backend="stub"`` — a deterministic fake decode (byte histogram)
    standing in for formats whose codecs aren't in the container
    (MP3/H.264); exercised for plumbing tests.

Video decode remains stubbed (no pure-numpy container is honest for
video); its frame-sample plumbing runs through the stub path.

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
        if backend not in ("stub",):
            raise NotImplementedError(
                "MediaDecoder is the stub path; use RealMediaDecoder / "
                "media_features(backend='real') for BMP/PNG/JPEG/WAV "
                "decode"
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


class RealMediaDecoder:
    """Actor-pool REAL decode stage: BMP/PNG pixels / WAV samples out
    of the payload bytes (functions/media.py), features computed from
    the decoded arrays. Output schema is shared with the golden
    features parquet the fixture generator writes."""

    def __init__(self) -> None:
        # decode kernels bound once per actor
        from rse_ray.functions.media import (
            decode_image,
            decode_wav,
            value_features,
        )

        self._decode_image = decode_image
        self._decode_wav = decode_wav
        self._features = value_features

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("media_id").to_numpy()
        kinds = batch.column("kind").to_pylist()
        payloads = batch.column("payload").to_pylist()
        rows = {"media_id": [], "kind": [], "n_values": [], "v_mean": [],
                "v_std": [], "v_min": [], "v_max": [], "width": [],
                "height": []}
        for mid, kind, payload in zip(ids, kinds, payloads):
            if kind == "image":
                px = self._decode_image(payload)
                f = self._features(px)
                w, h = px.shape[1], px.shape[0]
            elif kind == "audio":
                samples, _rate = self._decode_wav(payload)
                f = self._features(samples)
                w, h = -1, -1
            else:
                raise NotImplementedError(
                    f"real decode for kind={kind!r} (use the stub path)"
                )
            rows["media_id"].append(int(mid))
            rows["kind"].append(kind)
            rows["width"].append(w)
            rows["height"].append(h)
            for k, v in f.items():
                rows[k].append(v)
        return pa.table(
            {"media_id": pa.array(rows["media_id"], type=pa.int64()),
             "kind": pa.array(rows["kind"], type=pa.string()),
             "n_values": pa.array(rows["n_values"], type=pa.int64()),
             "v_mean": pa.array(rows["v_mean"], type=pa.float64()),
             "v_std": pa.array(rows["v_std"], type=pa.float64()),
             "v_min": pa.array(rows["v_min"], type=pa.int64()),
             "v_max": pa.array(rows["v_max"], type=pa.int64()),
             "width": pa.array(rows["width"], type=pa.int64()),
             "height": pa.array(rows["height"], type=pa.int64())}
        )


def media_features(ds, *, concurrency: int = 2, batch_size: int = 32,
                   backend: str = "stub"):
    """media table -> feature table. Small batch_size: payloads are the
    block-size driver (ray_guide memory pitfalls)."""
    from rse_ray.util import clamp_pool

    concurrency = clamp_pool(concurrency)
    if backend == "real":
        return ds.map_batches(
            RealMediaDecoder,
            batch_format="pyarrow",
            batch_size=batch_size,
            concurrency=concurrency,
        )
    return ds.map_batches(
        MediaDecoder,
        fn_constructor_kwargs={"backend": backend},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


class ImagePHasher:
    """Actor-pool perceptual-hash stage: decode the image payload
    (real BMP/PNG decode) and emit the 64-bit DCT pHash as
    uint64-in-int64 bits. Non-image rows are dropped (phash is an
    image notion). Decode + hash kernels bind once per actor."""

    def __init__(self) -> None:
        from rse_ray.functions.media import decode_image, phash64

        self._decode = decode_image
        self._phash = phash64

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("media_id").to_numpy()
        kinds = batch.column("kind").to_pylist()
        payloads = batch.column("payload").to_pylist()
        out_ids, out_h = [], []
        for mid, kind, payload in zip(ids, kinds, payloads):
            if kind != "image":
                continue
            h = self._phash(self._decode(payload))
            out_ids.append(int(mid))
            out_h.append(np.int64(np.uint64(h)))
        return pa.table({"media_id": pa.array(out_ids, type=pa.int64()),
                         "phash": pa.array(out_h, type=pa.int64())})


def image_phash(ds, *, concurrency: int = 2, batch_size: int = 32):
    """media table -> (media_id, phash). Small batch_size: payloads
    drive block size."""
    from rse_ray.util import clamp_pool

    return ds.map_batches(ImagePHasher, batch_format="pyarrow",
                          batch_size=batch_size,
                          concurrency=clamp_pool(concurrency))


def image_dup_pairs(ds, *, max_hamming: int = 3,
                    num_parts: int | None = None):
    """Perceptual near-duplicate image pairs: pHash signatures fed
    through the SAME generic 64-bit banding engine as the text
    SimHash dedup (dedup.hash_dup_pairs — 4x16-bit prefix buckets,
    vectorized bucket self-merge, LUT popcount verify). Output
    (media_a, media_b, hamming), media_a < media_b."""
    from rse_ray.pipelines.dedup import hash_dup_pairs

    return hash_dup_pairs(image_phash(ds), id_col="media_id",
                          sig_col="phash", max_hamming=max_hamming,
                          num_parts=num_parts, n_rows=ds.count(),
                          out_cols=("media_a", "media_b"))


class AudioRms:
    """Actor-pool framewise-RMS stage: decode the WAV payload (real
    RIFF parse) and emit one row per frame — the audio
    feature-extract analog of ImageResizer. Kernels bind once per
    actor; frames are one strided matrix per clip (no per-frame
    Python)."""

    def __init__(self, frame: int = 256, hop: int = 128,
                 round_to: int = 6) -> None:
        from rse_ray.functions.media import decode_wav, rms_frames

        self._decode = decode_wav
        self._rms = rms_frames
        self.frame, self.hop = frame, hop
        self.scale = 10.0 ** round_to

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("media_id").to_numpy()
        kinds = batch.column("kind").to_pylist()
        payloads = batch.column("payload").to_pylist()
        o_id, o_fi, o_rms = [], [], []
        for mid, kind, payload in zip(ids, kinds, payloads):
            if kind != "audio":
                continue
            samples, _rate = self._decode(payload)
            r = self._rms(samples, self.frame, self.hop)
            r = np.floor(r * self.scale + 0.5) / self.scale  # rms >= 0
            o_id.extend([int(mid)] * len(r))
            o_fi.extend(range(len(r)))
            o_rms.extend(r.tolist())
        return pa.table({
            "media_id": pa.array(o_id, type=pa.int64()),
            "frame_idx": pa.array(o_fi, type=pa.int64()),
            "rms": pa.array(o_rms, type=pa.float64()),
        })


def audio_rms_windows(ds, *, frame: int = 256, hop: int = 128,
                      concurrency: int = 2, batch_size: int = 32):
    """media table -> (media_id, frame_idx, rms): framewise RMS
    energy over the REAL WAV decode — the first DSP step of an audio
    pipeline (VAD/loudness gating). Golden-oracled pre-encode like
    media_features; non-audio rows drop."""
    from rse_ray.util import clamp_pool

    return ds.map_batches(AudioRms, batch_format="pyarrow",
                          fn_constructor_kwargs={"frame": frame,
                                                 "hop": hop},
                          batch_size=batch_size,
                          concurrency=clamp_pool(concurrency))


def image_dup_clusters(ds, *, max_hamming: int = 3,
                       num_parts: int | None = None,
                       method: str = "union_find"):
    """(media_id, cluster_id) connected components over the verified
    pHash near-dup pair graph — the image-side twin of the text
    corpus's dup_clusters, sharing its component machinery (driver
    union-find over the PAIR LIST only, or distributed label_prop
    past one-process pair counts). cluster_id = min media_id."""
    import pandas as pd

    from rse_ray.pipelines.dedup import dup_clusters

    pairs = image_dup_pairs(ds, max_hamming=max_hamming,
                            num_parts=num_parts).map_batches(
        lambda b: b.rename_columns(["doc_a", "doc_b", "hamming"]),
        batch_format="pyarrow")
    if method != "label_prop":
        # union-find is BY DEFINITION single-process over the pair list
        pairs = pairs.to_pandas()
    out = dup_clusters(pairs=pairs, method=method, num_parts=num_parts)
    if isinstance(out, pd.DataFrame):
        return out.rename(columns={"doc_id": "media_id"})
    return out.map_batches(
        lambda b: b.rename_columns(["media_id", "cluster_id"]),
        batch_format="pyarrow")


def write_phash_fixture(out_dir: str, *, n_base: int = 48,
                        seed: int = 11) -> dict:
    """Deterministic image corpus with PLANTED perceptual near-dups:
    every 4th base image also ships a +1-brightness-corner copy (id =
    1000 + base id, pHash Hamming <= 2 — measured; distinct images
    sit >= 20 apart). Writes

        out_dir/media.parquet         (media_id, kind, payload, meta)
        out_dir/golden_phash.parquet  pHash computed from the RAW
                                      pixels BEFORE encoding

    Golden hashes never see the codec's serialization, so matching
    them proves the decode path; the planted pairs give the dup-pair
    query a non-empty, fully characterized answer. Bases at
    ``i % 4 == 3`` (never pair bases — pairs plant at ``i % 4 == 0``)
    ship as lossy baseline JPEG, whose golden phash derives from the
    pre-encode ``jpeg_reference_pixels`` reconstruction (the decoder
    must land on it bit-exactly). Idempotent via _DONE."""
    import json as _json
    import os

    import pyarrow.parquet as pq

    from rse_ray.functions.jpeg import encode_jpeg, jpeg_reference_pixels
    from rse_ray.functions.media import encode_bmp, encode_png, phash64

    marker = os.path.join(out_dir, "_DONE.json")
    if os.path.exists(marker):
        with open(marker) as f:
            return _json.load(f)
    os.makedirs(out_dir, exist_ok=True)
    rng = np.random.default_rng(seed)
    media = {"media_id": [], "kind": [], "payload": [], "meta": []}
    golden = {"media_id": [], "phash": []}

    def emit(mid: int, px: np.ndarray, fmt: str) -> None:
        media["media_id"].append(mid)
        media["kind"].append("image")
        if fmt == "jpeg":
            media["payload"].append(encode_jpeg(px, quality=75))
            hash_px = jpeg_reference_pixels(px, 75)
        else:
            media["payload"].append(
                encode_bmp(px) if fmt == "bmp" else encode_png(px))
            hash_px = px
        media["meta"].append(_json.dumps(
            {"width": px.shape[1], "height": px.shape[0], "format": fmt}))
        golden["media_id"].append(mid)
        golden["phash"].append(np.int64(np.uint64(phash64(hash_px))))

    for i in range(n_base):
        h = int(rng.integers(16, 48))
        w = int(rng.integers(16, 48))
        px = rng.integers(0, 256, size=(h, w, 3)).astype(np.uint8)
        emit(i, px, "jpeg" if i % 4 == 3
             else ("bmp" if i % 2 == 0 else "png"))
        if i % 4 == 0:
            px2 = px.copy()
            px2[:3, :3] = np.minimum(
                px2[:3, :3].astype(np.int16) + 1, 255).astype(np.uint8)
            emit(1000 + i, px2, "png" if i % 2 == 0 else "bmp")
    pq.write_table(
        pa.table({"media_id": pa.array(media["media_id"], type=pa.int64()),
                  "kind": pa.array(media["kind"], type=pa.string()),
                  "payload": pa.array(media["payload"], type=pa.binary()),
                  "meta": pa.array(media["meta"], type=pa.string())}),
        os.path.join(out_dir, "media.parquet"))
    pq.write_table(
        pa.table({"media_id": pa.array(golden["media_id"], type=pa.int64()),
                  "phash": pa.array(golden["phash"], type=pa.int64())}),
        os.path.join(out_dir, "golden_phash.parquet"))
    meta_out = {"n_base": n_base, "seed": seed, "dir": out_dir}
    with open(marker, "w") as f:
        _json.dump(meta_out, f)
    return meta_out


def write_real_media_fixture(out_dir: str, *, n: int = 96,
                             seed: int = 5) -> dict:
    """Deterministic REAL media corpus: BMP + PNG + baseline-JPEG
    images and WAV audio whose payloads are actual encoded containers
    (every third row is audio; image rows cycle the three codecs).
    Writes

        out_dir/media.parquet            (media_id, kind, payload, meta)
        out_dir/golden_features.parquet  features computed from the RAW
                                         arrays BEFORE encoding

    The pipeline decodes the payloads and recomputes the same features;
    matching the golden parquet proves the encode->decode round trip
    bit-exact (it is not circular: golden values never see the codec).
    Idempotent via a _DONE marker."""
    import json as _json
    import os

    import pyarrow.parquet as pq

    from rse_ray.functions.jpeg import encode_jpeg, jpeg_reference_pixels
    from rse_ray.functions.media import (
        encode_bmp,
        encode_png,
        encode_wav,
        rms_frames,
        value_features,
    )

    marker = os.path.join(out_dir, "_DONE.json")
    if os.path.exists(marker):
        with open(marker) as f:
            return _json.load(f)
    os.makedirs(out_dir, exist_ok=True)
    rng = np.random.default_rng(seed)
    media = {"media_id": [], "kind": [], "payload": [], "meta": []}
    golden = {"media_id": [], "kind": [], "n_values": [], "v_mean": [],
              "v_std": [], "v_min": [], "v_max": [], "width": [],
              "height": []}
    grms = {"media_id": [], "frame_idx": [], "rms": []}
    gtrans = {"media_id": [], "in_fmt": [], "in_bytes": [],
              "out_bytes": [], "width": [], "height": [],
              "out_crc32": []}
    for i in range(n):
        if i % 3 != 1:
            h = int(rng.integers(8, 48))
            w = int(rng.integers(8, 48))
            px = rng.integers(0, 256, size=(h, w, 3)).astype(np.uint8)
            # image rows alternate all three real codecs; JPEG is
            # lossy, so ITS golden features derive from the
            # pre-serialization reference reconstruction (the
            # serialization under test is lossless)
            fmt = ("bmp", "jpeg", "png")[(i // 3 + i) % 3]
            if fmt == "bmp":
                payload = encode_bmp(px)
                feats = value_features(px)
            elif fmt == "png":
                payload = encode_png(px)
                feats = value_features(px)
            else:
                payload = encode_jpeg(px, quality=75)
                feats = value_features(jpeg_reference_pixels(px, 75))
            kind, width, height = "image", w, h
            meta = {"width": w, "height": h, "format": fmt}
            if fmt == "jpeg":
                meta["quality"] = 75
            # pre-write transcode golden: what a decode->re-encode at
            # TRANSCODE_QUALITY must produce, byte-exactly (a decoder
            # of the payload lands on px, or on the JPEG reference
            # reconstruction for the lossy rows)
            ref_px = px if fmt != "jpeg" else jpeg_reference_pixels(
                px, 75)
            tout = encode_jpeg(ref_px, TRANSCODE_QUALITY)
            gtrans["media_id"].append(i)
            gtrans["in_fmt"].append(fmt)
            gtrans["in_bytes"].append(len(payload))
            gtrans["out_bytes"].append(len(tout))
            gtrans["width"].append(w)
            gtrans["height"].append(h)
            gtrans["out_crc32"].append(zlib.crc32(tout))
        else:
            ns = int(rng.integers(256, 4096))
            samples = rng.integers(-32768, 32768, size=ns).astype(np.int16)
            payload = encode_wav(samples, rate=8000)
            feats = value_features(samples)
            kind, width, height = "audio", -1, -1
            meta = {"n_samples": ns, "rate": 8000}
            # pre-encode framewise RMS goldens, rounded exactly like
            # the AudioRms stage (floor half-away, rms >= 0)
            r = np.floor(rms_frames(samples) * 1e6 + 0.5) / 1e6
            grms["media_id"].extend([i] * len(r))
            grms["frame_idx"].extend(range(len(r)))
            grms["rms"].extend(r.tolist())
        media["media_id"].append(i)
        media["kind"].append(kind)
        media["payload"].append(payload)
        media["meta"].append(_json.dumps(meta))
        golden["media_id"].append(i)
        golden["kind"].append(kind)
        golden["width"].append(width)
        golden["height"].append(height)
        for k, v in feats.items():
            golden[k].append(v)
    pq.write_table(
        pa.table(
            {"media_id": pa.array(media["media_id"], type=pa.int64()),
             "kind": pa.array(media["kind"], type=pa.string()),
             "payload": pa.array(media["payload"], type=pa.binary()),
             "meta": pa.array(media["meta"], type=pa.string())}
        ),
        os.path.join(out_dir, "media.parquet"),
    )
    pq.write_table(
        pa.table(
            {"media_id": pa.array(golden["media_id"], type=pa.int64()),
             "kind": pa.array(golden["kind"], type=pa.string()),
             "n_values": pa.array(golden["n_values"], type=pa.int64()),
             "v_mean": pa.array(golden["v_mean"], type=pa.float64()),
             "v_std": pa.array(golden["v_std"], type=pa.float64()),
             "v_min": pa.array(golden["v_min"], type=pa.int64()),
             "v_max": pa.array(golden["v_max"], type=pa.int64()),
             "width": pa.array(golden["width"], type=pa.int64()),
             "height": pa.array(golden["height"], type=pa.int64())}
        ),
        os.path.join(out_dir, "golden_features.parquet"),
    )
    pq.write_table(
        pa.table(
            {"media_id": pa.array(grms["media_id"], type=pa.int64()),
             "frame_idx": pa.array(grms["frame_idx"], type=pa.int64()),
             "rms": pa.array(grms["rms"], type=pa.float64())}
        ),
        os.path.join(out_dir, "golden_rms.parquet"),
    )
    pq.write_table(
        pa.table(
            {"media_id": pa.array(gtrans["media_id"], type=pa.int64()),
             "in_fmt": pa.array(gtrans["in_fmt"], type=pa.string()),
             "in_bytes": pa.array(gtrans["in_bytes"], type=pa.int64()),
             "out_bytes": pa.array(gtrans["out_bytes"],
                                   type=pa.int64()),
             "width": pa.array(gtrans["width"], type=pa.int64()),
             "height": pa.array(gtrans["height"], type=pa.int64()),
             "out_crc32": pa.array(gtrans["out_crc32"],
                                   type=pa.int64())}
        ),
        os.path.join(out_dir, "golden_transcode.parquet"),
    )
    meta_out = {"n": n, "seed": seed, "dir": out_dir}
    with open(marker, "w") as f:
        _json.dump(meta_out, f)
    return meta_out


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


class ImageResizer:
    """Actor-pool resize stage (task-listed multimodal op): decode ->
    nearest-neighbor resize to a fixed (out_h, out_w) -> features of
    the RESIZED pixels. Nearest-neighbor because its index math is
    deterministic across platforms — no interpolation-kernel drift to
    un-oracle the golden parquet."""

    def __init__(self, out_h: int = 16, out_w: int = 16) -> None:
        from rse_ray.functions.media import (
            decode_image,
            resize_nearest,
            value_features,
        )

        self.out_h, self.out_w = out_h, out_w
        self._decode = decode_image
        self._resize = resize_nearest
        self._features = value_features

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("media_id").to_numpy()
        payloads = batch.column("payload").to_pylist()
        rows = {"media_id": [], "n_values": [], "v_mean": [], "v_std": [],
                "v_min": [], "v_max": [], "width": [], "height": []}
        for mid, payload in zip(ids, payloads):
            px = self._resize(self._decode(payload), self.out_h, self.out_w)
            f = self._features(px)
            rows["media_id"].append(int(mid))
            rows["width"].append(self.out_w)
            rows["height"].append(self.out_h)
            for k, v in f.items():
                rows[k].append(v)
        return pa.table(
            {"media_id": pa.array(rows["media_id"], type=pa.int64()),
             "n_values": pa.array(rows["n_values"], type=pa.int64()),
             "v_mean": pa.array(rows["v_mean"], type=pa.float64()),
             "v_std": pa.array(rows["v_std"], type=pa.float64()),
             "v_min": pa.array(rows["v_min"], type=pa.int64()),
             "v_max": pa.array(rows["v_max"], type=pa.int64()),
             "width": pa.array(rows["width"], type=pa.int64()),
             "height": pa.array(rows["height"], type=pa.int64())}
        )


TRANSCODE_QUALITY = 50  # default target for corpus normalization


class ImageTranscoder:
    """Actor-pool transcode stage: decode ANY supported container
    (BMP/PNG/baseline JPEG, dispatched on magic) and re-encode as
    baseline JPEG at ``quality`` — the corpus-normalization op a
    multimodal training pipeline runs to collapse mixed crawl
    formats into one storage codec. Emits a size/identity report
    (media_id, in_fmt, in_bytes, out_bytes, width, height,
    out_crc32); with ``keep_payload=True`` the transcoded bytes ride
    along for a downstream sink. Codec kernels bind once per actor.

    Deterministic end-to-end: the fixture generator computes the
    SAME transcode pre-write (raw pixels -> encode_jpeg; for lossy
    JPEG inputs via jpeg_reference_pixels first), so out_bytes and
    out_crc32 oracle the full decode->re-encode path byte-exactly."""

    def __init__(self, quality: int = TRANSCODE_QUALITY,
                 keep_payload: bool = False) -> None:
        from rse_ray.functions.jpeg import encode_jpeg
        from rse_ray.functions.media import decode_image

        self._decode = decode_image
        self._encode = encode_jpeg
        self.quality = quality
        self.keep_payload = keep_payload

    @staticmethod
    def _fmt(payload: bytes) -> str:
        if payload[:2] == b"BM":
            return "bmp"
        if payload[:8] == b"\x89PNG\r\n\x1a\n":
            return "png"
        if payload[:2] == b"\xFF\xD8":
            return "jpeg"
        return "unknown"

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("media_id").to_numpy()
        kinds = batch.column("kind").to_pylist()
        payloads = batch.column("payload").to_pylist()
        rows = {"media_id": [], "in_fmt": [], "in_bytes": [],
                "out_bytes": [], "width": [], "height": [],
                "out_crc32": [], "payload": []}
        for mid, kind, payload in zip(ids, kinds, payloads):
            if kind != "image":
                continue
            px = self._decode(payload)
            out = self._encode(px, self.quality)
            rows["media_id"].append(int(mid))
            rows["in_fmt"].append(self._fmt(payload))
            rows["in_bytes"].append(len(payload))
            rows["out_bytes"].append(len(out))
            rows["width"].append(px.shape[1])
            rows["height"].append(px.shape[0])
            rows["out_crc32"].append(zlib.crc32(out))
            if self.keep_payload:
                rows["payload"].append(out)
        cols = {
            "media_id": pa.array(rows["media_id"], type=pa.int64()),
            "in_fmt": pa.array(rows["in_fmt"], type=pa.string()),
            "in_bytes": pa.array(rows["in_bytes"], type=pa.int64()),
            "out_bytes": pa.array(rows["out_bytes"], type=pa.int64()),
            "width": pa.array(rows["width"], type=pa.int64()),
            "height": pa.array(rows["height"], type=pa.int64()),
            "out_crc32": pa.array(rows["out_crc32"], type=pa.int64()),
        }
        if self.keep_payload:
            cols["payload"] = pa.array(rows["payload"],
                                       type=pa.binary())
        return pa.table(cols)


def transcode_images(ds, *, quality: int = TRANSCODE_QUALITY,
                     keep_payload: bool = False,
                     concurrency: int = 2, batch_size: int = 32):
    """media table -> per-image transcode report (and optionally the
    JPEG payloads): normalize a mixed BMP/PNG/JPEG corpus to one
    codec. Small batch_size: payloads drive block size."""
    from rse_ray.util import clamp_pool

    return ds.map_batches(
        ImageTranscoder, batch_format="pyarrow",
        fn_constructor_kwargs={"quality": quality,
                               "keep_payload": keep_payload},
        batch_size=batch_size, concurrency=clamp_pool(concurrency))


class VideoFrameSampler:
    """Actor-pool frame-sampling stage (task-listed multimodal op):
    decode the RVID container, keep every k-th frame, one output row
    per SAMPLED frame with features of that frame. flat-map shape —
    a video yields ceil(n_frames / k) rows."""

    def __init__(self, every_k: int = 4) -> None:
        from rse_ray.functions.media import decode_video, value_features

        self.k = every_k
        self._decode = decode_video
        self._features = value_features

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("media_id").to_numpy()
        payloads = batch.column("payload").to_pylist()
        rows = {"media_id": [], "frame_idx": [], "n_values": [],
                "v_mean": [], "v_std": [], "v_min": [], "v_max": [],
                "width": [], "height": []}
        for mid, payload in zip(ids, payloads):
            frames = self._decode(payload)
            for fi in range(0, len(frames), self.k):
                px = frames[fi]
                f = self._features(px)
                rows["media_id"].append(int(mid))
                rows["frame_idx"].append(fi)
                rows["width"].append(px.shape[1])
                rows["height"].append(px.shape[0])
                for k2, v in f.items():
                    rows[k2].append(v)
        return pa.table(
            {"media_id": pa.array(rows["media_id"], type=pa.int64()),
             "frame_idx": pa.array(rows["frame_idx"], type=pa.int64()),
             "n_values": pa.array(rows["n_values"], type=pa.int64()),
             "v_mean": pa.array(rows["v_mean"], type=pa.float64()),
             "v_std": pa.array(rows["v_std"], type=pa.float64()),
             "v_min": pa.array(rows["v_min"], type=pa.int64()),
             "v_max": pa.array(rows["v_max"], type=pa.int64()),
             "width": pa.array(rows["width"], type=pa.int64()),
             "height": pa.array(rows["height"], type=pa.int64())}
        )


def resize_images(ds, *, out_h: int = 16, out_w: int = 16,
                  concurrency: int = 2, batch_size: int = 32):
    from rse_ray.util import clamp_pool

    return ds.map_batches(
        ImageResizer, fn_constructor_kwargs={"out_h": out_h, "out_w": out_w},
        batch_format="pyarrow", batch_size=batch_size,
        concurrency=clamp_pool(concurrency))


def sample_video_frames(ds, *, every_k: int = 4, concurrency: int = 2,
                        batch_size: int = 8):
    """batch_size is SMALL: videos are the largest payloads in the
    corpus and the batch x concurrency product must fit worker heaps."""
    from rse_ray.util import clamp_pool

    return ds.map_batches(
        VideoFrameSampler, fn_constructor_kwargs={"every_k": every_k},
        batch_format="pyarrow", batch_size=batch_size,
        concurrency=clamp_pool(concurrency))


def write_video_fixture(out_dir: str, *, n: int = 24, seed: int = 9,
                        every_k: int = 4, out_h: int = 16,
                        out_w: int = 16) -> dict:
    """Deterministic RVID corpus + TWO goldens computed from the raw
    frame arrays BEFORE encoding: golden_frames.parquet (every k-th
    frame's features — the frame-sample oracle) and
    golden_resized.parquet (nearest-neighbor-resized frame-0 features
    — the resize oracle, treating frame 0 as a still image corpus).
    Idempotent via _DONE marker."""
    import json as _json
    import os

    import pyarrow.parquet as pq

    from rse_ray.functions.media import (
        encode_bmp,
        encode_video,
        resize_nearest,
        value_features,
    )

    marker = os.path.join(out_dir, "_DONE.json")
    if os.path.exists(marker):
        with open(marker) as f:
            return _json.load(f)
    os.makedirs(out_dir, exist_ok=True)
    rng = np.random.default_rng(seed)
    vids = {"media_id": [], "kind": [], "payload": []}
    stills = {"media_id": [], "kind": [], "payload": []}
    gf = {"media_id": [], "frame_idx": [], "n_values": [], "v_mean": [],
          "v_std": [], "v_min": [], "v_max": [], "width": [], "height": []}
    gr = {"media_id": [], "n_values": [], "v_mean": [], "v_std": [],
          "v_min": [], "v_max": [], "width": [], "height": []}
    for i in range(n):
        nf = int(rng.integers(3, 13))
        h = int(rng.integers(8, 32))
        w = int(rng.integers(8, 32))
        frames = rng.integers(0, 256, size=(nf, h, w, 3)).astype(np.uint8)
        vids["media_id"].append(i)
        vids["kind"].append("video")
        vids["payload"].append(encode_video(frames))
        for fi in range(0, nf, every_k):
            f = value_features(frames[fi])
            gf["media_id"].append(i)
            gf["frame_idx"].append(fi)
            gf["width"].append(w)
            gf["height"].append(h)
            for k, v in f.items():
                gf[k].append(v)
        stills["media_id"].append(i)
        stills["kind"].append("image")
        stills["payload"].append(encode_bmp(frames[0]))
        rf = value_features(resize_nearest(frames[0], out_h, out_w))
        gr["media_id"].append(i)
        gr["width"].append(out_w)
        gr["height"].append(out_h)
        for k, v in rf.items():
            gr[k].append(v)

    def _tbl(d, int_cols, float_cols):
        cols = {}
        for k, v in d.items():
            if k in float_cols:
                cols[k] = pa.array(v, type=pa.float64())
            elif k in int_cols:
                cols[k] = pa.array(v, type=pa.int64())
            elif k == "payload":
                cols[k] = pa.array(v, type=pa.binary())
            else:
                cols[k] = pa.array(v, type=pa.string())
        return pa.table(cols)

    ints = {"media_id", "frame_idx", "n_values", "v_min", "v_max",
            "width", "height"}
    floats = {"v_mean", "v_std"}
    pq.write_table(_tbl(vids, ints, floats),
                   os.path.join(out_dir, "videos.parquet"))
    pq.write_table(_tbl(stills, ints, floats),
                   os.path.join(out_dir, "stills.parquet"))
    pq.write_table(_tbl(gf, ints, floats),
                   os.path.join(out_dir, "golden_frames.parquet"))
    pq.write_table(_tbl(gr, ints, floats),
                   os.path.join(out_dir, "golden_resized.parquet"))
    meta = {"n": n, "seed": seed, "every_k": every_k,
            "out_h": out_h, "out_w": out_w, "dir": out_dir}
    with open(marker, "w") as f:
        _json.dump(meta, f)
    return meta


class AudioSpectrogram:
    """Actor-pool spectrogram stage: decode the WAV payload and emit
    one row per (frame, band) from the coarse magnitude spectrogram
    (spectrogram_frames: rFFT per frame, mean-pooled bands) — the
    feature layer under audio fingerprinting / VAD models. Kernels
    bind once per actor; each clip is one strided-matrix FFT, no
    per-frame Python."""

    def __init__(self, frame: int = 256, hop: int = 128,
                 n_bins: int = 16, round_to: int = 6) -> None:
        from rse_ray.functions.media import (decode_wav,
                                             spectrogram_frames)

        self._decode = decode_wav
        self._spec = spectrogram_frames
        self.frame, self.hop, self.n_bins = frame, hop, n_bins
        self.scale = 10.0 ** round_to

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("media_id").to_numpy()
        kinds = batch.column("kind").to_pylist()
        payloads = batch.column("payload").to_pylist()
        o_id, o_fi, o_bi, o_m = [], [], [], []
        for mid, kind, payload in zip(ids, kinds, payloads):
            if kind != "audio":
                continue
            samples, _rate = self._decode(payload)
            m = self._spec(samples, self.frame, self.hop, self.n_bins)
            m = np.floor(m * self.scale + 0.5) / self.scale  # mag >= 0
            nf, nb = m.shape
            fi = np.repeat(np.arange(nf), nb)
            bi = np.tile(np.arange(nb), nf)
            o_id.extend([int(mid)] * (nf * nb))
            o_fi.extend(fi.tolist())
            o_bi.extend(bi.tolist())
            o_m.extend(m.ravel().tolist())
        return pa.table({
            "media_id": pa.array(o_id, type=pa.int64()),
            "frame_idx": pa.array(o_fi, type=pa.int64()),
            "band": pa.array(o_bi, type=pa.int64()),
            "mag": pa.array(o_m, type=pa.float64()),
        })


def audio_spectrogram(ds, *, frame: int = 256, hop: int = 128,
                      n_bins: int = 16, concurrency: int = 2,
                      batch_size: int = 32):
    """media table -> (media_id, frame_idx, band, mag): coarse
    magnitude spectrogram over the REAL WAV decode. Golden-oracled
    pre-encode like audio_rms_windows; non-audio rows drop."""
    from rse_ray.util import clamp_pool

    return ds.map_batches(AudioSpectrogram, batch_format="pyarrow",
                          fn_constructor_kwargs={"frame": frame,
                                                 "hop": hop,
                                                 "n_bins": n_bins},
                          batch_size=batch_size,
                          concurrency=clamp_pool(concurrency))


def write_spectrogram_fixture(out_dir: str, *, n: int = 32,
                              seed: int = 17) -> dict:
    """Deterministic WAV corpus for the spectrogram oracle: pure
    tones + noise mixes (planted band structure), goldens computed
    from the RAW samples BEFORE encoding (same non-circularity
    argument as write_real_media_fixture). Writes media.parquet and
    golden_spec.parquet. Idempotent via _DONE."""
    import json as _json
    import os

    import pyarrow.parquet as pq

    from rse_ray.functions.media import encode_wav, spectrogram_frames

    marker = os.path.join(out_dir, "_DONE.json")
    if os.path.exists(marker):
        with open(marker) as f:
            return _json.load(f)
    os.makedirs(out_dir, exist_ok=True)
    rng = np.random.default_rng(seed)
    media = {"media_id": [], "kind": [], "payload": [], "meta": []}
    gold = {"media_id": [], "frame_idx": [], "band": [], "mag": []}
    for i in range(n):
        ns = int(rng.integers(512, 2048))
        t = np.arange(ns, dtype=np.float64)
        freq = 0.02 + 0.4 * (i % 8) / 8.0          # cycles/sample
        tone = 12000.0 * np.sin(2 * np.pi * freq * t)
        noise = rng.normal(0.0, 2000.0, size=ns)
        samples = np.clip(tone + noise, -32768, 32767).astype(np.int16)
        payload = encode_wav(samples, rate=8000)
        media["media_id"].append(i)
        media["kind"].append("audio")
        media["payload"].append(payload)
        media["meta"].append(_json.dumps({"n_samples": ns,
                                          "rate": 8000}))
        m = spectrogram_frames(samples)
        m = np.floor(m * 1e6 + 0.5) / 1e6
        nf, nb = m.shape
        gold["media_id"].extend([i] * (nf * nb))
        gold["frame_idx"].extend(np.repeat(np.arange(nf), nb).tolist())
        gold["band"].extend(np.tile(np.arange(nb), nf).tolist())
        gold["mag"].extend(m.ravel().tolist())
    pq.write_table(
        pa.table({"media_id": pa.array(media["media_id"],
                                       type=pa.int64()),
                  "kind": pa.array(media["kind"], type=pa.string()),
                  "payload": pa.array(media["payload"],
                                      type=pa.binary()),
                  "meta": pa.array(media["meta"], type=pa.string())}),
        os.path.join(out_dir, "media.parquet"))
    pq.write_table(
        pa.table({"media_id": pa.array(gold["media_id"],
                                       type=pa.int64()),
                  "frame_idx": pa.array(gold["frame_idx"],
                                        type=pa.int64()),
                  "band": pa.array(gold["band"], type=pa.int64()),
                  "mag": pa.array(gold["mag"], type=pa.float64())}),
        os.path.join(out_dir, "golden_spec.parquet"))
    info = {"n": n, "seed": seed}
    from rse_ray.state.manifest import write_json_atomic

    write_json_atomic(marker, info)
    return info


class SceneCutDetector:
    """Actor-pool shot-boundary stage: decode the RVID payload and
    emit one row per consecutive-frame transition with its mean
    absolute pixel difference and the cut flag (diff > threshold) —
    the frame-sampling front end of a video training-data pipeline
    (sample one frame per shot instead of every k-th). Kernels bind
    once per actor; each transition is one vectorized array diff."""

    def __init__(self, threshold: float = 12.0,
                 round_to: int = 6) -> None:
        from rse_ray.functions.media import decode_video

        self._decode = decode_video
        self.threshold = threshold
        self.scale = 10.0 ** round_to

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("media_id").to_numpy()
        kinds = batch.column("kind").to_pylist()
        payloads = batch.column("payload").to_pylist()
        o_id, o_fi, o_d, o_c = [], [], [], []
        for mid, kind, payload in zip(ids, kinds, payloads):
            if kind != "video":
                continue
            frames = self._decode(payload)
            for i in range(1, len(frames)):
                d = float(np.mean(np.abs(
                    frames[i].astype(np.float64)
                    - frames[i - 1].astype(np.float64))))
                d = float(np.floor(d * self.scale + 0.5) / self.scale)
                o_id.append(int(mid))
                o_fi.append(i)
                o_d.append(d)
                o_c.append(d > self.threshold)
        return pa.table({
            "media_id": pa.array(o_id, type=pa.int64()),
            "frame_idx": pa.array(o_fi, type=pa.int64()),
            "diff": pa.array(o_d, type=pa.float64()),
            "is_cut": pa.array(o_c, type=pa.bool_()),
        })


def video_scene_cuts(ds, *, threshold: float = 12.0,
                     concurrency: int = 2, batch_size: int = 16):
    """media table -> (media_id, frame_idx, diff, is_cut): shot
    boundaries over the REAL RVID decode. Golden-oracled pre-encode;
    non-video rows drop."""
    from rse_ray.util import clamp_pool

    return ds.map_batches(SceneCutDetector, batch_format="pyarrow",
                          fn_constructor_kwargs={
                              "threshold": threshold},
                          batch_size=batch_size,
                          concurrency=clamp_pool(concurrency))


def write_scene_video_fixture(out_dir: str, *, n: int = 12,
                              seed: int = 23, frames: int = 20,
                              h: int = 12, w: int = 12,
                              threshold: float = 12.0) -> dict:
    """Deterministic RVID corpus with PLANTED scene structure: each
    video is 2-4 scenes; frames within a scene are the scene's base
    image plus small per-frame jitter (diff ~ 2-3 gray levels), scene
    changes swap the base entirely (diff >> threshold). Goldens
    (golden_cuts.parquet) computed from the RAW frames BEFORE
    encoding — matching them proves the decode path. Idempotent via
    _DONE."""
    import json as _json
    import os

    import pyarrow.parquet as pq

    from rse_ray.functions.media import encode_video

    marker = os.path.join(out_dir, "_DONE.json")
    if os.path.exists(marker):
        with open(marker) as f:
            return _json.load(f)
    os.makedirs(out_dir, exist_ok=True)
    rng = np.random.default_rng(seed)
    media = {"media_id": [], "kind": [], "payload": [], "meta": []}
    gold = {"media_id": [], "frame_idx": [], "diff": [],
            "is_cut": []}
    for i in range(n):
        n_scenes = 2 + i % 3
        cuts = sorted(rng.choice(np.arange(4, frames - 2),
                                 size=n_scenes - 1, replace=False)
                      .tolist())
        bases = [rng.integers(0, 256, size=(h, w, 3))
                 .astype(np.uint8) for _ in range(n_scenes)]
        vid = np.empty((frames, h, w, 3), dtype=np.uint8)
        scene = 0
        for f in range(frames):
            if scene < len(cuts) and f == cuts[scene]:
                scene += 1
            jitter = rng.integers(-2, 3, size=(h, w, 3))
            vid[f] = np.clip(bases[scene].astype(np.int16) + jitter,
                             0, 255).astype(np.uint8)
        payload = encode_video(vid)
        media["media_id"].append(i)
        media["kind"].append("video")
        media["payload"].append(payload)
        media["meta"].append(_json.dumps(
            {"frames": frames, "h": h, "w": w, "cuts": cuts}))
        for f in range(1, frames):
            d = float(np.mean(np.abs(vid[f].astype(np.float64)
                                     - vid[f - 1]
                                     .astype(np.float64))))
            d = float(np.floor(d * 1e6 + 0.5) / 1e6)
            gold["media_id"].append(i)
            gold["frame_idx"].append(f)
            gold["diff"].append(d)
            gold["is_cut"].append(d > threshold)
    pq.write_table(
        pa.table({"media_id": pa.array(media["media_id"],
                                       type=pa.int64()),
                  "kind": pa.array(media["kind"], type=pa.string()),
                  "payload": pa.array(media["payload"],
                                      type=pa.binary()),
                  "meta": pa.array(media["meta"], type=pa.string())}),
        os.path.join(out_dir, "media.parquet"))
    pq.write_table(
        pa.table({"media_id": pa.array(gold["media_id"],
                                       type=pa.int64()),
                  "frame_idx": pa.array(gold["frame_idx"],
                                        type=pa.int64()),
                  "diff": pa.array(gold["diff"], type=pa.float64()),
                  "is_cut": pa.array(gold["is_cut"],
                                     type=pa.bool_())}),
        os.path.join(out_dir, "golden_cuts.parquet"))
    info = {"n": n, "seed": seed, "threshold": threshold}
    from rse_ray.state.manifest import write_json_atomic

    write_json_atomic(marker, info)
    return info
