"""Pure-numpy media codecs for the multimodal pipeline: uncompressed
24-bit BMP and COMPRESSED 8-bit RGB PNG (images), 16-bit PCM WAV
(audio).

The container has no media libraries, but these containers are
decodable exactly with struct + numpy (+ stdlib zlib for PNG's
DEFLATE) — which makes the decode stage REAL (bytes in, pixel/sample
arrays out) instead of a stub, while staying deterministic and
dependency-free. Format layouts follow the public BMP
(BITMAPFILEHEADER/BITMAPINFOHEADER, bottom-up BGR rows padded to 4
bytes), PNG (RFC 2083: chunk stream, scanline filters 0-4, zlib
stream) and RIFF/WAVE (fmt + data chunks, PCM s16le) specifications.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_BMP_FILE_HDR = struct.Struct("<2sIHHI")
_BMP_INFO_HDR = struct.Struct("<IiiHHIIiiII")


def encode_bmp(pixels: np.ndarray) -> bytes:
    """(h, w, 3) uint8 RGB -> 24-bit uncompressed BMP bytes."""
    if pixels.ndim != 3 or pixels.shape[2] != 3:
        raise ValueError("pixels must be (h, w, 3)")
    h, w, _ = pixels.shape
    row_size = (w * 3 + 3) & ~3
    data_size = row_size * h
    off = _BMP_FILE_HDR.size + _BMP_INFO_HDR.size
    file_hdr = _BMP_FILE_HDR.pack(b"BM", off + data_size, 0, 0, off)
    info_hdr = _BMP_INFO_HDR.pack(40, w, h, 1, 24, 0, data_size,
                                  2835, 2835, 0, 0)
    # bottom-up rows, BGR byte order, zero padding to 4-byte boundary
    rows = np.zeros((h, row_size), dtype=np.uint8)
    rows[:, : w * 3] = pixels[::-1, :, ::-1].reshape(h, w * 3)
    return file_hdr + info_hdr + rows.tobytes()


def decode_bmp(buf: bytes) -> np.ndarray:
    """24-bit uncompressed BMP bytes -> (h, w, 3) uint8 RGB."""
    magic, _fsize, _r1, _r2, off = _BMP_FILE_HDR.unpack_from(buf, 0)
    if magic != b"BM":
        raise ValueError("not a BMP payload")
    (hdr_size, w, h, _planes, bpp, comp, _ds, _xp, _yp, _cu, _ci) = (
        _BMP_INFO_HDR.unpack_from(buf, _BMP_FILE_HDR.size)
    )
    if hdr_size < 40 or bpp != 24 or comp != 0 or h <= 0 or w <= 0:
        raise ValueError(f"unsupported BMP (bpp={bpp}, comp={comp})")
    row_size = (w * 3 + 3) & ~3
    raw = np.frombuffer(buf, dtype=np.uint8, count=row_size * h, offset=off)
    rows = raw.reshape(h, row_size)[:, : w * 3]
    return rows.reshape(h, w, 3)[::-1, :, ::-1]


_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _png_chunk(ctype: bytes, body: bytes) -> bytes:
    crc = zlib.crc32(ctype + body) & 0xFFFFFFFF
    return struct.pack(">I", len(body)) + ctype + body + struct.pack(">I", crc)


def _paeth_rows(a: np.ndarray, b: np.ndarray, c: np.ndarray) -> np.ndarray:
    """Vectorized Paeth predictor (RFC 2083 §6.6) over whole scanlines:
    a=left, b=up, c=up-left, all uint8 arrays of equal length."""
    p = a.astype(np.int16) + b.astype(np.int16) - c.astype(np.int16)
    da = np.abs(p - a)
    db = np.abs(p - b)
    dc = np.abs(p - c)
    return np.where((da <= db) & (da <= dc), a,
                    np.where(db <= dc, b, c)).astype(np.uint8)


def _paeth_scalar(a: int, b: int, c: int) -> int:
    p = a + b - c
    da, db, dc = abs(p - a), abs(p - b), abs(p - c)
    if da <= db and da <= dc:
        return a
    return b if db <= dc else c


def encode_png(pixels: np.ndarray) -> bytes:
    """(h, w, 3) uint8 RGB -> 8-bit truecolor PNG bytes.

    Scanline ``y`` uses filter type ``y % 5``, so every image taller
    than 4 rows exercises ALL five RFC 2083 filters — the decoder's
    unfilter paths get real coverage instead of the all-None stream a
    lazy encoder would emit. Filtering is vectorized per scanline (the
    encoder sees the full raw row, so even the left-referencing
    filters are just shifted subtractions; uint8 wraps mod 256 as the
    spec requires)."""
    if pixels.ndim != 3 or pixels.shape[2] != 3:
        raise ValueError("pixels must be (h, w, 3)")
    h, w, _ = pixels.shape
    bpp = 3
    raw = np.ascontiguousarray(pixels, dtype=np.uint8).reshape(h, w * bpp)
    zero = np.zeros(w * bpp, dtype=np.uint8)
    out = bytearray()
    for y in range(h):
        cur = raw[y]
        prior = raw[y - 1] if y else zero
        left = np.concatenate([zero[:bpp], cur[:-bpp]])
        up_left = np.concatenate([zero[:bpp], prior[:-bpp]])
        ft = y % 5
        if ft == 0:
            filt = cur
        elif ft == 1:
            filt = cur - left
        elif ft == 2:
            filt = cur - prior
        elif ft == 3:
            avg = ((left.astype(np.uint16) + prior) >> 1).astype(np.uint8)
            filt = cur - avg
        else:
            filt = cur - _paeth_rows(left, prior, up_left)
        out.append(ft)
        out += filt.tobytes()
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    return (_PNG_SIG
            + _png_chunk(b"IHDR", ihdr)
            + _png_chunk(b"IDAT", zlib.compress(bytes(out), 6))
            + _png_chunk(b"IEND", b""))


def decode_png(buf: bytes) -> np.ndarray:
    """8-bit truecolor PNG bytes -> (h, w, 3) uint8 RGB.

    Walks the chunk stream (CRC-verified), inflates the concatenated
    IDAT zlib stream, and reverses scanline filters 0-4. Filters
    0/1/2 unfilter fully vectorized (1 via per-channel cumsum — the
    left-dependency chain steps by bpp, so ``reshape(w, 3)`` makes
    each channel an independent prefix sum); 3/4 need the
    reconstructed left byte and run as scalar loops over the ≤w*3-byte
    scanline (images in this pipeline are thumbnails; payload decode
    is an actor-pool stage, so the loop is per-scanline inside one
    actor, never per-row-of-dataset)."""
    if buf[:8] != _PNG_SIG:
        raise ValueError("not a PNG payload")
    at = 8
    w = h = None
    idat = bytearray()
    while at + 8 <= len(buf):
        (clen,) = struct.unpack_from(">I", buf, at)
        ctype = buf[at + 4 : at + 8]
        body = buf[at + 8 : at + 8 + clen]
        (crc,) = struct.unpack_from(">I", buf, at + 8 + clen)
        if zlib.crc32(ctype + body) & 0xFFFFFFFF != crc:
            raise ValueError(f"PNG chunk {ctype!r} CRC mismatch")
        if ctype == b"IHDR":
            w, h, depth, color, comp, filt, ilace = struct.unpack(
                ">IIBBBBB", body
            )
            if depth != 8 or color != 2 or comp != 0 or filt != 0 or ilace != 0:
                raise ValueError(
                    "unsupported PNG (need 8-bit truecolor, no interlace)"
                )
        elif ctype == b"IDAT":
            idat += body
        elif ctype == b"IEND":
            break
        at += 12 + clen
    if w is None or not idat:
        raise ValueError("PNG missing IHDR/IDAT chunk")
    stream = zlib.decompress(bytes(idat))
    bpp = 3
    stride = w * bpp
    if len(stream) != h * (stride + 1):
        raise ValueError("PNG scanline stream length mismatch")
    lines = np.frombuffer(stream, dtype=np.uint8).reshape(h, stride + 1)
    out = np.zeros((h, stride), dtype=np.uint8)
    zero = np.zeros(stride, dtype=np.uint8)
    for y in range(h):
        ft = int(lines[y, 0])
        cur = lines[y, 1:]
        prior = out[y - 1] if y else zero
        if ft == 0:
            rec = cur
        elif ft == 1:
            rec = (np.cumsum(cur.reshape(w, bpp), axis=0,
                             dtype=np.int64) % 256).astype(np.uint8).ravel()
        elif ft == 2:
            rec = cur + prior
        elif ft in (3, 4):
            recl = cur.tolist()
            prl = prior.tolist()
            if ft == 3:
                for x in range(stride):
                    left = recl[x - bpp] if x >= bpp else 0
                    recl[x] = (recl[x] + ((left + prl[x]) >> 1)) & 0xFF
            else:
                for x in range(stride):
                    left = recl[x - bpp] if x >= bpp else 0
                    ul = prl[x - bpp] if x >= bpp else 0
                    recl[x] = (recl[x] + _paeth_scalar(left, prl[x], ul)) & 0xFF
            rec = np.array(recl, dtype=np.uint8)
        else:
            raise ValueError(f"unknown PNG filter type {ft}")
        out[y] = rec
    return out.reshape(h, w, bpp)


def decode_image(buf: bytes) -> np.ndarray:
    """Image bytes -> (h, w, 3) uint8 RGB, dispatched on the container
    magic (BMP ``BM`` / PNG signature / JPEG SOI)."""
    if buf[:8] == _PNG_SIG:
        return decode_png(buf)
    if buf[:2] == b"BM":
        return decode_bmp(buf)
    if buf[:2] == b"\xFF\xD8":
        from rse_ray.functions.jpeg import decode_jpeg

        return decode_jpeg(buf)
    raise ValueError("unrecognized image container (need BMP/PNG/JPEG)")


def encode_wav(samples: np.ndarray, rate: int = 8000) -> bytes:
    """1-D int16 samples -> mono PCM s16le WAV bytes."""
    data = np.ascontiguousarray(samples, dtype="<i2").tobytes()
    fmt = b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, rate, rate * 2, 2, 16)
    body = b"WAVE" + fmt + b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav(buf: bytes) -> tuple[np.ndarray, int]:
    """Mono PCM s16le WAV bytes -> (int16 samples, sample_rate). Walks
    the RIFF chunk list (fmt may not directly precede data)."""
    if buf[:4] != b"RIFF" or buf[8:12] != b"WAVE":
        raise ValueError("not a WAV payload")
    at = 12
    rate = None
    samples = None
    while at + 8 <= len(buf):
        cid = buf[at : at + 4]
        (clen,) = struct.unpack_from("<I", buf, at + 4)
        body = at + 8
        if cid == b"fmt ":
            audio_fmt, channels, rate, _br, _ba, bits = struct.unpack_from(
                "<HHIIHH", buf, body
            )
            if audio_fmt != 1 or channels != 1 or bits != 16:
                raise ValueError("unsupported WAV (need mono PCM s16)")
        elif cid == b"data":
            samples = np.frombuffer(buf, dtype="<i2", count=clen // 2,
                                    offset=body)
        at = body + clen + (clen & 1)  # chunks are word-aligned
    if rate is None or samples is None:
        raise ValueError("WAV missing fmt/data chunk")
    return samples, rate


def value_features(values: np.ndarray) -> dict:
    """The shared feature set both the pipeline (post-decode) and the
    golden generator (pre-encode) compute from the raw value array —
    matching results prove the encode->ship->decode round trip exact."""
    v = values.astype(np.float64).ravel()
    return {
        "n_values": int(v.size),
        "v_mean": round(float(v.mean()), 6) if v.size else 0.0,
        "v_std": round(float(v.std()), 6) if v.size else 0.0,
        "v_min": int(v.min()) if v.size else 0,
        "v_max": int(v.max()) if v.size else 0,
    }


# ---------------------------------------------------------------------------
# video container (synthetic but REAL framing: length-prefixed BMP frames —
# no video codecs exist in this container, so the interchange format is
# ours, but every frame passes through the real image codec)
# ---------------------------------------------------------------------------

VIDEO_MAGIC = b"RVID"


def encode_video(frames: np.ndarray) -> bytes:
    """(n, h, w, 3) uint8 frames -> RVID container: magic, uint32
    frame count, then per frame uint32 length + BMP bytes."""
    parts = [VIDEO_MAGIC, struct.pack("<I", len(frames))]
    for f in frames:
        b = encode_bmp(f)
        parts.append(struct.pack("<I", len(b)))
        parts.append(b)
    return b"".join(parts)


def decode_video(buf: bytes) -> list[np.ndarray]:
    """RVID container -> list of (h, w, 3) uint8 frames."""
    if buf[:4] != VIDEO_MAGIC:
        raise ValueError("not an RVID payload")
    (n,) = struct.unpack_from("<I", buf, 4)
    at = 8
    frames = []
    for _ in range(n):
        (ln,) = struct.unpack_from("<I", buf, at)
        at += 4
        frames.append(decode_bmp(buf[at : at + ln]))
        at += ln
    return frames


def rms_frames(samples: np.ndarray, frame: int = 256,
               hop: int = 128) -> np.ndarray:
    """Framewise RMS energy: frames of ``frame`` samples every ``hop``
    samples, trailing partial frame DROPPED (pinned contract), rms =
    sqrt(mean(x^2)) in float64. Shared by the fixture generator
    (pre-encode goldens) and the decode pipeline — deterministic, so
    the encode->decode round trip must reproduce it bit-exact."""
    x = samples.astype(np.float64)
    n = (len(x) - frame) // hop + 1 if len(x) >= frame else 0
    if n <= 0:
        return np.empty(0, dtype=np.float64)
    idx = np.arange(frame)[None, :] + hop * np.arange(n)[:, None]
    return np.sqrt((x[idx] ** 2).mean(axis=1))


_PHASH_N = 32
# DCT-II basis, orthogonality constants irrelevant (median threshold is
# scale-invariant per coefficient row/col pair)
_DCT32 = np.cos(
    np.pi * np.arange(_PHASH_N)[:, None]
    * (2 * np.arange(_PHASH_N)[None, :] + 1) / (2 * _PHASH_N))


def phash64(px: np.ndarray) -> int:
    """64-bit DCT perceptual hash (the classic pHash shape): integer
    luma -> 32x32 nearest-neighbor downsample -> 2D DCT-II -> the
    top-left 8x8 low-frequency block -> median threshold -> bit i set
    iff coeff_i > median (row-major, bit 0 = MSB). Every step is
    deterministic (integer luma, index-math resize, float64 matmul),
    so the same pixels hash identically on any machine — the fixture
    generator and the decode pipeline share this one kernel."""
    if px.ndim == 3:
        r = px[..., 0].astype(np.uint32)
        g = px[..., 1].astype(np.uint32)
        b = px[..., 2].astype(np.uint32)
        luma = ((77 * r + 150 * g + 29 * b) >> 8).astype(np.float64)
    else:
        luma = px.astype(np.float64)
    small = resize_nearest(luma, _PHASH_N, _PHASH_N)
    coeffs = (_DCT32 @ small @ _DCT32.T)[:8, :8].ravel()
    med = float(np.median(coeffs))
    bits = coeffs > med
    h = np.uint64(0)
    for bit in bits:
        h = (h << np.uint64(1)) | np.uint64(bool(bit))
    return int(h)


def resize_nearest(px: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Nearest-neighbor resize (pure index math — deterministic, no
    interpolation-kernel ambiguity): source index = floor(i * in / out)."""
    h, w = px.shape[0], px.shape[1]
    ri = (np.arange(out_h, dtype=np.int64) * h) // out_h
    ci = (np.arange(out_w, dtype=np.int64) * w) // out_w
    return px[ri][:, ci]


def spectrogram_frames(samples: np.ndarray, frame: int = 256,
                       hop: int = 128,
                       n_bins: int = 16) -> np.ndarray:
    """Coarse magnitude spectrogram: the rms_frames windowing contract
    (frames of ``frame`` every ``hop``, trailing partial DROPPED),
    each frame rFFT'd (no window function — pinned) and its magnitude
    spectrum mean-pooled into ``n_bins`` equal bands of the frame//2+1
    rfft bins (remainder bins join the LAST band). Returns an
    (n_frames, n_bins) float64 matrix. Shared by the fixture
    generator (pre-encode goldens) and the decode pipeline, so the
    encode->decode round trip must reproduce it bit-exact."""
    x = samples.astype(np.float64)
    n = (len(x) - frame) // hop + 1 if len(x) >= frame else 0
    if n <= 0:
        return np.empty((0, n_bins), dtype=np.float64)
    idx = np.arange(frame)[None, :] + hop * np.arange(n)[:, None]
    mag = np.abs(np.fft.rfft(x[idx], axis=1))
    nb = mag.shape[1]
    per = nb // n_bins
    out = np.empty((n, n_bins), dtype=np.float64)
    for b in range(n_bins):
        lo = b * per
        hi = (b + 1) * per if b < n_bins - 1 else nb
        out[:, b] = mag[:, lo:hi].mean(axis=1)
    return out
