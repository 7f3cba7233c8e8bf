"""Pure-numpy media codecs for the multimodal pipeline: uncompressed
24-bit BMP (image) and 16-bit PCM WAV (audio).

The container has no media libraries, but these two containers are
simple enough to en/decode exactly with struct + numpy — which makes
the decode stage REAL (bytes in, pixel/sample arrays out) instead of a
stub, while staying deterministic and dependency-free. Format layouts
follow the public BMP (BITMAPFILEHEADER/BITMAPINFOHEADER, bottom-up
BGR rows padded to 4 bytes) and RIFF/WAVE (fmt + data chunks, PCM
s16le) specifications.
"""

from __future__ import annotations

import struct

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
