"""Pure-numpy baseline JPEG codec (ITU-T T.81 sequential DCT).

Round-3 VERDICT item 6: the one remaining image-codec stub. The
container has no libjpeg/PIL, but baseline JPEG is decodable exactly
with numpy + stdlib bit twiddling: marker segments, DQT/DHT tables,
canonical Huffman decode, byte unstuffing, zigzag, dequantization,
float IDCT, and JFIF YCbCr->RGB. Everything follows the public T.81
spec (Annex K default tables) and the JFIF 1.02 colorspace note.

Scope (what the encoder emits, which is what the decoder supports):
8-bit baseline sequential, 3 components, 4:4:4 (no subsampling — one
block per component per MCU), standard Annex K Huffman tables, no
restart intervals, no progressive/arithmetic modes. That is a fully
conformant baseline stream any real decoder reads.

Oracle design — lossy codecs can't use the BMP/PNG "features from raw
pixels" golden, so the contract splits at the mathematically-defined
layer:

  * the LOSSY math (quality-scaled quantization of the 8x8 DCT) is
    ``_quantize_planes`` -> ``_reconstruct``; ``jpeg_reference_pixels``
    composes them WITHOUT serializing a byte;
  * the SERIALIZATION (Huffman + markers + stuffing) is lossless, so
    ``decode_jpeg(encode_jpeg(px)) == jpeg_reference_pixels(px)``
    BIT-EXACTLY — the fixture generator writes golden features from
    the reference pixels pre-encode, and the pipeline's decode of the
    actual bytes must reproduce them exactly.
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------------------
# Annex K tables
# ---------------------------------------------------------------------------

QUANT_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99], dtype=np.int32).reshape(8, 8)

QUANT_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99], dtype=np.int32).reshape(8, 8)

ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63],
    dtype=np.int64)

# standard Huffman specs: (bits[1..16] counts, symbol values)
_DC_LUMA = ([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
            list(range(12)))
_DC_CHROMA = ([0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
              list(range(12)))
_AC_LUMA = ([0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 125], [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
    0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
    0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
    0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
    0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
    0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
    0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
    0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
    0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA])
_AC_CHROMA = ([0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 119], [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
    0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
    0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
    0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
    0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
    0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
    0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
    0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
    0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
    0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
    0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
    0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA])


def _huff_codes(bits, vals):
    """T.81 C.2 canonical code assignment: (value -> (code, length))."""
    out = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


def _huff_decode_table(bits, vals):
    """(length -> {code: value}) for MSB-first sequential decoding."""
    table: dict[int, dict[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        if bits[length - 1]:
            lvl = table.setdefault(length, {})
            for _ in range(bits[length - 1]):
                lvl[code] = vals[k]
                code += 1
                k += 1
        code <<= 1
    return table


# orthonormal 8x8 DCT-II matrix: forward D @ B @ D.T, inverse D.T @ B @ D
_D = np.zeros((8, 8))
for _k in range(8):
    for _n in range(8):
        _D[_k, _n] = np.cos(np.pi * (2 * _n + 1) * _k / 16.0) * \
            (np.sqrt(0.125) if _k == 0 else 0.5)


def _quality_tables(quality: int):
    """libjpeg's public quality->scale mapping over the Annex K bases."""
    q = min(100, max(1, int(quality)))
    scale = 5000 // q if q < 50 else 200 - 2 * q
    out = []
    for base in (QUANT_LUMA, QUANT_CHROMA):
        t = (base * scale + 50) // 100
        out.append(np.clip(t, 1, 255).astype(np.int32))
    return out


def _rgb_to_ycbcr(px: np.ndarray) -> np.ndarray:
    """(h, w, 3) uint8 RGB -> (3, h, w) float64 JFIF YCbCr."""
    r = px[:, :, 0].astype(np.float64)
    g = px[:, :, 1].astype(np.float64)
    b = px[:, :, 2].astype(np.float64)
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168735892 * r - 0.331264108 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418687589 * g - 0.081312411 * b + 128.0
    return np.stack([y, cb, cr])


def _ycbcr_to_rgb(planes: np.ndarray) -> np.ndarray:
    """(3, h, w) float64 -> (h, w, 3) uint8, JFIF inverse + clamp."""
    y, cb, cr = planes[0], planes[1] - 128.0, planes[2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136286 * cb - 0.714136286 * cr
    b = y + 1.772 * cb
    out = np.stack([r, g, b], axis=-1)
    return np.clip(np.round(out), 0, 255).astype(np.uint8)


def _blockify(plane: np.ndarray):
    """(H8, W8) float -> (nby, nbx, 8, 8) view-ordered copy."""
    h, w = plane.shape
    return plane.reshape(h // 8, 8, w // 8, 8).transpose(0, 2, 1, 3)


def _quantize_planes(px: np.ndarray, quality: int = 75):
    """The LOSSY half of the codec, no bytes involved: pad to 8x8,
    color-convert, DCT, quality-scaled quantize. Returns
    (coeff_blocks[3] each (nby, nbx, 8, 8) int32, qtables[2], h, w)."""
    if px.ndim != 3 or px.shape[2] != 3:
        raise ValueError("pixels must be (h, w, 3)")
    h, w, _ = px.shape
    ph, pw = -(-h // 8) * 8, -(-w // 8) * 8
    padded = np.empty((ph, pw, 3), dtype=np.uint8)
    padded[:h, :w] = px
    padded[h:, :w] = px[h - 1:h, :]          # edge replication
    padded[:, w:] = padded[:, w - 1:w]
    ycc = _rgb_to_ycbcr(padded)
    qt = _quality_tables(quality)
    coeffs = []
    for c in range(3):
        blocks = _blockify(ycc[c] - 128.0)
        f = np.einsum("ij,abjk,lk->abil", _D, blocks, _D)
        q = qt[0] if c == 0 else qt[1]
        # clamp ACs into Huffman size<=10 territory: the orthonormal
        # DCT of [-128,127] bounds |coef| at ~1025, a hair over the
        # 1023 a 10-bit magnitude code carries (standard AC tables
        # stop at size 10). Reachable only by a +-full-range
        # checkerboard at quality>=99; the clamp keeps encode total
        # instead of KeyError-ing on that corner. DC diffs (size<=11,
        # +-2047) are always in range.
        coeffs.append(np.clip(np.round(f / q), -1023,
                              1023).astype(np.int32))
    return coeffs, qt, h, w


def _reconstruct(coeffs, qt, h: int, w: int) -> np.ndarray:
    """The decoder's mathematically-defined output: dequantize, IDCT,
    color-convert, crop. Shared verbatim by decode_jpeg and the
    fixture generator's pre-encode golden."""
    planes = []
    for c in range(3):
        q = qt[0] if c == 0 else qt[1]
        f = coeffs[c].astype(np.float64) * q
        blocks = np.einsum("ji,abjk,kl->abil", _D, f, _D)
        nby, nbx = blocks.shape[:2]
        planes.append(blocks.transpose(0, 2, 1, 3)
                      .reshape(nby * 8, nbx * 8) + 128.0)
    return _ycbcr_to_rgb(np.stack(planes))[:h, :w]


def jpeg_reference_pixels(px: np.ndarray, quality: int = 75) -> np.ndarray:
    """decode(encode(px)) WITHOUT serialization — the golden oracle."""
    return _reconstruct(*_quantize_planes(px, quality))


# ---------------------------------------------------------------------------
# serialization
# ---------------------------------------------------------------------------

class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def put(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            byte = (self.acc >> (self.nbits - 8)) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:        # byte stuffing (T.81 F.1.2.3)
                self.out.append(0x00)
            self.nbits -= 8
            self.acc &= (1 << self.nbits) - 1

    def flush(self) -> None:
        if self.nbits:
            pad = 8 - self.nbits
            self.put((1 << pad) - 1, pad)  # 1-fill to byte boundary


def _magnitude(v: int):
    """T.81 F.1.2.1: (size category, size-bit code) for a coefficient."""
    if v == 0:
        return 0, 0
    size = int(abs(v)).bit_length()
    code = v if v > 0 else v + (1 << size) - 1
    return size, code


def encode_jpeg(px: np.ndarray, quality: int = 75) -> bytes:
    """(h, w, 3) uint8 RGB -> baseline JFIF bytes (4:4:4, Annex K
    Huffman tables, no restart markers)."""
    coeffs, qt, h, w = _quantize_planes(px, quality)
    nby, nbx = coeffs[0].shape[:2]
    dc_tabs = [_huff_codes(*_DC_LUMA), _huff_codes(*_DC_CHROMA)]
    ac_tabs = [_huff_codes(*_AC_LUMA), _huff_codes(*_AC_CHROMA)]
    zz = [c.reshape(nby, nbx, 64)[:, :, ZIGZAG] for c in coeffs]

    bw = _BitWriter()
    prev_dc = [0, 0, 0]
    for by in range(nby):
        for bx in range(nbx):
            for c in range(3):                  # interleaved MCU
                t = 0 if c == 0 else 1
                blk = zz[c][by, bx]
                diff = int(blk[0]) - prev_dc[c]
                prev_dc[c] = int(blk[0])
                size, code = _magnitude(diff)
                hc, hl = dc_tabs[t][size]
                bw.put(hc, hl)
                if size:
                    bw.put(code, size)
                run = 0
                nz = np.nonzero(blk[1:])[0]
                last = nz[-1] + 1 if len(nz) else 0
                for i in range(1, last + 1):
                    v = int(blk[i])
                    if v == 0:
                        run += 1
                        continue
                    while run > 15:
                        hc, hl = ac_tabs[t][0xF0]   # ZRL
                        bw.put(hc, hl)
                        run -= 16
                    size, code = _magnitude(v)
                    hc, hl = ac_tabs[t][(run << 4) | size]
                    bw.put(hc, hl)
                    bw.put(code, size)
                    run = 0
                if last < 63:
                    hc, hl = ac_tabs[t][0x00]       # EOB
                    bw.put(hc, hl)
    bw.flush()

    def seg(marker: int, body: bytes) -> bytes:
        return struct.pack(">HH", marker, len(body) + 2) + body

    out = bytearray(b"\xFF\xD8")                    # SOI
    out += seg(0xFFE0, b"JFIF\x00\x01\x01\x00"      # APP0/JFIF
               + struct.pack(">HHBB", 1, 1, 0, 0))
    for tid, q in enumerate(qt):                    # DQT
        out += seg(0xFFDB, bytes([tid])
                   + bytes(int(x) for x in q.reshape(64)[ZIGZAG]))
    # SOF0 carries the TRUE dims (standard: decoders derive the MCU
    # grid as ceil(dim/8) and drop the edge-block padding themselves)
    out += seg(0xFFC0, struct.pack(">BHHB", 8, h, w, 3)
               + bytes([1, 0x11, 0, 2, 0x11, 1, 3, 0x11, 1]))
    for cls, tid, (bits, vals) in ((0, 0, _DC_LUMA), (0, 1, _DC_CHROMA),
                                   (1, 0, _AC_LUMA), (1, 1, _AC_CHROMA)):
        out += seg(0xFFC4, bytes([(cls << 4) | tid]) + bytes(bits)
                   + bytes(vals))                   # DHT
    out += seg(0xFFDA, bytes([3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0]))
    out += bw.out
    out += b"\xFF\xD9"                              # EOI
    return bytes(out)


class _BitReader:
    """MSB-first bit reader over the entropy-coded segment with 0xFF00
    unstuffing; stops (raises) at any non-stuffed marker."""

    def __init__(self, buf: bytes, at: int):
        self.buf = buf
        self.at = at
        self.acc = 0
        self.nbits = 0

    def _fill(self) -> None:
        if self.at >= len(self.buf):
            # cut entropy stream: keep the decoder's documented
            # ValueError contract instead of leaking IndexError
            # (round-4 ADVICE — real crawls carry truncated payloads)
            raise ValueError("truncated JPEG (entropy stream cut)")
        b = self.buf[self.at]
        if b == 0xFF:
            if self.at + 1 >= len(self.buf):
                raise ValueError("truncated JPEG (entropy stream cut)")
            nxt = self.buf[self.at + 1]
            if nxt == 0x00:
                self.at += 2
            else:
                raise EOFError("marker inside entropy stream")
        else:
            self.at += 1
        self.acc = (self.acc << 8) | b
        self.nbits += 8

    def bits(self, n: int) -> int:
        while self.nbits < n:
            self._fill()
        v = (self.acc >> (self.nbits - n)) & ((1 << n) - 1)
        self.nbits -= n
        self.acc &= (1 << self.nbits) - 1
        return v

    def huff(self, table) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | self.bits(1)
            lvl = table.get(length)
            if lvl is not None and code in lvl:
                return lvl[code]
        raise ValueError("invalid Huffman code")


def _extend(code: int, size: int) -> int:
    """T.81 F.2.2.1 sign extension of a size-bit magnitude code."""
    if size == 0:
        return 0
    if code < (1 << (size - 1)):
        return code - (1 << size) + 1
    return code


def decode_jpeg(buf: bytes) -> np.ndarray:
    """Baseline JFIF bytes -> (h, w, 3) uint8 RGB. Supports what a
    baseline 4:4:4 3-component stream carries: DQT/DHT/SOF0/SOS
    markers, canonical Huffman, byte unstuffing, zigzag, dequant,
    float IDCT (bit-identical to jpeg_reference_pixels)."""
    if buf[:2] != b"\xFF\xD8":
        raise ValueError("not a JPEG payload (missing SOI)")
    at = 2
    qtabs: dict[int, np.ndarray] = {}
    htabs: dict[tuple[int, int], dict] = {}
    sof = None
    comp_tabs = None
    while at < len(buf):
        if buf[at] != 0xFF:
            raise ValueError("marker sync lost")
        if at + 2 > len(buf):
            raise ValueError("truncated JPEG (marker cut)")
        marker = (buf[at] << 8) | buf[at + 1]
        if marker == 0xFFD9:
            break
        if at + 4 > len(buf):
            raise ValueError("truncated JPEG (marker header cut)")
        (length,) = struct.unpack_from(">H", buf, at + 2)
        body = buf[at + 4: at + 2 + length]
        if len(body) != max(0, length - 2):
            raise ValueError("truncated JPEG (segment body cut)")
        if marker == 0xFFDB:
            pos = 0
            while pos < len(body):
                if len(body) - pos < 65:
                    raise ValueError("truncated JPEG (DQT cut)")
                pq_, tq = body[pos] >> 4, body[pos] & 0xF
                if pq_ != 0:
                    raise ValueError("16-bit quant tables unsupported")
                t = np.zeros(64, dtype=np.int32)
                t[ZIGZAG] = np.frombuffer(
                    body[pos + 1: pos + 65], dtype=np.uint8)
                qtabs[tq] = t.reshape(8, 8)
                pos += 65
        elif marker == 0xFFC4:
            pos = 0
            while pos < len(body):
                if len(body) - pos < 17:
                    raise ValueError("truncated JPEG (DHT cut)")
                cls, tid = body[pos] >> 4, body[pos] & 0xF
                bits = list(body[pos + 1: pos + 17])
                nv = sum(bits)
                if len(body) - pos - 17 < nv:
                    raise ValueError("truncated JPEG (DHT cut)")
                vals = list(body[pos + 17: pos + 17 + nv])
                htabs[(cls, tid)] = _huff_decode_table(bits, vals)
                pos += 17 + nv
        elif marker == 0xFFC0:
            if len(body) < 6:
                raise ValueError("truncated JPEG (SOF cut)")
            prec, ph, pw, nc = struct.unpack_from(">BHHB", body, 0)
            if len(body) < 6 + 3 * nc:
                raise ValueError("truncated JPEG (SOF cut)")
            if prec != 8 or nc != 3:
                raise ValueError("need 8-bit 3-component baseline")
            comps = []
            for c in range(nc):
                cid, samp, tq = body[6 + 3 * c: 9 + 3 * c]
                if samp != 0x11:
                    raise ValueError("subsampled JPEG unsupported "
                                     "(this codec emits 4:4:4)")
                comps.append((cid, tq))
            sof = (ph, pw, comps)
        elif marker in (0xFFC1, 0xFFC2, 0xFFC3, 0xFFC5, 0xFFC6, 0xFFC7,
                        0xFFC9, 0xFFCA, 0xFFCB, 0xFFCD, 0xFFCE, 0xFFCF):
            raise ValueError("non-baseline JPEG mode unsupported")
        elif marker == 0xFFDD:
            raise ValueError("restart intervals unsupported")
        elif marker == 0xFFDA:
            if not body or len(body) < 1 + 2 * body[0]:
                raise ValueError("truncated JPEG (SOS cut)")
            ns = body[0]
            comp_tabs = []
            for c in range(ns):
                _cid, tt = body[1 + 2 * c: 3 + 2 * c]
                comp_tabs.append((tt >> 4, tt & 0xF))
            at = at + 2 + length
            break
        at += 2 + length
    if sof is None or comp_tabs is None:
        raise ValueError("JPEG missing SOF0/SOS")
    ph, pw, comps = sof
    nby, nbx = -(-ph // 8), -(-pw // 8)
    coeffs = [np.zeros((nby, nbx, 64), dtype=np.int32) for _ in comps]
    br = _BitReader(buf, at)
    prev_dc = [0, 0, 0]
    for by in range(nby):
        for bx in range(nbx):
            for c in range(3):
                dct, act = comp_tabs[c]
                dc_tab = htabs[(0, dct)]
                ac_tab = htabs[(1, act)]
                blk = coeffs[c][by, bx]
                size = br.huff(dc_tab)
                diff = _extend(br.bits(size), size) if size else 0
                prev_dc[c] += diff
                blk[0] = prev_dc[c]
                i = 1
                while i < 64:
                    rs = br.huff(ac_tab)
                    run, size = rs >> 4, rs & 0xF
                    if rs == 0x00:          # EOB
                        break
                    if rs == 0xF0:          # ZRL
                        i += 16
                        continue
                    i += run
                    blk[i] = _extend(br.bits(size), size)
                    i += 1
    qt = [qtabs[comps[0][1]], qtabs[comps[1][1]]]
    blocks = [c.reshape(nby, nbx, 64) for c in coeffs]
    unz = [np.zeros((nby, nbx, 64), dtype=np.int32) for _ in comps]
    for c in range(3):
        unz[c][:, :, ZIGZAG] = blocks[c]
    cubes = [u.reshape(nby, nbx, 8, 8) for u in unz]
    return _reconstruct(cubes, qt, ph, pw)
