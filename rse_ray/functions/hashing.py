"""Hashing/sketching kernels for the dedup family: word shingles,
MinHash signatures, SimHash, rolling (Rabin-Karp style) fingerprints.

All hashes are seeded deterministically (no process randomness) so
pipelines are reproducible across runs and parallelism levels. Vector
math is numpy; per-doc token work is plain Python over already-split
tokens (C-speed string hashing via zlib.crc32 / hash of bytes).
"""

from __future__ import annotations

import zlib

import numpy as np

# Mersenne-31 modulus: with a, b, x all < 2^31, a*x + b < 2^62 stays
# inside uint64, so the whole signature computation is overflow-safe
# vectorized numpy (2^31 hash space is plenty for per-doc shingle sets)
_MERSENNE = (1 << 31) - 1


def shingles(tokens: list[str], n: int = 3) -> set[bytes]:
    """Word n-gram shingles as joined byte strings."""
    if len(tokens) < n:
        return {" ".join(tokens).encode("utf-8")} if tokens else set()
    return {
        " ".join(tokens[i : i + n]).encode("utf-8")
        for i in range(len(tokens) - n + 1)
    }


def _shingle_hashes(sh: set[bytes]) -> np.ndarray:
    return np.fromiter((zlib.crc32(s) for s in sh), dtype=np.uint64, count=len(sh))


class MinHasher:
    """num_perm universal hashes h_i(x) = (a_i*x + b_i) mod p, min over
    shingles. Deterministic for a given seed. Build once per actor."""

    def __init__(self, num_perm: int = 128, seed: int = 7) -> None:
        rng = np.random.default_rng(seed)
        self.num_perm = num_perm
        self.a = rng.integers(1, _MERSENNE, size=num_perm).astype(np.uint64)
        self.b = rng.integers(0, _MERSENNE, size=num_perm).astype(np.uint64)

    def signature(self, tokens: list[str], n: int = 3) -> np.ndarray:
        sh = shingles(tokens, n)
        if not sh:
            return np.full(self.num_perm, _MERSENNE, dtype=np.uint64)
        x = _shingle_hashes(sh) % np.uint64(_MERSENNE)
        h = (self.a[:, None] * x[None, :] + self.b[:, None]) % np.uint64(_MERSENNE)
        return np.min(h, axis=1)

    def signatures_batch(self, tokens_list: list[list[str]],
                         n: int = 3) -> np.ndarray:
        """(len(tokens_list), num_perm) signatures — one hash matrix +
        one reduceat over the whole batch instead of per-doc numpy
        calls. Identical values to signature() per doc."""
        xs, counts = [], []
        for toks in tokens_list:
            sh = shingles(toks, n)
            counts.append(len(sh))
            if sh:
                xs.append(_shingle_hashes(sh) % np.uint64(_MERSENNE))
        out = np.full((len(tokens_list), self.num_perm), _MERSENNE,
                      dtype=np.uint64)
        if not xs:
            return out
        x_all = np.concatenate(xs)
        h = (self.a[:, None] * x_all[None, :] + self.b[:, None]) % np.uint64(
            _MERSENNE
        )
        nonempty = np.flatnonzero(np.asarray(counts) > 0)
        starts = np.concatenate(
            ([0], np.cumsum([c for c in counts if c > 0])[:-1])
        ).astype(np.int64)
        out[nonempty] = np.minimum.reduceat(h, starts, axis=1).T
        return out

    def band_keys(self, sig: np.ndarray, num_bands: int) -> list[int]:
        """LSH band hashes: split the signature into bands, hash each."""
        rows = self.num_perm // num_bands
        keys = []
        for b in range(num_bands):
            band = sig[b * rows : (b + 1) * rows]
            keys.append(zlib.crc32(band.tobytes()) & 0xFFFFFFFF)
        return keys


def minhash_jaccard(sig_a: np.ndarray, sig_b: np.ndarray) -> float:
    return float(np.mean(sig_a == sig_b))


def exact_jaccard(tokens_a: list[str], tokens_b: list[str], n: int = 3) -> float:
    sa, sb = shingles(tokens_a, n), shingles(tokens_b, n)
    if not sa and not sb:
        return 1.0
    inter = len(sa & sb)
    union = len(sa) + len(sb) - inter
    return inter / union if union else 0.0


_BIT_IDX = np.arange(64, dtype=np.uint64)
_BIT_POW = np.uint64(1) << _BIT_IDX


def simhash64(tokens: list[str]) -> int:
    """64-bit SimHash. The per-token hash is md5's HIGH 8 digest bytes
    read little-endian — exactly DuckDB's ``md5_number_lower(tok)`` —
    so the whole signature is reproducible in SQL (the driver oracle
    recomputes it): bit b of the signature is set iff
    sum over tokens of (2*((h >> b) & 1) - 1) > 0. Deterministic;
    token hashing is the only per-token Python, bit voting is one
    vectorized shift+sum over the whole doc."""
    if not tokens:
        return 0
    import hashlib

    hs = np.fromiter(
        (int.from_bytes(hashlib.md5(t.encode("utf-8")).digest()[8:], "little")
         for t in tokens),
        dtype=np.uint64, count=len(tokens),
    )
    bits = (hs[:, None] >> _BIT_IDX[None, :]) & np.uint64(1)
    acc = 2 * bits.sum(axis=0, dtype=np.int64) - len(tokens)
    return int(_BIT_POW[acc > 0].sum(dtype=np.uint64))


def hamming64(a: int, b: int) -> int:
    return bin(a ^ b).count("1")


_RK_BASE = 257
_RK_MOD = (1 << 31) - 1


def poly_hash(data: bytes) -> int:
    """Polynomial hash Σ data[i]*BASE^(n-1-i) mod 2^31-1 — the same
    family the rolling window uses, so the short-document fallback of
    rolling_fingerprint is SQL-reproducible (a weighted sum + one mod,
    no crc32 needed)."""
    h = 0
    for b in data:
        h = (h * _RK_BASE + b) % _RK_MOD
    return h


def rolling_fingerprint(text: str, window: int = 64, mod_bits: int = 6) -> list[int]:
    """Winnowing-style content-defined fingerprints: Rabin-Karp rolling
    hash over bytes, keep hashes that are 0 mod 2^mod_bits. Used for
    document fingerprinting / container-defined chunking. Documents
    shorter than the window emit one whole-document polynomial hash
    (ungated), so every non-empty doc has >=1 fingerprint."""
    data = text.encode("utf-8")
    if len(data) < window:
        return [poly_hash(data)] if data else []
    BASE = _RK_BASE
    MOD = _RK_MOD
    pw = pow(BASE, window - 1, MOD)
    h = 0
    out = []
    mask = (1 << mod_bits) - 1
    for i, byte in enumerate(data):
        if i >= window:
            h = (h - data[i - window] * pw) % MOD
        h = (h * BASE + byte) % MOD
        if i >= window - 1 and (h & mask) == 0:
            out.append(h)
    return out


def cdc_boundaries(data: bytes, window: int = 16,
                   mod_bits: int = 5) -> list[int]:
    """Content-defined chunk cut points (FastCDC/LBFS family, gear
    replaced by the repo's Rabin-Karp convention so the SQL twin can
    recompute it closed-form): cut AFTER byte i (1-based) whenever the
    window hash ending at i is 0 mod 2^mod_bits; EOF always closes the
    last chunk. Because boundaries depend only on local content, an
    insertion resynchronizes within one window — the property that
    makes chunk-level dedup robust to edits, unlike fixed-size blocks.
    Docs shorter than the window yield the single whole-doc chunk."""
    n = len(data)
    if n == 0:
        return []
    cuts: list[int] = []
    if n >= window:
        h = 0
        pw = pow(_RK_BASE, window - 1, _RK_MOD)
        mask = (1 << mod_bits) - 1
        for i, byte in enumerate(data):
            if i >= window:
                h = (h - data[i - window] * pw) % _RK_MOD
            h = (h * _RK_BASE + byte) % _RK_MOD
            if i >= window - 1 and (h & mask) == 0:
                cuts.append(i + 1)
    if not cuts or cuts[-1] != n:
        cuts.append(n)
    return cuts
