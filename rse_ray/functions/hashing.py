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


def simhash64(tokens: list[str]) -> int:
    """64-bit SimHash over token crc64-ish hashes (crc32 of token and of
    token+salt concatenated for the high half). Deterministic. Token
    hashing is the only per-token Python; bit voting is one vectorized
    unpack+sum over the whole doc."""
    if not tokens:
        return 0
    hs = np.fromiter(
        ((zlib.crc32(tb) << 32) | zlib.crc32(tb + b"#hi")
         for tb in (t.encode("utf-8") for t in tokens)),
        dtype=np.uint64, count=len(tokens),
    )
    bits = np.unpackbits(hs.view(np.uint8).reshape(-1, 8), axis=1)
    acc = 2 * bits.sum(axis=0, dtype=np.int64) - len(tokens)
    out = np.packbits((acc > 0).astype(np.uint8))
    return int(np.frombuffer(out.tobytes(), dtype=np.uint64)[0])


def hamming64(a: int, b: int) -> int:
    return bin(a ^ b).count("1")


def rolling_fingerprint(text: str, window: int = 64, mod_bits: int = 6) -> list[int]:
    """Winnowing-style content-defined fingerprints: Rabin-Karp rolling
    hash over bytes, keep hashes that are 0 mod 2^mod_bits. Used for
    document fingerprinting / container-defined chunking."""
    data = text.encode("utf-8")
    if len(data) < window:
        return [zlib.crc32(data)] if data else []
    BASE = 257
    MOD = (1 << 31) - 1
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
