"""Deterministic hashing kernels for dedup: shingles, MinHash, SimHash.

All hashes are process-stable (blake2b-based — never Python's salted
``hash()``) so signatures computed on different Ray workers agree.
"""

from __future__ import annotations

import hashlib

import numpy as np

_MERSENNE = (1 << 61) - 1
_MAXH = (1 << 61) - 2


def stable_hash64(token: str) -> int:
    """64-bit stable hash of a string (blake2b, 8-byte digest)."""
    return int.from_bytes(hashlib.blake2b(token.encode("utf-8"), digest_size=8).digest(), "little")


def word_shingles(text: str, k: int = 3) -> set[int]:
    """Hashed k-word shingles (lowercased); whole-doc shingle if < k words."""
    words = text.lower().split()
    if len(words) < k:
        return {stable_hash64(" ".join(words))} if words else set()
    return {stable_hash64(" ".join(words[i : i + k])) for i in range(len(words) - k + 1)}


def minhash_params(num_perm: int, seed: int = 1) -> tuple[np.ndarray, np.ndarray]:
    """(a, b) for the xor-multiply permutation h_i(x) = ((x ^ b_i) * a_i)
    mod 2^64 — a_i odd makes it a bijection of uint64, so the min over a
    shingle set is a valid MinHash.  Pure uint64 numpy (no big-int mods)."""
    rng = np.random.RandomState(seed)
    a = rng.randint(0, 1 << 62, size=num_perm).astype(np.uint64) * np.uint64(2) + np.uint64(1)
    b = rng.randint(0, 1 << 62, size=num_perm).astype(np.uint64)
    return a, b


def minhash_signature(shingles: set[int], a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """MinHash signature (num_perm,) uint64; empty set -> all-ones sentinel."""
    if not shingles:
        return np.full(a.shape[0], np.iinfo(np.uint64).max, dtype=np.uint64)
    x = np.fromiter(shingles, dtype=np.uint64, count=len(shingles))
    with np.errstate(over="ignore"):
        vals = (x[None, :] ^ b[:, None]) * a[:, None]  # uint64 wraparound is the point
    return vals.min(axis=1)


def band_keys(sig: np.ndarray, bands: int) -> list[bytes]:
    """Split a signature into ``bands`` equal slices; md5 each slice."""
    rows = sig.shape[0] // bands
    return [
        hashlib.md5(sig[i * rows : (i + 1) * rows].tobytes()).digest()[:8]
        for i in range(bands)
    ]


def jaccard(a: set[int], b: set[int]) -> float:
    if not a and not b:
        return 1.0
    if not a or not b:
        return 0.0
    inter = len(a & b)
    return inter / (len(a) + len(b) - inter)


_BITPOS = np.arange(64, dtype=np.uint64)


def simhash64(text: str) -> int:
    """64-bit SimHash over lowercased word unigrams."""
    words = text.lower().split()
    if not words:
        return 0
    h = np.fromiter((stable_hash64(w) for w in words), dtype=np.uint64, count=len(words))
    bits = ((h[:, None] >> _BITPOS[None, :]) & np.uint64(1)).astype(np.int32)
    votes = (2 * bits - 1).sum(axis=0)
    return int(((votes > 0).astype(np.uint64) << _BITPOS).sum())


def hamming64(a: int, b: int) -> int:
    return bin(a ^ b).count("1")
