"""Near-duplicate hashing kernels: shingles, MinHash, SimHash, Jaccard.

Published algorithms only: MinHash (Broder 1997), banded LSH (Mining of
Massive Datasets ch.3), SimHash (Charikar 2002).  NumPy-vectorized per
document; permutation parameters are fixed module constants so
signatures are stable across runs/processes (a dedup key must never
depend on ``PYTHONHASHSEED`` — we use blake2b, not ``hash()``).
"""

from __future__ import annotations

import hashlib
import struct

import numpy as np

_MERSENNE = (1 << 61) - 1
_N_PERM_DEFAULT = 128


def _stable_u64(token: str) -> int:
    return struct.unpack("<Q", hashlib.blake2b(token.encode("utf-8"), digest_size=8).digest())[0]


def shingles(text: str, k: int = 5) -> set[int]:
    """Word k-shingles → stable 64-bit ids."""
    toks = text.split()
    if len(toks) < k:
        return {_stable_u64(" ".join(toks))} if toks else set()
    return {_stable_u64(" ".join(toks[i : i + k])) for i in range(len(toks) - k + 1)}


def char_ngrams(text: str, n: int = 3) -> set[int]:
    if len(text) < n:
        return {_stable_u64(text)} if text else set()
    return {_stable_u64(text[i : i + n]) for i in range(len(text) - n + 1)}


def _perm_params(n_perm: int) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.RandomState(1729)  # fixed: signature stability
    # multiply-shift family (Dietzfelbinger et al.): odd 64-bit a, any b;
    # arithmetic wraps mod 2^64 (numpy uint64 wraparound), fully
    # vectorizable — no big-int modular reduction needed.
    a = rng.randint(1, 1 << 62, size=n_perm, dtype=np.uint64) | np.uint64(1)
    b = rng.randint(0, 1 << 62, size=n_perm, dtype=np.uint64)
    return a, b


_PERM_A, _PERM_B = _perm_params(_N_PERM_DEFAULT)


def minhash_signature(shingle_ids: set[int], n_perm: int = _N_PERM_DEFAULT) -> np.ndarray:
    """MinHash signature (uint64[n_perm]): min over shingles of the
    multiply-shift hash h_i(x) = a_i*x + b_i (mod 2^64), vectorized over
    (perm, shingle)."""
    if not shingle_ids:
        return np.full(n_perm, np.iinfo(np.uint64).max, dtype=np.uint64)
    x = np.fromiter(shingle_ids, dtype=np.uint64, count=len(shingle_ids))
    with np.errstate(over="ignore"):
        hx = _PERM_A[:n_perm, None] * x[None, :] + _PERM_B[:n_perm, None]
    return hx.min(axis=1)


def lsh_band_keys(sig: np.ndarray, n_bands: int = 16) -> list[int]:
    """Split the signature into ``n_bands`` bands; each band hashes to a
    stable bucket key.  Candidate pairs share (band_id, band_key)."""
    rows = len(sig) // n_bands
    keys = []
    for band in range(n_bands):
        chunk = sig[band * rows : (band + 1) * rows].tobytes()
        digest = hashlib.blake2b(chunk, digest_size=8).digest()
        keys.append(struct.unpack("<q", digest)[0])
    return keys


def jaccard(a: set[int], b: set[int]) -> float:
    if not a and not b:
        return 1.0
    if not a or not b:
        return 0.0
    return len(a & b) / len(a | b)


def simhash64(text: str) -> int:
    """64-bit SimHash over word 2-shingles (Charikar 2002)."""
    toks = text.split()
    feats = (
        [" ".join(toks[i : i + 2]) for i in range(len(toks) - 1)] if len(toks) > 1 else toks
    )
    if not feats:
        return 0
    hs = np.fromiter((_stable_u64(f) for f in feats), dtype=np.uint64, count=len(feats))
    bits = (hs[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & np.uint64(1)
    acc = (2 * bits.astype(np.int64) - 1).sum(axis=0)
    out_bits = (acc > 0).astype(np.uint64) << np.arange(64, dtype=np.uint64)
    return int(out_bits.sum(dtype=np.uint64))


def hamming64(a: int, b: int) -> int:
    return bin(a ^ b).count("1")
