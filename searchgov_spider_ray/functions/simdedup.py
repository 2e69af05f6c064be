"""Near-duplicate primitives: shingling, MinHash, LSH banding, SimHash,
n-gram Jaccard. Pure numpy kernels designed to run per Arrow batch
inside ``map_batches``; the distributed parts (band groupby, candidate
verification) live in ``pipelines/training.py``.

Public-technique provenance: MinHash (Broder 1997), LSH banding
(Mining of Massive Datasets ch.3), SimHash (Charikar 2002). The
reference engine's dedup is exact-only (SURVEY.md §2.4 A1/A2); these
are the scale additions for training-data curation.
"""

from __future__ import annotations

import numpy as np

from .hashing import xxhash64

_MERSENNE = (1 << 61) - 1


def shingle_hashes(text: str, k: int = 5) -> np.ndarray:
    """Distinct xxhash64 values of the k-word shingles of ``text``."""
    words = text.lower().split()
    if len(words) < k:
        return np.array([xxhash64(" ".join(words))], dtype=np.uint64) if words else np.array([], dtype=np.uint64)
    seen = {xxhash64(" ".join(words[i : i + k])) for i in range(len(words) - k + 1)}
    return np.fromiter(seen, dtype=np.uint64, count=len(seen))


class MinHasher:
    """num_perm-permutation MinHash via the standard (a*x+b) mod p family.

    Deterministic (fixed seed) so signatures are comparable across
    workers and across runs — required for checkpointed dedup state.
    """

    def __init__(self, num_perm: int = 128, seed: int = 42):
        rng = np.random.RandomState(seed)
        self.num_perm = num_perm
        self.a = rng.randint(1, _MERSENNE, size=num_perm, dtype=np.uint64)
        self.b = rng.randint(0, _MERSENNE, size=num_perm, dtype=np.uint64)

    def signature(self, shingles: np.ndarray) -> np.ndarray:
        """(num_perm,) uint64 signature; all-max for empty docs."""
        if len(shingles) == 0:
            return np.full(self.num_perm, np.iinfo(np.uint64).max, dtype=np.uint64)
        # (num_perm, n) permuted values — vectorized over both axes.
        x = shingles.astype(np.uint64)[None, :]
        vals = (self.a[:, None] * x + self.b[:, None]) % np.uint64(_MERSENNE)
        return vals.min(axis=1)

    def band_keys(self, sig: np.ndarray, bands: int = 16) -> np.ndarray:
        """One uint64 bucket key per band: hash of the band's rows.
        Docs sharing ANY band key are LSH candidates."""
        rows = self.num_perm // bands
        out = np.empty(bands, dtype=np.uint64)
        for b in range(bands):
            out[b] = xxhash64(sig[b * rows : (b + 1) * rows].tobytes())
        return out


def simhash(text: str, k: int = 3) -> int:
    """64-bit SimHash over k-word shingle hashes (Charikar 2002)."""
    words = text.lower().split()
    if not words:
        return 0
    n = max(1, len(words) - k + 1)
    hashes = np.fromiter(
        (xxhash64(" ".join(words[i : i + k])) for i in range(n)),
        dtype=np.uint64,
        count=n,
    )
    bits = ((hashes[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & np.uint64(1)).astype(np.int64)
    votes = (2 * bits - 1).sum(axis=0)
    return int(((votes > 0).astype(np.uint64) << np.arange(64, dtype=np.uint64)).sum())


def hamming64(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Element-wise Hamming distance between uint64 arrays (vectorized
    popcount via the classic SWAR bit-trick)."""
    v = (a ^ b).astype(np.uint64)
    v = v - ((v >> np.uint64(1)) & np.uint64(0x5555555555555555))
    v = (v & np.uint64(0x3333333333333333)) + ((v >> np.uint64(2)) & np.uint64(0x3333333333333333))
    v = (v + (v >> np.uint64(4))) & np.uint64(0x0F0F0F0F0F0F0F0F)
    return ((v * np.uint64(0x0101010101010101)) >> np.uint64(56)).astype(np.int64)


def jaccard(a: np.ndarray, b: np.ndarray) -> float:
    """Exact Jaccard of two shingle-hash sets (candidate verification)."""
    if len(a) == 0 and len(b) == 0:
        return 1.0
    inter = len(np.intersect1d(a, b, assume_unique=True))
    return inter / (len(a) + len(b) - inter)
