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

_MERSENNE = (1 << 61) - 1

# Polynomial shingle combiner: xxHash prime multiplier + splitmix64's
# avalanche finisher. Set-Jaccard / MinHash similarity are invariant
# under the choice of injective shingle hash, so the scheme only needs
# determinism across runs/platforms — not a specific named function.
_COMB_MULT = np.uint64(11400714785074694791)
_AV1 = np.uint64(0xBF58476D1CE4E5B9)
_AV2 = np.uint64(0x94D049BB133111EB)


def _avalanche(x: np.ndarray) -> np.ndarray:
    x = x.astype(np.uint64).copy()
    x ^= x >> np.uint64(30)
    x *= _AV1
    x ^= x >> np.uint64(27)
    x *= _AV2
    x ^= x >> np.uint64(31)
    return x


PART_SALT = np.uint64(0x9E3779B97F4A7C15)


def hash_part(keys: np.ndarray, n_parts: int, salt: np.uint64 = PART_SALT) -> np.ndarray:
    """THE coarse-partition key: ``avalanche(key * salt) % n_parts`` →
    int32. Single shared implementation for the wide paths in
    training/relational/connected-components — one copy means a salt
    rotation can never silently de-correlate co-partitioned stages."""
    return (
        _avalanche(np.asarray(keys).astype(np.uint64) * salt) % np.uint64(n_parts)
    ).astype(np.int32)


# ASCII whitespace tokenizer (explicit class, NOT \s): Python's \s and
# str.split() match unicode whitespace (NBSP etc.) while RE2/DuckDB \s
# is ASCII-only — an explicit class keeps the Python kernels and the
# SQL oracles bit-identical on any input (same discipline as
# doc_quality_scores in pipelines/queries.py).
import re as _re

_WS_RE = _re.compile(r"[ \t\n\r\f\v]+")


def _tokenize(text: str) -> list[str]:
    return [w for w in _WS_RE.split((text or "").lower()) if w]


def _word_hashes(words: np.ndarray) -> np.ndarray:
    """uint64 hash per word: polynomial fold over the word's unicode
    code points (mod 2^64) + avalanche finish. Fully in-repo integer
    arithmetic — no pandas/siphash dependency — so signatures are
    stable across library versions AND replayable bit-exactly by the
    DuckDB oracles (pipelines/queries.py _minhash_oracle_sql). Each
    DISTINCT word is hashed once (np.unique vocabulary trick); the
    fold is vectorized over words, looping only over max word length."""
    if len(words) == 0:
        return np.empty(0, dtype=np.uint64)
    uniq, inv = np.unique(words, return_inverse=True)
    u = uniq.astype(np.str_)
    width = u.dtype.itemsize // 4
    cps = u.view(np.uint32).reshape(len(u), width).astype(np.uint64)
    # words contain no NULs, so padding zeros are exactly the tail
    lengths = (cps != 0).sum(axis=1)
    acc = np.zeros(len(u), dtype=np.uint64)
    for j in range(width):
        active = lengths > j
        if not active.any():
            break
        acc[active] = acc[active] * _COMB_MULT + cps[active, j]
    return _avalanche(acc)[inv]


def _rolling_shingles(wh: np.ndarray, k: int) -> np.ndarray:
    """Order-sensitive k-word shingle hashes from word hashes: sliding
    polynomial combine (vectorized over positions; Python loops only
    over k) + avalanche finish."""
    n = len(wh) - k + 1
    acc = np.zeros(n, dtype=np.uint64)
    for j in range(k):
        acc = acc * _COMB_MULT + wh[j : j + n]
    return _avalanche(acc)


def shingle_hashes(text: str, k: int = 5) -> np.ndarray:
    """Distinct shingle hashes of the k-word shingles of ``text``
    (single-doc convenience wrapper over ``shingle_hash_sets``)."""
    return shingle_hash_sets([text], k)[0]


def shingle_hash_sets(texts, k: int = 5) -> list[np.ndarray]:
    """Per-doc SORTED distinct k-word shingle-hash sets for a whole
    batch: one vectorized word-hash pass over the batch's concatenated
    words, then numpy rolling combines per doc. Docs shorter than k
    words hash their full word sequence; empty docs get an empty set."""
    tokenized = [_tokenize(t) for t in texts]
    nonempty = [np.asarray(w, dtype=object) for w in tokenized if w]
    wh = _word_hashes(np.concatenate(nonempty)) if nonempty else np.empty(0, dtype=np.uint64)
    out: list[np.ndarray] = []
    pos = 0
    for words in tokenized:
        nw = len(words)
        if nw == 0:
            out.append(np.empty(0, dtype=np.uint64))
            continue
        h = wh[pos : pos + nw]
        pos += nw
        out.append(np.unique(_rolling_shingles(h, min(k, nw))))
    return out


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
        """One uint64 bucket key per band: polynomial combine + avalanche
        of the band's signature rows (vectorized across bands). Docs
        sharing ANY band key are LSH candidates."""
        rows = self.num_perm // bands
        mat = sig[: bands * rows].reshape(bands, rows).astype(np.uint64)
        acc = np.zeros(bands, dtype=np.uint64)
        for j in range(rows):
            acc = acc * _COMB_MULT + mat[:, j]
        return _avalanche(acc)

    def signatures(self, shingle_sets: list[np.ndarray]) -> np.ndarray:
        """(n_docs, num_perm) signature matrix for a batch."""
        out = np.empty((len(shingle_sets), self.num_perm), dtype=np.uint64)
        for i, sh in enumerate(shingle_sets):
            out[i] = self.signature(sh)
        return out


def simhash(text: str, k: int = 3) -> int:
    """64-bit SimHash over k-word shingle hashes (Charikar 2002)."""
    return int(simhash_batch([text], k)[0])


def simhash_batch(texts, k: int = 3) -> np.ndarray:
    """Vectorized-per-batch SimHash: one vocabulary word-hash pass,
    then per-doc numpy bit voting."""
    tokenized = [_tokenize(t) for t in texts]
    nonempty = [np.asarray(w, dtype=object) for w in tokenized if w]
    wh = _word_hashes(np.concatenate(nonempty)) if nonempty else np.empty(0, dtype=np.uint64)
    out = np.empty(len(tokenized), dtype=np.uint64)
    shifts = np.arange(64, dtype=np.uint64)
    pos = 0
    for i, words in enumerate(tokenized):
        nw = len(words)
        if nw == 0:
            out[i] = 0
            continue
        h = wh[pos : pos + nw]
        pos += nw
        hashes = _rolling_shingles(h, min(k, nw))
        bits = ((hashes[:, None] >> shifts[None, :]) & np.uint64(1)).astype(np.int64)
        votes = (2 * bits - 1).sum(axis=0)
        out[i] = ((votes > 0).astype(np.uint64) << shifts).sum()
    return out


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


def containment(a: np.ndarray, b: np.ndarray) -> float:
    """Exact asymmetric containment max(|∩|/|a|, |∩|/|b|) — catches
    subset duplication (quoted/embedded documents) that symmetric
    Jaccard dilutes. Empty sets contain/are contained trivially
    (1.0), matching jaccard()'s both-empty convention."""
    if len(a) == 0 or len(b) == 0:
        return 1.0
    inter = len(np.intersect1d(a, b, assume_unique=True))
    return max(inter / len(a), inter / len(b))
