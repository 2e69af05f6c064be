"""Deterministic hashing primitives.

The engine keys everything on 64-bit hashes of canonical URL forms:
dedup-shard routing, the URL-seen membership set, and checkpoint audit
tables (reference analog: scrapy-redis SHA1 request fingerprints,
/root/reference/search_gov_crawler/search_gov_spiders/job_state/dupefilter.py:8-25).

We use **xxHash64** (public spec, https://github.com/Cyan4973/xxHash)
as the canonical key hash. The ``xxhash`` C extension is not available
in this environment, so a spec-correct pure-Python implementation is
provided; ``xxhash64`` transparently uses the C library when importable
(the multi-node deployment path). Determinism is part of the contract:
checkpointed URL-seen sets must hash identically across resume runs and
across nodes.

Doc ids are sha256 hex of the canonical URL (reference:
elasticsearch/i14y_helper.py:170-173); job/spider ids are shake_256
5-byte digests (helpers/domain_spider.py:170-180).
"""

from __future__ import annotations

import hashlib
import struct

import numpy as np

_MASK = 0xFFFFFFFFFFFFFFFF
_P1 = 11400714785074694791
_P2 = 14029467366897019727
_P3 = 1609587929392839161
_P4 = 9650029242287828579
_P5 = 2870177450012600261

_u64 = struct.Struct("<Q").unpack_from
_u32 = struct.Struct("<I").unpack_from

try:  # pragma: no cover - exercised only where the C lib exists
    import xxhash as _xxhash_c

    def xxhash64(data: bytes | str, seed: int = 0) -> int:
        if isinstance(data, str):
            data = data.encode("utf-8")
        return _xxhash_c.xxh64_intdigest(data, seed)

except ImportError:

    def xxhash64(data: bytes | str, seed: int = 0) -> int:
        """xxHash64 of ``data`` (spec-correct pure-Python fallback)."""
        if isinstance(data, str):
            data = data.encode("utf-8")
        n = len(data)
        i = 0
        if n >= 32:
            v1 = (seed + _P1 + _P2) & _MASK
            v2 = (seed + _P2) & _MASK
            v3 = seed & _MASK
            v4 = (seed - _P1) & _MASK
            end = n - 32
            while i <= end:
                v1 = (v1 + _u64(data, i)[0] * _P2) & _MASK
                v1 = ((v1 << 31 | v1 >> 33) & _MASK) * _P1 & _MASK
                v2 = (v2 + _u64(data, i + 8)[0] * _P2) & _MASK
                v2 = ((v2 << 31 | v2 >> 33) & _MASK) * _P1 & _MASK
                v3 = (v3 + _u64(data, i + 16)[0] * _P2) & _MASK
                v3 = ((v3 << 31 | v3 >> 33) & _MASK) * _P1 & _MASK
                v4 = (v4 + _u64(data, i + 24)[0] * _P2) & _MASK
                v4 = ((v4 << 31 | v4 >> 33) & _MASK) * _P1 & _MASK
                i += 32
            h = (
                ((v1 << 1 | v1 >> 63) & _MASK)
                + ((v2 << 7 | v2 >> 57) & _MASK)
                + ((v3 << 12 | v3 >> 52) & _MASK)
                + ((v4 << 18 | v4 >> 46) & _MASK)
            ) & _MASK
            for v in (v1, v2, v3, v4):
                v = (v * _P2) & _MASK
                v = ((v << 31 | v >> 33) & _MASK) * _P1 & _MASK
                h = ((h ^ v) * _P1 + _P4) & _MASK
        else:
            h = (seed + _P5) & _MASK
        h = (h + n) & _MASK
        while i + 8 <= n:
            k = (_u64(data, i)[0] * _P2) & _MASK
            k = ((k << 31 | k >> 33) & _MASK) * _P1 & _MASK
            h ^= k
            h = (((h << 27 | h >> 37) & _MASK) * _P1 + _P4) & _MASK
            i += 8
        if i + 4 <= n:
            h ^= (_u32(data, i)[0] * _P1) & _MASK
            h = (((h << 23 | h >> 41) & _MASK) * _P2 + _P3) & _MASK
            i += 4
        while i < n:
            h ^= (data[i] * _P5) & _MASK
            h = ((h << 11 | h >> 53) & _MASK) * _P1 & _MASK
            i += 1
        h ^= h >> 33
        h = (h * _P2) & _MASK
        h ^= h >> 29
        h = (h * _P3) & _MASK
        h ^= h >> 32
        return h


def xxhash64_array(values, seed: int = 0) -> np.ndarray:
    """xxHash64 of each string/bytes in ``values`` → ``np.uint64`` array.

    Used per Arrow batch inside ``map_batches``; the loop body is the
    tight local-variable form above (≈1–3 µs/short URL per core). On a
    real cluster the C ``xxhash`` path makes this ~50 ns/URL; the hash
    VALUES are identical either way, so checkpoints are portable.
    """
    f = xxhash64
    out = np.empty(len(values), dtype=np.uint64)
    for j, v in enumerate(values):
        out[j] = f(v, seed)
    return out


def sha256_hex(value: bytes | str) -> str:
    """sha256 hex doc id (reference: i14y_helper.py:170-173)."""
    if isinstance(value, str):
        value = value.encode("utf-8")
    return hashlib.sha256(value).hexdigest()


def shake_id(*args, digest_bytes: int = 5) -> str:
    """shake_256 short id from args (reference: helpers/domain_spider.py:170-180)."""
    h = hashlib.shake_256("::".join(str(a) for a in args).encode("utf-8"))
    return h.hexdigest(digest_bytes)
