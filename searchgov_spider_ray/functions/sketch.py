"""HyperLogLog distinct-count sketch (Flajolet et al. 2007, public
construction) — the shuffle-free way to count distinct keys at 100 TB:
each batch folds into a 2^p-register array, registers max-merge
associatively across batches/blocks/nodes, and only the tiny register
table ever moves. The reference has no approximate counting (its
monitors count exactly at single-node scale, search_gov_crawler/
elasticsearch/monitors analog); this is a training-data-scale addition.

Everything up to the float estimate is INTEGER-exact and deterministic
(splitmix64 avalanche over salted keys, leading-zero rank via a
power-of-two searchsorted), so the register table itself is replayable
bit-for-bit in SQL (DuckDB: the same mulmod/avalanche chain, then
``instr(lpad(bin(w), 52, '0'), '1')`` for the rank) — the oracle checks
the sketch STATE, not just its estimate. The float estimate on top is
pinned by pytest against exact distinct counts.
"""

from __future__ import annotations

import numpy as np

from .simdedup import _avalanche

HLL_P = 12  # 4096 registers: ~1.6% standard error, 4 KB state
HLL_M = 1 << HLL_P
_W_BITS = 64 - HLL_P
# xxHash64 prime 2 — public constant, distinct from the sampler salt so
# sketch buckets don't correlate with sample selection
HLL_SALT = np.uint64(0xC2B2AE3D27D4EB4F)
_POW2 = np.uint64(1) << np.arange(_W_BITS, dtype=np.uint64)
_W_MASK = np.uint64((1 << _W_BITS) - 1)


def hll_partial(keys: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Fold a key batch into sparse registers: returns (bucket, rho_max)
    for the non-empty buckets only. Pure integer ops, vectorized."""
    h = _avalanche(keys.astype(np.uint64) * HLL_SALT)
    bucket = (h >> np.uint64(_W_BITS)).astype(np.int64)
    w = h & _W_MASK
    # bit_length(w) via power-of-two searchsorted — exact, no float log
    bitlen = np.searchsorted(_POW2, w, side="right")
    rho = (_W_BITS + 1 - bitlen).astype(np.int64)
    regs = np.zeros(HLL_M, dtype=np.int64)
    np.maximum.at(regs, bucket, rho)
    nz = np.flatnonzero(regs)
    return nz, regs[nz]


def hll_merge(parts: list[tuple[np.ndarray, np.ndarray]]) -> np.ndarray:
    """Max-merge sparse partials into a dense 2^p register array."""
    regs = np.zeros(HLL_M, dtype=np.int64)
    for bucket, rho in parts:
        np.maximum.at(regs, bucket, rho)
    return regs


def hll_estimate(regs: np.ndarray) -> float:
    """Standard HLL estimate with small-range (linear counting)
    correction; no large-range correction needed for 64-bit hashes."""
    m = float(HLL_M)
    alpha = 0.7213 / (1.0 + 1.079 / m)
    est = alpha * m * m / np.sum(np.power(2.0, -regs.astype(np.float64)))
    zeros = int(np.count_nonzero(regs == 0))
    if zeros and est <= 2.5 * m:
        est = m * np.log(m / zeros)
    return float(est)
