"""Cuckoo filter + UrlSeenShard unit tests."""

from __future__ import annotations

import numpy as np
import pytest

from searchgov_spider_ray.state.cuckoo import CuckooFilter, UrlSeenShard


class TestCuckooFilter:
    def test_insert_contains(self):
        f = CuckooFilter(capacity=1 << 12)
        rng = np.random.RandomState(7)
        keys = rng.randint(0, 2**63, size=1000).astype(np.uint64)
        for k in keys:
            f.insert(int(k))
        assert f.count == 1000
        # no false negatives, ever
        assert f.contains_batch(keys).all()

    def test_false_positive_rate_bounded(self):
        f = CuckooFilter(capacity=1 << 12)
        rng = np.random.RandomState(7)
        keys = rng.randint(0, 2**63, size=1000).astype(np.uint64)
        for k in keys:
            f.insert(int(k))
        probe = rng.randint(0, 2**63, size=20000).astype(np.uint64)
        fpr = f.contains_batch(probe).mean()
        assert fpr < 0.01  # 16-bit fingerprints → ~2^-13 expected

    def test_delete(self):
        f = CuckooFilter(capacity=1 << 8)
        f.insert(12345)
        assert f.contains_batch(np.array([12345], dtype=np.uint64))[0]
        assert f.delete(12345)
        assert not f.contains_batch(np.array([12345], dtype=np.uint64))[0]
        assert not f.delete(999)

    def test_dump_load_roundtrip(self):
        f = CuckooFilter(capacity=1 << 10)
        keys = np.arange(500, dtype=np.uint64) * 7919
        for k in keys:
            f.insert(int(k))
        g = CuckooFilter.load(f.dump())
        assert g.count == f.count
        assert g.contains_batch(keys).all()

    def test_full_raises(self):
        f = CuckooFilter(capacity=4)  # tiny: 1 bucket... pow2 → few slots
        with pytest.raises(RuntimeError):
            for i in range(10000):
                f.insert(i * 2654435761)


class TestUrlSeenShard:
    def test_first_wins_within_batch(self):
        s = UrlSeenShard(capacity=1 << 8)
        h = np.array([1, 2, 1, 3, 2], dtype=np.uint64)
        novel = s.test_and_add(h)
        assert novel.tolist() == [True, True, False, True, False]
        assert len(s) == 3

    def test_across_batches(self):
        s = UrlSeenShard(capacity=1 << 8)
        assert s.test_and_add(np.array([10, 20], dtype=np.uint64)).all()
        again = s.test_and_add(np.array([20, 30], dtype=np.uint64))
        assert again.tolist() == [False, True]
        assert s.contains(np.array([10, 20, 30, 40], dtype=np.uint64)).tolist() == [
            True, True, True, False,
        ]

    def test_dump_load_exact_parity(self):
        s = UrlSeenShard(capacity=1 << 10)
        keys = (np.arange(700, dtype=np.uint64) * 1099511628211) % (2**63)
        s.test_and_add(keys)
        t = UrlSeenShard.load(s.dump())
        assert t.exact == s.exact
        assert t.contains(keys).all()
        # novelty continues correctly post-restore
        assert not t.test_and_add(keys[:5]).any()
