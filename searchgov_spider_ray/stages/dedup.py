"""Sharded URL-seen dedup: actor pool of :class:`UrlSeenShard`s plus the
map_batches routing stage.

Replaces the reference's Redis dupefilter (scrapy-redis RFPDupeFilter,
/root/reference/search_gov_crawler/search_gov_spiders/job_state/dupefilter.py:8-25;
SURVEY.md §2.4 A2). Shard routing key: ``xxhash64(canonical_url) % S``
— the ONE partitioning key reused across dedup, checkpoint layout and
the seen-parity audit. On a multi-node cluster the S shard actors
spread across nodes (Ray schedules them round-robin); each frontier
batch makes at most S actor calls with vectorized hash arrays, so
chatter is O(batches × shards), not O(rows).

Exactly-once admission under task retries (SURVEY.md §7.5.2):
``test_and_add`` is memoized per (round, batch-digest) inside the
actor, so a retried map_batches task replays the original novelty mask
instead of classifying its rows as duplicates.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np
import pyarrow as pa
import ray

from ..functions.hashing import xxhash64
from ..state.cuckoo import UrlSeenShard


@ray.remote(num_cpus=0.25)
class DedupShardActor:
    """One URL-seen shard. Long-lived across rounds within a job.

    num_cpus=0.25: the shard does short vectorized membership ops per
    call, not sustained compute — a full-CPU reservation per shard
    would starve the task pool (S shards × jobs would eat the node)."""

    def __init__(self, shard_id: int, capacity: int = 1 << 16):
        self.shard_id = shard_id
        self.shard = UrlSeenShard(capacity=capacity, seed=shard_id)
        self._memo: dict[tuple[int, int], np.ndarray] = {}
        self._round = 0

    def test_and_add(self, round_id: int, batch_digest: int, hashes: np.ndarray) -> np.ndarray:
        key = (round_id, batch_digest)
        if key in self._memo:
            return self._memo[key]
        mask = self.shard.test_and_add(hashes)
        self._memo[key] = mask
        return mask

    def contains(self, hashes: np.ndarray) -> np.ndarray:
        return self.shard.contains(hashes)

    def end_round(self, round_id: int) -> int:
        """Clear the retry memo for completed rounds; returns shard size."""
        self._memo = {k: v for k, v in self._memo.items() if k[0] > round_id}
        self._round = round_id + 1
        return len(self.shard)

    def size(self) -> int:
        return len(self.shard)

    def dump(self) -> bytes:
        return self.shard.dump()

    def dump_to(self, path: str) -> int:
        """Write this shard's checkpoint file from inside the actor —
        all shards dump concurrently instead of shipping bytes through
        the driver (multi-node: path is on shared/job storage)."""
        Path(path).parent.mkdir(parents=True, exist_ok=True)
        tmp = Path(path).with_suffix(".tmp")
        tmp.write_bytes(self.shard.dump())
        tmp.rename(path)
        return len(self.shard)

    def restore(self, data: bytes) -> int:
        self.shard = UrlSeenShard.load(data)
        return len(self.shard)


def make_shard_pool(num_shards: int, capacity: int = 1 << 16) -> list:
    """Spawn the shard actor pool (driver-side, once per job)."""
    return [DedupShardActor.remote(i, capacity) for i in range(num_shards)]


class DedupRouter:
    """map_batches stage: routes each row's ``url_hash`` to its shard
    actor, appends a ``novel`` bool column. MUTATES shard state — the
    dataset containing this stage must be materialized exactly once
    (the frontier loop does; the retry memo covers task-level replays).
    """

    def __init__(self, shard_handles: list, round_id: int):
        self.shards = shard_handles
        self.num_shards = len(shard_handles)
        self.round_id = round_id

    def __call__(self, batch: pa.Table) -> pa.Table:
        hashes = batch["url_hash"].to_numpy().astype(np.uint64)
        shard_of = (hashes % np.uint64(self.num_shards)).astype(np.int64)
        novel = np.zeros(len(hashes), dtype=bool)
        futures = {}
        for s in np.unique(shard_of):
            idx = np.where(shard_of == s)[0]
            sub = hashes[idx]
            digest = int(xxhash64(sub.tobytes()))
            futures[int(s)] = (idx, self.shards[int(s)].test_and_add.remote(self.round_id, digest, sub))
        for s, (idx, fut) in futures.items():
            novel[idx] = ray.get(fut)
        return batch.append_column("novel", pa.array(novel))


def dump_shards(shard_handles: list, out_dir: str | Path) -> list[str]:
    """Checkpoint every shard's filter+audit state (K6 analog) — the
    actors write their own files concurrently."""
    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    paths = [str(out / f"shard_{i:04d}.npz") for i in range(len(shard_handles))]
    ray.get([s.dump_to.remote(p) for s, p in zip(shard_handles, paths)])
    return paths


def restore_shards(shard_handles: list, ckpt_dir: str | Path) -> list[int]:
    ckpt = Path(ckpt_dir)
    futs = []
    for i, s in enumerate(shard_handles):
        futs.append(s.restore.remote((ckpt / f"shard_{i:04d}.npz").read_bytes()))
    return ray.get(futs)
