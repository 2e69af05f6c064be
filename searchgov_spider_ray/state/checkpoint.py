"""Per-round crawl checkpointing: frontier snapshots, URL-seen shard
dumps, lineage manifests.

Reference analog: the Redis-persistent frontier queue + dupefilter that
survive a killed crawl and resume on restart
(/root/reference/search_gov_crawler/search_gov_spiders/job_state/scheduler.py:44-58,
settings.py:73-80; SURVEY.md §2.2 K6, §4 checkpoint row).

Layout (``checkpoint_{k}`` = full state ENTERING round k):

    <ckpt_dir>/round_0000/
        frontier/*.parquet    rows (depth, seq, url, domain, url_hash)
        shards/shard_%04d.npz cuckoo + exact audit set per shard
        manifest.json         lineage: rows in/out, per-domain grants,
                              per-depth seq counters, shard sizes
    <ckpt_dir>/round_0001/ ...

The manifest is written LAST via tmp-file + atomic rename, so a round
directory with a readable manifest is complete by construction; resume
loads the highest complete round and deletes anything newer (a killed
round re-executes from its checkpointed entry state — admitted-but-
unfetched URLs survive, fetched rounds never re-fetch).
"""

from __future__ import annotations

import json
import shutil
from pathlib import Path


class CheckpointStore:
    def __init__(self, ckpt_dir: str | Path):
        self.root = Path(ckpt_dir)
        self.root.mkdir(parents=True, exist_ok=True)

    def round_dir(self, k: int) -> Path:
        return self.root / f"round_{k:04d}"

    def frontier_dir(self, k: int) -> Path:
        return self.round_dir(k) / "frontier"

    def shards_dir(self, k: int) -> Path:
        return self.round_dir(k) / "shards"

    def manifest_path(self, k: int) -> Path:
        return self.round_dir(k) / "manifest.json"

    def write_manifest(self, k: int, manifest: dict) -> None:
        path = self.manifest_path(k)
        tmp = path.with_suffix(".json.tmp")
        tmp.write_text(json.dumps(manifest, indent=2, sort_keys=True))
        tmp.rename(path)

    def read_manifest(self, k: int) -> dict | None:
        path = self.manifest_path(k)
        if not path.exists():
            return None
        try:
            return json.loads(path.read_text())
        except (json.JSONDecodeError, OSError):
            return None

    def latest_complete_round(self) -> int | None:
        """Highest round with a readable manifest (manifest-last write
        order makes this the completeness test). Max over the PARSED
        round number — directory sort order is lexicographic, and the
        4-digit zero-padding overflows at round 10000 ('round_9999'
        sorts after 'round_10000')."""
        best = None
        for d in self.root.glob("round_*"):
            try:
                k = int(d.name.split("_")[1])
            except (IndexError, ValueError):
                continue
            if (best is None or k > best) and self.read_manifest(k) is not None:
                best = k
        return best

    def drop_rounds_from(self, k: int) -> None:
        """Delete checkpoints for rounds ≥ k (resume hygiene: anything
        newer than the resume point is a partial, dead attempt)."""
        for d in self.root.glob("round_*"):
            try:
                if int(d.name.split("_")[1]) >= k:
                    shutil.rmtree(d)
            except (IndexError, ValueError):
                continue
