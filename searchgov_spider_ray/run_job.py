"""``ray job submit`` entry point for one crawl job.

The north-rule run surface: a killed job resubmitted with ``--resume``
restores the latest complete round checkpoint (frontier + cuckoo
shards + lineage) and continues without re-fetching or violating
politeness (reference analog: the Redis-persistent queue/dupefilter
resume at /root/reference/search_gov_crawler/search_gov_spiders/
job_state/scheduler.py:44-47).

Usage (local or through Ray's job API — the script owns its session
only when none exists, so ``ray job submit`` drivers work unchanged):

    ray job submit -- python -m searchgov_spider_ray.run_job \
        --seeds /corpus/seeds.json --job plain \
        --corpus /corpus --out /runs/plain [--resume] [--num-shards 8]

Prints one JSON line with the run result.
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(description="Run one crawl-frontier job")
    ap.add_argument("--seeds", required=True, help="crawl-sites JSON (reference format)")
    ap.add_argument("--job", required=True, help="site name in the seeds file")
    ap.add_argument("--corpus", required=True, help="corpus directory (sandbox fetch source)")
    ap.add_argument("--out", required=True, help="output/checkpoint directory")
    ap.add_argument("--resume", action="store_true", help="resume from latest checkpoint")
    ap.add_argument("--round-seconds", type=float, default=30.0)
    ap.add_argument("--num-shards", type=int, default=8)
    ap.add_argument("--shard-capacity", type=int, default=1 << 19)
    ap.add_argument(
        "--json-logging",
        action="store_true",
        help="emit JSON log lines (reference JSON_LOGGING_ENABLED extension)",
    )
    ap.add_argument("--log-level", default="INFO")
    args = ap.parse_args(argv)

    import ray

    if not ray.is_initialized():
        # address=None attaches to the submitting cluster when RAY_ADDRESS
        # is set (the `ray job submit` path) and starts a local instance
        # otherwise; address="local" would FORCE a nested single-node Ray
        # on the head node, silently ignoring every worker
        ray.init(address=None, include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from .pipelines.frontier import CrawlConfig, CrawlJobRunner
    from .sources.crawl_sites import CrawlSites

    sites = {s.name: s for s in CrawlSites.from_file(args.seeds).sites}
    if args.job not in sites:
        print(json.dumps({"error": f"unknown job {args.job!r}", "available": sorted(sites)}))
        return 2
    cfg = CrawlConfig(
        round_seconds=args.round_seconds,
        num_shards=args.num_shards,
        shard_capacity=args.shard_capacity,
    )
    site = sites[args.job]
    if args.json_logging:
        from .json_logging import JsonLogging

        JsonLogging(log_level=args.log_level).log_job_start(site)
    runner = CrawlJobRunner(site, args.corpus, args.out, cfg)
    try:
        res = runner.run(resume=args.resume)
    finally:
        runner.close()
    print(
        json.dumps(
            {
                "job_id": res.job_id,
                "rounds": res.rounds,
                "fetched": res.fetched,
                "seen": res.seen,
                "out_dir": res.out_dir,
                "ckpt_dir": res.ckpt_dir,
                "per_round_fetched": res.per_round_fetched,
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
