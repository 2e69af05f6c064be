"""Instrumented crawl-only bench: per-round phase timing at one CPU
count. Usage: RAY_GRAFT_CPUS=32 python scripts/crawl_timing.py
Prints the per-round GRAFT_CRAWL_TIMING lines plus a one-line JSON
summary (urls/s). Reuses bench.py's corpus + config so numbers are
comparable with the official bench."""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

os.environ.setdefault("GRAFT_CRAWL_TIMING", "1")

import bench  # noqa: E402


def main() -> None:
    import logging

    import ray

    ray.init(
        address="local",
        num_cpus=bench.NUM_CPUS,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
        object_store_memory=int(os.environ.get("GRAFT_OBJ_STORE_GB", "40")) * (1 << 30),
    )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    logging.getLogger("ray.data").setLevel(logging.ERROR)

    import ray.data as _rd

    _rd.range(bench.NUM_CPUS * 4, override_num_blocks=bench.NUM_CPUS * 4).map_batches(
        lambda b: b, batch_format="pyarrow"
    ).materialize()

    t0 = time.time()
    wall, fetched = bench.run_crawl_bench()
    print(
        json.dumps(
            {
                "crawl_wall_s": round(wall, 2),
                "fetched": fetched,
                "urls_per_sec": round(fetched / wall, 1),
                "num_cpus": bench.NUM_CPUS,
                "total_incl_warmup_s": round(time.time() - t0, 2),
            }
        ),
        flush=True,
    )
    ray.shutdown()


if __name__ == "__main__":
    main()
