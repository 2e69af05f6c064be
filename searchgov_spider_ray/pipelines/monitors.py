"""Run monitors: threshold aggregates over crawl run metrics.

Reference: Spidermon close monitors — min item count, unwanted-HTTP-
code budget (≤50 of 400/429/500-599), max execution time 48 h, finish
reason (/root/reference/search_gov_crawler/search_gov_spiders/
monitors.py:21-48; thresholds settings.py:122-129).

Ray re-expression: the lineage manifests + order parquet ARE the run
metrics table; monitors are small aggregates over them (SURVEY.md
§2.4 A11), evaluated after a run (or per round for liveness).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from pathlib import Path

import pyarrow.compute as pc
import pyarrow.parquet as pq

UNWANTED_HTTP_CODES = [400, 429] + list(range(500, 600))  # settings.py:127-129
MAX_UNWANTED = 50  # settings.py:129
DEFAULT_MIN_ITEMS = 1  # settings.py:123


@dataclass
class MonitorReport:
    passed: bool
    checks: dict[str, bool] = field(default_factory=dict)
    stats: dict[str, float] = field(default_factory=dict)


def evaluate_run(
    out_dir: str | Path,
    wall_seconds: float | None = None,
    min_items: int = DEFAULT_MIN_ITEMS,
    max_unwanted: int = MAX_UNWANTED,
    max_execution_seconds: float = 48 * 3600,
) -> MonitorReport:
    """Close-monitor suite over a finished crawl's outputs."""
    out = Path(out_dir)
    checks: dict[str, bool] = {}
    stats: dict[str, float] = {}

    emitted_dir = out / "emitted"
    n_items = 0
    if emitted_dir.exists():
        # row count from footers only (the narrow sink has no doc_id —
        # it is reconstructed by read_emitted; the monitor needs counts)
        for f in emitted_dir.rglob("*.parquet"):
            n_items += pq.ParquetFile(f).metadata.num_rows
    stats["items"] = n_items
    checks["min_items"] = n_items >= min_items

    order_dir = out / "order"
    n_unwanted = 0
    if order_dir.exists():
        statuses = pq.read_table(order_dir, columns=["status"])["status"]
        mask = pc.is_in(statuses.combine_chunks(), value_set=__import__("pyarrow").array(
            UNWANTED_HTTP_CODES, type=statuses.type))
        n_unwanted = pc.sum(mask).as_py() or 0
    stats["unwanted_http"] = n_unwanted
    checks["unwanted_http_budget"] = n_unwanted <= max_unwanted

    if wall_seconds is not None:
        stats["wall_seconds"] = wall_seconds
        checks["max_execution_time"] = wall_seconds <= max_execution_seconds

    return MonitorReport(passed=all(checks.values()), checks=checks, stats=stats)
