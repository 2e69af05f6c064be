"""Job scheduler: fan out crawl jobs with a concurrency cap, a pending
queue, and rerun-pending-on-restart semantics.

Reference: APScheduler + Redis jobstore spawning one subprocess per
crawl with ThreadPoolExecutor(max_workers=5); jobs submitted while the
pool is full sit in a Redis "pending" set and are re-fired on restart
with a "Rerun::" prefix (/root/reference/search_gov_crawler/
scrapy_scheduler.py:111-171, scheduling/schedulers.py:32-99,
scheduling/jobstores.py:9-70).

Ray re-expression (SURVEY.md §3.2): each job is one CrawlJobRunner
pipeline; the cap is enforced by the driver loop; the pending set and
per-job status live in a JSON manifest on disk (the Redis analog), so
a killed scheduler restart re-runs jobs that were mid-flight —
resuming each from its own crawl checkpoint, which is what makes the
rerun cheap and fetch-once. Cron *timing* is control-plane and out of
data-plane scope; ``parse_cron_field`` validates the config format the
reference accepts.
"""

from __future__ import annotations

import json
import re
import time
from dataclasses import dataclass, field
from pathlib import Path

from ..sources.crawl_sites import CrawlSite, CrawlSites
from .frontier import CrawlConfig, CrawlJobRunner, CrawlRunResult

DEFAULT_MAX_WORKERS = 5  # reference: SPIDER_SCRAPY_MAX_WORKERS default
ORPHAN_AGE_SECONDS = 604800  # one week — reference settings.py:80

# numeric fields plus 3-letter day/month names (the reference's
# schedule strings use day names, readschedule.py; schedule_by_day
# groups by the same names)
_CRON_FIELD = re.compile(
    r"^(\*|\d+(-\d+)?|[a-z]{3}(-[a-z]{3})?)(/\d+)?"
    r"(,(\*|\d+(-\d+)?|[a-z]{3}(-[a-z]{3})?)(/\d+)?)*$",
    re.IGNORECASE,
)


def validate_cron(expr: str | None) -> bool:
    """5-field cron shape check (the reference validates schedules at
    config load, crawl_sites.py:84-101)."""
    if expr is None:
        return True
    parts = expr.split()
    return len(parts) == 5 and all(_CRON_FIELD.match(p) for p in parts)


@dataclass
class JobState:
    job_id: str
    status: str = "pending"  # pending | running | finished | failed
    started_at: float | None = None
    finished_at: float | None = None
    fetched: int = 0
    error: str | None = None


@dataclass
class SchedulerManifest:
    """The on-disk job-state store (Redis jobstore analog)."""

    path: Path
    jobs: dict[str, JobState] = field(default_factory=dict)

    @classmethod
    def load(cls, path: str | Path) -> "SchedulerManifest":
        p = Path(path)
        m = cls(path=p)
        if p.exists():
            data = json.loads(p.read_text())
            m.jobs = {k: JobState(**v) for k, v in data.items()}
        return m

    def save(self) -> None:
        self.path.parent.mkdir(parents=True, exist_ok=True)  # BEFORE the tmp write
        tmp = self.path.with_suffix(".tmp")
        tmp.write_text(json.dumps({k: vars(v) for k, v in self.jobs.items()}, indent=2))
        tmp.rename(self.path)

    def pending_or_interrupted(self) -> list[str]:
        """Jobs to (re)run on restart: never-finished ones. A job that
        was 'running' when the scheduler died reruns with resume=True
        (reference re-adds pending jobs with a Rerun:: prefix,
        scheduling/schedulers.py:75-99)."""
        return [j for j, s in self.jobs.items() if s.status in ("pending", "running")]


class JobScheduler:
    """Run a CrawlSites config's jobs under a concurrency cap.

    In this single-node sandbox jobs execute sequentially (one Ray
    session; each job internally saturates the node); the cap +
    pending-set semantics are exercised the same way — on a cluster
    each slot becomes a ``ray job submit``.
    """

    def __init__(
        self,
        sites: CrawlSites,
        corpus_dir: str | Path,
        work_dir: str | Path,
        cfg: CrawlConfig | None = None,
        max_workers: int = DEFAULT_MAX_WORKERS,
    ):
        self.sites = {s.job_id: s for s in sites.sites}
        for s in sites.sites:
            if not validate_cron(s.schedule):
                raise ValueError(f"{s.job_id}: invalid cron {s.schedule!r}")
        self.corpus_dir = Path(corpus_dir)
        self.work_dir = Path(work_dir)
        self.cfg = cfg or CrawlConfig()
        self.max_workers = max_workers
        self.manifest = SchedulerManifest.load(self.work_dir / "scheduler_manifest.json")
        for job_id in self.sites:
            self.manifest.jobs.setdefault(job_id, JobState(job_id=job_id))

    def run_pending(self, limit: int | None = None) -> list[CrawlRunResult]:
        """Execute pending/interrupted jobs (≤ max_workers per wave).
        Interrupted jobs resume from their crawl checkpoint — no
        re-fetch across the scheduler restart."""
        cap = self.max_workers if limit is None else limit  # limit=0 means zero
        todo = self.manifest.pending_or_interrupted()[:cap]
        results: list[CrawlRunResult] = []
        for job_id in todo:
            site = self.sites.get(job_id)
            if site is None:
                continue
            state = self.manifest.jobs[job_id]
            resume = state.status == "running"  # died mid-flight → Rerun::
            state.status = "running"
            state.started_at = time.time()
            self.manifest.save()
            runner = None
            try:
                # construction inside the try: a bad corpus/work dir is a
                # job-level failure to record, not a wave-killer
                runner = CrawlJobRunner(site, self.corpus_dir, self.work_dir / job_id, self.cfg)
                res = runner.run(resume=resume)
                state.status = "finished"
                state.fetched = res.fetched
                results.append(res)
            except Exception as e:  # job-level failure is recorded, not fatal
                state.status = "failed"
                state.error = f"{type(e).__name__}: {e}"
            finally:
                state.finished_at = time.time()
                if runner is not None:
                    runner.close()
                self.manifest.save()
        return results

    def gc_orphans(self, orphan_age_seconds: int = ORPHAN_AGE_SECONDS, now: float | None = None) -> list[str]:
        """Delete per-job state trees (checkpoint shards, frontier,
        lineage sinks) idle longer than ``orphan_age_seconds`` — the
        analog of the reference's RedisSchedulerQueue orphan cleanup
        (extensions/scheduler_queue.py:85-121, idletime > one week per
        settings.py:80), with 'idle' = newest mtime anywhere in the
        job's work tree. A running job touches its checkpoint every
        round, so live trees never age out. Returns deleted job dirs."""
        import shutil

        now = time.time() if now is None else now
        deleted: list[str] = []
        if not self.work_dir.exists():
            return deleted
        for job_dir in sorted(self.work_dir.iterdir()):
            if not job_dir.is_dir():
                continue
            state = self.manifest.jobs.get(job_dir.name)
            if state is not None and state.status == "running":
                continue
            newest = max(
                (p.stat().st_mtime for p in job_dir.rglob("*") if p.is_file()),
                default=job_dir.stat().st_mtime,
            )
            if now - newest > orphan_age_seconds:
                shutil.rmtree(job_dir)
                deleted.append(job_dir.name)
        return deleted


# --- schedule report (SURVEY.md §2.4 A10) ----------------------------------

_DAY_NAMES = {
    "sun": "Sunday", "mon": "Monday", "tue": "Tuesday", "wed": "Wednesday",
    "thu": "Thursday", "fri": "Friday", "sat": "Saturday",
    # numeric cron days (0/7 = Sunday) — validate_cron accepts both
    # grammars, so the report must too
    "0": "Sunday", "1": "Monday", "2": "Tuesday", "3": "Wednesday",
    "4": "Thursday", "5": "Friday", "6": "Saturday", "7": "Sunday",
}
_WEEK = ("Sunday", "Monday", "Tuesday", "Wednesday", "Thursday", "Friday", "Saturday")


def schedule_by_day(entries: list[dict]) -> dict[str, list[dict]]:
    """Group cron schedule entries per weekday, sorted by HH:MM
    (reference: transform_schedule, domains/readschedule.py:36-51).
    Each entry needs ``schedule`` ("M H * * day"), ``name``,
    ``allowed_domains``, ``depth_limit``."""
    out: dict[str, list[dict]] = {d: [] for d in _WEEK}
    for entry in entries:
        time_part, _, day_part, *_ = entry["schedule"].split("*")
        minute, hour, *_ = time_part.split(" ")
        day = _DAY_NAMES.get(day_part.lower().strip())
        if day is None:
            raise ValueError(f"invalid day abbreviation: {day_part!r}")
        e = dict(entry)
        e["time"] = f"{hour:0>2}:{minute:0>2}"
        out[day].append(e)
    for day in out:
        out[day] = sorted(out[day], key=lambda x: x["time"])
    return out


def schedule_markdown(entries: list[dict], environment: str = "production") -> str:
    """Markdown schedule report (reference: create_markdown_tables /
    create_header_and_toc, readschedule.py:53-86)."""
    grouped = schedule_by_day(entries)
    md = f"# {environment.capitalize()} Schedule\n"
    for day in _WEEK:
        md += f" * [{day} ({len(grouped[day])})](#{day.lower()}-{len(grouped[day])})\n"
    for day in _WEEK:
        rows = grouped[day]
        md += f"\n\n## {day} ({len(rows)})\n|Name|Time (UTC)|Allowed Domains|Depth|\n|---|---|---|---|\n"
        for e in rows:
            md += f"|{e['name']}|{e['time']}|{e['allowed_domains']}|{e['depth_limit']}|\n"
    return md
