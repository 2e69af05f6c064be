"""Sitemap monitor: heap-scheduled periodic sitemap re-checks that
diff each sitemap's URL set against its stored snapshot and spawn
depth-1 ``prevent_follow`` re-index crawls for new URLs in batches
of 20.

Reference: SitemapMonitor, search_gov_spiders/sitemaps/
sitemap_monitor.py — setup filter ``depth_limit >= 8`` (:85), default
interval 48 h (:96), find-or-confirm sitemap_url via SitemapFinder
(:97-110), md5-named sorted snapshot files (:131-162), first run
stores without indexing (:240-246), batches of 20 new URLs spawned as
``prevent_follow=True, depth_limit=1`` crawls (:306-325), per-URL
heap of next-check times (:273-291).

Ray-Data re-expression: the monitor itself is control-plane (a tiny
heap over ≤ thousands of sitemaps — driver-side by design); the data
plane is ``expand_sitemaps`` (iterative Dataset expansion), the
snapshot diff (broadcast anti-join), and the spawned crawls (full
frontier pipeline in no-follow mode). Time is injected (``now``) so
the loop is testable and schedulable from any driver; production
would wrap ``run_due`` in the same sleep loop the reference uses.
"""

from __future__ import annotations

import dataclasses
import hashlib
import heapq
from pathlib import Path

from ..sources.crawl_sites import CrawlSite
from ..sources.sitemaps import SitemapFinder, expand_sitemaps

DEFAULT_CHECK_HOURS = 48  # reference: sitemap_monitor.py:96
MIN_MONITOR_DEPTH = 8  # reference: sitemap_monitor.py:83-85
NEW_URL_BATCH = 20  # reference: sitemap_monitor.py:306


class SitemapMonitor:
    def __init__(
        self,
        records: list[CrawlSite],
        finder: SitemapFinder,
        snapshot_dir: str | Path,
    ):
        self.finder = finder
        self.snapshot_dir = Path(snapshot_dir)
        self.snapshot_dir.mkdir(parents=True, exist_ok=True)
        self.records: list[CrawlSite] = []
        self.records_map: dict[str, CrawlSite] = {}
        self.next_check_times: dict[str, float] = {}
        self._heap: list[tuple[float, str]] = []
        self._setup(records)

    # --- setup (reference: sitemap_monitor.py:81-130) --------------------
    def _setup(self, records: list[CrawlSite]) -> None:
        for record in records:
            if record.depth_limit < MIN_MONITOR_DEPTH:
                continue
            sitemap_url = record.sitemap_url
            if not self.finder.confirm_sitemap_url(sitemap_url):
                sitemap_url = self.finder.find(record.starting_urls[0])
            if not sitemap_url:
                continue
            record = dataclasses.replace(record, sitemap_url=sitemap_url)
            self.records.append(record)
            self.records_map[sitemap_url] = record
        for record in self.records:
            self.next_check_times[record.sitemap_url] = 0.0
            heapq.heappush(self._heap, (0.0, record.sitemap_url))

    def interval_seconds(self, sitemap_url: str) -> float:
        record = self.records_map.get(sitemap_url)
        hours = (record.check_sitemap_hours if record else None) or DEFAULT_CHECK_HOURS
        return float(hours) * 3600.0

    # --- snapshot store (reference: sitemap_monitor.py:131-162) ----------
    def _snapshot_path(self, sitemap_url: str) -> Path:
        return self.snapshot_dir / f"{hashlib.md5(sitemap_url.encode()).hexdigest()}.txt"

    def _load_snapshot(self, sitemap_url: str) -> set[str] | None:
        """None = first run (no stored snapshot)."""
        path = self._snapshot_path(sitemap_url)
        if not path.exists():
            return None
        return {line.strip() for line in path.read_text().splitlines() if line.strip()}

    def _save_snapshot(self, sitemap_url: str, urls: set[str]) -> None:
        self._snapshot_path(sitemap_url).write_text(
            "\n".join(sorted(urls)) + ("\n" if urls else "")
        )

    # --- one check (reference: sitemap_monitor.py:227-254) ---------------
    def check_for_changes(self, sitemap_url: str, fetch) -> tuple[set[str], int]:
        """Expand the sitemap tree, diff against the stored snapshot.
        First run stores the snapshot and reports no new URLs (the
        reference indexes nothing on first sight of a sitemap)."""
        expanded = expand_sitemaps([sitemap_url], fetch)
        current = set(expanded.unique("url") or [])
        previous = self._load_snapshot(sitemap_url)
        self._save_snapshot(sitemap_url, current)
        if previous is None:
            return set(), len(current)
        return current - previous, len(current)

    # --- the loop step (reference: sitemap_monitor.py:263-325) ------------
    def run_due(self, now: float, fetch, spawn_crawl) -> dict[str, list[str]]:
        """Process every sitemap whose next check time is due at
        ``now``; for each, spawn one ``prevent_follow`` depth-1 crawl
        per batch of 20 new URLs via ``spawn_crawl(site)``. Returns
        {sitemap_url: sorted new urls} for the processed entries."""
        results: dict[str, list[str]] = {}
        while self._heap and self._heap[0][0] <= now:
            _, sitemap_url = heapq.heappop(self._heap)
            try:
                record = self.records_map[sitemap_url]
                new_urls, _total = self.check_for_changes(sitemap_url, fetch)
                new_list = sorted(u for u in new_urls if u)
                results[sitemap_url] = new_list
                for i in range(0, len(new_list), NEW_URL_BATCH):
                    batch = new_list[i : i + NEW_URL_BATCH]
                    site = dataclasses.replace(
                        record,
                        name=f"{record.name} sitemap update {i // NEW_URL_BATCH}",
                        job_id=f"{record.job_id}-sitemap-{i // NEW_URL_BATCH}",
                        starting_urls=list(batch),
                        prevent_follow=True,
                        depth_limit=1,
                    )
                    spawn_crawl(site)
            finally:
                # ALWAYS reschedule — a transient fetch/expand failure must
                # not silently drop the sitemap from monitoring forever (the
                # exception still propagates; the entry just stays on the
                # heap for the next cycle)
                next_time = now + self.interval_seconds(sitemap_url)
                self.next_check_times[sitemap_url] = next_time
                heapq.heappush(self._heap, (next_time, sitemap_url))
        return results
