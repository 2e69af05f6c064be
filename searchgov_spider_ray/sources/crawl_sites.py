"""Crawl-job config: the ``seeds`` table.

Reference: CrawlSite dataclass + eager validation at
/root/reference/search_gov_crawler/search_gov_spiders/crawl_sites.py:11-149
(duplicate job_id :122-128, duplicate (output_target, allowed_domains)
:129-141, duplicate deny_paths :66-71) and seed-derivation helpers
default_starting_urls / default_allowed_domains / split_allowed_domains
at helpers/domain_spider.py:63-132. Depth bounds 1–250 with default 3:
spiders/domain_spider.py:121-134, settings.py:58.

Config is tiny (~125 records in production) → parsed driver-side into
a pyarrow Table; the frontier pipeline consumes it as the seed list.
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field
from pathlib import Path

import pyarrow as pa

VALID_OUTPUT_TARGETS = {"csv", "endpoint", "elasticsearch"}
DEFAULT_DEPTH_LIMIT = 3
MAX_DEPTH_LIMIT = 250


def force_bool(value) -> bool:
    """Coerce CLI/JSON values to bool: the string repr must be exactly
    "true" (case-insensitive) — Python bools pass through naturally
    (reference: helpers/domain_spider.py:183-194)."""
    return str(value).lower() == "true"


def _split_csv(value) -> list[str]:
    if value is None:
        return []
    if isinstance(value, list):
        return [str(v).strip() for v in value if str(v).strip()]
    return [p.strip() for p in str(value).split(",") if p.strip()]


@dataclass
class CrawlSite:
    name: str
    allowed_domains: list[str]
    starting_urls: list[str]
    output_target: str = "csv"
    job_id: str | None = None
    allow_query_string: bool = False
    handle_javascript: bool = False
    deny_paths: list[str] = field(default_factory=list)
    depth_limit: int = DEFAULT_DEPTH_LIMIT
    schedule: str | None = None
    sitemap_url: str | None = None
    # no-follow mode: fetch/emit the start URLs only, extract no links
    # (reference: DomainSpider prevent_follow → rules=(),
    # spiders/domain_spider.py:74-76 — used by the sitemap monitor's
    # depth-1 re-index crawls, sitemaps/sitemap_monitor.py:314)
    prevent_follow: bool = False
    # sitemap re-check interval in hours; None → monitor default 48
    # (reference: crawl_sites.py:30, sitemap_monitor.py:96)
    check_sitemap_hours: int | None = None

    def __post_init__(self):
        self.allowed_domains = _split_csv(self.allowed_domains)
        self.starting_urls = _split_csv(self.starting_urls)
        self.deny_paths = _split_csv(self.deny_paths)
        if not self.name:
            raise ValueError("crawl site requires a name")
        if not self.allowed_domains or not self.starting_urls:
            raise ValueError(f"{self.name}: allowed_domains and starting_urls required")
        if self.output_target not in VALID_OUTPUT_TARGETS:
            raise ValueError(f"{self.name}: invalid output_target {self.output_target!r}")
        if len(set(self.deny_paths)) != len(self.deny_paths):
            raise ValueError(f"{self.name}: duplicate deny_paths")
        if not (1 <= int(self.depth_limit) <= MAX_DEPTH_LIMIT):
            raise ValueError(f"{self.name}: depth_limit must be 1..{MAX_DEPTH_LIMIT}")
        self.depth_limit = int(self.depth_limit)
        # CLI/JSON flag coercion (reference force_bool semantics: only
        # the literal string/bool "true" is truthy)
        for flag in ("allow_query_string", "handle_javascript", "prevent_follow"):
            v = getattr(self, flag)
            if not isinstance(v, bool):
                setattr(self, flag, force_bool(v))
        if self.job_id is None:
            self.job_id = self.name.lower().replace(" ", "-")

    @property
    def allowed_hosts(self) -> list[str]:
        """Path-stripped hosts (reference: remove_paths=True path of
        default_allowed_domains, helpers/domain_spider.py:118-132)."""
        return [d.split("/", 1)[0] for d in self.allowed_domains]


@dataclass
class CrawlSites:
    sites: list[CrawlSite]

    def __post_init__(self):
        job_ids = [s.job_id for s in self.sites]
        if len(set(job_ids)) != len(job_ids):
            dups = sorted({j for j in job_ids if job_ids.count(j) > 1})
            raise ValueError(f"duplicate job_id values: {dups}")
        keys = [(s.output_target, tuple(sorted(s.allowed_domains))) for s in self.sites]
        if len(set(keys)) != len(keys):
            raise ValueError("duplicate (output_target, allowed_domains) pairs")

    @classmethod
    def from_file(cls, file: str | Path) -> "CrawlSites":
        records = json.loads(Path(file).read_text())
        return cls([CrawlSite(**{k: v for k, v in r.items() if k in CrawlSite.__dataclass_fields__}) for r in records])

    @classmethod
    def from_records(cls, records: list[dict]) -> "CrawlSites":
        return cls([CrawlSite(**r) for r in records])

    def filter_javascript(self, handle_javascript: bool) -> list[CrawlSite]:
        """Reference: default seeds split by the handle_javascript flag
        (helpers/domain_spider.py:109-132)."""
        return [s for s in self.sites if s.handle_javascript == handle_javascript]

    def to_arrow(self) -> pa.Table:
        return pa.table(
            {
                "job_id": [s.job_id for s in self.sites],
                "name": [s.name for s in self.sites],
                "allowed_domains": [s.allowed_domains for s in self.sites],
                "starting_urls": [s.starting_urls for s in self.sites],
                "allow_query_string": [s.allow_query_string for s in self.sites],
                "handle_javascript": [s.handle_javascript for s in self.sites],
                "deny_paths": [s.deny_paths for s in self.sites],
                "depth_limit": pa.array([s.depth_limit for s in self.sites], type=pa.int32()),
                "output_target": [s.output_target for s in self.sites],
                "schedule": [s.schedule for s in self.sites],
            }
        )
