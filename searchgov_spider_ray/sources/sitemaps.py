"""Sitemap operators: XML parsing (sitemapindex/urlset), discovery
probing, snapshot diffing.

Reference:
  - recursive fetch+parse with max depth 10 →
    SitemapMonitor._fetch_sitemap, /root/reference/search_gov_crawler/
    search_gov_spiders/sitemaps/sitemap_monitor.py:164-224
  - discovery probe of 9 common filenames + robots.txt ``Sitemap:``
    lines + HTML <link rel=sitemap> → SitemapFinder,
    sitemaps/sitemap_finder.py:69-209, :127-147
  - snapshot set-difference (new = current ∖ previous; first round
    emits nothing) → sitemap_monitor.py:227-254

Ray-Data re-expression: recursion becomes an iterative loop of
Datasets (parse → split index refs vs leaf URLs → refetch the refs);
the diff is an anti-join via broadcast key set (the same pattern as
pipelines/queries.customers_without_orders).
"""

from __future__ import annotations

import re
import xml.etree.ElementTree as ET

import pandas as pd
import pyarrow as pa
import ray
import ray.data as rd

_NS = re.compile(r"\{[^}]*\}")
COMMON_SITEMAP_NAMES = [
    "sitemap.xml", "sitemap_index.xml", "sitemap-index.xml", "sitemapindex.xml",
    "sitemap/sitemap.xml", "sitemaps/sitemap.xml", "sitemap1.xml", "wp-sitemap.xml",
    "sitemap.xml.gz",
]
_ROBOTS_SITEMAP = re.compile(r"^\s*sitemap:\s*(\S+)", re.IGNORECASE | re.MULTILINE)
_HTML_SITEMAP_LINK = re.compile(
    r"<link\b[^>]*rel=[\"']sitemap[\"'][^>]*href=[\"']([^\"']+)[\"']", re.IGNORECASE
)


def parse_sitemap_xml(body: bytes | str) -> tuple[list[str], list[str]]:
    """One sitemap document → (child_sitemap_urls, page_urls).
    ``sitemapindex`` yields children; ``urlset`` yields pages
    (reference parses both via ElementTree, sitemap_monitor.py:183-216).
    Malformed XML → empty (the reference logs and returns the empty
    set)."""
    if isinstance(body, bytes):
        try:
            body = body.decode("utf-8")
        except UnicodeDecodeError:
            body = body.decode("latin-1")
    try:
        root = ET.fromstring(body)
    except ET.ParseError:
        return [], []
    tag = _NS.sub("", root.tag).lower()
    locs = [
        el.text.strip()
        for el in root.iter()
        if _NS.sub("", el.tag).lower() == "loc" and el.text and el.text.strip()
    ]
    if tag == "sitemapindex":
        return locs, []
    if tag == "urlset":
        return [], locs
    return [], []


def sitemap_urls_from_robots(robots_body: str) -> list[str]:
    """``Sitemap:`` directives in a robots.txt
    (reference: SitemapFinder._check_robots_txt, sitemap_finder.py:127-147)."""
    return _ROBOTS_SITEMAP.findall(robots_body or "")


def sitemap_links_from_html(html: str) -> list[str]:
    """<link rel="sitemap" href=...> discovery
    (reference: sitemap_finder.py:149-171)."""
    return _HTML_SITEMAP_LINK.findall(html or "")


def discovery_candidates(base_url: str) -> list[str]:
    """Probe order for sitemap discovery (reference probes 9 common
    filenames then robots/HTML, sitemap_finder.py:69-114)."""
    base = base_url.rstrip("/")
    return [f"{base}/{name}" for name in COMMON_SITEMAP_NAMES]


def expand_sitemaps(
    seed_urls: list[str],
    fetch: "callable",
    max_depth: int = 10,
) -> rd.Dataset:
    """Iteratively expand sitemap indexes into a Dataset of
    ``(sitemap_url, url)`` rows. ``fetch(urls: list[str]) ->
    dict[url, bytes]`` abstracts the transport (HTTP actor pool in
    production; corpus/test dict here). Depth-capped at 10 like the
    reference (sitemap_monitor.py:171-177)."""
    rows_sitemap: list[str] = []
    rows_url: list[str] = []
    pending = [(u, u, 0) for u in seed_urls]  # (root, url, depth)
    seen: set[str] = set()
    while pending:
        batch = [(r, u, d) for r, u, d in pending if u not in seen and d <= max_depth]
        pending = []
        if not batch:
            break
        bodies = fetch([u for _, u, _ in batch])
        for root, url, depth in batch:
            seen.add(url)
            body = bodies.get(url)
            if body is None:
                continue
            children, pages = parse_sitemap_xml(body)
            rows_sitemap.extend([root] * len(pages))
            rows_url.extend(pages)
            pending.extend((root, c, depth + 1) for c in children)
    return rd.from_arrow(
        pa.table({"sitemap_url": pa.array(rows_sitemap), "url": pa.array(rows_url)})
    )


def snapshot_diff(current: rd.Dataset, previous: rd.Dataset | None) -> rd.Dataset:
    """new = current ∖ previous by ``url``; first run (previous None)
    emits nothing (reference: sitemap_monitor.py:238-248). Anti-join
    via broadcast key set — the previous snapshot is one sitemap's URL
    list, small by construction; a billion-row diff would switch to the
    hash-partitioned join pattern."""
    if previous is None:
        return rd.from_arrow(pa.table({"sitemap_url": pa.array([], type=pa.string()),
                                       "url": pa.array([], type=pa.string())}))
    prev_urls = previous.unique("url") or set()
    ref = ray.put(set(prev_urls))

    class _New:
        def __init__(self):
            self._s = None

        def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
            if self._s is None:
                self._s = ray.get(ref)
            return df[~df["url"].isin(self._s)]

    return current.map_batches(_New(), batch_format="pandas")
