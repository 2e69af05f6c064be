"""Per-job URL scope filtering: extension deny, deny-path regexes,
offsite host+path, query-string, depth limit.

Reference semantics (pinned by tests in
/root/reference/tests/search_gov_spiders/test_middlewares.py:15-43):
  - extension deny list FILTER_EXTENSIONS
    (helpers/domain_spider.py:10-27) applied at link extraction;
  - deny_paths regex fragments unioned with a global set
    (helpers/domain_spider.py:57-60);
  - offsite = host must match an allowed domain (host or subdomain,
    middlewares.py:147-153) AND the full URL must match the escaped
    path-scoped entries regex (middlewares.py:168-195) — entries that
    are URLs or carry ports are ignored with a warning;
  - query-string requests dropped unless ``allow_query_string``
    (middlewares.py:92-110);
  - depth limited to ``depth_limit`` (settings.py:58,
    spiders/domain_spider.py:121-134).

``JobScope`` compiles all patterns ONCE per job; ``evaluate`` is a
vectorized pandas pass over a URL batch returning a keep-mask plus a
deny-reason column (feeds ``golden_denied`` parity,
/root/repo/FIXTURES.md §5). Deny reasons are assigned in the fixed
order extension → deny_path → offsite → query_string → depth, mirroring
where each filter sits in the reference pipeline (extraction →
middleware → scheduler).
"""

from __future__ import annotations

import re
import warnings
from dataclasses import dataclass, field

import numpy as np
import pandas as pd

FILTER_EXTENSIONS = [
    # archives
    "7z", "7zip", "bz2", "rar", "tar", "tar.gz", "xz", "zip", "gz",
    # images
    "mng", "pct", "bmp", "gif", "jpg", "jpeg", "png", "pst", "psp", "image",
    "tif", "tiff", "ai", "drw", "dxf", "eps", "ps", "svg", "cdr", "ico",
    # audio
    "mp3", "wma", "ogg", "wav", "ra", "aac", "mid", "au", "aiff", "media",
    # video
    "3gp", "asf", "asx", "avi", "mov", "mp4", "mpg", "qt", "rm", "swf",
    "wmv", "m4a", "m4v", "flv", "webm",
    # office suites (html/pdf/doc/xls stay fetchable)
    "ppt", "pptx", "pps", "odt", "ods", "odg", "odp",
    # other
    "css", "exe", "bin", "rss", "dmg", "iso", "apk", "js", "xml", "ibooks",
    "ics", "nc", "nc4", "prj", "sfx", "eventsource", "fetch", "stylesheet",
    "websocket", "xhr", "font", "manifest", "hdf", "geojson",
]

_URL_ENTRY = re.compile(r"^https?://.*$")
_PORT_ENTRY = re.compile(r":\d+$")
_HOST_OF = re.compile(r"^[a-z][a-z0-9+.-]*://([^/:?#]+)")
_PATH_OF = re.compile(r"^[a-z][a-z0-9+.-]*://[^/?#]*([^?#]*)")

KEEP = ""
DENY_EXTENSION = "extension"
DENY_PATH = "deny_path"
DENY_OFFSITE = "offsite"
DENY_QUERY = "query_string"
DENY_DEPTH = "depth"
DENY_ROBOTS = "robots"
DENY_DUPLICATE = "duplicate"


@dataclass
class JobScope:
    """Compiled scope for one crawl job. Construct once (per job / per
    actor), call :meth:`evaluate` per batch."""

    allowed_domains: list[str]
    deny_paths: list[str] = field(default_factory=list)
    allow_query_string: bool = False
    depth_limit: int = 3

    def __post_init__(self):
        hosts = []
        raw_hosts = []
        path_scoped = []
        for entry in self.allowed_domains or []:
            if entry is None:
                continue
            if _URL_ENTRY.match(entry):
                warnings.warn(f"allowed_domains accepts domains, not URLs; ignoring {entry}")
                continue
            host = entry.split("/", 1)[0]
            if _PORT_ENTRY.search(host):
                warnings.warn(f"allowed_domains accepts domains without ports; ignoring {entry}")
                continue
            hosts.append(re.escape(host))
            raw_hosts.append(host)
            path_scoped.append(re.escape(entry))
        self._host_re = re.compile(rf"^(.*\.)?({'|'.join(hosts)})$") if hosts else None
        # exact-host fast path: the common case is a direct host match;
        # the alternation regex only runs on hosts that miss the sorted
        # exact set (subdomains, junk)
        self._hosts_sorted = np.sort(np.array(raw_hosts, dtype="U")) if raw_hosts else None
        # full-URL contains over ALL entries (middlewares.py:168-195).
        # When NO entry carries a path component the pass is skipped
        # entirely (None): a URL whose host matched necessarily CONTAINS
        # that host string, so bare-host entries make it a tautology.
        self._path_re = (
            re.compile("|".join(path_scoped))
            if any("/" in (e or "") for e in (self.allowed_domains or []))
            else None
        )
        deny = [d for d in (self.deny_paths or []) if d]
        self._deny_re = re.compile("|".join(deny)) if deny else None
        exts = "|".join(re.escape(e) for e in FILTER_EXTENSIONS)
        self._ext_re = re.compile(rf"\.(?:{exts})$", re.IGNORECASE)

    def evaluate(self, urls: pd.Series, depths: np.ndarray | None = None) -> pd.Series:
        """Deny reason per URL ("" = in scope). Vectorized pandas pass."""
        urls = urls.astype("string").fillna("")
        reason = pd.Series(np.full(len(urls), KEEP, dtype=object), index=urls.index)
        hosts = urls.str.extract(_HOST_OF, expand=False).fillna("")
        paths = urls.str.extract(_PATH_OF, expand=False).fillna("")

        ext_bad = paths.str.contains(self._ext_re, regex=True).fillna(False).to_numpy(dtype=bool)
        reason[ext_bad & (reason == KEEP).to_numpy()] = DENY_EXTENSION

        if self._deny_re is not None:
            deny_bad = urls.str.contains(self._deny_re, regex=True).fillna(False).to_numpy(dtype=bool)
            reason[deny_bad & (reason == KEEP).to_numpy()] = DENY_PATH

        if self._host_re is not None:
            # exact membership first (searchsorted on the sorted host
            # set); the subdomain alternation regex only runs on misses
            harr = hosts.to_numpy(dtype="U")
            pos = np.searchsorted(self._hosts_sorted, harr)
            pos_c = np.minimum(pos, len(self._hosts_sorted) - 1)
            host_ok = self._hosts_sorted[pos_c] == harr
            miss = ~host_ok
            if miss.any():
                host_ok[miss] = (
                    hosts[miss].str.match(self._host_re).fillna(False).to_numpy(dtype=bool)
                )
            if self._path_re is not None:
                path_ok = urls.str.contains(self._path_re, regex=True).fillna(False).to_numpy(dtype=bool)
                offsite = ~(host_ok & path_ok)
            else:
                offsite = ~host_ok
            reason[offsite & (reason == KEEP).to_numpy()] = DENY_OFFSITE

        if not self.allow_query_string:
            has_q = urls.str.contains("?", regex=False).to_numpy(dtype=bool)
            reason[has_q & (reason == KEEP).to_numpy()] = DENY_QUERY

        if depths is not None:
            too_deep = np.asarray(depths) > self.depth_limit
            reason[too_deep & (reason == KEEP).to_numpy()] = DENY_DEPTH
        return reason


ALLOWED_CONTENT_TYPE = [
    "text/html",
    "text/plain",
    "application/msword",
    "application/pdf",
    "application/vnd.ms-excel",
    "application/vnd.openxmlformats-officedocument.wordprocessingml.document",
    "application/vnd.openxmlformats-officedocument.spreadsheetml.sheet",
]
ES_ALLOWED_CONTENT_TYPE = ["text/html", "application/pdf"]
ALLOWED_CONTENT_TYPE_OUTPUT_MAP = {
    "csv": ALLOWED_CONTENT_TYPE,
    "endpoint": ALLOWED_CONTENT_TYPE,
    "elasticsearch": ES_ALLOWED_CONTENT_TYPE,
}


def content_type_mask(content_types: pd.Series, output_target: str) -> np.ndarray:
    """Vectorized content-type allowlist filter (reference:
    is_valid_content_type, helpers/domain_spider.py:30-50,77-85 —
    header like ``text/html; charset=utf-8`` matches on the media
    type)."""
    allowed = ALLOWED_CONTENT_TYPE_OUTPUT_MAP.get(output_target, ALLOWED_CONTENT_TYPE)
    simple = content_types.astype("string").fillna("").str.split(";").str[0].str.strip().str.lower()
    return simple.isin(allowed).to_numpy(dtype=bool)


def simple_content_type(content_types: pd.Series) -> pd.Series:
    """Raw header → simple media type (reference:
    get_simple_content_type, helpers/domain_spider.py:88-96)."""
    return content_types.astype("string").fillna("").str.split(";").str[0].str.strip().str.lower()
