"""Politeness + robots enforcement.

Reference semantics: 1 concurrent request per domain with a 1 s delay
(CONCURRENT_REQUESTS_PER_DOMAIN=1, DOWNLOAD_DELAY=1,
/root/reference/search_gov_crawler/search_gov_spiders/settings.py:44-47)
and RobotsTxtMiddleware per-domain rule cache (settings.py:31).

In the BSP frontier model (SURVEY.md §3.1) politeness becomes a
per-round, per-domain fetch BUDGET: ``max(1, floor(round_seconds /
crawl_delay))`` URLs per domain per round, granted in (depth, seq)
order; ungranted rows carry over with their (depth, seq) unchanged.
Hot domains therefore serialize across rounds — that is the reference
semantics, not a bug (SURVEY.md §4 skew row). The same
:class:`searchgov_spider_ray.pipelines.simulator.RobotsRules` model
backs the golden simulator, so compliance is checkable exactly.

Two pieces:
* ``PolitenessSelect`` — the per-domain ``groupby(domain).map_groups``
  kernel marking granted rows (this is the designed politeness
  shuffle; key = domain).
* ``robots_reason`` — vectorized robots disallow check used during
  admission (denied URLs never enter the frontier or the seen set —
  pinned in simulator.py).

Budget replay on resume: grants are per-round functions of the robots
table and the checkpointed frontier; the lineage manifest records
spent-per-domain per round, so a resumed run re-derives clocks without
bursting a domain (SURVEY.md §7.5.3).
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd

from ..pipelines.simulator import DEFAULT_CRAWL_DELAY, RobotsRules

# scheme://netloc then path (up to query/fragment) in one pass
_NETLOC_PATH_OF = re.compile(r"^[a-z][a-z0-9+.-]*://([^/?#]*)([^?#]*)")


class PolitenessSelect:
    """map_groups kernel over ``groupby("domain")``: sort the group by
    (depth, seq), grant the first ``budget`` rows. Construct per round
    with the (small, broadcast) robots rules."""

    def __init__(self, robots: RobotsRules, round_seconds: float):
        self.robots = robots
        self.round_seconds = round_seconds

    def __call__(self, group: pd.DataFrame) -> pd.DataFrame:
        domain = group["domain"].iloc[0]
        budget = self.robots.budget(domain, self.round_seconds)
        group = group.sort_values(["depth", "seq"], kind="mergesort")
        granted = np.zeros(len(group), dtype=bool)
        granted[:budget] = True
        group = group.assign(granted=granted)
        return group


class PolitenessSelectPartition:
    """Vectorized politeness over ONE coarse hash partition of domains
    (``groupby(hash(domain) % P)``): sort the partition by (domain,
    depth, seq), detect domain runs, grant segment-rank < budget. One
    Python call per PARTITION instead of per domain — at web scale
    (10^6+ hosts) the per-domain ``map_groups`` costs one interpreter
    round-trip per host; this pays P ≈ a few per core. Grant semantics
    are identical to :class:`PolitenessSelect` (pinned by a direct
    parity test and the simulator goldens)."""

    def __init__(self, robots: RobotsRules, round_seconds: float):
        self.robots = robots
        self.round_seconds = round_seconds

    def __call__(self, part: pd.DataFrame) -> pd.DataFrame:
        g = part.sort_values(["domain", "depth", "seq"], kind="mergesort")
        if "part" in g.columns:
            g = g.drop(columns=["part"])
        dom = g["domain"].to_numpy(dtype=object)
        n = len(dom)
        if n == 0:
            return g.assign(granted=np.zeros(0, dtype=bool))
        new = np.concatenate(([True], dom[1:] != dom[:-1]))
        seg = np.cumsum(new) - 1
        starts = np.flatnonzero(new)
        budgets = np.fromiter(
            (self.robots.budget(d, self.round_seconds) for d in dom[starts]),
            dtype=np.int64,
            count=len(starts),
        )
        rank = np.arange(n, dtype=np.int64) - starts[seg]
        return g.assign(granted=rank < budgets[seg])


def politeness_partition_key(domains, n_parts: int) -> np.ndarray:
    """int32 coarse-partition key per domain string (vectorized cython
    hash; each domain's rows land wholly in one partition)."""
    arr = np.asarray(domains, dtype=object)
    h = pd.util.hash_array(arr, categorize=True, hash_key="0123456789123456")
    return (h % np.uint64(n_parts)).astype(np.int32)


def robots_reason(urls: pd.Series, robots: RobotsRules) -> np.ndarray:
    """Boolean mask: True where robots DISALLOWS the URL.

    One regex pass extracts host+path for the whole batch (equivalent
    to ``host_of``/``path_of`` on canonical URLs — same extraction the
    scope filter uses, parity pinned by the simulator goldens), then
    rows group by host via one argsort so each domain's path-prefix
    rules run only over that domain's slice — O(n log n) total instead
    of O(domains × n) full-array scans."""
    s = urls if isinstance(urls, pd.Series) else pd.Series(urls, dtype="object")
    s = s.astype("string").fillna("")
    extr = s.str.extract(_NETLOC_PATH_OF, expand=True)
    netloc = extr[0].fillna("").to_numpy(dtype=object)
    # host_of parity: strip userinfo/port, lowercase, strip trailing
    # dots — branch taken only on the rare non-plain netloc.
    hosts = np.array(
        [
            h.rsplit("@", 1)[-1].split(":", 1)[0].lower().rstrip(".")
            if ("@" in h or ":" in h or h.endswith(".") or not h.islower())
            else h
            for h in netloc
        ],
        dtype=object,
    )
    # path_of parity: empty path reads as "/"
    paths = np.array([p or "/" for p in extr[1].fillna("").to_numpy(dtype=object)], dtype=object)
    denied = np.zeros(len(hosts), dtype=bool)
    if not robots.disallow:
        return denied
    order = np.argsort(hosts, kind="stable")
    sh = hosts[order]
    starts = np.flatnonzero(np.concatenate(([True], sh[1:] != sh[:-1])))
    ends = np.append(starts[1:], len(sh))
    for a, b in zip(starts, ends):
        rules = robots.disallow.get(sh[a])
        if not rules:
            continue
        idx = order[a:b]
        sub = paths[idx]
        bad = np.zeros(len(idx), dtype=bool)
        for prefix in rules:
            bad |= np.fromiter(
                (p.startswith(prefix) for p in sub), dtype=bool, count=len(sub)
            )
        denied[idx] = bad
    return denied


__all__ = [
    "PolitenessSelect",
    "PolitenessSelectPartition",
    "politeness_partition_key",
    "robots_reason",
    "RobotsRules",
    "DEFAULT_CRAWL_DELAY",
]
