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

import numpy as np
import pandas as pd

from ..functions.urlnorm import host_of, path_of
from ..pipelines.simulator import DEFAULT_CRAWL_DELAY, RobotsRules


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


def robots_reason(urls: pd.Series, robots: RobotsRules) -> np.ndarray:
    """Boolean mask: True where robots DISALLOWS the URL. Vectorized per
    distinct domain (rules are per-domain path-prefix lists)."""
    urls = urls.astype("string").fillna("")
    hosts = urls.map(host_of)
    paths = urls.map(path_of)
    denied = np.zeros(len(urls), dtype=bool)
    for domain in hosts.unique():
        rules = robots.disallow.get(domain)
        if not rules:
            continue
        sel = (hosts == domain).to_numpy(dtype=bool)
        sub = paths[sel]
        bad = np.zeros(sel.sum(), dtype=bool)
        for prefix in rules:
            bad |= sub.str.startswith(prefix).to_numpy(dtype=bool)
        denied[sel] = bad
    return denied


__all__ = ["PolitenessSelect", "robots_reason", "RobotsRules", "DEFAULT_CRAWL_DELAY"]
