"""SitemapFinder (S7 confirm flow), K5 report, SitemapMonitor loop,
and prevent_follow crawl-mode tests — mirrors the reference's finder/
monitor semantics (sitemap_finder.py, sitemap_monitor.py)."""

from __future__ import annotations

import pyarrow.parquet as pq
import pytest

from searchgov_spider_ray.pipelines.sitemap_monitor import SitemapMonitor
from searchgov_spider_ray.sources.crawl_sites import CrawlSite
from searchgov_spider_ray.sources.sitemaps import (
    DictTransport,
    SitemapFinder,
    create_sitemaps_report,
)

SITEMAP = (
    '<?xml version="1.0"?>'
    '<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">{}</urlset>'
)


def urlset(urls):
    return SITEMAP.format("".join(f"<url><loc>{u}</loc></url>" for u in urls))


class TestSitemapFinder:
    def test_common_location(self):
        t = DictTransport({"https://a.gov/sitemap.xml": urlset(["https://a.gov/p1"])})
        f = SitemapFinder(t)
        assert f.find("https://a.gov") == "https://a.gov/sitemap.xml"

    def test_probe_order_matches_reference(self):
        # wp-sitemap.xml outranks sitemap-index.xml in the reference's list
        t = DictTransport(
            {
                "https://a.gov/wp-sitemap.xml": "x",
                "https://a.gov/sitemap-index.xml": "x",
            }
        )
        assert SitemapFinder(t).find("https://a.gov") == "https://a.gov/wp-sitemap.xml"

    def test_robots_directive(self):
        t = DictTransport(
            {"https://a.gov/robots.txt": "User-agent: *\nSitemap: https://a.gov/sm.xml\n"}
        )
        assert SitemapFinder(t).find("https://a.gov") == "https://a.gov/sm.xml"

    def test_html_link_tag(self):
        t = DictTransport(
            {"https://a.gov/": '<html><link rel="sitemap" href="/maps/site.xml"></html>'}
        )
        assert SitemapFinder(t).find("https://a.gov") == "https://a.gov/maps/site.xml"

    def test_html_xml_href_fallback(self):
        # an <a href="*sitemap*.xml"> (no rel attribute) is found by
        # method 3's xml-href pattern — same as the reference, where
        # method 4's root-listing scan shares method 3's href filter
        # and so only ever confirms what method 3 already surfaced
        t = DictTransport(
            {
                "https://a.gov/": '<a href="files/old-sitemap-2020.xml">x</a>',
                "https://a.gov/files/old-sitemap-2020.xml": "x",
            }
        )
        assert (
            SitemapFinder(t).find("https://a.gov")
            == "https://a.gov/files/old-sitemap-2020.xml"
        )

    def test_root_listing_confirm_rejects_unconfirmed(self):
        # method 4 HEAD-confirms: a *sitemap*.xml href whose target does
        # not exist yields None once methods 1-3 fail (method 3 is
        # skipped here because the page 404s on GET but the hrefs come
        # from a different page... simplest honest case: no page at all)
        t = DictTransport({})
        assert SitemapFinder(t)._check_xml_files_in_root("https://a.gov/") is None

    def test_not_found(self):
        f = SitemapFinder(DictTransport({}))
        assert f.find("https://a.gov") is None
        assert not f.confirm_sitemap_url("https://a.gov/sitemap.xml")
        assert not f.confirm_sitemap_url(None)

    def test_http_upgraded_to_https(self):
        t = DictTransport(
            {"https://a.gov/robots.txt": "Sitemap: http://a.gov/sm.xml\n"}
        )
        assert SitemapFinder(t).find("https://a.gov") == "https://a.gov/sm.xml"


class TestSitemapReport:
    def test_report_csv(self, tmp_path):
        sites = [
            CrawlSite(
                name=f"s{i}",
                allowed_domains=[f"d{i}.gov"],
                starting_urls=[f"https://d{i}.gov/"],
                depth_limit=8,
            )
            for i in range(12)
        ]
        store = {f"https://d{i}.gov/sitemap.xml": "x" for i in range(0, 12, 2)}
        finder = SitemapFinder(DictTransport(store))
        out = tmp_path / "report.csv"
        create_sitemaps_report(sites, finder, str(out), batch_size=10)
        lines = out.read_text().strip().splitlines()
        assert lines[0] == "starting_urls,sitemap_url"
        assert len(lines) == 13
        assert "https://d0.gov/,https://d0.gov/sitemap.xml" in lines
        assert "https://d1.gov/," in lines  # not found → empty


def _monitor_fixture(tmp_path, store):
    site = CrawlSite(
        name="mon",
        allowed_domains=["a.gov"],
        starting_urls=["https://a.gov/"],
        depth_limit=8,
        check_sitemap_hours=24,
    )
    shallow = CrawlSite(
        name="shallow",
        allowed_domains=["b.gov"],
        starting_urls=["https://b.gov/"],
        depth_limit=3,
    )
    transport = DictTransport(store)
    mon = SitemapMonitor([site, shallow], SitemapFinder(transport), tmp_path / "snaps")

    def fetch(urls):
        return {u: transport.get(u)[1] for u in urls}

    return mon, transport, fetch


@pytest.mark.usefixtures("ray_session")
class TestSitemapMonitor:
    def test_setup_filters(self, tmp_path):
        store = {"https://a.gov/sitemap.xml": urlset(["https://a.gov/p1"])}
        mon, _, _ = _monitor_fixture(tmp_path, store)
        # shallow (depth<8) dropped; 'mon' found via common location
        assert [r.name for r in mon.records] == ["mon"]
        assert mon.records[0].sitemap_url == "https://a.gov/sitemap.xml"
        assert mon.interval_seconds("https://a.gov/sitemap.xml") == 24 * 3600

    def test_first_run_stores_without_indexing(self, tmp_path):
        store = {
            "https://a.gov/sitemap.xml": urlset(
                ["https://a.gov/p1", "https://a.gov/p2"]
            )
        }
        mon, _, fetch = _monitor_fixture(tmp_path, store)
        spawned = []
        results = mon.run_due(0.0, fetch, spawned.append)
        assert results == {"https://a.gov/sitemap.xml": []}
        assert spawned == []
        # snapshot persisted
        new, total = mon.check_for_changes("https://a.gov/sitemap.xml", fetch)
        assert new == set() and total == 2

    def test_new_urls_spawn_prevent_follow_batches(self, tmp_path):
        urls = [f"https://a.gov/p{i}" for i in range(2)]
        store = {"https://a.gov/sitemap.xml": urlset(urls)}
        mon, transport, fetch = _monitor_fixture(tmp_path, store)
        mon.run_due(0.0, fetch, lambda s: None)  # first run: store only
        # 25 new URLs appear
        new = [f"https://a.gov/new{i}" for i in range(25)]
        transport.store["https://a.gov/sitemap.xml"] = urlset(urls + new)
        spawned = []
        day = 24 * 3600.0
        results = mon.run_due(day, fetch, spawned.append)
        assert sorted(results["https://a.gov/sitemap.xml"]) == sorted(new)
        assert len(spawned) == 2  # batches of 20
        assert all(s.prevent_follow and s.depth_limit == 1 for s in spawned)
        assert len(spawned[0].starting_urls) == 20
        assert len(spawned[1].starting_urls) == 5
        assert set(spawned[0].starting_urls) | set(spawned[1].starting_urls) == set(new)
        # heap rescheduled: nothing due before now + interval
        assert mon.run_due(day + 1.0, fetch, spawned.append) == {}
        assert mon.next_check_times["https://a.gov/sitemap.xml"] == day + day


@pytest.mark.usefixtures("ray_session")
def test_prevent_follow_crawl_parity(tmp_path):
    """A prevent_follow job fetches/emits ONLY its start URLs — no link
    expansion — and matches the simulator byte-for-byte."""
    from searchgov_spider_ray.functions.hashing import xxhash64
    from searchgov_spider_ray.pipelines.frontier import (
        CrawlConfig,
        CrawlJobRunner,
        read_denied,
        read_order,
        read_seen,
    )
    from searchgov_spider_ray.pipelines.simulator import (
        RobotsRules,
        load_corpus_dict,
        simulate_crawl,
    )
    from searchgov_spider_ray.sources.corpusgen import CorpusSpec, generate_corpus, page_url
    from searchgov_spider_ray.sources.crawl_sites import CrawlSite

    cdir = tmp_path / "corpus"
    generate_corpus(cdir, CorpusSpec(seed=7, n_domains=2, pages_per_domain=30))
    site = CrawlSite(
        name="nofollow",
        allowed_domains=["site0.example.gov"],
        starting_urls=[page_url("site0.example.gov", j) for j in (0, 2, 4)],
        depth_limit=1,
        prevent_follow=True,
        output_target="elasticsearch",
    )
    corpus = load_corpus_dict(pq.read_table(cdir / "corpus_pages.parquet"))
    robots = RobotsRules.from_table(pq.read_table(cdir / "robots.parquet"))
    out = tmp_path / "out"
    runner = CrawlJobRunner(site, cdir, out, CrawlConfig(round_seconds=10.0, num_shards=2))
    res = runner.run()
    sim = simulate_crawl(site, corpus, robots, {}, round_seconds=10.0)
    try:
        order = read_order(out)
        assert order["url"].tolist() == [u for _, u, _ in sim.order]
        assert len(order) == 3  # starts only — nothing followed
        assert read_seen(runner) == {xxhash64(u) for u in sim.seen}
        assert read_denied(out) == sim.denied
        assert res.fetched == len(sim.order)
    finally:
        runner.close()
