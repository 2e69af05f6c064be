"""S4 JS-rendered fetch path: JsFetcher's render step materializes the
js-links blob into anchors (the deterministic stand-in for Playwright
DOM rendering); a handle_javascript job must follow those links and
match the simulator, while the same site crawled WITHOUT the JS stage
finds nothing (the static extractor can't see the blob)."""

from __future__ import annotations

import dataclasses

import pyarrow.parquet as pq
import pytest

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
from searchgov_spider_ray.sources.corpusgen import CorpusSpec, generate_corpus
from searchgov_spider_ray.sources.crawl_sites import CrawlSites
from searchgov_spider_ray.stages.fetch import render_js_body, should_abort_request


@pytest.fixture(scope="module")
def js_corpus(tmp_path_factory):
    out = tmp_path_factory.mktemp("js_corpus")
    generate_corpus(out, CorpusSpec(seed=42, n_domains=2, pages_per_domain=30, js_domains=1))
    return out


class TestRenderJsBody:
    def test_materializes_links(self):
        body = (
            b'<html><body><script id="js-links" type="application/json">'
            b'["https://a.gov/x", "https://a.gov/y"]</script></body></html>'
        )
        out = render_js_body(body)
        assert b'<a href="https://a.gov/x">' in out
        assert b'<a href="https://a.gov/y">' in out
        assert b"js-links" not in out

    def test_plain_body_passthrough(self):
        body = b"<html><body><a href='/p1.html'>x</a></body></html>"
        assert render_js_body(body) == body

    def test_malformed_blob_passthrough(self):
        body = b'<script id="js-links" type="application/json">not json</script>'
        assert render_js_body(body) == body


class TestShouldAbortRequest:
    def test_resource_types(self):
        # Playwright resource-type words present in FILTER_EXTENSIONS
        for rt in ("image", "stylesheet", "font", "media", "websocket", "xhr", "fetch"):
            assert should_abort_request(rt)
        for rt in ("document", "script-nonfilter", "other"):
            assert not should_abort_request(rt)


@pytest.mark.usefixtures("ray_session")
def test_js_site_parity(js_corpus, tmp_path):
    corpus = load_corpus_dict(pq.read_table(js_corpus / "corpus_pages.parquet"))
    robots = RobotsRules.from_table(pq.read_table(js_corpus / "robots.parquet"))
    sites = {s.name: s for s in CrawlSites.from_file(js_corpus / "seeds.json").sites}
    site = sites["js site"]
    assert site.handle_javascript

    out = tmp_path / "out"
    runner = CrawlJobRunner(site, js_corpus, out, CrawlConfig(round_seconds=10.0, num_shards=2))
    res = runner.run()
    sim = simulate_crawl(site, corpus, robots, {}, round_seconds=10.0)
    try:
        order = read_order(out)
        assert len(order) > 1  # links were discovered through the render
        assert order["url"].tolist() == [u for _, u, _ in sim.order]
        assert read_seen(runner) == {xxhash64(u) for u in sim.seen}
        assert read_denied(out) == sim.denied
        assert res.fetched == len(sim.order)
    finally:
        runner.close()


@pytest.mark.usefixtures("ray_session")
def test_js_site_without_js_stage_finds_nothing(js_corpus, tmp_path):
    sites = {s.name: s for s in CrawlSites.from_file(js_corpus / "seeds.json").sites}
    site = dataclasses.replace(sites["js site"], handle_javascript=False)
    out = tmp_path / "out"
    runner = CrawlJobRunner(site, js_corpus, out, CrawlConfig(round_seconds=10.0, num_shards=2))
    res = runner.run()
    try:
        assert res.fetched == 1  # only the seed — the blob is invisible statically
    finally:
        runner.close()


class TestRealFetcherContracts:
    """The production swap-in stubs pin the reference downloader
    contract (reference settings.py:36-50) so a future network-enabled
    implementation cannot silently drift."""

    def test_real_http_fetcher_contract(self):
        from searchgov_spider_ray.stages.fetch import RealHttpFetcher

        assert RealHttpFetcher.DOWNLOAD_TIMEOUT_S == 15.0
        assert RealHttpFetcher.DOWNLOAD_MAXSIZE == 15728640
        assert RealHttpFetcher.RETRY_ENABLED is False
        assert RealHttpFetcher.COOKIES_ENABLED is False
        with pytest.raises(NotImplementedError):
            RealHttpFetcher()
        # batch signature mirrors CorpusFetcher.__call__ (one pa.Table in/out)
        import inspect

        from searchgov_spider_ray.stages.fetch import CorpusFetcher

        assert list(inspect.signature(RealHttpFetcher.__call__).parameters) == list(
            inspect.signature(CorpusFetcher.__call__).parameters
        )

    def test_real_js_renderer_raises(self):
        from searchgov_spider_ray.stages.fetch import RealJsRenderer

        with pytest.raises(NotImplementedError):
            RealJsRenderer()
