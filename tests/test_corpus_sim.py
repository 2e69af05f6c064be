"""Corpus generator, stub codec, and reference-simulator tests."""

from __future__ import annotations

import numpy as np
import pyarrow.parquet as pq
import pytest

from searchgov_spider_ray.pipelines.simulator import (
    RobotsRules,
    load_corpus_dict,
    simulate_crawl,
)
from searchgov_spider_ray.sources.corpusgen import (
    CorpusSpec,
    caption_for,
    generate_corpus,
    pixels_for,
)
from searchgov_spider_ray.sources.crawl_sites import CrawlSites
from searchgov_spider_ray.stages.decode import (
    fake_decode,
    fake_encode,
    phash64,
    psnr,
    quantize_lossy,
)
from searchgov_spider_ray.stages.links import extract_links


@pytest.fixture(scope="module")
def corpus_dir(tmp_path_factory):
    out = tmp_path_factory.mktemp("corpus")
    stats = generate_corpus(out, CorpusSpec(seed=42, n_domains=3, pages_per_domain=40))
    assert stats["pages"] > 120
    return out


class TestCodec:
    def test_png_roundtrip_exact(self):
        spec = CorpusSpec()
        pixels, w, h, _ = pixels_for(spec, "img-0-0")
        data = fake_encode(pixels, "png")
        decoded, dw, dh, fmt = fake_decode(data)
        assert (dw, dh, fmt) == (w, h, "png")
        assert np.array_equal(decoded, pixels)

    def test_jpeg_lossy_psnr_above_40(self):
        spec = CorpusSpec()
        for img in ["img-0-0", "img-1-3", "img-2-9"]:
            pixels, *_ = pixels_for(spec, img)
            decoded, *_ = fake_decode(fake_encode(pixels, "jpeg"))
            assert psnr(pixels, decoded) >= 40.0

    def test_phash_stability_and_sensitivity(self):
        spec = CorpusSpec()
        p1, *_ = pixels_for(spec, "img-0-0")
        p2, *_ = pixels_for(spec, "img-0-3")
        assert phash64(p1) == phash64(p1)
        assert phash64(p1) != phash64(p2)
        # lossy quantization must not change the perceptual hash much:
        # the corpus golden stores the decoded-pixel phash exactly.
        assert phash64(quantize_lossy(p1)) == phash64(quantize_lossy(p1))

    def test_psnr(self):
        a = np.zeros((8, 8, 3), dtype=np.uint8)
        assert psnr(a, a) == float("inf")
        b = a.copy()
        b[0, 0, 0] = 255
        assert psnr(a, b) < 40


class TestCorpusGen:
    def test_deterministic(self, corpus_dir, tmp_path):
        generate_corpus(tmp_path / "again", CorpusSpec(seed=42, n_domains=3, pages_per_domain=40))
        t1 = pq.read_table(corpus_dir / "corpus_pages.parquet")
        t2 = pq.read_table(tmp_path / "again" / "corpus_pages.parquet")
        assert t1.equals(t2)
        i1 = pq.read_table(corpus_dir / "corpus_images.parquet")
        i2 = pq.read_table(tmp_path / "again" / "corpus_images.parquet")
        assert i1.equals(i2)

    def test_html_contains_ground_truth_links(self, corpus_dir):
        pages = pq.read_table(corpus_dir / "corpus_pages.parquet").to_pylist()
        html_pages = [p for p in pages if p["content_type"].startswith("text/html")][:20]
        from searchgov_spider_ray.functions.urlnorm import join_url

        for p in html_pages:
            extracted = extract_links(p["url"], p["body"])
            truth_resolved = []
            for link in p["links"]:
                resolved = join_url(p["url"], link)
                if resolved not in truth_resolved:
                    truth_resolved.append(resolved)
            assert extracted == truth_resolved

    def test_images_match_goldens(self, corpus_dir):
        spec = CorpusSpec(seed=42, n_domains=3, pages_per_domain=40)
        images = pq.read_table(corpus_dir / "corpus_images.parquet").to_pylist()
        assert len(images) > 10
        for row in images[:10]:
            ref_pixels, w, h, fmt = pixels_for(spec, row["image_id"])
            assert (row["w"], row["h"], row["fmt"]) == (w, h, fmt)
            decoded, *_ = fake_decode(row["bytes"])
            if fmt == "png":
                assert np.array_equal(decoded, ref_pixels)
            else:
                assert psnr(ref_pixels, decoded) >= 40.0
            golden_u64 = np.array(row["phash"]).astype(np.uint64).item()
            assert golden_u64 == phash64(decoded)
            assert row["caption"] == caption_for(spec, row["image_id"])

    def test_seeds_parse(self, corpus_dir):
        sites = CrawlSites.from_file(corpus_dir / "seeds.json")
        assert len(sites.sites) == 5
        names = {s.name for s in sites.sites}
        assert "plain" in names and "path scoped" in names

    def test_parallel_generation_matches_sequential(self, corpus_dir, tmp_path):
        """The sharded process-pool generator (the bench-scale path) must
        produce row-for-row identical table CONTENTS to the sequential
        path — shards are written in submission order, so only parquet
        row-group boundaries may differ. Covers js domains and the
        hot-domain skew so every shard kind crosses the pool."""
        spec = CorpusSpec(
            seed=42, n_domains=3, pages_per_domain=40, js_domains=1, hot_domain_factor=2
        )
        seq_dir, par_dir = tmp_path / "seq", tmp_path / "par"
        s_seq = generate_corpus(seq_dir, spec, workers=0)
        s_par = generate_corpus(par_dir, spec, workers=4)
        assert s_seq == s_par
        for fname in ("corpus_pages.parquet", "corpus_images.parquet", "robots.parquet"):
            t_seq = pq.read_table(seq_dir / fname)
            t_par = pq.read_table(par_dir / fname)
            assert t_seq.equals(t_par), fname
        assert (seq_dir / "seeds.json").read_text() == (par_dir / "seeds.json").read_text()


class TestSimulator:
    @pytest.fixture(scope="class")
    def sim_inputs(self, corpus_dir):
        pages = pq.read_table(corpus_dir / "corpus_pages.parquet")
        corpus = load_corpus_dict(pages)
        robots = RobotsRules.from_table(pq.read_table(corpus_dir / "robots.parquet"))
        sites = {s.name: s for s in CrawlSites.from_file(corpus_dir / "seeds.json").sites}
        images = pq.read_table(corpus_dir / "corpus_images.parquet").to_pylist()
        captions = {r["image_id"]: r["caption"] for r in images}
        return corpus, robots, sites, captions

    def test_plain_job_crawls_one_domain(self, sim_inputs):
        corpus, robots, sites, captions = sim_inputs
        res = simulate_crawl(sites["plain"], corpus, robots, captions)
        assert len(res.order) > 10
        assert res.rounds > 1
        # determinism
        res2 = simulate_crawl(sites["plain"], corpus, robots, captions)
        assert res.order == res2.order and res.seen == res2.seen
        # every fetched URL is on the allowed domain and in the seen set
        for _, url, _ in res.order:
            assert "site0.example.gov" in url
            assert url in res.seen
        # ranks are dense
        assert [r for r, _, _ in res.order] == list(range(len(res.order)))
        # depth never exceeds the limit and is BFS-monotone per round design
        assert max(d for _, _, d in res.order) <= sites["plain"].depth_limit

    def test_robots_never_fetches_disallowed(self, sim_inputs):
        corpus, robots, sites, captions = sim_inputs
        res = simulate_crawl(sites["plain"], corpus, robots, captions)
        for _, url, _ in res.order:
            assert robots.allowed(url), url
        assert any(reason == "robots" for _, reason in res.denied)

    def test_deny_paths_shrink_crawl(self, sim_inputs):
        corpus, robots, sites, captions = sim_inputs
        full = simulate_crawl(sites["plain"], corpus, robots, captions)
        deny = simulate_crawl(sites["deny tags"], corpus, robots, captions)
        deny_urls = {u for _, u, _ in deny.order}
        assert not any("/tag/" in u for u in deny_urls)
        assert any(reason == "deny_path" for _, reason in deny.denied)
        full_urls = {u for _, u, _ in full.order}
        assert any("/tag/" in u for u in full_urls)

    def test_path_scoped_job(self, sim_inputs):
        corpus, robots, sites, captions = sim_inputs
        res = simulate_crawl(sites["path scoped"], corpus, robots, captions)
        for _, url, _ in res.order:
            assert "site0.example.gov/sub" in url
        assert any(reason == "offsite" for _, reason in res.denied)

    def test_query_job_admits_query_urls(self, sim_inputs):
        corpus, robots, sites, captions = sim_inputs
        res = simulate_crawl(sites["query ok"], corpus, robots, captions)
        assert any("?" in u for u in res.seen)
        plain = simulate_crawl(sites["plain"], corpus, robots, captions)
        assert not any("?" in u for u in plain.seen)
        assert any(reason == "query_string" for _, reason in plain.denied)

    def test_emitted_rows_have_captions(self, sim_inputs):
        corpus, robots, sites, captions = sim_inputs
        res = simulate_crawl(sites["deep all domains"], corpus, robots, captions)
        with_img = [e for e in res.emitted if e["image_id"]]
        assert with_img and all(e["caption"] for e in with_img)
        # elasticsearch target: only html + pdf emitted
        fetched_ct = {e["url"] for e in res.emitted}
        assert all(corpus[u]["content_type"].split(";")[0] in ("text/html", "application/pdf")
                   for u in fetched_ct)

    def test_politeness_budget_caps_per_round(self, sim_inputs):
        corpus, robots, sites, captions = sim_inputs
        slow = simulate_crawl(sites["plain"], corpus, robots, captions, round_seconds=2.0)
        fast = simulate_crawl(sites["plain"], corpus, robots, captions, round_seconds=1000.0)
        # same final coverage, different round counts
        assert slow.seen == fast.seen
        assert slow.rounds > fast.rounds
