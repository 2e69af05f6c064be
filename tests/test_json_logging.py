"""JSON logging extension analog (reference extensions/json_logging.py)."""

import json
import logging

from searchgov_spider_ray.json_logging import (
    SITEMAP_START_URLS,
    JsonFormatter,
    JsonLogging,
    SearchGovSpiderFileHandler,
    SearchGovSpiderStreamHandler,
    search_gov_default,
)
from searchgov_spider_ray.sources.crawl_sites import CrawlSite


def _site(**kw):
    base = dict(
        name="Example",
        allowed_domains=["example.gov"],
        starting_urls=["https://example.gov/"],
        output_target="csv",
        job_id="job-1",
    )
    base.update(kw)
    return CrawlSite(**base)


def _fresh_root():
    root = logging.getLogger()
    saved = root.handlers[:]
    root.handlers[:] = []
    return root, saved


class TestFormatter:
    def test_record_fields(self):
        rec = logging.LogRecord("spider", logging.INFO, "f.py", 1, "hi %s", ("x",), None)
        out = json.loads(JsonFormatter().format(rec))
        # reference LOG_FMT = asctime/name/levelname/message (json_logging.py:10)
        assert out["name"] == "spider"
        assert out["levelname"] == "INFO"
        assert out["message"] == "hi x"
        assert "asctime" in out

    def test_site_serializer(self):
        out = search_gov_default(_site())
        assert out["name"] == "Example"
        assert out["spider_id"] == "job-1"
        assert out["start_urls"] == ["https://example.gov/"]
        # prevent_follow sites log the sitemap placeholder, not URLs
        # (reference json_logging.py:25)
        assert search_gov_default(_site(prevent_follow=True))["start_urls"] == SITEMAP_START_URLS

    def test_extra_fields_carried(self):
        rec = logging.LogRecord("n", logging.INFO, "f.py", 1, "m", (), None)
        rec.spider = _site()
        out = json.loads(JsonFormatter().format(rec))
        assert out["spider"]["spider_id"] == "job-1"


class TestHandlerInstall:
    def test_stream_handler_swap(self):
        root, saved = _fresh_root()
        try:
            plain = logging.StreamHandler()
            root.addHandler(plain)
            JsonLogging(log_level="INFO")
            # plain StreamHandler removed, one JSON stream handler added
            # (reference json_logging.py:97-108)
            assert plain not in root.handlers
            assert sum(isinstance(h, SearchGovSpiderStreamHandler) for h in root.handlers) == 1
            # idempotent: re-install adds no second handler
            JsonLogging(log_level="INFO")
            assert sum(isinstance(h, SearchGovSpiderStreamHandler) for h in root.handlers) == 1
        finally:
            root.handlers[:] = saved

    def test_file_handler_twin(self, tmp_path):
        root, saved = _fresh_root()
        try:
            fh = logging.FileHandler(tmp_path / "run.log")
            root.addHandler(fh)
            JsonLogging(log_level="INFO")
            twins = [h for h in root.handlers if isinstance(h, SearchGovSpiderFileHandler)]
            # .json-suffixed twin of the existing file handler
            # (reference json_logging.py:56-70, 88-95)
            assert len(twins) == 1
            assert twins[0].baseFilename.endswith("run.log.json")
            fh.close()
            twins[0].close()
        finally:
            root.handlers[:] = saved

    def test_log_job_start_emits_json_line(self, tmp_path):
        root, saved = _fresh_root()
        try:
            fh = logging.FileHandler(tmp_path / "run.log")
            root.addHandler(fh)
            ext = JsonLogging(log_level="INFO")
            ext.log_job_start(_site(prevent_follow=True))
            fh.close()
            for h in root.handlers:
                h.close()
            lines = (tmp_path / "run.log.json").read_text().strip().splitlines()
            rec = json.loads(lines[-1])
            assert rec["levelname"] == "INFO"
            assert "Starting job Example" in rec["message"]
            assert SITEMAP_START_URLS in rec["message"]
        finally:
            root.handlers[:] = saved
