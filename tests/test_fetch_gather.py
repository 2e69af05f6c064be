"""Unit tests for the streaming fetch join: _RowGroupGather ordering /
cache behavior and CorpusFetcher miss (dead link) + meta_only contracts."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from searchgov_spider_ray.stages.fetch import _RowGroupGather, broadcastable


@pytest.fixture()
def payload_file(tmp_path):
    path = tmp_path / "payload.parquet"
    tab = pa.table({"body": pa.array([f"row{i}".encode() for i in range(100)], type=pa.binary())})
    writer = pq.ParquetWriter(path, tab.schema, compression="none")
    writer.write_table(tab, row_group_size=16)
    writer.close()
    return str(path)


class TestRowGroupGather:
    def test_gather_arbitrary_order(self, payload_file):
        g = _RowGroupGather(payload_file, "body", cache_groups=2)
        idx = np.array([99, 0, 42, 17, 17, 63], dtype=np.int64)
        out = g.gather(idx)
        assert out.to_pylist() == [b"row99", b"row0", b"row42", b"row17", b"row17", b"row63"]

    def test_cache_eviction(self, payload_file):
        g = _RowGroupGather(payload_file, "body", cache_groups=1)
        # touch all 7 row groups with a 1-group cache — still correct
        idx = np.arange(0, 100, 7, dtype=np.int64)
        assert g.gather(idx).to_pylist() == [f"row{i}".encode() for i in range(0, 100, 7)]
        assert len(g._cache) == 1

    def test_empty(self, payload_file):
        g = _RowGroupGather(payload_file, "body")
        assert len(g.gather(np.array([], dtype=np.int64))) == 0


@pytest.mark.usefixtures("ray_session")
class TestCorpusFetcherMisses:
    def test_dead_link_and_meta_only(self, tmp_path):
        import ray

        from searchgov_spider_ray.functions.hashing import xxhash64
        from searchgov_spider_ray.stages.fetch import CorpusFetcher

        urls = [f"https://a.gov/p{i}" for i in range(10)]
        corpus = pa.table(
            {
                "url_hash": pa.array([xxhash64(u) for u in urls], type=pa.uint64()),
                "url": urls,
                "status": pa.array([200] * 10, type=pa.int16()),
                "content_type": ["text/html"] * 10,
                "content_language": ["en"] * 10,
                "image_id": [None] * 10,
            }
        )
        payload = pa.table({"body": pa.array([f"<html>{i}</html>".encode() for i in range(10)], type=pa.binary())})
        ppath = tmp_path / "pages.parquet"
        w = pq.ParquetWriter(ppath, payload.schema, compression="none")
        w.write_table(payload, row_group_size=4)
        w.close()
        meta = broadcastable(corpus)
        perm = np.argsort(meta["url_hash"].to_numpy(zero_copy_only=False), kind="stable").astype(np.int64)
        ref = ray.put((meta, perm, str(ppath)))

        probe_urls = [urls[3], "https://a.gov/missing", urls[7]]
        batch = pa.table(
            {
                "url": probe_urls,
                "url_hash": pa.array([xxhash64(u) for u in probe_urls], type=pa.uint64()),
            }
        )
        out = CorpusFetcher(ref)(batch)
        assert out["status"].to_pylist() == [200, 0, 200]
        assert out["body"].to_pylist() == [b"<html>3</html>", None, b"<html>7</html>"]

        out2 = CorpusFetcher(ref, meta_only=True)(batch)
        assert "body" not in out2.column_names
        assert out2["content_type"].to_pylist() == ["text/html", "", "text/html"]
