"""Output sinks: URL CSV writer with size-targeted rotation, endpoint
batch POST, i14y/ES-shaped bulk sink, sitemap snapshot writer.

Reference (SURVEY.md §2.2):
  K1 CSV w/ 100 KB rotation — pipelines.py:111-141, MAX_URL_BATCH_SIZE_BYTES
  K2 endpoint POST of {"urls": [...]} batches ≥100 KB — pipelines.py:105-170
  K3 Elasticsearch bulk of 50-doc batches — es_batch_upload.py:25-134
  K4 sorted sitemap snapshot per sitemap id — sitemap_monitor.py:151-162
  K5 sitemap CSV report — sitemap_finder.py:16-40

Ray-Data-first: rotation is block-size targeting (write_csv splits per
block), batching is per-batch map with a terminal flush, and the ES
"index" in this engine is the Lance/parquet corpus table. The HTTP
transport is abstracted behind a ``post`` callable (no network in this
sandbox; production injects a requests session per actor).
"""

from __future__ import annotations

import json
from pathlib import Path

import pyarrow as pa
import ray.data as rd

MAX_URL_BATCH_SIZE_BYTES = 100 * 1024  # reference: pipelines.py:34
ES_BATCH_DOCS = 50  # reference: es_batch_upload.py:28


def write_url_csv(ds: rd.Dataset, out_dir: str | Path, target_bytes: int = MAX_URL_BATCH_SIZE_BYTES) -> None:
    """One URL per line, files rotated at ~target_bytes (reference
    rotates at 100 KB by hand; here rotation = row-count targeting per
    output block, assuming ~64 B/URL)."""
    rows_per_file = max(1, target_bytes // 64)
    ds.select_columns(["url"]).write_csv(
        str(out_dir), min_rows_per_file=rows_per_file
    )


class EndpointBatchPoster:
    """map_batches terminal stage: chunk each batch's URLs into
    ≥ max_bytes POSTs of {"urls": [...]} and flush the remainder BEFORE
    returning (reference: SearchGovSpidersPipeline._process_api_item /
    _post_urls, pipelines.py:105-109,143-170). ``post(payload: dict)``
    is injected — production: requests.post(SPIDER_URLS_API, ...).

    Loss-free by construction: Ray clones the instance per task (and
    kills actors without a close hook), so a cross-batch buffer would
    silently drop its tail with the task — the remainder must leave
    with the batch that brought it."""

    def __init__(self, post, max_bytes: int = MAX_URL_BATCH_SIZE_BYTES):
        self.post = post
        self.max_bytes = max_bytes
        self._buf: list[str] = []
        self._size = 0

    def __call__(self, batch: pa.Table) -> pa.Table:
        for url in batch["url"].to_pylist():
            self._buf.append(url)
            self._size += len(url) + 1
            if self._size >= self.max_bytes:
                self.flush()
        self.flush()  # remainder leaves with its batch — see class note
        return batch.select(["url"])

    def flush(self) -> None:
        if self._buf:
            self.post({"urls": self._buf})
            self._buf = []
            self._size = 0


def write_i14y_jsonl(ds: rd.Dataset, out_dir: str | Path, batch_docs: int = ES_BATCH_DOCS) -> None:
    """ES-bulk-shaped sink: docs as JSONL in ~50-doc batches with the
    language-suffixed field names reconstructed (the reference bulk-
    uploads via helpers.bulk; here the 'index' is a partitioned JSONL/
    parquet directory a bulk loader can replay)."""
    from ..stages.docparse import to_i14y_record

    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)

    def dump(batch: pa.Table) -> pa.Table:
        docs = [to_i14y_record(d) for d in batch.to_pylist()]
        if docs:
            import hashlib

            # name by the batch's full id set: distinct batches can share
            # a first doc (or its 12-char prefix) — content-keyed names
            # never collide and re-runs overwrite with identical bytes
            tag = hashlib.sha256("\n".join(d["_id"] for d in docs).encode()).hexdigest()[:16]
            name = out / f"bulk_{tag}.jsonl"
            with open(name, "w") as f:
                for d in docs:
                    f.write(json.dumps({k: v for k, v in d.items() if v is not None}) + "\n")
        return batch.select(["doc_id"])

    ds.map_batches(dump, batch_format="pyarrow", batch_size=batch_docs).materialize()


def write_sitemap_snapshot(ds: rd.Dataset, out_dir: str | Path) -> None:
    """Sorted URL snapshot partitioned by sitemap id (reference writes
    ``<md5(sitemap_url)>.txt`` sorted — sitemap_monitor.py:151-162)."""
    import hashlib

    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)

    def dump(group: "pd.DataFrame") -> "pd.DataFrame":
        sitemap_url = group["sitemap_url"].iloc[0]
        key = hashlib.md5(str(sitemap_url).encode()).hexdigest()
        path = out / f"{key}.txt"
        existing = path.read_text().splitlines() if path.exists() else []
        merged = sorted(set(existing) | set(group["url"]))
        path.write_text("\n".join(merged) + "\n")
        return group

    # groupby FIRST: one task owns each sitemap's file — a plain
    # map_batches could split one sitemap's rows across concurrent
    # tasks whose read-merge-write cycles race (last writer wins,
    # losing URLs that then resurface as spurious 'new' diffs)
    ds.groupby("sitemap_url").map_groups(dump, batch_format="pandas").materialize()


def write_partitioned_resumable(
    ds: rd.Dataset,
    out_dir: str | Path,
    key_col: str,
    n_buckets: int = 256,
    partitioning: str = "hash",
    range_size: int = 1 << 20,
) -> "pd.DataFrame":
    """Resumable partitioned parquet sink — the 100-TB output contract:
    rows land in ``n_buckets`` hash-of-key bucket directories
    (``bucket=0007/part.parquet``), each written ATOMICALLY (temp file +
    os.replace), so a killed run leaves only whole buckets behind and
    the restart SKIPS them — completed buckets are detected up front
    and their rows are dropped at the map stage (a vectorized bucket-id
    is_in per batch), so a resume re-reads the input but re-writes and
    re-shuffles only the missing key ranges. One groupby exchange
    co-locates each bucket; one task owns each file (no write races).
    Returns the receipt frame (bucket, rows, path) for the buckets
    written by THIS call — the generalization of the frontier's
    per-round checkpoint discipline (state/checkpoint.py) to arbitrary
    query output.

    ``partitioning="hash"`` (default) spreads keys uniformly — the
    right layout for resume granularity and skew. ``"range"`` puts
    CONTIGUOUS key ranges in each bucket (``bucket = key //
    range_size``): every bucket file then carries tight parquet
    footer min/max stats on the key, so :func:`read_partitioned_pruned`
    can skip whole buckets for a key-range predicate — the zone-map /
    clustered-layout trade. Callers size ``range_size`` so the bucket
    count stays bounded (it is data-dependent; ``n_buckets`` is
    ignored in range mode)."""
    import os

    import numpy as np
    import pandas as pd
    import pyarrow.parquet as pq

    from ..functions.simdedup import hash_part

    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    done = np.array(
        sorted(
            int(p.name.split("=")[1])
            for p in out.glob("bucket=*")
            if (p / "part.parquet").exists()
        ),
        dtype=np.int64,
    )

    if partitioning not in ("hash", "range"):
        raise ValueError(f"partitioning must be 'hash' or 'range', got {partitioning!r}")

    def bucketize(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        keys = pc.cast(t[key_col], pa.int64()).to_numpy(zero_copy_only=False)
        if partitioning == "range":
            b = keys // np.int64(range_size)
        else:
            b = hash_part(keys, n_buckets).astype(np.int64)
        t = t.append_column("__bucket", pa.array(b))
        if len(done):
            idx = np.searchsorted(done, b)
            idx_c = np.minimum(idx, len(done) - 1)
            skip = (idx < len(done)) & (done[idx_c] == b)
            t = t.filter(pa.array(~skip))
        return t

    def dump(group: pd.DataFrame) -> pd.DataFrame:
        b = int(group["__bucket"].iloc[0])
        bdir = out / f"bucket={b:04d}"
        bdir.mkdir(parents=True, exist_ok=True)
        final = bdir / "part.parquet"
        tmp = bdir / f".part.parquet.tmp.{os.getpid()}"
        body = group.drop(columns="__bucket").sort_values(key_col, kind="mergesort")
        pq.write_table(pa.Table.from_pandas(body, preserve_index=False), tmp)
        os.replace(tmp, final)  # atomic: readers never see a torn file
        return pd.DataFrame({"bucket": [b], "rows": [len(body)], "path": [str(final)]})

    receipts = (
        ds.map_batches(bucketize, batch_format="pyarrow")
        .groupby("__bucket")
        .map_groups(dump, batch_format="pandas")
        .to_pandas()
    )
    if len(receipts) == 0:
        receipts = pd.DataFrame(
            {"bucket": pd.Series([], dtype="int64"),
             "rows": pd.Series([], dtype="int64"),
             "path": pd.Series([], dtype="str")}
        )
    return receipts.sort_values("bucket").reset_index(drop=True)


def read_partitioned_pruned(
    out_dir: str | Path,
    col: str,
    lo: int,
    hi: int,
    columns: "list[str] | None" = None,
) -> "tuple[rd.Dataset, dict]":
    """Zone-map scan pruning over :func:`write_partitioned_resumable`
    output: before any data is read, each bucket file's parquet FOOTER
    row-group statistics (min/max of ``col``) decide whether the file
    can contain rows with ``lo <= col <= hi``; non-intersecting files
    are skipped entirely — the predicate never touches their bytes.
    Pays off when the layout clusters ``col`` (range partitioning, or
    a Z-order key that covers it); under hash partitioning every
    bucket spans the full range and nothing prunes (by design). The
    surviving files stream through ``read_parquet(columns=...)`` with
    the exact row predicate re-applied per batch. Returns ``(dataset,
    stats)`` where stats counts files total/read — the observability
    hook the resume/receipt discipline requires (no silent pruning).
    Footer reads are metadata-only (KB per file) and bounded by the
    bucket count, which the writer keeps small."""
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    files = sorted(Path(out_dir).glob("bucket=*/part.parquet"))
    keep: list[str] = []
    for f in files:
        md = pq.ParquetFile(f).metadata
        idx = md.schema.to_arrow_schema().get_field_index(col)
        intersects = False
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(idx).statistics
            if st is None or not st.has_min_max:
                intersects = True  # no stats → cannot prune safely
                break
            if st.min <= hi and st.max >= lo:
                intersects = True
                break
        if intersects:
            keep.append(str(f))
    stats = {"files_total": len(files), "files_read": len(keep)}
    if not keep:
        import ray.data as _rd

        return _rd.from_items([]), stats

    def row_filter(t: pa.Table) -> pa.Table:
        if "bucket" in t.column_names and columns is None:
            # hive-inferred partition column from the bucket= dirs: the
            # reader contract returns the file's own schema
            t = t.drop_columns(["bucket"])
        m = pc.and_(
            pc.greater_equal(t[col], pa.scalar(lo)),
            pc.less_equal(t[col], pa.scalar(hi)),
        )
        return t.filter(m)

    ds = rd.read_parquet(keep, columns=columns).map_batches(
        row_filter, batch_format="pyarrow"
    )
    return ds, stats
