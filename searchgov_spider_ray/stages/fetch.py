"""Fetch stage: resolve frontier URLs to responses.

The production implementation is an HTTP actor pool (connection pools
per actor, 15 s timeout, 15 MB cap, no retries — reference
settings.py:38-50). This sandbox has no network, so the SAME stage
interface is backed by the synthetic corpus: a hash join of frontier
URLs against the corpus table (SURVEY.md §2.1 S3/S8 — the reference's
own e2e test replays a committed HTTP cache the same way,
tests/search_gov_spiders/test_full_crawl.py:32-39).

Broadcast, not shuffle: the driver ``ray.put``s ``(corpus Arrow table,
argsort permutation of its uint64 url_hash column)`` ONCE; stage
callables ``ray.get`` it lazily (zero-copy from the local object store
— N workers share one physical copy) and join each batch with a
vectorized ``np.searchsorted`` over the permuted hash array, mapping
hits back through the permutation. The table itself is never
re-ordered: a driver-side ``take`` of a multi-GB string/binary column
overflows 32-bit Arrow offsets, and per-batch takes of a few hundred
scattered rows are cheap. No Python strings in the probe path; matched
rows string-confirm to rule out hash collisions. A fetch miss models a
dead link: status 0, no body, never retried (RETRY_ENABLED=False
parity).

These callables are deliberately TASK-based (instances, not actor
pools): their only state is the read-only broadcast table, and lazy
zero-copy attach per task beats paying actor-pool spin-up every BSP
round. The genuinely mutable stages (URL-seen shards, politeness) are
the actor-held state. A real HTTP fetcher would flip back to an actor
pool via ``map_batches(HttpFetcher, concurrency=N)`` with this same
batch contract.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray


def broadcastable(table: pa.Table) -> pa.Table:
    """Prepare a table for ``ray.put`` + per-batch ``take``: cast
    string/binary columns to 64-bit-offset (large) types and combine
    chunks. ``take`` on a CHUNKED string column concatenates chunks
    first — with >2 GB of payload that overflows 32-bit offsets and,
    even below it, copies the whole column per batch. Single-chunk
    large-offset columns gather directly."""
    fields = []
    for f in table.schema:
        t = f.type
        if pa.types.is_string(t):
            t = pa.large_string()
        elif pa.types.is_binary(t):
            t = pa.large_binary()
        fields.append(pa.field(f.name, t, nullable=f.nullable))
    return table.cast(pa.schema(fields)).combine_chunks()


def _hash_probe(sorted_hashes: np.ndarray, probe: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """(positions, found-mask) of ``probe`` in the sorted hash column."""
    if len(sorted_hashes) == 0:
        return np.zeros(len(probe), dtype=np.int64), np.zeros(len(probe), dtype=bool)
    pos = np.searchsorted(sorted_hashes, probe)
    pos = np.minimum(pos, len(sorted_hashes) - 1)
    return pos, sorted_hashes[pos] == probe


class CorpusFetcher:
    """map_batches callable: frontier rows (url, url_hash, depth, seq,
    domain) → + (status, content_type, content_language, body,
    image_id).

    ``meta_only=True`` skips the ``body`` column: the frontier round
    materializes only fetch METADATA (order lineage, emit rows, image
    ids) and re-runs the cheap hash join with bodies inside the fully
    fused link-extraction chain, so multi-GB body payloads never land
    in the object store (streaming, not a shared materialization)."""

    def __init__(self, corpus_ref, meta_only: bool = False):
        self.corpus_ref = corpus_ref
        self.meta_only = meta_only
        self._sorted_hashes: np.ndarray | None = None
        self._perm: np.ndarray | None = None
        self._table: pa.Table | None = None

    def _ensure(self) -> None:
        if self._table is None:
            self._table, self._perm = ray.get(self.corpus_ref)  # zero-copy
            hashes = self._table["url_hash"].to_numpy(zero_copy_only=False)
            self._sorted_hashes = hashes[self._perm]

    def __call__(self, batch: pa.Table) -> pa.Table:
        self._ensure()
        probe = batch["url_hash"].to_numpy().astype(np.uint64)
        pos, found = _hash_probe(self._sorted_hashes, probe)
        rows = self._table.take(pa.array(self._perm[pos[found]], type=pa.int64()))
        # hash-collision guard: confirm url strings on matches only
        if len(rows):
            batch_urls = np.asarray(batch["url"].to_pylist(), dtype=object)[found]
            corpus_urls = np.asarray(rows["url"].to_pylist(), dtype=object)
            confirm = batch_urls == corpus_urls
            if not confirm.all():
                fidx = np.where(found)[0]
                found[fidx[~confirm]] = False
                rows = rows.filter(pa.array(confirm))

        n = len(batch)
        status = np.zeros(n, dtype=np.int16)
        ctype = np.full(n, "", dtype=object)
        lang = np.full(n, None, dtype=object)
        body: list = [None] * n
        image_id = np.full(n, None, dtype=object)
        fidx = np.where(found)[0]
        st = rows["status"].to_numpy()
        ct = rows["content_type"].to_pylist()
        lg = rows["content_language"].to_pylist()
        bd = None if self.meta_only else rows["body"].to_pylist()
        im = rows["image_id"].to_pylist()
        for k, i in enumerate(fidx):
            status[i] = st[k]
            ctype[i] = ct[k]
            lang[i] = lg[k]
            if bd is not None:
                body[i] = bd[k]
            image_id[i] = im[k]
        out = batch
        out = out.append_column("status", pa.array(status, type=pa.int16()))
        out = out.append_column("content_type", pa.array(ctype, type=pa.string()))
        out = out.append_column("content_language", pa.array(lang, type=pa.string()))
        if not self.meta_only:
            out = out.append_column("body", pa.array(body, type=pa.binary()))
        out = out.append_column("image_id", pa.array(image_id, type=pa.string()))
        return out


class ImageAttach:
    """map_batches callable: emitted rows with ``image_id`` → full
    image+caption corpus rows (image_id, bytes, w, h, fmt, caption,
    phash — the Lance row shape of BASELINE.json input_hint). Rows
    without an image are dropped (they emit to the URL-list sink
    instead). Join key: uint64 ``id_hash`` precomputed by the driver."""

    def __init__(self, images_ref):
        self.images_ref = images_ref
        self._sorted_hashes: np.ndarray | None = None
        self._perm: np.ndarray | None = None
        self._table: pa.Table | None = None

    def _ensure(self) -> None:
        if self._table is None:
            self._table, self._perm = ray.get(self.images_ref)  # zero-copy
            hashes = self._table["id_hash"].to_numpy(zero_copy_only=False)
            self._sorted_hashes = hashes[self._perm]

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..functions.hashing import xxhash64_array

        self._ensure()
        batch = batch.filter(batch["image_id"].is_valid())
        ids = batch["image_id"].to_pylist()
        probe = xxhash64_array(ids)
        pos, found = _hash_probe(self._sorted_hashes, probe)
        batch = batch.filter(pa.array(found))
        rows = self._table.take(pa.array(self._perm[pos[found]], type=pa.int64()))
        out = batch.drop_columns(["image_id"])
        for name in ("image_id", "bytes", "w", "h", "fmt", "caption", "phash"):
            out = out.append_column(name, rows[name])
        return out
