"""Large-large relational primitives Ray Data 2.49 lacks natively.

``hash_join``: a hash-partitioned equi-join where BOTH sides are big —
the case broadcast joins (``priority_by_region``'s searchsorted lookup,
``stages/fetch.py``'s corpus index) don't cover. Each side is tagged and
padded to one unified schema, unioned, coarse-partitioned by a pure
function of the join key (so every key's rows from both sides co-locate,
same discipline as training.py's pair kernels), and merged with ONE
vectorized pandas merge per partition — no per-key Python, no driver
materialization. An optional ``post`` kernel runs inside each partition
right after the merge so partial aggregates can collapse before leaving
the exchange (combiner pushdown).

Skew note: a pathologically hot join key concentrates its rows in one
partition; for known-skewed keys, salt the hot keys on the N:1 side and
replicate the 1-side rows per salt — the standard fix, left to callers
because it needs key statistics.
"""

from __future__ import annotations

from typing import Callable

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from ..functions.simdedup import hash_part as _key_part  # shared partitioner


def hash_join(
    left: rd.Dataset,
    right: rd.Dataset,
    on: str,
    n_parts: int = 64,
    how: str = "inner",
    post: Callable[[pd.DataFrame], pd.DataFrame] | None = None,
) -> rd.Dataset:
    """Hash-partitioned equi-join on integer key ``on``; non-key column
    names must be disjoint. ``post`` (optional) is applied to each
    partition's merged frame before it leaves the exchange."""
    def _arrow_type(t) -> pa.DataType:
        # Ray's Schema.types carries Arrow types for Arrow-backed blocks
        # but numpy dtypes / Python classes for pandas-backed ones
        if isinstance(t, pa.DataType):
            return t
        if t is object or t is str:
            return pa.string()
        return pa.from_numpy_dtype(np.dtype(t))

    lcols = [c for c in left.schema().names if c != on]
    rcols = [c for c in right.schema().names if c != on]
    clash = set(lcols) & set(rcols)
    if clash:
        raise ValueError(f"hash_join column name clash: {sorted(clash)}")
    l_schema = {
        c: _arrow_type(left.schema().types[left.schema().names.index(c)]) for c in lcols
    }
    r_schema = {
        c: _arrow_type(right.schema().types[right.schema().names.index(c)]) for c in rcols
    }

    def prep(side: int, own: list[str], other_schema: dict):
        def kernel(t: pa.Table) -> pa.Table:
            keys = pc.cast(t[on], pa.int64())
            n = len(t)
            cols = {
                on: keys,
                "__side": pa.array(np.full(n, side, dtype=np.int8)),
                "__part": pa.array(
                    _key_part(keys.to_numpy(zero_copy_only=False), n_parts)
                ),
            }
            for c in own:
                cols[c] = t[c]
            for c, typ in other_schema.items():
                cols[c] = pa.nulls(n, type=typ)
            return pa.table(cols)

        return kernel

    tagged = left.map_batches(prep(0, lcols, r_schema), batch_format="pyarrow").union(
        right.map_batches(prep(1, rcols, l_schema), batch_format="pyarrow")
    )

    def merge(group: pa.Table) -> pa.Table:
        # split sides in ARROW, then convert each side separately: the
        # union's null pad columns are dropped before pandas ever sees
        # them, so integer payloads never round-trip through float64 —
        # int64 values >= 2^53 (hash ids, packed keys) stay exact.
        # (Columns that are null in the ORIGINAL data still go float in
        # pandas, same as a plain to_pandas would.)
        side = group["__side"].to_numpy(zero_copy_only=False)
        l = group.filter(pa.array(side == 0)).select([on, *lcols]).to_pandas()
        r = group.filter(pa.array(side == 1)).select([on, *rcols]).to_pandas()
        out = l.merge(r, on=on, how=how)
        if post is not None:
            out = post(out)
        return pa.Table.from_pandas(out, preserve_index=False).replace_schema_metadata(None)

    return tagged.groupby("__part").map_groups(merge, batch_format="pyarrow")


def range_join_intervals(
    points: rd.Dataset,
    intervals: pd.DataFrame,
    ts_col: str,
    start_col: str = "win_start",
    end_col: str = "win_end",
    n_parts: int = 64,
) -> rd.Dataset:
    """Range (interval) join Ray Data lacks natively: match each point
    row to every interval with ``start <= ts < end``. The interval side
    is the small side (window/campaign/maintenance tables — thousands to
    millions of rows), broadcast ONCE via ``ray.put`` as two sorted
    int64 arrays; each point batch finds its matches with two
    ``np.searchsorted`` probes and a bounded ``np.repeat`` expansion —
    no shuffle at all, no per-row Python.

    Requires intervals sorted by start with a BOUNDED maximum length L
    (computed here): a point at ``ts`` can only match intervals whose
    start lies in ``(ts - L, ts]``, which is a contiguous run of the
    start-sorted table. Fan-out per point is bounded by the max overlap
    degree, so output stays proportional to the true match count.
    For an interval side too big to broadcast, range-partition BOTH
    sides by time with intervals replicated into every partition they
    overlap (same replication trick as the wide as-of join) — not
    needed at any realistic window-table size.
    """
    import ray

    iv = intervals.sort_values(start_col, kind="mergesort").reset_index(drop=True)
    starts = iv[start_col].to_numpy(dtype=np.int64)
    ends = iv[end_col].to_numpy(dtype=np.int64)
    max_len = int((ends - starts).max()) if len(iv) else 0
    # broadcast as an ARROW table: column types survive empty takes, so
    # no-match/empty batches keep the same output schema as matching ones
    # (string label columns included)
    iv_tab = pa.Table.from_pandas(iv, preserve_index=False).replace_schema_metadata(None)
    iv_ref = ray.put((starts, ends, iv_tab))

    def kernel(t: pa.Table) -> pa.Table:
        starts_, ends_, iv_ = ray.get(iv_ref)
        ts = t[ts_col].to_numpy(zero_copy_only=False).astype(np.int64)
        if not len(starts_) or not len(ts):
            row_rep = np.empty(0, dtype=np.int64)
            cand = np.empty(0, dtype=np.int64)
        else:
            # candidate run: starts in [ts - L, ts]; the lower bound may
            # admit already-ended intervals — the ``ok`` filter drops them
            lo = np.searchsorted(starts_, ts - max_len, side="left")
            hi = np.searchsorted(starts_, ts, side="right")
            n_cand = np.maximum(hi - lo, 0)
            row_rep = np.repeat(np.arange(len(ts)), n_cand)
            cand = np.arange(int(n_cand.sum())) - np.repeat(np.cumsum(n_cand) - n_cand, n_cand) + lo[row_rep]
            ok = ts[row_rep] < ends_[cand]  # start <= ts is implied by cand <= hi
            row_rep, cand = row_rep[ok], cand[ok]
        out = t.take(pa.array(row_rep, type=pa.int64()))
        idx = pa.array(cand, type=pa.int64())
        for c in iv_.column_names:
            out = out.append_column(c, iv_.column(c).take(idx))
        return out

    return points.map_batches(kernel, batch_format="pyarrow")
