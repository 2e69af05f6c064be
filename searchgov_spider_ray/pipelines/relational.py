"""Large-large relational primitives Ray Data 2.49 lacks natively.

``hash_join``: a hash-partitioned equi-join where BOTH sides are big —
the case broadcast joins (``priority_by_region``'s searchsorted lookup,
``stages/fetch.py``'s corpus index) don't cover. Each side is tagged and
padded to one unified schema, unioned, coarse-partitioned by a pure
function of the join key (so every key's rows from both sides co-locate,
same discipline as training.py's pair kernels), and merged with ONE
vectorized kernel per partition — no per-key Python, no driver
materialization. An optional ``post`` kernel runs inside each partition
right after the merge so partial aggregates can collapse before leaving
the exchange (combiner pushdown).

``how`` semantics:
- ``inner`` / ``left``: pandas merge per partition. ``left`` converts
  the right side's int64 payloads to pandas nullable Int64 first so
  null-padded misses never round-trip values >= 2^53 through float64.
- ``anti`` / ``semi``: Arrow-native key-membership filter per partition
  (``pc.is_in`` against the partition's right-key set) — exact for
  int64 of any magnitude and for string keys, no pandas conversion at
  all unless a ``post`` kernel is supplied. NULL left keys follow SQL
  ANTI/SEMI (NOT EXISTS) semantics: never match, so anti keeps them and
  semi drops them.

Keys may be integer (cast to int64) or string (partitioned by the
lockstep-vectorized ``xxhash64_array``, the repo-standard string hash).

Skew: a pathologically hot join key concentrates its rows in one
partition. ``salt_hot=True`` enables the standard fix — a cheap
key-count partial pass over the left (N) side detects keys whose global
count exceeds ``hot_factor`` × the expected per-partition mean, the
left side's hot rows are salted across ``n_salts`` partitions, and the
right (1 / key) side's hot rows are REPLICATED into each salted
partition. Replication makes the per-partition merge exact for
inner/left/semi/anti, but it splits a hot key's merged rows across
partitions — so with ``salt_hot`` a ``post`` kernel must be a true
combiner (re-combined downstream), never a finalizer. Off by default.
"""

from __future__ import annotations

from typing import Callable

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data as rd

from ..functions.hashing import xxhash64_array
from ..functions.simdedup import hash_part as _key_part  # shared partitioner

_SALT_STEP = np.uint64(0xC2B2AE3D27D4EB4F)  # xxhash prime2: decorrelates salted parts


def _part_of(keys: np.ndarray, n_parts: int) -> np.ndarray:
    """Partition id for int64 or string key arrays (shared partitioner;
    strings go through the vectorized xxhash64 kernel first)."""
    if keys.dtype.kind in ("i", "u"):
        return _key_part(keys, n_parts)
    return _key_part(xxhash64_array(keys), n_parts)


def _salted_left_parts(
    base_part: np.ndarray, is_hot: np.ndarray, n_salts: int, n_parts: int
) -> np.ndarray:
    """Hot left (N-side) rows fan out across ``n_salts`` partitions,
    spread deterministically by row position (no RNG — stable under
    task retry); cold rows keep their base partition."""
    part = base_part.copy()
    if is_hot.any():
        base = base_part.astype(np.uint64)
        salt = np.arange(len(base_part), dtype=np.uint64) % np.uint64(n_salts)
        part[is_hot] = (
            (base[is_hot] + salt[is_hot] * _SALT_STEP) % np.uint64(n_parts)
        ).astype(np.int32)
    return part


def _replicated_right_parts(
    base_part: np.ndarray, is_hot: np.ndarray, n_salts: int, n_parts: int
) -> tuple[np.ndarray, np.ndarray]:
    """Hot right (1-per-key side) rows are REPLICATED into every salted
    partition their left counterparts can land in. Returns (take_idx,
    part): row indices into the original batch (hot rows appearing
    ``n_salts`` times) and the partition id per taken row."""
    hot_idx = np.flatnonzero(is_hot)
    cold_idx = np.flatnonzero(~is_hot)
    rep_idx = np.repeat(hot_idx, n_salts)
    salt = np.tile(np.arange(n_salts, dtype=np.uint64), len(hot_idx))
    base = base_part.astype(np.uint64)
    rep_part = ((base[rep_idx] + salt * _SALT_STEP) % np.uint64(n_parts)).astype(np.int32)
    take_idx = np.concatenate([cold_idx, rep_idx])
    part = np.concatenate([base_part[cold_idx], rep_part])
    return take_idx, part


def hash_join(
    left: rd.Dataset,
    right: rd.Dataset,
    on: str,
    n_parts: int = 64,
    how: str = "inner",
    post: Callable[[pd.DataFrame], pd.DataFrame] | None = None,
    salt_hot: bool = False,
    n_salts: int = 8,
    hot_factor: float = 2.0,
) -> rd.Dataset:
    """Hash-partitioned equi-join on key ``on`` (int or string);
    non-key column names must be disjoint. ``post`` (optional) is
    applied to each partition's merged frame before it leaves the
    exchange. ``how`` ∈ {inner, left, outer, semi, anti}; semi/anti
    return left columns only (``right`` may be a bare key dataset)."""
    if how not in ("inner", "left", "outer", "semi", "anti"):
        raise ValueError(f"hash_join: unsupported how={how!r}")

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
    key_type = _arrow_type(left.schema().types[left.schema().names.index(on)])
    string_key = pa.types.is_string(key_type) or pa.types.is_large_string(key_type)

    hot_ref = None
    if salt_hot:
        hot = _detect_hot_keys(left, on, string_key, n_parts, hot_factor)
        if len(hot):
            # store the Arrow value set once — batches reuse it directly
            hot_ref = ray.put(pa.array(hot))
        n_salts = max(int(n_salts), 1)

    def _keys_np(arr: pa.ChunkedArray | pa.Array) -> np.ndarray:
        # PARTITIONING view of the key column: nulls are filled with a
        # fixed sentinel so a nullable batch never changes dtype — an
        # int64 column with one NULL otherwise to_numpy()s to float64
        # and would route through a DIFFERENT partition function than
        # null-free batches, splitting equal keys across partitions.
        # Null keys all land in the sentinel's partition; the merge
        # handles their (non-)matching semantics exactly.
        if string_key:
            return np.asarray(pc.fill_null(arr, "").to_pylist(), dtype=object)
        return pc.fill_null(arr, 0).to_numpy(zero_copy_only=False).astype(np.int64)

    def prep(side: int, own: list[str], other_schema: dict):
        # side 0 = left (N side: hot rows salted across n_salts parts);
        # side 1 = right (1-per-key side: hot rows replicated per salt)
        def kernel(t: pa.Table) -> pa.Table:
            keys = t[on] if string_key else pc.cast(t[on], pa.int64())
            np_keys = _keys_np(keys)
            part = _part_of(np_keys, n_parts)
            take_idx = None
            if hot_ref is not None:
                hot_keys = ray.get(hot_ref)  # local object store; zero-copy
                is_hot = (
                    pc.fill_null(pc.is_in(keys, value_set=hot_keys), False)
                    .to_numpy(zero_copy_only=False)
                )
                if is_hot.any():
                    if side == 0:
                        part = _salted_left_parts(part, is_hot, n_salts, n_parts)
                    else:
                        take_idx, part = _replicated_right_parts(
                            part, is_hot, n_salts, n_parts
                        )
            if take_idx is not None:
                t = t.take(pa.array(take_idx, type=pa.int64()))
                keys = t[on] if string_key else pc.cast(t[on], pa.int64())
            n = len(t)
            cols = {
                on: keys,
                "__side": pa.array(np.full(n, side, dtype=np.int8)),
                "__part": pa.array(part),
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
        l_tab = group.filter(pa.array(side == 0)).select([on, *lcols])
        r_tab = group.filter(pa.array(side == 1)).select([on, *rcols])
        if how in ("semi", "anti"):
            # Arrow-native membership: no pandas, exact at any int64
            # magnitude. NULL keys never match (SQL): nulls are dropped
            # from the value set and fill_null(False) handles left nulls.
            rset = pc.unique(r_tab[on].combine_chunks().drop_null())
            mask = pc.fill_null(pc.is_in(l_tab[on], value_set=rset), False)
            if how == "anti":
                mask = pc.invert(mask)
            out_tab = l_tab.filter(mask)
            if post is None:
                return out_tab
            out = post(out_tab.to_pandas())
            return pa.Table.from_pandas(out, preserve_index=False).replace_schema_metadata(None)
        # SQL join semantics: a NULL key matches nothing. pandas merge
        # would match NaN==NaN, so drop null-key right rows first (a
        # null-key left row then finds no partner: dropped by inner,
        # null-padded by left/outer — exactly SQL; for outer the
        # dropped null-key RIGHT rows re-enter below, left-null-padded).
        r_null = r_tab.filter(pc.is_null(r_tab[on])) if how == "outer" else None
        r_tab = r_tab.filter(pc.is_valid(r_tab[on]))
        l = l_tab.to_pandas()
        r = r_tab.to_pandas()
        if how in ("left", "outer"):
            # null-padded misses must not drag int64 payloads through
            # float64 — promote the padded side(s) to nullable Int64
            up = {c: "Int64" for c in rcols if r[c].dtype == np.int64}
            if up:
                r = r.astype(up)
        if how == "outer":
            up = {c: "Int64" for c in lcols if l[c].dtype == np.int64}
            # the key itself pads on right-only rows: keep int64 exact
            if l[on].dtype == np.int64:
                up[on] = "Int64"
                r = r.astype({on: "Int64"})
            if up:
                l = l.astype(up)
        out = l.merge(r, on=on, how=how)
        if how == "outer" and r_null is not None and len(r_null):
            pad = r_null.to_pandas().reindex(columns=list(out.columns))
            pad = pad.astype(
                {c: out[c].dtype for c in out.columns if str(out[c].dtype) == "Int64"}
            )
            out = pd.concat([out, pad], ignore_index=True)
        if post is not None:
            out = post(out)
        return pa.Table.from_pandas(out, preserve_index=False).replace_schema_metadata(None)

    return tagged.groupby("__part").map_groups(merge, batch_format="pyarrow")


def _detect_hot_keys(
    ds: rd.Dataset, on: str, string_key: bool, n_parts: int, hot_factor: float
):
    """One cheap partial pass: per-batch top key counts (bounded to 16
    keys per batch) combined on the driver; a key is HOT when its
    global count exceeds hot_factor × (total rows / n_parts). The
    driver holds O(batches × 16) rows, never the key set."""
    def partial(df: pd.DataFrame) -> pd.DataFrame:
        vc = df[on].value_counts().head(16)
        out = pd.DataFrame({on: vc.index, "n": vc.to_numpy(np.int64)})
        # batch-total carried on the FIRST row only — broadcasting it
        # onto all 16 partial rows would inflate the global total 16x
        # and push the hot threshold out of reach of any real key
        out["tot"] = 0
        if len(out):
            out.iloc[0, out.columns.get_loc("tot")] = len(df)
        return out

    parts = ds.map_batches(partial, batch_format="pandas").to_pandas()
    if parts.empty:
        return np.array([], dtype=object if string_key else np.int64)
    total = int(parts["tot"].sum()) or 1
    counts = parts.groupby(on)["n"].sum()
    # a key under-counted by the per-batch cap is by construction not
    # globally hot at any realistic batch count: a truly hot key is a
    # top-16 key in nearly every batch it appears in
    hot = counts[counts > hot_factor * total / max(n_parts, 1)]
    if string_key:
        return hot.index.to_numpy(object)
    return hot.index.to_numpy(np.int64)


def anti_join_keys(
    left: rd.Dataset,
    right_keys: rd.Dataset,
    on: str,
    broadcast_below: int = 2_000_000,
    n_parts: int = 64,
) -> rd.Dataset:
    """The A5 anti-join shape (new = current ∖ previous) at any scale:
    below ``broadcast_below`` right rows, broadcast the distinct key
    set once via ``ray.put`` and filter each left batch with a
    vectorized membership test (no shuffle at all); above it, the
    hash-partitioned ``how="anti"`` join (two exchanges, nothing on the
    driver). Same narrow/wide dispatch discipline as training.py's
    ``WIDE_DOC_ROWS``."""
    # materialize the (narrow, key-only) right side once: count() and
    # the following unique()/join would otherwise each re-execute its
    # upstream pipeline; blocks spill if large, never the driver heap
    right_keys = right_keys.materialize()
    if right_keys.count() < broadcast_below:
        keys = right_keys.unique(on)
        key_type = left.schema().types[left.schema().names.index(on)]
        is_str = (
            isinstance(key_type, pa.DataType)
            and (pa.types.is_string(key_type) or pa.types.is_large_string(key_type))
        ) or key_type in (object, str)
        # SQL NOT EXISTS: a NULL right key matches nothing — drop nulls
        # (and NaN floats from pandas-backed blocks) instead of crashing
        # the int cast or stringifying None into a real "None" key
        vals = [
            k for k in keys
            if k is not None and not (isinstance(k, float) and np.isnan(k))
        ]
        if is_str:
            vset = pa.array(sorted(vals), type=pa.string())
        else:
            vset = pa.array(np.sort(np.asarray(vals, dtype=np.int64)))
        ref = ray.put(vset)

        class _Anti:
            def __init__(self):
                self._s = None

            def __call__(self, t: pa.Table) -> pa.Table:
                if self._s is None:
                    self._s = ray.get(ref)
                mask = pc.fill_null(pc.is_in(t[on], value_set=self._s), False)
                return t.filter(pc.invert(mask))

        return left.map_batches(_Anti(), batch_format="pyarrow")
    return hash_join(left, right_keys.select_columns([on]), on=on, n_parts=n_parts, how="anti")


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
