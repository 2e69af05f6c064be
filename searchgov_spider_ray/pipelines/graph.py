"""Iterative graph algorithms as Ray Data pipelines.

PageRank is the iterative-algorithm surface the crawl link graph
naturally motivates (the reference's BFS frontier is the same graph
walked once — search_gov_crawler/search_gov_spiders/settings.py:60-64;
PageRank walks it to a fixed point). Everything is exact integer
fixed-point arithmetic so a DuckDB oracle can replay it bit-for-bit:
ranks live in micro-units (node mass 1.0 = 1_000_000), damping 0.85 is
the integer pair (850_000, // 1_000_000), and every division is floor
division on non-negative int64.

Scale notes
-----------
- The distinct edge table is built once (hash-partitioned join with
  per-partition dedup) and reused by every iteration.
- Iteration dispatch mirrors the WIDE_DOC_ROWS discipline elsewhere:
  below ``wide_nodes`` the whole graph fits one vectorized kernel
  (searchsorted + np.add.at — the narrow path); above it, each
  iteration is two hash-partitioned joins (edges⨝ranks on src →
  per-partition (dst, contrib) partials; nodes left⨝ contrib for the
  teleport step) — nothing broadcast, nothing driver-side except the
  O(1)-per-partition exchange. Forced-wide parity is pinned in
  tests/test_queries_oracle.py.
- int64 headroom: a node's incoming contribution is bounded by total
  rank mass (1e6 × N), so DAMP_NUM × contrib can overflow int64 past
  ~1e7 nodes ONLY on near-star topologies; the kernel asserts the
  actual bound per iteration instead of guessing (a 10^10-node graph
  would rescale units rather than fail silently).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data as rd

MICRO = 1_000_000
DAMP_NUM = 850_000
TELEPORT = 150_000  # (1 - 0.85) in micro-units
_I64_MAX = np.iinfo(np.int64).max


def _next_rank(contrib: np.ndarray) -> np.ndarray:
    if len(contrib):
        assert int(contrib.max()) <= _I64_MAX // DAMP_NUM, "rescale rank units"
    return TELEPORT + (DAMP_NUM * contrib) // MICRO


def pagerank_int(edges: pd.DataFrame, n_iter: int = 5) -> pd.DataFrame:
    """Narrow path: integer fixed-point PageRank over a distinct
    directed edge list in one vectorized kernel.

    r_0(v) = MICRO;  r_{k+1}(v) = TELEPORT + (DAMP_NUM *
    sum_{u->v}(r_k(u) // outdeg(u))) // MICRO — every step exact int64,
    so the SQL replay (unrolled CTEs with the same floor divisions)
    matches bit-for-bit. Every node in the edge list has outdeg >= 1 by
    construction (bipartite double edges), so no dangling-mass term."""
    src = edges["src"].to_numpy(np.int64)
    dst = edges["dst"].to_numpy(np.int64)
    nodes = np.unique(np.concatenate([src, dst]))
    n = len(nodes)
    si = np.searchsorted(nodes, src)
    di = np.searchsorted(nodes, dst)
    outdeg = np.bincount(si, minlength=n).astype(np.int64)
    r = np.full(n, MICRO, dtype=np.int64)
    for _ in range(n_iter):
        share = r[si] // outdeg[si]
        contrib = np.zeros(n, dtype=np.int64)
        np.add.at(contrib, di, share)  # int64-exact scatter-add
        r = _next_rank(contrib)
    return pd.DataFrame({"node_id": nodes, "rank_ppm": r})


def bfs_depths(
    edges: pd.DataFrame, sources: np.ndarray, max_depth: int = 6
) -> pd.DataFrame:
    """Multi-source BFS over a distinct directed edge list: (node_id,
    dist) for every node reachable within ``max_depth`` hops — the
    crawl frontier expressed as a graph query (the engine's BSP rounds
    walk exactly this recurrence with politeness in the loop;
    pipelines/frontier.py).

    Narrow kernel: CSR adjacency (lexsort + searchsorted) + a frontier
    membership sweep per hop — one np.unique per level, no Python
    per-node work. The wide path at 10^9 edges is the crawl engine
    itself: frontier ⨝ edges hash join per hop with a seen-set
    membership stage; this kernel is the single-partition leaf the
    forced-wide test compares against (mirrors pagerank_int vs
    pagerank_wide)."""
    src = edges["src"].to_numpy(np.int64)
    dst = edges["dst"].to_numpy(np.int64)
    nodes = np.unique(np.concatenate([src, dst]))
    order = np.argsort(src, kind="mergesort")
    s_sorted, d_sorted = src[order], dst[order]
    dist = np.full(len(nodes), -1, dtype=np.int64)
    cur = np.unique(np.searchsorted(nodes, np.asarray(sources, dtype=np.int64)))
    cur = cur[cur < len(nodes)]  # sources beyond the max node id
    cur = cur[np.isin(nodes[cur], sources)]  # drop sources not in the graph
    dist[cur] = 0
    for d in range(1, max_depth + 1):
        if not len(cur):
            break
        lo = np.searchsorted(s_sorted, nodes[cur], side="left")
        hi = np.searchsorted(s_sorted, nodes[cur], side="right")
        spans = hi - lo
        take = np.concatenate(
            [d_sorted[a:b] for a, b in zip(lo, hi)]
        ) if spans.sum() else np.array([], dtype=np.int64)
        nxt_nodes = np.unique(take)
        nxt = np.searchsorted(nodes, nxt_nodes)
        nxt = nxt[dist[nxt] < 0]
        dist[nxt] = d
        cur = nxt
    hit = dist >= 0
    return pd.DataFrame({"node_id": nodes[hit], "dist": dist[hit]})


def bfs_depths_wide(
    edges: pd.DataFrame, sources: np.ndarray, max_depth: int = 6, n_parts: int = 64
) -> pd.DataFrame:
    """Wide path: per hop, the current frontier joins the edge Dataset
    on src via the hash-partitioned join (per-partition distinct dst
    partials) — the edge exchange is the scale term; the driver keeps
    only the O(visited) dist map, exactly like the crawl engine's
    URL-seen shards hold the seen set."""
    from .relational import hash_join

    deg_edges = rd.from_pandas(edges[["src", "dst"]]).materialize()
    dist: dict[int, int] = {int(s): 0 for s in np.asarray(sources, dtype=np.int64)}
    all_nodes = set(
        int(x)
        for x in np.unique(
            np.concatenate([edges["src"].to_numpy(np.int64), edges["dst"].to_numpy(np.int64)])
        )
    )
    dist = {k: v for k, v in dist.items() if k in all_nodes}
    cur = np.array(sorted(dist), dtype=np.int64)
    for d in range(1, max_depth + 1):
        if not len(cur):
            break
        fds = rd.from_pandas(pd.DataFrame({"src": cur}))

        def post(df: pd.DataFrame) -> pd.DataFrame:
            return df[["dst"]].drop_duplicates()

        reached = hash_join(deg_edges, fds, on="src", n_parts=n_parts, post=post).to_pandas()
        nxt = np.unique(reached["dst"].to_numpy(np.int64))
        nxt = np.array([x for x in nxt if int(x) not in dist], dtype=np.int64)
        for x in nxt:
            dist[int(x)] = d
        cur = nxt
    out = pd.DataFrame(sorted(dist.items()), columns=["node_id", "dist"])
    return out.astype({"node_id": "int64", "dist": "int64"})


def pagerank_wide(edges: pd.DataFrame, n_iter: int = 5, n_parts: int = 64) -> pd.DataFrame:
    """Wide path: same recurrence, but the edge-heavy work — the only
    term that grows with |E| — runs as a hash-partitioned join per
    iteration: edges (outdeg attached once) join the current rank
    vector on src and each partition emits pre-aggregated (dst,
    contrib) partials. The combine + teleport step then touches only
    O(nodes) partial rows in one task; past ~10^8 nodes that combine
    would itself become a hash-shuffle groupby + left hash_join (both
    primitives exist), but the edge exchange is the scale term this
    path exists for."""
    from .relational import hash_join

    deg = (
        edges.groupby("src", as_index=False)
        .agg(outdeg=("dst", "size"))
        .astype({"outdeg": "int64"})
    )
    ed = edges.merge(deg, on="src")
    edges_ds = rd.from_pandas(ed).materialize()
    nodes = np.unique(
        np.concatenate([edges["src"].to_numpy(np.int64), edges["dst"].to_numpy(np.int64)])
    )
    ranks_df = pd.DataFrame({"src": nodes, "r": np.full(len(nodes), MICRO, dtype=np.int64)})
    for _ in range(n_iter):
        rds = rd.from_pandas(ranks_df)

        def post(df: pd.DataFrame) -> pd.DataFrame:
            share = df["r"].to_numpy(np.int64) // df["outdeg"].to_numpy(np.int64)
            return (
                df.assign(share=share)
                .groupby("dst", as_index=False)
                .agg(contrib=("share", "sum"))
            )

        parts = hash_join(edges_ds, rds, on="src", n_parts=n_parts, post=post).to_pandas()
        contrib = parts.groupby("dst", as_index=False).agg(contrib=("contrib", "sum"))
        m = pd.DataFrame({"src": nodes}).merge(
            contrib.rename(columns={"dst": "src"}), on="src", how="left"
        )
        c = m["contrib"].fillna(0).astype(np.int64).to_numpy()
        ranks_df = pd.DataFrame({"src": nodes, "r": _next_rank(c)})
    return ranks_df.rename(columns={"src": "node_id", "r": "rank_ppm"})
