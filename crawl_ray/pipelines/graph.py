"""Iterative distributed graph computation: PageRank over the
part ↔ supplier bipartite graph derived from ``lineitem``.

This is the iterative-algorithm tier of the operator suite (the shape
of link-graph scoring over a crawl corpus — the reference's domain —
where edges are frontier-sized and ranks iterate to fixpoint).  The
graph: every distinct ``(l_partkey, l_suppkey)`` pair contributes a
part→supplier edge and its reverse, so rank circulates (no sinks other
than isolated nodes, which keep the base rank).

Exact-arithmetic policy: ranks are integer **micro-units** (node starts
at 1_000_000) and every step is integer math —
``contrib = rank // outdeg``, ``new = 150_000 + (850 · Σcontrib) // 1_000``
(damping 0.85) — so the distributed sums are associative and the result
is bit-equal to a DuckDB oracle that unrolls the same iterations as
CTEs.

Scale notes:

* Edges are deduped with one hash groupby; out-degrees ride along as a
  second groupby over the already-deduped edges (both shuffles carry
  (src, dst) pairs only).
* Each iteration is: edges ⋈ ranks on src (native hash join — ranks
  are node-count-sized, NOT broadcastable for a web graph), a
  per-batch pre-combined ``groupby(dst).sum``, and nodes ⟕ contribs
  (native ``left_outer``) to re-base nodes with no in-edges.  Nothing
  materializes on the driver until the final bounded top-k.
* The iteration count is fixed (K=3) — fixpoint detection would need a
  convergence reduce per round; for ranking-quality use cases the
  fixed-K unroll is the standard corpus-scale choice.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data

from crawl_ray.pipelines.joins import _default_partitions
from crawl_ray.pipelines.relational import _read
from crawl_ray.util import collect_table, normalize_schema

__all__ = ["supplier_pagerank", "supplier_bfs_distance"]

BASE_RANK = 1_000_000
TELEPORT = 150_000  # 0.15 in micro-units
DAMP_MILLI = 850
# Disambiguate supplier node ids from part node ids.  1e13 sits far
# above any key domain (TPC-H partkey reaches 1e10 only at sf 50k);
# the old 1_000_000 collided with partkeys from sf ~5 up, silently
# merging distinct part/supplier nodes.  Must match the oracle SQL.
SUPPLIER_OFFSET = 10_000_000_000_000


def _unique_edges(raw: pa.Table) -> pa.Table:
    """Driver-side (src, dst) dedup of a collected batch-deduped edge
    list — the small-graph replacement for the global groupby shuffle."""
    if raw.num_rows == 0 or "src" not in raw.column_names:
        # an all-empty edge stream keeps the pre-map read schema (Ray
        # short-circuits empty blocks past the UDF)
        return pa.table(
            {"src": pa.array([], pa.int64()), "dst": pa.array([], pa.int64())}
        )
    ab = np.unique(
        np.stack(
            [raw.column("src").to_numpy(zero_copy_only=False).astype(np.int64),
             raw.column("dst").to_numpy(zero_copy_only=False).astype(np.int64)],
            axis=1,
        ),
        axis=0,
    )
    return pa.table(
        {"src": pa.array(ab[:, 0], pa.int64()),
         "dst": pa.array(ab[:, 1], pa.int64())}
    )


def _pagerank_local(edges_t: pa.Table, iterations: int, k: int) -> pa.Table:
    """Single-process iteration over a COLLECTED edge table — the exact
    same integer arithmetic as the distributed loop (bit-equal output;
    the forced-distributed test asserts it).  bincount's float64 sums
    are exact: contribs ≤ 1e6 micro-units × per-node degree ≪ 2^53."""
    src = edges_t.column("src").to_numpy(zero_copy_only=False).astype(np.int64)
    dst = edges_t.column("dst").to_numpy(zero_copy_only=False).astype(np.int64)
    nodes, src_i = np.unique(src, return_inverse=True)
    dst_i = np.searchsorted(nodes, dst)  # bidirected: dst set == node set
    outdeg = np.bincount(src_i, minlength=len(nodes)).astype(np.int64)
    rank = np.full(len(nodes), BASE_RANK, dtype=np.int64)
    for _ in range(iterations):
        contrib = rank[src_i] // outdeg[src_i]
        sums = np.bincount(
            dst_i, weights=contrib.astype(np.float64), minlength=len(nodes)
        ).astype(np.int64)
        rank = TELEPORT + (DAMP_MILLI * sums) // 1_000
    order = np.lexsort((nodes, -rank))[:k]
    top_nodes = nodes[order]
    return pa.table(
        {
            "node": pa.array(top_nodes, pa.int64()),
            "is_supplier": pa.array(top_nodes >= SUPPLIER_OFFSET, pa.bool_()),
            "rank_micro": pa.array(rank[order], pa.int64()),
        }
    )


def pagerank_loop(edges, key_type, num_partitions: int, iterations: int,
                  nodes=None):
    """Distributed integer-PageRank iteration — the ONE loop shared by
    the bidirected supplier graph (int64 keys) and the directed crawl
    link graph (string keys, ``crawl_queries.link_pagerank``).  Takes a
    globally-deduped ``(src, dst)`` edge Dataset and returns the ranks
    Dataset ``(node, rank_micro)`` after ``iterations`` rounds of the
    truncating micro-unit arithmetic (bit-equal to the local fast
    paths).  ``nodes`` is the caller's node universe as a ``(node,)``
    Dataset — pass None for a bidirected graph (node set == src set,
    derived here); a directed graph passes src ∪ dst so dangling
    targets rebase to TELEPORT each round.

    Per iteration: edges ⋈ ranks on src (hash join) → per-batch
    contrib partials → groupby(dst).sum → nodes ⟕ contribs → apply.
    Everything is partition-bounded; nothing driver-sized
    materializes."""

    def deg_partial(batch: pa.Table) -> pa.Table:
        t = pa.table(
            {
                "src": batch.column("src"),
                "outdeg": pa.array(np.ones(batch.num_rows, dtype=np.int64)),
            }
        )
        out = t.group_by(["src"]).aggregate([("outdeg", "sum")])
        return out.rename_columns(
            [c if c != "outdeg_sum" else "outdeg" for c in out.column_names]
        )

    outdeg = normalize_schema(
        edges.map_batches(deg_partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("src")
        .sum("outdeg"),
        {"src": key_type, "outdeg": pa.int64()},
        rename={"sum(outdeg)": "outdeg"},
        coalesce=num_partitions,
    )

    # (src, dst, outdeg) — join once, reuse every iteration.  Joins also
    # emit zero-column empty partition blocks: normalize after each one
    # before the output feeds another join or a column-addressed kernel.
    edges_wd = normalize_schema(
        edges.join(outdeg, "inner", num_partitions, on=("src",)),
        {"src": key_type, "dst": key_type, "outdeg": pa.int64()},
        coalesce=num_partitions,
    ).materialize()

    if nodes is None:
        # node set == src set (bidirected graph)
        nodes = outdeg.select_columns(["src"]).map_batches(
            lambda b: pa.table({"node": b.column("src")}),
            batch_format="pyarrow",
        ).materialize()

    ranks = nodes.map_batches(
        lambda b: pa.table(
            {
                "node": b.column("node"),
                "rank_micro": pa.array(
                    np.full(b.num_rows, BASE_RANK, dtype=np.int64)
                ),
            }
        ),
        batch_format="pyarrow",
    )

    for _ in range(iterations):
        carrying = normalize_schema(
            edges_wd.join(
                ranks, "inner", num_partitions, on=("src",), right_on=("node",)
            ),
            {"dst": key_type, "outdeg": pa.int64(), "rank_micro": pa.int64()},
            coalesce=num_partitions,
        )

        def contrib_partial(batch: pa.Table) -> pa.Table:
            rank = batch.column("rank_micro").to_numpy()
            deg = batch.column("outdeg").to_numpy()
            t = pa.table(
                {
                    "dst": batch.column("dst"),
                    "contrib": pa.array(rank // deg, pa.int64()),
                }
            )
            out = t.group_by(["dst"]).aggregate([("contrib", "sum")])
            return out.rename_columns(
                [c if c != "contrib_sum" else "contrib"
                 for c in out.column_names]
            )

        contribs = normalize_schema(
            carrying.map_batches(
                contrib_partial, batch_format="pyarrow", zero_copy_batch=True
            )
            .groupby("dst")
            .sum("contrib"),
            {"dst": key_type, "contrib": pa.int64()},
            rename={"sum(contrib)": "contrib"},
            coalesce=num_partitions,
        )
        rebased = normalize_schema(
            nodes.join(
                contribs, "left_outer", num_partitions, on=("node",), right_on=("dst",)
            ),
            {"node": key_type, "contrib": pa.int64()},
            coalesce=num_partitions,
        )

        def apply_rank(batch: pa.Table) -> pa.Table:
            c = batch.column("contrib").to_numpy(zero_copy_only=False)
            c = np.where(np.isnan(c.astype(np.float64)), 0, c).astype(np.int64)
            return pa.table(
                {
                    "node": batch.column("node"),
                    "rank_micro": pa.array(
                        TELEPORT + (DAMP_MILLI * c) // 1_000, pa.int64()
                    ),
                }
            )

        ranks = rebased.map_batches(apply_rank, batch_format="pyarrow")

    return ranks


def supplier_pagerank(
    sf_dir: str,
    iterations: int = 3,
    k: int = 20,
    num_partitions: int | None = None,
    small_graph_threshold: int = 2_000_000,
) -> pa.Table:
    """Top-k nodes by integer PageRank after ``iterations`` rounds over
    the bidirected part–supplier graph.  Returns
    ``(node, is_supplier, rank_micro)`` sorted by rank desc, node asc.

    Graphs whose deduped edge list fits comfortably on the driver
    (≤ ``small_graph_threshold`` edges) iterate locally with identical
    integer arithmetic — each distributed iteration costs two hash
    joins + a groupby of FIXED Ray overhead (~12 s at 32 CPUs)
    regardless of size, which dwarfs small graphs (the same
    small-input escape hatch as the engine's ``small_round_threshold``).
    Pass ``small_graph_threshold=0`` to force the distributed loop
    (the equality test does)."""
    num_partitions = num_partitions or _default_partitions()

    li = _read(sf_dir, "lineitem", ["l_partkey", "l_suppkey"])

    def to_edges(batch: pa.Table) -> pa.Table:
        p = batch.column("l_partkey").to_numpy().astype(np.int64)
        s = batch.column("l_suppkey").to_numpy().astype(np.int64) + SUPPLIER_OFFSET
        # both directions; batch-local dedup shrinks the shuffle
        src = np.concatenate([p, s])
        dst = np.concatenate([s, p])
        t = pa.table(
            {"src": pa.array(src, pa.int64()), "dst": pa.array(dst, pa.int64())}
        )
        return t.group_by(["src", "dst"]).aggregate([])

    raw = li.map_batches(
        to_edges, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()
    # threshold on the BATCH-deduped row count (≥ the global count, so
    # the gate is conservative): the global (src, dst) groupby is an
    # all-to-all shuffle with ~10 s fixed cost at 32 CPUs — for a
    # driver-sized edge list a collect + np.unique does the same dedup
    # 5× faster, so the shuffle is reserved for the web-scale path
    if raw.count() <= small_graph_threshold:
        return _pagerank_local(_unique_edges(collect_table(raw)), iterations, k)

    edges = normalize_schema(
        raw.groupby(["src", "dst"]).count(),
        {"src": pa.int64(), "dst": pa.int64()},
        coalesce=num_partitions,
    )
    edges = edges.materialize()  # reused every iteration — keep in object store
    del raw  # drop the O(lineitem)-sized batch-deduped stream: holding
    # the ref would pin its blocks in the object store for every
    # PageRank iteration (it only existed to serve the count gate)

    ranks = pagerank_loop(edges, pa.int64(), num_partitions, iterations)

    top = collect_table(
        ranks.sort(["rank_micro", "node"], descending=[True, False]).limit(k)
    )
    node = top.column("node").to_numpy()
    return pa.table(
        {
            "node": pa.array(node, pa.int64()),
            "is_supplier": pa.array(node >= SUPPLIER_OFFSET, pa.bool_()),
            "rank_micro": top.column("rank_micro"),
        }
    )


def _local_bfs(edges_t: pa.Table, seed: int, max_hops: int) -> pa.Table:
    """Single-process BFS over a COLLECTED edge table — same semantics
    as the distributed loop (the forced-distributed test asserts
    equality)."""
    src = edges_t.column("src").to_numpy(zero_copy_only=False).astype(np.int64)
    dst = edges_t.column("dst").to_numpy(zero_copy_only=False).astype(np.int64)
    order = np.argsort(src, kind="stable")
    src_s, dst_s = src[order], dst[order]
    dist = {seed: 0}
    frontier = np.array([seed], dtype=np.int64)
    for hop in range(1, max_hops + 1):
        lo = np.searchsorted(src_s, frontier, side="left")
        hi = np.searchsorted(src_s, frontier, side="right")
        if not len(lo):
            break
        nbrs = np.unique(
            np.concatenate(
                [dst_s[a:b] for a, b in zip(lo.tolist(), hi.tolist())]
            )
            if len(lo)
            else np.empty(0, np.int64)
        )
        new = [x for x in nbrs.tolist() if x not in dist]
        for x in new:
            dist[x] = hop
        frontier = np.array(new, dtype=np.int64)
        if not len(frontier):
            break
    nodes = np.array(sorted(dist), dtype=np.int64)
    dd = np.array([dist[x] for x in nodes.tolist()], dtype=np.int64)
    out = []
    for h in range(max_hops + 1):
        m = dd == h
        if not m.any() and h > 0:
            continue
        out.append(
            (h, int(m.sum()), int((nodes[m] >= SUPPLIER_OFFSET).sum()))
        )
    return pa.table(
        {
            "dist": pa.array([r[0] for r in out], pa.int64()),
            "n_nodes": pa.array([r[1] for r in out], pa.int64()),
            "n_suppliers": pa.array([r[2] for r in out], pa.int64()),
        }
    )


def supplier_bfs_distance(
    sf_dir: str,
    max_hops: int = 3,
    num_partitions: int | None = None,
    small_graph_threshold: int = 2_000_000,
):
    """Iterative frontier BFS over the part ↔ supplier bipartite graph:
    min-hop distance from the seed node (the smallest supplier key) —
    the link-graph reachability shape (how many pages/hosts are within
    k clicks of a seed), summarized per distance level.

    Distributed loop (the crawl-round pattern as a pure graph query):
    per hop, ``edges ⋈ frontier`` native hash join → batch-deduped
    neighbor set → ``left_anti`` against the visited set (both sides
    frontier-sized, nothing broadcast) → the survivors become the next
    frontier and union into visited.  Early-exits when the frontier
    drains.  Output is bounded: one row per distance level."""
    num_partitions = num_partitions or _default_partitions()

    li = _read(sf_dir, "lineitem", ["l_partkey", "l_suppkey"])

    def to_edges(batch: pa.Table) -> pa.Table:
        p = batch.column("l_partkey").to_numpy().astype(np.int64)
        s = batch.column("l_suppkey").to_numpy().astype(np.int64) + SUPPLIER_OFFSET
        src = np.concatenate([p, s])
        dst = np.concatenate([s, p])
        t = pa.table(
            {"src": pa.array(src, pa.int64()), "dst": pa.array(dst, pa.int64())}
        )
        return t.group_by(["src", "dst"]).aggregate([])

    raw = li.map_batches(
        to_edges, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()

    sup = _read(sf_dir, "supplier", ["s_suppkey"]).map_batches(
        lambda b: pa.table(
            {"m": pa.array(
                [int(b.column("s_suppkey").to_numpy().min())]
                if b.num_rows else [],
                pa.int64(),
            )}
        ),
        batch_format="pyarrow",
    )
    mins = collect_table(sup)
    seed = int(mins.column("m").to_numpy().min()) + SUPPLIER_OFFSET

    # same small-graph gate as supplier_pagerank: batch-deduped row
    # count (≥ the global count), collect + np.unique instead of the
    # fixed-cost global groupby shuffle
    if raw.count() <= small_graph_threshold:
        return _local_bfs(_unique_edges(collect_table(raw)), seed, max_hops)

    edges = normalize_schema(
        raw.groupby(["src", "dst"]).count(),
        {"src": pa.int64(), "dst": pa.int64()},
        coalesce=num_partitions,
    ).materialize()
    del raw  # same as supplier_pagerank: don't pin the raw stream
    # through the hop iterations

    seed_t = pa.table(
        {"node": pa.array([seed], pa.int64()),
         "dist": pa.array([0], pa.int64())}
    )
    import ray.data as rd

    visited = rd.from_arrow(seed_t).materialize()
    frontier = rd.from_arrow(seed_t.select(["node"])).materialize()

    for hop in range(1, max_hops + 1):
        nbrs = normalize_schema(
            edges.join(
                frontier, "inner", num_partitions,
                on=("src",), right_on=("node",),
            ),
            {"dst": pa.int64()},
            coalesce=num_partitions,
        )

        def dedup_dst(batch: pa.Table) -> pa.Table:
            d = np.unique(batch.column("dst").to_numpy(zero_copy_only=False))
            return pa.table({"node": pa.array(d, pa.int64())})

        cand = normalize_schema(
            nbrs.map_batches(dedup_dst, batch_format="pyarrow")
            .groupby("node")
            .count(),
            {"node": pa.int64()},
            coalesce=num_partitions,
        )
        new = normalize_schema(
            cand.join(
                visited, "left_anti", num_partitions, on=("node",),
            ),
            {"node": pa.int64()},
            coalesce=num_partitions,
        ).materialize()
        if new.count() == 0:
            break
        new_d = new.map_batches(
            lambda b, h=hop: pa.table(
                {"node": b.column("node"),
                 "dist": pa.array(np.full(b.num_rows, h, np.int64))}
            ),
            batch_format="pyarrow",
        )
        visited = visited.union(new_d).materialize()
        frontier = new

    def level_partial(batch: pa.Table) -> pa.Table:
        d = batch.column("dist").to_numpy(zero_copy_only=False)
        n = batch.column("node").to_numpy(zero_copy_only=False)
        ud, inv = np.unique(d, return_inverse=True)
        cnt = np.bincount(inv).astype(np.int64)
        nsup = np.bincount(inv, weights=(n >= SUPPLIER_OFFSET)).astype(np.int64)
        return pa.table(
            {"dist": pa.array(ud, pa.int64()),
             "n_nodes": pa.array(cnt, pa.int64()),
             "n_suppliers": pa.array(nsup, pa.int64())}
        )

    partials = collect_table(
        visited.map_batches(level_partial, batch_format="pyarrow")
    )
    out = partials.group_by(["dist"]).aggregate(
        [("n_nodes", "sum"), ("n_suppliers", "sum")]
    )
    out = out.rename_columns(
        [{"n_nodes_sum": "n_nodes", "n_suppliers_sum": "n_suppliers"}.get(c, c)
         for c in out.column_names]
    )
    return out.sort_by("dist")
