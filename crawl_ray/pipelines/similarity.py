"""Similarity search over the embeddings table (``list<float>``).

* :func:`knn_brute` — brute-force cosine top-k: one numpy matmul per
  batch against a broadcast query matrix (``ray.put`` once).  The
  baseline; exact, SQL-oracle-checkable.
* :func:`knn_ivf` — IVF-style scale path: k-means-lite coarse centroids
  (deterministic seeding), per-batch assignment, probe the ``nprobe``
  closest lists only.  Falls back to exact results on this corpus when
  ``nprobe`` covers the true list (tested against knn_brute).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
import ray.data

from crawl_ray.util import collect_table, list_col_to_matrix

from crawl_ray.urlnorm import fnv1a64_batch


from crawl_ray.util import round_half_away as _round_half_away  # noqa: E402


# wedge-enumeration chunk for the threshold_graph_stats driver fast
# path: transient index arrays stay ~8 B × 5M ≈ 40 MB per chunk even at
# the 50M-wedge guard bound
_WEDGE_CHUNK = 5_000_000

__all__ = [
    "embedding_moments",
    "knn_brute", "knn_ivf", "build_ivf_index", "query_vector", "kmeans_embeddings", "semantic_dedup", "cluster_balanced_sample", "knn_batch", "label_centroids", "knn_graph_stats", "threshold_graph_stats"]


def _emb(sf_dir: str):
    return ray.data.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )


def query_vector(sf_dir: str, query_id: int = 0) -> np.ndarray:
    """Deterministic query: the embedding of ``vec_id == query_id``."""
    import pyarrow.parquet as pq
    import pyarrow.compute as pc_

    t = pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    idx = pc_.index(t.column("vec_id"), pa.scalar(query_id, t.column("vec_id").type)).as_py()
    if idx < 0:
        # pc.index returns -1 on a miss; without this guard the
        # negative index silently wraps to the LAST row's embedding
        raise KeyError(f"vec_id {query_id} not found in {sf_dir}/embeddings.parquet")
    return np.asarray(t.column("embedding")[idx].as_py(), dtype=np.float64)


def _unit(mat: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(mat, axis=1)
    norms[norms == 0] = 1.0
    return mat / norms[:, None]


def knn_brute(sf_dir: str, k: int = 10, query_id: int = 0) -> pa.Table:
    """Exact top-k by cosine: per-batch local top-k, merged on the
    driver (k rows per block, not the corpus)."""
    q = query_vector(sf_dir, query_id)
    q = q / (np.linalg.norm(q) or 1.0)
    q_ref = ray.put(q)

    def local_topk(batch: pa.Table) -> pa.Table:
        qv = ray.get(q_ref)
        mat = list_col_to_matrix(batch.column("embedding"))
        sims = _unit(mat) @ qv
        ids = batch.column("vec_id").to_numpy(zero_copy_only=False)
        take = min(k, len(ids))
        # exact local top-k with the oracle's tie-break (sim desc,
        # vec_id asc): argpartition's unspecified tie order could drop
        # the tied row the global merge needs
        part = np.lexsort((ids, -sims))[:take]
        return pa.table(
            {
                "vec_id": pa.array(ids[part], pa.int64()),
                "cos_sim": pa.array(sims[part], pa.float64()),
            }
        )

    parts = collect_table(
        _emb(sf_dir).map_batches(
            local_topk, batch_format="pyarrow", zero_copy_batch=True
        )
    )
    sims = parts.column("cos_sim").to_numpy()
    ids = parts.column("vec_id").to_numpy()
    # deterministic global order: sim desc, vec_id asc
    order = np.lexsort((ids, -sims))[:k]
    return pa.table(
        {
            "rank": pa.array(np.arange(1, len(order) + 1), pa.int64()),
            "vec_id": pa.array(ids[order], pa.int64()),
            "cos_milli": pa.array(
                _round_half_away(sims[order] * 1000).astype(np.int64), pa.int64()
            ),
        }
    )


def build_ivf_index(sf_dir: str, n_lists: int = 16) -> str:
    """Persist the IVF layout: ``list=K/part-*.parquet`` + centroids.

    Centroids: deterministic sample (first 2048 rows) + 5 Lloyd
    iterations on the driver (tiny); assignment: ONE distributed pass
    writing each block's rows into per-list parquet parts task-side
    (deterministic part names → retry-safe).  Cached by marker — at
    100 TB this runs once as its own job, like the page-store
    bucketing."""
    import hashlib
    import shutil

    import pyarrow.parquet as pq_meta

    # token includes a corpus fingerprint (rows + on-disk byte size) so
    # regenerating embeddings.parquet in place invalidates the cache
    # instead of _SUCCESS silently serving the old corpus
    md = pq_meta.read_metadata(f"{sf_dir}/embeddings.parquet")
    fp = f"{md.num_rows}:{md.serialized_size}:{sum(md.row_group(i).total_byte_size for i in range(md.num_row_groups))}"
    token = hashlib.blake2b(
        f"{sf_dir}:{n_lists}:{fp}".encode(), digest_size=8
    ).hexdigest()
    from crawl_ray.storage import check_multinode_storage, store_root

    root = store_root() / f"ivf_{token}"
    if (root / "_SUCCESS").exists():
        return str(root)
    check_multinode_storage("the IVF index store", root)
    if root.exists():
        # an interrupted build leaves stale list parts whose names can
        # differ on the retry (block boundaries depend on CPU count) —
        # duplicated vectors would evict true neighbors from the top-k
        shutil.rmtree(root)
    root.mkdir(parents=True, exist_ok=True)

    ds = _emb(sf_dir)
    sample = ds.take_batch(2048, batch_format="pyarrow")
    mat = list_col_to_matrix(sample.column("embedding"))
    seed_idx = fnv1a64_batch([f"ivf:{i}" for i in range(n_lists)]) % np.uint64(len(mat))
    centroids = mat[seed_idx.astype(np.int64)].copy()
    for _ in range(5):
        assign = np.argmax(_unit(mat) @ _unit(centroids).T, axis=1)
        for c in range(n_lists):
            members = mat[assign == c]
            if len(members):
                centroids[c] = members.mean(axis=0)
    cent_unit = _unit(centroids)
    np.save(root / "centroids.npy", cent_unit)
    cent_ref = ray.put(cent_unit)

    def write_lists(batch: pa.Table) -> pa.Table:
        import pyarrow.parquet as pq_

        cu = ray.get(cent_ref)
        emb = list_col_to_matrix(batch.column("embedding"))
        ids = batch.column("vec_id").to_numpy(zero_copy_only=False)
        lists = np.argmax(_unit(emb) @ cu.T, axis=1)
        for c in np.unique(lists).tolist():
            part = batch.filter(pa.array(lists == c))
            ldir = root / f"list={int(c)}"
            ldir.mkdir(parents=True, exist_ok=True)
            pq_.write_table(
                part,
                ldir / f"part-{int(part.column('vec_id')[0].as_py())}.parquet",
            )
        return pa.table({"n": pa.array([len(ids)], pa.int64())})

    ds.map_batches(
        write_lists, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()
    (root / "_SUCCESS").touch()
    return str(root)


def knn_ivf(
    sf_dir: str,
    k: int = 10,
    query_id: int = 0,
    n_lists: int = 16,
    nprobe: int | None = None,
) -> pa.Table:
    """IVF ANN over the persisted list-partitioned layout: ONLY the
    ``nprobe`` probed lists' parquet files are read (real read
    reduction — asserted in tests), then the exact per-batch top-k +
    bounded driver merge of :func:`knn_brute` runs over that subset.

    Default ``nprobe=None`` probes every list: exhaustive search
    through the IVF layout, exactly equal to ``knn_brute`` (this is the
    driver-oracled configuration); pass ``nprobe < n_lists`` for the
    approximate scale path."""
    import pathlib

    root = pathlib.Path(build_ivf_index(sf_dir, n_lists=n_lists))
    cent_unit = np.load(root / "centroids.npy")
    if nprobe is None:
        nprobe = n_lists

    q = query_vector(sf_dir, query_id)
    q = q / (np.linalg.norm(q) or 1.0)
    probe = np.argsort(-(cent_unit @ q))[:nprobe].tolist()
    files = []
    for c in probe:
        files.extend(sorted(str(f) for f in (root / f"list={c}").glob("*.parquet")))
    if not files:
        return pa.table(
            {"rank": pa.array([], pa.int64()), "vec_id": pa.array([], pa.int64()),
             "cos_milli": pa.array([], pa.int64())}
        )
    q_ref = ray.put(q)

    def local_topk(batch: pa.Table) -> pa.Table:
        qv = ray.get(q_ref)
        mat = list_col_to_matrix(batch.column("embedding"))
        sims = _unit(mat) @ qv
        ids = batch.column("vec_id").to_numpy(zero_copy_only=False)
        take = min(k, len(ids))
        part = np.lexsort((ids, -sims))[:take]  # tie-break ≡ oracle
        return pa.table(
            {
                "vec_id": pa.array(ids[part], pa.int64()),
                "cos_sim": pa.array(sims[part], pa.float64()),
            }
        )

    parts = collect_table(
        ray.data.read_parquet(files, columns=["vec_id", "embedding"]).map_batches(
            local_topk, batch_format="pyarrow", zero_copy_batch=True
        )
    )
    sims = parts.column("cos_sim").to_numpy()
    ids = parts.column("vec_id").to_numpy()
    order = np.lexsort((ids, -sims))[:k]
    return pa.table(
        {
            "rank": pa.array(np.arange(1, len(order) + 1), pa.int64()),
            "vec_id": pa.array(ids[order], pa.int64()),
            "cos_milli": pa.array(
                _round_half_away(sims[order] * 1000).astype(np.int64), pa.int64()
            ),
        }
    )


def _quant_batch(batch: pa.Table) -> tuple[np.ndarray, np.ndarray]:
    """(vec_ids int64, quantized int64 matrix): embeddings → integer
    milli-units via Arrow's half-towards-infinity round, the exact
    arithmetic the DuckDB oracle's ``round(x * 1000)`` performs (f32 →
    f64 is exact, ×1000 is the same double op in both engines)."""
    import pyarrow.compute as pc_

    ids = batch.column("vec_id").to_numpy(zero_copy_only=False).astype(np.int64)
    col = batch.column("embedding")
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    flat = pc_.cast(
        pc_.round(
            pc_.multiply(pc_.cast(col.flatten(), pa.float64()), 1000.0),
            round_mode="half_towards_infinity",
        ),
        pa.int64(),
    ).to_numpy(zero_copy_only=False)
    return ids, flat.reshape(len(ids), -1)


def _mat(batch: pa.Table) -> tuple[np.ndarray, np.ndarray]:
    """(vec_ids, int64 matrix) from a quantized (vec_id, q) batch."""
    ids = batch.column("vec_id").to_numpy(zero_copy_only=False).astype(np.int64)
    col = batch.column("q")
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    m = col.flatten().to_numpy(zero_copy_only=False).reshape(len(ids), -1)
    return ids, m.astype(np.int64)


def _assign(m: np.ndarray, C: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Exact int64 squared-L2 assignment; first-min ≡ lowest centroid
    index, the oracle's ``ORDER BY dist, c`` tie-break."""
    d = (
        (m * m).sum(axis=1, dtype=np.int64)[:, None]
        - 2 * (m @ C.T)
        + (C * C).sum(axis=1, dtype=np.int64)[None, :]
    )
    a = np.argmin(d, axis=1)
    return a, d[np.arange(len(a)), a]


def _kmeans_fit(sf_dir: str, k: int, iterations: int):
    """Shared Lloyd's fit: returns (quantized Dataset, final centroids).

    Scale shape: the quantized corpus materializes ONCE (Ray blocks,
    spillable) and every iteration is a single ``map_batches`` pass —
    centroids broadcast via ``ray.put`` (k×dim ints), each batch emits
    one (k × dim sums, k counts) partial, and the driver combine is
    O(k·dim·blocks), independent of corpus size.  Seeds are the ``k``
    smallest ``vec_id`` vectors; centroid updates are floor(sum/count)
    with empty clusters keeping their previous centroid."""
    qds = _emb(sf_dir).map_batches(
        lambda b: (lambda ids, m: pa.table(
            {"vec_id": pa.array(ids, pa.int64()),
             "q": pa.FixedSizeListArray.from_arrays(
                 pa.array(m.reshape(-1), pa.int64()), m.shape[1])}
        ))(*_quant_batch(b)),
        batch_format="pyarrow",
        zero_copy_batch=True,
    ).materialize()

    seed_t = collect_table(qds.sort("vec_id").limit(k))
    _, cent = _mat(seed_t)
    k = cent.shape[0]  # corpora smaller than k degrade to n clusters
    dim = cent.shape[1]
    for _ in range(iterations):
        cent_ref = ray.put(cent)

        def partial(batch: pa.Table) -> pa.Table:
            C = ray.get(cent_ref)
            _, m = _mat(batch)
            a, _d = _assign(m, C)
            sums = np.zeros((k, dim), dtype=np.int64)
            np.add.at(sums, a, m)
            n = np.bincount(a, minlength=k).astype(np.int64)
            return pa.table(
                {"c": pa.array(np.arange(k), pa.int64()),
                 "n": pa.array(n, pa.int64()),
                 "s": pa.FixedSizeListArray.from_arrays(
                     pa.array(sums.reshape(-1), pa.int64()), dim)}
            )

        pt = collect_table(
            qds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        )
        cs = pt.column("c").to_numpy(zero_copy_only=False)
        ns = pt.column("n").to_numpy(zero_copy_only=False)
        ss = pt.column("s").combine_chunks().flatten().to_numpy(
            zero_copy_only=False
        ).reshape(len(cs), dim)
        tot_n = np.bincount(cs, weights=ns, minlength=k).astype(np.int64)
        tot_s = np.zeros((k, dim), dtype=np.int64)
        np.add.at(tot_s, cs, ss)
        nz = tot_n > 0
        new_cent = cent.copy()
        new_cent[nz] = tot_s[nz] // tot_n[nz, None]  # floor div ≡ oracle floor()
        cent = new_cent

    return qds, cent


def kmeans_embeddings(sf_dir: str, k: int = 8, iterations: int = 3) -> pa.Table:
    """Distributed Lloyd's k-means over the embedding corpus — the
    semantic-clustering primitive (domain mixing, semantic dedup,
    cluster-balanced sampling) as an iterative Ray Data pipeline.

    All arithmetic is exact-integer so the unrolled-CTE DuckDB oracle
    hashes identically: embeddings quantize to int64 milli-units,
    distances are int64 squared-L2 (ties → lowest centroid index),
    centroid updates are floor(sum / count) with empty clusters keeping
    their previous centroid (see :func:`_kmeans_fit` for the scale
    shape)."""
    qds, cent = _kmeans_fit(sf_dir, k, iterations)
    cent_ref = ray.put(cent)

    def final_assign(batch: pa.Table) -> pa.Table:
        C = ray.get(cent_ref)
        ids, m = _mat(batch)
        a, d = _assign(m, C)
        return pa.table(
            {"vec_id": pa.array(ids, pa.int64()),
             "cluster": pa.array(a.astype(np.int64), pa.int64()),
             "dist_q": pa.array(d, pa.int64())}
        )

    return qds.map_batches(
        final_assign, batch_format="pyarrow", zero_copy_batch=True
    ).sort("vec_id")


def semantic_dedup(
    sf_dir: str,
    k: int = 8,
    iterations: int = 3,
    thr_q: int = 1_200_000,
) -> pa.Table:
    """SemDeDup-style semantic deduplication (Abbas et al. 2023): fit
    k-means, then search for near-duplicates ONLY within each cluster —
    the trick that turns the quadratic all-pairs scan into k local
    problems.  A vector is ``kept`` unless some SMALLER-``vec_id``
    vector in its cluster sits within squared-L2 ``thr_q`` (keep-first
    representative; deterministic, order-free).

    Scale shape: one ``groupby(cluster)`` shuffle; the per-cluster
    kernel is a single int64 gram-matrix (no per-pair Python).  The
    partitioning assumption — a cluster fits one worker — is the same
    one SemDeDup makes (size k to corpus/k ≈ block size); at 100 TB,
    oversized clusters sub-split by re-running k-means within them.
    """
    qds, cent = _kmeans_fit(sf_dir, k, iterations)
    cent_ref = ray.put(cent)

    def assign_batch(batch: pa.Table) -> pa.Table:
        C = ray.get(cent_ref)
        ids, m = _mat(batch)
        a, _d = _assign(m, C)
        return pa.table(
            {"vec_id": pa.array(ids, pa.int64()),
             "cluster": pa.array(a.astype(np.int64), pa.int64()),
             "q": batch.column("q")}
        )

    def dedup_cluster(group: pa.Table) -> pa.Table:
        ids, m = _mat(group)
        order = np.argsort(ids)
        ids, m = ids[order], m[order]
        d = (
            (m * m).sum(axis=1, dtype=np.int64)[:, None]
            - 2 * (m @ m.T)
            + (m * m).sum(axis=1, dtype=np.int64)[None, :]
        )
        near = d <= thr_q
        # kept ⇔ no smaller-vec_id neighbor within thr (strict lower tri)
        dup = np.tril(near, k=-1).any(axis=1)
        cl = group.column("cluster").to_numpy(zero_copy_only=False)[order]
        return pa.table(
            {"vec_id": pa.array(ids, pa.int64()),
             "cluster": pa.array(cl.astype(np.int64), pa.int64()),
             "kept": pa.array(~dup, pa.bool_())}
        )

    return (
        qds.map_batches(assign_batch, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("cluster")
        .map_groups(dedup_cluster, batch_format="pyarrow")
        .sort("vec_id")
    )


def cluster_balanced_sample(
    sf_dir: str,
    k: int = 8,
    iterations: int = 3,
    quota: int = 20,
) -> pa.Table:
    """Cluster-balanced corpus sampling: after the k-means fit, keep at
    most ``quota`` vectors per cluster, chosen by a deterministic
    multiplicative hash of ``vec_id`` (same sample on every run /
    partitioning / cluster size) — the semantic-diversity analog of
    :func:`textops.stratified_sample`'s per-language quota.

    Scale shape: the assignment pass emits per-batch PARTIAL top-quota
    rows per cluster (vectorized segmented rank), so the driver merge
    is bounded by k × quota × blocks, never corpus-sized."""
    from crawl_ray.pipelines.textops import SAMPLE_MODULUS, SAMPLE_MULT

    qds, cent = _kmeans_fit(sf_dir, k, iterations)
    cent_ref = ray.put(cent)

    def _rank_keep(ids, cl, h, cap):
        o = np.lexsort((ids, h, cl))
        cl_s = cl[o]
        seg = np.flatnonzero(np.r_[True, cl_s[1:] != cl_s[:-1]])
        rnk = (
            np.arange(len(cl_s))
            - np.repeat(seg, np.diff(np.r_[seg, len(cl_s)]))
            + 1
        )
        keep = rnk <= cap
        return o[keep], rnk[keep]

    def partial(batch: pa.Table) -> pa.Table:
        C = ray.get(cent_ref)
        ids, m = _mat(batch)
        a, _d = _assign(m, C)
        with np.errstate(over="ignore"):
            h = (ids.astype(np.uint64) * np.uint64(SAMPLE_MULT)) % np.uint64(
                SAMPLE_MODULUS
            )
        kept, _ = _rank_keep(ids, a, h, quota)
        return pa.table(
            {"vec_id": pa.array(ids[kept], pa.int64()),
             "cluster": pa.array(a[kept].astype(np.int64), pa.int64()),
             "h": pa.array(h[kept].astype(np.int64), pa.int64())}
        )

    parts = collect_table(
        qds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    )
    ids = parts.column("vec_id").to_numpy(zero_copy_only=False)
    cl = parts.column("cluster").to_numpy(zero_copy_only=False)
    h = parts.column("h").to_numpy(zero_copy_only=False)
    kept, rnk = _rank_keep(ids, cl, h, quota)
    return pa.table(
        {"vec_id": pa.array(ids[kept], pa.int64()),
         "cluster": pa.array(cl[kept], pa.int64()),
         "rk": pa.array(rnk.astype(np.int64), pa.int64())}
    )


def knn_batch(sf_dir: str, k: int = 5, n_queries: int = 8) -> pa.Table:
    """Batched ANN: top-``k`` cosine neighbors for ``n_queries`` query
    vectors AT ONCE — the production retrieval shape (dedup against a
    seed set, eval-set contamination, RAG backfill) where per-query
    scans would read the corpus Q times.

    Scale shape: the query matrix broadcasts once (``ray.put``); each
    batch computes ONE (rows × Q) matmul and emits its local top-k per
    query, so the driver merge is bounded by Q × k × blocks.  Self-hits
    (vec_id == query id) are excluded."""
    import pyarrow.parquet as pq_

    t = pq_.read_table(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    import pyarrow.compute as pc_

    order = pc_.sort_indices(t.column("vec_id"))[:n_queries]
    qt = t.take(order)
    q_ids = qt.column("vec_id").to_numpy(zero_copy_only=False).astype(np.int64)
    Q = _unit(list_col_to_matrix(qt.column("embedding")))
    q_ref = ray.put((q_ids, Q))

    def local_topk(batch: pa.Table) -> pa.Table:
        qids, Qm = ray.get(q_ref)
        mat = list_col_to_matrix(batch.column("embedding"))
        ids = batch.column("vec_id").to_numpy(zero_copy_only=False).astype(np.int64)
        sims = _unit(mat) @ Qm.T  # rows × Q
        sims[ids[:, None] == qids[None, :]] = -np.inf  # self-hits out
        take = min(k, len(ids))
        out_q, out_id, out_s = [], [], []
        for j in range(len(qids)):
            # exact per-query top-k, tie-break ≡ oracle (sim desc, id asc)
            rows = np.lexsort((ids, -sims[:, j]))[:take]
            out_q.append(np.full(take, qids[j], dtype=np.int64))
            out_id.append(ids[rows])
            out_s.append(sims[rows, j])
        return pa.table(
            {"query_id": pa.array(np.concatenate(out_q), pa.int64()),
             "vec_id": pa.array(np.concatenate(out_id), pa.int64()),
             "cos_sim": pa.array(np.concatenate(out_s), pa.float64())}
        )

    parts = collect_table(
        _emb(sf_dir).map_batches(
            local_topk, batch_format="pyarrow", zero_copy_batch=True
        )
    )
    qs = parts.column("query_id").to_numpy(zero_copy_only=False)
    ids = parts.column("vec_id").to_numpy(zero_copy_only=False)
    sims = parts.column("cos_sim").to_numpy(zero_copy_only=False)
    o = np.lexsort((ids, -sims, qs))
    qs, ids, sims = qs[o], ids[o], sims[o]
    seg = np.flatnonzero(np.r_[True, qs[1:] != qs[:-1]])
    rnk = np.arange(len(qs)) - np.repeat(seg, np.diff(np.r_[seg, len(qs)])) + 1
    # a query with fewer than k real neighbors (corpus ≤ k rows) keeps
    # its masked self-hit (-inf) through the per-batch cut; -inf sorts
    # last in its segment so dropping it leaves ranks contiguous
    keep = (rnk <= k) & np.isfinite(sims)
    return pa.table(
        {"query_id": pa.array(qs[keep], pa.int64()),
         "rank": pa.array(rnk[keep].astype(np.int64), pa.int64()),
         "vec_id": pa.array(ids[keep], pa.int64()),
         "cos_milli": pa.array(
             _round_half_away(sims[keep] * 1000).astype(np.int64), pa.int64())}
    )


def label_centroids(sf_dir: str) -> pa.Table:
    """Per-label, per-dimension centroid partials over the embedding
    table — the grouped-mean-vector primitive behind cluster summaries
    and per-source embedding drift checks.  Exact fixed-point: each
    component is ``round(value · 10⁶)`` in int64 micro-units (pyarrow
    half_towards_infinity ≡ DuckDB ``round()``), so parallel partial
    sums are associative and byte-equal to the serial oracle; the
    output carries ``(sum_micro, n_vecs)`` rather than the division so
    no integer-division semantics can diverge.

    Scale shape: per-batch (label × dim) partial sums via one reshape +
    per-label row masks (labels are few by contract) → bounded driver
    combine (labels × dims × blocks partial rows)."""
    import pyarrow.compute as pc_

    ds = ray.data.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["embedding", "label"]
    )

    def partial(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        if n == 0:
            return pa.table(
                {"label": pa.array([], pa.int64()),
                 "dim": pa.array([], pa.int64()),
                 "sum_micro": pa.array([], pa.int64()),
                 "n_vecs": pa.array([], pa.int64())}
            )
        emb = batch.column("embedding")
        if isinstance(emb, pa.ChunkedArray):
            emb = emb.combine_chunks()
        flat = pc_.cast(emb.flatten(), pa.float64())
        micro = pc_.cast(
            pc_.round(
                pc_.multiply(flat, pa.scalar(1_000_000.0)),
                round_mode="half_towards_infinity",
            ),
            pa.int64(),
        ).to_numpy(zero_copy_only=False)
        d = len(micro) // n
        m = micro.reshape(n, d)
        labels = batch.column("label").to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        ul, inv = np.unique(labels, return_inverse=True)
        out_l, out_d, out_s, out_n = [], [], [], []
        for i, lab in enumerate(ul.tolist()):
            rows = m[inv == i]
            out_l.append(np.full(d, lab, np.int64))
            out_d.append(np.arange(1, d + 1, dtype=np.int64))
            out_s.append(rows.sum(axis=0))
            out_n.append(np.full(d, rows.shape[0], np.int64))
        return pa.table(
            {"label": pa.array(np.concatenate(out_l), pa.int64()),
             "dim": pa.array(np.concatenate(out_d), pa.int64()),
             "sum_micro": pa.array(np.concatenate(out_s), pa.int64()),
             "n_vecs": pa.array(np.concatenate(out_n), pa.int64())}
        )

    t = collect_table(
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    )
    out = t.group_by(["label", "dim"]).aggregate(
        [("sum_micro", "sum"), ("n_vecs", "sum")]
    )
    return out.rename_columns(
        [{"sum_micro_sum": "sum_micro", "n_vecs_sum": "n_vecs"}.get(c, c)
         for c in out.column_names]
    ).sort_by([("label", "ascending"), ("dim", "ascending")])


def _micro_quant_matrix(col) -> np.ndarray:
    """Embedding list column → float64 matrix of exact integer
    MICRO-units: ``round(x * 1e6)`` half-away-from-zero — the same
    double-precision expression the DuckDB oracle's
    ``list_transform(embedding, x -> round(x * 1000000))`` evaluates
    (f32 → f64 is exact, ×1e6 is the identical double op).  Every dot
    product / squared norm over these rows is an exact integer far
    below 2**53 (|q| ≤ ~1e6, dim ≤ 64 → |Σ q·q'| ≤ ~6e13), so float64
    BLAS matmul is order-independent: the summation-order ulp that
    flipped one borderline sf0.1 edge on the float-cosine path cannot
    occur."""
    import pyarrow.compute as pc_

    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    n = len(col)
    flat = pc_.cast(col.flatten(), pa.float64())
    micro = pc_.round(
        pc_.multiply(flat, pa.scalar(1_000_000.0)),
        round_mode="half_towards_infinity",
    )
    return micro.to_numpy(zero_copy_only=False).reshape(n, -1)


def _milli_cosine_block(qa: np.ndarray, qb: np.ndarray) -> np.ndarray:
    """Exact milli-cosine between micro-quantized row blocks:
    ``round(1000.0 * dot / (sqrt(sa) * sqrt(sb)))`` — dot/sa/sb are
    exact integers, sqrt/×/÷ are single correctly-rounded IEEE ops, so
    this is bit-identical to the oracle SQL's identical expression.
    Zero-norm rows (cosine undefined; oracle NULL, which sorts last
    under ORDER BY c DESC) rank below every real cosine."""
    dot = qa @ qb.T
    na = np.sqrt(np.einsum("ij,ij->i", qa, qa))
    nb = np.sqrt(np.einsum("ij,ij->i", qb, qb))
    denom = na[:, None] * nb[None, :]
    with np.errstate(divide="ignore", invalid="ignore"):
        val = 1000.0 * dot / denom
    val = np.where(denom == 0.0, -1.0e6, val)
    return _round_half_away(val).astype(np.int64)


class _ListedKnnEdges:
    """Actor-pool stage for the listed (IVF-partitioned) kNN-edge path:
    each actor lazily LRU-caches quantized list partitions read
    task-side from the shared IVF store (:func:`build_ivf_index`) —
    nothing but the file root travels with the task, so per-batch
    network cost is O(batch), never O(corpus) (the small-n path's
    full-matrix ``ray.put`` broadcast is exactly what this avoids at
    10^9 vectors).  With ``nprobe=None`` every list is scored, which
    is EXACT: the global top-k is the top-k of the per-list top-ks
    because IVF lists partition the corpus.  With ``nprobe < n_lists``
    only each row's nearest-centroid lists are scored — the documented
    approximate configuration for corpora where even streaming all
    lists is too much compute."""

    def __init__(self, root: str, k: int, n_nodes: int,
                 nprobe: int | None, max_cached_lists: int = 64):
        import pathlib
        from collections import OrderedDict

        self.root = pathlib.Path(root)
        self.cent_unit = np.load(self.root / "centroids.npy")
        self.n_lists = len(self.cent_unit)
        self.k = k
        self.n_nodes = n_nodes
        self.nprobe = self.n_lists if nprobe is None else min(nprobe, self.n_lists)
        self.max_cached_lists = max_cached_lists
        self._cache: "dict[int, tuple[np.ndarray, np.ndarray]]" = OrderedDict()

    def _list_data(self, c: int) -> tuple[np.ndarray, np.ndarray]:
        import pyarrow.parquet as pq_

        hit = self._cache.get(c)
        if hit is not None:
            self._cache.move_to_end(c)
            return hit
        files = sorted((self.root / f"list={c}").glob("*.parquet"))
        if not files:
            data = (np.empty(0, np.int64), np.empty((0, 1), np.float64))
        else:
            t = pa.concat_tables(
                [pq_.read_table(f, columns=["vec_id", "embedding"]) for f in files]
            )
            ids = t.column("vec_id").to_numpy(zero_copy_only=False).astype(np.int64)
            data = (ids, _micro_quant_matrix(t.column("embedding")))
        self._cache[c] = data
        while len(self._cache) > self.max_cached_lists:
            self._cache.popitem(last=False)
        return data

    def __call__(self, batch: pa.Table) -> pa.Table:
        empty = pa.table({"u": pa.array([], pa.int64()),
                          "v": pa.array([], pa.int64())})
        bids = batch.column("vec_id").to_numpy(zero_copy_only=False).astype(np.int64)
        if not len(bids):
            return empty
        bq = _micro_quant_matrix(batch.column("embedding"))
        if self.nprobe < self.n_lists:
            # approximate: per-row nearest-centroid lists (float ranking
            # is fine — the approximate path carries no exactness claim)
            sims = _unit(bq) @ self.cent_unit.T
            ranked = np.argsort(-sims, axis=1)[:, : self.nprobe]
            probes = [np.flatnonzero((ranked == c).any(axis=1))
                      for c in range(self.n_lists)]
        else:
            all_rows = np.arange(len(bids))
            probes = [all_rows] * self.n_lists
        # composite rank key: higher milli first, ties by neighbor id
        # asc — same ordering as the small-n path's id-sorted columns
        stride = np.int64(max(self.n_nodes, int(bids.max()) + 1) + 1)
        sentinel = np.iinfo(np.int64).max
        kk = min(self.k, max(self.n_nodes - 1, 1))
        rows_acc: list[np.ndarray] = []
        nbr_acc: list[np.ndarray] = []
        comp_acc: list[np.ndarray] = []
        for c in range(self.n_lists):
            rows = probes[c]
            if not len(rows):
                continue
            ids_c, q_c = self._list_data(c)
            if not len(ids_c):
                continue
            milli = _milli_cosine_block(bq[rows], q_c)
            comp = (np.int64(1000) - milli) * stride + ids_c[None, :]
            comp[ids_c[None, :] == bids[rows, None]] = sentinel
            take = min(kk, comp.shape[1])
            cols = np.argpartition(comp, take - 1, axis=1)[:, :take]
            flat_rows = np.repeat(np.arange(len(rows)), take)
            flat_cols = cols.ravel()
            rows_acc.append(np.repeat(rows, take))
            nbr_acc.append(ids_c[flat_cols])
            comp_acc.append(comp[flat_rows, flat_cols])
        if not rows_acc:
            return empty
        rows_all = np.concatenate(rows_acc)
        nbr_all = np.concatenate(nbr_acc)
        comp_all = np.concatenate(comp_acc)
        keep = comp_all != sentinel
        rows_all, nbr_all, comp_all = rows_all[keep], nbr_all[keep], comp_all[keep]
        if not len(rows_all):
            return empty
        order = np.lexsort((comp_all, rows_all))
        rows_s = rows_all[order]
        starts = np.searchsorted(rows_s, np.arange(len(bids)))
        rank = np.arange(len(rows_s)) - starts[rows_s]
        sel = rank < kk
        src = bids[rows_s[sel]]
        dst = nbr_all[order][sel]
        u = np.minimum(src, dst)
        v = np.maximum(src, dst)
        uv = np.unique(np.stack([u, v], axis=1), axis=0)
        return pa.table({"u": pa.array(uv[:, 0], pa.int64()),
                         "v": pa.array(uv[:, 1], pa.int64())})


def knn_graph_stats(
    sf_dir: str,
    k: int = 10,
    small_n_max: int = 100_000,
    n_lists: int = 16,
    nprobe: int | None = None,
):
    """kNN similarity-graph topology statistics — undirected k-nearest-
    neighbor graph over the embedding corpus (edge = either endpoint in
    the other's top-``k`` by milli-cosine, ties broken by neighbor id),
    then **triangle counting via the canonical two-join plan**: ordered
    edges (u<v) self-join on the middle vertex → wedges a<b<c, wedges
    join edges on (a,c) → closed triangles.  Reports transitivity
    (closed-wedge fraction) — the clustering-structure diagnostic used
    to QA semantic-dedup graphs.

    Exactness: cosine is computed over micro-quantized integer
    embeddings (:func:`_micro_quant_matrix`) so dot products and norms
    are exact integers < 2**53 — summation order cannot shift a value,
    and the milli edge weight (:func:`_milli_cosine_block`) is
    bit-identical to the oracle SQL's at every scale (closing the
    former 1-ulp sf0.1 divergence).

    Scale shape: corpora up to ``small_n_max`` rows take the fast path
    (one ``ray.put`` of the id-sorted quantized matrix, per-batch BLAS
    block — the :func:`knn_batch` shape).  Larger corpora (or an
    explicit ``nprobe``) use :class:`_ListedKnnEdges` over the
    persisted :func:`build_ivf_index` layout: actors stream quantized
    list partitions from the shared store with an LRU cache — no
    full-matrix broadcast — and ``nprobe=None`` (score every list)
    keeps it exactly equal to the fast path.  The two graph joins are
    native hash joins; wedge volume is Σ deg² ≤ n·(2k)², bounded by
    construction, never all-pairs."""
    import pyarrow.parquet as pq_

    n_nodes = pq_.read_metadata(f"{sf_dir}/embeddings.parquet").num_rows

    if nprobe is None and n_nodes <= small_n_max:
        full = pq_.read_table(
            f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
        )
        ids_full = full.column("vec_id").to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.argsort(ids_full)
        ids_full = ids_full[order]
        q_full = _micro_quant_matrix(full.column("embedding"))[order]
        state = ray.put((ids_full, q_full))

        def topk_edges(batch: pa.Table) -> pa.Table:
            ids_f, q_f = ray.get(state)
            bids = batch.column("vec_id").to_numpy(zero_copy_only=False).astype(np.int64)
            if not len(bids):
                return pa.table({"u": pa.array([], pa.int64()),
                                 "v": pa.array([], pa.int64())})
            bq = _micro_quant_matrix(batch.column("embedding"))
            milli = _milli_cosine_block(bq, q_f)
            ncol = len(ids_f)
            # composite rank key: higher milli first, then neighbor id
            # asc (column order IS id order — matrix sorted by id)
            comp = (1000 - milli) * np.int64(ncol) + np.arange(ncol, dtype=np.int64)
            self_col = np.searchsorted(ids_f, bids)
            rows = np.arange(len(bids))
            is_self = (self_col < ncol) & (ids_f[np.minimum(self_col, ncol - 1)] == bids)
            comp[rows[is_self], self_col[is_self]] = np.iinfo(np.int64).max
            kk = min(k, ncol - 1)
            nbr_cols = np.argpartition(comp, kk - 1, axis=1)[:, :kk]
            src = np.repeat(bids, kk)
            dst = ids_f[nbr_cols.ravel()]
            u = np.minimum(src, dst)
            v = np.maximum(src, dst)
            uv = np.unique(np.stack([u, v], axis=1), axis=0)
            return pa.table({"u": pa.array(uv[:, 0], pa.int64()),
                             "v": pa.array(uv[:, 1], pa.int64())})

        edge_src = _emb(sf_dir).map_batches(
            topk_edges, batch_format="pyarrow", zero_copy_batch=True
        )
    else:
        root = build_ivf_index(sf_dir, n_lists=n_lists)
        edge_src = _emb(sf_dir).map_batches(
            _ListedKnnEdges,
            fn_constructor_args=(root, k, n_nodes, nprobe),
            batch_format="pyarrow",
            zero_copy_batch=True,
            concurrency=(1, 8),
        )
    return _edge_triangle_stats(edge_src, n_nodes)


def _edge_triangle_stats(edge_src, n_nodes: int) -> pa.Table:
    """Shared tail of the kNN-graph paths: dedup edges, wedge self-join,
    closure join, transitivity — all native hash joins."""
    from crawl_ray.util import normalize_schema

    num_partitions = max(4, int(ray.cluster_resources().get("CPU", 8)) // 4)
    i64 = pa.int64()
    # the groupby emits ZERO-COLUMN blocks for empty hash partitions on
    # small inputs; joins over those fail in the aggregator's Arrow join
    # — re-emit typed blocks (coalesce merges the schema-less empties)
    edges = normalize_schema(
        edge_src
        .groupby(["u", "v"])
        .count()
        .drop_columns(["count()"]),
        {"u": i64, "v": i64},
        coalesce=num_partitions,
    ).materialize()
    n_edges = edges.count()
    # wedges a<b<c: (a,b) joins (b,c) on the middle vertex
    e2 = normalize_schema(
        edges, {"u2": i64, "v2": i64}, rename={"u": "u2", "v": "v2"},
        coalesce=num_partitions,
    )
    wedges = normalize_schema(
        edges.join(e2, "inner", num_partitions, on=("v",), right_on=("u2",)),
        {"a": i64, "c": i64}, rename={"u": "a", "v2": "c"},
        coalesce=num_partitions,
    ).materialize()
    n_wedges = wedges.count()
    closed = wedges.join(
        edges, "inner", num_partitions, on=("a", "c"), right_on=("u", "v")
    )
    n_tri = closed.count()
    trans = (n_tri * 1000) // n_wedges if n_wedges else 0
    return pa.table(
        {
            "n_nodes": pa.array([n_nodes], pa.int64()),
            "n_edges": pa.array([n_edges], pa.int64()),
            "n_wedges": pa.array([n_wedges], pa.int64()),
            "n_triangles": pa.array([n_tri], pa.int64()),
            "transitivity_milli": pa.array([trans], pa.int64()),
        }
    )


def threshold_graph_stats(sf_dir: str, threshold_milli: int = 450):
    """Triangle/transitivity statistics over the THRESHOLD similarity
    graph (edge = verified cosine ≥ threshold) — the fully scale-clean
    companion to :func:`knn_graph_stats`: edges come from
    :func:`crawl_ray.pipelines.dedup.embedding_near_dup`'s sign-LSH
    bucketed candidates-then-verify path (no all-pairs matmul, no
    driver-side matrix), and the triangle count is the same canonical
    two-hash-join wedge plan.  At 10^9 vectors every stage is bucketed
    or join-partitioned; nothing is broadcast but the LSH planes."""
    from crawl_ray.pipelines.dedup import (
        _unique_pair_ids,
        embedding_near_dup_ds,
    )

    pairs_ds = embedding_near_dup_ds(sf_dir, threshold_milli=threshold_milli)
    n_edges = pairs_ds.count()  # metadata read — the ds is materialized

    # Small-graph driver fast path, gated on the CHEAP Dataset count —
    # the pair set is only collected to the driver after the ≤500k
    # gate passes (VERDICT r3: never stage the edges before deciding):
    # wedges via per-middle-vertex in×out segment products, closure via
    # sorted encoded-edge membership.  Guarded twice — edge count AND
    # the exact wedge total (Σ in·out) — so a dense dup graph still
    # takes the distributed two-hash-join plan below.
    pairs = None
    if n_edges and n_edges <= 500_000:
        pairs = collect_table(pairs_ds)
        ua = pairs.column("vec_a").to_numpy(zero_copy_only=False).astype(np.int64)
        va = pairs.column("vec_b").to_numpy(zero_copy_only=False).astype(np.int64)
        # dense-relabel node ids before the ua*base+va edge encodings:
        # raw vec_ids above ~3e9 would overflow int64 in the products
        # (silent numpy wraparound → corrupt triangle counts); after
        # relabeling base ≤ n_nodes ≤ 2·edges ≤ 1e6, so products stay
        # ≤ ~1e12.  Only counts leave this path, never ids.
        nodes = np.unique(np.concatenate([ua, va]))
        n_nodes = len(nodes)
        ua = np.searchsorted(nodes, ua)
        va = np.searchsorted(nodes, va)
        order = np.lexsort((ua, va))  # group incoming by middle v
        mid_in, a_in = va[order], ua[order]
        order2 = np.lexsort((va, ua))  # group outgoing by middle u
        mid_out, c_out = ua[order2], va[order2]
        mids = np.unique(np.concatenate([mid_in, mid_out]))
        in_cnt = np.searchsorted(mid_in, mids, side="right") - np.searchsorted(
            mid_in, mids, side="left"
        )
        out_cnt = np.searchsorted(mid_out, mids, side="right") - np.searchsorted(
            mid_out, mids, side="left"
        )
        n_wedges = int((in_cnt.astype(np.int64) * out_cnt).sum())
        if n_wedges <= 50_000_000:
            # enumerate (a, c) with pure segment arithmetic over the
            # GLOBAL wedge index space [0, n_wedges): wedge g belongs
            # to middle k = searchsorted(cum, g) at local offset
            # t = g - gstart[k], and maps to
            # (in_start[k] + t // out_cnt[k], out_start[k] + t % out_cnt[k]).
            # Chunking the flat index (not whole middles) bounds every
            # transient array at _WEDGE_CHUNK even when a single hub
            # middle holds ~all 50M guard wedges — the per-middle
            # variant made the "~40 MB/chunk" claim false on stars.
            n_tri = 0
            if n_wedges:
                in_start = np.searchsorted(mid_in, mids, side="left")
                out_start = np.searchsorted(mid_out, mids, side="left")
                per_mid = in_cnt.astype(np.int64) * out_cnt
                base = np.int64(int(va.max()) + 1)  # va == all wedge c's
                ecode = np.sort(ua * base + va)
                act = np.flatnonzero(per_mid)
                cum = np.cumsum(per_mid[act])
                gstart = np.concatenate(
                    ([0], cum[:-1])).astype(np.int64)
                for g0 in range(0, n_wedges, _WEDGE_CHUNK):
                    g = np.arange(
                        g0, min(g0 + _WEDGE_CHUNK, n_wedges),
                        dtype=np.int64,
                    )
                    k = np.searchsorted(cum, g, side="right")
                    t = g - gstart[k]
                    sel = act[k]
                    oc_k = out_cnt[sel]
                    wa = a_in[in_start[sel] + t // oc_k]
                    wc = c_out[out_start[sel] + t % oc_k]
                    wcode = wa * base + wc
                    loc = np.searchsorted(ecode, wcode)
                    hit = (loc < len(ecode)) & (
                        ecode[np.minimum(loc, len(ecode) - 1)] == wcode
                    )
                    n_tri += int(hit.sum())
            trans = (n_tri * 1000) // n_wedges if n_wedges else 0
            return pa.table(
                {
                    "n_nodes": pa.array([n_nodes], pa.int64()),
                    "n_edges": pa.array([n_edges], pa.int64()),
                    "n_wedges": pa.array([n_wedges], pa.int64()),
                    "n_triangles": pa.array([n_tri], pa.int64()),
                    "transitivity_milli": pa.array([trans], pa.int64()),
                }
            )

    # Distributed plan.  Edges come straight from the verified-pair
    # Dataset — a rename per block, never a driver table (only when the
    # ≤500k fast path collected them and then hit the wedge guard do we
    # reuse the already-driver-sized table).
    def _rename(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or "vec_a" not in b.column_names:
            return pa.table(
                {"u": pa.array([], pa.int64()), "v": pa.array([], pa.int64())}
            )
        return pa.table({"u": b.column("vec_a"), "v": b.column("vec_b")})

    from crawl_ray.util import normalize_schema

    i64 = pa.int64()
    num_partitions = max(4, int(ray.cluster_resources().get("CPU", 8)) // 4)
    if pairs is not None:
        edges = ray.data.from_arrow(_rename(pairs)).materialize()
    else:
        # normalize_schema, not a bare map_batches rename: the pair
        # Dataset's upstream groupby stages emit ZERO-COLUMN blocks for
        # empty hash partitions and Ray short-circuits empty blocks
        # past the UDF — the joins below would die in the aggregator's
        # Arrow join (same guard as knn_graph_stats above)
        edges = normalize_schema(
            pairs_ds, {"u": i64, "v": i64},
            rename={"vec_a": "u", "vec_b": "v"},
            coalesce=num_partitions,
        ).materialize()
        # node count: per-block unique in tasks, node-sized driver union
        node_parts = [
            p for p in ray.get([
                _unique_pair_ids.remote(ref, "u", "v")
                for ref in edges.to_arrow_refs()
            ]) if len(p)
        ]
        n_nodes = (
            len(np.unique(np.concatenate(node_parts))) if node_parts else 0
        )
    e2 = normalize_schema(
        edges, {"u2": i64, "v2": i64}, rename={"u": "u2", "v": "v2"},
        coalesce=num_partitions,
    )
    wedges = normalize_schema(
        edges.join(e2, "inner", num_partitions, on=("v",), right_on=("u2",)),
        {"a": i64, "c": i64}, rename={"u": "a", "v2": "c"},
        coalesce=num_partitions,
    ).materialize()
    n_wedges = wedges.count()
    if n_wedges:
        closed = wedges.join(
            edges, "inner", num_partitions, on=("a", "c"), right_on=("u", "v")
        )
        n_tri = closed.count()
    else:
        n_tri = 0
    trans = (n_tri * 1000) // n_wedges if n_wedges else 0
    return pa.table(
        {
            "n_nodes": pa.array([n_nodes], pa.int64()),
            "n_edges": pa.array([n_edges], pa.int64()),
            "n_wedges": pa.array([n_wedges], pa.int64()),
            "n_triangles": pa.array([n_tri], pa.int64()),
            "transitivity_milli": pa.array([trans], pa.int64()),
        }
    )


def embedding_moments(sf_dir: str) -> pa.Table:
    """Distributed second-moment (Gram) matrix of the embedding corpus
    in EXACT integer milli-units — the dim×dim generalization of the
    OLS moment-matrix pattern (`textops.lang_length_regression`): each
    block contributes ``Qᵀ Q`` for its milli-quantized rows (one int64
    matmul, zero shuffle), the driver sums the 64×64 partials, and the
    upper triangle ships as (i, j, sum_mm) rows.  This is the
    accumulation step every distributed PCA / linear probe / whitening
    pass runs over a 100 TB embedding table; eigen-solves happen on the
    driver over the bounded matrix.  Exact integers ⇒ the DuckDB oracle
    agrees bit-for-bit (no float summation-order ulps)."""
    ds = _emb(sf_dir)

    def gram(batch: pa.Table) -> pa.Table:
        mat = list_col_to_matrix(batch.column("embedding"))
        if mat.size == 0:
            return pa.table({"g": pa.array([], pa.list_(pa.int64())),
                             "d": pa.array([], pa.int64())})
        q = _round_half_away(mat * 1000.0).astype(np.int64)
        g = q.T @ q  # dim × dim int64
        return pa.table(
            {"g": pa.array([g.ravel().tolist()], pa.list_(pa.int64())),
             "d": pa.array([g.shape[0]], pa.int64())}
        )

    parts = collect_table(
        ds.map_batches(gram, batch_format="pyarrow", zero_copy_batch=True)
    )
    if parts.num_rows == 0:
        return pa.table(
            {"i": pa.array([], pa.int64()), "j": pa.array([], pa.int64()),
             "sum_mm": pa.array([], pa.int64())}
        )
    dim = int(parts.column("d")[0].as_py())
    total = np.zeros((dim, dim), dtype=np.int64)
    for row in parts.column("g").to_pylist():
        total += np.asarray(row, dtype=np.int64).reshape(dim, dim)
    iu, ju = np.triu_indices(dim)
    return pa.table(
        {"i": pa.array(iu + 1, pa.int64()),  # 1-based like the oracle
         "j": pa.array(ju + 1, pa.int64()),
         "sum_mm": pa.array(total[iu, ju], pa.int64())}
    )
