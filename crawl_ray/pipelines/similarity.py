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

from crawl_ray.util import collect_table

from crawl_ray.urlnorm import fnv1a64_batch


def _round_half_away(x: np.ndarray) -> np.ndarray:
    """DuckDB-compatible rounding (numpy's round is half-to-even)."""
    return np.sign(x) * np.floor(np.abs(x) + 0.5)

__all__ = ["knn_brute", "knn_ivf", "query_vector"]


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
        mat = np.asarray(batch.column("embedding").to_pylist(), dtype=np.float64)
        sims = _unit(mat) @ qv
        ids = batch.column("vec_id").to_numpy(zero_copy_only=False)
        take = min(k, len(ids))
        part = np.argpartition(-sims, take - 1)[:take]
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


def knn_ivf(
    sf_dir: str, k: int = 10, query_id: int = 0, n_lists: int = 16, nprobe: int = 4
) -> pa.Table:
    """IVF-bucketed ANN: deterministic coarse centroids (hash-seeded
    sample + 5 Lloyd iterations on the driver over a small sample),
    then a filtered exact search over the probed lists only.

    At 100 TB the list assignment is a bucketed parquet layout (like the
    page store) and only ``nprobe/n_lists`` of the corpus is read."""
    ds = _emb(sf_dir)
    sample = ds.take_batch(2048, batch_format="pyarrow")
    mat = np.asarray(sample.column("embedding").to_pylist(), dtype=np.float64)
    seed_idx = fnv1a64_batch([f"ivf:{i}" for i in range(n_lists)]) % np.uint64(len(mat))
    centroids = mat[seed_idx.astype(np.int64)]
    for _ in range(5):
        assign = np.argmax(_unit(mat) @ _unit(centroids).T, axis=1)
        for c in range(n_lists):
            members = mat[assign == c]
            if len(members):
                centroids[c] = members.mean(axis=0)
    cent_unit = _unit(centroids)

    q = query_vector(sf_dir, query_id)
    q = q / (np.linalg.norm(q) or 1.0)
    probe = set(np.argsort(-(cent_unit @ q))[:nprobe].tolist())
    state = ray.put((cent_unit, q, probe))

    def probe_topk(batch: pa.Table) -> pa.Table:
        cu, qv, pr = ray.get(state)
        emb = np.asarray(batch.column("embedding").to_pylist(), dtype=np.float64)
        unit = _unit(emb)
        lists = np.argmax(unit @ cu.T, axis=1)
        mask = np.isin(lists, list(pr))
        ids = batch.column("vec_id").to_numpy(zero_copy_only=False)[mask]
        sims = (unit[mask]) @ qv
        take = min(k, len(ids))
        if take == 0:
            return pa.table(
                {"vec_id": pa.array([], pa.int64()), "cos_sim": pa.array([], pa.float64())}
            )
        part = np.argpartition(-sims, take - 1)[:take]
        return pa.table(
            {
                "vec_id": pa.array(ids[part], pa.int64()),
                "cos_sim": pa.array(sims[part], pa.float64()),
            }
        )

    parts = collect_table(
        ds.map_batches(probe_topk, batch_format="pyarrow", zero_copy_batch=True)
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
