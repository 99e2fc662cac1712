"""Edge tests for the distributed k-means operator (corpus-scale
DuckDB-oracle parity is in tests/test_queries_oracle.py)."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from crawl_ray.pipelines.similarity import kmeans_embeddings


@pytest.fixture(scope="module")
def tiny_emb_dir(tmp_path_factory):
    # two tight groups far apart; seeds = vec_ids 0,1,2 → centroid 1
    # (point [10,10]) loses all its points to centroid 2 ([11,11]'s
    # group pulls the mean) unless... constructed so cluster 1 goes
    # EMPTY after iteration 1: seeds 0=[0,0], 1=[0.001,0], 2=[10,10];
    # all near-origin points sit closest to seed 0 or 1, the far group
    # to 2; after the update c0/c1 both sit near origin, far group
    # stays at 2 — then make c1's single member defect: it is closer
    # to updated c0 → c1 empty at iteration 2, must KEEP its centroid.
    vecs = [
        [0.0, 0.0],       # 0 seed c0
        [0.001, 0.0],     # 1 seed c1 (defects to c0 after update)
        [10.0, 10.0],     # 2 seed c2
        [0.0, 0.001],     # 3 → c0
        [10.0, 10.001],   # 4 → c2
    ]
    d = tmp_path_factory.mktemp("tiny_emb")
    pq.write_table(
        pa.table(
            {"vec_id": pa.array(range(len(vecs)), pa.int64()),
             "embedding": pa.array(vecs, pa.list_(pa.float32()))}
        ),
        d / "embeddings.parquet",
    )
    return str(d)


def test_kmeans_empty_cluster_keeps_centroid(tiny_emb_dir, ray_session):
    t = kmeans_embeddings(tiny_emb_dir, k=3, iterations=3).to_pandas()
    by = dict(zip(t.vec_id, t.cluster))
    # far group stable on c2, near-origin group coalesces on one
    # centroid; the run must complete with k=3 despite an empty cluster
    assert by[2] == 2 and by[4] == 2
    assert by[0] == by[3]
    assert len(t) == 5
    assert (t.dist_q >= 0).all()


def test_kmeans_deterministic(ray_session):
    a = kmeans_embeddings("/root/testdata/sf0.001").to_pandas()
    b = kmeans_embeddings("/root/testdata/sf0.001").to_pandas()
    assert a.equals(b)


def test_kmeans_matches_serial_reference(ray_session, tmp_path):
    """Distributed Lloyd's ≡ an independent single-process numpy
    reference (same quantization / seeding / tie / empty-cluster
    rules) on a random corpus."""
    rng = np.random.RandomState(11)
    n, dim, k, iters = 300, 8, 5, 3
    vecs = rng.randn(n, dim).astype(np.float32) * 0.3
    d = tmp_path / "emb"
    d.mkdir()
    pq.write_table(
        pa.table(
            {"vec_id": pa.array(range(n), pa.int64()),
             "embedding": pa.array(vecs.tolist(), pa.list_(pa.float32()))}
        ),
        d / "embeddings.parquet",
    )
    # serial reference
    q = np.sign(vecs.astype(np.float64) * 1000) * np.floor(
        np.abs(vecs.astype(np.float64) * 1000) + 0.5
    )
    q = q.astype(np.int64)
    cent = q[:k].copy()
    for _ in range(iters):
        dmat = ((q[:, None, :] - cent[None, :, :]) ** 2).sum(-1)
        a = np.argmin(dmat, axis=1)
        for c in range(k):
            m = a == c
            if m.any():
                cent[c] = q[m].sum(axis=0) // m.sum()
    dmat = ((q[:, None, :] - cent[None, :, :]) ** 2).sum(-1)
    a = np.argmin(dmat, axis=1)
    dist = dmat[np.arange(n), a]

    got = kmeans_embeddings(str(d), k=k, iterations=iters).to_pandas()
    assert (got.cluster.to_numpy() == a).all()
    assert (got.dist_q.to_numpy() == dist).all()


def test_query_vector_missing_id_raises(tiny_emb_dir, ray_session):
    """pc.index returns -1 on a miss; without the guard the negative
    index silently wraps to the LAST row's embedding — a plausible
    top-k for the wrong query."""
    from crawl_ray.pipelines.similarity import query_vector

    assert query_vector(tiny_emb_dir, 0)[0] == 0.0
    with pytest.raises(KeyError, match="999"):
        query_vector(tiny_emb_dir, 999)


def test_knn_batch_small_corpus_drops_self_hits(tiny_emb_dir, ray_session):
    """Corpus (5 rows) smaller than k+1: the -inf-masked self row used
    to survive the per-batch cut and int64-cast to garbage cos_milli."""
    from crawl_ray.pipelines.similarity import knn_batch

    t = knn_batch(tiny_emb_dir, k=8, n_queries=3)
    qs = t.column("query_id").to_pylist()
    vs = t.column("vec_id").to_pylist()
    cm = t.column("cos_milli").to_pylist()
    assert all(q != v for q, v in zip(qs, vs)), "self-hit leaked"
    assert all(-1000 <= c <= 1000 for c in cm), "non-cosine milli value"
    # each query pairs with every OTHER vector exactly once
    for q in set(qs):
        assert sorted(v for qq, v in zip(qs, vs) if qq == q) == sorted(
            set(range(5)) - {q}
        )
