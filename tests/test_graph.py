"""Hand-computed integer-PageRank check over a 3-node bipartite graph
(two parts supplying one supplier), plus a symmetry fixpoint case."""

import pyarrow as pa
import pyarrow.parquet as pq

from crawl_ray.pipelines.graph import SUPPLIER_OFFSET, supplier_pagerank


def _li(tmp_path, pairs):
    t = pa.table(
        {
            "l_partkey": pa.array([p for p, _ in pairs], pa.int64()),
            "l_suppkey": pa.array([s for _, s in pairs], pa.int64()),
        }
    )
    pq.write_table(t, tmp_path / "lineitem.parquet")
    return str(tmp_path)


def test_two_node_cycle_is_fixpoint(tmp_path, ray_session):
    # one part <-> one supplier: rank stays at the 1_000_000 base
    out = supplier_pagerank(_li(tmp_path, [(1, 1)]), num_partitions=4)
    assert out.column("rank_micro").to_pylist() == [1_000_000, 1_000_000]


def test_star_graph_hand_computed(tmp_path, ray_session):
    # parts 1,2 -> supplier 1 (duplicated lineitem rows must not
    # create duplicate edges)
    out = supplier_pagerank(
        _li(tmp_path, [(1, 1), (2, 1), (1, 1)]), num_partitions=4
    )
    got = dict(
        zip(out.column("node").to_pylist(), out.column("rank_micro").to_pylist())
    )
    # 3 iterations of contrib = rank//outdeg, new = 150000 + 850*sum//1000:
    # supplier: 1850000 -> 1127500 -> 1741625; parts: 575000 -> 936250 -> 629187
    assert got == {
        SUPPLIER_OFFSET + 1: 1_741_625,
        1: 629_187,
        2: 629_187,
    }
    # supplier first (rank desc)
    assert out.column("node").to_pylist()[0] == SUPPLIER_OFFSET + 1


def test_distributed_path_equals_local(ray_session):
    """The forced-distributed loop (small_graph_threshold=0) is
    bit-equal to the local fast path on a real corpus — so the sf0.01
    oracle (which the fast path serves) transitively covers it."""
    local = supplier_pagerank("/root/testdata/sf0.001").to_pandas()
    dist = supplier_pagerank(
        "/root/testdata/sf0.001", small_graph_threshold=0
    ).to_pandas()
    assert local.equals(dist)


from crawl_ray.pipelines.graph import supplier_bfs_distance


def _li_sup(tmp_path, pairs, suppkeys):
    _li(tmp_path, pairs)
    pq.write_table(
        pa.table({"s_suppkey": pa.array(suppkeys, pa.int64())}),
        tmp_path / "supplier.parquet",
    )
    return str(tmp_path)


def test_bfs_chain_hand_computed(tmp_path, ray_session):
    """Chain s1 - p1 - s2 - p2 - s3: from seed s1, distances are
    p1=1, s2=2, p2=3 (s3 is beyond max_hops=3)."""
    d = _li_sup(tmp_path, [(1, 1), (1, 2), (2, 2), (2, 3)], [1, 2, 3])
    out = supplier_bfs_distance(d, num_partitions=4).to_pandas()
    got = {r.dist: (r.n_nodes, r.n_suppliers) for r in out.itertuples()}
    assert got == {0: (1, 1), 1: (1, 0), 2: (1, 1), 3: (1, 0)}


def test_bfs_isolated_seed(tmp_path, ray_session):
    """A seed supplier with no lineitems is still reported at dist 0."""
    d = _li_sup(tmp_path, [(1, 7)], [5, 7])  # seed = supplier 5, isolated
    out = supplier_bfs_distance(d, num_partitions=4).to_pandas()
    got = {r.dist: (r.n_nodes, r.n_suppliers) for r in out.itertuples()}
    assert got == {0: (1, 1)}


def test_bfs_distributed_path_equals_local(ray_session):
    local = supplier_bfs_distance("/root/testdata/sf0.001").to_pandas()
    dist = supplier_bfs_distance(
        "/root/testdata/sf0.001", small_graph_threshold=0
    ).to_pandas()
    assert local.equals(dist)


def test_link_pagerank_distributed_path_equals_local(ray_session):
    """Directed link-graph PageRank: the string-keyed distributed loop
    is bit-equal to the driver fast path on the same fixture web."""
    from crawl_ray.pipelines.crawl_queries import link_pagerank

    local = link_pagerank("/root/testdata/sf0.001").to_pandas()
    dist = link_pagerank(
        "/root/testdata/sf0.001", small_graph_threshold=0
    ).to_pandas()
    assert local.equals(dist)
    assert len(local) == 20
    # ranks are in micro-units with teleport floor 150000
    assert (local.rank_micro >= 150_000).all()
