"""Edge-case tests for the round-3 analytics operators (planted values,
ties, singletons) — complements the sf-data oracle gate."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from crawl_ray.pipelines import similarity as SIM
from crawl_ray.pipelines import streams as S
from crawl_ray.pipelines import textops as T


def _events(tmp_path, rows):
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array([r[0] for r in rows], pa.int64()),
                "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
                "user_id": pa.array([r[2] for r in rows], pa.int64()),
                "event_type": pa.array([r[3] for r in rows], pa.string()),
                "value": pa.array([1.0] * len(rows), pa.float64()),
            }
        ),
        tmp_path / "events.parquet",
    )
    return str(tmp_path)


def test_gap_stats_planted_and_singletons(tmp_path, ray_session):
    # user 1: events at t=0, 10s, 40s (gaps 10 and 30, types b and c);
    # user 2: a single event (no gaps); ties broken by event_id
    rows = [
        (1, 0, 1, "a"),
        (2, 10_000_000, 1, "b"),
        (3, 40_000_000, 1, "c"),
        (4, 5_000_000, 2, "a"),
    ]
    d = _events(tmp_path, rows)
    out = S.events_gap_stats(d).to_pandas().set_index("event_type")
    assert set(out.index) == {"b", "c"}
    assert out.loc["b"].median_gap_s == 10
    assert out.loc["c"].median_gap_s == 30
    assert out.loc["b"].n_gaps == 1


def test_gap_stats_ts_tie_ordered_by_event_id(tmp_path, ray_session):
    # two events at the SAME ts: order by event_id -> gap 0 attributed
    # to the higher event_id's type
    rows = [(1, 1_000_000, 7, "x"), (2, 1_000_000, 7, "y")]
    d = _events(tmp_path, rows)
    out = S.events_gap_stats(d).to_pandas()
    assert list(out.event_type) == ["y"]
    assert list(out.median_gap_s) == [0]


def test_transition_matrix_planted(tmp_path, ray_session):
    # user 1: a->b->a; user 2: b->b
    rows = [
        (1, 0, 1, "a"), (2, 1_000_000, 1, "b"), (3, 2_000_000, 1, "a"),
        (4, 0, 2, "b"), (5, 9_000_000, 2, "b"),
    ]
    d = _events(tmp_path, rows)
    out = S.event_transition_matrix(d).to_pandas()
    got = {(r.prev_type, r.event_type): r.n_transitions for r in out.itertuples()}
    assert got == {("a", "b"): 1, ("b", "a"): 1, ("b", "b"): 1}


def test_ccnet_buckets_single_lang_small_n(tmp_path, ray_session):
    pq.write_table(
        pa.table(
            {"doc_id": pa.array([0, 1], pa.int64()),
             "text": pa.array(["a a", "a b"], pa.string()),
             "lang": pa.array(["en", "en"], pa.string())}
        ),
        tmp_path / "documents.parquet",
    )
    out = T.ccnet_buckets(str(tmp_path)).to_pandas()
    assert len(out) == 2
    assert set(out.bucket) <= {"head", "middle", "tail"}
    # lower-NLL doc must not land in a later bucket than the higher one
    by_doc = out.set_index("doc_id")
    assert by_doc.loc[0, "avg_nll_milli"] <= by_doc.loc[1, "avg_nll_milli"]


def test_knn_graph_triangle_planted(tmp_path, ray_session):
    # 3 near-identical vectors (one triangle) + 1 orthogonal outlier
    vecs = [
        [1.0, 0.0, 0.0], [0.999, 0.01, 0.0], [0.998, 0.02, 0.0],
        [0.0, 1.0, 0.0],
    ]
    pq.write_table(
        pa.table(
            {"vec_id": pa.array(range(4), pa.int64()),
             "embedding": pa.array(vecs, pa.list_(pa.float32()))}
        ),
        tmp_path / "embeddings.parquet",
    )
    out = SIM.knn_graph_stats(str(tmp_path), k=2).to_pandas().iloc[0]
    # k=2 connects everything to the cluster; the planted triangle exists
    assert out.n_nodes == 4
    assert out.n_triangles >= 1
    assert out.n_edges >= 3


def test_knn_graph_listed_path_matches_broadcast(ray_session, monkeypatch):
    """Forcing the listed (IVF-partitioned) scale path must reproduce
    the broadcast path bit-for-bit (nprobe=None scores every list), and
    must never ``ray.put`` the full (ids, matrix) state the small-n
    path broadcasts — only the IVF builder's tiny centroid matrix."""
    import numpy as np
    import ray as ray_mod

    sf = "/root/testdata/sf0.001"
    small = SIM.knn_graph_stats(sf)

    real_put = ray_mod.put
    tuple_puts = []

    def spy_put(obj, **kw):
        if isinstance(obj, tuple) and any(
            isinstance(x, np.ndarray) for x in obj
        ):
            tuple_puts.append(type(obj))
        return real_put(obj, **kw)

    monkeypatch.setattr(SIM.ray, "put", spy_put)
    listed = SIM.knn_graph_stats(sf, small_n_max=0, n_lists=4)
    assert listed.equals(small)
    assert tuple_puts == []


def _docs_table(tmp_path, texts):
    pq.write_table(
        pa.table(
            {"doc_id": pa.array(range(len(texts)), pa.int64()),
             "text": pa.array(texts, pa.string()),
             "lang": pa.array(["en"] * len(texts), pa.string())}
        ),
        tmp_path / "documents.parquet",
    )
    return str(tmp_path)


def test_duplicate_spans_planted(tmp_path, ray_session):
    shared = "a b c d e f g h i j"  # 10 tokens -> three 8-gram starts
    texts = [
        f"x1 x2 {shared} y1 y2",     # span tokens [2, 11]
        f"{shared} z1 z2 z3 z4 z5",  # span tokens [0, 9]
        "unrelated words only here nothing repeats at all",
    ]
    d = _docs_table(tmp_path, texts)
    out = T.duplicate_spans(d, k=8).to_pandas().sort_values(
        ["doc_id", "span_start"]
    )
    got = [tuple(r) for r in out.itertuples(index=False)]
    assert got == [(0, 2, 11), (1, 0, 9)]


def test_duplicate_spans_within_doc_repeat_counts(tmp_path, ray_session):
    run = "p q r s t u v w"  # exactly one 8-gram
    d = _docs_table(tmp_path, [f"{run} mid1 mid2 {run}"])
    out = T.duplicate_spans(d, k=8).to_pandas().sort_values(
        ["doc_id", "span_start"]
    )
    got = [tuple(r) for r in out.itertuples(index=False)]
    assert got == [(0, 0, 7), (0, 10, 17)]


def test_remove_duplicate_spans_planted(tmp_path, ray_session):
    shared = "a b c d e f g h"  # one 8-gram
    texts = [
        f"k1 {shared} k2",
        f"{shared}",
        "independent text with no duplicated grams present",
    ]
    d = _docs_table(tmp_path, texts)
    out = (
        T.remove_duplicate_spans(d, k=8)
        .to_pandas().set_index("doc_id").sort_index()
    )
    assert out.loc[0, "text_clean"] == "k1 k2"
    assert out.loc[0, "n_dropped_tokens"] == 8
    assert out.loc[1, "text_clean"] == ""
    assert out.loc[1, "n_kept_tokens"] == 0
    assert out.loc[2, "n_dropped_tokens"] == 0
    assert out.loc[2, "text_clean"] == texts[2]


def test_source_quota_sample_planted(tmp_path, ray_session):
    # source A: 5 docs (cap 2 keeps the 2 smallest hash ranks);
    # source B: 1 doc (under quota, kept)
    pq.write_table(
        pa.table(
            {"doc_id": pa.array([1, 2, 3, 4, 5, 6], pa.int64()),
             "text": pa.array(["x"] * 6, pa.string()),
             "source": pa.array(["A"] * 5 + ["B"], pa.string())}
        ),
        tmp_path / "documents.parquet",
    )
    out = T.source_quota_sample(str(tmp_path), cap=2).to_pandas()
    assert len(out) == 3
    assert (out[out.source == "B"].doc_id == 6).all()
    a = out[out.source == "A"]
    assert len(a) == 2
    # ranks are the 2 smallest among source A's hashes
    ranks = sorted(
        ((d * 2654435761) % 4294967296, d) for d in [1, 2, 3, 4, 5]
    )
    assert sorted(a.doc_id) == sorted(d for _, d in ranks[:2])


def test_inverted_index_reads_only_probed_bucket(tmp_path, ray_session):
    """The lookup scans 1/n_buckets of the index (the knn_ivf
    probed-lists property) and still returns exact postings."""
    import pathlib

    import pyarrow.parquet as pqm

    texts = ["alpha beta gamma", "beta beta delta", "gamma alpha alpha"]
    d = _docs_table(tmp_path, texts)
    # documents need a source column for _docs? no - build uses doc_id/text
    root = pathlib.Path(T.build_inverted_index(d, n_buckets=8))
    total_rows = sum(
        pqm.read_metadata(str(f)).num_rows
        for f in root.glob("bucket=*/*.parquet")
    )
    # every (term, doc) posting is in exactly one bucket
    assert total_rows == 7  # distinct (term, doc) pairs above
    from crawl_ray.urlnorm import fnv1a64_batch
    import numpy as np

    b = int(fnv1a64_batch(["beta"])[0] % np.uint64(8))
    probed = sum(
        pqm.read_metadata(str(f)).num_rows
        for f in (root / f"bucket={b}").glob("*.parquet")
    )
    assert probed < total_rows  # real read reduction
    out = T.term_postings(d, term="beta", n_buckets=8).to_pandas()
    assert list(out.doc_id) == [0, 1]
    assert list(out.tf) == [1, 2]


def test_duplicate_spans_matches_bruteforce_random(tmp_path, ray_session):
    """Seeded random corpora from a tiny vocab (forces collisions) vs a
    direct per-doc Python reference of the same span semantics."""
    rng = np.random.RandomState(7)
    vocab = [f"w{i}" for i in range(6)]
    k = 3
    for case in range(3):
        docs = [
            " ".join(rng.choice(vocab, size=rng.randint(k, 25)))
            for _ in range(12)
        ]
        (tmp_path / f"c{case}").mkdir(exist_ok=True)
        d = _docs_table(tmp_path / f"c{case}", docs)
        toks = [t.split() for t in docs]
        from collections import Counter
        counts = Counter(
            " ".join(t[i:i + k])
            for t in toks for i in range(len(t) - k + 1)
        )
        expected = set()
        for did, t in enumerate(toks):
            flagged = [
                i for i in range(len(t) - k + 1)
                if counts[" ".join(t[i:i + k])] >= 2
            ]
            if not flagged:
                continue
            start = prev = flagged[0]
            for i in flagged[1:]:
                if i - prev >= k:
                    expected.add((did, start, prev + k - 1))
                    start = i
                prev = i
            expected.add((did, start, prev + k - 1))
        out = T.duplicate_spans(d, k=k).to_pandas()
        got = {tuple(r) for r in out.itertuples(index=False)}
        assert got == expected, f"case {case}"


def test_min_cost_supplier_tie_break(tmp_path, ray_session):
    """Equal account balances -> the lower suppkey wins (the Q2 plan's
    deterministic total order; sf data has unique balances so the
    oracle gate never exercises this branch)."""
    from crawl_ray.pipelines.joins import min_cost_supplier

    pq.write_table(
        pa.table({"r_regionkey": pa.array([0], pa.int64()),
                  "r_name": pa.array(["EUROPE"], pa.string())}),
        tmp_path / "region.parquet")
    pq.write_table(
        pa.table({"n_nationkey": pa.array([0], pa.int64()),
                  "n_name": pa.array(["NATION_0"], pa.string()),
                  "n_regionkey": pa.array([0], pa.int64())}),
        tmp_path / "nation.parquet")
    pq.write_table(
        pa.table({"s_suppkey": pa.array([7, 3, 9], pa.int64()),
                  "s_name": pa.array(["s7", "s3", "s9"], pa.string()),
                  "s_nationkey": pa.array([0, 0, 0], pa.int64()),
                  "s_acctbal": pa.array([10.0, 10.0, 5.0], pa.float64())}),
        tmp_path / "supplier.parquet")
    # part 1 supplied by 7 and 3 (tied balance -> 3 wins);
    # part 2 supplied by 9 only
    pq.write_table(
        pa.table({"l_partkey": pa.array([1, 1, 2], pa.int64()),
                  "l_suppkey": pa.array([7, 3, 9], pa.int64())}),
        tmp_path / "lineitem.parquet")
    out = min_cost_supplier(str(tmp_path)).to_pandas().set_index("p_partkey")
    assert out.loc[1, "s_name"] == "s3"
    assert out.loc[1, "s_acctbal_cents"] == 1000
    assert out.loc[2, "s_name"] == "s9"


def test_referential_orphans_detects_planted(tmp_path, ray_session):
    from crawl_ray.pipelines.joins import referential_orphans

    pq.write_table(
        pa.table({"c_custkey": pa.array([1], pa.int64())}),
        tmp_path / "customer.parquet")
    pq.write_table(
        pa.table({"p_partkey": pa.array([1, 2], pa.int64())}),
        tmp_path / "part.parquet")
    pq.write_table(
        pa.table({"s_suppkey": pa.array([1], pa.int64())}),
        tmp_path / "supplier.parquet")
    # order 20 references missing customer 9; order 21 is fine
    pq.write_table(
        pa.table({"o_orderkey": pa.array([20, 21], pa.int64()),
                  "o_custkey": pa.array([9, 1], pa.int64())}),
        tmp_path / "orders.parquet")
    # one lineitem references missing order 99 and missing supplier 5
    pq.write_table(
        pa.table({"l_orderkey": pa.array([20, 99], pa.int64()),
                  "l_partkey": pa.array([1, 2], pa.int64()),
                  "l_suppkey": pa.array([1, 5], pa.int64())}),
        tmp_path / "lineitem.parquet")
    out = referential_orphans(str(tmp_path)).to_pandas().set_index("relation")
    assert out.loc["orders.o_custkey->customer", "n_orphans"] == 1
    assert out.loc["lineitem.l_partkey->part", "n_orphans"] == 0
    assert out.loc["lineitem.l_suppkey->supplier", "n_orphans"] == 1
    assert out.loc["lineitem.l_orderkey->orders", "n_orphans"] == 1


def test_cohort_retention_planted(tmp_path, ray_session):
    from crawl_ray.pipelines.stats import cohort_retention

    W = 604_800_000_000
    # user 1: weeks 0 and 2; user 2: week 0 only; user 3: weeks 2 and 3
    rows = [
        (1, 0, 1, "a"), (2, 2 * W, 1, "a"),
        (3, 10, 2, "a"),
        (4, 2 * W, 3, "a"), (5, 3 * W + 5, 3, "a"),
    ]
    d = _events(tmp_path, rows)
    out = cohort_retention(d).to_pandas()
    got = {(r.cohort_week, r.week_offset): r.n_users for r in out.itertuples()}
    assert got == {(0, 0): 2, (0, 2): 1, (2, 0): 1, (2, 1): 1}


def test_trending_window_topk_planted(tmp_path, ray_session):
    from crawl_ray.pipelines.stats import trending_window_topk

    H = 3_600_000_000
    # hour 0: users 1,2,3,4 with values 4,3,2,1 -> top3 = 1,2,3
    rows = [(i, (i - 1) % 4, i, "a") for i in range(1, 5)]
    d = _events(tmp_path, rows)
    import pyarrow as pa_, pyarrow.parquet as pq_
    t = pq_.read_table(f"{d}/events.parquet")
    t = t.set_column(
        t.schema.get_field_index("value"),
        "value", pa_.array([4.0, 3.0, 2.0, 1.0], pa_.float64()),
    )
    pq_.write_table(t, f"{d}/events.parquet")
    out = trending_window_topk(d, k=3).to_pandas()
    assert list(out.user_id) == [1, 2, 3]
    assert list(out.cents) == [400, 300, 200]
    assert (out.window_start == 0).all()


def test_basket_pairs_planted(tmp_path, ray_session):
    from crawl_ray.pipelines.joins import basket_pairs

    # orders: {1,2} x3, {1,3} x1 -> pair (1,2) support 3, (1,3) support 1
    ok = [10, 10, 11, 11, 12, 12, 13, 13]
    pk = [1, 2, 1, 2, 1, 2, 1, 3]
    pq.write_table(
        pa.table({"l_orderkey": pa.array(ok, pa.int64()),
                  "l_partkey": pa.array(pk, pa.int64())}),
        tmp_path / "lineitem.parquet",
    )
    out = basket_pairs(str(tmp_path), min_support=2, k=10).to_pandas()
    assert len(out) == 1
    r = out.iloc[0]
    assert (r.pa, r.pb, r.support) == (1, 2, 3)
    # lift = 1000 * N(4) * s(3) // (c1(4) * c2(3)) = 1000
    assert r.lift_milli == 1000


def test_rfm_segments_planted(tmp_path, ray_session):
    from crawl_ray.pipelines.stats import rfm_segments

    D = 86_400_000_000
    # three users: recent+frequent+rich / middling / old+rare+poor
    rows = [
        (1, 10 * D, 1, "a"), (2, 10 * D, 1, "a"), (3, 10 * D, 1, "a"),
        (4, 5 * D, 2, "a"), (5, 5 * D, 2, "a"),
        (6, 0, 3, "a"),
    ]
    d = _events(tmp_path, rows)
    out = rfm_segments(d).to_pandas().set_index("segment")
    # medians: r_days over {0,5,10}=5, f over {3,2,1}=2, m over {3,2,1}=2
    # user1: r=0<=5, f=3>2, m=300>200 -> R1F1M1
    # user2: r=5<=5, f=2, m=200 (not >) -> R1F0M0
    # user3: r=10, f=1, m=100 -> R0F0M0
    assert out.loc["R1F1M1", "n_users"] == 1
    assert out.loc["R1F0M0", "n_users"] == 1
    assert out.loc["R0F0M0", "n_users"] == 1


def test_knn_graph_approximate_nprobe_path(ray_session):
    """The nprobe < n_lists configuration (the 10^9 approximate path)
    must run end-to-end through the listed edge stage and respect the
    structural bounds: same node universe, per-row degree still capped
    at k (so |E| ≤ n·k undirected-unioned), non-empty output.  (The
    edge SET legitimately differs from exact — each row ranks within
    its probed lists only, substituting, not dropping, neighbors.)"""
    sf = "/root/testdata/sf0.001"
    exact = SIM.knn_graph_stats(sf).to_pandas().iloc[0]
    approx = SIM.knn_graph_stats(
        sf, small_n_max=0, n_lists=4, nprobe=2
    ).to_pandas().iloc[0]
    assert approx.n_nodes == exact.n_nodes
    assert 0 < approx.n_edges <= approx.n_nodes * 10
    assert approx.n_wedges > 0
