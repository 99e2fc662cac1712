"""Edge-case tests for the round-3 operators whose main gate is the
sf0.01 DuckDB oracle: hand-built inputs exercising tie-breaks, empty
paths, and window semantics."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from crawl_ray.pipelines import joins as J
from crawl_ray.pipelines import stats as ST
from crawl_ray.pipelines import streams as S
from crawl_ray.pipelines import textops as T


def _write(tmp_path, name, table):
    pq.write_table(table, tmp_path / f"{name}.parquet")


def test_top_users_per_type_tiebreak(tmp_path, ray_session):
    """Equal sums at the k boundary: lowest user_id wins, exactly k
    rows per type."""
    _write(tmp_path, "events", pa.table(
        {"event_type": pa.array(["a"] * 6, pa.string()),
         "user_id": pa.array([5, 4, 3, 2, 1, 5], pa.int64()),
         "value": pa.array([1.0, 2.0, 2.0, 2.0, 2.0, 1.0], pa.float64())}
    ))
    out = ST.top_users_per_type(str(tmp_path), k=3).to_pandas()
    # sums: u5=200c, u4=200c, u3=200c, u2=200c, u1=200c → all tied at
    # 200 cents; top-3 = lowest user ids 1,2,3
    assert out["user_id"].tolist() == [1, 2, 3]
    assert out["cents"].tolist() == [200, 200, 200]


def test_events_window_distinct_counts_user_once_per_window(
    tmp_path, ray_session
):
    """Two events of one user inside the same 2h slide bucket must
    count once; the covering-window explode spans 3 windows each."""
    base = 1_600_000_000_000_000  # µs, arbitrary epoch
    base -= base % 7_200_000_000  # align to slide
    _write(tmp_path, "events", pa.table(
        {"ts": pa.array([base + 1, base + 2, base + 3], pa.timestamp("us")),
         "user_id": pa.array([1, 1, 2], pa.int64())}
    ))
    out = S.events_window_distinct(str(tmp_path)).to_pandas()
    # all events in one slide bucket → identical 3 covering windows,
    # each with exactly 2 distinct users
    assert len(out) == 3
    assert out["n_users"].tolist() == [2, 2, 2]


def test_waiting_suppliers_exactly_one_late_rule(tmp_path, ray_session):
    """Order 1: suppliers 1 (late), 2 (on time) → supplier 1 credited.
    Order 2: both late → nobody. Order 3: single supplier late →
    nobody (needs >= 2 suppliers)."""
    day = 86_400_000_000
    t0 = 1_000 * day
    _write(tmp_path, "orders", pa.table(
        {"o_orderkey": pa.array([1, 2, 3], pa.int64()),
         "o_orderdate": pa.array([t0, t0, t0], pa.timestamp("us"))}
    ))
    late = t0 + 91 * day
    ok = t0 + 10 * day
    _write(tmp_path, "lineitem", pa.table(
        {"l_orderkey": pa.array([1, 1, 2, 2, 3], pa.int64()),
         "l_suppkey": pa.array([1, 2, 1, 2, 1], pa.int64()),
         "l_shipdate": pa.array([late, ok, late, late, late],
                                pa.timestamp("us"))}
    ))
    _write(tmp_path, "supplier", pa.table(
        {"s_suppkey": pa.array([1, 2], pa.int64()),
         "s_name": pa.array(["S1", "S2"], pa.string())}
    ))
    out = J.waiting_suppliers(str(tmp_path)).to_pandas()
    assert out.to_dict("records") == [{"s_name": "S1", "numwait": 1}]


def test_fuzzy_decontam_no_contamination_is_typed_empty(
    tmp_path, ray_session
):
    docs = {0: "a b c d e f", 1: "q r s t u v", 7: "x y z w k j"}
    _write(tmp_path, "documents", pa.table(
        {"doc_id": pa.array(sorted(docs), pa.int64()),
         "text": pa.array([docs[i] for i in sorted(docs)], pa.string())}
    ))
    out = T.fuzzy_decontam(str(tmp_path)).to_pandas()
    assert len(out) == 0
    assert list(out.columns) == ["doc_id", "bench_id", "jaccard_milli"]


def test_fuzzy_decontam_flags_paraphrase(tmp_path, ray_session):
    """Doc 3 shares most shingles with bench doc 0 but few exact
    4-grams — the fuzzy pass must flag it with the right best match."""
    bench = "the quick brown fox jumps over the lazy dog again and again"
    toks = bench.split()
    near = " ".join(toks[:6] + ["EDIT"] + toks[6:])
    docs = {0: bench, 3: near, 7: "completely unrelated text about ships"}
    _write(tmp_path, "documents", pa.table(
        {"doc_id": pa.array(sorted(docs), pa.int64()),
         "text": pa.array([docs[i] for i in sorted(docs)], pa.string())}
    ))
    out = T.fuzzy_decontam(str(tmp_path)).to_pandas()
    assert out["doc_id"].tolist() == [3]
    assert out["bench_id"].tolist() == [0]
    assert out["jaccard_milli"].iloc[0] >= 300


def test_small_quantity_revenue_exact_threshold(tmp_path, ray_session):
    """qty < 0.2·avg strictly: part 1 has qtys [1, 9] (avg 5, cutoff
    1.0) → qty 1 is NOT below 0.2·avg (1*5*2 == 10 == s); part 2 has
    [1, 100] → qty 1 qualifies (1*5*2=10 < 101)."""
    _write(tmp_path, "lineitem", pa.table(
        {"l_partkey": pa.array([1, 1, 2, 2], pa.int64()),
         "l_quantity": pa.array([1.0, 9.0, 1.0, 100.0], pa.float64()),
         "l_extendedprice": pa.array([10.0, 10.0, 7.0, 9.0], pa.float64())}
    ))
    _write(tmp_path, "part", pa.table(
        {"p_partkey": pa.array([1, 2], pa.int64()),
         "p_brand": pa.array(["B1", "B2"], pa.string())}
    ))
    out = J.small_quantity_revenue(str(tmp_path)).to_pandas()
    assert out.to_dict("records") == [
        {"p_brand": "B2", "small_qty_revenue_cc": 700}
    ]
