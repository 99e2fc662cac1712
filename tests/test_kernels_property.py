"""Hypothesis property tests for the pure (Ray-free) vectorized
kernels added for the window / sampling / minhash operators — each is
checked against an obviously-correct naive Python reference."""

import numpy as np
import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from crawl_ray.pipelines import dedup as D
from crawl_ray.pipelines.streams import ROLLING_WINDOW, _rolling_kernel
from crawl_ray.pipelines.textops import _lang_topk

# ---------------------------------------------------------------- rolling


@settings(max_examples=60, deadline=None)
@given(
    rows=st.lists(
        st.tuples(
            st.integers(0, 4),        # user_id
            st.integers(0, 9),        # ts
            st.integers(-500, 500),   # cents
        ),
        min_size=1,
        max_size=60,
    ),
    w=st.integers(1, 5),
)
def test_rolling_kernel_matches_naive(rows, w):
    uid = np.array([r[0] for r in rows], dtype=np.int64)
    ts = np.array([r[1] for r in rows], dtype=np.int64)
    cents = np.array([r[2] for r in rows], dtype=np.int64)
    eid = np.arange(len(rows), dtype=np.int64)  # unique tie-break
    out_uid, out_ts, out_eid, roll = _rolling_kernel(uid, ts, eid, cents, w)
    got = dict(zip(out_eid.tolist(), roll.tolist()))

    order = sorted(range(len(rows)), key=lambda i: (uid[i], ts[i], eid[i]))
    per_user: dict[int, list[int]] = {}
    for i in order:
        hist = per_user.setdefault(int(uid[i]), [])
        hist.append(int(cents[i]))
        assert got[int(eid[i])] == sum(hist[-w:])


def test_rolling_window_constant_is_three():
    assert ROLLING_WINDOW == 3  # oracle SQL says ROWS BETWEEN 2 PRECEDING


# ---------------------------------------------------------- lang top-k


@settings(max_examples=60, deadline=None)
@given(
    rows=st.lists(
        st.tuples(
            st.sampled_from(["en", "de", "fr"]),
            st.integers(0, 30),  # doc_id (dups allowed: rank ties by id)
            st.integers(0, 7),   # h
        ),
        min_size=1,
        max_size=50,
    ),
    k=st.integers(1, 4),
)
def test_lang_topk_matches_naive(rows, k):
    t = pa.table(
        {
            "doc_id": pa.array([r[1] for r in rows], pa.int64()),
            "lang": pa.array([r[0] for r in rows], pa.string()),
            "h": pa.array([r[2] for r in rows], pa.int64()),
        }
    )
    out = _lang_topk(t, k)
    got = sorted(
        zip(
            out.column("lang").to_pylist(),
            out.column("doc_id").to_pylist(),
            out.column("rk").to_pylist(),
        )
    )
    expect = []
    for lang in {r[0] for r in rows}:
        members = sorted(
            [(r[2], r[1]) for r in rows if r[0] == lang]
        )[:k]
        expect.extend((lang, d, i + 1) for i, (_, d) in enumerate(members))
    assert got == sorted(expect)


# ------------------------------------------------------- minhash batch


@settings(max_examples=40, deadline=None)
@given(
    texts=st.lists(
        st.text(alphabet="ab x", max_size=30),
        min_size=1,
        max_size=12,
    ),
    k=st.integers(2, 4),
)
def test_batch_sign_matches_per_doc(texts, k):
    a, b = D._minhash_params(8)
    flat, counts = D._shingle_windows_flat(texts, k)
    assert len(flat) == counts.sum()
    starts = np.r_[0, np.cumsum(counts)[:-1]]
    with np.errstate(over="ignore"):
        vals = (flat[None, :] ^ b[:, None]) * a[:, None]
    sigs = np.minimum.reduceat(vals, starts, axis=1).T
    for i, t in enumerate(texts):
        ref = D._signature(D._shingle_hashes(t, k), a, b)
        assert (sigs[i] == ref).all()
