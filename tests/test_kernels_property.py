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


# --------------------------------------------- canonicalize fast path


_URL_ATOMS = [
    "http://", "https://", "HTTP://", "a.example", "b.ex", ":8080",
    "/", "p", "1", "..", ".", "//", "?", "q=1", "#", "frag", ";",
    "[", "\t", "\n", " ", "%20", "@", ":", "",
]


def _ref_canon_row(u, ref, req_url):
    """The pre-vectorization per-row kernel, verbatim (spec)."""
    from urllib.parse import urljoin, urlsplit

    u = u or ""
    ref = ref or ""
    try:
        if ref:
            u = urljoin(ref, u)
        frag = u.find("#")
        if frag >= 0:
            u = u[:frag]
        parts = urlsplit(u)
        host = parts.netloc.rpartition("@")[2]  # userinfo stripped
        if not host:
            raise ValueError(f"no host in {u!r}")
        # robots key = path INCLUDING query (RFC 9309) — the rule
        # canonicalize_batch and the simulator both compute
        pathq = (parts.path or "/") + (
            f"?{parts.query}" if parts.query else ""
        )
        return u, host, pathq, "ok"
    except ValueError as exc:
        return req_url, "", str(exc), "badurl"


@settings(max_examples=150, deadline=None)
@given(
    rows=st.lists(
        st.tuples(
            st.lists(st.sampled_from(_URL_ATOMS), max_size=8).map("".join),
            st.lists(st.sampled_from(_URL_ATOMS), max_size=6).map("".join),
        ),
        min_size=1,
        max_size=20,
    )
)
def test_canonicalize_fast_path_matches_per_row(rows):
    from crawl_ray.stages.canonicalize import canonicalize_batch

    batch = pa.table(
        {
            "url": pa.array([r[0] for r in rows], pa.string()),
            "referer": pa.array([r[1] for r in rows], pa.string()),
        }
    )
    out = canonicalize_batch(batch, now_us=0)
    got = list(
        zip(
            out.column("url").to_pylist(),
            out.column("host").to_pylist(),
            out.column("path").to_pylist(),
            out.column("disposition").to_pylist(),
        )
    )
    expect = [_ref_canon_row(u, ref, u or "") for u, ref in rows]
    assert got == expect


# ------------------------------------------------- n-gram construction


@settings(max_examples=80, deadline=None)
@given(
    texts=st.lists(
        st.text(alphabet="ab x", max_size=40), min_size=1, max_size=10
    ),
    n=st.integers(1, 5),
)
def test_gram_arrays_match_naive(texts, n):
    from crawl_ray.pipelines.textops import _gram_arrays, _token_lists

    batch = pa.table(
        {"doc_id": pa.array(range(len(texts)), pa.int64()),
         "text": pa.array(texts, pa.string())}
    )
    _, flat, lens = _token_lists(batch)
    grams, doc_idx = _gram_arrays(flat, lens, n)
    got = list(zip(doc_idx.tolist(), grams.to_pylist()))
    expect = []
    for d, t in enumerate(texts):
        toks = t.strip().split()
        if t.strip() == "":
            toks = [""]  # split_pattern_regex("") yields one empty token
        for i in range(max(len(toks) - n + 1, 0)):
            expect.append((d, " ".join(toks[i : i + n])))
    assert got == expect


# --------------------------------------------- Misra-Gries heavy hitters


@settings(max_examples=80, deadline=None)
@given(
    tokens=st.lists(st.sampled_from("abcdefgh"), min_size=1, max_size=200),
    capacity=st.integers(2, 8),
    split=st.integers(1, 5),
)
def test_mg_merge_guarantees(tokens, capacity, split):
    """Per-block MG summaries merged + trimmed keep every count within
    n/capacity of truth (lower bound), and are exact when distinct ≤
    capacity."""
    from collections import Counter

    from crawl_ray.pipelines.textops import _mg_trim

    blocks = [tokens[i::split] for i in range(split)]
    partial_terms, partial_counts = [], []
    for blk in blocks:
        if not blk:
            continue
        c = Counter(blk)
        t = np.array(sorted(c), dtype=object)
        cnt = np.array([c[x] for x in t], dtype=np.int64)
        t, cnt = _mg_trim(t, cnt, capacity)
        partial_terms.append(t)
        partial_counts.append(cnt)
    allc = Counter()
    for t, cnt in zip(partial_terms, partial_counts):
        for term, k in zip(t.tolist(), cnt.tolist()):
            allc[term] += int(k)
    mt = np.array(sorted(allc), dtype=object)
    mc = np.array([allc[x] for x in mt], dtype=np.int64)
    mt, mc = _mg_trim(mt, mc, capacity)
    est = dict(zip(mt.tolist(), mc.tolist()))
    true = Counter(tokens)
    n = len(tokens)
    for term, cnt in true.items():
        got = est.get(term, 0)
        assert got <= cnt  # lower bound
        assert cnt - got <= n / capacity + 1e-9
    if len(true) <= capacity:
        assert est == dict(true)


# ------------------------------------------------------- Bloom filter


@settings(max_examples=60, deadline=None)
@given(
    present=st.sets(st.integers(0, 1_000_000), max_size=150),
    probes=st.lists(st.integers(0, 1_000_000), max_size=150),
    split=st.integers(1, 4),
)
def test_bloom_no_false_negatives(present, probes, split):
    """Merged per-block bitmaps never miss a present key; absent keys
    are mostly pruned at this load factor."""
    from crawl_ray.pipelines.joins import _bloom_add, _bloom_maybe

    m_bits, k = 1 << 14, 4
    keys = np.array(sorted(present), dtype=np.int64)
    blocks = [keys[i::split] for i in range(split)]
    merged = np.zeros(m_bits // 8, dtype=np.uint8)
    for blk in blocks:
        bits = np.zeros(m_bits // 8, dtype=np.uint8)
        _bloom_add(blk, bits, m_bits, k)
        merged |= bits
    probe = np.array(probes, dtype=np.int64)
    maybe = _bloom_maybe(probe, merged, m_bits, k)
    in_set = np.isin(probe, keys)
    assert (maybe | ~in_set).all()  # present ⇒ maybe (no false negative)
    absent = ~in_set
    if absent.sum() >= 50:  # FP rate sanity at ~1% load
        assert maybe[absent].mean() < 0.5


@settings(max_examples=60, deadline=None)
@given(
    rows=st.lists(
        st.tuples(
            st.integers(0, 4),       # user_id
            st.integers(0, 9),       # ts
            st.integers(-500, 500),  # cents
        ),
        min_size=1,
        max_size=60,
    )
)
def test_lag_kernel_matches_naive(rows):
    from crawl_ray.pipelines.streams import _lag_kernel

    uid = np.array([r[0] for r in rows], dtype=np.int64)
    ts = np.array([r[1] for r in rows], dtype=np.int64)
    cents = np.array([r[2] for r in rows], dtype=np.int64)
    eid = np.arange(len(rows), dtype=np.int64)
    ouid, ots, oeid, ocents, oprev = _lag_kernel(uid, ts, eid, cents)
    got = dict(zip(oeid.tolist(), oprev.tolist()))

    order = sorted(range(len(rows)), key=lambda i: (uid[i], ts[i], i))
    last: dict[int, int] = {}
    for i in order:
        assert got[i] == last.get(int(uid[i]), 0)
        last[int(uid[i])] = int(cents[i])


@given(
    rows=st.lists(
        st.tuples(
            st.integers(0, 5),        # user
            st.integers(0, 50),       # ts (duplicates likely)
            st.integers(-1, 2),       # kind: -1 other, 0 view, 1 click, 2 purchase
        ),
        min_size=1,
        max_size=60,
    )
)
@settings(max_examples=200, deadline=None)
def test_funnel_kernel_matches_naive(rows):
    """The masked-reduceat funnel kernel ≡ the obvious per-user loop
    (first view, first click strictly after it, first purchase strictly
    after that)."""
    from crawl_ray.pipelines.streams import _funnel_kernel

    uid = np.array([r[0] for r in rows], dtype=np.int64)
    ts = np.array([r[1] for r in rows], dtype=np.int64)
    kind = np.array([r[2] for r in rows], dtype=np.int64)

    users, stage = _funnel_kernel(uid.copy(), ts.copy(), kind.copy())
    got = dict(zip(users.tolist(), stage.tolist()))

    expect = {}
    for u in sorted(set(uid.tolist())):
        evs = sorted((t, k) for uu, t, k in rows if uu == u)
        t1 = min((t for t, k in evs if k == 0), default=None)
        st_ = 0
        if t1 is not None:
            st_ = 1
            t2 = min((t for t, k in evs if k == 1 and t > t1), default=None)
            if t2 is not None:
                st_ = 2
                t3 = min((t for t, k in evs if k == 2 and t > t2), default=None)
                if t3 is not None:
                    st_ = 3
        expect[u] = st_
    assert got == expect


@given(
    n=st.integers(200, 2000),
    seed=st.integers(0, 10_000),
)
@settings(max_examples=30, deadline=None)
def test_kll_sketch_rank_error_bounded(n, seed):
    """Deterministic-KLL rank error under heavy compaction stays well
    inside the coarse n/4 envelope, and with capacity ≥ n the sketch
    is exactly the ceil(q·n)−1 order statistic."""
    from crawl_ray.pipelines.stats import _kll_compact

    rng = np.random.RandomState(seed)
    data = rng.randint(-10_000, 10_000, size=n).astype(np.int64)

    def query(levels, pct):
        vals = np.concatenate(levels)
        wts = np.concatenate(
            [np.full(len(v), 1 << L, dtype=np.int64)
             for L, v in enumerate(levels)]
        )
        o = np.argsort(vals, kind="stable")
        vals, wts = vals[o], wts[o]
        cum = np.cumsum(wts)
        W = int(cum[-1])
        rank = max(-(-pct * W // 100) - 1, 0)
        return int(vals[np.searchsorted(cum, rank + 1)])

    exact_sorted = np.sort(data)
    # exact regime
    big = _kll_compact([data.copy()], cap=4 * n)
    for pct in (25, 50, 90):
        rank = max(-(-pct * n // 100) - 1, 0)
        assert query(big, pct) == int(exact_sorted[rank])
    # compacting regime: capacity 64 → bounded rank error
    small = _kll_compact([data.copy()], cap=64)
    assert sum(len(v) for v in small) <= 64 * len(small)
    for pct in (25, 50, 90):
        est = query(small, pct)
        true_rank = np.searchsorted(exact_sorted, est, side="left")
        assert abs(true_rank - pct * n // 100) <= n // 4
