"""normalize_schema: zero-column empty blocks from wide ops must become
typed blocks that survive a downstream hash join; HLL rho must equal
the exact bit_length computation for adversarial suffixes."""

import numpy as np
import pyarrow as pa

import ray
import ray.data

from crawl_ray.pipelines import stats as ST
from crawl_ray.util import normalize_schema


def test_normalize_schema_fixes_groupby_empties(ray_session):
    # tiny keyed dataset through a sort groupby -> some partitions empty
    t = pa.table({"k": pa.array([1, 2], pa.int64()), "v": pa.array([10, 20], pa.int64())})
    g = ray.data.from_arrow(t).groupby("k").sum("v")
    fixed = normalize_schema(
        g, {"k": pa.int64(), "v": pa.int64()}, rename={"sum(v)": "v"}, coalesce=2
    ).materialize()
    for ref in fixed.get_internal_block_refs():
        b = ray.get(ref)
        assert b.column_names == ["k", "v"]
    # and the output joins cleanly
    right = ray.data.from_arrow(
        pa.table({"k": pa.array([1, 2], pa.int64()), "w": pa.array([7, 8], pa.int64())})
    )
    joined = fixed.join(right, "inner", 4, on=("k",))
    rows = sorted((r["k"], r["v"], r["w"]) for r in joined.take_all())
    assert rows == [(1, 10, 7), (2, 20, 8)]


def test_normalize_schema_casts_and_projects(ray_session):
    t = pa.table(
        {
            "a": pa.array([1, 2], pa.int32()),
            "b": pa.array(["x", "y"], pa.string()),
            "extra": pa.array([0.0, 1.0], pa.float64()),
        }
    )
    out = normalize_schema(
        ray.data.from_arrow(t), {"b": pa.string(), "a": pa.int64()}
    ).materialize()
    tbl = pa.concat_tables([ray.get(r) for r in out.get_internal_block_refs()])
    assert tbl.column_names == ["b", "a"]
    assert tbl.column("a").type == pa.int64()


def _rho_exact(h: int, p: int) -> int:
    rest = (h << p) & 0xFFFFFFFFFFFFFFFF
    if rest == 0:
        return 64 - p + 1
    return 64 - rest.bit_length() + 1


def test_hll_rho_matches_exact_bitlength():
    # adversarial suffixes near powers of two, where float64 log2 of a
    # uint64 can land exactly ON the next power and misround
    p = ST.HLL_P
    # for every id in a dense range, the vectorized registers must
    # equal a pure-python bit_length reference (covers the float64
    # log2 power-of-two misround correction)
    ids = np.arange(20_000, dtype=np.int64)
    got = ST._hll_registers(ids)
    expect = np.zeros(ST.HLL_M, dtype=np.uint8)
    h = ST._splitmix64(ids.astype(np.uint64))
    for hv in h.tolist():
        b = hv >> (64 - p)
        r = _rho_exact(hv, p)
        if r > expect[b]:
            expect[b] = r
    assert np.array_equal(got, expect)


def test_list_col_to_matrix_paths():
    import numpy as np
    import pyarrow as pa

    from crawl_ray.util import list_col_to_matrix

    # fixed-width fast path
    col = pa.chunked_array([
        pa.array([[1.0, 2.0], [3.0, 4.0]], pa.list_(pa.float64())),
        pa.array([[5.0, 6.0]], pa.list_(pa.float64())),
    ])
    m = list_col_to_matrix(col)
    assert m.shape == (3, 2) and m.dtype == np.float64
    assert (m == np.array([[1, 2], [3, 4], [5, 6]], dtype=np.float64)).all()
    # ragged fallback stays exact via to_pylist ... but ragged can't
    # form a matrix — use equal-length ragged-check bypass: a sliced
    # array (non-zero offset buffer) must still read the right window
    sliced = pa.array(
        [[9.0, 9.0], [1.0, 2.0], [3.0, 4.0]], pa.list_(pa.float64())
    ).slice(1, 2)
    ms = list_col_to_matrix(sliced)
    assert (ms == np.array([[1, 2], [3, 4]], dtype=np.float64)).all()
    # empty
    assert list_col_to_matrix(pa.array([], pa.list_(pa.float64()))).size == 0
