"""Small shared helpers."""

from __future__ import annotations

import pyarrow as pa

import ray

__all__ = [
    "collect_table", "collect_table_typed", "normalize_schema",
    "rename_select", "list_col_to_matrix", "round_half_away",
]


def round_half_away(x):
    """DuckDB-compatible rounding (numpy's ``round`` is half-to-even) —
    the ONE definition of the oracle-parity milli quantization; callers
    do ``round_half_away(cos * 1000).astype(np.int64)``.

    NOT ``floor(abs+0.5)``: adding 0.5 double-rounds at representability
    boundaries (0.49999999999999994 + 0.5 == 1.0 in binary64, while
    std::round — DuckDB's ROUND — returns 0).  ``abs(x) - floor(abs(x))``
    is EXACT for doubles below 2^52 (both values share the ulp grid),
    so comparing the fractional part against 0.5 reproduces half-away
    exactly."""
    import numpy as np

    ax = np.abs(x)
    fl = np.floor(ax)
    return np.sign(x) * np.where(ax - fl >= 0.5, fl + 1, fl)


def rename_select(t: pa.Table, cols: dict[str, str]) -> pa.Table:
    """Project + rename BY NAME, output order = dict order.

    For ``group_by().aggregate()`` outputs: pyarrow's column order is
    keys-first on the pinned 16.x but has differed across versions — a
    positional ``rename_columns`` there would silently mislabel columns
    rather than error (ADVICE r2).  ``t.column(old)`` raises KeyError on
    a missing name, so a reorder becomes a loud failure."""
    return pa.table({new: t.column(old) for old, new in cols.items()})


def normalize_schema(
    ds,
    schema: dict[str, "pa.DataType"],
    rename: dict | None = None,
    coalesce: int | None = None,
):
    """Re-emit blocks with exactly the given columns/types.

    Ray's sort-based ``groupby`` and the hash join emit ZERO-COLUMN
    empty blocks for empty partitions; feeding those into a later
    ``Dataset.join`` fails in the aggregator's Arrow join
    (``ArrowInvalid: No match … for key field reference``), and
    ``map_batches`` alone cannot fix them — Ray short-circuits empty
    blocks past the UDF.  Pass ``coalesce=n`` to ``repartition(n)``
    first (merges the schema-less empties into typed blocks); then the
    projection map renames (e.g. ``{"sum(x)": "x"}``) and casts
    zero-copy.  Use between any wide op and a join over its output."""
    if coalesce:
        ds = ds.repartition(coalesce)
    empty = pa.table({k: pa.array([], t) for k, t in schema.items()})

    def fix(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return empty
        if rename:
            b = b.rename_columns([rename.get(c, c) for c in b.column_names])
        return pa.table({k: b.column(k).cast(t) for k, t in schema.items()})

    return ds.map_batches(fix, batch_format="pyarrow", zero_copy_batch=True)


def collect_table(ds) -> pa.Table:
    """Materialize a (small!) Dataset to one Arrow table on the caller.

    Only for bounded results (aggregates, top-k, per-round outputs) —
    never call on a full-corpus dataset.

    Fetches block refs via ``iter_internal_ref_bundles`` instead of
    ``to_arrow_refs``: the latter's trailing ``schema(fetch_if_missing=
    True)`` launches a SECOND ``limit=1`` execution of the whole plan
    (despite executing it once already) — wasted work for every
    bounded query, and actively destructive for pipelines with
    side-effecting tasks (the limit operator cancels the re-run
    mid-write; see sources/export.py)."""
    if isinstance(ds, pa.Table):
        return ds
    refs = [
        r for bundle in ds.iter_internal_ref_bundles() for r in bundle.block_refs
    ]
    tables = ray.get(refs)
    tables = [
        t if isinstance(t, pa.Table) else pa.Table.from_pandas(t) for t in tables
    ]
    non_empty = [t for t in tables if t.num_rows]
    if not non_empty:
        return tables[0] if tables else pa.table({})
    return pa.concat_tables(non_empty, promote_options="default").combine_chunks()


def list_col_to_matrix(col, dtype=None) -> "np.ndarray":
    """Fixed-width ``list<float>`` column → 2-D numpy matrix via the
    flat Arrow values buffer (one reshape, no per-row Python objects —
    ``to_pylist`` materializes n×dim PyFloats and is 20-50× slower on
    embedding columns).  Ragged or null-bearing input (list-slot OR
    inner-element nulls) falls back to the ``to_pylist`` path; null
    ELEMENTS become NaN on either path — a valid embedding column has
    none (caller's contract).  ``fixed_size_list`` columns (a common
    external embedding layout) use their rectangular values buffer
    directly."""
    import numpy as np

    if dtype is None:
        dtype = np.float64
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    n = len(arr)
    if n == 0:
        return np.empty((0, 0), dtype=dtype)
    import pyarrow.compute as pc

    if pa.types.is_fixed_size_list(arr.type):
        # fixed_size_list<T>[d] (a common external embedding layout)
        # has no .offsets — the values buffer is already rectangular
        if arr.null_count == 0 and arr.values.null_count == 0:
            flat = arr.values.to_numpy(zero_copy_only=False)
            return np.ascontiguousarray(
                flat.astype(dtype, copy=False).reshape(
                    n, int(arr.type.list_size)
                )
            )
        return np.asarray(arr.to_pylist(), dtype=dtype)
    if arr.null_count == 0 and arr.values.null_count == 0:
        # inner-element nulls ALSO force the exact fallback: the flat
        # buffer would silently read them as NaN
        offs = np.asarray(arr.offsets, dtype=np.int64)
        w = np.diff(offs)
        if w.size and int(w[0]) > 0 and bool((w == w[0]).all()):
            flat = pc.list_flatten(arr).to_numpy(zero_copy_only=False)
            return np.ascontiguousarray(
                flat.astype(dtype, copy=False).reshape(n, int(w[0]))
            )
    return np.asarray(arr.to_pylist(), dtype=dtype)


def collect_table_typed(ds, schema: "dict[str, pa.DataType]") -> pa.Table:
    """``collect_table`` + empty-block schema coercion.

    An all-empty input short-circuits map UDFs (Ray returns the READ
    schema's zero-row block), so driver-side ``group_by``/column reads
    on the collected partials crash with ArrowInvalid.  When expected
    columns are missing on a ZERO-row result, return a typed empty
    table instead; missing columns on a non-empty result are a real
    bug and raise."""
    t = collect_table(ds)
    missing = [c for c in schema if c not in t.column_names]
    if not missing:
        return t
    if t.num_rows:
        raise ValueError(
            f"collected result is missing columns {missing}"
        )
    return pa.table({k: pa.array([], v) for k, v in schema.items()})
