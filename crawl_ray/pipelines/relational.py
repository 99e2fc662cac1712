"""Relational operator pipelines over the driver's star-schema tables.

These prove the engine's Ray Data operator mappings (SURVEY.md §2.5-2.8:
groupby-aggregate with partial pre-aggregation, broadcast join, sort /
top-k, windowed aggregate, per-group top-1) against DuckDB oracles.

Float policy: every aggregated money/value column is converted to exact
integer cents *before* summing (``sum(round(x*100)::bigint)``), so the
result is associative and byte-equal regardless of partial-sum order —
Ray's parallel combine and DuckDB's serial sum agree exactly.

Scale notes: each aggregation pre-combines inside ``map_batches`` (one
partial row per key per block) before the small shuffle; joins broadcast
the small side via ``ray.put`` instead of shuffling the big side.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data

from crawl_ray.util import collect_table

__all__ = [
    "pricing_summary",
    "revenue_filter",
    "top_orders",
    "orders_per_nation",
    "events_by_type",
    "events_hourly_window",
    "top_order_per_segment",
    "daily_revenue_running",
]


def _read(sf_dir: str, name: str, columns: list[str] | None = None):
    return ray.data.read_parquet(f"{sf_dir}/{name}.parquet", columns=columns)


def _cents(arr: pa.ChunkedArray | pa.Array) -> pa.Array:
    # half_towards_infinity matches DuckDB's round(); Arrow's default
    # (half_to_even) would diverge on exact .5 boundaries
    return pc.cast(
        pc.round(pc.multiply(arr, pa.scalar(100.0)), round_mode="half_towards_infinity"),
        pa.int64(),
    )


def _dense_names(keys: np.ndarray, names: list) -> np.ndarray:
    """key → name as a dense object array for vectorized take (keys are
    small ints by TPC-H construction)."""
    arr = np.empty(int(keys.max()) + 1 if len(keys) else 0, dtype=object)
    arr[keys] = names
    return arr


def partial_then_final_sum(
    ds: ray.data.Dataset,
    keys: list[str],
    int_exprs: dict[str, "callable"],
    count_name: str | None = None,
) -> pa.Table:
    """Combiner pattern: per-batch Arrow group_by partial aggregation in
    parallel tasks, then the final combine over the partials **on the
    driver** (SURVEY.md §4.2 'push aggregation partial').  The partials
    are ≤ |keys| rows per block — collecting them is O(keys × blocks)
    regardless of input size, so no shuffle runs at all (a Ray Data
    groupby over the partials costs seconds of all-to-all fixed overhead
    to combine a few hundred rows)."""

    def partial(batch: pa.Table) -> pa.Table:
        cols = {k: batch.column(k) for k in keys}
        for name, expr in int_exprs.items():
            cols[name] = expr(batch)
        if count_name:
            cols[count_name] = pa.array(np.ones(batch.num_rows, dtype=np.int64))
        t = pa.table(cols)
        aggs = [(name, "sum") for name in int_exprs]
        if count_name:
            aggs.append((count_name, "sum"))
        out = t.group_by(keys).aggregate(aggs)
        renames = {f"{name}_sum": name for name, _ in aggs}
        return out.rename_columns([renames.get(c, c) for c in out.column_names])

    partials = collect_table(
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    )
    value_names = list(int_exprs) + ([count_name] if count_name else [])
    if partials.num_rows == 0 and any(
        k not in partials.column_names for k in keys
    ):
        # all-empty input: Ray short-circuits empty blocks past the
        # partial UDF, so the lone empty block keeps the SOURCE schema
        # — synthesize the result schema instead of KeyError-ing
        cols = {}
        for k in keys:
            t = (partials.schema.field(k).type
                 if k in partials.column_names else pa.string())
            cols[k] = pa.array([], t)
        for name in value_names:
            cols[name] = pa.array([], pa.int64())
        return pa.table(cols)
    aggs = [(name, "sum") for name in value_names]
    out = partials.group_by(keys).aggregate(aggs)
    renames = {f"{name}_sum": name for name in value_names}
    return out.rename_columns([renames.get(c, c) for c in out.column_names])


def pricing_summary(sf_dir: str):
    """TPC-H Q1 shape: lineitem pricing summary by returnflag/linestatus."""
    ds = _read(
        sf_dir,
        "lineitem",
        ["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice", "l_discount"],
    )
    agg = partial_then_final_sum(
        ds,
        ["l_returnflag", "l_linestatus"],
        {
            "sum_qty_cents": lambda b: _cents(b.column("l_quantity")),
            "sum_base_price_cents": lambda b: _cents(b.column("l_extendedprice")),
            "sum_disc_cents": lambda b: _cents(b.column("l_discount")),
        },
        count_name="count_order",
    )
    return agg.sort_by([("l_returnflag", "ascending"), ("l_linestatus", "ascending")])


def revenue_filter(sf_dir: str):
    """TPC-H Q6 shape: single-row filtered revenue aggregate."""
    ds = _read(sf_dir, "lineitem", ["l_quantity", "l_extendedprice", "l_discount"])

    def partial(batch: pa.Table) -> pa.Table:
        mask = pc.and_(
            pc.and_(
                pc.greater_equal(batch.column("l_discount"), 0.05),
                pc.less_equal(batch.column("l_discount"), 0.07),
            ),
            pc.less(batch.column("l_quantity"), 24.0),
        )
        sel = batch.filter(mask)
        rev = pc.multiply(sel.column("l_extendedprice"), sel.column("l_discount"))
        cents = pc.sum(
            pc.cast(
                pc.round(pc.multiply(rev, 100.0), round_mode="half_towards_infinity"),
                pa.int64(),
            )
        )
        return pa.table(
            {
                "revenue_cents": pa.array([cents.as_py() or 0], pa.int64()),
                "n_rows": pa.array([sel.num_rows], pa.int64()),
            }
        )

    partials = collect_table(
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    )
    return pa.table(
        {
            "revenue_cents": pa.array(
                [pc.sum(partials.column("revenue_cents")).as_py() or 0], pa.int64()
            ),
            "n_rows": pa.array(
                [pc.sum(partials.column("n_rows")).as_py() or 0], pa.int64()
            ),
        }
    )


def top_orders(sf_dir: str, k: int = 10):
    """Global top-k by value: sort desc + limit (O3)."""
    ds = _read(sf_dir, "orders", ["o_orderkey", "o_totalprice"])
    top = ds.sort(["o_totalprice", "o_orderkey"], descending=[True, False]).limit(k)
    t = collect_table(top)

    return pa.table(
        {
            "o_orderkey": t.column("o_orderkey").cast(pa.int64()),
            "total_cents": _cents(t.column("o_totalprice")),
        }
    )


def orders_per_nation(sf_dir: str):
    """orders ⋈ customer ⋈ nation with both small sides broadcast
    (ray.put once, read zero-copy in every task — J2 pattern)."""
    customer = collect_table(_read(sf_dir, "customer", ["c_custkey", "c_nationkey"]))
    nation = collect_table(_read(sf_dir, "nation", ["n_nationkey", "n_name"]))
    cust_key = customer.column("c_custkey").to_numpy()
    cust_nation = customer.column("c_nationkey").to_numpy()
    order = np.argsort(cust_key)
    lookup_ref = ray.put(
        {
            "cust_sorted": cust_key[order],
            "nation_of_cust": cust_nation[order],
            "nation_names_arr": _dense_names(
                nation.column("n_nationkey").to_numpy(),
                nation.column("n_name").to_pylist(),
            ),
        }
    )

    def annotate(batch: pa.Table) -> pa.Table:
        lk = ray.get(lookup_ref)
        keys = batch.column("o_custkey").to_numpy()
        if batch.num_rows and not len(lk["cust_sorted"]):
            # empty customer table: clip to -1 would silently index the
            # end — fail with the FK diagnostic instead of IndexError
            raise ValueError("orders.o_custkey not in customer: "
                             "customer table is empty")
        pos = np.searchsorted(lk["cust_sorted"], keys)
        pos = np.clip(pos, 0, len(lk["cust_sorted"]) - 1)
        # FK integrity guard: a custkey missing from customer would
        # silently bind to a neighbor's nation — fail loudly instead
        if not np.array_equal(lk["cust_sorted"][pos], keys):
            missing = keys[lk["cust_sorted"][pos] != keys]
            raise ValueError(f"orders.o_custkey not in customer: {missing[:5]}")
        nk = lk["nation_of_cust"][pos]
        # dense numpy take, not a per-row dict lookup (nation keys are
        # small ints; this runs per order row on the hot path)
        names = lk["nation_names_arr"][nk]
        # FK integrity guard: a nationkey GAP inside 0..max reads the
        # dense array's None filler — fail loudly like the custkey
        # guard above, never emit null n_name rows
        if len(names):
            bad = np.equal(names, None)
            if bad.any():
                raise ValueError(
                    "customer.c_nationkey not in nation: "
                    f"{np.unique(nk[bad])[:5]}"
                )
        return pa.table(
            {
                "n_name": pa.array(names, pa.string()),
                "total_cents": _cents(batch.column("o_totalprice")),
            }
        )

    ds = _read(sf_dir, "orders", ["o_custkey", "o_totalprice"])
    annotated = ds.map_batches(annotate, batch_format="pyarrow", zero_copy_batch=True)
    agg = partial_then_final_sum(
        annotated, ["n_name"], {"revenue_cents": lambda b: b.column("total_cents")},
        count_name="n_orders",
    )
    return agg.sort_by("n_name")


def events_by_type(sf_dir: str):
    ds = _read(sf_dir, "events", ["event_type", "value"])
    agg = partial_then_final_sum(
        ds,
        ["event_type"],
        {"sum_value_cents": lambda b: _cents(b.column("value"))},
        count_name="n_events",
    )
    return agg.sort_by("event_type")


def events_hourly_window(sf_dir: str):
    """Tumbling 1-hour window aggregate (streaming-window analog,
    SURVEY.md §2.9): groupby (event_type, hour bucket)."""
    ds = _read(sf_dir, "events", ["event_type", "ts", "value"])

    def add_window(batch: pa.Table) -> pa.Table:
        us = batch.column("ts").cast(pa.int64())
        hour = pc.multiply(pc.divide(us, 3_600_000_000), 3_600_000_000)
        return pa.table(
            {
                "event_type": batch.column("event_type"),
                "window_start": hour.cast(pa.int64()),
                "value_cents": _cents(batch.column("value")),
            }
        )

    windowed = ds.map_batches(add_window, batch_format="pyarrow", zero_copy_batch=True)
    agg = partial_then_final_sum(
        windowed,
        ["event_type", "window_start"],
        {"sum_value_cents": lambda b: b.column("value_cents")},
        count_name="n_events",
    )
    return agg.sort_by([("event_type", "ascending"), ("window_start", "ascending")])


def top_order_per_segment(sf_dir: str):
    """Per-group top-1 (window-rank analog): highest-value order per
    customer market segment, via groupby.map_groups."""
    customer = collect_table(_read(sf_dir, "customer", ["c_custkey", "c_mktsegment"]))
    ck = customer.column("c_custkey").to_numpy()
    order = np.argsort(ck)
    seg_ref = ray.put(
        {
            "cust_sorted": ck[order],
            "segment": np.array(customer.column("c_mktsegment").to_pylist())[order],
        }
    )

    def annotate(batch: pa.Table) -> pa.Table:
        lk = ray.get(seg_ref)
        keys = batch.column("o_custkey").to_numpy()
        if batch.num_rows and not len(lk["cust_sorted"]):
            raise ValueError("orders.o_custkey not in customer: "
                             "customer table is empty")
        pos = np.clip(np.searchsorted(lk["cust_sorted"], keys), 0, len(lk["cust_sorted"]) - 1)
        if not np.array_equal(lk["cust_sorted"][pos], keys):
            missing = keys[lk["cust_sorted"][pos] != keys]
            raise ValueError(f"orders.o_custkey not in customer: {missing[:5]}")
        return pa.table(
            {
                "c_mktsegment": pa.array(lk["segment"][pos].tolist(), pa.string()),
                "o_orderkey": batch.column("o_orderkey").cast(pa.int64()),
                "total_cents": _cents(batch.column("o_totalprice")),
            }
        )

    def top1(group: pa.Table) -> pa.Table:
        idx = pc.sort_indices(
            group,
            sort_keys=[("total_cents", "descending"), ("o_orderkey", "ascending")],
        )
        return group.take(idx[:1])

    ds = _read(sf_dir, "orders", ["o_custkey", "o_orderkey", "o_totalprice"])
    out = (
        ds.map_batches(annotate, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("c_mktsegment")
        .map_groups(top1, batch_format="pyarrow")
    )
    return out.sort("c_mktsegment")


def daily_revenue_running(sf_dir: str):
    """Cumulative window aggregate (``sum() OVER (ORDER BY day)``):
    running total-price cents by order day.  The distributed part is
    the bounded per-day partial sum (day-count keys, not row keys); the
    prefix scan runs on the driver over the bounded day table — the
    right split for any cumulative-by-time report at 100 TB (a day
    count grows with the calendar, not the data)."""
    ds = _read(sf_dir, "orders", ["o_orderdate", "o_totalprice"])
    DAY_US = 86_400_000_000

    def per_day(batch: pa.Table) -> pa.Table:
        us = batch.column("o_orderdate").cast(pa.timestamp("us")).cast(pa.int64())
        return pa.table(
            {
                "day_us": pc.multiply(
                    pc.divide(us, pa.scalar(DAY_US, pa.int64())),
                    pa.scalar(DAY_US, pa.int64()),
                ),
                "cents": _cents(batch.column("o_totalprice")),
            }
        )

    agg = partial_then_final_sum(
        ds.map_batches(per_day, batch_format="pyarrow", zero_copy_batch=True),
        ["day_us"],
        {"day_cents": lambda b: b.column("cents")},
        count_name="n_orders",
    )
    days = agg.column("day_us").to_numpy(zero_copy_only=False)
    cents = agg.column("day_cents").to_numpy(zero_copy_only=False)
    n = agg.column("n_orders").to_numpy(zero_copy_only=False)
    order = np.argsort(days)
    running = np.cumsum(cents[order].astype(object))
    return pa.table(
        {
            "day_us": pa.array(days[order], pa.int64()),
            "n_orders": pa.array(n[order], pa.int64()),
            "day_cents": pa.array(cents[order], pa.int64()),
            "running_cents": pa.array(
                [int(x) for x in running], pa.int64()
            ),
        }
    )
