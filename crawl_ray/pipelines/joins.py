"""Big-big shuffle joins (TPC-H Q3/Q10 shapes) over the star-schema
tables, built on Ray Data's native hash join (``Dataset.join``).

Everything else in the repo joins by broadcasting a small side
(``relational.orders_per_nation``) or by co-partitioned bucket lookup
(the page store, ``sources/pages.py``).  This module covers the third
join shape a 100-TB engine needs: **both sides frontier-sized**, so
neither fits in one worker and the join must hash-partition both inputs
(`num_partitions` aggregator actors, each holding one key range).

Scale notes:

* Filters are applied and columns projected **before** the join on both
  sides — the shuffle moves only surviving rows of the needed columns.
* The small dimension lookups that remain (filtered customer-segment
  keys in Q3, customer names in Q10) are broadcast once via ``ray.put``;
  at 100 TB those would be either another hash join or a Bloom-filter
  semi-join — the swap is a one-line change and is documented per site.
* ``num_partitions`` defaults to 2× the cluster CPU count so each
  aggregator's partition stays well under the object-store block
  target; at real scale size it to ``input_bytes / target_block_size``.
* Post-join per-key aggregation pre-combines inside ``map_batches``
  (one row per key per block) before the final ``groupby`` shuffle, so
  the second exchange carries partial sums, not raw joined rows.

Float policy matches ``relational``: revenue is computed in exact
integer **centi-cents** (``cents(price) × (100 − cents(discount))``),
so parallel partial sums are associative and byte-equal to the DuckDB
oracle's serial bigint sum.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data

from crawl_ray.pipelines.relational import _cents, _read, partial_then_final_sum
from crawl_ray.util import collect_table, normalize_schema, rename_select

__all__ = [
    "unshipped_orders",
    "returned_revenue_by_customer",
    "customers_without_urgent_orders",
    "events_price_band_join",
    "orders_with_returns",
    "promo_revenue_by_month",
    "regional_revenue",
    "orders_bloom_semi",
    "customer_order_counts",
    "large_volume_orders",
    "nations_trade_volume",
    "small_quantity_revenue",
    "idle_customer_balance",
    "waiting_suppliers",
    "top_supplier_revenue",
    "disjunctive_part_revenue",
    "market_share",
    "order_priority_check",
    "late_shipment_priority",
    "part_type_supplier_counts",
    "dominant_part_suppliers",
    "product_profit",
    "min_cost_supplier",
    "important_parts",
    "referential_orphans",
    "basket_pairs",
]

# Q3 cutoff: orders placed before, lineitems shipped after
CUTOFF_US = 900_288_000_000_000  # 1998-07-13T00:00:00Z in µs


def _default_partitions() -> int:
    # each hash-join partition is a long-lived aggregator ACTOR holding
    # a CPU slot: partitions must stay well under the CPU count or the
    # aggregators starve the map tasks feeding them (measured 171 s vs
    # 10 s at sf0.1/32 CPUs for 64 vs 8 partitions).  cpus/4 leaves 3/4
    # of the box for the producer stages; at real scale raise it only
    # with the cluster size, never past input_bytes/target_block_size.
    cpus = int(ray.cluster_resources().get("CPU", 8))
    return max(4, cpus // 4)


def _cjoin(left, right, join_type, num_partitions, on, right_on=None,
           coalesce_left=True):
    """Native hash join with block-coalesced inputs: Ray's join pays
    per-input-block overhead in its partitioning stage (same shape as
    the sort-shuffle), so narrow-merging each side's many small
    projected blocks to ~num_partitions first is a measured 2-4x win
    at sf0.1/32 (Q14's join stage ran 31s raw vs 7s coalesced in one
    window; ~3.9s vs ~1.7s warm).  The repartition is a streaming
    narrow pass over the already-projected streams — volume
    proportional to the join's own exchange, never the raw input.
    Pass ``coalesce_left=False`` when the left side was just emitted
    by ``normalize_schema(..., coalesce=num_partitions)`` — a second
    repartition of the same stream is a pure waste pass."""
    if coalesce_left:
        left = left.repartition(num_partitions)
    return left.join(
        right.repartition(num_partitions),
        join_type,
        num_partitions,
        on=on,
        right_on=right_on,
    )


def _revenue_cc(batch: pa.Table) -> pa.Array:
    """Exact integer centi-cents: cents(extendedprice) × (100 − cents(discount))."""
    price_c = _cents(batch.column("l_extendedprice"))
    disc_c = _cents(batch.column("l_discount"))
    return pc.multiply(price_c, pc.subtract(pa.scalar(100, pa.int64()), disc_c))


def unshipped_orders(sf_dir: str, k: int = 10, num_partitions: int | None = None):
    """TPC-H Q3 shape: top-k revenue among orders from BUILDING-segment
    customers placed before the cutoff whose lineitems shipped after it.

    lineitem ⋈ orders is a native hash join (both sides big); the
    filtered customer-key set is a broadcast semi-join (keys only — at
    100 TB swap for a Bloom filter or a second hash join)."""
    num_partitions = num_partitions or _default_partitions()

    cust = collect_table(_read(sf_dir, "customer", ["c_custkey", "c_mktsegment"]))
    keys = cust.filter(pc.equal(cust.column("c_mktsegment"), "BUILDING")).column(
        "c_custkey"
    ).to_numpy()
    if len(keys) == 0:
        # Ray's hash join loses the schema of an all-empty side — and an
        # empty key set means an empty result anyway, so short-circuit
        return pa.table(
            {
                "o_orderkey": pa.array([], pa.int64()),
                "o_orderdate_us": pa.array([], pa.int64()),
                "o_orderpriority": pa.array([], pa.string()),
                "revenue_cc": pa.array([], pa.int64()),
            }
        )
    keys_ref = ray.put(np.sort(keys))

    def orders_side(batch: pa.Table) -> pa.Table:
        date_us = batch.column("o_orderdate").cast(pa.int64())
        batch = batch.filter(pc.less(date_us, pa.scalar(CUTOFF_US, pa.int64())))
        ck = batch.column("o_custkey").to_numpy()
        sorted_keys = ray.get(keys_ref)
        pos = np.searchsorted(sorted_keys, ck)
        pos_c = np.minimum(pos, len(sorted_keys) - 1) if len(sorted_keys) else pos
        mask = (
            sorted_keys[pos_c] == ck if len(sorted_keys) else np.zeros(len(ck), bool)
        )
        batch = batch.filter(pa.array(mask))
        return pa.table(
            {
                "o_orderkey": batch.column("o_orderkey").cast(pa.int64()),
                "o_orderdate_us": batch.column("o_orderdate").cast(pa.int64()),
                "o_orderpriority": batch.column("o_orderpriority"),
            }
        )

    orders = _read(
        sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority"]
    ).map_batches(orders_side, batch_format="pyarrow", zero_copy_batch=True)

    def lineitem_side(batch: pa.Table) -> pa.Table:
        ship_us = batch.column("l_shipdate").cast(pa.int64())
        batch = batch.filter(pc.greater(ship_us, pa.scalar(CUTOFF_US, pa.int64())))
        return pa.table(
            {
                "l_orderkey": batch.column("l_orderkey").cast(pa.int64()),
                "revenue_cc": _revenue_cc(batch),
            }
        )

    li = _read(
        sf_dir, "lineitem", ["l_orderkey", "l_extendedprice", "l_discount", "l_shipdate"]
    ).map_batches(lineitem_side, batch_format="pyarrow", zero_copy_batch=True)

    joined = _cjoin(
        li, orders, "inner", num_partitions,
        on=("l_orderkey",), right_on=("o_orderkey",),
    )

    group_keys = ["l_orderkey", "o_orderdate_us", "o_orderpriority"]

    def pre_agg(batch: pa.Table) -> pa.Table:
        out = batch.group_by(group_keys).aggregate([("revenue_cc", "sum")])
        return out.rename_columns(
            [c if c != "revenue_cc_sum" else "revenue_cc" for c in out.column_names]
        )

    # grouping key is per-order (high cardinality) -> distributed
    # groupby over the pre-combined partials, NOT a driver-side merge
    agg = (
        joined.map_batches(pre_agg, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(group_keys)
        .sum("revenue_cc")
    )
    top = agg.sort(
        ["sum(revenue_cc)", "l_orderkey"], descending=[True, False]
    ).limit(k)
    t = collect_table(top)
    return pa.table(
        {
            "o_orderkey": t.column("l_orderkey"),
            "o_orderdate_us": t.column("o_orderdate_us"),
            "o_orderpriority": t.column("o_orderpriority"),
            "revenue_cc": t.column("sum(revenue_cc)"),
        }
    )


def returned_revenue_by_customer(
    sf_dir: str, k: int = 20, num_partitions: int | None = None
):
    """TPC-H Q10 shape: top-k customers by revenue on returned
    lineitems.

    Scale shape — two splitmix exchanges, both smaller than the old
    plan's three (hash join, sort-groupby, global sort-limit):

    1. ``splitmix(orderkey) % P``: lineitem(R) revenue pre-summed per
       orderkey per batch, union-co-partitioned with the orders
       projection; the kernel maps order revenue to custkey and emits
       per-partition (custkey, revenue) partials.
    2. ``splitmix(custkey) % P``: the partials (already ≪ fact-sized)
       re-keyed so each custkey's sum is exact within one partition;
       per-partition exact sums then LOCAL top-k (exact: sums are
       complete per partition), driver merges ≤ P × k rows.

    The c_custkey → c_name resolution scans customer with a broadcast
    k-key filter — never collects the SF-sized customer table on the
    driver (the old plan did)."""
    from crawl_ray.pipelines.stats import _splitmix64

    num_partitions = num_partitions or _default_partitions()
    P = num_partitions

    def li_partial(batch: pa.Table) -> pa.Table:
        batch = batch.filter(pc.equal(batch.column("l_returnflag"), "R"))
        t = pa.table(
            {
                "key": batch.column("l_orderkey").cast(pa.int64()),
                "cc": _revenue_cc(batch),
            }
        )
        agg = t.group_by("key").aggregate([("cc", "sum")])
        ok = agg.column("key").to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "key": pa.array(ok, pa.int64()),
                "cc": agg.column("cc_sum").cast(pa.int64()),
                "part": pa.array(
                    (_splitmix64(ok.astype(np.uint64)) % np.uint64(P)).astype(
                        np.int64
                    ),
                    pa.int64(),
                ),
            }
        )

    def orders_rows(b: pa.Table) -> pa.Table:
        ok = b.column("o_orderkey").to_numpy(zero_copy_only=False).astype(np.int64)
        # custkey rides negated-minus-one so the kernel can split sides
        ck = b.column("o_custkey").to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "key": pa.array(ok, pa.int64()),
                "cc": pa.array(-ck - 1, pa.int64()),
                "part": pa.array(
                    (_splitmix64(ok.astype(np.uint64)) % np.uint64(P)).astype(
                        np.int64
                    ),
                    pa.int64(),
                ),
            }
        )

    _e1 = pa.table(
        {"ck": pa.array([], pa.int64()),
         "cc": pa.array([], pa.int64()),
         "part": pa.array([], pa.int64())}
    )

    def to_cust_partials(group: pa.Table) -> pa.Table:
        if group.num_rows == 0 or "key" not in group.column_names:
            return _e1
        cc = group.column("cc").to_numpy(zero_copy_only=False)
        is_ord = cc < 0
        if not is_ord.any() or is_ord.all():
            return _e1
        key = group.column("key").to_numpy(zero_copy_only=False)
        o_keys = key[is_ord]
        order_ = np.argsort(o_keys)
        o_keys_s = o_keys[order_]
        o_cust_s = (-cc[is_ord] - 1)[order_]
        lk, lcc = key[~is_ord], cc[~is_ord]
        loc = np.searchsorted(o_keys_s, lk)
        hit = (loc < len(o_keys_s)) & (
            o_keys_s[np.minimum(loc, len(o_keys_s) - 1)] == lk
        )
        custs = o_cust_s[loc[hit]]
        vals = lcc[hit]
        uk, inv = np.unique(custs, return_inverse=True)
        sums = np.zeros(len(uk), dtype=np.int64)
        np.add.at(sums, inv, vals)
        return pa.table(
            {
                "ck": pa.array(uk, pa.int64()),
                "cc": pa.array(sums, pa.int64()),
                "part": pa.array(
                    (_splitmix64(uk.astype(np.uint64)) % np.uint64(P)).astype(
                        np.int64
                    ),
                    pa.int64(),
                ),
            }
        )

    _e2 = pa.table(
        {"ck": pa.array([], pa.int64()), "cc": pa.array([], pa.int64())}
    )

    def local_topk(group: pa.Table) -> pa.Table:
        if group.num_rows == 0 or "ck" not in group.column_names:
            return _e2
        ck = group.column("ck").to_numpy(zero_copy_only=False)
        cc = group.column("cc").to_numpy(zero_copy_only=False)
        uk, inv = np.unique(ck, return_inverse=True)
        sums = np.zeros(len(uk), dtype=np.int64)
        np.add.at(sums, inv, cc)
        # exact per-partition top-k: ties broken by smaller custkey
        order_ = np.lexsort((uk, -sums))[:k]
        return pa.table(
            {
                "ck": pa.array(uk[order_], pa.int64()),
                "cc": pa.array(sums[order_], pa.int64()),
            }
        )

    li = _read(
        sf_dir, "lineitem",
        ["l_orderkey", "l_extendedprice", "l_discount", "l_returnflag"],
    ).map_batches(li_partial, batch_format="pyarrow", zero_copy_batch=True)
    orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey"]).map_batches(
        orders_rows, batch_format="pyarrow", zero_copy_batch=True
    )
    merged = collect_table(
        li.union(orders)
        .repartition(P)
        .groupby("part")
        .map_groups(to_cust_partials, batch_format="pyarrow")
        .groupby("part")
        .map_groups(local_topk, batch_format="pyarrow")
    )
    if merged.num_rows == 0 or "ck" not in merged.column_names:
        return pa.table(
            {"c_custkey": pa.array([], pa.int64()),
             "c_name": pa.array([], pa.string()),
             "revenue_cc": pa.array([], pa.int64())}
        )
    mk = merged.column("ck").to_numpy(zero_copy_only=False)
    mv = merged.column("cc").to_numpy(zero_copy_only=False)
    order_ = np.lexsort((mk, -mv))[:k]
    top_keys, top_vals = mk[order_], mv[order_]

    # name lookup: broadcast the k keys, filter the customer scan
    keyset_ref = ray.put(np.sort(top_keys))

    def name_rows(b: pa.Table) -> pa.Table:
        want = ray.get(keyset_ref)
        ck = b.column("c_custkey").to_numpy(zero_copy_only=False).astype(np.int64)
        loc = np.searchsorted(want, ck)
        hit = (loc < len(want)) & (want[np.minimum(loc, len(want) - 1)] == ck)
        kept = b.filter(pa.array(hit))
        return pa.table(
            {
                "c_custkey": kept.column("c_custkey").cast(pa.int64()),
                "c_name": kept.column("c_name").cast(pa.string()),
            }
        )

    names_t = collect_table(
        _read(sf_dir, "customer", ["c_custkey", "c_name"]).map_batches(
            name_rows, batch_format="pyarrow", zero_copy_batch=True
        )
    )
    nk = names_t.column("c_custkey").to_numpy(zero_copy_only=False)
    nn = np.array(names_t.column("c_name").to_pylist(), dtype=object)
    norder = np.argsort(nk)
    nk_s, nn_s = nk[norder], nn[norder]
    pos = np.searchsorted(nk_s, top_keys)
    if len(top_keys) and not np.array_equal(
        nk_s[np.minimum(pos, len(nk_s) - 1)], top_keys
    ):
        raise ValueError("orders.o_custkey not in customer")
    return pa.table(
        {
            "c_custkey": pa.array(top_keys, pa.int64()),
            "c_name": pa.array([nn_s[p] for p in pos], pa.string()),
            "revenue_cc": pa.array(top_vals, pa.int64()),
        }
    )


def customers_without_urgent_orders(sf_dir: str, num_partitions: int | None = None):
    """Distributed anti-join: customers that never placed a 1-URGENT
    order, via the native hash join's ``left_anti`` mode — both sides
    shuffle by key, nothing is broadcast (the right 100-TB shape for
    big∖big set difference).  The right side is filtered and projected
    to the key column before the shuffle."""
    num_partitions = num_partitions or _default_partitions()

    cust = _read(sf_dir, "customer", ["c_custkey", "c_name", "c_acctbal"]).map_batches(
        lambda b: pa.table(
            {
                "c_custkey": b.column("c_custkey").cast(pa.int64()),
                "c_name": b.column("c_name"),
                "acctbal_cents": _cents(b.column("c_acctbal")),
            }
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    orders = _read(sf_dir, "orders", ["o_custkey", "o_orderpriority"]).map_batches(
        lambda b: pa.table(
            {
                "o_custkey": b.filter(
                    pc.equal(b.column("o_orderpriority"), "1-URGENT")
                ).column("o_custkey").cast(pa.int64())
            }
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    anti = _cjoin(
        cust, orders, "left_anti", num_partitions,
        on=("c_custkey",), right_on=("o_custkey",),
    )
    t = collect_table(anti.sort("c_custkey"))
    # explicit schema so an empty result stays typed
    if t.num_rows == 0:
        return pa.table(
            {
                "c_custkey": pa.array([], pa.int64()),
                "c_name": pa.array([], pa.string()),
                "acctbal_cents": pa.array([], pa.int64()),
            }
        )
    return t.select(["c_custkey", "c_name", "acctbal_cents"])


# (band, lo_cents, hi_cents) — upper bound exclusive; last band open-ended
PRICE_BANDS = (
    ("b0_micro", 0, 1_000),
    ("b1_small", 1_000, 5_000),
    ("b2_medium", 5_000, 15_000),
    ("b3_large", 15_000, 40_000),
    ("b4_xlarge", 40_000, 1 << 60),
)


def events_price_band_join(sf_dir: str):
    """Broadcast range join: events binned into value bands by interval
    containment (the classic small-side range join — band boundaries
    broadcast as a sorted array, containment = one ``searchsorted`` per
    batch), then a bounded per-band aggregate.  No shuffle of the big
    side at any point."""
    ds = _read(sf_dir, "events", ["value"])
    bounds = np.array([b[1] for b in PRICE_BANDS], dtype=np.int64)
    names = [b[0] for b in PRICE_BANDS]

    def bin_batch(batch: pa.Table) -> pa.Table:
        cents = _cents(batch.column("value")).to_numpy()
        idx = np.searchsorted(bounds, cents, side="right") - 1
        return pa.table(
            {
                "band": pa.array(np.array(names, dtype=object)[idx], pa.string()),
                "value_cents": pa.array(cents, pa.int64()),
            }
        )

    binned = ds.map_batches(bin_batch, batch_format="pyarrow", zero_copy_batch=True)
    agg = partial_then_final_sum(
        binned,
        ["band"],
        {"sum_value_cents": lambda b: b.column("value_cents")},
        count_name="n_events",
    )
    return agg.sort_by("band")


def orders_with_returns(sf_dir: str, num_partitions: int | None = None):
    """Distributed semi-join: orders with at least one returned lineitem
    (``l_returnflag = 'R'``) — the big∖big EXISTS shape at 100 TB.

    ONE ``splitmix(orderkey) % P`` exchange: returned orderkeys
    (filtered + per-batch deduped before anything moves) ride the same
    shuffle as the order rows (tagged ``total_cents = -1``); the
    partition kernel is a sorted-membership probe.  Output rows are
    sorted within each partition only — the oracle compare is
    order-insensitive, and a global presentation sort of an
    order-sized result would be a second all-to-all for nothing."""
    from crawl_ray.pipelines.stats import _splitmix64

    num_partitions = num_partitions or _default_partitions()
    P = num_partitions

    def orders_rows(b: pa.Table) -> pa.Table:
        ok = b.column("o_orderkey").to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "o_orderkey": pa.array(ok, pa.int64()),
                "total_cents": _cents(b.column("o_totalprice")),
                "part": pa.array(
                    (_splitmix64(ok.astype(np.uint64)) % np.uint64(P)).astype(
                        np.int64
                    ),
                    pa.int64(),
                ),
            }
        )

    def returned_keys(b: pa.Table) -> pa.Table:
        ok = np.unique(
            b.filter(pc.equal(b.column("l_returnflag"), "R"))
            .column("l_orderkey")
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        return pa.table(
            {
                "o_orderkey": pa.array(ok, pa.int64()),
                "total_cents": pa.array(
                    np.full(len(ok), -1, dtype=np.int64), pa.int64()
                ),
                "part": pa.array(
                    (_splitmix64(ok.astype(np.uint64)) % np.uint64(P)).astype(
                        np.int64
                    ),
                    pa.int64(),
                ),
            }
        )

    _empty = pa.table(
        {"o_orderkey": pa.array([], pa.int64()),
         "total_cents": pa.array([], pa.int64())}
    )

    def probe(group: pa.Table) -> pa.Table:
        if group.num_rows == 0 or "o_orderkey" not in group.column_names:
            return _empty
        tc = group.column("total_cents").to_numpy(zero_copy_only=False)
        is_key = tc < 0
        if not is_key.any() or is_key.all():
            return _empty
        ok = group.column("o_orderkey").to_numpy(zero_copy_only=False)
        keys = np.unique(ok[is_key])
        o_ok, o_tc = ok[~is_key], tc[~is_key]
        loc = np.searchsorted(keys, o_ok)
        hit = (loc < len(keys)) & (keys[np.minimum(loc, len(keys) - 1)] == o_ok)
        order_ = np.argsort(o_ok[hit], kind="stable")
        return pa.table(
            {
                "o_orderkey": pa.array(o_ok[hit][order_], pa.int64()),
                "total_cents": pa.array(o_tc[hit][order_], pa.int64()),
            }
        )

    orders = _read(sf_dir, "orders", ["o_orderkey", "o_totalprice"]).map_batches(
        orders_rows, batch_format="pyarrow", zero_copy_batch=True
    )
    returned = _read(sf_dir, "lineitem", ["l_orderkey", "l_returnflag"]).map_batches(
        returned_keys, batch_format="pyarrow", zero_copy_batch=True
    )
    return (
        orders.union(returned)
        .repartition(P)
        .groupby("part")
        .map_groups(probe, batch_format="pyarrow")
    )


def promo_revenue_by_month(sf_dir: str, num_partitions: int | None = None):
    """Q14 shape: monthly promo vs total revenue via a fact⋈dimension
    hash join — lineitem joins part on partkey (both sides shuffle;
    the part dimension scales with SF, so no broadcast), revenue stays
    in exact integer centi-cents, and the month aggregate is the
    bounded combiner (``partial_then_final_sum``), not a second
    shuffle.  Both sums are returned as integers; the ratio is the
    consumer's division."""
    num_partitions = num_partitions or _default_partitions()

    li = _read(
        sf_dir, "lineitem",
        ["l_partkey", "l_shipdate", "l_extendedprice", "l_discount"],
    ).map_batches(
        lambda b: pa.table(
            {
                "l_partkey": b.column("l_partkey").cast(pa.int64()),
                "ym": pc.add(
                    pc.multiply(
                        pc.year(b.column("l_shipdate")).cast(pa.int64()), 100
                    ),
                    pc.month(b.column("l_shipdate")).cast(pa.int64()),
                ),
                "revenue_cc": _revenue_cc(b),
            }
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    pt = _read(sf_dir, "part", ["p_partkey", "p_type"]).map_batches(
        lambda b: pa.table(
            {
                "p_partkey": b.column("p_partkey").cast(pa.int64()),
                "is_promo": pc.equal(b.column("p_type"), "PROMO").cast(pa.int64()),
            }
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    j = _cjoin(
        li, pt, "inner", num_partitions,
        on=("l_partkey",), right_on=("p_partkey",),
    )
    agg = partial_then_final_sum(
        j,
        ["ym"],
        {
            "promo_cc": lambda b: pc.multiply(
                b.column("revenue_cc"), b.column("is_promo")
            ),
            "total_cc": lambda b: b.column("revenue_cc"),
        },
    )
    return agg.sort_by([("ym", "ascending")])


def regional_revenue(
    sf_dir: str, region: str = "ASIA", num_partitions: int | None = None
):
    """Q5 shape: revenue per nation for customers in one region where
    the supplying nation equals the customer nation.

    Scale shape — two LIGHT splitmix exchanges, both region-pruned
    BEFORE any row moves (vs the old plan's two native hash joins
    shipping ALL of lineitem and ALL of customer):

    1. ``splitmix(custkey) % P``: region-filtered customers (~1/5 of
       the table) union-co-partitioned with the orders projection; the
       partition kernel emits (orderkey, cust_nation) for region
       orders only (~1/5 of orders, two int64 columns).
    2. ``splitmix(orderkey) % P``: lineitem partials — supplier nation
       resolved per batch from the broadcast supplier array, rows kept
       only when the supplier nation is IN the region (s_nationkey =
       c_nationkey ∈ region ⇒ safe pre-prune, ~1/5 of the fact), then
       pre-summed per (orderkey, sup_nat) — union-co-partitioned with
       stage 1's output; the kernel matches each order's customer
       nation and emits bounded (nationkey, revenue) partials.

    Driver combine is ≤ P × |region nations| rows; nation names are a
    tiny broadcast dict."""
    import pyarrow.parquet as pq_
    from crawl_ray.pipelines.stats import _splitmix64

    num_partitions = num_partitions or _default_partitions()
    P = num_partitions

    nat = pq_.read_table(f"{sf_dir}/nation.parquet")
    reg = pq_.read_table(f"{sf_dir}/region.parquet")
    rkeys = {
        r["r_regionkey"] for r in reg.to_pylist() if r["r_name"] == region
    }
    nkey_to_name = {
        r["n_nationkey"]: r["n_name"]
        for r in nat.to_pylist()
        if r["n_regionkey"] in rkeys
    }
    region_nats = np.fromiter(nkey_to_name, dtype=np.int64)
    sup = pq_.read_table(
        f"{sf_dir}/supplier.parquet", columns=["s_suppkey", "s_nationkey"]
    )
    skeys = sup.column("s_suppkey").to_numpy(zero_copy_only=False).astype(np.int64)
    snat = np.full(int(skeys.max()) + 1 if len(skeys) else 1, -1, dtype=np.int64)
    snat[skeys] = sup.column("s_nationkey").to_numpy(zero_copy_only=False)
    side_ref = ray.put((snat, region_nats))

    # ---- exchange 1: orderkey -> customer nation, region orders only
    def orders_rows(b: pa.Table) -> pa.Table:
        ck = b.column("o_custkey").to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "key": pa.array(ck, pa.int64()),
                "okey": b.column("o_orderkey").cast(pa.int64()),
                "nat": pa.array(np.full(len(ck), -1, dtype=np.int64), pa.int64()),
                "part": pa.array(
                    (_splitmix64(ck.astype(np.uint64)) % np.uint64(P)).astype(
                        np.int64
                    ),
                    pa.int64(),
                ),
            }
        )

    def cust_rows(b: pa.Table) -> pa.Table:
        ck = b.column("c_custkey").to_numpy(zero_copy_only=False).astype(np.int64)
        cn = b.column("c_nationkey").to_numpy(zero_copy_only=False).astype(np.int64)
        keep = np.isin(cn, region_nats)
        ck, cn = ck[keep], cn[keep]
        return pa.table(
            {
                "key": pa.array(ck, pa.int64()),
                "okey": pa.array(np.full(len(ck), -1, dtype=np.int64), pa.int64()),
                "nat": pa.array(cn, pa.int64()),
                "part": pa.array(
                    (_splitmix64(ck.astype(np.uint64)) % np.uint64(P)).astype(
                        np.int64
                    ),
                    pa.int64(),
                ),
            }
        )

    _e1 = pa.table(
        {"okey": pa.array([], pa.int64()),
         "nat": pa.array([], pa.int64()),
         "cc": pa.array([], pa.int64()),
         "part": pa.array([], pa.int64())}
    )

    def order_nation(group: pa.Table) -> pa.Table:
        if group.num_rows == 0 or "key" not in group.column_names:
            return _e1
        nat_col = group.column("nat").to_numpy(zero_copy_only=False)
        is_cust = nat_col >= 0
        if not is_cust.any() or is_cust.all():
            return _e1
        key = group.column("key").to_numpy(zero_copy_only=False)
        ckeys = key[is_cust]
        order_ = np.argsort(ckeys)
        ckeys_s, cnats_s = ckeys[order_], nat_col[is_cust][order_]
        okeys_ck = key[~is_cust]
        loc = np.searchsorted(ckeys_s, okeys_ck)
        hit = (loc < len(ckeys_s)) & (
            ckeys_s[np.minimum(loc, len(ckeys_s) - 1)] == okeys_ck
        )
        okey = group.column("okey").to_numpy(zero_copy_only=False)[~is_cust][hit]
        onat = cnats_s[loc[hit]]
        return pa.table(
            {
                "okey": pa.array(okey, pa.int64()),
                "nat": pa.array(onat, pa.int64()),
                "cc": pa.array(np.full(len(okey), -1, dtype=np.int64), pa.int64()),
                "part": pa.array(
                    (_splitmix64(okey.astype(np.uint64)) % np.uint64(P)).astype(
                        np.int64
                    ),
                    pa.int64(),
                ),
            }
        )

    order_nat = (
        _read(sf_dir, "orders", ["o_orderkey", "o_custkey"])
        .map_batches(orders_rows, batch_format="pyarrow", zero_copy_batch=True)
        .union(
            _read(sf_dir, "customer", ["c_custkey", "c_nationkey"]).map_batches(
                cust_rows, batch_format="pyarrow", zero_copy_batch=True
            )
        )
        .repartition(P)
        .groupby("part")
        .map_groups(order_nation, batch_format="pyarrow")
    )

    # ---- exchange 2: lineitem partials (region-supplier pruned) ⋈ order_nat
    def li_partial(b: pa.Table) -> pa.Table:
        snat_b, rn = ray.get(side_ref)
        sk = b.column("l_suppkey").to_numpy(zero_copy_only=False).astype(np.int64)
        sup_nat = snat_b[sk]
        keep = np.isin(sup_nat, rn)
        if not keep.any():
            return _e1
        mask = pa.array(keep)
        kept = pa.table(
            {
                "okey": b.column("l_orderkey").cast(pa.int64()).filter(mask),
                "nat": pa.array(sup_nat[keep], pa.int64()),
                "cc": _revenue_cc(b).filter(mask),
            }
        )
        agg = kept.group_by(["okey", "nat"]).aggregate([("cc", "sum")])
        ok = agg.column("okey").to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "okey": pa.array(ok, pa.int64()),
                "nat": agg.column("nat"),
                "cc": agg.column("cc_sum").cast(pa.int64()),
                "part": pa.array(
                    (_splitmix64(ok.astype(np.uint64)) % np.uint64(P)).astype(
                        np.int64
                    ),
                    pa.int64(),
                ),
            }
        )

    _e2 = pa.table(
        {"nat": pa.array([], pa.int64()), "revenue_cc": pa.array([], pa.int64())}
    )

    def nation_revenue(group: pa.Table) -> pa.Table:
        if group.num_rows == 0 or "okey" not in group.column_names:
            return _e2
        cc = group.column("cc").to_numpy(zero_copy_only=False)
        is_ord = cc < 0
        if not is_ord.any() or is_ord.all():
            return _e2
        okey = group.column("okey").to_numpy(zero_copy_only=False)
        nat_col = group.column("nat").to_numpy(zero_copy_only=False)
        o_keys = okey[is_ord]
        order_ = np.argsort(o_keys)
        o_keys_s, o_nats_s = o_keys[order_], nat_col[is_ord][order_]
        lk = okey[~is_ord]
        loc = np.searchsorted(o_keys_s, lk)
        hit = (loc < len(o_keys_s)) & (
            o_keys_s[np.minimum(loc, len(o_keys_s) - 1)] == lk
        )
        cust_nat = np.where(hit, o_nats_s[np.minimum(loc, len(o_keys_s) - 1)], -1)
        l_nat = nat_col[~is_ord]
        keep = hit & (cust_nat == l_nat)
        # exact int64 segment sums (float bincount would round > 2^53)
        kn, kc = l_nat[keep], cc[~is_ord][keep]
        sums = np.zeros(int(kn.max()) + 1 if len(kn) else 1, dtype=np.int64)
        np.add.at(sums, kn, kc)
        nz = np.flatnonzero(sums)
        return pa.table(
            {
                "nat": pa.array(nz.astype(np.int64), pa.int64()),
                "revenue_cc": pa.array(sums[nz], pa.int64()),
            }
        )

    li = _read(
        sf_dir, "lineitem",
        ["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"],
    ).map_batches(li_partial, batch_format="pyarrow", zero_copy_batch=True)
    partials = collect_table(
        li.union(order_nat).repartition(P).groupby("part").map_groups(
            nation_revenue, batch_format="pyarrow"
        )
    )
    if partials.num_rows == 0 or "nat" not in partials.column_names:
        return pa.table(
            {"n_name": pa.array([], pa.string()),
             "revenue_cc": pa.array([], pa.int64())}
        )
    agg = partials.group_by("nat").aggregate([("revenue_cc", "sum")])
    out = pa.table(
        {
            "n_name": pa.array(
                [nkey_to_name[int(k)] for k in agg.column("nat").to_pylist()],
                pa.string(),
            ),
            "revenue_cc": agg.column("revenue_cc_sum").cast(pa.int64()),
        }
    )
    return out.sort_by([("revenue_cc", "descending"), ("n_name", "ascending")])


def _bloom_add(keys: np.ndarray, bits: np.ndarray, m_bits: int, k_hashes: int):
    """Set the Bloom bits for ``keys`` in-place (double hashing,
    Kirsch-Mitzenmacher: position_i = h1 + i*h2 mod m)."""
    from crawl_ray.pipelines.stats import _splitmix64

    h = _splitmix64(keys.astype(np.uint64))
    for i in range(k_hashes):
        with np.errstate(over="ignore"):
            pos = (
                (h + np.uint64(i) * _splitmix64(h)) % np.uint64(m_bits)
            ).astype(np.int64)
        np.bitwise_or.at(bits, pos >> 3, (1 << (pos & 7)).astype(np.uint8))


def _bloom_build(ds, key_col: str, m_bits: int, k_hashes: int):
    """Distributed Bloom-filter build over a key column: each block
    emits its own bitmap (one fixed-size uint8 array), the driver ORs
    them — a commutative bounded combine, the same shape as the HLL
    register merge.  Returns the bitmap for ``ray.put`` broadcast."""
    from crawl_ray.pipelines.stats import _splitmix64

    def block_bits(batch: pa.Table) -> pa.Table:
        keys = batch.column(key_col).to_numpy(zero_copy_only=False).astype(np.uint64)
        bits = np.zeros(m_bits // 8, dtype=np.uint8)
        _bloom_add(keys, bits, m_bits, k_hashes)
        return pa.table({"bits": pa.array([bits.tobytes()], pa.binary())})

    def or_stage(batch: pa.Table) -> pa.Table:
        # intermediate distributed OR: the driver sees ≤ fan_in bitmaps
        # no matter how many blocks the build side has
        acc = np.zeros(m_bits // 8, dtype=np.uint8)
        for blob in batch.column("bits").to_pylist():
            acc |= np.frombuffer(blob, dtype=np.uint8)
        return pa.table({"bits": pa.array([acc.tobytes()], pa.binary())})

    parts = collect_table(
        ds.map_batches(block_bits, batch_format="pyarrow", zero_copy_batch=True)
        .repartition(8)
        .map_batches(or_stage, batch_format="pyarrow", zero_copy_batch=True)
    )
    merged = np.zeros(m_bits // 8, dtype=np.uint8)
    for blob in parts.column("bits").to_pylist():
        merged |= np.frombuffer(blob, dtype=np.uint8)
    return merged


def _bloom_maybe(keys: np.ndarray, bits: np.ndarray, m_bits: int, k_hashes: int):
    """Vectorized membership probe: True = maybe present (FP possible),
    False = definitely absent."""
    from crawl_ray.pipelines.stats import _splitmix64

    h = _splitmix64(keys.astype(np.uint64))
    out = np.ones(len(keys), dtype=bool)
    for i in range(k_hashes):
        with np.errstate(over="ignore"):
            pos = (
                (h + np.uint64(i) * _splitmix64(h)) % np.uint64(m_bits)
            ).astype(np.int64)
        out &= (bits[pos >> 3] & (1 << (pos & 7)).astype(np.uint8)) != 0
    return out


def orders_bloom_semi(
    sf_dir: str, m_bits: int = 1 << 20, k_hashes: int = 4
):
    """The Bloom-filter semi-join the hash-join docstrings promise as
    the 100-TB swap: orders with a returned lineitem, where the
    returned-key set is summarized as a distributed Bloom filter
    (bounded bitmap, OR-combined, broadcast once) instead of being
    shuffled.  The Bloom probe only PRE-filters (false positives
    possible); survivors are verified exactly against the true key set
    — here a broadcast sorted array (the verify side is the Bloom
    survivors only, a tiny fraction of the probe side), at larger
    scales a hash join over the survivors.  Output ≡
    :func:`orders_with_returns` exactly, hence the shared oracle
    shape."""
    returned = _read(
        sf_dir, "lineitem", ["l_orderkey", "l_returnflag"]
    ).map_batches(
        lambda b: pa.table(
            {
                "l_orderkey": b.filter(
                    pc.equal(b.column("l_returnflag"), "R")
                ).column("l_orderkey").cast(pa.int64())
            }
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    bits = _bloom_build(returned, "l_orderkey", m_bits, k_hashes)
    bits_ref = ray.put(bits)
    # exact verify set (bounded here; swap for a hash join over the
    # Bloom survivors when the key set outgrows the object store)
    exact = np.unique(
        collect_table(returned).column("l_orderkey").to_numpy(zero_copy_only=False)
    )
    exact_ref = ray.put(exact)

    def probe(batch: pa.Table) -> pa.Table:
        bset = ray.get(bits_ref)
        keys = batch.column("o_orderkey").to_numpy(zero_copy_only=False).astype(np.int64)
        maybe = _bloom_maybe(keys, bset, m_bits, k_hashes)
        batch = batch.filter(pa.array(maybe))
        if batch.num_rows:  # exact verification of Bloom survivors only
            ex = ray.get(exact_ref)
            keys = batch.column("o_orderkey").to_numpy(zero_copy_only=False)
            pos = np.clip(np.searchsorted(ex, keys), 0, len(ex) - 1)
            batch = batch.filter(pa.array(ex[pos] == keys))
        return pa.table(
            {
                "o_orderkey": batch.column("o_orderkey").cast(pa.int64()),
                "total_cents": _cents(batch.column("o_totalprice")),
            }
        )

    return (
        _read(sf_dir, "orders", ["o_orderkey", "o_totalprice"])
        .map_batches(probe, batch_format="pyarrow", zero_copy_batch=True)
        .sort("o_orderkey")
    )


def customer_order_counts(sf_dir: str, num_partitions: int | None = None):
    """TPC-H Q13 shape: the distribution of customers by how many
    orders they placed — including the zero-order customers (the
    LEFT OUTER in the SQL; reference-side crawl analytics has the same
    shape in "hosts by page count including never-fetched seeds").

    Scale shape — ONE exchange: per-batch order partials
    (``value_counts`` of custkey) and the customer keys (tagged
    ``n = -1``) ride the SAME ``splitmix(custkey) % P`` shuffle; the
    partition kernel sums order partials per key, looks each customer
    key up (absent → 0 — the left-outer zero row), and emits bounded
    (c_count, custdist) partials; the driver combine is over
    ≤ P × max-orders-per-customer rows, never customer-sized.  The
    previous 2-exchange plan (custkey sort-groupby then a left_outer
    hash join) measured ~7 s at sf0.1/32; this plan ~2-3 s.  Orders
    whose custkey has no customer row are dropped, exactly as the
    left-outer-from-customer join drops them."""
    from crawl_ray.pipelines.stats import _splitmix64

    num_partitions = num_partitions or _default_partitions()
    P = num_partitions

    def order_partial(batch: pa.Table) -> pa.Table:
        vc = batch.column("o_custkey").cast(pa.int64()).value_counts()
        keys = vc.field("values").to_numpy(zero_copy_only=False).astype(np.int64)
        part = (_splitmix64(keys.astype(np.uint64)) % np.uint64(P)).astype(np.int64)
        return pa.table(
            {
                "key": pa.array(keys, pa.int64()),
                "n": vc.field("counts").cast(pa.int64()),
                "part": pa.array(part, pa.int64()),
            }
        )

    def cust_rows(batch: pa.Table) -> pa.Table:
        keys = batch.column("c_custkey").to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        part = (_splitmix64(keys.astype(np.uint64)) % np.uint64(P)).astype(np.int64)
        return pa.table(
            {
                "key": pa.array(keys, pa.int64()),
                "n": pa.array(np.full(len(keys), -1, dtype=np.int64), pa.int64()),
                "part": pa.array(part, pa.int64()),
            }
        )

    _empty = pa.table(
        {"c_count": pa.array([], pa.int64()), "custdist": pa.array([], pa.int64())}
    )

    def dist_partial(group: pa.Table) -> pa.Table:
        if group.num_rows == 0 or "key" not in group.column_names:
            return _empty
        key = group.column("key").to_numpy(zero_copy_only=False)
        n = group.column("n").to_numpy(zero_copy_only=False)
        is_cust = n < 0
        ckeys = key[is_cust]
        if not len(ckeys):
            return _empty
        okeys, osums = key[~is_cust], n[~is_cust]
        if len(okeys):
            uk, inv = np.unique(okeys, return_inverse=True)
            sums = np.bincount(inv, weights=osums).astype(np.int64)
            loc = np.searchsorted(uk, ckeys)
            hit = (loc < len(uk)) & (uk[np.minimum(loc, len(uk) - 1)] == ckeys)
            per_cust = np.zeros(len(ckeys), dtype=np.int64)
            per_cust[hit] = sums[loc[hit]]
        else:
            per_cust = np.zeros(len(ckeys), dtype=np.int64)
        cnt = np.bincount(per_cust)
        nz = np.flatnonzero(cnt)
        return pa.table(
            {
                "c_count": pa.array(nz.astype(np.int64), pa.int64()),
                "custdist": pa.array(cnt[nz].astype(np.int64), pa.int64()),
            }
        )

    orders = _read(sf_dir, "orders", ["o_custkey"]).map_batches(
        order_partial, batch_format="pyarrow", zero_copy_batch=True
    )
    cust = _read(sf_dir, "customer", ["c_custkey"]).map_batches(
        cust_rows, batch_format="pyarrow", zero_copy_batch=True
    )
    partials = collect_table(
        orders.union(cust).repartition(P).groupby("part").map_groups(
            dist_partial, batch_format="pyarrow"
        )
    )
    if partials.num_rows == 0 or "c_count" not in partials.column_names:
        return _empty
    dist = rename_select(
        partials.group_by("c_count").aggregate([("custdist", "sum")]),
        {"c_count": "c_count", "custdist_sum": "custdist"},
    )
    return dist.sort_by(
        [("custdist", "descending"), ("c_count", "descending")]
    )


def large_volume_orders(
    sf_dir: str,
    qty_threshold_cents: int = 30_000,
    k: int = 100,
):
    """TPC-H Q18 shape: orders whose total lineitem quantity exceeds a
    threshold, with customer names — the **group-HAVING-then-join**
    plan.  The expensive exchange is the per-orderkey quantity sum
    (orders-sized groupby, fed batch-pre-aggregated partials); the
    HAVING filter collapses it to a tiny survivor set, after which
    nothing else shuffles: survivor orderkeys broadcast once to filter
    orders map-side, the surviving custkeys broadcast once to filter
    customer map-side, and the three tiny pieces join on the driver
    (searchsorted) — the anti-pattern this avoids is hash-joining all
    of orders and customer for a handful of output rows."""

    from crawl_ray.pipelines.stats import _splitmix64

    P = _default_partitions() * 4  # light integer kernels, no actors

    def qty_partial(batch: pa.Table) -> pa.Table:
        t = pa.table(
            {
                "l_orderkey": batch.column("l_orderkey").cast(pa.int64()),
                "q": _cents(batch.column("l_quantity")),
            }
        )
        out = rename_select(
            t.group_by(["l_orderkey"]).aggregate([("q", "sum")]),
            {"l_orderkey": "l_orderkey", "q_sum": "q"},
        )
        part = (
            _splitmix64(
                out.column("l_orderkey").to_numpy(zero_copy_only=False)
                .astype(np.uint64)
            )
            % np.uint64(P)
        ).astype(np.int64)
        return out.append_column("part", pa.array(part, pa.int64()))

    _empty_surv = pa.table(
        {"l_orderkey": pa.array([], pa.int64()),
         "sum_qty_cents": pa.array([], pa.int64())}
    )

    def having(group: pa.Table) -> pa.Table:
        # orderkeys are partition-disjoint: segment sums here are the
        # exact global per-order totals (cheaper than the sort-based
        # groupby this replaced: 6.3 s -> ~2.5 s at sf0.1/32)
        if group.num_rows == 0 or "l_orderkey" not in group.column_names:
            return _empty_surv
        ok = group.column("l_orderkey").to_numpy(zero_copy_only=False)
        q = group.column("q").to_numpy(zero_copy_only=False)
        uok, inv = np.unique(ok, return_inverse=True)
        tot = np.bincount(inv, weights=q.astype(np.float64)).astype(np.int64)
        keep = tot > qty_threshold_cents
        if not keep.any():
            return _empty_surv
        return pa.table(
            {"l_orderkey": pa.array(uok[keep], pa.int64()),
             "sum_qty_cents": pa.array(tot[keep], pa.int64())}
        )

    surv = collect_table(  # HAVING survivors: tiny by construction
        _read(sf_dir, "lineitem", ["l_orderkey", "l_quantity"])
        .map_batches(qty_partial, batch_format="pyarrow", zero_copy_batch=True)
        .repartition(P)
        .groupby("part")
        .map_groups(having, batch_format="pyarrow")
    )
    if surv.num_rows == 0:
        return pa.table(
            {"o_orderkey": pa.array([], pa.int64()),
             "c_name": pa.array([], pa.string()),
             "total_cents": pa.array([], pa.int64()),
             "sum_qty_cents": pa.array([], pa.int64())}
        )
    skeys = np.sort(surv.column("l_orderkey").to_numpy(zero_copy_only=False))
    skeys_ref = ray.put(skeys)

    def filter_by(col: str, keys_ref):
        def f(batch: pa.Table) -> pa.Table:
            keys = ray.get(keys_ref)
            vals = batch.column(col).to_numpy(zero_copy_only=False).astype(np.int64)
            pos = np.clip(np.searchsorted(keys, vals), 0, len(keys) - 1)
            return batch.filter(pa.array(keys[pos] == vals))
        return f

    orders_t = collect_table(
        _read(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_totalprice"])
        .map_batches(filter_by("o_orderkey", skeys_ref), batch_format="pyarrow",
                     zero_copy_batch=True)
    )
    ckeys = np.unique(orders_t.column("o_custkey").to_numpy(zero_copy_only=False))
    ckeys_ref = ray.put(ckeys.astype(np.int64))
    cust_t = collect_table(
        _read(sf_dir, "customer", ["c_custkey", "c_name"])
        .map_batches(filter_by("c_custkey", ckeys_ref), batch_format="pyarrow",
                     zero_copy_batch=True)
    )
    # driver-side assembly over the three bounded pieces
    ok = orders_t.column("o_orderkey").to_numpy(zero_copy_only=False).astype(np.int64)
    oc = orders_t.column("o_custkey").to_numpy(zero_copy_only=False).astype(np.int64)
    sk = surv.column("l_orderkey").to_numpy(zero_copy_only=False)
    sq = surv.column("sum_qty_cents").to_numpy(zero_copy_only=False)
    so = np.argsort(sk)
    sk, sq = sk[so], sq[so]
    qty = sq[np.searchsorted(sk, ok)]
    ck = cust_t.column("c_custkey").to_numpy(zero_copy_only=False).astype(np.int64)
    cn = cust_t.column("c_name").to_numpy(zero_copy_only=False)
    co = np.argsort(ck)
    names = cn[co][np.searchsorted(ck[co], oc)]
    order = np.lexsort((ok, -qty))[:k]
    return pa.table(
        {"o_orderkey": pa.array(ok[order], pa.int64()),
         "c_name": pa.array(names[order], pa.string()),
         "total_cents": _cents(orders_t.column("o_totalprice").take(
             pa.array(order, pa.int64()))),
         "sum_qty_cents": pa.array(qty[order], pa.int64())}
    )


def nations_trade_volume(
    sf_dir: str,
    nation_a: str = "NATION_1",
    nation_b: str = "NATION_2",
    num_partitions: int | None = None,
):
    """TPC-H Q7 shape: shipping volume between two nations by year and
    direction (supplier nation → customer nation, both ways).  Same
    two-chained-hash-join skeleton as :func:`regional_revenue`, with
    the Q7-critical difference that the supplier-nation filter applies
    to lineitem BEFORE the first shuffle (the broadcast supplier →
    nation lookup prunes ~23/25 of the fact table, so the exchanges
    move only qualifying rows); the year is derived from integer µs
    vectorized, and the (supp, cust, year) cells are bounded → driver
    combine, no third shuffle."""
    import pyarrow.parquet as pq_

    num_partitions = num_partitions or _default_partitions()

    nat = pq_.read_table(f"{sf_dir}/nation.parquet")
    name_by_key = {r["n_nationkey"]: r["n_name"] for r in nat.to_pylist()}
    keys_ab = {k for k, v in name_by_key.items() if v in (nation_a, nation_b)}
    sup = pq_.read_table(
        f"{sf_dir}/supplier.parquet", columns=["s_suppkey", "s_nationkey"]
    )
    skeys = sup.column("s_suppkey").to_numpy(zero_copy_only=False).astype(np.int64)
    snat = np.full(int(skeys.max()) + 1, -1, dtype=np.int64)
    snat[skeys] = sup.column("s_nationkey").to_numpy(zero_copy_only=False)
    if not np.isin(snat, np.fromiter(keys_ab, dtype=np.int64)).any():
        # no qualifying supplier ⇒ the filtered lineitem side is ALL
        # empty, and Ray's hash join loses an all-empty side's schema
        # (ArrowInvalid FieldRef) — short-circuit, the result is empty
        return pa.table(
            {"supp_nation": pa.array([], pa.string()),
             "cust_nation": pa.array([], pa.string()),
             "l_year": pa.array([], pa.int64()),
             "revenue_cc": pa.array([], pa.int64())}
        )
    side_ref = ray.put((snat, frozenset(keys_ab)))

    def li_side(batch: pa.Table) -> pa.Table:
        sn, keep_keys = ray.get(side_ref)
        sk = batch.column("l_suppkey").to_numpy(zero_copy_only=False).astype(np.int64)
        nk = sn[np.clip(sk, 0, len(sn) - 1)]
        mask = np.isin(nk, np.fromiter(keep_keys, dtype=np.int64))
        batch = batch.filter(pa.array(mask))
        return pa.table(
            {
                "l_orderkey": batch.column("l_orderkey").cast(pa.int64()),
                "supp_nkey": pa.array(nk[mask], pa.int64()),
                "revenue_cc": _revenue_cc(batch),
            }
        )

    li = _read(
        sf_dir, "lineitem",
        ["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"],
    ).map_batches(li_side, batch_format="pyarrow", zero_copy_batch=True)

    orders = _read(
        sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderdate"]
    ).map_batches(
        lambda b: pa.table(
            {
                "o_orderkey": b.column("o_orderkey").cast(pa.int64()),
                "o_custkey": b.column("o_custkey").cast(pa.int64()),
                "o_us": b.column("o_orderdate").cast(pa.int64()),
            }
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    cust = _read(sf_dir, "customer", ["c_custkey", "c_nationkey"]).map_batches(
        lambda b: pa.table(
            {
                "c_custkey": b.column("c_custkey").cast(pa.int64()),
                "c_nationkey": b.column("c_nationkey").cast(pa.int64()),
            }
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    j1 = normalize_schema(
        _cjoin(
            li, orders, "inner", num_partitions,
            on=("l_orderkey",), right_on=("o_orderkey",),
        ),
        {
            "supp_nkey": pa.int64(),
            "revenue_cc": pa.int64(),
            "o_custkey": pa.int64(),
            "o_us": pa.int64(),
        },
        coalesce=num_partitions,
    )
    j2 = _cjoin(
        j1, cust, "inner", num_partitions,
        on=("o_custkey",), right_on=("c_custkey",),
        coalesce_left=False,  # j1 was just coalesced by normalize_schema
    )
    # integer-key pair filter first (vectorized), names resolved via a
    # nationkey-indexed lookup array on the survivors only
    a_key = next(k for k, v in name_by_key.items() if v == nation_a)
    b_key = next(k for k, v in name_by_key.items() if v == nation_b)
    nname = np.array(
        [name_by_key.get(i, "") for i in range(max(name_by_key) + 1)],
        dtype=object,
    )
    names_ref = ray.put((np.int64(a_key), np.int64(b_key), nname))

    def resolve(batch: pa.Table) -> pa.Table:
        ak, bk, names = ray.get(names_ref)
        sn = batch.column("supp_nkey").to_numpy(zero_copy_only=False).astype(np.int64)
        cn = batch.column("c_nationkey").to_numpy(zero_copy_only=False).astype(np.int64)
        keep = ((sn == ak) & (cn == bk)) | ((sn == bk) & (cn == ak))
        sn, cn = sn[keep], cn[keep]
        us = batch.column("o_us").to_numpy(zero_copy_only=False).astype(np.int64)
        year = (
            us[keep].astype("datetime64[us]").astype("datetime64[Y]")
            .astype(np.int64) + 1970
        )
        return pa.table(
            {
                "supp_nation": pa.array(names[sn].tolist(), pa.string()),
                "cust_nation": pa.array(names[cn].tolist(), pa.string()),
                "l_year": pa.array(year, pa.int64()),
                "revenue_cc": batch.column("revenue_cc").filter(pa.array(keep)),
            }
        )

    cells = j2.map_batches(resolve, batch_format="pyarrow", zero_copy_batch=True)
    agg = partial_then_final_sum(
        cells,
        ["supp_nation", "cust_nation", "l_year"],
        {"revenue_cc": lambda b: b.column("revenue_cc")},
    )
    return agg.sort_by(
        [("supp_nation", "ascending"), ("cust_nation", "ascending"),
         ("l_year", "ascending")]
    )


def small_quantity_revenue(
    sf_dir: str,
    num_partitions: int | None = None,
    shuffle_parts: int = 32,
):
    """TPC-H Q17 shape: revenue from lineitems whose quantity is below
    0.2× their part's average quantity, per brand — the
    correlated-scalar-subquery plan, collapsed to ONE shuffle.

    Because the filter depends only on ``(part, quantity)`` given the
    part's stats, lineitem pre-combines per batch to
    ``(partkey, qty_c) → (Σprice, count)`` rows (few distinct
    quantities per part ⇒ the shuffle carries a fraction of lineitem);
    ONE partkey-keyed partition shuffle then co-locates each part's
    rows, so the average and the small-quantity filter are pure
    vectorized segment ops — no self-join back to lineitem at all.
    The surviving per-part revenue joins the part dimension natively
    (part-sized ⋈ part-sized) for the brand, and the brand rollup is
    the bounded combiner.  The exact integer test ``qty_c·5·n < s``
    ≡ ``qty < 0.2·avg`` (no float division to diverge from the
    oracle)."""
    num_partitions = num_partitions or _default_partitions()
    P = shuffle_parts

    def lq_partial(b: pa.Table) -> pa.Table:
        t = pa.table(
            {
                "pk": b.column("l_partkey").cast(pa.int64()),
                "qty_c": _cents(b.column("l_quantity")),
                "price_c": _cents(b.column("l_extendedprice")),
                "cnt": pa.array(np.ones(b.num_rows, np.int64)),
            }
        )
        out = rename_select(
            t.group_by(["pk", "qty_c"]).aggregate(
                [("price_c", "sum"), ("cnt", "sum")]
            ),
            {"pk": "pk", "qty_c": "qty_c", "price_c_sum": "price_c",
             "cnt_sum": "cnt"},
        )
        part = (
            out.column("pk").to_numpy(zero_copy_only=False) % P
        ).astype(np.int64)
        return out.append_column("part", pa.array(part, pa.int64()))

    _empty_rev = pa.table(
        {"pk": pa.array([], pa.int64()),
         "rev": pa.array([], pa.int64())}
    )

    def per_part(group: pa.Table) -> pa.Table:
        pk = group.column("pk").to_numpy(zero_copy_only=False)
        qty = group.column("qty_c").to_numpy(zero_copy_only=False)
        ps = group.column("price_c").to_numpy(zero_copy_only=False)
        ct = group.column("cnt").to_numpy(zero_copy_only=False)
        upk, inv = np.unique(pk, return_inverse=True)
        s = np.bincount(inv, weights=qty * ct).astype(np.int64)
        n = np.bincount(inv, weights=ct).astype(np.int64)
        keep = qty * 5 * n[inv] < s[inv]
        if not keep.any():
            return _empty_rev
        rev = np.bincount(
            inv[keep], weights=ps[keep], minlength=len(upk)
        ).astype(np.int64)
        hit = np.bincount(inv[keep], minlength=len(upk)) > 0
        return pa.table(
            {"pk": pa.array(upk[hit], pa.int64()),
             "rev": pa.array(rev[hit], pa.int64())}
        )

    per_part_rev = normalize_schema(
        _read(
            sf_dir, "lineitem",
            ["l_partkey", "l_quantity", "l_extendedprice"],
        )
        .map_batches(lq_partial, batch_format="pyarrow", zero_copy_batch=True)
        .repartition(num_partitions)
        .groupby("part")
        .map_groups(per_part, batch_format="pyarrow"),
        {"pk": pa.int64(), "rev": pa.int64()},
        coalesce=num_partitions,
    )
    pt = _read(sf_dir, "part", ["p_partkey", "p_brand"]).map_batches(
        lambda b: pa.table(
            {
                "p_partkey": b.column("p_partkey").cast(pa.int64()),
                "p_brand": b.column("p_brand"),
            }
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    j = _cjoin(
        per_part_rev, pt, "inner", num_partitions,
        on=("pk",), right_on=("p_partkey",),
        coalesce_left=False,  # upstream already coalesced to num_partitions
    )
    return partial_then_final_sum(
        j, ["p_brand"],
        {"small_qty_revenue_cc": lambda b: b.column("rev")},
    )



def idle_customer_balance(
    sf_dir: str,
    cutoff_us: int = 915_148_800_000_000,  # 1999-01-01T00:00:00Z
    num_partitions: int | None = None,
):
    """TPC-H Q22 shape: above-average-balance customers with NO orders
    since the cutoff, rolled up per nation — global-scalar subquery +
    distributed anti-join.

    The global average is two integers (sum and count of positive
    balances, combined from bounded batch partials) compared exactly
    (``bal_c·n > s`` ≡ ``bal > avg``); the NOT EXISTS is the native
    ``left_anti`` hash join against the date-filtered, key-projected
    orders column (both sides shuffle — big∖big, nothing broadcast);
    the nation rollup is the bounded combiner, with the filter fused
    into the partial stage so an all-empty anti-join result (schema
    lost by the join) degrades to the typed empty table."""
    num_partitions = num_partitions or _default_partitions()

    cust = _read(
        sf_dir, "customer", ["c_custkey", "c_nationkey", "c_acctbal"]
    ).map_batches(
        lambda b: pa.table(
            {
                "c_custkey": b.column("c_custkey").cast(pa.int64()),
                "c_nationkey": b.column("c_nationkey").cast(pa.int64()),
                "bal_c": _cents(b.column("c_acctbal")),
            }
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )

    def pos_partial(batch: pa.Table) -> pa.Table:
        bal = batch.column("bal_c").to_numpy(zero_copy_only=False)
        p = bal[bal > 0]
        return pa.table(
            {"s": pa.array([int(p.sum())], pa.int64()),
             "n": pa.array([len(p)], pa.int64())}
        )

    pos = collect_table(
        cust.map_batches(pos_partial, batch_format="pyarrow")
    )
    s = int(pc.sum(pos.column("s")).as_py() or 0)
    n = int(pc.sum(pos.column("n")).as_py() or 0)
    empty = pa.table(
        {"c_nationkey": pa.array([], pa.int64()),
         "bal_cc": pa.array([], pa.int64()),
         "n_cust": pa.array([], pa.int64())}
    )
    if n == 0:
        return empty

    okeys = _read(sf_dir, "orders", ["o_custkey", "o_orderdate"]).map_batches(
        lambda b: pa.table(
            {
                "o_custkey": b.filter(
                    pc.greater_equal(
                        b.column("o_orderdate").cast(pa.int64()),
                        pa.scalar(cutoff_us, pa.int64()),
                    )
                ).column("o_custkey").cast(pa.int64())
            }
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    anti = _cjoin(
        cust, okeys, "left_anti", num_partitions,
        on=("c_custkey",), right_on=("o_custkey",),
    )

    def rich_partial(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or "bal_c" not in batch.column_names:
            return empty
        bal = batch.column("bal_c").to_numpy(zero_copy_only=False)
        keep = pa.array(bal * n > s)
        t = pa.table(
            {
                "c_nationkey": batch.column("c_nationkey").filter(keep),
                "bal_cc": batch.column("bal_c").filter(keep),
                "n_cust": pa.array(
                    np.ones(int(pc.sum(keep).as_py() or 0), np.int64)
                ),
            }
        )
        return rename_select(
            t.group_by(["c_nationkey"]).aggregate(
                [("bal_cc", "sum"), ("n_cust", "sum")]
            ),
            {"c_nationkey": "c_nationkey", "bal_cc_sum": "bal_cc",
             "n_cust_sum": "n_cust"},
        )

    partials = collect_table(
        anti.map_batches(rich_partial, batch_format="pyarrow")
    )
    if partials.num_rows == 0 or "c_nationkey" not in partials.column_names:
        return empty
    return rename_select(
        partials.group_by(["c_nationkey"]).aggregate(
            [("bal_cc", "sum"), ("n_cust", "sum")]
        ),
        {"c_nationkey": "c_nationkey", "bal_cc_sum": "bal_cc",
         "n_cust_sum": "n_cust"},
    )


def waiting_suppliers(
    sf_dir: str,
    late_after_us: int = 7_776_000_000_000,  # 90 days
    num_partitions: int | None = None,
    shuffle_parts: int = 32,
):
    """TPC-H Q21 shape: suppliers who were the ONLY late supplier of a
    multi-supplier order (lateness = shipped more than 90 days after
    the order date, adapted to this schema's columns) — the
    exists/not-exists double-correlation, expressed as one per-order
    set analysis.

    Plan: ONE exchange total — per-batch lineitem pre-combines to
    max(ship) per (order, supplier) and rides the SAME
    ``splitmix(orderkey) % P`` shuffle as the orders projection
    (tagged ``l_suppkey = -1``); inside each partition every order's
    pair rows AND its orderdate are co-located, so the date resolve,
    the multi-supplier / exactly-one-late test and the culprit
    extraction are pure vectorized segment ops (searchsorted +
    np.unique + bincount, never per-order Python).  Per-supplier
    partial counts are suppliers×P-bounded → driver combine; names
    come from the dimension read, not a join.  (Replaced the previous
    4-exchange plan — native li⋈orders join, two sort shuffles, name
    join — measured 5.5 s → ~2 s at sf0.1/32.)"""
    from crawl_ray.pipelines.stats import _splitmix64

    num_partitions = num_partitions or _default_partitions()
    P = shuffle_parts

    def li_partial(b: pa.Table) -> pa.Table:
        # only the LATEST shipment per (order, supplier) can decide
        # "any lineitem late", so pre-combine to max(ship) per pair —
        # the exchange carries distinct pairs per batch
        t = pa.table(
            {
                "l_orderkey": b.column("l_orderkey").cast(pa.int64()),
                "l_suppkey": b.column("l_suppkey").cast(pa.int64()),
                "ship_us": b.column("l_shipdate").cast(pa.int64()),
            }
        )
        out = rename_select(
            t.group_by(["l_orderkey", "l_suppkey"]).aggregate(
                [("ship_us", "max")]
            ),
            {"l_orderkey": "l_orderkey", "l_suppkey": "l_suppkey",
             "ship_us_max": "ship_us"},
        )
        part = (
            _splitmix64(
                out.column("l_orderkey").to_numpy(zero_copy_only=False)
                .astype(np.uint64)
            )
            % np.uint64(P)
        ).astype(np.int64)
        return out.append_column("part", pa.array(part, pa.int64()))

    def orders_side(b: pa.Table) -> pa.Table:
        ok = b.column("o_orderkey").to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        part = (
            _splitmix64(ok.astype(np.uint64)) % np.uint64(P)
        ).astype(np.int64)
        return pa.table(
            {
                "l_orderkey": pa.array(ok, pa.int64()),
                "l_suppkey": pa.array(
                    np.full(len(ok), -1, dtype=np.int64), pa.int64()
                ),
                "ship_us": b.column("o_orderdate").cast(pa.int64()),
                "part": pa.array(part, pa.int64()),
            }
        )

    li = _read(
        sf_dir, "lineitem", ["l_orderkey", "l_suppkey", "l_shipdate"]
    ).map_batches(li_partial, batch_format="pyarrow", zero_copy_batch=True)
    orders = _read(
        sf_dir, "orders", ["o_orderkey", "o_orderdate"]
    ).map_batches(orders_side, batch_format="pyarrow", zero_copy_batch=True)

    _empty_counts = pa.table(
        {"l_suppkey": pa.array([], pa.int64()),
         "numwait": pa.array([], pa.int64())}
    )

    def per_order(group: pa.Table) -> pa.Table:
        if group.num_rows == 0 or "l_suppkey" not in group.column_names:
            return _empty_counts
        is_dim = pc.equal(group.column("l_suppkey"), pa.scalar(-1, pa.int64()))
        dim = group.filter(is_dim)
        li_rows = group.filter(pc.invert(is_dim))
        if dim.num_rows == 0 or li_rows.num_rows == 0:
            return _empty_counts
        dok = dim.column("l_orderkey").to_numpy(zero_copy_only=False)
        ddate = dim.column("ship_us").to_numpy(zero_copy_only=False)
        dorder = np.argsort(dok)
        dok_s, ddate_s = dok[dorder], ddate[dorder]
        ok = li_rows.column("l_orderkey").to_numpy(zero_copy_only=False)
        sk = li_rows.column("l_suppkey").to_numpy(zero_copy_only=False)
        ship = li_rows.column("ship_us").to_numpy(zero_copy_only=False)
        loc = np.searchsorted(dok_s, ok)
        hit = (loc < len(dok_s)) & (dok_s[np.minimum(loc, len(dok_s) - 1)] == ok)
        ok, sk, ship, loc = ok[hit], sk[hit], ship[hit], loc[hit]
        lt = (ship > ddate_s[loc] + late_after_us).astype(np.int64)
        # collapse to distinct (order, supplier): late if ANY row late
        # (pairs may repeat across input blocks)
        pairs, idx = np.unique(
            np.stack([ok, sk], axis=1), axis=0, return_inverse=True
        )
        late_any = np.zeros(len(pairs), np.int64)
        np.maximum.at(late_any, idx, lt)
        po, ps = pairs[:, 0], pairs[:, 1]
        _, oinv, ocnt = np.unique(po, return_inverse=True, return_counts=True)
        nlate = np.bincount(oinv, weights=late_any).astype(np.int64)
        qual = (ocnt >= 2) & (nlate == 1)
        keep = qual[oinv] & (late_any == 1)
        if not keep.any():
            return _empty_counts
        us, cnt = np.unique(ps[keep], return_counts=True)
        return pa.table(
            {"l_suppkey": pa.array(us, pa.int64()),
             "numwait": pa.array(cnt.astype(np.int64), pa.int64())}
        )

    counts = collect_table(  # bounded: ≤ suppliers × P rows
        li.union(orders).repartition(P).groupby("part").map_groups(
            per_order, batch_format="pyarrow"
        )
    )
    if counts.num_rows == 0 or "l_suppkey" not in counts.column_names:
        return pa.table(
            {"s_name": pa.array([], pa.string()),
             "numwait": pa.array([], pa.int64())}
        )
    sk = counts.column("l_suppkey").to_numpy(zero_copy_only=False)
    nw = counts.column("numwait").to_numpy(zero_copy_only=False)
    us, inv = np.unique(sk, return_inverse=True)
    tot = np.bincount(inv, weights=nw.astype(np.float64)).astype(np.int64)
    import pyarrow.parquet as pq_

    sup = pq_.read_table(
        f"{sf_dir}/supplier.parquet", columns=["s_suppkey", "s_name"]
    )
    sup_k = sup.column("s_suppkey").to_numpy(zero_copy_only=False).astype(
        np.int64
    )
    sup_n = np.array(sup.column("s_name").to_pylist(), dtype=object)
    so = np.argsort(sup_k)
    names = sup_n[so][np.searchsorted(sup_k[so], us)]
    return pa.table(
        {"s_name": pa.array(names.tolist(), pa.string()),
         "numwait": pa.array(tot, pa.int64())}
    )

def top_supplier_revenue(
    sf_dir: str,
    ship_lo: str = "1996-01-01",
    ship_hi: str = "1996-07-01",
):
    """TPC-H Q15 shape: the supplier(s) with the maximum lineitem
    revenue over a shipdate window — the **view-then-correlated-max**
    plan.  The only corpus-sized work is the per-suppkey revenue sum,
    which pre-combines per batch (supplier is a dimension, so partials
    are bounded) and finishes with the repo's no-shuffle
    ``partial_then_final_sum`` driver combine; the max filter and the
    name join then touch only the bounded revenue table.  Ties on the
    max all survive, as in the spec."""
    lo_us = np.datetime64(ship_lo, "us").astype(np.int64)
    hi_us = np.datetime64(ship_hi, "us").astype(np.int64)

    def in_window(batch: pa.Table) -> pa.Table:
        ship = batch.column("l_shipdate").cast(pa.int64())
        mask = pc.and_(
            pc.greater_equal(ship, pa.scalar(lo_us, pa.int64())),
            pc.less(ship, pa.scalar(hi_us, pa.int64())),
        )
        batch = batch.filter(mask)
        return pa.table(
            {
                "s_suppkey": batch.column("l_suppkey").cast(pa.int64()),
                "revenue_cc": _revenue_cc(batch),
            }
        )

    cells = _read(
        sf_dir, "lineitem",
        ["l_suppkey", "l_shipdate", "l_extendedprice", "l_discount"],
    ).map_batches(in_window, batch_format="pyarrow", zero_copy_batch=True)
    rev = partial_then_final_sum(
        cells, ["s_suppkey"], {"revenue_cc": lambda b: b.column("revenue_cc")}
    )
    if rev.num_rows == 0:
        return pa.table(
            {"s_suppkey": pa.array([], pa.int64()),
             "s_name": pa.array([], pa.string()),
             "total_revenue_cc": pa.array([], pa.int64())}
        )
    best = pc.max(rev.column("revenue_cc"))
    winners = rev.filter(pc.equal(rev.column("revenue_cc"), best))
    wkeys = np.sort(
        winners.column("s_suppkey").to_numpy(zero_copy_only=False)
    )
    wkeys_ref = ray.put(wkeys)

    def pick_names(batch: pa.Table) -> pa.Table:
        keys = ray.get(wkeys_ref)
        sk = batch.column("s_suppkey").to_numpy(zero_copy_only=False).astype(np.int64)
        pos = np.clip(np.searchsorted(keys, sk), 0, len(keys) - 1)
        return batch.filter(pa.array(keys[pos] == sk))

    names = collect_table(
        _read(sf_dir, "supplier", ["s_suppkey", "s_name"]).map_batches(
            pick_names, batch_format="pyarrow", zero_copy_batch=True
        )
    )
    nk = names.column("s_suppkey").to_numpy(zero_copy_only=False).astype(np.int64)
    nn = names.column("s_name").to_numpy(zero_copy_only=False)
    no = np.argsort(nk)
    wk = winners.column("s_suppkey").to_numpy(zero_copy_only=False)
    order = np.argsort(wk)
    wk = wk[order]
    wrev = winners.column("revenue_cc").to_numpy(zero_copy_only=False)[order]
    return pa.table(
        {
            "s_suppkey": pa.array(wk, pa.int64()),
            "s_name": pa.array(nn[no][np.searchsorted(nk[no], wk)], pa.string()),
            "total_revenue_cc": pa.array(wrev, pa.int64()),
        }
    )


# (brand, size_lo, size_hi, qty_lo, qty_hi) — the Q19 disjunct shape
Q19_DISJUNCTS: list[tuple[str, int, int, int, int]] = [
    ("Brand#12", 1, 5, 1, 11),
    ("Brand#23", 1, 10, 10, 20),
    ("Brand#3", 1, 15, 20, 30),
]


def disjunctive_part_revenue(
    sf_dir: str,
    disjuncts: list[tuple[str, int, int, int, int]] | None = None,
):
    """TPC-H Q19 shape: revenue from lineitems matching ANY of several
    (brand, size-range, quantity-range) disjuncts — the
    **OR-of-conjunctions** predicate that defeats naive pushdown.

    The part-side half of every disjunct is evaluated ONCE over the
    part dimension and packed into a partkey-indexed bitmask (bit d =
    part satisfies disjunct d's brand+size), broadcast via ``ray.put``
    (part is dimension-sized; at 100 TB swap the array for a hash join
    exactly as `unshipped_orders` documents).  Each lineitem batch then
    tests ``bitmask[pk] & (qty in range_d)`` vectorized per disjunct —
    the fact table streams once, no join materializes.  Returns ONE
    row ``(n_items, revenue_cc)`` in exact integer centi-cents."""
    import pyarrow.parquet as pq_

    disjuncts = disjuncts or Q19_DISJUNCTS
    part = pq_.read_table(
        f"{sf_dir}/part.parquet", columns=["p_partkey", "p_brand", "p_size"]
    )
    pk = part.column("p_partkey").to_numpy(zero_copy_only=False).astype(np.int64)
    brand = part.column("p_brand").to_numpy(zero_copy_only=False)
    size = part.column("p_size").to_numpy(zero_copy_only=False).astype(np.int64)
    bits = np.zeros(int(pk.max()) + 1 if len(pk) else 1, dtype=np.uint8)
    for d, (b, slo, shi, _, _) in enumerate(disjuncts):
        ok = (brand == b) & (size >= slo) & (size <= shi)
        bits[pk[ok]] |= np.uint8(1 << d)
    qty_ranges = [(qlo * 100, qhi * 100) for (_, _, _, qlo, qhi) in disjuncts]
    side_ref = ray.put((bits, qty_ranges))

    def partial(batch: pa.Table) -> pa.Table:
        pbits, ranges = ray.get(side_ref)
        lpk = batch.column("l_partkey").to_numpy(zero_copy_only=False).astype(np.int64)
        qty_c = _cents(batch.column("l_quantity")).to_numpy(zero_copy_only=False)
        pb = pbits[np.clip(lpk, 0, len(pbits) - 1)]
        mask = np.zeros(len(lpk), dtype=bool)
        for d, (qlo_c, qhi_c) in enumerate(ranges):
            mask |= ((pb & (1 << d)) != 0) & (qty_c >= qlo_c) & (qty_c <= qhi_c)
        rev = _revenue_cc(batch).to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "n_items": pa.array([int(mask.sum())], pa.int64()),
                "revenue_cc": pa.array([int(rev[mask].sum())], pa.int64()),
            }
        )

    parts = collect_table(
        _read(
            sf_dir, "lineitem",
            ["l_partkey", "l_quantity", "l_extendedprice", "l_discount"],
        ).map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    )
    return pa.table(
        {
            "n_items": pa.array(
                [int(pc.sum(parts.column("n_items")).as_py() or 0)], pa.int64()
            ),
            "revenue_cc": pa.array(
                [int(pc.sum(parts.column("revenue_cc")).as_py() or 0)], pa.int64()
            ),
        }
    )


def market_share(
    sf_dir: str,
    region: str = "ASIA",
    nation: str = "NATION_2",
    part_type: str = "PROMO",
    year_lo: int = 1996,
    year_hi: int = 1997,
    num_partitions: int | None = None,
):
    """TPC-H Q8 shape: ``nation``'s share of revenue from ``part_type``
    parts sold to ``region`` customers, by order year.

    Scale shape — TWO splitmix exchanges (the Q10/Q13 co-partition
    pattern), replacing the old two native hash joins + schema
    normalize passes (~6 s → ~2.5 s at sf0.1/32):

    1. ``splitmix(orderkey) % P``: lineitem is pruned map-side to the
       ``part_type`` partkeys (broadcast sorted key array) with the
       supplier→nation attach folded into an ``is_target`` flag
       (dense suppkey→nationkey array — both dimension-sized), then
       pre-summed per orderkey per batch into (nation_cc, total_cc)
       partials; orders rides the same exchange year-filtered and
       projected to (orderkey, custkey, year).  The kernel joins
       within the partition and emits per-(custkey, year) partials.
    2. ``splitmix(custkey) % P``: those partials co-partition with the
       region-filtered customer keys; the kernel keeps partials whose
       custkey exists (the inner join against customer) and emits
       bounded per-year (nation_rev, total_rev) cells.

    The driver combine is over ≤ P × years rows; the share is exact
    integer ``(num × 1000) // den`` milli-units."""
    import pyarrow.parquet as pq_

    from crawl_ray.pipelines.stats import _splitmix64

    num_partitions = num_partitions or _default_partitions()
    P = num_partitions

    nat = pq_.read_table(f"{sf_dir}/nation.parquet")
    n_key = {r["n_name"]: r["n_nationkey"] for r in nat.to_pylist()}
    target_key = np.int64(n_key[nation])
    reg = pq_.read_table(f"{sf_dir}/region.parquet")
    rkey = next(
        r["r_regionkey"] for r in reg.to_pylist() if r["r_name"] == region
    )
    nk = nat.column("n_nationkey").to_numpy(zero_copy_only=False).astype(np.int64)
    nreg = np.full(int(nk.max()) + 1, -1, dtype=np.int64)
    nreg[nk] = nat.column("n_regionkey").to_numpy(zero_copy_only=False)

    part = pq_.read_table(
        f"{sf_dir}/part.parquet", columns=["p_partkey", "p_type"]
    )
    pkeys = np.sort(
        part.filter(pc.equal(part.column("p_type"), part_type))
        .column("p_partkey").to_numpy(zero_copy_only=False).astype(np.int64)
    )
    sup = pq_.read_table(
        f"{sf_dir}/supplier.parquet", columns=["s_suppkey", "s_nationkey"]
    )
    sk = sup.column("s_suppkey").to_numpy(zero_copy_only=False).astype(np.int64)
    snat = np.full(int(sk.max()) + 1, -1, dtype=np.int64)
    snat[sk] = sup.column("s_nationkey").to_numpy(zero_copy_only=False)
    empty = pa.table(
        {"o_year": pa.array([], pa.int64()),
         "nation_revenue_cc": pa.array([], pa.int64()),
         "total_revenue_cc": pa.array([], pa.int64()),
         "share_milli": pa.array([], pa.int64())}
    )
    if len(pkeys) == 0:
        return empty
    li_ref = ray.put((pkeys, snat, target_key))

    def _part_of(keys: np.ndarray) -> pa.Array:
        return pa.array(
            (_splitmix64(keys.astype(np.uint64)) % np.uint64(P)).astype(
                np.int64
            ),
            pa.int64(),
        )

    _e_x1 = pa.table(
        {"key": pa.array([], pa.int64()), "v1": pa.array([], pa.int64()),
         "v2": pa.array([], pa.int64()), "tag": pa.array([], pa.int64()),
         "part": pa.array([], pa.int64())}
    )

    def li_partial(batch: pa.Table) -> pa.Table:
        keys, sn, tkey = ray.get(li_ref)
        lpk = batch.column("l_partkey").to_numpy(zero_copy_only=False).astype(np.int64)
        pos = np.clip(np.searchsorted(keys, lpk), 0, len(keys) - 1)
        batch = batch.filter(pa.array(keys[pos] == lpk))
        if batch.num_rows == 0:
            return _e_x1
        lsk = batch.column("l_suppkey").to_numpy(zero_copy_only=False).astype(np.int64)
        is_t = sn[np.clip(lsk, 0, len(sn) - 1)] == tkey
        ok = batch.column("l_orderkey").to_numpy(zero_copy_only=False).astype(np.int64)
        rev = _revenue_cc(batch).to_numpy(zero_copy_only=False)
        uk, inv = np.unique(ok, return_inverse=True)
        nat_cc = np.zeros(len(uk), dtype=np.int64)
        tot_cc = np.zeros(len(uk), dtype=np.int64)
        np.add.at(nat_cc, inv, rev * is_t)
        np.add.at(tot_cc, inv, rev)
        return pa.table(
            {"key": pa.array(uk, pa.int64()),
             "v1": pa.array(nat_cc, pa.int64()),
             "v2": pa.array(tot_cc, pa.int64()),
             "tag": pa.array(np.zeros(len(uk), np.int64), pa.int64()),
             "part": _part_of(uk)}
        )

    def orders_rows(batch: pa.Table) -> pa.Table:
        year = pc.cast(pc.year(batch.column("o_orderdate")), pa.int64())
        mask = pc.and_(
            pc.greater_equal(year, pa.scalar(year_lo, pa.int64())),
            pc.less_equal(year, pa.scalar(year_hi, pa.int64())),
        )
        batch = batch.filter(mask)
        if batch.num_rows == 0:
            return _e_x1
        ok = batch.column("o_orderkey").to_numpy(zero_copy_only=False).astype(np.int64)
        yr = pc.cast(
            pc.year(batch.column("o_orderdate")), pa.int64()
        ).to_numpy(zero_copy_only=False)
        return pa.table(
            {"key": pa.array(ok, pa.int64()),
             "v1": batch.column("o_custkey").cast(pa.int64()),
             "v2": pa.array(yr, pa.int64()),
             "tag": pa.array(np.ones(len(ok), np.int64), pa.int64()),
             "part": _part_of(ok)}
        )

    _e_x2 = pa.table(
        {"ck": pa.array([], pa.int64()), "yr": pa.array([], pa.int64()),
         "nat": pa.array([], pa.int64()), "tot": pa.array([], pa.int64()),
         "part": pa.array([], pa.int64())}
    )

    def to_cy_partials(group: pa.Table) -> pa.Table:
        if group.num_rows == 0 or "key" not in group.column_names:
            return _e_x2
        tag = group.column("tag").to_numpy(zero_copy_only=False)
        is_ord = tag == 1
        if not is_ord.any() or is_ord.all():
            return _e_x2
        key = group.column("key").to_numpy(zero_copy_only=False)
        v1 = group.column("v1").to_numpy(zero_copy_only=False)
        v2 = group.column("v2").to_numpy(zero_copy_only=False)
        o_keys = key[is_ord]
        order_ = np.argsort(o_keys)
        o_keys_s = o_keys[order_]
        o_cust_s = v1[is_ord][order_]
        o_year_s = v2[is_ord][order_]
        lk = key[~is_ord]
        loc = np.searchsorted(o_keys_s, lk)
        hit = (loc < len(o_keys_s)) & (
            o_keys_s[np.minimum(loc, len(o_keys_s) - 1)] == lk
        )
        if not hit.any():
            return _e_x2
        ck = o_cust_s[loc[hit]]
        yr = o_year_s[loc[hit]]
        nat = v1[~is_ord][hit]
        tot = v2[~is_ord][hit]
        cy = np.stack([ck, yr], axis=1)
        ucy, inv = np.unique(cy, axis=0, return_inverse=True)
        nat_s = np.zeros(len(ucy), dtype=np.int64)
        tot_s = np.zeros(len(ucy), dtype=np.int64)
        np.add.at(nat_s, inv, nat)
        np.add.at(tot_s, inv, tot)
        return pa.table(
            {"ck": pa.array(ucy[:, 0], pa.int64()),
             "yr": pa.array(ucy[:, 1], pa.int64()),
             "nat": pa.array(nat_s, pa.int64()),
             "tot": pa.array(tot_s, pa.int64()),
             "part": _part_of(ucy[:, 0])}
        )

    nreg_ref = ray.put((nreg, np.int64(rkey)))

    def cust_rows(batch: pa.Table) -> pa.Table:
        lookup, rk = ray.get(nreg_ref)
        cnk = batch.column("c_nationkey").to_numpy(zero_copy_only=False).astype(np.int64)
        mask = lookup[np.clip(cnk, 0, len(lookup) - 1)] == rk
        ck = batch.column("c_custkey").to_numpy(zero_copy_only=False).astype(
            np.int64
        )[mask]
        n = len(ck)
        return pa.table(
            {"ck": pa.array(ck, pa.int64()),
             "yr": pa.array(np.full(n, -1, np.int64), pa.int64()),
             "nat": pa.array(np.zeros(n, np.int64), pa.int64()),
             "tot": pa.array(np.zeros(n, np.int64), pa.int64()),
             "part": _part_of(ck)}
        )

    _e_cells = pa.table(
        {"o_year": pa.array([], pa.int64()),
         "nation_rev": pa.array([], pa.int64()),
         "total_rev": pa.array([], pa.int64())}
    )

    def year_cells(group: pa.Table) -> pa.Table:
        if group.num_rows == 0 or "ck" not in group.column_names:
            return _e_cells
        yr = group.column("yr").to_numpy(zero_copy_only=False)
        is_cust = yr < 0
        if not is_cust.any() or is_cust.all():
            return _e_cells
        ck = group.column("ck").to_numpy(zero_copy_only=False)
        cust_keys = np.unique(ck[is_cust])
        pk = ck[~is_cust]
        loc = np.searchsorted(cust_keys, pk)
        hit = (loc < len(cust_keys)) & (
            cust_keys[np.minimum(loc, len(cust_keys) - 1)] == pk
        )
        if not hit.any():
            return _e_cells
        yrs = yr[~is_cust][hit]
        nat = group.column("nat").to_numpy(zero_copy_only=False)[~is_cust][hit]
        tot = group.column("tot").to_numpy(zero_copy_only=False)[~is_cust][hit]
        uy, inv = np.unique(yrs, return_inverse=True)
        nat_s = np.zeros(len(uy), dtype=np.int64)
        tot_s = np.zeros(len(uy), dtype=np.int64)
        np.add.at(nat_s, inv, nat)
        np.add.at(tot_s, inv, tot)
        return pa.table(
            {"o_year": pa.array(uy, pa.int64()),
             "nation_rev": pa.array(nat_s, pa.int64()),
             "total_rev": pa.array(tot_s, pa.int64())}
        )

    li = _read(
        sf_dir, "lineitem",
        ["l_orderkey", "l_partkey", "l_suppkey", "l_extendedprice",
         "l_discount"],
    ).map_batches(li_partial, batch_format="pyarrow", zero_copy_batch=True)
    orders = _read(
        sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderdate"]
    ).map_batches(orders_rows, batch_format="pyarrow", zero_copy_batch=True)
    cust = _read(sf_dir, "customer", ["c_custkey", "c_nationkey"]).map_batches(
        cust_rows, batch_format="pyarrow", zero_copy_batch=True
    )
    # coalesce the pre-aggregated partial streams to P blocks before
    # each exchange: Ray's sort-shuffle pays per-input-block sample +
    # sort + P-way split overhead, so feeding it many tiny partial
    # blocks costs more than one narrow repartition of the (already
    # much-smaller-than-fact) partials (measured 2.1 s → 0.95 s per
    # exchange at sf0.1/32)
    cells = collect_table(
        li.union(orders)
        .repartition(P)
        .groupby("part")
        .map_groups(to_cy_partials, batch_format="pyarrow")
        .union(cust)
        .repartition(P)
        .groupby("part")
        .map_groups(year_cells, batch_format="pyarrow")
    )
    if cells.num_rows == 0 or "o_year" not in cells.column_names:
        return empty
    year = cells.column("o_year").to_numpy(zero_copy_only=False)
    uy = np.unique(year)
    inv = np.searchsorted(uy, year)
    num = np.zeros(len(uy), dtype=np.int64)
    den = np.zeros(len(uy), dtype=np.int64)
    np.add.at(num, inv, cells.column("nation_rev").to_numpy(zero_copy_only=False))
    np.add.at(den, inv, cells.column("total_rev").to_numpy(zero_copy_only=False))
    share = num * 1000 // den
    return pa.table(
        {
            "o_year": pa.array(uy, pa.int64()),
            "nation_revenue_cc": pa.array(num, pa.int64()),
            "total_revenue_cc": pa.array(den, pa.int64()),
            "share_milli": pa.array(share, pa.int64()),
        }
    )


# Q4 window: orders placed in 1997 Q3
Q4_WIN_LO_US = 867_715_200_000_000  # 1997-07-01T00:00:00Z in µs
Q4_WIN_HI_US = 875_664_000_000_000  # 1997-10-01T00:00:00Z in µs
Q4_LATE_US = 60 * 86_400_000_000  # 60 days in µs
Q12_LATE_US = 90 * 86_400_000_000  # 90 days in µs


def order_priority_check(sf_dir: str, num_partitions: int | None = None):
    """Q4 shape: per-priority count of 1997-Q3 orders with at least one
    lineitem shipped >60 days after the order date — a correlated
    EXISTS whose predicate crosses both join sides (the ship date is
    compared against *this order's* order date, so the semi-join cannot
    be pre-filtered on either input alone).

    Plan (all exchanges bounded):

    1. lineitem pre-combines to per-order **max** ship date inside each
       block (``EXISTS(ship > odate+60d) ⟺ max(ship) > odate+60d`` and
       max is associative, so block partials are safe) — the join moves
       ≤ one row per (order, block), not raw lineitems.
    2. Orders are window-filtered and projected before the hash join.
    3. Post-join, late survivors dedup batch-locally to
       (orderkey, priority) pairs, then one pair-keyed groupby makes the
       EXISTS exact across blocks (an order's partials may span blocks);
       the pair exchange carries ≤ one row per qualifying order.
    4. The per-priority count is the bounded driver-side combiner.
    """
    num_partitions = num_partitions or _default_partitions()

    def orders_side(batch: pa.Table) -> pa.Table:
        od = batch.column("o_orderdate").cast(pa.timestamp("us")).cast(pa.int64())
        keep = pc.and_(
            pc.greater_equal(od, pa.scalar(Q4_WIN_LO_US, pa.int64())),
            pc.less(od, pa.scalar(Q4_WIN_HI_US, pa.int64())),
        )
        return pa.table(
            {
                "o_orderkey": batch.column("o_orderkey").cast(pa.int64()),
                "o_orderpriority": batch.column("o_orderpriority"),
                "odate_us": od,
            }
        ).filter(keep)

    orders = _read(
        sf_dir, "orders", ["o_orderkey", "o_orderdate", "o_orderpriority"]
    ).map_batches(orders_side, batch_format="pyarrow", zero_copy_batch=True)

    def li_side(batch: pa.Table) -> pa.Table:
        t = pa.table(
            {
                "l_orderkey": batch.column("l_orderkey").cast(pa.int64()),
                "ship_us": batch.column("l_shipdate")
                .cast(pa.timestamp("us"))
                .cast(pa.int64()),
            }
        )
        out = t.group_by(["l_orderkey"]).aggregate([("ship_us", "max")])
        return rename_select(out, {"l_orderkey": "l_orderkey", "ship_us_max": "ship_us"})

    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_shipdate"]).map_batches(
        li_side, batch_format="pyarrow", zero_copy_batch=True
    )

    j = _cjoin(
        orders, li, "inner", num_partitions,
        on=("o_orderkey",), right_on=("l_orderkey",),
    )

    def late_pairs(batch: pa.Table) -> pa.Table:
        late = pc.greater(
            batch.column("ship_us"),
            pc.add(batch.column("odate_us"), pa.scalar(Q4_LATE_US, pa.int64())),
        )
        t = batch.filter(late).select(["o_orderkey", "o_orderpriority"])
        return t.group_by(["o_orderkey", "o_orderpriority"]).aggregate([])

    pairs = (
        j.map_batches(late_pairs, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["o_orderkey", "o_orderpriority"])
        .count()
    )
    agg = partial_then_final_sum(
        pairs.select_columns(["o_orderpriority"]),
        ["o_orderpriority"],
        {},
        count_name="order_count",
    )
    return agg.sort_by("o_orderpriority")


def late_shipment_priority(sf_dir: str, num_partitions: int | None = None):
    """Q12 shape: per-linestatus counts of high- vs low-priority
    lineitems shipped >90 days after their order date.  The late
    predicate crosses the join (ship date vs order date), so lineitem ⋈
    orders must hash-join first; the priority CASE collapses to an
    0/1 integer column on the orders side **before** the exchange, and
    the per-status conditional counts are the bounded combiner —
    nothing after the join shuffles."""
    num_partitions = num_partitions or _default_partitions()

    def li_side(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "l_orderkey": batch.column("l_orderkey").cast(pa.int64()),
                "l_linestatus": batch.column("l_linestatus"),
                "ship_us": batch.column("l_shipdate")
                .cast(pa.timestamp("us"))
                .cast(pa.int64()),
            }
        )

    li = _read(
        sf_dir, "lineitem", ["l_orderkey", "l_linestatus", "l_shipdate"]
    ).map_batches(li_side, batch_format="pyarrow", zero_copy_batch=True)

    def orders_side(batch: pa.Table) -> pa.Table:
        pri = batch.column("o_orderpriority")
        is_high = pc.is_in(
            pri, value_set=pa.array(["1-URGENT", "2-HIGH"])
        ).cast(pa.int64())
        return pa.table(
            {
                "o_orderkey": batch.column("o_orderkey").cast(pa.int64()),
                "odate_us": batch.column("o_orderdate")
                .cast(pa.timestamp("us"))
                .cast(pa.int64()),
                "is_high": is_high,
            }
        )

    orders = _read(
        sf_dir, "orders", ["o_orderkey", "o_orderdate", "o_orderpriority"]
    ).map_batches(orders_side, batch_format="pyarrow", zero_copy_batch=True)

    j = _cjoin(
        li, orders, "inner", num_partitions,
        on=("l_orderkey",), right_on=("o_orderkey",),
    )

    def late_only(batch: pa.Table) -> pa.Table:
        late = pc.greater(
            batch.column("ship_us"),
            pc.add(batch.column("odate_us"), pa.scalar(Q12_LATE_US, pa.int64())),
        )
        return batch.filter(late)

    agg = partial_then_final_sum(
        j.map_batches(late_only, batch_format="pyarrow", zero_copy_batch=True),
        ["l_linestatus"],
        {
            "high_line_count": lambda b: b.column("is_high"),
            "low_line_count": lambda b: pc.subtract(
                pa.scalar(1, pa.int64()), b.column("is_high")
            ),
        },
    )
    return agg.sort_by("l_linestatus")


def part_type_supplier_counts(sf_dir: str, num_partitions: int | None = None):
    """Q16 shape: distinct-supplier counts per (type, brand) — the
    COUNT(DISTINCT) after a join, collapsed to ONE exchange: per-batch
    pre-deduped (part, supplier) pairs and the part-dimension rows
    (tagged ``l_suppkey = -1``) ride the SAME ``splitmix(partkey) % P``
    shuffle, the partition kernel joins them in place (partkey is
    co-located by construction) and emits its DISTINCT (type, brand,
    supplier) triples, and the global triple dedup + count runs on the
    driver over the bounded partials (≤ P × types × brands × suppliers
    rows — the triple domain, a dimension product, never fact-sized).
    The previous 3-exchange plan (sort-groupby, hash join,
    sort-groupby) measured 17 s at sf0.1/32; this plan ~3 s."""
    from crawl_ray.pipelines.stats import _splitmix64

    num_partitions = num_partitions or _default_partitions()
    P = num_partitions

    def pair_dedup(batch: pa.Table) -> pa.Table:
        t = pa.table(
            {
                "l_partkey": batch.column("l_partkey").cast(pa.int64()),
                "l_suppkey": batch.column("l_suppkey").cast(pa.int64()),
            }
        )
        out = t.group_by(["l_partkey", "l_suppkey"]).aggregate([])
        part = (
            _splitmix64(
                out.column("l_partkey").to_numpy(zero_copy_only=False)
                .astype(np.uint64)
            )
            % np.uint64(P)
        ).astype(np.int64)
        return pa.table(
            {
                "l_partkey": out.column("l_partkey"),
                "l_suppkey": out.column("l_suppkey"),
                "p_type": pa.array([None] * out.num_rows, pa.string()),
                "p_brand": pa.array([None] * out.num_rows, pa.string()),
                "part": pa.array(part, pa.int64()),
            }
        )

    def part_dim(b: pa.Table) -> pa.Table:
        pk = b.column("p_partkey").to_numpy(zero_copy_only=False).astype(np.int64)
        part = (_splitmix64(pk.astype(np.uint64)) % np.uint64(P)).astype(np.int64)
        return pa.table(
            {
                "l_partkey": pa.array(pk, pa.int64()),
                "l_suppkey": pa.array(
                    np.full(len(pk), -1, dtype=np.int64), pa.int64()
                ),
                "p_type": b.column("p_type"),
                "p_brand": b.column("p_brand"),
                "part": pa.array(part, pa.int64()),
            }
        )

    _empty = pa.table(
        {"p_type": pa.array([], pa.string()),
         "p_brand": pa.array([], pa.string()),
         "sk": pa.array([], pa.int64())}
    )

    def triples(group: pa.Table) -> pa.Table:
        if group.num_rows == 0 or "l_suppkey" not in group.column_names:
            return _empty
        is_dim = pc.equal(group.column("l_suppkey"), pa.scalar(-1, pa.int64()))
        dim = group.filter(is_dim)
        pairs = group.filter(pc.invert(is_dim))
        if dim.num_rows == 0 or pairs.num_rows == 0:
            return _empty
        dpk = dim.column("l_partkey").to_numpy(zero_copy_only=False)
        dorder = np.argsort(dpk)
        dpk_s = dpk[dorder]
        ppk = pairs.column("l_partkey").to_numpy(zero_copy_only=False)
        psk = pairs.column("l_suppkey").to_numpy(zero_copy_only=False)
        loc = np.searchsorted(dpk_s, ppk)
        hit = (loc < len(dpk_s)) & (dpk_s[np.minimum(loc, len(dpk_s) - 1)] == ppk)
        ridx = dorder[loc[hit]]
        psk = psk[hit]
        # (type, brand) code per dim row, then distinct (code, supplier)
        tb = dim.select(["p_type", "p_brand"])
        key = pc.binary_join_element_wise(
            tb.column("p_type").cast(pa.string()),
            tb.column("p_brand").cast(pa.string()), "\x1f",
        ).to_numpy(zero_copy_only=False)
        ukey, code_of_row = np.unique(key, return_inverse=True)
        pair_codes = np.unique(
            np.stack([code_of_row[ridx], psk], axis=1), axis=0
        )
        # resolve code → first dim row carrying it (strings back out)
        first_row = np.zeros(len(ukey), dtype=np.int64)
        order = np.argsort(code_of_row, kind="stable")
        sorted_codes = code_of_row[order]
        heads = np.ones(len(order), dtype=bool)
        heads[1:] = sorted_codes[1:] != sorted_codes[:-1]
        first_row[sorted_codes[heads]] = order[heads]
        take = pa.array(first_row[pair_codes[:, 0]], pa.int64())
        return pa.table(
            {
                "p_type": tb.column("p_type").take(take),
                "p_brand": tb.column("p_brand").take(take),
                "sk": pa.array(pair_codes[:, 1], pa.int64()),
            }
        )

    li = _read(sf_dir, "lineitem", ["l_partkey", "l_suppkey"]).map_batches(
        pair_dedup, batch_format="pyarrow", zero_copy_batch=True
    )
    pt = _read(sf_dir, "part", ["p_partkey", "p_type", "p_brand"]).map_batches(
        part_dim, batch_format="pyarrow", zero_copy_batch=True
    )
    partials = collect_table(
        li.union(pt).repartition(P).groupby("part").map_groups(
            triples, batch_format="pyarrow"
        )
    )
    if partials.num_rows == 0 or "p_type" not in partials.column_names:
        return pa.table(
            {"p_type": pa.array([], pa.string()),
             "p_brand": pa.array([], pa.string()),
             "supplier_cnt": pa.array([], pa.int64())}
        )
    # global triple dedup (bounded domain) then the (type, brand) count
    distinct = partials.group_by(["p_type", "p_brand", "sk"]).aggregate([])
    agg = rename_select(
        distinct.group_by(["p_type", "p_brand"]).aggregate([("sk", "count")]),
        {"p_type": "p_type", "p_brand": "p_brand", "sk_count": "supplier_cnt"},
    )
    return agg.sort_by([("p_type", "ascending"), ("p_brand", "ascending")])


def dominant_part_suppliers(
    sf_dir: str, num_partitions: int | None = None, share_k: int = 8
):
    """Q20 shape: nested aggregation with a cross-level predicate —
    suppliers holding an outsized share (``share_k·q > total``, default
    > 1/8) of any part's shipped quantity.  Plan: (part, supplier) quantity partials
    (batch group_by) → ONE partkey-keyed partition shuffle whose kernel
    computes per-part totals and the share predicate as vectorized
    segment sums (no per-part Python) → surviving suppliers dedup
    through the bounded supplier-keyed groupby."""
    from crawl_ray.pipelines.stats import _splitmix64

    num_partitions = num_partitions or _default_partitions()

    def psq_partial(batch: pa.Table) -> pa.Table:
        t = pa.table(
            {
                "l_partkey": batch.column("l_partkey").cast(pa.int64()),
                "l_suppkey": batch.column("l_suppkey").cast(pa.int64()),
                "q": _cents(batch.column("l_quantity")),
            }
        )
        out = t.group_by(["l_partkey", "l_suppkey"]).aggregate([("q", "sum")])
        out = rename_select(
            out,
            {"l_partkey": "l_partkey", "l_suppkey": "l_suppkey", "q_sum": "q"},
        )
        part = (
            _splitmix64(
                out.column("l_partkey").to_numpy(zero_copy_only=False).astype(np.uint64)
            )
            % np.uint64(num_partitions)
        ).astype(np.int64)
        return out.append_column("part", pa.array(part, pa.int64()))

    def majority(block: pa.Table) -> pa.Table:
        empty = pa.table({"l_suppkey": pa.array([], pa.int64())})
        if block.num_rows == 0:
            return empty
        pk = block.column("l_partkey").to_numpy(zero_copy_only=False)
        sk = block.column("l_suppkey").to_numpy(zero_copy_only=False)
        q = block.column("q").to_numpy(zero_copy_only=False)
        order = np.lexsort((sk, pk))
        pk, sk, q = pk[order], sk[order], q[order]
        # combine duplicate (part, supp) partials, then per-part totals
        new_pair = np.ones(len(pk), dtype=bool)
        new_pair[1:] = (pk[1:] != pk[:-1]) | (sk[1:] != sk[:-1])
        pair_id = np.cumsum(new_pair) - 1
        pair_q = np.bincount(pair_id, weights=q.astype(np.float64)).astype(np.int64)
        pair_pk = pk[new_pair]
        pair_sk = sk[new_pair]
        new_part = np.ones(len(pair_pk), dtype=bool)
        new_part[1:] = pair_pk[1:] != pair_pk[:-1]
        part_id = np.cumsum(new_part) - 1
        part_tot = np.bincount(
            part_id, weights=pair_q.astype(np.float64)
        ).astype(np.int64)
        keep = pair_q * share_k > part_tot[part_id]
        return pa.table(
            {"l_suppkey": pa.array(np.unique(pair_sk[keep]), pa.int64())}
        )

    survivors = (
        _read(sf_dir, "lineitem", ["l_partkey", "l_suppkey", "l_quantity"])
        .map_batches(psq_partial, batch_format="pyarrow", zero_copy_batch=True)
        .repartition(num_partitions)
        .groupby("part")
        .map_groups(majority, batch_format="pyarrow")
        .groupby("l_suppkey")
        .count()
    )
    t = collect_table(survivors)
    if t.num_rows == 0 or "l_suppkey" not in t.column_names:
        return pa.table({"suppkey": pa.array([], pa.int64())})
    out = np.sort(t.column("l_suppkey").to_numpy(zero_copy_only=False).astype(np.int64))
    return pa.table({"suppkey": pa.array(out, pa.int64())})


def product_profit(
    sf_dir: str,
    name_token: str = "red",
    num_partitions: int | None = None,
):
    """TPC-H Q9 shape: profit by supplier nation and order year for parts
    whose name contains ``name_token`` — the 5-way star join with TWO
    fact-sized exchanges.

    The testdata has no partsupp table, so unit cost is the part's
    retail price (profit_cc = revenue_cc − cents(p_retailprice) ×
    units); the PLAN is the Q9 plan regardless of the cost column.
    Join order is chosen by side size: the name-filtered part
    projection joins lineitem FIRST (prunes the fact table before the
    second exchange, the Q7 lesson at joins.py:828), orders arrives via
    the second hash join for the year, and the supplier → nationkey map
    is a broadcast lookup array (supplier is the small dimension —
    never shuffled).  (nation, year) cells are bounded → driver
    combine.  All arithmetic is exact integer cents so the DuckDB
    oracle agrees bit-for-bit.  Reference shape: crawl has no SQL; this
    covers the multi-join analytics surface of SURVEY §2.7."""
    import pyarrow.parquet as pq_

    num_partitions = num_partitions or _default_partitions()

    # part side: name-filtered keys + retail cents (columns pruned at read)
    def part_side(b: pa.Table) -> pa.Table:
        mask = pc.match_substring(b.column("p_name"), name_token)
        b = b.filter(mask)
        return pa.table(
            {
                "p_partkey": b.column("p_partkey").cast(pa.int64()),
                "retail_c": _cents(b.column("p_retailprice")),
            }
        )

    # an ALL-empty join side loses its schema in Ray's hash join
    # (ArrowInvalid FieldRef, the Q7 lesson) — dimension-sized probe
    n_match = pc.sum(
        pc.match_substring(
            pq_.read_table(f"{sf_dir}/part.parquet", columns=["p_name"])
            .column("p_name"),
            name_token,
        ).cast(pa.int64())
    ).as_py()
    if not n_match:
        return pa.table(
            {"nation": pa.array([], pa.string()),
             "o_year": pa.array([], pa.int64()),
             "profit_cc": pa.array([], pa.int64())}
        )
    # name filter + block splits can leave zero-column empty blocks on
    # the join's right side (the knn_graph_stats failure mode) —
    # re-emit typed blocks before the exchange
    pt = normalize_schema(
        _read(sf_dir, "part", ["p_partkey", "p_name", "p_retailprice"])
        .map_batches(part_side, batch_format="pyarrow", zero_copy_batch=True),
        {"p_partkey": pa.int64(), "retail_c": pa.int64()},
        coalesce=4,
    )

    # supplier → nationkey broadcast lookup (dimension-sized)
    sup = pq_.read_table(
        f"{sf_dir}/supplier.parquet", columns=["s_suppkey", "s_nationkey"]
    )
    skeys = sup.column("s_suppkey").to_numpy(zero_copy_only=False).astype(np.int64)
    snat = np.full(int(skeys.max()) + 1, -1, dtype=np.int64)
    snat[skeys] = sup.column("s_nationkey").to_numpy(zero_copy_only=False)
    nat = pq_.read_table(f"{sf_dir}/nation.parquet")
    name_by_key = {r["n_nationkey"]: r["n_name"] for r in nat.to_pylist()}
    nname = np.array(
        [name_by_key.get(i, "") for i in range(max(name_by_key) + 1)], dtype=object
    )
    side_ref = ray.put((snat, nname))

    def li_side(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "l_orderkey": b.column("l_orderkey").cast(pa.int64()),
                "l_partkey": b.column("l_partkey").cast(pa.int64()),
                "l_suppkey": b.column("l_suppkey").cast(pa.int64()),
                "qty_c": _cents(b.column("l_quantity")),
                "revenue_cc": _revenue_cc(b),
            }
        )

    li = _read(
        sf_dir, "lineitem",
        ["l_orderkey", "l_partkey", "l_suppkey", "l_quantity",
         "l_extendedprice", "l_discount"],
    ).map_batches(li_side, batch_format="pyarrow", zero_copy_batch=True)

    j1 = normalize_schema(
        _cjoin(li, pt, "inner", num_partitions,
               on=("l_partkey",), right_on=("p_partkey",)),
        {
            "l_orderkey": pa.int64(), "l_suppkey": pa.int64(),
            "qty_c": pa.int64(), "revenue_cc": pa.int64(),
            "retail_c": pa.int64(),
        },
        coalesce=num_partitions,
    )
    orders = _read(sf_dir, "orders", ["o_orderkey", "o_orderdate"]).map_batches(
        lambda b: pa.table(
            {
                "o_orderkey": b.column("o_orderkey").cast(pa.int64()),
                "o_us": b.column("o_orderdate").cast(pa.int64()),
            }
        ),
        batch_format="pyarrow", zero_copy_batch=True,
    )
    j2 = _cjoin(
        j1, orders, "inner", num_partitions,
        on=("l_orderkey",), right_on=("o_orderkey",),
        coalesce_left=False,  # j1 was just coalesced by normalize_schema
    )

    def resolve(b: pa.Table) -> pa.Table:
        sn, names = ray.get(side_ref)
        sk = b.column("l_suppkey").to_numpy(zero_copy_only=False).astype(np.int64)
        nk = sn[np.clip(sk, 0, len(sn) - 1)]
        us = b.column("o_us").to_numpy(zero_copy_only=False).astype(np.int64)
        year = (
            us.astype("datetime64[us]").astype("datetime64[Y]").astype(np.int64)
            + 1970
        )
        rev = b.column("revenue_cc").to_numpy(zero_copy_only=False)
        # cost in the SAME centi-cent unit: cents(retail) × cents(qty) / 100
        # stays integral because qty is integral (cents(qty) ≡ qty×100)
        cost = (
            b.column("retail_c").to_numpy(zero_copy_only=False)
            * b.column("qty_c").to_numpy(zero_copy_only=False)
        ) // 100
        return pa.table(
            {
                "nation": pa.array(names[nk].tolist(), pa.string()),
                "o_year": pa.array(year, pa.int64()),
                "profit_cc": pa.array(rev - cost, pa.int64()),
            }
        )

    cells = j2.map_batches(resolve, batch_format="pyarrow", zero_copy_batch=True)
    agg = partial_then_final_sum(
        cells, ["nation", "o_year"],
        {"profit_cc": lambda b: b.column("profit_cc")},
    )
    return agg.sort_by([("nation", "ascending"), ("o_year", "descending")])


def min_cost_supplier(
    sf_dir: str,
    region: str = "EUROPE",
    num_partitions: int | None = None,
):
    """TPC-H Q2 shape: for every part, the cheapest qualifying supplier
    in a region — the correlated groupwise-MIN subquery.

    The testdata has no partsupp, so "supplies part P" is derived from
    the observed lineitem pairs and "cost" is the supplier's account
    balance (ascending — lower balance wins; unique in the generator
    but suppkey tie-break keeps the plan total-order deterministic).

    Plan: lineitem pre-combines per batch to DISTINCT (partkey,
    suppkey) pairs (the pair universe is bounded by parts × suppliers,
    a fraction of the fact table), region-filtered supplier attrs are a
    broadcast lookup (dimension-sized), and the groupwise argmin is ONE
    splitmix-partitioned shuffle with a vectorized lexsort segment
    kernel per partition — never a self-join back, never per-part
    Python.  Output is one row per part with a qualifying supplier."""
    import pyarrow.parquet as pq_

    from crawl_ray.pipelines.stats import _splitmix64

    num_partitions = num_partitions or _default_partitions()

    nat = pq_.read_table(f"{sf_dir}/nation.parquet")
    reg = pq_.read_table(f"{sf_dir}/region.parquet")
    rkeys = {
        r["r_regionkey"] for r in reg.to_pylist() if r["r_name"] == region
    }
    nat_rows = nat.to_pylist()
    nkeys = {r["n_nationkey"] for r in nat_rows if r["n_regionkey"] in rkeys}
    nname = {r["n_nationkey"]: r["n_name"] for r in nat_rows}
    sup = pq_.read_table(
        f"{sf_dir}/supplier.parquet",
        columns=["s_suppkey", "s_nationkey", "s_name", "s_acctbal"],
    )
    skeys = sup.column("s_suppkey").to_numpy(zero_copy_only=False).astype(np.int64)
    hi = int(skeys.max()) + 1
    s_nat = np.full(hi, -1, dtype=np.int64)
    s_nat[skeys] = sup.column("s_nationkey").to_numpy(zero_copy_only=False)
    s_bal = np.zeros(hi, dtype=np.int64)
    s_bal[skeys] = (
        _cents(sup.column("s_acctbal")).to_numpy(zero_copy_only=False)
    )
    s_names = np.array([""] * hi, dtype=object)
    s_names[skeys] = np.array(
        sup.column("s_name").to_pylist(), dtype=object
    )
    in_region = np.zeros(hi, dtype=bool)
    in_region[skeys] = np.isin(
        s_nat[skeys], np.fromiter(nkeys, dtype=np.int64)
    ) if nkeys else False
    side_ref = ray.put((in_region, s_bal))

    def pairs_partial(b: pa.Table) -> pa.Table:
        keep, _bal = ray.get(side_ref)
        pk = b.column("l_partkey").to_numpy(zero_copy_only=False).astype(np.int64)
        sk = b.column("l_suppkey").to_numpy(zero_copy_only=False).astype(np.int64)
        mask = keep[np.clip(sk, 0, len(keep) - 1)]
        pk, sk = pk[mask], sk[mask]
        if not len(pk):
            return pa.table(
                {"pk": pa.array([], pa.int64()), "sk": pa.array([], pa.int64()),
                 "part": pa.array([], pa.int64())}
            )
        uniq = np.unique(np.stack([pk, sk], axis=1), axis=0)
        part = (
            _splitmix64(uniq[:, 0].astype(np.uint64)) % np.uint64(num_partitions)
        ).astype(np.int64)
        return pa.table(
            {"pk": pa.array(uniq[:, 0], pa.int64()),
             "sk": pa.array(uniq[:, 1], pa.int64()),
             "part": pa.array(part, pa.int64())}
        )

    def argmin_per_part(block: pa.Table) -> pa.Table:
        empty = pa.table(
            {"pk": pa.array([], pa.int64()), "sk": pa.array([], pa.int64())}
        )
        if block.num_rows == 0:
            return empty
        _keep, bal = ray.get(side_ref)
        pk = block.column("pk").to_numpy(zero_copy_only=False)
        sk = block.column("sk").to_numpy(zero_copy_only=False)
        # groupwise argmin: sort by (part, balance, suppkey), keep heads
        order = np.lexsort((sk, bal[sk], pk))
        pk, sk = pk[order], sk[order]
        head = np.ones(len(pk), dtype=bool)
        head[1:] = pk[1:] != pk[:-1]
        return pa.table(
            {"pk": pa.array(pk[head], pa.int64()),
             "sk": pa.array(sk[head], pa.int64())}
        )

    winners = collect_table(
        _read(sf_dir, "lineitem", ["l_partkey", "l_suppkey"])
        .map_batches(pairs_partial, batch_format="pyarrow", zero_copy_batch=True)
        .repartition(num_partitions)
        .groupby("part")
        .map_groups(argmin_per_part, batch_format="pyarrow")
    )
    if winners.num_rows == 0 or "pk" not in winners.column_names:
        return pa.table(
            {"s_acctbal_cents": pa.array([], pa.int64()),
             "s_name": pa.array([], pa.string()),
             "n_name": pa.array([], pa.string()),
             "p_partkey": pa.array([], pa.int64())}
        )
    pk = winners.column("pk").to_numpy(zero_copy_only=False).astype(np.int64)
    sk = winners.column("sk").to_numpy(zero_copy_only=False).astype(np.int64)
    bal = s_bal[sk]
    names = s_names[sk]
    nns = np.array([nname.get(int(n), "") for n in s_nat[sk]], dtype=object)
    # Q2 ordering: balance desc, nation, supplier, part (total order —
    # one row per part)
    order = np.lexsort((pk, names, nns, -bal))
    return pa.table(
        {
            "s_acctbal_cents": pa.array(bal[order], pa.int64()),
            "s_name": pa.array(names[order].tolist(), pa.string()),
            "n_name": pa.array(nns[order].tolist(), pa.string()),
            "p_partkey": pa.array(pk[order], pa.int64()),
        }
    )


def important_parts(
    sf_dir: str,
    nation: str = "NATION_1",
    permille: int = 1000,
    num_partitions: int | None = None,
):
    """TPC-H Q11 shape: parts whose traded value (from one nation's
    suppliers) exceeds a fixed fraction of the GLOBAL total — the
    global-scalar-subquery + grouped-sum plan.

    Plan: the nation's supplier keys are a broadcast membership array
    that prunes lineitem per batch BEFORE any exchange; per-batch
    partials pre-combine (partkey → Σ value cents) so the single
    splitmix-partitioned shuffle carries one row per (partkey, block);
    per-partition segment sums produce exact per-part values, the
    grand total is the driver's O(parts) reduce over those bounded
    rows, and the share filter ``value·permille > total`` is exact
    integer — no float division to diverge from the oracle.  One
    shuffle total; nothing fact-sized is materialized."""
    import pyarrow.parquet as pq_

    from crawl_ray.pipelines.stats import _splitmix64

    num_partitions = num_partitions or _default_partitions()

    nat = pq_.read_table(f"{sf_dir}/nation.parquet")
    nkeys = {
        r["n_nationkey"] for r in nat.to_pylist() if r["n_name"] == nation
    }
    sup = pq_.read_table(
        f"{sf_dir}/supplier.parquet", columns=["s_suppkey", "s_nationkey"]
    )
    skeys = sup.column("s_suppkey").to_numpy(zero_copy_only=False).astype(np.int64)
    hi = int(skeys.max()) + 1
    keep = np.zeros(hi, dtype=bool)
    snat = sup.column("s_nationkey").to_numpy(zero_copy_only=False).astype(np.int64)
    keep[skeys] = np.isin(
        snat, np.fromiter(nkeys, dtype=np.int64)
    ) if nkeys else False
    keep_ref = ray.put(keep)

    def value_partial(b: pa.Table) -> pa.Table:
        kp = ray.get(keep_ref)
        sk = b.column("l_suppkey").to_numpy(zero_copy_only=False).astype(np.int64)
        mask = kp[np.clip(sk, 0, len(kp) - 1)]
        b = b.filter(pa.array(mask))
        t = pa.table(
            {
                "pk": b.column("l_partkey").cast(pa.int64()),
                "value_c": _cents(b.column("l_extendedprice")),
            }
        )
        out = rename_select(
            t.group_by("pk").aggregate([("value_c", "sum")]),
            {"pk": "pk", "value_c_sum": "value_c"},
        )
        part = (
            _splitmix64(
                out.column("pk").to_numpy(zero_copy_only=False).astype(np.uint64)
            )
            % np.uint64(num_partitions)
        ).astype(np.int64)
        return out.append_column("part", pa.array(part, pa.int64()))

    def per_part_sum(block: pa.Table) -> pa.Table:
        empty = pa.table(
            {"p_partkey": pa.array([], pa.int64()),
             "value_c": pa.array([], pa.int64())}
        )
        if block.num_rows == 0:
            return empty
        pk = block.column("pk").to_numpy(zero_copy_only=False)
        v = block.column("value_c").to_numpy(zero_copy_only=False)
        upk, inv = np.unique(pk, return_inverse=True)
        sums = np.bincount(inv, weights=v.astype(np.float64)).astype(np.int64)
        return pa.table(
            {"p_partkey": pa.array(upk, pa.int64()),
             "value_c": pa.array(sums, pa.int64())}
        )

    per_part = collect_table(
        _read(sf_dir, "lineitem", ["l_partkey", "l_suppkey", "l_extendedprice"])
        .map_batches(value_partial, batch_format="pyarrow", zero_copy_batch=True)
        .repartition(num_partitions)
        .groupby("part")
        .map_groups(per_part_sum, batch_format="pyarrow")
    )
    if per_part.num_rows == 0 or "p_partkey" not in per_part.column_names:
        return pa.table(
            {"p_partkey": pa.array([], pa.int64()),
             "value_c": pa.array([], pa.int64())}
        )
    pk = per_part.column("p_partkey").to_numpy(zero_copy_only=False)
    v = per_part.column("value_c").to_numpy(zero_copy_only=False)
    total = int(v.sum())
    sel = v * permille > total
    pk, v = pk[sel], v[sel]
    order = np.lexsort((pk, -v))
    return pa.table(
        {"p_partkey": pa.array(pk[order], pa.int64()),
         "value_c": pa.array(v[order], pa.int64())}
    )


def referential_orphans(sf_dir: str, num_partitions: int | None = None):
    """Data-quality gate: orphan-row counts for every fact → dimension
    reference in the star schema — the pre-flight integrity check a
    production pipeline runs before shipping a corpus (a non-zero row
    here means an upstream export dropped keys).

    Plan by side size: dimension key sets (customer, part, supplier)
    are broadcast membership arrays probed inside ONE lineitem/orders
    pass each (per-batch partial counts, driver sum — zero shuffle);
    the fact→fact reference lineitem.l_orderkey → orders is the native
    ``left_anti`` hash join (both sides fact-sized, nothing broadcast),
    counting surviving orphans.  Output: one bounded row per relation.
    """
    import pyarrow.parquet as pq_

    num_partitions = num_partitions or _default_partitions()

    def key_set(table: str, col: str) -> "np.ndarray":
        t = pq_.read_table(f"{sf_dir}/{table}.parquet", columns=[col])
        return np.unique(
            t.column(col).to_numpy(zero_copy_only=False).astype(np.int64)
        )

    checks = [
        ("orders.o_custkey->customer", "orders", "o_custkey",
         key_set("customer", "c_custkey")),
        ("lineitem.l_partkey->part", "lineitem", "l_partkey",
         key_set("part", "p_partkey")),
        ("lineitem.l_suppkey->supplier", "lineitem", "l_suppkey",
         key_set("supplier", "s_suppkey")),
    ]
    relations, counts = [], []
    for label, table, col, keys in checks:
        keys_ref = ray.put(keys)

        def orphan_partial(batch: pa.Table, _col=col, _ref=keys_ref) -> pa.Table:
            ks = ray.get(_ref)
            vals = batch.column(_col).to_numpy(zero_copy_only=False).astype(np.int64)
            pos = np.searchsorted(ks, vals)
            hit = (pos < len(ks)) & (ks[np.minimum(pos, len(ks) - 1)] == vals)
            return pa.table({"n": pa.array([int((~hit).sum())], pa.int64())})

        part_counts = collect_table(
            _read(sf_dir, table, [col]).map_batches(
                orphan_partial, batch_format="pyarrow", zero_copy_batch=True
            )
        )
        relations.append(label)
        counts.append(
            int(part_counts.column("n").to_numpy(zero_copy_only=False).sum())
            if part_counts.num_rows else 0
        )

    # fact -> fact: lineitem.l_orderkey -> orders via distributed anti-join
    li = _read(sf_dir, "lineitem", ["l_orderkey"]).map_batches(
        lambda b: pa.table(
            {"l_orderkey": b.column("l_orderkey").cast(pa.int64())}
        ),
        batch_format="pyarrow", zero_copy_batch=True,
    )
    orders = _read(sf_dir, "orders", ["o_orderkey"]).map_batches(
        lambda b: pa.table(
            {"o_orderkey": b.column("o_orderkey").cast(pa.int64())}
        ),
        batch_format="pyarrow", zero_copy_batch=True,
    )
    n_orphans = _cjoin(
        li, orders, "left_anti", num_partitions,
        on=("l_orderkey",), right_on=("o_orderkey",),
    ).count()
    relations.append("lineitem.l_orderkey->orders")
    counts.append(int(n_orphans))
    return pa.table(
        {"relation": pa.array(relations, pa.string()),
         "n_orphans": pa.array(counts, pa.int64())}
    ).sort_by([("relation", "ascending")])


def basket_pairs(
    sf_dir: str,
    min_support: int = 2,
    k: int = 50,
    num_partitions: int | None = None,
    order_cap: int = 256,
):
    """Market-basket association pairs: part pairs co-occurring in the
    same order, ranked by integer lift ``1000·N·s // (c_a·c_b)`` with a
    support floor — the classic co-purchase mining shape (word-pair
    :func:`crawl_ray.pipelines.textops.collocations`' transactional
    twin).

    Orders span input blocks, so pair generation CANNOT be per-batch:
    distinct (order, part) partials ride ONE ``splitmix(order) % P``
    shuffle (orders partition-disjoint ⇒ per-order triu pairs are
    complete and exact; degenerate baskets > ``order_cap`` parts are
    truncated to their ``order_cap`` lowest part keys rather than
    exploding quadratically — far above any real basket here), per-partition pair counts pre-combine, and the
    cross-partition pair merge is the bounded driver combine over
    (pairs-per-partition) partials.  Part order-frequencies are a
    parts-bounded histogram; N_orders is a scalar.  Top-``k`` by
    (lift desc, pa, pb) — a deterministic total order."""
    from crawl_ray.pipelines.stats import _splitmix64

    P = num_partitions or _default_partitions()

    def op_partial(b: pa.Table) -> pa.Table:
        ok = b.column("l_orderkey").to_numpy(zero_copy_only=False).astype(np.int64)
        pk = b.column("l_partkey").to_numpy(zero_copy_only=False).astype(np.int64)
        uniq = np.unique(np.stack([ok, pk], axis=1), axis=0)
        part = (
            _splitmix64(uniq[:, 0].astype(np.uint64)) % np.uint64(P)
        ).astype(np.int64)
        return pa.table(
            {"ok": pa.array(uniq[:, 0], pa.int64()),
             "pk": pa.array(uniq[:, 1], pa.int64()),
             "part": pa.array(part, pa.int64())}
        )

    _empty_pairs = pa.table(
        {"pa_": pa.array([], pa.int64()),
         "pb_": pa.array([], pa.int64()),
         "s": pa.array([], pa.int64())}
    )

    def pair_counts(group: pa.Table) -> pa.Table:
        if group.num_rows == 0 or "ok" not in group.column_names:
            return _empty_pairs
        ok = group.column("ok").to_numpy(zero_copy_only=False)
        pk = group.column("pk").to_numpy(zero_copy_only=False)
        uniq = np.unique(np.stack([ok, pk], axis=1), axis=0)
        ok, pk = uniq[:, 0], uniq[:, 1]
        starts = np.flatnonzero(np.r_[True, ok[1:] != ok[:-1]])
        lens = np.minimum(np.diff(np.r_[starts, len(ok)]), order_cap)
        pas, pbs = [], []
        for width in np.unique(lens):
            if width < 2:
                continue
            sel = starts[lens == width]
            # vectorized across all orders of this basket size
            block = pk[(sel[:, None] + np.arange(width)[None, :])]
            ia, ib = np.triu_indices(int(width), 1)
            pas.append(block[:, ia].ravel())
            pbs.append(block[:, ib].ravel())
        if not pas:
            return _empty_pairs
        a = np.concatenate(pas)
        b2 = np.concatenate(pbs)
        lo = np.minimum(a, b2)
        hi_ = np.maximum(a, b2)
        key = lo * np.int64(1 << 32) + hi_
        keys, cnt = np.unique(key, return_counts=True)
        return pa.table(
            {"pa_": pa.array(keys >> np.int64(32), pa.int64()),
             "pb_": pa.array(keys & np.int64((1 << 32) - 1), pa.int64()),
             "s": pa.array(cnt.astype(np.int64), pa.int64())}
        )

    op = _read(sf_dir, "lineitem", ["l_orderkey", "l_partkey"]).map_batches(
        op_partial, batch_format="pyarrow", zero_copy_batch=True
    ).repartition(P).materialize()

    pairs = collect_table(
        op.groupby("part").map_groups(pair_counts, batch_format="pyarrow")
    )
    if pairs.num_rows == 0 or "pa_" not in pairs.column_names:
        return pa.table(
            {"pa": pa.array([], pa.int64()), "pb": pa.array([], pa.int64()),
             "support": pa.array([], pa.int64()),
             "lift_milli": pa.array([], pa.int64())}
        )
    merged = rename_select(
        pairs.group_by(["pa_", "pb_"]).aggregate([("s", "sum")]),
        {"pa_": "pa_", "pb_": "pb_", "s_sum": "s"},
    )
    # part order-frequency histogram (parts-bounded) + N_orders scalar
    def freq_partial(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or "pk" not in b.column_names:
            return pa.table(
                {"pk": pa.array([], pa.int64()),
                 "c": pa.array([], pa.int64()),
                 "n_orders": pa.array([], pa.int64())}
            )
        pk = b.column("pk").to_numpy(zero_copy_only=False)
        ok = b.column("ok").to_numpy(zero_copy_only=False)
        # per-batch partials may repeat an (order, part) row when an
        # order spans input blocks — re-dedup before counting (the
        # pair kernel does the same)
        uniq = np.unique(np.stack([ok, pk], axis=1), axis=0)
        ok, pk = uniq[:, 0], uniq[:, 1]
        v, c = np.unique(pk, return_counts=True)
        return pa.table(
            {"pk": pa.array(v, pa.int64()),
             "c": pa.array(c.astype(np.int64), pa.int64()),
             "n_orders": pa.array(
                 np.r_[np.int64(len(np.unique(ok))),
                       np.zeros(len(v) - 1, np.int64)]
                 if len(v) else np.empty(0, np.int64),
                 pa.int64(),
             )}
        )

    # op rows are distinct (order, part) and partition-disjoint by order
    fr = collect_table(
        op.groupby("part").map_groups(freq_partial, batch_format="pyarrow")
    )
    freq = rename_select(
        fr.group_by("pk").aggregate([("c", "sum")]), {"pk": "pk", "c_sum": "c"}
    )
    n_orders = int(fr.column("n_orders").to_numpy(zero_copy_only=False).sum())
    fpk = freq.column("pk").to_numpy(zero_copy_only=False)
    fc = freq.column("c").to_numpy(zero_copy_only=False)
    order_f = np.argsort(fpk)
    fpk, fc = fpk[order_f], fc[order_f]

    a = merged.column("pa_").to_numpy(zero_copy_only=False)
    b2 = merged.column("pb_").to_numpy(zero_copy_only=False)
    s = merged.column("s").to_numpy(zero_copy_only=False)
    keep = s >= min_support
    a, b2, s = a[keep], b2[keep], s[keep]
    ca = fc[np.searchsorted(fpk, a)]
    cb = fc[np.searchsorted(fpk, b2)]
    lift = (1000 * np.int64(n_orders) * s) // (ca * cb)
    order2 = np.lexsort((b2, a, -lift))[:k]
    return pa.table(
        {"pa": pa.array(a[order2], pa.int64()),
         "pb": pa.array(b2[order2], pa.int64()),
         "support": pa.array(s[order2], pa.int64()),
         "lift_milli": pa.array(lift[order2], pa.int64())}
    )
