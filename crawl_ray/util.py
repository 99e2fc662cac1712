"""Small shared helpers."""

from __future__ import annotations

import pyarrow as pa

import ray

__all__ = ["collect_table"]


def collect_table(ds) -> pa.Table:
    """Materialize a (small!) Dataset to one Arrow table on the caller.

    Only for bounded results (aggregates, top-k, per-round outputs) —
    never call on a full-corpus dataset."""
    if isinstance(ds, pa.Table):
        return ds
    tables = [t for t in ray.get(ds.to_arrow_refs())]
    tables = [t if isinstance(t, pa.Table) else pa.Table.from_batches([t]) for t in tables]
    non_empty = [t for t in tables if t.num_rows]
    if not non_empty:
        return tables[0] if tables else pa.table({})
    return pa.concat_tables(non_empty, promote_options="default").combine_chunks()
