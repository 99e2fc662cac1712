"""Training-corpus export sink: hash-sharded JSONL with a manifest.

Corpora ship as JSONL shards; the sink mirrors the engine's
parquet-sink discipline (SURVEY.md §2.1 S4): deterministic shard
assignment (``doc_id % n_shards`` — stable under any partitioning or
cluster size), one part file per (block, shard) written TASK-side
(never funneled through the driver), a ``_SUCCESS`` marker for
resumability (a re-run skips a finished export), and a manifest the
caller can verify against the source row counts.
"""

from __future__ import annotations

import hashlib
import json
import pathlib

import numpy as np
import pyarrow as pa

import ray
import ray.data

from crawl_ray.util import collect_table, rename_select

__all__ = [
    "export_corpus_jsonl",
    "corpus_export_manifest",
    "jsonl_corpus_stats",
    "export_corpus_parquet",
    "export_prepped_parquet",
    "parquet_export_manifest",
    "parquet_corpus_stats",
]


def _fresh_export_root(kind: str, sf_dir: str, n_shards: int):
    """Content-addressed export root with the sink discipline shared by
    every corpus sink: root-is-shared assertion (a configured
    ``CRAWL_RAY_STORE_ROOT`` attests shared storage; an unconfigured
    node-local default refuses multi-node runs — crawl_ray.storage),
    finished root (``_SUCCESS`` present) returned as-is, unfinished
    root wiped before reuse (a dead run's batch boundaries differ;
    stale parts would double-count).  Returns ``(root, finished)``."""
    import shutil

    from crawl_ray.storage import check_multinode_storage, store_root

    token = hashlib.blake2b(
        f"{sf_dir}:{n_shards}".encode(), digest_size=8
    ).hexdigest()
    root = store_root() / f"{kind}_{token}"
    if (root / "_SUCCESS").exists():
        return root, True
    check_multinode_storage(f"export_corpus_{kind}", root)
    if root.exists():
        shutil.rmtree(root)
    root.mkdir(parents=True, exist_ok=True)
    for s in range(n_shards):
        (root / f"shard={s}").mkdir(exist_ok=True)
    return root, False


def _commit_manifest(root: pathlib.Path, parts: pa.Table) -> None:
    """Aggregate per-block (shard, n_rows) partials, write
    manifest.json, and drop the _SUCCESS marker — the ONE commit
    sequence both export sinks share (shard accounting must not drift
    between the jsonl and parquet layouts)."""
    manifest = parts.group_by(["shard"]).aggregate([("n_rows", "sum")])
    manifest = rename_select(
        manifest, {"shard": "shard", "n_rows_sum": "n_rows"}
    ).sort_by("shard")
    with open(root / "manifest.json", "w") as f:
        json.dump(
            {int(s): int(n) for s, n in zip(
                manifest.column("shard").to_pylist(),
                manifest.column("n_rows").to_pylist())},
            f, sort_keys=True)
    (root / "_SUCCESS").touch()


def _manifest_table(root: pathlib.Path) -> pa.Table:
    m = json.loads((root / "manifest.json").read_text())
    shards = sorted(int(k) for k in m)
    return pa.table(
        {"shard": pa.array(shards, pa.int64()),
         "n_rows": pa.array([m[str(s)] for s in shards], pa.int64())}
    )


def _roundtrip_shard_stats(ds, n_shards: int) -> pa.Table:
    """Per-shard doc/char counts over a re-read export — the shared
    roundtrip proof for both sink formats."""
    import pyarrow.compute as pc

    def partial(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy(
            zero_copy_only=False
        ).astype(np.int64)
        n_chars = pc.utf8_length(batch.column("text")).to_numpy(
            zero_copy_only=False
        ).astype(np.int64)
        shard = ids % n_shards
        t = pa.table(
            {"shard": pa.array(shard, pa.int64()),
             "n_docs": pa.array(np.ones(len(ids), np.int64), pa.int64()),
             "n_chars": pa.array(n_chars, pa.int64())}
        )
        g = t.group_by(["shard"]).aggregate(
            [("n_docs", "sum"), ("n_chars", "sum")]
        )
        return rename_select(
            g, {"shard": "shard", "n_docs_sum": "n_docs",
                "n_chars_sum": "n_chars"}
        )

    parts = collect_table(
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    )
    out = parts.group_by(["shard"]).aggregate(
        [("n_docs", "sum"), ("n_chars", "sum")]
    )
    return rename_select(
        out, {"shard": "shard", "n_docs_sum": "n_docs",
              "n_chars_sum": "n_chars"}
    ).sort_by("shard")


def export_corpus_jsonl(sf_dir: str, n_shards: int = 8) -> str:
    """Write the documents corpus as ``shard=K/part-*.jsonl`` under a
    content-addressed /tmp root; returns the root path.  Idempotent:
    a finished export (marker present) is never rewritten; an
    UNFINISHED root (crash before the marker) is wiped first — a
    re-run's batch boundaries can differ, and stale part files from
    the dead run would otherwise double-count rows."""
    root, finished = _fresh_export_root("jsonl", sf_dir, n_shards)
    if finished:
        return str(root)

    def write_block(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
        if not len(ids):
            return pa.table({"shard": pa.array([], pa.int64()),
                             "n_rows": pa.array([], pa.int64())})
        shard = ids % n_shards
        texts = batch.column("text").to_pylist()
        langs = batch.column("lang").to_pylist()
        out_s, out_n = [], []
        for s in np.unique(shard).tolist():
            m = shard == s
            # part name = min/max doc_id + a content token over the
            # shard's id vector: deterministic → a retried task
            # overwrites its own file, never duplicates; the token is
            # what actually prevents two DIFFERENT blocks that share a
            # min/max (possible when doc_id is non-unique) from
            # clobbering one part (min/max alone could not)
            tok = hashlib.blake2b(
                ids[m].tobytes(), digest_size=6
            ).hexdigest()
            part = (
                root / f"shard={s}"
                / f"part-{int(ids[m].min())}-{int(ids[m].max())}-{tok}.jsonl"
            )
            # write-to-tmp + atomic rename: a task cancelled or killed
            # mid-write (retry, limit-cancelled re-execution) must never
            # leave a truncated part under the final name — readers glob
            # only *.jsonl, so an orphaned .tmp is invisible, and a
            # retry's os.replace is idempotent
            tmp = part.with_suffix(".jsonl.tmp")
            with open(tmp, "w", encoding="utf-8") as f:
                for i in np.flatnonzero(m).tolist():
                    f.write(json.dumps(
                        {"doc_id": int(ids[i]), "text": texts[i],
                         "lang": langs[i]},
                        ensure_ascii=False, sort_keys=True) + "\n")
            tmp.replace(part)
            out_s.append(int(s))
            out_n.append(int(m.sum()))
        return pa.table({"shard": pa.array(out_s, pa.int64()),
                         "n_rows": pa.array(out_n, pa.int64())})

    parts = collect_table(
        ray.data.read_parquet(
            f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "lang"]
        ).map_batches(write_block, batch_format="pyarrow", zero_copy_batch=True)
    )
    _commit_manifest(root, parts)
    return str(root)


def corpus_export_manifest(sf_dir: str, n_shards: int = 8) -> pa.Table:
    """The export's manifest as a table (shard, n_rows) — the
    driver-oracled view of :func:`export_corpus_jsonl` (counts must
    equal the source's ``doc_id % n_shards`` histogram)."""
    root = pathlib.Path(export_corpus_jsonl(sf_dir, n_shards))
    return _manifest_table(root)


def jsonl_corpus_stats(sf_dir: str, n_shards: int = 8) -> pa.Table:
    """Read the exported JSONL shards BACK through
    ``ray.data.read_json`` (the second source format besides parquet —
    SURVEY.md §2.1) and aggregate per-shard doc and char counts; the
    oracle computes the same histogram from the parquet source, so a
    lossy export OR a broken JSON read breaks the match."""
    root = pathlib.Path(export_corpus_jsonl(sf_dir, n_shards))
    files = sorted(str(f) for f in root.glob("shard=*/part-*.jsonl"))
    return _roundtrip_shard_stats(ray.data.read_json(files), n_shards)

def _parquet_block_writer(root: pathlib.Path, n_shards: int):
    """Task-side sharded parquet writer (doc_id % n_shards layout,
    content-token part names, tmp+rename) — shared by the raw-corpus
    and prepped-corpus sinks."""
    import pyarrow.parquet as pq

    def write_block(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy(
            zero_copy_only=False
        ).astype(np.int64)
        if not len(ids):
            return pa.table({"shard": pa.array([], pa.int64()),
                             "n_rows": pa.array([], pa.int64())})
        shard = ids % n_shards
        out_s, out_n = [], []
        for s in np.unique(shard).tolist():
            m = shard == s
            part = (
                root / f"shard={s}"
                / (
                    f"part-{int(ids[m].min())}-{int(ids[m].max())}-"
                    + hashlib.blake2b(
                        ids[m].tobytes(), digest_size=6
                    ).hexdigest()
                    + ".parquet"
                )
            )
            tmp = part.with_suffix(".parquet.tmp")
            # Arrow filter is zero-copy-ish per column; no row loop
            pq.write_table(batch.filter(pa.array(m)), tmp)
            tmp.replace(part)
            out_s.append(int(s))
            out_n.append(int(m.sum()))
        return pa.table({"shard": pa.array(out_s, pa.int64()),
                         "n_rows": pa.array(out_n, pa.int64())})

    return write_block


def export_prepped_parquet(sf_dir: str, prep_ds, n_shards: int = 8) -> str:
    """Export the PREPPED corpus — the surviving documents of
    ``training_corpus_prep`` joined back to their text, each row
    carrying its packed ``bin_id`` — through the same resumable
    sharded layout as :func:`export_corpus_parquet`.  A distributed
    inner join (never a broadcast of the survivor set: at web scale it
    is corpus-sized).  NOT cached: the CLI one-shot rebuilds its root
    every invocation (prep parameters vary per call)."""
    import shutil

    from crawl_ray.storage import check_multinode_storage, store_root

    token = hashlib.blake2b(
        f"prepped:{sf_dir}:{n_shards}".encode(), digest_size=8
    ).hexdigest()
    root = store_root() / f"prepped_{token}"
    check_multinode_storage("export_prepped_parquet", root)
    if root.exists():
        shutil.rmtree(root)
    root.mkdir(parents=True, exist_ok=True)
    for s in range(n_shards):
        (root / f"shard={s}").mkdir(exist_ok=True)

    import ray.data as rd

    docs = rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "lang"]
    )
    num_partitions = max(4, int(ray.cluster_resources().get("CPU", 8)) // 4)
    from crawl_ray.util import normalize_schema

    i64 = pa.int64()
    # prep_ds's upstream groupby/sort stages can emit zero-column empty
    # blocks that crash the aggregator's Arrow join — normalize first
    prep_n = normalize_schema(
        prep_ds,
        {"pid": i64, "n_tokens": i64, "bin_id": i64},
        rename={"doc_id": "pid"},  # avoid join key-name collision
        coalesce=num_partitions,
    )
    # Arrow's hash join rejects an all-empty side (normalize_schema's
    # fix UDF is short-circuited on zero-row blocks, so the rename to
    # "pid" never lands) — a fully-filtered prep or an empty documents
    # table is a legal empty export, not a crash
    import pyarrow.parquet as pq_

    n_docs = pq_.read_metadata(f"{sf_dir}/documents.parquet").num_rows
    if n_docs == 0 or prep_n.count() == 0:
        _commit_manifest(root, pa.table({
            "shard": pa.array([], pa.int64()),
            "n_rows": pa.array([], pa.int64()),
        }))
        return str(root)
    joined = docs.repartition(num_partitions).join(
        prep_n, "inner", num_partitions, on=("doc_id",), right_on=("pid",),
    )
    parts = collect_table(
        joined.map_batches(
            _parquet_block_writer(root, n_shards),
            batch_format="pyarrow", zero_copy_batch=True,
        )
    )
    _commit_manifest(root, parts)
    return str(root)


def export_corpus_parquet(sf_dir: str, n_shards: int = 8) -> str:
    """Parquet twin of :func:`export_corpus_jsonl`: the documents corpus
    re-sharded as ``shard=K/part-*.parquet`` — the resumable partitioned
    layout the 100-TB path ships (one directory per shard, `_SUCCESS`
    marker, a failed run skips finished roots).  Unlike the JSONL sink
    (per-row ``json.dumps``), the part write here is a **zero-copy Arrow
    slice → ``pq.write_table``** — no Python per row — so this is also
    the fast path of the two."""
    import pyarrow.parquet as pq

    root, finished = _fresh_export_root("parquet", sf_dir, n_shards)
    if finished:
        return str(root)

    parts = collect_table(
        ray.data.read_parquet(
            f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "lang"]
        ).map_batches(
            _parquet_block_writer(root, n_shards),
            batch_format="pyarrow", zero_copy_batch=True,
        )
    )
    _commit_manifest(root, parts)
    return str(root)


def parquet_export_manifest(sf_dir: str, n_shards: int = 8) -> pa.Table:
    """Manifest view of :func:`export_corpus_parquet` (shard, n_rows) —
    oracled against the source's ``doc_id % n_shards`` histogram."""
    root = pathlib.Path(export_corpus_parquet(sf_dir, n_shards))
    return _manifest_table(root)


def parquet_corpus_stats(sf_dir: str, n_shards: int = 8) -> pa.Table:
    """Read the parquet shards BACK through ``ray.data.read_parquet``
    and aggregate per-shard doc/char counts — a lossy export or a
    truncated part breaks the oracle match, so this is the roundtrip
    proof for the parquet sink (the JSONL twin proves read_json)."""
    root = pathlib.Path(export_corpus_parquet(sf_dir, n_shards))
    files = sorted(str(f) for f in root.glob("shard=*/part-*.parquet"))
    return _roundtrip_shard_stats(ray.data.read_parquet(files), n_shards)
