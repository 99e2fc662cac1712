"""End-to-end LLM training-data prep — the data-pipeline twin of
``examples/imdb_like.py``'s crawler assembly: compose the repo's
corpus operators into the chain a training run actually ships.

    near-dup removal  →  quality/lang filter + exact dedup + packing  →  resumable Parquet export
    (dedup_corpus)       (training_corpus_prep)                          (export_corpus_parquet)

Stage boundaries are PARQUET DIRECTORIES, mirroring the engine's
frontier-shard checkpoints: each stage streams block-wise out of Ray
Data into a partitioned directory the next stage reads back, so a
killed run re-enters at the last finished stage instead of restarting
(the `_SUCCESS`-marker contract the export sink formalizes).  Nothing
in the chain materializes the corpus on the driver — dedup_corpus's
drop set stays a Dataset through the anti-join, the packer is a
distributed ordered prefix sum, and the export writes zero-copy Arrow
slices task-side.

Run it (no network; uses the synthetic sf0.001 documents table):

    python examples/corpus_prep.py [sf_dir]
"""

import json
import os
import shutil
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import ray


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    if not ray.is_initialized():
        ray.init(address="local", include_dashboard=False)

    from crawl_ray.pipelines.dedup import dedup_corpus
    from crawl_ray.pipelines.textops import training_corpus_prep
    from crawl_ray.sources.export import export_corpus_parquet
    from crawl_ray.storage import set_store_root

    stage_root = "/tmp/crawl_ray_examples/corpus_prep"
    shutil.rmtree(stage_root, ignore_errors=True)

    # Stage 1: near-duplicate removal (minhash-LSH candidates →
    # distributed Jaccard verify → connected components → anti-join).
    n_in = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id"]
    ).count()
    survivors = dedup_corpus(sf_dir)
    # stage boundary: a directory of parquet parts named like the
    # input table, so downstream operators read it as a corpus dir
    stage1 = f"{stage_root}/stage1"
    survivors.write_parquet(f"{stage1}/documents.parquet")
    n_dedup = ray.data.read_parquet(
        f"{stage1}/documents.parquet", columns=["doc_id"]
    ).count()

    # Stage 2: fused quality + language filter → exact content dedup
    # (keep-first) → capacity-bin sequence packing, one shuffle total.
    packed = training_corpus_prep(stage1)
    n_packed = (
        packed.count() if isinstance(packed, ray.data.Dataset)
        else packed.num_rows
    )

    # Stage 3: resumable partitioned-Parquet export of the deduped
    # corpus (shard dirs + manifest + _SUCCESS; a re-run skips it).
    set_store_root(f"{stage_root}/exports")
    export_root = export_corpus_parquet(stage1)
    n_shards = len([
        d for d in os.listdir(export_root) if d.startswith("shard=")
    ])

    print(json.dumps({
        "sf_dir": sf_dir,
        "docs_in": n_in,
        "docs_after_near_dup": n_dedup,
        "near_dup_dropped": n_in - n_dedup,
        "packed_rows": n_packed,
        "export_root": str(export_root),
        "export_shards": n_shards,
    }))
    ray.shutdown()


if __name__ == "__main__":
    main()
