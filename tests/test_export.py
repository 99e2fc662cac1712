"""JSONL corpus export sink: manifest parity + byte-level roundtrip."""

import json
import pathlib

import pyarrow.parquet as pq

from crawl_ray.sources.export import corpus_export_manifest, export_corpus_jsonl

SF = "/root/testdata/sf0.001"


def test_export_roundtrip_and_resume(ray_session, tmp_path):
    root = pathlib.Path(export_corpus_jsonl(SF))
    # resumable: second call returns the same finished root instantly
    assert export_corpus_jsonl(SF) == str(root)
    src = pq.read_table(f"{SF}/documents.parquet",
                        columns=["doc_id", "text", "lang"])
    expect = {
        r["doc_id"]: r for r in src.to_pylist()
    }
    got = {}
    for f in root.glob("shard=*/part-*.jsonl"):
        shard = int(f.parent.name.split("=")[1])
        for line in f.read_text(encoding="utf-8").splitlines():
            row = json.loads(line)
            assert row["doc_id"] % 8 == shard
            got[row["doc_id"]] = row
    assert len(got) == src.num_rows
    for did, row in got.items():
        assert row["text"] == expect[did]["text"]
        assert row["lang"] == expect[did]["lang"]
    # manifest counts match the files
    m = corpus_export_manifest(SF).to_pandas()
    assert int(m.n_rows.sum()) == src.num_rows


def test_export_wipes_unfinished_root(ray_session):
    """A crashed export (no _SUCCESS) must be wiped on re-run so stale
    part files from different batch boundaries can't double-count."""
    import hashlib
    import shutil

    token = hashlib.blake2b(f"{SF}:8".encode(), digest_size=8).hexdigest()
    root = pathlib.Path(f"/tmp/crawl_ray_runs/jsonl_{token}")
    shutil.rmtree(root, ignore_errors=True)
    # simulate a dead run: stale part in a shard dir, NO _SUCCESS marker
    (root / "shard=0").mkdir(parents=True)
    stale = root / "shard=0" / "part-999999.jsonl"
    stale.write_text('{"doc_id": 999999, "text": "stale", "lang": "xx"}\n')
    out = pathlib.Path(export_corpus_jsonl(SF))
    assert out == root and (root / "_SUCCESS").exists()
    assert not stale.exists()  # wiped, not double-counted
    n_rows = sum(
        len(f.read_text().splitlines()) for f in root.glob("shard=*/*.jsonl")
    )
    src_rows = pq.read_metadata(f"{SF}/documents.parquet").num_rows
    assert n_rows == src_rows


def test_parquet_export_roundtrip_and_resume(ray_session):
    from crawl_ray.sources.export import (
        export_corpus_parquet,
        parquet_export_manifest,
    )

    root = pathlib.Path(export_corpus_parquet(SF))
    assert export_corpus_parquet(SF) == str(root)  # finished root reused
    src = pq.read_table(f"{SF}/documents.parquet",
                        columns=["doc_id", "text", "lang"])
    expect = {r["doc_id"]: r for r in src.to_pylist()}
    got = {}
    for f in root.glob("shard=*/part-*.parquet"):
        shard = int(f.parent.name.split("=")[1])
        for row in pq.read_table(f).to_pylist():
            assert row["doc_id"] % 8 == shard
            got[row["doc_id"]] = row
    assert len(got) == src.num_rows
    for did, row in got.items():
        assert row["text"] == expect[did]["text"]
        assert row["lang"] == expect[did]["lang"]
    m = parquet_export_manifest(SF).to_pandas()
    assert int(m.n_rows.sum()) == src.num_rows


def test_parquet_export_wipes_unfinished_root(ray_session):
    from crawl_ray.sources.export import export_corpus_parquet

    root = pathlib.Path(export_corpus_parquet(SF))
    # simulate a crash: drop the marker, plant a stale part
    (root / "_SUCCESS").unlink()
    stale = root / "shard=0" / "part-999999-999999.parquet"
    stale.write_bytes(b"junk")
    root2 = pathlib.Path(export_corpus_parquet(SF))
    assert root2 == root
    assert not stale.exists()
    assert (root / "_SUCCESS").exists()
