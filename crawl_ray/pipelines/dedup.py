"""Deduplication operators for training-data pipelines.

* :func:`exact_dedup` — hash-partition + per-group keep-first (the
  shuffle-exact path; SQL-oracle-checkable).
* :func:`minhash_lsh_pairs` — shingle → minhash → LSH band buckets →
  candidate pairs verified by true Jaccard.  The banding groupby IS the
  scale path: candidates are generated per bucket, never all-pairs.
* :func:`simhash_64` — 64-bit simhash per document.
* :func:`ngram_jaccard_pairs` — exact n-gram Jaccard over LSH
  candidates (re-uses the minhash machinery with verification always
  on).
* :func:`embedding_near_dup` — cosine near-duplicate pairs over the
  embeddings table via coarse bucketing (sign-LSH) + in-bucket
  verification.

All hashing is FNV-1a with stable string derivations — deterministic
across runs/processes.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data

from crawl_ray.util import collect_table

from crawl_ray.urlnorm import content_hash64_batch, fnv1a64_batch

__all__ = [
    "exact_dedup",
    "minhash_signatures",
    "minhash_lsh_pairs",
    "simhash_64",
    "ngram_jaccard_pairs",
    "embedding_near_dup",
    "embedding_near_dup_exact",
]


def _docs(sf_dir: str, columns=None):
    return ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=columns)


def exact_dedup(sf_dir: str):
    """Exact text dedup: key = 64-bit content hash; keep the lowest
    doc_id per key (deterministic).  Shuffle is keyed by the hash —
    the url_hash-partition dedup pattern (SURVEY.md §2.8)."""

    def add_hash(batch: pa.Table) -> pa.Table:
        # blake2b per row (one C call each): document text is long, so
        # the padded-matrix FNV kernel would cost rows × longest-doc
        return pa.table(
            {
                "doc_id": batch.column("doc_id").cast(pa.int64()),
                "text_hash": pa.array(
                    content_hash64_batch(batch.column("text")), pa.uint64()
                ),
            }
        )

    def keep_first(group: pa.Table) -> pa.Table:
        idx = pc.sort_indices(group, sort_keys=[("doc_id", "ascending")])
        kept = group.take(idx[:1]).select(["doc_id"])
        return kept.append_column("n_dups", pa.array([group.num_rows], pa.int64()))

    ds = _docs(sf_dir, ["doc_id", "text"]).map_batches(
        add_hash, batch_format="pyarrow", zero_copy_batch=True
    )
    return ds.groupby("text_hash").map_groups(keep_first, batch_format="pyarrow")


# -- MinHash / LSH ---------------------------------------------------------


def _minhash_params(n_perm: int) -> tuple[np.ndarray, np.ndarray]:
    """xor-multiply family h_i(x) = (x ^ b_i) * a_i in wrapping uint64
    (a_i odd ⇒ the multiply is a bijection on Z/2^64) — fully
    vectorizable, unlike (a*x+b) mod 2^61-1 which needs 128-bit math."""
    a = fnv1a64_batch([f"mh-a:{i}" for i in range(n_perm)]) | np.uint64(1)
    b = fnv1a64_batch([f"mh-b:{i}" for i in range(n_perm)])
    return a.astype(np.uint64), b.astype(np.uint64)


_SHINGLE_PRIME = np.uint64(0x100000001B3)


def _shingle_hashes(text: str, k: int) -> np.ndarray:
    """Unique k-token shingle hashes, fully vectorized: hash each token
    once (FNV-1a), then combine each window of k token-hashes with a
    polynomial mix — identical token sequences map to identical shingle
    hashes, with no per-shingle string joins."""
    toks = text.split()
    if not toks:
        return np.zeros(1, dtype=np.uint64)
    th = fnv1a64_batch(toks)
    if len(toks) < k:
        h = np.uint64(0xCBF29CE484222325)
        with np.errstate(over="ignore"):
            for t in th:
                h = (h ^ t) * _SHINGLE_PRIME
        return np.array([h], dtype=np.uint64)
    win = np.lib.stride_tricks.sliding_window_view(th, k)
    h = np.full(len(win), 0xCBF29CE484222325, dtype=np.uint64)
    with np.errstate(over="ignore"):
        for j in range(k):
            h = (h ^ win[:, j]) * _SHINGLE_PRIME
    return np.unique(h)


def _signature(shingles: np.ndarray, a: np.ndarray, b: np.ndarray) -> np.ndarray:
    # one (n_perm × n_shingles) broadcast: min over wrapped products
    vals = (shingles[None, :] ^ b[:, None]) * a[:, None]
    return vals.min(axis=1)


def minhash_signatures(sf_dir: str, n_perm: int = 32, k: int = 3):
    """MinHash signature per document.  Plain tasks (no actor pool): the
    permutation params are a trivial derivation, and a bounded actor
    pool would cap the parallelism of the sign stage — the hottest part
    of the pipeline — at the pool size."""

    def sign(batch: pa.Table) -> pa.Table:
        a, b = _minhash_params(n_perm)
        texts = batch.column("text").to_pylist()
        sigs = [_signature(_shingle_hashes(t, k), a, b) for t in texts]
        return pa.table(
            {
                "doc_id": batch.column("doc_id").cast(pa.int64()),
                "signature": pa.array(
                    [s.tolist() for s in sigs], pa.list_(pa.uint64())
                ),
            }
        )

    return _docs(sf_dir, ["doc_id", "text"]).map_batches(
        sign, batch_format="pyarrow", batch_size=256, zero_copy_batch=True
    )


def minhash_lsh_pairs(
    sf_dir: str,
    n_perm: int = 32,
    k: int = 3,
    bands: int = 8,
    threshold: float = 0.5,
):
    """Near-dup pairs: band signatures → bucket groupby → per-bucket
    candidate pairs → exact Jaccard verification.

    The only shuffle is keyed by (band, bucket-hash); bucket sizes are
    small by construction, so the pair enumeration never sees the full
    corpus."""
    rows_per_band = n_perm // bands
    sigs = minhash_signatures(sf_dir, n_perm=n_perm, k=k)

    def band_rows(batch: pa.Table) -> pa.Table:
        doc_ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        sigs = np.array(batch.column("signature").to_pylist(), dtype=np.uint64)
        n = len(doc_ids)
        buckets = np.empty((n, bands), dtype=np.uint64)
        band_seeds = fnv1a64_batch([f"band:{b}" for b in range(bands)])
        with np.errstate(over="ignore"):
            for b in range(bands):
                h = np.full(n, band_seeds[b], dtype=np.uint64)
                for j in range(b * rows_per_band, (b + 1) * rows_per_band):
                    h = (h ^ sigs[:, j]) * _SHINGLE_PRIME
                buckets[:, b] = h
        return pa.table(
            {
                "doc_id": pa.array(np.repeat(doc_ids, bands), pa.int64()),
                "bucket": pa.array(buckets.reshape(-1), pa.uint64()),
            }
        )

    banded = sigs.map_batches(band_rows, batch_format="pyarrow")

    def bucket_pairs(group: pa.Table) -> pa.Table:
        ids = sorted(set(group.column("doc_id").to_pylist()))
        a_out, b_out = [], []
        if len(ids) > 1:
            for i in range(len(ids)):
                for j in range(i + 1, len(ids)):
                    a_out.append(ids[i])
                    b_out.append(ids[j])
        return pa.table(
            {
                "doc_a": pa.array(a_out, pa.int64()),
                "doc_b": pa.array(b_out, pa.int64()),
            }
        )

    candidates = collect_table(
        banded.groupby("bucket").map_groups(bucket_pairs, batch_format="pyarrow")
    )
    if candidates.num_rows == 0:
        return pa.table(
            {
                "doc_a": pa.array([], pa.int64()),
                "doc_b": pa.array([], pa.int64()),
                "jaccard_milli": pa.array([], pa.int64()),
            }
        )
    # dedup candidate pairs (same pair can collide in several bands)
    pairs = {
        (a, b)
        for a, b in zip(
            candidates.column("doc_a").to_pylist(),
            candidates.column("doc_b").to_pylist(),
        )
    }
    # verification: stream the corpus, shingling ONLY candidate docs
    # (needed set broadcast once via ray.put; the driver receives just
    # the candidates' shingle sets, never the full table)
    needed_ref = ray.put(frozenset(d for p in pairs for d in p))

    def shingles_of(batch: pa.Table) -> pa.Table:
        needed_set = ray.get(needed_ref)
        ids = batch.column("doc_id").to_pylist()
        keep = [i for i, d in enumerate(ids) if d in needed_set]
        texts = batch.column("text").take(pa.array(keep, pa.int64())).to_pylist()
        return pa.table(
            {
                "doc_id": pa.array([ids[i] for i in keep], pa.int64()),
                "shingles": pa.array(
                    [_shingle_hashes(t, k).tolist() for t in texts],
                    pa.list_(pa.uint64()),
                ),
            }
        )

    sh_tbl = collect_table(
        _docs(sf_dir, ["doc_id", "text"]).map_batches(
            shingles_of, batch_format="pyarrow", zero_copy_batch=True
        )
    )
    sh = {
        d: set(s)
        for d, s in zip(
            sh_tbl.column("doc_id").to_pylist(),
            sh_tbl.column("shingles").to_pylist(),
        )
    }
    a_out, b_out, jac = [], [], []
    for a, b in sorted(pairs):
        inter = len(sh[a] & sh[b])
        union = len(sh[a] | sh[b]) or 1
        j = inter * 1000 // union
        if j >= int(threshold * 1000):
            a_out.append(a)
            b_out.append(b)
            jac.append(j)
    return pa.table(
        {
            "doc_a": pa.array(a_out, pa.int64()),
            "doc_b": pa.array(b_out, pa.int64()),
            "jaccard_milli": pa.array(jac, pa.int64()),
        }
    )


def simhash_64(sf_dir: str):
    """64-bit SimHash over whitespace tokens (vectorized bit counting)."""

    def sim(batch: pa.Table) -> pa.Table:
        texts = batch.column("text").to_pylist()
        out = np.zeros(len(texts), dtype=np.uint64)
        for i, text in enumerate(texts):
            toks = text.split()
            if not toks:
                continue
            hashes = fnv1a64_batch(toks)
            bits = ((hashes[:, None] >> np.arange(64, dtype=np.uint64)) & np.uint64(1)).astype(
                np.int64
            )
            votes = bits.sum(axis=0) * 2 - len(hashes)
            word = np.uint64(0)
            for bit in np.flatnonzero(votes > 0).tolist():
                word |= np.uint64(1) << np.uint64(bit)
            out[i] = word
        return pa.table(
            {
                "doc_id": batch.column("doc_id").cast(pa.int64()),
                "simhash": pa.array(out, pa.uint64()),
            }
        )

    return _docs(sf_dir, ["doc_id", "text"]).map_batches(
        sim, batch_format="pyarrow", zero_copy_batch=True
    )


def ngram_jaccard_pairs(sf_dir: str, k: int = 3, threshold: float = 0.3):
    """Exact n-gram Jaccard near-dup pairs (LSH-bucketed candidates,
    lower threshold)."""
    return minhash_lsh_pairs(sf_dir, n_perm=32, k=k, bands=16, threshold=threshold)


def embedding_near_dup_exact(sf_dir: str, threshold_milli: int = 450):
    """Exact cosine near-dup pairs: per-batch rows × broadcast full
    unit matrix (one ``ray.put``), emitting pairs ``vec_a < vec_b``
    above the threshold.  SQL-oracle-checkable (all-pairs ground truth);
    the sign-LSH variant below is the recall-traded scale path."""
    import pyarrow.parquet as pq_

    full = pq_.read_table(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    ids_full = full.column("vec_id").to_numpy(zero_copy_only=False).astype(np.int64)
    mat = np.asarray(full.column("embedding").to_pylist(), dtype=np.float64)
    norms = np.linalg.norm(mat, axis=1)
    norms[norms == 0] = 1.0
    unit_full = mat / norms[:, None]
    state = ray.put((ids_full, unit_full))

    def pairs(batch: pa.Table) -> pa.Table:
        ids_f, unit_f = ray.get(state)
        bids = batch.column("vec_id").to_numpy(zero_copy_only=False).astype(np.int64)
        bmat = np.asarray(batch.column("embedding").to_pylist(), dtype=np.float64)
        bn = np.linalg.norm(bmat, axis=1)
        bn[bn == 0] = 1.0
        cos = (bmat / bn[:, None]) @ unit_f.T
        milli = (np.sign(cos) * np.floor(np.abs(cos) * 1000 + 0.5)).astype(np.int64)
        keep = (milli >= threshold_milli) & (bids[:, None] < ids_f[None, :])
        bi, fj = np.nonzero(keep)
        return pa.table(
            {
                "vec_a": pa.array(bids[bi], pa.int64()),
                "vec_b": pa.array(ids_f[fj], pa.int64()),
                "cos_milli": pa.array(milli[bi, fj], pa.int64()),
            }
        )

    ds = ray.data.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    from crawl_ray.util import collect_table

    out = collect_table(
        ds.map_batches(pairs, batch_format="pyarrow", zero_copy_batch=True)
    )
    return out.sort_by([("vec_a", "ascending"), ("vec_b", "ascending")])


def embedding_near_dup(sf_dir: str, threshold_milli: int = 950):
    """Embedding-cosine near-duplicate pairs: sign-LSH coarse buckets
    (8 random hyperplanes) + exact in-bucket cosine verification."""
    ds = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    first = ds.take_batch(1, batch_format="pyarrow")
    dim = len(first.column("embedding")[0])
    planes = (
        (fnv1a64_batch([f"plane:{i}:{j}" for i in range(8) for j in range(dim)])
         .astype(np.float64) / float(1 << 63)) - 1.0
    ).reshape(8, dim)
    planes_ref = ray.put(planes)

    def bucketize(batch: pa.Table) -> pa.Table:
        pl = ray.get(planes_ref)
        mat = np.asarray(batch.column("embedding").to_pylist(), dtype=np.float64)
        signs = (mat @ pl.T) > 0
        bucket = np.zeros(len(mat), dtype=np.uint64)
        for b in range(signs.shape[1]):
            bucket |= signs[:, b].astype(np.uint64) << np.uint64(b)
        return pa.table(
            {
                "vec_id": batch.column("vec_id").cast(pa.int64()),
                "bucket": pa.array(bucket, pa.uint64()),
                "embedding": batch.column("embedding"),
            }
        )

    def bucket_pairs(group: pa.Table) -> pa.Table:
        ids = group.column("vec_id").to_pylist()
        mat = np.asarray(group.column("embedding").to_pylist(), dtype=np.float64)
        norms = np.linalg.norm(mat, axis=1)
        norms[norms == 0] = 1.0
        unit = mat / norms[:, None]
        cos = unit @ unit.T
        a_out, b_out, sim = [], [], []
        order = np.argsort(ids)
        for ii in range(len(ids)):
            for jj in range(ii + 1, len(ids)):
                i, j = int(order[ii]), int(order[jj])
                milli = int(round(cos[i, j] * 1000))
                if milli >= threshold_milli:
                    a, b = sorted((ids[i], ids[j]))
                    a_out.append(a)
                    b_out.append(b)
                    sim.append(milli)
        return pa.table(
            {
                "vec_a": pa.array(a_out, pa.int64()),
                "vec_b": pa.array(b_out, pa.int64()),
                "cos_milli": pa.array(sim, pa.int64()),
            }
        )

    return (
        ds.map_batches(bucketize, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("bucket")
        .map_groups(bucket_pairs, batch_format="pyarrow")
    )
