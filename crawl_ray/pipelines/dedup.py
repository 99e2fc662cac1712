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

from crawl_ray.util import collect_table, round_half_away, list_col_to_matrix

from crawl_ray.urlnorm import content_hash64_batch, fnv1a64_batch

__all__ = [
    "exact_dedup",
    "minhash_signatures",
    "minhash_lsh_pairs",
    "simhash_64",
    "simhash_hamming_pairs",
    "ngram_jaccard_pairs",
    "dedup_threshold_sweep",
    "containment_pairs",
    "embedding_near_dup",
    "embedding_near_dup_exact",
    "dedup_clusters",
    "dedup_corpus",
    "incremental_dedup",
]


def _docs(sf_dir: str, columns=None):
    return ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=columns)


def _dedup_group_starts(g: pa.Table, verify: str) -> np.ndarray:
    """Segment boundaries of a (text_hash [, check|text])-sorted
    partition: a new group starts where the hash changes OR where the
    verification layer says two same-hash rows are different texts.
    ``verify="digest"`` confirms on the hi 64 bits of the 128-bit
    digest; ``verify="text"`` compares the text bytes (vectorized Arrow
    not_equal, no Python per row); ``verify="none"`` trusts the 64-bit
    key (the r3 behavior).

    Null text is defined as ≡ empty text in EVERY mode: the hash
    kernels (urlnorm.content_hash*_batch) already map both to ``b""``,
    so the text comparison fills nulls with ``""`` too — otherwise a
    null-vs-null pair would read as "different" (Arrow not_equal is
    null-propagating) and the verify modes would disagree on the same
    input."""
    h = g.column("text_hash").to_numpy(zero_copy_only=False)
    new = np.r_[True, h[1:] != h[:-1]]
    if verify == "digest" and g.num_rows > 1:
        c = g.column("check").to_numpy(zero_copy_only=False)
        new[1:] |= c[1:] != c[:-1]
    elif verify == "text" and g.num_rows > 1:
        t = pc.fill_null(g.column("text").combine_chunks(), "")
        neq = pc.not_equal(t.slice(1), t.slice(0, len(t) - 1))
        new[1:] |= neq.to_numpy(zero_copy_only=False)
    return np.flatnonzero(new)


def exact_dedup(
    sf_dir: str,
    num_partitions: int | None = None,
    verify: str = "digest",
    _group_hash_fn=None,
):
    """Exact text dedup: keep the lowest doc_id per distinct text.

    Shuffle is keyed by ``part = splitmix64(hash) % P`` — the
    url_hash-partition dedup pattern (SURVEY.md §2.8) — so per-group
    Python is bounded by the PARTITION count: one ``map_groups`` call
    sorts and segment-reduces ALL hash groups of a partition (the
    streams.py vectorized-segment pattern), instead of one 30-100 µs
    call per distinct text.

    A 64-bit key alone would silently merge ~3 distinct-text pairs at
    the 10^10-doc design point (birthday bound), so merges are
    VERIFIED within each co-partitioned hash group (VERDICT r3 item 7):

    - ``verify="digest"`` (default): group by the lo word and confirm
      on the hi word of one 128-bit blake2b per doc — +8 B/row shuffle
      payload, collision now requires a blake2b-128 collision.
    - ``verify="text"``: ship the text through the shuffle and compare
      bytes — exact by construction, at full-corpus shuffle cost
      (for modest corpora or a hash-distrusting threat model).
    - ``verify="none"``: the bare 64-bit key (r3 behavior, benchmark
      comparison only).

    ``_group_hash_fn`` is a test seam: it overrides the GROUPING hash
    (planted-collision tests force equal keys for distinct texts; the
    verification layer must keep both docs).
    """
    from crawl_ray.pipelines.stats import _splitmix64
    from crawl_ray.urlnorm import content_hash128_batch

    P = num_partitions or _default_band_partitions()

    def add_hash(batch: pa.Table) -> pa.Table:
        # blake2b per row (one C call each): document text is long, so
        # the padded-matrix FNV kernel would cost rows × longest-doc
        if verify == "digest":
            h, check = content_hash128_batch(batch.column("text"))
        else:
            h, check = content_hash64_batch(batch.column("text")), None
        if _group_hash_fn is not None:
            h = _group_hash_fn(batch.column("text"))
        cols = {
            "doc_id": batch.column("doc_id").cast(pa.int64()),
            "text_hash": pa.array(h, pa.uint64()),
            "part": pa.array(
                (_splitmix64(h) % np.uint64(P)).astype(np.int64),
                pa.int64(),
            ),
        }
        if check is not None:
            cols["check"] = pa.array(check, pa.uint64())
        if verify == "text":
            cols["text"] = batch.column("text")
        return pa.table(cols)

    sort_keys = [("text_hash", "ascending")]
    if verify == "digest":
        sort_keys.append(("check", "ascending"))
    elif verify == "text":
        sort_keys.append(("text", "ascending"))
    sort_keys.append(("doc_id", "ascending"))

    def keep_first_part(group: pa.Table) -> pa.Table:
        g = group.take(pc.sort_indices(group, sort_keys=sort_keys))
        starts = _dedup_group_starts(g, verify)
        lens = np.diff(np.r_[starts, g.num_rows])
        kept = g.take(pa.array(starts, pa.int64())).select(["doc_id"])
        return kept.append_column("n_dups", pa.array(lens, pa.int64()))

    ds = _docs(sf_dir, ["doc_id", "text"]).map_batches(
        add_hash, batch_format="pyarrow", zero_copy_batch=True
    )
    return ds.groupby("part").map_groups(
        keep_first_part, batch_format="pyarrow"
    )


# -- MinHash / LSH ---------------------------------------------------------


def _table_fingerprint(path: str) -> str:
    """Cheap parquet-footer fingerprint (rows + byte sizes) for store
    cache tokens: regenerating a corpus file in place then re-running
    an operator must MISS the task-side store cache — a stale store
    would union old and new part files into silently wrong shingle /
    unit sets (and the per-worker bucket-map caches are keyed by store
    root, so a changed root is also what invalidates them)."""
    import pyarrow.parquet as pq_

    md = pq_.read_metadata(path)
    total = sum(
        md.row_group(i).total_byte_size for i in range(md.num_row_groups)
    )
    return f"{md.num_rows}:{md.serialized_size}:{total}"


def _minhash_params(n_perm: int) -> tuple[np.ndarray, np.ndarray]:
    """xor-multiply family h_i(x) = (x ^ b_i) * a_i in wrapping uint64
    (a_i odd ⇒ the multiply is a bijection on Z/2^64) — fully
    vectorizable, unlike (a*x+b) mod 2^61-1 which needs 128-bit math.

    Constants come from per-index blake2b digests: FNV of "prefix:{i}"
    is near-linear in i, which would correlate the permutations."""
    import hashlib

    def keys(prefix: str) -> np.ndarray:
        return np.frombuffer(
            b"".join(
                hashlib.blake2b(f"{prefix}:{i}".encode(), digest_size=8).digest()
                for i in range(n_perm)
            ),
            dtype=np.uint64,
        )

    return keys("mh-a") | np.uint64(1), keys("mh-b").copy()


_SHINGLE_PRIME = np.uint64(0x100000001B3)


def _shingle_hashes(text: str, k: int) -> np.ndarray:
    """Unique k-token shingle hashes, fully vectorized: hash each token
    once (FNV-1a), then combine each window of k token-hashes with a
    polynomial mix — identical token sequences map to identical shingle
    hashes, with no per-shingle string joins."""
    # null text ≡ empty text — the documents-table contract the hash
    # kernels (_dedup_group_starts) already honor
    toks = text.split() if text else []
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


def _ranges(counts: np.ndarray) -> np.ndarray:
    """[0..c0-1, 0..c1-1, ...] for a vector of segment lengths."""
    s = np.repeat(np.r_[0, np.cumsum(counts)[:-1]], counts)
    return np.arange(int(counts.sum()), dtype=np.int64) - s


def _shingle_windows_flat(texts: list, k: int):
    """Flat k-token shingle-hash array for a whole batch of docs plus
    per-doc shingle counts — one ``fnv1a64_batch`` over every token of
    every doc, then k vector passes over all windows of all docs at
    once.  Duplicate shingles are kept (the per-permutation min is
    unchanged by duplicates, so signatures match the unique'd per-doc
    path bit-for-bit)."""
    toks_per_doc = [t.split() if t else [] for t in texts]  # null ≡ empty
    lens = np.array([len(ts) for ts in toks_per_doc], dtype=np.int64)
    all_toks = [tok for ts in toks_per_doc for tok in ts]
    th = (
        fnv1a64_batch(all_toks)
        if all_toks
        else np.empty(0, dtype=np.uint64)
    )
    doc_start = np.r_[0, np.cumsum(lens)[:-1]]
    # ≥k tokens → len-k+1 windows; 1..k-1 tokens → one fold; empty → 0
    counts = np.where(lens >= k, lens - k + 1, 1).astype(np.int64)
    out = np.zeros(int(counts.sum()), dtype=np.uint64)
    out_start = np.r_[0, np.cumsum(counts)[:-1]]
    seed = np.uint64(0xCBF29CE484222325)
    long_mask = lens >= k
    if long_mask.any():
        wc = counts[long_mask]
        rel = _ranges(wc)
        win_start = np.repeat(doc_start[long_mask], wc) + rel
        dst = np.repeat(out_start[long_mask], wc) + rel
        h = np.full(len(win_start), seed, dtype=np.uint64)
        with np.errstate(over="ignore"):
            for j in range(k):
                h = (h ^ th[win_start + j]) * _SHINGLE_PRIME
        out[dst] = h
    short = (lens > 0) & (lens < k)
    if short.any():
        sl = lens[short]
        sds = doc_start[short]
        h = np.full(int(short.sum()), seed, dtype=np.uint64)
        with np.errstate(over="ignore"):
            for j in range(int(sl.max())):
                m = sl > j
                h[m] = (h[m] ^ th[sds[m] + j]) * _SHINGLE_PRIME
        out[out_start[short]] = h
    return out, counts


def minhash_signatures(sf_dir: str, n_perm: int = 32, k: int = 3):
    """MinHash signature per document.  Plain tasks (no actor pool): the
    permutation params are a trivial derivation, and a bounded actor
    pool would cap the parallelism of the sign stage — the hottest part
    of the pipeline — at the pool size.

    The kernel is batch-vectorized: one token-hash pass over the whole
    batch, one (n_perm × total_shingles) product matrix, and a single
    ``np.minimum.reduceat`` per batch — no per-doc Python."""

    def sign(batch: pa.Table) -> pa.Table:
        a, b = _minhash_params(n_perm)
        texts = batch.column("text").to_pylist()
        if not texts:
            return pa.table(
                {
                    "doc_id": pa.array([], pa.int64()),
                    "signature": pa.array([], pa.list_(pa.uint64())),
                }
            )
        flat, counts = _shingle_windows_flat(texts, k)
        starts = np.r_[0, np.cumsum(counts)[:-1]]
        with np.errstate(over="ignore"):
            vals = (flat[None, :] ^ b[:, None]) * a[:, None]
        sigs = np.minimum.reduceat(vals, starts, axis=1).T  # (docs, perm)
        offsets = pa.array(
            np.arange(len(texts) + 1, dtype=np.int32) * n_perm
        )
        sig_col = pa.ListArray.from_arrays(
            offsets, pa.array(np.ascontiguousarray(sigs.ravel()), pa.uint64())
        )
        return pa.table(
            {
                "doc_id": batch.column("doc_id").cast(pa.int64()),
                "signature": sig_col,
            }
        )

    return _docs(sf_dir, ["doc_id", "text"]).map_batches(
        sign, batch_format="pyarrow", batch_size=256, zero_copy_batch=True
    )


_EMPTY_PAIRS = pa.table(
    {
        "doc_a": pa.array([], pa.int64()),
        "doc_b": pa.array([], pa.int64()),
        "jaccard_milli": pa.array([], pa.int64()),
    }
)

_SALT = np.uint64(0x9E3779B97F4A7C15)


def _default_band_partitions() -> int:
    """Block count for the narrow coalesce in front of the banded/bucket
    sort-shuffles: Ray's sort-based groupby pays per-input-block sample +
    sort + split overhead, so merging the many small band/bucket blocks
    into ~one-per-CPU first is cheaper than shuffling them raw (measured
    ~2x per exchange at sf0.1/32).  Scales with the cluster, not the data:
    at 10^10 rows the coalesce is a streaming narrow pass."""
    import ray as _ray

    return max(8, int(_ray.cluster_resources().get("CPU", 8)))


# per worker process: shingle-store root -> {bucket -> {doc_id: ndarray}}
_SHINGLE_CACHE: dict = {}


def _shingle_bucket_map(root: str, bucket: int) -> dict:
    buckets = _SHINGLE_CACHE.setdefault(root, {})
    hit = buckets.get(bucket)
    if hit is not None:
        return hit
    import pathlib

    import pyarrow.parquet as pq_

    parts: dict[int, list] = {}
    bdir = pathlib.Path(root) / f"bucket={bucket}"
    for f in sorted(bdir.glob("*.parquet")):
        t = pq_.read_table(f)
        for d, s in zip(t.column("doc_id").to_pylist(),
                        t.column("shingles").to_pylist()):
            parts.setdefault(d, []).append(np.asarray(s, dtype=np.uint64))
    # a doc's set may arrive as partial lists from several store files
    # (postings-sourced stores are gram-partitioned), or as whole-set
    # duplicates when a persisted /tmp store carries parts from an
    # earlier run with different batch boundaries — np.unique restores
    # the exact set either way (verify kernels assume unique elements)
    out: dict[int, np.ndarray] = {
        d: (ls[0] if len(ls) == 1 else np.unique(np.concatenate(ls)))
        for d, ls in parts.items()
    }
    buckets[bucket] = out
    return out


def _verify_pairs_batch(
    batch: pa.Table, *, root: str, n_buckets: int, thr_milli: int
) -> pa.Table:
    """Distributed Jaccard verification: look both docs' (unique-sorted)
    shingle arrays up in the bucketed shingle store, numpy set
    intersection per pair — no driver-side per-pair work."""
    a = batch.column("doc_a").to_numpy(zero_copy_only=False)
    b = batch.column("doc_b").to_numpy(zero_copy_only=False)
    if len(a):  # residual cross-block duplicate pairs: drop before work
        ab = np.unique(np.stack([a, b], axis=1), axis=0)
        a, b = ab[:, 0], ab[:, 1]
    need = np.unique(np.concatenate([a, b])) if len(a) else np.empty(0, np.int64)
    sh: dict[int, np.ndarray] = {}
    for bk in np.unique(need % n_buckets).tolist():
        bucket_map = _shingle_bucket_map(root, int(bk))
        for d in need[need % n_buckets == bk].tolist():
            sh[d] = bucket_map[d]
    a_out, b_out, jac = [], [], []
    for i in range(len(a)):
        sa, sb = sh[a[i]], sh[b[i]]
        inter = np.intersect1d(sa, sb, assume_unique=True).size
        union = (sa.size + sb.size - inter) or 1
        j = inter * 1000 // union
        if j >= thr_milli:
            a_out.append(int(a[i]))
            b_out.append(int(b[i]))
            jac.append(int(j))
    return pa.table(
        {
            "doc_a": pa.array(a_out, pa.int64()),
            "doc_b": pa.array(b_out, pa.int64()),
            "jaccard_milli": pa.array(jac, pa.int64()),
        }
    )


# per worker process: unit-vector store root -> {bucket -> {vec_id: row}}
_UNIT_CACHE: dict = {}


def _unit_bucket_map(root: str, bucket: int) -> dict:
    buckets = _UNIT_CACHE.setdefault(root, {})
    hit = buckets.get(bucket)
    if hit is not None:
        return hit
    import pathlib

    import pyarrow.parquet as pq_

    out: dict[int, np.ndarray] = {}
    bdir = pathlib.Path(root) / f"bucket={bucket}"
    for f in sorted(bdir.glob("*.parquet")):
        t = pq_.read_table(f)
        ids = t.column("vec_id").to_numpy(zero_copy_only=False)
        mat = list_col_to_matrix(t.column("unit"))
        for i, d in enumerate(ids.tolist()):
            out[d] = mat[i]
    buckets[bucket] = out
    return out


def _verify_cos_pairs_batch(
    batch: pa.Table, *, root: str, n_buckets: int, thr_milli: int
) -> pa.Table:
    """Distributed cosine verification: look both vectors' unit rows up
    in the bucketed unit-vector store, one einsum per batch — no
    driver-side matrix, no full-table broadcast."""
    a = batch.column("vec_a").to_numpy(zero_copy_only=False)
    b = batch.column("vec_b").to_numpy(zero_copy_only=False)
    empty = pa.table(
        {"vec_a": pa.array([], pa.int64()),
         "vec_b": pa.array([], pa.int64()),
         "cos_milli": pa.array([], pa.int64())}
    )
    if len(a) == 0:
        return empty
    # residual cross-block duplicate pairs: drop before work
    ab = np.unique(np.stack([a, b], axis=1), axis=0)
    a, b = ab[:, 0], ab[:, 1]
    need = np.unique(np.concatenate([a, b]))
    units: dict[int, np.ndarray] = {}
    for bk in np.unique(need % n_buckets).tolist():
        bucket_map = _unit_bucket_map(root, int(bk))
        for d in need[need % n_buckets == bk].tolist():
            units[d] = bucket_map[d]
    ua = np.stack([units[x] for x in a.tolist()])
    ub = np.stack([units[x] for x in b.tolist()])
    cos = np.einsum("ij,ij->i", ua, ub)
    milli = round_half_away(cos * 1000).astype(np.int64)
    keep = milli >= thr_milli
    return pa.table(
        {
            "vec_a": pa.array(a[keep], pa.int64()),
            "vec_b": pa.array(b[keep], pa.int64()),
            "cos_milli": pa.array(milli[keep], pa.int64()),
        }
    )



def _write_shingle_store(
    docs_ds, needed_ref, store_root: str, k: int, n_buckets: int
) -> None:
    """One streaming corpus pass writing the k-shingle sets of the
    candidate docs to a task-side ``doc_id % n_buckets`` bucketed
    Parquet store (deterministic min+max-id part names → retry-safe,
    no clobber) — the partition-local join layout shared by the
    Jaccard and containment verify stages."""

    def shingles_of(batch: pa.Table) -> pa.Table:
        import pathlib

        import pyarrow.parquet as pq_

        needed_ids = ray.get(needed_ref)
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        keep = np.flatnonzero(np.isin(ids, needed_ids))
        n_written = 0
        if len(keep):
            texts = batch.column("text").take(
                pa.array(keep, pa.int64())
            ).to_pylist()
            kept_ids = ids[keep]
            sh = pa.table(
                {
                    "doc_id": pa.array(kept_ids, pa.int64()),
                    "shingles": pa.array(
                        [_shingle_hashes(t, k).tolist() for t in texts],
                        pa.list_(pa.uint64()),
                    ),
                }
            )
            for bk in np.unique(kept_ids % n_buckets).tolist():
                part = sh.filter(pa.array(kept_ids % n_buckets == bk))
                bdir = pathlib.Path(store_root) / f"bucket={int(bk)}"
                bdir.mkdir(parents=True, exist_ok=True)
                pids = part.column("doc_id").to_numpy(zero_copy_only=False)
                pq_.write_table(
                    part,
                    bdir / f"part-{int(pids.min())}-{int(pids.max())}.parquet",
                )
                n_written += part.num_rows
        return pa.table({"n": pa.array([n_written], pa.int64())})

    docs_ds.map_batches(
        shingles_of, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()


def _write_store_from_postings(
    postings, needed_ref, store_root: str, n_buckets: int
) -> None:
    """Bucketed shingle-store writer that sources the candidate docs'
    gram sets from an already-materialized (gram, doc_id) postings
    dataset instead of re-scanning + re-shingling the corpus — the
    sets are identical (postings are per-doc DISTINCT shingles), one
    full text pass cheaper, and verification provably runs over the
    exact sets candidate generation saw.  Because postings are
    gram-partitioned, a doc's set lands as partial lists across store
    files; the reader (:func:`_shingle_bucket_map`) concatenates them.
    Part names are content-hashed → retry-idempotent, never clobber."""

    def write_block(batch: pa.Table) -> pa.Table:
        import hashlib
        import pathlib

        import pyarrow.parquet as pq_

        needed_ids = ray.get(needed_ref)
        doc = batch.column("doc_id").to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        loc = np.searchsorted(needed_ids, doc)
        hit = (loc < len(needed_ids)) & (
            needed_ids[np.minimum(loc, len(needed_ids) - 1)] == doc
        )
        n_written = 0
        if hit.any():
            kd = doc[hit]
            kg = (
                batch.column("gram").to_numpy(zero_copy_only=False)
                .astype(np.int64)[hit]
                .view(np.uint64)
            )
            order = np.argsort(kd, kind="stable")
            kd, kg = kd[order], kg[order]
            starts = np.flatnonzero(np.r_[True, kd[1:] != kd[:-1]])
            lens = np.diff(np.r_[starts, len(kd)])
            uid = kd[starts]
            offsets = pa.array(
                np.r_[0, np.cumsum(lens)].astype(np.int32)
            )
            sh = pa.table(
                {
                    "doc_id": pa.array(uid, pa.int64()),
                    "shingles": pa.ListArray.from_arrays(
                        offsets, pa.array(kg, pa.uint64())
                    ),
                }
            )
            for bk in np.unique(uid % n_buckets).tolist():
                part = sh.filter(pa.array(uid % n_buckets == bk))
                bdir = pathlib.Path(store_root) / f"bucket={int(bk)}"
                bdir.mkdir(parents=True, exist_ok=True)
                token = hashlib.blake2b(
                    part.column("doc_id").to_numpy(
                        zero_copy_only=False
                    ).tobytes()
                    + np.asarray(
                        part.column("shingles").combine_chunks().values
                    ).tobytes(),
                    digest_size=8,
                ).hexdigest()
                pq_.write_table(part, bdir / f"part-{token}.parquet")
                n_written += part.num_rows
        return pa.table({"n": pa.array([n_written], pa.int64())})

    postings.map_batches(
        write_block, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()


def minhash_lsh_pairs_ds(
    sf_dir: str,
    n_perm: int = 32,
    k: int = 3,
    bands: int = 16,
    threshold: float = 0.5,
    bucket_cap: int = 1024,
):
    """Near-dup pairs: band signatures → bucket groupby → capped
    vectorized per-bucket candidate pairs → EXACT distributed pair
    dedup (one pair-hash shuffle) → distributed exact-Jaccard
    verification against a bucketed shingle store.  Returns a
    MATERIALIZED Dataset of globally-unique verified pairs — every
    corpus-sized AND pair-sized intermediate lives in tasks / the
    object store; the driver only ever holds the candidate doc-id set
    (broadcast for the shingle pass).  Consumers gate their driver fast
    paths on a cheap ``count()`` (VERDICT r3).

    Recall: with ``bands=16`` two-row bands, a true pair at Jaccard
    ``J ≥ 0.9`` is missed with probability ``(1-J²)^16 ≈ 3e-12`` — the
    verified output equals the exact-Jaccard oracle on corpora whose
    near-dups sit well above the threshold (the driver fixture's do).
    """
    if bands <= 0 or n_perm % bands:
        # silent truncation would band only n_perm - n_perm % bands
        # permutations (recall formula no longer holds); bands > n_perm
        # would make every band hash the constant seed — all docs in one
        # bucket per band, a corpus-sized candidate explosion
        raise ValueError(
            f"n_perm={n_perm} must be a positive multiple of bands={bands}"
        )
    rows_per_band = n_perm // bands
    sigs = minhash_signatures(sf_dir, n_perm=n_perm, k=k)
    from crawl_ray.pipelines.stats import _splitmix64

    P = _default_band_partitions()

    def band_rows(batch: pa.Table) -> pa.Table:
        doc_ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        n = len(doc_ids)
        if n == 0:  # empty blocks can surface from Ray Data
            return pa.table(
                {"doc_id": pa.array([], pa.int64()),
                 "bucket": pa.array([], pa.uint64()),
                 "part": pa.array([], pa.int64())}
            )
        sig = list_col_to_matrix(batch.column("signature"), dtype=np.uint64)
        buckets = np.empty((n, bands), dtype=np.uint64)
        band_seeds = fnv1a64_batch([f"band:{b}" for b in range(bands)])
        with np.errstate(over="ignore"):
            for b in range(bands):
                h = np.full(n, band_seeds[b], dtype=np.uint64)
                for j in range(b * rows_per_band, (b + 1) * rows_per_band):
                    h = (h ^ sig[:, j]) * _SHINGLE_PRIME
                buckets[:, b] = h
        flat = buckets.reshape(-1)
        return pa.table(
            {
                "doc_id": pa.array(np.repeat(doc_ids, bands), pa.int64()),
                "bucket": pa.array(flat, pa.uint64()),
                "part": pa.array(
                    (_splitmix64(flat) % np.uint64(P)).astype(np.int64),
                    pa.int64(),
                ),
            }
        )

    banded = sigs.map_batches(band_rows, batch_format="pyarrow")

    def bucket_pairs(group: pa.Table) -> pa.Table:
        # ONE call per hash PARTITION (splitmix64(bucket) % P), not one
        # per bucket: a lexsort segments every bucket of the partition,
        # singleton buckets (the vast majority) drop in one vectorized
        # mask, and only collision segments pay Python pair emission
        b = group.column("bucket").to_numpy(zero_copy_only=False)
        d = group.column("doc_id").to_numpy(zero_copy_only=False)
        if len(b) == 0:
            return _EMPTY_PAIRS.select(["doc_a", "doc_b"])
        order = np.lexsort((d, b))
        b, d = b[order], d[order]
        # drop duplicate (bucket, doc_id) rows: several bands can map a
        # doc to the same bucket value, and because partitioning is
        # splitmix64(bucket) % P those duplicates land in THIS partition
        # — the guard is load-bearing, not belt-and-braces
        keep = np.r_[True, (b[1:] != b[:-1]) | (d[1:] != d[:-1])]
        b, d = b[keep], d[keep]
        starts = np.flatnonzero(np.r_[True, b[1:] != b[:-1]])
        lens = np.diff(np.r_[starts, len(b)])
        parts_a, parts_b = [], []
        for si in np.flatnonzero(lens >= 2).tolist():
            ids = d[starts[si]: starts[si] + lens[si]]
            n = len(ids)
            if n <= bucket_cap:
                ia, ib = np.triu_indices(n, 1)
                parts_a.append(ids[ia])
                parts_b.append(ids[ib])
            else:
                # degenerate bucket (many near-identical docs): sub-split
                # by a salted hash so one bucket never emits N²/2 rows —
                # pairs split across sub-buckets still collide in the
                # other 15 bands' buckets with overwhelming probability
                n_sub = -(-n // bucket_cap)
                with np.errstate(over="ignore"):
                    sub = (
                        (ids.astype(np.uint64) * _SALT) >> np.uint64(33)
                    ) % np.uint64(n_sub)
                for s in range(n_sub):
                    members = ids[sub == s]
                    if len(members) > 1:
                        ia, ib = np.triu_indices(len(members), 1)
                        parts_a.append(members[ia])
                        parts_b.append(members[ib])
        if not parts_a:
            return _EMPTY_PAIRS.select(["doc_a", "doc_b"])
        return pa.table(
            {
                "doc_a": pa.array(np.concatenate(parts_a), pa.int64()),
                "doc_b": pa.array(np.concatenate(parts_b), pa.int64()),
            }
        )

    def local_pair_dedup(batch: pa.Table) -> pa.Table:
        """Per-block candidate dedup: a pair colliding in several bands
        usually lands in the same map_groups output block (many buckets
        per block), so one np.unique here removes most duplicates
        without a second all-to-all shuffle.  Residual cross-block
        duplicates only cost a redundant (cheap, cached-store) Jaccard
        check and are removed exactly on the bounded verified output."""
        if batch.num_rows == 0 or "doc_a" not in batch.column_names:
            return _EMPTY_PAIRS.select(["doc_a", "doc_b"])
        ab = np.stack(
            [
                batch.column("doc_a").to_numpy(zero_copy_only=False),
                batch.column("doc_b").to_numpy(zero_copy_only=False),
            ],
            axis=1,
        )
        ab = np.unique(ab, axis=0)
        return pa.table(
            {
                "doc_a": pa.array(ab[:, 0], pa.int64()),
                "doc_b": pa.array(ab[:, 1], pa.int64()),
            }
        )

    # two shuffles: partition groupby → capped pair emission → local
    # (per-block) dedup → EXACT global pair dedup (so each unique pair
    # verifies once and the verified output is duplicate-free without
    # any driver-side unique)
    pairs = (
        banded.repartition(P)
        .groupby("part")
        .map_groups(bucket_pairs, batch_format="pyarrow")
        .map_batches(local_pair_dedup, batch_format="pyarrow")
    )
    pairs = _global_pair_dedup(pairs, "doc_a", "doc_b", P).materialize()

    # candidate doc-id set: bounded by the candidate pairs; unique'd
    # per block in tasks, union'd on the driver for the broadcast
    id_refs = [_unique_pair_ids.remote(ref) for ref in pairs.to_arrow_refs()]
    id_parts = [p for p in ray.get(id_refs) if len(p)]
    if not id_parts:
        return ray.data.from_arrow(_EMPTY_PAIRS)
    needed = np.unique(np.concatenate(id_parts))
    needed_ref = ray.put(needed)

    # shingle store: one streaming pass over the corpus, candidate docs
    # only, written task-side as a bucketed layout (doc_id % B) — the
    # same partition-local join pattern as the page store
    import hashlib

    n_buckets = 8
    # bucket_cap changes the candidate set (and so the needed-id set the
    # store holds); the fingerprint invalidates on corpus regeneration
    token = hashlib.blake2b(
        f"{sf_dir}:{n_perm}:{k}:{bands}:{bucket_cap}:"
        f"{_table_fingerprint(f'{sf_dir}/documents.parquet')}".encode(),
        digest_size=8,
    ).hexdigest()
    from crawl_ray.storage import ensure_store_dir

    store_root = str(ensure_store_dir(
        f"shingles_{token}", "the minhash shingle store"))

    _write_shingle_store(
        _docs(sf_dir, ["doc_id", "text"]), needed_ref, store_root, k,
        n_buckets,
    )

    # distributed verification over the globally-unique pairs; output
    # is duplicate-free by construction (one deterministic check per
    # unique pair) — no driver-side unique needed, ever
    return pairs.map_batches(
        _verify_pairs_batch,
        fn_kwargs={
            "root": store_root,
            "n_buckets": n_buckets,
            "thr_milli": int(threshold * 1000),
        },
        batch_format="pyarrow",
    ).materialize()


def minhash_lsh_pairs(
    sf_dir: str,
    n_perm: int = 32,
    k: int = 3,
    bands: int = 16,
    threshold: float = 0.5,
    bucket_cap: int = 1024,
):
    """Driver-table surface over :func:`minhash_lsh_pairs_ds` — the
    oracled query entry; collects only the bounded VERIFIED result.
    Scale consumers (:func:`dedup_corpus`) use the Dataset variant and
    never stage the pair set on the driver."""
    out = collect_table(
        minhash_lsh_pairs_ds(
            sf_dir, n_perm=n_perm, k=k, bands=bands,
            threshold=threshold, bucket_cap=bucket_cap,
        )
    )
    if out.num_rows == 0:
        return _EMPTY_PAIRS
    return out.sort_by([("doc_a", "ascending"), ("doc_b", "ascending")])


@ray.remote
def _unique_pair_ids(t: pa.Table, col_a: str = "doc_a", col_b: str = "doc_b") -> np.ndarray:
    if t.num_rows == 0 or col_a not in t.column_names:
        return np.empty(0, dtype=np.int64)
    return np.unique(
        np.concatenate(
            [
                t.column(col_a).to_numpy(zero_copy_only=False),
                t.column(col_b).to_numpy(zero_copy_only=False),
            ]
        )
    )


def _global_pair_dedup(pairs, col_a: str, col_b: str, n_parts: int):
    """EXACT global candidate-pair dedup, distributed: one
    ``splitmix64(pair-hash) % n_parts`` shuffle + per-PARTITION
    ``np.unique`` (Python bounded by the partition count, the
    bucket_pairs precedent).  Replaces the old driver-side ``np.unique``
    over the collected verified set — the pair set never stages through
    the driver, and each unique pair pays verification exactly once."""
    from crawl_ray.pipelines.stats import _splitmix64

    empty = pa.table(
        {col_a: pa.array([], pa.int64()), col_b: pa.array([], pa.int64())}
    )

    def add_part(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or col_a not in batch.column_names:
            return empty.append_column("ppart", pa.array([], pa.int64()))
        a = batch.column(col_a).to_numpy(zero_copy_only=False).astype(np.int64)
        b = batch.column(col_b).to_numpy(zero_copy_only=False).astype(np.int64)
        with np.errstate(over="ignore"):
            h = _splitmix64(a.view(np.uint64) * _SALT + b.view(np.uint64))
        return pa.table(
            {
                col_a: pa.array(a, pa.int64()),
                col_b: pa.array(b, pa.int64()),
                "ppart": pa.array(
                    (h % np.uint64(n_parts)).astype(np.int64), pa.int64()
                ),
            }
        )

    def uniq(group: pa.Table) -> pa.Table:
        if group.num_rows == 0:
            return empty
        ab = np.unique(
            np.stack(
                [
                    group.column(col_a).to_numpy(zero_copy_only=False),
                    group.column(col_b).to_numpy(zero_copy_only=False),
                ],
                axis=1,
            ),
            axis=0,
        )
        return pa.table(
            {col_a: pa.array(ab[:, 0], pa.int64()),
             col_b: pa.array(ab[:, 1], pa.int64())}
        )

    return (
        pairs.map_batches(add_part, batch_format="pyarrow")
        .repartition(n_parts)
        .groupby("ppart")
        .map_groups(uniq, batch_format="pyarrow")
    )


def simhash_64(sf_dir: str):
    """64-bit SimHash over whitespace tokens (vectorized bit voting).

    Token hash = first 8 bytes of ``md5(token)`` — a C-speed digest
    DuckDB can recompute exactly, so the driver oracle re-derives every
    simhash in SQL.  Output is the big-endian 16-hex-char word (bit 0 =
    MSB), matching the SQL nibble construction.
    """
    import hashlib

    def sim(batch: pa.Table) -> pa.Table:
        texts = batch.column("text").to_pylist()
        out = []
        md5 = hashlib.md5
        for text in texts:
            toks = text.split() if text else []  # null ≡ empty
            if not toks:
                out.append("0" * 16)
                continue
            digests = np.frombuffer(
                b"".join(md5(t.encode()).digest()[:8] for t in toks),
                dtype=">u8",
            )
            # bit b (MSB-first) of each token hash, summed over tokens
            bits = (
                (digests[:, None] >> (np.uint64(63) - np.arange(64, dtype=np.uint64)))
                & np.uint64(1)
            ).astype(np.int64)
            votes = bits.sum(axis=0) * 2 - len(digests)
            word = 0
            for b in np.flatnonzero(votes > 0).tolist():
                word |= 1 << (63 - b)
            out.append(format(word, "016x"))
        return pa.table(
            {
                "doc_id": batch.column("doc_id").cast(pa.int64()),
                "simhash_hex": pa.array(out, pa.string()),
            }
        )

    return _docs(sf_dir, ["doc_id", "text"]).map_batches(
        sim, batch_format="pyarrow", zero_copy_batch=True
    )


_POP8 = np.array([bin(i).count("1") for i in range(256)], dtype=np.uint8)


def simhash_hamming_pairs(
    sf_dir: str, max_hamming: int = 3, bands: int = 4
):
    """Near-duplicate pairs by simhash hamming distance (Manku, Jarmin
    & Sarma 2007, WWW — "Detecting near-duplicates for web crawling").

    Candidate generation: the 64-bit simhash is split into ``bands``
    equal bit blocks; by pigeonhole any pair within ``max_hamming`` <
    ``bands`` differing bits agrees EXACTLY on at least one block, so
    grouping on ``(band, block value)`` is a COMPLETE candidate
    generator — no recall caveat, unlike minhash banding (output ≡ the
    exact all-pairs SQL oracle by construction).  Verification is a
    chunked vectorized XOR-popcount INSIDE each bucket group: the
    simhash word rides along with its band rows, so no side store and
    no second corpus pass.  Cross-band duplicate pairs are removed per
    output block, then exactly on the bounded verified result — the
    ``minhash_lsh_pairs`` pattern.

    Degenerate buckets (very many docs sharing one 16-bit block, e.g. a
    corpus of near-empty pages all hashing ≈ 0) are scanned in
    O(m²)-popcount vectorized chunks with bounded memory rather than
    sub-split: a ``bands``-way split has no redundancy to lose a
    bucket's pairs (every other block may differ), and at Manku's
    web-scale parameters the fix is more tables/permutations, not
    sub-splitting.
    """
    if max_hamming >= bands:
        raise ValueError("completeness needs max_hamming < bands")
    block_bits = 64 // bands
    mask = np.uint64((1 << block_bits) - 1)
    _empty = pa.table(
        {"doc_a": pa.array([], pa.int64()),
         "doc_b": pa.array([], pa.int64()),
         "hamming": pa.array([], pa.int64())}
    )

    from crawl_ray.pipelines.stats import _splitmix64

    n_parts = _default_band_partitions()

    def band_rows(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        n = len(ids)
        if n == 0:
            return pa.table(
                {"key": pa.array([], pa.int64()),
                 "doc_id": pa.array([], pa.int64()),
                 "sim": pa.array([], pa.int64()),
                 "part": pa.array([], pa.int64())}
            )
        # vectorized hex→uint64: one C-level fromhex over the batch
        words = np.frombuffer(
            bytes.fromhex("".join(batch.column("simhash_hex").to_pylist())),
            dtype=">u8",
        ).astype(np.uint64)
        keys = np.empty((n, bands), dtype=np.int64)
        for b in range(bands):
            shift = np.uint64(64 - (b + 1) * block_bits)
            block = (words >> shift) & mask
            keys[:, b] = (b << block_bits) | block.astype(np.int64)
        flat = keys.reshape(-1)
        return pa.table(
            {"key": pa.array(flat, pa.int64()),
             "doc_id": pa.array(np.repeat(ids, bands), pa.int64()),
             "sim": pa.array(
                 np.repeat(words.view(np.int64), bands), pa.int64()
             ),
             "part": pa.array(
                 (_splitmix64(flat.astype(np.uint64))
                  % np.uint64(n_parts)).astype(np.int64),
                 pa.int64(),
             )}
        )

    def bucket_pairs(group: pa.Table) -> pa.Table:
        # one call per hash PARTITION (see minhash_lsh_pairs): lexsort
        # segments every block-value key of the partition; singleton
        # keys drop in one mask, collision segments pay the popcount
        keys = group.column("key").to_numpy(zero_copy_only=False)
        ids = group.column("doc_id").to_numpy(zero_copy_only=False)
        if len(keys) == 0:
            return _empty
        sims_all = group.column("sim").to_numpy(
            zero_copy_only=False
        ).view(np.uint64)
        order = np.lexsort((ids, keys))
        keys, ids = keys[order], ids[order]
        sims_all = np.ascontiguousarray(sims_all[order])
        starts = np.flatnonzero(np.r_[True, keys[1:] != keys[:-1]])
        lens = np.diff(np.r_[starts, len(keys)])
        out_a, out_b, out_h = [], [], []
        for si in np.flatnonzero(lens >= 2).tolist():
            lo = starts[si]
            seg_ids = ids[lo: lo + lens[si]]
            sims_ = sims_all[lo: lo + lens[si]]
            n = len(seg_ids)
            # row-chunked m×n popcount: memory capped ~chunk×n×8 bytes
            chunk = max(1, (1 << 22) // n)
            for s in range(0, n, chunk):
                e = min(s + chunk, n)
                x = sims_[s:e, None] ^ sims_[None, :]
                ham = _POP8[x.view(np.uint8)].reshape(e - s, n, 8).sum(
                    axis=2, dtype=np.int64
                )
                ci, cj = np.nonzero(ham <= max_hamming)
                gi = ci + s
                keep = gi < cj  # upper triangle: each pair once, no self
                if not keep.any():
                    continue
                out_a.append(seg_ids[gi[keep]])
                out_b.append(seg_ids[cj[keep]])
                out_h.append(ham[ci[keep], cj[keep]])
        if not out_a:
            return _empty
        return pa.table(
            {"doc_a": pa.array(np.concatenate(out_a), pa.int64()),
             "doc_b": pa.array(np.concatenate(out_b), pa.int64()),
             "hamming": pa.array(np.concatenate(out_h), pa.int64())}
        )

    def local_pair_dedup(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or "doc_a" not in batch.column_names:
            return _empty
        abh = np.stack(
            [batch.column(c).to_numpy(zero_copy_only=False)
             for c in ("doc_a", "doc_b", "hamming")],
            axis=1,
        )
        abh = np.unique(abh, axis=0)
        return pa.table(
            {"doc_a": pa.array(abh[:, 0], pa.int64()),
             "doc_b": pa.array(abh[:, 1], pa.int64()),
             "hamming": pa.array(abh[:, 2], pa.int64())}
        )

    verified = collect_table(
        simhash_64(sf_dir)
        .map_batches(band_rows, batch_format="pyarrow", zero_copy_batch=True)
        .repartition(n_parts)
        .groupby("part")
        .map_groups(bucket_pairs, batch_format="pyarrow")
        .map_batches(local_pair_dedup, batch_format="pyarrow")
    )
    if verified.num_rows == 0:
        return _empty
    # exact cross-band dedup on the bounded verified output (a pair's
    # hamming is deterministic, so row-level unique is exact)
    abh = np.unique(
        np.stack(
            [verified.column(c).to_numpy(zero_copy_only=False)
             for c in ("doc_a", "doc_b", "hamming")],
            axis=1,
        ),
        axis=0,
    )
    return pa.table(
        {"doc_a": pa.array(abh[:, 0], pa.int64()),
         "doc_b": pa.array(abh[:, 1], pa.int64()),
         "hamming": pa.array(abh[:, 2], pa.int64())}
    )


def ngram_jaccard_pairs(sf_dir: str, k: int = 3, threshold: float = 0.3):
    """Exact n-gram Jaccard near-dup pairs (LSH-bucketed candidates,
    lower threshold)."""
    return minhash_lsh_pairs(sf_dir, n_perm=32, k=k, bands=16, threshold=threshold)


DEDUP_SWEEP_THRESHOLDS = (300, 400, 500, 600, 700, 800, 900)


def dedup_threshold_sweep(sf_dir: str, thresholds=DEDUP_SWEEP_THRESHOLDS):
    """Dedup tuning curve: near-dup pair counts at a ladder of Jaccard
    thresholds from ONE run of the exact LSH-bucketed pipeline
    (:func:`ngram_jaccard_pairs` is exact down to 0.3, so every rung
    ≥ 300 milli is a complete count) — the table an operator reads to
    pick the dedup threshold before committing a 100-TB pass."""
    pairs = ngram_jaccard_pairs(sf_dir)
    jac = pairs.column("jaccard_milli").to_numpy(zero_copy_only=False)
    ts = [int(t) for t in thresholds]
    return pa.table(
        {
            "threshold_milli": pa.array(ts, pa.int64()),
            "n_pairs": pa.array(
                [int((jac >= t).sum()) for t in ts], pa.int64()
            ),
        }
    )


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
    mat = list_col_to_matrix(full.column("embedding"))
    norms = np.linalg.norm(mat, axis=1)
    norms[norms == 0] = 1.0
    unit_full = mat / norms[:, None]
    state = ray.put((ids_full, unit_full))

    def pairs(batch: pa.Table) -> pa.Table:
        ids_f, unit_f = ray.get(state)
        bids = batch.column("vec_id").to_numpy(zero_copy_only=False).astype(np.int64)
        bmat = list_col_to_matrix(batch.column("embedding"))
        bn = np.linalg.norm(bmat, axis=1)
        bn[bn == 0] = 1.0
        cos = (bmat / bn[:, None]) @ unit_f.T
        milli = round_half_away(cos * 1000).astype(np.int64)
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


TWIN_OFFSET = 1_000_000  # vec_id offset of the zeroed-coordinate twins


def _augmented_embeddings(sf_dir: str):
    """The near-dup demo corpus: every vector plus a deterministic
    near-duplicate twin (first coordinate zeroed, ``vec_id + 1e6``).
    cos(v, twin) = sqrt(1 - v₀²/‖v‖²) ≈ 0.99 on this data — real
    high-cosine near-dups the driver's exact-SQL oracle reproduces with
    ``list_concat([0.0], embedding[2:])``.  (The raw corpus has no
    pairs above ~0.6: at such thresholds no LSH prunes with guaranteed
    recall, and the blocked exact scan — ``embedding_near_dup_exact`` —
    IS the honest path.)"""

    def augment(batch: pa.Table) -> pa.Table:
        ids = batch.column("vec_id").to_numpy(zero_copy_only=False).astype(np.int64)
        mat = list_col_to_matrix(batch.column("embedding"))
        twin = mat.copy()
        twin[:, 0] = 0.0
        return pa.table(
            {
                "vec_id": pa.array(
                    np.concatenate([ids, ids + TWIN_OFFSET]), pa.int64()
                ),
                "embedding": pa.array(
                    list(mat) + list(twin), pa.list_(pa.float64())
                ),
            }
        )

    return ray.data.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    ).map_batches(augment, batch_format="pyarrow", zero_copy_batch=True)


def embedding_near_dup_ds(
    sf_dir: str,
    threshold_milli: int = 900,
    n_bits: int = 6,
    n_tables: int = 32,
    bucket_cap: int = 4096,
    small_input_threshold: int = 20_000,
):
    """Embedding-cosine near-duplicate pairs over the augmented corpus:
    multi-table sign-LSH candidate generation + distributed exact
    cosine verification.  Returns a MATERIALIZED Dataset of
    globally-unique verified pairs — on the distributed path the pair
    set never stages through the driver (VERDICT r3); consumers
    (:func:`dedup_clusters`,
    :func:`crawl_ray.pipelines.similarity.threshold_graph_stats`) gate
    their driver fast paths on a cheap ``count()``.

    Recall: a pair at cos ≥ 0.9 (θ ≤ 0.451) collides in one 6-bit table
    with p ≥ (1-θ/π)⁶ ≈ 0.39, so it is missed by all 32 tables with
    probability ≤ 0.61³² ≈ 1e-7 — the verified output equals the exact
    oracle on this corpus (typical twin pairs sit at cos ≈ 0.99 where
    the miss bound is ~1e-21).  Verification reads per-pair unit
    vectors from a task-side ``vec_id % B`` bucketed store (the minhash
    shingle-store pattern) — the embeddings table is never materialized
    on the driver in the distributed path.

    Corpora of ≤ ``small_input_threshold`` augmented vectors skip the
    5-stage pipeline (whose fixed Ray cost dwarfs driver-sized inputs —
    the pagerank/engine small-input precedent) and run the identical
    integer-cosine arithmetic as one blocked driver scan; by the recall
    bound above both paths produce the same pairs (the forced-
    distributed guard test asserts it).  Pass 0 to force distributed.
    """
    if small_input_threshold:
        import pyarrow.parquet as pq_

        n_base = pq_.ParquetFile(
            f"{sf_dir}/embeddings.parquet"
        ).metadata.num_rows
        if 2 * n_base <= small_input_threshold:
            aug = collect_table(_augmented_embeddings(sf_dir))
            ids = aug.column("vec_id").to_numpy(
                zero_copy_only=False
            ).astype(np.int64)
            mat = list_col_to_matrix(aug.column("embedding"))
            norms = np.linalg.norm(mat, axis=1)
            norms[norms == 0] = 1.0
            unit = mat / norms[:, None]
            out_a, out_b, out_c = [], [], []
            # blocked rows × full matrix: memory ≤ chunk × n doubles
            for lo in range(0, len(ids), 2048):
                hi = lo + 2048
                cos = unit[lo:hi] @ unit.T
                milli = round_half_away(cos * 1000).astype(np.int64)
                keep = (milli >= threshold_milli) & (
                    ids[lo:hi, None] < ids[None, :]
                )
                ai, bj = np.nonzero(keep)
                out_a.append(ids[lo:hi][ai])
                out_b.append(ids[bj])
                out_c.append(milli[ai, bj])
            a = np.concatenate(out_a) if out_a else np.empty(0, np.int64)
            b = np.concatenate(out_b) if out_b else np.empty(0, np.int64)
            c = np.concatenate(out_c) if out_c else np.empty(0, np.int64)
            order = np.lexsort((b, a))
            return ray.data.from_arrow(pa.table(
                {
                    "vec_a": pa.array(a[order], pa.int64()),
                    "vec_b": pa.array(b[order], pa.int64()),
                    "cos_milli": pa.array(c[order], pa.int64()),
                }
            ))

    ds = _augmented_embeddings(sf_dir)
    first = ds.take_batch(1, batch_format="pyarrow")
    dim = len(first.column("embedding")[0])
    # Gaussian hyperplanes from the legacy RandomState generator (its
    # stream is frozen across numpy versions ⇒ deterministic).  NOT
    # fnv-derived floats: FNV of "prefix:{j}" is near-LINEAR in j, which
    # made the plane matrix rank-2 and the sign-LSH blind (measured).
    planes = np.random.RandomState(0xC0FFEE).standard_normal(
        (n_tables, n_bits, dim)
    )
    planes_ref = ray.put(planes)
    from crawl_ray.pipelines.stats import _splitmix64 as _px

    n_parts_lsh = _default_band_partitions()

    def bucketize(batch: pa.Table) -> pa.Table:
        pl = ray.get(planes_ref)
        ids = batch.column("vec_id").to_numpy(zero_copy_only=False).astype(np.int64)
        mat = list_col_to_matrix(batch.column("embedding"))
        n = len(ids)
        if n == 0:
            return pa.table(
                {"vec_id": pa.array([], pa.int64()),
                 "bucket": pa.array([], pa.uint64()),
                 "part": pa.array([], pa.int64())}
            )
        # (tables × n): per-table bucket id, table index in the high bits
        out = np.empty((n_tables, n), dtype=np.uint64)
        for t in range(n_tables):
            signs = (mat @ pl[t].T) > 0  # n × n_bits
            code = np.zeros(n, dtype=np.uint64)
            for b in range(n_bits):
                code |= signs[:, b].astype(np.uint64) << np.uint64(b)
            out[t] = code | (np.uint64(t) << np.uint64(n_bits))
        flat = out.reshape(-1)
        return pa.table(
            {
                "vec_id": pa.array(np.tile(ids, n_tables), pa.int64()),
                "bucket": pa.array(flat, pa.uint64()),
                "part": pa.array(
                    (_px(flat) % np.uint64(n_parts_lsh)).astype(np.int64),
                    pa.int64(),
                ),
            }
        )

    def bucket_pairs(group: pa.Table) -> pa.Table:
        # one call per hash PARTITION (see minhash_lsh_pairs.bucket_pairs):
        # lexsort segments every LSH bucket of the partition, singletons
        # drop vectorized, only collision segments pay Python emission
        empty = pa.table(
            {"vec_a": pa.array([], pa.int64()),
             "vec_b": pa.array([], pa.int64())}
        )
        b = group.column("bucket").to_numpy(zero_copy_only=False)
        d = group.column("vec_id").to_numpy(zero_copy_only=False)
        if len(b) == 0:
            return empty
        order = np.lexsort((d, b))
        b, d = b[order], d[order]
        keep = np.r_[True, (b[1:] != b[:-1]) | (d[1:] != d[:-1])]
        b, d = b[keep], d[keep]
        starts = np.flatnonzero(np.r_[True, b[1:] != b[:-1]])
        lens = np.diff(np.r_[starts, len(b)])
        parts_a, parts_b = [], []
        for si in np.flatnonzero(lens >= 2).tolist():
            ids = d[starts[si]: starts[si] + lens[si]]
            n = len(ids)
            if n > bucket_cap:  # degenerate bucket: sub-split (see minhash)
                n_sub = -(-n // bucket_cap)
                with np.errstate(over="ignore"):
                    sub = (
                        (ids.astype(np.uint64) * _SALT) >> np.uint64(33)
                    ) % np.uint64(n_sub)
                for s in range(n_sub):
                    members = ids[sub == s]
                    if len(members) > 1:
                        ia, ib = np.triu_indices(len(members), 1)
                        parts_a.append(members[ia])
                        parts_b.append(members[ib])
            else:
                ia, ib = np.triu_indices(n, 1)
                parts_a.append(ids[ia])
                parts_b.append(ids[ib])
        if not parts_a:
            return empty
        return pa.table(
            {
                "vec_a": pa.array(np.concatenate(parts_a), pa.int64()),
                "vec_b": pa.array(np.concatenate(parts_b), pa.int64()),
            }
        )

    def local_pair_dedup(batch: pa.Table) -> pa.Table:
        # per-block candidate dedup (see the minhash twin); exact dedup
        # happens on the bounded verified output
        if batch.num_rows == 0 or "vec_a" not in batch.column_names:
            return pa.table(
                {"vec_a": pa.array([], pa.int64()),
                 "vec_b": pa.array([], pa.int64())}
            )
        ab = np.unique(
            np.stack(
                [
                    batch.column("vec_a").to_numpy(zero_copy_only=False),
                    batch.column("vec_b").to_numpy(zero_copy_only=False),
                ],
                axis=1,
            ),
            axis=0,
        )
        return pa.table(
            {
                "vec_a": pa.array(ab[:, 0], pa.int64()),
                "vec_b": pa.array(ab[:, 1], pa.int64()),
            }
        )

    pairs = (
        ds.map_batches(bucketize, batch_format="pyarrow", zero_copy_batch=True)
        .repartition(n_parts_lsh)
        .groupby("part")
        .map_groups(bucket_pairs, batch_format="pyarrow")
        .map_batches(local_pair_dedup, batch_format="pyarrow")
    )
    pairs = _global_pair_dedup(
        pairs, "vec_a", "vec_b", n_parts_lsh
    ).materialize()

    # candidate vec-id set: bounded by the candidate pairs; unique'd per
    # block in tasks, union'd on the driver for the broadcast — the SAME
    # bucketed-store verification pattern as minhash_lsh_pairs: the full
    # embeddings table is never materialized on the driver, never
    # broadcast; only the candidate rows are written (task-side) to a
    # ``vec_id % B`` bucketed unit-vector store and looked up per batch.
    id_refs = [
        _unique_pair_ids.remote(ref, "vec_a", "vec_b")
        for ref in pairs.to_arrow_refs()
    ]
    id_parts = [p for p in ray.get(id_refs) if len(p)]
    if not id_parts:
        return ray.data.from_arrow(_EMPTY_COS_PAIRS)
    needed = np.unique(np.concatenate(id_parts))
    needed_ref = ray.put(needed)

    import hashlib

    n_buckets = 8
    token = hashlib.blake2b(
        f"{sf_dir}:{threshold_milli}:{n_bits}:{n_tables}:{bucket_cap}:units:"
        f"{_table_fingerprint(f'{sf_dir}/embeddings.parquet')}".encode(),
        digest_size=8,
    ).hexdigest()
    from crawl_ray.storage import ensure_store_dir

    store_root = str(ensure_store_dir(
        f"embunits_{token}", "the embedding unit-vector store"))

    def write_units(batch: pa.Table) -> pa.Table:
        import pathlib

        import pyarrow.parquet as pq_

        needed_ids = ray.get(needed_ref)
        ids = batch.column("vec_id").to_numpy(zero_copy_only=False).astype(np.int64)
        keep = np.flatnonzero(np.isin(ids, needed_ids))
        n_written = 0
        if len(keep):
            kept_ids = ids[keep]
            mat = list_col_to_matrix(
                batch.column("embedding").take(pa.array(keep, pa.int64()))
            )
            norms = np.linalg.norm(mat, axis=1)
            norms[norms == 0] = 1.0
            unit = mat / norms[:, None]
            tbl = pa.table(
                {
                    "vec_id": pa.array(kept_ids, pa.int64()),
                    "unit": pa.array(list(unit), pa.list_(pa.float64())),
                }
            )
            for bk in np.unique(kept_ids % n_buckets).tolist():
                part = tbl.filter(pa.array(kept_ids % n_buckets == bk))
                bdir = pathlib.Path(store_root) / f"bucket={int(bk)}"
                bdir.mkdir(parents=True, exist_ok=True)
                pids = part.column("vec_id").to_numpy(zero_copy_only=False)
                # min+max id name: unique for disjoint batches AND safe
                # if ids ever repeated across blocks (ADVICE r2)
                pq_.write_table(
                    part, bdir / f"part-{int(pids.min())}-{int(pids.max())}.parquet"
                )
                n_written += part.num_rows
        return pa.table({"n": pa.array([n_written], pa.int64())})

    _augmented_embeddings(sf_dir).map_batches(
        write_units, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()

    # distributed exact-cosine verification against the bucketed store;
    # output is duplicate-free by construction (globally-unique pairs,
    # one deterministic check each) — never collected here
    return pairs.map_batches(
        _verify_cos_pairs_batch,
        fn_kwargs={
            "root": store_root,
            "n_buckets": n_buckets,
            "thr_milli": threshold_milli,
        },
        batch_format="pyarrow",
    ).materialize()


_EMPTY_COS_PAIRS = pa.table(
    {"vec_a": pa.array([], pa.int64()),
     "vec_b": pa.array([], pa.int64()),
     "cos_milli": pa.array([], pa.int64())}
)


def embedding_near_dup(
    sf_dir: str,
    threshold_milli: int = 900,
    n_bits: int = 6,
    n_tables: int = 32,
    bucket_cap: int = 4096,
    small_input_threshold: int = 20_000,
):
    """Driver-table surface over :func:`embedding_near_dup_ds` — the
    oracled query entry; collects only the bounded VERIFIED result."""
    out = collect_table(
        embedding_near_dup_ds(
            sf_dir, threshold_milli=threshold_milli, n_bits=n_bits,
            n_tables=n_tables, bucket_cap=bucket_cap,
            small_input_threshold=small_input_threshold,
        )
    )
    if out.num_rows == 0:
        return _EMPTY_COS_PAIRS
    return out.sort_by([("vec_a", "ascending"), ("vec_b", "ascending")])


# ---------------------------------------------------------------------------
# Connected-components dedup clustering
# ---------------------------------------------------------------------------

CLUSTER_DRIVER_THRESHOLD = 65536  # edges; same precedent as engine small rounds


def _cc_union_find(src: np.ndarray, dst: np.ndarray) -> dict:
    """Driver-side union-find (path-halving) over a bounded edge list —
    the small-input fast path, mirroring the engine's
    ``small_round_threshold`` precedent."""
    parent: dict = {}

    def find(x: int) -> int:
        while True:
            p = parent.get(x, x)
            if p == x:
                return x
            gp = parent.get(p, p)
            parent[x] = gp
            x = gp

    for u, v in zip(src.tolist(), dst.tolist()):
        ru, rv = find(u), find(v)
        if ru != rv:
            if rv < ru:
                ru, rv = rv, ru
            parent[rv] = ru
    return {x: find(x) for x in set(src.tolist()) | set(dst.tolist())}


def _cc_label_propagation(
    edges: pa.Table, max_iters: int = 64
) -> pa.Table:
    """Driver-table entry over :func:`_cc_label_propagation_ds` — kept
    for bounded edge lists (unit tests, post-count driver callers)."""
    return collect_table(
        _cc_label_propagation_ds(
            ray.data.from_arrow(edges), "src", "dst", max_iters
        )
    ).sort_by([("node", "ascending")])


def _cc_label_propagation_ds(
    pairs_ds, src_col: str = "src", dst_col: str = "dst",
    max_iters: int = 64,
):
    """Distributed min-label propagation: labels start at node id; each
    round every node broadcasts its label along its edges via a
    groupby-emulated join (label row + edge rows grouped on the same
    hash PARTITION), then takes the min of received labels.  Labels are
    monotone non-increasing, so an unchanged label sum certifies the
    fixpoint.

    Per-group Python is bounded by the PARTITION count, never the node
    count: rows carry a ``part = splitmix64(key) % n_parts`` column and
    one ``map_groups`` call processes ALL key segments of a partition
    in a single lexsort + ``minimum.reduceat`` pass (the
    streams.sessionize_bucketed pattern — measured 10×+ over per-group
    calls at 10^5-group counts; a per-NODE variant would be millions of
    30-100 µs Python calls on a web-scale dup graph).

    Rounds = cluster diameter — the right trade for near-dup graphs
    (dense, shallow clusters); for adversarial long chains the
    log-round star-contraction variant (Kiveris et al., "Connected
    Components in MapReduce and Beyond") would replace this loop.
    Two shuffles per round; per-partition work is O(rows log rows).

    Edges arrive as a Dataset and are symmetrized per BLOCK — the edge
    list never materializes on the driver (duplicate edges across
    blocks only re-send the same min; correctness is unaffected).  The
    label fixpoint state is itself a (materialized) Dataset carried
    between rounds; the driver holds ONE scalar per round (the
    convergence sum).  Returns a ``(node, label)`` Dataset."""
    from ray.data.aggregate import Min

    from crawl_ray.pipelines.joins import _default_partitions
    from crawl_ray.pipelines.stats import _splitmix64

    n_parts = _default_partitions()

    def part_of(keys: np.ndarray) -> np.ndarray:
        return (
            _splitmix64(keys.astype(np.uint64)) % np.uint64(n_parts)
        ).astype(np.int64)

    _empty_edge = pa.table(
        {"key": pa.array([], pa.int64()),
         "val": pa.array([], pa.int64()),
         "is_label": pa.array([], pa.bool_()),
         "part": pa.array([], pa.int64())}
    )

    def symmetrize(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or src_col not in batch.column_names:
            return _empty_edge
        s = batch.column(src_col).to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        d = batch.column(dst_col).to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        u = np.concatenate([s, d])
        v = np.concatenate([d, s])
        return pa.table(
            {"key": pa.array(u, pa.int64()),
             "val": pa.array(v, pa.int64()),
             "is_label": pa.array(np.zeros(len(u), dtype=bool)),
             "part": pa.array(part_of(u), pa.int64())}
        )

    edge_ds = pairs_ds.map_batches(
        symmetrize, batch_format="pyarrow"
    ).materialize()
    _empty_lab = pa.table(
        {"node": pa.array([], pa.int64()),
         "label": pa.array([], pa.int64())}
    )
    if edge_ds.count() == 0:
        return ray.data.from_arrow(_empty_lab)

    # initial labels = node id.  Node ids are extracted DISTRIBUTED:
    # edges are symmetrized, so unique(key) per hash partition is the
    # global node set (each key lives in exactly one partition) — the
    # driver never holds a node-sized array.
    def init_labels(group: pa.Table) -> pa.Table:
        key = np.unique(
            group.column("key").to_numpy(zero_copy_only=False)
        ).astype(np.int64)
        return pa.table(
            {"key": pa.array(key, pa.int64()),
             "val": pa.array(key, pa.int64()),
             "is_label": pa.array(np.ones(len(key), dtype=bool)),
             "part": pa.array(part_of(key), pa.int64())}
        )

    labels_ds = (
        edge_ds.groupby("part")
        .map_groups(init_labels, batch_format="pyarrow")
        .materialize()
    )
    # convergence scalar: labels are monotone non-increasing, so an
    # unchanged int64-wrapping label sum certifies the fixpoint (a
    # false positive needs the round's total decrease to be an exact
    # multiple of 2^64 — the same contract the numpy sum always had)
    prev_sum = labels_ds.sum("val")
    int64_max = np.iinfo(np.int64).max
    _empty_msgs = pa.table(
        {"node": pa.array([], pa.int64()), "label": pa.array([], pa.int64())}
    )

    def propagate_part(group: pa.Table) -> pa.Table:
        """All key segments of one hash partition, vectorized."""
        if group.num_rows == 0:
            return _empty_msgs
        key = group.column("key").to_numpy(zero_copy_only=False)
        val = group.column("val").to_numpy(zero_copy_only=False)
        is_lbl = group.column("is_label").to_numpy(zero_copy_only=False)
        order = np.lexsort((val, key))
        key, val, is_lbl = key[order], val[order], is_lbl[order]
        new_seg = np.r_[True, key[1:] != key[:-1]]
        starts = np.flatnonzero(new_seg)
        # per-segment label = min over LABEL rows only (each key has
        # exactly one label row: masked reduceat)
        seg_lbl = np.minimum.reduceat(
            np.where(is_lbl, val, int64_max), starts
        )
        row_lbl = seg_lbl[np.cumsum(new_seg) - 1]
        em = ~is_lbl
        out_nodes = np.concatenate([val[em], key[starts]])
        out_lbls = np.concatenate([row_lbl[em], seg_lbl])
        return pa.table(
            {"node": pa.array(out_nodes, pa.int64()),
             "label": pa.array(out_lbls, pa.int64())}
        )

    def relabel(batch: pa.Table) -> pa.Table:
        node = batch.column("node").to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        lbl = batch.column("min(label)").to_numpy(
            zero_copy_only=False
        ).astype(np.int64)
        return pa.table(
            {"key": pa.array(node, pa.int64()),
             "val": pa.array(lbl, pa.int64()),
             "is_label": pa.array(np.ones(len(node), dtype=bool)),
             "part": pa.array(part_of(node), pa.int64())}
        )

    for _ in range(max_iters):
        agg = (
            edge_ds.union(labels_ds)
            .groupby("part")
            .map_groups(propagate_part, batch_format="pyarrow")
            .groupby("node")
            .aggregate(Min("label"))
        ).materialize()
        cur_sum = agg.sum("min(label)")  # driver holds ONE scalar
        labels_ds = agg.map_batches(
            relabel, batch_format="pyarrow"
        ).materialize()
        if cur_sum == prev_sum:
            break
        prev_sum = cur_sum
    else:
        raise RuntimeError(f"label propagation did not converge in {max_iters} rounds")
    return labels_ds.map_batches(
        lambda b: pa.table(
            {"node": b.column("key"), "label": b.column("val")}
        ),
        batch_format="pyarrow",
    )


def dedup_clusters(
    sf_dir: str,
    threshold_milli: int = 900,
    force_distributed: bool = False,
    small_input_threshold: int = 20_000,
):
    """Near-duplicate cluster assignment: connected components over the
    sign-LSH candidates-then-verify cosine pairs
    (:func:`embedding_near_dup`, augmented corpus) — the 100 TB input
    path (no all-pairs matmul, no driver-side matrix) — one cluster id
    (= component min vec_id) per dup-graph node, plus the dedup
    decision: ``keep`` marks the cluster representative.

    Applying the decision to the corpus is an anti-join of ``keep =
    false`` ids against the documents table — at scale that is the same
    sharded-actor anti-join the URL frontier uses (SURVEY.md §2.5 J3).

    Edge lists ≤ ``CLUSTER_DRIVER_THRESHOLD`` — gated on a cheap
    ``count()`` of the pair Dataset, never on collected arrays — run
    driver-side union-find; larger graphs (or ``force_distributed``)
    stay distributed end-to-end: the verified pair set feeds the
    min-label-propagation loop as a Dataset and never stages through
    the driver."""
    pairs_ds = embedding_near_dup_ds(
        sf_dir, threshold_milli=threshold_milli,
        small_input_threshold=small_input_threshold,
    )
    n_edges = pairs_ds.count()  # metadata read — the ds is materialized
    if n_edges > CLUSTER_DRIVER_THRESHOLD or force_distributed:
        # collect is the query SURFACE (one row per dup-graph node) —
        # the propagation loop itself never stages through the driver
        lab = collect_table(
            _cc_label_propagation_ds(pairs_ds, "vec_a", "vec_b")
        )
        node = lab.column("node").to_numpy(zero_copy_only=False).astype(np.int64)
        label = lab.column("label").to_numpy(zero_copy_only=False).astype(np.int64)
    else:
        pairs = collect_table(pairs_ds)
        src = pairs.column("vec_a").to_numpy(zero_copy_only=False).astype(np.int64) if pairs.num_rows else np.empty(0, np.int64)
        dst = pairs.column("vec_b").to_numpy(zero_copy_only=False).astype(np.int64) if pairs.num_rows else np.empty(0, np.int64)
        mapping = _cc_union_find(src, dst)
        node = np.array(sorted(mapping), dtype=np.int64)
        label = np.array([mapping[x] for x in node.tolist()], dtype=np.int64)
    order = np.argsort(node, kind="stable")
    node, label = node[order], label[order]
    return pa.table(
        {
            "vec_id": pa.array(node, pa.int64()),
            "cluster_id": pa.array(label, pa.int64()),
            "keep": pa.array(node == label),
        }
    )


def _verify_containment_batch(
    batch: pa.Table, *, root: str, n_buckets: int, thr_milli: int
) -> pa.Table:
    """Distributed containment verification over the bucketed shingle
    store: ``|Sa ∩ Sb| · 1000 // |Sa|`` per ORDERED candidate pair."""
    a = batch.column("doc_a").to_numpy(zero_copy_only=False)
    b = batch.column("doc_b").to_numpy(zero_copy_only=False)
    empty = pa.table(
        {"doc_a": pa.array([], pa.int64()),
         "doc_b": pa.array([], pa.int64()),
         "containment_milli": pa.array([], pa.int64())}
    )
    if not len(a):
        return empty
    ab = np.unique(np.stack([a, b], axis=1), axis=0)
    a, b = ab[:, 0], ab[:, 1]
    need = np.unique(np.concatenate([a, b]))
    sh: dict[int, np.ndarray] = {}
    for bk in np.unique(need % n_buckets).tolist():
        bucket_map = _shingle_bucket_map(root, int(bk))
        for d in need[need % n_buckets == bk].tolist():
            sh[d] = bucket_map[d]
    a_out, b_out, cm = [], [], []
    for i in range(len(a)):
        sa, sb = sh[a[i]], sh[b[i]]
        inter = np.intersect1d(sa, sb, assume_unique=True).size
        c = inter * 1000 // (sa.size or 1)
        if c >= thr_milli:
            a_out.append(int(a[i]))
            b_out.append(int(b[i]))
            cm.append(int(c))
    return pa.table(
        {"doc_a": pa.array(a_out, pa.int64()),
         "doc_b": pa.array(b_out, pa.int64()),
         "containment_milli": pa.array(cm, pa.int64())}
    )


def containment_pairs(
    sf_dir: str,
    t_milli: int = 800,
    k: int = 3,
    num_partitions: int = 32,
    probe_chunk: int = 1 << 18,
):
    """Near-containment pairs (AllPairs / PPJoin prefix filtering,
    Bayardo, Ma & Srikant 2007, WWW): ORDERED pairs ``(a, b)`` with
    ``|Sa ∩ Sb| · 1000 // |Sa| ≥ t_milli`` over unique k-token shingle
    sets — the quote/boilerplate-INCLUSION detector that Jaccard-based
    dedup misses (a small doc quoted inside a big one has low Jaccard
    but high containment).

    COMPLETE candidate generation, no recall caveat: order every doc's
    shingles by global rarity (document frequency asc, hash asc); a
    pair with overlap ≥ ``o = ceil(t·|A|)`` must share one of A's first
    ``|A| − o + 1`` rarest shingles with B's FULL set (pigeonhole over
    the ordered set), so probing prefix(A) against the full posting
    lists is exhaustive — and cheap, because rarest-first prefixes
    avoid the high-df grams that would explode the probe×posting
    product.

    Shuffles: (1) gram-keyed → document frequencies ride back onto the
    postings; (2) doc-keyed → per-doc rarity sort + prefix selection
    (vectorized segment ops); (3) gram-keyed → probe × posting
    cartesian per gram (fully vectorized across grams, chunked by
    probe rows for bounded memory — degenerate grams are scanned,
    never dropped); then distributed exact verification against the
    bucketed task-side shingle store (the minhash pattern)."""
    import hashlib
    import math

    P = num_partitions
    docs = _docs(sf_dir, ["doc_id", "text"])

    _empty_post = pa.table(
        {"gram": pa.array([], pa.int64()),
         "doc_id": pa.array([], pa.int64()),
         "part": pa.array([], pa.int64())}
    )

    def shingle_rows(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        texts = batch.column("text").to_pylist()
        if not len(ids):
            return _empty_post
        flat, counts = _shingle_windows_flat(texts, k)
        doc = np.repeat(ids, counts)
        pairs = np.unique(
            np.stack([doc, flat.view(np.int64)], axis=1), axis=0
        )  # per-doc DISTINCT shingles (sets, not bags)
        return pa.table(
            {"gram": pa.array(pairs[:, 1], pa.int64()),
             "doc_id": pa.array(pairs[:, 0], pa.int64()),
             "part": pa.array(
                 (pairs[:, 1].view(np.uint64) % np.uint64(P)).astype(np.int64),
                 pa.int64(),
             )}
        )

    def add_df(group: pa.Table) -> pa.Table:
        gram = group.column("gram").to_numpy(zero_copy_only=False)
        doc = group.column("doc_id").to_numpy(zero_copy_only=False)
        # (gram, doc) is globally unique (docs never span batches), so
        # df = row count per gram
        _, inv, cnt = np.unique(gram, return_inverse=True, return_counts=True)
        return pa.table(
            {"gram": pa.array(gram, pa.int64()),
             "doc_id": pa.array(doc, pa.int64()),
             "df": pa.array(cnt[inv].astype(np.int64), pa.int64()),
             "part2": pa.array(doc % P, pa.int64())}
        )

    def prefixes(group: pa.Table) -> pa.Table:
        doc = group.column("doc_id").to_numpy(zero_copy_only=False)
        gram = group.column("gram").to_numpy(zero_copy_only=False)
        df = group.column("df").to_numpy(zero_copy_only=False)
        order = np.lexsort((gram, df, doc))  # by doc, then (df, gram)
        d, g = doc[order], gram[order]
        starts = np.flatnonzero(np.r_[True, d[1:] != d[:-1]])
        lens = np.diff(np.r_[starts, len(d)])
        # prefix length per doc: |A| - ceil(t·|A|) + 1
        o = -(-lens * t_milli // 1000)  # ceil without floats
        plen = lens - o + 1
        offs = np.arange(len(d), dtype=np.int64) - np.repeat(starts, lens)
        keep = offs < np.repeat(plen, lens)
        return pa.table(
            {"gram": pa.array(g[keep], pa.int64()),
             "doc_id": pa.array(d[keep], pa.int64()),
             "probe": pa.array(np.ones(int(keep.sum()), np.int64), pa.int64()),
             "part3": pa.array(
                 (g[keep].view(np.uint64) % np.uint64(P)).astype(np.int64),
                 pa.int64(),
             )}
        )

    _empty_pairs2 = pa.table(
        {"doc_a": pa.array([], pa.int64()),
         "doc_b": pa.array([], pa.int64())}
    )

    def gram_pairs(group: pa.Table) -> pa.Table:
        gram = group.column("gram").to_numpy(zero_copy_only=False)
        doc = group.column("doc_id").to_numpy(zero_copy_only=False)
        probe = group.column("probe").to_numpy(zero_copy_only=False)
        order = np.lexsort((doc, gram))
        g, d, pr = gram[order], doc[order], probe[order]
        starts = np.flatnonzero(np.r_[True, g[1:] != g[:-1]])
        lens = np.diff(np.r_[starts, len(g)])
        seg_of = np.repeat(np.arange(len(starts)), lens)
        # per segment: index rows = ALL rows (postings), probe rows =
        # probe-tagged.  Pair each probe row with its gram's postings.
        probe_pos = np.flatnonzero(pr == 1)
        if not len(probe_pos):
            return _empty_pairs2
        pseg = seg_of[probe_pos]
        out_a, out_b = [], []
        # chunk by EMITTED-pair volume, not probe-row count: degenerate
        # grams (df ≈ corpus size on a near-dup-heavy corpus — the
        # exact input this operator targets) would make a row-count
        # chunk materialize probe_rows × df pairs at once.  Boundaries
        # bound cumsum(counts) per chunk; a single over-budget probe
        # row forms its own chunk (its posting list is bounded by the
        # hash partition).
        counts_all = lens[pseg].astype(np.int64)
        cum = np.cumsum(counts_all)
        pair_budget = np.int64(1 << 22)
        n_probe = len(probe_pos)
        s = 0
        while s < n_probe:
            base = cum[s - 1] if s else np.int64(0)
            e = int(np.searchsorted(cum, base + pair_budget, side="right"))
            e = min(max(e, s + 1), s + probe_chunk, n_probe)
            pp = probe_pos[s:e]
            ps = pseg[s:e]
            counts = counts_all[s:e]
            tot = int(counts.sum())
            s = e
            if not tot:
                continue
            pa_doc = np.repeat(d[pp], counts)
            within = np.arange(tot, dtype=np.int64) - np.repeat(
                np.cumsum(counts) - counts, counts
            )
            pb_doc = d[np.repeat(starts[ps], counts) + within]
            m = pa_doc != pb_doc
            if m.any():
                ab = np.unique(
                    np.stack([pa_doc[m], pb_doc[m]], axis=1), axis=0
                )
                out_a.append(ab[:, 0])
                out_b.append(ab[:, 1])
        if not out_a:
            return _empty_pairs2
        ab = np.unique(
            np.stack(
                [np.concatenate(out_a), np.concatenate(out_b)], axis=1
            ),
            axis=0,
        )
        return pa.table(
            {"doc_a": pa.array(ab[:, 0], pa.int64()),
             "doc_b": pa.array(ab[:, 1], pa.int64())}
        )

    postings = (
        docs.map_batches(
            shingle_rows, batch_format="pyarrow", zero_copy_batch=True
        )
        .groupby("part")
        .map_groups(add_df, batch_format="pyarrow")
        .materialize()
    )
    probes = postings.groupby("part2").map_groups(
        prefixes, batch_format="pyarrow"
    )
    index_rows = postings.map_batches(
        lambda b: pa.table(
            {"gram": b.column("gram"),
             "doc_id": b.column("doc_id"),
             "probe": pa.array(np.zeros(b.num_rows, np.int64), pa.int64()),
             "part3": pa.array(
                 (
                     b.column("gram").to_numpy(zero_copy_only=False)
                     .view(np.uint64) % np.uint64(P)
                 ).astype(np.int64),
                 pa.int64(),
             )}
        ),
        batch_format="pyarrow",
    )
    pairs = (
        probes.union(index_rows)
        .groupby("part3")
        .map_groups(gram_pairs, batch_format="pyarrow")
        .materialize()
    )

    # candidate doc ids → bucketed task-side shingle store (minhash
    # pattern: one corpus pass, candidate docs only)
    id_refs = [
        _unique_pair_ids.remote(ref) for ref in pairs.to_arrow_refs()
    ]
    id_parts = [p for p in ray.get(id_refs) if len(p)]
    _empty_out = pa.table(
        {"doc_a": pa.array([], pa.int64()),
         "doc_b": pa.array([], pa.int64()),
         "containment_milli": pa.array([], pa.int64())}
    )
    if not id_parts:
        return _empty_out
    needed = np.unique(np.concatenate(id_parts))
    needed_ref = ray.put(needed)

    n_buckets = 8
    token = hashlib.blake2b(
        f"containment_v2:{sf_dir}:{t_milli}:{k}:"
        f"{_table_fingerprint(f'{sf_dir}/documents.parquet')}".encode(),
        digest_size=8,
    ).hexdigest()
    from crawl_ray.storage import ensure_store_dir

    store_root = str(ensure_store_dir(
        f"shingles_{token}", "the containment shingle store"))

    _write_store_from_postings(postings, needed_ref, store_root, n_buckets)

    verified = collect_table(
        pairs.map_batches(
            _verify_containment_batch,
            fn_kwargs={
                "root": store_root,
                "n_buckets": n_buckets,
                "thr_milli": t_milli,
            },
            batch_format="pyarrow",
        )
    )
    if verified.num_rows == 0:
        return _empty_out
    trip = np.unique(
        np.stack(
            [verified.column(c).to_numpy(zero_copy_only=False)
             for c in ("doc_a", "doc_b", "containment_milli")],
            axis=1,
        ),
        axis=0,
    )
    return pa.table(
        {"doc_a": pa.array(trip[:, 0], pa.int64()),
         "doc_b": pa.array(trip[:, 1], pa.int64()),
         "containment_milli": pa.array(trip[:, 2], pa.int64())}
    )


def dedup_corpus(sf_dir: str, threshold_milli: int = 500, num_partitions: int | None = None):
    """End-to-end near-duplicate REMOVAL over the documents corpus —
    the operator a training-data pipeline actually ships; the pair /
    cluster tables (:func:`minhash_lsh_pairs`, :func:`dedup_clusters`)
    are its diagnostics.

    Stages, each on its 100 TB path:

    1. verified Jaccard pairs from the banded-LSH + bucketed-shingle
       verify pipeline (no all-pairs, no driver materialization of the
       corpus);
    2. connected components over the pair graph — driver union-find
       under ``CLUSTER_DRIVER_THRESHOLD`` edges, else the
       partition-vectorized min-label propagation;
    3. keep = component min ``doc_id``; every other member is a
       "loser" id;
    4. apply: distributed ``left_anti`` hash join of the corpus
       against the loser ids — never a broadcast of the drop set (at
       web scale the drop side can be a large fraction of the corpus).

    Returns the surviving rows ``(doc_id, lang, text)`` ordered by
    ``doc_id``.  Reference analog: the seen-set admission decides which
    URLs survive (crawler.go:137-156); here the dup graph decides which
    documents survive."""
    pairs_ds = minhash_lsh_pairs_ds(sf_dir, threshold=threshold_milli / 1000.0)
    n_edges = pairs_ds.count()  # metadata read — the ds is materialized
    if n_edges > CLUSTER_DRIVER_THRESHOLD:
        # loser ids (node != component min) stay a DATASET end-to-end:
        # propagation labels -> per-block filter -> the anti-join's
        # build side.  At web scale the drop set is corpus-sized; the
        # driver never holds it.
        from crawl_ray.pipelines.joins import _default_partitions as _dp
        from crawl_ray.util import normalize_schema

        # normalize_schema before the anti-join below: the propagation
        # chain's groupby stages emit ZERO-COLUMN blocks for empty hash
        # partitions and Ray short-circuits empty blocks past the
        # lambda — the aggregator's Arrow join dies on them (same guard
        # as knn_graph_stats / threshold_graph_stats)
        drop_ds = normalize_schema(
            _cc_label_propagation_ds(
                pairs_ds, "doc_a", "doc_b"
            ).map_batches(
                lambda b: b.filter(
                    pc.not_equal(b.column("node"), b.column("label"))
                ).select(["node"]).rename_columns(["drop_id"]),
                batch_format="pyarrow",
            ),
            {"drop_id": pa.int64()},
            coalesce=num_partitions or _dp(),
        ).materialize()
        n_drop = drop_ds.count()
    else:
        pairs = collect_table(pairs_ds)
        src = pairs.column("doc_a").to_numpy(zero_copy_only=False).astype(np.int64) if pairs.num_rows else np.empty(0, np.int64)
        dst = pairs.column("doc_b").to_numpy(zero_copy_only=False).astype(np.int64) if pairs.num_rows else np.empty(0, np.int64)
        mapping = _cc_union_find(src, dst)
        node = np.array(sorted(mapping), dtype=np.int64)
        label = np.array([mapping[x] for x in node.tolist()], dtype=np.int64)
        drop = node[node != label]
        n_drop = len(drop)
        drop_ds = ray.data.from_arrow(
            pa.table({"drop_id": pa.array(drop, pa.int64())})
        )
    docs = _docs(sf_dir, ["doc_id", "lang", "text"])
    if n_drop == 0:
        return docs.sort("doc_id")
    from crawl_ray.pipelines.joins import _default_partitions
    P = num_partitions or _default_partitions()
    # block-coalesced anti-join (the joins.py _cjoin pattern): merging
    # the docs scan's many small blocks to P first halves the join's
    # per-block partitioning overhead
    out = docs.repartition(P).join(
        drop_ds, "left_anti", P,
        on=("doc_id",), right_on=("drop_id",),
    )
    return out.sort("doc_id")


# ---------------------------------------------------------------------------
# Incremental (cross-wave) exact dedup
# ---------------------------------------------------------------------------


@ray.remote(num_cpus=0)
class _HashMembershipShard:
    """One shard of a distributed content-hash membership set — the
    corpus-side twin of the URL frontier's sharded seen-set actors
    (SURVEY.md §2.5 J3; admission shards hold the same open-addressing
    table for url hashes).  ``num_cpus=0``: the shards do O(bytes)
    table probes, not compute, and must never steal task slots from
    the streaming scan that feeds them.

    Backends: ``"exact128"`` (default) stores the full 128-bit digest
    (16 B/slot) — a wrong "already ingested" drop requires a blake2b
    collision; ``"exact"`` keys on the lo word only (8 B/slot, ~5
    wrongly-dropped new docs per 10^10 x 10^10 old x new — the 64-bit
    birthday contract); ``"cuckoo"`` is the 2.4 B/key fingerprint
    envelope (~1.2e-4 FP, documented like the frontier ST4 backend)."""

    def __init__(self, backend: str = "exact128") -> None:
        from crawl_ray.state.seen import Seen128Table, make_seen_table

        self._wide = backend == "exact128"
        self.table = Seen128Table() if self._wide else make_seen_table(backend)

    def add(self, lo: np.ndarray, hi: np.ndarray) -> int:
        lo = np.ascontiguousarray(lo, dtype=np.uint64)
        if self._wide:
            self.table.add(lo, np.ascontiguousarray(hi, dtype=np.uint64))
        else:
            self.table.add(lo)
        return len(self.table)

    def contains(self, lo: np.ndarray, hi: np.ndarray) -> np.ndarray:
        lo = np.ascontiguousarray(lo, dtype=np.uint64)
        if self._wide:
            return self.table.contains(
                lo, np.ascontiguousarray(hi, dtype=np.uint64)
            )
        return self.table.contains(lo)

    def snapshot(self) -> dict:
        return self.table.snapshot()


def incremental_dedup(sf_dir: str, n_shards: int = 8,
                      backend: str = "exact128"):
    """Dedup a NEW crawl wave against the already-ingested corpus
    WITHOUT reprocessing the old corpus rows — the continuous-ingestion
    path.  Re-running :func:`exact_dedup` over the full corpus each
    wave is O(corpus) per wave ⇒ quadratic over the crawl's lifetime;
    at 100 TB the old side must contribute only its 16-byte content
    digests, held in sharded membership state that persists between
    waves (``snapshot()`` — the same checkpoint contract as the
    frontier seen-set, ``state/seen.py``).

    Demo split (deterministic, oracle-checkable): even ``doc_id`` =
    ingested corpus, odd = the new wave.

    Stages:

    1. **Ingest** — one streaming pass over old docs emits content
       hashes into ``n_shards`` membership actors keyed by
       ``hash % n_shards``; old TEXT never leaves the scan tasks.
       (In production this state already exists from the prior wave's
       snapshot; the pass is shown for a self-contained run.)
    2. **Within-wave dedup** — hash-keyed groupby over the new wave,
       keep min ``doc_id`` per hash with its copy count (the
       :func:`exact_dedup` kernel).
    3. **Probe** — survivors batch-probe the shard actors
       (one RPC per (batch, touched shard), vectorized masks); rows
       whose hash is already ingested drop.

    Collision contract (VERDICT r3 item 7 applied to the incremental
    path): both the within-wave keep-first AND the cross-wave
    membership carry the full 128-bit digest by default — the lo word
    shards/groups, the hi word confirms — so a distinct new doc is
    never silently merged or dropped short of a blake2b-128 collision.
    Memory: exact128 table = ~27 B/key ⇒ 10^10 ingested docs ≈ 270 GB
    cluster-wide across shards; ``backend="exact"`` halves that with
    the documented 64-bit birthday contract (~5 wrong drops per 10^10
    x 10^10), ``backend="cuckoo"`` is the 2.4 B/key envelope (~0.01%
    FP) where a few extra drops are acceptable.

    Reference analog: the crawler never refetches a seen URL
    (crawler.go:137-156); here the corpus never re-ingests seen
    content.
    """
    from crawl_ray.urlnorm import content_hash128_batch

    actors = [_HashMembershipShard.remote(backend) for _ in range(n_shards)]

    def ingest(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        old = np.flatnonzero(ids % 2 == 0)
        n = 0
        if len(old):
            h, check = content_hash128_batch(
                batch.column("text").take(pa.array(old, pa.int64()))
            )
            shard = h % np.uint64(n_shards)
            ray.get(
                [
                    actors[int(s)].add.remote(h[shard == s], check[shard == s])
                    for s in np.unique(shard).tolist()
                ]
            )
            n = len(old)
        return pa.table({"n": pa.array([n], pa.int64())})

    docs = _docs(sf_dir, ["doc_id", "text"])
    # barrier: every old hash must be registered before any probe runs
    docs.map_batches(
        ingest, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()

    from crawl_ray.pipelines.stats import _splitmix64

    P = _default_band_partitions()

    def new_wave_hash(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        new = np.flatnonzero(ids % 2 == 1)
        h, check = content_hash128_batch(
            batch.column("text").take(pa.array(new, pa.int64()))
        )
        return pa.table(
            {
                "doc_id": pa.array(ids[new], pa.int64()),
                "text_hash": pa.array(h, pa.uint64()),
                "check": pa.array(check, pa.uint64()),
                "part": pa.array(
                    (_splitmix64(h) % np.uint64(P)).astype(np.int64),
                    pa.int64(),
                ),
            }
        )

    # hash-partitioned keep-first (the exact_dedup vectorized-segment
    # kernel, digest-verified): per-group Python bounded by the
    # partition count
    def keep_first(group: pa.Table) -> pa.Table:
        idx = pc.sort_indices(
            group,
            sort_keys=[("text_hash", "ascending"), ("check", "ascending"),
                       ("doc_id", "ascending")],
        )
        g = group.take(idx)
        starts = _dedup_group_starts(g, "digest")
        lens = np.diff(np.r_[starts, g.num_rows])
        kept = g.take(pa.array(starts, pa.int64())).select(
            ["doc_id", "text_hash", "check"]
        )
        return kept.append_column(
            "n_new_copies", pa.array(lens, pa.int64())
        )

    def probe(batch: pa.Table) -> pa.Table:
        out = batch.select(["doc_id", "n_new_copies"])
        if batch.num_rows == 0:
            return out
        h = batch.column("text_hash").to_numpy(zero_copy_only=False)
        c = batch.column("check").to_numpy(zero_copy_only=False)
        shard = h % np.uint64(n_shards)
        seen = np.zeros(len(h), dtype=bool)
        touched = np.unique(shard).tolist()
        masks = ray.get(
            [actors[int(s)].contains.remote(h[shard == s], c[shard == s])
             for s in touched]
        )
        for s, m in zip(touched, masks):
            seen[shard == s] = m
        return out.filter(pa.array(~seen))

    survivors = (
        docs.map_batches(
            new_wave_hash, batch_format="pyarrow", zero_copy_batch=True
        )
        .groupby("part")
        .map_groups(keep_first, batch_format="pyarrow")
        .map_batches(probe, batch_format="pyarrow")
    )
    out = collect_table(survivors).select(["doc_id", "n_new_copies"])
    return out.sort_by([("doc_id", "ascending")])
