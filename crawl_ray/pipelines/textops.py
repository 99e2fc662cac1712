"""Text-analysis operators for large-scale training-data pipelines:
whitespace normalization (the F1 kernel at corpus scale), token
counting, quality scoring, language ID, and document fingerprinting.

All stages are vectorized ``map_batches`` over Arrow batches; the
SQL-expressible ones carry DuckDB oracles in ``__ray_entry__``.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data

from crawl_ray.util import collect_table, rename_select


def _tdiv(a: int, b: int) -> int:
    """DuckDB-semantics integer division (truncate toward zero) over
    Python bigints — the one shared definition for the regression /
    Zipf-fit oracle parity paths."""
    q = abs(a) // abs(b)
    return q if (a >= 0) == (b >= 0) else -q


def _topv_by_count(ds, key_col: str, cnt_col: str, top_v: int,
                   extra_cols: tuple[str, ...] = ()):
    """Bounded-vocab truncation with the shared (count desc, key asc)
    tie-break: per-block local top-``top_v`` (map_batches) then the
    identical driver merge.  The cut boundary is ORACLE-VISIBLE — every
    LM/vocab operator must truncate exactly where its SQL oracle does,
    so there is ONE definition.  Returns ``(keys, counts, *extras)``
    numpy arrays; ``extra_cols`` ride along through both cuts."""

    def local_topk(batch: pa.Table) -> pa.Table:
        keys = batch.column(key_col).to_numpy(zero_copy_only=False)
        cnt = batch.column(cnt_col).to_numpy(
            zero_copy_only=False
        ).astype(np.int64)
        order = np.lexsort((keys, -cnt))[:top_v]
        cols = {"key": pa.array(keys[order], pa.string()),
                "cnt": pa.array(cnt[order], pa.int64())}
        for c in extra_cols:
            e = batch.column(c).to_numpy(
                zero_copy_only=False
            ).astype(np.int64)
            cols[c] = pa.array(e[order], pa.int64())
        return pa.table(cols)

    t = collect_table(
        ds.map_batches(local_topk, batch_format="pyarrow",
                       zero_copy_batch=True)
    )
    if t.num_rows == 0 or "key" not in t.column_names:
        # empty corpus: the Aggregate's zero-row block short-circuits
        # past local_topk keeping the pre-UDF schema — return typed
        # empties instead of KeyError'ing on the missing "key" column
        empty: list[np.ndarray] = [
            np.array([], dtype=object), np.zeros(0, np.int64),
        ]
        for _ in extra_cols:
            empty.append(np.zeros(0, np.int64))
        return tuple(empty)
    keys = t.column("key").to_numpy(zero_copy_only=False)
    cnts = t.column("cnt").to_numpy(zero_copy_only=False).astype(np.int64)
    order = np.lexsort((keys, -cnts))[:top_v]
    out = [keys[order], cnts[order]]
    for c in extra_cols:
        out.append(
            t.column(c).to_numpy(zero_copy_only=False).astype(np.int64)[order]
        )
    return tuple(out)

__all__ = [
    "normalize_whitespace",
    "token_stats",
    "quality_score",
    "language_id",
    "fingerprints",
    "sample_documents",
    "stratified_sample",
    "ngram_counts",
    "benchmark_decontam",
    "oov_rate",
    "quality_gate",
    "quality_percentile",
    "topk_sketch",
    "top_terms_per_doc",
    "redact_terms",
    "pack_sequences",
    "chunk_documents",
    "corpus_mixture",
    "repetition_stats",
    "unigram_logprob",
    "ccnet_buckets",
    "lang_length_regression",
    "zipf_fit",
    "langid_confusion",
    "quality_ks_test",
    "length_histogram",
    "source_token_budget",
    "source_quota_sample",
    "build_inverted_index",
    "term_postings",
    "search_topk",
    "tfidf_top_terms",
    "bpe_token_stats",
    "training_corpus_prep",
    "duplicated_ngrams",
    "duplicate_spans",
    "remove_duplicate_spans",
    "cross_source_overlap",
    "fuzzy_decontam",
    "gopher_rules",
    "collocations",
    "dsir_weights",
    "token_entropy",
    "LANG_MARKERS",
]

SAMPLE_MODULUS = 1 << 32
SAMPLE_MULT = 2654435761  # Knuth multiplicative hash


def _docs(sf_dir: str, columns=None):
    return ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=columns)


def normalize_whitespace(sf_dir: str):
    """F1 whitespace collapse (``html_utils.go:38``) applied to the
    documents corpus — pure Arrow kernels, zero Python per row."""

    def norm(batch: pa.Table) -> pa.Table:
        text = batch.column("text")
        collapsed = pc.replace_substring_regex(text, r"\s+", " ")
        trimmed = pc.utf8_trim_whitespace(collapsed)
        return pa.table(
            {"doc_id": batch.column("doc_id").cast(pa.int64()), "text_norm": trimmed}
        )

    return _docs(sf_dir, ["doc_id", "text"]).map_batches(
        norm, batch_format="pyarrow", zero_copy_batch=True
    )


def token_stats(sf_dir: str):
    """Whitespace token count + char stats per document (vectorized)."""

    def stats(batch: pa.Table) -> pa.Table:
        text = batch.column("text")
        tokens = pc.split_pattern_regex(pc.utf8_trim_whitespace(text), r"\s+")
        n_tokens = pc.list_value_length(tokens).cast(pa.int64())
        n_chars = pc.utf8_length(text).cast(pa.int64())
        return pa.table(
            {
                "doc_id": batch.column("doc_id").cast(pa.int64()),
                "n_tokens": n_tokens,
                "n_chars": n_chars,
            }
        )

    return _docs(sf_dir, ["doc_id", "text"]).map_batches(
        stats, batch_format="pyarrow", zero_copy_batch=True
    )


def quality_score(sf_dir: str):
    """Deterministic quality signals: alpha-char count, space count,
    mean token length ×1000 (integer — exact for the oracle)."""

    def score(batch: pa.Table) -> pa.Table:
        text = batch.column("text")
        n_chars = pc.utf8_length(text).cast(pa.int64())
        alpha = pc.utf8_length(
            pc.replace_substring_regex(text, r"[^A-Za-z]", "")
        ).cast(pa.int64())
        spaces = _space_count(text)
        tokens = _ws_token_count(text)
        # mean token length in milli-chars, integer arithmetic — the
        # shared contract (parts already computed here, so no re-scan)
        mean_tok_len_milli = _mean_tok_len_from_parts(n_chars, spaces, tokens)
        return pa.table(
            {
                "doc_id": batch.column("doc_id").cast(pa.int64()),
                "n_chars": n_chars,
                "n_alpha": alpha,
                "n_spaces": spaces,
                "mean_tok_len_milli": mean_tok_len_milli.cast(pa.int64()),
            }
        )

    return _docs(sf_dir, ["doc_id", "text"]).map_batches(
        score, batch_format="pyarrow", zero_copy_batch=True
    )


# marker-word heuristic: count per-language marker occurrences, argmax
# with fixed tie-break order (the SQL oracle implements the same CASE).
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "a"],
    "de": ["der", "die"],
    "fr": ["le", "la"],
    "es": ["el", "los"],
}


def _lang_score_matrix(text, n_rows: int) -> np.ndarray:
    """Marker-word score matrix (``n_rows × len(LANG_MARKERS)``) — the
    ONE definition of the language-ID classifier, shared by
    :func:`language_id` (the deployed stage), :func:`langid_confusion`
    (its accuracy audit — auditing a drifted copy would be silent) and
    :func:`training_corpus_prep` (its filter).  The shared tie-break is
    ``np.argmax(..., axis=1)``: first max wins, in
    ``list(LANG_MARKERS)`` order."""
    padded = pc.binary_join_element_wise(
        pa.array([" "] * n_rows), text, pa.array([" "] * n_rows), ""
    )
    scores = []
    for markers in LANG_MARKERS.values():
        total = None
        for w in markers:
            c = pc.count_substring(padded, f" {w} ").cast(pa.int64())
            total = c if total is None else pc.add(total, c)
        scores.append(total.to_numpy(zero_copy_only=False))
    return np.stack(scores, axis=1)


def language_id(sf_dir: str):
    """N-gram/marker-word language-ID heuristic (deterministic)."""
    order = list(LANG_MARKERS)

    def lang(batch: pa.Table) -> pa.Table:
        mat = _lang_score_matrix(batch.column("text"), batch.num_rows)
        best = np.argmax(mat, axis=1)  # first max wins = order tie-break
        langs = np.array(order, dtype=object)[best]
        return pa.table(
            {
                "doc_id": batch.column("doc_id").cast(pa.int64()),
                "lang_pred": pa.array(langs.tolist(), pa.string()),
                "lang_score": pa.array(mat.max(axis=1), pa.int64()),
            }
        )

    return _docs(sf_dir, ["doc_id", "text"]).map_batches(
        lang, batch_format="pyarrow", zero_copy_batch=True
    )


def sample_documents(sf_dir: str, rate_ppm: int = 200_000):
    """Seeded deterministic sampling (O3): keep rows whose Knuth
    multiplicative hash of ``doc_id`` falls below the rate — the
    reproducible, SQL-expressible analog of
    ``ds.random_sample(f, seed=…)`` (same sample on every run, every
    partitioning, every cluster size)."""
    threshold = np.uint64(rate_ppm * SAMPLE_MODULUS // 1_000_000)

    def samp(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False).astype(np.uint64)
        with np.errstate(over="ignore"):
            keep = (ids * np.uint64(SAMPLE_MULT)) % np.uint64(SAMPLE_MODULUS) < threshold
        out = batch.filter(pa.array(keep))
        return pa.table(
            {
                "doc_id": out.column("doc_id").cast(pa.int64()),
                "text": out.column("text"),
            }
        )

    return _docs(sf_dir, ["doc_id", "text"]).map_batches(
        samp, batch_format="pyarrow", zero_copy_batch=True
    )


def _lang_topk(t: pa.Table, k: int) -> pa.Table:
    """Keep the k lowest-``(h, doc_id)`` rows per ``lang`` and attach
    their 1-based rank ``rk`` — one Arrow sort + run-length rank over
    the whole table, no per-group Python."""
    idx = pc.sort_indices(
        t,
        sort_keys=[
            ("lang", "ascending"),
            ("h", "ascending"),
            ("doc_id", "ascending"),
        ],
    )
    t = t.take(idx)
    g = t.column("lang").to_numpy(zero_copy_only=False)
    starts = np.flatnonzero(np.r_[True, g[1:] != g[:-1]])
    runlens = np.diff(np.append(starts, len(g)))
    rnk = np.arange(len(g), dtype=np.int64) - np.repeat(starts, runlens) + 1
    t = t.append_column("rk", pa.array(rnk, pa.int64()))
    return t.filter(pa.array(rnk <= k))


def stratified_sample(sf_dir: str, k: int = 50):
    """Per-group quota sampling (corpus curation: cap each language at
    k documents, chosen by a deterministic hash order so the quota is
    a reproducible uniform sample within the group).

    Scale shape: per-batch partial top-k per lang shrinks every block
    to ≤ langs-in-block × k rows before the only shuffle — a
    ``groupby(lang)`` re-rank over partials bounded by
    langs × k × num_blocks (same partial-then-final pattern as
    ``recrawl_schedule``).  Group count (languages) is tiny even at
    100 TB, so the final stage is a handful of tasks."""

    def partial(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False).astype(np.uint64)
        with np.errstate(over="ignore"):
            h = (ids * np.uint64(SAMPLE_MULT)) % np.uint64(SAMPLE_MODULUS)
        t = pa.table(
            {
                "doc_id": batch.column("doc_id").cast(pa.int64()),
                "lang": batch.column("lang"),
                "h": pa.array(h.astype(np.int64), pa.int64()),
            }
        )
        return _lang_topk(t, k).drop_columns(["rk"])

    parts = _docs(sf_dir, ["doc_id", "lang"]).map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    )

    def rerank(group: pa.Table) -> pa.Table:
        return _lang_topk(group, k).select(["doc_id", "lang", "rk"])

    return (
        parts.groupby("lang")
        .map_groups(rerank, batch_format="pyarrow")
        .sort("doc_id")
    )


def _token_lists(batch: pa.Table):
    """Whitespace-split every doc; returns (doc_ids, flat token object
    array, per-doc token counts) — the shared vectorized tokenizer for
    the n-gram/term operators (splitter ≡ the oracle's
    ``string_split_regex(trim(text), '\\s+')``)."""
    doc_ids = batch.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
    toks = pc.split_pattern_regex(
        pc.utf8_trim_whitespace(batch.column("text")), r"\s+"
    )
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    lens = pc.list_value_length(toks).to_numpy(zero_copy_only=False).astype(np.int64)
    flat = toks.flatten().to_numpy(zero_copy_only=False)
    return doc_ids, flat, lens


def _gram_arrays(flat: np.ndarray, lens: np.ndarray, n: int):
    """Vectorized word n-gram construction over the flat token array of
    a batch: returns (grams StringArray joined by " ", doc-row index per
    gram).  Gram i of doc d = tokens[d][i : i+n] — identical to the
    oracle's ``t[i] || ' ' || … || t[i+n-1]`` construction."""
    n_grams = np.maximum(lens - n + 1, 0)
    starts = np.repeat(np.cumsum(lens) - lens, n_grams)
    offs = np.arange(n_grams.sum(), dtype=np.int64) - np.repeat(
        np.cumsum(n_grams) - n_grams, n_grams
    )
    idx = starts + offs
    doc_idx = np.repeat(np.arange(len(lens), dtype=np.int64), n_grams)
    if not len(idx):
        return pa.array([], pa.string()), doc_idx
    parts = [pa.array(flat[idx + j], pa.string()) for j in range(n)]
    grams = parts[0]
    for p in parts[1:]:
        grams = pc.binary_join_element_wise(grams, p, " ")
    return grams, doc_idx


def benchmark_decontam(sf_dir: str, k: int = 4, bench_mod: int = 97):
    """Benchmark decontamination: flag every corpus document sharing a
    word ``k``-gram with the benchmark set (docs with ``doc_id %
    bench_mod == 0`` stand in for an eval suite).  Returns
    ``(doc_id, hits)`` — hits = number of DISTINCT contaminated grams —
    for contaminated non-benchmark docs only.

    Scale shape: the benchmark side is eval-suite-sized BY CONTRACT
    (that is what decontamination means), so its distinct grams are
    collected once and broadcast via ``ray.put``; the corpus side is
    one streaming ``map_batches`` pass — gram construction is the
    vectorized flat-index kernel, membership is ``pc.is_in`` (Arrow
    C++ hash set, exact string equality — no hash-collision caveat),
    and the per-doc distinct count groups only the matched subset."""

    def bench_partial(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        batch = batch.filter(pa.array(ids % bench_mod == 0))
        _, flat, lens = _token_lists(batch)
        grams, _ = _gram_arrays(flat, lens, k)
        return pa.table({"gram": pc.unique(grams)})

    bench = collect_table(
        _docs(sf_dir, ["doc_id", "text"]).map_batches(
            bench_partial, batch_format="pyarrow", zero_copy_batch=True
        )
    )
    bench_grams = pc.unique(bench.column("gram"))
    if isinstance(bench_grams, pa.ChunkedArray):
        bench_grams = bench_grams.combine_chunks()
    bench_ref = ray.put(bench_grams)

    def scan(batch: pa.Table) -> pa.Table:
        empty = pa.table(
            {"doc_id": pa.array([], pa.int64()),
             "hits": pa.array([], pa.int64())}
        )
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        batch = batch.filter(pa.array(ids % bench_mod != 0))
        doc_ids, flat, lens = _token_lists(batch)
        grams, doc_idx = _gram_arrays(flat, lens, k)
        if not len(doc_idx):
            return empty
        hit = pc.is_in(grams, value_set=ray.get(bench_ref))
        pos = np.flatnonzero(hit.to_numpy(zero_copy_only=False))
        if not len(pos):
            return empty
        sub = pa.table(
            {"doc_id": pa.array(doc_ids[doc_idx[pos]], pa.int64()),
             "gram": grams.take(pa.array(pos, pa.int64()))}
        )
        dd = pa.TableGroupBy(sub, ["doc_id", "gram"]).aggregate([])
        agg = pa.TableGroupBy(dd.select(["doc_id"]), "doc_id").aggregate(
            [([], "count_all")]
        )
        return pa.table(
            {"doc_id": agg.column("doc_id"),
             "hits": agg.column("count_all").cast(pa.int64())}
        )

    return (
        _docs(sf_dir, ["doc_id", "text"])
        .map_batches(scan, batch_format="pyarrow", zero_copy_batch=True)
        .sort("doc_id")
    )


def _mg_trim(terms: np.ndarray, counts: np.ndarray, capacity: int):
    """Misra–Gries summary trim: decrement every count by the
    (capacity+1)-th largest and drop non-positives — the mergeable-
    summaries step (Agarwal et al., PODS'12) that bounds the summary at
    ``capacity`` entries with count error ≤ n/capacity."""
    if len(terms) <= capacity:
        return terms, counts
    d = np.partition(counts, len(counts) - capacity - 1)[
        len(counts) - capacity - 1
    ]
    counts = counts - d
    keep = counts > 0
    return terms[keep], counts[keep]


def topk_sketch(sf_dir: str, capacity: int = 1024, top_k: int = 20):
    """Shuffle-free heavy hitters: each block emits a Misra–Gries
    summary (≤ ``capacity`` entries) of its unigram counts; the driver
    merges summaries (sum, then one trim).  No exchange at all — the
    scale path for top-k terms when even :func:`ngram_counts`'s
    int-partition shuffle is too wide.  Estimated counts are exact
    whenever the corpus has ≤ capacity distinct terms (the fixture —
    hence SQL-oracle-checkable) and are lower bounds within
    n/capacity otherwise."""

    def partial(batch: pa.Table) -> pa.Table:
        _, flat, lens = _token_lists(batch)
        if not len(flat):
            return pa.table(
                {"term": pa.array([], pa.string()),
                 "cnt": pa.array([], pa.int64())}
            )
        vc = pa.array(flat, pa.string()).value_counts()
        terms = vc.field("values").to_numpy(zero_copy_only=False)
        counts = vc.field("counts").to_numpy(zero_copy_only=False).astype(np.int64)
        terms, counts = _mg_trim(terms, counts, capacity)
        return pa.table(
            {"term": pa.array(terms, pa.string()),
             "cnt": pa.array(counts, pa.int64())}
        )

    def merge_stage(batch: pa.Table) -> pa.Table:
        # intermediate distributed merge: keeps the driver collect at
        # ≤ fan_in × capacity rows no matter the block count (MG
        # summaries are mergeable pairwise, so this is exact-preserving)
        agg = pa.TableGroupBy(batch, "term").aggregate([("cnt", "sum")])
        t = agg.column("term").to_numpy(zero_copy_only=False)
        c = agg.column("cnt_sum").to_numpy(zero_copy_only=False).astype(np.int64)
        t, c = _mg_trim(t, c, capacity)
        return pa.table(
            {"term": pa.array(t, pa.string()),
             "cnt": pa.array(c, pa.int64())}
        )

    fan_in = 32
    parts = collect_table(
        _docs(sf_dir, ["doc_id", "text"])
        .map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .repartition(fan_in)
        .map_batches(merge_stage, batch_format="pyarrow", zero_copy_batch=True)
    )  # bounded: ≤ fan_in × capacity rows
    merged = pa.TableGroupBy(parts, "term").aggregate([("cnt", "sum")])
    terms = merged.column("term").to_numpy(zero_copy_only=False)
    counts = merged.column("cnt_sum").to_numpy(zero_copy_only=False).astype(np.int64)
    terms, counts = _mg_trim(terms, counts, capacity)
    order = np.lexsort((terms, -counts))[:top_k]
    return pa.table(
        {"term": pa.array(terms[order], pa.string()),
         "cnt": pa.array(counts[order], pa.int64())}
    )


def _space_count(text) -> pa.ChunkedArray:
    return pc.utf8_length(
        pc.replace_substring_regex(text, r"[^ ]", "")
    ).cast(pa.int64())


def _ws_token_count(text) -> pa.ChunkedArray:
    return pc.list_value_length(
        pc.split_pattern_regex(pc.utf8_trim_whitespace(text), r"\s+")
    ).cast(pa.int64())


def _mean_tok_len_from_parts(n_chars, spaces, tokens) -> pa.ChunkedArray:
    """The milli-chars-per-token rule (zero tokens → 0) — the ONE
    definition of the quality-score contract; callers that already hold
    the parts (quality_score) use this, others use the text wrapper."""
    return pc.if_else(
        pc.greater(tokens, 0),
        pc.divide(pc.multiply(pc.subtract(n_chars, spaces), 1000), tokens),
        pa.scalar(0, pa.int64()),
    ).cast(pa.int64())


def _mean_tok_len_milli(text: pa.ChunkedArray) -> pa.ChunkedArray:
    """The quality_score kernel's headline signal (integer milli-chars
    per token) — shared by quality_score / quality_gate /
    quality_percentile / quality_ks_test."""
    n_chars = pc.utf8_length(text).cast(pa.int64())
    return _mean_tok_len_from_parts(
        n_chars, _space_count(text), _ws_token_count(text)
    )


def _lang_score_hist(batch: pa.Table) -> pa.Table:
    """Shared (lang, score)→count combiner for quality_gate /
    quality_percentile: 32-bit bit-packed composite keys.  Scores are
    mean-token-length milli-chars; a score ≥ 2^32 (a single ~4.3M-char
    token) would silently bleed into the lang bits, so guard loudly."""
    langs = batch.column("lang").to_numpy(zero_copy_only=False)
    score = _mean_tok_len_milli(batch.column("text")).to_numpy(
        zero_copy_only=False
    )
    if len(score) and int(score.max()) >= (1 << 32):
        raise ValueError("quality score exceeds 32-bit packing range")
    codes, inv = np.unique(langs, return_inverse=True)
    key = inv.astype(np.int64) * (1 << 32) + score
    uk, cnt = np.unique(key, return_counts=True)
    return pa.table(
        {"lang": pa.array(codes[(uk >> 32)], pa.string()),
         "score": pa.array(uk & ((1 << 32) - 1), pa.int64()),
         "cnt": pa.array(cnt, pa.int64())}
    )


def quality_gate(sf_dir: str, pct: int = 10):
    """Per-language quality percentile gate: drop every document whose
    quality score (mean token length, integer milli-chars) falls below
    the within-language ``pct``-th percentile — the CCNet-style
    "keep the best of each language" filter.

    Scale shape: two streaming passes, no row shuffle.  Pass 1 builds a
    per-batch ``(lang, score) → count`` histogram (bounded by langs ×
    integer score domain, NOT by row count — the exact-quantile trick
    from ``stats.py``), combined driver-side; per-language thresholds
    use DuckDB's ``quantile_disc`` rank ``ceil(q·n)−1`` in integer
    math.  Pass 2 re-scores and filters against the broadcast
    threshold table."""

    parts = collect_table(
        _docs(sf_dir, ["text", "lang"]).map_batches(
            _lang_score_hist, batch_format="pyarrow", zero_copy_batch=True
        )
    )  # bounded: langs × distinct integer scores
    langs = parts.column("lang").to_numpy(zero_copy_only=False)
    score = parts.column("score").to_numpy(zero_copy_only=False)
    cnt = parts.column("cnt").to_numpy(zero_copy_only=False)
    codes, inv = np.unique(langs, return_inverse=True)
    key = inv.astype(np.int64) * (1 << 32) + score
    order = np.argsort(key, kind="stable")
    key, cnt = key[order], cnt[order]
    uk, starts = np.unique(key, return_index=True)
    merged = np.add.reduceat(cnt, starts)
    lang_of = (uk >> 32).astype(np.int64)
    score_of = (uk & ((1 << 32) - 1)).astype(np.int64)
    thresholds: dict[str, int] = {}
    for li, lang in enumerate(codes):
        m = lang_of == li
        sc, c = score_of[m], merged[m]  # score-ascending within lang
        n = int(c.sum())
        rank = (pct * n + 99) // 100 - 1  # quantile_disc: ceil(q·n)−1
        csum = np.cumsum(c)
        thresholds[str(lang)] = int(sc[np.searchsorted(csum, rank + 1)])
    thr_codes = np.array(sorted(thresholds), dtype=object)
    thr_vals = np.array([thresholds[c] for c in thr_codes], dtype=np.int64)
    thr_ref = ray.put((thr_codes, thr_vals))

    def gate(batch: pa.Table) -> pa.Table:
        codes_b, vals_b = ray.get(thr_ref)
        langs = batch.column("lang").to_numpy(zero_copy_only=False)
        score = _mean_tok_len_milli(batch.column("text"))
        idx = np.searchsorted(codes_b, langs)
        keep = score.to_numpy(zero_copy_only=False) >= vals_b[idx]
        out = pa.table(
            {
                "doc_id": batch.column("doc_id").cast(pa.int64()),
                "lang": batch.column("lang"),
                "mean_tok_len_milli": score,
            }
        )
        return out.filter(pa.array(keep))

    return (
        _docs(sf_dir, ["doc_id", "text", "lang"])
        .map_batches(gate, batch_format="pyarrow", zero_copy_batch=True)
        .sort("doc_id")
    )


def quality_percentile(sf_dir: str):
    """Within-language RANK TRANSFORM of the quality score (the window
    function ``rank() OVER (PARTITION BY lang ORDER BY score)`` plus a
    percentile normalization) computed WITHOUT a row shuffle: the same
    bounded (lang × integer-score) histogram as :func:`quality_gate`
    gives every language's exact CDF; the broadcast CDF turns pass 2
    into a row-local searchsorted.  Rank semantics ≡ SQL ``rank()``
    (ties share the minimum rank); ``pctl_milli`` is the integer
    percentile ``(rank−1)·1000 // (n−1)``."""

    parts = collect_table(
        _docs(sf_dir, ["text", "lang"]).map_batches(
            _lang_score_hist, batch_format="pyarrow", zero_copy_batch=True
        )
    )
    t = parts.group_by(["lang", "score"]).aggregate([("cnt", "sum")])
    langs = np.array(t.column("lang").to_pylist(), dtype=object)
    score = t.column("score").to_numpy(zero_copy_only=False)
    cnt = t.column("cnt_sum").to_numpy(zero_copy_only=False).astype(np.int64)
    cdf: dict[str, tuple[np.ndarray, np.ndarray, int]] = {}
    for lang in np.unique(langs):
        m = langs == lang
        sc, c = score[m], cnt[m]
        o = np.argsort(sc)
        sc, c = sc[o], c[o]
        below = np.concatenate([[0], np.cumsum(c)[:-1]])  # exclusive
        cdf[str(lang)] = (sc, below.astype(np.int64), int(c.sum()))
    cdf_ref = ray.put(cdf)

    def rank_rows(batch: pa.Table) -> pa.Table:
        table = ray.get(cdf_ref)
        langs_b = batch.column("lang").to_numpy(zero_copy_only=False)
        sc = _mean_tok_len_milli(batch.column("text")).to_numpy(
            zero_copy_only=False
        )
        rnk = np.empty(len(sc), dtype=np.int64)
        pct = np.empty(len(sc), dtype=np.int64)
        for lang in np.unique(langs_b):
            m = langs_b == lang
            scores_l, below_l, n = table[str(lang)]
            idx = np.searchsorted(scores_l, sc[m])  # exact hit by constr.
            r = below_l[idx] + 1
            rnk[m] = r
            pct[m] = (r - 1) * 1000 // (n - 1) if n > 1 else 0
        return pa.table(
            {"doc_id": batch.column("doc_id").cast(pa.int64()),
             "lang": batch.column("lang"),
             "mean_tok_len_milli": pa.array(sc, pa.int64()),
             "rnk": pa.array(rnk, pa.int64()),
             "pctl_milli": pa.array(pct, pa.int64())}
        )

    # no trailing sort: the output is corpus-sized and the rank/CDF
    # design exists precisely to avoid a row shuffle
    return _docs(sf_dir, ["doc_id", "text", "lang"]).map_batches(
        rank_rows, batch_format="pyarrow", zero_copy_batch=True
    )


def oov_rate(sf_dir: str, vocab_size: int = 10):
    """Out-of-vocabulary scoring: per document, total tokens and tokens
    outside the corpus top-``vocab_size`` unigram vocabulary (count
    desc, token asc — the deterministic limit boundary).  Integer
    counts only, so the oracle comparison is exact.

    Scale shape: the vocabulary is the (already partial-aggregated +
    int-partition-shuffled) :func:`ngram_counts` top-k — a bounded
    table — broadcast once; the scoring pass is a single streaming
    ``map_batches`` with an Arrow ``is_in`` + ``np.bincount``."""
    vocab = ngram_counts(sf_dir, n=1, top_k=vocab_size)
    vocab_ref = ray.put(vocab.column("ngram").combine_chunks())

    def score(batch: pa.Table) -> pa.Table:
        doc_ids, flat, lens = _token_lists(batch)
        if not len(doc_ids):
            return pa.table(
                {"doc_id": pa.array([], pa.int64()),
                 "n_tokens": pa.array([], pa.int64()),
                 "n_oov": pa.array([], pa.int64())}
            )
        known = pc.is_in(
            pa.array(flat, pa.string()), value_set=ray.get(vocab_ref)
        ).to_numpy(zero_copy_only=False)
        doc_idx = np.repeat(np.arange(len(doc_ids), dtype=np.int64), lens)
        oov = np.bincount(
            doc_idx, weights=~known, minlength=len(doc_ids)
        ).astype(np.int64)
        return pa.table(
            {"doc_id": pa.array(doc_ids, pa.int64()),
             "n_tokens": pa.array(lens, pa.int64()),
             "n_oov": pa.array(oov, pa.int64())}
        )

    return (
        _docs(sf_dir, ["doc_id", "text"])
        .map_batches(score, batch_format="pyarrow", zero_copy_batch=True)
        .sort("doc_id")
    )


def ngram_counts(
    sf_dir: str, n: int = 2, top_k: int = 50, num_partitions: int = 32
):
    """Global top-k word n-gram frequencies — the word-count shape at
    corpus scale: per-batch partial counts (``np.unique``, no Python
    per token) → ONE int-keyed shuffle on ``hash(ngram) %
    num_partitions`` → per-partition combine + exact local top-k
    (partitions are key-disjoint) → bounded driver merge.  Shuffling an
    int64 partition id instead of grouping on the string key itself
    keeps the sort-based exchange off the vocabulary strings and caps
    the group count at ``num_partitions`` regardless of vocab size."""
    from crawl_ray.urlnorm import fnv1a64_batch

    def partial(batch: pa.Table) -> pa.Table:
        empty = pa.table(
            {"ngram": pa.array([], pa.string()),
             "cnt": pa.array([], pa.int64()),
             "part": pa.array([], pa.int64())}
        )
        _, flat, lens = _token_lists(batch)
        if not len(flat):
            return empty
        grams, _ = _gram_arrays(flat, lens, n)
        if not len(grams):
            return empty
        vc = grams.value_counts()  # Arrow C++ hash count, no object sort
        uniq = vc.field("values")
        counts = vc.field("counts").cast(pa.int64())
        pid = (
            fnv1a64_batch(uniq.to_pylist()) % np.uint64(num_partitions)
        ).astype(np.int64)
        return pa.table(
            {"ngram": uniq,
             "cnt": counts,
             "part": pa.array(pid, pa.int64())}
        )

    def combine_topk(group: pa.Table) -> pa.Table:
        # Arrow hash aggregation + Arrow sort: string comparisons stay
        # in C++ (np.unique over object arrays was the hotspot here)
        agg = pa.TableGroupBy(
            group.select(["ngram", "cnt"]), "ngram"
        ).aggregate([("cnt", "sum")])
        order = pc.sort_indices(
            agg,
            sort_keys=[("cnt_sum", "descending"), ("ngram", "ascending")],
        )[:top_k]
        agg = agg.take(order)
        return pa.table(
            {"ngram": agg.column("ngram"),
             "cnt": agg.column("cnt_sum")}
        )

    ds = (
        _docs(sf_dir, ["doc_id", "text"])
        .map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .repartition(num_partitions)
        .groupby("part")
        .map_groups(combine_topk, batch_format="pyarrow")
    )

    t = collect_table(ds)  # bounded: ≤ top_k rows per partition
    grams = t.column("ngram").to_numpy(zero_copy_only=False)
    cnt = t.column("cnt").to_numpy(zero_copy_only=False).astype(np.int64)
    order = np.lexsort((grams, -cnt))[:top_k]
    return pa.table(
        {"ngram": pa.array(grams[order], pa.string()),
         "cnt": pa.array(cnt[order], pa.int64())}
    )


def top_terms_per_doc(sf_dir: str, k: int = 3):
    """Per-document top-k terms by count (ties broken by term asc) —
    batch-local, zero shuffle: term ids via ``np.unique`` (sorted, so
    id order ≡ lexicographic), composite ``doc × vocab`` keys counted
    in one pass, ranked with a vectorized segmented ``lexsort``."""

    def topk(batch: pa.Table) -> pa.Table:
        doc_ids, flat, lens = _token_lists(batch)
        if not len(flat):
            return pa.table(
                {"doc_id": pa.array([], pa.int64()),
                 "rnk": pa.array([], pa.int64()),
                 "term": pa.array([], pa.string()),
                 "cnt": pa.array([], pa.int64())}
            )
        doc_idx = np.repeat(np.arange(len(doc_ids), dtype=np.int64), lens)
        vocab, inv = np.unique(flat, return_inverse=True)
        key = doc_idx * len(vocab) + inv
        uk, counts = np.unique(key, return_counts=True)
        d = uk // len(vocab)
        term_id = uk % len(vocab)
        order = np.lexsort((term_id, -counts, d))
        d, term_id, counts = d[order], term_id[order], counts[order]
        seg_start = np.flatnonzero(np.r_[True, d[1:] != d[:-1]])
        rnk = np.arange(len(d)) - np.repeat(seg_start, np.diff(np.r_[seg_start, len(d)])) + 1
        keep = rnk <= k
        return pa.table(
            {"doc_id": pa.array(doc_ids[d[keep]], pa.int64()),
             "rnk": pa.array(rnk[keep].astype(np.int64), pa.int64()),
             "term": pa.array(vocab[term_id[keep]], pa.string()),
             "cnt": pa.array(counts[keep].astype(np.int64), pa.int64())}
        )

    return _docs(sf_dir, ["doc_id", "text"]).map_batches(
        topk, batch_format="pyarrow", zero_copy_batch=True
    )


DEFAULT_REDACT_PATTERN = r"\b(customer|part)\b"


def redact_terms(
    sf_dir: str,
    pattern: str = DEFAULT_REDACT_PATTERN,
    replacement: str = "[PII]",
):
    """Regex redaction over the corpus (the PII-scrub shape: emails,
    phones, ids — demoed with terms the synthetic corpus contains).
    Pure RE2 Arrow kernels; DuckDB's ``regexp_replace(…, 'g')`` is RE2
    too, so the oracle reproduces it byte-for-byte."""

    def redact(batch: pa.Table) -> pa.Table:
        text = batch.column("text")
        red = pc.replace_substring_regex(text, pattern, replacement)
        stripped = pc.replace_substring_regex(text, pattern, "")
        n_red = pc.subtract(
            pc.utf8_length(text).cast(pa.int64()),
            pc.utf8_length(stripped).cast(pa.int64()),
        )
        return pa.table(
            {"doc_id": batch.column("doc_id").cast(pa.int64()),
             "text_red": red,
             "redacted_chars": n_red}
        )

    return _docs(sf_dir, ["doc_id", "text"]).map_batches(
        redact, batch_format="pyarrow", zero_copy_batch=True
    )


PII_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_IPV4_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
PII_PHONE_RE = r"\b\d{3}[-. ]\d{3}[-. ]\d{4}\b"


def pii_scrub(sf_dir: str):
    """Typed PII scrubbing over the corpus — the C4/RefinedWeb-style
    pre-training hygiene pass: emails, IPv4 addresses and phone numbers
    are redacted SEQUENTIALLY (email → ip → phone, each count taken on
    the text the previous stage produced, so an address inside an email
    is never double-counted) and replaced with stable type tokens.
    Pure RE2 Arrow kernels per batch, zero shuffle, streams at any
    scale; DuckDB's regex engine is RE2 too, so the oracle chain of
    ``regexp_replace(…, 'g')`` / ``len(regexp_extract_all(…))`` over
    the SAME intermediates reproduces both text and counts exactly.

    Reference parity note: the Go reference scrubs nothing — this is
    one of the beyond-reference corpus operators (crawl output →
    training data needs it; cf. /root/reference/README.md pipeline
    scope)."""

    def scrub(batch: pa.Table) -> pa.Table:
        t0 = batch.column("text")
        n_email = pc.count_substring_regex(t0, PII_EMAIL_RE).cast(pa.int64())
        t1 = pc.replace_substring_regex(t0, PII_EMAIL_RE, "<EMAIL>")
        n_ip = pc.count_substring_regex(t1, PII_IPV4_RE).cast(pa.int64())
        t2 = pc.replace_substring_regex(t1, PII_IPV4_RE, "<IP>")
        n_phone = pc.count_substring_regex(t2, PII_PHONE_RE).cast(pa.int64())
        t3 = pc.replace_substring_regex(t2, PII_PHONE_RE, "<PHONE>")
        return pa.table(
            {"doc_id": batch.column("doc_id").cast(pa.int64()),
             "text_scrubbed": t3,
             "n_emails": n_email,
             "n_ips": n_ip,
             "n_phones": n_phone}
        )

    return _docs(sf_dir, ["doc_id", "text"]).map_batches(
        scrub, batch_format="pyarrow", zero_copy_batch=True
    )


def fingerprints(sf_dir: str, k: int = 5, window: int = 4):
    """Winnowing document fingerprint over k-token shingles:
    per sliding window of ``window`` shingle hashes keep the minimum,
    then digest the sorted distinct window-minima.

    Hashes are md5 hex strings (C-speed per shingle; lexicographic min
    ≡ numeric min on hex), so DuckDB recomputes the whole scheme exactly
    — the driver oracle re-derives every fingerprint in SQL."""
    import hashlib

    def fp(batch: pa.Table) -> pa.Table:
        texts = batch.column("text").to_pylist()
        out = []
        md5 = hashlib.md5
        for text in texts:
            toks = text.split()
            if len(toks) < k:
                shingles = [md5(" ".join(toks).encode()).hexdigest()]
            else:
                shingles = [
                    md5(" ".join(toks[j : j + k]).encode()).hexdigest()
                    for j in range(len(toks) - k + 1)
                ]
            if len(shingles) <= window:
                mins = [min(shingles)]
            else:
                mins = [
                    min(shingles[j : j + window])
                    for j in range(len(shingles) - window + 1)
                ]
            out.append(md5(",".join(sorted(set(mins))).encode()).hexdigest())
        return pa.table(
            {
                "doc_id": batch.column("doc_id").cast(pa.int64()),
                "fingerprint": pa.array(out, pa.string()),
            }
        )

    return _docs(sf_dir, ["doc_id", "text"]).map_batches(
        fp, batch_format="pyarrow", zero_copy_batch=True
    )


def pack_sequences(
    sf_dir: str,
    capacity: int = 512,
    n_ranges: int = 64,
    sample_ppm: int = 50_000,
):
    """Deterministic sequence packing for LLM training shards: docs in
    doc_id order fill contiguous token bins of ``capacity``; a doc's
    bin is ``(tokens before it) // capacity`` — the global ordered
    prefix sum, computed distributed:

    1. token counts per doc (vectorized batch map);
    2. range boundaries from a deterministic hash-sample of doc_ids
       (bounded driver-side quantiles — no full sort);
    3. per-range token sums via per-batch partials (``n_ranges`` rows
       per batch, bounded driver combine) → per-range start offsets;
    4. ``groupby(range_id).map_groups``: sort the range by doc_id,
       local cumsum + the range's offset.

    One shuffle total (step 4); every range is ~1/``n_ranges`` of the
    corpus, so group memory is controlled by the range count."""

    def count_tokens(batch: pa.Table) -> pa.Table:
        _, _, lens = _token_lists(batch)
        return pa.table(
            {"doc_id": batch.column("doc_id").cast(pa.int64()),
             "n_tokens": pa.array(lens, pa.int64())}
        )

    counts = _docs(sf_dir, ["doc_id", "text"]).map_batches(
        count_tokens, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()
    return _pack_from_counts(counts, capacity, n_ranges, sample_ppm)


def _pack_from_counts(
    counts,
    capacity: int,
    n_ranges: int,
    sample_ppm: int,
):
    """Steps 2-4 of :func:`pack_sequences` over a materialized
    ``(doc_id, n_tokens)`` Dataset — shared with
    :func:`training_corpus_prep`, which packs a filtered corpus."""
    # bound the per-group size: one range ≤ ~250k docs no matter the
    # corpus (bin_id is a global prefix-sum property — independent of
    # the range partitioning, so growing n_ranges never changes output;
    # tests/test_textops.py asserts multi-range ≡ single-range)
    n_ranges = max(n_ranges, counts.count() // 250_000)

    # step 2: deterministic hash-sample → range boundaries
    def sample_ids(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False).astype(np.uint64)
        thr = np.uint64(sample_ppm * SAMPLE_MODULUS // 1_000_000)
        with np.errstate(over="ignore"):
            keep = (ids * np.uint64(SAMPLE_MULT)) % np.uint64(SAMPLE_MODULUS) < thr
        return pa.table({"doc_id": pa.array(ids[keep].astype(np.int64), pa.int64())})


    samp = collect_table(
        counts.map_batches(sample_ids, batch_format="pyarrow", zero_copy_batch=True)
    )
    sampled = np.sort(samp.column("doc_id").to_numpy(zero_copy_only=False))
    if len(sampled) >= n_ranges:
        qs = np.linspace(0, len(sampled) - 1, n_ranges + 1)[1:-1]
        bounds = np.unique(sampled[qs.astype(np.int64)])
    else:
        bounds = np.empty(0, dtype=np.int64)  # tiny corpus: one range

    def add_range(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        rid = np.searchsorted(bounds, ids, side="right").astype(np.int64)
        return batch.append_column("range_id", pa.array(rid, pa.int64()))

    ranged = counts.map_batches(
        add_range, batch_format="pyarrow", zero_copy_batch=True
    )

    # step 3: per-range token sums (per-batch partials → driver combine)
    def partial_sums(batch: pa.Table) -> pa.Table:
        rid = batch.column("range_id").to_numpy(zero_copy_only=False)
        tok = batch.column("n_tokens").to_numpy(zero_copy_only=False)
        uniq = np.unique(rid)
        sums = np.array(
            [tok[rid == r].sum() for r in uniq.tolist()], dtype=np.int64
        )
        return pa.table(
            {"range_id": pa.array(uniq, pa.int64()),
             "tok_sum": pa.array(sums, pa.int64())}
        )

    parts = collect_table(
        ranged.map_batches(partial_sums, batch_format="pyarrow", zero_copy_batch=True)
    )
    per_range = np.zeros(len(bounds) + 1, dtype=np.int64)
    for r, s in zip(parts.column("range_id").to_pylist(),
                    parts.column("tok_sum").to_pylist()):
        per_range[r] += s
    offsets = np.cumsum(per_range) - per_range  # tokens before each range

    # step 4: range-local ordered cumsum + global offset
    def pack_group(group: pa.Table) -> pa.Table:
        order = pc.sort_indices(group, sort_keys=[("doc_id", "ascending")])
        g = group.take(order)
        tok = g.column("n_tokens").to_numpy(zero_copy_only=False)
        rid = int(g.column("range_id")[0].as_py())
        before = int(offsets[rid]) + (np.cumsum(tok) - tok)
        return pa.table(
            {"doc_id": g.column("doc_id"),
             "n_tokens": g.column("n_tokens"),
             "bin_id": pa.array(before // capacity, pa.int64())}
        )

    return ranged.groupby("range_id").map_groups(
        pack_group, batch_format="pyarrow"
    )


def corpus_mixture(sf_dir: str, budget: int = 200):
    """Deterministic training-mixture sampling (the Pile/Dolma mixing
    step): each source gets a TARGET share of the ``budget`` from a
    per-source weight, converted into a hash-sampling rate capped at
    the source's availability.  Same seeded multiplicative hash as
    :func:`sample_documents`, so the sample is identical on every run,
    partitioning, and cluster size.

    Scale shape: per-source counts via the bounded combiner (sources ≪
    rows), rates broadcast, ONE streaming filter pass — no shuffle.
    Weights here derive from the source id (``(id % 4) + 1``, mirrored
    exactly in the SQL oracle); a production pipeline passes its
    mixture table instead."""

    from crawl_ray.pipelines.relational import partial_then_final_sum

    counts = partial_then_final_sum(
        _docs(sf_dir, ["source"]), ["source"], {}, count_name="n"
    )
    srcs = np.array(counts.column("source").to_pylist(), dtype=object)
    ns = counts.column("n").to_numpy(zero_copy_only=False).astype(np.int64)
    w = np.array(
        [(int(str(s_)[3:]) % 4) + 1 for s_ in srcs], dtype=np.int64
    )
    tw = int(w.sum())
    target = budget * w // tw
    rate_ppm = np.minimum(1_000_000, target * 1_000_000 // ns)
    thr = rate_ppm * SAMPLE_MODULUS // 1_000_000
    order = np.argsort(srcs)
    thr_ref = ray.put((srcs[order], thr[order].astype(np.uint64)))

    def samp(batch: pa.Table) -> pa.Table:
        keys, thresholds = ray.get(thr_ref)
        src_b = batch.column("source").to_numpy(zero_copy_only=False)
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False).astype(
            np.uint64
        )
        pos = np.searchsorted(keys, src_b)
        with np.errstate(over="ignore"):
            h = (ids * np.uint64(SAMPLE_MULT)) % np.uint64(SAMPLE_MODULUS)
        keep = h < thresholds[pos]
        out = batch.filter(pa.array(keep))
        return pa.table(
            {"doc_id": out.column("doc_id").cast(pa.int64()),
             "source": out.column("source")}
        )

    return _docs(sf_dir, ["doc_id", "source"]).map_batches(
        samp, batch_format="pyarrow", zero_copy_batch=True
    )  # unsorted: the sample is tiny and order-free


def chunk_documents(sf_dir: str, window: int = 64, stride: int = 48):
    """Sliding-window document chunking — the long-document half of
    training prep (complement of :func:`pack_sequences`, which bins
    SHORT docs): each document splits into ``window``-token chunks
    every ``stride`` tokens (overlap = window − stride), so no token
    is more than one chunk away from full left context.

    Pure per-batch map, zero shuffle: chunk boundaries come from the
    shared vectorized tokenizer (one pass); only the final chunk-string
    assembly is per-chunk Python (string work, like fingerprints).
    Chunk grid: starts 0, stride, 2·stride … while start < n_tokens —
    identical to the oracle's ``range(0, n, stride)``."""

    def chunks(batch: pa.Table) -> pa.Table:
        doc_ids, flat, lens = _token_lists(batch)
        if not len(doc_ids):
            return pa.table(
                {"doc_id": pa.array([], pa.int64()),
                 "chunk_idx": pa.array([], pa.int64()),
                 "n_chunk_tokens": pa.array([], pa.int64()),
                 "chunk": pa.array([], pa.string())}
            )
        n_chunks = np.maximum((lens + stride - 1) // stride, 1)
        doc_of = np.repeat(np.arange(len(doc_ids), dtype=np.int64), n_chunks)
        idx_of = np.arange(n_chunks.sum(), dtype=np.int64) - np.repeat(
            np.cumsum(n_chunks) - n_chunks, n_chunks
        )
        starts = idx_of * stride
        doc_base = np.repeat(np.cumsum(lens) - lens, n_chunks)
        clens = np.minimum(window, np.repeat(lens, n_chunks) - starts)
        texts = [
            " ".join(flat[b + st : b + st + cl])
            for b, st, cl in zip(doc_base.tolist(), starts.tolist(),
                                 clens.tolist())
        ]
        return pa.table(
            {"doc_id": pa.array(doc_ids[doc_of], pa.int64()),
             "chunk_idx": pa.array(idx_of, pa.int64()),
             "n_chunk_tokens": pa.array(clens.astype(np.int64), pa.int64()),
             "chunk": pa.array(texts, pa.string())}
        )

    return _docs(sf_dir, ["doc_id", "text"]).map_batches(
        chunks, batch_format="pyarrow", zero_copy_batch=True
    )


def repetition_stats(sf_dir: str):
    """Gopher-style repetition quality signals per document: distinct-
    token fraction, most-frequent-word fraction, and top-bigram
    fraction (Rae et al. 2021 §A1.1 repetition filters, adapted to the
    newline-free synthetic corpus).  Fully vectorized: tokens are
    FNV-hashed (64-bit — collisions negligible at any corpus size) and
    per-(doc, key) counts come from one ``lexsort`` + run-length pass
    per batch; no shuffle, no Python per row.  Integer milli outputs
    keep the DuckDB oracle hash-stable."""
    from crawl_ray.urlnorm import fnv1a64_batch

    def _doc_group_max(didx: np.ndarray, keys: np.ndarray, n_docs: int):
        """Per-doc (distinct-key count, max key multiplicity) via
        sort + run-length — one pass, no hash maps."""
        if not len(didx):
            z = np.zeros(n_docs, dtype=np.int64)
            return z, z.copy()
        order = np.lexsort((keys, didx))
        ds_, ks_ = didx[order], keys[order]
        new = np.ones(len(order), dtype=bool)
        new[1:] = (ds_[1:] != ds_[:-1]) | (ks_[1:] != ks_[:-1])
        starts = np.flatnonzero(new)
        counts = np.diff(np.append(starts, len(order)))
        gdoc = ds_[starts]
        n_distinct = np.bincount(gdoc, minlength=n_docs).astype(np.int64)
        doc_starts = np.flatnonzero(np.r_[True, gdoc[1:] != gdoc[:-1]])
        mx = np.zeros(n_docs, dtype=np.int64)
        mx[gdoc[doc_starts]] = np.maximum.reduceat(counts, doc_starts)
        return n_distinct, mx

    def stats(batch: pa.Table) -> pa.Table:
        doc_ids, flat, lens = _token_lists(batch)
        n = len(doc_ids)
        if n == 0:
            return pa.table(
                {"doc_id": pa.array([], pa.int64()),
                 "n_tokens": pa.array([], pa.int64()),
                 "distinct_frac_milli": pa.array([], pa.int64()),
                 "max_word_frac_milli": pa.array([], pa.int64()),
                 "top_bigram_frac_milli": pa.array([], pa.int64())}
            )
        didx = np.repeat(np.arange(n, dtype=np.int64), lens)
        h = fnv1a64_batch(flat)
        n_distinct, mx_word = _doc_group_max(didx, h, n)

        # within-doc adjacent bigrams (same index construction as
        # ngram_counts): key = fnv(tok_i) * FNV_PRIME ^ fnv(tok_i+1)
        n_bg = np.maximum(lens - 1, 0)
        tok_starts = np.cumsum(lens) - lens
        i1 = np.repeat(tok_starts, n_bg) + (
            np.arange(n_bg.sum(), dtype=np.int64)
            - np.repeat(np.cumsum(n_bg) - n_bg, n_bg)
        )
        with np.errstate(over="ignore"):
            bkeys = h[i1] * np.uint64(1099511628211) ^ h[i1 + 1]
        bdoc = np.repeat(np.arange(n, dtype=np.int64), n_bg)
        _, mx_bigram = _doc_group_max(bdoc, bkeys, n)

        return pa.table(
            {
                "doc_id": batch.column("doc_id").cast(pa.int64()),
                "n_tokens": pa.array(lens, pa.int64()),
                "distinct_frac_milli": pa.array(1000 * n_distinct // lens, pa.int64()),
                "max_word_frac_milli": pa.array(1000 * mx_word // lens, pa.int64()),
                "top_bigram_frac_milli": pa.array(
                    1000 * mx_bigram // np.maximum(lens - 1, 1), pa.int64()
                ),
            }
        )

    return _docs(sf_dir, ["doc_id", "text"]).map_batches(
        stats, batch_format="pyarrow", zero_copy_batch=True
    )


def unigram_logprob(sf_dir: str, top_v: int = 65536, passthrough: tuple = ()):
    """CCNet-style unigram-LM quality scoring: build the corpus unigram
    model distributed (per-batch partial counts → ``groupby(token).sum``
    → per-block local top-``top_v`` → bounded driver merge), broadcast
    the quantized neg-log-prob table once (``ray.put``), then score
    every document in one vectorized pass (searchsorted against the
    sorted vocab, ``bincount`` per-doc sums).

    Quantize-then-sum: each token's NLL is floored to integer
    micro-nats BEFORE summing, so partial-sum order can never move the
    result and the DuckDB oracle (same ``floor(-1e6*ln(c/T))``) hashes
    identically.  Tokens outside the top-``top_v`` vocab score as
    count 0.5 (OOV floor) — the documented 100-TB path where the full
    vocab cannot be broadcast."""
    import math

    from ray.data.aggregate import Sum


    def partial(batch: pa.Table) -> pa.Table:
        _, flat, _ = _token_lists(batch)
        uniq, counts = np.unique(flat, return_counts=True)
        return pa.table(
            {"token": pa.array(uniq, pa.string()),
             "cnt": pa.array(counts.astype(np.int64), pa.int64())}
        )

    # partials are vocab-sized per block; materialize once, reuse for
    # the exact total AND the vocab groupby (no second corpus read)
    partials = _docs(sf_dir, ["doc_id", "text"]).map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()
    total = int(partials.sum("cnt") or 0)  # Dataset.sum -> None on 0 rows
    if total == 0:
        total = 1  # empty corpus: zero docs to score; any finite LM
        # placeholder works and avoids log(0/0) building oov_nll

    toks, cnts = _topv_by_count(
        partials.groupby("token").aggregate(Sum("cnt")),
        "token", "sum(cnt)", top_v,
    )
    # floor-quantized NLL per vocab entry (micro-nats); math.log is the
    # same libm the oracle's ln() hits, and floor kills rounding-mode
    # divergence (Python round() is banker's, DuckDB's is half-away)
    nll = np.array(
        [math.floor(-1e6 * math.log(c / total)) for c in cnts.tolist()],
        dtype=np.int64,
    )
    oov_nll = math.floor(-1e6 * math.log(0.5 / total))
    sidx = np.argsort(toks)
    lm_ref = ray.put(
        {"toks": toks[sidx], "nll": nll[sidx], "oov": np.int64(oov_nll)}
    )

    def score(batch: pa.Table) -> pa.Table:
        lm = ray.get(lm_ref)
        doc_ids, flat, lens = _token_lists(batch)
        n = len(doc_ids)
        if n == 0:
            cols = {"doc_id": pa.array([], pa.int64())}
            for c in passthrough:
                cols[c] = batch.column(c) if c in batch.column_names else pa.array(
                    [], pa.string()
                )
            cols.update(
                {"n_tokens": pa.array([], pa.int64()),
                 "nll_micro": pa.array([], pa.int64()),
                 "avg_nll_milli": pa.array([], pa.int64())}
            )
            return pa.table(cols)
        pos = np.searchsorted(lm["toks"], flat)
        pos = np.clip(pos, 0, len(lm["toks"]) - 1)
        hit = lm["toks"][pos] == flat
        tok_nll = np.where(hit, lm["nll"][pos], lm["oov"])
        didx = np.repeat(np.arange(n, dtype=np.int64), lens)
        # NLL ≤ ~2e7 micro-nats/token ⇒ doc sums ≪ 2^53: float64-exact
        sums = np.bincount(didx, weights=tok_nll.astype(np.float64),
                           minlength=n).astype(np.int64)
        cols = {"doc_id": batch.column("doc_id").cast(pa.int64())}
        for c in passthrough:
            cols[c] = batch.column(c)
        cols.update(
            {
                "n_tokens": pa.array(lens, pa.int64()),
                "nll_micro": pa.array(sums, pa.int64()),
                "avg_nll_milli": pa.array(sums // (lens * 1000), pa.int64()),
            }
        )
        return pa.table(cols)

    return _docs(sf_dir, ["doc_id", "text", *passthrough]).map_batches(
        score, batch_format="pyarrow", zero_copy_batch=True
    )


def ccnet_buckets(sf_dir: str, top_v: int = 65536):
    """CCNet-style per-language perplexity bucketing (Wenzek et al.
    2020): score every document with the corpus unigram LM
    (:func:`unigram_logprob`, exact floor-quantized micro-nats), then
    split each language into **head / middle / tail** terciles by
    ``avg_nll_milli`` value thresholds.

    Scale plan: the doc-level scored dataset is materialized ONCE
    (30-byte rows — doc-count-sized, never corpus-sized) and reused for
    both passes; the tercile thresholds come from a bounded
    ``(lang × avg_nll_milli)`` histogram (the
    ``value_quantiles_per_type`` pattern — avg NLL/token in milli-nats
    is a small integer domain regardless of corpus size), broadcast as
    a plain dict; bucket assignment is one vectorized ``searchsorted``
    pass.  No row-level shuffle at any point.

    Threshold convention: q_k = the value at 1-indexed sorted position
    ``ceil(k·n/3)`` per language (ties collapse to one value, so the
    thresholds are order-independent); bucket = head if
    ``avg ≤ q1`` else middle if ``avg ≤ q2`` else tail — a pure VALUE
    rule, as in CCNet, so equal-score docs always share a bucket."""
    scored = unigram_logprob(sf_dir, top_v=top_v, passthrough=("lang",)).materialize()

    def hist(batch: pa.Table) -> pa.Table:
        t = pa.table(
            {
                "lang": batch.column("lang"),
                "avg": batch.column("avg_nll_milli"),
                "n": pa.array(np.ones(batch.num_rows, dtype=np.int64)),
            }
        )
        out = t.group_by(["lang", "avg"]).aggregate([("n", "sum")])
        return rename_select(out, {"lang": "lang", "avg": "avg", "n_sum": "n"})

    partials = collect_table(
        scored.map_batches(hist, batch_format="pyarrow", zero_copy_batch=True)
    )
    combined = partials.group_by(["lang", "avg"]).aggregate([("n", "sum")])
    langs = np.array(combined.column("lang").to_pylist(), dtype=object)
    avgs = combined.column("avg").to_numpy()
    counts = combined.column("n_sum").to_numpy()
    thr: dict[str, tuple[int, int]] = {}
    for lg in sorted(set(langs)):
        mask = langs == lg
        v, c = avgs[mask], counts[mask]
        order = np.argsort(v)
        v, c = v[order], c[order]
        cum = np.cumsum(c)
        n = int(cum[-1])
        q = []
        for k in (1, 2):
            rank = (k * n + 2) // 3  # 1-indexed ceil(k·n/3)
            q.append(int(v[int(np.searchsorted(cum, rank))]))
        thr[str(lg)] = (q[0], q[1])
    thr_ref = ray.put(thr)

    def bucket(batch: pa.Table) -> pa.Table:
        t = ray.get(thr_ref)
        lg = batch.column("lang").to_numpy(zero_copy_only=False)
        avg = batch.column("avg_nll_milli").to_numpy(zero_copy_only=False)
        # vectorized lang → threshold lookup (the only Python loop is
        # over the handful of languages, once per batch)
        lang_keys = np.array(sorted(t), dtype=object)
        q1s = np.array([t[x][0] for x in lang_keys.tolist()], dtype=np.int64)
        q2s = np.array([t[x][1] for x in lang_keys.tolist()], dtype=np.int64)
        idx = np.searchsorted(lang_keys, lg)
        q1, q2 = q1s[idx], q2s[idx]
        label = np.where(avg <= q1, "head", np.where(avg <= q2, "middle", "tail"))
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "lang": batch.column("lang"),
                "avg_nll_milli": batch.column("avg_nll_milli"),
                "bucket": pa.array(label.astype(object), pa.string()),
            }
        )

    return scored.map_batches(bucket, batch_format="pyarrow", zero_copy_batch=True)


def _pair_index(lens: np.ndarray):
    """Vectorized adjacent-pair layout over a batch's flat token array:
    returns (idx of each pair's FIRST token, doc-row index per pair,
    per-doc pair counts).  Pair j of doc d = tokens[d][j], tokens[d][j+1]
    — identical to the oracle's ``t[i] || ' ' || t[i+1]``."""
    n_p = np.maximum(lens - 1, 0)
    starts = np.repeat(np.cumsum(lens) - lens, n_p)
    offs = np.arange(int(n_p.sum()), dtype=np.int64) - np.repeat(
        np.cumsum(n_p) - n_p, n_p
    )
    return starts + offs, np.repeat(
        np.arange(len(lens), dtype=np.int64), n_p
    ), n_p


def bigram_logprob(sf_dir: str, top_v: int = 65536):
    """Conditional **bigram**-LM scoring — the CCNet-perplexity
    companion one order up from :func:`unigram_logprob`:
    ``P(w2 | w1) = c(w1 w2) / c1(w1)`` with ``c1`` the exact count of
    bigram occurrences starting with ``w1``.  Only the top-``top_v``
    bigrams AND top-``top_v`` prefixes (count desc, key asc) are
    broadcast — the 100 TB-bounded model; everything else floors:

    - prefix in the table: ``nll = floor(-1e6·ln(ĉ2 / c1))`` with
      ``ĉ2`` the exact bigram count if broadcast else the 0.5 OOV
      floor;
    - prefix absent: ``nll = floor(-1e6·ln(0.5 / TB))``, ``TB`` =
      total corpus bigram occurrences.

    Floor-quantized integer micro-nats BEFORE summing, so partial-sum
    order can never move the result and the DuckDB oracle (same rule,
    same libm ``ln``) hashes identically.  One row per document — docs
    with < 2 tokens score 0.

    Scale shape: one corpus read → vocab-sized per-batch partials
    (materialized once, reused for the bigram groupby, the
    prefix-marginal groupby AND the exact total); both model tables are
    bounded by ``top_v`` on the driver and broadcast once
    (``ray.put``); scoring is one vectorized searchsorted pass."""
    import math

    from ray.data.aggregate import Sum


    empty_counts = pa.table(
        {"big": pa.array([], pa.string()), "cnt": pa.array([], pa.int64())}
    )

    def partial(batch: pa.Table) -> pa.Table:
        _, flat, lens = _token_lists(batch)
        idx, _, _ = _pair_index(lens)
        if not len(idx):
            return empty_counts
        big = pc.binary_join_element_wise(
            pa.array(flat[idx], pa.string()),
            pa.array(flat[idx + 1], pa.string()),
            " ",
        )
        t = pa.table(
            {"big": big,
             "cnt": pa.array(np.ones(len(idx), dtype=np.int64), pa.int64())}
        )
        out = t.group_by("big").aggregate([("cnt", "sum")])
        return rename_select(out, {"big": "big", "cnt_sum": "cnt"})

    partials = _docs(sf_dir, ["doc_id", "text"]).map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()
    total = int(partials.sum("cnt") or 0)

    def prefix_partial(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table(
                {"big": pa.array([], pa.string()),
                 "cnt": pa.array([], pa.int64())}
            )
        w1 = pc.list_element(
            pc.split_pattern(batch.column("big"), " ", max_splits=1), 0
        )
        t = pa.table({"big": w1, "cnt": batch.column("sum(cnt)")})
        out = t.group_by("big").aggregate([("cnt", "sum")])
        return rename_select(out, {"big": "big", "cnt_sum": "cnt"})

    if total:
        bigram_ds = partials.groupby("big").aggregate(Sum("cnt")).materialize()
        b_keys, b_cnts = _topv_by_count(bigram_ds, "big", "sum(cnt)", top_v)
        p_toks, p_cnts = _topv_by_count(
            bigram_ds.map_batches(prefix_partial, batch_format="pyarrow",
                                  zero_copy_batch=True)
            .groupby("big").aggregate(Sum("cnt")),
            "big", "sum(cnt)", top_v,
        )
        oov_full = math.floor(-1e6 * math.log(0.5 / total))
    else:
        b_keys = np.array([], dtype=object)
        b_cnts = np.array([], dtype=np.int64)
        p_toks = np.array([], dtype=object)
        p_cnts = np.array([], dtype=np.int64)
        oov_full = 0
    # sort both tables by key for searchsorted; per-entry NLLs are
    # floor-quantized HERE (driver, top_v-bounded) with math.log — the
    # same libm the oracle's ln() hits
    ps = np.argsort(p_toks)
    p_toks, p_cnts = p_toks[ps], p_cnts[ps]
    p_miss = np.array(
        [math.floor(-1e6 * math.log(0.5 / c)) for c in p_cnts.tolist()],
        dtype=np.int64,
    )
    bs = np.argsort(b_keys)
    b_keys, b_cnts = b_keys[bs], b_cnts[bs]
    b_pref = np.array(
        [k.split(" ", 1)[0] for k in b_keys.tolist()], dtype=object
    )
    bp = np.searchsorted(p_toks, b_pref) if len(p_toks) else np.zeros(
        len(b_pref), dtype=np.int64
    )
    bp = np.clip(bp, 0, max(len(p_toks) - 1, 0))
    hit_p = p_toks[bp] == b_pref if len(p_toks) else np.zeros(
        len(b_pref), dtype=bool
    )
    # entries whose prefix fell outside the prefix table are unreachable
    # (the prefix-absent rule fires first) — placeholder denominator 1
    denom = np.where(hit_p, p_cnts[bp] if len(p_cnts) else 1, 1)
    b_nll = np.array(
        [
            math.floor(-1e6 * math.log(c / d)) if h else 0
            for c, d, h in zip(
                b_cnts.tolist(), denom.tolist(), hit_p.tolist()
            )
        ],
        dtype=np.int64,
    )
    lm_ref = ray.put(
        {"b_keys": b_keys, "b_nll": b_nll, "p_toks": p_toks,
         "p_miss": p_miss, "oov": np.int64(oov_full)}
    )

    def score(batch: pa.Table) -> pa.Table:
        lm = ray.get(lm_ref)
        doc_ids, flat, lens = _token_lists(batch)
        n = len(doc_ids)
        if n == 0:
            return pa.table(
                {"doc_id": pa.array([], pa.int64()),
                 "n_bigrams": pa.array([], pa.int64()),
                 "nll2_micro": pa.array([], pa.int64()),
                 "avg_nll2_milli": pa.array([], pa.int64())}
            )
        idx, didx, n_p = _pair_index(lens)
        sums = np.zeros(n, dtype=np.int64)
        if len(idx):
            w1 = flat[idx]
            key = pc.binary_join_element_wise(
                pa.array(w1, pa.string()),
                pa.array(flat[idx + 1], pa.string()),
                " ",
            ).to_numpy(zero_copy_only=False)
            if len(lm["p_toks"]):
                pp = np.clip(
                    np.searchsorted(lm["p_toks"], w1),
                    0, len(lm["p_toks"]) - 1,
                )
                hit1 = lm["p_toks"][pp] == w1
                miss_nll = lm["p_miss"][pp]
            else:
                pp = np.zeros(len(idx), dtype=np.int64)
                hit1 = np.zeros(len(idx), dtype=bool)
                miss_nll = np.zeros(len(idx), dtype=np.int64)
            if len(lm["b_keys"]):
                bb = np.clip(
                    np.searchsorted(lm["b_keys"], key),
                    0, len(lm["b_keys"]) - 1,
                )
                hit2 = lm["b_keys"][bb] == key
                hit_nll = lm["b_nll"][bb]
            else:
                hit2 = np.zeros(len(idx), dtype=bool)
                hit_nll = np.zeros(len(idx), dtype=np.int64)
            nll = np.where(
                ~hit1, lm["oov"], np.where(hit2, hit_nll, miss_nll)
            )
            # NLL ≤ ~2e7 micro-nats/pair ⇒ doc sums ≪ 2^53: float64-exact
            sums = np.bincount(
                didx, weights=nll.astype(np.float64), minlength=n
            ).astype(np.int64)
        return pa.table(
            {"doc_id": batch.column("doc_id").cast(pa.int64()),
             "n_bigrams": pa.array(n_p, pa.int64()),
             "nll2_micro": pa.array(sums, pa.int64()),
             "avg_nll2_milli": pa.array(
                 np.where(n_p > 0, sums // (np.maximum(n_p, 1) * 1000), 0),
                 pa.int64(),
             )}
        )

    return _docs(sf_dir, ["doc_id", "text"]).map_batches(
        score, batch_format="pyarrow", zero_copy_batch=True
    )


def ngram_diversity(sf_dir: str, n: int = 2):
    """Per-source word-``n``-gram diversity (the corpus-level
    "distinct-n" generation/diversity metric): total n-gram
    occurrences, globally-distinct n-grams, and distinct-per-million.

    Scale shape: per-batch ``(source, gram)`` partial counts (Arrow
    group_by inside the map — batch-bounded) → ONE distributed groupby
    on the combined ``source\\x1fgram`` key (each distinct gram
    surfaces exactly once globally) → per-block source partials →
    bounded driver fold over the handful of sources.  The combined key
    uses ``\\x1f`` (non-whitespace control char, so it never appears in
    a whitespace-split token of any sane corpus — documented
    assumption)."""
    from ray.data.aggregate import Sum


    def partial(batch: pa.Table) -> pa.Table:
        empty = pa.table(
            {"key": pa.array([], pa.string()),
             "cnt": pa.array([], pa.int64())}
        )
        if batch.num_rows == 0:
            return empty
        _, flat, lens = _token_lists(batch)
        grams, doc_idx = _gram_arrays(flat, lens, n)
        if not len(doc_idx):
            return empty
        src = batch.column("source").take(pa.array(doc_idx, pa.int64()))
        key = pc.binary_join_element_wise(src, grams, "\x1f")
        t = pa.table(
            {"key": key,
             "cnt": pa.array(np.ones(len(doc_idx), dtype=np.int64))}
        )
        out = t.group_by("key").aggregate([("cnt", "sum")])
        return rename_select(out, {"key": "key", "cnt_sum": "cnt"})

    per_gram = (
        _docs(sf_dir, ["doc_id", "text", "source"])
        .map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("key")
        .aggregate(Sum("cnt"))
    )

    def src_partial(batch: pa.Table) -> pa.Table:
        empty = pa.table(
            {"source": pa.array([], pa.string()),
             "total": pa.array([], pa.int64()),
             "distinct": pa.array([], pa.int64())}
        )
        if batch.num_rows == 0 or "key" not in batch.column_names:
            return empty
        src = pc.list_element(
            pc.split_pattern(batch.column("key"), "\x1f", max_splits=1), 0
        )
        t = pa.table(
            {"source": src,
             "total": batch.column("sum(cnt)"),
             "distinct": pa.array(
                 np.ones(batch.num_rows, dtype=np.int64)
             )}
        )
        out = t.group_by("source").aggregate(
            [("total", "sum"), ("distinct", "sum")]
        )
        return rename_select(
            out,
            {"source": "source", "total_sum": "total",
             "distinct_sum": "distinct"},
        )

    parts = collect_table(
        per_gram.map_batches(src_partial, batch_format="pyarrow",
                             zero_copy_batch=True)
    )
    combined = parts.group_by("source").aggregate(
        [("total", "sum"), ("distinct", "sum")]
    )
    combined = rename_select(
        combined,
        {"source": "source", "total_sum": "total_ngrams",
         "distinct_sum": "distinct_ngrams"},
    )
    tot = combined.column("total_ngrams").to_numpy().astype(np.int64)
    dis = combined.column("distinct_ngrams").to_numpy().astype(np.int64)
    combined = combined.append_column(
        "distinct_ppm",
        pa.array(dis * 1_000_000 // np.maximum(tot, 1), pa.int64()),
    )
    return combined.sort_by("source")


def lang_length_regression(sf_dir: str):
    """Per-language exact-integer OLS of ``n_chars`` on ``n_tokens`` —
    the distributed **moment-matrix** shape: every statistic the fit
    needs (n, Σx, Σy, Σxy, Σx²) is an associative per-batch partial sum
    combined by one bounded groupby, so the regression costs one corpus
    pass and zero row shuffles at any scale.

    Exactness contract: slope/intercept are reported in micro-units via
    truncating integer division (sign-aware ``_tdiv`` ≡ DuckDB ``//``,
    which truncates toward zero — Python's ``//`` floors and would
    diverge on negative intercepts).  The final arithmetic runs in
    Python bigints, so the n·Σxy products can never overflow on the
    driver; the int64 PARTIAL sums are exact up to ~10^9 docs/lang at
    these magnitudes — past that the partials move to per-partition
    hugeint/float128 (documented scale path)."""
    from crawl_ray.pipelines.relational import partial_then_final_sum

    def per_doc(batch: pa.Table) -> pa.Table:
        toks = pc.split_pattern_regex(
            pc.utf8_trim_whitespace(batch.column("text")), r"\s+"
        )
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        lens = pc.list_value_length(toks).to_numpy(
            zero_copy_only=False
        ).astype(np.int64)
        chars = pc.utf8_length(batch.column("text")).to_numpy(
            zero_copy_only=False
        ).astype(np.int64)
        return pa.table(
            {
                "lang": batch.column("lang"),
                "x": pa.array(lens, pa.int64()),
                "y": pa.array(chars, pa.int64()),
                "xy": pa.array(lens * chars, pa.int64()),
                "xx": pa.array(lens * lens, pa.int64()),
            }
        )

    ds = _docs(sf_dir, ["text", "lang"]).map_batches(
        per_doc, batch_format="pyarrow", zero_copy_batch=True
    )
    agg = partial_then_final_sum(
        ds,
        ["lang"],
        {
            "sx": lambda b: b.column("x"),
            "sy": lambda b: b.column("y"),
            "sxy": lambda b: b.column("xy"),
            "sxx": lambda b: b.column("xx"),
        },
        count_name="n_docs",
    )

    langs = agg.column("lang").to_pylist()
    order = np.argsort(np.array(langs, dtype=object))
    out_lang, out_n, out_slope, out_icpt = [], [], [], []
    for i in order.tolist():
        n = int(agg.column("n_docs")[i].as_py())
        sx = int(agg.column("sx")[i].as_py())
        sy = int(agg.column("sy")[i].as_py())
        sxy = int(agg.column("sxy")[i].as_py())
        sxx = int(agg.column("sxx")[i].as_py())
        den = n * sxx - sx * sx
        slope = _tdiv((n * sxy - sx * sy) * 1_000_000, den) if den else 0
        icpt = _tdiv(sy * 1_000_000 - slope * sx, n)
        out_lang.append(langs[i])
        out_n.append(n)
        out_slope.append(slope)
        out_icpt.append(icpt)
    return pa.table(
        {
            "lang": pa.array(out_lang, pa.string()),
            "n_docs": pa.array(out_n, pa.int64()),
            "slope_micro": pa.array(out_slope, pa.int64()),
            "intercept_micro": pa.array(out_icpt, pa.int64()),
        }
    )


def zipf_fit(sf_dir: str, top_v: int = 1000):
    """Zipf's-law corpus diagnostic: log-log OLS of token frequency on
    rank over the top-``top_v`` vocabulary (slope ≈ −1 for natural
    text; strong deviation flags synthetic/degenerate corpora — a
    standard corpus-QA statistic).

    Distribution: the vocab count is the :func:`ngram_counts` shape
    (per-batch partial counts → one token-keyed groupby → local top-V →
    bounded driver merge); the FIT runs on the driver over ≤ ``top_v``
    rows in exact integer micro-nats (x = ⌊10⁶·ln rank⌋,
    y = ⌊10⁶·ln count⌋, Python-bigint moments, truncating division ≡
    DuckDB ``//``)."""
    import math

    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        _, flat, _ = _token_lists(batch)
        uniq, counts = np.unique(flat, return_counts=True)
        return pa.table(
            {"token": pa.array(uniq, pa.string()),
             "cnt": pa.array(counts.astype(np.int64), pa.int64())}
        )

    _, cnts = _topv_by_count(
        _docs(sf_dir, ["doc_id", "text"])
        .map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("token")
        .aggregate(Sum("cnt")),
        "token", "sum(cnt)", top_v,
    )

    n = len(cnts)
    sx = sy = sxy = sxx = 0
    for r, c in enumerate(cnts.tolist(), start=1):
        x = math.floor(1e6 * math.log(r))
        y = math.floor(1e6 * math.log(c))
        sx += x; sy += y; sxy += x * y; sxx += x * x
    den = n * sxx - sx * sx
    slope = _tdiv((n * sxy - sx * sy) * 1_000_000, den) if den else 0
    # x and y are already micro-nats, so slope_micro is 10^-6 ln-units
    # per ln-unit while the intercept lands in 10^-12 ln-count units
    # (micro x micro) -- named honestly below
    icpt = _tdiv(sy * 1_000_000 - slope * sx, n) if n else 0
    return pa.table(
        {
            "n_points": pa.array([n], pa.int64()),
            "slope_micro": pa.array([slope], pa.int64()),
            "intercept_pico": pa.array([icpt], pa.int64()),
        }
    )


def langid_confusion(sf_dir: str):
    """Language-ID QA: confusion matrix of the marker-word classifier
    against the corpus's true ``lang`` labels — the accuracy audit any
    production langid stage ships with.  One corpus pass emitting
    (lang, lang_pred) partial counts, combined by the bounded
    |langs|² combiner; zero row shuffle."""
    from crawl_ray.pipelines.relational import partial_then_final_sum

    order = list(LANG_MARKERS)

    def pred(batch: pa.Table) -> pa.Table:
        mat = _lang_score_matrix(batch.column("text"), batch.num_rows)
        best = np.argmax(mat, axis=1)  # first max wins = order tie-break
        langs = np.array(order, dtype=object)[best]
        return pa.table(
            {
                "lang": batch.column("lang"),
                "lang_pred": pa.array(langs.tolist(), pa.string()),
            }
        )

    ds = _docs(sf_dir, ["text", "lang"]).map_batches(
        pred, batch_format="pyarrow", zero_copy_batch=True
    )
    agg = partial_then_final_sum(
        ds, ["lang", "lang_pred"], {}, count_name="n_docs"
    )
    return agg.sort_by([("lang", "ascending"), ("lang_pred", "ascending")])


def quality_ks_test(sf_dir: str):
    """Distribution-drift QA: exact two-sample Kolmogorov–Smirnov
    distance between every pair of sources on the mean-token-length
    quality score — the detector a multi-source corpus pipeline runs to
    catch a source whose text statistics shifted between dumps.

    Exact and shuffle-free: one pass builds the bounded
    (source × score_milli) histogram (same family as the quantile ops);
    the driver computes, per source pair, the sup-norm of the CDF
    difference in INTEGER cross-multiplied form —
    ``max |cumA·nB − cumB·nA|`` over the union of score values, reported
    as ``ks_milli = 1000·max // (nA·nB)`` — no float CDFs, byte-equal to
    the DuckDB oracle."""

    def hist(batch: pa.Table) -> pa.Table:
        # the drift detector MUST score the same statistic the quality
        # gate filters on — one shared kernel, not a re-derivation
        score = _mean_tok_len_milli(batch.column("text"))
        t = pa.table(
            {
                "source": batch.column("source"),
                "score": score,
                "n": pa.array(np.ones(batch.num_rows, dtype=np.int64)),
            }
        )
        out = t.group_by(["source", "score"]).aggregate([("n", "sum")])
        return rename_select(
            out, {"source": "source", "score": "score", "n_sum": "n"}
        )

    partials = collect_table(
        _docs(sf_dir, ["text", "source"]).map_batches(
            hist, batch_format="pyarrow", zero_copy_batch=True
        )
    )
    combined = partials.group_by(["source", "score"]).aggregate([("n", "sum")])
    srcs = np.array(combined.column("source").to_pylist(), dtype=object)
    scores = combined.column("score").to_numpy()
    counts = combined.column("n_sum").to_numpy()

    by_src = {}
    for sname in sorted(set(srcs)):
        m = srcs == sname
        v, c = scores[m], counts[m]
        order = np.argsort(v)
        by_src[str(sname)] = (v[order], np.cumsum(c[order]))

    out_a, out_b, out_ks, out_na, out_nb = [], [], [], [], []
    names = sorted(by_src)
    for i, a in enumerate(names):
        va, ca = by_src[a]
        na = int(ca[-1])
        for b in names[i + 1:]:
            vb, cb = by_src[b]
            nb = int(cb[-1])
            union = np.union1d(va, vb)
            # cum counts at each union value (searchsorted right edge)
            cum_a = np.concatenate([[0], ca])[np.searchsorted(va, union, "right")]
            cum_b = np.concatenate([[0], cb])[np.searchsorted(vb, union, "right")]
            diff = np.abs(
                cum_a.astype(object) * nb - cum_b.astype(object) * na
            )
            ks = int(max(diff)) * 1000 // (na * nb)
            out_a.append(a); out_b.append(b)
            out_ks.append(ks); out_na.append(na); out_nb.append(nb)
    return pa.table(
        {
            "src_a": pa.array(out_a, pa.string()),
            "src_b": pa.array(out_b, pa.string()),
            "ks_milli": pa.array(out_ks, pa.int64()),
            "n_a": pa.array(out_na, pa.int64()),
            "n_b": pa.array(out_nb, pa.int64()),
        }
    )


LENGTH_BUCKET_EDGES = (16, 32, 64, 128, 256, 512, 1024)


def length_histogram(sf_dir: str):
    """Sequence-length distribution per language — the planning table
    for packing / context-budget decisions (how many docs fall in each
    power-of-two token band, and how many tokens they carry).  Bucket
    edges are explicit integers compared with ``searchsorted`` (no
    float log2 — an exact power of two can never misbucket), emitted as
    bounded (lang × bucket) partials; zero row shuffle."""
    from crawl_ray.pipelines.relational import partial_then_final_sum

    edges = np.array(LENGTH_BUCKET_EDGES, dtype=np.int64)

    def per_doc(batch: pa.Table) -> pa.Table:
        toks = pc.split_pattern_regex(
            pc.utf8_trim_whitespace(batch.column("text")), r"\s+"
        )
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        lens = pc.list_value_length(toks).to_numpy(
            zero_copy_only=False
        ).astype(np.int64)
        bucket = np.searchsorted(edges, lens, side="right").astype(np.int64)
        return pa.table(
            {
                "lang": batch.column("lang"),
                "bucket": pa.array(bucket, pa.int64()),
                "tok": pa.array(lens, pa.int64()),
            }
        )

    ds = _docs(sf_dir, ["text", "lang"]).map_batches(
        per_doc, batch_format="pyarrow", zero_copy_batch=True
    )
    agg = partial_then_final_sum(
        ds, ["lang", "bucket"], {"n_tokens": lambda b: b.column("tok")},
        count_name="n_docs",
    )
    # emit the human-readable band bounds alongside the bucket id
    # bucket b = count(edges <= v): band [edges[b-1], edges[b] - 1]
    lo = np.concatenate([[0], edges])
    hi = np.concatenate([edges - 1, [np.iinfo(np.int64).max]])
    b = agg.column("bucket").to_numpy(zero_copy_only=False).astype(np.int64)
    agg = agg.append_column("tokens_lo", pa.array(lo[b], pa.int64()))
    agg = agg.append_column("tokens_hi", pa.array(hi[b], pa.int64()))
    return agg.sort_by([("lang", "ascending"), ("bucket", "ascending")])


def source_token_budget(sf_dir: str):
    """Corpus accounting before mixture design: per-source doc count,
    token total, and exact milli-fraction of the corpus token budget —
    the table that feeds :func:`corpus_mixture` weights.  Bounded
    per-source partials, one corpus pass, zero row shuffle."""
    from crawl_ray.pipelines.relational import partial_then_final_sum

    def per_doc(batch: pa.Table) -> pa.Table:
        toks = pc.split_pattern_regex(
            pc.utf8_trim_whitespace(batch.column("text")), r"\s+"
        )
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        return pa.table(
            {
                "source": batch.column("source"),
                "tok": pc.list_value_length(toks).cast(pa.int64()),
            }
        )

    agg = partial_then_final_sum(
        _docs(sf_dir, ["text", "source"]).map_batches(
            per_doc, batch_format="pyarrow", zero_copy_batch=True
        ),
        ["source"],
        {"n_tokens": lambda b: b.column("tok")},
        count_name="n_docs",
    )
    total = int(pc.sum(agg.column("n_tokens")).as_py() or 0)
    toks = agg.column("n_tokens").to_numpy(zero_copy_only=False)
    frac = (
        (toks.astype(object) * 1000) // total
        if total
        else np.zeros(len(toks), dtype=np.int64)
    )
    agg = agg.append_column(
        "token_share_milli", pa.array([int(x) for x in frac], pa.int64())
    )
    return agg.sort_by("source")


# GPT-2-style pre-tokenizer, simplified to an RE2 subset that Arrow and
# DuckDB evaluate identically: a token is an optional leading space plus
# a letter run, a digit run, or a punctuation run
BPE_ISH_PATTERN = r" ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9 ]+"


def bpe_token_stats(sf_dir: str):
    """BPE-ish token counting (the second tokenizer a corpus pipeline
    needs besides whitespace: pre-tokenizer-granularity budgets for
    sequence packing / cost estimates).  Pure Arrow regex kernels —
    ``count_substring_regex`` per sub-class, zero Python per row; the
    pattern is RE2-compatible so the DuckDB oracle's
    ``regexp_extract_all`` counts the exact same matches."""

    def stats(batch: pa.Table) -> pa.Table:
        text = batch.column("text")
        return pa.table(
            {
                "doc_id": batch.column("doc_id").cast(pa.int64()),
                "n_bpe_tokens": pc.count_substring_regex(
                    text, BPE_ISH_PATTERN).cast(pa.int64()),
                "n_word_tokens": pc.count_substring_regex(
                    text, r" ?[A-Za-z]+").cast(pa.int64()),
                "n_num_tokens": pc.count_substring_regex(
                    text, r" ?[0-9]+").cast(pa.int64()),
            }
        )

    return _docs(sf_dir, ["doc_id", "text"]).map_batches(
        stats, batch_format="pyarrow", zero_copy_batch=True
    )


def tfidf_top_terms(sf_dir: str, k: int = 3, top_v: int = 65536):
    """Corpus-level TF-IDF: per-document top-``k`` terms ranked by an
    exact-integer tf·idf score.  Two passes, one broadcast, zero
    per-doc shuffle:

    1. **DF pass** — per batch, distinct (doc, term) pairs are counted
       vectorized (composite ``doc × vocab`` keys, one ``np.unique``),
       yielding vocab-sized partials; ``groupby(term).sum`` combines
       them distributed, a per-block local top-``top_v`` caps what the
       driver merges (the same bounded-vocab 100-TB path as
       :func:`unigram_logprob` — terms outside the cap fall back to
       df=1, i.e. max idf; at fixture scale the cap is never hit).
    2. **Score pass** — the sorted (term, df) arrays broadcast once via
       ``ray.put``; each batch computes tf locally, scores
       ``tfidf_q = tf · n_docs // df`` in int64 (exact integer
       arithmetic — no float idf, so the DuckDB oracle hashes
       identically), and ranks per doc with a segmented ``lexsort``
       (score desc, term asc), emitting rows with ``rnk ≤ k``.
    """
    from ray.data.aggregate import Sum


    def df_partial(batch: pa.Table) -> pa.Table:
        doc_ids, flat, lens = _token_lists(batch)
        if not len(flat):
            return pa.table(
                {"term": pa.array([], pa.string()),
                 "df": pa.array([], pa.int64()),
                 "n_docs": pa.array([], pa.int64())}
            )
        doc_idx = np.repeat(np.arange(len(doc_ids), dtype=np.int64), lens)
        vocab, inv = np.unique(flat, return_inverse=True)
        pair = np.unique(doc_idx * len(vocab) + inv)  # distinct (doc, term)
        term_id, df = np.unique(pair % len(vocab), return_counts=True)
        n_docs = np.zeros(len(term_id), dtype=np.int64)
        n_docs[0] = len(doc_ids)  # block doc count rides along in row 0
        return pa.table(
            {"term": pa.array(vocab[term_id], pa.string()),
             "df": pa.array(df.astype(np.int64), pa.int64()),
             "n_docs": pa.array(n_docs, pa.int64())}
        )

    partials = _docs(sf_dir, ["doc_id", "text"]).map_batches(
        df_partial, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()
    n_docs = int(partials.sum("n_docs") or 0)

    terms, dfs = _topv_by_count(
        partials.drop_columns(["n_docs"]).groupby("term").aggregate(Sum("df")),
        "term", "sum(df)", top_v,
    )
    sidx = np.argsort(terms)
    df_ref = ray.put({"terms": terms[sidx], "df": dfs[sidx]})

    def score(batch: pa.Table) -> pa.Table:
        dft = ray.get(df_ref)
        doc_ids, flat, lens = _token_lists(batch)
        if not len(flat):
            return pa.table(
                {"doc_id": pa.array([], pa.int64()),
                 "rnk": pa.array([], pa.int64()),
                 "term": pa.array([], pa.string()),
                 "tfidf_q": pa.array([], pa.int64())}
            )
        doc_idx = np.repeat(np.arange(len(doc_ids), dtype=np.int64), lens)
        vocab, inv = np.unique(flat, return_inverse=True)
        uk, tf = np.unique(doc_idx * len(vocab) + inv, return_counts=True)
        d = uk // len(vocab)
        term_id = uk % len(vocab)
        pos = np.clip(np.searchsorted(dft["terms"], vocab[term_id]),
                      0, max(len(dft["terms"]) - 1, 0))
        hit = dft["terms"][pos] == vocab[term_id] if len(dft["terms"]) else np.zeros(len(pos), bool)
        df = np.where(hit, dft["df"][pos], 1).astype(np.int64)  # OOV ⇒ max idf
        scr = (tf.astype(np.int64) * n_docs) // df
        o = np.lexsort((vocab[term_id], -scr, d))
        d, term_id, scr = d[o], term_id[o], scr[o]
        seg = np.flatnonzero(np.r_[True, d[1:] != d[:-1]])
        rnk = np.arange(len(d)) - np.repeat(seg, np.diff(np.r_[seg, len(d)])) + 1
        keep = rnk <= k
        return pa.table(
            {"doc_id": pa.array(doc_ids[d[keep]], pa.int64()),
             "rnk": pa.array(rnk[keep].astype(np.int64), pa.int64()),
             "term": pa.array(vocab[term_id[keep]], pa.string()),
             "tfidf_q": pa.array(scr[keep], pa.int64())}
        )

    return _docs(sf_dir, ["doc_id", "text"]).map_batches(
        score, batch_format="pyarrow", zero_copy_batch=True
    )


def training_corpus_prep(
    sf_dir: str,
    capacity: int = 512,
    mtl_lo: int = 4300,
    mtl_hi: int = 4700,
    min_tokens: int = 20,
    lang: str = "en",
):
    """The composed LLM training-data prep chain — quality filter →
    language filter → exact dedup (keep-first) → sequence packing —
    as ONE streaming pipeline: a fused single-pass filter batch map
    (no intermediate materialization of rejected rows), a
    content-hash ``groupby`` for the dedup (the only shuffle), then
    the distributed ordered prefix-sum packer over the survivors.

    The fused filter recomputes the ``quality_score`` /
    ``language_id`` kernels in one batch pass; thresholds are the
    corpus-calibrated middle band.  Content hashing uses the C-speed
    per-row digest (not vectorized FNV — document text is long)."""
    from ray.data.aggregate import Min

    from crawl_ray.urlnorm import content_hash64_batch

    order = list(LANG_MARKERS)

    def filt(batch: pa.Table) -> pa.Table:
        text = batch.column("text")
        n_chars = pc.utf8_length(text).cast(pa.int64())
        tokens = _ws_token_count(text)
        nt = tokens.to_numpy(zero_copy_only=False)
        # shared quality contract (zero tokens → 0, dropped by the
        # min_tokens gate) — previously an inline copy that div-by-zero'd
        mtl = _mean_tok_len_from_parts(
            n_chars, _space_count(text), tokens
        ).to_numpy(zero_copy_only=False)
        best = np.argmax(_lang_score_matrix(text, batch.num_rows), axis=1)
        keep = (
            (np.array(order, dtype=object)[best] == lang)
            & (mtl >= mtl_lo) & (mtl <= mtl_hi) & (nt >= min_tokens)
        )
        out = batch.filter(pa.array(keep))
        return pa.table(
            {
                "content_hash": pa.array(
                    content_hash64_batch(out.column("text")).astype(np.int64),
                    pa.int64(),
                ),
                "doc_id": out.column("doc_id").cast(pa.int64()),
                "n_tokens": pa.array(nt[keep], pa.int64()),
            }
        )

    def first_per_hash(batch: pa.Table) -> pa.Table:
        return pa.table(
            {"doc_id": batch.column("min(doc_id)").cast(pa.int64()),
             "n_tokens": batch.column("min(n_tokens)").cast(pa.int64())}
        )

    survivors = (
        _docs(sf_dir, ["doc_id", "text"])
        .map_batches(filt, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("content_hash")
        .aggregate(Min("doc_id"), Min("n_tokens"))
        .map_batches(first_per_hash, batch_format="pyarrow", zero_copy_batch=True)
        .materialize()
    )
    return _pack_from_counts(survivors, capacity, n_ranges=64, sample_ppm=50_000)


def duplicated_ngrams(sf_dir: str, k: int = 5, num_partitions: int = 32):
    """Per-document duplicated n-gram fraction — the cross-document
    substring-dedup signal of Lee et al. 2022 ("Deduplicating Training
    Data Makes Language Models Better") at word-``k``-gram granularity.

    A gram is *duplicated* when it occurs in ≥ 2 distinct documents;
    each document reports its total k-gram occurrences (``n_grams``),
    the occurrences whose gram appears elsewhere in the corpus
    (``dup_grams``), and ``dup_frac_milli`` — the filter/trim signal.
    Documents shorter than ``k`` tokens report ``(0, 0, 0)``.

    Scale shape (no broadcast, no driver materialization): per-batch
    ``(doc, gram-hash) → occurrences`` partials (vectorized; a document
    is one input row, so its grams never span batches and the partials
    are globally exact) → ONE int-keyed shuffle on ``hash(gram) % P``
    (distinct-doc count per gram ≡ row count, since (doc, gram) is
    globally unique) → per-partition dup marking + per-doc partial sums
    (output bounded by ``n_docs × P`` rows) → one second, much smaller
    shuffle on ``doc_id % P`` with a vectorized combine per partition —
    never per-document Python.  64-bit FNV gram hashes stand in for the
    gram strings in the shuffle (collision odds ≈ G²/2⁶⁴).
    """
    from crawl_ray.urlnorm import fnv1a64_batch

    P = num_partitions
    _empty = pa.table(
        {"doc_id": pa.array([], pa.int64()),
         "gram": pa.array([], pa.int64()),
         "occ": pa.array([], pa.int64()),
         "part": pa.array([], pa.int64())}
    )

    def partial(batch: pa.Table) -> pa.Table:
        doc_ids, flat, lens = _token_lists(batch)
        grams, doc_idx = _gram_arrays(flat, lens, k)
        doc_parts, gram_parts, occ_parts = [], [], []
        if len(grams):
            gh = fnv1a64_batch(grams.to_pylist()).view(np.int64)
            pair = np.stack([doc_idx, gh], axis=1)
            uniq, counts = np.unique(pair, axis=0, return_counts=True)
            doc_parts.append(doc_ids[uniq[:, 0]])
            gram_parts.append(uniq[:, 1])
            occ_parts.append(counts.astype(np.int64))
        # zero-gram docs (< k tokens) still need an output row so the
        # final table covers every doc_id: a per-doc-unique sentinel
        # gram (occurs in exactly one doc → never marked duplicated)
        # with occ = 0
        zero = np.flatnonzero(np.maximum(lens - k + 1, 0) == 0)
        if len(zero):
            zdocs = doc_ids[zero]
            sent = fnv1a64_batch(
                [f"__doc__:{d}" for d in zdocs.tolist()]
            ).view(np.int64)
            doc_parts.append(zdocs)
            gram_parts.append(sent)
            occ_parts.append(np.zeros(len(zero), np.int64))
        if not doc_parts:
            return _empty
        doc = np.concatenate(doc_parts)
        gram = np.concatenate(gram_parts)
        occ = np.concatenate(occ_parts)
        part = (gram.view(np.uint64) % np.uint64(P)).astype(np.int64)
        return pa.table(
            {"doc_id": pa.array(doc, pa.int64()),
             "gram": pa.array(gram, pa.int64()),
             "occ": pa.array(occ, pa.int64()),
             "part": pa.array(part, pa.int64())}
        )

    def mark_and_partial(group: pa.Table) -> pa.Table:
        gram = group.column("gram").to_numpy(zero_copy_only=False)
        doc = group.column("doc_id").to_numpy(zero_copy_only=False)
        occ = group.column("occ").to_numpy(zero_copy_only=False)
        _, inv, cnt = np.unique(gram, return_inverse=True, return_counts=True)
        dup_occ = np.where(cnt[inv] >= 2, occ, 0)
        udoc, dinv = np.unique(doc, return_inverse=True)
        n_part = np.bincount(dinv, weights=occ).astype(np.int64)
        d_part = np.bincount(dinv, weights=dup_occ).astype(np.int64)
        return pa.table(
            {"doc_id": pa.array(udoc, pa.int64()),
             "n_grams": pa.array(n_part, pa.int64()),
             "dup_grams": pa.array(d_part, pa.int64()),
             "part2": pa.array(udoc % P, pa.int64())}
        )

    def combine(group: pa.Table) -> pa.Table:
        doc = group.column("doc_id").to_numpy(zero_copy_only=False)
        n = group.column("n_grams").to_numpy(zero_copy_only=False)
        d = group.column("dup_grams").to_numpy(zero_copy_only=False)
        udoc, dinv = np.unique(doc, return_inverse=True)
        n_tot = np.bincount(dinv, weights=n).astype(np.int64)
        d_tot = np.bincount(dinv, weights=d).astype(np.int64)
        frac = np.where(n_tot > 0, d_tot * 1000 // np.maximum(n_tot, 1), 0)
        return pa.table(
            {"doc_id": pa.array(udoc, pa.int64()),
             "n_grams": pa.array(n_tot, pa.int64()),
             "dup_grams": pa.array(d_tot, pa.int64()),
             "dup_frac_milli": pa.array(frac, pa.int64())}
        )

    return (
        _docs(sf_dir, ["doc_id", "text"])
        .map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("part")
        .map_groups(mark_and_partial, batch_format="pyarrow")
        .groupby("part2")
        .map_groups(combine, batch_format="pyarrow")
    )


def cross_source_overlap(sf_dir: str, k: int = 5, num_partitions: int = 32):
    """Source-pair contamination matrix: for every source pair
    ``a < b``, the number of DISTINCT word-``k``-grams present in
    documents of BOTH sources — the cross-source leakage audit run on a
    corpus mixture before training (syndicated/boilerplate content
    shows up as a hot pair).  Pairs sharing zero grams are omitted.

    Scale shape: per-batch distinct ``(source, gram-hash)`` partials
    (Arrow hash-distinct) → ONE gram-keyed partition shuffle →
    per-partition global distinct + gram-segment pair expansion,
    vectorized ACROSS segments (an offset-pair loop bounded by
    n_sources², never per-gram Python) → in-partition pair counts →
    driver combine over the bounded ``partitions × n_sources²`` rows.
    """
    from crawl_ray.urlnorm import fnv1a64_batch

    P = num_partitions
    _empty = pa.table(
        {"gram": pa.array([], pa.int64()),
         "source": pa.array([], pa.string()),
         "part": pa.array([], pa.int64())}
    )
    _empty_pairs = pa.table(
        {"source_a": pa.array([], pa.string()),
         "source_b": pa.array([], pa.string()),
         "shared_grams": pa.array([], pa.int64())}
    )

    def partial(batch: pa.Table) -> pa.Table:
        doc_ids, flat, lens = _token_lists(batch)
        grams, doc_idx = _gram_arrays(flat, lens, k)
        if not len(grams):
            return _empty
        gh = fnv1a64_batch(grams.to_pylist()).view(np.int64)
        src = batch.column("source").take(pa.array(doc_idx, pa.int64()))
        t = pa.table(
            {"gram": pa.array(gh, pa.int64()), "source": src}
        ).group_by(["gram", "source"]).aggregate([])
        part = (
            t.column("gram").to_numpy(zero_copy_only=False).view(np.uint64)
            % np.uint64(P)
        ).astype(np.int64)
        return t.append_column("part", pa.array(part, pa.int64()))

    def pair_counts(group: pa.Table) -> pa.Table:
        t = group.select(["gram", "source"]).group_by(
            ["gram", "source"]
        ).aggregate([])  # cross-batch distinct within the partition
        order = pc.sort_indices(
            t, [("gram", "ascending"), ("source", "ascending")]
        )
        g = t.column("gram").take(order).to_numpy(zero_copy_only=False)
        s = t.column("source").take(order).to_numpy(zero_copy_only=False)
        n = len(g)
        if n < 2:
            return _empty_pairs
        seg_start = np.flatnonzero(np.r_[True, g[1:] != g[:-1]])
        seg_len = np.diff(np.r_[seg_start, n])
        max_m = int(seg_len.max())
        out_a, out_b = [], []
        # offset-pair expansion: ≤ n_sources² numpy selections total;
        # sources inside a segment are sorted, so s[st+i] < s[st+j]
        for i in range(max_m):
            for j in range(i + 1, max_m):
                sel = seg_len > j
                if not sel.any():
                    break
                st = seg_start[sel]
                out_a.append(s[st + i])
                out_b.append(s[st + j])
        if not out_a:
            return _empty_pairs
        pt = pa.table(
            {"source_a": pa.array(np.concatenate(out_a), pa.string()),
             "source_b": pa.array(np.concatenate(out_b), pa.string()),
             "shared_grams": pa.array(
                 np.ones(sum(len(a) for a in out_a), np.int64), pa.int64()
             )}
        ).group_by(["source_a", "source_b"]).aggregate(
            [("shared_grams", "sum")]
        )
        return pt.rename_columns(
            [c if c != "shared_grams_sum" else "shared_grams"
             for c in pt.column_names]
        )

    parts = (
        _docs(sf_dir, ["doc_id", "text", "source"])
        .map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("part")
        .map_groups(pair_counts, batch_format="pyarrow")
    )
    t = collect_table(parts)  # bounded: ≤ partitions × n_sources² rows
    if t.num_rows == 0:
        return _empty_pairs
    out = t.group_by(["source_a", "source_b"]).aggregate(
        [("shared_grams", "sum")]
    )
    return out.rename_columns(
        [c if c != "shared_grams_sum" else "shared_grams"
         for c in out.column_names]
    )


def fuzzy_decontam(
    sf_dir: str, k: int = 3, bench_mod: int = 10, t_milli: int = 300
):
    """Fuzzy benchmark decontamination: flag corpus documents whose
    k-token shingle-set Jaccard against ANY benchmark doc (docs with
    ``doc_id % bench_mod == 0`` stand in for the eval suite) reaches
    ``t_milli`` — the near-duplicate complement of
    :func:`benchmark_decontam`'s exact-gram overlap (a paraphrased or
    lightly-edited eval document shares few exact long grams but keeps
    high set similarity).  Returns ``(doc_id, bench_id, jaccard_milli)``
    with the best-matching bench doc (ties → lowest bench_id).

    Scale shape: the benchmark side is eval-suite-sized BY CONTRACT, so
    its shingle sets are collected once and broadcast as ONE sorted
    (shingle, owner) array; the corpus side is one streaming pass —
    per doc, matches come from two ``searchsorted`` probes + a repeat
    expansion, and per-bench intersection counts from one ``bincount``
    (exact set math, not minhash estimates)."""
    from crawl_ray.pipelines.dedup import _shingle_hashes

    def bench_partial(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        keep = np.flatnonzero(ids % bench_mod == 0)
        texts = batch.column("text").take(pa.array(keep, pa.int64())).to_pylist()
        return pa.table(
            {"bench_id": pa.array(ids[keep], pa.int64()),
             "shingles": pa.array(
                 [_shingle_hashes(txt, k).tolist() for txt in texts],
                 pa.list_(pa.uint64()),
             )}
        )

    bench = collect_table(
        _docs(sf_dir, ["doc_id", "text"]).map_batches(
            bench_partial, batch_format="pyarrow", zero_copy_batch=True
        )
    )
    _empty = pa.table(
        {"doc_id": pa.array([], pa.int64()),
         "bench_id": pa.array([], pa.int64()),
         "jaccard_milli": pa.array([], pa.int64())}
    )
    if bench.num_rows == 0:
        return _empty
    bids = bench.column("bench_id").to_numpy(zero_copy_only=False)
    sets = [np.asarray(s, np.uint64) for s in bench.column("shingles").to_pylist()]
    flat = np.concatenate(sets)
    owner = np.repeat(np.arange(len(sets), dtype=np.int64),
                      [len(s) for s in sets])
    order = np.argsort(flat, kind="stable")
    flat, owner = flat[order], owner[order]
    sizes = np.array([len(s) for s in sets], dtype=np.int64)
    pack_ref = ray.put((flat, owner, sizes, bids))

    def scan(batch: pa.Table) -> pa.Table:
        flat_, owner_, sizes_, bids_ = ray.get(pack_ref)
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        keep = np.flatnonzero(ids % bench_mod != 0)
        texts = batch.column("text").take(pa.array(keep, pa.int64())).to_pylist()
        out_d, out_b, out_j = [], [], []
        for did, txt in zip(ids[keep].tolist(), texts):
            sa = _shingle_hashes(txt, k)
            lo = np.searchsorted(flat_, sa, side="left")
            hi = np.searchsorted(flat_, sa, side="right")
            runs = hi - lo
            if not runs.sum():
                continue
            pos = np.repeat(lo, runs) + _match_ranges(runs)
            inter = np.bincount(owner_[pos], minlength=len(sizes_))
            union = sa.size + sizes_ - inter
            jm = inter * 1000 // np.maximum(union, 1)
            best = int(jm.max())
            if best < t_milli:
                continue
            # ties → lowest bench_id (ids are not sorted by pack index)
            cand = np.flatnonzero(jm == best)
            out_d.append(did)
            out_b.append(int(bids_[cand].min()))
            out_j.append(best)
        if not out_d:
            return _empty
        return pa.table(
            {"doc_id": pa.array(out_d, pa.int64()),
             "bench_id": pa.array(out_b, pa.int64()),
             "jaccard_milli": pa.array(out_j, pa.int64())}
        )

    # the contamination report is eval-suite-adjacent and bounded by
    # contract, so collect it (typed-empty fallback: Ray short-circuits
    # empty blocks past every UDF, losing the schema on a clean corpus)
    t = collect_table(
        _docs(sf_dir, ["doc_id", "text"]).map_batches(
            scan, batch_format="pyarrow", zero_copy_batch=True
        )
    )
    if t.num_rows == 0 or "doc_id" not in t.column_names:
        return _empty
    order = np.argsort(t.column("doc_id").to_numpy(zero_copy_only=False))
    return t.take(pa.array(order, pa.int64()))


def _match_ranges(runs: np.ndarray) -> np.ndarray:
    """[0..r0-1, 0..r1-1, ...] offsets for searchsorted hit runs."""
    s = np.repeat(np.r_[np.int64(0), np.cumsum(runs)[:-1]], runs)
    return np.arange(int(runs.sum()), dtype=np.int64) - s


# Gopher rule constants (Rae et al. 2021, "Scaling Language Models:
# Methods, Analysis & Insights from Training Gopher", table A1) —
# thresholds in exact integer milli-units so the DuckDB oracle can
# reproduce every comparison bit-for-bit.
GOPHER_STOPWORDS = ["the", "be", "to", "of", "and", "that", "have", "with"]
GOPHER_MIN_WORDS = 50
GOPHER_MAX_WORDS = 100_000
GOPHER_MIN_MEAN_WORD_MILLI = 3_000   # mean word length ≥ 3 chars
GOPHER_MAX_MEAN_WORD_MILLI = 10_000  # … and ≤ 10 chars
GOPHER_MAX_BULLET_MILLI = 900        # ≤90% of lines start with a bullet
GOPHER_MAX_ELLIPSIS_MILLI = 300      # ≤30% of lines end with an ellipsis
GOPHER_MIN_ALPHA_WORD_MILLI = 800    # ≥80% of words contain a letter
GOPHER_MIN_STOPWORDS = 2


def _segment_sum(flags, offsets: np.ndarray) -> np.ndarray:
    """Sum a flattened per-element int array back to per-row totals
    using the list array's offsets (vectorized ``add.reduceat``)."""
    n_rows = len(offsets) - 1
    out = np.zeros(n_rows, dtype=np.int64)
    lens = np.diff(offsets)
    nz = lens > 0
    if flags.size:
        starts = offsets[:-1][nz]
        out[nz] = np.add.reduceat(flags, starts)
        # reduceat with duplicate start indices (empty segments) is
        # avoided entirely by the nz mask
    return out


def gopher_rules(sf_dir: str):
    """Gopher-style rule-based quality filter (public Rae et al. 2021
    heuristics): per-document rule measurements in exact integer
    milli-units plus the conjunction ``pass`` flag.  One vectorized
    ``map_batches`` pass — flatten the token / line list arrays, apply
    Arrow kernels element-wise, and segment-sum back to rows with
    ``add.reduceat``; zero shuffle, zero Python per row.

    Emitting the per-rule columns (not just the verdict) is deliberate:
    at 100 TB the filter's rule mix is a monitored distribution, and
    re-running the whole scan per rule would be 7× the IO."""

    def rules(batch: pa.Table) -> pa.Table:
        text = batch.column("text")
        trimmed = pc.utf8_trim_whitespace(text)
        toks = pc.split_pattern_regex(trimmed, r"\s+").combine_chunks()
        n_words = pc.list_value_length(toks).cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )
        flat = pc.list_flatten(toks)
        tok_off = np.asarray(toks.offsets)
        tok_lens = pc.utf8_length(flat).cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )
        sum_word_chars = _segment_sum(tok_lens, tok_off)
        alpha_flags = pc.match_substring_regex(flat, r"[A-Za-z]").cast(
            pa.int64()
        ).to_numpy(zero_copy_only=False)
        n_alpha_words = _segment_sum(alpha_flags, tok_off)
        stop_flags = pc.is_in(
            pc.utf8_lower(flat),
            value_set=pa.array(GOPHER_STOPWORDS, pa.string()),
        ).cast(pa.int64()).to_numpy(zero_copy_only=False)
        n_stopwords = _segment_sum(stop_flags, tok_off)

        lines = pc.split_pattern(text, "\n").combine_chunks()
        n_lines = pc.list_value_length(lines).cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )
        flat_lines = pc.list_flatten(lines)
        line_off = np.asarray(lines.offsets)
        lt = pc.utf8_trim_whitespace(flat_lines)
        bullet = pc.or_(
            pc.starts_with(lt, "- "), pc.starts_with(lt, "•")
        ).cast(pa.int64()).to_numpy(zero_copy_only=False)
        n_bullet = _segment_sum(bullet, line_off)
        ellipsis = pc.or_(
            pc.ends_with(lt, "..."), pc.ends_with(lt, "…")
        ).cast(pa.int64()).to_numpy(zero_copy_only=False)
        n_ellipsis = _segment_sum(ellipsis, line_off)

        safe_words = np.maximum(n_words, 1)
        safe_lines = np.maximum(n_lines, 1)
        mean_word_milli = sum_word_chars * 1000 // safe_words
        alpha_word_milli = n_alpha_words * 1000 // safe_words
        bullet_milli = n_bullet * 1000 // safe_lines
        ellipsis_milli = n_ellipsis * 1000 // safe_lines
        ok = (
            (n_words >= GOPHER_MIN_WORDS)
            & (n_words <= GOPHER_MAX_WORDS)
            & (mean_word_milli >= GOPHER_MIN_MEAN_WORD_MILLI)
            & (mean_word_milli <= GOPHER_MAX_MEAN_WORD_MILLI)
            & (bullet_milli <= GOPHER_MAX_BULLET_MILLI)
            & (ellipsis_milli <= GOPHER_MAX_ELLIPSIS_MILLI)
            & (alpha_word_milli >= GOPHER_MIN_ALPHA_WORD_MILLI)
            & (n_stopwords >= GOPHER_MIN_STOPWORDS)
        )
        return pa.table(
            {
                "doc_id": batch.column("doc_id").cast(pa.int64()),
                "n_words": pa.array(n_words, pa.int64()),
                "mean_word_milli": pa.array(mean_word_milli, pa.int64()),
                "alpha_word_milli": pa.array(alpha_word_milli, pa.int64()),
                "bullet_milli": pa.array(bullet_milli, pa.int64()),
                "ellipsis_milli": pa.array(ellipsis_milli, pa.int64()),
                "n_stopwords": pa.array(n_stopwords, pa.int64()),
                "pass": pa.array(ok),
            }
        )

    return _docs(sf_dir, ["doc_id", "text"]).map_batches(
        rules, batch_format="pyarrow", zero_copy_batch=True
    )


def collocations(
    sf_dir: str, min_cnt: int = 20, k: int = 20, num_partitions: int = 32
):
    """Top-``k`` word-pair collocations by integer *lift* — the PMI-style
    association statistic used for tokenizer-merge and phrase-mining
    passes, kept in exact integer milli-units
    (``pair_cnt × N × 1000 // (c(w1) × c(w2))``) so the oracle
    comparison is byte-exact (the ratio is the PMI exponent; ranking by
    it ≡ ranking by PMI).

    Scale shape: (1) bigram counts with a ``HAVING cnt ≥ min_cnt``
    survivor filter — the :func:`ngram_counts` partial-counts →
    int-keyed partition shuffle, with the frequency floor instead of a
    local top-k, so the collected survivor table is bounded by the
    corpus' heavy tail (at 100 TB raise ``min_cnt`` with corpus size;
    the floor IS the size contract); (2) unigram counts restricted to
    the survivor word set — broadcast once, one streaming ``is_in`` +
    ``value_counts`` pass that also carries the total-token count as a
    single-space sentinel row (no token can contain whitespace, the
    tokenizer splits on it); (3) the lift ranking runs on the driver
    over the bounded survivors in Python ints (no int64 overflow at
    ``N × 1000 × pair_cnt``)."""
    from crawl_ray.urlnorm import fnv1a64_batch

    empty = pa.table(
        {"w1": pa.array([], pa.string()),
         "w2": pa.array([], pa.string()),
         "pair_cnt": pa.array([], pa.int64()),
         "lift_milli": pa.array([], pa.int64())}
    )

    def pair_partial(batch: pa.Table) -> pa.Table:
        empty_p = pa.table(
            {"gram": pa.array([], pa.string()),
             "cnt": pa.array([], pa.int64()),
             "part": pa.array([], pa.int64())}
        )
        _, flat, lens = _token_lists(batch)
        if not len(flat):
            return empty_p
        grams, _ = _gram_arrays(flat, lens, 2)
        if not len(grams):
            return empty_p
        vc = grams.value_counts()
        uniq = vc.field("values")
        counts = vc.field("counts").cast(pa.int64())
        pid = (
            fnv1a64_batch(uniq.to_pylist()) % np.uint64(num_partitions)
        ).astype(np.int64)
        return pa.table(
            {"gram": uniq, "cnt": counts, "part": pa.array(pid, pa.int64())}
        )

    def combine_floor(group: pa.Table) -> pa.Table:
        agg = pa.TableGroupBy(
            group.select(["gram", "cnt"]), "gram"
        ).aggregate([("cnt", "sum")])
        agg = agg.filter(pc.greater_equal(agg.column("cnt_sum"), min_cnt))
        return pa.table(
            {"gram": agg.column("gram"), "cnt": agg.column("cnt_sum")}
        )

    surv = collect_table(
        _docs(sf_dir, ["doc_id", "text"])
        .map_batches(pair_partial, batch_format="pyarrow", zero_copy_batch=True)
        .repartition(num_partitions)
        .groupby("part")
        .map_groups(combine_floor, batch_format="pyarrow")
    )
    if surv.num_rows == 0:
        return empty
    gram_split = pc.split_pattern(surv.column("gram"), " ")
    w1 = pc.list_element(gram_split, 0).to_numpy(zero_copy_only=False)
    w2 = pc.list_element(gram_split, 1).to_numpy(zero_copy_only=False)
    pair_cnt = surv.column("cnt").to_numpy(zero_copy_only=False)
    words = np.unique(np.concatenate([w1, w2]))
    wordset_ref = ray.put(pa.array(words, pa.string()))

    TOTAL_SENTINEL = " "  # whitespace-split tokens can never equal it

    def uni_partial(batch: pa.Table) -> pa.Table:
        _, flat, lens = _token_lists(batch)
        if not len(flat):
            return pa.table(
                {"w": pa.array([], pa.string()),
                 "c": pa.array([], pa.int64())}
            )
        arr = pa.array(flat, pa.string())
        kept = arr.filter(pc.is_in(arr, value_set=ray.get(wordset_ref)))
        vc = kept.value_counts()
        return pa.table(
            {
                "w": pa.concat_arrays(
                    [vc.field("values"),
                     pa.array([TOTAL_SENTINEL], pa.string())]
                ),
                "c": pa.concat_arrays(
                    [vc.field("counts").cast(pa.int64()),
                     pa.array([len(flat)], pa.int64())]
                ),
            }
        )

    uni = collect_table(
        _docs(sf_dir, ["doc_id", "text"]).map_batches(
            uni_partial, batch_format="pyarrow", zero_copy_batch=True
        )
    )
    agg = pa.TableGroupBy(uni, "w").aggregate([("c", "sum")])
    uw = agg.column("w").to_numpy(zero_copy_only=False)
    uc = agg.column("c_sum").to_numpy(zero_copy_only=False)
    by_word = dict(zip(uw.tolist(), uc.tolist()))
    n_total = by_word.pop(TOTAL_SENTINEL, 0)
    lift = [
        int(pair_cnt[i]) * int(n_total) * 1000
        // (by_word[w1[i]] * by_word[w2[i]])
        for i in range(len(pair_cnt))
    ]
    order = sorted(
        range(len(lift)), key=lambda i: (-lift[i], w1[i], w2[i])
    )[:k]
    return pa.table(
        {
            "w1": pa.array(w1[order], pa.string()),
            "w2": pa.array(w2[order], pa.string()),
            "pair_cnt": pa.array(pair_cnt[order], pa.int64()),
            "lift_milli": pa.array([lift[i] for i in order], pa.int64()),
        }
    )


def dsir_weights(sf_dir: str, target_lang: str = "en", top_v: int = 65536):
    """DSIR-style importance weights (Xie et al. 2023, "Data Selection
    for Language Models via Importance Resampling"): per document,
    ``Σ_tokens log p_target(t) − log p_raw(t)`` — positive means the
    doc looks more like the target distribution (here: the
    ``target_lang`` slice) than the raw corpus, the resampling signal
    for pretraining-mix selection.

    Arithmetic policy ≡ :func:`unigram_logprob`: each per-token NLL is
    floor-quantized to integer micro-nats BEFORE the subtraction and
    the per-doc sum, so partial-sum order can't move the result and
    the DuckDB oracle hashes identically.  Unseen-in-target tokens get
    the 0.5-count smoothing floor.  Both models come from ONE corpus
    pass (partials carry raw and target counts side by side); the
    vocab is top-``top_v`` by raw count, broadcast once, and scoring
    is one vectorized streaming pass (searchsorted + bincount)."""
    import math

    from ray.data.aggregate import Sum


    def partial(batch: pa.Table) -> pa.Table:
        doc_ids, flat, lens = _token_lists(batch)
        if not len(flat):
            return pa.table(
                {"token": pa.array([], pa.string()),
                 "cnt": pa.array([], pa.int64()),
                 "cnt_tgt": pa.array([], pa.int64())}
            )
        is_tgt = pc.equal(
            batch.column("lang"), target_lang
        ).to_numpy(zero_copy_only=False)
        tok_tgt = np.repeat(is_tgt.astype(np.float64), lens)
        uniq, inv, counts = np.unique(
            flat, return_inverse=True, return_counts=True
        )
        tgt_counts = np.bincount(
            inv, weights=tok_tgt, minlength=len(uniq)
        ).astype(np.int64)
        return pa.table(
            {"token": pa.array(uniq, pa.string()),
             "cnt": pa.array(counts.astype(np.int64), pa.int64()),
             "cnt_tgt": pa.array(tgt_counts, pa.int64())}
        )

    partials = _docs(sf_dir, ["doc_id", "text", "lang"]).map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()
    total_raw = int(partials.sum("cnt") or 0)  # None on a 0-row corpus
    total_tgt = int(partials.sum("cnt_tgt") or 0)
    if total_raw == 0 or total_tgt == 0:
        return pa.table(
            {"doc_id": pa.array([], pa.int64()),
             "n_tokens": pa.array([], pa.int64()),
             "dsir_micro": pa.array([], pa.int64())}
        )

    toks, cnts, ctgt = _topv_by_count(
        partials.groupby("token").aggregate(Sum("cnt"), Sum("cnt_tgt")),
        "token", "sum(cnt)", top_v, extra_cols=("sum(cnt_tgt)",),
    )
    diff = np.array(
        [
            math.floor(-1e6 * math.log(cr / total_raw))
            - math.floor(-1e6 * math.log(max(ct, 0.5) / total_tgt))
            for cr, ct in zip(cnts.tolist(), ctgt.tolist())
        ],
        dtype=np.int64,
    )
    # OOV (outside top_v by raw count): 0.5-count floor on BOTH sides
    oov_diff = np.int64(
        math.floor(-1e6 * math.log(0.5 / total_raw))
        - math.floor(-1e6 * math.log(0.5 / total_tgt))
    )
    sidx = np.argsort(toks)
    lm_ref = ray.put(
        {"toks": toks[sidx], "diff": diff[sidx], "oov": oov_diff}
    )

    def score(batch: pa.Table) -> pa.Table:
        lm = ray.get(lm_ref)
        doc_ids, flat, lens = _token_lists(batch)
        n = len(doc_ids)
        if n == 0:
            return pa.table(
                {"doc_id": pa.array([], pa.int64()),
                 "n_tokens": pa.array([], pa.int64()),
                 "dsir_micro": pa.array([], pa.int64())}
            )
        pos = np.clip(
            np.searchsorted(lm["toks"], flat), 0, len(lm["toks"]) - 1
        )
        hit = lm["toks"][pos] == flat
        tok_diff = np.where(hit, lm["diff"][pos], lm["oov"])
        didx = np.repeat(np.arange(n, dtype=np.int64), lens)
        # |diff| ≤ ~4e7 micro-nats/token ⇒ doc sums ≪ 2^53: float64-exact
        sums = np.bincount(
            didx, weights=tok_diff.astype(np.float64), minlength=n
        ).astype(np.int64)
        return pa.table(
            {"doc_id": pa.array(doc_ids, pa.int64()),
             "n_tokens": pa.array(lens, pa.int64()),
             "dsir_micro": pa.array(sums, pa.int64())}
        )

    return _docs(sf_dir, ["doc_id", "text"]).map_batches(
        score, batch_format="pyarrow", zero_copy_batch=True
    ).sort("doc_id")


def token_entropy(sf_dir: str):
    """Per-document token Shannon entropy in exact integer micro-nats —
    the low-entropy detector for boilerplate / keyword-stuffing /
    generated spam (complements :func:`repetition_stats`' top-fraction
    signals with the full-distribution statistic).

    Returns ``(doc_id, n_tokens, entropy_sum_micro)`` where
    ``entropy_sum_micro = Σ_{distinct t} c_t · floor(1e6·ln(n/c_t))``
    (÷ n gives mean entropy per token; the undivided integer sum is the
    oracle-hashable form).  Zero shuffle: one streaming batch pass.
    Each per-term log is floor-quantized BEFORE the multiply-sum, and
    the logs are evaluated with ``math.log`` (the same libm call DuckDB's
    ``ln`` makes) over the DISTINCT ``(n, c)`` pairs of the batch only —
    numpy's SIMD ``np.log`` can differ from libm in the last ulp, which
    would flip a floor at an exact boundary."""
    import math

    empty = pa.table(
        {"doc_id": pa.array([], pa.int64()),
         "n_tokens": pa.array([], pa.int64()),
         "entropy_sum_micro": pa.array([], pa.int64())}
    )

    def entropy(batch: pa.Table) -> pa.Table:
        doc_ids, flat, lens = _token_lists(batch)
        if not len(flat):
            return empty
        doc_idx = np.repeat(np.arange(len(doc_ids), dtype=np.int64), lens)
        vocab, inv = np.unique(flat, return_inverse=True)
        key = doc_idx * len(vocab) + inv
        uk, counts = np.unique(key, return_counts=True)
        d = uk // len(vocab)
        n = lens[d]
        # libm-exact floors via the bounded distinct-(n, c) pair set
        pair_key = n * (n.max() + 1) + counts
        upairs, pinv = np.unique(pair_key, return_inverse=True)
        un = upairs // (n.max() + 1)
        uc = upairs % (n.max() + 1)
        logs = np.array(
            [math.floor(1e6 * math.log(a / b)) for a, b in zip(un.tolist(), uc.tolist())],
            dtype=np.int64,
        )
        contrib = counts.astype(np.int64) * logs[pinv]
        sums = np.bincount(
            d, weights=contrib.astype(np.float64), minlength=len(doc_ids)
        ).astype(np.int64)
        return pa.table(
            {"doc_id": pa.array(doc_ids, pa.int64()),
             "n_tokens": pa.array(lens, pa.int64()),
             "entropy_sum_micro": pa.array(sums, pa.int64())}
        )

    return _docs(sf_dir, ["doc_id", "text"]).map_batches(
        entropy, batch_format="pyarrow", zero_copy_batch=True
    ).sort("doc_id")


def _flagged_gram_starts(sf_dir: str, k: int, num_partitions: int):
    """Dataset of ``(doc_id, pos, part2)``: the 0-based token position of
    every word-``k``-gram occurrence whose gram occurs ≥ 2 times in the
    corpus (within-doc repeats count, as in Lee et al.'s ExactSubstr).

    Shared candidate stage of :func:`duplicate_spans` /
    :func:`remove_duplicate_spans`.  Shape: per-batch vectorized gram
    construction → ONE ``hash(gram) % P`` shuffle (a gram's occurrences
    all land in one partition, so the ≥2 test is exact) → flagged
    positions re-keyed by ``doc_id % P`` for the per-doc stage.  The
    shuffle carries one row per token occurrence — the same volume as
    :func:`duplicated_ngrams`, never all-pairs."""
    from crawl_ray.urlnorm import fnv1a64_batch

    P = num_partitions
    _empty = pa.table(
        {"doc_id": pa.array([], pa.int64()),
         "pos": pa.array([], pa.int64()),
         "gram": pa.array([], pa.int64()),
         "part": pa.array([], pa.int64())}
    )

    def positions(batch: pa.Table) -> pa.Table:
        doc_ids, flat, lens = _token_lists(batch)
        grams, doc_idx = _gram_arrays(flat, lens, k)
        if not len(grams):
            return _empty
        gh = fnv1a64_batch(grams).view(np.int64)
        n_grams = np.maximum(lens - k + 1, 0)
        pos = np.arange(len(gh), dtype=np.int64) - np.repeat(
            np.cumsum(n_grams) - n_grams, n_grams
        )
        part = (gh.view(np.uint64) % np.uint64(P)).astype(np.int64)
        return pa.table(
            {"doc_id": pa.array(doc_ids[doc_idx], pa.int64()),
             "pos": pa.array(pos, pa.int64()),
             "gram": pa.array(gh, pa.int64()),
             "part": pa.array(part, pa.int64())}
        )

    def flag(group: pa.Table) -> pa.Table:
        empty = pa.table(
            {"doc_id": pa.array([], pa.int64()),
             "pos": pa.array([], pa.int64()),
             "part2": pa.array([], pa.int64())}
        )
        if group.num_rows == 0 or "gram" not in group.column_names:
            return empty
        gram = group.column("gram").to_numpy(zero_copy_only=False)
        _, inv, cnt = np.unique(gram, return_inverse=True, return_counts=True)
        keep = cnt[inv] >= 2
        if not keep.any():
            return empty
        doc = group.column("doc_id").to_numpy(zero_copy_only=False)[keep]
        pos = group.column("pos").to_numpy(zero_copy_only=False)[keep]
        return pa.table(
            {"doc_id": pa.array(doc, pa.int64()),
             "pos": pa.array(pos, pa.int64()),
             "part2": pa.array(doc % P, pa.int64())}
        )

    return (
        _docs(sf_dir, ["doc_id", "text"])
        .map_batches(positions, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("part")
        .map_groups(flag, batch_format="pyarrow")
    )


def duplicate_spans(sf_dir: str, k: int = 8, num_partitions: int = 32):
    """ExactSubstr-style duplicated-span detection (Lee et al. 2022,
    "Deduplicating Training Data Makes Language Models Better") at
    word-``k``-gram granularity: for every document, the maximal token
    spans covered by k-grams that occur ≥ 2 times anywhere in the
    corpus (suffix-array semantics at gram resolution — overlapping
    flagged grams merge into one span; a new span starts when the gap
    between flagged start positions reaches ``k``).

    Output: one row per maximal span — ``(doc_id, span_start,
    span_end)``, token indices 0-based inclusive.

    Scale shape: the :func:`_flagged_gram_starts` shuffle pair; the
    span merge is a vectorized lexsort + gap-break segment kernel per
    ``doc_id % P`` partition — never per-document Python."""
    flagged = _flagged_gram_starts(sf_dir, k, num_partitions)

    def spans(group: pa.Table) -> pa.Table:
        empty = pa.table(
            {"doc_id": pa.array([], pa.int64()),
             "span_start": pa.array([], pa.int64()),
             "span_end": pa.array([], pa.int64())}
        )
        if group.num_rows == 0 or "doc_id" not in group.column_names:
            return empty
        doc = group.column("doc_id").to_numpy(zero_copy_only=False)
        pos = group.column("pos").to_numpy(zero_copy_only=False)
        order = np.lexsort((pos, doc))
        doc, pos = doc[order], pos[order]
        brk = np.ones(len(doc), dtype=bool)
        brk[1:] = (doc[1:] != doc[:-1]) | (pos[1:] - pos[:-1] >= k)
        gid = np.cumsum(brk) - 1
        head = np.flatnonzero(brk)
        tail = np.append(head[1:] - 1, len(doc) - 1)
        return pa.table(
            {"doc_id": pa.array(doc[head], pa.int64()),
             "span_start": pa.array(pos[head], pa.int64()),
             "span_end": pa.array(pos[tail] + k - 1, pa.int64())}
        )

    return flagged.groupby("part2").map_groups(spans, batch_format="pyarrow")


def remove_duplicate_spans(sf_dir: str, k: int = 8, num_partitions: int = 32):
    """The ExactSubstr dedup DELIVERABLE: the corpus with every
    duplicated token span (see :func:`duplicate_spans`) cut out —
    tokens covered by any ≥2-occurrence ``k``-gram are dropped from
    every occurrence, the conservative trim.  Reconstructed text is
    space-joined surviving tokens in order (tokenizer ≡ the oracle's
    ``string_split_regex(trim(text), '\\s+')``, so whitespace is
    normalized on both sides identically).

    Output: ``(doc_id, text_clean, n_kept_tokens, n_dropped_tokens)``
    — one row per document, including span-free and fully-dropped docs.

    Scale shape: flagged positions (duplication-bounded) and the
    documents table are re-keyed by the SAME ``doc_id % P`` and meet in
    one co-partitioned groupby — no broadcast of either side, no
    driver materialization; the cut is a delta-array / cumsum coverage
    kernel + one Arrow ``binary_join`` per partition."""
    P = num_partitions
    flagged = _flagged_gram_starts(sf_dir, k, P).map_batches(
        lambda b: pa.table(
            {"doc_id": b.column("doc_id"),
             "pos": b.column("pos"),
             "text": pa.array([None] * b.num_rows, pa.string()),
             "part2": b.column("part2")}
        ) if b.num_rows and "doc_id" in b.column_names else pa.table(
            {"doc_id": pa.array([], pa.int64()),
             "pos": pa.array([], pa.int64()),
             "text": pa.array([], pa.string()),
             "part2": pa.array([], pa.int64())}
        ),
        batch_format="pyarrow",
    )
    docs = _docs(sf_dir, ["doc_id", "text"]).map_batches(
        lambda b: pa.table(
            {"doc_id": b.column("doc_id").cast(pa.int64()),
             "pos": pa.array(
                 np.full(b.num_rows, -1, dtype=np.int64), pa.int64()
             ),
             "text": b.column("text"),
             "part2": pa.array(
                 b.column("doc_id").to_numpy(zero_copy_only=False)
                 .astype(np.int64) % P,
                 pa.int64(),
             )}
        ),
        batch_format="pyarrow", zero_copy_batch=True,
    )

    def rebuild(group: pa.Table) -> pa.Table:
        empty = pa.table(
            {"doc_id": pa.array([], pa.int64()),
             "text_clean": pa.array([], pa.string()),
             "n_kept_tokens": pa.array([], pa.int64()),
             "n_dropped_tokens": pa.array([], pa.int64())}
        )
        if group.num_rows == 0 or "doc_id" not in group.column_names:
            return empty
        is_doc = pc.equal(group.column("pos"), pa.scalar(-1, pa.int64()))
        drows = group.filter(is_doc)
        if drows.num_rows == 0:
            return empty
        doc_ids, flat, lens = _token_lists(drows)
        dorder = np.argsort(doc_ids)
        doc_ids_s = doc_ids[dorder]
        # token slot layout follows the drows row order (not doc order)
        offs = np.cumsum(lens) - lens
        total = int(lens.sum())
        covered = np.zeros(total + 1, dtype=np.int64)
        frows = group.filter(pc.invert(is_doc))
        if frows.num_rows:
            fdoc = frows.column("doc_id").to_numpy(zero_copy_only=False)
            fpos = frows.column("pos").to_numpy(zero_copy_only=False)
            ridx = dorder[np.searchsorted(doc_ids_s, fdoc)]
            # flagged gram at pos covers tokens [pos, pos+k-1]; grams
            # never overrun their doc by construction
            starts = offs[ridx] + fpos
            ends = starts + k  # exclusive
            np.add.at(covered, starts, 1)
            np.add.at(covered, ends, -1)
        keep_mask = np.cumsum(covered[:-1]) == 0
        doc_of_tok = np.repeat(np.arange(len(lens), dtype=np.int64), lens)
        n_kept = np.bincount(
            doc_of_tok, weights=keep_mask.astype(np.float64), minlength=len(lens)
        ).astype(np.int64)
        kept_tok = pa.array(flat[keep_mask], pa.string())
        kept_offsets = np.concatenate(
            [[0], np.cumsum(n_kept)]
        ).astype(np.int32)
        kept_lists = pa.ListArray.from_arrays(
            pa.array(kept_offsets, pa.int32()), kept_tok
        )
        text_clean = pc.binary_join(kept_lists, " ")
        return pa.table(
            {"doc_id": pa.array(doc_ids, pa.int64()),
             "text_clean": text_clean,
             "n_kept_tokens": pa.array(n_kept, pa.int64()),
             "n_dropped_tokens": pa.array(lens - n_kept, pa.int64())}
        )

    return (
        docs.union(flagged)
        .groupby("part2")
        .map_groups(rebuild, batch_format="pyarrow")
    )


def source_quota_sample(sf_dir: str, cap: int = 10):
    """Per-source quota sampling — the Dolma/Pile-style "no domain may
    exceed N documents" curation cap: for every ``source``, keep the
    ``cap`` documents with the smallest Knuth multiplicative hash of
    ``doc_id`` (ties by ``doc_id``) — a deterministic uniform sample
    that is identical on every run, partitioning, and cluster size
    (same rank key as :func:`sample_documents`, so it is
    SQL-expressible for the oracle).

    Scale shape: per-batch vectorized partial top-``cap`` per source
    (lexsort + segment position, never per-source Python), partials are
    ≤ sources × cap rows per block → the final combine is the same
    kernel over the driver-collected bounded partials (the
    ``partial_then_final`` pattern; the source domain is bounded —
    corpus registries, not fact-sized)."""

    def _topn(src: np.ndarray, doc: np.ndarray, rnk: np.ndarray):
        order = np.lexsort((doc, rnk, src))
        s = src[order]
        new = np.ones(len(s), dtype=bool)
        new[1:] = s[1:] != s[:-1]
        seg_start = np.maximum.accumulate(
            np.where(new, np.arange(len(s)), 0)
        )
        pos = np.arange(len(s)) - seg_start
        keep = order[pos < cap]
        return keep

    def partial(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False).astype(np.uint64)
        with np.errstate(over="ignore"):
            rnk = (ids * np.uint64(SAMPLE_MULT)) % np.uint64(SAMPLE_MODULUS)
        src = batch.column("source").to_numpy(zero_copy_only=False)
        keep = _topn(src, ids.astype(np.int64), rnk.astype(np.int64))
        return pa.table(
            {
                "doc_id": pa.array(ids[keep].astype(np.int64), pa.int64()),
                "source": pa.array(src[keep].tolist(), pa.string()),
                "rank_key": pa.array(rnk[keep].astype(np.int64), pa.int64()),
            }
        )


    partials = collect_table(
        _docs(sf_dir, ["doc_id", "source"]).map_batches(
            partial, batch_format="pyarrow", zero_copy_batch=True
        )
    )
    if partials.num_rows == 0 or "doc_id" not in partials.column_names:
        return pa.table(
            {"doc_id": pa.array([], pa.int64()),
             "source": pa.array([], pa.string()),
             "rank_key": pa.array([], pa.int64())}
        )
    src = partials.column("source").to_numpy(zero_copy_only=False)
    doc = partials.column("doc_id").to_numpy(zero_copy_only=False)
    rnk = partials.column("rank_key").to_numpy(zero_copy_only=False)
    keep = _topn(src, doc, rnk)
    order = keep[np.lexsort((doc[keep], rnk[keep], src[keep]))]
    return pa.table(
        {"doc_id": pa.array(doc[order], pa.int64()),
         "source": pa.array(src[order].tolist(), pa.string()),
         "rank_key": pa.array(rnk[order], pa.int64())}
    )


def build_inverted_index(sf_dir: str, n_buckets: int = 32) -> str:
    """Persist a bucket-partitioned inverted index over the documents
    table: ``bucket=K/part-*.parquet`` rows ``(term, doc_id, tf)`` with
    ``K = fnv1a64(term) % n_buckets`` — the text-search twin of
    :func:`crawl_ray.pipelines.similarity.build_ivf_index`'s
    list-partitioned ANN layout.

    ONE distributed pass: per-batch vectorized term counting (Arrow
    ``group_by`` over exploded tokens), task-side writes into per-bucket
    parquet parts (deterministic min/max-doc_id part names → retry-safe,
    the export-sink naming rule).  Cached by ``_SUCCESS`` marker — at
    100 TB this runs once as its own job, with the root on SHARED
    storage (task-side writes to node-local /tmp only work single-node;
    the same constraint the export sinks guard).  Lookups
    (:func:`term_postings`) read ONLY the probed term's bucket:
    1/n_buckets of the index, the IVF probed-lists property."""
    import hashlib

    from crawl_ray.urlnorm import fnv1a64_batch

    token = hashlib.blake2b(
        f"{sf_dir}:{n_buckets}:inv".encode(), digest_size=8
    ).hexdigest()
    from crawl_ray.storage import check_multinode_storage, store_root

    root = store_root() / f"inv_{token}"
    if (root / "_SUCCESS").exists():
        return str(root)
    check_multinode_storage("the inverted text index", root)
    root.mkdir(parents=True, exist_ok=True)

    def write_postings(batch: pa.Table) -> pa.Table:
        import pyarrow.parquet as pq_

        doc_ids, flat, lens = _token_lists(batch)
        n_written = 0
        if len(flat):
            doc_of_tok = np.repeat(doc_ids, lens)
            t = pa.table(
                {"term": pa.array(flat, pa.string()),
                 "doc_id": pa.array(doc_of_tok, pa.int64())}
            )
            counts = t.group_by(["term", "doc_id"]).aggregate([("doc_id", "count")])
            from crawl_ray.util import rename_select

            counts = rename_select(
                counts,
                {"term": "term", "doc_id": "doc_id", "doc_id_count": "tf"},
            )
            bk = (
                fnv1a64_batch(counts.column("term"))
                % np.uint64(n_buckets)
            ).astype(np.int64)
            dids = counts.column("doc_id").to_numpy(zero_copy_only=False)
            for b in np.unique(bk).tolist():
                mask = bk == b
                part = counts.filter(pa.array(mask))
                bdir = root / f"bucket={int(b)}"
                bdir.mkdir(parents=True, exist_ok=True)
                sel = dids[mask]
                pq_.write_table(
                    part,
                    bdir / f"part-{int(sel.min())}-{int(sel.max())}.parquet",
                )
                n_written += part.num_rows
        return pa.table({"n": pa.array([n_written], pa.int64())})

    _docs(sf_dir, ["doc_id", "text"]).map_batches(
        write_postings, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()
    (root / "_SUCCESS").touch()
    return str(root)


def term_postings(sf_dir: str, term: str = "spark", n_buckets: int = 32):
    """Posting-list lookup against the bucket-partitioned inverted
    index: reads ONLY ``bucket = fnv1a64(term) % n_buckets`` —
    1/n_buckets of the index regardless of corpus size (asserted in
    tests, the :func:`knn_ivf` probed-lists property).  Returns
    ``(doc_id, tf)`` rows for the term, doc_id-ordered."""
    import pathlib


    from crawl_ray.urlnorm import fnv1a64_batch

    root = pathlib.Path(build_inverted_index(sf_dir, n_buckets))
    b = int(fnv1a64_batch([term])[0] % np.uint64(n_buckets))
    bdir = root / f"bucket={b}"
    parts = sorted(bdir.glob("*.parquet")) if bdir.exists() else []
    if not parts:
        return pa.table(
            {"doc_id": pa.array([], pa.int64()),
             "tf": pa.array([], pa.int64())}
        )
    ds = ray.data.read_parquet([str(p) for p in parts])

    def pick(batch: pa.Table) -> pa.Table:
        hit = batch.filter(pc.equal(batch.column("term"), term))
        return pa.table(
            {"doc_id": hit.column("doc_id").cast(pa.int64()),
             "tf": hit.column("tf").cast(pa.int64())}
        )

    out = ds.map_batches(pick, batch_format="pyarrow", zero_copy_batch=True)

    t = collect_table(out)
    if t.num_rows == 0 or "doc_id" not in t.column_names:
        return pa.table(
            {"doc_id": pa.array([], pa.int64()),
             "tf": pa.array([], pa.int64())}
        )
    return t.sort_by([("doc_id", "ascending")])


def search_topk(
    sf_dir: str, query: str = "spark table", k: int = 10, n_buckets: int = 32
):
    """Ranked multi-term retrieval over the bucket-partitioned inverted
    index (:func:`build_inverted_index`): integer-quantized tf·idf —
    ``score = Σ_t (1000·N // df_t) · tf // (tf + 2)`` (a BM25-shaped
    saturating tf with an exact-integer idf, so the DuckDB oracle agrees
    bit-for-bit) — returning the top-``k`` docs (ties by doc_id).

    Only the query terms' buckets are read (≤ |terms|/n_buckets of the
    index); the collected postings are bounded by Σ df of the query
    terms — at web scale a hot term's posting list is still shuffled
    per-partition (the ``term_postings`` layout already co-locates a
    term), and only the per-doc score combine would move here."""
    import pathlib

    import pyarrow.parquet as pq_

    from crawl_ray.urlnorm import fnv1a64_batch

    terms = sorted(set(query.split()))
    empty = pa.table(
        {"doc_id": pa.array([], pa.int64()),
         "score_milli": pa.array([], pa.int64())}
    )
    if not terms:
        return empty
    n_docs = pq_.ParquetFile(f"{sf_dir}/documents.parquet").metadata.num_rows
    root = pathlib.Path(build_inverted_index(sf_dir, n_buckets))
    buckets = sorted(
        {int(h % np.uint64(n_buckets)) for h in fnv1a64_batch(terms)}
    )
    parts = [
        str(f)
        for b in buckets
        for f in sorted((root / f"bucket={b}").glob("*.parquet"))
    ]
    if not parts:
        return empty

    def pick(batch: pa.Table) -> pa.Table:
        hit = batch.filter(
            pc.is_in(batch.column("term"), value_set=pa.array(terms))
        )
        return hit

    postings = collect_table(
        ray.data.read_parquet(parts).map_batches(
            pick, batch_format="pyarrow", zero_copy_batch=True
        )
    )
    if postings.num_rows == 0 or "term" not in postings.column_names:
        return empty
    t = postings.column("term").to_numpy(zero_copy_only=False)
    d = postings.column("doc_id").to_numpy(zero_copy_only=False)
    tf = postings.column("tf").to_numpy(zero_copy_only=False)
    uterm, tinv, df = np.unique(t, return_inverse=True, return_counts=True)
    idf = (1000 * np.int64(n_docs)) // df.astype(np.int64)
    contrib = idf[tinv] * tf // (tf + 2)
    udoc, dinv = np.unique(d, return_inverse=True)
    score = np.bincount(dinv, weights=contrib.astype(np.float64)).astype(np.int64)
    order = np.lexsort((udoc, -score))[:k]
    return pa.table(
        {"doc_id": pa.array(udoc[order], pa.int64()),
         "score_milli": pa.array(score[order], pa.int64())}
    )
