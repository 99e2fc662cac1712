"""Edge-case tests for the n-gram / per-doc-term / redaction operators
on a tiny hand-written corpus (docs shorter than n, count ties, empty
redaction); corpus-scale parity with DuckDB is covered by
tests/test_queries_oracle.py."""

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from crawl_ray.pipelines import textops as T


@pytest.fixture(scope="module")
def tiny_dir(tmp_path_factory):
    docs = [
        (0, "a b a b c"),        # bigrams: "a b"×2, "b a", "b c"
        (1, "x"),                # shorter than n=2 → no bigrams
        (2, "b a b"),            # "b a", "a b"
        (3, "tie tie alpha beta alpha beta"),  # per-doc count ties
    ]
    d = tmp_path_factory.mktemp("tiny_docs")
    pq.write_table(
        pa.table(
            {"doc_id": pa.array([i for i, _ in docs], pa.int64()),
             "text": pa.array([t for _, t in docs], pa.string())}
        ),
        d / "documents.parquet",
    )
    return str(d)


def test_ngram_counts_bigrams(tiny_dir, ray_session):
    t = T.ngram_counts(tiny_dir, n=2, top_k=10)
    got = dict(zip(t.column("ngram").to_pylist(), t.column("cnt").to_pylist()))
    assert got == {
        "a b": 3, "b a": 2, "b c": 1, "tie tie": 1, "tie alpha": 1,
        "alpha beta": 2, "beta alpha": 1,
    }
    # ordering: count desc, then ngram asc
    rows = list(zip(t.column("ngram").to_pylist(), t.column("cnt").to_pylist()))
    assert rows == sorted(rows, key=lambda r: (-r[1], r[0]))


def test_ngram_counts_topk_truncates(tiny_dir, ray_session):
    t = T.ngram_counts(tiny_dir, n=2, top_k=2)
    assert t.column("ngram").to_pylist() == ["a b", "alpha beta"]
    assert t.column("cnt").to_pylist() == [3, 2]


def test_trigrams_skip_short_docs(tiny_dir, ray_session):
    t = T.ngram_counts(tiny_dir, n=3, top_k=50)
    got = dict(zip(t.column("ngram").to_pylist(), t.column("cnt").to_pylist()))
    assert "x" not in " ".join(got)  # doc 1 contributes nothing
    assert got["a b a"] == 1 and got["b a b"] == 2


def test_top_terms_tie_break(tiny_dir, ray_session):
    df = T.top_terms_per_doc(tiny_dir, k=2).to_pandas()
    d3 = df[df["doc_id"] == 3].sort_values("rnk")
    # counts: tie=2, alpha=2, beta=2 → tie broken term-ascending
    assert list(d3["term"]) == ["alpha", "beta"]
    assert list(d3["cnt"]) == [2, 2]
    d1 = df[df["doc_id"] == 1]
    assert list(d1["term"]) == ["x"] and list(d1["rnk"]) == [1]


def test_redact_terms_counts(tiny_dir, ray_session):
    df = (
        T.redact_terms(tiny_dir, pattern=r"\b(alpha|x)\b", replacement="[PII]")
        .to_pandas()
        .set_index("doc_id")
    )
    assert df.loc[3, "text_red"] == "tie tie [PII] beta [PII] beta"
    assert df.loc[3, "redacted_chars"] == 10
    assert df.loc[1, "text_red"] == "[PII]"
    assert df.loc[0, "redacted_chars"] == 0
    assert df.loc[0, "text_red"] == "a b a b c"


def test_pack_sequences_multirange_matches_single(ray_session):
    """The distributed multi-range prefix sum (real boundaries + offsets)
    must equal the degenerate single-range packing."""
    sf = "/root/testdata/sf0.01"
    single = (
        T.pack_sequences(sf, capacity=128, n_ranges=1)
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    multi = (
        T.pack_sequences(sf, capacity=128, n_ranges=8, sample_ppm=600_000)
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    assert len(single) == 500
    assert single.equals(multi)
    # bins fill contiguously: bin ids are non-decreasing in doc order
    assert (single["bin_id"].diff().dropna() >= 0).all()


def test_repetition_stats_tiny(tiny_dir, ray_session):
    t = T.repetition_stats(tiny_dir).to_pandas().set_index("doc_id")
    # doc 0 "a b a b c": 5 tokens, 3 distinct, max word "a"/"b"=2,
    # bigrams [a b, b a, a b, b c] → top "a b"=2 of 4 positions
    r0 = t.loc[0]
    assert r0.n_tokens == 5
    assert r0.distinct_frac_milli == 3000 // 5
    assert r0.max_word_frac_milli == 2000 // 5
    assert r0.top_bigram_frac_milli == 2000 // 4
    # doc 1 single token: no bigrams → 0
    r1 = t.loc[1]
    assert r1.n_tokens == 1
    assert r1.distinct_frac_milli == 1000
    assert r1.max_word_frac_milli == 1000
    assert r1.top_bigram_frac_milli == 0


def test_unigram_logprob_oov_cap(tiny_dir, ray_session):
    """With the vocab capped at 2 entries, only the 2 most frequent
    tokens keep their corpus NLL; the rest fall to the OOV floor
    (count 0.5) — the 100-TB bounded-broadcast path."""
    import math

    # sort_index: Dataset block order is not deterministic across runs,
    # and pandas refuses to compare differently-ordered Series
    full = T.unigram_logprob(tiny_dir).to_pandas().set_index("doc_id").sort_index()
    capped = (
        T.unigram_logprob(tiny_dir, top_v=2)
        .to_pandas().set_index("doc_id").sort_index()
    )
    # corpus: a×3 b×4 c×1 x×1 tie×2 alpha×2 beta×2 → T=15, top2 = b, a
    total = 15
    oov = math.floor(-1e6 * math.log(0.5 / total))
    nll = {w: math.floor(-1e6 * math.log(c / total))
           for w, c in {"a": 3, "b": 4}.items()}
    # doc 2 "b a b": fully in-vocab either way
    assert capped.loc[2].nll_micro == nll["b"] * 2 + nll["a"]
    assert capped.loc[2].nll_micro == full.loc[2].nll_micro
    # doc 1 "x": OOV under the cap, in-vocab without it
    assert capped.loc[1].nll_micro == oov
    assert full.loc[1].nll_micro == math.floor(-1e6 * math.log(1 / total))
    assert (capped.nll_micro >= full.nll_micro).all()


def test_recrawl_schedule_ranks(ray_session):
    from crawl_ray.pipelines.crawl_queries import recrawl_schedule

    t = recrawl_schedule("/root/testdata/sf0.001", k=3).to_pandas()
    assert set(t.columns) == {"host", "url", "warc_ts_us", "rnk"}
    for _, g in t.groupby("host"):
        assert list(g.rnk) == list(range(1, len(g) + 1))
        assert list(g.warc_ts_us) == sorted(g.warc_ts_us)
        assert len(g) <= 3


def test_training_corpus_prep_composition(ray_session):
    """The composed chain must agree with its parts: survivors are
    en-language, mid-quality, ≥20-token, first-per-text docs, and the
    bin assignment is the ordered prefix sum over exactly them."""
    sf = "/root/testdata/sf0.001"
    out = T.training_corpus_prep(sf).to_pandas().sort_values("doc_id")
    q = T.quality_score(sf).to_pandas().set_index("doc_id")
    lang = T.language_id(sf).to_pandas().set_index("doc_id")
    toks = T.token_stats(sf).to_pandas().set_index("doc_id")
    for d in out.doc_id:
        assert lang.loc[d].lang_pred == "en"
        assert 4300 <= q.loc[d].mean_tok_len_milli <= 4700
        assert toks.loc[d].n_tokens >= 20
    # packing: recompute prefix sum over the survivor set
    nt = out.n_tokens.to_numpy()
    before = nt.cumsum() - nt
    assert (out.bin_id.to_numpy() == before // 512).all()


def test_recrawl_schedule_distributed_matches_driver(ray_session):
    from crawl_ray.pipelines.crawl_queries import recrawl_schedule

    a = (
        recrawl_schedule("/root/testdata/sf0.001", k=3)
        .to_pandas()
        .sort_values(["host", "rnk"])
        .reset_index(drop=True)
    )
    b = (
        recrawl_schedule("/root/testdata/sf0.001", k=3, force_distributed=True)
        .to_pandas()
        .sort_values(["host", "rnk"])
        .reset_index(drop=True)
    )
    assert a.equals(b)


def test_stratified_sample_quota_and_order(tmp_path, ray_session):
    # 2 langs, 4 docs each, quota 2: per lang keep the 2 lowest
    # Knuth-hash doc_ids (ties impossible — hash is injective here)
    import numpy as np

    ids = list(range(8))
    langs = ["en"] * 4 + ["de"] * 4
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "text": pa.array(["t"] * 8, pa.string()),
                "lang": pa.array(langs, pa.string()),
            }
        ),
        tmp_path / "documents.parquet",
    )
    out = T.stratified_sample(str(tmp_path), k=2).to_pandas()
    h = (np.array(ids, dtype=np.uint64) * np.uint64(T.SAMPLE_MULT)) % np.uint64(
        T.SAMPLE_MODULUS
    )
    expect = set()
    for lang, lo in (("en", 0), ("de", 4)):
        keep = sorted(range(lo, lo + 4), key=lambda i: (h[i], i))[:2]
        expect.update((i, lang) for i in keep)
    assert set(zip(out.doc_id.astype(int), out.lang)) == expect
    assert set(out.rk.astype(int)) == {1, 2}
    assert list(out.doc_id) == sorted(out.doc_id)


def test_tfidf_top_terms_tiny(tiny_dir, ray_session):
    """Exact-integer tf·idf on the hand corpus: n_docs=4;
    df: a=2 b=2 c=1 x=1 tie=1 alpha=1 beta=1.  Rare terms outrank
    frequent ones at equal tf; ties break by term asc."""
    t = T.tfidf_top_terms(tiny_dir, k=2).to_pandas()
    by = {(r.doc_id, r.rnk): (r.term, r.tfidf_q) for r in t.itertuples()}
    # doc 0 "a b a b c": a,b tf=2 df=2 → 4; c tf=1 df=1 → 4; tie → a, b
    assert by[(0, 1)] == ("a", 4) and by[(0, 2)] == ("b", 4)
    # doc 1 "x": single term, tf=1 df=1 → 4
    assert by[(1, 1)] == ("x", 4)
    # doc 3: tie/alpha/beta tf=2 df=1 → 8 each; term asc → alpha, beta
    assert by[(3, 1)] == ("alpha", 8) and by[(3, 2)] == ("beta", 8)


def test_tfidf_top_v_cap_oov_fallback(tiny_dir, ray_session):
    """With the broadcast vocab capped at 1 entry, every other term
    falls back to df=1 (max idf) — the bounded-broadcast 100-TB path;
    in-vocab scores are unchanged."""
    capped = T.tfidf_top_terms(tiny_dir, k=2, top_v=1).to_pandas()
    # cap keeps the term with max df, tie by term asc → "a" (df=2)
    r = {(x.doc_id, x.term): x.tfidf_q for x in capped.itertuples()}
    assert r[(0, "a")] == 4          # in-vocab: 2*4//2
    assert r[(0, "b")] == 8          # OOV fallback: 2*4//1


def test_chunk_documents_windows(tiny_dir, ray_session):
    """Chunk grid on the hand corpus with window=3, stride=2: doc 0
    (5 tokens) → starts 0,2,4 with lengths 3,3,1; doc 1 (1 token) →
    one chunk."""
    t = T.chunk_documents(tiny_dir, window=3, stride=2).to_pandas()
    d0 = t[t.doc_id == 0].sort_values("chunk_idx")
    assert list(d0.chunk) == ["a b a", "a b c", "c"]
    assert list(d0.n_chunk_tokens) == [3, 3, 1]
    d1 = t[t.doc_id == 1]
    assert list(d1.chunk) == ["x"] and list(d1.chunk_idx) == [0]


def test_duplicated_ngrams_planted(tmp_path, ray_session):
    """Hand-built corpus: a shared 5-gram run marks its occurrences in
    BOTH docs; within-doc-only repeats don't count; short docs get 0s."""
    shared = "alpha beta gamma delta epsilon"  # one 5-gram
    docs = {
        # doc 0: shared run + 5 unique tokens → 6 tokens of grams
        0: shared + " u0a u0b u0c u0d u0e",
        # doc 1: different prefix + the same shared run
        1: "v1a v1b v1c v1d v1e " + shared,
        # doc 2: repeats ITS OWN 5-gram twice (within-doc only → not dup)
        2: "w a b c d e w a b c d e",
        # doc 3: too short for any 5-gram
        3: "x y z",
    }
    import pyarrow.parquet as pq

    pq.write_table(
        pa.table({"doc_id": pa.array(sorted(docs), pa.int64()),
                  "text": pa.array([docs[i] for i in sorted(docs)],
                                   pa.string())}),
        tmp_path / "documents.parquet",
    )
    out = (
        T.duplicated_ngrams(str(tmp_path))
        .to_pandas()
        .set_index("doc_id")
        .sort_index()
    )
    # doc 0: 10 tokens → 6 grams; only the 1 fully-shared gram is dup
    assert out.loc[0, "n_grams"] == 6
    assert out.loc[0, "dup_grams"] == 1
    assert out.loc[0, "dup_frac_milli"] == 1000 // 6
    # doc 1 mirrors doc 0
    assert out.loc[1, "n_grams"] == 6
    assert out.loc[1, "dup_grams"] == 1
    # doc 2: 12 tokens → 8 grams, all unique to doc 2 → dup 0
    assert out.loc[2, "n_grams"] == 8
    assert out.loc[2, "dup_grams"] == 0
    # doc 3: shorter than k → all zeros (but the row exists)
    assert out.loc[3].tolist() == [0, 0, 0]


def test_cross_source_overlap_planted(tmp_path, ray_session):
    """Planted matrix: sources A and B share two distinct 5-grams
    (one of them repeated — distinct counting collapses it), C shares
    one gram with A only, D shares nothing."""
    run1 = "p q r s t"      # in A (twice) and B
    run2 = "f g h i j"      # in A and B
    run3 = "k l m n o"      # in A and C
    rows = [
        (0, "A", f"{run1} {run1} {run2} {run3}"),
        (1, "B", f"{run1} zb1 zb2 zb3 zb4 {run2}"),
        (2, "C", f"{run3} zc1 zc2 zc3 zc4 zc5"),
        (3, "D", "zd1 zd2 zd3 zd4 zd5 zd6"),
    ]
    pq.write_table(
        pa.table({"doc_id": pa.array([r[0] for r in rows], pa.int64()),
                  "source": pa.array([r[1] for r in rows], pa.string()),
                  "text": pa.array([r[2] for r in rows], pa.string())}),
        tmp_path / "documents.parquet",
    )
    out = T.cross_source_overlap(str(tmp_path)).to_pandas()
    got = {
        (r.source_a, r.source_b): r.shared_grams
        for r in out.itertuples()
    }
    # A∩B ⊇ {run1, run2}; the doc texts also create incidental grams
    # spanning run boundaries only within ONE doc → never cross-source
    assert got[("A", "B")] == 2
    assert got[("A", "C")] == 1
    assert ("A", "D") not in got and ("B", "D") not in got
    assert ("B", "C") not in got


def test_gopher_rules_edges(tmp_path, ray_session):
    """Hand-built docs exercising every rule branch the sf fixture
    can't: bullet lines, ellipsis lines, non-alpha words, stopword
    floor, and the word-count window."""
    long_ok = "the quick brown fox jumps over the lazy dog with vigor " * 5
    docs = [
        (0, long_ok.strip()),                  # passes everything
        (1, "short text"),                     # fails n_words >= 50
        (2, "- one\n- two\n- three\nplain"),   # 3/4 bullet lines (750‰)
        (3, "wait...\nmore...\nok\nok"),       # 2/4 ellipsis lines (500‰)
        (4, "12 34 56 78"),                    # zero alpha words
        (5, ""),                               # empty: 1 "word" of len 0
    ]
    import pyarrow.parquet as pq

    pq.write_table(
        pa.table(
            {"doc_id": pa.array([i for i, _ in docs], pa.int64()),
             "text": pa.array([t for _, t in docs], pa.string())}
        ),
        tmp_path / "documents.parquet",
    )
    t = T.gopher_rules(str(tmp_path))
    import ray.data as rd

    if isinstance(t, rd.Dataset):
        t = pa.Table.from_pandas(t.to_pandas())
    rows = {r["doc_id"]: r for r in t.to_pylist()}
    assert rows[0]["pass"] is True and rows[0]["n_words"] == 55
    assert rows[1]["pass"] is False and rows[1]["n_words"] == 2
    assert rows[2]["bullet_milli"] == 750
    assert rows[3]["ellipsis_milli"] == 500
    assert rows[4]["alpha_word_milli"] == 0 and rows[4]["pass"] is False
    assert rows[5]["n_words"] == 1 and rows[5]["mean_word_milli"] == 0
    assert rows[2]["n_stopwords"] == 0


def test_collocations_empty_and_exactness(ray_session, tmp_path):
    """min_cnt above every pair count → empty with stable schema; a tiny
    hand corpus checks the exact integer lift arithmetic."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from crawl_ray.pipelines import textops as T

    docs = [
        (0, "a b a b a b"),   # pairs: ab×3, ba×2
        (1, "a b c"),          # ab×1, bc×1
    ]
    pq.write_table(
        pa.table(
            {"doc_id": pa.array([i for i, _ in docs], pa.int64()),
             "text": pa.array([t for _, t in docs], pa.string())}
        ),
        tmp_path / "documents.parquet",
    )
    empty = T.collocations(str(tmp_path), min_cnt=100)
    assert empty.num_rows == 0
    assert empty.column_names == ["w1", "w2", "pair_cnt", "lift_milli"]

    out = T.collocations(str(tmp_path), min_cnt=2, k=10)
    rows = {(r["w1"], r["w2"]): r for r in out.to_pylist()}
    # N=9 tokens, c(a)=4, c(b)=4: lift(a,b) = 4*9*1000 // 16 = 2250
    assert rows[("a", "b")]["pair_cnt"] == 4
    assert rows[("a", "b")]["lift_milli"] == 4 * 9 * 1000 // 16
    assert rows[("b", "a")]["pair_cnt"] == 2
    assert rows[("b", "a")]["lift_milli"] == 2 * 9 * 1000 // 16


def test_dsir_weights_favor_target_lang(ray_session):
    """Importance weights must rank target-language docs above the rest
    on average — the resampling signal's defining property."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from crawl_ray.pipelines import textops as T

    sf = "/root/testdata/sf0.01"
    out = T.dsir_weights(sf)
    if hasattr(out, "to_pandas"):
        out = out.to_pandas() if not isinstance(out, pa.Table) else out.to_pandas()
    langs = pq.read_table(f"{sf}/documents.parquet", columns=["doc_id", "lang"]).to_pandas()
    m = out.merge(langs, on="doc_id")
    per_tok = m["dsir_micro"] / m["n_tokens"].clip(lower=1)
    en = per_tok[m["lang"] == "en"].mean()
    rest = per_tok[m["lang"] != "en"].mean()
    assert en > rest, (en, rest)


def test_token_entropy_extremes(ray_session, tmp_path):
    """Uniform docs maximize entropy, constant docs score zero, and the
    integer arithmetic matches the closed form."""
    import math

    import pyarrow as pa
    import pyarrow.parquet as pq

    from crawl_ray.pipelines import textops as T

    docs = [
        (0, "a a a a"),          # constant: ln(4/4)=0 → 0
        (1, "a b c d"),          # uniform: 4 * floor(1e6*ln 4)
        (2, "a a b"),            # 2*floor(1e6*ln(3/2)) + floor(1e6*ln 3)
    ]
    pq.write_table(
        pa.table(
            {"doc_id": pa.array([i for i, _ in docs], pa.int64()),
             "text": pa.array([t for _, t in docs], pa.string())}
        ),
        tmp_path / "documents.parquet",
    )
    out = T.token_entropy(str(tmp_path))
    rows = {r["doc_id"]: r for r in out.to_pandas().to_dict("records")}
    assert rows[0]["entropy_sum_micro"] == 0
    assert rows[1]["entropy_sum_micro"] == 4 * math.floor(1e6 * math.log(4))
    assert rows[2]["entropy_sum_micro"] == (
        2 * math.floor(1e6 * math.log(3 / 2)) + math.floor(1e6 * math.log(3))
    )
    assert rows[1]["n_tokens"] == 4


def test_ccnet_buckets_terciles(ray_session):
    """Value-threshold terciles: per-lang bucket sizes within one tie
    group of n/3, equal scores share a bucket, thresholds monotone."""
    out = T.ccnet_buckets("/root/testdata/sf0.001").to_pandas()
    assert set(out.columns) == {"doc_id", "lang", "avg_nll_milli", "bucket"}
    assert set(out["bucket"]) <= {"head", "middle", "tail"}
    for lang, g in out.groupby("lang"):
        n = len(g)
        counts = g["bucket"].value_counts()
        # head ends at the ceil(n/3)-ranked VALUE: sizes are n/3 up to
        # tie-group slack
        head_max = g.loc[g["bucket"] == "head", "avg_nll_milli"].max()
        rest_min = g.loc[g["bucket"] != "head", "avg_nll_milli"].min()
        if counts.get("head", 0) and (n - counts.get("head", 0)):
            assert head_max < rest_min
        # a value never straddles two buckets
        per_value = g.groupby("avg_nll_milli")["bucket"].nunique()
        assert (per_value == 1).all()
        # at least ceil(n/3) docs in head (threshold rule guarantees it)
        assert counts.get("head", 0) >= (n + 2) // 3 or n < 3


def test_lang_length_regression_exact_negative_intercept(tmp_path, ray_session):
    """Perfect fit y = 10x - 50: slope/intercept recovered exactly, and
    the negative intercept exercises the truncating-division contract
    (DuckDB // truncates toward zero; Python // floors — _tdiv matches
    the former)."""
    xs = [10, 20, 30, 40]
    docs = [" ".join(["w"] * x) for x in xs]  # n_tokens == x, len == 2x-1
    # craft text whose LENGTH is exactly 10x-50: pad with '.' (no spaces)
    texts = []
    for x, d in zip(xs, docs):
        target = 10 * x - 50
        base = " ".join(["w"] * x)  # x tokens, length 2x-1
        texts.append(base + "." * (target - len(base)))
    pq.write_table(
        pa.table(
            {"doc_id": pa.array(range(len(xs)), pa.int64()),
             "text": pa.array(texts, pa.string()),
             "lang": pa.array(["en"] * len(xs), pa.string())}
        ),
        tmp_path / "documents.parquet",
    )
    out = T.lang_length_regression(str(tmp_path)).to_pandas()
    assert len(out) == 1
    assert out.slope_micro[0] == 10_000_000
    assert out.intercept_micro[0] == -50_000_000
    assert out.n_docs[0] == len(xs)


def test_quality_ks_test_planted(tmp_path, ray_session):
    """Source A: all docs score 2000 milli (1-char tokens); source B:
    all score 3000 (2-char tokens) → disjoint CDFs, KS = 1000.  A third
    source identical to A → KS(A, C) = 0."""
    rows = []
    for i in range(10):
        rows.append((i, "a a a a", "A"))          # mean tok len 1 → 2000?
    for i in range(10, 20):
        rows.append((i, "bb bb bb", "B"))
    for i in range(20, 30):
        rows.append((i, "a a a a", "C"))
    pq.write_table(
        pa.table(
            {"doc_id": pa.array([r[0] for r in rows], pa.int64()),
             "text": pa.array([r[1] for r in rows], pa.string()),
             "lang": pa.array(["en"] * len(rows), pa.string()),
             "source": pa.array([r[2] for r in rows], pa.string())}
        ),
        tmp_path / "documents.parquet",
    )
    out = T.quality_ks_test(str(tmp_path)).to_pandas()
    ks = {(r.src_a, r.src_b): r.ks_milli for r in out.itertuples()}
    assert ks[("A", "B")] == 1000
    assert ks[("A", "C")] == 0
    assert ks[("B", "C")] == 1000
    assert set(out.n_a) == {10} and set(out.n_b) == {10}


def test_pii_scrub_planted(tmp_path, ray_session):
    """Email, IP and phone are each redacted with their typed token;
    an IP-shaped string inside an email is consumed by the email
    redaction (sequential stages, no double count); clean text is
    unchanged with zero counts."""
    docs = {
        0: "contact bob.smith+x@mail.example.org for details",
        1: "server at 10.0.255.7 responded",
        2: "call 415-555-0100 or 415 555 0199 today",
        3: "mail root@10.0.0.1.example.com then ping 10.0.0.1",
        4: "plain text with no identifiers at all",
    }
    pq.write_table(
        pa.table({"doc_id": pa.array(sorted(docs), pa.int64()),
                  "text": pa.array([docs[i] for i in sorted(docs)],
                                   pa.string())}),
        tmp_path / "documents.parquet",
    )
    out = T.pii_scrub(str(tmp_path)).to_pandas().set_index("doc_id")
    assert out.loc[0, "text_scrubbed"] == "contact <EMAIL> for details"
    assert (out.loc[0, ["n_emails", "n_ips", "n_phones"]] == [1, 0, 0]).all()
    assert out.loc[1, "text_scrubbed"] == "server at <IP> responded"
    assert (out.loc[1, ["n_emails", "n_ips", "n_phones"]] == [0, 1, 0]).all()
    assert out.loc[2, "text_scrubbed"] == "call <PHONE> or <PHONE> today"
    assert (out.loc[2, ["n_emails", "n_ips", "n_phones"]] == [0, 0, 2]).all()
    # the ip inside the email address is gone before the ip stage;
    # only the standalone ip remains to be redacted
    assert out.loc[3, "text_scrubbed"] == "mail <EMAIL> then ping <IP>"
    assert (out.loc[3, ["n_emails", "n_ips", "n_phones"]] == [1, 1, 0]).all()
    assert out.loc[4, "text_scrubbed"] == docs[4]
    assert (out.loc[4, ["n_emails", "n_ips", "n_phones"]] == [0, 0, 0]).all()


def test_pii_scrub_word_boundary_oracle_parity(tmp_path, ray_session):
    """Digit-adjacent look-alikes ('x1.2.3.4', '9555-123-4567z') must NOT
    be redacted, and the oracle SQL must agree byte-for-byte: both the
    Arrow kernels and the DuckDB oracle anchor IPv4/phone patterns with
    \\b (ADVICE r3 latent-divergence fix)."""
    import duckdb
    from __ray_entry__ import oracle_sql

    docs = {
        0: "x1.2.3.4 is not an ip but 10.0.0.1 is",
        1: "9555-123-4567z is not a phone but 555-123-4567 is",
        2: "version1.2.3.4x and 123-456-78901 stay untouched",
    }
    pq.write_table(
        pa.table({"doc_id": pa.array(sorted(docs), pa.int64()),
                  "text": pa.array([docs[i] for i in sorted(docs)],
                                   pa.string())}),
        tmp_path / "documents.parquet",
    )
    out = T.pii_scrub(str(tmp_path)).to_pandas().set_index("doc_id")
    assert out.loc[0, "text_scrubbed"] == "x1.2.3.4 is not an ip but <IP> is"
    assert out.loc[0, "n_ips"] == 1
    assert (out.loc[1, "text_scrubbed"]
            == "9555-123-4567z is not a phone but <PHONE> is")
    assert out.loc[1, "n_phones"] == 1
    assert out.loc[2, "text_scrubbed"] == docs[2]
    assert (out.loc[2, ["n_emails", "n_ips", "n_phones"]] == 0).all()
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{tmp_path}/documents.parquet')"
    )
    ora = con.execute(oracle_sql()["pii_scrub"]).fetch_df().set_index(
        "doc_id")
    for i in docs:
        assert ora.loc[i, "text_scrubbed"] == out.loc[i, "text_scrubbed"]
        for c in ("n_emails", "n_ips", "n_phones"):
            assert ora.loc[i, c] == out.loc[i, c]


def test_bigram_logprob_truncated_model(ray_session, tmp_path):
    """top_v=1 forces every backoff branch: bigram hit, prefix-miss
    floor, and the prefix-absent full-OOV floor (hand-computed)."""
    import math

    pq.write_table(
        pa.table({"doc_id": pa.array([0, 1], pa.int64()),
                  "text": pa.array(["a b a b a c", "z"], pa.string())}),
        tmp_path / "documents.parquet",
    )
    out = (
        T.bigram_logprob(str(tmp_path), top_v=1)
        .to_pandas().set_index("doc_id").sort_index()
    )
    # model: B = {"a b": 2} (count tie with "b a" broken by key asc),
    # P = {"a": 3} (count tie a=3 beats b=2), TB = 5
    hit = math.floor(-1e6 * math.log(2 / 3))       # (a,b) in B, a in P
    miss = math.floor(-1e6 * math.log(0.5 / 3))    # (a,c): a in P only
    oov = math.floor(-1e6 * math.log(0.5 / 5))     # (b,a): b not in P
    assert out.loc[0, "n_bigrams"] == 5
    assert out.loc[0, "nll2_micro"] == 2 * hit + 2 * oov + miss
    assert out.loc[0, "avg_nll2_milli"] == (2 * hit + 2 * oov + miss) // 5000
    # single-token doc: zero bigrams, zero score
    assert out.loc[1, "n_bigrams"] == 0
    assert out.loc[1, "nll2_micro"] == 0
    assert out.loc[1, "avg_nll2_milli"] == 0


def test_ngram_diversity_per_source(ray_session, tmp_path):
    pq.write_table(
        pa.table({"doc_id": pa.array([0, 1, 2], pa.int64()),
                  "text": pa.array(["a b a b", "a b c", "c"], pa.string()),
                  "source": pa.array(["s1", "s2", "s2"], pa.string())}),
        tmp_path / "documents.parquet",
    )
    out = T.ngram_diversity(str(tmp_path), n=2).to_pandas().set_index("source")
    assert out.loc["s1", "total_ngrams"] == 3       # a b, b a, a b
    assert out.loc["s1", "distinct_ngrams"] == 2
    assert out.loc["s1", "distinct_ppm"] == 2_000_000 // 3
    assert out.loc["s2", "total_ngrams"] == 2       # a b, b c ("c" has none)
    assert out.loc["s2", "distinct_ngrams"] == 2
    assert out.loc["s2", "distinct_ppm"] == 1_000_000
