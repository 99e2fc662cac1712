"""Driver contract for the graft builder (Ray Data target).

Ray is initialised by the driver BEFORE this module is imported: nothing
here (or in the library code) calls ``ray.init()`` / ``ray.shutdown()``.

``queries()`` maps SURVEY.md §2 operators + the training-data operator
suite to callables over ``sf_dir``; ``oracle_sql()`` carries the DuckDB
equivalent for every SQL-expressible query (identical column names —
aggregates are exact integer cents so partial-sum order can't diverge).
Crawl-engine pipelines run over the deterministic synthetic web fixture
(the DuckDB views don't include it); their oracles read the
single-threaded reference simulator's expected parquet via
``read_parquet`` (see ``crawl_ray.oracle_data``), so they get the same
rows+schema+value-hash gate.  Every registered query is oracled —
``hll_distinct_users`` (an approximate sketch) emits its exact count +
±5% acceptance flag, both SQL-reproducible.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

from crawl_ray.pipelines import crawl_queries as CQ
from crawl_ray.pipelines import dedup as DD
from crawl_ray.pipelines import graph as G
from crawl_ray.pipelines import joins as J
from crawl_ray.pipelines import multimodal as MM
from crawl_ray.pipelines import relational as R
from crawl_ray.pipelines import similarity as SIM
from crawl_ray.pipelines import stats as ST
from crawl_ray.pipelines import streams as S
from crawl_ray.pipelines import textops as T
from crawl_ray.sources import export as EX


def entry() -> Any:
    """Flagship pipeline: the full URL-frontier crawl over the synthetic
    web (byte-identical extracted text per url), sized for sf0.001."""
    records = CQ.crawl_flagship("/root/testdata/sf0.001")
    return records.to_pandas()


# The driver's correctness gate walks ``queries()`` in insertion order
# under a time budget, so the crawl-engine flagship family (the queries
# this engine exists for), the dedup/similarity suite, and the core
# text operators are promoted to the front of the returned dict; the
# TPC-H-shape relational/stream/join queries (equally oracled, cheapest
# to re-verify) take the tail.
_DRIVER_PRIORITY = [
    # crawl engine + export roundtrips (SURVEY §2.1-2.4, §2.10)
    "extract_text", "crawl_flagship", "web_corpus_prep",
    "crawl_cookies", "crawl_forms_roundtrip", "forms_extract",
    "anchor_text_index", "link_pagerank", "crawl_depth_histogram",
    "crawl_errors", "crawl_metrics", "crawl_host_stats",
    "crawl_politeness_audit", "recrawl_schedule",
    "corpus_export_manifest", "jsonl_corpus_stats",
    "parquet_export_manifest", "parquet_corpus_stats",
    # dedup family
    "exact_dedup", "minhash_lsh_pairs", "simhash",
    "simhash_hamming_pairs", "ngram_jaccard_pairs", "containment_pairs",
    "dedup_threshold_sweep", "dedup_clusters", "dedup_corpus",
    "incremental_dedup", "embedding_near_dup", "embedding_near_dup_exact",
    # similarity search
    "knn_brute", "knn_ivf", "knn_batch", "knn_graph_stats",
    "threshold_graph_stats", "kmeans_embeddings", "semantic_dedup",
    "cluster_balanced_sample", "label_centroids",
    # core text / training-data operators
    "normalize_whitespace", "token_stats", "quality_score",
    "language_id", "doc_fingerprints", "ngram_counts",
    "benchmark_decontam", "pii_scrub", "gopher_rules",
    "pack_sequences", "training_corpus_prep",
    # multimodal plumbing
    "payload_stats", "decode_images", "decode_audio",
    "resize_images", "sample_frames",
]


def queries() -> dict[str, Callable[[str], Any]]:
    q = _queries_by_family()
    head = {k: q[k] for k in _DRIVER_PRIORITY}
    head.update((k, v) for k, v in q.items() if k not in head)
    return head


def _queries_by_family() -> dict[str, Callable[[str], Any]]:
    return {
        # relational operator mappings (SURVEY.md §2.5-2.8)
        "pricing_summary": R.pricing_summary,
        "revenue_filter": R.revenue_filter,
        "top_orders": R.top_orders,
        "orders_per_nation": R.orders_per_nation,
        "events_by_type": R.events_by_type,
        "events_hourly_window": R.events_hourly_window,
        "top_order_per_segment": R.top_order_per_segment,
        "daily_revenue_running": R.daily_revenue_running,
        # event-stream operators (as-of join, sliding window, sessions)
        "events_asof_join": S.events_asof_join,
        "events_asof_join_bucketed": S.events_asof_join_bucketed,
        "events_sliding_window": S.events_sliding_window,
        "events_rolling_sum": S.events_rolling_sum,
        "events_funnel": S.events_funnel,
        "events_late_data": S.events_late_data,
        "events_lead_lag": S.events_lead_lag,
        "events_gap_stats": S.events_gap_stats,
        "event_transition_matrix": S.event_transition_matrix,
        "sessionize": S.sessionize,
        "sessionize_bucketed": S.sessionize_bucketed,
        "events_window_distinct": S.events_window_distinct,
        # big-big hash joins (native Dataset.join)
        "unshipped_orders": J.unshipped_orders,
        "returned_revenue_by_customer": J.returned_revenue_by_customer,
        "customers_without_urgent_orders": J.customers_without_urgent_orders,
        "events_price_band_join": J.events_price_band_join,
        # iterative graph computation (integer PageRank)
        "supplier_pagerank": G.supplier_pagerank,
        "supplier_bfs_distance": G.supplier_bfs_distance,
        # distributed statistics (exact quantiles / distinct + HLL sketch)
        "events_value_quantiles": ST.events_value_quantiles,
        "value_quantiles_per_type": ST.value_quantiles_per_type,
        "distinct_users_per_type": ST.distinct_users_per_type,
        "hll_distinct_users": ST.hll_distinct_users,
        "quantile_sketch": ST.quantile_sketch,
        "events_pivot": ST.events_pivot,
        "windowed_quantiles": ST.windowed_quantiles,
        # text analysis (training-data ops)
        "normalize_whitespace": T.normalize_whitespace,
        "token_stats": T.token_stats,
        "quality_score": T.quality_score,
        "language_id": T.language_id,
        "langid_confusion": T.langid_confusion,
        "quality_ks_test": T.quality_ks_test,
        "length_histogram": T.length_histogram,
        "source_token_budget": T.source_token_budget,
        "doc_fingerprints": T.fingerprints,
        "sample_documents": T.sample_documents,
        "stratified_sample": T.stratified_sample,
        "ngram_counts": T.ngram_counts,
        "benchmark_decontam": T.benchmark_decontam,
        "oov_rate": T.oov_rate,
        "quality_gate": T.quality_gate,
        "quality_percentile": T.quality_percentile,
        "topk_sketch": T.topk_sketch,
        "events_rollup": ST.events_rollup,
        "events_cube": ST.events_cube,
        "retained_users": ST.retained_users,
        "churned_users": ST.churned_users,
        "top_users_per_type": ST.top_users_per_type,
        "trending_window_topk": ST.trending_window_topk,
        "cohort_retention": ST.cohort_retention,
        "rfm_segments": ST.rfm_segments,
        "orders_with_returns": J.orders_with_returns,
        "promo_revenue_by_month": J.promo_revenue_by_month,
        "regional_revenue": J.regional_revenue,
        "orders_bloom_semi": J.orders_bloom_semi,
        "customer_order_counts": J.customer_order_counts,
        "large_volume_orders": J.large_volume_orders,
        "nations_trade_volume": J.nations_trade_volume,
        "small_quantity_revenue": J.small_quantity_revenue,
        "idle_customer_balance": J.idle_customer_balance,
        "waiting_suppliers": J.waiting_suppliers,
        "top_supplier_revenue": J.top_supplier_revenue,
        "disjunctive_part_revenue": J.disjunctive_part_revenue,
        "market_share": J.market_share,
        "order_priority_check": J.order_priority_check,
        "late_shipment_priority": J.late_shipment_priority,
        "part_type_supplier_counts": J.part_type_supplier_counts,
        "dominant_part_suppliers": J.dominant_part_suppliers,
        "product_profit": J.product_profit,
        "min_cost_supplier": J.min_cost_supplier,
        "important_parts": J.important_parts,
        "referential_orphans": J.referential_orphans,
        "basket_pairs": J.basket_pairs,
        "embedding_moments": SIM.embedding_moments,
        "top_terms_per_doc": T.top_terms_per_doc,
        "redact_terms": T.redact_terms,
        "pii_scrub": T.pii_scrub,
        "pack_sequences": T.pack_sequences,
        "chunk_documents": T.chunk_documents,
        "corpus_mixture": T.corpus_mixture,
        "repetition_stats": T.repetition_stats,
        "unigram_logprob": T.unigram_logprob,
        "bigram_logprob": T.bigram_logprob,
        "ngram_diversity": T.ngram_diversity,
        "ccnet_buckets": T.ccnet_buckets,
        "lang_length_regression": T.lang_length_regression,
        "zipf_fit": T.zipf_fit,
        "tfidf_top_terms": T.tfidf_top_terms,
        "bpe_token_stats": T.bpe_token_stats,
        "training_corpus_prep": T.training_corpus_prep,
        # dedup family
        "exact_dedup": DD.exact_dedup,
        "minhash_lsh_pairs": DD.minhash_lsh_pairs,
        "simhash": DD.simhash_64,
        "simhash_hamming_pairs": DD.simhash_hamming_pairs,
        "ngram_jaccard_pairs": DD.ngram_jaccard_pairs,
        "dedup_threshold_sweep": DD.dedup_threshold_sweep,
        "containment_pairs": DD.containment_pairs,
        "duplicated_ngrams": T.duplicated_ngrams,
        "duplicate_spans": T.duplicate_spans,
        "remove_duplicate_spans": T.remove_duplicate_spans,
        "source_quota_sample": T.source_quota_sample,
        "term_postings": T.term_postings,
        "search_topk": T.search_topk,
        "cross_source_overlap": T.cross_source_overlap,
        "fuzzy_decontam": T.fuzzy_decontam,
        "gopher_rules": T.gopher_rules,
        "collocations": T.collocations,
        "dsir_weights": T.dsir_weights,
        "token_entropy": T.token_entropy,
        "events_mad": ST.events_mad,
        "events_outliers": ST.events_outliers,
        "embedding_near_dup": DD.embedding_near_dup,
        "embedding_near_dup_exact": DD.embedding_near_dup_exact,
        "dedup_clusters": DD.dedup_clusters,
        "dedup_corpus": DD.dedup_corpus,
        "incremental_dedup": DD.incremental_dedup,
        # similarity search
        "knn_brute": SIM.knn_brute,
        "knn_ivf": SIM.knn_ivf,
        "knn_batch": SIM.knn_batch,
        "kmeans_embeddings": SIM.kmeans_embeddings,
        "semantic_dedup": SIM.semantic_dedup,
        "cluster_balanced_sample": SIM.cluster_balanced_sample,
        "label_centroids": SIM.label_centroids,
        "knn_graph_stats": SIM.knn_graph_stats,
        "threshold_graph_stats": SIM.threshold_graph_stats,
        # multimodal plumbing
        "payload_stats": MM.payload_stats,
        "decode_images": MM.decode_images,
        "decode_audio": MM.decode_audio,
        "resize_images": MM.resize_images,
        "sample_frames": MM.sample_frames,
        # crawl engine (synthetic web; oracled against the
        # single-threaded reference simulator / fixture expected columns)
        "extract_text": CQ.extract_text_pipeline,
        "crawl_flagship": CQ.crawl_flagship,
        "web_corpus_prep": CQ.web_corpus_prep,
        "anchor_text_index": CQ.anchor_text_index,
        "link_pagerank": CQ.link_pagerank,
        "crawl_depth_histogram": CQ.crawl_depth_histogram,
        "crawl_errors": CQ.crawl_errors,
        "crawl_metrics": CQ.crawl_metrics,
        "crawl_host_stats": CQ.crawl_host_stats,
        "crawl_politeness_audit": CQ.crawl_politeness_audit,
        "crawl_forms_roundtrip": CQ.crawl_forms_roundtrip,
        "crawl_cookies": CQ.crawl_cookies,
        "forms_extract": CQ.forms_extract,
        "recrawl_schedule": CQ.recrawl_schedule,
        "corpus_export_manifest": EX.corpus_export_manifest,
        "jsonl_corpus_stats": EX.jsonl_corpus_stats,
        "parquet_export_manifest": EX.parquet_export_manifest,
        "parquet_corpus_stats": EX.parquet_corpus_stats,
    }


def _lang_counts_sql() -> tuple[str, str, str]:
    """Build marker-count CTE pieces matching textops.LANG_MARKERS."""
    from crawl_ray.pipelines.textops import LANG_MARKERS

    exprs = []
    for lang, markers in LANG_MARKERS.items():
        terms = " + ".join(
            f"(length(p) - length(replace(p, ' {w} ', ''))) / {len(w) + 2}"
            for w in markers
        )
        exprs.append(f"cast({terms} as bigint) AS score_{lang}")
    score_cols = ", ".join(exprs)
    langs = list(LANG_MARKERS)
    case = "CASE "
    for i, lang in enumerate(langs[:-1]):
        conds = " AND ".join(
            f"score_{lang} >= score_{other}" for other in langs[i + 1 :]
        )
        case += f"WHEN {conds} THEN '{lang}' "
    case += f"ELSE '{langs[-1]}' END"
    greatest = "greatest(" + ", ".join(f"score_{la}" for la in langs) + ")"
    return score_cols, case, greatest


def _shingle_cte_sql(k: int) -> str:
    """Shared shingle CTEs: per-doc DISTINCT k-token shingles (same
    definition as ``dedup._shingle_hashes``; whole-doc shingle when
    fewer than k tokens), their per-doc counts (``sz``), and the
    exploded (doc_id, shingle) rows (``g``) for inverted joins."""
    return rf"""
        WITH t AS (
            SELECT doc_id,
                   regexp_split_to_array(trim(text), '\s+') AS toks
            FROM documents
        ), s AS (
            SELECT doc_id,
                   CASE WHEN len(toks) < {k}
                        THEN [array_to_string(toks, ' ')]
                        ELSE list_distinct(list_transform(
                            range(1, len(toks) - {k - 2}),
                            i -> array_to_string(toks[i:i+{k - 1}], ' ')))
                   END AS sh
            FROM t
        ), sz AS (
            SELECT doc_id, len(sh) AS n FROM s
        ), g AS (
            SELECT doc_id, unnest(sh) AS gr FROM s
        )"""


def _jaccard_pairs_sql(k: int, thr_milli: int) -> str:
    """Exact all-pairs k-token-shingle Jaccard ≥ threshold (the ground
    truth the LSH candidates-then-verify pipeline must reproduce).

    Formulated as an INVERTED self-join on the exploded shingles
    (intersections via one equi-join + GROUP BY; the union size is
    |A| + |B| − |A∩B| since per-doc shingles are distinct) instead of
    the doc×doc cross join with per-pair list ops — the cross join is
    quadratic in documents and blew the 90 s oracle watchdog at sf0.1,
    while this form is Σ df² over shingles (~2.8M rows there).  Pairs
    with an empty intersection never materialize, which is exact for
    every threshold ≥ 1 milli (all uses are ≥ 300)."""
    return rf"""
        {_shingle_cte_sql(k)}, inter AS (
            SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                   cast(count(*) as bigint) AS c
            FROM g a JOIN g b ON a.gr = b.gr AND a.doc_id < b.doc_id
            GROUP BY a.doc_id, b.doc_id
        )
        SELECT doc_a, doc_b,
               cast(i.c * 1000 // (na.n + nb.n - i.c) as bigint)
                   AS jaccard_milli
        FROM inter i
        JOIN sz na ON na.doc_id = i.doc_a
        JOIN sz nb ON nb.doc_id = i.doc_b
        WHERE i.c * 1000 >= {thr_milli} * (na.n + nb.n - i.c)
        ORDER BY doc_a, doc_b
    """


def _dedup_corpus_sql(k: int, thr_milli: int) -> str:
    """Ground truth for ``dedup.dedup_corpus``: exact all-pairs shingle
    Jaccard (same inverted-join formulation as
    :func:`_jaccard_pairs_sql`) → recursive min-label connected
    components → drop every non-min member → surviving corpus rows
    ordered by doc_id."""
    return rf"""
        {_shingle_cte_sql(k)}, inter AS (
            SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                   cast(count(*) as bigint) AS c
            FROM g a JOIN g b ON a.gr = b.gr AND a.doc_id < b.doc_id
            GROUP BY a.doc_id, b.doc_id
        ), p AS (
            SELECT i.doc_a AS va, i.doc_b AS vb
            FROM inter i
            JOIN sz na ON na.doc_id = i.doc_a
            JOIN sz nb ON nb.doc_id = i.doc_b
            WHERE i.c * 1000 >= {thr_milli} * (na.n + nb.n - i.c)
        ), edges AS (
            SELECT va AS src, vb AS dst FROM p
            UNION ALL SELECT vb, va FROM p
        ), reach AS (
            WITH RECURSIVE r(node, label) AS (
                SELECT DISTINCT src, src FROM edges
                UNION
                SELECT e.dst, r.label
                FROM r JOIN edges e ON r.node = e.src
            )
            SELECT node, min(label) AS lab FROM r GROUP BY node
        )
        SELECT doc_id, lang, text FROM documents
        WHERE doc_id NOT IN (SELECT node FROM reach WHERE lab < node)
        ORDER BY doc_id
    """


def _pagerank_sql(iterations: int = 3, k: int = 20) -> str:
    """Unrolled-CTE oracle for ``graph.supplier_pagerank``: identical
    integer micro-unit arithmetic (contrib = rank // outdeg, new =
    150000 + (850·Σ) // 1000), one CTE pair per iteration."""
    sql = """
        WITH pairs AS (
            SELECT DISTINCT l_partkey AS p, l_suppkey + 10000000000000 AS s
            FROM lineitem
        ),
        edges AS (
            SELECT p AS src, s AS dst FROM pairs
            UNION SELECT s, p FROM pairs
        ),
        outdeg AS (SELECT src, count(*) AS outdeg FROM edges GROUP BY src),
        nodes AS (SELECT src AS node FROM outdeg),
        r0 AS (SELECT node, cast(1000000 as bigint) AS rank FROM nodes)"""
    for i in range(1, iterations + 1):
        sql += f""",
        c{i} AS (
            SELECT e.dst AS node, sum(r.rank // d.outdeg) AS c
            FROM edges e
            JOIN r{i - 1} r ON r.node = e.src
            JOIN outdeg d ON d.src = e.src
            GROUP BY e.dst
        ),
        r{i} AS (
            SELECT n.node,
                   150000 + (850 * coalesce(c.c, 0)) // 1000 AS rank
            FROM nodes n LEFT JOIN c{i} c ON c.node = n.node
        )"""
    sql += f"""
        SELECT node, node >= 10000000000000 AS is_supplier,
               cast(rank as bigint) AS rank_micro
        FROM r{iterations}
        ORDER BY rank DESC, node LIMIT {k}
    """
    return sql


def _kmeans_cte(k: int = 8, iterations: int = 3) -> str:
    """Unrolled-CTE oracle for ``similarity.kmeans_embeddings``:
    identical exact-integer arithmetic (milli-quantized vectors, int
    squared-L2, ties → lowest centroid, update = floor(sum/count),
    empty cluster keeps its centroid), one assign/update CTE pair per
    iteration in long (vec_id, dim, val) format."""
    sql = f"""
        WITH q AS (
            SELECT vec_id,
                   list_transform(embedding,
                       x -> cast(round(cast(x as double) * 1000) as bigint)) AS v
            FROM embeddings
        ),
        vl AS (
            SELECT vec_id,
                   unnest(range(1, len(v) + 1)) AS dim,
                   unnest(v) AS val
            FROM q
        ),
        seeds AS (
            SELECT row_number() OVER (ORDER BY vec_id) - 1 AS c, v
            FROM (SELECT vec_id, v FROM q ORDER BY vec_id LIMIT {k})
        ),
        c0l AS (
            SELECT c, unnest(range(1, len(v) + 1)) AS dim, unnest(v) AS val
            FROM seeds
        )"""
    for i in range(1, iterations + 1):
        sql += f""",
        d{i} AS (
            SELECT vl.vec_id, cl.c,
                   sum((vl.val - cl.val) * (vl.val - cl.val)) AS dist
            FROM vl JOIN c{i - 1}l cl ON vl.dim = cl.dim
            GROUP BY vl.vec_id, cl.c
        ),
        a{i} AS (
            SELECT vec_id, c,
                   row_number() OVER (
                       PARTITION BY vec_id ORDER BY dist, c) AS rn
            FROM d{i}
        ),
        s{i} AS (
            SELECT a.c, vl.dim, sum(vl.val) AS s, count(*) AS n
            FROM a{i} a JOIN vl ON vl.vec_id = a.vec_id
            WHERE a.rn = 1
            GROUP BY a.c, vl.dim
        ),
        c{i}l AS (
            SELECT p.c, p.dim,
                   coalesce(cast(floor(cast(s.s as double) / s.n) as bigint),
                            p.val) AS val
            FROM c{i - 1}l p
            LEFT JOIN s{i} s ON s.c = p.c AND s.dim = p.dim
        )"""
    sql += f""",
        df AS (
            SELECT vl.vec_id, cl.c,
                   sum((vl.val - cl.val) * (vl.val - cl.val)) AS dist
            FROM vl JOIN c{iterations}l cl ON vl.dim = cl.dim
            GROUP BY vl.vec_id, cl.c
        ),
        fin AS (
            SELECT vec_id, c, dist
            FROM (
                SELECT vec_id, c, dist,
                       row_number() OVER (
                           PARTITION BY vec_id ORDER BY dist, c) AS rn
                FROM df
            )
            WHERE rn = 1
        )"""
    return sql


def _kmeans_sql(k: int = 8, iterations: int = 3) -> str:
    return _kmeans_cte(k, iterations) + """
        SELECT vec_id, cast(c as bigint) AS cluster,
               cast(dist as bigint) AS dist_q
        FROM fin ORDER BY vec_id
    """


def _semantic_dedup_sql(
    k: int = 8, iterations: int = 3, thr_q: int = 1_200_000
) -> str:
    """SemDeDup oracle: the k-means CTE chain, then within-cluster
    pairs (long-format dim join) — a vector is kept iff no
    smaller-vec_id same-cluster vector sits within ``thr_q``."""
    return _kmeans_cte(k, iterations) + f""",
        dd AS (
            SELECT b.vec_id AS vid
            FROM fin a
            JOIN fin b ON a.c = b.c AND a.vec_id < b.vec_id
            JOIN vl x ON x.vec_id = a.vec_id
            JOIN vl y ON y.vec_id = b.vec_id AND y.dim = x.dim
            GROUP BY a.vec_id, b.vec_id
            HAVING sum((x.val - y.val) * (x.val - y.val)) <= {thr_q}
        )
        SELECT f.vec_id, cast(f.c as bigint) AS cluster,
               (d.vid IS NULL) AS kept
        FROM fin f
        LEFT JOIN (SELECT DISTINCT vid FROM dd) d ON d.vid = f.vec_id
        ORDER BY f.vec_id
    """


def _crawl_oracle_sql() -> dict[str, str]:
    """Oracles for the crawl-engine queries: the expected side is the
    single-threaded reference simulator (independent orchestration) and
    the fixture's template-built expected columns (independent
    extraction), materialized to parquet and read via ``read_parquet``.
    Calling this ensures the expected tables exist (cached)."""
    from crawl_ray import oracle_data as OD
    from crawl_ray.fixtures import fixture_dir
    from crawl_ray.pipelines.crawl_queries import forms_fixture_path

    n = 2000  # the driver's correctness gate runs at sf=0.01
    web = OD.expected_flagship_dir(n)
    formweb = OD.expected_forms_dir(40)
    cookieweb = OD.expected_cookies_dir(24)
    pages = f"{fixture_dir(n)}/pages.parquet"
    forms_fx = forms_fixture_path()
    metric_cols = ", ".join(OD.METRIC_COLS)
    return {
        # engine DOM extraction vs the template-CONSTRUCTED text column
        # (never produced by an extractor — non-circular, FIXTURES.md)
        "extract_text": f"""
            SELECT url, text, true AS text_ok
            FROM read_parquet('{pages}') ORDER BY url
        """,
        "crawl_flagship": f"""
            SELECT url, depth, fields
            FROM read_parquet('{web}/records.parquet')
            ORDER BY url, fields
        """,
        # end-to-end corpus prep over the page store: extract (text
        # column is template-built, byte-identical to the DOM kernel) →
        # token filter → exact-text dedup keep-first-url
        "web_corpus_prep": f"""
            WITH t AS (
                SELECT url, text,
                       cast(len(regexp_split_to_array(trim(text), '\\s+'))
                            as bigint) AS n_tokens
                FROM read_parquet('{pages}')
            ), f AS (
                SELECT * FROM t WHERE n_tokens >= 20
            ), d AS (
                SELECT url, n_tokens,
                       row_number() OVER (PARTITION BY text ORDER BY url)
                           AS rn,
                       count(*) OVER (PARTITION BY text) AS n_dups
                FROM f
            )
            SELECT url, n_tokens, cast(n_dups as bigint) AS n_dups
            FROM d WHERE rn = 1 ORDER BY url
        """,
        # anchor-text index: the fixture's links are template-regular, so
        # href/anchor extraction is regex-expressible in SQL; relative
        # hrefs (always host-rooted "/p/k") resolve against the source
        # host, matching urljoin on these shapes
        "anchor_text_index": f"""
            WITH raw AS (
                SELECT url,
                       unnest(regexp_extract_all(decode(html),
                           '<a href="([^"]*)">([^<]*)</a>', 1)) AS href,
                       unnest(regexp_extract_all(decode(html),
                           '<a href="([^"]*)">([^<]*)</a>', 2)) AS anchor
                FROM read_parquet('{pages}')
            ), links AS (
                SELECT split_part(url, '/', 3) AS src_host,
                       CASE WHEN href LIKE 'http%'
                            THEN href
                            ELSE 'http://' || split_part(url, '/', 3) || href
                       END AS target,
                       anchor
                FROM raw
            ), agg AS (
                SELECT target, anchor, src_host,
                       cast(count(*) as bigint) AS cnt
                FROM links GROUP BY target, anchor, src_host
            ), per_t AS (
                SELECT target, cast(sum(cnt) as bigint) AS n_inlinks,
                       cast(count(DISTINCT src_host) as bigint) AS n_src_hosts
                FROM agg GROUP BY target
            ), ta AS (
                SELECT target, anchor, cast(sum(cnt) as bigint) AS acnt
                FROM agg GROUP BY target, anchor
            ), top AS (
                SELECT target, anchor AS top_anchor, acnt AS top_anchor_cnt,
                       row_number() OVER (
                           PARTITION BY target ORDER BY acnt DESC, anchor
                       ) AS rn
                FROM ta
            )
            SELECT p.target, p.n_inlinks, p.n_src_hosts,
                   t.top_anchor, t.top_anchor_cnt
            FROM per_t p JOIN top t ON p.target = t.target AND t.rn = 1
            ORDER BY p.target
        """,
        # directed integer PageRank over the link graph: links are
        # regex-extractable from the template-regular fixture HTML
        # (same raw/links CTEs as anchor_text_index), iterations
        # unrolled with the identical truncating micro-unit arithmetic
        "link_pagerank": f"""
            WITH raw AS (
                SELECT url,
                       unnest(regexp_extract_all(decode(html),
                           '<a href="([^"]*)">', 1)) AS href
                FROM read_parquet('{pages}')
            ), links AS (
                SELECT DISTINCT url AS src,
                       CASE WHEN href LIKE 'http%'
                            THEN href
                            ELSE 'http://' || split_part(url, '/', 3) || href
                       END AS dst
                FROM raw
            ), nodes AS (
                SELECT src AS node FROM links
                UNION
                SELECT dst FROM links
            ), deg AS (
                SELECT src, cast(count(*) as bigint) AS outdeg
                FROM links GROUP BY src
            ), r0 AS (
                SELECT node, cast(1000000 as bigint) AS rank FROM nodes
            ), it1 AS (
                SELECT n.node,
                       cast(150000 + (850 * coalesce(s.c, 0)) // 1000
                            as bigint) AS rank
                FROM nodes n LEFT JOIN (
                    SELECT l.dst AS node,
                           cast(sum(r.rank // d.outdeg) as bigint) AS c
                    FROM links l
                    JOIN deg d ON l.src = d.src
                    JOIN r0 r ON l.src = r.node
                    GROUP BY l.dst
                ) s ON n.node = s.node
            ), it2 AS (
                SELECT n.node,
                       cast(150000 + (850 * coalesce(s.c, 0)) // 1000
                            as bigint) AS rank
                FROM nodes n LEFT JOIN (
                    SELECT l.dst AS node,
                           cast(sum(r.rank // d.outdeg) as bigint) AS c
                    FROM links l
                    JOIN deg d ON l.src = d.src
                    JOIN it1 r ON l.src = r.node
                    GROUP BY l.dst
                ) s ON n.node = s.node
            ), it3 AS (
                SELECT n.node,
                       cast(150000 + (850 * coalesce(s.c, 0)) // 1000
                            as bigint) AS rank
                FROM nodes n LEFT JOIN (
                    SELECT l.dst AS node,
                           cast(sum(r.rank // d.outdeg) as bigint) AS c
                    FROM links l
                    JOIN deg d ON l.src = d.src
                    JOIN it2 r ON l.src = r.node
                    GROUP BY l.dst
                ) s ON n.node = s.node
            )
            SELECT node AS url, rank AS rank_micro FROM it3
            ORDER BY rank DESC, url LIMIT 20
        """,
        "crawl_errors": f"""
            SELECT error_kind, url
            FROM read_parquet('{web}/errors.parquet')
            ORDER BY error_kind, url
        """,
        "crawl_depth_histogram": f"""
            SELECT cast(depth as bigint) AS depth,
                   cast(count(*) as bigint) AS n_records
            FROM read_parquet('{web}/records.parquet')
            GROUP BY depth ORDER BY depth
        """,
        "crawl_metrics": f"""
            SELECT {metric_cols}
            FROM read_parquet('{web}/metrics.parquet') ORDER BY round
        """,
        "crawl_host_stats": f"""
            SELECT split_part(url, '/', 3) AS host,
                   count(*) AS n_fetched,
                   cast(min(round) as bigint) AS first_round
            FROM read_parquet('{web}/trace.parquet')
            GROUP BY host ORDER BY host
        """,
        # per-host politeness audit: peak per-round rate + activity span
        "crawl_politeness_audit": f"""
            WITH pr AS (
                SELECT split_part(url, '/', 3) AS host, round,
                       cast(count(*) as bigint) AS c
                FROM read_parquet('{web}/trace.parquet')
                GROUP BY host, round
            )
            SELECT host, cast(sum(c) as bigint) AS n_fetched,
                   cast(max(c) as bigint) AS peak_round_fetches,
                   cast(count(*) as bigint) AS n_rounds_active
            FROM pr GROUP BY host ORDER BY host
        """,
        "crawl_forms_roundtrip": f"""
            SELECT url, depth, fields
            FROM read_parquet('{formweb}/records.parquet')
            ORDER BY url, fields
        """,
        "crawl_cookies": f"""
            SELECT url, depth, fields
            FROM read_parquet('{cookieweb}/records.parquet')
            ORDER BY url, fields
        """,
        # recrawl wave: k stalest URLs per host from the page store
        "recrawl_schedule": f"""
            SELECT host, url, warc_ts_us, rnk FROM (
                SELECT split_part(url, '/', 3) AS host, url,
                       epoch_us(warc_ts) AS warc_ts_us,
                       cast(row_number() OVER (
                           PARTITION BY split_part(url, '/', 3)
                           ORDER BY warc_ts, url
                       ) as bigint) AS rnk
                FROM read_parquet('{pages}')
            ) WHERE rnk <= 5 ORDER BY host, rnk
        """,
        # F10 scrape vs the fixture's expected action/values columns
        "forms_extract": f"""
            SELECT doc_id,
                   expect_action AS action,
                   array_to_string(
                       list_transform(
                           expect_values,
                           s -> struct_extract(s, 'key') || '=' ||
                                array_to_string(struct_extract(s, 'vals'), ',')
                       ), ';') AS values,
                   true AS forms_ok
            FROM read_parquet('{forms_fx}') ORDER BY doc_id
        """,
    }


# shared by the "simhash" oracle and the simhash_hamming_pairs
# self-join (which re-derives every fingerprint in SQL first)
_SIMHASH_SQL = r"""
    WITH t AS (
        SELECT doc_id,
               list_transform(
                   regexp_split_to_array(trim(text), '\s+'),
                   tk -> substr(md5(tk), 1, 16)
               ) AS th
        FROM documents
    ), v AS (
        SELECT doc_id, len(th) AS n,
               list_transform(range(0, 64), b ->
                   list_sum(list_transform(th, h ->
                       ((strpos('0123456789abcdef',
                                substr(h, (b // 4) + 1, 1)) - 1)
                        >> (3 - (b % 4))) & 1))
               ) AS votes
        FROM t
    )
    SELECT doc_id,
           array_to_string(list_transform(range(0, 16), j ->
               substr('0123456789abcdef',
                      1 + (CASE WHEN 2 * votes[4*j+1] > n THEN 8 ELSE 0 END)
                        + (CASE WHEN 2 * votes[4*j+2] > n THEN 4 ELSE 0 END)
                        + (CASE WHEN 2 * votes[4*j+3] > n THEN 2 ELSE 0 END)
                        + (CASE WHEN 2 * votes[4*j+4] > n THEN 1 ELSE 0 END),
                      1)), '') AS simhash_hex
    FROM v
"""


def oracle_sql() -> dict[str, str]:
    score_cols, lang_case, lang_greatest = _lang_counts_sql()
    out = _crawl_oracle_sql()
    out.update({
        "pricing_summary": """
            SELECT l_returnflag, l_linestatus,
                   cast(sum(cast(round(l_quantity * 100) as bigint)) as bigint) AS sum_qty_cents,
                   cast(sum(cast(round(l_extendedprice * 100) as bigint)) as bigint) AS sum_base_price_cents,
                   cast(sum(cast(round(l_discount * 100) as bigint)) as bigint) AS sum_disc_cents,
                   count(*) AS count_order
            FROM lineitem
            GROUP BY l_returnflag, l_linestatus
            ORDER BY l_returnflag, l_linestatus
        """,
        "revenue_filter": """
            SELECT cast(coalesce(sum(cast(round(l_extendedprice * l_discount * 100) as bigint)), 0) as bigint)
                       AS revenue_cents,
                   count(*) AS n_rows
            FROM lineitem
            WHERE l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24
        """,
        "top_orders": """
            SELECT o_orderkey,
                   cast(round(o_totalprice * 100) as bigint) AS total_cents
            FROM orders
            ORDER BY o_totalprice DESC, o_orderkey
            LIMIT 10
        """,
        "orders_per_nation": """
            SELECT n_name,
                   cast(sum(cast(round(o_totalprice * 100) as bigint)) as bigint) AS revenue_cents,
                   count(*) AS n_orders
            FROM orders
            JOIN customer ON o_custkey = c_custkey
            JOIN nation ON c_nationkey = n_nationkey
            GROUP BY n_name ORDER BY n_name
        """,
        "events_by_type": """
            SELECT event_type,
                   cast(sum(cast(round(value * 100) as bigint)) as bigint) AS sum_value_cents,
                   count(*) AS n_events
            FROM events GROUP BY event_type ORDER BY event_type
        """,
        "events_hourly_window": """
            SELECT event_type,
                   (epoch_us(ts) // 3600000000) * 3600000000 AS window_start,
                   cast(sum(cast(round(value * 100) as bigint)) as bigint) AS sum_value_cents,
                   count(*) AS n_events
            FROM events GROUP BY 1, 2 ORDER BY 1, 2
        """,
        # as-of join: latest prior click per purchase, per user; ties
        # on ts break to the highest event_id on both sides
        "events_asof_join": """
            SELECT p.event_id AS purchase_id, p.user_id,
                   epoch_us(p.ts) AS purchase_ts_us,
                   c.event_id AS click_id, epoch_us(c.ts) AS click_ts_us,
                   epoch_us(p.ts) - epoch_us(c.ts) AS gap_us
            FROM events p, LATERAL (
                SELECT event_id, ts FROM events c
                WHERE c.user_id = p.user_id AND c.event_type = 'click'
                      AND c.ts <= p.ts
                ORDER BY c.ts DESC, c.event_id DESC LIMIT 1
            ) c
            WHERE p.event_type = 'purchase'
            ORDER BY purchase_id
        """,
        # sliding 6h windows every 2h: each event covers exactly
        # size/slide = 3 window starts (us//slide - k)*slide, k in 0..2
        "events_sliding_window": """
            WITH e AS (
                SELECT event_type, epoch_us(ts) AS us,
                       cast(round(value * 100) as bigint) AS cents
                FROM events
            )
            SELECT event_type,
                   ((us // 7200000000) - k) * 7200000000 AS window_start,
                   cast(sum(cents) as bigint) AS sum_value_cents,
                   count(*) AS n_events
            FROM e, range(0, 3) t(k)
            GROUP BY 1, 2 ORDER BY 1, 2
        """,
        # exact windowed COUNT(DISTINCT): same 6h/2h covering-window
        # explode, distinct users per window
        "events_window_distinct": """
            WITH e AS (
                SELECT epoch_us(ts) AS us, user_id FROM events
            )
            SELECT ((us // 7200000000) - k) * 7200000000 AS window_start,
                   cast(count(DISTINCT user_id) as bigint) AS n_users
            FROM e, range(0, 3) t(k)
            GROUP BY 1 ORDER BY 1
        """,
        # row-level window function: rolling 3-row sum per user
        # offset window function: LAG with coalesce-to-0 per user
        "events_lead_lag": """
            SELECT event_id, user_id, epoch_us(ts) AS ts_us,
                   cast(round(value * 100) as bigint) AS cents,
                   cast(coalesce(lag(cast(round(value * 100) as bigint))
                       OVER (PARTITION BY user_id ORDER BY ts, event_id),
                       0) as bigint) AS prev_cents
            FROM events ORDER BY event_id
        """,
        "events_rolling_sum": """
            SELECT event_id, user_id, epoch_us(ts) AS ts_us,
                   cast(sum(cast(round(value * 100) as bigint)) OVER (
                        PARTITION BY user_id ORDER BY epoch_us(ts), event_id
                        ROWS BETWEEN 2 PRECEDING AND CURRENT ROW
                   ) as bigint) AS rolling_sum_cents
            FROM events ORDER BY event_id
        """,
        # 30-min-gap sessionization per user
        "sessionize": """
            WITH e AS (
                SELECT user_id, event_id, epoch_us(ts) AS us,
                       cast(round(value * 100) as bigint) AS cents
                FROM events
            ), m AS (
                SELECT *, CASE WHEN lag(us) OVER w IS NULL
                                    OR us - lag(us) OVER w > 1800000000
                               THEN 1 ELSE 0 END AS new_sess
                FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)
            ), s AS (
                SELECT *, sum(new_sess) OVER (
                              PARTITION BY user_id ORDER BY us, event_id
                              ROWS UNBOUNDED PRECEDING) AS sess_no
                FROM m
            )
            SELECT user_id, cast(sess_no - 1 as bigint) AS session_idx,
                   count(*) AS n_events,
                   cast(min(us) as bigint) AS start_us,
                   cast(max(us) as bigint) AS end_us,
                   cast(max(us) - min(us) as bigint) AS duration_us,
                   cast(sum(cents) as bigint) AS sum_value_cents
            FROM s GROUP BY user_id, sess_no ORDER BY user_id, session_idx
        """,
        # big-big hash join shapes; revenue in exact integer centi-cents
        "unshipped_orders": """
            SELECT l.l_orderkey AS o_orderkey,
                   epoch_us(o.o_orderdate) AS o_orderdate_us,
                   o.o_orderpriority,
                   cast(sum(cast(round(l.l_extendedprice * 100) as bigint)
                            * (100 - cast(round(l.l_discount * 100) as bigint)))
                        as bigint) AS revenue_cc
            FROM lineitem l
            JOIN orders o ON l.l_orderkey = o.o_orderkey
            JOIN customer c ON o.o_custkey = c.c_custkey
            WHERE c.c_mktsegment = 'BUILDING'
              AND epoch_us(o.o_orderdate) < 900288000000000
              AND epoch_us(l.l_shipdate) > 900288000000000
            GROUP BY 1, 2, 3
            ORDER BY revenue_cc DESC, o_orderkey LIMIT 10
        """,
        "returned_revenue_by_customer": """
            SELECT c.c_custkey, c.c_name,
                   cast(sum(cast(round(l.l_extendedprice * 100) as bigint)
                            * (100 - cast(round(l.l_discount * 100) as bigint)))
                        as bigint) AS revenue_cc
            FROM lineitem l
            JOIN orders o ON l.l_orderkey = o.o_orderkey
            JOIN customer c ON o.o_custkey = c.c_custkey
            WHERE l.l_returnflag = 'R'
            GROUP BY 1, 2
            ORDER BY revenue_cc DESC, c_custkey LIMIT 20
        """,
        # grouped top-k by exact sums (QUALIFY rank over summed cents)
        "top_users_per_type": """
            SELECT event_type, user_id,
                   cast(sum(cast(round(value * 100) as bigint)) as bigint)
                       AS cents
            FROM events
            GROUP BY 1, 2
            QUALIFY row_number() OVER (
                PARTITION BY event_type
                ORDER BY cents DESC, user_id ASC
            ) <= 3
        """,
        # RFM segmentation: recency/frequency/monetary vs exact medians
        "rfm_segments": """
            WITH u AS (
                SELECT user_id,
                       ((SELECT max(epoch_us(ts)) FROM events)
                        - max(epoch_us(ts))) // 86400000000 AS r_days,
                       cast(count(*) as bigint) AS f,
                       cast(sum(cast(round(value * 100) as bigint))
                            as bigint) AS m_cents
                FROM events GROUP BY user_id
            ), med AS (
                SELECT quantile_disc(r_days, 0.50) AS rm,
                       quantile_disc(f, 0.50) AS fm,
                       quantile_disc(m_cents, 0.50) AS mm
                FROM u
            )
            SELECT 'R' || cast(cast(u.r_days <= med.rm as int) as varchar)
                   || 'F' || cast(cast(u.f > med.fm as int) as varchar)
                   || 'M' || cast(cast(u.m_cents > med.mm as int)
                                  as varchar) AS segment,
                   cast(count(*) as bigint) AS n_users
            FROM u CROSS JOIN med
            GROUP BY 1 ORDER BY 1
        """,
        # cohort retention triangle: first-activity week x weeks-later
        "cohort_retention": """
            WITH a AS (
                SELECT user_id,
                       epoch_us(ts) // 604800000000 AS week
                FROM events GROUP BY 1, 2
            ), f AS (
                SELECT user_id, min(week) AS cohort FROM a GROUP BY 1
            )
            SELECT cast(f.cohort AS BIGINT) AS cohort_week,
                   cast(a.week - f.cohort AS BIGINT) AS week_offset,
                   cast(count(*) AS BIGINT) AS n_users
            FROM a JOIN f USING (user_id)
            GROUP BY 1, 2 ORDER BY 1, 2
        """,
        # per-hour trending top-k users by exact value total
        "trending_window_topk": """
            SELECT (epoch_us(ts) // 3600000000) * 3600000000
                       AS window_start,
                   user_id,
                   cast(sum(cast(round(value * 100) as bigint)) as bigint)
                       AS cents
            FROM events
            GROUP BY 1, 2
            QUALIFY row_number() OVER (
                PARTITION BY window_start
                ORDER BY cents DESC, user_id ASC
            ) <= 3
        """,
        # grouped mean-vector partials in exact int64 micro-units
        "label_centroids": """
            SELECT cast(label as bigint) AS label, i AS dim,
                   cast(sum(cast(round(cast(embedding[i] as double)
                                       * 1000000) as bigint)) as bigint)
                       AS sum_micro,
                   cast(count(*) as bigint) AS n_vecs
            FROM embeddings, range(1, 65) r(i)
            GROUP BY 1, 2 ORDER BY 1, 2
        """,
        # kNN-graph topology: top-10 by milli-cosine (ties by id), union
        # of directions, wedge self-join + closure join.  Cosine runs
        # over micro-quantized integer embeddings — dot/norms are exact
        # integers < 2^53, so this expression is bit-identical to the
        # engine's float64 evaluation at every scale (no
        # summation-order ulps).
        "knn_graph_stats": """
            WITH q AS (
                SELECT vec_id,
                       list_transform(embedding,
                           x -> round(cast(x as double) * 1000000)) AS qe
                FROM embeddings
            ), nrm AS (
                SELECT vec_id, qe,
                       sqrt(list_dot_product(qe, qe)) AS nv
                FROM q
            ), m AS (
                SELECT a.vec_id AS u, b.vec_id AS v,
                       cast(round(1000.0 * list_dot_product(a.qe, b.qe)
                                  / (a.nv * b.nv)) as bigint) AS c
                FROM nrm a JOIN nrm b
                     ON a.vec_id <> b.vec_id
            ), r AS (
                SELECT u, v,
                       row_number() OVER (PARTITION BY u
                                          ORDER BY c DESC, v) AS rk
                FROM m
            ), e AS (
                SELECT DISTINCT least(u, v) AS u, greatest(u, v) AS v
                FROM r WHERE rk <= 10
            ), w AS (
                SELECT e1.u AS a, e2.v AS c
                FROM e e1 JOIN e e2 ON e1.v = e2.u
            ), t AS (
                SELECT count(*) AS n_tri
                FROM w JOIN e e3 ON e3.u = w.a AND e3.v = w.c
            )
            SELECT (SELECT cast(count(*) as bigint) FROM embeddings)
                       AS n_nodes,
                   (SELECT cast(count(*) as bigint) FROM e) AS n_edges,
                   (SELECT cast(count(*) as bigint) FROM w) AS n_wedges,
                   (SELECT cast(n_tri as bigint) FROM t) AS n_triangles,
                   cast(CASE WHEN (SELECT count(*) FROM w) = 0 THEN 0
                        ELSE (SELECT n_tri FROM t) * 1000
                             // (SELECT count(*) FROM w) END as bigint)
                       AS transitivity_milli
        """,
        # threshold similarity graph (cos >= 450 milli over the SAME
        # augmented corpus embedding_near_dup scans): same triangle
        # plan, n_nodes = endpoints with >= 1 edge
        "threshold_graph_stats": """
            WITH aug AS (
                SELECT vec_id, embedding FROM embeddings
                UNION ALL
                SELECT vec_id + 1000000,
                       list_concat([0.0::DOUBLE], embedding[2:])
                FROM embeddings
            ), e AS (
                SELECT a.vec_id AS u, b.vec_id AS v
                FROM aug a JOIN aug b ON a.vec_id < b.vec_id
                WHERE cast(round(list_cosine_similarity(
                          a.embedding, b.embedding) * 1000) as bigint) >= 450
            ), w AS (
                SELECT e1.u AS a, e2.v AS c
                FROM e e1 JOIN e e2 ON e1.v = e2.u
            ), t AS (
                SELECT count(*) AS n_tri
                FROM w JOIN e e3 ON e3.u = w.a AND e3.v = w.c
            ), nn AS (
                SELECT count(DISTINCT x) AS n FROM (
                    SELECT u AS x FROM e UNION ALL SELECT v AS x FROM e
                )
            )
            SELECT (SELECT cast(n as bigint) FROM nn) AS n_nodes,
                   (SELECT cast(count(*) as bigint) FROM e) AS n_edges,
                   (SELECT cast(count(*) as bigint) FROM w) AS n_wedges,
                   (SELECT cast(n_tri as bigint) FROM t) AS n_triangles,
                   cast(CASE WHEN (SELECT count(*) FROM w) = 0 THEN 0
                        ELSE (SELECT n_tri FROM t) * 1000
                             // (SELECT count(*) FROM w) END as bigint)
                       AS transitivity_milli
        """,
        "supplier_pagerank": _pagerank_sql(),
        # BFS distance levels from the min-supplier seed over the same
        # bidirected part↔supplier graph, unrolled to 3 hops
        "supplier_bfs_distance": """
            WITH e AS (
                SELECT DISTINCT l_partkey AS p,
                       l_suppkey + 10000000000000 AS s
                FROM lineitem
            ), edges AS (
                SELECT p AS src, s AS dst FROM e
                UNION
                SELECT s, p FROM e
            ), d0 AS (
                SELECT min(s_suppkey) + 10000000000000 AS node FROM supplier
            ), d1 AS (
                SELECT DISTINCT dst AS node FROM edges
                WHERE src IN (SELECT node FROM d0)
                  AND dst NOT IN (SELECT node FROM d0)
            ), d2 AS (
                SELECT DISTINCT dst AS node FROM edges
                WHERE src IN (SELECT node FROM d1)
                  AND dst NOT IN (SELECT node FROM d0
                                  UNION SELECT node FROM d1)
            ), d3 AS (
                SELECT DISTINCT dst AS node FROM edges
                WHERE src IN (SELECT node FROM d2)
                  AND dst NOT IN (SELECT node FROM d0
                                  UNION SELECT node FROM d1
                                  UNION SELECT node FROM d2)
            ), lv AS (
                SELECT node, 0 AS dist FROM d0
                UNION ALL SELECT node, 1 FROM d1
                UNION ALL SELECT node, 2 FROM d2
                UNION ALL SELECT node, 3 FROM d3
            )
            SELECT dist,
                   cast(count(*) as bigint) AS n_nodes,
                   cast(sum(CASE WHEN node >= 10000000000000 THEN 1 ELSE 0 END)
                        as bigint) AS n_suppliers
            FROM lv GROUP BY 1 ORDER BY 1
        """,
        "kmeans_embeddings": _kmeans_sql(),
        "semantic_dedup": _semantic_dedup_sql(),
        "cluster_balanced_sample": _kmeans_cte() + """
            SELECT vec_id, cast(c as bigint) AS cluster,
                   cast(rk as bigint) AS rk
            FROM (
                SELECT vec_id, c,
                       row_number() OVER (
                           PARTITION BY c
                           ORDER BY (vec_id * 2654435761) % 4294967296,
                                    vec_id) AS rk
                FROM fin
            ) WHERE rk <= 20 ORDER BY cluster, rk
        """,
        # distributed anti-join (native left_anti hash join)
        "customers_without_urgent_orders": """
            SELECT c_custkey, c_name,
                   cast(round(c_acctbal * 100) as bigint) AS acctbal_cents
            FROM customer
            WHERE c_custkey NOT IN (
                SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT')
            ORDER BY c_custkey
        """,
        # broadcast range join: bin events into value bands by interval
        # containment, then aggregate per band
        "events_price_band_join": """
            WITH bands(band, lo, hi) AS (
                VALUES ('b0_micro', 0, 1000), ('b1_small', 1000, 5000),
                       ('b2_medium', 5000, 15000), ('b3_large', 15000, 40000),
                       ('b4_xlarge', 40000, 1152921504606846976)
            ), e AS (
                SELECT cast(round(value * 100) as bigint) AS cents FROM events
            )
            SELECT b.band,
                   cast(sum(e.cents) as bigint) AS sum_value_cents,
                   count(*) AS n_events
            FROM e JOIN bands b ON e.cents >= b.lo AND e.cents < b.hi
            GROUP BY b.band ORDER BY b.band
        """,
        "value_quantiles_per_type": """
            WITH v AS (
                SELECT event_type,
                       cast(round(value * 100) as bigint) AS cents
                FROM events
            ), q AS (
                SELECT event_type,
                       cast(quantile_disc(cents, 0.50) as bigint) AS p50,
                       cast(quantile_disc(cents, 0.95) as bigint) AS p95
                FROM v GROUP BY event_type
            )
            SELECT event_type, 'p50' AS quantile, p50 AS value_cents FROM q
            UNION ALL
            SELECT event_type, 'p95', p95 FROM q
            ORDER BY event_type, quantile
        """,
        # exact discrete quantiles over integer cents (rank = ceil(q·n)−1,
        # verified to match DuckDB quantile_disc at integer-percent ranks)
        "events_value_quantiles": """
            WITH v AS (
                SELECT cast(round(value * 100) as bigint) AS cents FROM events
            )
            SELECT 'p25' AS quantile, cast(quantile_disc(cents, 0.25) as bigint) AS value_cents FROM v
            UNION ALL
            SELECT 'p50', cast(quantile_disc(cents, 0.50) as bigint) FROM v
            UNION ALL
            SELECT 'p75', cast(quantile_disc(cents, 0.75) as bigint) FROM v
            UNION ALL
            SELECT 'p90', cast(quantile_disc(cents, 0.90) as bigint) FROM v
            UNION ALL
            SELECT 'p99', cast(quantile_disc(cents, 0.99) as bigint) FROM v
        """,
        "distinct_users_per_type": """
            SELECT event_type,
                   cast(count(DISTINCT user_id) as bigint) AS n_users
            FROM events GROUP BY event_type ORDER BY event_type
        """,
        # the sketch's checkable contract: exact count (SQL ground
        # truth) + the ±5% acceptance flag, which is deterministically
        # true for a working p=12 HLL (~1.6% σ) — a drifting sketch
        # flips the flag and fails the value hash
        "hll_distinct_users": """
            SELECT event_type,
                   cast(count(DISTINCT user_id) as bigint) AS n_users,
                   true AS hll_within_5pct
            FROM events GROUP BY event_type ORDER BY event_type
        """,
        "top_order_per_segment": """
            SELECT c_mktsegment, o_orderkey, total_cents FROM (
                SELECT c_mktsegment, o_orderkey,
                       cast(round(o_totalprice * 100) as bigint) AS total_cents,
                       row_number() OVER (
                           PARTITION BY c_mktsegment
                           ORDER BY cast(round(o_totalprice * 100) as bigint) DESC,
                                    o_orderkey
                       ) AS rn
                FROM orders JOIN customer ON o_custkey = c_custkey
            ) WHERE rn = 1 ORDER BY c_mktsegment
        """,
        "normalize_whitespace": r"""
            SELECT doc_id,
                   trim(regexp_replace(text, '\s+', ' ', 'g')) AS text_norm
            FROM documents
        """,
        "token_stats": r"""
            SELECT doc_id,
                   cast(len(regexp_split_to_array(trim(text), '\s+')) as bigint)
                       AS n_tokens,
                   cast(length(text) as bigint) AS n_chars
            FROM documents
        """,
        "quality_score": r"""
            SELECT doc_id, n_chars, n_alpha, n_spaces,
                   CASE WHEN n_tokens > 0
                        THEN (n_chars - n_spaces) * 1000 // n_tokens
                        ELSE 0 END AS mean_tok_len_milli
            FROM (
                SELECT doc_id,
                       cast(length(text) as bigint) AS n_chars,
                       cast(length(regexp_replace(text, '[^A-Za-z]', '', 'g')) as bigint)
                           AS n_alpha,
                       cast(length(regexp_replace(text, '[^ ]', '', 'g')) as bigint)
                           AS n_spaces,
                       cast(len(regexp_split_to_array(trim(text), '\s+')) as bigint)
                           AS n_tokens
                FROM documents
            )
        """,
        "language_id": f"""
            SELECT doc_id, {lang_case} AS lang_pred,
                   {lang_greatest} AS lang_score
            FROM (
                SELECT doc_id, {score_cols}
                FROM (SELECT doc_id, ' ' || text || ' ' AS p FROM documents)
            )
        """,
        # langid classifier QA: confusion matrix vs true labels
        "langid_confusion": f"""
            SELECT lang, {lang_case} AS lang_pred,
                   cast(count(*) as bigint) AS n_docs
            FROM (
                SELECT lang, {score_cols}
                FROM (SELECT lang, ' ' || text || ' ' AS p FROM documents)
            )
            GROUP BY lang, lang_pred ORDER BY lang, lang_pred
        """,
        # exact pairwise two-sample KS distance over the bounded
        # (source x score) histogram, integer cross-multiplied CDFs
        "quality_ks_test": r"""
            WITH q AS (
                SELECT source,
                       cast(len(string_split_regex(trim(text), '\s+'))
                            as bigint) AS n_tokens,
                       cast(length(text) as bigint) AS n_chars,
                       cast(length(regexp_replace(text, '[^ ]', '', 'g'))
                            as bigint) AS n_spaces
                FROM documents
            ), d AS (
                SELECT source,
                       CASE WHEN n_tokens > 0
                            THEN (n_chars - n_spaces) * 1000 // n_tokens
                            ELSE 0 END AS score
                FROM q
            ), h AS (
                SELECT source, score, cast(count(*) as bigint) AS cnt
                FROM d GROUP BY source, score
            ), tot AS (
                SELECT source, sum(cnt) AS n FROM h GROUP BY source
            ), pairs AS (
                SELECT a.source AS src_a, b.source AS src_b,
                       a.n AS n_a, b.n AS n_b
                FROM tot a JOIN tot b ON a.source < b.source
            ), vals AS (
                SELECT DISTINCT p.src_a, p.src_b, p.n_a, p.n_b, h.score
                FROM pairs p JOIN h ON h.source IN (p.src_a, p.src_b)
            ), cums AS (
                SELECT v.src_a, v.src_b, v.n_a, v.n_b,
                       (SELECT coalesce(sum(cnt), 0) FROM h
                        WHERE h.source = v.src_a AND h.score <= v.score)
                           AS ca,
                       (SELECT coalesce(sum(cnt), 0) FROM h
                        WHERE h.source = v.src_b AND h.score <= v.score)
                           AS cb
                FROM vals v
            )
            SELECT src_a, src_b,
                   cast(max(abs(ca * n_b - cb * n_a)) * 1000
                        // (n_a * n_b) as bigint) AS ks_milli,
                   cast(n_a as bigint) AS n_a, cast(n_b as bigint) AS n_b
            FROM cums GROUP BY src_a, src_b, n_a, n_b
            ORDER BY src_a, src_b
        """,
        # power-of-two token-length bands per lang (integer edges —
        # bucket = count of edges <= n_tokens, no float log2)
        "length_histogram": r"""
            WITH d AS (
                SELECT lang,
                       cast(len(string_split_regex(trim(text), '\s+'))
                            as bigint) AS n
                FROM documents
            ), b AS (
                SELECT lang, n,
                       (CASE WHEN n >= 16 THEN 1 ELSE 0 END
                        + CASE WHEN n >= 32 THEN 1 ELSE 0 END
                        + CASE WHEN n >= 64 THEN 1 ELSE 0 END
                        + CASE WHEN n >= 128 THEN 1 ELSE 0 END
                        + CASE WHEN n >= 256 THEN 1 ELSE 0 END
                        + CASE WHEN n >= 512 THEN 1 ELSE 0 END
                        + CASE WHEN n >= 1024 THEN 1 ELSE 0 END)
                           AS bucket
                FROM d
            )
            SELECT lang, cast(bucket as bigint) AS bucket,
                   cast(sum(n) as bigint) AS n_tokens,
                   cast(count(*) as bigint) AS n_docs,
                   cast(CASE bucket WHEN 0 THEN 0 WHEN 1 THEN 16
                        WHEN 2 THEN 32 WHEN 3 THEN 64 WHEN 4 THEN 128
                        WHEN 5 THEN 256 WHEN 6 THEN 512 ELSE 1024 END
                        as bigint) AS tokens_lo,
                   cast(CASE bucket WHEN 0 THEN 15 WHEN 1 THEN 31
                        WHEN 2 THEN 63 WHEN 3 THEN 127 WHEN 4 THEN 255
                        WHEN 5 THEN 511 WHEN 6 THEN 1023
                        ELSE 9223372036854775807 END as bigint) AS tokens_hi
            FROM b GROUP BY lang, bucket ORDER BY lang, bucket
        """,
        # per-source token accounting with exact milli-shares
        "source_token_budget": r"""
            WITH d AS (
                SELECT source,
                       cast(len(string_split_regex(trim(text), '\s+'))
                            as bigint) AS tok
                FROM documents
            ), s AS (
                SELECT source, cast(sum(tok) as bigint) AS n_tokens,
                       cast(count(*) as bigint) AS n_docs
                FROM d GROUP BY source
            )
            SELECT source, n_tokens, n_docs,
                   cast(n_tokens * 1000 // (SELECT sum(n_tokens) FROM s)
                        as bigint) AS token_share_milli
            FROM s ORDER BY source
        """,
        # per-type inter-arrival gaps (LAG per user), exact median via
        # quantile_disc rank math + truncating mean in milli-seconds
        "events_gap_stats": """
            WITH g AS (
                SELECT event_type,
                       (epoch_us(ts) - lag(epoch_us(ts)) OVER (
                            PARTITION BY user_id
                            ORDER BY epoch_us(ts), event_id))
                           // 1000000 AS gap_s
                FROM events
            ), v AS (SELECT event_type, gap_s FROM g WHERE gap_s IS NOT NULL)
            SELECT event_type,
                   cast(count(*) as bigint) AS n_gaps,
                   cast(quantile_disc(gap_s, 0.5) as bigint) AS median_gap_s,
                   cast(sum(gap_s) * 1000 // count(*) as bigint)
                       AS mean_gap_milli_s
            FROM v GROUP BY event_type ORDER BY event_type
        """,
        # first-order Markov transition counts per user (LAG over type)
        "event_transition_matrix": """
            WITH l AS (
                SELECT event_type,
                       lag(event_type) OVER (
                           PARTITION BY user_id
                           ORDER BY epoch_us(ts), event_id) AS prev_type
                FROM events
            )
            SELECT prev_type, event_type,
                   cast(count(*) as bigint) AS n_transitions
            FROM l WHERE prev_type IS NOT NULL
            GROUP BY prev_type, event_type
            ORDER BY prev_type, event_type
        """,
        # cumulative window aggregate: running revenue by order day
        "daily_revenue_running": """
            WITH d AS (
                SELECT (epoch_us(o_orderdate) // 86400000000)
                           * 86400000000 AS day_us,
                       cast(round(o_totalprice * 100) as bigint) AS cents
                FROM orders
            ), day AS (
                SELECT day_us, cast(count(*) as bigint) AS n_orders,
                       cast(sum(cents) as bigint) AS day_cents
                FROM d GROUP BY day_us
            )
            SELECT day_us, n_orders, day_cents,
                   cast(sum(day_cents) OVER (ORDER BY day_us) as bigint)
                       AS running_cents
            FROM day ORDER BY day_us
        """,
        # exact integer 3-sigma outlier counts per type (hugeint moments)
        "events_outliers": """
            WITH c AS (
                SELECT event_type,
                       cast(round(value * 100) as bigint) AS x
                FROM events
            ), s AS (
                SELECT event_type, cast(count(*) as hugeint) AS n,
                       cast(sum(x) as hugeint) AS sx,
                       cast(sum(x * x) as hugeint) AS sxx
                FROM c GROUP BY event_type
            )
            SELECT c.event_type,
                   cast(sum(CASE WHEN (s.n * c.x - s.sx)
                                      * (s.n * c.x - s.sx)
                                      > 9 * (s.n * s.sxx - s.sx * s.sx)
                                 THEN 1 ELSE 0 END) as bigint) AS n_outliers,
                   cast(count(*) as bigint) AS n_events
            FROM c JOIN s ON c.event_type = s.event_type
            GROUP BY c.event_type ORDER BY c.event_type
        """,
        # seeded deterministic sampling (O3): Knuth multiplicative hash
        "sample_documents": """
            SELECT doc_id, text FROM documents
            WHERE (doc_id * 2654435761) % 4294967296
                  < 200000 * 4294967296 // 1000000
            ORDER BY doc_id
        """,
        # per-language quota sample: k lowest-hash docs per lang
        "stratified_sample": """
            SELECT doc_id, lang, rk FROM (
                SELECT doc_id, lang,
                       row_number() OVER (
                           PARTITION BY lang
                           ORDER BY (doc_id * 2654435761) % 4294967296,
                                    doc_id
                       ) AS rk
                FROM documents
            ) WHERE rk <= 50 ORDER BY doc_id
        """,
        # global top-k word bigrams (count desc, ngram asc — both sides
        # order identically so the limit boundary is deterministic)
        "ngram_counts": r"""
            WITH toks AS (
                SELECT string_split_regex(trim(text), '\s+') AS t
                FROM documents
            ), grams AS (
                SELECT unnest(list_transform(
                           generate_series(1, len(t) - 1),
                           i -> t[i] || ' ' || t[i + 1])) AS ngram
                FROM toks WHERE len(t) >= 2
            )
            SELECT ngram, cast(count(*) as bigint) AS cnt
            FROM grams GROUP BY ngram
            ORDER BY cnt DESC, ngram LIMIT 50
        """,
        # benchmark decontamination: docs sharing a word 4-gram with the
        # doc_id%97==0 "eval suite"; hits = distinct contaminated grams
        "benchmark_decontam": r"""
            WITH toks AS (
                SELECT doc_id, string_split_regex(trim(text), '\s+') AS t
                FROM documents
            ), grams AS (
                SELECT doc_id, unnest(list_transform(
                           generate_series(1, len(t) - 3),
                           i -> t[i] || ' ' || t[i + 1] || ' '
                                || t[i + 2] || ' ' || t[i + 3])) AS gram
                FROM toks WHERE len(t) >= 4
            ), bench AS (
                SELECT DISTINCT gram FROM grams WHERE doc_id % 97 = 0
            )
            SELECT g.doc_id, cast(count(DISTINCT g.gram) as bigint) AS hits
            FROM grams g JOIN bench USING (gram)
            WHERE g.doc_id % 97 <> 0
            GROUP BY g.doc_id ORDER BY g.doc_id
        """,
        # OOV scoring vs the corpus top-10 unigram vocabulary (count
        # desc, token asc limit boundary — same order as ngram_counts)
        "oov_rate": r"""
            WITH toks AS (
                SELECT doc_id,
                       unnest(string_split_regex(trim(text), '\s+')) AS tok
                FROM documents
            ), vocab AS (
                SELECT tok FROM (
                    SELECT tok, count(*) AS c FROM toks
                    GROUP BY tok ORDER BY c DESC, tok LIMIT 10
                )
            )
            SELECT doc_id, cast(count(*) as bigint) AS n_tokens,
                   cast(count(*) FILTER (
                       WHERE tok NOT IN (SELECT tok FROM vocab)
                   ) as bigint) AS n_oov
            FROM toks GROUP BY doc_id ORDER BY doc_id
        """,
        "quality_percentile": r"""
            WITH q AS (
                SELECT doc_id, lang,
                       CASE WHEN n_tokens > 0
                            THEN (n_chars - n_spaces) * 1000 // n_tokens
                            ELSE 0 END AS mean_tok_len_milli
                FROM (
                    SELECT doc_id, lang,
                           cast(length(text) as bigint) AS n_chars,
                           cast(length(regexp_replace(text, '[^ ]', '', 'g'))
                                as bigint) AS n_spaces,
                           cast(len(regexp_split_to_array(trim(text), '\s+'))
                                as bigint) AS n_tokens
                    FROM documents
                )
            ), r AS (
                SELECT doc_id, lang, mean_tok_len_milli,
                       rank() OVER (
                           PARTITION BY lang ORDER BY mean_tok_len_milli
                       ) AS rnk,
                       count(*) OVER (PARTITION BY lang) AS n
                FROM q
            )
            SELECT doc_id, lang,
                   cast(mean_tok_len_milli as bigint) AS mean_tok_len_milli,
                   cast(rnk as bigint) AS rnk,
                   cast(CASE WHEN n > 1
                             THEN (rnk - 1) * 1000 // (n - 1)
                             ELSE 0 END as bigint) AS pctl_milli
            FROM r ORDER BY doc_id
        """,
        # per-language p10 quality gate (quantile_disc = discrete rank
        # ceil(q*n)-1, matching the engine's integer-math threshold)
        "quality_gate": r"""
            WITH q AS (
                SELECT doc_id, lang,
                       CASE WHEN n_tokens > 0
                            THEN (n_chars - n_spaces) * 1000 // n_tokens
                            ELSE 0 END AS mean_tok_len_milli
                FROM (
                    SELECT doc_id, lang,
                           cast(length(text) as bigint) AS n_chars,
                           cast(length(regexp_replace(text, '[^ ]', '', 'g'))
                                as bigint) AS n_spaces,
                           cast(len(regexp_split_to_array(trim(text), '\s+'))
                                as bigint) AS n_tokens
                    FROM documents
                )
            ), thr AS (
                SELECT lang, quantile_disc(mean_tok_len_milli, 0.10) AS t
                FROM q GROUP BY lang
            )
            SELECT q.doc_id, q.lang, cast(q.mean_tok_len_milli as bigint)
                       AS mean_tok_len_milli
            FROM q JOIN thr USING (lang)
            WHERE q.mean_tok_len_milli >= thr.t
            ORDER BY q.doc_id
        """,
        # Misra-Gries heavy hitters: exact on this corpus (distinct
        # unigrams << sketch capacity, so no trim ever fires)
        "topk_sketch": r"""
            WITH toks AS (
                SELECT unnest(string_split_regex(trim(text), '\s+')) AS term
                FROM documents
            )
            SELECT term, cast(count(*) as bigint) AS cnt
            FROM toks GROUP BY term ORDER BY cnt DESC, term LIMIT 20
        """,
        # ROLLUP grouping sets with ('ALL', -1) sentinels for the NULLs
        "events_rollup": """
            SELECT coalesce(event_type, 'ALL') AS event_type,
                   cast(coalesce(hr, -1) as bigint) AS hr,
                   cast(sum(cents) as bigint) AS sum_cents,
                   cast(count(*) as bigint) AS n
            FROM (
                SELECT event_type,
                       cast(extract(hour from ts) as bigint) AS hr,
                       cast(round(value * 100) as bigint) AS cents
                FROM events
            )
            GROUP BY ROLLUP(event_type, hr)
            ORDER BY event_type, hr
        """,
        "retained_users": """
            SELECT user_id FROM events
            WHERE epoch_us(ts) < 1705363200000000
            INTERSECT
            SELECT user_id FROM events
            WHERE epoch_us(ts) >= 1705363200000000
            ORDER BY user_id
        """,
        "churned_users": """
            SELECT user_id FROM events
            WHERE epoch_us(ts) < 1705363200000000
            EXCEPT
            SELECT user_id FROM events
            WHERE epoch_us(ts) >= 1705363200000000
            ORDER BY user_id
        """,
        "events_cube": """
            SELECT coalesce(event_type, 'ALL') AS event_type,
                   cast(coalesce(hr, -1) as bigint) AS hr,
                   cast(sum(cents) as bigint) AS sum_cents,
                   cast(count(*) as bigint) AS n
            FROM (
                SELECT event_type,
                       cast(extract(hour from ts) as bigint) AS hr,
                       cast(round(value * 100) as bigint) AS cents
                FROM events
            )
            GROUP BY CUBE(event_type, hr)
            ORDER BY event_type, hr
        """,
        # Q14 shape: monthly promo vs total revenue (integer centi-cents)
        "promo_revenue_by_month": """
            SELECT cast(year(l_shipdate) * 100 + month(l_shipdate) as bigint)
                       AS ym,
                   cast(sum(CASE WHEN p_type = 'PROMO' THEN rev
                                 ELSE 0 END) as bigint) AS promo_cc,
                   cast(sum(rev) as bigint) AS total_cc
            FROM (
                SELECT l_partkey, l_shipdate,
                       cast(round(l_extendedprice * 100) as bigint)
                       * (100 - cast(round(l_discount * 100) as bigint)) AS rev
                FROM lineitem
            ) l JOIN part p ON l.l_partkey = p.p_partkey
            GROUP BY ym ORDER BY ym
        """,
        # Q5 shape: per-nation revenue, supplier nation = customer nation,
        # customers in one region
        "regional_revenue": """
            SELECT n.n_name,
                   cast(sum(cast(round(l.l_extendedprice * 100) as bigint)
                        * (100 - cast(round(l.l_discount * 100) as bigint)))
                        as bigint) AS revenue_cc
            FROM lineitem l
            JOIN orders o ON l.l_orderkey = o.o_orderkey
            JOIN customer c ON o.o_custkey = c.c_custkey
            JOIN supplier s ON l.l_suppkey = s.s_suppkey
            JOIN nation n ON c.c_nationkey = n.n_nationkey
            JOIN region r ON n.n_regionkey = r.r_regionkey
            WHERE r.r_name = 'ASIA' AND s.s_nationkey = c.c_nationkey
            GROUP BY n.n_name
            ORDER BY revenue_cc DESC, n_name
        """,
        # EXISTS / semi-join: orders with at least one returned lineitem
        "orders_with_returns": """
            SELECT o_orderkey,
                   cast(round(o_totalprice * 100) as bigint) AS total_cents
            FROM orders
            WHERE o_orderkey IN (
                SELECT l_orderkey FROM lineitem WHERE l_returnflag = 'R'
            )
            ORDER BY o_orderkey
        """,
        # Bloom prefilter + exact verify ≡ the plain semi-join
        "orders_bloom_semi": """
            SELECT o_orderkey,
                   cast(round(o_totalprice * 100) as bigint) AS total_cents
            FROM orders
            WHERE o_orderkey IN (
                SELECT l_orderkey FROM lineitem WHERE l_returnflag = 'R'
            )
            ORDER BY o_orderkey
        """,
        "customer_order_counts": """
            SELECT c_count, cast(count(*) as bigint) AS custdist
            FROM (
                SELECT c.c_custkey,
                       cast(count(o.o_custkey) as bigint) AS c_count
                FROM customer c
                LEFT OUTER JOIN orders o ON c.c_custkey = o.o_custkey
                GROUP BY c.c_custkey
            )
            GROUP BY c_count
            ORDER BY custdist DESC, c_count DESC
        """,
        "nations_trade_volume": """
            SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
                   cast(year(o.o_orderdate) as bigint) AS l_year,
                   cast(sum(cast(round(l.l_extendedprice * 100) as bigint)
                            * (100 - cast(round(l.l_discount * 100) as bigint)))
                        as bigint) AS revenue_cc
            FROM lineitem l
            JOIN supplier s ON s.s_suppkey = l.l_suppkey
            JOIN nation n1 ON n1.n_nationkey = s.s_nationkey
            JOIN orders o ON o.o_orderkey = l.l_orderkey
            JOIN customer c ON c.c_custkey = o.o_custkey
            JOIN nation n2 ON n2.n_nationkey = c.c_nationkey
            WHERE (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
               OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1')
            GROUP BY 1, 2, 3 ORDER BY 1, 2, 3
        """,
        "events_mad": """
            WITH c AS (
                SELECT event_type,
                       cast(round(value * 100) as bigint) AS cents
                FROM events
            ), med AS (
                SELECT event_type,
                       cast(quantile_disc(cents, 0.50) as bigint)
                           AS median_cents
                FROM c GROUP BY event_type
            )
            SELECT c.event_type,
                   cast(any_value(m.median_cents) as bigint) AS median_cents,
                   cast(quantile_disc(abs(c.cents - m.median_cents), 0.50)
                        as bigint) AS mad_cents
            FROM c JOIN med m ON m.event_type = c.event_type
            GROUP BY c.event_type ORDER BY c.event_type
        """,
        "token_entropy": r"""
            WITH toks AS (
                SELECT doc_id, string_split_regex(trim(text), '\s+') AS t
                FROM documents
            ), words AS (
                SELECT doc_id, unnest(t) AS w, len(t) AS n FROM toks
            ), cnts AS (
                SELECT doc_id, w, any_value(n) AS n,
                       cast(count(*) as bigint) AS c
                FROM words GROUP BY doc_id, w
            )
            SELECT doc_id, cast(any_value(n) as bigint) AS n_tokens,
                   cast(sum(c * cast(floor(1e6 * ln(cast(n as double) / c))
                                     as bigint)) as bigint)
                       AS entropy_sum_micro
            FROM cnts GROUP BY doc_id ORDER BY doc_id
        """,
        "dsir_weights": r"""
            WITH toks AS (
                SELECT doc_id, lang,
                       string_split_regex(trim(text), '\s+') AS t
                FROM documents
            ), words AS (
                SELECT doc_id, lang, unnest(t) AS w FROM toks
            ), raw AS (
                SELECT w, cast(count(*) as bigint) AS c
                FROM words GROUP BY w
            ), traw AS (SELECT cast(sum(c) as bigint) AS n FROM raw),
            tgt AS (
                SELECT w, cast(count(*) as bigint) AS c
                FROM words WHERE lang = 'en' GROUP BY w
            ), ttgt AS (
                SELECT cast(count(*) as bigint) AS n
                FROM words WHERE lang = 'en'
            ), model AS (
                SELECT r.w,
                       cast(floor(-1e6 * ln(r.c / (SELECT n FROM traw)))
                            as bigint)
                       - cast(floor(-1e6 * ln(
                             greatest(coalesce(g.c, 0), 0.5)
                             / (SELECT n FROM ttgt))) as bigint)
                           AS diff_micro
                FROM raw r LEFT JOIN tgt g ON g.w = r.w
            )
            SELECT ws.doc_id, cast(count(*) as bigint) AS n_tokens,
                   cast(sum(m.diff_micro) as bigint) AS dsir_micro
            FROM words ws JOIN model m ON m.w = ws.w
            GROUP BY ws.doc_id ORDER BY ws.doc_id
        """,
        "collocations": r"""
            WITH toks AS (
                SELECT string_split_regex(trim(text), '\s+') AS t
                FROM documents
            ), uni AS (
                SELECT w, cast(count(*) as bigint) AS c
                FROM (SELECT unnest(t) AS w FROM toks) GROUP BY w
            ), tot AS (SELECT cast(sum(c) as bigint) AS n FROM uni),
            pairs AS (
                SELECT t[i] AS w1, t[i + 1] AS w2
                FROM toks, unnest(generate_series(1, len(t) - 1)) AS s(i)
                WHERE len(t) >= 2
            ), big AS (
                SELECT w1, w2, cast(count(*) as bigint) AS pair_cnt
                FROM pairs GROUP BY w1, w2 HAVING count(*) >= 20
            )
            SELECT b.w1, b.w2, b.pair_cnt,
                   cast(cast(b.pair_cnt as hugeint) * (SELECT n FROM tot)
                        * 1000
                        // (cast(u1.c as hugeint) * u2.c) as bigint)
                       AS lift_milli
            FROM big b
            JOIN uni u1 ON u1.w = b.w1
            JOIN uni u2 ON u2.w = b.w2
            ORDER BY lift_milli DESC, w1, w2 LIMIT 20
        """,
        "top_supplier_revenue": """
            WITH revenue AS (
                SELECT l_suppkey AS s_suppkey,
                       cast(sum(cast(round(l_extendedprice * 100) as bigint)
                                * (100 - cast(round(l_discount * 100)
                                              as bigint)))
                            as bigint) AS total_revenue_cc
                FROM lineitem
                WHERE l_shipdate >= TIMESTAMP '1996-01-01'
                  AND l_shipdate < TIMESTAMP '1996-07-01'
                GROUP BY l_suppkey
            )
            SELECT s.s_suppkey, s.s_name, r.total_revenue_cc
            FROM supplier s JOIN revenue r ON s.s_suppkey = r.s_suppkey
            WHERE r.total_revenue_cc = (
                SELECT max(total_revenue_cc) FROM revenue
            )
            ORDER BY s.s_suppkey
        """,
        "disjunctive_part_revenue": """
            SELECT cast(count(*) as bigint) AS n_items,
                   coalesce(cast(sum(
                       cast(round(l.l_extendedprice * 100) as bigint)
                       * (100 - cast(round(l.l_discount * 100) as bigint))
                   ) as bigint), 0) AS revenue_cc
            FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
            WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 5
                   AND l.l_quantity >= 1 AND l.l_quantity <= 11)
               OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 1 AND 10
                   AND l.l_quantity >= 10 AND l.l_quantity <= 20)
               OR (p.p_brand = 'Brand#3' AND p.p_size BETWEEN 1 AND 15
                   AND l.l_quantity >= 20 AND l.l_quantity <= 30)
        """,
        "market_share": """
            WITH base AS (
                SELECT cast(year(o.o_orderdate) as bigint) AS o_year,
                       cast(round(l.l_extendedprice * 100) as bigint)
                       * (100 - cast(round(l.l_discount * 100) as bigint))
                           AS rev,
                       CASE WHEN n1.n_name = 'NATION_2' THEN 1 ELSE 0 END
                           AS is_t
                FROM lineitem l
                JOIN part p ON p.p_partkey = l.l_partkey
                           AND p.p_type = 'PROMO'
                JOIN supplier s ON s.s_suppkey = l.l_suppkey
                JOIN nation n1 ON n1.n_nationkey = s.s_nationkey
                JOIN orders o ON o.o_orderkey = l.l_orderkey
                JOIN customer c ON c.c_custkey = o.o_custkey
                JOIN nation n2 ON n2.n_nationkey = c.c_nationkey
                JOIN region r ON r.r_regionkey = n2.n_regionkey
                             AND r.r_name = 'ASIA'
                WHERE year(o.o_orderdate) BETWEEN 1996 AND 1997
            )
            SELECT o_year,
                   cast(sum(rev * is_t) as bigint) AS nation_revenue_cc,
                   cast(sum(rev) as bigint) AS total_revenue_cc,
                   cast(sum(rev * is_t) * 1000 // sum(rev) as bigint)
                       AS share_milli
            FROM base GROUP BY o_year ORDER BY o_year
        """,
        # Q4 shape: correlated EXISTS crossing both join sides
        "order_priority_check": """
            SELECT o_orderpriority,
                   cast(count(*) as bigint) AS order_count
            FROM orders
            WHERE o_orderdate >= TIMESTAMP '1997-07-01'
              AND o_orderdate < TIMESTAMP '1997-10-01'
              AND EXISTS (
                  SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey
                    AND l_shipdate > o_orderdate + INTERVAL 60 DAY
              )
            GROUP BY o_orderpriority ORDER BY o_orderpriority
        """,
        # Q12 shape: per-linestatus high/low priority counts of late ships
        "late_shipment_priority": """
            SELECT l_linestatus,
                   cast(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                                 THEN 1 ELSE 0 END) as bigint)
                       AS high_line_count,
                   cast(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                                 THEN 0 ELSE 1 END) as bigint)
                       AS low_line_count
            FROM lineitem JOIN orders ON l_orderkey = o_orderkey
            WHERE l_shipdate > o_orderdate + INTERVAL 90 DAY
            GROUP BY l_linestatus ORDER BY l_linestatus
        """,
        # Q16 shape: COUNT(DISTINCT supplier) after the part join
        "part_type_supplier_counts": """
            SELECT p_type, p_brand,
                   cast(count(DISTINCT l_suppkey) as bigint) AS supplier_cnt
            FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) ps
            JOIN part ON p_partkey = l_partkey
            GROUP BY p_type, p_brand ORDER BY p_type, p_brand
        """,
        # Q20 shape: cross-level share predicate (8q > part total)
        "dominant_part_suppliers": """
            WITH psq AS (
                SELECT l_partkey, l_suppkey,
                       cast(sum(cast(round(l_quantity * 100) as bigint))
                            as bigint) AS q
                FROM lineitem GROUP BY l_partkey, l_suppkey
            ), pt AS (
                SELECT l_partkey, sum(q) AS tot FROM psq GROUP BY l_partkey
            )
            SELECT DISTINCT psq.l_suppkey AS suppkey
            FROM psq JOIN pt ON psq.l_partkey = pt.l_partkey
            WHERE psq.q * 8 > pt.tot
            ORDER BY suppkey
        """,
        # Q9 shape: 5-way star join, profit = revenue_cc - retail-cost
        # (no partsupp in the testdata: unit cost = p_retailprice)
        "product_profit": """
            SELECT n.n_name AS nation,
                   cast(year(o.o_orderdate) as bigint) AS o_year,
                   cast(sum(
                       cast(round(l.l_extendedprice * 100) as bigint)
                       * (100 - cast(round(l.l_discount * 100) as bigint))
                       - (cast(round(p.p_retailprice * 100) as bigint)
                          * cast(round(l.l_quantity * 100) as bigint)) // 100
                   ) as bigint) AS profit_cc
            FROM lineitem l
            JOIN part p ON p.p_partkey = l.l_partkey
            JOIN orders o ON o.o_orderkey = l.l_orderkey
            JOIN supplier s ON s.s_suppkey = l.l_suppkey
            JOIN nation n ON n.n_nationkey = s.s_nationkey
            WHERE p.p_name LIKE '%red%'
            GROUP BY 1, 2 ORDER BY 1, 2 DESC
        """,
        # Q2 shape: groupwise-min supplier per part in a region
        # (pairs derived from lineitem; cost proxy = s_acctbal)
        "min_cost_supplier": """
            WITH pairs AS (
                SELECT DISTINCT l_partkey, l_suppkey FROM lineitem
            ), cand AS (
                SELECT pr.l_partkey AS p_partkey,
                       cast(round(s.s_acctbal * 100) as bigint)
                           AS s_acctbal_cents,
                       s.s_name, n.n_name,
                       row_number() OVER (
                           PARTITION BY pr.l_partkey
                           ORDER BY s.s_acctbal ASC, s.s_suppkey ASC
                       ) AS rn
                FROM pairs pr
                JOIN supplier s ON s.s_suppkey = pr.l_suppkey
                JOIN nation n ON n.n_nationkey = s.s_nationkey
                JOIN region r ON r.r_regionkey = n.n_regionkey
                WHERE r.r_name = 'EUROPE'
            )
            SELECT s_acctbal_cents, s_name, n_name, p_partkey
            FROM cand WHERE rn = 1
            ORDER BY s_acctbal_cents DESC, n_name, s_name, p_partkey
        """,
        # exact integer milli-unit Gram matrix (upper triangle)
        "embedding_moments": """
            WITH q AS (
                SELECT vec_id, i,
                       cast(round(cast(embedding[i] as double) * 1000)
                            as bigint) AS qi
                FROM embeddings, range(1, 65) r(i)
            )
            SELECT a.i AS i, b.i AS j,
                   cast(sum(a.qi * b.qi) as bigint) AS sum_mm
            FROM q a JOIN q b
              ON a.vec_id = b.vec_id AND a.i <= b.i
            GROUP BY 1, 2 ORDER BY 1, 2
        """,
        # market-basket pairs: co-ordered parts, support>=2, top-50 lift
        "basket_pairs": """
            WITH op AS (
                SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
            ), pc AS (
                SELECT l_partkey, cast(count(*) as bigint) AS c
                FROM op GROUP BY 1
            ), n AS (
                SELECT cast(count(DISTINCT l_orderkey) as bigint) AS n
                FROM op
            ), pp AS (
                SELECT a.l_partkey AS pa, b.l_partkey AS pb,
                       cast(count(*) as bigint) AS s
                FROM op a JOIN op b
                  ON a.l_orderkey = b.l_orderkey
                 AND a.l_partkey < b.l_partkey
                GROUP BY 1, 2
            )
            SELECT pp.pa, pp.pb, pp.s AS support,
                   cast((1000 * n.n * pp.s) // (ca.c * cb.c) as bigint)
                       AS lift_milli
            FROM pp CROSS JOIN n
            JOIN pc ca ON ca.l_partkey = pp.pa
            JOIN pc cb ON cb.l_partkey = pp.pb
            WHERE pp.s >= 2
            ORDER BY lift_milli DESC, pp.pa, pp.pb LIMIT 50
        """,
        # data-quality gate: orphan counts per fact->dim reference
        "referential_orphans": """
            SELECT relation, n_orphans FROM (
                SELECT 'orders.o_custkey->customer' AS relation,
                       cast(count(*) FILTER (c.c_custkey IS NULL) AS BIGINT)
                           AS n_orphans
                FROM orders o LEFT JOIN customer c
                  ON c.c_custkey = o.o_custkey
                UNION ALL
                SELECT 'lineitem.l_partkey->part',
                       cast(count(*) FILTER (p.p_partkey IS NULL) AS BIGINT)
                FROM lineitem l LEFT JOIN part p
                  ON p.p_partkey = l.l_partkey
                UNION ALL
                SELECT 'lineitem.l_suppkey->supplier',
                       cast(count(*) FILTER (s.s_suppkey IS NULL) AS BIGINT)
                FROM lineitem l LEFT JOIN supplier s
                  ON s.s_suppkey = l.l_suppkey
                UNION ALL
                SELECT 'lineitem.l_orderkey->orders',
                       cast(count(*) FILTER (o.o_orderkey IS NULL) AS BIGINT)
                FROM lineitem l LEFT JOIN orders o
                  ON o.o_orderkey = l.l_orderkey
            ) ORDER BY relation
        """,
        # Q11 shape: global-scalar share predicate over grouped sums
        "important_parts": """
            WITH pv AS (
                SELECT l.l_partkey AS p_partkey,
                       cast(sum(cast(round(l.l_extendedprice * 100)
                                     as bigint)) as bigint) AS value_c
                FROM lineitem l
                JOIN supplier s ON s.s_suppkey = l.l_suppkey
                JOIN nation n ON n.n_nationkey = s.s_nationkey
                WHERE n.n_name = 'NATION_1'
                GROUP BY 1
            )
            SELECT p_partkey, value_c FROM pv
            WHERE value_c * 1000 > (SELECT sum(value_c) FROM pv)
            ORDER BY value_c DESC, p_partkey
        """,
        "windowed_quantiles": """
            WITH q AS (
                SELECT (epoch_us(ts) // 3600000000) * 3600000000
                           AS window_start,
                       cast(round(value * 100) as bigint) AS cents
                FROM events
            )
            SELECT window_start, 'p50' AS quantile,
                   cast(quantile_disc(cents, 0.50) as bigint) AS value_cents
            FROM q GROUP BY window_start
            UNION ALL
            SELECT window_start, 'p95' AS quantile,
                   cast(quantile_disc(cents, 0.95) as bigint) AS value_cents
            FROM q GROUP BY window_start
            ORDER BY window_start, quantile
        """,
        "events_pivot": """
            SELECT user_id,
                   cast(count(*) FILTER (event_type = 'click') as bigint)
                       AS n_click,
                   cast(count(*) FILTER (event_type = 'error') as bigint)
                       AS n_error,
                   cast(count(*) FILTER (event_type = 'purchase') as bigint)
                       AS n_purchase,
                   cast(count(*) FILTER (event_type = 'signup') as bigint)
                       AS n_signup,
                   cast(count(*) FILTER (event_type = 'view') as bigint)
                       AS n_view
            FROM events GROUP BY user_id ORDER BY user_id
        """,
        "events_late_data": """
            WITH a AS (
                SELECT event_id, epoch_us(ts) AS us,
                       epoch_us(ts)
                       + ((event_id * 2654435761) % 4294967296)
                           % 7200000000
                       - 3600000000 AS arr
                FROM events
            ), w AS (
                SELECT us,
                       max(us) OVER (
                           ORDER BY arr, event_id
                           ROWS BETWEEN UNBOUNDED PRECEDING
                                AND 1 PRECEDING) AS wm
                FROM a
            ), e AS (
                SELECT (us // 3600000000) * 3600000000 AS window_start,
                       CASE WHEN wm IS NOT NULL
                                 AND (us // 3600000000) * 3600000000
                                     + 3600000000 <= wm - 1800000000
                            THEN 1 ELSE 0 END AS late
                FROM w
            )
            SELECT window_start,
                   cast(count(*) as bigint) AS n_events,
                   cast(sum(late) as bigint) AS n_late
            FROM e GROUP BY window_start ORDER BY window_start
        """,
        "events_funnel": """
            WITH v AS (
                SELECT user_id, min(ts) AS t1 FROM events
                WHERE event_type = 'view' GROUP BY user_id
            ), c AS (
                SELECT e.user_id, min(e.ts) AS t2
                FROM events e JOIN v ON v.user_id = e.user_id
                WHERE e.event_type = 'click' AND e.ts > v.t1
                GROUP BY e.user_id
            ), p AS (
                SELECT e.user_id, min(e.ts) AS t3
                FROM events e JOIN c ON c.user_id = e.user_id
                WHERE e.event_type = 'purchase' AND e.ts > c.t2
                GROUP BY e.user_id
            ), u AS (SELECT DISTINCT user_id FROM events),
            st AS (
                SELECT u.user_id,
                       CASE WHEN p.user_id IS NOT NULL THEN 3
                            WHEN c.user_id IS NOT NULL THEN 2
                            WHEN v.user_id IS NOT NULL THEN 1
                            ELSE 0 END AS stage
                FROM u
                LEFT JOIN v ON v.user_id = u.user_id
                LEFT JOIN c ON c.user_id = u.user_id
                LEFT JOIN p ON p.user_id = u.user_id
            )
            SELECT cast(stage as bigint) AS stage,
                   cast(count(*) as bigint) AS n_users
            FROM st GROUP BY stage ORDER BY stage
        """,
        "large_volume_orders": """
            WITH s AS (
                SELECT l_orderkey,
                       cast(sum(cast(round(l_quantity * 100) as bigint))
                            as bigint) AS sum_qty_cents
                FROM lineitem GROUP BY l_orderkey
                HAVING sum(cast(round(l_quantity * 100) as bigint)) > 30000
            )
            SELECT o.o_orderkey, c.c_name,
                   cast(round(o.o_totalprice * 100) as bigint) AS total_cents,
                   s.sum_qty_cents
            FROM s
            JOIN orders o ON s.l_orderkey = o.o_orderkey
            JOIN customer c ON o.o_custkey = c.c_custkey
            ORDER BY s.sum_qty_cents DESC, o.o_orderkey
            LIMIT 100
        """,
        "top_terms_per_doc": r"""
            WITH toks AS (
                SELECT doc_id,
                       unnest(string_split_regex(trim(text), '\s+')) AS term
                FROM documents
            ), c AS (
                SELECT doc_id, term, count(*) AS cnt
                FROM toks GROUP BY doc_id, term
            ), r AS (
                SELECT doc_id, term, cnt,
                       row_number() OVER (
                           PARTITION BY doc_id ORDER BY cnt DESC, term
                       ) AS rnk
                FROM c
            )
            SELECT doc_id, cast(rnk as bigint) AS rnk, term,
                   cast(cnt as bigint) AS cnt
            FROM r WHERE rnk <= 3 ORDER BY doc_id, rnk
        """,
        "corpus_export_manifest": """
            SELECT doc_id % 8 AS shard, cast(count(*) as bigint) AS n_rows
            FROM documents GROUP BY shard ORDER BY shard
        """,
        "jsonl_corpus_stats": """
            SELECT doc_id % 8 AS shard,
                   cast(count(*) as bigint) AS n_docs,
                   cast(sum(length(text)) as bigint) AS n_chars
            FROM documents GROUP BY shard ORDER BY shard
        """,
        "parquet_export_manifest": """
            SELECT doc_id % 8 AS shard, cast(count(*) as bigint) AS n_rows
            FROM documents GROUP BY shard ORDER BY shard
        """,
        "parquet_corpus_stats": """
            SELECT doc_id % 8 AS shard,
                   cast(count(*) as bigint) AS n_docs,
                   cast(sum(length(text)) as bigint) AS n_chars
            FROM documents GROUP BY shard ORDER BY shard
        """,
        "bpe_token_stats": """
            SELECT doc_id,
                   cast(len(regexp_extract_all(text,
                       ' ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9 ]+')) as bigint)
                       AS n_bpe_tokens,
                   cast(len(regexp_extract_all(text, ' ?[A-Za-z]+'))
                       as bigint) AS n_word_tokens,
                   cast(len(regexp_extract_all(text, ' ?[0-9]+'))
                       as bigint) AS n_num_tokens
            FROM documents ORDER BY doc_id
        """,
        "tfidf_top_terms": r"""
            WITH toks AS (
                SELECT doc_id,
                       unnest(string_split_regex(trim(text), '\s+')) AS term
                FROM documents
            ), tf AS (
                SELECT doc_id, term, cast(count(*) as bigint) AS cnt
                FROM toks GROUP BY doc_id, term
            ), df AS (
                SELECT term, cast(count(DISTINCT doc_id) as bigint) AS df
                FROM toks GROUP BY term
            ), n AS (
                SELECT cast(count(*) as bigint) AS n_docs FROM documents
            ), scored AS (
                SELECT tf.doc_id, tf.term,
                       (tf.cnt * n.n_docs) // df.df AS tfidf_q,
                       row_number() OVER (
                           PARTITION BY tf.doc_id
                           ORDER BY (tf.cnt * n.n_docs) // df.df DESC,
                                    tf.term
                       ) AS rnk
                FROM tf JOIN df USING (term) CROSS JOIN n
            )
            SELECT doc_id, cast(rnk as bigint) AS rnk, term,
                   cast(tfidf_q as bigint) AS tfidf_q
            FROM scored WHERE rnk <= 3 ORDER BY doc_id, rnk
        """,
        "corpus_mixture": """
            WITH n AS (
                SELECT source, cast(count(*) as bigint) AS n
                FROM documents GROUP BY source
            ), f AS (
                SELECT source, n,
                       (cast(substr(source, 4) as bigint) % 4) + 1 AS w
                FROM n
            ), r AS (
                SELECT source,
                       least(1000000,
                             (200 * w // (SELECT sum(w) FROM f))
                                 * 1000000 // n) AS rate_ppm
                FROM f
            )
            SELECT d.doc_id, d.source
            FROM documents d JOIN r USING (source)
            WHERE (d.doc_id * 2654435761) % 4294967296
                  < r.rate_ppm * 4294967296 // 1000000
            ORDER BY d.doc_id
        """,
        "chunk_documents": r"""
            WITH t AS (
                SELECT doc_id,
                       regexp_split_to_array(trim(text), '\s+') AS toks
                FROM documents
            ), c AS (
                SELECT doc_id, toks,
                       unnest(range(0, greatest(len(toks), 1), 48)) AS start
                FROM t
            )
            SELECT doc_id,
                   cast(start // 48 as bigint) AS chunk_idx,
                   cast(len(toks[start + 1 : start + 64]) as bigint)
                       AS n_chunk_tokens,
                   array_to_string(toks[start + 1 : start + 64], ' ')
                       AS chunk
            FROM c ORDER BY doc_id, chunk_idx
        """,
        # sequence packing: bin = global ordered token prefix-sum / cap
        "pack_sequences": r"""
            WITH tc AS (
                SELECT doc_id,
                       cast(len(string_split_regex(trim(text), '\s+'))
                            as bigint) AS n_tokens
                FROM documents
            )
            SELECT doc_id, n_tokens,
                   cast((sum(n_tokens) OVER (ORDER BY doc_id) - n_tokens)
                        // 512 as bigint) AS bin_id
            FROM tc ORDER BY doc_id
        """,
        # regex redaction (RE2 on both sides: Arrow
        # replace_substring_regex ≡ DuckDB regexp_replace(…, 'g'))
        # typed PII scrub: sequential email -> ip -> phone redaction;
        # counts taken on the intermediate each stage saw (both engines
        # are RE2, so text and counts agree byte-for-byte)
        "pii_scrub": r"""
            WITH s1 AS (
                SELECT doc_id, text,
                       len(regexp_extract_all(
                           text,
                           '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}'
                       )) AS n_emails,
                       regexp_replace(
                           text,
                           '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}',
                           '<EMAIL>', 'g') AS t1
                FROM documents
            ), s2 AS (
                SELECT doc_id, n_emails,
                       len(regexp_extract_all(
                           t1, '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b'
                       )) AS n_ips,
                       regexp_replace(
                           t1, '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b',
                           '<IP>', 'g') AS t2
                FROM s1
            )
            SELECT doc_id,
                   regexp_replace(
                       t2, '\b\d{3}[-. ]\d{3}[-. ]\d{4}\b',
                       '<PHONE>', 'g') AS text_scrubbed,
                   cast(n_emails as bigint) AS n_emails,
                   cast(n_ips as bigint) AS n_ips,
                   cast(len(regexp_extract_all(
                       t2, '\b\d{3}[-. ]\d{3}[-. ]\d{4}\b'
                   )) as bigint) AS n_phones
            FROM s2 ORDER BY doc_id
        """,
        "redact_terms": r"""
            SELECT doc_id,
                   regexp_replace(text, '\b(customer|part)\b', '[PII]', 'g')
                       AS text_red,
                   cast(length(text)
                        - length(regexp_replace(
                              text, '\b(customer|part)\b', '', 'g'))
                        as bigint) AS redacted_chars
            FROM documents ORDER BY doc_id
        """,
        # Gopher-style repetition quality signals (integer milli)
        "repetition_stats": r"""
            WITH toks AS (
                SELECT doc_id, string_split_regex(trim(text), '\s+') AS t
                FROM documents
            ), u AS (
                SELECT doc_id, unnest(t) AS w FROM toks
            ), uc AS (
                SELECT doc_id, w, count(*) AS c FROM u GROUP BY doc_id, w
            ), us AS (
                SELECT doc_id, cast(max(c) as bigint) AS mx,
                       cast(count(*) as bigint) AS nd,
                       cast(sum(c) as bigint) AS nt
                FROM uc GROUP BY doc_id
            ), bg AS (
                SELECT doc_id,
                       unnest(list_transform(
                           generate_series(1, len(t) - 1),
                           i -> t[i] || ' ' || t[i + 1])) AS g
                FROM toks WHERE len(t) >= 2
            ), bc AS (
                SELECT doc_id, g, count(*) AS c FROM bg GROUP BY doc_id, g
            ), bs AS (
                SELECT doc_id, cast(max(c) as bigint) AS bmx
                FROM bc GROUP BY doc_id
            )
            SELECT us.doc_id, nt AS n_tokens,
                   nd * 1000 // nt AS distinct_frac_milli,
                   mx * 1000 // nt AS max_word_frac_milli,
                   coalesce(bmx, 0) * 1000 // greatest(nt - 1, 1)
                       AS top_bigram_frac_milli
            FROM us LEFT JOIN bs ON us.doc_id = bs.doc_id
        """,
        # unigram-LM NLL scoring: same floor(-1e6*ln(c/T)) quantization
        # (floor, not round: Python round() is banker's, DuckDB's is
        # half-away; both ln() hit the same libm)
        "unigram_logprob": r"""
            WITH u AS (
                SELECT doc_id,
                       unnest(string_split_regex(trim(text), '\s+')) AS w
                FROM documents
            ), vc AS (
                SELECT w, count(*) AS c FROM u GROUP BY w
            ), tot AS (
                SELECT cast(sum(c) as bigint) AS T FROM vc
            ), v AS (
                SELECT w, cast(floor(-1000000 * ln(
                           c / (SELECT T FROM tot))) as bigint) AS nll
                FROM (SELECT w, c FROM vc ORDER BY c DESC, w LIMIT 65536)
            ), scored AS (
                SELECT u.doc_id,
                       coalesce(v.nll,
                                (SELECT cast(floor(-1000000 * ln(0.5 / T))
                                             as bigint) FROM tot)) AS nll
                FROM u LEFT JOIN v ON u.w = v.w
            )
            SELECT doc_id, cast(count(*) as bigint) AS n_tokens,
                   cast(sum(nll) as bigint) AS nll_micro,
                   cast(sum(nll) // (count(*) * 1000) as bigint)
                       AS avg_nll_milli
            FROM scored GROUP BY doc_id ORDER BY doc_id
        """,
        # Conditional bigram LM, same floor-quantized micro-nat protocol:
        # P(w2|w1) = c2/c1 over the top-65536 bigram + prefix tables,
        # 0.5 OOV floors (prefix-absent rule fires first)
        "bigram_logprob": r"""
            WITH toks AS (
                SELECT doc_id, string_split_regex(trim(text), '\s+') AS t
                FROM documents
            ), pairs AS (
                SELECT doc_id, t[i] AS w1, t[i + 1] AS w2
                FROM toks, unnest(generate_series(1, len(t) - 1)) AS s(i)
                WHERE len(t) >= 2
            ), bc AS (
                SELECT w1, w2, cast(count(*) as bigint) AS c2
                FROM pairs GROUP BY w1, w2
            ), tb AS (SELECT cast(sum(c2) as bigint) AS n FROM bc),
            pv AS (
                SELECT w1, c1 FROM (
                    SELECT w1, cast(sum(c2) as bigint) AS c1
                    FROM bc GROUP BY w1
                ) ORDER BY c1 DESC, w1 LIMIT 65536
            ), bv AS (
                -- tie-break on the JOINED 'w1 w2' key — the impl's
                -- top-k sorts the joined bigram string, and (w1, w2)
                -- column order differs from it when a token holds a
                -- char below 0x20 (control chars survive \s+ splits)
                SELECT w1, w2, c2 FROM bc
                ORDER BY c2 DESC, w1 || ' ' || w2 LIMIT 65536
            ), scored AS (
                SELECT p.doc_id,
                       CASE WHEN v.w1 IS NULL
                            THEN (SELECT cast(floor(-1000000 * ln(0.5 / n))
                                              as bigint) FROM tb)
                            ELSE cast(floor(-1000000 * ln(
                                     coalesce(b.c2, 0.5) / v.c1))
                                 as bigint)
                       END AS nll
                FROM pairs p
                LEFT JOIN pv v ON v.w1 = p.w1
                LEFT JOIN bv b ON b.w1 = p.w1 AND b.w2 = p.w2
            ), perdoc AS (
                SELECT doc_id, cast(count(*) as bigint) AS n_bigrams,
                       cast(sum(nll) as bigint) AS nll2_micro
                FROM scored GROUP BY doc_id
            )
            SELECT d.doc_id,
                   cast(coalesce(s.n_bigrams, 0) as bigint) AS n_bigrams,
                   cast(coalesce(s.nll2_micro, 0) as bigint) AS nll2_micro,
                   cast(CASE WHEN coalesce(s.n_bigrams, 0) > 0
                             THEN s.nll2_micro // (s.n_bigrams * 1000)
                             ELSE 0 END as bigint) AS avg_nll2_milli
            FROM documents d LEFT JOIN perdoc s ON s.doc_id = d.doc_id
            ORDER BY d.doc_id
        """,
        # per-source distinct-n diversity (word bigrams)
        "ngram_diversity": r"""
            WITH toks AS (
                SELECT source, string_split_regex(trim(text), '\s+') AS t
                FROM documents
            ), grams AS (
                SELECT source, t[i] || ' ' || t[i + 1] AS g
                FROM toks, unnest(generate_series(1, len(t) - 1)) AS s(i)
                WHERE len(t) >= 2
            )
            SELECT source,
                   cast(count(*) as bigint) AS total_ngrams,
                   cast(count(DISTINCT g) as bigint) AS distinct_ngrams,
                   cast(count(DISTINCT g) * 1000000 // count(*)
                        as bigint) AS distinct_ppm
            FROM grams GROUP BY source ORDER BY source
        """,
        # CCNet-style per-language perplexity terciles (value-threshold
        # buckets; thresholds = value at 1-indexed position ceil(k·n/3))
        "ccnet_buckets": r"""
            WITH u AS (
                SELECT doc_id,
                       unnest(string_split_regex(trim(text), '\s+')) AS w
                FROM documents
            ), vc AS (
                SELECT w, count(*) AS c FROM u GROUP BY w
            ), tot AS (
                SELECT cast(sum(c) as bigint) AS T FROM vc
            ), v AS (
                SELECT w, cast(floor(-1000000 * ln(
                           c / (SELECT T FROM tot))) as bigint) AS nll
                FROM (SELECT w, c FROM vc ORDER BY c DESC, w LIMIT 65536)
            ), tok AS (
                SELECT u.doc_id,
                       coalesce(v.nll,
                                (SELECT cast(floor(-1000000 * ln(0.5 / T))
                                             as bigint) FROM tot)) AS nll
                FROM u LEFT JOIN v ON u.w = v.w
            ), scored AS (
                SELECT s.doc_id, d.lang,
                       cast(sum(nll) // (count(*) * 1000) as bigint)
                           AS avg_nll_milli
                FROM tok s JOIN documents d ON s.doc_id = d.doc_id
                GROUP BY s.doc_id, d.lang
            ), r AS (
                SELECT *,
                       row_number() OVER (PARTITION BY lang
                                          ORDER BY avg_nll_milli) AS rk,
                       count(*) OVER (PARTITION BY lang) AS n
                FROM scored
            ), thr AS (
                SELECT lang,
                       max(CASE WHEN rk = (n + 2) // 3
                                THEN avg_nll_milli END) AS q1,
                       max(CASE WHEN rk = (2 * n + 2) // 3
                                THEN avg_nll_milli END) AS q2
                FROM r GROUP BY lang
            )
            SELECT s.doc_id, s.lang, s.avg_nll_milli,
                   CASE WHEN s.avg_nll_milli <= t.q1 THEN 'head'
                        WHEN s.avg_nll_milli <= t.q2 THEN 'middle'
                        ELSE 'tail' END AS bucket
            FROM scored s JOIN thr t ON s.lang = t.lang
            ORDER BY s.doc_id
        """,
        # per-language exact-integer OLS via hugeint moment sums;
        # DuckDB // truncates toward zero — matched by _tdiv Python-side
        "lang_length_regression": r"""
            WITH d AS (
                SELECT lang,
                       cast(len(string_split_regex(trim(text), '\s+'))
                            as bigint) AS x,
                       cast(length(text) as bigint) AS y
                FROM documents
            ), m AS (
                SELECT lang, cast(count(*) as hugeint) AS n,
                       cast(sum(x) as hugeint) AS sx,
                       cast(sum(y) as hugeint) AS sy,
                       cast(sum(x * y) as hugeint) AS sxy,
                       cast(sum(x * x) as hugeint) AS sxx
                FROM d GROUP BY lang
            ), f AS (
                SELECT lang, n, sx, sy,
                       CASE WHEN n * sxx - sx * sx = 0 THEN 0
                            ELSE (n * sxy - sx * sy) * 1000000
                                 // (n * sxx - sx * sx) END AS slope
                FROM m
            )
            SELECT lang, cast(n as bigint) AS n_docs,
                   cast(slope as bigint) AS slope_micro,
                   cast((sy * 1000000 - slope * sx) // n as bigint)
                       AS intercept_micro
            FROM f ORDER BY lang
        """,
        # Zipf log-log OLS over the top-V vocab (exact integer micro-nats)
        "zipf_fit": r"""
            WITH u AS (
                SELECT unnest(string_split_regex(trim(text), '\s+')) AS w
                FROM documents
            ), vc AS (
                SELECT w, count(*) AS c FROM u GROUP BY w
            ), top AS (
                SELECT w, c FROM vc ORDER BY c DESC, w LIMIT 1000
            ), rk AS (
                SELECT row_number() OVER (ORDER BY c DESC, w) AS r, c
                FROM top
            ), pts AS (
                SELECT cast(floor(1000000 * ln(r)) as hugeint) AS x,
                       cast(floor(1000000 * ln(c)) as hugeint) AS y
                FROM rk
            ), m AS (
                SELECT cast(count(*) as hugeint) AS n,
                       sum(x) AS sx, sum(y) AS sy,
                       sum(x * y) AS sxy, sum(x * x) AS sxx
                FROM pts
            ), f AS (
                SELECT n, sx, sy,
                       CASE WHEN n * sxx - sx * sx = 0 THEN 0
                            ELSE (n * sxy - sx * sy) * 1000000
                                 // (n * sxx - sx * sx) END AS slope
                FROM m
            )
            SELECT cast(n as bigint) AS n_points,
                   cast(slope as bigint) AS slope_micro,
                   cast((sy * 1000000 - slope * sx) // n as bigint)
                       AS intercept_pico
            FROM f
        """,
        # composed prep chain: quality+lang filter → keep-first exact
        # dedup → ordered prefix-sum packing (same kernels as
        # quality_score / language_id / exact_dedup / pack_sequences)
        "training_corpus_prep": rf"""
            WITH q AS (
                SELECT doc_id, text,
                       cast(len(string_split_regex(trim(text), '\s+'))
                            as bigint) AS n_tokens,
                       cast(length(text) as bigint) AS n_chars,
                       cast(length(regexp_replace(text, '[^ ]', '', 'g'))
                            as bigint) AS n_spaces,
                       {score_cols}
                FROM (SELECT doc_id, text, ' ' || text || ' ' AS p
                      FROM documents)
            ), l AS (
                SELECT doc_id, text, n_tokens,
                       (n_chars - n_spaces) * 1000 // n_tokens AS mtl,
                       {lang_case} AS lang_pred
                FROM q
            ), f AS (
                SELECT doc_id, text, n_tokens FROM l
                WHERE lang_pred = 'en' AND mtl BETWEEN 4300 AND 4700
                      AND n_tokens >= 20
            ), d AS (
                SELECT min(doc_id) AS doc_id, min(n_tokens) AS n_tokens
                FROM f GROUP BY text
            )
            SELECT doc_id, n_tokens,
                   cast((sum(n_tokens) OVER (ORDER BY doc_id) - n_tokens)
                        // 512 as bigint) AS bin_id
            FROM d ORDER BY doc_id
        """,
        # connected components over the near-dup pairs of the augmented
        # corpus (the same ground truth embedding_near_dup reproduces):
        # recursive transitive closure, min label per dup-graph node
        "dedup_clusters": """
            WITH aug AS (
                SELECT vec_id, embedding FROM embeddings
                UNION ALL
                SELECT vec_id + 1000000,
                       list_concat([0.0::DOUBLE], embedding[2:])
                FROM embeddings
            ), pairs AS (
                SELECT a.vec_id AS va, b.vec_id AS vb
                FROM aug a JOIN aug b ON a.vec_id < b.vec_id
                WHERE cast(round(list_cosine_similarity(
                          a.embedding, b.embedding) * 1000) as bigint) >= 900
            ), edges AS (
                SELECT va AS src, vb AS dst FROM pairs
                UNION ALL SELECT vb, va FROM pairs
            ), reach AS (
                WITH RECURSIVE r(node, label) AS (
                    SELECT DISTINCT src, src FROM edges
                    UNION
                    SELECT e.dst, r.label
                    FROM r JOIN edges e ON r.node = e.src
                )
                SELECT node, min(label) AS cluster_id FROM r GROUP BY node
            )
            SELECT node AS vec_id, cast(cluster_id as bigint) AS cluster_id,
                   (node = cluster_id) AS keep
            FROM reach ORDER BY vec_id
        """,
        "exact_dedup": """
            SELECT min(doc_id) AS doc_id, count(*) AS n_dups
            FROM documents GROUP BY text ORDER BY doc_id
        """,
        # incremental wave dedup: even doc_id = ingested corpus, odd =
        # new wave; keep min-id per new text that the corpus lacks
        "incremental_dedup": """
            WITH nd AS (
                SELECT doc_id, text FROM documents WHERE doc_id % 2 = 1
            ),
            od AS (
                SELECT DISTINCT text FROM documents WHERE doc_id % 2 = 0
            ),
            g AS (
                SELECT min(doc_id) AS doc_id, count(*) AS n_new_copies,
                       text
                FROM nd GROUP BY text
            )
            SELECT g.doc_id, g.n_new_copies
            FROM g ANTI JOIN od ON g.text = od.text
            ORDER BY g.doc_id
        """,
        # exact all-pairs Jaccard over the same k-token shingle
        # definition the minhash pipeline verifies against: the LSH
        # candidates-then-verify output must EQUAL this ground truth
        # (recall argument in dedup.minhash_lsh_pairs docstring)
        "minhash_lsh_pairs": _jaccard_pairs_sql(k=3, thr_milli=500),
        "ngram_jaccard_pairs": _jaccard_pairs_sql(k=3, thr_milli=300),
        # pair counts at a threshold ladder over the same exact pair set
        "dedup_threshold_sweep": f"""
            WITH p AS ({_jaccard_pairs_sql(k=3, thr_milli=300)}),
            t(threshold_milli) AS (VALUES (300), (400), (500), (600),
                                          (700), (800), (900))
            SELECT cast(t.threshold_milli as bigint) AS threshold_milli,
                   cast(sum(CASE WHEN p.jaccard_milli >= t.threshold_milli
                                 THEN 1 ELSE 0 END) as bigint) AS n_pairs
            FROM p, t GROUP BY t.threshold_milli ORDER BY threshold_milli
        """,
        # end-to-end dedup: same pair ground truth → recursive CC →
        # anti-join of the non-min cluster members against the corpus
        "dedup_corpus": _dedup_corpus_sql(k=3, thr_milli=500),
        # Gopher rule filter: identical integer milli-unit arithmetic
        # per rule (textops.GOPHER_* constants)
        "gopher_rules": r"""
            WITH t AS (
                SELECT doc_id,
                       regexp_split_to_array(trim(text), '\s+') AS toks,
                       string_split(text, chr(10)) AS lines
                FROM documents
            ), m AS (
                SELECT doc_id,
                    len(toks) AS n_words,
                    list_aggregate(list_transform(toks, x -> len(x)),
                                   'sum') AS sum_chars,
                    list_aggregate(list_transform(toks,
                        x -> CASE WHEN regexp_matches(x, '[A-Za-z]')
                                  THEN 1 ELSE 0 END), 'sum') AS n_alpha,
                    list_aggregate(list_transform(toks,
                        x -> CASE WHEN lower(x) IN ('the','be','to','of',
                                    'and','that','have','with')
                                  THEN 1 ELSE 0 END), 'sum') AS n_stop,
                    len(lines) AS n_lines,
                    list_aggregate(list_transform(lines,
                        l -> CASE WHEN starts_with(trim(l), '- ')
                                    OR starts_with(trim(l), '•')
                                  THEN 1 ELSE 0 END), 'sum') AS n_bullet,
                    list_aggregate(list_transform(lines,
                        l -> CASE WHEN ends_with(trim(l), '...')
                                    OR ends_with(trim(l), '…')
                                  THEN 1 ELSE 0 END), 'sum') AS n_ell
                FROM t
            ), g AS (
                SELECT doc_id, n_words, n_stop,
                    sum_chars * 1000 // greatest(n_words, 1) AS mean_word_milli,
                    n_alpha * 1000 // greatest(n_words, 1) AS alpha_word_milli,
                    n_bullet * 1000 // greatest(n_lines, 1) AS bullet_milli,
                    n_ell * 1000 // greatest(n_lines, 1) AS ellipsis_milli
                FROM m
            )
            SELECT doc_id,
                   cast(n_words as bigint) AS n_words,
                   cast(mean_word_milli as bigint) AS mean_word_milli,
                   cast(alpha_word_milli as bigint) AS alpha_word_milli,
                   cast(bullet_milli as bigint) AS bullet_milli,
                   cast(ellipsis_milli as bigint) AS ellipsis_milli,
                   cast(n_stop as bigint) AS n_stopwords,
                   (n_words >= 50 AND n_words <= 100000
                    AND mean_word_milli >= 3000
                    AND mean_word_milli <= 10000
                    AND bullet_milli <= 900
                    AND ellipsis_milli <= 300
                    AND alpha_word_milli >= 800
                    AND n_stop >= 2) AS pass
            FROM g ORDER BY doc_id
        """,
        # fuzzy decontamination: best-Jaccard bench doc per contaminated
        # corpus doc (threshold 0.3, ties → lowest bench_id).  Inverted
        # join on exploded shingles (see _jaccard_pairs_sql): exact for
        # the ≥300 filter — every row that can win rn=1 AND pass the
        # threshold has a non-empty intersection, so dropping
        # zero-intersection candidates cannot change the winner.
        "fuzzy_decontam": rf"""
            {_shingle_cte_sql(3)}, bgr AS (
                SELECT doc_id AS bench_id, gr FROM g WHERE doc_id % 10 = 0
            ), cgr AS (
                SELECT doc_id, gr FROM g WHERE doc_id % 10 != 0
            ), inter AS (
                SELECT c.doc_id, b.bench_id, cast(count(*) as bigint) AS c
                FROM cgr c JOIN bgr b ON c.gr = b.gr
                GROUP BY c.doc_id, b.bench_id
            ), j AS (
                SELECT i.doc_id, i.bench_id,
                       cast(i.c * 1000 // (na.n + nb.n - i.c) as bigint)
                           AS jaccard_milli
                FROM inter i
                JOIN sz na ON na.doc_id = i.doc_id
                JOIN sz nb ON nb.doc_id = i.bench_id
            )
            SELECT doc_id, bench_id, jaccard_milli FROM (
                SELECT *, row_number() OVER (
                    PARTITION BY doc_id
                    ORDER BY jaccard_milli DESC, bench_id ASC
                ) AS rn FROM j
            ) WHERE rn = 1 AND jaccard_milli >= 300
        """,
        # exact all-ORDERED-pairs containment |Sa∩Sb|/|Sa| ≥ 0.8 over
        # the same shingle definition (prefix-filtered on the Ray side);
        # inverted-join formulation as in _jaccard_pairs_sql
        "containment_pairs": rf"""
            {_shingle_cte_sql(3)}, inter AS (
                SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                       cast(count(*) as bigint) AS c
                FROM g a JOIN g b ON a.gr = b.gr AND a.doc_id != b.doc_id
                GROUP BY a.doc_id, b.doc_id
            )
            SELECT i.doc_a AS doc_a, i.doc_b AS doc_b,
                   cast(i.c * 1000 // na.n as bigint) AS containment_milli
            FROM inter i JOIN sz na ON na.doc_id = i.doc_a
            WHERE i.c * 1000 >= 800 * na.n
        """,
        # simhash recomputed in SQL: md5 token hashes, per-bit majority
        # vote, big-endian nibble construction
        "simhash": _SIMHASH_SQL,
        # exact all-pairs hamming over the same SQL-recomputed simhash:
        # the 4×16-bit band candidates are COMPLETE for hamming ≤ 3
        # (pigeonhole), so the Ray output must EQUAL this ground truth
        "simhash_hamming_pairs": rf"""
            WITH w AS (
                SELECT doc_id, ('0x' || simhash_hex)::UBIGINT AS word
                FROM ({_SIMHASH_SQL})
            )
            SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                   cast(bit_count(xor(a.word, b.word)) AS BIGINT)
                       AS hamming
            FROM w a JOIN w b ON a.doc_id < b.doc_id
            WHERE bit_count(xor(a.word, b.word)) <= 3
        """,
        # per-doc duplicated k-gram fraction (k=5): a gram duplicated
        # when present in >= 2 distinct docs; zero-gram docs report 0s
        "duplicated_ngrams": r"""
            WITH t AS (
                SELECT doc_id,
                       regexp_split_to_array(trim(text), '\s+') AS toks
                FROM documents
            ), g AS (
                SELECT doc_id,
                       unnest(list_transform(range(1, len(toks) - 3),
                           i -> array_to_string(toks[i:i+4], ' ')
                       )) AS gram
                FROM t WHERE len(toks) >= 5
            ), occ AS (
                SELECT doc_id, gram, count(*) AS occ
                FROM g GROUP BY 1, 2
            ), dup AS (
                SELECT gram FROM occ GROUP BY gram HAVING count(*) >= 2
            ), per AS (
                SELECT o.doc_id,
                       sum(o.occ) AS n_grams,
                       sum(CASE WHEN d.gram IS NOT NULL THEN o.occ
                                ELSE 0 END) AS dup_grams
                FROM occ o LEFT JOIN dup d USING (gram) GROUP BY 1
            )
            SELECT t.doc_id,
                   cast(coalesce(per.n_grams, 0) AS BIGINT) AS n_grams,
                   cast(coalesce(per.dup_grams, 0) AS BIGINT)
                       AS dup_grams,
                   cast(CASE WHEN coalesce(per.n_grams, 0) = 0 THEN 0
                             ELSE per.dup_grams * 1000 // per.n_grams
                        END AS BIGINT) AS dup_frac_milli
            FROM t LEFT JOIN per USING (doc_id)
        """,
        # posting-list lookup for one term (tf = occurrences per doc)
        "term_postings": r"""
            SELECT doc_id, cast(count(*) AS BIGINT) AS tf
            FROM (
                SELECT doc_id,
                       unnest(regexp_split_to_array(trim(text), '\s+')) AS w
                FROM documents
            ) WHERE w = 'spark'
            GROUP BY doc_id ORDER BY doc_id
        """,
        # integer tf-idf top-k retrieval for the 2-term query
        # 'spark table' (saturating tf, exact-integer idf)
        "search_topk": r"""
            WITH toks AS (
                SELECT doc_id,
                       unnest(regexp_split_to_array(trim(text), '\s+')) AS w
                FROM documents
            ), post AS (
                SELECT w, doc_id, cast(count(*) AS BIGINT) AS tf
                FROM toks WHERE w IN ('spark', 'table') GROUP BY 1, 2
            ), df AS (
                SELECT w, cast(count(*) AS BIGINT) AS df FROM post GROUP BY 1
            ), n AS (
                SELECT cast(count(*) AS BIGINT) AS n FROM documents
            ), sc AS (
                SELECT p.doc_id,
                       sum(((1000 * n.n) // d.df) * p.tf // (p.tf + 2))
                           AS score_milli
                FROM post p JOIN df d USING (w) CROSS JOIN n
                GROUP BY p.doc_id
            )
            SELECT doc_id, cast(score_milli AS BIGINT) AS score_milli
            FROM sc ORDER BY score_milli DESC, doc_id LIMIT 10
        """,
        # per-source quota cap: 10 docs per source by Knuth-hash rank
        "source_quota_sample": """
            WITH r AS (
                SELECT doc_id, source,
                       cast((doc_id * 2654435761) % 4294967296
                            AS BIGINT) AS rank_key,
                       row_number() OVER (
                           PARTITION BY source
                           ORDER BY (doc_id * 2654435761) % 4294967296,
                                    doc_id
                       ) AS rn
                FROM documents
            )
            SELECT doc_id, source, rank_key FROM r WHERE rn <= 10
            ORDER BY source, rank_key, doc_id
        """,
        # ExactSubstr (Lee et al.) maximal duplicated k-gram spans,
        # k=8, 0-based inclusive token indices
        "duplicate_spans": r"""
            WITH t AS (
                SELECT doc_id,
                       regexp_split_to_array(trim(text), '\s+') AS toks
                FROM documents
            ), p AS (
                SELECT doc_id, toks,
                       unnest(range(1, len(toks) - 6)) AS i
                FROM t WHERE len(toks) >= 8
            ), g AS (
                SELECT doc_id, i,
                       array_to_string(toks[i:i+7], ' ') AS gram
                FROM p
            ), dup AS (
                SELECT gram FROM g GROUP BY gram HAVING count(*) >= 2
            ), f AS (
                SELECT g.doc_id, g.i FROM g JOIN dup USING (gram)
            ), m AS (
                SELECT doc_id, i,
                       CASE WHEN i - lag(i) OVER (
                                PARTITION BY doc_id ORDER BY i) < 8
                            THEN 0 ELSE 1 END AS brk
                FROM f
            ), grp AS (
                SELECT doc_id, i,
                       sum(brk) OVER (PARTITION BY doc_id ORDER BY i
                                      ROWS UNBOUNDED PRECEDING) AS gid
                FROM m
            )
            SELECT doc_id,
                   cast(min(i) - 1 AS BIGINT) AS span_start,
                   cast(max(i) + 6 AS BIGINT) AS span_end
            FROM grp GROUP BY doc_id, gid
            ORDER BY doc_id, span_start
        """,
        # ExactSubstr trim: corpus with duplicated spans cut out
        "remove_duplicate_spans": r"""
            WITH t AS (
                SELECT doc_id,
                       regexp_split_to_array(trim(text), '\s+') AS toks
                FROM documents
            ), p AS (
                SELECT doc_id, toks,
                       unnest(range(1, len(toks) - 6)) AS i
                FROM t WHERE len(toks) >= 8
            ), g AS (
                SELECT doc_id, i,
                       array_to_string(toks[i:i+7], ' ') AS gram
                FROM p
            ), dup AS (
                SELECT gram FROM g GROUP BY gram HAVING count(*) >= 2
            ), f AS (
                SELECT g.doc_id, g.i FROM g JOIN dup USING (gram)
            ), tok AS (
                SELECT doc_id, unnest(toks) AS w,
                       unnest(range(1, len(toks) + 1)) AS j
                FROM t
            ), dropped AS (
                SELECT DISTINCT tk.doc_id, tk.j
                FROM tok tk JOIN f
                  ON f.doc_id = tk.doc_id
                 AND tk.j BETWEEN f.i AND f.i + 7
            )
            SELECT tk.doc_id,
                   coalesce(string_agg(
                       CASE WHEN d.j IS NULL THEN tk.w END,
                       ' ' ORDER BY tk.j), '') AS text_clean,
                   cast(count(*) FILTER (d.j IS NULL) AS BIGINT)
                       AS n_kept_tokens,
                   cast(count(*) FILTER (d.j IS NOT NULL) AS BIGINT)
                       AS n_dropped_tokens
            FROM tok tk LEFT JOIN dropped d
              ON d.doc_id = tk.doc_id AND d.j = tk.j
            GROUP BY tk.doc_id
            ORDER BY tk.doc_id
        """,
        # source-pair distinct-k-gram overlap (contamination matrix);
        # zero-overlap pairs omitted (inner join)
        "cross_source_overlap": r"""
            WITH t AS (
                SELECT source,
                       regexp_split_to_array(trim(text), '\s+') AS toks
                FROM documents
            ), g AS (
                SELECT source,
                       unnest(list_transform(range(1, len(toks) - 3),
                           i -> array_to_string(toks[i:i+4], ' ')
                       )) AS gram
                FROM t WHERE len(toks) >= 5
            ), sg AS (
                SELECT DISTINCT source, gram FROM g
            )
            SELECT a.source AS source_a, b.source AS source_b,
                   cast(count(*) AS BIGINT) AS shared_grams
            FROM sg a JOIN sg b
                 ON a.gram = b.gram AND a.source < b.source
            GROUP BY 1, 2
        """,
        # Q17 shape: small-quantity revenue per brand; the 0.2×avg
        # threshold compared exactly in integers (qty_c·5·n < s)
        "small_quantity_revenue": """
            WITH lq AS (
                SELECT l_partkey,
                       cast(round(l_quantity * 100) as bigint) AS qty_c,
                       cast(round(l_extendedprice * 100) as bigint)
                           AS price_c
                FROM lineitem
            ), a AS (
                SELECT l_partkey, sum(qty_c) AS s, count(*) AS n
                FROM lq GROUP BY 1
            )
            SELECT p.p_brand,
                   cast(sum(l.price_c) as bigint) AS small_qty_revenue_cc
            FROM lq l
            JOIN a USING (l_partkey)
            JOIN part p ON p.p_partkey = l.l_partkey
            WHERE l.qty_c * 5 * a.n < a.s
            GROUP BY 1
        """,
        # Q22 shape: above-average-balance customers with no orders,
        # per nation; the global average compared exactly (bal_c·n > s)
        "idle_customer_balance": """
            WITH c AS (
                SELECT c_custkey, cast(c_nationkey as bigint)
                           AS c_nationkey,
                       cast(round(c_acctbal * 100) as bigint) AS bal_c
                FROM customer
            ), pos AS (
                SELECT sum(bal_c) AS s, count(*) AS n
                FROM c WHERE bal_c > 0
            )
            SELECT c.c_nationkey,
                   cast(sum(c.bal_c) as bigint) AS bal_cc,
                   cast(count(*) as bigint) AS n_cust
            FROM c CROSS JOIN pos
            WHERE c.bal_c * pos.n > pos.s
              AND NOT EXISTS (SELECT 1 FROM orders o
                              WHERE o.o_custkey = c.c_custkey
                                AND o.o_orderdate >=
                                    TIMESTAMP '1999-01-01 00:00:00')
            GROUP BY 1
        """,
        # Q21 shape: suppliers who were the only late supplier of a
        # multi-supplier order (late = shipped > 90 days after order)
        "waiting_suppliers": """
            WITH l AS (
                SELECT l.l_orderkey, l.l_suppkey,
                       CASE WHEN l.l_shipdate >
                                 o.o_orderdate + INTERVAL 90 DAY
                            THEN 1 ELSE 0 END AS late
                FROM lineitem l
                JOIN orders o ON l.l_orderkey = o.o_orderkey
            ), per AS (
                SELECT l_orderkey,
                       count(DISTINCT l_suppkey) AS n_supp,
                       count(DISTINCT CASE WHEN late = 1
                                           THEN l_suppkey END) AS n_late
                FROM l GROUP BY 1
            ), culprit AS (
                SELECT DISTINCT l.l_orderkey, l.l_suppkey
                FROM l JOIN per USING (l_orderkey)
                WHERE per.n_supp >= 2 AND per.n_late = 1 AND l.late = 1
            )
            SELECT s.s_name, cast(count(*) as bigint) AS numwait
            FROM culprit c JOIN supplier s ON s.s_suppkey = c.l_suppkey
            GROUP BY 1
        """,
        # winnowing fingerprint recomputed in SQL: md5 shingle hashes,
        # sliding-window minima, digest of sorted distinct minima
        "doc_fingerprints": r"""
            WITH t AS (
                SELECT doc_id,
                       regexp_split_to_array(trim(text), '\s+') AS toks
                FROM documents
            ), s AS (
                SELECT doc_id,
                       CASE WHEN len(toks) < 5
                            THEN [md5(array_to_string(toks, ' '))]
                            ELSE list_transform(range(1, len(toks) - 3),
                                i -> md5(array_to_string(toks[i:i+4], ' ')))
                       END AS sh
                FROM t
            ), m AS (
                SELECT doc_id,
                       CASE WHEN len(sh) <= 4
                            THEN [list_aggregate(sh, 'min')]
                            ELSE list_transform(range(1, len(sh) - 2),
                                i -> list_aggregate(sh[i:i+3], 'min'))
                       END AS mins
                FROM s
            )
            SELECT doc_id,
                   md5(array_to_string(list_sort(list_distinct(mins)), ','))
                       AS fingerprint
            FROM m
        """,
        # exact all-pairs cosine over the augmented corpus (vector ∪
        # zeroed-first-coordinate twin): the ground truth the sign-LSH
        # candidates-then-verify pipeline must reproduce at cos ≥ 0.9
        "embedding_near_dup": """
            WITH aug AS (
                SELECT vec_id, embedding FROM embeddings
                UNION ALL
                SELECT vec_id + 1000000,
                       list_concat([0.0::DOUBLE], embedding[2:])
                FROM embeddings
            )
            SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
                   cast(round(list_cosine_similarity(a.embedding, b.embedding)
                              * 1000) as bigint) AS cos_milli
            FROM aug a JOIN aug b ON a.vec_id < b.vec_id
            WHERE cast(round(list_cosine_similarity(a.embedding, b.embedding)
                             * 1000) as bigint) >= 900
            ORDER BY vec_a, vec_b
        """,
        "embedding_near_dup_exact": """
            SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
                   cast(round(list_cosine_similarity(a.embedding, b.embedding) * 1000)
                        as bigint) AS cos_milli
            FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
            WHERE cast(round(list_cosine_similarity(a.embedding, b.embedding) * 1000)
                       as bigint) >= 450
            ORDER BY vec_a, vec_b
        """,
        # knn_ivf probes ALL lists by default (exhaustive through the
        # IVF layout) ⇒ exact, same oracle as brute; the nprobe<n_lists
        # read-reduction path is asserted in tests/test_similarity
        "knn_ivf": """
            WITH q AS (
                SELECT embedding AS qe FROM embeddings WHERE vec_id = 0
            ), s AS (
                SELECT vec_id,
                       list_cosine_similarity(embedding, (SELECT qe FROM q)) AS sim
                FROM embeddings
            )
            SELECT cast(row_number() OVER (ORDER BY sim DESC, vec_id) as bigint)
                       AS rank,
                   vec_id,
                   cast(round(sim * 1000) as bigint) AS cos_milli
            FROM s ORDER BY sim DESC, vec_id LIMIT 10
        """,
        "knn_brute": """
            WITH q AS (
                SELECT embedding AS qe FROM embeddings WHERE vec_id = 0
            ), s AS (
                SELECT vec_id,
                       list_cosine_similarity(embedding, (SELECT qe FROM q)) AS sim
                FROM embeddings
            )
            SELECT cast(row_number() OVER (ORDER BY sim DESC, vec_id) as bigint)
                       AS rank,
                   vec_id,
                   cast(round(sim * 1000) as bigint) AS cos_milli
            FROM s ORDER BY sim DESC, vec_id LIMIT 10
        """,
        "knn_batch": """
            WITH qs AS (
                SELECT vec_id AS query_id, embedding AS qe
                FROM embeddings ORDER BY vec_id LIMIT 8
            ), s AS (
                SELECT q.query_id, e.vec_id,
                       list_cosine_similarity(e.embedding, q.qe) AS sim
                FROM embeddings e CROSS JOIN qs q
                WHERE e.vec_id <> q.query_id
            ), r AS (
                SELECT query_id, vec_id, sim,
                       row_number() OVER (
                           PARTITION BY query_id
                           ORDER BY sim DESC, vec_id) AS rank
                FROM s
            )
            SELECT query_id, cast(rank as bigint) AS rank, vec_id,
                   cast(round(sim * 1000) as bigint) AS cos_milli
            FROM r WHERE rank <= 5 ORDER BY query_id, rank
        """,
    })
    out.update(_multimodal_oracle_sql())
    # the bucketed scale paths must reproduce their plain operators exactly
    out["sessionize_bucketed"] = out["sessionize"]
    # exact at driver-gate scale (capacity >= n, no compaction)
    out["quantile_sketch"] = out["events_value_quantiles"]
    out["events_asof_join_bucketed"] = out["events_asof_join"]
    return out


# arithmetic media parameters per doc_id — MUST mirror
# crawl_ray.pipelines.multimodal.media_params; the payloads are real
# PNG/BMP/WAV/Y4M bytes whose decode outputs reduce to this arithmetic,
# so a broken encoder OR decoder breaks these oracles
_MEDIA_PARAMS_CTE = """
    WITH p AS (
        SELECT doc_id,
               doc_id % 4 AS kind,
               4 + (doc_id % 29) AS iw,
               4 + (doc_id % 23) AS ih,
               4 + 2 * (doc_id % 14) AS vw,
               4 + 2 * (doc_id % 10) AS vh,
               32 + (doc_id * 31) % 95 AS pv,
               64 + (doc_id % 191) AS ns,
               3 + (doc_id % 5) AS nf
        FROM documents
    )
"""


def _multimodal_oracle_sql() -> dict[str, str]:
    return {
        # closed-form file sizes: PNG uses a stored-block (level 0)
        # zlib IDAT so its size is 57 + h(1+3w) + 11; BMP rows pad to 4
        "payload_stats": _MEDIA_PARAMS_CTE + """
            SELECT doc_id,
                   CASE kind WHEN 0 THEN 'image/png' WHEN 1 THEN 'image/bmp'
                             WHEN 2 THEN 'audio/wav' ELSE 'video/y4m'
                   END AS media_type,
                   cast(CASE kind
                        WHEN 0 THEN 57 + ih * (1 + 3 * iw) + 11
                        WHEN 1 THEN 54 + ih * (((3 * iw + 3) // 4) * 4)
                        WHEN 2 THEN 44 + ns
                        ELSE length('YUV4MPEG2 W' || vw || ' H' || vh
                                    || ' F25:1') + 1
                             + nf * (6 + (vw * vh * 3) // 2)
                   END as bigint) AS n_bytes
            FROM p ORDER BY doc_id
        """,
        "decode_images": _MEDIA_PARAMS_CTE + """
            SELECT doc_id,
                   CASE kind WHEN 0 THEN 'image/png' ELSE 'image/bmp'
                   END AS media_type,
                   cast(iw as bigint) AS width,
                   cast(ih as bigint) AS height,
                   cast(pv as bigint) AS mean_px
            FROM p WHERE kind IN (0, 1) ORDER BY doc_id
        """,
        "decode_audio": _MEDIA_PARAMS_CTE + """
            SELECT doc_id,
                   cast(8000 as bigint) AS sample_rate,
                   cast(ns as bigint) AS n_samples,
                   cast(ns * 1000 // 8000 as bigint) AS duration_ms,
                   cast(pv as bigint) AS mean_amp
            FROM p WHERE kind = 2 ORDER BY doc_id
        """,
        "resize_images": _MEDIA_PARAMS_CTE + """
            SELECT doc_id,
                   cast(CASE WHEN greatest(iw, ih) <= 16 THEN iw
                             ELSE greatest(1, (iw * 16) // greatest(iw, ih))
                        END as bigint) AS width,
                   cast(CASE WHEN greatest(iw, ih) <= 16 THEN ih
                             ELSE greatest(1, (ih * 16) // greatest(iw, ih))
                        END as bigint) AS height,
                   cast(pv as bigint) AS mean_px
            FROM p WHERE kind IN (0, 1) ORDER BY doc_id
        """,
        "sample_frames": _MEDIA_PARAMS_CTE + """
            SELECT doc_id,
                   cast(i as bigint) AS sample_i,
                   cast((i * (nf - 1)) // 3 as bigint) AS frame_idx,
                   md5(repeat(chr(cast(32 + (doc_id * 31
                                        + ((i * (nf - 1)) // 3) * 7) % 95
                                       as integer)),
                              (vw * vh * 3) // 2)) AS frame_md5
            FROM p, range(0, 4) t(i)
            WHERE kind = 3 ORDER BY doc_id, sample_i
        """,
    }
