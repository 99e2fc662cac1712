"""Regression tests for the round-4 session-5 review findings:
empty-corpus LM ops, zero-survivor prepped export, concurrent-seed
seq uniqueness, legacy-transport POST refusal, nation FK-gap guard."""

import json

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from crawl_ray import cli


def _write_documents(tmp_path, rows):
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([r[0] for r in rows], pa.int64()),
                "text": pa.array([r[1] for r in rows], pa.string()),
                "lang": pa.array([r[2] for r in rows], pa.string()),
            }
        ),
        tmp_path / "documents.parquet",
    )


def test_empty_corpus_lm_ops(ray_session, tmp_path):
    """0-row documents table: the vocab-truncation helper returns typed
    empties instead of KeyError'ing on the Aggregate's schema-less
    empty block; zipf_fit's intercept division is guarded."""
    from crawl_ray.pipelines import textops as T

    _write_documents(tmp_path, [])
    d = str(tmp_path)

    scored = T.unigram_logprob(d)
    assert scored.count() == 0

    z = T.zipf_fit(d)
    assert z.column("n_points")[0].as_py() == 0
    assert z.column("slope_micro")[0].as_py() == 0
    assert z.column("intercept_pico")[0].as_py() == 0

    tf = T.tfidf_top_terms(d)
    n = tf.num_rows if hasattr(tf, "num_rows") else tf.count()
    assert n == 0


def test_export_prepped_zero_survivors(ray_session, tmp_path):
    """A fully-filtered prep (zero survivors) is a legal empty export:
    manifest {} + _SUCCESS, not an ArrowInvalid join crash."""
    import pathlib

    import ray.data as rd

    from crawl_ray.sources.export import export_prepped_parquet

    _write_documents(tmp_path, [(0, "hello world", "en")])
    empty_prep = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([], pa.int64()),
                "n_tokens": pa.array([], pa.int64()),
                "bin_id": pa.array([], pa.int64()),
            }
        )
    )
    root = pathlib.Path(
        export_prepped_parquet(str(tmp_path), empty_prep, n_shards=2)
    )
    assert (root / "_SUCCESS").exists()
    assert json.loads((root / "manifest.json").read_text()) == {}


def test_seed_claimed_slot_keeps_seq_unique(tmp_path, capsys):
    """A concurrent `seed` that claimed a slot but hasn't renamed its
    part yet must not share a seq_root with the next invocation: the
    claim marker advances both the slot index and the seq offset."""
    import os

    wd = tmp_path / "c"
    frontier = wd / "round=0" / "frontier"
    frontier.mkdir(parents=True)
    # simulate an in-flight concurrent seed: slot 0 claimed, part not
    # yet visible to the glob
    os.close(os.open(frontier / ".claim-0", os.O_CREAT | os.O_EXCL))

    cli.main(["seed", "--workdir", str(wd), "--callback", "page",
              "http://host0.example/p/0"])
    out = json.loads(capsys.readouterr().out.strip())
    assert out["seq"] == 1  # slot 0 belongs to the in-flight seeder
    files = sorted(frontier.glob("seed-*.parquet"))
    assert len(files) == 1 and files[0].name.startswith("seed-1-")

    # a third seed claims slot 2 and gets offset 2
    cli.main(["seed", "--workdir", str(wd), "--callback", "page",
              "http://host1.example/p/1"])
    out = json.loads(capsys.readouterr().out.strip())
    assert out["seq"] == 2


def test_legacy4_transport_post_is_typed_error():
    """A 4-param injected transport cannot carry a Form⇒POST body:
    the row gets a typed 'transport' error, never a body-less GET."""
    from crawl_ray.stages.fetch import HttpFetchStage

    seen = []

    def legacy(url, headers, proxy, timeout):
        seen.append(url)
        return 200, b"<html>ok</html>", ""

    stage = HttpFetchStage(transport=legacy)
    batch = pa.table(
        {
            "url": pa.array(
                ["http://a.example/get", "http://a.example/post"],
                pa.string(),
            ),
            "url_hash": pa.array([1, 2], pa.uint64()),
            "metadata": pa.array(["", ""], pa.string()),
            "method": pa.array(["GET", "POST"], pa.string()),
            "form": pa.array(["", json.dumps({"k": ["v"]})], pa.string()),
        }
    )
    out = stage(batch)
    status = out.column("status").to_pylist()
    kinds = out.column("fetch_error_kind").to_pylist()
    assert status[0] == 200 and kinds[0] == ""
    assert status[1] == 0 and kinds[1] == "transport"
    assert "POST" in out.column("fetch_error")[1].as_py()
    assert seen == ["http://a.example/get"]  # POST never hit the wire


def test_orders_per_nation_fk_gap_raises(ray_session, tmp_path):
    """A nationkey gap inside 0..max must fail loudly, not emit null
    n_name rows through the dense-array take."""
    from crawl_ray.pipelines.relational import orders_per_nation

    pq.write_table(
        pa.table(
            {
                "n_nationkey": pa.array([0, 2], pa.int64()),  # gap at 1
                "n_name": pa.array(["ALGERIA", "BRAZIL"], pa.string()),
            }
        ),
        tmp_path / "nation.parquet",
    )
    pq.write_table(
        pa.table(
            {
                "c_custkey": pa.array([10], pa.int64()),
                "c_nationkey": pa.array([1], pa.int64()),  # the gap
            }
        ),
        tmp_path / "customer.parquet",
    )
    pq.write_table(
        pa.table(
            {
                "o_custkey": pa.array([10], pa.int64()),
                "o_totalprice": pa.array([100.0], pa.float64()),
            }
        ),
        tmp_path / "orders.parquet",
    )
    with pytest.raises(Exception, match="c_nationkey not in nation"):
        orders_per_nation(str(tmp_path))


def test_canonicalize_expired_message_and_null_coalesce():
    """Expired rows carry 'deadline expired' as the error message (the
    path column doubles as the message downstream), and schema-promoted
    null seq_path/callbacks coalesce instead of crashing order_key."""
    from crawl_ray.stages.canonicalize import canonicalize_batch

    batch = pa.table(
        {
            "url": pa.array(
                ["http://h.example/some/page?q=1", "http://h.example/ok"],
                pa.string(),
            ),
            "callbacks": pa.array([["page"], None],
                                  pa.list_(pa.string())),
            "seq_path": pa.array([b"\x00", None], pa.binary()),
            "deadline": pa.array([5, None], pa.timestamp("us")),
        }
    )
    out = canonicalize_batch(batch, now_us=1_000_000)
    disp = out.column("disposition").to_pylist()
    paths = out.column("path").to_pylist()
    assert disp[0] == "expired" and paths[0] == "deadline expired"
    assert disp[1] == "ok"
    assert out.column("seq_path")[1].as_py() == b""
    assert out.column("callbacks")[1].as_py() == []


def test_middleware_sees_deadline_and_bad_json_is_per_row():
    """Middlewares receive the row's real deadline (simulator parity),
    and malformed cookies JSON routes that ROW to an error disposition
    instead of crashing the whole batch."""
    from crawl_ray.request import HandlerRegistry
    from crawl_ray.stages.canonicalize import canonicalize_batch

    seen_deadlines = []

    def spider(reg: HandlerRegistry):
        reg.middleware(
            lambda req, eff: seen_deadlines.append(req.deadline)
        )

    batch = pa.table(
        {
            "url": pa.array(
                ["http://h.example/a", "http://h.example/b"], pa.string()
            ),
            "cookies": pa.array(["", "{bad json"], pa.string()),
            "deadline": pa.array([10_000_000, None], pa.timestamp("us")),
        }
    )
    out = canonicalize_batch(batch, now_us=0, spiders=[spider])
    disp = out.column("disposition").to_pylist()
    assert disp[0] == "ok" and seen_deadlines == [10_000_000]
    assert disp[1] == "badurl"  # per-row, not a batch crash


def test_round_half_away_boundary_and_fsl_matrix():
    from crawl_ray.util import list_col_to_matrix, round_half_away

    assert round_half_away(0.49999999999999994) == 0.0  # no double-round
    assert round_half_away(2.5) == 3.0 and round_half_away(-2.5) == -3.0
    fsl = pa.array([[1.0, 2.0], [3.0, 4.0]], pa.list_(pa.float64(), 2))
    m = list_col_to_matrix(fsl)
    assert m.shape == (2, 2) and m[1, 1] == 4.0


def test_store_root_empty_env_is_unset(monkeypatch):
    from crawl_ray import storage

    monkeypatch.setenv("CRAWL_RAY_STORE_ROOT", "")
    assert not storage._root_is_configured()
    assert str(storage.store_root()) == storage.DEFAULT_STORE_ROOT


def test_events_ops_empty_table(ray_session, tmp_path):
    """All events-family operators must handle a 0-row events table
    (zero-column empty blocks short-circuit map UDFs): typed empty
    results, not ArrowInvalid crashes."""
    pq.write_table(
        pa.table({
            "event_id": pa.array([], pa.int64()),
            "user_id": pa.array([], pa.int64()),
            "event_type": pa.array([], pa.string()),
            "ts": pa.array([], pa.timestamp("us")),
            "value": pa.array([], pa.float64()),
        }),
        tmp_path / "events.parquet",
    )
    from crawl_ray.pipelines import stats as S
    from crawl_ray.pipelines import streams as ST

    d = str(tmp_path)
    ops = [
        S.events_value_quantiles, S.value_quantiles_per_type,
        S.events_mad, S.events_outliers, S.windowed_quantiles,
        S.hll_distinct_users, S.retained_users, S.churned_users,
        ST.events_gap_stats, ST.event_transition_matrix,
        ST.events_funnel, ST.events_late_data, ST.events_window_distinct,
    ]
    for fn in ops:
        r = fn(d)
        n = r.num_rows if hasattr(r, "num_rows") else r.count()
        # events_value_quantiles reports its five fixed quantile labels
        assert n == (5 if fn is S.events_value_quantiles else 0), fn
