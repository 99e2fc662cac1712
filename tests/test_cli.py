"""CLI surface (seed / run / status) — the reference's entry points."""

import json

import pyarrow.parquet as pq
import pytest

from crawl_ray import cli
from crawl_ray.fixtures import generate_pages, generate_robots


@pytest.fixture(scope="module")
def web(tmp_path_factory):
    pages = generate_pages(120)
    d = tmp_path_factory.mktemp("cliweb")
    pq.write_table(pages, d / "pages.parquet")
    pq.write_table(generate_robots(pages), d / "robots.parquet")
    return pages, d


def test_seed_appends_with_monotone_seq(tmp_path, capsys):
    wd = str(tmp_path / "c")
    cli.main(["seed", "--workdir", wd, "--callback", "page",
              "http://host0.example/p/0"])
    cli.main(["seed", "--workdir", wd, "--callback", "page",
              "--callback", "list", "--metadata", "k=v",
              "http://host1.example/p/1"])
    out = [json.loads(l) for l in capsys.readouterr().out.strip().splitlines()]
    assert [o["seq"] for o in out] == [0, 1]
    files = sorted((tmp_path / "c" / "round=0" / "frontier").glob("*.parquet"))
    assert len(files) == 2
    t = pq.read_table(str(files[1]))
    assert t.column("callbacks")[0].as_py() == ["page", "list"]
    assert json.loads(t.column("metadata")[0].as_py()) == {"k": "v"}


def test_seed_requires_callback(tmp_path):
    with pytest.raises(SystemExit):
        cli.main(["seed", "--workdir", str(tmp_path / "x"),
                  "http://host0.example/p/0"])


def test_seed_then_run_then_status(web, tmp_path, capsys, ray_session):
    pages, d = web
    wd = str(tmp_path / "crawl")
    url = pages.column("url")[0].as_py()
    cli.main(["seed", "--workdir", wd, "--callback", "page", url])
    capsys.readouterr()
    cli.main(["run", "--pages", str(d / "pages.parquet"),
              "--robots", str(d / "robots.parquet"),
              "--workdir", wd, "--max-rounds", "4",
              "--shards", "2", "--concurrency", "2"])
    run_out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert run_out["admitted"] >= 1
    assert run_out["records"] >= 1

    cli.main(["status", "--workdir", wd])
    status = json.loads(capsys.readouterr().out)
    committed = [r for r in status["rounds"] if r["committed"]]
    assert committed and committed[0]["round"] == 0
    assert committed[0]["metrics"]["admitted"] >= 1

    # ray session must survive (run must not shut down a shared session)
    import ray

    assert ray.is_initialized()


def test_dump_sample(tmp_path):
    from crawl_ray.cli import main
    from crawl_ray.fixtures import fixture_dir

    d = fixture_dir(500)
    out = tmp_path / "dump"
    main(["dump-sample", "--pages", f"{d}/pages.parquet",
          "--out", str(out), "-n", "3"])
    files = sorted(out.glob("sample-*.html"))
    assert len(files) == 3
    assert files[0].read_bytes().startswith(b"<html>")


def test_run_follow_daemon_mode(web, tmp_path):
    """Consumer daemon mode (nsq/consumer/app.go:80-135 analog): a
    --follow process drains the initial wave, picks up a seed part
    appended MID-RUN by the `seed` CLI, crawls it as a second wave, and
    drains gracefully on SIGINT."""
    import os
    import selectors
    import signal
    import subprocess
    import sys
    import time

    pages, d = web
    wd = str(tmp_path / "followcrawl")
    urls = pages.column("url").to_pylist()
    cli.main(["seed", "--workdir", wd, "--callback", "page", urls[0]])

    env = dict(os.environ)
    env.pop("RAY_ADDRESS", None)
    proc = subprocess.Popen(
        [sys.executable, "-u", "-m", "crawl_ray.cli", "run",
         "--pages", str(d / "pages.parquet"), "--workdir", wd,
         "--max-rounds", "8", "--shards", "2", "--concurrency", "2",
         "--follow", "--poll-interval", "0.2"],
        stdout=subprocess.PIPE, stderr=subprocess.DEVNULL, text=True, env=env,
    )
    sel = selectors.DefaultSelector()
    sel.register(proc.stdout, selectors.EVENT_READ)

    def read_event(want: str, timeout: float) -> dict:
        deadline = time.monotonic() + timeout
        while time.monotonic() < deadline:
            if not sel.select(timeout=0.5):
                continue
            line = proc.stdout.readline()
            if not line:
                break
            try:
                ev = json.loads(line)
            except ValueError:
                continue
            if ev.get("event") == want:
                return ev
        raise AssertionError(f"no {want!r} event within {timeout}s")

    try:
        first = read_event("drained", 180)
        assert first["records"] >= 1
        # inject a seed the first wave did NOT reach (an already-seen
        # URL would be admission-dropped — correct, but proves less)
        import pathlib

        visited = set()
        for f in pathlib.Path(wd).glob("round=*/trace/*.parquet"):
            visited.update(pq.read_table(str(f), columns=["url"])
                           .column("url").to_pylist())
        fresh = next(u for u in urls if u not in visited)
        cli.main(["seed", "--workdir", wd, "--callback", "page", fresh])
        second = read_event("drained", 180)
        assert second["waves"] == 2
        assert second["records"] > first["records"]
        proc.send_signal(signal.SIGINT)
        closed = read_event("closed", 60)
        assert closed["waves"] == 2
        assert proc.wait(timeout=60) == 0
    finally:
        if proc.poll() is None:
            proc.kill()
            proc.wait()


def test_corpus_prep_end_to_end(capsys, ray_session):
    import pathlib

    cli.main(["corpus-prep", "/root/testdata/sf0.001", "--shards", "4"])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["prepped_rows"] > 0
    src_rows = pq.read_metadata(
        "/root/testdata/sf0.001/documents.parquet"
    ).num_rows
    # the export ships the PREPPED corpus: exactly the surviving rows,
    # strictly fewer than the raw table (the filters drop documents)
    assert sum(out["shards"].values()) == out["prepped_rows"] < src_rows
    # exported rows carry the joined text + packed bin assignment
    root = pathlib.Path(out["export_root"])
    one = next(root.glob("shard=*/part-*.parquet"))
    cols = set(pq.read_schema(str(one)).names)
    assert {"doc_id", "text", "lang", "bin_id"} <= cols
    # second invocation rebuilds and lands on the same root with the
    # same counts (deterministic one-shot)
    cli.main(["corpus-prep", "/root/testdata/sf0.001", "--shards", "4"])
    out2 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out2["export_root"] == out["export_root"]
    assert out2["shards"] == out["shards"]


def test_follow_resume_injects_downtime_seeds(web, tmp_path):
    """A seed added WHILE THE DAEMON IS DOWN must be crawled by the
    next `run --follow --resume` wave: resume never re-reads round-0,
    so the daemon re-injects all round-0 parts into the resume round
    (idempotent — already-crawled seeds drop via the seen-set)."""
    import os
    import pathlib
    import selectors
    import signal
    import subprocess
    import sys
    import time

    pages, d = web
    wd = str(tmp_path / "downtime")
    urls = pages.column("url").to_pylist()
    cli.main(["seed", "--workdir", wd, "--callback", "page", urls[0]])

    env = dict(os.environ)
    env.pop("RAY_ADDRESS", None)

    def run_daemon(extra):
        return subprocess.Popen(
            [sys.executable, "-u", "-m", "crawl_ray.cli", "run",
             "--pages", str(d / "pages.parquet"), "--workdir", wd,
             "--max-rounds", "6", "--shards", "2", "--concurrency", "2",
             "--follow", "--poll-interval", "0.2", *extra],
            stdout=subprocess.PIPE, stderr=subprocess.DEVNULL,
            text=True, env=env,
        )

    def read_event(proc, want, timeout):
        sel = selectors.DefaultSelector()
        sel.register(proc.stdout, selectors.EVENT_READ)
        deadline = time.monotonic() + timeout
        while time.monotonic() < deadline:
            if not sel.select(timeout=0.5):
                continue
            line = proc.stdout.readline()
            if not line:
                break
            try:
                ev = json.loads(line)
            except ValueError:
                continue
            if ev.get("event") == want:
                return ev
        raise AssertionError(f"no {want!r} event within {timeout}s")

    # wave 1, then clean shutdown
    proc = run_daemon([])
    try:
        read_event(proc, "drained", 180)
        proc.send_signal(signal.SIGINT)
        assert proc.wait(timeout=60) == 0
    finally:
        if proc.poll() is None:
            proc.kill()
            proc.wait()

    # daemon down: seed a URL the first wave did not visit
    visited = set()
    for f in pathlib.Path(wd).glob("round=*/trace/*.parquet"):
        visited.update(pq.read_table(str(f), columns=["url"])
                       .column("url").to_pylist())
    fresh = next(u for u in urls if u not in visited)
    cli.main(["seed", "--workdir", wd, "--callback", "page", fresh])

    # restart with --resume: the downtime seed must be crawled in wave 0
    proc = run_daemon(["--resume"])
    try:
        read_event(proc, "drained", 180)
        proc.send_signal(signal.SIGINT)
        proc.wait(timeout=60)
    finally:
        if proc.poll() is None:
            proc.kill()
            proc.wait()
    visited2 = set()
    for f in pathlib.Path(wd).glob("round=*/trace/*.parquet"):
        visited2.update(pq.read_table(str(f), columns=["url"])
                        .column("url").to_pylist())
    assert fresh in visited2, "downtime-appended seed was never crawled"


def test_seed_priority_and_legacy_part_mix(web, tmp_path, ray_session, capsys):
    """`seed --priority` writes a float32 priority column; a frontier
    dir mixing pre-priority (legacy) parts with new ones must
    null-coalesce to the column default instead of crashing the
    extract stage, and the prioritized seed must crawl first."""
    import pyarrow as pa

    from crawl_ray.schemas import FRONTIER_SCHEMA, seq_root

    pages, d = web
    urls = pages.column("url").to_pylist()
    wd = tmp_path / "crawl"
    fr = wd / "round=0" / "frontier"
    fr.mkdir(parents=True)
    # legacy part: the pre-upgrade seed layout WITHOUT a priority column
    legacy = pa.table(
        {
            "url": pa.array([urls[5]], pa.string()),
            "method": pa.array(["GET"], pa.string()),
            "referer": pa.array([""], pa.string()),
            "form": pa.array([""], pa.string()),
            "callbacks": pa.array([["page"]], pa.list_(pa.string())),
            "metadata": pa.array([""], pa.string()),
            "deadline": pa.array([None], pa.timestamp("us")),
            "seq_path": pa.array([seq_root(0)], pa.binary()),
        }
    )
    pq.write_table(legacy, fr / "seed-0-aaaa.parquet")
    cli.main(["seed", "--workdir", str(wd), "--callback", "page",
              "--priority", "3.0", urls[9]])
    capsys.readouterr()
    cli.main(["run", "--pages", str(d / "pages.parquet"),
              "--robots", str(d / "robots.parquet"),
              "--workdir", str(wd), "--max-rounds", "2", "--shards", "2",
              "--concurrency", "2"])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["records"] >= 2  # both seeds crawled, no null-priority crash

    # O2: within round 0 the prioritized seed's order_key sorts FIRST
    trace_files = sorted((wd / "round=0" / "trace").glob("*.parquet"))
    t = pa.concat_tables([pq.read_table(str(f)) for f in trace_files])
    rows = sorted(zip(t.column("order_key").to_pylist(),
                      t.column("url").to_pylist()))
    assert rows[0][1] == urls[9]


def test_follow_resume_fresh_workdir_polls_no_echo(web, tmp_path):
    """`run --follow --resume` on a fresh EMPTY workdir must enter the
    poll loop (not crash engine.run with 'seeds required'), and a
    first-seed wave on an uncommitted workdir must not echo: the
    injected parts already sit in round 0, so re-copying them would be
    rediscovered as 'new' and run a spurious admit-nothing wave."""
    import os
    import selectors
    import signal
    import subprocess
    import sys
    import time

    pages, d = web
    wd = str(tmp_path / "fresh")
    urls = pages.column("url").to_pylist()

    env = dict(os.environ)
    env.pop("RAY_ADDRESS", None)
    proc = subprocess.Popen(
        [sys.executable, "-u", "-m", "crawl_ray.cli", "run",
         "--pages", str(d / "pages.parquet"), "--workdir", wd,
         "--max-rounds", "4", "--shards", "2", "--concurrency", "2",
         "--follow", "--poll-interval", "0.2", "--resume"],
        stdout=subprocess.PIPE, stderr=subprocess.DEVNULL,
        text=True, env=env,
    )

    def read_drained(timeout):
        sel = selectors.DefaultSelector()
        sel.register(proc.stdout, selectors.EVENT_READ)
        deadline = time.monotonic() + timeout
        while time.monotonic() < deadline:
            if not sel.select(timeout=0.5):
                continue
            line = proc.stdout.readline()
            if not line:
                break
            try:
                ev = json.loads(line)
            except ValueError:
                continue
            if ev.get("event") == "drained":
                return ev
        return None

    try:
        # daemon up and polling (the old bug: ValueError crash-loop);
        # give it a beat, then seed the first URL
        time.sleep(2.0)
        assert proc.poll() is None, "daemon exited instead of polling"
        cli.main(["seed", "--workdir", wd, "--callback", "page", urls[1]])
        ev = read_drained(180)
        assert ev is not None and ev["waves"] == 1
        # echo check: with no new seed, NO second wave may fire
        assert read_drained(3) is None, "echo wave on uncommitted workdir"
        # a second seed drains exactly one more wave
        cli.main(["seed", "--workdir", wd, "--callback", "page", urls[2]])
        ev = read_drained(180)
        assert ev is not None and ev["waves"] == 2
        proc.send_signal(signal.SIGINT)
        assert proc.wait(timeout=60) == 0
    finally:
        if proc.poll() is None:
            proc.kill()
            proc.wait()


def test_follow_resume_with_seeds_table_converts(web, tmp_path):
    """--follow --resume --seeds on a workdir with committed rounds:
    engine.run now REFUSES a seeds table on resume, so the daemon must
    convert it into a round-0 seed part and inject it into the resume
    round — the seeds crawl, nothing silently drops."""
    import os
    import pathlib
    import selectors
    import signal
    import subprocess
    import sys
    import time

    import pyarrow as pa

    pages, d = web
    wd = str(tmp_path / "conv")
    urls = pages.column("url").to_pylist()
    cli.main(["seed", "--workdir", wd, "--callback", "page", urls[0]])

    env = dict(os.environ)
    env.pop("RAY_ADDRESS", None)
    base = [sys.executable, "-u", "-m", "crawl_ray.cli", "run",
            "--pages", str(d / "pages.parquet"), "--workdir", wd,
            "--max-rounds", "4", "--shards", "2", "--concurrency", "2"]
    # wave 1: commit rounds, then exit
    assert subprocess.run(base, env=env, stdout=subprocess.DEVNULL,
                          stderr=subprocess.DEVNULL).returncode == 0

    visited = set()
    for f in pathlib.Path(wd).glob("round=*/trace/*.parquet"):
        visited.update(pq.read_table(str(f), columns=["url"])
                       .column("url").to_pylist())
    fresh = next(u for u in urls if u not in visited)
    seeds_file = tmp_path / "top_up.parquet"
    pq.write_table(
        pa.table({"url": pa.array([fresh], pa.string()),
                  "callbacks": pa.array([["page"]], pa.list_(pa.string()))}),
        seeds_file,
    )

    proc = subprocess.Popen(
        base + ["--follow", "--resume", "--poll-interval", "0.2",
                "--seeds", str(seeds_file)],
        stdout=subprocess.PIPE, stderr=subprocess.DEVNULL, text=True,
        env=env,
    )
    try:
        sel = selectors.DefaultSelector()
        sel.register(proc.stdout, selectors.EVENT_READ)
        deadline = time.monotonic() + 180
        drained = None
        while time.monotonic() < deadline and drained is None:
            if not sel.select(timeout=0.5):
                continue
            line = proc.stdout.readline()
            if not line:
                break
            try:
                ev = json.loads(line)
            except ValueError:
                continue
            if ev.get("event") == "drained":
                drained = ev
        assert drained is not None, "no drained event"
        proc.send_signal(signal.SIGINT)
        assert proc.wait(timeout=60) == 0
    finally:
        if proc.poll() is None:
            proc.kill()
            proc.wait()

    visited2 = set()
    for f in pathlib.Path(wd).glob("round=*/trace/*.parquet"):
        visited2.update(pq.read_table(str(f), columns=["url"])
                        .column("url").to_pylist())
    assert fresh in visited2, "--seeds table was dropped on follow-resume"


def _disjoint_web(tmp_path, hosts=("a.example", "b.example"), n=4):
    """Two link-disjoint host clusters: union-identical records across
    competing consumers vs a single daemon hold by construction."""
    import pyarrow as pa

    from crawl_ray.schemas import PAGES_SCHEMA
    from crawl_ray.fixtures import EPOCH_US

    urls, htmls, texts = [], [], []
    for host in hosts:
        for i in range(n):
            links = "".join(
                f'<a href="/p/{j}">n{j}</a>' for j in (i + 1, i + 2) if j < n
            )
            urls.append(f"http://{host}/p/{i}")
            htmls.append(
                f"<html><head><title>{host} {i}</title></head>"
                f"<body>page {i} of {host} {links}</body></html>".encode()
            )
            texts.append("")
    t = pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "warc_ts": pa.array([EPOCH_US] * len(urls), pa.timestamp("us")),
            "html": pa.array(htmls, pa.binary()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(["en"] * len(urls), pa.string()),
        },
        schema=PAGES_SCHEMA,
    )
    p = tmp_path / "disjoint_pages.parquet"
    pq.write_table(t, p)
    return str(p), [f"http://{h}/p/0" for h in hosts]


def _records_urls(wd):
    import pathlib

    out = set()
    for f in pathlib.Path(wd).glob("round=*/records/*.parquet"):
        out.update(pq.read_table(str(f), columns=["url"])
                   .column("url").to_pylist())
    return out


def test_follow_competing_consumers_split_topic(tmp_path, ray_session):
    """NSQ channel semantics (nsq/nsqcrawl/queue.go:18-26): two
    --follow daemons on ONE shared topic dir claim disjoint seed parts
    and their records union-match a solo run over the same seeds."""
    import os
    import pathlib
    import selectors
    import signal
    import subprocess
    import sys
    import time

    import pyarrow as pa

    pages_path, (url_a, url_b) = _disjoint_web(tmp_path)
    topic_wd = str(tmp_path / "topic")
    topic = pathlib.Path(topic_wd) / "round=0" / "frontier"

    env = dict(os.environ)
    env.pop("RAY_ADDRESS", None)

    def start(name):
        proc = subprocess.Popen(
            [sys.executable, "-u", "-m", "crawl_ray.cli", "run",
             "--pages", pages_path, "--workdir", str(tmp_path / name),
             "--max-rounds", "8", "--shards", "2", "--concurrency", "2",
             "--follow", "--poll-interval", "0.2",
             "--seeds-dir", str(topic), "--consumer-id", name],
            stdout=subprocess.PIPE, stderr=subprocess.DEVNULL,
            text=True, env=env,
        )
        sel = selectors.DefaultSelector()
        sel.register(proc.stdout, selectors.EVENT_READ)
        return proc, sel

    def read_event(proc, sel, want, timeout):
        deadline = time.monotonic() + timeout
        while time.monotonic() < deadline:
            if not sel.select(timeout=0.5):
                continue
            line = proc.stdout.readline()
            if not line:
                break
            try:
                ev = json.loads(line)
            except ValueError:
                continue
            if ev.get("event") == want:
                return ev
        raise AssertionError(f"no {want!r} event within {timeout}s")

    cli.main(["seed", "--workdir", topic_wd, "--callback", "page", url_a])
    p1, s1 = start("c1")
    p2 = None
    try:
        first = read_event(p1, s1, "drained", 180)
        assert first["records"] >= 1
        # freeze c1 so the second part is DETERMINISTICALLY claimed by
        # c2 (NSQ guarantees exactly-one delivery, not fairness)
        os.kill(p1.pid, signal.SIGSTOP)
        p2, s2 = start("c2")
        cli.main(["seed", "--workdir", topic_wd, "--callback", "page",
                  url_b])
        second = read_event(p2, s2, "drained", 180)
        assert second["records"] >= 1
        os.kill(p1.pid, signal.SIGCONT)

        # disjoint ownership: every part claimed exactly once, both
        # consumers own at least one
        claims = sorted((topic / ".claims").glob("*.claim"))
        owners = [c.read_text().strip() for c in claims]
        assert len(claims) == 2
        assert sorted(owners) == ["c1", "c2"], owners

        for proc in (p1, p2):
            proc.send_signal(signal.SIGINT)
        read_event(p1, s1, "closed", 120)
        read_event(p2, s2, "closed", 120)
    finally:
        for proc in (p1, p2):
            if proc is not None:
                proc.kill()
                proc.wait()

    rec_c1 = _records_urls(tmp_path / "c1")
    rec_c2 = _records_urls(tmp_path / "c2")
    assert rec_c1 and rec_c2
    assert not (rec_c1 & rec_c2), "consumers crawled overlapping waves"

    # union-identical vs a single engine over the same seed set
    solo_wd = str(tmp_path / "solo")
    seeds = pa.table({
        "url": pa.array([url_a, url_b], pa.string()),
        "callbacks": pa.array([["page"], ["page"]],
                              pa.list_(pa.string())),
    })
    seeds_p = tmp_path / "solo_seeds.parquet"
    pq.write_table(seeds, seeds_p)
    cli.main(["run", "--pages", pages_path, "--workdir", solo_wd,
              "--seeds", str(seeds_p), "--max-rounds", "8",
              "--shards", "2", "--concurrency", "2"])
    assert rec_c1 | rec_c2 == _records_urls(solo_wd)


def test_cluster_smoke_ci_mode(tmp_path):
    """examples/cluster_smoke.py --ci: the documented `ray job submit`
    entry point must run single-node end-to-end (attested store root,
    flagship crawl, idempotent resume) and print its JSON line."""
    import os
    import subprocess
    import sys

    env = dict(os.environ)
    env.pop("RAY_ADDRESS", None)
    env["CRAWL_RAY_STORE_ROOT"] = str(tmp_path / "shared")
    out = subprocess.run(
        [sys.executable, "examples/cluster_smoke.py", "--ci",
         "--n-pages", "300", "--run-name", "smoke-test"],
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        env=env, capture_output=True, text=True, timeout=300,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    ev = json.loads(out.stdout.strip().splitlines()[-1])
    assert ev["records"] > 0
    assert ev["resume_ok"] is True
    assert ev["workdir"].startswith(str(tmp_path / "shared"))


def test_seed_claim_files_record_row_counts(tmp_path):
    """Multi-row injected parts must not collide seq roots with a
    concurrent seeder: each claim file records its part's row count at
    claim time, and offsets sum claim CONTENTS (not one-per-claim) for
    claims whose parts haven't materialized yet."""
    import pyarrow as pa

    from crawl_ray.cli import _append_seed_part

    wd = str(tmp_path / "wd")

    def part(urls):
        return pa.table({
            "url": pa.array(urls, pa.string()),
            "callbacks": pa.array([["page"]] * len(urls),
                                  pa.list_(pa.string())),
        })

    _, off0 = _append_seed_part(wd, part(["http://a.example/0",
                                          "http://a.example/1",
                                          "http://a.example/2"]))
    assert off0 == 0
    frontier = tmp_path / "wd" / "round=0" / "frontier"
    claim0 = frontier / ".claim-0"
    assert claim0.read_text() == "3"

    # simulate a claimed-but-not-yet-renamed multi-row injection: a
    # bare claim recording 5 rows with NO part file present
    (frontier / ".claim-1").write_text("5")
    _, off2 = _append_seed_part(wd, part(["http://a.example/9"]))
    # 3 materialized rows + 5 claimed in-flight rows
    assert off2 == 8
