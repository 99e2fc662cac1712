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
    cli.main(["corpus-prep", "/root/testdata/sf0.001", "--shards", "4"])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["prepped_rows"] > 0
    src_rows = pq.read_metadata(
        "/root/testdata/sf0.001/documents.parquet"
    ).num_rows
    assert sum(out["shards"].values()) == src_rows
    # resumable: second run reuses the finished export root
    cli.main(["corpus-prep", "/root/testdata/sf0.001", "--shards", "4"])
    out2 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out2["export_root"] == out["export_root"]
