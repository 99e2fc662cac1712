"""Command-line entry points, mirroring the reference's three surfaces
(SURVEY.md §3):

* ``seed``   — one-shot frontier injection, the ``crawl-schedule``
  analog (``/root/reference/nsq/crawl-schedule/main.go:88-140``):
  flags → one Request row appended to the workdir's round-0 frontier.
  Requires ≥1 ``--callback`` and exactly one URL, like the reference.
* ``run``    — assemble engine + spiders and crawl, the in-process
  entry point (``examples/imdb/main.go``).  ``--resume`` continues
  from the last committed round manifest (the NSQ-consumer-daemon
  durability analog).
* ``status`` — inspect a workdir: committed rounds, per-round metrics.

Usage::

    python -m crawl_ray.cli seed --workdir /tmp/c --callback page http://host0.example/p/0
    python -m crawl_ray.cli run --pages pages.parquet --workdir /tmp/c
    python -m crawl_ray.cli status --workdir /tmp/c
"""

from __future__ import annotations

import argparse
import importlib
import json
import pathlib

import pyarrow as pa
import pyarrow.parquet as pq

from crawl_ray.schemas import seq_root


def _parse_kv(pairs: list[str]) -> dict[str, str]:
    """k=v list → dict (``crawl-schedule`` metadata/form flag format,
    ``main.go:147-159``)."""
    out: dict[str, str] = {}
    for p in pairs:
        k, sep, v = p.partition("=")
        # reject missing '=' AND empty keys — crawl-schedule's listToForm
        # skips pairs with '=' at index 0 (main.go:147-159, `i <= 0`)
        if not sep or not k:
            raise SystemExit(f"bad k=v flag: {p!r}")
        out[k] = v
    return out


def cmd_seed(args) -> None:
    if not args.callback:
        raise SystemExit("at least one --callback required")
    wd = pathlib.Path(args.workdir) / "round=0" / "frontier"
    wd.mkdir(parents=True, exist_ok=True)
    existing = sorted(wd.glob("seed-*.parquet"))
    offset = sum(pq.read_metadata(str(f)).num_rows for f in existing)
    metadata = json.dumps(_parse_kv(args.metadata), sort_keys=True) if args.metadata else ""
    form = json.dumps({k: [v] for k, v in _parse_kv(args.form).items()},
                      sort_keys=True) if args.form else ""
    row = pa.table(
        {
            "url": pa.array([args.url], pa.string()),
            "method": pa.array([args.method], pa.string()),
            "referer": pa.array([args.referer], pa.string()),
            "form": pa.array([form], pa.string()),
            "callbacks": pa.array([args.callback], pa.list_(pa.string())),
            "metadata": pa.array([metadata], pa.string()),
            "deadline": pa.array([args.deadline], pa.timestamp("us")),
            "seq_path": pa.array([seq_root(offset)], pa.binary()),
        }
    )
    pq.write_table(row, wd / f"seed-{len(existing)}.parquet")
    print(json.dumps({"seeded": args.url, "seq": offset, "workdir": args.workdir}))


def _load_spider(spec: str):
    mod, _, attr = spec.partition(":")
    return getattr(importlib.import_module(mod), attr)


def cmd_run(args) -> None:
    import ray

    owns_session = not ray.is_initialized()
    if owns_session:
        ray.init(address="local", include_dashboard=False)
    from crawl_ray.engine import CrawlEngine, EngineConfig

    cfg = EngineConfig(
        round_budget=args.round_budget,
        max_rounds=args.max_rounds,
        max_depth=args.max_depth,
        n_admission_shards=args.shards,
        extract_concurrency=args.concurrency,
    )
    spiders = [_load_spider(s) for s in args.spider]
    engine = CrawlEngine(spiders, cfg)
    robots = pq.read_table(args.robots) if args.robots else None
    seeds = pq.read_table(args.seeds) if args.seeds else None
    try:
        result = engine.run(args.pages, seeds, robots, args.workdir,
                            resume=args.resume)
    finally:
        engine.shutdown_shards()
    print(json.dumps({
        "rounds": result.rounds,
        "admitted": result.admitted,
        "records": result.records,
        "links": result.links,
        "errors": result.errors,
        "workdir": result.workdir,
    }))
    if owns_session:
        ray.shutdown()


def cmd_dump_sample(args) -> None:
    """S5 debug sink (the ``open/open.go:16-35`` analog minus the
    browser launch): write N sample pages' html bodies to files."""
    import pyarrow.parquet as pq_

    out = pathlib.Path(args.out)
    out.mkdir(parents=True, exist_ok=True)
    t = pq_.read_table(args.pages, columns=["url", "html"])
    n = min(args.n, t.num_rows)
    written = []
    for i in range(n):
        name = f"sample-{i}.html"
        (out / name).write_bytes(t.column("html")[i].as_py())
        written.append({"url": t.column("url")[i].as_py(), "file": name})
    print(json.dumps({"out": str(out), "pages": written}))


def cmd_status(args) -> None:
    wd = pathlib.Path(args.workdir)
    rounds = []
    for d in sorted(wd.glob("round=*"), key=lambda p: int(p.name.split("=")[1])):
        committed = (d / "manifest.json").exists()
        m = {}
        if (d / "metrics.json").exists():
            m = json.loads((d / "metrics.json").read_text())
        rounds.append({"round": int(d.name.split("=")[1]),
                       "committed": committed, "metrics": m})
    print(json.dumps({"workdir": args.workdir, "rounds": rounds}, indent=1))


def main(argv: list[str] | None = None) -> None:
    p = argparse.ArgumentParser(prog="crawl_ray")
    sub = p.add_subparsers(dest="cmd", required=True)

    s = sub.add_parser("seed", help="inject one request into round-0 frontier")
    s.add_argument("url")
    s.add_argument("--workdir", required=True)
    s.add_argument("--callback", action="append", default=[],
                   help="handler name (repeatable; >=1 required)")
    s.add_argument("--method", default="GET")
    s.add_argument("--referer", default="")
    s.add_argument("--metadata", action="append", default=[], metavar="K=V")
    s.add_argument("--form", action="append", default=[], metavar="K=V")
    s.add_argument("--deadline", type=int, default=None,
                   help="absolute deadline, epoch micros")
    s.set_defaults(fn=cmd_seed)

    r = sub.add_parser("run", help="run the crawl loop over a pages table")
    r.add_argument("--pages", required=True)
    r.add_argument("--workdir", required=True)
    r.add_argument("--seeds", default=None, help="seeds parquet (optional if workdir pre-seeded)")
    r.add_argument("--robots", default=None)
    r.add_argument("--spider", action="append",
                   default=["crawl_ray.spiders:flagship_spider"],
                   help="module:callable registering handlers")
    r.add_argument("--max-rounds", type=int, default=16)
    r.add_argument("--max-depth", type=int, default=8)
    r.add_argument("--round-budget", type=int, default=1 << 20)
    r.add_argument("--shards", type=int, default=4)
    r.add_argument("--concurrency", type=int, default=0,
                   help="max fetch+extract tasks in flight (0 = uncapped)")
    r.add_argument("--resume", action="store_true")
    r.set_defaults(fn=cmd_run)

    ds = sub.add_parser("dump-sample",
                        help="write N sample page bodies to html files (debug)")
    ds.add_argument("--pages", required=True)
    ds.add_argument("--out", required=True)
    ds.add_argument("-n", type=int, default=5)
    ds.set_defaults(fn=cmd_dump_sample)

    st = sub.add_parser("status", help="inspect a crawl workdir")
    st.add_argument("--workdir", required=True)
    st.set_defaults(fn=cmd_status)

    args = p.parse_args(argv)
    args.fn(args)


if __name__ == "__main__":
    main()
