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


def _append_seed_part(workdir: str, rows: pa.Table) -> tuple[pathlib.Path, int]:
    """Claim a slot and atomically append a (possibly multi-row) seed
    part to the round-0 frontier with monotone ``seq_root`` offsets.
    Shared by the ``seed`` CLI and the ``--follow`` seeds-table
    injection.

    * O_EXCL claim markers (dot-prefixed, invisible to the daemon's
      ``*.parquet`` poll, never reissued) keep concurrent appenders
      that observed the same state from stamping the same seq_root —
      identical order_keys and colliding child seq_paths otherwise.
    * The seq offset counts rows of ALL frontier parts (``seed-*``,
      ``part-*`` from ``engine.write_seeds``, ``follow-*``), so CLI
      seeds never collide with a seeds-table run's roots.
    * Each claim file records its part's ROW COUNT at claim time, so a
      concurrent appender inside another claim's rename window sums the
      claimed counts instead of guessing one row per claim (a
      multi-row ``--follow --seeds`` injection would otherwise collide
      seq_roots).  An empty claim file (the sub-ms window between
      O_EXCL create and the count write, or a pre-upgrade marker)
      falls back to the historical 1-row estimate.
    * tmp + atomic rename: the daemon polls this dir, and a
      half-written parquet (no footer) would crash its read.
    """
    import hashlib
    import os

    wd = pathlib.Path(workdir) / "round=0" / "frontier"
    wd.mkdir(parents=True, exist_ok=True)
    seed_parts = sorted(wd.glob("seed-*.parquet"))
    all_parts = sorted(wd.glob("*.parquet"))
    idx = len(seed_parts)
    while True:
        try:
            fd = os.open(wd / f".claim-{idx}",
                         os.O_CREAT | os.O_EXCL | os.O_WRONLY)
            os.write(fd, str(rows.num_rows).encode())
            os.close(fd)
            break
        except FileExistsError:
            idx += 1
    done_idx = {int(f.name.split("-")[1]) for f in seed_parts}
    pending = 0
    for cf in wd.glob(".claim-*"):
        j = int(cf.name.split("-", 1)[1])
        if j == idx or j in done_idx:
            continue
        try:
            txt = cf.read_text().strip()
            pending += int(txt) if txt else 1
        except (OSError, ValueError):
            pending += 1
    offset = sum(pq.read_metadata(str(f)).num_rows for f in all_parts) + pending
    rows = rows.append_column(
        "seq_path",
        pa.array([seq_root(offset + i) for i in range(rows.num_rows)],
                 pa.binary()),
    )
    tok = hashlib.blake2b(
        "|".join(rows.column("url").to_pylist()).encode()
        + f":{offset}".encode(),
        digest_size=6,
    ).hexdigest()
    part = wd / f"seed-{idx}-{tok}.parquet"
    tmp = wd / f".seed-{tok}.tmp"
    pq.write_table(rows, tmp)
    os.replace(tmp, part)
    return part, offset


def cmd_seed(args) -> None:
    if not args.callback:
        raise SystemExit("at least one --callback required")
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
            "priority": pa.array([args.priority], pa.float32()),
        }
    )
    _, offset = _append_seed_part(args.workdir, row)
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
    spiders = [
        _load_spider(s)
        for s in (args.spider or ["crawl_ray.spiders:flagship_spider"])
    ]
    engine = CrawlEngine(spiders, cfg)
    robots = pq.read_table(args.robots) if args.robots else None
    seeds = pq.read_table(args.seeds) if args.seeds else None
    try:
        if getattr(args, "follow", False):
            _run_follow(engine, args, seeds, robots)
            return
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


def _run_follow(engine, args, seeds, robots) -> None:
    """Consumer daemon mode — the long-running NSQ consumer analog
    (``nsq/consumer/app.go:80-135``): drain the current frontier, then
    keep polling the round-0 frontier dir for seed parts appended by
    the ``seed`` CLI (the crawl-schedule producer) and crawl each new
    wave via resume.  SIGINT = graceful drain (finish the in-flight
    round, commit its checkpoint, exit — ``Queue.Close`` semantics);
    a later ``run --follow --resume`` continues where it stopped.

    With ``--seeds-dir`` the daemon joins a COMPETING-CONSUMER group
    (NSQ channel semantics): N daemons poll one shared topic dir and
    split its seed parts via O_EXCL claim markers — each part crawled
    by exactly one consumer, each consumer keeping its own workdir
    state.  Seed through the topic OR locally per consumer, not both
    (mixing can collide producer- and consumer-assigned seq roots)."""
    import signal
    import time

    from crawl_ray.schemas import FRONTIER_SCHEMA
    from crawl_ray.stages.canonicalize import _DEFAULTS

    stop = {"flag": False}

    def _sig(signum, frame):  # noqa: ARG001 - signal signature
        stop["flag"] = True
        print(json.dumps({"event": "signal", "draining": True}), flush=True)

    old = signal.signal(signal.SIGINT, _sig)
    wd = pathlib.Path(args.workdir)
    r0 = wd / "round=0" / "frontier"

    # Competing-consumer (NSQ channel) mode: N follow daemons share one
    # TOPIC dir of seed parts (`--seeds-dir`); each part is delivered
    # to exactly ONE consumer in the group via an O_EXCL claim marker
    # (the channel contract, nsq/nsqcrawl/queue.go:18-26), and the
    # winner copies it into its OWN workdir's round-0 frontier where
    # the normal wave logic picks it up.  Consumers keep independent
    # engine state (frontier/seen/checkpoints) exactly like NSQ
    # consumers keep independent handler state — cross-consumer URL
    # dedup is by seed-space partitioning, not a shared seen set.
    # Restart-safe: parts claimed by THIS consumer are re-copied only
    # if the copy is missing; foreign claims are skipped forever.
    # (Crash exactly between marker create and the ownership write
    # orphans that one part — the same at-most-once edge NSQ has.)
    topic = (
        pathlib.Path(args.seeds_dir)
        if getattr(args, "seeds_dir", None) else None
    )
    if getattr(args, "consumer_id", None):
        consumer_id = args.consumer_id
    else:
        # default id must distinguish same-named workdirs under
        # different parents (two "crawl" dirs on two nodes): basename
        # + short digest of the resolved path
        import hashlib

        consumer_id = (
            f"{wd.name or 'consumer'}-"
            + hashlib.blake2b(
                str(wd.resolve()).encode(), digest_size=4
            ).hexdigest()
        )

    def _topic_poll() -> None:
        """Claim new topic parts and copy the won ones into r0 (the
        local glob then discovers them like locally-seeded parts)."""
        if topic is None:
            return
        import os
        import shutil as _sh

        claims = topic / ".claims"
        claims.mkdir(parents=True, exist_ok=True)
        for f in sorted(topic.glob("*.parquet")):
            marker = claims / (f.name + ".claim")
            try:
                fd = os.open(marker, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
                os.write(fd, consumer_id.encode())
                os.close(fd)
                owner = consumer_id
            except FileExistsError:
                try:
                    owner = marker.read_text().strip()
                except OSError:
                    owner = ""
            if owner != consumer_id:
                continue
            dst = r0 / f"topic-{f.name}"
            if not dst.exists():
                r0.mkdir(parents=True, exist_ok=True)
                tmp = r0 / f".topic-{f.name}.tmp"
                _sh.copyfile(f, tmp)
                os.replace(tmp, dst)  # atomic: the poll glob must
                # never see a footer-less parquet
    totals = {"waves": 0, "rounds": 0, "records": 0, "links": 0, "errors": 0}
    # per-WAVE round budget: a long-lived daemon would otherwise exhaust
    # the absolute max_rounds cap after the first deep crawl
    base_max_rounds = engine.cfg.max_rounds
    injected = {"n": 0}

    def _crawl(seeds_tbl, resume: bool) -> None:
        result = engine.run(
            args.pages, seeds_tbl, robots, args.workdir,
            resume=resume, stop=lambda: stop["flag"],
        )
        totals["waves"] += 1
        totals["rounds"] = result.rounds
        for k in ("records", "links", "errors"):
            totals[k] += getattr(result, k)
        print(json.dumps({"event": "drained", **totals}), flush=True)

    def _resumable():
        return engine._resumable_round(wd, engine.cfg.n_admission_shards)

    def _inject(files: list[str], nxt: int) -> None:
        """Copy seed parts into round ``nxt``'s frontier, normalized to
        explicit frontier defaults (a later-round frontier dir mixes
        these rows with link files, and a schema-promoting concat would
        null the missing columns instead of defaulting them)."""
        dst = wd / f"round={nxt}" / "frontier"
        dst.mkdir(parents=True, exist_ok=True)
        for f in files:
            t = pq.read_table(f)
            for name, default in _DEFAULTS.items():
                if name == "req_url":
                    continue
                if name not in t.column_names:
                    t = t.append_column(
                        name,
                        pa.array([default] * t.num_rows,
                                 FRONTIER_SCHEMA.field(name).type),
                    )
            pq.write_table(t, dst / f"follow-{injected['n']}.parquet")
            injected["n"] += 1

    try:
        processed: set[str] = set()
        _topic_poll()  # claim + copy pre-existing topic parts first
        startup = sorted(str(f) for f in r0.glob("*.parquet"))
        resumable = _resumable() if args.resume else None
        if seeds is not None and startup and resumable is None:
            # fires whether or not --resume was passed: with no
            # committed round yet, engine.run's fresh path wipes
            # round=0 before writing the seeds table, losing the
            # CLI-seeded parts — there is no safe flag combination
            raise SystemExit(
                "--follow with --seeds on a pre-seeded workdir with no "
                "committed round would wipe the seeded round-0 parts: "
                "drop --seeds and seed everything via the `seed` CLI "
                "(or use a fresh workdir for the --seeds run)"
            )
        if resumable is not None and seeds is not None:
            # engine.run on a resumed workdir never re-reads a seeds
            # table (it raises rather than silently dropping it) —
            # convert the table into a round-0 seed part so the
            # injection below carries it into the resume round, and
            # mark it consumed so the poll loop doesn't echo it.
            from crawl_ray.engine import _validate_seeds

            _validate_seeds(seeds)
            part, _ = _append_seed_part(args.workdir, seeds)
            startup.append(str(part))
            processed.add(str(part))
            seeds = None
        if resumable is not None and startup:
            # resume never re-reads round-0, so parts appended while
            # the daemon was down would be silently lost — re-inject
            # them ALL into the resume round.  Idempotent: already-
            # crawled seeds are in the restored seen-set and drop.
            _inject(startup, resumable + 1)
            # the previous daemon may have exhausted max_rounds: give
            # this wave a fresh per-wave budget like the poll loop does
            engine.cfg.max_rounds = resumable + 1 + base_max_rounds
        # wave 0: whatever is present now (seeds table, pre-seeded dir,
        # or a resumable checkpoint).  NOTE `resumable is not None`,
        # not `args.resume`: --resume on a fresh empty workdir must
        # fall through to the poll loop, not crash engine.run with
        # "seeds required for a fresh run".
        if seeds is not None or startup or resumable is not None:
            _crawl(seeds, resumable is not None)
            # only parts that existed BEFORE the wave are consumed:
            # ones appended mid-wave may have missed round 0's read and
            # must be re-injected by the loop (idempotent via seen-set)
            processed.update(startup)
        while not stop["flag"]:
            _topic_poll()
            new = sorted(
                f for f in (str(p) for p in r0.glob("*.parquet"))
                if f not in processed
            )
            if not new:
                time.sleep(args.poll_interval)
                continue
            # inject at the round resume will continue from: the last
            # SNAPSHOT-complete commit + 1 (with checkpoint_interval > 1
            # a later manifest-only round re-runs on resume, so parts
            # injected past the snapshot would be wiped by its cleanup)
            committed = _resumable()
            if committed is None:
                # nothing ever committed: the parts ALREADY sit in the
                # round-0 frontier a fresh pre-seeded run reads —
                # copying them into the same dir would duplicate every
                # row in this wave AND be re-discovered by the next
                # poll as "new" parts (an echo wave re-running a full
                # admit-nothing crawl per cold start)
                processed.update(new)
                engine.cfg.max_rounds = base_max_rounds
                _crawl(None, False)
                continue
            nxt = committed + 1
            _inject(new, nxt)
            processed.update(new)
            engine.cfg.max_rounds = nxt + base_max_rounds
            _crawl(None, True)
    finally:
        signal.signal(signal.SIGINT, old)
    print(json.dumps({"event": "closed", **totals}), flush=True)


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


def cmd_corpus_prep(args) -> None:
    """U5 consumer endpoint for the training-data path: run the
    filter → dedup → pack chain (``textops.training_corpus_prep``) over
    a documents table and ship the surviving corpus through the
    resumable partitioned-Parquet sink; prints the manifest JSON."""
    import ray

    from crawl_ray.pipelines.textops import training_corpus_prep
    from crawl_ray.sources.export import export_prepped_parquet

    if not ray.is_initialized():
        ray.init(address="local", include_dashboard=False)
    prep = training_corpus_prep(args.sf_dir)
    if hasattr(prep, "num_rows"):  # pa.Table → Dataset for the join
        import ray.data as rd

        n_prepped = prep.num_rows
        prep = rd.from_arrow(prep)
    else:
        prep = prep.materialize()
        n_prepped = prep.count()
    # export the SURVIVING corpus (docs joined back to their text +
    # bin assignment), not a re-read of the raw documents table
    root = export_prepped_parquet(args.sf_dir, prep, n_shards=args.shards)
    manifest = json.loads((pathlib.Path(root) / "manifest.json").read_text())
    # hard raise, not assert: this invariant must survive python -O
    if sum(manifest.values()) != int(n_prepped):
        raise SystemExit(
            f"export manifest rows ({sum(manifest.values())}) != prepped "
            f"survivor count ({int(n_prepped)})"
        )
    print(json.dumps({
        "sf_dir": args.sf_dir,
        "prepped_rows": int(n_prepped),
        "export_root": root,
        "shards": manifest,
    }, sort_keys=True))


def cmd_status(args) -> None:
    wd = pathlib.Path(args.workdir)
    rounds = []
    promoted: list[str] = []
    for d in sorted(wd.glob("round=*"), key=lambda p: int(p.name.split("=")[1])):
        committed = (d / "manifest.json").exists()
        if committed:
            # latest manifest wins: the promoted set is cumulative
            promoted = json.loads(
                (d / "manifest.json").read_text()
            ).get("promoted_hosts", promoted)
        m = {}
        if (d / "metrics.json").exists():
            m = json.loads((d / "metrics.json").read_text())
        rounds.append({"round": int(d.name.split("=")[1]),
                       "committed": committed, "metrics": m})
    out = {"workdir": args.workdir, "rounds": rounds}
    if promoted:
        out["promoted_hosts"] = promoted
    print(json.dumps(out, indent=1))


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
    s.add_argument("--priority", type=float, default=0.0,
                   help="frontier priority (higher crawls first, O2; "
                        "e.g. a link_pagerank rank)")
    s.set_defaults(fn=cmd_seed)

    r = sub.add_parser("run", help="run the crawl loop over a pages table")
    r.add_argument("--pages", required=True)
    r.add_argument("--workdir", required=True)
    r.add_argument("--seeds", default=None, help="seeds parquet (optional if workdir pre-seeded)")
    r.add_argument("--robots", default=None)
    # default=None, resolved in cmd_run: argparse APPENDS to a non-None
    # default list, so user-supplied spiders would pile onto the
    # flagship default (and mutate the shared default object across
    # main() calls) instead of replacing it
    r.add_argument("--spider", action="append", default=None,
                   help="module:callable registering handlers "
                        "(repeatable; default: the flagship spider)")
    r.add_argument("--max-rounds", type=int, default=16)
    r.add_argument("--max-depth", type=int, default=8)
    r.add_argument("--round-budget", type=int, default=1 << 20)
    r.add_argument("--shards", type=int, default=4)
    r.add_argument("--concurrency", type=int, default=0,
                   help="max fetch+extract tasks in flight (0 = uncapped)")
    r.add_argument("--resume", action="store_true")
    r.add_argument("--follow", action="store_true",
                   help="consumer daemon mode: keep polling round-0 for "
                        "seed parts appended by the `seed` CLI; SIGINT "
                        "drains the in-flight round and exits "
                        "(--max-rounds is the total budget across waves)")
    r.add_argument("--poll-interval", type=float, default=0.5,
                   help="seconds between frontier polls in --follow mode")
    r.add_argument("--seeds-dir", default=None,
                   help="competing-consumer mode: shared TOPIC dir of "
                        "seed parts (e.g. SHARED/round=0/frontier of a "
                        "workdir fed by the `seed` CLI); N --follow "
                        "daemons pointed at one topic split its parts "
                        "via claim markers, each crawling into its OWN "
                        "--workdir (NSQ channel semantics)")
    r.add_argument("--consumer-id", default=None,
                   help="stable consumer name for --seeds-dir claim "
                        "ownership (defaults to the workdir basename)")
    r.set_defaults(fn=cmd_run)

    ds = sub.add_parser("dump-sample",
                        help="write N sample page bodies to html files (debug)")
    ds.add_argument("--pages", required=True)
    ds.add_argument("--out", required=True)
    ds.add_argument("-n", type=int, default=5)
    ds.set_defaults(fn=cmd_dump_sample)

    cp = sub.add_parser(
        "corpus-prep",
        help="filter+dedup+pack a documents table, export parquet shards",
    )
    cp.add_argument("sf_dir")
    cp.add_argument("--shards", type=int, default=8)
    cp.set_defaults(fn=cmd_corpus_prep)

    st = sub.add_parser("status", help="inspect a crawl workdir")
    st.add_argument("--workdir", required=True)
    st.set_defaults(fn=cmd_status)

    args = p.parse_args(argv)
    args.fn(args)


if __name__ == "__main__":
    main()
