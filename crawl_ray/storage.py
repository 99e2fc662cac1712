"""Shared-storage root for every task-side store (VERDICT r3 item 4).

Several operators write bucketed parquet stores from Ray TASKS and read
them back from OTHER tasks: the minhash/containment shingle stores, the
embedding unit-vector store, the IVF index, the inverted text index,
the corpus export sinks, and the engine's spill/frontier workdirs.  On
one node any local path works; on a real cluster those paths MUST live
on storage visible to every node (NFS, FUSE-mounted object store, ...).

The contract is ONE knob:

* ``CRAWL_RAY_STORE_ROOT`` env var (or :func:`set_store_root` for
  programmatic use) — the directory all content-addressed stores are
  created under.  Setting it is the operator's attestation that the
  path is shared across the cluster.
* Unset, the root defaults to node-local ``/tmp/crawl_ray_runs`` and
  any MULTI-node run that needs a task-side store fails loudly at
  store-creation time (:func:`check_multinode_storage`) instead of
  scattering parts across hosts.
* The attestation covers exactly the tree under the configured root.
  A deployment whose engine workdir lives on a *different* shared
  mount attests it via ``CRAWL_RAY_ATTESTED_ROOTS`` (colon-separated
  extra roots).

The root is resolved ON THE DRIVER and the absolute path is captured
into task closures — workers never re-read the env var, so a cluster
only needs the variable set where the driver runs.

Reference analog: the NSQ queue address in the reference consumer
(nsq/consumer/app.go) is the same kind of deployment-realism knob —
the one piece of config that turns "runs on my machine" into "runs on
the cluster".
"""

from __future__ import annotations

import os
import pathlib

__all__ = [
    "DEFAULT_STORE_ROOT",
    "store_root",
    "set_store_root",
    "check_multinode_storage",
    "ensure_store_dir",
]

DEFAULT_STORE_ROOT = "/tmp/crawl_ray_runs"
_override: str | None = None


def set_store_root(path: str | None) -> None:
    """Programmatic override (tests, embedding applications); ``None``
    restores env/default resolution."""
    global _override
    _override = str(path) if path is not None else None


def store_root() -> pathlib.Path:
    """The configured shared-storage root (driver-side resolution).
    An EMPTY env var counts as unset — Path("") is the cwd, and
    treating it as configured would attest the driver's whole cwd as
    cluster-shared."""
    return pathlib.Path(
        _override
        or os.environ.get("CRAWL_RAY_STORE_ROOT")
        or DEFAULT_STORE_ROOT
    )


def _root_is_configured() -> bool:
    return _override is not None or bool(
        os.environ.get("CRAWL_RAY_STORE_ROOT")
    )


def _attested_roots() -> list[pathlib.Path]:
    """Every directory tree the operator has attested as cluster-shared:
    the configured store root plus any extra roots in
    ``CRAWL_RAY_ATTESTED_ROOTS`` (colon-separated) — for deployments
    whose engine workdir lives on a second shared mount distinct from
    the store root."""
    roots: list[pathlib.Path] = []
    if _root_is_configured():
        roots.append(store_root())
    extra = os.environ.get("CRAWL_RAY_ATTESTED_ROOTS", "")
    roots.extend(pathlib.Path(p) for p in extra.split(":") if p)
    return roots


def _under_attested_root(path: str | os.PathLike) -> bool:
    """True iff ``path`` lives under an attested shared root.

    The attestation covers exactly the trees rooted at the configured
    directories — an arbitrary path elsewhere (e.g. a user-supplied
    engine workdir on node-local ``/tmp``) is NOT made shared by an
    unrelated ``CRAWL_RAY_STORE_ROOT`` setting.
    """
    try:
        p = pathlib.Path(path).resolve()
        return any(p.is_relative_to(r.resolve()) for r in _attested_roots())
    except (OSError, ValueError):
        return False


def check_multinode_storage(what: str, path: str | os.PathLike) -> None:
    """Refuse to write task-side parts to ``path`` when the cluster has
    more than one alive node, UNLESS the path lives under the attested
    shared root — the root-is-shared assertion that replaces the old
    blanket single-node guards.  A configured root attests only the
    tree under it, not unrelated paths (a workdir outside the root on
    a multi-node cluster still fails loudly)."""
    import ray

    if _under_attested_root(path):
        return
    if not ray.is_initialized():
        return  # single-process usage (tests, local scripts)
    # real errors (GCS hiccup on a live cluster) must PROPAGATE: a
    # swallowed error here would silently disable the scatter guard
    # at the exact moment an unattested dir is being created
    alive = [n for n in ray.nodes() if n.get("Alive")]
    if len(alive) > 1:
        roots = ", ".join(str(r) for r in _attested_roots())
        if roots:
            hint = (
                f"it is not under any attested shared root ({roots}); "
                "place it under one, or attest its mount via "
                "CRAWL_RAY_ATTESTED_ROOTS (colon-separated)"
            )
        else:
            hint = (
                "no shared root is configured; set CRAWL_RAY_STORE_ROOT "
                "(or crawl_ray.storage.set_store_root) to a directory "
                "on storage shared by every node"
            )
        raise RuntimeError(
            f"{what} writes task-side parts under {os.fspath(path)!r} "
            f"on a {len(alive)}-node cluster, but {hint} — parts would "
            "otherwise scatter across hosts"
        )


def ensure_store_dir(name: str, what: str) -> pathlib.Path:
    """Resolve ``store_root()/name``, run the multi-node assertion, and
    create the directory.  ``what`` names the operator in the error."""
    root = store_root() / name
    check_multinode_storage(what, root)
    root.mkdir(parents=True, exist_ok=True)
    return root
