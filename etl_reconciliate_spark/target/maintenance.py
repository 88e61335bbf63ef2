"""Data-dir GC for the maintenance jobs' write-then-swap outputs.

The rollup/dedup-index jobs materialize each build into a fresh
``data-v*`` dir and atomically swap a small JSON meta pointer at it
(``jobs/rollup_job.py``, ``jobs/dedup_index_job.py``). This module is
the shared collector for the dirs that swap retires — the sibling of
``TargetTable.expire_snapshots`` for job-owned outputs, living at the
target/storage layer because that is where the swap protocol's other
half (snapshot retention) lives.
"""

from __future__ import annotations

import json
import os
import shutil
import time

RETIRED_SUFFIX = ".retired"


def sweep_stale_data_dirs(root: str, meta_path: str, keep_dir: str,
                          grace_secs: float = 300.0) -> None:
    """Two-phase GC of ``data-v*`` dirs under ``root``.

    A dir that is neither ``keep_dir`` nor referenced by the CURRENT
    on-disk meta is first MARKED retired (an empty ``<dir>.retired``
    sentinel file beside it) and left alone; only a LATER sweep removes
    it, once the sentinel is older than ``grace_secs``. Measuring grace
    from the retirement mark — not from the dir's own mtime — is what
    actually delivers the two protections the grace exists for (r5
    review of the first, mtime-based sweep, which delivered neither):

    * readers mid-scan of the just-superseded version: its mtime is its
      WRITE time, so under any refresh cadence ≥ grace it was always
      already "old enough" at the very moment it stopped being live;
    * an overlapping slower run whose write→verify→swap window exceeds
      grace: its dir would age past the mtime bar before its pointer
      swap landed, recreating the exact deleted-under-the-winner race
      the grace was added to close.

    A dir that becomes live again (that slower run's swap landing after
    it was marked) has its sentinel cleared — every run sweeps after its
    own swap, so the mark never outlives one cycle of liveness. The
    sentinel is created with ``O_EXCL`` so concurrent sweeps cannot
    reset an in-progress retirement clock, and removal stays
    inode-unguarded-safe because nothing ever recreates a retired dir
    under the same uuid-suffixed name.

    ``grace_secs <= 0`` reverts to single-pass immediate removal (tests
    and manual cleanup; no reader/overlap protection).
    """
    live = keep_dir
    try:
        with open(meta_path) as f:
            live = json.load(f).get("data_dir") or keep_dir
    except (OSError, ValueError):
        pass
    keep = {os.path.abspath(keep_dir), os.path.abspath(live)}
    now = time.time()
    for d in sorted(os.listdir(root)):
        full = os.path.join(root, d)
        if d.startswith("data-v") and d.endswith(RETIRED_SUFFIX):
            # orphan sentinel whose dir is already gone (a crash between
            # rmtree and sentinel removal, or a foreign cleanup)
            if not os.path.isdir(full[: -len(RETIRED_SUFFIX)]):
                try:
                    os.remove(full)
                except OSError:
                    pass
            continue
        if not (d.startswith("data-v") and os.path.isdir(full)):
            continue
        sentinel = full + RETIRED_SUFFIX
        if os.path.abspath(full) in keep:
            # live (again) — clear any retirement mark a concurrent
            # sweep left while this run's swap was still in flight
            try:
                os.remove(sentinel)
            except OSError:
                pass
            continue
        if grace_secs <= 0:
            shutil.rmtree(full, ignore_errors=True)
            try:
                os.remove(sentinel)
            except OSError:
                pass
            continue
        try:
            retired_age = now - os.path.getmtime(sentinel)
        except OSError:
            # first sighting as stale: mark, reap on a later sweep
            try:
                fd = os.open(sentinel, os.O_WRONLY | os.O_CREAT | os.O_EXCL,
                             0o644)
                os.close(fd)
            except OSError:
                pass
            continue
        if retired_age < grace_secs:
            continue
        shutil.rmtree(full, ignore_errors=True)
        try:
            os.remove(sentinel)
        except OSError:
            pass
