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
import uuid

RETIRED_SUFFIX = ".retired"


def mark_retired(data_dir: str) -> None:
    """Stamp (or re-stamp) ``data_dir``'s retirement sentinel NOW.

    Unconditional create-or-touch, unlike the sweep's ``O_EXCL``
    discovery mark: the caller is the run that just swapped the meta
    pointer AWAY from this dir, i.e. the one process that knows the true
    retirement instant. Re-stamping is load-bearing — a concurrent
    sweep's discovery mark can land on a dir in the window after its
    owner's swap made it live (the mark then sits there AGING while the
    dir serves readers), and without this reset the run that eventually
    supersedes the dir would find an already-expired sentinel and reap
    it with zero reader grace (r5 review of the first two-phase sweep).
    There is exactly one swap winner per retirement event, so this
    cannot reset an in-progress retirement clock the way a sweep-side
    unconditional touch could.
    """
    sentinel = data_dir + RETIRED_SUFFIX
    try:
        fd = os.open(sentinel, os.O_WRONLY | os.O_CREAT, 0o644)
        os.close(fd)
        os.utime(sentinel, None)
    except OSError:
        pass


def swap_meta_pointer(meta_path: str, meta: dict) -> None:
    """Atomically publish ``meta`` at ``meta_path`` and retire the dir
    the previous meta pointed at.

    * The temp file carries a unique suffix: two overlapping runs
      writing the SAME ``meta_path + ".tmp"`` could interleave so one
      run's ``os.replace`` publishes the other's half-written payload
      (or crashes on a vanished temp). Unique temps make the swap
      last-writer-wins cleanly.
    * The prior dir is re-read immediately before the replace, so the
      retirement mark lands on whatever dir this swap ACTUALLY
      supersedes (an overlapping run may have moved the pointer since
      this run read its ``prior_meta`` at startup). The tiny window
      between the read and the replace can at worst MISS the swap-time
      mark — the sweep's discovery pass then marks the dir later, which
      only lengthens its grace, never shortens it.
    """
    prior_dir = None
    try:
        with open(meta_path) as f:
            prior_dir = json.load(f).get("data_dir")
    except (OSError, ValueError):
        pass
    tmp = f"{meta_path}.tmp-{uuid.uuid4().hex[:8]}"
    with open(tmp, "w") as f:
        json.dump(meta, f)
    os.replace(tmp, meta_path)
    new_dir = meta.get("data_dir")
    if prior_dir and (
        not new_dir
        or os.path.abspath(prior_dir) != os.path.abspath(new_dir)
    ):
        mark_retired(prior_dir)


def sweep_stale_data_dirs(root: str, meta_path: str,
                          keep_dir: str | None = None,
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

    Mark hygiene against concurrent swaps (r5 second review — a mark
    created from a stale liveness view could age on a LIVE dir and
    collapse its eventual grace to zero):

    * the common case never relies on discovery at all — the swapping
      run stamps the retired dir's sentinel at the swap instant
      (``swap_meta_pointer`` → ``mark_retired``), resetting any bogus
      aged mark at the exact moment the grace clock should start;
    * the discovery path (crash orphans that were never live) re-reads
      the live meta immediately before creating its ``O_EXCL``
      sentinel, shrinking the mark-a-live-dir window to the read→create
      gap — and a mark that still slips through is repaired by the
      swap-time re-stamp above when the dir is eventually superseded;
    * a dir that becomes live again (a slower run's swap landing after
      it was marked) has its sentinel cleared by every later sweep.

    ``keep_dir`` is the dir the calling run just wrote (pre-swap it is
    not yet in the meta); pass ``None`` for a start-of-run sweep that
    protects only what the meta references — jobs run one of those
    before building so a crash-looping build cannot accumulate one
    corpus-sized orphan per attempt unboundedly (each attempt marks its
    predecessor's orphan and reaps the one before, r5 review).

    ``grace_secs <= 0`` reverts to single-pass immediate removal (tests
    and manual cleanup; no reader/overlap protection).
    """
    live = keep_dir
    try:
        with open(meta_path) as f:
            live = json.load(f).get("data_dir") or keep_dir
    except (OSError, ValueError):
        pass
    keep = {
        os.path.abspath(d) for d in (keep_dir, live) if d
    }
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
            # first sighting as stale: mark, reap on a later sweep —
            # but re-check liveness at the last instant (a concurrent
            # run's swap may have made this dir live since this sweep
            # read the meta at its start)
            try:
                with open(meta_path) as f:
                    now_live = json.load(f).get("data_dir")
                if now_live and (os.path.abspath(now_live)
                                 == os.path.abspath(full)):
                    continue
            except (OSError, ValueError):
                pass
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
