"""Deferred-reap GC of the maintenance jobs' write-then-swap data dirs
(``target.maintenance.sweep_stale_data_dirs``).

Pure-filesystem tests — no SparkSession. The contract under test: a
stale ``data-v*`` dir is MARKED retired on first sighting and removed
only by a later sweep once the mark is older than the grace, so that
(a) readers mid-scan of the just-superseded version get a full grace
window measured from retirement (not from the dir's write mtime), and
(b) an overlapping run whose write→verify→swap window exceeds the grace
is never deleted before its pointer swap lands.
"""

import json
import os
import time

from etl_reconciliate_spark.target.maintenance import (
    BUILDING_SUFFIX,
    RETIRED_SUFFIX,
    claim_build_dir,
    release_build_claim,
    swap_meta_pointer,
    sweep_stale_data_dirs,
)


def _setup(tmp_path):
    root = str(tmp_path)
    old = os.path.join(root, "data-v000001-aaaa")
    new = os.path.join(root, "data-v000002-bbbb")
    os.makedirs(old)
    os.makedirs(new)
    meta = os.path.join(root, "_meta.json")
    with open(meta, "w") as f:
        json.dump({"data_dir": new}, f)
    return root, meta, old, new


def test_sweep_marks_then_reaps_after_grace(tmp_path):
    root, meta, old, new = _setup(tmp_path)
    sweep_stale_data_dirs(root, meta, new, grace_secs=60)
    # first sweep only MARKS — readers mid-scan of the superseded
    # version keep their files no matter how old the dir's write is
    assert os.path.isdir(old)
    sent = old + RETIRED_SUFFIX
    assert os.path.exists(sent)
    first_mtime = os.path.getmtime(sent)
    # an immediate second sweep neither resets the clock nor removes
    sweep_stale_data_dirs(root, meta, new, grace_secs=60)
    assert os.path.isdir(old)
    assert os.path.getmtime(sent) == first_mtime
    # once the retirement mark is older than the grace, reap dir + mark
    os.utime(sent, (first_mtime - 120, first_mtime - 120))
    sweep_stale_data_dirs(root, meta, new, grace_secs=60)
    assert not os.path.exists(old) and not os.path.exists(sent)
    assert os.path.isdir(new)


def test_sweep_zero_grace_removes_immediately(tmp_path):
    root, meta, old, new = _setup(tmp_path)
    sweep_stale_data_dirs(root, meta, new, grace_secs=0)
    assert not os.path.exists(old)
    assert os.path.isdir(new)


def test_sweep_unmarks_dir_that_became_live_again(tmp_path):
    # a slower overlapping run's dir was marked stale by a fast run,
    # then the slow run's pointer swap landed: the slow run's own final
    # sweep must CLEAR the mark, otherwise the next winner's sweep
    # reaps a just-superseded dir on an already-expired clock
    root, meta, old, new = _setup(tmp_path)
    sent = old + RETIRED_SUFFIX
    open(sent, "w").close()
    past = time.time() - 999
    os.utime(sent, (past, past))
    with open(meta, "w") as f:
        json.dump({"data_dir": old}, f)  # the slow run's swap
    sweep_stale_data_dirs(root, meta, old, grace_secs=60)
    assert os.path.isdir(old) and not os.path.exists(sent)


def test_sweep_protects_not_yet_swapped_overlapping_dir(tmp_path):
    # fast run sweeps while a slow run has WRITTEN data-v3 but not yet
    # swapped its meta: the dir is only marked; once the slow swap
    # lands, the live-meta re-read keeps the dir and clears the mark
    root, meta, old, new = _setup(tmp_path)
    slow = os.path.join(root, "data-v000003-cccc")
    os.makedirs(slow)
    sweep_stale_data_dirs(root, meta, new, grace_secs=300)
    assert os.path.isdir(slow) and os.path.exists(slow + RETIRED_SUFFIX)
    with open(meta, "w") as f:
        json.dump({"data_dir": slow}, f)
    sweep_stale_data_dirs(root, meta, slow, grace_secs=300)
    assert os.path.isdir(slow)
    assert not os.path.exists(slow + RETIRED_SUFFIX)


def test_swap_marks_superseded_dir_at_swap_time(tmp_path):
    # the swap is the one event that knows the true retirement instant:
    # publishing a new pointer must stamp the sentinel of the dir it
    # supersedes, so the grace clock starts at retirement even if no
    # sweep ever discovered the dir as stale
    root, meta, old, new = _setup(tmp_path)
    with open(meta, "w") as f:
        json.dump({"data_dir": old}, f)  # old is live
    swap_meta_pointer(meta, {"data_dir": new})
    assert json.load(open(meta))["data_dir"] == new
    sent = old + RETIRED_SUFFIX
    assert os.path.exists(sent)
    assert time.time() - os.path.getmtime(sent) < 30
    # within the grace the superseded dir survives the sweep
    sweep_stale_data_dirs(root, meta, new, grace_secs=300)
    assert os.path.isdir(old)


def test_swap_resets_bogus_aged_mark_on_live_dir(tmp_path):
    # the r5 review race: a concurrent sweep's discovery mark landed on
    # a dir AFTER its owner's swap made it live (and after that owner's
    # final sweep, so nothing cleared it). The mark ages on the live
    # dir; when a later run supersedes it, a discovery-only design would
    # reap with ZERO reader grace. The swap-time re-stamp must reset the
    # clock to the true retirement instant.
    root, meta, old, new = _setup(tmp_path)
    with open(meta, "w") as f:
        json.dump({"data_dir": old}, f)  # old is live…
    sent = old + RETIRED_SUFFIX
    open(sent, "w").close()  # …but carries a bogus aged mark
    past = time.time() - 999
    os.utime(sent, (past, past))
    swap_meta_pointer(meta, {"data_dir": new})  # supersede old NOW
    assert time.time() - os.path.getmtime(sent) < 30
    sweep_stale_data_dirs(root, meta, new, grace_secs=300)
    assert os.path.isdir(old)  # full grace from retirement, not mark age


def test_swap_first_publish_marks_nothing(tmp_path):
    root = str(tmp_path)
    new = os.path.join(root, "data-v000001-aaaa")
    os.makedirs(new)
    meta = os.path.join(root, "_meta.json")
    swap_meta_pointer(meta, {"data_dir": new})
    assert json.load(open(meta))["data_dir"] == new
    assert not os.path.exists(new + RETIRED_SUFFIX)
    assert not any(
        p.endswith(".tmp") or ".tmp-" in p for p in os.listdir(root)
    )


def test_start_of_run_sweep_without_keep_dir(tmp_path):
    # jobs sweep BEFORE building (keep_dir=None): crash orphans from a
    # previous attempt get marked/reaped while the live dir survives —
    # this is what bounds a crash-looping build's disk footprint
    root, meta, old, new = _setup(tmp_path)
    sweep_stale_data_dirs(root, meta, grace_secs=300)
    assert os.path.isdir(new) and not os.path.exists(new + RETIRED_SUFFIX)
    sent = old + RETIRED_SUFFIX
    assert os.path.isdir(old) and os.path.exists(sent)
    past = time.time() - 999
    os.utime(sent, (past, past))
    sweep_stale_data_dirs(root, meta, grace_secs=300)
    assert not os.path.exists(old) and not os.path.exists(sent)


def test_sweep_never_touches_dir_with_live_build_claim(tmp_path):
    # an overlapping run is STILL WRITING a not-yet-swapped dir and
    # advertises it with a held flock claim: no sweep may mark or
    # remove it, even at zero grace — this is what protects a build
    # slower than the grace from competing runs' start-of-run sweeps
    root, meta, old, new = _setup(tmp_path)
    slow = os.path.join(root, "data-v000003-cccc")
    os.makedirs(slow)
    fd = claim_build_dir(slow)
    assert fd is not None
    try:
        sweep_stale_data_dirs(root, meta, new, grace_secs=0)
        assert os.path.isdir(slow)
        assert not os.path.exists(slow + RETIRED_SUFFIX)
        # even a pre-existing mark (left by a claimless earlier sweep)
        # is cleared while the claim is live
        open(slow + RETIRED_SUFFIX, "w").close()
        sweep_stale_data_dirs(root, meta, new, grace_secs=300)
        assert os.path.isdir(slow)
        assert not os.path.exists(slow + RETIRED_SUFFIX)
    finally:
        release_build_claim(fd, slow)
    # claim released without a swap = crashed/abandoned attempt: the
    # normal mark → grace → reap path applies and collects the dir
    sweep_stale_data_dirs(root, meta, new, grace_secs=0)
    assert not os.path.exists(slow)
    assert not os.path.exists(slow + BUILDING_SUFFIX)


def test_sweep_reaps_crashed_claim_with_dir(tmp_path):
    # a SIGKILLed build leaves dir + claim file with the kernel lock
    # released — the dir takes the two-phase path and the claim file is
    # collected along with it
    root, meta, old, new = _setup(tmp_path)
    dead = os.path.join(root, "data-v000004-eeee")
    os.makedirs(dead)
    open(dead + BUILDING_SUFFIX, "w").close()  # claim, no lock held
    sweep_stale_data_dirs(root, meta, new, grace_secs=60)
    sent = dead + RETIRED_SUFFIX
    assert os.path.isdir(dead) and os.path.exists(sent)
    past = time.time() - 120
    os.utime(sent, (past, past))
    sweep_stale_data_dirs(root, meta, new, grace_secs=60)
    assert not os.path.exists(dead)
    assert not os.path.exists(sent)
    assert not os.path.exists(dead + BUILDING_SUFFIX)


def test_claim_build_dir_retries_through_probe_lock(tmp_path):
    # a sweep's liveness probe holds LOCK_SH on the claim for a syscall
    # pair; the writer's first LOCK_EX attempt then fails EWOULDBLOCK —
    # claim_build_dir must retry past it instead of silently downgrading
    # the build to grace-only protection. Simulate the prober with a
    # short-lived SH lock released from a helper thread mid-retry.
    import fcntl
    import threading

    d = os.path.join(str(tmp_path), "data-v000001-aaaa")
    claim = d + BUILDING_SUFFIX
    probe_fd = os.open(claim, os.O_RDWR | os.O_CREAT, 0o644)
    fcntl.flock(probe_fd, fcntl.LOCK_SH | fcntl.LOCK_NB)
    t = threading.Timer(0.08, os.close, args=(probe_fd,))
    t.start()
    try:
        fd = claim_build_dir(d)  # first attempt collides with the probe
        assert fd is not None  # …but a retry after release wins
        release_build_claim(fd, d)
    finally:
        t.cancel()
    assert not os.path.exists(claim)


def test_sweep_clears_dead_claim_on_live_dir(tmp_path):
    # a crash between the pointer swap and release_build_claim strands
    # a free-lock claim beside the now-LIVE dir: the keep branch must
    # collect it (it advertises a phantom in-flight build), but leave a
    # HELD claim alone (the swap→release window of a live writer)
    root, meta, old, new = _setup(tmp_path)
    dead_claim = new + BUILDING_SUFFIX
    open(dead_claim, "w").close()  # lock free = dead owner
    sweep_stale_data_dirs(root, meta, new, grace_secs=300)
    assert os.path.isdir(new) and not os.path.exists(dead_claim)
    fd = claim_build_dir(new)
    assert fd is not None
    try:
        sweep_stale_data_dirs(root, meta, new, grace_secs=300)
        assert os.path.exists(new + BUILDING_SUFFIX)  # held → kept
    finally:
        release_build_claim(fd, new)


def test_sweep_collects_stale_meta_tmp_and_dirless_claim(tmp_path):
    # SIGKILL litter: a unique meta temp from a crashed swap and a
    # claim whose dir never appeared are collected once old enough; a
    # FRESH temp/claim (a racing swap ms from its os.replace, a build
    # between claim and first byte) is left alone even at grace 0
    root, meta, old, new = _setup(tmp_path)
    stale_tmp = meta + ".tmp-deadbeef"
    fresh_tmp = meta + ".tmp-cafef00d"
    open(stale_tmp, "w").close()
    open(fresh_tmp, "w").close()
    stale_claim = os.path.join(root, "data-v000008-ffff" + BUILDING_SUFFIX)
    open(stale_claim, "w").close()
    past = time.time() - 3600
    os.utime(stale_tmp, (past, past))
    os.utime(stale_claim, (past, past))
    sweep_stale_data_dirs(root, meta, new, grace_secs=0)
    assert not os.path.exists(stale_tmp)
    assert not os.path.exists(stale_claim)
    assert os.path.exists(fresh_tmp)


def test_sweep_removes_orphan_sentinel(tmp_path):
    # a crash between rmtree and sentinel removal leaves a sentinel
    # with no dir — cleaned up instead of accumulating forever
    root, meta, old, new = _setup(tmp_path)
    orphan = os.path.join(root, "data-v000009-dddd" + RETIRED_SUFFIX)
    open(orphan, "w").close()
    sweep_stale_data_dirs(root, meta, new, grace_secs=60)
    assert not os.path.exists(orphan)
