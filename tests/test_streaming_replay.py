"""Replay-harness hygiene: per-process checkpoint scoping (r13).

Two concurrent test/driver processes share the artifact root; a fixed
checkpoint path let one process rmtree the directory while the other's
streaming query was mid-commit.  proc_scoped_dir suffixes the live pid
and sweeps siblings left by dead pids.
"""

from __future__ import annotations

import os

from recommend_spark.streaming.replay import ART, proc_scoped_dir


def test_proc_scoped_dir_sweeps_dead_pids_only():
    prefix = "chk_rs_test_scoping"
    mine = ART / f"{prefix}_{os.getpid()}"
    # a plausibly-dead pid: far beyond pid_max on this box
    dead = ART / f"{prefix}_999999999"
    # a LIVE foreign pid (pid 1 always exists): must never be touched
    live = ART / f"{prefix}_1"
    for d in (dead, live):
        d.mkdir(parents=True, exist_ok=True)
        (d / "commits").mkdir(exist_ok=True)

    try:
        got = proc_scoped_dir(prefix)
        assert got == mine
        assert not got.exists()  # returned pre-cleaned, caller creates it
        assert not dead.exists(), "dead-pid sibling must be swept"
        assert live.exists(), "live-pid sibling is another process's checkpoint"
    finally:
        for d in (dead, live, mine):
            if d.exists():
                import shutil

                shutil.rmtree(d)


def test_proc_scoped_dir_recleans_own_dir():
    prefix = "chk_rs_test_reclean"
    d1 = proc_scoped_dir(prefix)
    d1.mkdir(parents=True)
    (d1 / "state").mkdir()
    d2 = proc_scoped_dir(prefix)
    assert d2 == d1 and not d2.exists()
