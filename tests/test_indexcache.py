"""functions/indexcache.py unit tests (round-9 advice: user-keyed cache
dirs + flock-serialized build sections for the durable-index queries).
Pure-filesystem tests — no Spark session."""

from __future__ import annotations

import getpass
import multiprocessing
import os
import time

from dwp_hbase_to_mongo_export_spark.functions import indexcache


def test_user_cache_dir_is_user_keyed_and_sf_separated():
    a = indexcache.user_cache_dir("tok_v1", "/data/sf0.01")
    b = indexcache.user_cache_dir("tok_v1", "/data/sf0.1/")
    assert getpass.getuser() in a
    assert os.path.basename(a) == "sf0.01"
    assert os.path.basename(b) == "sf0.1"
    assert os.path.dirname(a) == os.path.dirname(b)
    # layout version token changes the root, so an old-layout artifact
    # can never be picked up by new code
    c = indexcache.user_cache_dir("tok_v2", "/data/sf0.01")
    assert os.path.dirname(c) != os.path.dirname(a)


def test_build_lock_creates_parent_and_sidecar(tmp_path):
    path = str(tmp_path / "cacheroot" / "sf0.01")
    with indexcache.build_lock(path):
        assert os.path.isdir(os.path.dirname(path))
        assert os.path.exists(path + ".lock")


def _hold_then_stamp(path, order, hold_s):
    with indexcache.build_lock(path):
        order.append(("enter", time.time()))
        time.sleep(hold_s)
        order.append(("exit", time.time()))


def test_build_lock_serializes_across_processes(tmp_path):
    """Two processes contend for the same store's lock: their critical
    sections must not overlap (the round-9 flaky scenario was a second
    session rebuilding while the first's build was mid-flight)."""
    path = str(tmp_path / "store")
    mgr = multiprocessing.Manager()
    order = mgr.list()
    ps = [
        multiprocessing.Process(
            target=_hold_then_stamp, args=(path, order, 0.4)
        )
        for _ in range(2)
    ]
    for p in ps:
        p.start()
    for p in ps:
        p.join(timeout=30)
        assert p.exitcode == 0
    events = sorted(order, key=lambda e: e[1])
    assert [e[0] for e in events] == ["enter", "exit", "enter", "exit"]


def test_build_lock_released_on_exception(tmp_path):
    path = str(tmp_path / "store")
    try:
        with indexcache.build_lock(path):
            raise RuntimeError("boom")
    except RuntimeError:
        pass
    # re-acquirable immediately — the OS released the flock
    t0 = time.time()
    with indexcache.build_lock(path):
        pass
    assert time.time() - t0 < 1.0
