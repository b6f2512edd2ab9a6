"""Content-identical multi-file re-layout of single-row-group fixtures.

Why this exists (round-11 verdict #6): the sf test fixtures are one
parquet file with ONE row group per table. Parquet is splittable only
at row-group boundaries, so every scan plans as ONE task and the bench
measures per-query fixed costs instead of parallel behaviour — the
round-11 scaling block showed the 8-core total BEATING the 32-core
total (258 s vs 291 s) because 32 cores were 31 idle cores plus
coordination overhead. A production corpus arrives as thousands of
row groups / files; the fixture layout, not the code, was the
parallelism ceiling.

``multifile_copy(sf_dir)`` rewrites each table into a DIRECTORY of
part files (row-slices in order, one row group each) under a per-user
temp root, and returns the copy's path. Properties:

* **Content-identical**: every part is a consecutive ``Table.slice``
  of the pyarrow-read source — same rows, same values, same schema
  (naive timestamps stay naive), same global order when parts are read
  in name order. Nothing is computed from query results; this is an
  input re-layout, the moral equivalent of pointing the bench at a
  production-layout copy of the same data.
* **One-time, outside timing**: built once per source fingerprint
  under an exclusive flock (two bench invocations over the same
  fixture serialize; an unchanged fixture is never rebuilt), staged
  and atomically renamed so a crashed build is invisible.
* **Probe-compatible**: the per-row-heavy operators guard their
  parallelism with ``df.inputFiles()`` probes (``ensure_parallelism``,
  ``spread_scan``). A multi-FILE layout is what those probes can see —
  a multi-row-group single file would be invisible to them (file count
  under-estimates splits) and they would stack a redundant exchange on
  an already-parallel scan. At the default 8 files under a 32-core
  session the guards still fire and fan the guarded work out to the
  full core count; on a session with <= 8 cores they no-op.

Chunk count: ``min(files_target, rows // min_rows_per_file)`` per
table, floor 1 — small dimension tables (nation, region) stay single
files; fact tables split to ``files_target`` parts. The default 8 is a
fixture-layout constant, NOT the session core count: the same copy
serves every ``$SPARK_GRAFT_CPUS`` tier, which is what makes the
driver's cross-core-count scaling comparison meaningful. 8 was chosen
by A/B against 16/32-way splits at sf0.1: the per-row-heavy operators
are parallelism-guarded (``ensure_parallelism``/``spread_scan``
repartition to the session's core count when the scan has fewer
files), so the copy only needs to unlock SPLITTABILITY, not supply
full fan-out — 32-way splits made Spark plan one task per tiny file
for every sub-second scan-bound query (+0.2-1.0 s each, pure task
overhead), while 8-way kept those flat AND kept the unguarded
map-heavy surfaces (streaming sources, int8 quantise, boilerplate)
within a few percent of their 32-way wins.
"""

from __future__ import annotations

import getpass
import os
import shutil
import tempfile

from ..functions.fingerprint import source_fingerprint
from ..functions.indexcache import build_lock

FILES_TARGET = 8
MIN_ROWS_PER_FILE = 100


def _split_table(src: str, out_dir: str, files_target: int) -> None:
    import pyarrow.parquet as pq

    tbl = pq.read_table(src)
    n = tbl.num_rows
    k = max(1, min(files_target, n // MIN_ROWS_PER_FILE))
    os.makedirs(out_dir, exist_ok=True)
    base, rem = divmod(n, k)
    off = 0
    for i in range(k):
        size = base + (1 if i < rem else 0)
        part = tbl.slice(off, size)
        off += size
        # one row group per part: the slice is written whole
        pq.write_table(
            part,
            os.path.join(out_dir, f"part-{i:05d}.parquet"),
            row_group_size=max(size, 1),
        )
    assert off == n


def multifile_copy(
    sf_dir: str,
    out_root: str | None = None,
    files_target: int = FILES_TARGET,
) -> str:
    """Return a directory mirroring ``sf_dir`` with every
    ``<table>.parquet`` file re-laid-out as a directory of row-slice
    part files (content-identical, global order preserved). Tables
    already stored as directories are passed through via symlink.
    Reuse is gated on the SOURCE fingerprint (size+mtime walk), so a
    regenerated fixture triggers a fresh copy; builds run under an
    exclusive flock and commit by atomic rename."""
    sf_dir = os.path.abspath(sf_dir.rstrip("/"))
    root = out_root or os.path.join(
        tempfile.gettempdir(), f"spark_graft_multifile_{getpass.getuser()}"
    )
    out = os.path.join(root, os.path.basename(sf_dir))
    fp_file = os.path.join(out, "_source-fingerprint")
    # files_target participates: a copy built at another split count
    # must not be served for this one
    fp = f"{source_fingerprint(sf_dir)}|ft={files_target}"
    with build_lock(out):
        if os.path.isfile(fp_file):
            with open(fp_file, encoding="utf-8") as f:
                if f.read() == fp:
                    return out
        staging = out + ".building"
        if os.path.isdir(staging):
            shutil.rmtree(staging)
        os.makedirs(staging)
        for entry in sorted(os.listdir(sf_dir)):
            if entry.startswith(("_", ".")):
                continue
            src = os.path.join(sf_dir, entry)
            dst = os.path.join(staging, entry)
            if os.path.isdir(src):
                os.symlink(src, dst)  # already a multi-file table
            elif entry.endswith(".parquet"):
                _split_table(src, dst, files_target)
            else:
                os.symlink(src, dst)
        with open(os.path.join(staging, "_source-fingerprint"), "w") as f:
            f.write(fp)
        if os.path.isdir(out):
            shutil.rmtree(out)
        os.rename(staging, out)
    return out
