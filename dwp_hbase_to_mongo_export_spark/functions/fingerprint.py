"""Cheap source-content fingerprints for durable index artifacts.

A durable artifact (BM25 postings, IVF/PQ codes) is keyed by the path
it was built FROM; but a path is not an identity — a regenerated
fixture at the same location, or two corpora whose directories share a
basename, would silently serve stale postings, and the error surfaces
later as a wrong query result (the round-7 review's bm25_indexed
finding). The fingerprint binds the artifact to the source's content
cheaply: absolute path + per-file (name, size, mtime_ns), md5-hashed —
no data read, metadata-only, same cost class as a file listing. Writers
stamp it into the artifact's meta relation; readers compare before
reuse and rebuild on mismatch.

mtime_ns granularity note: a same-size in-place rewrite within one
mtime tick is theoretically invisible; for the
generated-fixture/artifact lifecycles here (files are written whole,
sizes change with content) that is far below the failure it closes.
"""

from __future__ import annotations

import hashlib
import os


def source_fingerprint(*paths: str) -> str:
    """Metadata fingerprint of one or more files/directories. The
    ABSOLUTE path participates (two same-basename corpora fingerprint
    differently), directories are walked recursively in sorted order,
    and hidden/underscore bookkeeping files (_SUCCESS, .crc) are
    skipped so a rewrite of data changes the fingerprint but a
    committer artifact does not."""
    h = hashlib.md5()
    for p in sorted(os.path.abspath(x) for x in paths):
        h.update(p.encode("utf-8"))
        h.update(b"\x00")
        if os.path.isdir(p):
            files = []
            for root, dirs, names in os.walk(p):
                dirs[:] = sorted(d for d in dirs if not d.startswith(("_", ".")))
                files.extend(
                    os.path.join(root, f)
                    for f in names
                    if not f.startswith(("_", "."))
                )
            files.sort()
        elif os.path.isfile(p):
            files = [p]
        else:
            raise FileNotFoundError(f"source_fingerprint: {p} does not exist")
        for f in files:
            st = os.stat(f)
            rel = os.path.relpath(f, p) if os.path.isdir(p) else os.path.basename(f)
            h.update(f"{rel}|{st.st_size}|{st.st_mtime_ns}\n".encode("utf-8"))
    return h.hexdigest()
