"""Fingerprint-keyed /tmp materializations with atomic publish.

Several workloads stage derived tables under the system temp dir
(queries may not write beneath the read-only fixture tree): the
snapshot-log tables, the multi-format copies, the session-stream
staging, the cluster-labels table. They all need the same contract:

* keyed by a FINGERPRINT of the source parquet (mtime_ns + size), so
  a driver fixture regeneration rebuilds instead of serving stale
  rows, while unit/parity/bench scale factors coexist;
* stale same-sf generations removed through an atomic rename into a
  trash name (a concurrent reader sees the intact tree or nothing);
* the build staged into a pid-suffixed tmp dir and PUBLISHED with one
  atomic rename — existence of the final root implies completeness,
  and concurrent same-fingerprint builders race safely (one rename
  wins, losers discard).

The reference's one materialization is its checkpoint file, rewritten
in place (QHBaseCompact.java:102-115); this generalizes it with the
crash/concurrency discipline a shared /tmp requires.
"""

from __future__ import annotations

import glob
import hashlib
import os
import posixpath
import shutil
import tempfile
import time


_CRASHED_TMP_MAX_AGE_S = 24 * 3600


def memo_root(
    sf_dir: str, tag: str, src_table: str, logic_rev: str = "1"
) -> tuple[str, bool]:
    """Return (root, is_complete) for a fingerprint-keyed memo dir.

    `logic_rev` is the BUILDER's logic revision and is part of the
    fingerprint: the source-parquet stat alone cannot see a code
    change in whatever produces the materialization, so bumping the
    rev when the builder's semantics change forces a rebuild instead
    of serving a stale pre-change tree (the staleness would otherwise
    surface as an unexplainable oracle mismatch).

    Sweeps stale same-sf generations (different fingerprint) and
    orphaned trash; skips current-generation ``.tmp*`` dirs unless
    they are older than a day — a fresh one may belong to a live
    concurrent builder, but a day-old tree is a crashed builder's
    leftover that would otherwise accumulate in /tmp forever."""
    src = os.path.join(sf_dir, f"{src_table}.parquet")
    st = os.stat(src)
    sf_name = os.path.basename(sf_dir.rstrip("/")) or "sf"
    fp = hashlib.md5(
        f"{tag}:{src}:{st.st_mtime_ns}:{st.st_size}:rev={logic_rev}".encode()
    ).hexdigest()[:12]
    root = posixpath.join(tempfile.gettempdir(), f"hcs_{tag}_{sf_name}_{fp}")
    now = time.time()
    for stale in glob.glob(
        posixpath.join(tempfile.gettempdir(), f"hcs_{tag}_{sf_name}_*")
    ):
        if stale == root or stale.endswith(".trash"):
            continue
        if stale.startswith(root + ".tmp"):
            try:
                fresh = now - os.stat(stale).st_mtime < _CRASHED_TMP_MAX_AGE_S
            except OSError:
                continue
            if fresh:
                continue  # possibly a LIVE concurrent builder's staging
        trash = f"{stale}.trash"
        try:
            os.rename(stale, trash)
        except OSError:
            continue  # another session already claimed/removed it
        shutil.rmtree(trash, ignore_errors=True)
    for orphan in glob.glob(
        posixpath.join(tempfile.gettempdir(), f"hcs_{tag}_{sf_name}_*.trash")
    ):
        shutil.rmtree(orphan, ignore_errors=True)
    return root, os.path.isdir(root)


def staging_dir(root: str) -> str:
    """Pid-suffixed build dir for `root`, wiped if a crashed same-pid
    attempt left one behind."""
    tmp = f"{root}.tmp{os.getpid()}"
    shutil.rmtree(tmp, ignore_errors=True)
    os.makedirs(tmp)
    return tmp


def publish(tmp: str, root: str) -> None:
    """Atomically promote `tmp` to `root`; if a concurrent builder
    published first, its complete tree wins and `tmp` is discarded.
    A rename failure with NO winner present (cross-device tmp,
    permissions) is a real error and re-raises — swallowing it would
    discard the completed build and hand the caller a root that does
    not exist (a FileNotFound far from the cause, rebuilt and
    re-discarded on every call)."""
    try:
        os.rename(tmp, root)
    except OSError:
        if os.path.isdir(root):  # lost the race to a complete winner
            shutil.rmtree(tmp, ignore_errors=True)
        else:
            raise
