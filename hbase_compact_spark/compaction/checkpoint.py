"""Crash-safe compaction progress checkpoint.

The reference persists its region cursor back into the config file
after every region so a restarted daemon resumes where it left off
(QHBaseCompact.java:102-115 storeNewConfig, re-read at :94-99,133).
We generalize the single integer cursor to a per-partition done-set.

Storage is a BASE snapshot + append-only JOURNAL (write-ahead-log
shape): every ``mark_done`` appends ONE fsync'd JSON line — O(1)
regardless of how many partitions are already done — and every
``FOLD_EVERY`` appends the journal folds into the base via an atomic
temp-file + rename and truncates. The old design rewrote the whole
JSON per partition, which is O(n) per mark and O(n²) for a full run:
invisible at thousands of partitions, the first thing to break at
millions. Recovery tolerates a crash mid-append (a torn final journal
line is ignored — its partition simply re-compacts, which is
idempotent by design).
"""

from __future__ import annotations

import json
import os
import re
import tempfile
import time

_SCHEME = re.compile(r"^[A-Za-z][A-Za-z0-9+.-]*://?")

FOLD_EVERY = 256  # journal lines folded into the base snapshot


class CompactionCheckpoint:
    """Atomic per-partition progress store (base + journal WAL).

    Keys are partition identifiers (e.g. ``region=p0/family=cf1``);
    values record completion metadata.

    Storage is the LOCAL filesystem. ``file:`` URIs are accepted and
    resolved to their local path; any other scheme (hdfs://, s3a://)
    raises immediately — silently writing a remote-looking path to a
    mangled local file is how progress gets lost. For remote tables,
    pass a checkpoint on local disk (or a network mount) explicitly.
    Single-writer by contract (one daemon per table), same as the
    reference's config rewrite.
    """

    def __init__(self, path: str) -> None:
        m = _SCHEME.match(path)
        if m:
            scheme = m.group(0).rstrip(":/").lower()
            if scheme != "file":
                raise ValueError(
                    f"CompactionCheckpoint is local-filesystem only; got "
                    f"{path!r}. Pass a local path for the checkpoint even "
                    f"when the table lives on {scheme}://."
                )
            stripped = path[m.end() :]
            path = "/" + stripped.lstrip("/") if not stripped.startswith("/") else stripped
            path = "/" + path.lstrip("/")
        self.path = path
        self.journal_path = path + ".journal"
        self._state: dict[str, dict] | None = None  # lazy cache
        self._journal_len = 0
        self._good_bytes: int | None = None  # journal bytes verified good

    # ------------------------------------------------------------ read
    def load(self) -> dict[str, dict]:
        """Base snapshot + journal replay. The in-memory cache makes
        repeat loads free within one process; a fresh process replays
        the journal once. A torn final line (crash mid-append) is
        dropped AND its byte offset remembered so the next append
        truncates it away first — appending onto a partial line would
        fuse two records into one permanently corrupt mid-journal
        line that hides every record after it."""
        if self._state is not None:
            return dict(self._state)
        state: dict[str, dict] = {}
        if os.path.exists(self.path):
            with open(self.path) as f:
                state = json.load(f)
        n_lines = 0
        good_bytes = 0
        if os.path.exists(self.journal_path):
            with open(self.journal_path, "rb") as f:
                for raw in f:
                    if not raw.endswith(b"\n"):
                        break  # torn tail: no newline ever landed
                    line = raw.decode("utf-8", "replace").strip()
                    if line:
                        try:
                            rec = json.loads(line)
                        except ValueError:
                            break  # torn tail that happens to end in
                            # a newline from a later write attempt
                        if rec.get("reset"):
                            state = {}
                        else:
                            state[rec["key"]] = rec["meta"]
                        n_lines += 1
                    good_bytes += len(raw)
        self._state = state
        self._journal_len = n_lines
        self._good_bytes = good_bytes
        return dict(state)

    def is_done(self, key: str) -> bool:
        return key in self.load()

    # ----------------------------------------------------------- write
    def mark_done(self, key: str, **meta) -> None:
        state = self.load()  # ensures cache + journal length
        rec = {"completed_at": time.time(), **meta}
        assert self._state is not None
        self._state[key] = rec
        self._append({"key": key, "meta": rec})
        self._journal_len += 1
        if self._journal_len >= FOLD_EVERY:
            self._fold()

    def reset(self) -> None:
        """Crash-safe reset: an fsync'd RESET record lands in the
        journal FIRST (replay clears everything before it), then the
        base is emptied, then the journal truncated — a crash between
        any two steps still replays to the empty state instead of
        resurrecting stale done-entries."""
        self.load()
        self._append({"reset": True})
        self._state = {}
        self._journal_len = 0
        self._atomic_write({})
        if os.path.exists(self.journal_path):
            os.unlink(self.journal_path)
        self._good_bytes = 0

    # -------------------------------------------------------- plumbing
    def _append(self, rec: dict) -> None:
        d = os.path.dirname(os.path.abspath(self.journal_path)) or "."
        os.makedirs(d, exist_ok=True)
        # drop a torn tail left by a crash mid-append before writing
        # after it (load() recorded how many bytes parsed cleanly)
        if (
            self._good_bytes is not None
            and os.path.exists(self.journal_path)
            and os.path.getsize(self.journal_path) > self._good_bytes
        ):
            with open(self.journal_path, "r+b") as f:
                f.truncate(self._good_bytes)
        with open(self.journal_path, "a") as f:
            f.write(json.dumps(rec, sort_keys=True) + "\n")
            f.flush()
            os.fsync(f.fileno())
        if self._good_bytes is not None:
            self._good_bytes = os.path.getsize(self.journal_path)

    def _fold(self) -> None:
        """Fold the journal into the base snapshot and truncate it.
        Crash-ordering: the base rename lands BEFORE the journal
        unlink, so a crash between the two merely replays lines whose
        effect is already in the base — idempotent."""
        assert self._state is not None
        self._atomic_write(self._state)
        if os.path.exists(self.journal_path):
            os.unlink(self.journal_path)
        self._journal_len = 0

    def _atomic_write(self, state: dict) -> None:
        d = os.path.dirname(os.path.abspath(self.path)) or "."
        os.makedirs(d, exist_ok=True)
        fd, tmp = tempfile.mkstemp(dir=d, prefix=".ckpt_")
        try:
            with os.fdopen(fd, "w") as f:
                json.dump(state, f, indent=0, sort_keys=True)
                f.flush()
                os.fsync(f.fileno())
            os.replace(tmp, self.path)  # atomic on POSIX, like the
            # reference's whole-file rewrite of config.properties
        finally:
            if os.path.exists(tmp):
                os.unlink(tmp)
