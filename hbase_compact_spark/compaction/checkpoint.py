"""Crash-safe compaction progress checkpoint.

The reference persists its region cursor back into the config file
after every region so a restarted daemon resumes where it left off
(QHBaseCompact.java:102-115 storeNewConfig, re-read at :94-99,133).
We generalize the single integer cursor to a per-partition done-set,
written atomically (temp file + rename) as JSON.
"""

from __future__ import annotations

import json
import os
import re
import tempfile
import time

_SCHEME = re.compile(r"^[A-Za-z][A-Za-z0-9+.-]*://?")


class CompactionCheckpoint:
    """Tiny atomic key-value progress store.

    Keys are partition identifiers (e.g. ``region=p0/family=cf1``);
    values record completion metadata. At 100 TB scale the number of
    partitions is bounded (thousands), so a single JSON file is fine;
    swap for a parquet/Delta state table if partitions explode.

    Storage is the LOCAL filesystem (atomic temp-file + rename).
    ``file:`` URIs are accepted and resolved to their local path; any
    other scheme (hdfs://, s3a://) raises immediately — silently
    writing a remote-looking path to a mangled local file is how
    progress gets lost. For remote tables, pass a checkpoint on local
    disk (or a network mount) explicitly.
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

    def load(self) -> dict[str, dict]:
        if not os.path.exists(self.path):
            return {}
        with open(self.path) as f:
            return json.load(f)

    def is_done(self, key: str) -> bool:
        return key in self.load()

    def mark_done(self, key: str, **meta) -> None:
        state = self.load()
        state[key] = {"completed_at": time.time(), **meta}
        self._atomic_write(state)

    def reset(self) -> None:
        self._atomic_write({})

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
