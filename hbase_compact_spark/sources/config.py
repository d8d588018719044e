"""Properties-file config source — the reference's A1 operator.

The reference drives everything from a 6-key java .properties file
that doubles as persisted state (QHBaseCompact.java:29-34 keys,
:75-100 load with typed parsing and exit-on-malformed, :102-115
store). This module reads/writes the same format, typed, with the
same validation posture (raise on malformed — we surface the error
instead of System.exit) and round-trips the reference's shipped
config (conf/config.properties).
"""

from __future__ import annotations

from dataclasses import asdict, dataclass, fields


@dataclass
class CompactionConfig:
    """Typed view of the reference's config record, same field names
    (including the 'marjorfilesize' typo, QHBaseCompact.java:32)."""

    starttime: str = "00:00:00"
    endtime: str = "23:59:59"
    tablename: str = ""
    marjorfilesize: int = 530_000_000_000
    directcompactsize: int = 100_000_000_000
    regionindex: int = 0


_INT_FIELDS = {"marjorfilesize", "directcompactsize", "regionindex"}


def _unescape(v: str) -> str:
    """java.util.Properties escape semantics: \\t/\\n/\\r/\\f map to
    their control characters, \\\\ to one backslash, and \\X to X for
    any other X (java drops the backslash) — a blanket
    .replace('\\\\', '') would collapse escaped backslashes entirely
    and turn \\t into a literal 't'."""
    out = []
    i = 0
    while i < len(v):
        ch = v[i]
        if ch == "\\" and i + 1 < len(v):
            nxt = v[i + 1]
            out.append({"t": "\t", "n": "\n", "r": "\r", "f": "\f"}.get(nxt, nxt))
            i += 2
        else:
            out.append(ch)
            i += 1
    return "".join(out)


def parse_properties(text: str) -> dict[str, str]:
    """Minimal java-properties parser: k=v lines, '#'/'!' comments,
    java escape sequences unescaped (the reference's shipped file
    escapes colons: '08\\:30\\:00')."""
    out: dict[str, str] = {}
    for raw in text.splitlines():
        line = raw.strip()
        if not line or line[0] in "#!":
            continue
        if "=" not in line:
            continue
        k, _, v = line.partition("=")
        out[k.strip()] = _unescape(v.strip())
    return out


def load_config(path: str) -> CompactionConfig:
    with open(path) as f:
        props = parse_properties(f.read())
    kwargs = {}
    for fld in fields(CompactionConfig):
        if fld.name not in props:
            continue
        v = props[fld.name]
        # typed parse — malformed values raise, mirroring the
        # reference's exit-on-parse-failure (QHBaseCompact.java:83-91)
        kwargs[fld.name] = int(v) if fld.name in _INT_FIELDS else v
    return CompactionConfig(**kwargs)


def store_config(path: str, cfg: CompactionConfig) -> None:
    """Whole-file rewrite, like storeNewConfig (QHBaseCompact.java:
    102-115). Times keep their backslash-escaped colons so the output
    round-trips through java's Properties loader too."""
    lines = []
    for k, v in asdict(cfg).items():
        sval = str(v)
        # escape backslashes FIRST (asymmetric round-trips otherwise:
        # a value containing a backslash would re-parse differently),
        # then the colon escaping the reference's shipped file uses
        sval = sval.replace("\\", "\\\\")
        if k in ("starttime", "endtime"):
            sval = sval.replace(":", "\\:")
        lines.append(f"{k}={sval}")
    with open(path, "w") as f:
        f.write("\n".join(lines) + "\n")
