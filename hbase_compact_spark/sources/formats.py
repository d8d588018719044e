"""Multi-format source/sink layer: CSV, JSON-lines, ORC, Parquet.

The reference's only inputs are HBase admin metadata and a java
properties file (QHBaseCompact.java:75-100); a standalone engine must
also ingest the column formats a data platform actually receives.
Readers always take an EXPLICIT schema — schema inference over CSV or
JSON is a full extra pass at 100 TB and silently mistypes columns
(ints that look like dates, empty strings vs NULL), so the engine
treats the schema as part of the table contract, exactly as the
snapshot log does for parquet.

Timestamp columns round-trip through an explicit ISO micros format on
the text formats; doubles round-trip exactly because Spark writes the
shortest decimal repr that parses back to the same IEEE value.
"""

from __future__ import annotations

import hashlib
import os
import posixpath
import tempfile

from pyspark.sql import DataFrame, SparkSession

TEXT_TS_FMT = "yyyy-MM-dd'T'HH:mm:ss.SSSSSS"
FORMATS = ("parquet", "csv", "json", "orc")


def write_table(df: DataFrame, path: str, fmt: str) -> None:
    """Write `df` under `path` in `fmt`. Text formats carry an
    explicit timestamp format and (csv) a header + full quoting so
    the read side needs no guessing."""
    w = df.write.mode("overwrite")
    if fmt == "csv":
        w = w.option("header", "true").option("timestampFormat", TEXT_TS_FMT)
    elif fmt == "json":
        w = w.option("timestampFormat", TEXT_TS_FMT)
    elif fmt not in ("parquet", "orc"):
        raise ValueError(f"unsupported format {fmt!r}")
    w.format(fmt).save(path)


def read_table(
    spark: SparkSession, path: str, fmt: str, schema
) -> DataFrame:
    """Schema-applied read of `path` in `fmt` (no inference pass)."""
    r = spark.read.schema(schema)
    if fmt == "csv":
        r = r.option("header", "true").option("timestampFormat", TEXT_TS_FMT)
    elif fmt == "json":
        r = r.option("timestampFormat", TEXT_TS_FMT)
    elif fmt not in ("parquet", "orc"):
        raise ValueError(f"unsupported format {fmt!r}")
    return r.format(fmt).load(path)


def materialized_formats_root(
    spark: SparkSession, sf_dir: str, df: DataFrame, tag: str
) -> str:
    """One fingerprint-keyed /tmp materialization of `df` in every
    FORMAT (same keying discipline as workload_compaction._memo_root:
    the source parquet's identity is in the directory name, so a
    fixture regeneration rebuilds instead of serving stale copies).
    Completeness = every format dir carries Spark's _SUCCESS marker."""
    src = os.path.join(sf_dir, "orders.parquet")
    st = os.stat(src)
    sf_name = os.path.basename(sf_dir.rstrip("/")) or "sf"
    fp = hashlib.md5(
        f"{tag}:{src}:{st.st_mtime_ns}:{st.st_size}".encode()
    ).hexdigest()[:12]
    root = posixpath.join(
        tempfile.gettempdir(), f"hcs_{tag}_{sf_name}_{fp}"
    )
    # same stale-generation discipline as workload_compaction.
    # _memo_root: a fixture regeneration changes the fingerprint, and
    # the old same-sf generation is renamed into a trash name before
    # removal so a concurrent reader sees the intact tree or nothing
    import glob
    import shutil

    for stale in glob.glob(
        posixpath.join(tempfile.gettempdir(), f"hcs_{tag}_{sf_name}_*")
    ):
        # skip current-generation tmp dirs too: a concurrent writer of
        # the SAME fingerprint (pytest-xdist worker) may be staging its
        # copy there right now; trashing it mid-write would tear it
        if (
            stale == root
            or stale.startswith(root + ".tmp")
            or stale.endswith(".trash")
        ):
            continue
        trash = f"{stale}.trash"
        try:
            os.rename(stale, trash)
        except OSError:
            continue
        shutil.rmtree(trash, ignore_errors=True)
    for orphan in glob.glob(
        posixpath.join(tempfile.gettempdir(), f"hcs_{tag}_{sf_name}_*.trash")
    ):
        shutil.rmtree(orphan, ignore_errors=True)
    complete = all(
        os.path.exists(posixpath.join(root, fmt, "_SUCCESS"))
        for fmt in FORMATS
    )
    if not complete:
        # stage into a pid-suffixed temp root and publish with one
        # atomic rename: concurrent same-fingerprint writers (xdist
        # workers) each build their own copy and exactly one rename
        # wins — a reader can never observe a partially rewritten tree
        # (the previous in-place per-format overwrite could be seen
        # half-done between formats)
        tmp = f"{root}.tmp{os.getpid()}"
        shutil.rmtree(tmp, ignore_errors=True)
        for fmt in FORMATS:
            write_table(df, posixpath.join(tmp, fmt), fmt)
        try:
            os.rename(root, f"{root}.{os.getpid()}.trash")
        except OSError:
            pass  # no prior (incomplete) tree to move aside
        try:
            os.rename(tmp, root)
        except OSError:
            # another writer published first; its tree is complete
            shutil.rmtree(tmp, ignore_errors=True)
        shutil.rmtree(f"{root}.{os.getpid()}.trash", ignore_errors=True)
    return root
