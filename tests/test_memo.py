"""sources/memo.py — the fingerprint-keyed /tmp materialization
discipline every staged table (session stream, cluster labels,
compaction staging) rides on. No Spark needed: the contract is pure
filesystem semantics."""

from __future__ import annotations

import os

from hbase_compact_spark.sources.memo import memo_root, publish, staging_dir

SF_DIR = "/root/testdata/sf0.001"


def _build(tag: str) -> str:
    root, complete = memo_root(SF_DIR, tag, "events")
    assert not complete, "fresh tag must start incomplete"
    tmp = staging_dir(root)
    with open(os.path.join(tmp, "data.txt"), "w") as f:
        f.write("payload")
    publish(tmp, root)
    return root


def test_memo_publish_is_atomic_and_idempotent(tmp_path):
    tag = f"memotest{os.getpid()}"
    root = _build(tag)
    # existence == completeness (atomic rename publish)
    root2, complete = memo_root(SF_DIR, tag, "events")
    assert root2 == root and complete
    assert open(os.path.join(root, "data.txt")).read() == "payload"
    import shutil

    shutil.rmtree(root, ignore_errors=True)


def test_memo_loser_of_publish_race_discards(tmp_path):
    tag = f"memorace{os.getpid()}"
    root = _build(tag)
    # a second builder staged concurrently: its publish must lose
    # cleanly (winner's tree untouched, loser's tmp removed)
    tmp2 = staging_dir(root)
    with open(os.path.join(tmp2, "data.txt"), "w") as f:
        f.write("loser")
    publish(tmp2, root)
    assert open(os.path.join(root, "data.txt")).read() == "payload"
    assert not os.path.exists(tmp2)
    import shutil

    shutil.rmtree(root, ignore_errors=True)


def test_memo_stale_generation_swept(tmp_path):
    tag = f"memostale{os.getpid()}"
    root = _build(tag)
    # plant a same-tag same-sf dir with a DIFFERENT fingerprint (a
    # regenerated-fixture leftover): the next memo_root must sweep it
    stale = root[:-12] + "deadbeef0000"
    os.makedirs(stale, exist_ok=True)
    root2, complete = memo_root(SF_DIR, tag, "events")
    assert root2 == root and complete
    assert not os.path.exists(stale), "stale generation not swept"
    import shutil

    shutil.rmtree(root, ignore_errors=True)
