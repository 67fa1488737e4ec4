"""TableFS commit-primitive contracts (logstore/tablefs.py) — the
pieces the txn matrix can't see from above:

- HadoopTableFS's exclusive create never exposes a torn/empty version
  file (ADVICE r07 high: write-tmp THEN rename-if-absent, not
  create-then-write);
- the lost-race classifier matches Java exception CLASSES, never
  message text (VERDICT r07 #4);
- put_atomic surfaces a failed checkpoint rename instead of silently
  dropping it (ADVICE r07 low).
"""

import os

import pytest

from outpost_spark.logstore.tablefs import HadoopTableFS, LocalTableFS


@pytest.fixture
def hfs(spark):
    return HadoopTableFS(spark)


def _uri(tmp_path, name: str) -> str:
    return "file://" + str(tmp_path / name)


class _FakeP4JError(Exception):
    """Duck-typed py4j error carrying a REAL Java exception object."""

    def __init__(self, java_exception):
        super().__init__(str(java_exception))
        self.java_exception = java_exception


# ---------------------------------------------------------------------------
# exclusive create: full content, conflict semantics, no torn files
# ---------------------------------------------------------------------------

def test_put_if_absent_writes_full_content_and_detects_conflict(
    hfs, tmp_path
):
    dst = _uri(tmp_path, "0001.json")
    assert hfs.put_if_absent(dst, b'{"v": 1}') is True
    assert hfs.read_json(dst) == {"v": 1}
    # lost race: returns False, NEVER touches the winner's content
    assert hfs.put_if_absent(dst, b'{"v": "loser"}') is False
    assert hfs.read_json(dst) == {"v": 1}
    # loser's tmp file is cleaned up
    leftovers = [n for n in os.listdir(tmp_path) if n.startswith(".tmp-")]
    assert leftovers == []


def test_put_if_absent_never_exposes_destination_before_rename(
    hfs, tmp_path, monkeypatch
):
    """Crash window simulation: if the commit dies BETWEEN payload write
    and rename, the destination must not exist at all — a torn NNNN.json
    would wedge every subsequent _log_entries/read_json (ADVICE r07)."""
    dst = _uri(tmp_path, "0001.json")

    def boom():
        raise RuntimeError("committer crashed before rename")

    monkeypatch.setattr(hfs, "_rename_none_opts", boom)
    with pytest.raises(RuntimeError):
        hfs.put_if_absent(dst, b'{"v": 1}')
    assert not os.path.exists(tmp_path / "0001.json")
    # the orphan is a hidden tmp file — invisible to the version scanner
    leftovers = [n for n in os.listdir(tmp_path) if n.startswith(".tmp-")]
    assert len(leftovers) == 1


def test_local_put_if_absent_same_contract(tmp_path):
    fs = LocalTableFS()
    dst = str(tmp_path / "0001.json")
    assert fs.put_if_absent(dst, b'{"v": 1}') is True
    assert fs.put_if_absent(dst, b'{"v": 2}') is False
    assert fs.read_json(dst) == {"v": 1}
    assert [n for n in os.listdir(tmp_path) if n.startswith(".tmp-")] == []


# ---------------------------------------------------------------------------
# lost-race classification: Java class, not message text
# ---------------------------------------------------------------------------

def test_exists_classifier_matches_class_not_message(hfs, spark):
    jvm = spark._jvm
    # a genuine write failure whose MESSAGE mentions "already exists"
    # must re-raise, not masquerade as a retryable conflict
    io_exc = jvm.java.io.IOException(
        "disk corrupt: block already exists in damaged segment"
    )
    assert hfs._is_exists_exception(_FakeP4JError(io_exc)) is False
    # the real conflict class matches regardless of phrasing
    faee = jvm.org.apache.hadoop.fs.FileAlreadyExistsException(
        "unexpected phrasing with no recognizable words"
    )
    assert hfs._is_exists_exception(_FakeP4JError(faee)) is True
    # ... including when it is nested as a CAUSE
    wrapped = jvm.java.io.IOException("rename failed")
    wrapped.initCause(faee)
    assert hfs._is_exists_exception(_FakeP4JError(wrapped)) is True
    # non-py4j exceptions (no java_exception attr) never classify
    assert hfs._is_exists_exception(RuntimeError("already exists")) is False


def test_put_if_absent_reraises_non_exists_failure(hfs, tmp_path, spark, monkeypatch):
    """End-to-end pin of VERDICT r07 #4: inject a non-exists IOException
    whose text contains 'already exists' at the rename and assert the
    commit RAISES (no phantom conflict)."""
    dst = _uri(tmp_path, "0001.json")
    io_exc = spark._jvm.java.io.IOException("already exists (but not really)")

    def boom():
        raise _FakeP4JError(io_exc)

    monkeypatch.setattr(hfs, "_rename_none_opts", boom)
    with pytest.raises(_FakeP4JError):
        hfs.put_if_absent(dst, b"{}")


# ---------------------------------------------------------------------------
# put_atomic: overwrite wins, failures are loud
# ---------------------------------------------------------------------------

def test_put_atomic_overwrites_and_cleans_tmp(hfs, tmp_path):
    dst = _uri(tmp_path, "_last_checkpoint")
    hfs.put_atomic(dst, b'{"v": 1}')
    hfs.put_atomic(dst, b'{"v": 2}')  # exercises the rename-onto-existing path
    assert hfs.read_json(dst) == {"v": 2}
    assert [n for n in os.listdir(tmp_path) if n.startswith(".tmp-")] == []


def test_put_atomic_raises_when_rename_cannot_land(hfs, tmp_path, monkeypatch):
    """Hadoop rename returns false with NO exception when it fails
    (here forced with a vanished tmp file).  The old code ignored the
    boolean and silently dropped the checkpoint; now it must raise
    (ADVICE r07 low)."""
    real_fs = hfs._fs(_uri(tmp_path, "x"))

    class _FalseRenameFS:
        """Delegates everything but always fails rename with False."""

        def __getattr__(self, name):
            return getattr(real_fs, name)

        def rename(self, src, dst):
            return False

    monkeypatch.setattr(hfs, "_fs", lambda path: _FalseRenameFS())
    with pytest.raises(IOError):
        hfs.put_atomic(_uri(tmp_path, "_last_checkpoint"), b'{"v": 1}')
