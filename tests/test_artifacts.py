"""ArtifactStore: registry-driven index artifacts (VERDICT r5 item 3).

The invariant under test is the one the /tmp+mtime sentinels violated:
a process killed mid-build must leave NOTHING a second engine will
reuse — reuse decisions come from registry.json, which is only updated
(atomically, under the flock) after a build completes. Plus: content-
derived versioning (no mtime), snapshot-safe GC of stale artifact dirs
behind the session-epoch barrier, and orphan-build sweeping.
"""

import os
import subprocess
import sys

import pytest

from kstore_spark.catalog import ArtifactStore


def _write_source(path, payload=b"x" * 100):
    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, "part-0.parquet"), "wb") as f:
        f.write(payload)


def test_build_register_reuse(tmp_path):
    src = str(tmp_path / "src")
    _write_source(src)
    store = ArtifactStore(str(tmp_path / "store"))
    version = ArtifactStore.source_version(src, "p1")
    calls = []

    def build(out_dir):
        calls.append(out_dir)
        os.makedirs(out_dir)
        open(os.path.join(out_dir, "data"), "w").write("artifact")

    d1 = store.get_or_build("idx:src:p1", version, build)
    d2 = store.get_or_build("idx:src:p1", version, build)
    assert d1 == d2 and len(calls) == 1
    assert open(os.path.join(d1, "data")).read() == "artifact"
    # a second engine (fresh store over the same base) reuses it too
    store2 = ArtifactStore(str(tmp_path / "store"))
    assert store2.get_or_build("idx:src:p1", version, build) == d1
    assert len(calls) == 1
    store.close(); store2.close()


def test_crashed_build_is_never_reused(tmp_path):
    """A build that dies after writing partial output must not register:
    the next get_or_build rebuilds from scratch and the partial dir is
    never returned."""
    src = str(tmp_path / "src")
    _write_source(src)
    store = ArtifactStore(str(tmp_path / "store"))
    version = ArtifactStore.source_version(src, "")
    partial = []

    def dying_build(out_dir):
        os.makedirs(out_dir)
        open(os.path.join(out_dir, "data"), "w").write("HALF-")
        partial.append(out_dir)
        raise RuntimeError("killed mid-build")

    with pytest.raises(RuntimeError):
        store.get_or_build("idx:crash", version, dying_build)
    assert "idx:crash" not in store._load()["artifacts"]

    def good_build(out_dir):
        os.makedirs(out_dir)
        open(os.path.join(out_dir, "data"), "w").write("complete")

    d = store.get_or_build("idx:crash", version, good_build)
    assert d != partial[0]
    assert open(os.path.join(d, "data")).read() == "complete"
    store.close()


def test_killed_process_build_not_reused_and_swept(tmp_path):
    """Hard kill (os._exit mid-build) from a SEPARATE process: the
    orphan build dir is unregistered, a fresh engine rebuilds, and the
    orphan is swept once no live session predates it."""
    src = str(tmp_path / "src")
    _write_source(src)
    base = str(tmp_path / "store")
    script = f"""
import os, sys
sys.path.insert(0, {os.getcwd()!r})
from kstore_spark.catalog import ArtifactStore
store = ArtifactStore({base!r})
def build(out_dir):
    os.makedirs(out_dir)
    open(os.path.join(out_dir, "data"), "w").write("HALF-")
    os._exit(1)   # SIGKILL-equivalent: no cleanup, no exception path
store.get_or_build("idx:kill", "v1", build)
"""
    proc = subprocess.run([sys.executable, "-c", script],
                          capture_output=True, timeout=60)
    assert proc.returncode == 1
    orphans = [d for d in os.listdir(base) if d.startswith("build_")]
    assert orphans, "the killed build should have left an orphan dir"

    # fresh engine: registry is empty for the key -> rebuilds; and its
    # open-time GC sweeps the orphan (its creator is dead, so the
    # barrier postdates the orphan)
    store = ArtifactStore(base)
    assert "idx:kill" not in store._load()["artifacts"]
    assert not [d for d in os.listdir(base) if d.startswith("build_")]

    def good_build(out_dir):
        os.makedirs(out_dir)
        open(os.path.join(out_dir, "data"), "w").write("complete")

    d = store.get_or_build("idx:kill", "v1", good_build)
    assert open(os.path.join(d, "data")).read() == "complete"
    store.close()


def test_source_version_ignores_mtime_tracks_content(tmp_path):
    src = str(tmp_path / "src")
    _write_source(src, b"a" * 100)
    v1 = ArtifactStore.source_version(src, "p")
    os.utime(os.path.join(src, "part-0.parquet"), (1, 1))  # mtime change
    assert ArtifactStore.source_version(src, "p") == v1
    _write_source(src, b"a" * 101)  # content (size) change
    assert ArtifactStore.source_version(src, "p") != v1
    assert ArtifactStore.source_version(src, "q") != \
        ArtifactStore.source_version(src, "p")  # params in the key
    # commit markers don't participate
    open(os.path.join(src, "_SUCCESS"), "w").close()
    assert ArtifactStore.source_version(src, "p") == \
        ArtifactStore.source_version(src, "p")


def test_stale_version_tombstoned_then_gcd(tmp_path):
    src = str(tmp_path / "src")
    _write_source(src, b"a" * 100)
    base = str(tmp_path / "store")
    store = ArtifactStore(base)

    def build_v(tag):
        def build(out_dir):
            os.makedirs(out_dir)
            open(os.path.join(out_dir, "data"), "w").write(tag)
        return build

    v1 = ArtifactStore.source_version(src, "")
    d1 = store.get_or_build("idx:gc", v1, build_v("one"))
    _write_source(src, b"a" * 200)  # source rewritten -> new version
    v2 = ArtifactStore.source_version(src, "")
    d2 = store.get_or_build("idx:gc", v2, build_v("two"))
    assert d1 != d2
    # stale dir still on disk (this session could hold lazy frames on it)
    assert os.path.isdir(d1)
    store.close()  # last session referencing the old snapshot ends
    store2 = ArtifactStore(base)  # open-time GC: barrier = its own start
    assert not os.path.isdir(d1)
    assert open(os.path.join(d2, "data")).read() == "two"
    store2.close()


def test_dead_source_artifact_tombstoned_then_gcd(tmp_path):
    """An artifact whose recorded source path vanished (dropped table,
    deleted test corpus) can never be requested again — open-time GC
    must tombstone it and, once no live session could reference it,
    delete the dir. Without this, per-corpus indexes accumulate in the
    shared store forever."""
    import shutil

    src = str(tmp_path / "src")
    _write_source(src)
    base = str(tmp_path / "store")
    store = ArtifactStore(base)

    def build(out_dir):
        os.makedirs(out_dir)
        open(os.path.join(out_dir, "data"), "w").write("x")

    v = ArtifactStore.source_version(src, "")
    d = store.get_or_build("idx:dead", v, build, src=src)
    assert os.path.isdir(d)
    shutil.rmtree(src)  # the source table is dropped

    store2 = ArtifactStore(base)  # tombstones the dead-source entry
    # this session (store) may still hold frames on it -> dir survives
    assert os.path.isdir(d)
    # and the entry is no longer served: a rebuilt source re-registers
    _write_source(src, b"y" * 50)
    store.close(); store2.close()

    store3 = ArtifactStore(base)  # all prior sessions gone -> swept
    assert not os.path.isdir(d)
    store3.close()


def test_srcless_artifacts_survive_gc(tmp_path):
    """Artifacts registered without a src (pre-existing entries, or
    derived data with no single source) must never be dead-source
    swept."""
    store = ArtifactStore(str(tmp_path / "store"))

    def build(out_dir):
        os.makedirs(out_dir)
        open(os.path.join(out_dir, "data"), "w").write("x")

    d = store.get_or_build("idx:nosrc", "v0", build)
    store.close()
    store2 = ArtifactStore(str(tmp_path / "store"))
    assert os.path.isdir(d)
    store2.close()


def test_bounded_version_ignores_appends_above_bound(tmp_path):
    """source_version_bounded must be stable when files whose ids all
    sit at/above the bound are appended (a new crawl must not
    invalidate the history index), and must change when a file that
    CAN hold history rows changes."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    src = str(tmp_path / "documents.parquet")
    os.makedirs(src)

    def write(name, ids):
        pq.write_table(pa.table({"doc_id": ids, "text": ["x"] * len(ids)}),
                       os.path.join(src, name))

    write("part-0.parquet", [0, 1, 2])
    v0 = ArtifactStore.source_version_bounded(src, "p", "doc_id", 100)
    # append an increment entirely at/above the bound
    write("part-1.parquet", [100, 101])
    v1 = ArtifactStore.source_version_bounded(src, "p", "doc_id", 100)
    assert v1 == v0
    # full-source version DOES change (sanity that the two differ)
    assert (ArtifactStore.source_version(src, "p")
            != ArtifactStore.source_version(src, "p_other"))
    # a file straddling the bound counts as history
    write("part-2.parquet", [50, 150])
    v2 = ArtifactStore.source_version_bounded(src, "p", "doc_id", 100)
    assert v2 != v1
    # rewriting a history file invalidates
    write("part-0.parquet", [0, 1, 2, 3])
    v3 = ArtifactStore.source_version_bounded(src, "p", "doc_id", 100)
    assert v3 != v2


def test_incremental_search_survives_append_without_reindex(spark, tmp_path):
    """END-TO-END append contract: build the history index, append a
    new crawl file to the documents table, and (a) the history index
    dir is REUSED verbatim (no rebuild — bounded versioning ignores
    files wholly at/above the bound), (b) text_search_incremental over
    the grown corpus equals text_search_ranked recomputed from
    scratch."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from kstore_spark.functions.text import (
        text_search_incremental, text_search_ranked, token_index_dir)

    sf = tmp_path / "sf"
    docs = sf / "documents.parquet"
    os.makedirs(docs)
    words = ["dup", "join", "scan", "key", "data"]
    base = [(i, " ".join(words[(i + j) % 5] for j in range(6)))
            for i in range(40)]
    pq.write_table(
        pa.table({"doc_id": [i for i, _ in base],
                  "text": [t for _, t in base],
                  "lang": ["en"] * 40, "source": ["s"] * 40,
                  "n_chars": [len(t) for _, t in base]}),
        str(docs / "part-0.parquet"))

    new_min = 40
    d_before = token_index_dir(spark, str(sf), max_doc=new_min)

    inc = [(i, " ".join(words[(i * 2 + j) % 5] for j in range(6)))
           for i in range(40, 55)]
    pq.write_table(
        pa.table({"doc_id": [i for i, _ in inc],
                  "text": [t for _, t in inc],
                  "lang": ["en"] * 15, "source": ["s"] * 15,
                  "n_chars": [len(t) for _, t in inc]}),
        str(docs / "part-1.parquet"))

    d_after = token_index_dir(spark, str(sf), max_doc=new_min)
    assert d_after == d_before  # append did NOT invalidate history

    got = sorted(tuple(r) for r in
                 text_search_incremental(spark, str(sf),
                                         new_min=new_min).collect())
    exp = sorted(tuple(r) for r in
                 text_search_ranked(spark, str(sf)).collect())
    assert got and got == exp
