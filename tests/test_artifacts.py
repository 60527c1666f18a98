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


def _mk_corpus(docs_dir, n0=40, n1=15, doc_len=6):
    """Tiny two-file corpus: part-0 holds doc_id < n0 (history),
    part-1 holds the increment [n0, n0+n1)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    os.makedirs(docs_dir)
    words = ["dup", "join", "scan", "key", "data"]

    def write(name, rows):
        pq.write_table(
            pa.table({"doc_id": [i for i, _ in rows],
                      "text": [t for _, t in rows],
                      "lang": ["en"] * len(rows),
                      "source": ["s"] * len(rows),
                      "n_chars": [len(t) for _, t in rows]}),
            os.path.join(str(docs_dir), name))

    write("part-0.parquet",
          [(i, " ".join(words[(i + j) % 5] for j in range(doc_len)))
           for i in range(n0)])
    write("part-1.parquet",
          [(i, " ".join(words[(i * 2 + j) % 5] for j in range(doc_len)))
           for i in range(n0, n0 + n1)])


def _read_postings(spark, d):
    rows = spark.read.parquet(d).collect()
    return sorted((r["tok"], r["doc_id"], r["tf"], tuple(r["positions"]),
                   r["dl"]) for r in rows)


def test_compaction_folds_increment_and_retires_old_boundary(spark, tmp_path):
    """compact_token_index(old→new) must (a) produce postings/norms
    byte-equal (as relations) to a from-scratch m{new} build, (b) be
    reused verbatim by later token_index_dir(new) calls, (c) retire the
    m{old} boundary artifacts from the registry, and (d) leave the
    incremental searches exact with an empty increment leg."""
    from kstore_spark.functions.text import (
        compact_token_index, text_search_bm25, text_search_bm25_incremental,
        token_index_dir, token_norms_dir)

    sf = tmp_path / "sf"
    _mk_corpus(sf / "documents.parquet")
    src = str(sf / "documents.parquet")

    old_idx = token_index_dir(spark, str(sf), max_doc=40)
    token_norms_dir(spark, str(sf), max_doc=40)
    idx_dir, norms_dir = compact_token_index(spark, str(sf), 40, 55)

    # (a) relation-equal to a from-scratch build of the same boundary:
    # build it from scratch in an isolated store so names can't collide
    iso = ArtifactStore(str(tmp_path / "iso_store"))
    from kstore_spark.functions.text import _postings_frame
    scratch = str(tmp_path / "scratch_idx")
    _postings_frame(spark, str(sf), 64, hi=55).write.partitionBy(
        "bucket").parquet(scratch)
    assert _read_postings(spark, idx_dir) == _read_postings(spark, scratch)
    iso.close()

    # norms: stats row equals the full recount
    stats = spark.read.parquet(os.path.join(norms_dir, "stats")).collect()[0]
    assert stats["n_docs"] == 55 and stats["total_tokens"] == 55 * 6

    # (b) a later boundary-55 request reuses the compacted artifact
    assert token_index_dir(spark, str(sf), max_doc=55) == idx_dir
    assert token_norms_dir(spark, str(sf), max_doc=55) == norms_dir

    # (c) the old boundary is retired (tombstoned, not deleted: live
    # readers finish their session)
    store = ArtifactStore()
    reg = store._load()
    assert f"tokidx:{src}:b64p2m40" not in reg["artifacts"]
    assert os.path.isdir(old_idx)  # epoch barrier protects the dir

    # (d) incremental search at the new boundary = full search, served
    # entirely from the compacted artifacts (empty increment)
    full = sorted(tuple(r) for r in text_search_bm25(spark, str(sf)).collect())
    after = sorted(tuple(r) for r in text_search_bm25_incremental(
        spark, str(sf), new_min=55).collect())
    assert after == full and after


def test_crash_mid_fold_leaves_old_boundary_serviceable(spark, tmp_path,
                                                        monkeypatch):
    """A compaction killed mid-merge must register NOTHING: the
    m{new} name stays absent, the m{old} artifacts stay registered and
    the incremental search keeps working off them; a retry then
    completes the fold."""
    import kstore_spark.functions.text as text

    sf = tmp_path / "sf"
    _mk_corpus(sf / "documents.parquet")
    src = str(sf / "documents.parquet")

    token_index_dir = text.token_index_dir
    before = token_index_dir(spark, str(sf), max_doc=40)
    text.token_norms_dir(spark, str(sf), max_doc=40)

    real = text._postings_frame

    def boom(*a, **kw):
        if kw.get("lo") is not None:  # only the compaction's merge leg
            raise RuntimeError("killed mid-fold")
        return real(*a, **kw)

    monkeypatch.setattr(text, "_postings_frame", boom)
    with pytest.raises(RuntimeError, match="mid-fold"):
        text.compact_token_index(spark, str(sf), 40, 55)
    monkeypatch.setattr(text, "_postings_frame", real)

    reg = ArtifactStore()._load()
    assert f"tokidx:{src}:b64p2m55" not in reg["artifacts"]
    assert f"tokidx:{src}:b64p2m40" in reg["artifacts"]
    # old boundary still serves the incremental search exactly
    got = sorted(tuple(r) for r in text.text_search_bm25_incremental(
        spark, str(sf), new_min=40).collect())
    full = sorted(tuple(r) for r in text.text_search_bm25(
        spark, str(sf)).collect())
    assert got == full and got
    # retry completes and is picked up
    idx_dir, _ = text.compact_token_index(spark, str(sf), 40, 55)
    assert token_index_dir(spark, str(sf), max_doc=55) == idx_dir


def test_repeated_compaction_keeps_one_live_boundary(spark, tmp_path):
    """Fold twice (40→48→55): each fold retires the previous boundary,
    the registry holds exactly ONE live tokidx boundary artifact for
    this source afterwards, and search results stay exact at every
    boundary — the steady-state lifecycle (ingest → fold → ingest)."""
    from kstore_spark.functions.text import (
        compact_token_index, text_search_bm25, text_search_bm25_incremental,
        token_norms_dir, token_index_dir)

    sf = tmp_path / "sf"
    _mk_corpus(sf / "documents.parquet")
    src = str(sf / "documents.parquet")

    token_index_dir(spark, str(sf), max_doc=40)
    token_norms_dir(spark, str(sf), max_doc=40)
    compact_token_index(spark, str(sf), 40, 48)
    idx2, _ = compact_token_index(spark, str(sf), 48, 55)

    reg = ArtifactStore()._load()
    live = [n for n in reg["artifacts"]
            if n.startswith(f"tokidx:{src}:") and "m" in n.split(":")[-1]]
    assert live == [f"tokidx:{src}:b64p2m55"]
    assert token_index_dir(spark, str(sf), max_doc=55) == idx2

    full = sorted(tuple(r) for r in text_search_bm25(spark, str(sf)).collect())
    got = sorted(tuple(r) for r in text_search_bm25_incremental(
        spark, str(sf), new_min=55).collect())
    assert got == full and got


def test_compaction_fallback_when_old_boundary_absent(spark, tmp_path):
    """A fold whose old boundary was never built cannot honor the
    increment-only cost contract (ADVICE r7): it must WARN and register
    the same from-scratch m{new} artifacts a direct boundary build
    would — never silently tokenize all history behind the fold's
    'history contributes built postings' docstring."""
    import kstore_spark.functions.text as text

    sf = tmp_path / "sf"
    _mk_corpus(sf / "documents.parquet")
    with pytest.warns(UserWarning, match="falling back"):
        idx_dir, norms_dir = text.compact_token_index(spark, str(sf), 40, 55)
    assert text.token_index_dir(spark, str(sf), max_doc=55) == idx_dir
    assert text.token_norms_dir(spark, str(sf), max_doc=55) == norms_dir
    got = sorted(tuple(r) for r in text.text_search_bm25_incremental(
        spark, str(sf), new_min=55).collect())
    full = sorted(tuple(r) for r in
                  text.text_search_bm25(spark, str(sf)).collect())
    assert got == full and got


def test_lifecycle_fold_search_matches_ranked(spark):
    """The lifecycle driver entry (build → incremental query → fold →
    query again) returns exactly the full-corpus ranked search for its
    terms, and leaves the process pointed back at the shared store
    (artifact_base restores the env var)."""
    import os

    from kstore_spark.functions.text import (
        FOLD_TERMS, lifecycle_fold_search, text_search_ranked)

    sf = "/root/testdata/sf0.001"
    env_before = os.environ.get("KSTORE_ARTIFACTS_DIR")
    got = [tuple(r) for r in lifecycle_fold_search(spark, sf).collect()]
    assert os.environ.get("KSTORE_ARTIFACTS_DIR") == env_before
    exp = [tuple(r) for r in
           text_search_ranked(spark, sf, terms=FOLD_TERMS).collect()]
    assert got == exp and got


def test_retract_token_index_construction_and_no_resurfacing(spark):
    """The DELETE leg of the index lifecycle (r11): (a) retracted
    postings == a fresh postings build over corpus-minus-takedown
    (construction equality — the anti-filter must drop exactly the
    deleted docs' rows and nothing else, positions and dl included);
    (b) the retracted norms exclude the ids and the recomputed stats
    match the survivors (BM25's avgdl reflects the takedown); (c) the
    retracted ranked search resurfaces no deleted doc AND differs from
    the unretracted ranking (8/45/323 sit in the unretracted top-k, so
    a search that merely hid rows post-hoc without re-deriving df
    would disagree with the oracle — the driver row pins that; here we
    pin the visible reshape)."""
    import os

    from pyspark.sql import functions as F

    from kstore_spark.functions.text import (
        RETRACT_IDS, _postings_frame, retract_token_index,
        text_search_ranked, text_search_retracted, token_norms_dir)

    sf = "/root/testdata/sf0.001"
    idx_dir, norms_dir = retract_token_index(spark, sf, RETRACT_IDS)
    got = sorted(
        (r["tok"], r["doc_id"], r["tf"], tuple(r["positions"]), r["dl"])
        for r in spark.read.parquet(idx_dir).collect())
    exp = sorted(
        (r["tok"], r["doc_id"], r["tf"], tuple(r["positions"]), r["dl"])
        for r in _postings_frame(spark, sf, 64)
        .filter(~F.col("doc_id").isin(list(RETRACT_IDS))).collect())
    assert got == exp and got

    dl = {r["doc_id"]: r["dl"] for r in spark.read.parquet(
        os.path.join(norms_dir, "dl")).collect()}
    assert not set(RETRACT_IDS) & set(dl)
    full_dl = {r["doc_id"]: r["dl"] for r in spark.read.parquet(
        os.path.join(token_norms_dir(spark, sf), "dl")).collect()}
    assert dl == {d: l for d, l in full_dl.items() if d not in RETRACT_IDS}
    stats = spark.read.parquet(os.path.join(norms_dir, "stats")).collect()[0]
    assert stats["n_docs"] == len(dl)
    assert stats["total_tokens"] == sum(dl.values())

    retracted = [r["doc_id"] for r in
                 text_search_retracted(spark, sf).collect()]
    assert not set(retracted) & set(RETRACT_IDS)
    unret = [r["doc_id"] for r in text_search_ranked(spark, sf).collect()]
    assert retracted != unret and set(unret) & set(RETRACT_IDS)

    # BM25 leg: no resurfacing, and the SCORES shift too (survivor
    # avgdl + df — not just rows hidden from an unretracted ranking)
    from kstore_spark.functions.text import (
        text_search_bm25, text_search_bm25_retracted)

    bm = {r["doc_id"]: r["score_ppm"]
          for r in text_search_bm25(spark, sf).collect()}
    bmr = {r["doc_id"]: r["score_ppm"]
           for r in text_search_bm25_retracted(spark, sf).collect()}
    assert not set(bmr) & set(RETRACT_IDS)
    common = set(bm) & set(bmr)
    assert common and any(bm[d] != bmr[d] for d in common), (
        "retraction must shift surviving docs' BM25 scores "
        "(df/avgdl re-derived), not merely hide rows")


def _mk_embeddings(emb_dir, n=80, dim=8):
    """Deterministic float vectors: v[i][j] = hash-ish derivation."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    os.makedirs(emb_dir)
    vecs = [[((i * 31 + j * 7) % 13 - 6) / 6.0 for j in range(dim)]
            for i in range(n)]
    pq.write_table(
        pa.table({"vec_id": pa.array(range(n), pa.int64()),
                  "embedding": pa.array(vecs, pa.list_(pa.float32())),
                  "label": pa.array([i % 3 for i in range(n)],
                                    pa.int32())}),
        os.path.join(str(emb_dir), "part-0.parquet"))


def test_ivf_compaction_folds_and_matches_scratch(spark, tmp_path):
    """compact_ivf_store(old→new) must produce a store relation equal
    to a from-scratch d{new} build (same centroids: first-n_cells ids
    are inside any history), be reused by later ivf_store_dir calls,
    retire the old boundary, and leave sim_ann_ivf_incremental at the
    new boundary equal to the full-corpus IVF (empty increment)."""
    from kstore_spark.functions.similarity import (
        _centroids, _emb, _nearest_cells, compact_ivf_store, ivf_store_dir,
        sim_ann_ivf, sim_ann_ivf_incremental)
    from pyspark.sql import functions as F

    sf = tmp_path / "sf"
    _mk_embeddings(sf / "embeddings.parquet")
    src = str(sf / "embeddings.parquet")

    ivf_store_dir(spark, str(sf), max_vec=60)
    folded = compact_ivf_store(spark, str(sf), 60, 80)

    # relation-equal to a from-scratch assignment of the same boundary
    emb = _emb(spark, str(sf)).filter(F.col("vec_id") < 80)
    cents = _centroids(emb, 16)
    scratch = emb.withColumn(
        "cell", _nearest_cells(F.col("v"), cents, 1)[0]["cell"])
    got = sorted((r["vec_id"], int(r["cell"]))
                 for r in spark.read.parquet(folded).collect())
    want = sorted((r["vec_id"], int(r["cell"]))
                  for r in scratch.collect())
    assert got == want and len(got) == 80

    # reuse + retirement
    assert ivf_store_dir(spark, str(sf), max_vec=80) == folded
    reg = ArtifactStore()._load()
    assert f"ivf:{src}:c16:d60" not in reg["artifacts"]
    assert f"ivf:{src}:c16:d80" in reg["artifacts"]

    # incremental at the folded boundary == full-corpus IVF
    full = {tuple(r) for r in sim_ann_ivf(spark, str(sf)).collect()}
    post = {tuple(r) for r in
            sim_ann_ivf_incremental(spark, str(sf), new_min=80).collect()}
    assert post == full and post


def test_ivf_fold_rejects_pre_centroid_history(spark, tmp_path):
    """ADVICE r7: a history store built at old_min < n_cells used a
    TRUNCATED centroid set — folding its assignments forward would
    silently register a store that is not from-scratch-equal at
    new_min. The fold must refuse up front (the caller rebuilds from
    scratch at new_min instead)."""
    from kstore_spark.functions.similarity import compact_ivf_store

    sf = tmp_path / "sf"
    _mk_embeddings(sf / "embeddings.parquet")
    with pytest.raises(AssertionError, match="predates a full centroid"):
        compact_ivf_store(spark, str(sf), old_min=8, new_min=40)


def test_lsh_and_span_compaction_fold_and_match_scratch(spark, tmp_path):
    """The dedup-family folds (VERDICT r6 item 5 generalized): the
    compacted LSH band index and span digest set must equal from-scratch
    builds of the same boundary, be reused by later *_index_dir calls,
    retire the old boundary, and leave both incremental dedup ops exact
    afterwards (vs the streaming keep-first SQL for spans; candidate ⊆
    exact pair graph + touches-increment for minhash)."""
    import duckdb

    from kstore_spark.functions.dedup import (
        _shingle_arrays, _span_positions, _tokens, band_hashes,
        compact_lsh_index, compact_span_index, dedup_minhash_incremental,
        dedup_substring_incremental, lsh_index_dir, minhash_signatures,
        span_index_dir)
    from kstore_spark.streaming.dedup import _stream_dedup_spans_sql
    from pyspark.sql import functions as F

    sf = tmp_path / "sf"
    # 20-token docs: long enough for 3-gram shingles AND width-5 spans
    _mk_corpus(sf / "documents.parquet", doc_len=20)
    src = str(sf / "documents.parquet")

    # --- LSH fold ---
    lsh_index_dir(spark, str(sf), 40)
    folded = compact_lsh_index(spark, str(sf), 40, 48)
    got = sorted((r["doc_id"], int(r["band"]), r["bh"])
                 for r in spark.read.parquet(folded).collect())
    scratch = (
        minhash_signatures(
            _shingle_arrays(spark, str(sf)).filter(F.col("doc_id") < 48))
        .select("doc_id", F.posexplode(band_hashes()).alias("band", "bh")))
    want = sorted((r["doc_id"], int(r["band"]), r["bh"])
                  for r in scratch.collect())
    assert got == want and got
    assert lsh_index_dir(spark, str(sf), 48) == folded
    reg = ArtifactStore()._load()
    assert f"lsh:{src}:d40" not in reg["artifacts"]
    pairs = dedup_minhash_incremental(spark, str(sf), new_min=48).collect()
    assert all(max(r["doc_a"], r["doc_b"]) >= 48 for r in pairs)

    # --- span fold (width=5 so 20-token docs carry spans) ---
    span_index_dir(spark, str(sf), 40, width=5)
    sfolded = compact_span_index(spark, str(sf), 40, 48, width=5)
    sgot = sorted(r["h"] for r in spark.read.parquet(sfolded).collect())
    swant = sorted(
        r["h"] for r in _span_positions(
            _tokens(spark, str(sf)).filter(F.col("doc_id") < 48), 5)
        .select("h").distinct().collect())
    assert sgot == swant and sgot
    assert span_index_dir(spark, str(sf), 48, width=5) == sfolded
    reg = ArtifactStore()._load()
    assert f"span:{src}:w5:d40" not in reg["artifacts"]

    cuts = sorted(
        tuple(r) for r in dedup_substring_incremental(
            spark, str(sf), new_min=48, width=5).collect())
    con = duckdb.connect()
    con.execute("CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{src}/*.parquet')")
    exp = sorted(tuple(r) for r in con.execute(
        f"SELECT * FROM ({_stream_dedup_spans_sql(width=5)}) "
        "WHERE doc_id >= 48").fetchall())
    assert cuts == exp


def test_negation_prohibited_clause_bites(spark):
    """text_search_negation: the prohibited clause must EXCLUDE real
    docs (result strictly smaller than the positive conjunction) while
    keeping real survivors (nonempty) — empty==empty or all==all would
    be vacuous evidence. Also re-derives the exclusion from the raw
    text: no surviving doc contains a prohibited term."""
    from pyspark.sql import functions as F

    from kstore_spark.functions.text import (
        NEG_NEG_TERMS, NEG_POS_TERMS, text_search_negation)
    from kstore_spark.tables import table

    sf = "/root/testdata/sf0.001"
    got = {r["doc_id"] for r in text_search_negation(spark, sf).collect()}
    docs = table(spark, sf, "documents").select(
        "doc_id", F.split("text", " ").alias("t"))
    conj = docs
    for t in NEG_POS_TERMS:
        conj = conj.filter(F.array_contains("t", t))
    conj_ids = {r["doc_id"] for r in conj.select("doc_id").collect()}
    assert got and got < conj_ids, "prohibited clause did not bite"
    bad = docs.filter(F.col("doc_id").isin(list(got)))
    for t in NEG_NEG_TERMS:
        assert bad.filter(F.array_contains("t", t)).count() == 0


def test_vocab_index_layout_and_prefix_resolution(spark):
    """vocab_index_dir: the sidecar is physically partitioned by the
    2-char prefix (a 'jo*' probe lists ONE partition directory), and
    text_search_prefix's resolved term set equals the LIKE-scan
    vocabulary — the resolution-equivalence half its oracle identity
    rests on."""
    import os

    from pyspark.sql import functions as F

    from kstore_spark.functions.text import (
        PREFIX_QUERY, text_search_prefix, vocab_index_dir)
    from kstore_spark.tables import table

    sf = "/root/testdata/sf0.001"
    vdir = vocab_index_dir(spark, sf)
    parts = [p for p in os.listdir(vdir) if p.startswith("p=")]
    assert len(parts) > 1, "sidecar not prefix-partitioned"
    assert f"p={PREFIX_QUERY}" in parts
    got = text_search_prefix(spark, sf)
    assert got.count() > 0
    # resolved vocabulary == the scan's LIKE set
    vocab = {r["tok"] for r in spark.read.parquet(vdir)
             .filter(F.col("tok").startswith(PREFIX_QUERY))
             .select("tok").collect()}
    scan = {r["tok"] for r in table(spark, sf, "documents")
            .select(F.explode(F.split("text", " ")).alias("tok"))
            .filter(F.col("tok").startswith(PREFIX_QUERY))
            .distinct().collect()}
    assert vocab == scan and vocab
