"""Multimodal binary plumbing: the mapInPandas paths must be
deterministic, schema-stable, and consistent with JVM-side byte math."""

from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.001"


def test_features_match_jvm_byte_math(spark):
    """Python-side checksum (numpy over decoded bytes) must equal a pure
    JVM computation over the same payloads — pins the Arrow round-trip."""
    from kstore_spark.functions.multimodal import binary_payloads, extract_features

    feats = extract_features(binary_payloads(spark, SF_DIR))
    jvm = binary_payloads(spark, SF_DIR).select(
        "doc_id",
        F.aggregate(
            # payload bytes as ints via substring-per-position would be
            # O(n²); unbase64/encode tricks aside, ascii text means
            # char codepoints == bytes
            F.transform(F.split(F.decode("payload", "UTF-8"), ""), F.ascii),
            F.lit(0).cast("long"),
            lambda a, x: a + x,
        ).alias("jvm_sum"),
    )
    j = feats.join(jvm, "doc_id")
    bad = j.filter((F.col("checksum") != F.col("jvm_sum") % (2**31))).count()
    assert bad == 0
    row = feats.first()
    assert len(row["histogram"]) == 16
    assert sum(row["histogram"]) == row["byte_len"]


def test_resize_fixed_shape(spark):
    from kstore_spark.functions.multimodal import binary_payloads, resize_images

    out = resize_images(binary_payloads(spark, SF_DIR), width=8, height=8)
    rows = out.collect()
    assert all(len(r["pixels"]) == 64 for r in rows)
    assert len(rows) == binary_payloads(spark, SF_DIR).count()
    # determinism across runs
    again = {r["doc_id"]: r["pixels"] for r in
             resize_images(binary_payloads(spark, SF_DIR), 8, 8).collect()}
    assert all(again[r["doc_id"]] == r["pixels"] for r in rows)


def test_frame_sampling_fanout(spark):
    from kstore_spark.functions.multimodal import binary_payloads, sample_frames

    src = binary_payloads(spark, SF_DIR)
    frames = sample_frames(src, frame_bytes=64, every_n=4)
    per_doc = frames.groupBy("doc_id").count().collect()
    sizes = {r["doc_id"]: r["n_bytes"] for r in
             src.select("doc_id", "meta.n_bytes").collect()}
    for r in per_doc:
        expected = (max(sizes[r["doc_id"]] // 64, 0) + 3) // 4
        assert r["count"] == expected
    assert frames.filter(F.length("frame") > 64).count() == 0


def test_audio_windows_fanout_and_features(spark):
    """Window count must follow (n - win)//hop + 1; RMS/zero-cross must
    match an independent per-doc numpy recomputation (pins strides)."""
    import numpy as np

    from kstore_spark.functions.multimodal import audio_windows, binary_payloads

    src = binary_payloads(spark, SF_DIR)
    win, hop = 256, 128
    out = audio_windows(src, win=win, hop=hop)
    got = {(r["doc_id"], r["window_idx"]): (r["rms"], r["zero_cross"])
           for r in out.collect()}
    payloads = {r["doc_id"]: bytes(r["payload"]) for r in src.limit(5).collect()}
    for doc_id, payload in payloads.items():
        s = np.frombuffer(payload, dtype=np.uint8).astype("float64") - 128.0
        n_win = max((s.size - win) // hop + 1, 0)
        assert sum(1 for k in got if k[0] == doc_id) == n_win
        for i in range(n_win):
            w = s[i * hop: i * hop + win]
            rms, zc = got[(doc_id, i)]
            assert abs(rms - np.sqrt((w * w).mean())) < 1e-9
            assert zc == (np.diff(np.signbit(w)) != 0).sum()


def test_metadata_extraction_schema_and_determinism(spark):
    from kstore_spark.functions.multimodal import binary_payloads, extract_metadata

    src = binary_payloads(spark, SF_DIR)
    out = extract_metadata(src)
    rows = out.collect()
    assert len(rows) == src.count()
    for r in rows[:10]:
        m = r["meta"]
        assert set(m) == {"width", "height", "codec", "n_bytes"}
        assert m["codec"] in ("raw", "rle", "lz")
        assert int(m["width"]) >= 160 and int(m["height"]) >= 120
    again = {r["doc_id"]: r["meta"] for r in extract_metadata(src).collect()}
    assert all(again[r["doc_id"]] == r["meta"] for r in rows)


def test_media_neardup_planted_payloads(spark):
    """Synthetic payload frame: exact dup + light perturbation must pair,
    unrelated payloads must not — precision is exact by construction
    (cosine verify), recall pinned at 1.0 on the planted set."""
    import random

    from kstore_spark.functions.multimodal import (
        media_embeddings, MEDIA_BANDS, MEDIA_NEARDUP_COS, MEDIA_ROWS)
    from kstore_spark.functions.similarity import neardup_lsh_pairs

    rng = random.Random(7)
    vocabs = [[f"w{v}_{i}" for i in range(30)] for v in range(4)]

    def doc(vocab):
        return " ".join(rng.choice(vocab) for _ in range(120))

    base = [doc(vocabs[i % 4]) for i in range(20)]
    texts = list(base)
    texts.append(base[3])                      # 20: exact dup of 3
    perturbed = base[7].split()
    perturbed[5] = "XYZ"
    texts.append(" ".join(perturbed))          # 21: near dup of 7
    rows = [(i, bytearray(t, "utf-8")) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")

    got = {
        (r["vec_a"], r["vec_b"])
        for r in neardup_lsh_pairs(
            media_embeddings(df), MEDIA_NEARDUP_COS,
            bands=MEDIA_BANDS, rows=MEDIA_ROWS).collect()
    }
    assert got == {(3, 20), (7, 21)}


def test_multimodal_neardup_matches_bruteforce(spark):
    """Over the corpus payloads: LSH output must equal exact brute-force
    cosine pairs over the same derived vectors (verification makes
    precision exact; the 16x48 bands make recall 1.0 at this gap)."""
    import itertools

    import numpy as np

    from kstore_spark.functions.multimodal import (
        binary_payloads, media_embeddings, MEDIA_NEARDUP_COS,
        multimodal_neardup)

    vecs = {
        r["vec_id"]: np.array(r["v"])
        for r in media_embeddings(binary_payloads(spark, SF_DIR)).collect()
    }
    truth = {
        (a, b)
        for a, b in itertools.combinations(sorted(vecs), 2)
        if float(vecs[a] @ vecs[b]) > MEDIA_NEARDUP_COS
    }
    assert truth  # the corpus plants near-dups — never a vacuous check
    got = {(r["vec_a"], r["vec_b"])
           for r in multimodal_neardup(spark, SF_DIR).collect()}
    assert got == truth
