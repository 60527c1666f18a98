"""BPE training differential: the Spark vocab-sized training loop
(functions/bpe.py) vs a pure-Python reference BPE (Sennrich-style,
same (count DESC, pair ASC) tie-break) on the testdata corpus and on
random fuzz corpora — merges, encoded lengths, and the oracled
round-0 pair table."""

import random

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

SF_DIR = "/root/testdata/sf0.001"


def py_bpe(word_freqs, n_merges):
    """Reference BPE: dict of word→freq, greedy left-to-right merge
    application, ties (count DESC, a ASC, b ASC)."""
    syms = {w: list(w) for w in word_freqs}
    merges = []
    for r in range(1, n_merges + 1):
        counts = {}
        for w, f in word_freqs.items():
            s = syms[w]
            for i in range(len(s) - 1):
                counts[(s[i], s[i + 1])] = counts.get((s[i], s[i + 1]), 0) + f
        if not counts:
            break
        (a, b), n = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((r, a, b, n))
        for w, s in syms.items():
            out, pend = [], None
            for c in s:
                if pend == a and c == b:
                    out.append(a + b)
                    pend = None
                else:
                    if pend is not None:
                        out.append(pend)
                    pend = c
            if pend is not None:
                out.append(pend)
            syms[w] = out
    return merges, syms


def _word_freqs_py(texts):
    wf = {}
    for t in texts:
        for w in t.split(" "):
            wf[w] = wf.get(w, 0) + 1
    return wf


def _texts(spark, sf_dir):
    from kstore_spark.tables import table

    return [(r["doc_id"], r["text"])
            for r in table(spark, sf_dir, "documents")
            .select("doc_id", "text").collect()]


def _check_corpus(spark, sf_dir, n_merges=8):
    from kstore_spark.functions.bpe import bpe_learn_merges, bpe_token_counts

    docs = _texts(spark, sf_dir)
    wf = _word_freqs_py(t for _, t in docs)
    exp_merges, exp_syms = py_bpe(wf, n_merges)

    got = [(r["merge_rank"], r["sym_a"], r["sym_b"], r["n"])
           for r in bpe_learn_merges(spark, sf_dir, n_merges).collect()]
    assert got == exp_merges

    exp_counts = {
        d: sum(len(exp_syms[w]) for w in t.split(" ")) for d, t in docs}
    got_counts = {r["doc_id"]: r["n_bpe_tokens"]
                  for r in bpe_token_counts(spark, sf_dir, n_merges).collect()}
    assert got_counts == exp_counts
    # compression invariants: words <= bpe tokens <= characters-in-words
    for d, t in docs:
        words = t.split(" ")
        assert len(words) <= got_counts[d] <= sum(len(w) for w in words)


def test_bpe_matches_python_reference_testdata(spark):
    _check_corpus(spark, SF_DIR)


def test_bpe_pair_counts_matches_oracle(spark):
    from kstore_spark.functions.bpe import BPE_PAIR_COUNTS_SQL, bpe_pair_counts

    con = duckdb.connect()
    con.execute("CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{SF_DIR}/documents.parquet')")
    rows = sorted(tuple(r) for r in bpe_pair_counts(spark, SF_DIR).collect())
    orc = sorted(tuple(r) for r in con.execute(BPE_PAIR_COUNTS_SQL).fetchall())
    assert rows == orc
    # round-0 argmax IS the first learned merge
    from kstore_spark.functions.bpe import bpe_learn_merges

    first = bpe_learn_merges(spark, SF_DIR, 1).collect()[0]
    top = min(rows)  # rank 1
    assert top[1] == first["sym_a"] + first["sym_b"] and top[2] == first["n"]


@pytest.mark.parametrize("seed", [11, 47])
def test_bpe_fuzz_corpora(spark, tmp_path, seed):
    """Random corpora: short alphabet → heavy pair collisions and
    multi-char merge chains; 1-char and empty words exercise the
    no-pair edges; duplicated docs weight the frequency table."""
    rng = random.Random(seed)
    alpha = "abcde"
    words = ["".join(rng.choice(alpha) for _ in range(rng.randint(1, 6)))
             for _ in range(60)] + [""]
    texts = [" ".join(rng.choice(words) for _ in range(rng.randint(1, 30)))
             for _ in range(150)]
    texts += texts[:20]  # planted duplicates
    d = tmp_path / f"bpe{seed}"
    d.mkdir()
    pq.write_table(
        pa.table({
            "doc_id": list(range(len(texts))), "text": texts,
            "lang": ["en"] * len(texts), "source": ["s"] * len(texts),
            "n_chars": [len(t) for t in texts],
        }),
        str(d / "documents.parquet"),
    )
    _check_corpus(spark, str(d), n_merges=6)
