"""Curation operators: decontamination, quality signals, PII, chunking,
stratified sampling, random projection — verified against pure-Python
reimplementations on small synthetic corpora plus the real testdata."""

from __future__ import annotations

import hashlib
import math

import pytest
from pyspark.sql import functions as F

from qdrant_spark.operators.curation import (
    chunk_documents,
    decontaminate,
    fraction_threshold,
    gopher_quality,
    pii_counts,
    pii_redact,
    project_embeddings,
    random_sign_matrix,
    stratified_quota,
    stratified_sample,
)


@pytest.fixture(scope="module")
def toy_docs(spark):
    rows = [
        (0, "the cat sat on the mat the cat sat again", "en"),
        (1, "alpha beta gamma delta epsilon zeta eta theta", "en"),
        (2, "one two three\none two three\nfour five six", "fr"),
        (3, "reach me at bob@example.com or +1 555 867 5309 ok", "en"),
        (4, "server at 10.0.0.1 and 192.168.1.254 responded", "fr"),
        (5, "x", "de"),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text", "lang"])


def test_decontaminate_flags_shared_ngrams(spark, toy_docs):
    bench = spark.createDataFrame(
        [(100, "the cat sat somewhere else entirely")], ["doc_id", "text"]
    )
    out = {
        r.doc_id: (r.contaminated_grams, r.contaminated)
        for r in decontaminate(toy_docs, bench, n=3).collect()
    }
    # "the cat sat" appears in doc 0 and the benchmark
    assert out[0] == (1, True)
    assert all(out[d] == (0, False) for d in (1, 2, 3, 4, 5))


def test_decontaminate_hash_matches_plain(spark, toy_docs):
    bench = toy_docs.where("doc_id = 1").select("doc_id", "text")
    train = toy_docs.where("doc_id <> 1")
    a = decontaminate(train, bench, n=2, hash_grams=True).collect()
    b = decontaminate(train, bench, n=2, hash_grams=False).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_gopher_quality_metrics(spark, toy_docs):
    out = {r.doc_id: r for r in gopher_quality(toy_docs).collect()}
    r0 = out[0]
    # "the cat sat on the mat the cat sat again": 10 words, 6 distinct
    assert r0.n_words == 10
    assert r0.dup_word_frac == pytest.approx(1 - 6 / 10, abs=1e-6)
    assert r0.stopword_count == 3  # the x3
    # top 2-gram "the cat" occurs twice ("cat sat" too; tie -> lexicographic
    # smallest is "cat sat") => 2 * len("cat sat") / len(text)
    text0 = "the cat sat on the mat the cat sat again"
    assert r0.top_2gram_char_frac == pytest.approx(
        round(2 * len("cat sat") / len(text0), 6), abs=1e-6
    )
    # doc 2 has 3 lines, one duplicated => dup_line_frac = 1/3
    assert out[2].dup_line_frac == pytest.approx(1 / 3, abs=1e-6)
    assert out[1].dup_word_frac == 0.0
    assert out[5].n_words == 1 and out[5].mean_word_len == 1.0


def test_gopher_quality_keep_passthrough(spark, toy_docs):
    # keep= carries source columns through unchanged and leaves the
    # signal columns identical to the default output (the one-pass
    # filter-then-chunk composition in bench relies on both).
    base = {r.doc_id: r for r in gopher_quality(toy_docs).collect()}
    kept = {r.doc_id: r
            for r in gopher_quality(toy_docs, keep=["text", "lang"])
            .collect()}
    src = {r.doc_id: r for r in toy_docs.collect()}
    assert set(kept) == set(base)
    for did, row in kept.items():
        assert row.text == src[did].text
        assert row.lang == src[did].lang
        for c in base[did].asDict():
            assert getattr(row, c) == getattr(base[did], c), c
    # keep= listing id/text a second time must not duplicate columns
    dup = gopher_quality(toy_docs, keep=["doc_id", "text"])
    assert dup.columns.count("doc_id") == 1
    assert dup.columns.count("text") == 1


def _py_repetition(text, top_ns=(2, 3, 4), dup_ns=(5, 10)):
    """Pure-Python reimplementation of repetition_signals (same
    occurrence-count definitions, capped at 1.0)."""
    import re
    from collections import Counter

    def grams(ws, n):
        if len(ws) < n:
            return []
        return [" ".join(ws[i:i + n]) for i in range(len(ws) - n + 1)]

    tlen = len(text)

    def frac(c):
        return round(min(c / tlen, 1.0), 6) if tlen > 0 else 0.0

    out = {}
    lc = Counter(text.split("\n"))
    out["dup_line_char_frac"] = frac(
        sum(c * len(v) for v, c in lc.items() if c > 1))
    ws = re.split(r"\s+", text.strip())
    for n in top_ns:
        gc = Counter(grams(ws, n))
        if gc:
            cnt, gram = sorted(((-c, g) for g, c in gc.items()))[0]
            out[f"top_{n}gram_char_frac"] = frac(-cnt * len(gram))
        else:
            out[f"top_{n}gram_char_frac"] = 0.0
    for n in dup_ns:
        gc = Counter(grams(ws, n))
        out[f"dup_{n}gram_char_frac"] = frac(
            sum(c * len(v) for v, c in gc.items() if c > 1))
    return out


def test_repetition_signals_vs_python(spark):
    from qdrant_spark.operators.curation import repetition_signals

    texts = [
        "the cat sat on the mat the cat sat on the rug",
        "a a a a a a a a",                      # overlap-capped fractions
        "hello world\nhello world\nunique line",
        "",                                      # empty doc -> all zeros
        "one two",                               # below every gram width
        "x",
        "repeat this phrase again repeat this phrase again "
        "repeat this phrase again and more words here to pad",
        "line1\nline1\nline1\nline2",
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], ["doc_id", "text"])
    got = {r["doc_id"]: r.asDict() for r in repetition_signals(df).collect()}
    for i, t in enumerate(texts):
        exp = _py_repetition(t)
        for k, v in exp.items():
            assert got[i][k] == pytest.approx(v, abs=1e-9), (i, k, t)


def test_repetition_signals_dup10_detects_long_repeats(spark):
    from qdrant_spark.operators.curation import repetition_signals

    block = "alpha bravo charlie delta echo foxtrot golf hotel india juliet"
    df = spark.createDataFrame(
        [(0, f"{block} {block}"), (1, block)], ["doc_id", "text"])
    out = {r.doc_id: r for r in repetition_signals(df).collect()}
    assert out[0].dup_10gram_char_frac > 0.9   # repeated 10-word block
    assert out[1].dup_10gram_char_frac == 0.0  # single occurrence


def test_pii_counts_and_redact(spark, toy_docs):
    out = {r.doc_id: r for r in pii_counts(toy_docs).collect()}
    assert out[3].n_email == 1 and out[3].n_phone == 1
    assert out[4].n_ipv4 == 2
    assert out[0].n_pii == 0
    red = {r.doc_id: r.text for r in pii_redact(toy_docs).collect()}
    assert "[PII:email]" in red[3] and "bob@example.com" not in red[3]
    assert red[4].count("[PII:ipv4]") == 2


def test_pii_phone_pattern(spark):
    df = spark.createDataFrame(
        [(0, "call +44 207 946 0958 now"), (1, "digits 12345678901 alone")],
        ["doc_id", "text"],
    )
    out = {r.doc_id: r.n_phone for r in pii_counts(df).collect()}
    assert out[0] == 1 and out[1] == 0


@pytest.mark.parametrize("size,overlap", [(3, 0), (4, 2), (5, 1)])
def test_chunk_documents_matches_python(spark, toy_docs, size, overlap):
    rows = toy_docs.select("doc_id", "text").collect()
    expect = []
    step = size - overlap
    for r in rows:
        words = r.text.split()
        n = len(words)
        n_chunks = max(1, math.ceil(max(0, n - overlap) / step))
        for k in range(n_chunks):
            w = words[k * step : k * step + size]
            expect.append((r.doc_id, k, " ".join(w), len(w)))
    got = [
        (r.doc_id, r.chunk_idx, r.chunk_text, r.n_tokens)
        for r in chunk_documents(toy_docs, size=size, overlap=overlap).collect()
    ]
    assert sorted(got) == sorted(expect)


def test_chunk_overlap_tokens_shared(spark, toy_docs):
    out = (
        chunk_documents(toy_docs.where("doc_id = 0"), size=4, overlap=2)
        .orderBy("chunk_idx")
        .collect()
    )
    for a, b in zip(out, out[1:]):
        assert a.chunk_text.split()[-2:] == b.chunk_text.split()[:2]


def _py_bucket(doc_id, salt):
    return hashlib.md5(f"{doc_id}:{salt}".encode()).hexdigest()[:8]


def test_stratified_sample_deterministic(spark, documents):
    fr = {"en": 0.5, "fr": 0.25}
    out = stratified_sample(
        documents, "lang", fr, id_col="doc_id", default_fraction=0.1
    )
    got = {(r.doc_id, r.lang) for r in out.select("doc_id", "lang").collect()}
    for r in documents.select("doc_id", "lang").collect():
        t = fraction_threshold(fr.get(r.lang, 0.1))
        assert ((r.doc_id, r.lang) in got) == (_py_bucket(r.doc_id, "strata") < t)
    # repeatable
    again = {(r.doc_id, r.lang) for r in out.select("doc_id", "lang").collect()}
    assert got == again


def test_stratified_quota_exact_counts(spark, documents):
    out = stratified_quota(documents, "lang", quota=7, id_col="doc_id")
    sizes = {r.lang: r.n for r in out.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    avail = {r.lang: r.n for r in documents.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    for lang, n in sizes.items():
        assert n == min(7, avail[lang])
    # deterministic choice: lowest hash buckets win
    chosen = {r.doc_id for r in out.where("lang = 'en'").collect()}
    ranked = sorted(
        (r.doc_id for r in documents.where("lang = 'en'").collect()),
        key=lambda d: (_py_bucket(d, "strata"), d),
    )[:7]
    assert chosen == set(ranked)


def test_random_sign_matrix_deterministic():
    a = random_sign_matrix(8, 4, seed=7)
    b = random_sign_matrix(8, 4, seed=7)
    c = random_sign_matrix(8, 4, seed=8)
    assert a == b and a != c
    assert all(v in (-1, 1) for row in a for v in row)


def test_project_embeddings_matches_numpy(spark, embeddings):
    import numpy as np

    signs = random_sign_matrix(64, 4, seed=1)
    out = project_embeddings(embeddings.limit(50), signs).collect()
    rows = embeddings.limit(50).collect()
    mat = np.array(signs, dtype=float) / math.sqrt(4)
    by_id = {r.vec_id: np.array(r.embedding, dtype=float) for r in rows}
    for r in out:
        want = mat @ by_id[r.vec_id]
        got = np.array([r.p0, r.p1, r.p2, r.p3])
        assert np.allclose(got, np.round(want, 6), atol=2e-6)


def test_project_preserves_distance_in_expectation(spark, embeddings):
    """JL sanity: with out_dim=32 the squared-distance ratio proj/true has
    mean ~1 and bounded distortion (std ~ sqrt(2/k) = 0.25). Correlation is
    not meaningful here: random high-dim vectors concentrate all pairwise
    distances near one value."""
    import numpy as np

    signs = random_sign_matrix(64, 32, seed=3)
    rows = embeddings.limit(30).collect()
    out = {r.vec_id: r for r in project_embeddings(embeddings.limit(30), signs).collect()}
    true_d, proj_d = [], []
    vecs = {r.vec_id: np.array(r.embedding, dtype=float) for r in rows}
    ids = sorted(vecs)
    proj = {
        v: np.array([out[v][f"p{k}"] for k in range(32)]) for v in ids
    }
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            true_d.append(float(np.linalg.norm(vecs[a] - vecs[b])))
            proj_d.append(float(np.linalg.norm(proj[a] - proj[b])))
    ratio = (np.array(proj_d) / np.array(true_d)) ** 2
    assert abs(ratio.mean() - 1.0) < 0.1
    assert ratio.min() > 0.3 and ratio.max() < 2.5


def test_ngram_counts_matches_python(spark, toy_docs):
    from collections import Counter

    from qdrant_spark.operators.curation import ngram_counts

    got = {r.gram: r.cnt for r in ngram_counts(toy_docs, n=2).collect()}
    want = Counter()
    for r in toy_docs.select("text").collect():
        w = r.text.split()
        for i in range(len(w) - 1):
            want[" ".join(w[i:i + 2])] += 1
    assert got == dict(want)
    floor = {r.gram: r.cnt
             for r in ngram_counts(toy_docs, n=2, min_count=2).collect()}
    assert floor == {g: c for g, c in want.items() if c >= 2}


def test_weighted_sample_deterministic(spark, documents):
    from pyspark.sql import functions as F

    from qdrant_spark.operators.curation import weighted_sample

    p = F.least(F.lit(1.0), F.col("n_chars") / F.lit(600.0))
    out = weighted_sample(documents.withColumn("__p", p), "__p",
                          id_col="doc_id")
    got = {r.doc_id for r in out.select("doc_id").collect()}
    for r in documents.select("doc_id", "n_chars").collect():
        bucket = int(_py_bucket(r.doc_id, "weighted"), 16) / 2**32
        keep = bucket < min(1.0, r.n_chars / 600.0)
        assert (r.doc_id in got) == keep
    # monotone: raising every probability only adds rows
    p2 = F.least(F.lit(1.0), F.col("n_chars") / F.lit(300.0))
    got2 = {r.doc_id for r in weighted_sample(
        documents.withColumn("__p", p2), "__p", id_col="doc_id"
    ).select("doc_id").collect()}
    assert got <= got2


def test_lm_score_hand_computed(spark):
    import math as m

    from qdrant_spark.operators.curation import lm_score

    # corpus: "a a b" + "a c" -> counts a=3, b=1, c=1, total=5
    df = spark.createDataFrame(
        [(0, "a a b"), (1, "a c"), (2, "")], ["doc_id", "text"])
    # vocab_size=2 keeps {a, b} (count desc, token asc tiebreak b < c);
    # c is OOV. alpha=1, denom = total + 1*(V+1) = 5 + 3 = 8
    out = {r.doc_id: r for r in
           lm_score(df, vocab_size=2, alpha=1.0).collect()}
    lp_a, lp_b, lp_oov = m.log(4 / 8), m.log(2 / 8), m.log(1 / 8)
    assert out[0].n_tokens == 3 and out[0].oov_frac == 0.0
    assert out[0].avg_logprob == pytest.approx(
        round((2 * lp_a + lp_b) / 3, 6), abs=1e-9)
    assert out[1].n_tokens == 2
    assert out[1].oov_frac == pytest.approx(0.5, abs=1e-9)
    assert out[1].avg_logprob == pytest.approx(
        round((lp_a + lp_oov) / 2, 6), abs=1e-9)
    # empty doc survives with zeros
    assert out[2].n_tokens == 0 and out[2].avg_logprob == 0.0


def test_lm_score_external_reference_corpus(spark):
    from qdrant_spark.operators.curation import lm_score

    ref = spark.createDataFrame(
        [(0, "clean clean text text text")], ["doc_id", "text"])
    tgt = spark.createDataFrame(
        [(0, "clean text"), (1, "junk junk junk")], ["doc_id", "text"])
    out = {r.doc_id: r for r in
           lm_score(tgt, lm_docs=ref, vocab_size=10).collect()}
    # in-vocab doc scores higher than the all-OOV doc
    assert out[0].avg_logprob > out[1].avg_logprob
    assert out[1].oov_frac == 1.0


def test_mixture_sample_hits_target_proportions(spark):
    from qdrant_spark.operators.curation import mixture_sample

    rows = [(i, "a" if i < 800 else ("b" if i < 900 else "c"))
            for i in range(1000)]
    df = spark.createDataFrame(rows, ["doc_id", "grp"])
    w = {"a": 0.5, "b": 0.3, "c": 0.2}
    out = mixture_sample(df, "grp", w, id_col="doc_id").groupBy("grp").count()
    got = {r.grp: r["count"] for r in out.collect()}
    # binding stratum: b (100/0.3=333) -> T=333; expect a~167, b=100, c~67
    assert got["b"] == pytest.approx(100, abs=2)      # taken ~whole
    assert got["a"] == pytest.approx(167, rel=0.25)   # Bernoulli noise
    assert got["c"] == pytest.approx(67, rel=0.3)
    # realized mixture ~ targets
    tot = sum(got.values())
    assert got["a"] / tot == pytest.approx(0.5, abs=0.08)


def test_mixture_sample_total_cap_and_determinism(spark):
    from qdrant_spark.operators.curation import mixture_sample

    rows = [(i, "a" if i % 2 == 0 else "b") for i in range(1000)]
    df = spark.createDataFrame(rows, ["doc_id", "grp"])
    w = {"a": 0.5, "b": 0.5}
    capped = mixture_sample(df, "grp", w, total=200, id_col="doc_id")
    n = capped.count()
    assert n == pytest.approx(200, rel=0.2)
    a = sorted(r.doc_id for r in capped.collect())
    b = sorted(r.doc_id for r in
               mixture_sample(df, "grp", w, total=200, id_col="doc_id").collect())
    assert a == b
    # strata not in weights are dropped
    w2 = {"a": 1.0}
    only_a = mixture_sample(df, "grp", w2, id_col="doc_id")
    assert only_a.where("grp = 'b'").count() == 0


def test_corpus_stats_percentiles_match_numpy(spark):
    import numpy as np

    from qdrant_spark.operators.curation import corpus_stats

    vals = [3, 1, 4, 1, 5, 9, 2, 6]
    rows = [(i, "en", v, f"s{i % 2}") for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, ["doc_id", "lang", "n_chars", "source"])
    r = corpus_stats(df).collect()[0]
    assert r.n_docs == 8 and r.sum_n_chars == sum(vals) and r.n_source == 2
    assert r.p50_n_chars == pytest.approx(
        round(float(np.percentile(vals, 50)), 6), abs=1e-9)
    assert r.p90_n_chars == pytest.approx(
        round(float(np.percentile(vals, 90)), 6), abs=1e-9)


def test_c4_line_filter_rules(spark):
    from qdrant_spark.operators.curation import c4_line_filter

    text = "\n".join([
        "This line has enough words and ends properly.",   # kept
        "Too short.",                                      # < 3 words
        "This line has no terminal punctuation at all",    # no punct
        "Enable javascript to view this page properly.",   # blocklist
        'A quoted ending also counts as terminal."',       # kept
        "Careful with {curly} brace template lines here.", # blocklist {
    ])
    df = spark.createDataFrame([(0, text), (1, "word")], ["doc_id", "text"])
    out = {r.doc_id: r for r in
           c4_line_filter(df, min_words_per_line=3, min_lines=2).collect()}
    r = out[0]
    assert r.n_lines == 6 and r.n_kept == 2 and not r.dropped
    assert r.text_clean.split("\n") == [
        "This line has enough words and ends properly.",
        'A quoted ending also counts as terminal."',
    ]
    # single unpunctuated word: everything filtered, doc flagged dropped
    assert out[1].n_kept == 0 and out[1].dropped and out[1].text_clean == ""


def test_lm_buckets_tercile_split(documents):
    """head/middle/tail by exact terciles of avg_logprob: every head score
    >= every middle score >= every tail score, buckets roughly n/3, and
    the scored columns agree with lm_score itself."""
    from qdrant_spark.operators.curation import lm_buckets, lm_score

    docs = documents.limit(120)
    out = lm_buckets(docs, vocab_size=300).collect()
    n = len(out)
    assert n == docs.count()
    by = {}
    for r in out:
        by.setdefault(r["bucket"], []).append(r["avg_logprob"])
    assert set(by) == {"head", "middle", "tail"}
    assert min(by["head"]) >= max(by["middle"]) >= min(by["middle"])
    assert min(by["middle"]) >= max(by["tail"])
    # tercile cuts: each bucket within ~n/3 +- interpolation slack
    for b in ("head", "middle", "tail"):
        assert abs(len(by[b]) - n / 3) <= max(4, n * 0.1), (b, len(by[b]))
    scored = {r["doc_id"]: r for r in
              lm_score(docs, vocab_size=300).collect()}
    for r in out:
        assert r["avg_logprob"] == scored[r["doc_id"]]["avg_logprob"]


def test_pack_sequences_invariants(spark, documents):
    """Within each group, tok_start is the exact running token total in
    id order, and seq indices are the floor-divisions of the stream."""
    from qdrant_spark.operators.curation import pack_sequences

    docs = documents.limit(60)
    L = 128
    out = pack_sequences(docs, L, n_groups=4).collect()
    assert len(out) == docs.count()
    groups = {}
    for r in sorted(out, key=lambda r: (r["group"], r["doc_id"])):
        groups.setdefault(r["group"], []).append(r)
    assert len(groups) > 1  # hash-grouping actually spreads
    for g, rows in groups.items():
        cum = 0
        for r in rows:
            assert r["tok_start"] == cum
            assert r["start_seq"] == cum // L
            assert r["end_seq"] == (cum + max(r["n_tokens"] - 1, 0)) // L
            assert r["end_seq"] >= r["start_seq"]
            cum += r["n_tokens"]

    # caller-supplied token counts (e.g. BPE lengths)
    from pyspark.sql import functions as F

    pre = docs.withColumn("bpe_len", F.length("text") / 4)
    out2 = pack_sequences(pre, L, n_tokens_col="bpe_len", n_groups=2).collect()
    assert all(r["n_tokens"] == int(len_ // 1) for r, len_ in
               zip(sorted(out2, key=lambda r: r["doc_id"]),
                   [int(x["bpe_len"]) for x in
                    pre.select("doc_id", "bpe_len")
                       .orderBy("doc_id").collect()]))

    import pytest as _pytest
    with _pytest.raises(ValueError):
        pack_sequences(docs, 0)


def test_dsir_weights_hand_computed(spark):
    """Importance log-ratio matches a pure-python mirror of the hashed
    bigram models, and ranks the target-like doc above the off-target."""
    import hashlib
    import math as m

    from qdrant_spark.operators.curation import dsir_weights

    raw = [(0, "apple banana apple"), (1, "xylo zumba"), (2, "")]
    tgt = [(10, "apple banana")]
    docs = spark.createDataFrame(raw, ["doc_id", "text"])
    target = spark.createDataFrame(tgt, ["doc_id", "text"])
    B, alpha = 50, 1.0

    def feats(text):
        w = [t for t in text.lower().strip().split() if t]
        grams = w + [" ".join(w[i:i + 2]) for i in range(len(w) - 1)]
        return [int(hashlib.md5(g.encode()).hexdigest()[:15], 16) % B
                for g in grams]

    def model(texts):
        cnt = {}
        for t in texts:
            for b in feats(t):
                cnt[b] = cnt.get(b, 0) + 1
        tot = sum(cnt.values())
        return cnt, tot + alpha * B

    ct, dt = model([t for _, t in tgt])
    cr, dr = model([t for _, t in raw])
    want = {}
    for i, t in raw:
        d = sum(m.log((ct.get(b, 0) + alpha) / dt)
                - m.log((cr.get(b, 0) + alpha) / dr) for b in feats(t))
        want[i] = (len(feats(t)), round(d, 6))
    got = {r["doc_id"]: (r["n_feats"], r["log_ratio"]) for r in
           dsir_weights(docs, target, n_buckets=B).collect()}
    assert set(got) == {0, 1, 2}
    for i in (0, 1, 2):
        assert got[i][0] == want[i][0], i
        assert abs(got[i][1] - want[i][1]) < 1e-6, (i, got[i], want[i])
    # the target-like doc outranks the off-target one; empty doc scores 0
    assert got[0][1] > got[1][1]
    assert got[2] == (0, 0.0)


def test_corpus_stats_double_num_col_keeps_double_sum(spark):
    """r5 ADVICE: the BIGINT cast (DuckDB HUGEINT parity) must apply to
    integral num_cols only — a fractional column keeps its double sum."""
    from qdrant_spark.operators.curation import corpus_stats

    rows = [(i, "en", 0.5 + i, "s") for i in range(4)]
    df = spark.createDataFrame(rows, ["doc_id", "lang", "score", "source"])
    out = corpus_stats(df, num_col="score")
    assert dict(out.dtypes)["sum_score"] == "double"
    assert out.collect()[0]["sum_score"] == pytest.approx(8.0)

    df_i = spark.createDataFrame(
        [(0, "en", 3, "s")], ["doc_id", "lang", "n_chars", "source"])
    assert dict(corpus_stats(df_i).dtypes)["sum_n_chars"] == "bigint"


def test_lm_dsir_eager_model_matches_lazy(spark):
    # r15: the bounded model stats (top-V vocab, totals, percentile
    # cuts, hashed-ngram bucket models) collect eagerly and re-enter the
    # plan as LocalRelations/literals — results must be bit-identical to
    # the fully lazy in-plan subtrees, and the eager plans must stop
    # re-scanning the corpus per reference.
    from qdrant_spark.operators.curation import (
        dsir_weights, lm_buckets, lm_score,
    )

    docs = spark.createDataFrame(
        [(i, f"alpha beta gamma{i % 3} delta word{i}" * (1 + i % 4))
         for i in range(40)] + [(99, "")],
        "doc_id long, text string")
    target = docs.filter("doc_id % 5 = 0")

    for fn, kwargs in (
        (lm_score, dict(vocab_size=7, alpha=0.5)),
        (lm_buckets, dict(vocab_size=7, alpha=0.5)),
    ):
        eager = fn(docs, eager_model=True, **kwargs)
        lazy = fn(docs, eager_model=False, **kwargs)
        assert sorted(map(tuple, eager.collect())) == \
            sorted(map(tuple, lazy.collect())), fn.__name__
        # the corpus subtree is planned ONCE in the eager plan (the
        # model frames enter as LocalTableScan, not corpus re-scans);
        # AQE's toString repeats the tree under "Initial Plan" — count
        # only the final section
        plan = (eager._jdf.queryExecution().executedPlan().toString()
                .split("== Initial Plan ==")[0])
        assert plan.count("ExistingRDD") <= 1, fn.__name__

    eager = dsir_weights(docs, target, n_buckets=64, eager_model=True)
    lazy = dsir_weights(docs, target, n_buckets=64, eager_model=False)
    assert sorted(map(tuple, eager.collect())) == \
        sorted(map(tuple, lazy.collect()))
    plan = (eager._jdf.queryExecution().executedPlan().toString()
            .split("== Initial Plan ==")[0])
    assert plan.count("ExistingRDD") <= 1
