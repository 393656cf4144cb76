"""Property test: the JVM-side tokenizer (Column expressions) must agree
with the driver-side tokenizer for every option combination — filter
compilation tokenizes queries in Python while documents tokenize in Spark,
so any divergence silently breaks full-text match semantics
(TextIndexParams options: index.rs:260-360)."""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

from qdrant_spark.functions.text import tokenize, tokenize_py

STOPWORDS = {"the", "a", "of"}

texts = st.text(
    alphabet=st.sampled_from("ab cd THE a of xyzq .,-é9_ß語ü日ﬁ本"),
    min_size=0,
    max_size=40,
)
options = st.fixed_dictionaries(
    {
        "tokenizer": st.sampled_from(
            ["word", "whitespace", "prefix", "multilingual", "japanese"]
        ),
        "lowercase": st.booleans(),
        "min_token_len": st.sampled_from([None, 1, 2, 3]),
        "max_token_len": st.sampled_from([None, 3, 5]),
        "stopwords": st.sampled_from(
            [None, STOPWORDS, "english",
             {"languages": ["english"], "custom": ["ab", "THE"]}]),
        "ascii_folding": st.booleans(),
        "stemmer": st.sampled_from([None, "english", {"type": "none"}]),
    }
)


@pytest.fixture(scope="module")
def tok_spark(spark):
    def run(batch, **kw):
        df = spark.createDataFrame([(t,) for t in batch], "t: string")
        rows = df.select(tokenize(F.col("t"), **kw).alias("toks")).collect()
        return [list(r["toks"]) for r in rows]

    return run


@given(batch=st.lists(texts, min_size=1, max_size=8), opts=options)
@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_tokenize_spark_matches_python(tok_spark, batch, opts):
    got = tok_spark(batch, **opts)
    exp = [tokenize_py(t, **opts) for t in batch]
    assert got == exp


def test_prefix_tokenizer_shape(tok_spark):
    [toks] = tok_spark(["Hello ok"], tokenizer="prefix", min_token_len=2,
                       max_token_len=4)
    assert toks == ["he", "hel", "hell", "ok"]


def test_stopword_and_length_filters(tok_spark):
    [toks] = tok_spark(["The quick brown fox of doom"], stopwords=STOPWORDS,
                       min_token_len=4)
    assert toks == ["quick", "brown", "doom"]


def test_shingles_short_and_empty_docs(spark):
    # regression: docs with fewer than n tokens/chars made sequence(1, 0)
    # count DOWN and slice(toks, 0, n) abort the whole job
    from qdrant_spark.functions.text import shingles

    df = spark.createDataFrame(
        [(1, "two tokens"), (2, ""), (3, "one"), (4, "a b c d")],
        "doc_id: long, text: string",
    )
    word = {r["doc_id"]: list(r["s"]) for r in
            df.select("doc_id", shingles("text", n=3).alias("s")).collect()}
    assert word[1] == [] and word[2] == [] and word[3] == []
    assert word[4] == ["a b c", "b c d"]
    char = {r["doc_id"]: list(r["s"]) for r in
            df.select("doc_id", shingles("text", n=5, mode="char").alias("s")).collect()}
    assert char[3] == [] and char[2] == []
    assert char[1][:2] == ["two t", "wo to"]


def test_phrase_match_doc_shorter_than_phrase(spark):
    from qdrant_spark.filters import filter_column

    df = spark.createDataFrame(
        [(1, "big data"), (2, ""), (3, "big data systems at scale")],
        "id: long, body: string",
    )
    cond = {"must": [{"key": "body",
                      "match": {"phrase": "big data systems"}}]}
    got = sorted(r["id"] for r in df.filter(filter_column(df, cond)).collect())
    assert got == [3]


# --- stemmer / folding / multilingual parity ------------------------------

STEM_GOLDEN = {
    # Snowball English sample-vocabulary pairs + per-step probes; the
    # reference stems via rust_stemmers (stemmer.rs:9-52), generated from
    # the same published algorithm
    "consign": "consign", "consigned": "consign", "consigning": "consign",
    "consignment": "consign", "consist": "consist", "consistency": "consist",
    "consistent": "consist", "consistently": "consist",
    "consolation": "consol", "consolatory": "consolatori",
    "console": "consol", "consolidate": "consolid", "consoling": "consol",
    "consonant": "conson", "conspicuous": "conspicu",
    "conspiracy": "conspiraci", "conspirator": "conspir",
    "constable": "constabl", "constancy": "constanc", "constant": "constant",
    "knack": "knack", "knackeries": "knackeri", "knavish": "knavish",
    "kneaded": "knead", "knees": "knee", "knives": "knive",
    "knightly": "knight", "knitted": "knit", "knocker": "knocker",
    "testing": "test", "hopping": "hop", "hoping": "hope", "dies": "die",
    "cries": "cri", "gas": "gas", "gaps": "gap", "kiwis": "kiwi",
    "agreed": "agre", "relational": "relat", "conditional": "condit",
    "rational": "ration", "generously": "generous",
    "communication": "communic", "radically": "radic", "bled": "bled",
    "sky": "sky", "dying": "die", "lying": "lie", "early": "earli",
    "skies": "sky", "news": "news", "generate": "generat",
    "general": "general", "generic": "generic", "happily": "happili",
    "possibly": "possibl", "ability": "abil", "arguing": "argu",
    "argument": "argument", "replacement": "replac", "dependent": "depend",
    "formality": "formal", "sensitivity": "sensit",
    "sensibility": "sensibl", "operator": "oper", "grossness": "gross",
    "effectiveness": "effect", "hopefulness": "hope", "formative": "format",
    "electricity": "electr", "electrical": "electr", "hopeful": "hope",
    "goodness": "good", "allowance": "allow", "inference": "infer",
    "adjustable": "adjust", "defensible": "defens", "adoption": "adopt",
    "controllable": "control", "rolled": "roll", "proceed": "proceed",
    "exceed": "exceed", "inning": "inning", "herring": "herring",
    # longest-match commits without retry (snowball `among` semantics):
    # 'entli' fails R1 for this word, so no shorter suffix is tried
    "fluently": "fluentli",
    "customer": "custom", "value": "valu", "column": "column",
}


def test_snowball_english_golden():
    from qdrant_spark.functions.stemmer import snowball_en

    bad = {w: (snowball_en(w), e) for w, e in STEM_GOLDEN.items()
           if snowball_en(w) != e}
    assert not bad, bad


def test_snowball_unsupported_language_raises():
    from qdrant_spark.functions.stemmer import get_stemmer

    with pytest.raises(ValueError):
        get_stemmer("klingon")


def test_ascii_folding_parity(tok_spark):
    from qdrant_spark.functions.text import fold_to_ascii_py

    samples = ["naïve Café ÆON ß œuf Ĳsselmeer ﬁne ﬂow", "Ýŷÿ Žluťoučký"]
    got = tok_spark(samples, ascii_folding=True)
    exp = [tokenize_py(t, ascii_folding=True) for t in samples]
    assert got == exp
    assert fold_to_ascii_py("ß") == "ss"
    assert fold_to_ascii_py("Æon") == "AEon"


def test_multilingual_reference_cases(tok_spark):
    # reference: multilingual.rs:160-174 — latin path matches word
    # tokenization; kana chars become standalone tokens (we emit unigrams
    # where vaporetto segments words, a documented approximation; Han
    # runs dictionary-segment — test_multilingual_chinese_fmm); tokens
    # with no letter are dropped (multilingual.rs:49-52)
    [t1] = tok_spark(["This is a test"], tokenizer="multilingual")
    assert t1 == ["this", "is", "a", "test"]
    [t2] = tok_spark(["これはテストです"], tokenizer="multilingual")
    assert t2 == list("これはテストです")
    [t3] = tok_spark(["abc 123 4d"], tokenizer="multilingual")
    assert t3 == ["abc", "4d"]  # pure-number tokens dropped


def test_japanese_cjk_bigrams(tok_spark):
    # japanese.rs uses a learned segmenter (vaporetto); we approximate with
    # CJK-run character bigrams (Lucene CJKAnalyzer shape) — latin spans
    # tokenize like `word`, 1-char runs stay unigrams
    [t1] = tok_spark(["日本語のテスト"], tokenizer="japanese")
    assert t1 == ["日本", "本語", "語の", "のテ", "テス", "スト"]
    [t2] = tok_spark(["Spark 日本語 engine"], tokenizer="japanese")
    assert t2 == ["spark", "日本", "本語", "engine"]
    [t3] = tok_spark(["語 123"], tokenizer="japanese")
    assert t3 == ["語"]  # single-char run + pure-number token dropped
    got = tok_spark(["日本語のテスト処理系"], tokenizer="japanese")
    exp = [tokenize_py("日本語のテスト処理系", tokenizer="japanese")]
    assert got == exp


def test_stemmed_tokenize_spark_matches_python(tok_spark):
    texts = ["Testing the Relational Systems generously",
             "consolidated arguments", ""]
    got = tok_spark(texts, stemmer="english")
    exp = [tokenize_py(t, stemmer="english") for t in texts]
    assert got == exp


def test_stemmed_match_text_filter(spark):
    from qdrant_spark.filters import filter_column

    df = spark.createDataFrame(
        [(1, "the customers valued relational joins"),
         (2, "customer value"), (3, "relational algebra")],
        "id: long, body: string",
    )
    tp = {"body": {"stemmer": {"type": "snowball", "language": "english"}}}
    flt = {"must": [{"key": "body", "match": {"text": "customer values"}}]}
    got = sorted(r["id"] for r in
                 df.filter(filter_column(df, flt, text_params=tp)).collect())
    assert got == [1, 2]  # 'valued'/'value'/'values' all stem to 'valu'


def test_stemmed_match_text_filter_german(spark):
    from qdrant_spark.filters import filter_column

    df = spark.createDataFrame(
        [(1, "die kinder laufen durch häuser"),
         (2, "das kind läuft"), (3, "die bücher liegen im haus")],
        "id: long, body: string",
    )
    tp = {"body": {"stemmer": {"type": "snowball", "language": "german"}}}
    # 'kindes' and 'laufe' stem to (kind, lauf); doc 1 has kinder/laufen
    # (same stems), doc 2 has kind but läuft (stems to 'lauft' — the
    # published algorithm does not conflate the umlauted 3sg form)
    flt = {"must": [{"key": "body", "match": {"text": "kindes laufen"}}]}
    got = sorted(r["id"] for r in
                 df.filter(filter_column(df, flt, text_params=tp)).collect())
    assert got == [1]
    # single-token stemmed match: häuser/haus conflate
    flt2 = {"must": [{"key": "body", "match": {"text": "hauses"}}]}
    got2 = sorted(r["id"] for r in
                  df.filter(filter_column(df, flt2, text_params=tp)).collect())
    assert got2 == [1, 3]


def test_multilingual_chinese_fmm(tok_spark):
    """r5 VERDICT item 8: Han runs segment by dictionary FMM
    (functions/zh.py) with a bigram fallback for out-of-vocabulary
    spans — hand-computed oracles; kana keep per-char tokens."""
    # all-dictionary sentence: 我们|在|中国|学习|中文 (在 = 1-char gap)
    [t1] = tok_spark(["我们在中国学习中文"], tokenizer="multilingual")
    assert t1 == ["我们", "在", "中国", "学习", "中文"]
    # dictionary + OOV span: 成立了 is out-of-vocabulary -> bigrams
    [t2] = tok_spark(["中国人民银行成立了"], tokenizer="multilingual")
    assert t2 == ["中国", "人民", "银行", "成立", "立了"]
    # longest match wins: 中华人民共和国 is one dictionary word
    [t3] = tok_spark(["中华人民共和国于1949年成立"],
                     tokenizer="multilingual")
    assert t3[0] == "中华人民共和国"
    # mixed latin + Han
    [t4] = tok_spark(["Spark 处理大数据"], tokenizer="multilingual")
    assert t4 == ["spark", "处理", "大数据"]
    # spark side == python side on a mixed-script sample
    s = "日本語と中文の混在テキスト"
    [t5] = tok_spark([s], tokenizer="multilingual")
    assert t5 == tokenize_py(s, tokenizer="multilingual")


def test_chinese_match_text_no_overmatch(spark):
    """match.text on a Chinese corpus: dictionary words match whole —
    a query for 国人 must NOT hit 中国人民银行 (the pre-FMM
    single-char/bigram expansion over-matched exactly this way;
    charabia's dictionary segmentation does not)."""
    from qdrant_spark.filters import apply_filter

    df = spark.createDataFrame(
        [(1, "中国人民银行成立了"), (2, "我们在中国学习中文"),
         (3, "外国人在北京生活")],
        "id: long, body: string")
    tp = {"body": {"tokenizer": "multilingual"}}

    def ids(q):
        flt = {"must": [{"key": "body", "match": {"text": q}}]}
        return sorted(r["id"] for r in
                      apply_filter(df, flt, text_params=tp).collect())

    assert ids("中国") == [1, 2]
    assert ids("人民") == [1]
    assert ids("学习") == [2]
    # 国人 is a bigram of doc 3's OOV span 外国人 — matches 3 only,
    # NOT doc 1 (whose 中国|人民 are dictionary words)
    assert ids("国人") == [3]
