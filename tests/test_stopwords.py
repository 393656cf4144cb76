"""Built-in per-language stopword sets and the reference's
``StopwordsInterface`` spec forms (data_types/index.rs:438; resolution
stop_words/mod.rs:74-155; per-language arrays stop_words/*.rs).

Conflation checks per language: a sentence of that language's function
words tokenizes to nothing, while content words survive — exercised
through tokenize_py (query side) AND the JVM tokenize (document side),
which must agree.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from qdrant_spark.functions.stopwords import STOPWORDS, resolve_stopwords
from qdrant_spark.functions.text import tokenize, tokenize_py

# the reference's stopword Language enum (stop_words/mod.rs:118-150)
REFERENCE_LANGUAGES = [
    "arabic", "azerbaijani", "basque", "bengali", "catalan", "chinese",
    "danish", "dutch", "english", "finnish", "french", "german", "greek",
    "hebrew", "hinglish", "hungarian", "indonesian", "italian", "japanese",
    "kazakh", "nepali", "norwegian", "portuguese", "romanian", "russian",
    "slovene", "spanish", "swedish", "tajik", "turkish",
]

# one all-function-word sentence + one content word per scripted language
CONFLATION = {
    "english": ("the of and was not", "database"),
    "german": ("der die das und nicht", "datenbank"),
    "french": ("le la les et pas", "voiture"),
    "spanish": ("el la los y no", "coche"),
    "portuguese": ("o a os e com", "carro"),
    "italian": ("il lo la e non", "macchina"),
    "dutch": ("de het een en niet", "fiets"),
    "danish": ("og i det at en", "cykel"),
    "norwegian": ("og i det at en", "sykkel"),
    "swedish": ("och det att i en", "cykel"),
    "finnish": ("olla on ei ja se", "polkupyörä"),
    "hungarian": ("a az és nem hogy", "kutya"),
    "romanian": ("și de la cu nu", "mașină"),
    "turkish": ("ve bu biri için da", "araba"),
    "greek": ("και το να δεν με", "σπίτι"),
    "russian": ("и в не на что", "собака"),
    "arabic": ("في من على ما لا", "كتاب"),
    "indonesian": ("yang dan di untuk tidak", "mobil"),
    "catalan": ("el la les i amb", "cotxe"),
    "basque": ("eta da ez bat hau", "etxea"),
    "hebrew": ("של את על לא זה", "ספר"),
    "kazakh": ("және мен бұл не бар", "кітап"),
    "slovene": ("in je ne da se", "hiša"),
    "tajik": ("дар ба аз бо ин", "китоб"),
    "azerbaijani": ("və bu bir ki daha", "kitab"),
    "tamil": ("ஒரு இந்த மற்றும் அது என்று", "புத்தகம்"),
    "armenian": ("եւ որ է այս ինչ", "գիրք"),
}


def test_all_reference_languages_present():
    missing = [l for l in REFERENCE_LANGUAGES if l not in STOPWORDS]
    assert missing == []
    # plus the two stemmer-only languages so every stemmer has a set
    assert "tamil" in STOPWORDS and "armenian" in STOPWORDS


def test_lists_are_lowercase_and_nonempty():
    for lang, words in STOPWORDS.items():
        assert len(words) >= 30, lang
        assert all(w == w.lower() for w in words), lang


def test_english_is_the_standard_list_size():
    # the public NLTK english list has exactly 179 entries
    assert len(STOPWORDS["english"]) == 179
    for w in ["the", "a", "of", "is", "was", "not", "don't", "shouldn't"]:
        assert w in STOPWORDS["english"], w


@pytest.mark.parametrize("lang", sorted(CONFLATION))
def test_conflation_py(lang):
    functionwords, content = CONFLATION[lang]
    sw = {"language": lang}
    assert tokenize_py(functionwords, stopwords=sw) == []
    kept = tokenize_py(f"{functionwords} {content}", stopwords=sw)
    assert kept == [content.lower()]


def test_spec_forms():
    assert resolve_stopwords(None) is None
    assert "the" in resolve_stopwords("english")
    assert "the" in resolve_stopwords({"language": "English"})
    multi = resolve_stopwords(
        {"languages": ["english", "german"], "custom": ["Sparkql"]})
    assert {"the", "und", "sparkql"} <= multi
    # plain custom collections keep working (pre-round-8 API)
    assert resolve_stopwords({"x"}) == frozenset({"x"})
    assert resolve_stopwords(["X", "y"]) == frozenset({"x", "y"})
    with pytest.raises(ValueError):
        resolve_stopwords("klingon")
    with pytest.raises(TypeError):
        resolve_stopwords(42)


def test_custom_respects_lowercase_flag():
    # StopwordsFilter::new lowercases custom words only when the index
    # lowercases tokens (add_stopword, stop_words/mod.rs:108-114)
    from qdrant_spark.functions.text import tokenize_py

    assert tokenize_py("Foo bar", lowercase=False, stopwords=["Foo"]) == ["bar"]
    assert tokenize_py("foo bar", lowercase=False, stopwords=["Foo"]) == ["foo", "bar"]
    assert tokenize_py("Foo bar", lowercase=True, stopwords=["Foo"]) == ["bar"]
    assert resolve_stopwords(["Foo"], lowercase=False) == frozenset({"Foo"})


def test_custom_unions_with_language():
    sw = resolve_stopwords({"language": "english", "custom": ["spark"]})
    assert tokenize_py("the spark table", stopwords=sw) == ["table"]


def test_stopwords_apply_before_stemming():
    # 'having' is an english stopword: removed BEFORE the stemmer could
    # turn it into 'have' (tokens_processor.rs order: stopwords -> stem)
    toks = tokenize_py("having merged queries",
                       stopwords={"language": "english"},
                       stemmer={"type": "snowball", "language": "english"})
    assert toks == ["merg", "queri"]


def test_jvm_matches_python_with_language_spec(spark):
    rows = [
        ("the merged queries are fast",),
        ("der große Tisch und die Stühle",),
        ("no stopwords here whatsoever",),
        ("the of and was",),
    ]
    df = spark.createDataFrame(rows, "t: string")
    for spec in ["english",
                 {"language": "german"},
                 {"languages": ["english", "german"], "custom": ["fast"]}]:
        got = [list(r["toks"]) for r in
               df.select(tokenize(F.col("t"), stopwords=spec).alias("toks"))
               .collect()]
        exp = [tokenize_py(t, stopwords=spec) for (t,) in rows]
        assert got == exp, spec


def test_filter_match_text_with_language_stopwords(spark):
    from qdrant_spark.filters import apply_filter

    df = spark.createDataFrame(
        [(1, "the merged queries run"), (2, "merged only"), (3, "queries only")],
        "id: long, text: string",
    )
    tp = {"text": {"stopwords": {"language": "english"},
                   "stemmer": {"type": "snowball", "language": "english"}}}
    # 'the' drops from the query; requires stems (merg, queri)
    flt = {"must": [{"key": "text", "match": {"text": "the merged queries"}}]}
    got = sorted(r["id"] for r in apply_filter(df, flt, text_params=tp).collect())
    assert got == [1]
    # all-stopword query -> no required tokens -> matches everything
    flt2 = {"must": [{"key": "text", "match": {"text": "the was of"}}]}
    got2 = sorted(r["id"] for r in apply_filter(df, flt2, text_params=tp).collect())
    assert got2 == [1, 2, 3]
