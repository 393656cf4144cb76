"""Golden + property tests for the second-batch Snowball stemmers
(danish, norwegian, finnish, romanian, hungarian, turkish, greek).

Parity target: SnowballLanguage -> rust_stemmers dispatch
(lib/segment/src/data_types/index.rs:354-420). Golden pairs are derived by
hand-tracing the published snowballstem.org algorithm specifications;
common inflection families additionally assert that variants conflate to
one stem (the property the text index actually relies on). Where the
single-pass Snowball design legitimately splits a family (da `muligheder`
-> `mulig` but `mulighederne` -> `mulighed`), the family is not asserted.
"""

from __future__ import annotations

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from qdrant_spark.functions.stemmer import get_stemmer

GOLDEN = {
    "danish": {
        "hundene": "hund", "hunden": "hund", "bogen": "bog",
        "muligheder": "mulig", "mulighed": "mulig",
        "løst": "løs", "festligt": "fest", "venlige": "ven",
        "kærligheden": "kær",
    },
    "norwegian": {
        "husene": "hus", "huset": "hus", "hundene": "hund",
        "mulighetene": "mulig", "muligheter": "mulig", "mulighet": "mulig",
        "kjærligheten": "kjær", "vanlige": "van",
    },
    "finnish": {
        "taloissa": "talo", "taloista": "talo", "taloon": "talo",
        "talossa": "talo", "kirjoissa": "kirj", "kirjat": "kirj",
        "suurimmissa": "suurim",
    },
    "romanian": {
        "copiilor": "cop", "frumoasele": "frumoas", "frumoasa": "frumoas",
        "lucrurilor": "lucrur", "românească": "român",
        "românesc": "român", "cântând": "cânt",
    },
    "hungarian": {
        "házakat": "ház", "házban": "ház", "házak": "ház",
        "könyveket": "könyv", "könyvek": "könyv",
        "gyerekeknek": "gyerek", "gyerekek": "gyerek",
    },
    "turkish": {
        "evlerinde": "ev", "evlerin": "ev", "evler": "ev",
        "kitapları": "kitap", "kitaplar": "kitap",
        "çocukların": "çocuk", "çocuklar": "çocuk",
    },
    "greek": {
        "βιβλίων": "βιβλι", "βιβλίου": "βιβλι", "βιβλία": "βιβλι",
        "ονόματα": "ονομ", "όνομα": "ονομ",
        "εθνικός": "εθνικ", "εθνική": "εθνικ",
        "τραγουδάω": "τραγουδ",
    },
}

CONFLATE = {
    "danish": [("hunden", "hundene", "hund"), ("festlig", "festligt"),
               ("venlige", "venlig")],
    "norwegian": [("hunden", "hundene"),
                  ("mulighetene", "muligheter", "mulighet"),
                  ("kjærlighet", "kjærligheten")],
    "finnish": [("taloissa", "taloista", "taloon", "talossa", "talot",
                 "talo"),
                ("kirjoissa", "kirjan", "kirjat", "kirja")],
    "romanian": [("frumoasele", "frumoasa"), ("lucrurilor", "lucruri"),
                 ("românească", "românesc"), ("cântând", "cânta")],
    "hungarian": [("házak", "házakat", "házban", "ház"),
                  ("könyvek", "könyveket", "könyv"),
                  ("gyerekek", "gyerekeknek")],
    "turkish": [("evler", "evlerin", "evlerinde", "ev"),
                ("kitaplar", "kitapları", "kitap"),
                ("çocuklar", "çocukların", "çocuk")],
    "greek": [("καλή", "καλό", "καλοί"),
              ("βιβλίο", "βιβλία", "βιβλίου", "βιβλίων"),
              ("ονόματα", "όνομα"), ("εθνικός", "εθνική")],
}


@pytest.mark.parametrize("lang", sorted(GOLDEN))
def test_golden(lang):
    stem = get_stemmer(lang)
    bad = {w: (stem(w), e) for w, e in GOLDEN[lang].items() if stem(w) != e}
    assert not bad, bad


@pytest.mark.parametrize("lang", sorted(CONFLATE))
def test_inflections_conflate(lang):
    stem = get_stemmer(lang)
    for family in CONFLATE[lang]:
        stems = {stem(w) for w in family}
        assert len(stems) == 1, (family, stems)


def test_short_codes_resolve():
    for code, lang in [("da", "danish"), ("no", "norwegian"),
                       ("fi", "finnish"), ("ro", "romanian"),
                       ("hu", "hungarian"), ("tr", "turkish"),
                       ("el", "greek")]:
        assert get_stemmer(code)("testord") == get_stemmer(lang)("testord")


@settings(max_examples=300, deadline=None)
@given(
    st.sampled_from(sorted(GOLDEN)),
    st.text(
        alphabet=st.characters(categories=("Ll", "Nd")),
        min_size=0, max_size=24,
    ),
)
def test_never_raises_and_bounded(lang, word):
    """Any lowercase token stems without raising and without runaway
    growth; empty input passes through."""
    stem = get_stemmer(lang)
    out = stem(word)
    assert isinstance(out, str)
    assert len(out) <= 2 * len(word) + 3
    if word == "":
        assert out == ""


# ---------------------------------------------------------------------------
# batch 3: arabic + tamil (stemmers_i18n3) — same gates
# ---------------------------------------------------------------------------

GOLDEN3 = {
    "armenian": {
        "սեղաններ": "սեղան", "սեղանների": "սեղան",
        "սեղանով": "սեղան", "սեղանի": "սեղան",
        "ուսանողներ": "ուսանող", "ուսանողին": "ուսանող",
        "ազատության": "ազատ", "ազատություն": "ազատ",
    },
    "arabic": {
        "الكتاب": "كتاب", "والكتاب": "كتاب", "بالكتاب": "كتاب",
        "كتابها": "كتاب", "المدرسة": "مدرس", "للمدرسة": "مدرس",
        "المعلمون": "معلم", "المعلمين": "معلم", "الكاتبات": "كاتب",
    },
    "tamil": {
        "மரங்கள்": "மரம்", "மரத்தில்": "மரம்",
        "மரத்தால்": "மரம்", "மரத்தை": "மரம்",
        "வீடும்": "வீடு",
        "புத்தகங்கள்": "புத்தகம்",
        "நாட்கள்": "நாள்",
        "படிக்கிறான்": "படிக்",
    },
}

CONFLATE3 = {
    "armenian": [("սեղան", "սեղաններ", "սեղանների", "սեղանով",
                  "սեղանները", "սեղանի"),
                 ("ուսանող", "ուսանողներ", "ուսանողին"),
                 ("կարդալ", "կարդում", "կարդացի"),
                 ("ազատություն", "ազատության")],
    "arabic": [("الكتاب", "والكتاب", "بالكتاب", "كتابها", "كتاب"),
               ("المدرسة", "للمدرسة", "مدرسة"),
               ("المعلمون", "المعلمين", "معلم")],
    "tamil": [("மரம்", "மரங்கள்", "மரத்தில்",
               "மரத்தால்", "மரத்தை"),
              ("வீடு", "வீடும்"),
              ("புத்தகம்", "புத்தகங்கள்"),
              ("நாள்", "நாட்கள்"),
              ("படிக்கிறான்", "படிக்கிறாள்",
               "படிக்கிறது")],
}


@pytest.mark.parametrize("lang", sorted(GOLDEN3))
def test_golden3(lang):
    stem = get_stemmer(lang)
    bad = {w: (stem(w), e) for w, e in GOLDEN3[lang].items() if stem(w) != e}
    assert not bad, bad


@pytest.mark.parametrize("lang", sorted(CONFLATE3))
def test_inflections_conflate3(lang):
    stem = get_stemmer(lang)
    for family in CONFLATE3[lang]:
        stems = {stem(w) for w in family}
        assert len(stems) == 1, (family, stems)


def test_batch3_short_codes_and_diacritics():
    assert get_stemmer("ar")("الكتاب") == get_stemmer("arabic")("الكتاب")
    assert get_stemmer("ta")("மரங்கள்") == \
        get_stemmer("tamil")("மரங்கள்")
    assert get_stemmer("hy")("սեղաններ") == \
        get_stemmer("armenian")("սեղաններ")
    # tashkeel-marked and bare forms conflate (normalization)
    assert get_stemmer("ar")("كِتَاب") == get_stemmer("ar")("كتاب")


@settings(max_examples=200, deadline=None)
@given(
    st.sampled_from(["arabic", "tamil", "armenian"]),
    st.text(
        alphabet=st.characters(categories=("Ll", "Lo", "Mn", "Mc", "Nd")),
        min_size=0, max_size=24,
    ),
)
def test_batch3_never_raises_and_bounded(lang, word):
    stem = get_stemmer(lang)
    out = stem(word)
    assert isinstance(out, str)
    assert len(out) <= 2 * len(word) + 3
    if word == "":
        assert out == ""
