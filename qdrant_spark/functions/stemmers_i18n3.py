"""Snowball stemmers, third batch: arabic, armenian and tamil — closing
out the reference's ``SnowballLanguage`` set (lib/segment/src/data_types/
index.rs:354-420, dispatch in lib/segment/src/index/field_index/
full_text_index/tokenizers/stemmer.rs).

Both implementations follow the published public algorithm documents —
the snowballstem.org Arabic stemmer (Assem Chelli's light-stemming
design, whose rule groups coincide with the Light10 stemmer published by
Larkey, Ballesteros & Connell) and the snowballstem.org Tamil stemmer
(Damodharan's algorithm). No code is derived from the reference or from
any stemming library. As with the Greek module, the long tail of rare
exception rules is approximated where noted inline; the invariant the
text index relies on — inflection families conflate to one stem — is
what the tests gate.
"""

from __future__ import annotations

from functools import lru_cache

# ---------------------------------------------------------------------------
# Arabic  (snowballstem.org/algorithms/arabic/stemmer.html; light-stemming
# rule groups per Larkey et al.'s published Light10)
# ---------------------------------------------------------------------------

# tashkeel (harakat) U+064B..U+0652 plus superscript alef, and tatweel
_AR_DIACRITICS = set("ًٌٍَُِّْ"
                     "ٰـ")
_AR_NORM = str.maketrans({
    "آ": "ا",  # alef madda  -> alef
    "أ": "ا",  # alef hamza above -> alef
    "إ": "ا",  # alef hamza below -> alef
    "ى": "ي",  # alef maqsura -> yeh
})

# definite-article / particle prefixes, longest first; the leading waw/fa
# conjunctions are handled separately so وبال ("and with the") strips too
_AR_ARTICLES = ("ال",               # ال
                "وال",         # وال
                "بال",         # بال
                "كال",         # كال
                "فال",         # فال
                "لل")               # لل

# pronominal / nominal suffixes (Light10 order, longest first)
_AR_SUFFIXES = ("ها",   # ها
                "ان",   # ان
                "ات",   # ات
                "ون",   # ون
                "ين",   # ين
                "يه",   # يه
                "ية",   # ية
                "ه",         # ه
                "ة",         # ة
                "ي")         # ي


@lru_cache(maxsize=65536)
def snowball_ar(word: str) -> str:
    # normalize: strip diacritics + tatweel, fold hamza-carrier alefs,
    # alef maqsura -> yeh (the spec's Normalize_pre / Normalize_post)
    word = "".join(c for c in word if c not in _AR_DIACRITICS)
    word = word.translate(_AR_NORM)
    if len(word) <= 3:
        return word

    # conjunction waw: strip only when >= 4 letters remain (the spec's
    # guard keeps 3-letter roots whose first radical is waw intact)
    if word.startswith("و") and len(word) >= 5:
        word = word[1:]

    # definite article (longest first), remainder must keep >= 2 letters
    for p in sorted(_AR_ARTICLES, key=len, reverse=True):
        if word.startswith(p) and len(word) - len(p) >= 2:
            word = word[len(p):]
            break

    # suffixes in list order, each stripped at most once while >= 2
    # letters remain (Light10 strips repeatedly down the list; one pass
    # per entry is the published behavior)
    for s in _AR_SUFFIXES:
        if word.endswith(s) and len(word) - len(s) >= 2:
            word = word[: -len(s)]
    return word


# ---------------------------------------------------------------------------
# Tamil  (snowballstem.org/algorithms/tamil/stemmer.html — Damodharan's
# published algorithm; implemented as the main suffix-group cascade:
# question/um clitics, plural with sandhi reversal, case (vetrumai
# urupukal) with oblique-stem restoration, tense endings. The spec's
# rarer command/common-word-ending groups are folded into the case and
# tense lists; conflation families are test-gated.)
# ---------------------------------------------------------------------------

_TA_PULLI = "்"            # ்  (virama)
_TA_U_SIGN = "ு"           # ு
_TA_VOWEL_SIGNS = set("ாிீுூெேை"
                      "ொோௌ")


def _ta_len(word: str) -> int:
    """Approximate letter count: base characters only (signs modify the
    preceding consonant, they are not letters)."""
    return sum(1 for c in word
               if c not in _TA_VOWEL_SIGNS and c != _TA_PULLI)


def _ta_strip(word: str, pairs, min_len: int = 2) -> tuple[str, bool]:
    """Longest-match strip of (suffix, replacement) pairs; the stem must
    keep >= min_len base letters."""
    best = None
    for suf, rep in pairs:
        if word.endswith(suf) and (best is None
                                   or len(suf) > len(best[0])):
            best = (suf, rep)
    if best is None:
        return word, False
    suf, rep = best
    stem = word[: len(word) - len(suf)] + rep
    if _ta_len(stem) < min_len:
        return word, False
    return stem, True


# plural கள் with sandhi reversal: மரங்கள் -> மரம், நாட்கள் -> நாள்,
# கயிறுகள்-type default just drops கள்
_TA_PLURAL = (
    ("ங்கள்", "ம்"),   # ங்கள் -> ம்
    ("ட்கள்", "ள்"),   # ட்கள் -> ள்
    ("ற்கள்", "ல்"),   # ற்கள் -> ல்
    ("கள்", ""),                            # கள் -> ∅
)

# clitics: interrogative/emphatic ஆ/ஏ/ஓ signs and the -உம் particle
_TA_CLITICS = (
    ("ும்", "ு"),   # ும் -> ு   (வீடும் -> வீடு)
    ("ா", ""),                     # ா  (question)
    ("ே", ""),                     # ே  (emphasis)
    ("ோ", ""),                     # ோ  (doubt)
)

# case endings (vetrumai urupukal), longest first
_TA_CASE = (
    ("ுக்கு", ""),                 # ுக்கு (dative)
    ("ிடம்", ""),                        # ிடம் (locative)
    ("ுடன்", ""),                        # ுடன் (sociative)
    ("ால்", ""),                              # ால் (instrumental)
    ("ில்", ""),                              # ில் (locative)
    ("ின்", ""),                              # ின் (genitive)
    ("ை", ""),                                          # ை (accusative)
)

# tense / person-number-gender verb endings, longest first
_TA_TENSE = (
    ("கின்றான்", ""),  # கின்றான்
    ("கின்றாள்", ""),  # கின்றாள்
    ("கின்றது", ""),        # கின்றது
    ("கிறான்", ""),              # கிறான்
    ("கிறாள்", ""),              # கிறாள்
    ("கிறது", ""),                    # கிறது
    ("ந்தான்", ""),              # ந்தான்
    ("ந்தாள்", ""),              # ந்தாள்
    ("ந்தது", ""),                    # ந்தது
    ("வான்", ""),                          # வான்
    ("வாள்", ""),                          # வாள்
)


@lru_cache(maxsize=65536)
def snowball_ta(word: str) -> str:
    if _ta_len(word) <= 2:
        return word
    # clitics first (outermost morphemes), then plural, case, tense
    word, _ = _ta_strip(word, _TA_CLITICS)
    word, _ = _ta_strip(word, _TA_PLURAL)
    word, changed = _ta_strip(word, _TA_CASE)
    if changed and word.endswith(
            "த்த"):  # oblique -த்த- -> ம் (மரத்தில் -> மரம்)
        word = word[:-3] + "ம்"
    word, _ = _ta_strip(word, _TA_TENSE)
    return word


# ---------------------------------------------------------------------------
# Armenian  (snowballstem.org/algorithms/armenian/stemmer.html —
# Mkrtchyan's published algorithm; implemented as the RV-region suffix
# cascade over its four among-groups: adverbial/adjectival endings, verb
# endings, noun/derivational endings, then the case/article tail. The
# spec's rarest verb-paradigm entries are approximated by the productive
# core; conflation families are test-gated.)
# ---------------------------------------------------------------------------

_HY_VOWELS = "աեէըիոււօ"

_HY_ADJ = ("բար", "պես", "որեն", "ովին")
_HY_VERB = (
    "ացնել", "ացրել", "ացել", "ացրեց", "ացրին",
    "ություն", "անալ", "ենալ",
    "ում", "ումս", "ելու", "ալու", "ելիս", "ալիս",
    "եցին", "եցիր", "եցի", "ացին", "ացիր", "ացի",
    "վել", "վեց", "եցավ",
    "ել", "ալ", "եց", "ավ",
)
_HY_NOUN = (
    "ություններով", "ություններին", "ությունների", "ություններ",
    "ությունով", "ությունից", "ությունում", "ությունը", "ությանը",
    "ության", "ությամբ", "ություն",
    "ներով", "ներից", "ներում", "ներին", "ների", "ները", "ներս", "ներ",
    "երով", "երից", "երում", "երին", "երի", "երը", "երս", "եր",
    "ական", "արան", "ային",
)
# NOTE: the spec's bare definite-article ն (vowel-final stems) is omitted:
# a context-free single-letter ն strip makes the BARE form of every
# ն-final noun diverge from its own case forms (սեղան -> սեղա but
# սեղանով -> սեղան), which breaks the one-family-one-stem invariant the
# index needs. ը/ս/դ (consonant-final article + possessives) keep it.
_HY_ENDING = ("ով", "ից", "ում", "ին", "ի", "ը", "ս", "դ")


def _hy_rv(word: str) -> int:
    """Region after the first vowel (the spec marks RV there)."""
    for i, c in enumerate(word):
        if c in _HY_VOWELS:
            return i + 1
    return len(word)


def _hy_strip(word: str, sufs, rv: int) -> str:
    m = None
    for s in sufs:
        if word.endswith(s) and (m is None or len(s) > len(m)):
            m = s
    if m and len(word) - len(m) >= max(rv, 2):
        return word[: len(word) - len(m)]
    return word


@lru_cache(maxsize=65536)
def snowball_hy(word: str) -> str:
    if len(word) <= 3:
        return word
    rv = _hy_rv(word)
    word = _hy_strip(word, _HY_ADJ, rv)
    word = _hy_strip(word, _HY_VERB, rv)
    word = _hy_strip(word, _HY_NOUN, rv)
    word = _hy_strip(word, _HY_ENDING, rv)
    return word
