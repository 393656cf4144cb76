"""Snowball stemmer (English / "Porter2"), pure Python.

Parity target: the reference's text-index stemming — ``Stemmer::Snowball``
(lib/segment/src/index/field_index/full_text_index/tokenizers/stemmer.rs:9-52)
backed by rust_stemmers, configured by ``StemmingAlgorithm``/``SnowballParams``
(lib/segment/src/data_types/index.rs:304-360). This module implements the
published Snowball English algorithm from scratch (snowballstem.org spec);
no code is derived from the reference.

English lives here; german/french/spanish/portuguese/italian/dutch/
swedish/russian are in :mod:`qdrant_spark.functions.stemmers_i18n` (the
reference's common SnowballLanguage set). Unsupported languages raise
``ValueError`` loudly rather than silently mis-stemming.

Used driver-side (query-token stemming, oracle dictionaries) and inside the
Arrow-batched ``stem_tokens`` UDF (functions/text.py) for document tokens.
"""

from __future__ import annotations

from functools import lru_cache

_VOWELS = frozenset("aeiouy")
_DOUBLES = ("bb", "dd", "ff", "gg", "mm", "nn", "pp", "rr", "tt")
_LI_ENDING = frozenset("cdeghkmnrt")

# special-cased word forms (Snowball English "exception1")
_EXCEPTIONS1 = {
    "skis": "ski", "skies": "sky",
    "dying": "die", "lying": "lie", "tying": "tie",
    "idly": "idl", "gently": "gentl", "ugly": "ugli", "early": "earli",
    "only": "onli", "singly": "singl",
    "sky": "sky", "news": "news", "howe": "howe",
    "atlas": "atlas", "cosmos": "cosmos", "bias": "bias", "andes": "andes",
}
# words invariant after step 1a
_EXCEPTIONS2 = frozenset(
    ["inning", "outing", "canning", "herring", "earring",
     "proceed", "exceed", "succeed"]
)


def _is_vowel(word: str, i: int) -> bool:
    # 'Y' (upper) marks consonant-y; lowercase y counts as a vowel here
    return word[i] in _VOWELS


def _mark_consonant_y(word: str) -> str:
    # y at word start or after a vowel is a consonant -> mark as 'Y'
    out = []
    for i, ch in enumerate(word):
        if ch == "y" and (i == 0 or word[i - 1] in _VOWELS):
            out.append("Y")
        else:
            out.append(ch)
    return "".join(out)


def _regions(word: str) -> tuple[int, int]:
    """R1/R2 start offsets. R1 = after the first vowel->non-vowel pair
    (special-cased prefixes gener/commun/arsen); R2 = same rule inside R1."""
    n = len(word)
    r1 = n
    for pre in ("gener", "commun", "arsen"):
        if word.startswith(pre):
            r1 = len(pre)
            break
    else:
        for i in range(1, n):
            if not _is_vowel(word, i) and _is_vowel(word, i - 1):
                r1 = i + 1
                break
    r2 = n
    for i in range(r1 + 1, n):
        if not _is_vowel(word, i) and _is_vowel(word, i - 1):
            r2 = i + 1
            break
    return r1, r2


def _ends_short_syllable(word: str) -> bool:
    """Short syllable: vowel + non-vowel(not w/x/Y) preceded by a non-vowel,
    or vowel + non-vowel at the very start of the word."""
    n = len(word)
    if n == 2:
        return _is_vowel(word, 0) and not _is_vowel(word, 1)
    if n >= 3:
        return (
            not _is_vowel(word, n - 3)
            and _is_vowel(word, n - 2)
            and not _is_vowel(word, n - 1)
            and word[n - 1] not in "wxY"
        )
    return False


def _contains_vowel(part: str) -> bool:
    return any(c in _VOWELS for c in part)


@lru_cache(maxsize=65536)
def snowball_en(word: str) -> str:
    """Stem one already-lowercased token with the Snowball English algorithm."""
    if len(word) <= 2:
        return word
    if word[0] == "'":
        word = word[1:]
    if word in _EXCEPTIONS1:
        return _EXCEPTIONS1[word]
    word = _mark_consonant_y(word)
    r1, r2 = _regions(word)

    # step 0: apostrophe suffixes
    for suf in ("'s'", "'s", "'"):
        if word.endswith(suf):
            word = word[: -len(suf)]
            break

    # step 1a
    if word.endswith("sses"):
        word = word[:-2]
    elif word.endswith(("ied", "ies")):
        word = word[:-3] + ("i" if len(word) > 4 else "ie")
    elif word.endswith(("us", "ss")):
        pass
    elif word.endswith("s"):
        if _contains_vowel(word[:-2]):
            word = word[:-1]

    if word in _EXCEPTIONS2:
        return word

    # step 1b
    if word.endswith(("eed", "eedly")):
        suf = "eedly" if word.endswith("eedly") else "eed"
        if len(word) - len(suf) >= r1:
            word = word[: -len(suf)] + "ee"
    else:
        for suf in ("ingly", "edly", "ing", "ed"):
            if word.endswith(suf):
                stem = word[: -len(suf)]
                if _contains_vowel(stem):
                    word = stem
                    if word.endswith(("at", "bl", "iz")):
                        word += "e"
                    elif word.endswith(_DOUBLES):
                        word = word[:-1]
                    elif _ends_short_syllable(word) and r1 >= len(word):
                        word += "e"
                break

    # step 1c: y -> i after a non-vowel that is not the first letter
    if (
        len(word) > 2
        and word[-1] in "yY"
        and word[-2] not in _VOWELS
    ):
        word = word[:-1] + "i"

    # step 2 (suffix must lie in R1); ordered longest-first
    step2 = [
        ("ization", "ize"), ("ational", "ate"), ("ousness", "ous"),
        ("iveness", "ive"), ("fulness", "ful"), ("tional", "tion"),
        ("biliti", "ble"), ("lessli", "less"), ("entli", "ent"),
        ("ation", "ate"), ("alism", "al"), ("aliti", "al"),
        ("ousli", "ous"), ("iviti", "ive"), ("fulli", "ful"),
        ("enci", "ence"), ("anci", "ance"), ("abli", "able"),
        ("izer", "ize"), ("ator", "ate"), ("alli", "al"),
        ("bli", "ble"), ("ogi", None), ("li", None),
    ]
    for suf, repl in step2:
        if word.endswith(suf):
            if len(word) - len(suf) >= r1:
                if suf == "ogi":
                    if word.endswith("logi"):
                        word = word[:-1]  # ogi -> og (preceded by l)
                elif suf == "li":
                    if len(word) > 2 and word[-3] in _LI_ENDING:
                        word = word[:-2]
                else:
                    word = word[: -len(suf)] + repl
            break

    # step 3 (suffix in R1; 'ative' additionally requires R2)
    step3 = [
        ("ational", "ate"), ("tional", "tion"), ("alize", "al"),
        ("icate", "ic"), ("iciti", "ic"), ("ative", ""),
        ("ical", "ic"), ("ness", ""), ("ful", ""),
    ]
    for suf, repl in step3:
        if word.endswith(suf):
            if len(word) - len(suf) >= r1:
                if suf == "ative":
                    if len(word) - len(suf) >= r2:
                        word = word[: -len(suf)]
                else:
                    word = word[: -len(suf)] + repl
            break

    # step 4 (suffix in R2)
    step4 = [
        "ement", "ance", "ence", "able", "ible", "ment",
        "ant", "ent", "ism", "ate", "iti", "ous", "ive", "ize",
        "ion", "al", "er", "ic",
    ]
    for suf in step4:
        if word.endswith(suf):
            if len(word) - len(suf) >= r2:
                if suf == "ion":
                    if len(word) > 3 and word[-4] in "st":
                        word = word[:-3]
                else:
                    word = word[: -len(suf)]
            break

    # step 5
    if word.endswith("e"):
        if len(word) - 1 >= r2 or (
            len(word) - 1 >= r1 and not _ends_short_syllable(word[:-1])
        ):
            word = word[:-1]
    elif word.endswith("l"):
        if len(word) - 1 >= r2 and len(word) > 1 and word[-2] == "l":
            word = word[:-1]

    return word.replace("Y", "y")


def _i18n(name: str, module: str = "stemmers_i18n"):
    """Lazy import so the (large) multilingual modules only load when a
    non-English stemmer is actually requested."""
    def resolve(word: str) -> str:
        import importlib

        mod = importlib.import_module(f"qdrant_spark.functions.{module}")
        return getattr(mod, name)(word)

    resolve.__name__ = name
    return resolve


def _i18n2(name: str):
    return _i18n(name, module="stemmers_i18n2")


_STEMMERS = {
    "english": snowball_en, "en": snowball_en,
    "german": _i18n("snowball_de"), "de": _i18n("snowball_de"),
    "french": _i18n("snowball_fr"), "fr": _i18n("snowball_fr"),
    "spanish": _i18n("snowball_es"), "es": _i18n("snowball_es"),
    "portuguese": _i18n("snowball_pt"), "pt": _i18n("snowball_pt"),
    "italian": _i18n("snowball_it"), "it": _i18n("snowball_it"),
    "dutch": _i18n("snowball_nl"), "nl": _i18n("snowball_nl"),
    "swedish": _i18n("snowball_sv"), "sv": _i18n("snowball_sv"),
    "russian": _i18n("snowball_ru"), "ru": _i18n("snowball_ru"),
    "danish": _i18n2("snowball_da"), "da": _i18n2("snowball_da"),
    "norwegian": _i18n2("snowball_no"), "no": _i18n2("snowball_no"),
    "finnish": _i18n2("snowball_fi"), "fi": _i18n2("snowball_fi"),
    "romanian": _i18n2("snowball_ro"), "ro": _i18n2("snowball_ro"),
    "hungarian": _i18n2("snowball_hu"), "hu": _i18n2("snowball_hu"),
    "turkish": _i18n2("snowball_tr"), "tr": _i18n2("snowball_tr"),
    "greek": _i18n2("snowball_el"), "el": _i18n2("snowball_el"),
    "arabic": _i18n("snowball_ar", "stemmers_i18n3"),
    "ar": _i18n("snowball_ar", "stemmers_i18n3"),
    "tamil": _i18n("snowball_ta", "stemmers_i18n3"),
    "ta": _i18n("snowball_ta", "stemmers_i18n3"),
    "armenian": _i18n("snowball_hy", "stemmers_i18n3"),
    "hy": _i18n("snowball_hy", "stemmers_i18n3"),
}


def get_stemmer(language: str):
    """Resolve a SnowballLanguage name -> stem function; raises on
    unsupported languages instead of silently passing tokens through
    (SnowballLanguage, lib/segment/src/data_types/index.rs:354-420)."""
    fn = _STEMMERS.get(language.lower())
    if fn is None:
        langs = sorted({k for k in _STEMMERS if len(k) > 2})
        raise ValueError(
            f"unsupported snowball language {language!r}; "
            f"supported: {', '.join(langs)}"
        )
    return fn
