"""Snowball stemmers beyond English, pure Python.

Parity target: the reference's multilingual text-index stemming —
``SnowballLanguage`` -> ``rust_stemmers::Algorithm`` (lib/segment/src/
data_types/index.rs:354-420, dispatch in lib/segment/src/index/
field_index/full_text_index/tokenizers/stemmer.rs). Each function below
implements the corresponding published Snowball algorithm from scratch
(snowballstem.org specifications, which are public documents); no code is
derived from the reference or from any stemming library.

Covered: german, french, spanish, portuguese, italian, dutch, swedish,
russian — the reference's most-used set beyond English. All functions
take an already-lowercased token and return its stem, mirroring
``stemmer.snowball_en``.

Implementation conventions shared by all languages:

- ``R1``/``R2`` are the standard Snowball regions: R1 = after the first
  non-vowel following a vowel; R2 = the same rule applied inside R1.
- ``RV`` is language-specific (defined per the spec where used).
- "delete if in R1" tests that the *suffix start* offset >= region start.
- Longest-match among suffix groups is implemented by sorting candidate
  suffixes by length descending within each ``among`` block.
"""

from __future__ import annotations

from functools import lru_cache

# ---------------------------------------------------------------------------
# helpers
# ---------------------------------------------------------------------------


def _r_standard(word: str, vowels: str, start: int = 0) -> int:
    """Offset of the standard region start: after the first non-vowel that
    follows a vowel, scanning from ``start``."""
    n = len(word)
    for i in range(start + 1, n):
        if word[i] not in vowels and word[i - 1] in vowels:
            return i + 1
    return n


def _r1_r2(word: str, vowels: str) -> tuple[int, int]:
    r1 = _r_standard(word, vowels)
    r2 = _r_standard(word, vowels, r1)
    return r1, r2


def _longest(word: str, sufs) -> str | None:
    """Longest suffix of ``word`` among ``sufs`` (None if no match)."""
    best = None
    for s in sufs:
        if word.endswith(s) and (best is None or len(s) > len(best)):
            best = s
    return best


# ---------------------------------------------------------------------------
# German  (snowballstem.org/algorithms/german/stemmer.html)
# ---------------------------------------------------------------------------

_DE_VOWELS = "aeiouyäöü"
_DE_S_END = "bdfghklmnrt"
_DE_ST_END = "bdfghklmnt"


@lru_cache(maxsize=65536)
def snowball_de(word: str) -> str:
    word = word.replace("ß", "ss")
    # u/y between vowels are consonants -> mark uppercase
    chars = list(word)
    for i in range(1, len(chars) - 1):
        if chars[i] in "uy" and chars[i - 1] in _DE_VOWELS and chars[i + 1] in _DE_VOWELS:
            chars[i] = chars[i].upper()
    word = "".join(chars)
    vowels = _DE_VOWELS
    r1, r2 = _r1_r2(word, vowels)
    r1 = max(r1, 3) if len(word) >= 3 else r1  # region before R1 >= 3 letters

    def in_r1(pos: int) -> bool:
        return pos >= r1

    def in_r2(pos: int) -> bool:
        return pos >= r2

    # step 1
    m = _longest(word, ("em", "ern", "er", "e", "en", "es", "s"))
    if m:
        cut = len(word) - len(m)
        if m == "s":
            if in_r1(cut) and cut > 0 and word[cut - 1] in _DE_S_END:
                word = word[:cut]
        elif m in ("e", "en", "es"):
            if in_r1(cut):
                word = word[:cut]
                # ...nisse -> ...nis (undouble the s of -niss-)
                if word.endswith("niss"):
                    word = word[:-1]
        else:  # em / ern / er
            if in_r1(cut):
                word = word[:cut]

    # step 2
    m = _longest(word, ("en", "er", "est", "st"))
    if m:
        cut = len(word) - len(m)
        if m == "st":
            if in_r1(cut) and cut > 3 and word[cut - 1] in _DE_ST_END:
                word = word[:cut]
        else:
            if in_r1(cut):
                word = word[:cut]

    # step 3 (d-suffixes)
    m = _longest(word, ("end", "ung", "ig", "ik", "isch", "lich", "heit", "keit"))
    if m:
        cut = len(word) - len(m)
        if m in ("end", "ung"):
            if in_r2(cut):
                word = word[:cut]
                if word.endswith("ig") and not word.endswith("eig") \
                        and in_r2(len(word) - 2):
                    word = word[:-2]
        elif m in ("ig", "ik", "isch"):
            if in_r2(cut) and not (cut > 0 and word[cut - 1] == "e"):
                word = word[:cut]
        elif m in ("lich", "heit"):
            if in_r2(cut):
                word = word[:cut]
                for pre in ("er", "en"):
                    if word.endswith(pre) and in_r1(len(word) - 2):
                        word = word[:-2]
                        break
        elif m == "keit":
            if in_r2(cut):
                word = word[:cut]
                if word.endswith("lich") and in_r2(len(word) - 4):
                    word = word[:-4]
                elif word.endswith("ig") and in_r2(len(word) - 2):
                    word = word[:-2]

    word = word.replace("U", "u").replace("Y", "y")
    return (word.replace("ä", "a").replace("ö", "o").replace("ü", "u"))


# ---------------------------------------------------------------------------
# Swedish  (snowballstem.org/algorithms/swedish/stemmer.html)
# ---------------------------------------------------------------------------

_SV_VOWELS = "aeiouyäåö"
_SV_S_END = "bcdfghjklmnoprtvy"
_SV_STEP1 = (
    "heterna", "hetens", "heter", "heten", "anden", "arnas", "ernas",
    "ornas", "andes", "arens", "andet", "arna", "erna", "orna", "ande",
    "arne", "aste", "aren", "ades", "erns", "ade", "are", "ern", "ens",
    "het", "ast", "ad", "en", "ar", "er", "or", "as", "es", "at", "a", "e",
)
_SV_STEP3 = ("lig", "els", "ig")


@lru_cache(maxsize=65536)
def snowball_sv(word: str) -> str:
    r1 = _r_standard(word, _SV_VOWELS)
    r1 = max(r1, 3) if len(word) >= 3 else r1

    # step 1
    m = _longest(word, _SV_STEP1 + ("s",))
    if m:
        cut = len(word) - len(m)
        if cut >= r1:
            if m == "s":
                if cut > 0 and word[cut - 1] in _SV_S_END:
                    word = word[:cut]
            else:
                word = word[:cut]

    # step 2: undouble some final consonant pairs
    for pair in ("dd", "gd", "nn", "dt", "gt", "kt", "tt"):
        if word.endswith(pair) and len(word) - 2 >= r1:
            word = word[:-1]
            break

    # step 3
    m = _longest(word, _SV_STEP3 + ("löst", "fullt"))
    if m:
        cut = len(word) - len(m)
        if cut >= r1:
            if m == "löst":
                word = word[:-1]  # löst -> lös
            elif m == "fullt":
                word = word[:-1]  # fullt -> full
            else:
                word = word[:cut]
    return word


# ---------------------------------------------------------------------------
# Dutch  (snowballstem.org/algorithms/dutch/stemmer.html)
# ---------------------------------------------------------------------------

_NL_VOWELS = "aeiouyè"


def _nl_undouble(word: str) -> str:
    for pair in ("kk", "dd", "tt"):
        if word.endswith(pair):
            return word[:-1]
    return word


@lru_cache(maxsize=65536)
def snowball_nl(word: str) -> str:
    # drop umlauts and acutes
    tr = str.maketrans("äëïöüáéíóú", "aeiouaeiou")
    word = word.translate(tr)
    # mark consonant i/y: initial y, y after vowel, i between vowels
    chars = list(word)
    n = len(chars)
    for i, ch in enumerate(chars):
        if ch == "y" and (i == 0 or chars[i - 1] in _NL_VOWELS):
            chars[i] = "Y"
        elif ch == "i" and 0 < i < n - 1 and chars[i - 1] in _NL_VOWELS \
                and chars[i + 1] in _NL_VOWELS:
            chars[i] = "I"
    word = "".join(chars)
    r1, r2 = _r1_r2(word, _NL_VOWELS)
    r1 = max(r1, 3) if len(word) >= 3 else r1

    def del_en(w: str) -> str:
        """Delete en/ene if in R1 and preceded by a non-vowel that is not
        part of 'gem'; then undouble."""
        for suf in ("ene", "en"):
            if w.endswith(suf):
                cut = len(w) - len(suf)
                if cut >= r1 and cut > 0 and w[cut - 1] not in _NL_VOWELS \
                        and not w[:cut].endswith("gem"):
                    return _nl_undouble(w[:cut])
        return w

    # step 1
    if word.endswith("heden"):
        cut = len(word) - 5
        if cut >= r1:
            word = word[:cut] + "heid"
    else:
        before = word
        word = del_en(word)
        if word == before:
            for suf in ("se", "s"):
                if word.endswith(suf):
                    cut = len(word) - len(suf)
                    if cut >= r1 and cut > 0 \
                            and word[cut - 1] not in _NL_VOWELS + "j":
                        word = word[:cut]
                    break

    # step 2: delete final e if in R1 and preceded by a non-vowel
    e_found = False
    if word.endswith("e") and len(word) - 1 >= r1 and len(word) >= 2 \
            and word[-2] not in _NL_VOWELS:
        e_found = True
        word = _nl_undouble(word[:-1])

    # step 3a: heid
    if word.endswith("heid") and len(word) - 4 >= r2 \
            and (len(word) < 5 or word[-5] != "c"):
        word = word[:-4]
        word = del_en(word)

    # step 3b: d-suffixes
    m = _longest(word, ("end", "ing", "lijk", "baar", "bar", "ig"))
    if m:
        cut = len(word) - len(m)
        if m in ("end", "ing"):
            if cut >= r2:
                word = word[:cut]
                if word.endswith("ig") and len(word) - 2 >= r2 \
                        and (len(word) < 3 or word[-3] != "e"):
                    word = word[:-2]
                else:
                    word = _nl_undouble(word)
        elif m == "ig":
            if cut >= r2 and (cut == 0 or word[cut - 1] != "e"):
                word = word[:cut]
        elif m == "lijk":
            if cut >= r2:
                word = word[:cut]
                # repeat step 2
                if word.endswith("e") and len(word) - 1 >= r1 \
                        and len(word) >= 2 and word[-2] not in _NL_VOWELS:
                    word = _nl_undouble(word[:-1])
        elif m == "baar":
            if cut >= r2:
                word = word[:cut]
        elif m == "bar":
            if cut >= r2 and e_found:
                word = word[:cut]

    # step 4: undouble vowel — C v v C (last consonant not I) -> C v C
    if len(word) >= 4:
        a, b, c, d = word[-4], word[-3], word[-2], word[-1]
        if (a not in _NL_VOWELS and b == c and b in "aeou"
                and d not in _NL_VOWELS and d != "I"):
            word = word[:-2] + word[-1]

    return word.replace("I", "i").replace("Y", "y")


# ---------------------------------------------------------------------------
# Spanish  (snowballstem.org/algorithms/spanish/stemmer.html)
# ---------------------------------------------------------------------------

_ES_VOWELS = "aeiouáéíóúü"


def _rv_romance(word: str, vowels: str) -> int:
    """RV for es/pt/it: if the 2nd letter is a consonant, RV = after the
    next vowel; if the first two letters are vowels, RV = after the next
    consonant; else (C-V start) RV = after the 3rd letter."""
    n = len(word)
    if n < 3:
        return n
    if word[1] not in vowels:
        for i in range(2, n):
            if word[i] in vowels:
                return i + 1
        return n
    if word[0] in vowels and word[1] in vowels:
        for i in range(2, n):
            if word[i] not in vowels:
                return i + 1
        return n
    return 3


_ES_PRON = ("selas", "selos", "sela", "selo", "las", "les", "los", "nos",
            "me", "se", "la", "le", "lo")
_ES_STEP1_DEL_R2 = (
    "amientos", "imientos", "amiento", "imiento", "anzas", "ismos",
    "ables", "ibles", "istas", "anza", "icos", "icas", "ismo", "able",
    "ible", "ista", "osos", "osas", "ico", "ica", "oso", "osa",
)
_ES_STEP2B = (
    "aríamos", "eríamos", "iríamos", "iéramos", "iésemos", "aríais",
    "aremos", "eríais", "eremos", "iríais", "iremos", "ierais", "ieseis",
    "asteis", "isteis", "ábamos", "áramos", "ásemos", "arían", "arías",
    "aréis", "erían", "erías", "eréis", "irían", "irías", "iréis",
    "ieran", "iesen", "ieron", "iendo", "ieras", "ieses", "abais",
    "arais", "aseis", "íamos", "arán", "arás", "aría", "erán", "erás",
    "ería", "irán", "irás", "iría", "iera", "iese", "aste", "iste",
    "aban", "aran", "asen", "aron", "ando", "abas", "adas", "idas",
    "aras", "ases", "íais", "ados", "idos", "amos", "imos", "ará",
    "aré", "erá", "eré", "irá", "iré", "aba", "ada", "ida", "ara",
    "ase", "ían", "ado", "ido", "ías", "áis", "ía", "ad", "ed", "id",
    "an", "ió", "ar", "er", "ir", "as", "ís",
)


@lru_cache(maxsize=65536)
def snowball_es(word: str) -> str:
    vowels = _ES_VOWELS
    rv = _rv_romance(word, vowels)
    r1, r2 = _r1_r2(word, vowels)
    deacc = str.maketrans("áéíóú", "aeiou")

    # step 0: attached pronoun
    m = _longest(word, _ES_PRON)
    if m:
        cut = len(word) - len(m)
        stem = word[:cut]
        g = _longest(stem, ("iéndo", "ándo", "ár", "ér", "ír",
                            "ando", "iendo", "ar", "er", "ir", "yendo"))
        if g:
            gcut = len(stem) - len(g)
            if g == "yendo":
                if gcut > 0 and stem[gcut - 1] == "u" and gcut >= rv:
                    word = stem
            elif g in ("iéndo", "ándo", "ár", "ér", "ír"):
                if gcut >= rv:
                    word = stem[:gcut] + g.translate(deacc)
            else:
                if gcut >= rv:
                    word = stem

    did1 = False
    n0 = word

    # step 1: standard suffix removal
    m = _longest(word, _ES_STEP1_DEL_R2 + (
        "aciones", "adoras", "adores", "ancias", "adora", "ación", "antes",
        "ancia", "ador", "ante", "logías", "logía", "uciones", "ución",
        "encias", "encia", "amente", "mente", "idades", "idad",
        "ivas", "ivos", "iva", "ivo",
    ))
    if m:
        cut = len(word) - len(m)
        if m in _ES_STEP1_DEL_R2:
            if cut >= r2:
                word = word[:cut]
        elif m in ("adora", "ador", "ación", "adoras", "adores", "aciones",
                   "ante", "antes", "ancia", "ancias"):
            if cut >= r2:
                word = word[:cut]
                if word.endswith("ic") and len(word) - 2 >= r2:
                    word = word[:-2]
        elif m in ("logía", "logías"):
            if cut >= r2:
                word = word[:cut] + "log"
        elif m in ("ución", "uciones"):
            if cut >= r2:
                word = word[:cut] + "u"
        elif m in ("encia", "encias"):
            if cut >= r2:
                word = word[:cut] + "ente"
        elif m == "amente":
            if cut >= r1:
                word = word[:cut]
                if word.endswith("iv") and len(word) - 2 >= r2:
                    word = word[:-2]
                    if word.endswith("at") and len(word) - 2 >= r2:
                        word = word[:-2]
                else:
                    for pre in ("os", "ic", "ad"):
                        if word.endswith(pre) and len(word) - 2 >= r2:
                            word = word[:-2]
                            break
        elif m == "mente":
            if cut >= r2:
                word = word[:cut]
                for pre in ("ante", "able", "ible"):
                    if word.endswith(pre) and len(word) - 4 >= r2:
                        word = word[:-4]
                        break
        elif m in ("idad", "idades"):
            if cut >= r2:
                word = word[:cut]
                for pre in ("abil", "ic", "iv"):
                    if word.endswith(pre) and len(word) - len(pre) >= r2:
                        word = word[: -len(pre)]
                        break
        elif m in ("iva", "ivo", "ivas", "ivos"):
            if cut >= r2:
                word = word[:cut]
                if word.endswith("at") and len(word) - 2 >= r2:
                    word = word[:-2]
    did1 = word != n0

    if not did1:
        # step 2a: verb suffixes beginning with y (preceded by u)
        m = _longest(word, ("yeron", "yendo", "yamos", "yais", "yan",
                            "yen", "yas", "yes", "ya", "ye", "yo", "yó"))
        if m:
            cut = len(word) - len(m)
            if cut >= rv and cut > 0 and word[cut - 1] == "u":
                word = word[:cut]
        if word == n0:
            # step 2b: other verb suffixes
            m = _longest(word, _ES_STEP2B + ("en", "es", "éis", "emos"))
            if m:
                cut = len(word) - len(m)
                if cut >= rv:
                    word = word[:cut]
                    if m in ("en", "es", "éis", "emos") \
                            and word.endswith("gu"):
                        word = word[:-1]

    # step 3: residual suffix
    m = _longest(word, ("os", "a", "o", "á", "í", "ó", "e", "é"))
    if m:
        cut = len(word) - len(m)
        if cut >= rv:
            if m in ("e", "é"):
                word = word[:cut]
                if word.endswith("gu") and len(word) - 1 >= rv:
                    word = word[:-1]
            else:
                word = word[:cut]

    return word.translate(deacc)


# ---------------------------------------------------------------------------
# Portuguese  (snowballstem.org/algorithms/portuguese/stemmer.html)
# ---------------------------------------------------------------------------

_PT_VOWELS = "aeiouáéíóúâêô"
_PT_STEP1_DEL_R2 = (
    "amentos", "imentos", "amento", "imento", "adoras", "adores", "aço~es",
    "ismos", "istas", "adora", "aça~o", "antes", "ância", "ezas", "icos",
    "icas", "ismo", "ável", "ível", "ista", "osos", "osas", "ador", "ante",
    "eza", "ico", "ica", "oso", "osa",
)
_PT_STEP2 = (
    "aríamos", "eríamos", "iríamos", "ássemos", "êssemos", "íssemos",
    "aríeis", "eríeis", "iríeis", "ásseis", "ésseis", "ísseis", "áramos",
    "éramos", "íramos", "ávamos", "aremos", "eremos", "iremos", "ariam",
    "eriam", "iriam", "assem", "essem", "issem", "ara~o", "era~o", "ira~o",
    "arias", "erias", "irias", "ardes", "erdes", "irdes", "asses", "esses",
    "isses", "astes", "estes", "istes", "áreis", "areis", "éreis", "ereis",
    "íreis", "ireis", "aria", "eria", "iria", "asse", "esse", "isse",
    "aste", "este", "iste", "arei", "erei", "irei", "aram", "eram", "iram",
    "avam", "arem", "erem", "irem", "ando", "endo", "indo", "adas", "idas",
    "arás", "aras", "erás", "eras", "irás", "avas", "ares", "eres", "ires",
    "íamos", "íeis", "ados", "idos", "ámos", "amos", "emos", "imos",
    "iras", "ada", "ida", "ará", "ara", "erá", "era", "irá", "ava",
    "iam", "ado", "ido", "ias", "ais", "eis", "ira", "ia", "ei", "am",
    "em", "ar", "er", "ir", "as", "es", "is", "eu", "iu", "ou",
)


@lru_cache(maxsize=65536)
def snowball_pt(word: str) -> str:
    word = word.replace("ã", "a~").replace("õ", "o~")
    vowels = _PT_VOWELS
    rv = _rv_romance(word, vowels)
    r1, r2 = _r1_r2(word, vowels)

    n0 = word
    # step 1: standard suffix removal
    m = _longest(word, _PT_STEP1_DEL_R2 + (
        "logias", "logia", "uço~es", "uça~o", "ências", "ência", "amente",
        "mente", "idades", "idade", "ivas", "ivos", "iva", "ivo",
        "iras", "ira",
    ))
    if m:
        cut = len(word) - len(m)
        if m in _PT_STEP1_DEL_R2:
            # unlike Spanish, the Portuguese spec has NO 'ic' follow-up
            # after the ador/ação/ante group — plain R2 delete
            if cut >= r2:
                word = word[:cut]
        elif m in ("logia", "logias"):
            if cut >= r2:
                word = word[:cut] + "log"
        elif m in ("uça~o", "uço~es"):
            if cut >= r2:
                word = word[:cut] + "u"
        elif m in ("ência", "ências"):
            if cut >= r2:
                word = word[:cut] + "ente"
        elif m == "amente":
            if cut >= r1:
                word = word[:cut]
                if word.endswith("iv") and len(word) - 2 >= r2:
                    word = word[:-2]
                    if word.endswith("at") and len(word) - 2 >= r2:
                        word = word[:-2]
                else:
                    for pre in ("os", "ic", "ad"):
                        if word.endswith(pre) and len(word) - 2 >= r2:
                            word = word[:-2]
                            break
        elif m == "mente":
            if cut >= r2:
                word = word[:cut]
                for pre in ("ante", "avel", "ível"):
                    if word.endswith(pre) and len(word) - 4 >= r2:
                        word = word[:-4]
                        break
        elif m in ("idade", "idades"):
            if cut >= r2:
                word = word[:cut]
                for pre in ("abil", "ic", "iv"):
                    if word.endswith(pre) and len(word) - len(pre) >= r2:
                        word = word[: -len(pre)]
                        break
        elif m in ("iva", "ivo", "ivas", "ivos"):
            if cut >= r2:
                word = word[:cut]
                if word.endswith("at") and len(word) - 2 >= r2:
                    word = word[:-2]
        elif m in ("ira", "iras"):
            if cut >= rv and cut > 0 and word[cut - 1] == "e":
                word = word[:cut] + "ir"
    did1 = word != n0

    did2 = False
    if not did1:
        m = _longest(word, _PT_STEP2)
        if m:
            cut = len(word) - len(m)
            if cut >= rv:
                word = word[:cut]
                did2 = True

    if did1 or did2:
        # step 3
        if word.endswith("i") and len(word) - 1 >= rv and len(word) >= 2 \
                and word[-2] == "c":
            word = word[:-1]
    else:
        # step 4: residual suffix
        m = _longest(word, ("os", "a", "i", "o", "á", "í", "ó"))
        if m:
            cut = len(word) - len(m)
            if cut >= rv:
                word = word[:cut]

    # step 5
    if word and word[-1] in "eéê":
        if len(word) - 1 >= rv:
            word = word[:-1]
            if word.endswith("gu") and len(word) - 1 >= rv:
                word = word[:-1]
            elif word.endswith("ci") and len(word) - 1 >= rv:
                word = word[:-1]
    elif word.endswith("ç"):
        word = word[:-1] + "c"

    return word.replace("a~", "ã").replace("o~", "õ")


# ---------------------------------------------------------------------------
# Italian  (snowballstem.org/algorithms/italian/stemmer.html)
# ---------------------------------------------------------------------------

_IT_VOWELS = "aeiouàèìòù"
_IT_PRON = (
    "gliela", "gliele", "glieli", "glielo", "gliene", "sene", "mela",
    "mele", "meli", "melo", "mene", "tela", "tele", "teli", "telo", "tene",
    "cela", "cele", "celi", "celo", "cene", "vela", "vele", "veli", "velo",
    "vene", "gli", "ci", "la", "le", "li", "lo", "mi", "ne", "si", "ti",
    "vi",
)
_IT_STEP1_DEL_R2 = (
    "atrici", "atrice", "mente", "anza", "anze", "iche", "ichi", "ismo",
    "ismi", "abile", "abili", "ibile", "ibili", "ista", "iste", "isti",
    "istà", "istè", "istì", "ante", "anti", "oso", "osi", "osa", "ose",
    "ico", "ici", "ica", "ice",
)
_IT_STEP2 = (
    "erebbero", "irebbero", "assero", "assimo", "eranno", "erebbe",
    "eremmo", "ereste", "eresti", "essero", "iranno", "irebbe", "iremmo",
    "ireste", "iresti", "iscano", "iscono", "issero", "arono", "avamo",
    "avano", "avate", "eremo", "erete", "erono", "evamo", "evano",
    "evate", "iremo", "irete", "irono", "ivamo", "ivano", "ivate",
    "ammo", "ando", "asse", "assi", "emmo", "enda", "ende", "endi",
    "endo", "erai", "erei", "iamo", "iate", "immo", "irai", "irei",
    "isca", "isce", "isci", "isco", "ano", "are", "ata", "ate", "ati",
    "ato", "ava", "avi", "avo", "erà", "ere", "erò", "ete", "eva", "evi",
    "evo", "irà", "ire", "irò", "ita", "ite", "iti", "ito", "iva", "ivi",
    "ivo", "ono", "uta", "ute", "uti", "uto", "ar", "ir",
)


@lru_cache(maxsize=65536)
def snowball_it(word: str) -> str:
    # normalize acute accents to grave; mark consonant u/i after q /
    # between vowels
    tr = str.maketrans("áéíóú", "àèìòù")
    word = word.translate(tr)
    chars = list(word)
    n = len(chars)
    for i in range(1, n):
        if chars[i] == "u" and chars[i - 1] == "q":
            chars[i] = "U"
        elif chars[i] in "ui" and 0 < i < n - 1 \
                and chars[i - 1] in _IT_VOWELS and chars[i + 1] in _IT_VOWELS:
            chars[i] = chars[i].upper()
    word = "".join(chars)
    vowels = _IT_VOWELS
    rv = _rv_romance(word, vowels)
    r1, r2 = _r1_r2(word, vowels)

    # step 0: attached pronoun
    m = _longest(word, _IT_PRON)
    if m:
        cut = len(word) - len(m)
        stem = word[:cut]
        g = _longest(stem, ("ando", "endo", "ar", "er", "ir"))
        if g:
            gcut = len(stem) - len(g)
            if gcut >= rv:
                if g in ("ando", "endo"):
                    word = stem
                else:
                    word = stem + "e"

    n0 = word
    # step 1
    m = _longest(word, _IT_STEP1_DEL_R2 + (
        "azioni", "azione", "atori", "atore", "logia", "logie", "uzione",
        "uzioni", "usione", "usioni", "enza", "enze", "amento", "amenti",
        "imento", "imenti", "amente", "ità", "ivo", "ivi", "iva", "ive",
    ))
    if m:
        cut = len(word) - len(m)
        if m == "amente":
            if cut >= r1:
                word = word[:cut]
                if word.endswith("iv") and len(word) - 2 >= r2:
                    word = word[:-2]
                    if word.endswith("at") and len(word) - 2 >= r2:
                        word = word[:-2]
                else:
                    for pre in ("os", "ic", "abil"):
                        if word.endswith(pre) and len(word) - len(pre) >= r2:
                            word = word[: -len(pre)]
                            break
        elif m in ("amento", "amenti", "imento", "imenti"):
            if cut >= rv:
                word = word[:cut]
        elif m in _IT_STEP1_DEL_R2:
            if cut >= r2:
                word = word[:cut]
        elif m in ("azione", "azioni", "atore", "atori"):
            if cut >= r2:
                word = word[:cut]
                if word.endswith("ic") and len(word) - 2 >= r2:
                    word = word[:-2]
        elif m in ("logia", "logie"):
            if cut >= r2:
                word = word[:cut] + "log"
        elif m in ("uzione", "uzioni", "usione", "usioni"):
            if cut >= r2:
                word = word[:cut] + "u"
        elif m in ("enza", "enze"):
            if cut >= r2:
                word = word[:cut] + "ente"
        elif m == "ità":
            if cut >= r2:
                word = word[:cut]
                for pre in ("abil", "ic", "iv"):
                    if word.endswith(pre) and len(word) - len(pre) >= r2:
                        word = word[: -len(pre)]
                        break
        elif m in ("ivo", "ivi", "iva", "ive"):
            if cut >= r2:
                word = word[:cut]
                if word.endswith("at") and len(word) - 2 >= r2:
                    word = word[:-2]
                    if word.endswith("ic") and len(word) - 2 >= r2:
                        word = word[:-2]
    did1 = word != n0

    if not did1:
        m = _longest(word, _IT_STEP2)
        if m and len(word) - len(m) >= rv:
            word = word[: -len(m)]

    # step 3a: final vowel
    if word and word[-1] in "aeioàèìò" and len(word) - 1 >= rv:
        word = word[:-1]
        if word.endswith("i") and len(word) - 1 >= rv:
            word = word[:-1]
    # step 3b
    if (word.endswith("ch") or word.endswith("gh")) and len(word) - 1 >= rv:
        word = word[:-1]

    return word.replace("I", "i").replace("U", "u")


# ---------------------------------------------------------------------------
# French  (snowballstem.org/algorithms/french/stemmer.html)
# ---------------------------------------------------------------------------

_FR_VOWELS = "aeiouyâàëéêèïîôûù"


@lru_cache(maxsize=65536)
def snowball_fr(word: str) -> str:
    vowels = _FR_VOWELS
    # mark consonant u/i/y: u,i between vowels; y next to a vowel; u after q
    chars = list(word)
    n = len(chars)
    for i in range(n):
        ch = chars[i]
        if ch in "ui" and 0 < i < n - 1 and chars[i - 1].lower() in vowels \
                and chars[i + 1].lower() in vowels:
            chars[i] = ch.upper()
        elif ch == "u" and i > 0 and chars[i - 1] == "q":
            chars[i] = "U"
        elif ch == "y" and ((i > 0 and chars[i - 1].lower() in vowels)
                            or (i < n - 1 and chars[i + 1].lower() in vowels)):
            chars[i] = "Y"
    word = "".join(chars)

    def is_v(c: str) -> bool:
        return c in vowels  # marked consonants are uppercase -> not vowels

    # RV: after 3rd letter if word starts with two vowels or par/col/tap;
    # else after the first vowel not at word start
    nn = len(word)
    rv = nn
    if nn >= 3 and is_v(word[0]) and is_v(word[1]):
        rv = 3
    elif word[:3] in ("par", "col", "tap"):
        rv = 3
    else:
        for i in range(1, nn):
            if is_v(word[i]):
                rv = i + 1
                break
    r1, r2 = _r1_r2(word, vowels)

    n0 = word
    ment_found = False

    # ---- step 1: standard suffix removal
    m = _longest(word, (
        "issements", "issement", "atrices", "atrice", "ateurs", "ations",
        "ateur", "ation", "usions", "utions", "usion", "ution", "ances",
        "iqUes", "ismes", "ables", "istes", "ance", "iqUe", "isme", "able",
        "iste", "ences", "ence", "ements", "ement", "ités", "ité", "ifs",
        "ives", "if", "ive", "eaux", "aux", "euses", "euse", "amment",
        "emment", "ments", "ment", "logies", "logie", "eux",
    ))
    if m:
        cut = len(word) - len(m)
        if m in ("ance", "iqUe", "isme", "able", "iste", "eux", "ances",
                 "iqUes", "ismes", "ables", "istes"):
            if cut >= r2:
                word = word[:cut]
        elif m in ("atrice", "ateur", "ation", "atrices", "ateurs",
                   "ations"):
            if cut >= r2:
                word = word[:cut]
                if word.endswith("ic"):
                    if len(word) - 2 >= r2:
                        word = word[:-2]
                    else:
                        word = word[:-2] + "iqU"
        elif m in ("logie", "logies"):
            if cut >= r2:
                word = word[:cut] + "log"
        elif m in ("usion", "ution", "usions", "utions"):
            if cut >= r2:
                word = word[:cut] + "u"
        elif m in ("ence", "ences"):
            if cut >= r2:
                word = word[:cut] + "ent"
        elif m in ("ement", "ements"):
            if cut >= rv:
                word = word[:cut]
                if word.endswith("iv") and len(word) - 2 >= r2:
                    word = word[:-2]
                    if word.endswith("at") and len(word) - 2 >= r2:
                        word = word[:-2]
                elif word.endswith("eus"):
                    if len(word) - 3 >= r2:
                        word = word[:-3]
                    elif len(word) - 3 >= r1:
                        word = word[:-3] + "eux"
                elif word.endswith("abl") and len(word) - 3 >= r2:
                    word = word[:-3]
                elif word.endswith("iqU") and len(word) - 3 >= r2:
                    word = word[:-3]
                elif word.endswith("ièr") and len(word) - 3 >= rv:
                    word = word[:-3] + "i"
                elif word.endswith("Ièr") and len(word) - 3 >= rv:
                    word = word[:-3] + "i"
        elif m in ("ité", "ités"):
            if cut >= r2:
                word = word[:cut]
                if word.endswith("abil"):
                    if len(word) - 4 >= r2:
                        word = word[:-4]
                    else:
                        word = word[:-4] + "abl"
                elif word.endswith("ic"):
                    if len(word) - 2 >= r2:
                        word = word[:-2]
                    else:
                        word = word[:-2] + "iqU"
                elif word.endswith("iv") and len(word) - 2 >= r2:
                    word = word[:-2]
        elif m in ("if", "ive", "ifs", "ives"):
            if cut >= r2:
                word = word[:cut]
                if word.endswith("at") and len(word) - 2 >= r2:
                    word = word[:-2]
                    if word.endswith("ic"):
                        if len(word) - 2 >= r2:
                            word = word[:-2]
                        else:
                            word = word[:-2] + "iqU"
        elif m == "eaux":
            word = word[:cut] + "eau"
        elif m == "aux":
            if cut >= r1:
                word = word[:cut] + "al"
        elif m in ("euse", "euses"):
            if cut >= r2:
                word = word[:cut]
            elif cut >= r1:
                word = word[:cut] + "eux"
        elif m in ("issement", "issements"):
            if cut >= r1 and cut > 0 and not is_v(word[cut - 1]):
                word = word[:cut]
        elif m == "amment":
            if cut >= rv:
                word = word[:cut] + "ant"
                ment_found = True
        elif m == "emment":
            if cut >= rv:
                word = word[:cut] + "ent"
                ment_found = True
        elif m in ("ment", "ments"):
            # delete if preceded by a vowel in RV (vowel kept)
            if cut > 0 and is_v(word[cut - 1]) and cut - 1 >= rv:
                word = word[:cut]
                ment_found = True
    did1 = word != n0

    did2 = False
    if (not did1) or ment_found:
        # ---- step 2a: verb suffixes beginning i (preceded by non-vowel
        # in RV)
        base = word
        m = _longest(word, (
            "issaIent", "issantes", "iraIent", "issante", "issants",
            "issions", "irions", "issais", "issait", "issant", "issent",
            "issiez", "issons", "irais", "irait", "irent", "iriez",
            "irons", "iront", "isses", "issez", "îmes", "îtes", "irai",
            "iras", "irez", "isse", "ies", "ira", "ît", "ie", "ir", "is",
            "it", "i",
        ))
        if m:
            cut = len(word) - len(m)
            if cut >= rv and cut > 0 and not is_v(word[cut - 1]) \
                    and cut - 1 >= rv:
                word = word[:cut]
        did2a = word != base
        if not did2a:
            # ---- step 2b: other verb suffixes
            m = _longest(word, (
                "assions", "eraIent", "erions", "assent", "assiez",
                "èrent", "erais", "erait", "eriez", "erons", "eront",
                "aIent", "antes", "asses", "ions", "erai", "eras", "erez",
                "âmes", "âtes", "ante", "ants", "asse", "ées", "era",
                "iez", "ais", "ait", "ant", "ée", "és", "er", "ez", "ât",
                "ai", "as", "é", "a",
            ))
            if m:
                cut = len(word) - len(m)
                if m == "ions":
                    if cut >= r2 and cut >= rv:
                        word = word[:cut]
                elif m in ("é", "ée", "ées", "és", "èrent", "er", "era",
                           "erai", "eraIent", "erais", "erait", "eras",
                           "erez", "eriez", "erions", "erons", "eront",
                           "ez", "iez"):
                    if cut >= rv:
                        word = word[:cut]
                else:
                    if cut >= rv:
                        word = word[:cut]
                        if word.endswith("e") and len(word) - 1 >= rv:
                            word = word[:-1]
        did2 = word != base

    if did1 or did2:
        # ---- step 3
        if word.endswith("Y"):
            word = word[:-1] + "i"
        elif word.endswith("ç"):
            word = word[:-1] + "c"
    else:
        # ---- step 4: residual suffix
        if word.endswith("s") and len(word) >= 2 \
                and word[-2] not in "aiouès":
            word = word[:-1]
        m = _longest(word, ("Ière", "ière", "Ier", "ier", "ion", "e", "ë"))
        if m:
            cut = len(word) - len(m)
            if m == "ion":
                if cut >= r2 and cut > 0 and word[cut - 1] in "st":
                    word = word[:cut]
            elif m in ("ier", "ière", "Ier", "Ière"):
                word = word[:cut] + "i"
            elif m == "e":
                if cut >= rv:
                    word = word[:cut]
            elif m == "ë":
                if cut >= rv and word[:cut].endswith("gu"):
                    word = word[:cut]

    # ---- step 5: undouble
    for suf in ("enn", "onn", "ett", "ell", "eill"):
        if word.endswith(suf):
            word = word[:-1]
            break

    # ---- step 6: un-accent final é/è followed by non-vowels
    i = len(word) - 1
    seen_nonvowel = False
    while i >= 0:
        c = word[i]
        if c in vowels:
            if c in "éè" and seen_nonvowel:
                word = word[:i] + "e" + word[i + 1:]
            break
        seen_nonvowel = True
        i -= 1

    return word.replace("I", "i").replace("U", "u").replace("Y", "y")


# ---------------------------------------------------------------------------
# Russian  (snowballstem.org/algorithms/russian/stemmer.html)
# ---------------------------------------------------------------------------

_RU_VOWELS = "аеиоуыэюя"
_RU_PERF_GERUND_1 = ("вшись", "вши", "в")  # require preceding а/я
_RU_PERF_GERUND_2 = ("ившись", "ывшись", "ивши", "ывши", "ив", "ыв")
_RU_ADJECTIVE = (
    "ими", "ыми", "его", "ого", "ему", "ому", "ее", "ие", "ые", "ое",
    "ей", "ий", "ый", "ой", "ем", "им", "ым", "ом", "их", "ых", "ую",
    "юю", "ая", "яя", "ою", "ею",
)
_RU_PARTICIPLE_1 = ("ем", "нн", "вш", "ющ", "щ")  # require preceding а/я
_RU_PARTICIPLE_2 = ("ивш", "ывш", "ующ")
_RU_VERB_1 = (  # require preceding а/я
    "ете", "йте", "ешь", "нно", "ла", "на", "ли", "ем", "ло", "но", "ет",
    "ют", "ны", "ть", "й", "л", "н",
)
_RU_VERB_2 = (
    "ейте", "уйте", "ила", "ыла", "ена", "ите", "или", "ыли", "ило",
    "ыло", "ено", "ует", "уют", "ены", "ить", "ыть", "ишь", "ует", "ей",
    "уй", "ил", "ыл", "им", "ым", "ен", "ят", "ит", "ыт", "ую", "ю",
)
_RU_NOUN = (
    "иями", "ями", "ами", "ией", "иям", "ием", "иях", "ию", "ья", "ью",
    "ия", "ям", "ем", "ам", "ом", "ах", "ях", "ии", "еи", "ей", "ой",
    "ий", "ев", "ов", "ие", "ье", "ё", "а", "е", "и", "й", "о", "у",
    "ы", "ь", "ю", "я",
)


@lru_cache(maxsize=65536)
def snowball_ru(word: str) -> str:
    word = word.replace("ё", "е")
    n = len(word)
    rv = n
    for i in range(n):
        if word[i] in _RU_VOWELS:
            rv = i + 1
            break
    _, r2 = _r1_r2(word, _RU_VOWELS)

    def del_in_rv(w: str, sufs, need_ay: bool = False) -> str | None:
        m = _longest(w, sufs)
        if not m:
            return None
        cut = len(w) - len(m)
        if cut < rv:
            return None
        if need_ay:
            if cut == 0 or w[cut - 1] not in "ая" or cut - 1 < rv:
                return None
        return w[:cut]

    # step 1
    out = del_in_rv(word, _RU_PERF_GERUND_2)
    if out is None:
        out = del_in_rv(word, _RU_PERF_GERUND_1, need_ay=True)
    if out is not None:
        word = out
    else:
        # reflexive
        o = del_in_rv(word, ("ся", "сь"))
        if o is not None:
            word = o
        # adjectival
        o = del_in_rv(word, _RU_ADJECTIVE)
        if o is not None:
            word = o
            p = del_in_rv(word, _RU_PARTICIPLE_2)
            if p is None:
                p = del_in_rv(word, _RU_PARTICIPLE_1, need_ay=True)
            if p is not None:
                word = p
        else:
            o = del_in_rv(word, _RU_VERB_2)
            if o is None:
                o = del_in_rv(word, _RU_VERB_1, need_ay=True)
            if o is not None:
                word = o
            else:
                o = del_in_rv(word, _RU_NOUN)
                if o is not None:
                    word = o

    # step 2: final и
    if word.endswith("и") and len(word) - 1 >= rv:
        word = word[:-1]

    # step 3: derivational (ость/ост in R2)
    for suf in ("ость", "ост"):
        if word.endswith(suf) and len(word) - len(suf) >= r2:
            word = word[: -len(suf)]
            break

    # step 4
    if word.endswith("ейше") and len(word) - 4 >= rv:
        word = word[:-4]
    elif word.endswith("ейш") and len(word) - 3 >= rv:
        word = word[:-3]
    if word.endswith("нн") and len(word) - 1 >= rv:
        word = word[:-1]
    elif word.endswith("ь") and len(word) - 1 >= rv:
        word = word[:-1]

    return word
