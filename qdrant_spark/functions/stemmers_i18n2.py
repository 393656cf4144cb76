"""Snowball stemmers, second batch: danish, norwegian, finnish, romanian,
hungarian, turkish, greek (the reference's ``SnowballLanguage`` set,
lib/segment/src/data_types/index.rs:354-420, dispatch in
lib/segment/src/index/field_index/full_text_index/tokenizers/stemmer.rs;
arabic and tamil live in :mod:`stemmers_i18n3`). Each function implements
the corresponding published snowballstem.org algorithm specification from
scratch (public documents); no code is derived from the reference or from
any stemming library.

Conventions follow :mod:`qdrant_spark.functions.stemmers_i18n`:
``_r_standard``/``_longest`` helpers, tokens arrive lowercased, longest
match within an ``among`` block, "delete if in R1" = suffix start offset
>= region start. Where a spec's long tail of rare rules is approximated,
the simplification is noted inline; the invariant the text index relies
on — inflection families conflate to one stem — is what the tests gate.
"""

from __future__ import annotations

from functools import lru_cache

from qdrant_spark.functions.stemmers_i18n import _longest, _r_standard

# ---------------------------------------------------------------------------
# Danish  (snowballstem.org/algorithms/danish/stemmer.html)
# ---------------------------------------------------------------------------

_DA_VOWELS = "aeiouyæøå"
_DA_S_END = "abcdfghjklmnoprtvyzå"
_DA_STEP1 = (
    "hed", "ethed", "ered", "e", "erede", "ende", "erende", "ene", "erne",
    "ere", "en", "heden", "eren", "er", "heder", "erer", "heds", "es",
    "endes", "erendes", "enes", "ernes", "eres", "ens", "hedens", "erens",
    "ers", "ets", "et", "eret",
)


@lru_cache(maxsize=65536)
def snowball_da(word: str) -> str:
    r1 = _r_standard(word, _DA_VOWELS)
    r1 = max(r1, 3) if len(word) >= 3 else r1

    # step 1: longest of the a-suffixes (delete in R1), or s after a
    # valid s-ending
    m = _longest(word, _DA_STEP1 + ("s",))
    if m:
        cut = len(word) - len(m)
        if cut >= r1:
            if m == "s":
                if cut > 0 and word[cut - 1] in _DA_S_END:
                    word = word[:cut]
            else:
                word = word[:cut]

    # step 2: penultimate consonant of gd/dt/gt/kt in R1 -> drop last
    if len(word) >= 2 and word[-2:] in ("gd", "dt", "gt", "kt") \
            and len(word) - 1 >= r1:
        word = word[:-1]

    # step 3: igst -> remove st; then lig/elig/els delete in R1 (and
    # re-run step 2); løst -> løs
    if word.endswith("igst"):
        word = word[:-2]
    m = _longest(word, ("ig", "lig", "elig", "els"))
    if m and len(word) - len(m) >= r1:
        word = word[: -len(m)]
        if len(word) >= 2 and word[-2:] in ("gd", "dt", "gt", "kt") \
                and len(word) - 1 >= r1:
            word = word[:-1]
    elif word.endswith("løst") and len(word) - 1 >= r1:
        word = word[:-1]

    # step 4: undouble a final double consonant in R1
    if (len(word) >= 2 and word[-1] == word[-2]
            and word[-1] not in _DA_VOWELS and len(word) - 1 >= r1):
        word = word[:-1]
    return word


# ---------------------------------------------------------------------------
# Norwegian  (snowballstem.org/algorithms/norwegian/stemmer.html)
# ---------------------------------------------------------------------------

_NO_VOWELS = "aeiouyæøå"
_NO_S_END = "bcdfghjlmnoprtvyz"
_NO_STEP1 = (
    "a", "e", "ede", "ande", "ende", "ane", "ene", "hetene", "en", "heten",
    "ar", "er", "heter", "as", "es", "edes", "endes", "enes", "hetenes",
    "ens", "hetens", "ers", "ets", "et", "het", "ast",
)
_NO_STEP3 = ("leg", "eleg", "ig", "eig", "lig", "elig", "els", "lov",
             "elov", "slov", "hetslov")


@lru_cache(maxsize=65536)
def snowball_no(word: str) -> str:
    r1 = _r_standard(word, _NO_VOWELS)
    r1 = max(r1, 3) if len(word) >= 3 else r1

    # step 1: a-suffixes delete in R1; s after s-ending (or k not
    # preceded by a vowel); erte/ert -> er
    m = _longest(word, _NO_STEP1 + ("s", "erte", "ert"))
    if m:
        cut = len(word) - len(m)
        if cut >= r1:
            if m == "s":
                prev = word[cut - 1] if cut > 0 else ""
                prev2 = word[cut - 2] if cut > 1 else ""
                if prev in _NO_S_END or (prev == "k"
                                         and prev2 not in _NO_VOWELS):
                    word = word[:cut]
            elif m in ("erte", "ert"):
                word = word[:cut] + "er"
            else:
                word = word[:cut]

    # step 2: dt/vt in R1 -> drop last letter
    if len(word) >= 2 and word[-2:] in ("dt", "vt") and len(word) - 1 >= r1:
        word = word[:-1]

    # step 3: delete in R1
    m = _longest(word, _NO_STEP3)
    if m and len(word) - len(m) >= r1:
        word = word[: -len(m)]
    return word

# ---------------------------------------------------------------------------
# Romanian  (snowballstem.org/algorithms/romanian/stemmer.html)
# ---------------------------------------------------------------------------

_RO_VOWELS = "aeiouăâî"

_RO_STEP0 = {  # suffix -> replacement, applied in R1 (longest match)
    "ul": "", "ului": "",
    "aua": "a",
    "ea": "e", "ele": "e", "elor": "e",
    "ii": "i", "iua": "i", "iei": "i", "iile": "i", "iilor": "i",
    "ilor": "i",
    "atei": "at",
    "aţie": "aţi", "aţia": "aţi",
}

_RO_STEP1 = {  # combining suffixes, replaced (repeat until stable), in R1
    "abilitate": "abil", "abilitati": "abil", "abilităi": "abil",
    "abilităţi": "abil",
    "ibilitate": "ibil",
    "ivitate": "iv", "ivitati": "iv", "ivităi": "iv", "ivităţi": "iv",
    "icitate": "ic", "icitati": "ic", "icităi": "ic", "icităţi": "ic",
    "icator": "ic", "icatori": "ic",
    "iciv": "ic", "iciva": "ic", "icive": "ic", "icivi": "ic", "icivă": "ic",
    "ical": "ic", "icala": "ic", "icale": "ic", "icali": "ic", "icală": "ic",
    "ativ": "at", "ativa": "at", "ative": "at", "ativi": "at", "ativă": "at",
    "aţiune": "at", "atoare": "at", "ator": "at", "atori": "at",
    "ătoare": "at", "ător": "at", "ători": "at",
    "itiv": "it", "itiva": "it", "itive": "it", "itivi": "it", "itivă": "it",
    "iţiune": "it", "itoare": "it", "itor": "it", "itori": "it",
}

_RO_STEP2_DEL = (  # standard suffixes, deleted in R2
    "at", "ata", "ată", "ati", "ate",
    "ut", "uta", "ută", "uti", "ute",
    "it", "ita", "ită", "iti", "ite",
    "ic", "ica", "ice", "ici", "ică",
    "abil", "abila", "abile", "abili", "abilă",
    "ibil", "ibila", "ibile", "ibili", "ibilă",
    "oasa", "oasă", "oase", "os", "osi", "oşi",
    "ant", "anta", "ante", "anti", "antă",
    "ator", "atori",
    "itate", "itati", "ităi", "ităţi",
    "iv", "iva", "ive", "ivi", "ivă",
)
_RO_STEP2_IST = ("ism", "isme", "ist", "ista", "iste", "isti", "istă",
                 "işti")
_RO_STEP2_IUNE = ("iune", "iuni")

_RO_VERB = (  # verb suffixes, removed in RV when preceded by a consonant
    # or by "u" (longest match; the spec's full list)
    "are", "ere", "ire", "âre",
    "ind", "ând", "indu", "ându",
    "eze", "ească",
    "ez", "ezi", "ează",
    "esc", "eşti", "eşte", "ăsc", "ăşti", "ăşte",
    "am", "ai", "au",
    "eam", "eai", "ea", "eaţi", "eau",
    "iam", "iai", "ia", "iaţi", "iau",
    "ui", "aşi", "arăm", "arăţi", "ară",
    "uşi", "urăm", "urăţi", "ură",
    "işi", "irăm", "irăţi", "iră",
    "âi", "âşi", "ârăm", "ârăţi", "âră",
    "asem", "aseşi", "ase", "aserăm", "aserăţi", "aseră",
    "isem", "iseşi", "ise", "iserăm", "iserăţi", "iseră",
    "âsem", "âseşi", "âse", "âserăm", "âserăţi", "âseră",
    "usem", "useşi", "use", "userăm", "userăţi", "useră",
)
_RO_VERB2 = (  # removed in RV regardless of the preceding letter
    "a", "u", "i", "e", "ă", "ează",
    "aţi", "eţi", "iţi", "âţi",
    "em", "im", "âm",
    "seşi", "serăm", "serăţi", "seră", "sei", "se",
    "sesem", "seseşi", "sese", "seserăm", "seserăţi", "seseră",
)


def _ro_rv(word: str) -> int:
    """RV per the Romance-language definition: after the first vowel
    following a consonant in positions >=1, or after a leading
    consonant cluster's first vowel pattern."""
    n = len(word)
    if n < 3:
        return n
    if word[1] not in _RO_VOWELS:  # consonant in 2nd position
        for i in range(2, n):
            if word[i] in _RO_VOWELS:
                return i + 1
        return n
    if word[0] in _RO_VOWELS:  # two leading vowels
        for i in range(2, n):
            if word[i] not in _RO_VOWELS:
                return i + 1
        return n
    return 3  # consonant + vowel start


@lru_cache(maxsize=65536)
def snowball_ro(word: str) -> str:
    # normalize comma-below (modern orthography) to the spec's cedilla
    word = (word.replace("ș", "ş").replace("ț", "ţ"))
    # prelude: i/u between vowels are consonants -> mark uppercase
    chars = list(word)
    for i in range(1, len(chars) - 1):
        if chars[i] in "iu" and chars[i - 1] in _RO_VOWELS \
                and chars[i + 1] in _RO_VOWELS:
            chars[i] = chars[i].upper()
    word = "".join(chars)
    low = word.lower()
    r1 = _r_standard(low, _RO_VOWELS)
    r2 = _r_standard(low, _RO_VOWELS, r1)
    rv = _ro_rv(low)

    def _apply_map(w, mapping, region):
        m = _longest(w.lower(), tuple(mapping))
        if m and len(w) - len(m) >= region:
            if m == "ile" and w.lower().endswith("abile"):
                return w, False  # spec: -ile kept after ab (abile -> abil)
            return w[: len(w) - len(m)] + mapping[m], True
        return w, False

    # step 0: plural/article removal
    word, _ = _apply_map(word, _RO_STEP0, r1)
    if word.lower().endswith("ile") and len(word) - 3 >= r1 \
            and not word.lower().endswith("abile"):
        word = word[:-3] + "i"

    # step 1: combining suffixes, repeat until stable
    changed_any = False
    while True:
        word, ch = _apply_map(word, _RO_STEP1, r1)
        if not ch:
            break
        changed_any = True

    # step 2: standard suffixes in R2
    step2_done = False
    m = _longest(word.lower(),
                 _RO_STEP2_DEL + _RO_STEP2_IST + _RO_STEP2_IUNE)
    if m and len(word) - len(m) >= r2:
        cut = len(word) - len(m)
        if m in _RO_STEP2_IUNE:
            if cut > 0 and word[cut - 1] == "ţ":
                word = word[:cut - 1] + "t"
                step2_done = True
        elif m in _RO_STEP2_IST:
            word = word[:cut] + "ist"
            step2_done = True
        else:
            word = word[:cut]
            step2_done = True

    # step 3 (verb suffixes in RV) only when steps 0-2 removed nothing
    if not (changed_any or step2_done):
        m = _longest(word.lower(), _RO_VERB + _RO_VERB2)
        if m and len(word) - len(m) >= rv:
            cut = len(word) - len(m)
            if m in _RO_VERB2 and m not in _RO_VERB:
                word = word[:cut]
            else:
                prev = word[cut - 1].lower() if cut > 0 else ""
                if prev not in _RO_VOWELS or prev == "u":
                    word = word[:cut]

    # step 4: final vowel removal in RV
    m = _longest(word.lower(), ("a", "e", "i", "ie", "ă"))
    if m and len(word) - len(m) >= rv:
        word = word[: len(word) - len(m)]
    return word.lower()

# ---------------------------------------------------------------------------
# Finnish  (snowballstem.org/algorithms/finnish/stemmer.html)
# ---------------------------------------------------------------------------

_FI_VOWELS = "aeiouyäö"
_FI_LONGV = ("aa", "ee", "ii", "oo", "uu", "ää", "öö")


@lru_cache(maxsize=65536)
def snowball_fi(word: str) -> str:
    r1 = _r_standard(word, _FI_VOWELS)
    r2 = _r_standard(word, _FI_VOWELS, r1)

    # step 1: particles. kin/kaan/... delete if preceded by n/t/vowel;
    # sti delete if in R2
    m = _longest(word, ("kin", "kaan", "kään", "ko", "kö", "han", "hän",
                        "pa", "pä", "sti"))
    if m:
        cut = len(word) - len(m)
        if m == "sti":
            if cut >= r2:
                word = word[:cut]
        elif cut >= r1 and cut > 0 and word[cut - 1] in "nt" + _FI_VOWELS:
            word = word[:cut]

    # step 2: possessives in R1
    m = _longest(word, ("si", "ni", "nsa", "nsä", "mme", "nne", "an", "än",
                        "en"))
    if m:
        cut = len(word) - len(m)
        if cut >= r1:
            if m == "si":
                if not (cut > 0 and word[cut - 1] == "k"):
                    word = word[:cut]
            elif m == "ni":
                word = word[:cut]
                if word.endswith("kse"):
                    word = word[:-1] + "i"  # kse -> ksi
            elif m == "an":
                if word[:cut].endswith(("ta", "ssa", "sta", "lla", "lta",
                                        "na")):
                    word = word[:cut]
            elif m == "än":
                if word[:cut].endswith(("tä", "ssä", "stä", "llä", "ltä",
                                        "nä")):
                    word = word[:cut]
            elif m == "en":
                if word[:cut].endswith(("lle", "ine")):
                    word = word[:cut]
            else:
                word = word[:cut]

    # step 3: cases in R1
    removed_step3 = False
    n = len(word)

    def _del(k: int) -> None:
        nonlocal word, removed_step3
        word = word[:-k]
        removed_step3 = True

    hxn = {"ahan": "a", "ehen": "e", "ihin": "i", "ohon": "o", "uhun": "u",
           "yhyn": "y", "ähän": "ä", "öhön": "ö"}
    m4 = word[-4:] if n >= 4 else ""
    if m4 in hxn and n - 3 >= r1:
        _del(3)  # the hXn part (X stays)
    elif word.endswith("seen") and n - 4 >= r1 \
            and word[-6:-4] in _FI_LONGV:
        _del(4)
    elif (word.endswith(("siin", "den", "tten"))
          and (lambda k: n - k >= r1 and n - k >= 2
               and word[n - k - 1] == "i"
               and word[n - k - 2] in _FI_VOWELS)(
              4 if word.endswith(("siin", "tten")) else 3)):
        _del(4 if word.endswith(("siin", "tten")) else 3)
    elif word.endswith("tta") and n - 3 >= r1 and n >= 4 \
            and word[-4] == "e":
        _del(3)
    elif word.endswith("ttä") and n - 3 >= r1 and n >= 4 \
            and word[-4] == "e":
        _del(3)
    else:
        m = _longest(word, ("ta", "tä", "ssa", "ssä", "sta", "stä", "lla",
                            "llä", "lta", "ltä", "lle", "na", "nä", "ksi",
                            "ine"))
        if m and len(word) - len(m) >= r1:
            _del(len(m))
        elif word.endswith(("a", "ä")) and n - 1 >= r1 and n >= 3 \
                and word[-2] in _FI_VOWELS and word[-3] not in _FI_VOWELS:
            _del(1)  # a/ä preceded by consonant+vowel
        elif word.endswith("n") and n - 1 >= r1:
            _del(1)
            if word[-2:] in _FI_LONGV or word.endswith("ie"):
                word = word[:-1]

    # step 4: comparatives/other in R2
    m = _longest(word, ("mpi", "mpa", "mpä", "mmi", "mma", "mmä",
                        "impi", "impa", "impä", "immi", "imma", "immä",
                        "eja", "ejä"))
    if m:
        cut = len(word) - len(m)
        if cut >= r2:
            if m in ("mpi", "mpa", "mpä", "mmi", "mma", "mmä"):
                if not word[:cut].endswith("po"):
                    word = word[:cut]
            else:
                word = word[:cut]

    # step 5: plurals
    if removed_step3:
        if word.endswith(("i", "j")) and len(word) - 1 >= r1:
            word = word[:-1]
    else:
        if word.endswith("t") and len(word) - 1 >= r1 \
                and len(word) >= 2 and word[-2] in _FI_VOWELS:
            word = word[:-1]
            m = _longest(word, ("imma", "mma"))
            if m and len(word) - len(m) >= r2:
                if m == "imma" or not word[: -len(m)].endswith("po"):
                    word = word[: -len(m)]

    # step 6: tidying (all within R1)
    if len(word) >= r1:
        if word[-2:] in _FI_LONGV and len(word) - 1 >= r1:
            word = word[:-1]
        if (len(word) >= 2 and word[-1] in "aäei"
                and word[-2] not in _FI_VOWELS and len(word) - 1 >= r1):
            word = word[:-1]
        if word.endswith(("oj", "uj")) and len(word) - 1 >= r1:
            word = word[:-1]
        if word.endswith("jo") and len(word) - 1 >= r1:
            word = word[:-1]
    # undouble final double consonant (followed by zero or more vowels)
    i = len(word) - 1
    while i >= 0 and word[i] in _FI_VOWELS:
        i -= 1
    if i >= 1 and word[i] not in _FI_VOWELS and word[i] == word[i - 1]:
        word = word[:i] + word[i + 1:]
    return word

# ---------------------------------------------------------------------------
# Hungarian  (snowballstem.org/algorithms/hungarian/stemmer.html)
# ---------------------------------------------------------------------------

_HU_VOWELS = "aáeéiíoóöőuúüű"
_HU_DIGRAPHS = ("cs", "dz", "dzs", "gy", "ly", "ny", "sz", "ty", "zs")
_HU_DOUBLE = ("bb", "cc", "ccs", "dd", "ff", "gg", "ggy", "jj", "kk", "ll",
              "lly", "mm", "nn", "nny", "pp", "rr", "ss", "ssz", "tt",
              "tty", "vv", "zz", "zzs")


def _hu_r1(word: str) -> int:
    """R1: word starts with a vowel -> after the first consonant or
    digraph; starts with a consonant -> after the first vowel."""
    n = len(word)
    if not word:
        return 0
    if word[0] in _HU_VOWELS:
        for i in range(1, n):
            if word[i] not in _HU_VOWELS:
                for d in sorted(_HU_DIGRAPHS, key=len, reverse=True):
                    if word.startswith(d, i):
                        return i + len(d)
                return i + 1
        return n
    for i in range(1, n):
        if word[i] in _HU_VOWELS:
            return i + 1
    return n


def _hu_undouble(word: str) -> str:
    for d in sorted(_HU_DOUBLE, key=len, reverse=True):
        if word.endswith(d):
            # remove one half of the doubled consonant/digraph
            half = len(d) // 2
            return word[: len(word) - len(d)] + d[:half] + d[half * 2:]
    return word


def _hu_v_end(word: str) -> str:
    """Adjust a now-final long á/é to a/e (spec: 'v_ending')."""
    if word.endswith("á"):
        return word[:-1] + "a"
    if word.endswith("é"):
        return word[:-1] + "e"
    return word


_HU_CASES = (
    "ban", "ben", "ba", "be", "ra", "re", "nak", "nek", "val", "vel",
    "tól", "től", "ról", "ről", "ból", "ből", "hoz", "hez", "höz",
    "nál", "nél", "ig", "at", "et", "ot", "öt", "ért", "képp", "képpen",
    "kor", "ul", "ül", "vá", "vé", "onként", "enként", "anként", "ként",
    "en", "on", "an", "ön", "n", "t",
)
_HU_OWNED = ("oké", "öké", "aké", "eké", "ké", "éi", "áéi", "éé", "é")
_HU_POSS = (
    "únk", "űnk", "unk", "ünk", "ánk", "énk", "nk",
    "juk", "jük", "uk", "ük",
    "ám", "ém", "om", "em", "öm", "m",
    "ád", "éd", "od", "ed", "öd", "d",
    "ja", "je", "a", "e", "o",
    "ánk", "jaim", "jeim", "aim", "eim", "im",
    "jaid", "jeid", "aid", "eid", "id",
    "jai", "jei", "ai", "ei", "i",
    "jaink", "jeink", "aink", "eink", "ink",
    "jaitok", "jeitek", "aitok", "eitek", "itek",
    "jeik", "jaik", "aik", "eik", "ik",
)
_HU_PLURAL = ("ák", "ék", "ök", "ok", "ek", "ak", "k")


@lru_cache(maxsize=65536)
def snowball_hu(word: str) -> str:
    r1 = _hu_r1(word)

    def in_r1(m: str) -> bool:
        return len(word) - len(m) >= r1

    # step 1: instrumental al/el after a doubled consonant -> delete and
    # undouble (fákkal -> fákk -> fák)
    for suf in ("al", "el"):
        if word.endswith(suf) and in_r1(suf) and len(word) >= 4:
            stem = word[: -len(suf)]
            if any(stem.endswith(d) for d in _HU_DOUBLE):
                word = _hu_undouble(stem)
                break

    # step 2: case endings, then adjust final á/é
    m = _longest(word, _HU_CASES)
    if m and in_r1(m):
        word = _hu_v_end(word[: -len(m)])

    # step 3: special á/é cases
    if word.endswith("án") and in_r1("án"):
        word = word[:-2] + "a"
    elif word.endswith("én") and in_r1("én"):
        word = word[:-2] + "e"
    elif word.endswith("ánként") and in_r1("ánként"):
        word = word[:-6] + "a"

    # step 4: relational (stul family)
    m = _longest(word, ("astul", "estül", "stul", "stül", "ástul", "éstül"))
    if m and in_r1(m):
        if m == "ástul":
            word = word[:-5] + "a"
        elif m == "éstül":
            word = word[:-5] + "e"
        else:
            word = word[: -len(m)]

    # step 5: owned (ké family), adjust final á/é
    m = _longest(word, _HU_OWNED)
    if m and in_r1(m):
        word = _hu_v_end(word[: -len(m)])

    # step 6: possessives, adjust final á/é
    m = _longest(word, _HU_POSS)
    if m and in_r1(m):
        word = _hu_v_end(word[: -len(m)])

    # step 7: plural, adjust final á/é
    m = _longest(word, _HU_PLURAL)
    if m and in_r1(m):
        if m in ("ák", "ék"):
            word = word[: -len(m)] + ("a" if m == "ák" else "e")
        else:
            word = word[: -len(m)]
    return word

# ---------------------------------------------------------------------------
# Turkish  (snowballstem.org/algorithms/turkish/stemmer.html)
#
# Agglutinative suffix chains stripped end-first with VOWEL-HARMONY
# validation (the spec's check_vowel_harmony): a candidate suffix only
# strips when each of its vowels harmonizes with the vowel before it.
# Suffix classes use the spec's meta-vowels: A = twofold (a/e),
# U = fourfold (ı/i/u/ü); optional buffer consonants in the spec's
# "(y)U" notation are expanded. The rare verbal-chain tail of the spec is
# approximated by the copula class; post-processing restores final
# devoiced consonants (b->p, c->ç, d->t, ğ->k) as in the spec.
# ---------------------------------------------------------------------------

_TR_VOWELS = "aeıioöuü"
_TR_TWOFOLD = {"a": "a", "ı": "a", "o": "a", "u": "a",
               "e": "e", "i": "e", "ö": "e", "ü": "e"}
_TR_FOURFOLD = {"a": "ı", "ı": "ı", "e": "i", "i": "i",
                "o": "u", "u": "u", "ö": "ü", "ü": "ü"}


def _tr_expand(pattern: str) -> list[str]:
    """'lAr' -> ['lar','ler']; '(y)U' -> ['yı','yi','yu','yü','ı',...]."""
    outs = [""]
    i = 0
    while i < len(pattern):
        ch = pattern[i]
        if ch == "(":
            j = pattern.index(")", i)
            opt = pattern[i + 1:j]
            outs = [o + opt for o in outs] + list(outs)
            i = j + 1
            continue
        if ch == "A":
            outs = [o + v for o in outs for v in "ae"]
        elif ch == "U":
            outs = [o + v for o in outs for v in "ıiuü"]
        else:
            outs = [o + ch for o in outs]
        i += 1
    return outs


def _tr_harmonic(word: str, cut: int) -> bool:
    """Every suffix vowel must harmonize with the nearest vowel before
    it (fourfold for ı/i/u/ü, twofold for a/e)."""
    prev = None
    for c in word[:cut][::-1]:
        if c in _TR_VOWELS:
            prev = c
            break
    if prev is None:
        return False
    for c in word[cut:]:
        if c not in _TR_VOWELS:
            continue
        want = _TR_FOURFOLD[prev] if c in "ıiuü" else _TR_TWOFOLD[prev]
        if c != want:
            return False
        prev = c
    return True


def _tr_class(patterns: tuple[str, ...]) -> tuple[str, ...]:
    forms: set[str] = set()
    for p in patterns:
        forms.update(_tr_expand(p))
    return tuple(forms)


# suffix classes, tried end-first in chain order (case -> possessive ->
# plural), plus the copula/nominal-verb class
# NOTE: the spec's bare person markers (-m/-n/-k) only strip after a
# tense marker (ydi-m, ysa-k); a context-free single-letter strip
# over-stems bare nouns (çocuk -> çocu), so they are folded into the
# composite forms below instead.
_TR_COPULA = _tr_class((
    "(y)Um", "sUn", "(y)Uz", "sUnUz", "lAr",
    "(y)dU", "(y)dUm", "(y)dUn", "(y)dUk", "(y)tU",
    "(y)mUş", "(y)sA", "(y)sAm", "(y)sAn", "(y)sAk", "(y)ken",
    "dUr", "tUr", "dUrlAr", "tUrlAr",
    "cAsUnA",
))
_TR_CASE = _tr_class((
    "(y)A", "(y)U", "nU", "nA", "dA", "tA", "ndA", "dAn", "tAn", "ndAn",
    "(n)Un", "(y)lA", "ki", "ncA",
))
_TR_POSS = _tr_class((
    "Um", "UmUz", "Un", "UnUz", "(s)U", "lArI",
))
_TR_PLURAL = _tr_class(("lAr",))


def _tr_strip(word: str, forms: tuple[str, ...]) -> str:
    m = _longest(word, forms)
    if not m:
        return word
    cut = len(word) - len(m)
    stem = word[:cut]
    # guards: the stem keeps >= 2 chars and a vowel; harmony holds for
    # vocalic suffixes
    if cut < 2 or not any(c in _TR_VOWELS for c in stem):
        return word
    if any(c in _TR_VOWELS for c in m) and not _tr_harmonic(word, cut):
        return word
    return stem


@lru_cache(maxsize=65536)
def snowball_tr(word: str) -> str:
    if len(word) <= 3:
        return word
    # nominal verb (copula) suffixes once, then the noun chain end-first
    word = _tr_strip(word, _TR_COPULA)
    for _ in range(4):  # case -> poss -> plural, at most one chain each
        w0 = word
        word = _tr_strip(word, _TR_CASE)
        word = _tr_strip(word, _TR_POSS)
        word = _tr_strip(word, _TR_PLURAL)
        if word == w0:
            break
    # post-process: restore final devoiced consonant
    table = {"b": "p", "c": "ç", "d": "t", "ğ": "k"}
    if word and word[-1] in table:
        word = word[:-1] + table[word[-1]]
    return word

# ---------------------------------------------------------------------------
# Greek  (snowballstem.org/algorithms/greek/stemmer.html — Ntais'
# published algorithm; implemented here as the normalization + the
# productive suffix cascade. The spec's ~160-entry protected-word
# exception lists — rare stems that must not strip — are omitted as a
# documented approximation; the conflation families the text index
# relies on (nominal case/number, -ματα neuters, common verb forms) are
# covered and test-gated.)
# ---------------------------------------------------------------------------

_EL_DEACCENT = str.maketrans({
    "ά": "α", "έ": "ε", "ή": "η", "ί": "ι", "ό": "ο", "ύ": "υ", "ώ": "ω",
    "ϊ": "ι", "ϋ": "υ", "ΐ": "ι", "ΰ": "υ", "ς": "σ",
})

# the algorithm's final ending list (nominal case/number + common verb
# endings), longest match, stem keeps >= 2 letters
_EL_ENDINGS = (
    "α", "αγατε", "αγαν", "αει", "αμαι", "αν", "ασ", "ασαι", "αται", "αω",
    "ε", "ει", "εισ", "ειτε", "εσαι", "εσ", "εται",
    "η", "ηδεσ", "ηδων", "ηθει", "ηθεισ", "ηθειτε", "ηθηκα", "ηθηκατε",
    "ηθηκαν", "ηθηκε", "ηθηκεσ", "ηθουν", "ηθω",
    "ηκα", "ηκατε", "ηκαν", "ηκε", "ηκεσ",
    "ησ", "ησα", "ησαν", "ησατε", "ησει", "ησεσ", "ησε", "ησουν", "ησω",
    "ι", "ιεμαι", "ιεμαστε", "ιεται", "ιεσαι", "ιεστε",
    "ιομασταν", "ιομουν", "ιομουνα", "ιονταν", "ιοντουσαν",
    "ιοσασταν", "ιοσαστε", "ιοσουν", "ιοσουνα", "ιοταν",
    "ιουμα", "ιουμαστε", "ιουνται", "ιουνταν",
    "ο", "οι", "ομαι", "ομασταν", "ομουν", "ομουνα", "ονται", "ονταν",
    "οντουσαν", "οσασταν", "οσαστε", "οσουν", "οσουνα", "οταν",
    "ου", "ουμαι", "ουμαστε", "ουν", "ουνται", "ουνταν", "ουσ", "ουσαν",
    "ουσατε", "ουσα", "ουσε", "ουσεσ",
    "οσ", "υ", "υσ", "ω", "ων", "ωσ",
    "εσαν", "ετε", "ομε", "αμε", "ατε", "ετο", "οντασ", "ωντασ",
)


@lru_cache(maxsize=65536)
def snowball_el(word: str) -> str:
    word = word.translate(_EL_DEACCENT)
    if len(word) <= 3:
        return word

    # neuter -μα nouns: ματα/ματων/ματοσ -> μα (then the cascade brings
    # both ονομα and ονοματα to ονομ)
    m = _longest(word, ("ματα", "ματων", "ματοσ"))
    if m and len(word) - len(m) >= 2:
        word = word[: len(word) - len(m)] + "μα"

    # derivational -ικ- adjectives: ικοσ/ικη/ικο/ικα/ικου/ικων/ικεσ -> ικ
    m = _longest(word, ("ικοσ", "ικη", "ικο", "ικα", "ικου", "ικων",
                        "ικεσ", "ικουσ"))
    if m and len(word) - len(m) >= 3:
        word = word[: len(word) - len(m)] + "ικ"

    # the productive ending cascade
    m = _longest(word, _EL_ENDINGS)
    if m and len(word) - len(m) >= 2:
        word = word[: len(word) - len(m)]
    return word
