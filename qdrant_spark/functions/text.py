"""Text analysis: tokenizers, full-text match conditions, and the
training-data-pipeline text metrics (language-ID, quality scoring, token
counting, fingerprinting).

Tokenizer semantics follow qdrant's full-text index tokenizers
(lib/segment/src/data_types/index.rs:250-257 — Prefix/Whitespace/Word/
Multilingual; impls under
lib/segment/src/index/field_index/full_text_index/tokenizers/): lowercase
by default, `word` splits on non-alphanumeric. Everything is built-in
column expressions (split/transform/filter) so tokenization happens
JVM-side; query-side tokens are Python constants folded at plan time.
"""

from __future__ import annotations

import re
from typing import TYPE_CHECKING, Any

from pyspark.sql import Column
from pyspark.sql import functions as F

if TYPE_CHECKING:
    from qdrant_spark.filters import FieldResolver

# Combining marks (\p{M}) stay INSIDE tokens: abugida scripts (Tamil,
# Devanagari, ...) spell vowels and virama as combining signs, and Arabic/
# Hebrew text may carry diacritics — splitting on them shreds every word
# (மரத்தில் -> ['மரத','த','ல']). The reference's charabia
# tokenizer keeps them attached the same way.
WORD_SPLIT_RE = r"[^\p{L}\p{N}\p{M}]+"


def _mark_ranges() -> str:
    """BMP combining-mark ranges (category M*) as a regex class body —
    python's re has no \\p{M}, so the class is built once at import
    (astral-plane marks are vanishingly rare in text corpora)."""
    import unicodedata

    spans: list[list[int]] = []
    for cp in range(0x10000):
        if unicodedata.category(chr(cp)).startswith("M"):
            if spans and spans[-1][1] == cp - 1:
                spans[-1][1] = cp
            else:
                spans.append([cp, cp])
    return "".join(
        f"\\u{a:04X}-\\u{b:04X}" if b > a else f"\\u{a:04X}"
        for a, b in spans
    )


# (?:[^\w MARKS]|_)+ not \W+: python \w includes underscore (java
# \p{L}\p{N}\p{M} does not — both sides must split on it or query/document
# tokenization diverges) and excludes combining marks (java keeps them).
# Built LAZILY: _mark_ranges() walks 65,536 codepoints through
# unicodedata.category, which at import time would tax every Python
# worker that loads this module for an unrelated UDF stage (r7 ADVICE);
# only the py-tokenize path pays, once per process, on first use.
_PY_WORD_SPLIT_CACHE: list[re.Pattern] = []


def _py_word_split() -> re.Pattern:
    if not _PY_WORD_SPLIT_CACHE:
        _PY_WORD_SPLIT_CACHE.append(
            re.compile(f"(?:[^\\w{_mark_ranges()}]|_)+", re.UNICODE))
    return _PY_WORD_SPLIT_CACHE[0]

# CJK character class for the multilingual tokenizer. Same explicit ranges on
# the Python and Java side so both tokenize identically. Han (Chinese)
# runs segment by dictionary FMM (functions/zh.py) like charabia's
# Chinese path; kana/hangul approximate with per-character tokens — the
# documented divergence is multi-char kana words, e.g. the reference's
# vaporetto yields テスト where we yield テ|ス|ト.
# Reference: multilingual.rs:22-58, japanese.rs.
_CJK_RANGES = (
    "\\u1100-\\u11FF"  # Hangul Jamo
    "\\u3040-\\u309F"  # Hiragana
    "\\u30A0-\\u30FF"  # Katakana
    "\\u3400-\\u4DBF"  # CJK ext A
    "\\u4E00-\\u9FFF"  # CJK unified
    "\\uAC00-\\uD7AF"  # Hangul syllables
)
_CJK_CLASS = f"[{_CJK_RANGES}]"
_PY_CJK = re.compile(_CJK_CLASS)

# Han (Chinese-script) subset: the multilingual tokenizer segments these
# runs with the embedded FMM dictionary (functions/zh.py) the way the
# reference's charabia does dictionary segmentation for Chinese; the
# remaining CJK scripts (kana, hangul) keep per-character tokens there.
_HAN_RANGES = "\\u3400-\\u4DBF\\u4E00-\\u9FFF"
_HAN_CLASS = f"[{_HAN_RANGES}]"
_NONHAN_CJK_RANGES = (
    "\\u1100-\\u11FF\\u3040-\\u309F\\u30A0-\\u30FF\\uAC00-\\uD7AF"
)
_NONHAN_CJK_CLASS = f"[{_NONHAN_CJK_RANGES}]"
_PY_HAN_RUN = re.compile(f"{_HAN_CLASS}+")
_PY_NONHAN_CJK = re.compile(_NONHAN_CJK_CLASS)
# Japanese tokenizer: the reference segments with a learned model
# (vaporetto, japanese.rs:9-13) whose bundled weights can't be shipped
# here; we use the standard CJK-bigram approximation (Lucene
# CJKAnalyzer shape): each CJK run yields overlapping character bigrams
# (single char if the run is length 1), non-CJK spans tokenize like
# `word`. Documented divergence: segment boundaries inside CJK runs.
_PY_CJK_RUN = re.compile(f"{_CJK_CLASS}+")

# ASCII folding — a curated subset of the Lucene ASCIIFoldingFilter table the
# reference ports (ascii_folding.rs:16-30): Latin-1 Supplement + Latin
# Extended-A letters + common ligatures. Single source of truth for the
# Python and Spark sides. Symbol/enclosed-form mappings ("(a)" etc.) are
# intentionally omitted: they never produce index tokens.
_FOLD_1TO1: dict[str, str] = {}
for _dst, _srcs in {
    "A": "ÀÁÂÃÄÅĀĂĄǍ", "a": "àáâãäåāăąǎ",
    "C": "ÇĆĈĊČ", "c": "çćĉċč",
    "D": "ÐĎĐ", "d": "ðďđ",
    "E": "ÈÉÊËĒĔĖĘĚ", "e": "èéêëēĕėęě",
    "G": "ĜĞĠĢ", "g": "ĝğġģ",
    "H": "ĤĦ", "h": "ĥħ",
    "I": "ÌÍÎÏĨĪĬĮİ", "i": "ìíîïĩīĭįı",
    "J": "Ĵ", "j": "ĵ",
    "K": "Ķ", "k": "ķ",
    "L": "ĹĻĽĿŁ", "l": "ĺļľŀł",
    "N": "ÑŃŅŇŊ", "n": "ñńņňŋ",
    "O": "ÒÓÔÕÖØŌŎŐǑ", "o": "òóôõöøōŏőǒ",
    "R": "ŔŖŘ", "r": "ŕŗř",
    "S": "ŚŜŞŠ", "s": "śŝşšſ",
    "T": "ŢŤŦ", "t": "ţťŧ",
    "U": "ÙÚÛÜŨŪŬŮŰŲǓ", "u": "ùúûüũūŭůűųǔ",
    "W": "Ŵ", "w": "ŵ",
    "Y": "ÝŶŸ", "y": "ýÿŷ",
    "Z": "ŹŻŽ", "z": "źżž",
}.items():
    for _ch in _srcs:
        _FOLD_1TO1[_ch] = _dst
_FOLD_MULTI: dict[str, str] = {
    "Æ": "AE", "æ": "ae", "Œ": "OE", "œ": "oe", "ß": "ss",
    "Ĳ": "IJ", "ĳ": "ij", "Þ": "TH", "þ": "th",
    "ﬀ": "ff", "ﬁ": "fi", "ﬂ": "fl", "ﬃ": "ffi", "ﬄ": "ffl",
}
_PY_FOLD = str.maketrans({**_FOLD_1TO1, **_FOLD_MULTI})


def fold_to_ascii_py(text: str) -> str:
    """Driver-side ASCII folding (ascii_folding.rs:16-30 subset)."""
    return text.translate(_PY_FOLD)


def fold_to_ascii(col: Column | str) -> Column:
    """JVM-side ASCII folding: one translate() for 1:1 chars + a replace
    chain for the few multi-char expansions. Stays in codegen."""
    c = F.col(col) if isinstance(col, str) else col
    src = "".join(_FOLD_1TO1)
    dst = "".join(_FOLD_1TO1.values())
    c = F.translate(c, src, dst)
    for ch, repl in _FOLD_MULTI.items():
        c = F.replace(c, F.lit(ch), F.lit(repl))
    return c


def _resolve_stemmer(stemmer: str | dict[str, Any] | None):
    """Accept the reference's StemmingAlgorithm shapes (index.rs:341-352):
    {"type": "snowball", "language": "english"}, {"type": "none"}, or a bare
    language string."""
    if stemmer is None:
        return None
    if isinstance(stemmer, str):
        lang = stemmer
    elif stemmer.get("type") == "none":
        return None
    else:
        lang = stemmer["language"]
    from qdrant_spark.functions.stemmer import get_stemmer

    return get_stemmer(lang)


def tokenize_py(
    text: str,
    tokenizer: str = "word",
    lowercase: bool = True,
    min_token_len: int | None = None,
    max_token_len: int | None = None,
    stopwords: Any = None,
    ascii_folding: bool = False,
    stemmer: str | dict[str, Any] | None = None,
) -> list[str]:
    """Driver-side tokenizer for constant query strings — must agree with
    :func:`tokenize` so filter compilation and document tokenization match.
    Options mirror the reference's TextIndexParams (index.rs:260-360) and
    apply in the reference's per-token order (tokens_processor.rs:59-106):
    fold -> lowercase -> stopwords -> stem -> length. ``tokenizer='prefix'``
    emits every prefix of each token from ``min_token_len`` (default 1) up
    to ``max_token_len``; ``tokenizer='multilingual'`` additionally
    segments Han runs with the embedded dictionary FMM (functions/zh.py,
    charabia's Chinese dictionary segmentation analogue; OOV spans fall
    back to character bigrams), splits kana/hangul into single-char
    tokens, and drops tokens with no letter (multilingual.rs:49-52).

    ``stopwords`` accepts every ``StopwordsInterface`` form the reference
    does (stop_words/mod.rs:74-101): a built-in language name
    (``"english"``), ``{"language": ...}``, ``{"languages": [...],
    "custom": [...]}``, or a plain word collection — see
    :mod:`qdrant_spark.functions.stopwords`."""
    from qdrant_spark.functions.stopwords import resolve_stopwords

    stopwords = resolve_stopwords(stopwords, lowercase=lowercase)
    if ascii_folding:
        text = fold_to_ascii_py(text)
    if lowercase:
        text = text.lower()
    if tokenizer == "whitespace":
        toks = text.split()
    else:  # word / prefix / multilingual / japanese
        if tokenizer == "multilingual":
            # Han runs: dictionary FMM + bigram fallback (functions/zh.py);
            # kana/hangul stay per-character tokens
            from qdrant_spark.functions.zh import zh_fmm_segment

            text = _PY_HAN_RUN.sub(
                lambda m: " " + " ".join(zh_fmm_segment(m.group(0))) + " ",
                text)
            text = _PY_NONHAN_CJK.sub(lambda m: f" {m.group(0)} ", text)
        elif tokenizer == "japanese":
            text = _PY_CJK_RUN.sub(lambda m: f" {m.group(0)} ", text)
        toks = [t for t in _py_word_split().split(text) if t]
        if tokenizer == "japanese":
            toks = [
                b
                for t in toks
                for b in (
                    [t[i:i + 2] for i in range(len(t) - 1)]
                    if len(t) >= 2 and _PY_CJK.match(t)
                    else [t]
                )
            ]
        if tokenizer in ("multilingual", "japanese"):
            toks = [t for t in toks if any(c.isalpha() for c in t)]
    if stopwords:
        toks = [t for t in toks if t not in stopwords]
    if tokenizer == "prefix":
        lo = min_token_len or 1
        hi = max_token_len or 20
        return [t[:i] for t in toks for i in range(lo, min(len(t), hi) + 1)]
    stem = _resolve_stemmer(stemmer)
    if stem is not None:
        toks = [stem(t) for t in toks]
    if min_token_len is not None:
        toks = [t for t in toks if len(t) >= min_token_len]
    if max_token_len is not None:
        toks = [t for t in toks if len(t) <= max_token_len]
    return toks


def _stem_tokens_udf(language: str):
    """Arrow-batched token-array stemmer. The only Python-side stage of the
    tokenize pipeline — everything else stays in codegen. Used for document
    tokens when a text index declares a stemmer; query tokens stem
    driver-side via tokenize_py."""
    from qdrant_spark.functions.stemmer import get_stemmer

    stem = get_stemmer(language)

    def stem_tokens(s):
        return s.apply(
            lambda toks: None if toks is None else [stem(t) for t in toks]
        )

    # no type hints: postponed annotations (PEP 563) break pyspark's
    # hint-based eval-type inference; default scalar pandas UDF is what we want
    return F.pandas_udf(stem_tokens, "array<string>")


def _japanese_stem_udf(stemmer: str | dict[str, Any], stopwords: set[str] | None):
    """Bigram-expansion + letter-filter + stopwords + stem in ONE Arrow
    stage, mirroring tokenize_py's exact ordering. Exists because nesting
    the Column-side bigram expansion (when/transform/sequence) inside a
    pandas-UDF argument trips a Spark analyzer/codegen bug ("Cannot
    evaluate expression: stem_tokens(...)"), so the japanese+stemmer
    combination keeps the heavy HOF work Python-side where the token
    stream is already crossing into Arrow for stemming anyway."""
    from qdrant_spark.functions.stemmer import get_stemmer

    lang = stemmer if isinstance(stemmer, str) else stemmer["language"]
    stem = get_stemmer(lang)
    sw = frozenset(stopwords or ())

    def run(s):
        def one(toks):
            if toks is None:
                return None
            out = []
            for t in toks:
                if len(t) >= 2 and _PY_CJK.match(t):
                    out.extend(t[i:i + 2] for i in range(len(t) - 1))
                else:
                    out.append(t)
            return [
                stem(t)
                for t in out
                if any(c.isalpha() for c in t) and t not in sw
            ]

        return s.apply(one)

    return F.pandas_udf(run, "array<string>")


def _multilingual_stem_udf(stemmer: str | dict[str, Any],
                           stopwords: set[str] | None):
    """Multilingual twin of :func:`_japanese_stem_udf`: non-dictionary
    Han-span bigram expansion + letter-filter + stopwords + stem in ONE
    Arrow stage (the Column-side expansion nested inside a pandas-UDF
    argument trips the same analyzer bug)."""
    from qdrant_spark.functions.stemmer import get_stemmer
    from qdrant_spark.functions.zh import ZH_DICT

    lang = stemmer if isinstance(stemmer, str) else stemmer["language"]
    stem = get_stemmer(lang)
    sw = frozenset(stopwords or ())

    def run(s):
        def one(toks):
            if toks is None:
                return None
            out = []
            for t in toks:
                if (len(t) >= 2 and t not in ZH_DICT
                        and _PY_HAN_RUN.fullmatch(t)):
                    out.extend(t[i:i + 2] for i in range(len(t) - 1))
                else:
                    out.append(t)
            return [
                stem(t)
                for t in out
                if any(ch.isalpha() for ch in t) and t not in sw
            ]

        return s.apply(one)

    return F.pandas_udf(run, "array<string>")


def tokenize(
    col: Column | str,
    tokenizer: str = "word",
    lowercase: bool = True,
    min_token_len: int | None = None,
    max_token_len: int | None = None,
    stopwords: Any = None,
    ascii_folding: bool = False,
    stemmer: str | dict[str, Any] | None = None,
) -> Column:
    """Tokenize a string column -> array<string>, JVM-side (split/filter/
    flatten stay in whole-stage codegen; stemming, when enabled, is the one
    Arrow-batched stage). Same options and ordering as :func:`tokenize_py`,
    including the ``StopwordsInterface`` spec forms for ``stopwords`` —
    the resolved set becomes an array literal, so removal stays in
    codegen."""
    from qdrant_spark.functions.stopwords import resolve_stopwords

    stopwords = resolve_stopwords(stopwords, lowercase=lowercase)
    c = F.col(col) if isinstance(col, str) else col
    if ascii_folding:
        c = fold_to_ascii(c)
    if lowercase:
        c = F.lower(c)
    if tokenizer == "multilingual":
        # Chinese dictionary segmentation stays in CODEGEN: a regex
        # alternation ordered longest-first IS forward maximum matching
        # (Java regex picks the first — longest — alternative at the
        # leftmost position, then continues after the match), so
        # isolating dictionary words is one regexp_replace; leftover
        # non-dictionary Han spans become their own tokens here and
        # bigram-expand after the split (same transform/sequence shape
        # as the japanese path). Kana/hangul stay per-character.
        from qdrant_spark.functions.zh import ZH_CORE_WORDS

        zh_alt = "|".join(sorted(ZH_CORE_WORDS, key=len, reverse=True))
        c = F.regexp_replace(c, f"({zh_alt})", " $1 ")
        c = F.regexp_replace(c, f"({_HAN_CLASS}+)", " $1 ")
        c = F.regexp_replace(c, f"({_NONHAN_CJK_CLASS})", " $1 ")
    elif tokenizer == "japanese":
        c = F.regexp_replace(c, f"({_CJK_CLASS}+)", " $1 ")
    pattern = r"\s+" if tokenizer == "whitespace" else WORD_SPLIT_RE
    toks = F.filter(F.split(c, pattern), lambda t: t != "")
    stem = _resolve_stemmer(stemmer)
    if tokenizer in ("japanese", "multilingual") and stem is not None:
        # expansion + filters + stem fused into one Arrow stage (see
        # _japanese_stem_udf for why this combination can't stay Column-side)
        fused = (_japanese_stem_udf if tokenizer == "japanese"
                 else _multilingual_stem_udf)
        toks = fused(stemmer, stopwords)(toks)
        if min_token_len is not None:
            toks = F.filter(toks, lambda t: F.length(t) >= min_token_len)
        if max_token_len is not None:
            toks = F.filter(toks, lambda t: F.length(t) <= max_token_len)
        return toks
    if tokenizer == "multilingual":
        # non-dictionary Han spans -> overlapping character bigrams
        # (single char for 1-char spans); dictionary words pass through
        from qdrant_spark.functions.zh import ZH_CORE_WORDS

        zh_words = F.lit(sorted(ZH_CORE_WORDS))
        toks = F.flatten(
            F.transform(
                toks,
                lambda t: F.when(
                    t.rlike(f"^{_HAN_CLASS}+$") & (F.length(t) >= 2)
                    & ~F.array_contains(zh_words, t),
                    F.transform(
                        F.sequence(F.lit(1), F.length(t) - 1),
                        lambda i: t.substr(i, F.lit(2)),
                    ),
                ).otherwise(F.array(t)),
            )
        )
    if tokenizer == "japanese":
        # CJK runs -> overlapping character bigrams (see _PY_CJK_RUN note);
        # guard with when(): sequence(1, 0) counts DOWN for 1-char runs
        toks = F.flatten(
            F.transform(
                toks,
                lambda t: F.when(
                    t.rlike(f"^{_CJK_CLASS}+$") & (F.length(t) >= 2),
                    F.transform(
                        F.sequence(F.lit(1), F.length(t) - 1),
                        lambda i: t.substr(i, F.lit(2)),
                    ),
                ).otherwise(F.array(t)),
            )
        )
    if tokenizer in ("multilingual", "japanese"):
        toks = F.filter(toks, lambda t: t.rlike(r"\p{L}"))
    if stopwords:
        sw = F.lit(sorted(stopwords))
        toks = F.filter(toks, lambda t: ~F.array_contains(sw, t))
    if tokenizer == "prefix":
        lo = min_token_len or 1
        hi = max_token_len or 20
        return F.flatten(
            F.transform(
                toks,
                # guard: sequence(lo, hi) with hi < lo counts DOWN in Spark,
                # so short tokens must map to an empty prefix list instead
                lambda t: F.when(
                    F.length(t) >= lo,
                    F.transform(
                        F.sequence(F.lit(lo), F.least(F.length(t), F.lit(hi))),
                        lambda i: t.substr(F.lit(1), i),
                    ),
                ).otherwise(F.array().cast("array<string>")),
            )
        )
    if stem is not None:
        lang = stemmer if isinstance(stemmer, str) else stemmer["language"]
        toks = _stem_tokens_udf(lang)(toks)
    if min_token_len is not None:
        toks = F.filter(toks, lambda t: F.length(t) >= min_token_len)
    if max_token_len is not None:
        toks = F.filter(toks, lambda t: F.length(t) <= max_token_len)
    return toks


def compile_text_match(fr: "FieldResolver", key: str, match: dict[str, Any]) -> Column:
    """match.text (ALL tokens present, types.rs:3014), match.text_any
    (at least one, types.rs:3021), match.phrase (ordered-adjacent,
    types.rs:3034). Tokenization honors the field's declared text-index
    params (FieldResolver.text_params) on both the query and document
    side, so a stemmed/folded index matches like the reference's."""
    params: dict[str, Any] = getattr(fr, "text_params", {}).get(key, {})
    if "text" in match:
        q_tokens = tokenize_py(match["text"], **params)
        if not q_tokens:
            return F.lit(True)

        def pred(c: Column) -> Column:
            doc = tokenize(c, **params)
            out = F.array_contains(doc, q_tokens[0])
            for t in q_tokens[1:]:
                out = out & F.array_contains(doc, t)
            return out

        return fr.any_match(key, pred)
    if "text_any" in match:
        q_tokens = tokenize_py(match["text_any"], **params)
        if not q_tokens:
            return F.lit(True)
        return fr.any_match(
            key,
            lambda c: F.arrays_overlap(
                tokenize(c, **params), F.array(*[F.lit(t) for t in q_tokens])
            ),
        )
    if "phrase" in match:
        q_tokens = tokenize_py(match["phrase"], **params)
        if not q_tokens:
            return F.lit(True)
        m = len(q_tokens)
        q_arr = F.array(*[F.lit(t) for t in q_tokens])

        def pred(c: Column) -> Column:
            doc = tokenize(c, **params)
            n = F.size(doc)
            # guard with when(), not `&`: Spark AND doesn't short-circuit, and
            # sequence(1, 0) counts DOWN to [1, 0] -> slice(doc, 0, m) throws
            positions = F.sequence(F.lit(1), n - m + 1)
            return F.when(
                n >= m,
                F.exists(positions, lambda i: F.slice(doc, i, m) == q_arr),
            ).otherwise(F.lit(False))

        return fr.any_match(key, pred)
    raise ValueError(f"unsupported text match: {match!r}")


# ---------------------------------------------------------------------------
# training-data-pipeline text metrics (beyond-reference ops)
# ---------------------------------------------------------------------------

# small language-discriminating stopword lists (function words) — a classic
# stopword-hit heuristic; deterministic and SQL-expressible for the oracle.
LANG_STOPWORDS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "with", "for", "was"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "mit", "für", "auf"],
    "fr": ["le", "la", "les", "et", "est", "une", "dans", "que", "pour", "des"],
    "es": ["el", "la", "los", "las", "es", "una", "en", "que", "por", "para"],
}


def token_count(col: Column | str, mode: str = "whitespace") -> Column:
    """Token count: whitespace or a BPE-ish word/number/punct split.

    BPE-ish = letter runs + digit runs + individual punctuation marks, each
    counting one token. Expressed with ``regexp_extract_all`` (no
    lookarounds) so a DuckDB/RE2 oracle can reproduce it exactly.
    """
    c = F.col(col) if isinstance(col, str) else col
    if mode == "whitespace":
        return F.size(F.filter(F.split(c, r"\s+"), lambda t: t != ""))
    return (
        F.size(F.regexp_extract_all(c, F.lit(r"\p{L}+"), 0))
        + F.size(F.regexp_extract_all(c, F.lit(r"\p{N}+"), 0))
        + F.size(F.regexp_extract_all(c, F.lit(r"[^\p{L}\p{N}\s]"), 0))
    )


def quality_features(
    col: Column | str, tokens: Column | None = None
) -> dict[str, Column]:
    """Heuristic quality signals for a document column (length, punctuation
    density, stopword ratio, mean token length). All JVM-side expressions.

    Pass ``tokens`` (a pre-materialized ``tokenize(col)`` column, e.g. via
    ``df.withColumn``) when computing several features at once: expressions
    don't share subtrees across output columns, so inlining ``tokenize``
    here would re-split the text per feature and bloat codegen.
    """
    c = F.col(col) if isinstance(col, str) else col
    toks = tokens if tokens is not None else tokenize(c)
    n_tok = F.size(toks)
    n_chars = F.length(c)
    stop = F.array(*[F.lit(t) for t in LANG_STOPWORDS["en"]])
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(stop, t)))
    n_punct = F.length(c) - F.length(F.regexp_replace(c, r"[^\p{L}\p{N}\s]", ""))
    return {
        "n_chars": n_chars,
        "n_tokens": n_tok,
        "mean_token_len": F.when(n_tok > 0, F.aggregate(
            toks, F.lit(0), lambda a, t: a + F.length(t)
        ).cast("double") / n_tok).otherwise(F.lit(0.0)),
        "stopword_ratio": F.when(n_tok > 0, n_stop.cast("double") / n_tok).otherwise(
            F.lit(0.0)
        ),
        "punct_ratio": F.when(n_chars > 0, n_punct.cast("double") / n_chars).otherwise(
            F.lit(0.0)
        ),
    }


def detect_language(
    col: Column | str,
    langs: list[str] | None = None,
    tokens: Column | None = None,
) -> Column:
    """Stopword-hit language ID: the language whose function-word list hits
    the most tokens; NULL hits -> 'und' (undetermined). Deterministic
    tie-break by language code order."""
    c = F.col(col) if isinstance(col, str) else col
    toks = tokens if tokens is not None else tokenize(c)
    langs = langs or sorted(LANG_STOPWORDS)
    # argmax via struct-ordered greatest: maximize hits, tie-break by the
    # FIRST language in sorted order (higher -i wins ties deterministically)
    candidates = []
    for i, lang in enumerate(langs):
        sw = F.array(*[F.lit(t) for t in LANG_STOPWORDS[lang]])
        hits = F.size(F.filter(toks, lambda t: F.array_contains(sw, t)))
        candidates.append(
            F.struct(hits.alias("h"), F.lit(-i).alias("r"), F.lit(lang).alias("l"))
        )
    best = F.greatest(*candidates) if len(candidates) > 1 else candidates[0]
    return F.when(best["h"] > 0, best["l"]).otherwise(F.lit("und"))


def fingerprint(col: Column | str, normalize: bool = True) -> Column:
    """Deterministic document fingerprint: md5 of whitespace-normalized,
    lowercased text. md5 exists in both Spark and DuckDB -> oracle-checkable."""
    c = F.col(col) if isinstance(col, str) else col
    if normalize:
        c = F.regexp_replace(F.lower(F.trim(c)), r"\s+", " ")
    return F.md5(c)


def shingles(col: Column | str, n: int = 3, mode: str = "word") -> Column:
    """n-gram shingles as array<string> (word n-grams or char n-grams)."""
    c = F.col(col) if isinstance(col, str) else col
    empty = F.array().cast("array<string>")
    if mode == "word":
        toks = tokenize(c)
        # guard: with size < n, greatest(...,0) made sequence(1, 0) count DOWN
        # to [1, 0] and slice(toks, 0, n) threw INVALID_PARAMETER_VALUE.START
        return F.when(
            F.size(toks) >= n,
            F.transform(
                F.sequence(F.lit(1), F.size(toks) - n + 1),
                lambda i: F.array_join(F.slice(toks, i, n), " "),
            ),
        ).otherwise(empty)
    s = F.lower(c)
    return F.when(
        F.length(s) >= n,
        F.transform(
            F.sequence(F.lit(1), F.length(s) - n + 1),
            lambda i: s.substr(i, F.lit(n)),
        ),
    ).otherwise(empty)
