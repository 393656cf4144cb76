"""Held-out segmentation eval for the Chinese dictionary-FMM path
(functions/zh.py — charabia dictionary-segmentation analogue,
multilingual.rs). The gold fixture is self-authored modern written
Chinese following CTB/PKU-style word-boundary conventions, NOT used to
build the lexicon — it measures how the embedded-lexicon FMM +
character-bigram fallback behaves on unseen text.

The eval is deterministic; the floor is asserted so lexicon edits that
regress segmentation fail loudly. Residual errors are single-character
words absorbed into OOV bigrams (很+快 -> 很快) — the documented
graceful-degradation mode, not dictionary over-matching.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from qdrant_spark.functions.zh import ZH_CORE_WORDS, zh_fmm_segment

F1_FLOOR = 0.95

# (sentence implied by joining) -> gold word segmentation
GOLD = [
    ["我们", "今天", "学习", "机器", "翻译"],
    ["他们", "在", "北京", "工作"],
    ["中国", "的", "经济", "发展", "非常", "快"],
    ["学生", "们", "喜欢", "用", "电脑", "查询", "数据"],
    ["这个", "问题", "应该", "可以", "解决"],
    ["人工智能", "改变", "了", "世界"],
    ["老师", "告诉", "我们", "明天", "开始", "上课"],
    ["深度学习", "模型", "需要", "大量", "训练", "数据"],
    ["他", "已经", "离开", "上海", "了"],
    ["我", "觉得", "这样", "比较", "好"],
    ["政府", "决定", "提高", "教育", "水平"],
    ["互联网", "技术", "发展", "很", "快"],
    ["因为", "下雨", "所以", "我们", "没有", "出去"],
    ["医生", "建议", "他", "多", "休息"],
    ["数据库", "系统", "支持", "向量", "搜索"],
    ["孩子", "们", "在", "学校", "学习", "汉语"],
    ["这些", "文章", "介绍", "了", "历史", "文化"],
    ["公司", "使用", "云计算", "存储", "信息"],
    ["朋友", "们", "一起", "看", "电影"],
    ["科学", "研究", "需要", "时间", "和", "方法"],
]


def _spans(words: list[str]) -> set[tuple[int, int]]:
    out, i = set(), 0
    for w in words:
        out.add((i, i + len(w)))
        i += len(w)
    return out


def _boundary_f1() -> float:
    tp = fp = fn = 0
    for gold in GOLD:
        pred = zh_fmm_segment("".join(gold))
        g, p = _spans(gold), _spans(pred)
        tp += len(g & p)
        fp += len(p - g)
        fn += len(g - p)
    prec, rec = tp / (tp + fp), tp / (tp + fn)
    return 2 * prec * rec / (prec + rec)


def test_segmentation_f1_floor():
    f1 = _boundary_f1()
    assert f1 >= F1_FLOOR, f"held-out segmentation F1 {f1:.3f} < {F1_FLOOR}"


def test_lexicon_words_segment_exactly():
    # every dictionary word segments to itself (no over-splitting)
    for w in ZH_CORE_WORDS:
        assert zh_fmm_segment(w) == [w], w


def test_fmm_is_longest_match():
    # 中华人民共和国 must win over 中华 + 人民 + 共和国
    assert zh_fmm_segment("中华人民共和国") == ["中华人民共和国"]
    # 国人 must NOT over-match inside 中国人民 (the r7 fix)
    assert zh_fmm_segment("中国人民") == ["中国", "人民"]


def test_oov_falls_back_to_bigrams():
    assert zh_fmm_segment("魑魅魍魉") == ["魑魅", "魅魍", "魍魉"]
    assert zh_fmm_segment("魑") == ["魑"]


@pytest.mark.parametrize("gold", GOLD[:6], ids=lambda g: "".join(g)[:8])
def test_jvm_multilingual_matches_python(spark, gold):
    """The codegen'd regex FMM (longest-first alternation) must tokenize
    the eval sentences identically to the python FMM path — query-side
    (tokenize_py) and document-side (tokenize) may not diverge."""
    from qdrant_spark.functions.text import tokenize, tokenize_py

    sent = "".join(gold)
    df = spark.createDataFrame([(sent,)], "t: string")
    got = list(
        df.select(tokenize(F.col("t"), tokenizer="multilingual").alias("x"))
        .first()["x"]
    )
    assert got == tokenize_py(sent, tokenizer="multilingual")


def test_match_text_parity_after_lexicon_widening(spark):
    """match.text over the widened lexicon: a dictionary-word query hits
    documents containing the word inside running text, and does NOT hit
    a document where the word's characters span a word boundary."""
    from qdrant_spark.filters import apply_filter

    df = spark.createDataFrame(
        [
            (1, "医生建议他多休息"),        # contains 建议
            (2, "福建议会召开会议"),        # 建议 spans 福建|议会 boundary
            (3, "他改变了计划"),            # contains 改变
        ],
        "id: long, text: string",
    )
    tp = {"text": {"tokenizer": "multilingual"}}
    flt = {"must": [{"key": "text", "match": {"text": "建议"}}]}
    got = sorted(r["id"] for r in apply_filter(df, flt, text_params=tp).collect())
    assert got == [1]
    flt2 = {"must": [{"key": "text", "match": {"text": "改变"}}]}
    got2 = sorted(r["id"] for r in apply_filter(df, flt2, text_params=tp).collect())
    assert got2 == [3]
