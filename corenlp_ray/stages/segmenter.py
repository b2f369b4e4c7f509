"""Chinese and Arabic word segmentation — the
ChineseSegmenterAnnotator / ArabicSegmenterAnnotator analogues
(src/edu/stanford/nlp/pipeline/ChineseSegmenterAnnotator.java:37,
ArabicSegmenterAnnotator.java:23).

The reference backs these with trained CRF segmenters
(ie/crf/CRFClassifier for zh — Tseng et al. 2005 features;
international/arabic/process/ArabicSegmenter — Green & DeNero 2012).
Without licensed training corpora this engine ships the deterministic
baselines those papers measure against, behind the SAME stage surface
so trained weights can drop in:

  * Chinese — bidirectional maximal matching (FMM + BMM) over an
    embedded common-word lexicon, disagreements resolved by the
    standard heuristic (fewer words, then fewer single-char tokens,
    else BMM), with digit/latin runs and CJK punctuation handled as
    atomic tokens.  MaxMatch is the canonical public dictionary
    baseline for zh segmentation.
  * Arabic — ATB-style clitic segmentation: split the proclitics
    و/ف (conjunctions), ب/ل/ك (prepositions), س (future marker) and
    the pronominal enclitics (ها/هم/هن/كم/كن/نا/ه/ك/ي), keep the
    determiner ال attached (the ATB convention the reference's
    segmenter follows), with minimum-stem-length guards.

Both are pure kernels; ``segment_text_batch`` is the stateless
map_batches stage routing by the ``lang`` column (zh/ar), falling back
to script detection when lang is absent.
"""
from __future__ import annotations

import re
from typing import List

import pyarrow as pa

# ------------------------------------------------------------- Chinese ----

# compact common-word lexicon (multi-char entries only — single chars
# fall out of MaxMatch automatically). High-frequency vocabulary from
# public frequency lists; extend freely, or swap a full dictionary into
# the same structure.
_ZH_WORDS = {
    # pronouns / people
    "我们", "你们", "他们", "她们", "大家", "自己", "人们", "先生",
    "女士", "朋友", "孩子", "学生", "老师", "记者", "主席", "总统",
    "部长", "人民", "员工",
    # places / orgs
    "中国", "北京", "上海", "美国", "日本", "英国", "法国", "德国",
    "国家", "世界", "城市", "农村", "政府", "公司", "企业", "银行",
    "大学", "学校", "医院", "市场",
    # time
    "今天", "明天", "昨天", "现在", "时间", "时候", "今年", "去年",
    "明年", "上午", "下午", "晚上", "星期", "世纪", "历史",
    # abstract / common nouns
    "问题", "工作", "生活", "社会", "经济", "文化", "科学", "技术",
    "研究", "教育", "环境", "信息", "系统", "管理", "服务", "质量",
    "安全", "生产", "投资", "贸易", "价格", "计划", "项目", "活动",
    "会议", "新闻", "报道", "电视", "电话", "电脑", "网络", "音乐",
    "艺术", "电影", "文章", "语言", "汉语", "英语", "情况", "关系",
    "方面", "方法", "结果", "原因", "条件", "标准", "水平", "能力",
    "力量", "作用", "影响", "意见", "意思", "内容", "形式", "基础",
    "地方", "地区", "部分", "同志", "代表", "组织", "制度", "政策",
    "法律", "权利", "责任", "任务", "目标", "目的", "精神", "思想",
    "理论", "实践", "经验", "知识", "材料", "产品", "设备", "工程",
    "建设", "发展", "改革", "开放", "合作", "竞争", "增长", "提高",
    # verbs / adjectives
    "认为", "表示", "进行", "开始", "继续", "完成", "实现", "解决",
    "发现", "发生", "出现", "成为", "需要", "希望", "决定", "参加",
    "举行", "访问", "学习", "工人", "喜欢", "知道", "了解", "研制",
    "重要", "主要", "基本", "一般", "特别", "非常", "可能", "应该",
    "必须", "可以", "没有", "不能", "不同", "共同", "全部", "所有",
    # function words / quantifiers
    "这个", "那个", "这些", "那些", "什么", "怎么", "为什么", "如果",
    "因为", "所以", "但是", "虽然", "而且", "或者", "已经", "正在",
    "一个", "一些", "一样", "一起", "之间", "以及", "对于", "关于",
    "通过", "根据", "由于", "为了", "除了", "按照",
}
_ZH_MAXLEN = max(len(w) for w in _ZH_WORDS)

_CJK_RE = re.compile(r"[一-鿿㐀-䶿]")
_ZH_PUNCT = set("。，、；：？！「」『』（）《》【】“”‘’…—·")
_NONCJK_RUN = re.compile(r"[A-Za-z0-9][A-Za-z0-9.%-]*")


def _fmm(s: str) -> List[str]:
    out, i, n = [], 0, len(s)
    while i < n:
        for k in range(min(_ZH_MAXLEN, n - i), 1, -1):
            if s[i:i + k] in _ZH_WORDS:
                out.append(s[i:i + k])
                i += k
                break
        else:
            out.append(s[i])
            i += 1
    return out


def _bmm(s: str) -> List[str]:
    out, j = [], len(s)
    while j > 0:
        for k in range(min(_ZH_MAXLEN, j), 1, -1):
            if s[j - k:j] in _ZH_WORDS:
                out.insert(0, s[j - k:j])
                j -= k
                break
        else:
            out.insert(0, s[j - 1])
            j -= 1
    return out


def _pick(fw: List[str], bw: List[str]) -> List[str]:
    """Standard FMM/BMM disagreement heuristic: fewer words, then fewer
    single-char tokens, else prefer BMM (empirically better for zh)."""
    if fw == bw:
        return fw
    if len(fw) != len(bw):
        return min(fw, bw, key=len)
    fs = sum(1 for w in fw if len(w) == 1)
    bs = sum(1 for w in bw if len(w) == 1)
    return fw if fs < bs else bw


def segment_chinese(text: str) -> List[str]:
    """CJK text → word tokens (bidirectional MaxMatch; non-CJK runs and
    punctuation atomic)."""
    out: List[str] = []
    i, n = 0, len(text or "")
    while i < n:
        c = text[i]
        if c.isspace():
            i += 1
        elif c in _ZH_PUNCT or (not _CJK_RE.match(c)
                                and not _NONCJK_RUN.match(text, i)):
            out.append(c)
            i += 1
        elif _CJK_RE.match(c):
            j = i
            while j < n and _CJK_RE.match(text[j]):
                j += 1
            run = text[i:j]
            out.extend(_pick(_fmm(run), _bmm(run)))
            i = j
        else:
            m = _NONCJK_RUN.match(text, i)
            out.append(m.group(0))
            i = m.end()
    return out


# -------------------------------------------------------------- Arabic ----

_AR_LETTER = re.compile(r"[؀-ۿ]")
_AR_TOKEN_RE = re.compile(r"[؀-ۿ]+|[A-Za-z0-9]+|[^\s\w]")

# pronominal enclitics, longest first (Green & DeNero table 1)
_AR_ENCLITICS = ("كما", "هما", "هم", "هن", "ها", "كم", "كن", "نا",
                 "ه", "ك", "ي")
# single-letter proclitics (splittable); ال stays attached (ATB)
_AR_PROCLITICS = ("و", "ف", "ب", "ل", "ك", "س")


def segment_arabic_token(tok: str) -> List[str]:
    """One Arabic token → clitic-segmented parts (ATB style)."""
    parts_pre: List[str] = []
    stem = tok
    # peel proclitics conservatively — each letter splits only in the
    # context where it IS a clitic (Green & DeNero's segmentation
    # classes), so stem-initial root letters (كتاب, لعب…) survive:
    #   و/ف conjunctions: any word-like remainder
    #   ب/ل/ك prepositions: only before the determiner ال
    #   لل  = ل + ال assimilation
    #   س   future marker: only before an imperfect prefix (ي/ت/ن/أ)
    while len(stem) >= 4 and not stem.startswith("ال"):
        c = stem[0]
        if c in ("و", "ف"):
            parts_pre.append(c)
            stem = stem[1:]
            continue
        if stem.startswith("لل"):
            parts_pre.append("ل")
            stem = "ا" + stem[1:]
            break
        if c in ("ب", "ل", "ك") and stem[1:].startswith("ال"):
            parts_pre.append(c)
            stem = stem[1:]
            break
        if c == "س" and stem[1] in ("ي", "ت", "ن", "أ"):
            parts_pre.append(c)
            stem = stem[1:]
            break
        break
    parts_post: List[str] = []
    base = stem[2:] if stem.startswith("ال") else stem
    for enc in _AR_ENCLITICS:
        if base.endswith(enc) and len(base) - len(enc) >= 3 \
                and not stem.startswith("ال"):
            parts_post.insert(0, enc)
            stem = stem[: -len(enc)]
            break
    return parts_pre + [stem] + parts_post


def segment_arabic(text: str) -> List[str]:
    out: List[str] = []
    for m in _AR_TOKEN_RE.finditer(text or ""):
        tok = m.group(0)
        if _AR_LETTER.match(tok):
            out.extend(segment_arabic_token(tok))
        else:
            out.append(tok)
    return out


# --------------------------------------------------------------- stage ----

def detect_script(text: str) -> str:
    """Crude script router for lang-less rows: zh / ar / '' (latin)."""
    for ch in text[:200]:
        if _CJK_RE.match(ch):
            return "zh"
        if _AR_LETTER.match(ch):
            return "ar"
    return ""


def segment_text(text: str, lang: str = "") -> List[str]:
    lang = lang or detect_script(text or "")
    if lang == "zh":
        return segment_chinese(text)
    if lang == "ar":
        return segment_arabic(text)
    from corenlp_ray.stages.mwt import tokenize_generic

    return tokenize_generic(text, lang)


def segment_text_batch(batch: pa.Table) -> pa.Table:
    """Stateless map_batches stage over (…, text, lang): + tok_word,
    n_tokens for zh/ar/Latin rows (the non-English tokenizer branch —
    extends mwt_tokenize_batch's coverage to the CJK/Arabic share of a
    real crawl)."""
    toks_c, n_c = [], []
    langs = batch.column("lang").to_pylist() \
        if "lang" in batch.column_names else [""] * batch.num_rows
    for text, lang in zip(batch.column("text").to_pylist(), langs):
        toks = segment_text(text or "", lang or "")
        toks_c.append(toks)
        n_c.append(len(toks))
    return (batch
            .append_column("tok_word",
                           pa.array(toks_c, type=pa.list_(pa.string())))
            .append_column("n_tokens", pa.array(n_c, type=pa.int64())))
