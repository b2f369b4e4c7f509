"""Chinese + Arabic segmentation (round-2 verdict missing #7 —
ChineseSegmenterAnnotator / ArabicSegmenterAnnotator analogues,
stages/segmenter.py)."""
import pyarrow as pa

from corenlp_ray.stages.segmenter import (detect_script, segment_arabic,
                                          segment_arabic_token,
                                          segment_chinese, segment_text,
                                          segment_text_batch)


# ----------------------------------------------------------------- zh ----

def test_zh_basic_maxmatch():
    assert segment_chinese("我们喜欢中国") == ["我们", "喜欢", "中国"]


def test_zh_sentence_with_punct():
    got = segment_chinese("今天北京政府举行会议。")
    assert got == ["今天", "北京", "政府", "举行", "会议", "。"]


def test_zh_singletons_fall_out():
    # characters not forming lexicon words stay single
    got = segment_chinese("我去北京")
    assert got == ["我", "去", "北京"]


def test_zh_mixed_latin_digits():
    got = segment_chinese("公司2024年投资100万")
    assert "公司" in got and "2024" in got and "投资" in got \
        and "100" in got


def test_zh_longest_match_wins():
    # 为什么 must beat 为 + 什么
    assert segment_chinese("为什么") == ["为什么"]


def test_zh_empty():
    assert segment_chinese("") == []


# ----------------------------------------------------------------- ar ----

def test_ar_conjunction_proclitic():
    # والكتاب = و + الكتاب (conjunction splits, determiner stays)
    assert segment_arabic_token("والكتاب") == ["و", "الكتاب"]


def test_ar_preposition_proclitic():
    # بالقلم = ب + القلم
    assert segment_arabic_token("بالقلم") == ["ب", "القلم"]


def test_ar_lam_assimilation():
    # للكتاب = ل + الكتاب (restored ال)
    assert segment_arabic_token("للكتاب") == ["ل", "الكتاب"]


def test_ar_enclitic_pronoun():
    # كتابها = كتاب + ها (her book)
    assert segment_arabic_token("كتابها") == ["كتاب", "ها"]


def test_ar_determiner_not_split():
    assert segment_arabic_token("الكتاب") == ["الكتاب"]


def test_ar_short_word_untouched():
    assert segment_arabic_token("في") == ["في"]


def test_ar_sentence():
    got = segment_arabic("قرأت والكتاب في المدرسة")
    assert "و" in got and "الكتاب" in got and "المدرسة" in got


# -------------------------------------------------------- routing/stage ----

def test_detect_script():
    assert detect_script("今天天气") == "zh"
    assert detect_script("الكتاب") == "ar"
    assert detect_script("hello world") == ""


def test_segment_text_routes_by_lang_and_script():
    assert segment_text("我们喜欢中国", "zh") == ["我们", "喜欢", "中国"]
    assert segment_text("我们喜欢中国") == ["我们", "喜欢", "中国"]
    assert segment_text("bonjour du monde", "fr")[:2] == ["bonjour", "de"]


def test_segment_text_batch_stage():
    tbl = pa.Table.from_pydict({
        "doc_id": [1, 2, 3],
        "text": ["今天北京政府举行会议。", "قرأت بالقلم", "hello world"],
        "lang": ["zh", "ar", "en"],
    })
    out = segment_text_batch(tbl)
    toks = out.column("tok_word").to_pylist()
    assert toks[0][0] == "今天"
    assert toks[1][1] == "ب"
    assert toks[2] == ["hello", "world"]
    assert out.column("n_tokens").to_pylist() == [
        len(t) for t in toks]
