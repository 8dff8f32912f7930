"""Fixture tests for the native zh/en TN and pronunciation tables (C19).

Frozen sentence set mirroring the categories WeTextProcessing's zh ruleset
verbalizes (reference: cosyvoice/cli/frontend.py:124-152) and the
pronunciation surfaces of phonem_utils.py (pypinyin TONE3 / eng_to_ipa).
"""
from rwkvtts_tpu.data.zh_tn import (
    digits_to_zh,
    normalize_en,
    normalize_zh,
    num_to_en,
    num_to_zh,
)
from rwkvtts_tpu.data import en_g2p, pinyin


# ---------------------------------------------------------------------------
# zh cardinal reading


def test_num_to_zh():
    assert num_to_zh(0) == "零"
    assert num_to_zh(10) == "十"
    assert num_to_zh(15) == "十五"
    assert num_to_zh(105) == "一百零五"
    assert num_to_zh(110) == "一百一十"
    assert num_to_zh(123) == "一百二十三"
    assert num_to_zh(1005) == "一千零五"
    assert num_to_zh(10203) == "一万零二百零三"
    assert num_to_zh(100000001) == "一亿零一"
    assert num_to_zh(-42) == "负四十二"


def test_digits_to_zh():
    assert digits_to_zh("2024") == "二零二四"
    assert digits_to_zh("110", phone=True) == "幺幺零"


# ---------------------------------------------------------------------------
# zh TN categories (frozen fixtures)

_ZH_FIXTURES = [
    ("今天是2024年1月5日。", "今天是二零二四年一月五日。"),
    ("气温-5°C。", "气温零下五摄氏度。"),
    ("我有123个苹果和10005元。", "我有一百二十三个苹果和一万零五元。"),
    ("比例是3/4，涨了50%。", "比例是四分之三，涨了百分之五十。"),
    ("现在是10:30。", "现在是十点三十分。"),
    ("会议10:05:09结束。", "会议十点零五分九秒结束。"),
    ("请拨打13812345678。", "请拨打幺三八幺二三四五六七八。"),
    ("座机010-12345678。", "座机零幺零幺二三四五六七八。"),
    ("价格¥9.9。", "价格九点九元。"),
    ("重2kg，距离3.5km。", "重二千克，距离三点五千米。"),
    ("3~5天到货。", "三到五天到货。"),
    ("比分2:1获胜。", "比分二比一获胜。"),
    ("增长1,234,567人。", "增长一百二十三万四千五百六十七人。"),
    ("圆周率约3.14。", "圆周率约三点一四。"),
    ("编号123456789。", "编号一二三四五六七八九。"),
]


def test_normalize_zh_fixtures():
    for src, want in _ZH_FIXTURES:
        assert normalize_zh(src) == want, src


def test_normalize_zh_plain_text_unchanged():
    s = "这句话没有数字，不应该被改动。"
    assert normalize_zh(s) == s


# ---------------------------------------------------------------------------
# en number spelling (spell_out_number parity)


def test_num_to_en():
    assert num_to_en(0) == "zero"
    assert num_to_en(15) == "fifteen"
    assert num_to_en(105) == "one hundred and five"
    assert num_to_en(1234) == "one thousand two hundred and thirty-four"
    assert num_to_en(1000000) == "one million"


def test_normalize_en():
    out = normalize_en("I have 123 apples and 50% off.")
    assert "one hundred and twenty-three" in out
    assert "fifty percent" in out
    assert not any(c.isdigit() for c in out)


# ---------------------------------------------------------------------------
# pinyin table + IPA


def test_pinyin_table_common_chars():
    fixtures = {
        "中": "zhong1", "国": "guo2", "人": "ren2", "了": "le5",
        "的": "de5", "绿": "lv4", "月": "yue4", "女": "nv3", "去": "qu4",
    }
    for c, py in fixtures.items():
        assert pinyin.char_to_tone3(c) == py


def test_lazy_pinyin_tone3():
    assert pinyin.lazy_pinyin_tone3("中国人") == ["zhong1", "guo2", "ren2"]
    # non-CJK passes through
    assert pinyin.lazy_pinyin_tone3("中A") == ["zhong1", "A"]
    assert pinyin.lazy_pinyin_tone3("中A", errors="ignore") == ["zhong1"]


def test_pinyin_coverage_on_running_text():
    text = (
        "人工智能正在改变世界，语音合成技术让机器开口说话。"
        "今天天气很好，我们一起去公园散步吧。"
    )
    assert pinyin.coverage(text) == 1.0


def test_pinyin_to_ipa():
    assert pinyin.pinyin_to_ipa("zhong1") == "ʈʂʊŋ˥"
    assert pinyin.pinyin_to_ipa("lv4") == "ly˥˩"
    assert pinyin.pinyin_to_ipa("xue2") == "ɕɥɛ˧˥"
    assert pinyin.pinyin_to_ipa("shi4") == "ʂʐ̩˥˩"
    assert pinyin.pinyin_to_ipa("si1") == "sz̩˥"
    assert pinyin.pinyin_to_ipa("yu2") == "y˧˥"
    assert pinyin.pinyin_to_ipa("wo3") == "wo˨˩˦"
    assert pinyin.pinyin_to_ipa("le5") == "lɤ"


# ---------------------------------------------------------------------------
# en G2P


def test_g2p_exception_dict():
    assert en_g2p.convert("the") == "ðə"
    assert en_g2p.convert("one") == "wʌn"
    assert en_g2p.convert("through") == "θru"
    assert en_g2p.convert("knows") == "noʊz"  # stem + voiced tail


def test_g2p_rules():
    assert en_g2p.convert("make") == "meɪk"
    assert en_g2p.convert("time") == "taɪm"
    assert en_g2p.convert("station") == "steɪʃən"
    assert en_g2p.convert("quick") == "kwɪk"
    assert en_g2p.convert("phone") == "foʊn"
    assert en_g2p.convert("judge") == "dʒʌdʒ"
    # irregular-prone spellings carry the unsure '*' marker
    assert en_g2p.convert("speech").endswith("*")


def test_g2p_text():
    out = en_g2p.convert_text("the cat sat")
    assert out.split()[0] == "ðə"
    assert len(out.split()) == 3


# --- round-4 review regressions ------------------------------------------

from rwkvtts_tpu.data import zh_tn  # noqa: E402


def test_iso_date_not_range():
    assert zh_tn.normalize_zh("会议定于2024-01-05举行") == (
        "会议定于二零二四年一月五日举行"
    )


def test_hyphenated_service_number_digitwise():
    out = zh_tn.normalize_zh("电话400-123-4567")
    assert out == "电话四零零幺二三四五六七"


def test_percent_range_distributes():
    assert zh_tn.normalize_zh("10~20%的增长") == "百分之十到百分之二十的增长"
    assert "~" not in zh_tn.normalize_zh("10~20%")


def test_uppercase_single_letter_not_unit():
    out = zh_tn.normalize_zh("5G网络和3M胶带")
    assert "克" not in out and "米" not in out
    # lowercase single-letter units still verbalize
    assert zh_tn.normalize_zh("买了5g糖") == "买了五克糖"
    assert zh_tn.normalize_zh("跑了10km") == "跑了十千米"
