"""Pure-Python kernel parity tests (no Spark): HTML round-trip, time parser
branches, base62 codec vs the JS spec embedded in the reference."""

from datetime import datetime

from wss_spark.extraction import kernel
from wss_spark.extraction.kernel import ANCHOR
from wss_spark.functions.base62 import id_to_mid, mid_to_id
from wss_spark.synth import Target, render_target_pages

NOW = datetime(2025, 10, 29, 12, 0, 0)


def test_page_text_byte_identical_roundtrip():
    total = 0
    for t_idx in range(150):
        for row in render_target_pages(Target(42, t_idx), 42):
            got = kernel.page_text(row["url"], row["html"], ANCHOR)
            assert got == row["text"], row["url"]
            total += 1
    assert total > 500


def test_parse_time_every_branch():
    # branches of 独立版/WeiboDeepAnalyzer.py:128-161
    assert kernel.parse_time("刚刚", NOW) == "2025-10-29 12:00"
    assert kernel.parse_time("5分钟前", NOW) == "2025-10-29 11:55"
    assert kernel.parse_time("2小时前 来自iPhone", NOW) == "2025-10-29 10:00"
    assert kernel.parse_time("今天 08:31 来自微博网页版", NOW) == "2025-10-29 08:31"
    assert kernel.parse_time("10月28日 20:08 来自nova 11 SE", NOW) == "2025-10-28 20:08"
    assert kernel.parse_time("3月5日", NOW) == "2025-03-05 00:00"
    assert kernel.parse_time("2024-12-31 23:59:59 来自X", NOW) == "2024-12-31 23:59"
    assert kernel.parse_time("短字符串", NOW) == "短字符串"


def test_clean_text():
    assert kernel.clean_text("  a\n\tb​c  ") == "a bc"
    assert kernel.clean_text(None) == ""
    assert kernel.clean_text("") == ""


def test_base62_js_spec_values():
    # values documented in the reference's embedded JS
    # (独立版/WeiboSuperCommentScrapy.py:72-94)
    assert id_to_mid("201110410216293360") == "wr4mOFqpbO"
    assert mid_to_id("wr4mOFqpbO") == "201110410216293360"


def test_base62_roundtrip():
    # The reference JS does not zero-pad base62 groups in id2mid
    # (独立版/WeiboSuperCommentScrapy.py:75-89), so id→mid→id round-trips
    # exactly for ids whose 7-digit groups encode to 4 base62 chars — which
    # all real weibo ids do. mid→id→mid round-trips for any 4-char-group mid.
    for n in [201110410216293360, 4391234045898245, 123456789123456789]:
        s = str(n)
        assert mid_to_id(id_to_mid(s)) == s
    for mid in ["wr4mOFqpbO", "Is0XboARR", "QbelLys5Z"]:
        assert id_to_mid(mid_to_id(mid)) == mid


def test_repost_slicing_quirks():
    # absolute times ARE trimmed out of content; 月日-format times are NOT
    # (独立版/WeiboDeepAnalyzer.py:493-513 quirk locked by fixture
    # QbelLys5Z_reposts.csv: content keeps "10月28日 20:08 来自...")
    html = (
        "<html><body>"
        '<div class="c"><a href="https://weibo.cn/u/123">某人</a>:转发微博 '
        '<span class="cc"><a href="">赞[3]</a></span> '
        '<span class="ct">10月28日 20:08 来自工具</span></div>'
        '<div class="c"><a href="https://weibo.cn/u/456">另一人</a>:好文 '
        '<span class="cc"><a href="">赞[0]</a></span> '
        '<span class="ct">2025-10-01 09:30:00 来自工具</span></div>'
        "</body></html>"
    )
    rows = kernel.extract_reposts_from_page(kernel.parse_html(html), NOW)
    assert rows[0]["content"] == "转发微博 10月28日 20:08 来自工具"
    assert rows[0]["like_count"] == 3
    assert rows[0]["publish_time"] == "2025-10-28 20:08"
    # absolute time normalizes to a substring of the raw text → trimmed
    assert rows[1]["content"] == "好文"
    assert rows[1]["publish_time"] == "2025-10-01 09:30"


def test_comment_reply_prefix_and_hot():
    html = (
        "<html><body>"
        '<div class="c" id="C_c1"><a href="https://weibo.cn/u/9">甲</a>'
        '<span class="ctt">回复<a href="/u/8">@乙</a>:说得对</span> '
        '<span class="cc"><a href="">赞[7]</a></span> '
        '<span class="ct">今天 10:00 来自iPhone</span></div>'
        '<div class="c" id="C_c2"><a href="https://weibo.cn/u/7">丙</a>'
        '<span class="kt">[热门]</span><span class="ctt">热评内容</span> '
        '<span class="cc"><a href="">赞[99]</a></span> '
        '<span class="ct">刚刚</span></div>'
        "</body></html>"
    )
    rows = kernel.extract_comments_from_page(kernel.parse_html(html), NOW)
    assert rows[0]["content"] == "说得对"
    assert rows[0]["commenter_id"] == "9"
    assert rows[0]["like_count"] == 7
    assert not rows[0]["is_hot"]
    assert rows[1]["is_hot"]
