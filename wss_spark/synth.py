"""Deterministic synthetic pages-table generator (Common-Crawl-style).

Generates weibo.cn-shaped HTML pages per FIXTURES.md §1/§5 so the extraction
UDFs have real parsing work. Fully deterministic: every page is a pure
function of ``(seed, target_index)`` — no wall clock, no global RNG — so
generation is embarrassingly parallel (``spark.range(n) → mapInPandas``) and
reproducible at any scale.

The ``text`` column is the byte-identical-extraction oracle: it is built
*record-level* (straight string assembly from the underlying synthetic
records, applying the reference's cleaning/slicing semantics), NOT by parsing
the HTML — so tests of ``kernel.page_text(html)`` against it are a real
round-trip check.

Host distribution is deliberately skewed (~85% of urls on one host) to
exercise the salted-partitioning path (SURVEY.md §4.1).
"""

from __future__ import annotations

import random
import re
import zlib
from datetime import datetime, timedelta
from typing import Iterator

import pandas as pd

from wss_spark.extraction.kernel import (
    ANCHOR,
    clean_text,
    escape,
    parse_time,
    parse_time_sliced,
)
from wss_spark.schema import PAGES

HOT_HOST = "weibo.cn"
COLD_HOSTS = ["m1.weibo.example", "m2.weibo.example", "m3.weibo.example"]

_ZH_WORDS = (
    "今天 夜间 多云 转阴 有轻雾 东部地区 零星小雨 北风 二三级 最低气温 白天 "
    "天气预报 出行 注意安全 市气象台 发布 健康 科技 新闻 转发 好看 支持 加油 "
    "希望 一切顺利 真不错 哈哈 有意思 学习了 感谢分享 太好了 欢迎 关注 朋友"
).split()
_EN_WORDS = "data spark table query batch window join scan fast slow".split()
_EMOJI = ["😄", "👍", "🔥", "❤️", "🎉"]
_TOOLS = ["nova 11 SE", "微博手机版", "vivo S20", "微博网页版", "iPhone 15", "HUAWEI Mate"]
_NAMES1 = "李 王 张 刘 陈 杨 赵 黄 周 吴".split()
_NAMES2 = "茂盛 小水 文旅 之声 观察 日报 科技 爱好者 同学 先生".split()
_PLACES = ["北京", "上海", "广州", "深圳", "成都", "杭州", "无"]

_B62 = "0123456789abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ"


def _b62(n: int, width: int = 9) -> str:
    s = ""
    while n:
        s = _B62[n % 62] + s
        n //= 62
    return (s or "0").rjust(width, "Q")


def _rng(seed: int, *keys: int) -> random.Random:
    x = seed & 0xFFFFFFFF
    for k in keys:
        x = (x * 1000003 + k + 0x9E3779B9) & 0xFFFFFFFFFFFFFFFF
    return random.Random(x)


def _name(r: random.Random) -> str:
    return r.choice(_NAMES1) + r.choice(_NAMES2) + str(r.randrange(100))


def _sentence(r: random.Random, nmin: int, nmax: int, en: bool = False) -> str:
    words = _EN_WORDS if en else _ZH_WORDS
    n = r.randint(nmin, nmax)
    sep = " " if en else ""
    s = sep.join(r.choice(words) for _ in range(n))
    if r.random() < 0.15:
        s = r.choice(_EMOJI) + s
    if r.random() < 0.1:
        s += "#" + r.choice(_ZH_WORDS) + "#"
    return s


def _raw_time(r: random.Random) -> str:
    """A raw span.ct time string covering every branch of the time parser
    (`独立版/WeiboDeepAnalyzer.py:128-161`)."""
    kind = r.random()
    if kind < 0.05:
        return "刚刚"
    if kind < 0.15:
        return f"{r.randint(1, 59)}分钟前"
    if kind < 0.22:
        return f"{r.randint(1, 12)}小时前"
    if kind < 0.35:
        return f"今天 {r.randint(0, 23):02d}:{r.randint(0, 59):02d}"
    if kind < 0.75:
        d = ANCHOR - timedelta(days=r.randint(0, 60), minutes=r.randint(0, 1400))
        return f"{d.month:02d}月{d.day:02d}日 {d.hour:02d}:{d.minute:02d}"
    d = ANCHOR - timedelta(days=r.randint(0, 200), minutes=r.randint(0, 1400))
    return d.strftime("%Y-%m-%d %H:%M:%S")


# ---------------------------------------------------------------------------
# per-target synthetic model
# ---------------------------------------------------------------------------


class Target:
    """All facts about one crawl target (weibo post), derived from (seed, t)."""

    def __init__(self, seed: int, t: int):
        r = _rng(seed, t, 1)
        self.t = t
        self.wid = _b62(1_000_000_000_000_000 + t * 7919 + (seed % 7919))
        self.uid = str(2_000_000_000 + t * 13 + seed % 13)
        self.user_name = _name(r)
        self.host = HOT_HOST if r.random() < 0.85 else r.choice(COLD_HOSTS)
        self.n_comments = r.choice([0, r.randint(1, 8), r.randint(5, 35), r.randint(20, 60)])
        self.n_repost_pages = r.choice([0, 1, 1, 2, 3])
        self.reposts_per_page = r.randint(3, 10)
        self.has_longtext = r.random() < 0.25
        self.has_album = r.random() < 0.2
        self.n_images = r.randint(1, 6) if self.has_album else 0
        self.lang = "en" if r.random() < 0.05 else "zh"
        self.content_short = _sentence(r, 8, 20, en=(self.lang == "en"))
        self.full_content = self.content_short + _sentence(_rng(seed, t, 2), 20, 40)
        self.raw_time = _raw_time(r)
        self.tool = r.choice(_TOOLS)
        self.like = r.randint(0, 500)
        self.n_repost_total = self.n_repost_pages * self.reposts_per_page
        self.robots_blocked = self.host == COLD_HOSTS[-1] and r.random() < 0.5

    # --- urls -----------------------------------------------------------
    def url_main(self) -> str:
        return f"https://{self.host}/comment/{self.wid}"

    def url_comment_page(self, p: int) -> str:
        return f"https://{self.host}/comment/{self.wid}?page={p}"

    def url_repost_page(self, p: int) -> str:
        return f"https://{self.host}/repost/{self.wid}?page={p}"

    def url_fulltext(self) -> str:
        return f"https://{self.host}/comment/{self.wid}?ckAll=1"

    def url_album(self) -> str:
        return f"https://{self.host}/mblog/picAll/{self.wid}?rl=1"

    def url_info(self) -> str:
        return f"https://{self.host}/{self.uid}/info"

    @property
    def total_comment_pages(self) -> int:
        n = self.n_comments
        return (n // 10) + (1 if n % 10 > 0 else 0)

    # --- comments -------------------------------------------------------
    def comment(self, j: int, seed: int) -> dict:
        r = _rng(seed, self.t, 100 + j)
        cname = _name(r)
        cuid = str(5_000_000_000 + self.t * 1000 + j)
        reply = r.random() < 0.2
        body = _sentence(r, 3, 15)
        reply_to = _name(r) if reply else None
        return {
            "cid": "C" + _b62(7_000_000_000_000 + self.t * 100000 + j, width=8),
            "cuid": cuid,
            "cname": cname,
            "body": body,
            "reply_to": reply_to,
            "like": r.randint(0, 50) if r.random() < 0.4 else 0,
            "raw_time": _raw_time(r),
            "tool": r.choice(_TOOLS),
        }

    def repost(self, p: int, j: int, seed: int) -> dict:
        r = _rng(seed, self.t, 10_000 + p * 100 + j)
        kind = r.random()
        if kind < 0.3:
            body = "转发微博"
        elif kind < 0.35:
            body = "转发微博已被删除"
        else:
            body = _sentence(r, 2, 12)
        return {
            "ruid": str(3_000_000_000 + self.t * 10000 + p * 100 + j),
            "rname": _name(r),
            "body": body,
            "like": r.randint(0, 20) if r.random() < 0.3 else 0,
            "raw_time": _raw_time(r),
            "tool": r.choice(_TOOLS),
        }


# ---------------------------------------------------------------------------
# HTML rendering + record-level oracle text
# ---------------------------------------------------------------------------


def _weibo_block_html(t: Target) -> str:
    ctt = ":" + escape(t.content_short)
    if t.has_longtext:
        ctt += ' <a href="/comment/' + t.wid + '?ckAll=1">全文</a>'
    album = f' <a href="https://{t.host}/mblog/picAll/{t.wid}?rl=1">组图共{t.n_images}张</a>' if t.has_album else ""
    return (
        f'<div class="c" id="M_{t.wid}">'
        f'<div><a class="nk" href="https://{t.host}/u/{t.uid}">{escape(t.user_name)}</a>'
        f'<span class="ctt">{ctt}</span>{album}</div>'
        f'<div><span class="ct">{escape(t.raw_time)} 来自{escape(t.tool)}</span></div>'
        f'<div><span class="cmt">评论[{t.n_comments}]</span> <a href="">赞[{t.like}]</a> '
        f'<a href="">转发[{t.n_repost_total}]</a></div>'
        f"</div>"
    )


def _weibo_oracle_content(t: Target) -> str:
    """What the reference extracts from the main ctt span (truncated view)."""
    raw = ":" + t.content_short + (" 全文" if t.has_longtext else "")
    c = clean_text(raw)
    if c.startswith(":"):
        c = c[1:].strip()
    return c


def _comment_block_html(c: dict, host: str, hot: bool = False) -> str:
    kt = '<span class="kt">[热门]</span>' if hot else ""
    if c["reply_to"]:
        inner = f'回复<a href="https://{host}/u/1{c["cuid"]}">@{escape(c["reply_to"])}</a>:{escape(c["body"])}'
    else:
        inner = escape(c["body"])
    return (
        f'<div class="c" id="C_{c["cid"]}">'
        f'<a href="https://{host}/u/{c["cuid"]}">{escape(c["cname"])}</a>{kt}'
        f'<span class="ctt">{inner}</span> '
        f'<span class="cc"><a href="">赞[{c["like"]}]</a></span> '
        f'<span class="ct">{escape(c["raw_time"])} 来自{escape(c["tool"])}</span>'
        f"</div>"
    )


def _comment_oracle_content(c: dict) -> str:
    raw = (f'回复@{c["reply_to"]}:' if c["reply_to"] else "") + c["body"]
    content = clean_text(raw)
    if content.startswith("回复"):
        colon_idx = content.find(":")
        if colon_idx > 0:
            content = content[colon_idx + 1 :].strip()
    return content


def _repost_block_html(r: dict, host: str) -> str:
    return (
        f'<div class="c"><a href="https://{host}/u/{r["ruid"]}">{escape(r["rname"])}</a>'
        f':{escape(r["body"])} '
        f'<span class="cc"><a href="">赞[{r["like"]}]</a></span> '
        f'<span class="ct">{escape(r["raw_time"])} 来自{escape(r["tool"])}</span>'
        f"</div>"
    )


def _repost_oracle_content(r: dict) -> str:
    """Record-level replay of `独立版/WeiboDeepAnalyzer.py:489-513` slicing."""
    full = f'{r["rname"]}:{r["body"]} 赞[{r["like"]}] {r["raw_time"]} 来自{r["tool"]}'
    pt = parse_time(r["raw_time"], ANCHOR)
    if pt and pt in full:
        full = full[: full.rfind(pt)]
    full = re.sub(r"赞\[\d+\]", "", full)
    if r["rname"] + ":" in full:
        full = full.split(r["rname"] + ":", 1)[1]
    return clean_text(full)


_HEAD = "<html><head><title>微博广场</title></head><body>"
_TAIL = "</body></html>"


def target_user_dim(t: Target, seed: int) -> dict:
    """The user-dim facts rendered into target t's /info page — pure function
    shared by the HTML renderer and record-level oracles (J1/J2)."""
    rr = _rng(seed, t.t, 4)
    return {
        "uid": t.uid,
        "nickname": t.user_name,
        "gender": rr.choice(["男", "女"]),
        "location": rr.choice(_PLACES),
        "weibo_num": rr.randint(10, 9000),
        "following_num": rr.randint(0, 2000),
        "followers_num": rr.randint(0, 100000),
    }


def render_target_pages(t: Target, seed: int) -> list[dict]:
    """All pages rows for one target: (url, warc_ts, html, text, lang)."""
    rows: list[dict] = []
    r = _rng(seed, t.t, 3)
    warc_base = ANCHOR - timedelta(days=1)

    def emit(url: str, html: str, text: str):
        ts = warc_base + timedelta(seconds=(len(rows) * 37 + t.t * 101) % 86400)
        rows.append({"url": url, "warc_ts": ts, "html": html.encode("utf-8"), "text": text, "lang": t.lang})

    comments = [t.comment(j, seed) for j in range(t.n_comments)]

    # main content page /comment/{wid}
    main_parts = [_weibo_oracle_content(t)]
    first10 = comments[:10]
    main_html = _HEAD + _weibo_block_html(t)
    # a hot-comment duplicate shown before regular comments (skipped by engine)
    if first10 and r.random() < 0.3:
        main_html += _comment_block_html(first10[0], t.host, hot=True)
    for c in first10:
        main_html += _comment_block_html(c, t.host)
        main_parts.append(_comment_oracle_content(c))
    emit(t.url_main(), main_html + _TAIL, "\n".join(main_parts))

    # fulltext page
    if t.has_longtext:
        ft_html = (
            _HEAD
            + f'<div class="c" id="M_{t.wid}">'
            + f'<div><a class="nk" href="https://{t.host}/u/{t.uid}">{escape(t.user_name)}</a>'
            + f'<span class="ctt">:{escape(t.full_content)}</span></div>'
            + f'<div><span class="ct">{escape(t.raw_time)} 来自{escape(t.tool)}</span></div>'
            + f'<div><span class="cmt">评论[{t.n_comments}]</span> <a href="">赞[{t.like}]</a></div>'
            + "</div>"
            + _TAIL
        )
        emit(t.url_fulltext(), ft_html, clean_text(t.full_content))

    # album page
    if t.has_album:
        imgs = ""
        for i in range(t.n_images):
            style = "thumb180" if i % 2 == 0 else "wap180"
            imgs += f'<img src="https://wx{(i % 4) + 1}.sinaimg.cn/{style}/pic{t.wid}_{i}.jpg"/>'
        emit(t.url_album(), _HEAD + imgs + _TAIL, "")

    # comment pages 1..N (page 1 repeats the main page's comment slice —
    # the reference re-fetches ?page=1; FIXTURES.md §5 overlap/dup case)
    for p in range(1, t.total_comment_pages + 1):
        segment = comments[(p - 1) * 10 : p * 10]
        html = _HEAD + _weibo_block_html(t)
        parts = [_weibo_oracle_content(t)] if p == 1 else []
        if p == 1 and first10 and r.random() < 0.3:
            html += _comment_block_html(first10[0], t.host, hot=True)
        # duplicate-overlap: first block of page p>=2 repeats last of page p-1
        if p >= 2 and r.random() < 0.3:
            dup = comments[(p - 1) * 10 - 1]
            html += _comment_block_html(dup, t.host)
            parts.append(_comment_oracle_content(dup))
        for c in segment:
            html += _comment_block_html(c, t.host)
            parts.append(_comment_oracle_content(c))
        # NOTE: p>=2 pages still carry the M block; oracle text counts it only
        # on page 1 (kernel.page_text contract).
        emit(t.url_comment_page(p), html + _TAIL, "\n".join(parts))

    # repost pages 1..K, then one empty stop-probe page (scan-until-empty S6)
    for p in range(1, t.n_repost_pages + 1):
        html = _HEAD
        # original-post skeleton without a direct <a> child (skipped by P2)
        html += (
            f'<div class="c"><div><a class="nk" href="https://{t.host}/u/{t.uid}">'
            f'{escape(t.user_name)}</a><span class="ctt">:{escape(t.content_short)}</span></div></div>'
        )
        parts = []
        for j in range(t.reposts_per_page):
            rp = t.repost(p, j, seed)
            html += _repost_block_html(rp, t.host)
            parts.append(_repost_oracle_content(rp))
        emit(t.url_repost_page(p), html + _TAIL, "\n".join(parts))
    if t.n_repost_pages >= 0:
        empty_p = t.n_repost_pages + 1
        emit(t.url_repost_page(empty_p), _HEAD + "<div class=\"pa\" id=\"pagelist\">空</div>" + _TAIL, "")

    # profile info page (user dim source, J1/J2)
    dim = target_user_dim(t, seed)
    gender, loc = dim["gender"], dim["location"]
    w_num, fo_num, fa_num = dim["weibo_num"], dim["following_num"], dim["followers_num"]
    info_html = (
        f"<html><head><title>{escape(t.user_name)}的微博</title></head><body>"
        f'<div class="tip2"><span>微博[{w_num}]</span>'
        f"<span>关注[{fo_num}]</span>"
        f"<span>粉丝[{fa_num}]</span></div>"
        f'<div class="c">昵称:{escape(t.user_name)} 性别:{gender} 地区:{loc}</div>'
        f"{_TAIL}"
    )
    info_text = clean_text(
        f"微博[{w_num}]关注[{fo_num}]粉丝[{fa_num}]昵称:{t.user_name} 性别:{gender} 地区:{loc}"
    )
    emit(t.url_info(), info_html, info_text)

    return rows


def expected_comment_rows(n_targets: int, seed: int = 42) -> list[dict]:
    """Record-level replay of every comment row the extraction stage emits
    over ``build_pages_df(n_targets, seed)`` — WITHOUT touching HTML or the
    kernel. Mirrors render_target_pages' emission draws exactly (hot dup on
    ~30% of main/p1 pages at block 0, duplicate-overlap row on ~30% of
    pages ≥ 2), with block indices as the DOM positions the parser reports
    (hot blocks consume an index even though extract_comments drops them)."""
    out: list[dict] = []
    for t_idx in range(n_targets):
        t = Target(seed, t_idx)
        comments = [t.comment(j, seed) for j in range(t.n_comments)]
        first10 = comments[:10]
        r = _rng(seed, t.t, 3)

        def emit_page(url: str, page_no: int, seg: list[dict], hot_first: bool,
                      dup: dict | None) -> None:
            idx = 0
            if hot_first:
                idx += 1  # hot block occupies index 0, dropped by P5
            ordered = ([dup] if dup is not None else []) + seg
            for c in ordered:
                content = clean_text(
                    (f'回复@{c["reply_to"]}:' if c["reply_to"] else "") + c["body"]
                )
                if content.startswith("回复"):
                    ci = content.find(":")
                    if ci > 0:
                        content = content[ci + 1 :].strip()
                out.append(
                    {
                        "root_wid": t.wid,
                        "page": page_no,
                        "block_index": idx,
                        "comment_id": c["cid"],
                        "commenter_id": c["cuid"],
                        "commenter_name": c["cname"],
                        "content": content,
                        "like_count": c["like"],
                        "publish_time": parse_time(
                            f'{c["raw_time"]} 来自{c["tool"]}', ANCHOR
                        ),
                    }
                )
                idx += 1

        # main page (same r-draw order as render_target_pages)
        hot_main = bool(first10) and r.random() < 0.3
        emit_page(t.url_main(), 1, first10, hot_main, None)
        for p in range(1, t.total_comment_pages + 1):
            seg = comments[(p - 1) * 10 : p * 10]
            hot = p == 1 and bool(first10) and r.random() < 0.3
            dup = comments[(p - 1) * 10 - 1] if (p >= 2 and r.random() < 0.3) else None
            emit_page(t.url_comment_page(p), p, seg, hot, dup)
    return out


# ---------------------------------------------------------------------------
# user-timeline page family (FIXTURES.md §3.5; `(using)WeiboUserScrapy.py`)
# ---------------------------------------------------------------------------

TIMELINE_PER_PAGE = 5


def _timeline_post(t: Target, j: int, seed: int) -> dict:
    """One timeline entry of author t: original or retweet (with deleted
    variant), images, footer counters. RNG streams (seed,t,200+j) are
    disjoint from every other family — adding timelines never perturbs
    existing page bytes."""
    r = _rng(seed, t.t, 200 + j)
    kind = r.random()
    post = {
        "twid": _b62(2_000_000_000_000_000 + t.t * 100003 + j, width=9),
        "is_origin": kind < 0.65,
        "deleted": False,
        "content": _sentence(r, 6, 18),
        "orig_user": None,
        "orig_content": None,
        "reason": None,
        "raw_time": _raw_time(r),
        "tool": r.choice(_TOOLS),
        "like": r.randint(0, 300),
        "fwd": r.randint(0, 120),
        "cmt": r.randint(0, 80),
        "n_imgs": r.randint(1, 3) if r.random() < 0.3 else 0,
        "has_album_link": r.random() < 0.15,
    }
    if not post["is_origin"]:
        post["deleted"] = r.random() < 0.15
        post["orig_user"] = _name(r)
        post["orig_content"] = _sentence(r, 8, 20)
        post["reason"] = _sentence(r, 2, 8)
        post["n_imgs"] = 0
    return post


def _timeline_block_html(t: Target, p: dict) -> str:
    imgs = "".join(
        f'<img src="https://wx{(i % 4) + 1}.sinaimg.cn/'
        f'{"thumb180" if i % 2 == 0 else "wap180"}/tl{p["twid"]}_{i}.jpg"/>'
        for i in range(p["n_imgs"])
    )
    album = (
        f' <a href="https://{t.host}/mblog/picAll/{p["twid"]}?rl=1">组图</a>'
        if p["has_album_link"] else ""
    )
    ct = f'<span class="ct">{escape(p["raw_time"])} 来自{escape(p["tool"])}</span>'
    footer = f'赞[{p["like"]}] 转发[{p["fwd"]}] 评论[{p["cmt"]}] {ct}'
    if p["is_origin"]:
        return (
            f'<div class="c" id="M_{p["twid"]}">'
            f'<div><span class="ctt">:{escape(p["content"])}</span>{imgs}{album}</div>'
            f"<div>{footer}</div></div>"
        )
    if p["deleted"]:
        body = '<div><span class="cmt">转发了微博</span><span class="ctt">转发微博已被删除</span></div>'
    else:
        body = (
            f'<div><span class="cmt">转发了 <a href="https://{t.host}/u/9{t.t}9">'
            f'{escape(p["orig_user"])}</a> 的微博</span>'
            f'<span class="ctt">:{escape(p["orig_content"])}</span></div>'
        )
    # 4 span.cmt total → is_origin False per the ≤3 rule (P3); the two
    # filler spans are empty so they never pollute the extracted reason
    return (
        f'<div class="c" id="M_{p["twid"]}">{body}'
        f'<div><span class="cmt">转发理由:</span>{escape(p["reason"] or "")} '
        f'<span class="cmt"></span><span class="cmt"></span>{footer}</div></div>'
    )


def _timeline_oracle_content(p: dict) -> str:
    """Record-level replay of the engine's timeline semantics (F8/P3)."""
    if p["is_origin"]:
        return clean_text(p["content"])
    if p["deleted"]:
        return "转发微博已被删除"
    reason = clean_text(p["reason"] or "")
    return f'{reason}\n原始用户: {p["orig_user"]}\n转发内容: {clean_text(p["orig_content"])}'


def render_timeline_pages(t: Target, seed: int) -> list[dict]:
    """Profile timeline pages for target t's author: /uid/profile?page=N."""
    r = _rng(seed, t.t, 6)
    n_posts = r.randint(3, 12)
    posts = [_timeline_post(t, j, seed) for j in range(n_posts)]
    warc_base = ANCHOR - timedelta(hours=6)
    rows: list[dict] = []
    n_pages = (n_posts + TIMELINE_PER_PAGE - 1) // TIMELINE_PER_PAGE
    for page in range(1, n_pages + 1):
        seg = posts[(page - 1) * TIMELINE_PER_PAGE : page * TIMELINE_PER_PAGE]
        html = _HEAD + "".join(_timeline_block_html(t, p) for p in seg) + _TAIL
        text = "\n".join(_timeline_oracle_content(p) for p in seg)
        ts = warc_base + timedelta(seconds=(t.t * 131 + page * 17) % 86400)
        rows.append(
            {
                "url": f"https://{t.host}/{t.uid}/profile?page={page}",
                "warc_ts": ts,
                "html": html.encode("utf-8"),
                "text": text,
                "lang": t.lang,
            }
        )
    return rows


def build_timeline_pages_df(spark, n_targets: int, seed: int = 42,
                            partitions: int | None = None):
    """Distributed deterministic timeline-page generation (same pattern as
    build_pages_df)."""
    partitions = partitions or max(8, min(n_targets // 64 + 1, 256))

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: list[dict] = []
            for t_idx in pdf["id"]:
                out.extend(render_timeline_pages(Target(seed, int(t_idx)), seed))
            yield pd.DataFrame(out, columns=["url", "warc_ts", "html", "text", "lang"])

    return spark.range(0, n_targets, numPartitions=partitions).mapInPandas(gen, schema=PAGES)


# ---------------------------------------------------------------------------
# topic-search page family (`独立版/WeiboTopicScrapy.py`; SURVEY §2 J2/F17)
# ---------------------------------------------------------------------------

SEARCH_HITS_PER_PAGE = 10


def n_search_keywords(n_targets: int) -> int:
    return max(1, n_targets // 5)


def search_url(host: str, kw: str, page: int) -> str:
    """F12 — advanced-search URL construction
    (`独立版/WeiboTopicScrapy.py:438-446` params, sans cookie plumbing)."""
    return f"https://{host}/search/mblog?keyword={kw}&page={page}"


def _raw_time_topic(r: random.Random) -> str:
    """Raw span.ct times for search hits: every branch of the topic spider's
    sliced parser (`独立版/WeiboTopicScrapy.py:203-228`) — note: NO 小时 form
    (that parser has no hour branch) and 月日 always zero-padded."""
    kind = r.random()
    if kind < 0.06:
        return "刚刚"
    if kind < 0.18:
        return f"{r.randint(1, 59)}分钟前"
    if kind < 0.34:
        return f"今天 {r.randint(0, 23):02d}:{r.randint(0, 59):02d}"
    if kind < 0.78:
        d = ANCHOR - timedelta(days=r.randint(0, 60), minutes=r.randint(0, 1400))
        return f"{d.month:02d}月{d.day:02d}日 {d.hour:02d}:{d.minute:02d}"
    d = ANCHOR - timedelta(days=r.randint(0, 200), minutes=r.randint(0, 1400))
    return d.strftime("%Y-%m-%d %H:%M:%S")


def _search_hit(kw_i: int, j: int, t: Target, seed: int) -> dict:
    """One search-result post authored by target t's user."""
    r = _rng(seed, 90_000 + kw_i, j)
    hit = {
        "swid": _b62(3_000_000_000_000_000 + kw_i * 1_000_003 + j * 31, width=9),
        "uid": t.uid,
        "name": t.user_name,
        "host": t.host,
        "is_origin": r.random() < 0.6,
        "content": _sentence(r, 6, 16),
        "place": r.choice(_PLACES[:-1]) if r.random() < 0.2 else None,
        "orig_name": None,
        "orig_content": None,
        "reason": None,
        "o_like": 0, "o_fwd": 0, "o_cmt": 0,
        "raw_time": _raw_time_topic(r),
        "tool": r.choice(_TOOLS),
        "like": r.randint(0, 200),
        "fwd": r.randint(0, 80),
        "cmt": r.randint(0, 40),
        "has_album": r.random() < 0.12,
        "n_images": 0,
    }
    if hit["has_album"]:
        hit["n_images"] = r.randint(1, 4)
    if not hit["is_origin"]:
        hit["orig_name"] = _name(r)
        hit["orig_content"] = _sentence(r, 8, 18)
        hit["reason"] = _sentence(r, 2, 6)
        hit["o_like"] = r.randint(0, 99)
        hit["o_fwd"] = r.randint(0, 50)
        hit["o_cmt"] = r.randint(0, 30)
        hit["place"] = None
        hit["has_album"] = False
        hit["n_images"] = 0
    return hit


def _search_hit_html(h: dict) -> str:
    album = (
        f' <a href="https://{h["host"]}/mblog/picAll/{h["swid"]}?rl=1">组图共{h["n_images"]}张</a>'
        if h["has_album"] else ""
    )
    ct = f'<span class="ct">{escape(h["raw_time"])} 来自{escape(h["tool"])}</span>'
    footer = f'赞[{h["like"]}] 转发[{h["fwd"]}] 评论[{h["cmt"]}] {ct}'
    if h["is_origin"]:
        place = (
            f' <a href="https://place.weibo.com/p/1">{escape(h["place"])}</a></span>'
            f' <a href="https://place.weibo.com/map">显示地图</a>'
            if h["place"]
            else "</span>"
        )
        return (
            f'<div class="c" id="M_{h["swid"]}">'
            f'<div><a class="nk" href="https://{h["host"]}/u/{h["uid"]}">{escape(h["name"])}</a>'
            f'<span class="ctt">:{escape(h["content"])}{place}{album}</div>'
            f"<div>{footer}</div></div>"
        )
    return (
        f'<div class="c" id="M_{h["swid"]}">'
        f'<div><a class="nk" href="https://{h["host"]}/u/{h["uid"]}">{escape(h["name"])}</a>'
        f'<span class="cmt">转发了 <a href="https://{h["host"]}/u/9{h["uid"]}">'
        f'{escape(h["orig_name"])}</a> 的微博</span>'
        f'<span class="ctt">:{escape(h["orig_content"])}</span></div>'
        f'<div><span class="cmt">赞[{h["o_like"]}]</span>'
        f'<span class="cmt">原文转发[{h["o_fwd"]}]</span>'
        f'<span class="cmt">原文评论[{h["o_cmt"]}]</span></div>'
        f'<div>转发理由:{escape(h["reason"])} {footer}</div></div>'
    )


def _search_hit_oracle(h: dict) -> dict:
    """Record-level replay of the topic spider's slicing (NOT via the DOM) —
    content/place/time/tool exactly as `WeiboTopicScrapy.get_one_weibo`
    renders them from the HTML above."""
    if h["is_origin"]:
        tail = ""
        if h["place"]:
            tail = f' {h["place"]} 显示地图'
        if h["has_album"]:
            tail += f' 组图共{h["n_images"]}张'
        content = f'{h["name"]}:{h["content"]}{tail}'
    else:
        reason = f'转发理由:{h["reason"]} '
        content = (
            f'{reason}\n原始用户: {h["orig_name"]}\n转发内容: {h["orig_content"]}'
        )
    return {
        "wid": h["swid"],
        "publisher_uid": h["uid"],
        "is_origin": h["is_origin"],
        "content": content,
        "publish_place": h["place"] if (h["is_origin"] and h["place"]) else "无",
        "publish_time": parse_time_sliced(
            f'{h["raw_time"]} 来自{h["tool"]}', ANCHOR,
            pad=False, hour_branch=False, split_source=True,
        ),
        "publish_tool": h["tool"],
        "like_count": h["like"],
        "forward_count": h["fwd"],
        "comment_count": h["cmt"],
    }


def search_keyword_hits(kw_i: int, n_targets: int, seed: int) -> list[dict]:
    """All hits of keyword kw_i, deterministic order (targets ascending,
    1-2 hits each)."""
    n_kw = n_search_keywords(n_targets)
    hits: list[dict] = []
    for t_idx in range(kw_i, n_targets, n_kw):
        t = Target(seed, t_idx)
        r = _rng(seed, 91_000 + kw_i, t_idx)
        for j in range(1 + (1 if r.random() < 0.35 else 0)):
            hits.append(_search_hit(kw_i, t_idx * 4 + j, t, seed))
    return hits


def render_search_pages(kw_i: int, n_targets: int, seed: int) -> list[dict]:
    """Search-result pages for keyword kw_i: 10 hits/page, one trailing empty
    page (scan-until-empty S6, `独立版/WeiboTopicScrapy.py:454-457`)."""
    kw = f"topic{kw_i}"
    hits = search_keyword_hits(kw_i, n_targets, seed)
    host = HOT_HOST
    warc_base = ANCHOR - timedelta(hours=3)
    rows: list[dict] = []
    n_pages = (len(hits) + SEARCH_HITS_PER_PAGE - 1) // SEARCH_HITS_PER_PAGE
    for page in range(1, n_pages + 2):  # +1 trailing empty page
        seg = hits[(page - 1) * SEARCH_HITS_PER_PAGE : page * SEARCH_HITS_PER_PAGE]
        html = _HEAD + "".join(_search_hit_html(h) for h in seg) + _TAIL
        text = "\n".join(_search_hit_oracle(h)["content"] for h in seg)
        ts = warc_base + timedelta(seconds=(kw_i * 211 + page * 13) % 86400)
        rows.append(
            {
                "url": search_url(host, kw, page),
                "warc_ts": ts,
                "html": html.encode("utf-8"),
                "text": text,
                "lang": "zh",
            }
        )
    return rows


def build_search_pages_df(spark, n_targets: int, seed: int = 42,
                          partitions: int | None = None):
    n_kw = n_search_keywords(n_targets)
    partitions = partitions or max(4, min(n_kw // 8 + 1, 256))

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: list[dict] = []
            for kw_i in pdf["id"]:
                out.extend(render_search_pages(int(kw_i), n_targets, seed))
            yield pd.DataFrame(out, columns=["url", "warc_ts", "html", "text", "lang"])

    return spark.range(0, n_kw, numPartitions=partitions).mapInPandas(gen, schema=PAGES)


def windowed_search_url(host: str, kw: str, starttime: str, endtime: str,
                        page: int) -> str:
    """F17 — the advanced-search windowed URL, same param order as
    crawl.discover.search_window_urls (`独立版/WeiboTopicScrapy.py:438-446`)."""
    return (
        f"https://{host}/search/mblog?keyword={kw}&advancedfilter=1"
        f"&starttime={starttime}&endtime={endtime}&sort=time&page={page}"
    )


def render_windowed_search_pages(kw_i: int, n_targets: int, seed: int,
                                 windows: list[tuple[str, str]]) -> list[dict]:
    """Search pages re-addressed at advanced-search windowed URLs: each
    (starttime, endtime) window carries the SAME deterministic hit chain as
    the plain search (content is window-invariant in the synth model), so a
    correct engine must crawl one full scan-until-empty chain per window —
    with the window params preserved on every continuation page."""
    out: list[dict] = []
    for st, et in windows:
        for row in render_search_pages(kw_i, n_targets, seed):
            m = re.search(r"https?://([^/]+)/search/mblog\?keyword=([^&#]+)&page=(\d+)",
                          row["url"])
            out.append(
                {**row,
                 "url": windowed_search_url(m.group(1), m.group(2), st, et,
                                            int(m.group(3)))}
            )
    return out


# ---------------------------------------------------------------------------
# article page family (`独立版/WeiboComPostSpider.py:114-137` <p> walk, F15)
# ---------------------------------------------------------------------------


def _article_paras(t: Target, seed: int) -> list[dict]:
    r = _rng(seed, t.t, 7)
    paras = []
    for i in range(r.randint(3, 8)):
        kind = r.random()
        p = {"img": None, "text": None, "deep": False}
        if kind < 0.2:
            p["img"] = f"https://wx{(i % 4) + 1}.sinaimg.cn/large/art{t.t}_{i}.jpg"
        if kind >= 0.1 and kind < 0.9:
            p["text"] = _sentence(r, 5, 25)
            p["deep"] = r.random() < 0.3  # text nested under <b>
        paras.append(p)
    return paras


def render_article_pages(t: Target, seed: int) -> list[dict]:
    r = _rng(seed, t.t, 8)
    if r.random() >= 0.3:
        return []
    aid = "a" + _b62(4_000_000_000_000 + t.t * 101, width=8)
    paras = _article_paras(t, seed)
    body = ""
    parts: list[str] = []
    for p in paras:
        inner = ""
        if p["img"]:
            inner += f'<img src="{p["img"]}"/>'
            parts.append(p["img"])
        if p["text"]:
            if p["deep"]:
                inner += f'<b>{escape(p["text"])}</b>尾注'
            else:
                inner += escape(p["text"])
            parts.append(p["text"])  # first text node only (the <b> one)
        body += f"<p>{inner}</p>"
    ts = ANCHOR - timedelta(hours=12) + timedelta(seconds=(t.t * 67) % 86400)
    return [
        {
            "url": f"https://{t.host}/article/{aid}",
            "warc_ts": ts,
            "html": (_HEAD + body + _TAIL).encode("utf-8"),
            "text": "\n".join(parts),
            "lang": t.lang,
        }
    ]


def build_article_pages_df(spark, n_targets: int, seed: int = 42,
                           partitions: int | None = None):
    partitions = partitions or max(4, min(n_targets // 64 + 1, 256))

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: list[dict] = []
            for t_idx in pdf["id"]:
                out.extend(render_article_pages(Target(seed, int(t_idx)), seed))
            yield pd.DataFrame(out, columns=["url", "warc_ts", "html", "text", "lang"])

    return spark.range(0, n_targets, numPartitions=partitions).mapInPandas(gen, schema=PAGES)


# ---------------------------------------------------------------------------
# user-search family (`独立版/SearchUser.py` name→uid, J6)
# ---------------------------------------------------------------------------


def name_uid_pairs(n_targets: int, seed: int) -> list[tuple[str, str]]:
    """(user_name → uid of the FIRST target bearing it) — first-hit
    resolution, the reference's semantics for ambiguous names."""
    best: dict[str, str] = {}
    for t_idx in range(n_targets):
        t = Target(seed, t_idx)
        best.setdefault(t.user_name, t.uid)
    return sorted(best.items())


def render_usersearch_page(name: str, uid: str, seed: int) -> dict:
    """One s.weibo.com-style user-search page: the first card is the
    resolving hit; 0-2 decoy cards follow; ~12% of names have NO user card
    (→ uid -1, `独立版/SearchUser.py:17-18`)."""
    # NOT builtins.hash(): str hash is salted per process (PYTHONHASHSEED)
    # and would break cross-worker determinism
    r = _rng(seed, zlib.crc32(name.encode("utf-8")), 5)
    cards = ""
    if r.random() >= 0.12:
        cards += (
            '<div class="card card-user-b s-pg16"><div class="avator">'
            f'<a href="https://weibo.com/u/{uid}"><img src="https://x/av{uid}.jpg"/></a>'
            f"</div><div>{escape(name)}</div></div>"
        )
        for d in range(r.randint(0, 2)):
            cards += (
                '<div class="card card-user-b s-pg16"><div class="avator">'
                f'<a href="https://weibo.com/u/77{d}{uid}"></a>'
                f"</div><div>{escape(name)}_{d}</div></div>"
            )
    ts = ANCHOR - timedelta(hours=1)
    return {
        "url": f"https://s.weibo.example/user?q={name}",
        "warc_ts": ts,
        "html": (_HEAD + cards + _TAIL).encode("utf-8"),
        "text": "",
        "lang": "zh",
    }


def build_usersearch_pages_df(spark, n_targets: int, seed: int = 42):
    pairs = name_uid_pairs(n_targets, seed)
    rows = [render_usersearch_page(n, u, seed) for n, u in pairs]
    return spark.createDataFrame(rows, PAGES)


# ---------------------------------------------------------------------------
# hotflow max_id cursor family (`独立版/WeiboSuperCommentScrapy.py:375-430`)
# ---------------------------------------------------------------------------


def hotflow_url(wid: str, max_id: str | None) -> str:
    if max_id is None:
        return f"https://m.weibo.cn/comments/hotflow?id={wid}&mid={wid}&max_id_type=0"
    return (
        f"https://m.weibo.cn/comments/hotflow?id={wid}&mid={wid}"
        f"&max_id={max_id}&max_id_type=0"
    )


def _hotflow_comment(t: Target, k: int, j: int, seed: int) -> dict:
    r = _rng(seed, t.t, 50_000 + k * 100 + j)
    c = {
        "id": str(8_000_000_000_000_000 + t.t * 100_000 + k * 1000 + j),
        "created_at": _raw_time(r),
        "text": _sentence(r, 3, 12)
        + ("<span class=\"url-icon\">x</span>" if r.random() < 0.15 else ""),
        "user": {
            "id": 5_000_000_000 + t.t * 1000 + k * 50 + j,
            "screen_name": _name(r),
            "follow_count": r.randint(0, 2000),
            "followers_count": r.randint(0, 90000),
            "gender": r.choice(["m", "f"]),
        },
    }
    if r.random() < 0.7:
        c["like_count"] = r.randint(0, 500)
    if r.random() < 0.2:
        c["comments"] = [
            {
                "id": c["id"] + f"9{cc}",
                "created_at": _raw_time(_rng(seed, t.t, 60_000 + k * 100 + j * 5 + cc)),
                "text": _sentence(_rng(seed, t.t, 61_000 + k * 100 + j * 5 + cc), 2, 8),
                "user": {
                    "id": 6_000_000_000 + t.t * 1000 + j * 10 + cc,
                    "screen_name": _name(_rng(seed, t.t, 62_000 + j * 5 + cc)),
                    "follow_count": 1,
                    "followers_count": 2,
                    "gender": "m",
                },
                "like_count": cc,
            }
            for cc in range(1 + (j % 2))
        ]
    return c


def hotflow_chain(t: Target, seed: int) -> list[tuple[str | None, str, list[dict]]]:
    """[(max_id-in-url, next max_id, comments)] — the cursor chain. The final
    page's next max_id is '0' (stop, T6)."""
    r = _rng(seed, t.t, 9)
    if r.random() >= 0.5:
        return []
    n_pages = r.randint(1, 4)
    chain = []
    cur: str | None = None
    for k in range(n_pages):
        nxt = (
            "0" if k == n_pages - 1
            else str(4_500_000_000_000_000 + t.t * 977 + (k + 1) * 13)
        )
        comments = [_hotflow_comment(t, k, j, seed) for j in range(r.randint(3, 8))]
        chain.append((cur, nxt, comments))
        cur = nxt
    return chain


def render_hotflow_pages(t: Target, seed: int) -> list[dict]:
    import json

    rows: list[dict] = []
    warc_base = ANCHOR - timedelta(hours=9)
    for i, (cur, nxt, comments) in enumerate(hotflow_chain(t, seed)):
        payload = {"ok": 1, "data": {"max_id": int(nxt), "data": comments}}
        texts = []
        for c in comments:
            texts.append(c["text"])
            for cc in c.get("comments", []):
                texts.append(cc["text"])
        ts = warc_base + timedelta(seconds=(t.t * 53 + i * 19) % 86400)
        rows.append(
            {
                "url": hotflow_url(t.wid, cur),
                "warc_ts": ts,
                "html": json.dumps(payload, ensure_ascii=False).encode("utf-8"),
                "text": "\n".join(texts),
                "lang": t.lang,
            }
        )
    return rows


def build_hotflow_pages_df(spark, n_targets: int, seed: int = 42,
                           partitions: int | None = None):
    partitions = partitions or max(4, min(n_targets // 64 + 1, 256))

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: list[dict] = []
            for t_idx in pdf["id"]:
                out.extend(render_hotflow_pages(Target(seed, int(t_idx)), seed))
            yield pd.DataFrame(out, columns=["url", "warc_ts", "html", "text", "lang"])

    return spark.range(0, n_targets, numPartitions=partitions).mapInPandas(gen, schema=PAGES)


# ---------------------------------------------------------------------------
# Supertopic active-user album pages (since_id feed chain,
# `独立版/WeiboSuperTopicActiveUserSpider.py`)
# ---------------------------------------------------------------------------


def supertopic_page_id(st_i: int) -> str:
    """Deterministic page_id in the reference's shape: '100808' + 32 hex
    chars (`WeiboSuperTopicActiveUserSpider.py:71`)."""
    return f"100808{st_i:032x}"


def supertopic_url(page_id: str, page: int, since_id: str | None) -> str:
    """The /p/aj/proxy album-feed URL. Param order is load-bearing: ``page=``
    precedes ``since_id=`` and ``since_id`` is appended last, so the engine's
    in-place page increment + since_id append/replace reproduces these exact
    strings (the reference resends the same params dict with page/since_id
    updated, `WeiboSuperTopicActiveUserSpider.py:150-155`)."""
    base = (
        "https://weibo.com/p/aj/proxy?api=pcpage%2Fpapp"
        f"&page_id={page_id}&page={page}&appname=album&module=feed"
    )
    if since_id is not None:
        base += f"&since_id={since_id}"
    return base


def _st_photo(st_i: int, k: int, j: int, seed: int) -> dict:
    """One ph_ar_box photo block: action-data carries uid/since_id/mid/pid
    (`WeiboSuperTopicActiveUserSpider.py:128-140`). uids are drawn from a
    small per-topic pool so cross-page repeats exercise the first-seen
    dedup."""
    r = _rng(seed, 200_000 + st_i, k * 100 + j)
    return {
        "uid": str(7_000_000_000 + st_i * 1000 + r.randint(0, 11)),
        "since_id": str(4_600_000_000_000_000 + st_i * 811 + k * 37 + j),
        "mid": str(4_700_000_000_000_000 + st_i * 911 + k * 100 + j),
        "pid": "st" + _b62(9_000_000 + st_i * 7919 + k * 97 + j, 12),
    }


def supertopic_chain(st_i: int, seed: int) -> list[tuple[int, str | None, list[dict]]]:
    """[(page, since_id-in-url, photos)] — the reference's feed chain:
    starts at page 2 with no since_id; each next request carries page+1 and
    the FIRST photo's since_id (`:131-133`); ends with an empty page (the
    parseHtml→False stop, `:122-125`)."""
    r = _rng(seed, 77, st_i)
    n_pages = r.randint(1, 3)
    chain: list[tuple[int, str | None, list[dict]]] = []
    since: str | None = None
    for k in range(n_pages):
        photos = [_st_photo(st_i, k, j, seed) for j in range(r.randint(2, 6))]
        chain.append((2 + k, since, photos))
        since = photos[0]["since_id"]
    chain.append((2 + n_pages, since, []))
    return chain


def render_supertopic_pages(st_i: int, seed: int) -> list[dict]:
    """JSON pages whose ``data`` cell is the album-grid HTML fragment —
    ``response.json()['data']`` → ``etree.HTML`` in the reference (`:118`)."""
    import json

    pid = supertopic_page_id(st_i)
    warc_base = ANCHOR - timedelta(hours=8)
    rows: list[dict] = []
    for i, (page, since, photos) in enumerate(supertopic_chain(st_i, seed)):
        blocks = "".join(
            '<a class="ph_ar_box" href="javascript:;" action-data="'
            f"uid={p['uid']}&amp;since_id={p['since_id']}"
            f"&amp;mid={p['mid']}&amp;pid={p['pid']}"
            '"><img src="thumb.jpg"/></a>'
            for p in photos
        )
        payload = {"code": "100000", "data": f'<div class="WB_cardwrap">{blocks}</div>'}
        rows.append(
            {
                "url": supertopic_url(pid, page, since),
                "warc_ts": warc_base + timedelta(seconds=(st_i * 61 + i * 23) % 86400),
                "html": json.dumps(payload, ensure_ascii=False).encode("utf-8"),
                "text": "",
                "lang": "zh",
            }
        )
    return rows


def build_supertopic_pages_df(spark, n_topics: int, seed: int = 42,
                              partitions: int | None = None):
    partitions = partitions or max(4, min(n_topics // 64 + 1, 256))

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: list[dict] = []
            for st_i in pdf["id"]:
                out.extend(render_supertopic_pages(int(st_i), seed))
            yield pd.DataFrame(out, columns=["url", "warc_ts", "html", "text", "lang"])

    return spark.range(0, n_topics, numPartitions=partitions).mapInPandas(gen, schema=PAGES)


def expected_supertopic_users(n_topics: int, seed: int) -> list[tuple]:
    """(page_id, seq, user_link) — first-seen-order active-uid dedup per
    topic, the reference's ``active_uid`` list → user_link CSV
    (`WeiboSuperTopicActiveUserSpider.py:140-146,168-172`)."""
    rows: list[tuple] = []
    for st_i in range(n_topics):
        pid = supertopic_page_id(st_i)
        seen: set[str] = set()
        seq = 0
        for _page, _since, photos in supertopic_chain(st_i, seed):
            for p in photos:
                if p["uid"] in seen:
                    continue
                seen.add(p["uid"])
                seq += 1
                rows.append((pid, seq, f"https://weibo.com/u/{p['uid']}"))
    return rows


# ---------------------------------------------------------------------------
# Spark-native generation
# ---------------------------------------------------------------------------


def build_pages_df(spark, n_targets: int, seed: int = 42, partitions: int | None = None):
    """Distributed deterministic generation: one task per target range slice.

    Scales linearly with executors — the same code path generates a
    sf0.001-sized table locally or a 100 TB table on a cluster.
    """
    partitions = partitions or max(8, min(n_targets // 64 + 1, 256))

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: list[dict] = []
            for t_idx in pdf["id"]:
                out.extend(render_target_pages(Target(seed, int(t_idx)), seed))
            yield pd.DataFrame(out, columns=["url", "warc_ts", "html", "text", "lang"])

    return (
        spark.range(0, n_targets, numPartitions=partitions)
        .mapInPandas(gen, schema=PAGES)
    )


def seed_list(n_targets: int, seed: int = 42, n_seeds: int | None = None) -> list[str]:
    """The crawl config: seed URLs in fixed order (targets-in-config-order,
    SURVEY.md §2.6 O4). Returns the main /comment/{wid} url per target."""
    n_seeds = n_seeds if n_seeds is not None else n_targets
    return [Target(seed, t).url_main() for t in range(min(n_seeds, n_targets))]


def write_pages(spark, out_dir: str, n_targets: int, seed: int = 42) -> None:
    build_pages_df(spark, n_targets, seed).write.mode("overwrite").parquet(out_dir)


# ---------------------------------------------------------------------------
# robots.txt fixtures: deterministic raw texts + an INDEPENDENT imperative
# reference interpreter (the oracle for the distributed window-based parser
# in crawl/robots.py — two different algorithms must agree exactly, the
# same pattern as the single-threaded crawl simulator)
# ---------------------------------------------------------------------------


def render_robots_texts(n_hosts: int, seed: int = 42) -> list[tuple[str, str]]:
    """Deterministic (host, robots_txt) fixtures covering the parser's edge
    cases: stacked user-agent lines, exact-agent and '*' and non-matching
    groups, comments, blank/junk lines, empty Disallow (allow-all),
    non-numeric and valid Crawl-delay, multiple groups per host."""
    out = []
    for h in range(n_hosts):
        r = _rng(seed, 777, h)
        host = f"site{h}.example.cn"
        lines: list[str] = ["# robots for " + host]
        n_groups = r.randint(1, 3)
        for g in range(n_groups):
            agents = r.choice([
                ["*"], ["wss"], ["otherbot"],
                ["otherbot", "*"],          # stacked, one matches
                ["wss", "otherbot"],        # stacked, exact match first
            ])
            if r.random() < 0.3:
                lines.append("")  # blank separator
            for a in agents:
                lines.append(f"User-agent: {a}")
            n_rules = r.randint(1, 4)
            for _ in range(n_rules):
                kind = r.random()
                path = "/" + r.choice(["", "u/", "comment/", "api/", "img/",
                                       "status/"]) + (
                    f"p{r.randint(0, 9)}" if r.random() < 0.5 else "")
                if kind < 0.45:
                    lines.append(f"Disallow: {path}  # blocked")
                elif kind < 0.75:
                    lines.append(f"Allow: {path}")
                elif kind < 0.85:
                    lines.append("Disallow:")  # empty → allow-all, no rule
                else:
                    lines.append("Crawl-delay: " +
                                 r.choice(["3", "8", "10", "soon", "2"]))
            if r.random() < 0.2:
                lines.append("junk line without separator")
        out.append((host, "\n".join(lines)))
    return out


def expected_robots_rules(n_hosts: int, seed: int = 42,
                          agent: str = "wss") -> list[tuple]:
    """Independent imperative robots interpreter (RFC 9309 subset): the
    oracle for crawl/robots.py's window-based distributed parser. Returns
    sorted distinct (host, path_prefix, allowed, crawl_delay) rows."""
    rows: set[tuple] = set()
    for host, txt in render_robots_texts(n_hosts, seed):
        groups: list[tuple[set, list]] = []  # (agents, directives)
        cur_agents: set | None = None
        in_ua_run = False
        for raw_line in txt.split("\n"):
            line = raw_line.split("#", 1)[0].strip()
            if ":" not in line:
                continue  # blank/junk: does NOT end a user-agent run
            key, value = line.split(":", 1)
            key = key.strip().lower()
            value = value.strip()
            if not key:
                continue
            if key == "user-agent":
                if not in_ua_run:
                    cur_agents = set()
                    groups.append((cur_agents, []))
                    in_ua_run = True
                cur_agents.add(value.lower())
            else:
                in_ua_run = False
                if groups:
                    groups[-1][1].append((key, value))
        for agents, directives in groups:
            if agent.lower() not in agents and "*" not in agents:
                continue
            delay = None
            for key, value in directives:
                if key == "crawl-delay":
                    try:
                        iv = int(value)
                    except ValueError:
                        continue
                    if iv > 0:  # non-positive pacing is treated as absent
                        delay = max(delay or 0, iv)
            for key, value in directives:
                if key == "allow":
                    rows.add((host, value, True, delay))
                elif key == "disallow" and value != "":
                    rows.add((host, value, False, delay))
    return sorted(rows, key=lambda t: (t[0], t[1], t[2], t[3] is None, t[3]))


# ---------------------------------------------------------------------------
# PageRank fixtures: a deterministic directed graph + an imperative replay
# of analytics.pagerank's exact integer recurrence (the value oracle — the
# arithmetic is fixed-point, so Spark and pure Python must agree bit-exactly)
# ---------------------------------------------------------------------------


def pagerank_edges(n_nodes: int, seed: int = 42) -> list[tuple[int, int]]:
    """Deterministic directed graph with the structures that exercise
    PageRank: a hub (everyone links to node 0), a chain, random cross
    edges, and dangling nodes (the top node range has no out-edges)."""
    r = _rng(seed, 888)
    edges: set[tuple[int, int]] = set()
    n_dangling = max(1, n_nodes // 10)
    linkers = n_nodes - n_dangling  # nodes [linkers, n_nodes) never link out
    for v in range(1, linkers):
        edges.add((v, 0))                       # hub
        edges.add((v, (v + 1) % n_nodes))       # chain (may hit dangling)
    for _ in range(n_nodes * 2):
        s = r.randrange(linkers)
        t = r.randrange(n_nodes)
        if s != t:
            edges.add((s, t))
    return sorted(edges)


def expected_pagerank(n_nodes: int, seed: int = 42, damping_num: int = 85,
                      damping_den: int = 100, n_iter: int = 10,
                      scale: int = 10**12) -> list[tuple[int, int]]:
    """Imperative replay of analytics.pagerank's integer recurrence —
    exact oracle of the deterministic definition (Python ints replay the
    64-bit fixed-point math bit-for-bit)."""
    edges = pagerank_edges(n_nodes, seed)
    nodes = sorted({s for s, _ in edges} | {d for _, d in edges})
    n = len(nodes)
    out_deg: dict[int, int] = {}
    for s, _ in edges:
        out_deg[s] = out_deg.get(s, 0) + 1
    init = scale // n
    teleport = init - (init * damping_num // damping_den)
    rank = {v: init for v in nodes}
    for _ in range(n_iter):
        dangling = sum(rank[v] for v in nodes if v not in out_deg)
        share = dangling // n
        inflow = {v: 0 for v in nodes}
        for s, d in edges:
            inflow[d] += rank[s] // out_deg[s]
        rank = {
            v: teleport + ((inflow[v] + share) * damping_num // damping_den)
            for v in nodes
        }
    return sorted(rank.items())


# ---------------------------------------------------------------------------
# Line-shape / Gopher-filter corpus (textstats.line_shape_stats /
# gopher_filter oracles — independent imperative replicas rendered as VALUES)

GOPHER_STOPWORDS = ["the", "be", "to", "of", "and", "that", "have", "with"]
_LS_VOCAB = [
    "market", "signal", "window", "vector", "stream", "filter",
    "sample", "corpus", "tokens", "models", "metric", "buffer",
]
_LS_LONG = [
    "internationalization", "disproportionately", "characterization",
    "incomprehensibility", "misinterpretation",
]
_LS_SYMBOL = ["###", "$$$", "%%%", "12345", "!!!", "===", "+++"]


def _ls_prose_line(r, i: int, n_words: int | None = None) -> str:
    """Distinct prose line with >=2 distinct Gopher stopwords, ends '.'."""
    n = n_words if n_words is not None else r.randint(8, 14)
    ws = ["the", r.choice(_LS_VOCAB), "with", r.choice(_LS_VOCAB)]
    ws += [r.choice(_LS_VOCAB) for _ in range(max(0, n - 5))]
    ws.append(f"item{i}")
    return " ".join(ws) + "."


def render_lineshape_docs(n_docs: int, seed: int = 42) -> list[tuple[int, str]]:
    """(doc_id, text) multi-line docs cycling through 9 scenarios, one per
    Gopher-rule branch (kept / bullets / ellipses / duplicate lines / too
    short / symbol words / no stopwords / over-long words / duplicated-char
    mass). The only ladder branch with no fixture scenario is
    too_many_words (a >100k-word doc is unreasonable in a VALUES oracle);
    it is pinned by a parameterized unit test instead."""
    docs: list[tuple[int, str]] = []
    for d in range(n_docs):
        r = _rng(seed, d, 71)
        kind = d % 9
        if kind == 0:  # clean keep
            lines = [_ls_prose_line(r, i) for i in range(r.randint(6, 9))]
        elif kind == 1:  # bullet-heavy (12/13 = 0.923 > 0.9)
            lines = [
                "- " + " ".join(r.choice(_LS_VOCAB) for _ in range(6)) + f" b{i}"
                for i in range(12)
            ] + [_ls_prose_line(r, 99)]
        elif kind == 2:  # ellipsis-heavy (4/10 = 0.4 > 0.3)
            lines = [_ls_prose_line(r, i) for i in range(6)]
            lines += [
                " ".join(r.choice(_LS_VOCAB) for _ in range(7)) + f" e{i}" + "..."
                for i in range(4)
            ]
        elif kind == 3:  # duplicated lines (5 copies + 5 distinct: 4/10 > 0.3)
            dup = _ls_prose_line(r, 0)
            lines = [dup] * 5 + [_ls_prose_line(r, i + 1) for i in range(5)]
        elif kind == 4:  # too short (8 words < 50)
            lines = [_ls_prose_line(r, i, n_words=4) for i in range(2)]
        elif kind == 5:  # symbol words (alpha frac ~0.5 < 0.8)
            lines = [
                " ".join(
                    (r.choice(_LS_SYMBOL) if j % 2 == 0 else r.choice(_LS_VOCAB))
                    for j in range(10)
                )
                + f" s{i}"
                for i in range(7)
            ]
        elif kind == 6:  # no stopwords (reaches the stopword rule)
            lines = [
                " ".join(r.choice(_LS_VOCAB) for _ in range(9)) + f" n{i}."
                for i in range(7)
            ]
        elif kind == 7:  # over-long words (mean length > 10)
            lines = [
                " ".join(r.choice(_LS_LONG) for _ in range(9)) + f" w{i}"
                for i in range(7)
            ]
        else:  # kind == 8: duplicated CHAR mass without duplicated-line
            # fraction — one long line twice among ten short distinct lines:
            # dup_line_frac = 1/12 ≤ 0.3 but dup chars dominate total chars
            # (> 0.2), so the ladder reaches dup_line_chars
            long_line = _ls_prose_line(r, 0, n_words=30)
            lines = [long_line, long_line] + [
                _ls_prose_line(r, i + 1, n_words=4) for i in range(10)
            ]
        docs.append((d, "\n".join(lines)))
    return docs


# Explicit ASCII whitespace set — matches textstats._trim_ws and Java's \\s
# (Python's bare str.strip()/re \\s are unicode-aware and would diverge from
# the Spark side on unicode-space text; unicode spaces are out of scope).
ASCII_WS = " \t\r\n\f\x0b"


def _ls_words(text: str) -> list[str]:
    # mirror of textstats._words_col: canonical mixed words — each CJK
    # code point its own word (identity on the latin fixtures), then the
    # explicit ASCII whitespace split
    from wss_spark.operators.textstats import CJK_CLASS

    spaced = re.sub(f"({CJK_CLASS})", r" \1 ", text)
    return [w for w in re.split(r"[ \t\r\n\f\x0b]+", spaced) if w != ""]


def _ls_lines(text: str) -> list[str]:
    return [s for s in (ln.strip(ASCII_WS) for ln in text.split("\n")) if s != ""]


def expected_line_shape(n_docs: int, seed: int = 42) -> list[tuple]:
    """Imperative (Counter-based) replica of textstats.line_shape_stats —
    independent of the Spark array-expression implementation."""
    from collections import Counter

    out = []
    for d, text in render_lineshape_docs(n_docs, seed):
        lines = _ls_lines(text)
        n = len(lines)
        if n == 0:
            out.append((d, 0, 0.0, 0.0, 0.0, 0.0, 0.0))
            continue
        cnt = Counter(lines)
        total_chars = sum(len(l) for l in lines)
        dup_chars = sum(len(l) for l in lines if cnt[l] > 1)
        out.append((
            d,
            n,
            (n - len(cnt)) / n,
            (dup_chars / total_chars) if total_chars else 0.0,
            sum(1 for l in lines if l.startswith(("- ", "* ", "• "))) / n,
            sum(1 for l in lines if l.endswith(("...", "…"))) / n,
            sum(1 for l in lines if l.endswith((".", "!", "?", '"'))) / n,
        ))
    return out


def expected_gopher_filter(
    n_docs: int,
    seed: int = 42,
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_wl: float = 3.0,
    max_mean_wl: float = 10.0,
    max_bullet_frac: float = 0.9,
    max_ellipsis_frac: float = 0.3,
    max_dup_line_frac: float = 0.3,
    max_dup_line_char_frac: float = 0.2,
    min_alpha_word_frac: float = 0.8,
    min_stopwords: int = 2,
) -> list[tuple]:
    """Imperative replica of textstats.gopher_filter (same documented rule
    order, different implementation)."""
    import re
    from collections import Counter

    out = []
    for d, text in render_lineshape_docs(n_docs, seed):
        ws = _ls_words(text)
        lines = _ls_lines(text)
        n_w, n_l = len(ws), len(lines)
        mean_wl = (sum(len(w) for w in ws) / n_w) if n_w else 0.0
        cnt = Counter(lines)
        total_chars = sum(len(l) for l in lines)
        dup_chars = sum(len(l) for l in lines if cnt[l] > 1)
        bullet = (sum(1 for l in lines if l.startswith(("- ", "* ", "• "))) / n_l) if n_l else 0.0
        ellip = (sum(1 for l in lines if l.endswith(("...", "…"))) / n_l) if n_l else 0.0
        dup_f = ((n_l - len(cnt)) / n_l) if n_l else 0.0
        dup_cf = (dup_chars / total_chars) if total_chars else 0.0
        alpha = (sum(1 for w in ws if re.search(r"[a-zA-Z]", w)) / n_w) if n_w else 0.0
        stops = len({w.lower() for w in ws} & set(GOPHER_STOPWORDS))
        if n_w < min_words:
            reason = "too_few_words"
        elif n_w > max_words:
            reason = "too_many_words"
        elif mean_wl < min_mean_wl or mean_wl > max_mean_wl:
            reason = "mean_word_len"
        elif bullet > max_bullet_frac:
            reason = "bullet_lines"
        elif ellip > max_ellipsis_frac:
            reason = "ellipsis_lines"
        elif dup_f > max_dup_line_frac:
            reason = "dup_lines"
        elif dup_cf > max_dup_line_char_frac:
            reason = "dup_line_chars"
        elif alpha < min_alpha_word_frac:
            reason = "alpha_words"
        elif stops < min_stopwords:
            reason = "stopwords"
        else:
            reason = "kept"
        out.append((d, reason == "kept", reason))
    return out


def render_boilerplate_docs(n_docs: int, seed: int = 42) -> list[tuple[int, str]]:
    """The line-shape docs wrapped in per-site boilerplate (a shared
    navigation header and copyright footer, 4 sites cycling over doc_id) —
    the cross-document duplicate-line fixture for corpus.dedup_lines."""
    out = []
    for d, text in render_lineshape_docs(n_docs, seed):
        site = d % 4
        header = f"site{site} navigation home about contact"
        footer = f"copyright site{site} all rights reserved"
        out.append((d, header + "\n" + text + "\n" + footer))
    return out


def expected_line_dedup(n_docs: int, seed: int = 42) -> list[tuple[int, str]]:
    """Imperative replica of corpus.dedup_lines over the boilerplate docs:
    one global seen-set walked in (doc_id, position) order."""
    seen: set[str] = set()
    out = []
    for d, text in render_boilerplate_docs(n_docs, seed):
        kept = []
        for ln in text.split("\n"):
            k = ln.strip(ASCII_WS)
            if k == "":
                kept.append(ln)
                continue
            if k in seen:
                continue
            seen.add(k)
            kept.append(ln)
        out.append((d, "\n".join(kept)))
    return out
