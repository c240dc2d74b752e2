"""Pure-Python extraction kernel: a micro-DOM plus the reference parsers.

The reference parses weibo.cn HTML with lxml + XPath and per-record regex
slicing. This module re-implements that *behavior* (not the code) over a tiny
well-formed-HTML DOM so it can run inside Arrow-batched pandas UDFs with zero
native deps. Semantics are locked to the reference, cited per function:

- text of a node == lxml ``string(.)`` (concatenated text nodes, doc order)
- comment extraction: `独立版/WeiboDeepAnalyzer.py:356-417` and the hot-skip
  variant `WeiboDeepAnalyzer/WeiboDeepAnalyzer.py:445-520`
- repost extraction: `独立版/WeiboDeepAnalyzer.py:468-527`
- weibo-content extraction: `独立版/WeiboDeepAnalyzer.py:189-299`
- time normalization: `独立版/WeiboDeepAnalyzer.py:128-161`
- text cleanup: `独立版/WeiboDeepAnalyzer.py:163-169`

Byte-identity of extracted text vs the reference algorithm is asserted by
tests against the oracle ``text`` column of the synthetic pages table.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from datetime import datetime, timedelta

# Fixed "now" anchor replacing the reference's wall-clock ``datetime.now()``
# (`独立版/WeiboDeepAnalyzer.py:134` etc.) — determinism requires the anchor
# to be data, not ambient time.
ANCHOR = datetime(2025, 10, 29, 12, 0, 0)

# ---------------------------------------------------------------------------
# micro-DOM
# ---------------------------------------------------------------------------

_TOKEN = re.compile(r"<(/?)([a-zA-Z][a-zA-Z0-9]*)((?:\s+[a-zA-Z_:][-a-zA-Z0-9_:.]*(?:\s*=\s*\"[^\"]*\")?)*)\s*(/?)>", re.S)
_ATTR = re.compile(r"([a-zA-Z_:][-a-zA-Z0-9_:.]*)\s*=\s*\"([^\"]*)\"")
_VOID = {"br", "img", "input", "hr", "meta", "link"}


def _unescape(s: str) -> str:
    return (
        s.replace("&lt;", "<").replace("&gt;", ">").replace("&quot;", '"').replace("&#39;", "'").replace("&amp;", "&")
    )


def escape(s: str) -> str:
    return s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")


@dataclass
class Node:
    tag: str
    attrs: dict[str, str] = field(default_factory=dict)
    children: list = field(default_factory=list)  # Node | str

    # --- lxml-parity helpers -------------------------------------------------
    def string(self) -> str:
        """lxml ``xpath('string(.)')``: all descendant text, document order."""
        out: list[str] = []
        stack = [self]
        while stack:
            n = stack.pop()
            if isinstance(n, str):
                out.append(n)
            else:
                stack.extend(reversed(n.children))
        return "".join(out)

    def own_text(self) -> list[str]:
        """lxml ``xpath('text()')``: direct text children only."""
        return [c for c in self.children if isinstance(c, str)]

    def iter(self):
        """All descendant element nodes, document order (self excluded)."""
        stack = list(reversed([c for c in self.children if isinstance(c, Node)]))
        while stack:
            n = stack.pop()
            yield n
            stack.extend(reversed([c for c in n.children if isinstance(c, Node)]))

    def find_all(self, tag: str | None = None, cls: str | None = None, direct: bool = False):
        pool = [c for c in self.children if isinstance(c, Node)] if direct else list(self.iter())
        res = []
        for n in pool:
            if tag is not None and n.tag != tag:
                continue
            if cls is not None and n.attrs.get("class") != cls:
                continue
            res.append(n)
        return res

    def first(self, tag: str | None = None, cls: str | None = None, direct: bool = False):
        r = self.find_all(tag, cls, direct)
        return r[0] if r else None


def parse_html(html: str | bytes | None) -> Node:
    """Parse the well-formed HTML subset the pages table contains.

    Tolerant by design: null/empty/garbage input yields an (empty) tree,
    never an exception — a fetch pipeline must survive bad payloads.
    """
    if html is None:
        html = ""
    if isinstance(html, (bytes, bytearray)):
        html = bytes(html).decode("utf-8", "replace")
    root = Node("#root")
    stack = [root]
    pos = 0
    for m in _TOKEN.finditer(html):
        if m.start() > pos:
            text = _unescape(html[pos : m.start()])
            if text:
                stack[-1].children.append(text)
        pos = m.end()
        closing, tag, rawattrs, selfclose = m.groups()
        tag = tag.lower()
        if closing:
            # pop to matching open tag (we control generation: always matched)
            for i in range(len(stack) - 1, 0, -1):
                if stack[i].tag == tag:
                    del stack[i:]
                    break
        else:
            node = Node(tag, {k: _unescape(v) for k, v in _ATTR.findall(rawattrs)})
            stack[-1].children.append(node)
            if not selfclose and tag not in _VOID:
                stack.append(node)
    if pos < len(html):
        text = _unescape(html[pos:])
        if text:
            stack[-1].children.append(text)
    return root


# ---------------------------------------------------------------------------
# reference-parity scalar transforms
# ---------------------------------------------------------------------------

_WS = re.compile(r"\s+")


def clean_text(text: str | None) -> str:
    """`独立版/WeiboDeepAnalyzer.py:163-169` — collapse whitespace, drop ZWSP."""
    if not text:
        return ""
    return _WS.sub(" ", text).replace("​", "").strip()


_MIN = re.compile(r"(\d+)分钟")
_HOUR = re.compile(r"(\d+)小时")
_MD = re.compile(r"(\d{1,2})月(\d{1,2})日\s*(\d{1,2}:\d{2})?")


def parse_time(time_str: str, now: datetime) -> str:
    """`独立版/WeiboDeepAnalyzer.py:128-161` with an explicit ``now`` anchor
    (the reference uses wall-clock ``datetime.now()``, which is
    non-reproducible; determinism requires the anchor to be data)."""
    try:
        time_str = time_str.split("来自")[0].strip()
        if "刚刚" in time_str:
            return now.strftime("%Y-%m-%d %H:%M")
        elif "分钟" in time_str:
            minute = int(_MIN.search(time_str).group(1))
            return (now - timedelta(minutes=minute)).strftime("%Y-%m-%d %H:%M")
        elif "小时" in time_str:
            hour = int(_HOUR.search(time_str).group(1))
            return (now - timedelta(hours=hour)).strftime("%Y-%m-%d %H:%M")
        elif "今天" in time_str:
            today = now.strftime("%Y-%m-%d")
            time_part = time_str.replace("今天", "").strip()
            return f"{today} {time_part}"
        elif "月" in time_str and "日" in time_str:
            year = now.strftime("%Y")
            m = _MD.search(time_str)
            if m:
                month = m.group(1).zfill(2)
                day = m.group(2).zfill(2)
                time_part = m.group(3) if m.group(3) else "00:00"
                return f"{year}-{month}-{day} {time_part}"
        else:
            if len(time_str) >= 16:
                return time_str[:16]
        return time_str
    except Exception:
        return time_str


_UID_ANY = re.compile(r"/(\d+)")
_LIKE = re.compile(r"赞\[(\d+)\]")
_REPOST_N = re.compile(r"转发\[(\d+)\]")
_COMMENT_N = re.compile(r"评论\[(\d+)\]")
_LIKE_ALL = re.compile(r"赞\[\d+\]")


# ---------------------------------------------------------------------------
# page-level extractors
# ---------------------------------------------------------------------------


def extract_comments_from_page(root: Node, now: datetime) -> list[dict]:
    """Comment blocks ``div.c[id^=C_]`` → rows.

    Mirrors `独立版/WeiboDeepAnalyzer.py:356-417`; hot-comment ``span.kt``
    skip per `WeiboDeepAnalyzer/WeiboDeepAnalyzer.py:460-465` is surfaced as
    an ``is_hot`` flag so the caller filters declaratively
    (SURVEY.md §2.2 P5).
    """
    rows: list[dict] = []
    idx = 0
    for block in root.iter():
        if block.tag != "div" or block.attrs.get("class") != "c":
            continue
        cid = block.attrs.get("id", "")
        if not cid.startswith("C_"):
            continue
        is_hot = False
        kt = block.first("span", "kt")
        if kt is not None and "热门" in kt.string():
            is_hot = True

        commenter_id = None
        commenter_name = ""
        a = block.first("a")
        if a is not None:
            m = _UID_ANY.search(a.attrs.get("href", ""))
            if m:
                commenter_id = m.group(1)
            own = a.own_text()
            if own:
                commenter_name = own[0]

        content = ""
        ctt = block.first("span", "ctt")
        if ctt is not None:
            content = clean_text(ctt.string())
            if content.startswith("回复"):
                colon_idx = content.find(":")
                if colon_idx > 0:
                    content = content[colon_idx + 1 :].strip()

        like_count = 0
        cc = block.first("span", "cc")
        if cc is not None:
            m = _LIKE.search(cc.string())
            if m:
                like_count = int(m.group(1))

        publish_time = ""
        ct = block.first("span", "ct")
        if ct is not None:
            own = ct.own_text()
            if own:
                publish_time = parse_time(own[0], now)

        rows.append(
            {
                "block_index": idx,
                "comment_id": cid[2:],
                "commenter_id": commenter_id,
                "commenter_name": commenter_name,
                "content": content,
                "like_count": like_count,
                "publish_time": publish_time,
                "is_hot": is_hot,
            }
        )
        idx += 1
    return rows


def extract_reposts_from_page(root: Node, now: datetime) -> list[dict]:
    """Repost blocks ``div.c`` with a *direct* ``<a>`` child → rows.

    Mirrors `独立版/WeiboDeepAnalyzer.py:468-527` exactly, including its
    quirks: the parsed publish_time is removed from the content only when the
    normalized string literally re-occurs in the raw text; ``赞[n]`` tokens
    are stripped; the reposter's ``name + ':'`` prefix is cut at its first
    occurrence.
    """
    rows: list[dict] = []
    idx = 0
    for block in root.iter():
        if block.tag != "div" or block.attrs.get("class") != "c":
            continue
        a = block.first("a", direct=True)
        if a is None or not a.own_text():
            continue
        user_name = a.own_text()[0]
        user_id = None
        m = _UID_ANY.search(a.attrs.get("href", ""))
        if m:
            user_id = m.group(1)

        full_text = block.string()

        publish_time = ""
        ct = block.first("span", "ct")
        if ct is not None:
            own = ct.own_text()
            if own:
                publish_time = parse_time(own[0], now)
                if publish_time and publish_time in full_text:
                    full_text = full_text[: full_text.rfind(publish_time)]

        like_count = 0
        m = _LIKE.search(full_text)
        if m:
            like_count = int(m.group(1))
            full_text = _LIKE_ALL.sub("", full_text)

        content = full_text
        if user_name + ":" in content:
            content = content.split(user_name + ":", 1)[1]
        content = clean_text(content)

        rows.append(
            {
                "block_index": idx,
                "user_id": user_id,
                "user_name": user_name,
                "content": content,
                "like_count": like_count,
                "publish_time": publish_time,
            }
        )
        idx += 1
    return rows


def extract_weibo_from_page(root: Node, now: datetime, wid: str) -> dict | None:
    """Main weibo block ``div.c[@id]`` (first) → one row.

    Mirrors `独立版/WeiboDeepAnalyzer.py:189-299`. The long-text ("全文") and
    picture-album expansions are *joins* in the engine (SURVEY.md §2.3 J3/J4):
    this function only reports the link targets (``fulltext_href``,
    ``album_href``); the driver resolves them against the pages table.
    """
    weibo_block = None
    for n in root.iter():
        if n.tag == "div" and n.attrs.get("class") == "c" and "id" in n.attrs:
            weibo_block = n
            break
    if weibo_block is None:
        return None

    weibo_id = weibo_block.attrs["id"]
    if weibo_id.startswith("M_"):
        weibo_id = weibo_id[2:]

    user_id = None
    user_name = ""
    for a in weibo_block.find_all("a"):
        if a.attrs.get("class") == "nk":
            m = _UID_ANY.search(a.attrs.get("href", ""))
            if m:
                user_id = m.group(1)
            own = a.own_text()
            if own:
                user_name = own[0]
            break

    content = ""
    ctt = weibo_block.first("span", "ctt")
    if ctt is not None:
        content = clean_text(ctt.string())
        if content.startswith(":"):
            content = content[1:].strip()

    fulltext_href = None
    album_href = None
    for a in weibo_block.find_all("a"):
        if fulltext_href is None and "全文" in "".join(a.own_text()):
            fulltext_href = a.attrs.get("href")
        if album_href is None and "/mblog/picAll/" in a.attrs.get("href", ""):
            album_href = a.attrs.get("href")

    publish_time = ""
    publish_source = ""
    ct = weibo_block.first("span", "ct")
    if ct is not None:
        own = ct.own_text()
        if own:
            publish_time = parse_time(own[0], now)
            if "来自" in own[0]:
                publish_source = own[0].split("来自")[1].strip()

    # footer counters: text of the last direct div child
    divs = weibo_block.find_all("div", direct=True)
    footer_text = divs[-1].string() if divs else ""
    like_count = int(m.group(1)) if (m := _LIKE.search(footer_text)) else 0
    repost_count = int(m.group(1)) if (m := _REPOST_N.search(footer_text)) else 0
    comment_count = int(m.group(1)) if (m := _COMMENT_N.search(footer_text)) else 0

    # pagination metadata for frontier expansion: first span.cmt 评论[N]
    # (`独立版/WeiboDeepAnalyzer.py:328-335`)
    total_comments = 0
    cmt = root.first("span", "cmt")
    if cmt is not None:
        m = _COMMENT_N.search(cmt.string())
        if m:
            total_comments = int(m.group(1))
    total_pages = (total_comments // 10) + (1 if total_comments % 10 > 0 else 0)

    return {
        "wid": wid,
        "weibo_id": weibo_id,
        "user_id": user_id,
        "user_name": user_name,
        "content": content,
        "publish_time": publish_time,
        "publish_source": publish_source,
        "like_count": like_count,
        "repost_count": repost_count,
        "comment_count": comment_count,
        "weibo_url": f"https://weibo.cn/comment/{wid}",
        "fulltext_href": fulltext_href,
        "album_href": album_href,
        "total_comment_pages": total_pages,
    }


_NUMS = re.compile(r"\d+")


def footer_triple(text: str) -> tuple[int, int, int]:
    """F4 — footer counter triple: cut at the LAST ``赞`` then take the first
    three digit runs as (like, forward, comment)
    (`独立版/(using)WeiboUserScrapy.py:325-349` semantics)."""
    pos = text.rfind("赞")
    if pos < 0:
        return 0, 0, 0
    nums = _NUMS.findall(text[pos:])
    like = int(nums[0]) if len(nums) > 0 else 0
    fwd = int(nums[1]) if len(nums) > 1 else 0
    cmt = int(nums[2]) if len(nums) > 2 else 0
    return like, fwd, cmt


_COUNT_TOKENS = re.compile(r"(?:赞|转发|评论)\[\d+\]")


def extract_timeline_from_page(root: Node, now: datetime) -> list[dict]:
    """User-timeline blocks ``div.c[id^=M_]`` → rows (the flagship
    `(using)WeiboUserScrapy.py` parser, FIXTURES.md §3.5):

    - P3 is_origin: a block is an original post iff it has ≤ 3 ``span.cmt``
      elements (`独立版/(using)WeiboUserScrapy.py:231-237`)
    - F8 retweet assembly: ``reason\\n原始用户: name\\n转发内容: content``
      (`:224-225`); deleted retweets render ``转发微博已被删除`` (`:206-209`)
    - F4 footer triple from the last div's text (`:325-349`)
    - F9 image links: thumb/wap → large; album links reported as href (J4)
    """
    rows: list[dict] = []
    idx = 0
    for block in root.iter():
        if block.tag != "div" or block.attrs.get("class") != "c":
            continue
        wid = block.attrs.get("id", "")
        if not wid.startswith("M_"):
            continue
        wid = wid[2:]
        cmts = block.find_all("span", "cmt")
        is_origin = len(cmts) <= 3

        ctt = block.first("span", "ctt")
        ctt_text = clean_text(ctt.string()) if ctt is not None else ""
        if ctt_text.startswith(":"):
            ctt_text = ctt_text[1:].strip()

        publish_time = ""
        publish_tool = ""
        ct = block.first("span", "ct")
        ct_raw = ""
        if ct is not None:
            own = ct.own_text()
            if own:
                ct_raw = own[0]
                publish_time = parse_time(ct_raw, now)
                if "来自" in ct_raw:
                    publish_tool = ct_raw.split("来自")[1].strip()

        if is_origin:
            content = ctt_text
        else:
            deleted = "转发微博已被删除" in block.string()
            if deleted:
                content = "转发微博已被删除"
            else:
                orig_user = ""
                for c in cmts:
                    if "转发了" in c.string():
                        a = c.first("a")
                        if a is not None and a.own_text():
                            orig_user = a.own_text()[0]
                        break
                # reason: text of the div holding the 转发理由 marker, minus
                # the marker, count tokens, and the time/source tail
                reason = ""
                for d in block.find_all("div", direct=True):
                    s = d.string()
                    if "转发理由" in s:
                        reason = s.split("转发理由:", 1)[-1]
                        if ct_raw and ct_raw in reason:
                            reason = reason[: reason.rfind(ct_raw)]
                        reason = clean_text(_COUNT_TOKENS.sub("", reason))
                        break
                content = f"{reason}\n原始用户: {orig_user}\n转发内容: {ctt_text}"

        like, fwd, cmt_n = 0, 0, 0
        divs = block.find_all("div", direct=True)
        if divs:
            like, fwd, cmt_n = footer_triple(divs[-1].string())

        images: list[str] = []
        album_href = None
        for img in block.find_all("img"):
            src = img.attrs.get("src", "")
            if "sinaimg" in src:
                images.append(src.replace("/thumb180/", "/large/").replace("/wap180/", "/large/"))
        for a in block.find_all("a"):
            if "/mblog/picAll/" in a.attrs.get("href", ""):
                album_href = a.attrs.get("href")
                break

        rows.append(
            {
                "block_index": idx,
                "wid": wid,
                "is_origin": is_origin,
                "content": content,
                "publish_time": publish_time,
                "publish_tool": publish_tool,
                "like_count": like,
                "forward_count": fwd,
                "comment_count": cmt_n,
                "images": images,
                "album_href": album_href,
            }
        )
        idx += 1
    return rows


def extract_album_images(root: Node) -> list[str]:
    """picAll page → large-size image urls
    (`独立版/WeiboDeepAnalyzer.py:233-245`)."""
    out = []
    for img in root.find_all("img"):
        src = img.attrs.get("src", "")
        if "sinaimg" in src:
            out.append(src.replace("/thumb180/", "/large/").replace("/wap180/", "/large/"))
    return out


_GENDER = re.compile(r"性别[:：]\s*(\S+)")
_LOC = re.compile(r"地区[:：]\s*(\S+)")


def extract_user_from_page(root: Node, uid: str) -> dict | None:
    """Profile /info page → user dim row.

    Nickname from ``<title>`` minus the 3-char suffix and the ``tip2`` counter
    slicing mirror `独立版/(using)WeiboUserScrapy.py:111-144`; gender/location
    parsing mirrors `独立版/WeiboUserInfoSpider.py:106-115` semantics.
    """
    title = root.first("title")
    nickname = title.string()[:-3] if title is not None else ""
    tip2 = root.first("div", "tip2")
    weibo_num = following = followers = None
    if tip2 is not None:
        texts = [n.string() for n in tip2.find_all()]
        vals = []
        for s in texts:
            try:
                vals.append(int(s[3:-1]))
            except ValueError:
                vals.append(None)
        if len(vals) >= 3:
            weibo_num, following, followers = vals[0], vals[1], vals[2]
    body_text = root.string()
    gm = _GENDER.search(body_text)
    lm = _LOC.search(body_text)
    return {
        "uid": uid,
        "nickname": nickname,
        "gender": gm.group(1) if gm else None,
        "location": lm.group(1) if lm else None,
        "followers_num": followers,
        "weibo_num": weibo_num,
        "following_num": following,
    }


def page_text(url: str, html: str | bytes, now: datetime) -> str:
    """The engine's canonical ``html → text`` (north-star extraction stage).

    Definition (must stay in lockstep with the oracle in synth.py):
    - comment page: extracted weibo content (page 1 only) followed by each
      non-hot comment's cleaned content, newline-joined
    - repost page: each repost's cleaned content, newline-joined
    - any other page: cleaned ``string(.)`` of the body
    """
    root = parse_html(html)
    kind, wid, page = classify_url(url)
    if kind == "comment":
        parts: list[str] = []
        if page == 1:
            w = extract_weibo_from_page(root, now, wid or "")
            if w and w["content"]:
                parts.append(w["content"])
        parts.extend(r["content"] for r in extract_comments_from_page(root, now) if not r["is_hot"])
        return "\n".join(parts)
    if kind == "repost":
        return "\n".join(r["content"] for r in extract_reposts_from_page(root, now))
    body = root.first("body")
    return clean_text(body.string() if body is not None else root.string())


_URL_COMMENT = re.compile(r"^https?://[^/]+/comment/([^/?#]+)(?:\?page=(\d+))?")
_URL_REPOST = re.compile(r"^https?://[^/]+/repost/([^/?#]+)(?:\?page=(\d+))?")
_URL_ALBUM = re.compile(r"^https?://[^/]+/mblog/picAll/([^/?#]+)")
_URL_INFO = re.compile(r"^https?://[^/]+/(\d+)/info")
_URL_PROFILE = re.compile(r"^https?://[^/]+/(\d+)/profile(?:\?page=(\d+))?")


def classify_url(url: str) -> tuple[str, str | None, int]:
    """URL family → (kind, wid/uid, page). Families per FIXTURES.md §1."""
    m = _URL_COMMENT.match(url)
    if m:
        return "comment", m.group(1), int(m.group(2) or 1)
    m = _URL_REPOST.match(url)
    if m:
        return "repost", m.group(1), int(m.group(2) or 1)
    m = _URL_ALBUM.match(url)
    if m:
        return "album", m.group(1), 1
    m = _URL_PROFILE.match(url)
    if m:
        return "profile", m.group(1), int(m.group(2) or 1)
    m = _URL_INFO.match(url)
    if m:
        return "info", m.group(1), 1
    return "other", None, 1
