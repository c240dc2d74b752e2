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
    if "&" not in s:  # fast path: most text nodes carry no entities
        return s
    return (
        s.replace("&lt;", "<").replace("&gt;", ">").replace("&quot;", '"').replace("&#39;", "'").replace("&amp;", "&")
    )


def escape(s: str) -> str:
    return s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")


class Node:
    """Element node. Hand-rolled ``__slots__`` class (not a dataclass): the
    extraction stage allocates tens of Nodes per page at millions of pages —
    dropping the per-instance ``__dict__`` cuts allocation and cache traffic
    in the memory-bandwidth-bound hot path."""

    __slots__ = ("tag", "attrs", "children")

    def __init__(self, tag: str, attrs: dict[str, str] | None = None):
        self.tag = tag
        self.attrs = {} if attrs is None else attrs
        self.children: list = []  # Node | str

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
            node = Node(
                tag,
                {k: _unescape(v) for k, v in _ATTR.findall(rawattrs)} if rawattrs else None,
            )
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


def parse_time_sliced(time_str: str, now: datetime, pad: bool = False,
                      hour_branch: bool = True, split_source: bool = False) -> str:
    """The reference's *slicing-based* time-parser family (distinct from the
    regex-ish `WeiboDeepAnalyzer` variant in :func:`parse_time`):

    - `独立版/WeiboLikeSpider.py:24-54` — ``pad=True, hour_branch=True``:
      zero-pads ``8月5日`` → ``08月05日`` before fixed-position slicing
    - `独立版/WeiboTopicScrapy.py:203-228` — ``pad=False, hour_branch=False,
      split_source=True``: no 小时 branch, assumes already-padded input

    Faithful quirks kept: NO ``.strip()`` anywhere (the DeepAnalyzer variant
    strips, these don't — a ``来自``-suffixed input leaves a trailing space),
    minute/hour taken by prefix slice not regex, time-of-day taken by
    ``[7:12]`` so a missing HH:MM yields a trailing-space date.
    """
    s = time_str
    if split_source:
        s = s.split("来自")[0]
    if "刚刚" in s:
        return now.strftime("%Y-%m-%d %H:%M")
    if "分钟" in s:
        minute = int(s[: s.find("分钟")])
        return (now - timedelta(minutes=minute)).strftime("%Y-%m-%d %H:%M")
    if hour_branch and "小时" in s:
        hour = int(s[: s.find("小时")])
        return (now - timedelta(hours=hour)).strftime("%Y-%m-%d %H:%M")
    if "今天" in s:
        return now.strftime("%Y-%m-%d") + " " + s[3:]
    if "月" in s:
        if pad:
            if s.index("月") == 1:
                s = "0" + s
            if s.index("日") == 4:
                s = s[:3] + "0" + s[3:]
        year = now.strftime("%Y")
        return f"{year}-{s[0:2]}-{s[3:5]} {s[7:12]}"
    return s[:16]


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


_ZWSP = "​"  # U+200B


def _garbled(node: Node) -> str:
    """`独立版/WeiboTopicScrapy.py:84-91` deal_garbled: ``string(.)`` minus
    zero-width spaces — crucially NO whitespace collapse (unlike clean_text)."""
    return node.string().replace(_ZWSP, "")


def extract_search_from_page(root: Node, now: datetime) -> list[dict]:
    """Topic-search result blocks ``div.c[@id]`` → rows, replaying
    `独立版/WeiboTopicScrapy.py:352-386` (get_one_weibo) block by block:

    - is_origin: ≤ 3 ``div/span.cmt`` (`:355`)
    - publisher href: first ``div/a/@href`` (`:360`) — uid extracted here;
      the per-hit publisher-page fetch (`:332-349`) becomes the J2 broadcast
      join against the user dim in the engine
    - original content (`:108-120`): zwsp-stripped ``string(.)`` cut at
      ``rfind('赞')`` — keeps the ``name:`` prefix and trailing space, by
      reference behavior
    - retweet content (`:133-158`): ``[find(':')+1 : rfind('赞')]`` then a
      second ``[:rfind('赞')]`` cut (drops the original's own counters);
      reason = last div's text cut at ``rindex('赞')`` (keeps the
      ``转发理由:`` marker); assembled ``reason\\n原始用户: X\\n转发内容: Y``
    - publish place (`:174-196`): only when a ``显示地图`` place link exists;
      last ``ctt`` anchor text, ``视频`` tail quirk included
    - time (`:203-228`): the sliced parser variant WITHOUT an 小时 branch
    - footer (`:246-268`): ``rfind('赞')`` then first three digit runs
    - pictures (`:270-300`): report the picAll href (album J4 join); '无'
      otherwise
    """
    rows: list[dict] = []
    idx = 0
    for block in root.iter():
        if block.tag != "div" or block.attrs.get("class") != "c" or "id" not in block.attrs:
            continue
        wid = block.attrs["id"]
        if wid.startswith("M_"):
            wid = wid[2:]
        divs = block.find_all("div", direct=True)
        cmts = [s for d in divs for s in d.find_all("span", "cmt", direct=True)]
        is_origin = len(cmts) <= 3

        publisher_href = None
        publisher_uid = None
        for d in divs:
            a = d.first("a", direct=True)
            if a is not None:
                publisher_href = a.attrs.get("href", "")
                m = _UID_ANY.search(publisher_href)
                if m:
                    publisher_uid = m.group(1)
                break

        whole = _garbled(block)
        if is_origin:
            content = whole[: whole.rfind("赞")] if "赞" in whole else whole
        else:
            orig_user_nodes = [a for c in cmts for a in c.find_all("a")]
            if not orig_user_nodes or not orig_user_nodes[0].own_text():
                content = "转发微博已被删除"
            else:
                orig_user = orig_user_nodes[0].own_text()[0]
                wb = whole[whole.find(":") + 1 :]
                wb = wb[: wb.rfind("赞")] if "赞" in wb else wb
                wb = wb[: wb.rfind("赞")] if "赞" in wb else wb
                reason = _garbled(divs[-1]) if divs else ""
                if "赞" in reason:
                    reason = reason[: reason.rindex("赞")]
                content = f"{reason}\n原始用户: {orig_user}\n转发内容: {wb}"

        # publish place: div[0] needs a direct 显示地图 place link
        place = "无"
        if divs:
            has_map = any(
                "place.weibo.com" in a.attrs.get("href", "")
                and "".join(a.own_text()) == "显示地图"
                for a in divs[0].find_all("a", direct=True)
            )
            if has_map:
                ctt0 = divs[0].first("span", "ctt")
                if ctt0 is not None:
                    ctt_as = ctt0.find_all("a")
                    if ctt_as:
                        cand = ctt_as[-1]
                        texts = ["".join(a.own_text()) for a in ctt_as]
                        if texts and texts[-1][-2:] == "视频":
                            cand = ctt_as[-2] if len(ctt_as) >= 2 else None
                        place = _garbled(cand) if cand is not None else "无"

        publish_time = ""
        publish_tool = "无"
        ct = None
        for d in divs:
            ct = d.first("span", "ct", direct=True)
            if ct is not None:
                break
        if ct is not None:
            raw = _garbled(ct)
            publish_time = parse_time_sliced(
                raw, now, pad=False, hour_branch=False, split_source=True
            )
            if len(raw.split("来自")) > 1:
                publish_tool = raw.split("来自")[1]

        like, fwd, cmt_n = footer_triple(_garbled(divs[-1]) if divs else "")

        album_href = None
        for a in block.find_all("a"):
            if "/mblog/picAll/" in a.attrs.get("href", ""):
                album_href = a.attrs.get("href")
                break

        rows.append(
            {
                "block_index": idx,
                "wid": wid,
                "publisher_uid": publisher_uid,
                "publisher_href": publisher_href,
                "is_origin": is_origin,
                "content": content,
                "publish_place": place,
                "publish_time": publish_time,
                "publish_tool": publish_tool,
                "like_count": like,
                "forward_count": fwd,
                "comment_count": cmt_n,
                "album_href": album_href,
            }
        )
        idx += 1
    return rows


def extract_article_text(root: Node) -> str:
    """Article ``<p>`` text+image interleave, replaying
    `独立版/WeiboComPostSpider.py:114-137` (parseDetail): for each ``<p>`` in
    document order, append the FIRST descendant ``img/@src`` if any, then the
    FIRST descendant text node if non-empty; newline-join."""
    parts: list[str] = []
    for p in root.iter():
        if p.tag != "p":
            continue
        img = p.first("img")
        if img is not None and img.attrs.get("src"):
            parts.append(img.attrs["src"])
        # lxml `.//text()` → first descendant text node in document order
        first_text = None
        stack = list(reversed(p.children))
        while stack:
            n = stack.pop()
            if isinstance(n, str):
                first_text = n
                break
            stack.extend(reversed(n.children))
        if first_text:
            parts.append(first_text)
    return "\n".join(parts)


def extract_first_user_hit(root: Node) -> str:
    """User-search page → first hit's uid, replaying
    `独立版/SearchUser.py:14-21` (parseResponse): first
    ``div[class^='card card-user-b'] > div.avator > a/@href``, uid after the
    last '/'; '-1' when no hit (the reference returns int -1)."""
    for d in root.iter():
        if d.tag != "div" or not d.attrs.get("class", "").startswith("card card-user-b"):
            continue
        av = d.first("div", "avator", direct=True)
        if av is None:
            continue
        a = av.first("a", direct=True)
        if a is None:
            continue
        href = a.attrs.get("href", "")
        if "/" in href:
            return href[href.rindex("/") + 1 :]
    return "-1"


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
    if kind == "search":
        return "\n".join(h["content"] for h in extract_search_from_page(root, now))
    if kind == "article":
        return extract_article_text(root)
    if kind == "usersearch":
        return ""
    if kind == "api_comments":
        return "\n".join(c["text"] for c in parse_api_comments(html)["comments"])
    body = root.first("body")
    return clean_text(body.string() if body is not None else root.string())


_URL_COMMENT = re.compile(r"^https?://[^/]+/comment/([^/?#]+)(?:\?page=(\d+))?")
_URL_REPOST = re.compile(r"^https?://[^/]+/repost/([^/?#]+)(?:\?page=(\d+))?")
_URL_ALBUM = re.compile(r"^https?://[^/]+/mblog/picAll/([^/?#]+)")
_URL_INFO = re.compile(r"^https?://[^/]+/(\d+)/info")
_URL_PROFILE = re.compile(r"^https?://[^/]+/(\d+)/profile(?:\?page=(\d+))?")
# keyword may be followed by other params (advancedfilter/starttime/endtime
# windows, `独立版/WeiboTopicScrapy.py:438-446`); the page param can sit
# anywhere in the query string, so it is matched separately.
_URL_SEARCH = re.compile(r"^https?://[^/]+/search/mblog\?(?:[^#]*&)?keyword=([^&#]+)")
_URL_PAGE_PARAM = re.compile(r"[?&]page=(\d+)")
_URL_ARTICLE = re.compile(r"^https?://[^/]+/article/([^/?#]+)")
_URL_SUPERTOPIC = re.compile(r"^https?://[^/]+/p/aj/proxy\?(?:[^#]*&)?page_id=([^&#]+)")
_URL_USERSEARCH = re.compile(r"^https?://s\.[^/]+/user\?q=([^&#]+)")
_URL_HOTFLOW = re.compile(r"^https?://[^/]+/comments/hotflow\?id=([^&#]+)")


def classify_url(url: str) -> tuple[str, str | None, int]:
    """URL family → (kind, wid/uid/keyword, page). Families per FIXTURES.md §1
    plus round 2: topic search (`独立版/WeiboTopicScrapy.py:438-446`), article
    (`独立版/WeiboComPostSpider.py:114-137`), user search
    (`独立版/SearchUser.py:46-55`), and the max_id cursor API
    (`独立版/WeiboSuperCommentScrapy.py:375-389`; page is cursor-chain depth,
    carried by the frontier, not the URL)."""
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
    m = _URL_SEARCH.match(url)
    if m:
        pm = _URL_PAGE_PARAM.search(url)
        return "search", m.group(1), int(pm.group(1)) if pm else 1
    m = _URL_ARTICLE.match(url)
    if m:
        return "article", m.group(1), 1
    m = _URL_USERSEARCH.match(url)
    if m:
        return "usersearch", m.group(1), 1
    m = _URL_HOTFLOW.match(url)
    if m:
        return "api_comments", m.group(1), 1
    m = _URL_SUPERTOPIC.match(url)
    if m:
        pm = _URL_PAGE_PARAM.search(url)
        return "supertopic", m.group(1), int(pm.group(1)) if pm else 1
    return "other", None, 1


def parse_api_comments(html: str | bytes | None) -> dict:
    """Stored hotflow API payload → {max_id, comments[]}, replaying
    `独立版/WeiboSuperCommentScrapy.py:353-374,383-410` (info_parser + the
    nested-``comments`` flatten). Raw ``created_at`` is kept verbatim — the
    reference writes it unparsed. A missing ``like_count`` is None here; the
    export layer renders the reference's ``数据缺失`` sentinel (P8)."""
    import json as _json

    if html is None:
        return {"max_id": None, "comments": []}
    if isinstance(html, (bytes, bytearray)):
        html = bytes(html).decode("utf-8", "replace")
    try:
        payload = _json.loads(html)
    except ValueError:
        return {"max_id": None, "comments": []}
    data = payload.get("data") or {}
    max_id = data.get("max_id")
    out: list[dict] = []

    def info(c: dict) -> dict:
        user = c.get("user") or {}
        return {
            "wid": str(c.get("id", "")),
            "time": c.get("created_at", ""),
            "text": c.get("text", ""),
            "uid": str(user.get("id", "")),
            "like_count": c.get("like_count"),
            "username": user.get("screen_name", ""),
            "following": user.get("follow_count"),
            "followed": user.get("followers_count"),
            "gender": user.get("gender"),
        }

    for c in data.get("data") or []:
        out.append(info(c))
        for cc in c.get("comments") or []:
            out.append(info(cc))
    return {"max_id": str(max_id) if max_id is not None else None, "comments": out}


def parse_supertopic(html: str | bytes | None) -> dict:
    """Stored supertopic album payload → {since_id, photos[]}, replaying
    `独立版/WeiboSuperTopicActiveUserSpider.py:117-146` (parseHtml): the JSON
    ``data`` cell is an HTML fragment; each ``a.ph_ar_box`` anchor's
    action-data query string carries uid/since_id/mid/pid; the NEXT request's
    since_id is the FIRST photo's (`:131-133`); pic_url is rebuilt from pid
    (`:137`). Tolerant of junk/missing payloads like every parser here."""
    import json as _json

    if html is None:
        return {"since_id": None, "photos": []}
    if isinstance(html, (bytes, bytearray)):
        html = bytes(html).decode("utf-8", "replace")
    try:
        payload = _json.loads(html)
    except ValueError:
        return {"since_id": None, "photos": []}
    frag = payload.get("data")
    if not isinstance(frag, str):
        return {"since_id": None, "photos": []}
    root = parse_html(frag)
    photos: list[dict] = []
    since_id: str | None = None
    for a in root.find_all("a", cls="ph_ar_box"):
        params: dict[str, str] = {}
        for kv in (a.attrs.get("action-data") or "").split("&"):
            if "=" in kv:
                k, v = kv.split("=", 1)
                params[k] = v
        if "uid" not in params:
            continue
        p = {
            "uid": params.get("uid", ""),
            "since_id": params.get("since_id", ""),
            "mid": params.get("mid", ""),
            "pid": params.get("pid", ""),
            "pic_url": f"https://wx2.sinaimg.cn/mw690/{params.get('pid', '')}.jpg",
        }
        if since_id is None:
            since_id = p["since_id"]
        photos.append(p)
    return {"since_id": since_id, "photos": photos}
