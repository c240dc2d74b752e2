"""Text scalar functions (SURVEY.md §2.8) as JVM-side Column expressions."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def clean_text(col: Column | str) -> Column:
    """F5 — collapse whitespace, strip zero-width space, trim
    (`独立版/WeiboDeepAnalyzer.py:163-169`)."""
    return F.trim(F.regexp_replace(F.regexp_replace(_c(col), r"\s+", " "), "​", ""))


def strip_reply_prefix(col: Column | str) -> Column:
    """F6 — remove leading ``回复@xxx:``
    (`独立版/WeiboDeepAnalyzer.py:380-386`)."""
    c = _c(col)
    return F.when(
        c.startswith("回复") & (F.instr(c, ":") > 0),
        F.trim(c.substr(F.instr(c, ":") + F.lit(1), F.length(c))),
    ).otherwise(c)


def extract_count(col: Column | str, label: str) -> Column:
    """F3 — ``赞[(\\d+)]`` style counters
    (`独立版/WeiboDeepAnalyzer.py:264-274`)."""
    return F.coalesce(
        F.nullif(F.regexp_extract(_c(col), label + r"\[(\d+)\]", 1), F.lit("")).cast("int"),
        F.lit(0),
    )


def assemble_retweet(reason: Column | str, original_user: Column | str, content: Column | str) -> Column:
    """F8 — retweet render (`独立版/(using)WeiboUserScrapy.py:224-225`)."""
    return F.concat(
        _c(reason), F.lit("\n原始用户: "), _c(original_user), F.lit("\n转发内容: "), _c(content)
    )


def large_image_url(col: Column | str) -> Column:
    """F9 — thumb/wap → large (`独立版/(using)WeiboUserScrapy.py:360-363`)."""
    return F.regexp_replace(_c(col), r"/(thumb180|wap180)/", "/large/")


def img_links_join(col: Column | str, sep: str = " ") -> Column:
    """F13 — export render of image url arrays
    (`独立版/(using)WeiboUserScrapy.py:365`)."""
    return F.array_join(_c(col), sep)


def placeholder_none(col: Column | str) -> Column:
    """P8 — '无' sentinel at export (`独立版/(using)WeiboUserScrapy.py:258`)."""
    c = _c(col)
    return F.when(c.isNull() | (c == ""), F.lit("无")).otherwise(c)
