"""Relative-time normalization (F1/F2) — JVM-side Column implementation.

The reference normalizes ``刚刚 / N分钟 / N小时 / 今天 HH:MM / MM月DD日 [HH:MM] /
absolute`` strings with per-row Python (`独立版/WeiboDeepAnalyzer.py:128-161`).
Here it is a pure ``F.when`` chain over regexp extraction — whole-stage
codegen, no Python — anchored on an explicit ``now`` timestamp column/literal
for determinism. A byte-parity test pins it against the kernel's pure-Python
port of the same algorithm.

Also F2: RFC-2822-ish API times (`独立版/CommentedWeiboSpider.py:35-38`).
"""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import Column
from pyspark.sql import functions as F


def parse_weibo_time(raw: Column | str, now: datetime | Column) -> Column:
    """Returns the normalized STRING (the reference's output type) in the
    format '%Y-%m-%d %H:%M' for relative branches, mirroring every branch of
    `独立版/WeiboDeepAnalyzer.py:128-161`."""
    c = F.col(raw) if isinstance(raw, str) else raw
    now_ts = F.lit(now) if isinstance(now, datetime) else now

    head = F.trim(F.split(c, "来自").getItem(0))
    fmt_min = "yyyy-MM-dd HH:mm"

    minutes = F.regexp_extract(head, r"(\d+)分钟", 1).cast("int")
    hours = F.regexp_extract(head, r"(\d+)小时", 1).cast("int")
    md = F.regexp_extract(head, r"(\d{1,2})月(\d{1,2})日\s*(\d{1,2}:\d{2})?", 0)
    mon = F.lpad(F.regexp_extract(head, r"(\d{1,2})月", 1), 2, "0")
    day = F.lpad(F.regexp_extract(head, r"月(\d{1,2})日", 1), 2, "0")
    hm = F.regexp_extract(head, r"日\s*(\d{1,2}:\d{2})", 1)

    return (
        F.when(head.contains("刚刚"), F.date_format(now_ts, fmt_min))
        .when(
            head.contains("分钟"),
            F.date_format(now_ts - F.make_dt_interval(F.lit(0), F.lit(0), minutes), fmt_min),
        )
        .when(
            head.contains("小时"),
            F.date_format(now_ts - F.make_dt_interval(F.lit(0), hours), fmt_min),
        )
        .when(
            head.contains("今天"),
            F.concat_ws(" ", F.date_format(now_ts, "yyyy-MM-dd"), F.trim(F.replace(head, F.lit("今天"), F.lit("")))),
        )
        .when(
            head.contains("月") & head.contains("日") & (md != ""),
            F.concat(
                F.date_format(now_ts, "yyyy"),
                F.lit("-"),
                mon,
                F.lit("-"),
                day,
                F.lit(" "),
                F.when(hm != "", hm).otherwise(F.lit("00:00")),
            ),
        )
        .when(head.contains("月") & head.contains("日"), head)
        .when(F.length(head) >= 16, F.substring(head, 1, 16))
        .otherwise(head)
    )


def parse_weibo_time_like(raw: Column | str, now: datetime | Column) -> Column:
    """F1 variant — the LIKE spider's zero-padding sliced parser
    (`独立版/WeiboLikeSpider.py:24-54`), as a JVM when-chain. Distinct from
    :func:`parse_weibo_time` (the DeepAnalyzer regex-ish variant): no 来自
    split, no strip, the 月 branch zero-pads ``8月5日`` → ``08月05日`` then
    slices fixed positions ([0:2] month, [3:5] day, [7:12] time — so a
    missing HH:MM leaves a trailing space), the else branch is ``[:16]``.
    Byte parity with kernel.parse_time_sliced(pad=True) is test-pinned."""
    c = F.col(raw) if isinstance(raw, str) else raw
    now_ts = F.lit(now) if isinstance(now, datetime) else now
    fmt_min = "yyyy-MM-dd HH:mm"

    minutes = F.regexp_extract(c, r"^(\d+)分钟", 1).cast("int")
    hours = F.regexp_extract(c, r"^(\d+)小时", 1).cast("int")
    mon = F.lpad(F.regexp_extract(c, r"^(\d{1,2})月", 1), 2, "0")
    day = F.lpad(F.regexp_extract(c, r"月(\d{1,2})日", 1), 2, "0")
    rest = F.regexp_extract(c, r"日(.*)$", 1)
    padded = F.concat(mon, F.lit("月"), day, F.lit("日"), rest)

    return (
        F.when(c.contains("刚刚"), F.date_format(now_ts, fmt_min))
        .when(
            c.contains("分钟"),
            F.date_format(now_ts - F.make_dt_interval(F.lit(0), F.lit(0), minutes), fmt_min),
        )
        .when(
            c.contains("小时"),
            F.date_format(now_ts - F.make_dt_interval(F.lit(0), hours), fmt_min),
        )
        .when(
            c.contains("今天"),
            F.concat(F.date_format(now_ts, "yyyy-MM-dd"), F.lit(" "),
                     F.substring(c, 4, 100000)),
        )
        .when(
            c.contains("月"),
            F.concat(
                F.date_format(now_ts, "yyyy"), F.lit("-"), mon, F.lit("-"), day,
                F.lit(" "), F.substring(padded, 8, 5),
            ),
        )
        .otherwise(F.substring(c, 1, 16))
    )


def time_params_formatter(params_time: str, offset_day: int = 0,
                          offset_hour: int = -8) -> str:
    """F17 — the topic spider's search-param time shifter
    (`独立版/WeiboTopicScrapy.py:505-512`): 'YYYY-mm-dd-HH' shifted by the
    GMT+8 boundary offsets (start_time −8 h; end_time −1 day −7 h in the
    spider's ctor, `:65-66`)."""
    from datetime import datetime, timedelta

    y, mo, d, h = (int(e) for e in params_time.split("-"))
    t = datetime(y, mo, d, h) + timedelta(days=offset_day, hours=offset_hour)
    return t.strftime("%Y-%m-%d-%H")


def parse_api_time(raw: Column | str) -> Column:
    """F2: '%a %b %d %H:%M:%S %z %Y' → '%Y-%m-%d %H:%M:%S'
    (`独立版/CommentedWeiboSpider.py:35-38`).

    The reference keeps the payload's own wall time (+0800, weibo's zone) —
    ``strptime`` stays offset-aware and ``strftime`` re-renders the same wall
    clock. Spark's to_timestamp normalizes to the session zone, so shift back
    to GMT+8 before formatting for byte parity."""
    c = F.col(raw) if isinstance(raw, str) else raw
    # Spark 3+'s DateTimeFormatter rejects day-of-week ('EEE') in parse
    # patterns — the weekday is redundant, so strip it first
    no_dow = F.regexp_replace(c, r"^[A-Za-z]{3}\s+", "")
    return F.date_format(
        F.from_utc_timestamp(
            F.to_timestamp(no_dow, "MMM dd HH:mm:ss Z yyyy"), "GMT+8"
        ),
        "yyyy-MM-dd HH:mm:ss",
    )
