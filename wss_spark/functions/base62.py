"""Weibo id ↔ mid base62 codec as vectorized pandas UDFs.

A pure-Python, byte-exact port of the grouping algorithm the reference runs
through an embedded JavaScript snippet + execjs
(`独立版/WeiboSuperCommentScrapy.py:40-112`): ids are processed in 7-decimal-
digit groups from the right, each group rendered base62; mids decode in
4-char groups from the right, each zero-padded to 7 digits except the
leading group.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import StringType

STR62 = "0123456789abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ"
_IDX = {c: i for i, c in enumerate(STR62)}


def int10to62(n: int) -> str:
    s = ""
    while n != 0:
        n, r = divmod(n, 62)
        s = STR62[r] + s
    return s


def str62to10(s: str) -> int:
    n = 0
    for ch in s:
        n = n * 62 + _IDX[ch]
    return n


def id_to_mid(weibo_id: str) -> str:
    mid = ""
    i = len(weibo_id) - 7
    while i > -7:
        group = weibo_id[max(i, 0) : i + 7]
        mid = int10to62(int(group)) + mid
        i -= 7
    return mid


def mid_to_id(mid: str) -> str:
    out = ""
    i = len(mid) - 4
    while i > -4:
        if i < 0:
            group = mid[0 : len(mid) % 4]
        else:
            group = mid[i : i + 4]
        s = str(str62to10(group))
        if i > 0:
            s = s.zfill(7)
        out = s + out
        i -= 4
    return out


@pandas_udf(StringType())
def id2mid(ids: pd.Series) -> pd.Series:
    # JS parity: '' → '' and '0' → '' (the reference's int10to62 renders 0 as
    # the empty string); only true NULLs map to NULL
    return ids.map(lambda v: id_to_mid(v) if v is not None else None)


@pandas_udf(StringType())
def mid2id(mids: pd.Series) -> pd.Series:
    return mids.map(lambda v: mid_to_id(v) if v is not None else None)
