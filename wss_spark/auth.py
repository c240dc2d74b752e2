"""Auth/config plumbing: cookie sourcing (S11) and the rsa2 login crypto
(F19) — the two control-plane surfaces of the reference.

S11 (`独立版/WeiboCommentScrapy.py:29-47`, duplicated across 6 spiders):
cookie precedence is COOKIE env var → `.env` file (skip blanks/comments,
split on the first ``=``, strip surrounding quotes) → ``''``. This engine
adds a Spark-conf source (``spark.wss.cookie``) ahead of the file so a
``spark-submit --conf`` deployment needs no env plumbing on executors —
the cookie is driver-side config; it never enters the data plane.

F19 (`独立版/WeiboSuperCommentScrapy.py:138-193`): ``su`` is
``base64(encodeURIComponent(username))``; ``sp`` is the RSA-PKCS#1-v1.5
encryption (RFC 8017 §7.2.1, textbook public-exponent math — implemented
here from the RFC, no crypto package) of
``f"{servertime}\\t{nonce}\\n{password}"`` under the prelogin-supplied
modulus (hex) with e=65537, hex-encoded. The padding RNG is injectable:
PKCS#1 v1.5 requires random nonzero pad bytes, so callers pass
``os.urandom`` in production; tests pass a seeded generator for
determinism. All pure functions — auth runs once on the driver, never
per-row.
"""

from __future__ import annotations

import base64
import os
from typing import Callable, Mapping
from urllib.parse import quote_plus

# ---------------------------------------------------------------------------
# S11: cookie/env config source


def parse_env_file(text: str, key: str = "COOKIE") -> str:
    """Reference-parity .env parse: skip blanks/comments, split on the
    first '=', strip surrounding single/double quotes."""
    for raw_line in text.splitlines():
        line = raw_line.strip()
        if not line or line.startswith("#"):
            continue
        if "=" in line:
            k, value = line.split("=", 1)
            if k.strip() == key:
                return value.strip().strip('"').strip("'")
    return ""


def read_cookie(env: Mapping[str, str] | None = None,
                env_file: str | None = None,
                spark=None) -> str:
    """COOKIE env var → spark conf ``spark.wss.cookie`` → .env file → ''."""
    env = os.environ if env is None else env
    val = env.get("COOKIE")
    if val:
        return val
    if spark is not None:
        val = spark.conf.get("spark.wss.cookie", "")
        if val:
            return val
    if env_file:
        try:
            with open(env_file, "r", encoding="utf-8") as f:
                return parse_env_file(f.read())
        except OSError:
            return ""
    return ""


def request_headers(cookie: str, user_agent: str | None = None) -> dict[str, str]:
    """The per-request header dict the reference attaches to every fetch."""
    headers = {
        "User-Agent": user_agent
        or "Mozilla/5.0 (Windows NT 10.0; Win64; x64)",
    }
    if cookie:
        headers["Cookie"] = cookie
    return headers


# ---------------------------------------------------------------------------
# F19: rsa2 login crypto


def encode_username(user: str) -> str:
    """``su``: base64(encodeURIComponent(username)) — quote_plus is the
    Python analog of the JS encodeURIComponent step the reference cites."""
    return base64.b64encode(quote_plus(user).encode("utf-8")).decode("utf-8")


def _pkcs1_v15_pad(message: bytes, k: int,
                   rng: Callable[[int], bytes]) -> bytes:
    """RFC 8017 §7.2.1 EME-PKCS1-v1_5: 00 02 PS 00 M, PS >= 8 nonzero
    random bytes."""
    if len(message) > k - 11:
        raise ValueError(f"message too long for {k}-byte modulus")
    need = k - 3 - len(message)
    ps = b""
    # bounded: a degenerate injected rng (all zeros, or empty output) must
    # raise, not spin the driver forever. 64 draws of k bytes each is
    # astronomically more than enough for any real generator. The check
    # runs AFTER each draw so material gathered on the final draw counts.
    for _ in range(64):
        ps += bytes(b for b in rng(k) if b != 0)
        if len(ps) >= need:
            break
    else:
        raise ValueError(
            "rng produced too few nonzero bytes for PKCS#1 v1.5 padding"
        )
    return b"\x00\x02" + ps[:need] + b"\x00" + message


def rsa_encrypt_hex(message: bytes, pubkey_hex: str, e: int = 65537,
                    rng: Callable[[int], bytes] = os.urandom) -> str:
    """PKCS#1 v1.5 RSA encryption under the prelogin modulus, hex-encoded
    (the reference's ``binascii.b2a_hex(rsa.encrypt(...))``)."""
    n = int(pubkey_hex, 16)
    k = (n.bit_length() + 7) // 8
    em = int.from_bytes(_pkcs1_v15_pad(message, k, rng), "big")
    c = pow(em, e, n)
    return c.to_bytes(k, "big").hex()


def encrypt_password(servertime: int | str, nonce: str, password: str,
                     pubkey_hex: str, e: int = 65537,
                     rng: Callable[[int], bytes] = os.urandom) -> str:
    """``sp``: RSA(str(servertime) + '\\t' + nonce + '\\n' + password)."""
    message = f"{servertime}\t{nonce}\n{password}".encode("utf-8")
    return rsa_encrypt_hex(message, pubkey_hex, e=e, rng=rng)


def build_login_postdata(user: str, password: str,
                         server_data: Mapping[str, object],
                         rng: Callable[[int], bytes] = os.urandom) -> dict:
    """The exact ssologin v1.4.19 form the reference posts
    (`WeiboSuperCommentScrapy.py:226-243`): su/sp computed here, the rest
    constant; pwencode is always 'rsa2'."""
    su = encode_username(user)
    sp = encrypt_password(
        server_data["servertime"], str(server_data["nonce"]), password,
        str(server_data["pubkey"]), rng=rng,
    )
    return {
        "entry": "weibo",
        "gateway": "1",
        "from": "",
        "savestate": "7",
        "useticket": "1",
        "pagerefer": "https://passport.weibo.com",
        "vsnf": "1",
        "su": su,
        "service": "miniblog",
        "servertime": server_data["servertime"],
        "nonce": server_data["nonce"],
        "pwencode": "rsa2",
        "rsakv": server_data["rsakv"],
        "sp": sp,
        "sr": "1366*768",
        "encoding": "UTF-8",
        "prelt": "115",
        "cdult": "38",
        "url": "http://weibo.com/ajaxlogin.php?framelogin=1&callback="
               "parent.sinaSSOController.feedBackUrlCallBack",
        "returntype": "TEXT",
    }
