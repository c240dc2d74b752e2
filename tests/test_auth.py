"""S11 (cookie/env config) and F19 (rsa2 login crypto) tests.

The RSA path is validated black-box: a keypair is generated in-test
(Miller-Rabin primes, pure stdlib), the engine encrypts under the public
modulus exactly as the reference does (`独立版/WeiboSuperCommentScrapy.py:
185-193`), and the test decrypts with the private exponent and strips the
PKCS#1 v1.5 padding — proving the ciphertext is a real RFC 8017 encryption
of the servertime/nonce/password message, not a fixture replay.
"""

from __future__ import annotations

import random

from wss_spark import auth

# --- tiny in-test RSA keypair ----------------------------------------------


def _is_probable_prime(n: int, rounds: int = 20, rng=None) -> bool:
    if n < 4:
        return n in (2, 3)
    if n % 2 == 0:
        return False
    d, r = n - 1, 0
    while d % 2 == 0:
        d //= 2
        r += 1
    rng = rng or random.Random(0xC0FFEE)
    for _ in range(rounds):
        a = rng.randrange(2, n - 2)
        x = pow(a, d, n)
        if x in (1, n - 1):
            continue
        for _ in range(r - 1):
            x = pow(x, 2, n)
            if x == n - 1:
                break
        else:
            return False
    return True


def _gen_prime(bits: int, rng: random.Random) -> int:
    while True:
        p = rng.getrandbits(bits) | (1 << (bits - 1)) | 1
        if _is_probable_prime(p):
            return p


def _keypair(bits: int = 512, seed: int = 7):
    rng = random.Random(seed)
    e = 65537
    while True:
        p, q = _gen_prime(bits // 2, rng), _gen_prime(bits // 2, rng)
        phi = (p - 1) * (q - 1)
        if p != q and phi % e != 0:
            return p * q, e, pow(e, -1, phi)


def _seeded_rng(seed: int = 42):
    r = random.Random(seed)
    return lambda k: bytes(r.randrange(1, 256) for _ in range(k))


# --- F19 --------------------------------------------------------------------


def test_encode_username_js_parity():
    # encodeURIComponent('test@example.com') == 'test%40example.com'
    assert auth.encode_username("test@example.com") == "dGVzdCU0MGV4YW1wbGUuY29t"
    # '+' in quote_plus space handling matches the reference's quote_plus use
    assert auth.encode_username("a b") == "YSti"


def test_rsa_encrypt_decrypt_roundtrip():
    n, e, d = _keypair()
    pubkey_hex = format(n, "x")
    sp = auth.encrypt_password(1234567890, "ABC123", "hunter2", pubkey_hex,
                               rng=_seeded_rng())
    k = (n.bit_length() + 7) // 8
    assert len(sp) == 2 * k  # ciphertext is exactly one modulus block, hex
    em = pow(int(sp, 16), d, n).to_bytes(k, "big")
    # EME-PKCS1-v1_5: 00 02 PS 00 M with PS nonzero
    assert em[0] == 0 and em[1] == 2
    sep = em.index(b"\x00", 2)
    assert all(b != 0 for b in em[2:sep]) and sep - 2 >= 8
    assert em[sep + 1:] == b"1234567890\tABC123\nhunter2"


def test_rsa_encrypt_deterministic_under_seeded_rng():
    n, _, _ = _keypair()
    pub = format(n, "x")
    a = auth.encrypt_password(1, "N", "pw", pub, rng=_seeded_rng(5))
    b = auth.encrypt_password(1, "N", "pw", pub, rng=_seeded_rng(5))
    c = auth.encrypt_password(1, "N", "pw", pub, rng=_seeded_rng(6))
    assert a == b != c  # padding randomness comes only from the injected rng


def test_message_too_long_raises():
    n, _, _ = _keypair()
    try:
        auth.rsa_encrypt_hex(b"x" * 60, format(n, "x"), rng=_seeded_rng())
    except ValueError as exc:
        assert "too long" in str(exc)
    else:
        raise AssertionError("expected ValueError")


def test_degenerate_rng_raises_instead_of_spinning():
    """A broken injected rng (all-zero or empty output) must raise — the
    padding loop is bounded, never an unbounded driver busy-loop."""
    n, _, _ = _keypair()
    pub = format(n, "x")
    for bad_rng in (lambda k: b"\x00" * k, lambda k: b""):
        try:
            auth.rsa_encrypt_hex(b"pw", pub, rng=bad_rng)
        except ValueError as exc:
            assert "nonzero" in str(exc)
        else:
            raise AssertionError("expected ValueError")


def test_slow_rng_that_barely_suffices_succeeds():
    """An rng yielding ONE nonzero byte per draw must still succeed while
    the 64-draw bound covers the need — the sufficiency check runs after
    each draw, so material gathered on the final draw counts."""
    n, _, d = _keypair()
    pub = format(n, "x")
    calls = [0]

    def one_byte_rng(k):
        calls[0] += 1
        return b"\x00" * (k - 1) + b"\x07"

    ct = auth.rsa_encrypt_hex(b"pw", pub, rng=one_byte_rng)
    assert int(ct, 16) and calls[0] <= 64  # need = k-3-2 = 59 draws here


def test_login_postdata_field_parity():
    n, _, _ = _keypair()
    server_data = {"servertime": 111, "nonce": "NNN", "rsakv": "kv",
                   "pubkey": format(n, "x")}
    post = auth.build_login_postdata("u@e.com", "pw", server_data,
                                     rng=_seeded_rng())
    # the exact v1.4.19 field set the reference posts
    assert set(post) == {
        "entry", "gateway", "from", "savestate", "useticket", "pagerefer",
        "vsnf", "su", "service", "servertime", "nonce", "pwencode", "rsakv",
        "sp", "sr", "encoding", "prelt", "cdult", "url", "returntype",
    }
    assert post["pwencode"] == "rsa2" and post["rsakv"] == "kv"
    assert post["su"] == auth.encode_username("u@e.com")


# --- S11 --------------------------------------------------------------------


def test_cookie_precedence_env_then_conf_then_file(tmp_path, spark):
    f = tmp_path / ".env"
    f.write_text("# comment\n\nOTHER=x\nCOOKIE='from-file'\n", encoding="utf-8")
    # file only
    assert auth.read_cookie(env={}, env_file=str(f)) == "from-file"
    # spark conf beats file
    spark.conf.set("spark.wss.cookie", "from-conf")
    try:
        assert auth.read_cookie(env={}, env_file=str(f), spark=spark) == "from-conf"
        # env var beats both
        assert auth.read_cookie(env={"COOKIE": "from-env"}, env_file=str(f),
                                spark=spark) == "from-env"
    finally:
        spark.conf.unset("spark.wss.cookie")
    # nothing anywhere
    assert auth.read_cookie(env={}, env_file=str(tmp_path / "missing")) == ""


def test_env_file_parse_quotes_and_first_equals():
    assert auth.parse_env_file('COOKIE="a=b=c"') == "a=b=c"
    assert auth.parse_env_file("COOKIE=plain ") == "plain"
    assert auth.parse_env_file("#COOKIE=no\nX=1") == ""


def test_request_headers():
    h = auth.request_headers("SUB=x", user_agent="UA")
    assert h == {"User-Agent": "UA", "Cookie": "SUB=x"}
    assert "Cookie" not in auth.request_headers("")
