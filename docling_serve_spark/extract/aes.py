"""Minimal AES-128/192/256 + CBC for the PDF standard security
handler (FIPS-197; PDF 32000-1 §7.6.2 AESV2, PDF 32000-2 §7.6.4
AESV3).

Pure stdlib: the container ships no crypto package, and the only
consumer is the AES-encrypted fraction of crawl PDFs. Implementation
is the classic 32-bit T-table form (4 lookup tables fold SubBytes +
ShiftRows + MixColumns into one XOR chain per word; decryption uses
the equivalent inverse cipher with InvMixColumns-transformed round
keys) — ~10x the naive byte-wise form in CPython. Validated against
the FIPS-197 Appendix C vectors in tests/test_aes.py."""

from __future__ import annotations

_SBOX = bytes.fromhex(
    "637c777bf26b6fc53001672bfed7ab76ca82c97dfa5947f0add4a2af9ca472c0"
    "b7fd9326363ff7cc34a5e5f171d8311504c723c31896059a071280e2eb27b275"
    "09832c1a1b6e5aa0523bd6b329e32f8453d100ed20fcb15b6acbbe394a4c58cf"
    "d0efaafb434d338545f9027f503c9fa851a3408f929d38f5bcb6da2110fff3d2"
    "cd0c13ec5f974417c4a77e3d645d197360814fdc222a908846eeb814de5e0bdb"
    "e0323a0a4906245cc2d3ac629195e479e7c8376d8dd54ea96c56f4ea657aae08"
    "ba78252e1ca6b4c6e8dd741f4bbd8b8a703eb5664803f60e613557b986c11d9e"
    "e1f8981169d98e949b1e87e9ce5528df8ca1890dbfe6426841992d0fb054bb16"
)
_INV = bytearray(256)
for _i, _v in enumerate(_SBOX):
    _INV[_v] = _i
_INV_SBOX = bytes(_INV)

_RCON = (0x01, 0x02, 0x04, 0x08, 0x10, 0x20, 0x40, 0x80, 0x1B, 0x36,
         0x6C, 0xD8, 0xAB, 0x4D)


def _gmul(a: int, b: int) -> int:
    v = 0
    while b:
        if b & 1:
            v ^= a
        a = ((a << 1) ^ 0x1B) & 0xFF if a & 0x80 else a << 1
        b >>= 1
    return v


def _build_tables() -> tuple:
    te0 = [0] * 256
    td0 = [0] * 256
    for x in range(256):
        s = _SBOX[x]
        te0[x] = (_gmul(s, 2) << 24) | (s << 16) | (s << 8) | _gmul(s, 3)
        si = _INV_SBOX[x]
        td0[x] = (
            (_gmul(si, 14) << 24)
            | (_gmul(si, 9) << 16)
            | (_gmul(si, 13) << 8)
            | _gmul(si, 11)
        )

    def ror8(t):
        return [((v >> 8) | ((v & 0xFF) << 24)) & 0xFFFFFFFF for v in t]

    te1 = ror8(te0)
    te2 = ror8(te1)
    te3 = ror8(te2)
    td1 = ror8(td0)
    td2 = ror8(td1)
    td3 = ror8(td2)
    return te0, te1, te2, te3, td0, td1, td2, td3


_TE0, _TE1, _TE2, _TE3, _TD0, _TD1, _TD2, _TD3 = _build_tables()

def _inv_mix_columns_word(w: int) -> int:
    b0, b1, b2, b3 = (w >> 24) & 0xFF, (w >> 16) & 0xFF, (w >> 8) & 0xFF, w & 0xFF
    return (
        ((_gmul(b0, 14) ^ _gmul(b1, 11) ^ _gmul(b2, 13) ^ _gmul(b3, 9)) << 24)
        | ((_gmul(b0, 9) ^ _gmul(b1, 14) ^ _gmul(b2, 11) ^ _gmul(b3, 13)) << 16)
        | ((_gmul(b0, 13) ^ _gmul(b1, 9) ^ _gmul(b2, 14) ^ _gmul(b3, 11)) << 8)
        | (_gmul(b0, 11) ^ _gmul(b1, 13) ^ _gmul(b2, 9) ^ _gmul(b3, 14))
    )


def _expand_key_words(key: bytes) -> list[int]:
    nk = len(key) // 4
    nr = nk + 6
    w = [int.from_bytes(key[4 * i : 4 * i + 4], "big") for i in range(nk)]
    for i in range(nk, 4 * (nr + 1)):
        t = w[i - 1]
        if i % nk == 0:
            t = ((t << 8) | (t >> 24)) & 0xFFFFFFFF  # RotWord
            t = (
                (_SBOX[(t >> 24) & 0xFF] << 24)
                | (_SBOX[(t >> 16) & 0xFF] << 16)
                | (_SBOX[(t >> 8) & 0xFF] << 8)
                | _SBOX[t & 0xFF]
            )
            t ^= _RCON[i // nk - 1] << 24
        elif nk > 6 and i % nk == 4:
            t = (
                (_SBOX[(t >> 24) & 0xFF] << 24)
                | (_SBOX[(t >> 16) & 0xFF] << 16)
                | (_SBOX[(t >> 8) & 0xFF] << 8)
                | _SBOX[t & 0xFF]
            )
        w.append(w[i - nk] ^ t)
    return w


class _Key:
    """Expanded encryption + equivalent-inverse-cipher schedules."""

    __slots__ = ("enc", "dec", "nr")

    def __init__(self, key: bytes):
        w = _expand_key_words(key)
        self.nr = len(key) // 4 + 6
        self.enc = w
        # decryption schedule: reversed rounds, InvMixColumns on the
        # middle round keys (equivalent inverse cipher, FIPS-197 §5.3.5)
        dec = []
        for r in range(self.nr, -1, -1):
            rk = w[4 * r : 4 * r + 4]
            if 0 < r < self.nr:
                rk = [_inv_mix_columns_word(v) for v in rk]
            dec.extend(rk)
        self.dec = dec


def _expand_key(key: bytes) -> _Key:
    return _Key(key)


def _encrypt_block(block: bytes, k: _Key) -> bytes:
    w = k.enc
    nr = k.nr
    s0 = int.from_bytes(block[0:4], "big") ^ w[0]
    s1 = int.from_bytes(block[4:8], "big") ^ w[1]
    s2 = int.from_bytes(block[8:12], "big") ^ w[2]
    s3 = int.from_bytes(block[12:16], "big") ^ w[3]
    te0, te1, te2, te3 = _TE0, _TE1, _TE2, _TE3
    for r in range(1, nr):
        i = 4 * r
        t0 = te0[s0 >> 24] ^ te1[(s1 >> 16) & 0xFF] ^ te2[(s2 >> 8) & 0xFF] ^ te3[s3 & 0xFF] ^ w[i]
        t1 = te0[s1 >> 24] ^ te1[(s2 >> 16) & 0xFF] ^ te2[(s3 >> 8) & 0xFF] ^ te3[s0 & 0xFF] ^ w[i + 1]
        t2 = te0[s2 >> 24] ^ te1[(s3 >> 16) & 0xFF] ^ te2[(s0 >> 8) & 0xFF] ^ te3[s1 & 0xFF] ^ w[i + 2]
        t3 = te0[s3 >> 24] ^ te1[(s0 >> 16) & 0xFF] ^ te2[(s1 >> 8) & 0xFF] ^ te3[s2 & 0xFF] ^ w[i + 3]
        s0, s1, s2, s3 = t0, t1, t2, t3
    i = 4 * nr
    sb = _SBOX
    o0 = ((sb[s0 >> 24] << 24) | (sb[(s1 >> 16) & 0xFF] << 16) | (sb[(s2 >> 8) & 0xFF] << 8) | sb[s3 & 0xFF]) ^ w[i]
    o1 = ((sb[s1 >> 24] << 24) | (sb[(s2 >> 16) & 0xFF] << 16) | (sb[(s3 >> 8) & 0xFF] << 8) | sb[s0 & 0xFF]) ^ w[i + 1]
    o2 = ((sb[s2 >> 24] << 24) | (sb[(s3 >> 16) & 0xFF] << 16) | (sb[(s0 >> 8) & 0xFF] << 8) | sb[s1 & 0xFF]) ^ w[i + 2]
    o3 = ((sb[s3 >> 24] << 24) | (sb[(s0 >> 16) & 0xFF] << 16) | (sb[(s1 >> 8) & 0xFF] << 8) | sb[s2 & 0xFF]) ^ w[i + 3]
    return (
        o0.to_bytes(4, "big") + o1.to_bytes(4, "big")
        + o2.to_bytes(4, "big") + o3.to_bytes(4, "big")
    )


def _decrypt_block(block: bytes, k: _Key) -> bytes:
    w = k.dec
    nr = k.nr
    s0 = int.from_bytes(block[0:4], "big") ^ w[0]
    s1 = int.from_bytes(block[4:8], "big") ^ w[1]
    s2 = int.from_bytes(block[8:12], "big") ^ w[2]
    s3 = int.from_bytes(block[12:16], "big") ^ w[3]
    td0, td1, td2, td3 = _TD0, _TD1, _TD2, _TD3
    for r in range(1, nr):
        i = 4 * r
        t0 = td0[s0 >> 24] ^ td1[(s3 >> 16) & 0xFF] ^ td2[(s2 >> 8) & 0xFF] ^ td3[s1 & 0xFF] ^ w[i]
        t1 = td0[s1 >> 24] ^ td1[(s0 >> 16) & 0xFF] ^ td2[(s3 >> 8) & 0xFF] ^ td3[s2 & 0xFF] ^ w[i + 1]
        t2 = td0[s2 >> 24] ^ td1[(s1 >> 16) & 0xFF] ^ td2[(s0 >> 8) & 0xFF] ^ td3[s3 & 0xFF] ^ w[i + 2]
        t3 = td0[s3 >> 24] ^ td1[(s2 >> 16) & 0xFF] ^ td2[(s1 >> 8) & 0xFF] ^ td3[s0 & 0xFF] ^ w[i + 3]
        s0, s1, s2, s3 = t0, t1, t2, t3
    i = 4 * nr
    sb = _INV_SBOX
    o0 = ((sb[s0 >> 24] << 24) | (sb[(s3 >> 16) & 0xFF] << 16) | (sb[(s2 >> 8) & 0xFF] << 8) | sb[s1 & 0xFF]) ^ w[i]
    o1 = ((sb[s1 >> 24] << 24) | (sb[(s0 >> 16) & 0xFF] << 16) | (sb[(s3 >> 8) & 0xFF] << 8) | sb[s2 & 0xFF]) ^ w[i + 1]
    o2 = ((sb[s2 >> 24] << 24) | (sb[(s1 >> 16) & 0xFF] << 16) | (sb[(s0 >> 8) & 0xFF] << 8) | sb[s3 & 0xFF]) ^ w[i + 2]
    o3 = ((sb[s3 >> 24] << 24) | (sb[(s2 >> 16) & 0xFF] << 16) | (sb[(s1 >> 8) & 0xFF] << 8) | sb[s0 & 0xFF]) ^ w[i + 3]
    return (
        o0.to_bytes(4, "big") + o1.to_bytes(4, "big")
        + o2.to_bytes(4, "big") + o3.to_bytes(4, "big")
    )


# ----------------------------- CBC ------------------------------- #

def cbc_decrypt(key: bytes, data: bytes, iv: bytes | None = None) -> bytes:
    """AES-CBC decrypt. ``iv=None`` means PDF layout: the first 16
    bytes of ``data`` are the IV. Strips nothing — callers strip
    PKCS#5/7 padding themselves where the spec says so."""
    if iv is None:
        iv, data = data[:16], data[16:]
    if len(data) % 16:
        data = data[: len(data) - len(data) % 16]  # truncated tail
    k = _Key(key)
    out = bytearray()
    prev = iv
    for i in range(0, len(data), 16):
        blk = data[i : i + 16]
        out.extend(a ^ b for a, b in zip(_decrypt_block(blk, k), prev))
        prev = blk
    return bytes(out)


def cbc_encrypt(key: bytes, data: bytes, iv: bytes) -> bytes:
    """AES-CBC encrypt (fixture generation and the R6 Algorithm 2.B
    hash rounds). No padding added."""
    k = _Key(key)
    out = bytearray()
    prev = iv
    for i in range(0, len(data), 16):
        blk = bytes(a ^ b for a, b in zip(data[i : i + 16], prev))
        prev = _encrypt_block(blk, k)
        out.extend(prev)
    return bytes(out)


def strip_pkcs5(data: bytes) -> bytes:
    if not data:
        return data
    pad = data[-1]
    if 1 <= pad <= 16 and pad <= len(data):
        return data[:-pad]
    return data  # malformed padding: keep bytes (containment)


def pad_pkcs5(data: bytes) -> bytes:
    pad = 16 - len(data) % 16
    return data + bytes([pad]) * pad
