"""AES core (extract/aes.py) against the FIPS-197 Appendix C vectors
plus CBC/PKCS#5 round-trips — the primitives under AESV2/AESV3 PDF
decryption."""

from docling_serve_spark.extract.aes import (
    _decrypt_block,
    _encrypt_block,
    _expand_key,
    cbc_decrypt,
    cbc_encrypt,
    pad_pkcs5,
    strip_pkcs5,
)

PT = bytes.fromhex("00112233445566778899aabbccddeeff")
K128 = bytes.fromhex("000102030405060708090a0b0c0d0e0f")
K192 = bytes.fromhex("000102030405060708090a0b0c0d0e0f1011121314151617")
K256 = bytes.fromhex(
    "000102030405060708090a0b0c0d0e0f101112131415161718191a1b1c1d1e1f"
)


def test_fips197_vectors():
    assert _encrypt_block(PT, _expand_key(K128)).hex() == (
        "69c4e0d86a7b0430d8cdb78070b4c55a"
    )
    assert _encrypt_block(PT, _expand_key(K192)).hex() == (
        "dda97ca4864cdfe06eaf70a0ec0d7191"
    )
    assert _encrypt_block(PT, _expand_key(K256)).hex() == (
        "8ea2b7ca516745bfeafc49904b496089"
    )


def test_block_decrypt_inverts():
    for key in (K128, K192, K256):
        rks = _expand_key(key)
        assert _decrypt_block(_encrypt_block(PT, rks), rks) == PT


def test_cbc_roundtrip_with_pdf_iv_layout():
    iv = bytes(range(16))
    data = b"the quick brown fox jumps over the lazy dog" * 3
    ct = iv + cbc_encrypt(K256, pad_pkcs5(data), iv)
    assert strip_pkcs5(cbc_decrypt(K256, ct)) == data


def test_truncated_ciphertext_contained():
    iv = bytes(16)
    ct = iv + cbc_encrypt(K128, pad_pkcs5(b"x" * 40), iv)
    # chopping mid-block must not raise; partial plaintext comes back
    out = cbc_decrypt(K128, ct[:-7])
    assert isinstance(out, bytes)
