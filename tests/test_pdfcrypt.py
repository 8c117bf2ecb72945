"""PDF standard security handler (r17): primitive known-answer pins
(the ciphers validate against FIPS/SP-800 vectors, not against
themselves), KDF behavior, full encrypted-document roundtrips, and
the password gate."""

import numpy as np
import pytest

from iceberg_python_spark.operators import pdfcrypt
from iceberg_python_spark.operators.pdf import (
    PdfDocument,
    decode_pdf_text,
    encode_pdf,
    encode_pdf_encrypted,
)


def test_aes_fips197_known_answer_vectors():
    pt = bytes.fromhex("00112233445566778899aabbccddeeff")
    cases = [
        ("000102030405060708090a0b0c0d0e0f", "69c4e0d86a7b0430d8cdb78070b4c55a"),
        ("000102030405060708090a0b0c0d0e0f1011121314151617", "dda97ca4864cdfe06eaf70a0ec0d7191"),
        (
            "000102030405060708090a0b0c0d0e0f101112131415161718191a1b1c1d1e1f",
            "8ea2b7ca516745bfeafc49904b496089",
        ),
    ]
    for key_hex, ct_hex in cases:
        key = bytes.fromhex(key_hex)
        assert pdfcrypt.aes_encrypt_block(key, pt).hex() == ct_hex
        assert pdfcrypt.aes_decrypt_block(key, bytes.fromhex(ct_hex)) == pt


def test_aes_cbc_sp800_38a_vector_and_padding():
    key = bytes.fromhex("2b7e151628aed2a6abf7158809cf4f3c")
    iv = bytes.fromhex("000102030405060708090a0b0c0d0e0f")
    p1 = bytes.fromhex("6bc1bee22e409f96e93d7e117393172a")
    ct = pdfcrypt.aes_cbc_encrypt(key, p1, iv)
    assert ct[:16] == iv
    assert ct[16:32].hex() == "7649abac8119b246cee98e9b12e9197d"  # F.2.1
    assert pdfcrypt.aes_cbc_decrypt(key, ct) == p1
    # arbitrary-length padding roundtrip
    for n in (0, 1, 15, 16, 17, 100):
        msg = bytes(range(256))[:n]
        assert pdfcrypt.aes_cbc_decrypt(key, pdfcrypt.aes_cbc_encrypt(key, msg, iv)) == msg
    with pytest.raises(ValueError):
        pdfcrypt.aes_cbc_decrypt(key, b"\x00" * 24)  # not block-aligned
    bad = bytearray(ct)
    bad[-1] ^= 0xFF
    with pytest.raises(ValueError):
        pdfcrypt.aes_cbc_decrypt(key, bytes(bad))


def test_rc4_published_vectors():
    assert pdfcrypt.rc4(b"Key", b"Plaintext").hex() == "bbf316e8d940af0ad3"
    assert pdfcrypt.rc4(b"Wiki", b"pedia").hex() == "1021bf0420"
    assert pdfcrypt.rc4(b"Secret", b"Attack at dawn").hex() == "45a01f645fc35b383552544b9bf5"
    # involution
    assert pdfcrypt.rc4(b"k", pdfcrypt.rc4(b"k", b"payload")) == b"payload"


def test_object_key_salting():
    fk = bytes(range(16))
    k_rc4 = pdfcrypt.object_key(fk, "rc4", 7, 0)
    k_aes = pdfcrypt.object_key(fk, "aes-128", 7, 0)
    assert k_rc4 != k_aes  # the sAlT bytes must matter
    assert pdfcrypt.object_key(fk, "rc4", 8, 0) != k_rc4  # object number matters
    assert pdfcrypt.object_key(b"\x01" * 32, "aes-256", 7, 0) == b"\x01" * 32


@pytest.mark.parametrize("mode", ["rc4-40", "rc4-128", "aes-128", "aes-256"])
def test_encrypted_pdf_roundtrip(mode):
    pages = ["secret page one\nline two", "secret page two ünïcödé"]
    data = encode_pdf_encrypted(pages, mode=mode)
    assert encode_pdf_encrypted(pages, mode=mode) == data  # deterministic
    assert decode_pdf_text(data) == pages
    # same text as the unencrypted writer -> one oracle serves both
    assert decode_pdf_text(encode_pdf(pages)) == pages
    doc = PdfDocument(data)
    assert doc._file_key is not None
    # the encrypted bytes must actually differ from plaintext streams
    plain = encode_pdf(pages)
    assert b"secret" not in data or mode.startswith("none")
    del plain


def test_password_protected_gates_loudly():
    data = encode_pdf_encrypted(["x"], mode="rc4-128", user_password=b"hunter2")
    with pytest.raises(NotImplementedError, match="password-protected"):
        decode_pdf_text(data)
    # corrupting /U of an empty-password file also refuses (wrong key
    # would otherwise yield garbage bytes silently)
    good = encode_pdf_encrypted(["x"], mode="aes-128")
    ix = good.find(b"/U <")
    bad = good[: ix + 4] + b"00" * 2 + good[ix + 8 :]
    with pytest.raises((NotImplementedError, ValueError)):
        decode_pdf_text(bad)


def test_encrypted_structured_corruption_contract():
    good = encode_pdf_encrypted(["corrupt me", "second"], mode="aes-128")
    g = np.frombuffer(good, np.uint8).copy()
    for trial in range(60):
        r = np.random.default_rng(trial * 11 + 2)
        b = g.copy()
        mode = trial % 3
        if mode == 0:
            b = b[: r.integers(1, len(b))]
        elif mode == 1:
            idx = r.integers(0, len(b), size=max(1, len(b) // 40))
            b[idx] ^= r.integers(1, 256, size=len(idx)).astype(np.uint8)
        else:
            s = int(r.integers(0, len(b)))
            b[s : s + 16] = 0
        try:
            decode_pdf_text(b.tobytes())
        except (ValueError, NotImplementedError):
            pass
