"""PDF standard security handler (PDF 32000-1:2008 §7.6) — pure
python + numpy, no crypto library.

Scope (declared, fails loudly outside it): the /Standard handler with
revisions R=2/3/4 — RC4 (40–128 bit, /V 1/2 and /V 4 /CFM /V2) and
AES-128-CBC (/V 4 /CFM /AESV2) — opened with an EMPTY user password
(the overwhelmingly common "encrypted but not password-protected"
case). Non-empty passwords and the AES-256 /V 5 handler raise
NotImplementedError from the caller (functions/pdf.py) so the failure
is the loud declared kind, never an opaque zlib error mid-stream.

Primitives are written against the public specs: RC4 (the well-known
KSA/PRGA), AES (FIPS-197; vectorized over blocks with numpy so
CBC-decrypt of a long stream is table lookups over an (n,16) array,
not a per-byte python loop), and the MD5-based key algorithms 2/4/5
of §7.6.3 (hashlib supplies MD5). Reference handles encrypted PDFs
via `hayro` (oar-ocr Cargo.toml:20); this module is the from-scratch
equivalent for the standard handler subset.
"""

from __future__ import annotations

import hashlib
import struct

import numpy as np

__all__ = [
    "rc4",
    "aes_cbc_decrypt",
    "aes_cbc_encrypt",
    "compute_encryption_key",
    "compute_o_value",
    "compute_u_value",
    "object_key",
    "PAD",
]

# §7.6.3.3 algorithm-2 padding string (public constant from the spec)
PAD = bytes(
    [
        0x28, 0xBF, 0x4E, 0x5E, 0x4E, 0x75, 0x8A, 0x41,
        0x64, 0x00, 0x4E, 0x56, 0xFF, 0xFA, 0x01, 0x08,
        0x2E, 0x2E, 0x00, 0xB6, 0xD0, 0x68, 0x3E, 0x80,
        0x2F, 0x0C, 0xA9, 0xFE, 0x64, 0x53, 0x69, 0x7A,
    ]
)


# ---------------------------------------------------------------------------
# RC4
# ---------------------------------------------------------------------------

def rc4(key: bytes, data: bytes) -> bytes:
    """RC4 (symmetric: encrypt == decrypt). Sequential by nature; PDF
    strings/streams at fixture scale keep this cheap."""
    if not key:
        raise ValueError("RC4 key must be non-empty")
    s = list(range(256))
    j = 0
    for i in range(256):
        j = (j + s[i] + key[i % len(key)]) & 0xFF
        s[i], s[j] = s[j], s[i]
    out = bytearray(len(data))
    i = j = 0
    for k, c in enumerate(data):
        i = (i + 1) & 0xFF
        j = (j + s[i]) & 0xFF
        s[i], s[j] = s[j], s[i]
        out[k] = c ^ s[(s[i] + s[j]) & 0xFF]
    return bytes(out)


# ---------------------------------------------------------------------------
# AES-128 (FIPS-197), vectorized over blocks
# ---------------------------------------------------------------------------

def _build_tables():
    # GF(2^8) multiply LUTs derived from first principles at import
    def gmul(a: int, b: int) -> int:
        p = 0
        for _ in range(8):
            if b & 1:
                p ^= a
            hi = a & 0x80
            a = (a << 1) & 0xFF
            if hi:
                a ^= 0x1B
            b >>= 1
        return p

    # S-box from the multiplicative inverse + affine transform; x=0 has
    # inverse 0, and the affine constant makes S(0) = 0x63
    inv = [0] * 256
    for x in range(1, 256):
        for y in range(1, 256):
            if gmul(x, y) == 1:
                inv[x] = y
                break
    sbox = np.zeros(256, dtype=np.uint8)
    for x in range(256):
        b = inv[x]
        r = 0x63
        for i in range(8):
            bit = (
                (b >> i)
                ^ (b >> ((i + 4) % 8))
                ^ (b >> ((i + 5) % 8))
                ^ (b >> ((i + 6) % 8))
                ^ (b >> ((i + 7) % 8))
            ) & 1
            r ^= bit << i
        sbox[x] = r
    inv_sbox = np.zeros(256, dtype=np.uint8)
    inv_sbox[sbox] = np.arange(256, dtype=np.uint8)
    mul = {
        m: np.array([gmul(x, m) for x in range(256)], dtype=np.uint8)
        for m in (2, 3, 9, 11, 13, 14)
    }
    return sbox, inv_sbox, mul


_SBOX, _INV_SBOX, _MUL = _build_tables()

# input-order byte layout: byte index r + 4c is state[row r][col c].
# ShiftRows moves state[r][c] ← state[r][(c + r) % 4], i.e. the output
# byte at index r + 4c comes from input index r + 4((c + r) % 4)
# (generated c-outer/r-inner, so list position 4c + r IS output index)
_SHIFT = np.array([r + 4 * ((c + r) % 4) for c in range(4) for r in range(4)])
_INV_SHIFT = np.argsort(_SHIFT)


def _expand_key(key: bytes) -> np.ndarray:
    """AES-128 key schedule → (11, 16) uint8 round keys."""
    if len(key) != 16:
        raise ValueError("AES-128 key must be 16 bytes")
    rcon = 1
    words = [list(key[i : i + 4]) for i in range(0, 16, 4)]
    for i in range(4, 44):
        t = list(words[i - 1])
        if i % 4 == 0:
            t = t[1:] + t[:1]
            t = [int(_SBOX[b]) for b in t]
            t[0] ^= rcon
            rcon = ((rcon << 1) ^ 0x1B) & 0xFF if rcon & 0x80 else rcon << 1
        words.append([a ^ b for a, b in zip(words[i - 4], t)])
    flat = np.array(words, dtype=np.uint8).reshape(11, 16)
    return flat


def _mix_columns(st: np.ndarray) -> np.ndarray:
    a = st.reshape(-1, 4, 4)  # (n, col, row)
    m2, m3 = _MUL[2], _MUL[3]
    out = np.empty_like(a)
    out[:, :, 0] = m2[a[:, :, 0]] ^ m3[a[:, :, 1]] ^ a[:, :, 2] ^ a[:, :, 3]
    out[:, :, 1] = a[:, :, 0] ^ m2[a[:, :, 1]] ^ m3[a[:, :, 2]] ^ a[:, :, 3]
    out[:, :, 2] = a[:, :, 0] ^ a[:, :, 1] ^ m2[a[:, :, 2]] ^ m3[a[:, :, 3]]
    out[:, :, 3] = m3[a[:, :, 0]] ^ a[:, :, 1] ^ a[:, :, 2] ^ m2[a[:, :, 3]]
    return out.reshape(-1, 16)


def _inv_mix_columns(st: np.ndarray) -> np.ndarray:
    a = st.reshape(-1, 4, 4)
    m9, m11, m13, m14 = _MUL[9], _MUL[11], _MUL[13], _MUL[14]
    out = np.empty_like(a)
    out[:, :, 0] = m14[a[:, :, 0]] ^ m11[a[:, :, 1]] ^ m13[a[:, :, 2]] ^ m9[a[:, :, 3]]
    out[:, :, 1] = m9[a[:, :, 0]] ^ m14[a[:, :, 1]] ^ m11[a[:, :, 2]] ^ m13[a[:, :, 3]]
    out[:, :, 2] = m13[a[:, :, 0]] ^ m9[a[:, :, 1]] ^ m14[a[:, :, 2]] ^ m11[a[:, :, 3]]
    out[:, :, 3] = m11[a[:, :, 0]] ^ m13[a[:, :, 1]] ^ m9[a[:, :, 2]] ^ m14[a[:, :, 3]]
    return out.reshape(-1, 16)


def _ecb_encrypt_blocks(blocks: np.ndarray, rk: np.ndarray) -> np.ndarray:
    st = blocks ^ rk[0]
    for rnd in range(1, 10):
        st = _SBOX[st][:, _SHIFT]
        st = _mix_columns(st) ^ rk[rnd]
    st = _SBOX[st][:, _SHIFT]
    return st ^ rk[10]


def _ecb_decrypt_blocks(blocks: np.ndarray, rk: np.ndarray) -> np.ndarray:
    st = blocks ^ rk[10]
    for rnd in range(9, 0, -1):
        st = _INV_SBOX[st[:, _INV_SHIFT]]
        st = _inv_mix_columns(st ^ rk[rnd])
    st = _INV_SBOX[st[:, _INV_SHIFT]]
    return st ^ rk[0]


def aes_ecb_encrypt_block(key: bytes, block: bytes) -> bytes:
    """Single-block ECB (FIPS-197 test-vector surface)."""
    rk = _expand_key(key)
    arr = np.frombuffer(block, dtype=np.uint8).reshape(1, 16)
    return _ecb_encrypt_blocks(arr, rk).tobytes()


def aes_cbc_encrypt(key: bytes, iv: bytes, data: bytes) -> bytes:
    """AES-128-CBC with PKCS#5 padding; returns iv + ciphertext (the
    PDF AESV2 stream layout). Sequential over blocks (CBC chaining)."""
    if len(iv) != 16:
        raise ValueError("AES IV must be 16 bytes")
    rk = _expand_key(key)
    padlen = 16 - (len(data) % 16)
    buf = data + bytes([padlen]) * padlen
    prev = np.frombuffer(iv, dtype=np.uint8)
    out = bytearray(iv)
    for i in range(0, len(buf), 16):
        blk = np.frombuffer(buf[i : i + 16], dtype=np.uint8) ^ prev
        prev = _ecb_encrypt_blocks(blk.reshape(1, 16), rk)[0]
        out += prev.tobytes()
    return bytes(out)


def aes_cbc_decrypt(key: bytes, data: bytes) -> bytes:
    """PDF AESV2 layout: first 16 bytes IV, PKCS#5 padding stripped.
    Block-parallel: one vectorized ECB pass + a shifted XOR."""
    if len(data) < 32 or len(data) % 16:
        raise ValueError("AES-CBC data must be iv + a whole number of blocks")
    arr = np.frombuffer(data, dtype=np.uint8).reshape(-1, 16)
    rk = _expand_key(key)
    plain = _ecb_decrypt_blocks(arr[1:], rk) ^ arr[:-1]
    raw = plain.tobytes()
    padlen = raw[-1]
    if not 1 <= padlen <= 16 or raw[-padlen:] != bytes([padlen]) * padlen:
        raise ValueError("AES-CBC padding invalid (wrong key or corrupt data)")
    return raw[:-padlen]


# ---------------------------------------------------------------------------
# standard security handler key algorithms (§7.6.3)
# ---------------------------------------------------------------------------

def _pad_password(pw: bytes) -> bytes:
    return (pw + PAD)[:32]


def compute_encryption_key(
    password: bytes,
    o_value: bytes,
    p: int,
    id0: bytes,
    r: int,
    length_bits: int,
    encrypt_metadata: bool = True,
) -> bytes:
    """Algorithm 2: the file encryption key."""
    h = hashlib.md5()
    h.update(_pad_password(password))
    h.update(o_value[:32])
    h.update(struct.pack("<I", p & 0xFFFFFFFF))  # /P as 4-byte LE (signed bits)
    h.update(id0)
    if r >= 4 and not encrypt_metadata:
        h.update(b"\xff\xff\xff\xff")
    key = h.digest()
    n = length_bits // 8 if r >= 3 else 5
    if r >= 3:
        for _ in range(50):
            key = hashlib.md5(key[:n]).digest()
    return key[:n]


def compute_o_value(owner_pw: bytes, user_pw: bytes, r: int, length_bits: int) -> bytes:
    """Algorithm 3: the /O entry."""
    key = hashlib.md5(_pad_password(owner_pw or user_pw)).digest()
    n = length_bits // 8 if r >= 3 else 5
    if r >= 3:
        for _ in range(50):
            key = hashlib.md5(key[:n]).digest()
    rc4_key = key[:n]
    out = rc4(rc4_key, _pad_password(user_pw))
    if r >= 3:
        for i in range(1, 20):
            out = rc4(bytes(b ^ i for b in rc4_key), out)
    return out


def compute_u_value(enc_key: bytes, id0: bytes, r: int) -> bytes:
    """Algorithms 4 (R=2) / 5 (R>=3): the /U entry (32 bytes)."""
    if r == 2:
        return rc4(enc_key, PAD)
    h = hashlib.md5(PAD + id0).digest()
    out = rc4(enc_key, h)
    for i in range(1, 20):
        out = rc4(bytes(b ^ i for b in enc_key), out)
    return out + b"\x00" * 16  # 16 bytes of arbitrary padding


def object_key(enc_key: bytes, num: int, gen: int, aes: bool) -> bytes:
    """Algorithm 1: the per-object key (num/gen salted MD5; AESV2 adds
    the 'sAlT' bytes)."""
    h = hashlib.md5()
    h.update(enc_key)
    h.update(struct.pack("<I", num)[:3])
    h.update(struct.pack("<I", gen)[:2])
    if aes:
        h.update(b"sAlT")
    return h.digest()[: min(len(enc_key) + 5, 16)]
