"""PDF standard security handler (PDF 32000-1:2008 §7.6) — pure
python + numpy, no crypto library.

Scope (declared, fails loudly outside it): the /Standard handler with
revisions R=2/3/4 — RC4 (40–128 bit, /V 1/2 and /V 4 /CFM /V2) and
AES-128-CBC (/V 4 /CFM /AESV2) — plus the AES-256 handler /V 5 with
R=5 (the deprecated Adobe ExtensionLevel 3 single-SHA-256 variant)
and R=6 (PDF 2.0, ISO 32000-2 §7.6.4 with the iterated hash 2.B) —
opened with an EMPTY user OR owner password (the overwhelmingly
common "encrypted but not password-protected" case). Non-empty
passwords raise NotImplementedError from the caller (functions/
pdf.py) so the failure is the loud declared kind, never an opaque
zlib error mid-stream.

Primitives are written against the public specs: RC4 (the well-known
KSA/PRGA), AES-128/256 (FIPS-197; vectorized over blocks with numpy
so CBC-decrypt of a long stream is table lookups over an (n,16)
array, not a per-byte python loop), the MD5-based key algorithms
2/4/5 of §7.6.3 (hashlib supplies MD5), and the SHA-2-based V5
algorithms 2.A/2.B/8/9/10 of ISO 32000-2 §7.6.4 (hashlib supplies
SHA-256/384/512). Reference handles encrypted PDFs via `hayro`
(oar-ocr Cargo.toml:20); this module is the from-scratch equivalent
for the standard handler subset.
"""

from __future__ import annotations

import hashlib
import struct

import numpy as np

__all__ = [
    "rc4",
    "aes_cbc_decrypt",
    "aes_cbc_encrypt",
    "aes_cbc_decrypt_raw",
    "aes_cbc_encrypt_raw",
    "compute_encryption_key",
    "compute_o_value",
    "compute_u_value",
    "object_key",
    "hash_2b",
    "authenticate_v5",
    "make_v5_entries",
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
# AES-128/256 (FIPS-197), vectorized over blocks
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
    """AES key schedule (FIPS-197 §5.2) → (Nr+1, 16) uint8 round keys.
    Nk=4 (AES-128, Nr=10) and Nk=8 (AES-256, Nr=14); AES-256 adds the
    extra SubWord at i % Nk == 4."""
    if len(key) not in (16, 32):
        raise ValueError("AES key must be 16 or 32 bytes")
    nk = len(key) // 4
    nr = nk + 6
    rcon = 1
    words = [list(key[i : i + 4]) for i in range(0, len(key), 4)]
    for i in range(nk, 4 * (nr + 1)):
        t = list(words[i - 1])
        if i % nk == 0:
            t = t[1:] + t[:1]
            t = [int(_SBOX[b]) for b in t]
            t[0] ^= rcon
            rcon = ((rcon << 1) ^ 0x1B) & 0xFF if rcon & 0x80 else rcon << 1
        elif nk == 8 and i % nk == 4:
            t = [int(_SBOX[b]) for b in t]
        words.append([a ^ b for a, b in zip(words[i - nk], t)])
    return np.array(words, dtype=np.uint8).reshape(nr + 1, 16)


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
    nr = rk.shape[0] - 1
    st = blocks ^ rk[0]
    for rnd in range(1, nr):
        st = _SBOX[st][:, _SHIFT]
        st = _mix_columns(st) ^ rk[rnd]
    st = _SBOX[st][:, _SHIFT]
    return st ^ rk[nr]


def _ecb_decrypt_blocks(blocks: np.ndarray, rk: np.ndarray) -> np.ndarray:
    nr = rk.shape[0] - 1
    st = blocks ^ rk[nr]
    for rnd in range(nr - 1, 0, -1):
        st = _INV_SBOX[st[:, _INV_SHIFT]]
        st = _inv_mix_columns(st ^ rk[rnd])
    st = _INV_SBOX[st[:, _INV_SHIFT]]
    return st ^ rk[0]


def aes_ecb_encrypt_block(key: bytes, block: bytes) -> bytes:
    """Single-block ECB, 128- or 256-bit key (FIPS-197 test-vector
    surface; also the /Perms entry layout, ISO 32000-2 §7.6.4.4.9)."""
    rk = _expand_key(key)
    arr = np.frombuffer(block, dtype=np.uint8).reshape(1, 16)
    return _ecb_encrypt_blocks(arr, rk).tobytes()


def aes_ecb_decrypt_block(key: bytes, block: bytes) -> bytes:
    """Single-block ECB decrypt (the /Perms verification direction)."""
    rk = _expand_key(key)
    arr = np.frombuffer(block, dtype=np.uint8).reshape(1, 16)
    return _ecb_decrypt_blocks(arr, rk).tobytes()


def aes_cbc_encrypt(key: bytes, iv: bytes, data: bytes) -> bytes:
    """AES-CBC (128- or 256-bit key) with PKCS#5 padding; returns
    iv + ciphertext (the PDF AESV2/AESV3 stream layout). Sequential
    over blocks (CBC chaining)."""
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
    """PDF AESV2/AESV3 layout: first 16 bytes IV, PKCS#5 padding
    stripped. Block-parallel: one vectorized ECB pass + a shifted
    XOR. Key length picks AES-128 vs AES-256."""
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


def aes_cbc_encrypt_raw(key: bytes, iv: bytes, data: bytes) -> bytes:
    """CBC without padding or IV prefix (ISO 32000-2 intermediate-key
    encryption of the file key, and the hash-2B inner step). `data`
    must already be a whole number of blocks."""
    if len(iv) != 16:
        raise ValueError("AES IV must be 16 bytes")
    if not data or len(data) % 16:
        raise ValueError("raw CBC data must be a whole number of blocks")
    rk = _expand_key(key)
    prev = np.frombuffer(iv, dtype=np.uint8)
    out = bytearray()
    for i in range(0, len(data), 16):
        blk = np.frombuffer(data[i : i + 16], dtype=np.uint8) ^ prev
        prev = _ecb_encrypt_blocks(blk.reshape(1, 16), rk)[0]
        out += prev.tobytes()
    return bytes(out)


def aes_cbc_decrypt_raw(key: bytes, iv: bytes, data: bytes) -> bytes:
    """CBC decrypt without padding or IV prefix (the /UE and /OE
    entries decrypt to the 32-byte file key this way, zero IV).
    Block-parallel like aes_cbc_decrypt."""
    if len(iv) != 16:
        raise ValueError("AES IV must be 16 bytes")
    if not data or len(data) % 16:
        raise ValueError("raw CBC data must be a whole number of blocks")
    arr = np.frombuffer(data, dtype=np.uint8).reshape(-1, 16)
    rk = _expand_key(key)
    prior = np.vstack([np.frombuffer(iv, dtype=np.uint8).reshape(1, 16), arr[:-1]])
    return (_ecb_decrypt_blocks(arr, rk) ^ prior).tobytes()


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
    the 'sAlT' bytes). V5/AESV3 does NOT use this — the file key is
    applied to every object directly (algorithm 1.A)."""
    h = hashlib.md5()
    h.update(enc_key)
    h.update(struct.pack("<I", num)[:3])
    h.update(struct.pack("<I", gen)[:2])
    if aes:
        h.update(b"sAlT")
    return h.digest()[: min(len(enc_key) + 5, 16)]


# ---------------------------------------------------------------------------
# AES-256 handler (/V 5, R=5/6) key algorithms (ISO 32000-2 §7.6.4)
# ---------------------------------------------------------------------------

def _build_ttables():
    """Classic 32-bit T-tables for the ENCRYPT direction (big-endian
    words): T0[x] packs (2·S, S, S, 3·S). A CBC chain is inherently
    sequential, so the numpy block-parallel core above gains nothing
    there; plain-int table lookups are ~25× faster per block, which is
    what the hash-2B KDF (64+ rounds × hundreds of chained blocks)
    needs."""
    m2, m3 = _MUL[2], _MUL[3]
    t0 = [
        (int(m2[s]) << 24) | (int(s) << 16) | (int(s) << 8) | int(m3[s])
        for s in (int(_SBOX[x]) for x in range(256))
    ]
    t1 = [((v >> 8) | ((v & 0xFF) << 24)) & 0xFFFFFFFF for v in t0]
    t2 = [((v >> 8) | ((v & 0xFF) << 24)) & 0xFFFFFFFF for v in t1]
    t3 = [((v >> 8) | ((v & 0xFF) << 24)) & 0xFFFFFFFF for v in t2]
    return t0, t1, t2, t3


_T0, _T1, _T2, _T3 = _build_ttables()
_SBOX_INT = [int(b) for b in _SBOX]


def _cbc_encrypt_chain_128(key: bytes, iv: bytes, data: bytes) -> bytes:
    """AES-128-CBC encrypt of a whole-block buffer as one tight
    plain-int loop (the hash-2B hot path; equality with the numpy
    core is pinned in tests)."""
    rkw = [
        int.from_bytes(rk_bytes, "big")
        for round_key in _expand_key(key)
        for rk_bytes in (round_key.tobytes()[i : i + 4] for i in (0, 4, 8, 12))
    ]
    t0, t1, t2, t3, sb = _T0, _T1, _T2, _T3, _SBOX_INT
    prev = int.from_bytes(iv, "big")
    out = bytearray()
    for off in range(0, len(data), 16):
        blk = int.from_bytes(data[off : off + 16], "big") ^ prev
        s0 = (blk >> 96) ^ rkw[0]
        s1 = ((blk >> 64) & 0xFFFFFFFF) ^ rkw[1]
        s2 = ((blk >> 32) & 0xFFFFFFFF) ^ rkw[2]
        s3 = (blk & 0xFFFFFFFF) ^ rkw[3]
        for r in range(1, 10):
            k = 4 * r
            u0 = t0[s0 >> 24] ^ t1[(s1 >> 16) & 255] ^ t2[(s2 >> 8) & 255] ^ t3[s3 & 255] ^ rkw[k]
            u1 = t0[s1 >> 24] ^ t1[(s2 >> 16) & 255] ^ t2[(s3 >> 8) & 255] ^ t3[s0 & 255] ^ rkw[k + 1]
            u2 = t0[s2 >> 24] ^ t1[(s3 >> 16) & 255] ^ t2[(s0 >> 8) & 255] ^ t3[s1 & 255] ^ rkw[k + 2]
            u3 = t0[s3 >> 24] ^ t1[(s0 >> 16) & 255] ^ t2[(s1 >> 8) & 255] ^ t3[s2 & 255] ^ rkw[k + 3]
            s0, s1, s2, s3 = u0, u1, u2, u3
        v0 = ((sb[s0 >> 24] << 24) | (sb[(s1 >> 16) & 255] << 16) | (sb[(s2 >> 8) & 255] << 8) | sb[s3 & 255]) ^ rkw[40]
        v1 = ((sb[s1 >> 24] << 24) | (sb[(s2 >> 16) & 255] << 16) | (sb[(s3 >> 8) & 255] << 8) | sb[s0 & 255]) ^ rkw[41]
        v2 = ((sb[s2 >> 24] << 24) | (sb[(s3 >> 16) & 255] << 16) | (sb[(s0 >> 8) & 255] << 8) | sb[s1 & 255]) ^ rkw[42]
        v3 = ((sb[s3 >> 24] << 24) | (sb[(s0 >> 16) & 255] << 16) | (sb[(s1 >> 8) & 255] << 8) | sb[s2 & 255]) ^ rkw[43]
        prev = (v0 << 96) | (v1 << 64) | (v2 << 32) | v3
        out += prev.to_bytes(16, "big")
    return bytes(out)


def hash_2b(password: bytes, salt: bytes, udata: bytes = b"") -> bytes:
    """ISO 32000-2 §7.6.4.3.4 algorithm 2.B (the R=6 iterated hash):
    SHA-256 seed, then rounds of AES-128-CBC over 64 copies of
    (password + K + udata) with the next digest family chosen by the
    first 16 ciphertext bytes mod 3, until round >= 64 and the last
    ciphertext byte <= round - 32. (A KDF — deliberately expensive;
    the T-table chain keeps it ~0.1 s instead of seconds.)"""
    k = hashlib.sha256(password + salt + udata).digest()
    families = (hashlib.sha256, hashlib.sha384, hashlib.sha512)
    rnd = 0
    while True:
        k1 = (password + k + udata) * 64
        e = _cbc_encrypt_chain_128(k[:16], k[16:32], k1)
        k = families[sum(e[:16]) % 3](e).digest()
        rnd += 1
        if rnd >= 64 and e[-1] <= rnd - 32:
            return k[:32]


def _v5_hash(password: bytes, salt: bytes, udata: bytes, r: int) -> bytes:
    # R=5 (the deprecated Adobe ExtensionLevel 3 handler) hashes once
    # with SHA-256; R=6 (PDF 2.0) runs the iterated hash 2.B
    if r == 5:
        return hashlib.sha256(password + salt + udata).digest()
    return hash_2b(password, salt, udata)


def authenticate_v5(
    password: bytes,
    r: int,
    u_value: bytes,
    ue_value: bytes,
    o_value: bytes = b"",
    oe_value: bytes = b"",
) -> bytes | None:
    """Algorithms 2.A / 8 / 9 (ISO 32000-2 §7.6.4): validate `password`
    as the user then the owner password and return the 32-byte file
    encryption key, or None if neither validates. /U and /O are 48
    bytes: 32-byte verification hash + 8-byte validation salt + 8-byte
    key salt; /UE and /OE hold the file key AES-256-CBC-encrypted
    (zero IV, no padding) under the password's intermediate key."""
    u = u_value[:48]
    if len(u) < 48 or len(ue_value) < 32:
        raise ValueError("V5 /U must be 48 bytes and /UE 32 bytes")
    if _v5_hash(password, u[32:40], b"", r) == u[:32]:
        ik = _v5_hash(password, u[40:48], b"", r)
        return aes_cbc_decrypt_raw(ik, b"\x00" * 16, ue_value[:32])
    o = o_value[:48]
    if len(o) == 48 and len(oe_value) >= 32:
        if _v5_hash(password, o[32:40], u, r) == o[:32]:
            ik = _v5_hash(password, o[40:48], u, r)
            return aes_cbc_decrypt_raw(ik, b"\x00" * 16, oe_value[:32])
    return None


def make_v5_entries(
    file_key: bytes,
    p: int,
    r: int = 6,
    user_pw: bytes = b"",
    owner_pw: bytes = b"",
    seed: bytes = b"",
) -> tuple[bytes, bytes, bytes, bytes, bytes]:
    """Writer side of §7.6.4 (algorithms 8/9/10): deterministic
    (/U, /UE, /O, /OE, /Perms) for a chosen 32-byte file key. Salts
    derive from SHA-256 of `seed` — the fixture determinism contract
    forbids RNG; the spec only asks that salts vary per file, which a
    content-derived seed provides."""
    if len(file_key) != 32:
        raise ValueError("V5 file key must be 32 bytes")
    s = hashlib.sha256(b"oar-ocr-spark-v5-salts" + seed).digest()
    uvs, uks, ovs, oks = s[0:8], s[8:16], s[16:24], s[24:32]
    u = _v5_hash(user_pw, uvs, b"", r) + uvs + uks
    ue = aes_cbc_encrypt_raw(_v5_hash(user_pw, uks, b"", r), b"\x00" * 16, file_key)
    o = _v5_hash(owner_pw, ovs, u, r) + ovs + oks
    oe = aes_cbc_encrypt_raw(_v5_hash(owner_pw, oks, u, r), b"\x00" * 16, file_key)
    # /Perms (algorithm 10): P as LE int32, 0xFF filler, 'T' for
    # EncryptMetadata=true, the 'adb' sentinel, 4 arbitrary bytes
    perms = bytearray(16)
    struct.pack_into("<i", perms, 0, p)
    perms[4:8] = b"\xff\xff\xff\xff"
    perms[8:12] = b"Tadb"
    perms[12:16] = hashlib.sha256(b"oar-ocr-spark-v5-perms" + seed).digest()[:4]
    return u, ue, o, oe, aes_ecb_encrypt_block(file_key, bytes(perms))
