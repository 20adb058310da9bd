"""Pure-numpy baseline JPEG codec (greyscale, JFIF).

Second real image format behind the media seam (reference:
oar-ocr-core/src/utils/image.rs:65-88 decodes PNG/JPEG/… via the
`image` crate; functions/png.py covers PNG). No JPEG library exists in
this environment, so this implements the public baseline-DCT process
from the JPEG specification (ITU-T T.81 / ISO 10918-1) directly:

- encoder: 8×8 blocks, level shift, orthonormal DCT-II (matrix form),
  quality-scaled Annex-K luminance quantization, zigzag, differential
  DC + run-length AC symbols, canonical Huffman (Annex K.3 tables),
  byte-stuffed entropy stream, SOI/APP0/DQT/SOF0/DHT/SOS/EOI markers.
- decoder: marker parse (DQT/DHT/SOF0/SOS from the FILE, not assumed —
  a foreign baseline-greyscale JPEG with custom tables decodes too),
  canonical Huffman decode, dequantize, inverse zigzag, IDCT, clamp.

Scope (declared, fails loudly outside it): baseline sequential DCT,
8-bit, single greyscale component — the engine's page type. Progressive
scans, multi-component (color) images, arithmetic coding, and restart
intervals raise NotImplementedError (the codec-seam contract,
functions/multimodal.py).

JPEG is lossy: the round-trip contract here is NOT bit equality (PNG's
contract) but (a) byte-level determinism of the encoder, (b) a tested
reconstruction error bound on the synthetic pages, and (c) exact
decoder determinism — so any golden computed *through* the decode is
stable. DCT/IDCT run in float64 with a single np.round at quantize /
final clamp; every other step is integer.
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = ["encode_jpeg", "decode_jpeg", "JPEG_SOI"]

JPEG_SOI = b"\xff\xd8"

# zigzag position k -> raster index (ITU-T T.81 Figure 5)
_ZIGZAG = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
    ]
)
_UNZIGZAG = np.argsort(_ZIGZAG)

# Annex K.1 luminance quantization table (raster order)
_QTABLE_K1 = np.array(
    [
        16, 11, 10, 16, 24, 40, 51, 61,
        12, 12, 14, 19, 26, 58, 60, 55,
        14, 13, 16, 24, 40, 57, 69, 56,
        14, 17, 22, 29, 51, 87, 80, 62,
        18, 22, 37, 56, 68, 109, 103, 77,
        24, 35, 55, 64, 81, 104, 113, 92,
        49, 64, 78, 87, 103, 121, 120, 101,
        72, 92, 95, 98, 112, 100, 103, 99,
    ],
    dtype=np.int64,
).reshape(8, 8)

# Annex K.3.1 luminance DC: BITS (code-length counts 1..16) + HUFFVAL
_DC_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
_DC_VALS = list(range(12))
# Annex K.3.2 luminance AC
_AC_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
_AC_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
    0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24, 0x33, 0x62, 0x72,
    0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44, 0x45,
    0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75,
    0x76, 0x77, 0x78, 0x79, 0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2, 0xF3, 0xF4,
    0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]

# orthonormal DCT-II basis: A[u, x] = c(u) cos((2x+1) u pi / 16)
_A = np.zeros((8, 8))
for _u in range(8):
    for _x in range(8):
        _A[_u, _x] = np.sqrt((1 if _u else 0.5) / 4.0) * np.cos(
            (2 * _x + 1) * _u * np.pi / 16.0
        )


def _canonical_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """BITS/HUFFVAL → {symbol: (code, length)} (T.81 Annex C)."""
    codes: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return codes


def _scaled_qtable(quality: int) -> np.ndarray:
    """libjpeg-compatible quality scaling of the Annex-K table."""
    if not 1 <= quality <= 100:
        raise ValueError("quality must be in 1..100")
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    q = (_QTABLE_K1 * scale + 50) // 100
    return np.clip(q, 1, 255)


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, length: int) -> None:
        self.acc = (self.acc << length) | (value & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            byte = (self.acc >> (self.nbits - 8)) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:
                self.out.append(0x00)  # byte stuffing
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> None:
        if self.nbits:
            pad = 8 - self.nbits
            byte = ((self.acc << pad) | ((1 << pad) - 1)) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:
                self.out.append(0x00)
            self.acc = 0
            self.nbits = 0


def _category(v: int) -> int:
    return int(v).bit_length() if v >= 0 else int(-v).bit_length()


def encode_jpeg(img: np.ndarray, quality: int = 90) -> bytes:
    """(H,W) uint8 greyscale → baseline JFIF JPEG bytes (deterministic)."""
    if img.dtype != np.uint8 or img.ndim != 2:
        raise ValueError(f"encode_jpeg expects (H,W) uint8, got {img.dtype} {img.shape}")
    h, w = img.shape
    if h == 0 or w == 0:
        raise ValueError("empty image")
    q = _scaled_qtable(quality)

    # pad to 8-multiples by edge replication, block, DCT, quantize
    ph, pw = -(-h // 8) * 8, -(-w // 8) * 8
    padded = np.pad(img, ((0, ph - h), (0, pw - w)), mode="edge")
    blocks = (
        padded.reshape(ph // 8, 8, pw // 8, 8)
        .transpose(0, 2, 1, 3)
        .reshape(-1, 8, 8)
        .astype(np.float64)
        - 128.0
    )
    coefs = np.einsum("ux,nxy,vy->nuv", _A, blocks, _A)
    quant = np.round(coefs / q).astype(np.int64)
    zz = quant.reshape(-1, 64)[:, _ZIGZAG]

    dc_codes = _canonical_codes(_DC_BITS, _DC_VALS)
    ac_codes = _canonical_codes(_AC_BITS, _AC_VALS)
    bw = _BitWriter()
    pred = 0
    for block in zz:
        diff = int(block[0]) - pred
        pred = int(block[0])
        size = _category(diff)
        code, length = dc_codes[size]
        bw.write(code, length)
        if size:
            amp = diff if diff >= 0 else diff + (1 << size) - 1
            bw.write(amp, size)
        run = 0
        last_nz = int(np.max(np.nonzero(block)[0])) if np.any(block[1:]) else 0
        for k in range(1, 64):
            v = int(block[k])
            if k > last_nz:
                break
            if v == 0:
                run += 1
                continue
            while run >= 16:
                code, length = ac_codes[0xF0]  # ZRL
                bw.write(code, length)
                run -= 16
            size = _category(v)
            code, length = ac_codes[(run << 4) | size]
            bw.write(code, length)
            amp = v if v >= 0 else v + (1 << size) - 1
            bw.write(amp, size)
            run = 0
        if last_nz < 63:
            code, length = ac_codes[0x00]  # EOB
            bw.write(code, length)
    bw.flush()

    def seg(marker: int, body: bytes) -> bytes:
        return struct.pack(">HH", marker, len(body) + 2) + body

    out = bytearray(JPEG_SOI)
    out += seg(0xFFE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")  # APP0
    out += seg(0xFFDB, b"\x00" + bytes(q.reshape(-1)[_ZIGZAG].astype(np.uint8)))  # DQT
    out += seg(0xFFC0, struct.pack(">BHHB", 8, h, w, 1) + b"\x01\x11\x00")  # SOF0
    out += seg(0xFFC4, b"\x00" + bytes(_DC_BITS) + bytes(_DC_VALS))  # DHT DC 0
    out += seg(0xFFC4, b"\x10" + bytes(_AC_BITS) + bytes(_AC_VALS))  # DHT AC 0
    out += seg(0xFFDA, b"\x01\x01\x00\x00\x3f\x00")  # SOS
    out += bw.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)


class _BitReader:
    """Entropy-segment reader: 0xFF00 unstuffed; any other marker ends
    the stream (RSTn would land here → declared unsupported upstream)."""

    def __init__(self, data: bytes, pos: int):
        clean = bytearray()
        while pos < len(data):
            b = data[pos]
            if b == 0xFF:
                nxt = data[pos + 1] if pos + 1 < len(data) else 0xD9
                if nxt == 0x00:
                    clean.append(0xFF)
                    pos += 2
                    continue
                break  # a real marker ends the entropy segment
            clean.append(b)
            pos += 1
        self.bits = np.unpackbits(np.frombuffer(bytes(clean), dtype=np.uint8))
        self.pos = 0
        self.end = pos

    def read_bit(self) -> int:
        if self.pos >= len(self.bits):
            raise ValueError("JPEG entropy stream exhausted")
        b = int(self.bits[self.pos])
        self.pos += 1
        return b

    def read_bits(self, n: int) -> int:
        if n == 0:
            return 0
        if self.pos + n > len(self.bits):
            raise ValueError("JPEG entropy stream exhausted")
        chunk = self.bits[self.pos : self.pos + n]
        self.pos += n
        v = 0
        for b in chunk:
            v = (v << 1) | int(b)
        return v


def _decode_huffman(reader: _BitReader, table: dict[tuple[int, int], int]) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | reader.read_bit()
        sym = table.get((code, length))
        if sym is not None:
            return sym
    raise ValueError("invalid JPEG Huffman code")


def _extend(amp: int, size: int) -> int:
    if size == 0:
        return 0
    return amp if amp >= (1 << (size - 1)) else amp - (1 << size) + 1


def decode_jpeg(data: bytes) -> np.ndarray:
    """Baseline greyscale JPEG bytes → (H,W) uint8 (deterministic)."""
    if data[:2] != JPEG_SOI:
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    qtables: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict[tuple[int, int], int]] = {}
    h = w = None
    comp_qtable = comp_dc = comp_ac = 0
    while pos + 4 <= len(data):
        if data[pos] != 0xFF:
            raise ValueError(f"bad JPEG marker alignment at {pos}")
        marker = data[pos + 1]
        if marker == 0xFF:  # optional fill byte before a marker (T.81 B.1.1.2)
            pos += 1
            continue
        if marker == 0xD9:  # EOI
            break
        if marker == 0x01 or 0xD0 <= marker <= 0xD8:
            # standalone markers (TEM, RSTn, SOI) carry no length field
            pos += 2
            continue
        (seglen,) = struct.unpack(">H", data[pos + 2 : pos + 4])
        body = data[pos + 4 : pos + 2 + seglen]
        pos += 2 + seglen
        if marker == 0xDB:  # DQT (possibly several tables per segment)
            b = 0
            while b < len(body):
                prec, tid = body[b] >> 4, body[b] & 0x0F
                if prec != 0:
                    raise NotImplementedError("16-bit JPEG quant tables not supported")
                tbl = np.frombuffer(body[b + 1 : b + 65], dtype=np.uint8)
                qtables[tid] = tbl.astype(np.int64)[_UNZIGZAG].reshape(8, 8)
                b += 65
        elif marker == 0xC4:  # DHT
            b = 0
            while b < len(body):
                tclass, tid = body[b] >> 4, body[b] & 0x0F
                bits = list(body[b + 1 : b + 17])
                nvals = sum(bits)
                vals = list(body[b + 17 : b + 17 + nvals])
                codes = _canonical_codes(bits, vals)
                huff[(tclass, tid)] = {
                    (code, length): sym for sym, (code, length) in codes.items()
                }
                b += 17 + nvals
        elif marker == 0xC0:  # SOF0 baseline
            depth, h, w, ncomp = struct.unpack(">BHHB", body[:6])
            if depth != 8:
                raise NotImplementedError(f"JPEG depth {depth} not supported")
            if ncomp != 1:
                raise NotImplementedError(
                    "multi-component (color) JPEG not supported here — "
                    "the engine's pages are greyscale"
                )
            sampling = body[7]
            if sampling != 0x11:
                raise NotImplementedError("JPEG subsampling not supported")
            comp_qtable = body[8]
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB):
            raise NotImplementedError(
                f"JPEG process SOF{marker - 0xC0} (progressive/extended) not supported"
            )
        elif marker == 0xDD:  # DRI
            raise NotImplementedError("JPEG restart intervals not supported here")
        elif marker == 0xDA:  # SOS
            if h is None:
                raise ValueError("JPEG SOS before SOF0")
            comp_dc = body[2] >> 4
            comp_ac = body[2] & 0x0F
            q = qtables[comp_qtable]
            dc_tbl = huff[(0, comp_dc)]
            ac_tbl = huff[(1, comp_ac)]
            reader = _BitReader(data, pos)
            bh, bw_ = -(-h // 8), -(-w // 8)
            out = np.zeros((bh * bw_, 64), dtype=np.int64)
            pred = 0
            for n in range(bh * bw_):
                size = _decode_huffman(reader, dc_tbl)
                pred += _extend(reader.read_bits(size), size)
                out[n, 0] = pred
                k = 1
                while k < 64:
                    sym = _decode_huffman(reader, ac_tbl)
                    if sym == 0x00:  # EOB
                        break
                    if sym == 0xF0:  # ZRL
                        k += 16
                        continue
                    run, size = sym >> 4, sym & 0x0F
                    k += run
                    if k >= 64:
                        raise ValueError("JPEG AC run overflows block")
                    out[n, k] = _extend(reader.read_bits(size), size)
                    k += 1
            coefs = (out[:, _UNZIGZAG].reshape(-1, 8, 8)) * q
            blocks = np.einsum("xu,nuv,yv->nxy", _A.T, coefs.astype(np.float64), _A.T)
            pixels = np.clip(np.round(blocks + 128.0), 0, 255).astype(np.uint8)
            full = (
                pixels.reshape(bh, bw_, 8, 8)
                .transpose(0, 2, 1, 3)
                .reshape(bh * 8, bw_ * 8)
            )
            return full[:h, :w]
        # other segments (APPn, COM) are skipped
    raise ValueError("JPEG has no SOS scan")
