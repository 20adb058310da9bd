"""Pure-python BMP decoder (+ minimal fixture encoder).

Fifth image format behind the media seam: Windows bitmaps turn up in
legacy document dumps and old-web crawls. Written against the public
BITMAPINFOHEADER layout:

- decoder: BM header, BITMAPINFOHEADER (40+ byte info headers,
  incl. the V4/V5 layouts whose mask words sit at the same file
  offsets) AND the 12-byte OS/2 BITMAPCOREHEADER (BMP 1.x old-web
  crawls: uint16 dims, packed 3-byte BGR palette triples, BI_RGB
  only), bottom-up AND top-down (negative height) row order,
  4-byte row padding, 24/32-bit BGR(A) truecolor (alpha ignored —
  BMP alpha is rarely meaningful), 16-bit RGB555 and explicit
  BI_BITFIELDS masks on 16/32-bit words (any contiguous masks,
  channels rescaled to 8 bits), 8-bit and 4-bit paletted, 1-bit
  bilevel, and RLE8 + RLE4 compression (runs, literals,
  EOL/EOF/delta escapes; RLE4 runs alternate the value nibbles).
  BI_ALPHABITFIELDS (the Windows CE variant) decodes through the
  same mask path with its fourth (alpha) mask ignored.
- encoder (`encode_bmp`): 24-bit truecolor or 8-bit paletted
  (optionally RLE8) fixture writer.

Scope (declared, fails loudly outside it): embedded PNG/JPEG
(BI_JPEG/BI_PNG) raises NotImplementedError; corrupt RLE streams
and non-contiguous/empty bitfield masks raise ValueError.
"""

from __future__ import annotations

import struct

import numpy as np

from .codec_guard import loud_decode

__all__ = ["encode_bmp", "decode_bmp", "BMP_MAGIC"]

BMP_MAGIC = b"BM"


def encode_bmp(
    img: np.ndarray,
    palette: np.ndarray | None = None,
    rle: bool = False,
    bitfields: bool = False,
) -> bytes:
    """(H,W,3) uint8 RGB → 24-bit BMP (bitfields=True → 32-bit
    BI_BITFIELDS with byte-aligned 0xFF0000/0xFF00/0xFF masks —
    lossless, exercises the explicit-mask decode path), or (H,W)
    uint8 indices + (N,3) palette → 8-bit paletted BMP (rle=True →
    RLE8)."""
    if img.dtype != np.uint8:
        raise ValueError("encode_bmp expects uint8")
    if bitfields:
        if img.ndim != 3 or img.shape[2] != 3 or palette is not None or rle:
            raise ValueError("bitfields encodes (H,W,3) RGB only")
        h, w = img.shape[:2]
        words = (
            (img[:, :, 0].astype(np.uint32) << 16)
            | (img[:, :, 1].astype(np.uint32) << 8)
            | img[:, :, 2].astype(np.uint32)
        )
        body = bytearray()
        for y in range(h - 1, -1, -1):  # bottom-up; 32-bit rows need no pad
            body += words[y].astype("<u4").tobytes()
        bpp, ncolors, comp = 32, 0, 3
        pal_bytes = struct.pack("<III", 0x00FF0000, 0x0000FF00, 0x000000FF)
    elif img.ndim == 3 and img.shape[2] == 3:
        if palette is not None or rle:
            raise ValueError("palette/rle apply to 8-bit images only")
        h, w = img.shape[:2]
        row = w * 3
        pad = (-row) % 4
        body = bytearray()
        for y in range(h - 1, -1, -1):  # bottom-up
            body += img[y, :, ::-1].tobytes() + b"\x00" * pad
        bpp, ncolors, comp, pal_bytes = 24, 0, 0, b""
    elif img.ndim == 2 and palette is not None:
        if palette.ndim != 2 or palette.shape[1] != 3 or len(palette) > 256:
            raise ValueError("palette must be (N<=256,3)")
        if int(img.max(initial=0)) >= len(palette):
            raise ValueError("palette index out of range")
        h, w = img.shape
        pal = np.zeros((len(palette), 4), dtype=np.uint8)
        pal[:, :3] = palette[:, ::-1]  # BGR0 quads
        pal_bytes = pal.tobytes()
        ncolors = len(palette)
        if rle:
            body = bytearray()
            for y in range(h - 1, -1, -1):
                x = 0
                rowv = img[y]
                while x < w:
                    run = 1
                    while x + run < w and rowv[x + run] == rowv[x] and run < 255:
                        run += 1
                    body += bytes([run, int(rowv[x])])
                    x += run
                body += b"\x00\x00"  # end of line
            body += b"\x00\x01"  # end of bitmap
            bpp, comp = 8, 1
        else:
            pad = (-w) % 4
            body = bytearray()
            for y in range(h - 1, -1, -1):
                body += img[y].tobytes() + b"\x00" * pad
            bpp, comp = 8, 0
    else:
        raise ValueError("encode_bmp expects (H,W,3) RGB or (H,W)+palette")
    off = 14 + 40 + len(pal_bytes)
    info = struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, bpp, comp, len(body), 2835, 2835, ncolors, 0
    )
    header = b"BM" + struct.pack("<IHHI", off + len(body), 0, 0, off)
    return header + info + pal_bytes + bytes(body)


def _bitfield_channels(words: np.ndarray, masks: tuple[int, int, int]) -> np.ndarray:
    """(H,W) pixel words + three channel masks → (H,W,3) uint8 RGB.
    Each mask must be non-empty and contiguous; channel values are
    rescaled to 8 bits with exact integer floor division (the usual
    round-to-nearest variants differ per renderer; floor is the
    deterministic fixture-friendly choice)."""
    chans = []
    for mask in masks:
        if mask == 0:
            raise ValueError("BMP bitfield mask is empty")
        shift = (mask & -mask).bit_length() - 1
        m = mask >> shift
        if m & (m + 1):
            raise ValueError("BMP bitfield mask is non-contiguous")
        vals = (words >> np.uint32(shift)) & np.uint32(m)
        chans.append((vals.astype(np.uint32) * 255 // m).astype(np.uint8))
    return np.stack(chans, axis=-1)


def _rle4_decode(data: bytes, h: int, w: int) -> np.ndarray:
    """RLE4: runs alternate the value byte's two nibbles; literal runs
    pack nibbles MSB-first, each literal word-aligned (pad byte when the
    nibble bytes are odd). Escapes (EOL/EOF/delta) are shared with RLE8."""
    out = np.zeros((h, w), dtype=np.uint8)
    x = y = 0
    i = 0
    while i + 1 < len(data):
        a, b = data[i], data[i + 1]
        i += 2
        if a:  # run of a pixels alternating b's nibbles
            if y >= h or x + a > w:
                raise ValueError("BMP RLE4 run overflows bitmap bounds")
            pair = np.array([b >> 4, b & 0x0F], dtype=np.uint8)
            out[y, x : x + a] = np.resize(pair, a)
            x += a
        elif b == 0:  # end of line
            x, y = 0, y + 1
        elif b == 1:  # end of bitmap
            return out
        elif b == 2:  # delta
            if i + 2 > len(data):
                raise ValueError("BMP RLE4 delta escape truncated")
            x += data[i]
            y += data[i + 1]
            i += 2
            if x > w or y > h:
                raise ValueError("BMP RLE4 delta escape overflows bitmap bounds")
        else:  # literal run of b nibbles, word-aligned
            if y >= h or x + b > w:
                raise ValueError("BMP RLE4 literal run overflows bitmap bounds")
            nbytes = (b + 1) // 2
            adv = nbytes + (nbytes & 1)
            if i + adv > len(data):
                raise ValueError("BMP RLE4 literal run truncated")
            byts = np.frombuffer(data[i : i + nbytes], dtype=np.uint8)
            nibs = np.empty(nbytes * 2, dtype=np.uint8)
            nibs[0::2] = byts >> 4
            nibs[1::2] = byts & 0x0F
            out[y, x : x + b] = nibs[:b]
            x += b
            i += adv
    return out


def _rle8_decode(data: bytes, h: int, w: int) -> np.ndarray:
    out = np.zeros((h, w), dtype=np.uint8)
    x = y = 0
    i = 0
    while i + 1 < len(data):
        a, b = data[i], data[i + 1]
        i += 2
        if a:  # run of b
            if y >= h or x + a > w:
                raise ValueError("BMP RLE8 run overflows bitmap bounds")
            out[y, x : x + a] = b
            x += a
        elif b == 0:  # end of line
            x, y = 0, y + 1
        elif b == 1:  # end of bitmap
            return out
        elif b == 2:  # delta
            if i + 2 > len(data):
                raise ValueError("BMP RLE8 delta escape truncated")
            x += data[i]
            y += data[i + 1]
            i += 2
            if x > w or y > h:
                raise ValueError("BMP RLE8 delta escape overflows bitmap bounds")
        else:  # literal run of b pixels, word-aligned
            if y >= h or x + b > w:
                raise ValueError("BMP RLE8 literal run overflows bitmap bounds")
            if i + b > len(data):
                raise ValueError("BMP RLE8 literal run truncated")
            out[y, x : x + b] = np.frombuffer(data[i : i + b], dtype=np.uint8)
            x += b
            i += b + (b & 1)
    return out


@loud_decode("BMP")
def decode_bmp(data: bytes) -> np.ndarray:
    """BMP bytes → (H,W,3) uint8 RGB (palettes resolved; the media
    seam converts to grey downstream)."""
    if data[:2] != BMP_MAGIC:
        raise ValueError("not a BMP (missing BM magic)")
    (pix_off,) = struct.unpack("<I", data[10:14])
    (info_size,) = struct.unpack("<I", data[14:18])
    core = info_size == 12  # OS/2 BITMAPCOREHEADER (BMP 1.x crawls)
    if core:
        # uint16 dims, no compression field (always BI_RGB), and the
        # palette is packed 3-byte BGR triples instead of BGR0 quads
        w, h_signed, _planes, bpp = struct.unpack("<HhHH", data[18:26])
        comp, ncolors = 0, 0
    elif info_size < 40:
        raise NotImplementedError(f"BMP info header size {info_size} not supported")
    else:
        w, h_signed, _planes, bpp, comp = struct.unpack("<iiHHI", data[18:34])
        (ncolors,) = struct.unpack("<I", data[46:50])
    top_down = h_signed < 0
    h = abs(h_signed)
    if w <= 0 or h == 0:
        raise ValueError("empty BMP")
    if comp in (4, 5):
        raise NotImplementedError(
            "BMP with embedded JPEG/PNG stream (BI_JPEG/BI_PNG) not supported here"
        )
    if comp not in (0, 1, 2, 3, 6):
        raise NotImplementedError(f"BMP compression {comp} not supported here")
    if comp == 1 and bpp != 8:
        raise NotImplementedError("RLE is only supported for 8-bit BMPs (RLE8)")
    if comp == 2 and bpp != 4:
        raise ValueError("BMP RLE4 compression requires a 4-bit image")
    if comp in (3, 6) and bpp not in (16, 32):
        raise NotImplementedError(
            f"BI_BITFIELDS on {bpp}-bit BMPs not supported (16/32-bit only)"
        )
    pal = None
    if bpp <= 8:
        n = ncolors or (1 << bpp)
        pal_at = 14 + info_size
        entry = 3 if core else 4
        quads = np.frombuffer(data[pal_at : pal_at + entry * n], dtype=np.uint8)
        if quads.size < entry * n:
            raise ValueError("BMP palette truncated")
        pal = quads.reshape(-1, entry)[:, 2::-1]  # BGR(0) → RGB
    if comp in (1, 2):
        idx = (_rle8_decode if comp == 1 else _rle4_decode)(data[pix_off:], h, w)
        rows = idx if top_down else idx[::-1]
        if int(rows.max(initial=0)) >= len(pal):
            raise ValueError("BMP palette index out of range")
        return np.ascontiguousarray(pal[rows])
    rowbytes = (w * bpp + 7) // 8
    stride = rowbytes + ((-rowbytes) % 4)
    need = h * stride
    raw = np.frombuffer(data[pix_off : pix_off + need], dtype=np.uint8)
    if raw.size < need:
        raise ValueError("BMP pixel data truncated")
    rows = raw.reshape(h, stride)[:, :rowbytes]
    if not top_down:
        rows = rows[::-1]
    if bpp == 24:
        return np.ascontiguousarray(rows.reshape(h, rowbytes // 3 * 3)[:, : w * 3].reshape(h, w, 3)[:, :, ::-1])
    if bpp in (16, 32) and (comp in (3, 6) or bpp == 16):
        # explicit BI_BITFIELDS masks live right after the 40-byte info
        # header (and at the very same file offsets inside V4/V5
        # headers); BI_ALPHABITFIELDS (6, the CE variant) adds a fourth
        # alpha mask we skip — BMP alpha is ignored throughout this
        # decoder; 16-bpp without masks is implied RGB555
        if comp in (3, 6):
            if len(data) < (70 if comp == 6 else 66):
                raise ValueError("BMP bitfield masks truncated")
            masks = struct.unpack("<III", data[54:66])
        else:
            masks = (0x7C00, 0x03E0, 0x001F)
        word = np.dtype("<u2") if bpp == 16 else np.dtype("<u4")
        nbytes = w * (bpp // 8)
        words = (
            np.ascontiguousarray(rows[:, :nbytes]).view(word).reshape(h, w)
        ).astype(np.uint32)
        return np.ascontiguousarray(_bitfield_channels(words, masks))
    if bpp == 32:
        return np.ascontiguousarray(rows.reshape(h, w, 4)[:, :, 2::-1])
    if bpp == 8:
        idx = rows[:, :w]
    elif bpp == 4:
        nib = np.zeros((h, rowbytes * 2), dtype=np.uint8)
        nib[:, 0::2] = rows >> 4
        nib[:, 1::2] = rows & 0x0F
        idx = nib[:, :w]
    elif bpp == 1:
        idx = np.unpackbits(rows, axis=1)[:, :w]
    else:
        raise NotImplementedError(f"BMP bit depth {bpp} not supported here")
    if int(idx.max(initial=0)) >= len(pal):
        raise ValueError("BMP palette index out of range")
    return np.ascontiguousarray(pal[idx])
