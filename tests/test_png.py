"""PNG codec: lossless roundtrip of the deterministic renderer's pages
(the real-format media seam — utils/image.rs:65-88 parity)."""

import numpy as np
import pytest

from oar_ocr_spark.fixtures.render import render_page
from oar_ocr_spark.functions.png import PNG_SIGNATURE, decode_png, encode_png


def test_roundtrip_grayscale_pages():
    for ref in ["12_m0", "rot:7_m1", "warp:3_m2", "99_m5"]:
        img = render_page(ref)
        data = encode_png(img)
        assert data[:8] == PNG_SIGNATURE
        out = decode_png(data)
        assert out.dtype == np.uint8 and out.shape == img.shape
        np.testing.assert_array_equal(out, img)


def test_roundtrip_rgb():
    rng = np.random.default_rng(42)
    img = rng.integers(0, 256, size=(37, 53, 3), dtype=np.uint8)
    np.testing.assert_array_equal(decode_png(encode_png(img)), img)


def test_roundtrip_random_grayscale_sizes():
    rng = np.random.default_rng(7)
    for h, w in [(1, 1), (1, 64), (64, 1), (17, 33)]:
        img = rng.integers(0, 256, size=(h, w), dtype=np.uint8)
        np.testing.assert_array_equal(decode_png(encode_png(img)), img)


def _filtered_png(img: np.ndarray, ftypes: list[int]) -> bytes:
    """Build a PNG whose rows use the given filter types (external-
    encoder simulation: our encoder always writes filter 0, but the
    decoder must reverse all five)."""
    import struct
    import zlib

    from oar_ocr_spark.functions.png import _chunk

    h, w = img.shape
    bpp = 1
    rows = []
    prev = np.zeros(w, dtype=np.int32)
    for y in range(h):
        cur = img[y].astype(np.int32)
        ft = ftypes[y % len(ftypes)]
        if ft == 0:
            enc = cur.copy()
        elif ft == 1:  # Sub
            enc = cur.copy()
            enc[bpp:] = (cur[bpp:] - cur[:-bpp]) & 0xFF
        elif ft == 2:  # Up
            enc = (cur - prev) & 0xFF
        elif ft == 3:  # Average
            enc = cur.copy()
            for x in range(w):
                left = cur[x - bpp] if x >= bpp else 0
                enc[x] = (cur[x] - ((left + prev[x]) >> 1)) & 0xFF
        elif ft == 4:  # Paeth
            enc = cur.copy()
            for x in range(w):
                a = cur[x - bpp] if x >= bpp else 0
                b = prev[x]
                c = prev[x - bpp] if x >= bpp else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                enc[x] = (cur[x] - pred) & 0xFF
        rows.append(bytes([ft]) + enc.astype(np.uint8).tobytes())
        prev = cur
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)
    return (
        PNG_SIGNATURE
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(b"".join(rows)))
        + _chunk(b"IEND", b"")
    )


def test_decode_all_filter_types():
    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, size=(25, 40), dtype=np.uint8)
    for ftypes in ([1], [2], [3], [4], [0, 1, 2, 3, 4]):
        np.testing.assert_array_equal(decode_png(_filtered_png(img, ftypes)), img)


def test_decode_rejects_bad_inputs():
    with pytest.raises(ValueError, match="signature"):
        decode_png(b"JFIF" + b"\x00" * 64)
    img = np.zeros((4, 4), dtype=np.uint8)
    data = bytearray(encode_png(img))
    # flip IHDR bit depth 8 -> 16 (offset: 8 sig + 8 len/type + 8 w/h)
    data[24] = 16
    with pytest.raises(NotImplementedError, match="depth=16"):
        decode_png(bytes(data))


def test_encode_rejects_bad_inputs():
    with pytest.raises(ValueError, match="uint8"):
        encode_png(np.zeros((4, 4), dtype=np.float32))
    with pytest.raises(ValueError, match=r"expects \(H,W\)"):
        encode_png(np.zeros((4, 4, 4), dtype=np.uint8))
