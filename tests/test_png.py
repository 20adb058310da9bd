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
    # flip IHDR bit depth 8 -> 16: depth 16 now DECODES, but this
    # stream only carries 8-bit scanlines — must fail loudly
    data[24] = 16
    with pytest.raises(ValueError, match="truncated"):
        decode_png(bytes(data))
    data[24] = 3  # not a legal PNG depth at all
    with pytest.raises(ValueError, match="illegal PNG depth"):
        decode_png(bytes(data))


def test_encode_rejects_bad_inputs():
    with pytest.raises(ValueError, match="uint8"):
        encode_png(np.zeros((4, 4), dtype=np.float32))
    with pytest.raises(ValueError, match=r"expects \(H,W\)"):
        encode_png(np.zeros((4, 4, 4), dtype=np.uint8))


# ---------------------------------------------------------------------------
# extended decoder subformats (palette / sub-byte / 16-bit / alpha / Adam7)
# ---------------------------------------------------------------------------

import struct
import zlib

from oar_ocr_spark.functions.png import _ADAM7


def _chunk(ctype, data):
    return struct.pack(">I", len(data)) + ctype + data + struct.pack(
        ">I", zlib.crc32(ctype + data) & 0xFFFFFFFF
    )


def _pack_row(samples, depth):
    if depth == 8:
        return samples.astype(np.uint8).tobytes()
    if depth == 16:
        return samples.astype(">u2").tobytes()
    bits = np.zeros(len(samples) * depth, dtype=np.uint8)
    for i, v in enumerate(samples):
        for b in range(depth):
            bits[i * depth + b] = (int(v) >> (depth - 1 - b)) & 1
    return np.packbits(bits).tobytes()


def _build_png(arr, color_type, depth, interlace=0, plte=None, trns=None):
    """Test-side encoder for subformats the engine's writer never emits
    (filter 0 rows; Adam7 pass split mirrors the spec grid)."""
    h, w, _channels = arr.shape
    out = bytearray(PNG_SIGNATURE)
    out += _chunk(
        b"IHDR", struct.pack(">IIBBBBB", w, h, depth, color_type, 0, 0, interlace)
    )
    if plte is not None:
        out += _chunk(b"PLTE", plte.astype(np.uint8).tobytes())
    if trns is not None:
        out += _chunk(b"tRNS", bytes(trns))
    raw = bytearray()
    if interlace == 0:
        for y in range(h):
            raw += b"\x00" + _pack_row(arr[y].reshape(-1), depth)
    else:
        for xoff, yoff, xstep, ystep in _ADAM7:
            sub = arr[yoff::ystep, xoff::xstep, :]
            if sub.shape[0] == 0 or sub.shape[1] == 0:
                continue
            for y in range(sub.shape[0]):
                raw += b"\x00" + _pack_row(sub[y].reshape(-1), depth)
    out += _chunk(b"IDAT", zlib.compress(bytes(raw)))
    out += _chunk(b"IEND", b"")
    return bytes(out)


class TestExtendedSubformats:
    rng = np.random.default_rng(3)

    def test_1bit_grey_scales_to_bw(self):
        g1 = self.rng.integers(0, 2, (9, 13, 1))
        got = decode_png(_build_png(g1, 0, 1))
        assert got.shape == (9, 13) and got.dtype == np.uint8
        assert (got == g1[..., 0] * 255).all()

    def test_2_and_4_bit_grey_scale_exactly(self):
        for d in (2, 4):
            gg = self.rng.integers(0, 1 << d, (5, 7, 1))
            got = decode_png(_build_png(gg, 0, d))
            assert (got == gg[..., 0] * (255 // ((1 << d) - 1))).all()

    def test_16bit_takes_high_byte(self):
        g16 = self.rng.integers(0, 65536, (6, 5, 1))
        assert (decode_png(_build_png(g16, 0, 16)) == (g16[..., 0] >> 8)).all()
        c16 = self.rng.integers(0, 65536, (4, 3, 3))
        assert (decode_png(_build_png(c16, 2, 16)) == (c16 >> 8)).all()

    def test_palette_resolves_through_plte(self):
        plte = self.rng.integers(0, 256, (16, 3))
        pi = self.rng.integers(0, 16, (8, 6, 1))
        got = decode_png(_build_png(pi, 3, 8, plte=plte))
        assert (got == plte[pi[..., 0]]).all()
        # 4-bit palette indices
        pi4 = self.rng.integers(0, 8, (5, 9, 1))
        got4 = decode_png(_build_png(pi4, 3, 4, plte=plte[:8]))
        assert (got4 == plte[:8][pi4[..., 0]]).all()

    def test_palette_trns_composites_over_white(self):
        plte = self.rng.integers(0, 256, (8, 3))
        pi4 = self.rng.integers(0, 8, (5, 9, 1))
        trns = [0, 255, 128] + [255] * 5
        got = decode_png(_build_png(pi4, 3, 4, plte=plte, trns=trns))
        a = np.array(trns, dtype=np.uint16)[pi4[..., 0]][..., None]
        want = (
            (plte[pi4[..., 0]].astype(np.uint16) * a + 255 * (255 - a) + 127) // 255
        ).astype(np.uint8)
        assert (got == want).all()

    def test_alpha_channels_composite_over_white(self):
        ga = self.rng.integers(0, 256, (7, 4, 2))
        got = decode_png(_build_png(ga, 4, 8))
        want = (
            (ga[..., 0].astype(np.uint16) * ga[..., 1] + 255 * (255 - ga[..., 1]) + 127)
            // 255
        ).astype(np.uint8)
        assert got.shape == (7, 4) and (got == want).all()
        rgba = self.rng.integers(0, 256, (6, 6, 4))
        got = decode_png(_build_png(rgba, 6, 8))
        a = rgba[..., 3:4].astype(np.uint16)
        want = ((rgba[..., :3].astype(np.uint16) * a + 255 * (255 - a) + 127) // 255).astype(
            np.uint8
        )
        assert got.shape == (6, 6, 3) and (got == want).all()

    def test_adam7_equals_progressive_less(self):
        # 11x10 — not multiples of 8, so several passes are partial
        for ct, d, ch in [(0, 8, 1), (2, 8, 3), (0, 1, 1), (0, 16, 1), (6, 8, 4)]:
            arr = self.rng.integers(0, 1 << d, (11, 10, ch))
            want = decode_png(_build_png(arr, ct, d, interlace=0))
            got = decode_png(_build_png(arr, ct, d, interlace=1))
            assert (got == want).all(), f"adam7 ct={ct} d={d}"

    def test_adam7_palette(self):
        plte = self.rng.integers(0, 256, (16, 3))
        pi = self.rng.integers(0, 16, (11, 10, 1))
        got = decode_png(_build_png(pi, 3, 8, interlace=1, plte=plte))
        assert (got == plte[pi[..., 0]]).all()

    def test_adam7_tiny_images_skip_empty_passes(self):
        one = np.array([[[200]]])
        assert decode_png(_build_png(one, 0, 8, interlace=1))[0, 0] == 200
        row = np.arange(8).reshape(1, 8, 1) * 30
        assert (decode_png(_build_png(row, 0, 8, interlace=1)) == row[..., 0]).all()

    def test_16bit_filtered_rows_use_two_byte_bpp(self):
        # Sub/Paeth filters predict at byte distance bpp=2 for 16-bit
        # grey — regression pin for the _unfilter_bytes generalization
        g16 = self.rng.integers(0, 65536, (12, 7, 1))
        data = bytearray(_build_png(g16, 0, 16))
        # re-filter rows with Sub(1): locate the IDAT, rebuild with ft=1
        raw = bytearray()
        rows = [np.frombuffer(_pack_row(g16[y].reshape(-1), 16), dtype=np.uint8).astype(int) for y in range(12)]
        for cur in rows:
            line = cur.copy()
            for x in range(len(cur) - 1, 1, -1):
                line[x] = (cur[x] - cur[x - 2]) & 0xFF
            raw += b"\x01" + bytes(np.asarray(line, dtype=np.uint8))
        out = bytearray(PNG_SIGNATURE)
        out += _chunk(b"IHDR", struct.pack(">IIBBBBB", 7, 12, 16, 0, 0, 0, 0))
        out += _chunk(b"IDAT", zlib.compress(bytes(raw)))
        out += _chunk(b"IEND", b"")
        assert (decode_png(bytes(out)) == (g16[..., 0] >> 8)).all()

    def test_trns_on_grey_and_rgb_goes_white(self):
        # color-keyed transparency (spec 13.6): the tRNS sample value
        # is fully transparent → white under the composite convention
        g = np.array([[0, 7, 255], [7, 1, 7]]).reshape(2, 3, 1)
        got = decode_png(_build_png(g, 0, 8, trns=struct.pack(">H", 7)))
        assert got.tolist() == [[0, 255, 255], [255, 1, 255]]
        # 16-bit grey: match at NATIVE depth, not the downconverted one
        g16 = np.array([[0x1234, 0x1299]]).reshape(1, 2, 1)
        got = decode_png(_build_png(g16, 0, 16, trns=struct.pack(">H", 0x1234)))
        assert got.tolist() == [[255, 0x12]]
        # RGB: all three channels must match
        c = np.array([[[9, 8, 7], [9, 8, 6], [1, 2, 3]]])
        got = decode_png(_build_png(c, 2, 8, trns=struct.pack(">HHH", 9, 8, 7)))
        assert got[0].tolist() == [[255, 255, 255], [9, 8, 6], [1, 2, 3]]

    def test_trns_out_of_range_value_matches_nothing_at_depth8(self):
        # a 16-bit tRNS sample > 255 cannot match any depth-8 pixel —
        # it must NOT wrap mod 256 and whiten legitimate pixels
        c = np.array([[[7, 8, 7], [1, 2, 3]]])
        got = decode_png(_build_png(c, 2, 8, trns=struct.pack(">HHH", 0x107, 8, 7)))
        assert got[0].tolist() == [[7, 8, 7], [1, 2, 3]]

    def test_malformed_odd_length_trns_is_ignored(self):
        g = np.array([[[5, 9]]]).reshape(1, 2, 1)
        got = decode_png(_build_png(g, 0, 8, trns=b"\x05"))  # 1 byte: junk
        assert got.tolist() == [[5, 9]]
        # 3-byte chunk: the truncating slice keeps the first sample —
        # (0,5) matches pixel 5 → white — and must not crash frombuffer
        got = decode_png(_build_png(g, 0, 8, trns=b"\x00\x05\x99"))
        assert got.tolist() == [[255, 9]]

    def test_palette_missing_plte_and_bad_index(self):
        pi = np.zeros((2, 2, 1), dtype=int)
        data = _build_png(pi, 3, 8, plte=None)
        with pytest.raises(ValueError, match="missing PLTE"):
            decode_png(data)
        pi9 = np.full((2, 2, 1), 9)
        plte = np.zeros((4, 3))
        with pytest.raises(ValueError, match="palette index"):
            decode_png(_build_png(pi9, 3, 8, plte=plte))
