"""BMP codec (functions/bmp.py): legacy-dump bitmaps — truecolor,
palettes down to 1-bit, RLE8, both row orders, 4-byte padding."""

import struct

import numpy as np
import pytest

from oar_ocr_spark.functions.bmp import decode_bmp, encode_bmp


def _rng():
    return np.random.default_rng(3)


class TestRoundtrip:
    def test_24bit_truecolor_with_padding(self):
        rng = _rng()
        for h, w in [(5, 7), (3, 4), (1, 1), (9, 6)]:  # odd widths pad
            img = rng.integers(0, 256, (h, w, 3)).astype(np.uint8)
            assert (decode_bmp(encode_bmp(img)) == img).all(), (h, w)

    def test_8bit_paletted_and_rle8(self):
        rng = _rng()
        pal = rng.integers(0, 256, (16, 3)).astype(np.uint8)
        idx = rng.integers(0, 16, (11, 13)).astype(np.uint8)
        assert (decode_bmp(encode_bmp(idx, pal)) == pal[idx]).all()
        assert (decode_bmp(encode_bmp(idx, pal, rle=True)) == pal[idx]).all()
        # long runs compress into multiple run records
        runs = np.repeat(rng.integers(0, 4, 7), 60)[: 13 * 11].reshape(11, 13).astype(np.uint8)
        assert (decode_bmp(encode_bmp(runs, pal, rle=True)) == pal[runs]).all()

    def test_deterministic(self):
        img = _rng().integers(0, 256, (4, 4, 3)).astype(np.uint8)
        assert encode_bmp(img) == encode_bmp(img)


class TestForeignLayouts:
    def test_top_down_negative_height(self):
        img = _rng().integers(0, 256, (4, 5, 3)).astype(np.uint8)
        data = bytearray(encode_bmp(img))
        # flip to top-down: negate height and reverse the stored rows
        (h,) = struct.unpack("<i", data[22:26])
        data[22:26] = struct.pack("<i", -h)
        (off,) = struct.unpack("<I", data[10:14])
        stride = (5 * 3 + 3) // 4 * 4
        rows = [bytes(data[off + y * stride : off + (y + 1) * stride]) for y in range(4)]
        data[off:] = b"".join(reversed(rows))
        assert (decode_bmp(bytes(data)) == img).all()

    def test_4bit_and_1bit_palette(self):
        # hand-built sub-byte paletted files
        pal4 = _rng().integers(0, 256, (16, 3)).astype(np.uint8)
        idx = _rng().integers(0, 16, (3, 5)).astype(np.uint8)
        rows = []
        for y in range(2, -1, -1):  # bottom-up
            nib = bytearray()
            r = idx[y]
            for i in range(0, 5, 2):
                hi = r[i] << 4
                lo = r[i + 1] if i + 1 < 5 else 0
                nib.append(hi | lo)
            rows.append(bytes(nib).ljust(4, b"\x00"))
        body = b"".join(rows)
        pal_bytes = np.hstack([pal4[:, ::-1], np.zeros((16, 1), np.uint8)]).tobytes()
        off = 14 + 40 + len(pal_bytes)
        info = struct.pack("<IiiHHIIiiII", 40, 5, 3, 1, 4, 0, len(body), 0, 0, 16, 0)
        data = b"BM" + struct.pack("<IHHI", off + len(body), 0, 0, off) + info + pal_bytes + body
        assert (decode_bmp(data) == pal4[idx]).all()
        # 1-bit bilevel
        pal1 = np.array([[255, 255, 255], [0, 0, 0]], np.uint8)
        bits = _rng().integers(0, 2, (2, 10)).astype(np.uint8)
        rows = []
        for y in (1, 0):
            packed = np.packbits(bits[y]).tobytes()
            rows.append(packed.ljust(4, b"\x00"))
        body = b"".join(rows)
        pal_bytes = np.hstack([pal1[:, ::-1], np.zeros((2, 1), np.uint8)]).tobytes()
        off = 14 + 40 + len(pal_bytes)
        info = struct.pack("<IiiHHIIiiII", 40, 10, 2, 1, 1, 0, len(body), 0, 0, 2, 0)
        data = b"BM" + struct.pack("<IHHI", off + len(body), 0, 0, off) + info + pal_bytes + body
        assert (decode_bmp(data) == pal1[bits]).all()

    def test_32bit_drops_alpha(self):
        img = _rng().integers(0, 256, (2, 3, 3)).astype(np.uint8)
        # hand-build BGRA bottom-up
        body = b"".join(
            bytes(np.hstack([img[y, :, ::-1], np.full((3, 1), 77, np.uint8)]).tobytes())
            for y in (1, 0)
        )
        info = struct.pack("<IiiHHIIiiII", 40, 3, 2, 1, 32, 0, len(body), 0, 0, 0, 0)
        data = b"BM" + struct.pack("<IHHI", 54 + len(body), 0, 0, 54) + info + body
        assert (decode_bmp(data) == img).all()

    def test_declared_unsupported(self):
        img = _rng().integers(0, 256, (2, 2, 3)).astype(np.uint8)
        data = bytearray(encode_bmp(img))
        data[30:34] = struct.pack("<I", 11)  # BI_CMYK (printer DDB only)
        with pytest.raises(NotImplementedError, match="compression 11"):
            decode_bmp(bytes(data))
        for comp in (3, 6):  # (ALPHA)BITFIELDS need 16/32 bpp
            data[30:34] = struct.pack("<I", comp)
            with pytest.raises(NotImplementedError, match="BI_BITFIELDS"):
                decode_bmp(bytes(data))
        with pytest.raises(ValueError, match="magic"):
            decode_bmp(b"PNG" + bytes(60))


def _rle8_bmp(body: bytes, w: int = 4, h: int = 3) -> bytes:
    """Hand-built 8-bit RLE8 BMP with an identity palette and an
    arbitrary (possibly corrupt) RLE stream — for foreign-input tests."""
    pal = np.zeros((256, 4), np.uint8)
    pal[:, 0] = pal[:, 1] = pal[:, 2] = np.arange(256)
    pal_bytes = pal.tobytes()
    off = 14 + 40 + len(pal_bytes)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 8, 1, len(body), 0, 0, 256, 0)
    return b"BM" + struct.pack("<IHHI", off + len(body), 0, 0, off) + info + pal_bytes + body


class TestCorruptRLE8:
    # foreign/corrupt RLE streams must fail loudly (the module's
    # declared ValueError convention), never IndexError or silent clip
    def test_run_overflows_row(self):
        with pytest.raises(ValueError, match="run overflows"):
            decode_bmp(_rle8_bmp(bytes([8, 7]) + b"\x00\x01", w=4))

    def test_run_past_last_row(self):
        # three EOLs walk y to h, then a run on the nonexistent row
        body = b"\x00\x00" * 3 + bytes([2, 9]) + b"\x00\x01"
        with pytest.raises(ValueError, match="run overflows"):
            decode_bmp(_rle8_bmp(body, h=3))

    def test_truncated_delta(self):
        with pytest.raises(ValueError, match="delta escape truncated"):
            decode_bmp(_rle8_bmp(b"\x00\x02"))

    def test_delta_overflow(self):
        with pytest.raises(ValueError, match="delta escape overflows"):
            decode_bmp(_rle8_bmp(b"\x00\x02\x00\x09", h=3))

    def test_truncated_literal(self):
        with pytest.raises(ValueError, match="literal run truncated"):
            decode_bmp(_rle8_bmp(b"\x00\x04\x01\x02"))

    def test_literal_overflow(self):
        body = b"\x00\x06" + bytes(range(6)) + b"\x00\x01"
        with pytest.raises(ValueError, match="literal run overflows"):
            decode_bmp(_rle8_bmp(body, w=4))

    def test_valid_delta_still_decodes(self):
        # delta (2,1) then a run: pixels land where the escape points
        body = bytes([1, 5]) + b"\x00\x02\x02\x01" + bytes([2, 9]) + b"\x00\x01"
        out = decode_bmp(_rle8_bmp(body, w=6, h=3))
        assert out[2, 0, 0] == 5  # bottom-up: y=0 is the last row
        assert out[1, 3, 0] == 9 and out[1, 4, 0] == 9


class TestMediaSeam:
    def test_bmp_payload_greyscales_at_seam(self):
        from oar_ocr_spark.functions.multimodal import _decode_payload

        img = _rng().integers(0, 256, (6, 8, 3)).astype(np.uint8)
        out = _decode_payload("x", "image", encode_bmp(img))
        assert out.ndim == 2 and out.shape == (6, 8)

    def test_bitfields_encoder_roundtrip(self):
        # the gate-store flavor: 32-bit BI_BITFIELDS, byte-aligned
        # masks — lossless by construction
        img = _rng().integers(0, 256, (5, 7, 3)).astype(np.uint8)
        data = encode_bmp(img, bitfields=True)
        (comp,) = struct.unpack("<I", data[30:34])
        assert comp == 3
        assert (decode_bmp(data) == img).all()

    def test_bitfields_grey_page_lossless_at_seam(self):
        # equal RGB channels → BT.601 luma is the channel value exactly
        from oar_ocr_spark.functions.multimodal import _decode_payload

        grey = _rng().integers(0, 256, (6, 8)).astype(np.uint8)
        rgb = np.repeat(grey[:, :, None], 3, axis=2)
        out = _decode_payload("x", "image", encode_bmp(rgb, bitfields=True))
        assert (out == grey).all()

    def test_bitfields_encoder_rejects_palette_input(self):
        grey = _rng().integers(0, 256, (4, 4)).astype(np.uint8)
        with pytest.raises(ValueError, match="bitfields"):
            encode_bmp(grey, bitfields=True)


def _bmp16(pix: "np.ndarray", comp: int = 0, masks: tuple | None = None) -> bytes:
    """Hand-built 16-bpp BMP: `pix` is (H,W) uint16 raw pixel words,
    stored bottom-up with 4-byte row padding. comp=3 writes the three
    BI_BITFIELDS masks after the 40-byte header."""
    h, w = pix.shape
    mask_bytes = b"" if masks is None else struct.pack("<%dI" % len(masks), *masks)
    off = 14 + 40 + len(mask_bytes)
    rows = []
    for y in range(h - 1, -1, -1):
        rb = pix[y].astype("<u2").tobytes()
        rows.append(rb + b"\x00" * ((-len(rb)) % 4))
    body = b"".join(rows)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 16, comp, len(body), 0, 0, 0, 0)
    return b"BM" + struct.pack("<IHHI", off + len(body), 0, 0, off) + info + mask_bytes + body


class TestBitfields:
    """16/32-bpp truecolor: implied RGB555 and explicit BI_BITFIELDS."""

    def test_16bit_default_rgb555(self):
        rng = _rng()
        r5 = rng.integers(0, 32, (3, 5)).astype(np.uint16)
        g5 = rng.integers(0, 32, (3, 5)).astype(np.uint16)
        b5 = rng.integers(0, 32, (3, 5)).astype(np.uint16)
        pix = (r5 << 10) | (g5 << 5) | b5
        got = decode_bmp(_bmp16(pix))
        want = np.stack([(c * 255 // 31).astype(np.uint8) for c in (r5, g5, b5)], axis=-1)
        assert (got == want).all()

    def test_16bit_bitfields_rgb565(self):
        rng = _rng()
        r5 = rng.integers(0, 32, (4, 3)).astype(np.uint16)
        g6 = rng.integers(0, 64, (4, 3)).astype(np.uint16)
        b5 = rng.integers(0, 32, (4, 3)).astype(np.uint16)
        pix = (r5 << 11) | (g6 << 5) | b5
        got = decode_bmp(_bmp16(pix, comp=3, masks=(0xF800, 0x07E0, 0x001F)))
        want = np.stack(
            [
                (r5 * 255 // 31).astype(np.uint8),
                (g6 * 255 // 63).astype(np.uint8),
                (b5 * 255 // 31).astype(np.uint8),
            ],
            axis=-1,
        )
        assert (got == want).all()

    def test_32bit_bitfields_nonstandard_order(self):
        # ABGR-style masks: R in the low byte
        img = _rng().integers(0, 256, (2, 3, 3)).astype(np.uint8)
        words = (
            img[:, :, 0].astype(np.uint32)
            | (img[:, :, 1].astype(np.uint32) << 8)
            | (img[:, :, 2].astype(np.uint32) << 16)
        )
        body = b"".join(words[y].astype("<u4").tobytes() for y in (1, 0))
        masks = struct.pack("<III", 0x0000FF, 0x00FF00, 0xFF0000)
        off = 14 + 40 + len(masks)
        info = struct.pack("<IiiHHIIiiII", 40, 3, 2, 1, 32, 3, len(body), 0, 0, 0, 0)
        data = b"BM" + struct.pack("<IHHI", off + len(body), 0, 0, off) + info + masks + body
        assert (decode_bmp(data) == img).all()

    def test_16bit_alphabitfields_argb4444(self):
        # BI_ALPHABITFIELDS (comp 6): four masks, alpha ignored
        rng = _rng()
        r4 = rng.integers(0, 16, (3, 4)).astype(np.uint16)
        g4 = rng.integers(0, 16, (3, 4)).astype(np.uint16)
        b4 = rng.integers(0, 16, (3, 4)).astype(np.uint16)
        a4 = rng.integers(0, 16, (3, 4)).astype(np.uint16)
        pix = (a4 << 12) | (r4 << 8) | (g4 << 4) | b4
        got = decode_bmp(
            _bmp16(pix, comp=6, masks=(0x0F00, 0x00F0, 0x000F, 0xF000))
        )
        want = np.stack(
            [(c * 255 // 15).astype(np.uint8) for c in (r4, g4, b4)], axis=-1
        )
        assert (got == want).all()

    def test_alphabitfields_truncated_fails_loudly(self):
        pix = np.zeros((2, 2), np.uint16)
        data = _bmp16(pix, comp=6, masks=(0x0F00, 0x00F0, 0x000F, 0xF000))
        # file cut inside the mask block: no pixel bytes survive either,
        # so the loud failure is one of the two truncation guards
        with pytest.raises(ValueError, match="truncated"):
            decode_bmp(data[:68])

    def test_empty_mask_fails_loudly(self):
        pix = np.zeros((2, 2), np.uint16)
        with pytest.raises(ValueError, match="bitfield mask"):
            decode_bmp(_bmp16(pix, comp=3, masks=(0xF800, 0x0000, 0x001F)))

    def test_bitfields_on_8bit_fails_loudly(self):
        img = _rng().integers(0, 16, (2, 2)).astype(np.uint8)
        pal = _rng().integers(0, 256, (16, 3)).astype(np.uint8)
        data = bytearray(encode_bmp(img, pal))
        data[30:34] = struct.pack("<I", 3)
        with pytest.raises(NotImplementedError, match="BI_BITFIELDS"):
            decode_bmp(bytes(data))


def _rle4_bmp(body: bytes, w: int = 6, h: int = 3, ncolors: int = 16) -> bytes:
    pal = np.zeros((ncolors, 4), np.uint8)
    pal[:, 0] = pal[:, 1] = pal[:, 2] = np.arange(ncolors) * 17
    pal_bytes = pal.tobytes()
    off = 14 + 40 + len(pal_bytes)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 4, 2, len(body), 0, 0, ncolors, 0)
    return b"BM" + struct.pack("<IHHI", off + len(body), 0, 0, off) + info + pal_bytes + body


class TestRLE4:
    """4-bit RLE: runs alternate the two nibbles of the value byte;
    literals pack nibbles, word-aligned."""

    def test_runs_alternate_nibbles(self):
        # run of 5 pixels of 0xA7 → A 7 A 7 A on the bottom row
        body = bytes([5, 0xA7]) + b"\x00\x00" + b"\x00\x01"
        out = decode_bmp(_rle4_bmp(body, w=6, h=2))
        grey = out[1, :, 0]  # bottom-up: last row is y=0 of the stream
        assert list(grey[:5]) == [0xA * 17, 0x7 * 17, 0xA * 17, 0x7 * 17, 0xA * 17]

    def test_literal_run_and_padding(self):
        # literal of 5 nibbles (3 bytes data + 1 pad byte), then EOL/EOF
        body = bytes([0, 5, 0x12, 0x34, 0x50, 0x00]) + b"\x00\x00" + b"\x00\x01"
        out = decode_bmp(_rle4_bmp(body, w=6, h=2))
        assert list(out[1, :5, 0]) == [1 * 17, 2 * 17, 3 * 17, 4 * 17, 5 * 17]

    def test_delta_and_bounds(self):
        body = bytes([2, 0x33]) + b"\x00\x02\x01\x01" + bytes([2, 0x55]) + b"\x00\x01"
        out = decode_bmp(_rle4_bmp(body, w=6, h=3))
        assert out[2, 0, 0] == 0x3 * 17 and out[2, 1, 0] == 0x3 * 17
        assert out[1, 3, 0] == 0x5 * 17 and out[1, 4, 0] == 0x5 * 17

    def test_corrupt_streams_fail_loudly(self):
        with pytest.raises(ValueError, match="run overflows"):
            decode_bmp(_rle4_bmp(bytes([9, 0x11]) + b"\x00\x01", w=6))
        with pytest.raises(ValueError, match="literal run truncated"):
            decode_bmp(_rle4_bmp(bytes([0, 6, 0x12])))
        with pytest.raises(ValueError, match="delta escape overflows"):
            decode_bmp(_rle4_bmp(b"\x00\x02\x00\x09", h=3))

    def test_rle4_on_8bit_fails_loudly(self):
        img = _rng().integers(0, 16, (2, 2)).astype(np.uint8)
        pal = _rng().integers(0, 256, (16, 3)).astype(np.uint8)
        data = bytearray(encode_bmp(img, pal))
        data[30:34] = struct.pack("<I", 2)  # RLE4 on an 8-bit image
        with pytest.raises(ValueError, match="RLE4"):
            decode_bmp(bytes(data))


class TestEmbeddedCodecs:
    def test_bi_jpeg_and_bi_png_fail_loudly(self):
        img = _rng().integers(0, 256, (2, 2, 3)).astype(np.uint8)
        for comp in (4, 5):
            data = bytearray(encode_bmp(img))
            data[30:34] = struct.pack("<I", comp)
            with pytest.raises(NotImplementedError, match="embedded"):
                decode_bmp(bytes(data))


class TestOS2CoreHeader:
    """12-byte BITMAPCOREHEADER (BMP 1.x, OS/2): uint16 dims, 3-byte
    BGR palette triples, BI_RGB only — the old-web-crawl layout."""

    @staticmethod
    def _core(w, h, bpp, palette, rows):
        pix_off = 14 + 12 + len(palette)
        hdr = b"BM" + struct.pack("<IHHI", pix_off + len(rows), 0, 0, pix_off)
        core = struct.pack("<IHhHH", 12, w, h, 1, bpp)
        return hdr + core + palette + rows

    def test_palette4(self):
        rng = _rng()
        idx = rng.integers(0, 16, (5, 7)).astype(np.uint8)
        pal = rng.integers(0, 256, (16, 3)).astype(np.uint8)
        palette = b"".join(bytes([p[2], p[1], p[0]]) for p in pal)
        rows = b""
        for y in range(4, -1, -1):  # bottom-up
            packed = np.zeros(4, np.uint8)
            for x in range(7):
                packed[x // 2] |= idx[y, x] << (4 if x % 2 == 0 else 0)
            rows += packed.tobytes()  # rowbytes 4, already 4-aligned
        out = decode_bmp(self._core(7, 5, 4, palette, rows))
        assert (out == pal[idx]).all()

    def test_truecolor24(self):
        rng = _rng()
        img = rng.integers(0, 256, (3, 5, 3)).astype(np.uint8)
        rows = b""
        for y in range(2, -1, -1):
            rows += img[y, :, ::-1].tobytes() + b"\x00"  # 15 + 1 pad
        out = decode_bmp(self._core(5, 3, 24, b"", rows))
        assert (out == img).all()

    def test_truncated_palette_fails_loudly(self):
        data = self._core(4, 2, 8, b"\x00" * 30, b"\x00" * 8)
        with pytest.raises(ValueError, match="palette"):
            decode_bmp(data)
