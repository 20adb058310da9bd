"""JPEG 2000 codec tests: MQ coder, 5/3 DWT, Tier-1 blocks, full
codestream/container roundtrips, the PDF /JPXDecode seam, and the
declared out-of-scope failures."""

import random
import struct

import numpy as np
import pytest

from oar_ocr_spark.fixtures.render import render_page
from oar_ocr_spark.functions.jp2 import (
    _MQDecoder,
    _MQEncoder,
    _fwd_dwt,
    _inv_dwt,
    _t1_decode_block,
    _t1_encode_block,
    decode_j2k,
    decode_jp2,
    encode_j2k,
    encode_jp2,
)


class TestMQCoder:
    def test_random_context_streams_roundtrip(self):
        rng = random.Random(3)
        for trial in range(20):
            n = rng.randrange(1, 3000)
            seq = [(rng.randrange(19), rng.randrange(2)) for _ in range(n)]
            enc = _MQEncoder()
            for cx, d in seq:
                enc.encode(cx, d)
            dec = _MQDecoder(enc.flush())
            for cx, d in seq:
                assert dec.decode(cx) == d, trial

    def test_skewed_stream_compresses(self):
        enc = _MQEncoder()
        n = 50_000
        for k in range(n):
            enc.encode(5, 1 if k % 89 == 0 else 0)
        assert len(enc.flush()) < n // 60


class TestDwt53:
    def test_exact_reconstruction_all_shapes(self):
        rng = np.random.RandomState(7)
        for shape in [(8, 8), (13, 9), (1, 1), (1, 7), (7, 1), (98, 126), (5, 5)]:
            x = rng.randint(-128, 128, shape).astype(np.int64)
            for lev in (0, 1, 2, 3):
                assert (_inv_dwt(_fwd_dwt(x, lev), shape) == x).all(), (shape, lev)

    def test_smooth_content_concentrates_energy(self):
        # the point of the transform: a gradient's high bands are ~zero
        g = np.add.outer(np.arange(64), np.arange(64)).astype(np.int64)
        bands = _fwd_dwt(g, 2)
        hl, lh, hh = bands[-1]
        assert int(np.abs(hh).max()) <= 1  # second differences vanish


class TestTier1:
    def test_block_roundtrip_all_orientations(self):
        rng = np.random.RandomState(11)
        for orient in range(4):
            for shape in [(8, 8), (13, 9), (64, 64), (1, 5), (5, 1)]:
                mags = rng.randint(0, 300, shape).astype(np.int64)
                mags[rng.rand(*shape) < 0.6] = 0
                signs = (rng.rand(*shape) < 0.5).astype(np.uint8)
                signs[mags == 0] = 0
                nbps = int(mags.max()).bit_length() or 1
                data, npasses = _t1_encode_block(mags, signs, orient, nbps)
                m2, s2 = _t1_decode_block(
                    data, shape[0], shape[1], orient, nbps, npasses
                )
                assert (m2 == mags).all(), (orient, shape)
                assert (s2[mags != 0] == signs[mags != 0]).all(), (orient, shape)


class TestRoundtrip:
    def test_rendered_page_bit_exact_and_compresses(self):
        img = render_page("40_m0")
        code = encode_j2k(img)
        assert code == encode_j2k(img)  # deterministic
        assert np.array_equal(decode_j2k(code), img)
        assert len(code) < img.size // 4  # lossless yet well under raw

    def test_grey_shapes_including_noise(self):
        rng = np.random.RandomState(5)
        for shape in [(5, 5), (64, 64), (65, 67), (1, 1), (3, 130)]:
            x = rng.randint(0, 256, shape).astype(np.uint8)
            assert np.array_equal(decode_j2k(encode_j2k(x)), x), shape

    def test_rgb_rct_roundtrip(self):
        img = render_page("40_m0")
        rgb = np.stack([img, np.roll(img, 3, 0), np.roll(img, 5, 1)], axis=-1)
        assert np.array_equal(decode_j2k(encode_j2k(rgb)), rgb)

    def test_decomposition_levels(self):
        img = render_page("41_m1")
        for lev in (0, 1, 3):
            assert np.array_equal(decode_j2k(encode_j2k(img, levels=lev)), img)

    def test_jp2_box_container(self):
        img = render_page("40_m0")
        data = encode_jp2(img)
        assert data[:12] == b"\x00\x00\x00\x0cjP  \r\n\x87\n"
        assert np.array_equal(decode_jp2(data), img)
        # raw codestreams decode through the same entry
        assert np.array_equal(decode_jp2(encode_j2k(img)), img)

    def test_multi_codeblock_band(self):
        # > 64 px at full resolution → multiple code-blocks per band,
        # exercising the tag-tree grids
        rng = np.random.RandomState(9)
        x = rng.randint(0, 256, (130, 200)).astype(np.uint8)
        assert np.array_equal(decode_j2k(encode_j2k(x, levels=1)), x)


class TestDeclaredFailures:
    def _code(self):
        return bytearray(encode_j2k(render_page("40_m0")))

    def _patch_cod(self, data, offset, value):
        i = data.index(struct.pack(">H", 0xFF52))
        data[i + 4 + offset] = value
        return bytes(data)

    def test_not_a_codestream(self):
        with pytest.raises(ValueError, match="SOC"):
            decode_j2k(b"nope")
        with pytest.raises(ValueError, match="signature"):
            decode_jp2(b"also nope")

    def test_irreversible_97_raises(self):
        # COD SPcod transform byte 0 = 9/7 irreversible
        with pytest.raises(NotImplementedError, match="9/7"):
            decode_j2k(self._patch_cod(self._code(), 9, 0))

    def test_multi_layer_raises(self):
        with pytest.raises(NotImplementedError, match="multi-layer"):
            decode_j2k(self._patch_cod(self._code(), 3, 2))

    def test_non_lrcp_progression_raises(self):
        with pytest.raises(NotImplementedError, match="progression"):
            decode_j2k(self._patch_cod(self._code(), 1, 2))

    def test_codeblock_style_raises(self):
        with pytest.raises(NotImplementedError, match="style"):
            decode_j2k(self._patch_cod(self._code(), 8, 1))

    def test_quantized_stream_raises(self):
        data = self._code()
        i = data.index(struct.pack(">H", 0xFF5C))
        data[i + 4] |= 0x02  # Sqcd style: scalar derived
        with pytest.raises(NotImplementedError, match="quantized"):
            decode_j2k(bytes(data))

    def test_encoder_guards(self):
        with pytest.raises(ValueError, match="uint8"):
            encode_j2k(np.zeros((4, 4), dtype=np.int16))
        with pytest.raises(ValueError, match="empty"):
            encode_j2k(np.zeros((0, 4), dtype=np.uint8))


class TestPdfJpxSeam:
    def test_pdf_jpx_pages_roundtrip(self):
        from oar_ocr_spark.functions.pdf import decode_pdf, encode_pdf

        pages = [render_page("40_m0"), render_page("41_m1")]
        data = encode_pdf(pages, image_format="jpx")
        assert b"/JPXDecode" in data
        out = decode_pdf(data)
        assert len(out) == 2
        for got, want in zip(out, pages):
            assert np.array_equal(got, want)  # lossless end-to-end
