"""CCITT Group 3/4 fax codec (functions/ccitt.py): ITU-T T.4/T.6 code
tables, all three coding modes, long-run makeups, polarity and damage
contracts. Reference decodes fax TIFF/PDF via the `image`/`hayro`
crates (utils/image.rs, Cargo.toml:20); here the tables come straight
from the public T.4 (03/93) spec."""

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from oar_ocr_spark.functions.ccitt import (
    _BLACK_MAKEUP,
    _BLACK_TERM,
    _EXT_MAKEUP,
    _WHITE_MAKEUP,
    _WHITE_TERM,
    ccitt_decode,
    ccitt_encode_g3_1d,
    ccitt_encode_g3_2d,
    ccitt_encode_g4,
)

_EOL = "000000000001"


def _fax_rows(rng, h, w):
    """Run-structured bilevel content (the fax-realistic shape)."""
    bits = np.zeros((h, w), dtype=np.uint8)
    for y in range(h):
        x, color = 0, int(rng.integers(0, 2))
        while x < w:
            run = int(rng.integers(1, 20))
            bits[y, x : x + run] = color
            x += run
            color ^= 1
    return bits


class TestCodeTables:
    def test_prefix_free_with_eol(self):
        # every decodable symbol set (per color, plus the shared
        # extended makeups and EOL) must be prefix-free
        for term, makeup in ((_WHITE_TERM, _WHITE_MAKEUP), (_BLACK_TERM, _BLACK_MAKEUP)):
            codes = (
                list(term.values())
                + list(makeup.values())
                + list(_EXT_MAKEUP.values())
                + [_EOL]
            )
            assert len(set(codes)) == len(codes)
            for a in codes:
                for b in codes:
                    if a != b:
                        assert not a.startswith(b), (a, b)

    def test_kraft_inequality(self):
        for term, makeup in ((_WHITE_TERM, _WHITE_MAKEUP), (_BLACK_TERM, _BLACK_MAKEUP)):
            s = sum(
                2.0 ** -len(c)
                for c in list(term.values())
                + list(makeup.values())
                + list(_EXT_MAKEUP.values())
            )
            assert s <= 1.0 + 1e-12

    def test_published_anchor_codes(self):
        # spot vectors from ITU-T T.4 tables 2/3
        assert _WHITE_TERM[0] == "00110101"
        assert _WHITE_TERM[1] == "000111"
        assert _WHITE_TERM[63] == "00110100"
        assert _WHITE_MAKEUP[64] == "11011"
        assert _WHITE_MAKEUP[1728] == "010011011"
        assert _BLACK_TERM[0] == "0000110111"
        assert _BLACK_TERM[1] == "010"
        assert _BLACK_MAKEUP[64] == "0000001111"
        assert _EXT_MAKEUP[1792] == "00000001000"
        assert _EXT_MAKEUP[2560] == "000000011111"

    def test_mh_spot_vector(self):
        # one all-white 1728-column row (the classic fax width) codes
        # as makeup-1728 + white-term-0; byte-aligned that is
        # 010011011 00110101 -> 0x4D 0x9A 0x80
        row = np.zeros((1, 1728), dtype=np.uint8)
        data = ccitt_encode_g3_1d(row, byte_align=True)
        assert data == bytes([0b01001101, 0b10011010, 0b10000000])
        assert np.array_equal(
            ccitt_decode(data, 1728, 1, k=0, byte_align=True), row
        )


class TestRoundtrip:
    @pytest.mark.parametrize("mode", ["g4", "g3_1d", "g3_2d"])
    def test_fax_content(self, mode):
        rng = np.random.default_rng(11)
        for trial in range(15):
            h, w = int(rng.integers(1, 24)), int(rng.integers(1, 90))
            bits = _fax_rows(rng, h, w)
            if mode == "g4":
                dec = ccitt_decode(ccitt_encode_g4(bits), w, h, k=-1)
            elif mode == "g3_1d":
                dec = ccitt_decode(
                    ccitt_encode_g3_1d(bits), w, h, k=0, byte_align=True
                )
            else:
                dec = ccitt_decode(ccitt_encode_g3_2d(bits), w, h, k=1)
            assert np.array_equal(dec, bits), (mode, trial, h, w)

    def test_long_runs_through_extended_makeups(self):
        # runs > 1728 and > 2560 exercise the shared extended makeups
        big = np.zeros((3, 6000), dtype=np.uint8)
        big[0, 100:5900] = 1
        big[1, :] = 1
        for enc, kw in (
            (ccitt_encode_g4, dict(k=-1)),
            (ccitt_encode_g3_1d, dict(k=0, byte_align=True)),
            (ccitt_encode_g3_2d, dict(k=1)),
        ):
            assert np.array_equal(ccitt_decode(enc(big), 6000, 3, **kw), big)

    def test_single_column_and_solid_pages(self):
        for bits in (
            np.ones((5, 1), dtype=np.uint8),
            np.zeros((5, 1), dtype=np.uint8),
            np.ones((4, 64), dtype=np.uint8),
            np.zeros((4, 64), dtype=np.uint8),
        ):
            h, w = bits.shape
            assert np.array_equal(ccitt_decode(ccitt_encode_g4(bits), w, h, k=-1), bits)

    @settings(max_examples=40, deadline=None)
    @given(
        st.integers(1, 12),
        st.integers(1, 70),
        st.integers(0, 2**32 - 1),
        st.sampled_from(["g4", "g3_1d", "g3_2d"]),
    )
    def test_property_roundtrip(self, h, w, seed, mode):
        # iid noise stresses the code tables harder than run content
        bits = (np.random.default_rng(seed).random((h, w)) < 0.4).astype(np.uint8)
        if mode == "g4":
            dec = ccitt_decode(ccitt_encode_g4(bits), w, h, k=-1)
        elif mode == "g3_1d":
            dec = ccitt_decode(ccitt_encode_g3_1d(bits), w, h, k=0, byte_align=True)
        else:
            dec = ccitt_decode(ccitt_encode_g3_2d(bits), w, h, k=1)
        assert np.array_equal(dec, bits)


class TestContracts:
    def test_truncated_stream_raises(self):
        bits = _fax_rows(np.random.default_rng(1), 8, 60)
        data = ccitt_encode_g4(bits)
        with pytest.raises(ValueError):
            ccitt_decode(data[: len(data) // 3], 60, 8, k=-1)

    def test_garbage_raises(self):
        with pytest.raises(ValueError):
            ccitt_decode(b"\x12\x34\x56\x78", 100, 5, k=-1)

    def test_row_count_mismatch_raises(self):
        bits = _fax_rows(np.random.default_rng(2), 4, 40)
        with pytest.raises(ValueError):
            ccitt_decode(ccitt_encode_g4(bits), 40, 9, k=-1)

    def test_bad_columns_raises(self):
        with pytest.raises(ValueError):
            ccitt_decode(b"", 0, 1, k=-1)

    def test_decode_is_black_one_domain(self):
        # decoded 1 = black regardless of container polarity; the
        # TIFF/PDF adapters own the mapping
        row = np.array([[1, 1, 0, 0, 1]], dtype=np.uint8)
        assert np.array_equal(ccitt_decode(ccitt_encode_g4(row), 5, 1, k=-1), row)
