"""Adobe Glyph List subset (functions/glyph_names.py) — the name→
unicode algorithm behind /Differences encodings and Type3 fonts."""

import pytest

from oar_ocr_spark.functions.glyph_names import AGL, glyph_to_unicode


class TestTable:
    def test_letters_map_to_themselves(self):
        for c in "AZaz":
            assert glyph_to_unicode(c) == c

    def test_digit_names(self):
        assert glyph_to_unicode("zero") == "0"
        assert glyph_to_unicode("nine") == "9"

    def test_punctuation(self):
        assert glyph_to_unicode("space") == " "
        assert glyph_to_unicode("comma") == ","
        assert glyph_to_unicode("quotesingle") == "'"
        assert glyph_to_unicode("backslash") == "\\"

    def test_latin1_accents(self):
        assert glyph_to_unicode("eacute") == "é"
        assert glyph_to_unicode("Adieresis") == "Ä"
        assert glyph_to_unicode("germandbls") == "ß"

    def test_winansi_extension_names(self):
        assert glyph_to_unicode("Euro") == "€"
        assert glyph_to_unicode("emdash") == "—"
        assert glyph_to_unicode("quotedblleft") == "“"

    def test_ligatures(self):
        assert glyph_to_unicode("fi") == "ﬁ"
        assert glyph_to_unicode("ffl") == "ﬄ"

    def test_agl_greek_quirks_kept(self):
        # AGL deliberately maps Delta/Omega/mu to the math/technical
        # codepoints, not the Greek block
        assert glyph_to_unicode("Delta") == "∆"
        assert glyph_to_unicode("Omega") == "Ω"
        assert glyph_to_unicode("mu") == "µ"
        assert glyph_to_unicode("alpha") == "α"
        assert glyph_to_unicode("Sigma") == "Σ"

    def test_table_values_are_single_chars(self):
        assert all(len(v) == 1 for v in AGL.values())


class TestAlgorithm:
    def test_uni_form(self):
        assert glyph_to_unicode("uni0041") == "A"
        assert glyph_to_unicode("uni20AC") == "€"

    def test_uni_multi_value(self):
        assert glyph_to_unicode("uni00410042") == "AB"

    def test_u_form(self):
        assert glyph_to_unicode("u0041") == "A"
        assert glyph_to_unicode("u1F600") == "\U0001f600"
        assert glyph_to_unicode("u10FFFF") == "\U0010ffff"

    def test_period_suffix_stripped(self):
        assert glyph_to_unicode("a.sc") == "a"
        assert glyph_to_unicode("fi.alt") == "ﬁ"

    def test_underscore_ligature_components(self):
        assert glyph_to_unicode("f_i") == "fi"
        assert glyph_to_unicode("uni0041_B") == "AB"

    def test_lowercase_hex_uni_rejected(self):
        # AGL requires uppercase hex in uniXXXX
        with pytest.raises(KeyError):
            glyph_to_unicode("uni00e9")

    def test_surrogate_rejected(self):
        with pytest.raises(KeyError, match="surrogate"):
            glyph_to_unicode("uniD800")

    def test_out_of_range_u_rejected(self):
        with pytest.raises(KeyError):
            glyph_to_unicode("u110000")

    def test_notdef_rejected(self):
        with pytest.raises(KeyError):
            glyph_to_unicode(".notdef")

    def test_unknown_name_rejected(self):
        with pytest.raises(KeyError, match="AGL"):
            glyph_to_unicode("heart")
