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

    def test_97_without_quantization_raises(self):
        # COD transform byte patched to 9/7 while QCD stays style 0
        with pytest.raises(ValueError, match="without quantization"):
            decode_j2k(self._patch_cod(self._code(), 9, 0))

    def test_single_layer_stream_relabeled_multilayer_fails_loudly(self):
        # multi-layer streams decode (TestMultiLayer); a SINGLE-layer
        # stream whose COD merely claims 2 layers is malformed and
        # must not decode as garbage
        with pytest.raises((ValueError, NotImplementedError)):
            decode_j2k(self._patch_cod(self._code(), 3, 2))

    def test_illegal_progression_byte_raises(self):
        # all five A.6.1 orders decode (TestProgressionCollapse);
        # bytes past 4 are illegal
        with pytest.raises(ValueError, match="progression"):
            decode_j2k(self._patch_cod(self._code(), 1, 5))

    def test_codeblock_style_raises(self):
        # bypass/reset/termall/causal/segsym decode (TestCodeBlockStyles);
        # predictable termination (0x10) and reserved bits stay out of scope
        with pytest.raises(NotImplementedError, match="style"):
            decode_j2k(self._patch_cod(self._code(), 8, 0x10))

    def test_quantized_53_stream_raises(self):
        data = self._code()
        i = data.index(struct.pack(">H", 0xFF5C))
        data[i + 4] |= 0x02  # Sqcd style: scalar expounded on a 5/3 stream
        with pytest.raises(ValueError, match="5/3"):
            decode_j2k(bytes(data))

    def test_encoder_guards(self):
        with pytest.raises(ValueError, match="uint8"):
            encode_j2k(np.zeros((4, 4), dtype=np.int16))
        with pytest.raises(ValueError, match="empty"):
            encode_j2k(np.zeros((0, 4), dtype=np.uint8))


class TestIrreversible97:
    def test_97_dwt_inverts_to_float_precision(self):
        from oar_ocr_spark.functions.jp2 import _fwd_97_1d, _inv_97_1d

        rng = np.random.RandomState(7)
        for shape in [(8, 8), (13, 9), (1, 1), (1, 7), (7, 1), (98, 126)]:
            x = rng.randint(-128, 128, shape).astype(np.float64)
            for lev in (0, 1, 2, 3):
                y = _inv_dwt(
                    _fwd_dwt(x, lev, _fwd_97_1d), shape, _inv_97_1d
                )
                assert np.abs(y - x).max() < 1e-9, (shape, lev)

    def test_97_unit_dc_gain_and_vanishing_high_bands(self):
        from oar_ocr_spark.functions.jp2 import _fwd_97_1d

        # K-normalized analysis: constant input keeps its value in LL
        # (gain 1 per level) and the detail bands are numerically zero
        c = np.full((64, 64), 50.0)
        bands = _fwd_dwt(c, 3, _fwd_97_1d)
        assert abs(bands[0].mean() - 50.0) < 1e-9
        assert np.abs(bands[-1][2]).max() < 1e-12

    def test_default_step_near_lossless(self):
        img = render_page("40_m0")
        code = encode_j2k(img, irreversible=True)
        assert code == encode_j2k(img, irreversible=True)  # deterministic
        err = np.abs(decode_j2k(code).astype(int) - img.astype(int))
        assert err.max() <= 2 and err.mean() < 0.05

    def test_rgb_ict_near_lossless(self):
        img = render_page("41_m1")
        rgb = np.stack([img, np.roll(img, 3, 0), np.roll(img, 5, 1)], axis=-1)
        out = decode_j2k(encode_j2k(rgb, irreversible=True))
        err = np.abs(out.astype(int) - rgb.astype(int))
        assert err.max() <= 4 and err.mean() < 0.3

    def test_quality_knob_trades_size_for_error(self):
        img = render_page("40_m0")
        sizes, errs = [], []
        for delta in (0.5, 2.0, 8.0):
            code = encode_j2k(img, irreversible=True, delta=delta)
            sizes.append(len(code))
            errs.append(
                np.abs(decode_j2k(code).astype(int) - img.astype(int)).mean()
            )
        assert sizes[0] > sizes[1] > sizes[2]
        assert errs[0] < errs[1] < errs[2]

    def test_scalar_derived_roundtrip(self):
        img = render_page("40_m0")
        code = encode_j2k(img, irreversible=True, derived=True, delta=0.25)
        # QCD signals style 1 with a single (eps, mu) pair
        i = code.index(struct.pack(">H", 0xFF5C))
        assert code[i + 4] & 0x1F == 1
        assert struct.unpack(">H", code[i + 2 : i + 4])[0] == 2 + 1 + 2
        err = np.abs(decode_j2k(code).astype(int) - img.astype(int))
        assert err.max() <= 2

    def test_odd_shapes_and_levels(self):
        rng = np.random.RandomState(13)
        for shape in [(5, 5), (65, 67), (1, 1), (3, 130)]:
            x = rng.randint(0, 256, shape).astype(np.uint8)
            for lev in (0, 1, 3):
                out = decode_j2k(encode_j2k(x, irreversible=True, levels=lev))
                err = np.abs(out.astype(int) - x.astype(int))
                assert err.max() <= 4, (shape, lev, err.max())

    def test_lossy_beats_lossless_on_noise(self):
        # quantization is what buys compression on incompressible
        # content — the whole point of the 9/7 profile
        rng = np.random.RandomState(3)
        x = rng.randint(0, 256, (128, 128)).astype(np.uint8)
        lossless = len(encode_j2k(x))
        assert len(encode_j2k(x, irreversible=True, delta=8.0)) < 0.7 * lossless
        assert len(encode_j2k(x, irreversible=True, delta=32.0)) < 0.4 * lossless

    def test_jp2_container_97(self):
        img = render_page("40_m0")
        data = encode_jp2(img, irreversible=True)
        err = np.abs(decode_jp2(data).astype(int) - img.astype(int))
        assert err.max() <= 2

    def test_encoder_guards(self):
        img = render_page("40_m0")
        with pytest.raises(ValueError, match="irreversible path"):
            encode_j2k(img, delta=2.0)
        with pytest.raises(ValueError, match="irreversible path"):
            encode_j2k(img, derived=True)
        with pytest.raises(ValueError, match="positive"):
            encode_j2k(img, irreversible=True, delta=0.0)
        with pytest.raises(ValueError, match="signalable"):
            encode_j2k(img, irreversible=True, delta=2.0**-30)


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

    def test_pdf_jpx97_pages_near_lossless(self):
        from oar_ocr_spark.functions.pdf import decode_pdf, encode_pdf

        pages = [render_page("40_m0"), render_page("41_m1")]
        data = encode_pdf(pages, image_format="jpx97")
        assert b"/JPXDecode" in data
        out = decode_pdf(data)
        assert len(out) == 2
        for got, want in zip(out, pages):
            err = np.abs(got.astype(int) - want.astype(int))
            assert err.max() <= 2


class TestStoreFlavor:
    def test_payload_flavor_mix_and_twin_decode(self):
        """jp2_payload_for_ref is the ONE implementation behind both the
        media store rows and the golden twin: the crc32 pick must cover
        lossless AND 9/7 flavors over the gate's ref population, decode
        deterministically, and be exact on the lossless half /
        error-bounded on the lossy half."""
        import zlib

        from oar_ocr_spark.functions.jp2 import JP2_SIG
        from oar_ocr_spark.functions.multimodal import _to_grey, jp2_payload_for_ref

        refs = [f"{40 + i}_m{i % 4}" for i in range(12)]
        modes = set()
        for ref in refs:
            page = render_page(ref)
            data = jp2_payload_for_ref(ref, page)
            assert data == jp2_payload_for_ref(ref, page)  # deterministic
            h = zlib.crc32(("jp2:" + ref).encode("utf-8"))
            # container flavor honored
            if h & 4:
                assert data[:12] == JP2_SIG
            else:
                assert data[:2] == b"\xffO"
            # the seam greys colour decodes (the subsampled colour
            # flavor comes back as equal-channel RGB — exact on grey)
            out = _to_grey(decode_jp2(data))
            if h & 8:
                modes.add("97")
                # worst flavor: derived + delta 0.5 + 3 levels (the
                # finest-band step doubles per level to 2.0); measured
                # max error 5 over the gate population
                assert np.abs(out.astype(int) - page.astype(int)).max() <= 8
            else:
                modes.add("53")
                assert np.array_equal(out, page)
        assert modes == {"53", "97"}  # both transforms exercised

    def test_golden_table_matches_twin(self):
        """The shipped media_features_jp2.parquet golden rows reproduce
        through the twin for a sample — guards against a stale golden
        after a flavor/codec change (content-keyed contract)."""
        import os

        import pyarrow.parquet as pq

        from tools.make_goldens import GOLDEN_DIR, _jp2_feature_row

        tbl = pq.read_table(
            os.path.join(GOLDEN_DIR, "media_features_jp2.parquet")
        ).to_pylist()
        assert len(tbl) >= 48
        for row in tbl[:4] + tbl[-4:]:
            got = _jp2_feature_row(row["media_ref"])
            assert got == (
                row["media_ref"],
                row["width"],
                row["height"],
                np.float32(row["mean_intensity"]),
                np.float32(row["ink_ratio"]),
                row["n_regions"],
            )


class TestMultiTile:
    def test_tiled_lossless_roundtrips_all_grids(self):
        # edge tiles clipped, tile dims not dividing the image, tile
        # bigger than one dimension — all exact
        img = render_page("7_m2")  # 229x172
        for ts in (64, 100, 128):
            for lev in (1, 3):
                code = encode_j2k(img, levels=lev, tile_size=ts)
                assert np.array_equal(decode_j2k(code), img), (ts, lev)
        # SIZ signals the tile grid
        code = encode_j2k(img, tile_size=64)
        i = code.index(struct.pack(">H", 0xFF51))
        xt, yt = struct.unpack(">II", code[i + 22 : i + 30])
        assert (xt, yt) == (64, 64)
        assert code.count(struct.pack(">H", 0xFF90)) == 12  # 4x3 tiles

    def test_tiled_rgb_and_container(self):
        img = render_page("40_m0")
        rgb = np.stack([img, np.roll(img, 3, 0), np.roll(img, 5, 1)], axis=-1)
        assert np.array_equal(decode_j2k(encode_j2k(rgb, tile_size=96)), rgb)
        assert np.array_equal(decode_jp2(encode_jp2(img, tile_size=64)), img)

    def test_tiled_97_error_bounded(self):
        img = render_page("41_m1")
        out = decode_j2k(encode_j2k(img, irreversible=True, tile_size=96))
        assert np.abs(out.astype(int) - img.astype(int)).max() <= 2

    def test_flat_image_empty_packets(self):
        # regression: an all-zero resolution emits an EMPTY packet; the
        # reader must materialize not-included blocks for every band
        # (previously IndexError deep in band assembly)
        flat = np.full((50, 70), 200, dtype=np.uint8)
        assert np.array_equal(decode_j2k(encode_j2k(flat)), flat)
        assert np.array_equal(
            decode_j2k(encode_j2k(flat, tile_size=32 * 2)), flat
        )

    def test_declared_failures(self):
        img = render_page("40_m0")
        code = bytearray(encode_j2k(img, tile_size=64))
        i = code.index(struct.pack(">H", 0xFF90))
        # a first tile-part claiming TPsot=1 is malformed (part 0 of
        # that tile never arrived) — multi-part streams themselves
        # decode (TestTileParts)
        bad = bytearray(code)
        bad[i + 10] = 1
        with pytest.raises(ValueError, match="part"):
            decode_j2k(bytes(bad))
        # a relabeled tile index makes the stream inconsistent
        bad = bytearray(code)
        bad[i + 5] = 2  # Isot low byte of the FIRST tile
        with pytest.raises(ValueError):
            decode_j2k(bytes(bad))
        with pytest.raises(ValueError, match="tile_size"):
            encode_j2k(img, tile_size=8)

    def test_missing_tiles_fail_loudly(self):
        img = render_page("40_m0")
        code = encode_j2k(img, tile_size=96)
        # truncate after the first tile: splice EOC right before the
        # second SOT
        first = code.index(struct.pack(">H", 0xFF90))
        second = code.index(struct.pack(">H", 0xFF90), first + 2)
        with pytest.raises(ValueError, match="tiles"):
            decode_j2k(code[:second] + struct.pack(">H", 0xFFD9))


class TestDeepPrecision:
    """2-16-bit unsigned samples (the 12/16-bit DICOM layouts),
    mirroring the lossless-JPEG API: precision= on encode, deep=True
    for full-precision decode, top-8/left-aligned projection at the
    image seam otherwise."""

    def test_16bit_roundtrip_and_projection(self):
        rng = np.random.RandomState(5)
        x = rng.randint(0, 65536, (40, 56)).astype(np.uint16)
        code = encode_j2k(x)  # precision defaults to 16 on uint16
        assert np.array_equal(decode_j2k(code, deep=True), x)
        assert np.array_equal(decode_j2k(code), (x >> 8).astype(np.uint8))
        # SIZ signals Ssiz = P-1
        i = code.index(struct.pack(">H", 0xFF51))
        assert code[i + 40] == 15

    def test_12bit_dicom_layout(self):
        rng = np.random.RandomState(6)
        x = rng.randint(0, 4096, (33, 47)).astype(np.uint16)
        code = encode_j2k(x, precision=12)
        assert np.array_equal(decode_j2k(code, deep=True), x)
        assert np.array_equal(decode_j2k(code), (x >> 4).astype(np.uint8))

    def test_sub8_left_aligned(self):
        rng = np.random.RandomState(7)
        x = rng.randint(0, 16, (20, 20)).astype(np.uint8)
        code = encode_j2k(x, precision=4)
        assert np.array_equal(decode_j2k(code, deep=True), x)
        assert np.array_equal(decode_j2k(code), (x << 4).astype(np.uint8))

    def test_deep_rgb_tiled(self):
        rng = np.random.RandomState(8)
        rgb = rng.randint(0, 65536, (70, 90, 3)).astype(np.uint16)
        code = encode_j2k(rgb, tile_size=64)
        assert np.array_equal(decode_j2k(code, deep=True), rgb)

    def test_deep_jp2_container_and_97(self):
        rng = np.random.RandomState(9)
        x = rng.randint(0, 4096, (30, 42)).astype(np.uint16)
        data = encode_jp2(x, precision=12)
        bpc_at = data.index(b"ihdr") + 4 + 10  # body: H(4) W(4) NC(2) BPC
        assert data[bpc_at] == 11  # ihdr BPC byte = P-1
        assert np.array_equal(decode_jp2(data, deep=True), x)
        out = decode_j2k(
            encode_j2k(x, precision=12, irreversible=True, delta=0.25),
            deep=True,
        )
        assert np.abs(out.astype(int) - x.astype(int)).max() <= 2

    def test_guards(self):
        x = np.full((8, 8), 300, dtype=np.uint16)
        with pytest.raises(ValueError, match="precision"):
            encode_j2k(x, precision=1)
        with pytest.raises(ValueError, match="exceeds"):
            encode_j2k(x, precision=8)
        with pytest.raises(ValueError, match="uint8 or uint16"):
            encode_j2k(x.astype(np.int32))
        # a stream relabeled signed decodes as signed (TestSignedComponents)
        code = bytearray(encode_j2k(np.zeros((8, 8), dtype=np.uint8)))
        i = code.index(struct.pack(">H", 0xFF51))
        code[i + 40] |= 0x80
        # (the unsigned encoder level-shifted 0 -> -128; a signed
        # relabel keeps the -128 because signed data has no DC shift)
        got = decode_j2k(bytes(code), deep=True)
        assert got.dtype == np.int8 and (got == -128).all()


class TestProgressionCollapse:
    """All five A.6.1 progression orders encode and decode: at one
    layer/one precinct they collapse to exactly two packet sequences —
    resolution-major (LRCP/RLCP/RPCL) and component-major (PCRL/CPRL)."""

    def test_all_five_orders_roundtrip(self):
        img = render_page("40_m0")
        rgb = np.stack([img, np.roll(img, 3, 0), np.roll(img, 5, 1)], axis=-1)
        for prog in ("lrcp", "rlcp", "rpcl", "pcrl", "cprl"):
            assert np.array_equal(decode_j2k(encode_j2k(img, prog=prog)), img)
            assert np.array_equal(decode_j2k(encode_j2k(rgb, prog=prog)), rgb)
            assert np.array_equal(
                decode_j2k(encode_j2k(rgb, prog=prog, tile_size=96)), rgb
            ), prog

    def test_rlcp_rpcl_decode_as_lrcp(self):
        # within the resolution-major family a relabel is a no-op
        img = render_page("40_m0")
        code = bytearray(encode_j2k(img))
        i = code.index(struct.pack(">H", 0xFF52))
        for prog in (1, 2):
            c2 = bytearray(code)
            c2[i + 5] = prog
            assert np.array_equal(decode_j2k(bytes(c2)), img), prog

    def test_families_differ_on_color(self):
        # the two families are genuinely different byte sequences
        img = render_page("40_m0")
        rgb = np.stack([img, np.roll(img, 3, 0), np.roll(img, 5, 1)], axis=-1)
        assert encode_j2k(rgb, prog="lrcp") != encode_j2k(rgb, prog="pcrl")
        with pytest.raises(ValueError, match="prog"):
            encode_j2k(img, prog="nope")


class TestResyncMarkers:
    """SOP/EPH (A.8): the COD-signalled packet resync layout
    error-resilient encoder profiles emit."""

    def test_sop_eph_roundtrip_all_paths(self):
        img = render_page("40_m0")
        rgb = np.stack([img, np.roll(img, 3, 0), np.roll(img, 5, 1)], axis=-1)
        for kw in ({"sop": True}, {"eph": True}, {"sop": True, "eph": True}):
            assert np.array_equal(decode_j2k(encode_j2k(img, **kw)), img), kw
            assert np.array_equal(
                decode_j2k(encode_j2k(rgb, tile_size=96, **kw)), rgb
            ), kw
            err = np.abs(
                decode_j2k(encode_j2k(img, irreversible=True, **kw)).astype(int)
                - img.astype(int)
            )
            assert err.max() <= 2, kw
        # one marker pair per packet (levels=2 grey -> 3 packets), and
        # the COD Scod byte signals both
        code = encode_j2k(img, sop=True, eph=True)
        assert code.count(struct.pack(">H", 0xFF91)) == 3
        assert code.count(struct.pack(">H", 0xFF92)) == 3
        i = code.index(struct.pack(">H", 0xFF52))
        assert code[i + 4] == 0x06

    def test_empty_packets_carry_markers(self):
        flat = np.full((40, 40), 77, dtype=np.uint8)
        code = encode_j2k(flat, sop=True, eph=True)
        assert np.array_equal(decode_j2k(code), flat)

    def test_container_passthrough(self):
        img = render_page("41_m1")
        assert np.array_equal(
            decode_jp2(encode_jp2(img, sop=True, eph=True)), img
        )

    def test_missing_markers_fail_loudly(self):
        img = render_page("40_m0")
        code = bytearray(encode_j2k(img))
        i = code.index(struct.pack(">H", 0xFF52))
        code[i + 4] = 0x02  # claim SOP without emitting it
        with pytest.raises(ValueError, match="SOP"):
            decode_j2k(bytes(code))
        code[i + 4] = 0x04  # claim EPH without emitting it
        with pytest.raises(ValueError, match="EPH"):
            decode_j2k(bytes(code))
        # Scod claiming precincts without the per-resolution size bytes
        # is malformed (precinct-partitioned streams decode —
        # TestPrecincts)
        code[i + 4] = 0x01
        with pytest.raises(ValueError, match="precinct"):
            decode_j2k(bytes(code))


class TestSilentMisparseGuards:
    """Markers whose silent skip would decode WRONG must fail loudly:
    COC/POC/PPM in the main header, COD/COC/POC/PPT in a tile-part
    header (QCD/QCC quantization overrides DECODE —
    TestQuantizationOverrides)."""

    def _with_main_marker(self, marker):
        code = bytearray(encode_j2k(render_page("40_m0")))
        i = code.index(struct.pack(">H", 0xFF5C))  # before QCD
        return bytes(code[:i]) + struct.pack(">HH", marker, 4) + b"\x00\x00" + bytes(
            code[i:]
        )

    def test_main_header_overrides_raise(self):
        for marker in (0xFF53, 0xFF5F, 0xFF60):
            with pytest.raises(NotImplementedError, match="not supported"):
                decode_j2k(self._with_main_marker(marker))

    def test_quantized_qcc_in_reversible_stream_raises(self):
        # a QCC is parsed now, so a style-1 body contradicting the
        # reversible COD transform must still fail loudly
        code = bytearray(encode_j2k(render_page("40_m0")))
        i = code.index(struct.pack(">H", 0xFF5C))
        qcc = struct.pack(">HH", 0xFF5D, 6) + bytes([0, 0x61]) + b"\x10\x00"
        with pytest.raises(ValueError, match="quantized QCD style"):
            decode_j2k(bytes(code[:i]) + qcc + bytes(code[i:]))

    def test_tile_header_overrides_raise(self):
        code = bytearray(encode_j2k(render_page("40_m0")))
        i = code.index(struct.pack(">H", 0xFF93))  # SOD: inject before
        patched = bytes(code[:i]) + struct.pack(">HH", 0xFF61, 4) + b"\x00\x00" + bytes(
            code[i:]
        )
        with pytest.raises(NotImplementedError, match="not supported"):
            decode_j2k(patched)

    def test_advisory_markers_skipped(self):
        # COM (main) is advisory — a stream carrying one still decodes
        img = render_page("40_m0")
        code = bytearray(encode_j2k(img))
        i = code.index(struct.pack(">H", 0xFF5C))
        com = struct.pack(">HHH", 0xFF64, 6, 1) + b"hi"
        patched = bytes(code[:i]) + com + bytes(code[i:])
        assert np.array_equal(decode_j2k(patched), img)


class TestMultiLayer:
    """Quality-progressive streams (the archival multi-layer profile):
    per-block coding passes spread across layers with persistent
    tag-tree / Lblock packet state; the decoder accumulates every
    layer's chunks and Tier-1-decodes each block once."""

    def test_layer_counts_roundtrip_exactly(self):
        img = render_page("40_m0")
        sizes = []
        for L in (2, 3, 8):
            code = encode_j2k(img, layers=L)
            assert np.array_equal(decode_j2k(code), img), L
            i = code.index(struct.pack(">H", 0xFF52))
            assert struct.unpack(">H", code[i + 6 : i + 8])[0] == L
            sizes.append(len(code))
        # more layers = more packet-header overhead, same payload
        assert sizes[0] < sizes[-1]

    def test_composes_with_every_other_flavor(self):
        img = render_page("41_m1")
        rgb = np.stack([img, np.roll(img, 3, 0), np.roll(img, 5, 1)], axis=-1)
        assert np.array_equal(decode_j2k(encode_j2k(rgb, layers=4)), rgb)
        assert np.array_equal(
            decode_j2k(encode_j2k(img, layers=3, tile_size=96)), img
        )
        assert np.array_equal(
            decode_j2k(encode_j2k(img, layers=2, sop=True, eph=True)), img
        )
        err = np.abs(
            decode_j2k(encode_j2k(img, layers=3, irreversible=True)).astype(int)
            - img.astype(int)
        )
        assert err.max() <= 2
        rng = np.random.RandomState(5)
        x16 = rng.randint(0, 65536, (33, 47)).astype(np.uint16)
        assert np.array_equal(
            decode_j2k(encode_j2k(x16, layers=4), deep=True), x16
        )
        noise = rng.randint(0, 256, (130, 200)).astype(np.uint8)
        assert np.array_equal(
            decode_j2k(encode_j2k(noise, levels=1, layers=5)), noise
        )

    def test_flat_image_multilayer(self):
        # every block all-zero: inclusion never resolves across any of
        # the 8 layers' packets (tag-tree threshold climbs to the end)
        flat = np.full((40, 40), 77, dtype=np.uint8)
        assert np.array_equal(decode_j2k(encode_j2k(flat, layers=8)), flat)

    def test_jp2_container_multilayer(self):
        img = render_page("40_m0")
        assert np.array_equal(decode_jp2(encode_jp2(img, layers=3)), img)

    def test_all_progressions_with_layers(self):
        # the (layer, res, comp) nesting differs per order — all five
        # roundtrip, and the nestings genuinely reorder the packets
        img = render_page("40_m0")
        rgb = np.stack([img, np.roll(img, 3, 0), np.roll(img, 5, 1)], axis=-1)
        codes = {}
        for prog in ("lrcp", "rlcp", "rpcl", "pcrl", "cprl"):
            code = encode_j2k(rgb, layers=3, prog=prog)
            assert np.array_equal(decode_j2k(code), rgb), prog
            codes[prog] = code
        assert codes["lrcp"] != codes["rlcp"] != codes["rpcl"]

    def test_guards(self):
        img = render_page("40_m0")
        with pytest.raises(ValueError, match="layers"):
            encode_j2k(img, layers=0)


class TestPrecincts:
    """Precinct partitions (B.6): square >=128px precincts (block-grid
    aligned) — each precinct its own packet chain with its own
    tag-trees; the region-access layout big-scan profiles pair with
    tiling."""

    def test_precinct_roundtrip_and_signalling(self):
        img = render_page("7_m2")  # 229x172: 2x2 precincts at 128
        for pc in (7, 8):
            code = encode_j2k(img, precinct=pc)
            assert np.array_equal(decode_j2k(code), img), pc
        code = encode_j2k(img, precinct=7)
        i = code.index(struct.pack(">H", 0xFF52))
        assert code[i + 4] & 0x01  # Scod signals precincts
        assert code[i + 14] == 0x77  # PPx=PPy=7 per resolution

    def test_composes_with_everything(self):
        img = render_page("7_m2")
        rgb = np.stack([img, np.roll(img, 3, 0), np.roll(img, 5, 1)], axis=-1)
        assert np.array_equal(
            decode_j2k(encode_j2k(rgb, precinct=7, layers=3)), rgb
        )
        assert np.array_equal(
            decode_j2k(encode_j2k(img, precinct=7, prog="rlcp", layers=2)), img
        )
        assert np.array_equal(
            decode_j2k(encode_j2k(img, precinct=7, tile_size=150)), img
        )
        assert np.array_equal(
            decode_j2k(encode_j2k(img, precinct=7, sop=True, eph=True)), img
        )
        err = np.abs(
            decode_j2k(encode_j2k(img, precinct=7, irreversible=True)).astype(int)
            - img.astype(int)
        )
        assert err.max() <= 2
        big = np.random.RandomState(3).randint(0, 256, (300, 280)).astype(np.uint8)
        assert np.array_equal(
            decode_j2k(encode_j2k(big, precinct=7, layers=4)), big
        )

    def test_guards(self):
        img = render_page("40_m0")
        with pytest.raises(ValueError, match="precinct"):
            encode_j2k(img, precinct=6)  # below block alignment
        # (precincts in the positional orders RPCL/PCRL/CPRL decode —
        # TestPositionalPrecincts; per-resolution and rectangular
        # sizes decode — TestNonUniformPrecincts)
        # a sub-block precinct byte stays declared out of scope
        code = bytearray(encode_j2k(img, precinct=7))
        i = code.index(struct.pack(">H", 0xFF52))
        bad = bytearray(code)
        bad[i + 15] = 0x66  # 2^(6-1)=32 < the 64px block at r=1
        with pytest.raises(NotImplementedError, match="precinct"):
            decode_j2k(bytes(bad))


class TestTileParts:
    """Multiple tile-parts (A.4.2): each tile's packet stream split at
    packet boundaries across SOT..SOD parts, INTERLEAVED across tiles
    (the progressive-delivery layout streamed scans use); every part
    advances the tile's packet cursor to its Psot boundary."""

    def test_interleaved_parts_roundtrip(self):
        img = render_page("7_m2")  # 4x3 tiles at 64
        for nparts in (2, 3, 5):
            code = encode_j2k(img, tile_size=96, tile_parts=nparts)
            assert np.array_equal(decode_j2k(code), img), nparts
            # 3x2 tiles, each in nparts parts, interleaved
            assert code.count(struct.pack(">H", 0xFF90)) == nparts * 6
        # TPsot/TNsot signalled on the second part
        code = encode_j2k(img, tile_size=96, tile_parts=2)
        first = code.index(struct.pack(">H", 0xFF90))
        assert code[first + 10] == 0 and code[first + 11] == 2

    def test_composes_with_every_flavor(self):
        img = render_page("7_m2")
        rgb = np.stack([img, np.roll(img, 3, 0), np.roll(img, 5, 1)], axis=-1)
        code = encode_j2k(
            rgb, layers=4, precinct=7, tile_parts=3, sop=True, eph=True
        )
        assert np.array_equal(decode_j2k(code), rgb)
        err = np.abs(
            decode_j2k(encode_j2k(img, irreversible=True, tile_parts=2)).astype(int)
            - img.astype(int)
        )
        assert err.max() <= 2
        assert np.array_equal(
            decode_j2k(encode_j2k(img, prog="cprl", tile_parts=2)), img
        )

    def test_guards(self):
        img = render_page("40_m0")
        with pytest.raises(ValueError, match="tile_parts"):
            encode_j2k(img, tile_parts=0)
        # out-of-order parts of one tile fail loudly
        code = bytearray(encode_j2k(img, tile_parts=2))
        first = code.index(struct.pack(">H", 0xFF90))
        second = code.index(struct.pack(">H", 0xFF90), first + 2)
        swapped = (
            bytes(code[:first])
            + bytes(code[second:])
            + bytes(code[first:second])
        )
        # (swapping the byte ranges also swaps what follows EOC-wards;
        # rebuild properly: part1 then part0)
        part0, part1 = bytes(code[first:second]), bytes(code[second:-2])
        swapped = bytes(code[:first]) + part1 + part0 + code[-2:]
        with pytest.raises(ValueError, match="part"):
            decode_j2k(swapped)


class TestSignedComponents:
    """Signed samples (Ssiz sign bit, A.5.1): the DC level shift is
    skipped in both directions — the signed-pixel medical layout (CT
    Hounsfield-style int16)."""

    def test_int16_roundtrip_and_projection(self):
        rng = np.random.RandomState(21)
        x = rng.randint(-32768, 32768, (40, 56)).astype(np.int16)
        code = encode_j2k(x, signed=True)
        assert np.array_equal(decode_j2k(code, deep=True), x)
        # seam projection: shift to unsigned, then top 8 bits
        want = ((x.astype(np.int64) + 32768) >> 8).astype(np.uint8)
        assert np.array_equal(decode_j2k(code), want)
        # SIZ signals Ssiz = (P-1) | 0x80
        i = code.index(struct.pack(">H", 0xFF51))
        assert code[i + 40] == 0x8F

    def test_int8_and_hounsfield_12bit(self):
        rng = np.random.RandomState(22)
        x8 = rng.randint(-128, 128, (24, 31)).astype(np.int8)
        code = encode_j2k(x8, signed=True)
        got = decode_j2k(code, deep=True)
        assert got.dtype == np.int8 and np.array_equal(got, x8)
        assert np.array_equal(
            decode_j2k(code), (x8.astype(np.int16) + 128).astype(np.uint8)
        )
        # 12-bit signed (CT Hounsfield range lives in [-1024, 3071])
        hu = rng.randint(-1024, 2048, (33, 47)).astype(np.int16)
        code = encode_j2k(hu, signed=True, precision=12)
        assert np.array_equal(decode_j2k(code, deep=True), hu)
        want = ((hu.astype(np.int64) + 2048) >> 4).astype(np.uint8)
        assert np.array_equal(decode_j2k(code), want)

    def test_composes_with_tiles_layers_97_and_container(self):
        rng = np.random.RandomState(23)
        x = rng.randint(-2048, 2048, (70, 90)).astype(np.int16)
        code = encode_j2k(x, signed=True, precision=12, tile_size=48, layers=3)
        assert np.array_equal(decode_j2k(code, deep=True), x)
        # irreversible 9/7: error bounded as on the unsigned path
        code = encode_j2k(x, signed=True, precision=12, irreversible=True)
        got = decode_j2k(code, deep=True).astype(np.int64)
        assert got.dtype != np.uint16
        assert np.abs(got - x.astype(np.int64)).max() <= 24
        # JP2 box container: ihdr BPC carries the sign bit
        jp2 = encode_jp2(x, signed=True, precision=12)
        assert np.array_equal(decode_jp2(jp2, deep=True), x)
        ih = jp2.index(b"ihdr")
        assert jp2[ih + 4 + 10] == 0x8B  # (12-1) | 0x80

    def test_signed_rgb(self):
        rng = np.random.RandomState(24)
        x = rng.randint(-128, 128, (30, 30, 3)).astype(np.int8)
        code = encode_j2k(x, signed=True)
        assert np.array_equal(decode_j2k(code, deep=True), x)

    def test_guards(self):
        x = np.zeros((8, 8), dtype=np.int16)
        with pytest.raises(ValueError, match="int8 or int16"):
            encode_j2k(np.zeros((8, 8), dtype=np.uint8), signed=True)
        with pytest.raises(ValueError, match="signed"):
            encode_j2k(np.full((8, 8), -2049, dtype=np.int16), signed=True,
                       precision=12)
        with pytest.raises(ValueError, match="signed"):
            encode_j2k(np.full((8, 8), 2048, dtype=np.int16), signed=True,
                       precision=12)
        # mixed-sign components fail loudly
        code = bytearray(encode_j2k(np.zeros((8, 8, 3), dtype=np.int8),
                                    signed=True))
        i = code.index(struct.pack(">H", 0xFF51))
        code[i + 40] &= 0x7F  # clear component 0's sign bit only
        with pytest.raises(NotImplementedError, match="mixed"):
            decode_j2k(bytes(code))


class TestCodeBlockStyles:
    """Code-block styles (Table A.23): selective MQ bypass with raw
    bit-stuffed SPP/MRP segments from pass 10 (D.6), per-pass
    termination, context reset on pass boundaries, vertically-causal
    context formation (D.7.2), and segmentation symbols (D.5) — each
    an exact-roundtrip twin, composing with every other layout at one
    quality layer."""

    def test_each_style_roundtrips(self):
        img = render_page("7_m2")
        for kw in (
            {"bypass": True}, {"termall": True}, {"reset": True},
            {"causal": True}, {"segsym": True},
        ):
            code = encode_j2k(img, **kw)
            assert np.array_equal(decode_j2k(code), img), kw
            # COD byte 8 signals the style bit
            i = code.index(struct.pack(">H", 0xFF52))
            assert code[i + 12] != 0, kw

    def test_all_styles_combined(self):
        img = render_page("12_m0")
        code = encode_j2k(
            img, bypass=True, reset=True, termall=True, causal=True,
            segsym=True,
        )
        assert np.array_equal(decode_j2k(code), img)
        i = code.index(struct.pack(">H", 0xFF52))
        assert code[i + 12] == 0x2F

    def test_composes_with_other_layouts(self):
        img = render_page("7_m2")
        rng = np.random.RandomState(9)
        deep = rng.randint(0, 4096, (70, 90)).astype(np.uint16)
        sgn = rng.randint(-2048, 2048, (70, 90)).astype(np.int16)
        rgb = np.stack([img, np.roll(img, 3, 0), np.roll(img, 5, 1)], axis=-1)
        cases = [
            (dict(tile_size=64, bypass=True, segsym=True), img, False),
            (dict(precinct=7, termall=True, causal=True), img, False),
            (dict(prog="cprl", bypass=True, reset=True), img, False),
            (dict(prog="rpcl", termall=True), img, False),
            (dict(tile_size=96, tile_parts=3, bypass=True), img, False),
            (dict(bypass=True, causal=True, segsym=True), rgb, False),
            (dict(precision=12, bypass=True, termall=True), deep, True),
            (dict(signed=True, precision=12, bypass=True, causal=True),
             sgn, True),
            (dict(sop=True, eph=True, bypass=True, segsym=True), img, False),
        ]
        for kw, x, dp in cases:
            assert np.array_equal(decode_j2k(encode_j2k(x, **kw), deep=dp), x), kw

    def test_97_error_bounded_with_styles(self):
        img = render_page("3_m1")
        code = encode_j2k(
            img, irreversible=True, bypass=True, termall=True, segsym=True
        )
        got = decode_j2k(code).astype(np.int64)
        assert np.abs(got - img.astype(np.int64)).max() <= 8

    def test_bypass_emits_multiple_segments(self):
        # a deep random block guarantees > 4 bit-planes, so raw
        # segments exist and the stream grows vs the MQ-only twin
        rng = np.random.RandomState(10)
        x = rng.randint(0, 65536, (64, 64)).astype(np.uint16)
        plain = encode_j2k(x, levels=0)
        lazy = encode_j2k(x, levels=0, bypass=True)
        assert len(lazy) != len(plain)
        assert np.array_equal(decode_j2k(lazy, deep=True), x)

    def test_segsym_detects_corruption(self):
        # flip a bit deep inside the codeword payload: the 1010 check
        # fails loudly instead of decoding garbage
        img = render_page("5_m1")
        code = bytearray(encode_j2k(img, segsym=True))
        sod = code.index(struct.pack(">H", 0xFF93))
        hits = 0
        for off in range(60, 200, 7):
            bad = bytearray(code)
            bad[sod + 2 + off] ^= 0x10
            try:
                got = decode_j2k(bytes(bad))
                if not np.array_equal(got, img):
                    hits += 0  # undetected but wrong — segsym is per-CUP only
            except (ValueError, NotImplementedError):
                hits += 1
        assert hits > 0  # at least some corruptions are caught by 1010

    def test_guards(self):
        img = render_page("40_m0")
        # predictable termination (0x10) and reserved bits stay out of
        # scope
        code = bytearray(encode_j2k(img, bypass=True))
        i = code.index(struct.pack(">H", 0xFF52))
        bad = bytearray(code)
        bad[i + 12] = 0x10
        with pytest.raises(NotImplementedError, match="style"):
            decode_j2k(bytes(bad))
        bad = bytearray(code)
        bad[i + 12] = 0x40
        with pytest.raises(NotImplementedError, match="style"):
            decode_j2k(bytes(bad))


class TestCodeBlockSizes:
    """General code-block geometry (A.6.1): any power-of-two (h, w)
    with sides 4..1024 and log2-area <= 12 — the 32x32 digital-cinema
    layout, rectangular low-latency blocks — and, with it, precincts
    down to 2x the block side."""

    def test_sizes_roundtrip_and_signal(self):
        img = render_page("7_m2")
        base = encode_j2k(img)
        assert encode_j2k(img, cblk=64) == base  # default unchanged
        for cblk in (32, 16, 4, (64, 32), (16, 128), (4, 1024)):
            code = encode_j2k(img, cblk=cblk)
            assert np.array_equal(decode_j2k(code), img), cblk
            ch, cw = (cblk, cblk) if isinstance(cblk, int) else cblk
            i = code.index(struct.pack(">H", 0xFF52))
            assert code[i + 10] == cw.bit_length() - 3  # xcb - 2
            assert code[i + 11] == ch.bit_length() - 3  # ycb - 2

    def test_composes_with_tiles_styles_precincts_layers(self):
        img = render_page("12_m0")
        cases = [
            dict(cblk=32, tile_size=64, bypass=True, segsym=True),
            dict(cblk=32, precinct=6, termall=True),
            dict(cblk=(16, 32), layers=4, prog="rpcl"),
            dict(cblk=16, precinct=5, causal=True),  # 32px precincts
        ]
        for kw in cases:
            assert np.array_equal(decode_j2k(encode_j2k(img, **kw)), img), kw
        code = encode_j2k(img, cblk=32, irreversible=True)
        got = decode_j2k(code).astype(np.int64)
        assert np.abs(got - img.astype(np.int64)).max() <= 8

    def test_guards(self):
        img = render_page("40_m0")
        for bad in (48, 3, 2048, (64, 128), 128):  # 128x128 breaks area bound
            with pytest.raises(ValueError, match="code-block"):
                encode_j2k(img, cblk=bad)
        with pytest.raises(ValueError, match="precinct"):
            encode_j2k(img, cblk=32, precinct=5)  # precinct < block grid
        # decode guard: illegal SPcod exponents fail loudly
        code = bytearray(encode_j2k(img, cblk=(4, 1024)))
        i = code.index(struct.pack(">H", 0xFF52))
        code[i + 11] = 2  # ycb 4 -> 16: area bound now violated
        with pytest.raises(ValueError, match="exponent"):
            decode_j2k(bytes(code))


class TestPositionalPrecincts:
    """Precinct partitions in the position-major progression orders
    (A.6.3 RPCL / PCRL / CPRL): positions step the finest projected
    precinct grid; a resolution's packet is emitted where the position
    is its own projected precinct corner — the streamed region-access
    interleaving. Encoder and decoder walk the SAME _packet_sequence."""

    def test_all_five_orders_with_precincts(self):
        img = render_page("7_m2")
        big = np.tile(img, (2, 2))
        for prog in ("lrcp", "rlcp", "rpcl", "pcrl", "cprl"):
            for kw in ({}, {"layers": 3}, {"tile_size": 160},
                       {"bypass": True, "termall": True}):
                code = encode_j2k(big, prog=prog, precinct=7, **kw)
                assert np.array_equal(decode_j2k(code), big), (prog, kw)

    def test_positional_rgb_and_small_grids(self):
        img = render_page("12_m0")
        rgb = np.stack([img, np.roll(img, 3, 0), np.roll(img, 5, 1)], axis=-1)
        for prog in ("rpcl", "pcrl", "cprl"):
            code = encode_j2k(rgb, prog=prog, precinct=7, layers=2)
            assert np.array_equal(decode_j2k(code), rgb), prog
        big = np.tile(img, (2, 2))
        code = encode_j2k(big, prog="pcrl", precinct=6, cblk=32)
        assert np.array_equal(decode_j2k(code), big)

    def test_order_signalled_and_streams_differ(self):
        # the five orders write genuinely different byte streams over
        # a multi-precinct grid yet all decode to the same image
        img = np.tile(render_page("7_m2"), (2, 2))
        streams = {}
        for prog in ("lrcp", "rlcp", "rpcl", "pcrl", "cprl"):
            code = encode_j2k(img, prog=prog, precinct=7, layers=2)
            i = code.index(struct.pack(">H", 0xFF52))
            assert code[i + 5] == ("lrcp", "rlcp", "rpcl", "pcrl", "cprl").index(prog)
            streams[prog] = code
        assert len({len(s) for s in streams.values()}) > 1 or len(
            set(streams.values())
        ) == 5


class TestQuantizationOverrides:
    """Main-header QCC and per-tile QCD/QCC (A.6.4/A.6.5): the
    coarser-chroma layout real colour encoders emit and the
    region-of-interest per-tile override geospatial encoders use,
    honoring the precedence chain tile-QCC > tile-QCD > main-QCC >
    main-QCD."""

    def _rgb(self):
        img = render_page("12_m0")
        return np.stack([img, np.roll(img, 3, 0), np.roll(img, 5, 1)], axis=-1)

    def test_chroma_qcc_roundtrip_and_signalling(self):
        rgb = self._rgb()
        code = encode_j2k(rgb, irreversible=True, chroma_delta=2.0)
        # one QCC marker segment per chroma component
        assert code.count(struct.pack(">H", 0xFF5D)) == 2
        err = np.abs(decode_j2k(code).astype(int) - rgb.astype(int))
        assert err.max() <= 16  # coarse chroma step through the ICT
        # a finer chroma step must not decode worse
        fine = decode_j2k(encode_j2k(rgb, irreversible=True, chroma_delta=0.25))
        assert np.abs(fine.astype(int) - rgb.astype(int)).max() <= err.max()

    def test_qcc_composes_with_derived_layers_and_container(self):
        rgb = self._rgb()
        code = encode_jp2(
            rgb, irreversible=True, derived=True, chroma_delta=1.0,
            layers=3, prog="cprl",
        )
        err = np.abs(decode_jp2(code).astype(int) - rgb.astype(int))
        assert err.max() <= 16

    def test_tile_qcd_override(self):
        img = np.tile(render_page("7_m2"), (2, 2))
        base = encode_j2k(img, irreversible=True, tile_size=160)
        code = encode_j2k(
            img, irreversible=True, tile_size=160, tile_quant={0: 2.0, 3: 0.125}
        )
        assert code != base
        # main QCD + two tile QCDs, each in its tile's first part
        assert code.count(struct.pack(">H", 0xFF5C)) == 3
        err = np.abs(decode_j2k(code).astype(int) - img.astype(int))
        assert err.max() <= 8

    def test_tile_qcd_takes_precedence_over_main_qcc(self):
        # A.6.4/A.6.5: a tile QCD covers every component of its tile,
        # even ones the MAIN header names in a QCC — so spelling the
        # chroma step out in tile QCCs must decode identically
        rgb = self._rgb()
        a = encode_j2k(
            rgb, irreversible=True, tile_size=96, chroma_delta=4.0,
            tile_quant={0: 0.125},
        )
        b = encode_j2k(
            rgb, irreversible=True, tile_size=96, chroma_delta=4.0,
            tile_quant={0: (0.125, 0.125)},
        )
        assert a != b  # b carries two extra tile QCC segments
        assert np.array_equal(decode_j2k(a), decode_j2k(b))

    def test_tile_qcc_tuple(self):
        rgb = self._rgb()
        code = encode_j2k(
            rgb, irreversible=True, tile_size=96, tile_quant={0: (1.0, 4.0)}
        )
        assert code.count(struct.pack(">H", 0xFF5D)) == 2  # tile QCCs only
        err = np.abs(decode_j2k(code).astype(int) - rgb.astype(int))
        assert err.max() <= 24

    def test_composes_with_styles_precincts_and_tile_parts(self):
        img = np.tile(render_page("7_m2"), (2, 2))
        code = encode_j2k(
            img, irreversible=True, tile_size=160, precinct=7,
            bypass=True, termall=True, tile_parts=2, tile_quant={1: 1.0},
        )
        err = np.abs(decode_j2k(code).astype(int) - img.astype(int))
        assert err.max() <= 8
        code = encode_j2k(
            img, irreversible=True, tile_size=160, layers=3, prog="rpcl",
            precinct=7, tile_quant={0: 1.0, 2: (2.0 ** -2)},
        )
        err = np.abs(decode_j2k(code).astype(int) - img.astype(int))
        assert err.max() <= 8

    def test_guards(self):
        img = render_page("7_m2")
        rgb = self._rgb()
        with pytest.raises(ValueError, match="irreversible path"):
            encode_j2k(rgb, chroma_delta=2.0)
        with pytest.raises(ValueError, match="3 colour components"):
            encode_j2k(img, irreversible=True, chroma_delta=2.0)
        with pytest.raises(ValueError, match="irreversible path"):
            encode_j2k(img, tile_size=96, tile_quant={0: 1.0})
        with pytest.raises(ValueError, match="tile grid"):
            encode_j2k(img, irreversible=True, tile_quant={0: 1.0})
        with pytest.raises(ValueError, match="outside"):
            encode_j2k(
                img, irreversible=True, tile_size=96, tile_quant={99: 1.0}
            )
        with pytest.raises(ValueError, match="3 colour components"):
            encode_j2k(
                img, irreversible=True, tile_size=96, tile_quant={0: (1.0, 2.0)}
            )

    def test_decode_rejects_qcc_for_missing_component(self):
        rgb = self._rgb()
        code = bytearray(encode_j2k(rgb, irreversible=True, chroma_delta=2.0))
        i = code.index(struct.pack(">H", 0xFF5D))
        code[i + 4] = 7  # Cqcc names component 7 of 3
        with pytest.raises(ValueError, match="names component"):
            decode_j2k(bytes(code))


class TestStyledMultiLayer:
    """Code-block styles composed with multiple quality layers: a
    styled block's codeword segments split across layer contributions
    (one length field per segment portion, B.10.7.5) and the decoder
    reassembles the portions before Tier-1 decoding."""

    def _rgb(self):
        img = render_page("12_m0")
        return np.stack([img, np.roll(img, 3, 0), np.roll(img, 5, 1)], axis=-1)

    def test_each_style_roundtrips_across_layer_counts(self):
        img = render_page("7_m2")
        for kw in (
            {"bypass": True}, {"termall": True}, {"reset": True},
            {"causal": True}, {"segsym": True},
        ):
            for layers in (2, 4, 7):
                code = encode_j2k(img, layers=layers, **kw)
                assert np.array_equal(decode_j2k(code), img), (kw, layers)
                # COD signals both the layer count and the style bit
                i = code.index(struct.pack(">H", 0xFF52))
                assert struct.unpack(">H", code[i + 6 : i + 8])[0] == layers
                assert code[i + 12] != 0, kw

    def test_all_styles_all_layers(self):
        img = render_page("12_m0")
        code = encode_j2k(
            img, layers=5, bypass=True, reset=True, termall=True,
            causal=True, segsym=True,
        )
        assert np.array_equal(decode_j2k(code), img)

    def test_bypass_segments_span_layer_boundaries(self):
        # a deep random block guarantees raw segments long enough that
        # the 6-layer split cuts INSIDE a segment — the continuation
        # pieces must reassemble bit-exactly
        rng = np.random.RandomState(10)
        x = rng.randint(0, 65536, (64, 64)).astype(np.uint16)
        code = encode_j2k(x, levels=0, bypass=True, layers=6)
        assert np.array_equal(decode_j2k(code, deep=True), x)
        # more layers than coding passes: trailing layers contribute
        # empty packets
        code = encode_j2k(x, levels=0, termall=True, layers=8)
        assert np.array_equal(decode_j2k(code, deep=True), x)

    def test_composes_with_other_layouts(self):
        img = render_page("7_m2")
        rgb = self._rgb()
        big = np.tile(render_page("7_m2"), (2, 2))
        cases = [
            (dict(tile_size=64, layers=3, bypass=True, segsym=True), img),
            (dict(precinct=7, layers=2, termall=True, causal=True), img),
            (dict(prog="cprl", layers=4, bypass=True, reset=True), img),
            (dict(prog="rpcl", precinct=7, layers=3, termall=True), img),
            (dict(tile_size=96, tile_parts=3, layers=2, bypass=True), img),
            (dict(layers=3, bypass=True, causal=True, segsym=True), rgb),
            (dict(sop=True, eph=True, layers=2, bypass=True), img),
            (dict(tile_size=160, prog="pcrl", precinct=7, layers=3,
                  bypass=True, termall=True, tile_parts=2), big),
        ]
        for kw, x in cases:
            assert np.array_equal(decode_j2k(encode_j2k(x, **kw)), x), kw

    def test_97_error_bounded_with_styles_and_layers(self):
        rgb = self._rgb()
        code = encode_jp2(
            rgb, irreversible=True, derived=True, layers=3, prog="cprl",
            reset=True, causal=True, segsym=True,
        )
        err = np.abs(decode_jp2(code).astype(int) - rgb.astype(int))
        assert err.max() <= 16
        code = encode_j2k(
            rgb, irreversible=True, layers=4, bypass=True, segsym=True,
            chroma_delta=1.0,
        )
        err = np.abs(decode_j2k(code).astype(int) - rgb.astype(int))
        assert err.max() <= 16

    def test_late_inclusion_with_styles(self):
        # blocks first included in a later layer (first = zbp % layers)
        # must still partition their segments from absolute pass 0
        img = render_page("3_m1")
        for layers in (3, 6):
            code = encode_j2k(img, layers=layers, bypass=True, termall=True)
            assert np.array_equal(decode_j2k(code), img), layers

    def test_segsym_still_detects_corruption(self):
        img = render_page("5_m1")
        code = bytearray(encode_j2k(img, segsym=True, layers=3))
        sod = code.index(struct.pack(">H", 0xFF93))
        hits = 0
        for off in range(60, 200, 7):
            bad = bytearray(code)
            bad[sod + 2 + off] ^= 0x10
            try:
                got = decode_j2k(bytes(bad))
                if not np.array_equal(got, img):
                    hits += 0
            except (ValueError, NotImplementedError):
                hits += 1
        assert hits > 0


class TestNonUniformPrecincts:
    """Per-resolution and rectangular precinct sizes (B.6: one
    (PPy, PPx) pair per resolution in COD) — the shrinking-pyramid
    layout archival encoders signal by default (e.g. Kakadu's
    Cprecincts), composed with every progression order."""

    def _big(self):
        return np.tile(render_page("7_m2"), (2, 2))

    def test_per_resolution_sizes_all_progressions(self):
        big = self._big()
        for prec in ([7, 8], [8, 7, 7], [(7, 8), (8, 7)]):
            for prog in ("lrcp", "rlcp", "rpcl", "pcrl", "cprl"):
                code = encode_j2k(big, levels=2, precinct=prec, prog=prog)
                assert np.array_equal(decode_j2k(code), big), (prec, prog)

    def test_cod_signals_per_resolution_bytes(self):
        big = self._big()
        code = encode_j2k(big, levels=2, precinct=[7, (8, 7), 9])
        i = code.index(struct.pack(">H", 0xFF52))
        # SPcod precinct bytes: PPx low nibble, PPy high nibble,
        # ordered from resolution 0 (deepest LL) up
        assert code[i + 14 : i + 17] == bytes([0x77, 0x87, 0x99])

    def test_short_list_repeats_last_entry(self):
        big = self._big()
        a = encode_j2k(big, levels=3, precinct=[7, 8])
        b = encode_j2k(big, levels=3, precinct=[7, 8, 8, 8])
        assert a == b
        assert np.array_equal(decode_j2k(a), big)

    def test_uniform_int_unchanged(self):
        img = render_page("12_m0")
        a = encode_j2k(img, precinct=7)
        b = encode_j2k(img, precinct=[7, 7])
        assert a == b  # int exponent is the uniform-square shorthand

    def test_composes_with_other_layouts(self):
        big = self._big()
        img = render_page("12_m0")
        rgb = np.stack([img, np.roll(img, 3, 0), np.roll(img, 5, 1)], axis=-1)
        code = encode_j2k(
            big, tile_size=160, levels=2, precinct=[(7, 8), (8, 7), (7, 7)],
            prog="rpcl", bypass=True, layers=3, tile_parts=2, cblk=(32, 64),
        )
        assert np.array_equal(decode_j2k(code), big)
        code = encode_jp2(
            rgb, irreversible=True, precinct=[7, 8], prog="pcrl",
            segsym=True, layers=2, sop=True, eph=True,
        )
        err = np.abs(decode_jp2(code).astype(int) - rgb.astype(int))
        assert err.max() <= 8

    def test_guards(self):
        img = render_page("12_m0")
        # band-side precinct must cover the code-block grid at every
        # resolution (2^(PP-1) above resolution 0)
        with pytest.raises(ValueError, match="resolution 1"):
            encode_j2k(img, precinct=[6], cblk=64)
        with pytest.raises(ValueError, match="resolution 0"):
            encode_j2k(img, precinct=[(5, 7), 8], cblk=64)
        with pytest.raises(ValueError, match="empty"):
            encode_j2k(img, precinct=[])
        with pytest.raises(ValueError, match="entries"):
            encode_j2k(img, levels=1, precinct=[7, 7, 7])
        # decode guard: a sub-block precinct byte must fail loudly
        code = bytearray(encode_j2k(img, precinct=7, cblk=64))
        i = code.index(struct.pack(">H", 0xFF52))
        code[i + 15] = 0x66  # 2^(6-1)=32 < 64 block at resolution 1
        with pytest.raises(NotImplementedError, match="smaller than"):
            decode_j2k(bytes(code))


class TestSubsampledComponents:
    """XRsiz/YRsiz chroma separation — the lossy archival 4:2:0/4:2:2
    layouts. Closed-form model: forward RCT, decimate chroma,
    replicate back, inverse RCT (sample-and-hold is the decoder's
    documented upsampling)."""

    @staticmethod
    def _model(img, yr, xr):
        r, g, b = (img[..., i].astype(np.int64) - 128 for i in range(3))
        y = (r + 2 * g + b) >> 2
        u, v = b - g, r - g
        h, w = img.shape[:2]
        u = u[::yr, ::xr].repeat(yr, 0).repeat(xr, 1)[:h, :w]
        v = v[::yr, ::xr].repeat(yr, 0).repeat(xr, 1)[:h, :w]
        g2 = y - ((u + v) >> 2)
        out = np.stack([v + g2, g2, u + g2], -1) + 128
        return np.clip(out, 0, 255).astype(np.uint8)

    @pytest.fixture(scope="class")
    def img(self):
        return np.random.default_rng(7).integers(0, 256, (21, 34, 3)).astype(np.uint8)

    def test_all_factor_pairs_match_model_exactly(self, img):
        for yr, xr in ((2, 2), (1, 2), (2, 1), (4, 2), (4, 4)):
            out = decode_j2k(encode_j2k(img, subsampling=(yr, xr)))
            assert (out == self._model(img, yr, xr)).all(), (yr, xr)
            # reference-grid-sampled positions are bit-exact
            assert (out[::yr, ::xr] == img[::yr, ::xr]).all(), (yr, xr)

    def test_tiled_and_edge_tiles(self, img):
        # 21x34 with 16px tiles: clipped edge tiles exercise the
        # per-component ceil-divided tile bounds
        out = decode_j2k(encode_j2k(img, subsampling=(2, 2), tile_size=16))
        assert (out == self._model(img, 2, 2)).all()

    def test_composes_with_layers_styles_progressions(self, img):
        want = self._model(img, 2, 2)
        for kw in (
            dict(layers=3),
            dict(bypass=True, segsym=True),
            dict(prog="pcrl"),
            dict(prog="cprl", tile_size=16),
            dict(tile_parts=2, tile_size=16),
            dict(sop=True, eph=True),
            dict(levels=0),
            dict(levels=4),
        ):
            out = decode_j2k(encode_j2k(img, subsampling=(2, 2), **kw))
            assert (out == want).all(), kw

    def test_irreversible_420_sampled_positions_close(self, img):
        out = decode_jp2(encode_jp2(img, irreversible=True, subsampling=(2, 2)))
        err = np.abs(
            out[::2, ::2].astype(np.int64) - img[::2, ::2].astype(np.int64)
        )
        assert err.max() <= 2  # 9/7+ICT rounding at co-sited samples

    def test_real_page_via_container(self):
        page = render_page("33_m0")
        rgb = np.stack([page] * 3, axis=-1)
        out = decode_jp2(encode_jp2(rgb, subsampling=(2, 2)))
        # grey pages have zero chroma: subsampling loses nothing
        assert (out == rgb).all()

    def test_guards(self, img):
        with pytest.raises(NotImplementedError, match="precincts with subsampled"):
            encode_j2k(img, subsampling=(2, 2), precinct=7)
        with pytest.raises(ValueError, match="multiple of the subsampling"):
            encode_j2k(img, subsampling=(2, 2), tile_size=17)
        with pytest.raises(ValueError, match="3-component"):
            encode_j2k(img[..., 0], subsampling=(2, 2))
        with pytest.raises(ValueError, match="factors must be 1/2/4"):
            encode_j2k(img, subsampling=(3, 2))
        # decoder-side guard: a precinct stream whose SIZ claims
        # subsampling must refuse rather than misparse every packet
        data = bytearray(encode_j2k(img, precinct=7))
        assert data[46] == 1  # comp 1 XRsiz
        data[46] = 2
        with pytest.raises(NotImplementedError, match="precincts with subsampled"):
            decode_j2k(bytes(data))
        # (1, 1) is a no-op, byte-identical to the unsubsampled stream
        assert encode_j2k(img, subsampling=(1, 1)) == encode_j2k(img)


class TestOffsetGrids:
    """Nonzero XOsiz/YOsiz in the crop layout (tile anchor at the
    region origin, lattice-aligned): decode by exact translation."""

    @pytest.fixture(scope="class")
    def img(self):
        return np.random.default_rng(13).integers(0, 256, (19, 27, 3)).astype(np.uint8)

    def test_offset_equals_unoffset_across_flavors(self, img):
        g = img[..., 0]
        for base, kw in (
            (g, dict()),
            (img, dict(levels=3)),
            (img, dict(tile_size=16)),
            (img, dict(subsampling=(2, 2))),
            (img, dict(subsampling=(2, 2), tile_size=16, layers=2)),
            (img, dict(irreversible=True, prog="cprl")),
            (g, dict(bypass=True, segsym=True, tile_parts=2, tile_size=16)),
        ):
            lv = kw.get("levels", 2)
            ss = kw.get("subsampling", (1, 1))
            origin = ((ss[0] << lv) * 3, (ss[1] << lv) * 5)
            a = decode_j2k(encode_j2k(base, origin=origin, **kw))
            b = decode_j2k(encode_j2k(base, **kw))
            assert (a == b).all(), kw
        # container twin
        a = decode_jp2(encode_jp2(g, origin=(8, 4)))
        assert (a == decode_jp2(encode_jp2(g))).all()

    def test_siz_words_really_written(self, img):
        data = encode_j2k(img[..., 0], origin=(8, 12))
        # SIZ body starts at byte 6: Rsiz(2) Xsiz(4) Ysiz(4) XO YO XT YT XTO YTO
        xs, ys, xo, yo = struct.unpack(">IIII", data[8:24])
        xto, yto = struct.unpack(">II", data[32:40])
        assert (xo, yo) == (12, 8) and (xto, yto) == (12, 8)
        assert xs == 12 + img.shape[1] and ys == 8 + img.shape[0]

    def test_guards(self, img):
        g = img[..., 0]
        with pytest.raises(ValueError, match="lattice"):
            encode_j2k(g, origin=(2, 0))  # levels=2 → unit 4
        with pytest.raises(ValueError, match=">= 0"):
            encode_j2k(g, origin=(-4, 0))
        # decoder: tile anchor off the region origin
        data = bytearray(encode_j2k(g, origin=(8, 4)))
        struct.pack_into(">II", data, 32, 0, 0)  # XTOsiz/YTOsiz = 0
        with pytest.raises(NotImplementedError, match="tile anchor"):
            decode_j2k(bytes(data))
        # decoder: lattice-misaligned origin (patch XOsiz+XTOsiz to 2)
        data = bytearray(encode_j2k(g, origin=(8, 4)))
        struct.pack_into(">I", data, 16, 2)
        struct.pack_into(">I", data, 32, 2)
        with pytest.raises(NotImplementedError, match="misaligned"):
            decode_j2k(bytes(data))
        # decoder: offsets >= image size = empty region, malformed
        data = bytearray(encode_j2k(g, origin=(8, 4)))
        struct.pack_into(">I", data, 16, 4 + g.shape[1])
        with pytest.raises(ValueError, match="empty region"):
            decode_j2k(bytes(data))
