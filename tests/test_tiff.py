"""TIFF codec (functions/tiff.py): the archival scanned-document
container — strips, both byte orders, LZW/PackBits, predictor,
bilevel fax polarity, palette, multi-page IFD chains."""

import struct

import numpy as np
import pytest

from oar_ocr_spark.functions.tiff import (
    _read_ifd,
    decode_tiff,
    decode_tiff_pages,
    encode_tiff,
)


def _rng():
    return np.random.default_rng(5)


class TestRoundtrip:
    def test_grey_rgb_all_compressions_and_strips(self):
        rng = _rng()
        g = rng.integers(0, 256, (17, 23)).astype(np.uint8)
        c = rng.integers(0, 256, (9, 7, 3)).astype(np.uint8)
        for img in (g, c):
            for comp in ("none", "packbits", "deflate"):
                for rps in (None, 4):
                    out = decode_tiff(
                        encode_tiff(img, compression=comp, rows_per_strip=rps)
                    )
                    assert (out == img).all(), (img.shape, comp, rps)

    def test_bilevel_both_polarities(self):
        # 1-bit scanned-fax layout; photometric 0 (WhiteIsZero) is the
        # fax default and must invert
        rng = _rng()
        b = (rng.integers(0, 2, (13, 30)) * 255).astype(np.uint8)
        assert (decode_tiff(encode_tiff(b, bilevel=True)) == b).all()
        assert (
            decode_tiff(encode_tiff(b, bilevel=True, photometric_zero_is_white=True))
            == b
        ).all()

    def test_deterministic(self):
        g = _rng().integers(0, 256, (5, 6)).astype(np.uint8)
        assert encode_tiff(g) == encode_tiff(g)

    def test_ccitt_fax_all_modes_polarities_strips(self):
        # compressions 2 (MH) / 3 (G3 2D) / 4 (G4 MMR), both
        # photometric polarities, strip-independent coding
        img = (_rng().integers(0, 2, (37, 83)) * 255).astype(np.uint8)
        for comp in ("mh", "g3", "g4"):
            for pzw in (False, True):
                for rps in (None, 10):
                    out = decode_tiff(
                        encode_tiff(
                            img,
                            compression=comp,
                            bilevel=True,
                            photometric_zero_is_white=pzw,
                            rows_per_strip=rps,
                        )
                    )
                    assert (out == img).all(), (comp, pzw, rps)

    def test_ccitt_fill_order_2(self):
        # LSB-first fax bytes from old scanner hardware: FillOrder 2
        # must bit-reverse each byte before the MSB-first reader
        img = (_rng().integers(0, 2, (12, 40)) * 255).astype(np.uint8)
        data = encode_tiff(img, compression="g4", bilevel=True, fill_order=2)
        assert (decode_tiff(data) == img).all()
        # and the tag is really written: flipping it off breaks decode
        plain = encode_tiff(img, compression="g4", bilevel=True)
        assert data != plain

    def test_ccitt_requires_bilevel(self):
        g = _rng().integers(0, 256, (6, 6)).astype(np.uint8)
        with pytest.raises(ValueError):
            encode_tiff(g, compression="g4")


def _ifd_le(tags, strips, extra=b""):
    """Hand-build a little-endian single-IFD TIFF for foreign layouts."""
    out = bytearray(b"II*\x00" + struct.pack("<I", 8))
    n = len(tags)
    ifd_size = 2 + 12 * n + 4
    extra_at = 8 + ifd_size
    blob = bytearray(extra)
    fixed = []
    for t, typ, count, val in sorted(tags):
        if len(val) <= 4:
            fixed.append((t, typ, count, val.ljust(4, b"\x00")))
        else:
            fixed.append((t, typ, count, struct.pack("<I", extra_at + len(blob))))
            blob += val
    strips_at = extra_at + len(blob)
    out += struct.pack("<H", n)
    for t, typ, count, val in fixed:
        out += struct.pack("<HHI", t, typ, count) + val
    out += struct.pack("<I", 0)
    out += blob
    for s in strips:
        out += s
    return bytes(out), strips_at


class TestForeignLayouts:
    def test_lzw_with_predictor(self):
        # the classic scanner combo: LZW + horizontal differencing
        rng = _rng()
        img = rng.integers(0, 256, (6, 10)).astype(np.uint8)
        diff = img.astype(np.int16)
        diff[:, 1:] = (img[:, 1:].astype(np.int16) - img[:, :-1]) % 256
        raw = diff.astype(np.uint8).tobytes()
        # test-side MSB-first LZW encoder (shared scheme with PDF)
        table = {bytes([i]): i for i in range(256)}
        nxt, width = 258, 9
        codes = [(256, 9)]
        wbuf = raw[:1]
        for byte in raw[1:]:
            t = wbuf + bytes([byte])
            if t in table:
                wbuf = t
            else:
                codes.append((table[wbuf], width))
                table[t] = nxt
                nxt += 1
                if nxt + 1 >= (1 << width):
                    width += 1
                wbuf = bytes([byte])
        codes.append((table[wbuf], width))
        codes.append((257, width))
        acc = nbits = 0
        enc = bytearray()
        for c, wdt in codes:
            acc = (acc << wdt) | c
            nbits += wdt
            while nbits >= 8:
                enc.append((acc >> (nbits - 8)) & 0xFF)
                nbits -= 8
        if nbits:
            enc.append((acc << (8 - nbits)) & 0xFF)
        strip = bytes(enc)
        tags = [
            (256, 4, 1, struct.pack("<I", 10)),
            (257, 4, 1, struct.pack("<I", 6)),
            (258, 3, 1, struct.pack("<H", 8)),
            (259, 3, 1, struct.pack("<H", 5)),  # LZW
            (262, 3, 1, struct.pack("<H", 1)),
            (273, 4, 1, None),  # patched
            (277, 3, 1, struct.pack("<H", 1)),
            (278, 4, 1, struct.pack("<I", 6)),
            (279, 4, 1, struct.pack("<I", len(strip))),
            (317, 3, 1, struct.pack("<H", 2)),  # predictor 2
        ]
        # two-pass: compute strip offset, then build
        probe = [(t, ty, c, v if v is not None else b"\x00\x00\x00\x00") for t, ty, c, v in tags]
        _, strips_at = _ifd_le(probe, [strip])
        final = [
            (t, ty, c, struct.pack("<I", strips_at) if v is None else v)
            for t, ty, c, v in tags
        ]
        data, _ = _ifd_le(final, [strip])
        assert (decode_tiff(data) == img).all()

    def test_palette_tiff(self):
        rng = _rng()
        n = 8
        cmap16 = rng.integers(0, 65536, (3, n)).astype(np.uint16)
        idx = rng.integers(0, n, (4, 5)).astype(np.uint8)
        strip = idx.tobytes()
        tags = [
            (256, 4, 1, struct.pack("<I", 5)),
            (257, 4, 1, struct.pack("<I", 4)),
            (258, 3, 1, struct.pack("<H", 8)),
            (259, 3, 1, struct.pack("<H", 1)),
            (262, 3, 1, struct.pack("<H", 3)),  # palette
            (273, 4, 1, None),
            (277, 3, 1, struct.pack("<H", 1)),
            (278, 4, 1, struct.pack("<I", 4)),
            (279, 4, 1, struct.pack("<I", len(strip))),
            (320, 3, 3 * n, cmap16.astype("<u2").tobytes()),
        ]
        probe = [(t, ty, c, v if v is not None else b"\x00\x00\x00\x00") for t, ty, c, v in tags]
        _, strips_at = _ifd_le(probe, [strip])
        final = [
            (t, ty, c, struct.pack("<I", strips_at) if v is None else v)
            for t, ty, c, v in tags
        ]
        data, _ = _ifd_le(final, [strip])
        want = (cmap16.T >> 8).astype(np.uint8)[idx]
        assert (decode_tiff(data) == want).all()

    def test_big_endian(self):
        # tiny hand-built MM file: 2x2 grey, uncompressed
        img = np.array([[1, 200], [30, 99]], dtype=np.uint8)
        strip = img.tobytes()
        out = bytearray(b"MM\x00*" + struct.pack(">I", 8))
        tags = [
            (256, 3, 1, 2), (257, 3, 1, 2), (258, 3, 1, 8), (259, 3, 1, 1),
            (262, 3, 1, 1), (273, 4, 1, None), (277, 3, 1, 1),
            (278, 4, 1, 2), (279, 4, 1, 4),
        ]
        strips_at = 8 + 2 + 12 * len(tags) + 4
        out += struct.pack(">H", len(tags))
        for t, typ, count, val in tags:
            v = strips_at if val is None else val
            if typ == 3:
                out += struct.pack(">HHIH", t, typ, count, v) + b"\x00\x00"
            else:
                out += struct.pack(">HHII", t, typ, count, v)
        out += struct.pack(">I", 0)
        out += strip
        assert (decode_tiff(bytes(out)) == img).all()

    def test_multipage_chain(self):
        # merge two single-page files: append B's bytes AFTER A's
        # (keeping B's 8-byte header as dead padding, so every absolute
        # offset inside B shifts by exactly len(A)), then point A's
        # next-IFD at B's shifted IFD
        rng = _rng()
        a = rng.integers(0, 256, (3, 4)).astype(np.uint8)
        b = rng.integers(0, 256, (2, 2)).astype(np.uint8)
        da, db = encode_tiff(a), encode_tiff(b)
        shift = len(da)
        bo = "<"
        dbb = bytearray(db)
        (ifd_b,) = struct.unpack(bo + "I", dbb[4:8])
        (nb,) = struct.unpack(bo + "H", dbb[ifd_b : ifd_b + 2])
        for k in range(nb):
            at = ifd_b + 2 + 12 * k
            tag, typ, count = struct.unpack(bo + "HHI", dbb[at : at + 8])
            size = {1: 1, 3: 2, 4: 4}[typ] * count
            if size > 4 or tag == 273:  # out-of-line data / strip offset
                (v,) = struct.unpack(bo + "I", dbb[at + 8 : at + 12])
                dbb[at + 8 : at + 12] = struct.pack(bo + "I", v + shift)
        combined = bytearray(da) + dbb
        (ifd_a,) = struct.unpack(bo + "I", combined[4:8])
        (na,) = struct.unpack(bo + "H", combined[ifd_a : ifd_a + 2])
        next_at = ifd_a + 2 + 12 * na
        combined[next_at : next_at + 4] = struct.pack(bo + "I", ifd_b + shift)
        pages = decode_tiff_pages(bytes(combined))
        assert len(pages) == 2
        assert (pages[0] == a).all() and (pages[1] == b).all()

    def test_tiled_tiff_missing_dims_fails_loudly(self):
        # TileOffsets without TileWidth is a malformed tiled file — the
        # declared ValueError, not a crash (tiled layout itself decodes;
        # see TestTiledTiff)
        data = bytearray(encode_tiff(np.zeros((2, 2), np.uint8)))
        i = data.index(struct.pack("<HHI", 273, 4, 1))
        data[i : i + 2] = struct.pack("<H", 324)  # StripOffsets -> TileOffsets
        with pytest.raises(ValueError, match="TileWidth"):
            decode_tiff(bytes(data))

    def test_decode_tiff_reads_only_first_ifd(self):
        # point the first IFD's next pointer at garbage: decode_tiff
        # (limit=1) must still return page 1
        g = _rng().integers(0, 256, (3, 3)).astype(np.uint8)
        data = bytearray(encode_tiff(g))
        (ifd_at,) = struct.unpack("<I", data[4:8])
        (n,) = struct.unpack("<H", data[ifd_at : ifd_at + 2])
        next_at = ifd_at + 2 + 12 * n
        data[next_at : next_at + 4] = struct.pack("<I", len(data) - 2)
        assert (decode_tiff(bytes(data)) == g).all()

    def test_declared_unsupported(self):
        g = np.zeros((2, 2), dtype=np.uint8)
        data = bytearray(encode_tiff(g))
        # patch compression tag to JBIG (9, T.85-in-TIFF) — out of scope
        i = data.index(struct.pack("<HHI", 259, 3, 1))
        data[i + 8 : i + 10] = struct.pack("<H", 9)
        with pytest.raises(NotImplementedError, match="compression 9"):
            decode_tiff(bytes(data))
        # compression 8 on a NON-zlib strip is corrupt deflate, loud
        data[i + 8 : i + 10] = struct.pack("<H", 8)
        with pytest.raises(ValueError, match="deflate"):
            decode_tiff(bytes(data))
        # CCITT (4) on 8-bit data is a malformed file, not a scope gap
        data[i + 8 : i + 10] = struct.pack("<H", 4)
        with pytest.raises(ValueError, match="1-bit"):
            decode_tiff(bytes(data))
        with pytest.raises(ValueError, match="magic"):
            decode_tiff(b"NOPE" + bytes(16))

    def test_truncated_ifd_and_tag_data_fail_loudly(self):
        # corrupt/truncated files must raise the declared ValueError,
        # never a raw struct.error from a short slice
        g = _rng().integers(0, 256, (3, 4)).astype(np.uint8)
        data = encode_tiff(g)
        # IFD offset past end of file
        bad = bytearray(data)
        bad[4:8] = struct.pack("<I", len(data) + 100)
        with pytest.raises(ValueError, match="IFD offset past end"):
            decode_tiff(bytes(bad))
        # entry table cut short
        with pytest.raises(ValueError, match="IFD entry table truncated"):
            decode_tiff(data[:20])
        # out-of-line tag data pointing past the end: a >4-byte BitsPerSample
        strip = g.tobytes()
        tags = [
            (256, 4, 1, struct.pack("<I", 4)),
            (257, 4, 1, struct.pack("<I", 3)),
            (258, 3, 3, struct.pack("<HHH", 8, 8, 8)),
            (273, 4, 1, None),
            (279, 4, 1, struct.pack("<I", len(strip))),
        ]
        built, strips_at = _ifd_le(
            [(t, ty, c, v) for t, ty, c, v in tags if v is not None]
            + [(273, 4, 1, struct.pack("<I", 0))],
            [strip],
        )
        bad = bytearray(built)
        # point the BitsPerSample out-of-line data past EOF
        i = bad.index(struct.pack("<HHI", 258, 3, 3))
        bad[i + 8 : i + 12] = struct.pack("<I", len(built) + 50)
        with pytest.raises(ValueError, match="tag data truncated"):
            decode_tiff(bytes(bad))


class TestMediaSeam:
    def test_tiff_payload_greyscales_at_seam(self):
        from oar_ocr_spark.functions.multimodal import _decode_payload

        g = _rng().integers(0, 256, (11, 9)).astype(np.uint8)
        out = _decode_payload("x", "image", encode_tiff(g))
        assert out.ndim == 2 and (out == g).all()


class TestMultipageContainer:
    """encode_tiff_multipage / decode_tiff_refs — the archival
    container write/read pair (ImageDescription carries the media_ref,
    the TIFF twin of the PDF /Info /Title contract)."""

    def test_roundtrip_pages_and_refs(self):
        from oar_ocr_spark.functions.tiff import (
            decode_tiff_refs,
            encode_tiff_multipage,
        )

        rng = _rng()
        pages = [
            rng.integers(0, 256, (11, 17)).astype(np.uint8),
            rng.integers(0, 256, (23, 5)).astype(np.uint8),
            rng.integers(0, 256, (4, 4)).astype(np.uint8),
        ]
        refs = ["doc:1#a", "x", "a-much-longer-media-ref-0123456789"]
        for comp in ("none", "packbits", "palette16", "cmyk", "deflate"):
            data = encode_tiff_multipage(pages, refs, compression=comp)
            # deterministic bytes
            assert data == encode_tiff_multipage(pages, refs, compression=comp)
            out = decode_tiff_pages(data)
            assert len(out) == 3
            if comp in ("palette16", "cmyk"):  # deflate pages stay grey
                # palette16 (identity ColorMap) and cmyk (K-only ink)
                # pages come back as equal-channel RGB, exactly the
                # grey values
                out = [p[:, :, 0] for p in out]
                assert all(
                    (p == q[:, :, 0]).all() and (p == q[:, :, 2]).all()
                    for p, q in zip(out, decode_tiff_pages(data))
                )
            assert all((a == b).all() for a, b in zip(out, pages))
            assert decode_tiff_refs(data) == refs
            # first-page laziness contract still holds on the chain
            first = decode_tiff(data)
            assert (
                (
                    first
                    if comp not in ("palette16", "cmyk")
                    else first[:, :, 0]
                )
                == pages[0]
            ).all()

    def test_refs_none_when_any_page_unnamed(self):
        from oar_ocr_spark.functions.tiff import (
            decode_tiff_refs,
            encode_tiff_multipage,
        )

        pages = [_rng().integers(0, 256, (6, 6)).astype(np.uint8)] * 2
        assert decode_tiff_refs(encode_tiff_multipage(pages)) is None
        assert decode_tiff_refs(encode_tiff(pages[0])) is None

    def test_validation(self):
        from oar_ocr_spark.functions.tiff import encode_tiff_multipage

        g = _rng().integers(0, 256, (4, 4)).astype(np.uint8)
        with pytest.raises(ValueError, match="at least one page"):
            encode_tiff_multipage([])
        with pytest.raises(ValueError, match="length must match"):
            encode_tiff_multipage([g], ["a", "b"])
        with pytest.raises(ValueError, match="uint8"):
            encode_tiff_multipage([g.astype(np.int32)], ["a"])


class TestSparkUnpack:
    def test_tiff_path_spans_equal_renderer_path(self, spark):
        from oar_ocr_spark.fixtures.corpus import generate_documents
        from oar_ocr_spark.fixtures.render import render_page
        from oar_ocr_spark.functions.png import decode_png
        from oar_ocr_spark.functions.tiff import tiff_media_store_df, tiff_store_df
        from oar_ocr_spark.pipeline import extract_spans
        from oar_ocr_spark.schemas import DOCUMENTS_SCHEMA

        docs_raw = generate_documents(12, seed=9)
        rows = [
            (d["doc_id"], [tuple(s.values()) for s in d["spans"]]) for d in docs_raw
        ]
        docs = spark.createDataFrame(rows, schema=DOCUMENTS_SCHEMA)

        tiffs = tiff_store_df(docs)
        got = {r["tiff_ref"]: r for r in tiffs.collect()}
        for d in docs_raw:
            n_media = sum(
                1 for s in d["spans"] if s["kind"] == "media" and s["media_ref"]
            )
            if n_media:
                assert got[d["doc_id"]]["n_pages"] == n_media
            else:
                assert d["doc_id"] not in got

        store = tiff_media_store_df(tiffs)
        sample = store.limit(3).collect()
        for r in sample:
            assert (decode_png(bytes(r["payload"])) == render_page(r["media_ref"])).all()

        via_tiff = extract_spans(spark, docs, media_store=store)
        direct = extract_spans(spark, docs)
        a = {r["doc_id"]: [tuple(s) for s in r["spans"]] for r in via_tiff.collect()}
        b = {r["doc_id"]: [tuple(s) for s in r["spans"]] for r in direct.collect()}
        assert a == b

    def test_unpack_falls_back_to_positional_refs(self, spark):
        from oar_ocr_spark.functions.tiff import (
            encode_tiff_multipage,
            tiff_media_store_df,
        )

        pages = [_rng().integers(0, 256, (5, 7)).astype(np.uint8)] * 2
        data = encode_tiff_multipage(pages)  # no embedded refs
        tiffs = spark.createDataFrame(
            [("t0", bytearray(data))], "tiff_ref string, payload binary"
        )
        refs = sorted(r["media_ref"] for r in tiff_media_store_df(tiffs).collect())
        assert refs == ["t0#page0", "t0#page1"]


class TestFaxStore:
    """fax_store_df: the scanned-bilevel write seam (CCITT TIFF and
    standalone JBIG2, crc32-split)."""

    def test_flavors_roundtrip_thresholded_page(self, spark):
        import zlib

        from pyspark.sql import functions as F

        from oar_ocr_spark.fixtures.corpus import generate_documents
        from oar_ocr_spark.fixtures.render import render_page
        from oar_ocr_spark.functions.multimodal import fax_store_df
        from oar_ocr_spark.functions.tiff import decode_tiff
        from oar_ocr_spark.schemas import DOCUMENTS_SCHEMA

        docs_raw = generate_documents(30, seed=13)
        rows = [
            (d["doc_id"], [tuple(s.values()) for s in d["spans"]]) for d in docs_raw
        ]
        docs = spark.createDataFrame(rows, schema=DOCUMENTS_SCHEMA)
        refs = (
            docs.select(F.explode("spans").alias("s"))
            .where(F.col("s.kind") == "media")
            .select(F.col("s.media_ref").alias("media_ref"))
            .distinct()
        )
        store = {r["media_ref"]: bytes(r["payload"]) for r in fax_store_df(refs).collect()}

        # the crc32 flavor split must exercise every CCITT family,
        # both fill orders, AND the JBIG2 quarter across the corpus
        hs = [zlib.crc32(("fax:" + r).encode("utf-8")) for r in store]
        assert {h % 3 for h in hs} == {0, 1, 2}
        assert {bool(h & 8) for h in hs} == {False, True}
        assert {bool(h & 32) for h in hs} == {False, True}

        from oar_ocr_spark.functions.jbig2 import JBIG2_MAGIC, decode_jbig2

        for ref, payload in store.items():
            bilevel = np.where(render_page(ref) >= 128, 255, 0).astype(np.uint8)
            if payload[:8] == JBIG2_MAGIC:
                got = ((1 - decode_jbig2(payload)) * 255).astype(np.uint8)
            else:
                got = decode_tiff(payload)
            assert (got == bilevel).all(), ref


class TestJpegInTiff:
    """New-style JPEG-in-TIFF (compression 7, TIFF-EP)."""

    def _grey(self):
        return _rng().integers(0, 256, (40, 56)).astype(np.uint8)

    def test_grey_roundtrip_equals_jpeg_twin(self):
        from oar_ocr_spark.functions.jpeg import decode_jpeg, encode_jpeg

        img = self._grey()
        want = decode_jpeg(encode_jpeg(img, quality=100))
        got = decode_tiff(encode_tiff(img, compression="jpeg"))
        assert (got == want).all()

    def test_rgb_roundtrip_photometric_ycbcr(self):
        from oar_ocr_spark.functions.jpeg import decode_jpeg, encode_jpeg

        img = _rng().integers(0, 256, (24, 32, 3)).astype(np.uint8)
        want = decode_jpeg(encode_jpeg(img, quality=100))
        data = encode_tiff(img, compression="jpeg")
        assert (decode_tiff(data) == want).all()
        # photometric must say YCbCr (6): that is what the stream holds
        tags, _ = _read_ifd(data, 8, "<")
        assert tags[262] == [6]

    def test_multi_strip_stacks_independent_streams(self):
        from oar_ocr_spark.functions.jpeg import decode_jpeg, encode_jpeg

        img = self._grey()
        got = decode_tiff(encode_tiff(img, compression="jpeg", rows_per_strip=13))
        want = np.vstack(
            [
                decode_jpeg(encode_jpeg(img[s : s + 13], quality=100))
                for s in range(0, img.shape[0], 13)
            ]
        )
        assert (got == want).all()

    def test_jpeg_tables_hoist_roundtrips_and_shrinks_strips(self):
        img = self._grey()
        plain = encode_tiff(img, compression="jpeg", rows_per_strip=8)
        hoisted = encode_tiff(
            img, compression="jpeg", rows_per_strip=8, jpeg_tables=True
        )
        assert (decode_tiff(hoisted) == decode_tiff(plain)).all()
        tags, _ = _read_ifd(hoisted, 8, "<")
        blob = bytes(tags[347])
        assert blob[:2] == b"\xff\xd8" and blob[-2:] == b"\xff\xd9"
        assert b"\xff\xdb" in blob and b"\xff\xc4" in blob  # DQT + DHT
        # abbreviated strips must not carry their own tables
        for off, cnt in zip(tags[273], tags[279]):
            strip = hoisted[off : off + cnt]
            assert b"\xff\xdb" not in strip[:200]
        assert sum(tags[279]) < sum(_read_ifd(plain, 8, "<")[0][279])

    def test_whiteiszero_grey_inverts(self):
        # foreign fixture: patch photometric to 0 on a grey JPEG TIFF
        img = self._grey()
        data = bytearray(encode_tiff(img, compression="jpeg"))
        tags, _ = _read_ifd(bytes(data), 8, "<")
        assert tags[262] == [1]
        # IFD entries start at 10; find the photometric entry and flip it
        (n,) = struct.unpack("<H", data[8:10])
        for e in range(n):
            at = 10 + 12 * e
            tag, typ, cnt = struct.unpack("<HHI", data[at : at + 8])
            if tag == 262:
                data[at + 8 : at + 10] = struct.pack("<H", 0)
        inv = decode_tiff(bytes(data))
        assert (inv == 255 - decode_tiff(encode_tiff(img, compression="jpeg"))).all()

    def test_declared_failures(self):
        img = self._grey()
        with pytest.raises(ValueError, match="bilevel"):
            encode_tiff((img > 127).astype(np.uint8) * 255, compression="jpeg", bilevel=True)
        with pytest.raises(ValueError, match="jpeg_tables"):
            encode_tiff(img, jpeg_tables=True)
        # corrupt strip: SOI stripped → declared loud failure
        data = bytearray(encode_tiff(img, compression="jpeg"))
        tags, _ = _read_ifd(bytes(data), 8, "<")
        off = tags[273][0]
        data[off : off + 2] = b"\x00\x00"
        with pytest.raises(ValueError, match="missing SOI"):
            decode_tiff(bytes(data))
        # old-style JPEG (compression 6) is a declared boundary
        data = bytearray(encode_tiff(img, compression="jpeg"))
        (n,) = struct.unpack("<H", data[8:10])
        for e in range(n):
            at = 10 + 12 * e
            tag, typ, cnt = struct.unpack("<HHI", data[at : at + 8])
            if tag == 259:
                data[at + 8 : at + 10] = struct.pack("<H", 6)
        with pytest.raises(NotImplementedError, match="old-style"):
            decode_tiff(bytes(data))


def _tiled_le(w, h, tw, tl, tiles, comp=1, photo=1, bits=(8,), extra_tags=()):
    """Hand-build a tiled little-endian TIFF (two passes to learn tile
    offsets — _ifd_le keeps layout stable across passes)."""
    n = len(tiles)

    def build(offs):
        tags = [
            (256, 4, 1, struct.pack("<I", w)),
            (257, 4, 1, struct.pack("<I", h)),
            (258, 3, len(bits), struct.pack("<" + "H" * len(bits), *bits)),
            (259, 3, 1, struct.pack("<H", comp)),
            (262, 3, 1, struct.pack("<H", photo)),
            (277, 3, 1, struct.pack("<H", len(bits))),
            (322, 4, 1, struct.pack("<I", tw)),
            (323, 4, 1, struct.pack("<I", tl)),
            (324, 4, n, b"".join(struct.pack("<I", o) for o in offs)),
            (325, 4, n, b"".join(struct.pack("<I", len(t)) for t in tiles)),
            *extra_tags,
        ]
        return _ifd_le(tags, tiles)

    _, strips_at = build([0] * n)
    offs, at = [], strips_at
    for t in tiles:
        offs.append(at)
        at += len(t)
    data, _ = build(offs)
    return data


def _tile_grid(img, tw, tl):
    """(padded tile bodies in row-major tile order, across, down)."""
    h, w = img.shape[:2]
    across, down = -(-w // tw), -(-h // tl)
    spp = 1 if img.ndim == 2 else img.shape[2]
    pad = np.zeros(
        (down * tl, across * tw) if spp == 1 else (down * tl, across * tw, spp),
        dtype=np.uint8,
    )
    pad[:h, :w] = img
    tiles = []
    for r in range(down):
        for c in range(across):
            tiles.append(pad[r * tl : (r + 1) * tl, c * tw : (c + 1) * tw])
    return tiles, across, down


class TestTiledTiff:
    """Tile layout (tags 322-325): the GeoTIFF / large-scan organization."""

    def test_grey_uncompressed_roundtrip(self):
        img = _rng().integers(0, 256, (10, 13)).astype(np.uint8)
        tiles, _, _ = _tile_grid(img, 8, 4)
        data = _tiled_le(13, 10, 8, 4, [t.tobytes() for t in tiles])
        assert (decode_tiff(data) == img).all()

    def test_rgb_tiles_roundtrip(self):
        img = _rng().integers(0, 256, (6, 9, 3)).astype(np.uint8)
        tiles, _, _ = _tile_grid(img, 4, 4)
        data = _tiled_le(
            9, 6, 4, 4, [t.tobytes() for t in tiles], photo=2, bits=(8, 8, 8)
        )
        assert (decode_tiff(data) == img).all()

    def test_packbits_tiles(self):
        img = _rng().integers(0, 256, (5, 7)).astype(np.uint8)
        tiles, _, _ = _tile_grid(img, 4, 3)

        def pb(body):
            enc = bytearray()
            for i in range(0, len(body), 128):
                chunk = body[i : i + 128]
                enc += bytes([len(chunk) - 1]) + chunk
            return bytes(enc)

        data = _tiled_le(7, 5, 4, 3, [pb(t.tobytes()) for t in tiles], comp=32773)
        assert (decode_tiff(data) == img).all()

    def test_ccitt_g4_tiles_bilevel(self):
        from oar_ocr_spark.functions.ccitt import ccitt_encode_g4

        rng = _rng()
        img = (rng.integers(0, 2, (9, 20)) * 255).astype(np.uint8)
        bits1 = (img == 255).astype(np.uint8)
        tiles_px, _, _ = _tile_grid(img, 8, 5)
        # photometric 1 (BlackIsZero): fax coding domain 1 = black
        bodies = [ccitt_encode_g4(1 - (t == 255).astype(np.uint8)) for t in tiles_px]
        data = _tiled_le(20, 9, 8, 5, bodies, comp=4, photo=1, bits=(1,))
        assert (decode_tiff(data) == img).all()
        del bits1

    def test_jpeg_tiles_with_shared_tables(self):
        from oar_ocr_spark.functions.jpeg import decode_jpeg, encode_jpeg
        from oar_ocr_spark.functions.tiff import _jpeg_split_tables

        img = _rng().integers(0, 256, (20, 28)).astype(np.uint8)
        tiles_px, across, down = _tile_grid(img, 16, 12)
        streams = [encode_jpeg(t, quality=100) for t in tiles_px]
        split = [_jpeg_split_tables(s) for s in streams]
        tables = split[0][0]
        data = _tiled_le(
            28, 20, 16, 12,
            [abbrev for _, abbrev in split],
            comp=7,
            extra_tags=[(347, 7, len(tables), tables)],
        )
        want = np.zeros((down * 12, across * 16), dtype=np.uint8)
        for i, s in enumerate(streams):
            r, c = (i // across) * 12, (i % across) * 16
            want[r : r + 12, c : c + 16] = decode_jpeg(s)
        assert (decode_tiff(data) == want[:20, :28]).all()

    def test_grid_mismatch_fails_loudly(self):
        img = _rng().integers(0, 256, (5, 7)).astype(np.uint8)
        tiles, _, _ = _tile_grid(img, 4, 3)
        bodies = [t.tobytes() for t in tiles]
        with pytest.raises(ValueError, match="grid wants"):
            decode_tiff(_tiled_le(7, 5, 4, 3, bodies[:1]))

    def test_predictor_on_tiles_restarts_per_tile_row(self):
        # horizontal differencing runs WITHIN each tile's rows (the
        # GeoTIFF layout); cross-tile reconstruction must not leak
        img = _rng().integers(0, 256, (5, 7)).astype(np.uint8)
        tiles, _, _ = _tile_grid(img, 4, 3)
        bodies = []
        for t in tiles:
            d = t.astype(np.int16)
            d[:, 1:] = (t[:, 1:].astype(np.int16) - t[:, :-1]) % 256
            bodies.append(d.astype(np.uint8).tobytes())
        data = _tiled_le(
            7, 5, 4, 3, bodies,
            extra_tags=[(317, 3, 1, struct.pack("<H", 2))],
        )
        assert (decode_tiff(data) == img).all()


def _strip_tiff_le(w, h, strips, bits, spp, photo=1, extra_tags=(), rps=None):
    """Hand-build a little-endian strip TIFF with arbitrary depth /
    sample layout (two passes to learn strip offsets)."""
    n = len(strips)
    base = [
        (256, 4, 1, struct.pack("<I", w)),
        (257, 4, 1, struct.pack("<I", h)),
        (258, 3, spp, struct.pack("<%dH" % spp, *([bits] * spp))),
        (259, 3, 1, struct.pack("<H", 1)),
        (262, 3, 1, struct.pack("<H", photo)),
        (277, 3, 1, struct.pack("<H", spp)),
        (278, 4, 1, struct.pack("<I", rps if rps else h)),
        (279, 4, n, b"".join(struct.pack("<I", len(s)) for s in strips)),
        *extra_tags,
    ]

    def build(strips_at):
        offs = []
        at = strips_at
        for s in strips:
            offs.append(at)
            at += len(s)
        tags = base + [
            (273, 4, n, b"".join(struct.pack("<I", o) for o in offs))
        ]
        return _ifd_le(tags, strips)

    _, strips_at = build(0)
    data, _ = build(strips_at)
    return data


class TestDeepAndPlanarSamples:
    """16-bit samples (either byte order, top-byte projection at the
    image seam) and PlanarConfiguration 2 (plane-major strips)."""

    def test_16bit_gray_le(self):
        img16 = (_rng().integers(0, 65536, (6, 9))).astype(np.uint16)
        data = _strip_tiff_le(9, 6, [img16.astype("<u2").tobytes()], 16, 1)
        assert (decode_tiff(data) == (img16 >> 8).astype(np.uint8)).all()

    def test_16bit_rgb_and_predictor(self):
        rgb16 = (_rng().integers(0, 65536, (4, 5, 3))).astype(np.uint16)
        data = _strip_tiff_le(
            5, 4, [rgb16.astype("<u2").tobytes()], 16, 3, photo=2
        )
        assert (decode_tiff(data) == (rgb16 >> 8).astype(np.uint8)).all()
        # predictor 2 differencing runs mod 65536 on the 16-bit samples
        diff = rgb16.astype(np.int64)
        diff[:, 1:] = (diff[:, 1:] - rgb16[:, :-1].astype(np.int64)) % 65536
        data = _strip_tiff_le(
            5, 4, [diff.astype("<u2").tobytes()], 16, 3, photo=2,
            extra_tags=[(317, 3, 1, struct.pack("<H", 2))],
        )
        assert (decode_tiff(data) == (rgb16 >> 8).astype(np.uint8)).all()

    def test_16bit_samples_read_in_container_byte_order(self):
        # the decoder reads 16-bit words in the container's byte
        # order: big-endian sample bytes inside an II container must
        # NOT reconstruct the image (they would if the order were
        # ignored or guessed)
        img16 = (_rng().integers(256, 65536, (3, 7))).astype(np.uint16)
        le = _strip_tiff_le(7, 3, [img16.astype("<u2").tobytes()], 16, 1)
        want = (img16 >> 8).astype(np.uint8)
        assert (decode_tiff(le) == want).all()
        swapped = _strip_tiff_le(7, 3, [img16.astype(">u2").tobytes()], 16, 1)
        assert not (decode_tiff(swapped) == want).all()

    def test_planar_rgb_strips(self):
        rgb = _rng().integers(0, 256, (6, 5, 3)).astype(np.uint8)
        strips = [rgb[..., c].tobytes() for c in range(3)]
        data = _strip_tiff_le(
            5, 6, strips, 8, 3, photo=2,
            extra_tags=[(284, 3, 1, struct.pack("<H", 2))],
        )
        assert (decode_tiff(data) == rgb).all()

    def test_planar_rgb_multi_strip_with_predictor(self):
        rgb = _rng().integers(0, 256, (7, 4, 3)).astype(np.uint8)
        diff = rgb.astype(np.int16)
        diff[:, 1:] = (rgb[:, 1:].astype(np.int16) - rgb[:, :-1]) % 256
        d8 = diff.astype(np.uint8)
        strips = []
        for c in range(3):  # plane-major: all of R's strips, then G's…
            for y0 in (0, 4):
                strips.append(d8[y0 : y0 + 4, :, c].tobytes())
        data = _strip_tiff_le(
            4, 7, strips, 8, 3, photo=2, rps=4,
            extra_tags=[
                (284, 3, 1, struct.pack("<H", 2)),
                (317, 3, 1, struct.pack("<H", 2)),
            ],
        )
        assert (decode_tiff(data) == rgb).all()

    def test_guards(self):
        rgb = _rng().integers(0, 256, (4, 4, 3)).astype(np.uint8)
        # planar strips short of spp * ceil(h/rps)
        data = _strip_tiff_le(
            4, 4, [rgb[..., 0].tobytes()], 8, 3, photo=2,
            extra_tags=[(284, 3, 1, struct.pack("<H", 2))],
        )
        with pytest.raises(ValueError, match="planar"):
            decode_tiff(data)
        # depth 32 stays declared out of scope
        img = _rng().integers(0, 256, (3, 3)).astype(np.uint8)
        data = _strip_tiff_le(3, 3, [img.tobytes()], 32, 1)
        with pytest.raises(NotImplementedError, match="depth 32"):
            decode_tiff(data)


class TestOldStyleJpeg:
    """Old-style JPEG-in-TIFF (compression 6, deprecated by TechNote 2):
    the decodable real-world flavor carries one complete interchange
    stream behind JPEGInterchangeFormat (513) / -Length (514)."""

    def test_grey_roundtrip_equals_jpeg_twin(self):
        from oar_ocr_spark.functions.jpeg import decode_jpeg, encode_jpeg

        img = _rng().integers(0, 256, (40, 56)).astype(np.uint8)
        want = decode_jpeg(encode_jpeg(img, quality=100))
        data = encode_tiff(img, compression="ojpeg")
        tags, _ = _read_ifd(data, 8, "<")
        assert tags[259] == [6] and 513 in tags and 514 in tags
        assert (decode_tiff(data) == want).all()

    def test_rgb_roundtrip(self):
        from oar_ocr_spark.functions.jpeg import decode_jpeg, encode_jpeg

        img = _rng().integers(0, 256, (24, 32, 3)).astype(np.uint8)
        want = decode_jpeg(encode_jpeg(img, quality=100))
        assert (decode_tiff(encode_tiff(img, compression="ojpeg")) == want).all()

    def test_interchange_stream_is_a_plain_jpeg(self):
        from oar_ocr_spark.functions.jpeg import decode_jpeg

        img = _rng().integers(0, 256, (16, 16)).astype(np.uint8)
        data = encode_tiff(img, compression="ojpeg")
        tags, _ = _read_ifd(data, 8, "<")
        off, ln = tags[513][0], tags[514][0]
        blob = data[off : off + ln]
        assert blob[:2] == b"\xff\xd8" and blob[-2:] == b"\xff\xd9"
        decode_jpeg(blob)  # standalone-decodable

    def test_fragmented_old_style_fails_loudly(self):
        # comp 6 WITHOUT tag 513: the per-strip fragmented layout
        img = _rng().integers(0, 256, (8, 8)).astype(np.uint8)
        data = bytearray(encode_tiff(img, compression="none"))
        # patch the Compression tag value in place (tag 259, SHORT)
        (n,) = struct.unpack("<H", data[8:10])
        at = 10
        for _ in range(n):
            tag, typ, count = struct.unpack("<HHI", data[at : at + 8])
            if tag == 259:
                data[at + 8 : at + 10] = struct.pack("<H", 6)
            at += 12
        with pytest.raises(NotImplementedError, match="JPEGInterchangeFormat"):
            decode_tiff(bytes(data))

    def test_truncated_interchange_fails_loudly(self):
        img = _rng().integers(0, 256, (8, 8)).astype(np.uint8)
        data = encode_tiff(img, compression="ojpeg")
        with pytest.raises(ValueError):
            decode_tiff(data[:-10])


class TestDeepPaletteAndPlanarTiles:
    """16-bit palette indices (full precision — never narrowed) and
    PlanarConfiguration 2 on the tiled layout (plane-major tiles)."""

    def test_16bit_palette_indices_keep_full_precision(self):
        rng = _rng()
        n = 300  # beyond any 8-bit index
        cmap16 = rng.integers(0, 65536, (3, n)).astype(np.uint16)
        idx = rng.integers(0, n, (4, 6)).astype(np.uint16)
        idx[0, 0] = n - 1  # force an index no 8-bit projection could hit
        data = _strip_tiff_le(
            6, 4, [idx.astype("<u2").tobytes()], 16, 1, photo=3,
            extra_tags=[(320, 3, 3 * n, cmap16.astype("<u2").tobytes())],
        )
        want = (cmap16.T >> 8).astype(np.uint8)[idx]
        assert (decode_tiff(data) == want).all()

    def test_16bit_palette_index_out_of_range_fails_loudly(self):
        cmap16 = np.zeros((3, 4), np.uint16)
        idx = np.full((2, 2), 7, dtype=np.uint16)
        data = _strip_tiff_le(
            2, 2, [idx.astype("<u2").tobytes()], 16, 1, photo=3,
            extra_tags=[(320, 3, 12, cmap16.astype("<u2").tobytes())],
        )
        with pytest.raises(ValueError, match="palette index"):
            decode_tiff(data)

    def test_planar_tiled_rgb(self):
        img = _rng().integers(0, 256, (5, 7, 3)).astype(np.uint8)
        tiles = []
        for ci in range(3):  # plane-major: all of one component's tiles
            plane_tiles, across, down = _tile_grid(img[:, :, ci], 4, 3)
            tiles += [t.tobytes() for t in plane_tiles]
        data = _tiled_le(
            7, 5, 4, 3, tiles, photo=2, bits=(8, 8, 8),
            extra_tags=[(284, 3, 1, struct.pack("<H", 2))],
        )
        assert (decode_tiff(data) == img).all()

    def test_planar_tiled_with_predictor(self):
        img = _rng().integers(0, 256, (6, 8, 3)).astype(np.uint8)
        tiles = []
        for ci in range(3):
            plane_tiles, _, _ = _tile_grid(img[:, :, ci], 4, 3)
            for t in plane_tiles:
                d = t.astype(np.int16)
                d[:, 1:] = (t[:, 1:].astype(np.int16) - t[:, :-1]) % 256
                tiles.append(d.astype(np.uint8).tobytes())
        data = _tiled_le(
            8, 6, 4, 3, tiles, photo=2, bits=(8, 8, 8),
            extra_tags=[
                (284, 3, 1, struct.pack("<H", 2)),
                (317, 3, 1, struct.pack("<H", 2)),
            ],
        )
        assert (decode_tiff(data) == img).all()

    def test_planar_tiled_missing_plane_fails_loudly(self):
        img = _rng().integers(0, 256, (5, 7, 3)).astype(np.uint8)
        plane_tiles, _, _ = _tile_grid(img[:, :, 0], 4, 3)
        tiles = [t.tobytes() for t in plane_tiles] * 2  # only 2 planes
        data = _tiled_le(
            7, 5, 4, 3, tiles, photo=2, bits=(8, 8, 8),
            extra_tags=[(284, 3, 1, struct.pack("<H", 2))],
        )
        with pytest.raises(ValueError, match="grid wants"):
            decode_tiff(data)

    def test_planar_jpeg_tiles_fail_loudly(self):
        img = _rng().integers(0, 256, (5, 7, 3)).astype(np.uint8)
        plane_tiles, _, _ = _tile_grid(img[:, :, 0], 4, 3)
        tiles = [t.tobytes() for t in plane_tiles] * 3
        data = _tiled_le(
            7, 5, 4, 3, tiles, comp=7, photo=2, bits=(8, 8, 8),
            extra_tags=[(284, 3, 1, struct.pack("<H", 2))],
        )
        with pytest.raises(NotImplementedError, match="planar"):
            decode_tiff(data)


def _pack_subbyte_rows(vals: np.ndarray, depth: int) -> bytes:
    """(h, w) ints < 2^depth → MSB-first packed bytes, rows byte-padded
    (the test-side inverse of tiff._unpack_subbyte)."""
    h, w = vals.shape
    bits = ((vals[:, :, None] >> np.arange(depth - 1, -1, -1)) & 1).astype(np.uint8)
    return np.packbits(bits.reshape(h, w * depth), axis=1).tobytes()


def _strip_le(w, h, strip, bits=(8,), photo=1, comp=1, extra_tags=()):
    """Hand-build a single-strip little-endian TIFF (two passes to
    learn the strip offset, same scheme as the other foreign layouts)."""
    tags = [
        (256, 4, 1, struct.pack("<I", w)),
        (257, 4, 1, struct.pack("<I", h)),
        (258, 3, len(bits), struct.pack("<" + "H" * len(bits), *bits)),
        (259, 3, 1, struct.pack("<H", comp)),
        (262, 3, 1, struct.pack("<H", photo)),
        (273, 4, 1, None),
        (277, 3, 1, struct.pack("<H", len(bits))),
        (278, 4, 1, struct.pack("<I", h)),
        (279, 4, 1, struct.pack("<I", len(strip))),
        *extra_tags,
    ]
    probe = [
        (t, ty, c, v if v is not None else b"\x00\x00\x00\x00")
        for t, ty, c, v in tags
    ]
    _, strips_at = _ifd_le(probe, [strip])
    final = [
        (t, ty, c, struct.pack("<I", strips_at) if v is None else v)
        for t, ty, c, v in tags
    ]
    data, _ = _ifd_le(final, [strip])
    return data


class TestSubByteAndSeparated:
    """2/4-bit early-scanner layouts and photometric 5 (CMYK)."""

    def test_grey4_strips_both_polarities(self):
        rng = _rng()
        vals = rng.integers(0, 16, (5, 7)).astype(np.uint8)
        strip = _pack_subbyte_rows(vals, 4)
        for photo in (0, 1):
            data = _strip_le(7, 5, strip, bits=(4,), photo=photo)
            want = vals * 17 if photo == 1 else 255 - vals * 17
            got = decode_tiff(data)
            assert got.dtype == np.uint8 and got.shape == (5, 7)
            assert (got == want).all()

    def test_grey2_strip(self):
        rng = _rng()
        vals = rng.integers(0, 4, (3, 9)).astype(np.uint8)
        data = _strip_le(9, 3, _pack_subbyte_rows(vals, 2), bits=(2,))
        assert (decode_tiff(data) == vals * 85).all()

    def test_palette4(self):
        rng = _rng()
        n = 16
        cmap16 = rng.integers(0, 65536, (3, n)).astype(np.uint16)
        idx = rng.integers(0, n, (4, 5)).astype(np.uint8)
        data = _strip_le(
            5, 4, _pack_subbyte_rows(idx, 4), bits=(4,), photo=3,
            extra_tags=[(320, 3, 3 * n, cmap16.astype("<u2").tobytes())],
        )
        want = (cmap16.T >> 8).astype(np.uint8)[idx]
        assert (decode_tiff(data) == want).all()

    def test_grey4_tiled(self):
        rng = _rng()
        img4 = rng.integers(0, 16, (6, 5)).astype(np.uint8)
        tiles = []
        for r in range(0, 6, 4):
            for c in range(0, 5, 4):
                block = np.zeros((4, 4), np.uint8)
                part = img4[r : r + 4, c : c + 4]
                block[: part.shape[0], : part.shape[1]] = part
                tiles.append(_pack_subbyte_rows(block, 4))
        data = _tiled_le(5, 6, 4, 4, tiles, bits=(4,))
        assert (decode_tiff(data) == img4 * 17).all()

    def test_cmyk_strip_8_bit(self):
        rng = _rng()
        ink = rng.integers(0, 256, (4, 6, 4)).astype(np.uint8)
        data = _strip_le(6, 4, ink.tobytes(), bits=(8,) * 4, photo=5)
        inv = 255.0 - ink[..., :3].astype(np.float64)
        k = 255.0 - ink[..., 3].astype(np.float64)
        want = np.clip(np.round(inv * k[..., None] / 255.0), 0, 255).astype(np.uint8)
        got = decode_tiff(data)
        assert got.shape == (4, 6, 3) and (got == want).all()

    def test_cmyk_strip_16_bit_projects_top_byte(self):
        rng = _rng()
        ink16 = rng.integers(0, 65536, (3, 4, 4)).astype("<u2")
        data = _strip_le(4, 3, ink16.tobytes(), bits=(16,) * 4, photo=5)
        px = (ink16 >> 8).astype(np.uint8)
        inv = 255.0 - px[..., :3].astype(np.float64)
        k = 255.0 - px[..., 3].astype(np.float64)
        want = np.clip(np.round(inv * k[..., None] / 255.0), 0, 255).astype(np.uint8)
        assert (decode_tiff(data) == want).all()

    def test_declared_guards(self):
        rng = _rng()
        ink = rng.integers(0, 256, (2, 3, 4)).astype(np.uint8)
        with pytest.raises(NotImplementedError, match="InkSet 2"):
            decode_tiff(_strip_le(
                3, 2, ink.tobytes(), bits=(8,) * 4, photo=5,
                extra_tags=[(332, 3, 1, struct.pack("<H", 2))],
            ))
        vals = rng.integers(0, 16, (2, 3)).astype(np.uint8)
        with pytest.raises(NotImplementedError, match="3 samples"):
            decode_tiff(_strip_le(3, 2, b"\x00" * 12, bits=(4,) * 3, photo=2))
        with pytest.raises(NotImplementedError, match="sub-byte"):
            decode_tiff(_strip_le(
                3, 2, _pack_subbyte_rows(vals, 4), bits=(4,),
                extra_tags=[(317, 3, 1, struct.pack("<H", 2))],
            ))
        with pytest.raises(NotImplementedError, match="depth 3"):
            decode_tiff(_strip_le(3, 2, b"\x00" * 4, bits=(3,)))


class TestJpegInTiffDeep:
    """12/16-bit JPEG-in-TIFF (TIFF-EP / medical archives): the JPEG
    decoder owns the sample layout and projects deep streams to their
    top 8 bits itself — lossless SOF3 strips roundtrip bit-exactly."""

    def test_12_and_16_bit_lossless_strips(self):
        from oar_ocr_spark.functions.jpeg import encode_jpeg_lossless

        rng = _rng()
        for depth, shape in ((12, (9, 11)), (16, (7, 5))):
            deep = rng.integers(0, 1 << depth, shape).astype(np.uint16)
            strip = encode_jpeg_lossless(deep, precision=depth)
            data = _strip_le(
                shape[1], shape[0], strip, bits=(depth,), comp=7
            )
            want = (deep >> (depth - 8)).astype(np.uint8)
            assert (decode_tiff(data) == want).all(), depth

    def test_12_bit_outside_jpeg_still_declared(self):
        with pytest.raises(NotImplementedError, match="depth 12"):
            decode_tiff(_strip_le(3, 2, b"\x00" * 9, bits=(12,), comp=1))
