"""GIF codec (functions/gif.py): palette/LZW/interlace/transparency
decode for old-web crawl images, roundtrip-tested against the
spec-valid literal-code fixture encoder plus a hand-derived LZW
vector for the KwKwK path the literal encoder never emits."""

import struct

import numpy as np
import pytest

from oar_ocr_spark.functions.gif import (
    decode_gif,
    decode_gif_frames,
    encode_gif,
)


def _rng():
    return np.random.default_rng(7)


class TestRoundtrip:
    def test_plain_interlaced_and_transparent(self):
        rng = _rng()
        pal = rng.integers(0, 256, (16, 3)).astype(np.uint8)
        idx = rng.integers(0, 16, (23, 31)).astype(np.uint8)
        assert (decode_gif(encode_gif(idx, pal)) == pal[idx]).all()
        assert (decode_gif(encode_gif(idx, pal, interlace=True)) == pal[idx]).all()
        want = pal[idx].copy()
        want[idx == 3] = 255  # transparency composites over white
        assert (decode_gif(encode_gif(idx, pal, transparent_index=3)) == want).all()

    def test_small_palettes_and_images(self):
        rng = _rng()
        for n, h, w in [(2, 1, 1), (4, 3, 2), (3, 5, 9), (256, 8, 8)]:
            pal = rng.integers(0, 256, (n, 3)).astype(np.uint8)
            idx = rng.integers(0, n, (h, w)).astype(np.uint8)
            assert (decode_gif(encode_gif(idx, pal)) == pal[idx]).all(), (n, h, w)

    def test_table_growth_across_clear_cycles(self):
        # wide image forces the literal stream through width bumps and
        # periodic clear codes; every pixel must survive
        rng = _rng()
        pal = rng.integers(0, 256, (16, 3)).astype(np.uint8)
        big = rng.integers(0, 16, (64, 200)).astype(np.uint8)
        assert (decode_gif(encode_gif(big, pal)) == pal[big]).all()

    def test_deterministic_bytes(self):
        rng = _rng()
        pal = rng.integers(0, 256, (8, 3)).astype(np.uint8)
        idx = rng.integers(0, 8, (9, 9)).astype(np.uint8)
        assert encode_gif(idx, pal) == encode_gif(idx, pal)


class TestForeignStreams:
    def test_kwkwk_code_vector(self):
        # the code==len(table) (KwKwK) case the literal fixture encoder
        # never emits: min_code=2, codes CLEAR(4), 0, 6, EOI(5) decode
        # to 'A','AA' = three index-0 pixels (hand-derived per spec)
        codes = [4, 0, 6, 5]
        acc = nbits = 0
        data = bytearray()
        for c in codes:
            acc |= c << nbits  # LSB-first, width 3
            nbits += 3
            while nbits >= 8:
                data.append(acc & 0xFF)
                acc >>= 8
                nbits -= 8
        if nbits:
            data.append(acc & 0xFF)
        pal = np.array([[10, 20, 30], [0, 0, 0], [0, 0, 0], [0, 0, 0]], np.uint8)
        out = bytearray(b"GIF89a")
        out += struct.pack("<HHBBB", 3, 1, 0x80 | 0x11, 0, 0)  # GCT 4 entries
        out += pal.tobytes()
        out += b"\x2c" + struct.pack("<HHHH", 0, 0, 3, 1) + b"\x00"
        out += bytes([2])  # min code size
        out += bytes([len(data)]) + bytes(data) + b"\x00\x3b"
        got = decode_gif(bytes(out))
        assert (got == np.tile(pal[0], (1, 3, 1))).all()

    def test_multi_frame_composites_onto_screen(self):
        # frame 2 is a sub-rectangle patch; the composite keeps frame
        # 1's pixels outside it (disposal 'keep')
        pal = np.array([[1, 2, 3], [200, 100, 50]], np.uint8)
        base = encode_gif(np.zeros((4, 4), np.uint8), pal)
        patch_idx = np.ones((2, 2), np.uint8)
        patch = encode_gif(patch_idx, pal)
        # splice the patch's image block (descriptor at fixed offset)
        img_block = patch[patch.index(b"\x2c") :-1]  # strip trailer
        img_block = bytearray(img_block)
        img_block[1:9] = struct.pack("<HHHH", 1, 1, 2, 2)  # place at (1,1)
        combined = base[:-1] + bytes(img_block) + b"\x3b"
        frames = decode_gif_frames(combined)
        assert len(frames) == 2
        assert (frames[0] == pal[0]).all()
        want = np.tile(pal[0], (4, 4, 1))
        want[1:3, 1:3] = pal[1]
        assert (frames[1] == want).all()
        assert (decode_gif(combined) == frames[0]).all()  # first frame

    def test_disposal_restore_to_background_and_previous(self):
        # disposal 2 clears the frame's region to WHITE before the next
        # frame; disposal 3 rewinds to the pre-frame composite
        pal = np.array([[10, 10, 10], [200, 200, 200]], np.uint8)
        base = encode_gif(np.zeros((4, 4), np.uint8), pal)
        patch = encode_gif(np.ones((2, 2), np.uint8), pal)
        blk = bytearray(patch[patch.index(b"\x2c") : -1])
        blk[1:9] = struct.pack("<HHHH", 1, 1, 2, 2)  # at (1,1)
        blk3 = bytearray(patch[patch.index(b"\x2c") : -1])
        blk3[1:9] = struct.pack("<HHHH", 0, 0, 2, 2)  # at (0,0)
        for disposal, mid_expect in ((2, 255), (3, 10)):
            gce = b"\x21\xf9\x04" + bytes([disposal << 2]) + b"\x00\x00\x00\x00"
            data = base[:-1] + gce + bytes(blk) + bytes(blk3) + b"\x3b"
            frames = decode_gif_frames(data)
            assert len(frames) == 3
            # frame 2 shows the patch regardless of its disposal method
            assert (frames[1][1:3, 1:3] == 200).all()
            # frame 3: frame 2's region was disposed (white / original),
            # EXCEPT where frame 3's own patch at (0,0) redraws
            assert (frames[2][2, 2] == mid_expect).all()
            assert (frames[2][1, 2] == mid_expect).all()
            assert (frames[2][0:2, 0:2] == 200).all()

    def test_decode_gif_stops_at_first_frame(self):
        pal = np.array([[10, 10, 10], [200, 200, 200]], np.uint8)
        base = encode_gif(np.zeros((3, 3), np.uint8), pal)
        # second image block is TRUNCATED garbage — must not matter,
        # decode_gif returns after compositing frame 1
        data = base[:-1] + b"\x2c" + b"\x00" * 9
        assert (decode_gif(data) == pal[0]).all()
        assert len(decode_gif_frames(data, limit=1)) == 1

    def test_palette_over_256_rejected(self):
        with pytest.raises(ValueError, match="N <= 256"):
            encode_gif(np.zeros((2, 2), np.uint8), np.zeros((300, 3), np.uint8))

    def test_bad_inputs(self):
        with pytest.raises(ValueError, match="signature"):
            decode_gif(b"PNG....")
        pal = np.array([[0, 0, 0], [1, 1, 1]], np.uint8)
        data = bytearray(encode_gif(np.zeros((2, 2), np.uint8), pal))
        i = data.index(b"\x2c")
        data[i] = 0x7E  # unknown block type
        with pytest.raises(ValueError, match="unexpected GIF block"):
            decode_gif(bytes(data))


class TestMediaSeam:
    def test_gif_payload_greyscales_at_seam(self):
        from oar_ocr_spark.functions.multimodal import _decode_payload

        rng = _rng()
        pal = rng.integers(0, 256, (8, 3)).astype(np.uint8)
        idx = rng.integers(0, 8, (12, 10)).astype(np.uint8)
        out = _decode_payload("x", "image", encode_gif(idx, pal))
        assert out.ndim == 2 and out.shape == (12, 10) and out.dtype == np.uint8
