"""WAV (audio) and AVI/MJPEG (video) codecs + Spark feature operators.

These complete the multimodal seam (SURVEY §2.1 load_image family +
the training-data brief's audio/video columns): all three modalities
now carry REAL container bytes — PNG/JPEG images, PCM WAV audio,
AVI-MJPEG video — through the same (media_ref, payload) store shape."""

import struct

import numpy as np
import pytest

from oar_ocr_spark.fixtures.render import render_page
from oar_ocr_spark.functions.avi import (
    avi_frame_count,
    decode_avi_frames,
    encode_avi_mjpeg,
    frame_sample_from_bytes_df,
    render_video_frames,
    video_store_df,
)
from oar_ocr_spark.functions.wav import (
    audio_features_from_bytes_df,
    decode_wav,
    encode_wav,
    render_audio,
    wav_store_df,
)


class TestWav:
    def test_roundtrip_lossless_and_deterministic(self):
        for ref in ["11_m2", "40_m0", "anything"]:
            samples, rate = render_audio(ref)
            data = encode_wav(samples, rate)
            assert data[:4] == b"RIFF" and data[8:12] == b"WAVE"
            out, rate2 = decode_wav(data)
            assert rate2 == rate and (out[:, 0] == samples).all()
            s2, _ = render_audio(ref)  # fixture determinism
            assert (s2 == samples).all()
            assert encode_wav(samples, rate) == data

    def test_stereo(self):
        s, r = render_audio("x")
        st = np.stack([s[:64], -s[:64]], axis=1).astype(np.int16)
        out, _ = decode_wav(encode_wav(st, r))
        assert (out == st).all()

    def test_8bit_wav_decodes(self):
        fmt = struct.pack("<HHIIHH", 1, 1, 8000, 8000, 1, 8)
        raw = bytes([0, 128, 255, 64])
        body = (
            b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(raw)) + raw
        )
        out, rate = decode_wav(b"RIFF" + struct.pack("<I", len(body)) + body)
        assert rate == 8000
        assert out[:, 0].tolist() == [-32768, 0, 32512, -16384]

    @staticmethod
    def _wrap(fmt: bytes, raw: bytes) -> bytes:
        body = (
            b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(raw)) + raw
        )
        return b"RIFF" + struct.pack("<I", len(body)) + body

    def test_24bit_wav_takes_top_16_bits(self):
        fmt = struct.pack("<HHIIHH", 1, 1, 8000, 24000, 3, 24)
        vals = [0x123456, -0x123456, 0x7FFFFF, -0x800000]
        raw = b"".join(
            (v & 0xFFFFFF).to_bytes(3, "little") for v in vals
        )
        out, rate = decode_wav(self._wrap(fmt, raw))
        assert out[:, 0].tolist() == [v >> 8 for v in vals]

    def test_32bit_int_wav(self):
        fmt = struct.pack("<HHIIHH", 1, 1, 8000, 32000, 4, 32)
        vals = np.array([1 << 30, -(1 << 30), 0x7FFFFFFF], dtype="<i4")
        out, _ = decode_wav(self._wrap(fmt, vals.tobytes()))
        assert out[:, 0].tolist() == (vals >> 16).astype(np.int16).tolist()

    def test_float_wav_scales_and_clips(self):
        for bits, dt in ((32, "<f4"), (64, "<f8")):
            fmt = struct.pack("<HHIIHH", 3, 1, 8000, 8000 * bits // 8, bits // 8, bits)
            vals = np.array([0.0, 0.5, -1.0, 1.5, -2.0], dtype=dt)
            out, _ = decode_wav(self._wrap(fmt, vals.tobytes()))
            assert out[:, 0].tolist() == [0, 16384, -32767, 32767, -32768]

    def test_float_wav_nan_maps_to_zero(self):
        # nan.astype(int16) is C-undefined — must be pinned to 0
        fmt = struct.pack("<HHIIHH", 3, 1, 8000, 32000, 4, 32)
        vals = np.array([np.nan, 0.25, -np.inf, np.inf], dtype="<f4")
        out, _ = decode_wav(self._wrap(fmt, vals.tobytes()))
        assert out[:, 0].tolist() == [0, 8192, -32768, 32767]

    def test_extensible_wav_resolves_subformat(self):
        # WAVE_FORMAT_EXTENSIBLE (0xFFFE): real tag lives in the
        # SubFormat GUID — here KSDATAFORMAT_SUBTYPE_PCM
        guid_pcm = struct.pack("<H", 1) + b"\x00\x00" + bytes.fromhex(
            "0000100080000080" + "00aa00389b71"
        )
        fmt = (
            struct.pack("<HHIIHH", 0xFFFE, 2, 44100, 44100 * 4, 4, 16)
            + struct.pack("<HHI", 22, 16, 3)  # cbSize, validBits, channel mask
            + guid_pcm
        )
        samples = np.array([[100, -100], [2000, -2000]], dtype="<i2")
        out, rate = decode_wav(self._wrap(fmt, samples.tobytes()))
        assert rate == 44100 and (out == samples).all()

    def test_compressed_raises_declared(self):
        fmt = struct.pack("<HHIIHH", 2, 1, 8000, 8000, 1, 4)  # ADPCM tag
        body = (
            b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", 0)
        )
        with pytest.raises(NotImplementedError, match="PCM"):
            decode_wav(b"RIFF" + struct.pack("<I", len(body)) + body)
        with pytest.raises(ValueError):
            decode_wav(b"not a wav at all")


class TestAvi:
    def test_roundtrip_and_random_access(self):
        frames = render_video_frames("40_m0", 6)
        data = encode_avi_mjpeg(frames, quality=100)
        assert data[:4] == b"RIFF" and data[8:12] == b"AVI "
        assert avi_frame_count(data) == 6
        out = decode_avi_frames(data)
        for got, want in zip(out, frames):
            assert np.abs(got.astype(int) - want.astype(int)).max() <= 1
        # container seek: partial decode equals the full decode's frames
        sel = decode_avi_frames(data, [1, 4])
        assert (sel[0] == out[1]).all() and (sel[1] == out[4]).all()
        assert encode_avi_mjpeg(frames, quality=100) == data

    def test_fixture_is_shift_of_page(self):
        page = render_page("7_m1")
        frames = render_video_frames("7_m1", 3)
        assert (frames[0] == page).all()
        assert (frames[2] == np.roll(page, 16, axis=1)).all()

    def test_non_mjpeg_frame_raises_declared(self):
        data = encode_avi_mjpeg(render_video_frames("40_m0", 2))
        # corrupt the first frame's SOI so it is not a JPEG
        frames = decode_avi_frames  # keep name short
        from oar_ocr_spark.functions.avi import _movi_frames

        off, _size = _movi_frames(data)[0]
        patched = data[:off] + b"\x00\x00" + data[off + 2 :]
        with pytest.raises(NotImplementedError, match="frame codec"):
            frames(patched, [0])

    def test_zero_frame_avi_fails_loudly(self):
        # a foreign container with no '00dc' chunks must raise a clear
        # scope error, not a bare IndexError from probing frame 0
        from oar_ocr_spark.functions.avi import frame_feature_rows

        empty = b"RIFF\x04\x00\x00\x00AVI "
        assert avi_frame_count(empty) == 0
        with pytest.raises(ValueError, match="no video frames"):
            frame_feature_rows("x_m0", empty, 4)

    def test_not_an_avi(self):
        with pytest.raises(ValueError):
            avi_frame_count(b"RIFF\x04\x00\x00\x00WAVE")


class TestSparkOps:
    def test_audio_store_and_features(self, spark):
        refs = spark.createDataFrame(
            [("a_m0",), ("b_m1",), ("c_m2",)], "media_ref string"
        )
        feats = {
            r["media_ref"]: r
            for r in audio_features_from_bytes_df(wav_store_df(refs)).collect()
        }
        assert set(feats) == {"a_m0", "b_m1", "c_m2"}
        for ref, row in feats.items():
            samples, rate = render_audio(ref)
            mono = samples.astype(np.int64)
            assert row["n_samples"] == len(samples)
            assert row["sample_rate"] == rate
            assert row["duration_ms"] == len(samples) * 1000 // rate
            assert row["peak"] == int(np.abs(mono).max())
            want_rms = round(float(np.sqrt(np.sum(mono * mono) / len(mono))), 6)
            assert row["rms"] == pytest.approx(want_rms, abs=1e-9)

    def test_video_store_and_frame_sampling(self, spark):
        refs = spark.createDataFrame([("40_m0",), ("7_m1",)], "media_ref string")
        store = video_store_df(refs, n_frames=8)
        rows = frame_sample_from_bytes_df(store, n_sample=4).collect()
        by_ref: dict[str, list] = {}
        for r in rows:
            by_ref.setdefault(r["media_ref"], []).append(r)
        for ref, frames in by_ref.items():
            page = render_page(ref)
            assert [f["frame_idx"] for f in sorted(frames, key=lambda f: f["frame_idx"])] == [0, 2, 4, 6]
            for f in frames:
                assert (f["height"], f["width"]) == page.shape
                # cyclic shift conserves the histogram → mean within JPEG ±1
                assert abs(f["mean_intensity"] - float(page.mean())) <= 1.0
