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
        fmt = struct.pack("<HHIIHH", 0x55, 1, 8000, 8000, 1, 0)  # MP3-in-WAV
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


class TestG711:
    """G.711 companding (format tags 6/7) — ITU-T G.711."""

    def test_code_value_identity_both_laws(self):
        from oar_ocr_spark.functions.wav import (
            _ALAW_DEC,
            _MULAW_DEC,
            _g711_alaw_encode,
            _g711_mulaw_encode,
        )

        codes = np.arange(256, dtype=np.uint8)
        # A-law: encode(decode(c)) == c for every code
        assert (_g711_alaw_encode(_ALAW_DEC[codes]) == codes).all()
        # mu-law: same, except the standard -0 degeneracy (0x7F and
        # 0xFF both decode to 0; 0 re-encodes to the positive code)
        back = _g711_mulaw_encode(_MULAW_DEC[codes])
        assert (back[codes != 0x7F] == codes[codes != 0x7F]).all()
        assert back[0x7F] == 0xFF and _MULAW_DEC[0x7F] == 0
        # value-level identity is exact for both
        assert (_MULAW_DEC[back] == _MULAW_DEC[codes]).all()

    def test_published_anchor_values(self):
        from oar_ocr_spark.functions.wav import _ALAW_DEC, _MULAW_DEC

        # G.711 extrema: mu-law full scale is +/-32124, A-law +/-32256;
        # mu code 0xFF is zero, A code 0xD5 is the smallest positive (8)
        assert _MULAW_DEC[0x80] == 32124 and _MULAW_DEC[0x00] == -32124
        assert _MULAW_DEC[0xFF] == 0
        assert _ALAW_DEC[0xAA] == 32256 and _ALAW_DEC[0x2A] == -32256
        assert _ALAW_DEC[0xD5] == 8 and _ALAW_DEC[0x55] == -8

    @pytest.mark.parametrize("law", ["mu", "a"])
    def test_roundtrip_within_segment_quantization(self, law):
        from oar_ocr_spark.functions.wav import encode_wav_g711

        samples, rate = render_audio("g711-ref")
        dec, rate2 = decode_wav(encode_wav_g711(samples, rate, law=law))
        assert rate2 == rate and dec.shape == (len(samples), 1)
        err = np.abs(dec[:, 0].astype(np.int32) - samples.astype(np.int32))
        # largest G.711 segment step is 256 -> max quantization error 255
        assert err.max() <= 255

    def test_stereo_and_determinism(self):
        from oar_ocr_spark.functions.wav import encode_wav_g711

        s, r = render_audio("g711-st")
        st = np.stack([s, (-s.astype(np.int32)).clip(-32768, 32767).astype(np.int16)], axis=1)
        a = encode_wav_g711(st, r, law="a")
        assert a == encode_wav_g711(st, r, law="a")
        dec, _ = decode_wav(a)
        assert dec.shape == (len(s), 2)

    def test_bad_inputs_raise(self):
        from oar_ocr_spark.functions.wav import encode_wav_g711

        s, r = render_audio("g711-bad")
        with pytest.raises(ValueError, match="law"):
            encode_wav_g711(s, r, law="ulaw")
        with pytest.raises(ValueError, match="int16"):
            encode_wav_g711(s.astype(np.int32), r)


class TestImaAdpcm:
    """IMA / DVI ADPCM (format tag 0x11)."""

    def test_roundtrip_tracks_waveform(self):
        from oar_ocr_spark.functions.wav import encode_wav_adpcm

        # smooth (voice-band) content: 4-bit ADPCM must reach > 20 dB
        t = np.arange(4000, dtype=np.float64)
        x = np.round(
            9000 * np.sin(2 * np.pi * 300 * t / 8000)
            + 3000 * np.sin(2 * np.pi * 700 * t / 8000)
        ).astype(np.int16)
        dec, rate2 = decode_wav(encode_wav_adpcm(x, 8000))
        assert rate2 == 8000 and len(dec) == len(x)
        err = dec[:, 0].astype(np.float64) - x.astype(np.float64)
        rms_sig = np.sqrt(np.mean(x.astype(np.float64) ** 2))
        assert np.sqrt(np.mean(err**2)) < 0.1 * rms_sig  # > 20 dB SNR

        # the hash fixture has near-Nyquist components (slew-limited by
        # design of 4-bit DPCM): still bounded, still length-exact
        samples, rate = render_audio("adpcm-ref")
        dec, _ = decode_wav(encode_wav_adpcm(samples, rate))
        assert len(dec) == len(samples)
        err = dec[:, 0].astype(np.float64) - samples.astype(np.float64)
        assert np.sqrt(np.mean(err**2)) < 0.25 * np.sqrt(
            np.mean(samples.astype(np.float64) ** 2)
        )

    def test_multi_block_and_fact_trim(self):
        from oar_ocr_spark.functions.wav import encode_wav_adpcm

        x = np.round(3000 * np.sin(np.arange(1000) / 7.0)).astype(np.int16)
        data = encode_wav_adpcm(x, 8000, samples_per_block=129)
        dec, _ = decode_wav(data)
        assert len(dec) == 1000  # fact chunk trims the padded tail
        # block independence: decoding only the first block's bytes
        # (patched lengths) must equal the first 129 samples
        err = dec[:, 0].astype(np.float64) - x.astype(np.float64)
        assert np.sqrt(np.mean(err**2)) < 0.1 * np.sqrt(np.mean(x.astype(np.float64) ** 2))

    def test_tiny_clips_all_lengths(self):
        from oar_ocr_spark.functions.wav import encode_wav_adpcm

        for n in (1, 2, 3, 4, 9):
            x = (np.arange(n, dtype=np.int32) * 900 - 1800).astype(np.int16)
            dec, _ = decode_wav(encode_wav_adpcm(x, 8000, samples_per_block=5))
            assert len(dec) == n
            assert dec[0, 0] == x[0]  # block header carries sample 0 verbatim

    def test_declared_failures(self):
        from oar_ocr_spark.functions.wav import encode_wav_adpcm

        s, r = render_audio("adpcm-bad")
        st = np.stack([s, s], axis=1)
        # multichannel encodes (TestStereoAdpcm), but needs whole
        # 4-byte channel words: (spb - 1) % 8 == 0
        with pytest.raises(ValueError, match="divisible by 8"):
            encode_wav_adpcm(st, r, samples_per_block=5)
        with pytest.raises(ValueError, match="odd"):
            encode_wav_adpcm(s, r, samples_per_block=4)
        with pytest.raises(ValueError, match="empty"):
            encode_wav_adpcm(np.zeros(0, dtype=np.int16), r)

    def test_inconsistent_samples_per_block_raises(self):
        from oar_ocr_spark.functions.wav import encode_wav_adpcm

        s, _ = render_audio("adpcm-hdr")
        data = bytearray(encode_wav_adpcm(s, 8000, samples_per_block=129))
        i = data.index(b"fmt ") + 8
        # fmt body: tag(2) ch(2) rate(4) byterate(4) align(2) bits(2)
        # cbSize(2) wSamplesPerBlock(2) -> patch wSamplesPerBlock
        data[i + 18 : i + 20] = struct.pack("<H", 77)
        with pytest.raises(ValueError, match="inconsistent"):
            decode_wav(bytes(data))


class TestMsAdpcm:
    """MS-ADPCM (format tag 2): per-block linear predictor pairs from
    the fmt chunk + adaptive iDelta quantizer."""

    def test_roundtrip_tracks_waveform(self):
        from oar_ocr_spark.functions.wav import encode_wav_msadpcm

        t = np.arange(4000, dtype=np.float64)
        x = np.round(
            9000 * np.sin(2 * np.pi * 300 * t / 8000)
            + 3000 * np.sin(2 * np.pi * 700 * t / 8000)
        ).astype(np.int16)
        data = encode_wav_msadpcm(x, 8000)
        assert data == encode_wav_msadpcm(x, 8000)  # deterministic
        dec, rate2 = decode_wav(data)
        assert rate2 == 8000 and len(dec) == len(x)
        err = dec[:, 0].astype(np.float64) - x.astype(np.float64)
        rms_sig = np.sqrt(np.mean(x.astype(np.float64) ** 2))
        assert np.sqrt(np.mean(err**2)) < 0.1 * rms_sig  # > 20 dB SNR

        samples, rate = render_audio("msadpcm-ref")
        dec, _ = decode_wav(encode_wav_msadpcm(samples, rate))
        assert len(dec) == len(samples)
        err = dec[:, 0].astype(np.float64) - samples.astype(np.float64)
        assert np.sqrt(np.mean(err**2)) < 0.25 * np.sqrt(
            np.mean(samples.astype(np.float64) ** 2)
        )

    def test_first_two_samples_verbatim_and_fact_trim(self):
        from oar_ocr_spark.functions.wav import encode_wav_msadpcm

        x = np.round(3000 * np.sin(np.arange(1001) / 7.0)).astype(np.int16)
        dec, _ = decode_wav(encode_wav_msadpcm(x, 8000, samples_per_block=128))
        assert len(dec) == 1001  # fact chunk trims the padded tail
        assert dec[0, 0] == x[0] and dec[1, 0] == x[1]  # header samples
        err = dec[:, 0].astype(np.float64) - x.astype(np.float64)
        assert np.sqrt(np.mean(err**2)) < 0.1 * np.sqrt(
            np.mean(x.astype(np.float64) ** 2)
        )

    def test_predictor_choice_adapts_to_content(self):
        # a pure ramp is exactly predicted by pair 1 (512, -256): the
        # encoder must pick it and the residual stream decodes exactly
        from oar_ocr_spark.functions.wav import encode_wav_msadpcm

        x = (np.arange(400, dtype=np.int32) * 7 - 1400).astype(np.int16)
        data = encode_wav_msadpcm(x, 8000, samples_per_block=400)
        i = data.index(b"data") + 8
        assert data[i] == 1  # bPredictor = (512,-256)
        dec, _ = decode_wav(data)
        assert (dec[:, 0] == x).all()  # linear content: lossless

    def test_tiny_clips_all_lengths(self):
        from oar_ocr_spark.functions.wav import encode_wav_msadpcm

        for n in (1, 2, 3, 4, 9):
            x = (np.arange(n, dtype=np.int32) * 900 - 1800).astype(np.int16)
            dec, _ = decode_wav(encode_wav_msadpcm(x, 8000, samples_per_block=6))
            assert len(dec) == n
            assert dec[0, 0] == x[0]

    def test_custom_coefficient_table_honored(self):
        # decode must use the FILE's pairs: patch pair 0 to the
        # identity predictor's double and re-point every block at it —
        # a spec-valid custom-table file our own encoder never writes
        from oar_ocr_spark.functions.wav import encode_wav_msadpcm

        x = np.round(2000 * np.sin(np.arange(200) / 5.0)).astype(np.int16)
        data = bytearray(encode_wav_msadpcm(x, 8000, samples_per_block=200))
        i = data.index(b"fmt ") + 8
        # fmt: base(16) cbSize(2) spb(2) ncoef(2) then pairs
        data[i + 22 : i + 26] = struct.pack("<hh", 256, 0)  # already pair 0
        dec_std, _ = decode_wav(bytes(data))
        data[i + 22 : i + 26] = struct.pack("<hh", 0, 0)  # kill predictor
        j = bytes(data).index(b"data") + 8
        data[j] = 0  # block uses pair 0
        dec_null, _ = decode_wav(bytes(data))
        assert not (dec_null[:, 0] == dec_std[:, 0]).all()

    def test_declared_failures(self):
        from oar_ocr_spark.functions.wav import encode_wav_msadpcm

        s, r = render_audio("msadpcm-bad")
        with pytest.raises(ValueError, match="even"):
            encode_wav_msadpcm(s, r, samples_per_block=5)
        with pytest.raises(ValueError, match="empty"):
            encode_wav_msadpcm(np.zeros(0, dtype=np.int16), r)
        data = bytearray(encode_wav_msadpcm(s, r))
        i = data.index(b"fmt ") + 8
        data[i + 18 : i + 20] = struct.pack("<H", 99)
        with pytest.raises(ValueError, match="inconsistent"):
            decode_wav(bytes(data))
        data[i + 18 : i + 20] = struct.pack("<H", 500)
        j = bytes(data).index(b"data") + 8
        data[j] = 9  # predictor index past the 7 declared pairs
        with pytest.raises(ValueError, match="coefficient pairs"):
            decode_wav(bytes(data))


class TestTelephonyStore:
    def test_flavor_split_covers_all_four(self, spark):
        import zlib

        from oar_ocr_spark.functions.wav import telephony_store_df

        refs_rows = [f"tel-{i}" for i in range(16)]
        assert {zlib.crc32(("g711:" + r).encode()) % 4 for r in refs_rows} == {0, 1, 2, 3}
        refs = spark.createDataFrame([(r,) for r in refs_rows], "media_ref string")
        feats = {
            r["media_ref"]: r
            for r in audio_features_from_bytes_df(telephony_store_df(refs)).collect()
        }
        from oar_ocr_spark.functions.wav import (
            encode_wav_adpcm,
            encode_wav_g711,
            encode_wav_msadpcm,
        )

        for ref in refs_rows:
            samples, rate = render_audio(ref)
            h = zlib.crc32(("g711:" + ref).encode())
            if h % 4 == 0:
                data = encode_wav_g711(samples, rate, law="mu")
            elif h % 4 == 1:
                data = encode_wav_g711(samples, rate, law="a")
            elif h % 4 == 2:
                data = encode_wav_adpcm(samples, rate, samples_per_block=129 if h & 4 else 505)
            else:
                data = encode_wav_msadpcm(samples, rate, samples_per_block=128 if h & 4 else 500)
            dec, _ = decode_wav(data)
            mono = dec[:, 0].astype(np.int64)
            want_rms = round(float(np.sqrt(np.sum(mono * mono) / len(mono))), 6)
            assert feats[ref]["rms"] == want_rms, ref
            assert feats[ref]["n_samples"] == len(mono)


class TestStereoAdpcm:
    """Multichannel IMA and MS ADPCM: IMA interleaves 4-byte
    (8-sample) channel words after per-channel headers; MS interleaves
    header fields and nibbles channel by channel. Channels predict
    independently, so a stereo decode must equal the two mono decodes
    side by side."""

    def _stereo(self):
        t = np.arange(3000, dtype=np.float64)
        left = np.round(9000 * np.sin(2 * np.pi * 300 * t / 8000)).astype(
            np.int16
        )
        right = np.round(
            7000 * np.sin(2 * np.pi * 440 * t / 8000 + 1.0)
        ).astype(np.int16)
        return left, right, np.stack([left, right], axis=1)

    def test_ima_stereo_equals_per_channel_mono(self):
        from oar_ocr_spark.functions.wav import encode_wav_adpcm

        left, right, st = self._stereo()
        dec, rate = decode_wav(encode_wav_adpcm(st, 8000, samples_per_block=505))
        assert rate == 8000 and dec.shape == (3000, 2)
        mono_l, _ = decode_wav(encode_wav_adpcm(left, 8000, samples_per_block=505))
        mono_r, _ = decode_wav(encode_wav_adpcm(right, 8000, samples_per_block=505))
        assert np.array_equal(dec[:, 0], mono_l[:, 0])
        assert np.array_equal(dec[:, 1], mono_r[:, 0])

    def test_ms_stereo_equals_per_channel_mono(self):
        from oar_ocr_spark.functions.wav import encode_wav_msadpcm

        left, right, st = self._stereo()
        dec, rate = decode_wav(encode_wav_msadpcm(st, 8000, samples_per_block=500))
        assert rate == 8000 and dec.shape == (3000, 2)
        mono_l, _ = decode_wav(encode_wav_msadpcm(left, 8000, samples_per_block=500))
        mono_r, _ = decode_wav(encode_wav_msadpcm(right, 8000, samples_per_block=500))
        assert np.array_equal(dec[:, 0], mono_l[:, 0])
        assert np.array_equal(dec[:, 1], mono_r[:, 0])

    def test_stereo_snr_and_fact_trim(self):
        from oar_ocr_spark.functions.wav import (
            encode_wav_adpcm,
            encode_wav_msadpcm,
        )

        left, right, st = self._stereo()
        for enc, spb in ((encode_wav_adpcm, 129), (encode_wav_msadpcm, 128)):
            dec, _ = decode_wav(enc(st, 8000, samples_per_block=spb))
            assert dec.shape == (3000, 2)  # fact chunk trims frames
            for c, x in ((0, left), (1, right)):
                err = dec[:, c].astype(np.float64) - x.astype(np.float64)
                rms = np.sqrt(np.mean(x.astype(np.float64) ** 2))
                assert np.sqrt(np.mean(err**2)) < 0.1 * rms, (enc, c)

    def test_four_channels(self):
        from oar_ocr_spark.functions.wav import (
            encode_wav_adpcm,
            encode_wav_msadpcm,
        )

        left, right, _ = self._stereo()
        q = np.stack(
            [left, right, (left // 2).astype(np.int16),
             (right // 3).astype(np.int16)],
            axis=1,
        )
        dec, _ = decode_wav(encode_wav_adpcm(q, 8000, samples_per_block=97))
        assert dec.shape == (3000, 4)
        dec, _ = decode_wav(encode_wav_msadpcm(q, 8000, samples_per_block=100))
        assert dec.shape == (3000, 4)

    def test_inconsistent_stereo_block_align_raises(self):
        from oar_ocr_spark.functions.wav import encode_wav_adpcm

        _, _, st = self._stereo()
        data = bytearray(encode_wav_adpcm(st, 8000, samples_per_block=505))
        i = data.index(b"fmt ") + 8
        data[i + 18 : i + 20] = struct.pack("<H", 505 + 8)  # wSamplesPerBlock
        with pytest.raises(ValueError, match="inconsistent"):
            decode_wav(bytes(data))
