"""Property tests (hypothesis) for the round-3 codecs.

The pytest vectors in test_jpeg/test_pdf/test_media_codecs pin known
inputs; these sweep randomized shapes/contents to flush entropy-coding
and container-parsing edge cases (extreme DC jumps, ZRL chains, 16-bit
amplitude boundaries, odd dims, many tiny pages)."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st
from hypothesis.extra.numpy import arrays

from oar_ocr_spark.functions.avi import decode_avi_frames, encode_avi_mjpeg
from oar_ocr_spark.functions.jpeg import decode_jpeg, encode_jpeg
from oar_ocr_spark.functions.pdf import decode_pdf, decode_pdf_refs, encode_pdf
from oar_ocr_spark.functions.png import decode_png, encode_png
from oar_ocr_spark.functions.wav import decode_wav, encode_wav

_gray = lambda h, w: arrays(np.uint8, (h, w), elements=st.integers(0, 255))


@settings(max_examples=40, deadline=None)
@given(
    st.integers(1, 40).flatmap(lambda h: st.integers(1, 40).flatmap(lambda w: _gray(h, w))),
    st.integers(50, 100),
)
def test_jpeg_roundtrip_random(img, quality):
    data = encode_jpeg(img, quality)
    out = decode_jpeg(data)
    assert out.shape == img.shape and out.dtype == np.uint8
    # worst-case reconstruction bound: quant steps are <= 121*scale/100;
    # at q=50 the largest step is 121 -> error provably < 200 even for
    # adversarial noise images. The bound here is loose on purpose: the
    # property is "decodes, right shape, sane values", tight bounds are
    # pinned on structured pages in test_jpeg.
    err = np.abs(out.astype(int) - img.astype(int)).max()
    assert err <= 200, err
    assert encode_jpeg(img, quality) == data


@settings(max_examples=40, deadline=None)
@given(
    st.integers(1, 30).flatmap(lambda h: st.integers(1, 30).flatmap(lambda w: _gray(h, w)))
)
def test_jpeg_q100_near_lossless_random(img):
    # q=100 quantization is all-ones, so the only error is coefficient
    # rounding: |e_uv| <= 0.5, and |pixel err| <= 0.5 * (sum_u |A[u,x]|)^2
    # <= 0.5 * (sqrt(1/8) + 7*0.5)^2 < 8. Structured pages measure +-1
    # (test_jpeg); adversarial noise blocks can reach a few units.
    out = decode_jpeg(encode_jpeg(img, 100))
    assert np.abs(out.astype(int) - img.astype(int)).max() < 8


@settings(max_examples=25, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(1, 24), st.integers(1, 24)),
        min_size=0,
        max_size=6,
    ),
    st.booleans(),
)
def test_pdf_roundtrip_random_page_sets(dims, with_refs):
    rng = np.random.RandomState(7)
    pages = [rng.randint(0, 256, (h, w)).astype(np.uint8) for h, w in dims]
    refs = [f"r{i}(weird)\\n" for i in range(len(pages))] if with_refs else None
    data = encode_pdf(pages, refs)
    out = decode_pdf(data)
    assert len(out) == len(pages)
    for got, want in zip(out, pages):
        assert (got == want).all()  # PDF path is lossless
    assert decode_pdf_refs(data) == refs


@settings(max_examples=25, deadline=None)
@given(
    st.integers(1, 2000),
    st.integers(1, 3),
    st.sampled_from([8000, 16000, 44100]),
)
def test_wav_roundtrip_random(n, channels, rate):
    rng = np.random.RandomState(n)
    samples = rng.randint(-32768, 32768, (n, channels)).astype(np.int16)
    out, rate2 = decode_wav(encode_wav(samples, rate))
    assert rate2 == rate and (out == samples).all()


@settings(max_examples=10, deadline=None)
@given(st.integers(1, 5), st.integers(8, 24), st.integers(8, 24))
def test_avi_roundtrip_random(n_frames, h, w):
    rng = np.random.RandomState(h * 100 + w)
    frames = [rng.randint(0, 256, (h, w)).astype(np.uint8) for _ in range(n_frames)]
    data = encode_avi_mjpeg(frames, quality=100)
    out = decode_avi_frames(data)
    assert len(out) == n_frames
    for got, want in zip(out, frames):
        assert np.abs(got.astype(int) - want.astype(int)).max() <= 1


@settings(max_examples=30, deadline=None)
@given(
    st.integers(1, 50).flatmap(lambda h: st.integers(1, 50).flatmap(lambda w: _gray(h, w)))
)
def test_png_roundtrip_random(img):
    assert (decode_png(encode_png(img)) == img).all()


_TAG_SOUP = st.lists(
    st.one_of(
        st.sampled_from(
            [
                "<div>", "</div>", "<p>", "</p>", "<a href='x'>", "</a>",
                "<li>", "</li>", "<nav>", "</nav>", "<script>", "</script>",
                "<template>", "</head>", "<body>", "<td>", "</table>",
                "<div class='sidebar'>", "<br>", "<img src=y>", "<!-- c -->",
                "&amp;", "&#65;", "<", ">", "</",
            ]
        ),
        st.text(alphabet="abc xyz\n\t&;", min_size=0, max_size=12),
    ),
    min_size=0,
    max_size=40,
)


@settings(max_examples=60, deadline=None)
@given(_TAG_SOUP)
def test_html_extractor_survives_tag_soup(parts):
    # arbitrary malformed markup must never crash the extractor, and the
    # result shape must stay sane (counters reconciled, no negatives)
    from oar_ocr_spark.functions.html import extract_main_content

    main, kept, dropped = extract_main_content("".join(parts))
    assert isinstance(main, str)
    assert kept >= 0 and dropped >= 0
    assert (kept == 0) == (main == "")


# ---------------------------------------------------------------------------
# round-4 decode surfaces: progressive JPEG, subsampled color, PNG subformats
# ---------------------------------------------------------------------------


@settings(max_examples=20, deadline=None)
@given(
    st.integers(1, 24).flatmap(lambda h: st.integers(1, 24).flatmap(lambda w: _gray(h, w))),
    st.integers(60, 100),
    st.sampled_from([0, 2, 5]),
)
def test_jpeg_progressive_equals_baseline_random(img, quality, ri):
    # the progressive encoder emits the SAME quantized coefficients as
    # the baseline encoder, so decode equality must hold for ANY image,
    # quality and restart interval — a sharp oracle over every scan type
    from oar_ocr_spark.functions.jpeg import encode_jpeg_progressive

    base = decode_jpeg(encode_jpeg(img, quality))
    prog = decode_jpeg(encode_jpeg_progressive(img, quality, restart_interval=ri))
    assert (base == prog).all()


@settings(max_examples=15, deadline=None)
@given(
    st.integers(1, 16),
    st.integers(1, 16),
    st.sampled_from(["444", "422", "440", "420"]),
    st.sampled_from([0, 3]),
)
def test_jpeg_color_flavors_roundtrip_random(h, w, sub, ri):
    rng = np.random.RandomState(h * 31 + w)
    img = rng.randint(0, 256, (h, w, 3)).astype(np.uint8)
    data = encode_jpeg(img, 90, subsampling=sub, restart_interval=ri)
    out = decode_jpeg(data)
    assert out.shape == img.shape and out.dtype == np.uint8
    assert encode_jpeg(img, 90, subsampling=sub, restart_interval=ri) == data
    # progressive flavor decodes to the identical pixels of ITS baseline
    from oar_ocr_spark.functions.jpeg import encode_jpeg_progressive

    prog = decode_jpeg(encode_jpeg_progressive(img, 90, subsampling=sub))
    assert (prog == out).all()


@settings(max_examples=30, deadline=None)
@given(
    st.sampled_from(
        [(0, 1), (0, 2), (0, 4), (0, 8), (0, 16), (2, 8), (2, 16), (3, 4), (3, 8), (4, 8), (6, 8)]
    ),
    st.integers(1, 14),
    st.integers(1, 14),
    st.booleans(),
)
def test_png_every_subformat_decodes_random(ct_depth, h, w, interlace):
    # every legal (color type, depth, interlace) combination must
    # decode with the documented 8-bit output conventions — checked
    # against the independent expectations computed here
    from test_png import _build_png

    ct, depth = ct_depth
    channels = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}[ct]
    rng = np.random.RandomState(h * 131 + w * 7 + ct + depth)
    hi = 16 if ct == 3 else (1 << depth)
    arr = rng.randint(0, min(hi, 1 << depth), (h, w, channels))
    plte = rng.randint(0, 256, (16, 3)) if ct == 3 else None
    got = decode_png(_build_png(arr, ct, depth, interlace=int(interlace), plte=plte))
    if ct == 0:
        want = arr[..., 0]
        if depth < 8:
            want = want * (255 // ((1 << depth) - 1))
        elif depth == 16:
            want = want >> 8
        assert (got == want).all()
    elif ct == 2:
        want = arr >> 8 if depth == 16 else arr
        assert (got == want).all()
    elif ct == 3:
        assert (got == plte[arr[..., 0]]).all()
    else:
        a = arr[..., -1:].astype(np.uint16)
        color = arr[..., :-1].astype(np.uint16)
        want = ((color * a + 255 * (255 - a) + 127) // 255).astype(np.uint8)
        if ct == 4:
            want = want.reshape(h, w)
        assert (got == want).all()


@settings(max_examples=25, deadline=None)
@given(
    st.integers(1, 20),
    st.integers(1, 20),
    st.sampled_from([2, 5, 16, 64]),
    st.booleans(),
    st.booleans(),
)
def test_gif_roundtrip_random(h, w, ncolors, interlace, transparent):
    from oar_ocr_spark.functions.gif import decode_gif, encode_gif

    rng = np.random.RandomState(h * 37 + w + ncolors)
    pal = rng.randint(0, 256, (ncolors, 3)).astype(np.uint8)
    idx = rng.randint(0, ncolors, (h, w)).astype(np.uint8)
    ti = 0 if transparent else None
    out = decode_gif(encode_gif(idx, pal, interlace=interlace, transparent_index=ti))
    want = pal[idx].copy()
    if transparent:
        want[idx == 0] = 255
    assert (out == want).all()


@settings(max_examples=20, deadline=None)
@given(
    st.integers(1, 16),
    st.integers(1, 16),
    st.sampled_from(["grey", "rgb", "bilevel"]),
    st.sampled_from(["none", "packbits"]),
    st.sampled_from([None, 3]),
)
def test_tiff_roundtrip_random(h, w, kind, comp, rps):
    from oar_ocr_spark.functions.tiff import decode_tiff, encode_tiff

    rng = np.random.RandomState(h * 61 + w)
    if kind == "rgb":
        img = rng.randint(0, 256, (h, w, 3)).astype(np.uint8)
        data = encode_tiff(img, compression=comp, rows_per_strip=rps)
    elif kind == "bilevel":
        img = (rng.randint(0, 2, (h, w)) * 255).astype(np.uint8)
        data = encode_tiff(img, compression=comp, bilevel=True, rows_per_strip=rps)
    else:
        img = rng.randint(0, 256, (h, w)).astype(np.uint8)
        data = encode_tiff(img, compression=comp, rows_per_strip=rps)
    assert (decode_tiff(data) == img).all()


@settings(max_examples=20, deadline=None)
@given(
    st.integers(1, 16),
    st.integers(1, 16),
    st.sampled_from(["true", "pal", "rle"]),
)
def test_bmp_roundtrip_random(h, w, kind):
    from oar_ocr_spark.functions.bmp import decode_bmp, encode_bmp

    rng = np.random.RandomState(h * 53 + w)
    if kind == "true":
        img = rng.randint(0, 256, (h, w, 3)).astype(np.uint8)
        assert (decode_bmp(encode_bmp(img)) == img).all()
    else:
        pal = rng.randint(0, 256, (16, 3)).astype(np.uint8)
        idx = rng.randint(0, 16, (h, w)).astype(np.uint8)
        data = encode_bmp(idx, pal, rle=(kind == "rle"))
        assert (decode_bmp(data) == pal[idx]).all()


# --- born-digital PDF text layer (writer ⇄ extractor twins) ---------

from oar_ocr_spark.functions.pdf_text import decode_pdf_text

_CP1252_SAFE = (
    "abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789"
    " .,;:!?()[]{}#$%&*+-=/@_'\"\\€—éüñß§"
)
_UNI_EXTRA = "Δλπ∈≤≥→日本語中文한글ру́сский"


def _texts(alphabet: str):
    return (
        st.text(alphabet=alphabet, min_size=1, max_size=100)
        .map(lambda s: s.strip(" ") or "x")
    )


@settings(max_examples=30, deadline=None)
@given(
    _texts(_CP1252_SAFE),
    st.sampled_from(
        ["literal", "hex", "tj", "words", "para", "cid", "diff",
         "type3", "rot", "cidv", "mix"]
    ),
)
def test_pdf_text_roundtrip_random(text, fmt):
    # para cannot represent empty lines and words cannot represent
    # newlines — the strategy's alphabet has none, so every flavor
    # must roundtrip the exact string
    data = encode_pdf([text], ["p0"], text_format=fmt)
    assert decode_pdf_text(data) == [text]


@settings(max_examples=30, deadline=None)
@given(
    _texts(_CP1252_SAFE + _UNI_EXTRA),
    st.sampled_from(["cid", "cidv", "diff", "type3", "rot", "mix"]),
)
def test_pdf_text_unicode_roundtrip_random(text, fmt):
    # the unicode-capable flavors (and the choosers' beyond-cp1252
    # refit) carry arbitrary BMP text
    data = encode_pdf([text], ["u0"], text_format=fmt)
    assert decode_pdf_text(data) == [text]


@settings(max_examples=15, deadline=None)
@given(
    st.lists(_texts(_CP1252_SAFE), min_size=1, max_size=5),
    st.sampled_from(["classic", "stream"]),
    st.sampled_from([None, "rc4-128", "aes-128"]),
)
def test_pdf_text_multipage_mix_random(texts, xref, enc):
    data = encode_pdf(
        texts, [str(i) for i in range(len(texts))],
        text_format="mix", xref_format=xref, encrypt=enc,
    )
    assert decode_pdf_text(data) == texts


@settings(max_examples=25, deadline=None)
@given(
    st.integers(5, 40),
    st.integers(5, 40),
    st.sampled_from([(2, 2), (1, 2), (2, 1), (4, 4)]),
    st.sampled_from([None, 16]),
    st.integers(0, 3),
)
def test_jp2_subsampled_matches_model_random(h, w, sub, ts, levels):
    """Random dims x factor pairs x tiling x depth: the decode equals
    the closed-form forward-RCT + decimate + replicate + inverse-RCT
    model EXACTLY, and reference-grid samples equal the original."""
    from oar_ocr_spark.functions.jp2 import decode_j2k, encode_j2k

    rng = np.random.default_rng(h * 1000 + w * 10 + sub[0])
    img = rng.integers(0, 256, (h, w, 3)).astype(np.uint8)
    yr, xr = sub
    out = decode_j2k(encode_j2k(img, levels=levels, subsampling=sub, tile_size=ts))
    r, g, b = (img[..., i].astype(np.int64) - 128 for i in range(3))
    y = (r + 2 * g + b) >> 2
    u, v = b - g, r - g
    u = u[::yr, ::xr].repeat(yr, 0).repeat(xr, 1)[:h, :w]
    v = v[::yr, ::xr].repeat(yr, 0).repeat(xr, 1)[:h, :w]
    g2 = y - ((u + v) >> 2)
    want = np.clip(np.stack([v + g2, g2, u + g2], -1) + 128, 0, 255).astype(np.uint8)
    assert (out == want).all()
    assert (out[::yr, ::xr] == img[::yr, ::xr]).all()


@settings(max_examples=25, deadline=None)
@given(
    st.integers(1, 40),
    st.integers(1, 40),
    st.integers(0, 3),
    st.integers(0, 4),
    st.integers(0, 4),
)
def test_jp2_offset_equals_unoffset_random(h, w, levels, ky, kx):
    """Random dims x levels x lattice-aligned origins: bit-identical to
    the unoffset stream."""
    from oar_ocr_spark.functions.jp2 import decode_j2k, encode_j2k

    rng = np.random.default_rng(h * 999 + w)
    img = rng.integers(0, 256, (h, w)).astype(np.uint8)
    origin = ((1 << levels) * ky, (1 << levels) * kx)
    a = decode_j2k(encode_j2k(img, levels=levels, origin=origin))
    b = decode_j2k(encode_j2k(img, levels=levels))
    assert (a == b).all()


@settings(max_examples=30, deadline=None)
@given(
    st.integers(1, 40),
    st.integers(1, 40),
    st.sampled_from([2, 4]),
    st.sampled_from(["grey", "grey0", "palette"]),
    st.booleans(),
)
def test_tiff_subbyte_random(h, w, depth, kind, tiled):
    """Random dims x 2/4-bit depth x grey polarity/palette x
    strip-vs-tile: packed sub-byte samples decode to the exact
    integer range expansion / palette projection."""
    from oar_ocr_spark.functions.tiff import decode_tiff

    from tests.test_tiff import _pack_subbyte_rows, _strip_le, _tiled_le

    rng = np.random.default_rng(h * 777 + w * 7 + depth)
    vals = rng.integers(0, 1 << depth, (h, w)).astype(np.uint8)
    scale = 255 // ((1 << depth) - 1)
    if kind == "palette":
        n = 1 << depth
        cmap16 = rng.integers(0, 65536, (3, n)).astype(np.uint16)
        extra = [(320, 3, 3 * n, cmap16.astype("<u2").tobytes())]
        photo, want = 3, (cmap16.T >> 8).astype(np.uint8)[vals]
    else:
        extra = []
        photo = 0 if kind == "grey0" else 1
        want = vals * scale if photo == 1 else 255 - vals * scale
    if tiled:
        tl = tw_ = 16
        tiles = []
        for r in range(0, h, tl):
            for c in range(0, w, tw_):
                block = np.zeros((tl, tw_), np.uint8)
                part = vals[r : r + tl, c : c + tw_]
                block[: part.shape[0], : part.shape[1]] = part
                tiles.append(_pack_subbyte_rows(block, depth))
        data = _tiled_le(
            w, h, tw_, tl, tiles, bits=(depth,), photo=photo,
            extra_tags=tuple(extra),
        )
    else:
        data = _strip_le(
            w, h, _pack_subbyte_rows(vals, depth), bits=(depth,),
            photo=photo, extra_tags=extra,
        )
    assert (decode_tiff(data) == want).all()
