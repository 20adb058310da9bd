"""Materialize golden-fixture parquet for the extraction-track oracles.

The five extraction-track driver queries (extraction_e2e / _rotated /
_warped, structure_extract, document_markdown) and media_decode_stats
are OCR/layout pipelines DuckDB cannot run — but their outputs are
deterministic functions of each document's media_ref strings and span
layout. This tool runs the single-process Python twins
(local_ref.extract_page, structure.structure_page_record,
structure.concatenate_markdown_pages — the same functions the Spark
UDFs call, pinned by the pytest golden gate) over every media ref the
driver queries can touch at sf0.001/0.01/0.1 and writes the results as
parquet under oar_ocr_spark/fixtures/golden/. __spark_entry__'s
oracle_sql() then reconstructs the full relational output (span
interleaving, ordering, joins) in plain SQL over these tables, closing
the CORRECTNESS gate for the pipeline queries.

Golden tables (all keyed by content, so they are sf-independent):
- media_rec.parquet        (media_ref, det_rank, rec_text)
- media_features.parquet   (media_ref, width, height, mean_intensity,
                            ink_ratio, n_regions)
- structure_pages.parquet  (media_ref, element_type, element_text,
                            element_html, order_index, para_start, para_end)
- document_markdown.parquet(doc_id, seq_hash, markdown) where seq_hash
                            = md5 of the doc's media_ref sequence
- media_features_jpeg.parquet — features through the LOSSY byte path
                            (render → encode_jpeg(q100) → decode →
                            features), so the JPEG oracle never
                            assumes losslessness
- media_features_jp2.parquet — features through the JPEG 2000 byte
                            path (render → jp2_payload_for_ref, the
                            same crc32 flavor pick as the media store:
                            lossless 5/3 or irreversible 9/7 → decode
                            → features), so the jp2 oracle never
                            assumes the lossy flavors are lossless
- media_features_fax.parquet — features through the scanned-fax byte
                            path (render → threshold to bilevel →
                            CCITT-TIFF encode → decode → features);
                            CCITT is lossless on bilevel input, so the
                            twin reduces to the threshold
- audio_features.parquet    — WAV roundtrip clip features (twin of
                            wav.audio_features_from_bytes_df)
- audio_features_telephony.parquet — features through the lossy G.711
                            mu-law / A-law / IMA ADPCM / MS-ADPCM byte
                            path (same crc32 flavor pick as
                            wav.telephony_store_df)
- video_frames.parquet      — AVI-MJPEG sampled-frame features (twin
                            of avi.frame_sample_from_bytes_df)

Usage: python tools/make_goldens.py [sf_dir ...]
"""

from __future__ import annotations

import hashlib
import os
import sys

os.environ.setdefault("OMP_NUM_THREADS", "1")
os.environ.setdefault("OPENBLAS_NUM_THREADS", "1")
os.environ.setdefault("MKL_NUM_THREADS", "1")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

GOLDEN_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "oar_ocr_spark",
    "fixtures",
    "golden",
)

# driver-query doc filters: imported from the single source of truth
# in __spark_entry__ (the queries and oracle SQL use the same names)
from __spark_entry__ import (  # noqa: E402
    AUDIO_MOD,
    E2E_MOD,
    FAX_MOD,
    FEATURES_MOD,
    JP2_MOD,
    DEEPJPEG_MOD,
    JPEG_MOD,
    ROTWARP_MOD,
    STRUCT_MOD,
    VIDEO_MOD,
)


def _cfg_for(ref: str):
    from oar_ocr_spark.local_ref import ExtractConfig

    if ref.startswith("rot:"):
        return ExtractConfig(text_type="rotated")
    if ref.startswith("warp:"):
        return ExtractConfig(use_rectification=True)
    return ExtractConfig()


def _rec_rows(ref: str) -> list[tuple[str, int, str]]:
    from oar_ocr_spark.fixtures.render import render_page
    from oar_ocr_spark.local_ref import extract_page

    img = render_page(ref)
    return [(ref, i, text) for i, (text, _conf) in enumerate(extract_page(img, _cfg_for(ref)))]


def _feature_row(ref: str) -> tuple:
    import numpy as np

    from oar_ocr_spark.fixtures.render import render_page
    from oar_ocr_spark.local_ref import ExtractConfig, detect_page, preprocess_page

    cfg = ExtractConfig()
    img = render_page(ref)
    upright, _ = preprocess_page(img, cfg)
    boxes, _ = detect_page(upright, cfg)
    return (
        ref,
        int(img.shape[1]),
        int(img.shape[0]),
        np.float32(img.mean()),
        np.float32((img < 200).mean()),
        int(len(boxes)),
    )


def _jpeg_feature_row(ref: str) -> tuple:
    """Features through the lossy byte path: render → encode_jpeg(q100)
    → decode_jpeg → the same feature function. Deterministic because
    both codec directions are (the twin of
    multimodal.image_features_from_bytes_df over jpeg_store_df)."""
    import numpy as np

    from oar_ocr_spark.fixtures.render import render_page
    from oar_ocr_spark.functions.jpeg import decode_jpeg, encode_jpeg
    from oar_ocr_spark.local_ref import ExtractConfig, detect_page, preprocess_page

    cfg = ExtractConfig()
    img = decode_jpeg(encode_jpeg(render_page(ref), quality=100))
    upright, _ = preprocess_page(img, cfg)
    boxes, _ = detect_page(upright, cfg)
    return (
        ref,
        int(img.shape[1]),
        int(img.shape[0]),
        np.float32(img.mean()),
        np.float32((img < 200).mean()),
        int(len(boxes)),
    )


def _audio_feature_row(ref: str) -> tuple:
    """Twin of wav.audio_features_from_bytes_df over wav_store_df."""
    import numpy as np

    from oar_ocr_spark.functions.wav import decode_wav, encode_wav, render_audio

    samples, rate = render_audio(ref)
    out, rate2 = decode_wav(encode_wav(samples, rate))
    mono = out[:, 0].astype(np.int64)
    n = len(mono)
    rms = float(np.sqrt(np.sum(mono * mono) / n)) if n else 0.0
    sign = np.sign(mono)
    compact = sign[sign != 0]
    zc = int(np.count_nonzero(np.diff(compact) != 0))
    return (
        ref,
        n,
        rate2,
        int(n * 1000 // rate2),
        round(rms, 6),
        int(np.max(np.abs(mono))) if n else 0,
        zc,
    )


def _telephony_feature_row(ref: str) -> tuple:
    """Twin of wav.audio_features_from_bytes_df over telephony_store_df
    (same crc32 flavor pick, same lossy encode-then-decode path)."""
    import zlib

    import numpy as np

    from oar_ocr_spark.functions.wav import (
        decode_wav,
        encode_wav_adpcm,
        encode_wav_g711,
        encode_wav_msadpcm,
        render_audio,
    )

    samples, rate = render_audio(ref)
    h = zlib.crc32(("g711:" + ref).encode("utf-8"))
    flavor = h % 4
    if flavor == 0:
        data = encode_wav_g711(samples, rate, law="mu")
    elif flavor == 1:
        data = encode_wav_g711(samples, rate, law="a")
    elif flavor == 2:
        data = encode_wav_adpcm(samples, rate, samples_per_block=129 if h & 4 else 505)
    else:
        data = encode_wav_msadpcm(samples, rate, samples_per_block=128 if h & 4 else 500)
    out, rate2 = decode_wav(data)
    mono = out[:, 0].astype(np.int64)
    n = len(mono)
    rms = float(np.sqrt(np.sum(mono * mono) / n)) if n else 0.0
    sign = np.sign(mono)
    compact = sign[sign != 0]
    zc = int(np.count_nonzero(np.diff(compact) != 0))
    return (
        ref,
        n,
        rate2,
        int(n * 1000 // rate2),
        round(rms, 6),
        int(np.max(np.abs(mono))) if n else 0,
        zc,
    )


def _video_frame_rows(ref: str) -> list[tuple]:
    """Twin of avi.frame_sample_from_bytes_df over video_store_df
    (8 frames encoded, 4 sampled via the container index)."""
    from oar_ocr_spark.functions.avi import (
        avi_frame_count,
        decode_avi_frames,
        encode_avi_mjpeg,
        render_video_frames,
    )

    data = encode_avi_mjpeg(render_video_frames(ref, 8), quality=100)
    total = avi_frame_count(data)
    idx = sorted({(total * k) // 4 for k in range(4)})
    rows = []
    for i, frame in zip(idx, decode_avi_frames(data, idx)):
        rows.append(
            (
                ref,
                int(i),
                int(frame.shape[0]),
                int(frame.shape[1]),
                round(float(frame.mean()), 6),
                round(float((frame < 200).mean()), 6),
            )
        )
    return rows


def _structure_page(ref: str) -> tuple[list[tuple], str, bool, bool]:
    """Per-page structure golden: (element rows, markdown, p_start, p_end)."""
    from oar_ocr_spark.local_ref import ExtractConfig
    from oar_ocr_spark.structure import structure_page_record

    els, markdown, _html, p_start, p_end = structure_page_record(ref, ExtractConfig())
    rows = [
        (ref, e.element_type, e.text, e.html, int(e.order_index), p_start, p_end)
        for e in els
    ]
    return rows, markdown, p_start, p_end


def _deepjpeg_feature_row(ref: str) -> tuple:
    """Features through the 12-bit extended-sequential DCT byte path:
    render → deep_jpeg_payload_for_ref (the SAME crc32-flavored
    encoder the media store runs) → decode_jpeg (top-8 projection at
    the seam) → the same feature function, so the oracle never
    assumes the lossy 12-bit DCT is lossless (the twin of
    multimodal.image_features_from_bytes_df over deep_jpeg_store_df)."""
    import numpy as np

    from oar_ocr_spark.fixtures.render import render_page
    from oar_ocr_spark.functions.jpeg import decode_jpeg
    from oar_ocr_spark.functions.multimodal import deep_jpeg_payload_for_ref
    from oar_ocr_spark.local_ref import ExtractConfig, detect_page, preprocess_page

    cfg = ExtractConfig()
    img = decode_jpeg(deep_jpeg_payload_for_ref(ref, render_page(ref)))
    upright, _ = preprocess_page(img, cfg)
    boxes, _ = detect_page(upright, cfg)
    return (
        ref,
        int(img.shape[1]),
        int(img.shape[0]),
        np.float32(img.mean()),
        np.float32((img < 200).mean()),
        int(len(boxes)),
    )


def _jp2_feature_row(ref: str) -> tuple:
    """Features through the JPEG 2000 byte path: render →
    jp2_payload_for_ref (the SAME crc32-flavored encoder the media
    store runs — lossless 5/3 or irreversible 9/7, shared
    implementation) → decode_jp2 → the same feature function, so the
    oracle never assumes the 9/7 flavors are lossless (the twin of
    multimodal.image_features_from_bytes_df over jp2_store_df)."""
    import numpy as np

    from oar_ocr_spark.fixtures.render import render_page
    from oar_ocr_spark.functions.jp2 import decode_jp2
    from oar_ocr_spark.functions.multimodal import _to_grey, jp2_payload_for_ref
    from oar_ocr_spark.local_ref import ExtractConfig, detect_page, preprocess_page

    cfg = ExtractConfig()
    # _to_grey mirrors the seam's dispatch (identity on grey flavors,
    # exact on the subsampled colour flavor's equal-channel RGB)
    img = _to_grey(decode_jp2(jp2_payload_for_ref(ref, render_page(ref))))
    upright, _ = preprocess_page(img, cfg)
    boxes, _ = detect_page(upright, cfg)
    return (
        ref,
        int(img.shape[1]),
        int(img.shape[0]),
        np.float32(img.mean()),
        np.float32((img < 200).mean()),
        int(len(boxes)),
    )


def _fax_feature_row(ref: str) -> tuple:
    """Features through the scanned-fax byte path: render → threshold
    to bilevel (>=128 → 255) → the same feature function. CCITT G3/G4
    is lossless on bilevel input (pinned by test_ccitt/test_tiff
    roundtrips), so the byte path reduces to the threshold (the twin of
    multimodal.image_features_from_bytes_df over fax_store_df)."""
    import numpy as np

    from oar_ocr_spark.fixtures.render import render_page
    from oar_ocr_spark.local_ref import ExtractConfig, detect_page, preprocess_page

    cfg = ExtractConfig()
    img = np.where(render_page(ref) >= 128, 255, 0).astype(np.uint8)
    upright, _ = preprocess_page(img, cfg)
    boxes, _ = detect_page(upright, cfg)
    return (
        ref,
        int(img.shape[1]),
        int(img.shape[0]),
        np.float32(img.mean()),
        np.float32((img < 200).mean()),
        int(len(boxes)),
    )


def main() -> int:
    import duckdb
    import pandas as pd
    from multiprocessing import Pool

    from __spark_entry__ import SPAN_DERIVATION_DUCKDB

    sf_dirs = sys.argv[1:] or [
        "/root/testdata/sf0.001",
        "/root/testdata/sf0.01",
        "/root/testdata/sf0.1",
    ]

    rec_refs: set[str] = set()
    feat_refs: set[str] = set()
    struct_refs: set[str] = set()
    jpeg_refs: set[str] = set()
    deepjpeg_refs: set[str] = set()
    jp2_refs: set[str] = set()
    fax_refs: set[str] = set()
    audio_refs: set[str] = set()
    video_refs: set[str] = set()
    # doc markdown work: (doc_id, seq_hash) -> ordered ref list
    md_docs: dict[tuple[str, str], list[str]] = {}

    con = duckdb.connect()
    for sf_dir in sf_dirs:
        con.sql(
            "create or replace view documents as "
            f"select * from '{os.path.join(sf_dir, 'documents.parquet')}'"
        )
        media = con.sql(
            f"with spans as ({SPAN_DERIVATION_DUCKDB}) "
            "select doc_id, span_offset, media_ref, cast(doc_id as bigint) as did "
            "from spans where kind = 'media' order by doc_id, span_offset"
        ).df()
        for _, r in media.iterrows():
            did, ref = int(r["did"]), r["media_ref"]
            if did % E2E_MOD == 0:
                rec_refs.add(ref)
            if did % ROTWARP_MOD == 0:
                rec_refs.add("rot:" + ref)
                rec_refs.add("warp:" + ref)
            if did % FEATURES_MOD == 0:
                feat_refs.add(ref)
            if did % STRUCT_MOD == 0:
                struct_refs.add(ref)
            if did % JPEG_MOD == 0:
                jpeg_refs.add(ref)
            if did % DEEPJPEG_MOD == 0:
                deepjpeg_refs.add(ref)
            if did % FAX_MOD == 0:
                fax_refs.add(ref)
            if did % AUDIO_MOD == 0:
                audio_refs.add(ref)
            if did % VIDEO_MOD == 0:
                video_refs.add(ref)
        # the jp2 gate query drives a deterministic 48-ref slice per sf
        # (order by media_ref limit 48) — mirror that cap here
        jp2_refs.update(
            sorted(set(media.loc[media["did"] % JP2_MOD == 0, "media_ref"]))[:48]
        )
        sub = media[media["did"] % STRUCT_MOD == 0]
        for doc_id, grp in sub.groupby("doc_id"):
            refs = list(grp.sort_values("span_offset")["media_ref"])
            seq_hash = hashlib.md5("|".join(refs).encode()).hexdigest()
            md_docs.setdefault((str(doc_id), seq_hash), refs)

    print(
        f"work: rec={len(rec_refs)} features={len(feat_refs)} "
        f"structure={len(struct_refs)} markdown_docs={len(md_docs)}"
    )

    os.makedirs(GOLDEN_DIR, exist_ok=True)
    with Pool(processes=min(16, os.cpu_count() or 4)) as pool:
        rec_rows = [row for rows in pool.map(_rec_rows, sorted(rec_refs), 32) for row in rows]
        feat_rows = pool.map(_feature_row, sorted(feat_refs), 32)
        struct_results = pool.map(_structure_page, sorted(struct_refs), 16)
        jpeg_rows = pool.map(_jpeg_feature_row, sorted(jpeg_refs), 32)
        deepjpeg_rows = pool.map(_deepjpeg_feature_row, sorted(deepjpeg_refs), 32)
        jp2_rows = pool.map(_jp2_feature_row, sorted(jp2_refs), 4)
        fax_rows = pool.map(_fax_feature_row, sorted(fax_refs), 32)
        audio_rows = pool.map(_audio_feature_row, sorted(audio_refs), 32)
        tel_rows = pool.map(_telephony_feature_row, sorted(audio_refs), 32)
        video_rows = [
            row
            for rows in pool.map(_video_frame_rows, sorted(video_refs), 16)
            for row in rows
        ]

    struct_rows: list[tuple] = []
    page_md: dict[str, tuple[str, bool, bool]] = {}
    for ref, (rows, markdown, p_start, p_end) in zip(sorted(struct_refs), struct_results):
        struct_rows.extend(rows)
        page_md[ref] = (markdown, p_start, p_end)

    from oar_ocr_spark.structure import concatenate_markdown_pages

    md_rows = []
    for (doc_id, seq_hash), refs in sorted(md_docs.items()):
        pages = [(page_md[r][0], (page_md[r][1], page_md[r][2])) for r in refs]
        md_rows.append((doc_id, seq_hash, concatenate_markdown_pages(pages)))

    import pyarrow as pa
    import pyarrow.parquet as pq

    def write(name: str, df: pd.DataFrame, schema: pa.Schema) -> None:
        path = os.path.join(GOLDEN_DIR, name)
        pq.write_table(pa.Table.from_pandas(df, schema=schema, preserve_index=False), path)
        print(f"wrote {path}: {len(df)} rows")

    write(
        "media_rec.parquet",
        pd.DataFrame(rec_rows, columns=["media_ref", "det_rank", "rec_text"]),
        pa.schema(
            [("media_ref", pa.string()), ("det_rank", pa.int32()), ("rec_text", pa.string())]
        ),
    )
    write(
        "media_features.parquet",
        pd.DataFrame(
            feat_rows,
            columns=["media_ref", "width", "height", "mean_intensity", "ink_ratio", "n_regions"],
        ),
        pa.schema(
            [
                ("media_ref", pa.string()),
                ("width", pa.int32()),
                ("height", pa.int32()),
                ("mean_intensity", pa.float32()),
                ("ink_ratio", pa.float32()),
                ("n_regions", pa.int32()),
            ]
        ),
    )
    write(
        "structure_pages.parquet",
        pd.DataFrame(
            struct_rows,
            columns=[
                "media_ref",
                "element_type",
                "element_text",
                "element_html",
                "order_index",
                "para_start",
                "para_end",
            ],
        ),
        pa.schema(
            [
                ("media_ref", pa.string()),
                ("element_type", pa.string()),
                ("element_text", pa.string()),
                ("element_html", pa.string()),
                ("order_index", pa.int32()),
                ("para_start", pa.bool_()),
                ("para_end", pa.bool_()),
            ]
        ),
    )
    write(
        "document_markdown.parquet",
        pd.DataFrame(md_rows, columns=["doc_id", "seq_hash", "markdown"]),
        pa.schema(
            [("doc_id", pa.string()), ("seq_hash", pa.string()), ("markdown", pa.string())]
        ),
    )
    write(
        "media_features_jpeg.parquet",
        pd.DataFrame(
            jpeg_rows,
            columns=["media_ref", "width", "height", "mean_intensity", "ink_ratio", "n_regions"],
        ),
        pa.schema(
            [
                ("media_ref", pa.string()),
                ("width", pa.int32()),
                ("height", pa.int32()),
                ("mean_intensity", pa.float32()),
                ("ink_ratio", pa.float32()),
                ("n_regions", pa.int32()),
            ]
        ),
    )
    write(
        "media_features_deepjpeg.parquet",
        pd.DataFrame(
            deepjpeg_rows,
            columns=["media_ref", "width", "height", "mean_intensity", "ink_ratio", "n_regions"],
        ),
        pa.schema(
            [
                ("media_ref", pa.string()),
                ("width", pa.int32()),
                ("height", pa.int32()),
                ("mean_intensity", pa.float32()),
                ("ink_ratio", pa.float32()),
                ("n_regions", pa.int32()),
            ]
        ),
    )
    write(
        "media_features_jp2.parquet",
        pd.DataFrame(
            jp2_rows,
            columns=["media_ref", "width", "height", "mean_intensity", "ink_ratio", "n_regions"],
        ),
        pa.schema(
            [
                ("media_ref", pa.string()),
                ("width", pa.int32()),
                ("height", pa.int32()),
                ("mean_intensity", pa.float32()),
                ("ink_ratio", pa.float32()),
                ("n_regions", pa.int32()),
            ]
        ),
    )
    write(
        "media_features_fax.parquet",
        pd.DataFrame(
            fax_rows,
            columns=["media_ref", "width", "height", "mean_intensity", "ink_ratio", "n_regions"],
        ),
        pa.schema(
            [
                ("media_ref", pa.string()),
                ("width", pa.int32()),
                ("height", pa.int32()),
                ("mean_intensity", pa.float32()),
                ("ink_ratio", pa.float32()),
                ("n_regions", pa.int32()),
            ]
        ),
    )
    write(
        "audio_features.parquet",
        pd.DataFrame(
            audio_rows,
            columns=[
                "media_ref",
                "n_samples",
                "sample_rate",
                "duration_ms",
                "rms",
                "peak",
                "zero_crossings",
            ],
        ),
        pa.schema(
            [
                ("media_ref", pa.string()),
                ("n_samples", pa.int32()),
                ("sample_rate", pa.int32()),
                ("duration_ms", pa.int32()),
                ("rms", pa.float64()),
                ("peak", pa.int32()),
                ("zero_crossings", pa.int32()),
            ]
        ),
    )
    write(
        "audio_features_telephony.parquet",
        pd.DataFrame(
            tel_rows,
            columns=[
                "media_ref",
                "n_samples",
                "sample_rate",
                "duration_ms",
                "rms",
                "peak",
                "zero_crossings",
            ],
        ),
        pa.schema(
            [
                ("media_ref", pa.string()),
                ("n_samples", pa.int32()),
                ("sample_rate", pa.int32()),
                ("duration_ms", pa.int32()),
                ("rms", pa.float64()),
                ("peak", pa.int32()),
                ("zero_crossings", pa.int32()),
            ]
        ),
    )
    write(
        "video_frames.parquet",
        pd.DataFrame(
            video_rows,
            columns=["media_ref", "frame_idx", "height", "width", "mean_intensity", "ink_ratio"],
        ),
        pa.schema(
            [
                ("media_ref", pa.string()),
                ("frame_idx", pa.int32()),
                ("height", pa.int32()),
                ("width", pa.int32()),
                ("mean_intensity", pa.float64()),
                ("ink_ratio", pa.float64()),
            ]
        ),
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
