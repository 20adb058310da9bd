"""The Spark extraction DAG (SURVEY.md §7 target DAG).

    documents(doc_id, spans)
      │ repartition(P, doc_id)                      -- explicit N→4N scaling
      ├─ text spans: explode(filter(kind='text'))   -- pure HOFs, no UDF
      └─ media spans: explode(filter(kind='media'))
           → [detect stage: mapInPandas]            -- render→orient→mask→
             (doc_id, offset, media_ref,               resize→DB→sort→crop,
              det_idx, crop, wh_ratio, bucket)         one Python boundary
           → repartition(P, doc_id, offset, det_idx)-- spreads heavy docs
           → sortWithinPartitions(bucket, wh_ratio) -- width-tight batches
           → [recognize stage: mapInPandas]         -- stack per bucket →
             (doc_id, offset, det_idx, text, conf)     logits → CTC decode
      → union → groupBy(doc_id).agg(sort_array(collect_list(...)))
      → transform with index → results(doc_id, spans)

Design notes (scale rationale):
- The reference's per-stage graph (preprocess → detect → crop) is fused
  into ONE mapInPandas: pages never cross the JVM↔Python boundary more
  than once, and only small crops enter the shuffle (the reference's
  zero-copy Arc<RgbImage> sharing, ocr.rs:565, has the same goal).
- The crop repartition is the distributed analog of the reference's
  *global crop pooling* (ocr.rs:594-634): a heavy many-region document
  fans its crops across all partitions (hash on (doc_id, offset,
  det_idx) = built-in key salting), so recognition load is balanced
  regardless of document skew; AQE handles residual imbalance.
- sortWithinPartitions(bucket, wh_ratio) reproduces the reference's
  wh_ratio-sorted recognition batches (ocr.rs:802-831) without any
  global sort barrier.
- Recognition width uses the *per-crop* bucket, not the Arrow batch
  max (aspect_ratio_bucketing.rs approach), so decoded text is
  independent of batch composition → span output is identical at any
  parallelism (north_rule partition invariance).
- `pooled=False` skips the crop shuffle and recognizes inside the
  detect task — fewer shuffles, but no cross-page batching and no skew
  spreading; bench.py compares both.
- Final assembly is pure Catalyst (sort_array + transform): no window
  state, one shuffle for the groupBy.
"""

from __future__ import annotations

import time
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .local_ref import ExtractConfig, bucket_ratio, preprocess_page
from .models.synthetic import BG, CHAR_BASE, VOCAB, classify_line_orientation
from .operators.ctc import ctc_collapse_batch
from .schemas import CROPS_SCHEMA, REC_SCHEMA, RESULTS_SCHEMA

__all__ = ["extract_spans", "detect_crops_df", "recognize_df", "assemble_results"]


# --------------------------------------------------------------------------
# stage bodies (plain python over numpy, called from mapInPandas iterators)
# --------------------------------------------------------------------------

def _detect_one_page(
    doc_id: str,
    offset: int,
    media_ref: str,
    cfg: ExtractConfig,
    payload: bytes | None = None,
) -> list[tuple]:
    """Decode/render + preprocess + detect + reading-order sort + crop
    for one media span. Returns CROPS_SCHEMA tuples with det_idx =
    reading rank. Detection/crop flavor (AABB slice vs min-area-rect
    perspective crop) follows cfg.text_type via
    local_ref.detect_and_crop — the same function the golden generator
    calls. With a binary payload (media_store mode) the page decodes
    from real PNG bytes (functions/multimodal._decode_payload); PNG is
    lossless so results are identical to the render path."""
    from .local_ref import detect_and_crop

    import zlib

    if payload is not None:
        from .functions.multimodal import _decode_payload

        img = _decode_payload(media_ref, "image", payload)
    else:
        from .fixtures.render import render_page

        img = render_page(media_ref)
    upright, _cls = preprocess_page(img, cfg)
    rows: list[tuple] = []
    for rank, (crop, box) in enumerate(detect_and_crop(upright, cfg)):
        ch, cw = crop.shape
        ratio = float(cw / max(ch, 1))
        rows.append(
            (
                doc_id,
                int(offset),
                media_ref,
                rank,
                # crops stay compressed across the shuffle + Arrow
                # boundary (the JPEG-crop principle): raw pixel payloads
                # made the JVM→python Arrow feed the pipeline bottleneck
                zlib.compress(np.ascontiguousarray(crop).tobytes(), 1),
                ch,
                cw,
                np.float32(ratio),
                bucket_ratio(ratio),
                np.float32(box[0]),
                np.float32(box[1]),
                np.float32(box[2]),
                np.float32(box[3]),
            )
        )
    return rows


def _nn_index(dst_i: int, src: int, dst: int) -> int:
    """Nearest-neighbor source index (operators.resize.nn_resize grid)."""
    return min(int((dst_i + 0.5) * src / dst), src - 1)


def _decode_row_for_crop(
    crop: np.ndarray, target_h: int, bucket: int, max_img_w: int = 3200
) -> np.ndarray:
    """The single resized-crop row the synthetic recognizer reads,
    without materializing the resized crop.

    Equivalent to resize_for_recognition(crop, target_h, bucket)[target_h//2]:
    the nn source row of the (possibly 180°-flipped) crop, nn-sampled to
    the crop's own resize width and right-padded with background to the
    bucket width. Keeping this closed-form (instead of the dense logits
    tensor) removes ~200 MB/batch of memory traffic that saturated RAM
    bandwidth with 16+ concurrent workers."""
    h, w = crop.shape
    wh_ratio = w / max(h, 1)
    batch_w = min(int(np.ceil(target_h * bucket)), max_img_w)
    resize_w = max(min(int(np.ceil(target_h * wh_ratio)), batch_w), 1)
    r = _nn_index(target_h // 2, h, target_h)
    row = crop[r]
    xs = np.minimum(((np.arange(resize_w) + 0.5) * w / resize_w).astype(np.int64), w - 1)
    out = np.full(batch_w, BG, dtype=np.uint8)
    out[:resize_w] = row[xs]
    return out


def _recognize_chunk(pdf: pd.DataFrame, cfg: ExtractConfig) -> pd.DataFrame:
    """Recognize one Arrow batch of crops: line-orient, group by bucket,
    direct per-row CTC-index decode (bit-identical to the logits path —
    both funnel through ctc_collapse_batch), score-threshold blanking."""
    import zlib

    n = len(pdf)
    texts: list[str] = [""] * n
    confs = np.zeros(n, dtype=np.float32)
    crop_bytes = pdf["crop"].to_numpy()
    crop_h = pdf["crop_h"].to_numpy()
    crop_w = pdf["crop_w"].to_numpy()
    buckets = pdf["bucket"].to_numpy()
    crops: list[np.ndarray] = []
    for k in range(n):
        crop = np.frombuffer(zlib.decompress(crop_bytes[k]), dtype=np.uint8).reshape(
            crop_h[k], crop_w[k]
        )
        if cfg.use_line_orientation and classify_line_orientation(crop) == 1:
            crop = crop[::-1, ::-1]
        crops.append(crop)
    for b in np.unique(buckets):
        all_pos = np.flatnonzero(buckets == b)
        # region_batch_size bounds the stacked decode-row matrix per
        # inference call (the reference's recognition chunking,
        # ocr.rs:802-897)
        for c0 in range(0, len(all_pos), max(int(cfg.region_batch_size), 1)):
            pos = all_pos[c0 : c0 + max(int(cfg.region_batch_size), 1)]
            rows = np.stack(
                [_decode_row_for_crop(crops[p], cfg.rec_target_h, int(b)) for p in pos]
            ).astype(np.int32)
            idx = rows - CHAR_BASE
            idx = np.where((idx >= 1) & (idx < len(VOCAB)), idx, 0)
            prob = np.where(idx > 0, np.float32(0.95), np.float32(0.05))
            for p, (text, conf, _cols, _T) in zip(pos, ctc_collapse_batch(idx, prob, VOCAB)):
                # index-parity blanking (text_recognition_adapter.rs:61-102)
                if conf < cfg.rec_score_threshold:
                    text = ""
                texts[int(p)] = text
                confs[int(p)] = conf
    return pd.DataFrame(
        {
            "doc_id": pdf["doc_id"].to_numpy(),
            "offset": pdf["offset"].to_numpy(),
            "media_ref": pdf["media_ref"].to_numpy(),
            "det_idx": pdf["det_idx"].to_numpy(),
            "text": texts,
            "confidence": confs,
        }
    )


# --------------------------------------------------------------------------
# DataFrame stages
# --------------------------------------------------------------------------

def recognize_with_word_boxes(crops: DataFrame, cfg: ExtractConfig) -> DataFrame:
    """Recognition with per-character word boxes (return_word_box mode,
    src/oarocr/ocr.rs:928-1020): decode as usual, then map CTC column
    indices back to x-extents inside the detection box. max_wh_ratio is
    the crop's deterministic bucket (partition-invariant), so
    effective_col_num = T · wh_ratio / bucket exactly reproduces the
    reference's padding-undo math."""
    from .operators.ctc import ctc_word_boxes

    def it(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import zlib

        for pdf in batches:
            if not len(pdf):
                continue
            base = _recognize_chunk(pdf, cfg)
            word_boxes: list[list[list[float]]] = []
            for k in range(len(pdf)):
                crop = np.frombuffer(
                    zlib.decompress(pdf["crop"].iloc[k]), dtype=np.uint8
                ).reshape(pdf["crop_h"].iloc[k], pdf["crop_w"].iloc[k])
                if cfg.use_line_orientation and classify_line_orientation(crop) == 1:
                    crop = crop[::-1, ::-1]
                b = int(pdf["bucket"].iloc[k])
                row = _decode_row_for_crop(crop, cfg.rec_target_h, b).astype(np.int32)
                idx = row - CHAR_BASE
                idx = np.where((idx >= 1) & (idx < len(VOCAB)), idx, 0)
                prob = np.where(idx > 0, np.float32(0.95), np.float32(0.05))
                [(text, _conf, cols, T)] = ctc_collapse_batch(
                    idx[None, :], prob[None, :], VOCAB
                )
                line_bbox = np.asarray(
                    [pdf["x1"].iloc[k], pdf["y1"].iloc[k], pdf["x2"].iloc[k], pdf["y2"].iloc[k]],
                    dtype=np.float32,
                )
                if base["confidence"].iloc[k] < cfg.rec_score_threshold:
                    # index-parity blanking zeroed the text — word boxes
                    # from the unblanked decode must not leak through
                    wb = []
                else:
                    wb = ctc_word_boxes(
                        line_bbox, text, cols, T, float(pdf["wh_ratio"].iloc[k]), float(b)
                    )
                word_boxes.append([[float(v) for v in box] for box in wb])
            base = base.copy()
            base["word_boxes"] = word_boxes
            yield base

    from .schemas import REC_WORDBOX_SCHEMA

    return crops.mapInPandas(it, schema=REC_WORDBOX_SCHEMA)


def detect_crops_df(docs: DataFrame, cfg: ExtractConfig) -> DataFrame:
    """media spans → crops DataFrame (detect stage), from nested docs."""
    flat = docs.select("doc_id", F.explode_outer("spans").alias("s"))
    return detect_crops_from_flat(flat, cfg)


def detect_crops_from_flat(
    spans_flat: DataFrame,
    cfg: ExtractConfig,
    media_store: DataFrame | None = None,
    num_partitions: int | None = None,
) -> DataFrame:
    """(doc_id, s:struct) exploded spans → crops DataFrame.

    A media span without a ref cannot be resolved; dropping it here
    (instead of crashing the UDF) keeps one malformed row from failing
    a whole partition at corpus scale.

    media_store (media_ref, payload:binary) switches the page source
    from the synthetic renderer to real encoded bytes: media spans
    equi-join their payload on media_ref (the natural shape for an
    Iceberg media side table — hash join, AQE-sized) and the detect UDF
    decodes via the PNG codec. Spans whose ref is missing from the
    store are dropped (left join + null guard), mirroring the
    malformed-row policy above."""
    media = spans_flat.where(
        (F.col("s.kind") == "media") & F.col("s.media_ref").isNotNull()
    ).select("doc_id", F.col("s.offset").alias("offset"), F.col("s.media_ref").alias("media_ref"))
    with_payload = media_store is not None
    if with_payload:
        media = media.join(
            media_store.select("media_ref", "payload"), "media_ref", "left"
        ).where(F.col("payload").isNotNull())
        if num_partitions:
            # the join's post-shuffle partitioning is AQE-sized for its
            # BYTES (a few MB of payloads coalesce to one partition),
            # not for the decode+detect compute behind each row — spread
            # to the pipeline's partition count before the UDF, exactly
            # like the crop pool repartition downstream
            from .partitioning import spread

            media = spread(media, num_partitions, "media_ref")

    def detect_iter(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [f.name for f in CROPS_SCHEMA.fields]
        for pdf in batches:
            rows: list[tuple] = []
            payloads = pdf["payload"] if with_payload else [None] * len(pdf)
            for doc_id, offset, media_ref, payload in zip(
                pdf["doc_id"], pdf["offset"], pdf["media_ref"], payloads
            ):
                rows.extend(
                    _detect_one_page(doc_id, offset, media_ref, cfg, payload=payload)
                )
            yield pd.DataFrame(rows, columns=cols)

    return media.mapInPandas(detect_iter, schema=CROPS_SCHEMA)


def recognize_df(crops: DataFrame, cfg: ExtractConfig) -> DataFrame:
    """crops → recognized text per crop (recognize stage)."""

    def rec_iter(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf):
                yield _recognize_chunk(pdf, cfg)

    return crops.mapInPandas(rec_iter, schema=REC_SCHEMA)


def assemble_results(
    all_ids: DataFrame, text_spans: DataFrame, media_results: DataFrame
) -> DataFrame:
    """Union pass-through + recognized spans → final ordered spans array.

    Pure Catalyst: sort_array over (offset, sub) then transform-with-
    index assigns the final 0-based `order` (SURVEY.md §2.5
    assign_order_indices analog). `all_ids` is a (doc_id) frame naming
    every input document — docs whose spans produced nothing still
    appear, with an empty array."""
    unioned = text_spans.unionByName(media_results)
    assembled = unioned.groupBy("doc_id").agg(
        F.transform(
            F.array_sort(
                F.collect_list(
                    F.struct("offset", "sub", "kind", "text", "media_ref", "confidence")
                )
            ),
            lambda s, i: F.struct(
                s["kind"].alias("kind"),
                s["text"].alias("text"),
                s["media_ref"].alias("media_ref"),
                i.cast("int").alias("order"),
                s["confidence"].alias("confidence"),
            ),
        ).alias("spans")
    )
    all_ids = all_ids.select("doc_id").distinct()
    out = (
        all_ids.join(assembled, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(
                "spans", F.array().cast(RESULTS_SCHEMA["spans"].dataType)
            ).alias("spans"),
        )
    )
    return out


def extract_spans(
    spark: SparkSession,
    docs: DataFrame,
    cfg: ExtractConfig | None = None,
    num_partitions: int | None = None,
    pooled: bool = True,
    persist_input: bool = True,
    width_sorted: bool = False,
    media_store: DataFrame | None = None,
) -> DataFrame:
    """documents(doc_id, spans) → results(doc_id, spans) (RESULTS_SCHEMA).

    pooled=True routes crops through a rebalancing shuffle (the scale
    path); pooled=False fuses recognition into the detect task (no crop
    shuffle).

    media_store=(media_ref, payload:binary) sources pages from real PNG
    bytes via an equi-join instead of the synthetic renderer (see
    detect_crops_from_flat); output is identical because PNG is
    lossless (pinned by test_pipeline_golden).

    width_sorted=True additionally sorts each crop partition by
    (bucket, wh_ratio) before recognition — the reference's
    wh-ratio-sorted batching (ocr.rs:802-831). With a real accelerator
    model this pays for itself in padding savings; with the synthetic
    per-crop decoder it only adds a blocking per-partition sort
    (measured 3× recognize-stage wall at 32 cores), and results are
    identical either way (per-crop bucketed widths), so it defaults
    off.

    The DAG fans the input into three branches (pass-through text,
    media detection, doc-id preservation). To scan the source exactly
    once, spans are exploded up front (explode_outer keeps empty docs)
    and the flat form is persisted (MEMORY_AND_DISK, serialized) —
    without this, a derived/expensive input lineage re-executes once
    per branch. Callers that pre-materialize the exploded table (e.g.
    an Iceberg staging table at corpus scale) can pass
    persist_input=False."""
    from pyspark import StorageLevel

    from .partitioning import spread

    cfg = cfg or ExtractConfig()
    P = num_partitions or spark.sparkContext.defaultParallelism

    # spread(), not repartition(P, "doc_id"): derived inputs arrive
    # straight out of a groupBy("doc_id"), where a same-key repartition
    # is planned away and AQE then coalesces the tiny upstream exchange
    # to ONE partition — serializing the detect UDF (see partitioning.py)
    spans_flat = spread(docs, P, "doc_id").select(
        "doc_id", F.explode_outer("spans").alias("s")
    )
    if persist_input:
        spans_flat = spans_flat.persist(StorageLevel.MEMORY_AND_DISK)

    text_spans = spans_flat.where(F.col("s.kind") == "text").select(
        "doc_id",
        F.col("s.offset").alias("offset"),
        F.lit(-1).alias("sub"),
        F.col("s.kind").alias("kind"),
        F.col("s.text").alias("text"),
        F.col("s.media_ref").alias("media_ref"),
        F.lit(None).cast("float").alias("confidence"),
    )

    crops = detect_crops_from_flat(
        spans_flat, cfg, media_store=media_store, num_partitions=P
    )
    if pooled:
        crops = crops.repartition(P, "doc_id", "offset", "det_idx")
        if width_sorted:
            crops = crops.sortWithinPartitions("bucket", "wh_ratio")
    rec = recognize_df(crops, cfg)

    media_results = (
        rec.filter(F.length("text") > 0)  # empty-text drop (structure.rs:2431-2433)
        .select(
            "doc_id",
            "offset",
            F.col("det_idx").alias("sub"),
            F.lit("media").alias("kind"),
            "text",
            "media_ref",
            "confidence",
        )
    )
    # doc-id preservation reads the input directly — a doc_id-only
    # pruned scan instead of re-running the explode (plan audit:
    # ReadSchema shrinks to one column on parquet inputs)
    return assemble_results(docs.select("doc_id"), text_spans, media_results)
