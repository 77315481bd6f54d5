"""Distributed detector forward-pass plumbing (SURVEY §2.8 V1/V3).

The reference runs its ONNX detectors per task-executor process with a
session held as instance state (``deepdoc/vision/ocr.py:489-560``
TextDetector, ``layout_recognizer.py:46-70``); on Spark the same shape is
a PER-PYTHON-WORKER session singleton feeding Arrow-batched tensors
(SURVEY §4: batch 16, ``intra_op_num_threads`` kept small so ORT threads
don't oversubscribe against ``spark.task.cpus``).

This module is that plumbing, end-to-end real EXCEPT the weights:

- ``backend="onnx"``  loads ``model_path`` in an onnxruntime session —
  the production path; raises cleanly when onnxruntime is absent (it is
  not installed in this sandbox, and the reference repo does not vendor
  the weights either — it downloads them at runtime).
- ``backend="fake"``  a deterministic stand-in session with the SAME
  ``run(["maps"], {"x": batch})`` contract: the probability map is the
  de-standardized channel mean of the input tensor, so bright painted
  regions come back as det boxes. Everything around it — preprocessing
  (``core.vision_prep.text_det_input``, the reference TextDetector's
  DetResizeForTest chain; layout uses ``detector_input``), mini-batch
  padding, the
  singleton, DB postprocess (``core.db_postprocess``, ported and A/B'd
  byte-identical), geometry mapping back to source pixels — is the real
  code the onnx branch uses.
- ``backend="none"``  raises NotImplementedError (honest default).

Input rows carry DECODED pixels (raw uint8 RGB bytes + width/height) —
image codecs stay stubbed per the multimodal contract
(``operators/multimodal.py``).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame

DET_SCHEMA = (
    "media_id string, n_boxes int, boxes array<array<double>>"
)

# per-python-worker-process session singleton (the SURVEY §4 model-load
# pattern: one session per executor process, reused across tasks when
# spark.python.worker.reuse is on). Keyed by (backend, path, mtime) so a
# swapped model file is picked up by reused workers.
_SESS_CACHE: dict = {}


class _FakeDetSession:
    """Deterministic det head: maps = clip(red(x * std + mean), 0, 1).

    De-standardizes the ``detector_input`` tensor back to [0, 1] pixel
    space and reads the RED channel — a red-saturated region scores ~1.0,
    dark ~0.0. Channel-split on purpose: the composed OCR fixture paints
    det signal on red and rec class bands on green/blue, so the two fake
    heads never confound. Same output contract as an onnxruntime DB-det
    session: ``run(["maps"], {"x": (N,3,H,W)}) -> [(N,1,H,W)]``.
    """

    def run(self, _output_names, feeds):
        import numpy as np

        from ragflow_spark.core.vision_prep import (
            IMAGENET_MEAN,
            IMAGENET_STD,
        )

        x = feeds["x"]
        red = x[:, 0:1] * IMAGENET_STD[0] + IMAGENET_MEAN[0]
        maps = np.clip(red, 0.0, 1.0)
        return [maps.astype(np.float32)]


def _session(backend: str, model_path: str | None, intra_op_threads: int):
    """onnx sessions only — fake heads are constructed at the call site
    (they are role-specific: a det map head handed to a rec consumer
    would decode garbage with no error, so the cache never holds them)."""
    if backend == "none":
        raise NotImplementedError(
            "detector backend not configured — pass backend='onnx' with a "
            "model_path (requires onnxruntime) or backend='fake' for the "
            "deterministic plumbing stand-in"
        )
    if backend != "onnx":
        raise NotImplementedError(f"unknown detector backend {backend!r}")
    st = os.stat(model_path)
    key = ("onnx", model_path, st.st_mtime_ns)
    sess = _SESS_CACHE.get(key)
    if sess is None:
        import onnxruntime as ort  # raises if not installed — honest

        opts = ort.SessionOptions()
        # don't oversubscribe: spark.task.cpus cores are already
        # claimed by the task; ORT gets a small fixed intra-op pool
        opts.intra_op_num_threads = intra_op_threads
        sess = ort.InferenceSession(
            model_path, sess_options=opts,
            providers=["CPUExecutionProvider"],
        )
        # bound worker memory at ~one det + one rec model. Evict the
        # OLDEST entry only (dict preserves insertion order): clearing
        # the whole cache on a third insert also dropped the in-use
        # partner of a composed det+rec pipeline, re-deserializing both
        # models every task when model sets alternate (ADVICE r5)
        while len(_SESS_CACHE) >= 2:
            _SESS_CACHE.pop(next(iter(_SESS_CACHE)))
        _SESS_CACHE[key] = sess
    return sess


def synth_image_rows(n: int, seed: int = 7):
    """Deterministic painted-rectangle test images for the detector
    plumbing: returns (media_id, pixels, width, height, rects) tuples
    where rects is the ground truth [(x, y, w, h), …] painted bright on a
    dark background. Non-overlapping by construction (touching bright
    regions merge into one det component, which is correct behavior but
    not countable)."""
    import numpy as np

    out = []
    for i in range(n):
        rng = np.random.default_rng(seed * 100_003 + i)
        h = int(rng.integers(160, 360))
        w = int(rng.integers(200, 420))
        im = np.full((h, w, 3), 16, dtype=np.uint8)
        rects: list[tuple[int, int, int, int]] = []
        for _ in range(int(rng.integers(1, 4))):
            rh = int(rng.integers(28, max(30, h // 4)))
            rw = int(rng.integers(60, max(62, w // 3)))
            y = int(rng.integers(4, h - rh - 4))
            x = int(rng.integers(4, w - rw - 4))
            if any(not (x + rw + 12 < rx or rx + rww + 12 < x
                        or y + rh + 12 < ry or ry + rhh + 12 < y)
                   for rx, ry, rww, rhh in rects):
                continue
            im[y:y + rh, x:x + rw] = 235
            rects.append((x, y, rw, rh))
        out.append((f"det{i:03d}", im.tobytes(), w, h, rects))
    return out


def _det_boxes(sess, post, imgs, batch_size: int,
               limit_side_len: int = 960, limit_type: str = "max"):
    """Worker-side det core shared by detect_text_regions and ocr_images:
    list of HxWx3 uint8 images → list of (n_i, 4, 2) float box arrays in
    source pixels. Preprocessing is the reference TextDetector's
    DetResizeForTest chain (max-side cap 960, each side resized to a /32
    multiple, NO upscaling — deepdoc/vision/ocr.py:355-391), not the
    layout detector's LinearResize, so with real DB weights the input
    tensors match the reference. One session.run per mini-batch padded to
    the group max (the reference runs det one image at a time; batching
    is our throughput concession — the zero-pad region is cropped off the
    map before postprocess, leaving only conv edge effects as deviation);
    each image's map is cropped back to its resize region before the DB
    postprocess so the map→src scaling is geometric."""
    import numpy as np

    from ragflow_spark.core.vision_prep import text_det_input

    results: list = [None] * len(imgs)
    group: list = []

    def flush():
        if not group:
            return
        max_h = max(t.shape[1] for _i, t, _hw, _rs in group)
        max_w = max(t.shape[2] for _i, t, _hw, _rs in group)
        batch = np.zeros((len(group), 3, max_h, max_w), dtype=np.float32)
        for i, (_idx, t, _hw, _rs) in enumerate(group):
            batch[i, :, : t.shape[1], : t.shape[2]] = t
        maps = sess.run(["maps"], {"x": batch})[0]
        for i, (idx, _t, (src_h, src_w), (rs_h, rs_w)) in enumerate(group):
            pred = maps[i, 0, :rs_h, :rs_w][None, None]
            res = post({"maps": pred},
                       [(src_h, src_w, 0.0, 0.0)])[0]["points"]
            results[idx] = np.asarray(res, dtype=np.float64).reshape(
                -1, 4, 2)
        group.clear()

    for idx, im in enumerate(imgs):
        h, w = im.shape[:2]
        tensor, (rs_h, rs_w) = text_det_input(
            im, limit_side_len=limit_side_len, limit_type=limit_type)
        group.append((idx, tensor, (h, w), (rs_h, rs_w)))
        if len(group) >= batch_size:
            flush()
    flush()
    return results


def _rec_texts(sess, decoder, imgs, batch_size: int):
    """Worker-side rec core shared by recognize_text_lines and
    ocr_images: list of line images → list of (text, conf) in input
    order, with the reference's aspect-ratio-sorted mini-batches and
    per-batch max_wh_ratio sizing (ocr.py:307-352)."""
    import numpy as np

    from ragflow_spark.core.vision_prep import rec_resize_norm

    texts: list = [("", 0.0)] * len(imgs)
    if not imgs:
        return texts
    order = np.argsort([im.shape[1] / im.shape[0] for im in imgs])
    for beg in range(0, len(imgs), batch_size):
        chunk = order[beg:beg + batch_size]
        max_wh = max(
            [320 / 48.0]
            + [imgs[i].shape[1] / imgs[i].shape[0] for i in chunk]
        )
        batch = np.stack([rec_resize_norm(imgs[i], max_wh) for i in chunk])
        preds = sess.run(["logits"], {"x": batch})[0]
        for rno, (txt, conf) in enumerate(decoder(preds)):
            texts[chunk[rno]] = (txt, float(conf))
    return texts


def detect_text_regions(
    df: DataFrame,
    id_col: str = "media_id",
    pixels_col: str = "pixels",
    width_col: str = "width",
    height_col: str = "height",
    backend: str = "none",
    model_path: str | None = None,
    batch_size: int = 16,
    limit_side_len: int = 960,
    limit_type: str = "max",
    thresh: float = 0.3,
    box_thresh: float = 0.5,
    unclip_ratio: float = 1.5,
    intra_op_threads: int = 2,
) -> DataFrame:
    """Image rows → det boxes, distributed: preprocess each image through
    the reference TextDetector's ``text_det_input`` chain
    (DetResizeForTest 960/max — no upscaling, /32 per-side resize), assemble mini-batches of
    ``batch_size`` padded to the group max (the det forward runs ONE
    ``session.run`` per mini-batch, not per row), crop each image's map
    back to its unpadded resize region, and run the ported DBPostProcess
    to boxes in SOURCE pixel coordinates.

    Returns (media_id, n_boxes, boxes) where each box is
    [x0,y0, x1,y1, x2,y2, x3,y3] clockwise from top-left.
    """

    def run(batches):
        import numpy as np
        import pandas as pd

        from ragflow_spark.core.db_postprocess import DBPostProcess

        sess = _FakeDetSession() if backend == "fake" \
            else _session(backend, model_path, intra_op_threads)
        post = DBPostProcess(thresh=thresh, box_thresh=box_thresh,
                             unclip_ratio=unclip_ratio, score_mode="fast")

        for pdf in batches:
            out = {"media_id": [], "n_boxes": [], "boxes": []}
            ids, imgs = [], []
            for r in pdf.itertuples():
                h, w = int(getattr(r, height_col)), int(getattr(r, width_col))
                raw = getattr(r, pixels_col)
                if h <= 0 or w <= 0 or raw is None or len(raw) != h * w * 3:
                    out["media_id"].append(getattr(r, id_col))
                    out["n_boxes"].append(-1)  # malformed row marker
                    out["boxes"].append([])
                    continue
                ids.append(getattr(r, id_col))
                imgs.append(
                    np.frombuffer(raw, dtype=np.uint8).reshape(h, w, 3))
            for mid, boxes in zip(
                ids, _det_boxes(sess, post, imgs, batch_size,
                                limit_side_len, limit_type)
            ):
                out["media_id"].append(mid)
                out["n_boxes"].append(len(boxes))
                out["boxes"].append([
                    [float(v) for v in b.reshape(-1)] for b in boxes
                ])
            yield pd.DataFrame(out)

    return df.select(id_col, pixels_col, width_col, height_col).mapInPandas(
        run, schema=DET_SCHEMA
    )


# ---------------------------------------------------------- recognition

REC_SCHEMA = "line_id string, text string, conf double"


class _FakeRecSession:
    """Deterministic rec head with the onnx contract
    ``run(["logits"], {"x": (N,3,48,W)}) -> [(N, W//4, C)]``.

    Channel protocol (see _FakeDetSession for why channels are split):
    the GREEN channel carries the class intensity k/(C-1) and the BLUE
    channel carries a validity beacon at 200/255. A 4-column timestep
    scores class k one-hot only when blue is within 2/255 of the beacon
    (≥98.9% of the window inside one painted band — rules out
    crop/resize blends) AND green is within 0.15 class units of center
    k; everything else (band edges, margins, the normalized-zero pad
    that de-normalizes to mid-gray) scores CTC blank, which the
    repeat-collapse then removes.
    """

    def __init__(self, num_classes: int):
        self.num_classes = num_classes

    def run(self, _output_names, feeds):
        import numpy as np

        x = feeds["x"]
        n, _c, _h, w = x.shape
        t_steps = w // 4
        c = self.num_classes
        probs = np.zeros((n, t_steps, c), dtype=np.float32)
        # read the CENTER THIRD of rows: det crops carry the unclip
        # margin above/below the painted text row, and full-height means
        # would dilute both channels; the det box is centered on the row,
        # so the middle rows are pure band signal
        r0, r1 = _h // 3, max(_h // 3 + 1, 2 * _h // 3)
        green = x[:, 1, r0:r1] * 0.5 + 0.5
        blue = x[:, 2, r0:r1] * 0.5 + 0.5
        for t in range(t_steps):
            g = green[:, :, 4 * t:4 * t + 4].mean(axis=(1, 2))
            b = blue[:, :, 4 * t:4 * t + 4].mean(axis=(1, 2))
            valid = np.abs(b - 200.0 / 255.0) <= 2.0 / 255.0
            kf = g * (c - 1)
            k = np.rint(kf).astype(int)
            on_center = np.abs(kf - k) <= 0.15
            k = np.where(valid & on_center, np.clip(k, 0, c - 1), 0)
            probs[np.arange(n), t, k] = 1.0
        return [probs]


def recognize_text_lines(
    df: DataFrame,
    id_col: str = "line_id",
    pixels_col: str = "pixels",
    width_col: str = "width",
    height_col: str = "height",
    backend: str = "none",
    model_path: str | None = None,
    characters: list[str] | None = None,
    batch_size: int = 16,
    intra_op_threads: int = 2,
) -> DataFrame:
    """Cropped line images → (text, conf), distributed with the
    reference TextRecognizer's exact batching discipline
    (deepdoc/vision/ocr.py:307-352): lines sorted by aspect ratio so a
    mini-batch shares a width, per-mini-batch ``max_wh_ratio`` sizing,
    ``rec_resize_norm`` preprocessing, ONE session.run per mini-batch of
    ``batch_size``, CTC label decode (``core.ocr_decode``, the ported
    deterministic half), results restored to input order."""

    def run(batches):
        import numpy as np
        import pandas as pd

        from ragflow_spark.core.ocr_decode import (
            DEFAULT_CHARSET,
            CTCLabelDecode,
        )

        chars = list(characters) if characters is not None else list(
            DEFAULT_CHARSET)
        decoder = CTCLabelDecode(characters=chars)
        if backend == "fake":
            sess = _FakeRecSession(num_classes=len(chars) + 1)
        else:
            sess = _session(backend, model_path, intra_op_threads)

        for pdf in batches:
            ids, imgs = [], []
            bad_ids = []
            for r in pdf.itertuples():
                h, w = int(getattr(r, height_col)), int(getattr(r, width_col))
                raw = getattr(r, pixels_col)
                if h <= 0 or w <= 0 or raw is None or len(raw) != h * w * 3:
                    bad_ids.append(getattr(r, id_col))
                    continue
                ids.append(getattr(r, id_col))
                imgs.append(
                    np.frombuffer(raw, dtype=np.uint8).reshape(h, w, 3))
            texts = _rec_texts(sess, decoder, imgs, batch_size)
            out = pd.DataFrame({
                "line_id": ids + bad_ids,
                "text": [t for t, _ in texts] + [""] * len(bad_ids),
                "conf": [c for _, c in texts] + [-1.0] * len(bad_ids),
            })
            yield out

    return df.select(id_col, pixels_col, width_col, height_col).mapInPandas(
        run, schema=REC_SCHEMA
    )


def synth_line_rows(n: int = 24, seed: int = 11):
    """Deterministic band-encoded text-line images for the rec plumbing:
    (line_id, pixels, width, height, text) with text drawn from the
    DEFAULT_CHARSET and painted as 8px class-intensity bands aligned to
    the 4px timestep grid (see _FakeRecSession)."""
    import numpy as np

    from ragflow_spark.core.ocr_decode import DEFAULT_CHARSET

    c = len(DEFAULT_CHARSET) + 1
    idx = {ch: i + 1 for i, ch in enumerate(DEFAULT_CHARSET)}
    out = []
    for i in range(n):
        rng = np.random.default_rng(seed * 90_001 + i)
        text = "".join(
            DEFAULT_CHARSET[int(j)] for j in
            rng.integers(0, len(DEFAULT_CHARSET), int(rng.integers(1, 14)))
        )
        bands = []
        for ch in text:
            # channel protocol: green = class intensity, blue = the 200
            # validity beacon; separators all-zero (see _FakeRecSession)
            bands.append((0, int(round(255 * idx[ch] / (c - 1))), 200))
            bands.append((0, 0, 0))
        w = 8 * len(bands) + 8
        im = np.zeros((48, w, 3), dtype=np.uint8)
        x = 4
        for v in bands:
            im[:, x:x + 8] = v
            x += 8
        out.append((f"rec{i:03d}", im.tobytes(), w, 48, text))
    return out


# ------------------------------------------------------- composed OCR

OCR_SCHEMA = ("media_id string, line_no int, box array<double>, "
              "text string, conf double")


def ocr_images(
    df: DataFrame,
    id_col: str = "media_id",
    pixels_col: str = "pixels",
    width_col: str = "width",
    height_col: str = "height",
    backend: str = "none",
    det_model_path: str | None = None,
    rec_model_path: str | None = None,
    characters: list[str] | None = None,
    batch_size: int = 16,
    limit_side_len: int = 960,
    limit_type: str = "max",
    thresh: float = 0.3,
    box_thresh: float = 0.5,   # the reference OCR det config (ocr.py:376)
    unclip_ratio: float = 1.5,
    drop_score: float = 0.5,
    intra_op_threads: int = 2,
) -> DataFrame:
    """The reference's full OCR loop (deepdoc/vision/ocr.py:581-630
    ``OCR.__call__``) distributed: det boxes → ``sorted_boxes`` ordering →
    ``get_rotate_crop_image`` perspective rectification per box →
    aspect-sorted rec mini-batches → CTC decode → ``drop_score`` filter.
    Both forward passes share the per-worker session pattern; crops from
    EVERY image in an Arrow batch pool into common rec mini-batches, so
    small images don't run underfull batches.

    Output: one row per kept line — (media_id, line_no in reading order,
    box [x0,y0,…,x3,y3], text, conf)."""

    def run(batches):
        import numpy as np
        import pandas as pd

        from ragflow_spark.core.db_postprocess import DBPostProcess
        from ragflow_spark.core.ocr_decode import (
            DEFAULT_CHARSET,
            CTCLabelDecode,
        )
        from ragflow_spark.core.ocr_geom import (
            get_rotate_crop_image,
            sorted_boxes,
        )

        chars = list(characters) if characters is not None else list(
            DEFAULT_CHARSET)
        decoder = CTCLabelDecode(characters=chars)
        if backend == "fake":
            det_sess = _FakeDetSession()
            rec_sess = _FakeRecSession(num_classes=len(chars) + 1)
        else:
            det_sess = _session(backend, det_model_path, intra_op_threads)
            rec_sess = _session(backend, rec_model_path, intra_op_threads)
        post = DBPostProcess(thresh=thresh, box_thresh=box_thresh,
                             unclip_ratio=unclip_ratio, score_mode="fast")

        for pdf in batches:
            ids, imgs = [], []
            for r in pdf.itertuples():
                h, w = int(getattr(r, height_col)), int(getattr(r, width_col))
                raw = getattr(r, pixels_col)
                if h <= 0 or w <= 0 or raw is None or len(raw) != h * w * 3:
                    continue  # malformed rows contribute no lines
                ids.append(getattr(r, id_col))
                imgs.append(
                    np.frombuffer(raw, dtype=np.uint8).reshape(h, w, 3))
            per_img_boxes = _det_boxes(det_sess, post, imgs, batch_size,
                                       limit_side_len, limit_type)
            # pool crops across the whole Arrow batch → full rec batches
            crops, crop_src = [], []
            ordered_boxes: list[list] = []
            for i, boxes in enumerate(per_img_boxes):
                obs = sorted_boxes(boxes) if len(boxes) else []
                ordered_boxes.append(obs)
                for ln, b in enumerate(obs):
                    try:
                        crops.append(
                            get_rotate_crop_image(imgs[i], b.copy()))
                    except Exception:
                        # degenerate quad (coords collapsed by rounding →
                        # singular homography): skip the box, keep the
                        # task — cv2 degrades instead of raising here
                        continue
                    crop_src.append((i, ln))
            texts = _rec_texts(rec_sess, decoder, crops, batch_size)
            out = {"media_id": [], "line_no": [], "box": [],
                   "text": [], "conf": []}
            # line_no is renumbered CONTIGUOUSLY per image over the KEPT
            # lines (reading order preserved — crop_src is (i, ln)
            # ascending): both the drop_score filter and a skipped
            # degenerate quad would otherwise leave gaps that mis-join
            # consumers assuming dense numbering per media_id (ADVICE r5)
            next_no: dict = {}
            for (i, ln), (txt, conf) in zip(crop_src, texts):
                if conf < drop_score:  # OCR.__call__'s filter_boxes rule
                    continue
                out["media_id"].append(ids[i])
                out["line_no"].append(next_no.setdefault(i, 0))
                next_no[i] += 1
                out["box"].append([
                    float(v) for v in ordered_boxes[i][ln].reshape(-1)])
                out["text"].append(txt)
                out["conf"].append(conf)
            # explicit object dtype: an empty partition would otherwise
            # infer float64 for the list column and break Arrow conversion
            yield pd.DataFrame({
                "media_id": pd.Series(out["media_id"], dtype=object),
                "line_no": pd.Series(out["line_no"], dtype="int64"),
                "box": pd.Series(out["box"], dtype=object),
                "text": pd.Series(out["text"], dtype=object),
                "conf": pd.Series(out["conf"], dtype="float64"),
            })

    return df.select(id_col, pixels_col, width_col, height_col).mapInPandas(
        run, schema=OCR_SCHEMA
    )


def synth_ocr_pages(n: int = 12, seed: int = 13):
    """Deterministic full-OCR fixture pages: dark background with 1-3
    text ROWS per page; each row is red-saturated (the det signal) and
    carries wide green/blue class bands (the rec signal) so the composed
    det → sorted_boxes → crop → rec loop must recover the exact encoded
    strings in top-to-bottom order. Bands are 32px with 32px separators —
    wide enough that det's unclip margin + crop resize still leaves
    on-center timesteps per band (see _FakeRecSession's validity rule).

    Returns (media_id, pixels, width, height, texts_top_to_bottom)."""
    import numpy as np

    from ragflow_spark.core.ocr_decode import DEFAULT_CHARSET

    c = len(DEFAULT_CHARSET) + 1
    idx = {ch: i + 1 for i, ch in enumerate(DEFAULT_CHARSET)}
    out = []
    for i in range(n):
        rng = np.random.default_rng(seed * 70_001 + i)
        n_rows = int(rng.integers(1, 4))
        row_h, band_w = 64, 32
        texts = []
        row_imgs = []
        for _ in range(n_rows):
            text = "".join(
                DEFAULT_CHARSET[int(j)] for j in
                rng.integers(0, len(DEFAULT_CHARSET),
                             int(rng.integers(2, 7)))
            )
            texts.append(text)
            w_row = band_w * (2 * len(text) + 1)
            row = np.zeros((row_h, w_row, 3), dtype=np.uint8)
            row[:, :, 0] = 255  # det signal: red across the whole row
            x = band_w // 2
            for ch in text:
                row[:, x:x + band_w, 1] = int(
                    round(255 * idx[ch] / (c - 1)))
                row[:, x:x + band_w, 2] = 200
                x += 2 * band_w
            row_imgs.append(row)
        pg_w = max(r.shape[1] for r in row_imgs) + 80
        pg_h = n_rows * (row_h + 56) + 56
        page = np.full((pg_h, pg_w, 3), 8, dtype=np.uint8)
        y = 40
        for row in row_imgs:
            page[y:y + row_h, 40:40 + row.shape[1]] = row
            y += row_h + 56
        out.append((f"ocr{i:03d}", page.tobytes(), pg_w, pg_h, texts))
    return out


def ocr_image_array(
    im,
    backend: str = "none",
    det_model_path: str | None = None,
    rec_model_path: str | None = None,
    characters: list[str] | None = None,
    batch_size: int = 16,
    limit_side_len: int = 960,
    limit_type: str = "max",
    box_thresh: float = 0.5,
    unclip_ratio: float = 1.5,
    drop_score: float = 0.5,
) -> list[tuple[str, float]]:
    """Single-image OCR through the same det→sort→crop→rec cores the
    distributed ``ocr_images`` uses — the per-doc entry the picture
    template calls inside its extraction task (rag/app/picture.py:31-33
    ``ocr(np.array(img))``). Returns [(text, conf), …] in reading
    order after the drop_score filter."""
    return [(txt, conf) for _b, txt, conf in ocr_image_boxes(
        im, backend=backend, det_model_path=det_model_path,
        rec_model_path=rec_model_path, characters=characters,
        batch_size=batch_size, limit_side_len=limit_side_len,
        limit_type=limit_type, box_thresh=box_thresh,
        unclip_ratio=unclip_ratio, drop_score=drop_score)]


def ocr_image_boxes(
    im,
    backend: str = "none",
    det_model_path: str | None = None,
    rec_model_path: str | None = None,
    characters: list[str] | None = None,
    batch_size: int = 16,
    limit_side_len: int = 960,
    limit_type: str = "max",
    box_thresh: float = 0.5,
    unclip_ratio: float = 1.5,
    drop_score: float = 0.5,
) -> list:
    """``ocr_image_array`` with geometry: [(quad (4,2) ndarray in image
    pixel coords, text, conf), …] in reading order — what the scanned-PDF
    fallback needs to synthesize LAYOUT boxes that ride the same merge
    pipeline text-layer boxes do (the reference feeds OCR output into the
    identical downstream, pdf_parser.py ``__ocr``)."""
    from ragflow_spark.core.db_postprocess import DBPostProcess
    from ragflow_spark.core.ocr_decode import (
        DEFAULT_CHARSET,
        CTCLabelDecode,
    )
    from ragflow_spark.core.ocr_geom import (
        get_rotate_crop_image,
        sorted_boxes,
    )

    chars = list(characters) if characters is not None else list(
        DEFAULT_CHARSET)
    decoder = CTCLabelDecode(characters=chars)
    if backend == "fake":
        det_sess = _FakeDetSession()
        rec_sess = _FakeRecSession(num_classes=len(chars) + 1)
    else:
        det_sess = _session(backend, det_model_path, 2)
        rec_sess = _session(backend, rec_model_path, 2)
    # reference OCR det config (ocr.py:376-377): thresh 0.3 / box 0.5 /
    # unclip 1.5 — the same defaults every entry point shares
    post = DBPostProcess(thresh=0.3, box_thresh=box_thresh,
                         unclip_ratio=unclip_ratio, score_mode="fast")
    boxes = _det_boxes(det_sess, post, [im], batch_size,
                       limit_side_len, limit_type)[0]
    obs = sorted_boxes(boxes) if len(boxes) else []
    crops, kept = [], []
    for b in obs:
        try:
            crops.append(get_rotate_crop_image(im, b.copy()))
            kept.append(b)
        except Exception:
            continue  # degenerate quad — skip the box, keep the doc
    return [
        (b, txt, conf)
        for b, (txt, conf) in zip(
            kept, _rec_texts(rec_sess, decoder, crops, batch_size))
        if conf >= drop_score
    ]
