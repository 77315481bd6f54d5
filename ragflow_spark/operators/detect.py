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
  (``core.vision_prep.detector_input``), mini-batch padding, the
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
    """Deterministic det head: maps = clip(mean_c(x * std + mean), 0, 1).

    De-standardizes the ``detector_input`` tensor back to [0, 1] pixel
    space and averages channels — a white region scores ~1.0, black ~0.0.
    Same output contract as an onnxruntime DB-det session:
    ``run(["maps"], {"x": (N,3,H,W)}) -> [(N,1,H,W)]``.
    """

    def run(self, _output_names, feeds):
        import numpy as np

        from ragflow_spark.core.vision_prep import (
            IMAGENET_MEAN,
            IMAGENET_STD,
        )

        x = feeds["x"]
        mean = np.asarray(IMAGENET_MEAN, dtype=np.float32).reshape(1, 3, 1, 1)
        std = np.asarray(IMAGENET_STD, dtype=np.float32).reshape(1, 3, 1, 1)
        img01 = x * std + mean
        maps = np.clip(img01.mean(axis=1, keepdims=True), 0.0, 1.0)
        return [maps.astype(np.float32)]


def _session(backend: str, model_path: str | None, intra_op_threads: int):
    if backend == "none":
        raise NotImplementedError(
            "detector backend not configured — pass backend='onnx' with a "
            "model_path (requires onnxruntime) or backend='fake' for the "
            "deterministic plumbing stand-in"
        )
    if backend == "fake":
        key = ("fake", None, 0)
    elif backend == "onnx":
        st = os.stat(model_path)
        key = ("onnx", model_path, st.st_mtime_ns)
    else:
        raise NotImplementedError(f"unknown detector backend {backend!r}")
    sess = _SESS_CACHE.get(key)
    if sess is None:
        if backend == "fake":
            sess = _FakeDetSession()
        else:
            import onnxruntime as ort  # raises if not installed — honest

            opts = ort.SessionOptions()
            # don't oversubscribe: spark.task.cpus cores are already
            # claimed by the task; ORT gets a small fixed intra-op pool
            opts.intra_op_num_threads = intra_op_threads
            sess = ort.InferenceSession(
                model_path, sess_options=opts,
                providers=["CPUExecutionProvider"],
            )
        _SESS_CACHE.clear()  # one model at a time — bound worker memory
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


def detect_text_regions(
    df: DataFrame,
    id_col: str = "media_id",
    pixels_col: str = "pixels",
    width_col: str = "width",
    height_col: str = "height",
    backend: str = "none",
    model_path: str | None = None,
    batch_size: int = 16,
    target_size: int = 800,
    thresh: float = 0.3,
    box_thresh: float = 0.6,
    intra_op_threads: int = 2,
) -> DataFrame:
    """Image rows → det boxes, distributed: preprocess each image through
    the real ``detector_input`` chain, assemble mini-batches of
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
        from ragflow_spark.core.vision_prep import detector_input

        sess = _session(backend, model_path, intra_op_threads)
        post = DBPostProcess(thresh=thresh, box_thresh=box_thresh,
                             score_mode="fast")

        def flush(group, out):
            if not group:
                return
            max_h = max(t.shape[1] for _mid, t, _hw, _rs in group)
            max_w = max(t.shape[2] for _mid, t, _hw, _rs in group)
            batch = np.zeros((len(group), 3, max_h, max_w),
                             dtype=np.float32)
            for i, (_mid, t, _hw, _rs) in enumerate(group):
                batch[i, :, : t.shape[1], : t.shape[2]] = t
            maps = sess.run(["maps"], {"x": batch})[0]
            for i, (mid, _t, (src_h, src_w), (rs_h, rs_w)) in enumerate(
                group
            ):
                # crop the padded map back to this image's resize region
                # so boxes_from_bitmap's map→src scaling is geometric
                pred = maps[i, 0, :rs_h, :rs_w][None, None]
                res = post({"maps": pred},
                           [(src_h, src_w, 0.0, 0.0)])[0]["points"]
                out["media_id"].append(mid)
                out["n_boxes"].append(len(res))
                out["boxes"].append([
                    [float(v) for v in np.asarray(b).reshape(-1)]
                    for b in res
                ])
            group.clear()

        for pdf in batches:
            out = {"media_id": [], "n_boxes": [], "boxes": []}
            group: list = []
            for r in pdf.itertuples():
                h, w = int(getattr(r, height_col)), int(getattr(r, width_col))
                raw = getattr(r, pixels_col)
                if h <= 0 or w <= 0 or raw is None or len(raw) != h * w * 3:
                    out["media_id"].append(getattr(r, id_col))
                    out["n_boxes"].append(-1)  # malformed row marker
                    out["boxes"].append([])
                    continue
                im = np.frombuffer(raw, dtype=np.uint8).reshape(h, w, 3)
                tensor, _info = detector_input(im, target_size=target_size)
                # resized (pre-pad) region of the tensor: scale the source
                # dims exactly as generate_scale did
                from ragflow_spark.core.vision_prep import generate_scale

                sy, sx = generate_scale((h, w), target_size)
                rs_h, rs_w = int(round(h * sy)), int(round(w * sx))
                group.append(
                    (getattr(r, id_col), tensor, (h, w), (rs_h, rs_w))
                )
                if len(group) >= batch_size:
                    flush(group, out)
            flush(group, out)
            yield pd.DataFrame(out)

    return df.select(id_col, pixels_col, width_col, height_col).mapInPandas(
        run, schema=DET_SCHEMA
    )


# ---------------------------------------------------------- recognition

REC_SCHEMA = "line_id string, text string, conf double"


class _FakeRecSession:
    """Deterministic rec head with the onnx contract
    ``run(["logits"], {"x": (N,3,48,W)}) -> [(N, W//4, C)]``.

    Each 4-column timestep window de-normalizes back to [0,1] intensity;
    an intensity within 0.15 CLASS UNITS of a class center k/(C-1)
    scores class k one-hot (uint8 painting lands ≤0.08 units off), and
    anything further (resize-blended band edges) scores CTC blank — so
    uniform painted bands decode to their class and transitions collapse
    away, exactly what CTC repeat-collapse expects.
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
        img01 = x * 0.5 + 0.5
        for t in range(t_steps):
            window = img01[:, :, :, 4 * t:4 * t + 4]
            inten = window.mean(axis=(1, 2, 3))  # (N,)
            kf = inten * (c - 1)
            k = np.rint(kf).astype(int)
            on_center = np.abs(kf - k) <= 0.15
            k = np.where(on_center, np.clip(k, 0, c - 1), 0)  # off → blank
            # rec_resize_norm right-pads with NORMALIZED zeros (the
            # reference pads the same, ocr.py:119-121); exact 0.0 in
            # x-space de-normalizes to mid-gray 0.5 which would alias to
            # class (C-1)/2 — a real model learns pad≈nothing, the fake
            # head detects the exact-zero signature instead (painted
            # uint8 grays are never exactly 127.5/255)
            pad_win = np.abs(x[:, :, :, 4 * t:4 * t + 4]).max(
                axis=(1, 2, 3)) < 1e-6
            k = np.where(pad_win, 0, k)
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
        from ragflow_spark.core.vision_prep import rec_resize_norm

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
            texts = [("", 0.0)] * len(imgs)
            # aspect-ratio sort: a mini-batch shares one padded width
            order = np.argsort([im.shape[1] / im.shape[0] for im in imgs]) \
                if imgs else np.array([], dtype=int)
            for beg in range(0, len(imgs), batch_size):
                chunk = order[beg:beg + batch_size]
                max_wh = max(
                    [320 / 48.0]
                    + [imgs[i].shape[1] / imgs[i].shape[0] for i in chunk]
                )
                batch = np.stack([
                    rec_resize_norm(imgs[i], max_wh) for i in chunk
                ])
                preds = sess.run(["logits"], {"x": batch})[0]
                for rno, (txt, conf) in enumerate(decoder(preds)):
                    texts[chunk[rno]] = (txt, float(conf))
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
            bands.append(int(round(255 * idx[ch] / (c - 1))))
            bands.append(0)
        w = 8 * len(bands) + 8
        im = np.zeros((48, w, 3), dtype=np.uint8)
        x = 4
        for v in bands:
            im[:, x:x + 8] = v
            x += 8
        out.append((f"rec{i:03d}", im.tobytes(), w, 48, text))
    return out
