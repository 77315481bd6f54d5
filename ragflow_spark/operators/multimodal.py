"""Multimodal column plumbing (image/audio/video as opaque binary).

The reference's vision tier (SURVEY.md §2.8, V1-V5) runs ONNX models whose
weights are downloaded at runtime and are unavailable in this sandbox, and
no image/audio codec libraries are installed. Per the build contract, the
*Spark-side plumbing is real* — schemas, partitioning, Arrow batch shape,
UDF signatures — while the codec step is stubbed:

- ``backend="none"``   raises NotImplementedError (the honest default)
- ``backend="fake"``   deterministic metadata derived from the bytes
  (xxhash-seeded), so the distributed plumbing is testable end-to-end.

On a real cluster, drop in a decode function (PIL/cv2/onnxruntime held in a
per-executor lazy singleton, exactly like the reference's model singletons —
deepdoc/vision/ocr.py:66-69 thread caps apply) without touching the plan.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

from pyspark.sql import DataFrame

MEDIA_META_SCHEMA = (
    "media_id long, kind string, n_bytes long, sha int, width int, "
    "height int, n_frames int, error string"
)


def _fake_decode(blob: bytes, kind: str) -> dict:
    h = hashlib.md5(blob).digest()
    return {
        "width": 64 + h[0] * 4,
        "height": 64 + h[1] * 4,
        "n_frames": 1 if kind == "image" else 1 + h[2] % 300,
    }


def decode_media_meta(
    df: DataFrame, id_col: str = "media_id", blob_col: str = "blob",
    kind_col: str = "kind", backend: str = "none",
) -> DataFrame:
    """Arrow-batched metadata extraction over binary media columns."""

    def run(batches) -> Iterator:
        import pandas as pd

        rows: dict[str, list] = {k: [] for k in (
            "media_id", "kind", "n_bytes", "sha", "width", "height",
            "n_frames", "error",
        )}
        for pdf in batches:
            for r in pdf.itertuples():
                blob = bytes(getattr(r, blob_col) or b"")
                kind = getattr(r, kind_col)
                base = {
                    "media_id": getattr(r, id_col),
                    "kind": kind,
                    "n_bytes": len(blob),
                    "sha": int.from_bytes(
                        hashlib.md5(blob).digest()[:2], "big"
                    ),
                }
                try:
                    if backend == "fake":
                        meta = _fake_decode(blob, kind)
                    elif backend == "bmp" and kind == "image" \
                            and blob[:2] == b"BM":
                        # one REAL codec path: the zero-dependency BMP
                        # decoder (core/bmp.py) — metadata from actual
                        # pixels; everything else stays honestly stubbed
                        from ragflow_spark.core.bmp import decode_bmp

                        im = decode_bmp(blob)
                        meta = {"width": im.shape[1],
                                "height": im.shape[0], "n_frames": 1}
                    else:
                        raise NotImplementedError(
                            "media codecs unavailable in this environment; "
                            "plug a decode backend (PIL/cv2/onnx) here — "
                            "uncompressed BMP decodes for real via "
                            "backend='bmp'"
                        )
                    err = None
                except (NotImplementedError, ValueError) as exc:
                    # per-row isolation: a truncated/corrupt BMP (BmpError
                    # is a ValueError) marks the row, not the task
                    meta = {"width": -1, "height": -1, "n_frames": -1}
                    err = str(exc)
                for k, v in {**base, **meta, "error": err}.items():
                    rows[k].append(v)
            out = pd.DataFrame(rows)
            rows = {k: [] for k in rows}
            yield out

    return df.mapInPandas(run, schema=MEDIA_META_SCHEMA)


def frame_sample_plan(df: DataFrame, every_n: int = 30) -> DataFrame:
    """Video frame-sampling *plan*: pairs (media_id, frame_no) for frames to
    decode — a pure explode on the (stubbed) frame count; the decode itself
    would be another mapInPandas with a real backend."""
    from pyspark.sql import functions as F

    return (
        df.filter(F.col("n_frames") > 0)
        .select(
            "media_id",
            F.explode(
                F.sequence(F.lit(0), F.col("n_frames") - 1, F.lit(every_n))
            ).alias("frame_no"),
        )
    )


DETECTOR_PLAN_SCHEMA = (
    "media_id long, in_h int, in_w int, tensor_h int, tensor_w int, "
    "scale_y double, scale_x double"
)


def prep_detector_inputs(
    df: DataFrame, id_col: str = "media_id",
    width_col: str = "width", height_col: str = "height",
    target_size: int = 800,
) -> DataFrame:
    """Distributed V-tier preprocessing plan: for each decoded image's
    (h, w), run the real preprocessing chain (core.vision_prep
    ``detector_input`` on a synthetic array of those dims) and emit the
    tensor geometry + scale factors an ONNX layout/TSR session would
    consume. The chain itself executes per row — this is the actual
    preprocessing work a detector stage does, minus only the model call;
    the scale rule (LinearResize.generate_scale) is mirrored bit-exactly
    in the DuckDB oracle."""

    def run(batches):
        import numpy as np
        import pandas as pd

        from ragflow_spark.core.vision_prep import (
            detector_input,
            generate_scale,
        )

        for pdf in batches:
            out = {k: [] for k in (
                "media_id", "in_h", "in_w", "tensor_h", "tensor_w",
                "scale_y", "scale_x",
            )}
            for r in pdf.itertuples():
                h, w = int(getattr(r, height_col)), int(getattr(r, width_col))
                if h <= 0 or w <= 0:
                    continue
                im = np.zeros((h, w, 3), dtype=np.uint8)
                tensor, _info = detector_input(im, target_size=target_size)
                # emit the float64 scales (the reference's im_info carries
                # float32, but a float32 round-trip shifts the 6th decimal
                # vs the oracle's double arithmetic)
                sy, sx = generate_scale((h, w), target_size)
                out["media_id"].append(getattr(r, id_col))
                out["in_h"].append(h)
                out["in_w"].append(w)
                out["tensor_h"].append(tensor.shape[1])
                out["tensor_w"].append(tensor.shape[2])
                out["scale_y"].append(round(sy, 6))
                out["scale_x"].append(round(sx, 6))
            yield pd.DataFrame(out)

    return df.select(id_col, width_col, height_col).mapInPandas(
        run, schema=DETECTOR_PLAN_SCHEMA
    )
