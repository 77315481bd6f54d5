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
                    else:
                        raise NotImplementedError(
                            "media codecs unavailable in this environment; "
                            "plug a decode backend (PIL/cv2/onnx) here"
                        )
                    err = None
                except NotImplementedError as exc:
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
