"""OCR crop geometry — ports of the reference's box→line-image step
(deepdoc/vision/ocr.py:497-552): perspective rectification of a detected
quad to an upright line image, the tall-box rot90 rule, and the
top-to-bottom/left-to-right box ordering with the same-row bubble pass.

cv2-free: ``get_perspective_transform`` solves the 8-parameter homography
linear system (what cv2.getPerspectiveTransform does), and
``warp_perspective`` inverse-maps with BILINEAR sampling + BORDER_REPLICATE
clamping — a documented stand-in for the reference's INTER_CUBIC (same
class of deviation as the bilinear resize in core/vision_prep)."""

from __future__ import annotations

import numpy as np


def get_perspective_transform(src: np.ndarray, dst: np.ndarray) -> np.ndarray:
    """3×3 homography M with dst ~ M·src for 4 point pairs
    (cv2.getPerspectiveTransform equivalent: solve the 8-unknown system
    a·x + b·y + c - g·x·X - h·y·X = X etc., M[2,2] = 1)."""
    src = np.asarray(src, dtype=np.float64)
    dst = np.asarray(dst, dtype=np.float64)
    a = np.zeros((8, 8), dtype=np.float64)
    b = np.zeros(8, dtype=np.float64)
    for i in range(4):
        x, y = src[i]
        u, v = dst[i]
        a[i] = [x, y, 1, 0, 0, 0, -x * u, -y * u]
        a[i + 4] = [0, 0, 0, x, y, 1, -x * v, -y * v]
        b[i] = u
        b[i + 4] = v
    h = np.linalg.solve(a, b)
    return np.array([[h[0], h[1], h[2]],
                     [h[3], h[4], h[5]],
                     [h[6], h[7], 1.0]])


def warp_perspective(img: np.ndarray, m: np.ndarray,
                     size_wh: tuple[int, int]) -> np.ndarray:
    """Inverse-map warp: for every destination pixel, sample the source at
    M⁻¹·(x, y, 1) with bilinear interpolation; coordinates outside the
    source clamp to the border (cv2.BORDER_REPLICATE)."""
    out_w, out_h = size_wh
    src_h, src_w = img.shape[:2]
    minv = np.linalg.inv(m)
    xs, ys = np.meshgrid(np.arange(out_w), np.arange(out_h))
    ones = np.ones_like(xs)
    pts = np.stack([xs, ys, ones]).reshape(3, -1).astype(np.float64)
    sp = minv @ pts
    sx = sp[0] / sp[2]
    sy = sp[1] / sp[2]
    sx = np.clip(sx, 0, src_w - 1)
    sy = np.clip(sy, 0, src_h - 1)
    x0 = np.floor(sx).astype(int)
    y0 = np.floor(sy).astype(int)
    x1 = np.minimum(x0 + 1, src_w - 1)
    y1 = np.minimum(y0 + 1, src_h - 1)
    fx = (sx - x0)[:, None]
    fy = (sy - y0)[:, None]
    # gather in the source dtype FIRST, widen only the gathered pixels:
    # the previous astype(float64) converted the ENTIRE page raster per
    # crop (~4 MB copy x ~100 crops/page — the top scanned-PDF hotspot,
    # r8 profile). uint8 -> float64 is exact, so values are bit-identical.
    flat = img.reshape(src_h * src_w, -1)
    p00 = flat[y0 * src_w + x0].astype(np.float64)
    p01 = flat[y0 * src_w + x1].astype(np.float64)
    p10 = flat[y1 * src_w + x0].astype(np.float64)
    p11 = flat[y1 * src_w + x1].astype(np.float64)
    val = (p00 * (1 - fx) * (1 - fy) + p01 * fx * (1 - fy)
           + p10 * (1 - fx) * fy + p11 * fx * fy)
    out = val.reshape(out_h, out_w, -1)
    if img.dtype == np.uint8:
        out = np.clip(np.rint(out), 0, 255).astype(np.uint8)
    else:
        out = out.astype(img.dtype)
    if img.ndim == 2:
        out = out[:, :, 0]
    return out


def get_rotate_crop_image(img: np.ndarray, points: np.ndarray) -> np.ndarray:
    """ocr.py:497-529 — rectify the quad (clockwise from top-left) to an
    upright crop sized by the quad's edge lengths; rotate 90° when the
    crop is ≥1.5× taller than wide (vertical text lines)."""
    points = np.asarray(points, dtype=np.float64).reshape(4, 2)
    assert len(points) == 4, "shape of points must be 4*2"
    img_crop_width = int(
        max(np.linalg.norm(points[0] - points[1]),
            np.linalg.norm(points[2] - points[3])))
    img_crop_height = int(
        max(np.linalg.norm(points[0] - points[3]),
            np.linalg.norm(points[1] - points[2])))
    pts_std = np.array([[0, 0], [img_crop_width, 0],
                        [img_crop_width, img_crop_height],
                        [0, img_crop_height]], dtype=np.float64)
    m = get_perspective_transform(points, pts_std)
    dst = warp_perspective(img, m, (max(img_crop_width, 1),
                                    max(img_crop_height, 1)))
    dst_h, dst_w = dst.shape[:2]
    if dst_h * 1.0 / max(dst_w, 1) >= 1.5:
        dst = np.rot90(dst)
    return dst


def sorted_boxes(dt_boxes) -> list:
    """ocr.py:531-552 — top-to-bottom then left-to-right, with the
    bubble pass that swaps boxes whose top-left y's are within 10px but
    arrive right-before-left."""
    boxes = [np.asarray(b, dtype=np.float64).reshape(4, 2)
             for b in dt_boxes]
    num_boxes = len(boxes)
    _boxes = sorted(boxes, key=lambda x: (x[0][1], x[0][0]))
    for i in range(num_boxes - 1):
        for j in range(i, -1, -1):
            if abs(_boxes[j + 1][0][1] - _boxes[j][0][1]) < 10 and \
                    (_boxes[j + 1][0][0] < _boxes[j][0][0]):
                _boxes[j], _boxes[j + 1] = _boxes[j + 1], _boxes[j]
            else:
                break
    return _boxes
