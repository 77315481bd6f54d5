"""DBPostProcess — the deterministic half of the OCR text DETECTOR (V1).

Port of ``deepdoc/vision/postprocess.py:37-255`` (DBPostProcess): turn a
DB probability map into scored text quads — threshold → connected
components → min-area rectangle → score filter → closed-form quad unclip
→ min-size gate → rescale to source coordinates. This is everything
downstream of the (non-vendored) DBNet ONNX forward pass; a real model's
``maps`` output drops straight into :meth:`DBPostProcess.__call__`.

cv2 / shapely / pyclipper are absent from this container, so their five
primitives are reimplemented numpy-only and exposed at module level
(:func:`find_contours`, :func:`min_area_rect`, :func:`fill_poly_mask`,
:func:`polygon_area_perimeter`, :func:`offset_convex_polygon`) — the A/B
suite injects them into the reference module as the shared stand-in and
executes the reference's own ``boxes_from_bitmap`` loop against ours.

Two documented deviations from the cv2-backed original:
- contour enumeration order is raster-scan (top-left first); cv2's
  internal ordering differs — irrelevant past the per-box filters except
  under ``max_candidates`` truncation of pathological maps;
- ``unclip`` offsets the quad's edges outward by the same distance
  pyclipper would use and intersects adjacent edge lines (miter). For
  the convex quads the quad path produces, the subsequent min-area-rect
  step makes this equivalent to pyclipper's JT_ROUND result.
"""

from __future__ import annotations

import numpy as np

# ------------------------------------------------------------- contours


def find_contours(bitmap: np.ndarray) -> list[np.ndarray]:
    """Per-component boundary extraction over a {0,1} bitmap (the
    RETR_LIST role of cv2.findContours for DB's quad path). Each
    8-connected foreground component yields its boundary-pixel set —
    every foreground pixel with a 4-neighbouring background pixel (or on
    the image edge) — as an (N, 2) int32 array in (x, y), raster order.

    DB's quad path consumes contours ONLY through min-area-rect (convex
    hull — identical over the boundary set and over an ordered border
    polygon) and the fast bbox score (quad-based); an ordered
    CHAIN_APPROX chain is therefore not reconstructed. Components are
    enumerated in raster-scan order of their first pixel."""
    h, w = bitmap.shape
    fg = bitmap > 0
    if not fg.any():
        return []
    # boundary test: 4-neighbour background (cv2 border definition)
    pad = np.zeros((h + 2, w + 2), dtype=bool)
    pad[1:-1, 1:-1] = fg
    interior = (pad[:-2, 1:-1] & pad[2:, 1:-1]
                & pad[1:-1, :-2] & pad[1:-1, 2:])
    is_boundary = fg & ~interior

    # 8-connected components via row-run union-find (output identical to
    # the previous per-pixel BFS — same component partition, components
    # in raster order of their first pixel, boundary pixels in (y, x)
    # raster order — but ~50× faster: the Python work is per RUN, not
    # per pixel; r5 profile had the pixel walk at 0.8 s per 800×600 map)
    parent: list[int] = []

    def find(a: int) -> int:
        while parent[a] != a:
            parent[a] = parent[parent[a]]
            a = parent[a]
        return a

    def union(a: int, b: int) -> None:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    run_label = np.zeros((h, w), dtype=np.int32)  # run id + 1 per pixel
    prev_runs: list[tuple[int, int, int]] = []  # (x_start, x_end, run_id)
    for y in range(h):
        xs = np.flatnonzero(fg[y])
        if xs.size == 0:
            prev_runs = []
            continue
        breaks = np.flatnonzero(np.diff(xs) > 1)
        starts = np.concatenate(([0], breaks + 1))
        ends = np.concatenate((breaks, [xs.size - 1]))
        cur_runs = []
        j = 0  # both rows' runs are x-sorted → two-pointer overlap scan
        for s, e in zip(starts, ends):
            x0, x1 = int(xs[s]), int(xs[e])
            rid = len(parent)
            parent.append(rid)
            run_label[y, x0:x1 + 1] = rid + 1
            # 8-connectivity: overlap with prev-row runs extended by 1
            while j < len(prev_runs) and prev_runs[j][1] < x0 - 1:
                j += 1
            jj = j
            while jj < len(prev_runs) and prev_runs[jj][0] <= x1 + 1:
                union(rid, prev_runs[jj][2])
                jj += 1
            cur_runs.append((x0, x1, rid))
        prev_runs = cur_runs

    roots = np.array([find(i) for i in range(len(parent))], dtype=np.int64)
    # canonical component order = raster order of each root's first run
    # (runs were created in raster order, so the first run id with a
    # given root IS the component's first pixel's run)
    first_run_of_root: dict[int, int] = {}
    order: list[int] = []
    for rid, root in enumerate(roots):
        if root not in first_run_of_root:
            first_run_of_root[root] = len(order)
            order.append(root)
    comp_of_run = np.array(
        [first_run_of_root[r] for r in roots], dtype=np.int64)

    ys, bxs = np.nonzero(is_boundary)  # raster (y, x) order
    comp = comp_of_run[run_label[ys, bxs] - 1]
    sort = np.argsort(comp, kind="stable")
    comp_s = comp[sort]
    pts = np.stack([bxs[sort], ys[sort]], axis=1).astype(np.int32)
    cuts = np.flatnonzero(np.diff(comp_s)) + 1
    return [np.ascontiguousarray(g) for g in np.split(pts, cuts)]


# --------------------------------------------------------- min-area rect


def _convex_hull(pts: np.ndarray) -> np.ndarray:
    """Andrew monotone chain, float output.

    Large inputs (contour boundary sets run to hundreds of pixels) are
    first reduced to the per-distinct-y min-x and max-x points — every
    hull vertex is extremal in x within its own y row (a same-y point
    strictly between two others is their convex combination, and the
    chain's ``<= 0`` pop discards collinear points anyway), so the hull
    vertex sequence is IDENTICAL while the O(n) Python pop loop sees
    ~2·rows points instead of the full boundary (r8: the loop was 0.4 s
    of a 4.6 s 100-PDF profile)."""
    p = np.asarray(pts, dtype=np.float64).reshape(-1, 2)
    if len(p) > 64:
        order = np.lexsort((p[:, 0], p[:, 1]))
        ps = p[order]
        starts = np.concatenate(
            [[0], np.flatnonzero(np.diff(ps[:, 1])) + 1])
        ends = np.concatenate([starts[1:] - 1, [len(ps) - 1]])
        p = np.concatenate([ps[starts], ps[ends]])
    p = np.unique(p, axis=0)
    p = p[np.lexsort((p[:, 1], p[:, 0]))]
    if len(p) <= 2:
        return p

    def half(points):
        # scalar 2D cross — the same a0*b1 - a1*b0 float64 expression
        # np.cross computes, minus its ~30 µs/call axis machinery (r5
        # profile: 11k np.cross calls = 0.3 s per det map)
        out = []
        for q in points:
            while len(out) >= 2:
                ax = out[-1][0] - out[-2][0]
                ay = out[-1][1] - out[-2][1]
                bx = q[0] - out[-2][0]
                by = q[1] - out[-2][1]
                if ax * by - ay * bx <= 0:
                    out.pop()
                else:
                    break
            out.append(q)
        return out

    lower = half(p)
    upper = half(p[::-1])
    return np.array(lower[:-1] + upper[:-1])


def min_area_rect(pts: np.ndarray):
    """Rotating calipers. Returns (corners (4,2) float64, (w, h)) with the
    corners in clockwise order starting from an arbitrary vertex — the
    caller (get_mini_boxes) re-orders by x/y exactly like the reference
    does with cv2.boxPoints output."""
    hull = _convex_hull(pts.reshape(-1, 2))
    if len(hull) == 1:
        c = np.repeat(hull, 4, axis=0)
        return c, (0.0, 0.0)
    if len(hull) == 2:
        d = hull[1] - hull[0]
        corners = np.array([hull[0], hull[1], hull[1], hull[0]])
        return corners, (float(np.hypot(*d)), 0.0)
    best = None
    n = len(hull)
    for i in range(n):
        e = hull[(i + 1) % n] - hull[i]
        norm = np.hypot(*e)
        if norm == 0:
            continue
        ux, uy = e / norm            # edge direction
        vx, vy = -uy, ux             # normal
        proj_u = hull @ np.array([ux, uy])
        proj_v = hull @ np.array([vx, vy])
        w = proj_u.max() - proj_u.min()
        h = proj_v.max() - proj_v.min()
        area = w * h
        if best is None or area < best[0] - 1e-12:
            best = (area, ux, uy, vx, vy,
                    proj_u.min(), proj_u.max(), proj_v.min(), proj_v.max())
    _, ux, uy, vx, vy, u0, u1, v0, v1 = best
    u = np.array([ux, uy])
    v = np.array([vx, vy])
    corners = np.array([
        u0 * u + v0 * v, u1 * u + v0 * v, u1 * u + v1 * v, u0 * u + v1 * v,
    ])
    return corners, (float(u1 - u0), float(v1 - v0))


# ------------------------------------------------------------- fill/mean


def fill_poly_mask(shape: tuple[int, int], pts: np.ndarray) -> np.ndarray:
    """Scanline polygon fill (cv2.fillPoly role) over an integer grid:
    a pixel is inside when its CENTER is inside the polygon (even-odd),
    with the polygon's vertices taken as lattice points."""
    h, w = shape
    mask = np.zeros((h, w), dtype=np.uint8)
    p = pts.reshape(-1, 2).astype(np.float64)
    n = len(p)
    if n < 3:
        return mask
    # vectorized scanline (r8): same crossing expression per (row, edge)
    # as the former Python double loop — identical float64 arithmetic,
    # identical ceil/floor span ends, so the mask is bit-identical; the
    # loops cost ~3 ms per box score at line-crop sizes, the hot half of
    # DBPostProcess after the contour pass
    ys = np.arange(h, dtype=np.float64)[:, None]           # (h, 1)
    x1e, y1e = p[:, 0][None, :], p[:, 1][None, :]          # (1, n)
    x2e = np.roll(p[:, 0], -1)[None, :]
    y2e = np.roll(p[:, 1], -1)[None, :]
    crossing = (((y1e <= ys) & (ys < y2e)) | ((y2e <= ys) & (ys < y1e)))
    with np.errstate(divide="ignore", invalid="ignore"):
        xs = x1e + (ys - y1e) * (x2e - x1e) / (y2e - y1e)  # (h, n)
    xs = np.where(crossing, xs, np.inf)
    xs.sort(axis=1)                                        # non-crossings last
    cnt = crossing.sum(axis=1)
    for yi in np.nonzero(cnt)[0]:
        row = xs[yi]
        for j in range(0, cnt[yi] - 1, 2):
            a = int(np.ceil(row[j] - 1e-9))
            b = int(np.floor(row[j + 1] + 1e-9))
            if b >= a:
                mask[yi, max(0, a):min(w, b + 1)] = 1
    # boundary pixels are part of the fill (cv2.fillPoly convention):
    # rasterize each edge inclusively — vectorized over the step index
    # with the same f = t/steps parametrization and half-even rounding
    # (np.rint == the former int(round(...)) on float64)
    q = np.rint(p).astype(np.int64)
    q2 = np.roll(q, -1, axis=0)
    for i in range(n):
        x1, y1 = q[i]
        x2, y2 = q2[i]
        steps = int(max(abs(x2 - x1), abs(y2 - y1))) + 1
        f = np.arange(steps + 1, dtype=np.float64) / max(1, steps)
        bx = np.rint(x1 + f * (x2 - x1)).astype(np.int64)
        by = np.rint(y1 + f * (y2 - y1)).astype(np.int64)
        keep = (by >= 0) & (by < h) & (bx >= 0) & (bx < w)
        mask[by[keep], bx[keep]] = 1
    return mask


# --------------------------------------------------- polygon geometry


def polygon_area_perimeter(pts: np.ndarray) -> tuple[float, float]:
    """(area, perimeter) of a closed polygon (the shapely Polygon role)."""
    p = pts.reshape(-1, 2).astype(np.float64)
    x, y = p[:, 0], p[:, 1]
    area = 0.5 * abs(np.dot(x, np.roll(y, -1)) - np.dot(y, np.roll(x, -1)))
    d = p - np.roll(p, 1, axis=0)
    return float(area), float(np.hypot(d[:, 0], d[:, 1]).sum())


def offset_convex_polygon(pts: np.ndarray, distance: float) -> np.ndarray:
    """Outward-offset a convex polygon by ``distance`` (the pyclipper
    JT_ROUND role, closed-form): shift each edge along its outward normal
    and intersect adjacent edge lines. For the convex quads the DB quad
    path feeds through min-area-rect afterwards, this is exact."""
    p = pts.reshape(-1, 2).astype(np.float64)
    n = len(p)
    # ensure counter-clockwise orientation (positive signed area)
    x, y = p[:, 0], p[:, 1]
    signed = 0.5 * (np.dot(x, np.roll(y, -1)) - np.dot(y, np.roll(x, -1)))
    if signed < 0:
        p = p[::-1]
    lines = []
    for i in range(n):
        a, b = p[i], p[(i + 1) % n]
        e = b - a
        norm = np.hypot(*e)
        if norm == 0:
            continue
        # outward normal of a CCW polygon edge points right of the edge
        nx, ny = e[1] / norm, -e[0] / norm
        lines.append((a + distance * np.array([nx, ny]), e))
    m = len(lines)
    out = []
    for i in range(m):
        (a1, d1), (a2, d2) = lines[i - 1], lines[i]
        denom = d1[0] * d2[1] - d1[1] * d2[0]
        if abs(denom) < 1e-12:
            out.append(a2)
            continue
        t = ((a2[0] - a1[0]) * d2[1] - (a2[1] - a1[1]) * d2[0]) / denom
        out.append(a1 + t * d1)
    return np.array(out)


# -------------------------------------------------------------- the op


class DBPostProcess:
    """postprocess.py:37-255, quad path. ``__call__(outs_dict, shape_list)``
    mirrors the reference signature: maps (B,1,H,W) + per-image
    (src_h, src_w, ratio_h, ratio_w) → [{'points': (N,4,2) int32}]."""

    def __init__(self, thresh=0.3, box_thresh=0.7, max_candidates=1000,
                 unclip_ratio=2.0, score_mode="fast", box_type="quad",
                 **kwargs):
        assert score_mode in ("slow", "fast")
        if box_type != "quad":
            raise NotImplementedError(
                "poly box_type needs approxPolyDP; the OCR det pipeline "
                "uses quad (ocr.py TextDetector config)")
        self.thresh = thresh
        self.box_thresh = box_thresh
        self.max_candidates = max_candidates
        self.unclip_ratio = unclip_ratio
        self.min_size = 3
        self.score_mode = score_mode

    def get_mini_boxes(self, contour):
        corners, (rw, rh) = min_area_rect(np.asarray(contour))
        points = sorted(corners.tolist(), key=lambda q: q[0])
        if points[1][1] > points[0][1]:
            index_1, index_4 = 0, 1
        else:
            index_1, index_4 = 1, 0
        if points[3][1] > points[2][1]:
            index_2, index_3 = 2, 3
        else:
            index_2, index_3 = 3, 2
        box = [points[index_1], points[index_2],
               points[index_3], points[index_4]]
        return box, min(rw, rh)

    def box_score_fast(self, bitmap, _box):
        h, w = bitmap.shape[:2]
        box = _box.copy()
        xmin = int(np.clip(np.floor(box[:, 0].min()), 0, w - 1))
        xmax = int(np.clip(np.ceil(box[:, 0].max()), 0, w - 1))
        ymin = int(np.clip(np.floor(box[:, 1].min()), 0, h - 1))
        ymax = int(np.clip(np.ceil(box[:, 1].max()), 0, h - 1))
        box[:, 0] = box[:, 0] - xmin
        box[:, 1] = box[:, 1] - ymin
        mask = fill_poly_mask((ymax - ymin + 1, xmax - xmin + 1),
                              box.astype(np.int32))
        crop = bitmap[ymin:ymax + 1, xmin:xmax + 1]
        denom = int(mask.sum())
        if denom == 0:
            return 0.0
        return float((crop * mask).sum() / denom)

    def box_score_slow(self, pred, contour, bitmap):
        """postprocess.py box_score_slow: mean of the probability map over
        the contour polygon rather than the min-area quad. Our contours
        are boundary-pixel SETS (find_contours docstring), so the polygon
        interior is recovered as the 8-connected segmentation component
        containing the contour — identical to cv2.fillPoly for hole-free
        components (the DB text-blob norm; a component with interior holes
        would score them in cv2's fill and not here — documented
        deviation, unreachable through get_mini_boxes' convex quads)."""
        h, w = bitmap.shape[:2]
        xmin = int(np.clip(contour[:, 0].min(), 0, w - 1))
        xmax = int(np.clip(contour[:, 0].max(), 0, w - 1))
        ymin = int(np.clip(contour[:, 1].min(), 0, h - 1))
        ymax = int(np.clip(contour[:, 1].max(), 0, h - 1))
        crop = bitmap[ymin:ymax + 1, xmin:xmax + 1] > 0
        mask = np.zeros_like(crop, dtype=bool)
        seed = (int(contour[0, 1]) - ymin, int(contour[0, 0]) - xmin)
        stack = [seed]
        mask[seed] = True
        ch, cw = crop.shape
        while stack:
            y, x = stack.pop()
            for dy in (-1, 0, 1):
                for dx in (-1, 0, 1):
                    ny, nx_ = y + dy, x + dx
                    if 0 <= ny < ch and 0 <= nx_ < cw and crop[ny, nx_] \
                            and not mask[ny, nx_]:
                        mask[ny, nx_] = True
                        stack.append((ny, nx_))
        denom = int(mask.sum())
        if denom == 0:
            return 0.0
        return float(pred[ymin:ymax + 1, xmin:xmax + 1][mask].mean())

    def unclip(self, box, unclip_ratio):
        area, length = polygon_area_perimeter(np.asarray(box))
        if length == 0:
            return np.asarray(box, dtype=np.float64)
        distance = area * unclip_ratio / length
        return offset_convex_polygon(np.asarray(box), distance)

    def boxes_from_bitmap(self, pred, bitmap, dest_width, dest_height):
        height, width = bitmap.shape
        contours = find_contours(bitmap)
        boxes, scores = [], []
        for contour in contours[:self.max_candidates]:
            points, sside = self.get_mini_boxes(contour)
            if sside < self.min_size:
                continue
            points = np.array(points)
            if self.score_mode == "fast":
                score = self.box_score_fast(pred, points.reshape(-1, 2))
            else:
                score = self.box_score_slow(pred, contour, bitmap)
            if self.box_thresh > score:
                continue
            box = self.unclip(points, self.unclip_ratio).reshape(-1, 1, 2)
            box, sside = self.get_mini_boxes(box)
            if sside < self.min_size + 2:
                continue
            box = np.array(box)
            box[:, 0] = np.clip(
                np.round(box[:, 0] / width * dest_width), 0, dest_width)
            box[:, 1] = np.clip(
                np.round(box[:, 1] / height * dest_height), 0, dest_height)
            boxes.append(box.astype("int32"))
            scores.append(score)
        return np.array(boxes, dtype="int32"), scores

    def __call__(self, outs_dict, shape_list):
        pred = outs_dict["maps"]
        pred = pred[:, 0, :, :]
        segmentation = pred > self.thresh
        boxes_batch = []
        for i in range(pred.shape[0]):
            src_h, src_w, _rh, _rw = shape_list[i]
            boxes, _scores = self.boxes_from_bitmap(
                pred[i], segmentation[i], src_w, src_h)
            boxes_batch.append({"points": boxes})
        return boxes_batch
