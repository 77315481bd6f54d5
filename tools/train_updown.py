"""Train the W5 up-down concat scorer as a tiny deterministic GBDT.

The reference scores "does box B continue box A's paragraph?" with a
non-vendored XGBoost booster (deepdoc/parser/pdf_parser.py:43-63) over
the 32-feature pair vector. The weights file does not exist in this
sandbox (or the reference repo), so this script trains a REPLACEMENT on
a synthetic labeled corpus where ground truth is known by construction:
documents are generated element-by-element (paragraphs, titles, bullet
lists, tables, page-number crumbs) and laid out into line boxes, so
"same paragraph" is a generator fact, not a heuristic.

Output: ragflow_spark/core/updown_model.py — trees as a pure literal
(no numpy/xgboost at eval time) + META with the measured accuracies.
The script REFUSES to export a model that does not beat rule_score on
the held-out split, so a bad training run can't silently regress W5.

Run: python tools/train_updown.py
"""

from __future__ import annotations

import random
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from ragflow_spark.core import updown  # noqa: E402

# ------------------------------------------------------------- corpus

_LATIN = (
    "the engine reads every page and keeps the layout intact while the "
    "parser walks each line of text looking for paragraph boundaries and "
    "merge decisions that depend on punctuation geometry and fonts "
    "velocity margin column table figure caption heading appendix "
    "results methods analysis corpus tokens model weight threshold"
).split()
_CJK = "数据引擎每页读取文本行合并段落边界判断标点几何字体速度引言方法结果分析语料模型权重阈值表格图题"
_BULLETS = ["1. ", "2. ", "3. ", "(a) ", "(b) ", "• ", "a. ", "一、", "二、"]

PAGE_W, PAGE_H, MARGIN = 612.0, 792.0, 72.0
USABLE = PAGE_W - 2 * MARGIN


def _sentence(rng: random.Random, cjk: bool) -> str:
    if cjk:
        n = rng.randint(8, 40)
        body = "".join(rng.choice(_CJK) for _ in range(n))
        if rng.random() < 0.3:
            k = rng.randint(2, max(3, n - 2))
            body = body[:k] + "，" + body[k:]
        return body + rng.choice("。。。！？；")
    n = rng.randint(5, 24)
    words = [rng.choice(_LATIN) for _ in range(n)]
    words[0] = words[0].capitalize()
    if rng.random() < 0.4:
        words.insert(rng.randint(1, n - 1), rng.choice(_LATIN) + ",")
    end = rng.choice([".", ".", ".", "!", "?", ";"])
    return " ".join(words) + end


def _wrap(text: str, width_chars: int) -> list[str]:
    lines, cur = [], ""
    for tok in text.split(" ") if " " in text else list(text):
        joined = (cur + " " + tok).strip() if " " in text else cur + tok
        if len(joined) > width_chars and cur:
            lines.append(cur)
            cur = tok
        else:
            cur = joined
    if cur:
        lines.append(cur)
    return lines


def _gen_doc(rng: random.Random) -> tuple[list[dict], list[int]]:
    """One synthetic doc: returns (line boxes in reading order with
    CUMULATIVE y across pages — the convention pdf_layout feeds
    concat_downward — and each box's paragraph id; -1 for crumbs)."""
    cw = rng.uniform(4.5, 6.5)            # char width
    lh = rng.uniform(10.0, 14.0)          # line height
    gap = lh * rng.uniform(1.3, 2.2)      # paragraph gap
    width_chars = int(USABLE / cw)
    boxes: list[dict] = []
    para_of: list[int] = []
    y = MARGIN
    para_id = 0

    def emit(text, indent, ltype, pid, gap_above):
        nonlocal y
        y += gap_above
        page = int(y // PAGE_H) + 1
        x0 = MARGIN + indent
        boxes.append({
            "text": text, "x0": x0, "x1": min(x0 + len(text) * cw,
                                              PAGE_W - MARGIN),
            "top": y, "bottom": y + lh, "page_number": page,
            "layout_type": ltype,
        })
        para_of.append(pid)
        y += lh

    for _ in range(rng.randint(6, 14)):
        kind = rng.choices(
            ["para", "cjk_para", "title", "bullets", "table", "crumb"],
            weights=[4, 2, 1.5, 1.5, 1, 1])[0]
        para_id += 1
        if kind in ("para", "cjk_para"):
            cjk = kind == "cjk_para"
            text = ("" if cjk else " ").join(
                _sentence(rng, cjk) for _ in range(rng.randint(1, 5)))
            indent = cw * rng.choice([0, 0, 2]) if not cjk else cw * 2
            # 40% of paragraphs get NO extra leading space (tight-set
            # documents) — geometry alone can't separate those; the
            # scorer must read punctuation/casing/indent features
            lead = gap if rng.random() < 0.6 else lh * rng.uniform(0.15, 0.5)
            for i, ln in enumerate(_wrap(text, width_chars)):
                emit(ln, indent if i == 0 else 0.0, "text", para_id,
                     lead if i == 0 else lh * rng.uniform(0.15, 0.5))
        elif kind == "title":
            t = " ".join(rng.choice(_LATIN).capitalize()
                         for _ in range(rng.randint(2, 6)))
            if rng.random() < 0.5:
                t = f"{rng.randint(1, 9)}. {t}"
            emit(t, 0.0, "title", para_id, gap * 1.2)
        elif kind == "bullets":
            for _ in range(rng.randint(2, 5)):
                para_id += 1
                item = rng.choice(_BULLETS) + _sentence(
                    rng, rng.random() < 0.3)
                for i, ln in enumerate(_wrap(item, width_chars - 4)):
                    emit(ln, cw * (2 if i == 0 else 4), "text", para_id,
                         lh * (0.6 if i == 0 else rng.uniform(0.15, 0.5)))
        elif kind == "table":
            for _ in range(rng.randint(2, 4)):
                para_id += 1
                row = "  ".join(str(rng.randint(0, 9999))
                                for _ in range(rng.randint(3, 6)))
                emit(row, cw * 4, "table", para_id, lh * 0.4)
        else:  # crumb: page number / stray figure number
            emit(str(rng.randint(1, 300)), USABLE / 2, "text", -1,
                 gap * rng.uniform(1.0, 3.0))
    return boxes, para_of


def make_pairs(n_docs: int, seed: int) -> tuple[np.ndarray, np.ndarray]:
    """Candidate (up, down) pairs the chain walker would score, with
    ground-truth labels: 1 iff down is the NEXT line of up's paragraph
    (allowing crumb interlopers between them, which the walker skips)."""
    rng = random.Random(seed)
    X, yv = [], []
    for _ in range(n_docs):
        boxes, para_of = _gen_doc(rng)
        mh_pages = {}
        for b in boxes:
            mh_pages.setdefault(b["page_number"], []).append(
                b["bottom"] - b["top"])
        npages = max(mh_pages)
        mh = [float(np.mean(mh_pages.get(p + 1, [12.0])))
              for p in range(npages)]
        updown.assign_pseudo_regions(boxes, mh)
        # in_row exactly as concat_downward computes it
        for i, b in enumerate(boxes):
            m = mh[b["page_number"] - 1]
            b["in_row"] = 0
            j = max(0, i - 12)
            while j < min(i + 12, len(boxes)):
                if j != i:
                    yd = updown._y_dis(b, boxes[j]) / max(m, 1e-6)
                    if abs(yd) < 1:
                        b["in_row"] += 1
                    elif yd > 0:
                        break
                j += 1
        for i in range(len(boxes)):
            for j in range(i + 1, min(i + 4, len(boxes))):
                up, down = boxes[i], boxes[j]
                if not up["text"].strip() or not down["text"].strip():
                    continue
                between = para_of[i + 1:j]
                label = int(
                    para_of[i] != -1 and para_of[i] == para_of[j]
                    and all(p != para_of[i] for p in between))
                if j > i + 1 and any(p == para_of[i] for p in between):
                    continue  # walker never skips a line of the same para
                X.append([float(v) for v in
                          updown.updown_concat_features(up, down)])
                yv.append(label)
    return np.asarray(X, dtype=np.float64), np.asarray(yv, dtype=np.float64)


# ------------------------------------------------------------ trainer


def _best_split(X, g, h, lam=1.0):
    """Exhaustive greedy split (gain = GBDT second-order formula);
    deterministic tie-break on (feature, threshold)."""
    G, H = g.sum(), h.sum()
    base = G * G / (H + lam)
    best = None
    for f in range(X.shape[1]):
        vals = np.unique(X[:, f])
        if len(vals) < 2:
            continue
        if len(vals) > 24:
            qs = np.quantile(vals, np.linspace(0.04, 0.96, 24))
            cands = np.unique(qs)
        else:
            cands = (vals[:-1] + vals[1:]) / 2
        for t in cands:
            m = X[:, f] <= t
            nl = int(m.sum())
            if nl < 20 or len(m) - nl < 20:
                continue
            Gl, Hl = g[m].sum(), h[m].sum()
            gain = (Gl * Gl / (Hl + lam)
                    + (G - Gl) ** 2 / (H - Hl + lam) - base)
            if best is None or gain > best[0] + 1e-12:
                best = (gain, f, float(t), m)
    if best is None or best[0] < 1e-6:
        return None
    return best[1], best[2], best[3]


def _build_tree(X, g, h, depth, lam=1.0):
    if depth == 0:
        return round(float(-g.sum() / (h.sum() + lam)), 6)
    sp = _best_split(X, g, h, lam)
    if sp is None:
        return round(float(-g.sum() / (h.sum() + lam)), 6)
    f, t, m = sp
    return (f, t,
            _build_tree(X[m], g[m], h[m], depth - 1, lam),
            _build_tree(X[~m], g[~m], h[~m], depth - 1, lam))


def _tree_eval(tree, x):
    while isinstance(tree, tuple):
        f, t, left, right = tree
        tree = left if x[f] <= t else right
    return tree


def train(X, y, rounds=40, depth=3, lr=0.3):
    margin = np.zeros(len(y))
    trees = []
    for _ in range(rounds):
        p = 1.0 / (1.0 + np.exp(-margin))
        tree = _build_tree(X, p - y, p * (1 - p), depth)
        trees.append(tree)
        margin += lr * np.array([_tree_eval(tree, x) for x in X])
    return trees


def predict_margin(trees, X, lr=0.3):
    out = np.zeros(len(X))
    for tr in trees:
        out += lr * np.array([_tree_eval(tr, x) for x in X])
    return out


def main():
    Xtr, ytr = make_pairs(400, seed=20260817)
    Xte, yte = make_pairs(120, seed=99990001)
    print(f"train pairs {len(ytr)} (pos {ytr.mean():.3f}) "
          f"test pairs {len(yte)} (pos {yte.mean():.3f})")
    trees = train(Xtr, ytr)
    acc_tr = float((
        (predict_margin(trees, Xtr) > 0) == (ytr > 0.5)).mean())
    acc_te = float((
        (predict_margin(trees, Xte) > 0) == (yte > 0.5)).mean())
    rule_te = float(np.mean([
        (updown.rule_score(list(x)) > 0.5) == (lab > 0.5)
        for x, lab in zip(Xte, yte)]))
    print(f"tree train acc {acc_tr:.4f}  held-out {acc_te:.4f}  "
          f"rule_score held-out {rule_te:.4f}")
    if acc_te <= rule_te:
        raise SystemExit(
            f"REFUSING export: tree held-out acc {acc_te:.4f} does not "
            f"beat rule_score {rule_te:.4f}")
    out = Path(__file__).resolve().parent.parent / \
        "ragflow_spark" / "core" / "updown_model.py"
    body = (
        '"""GENERATED by tools/train_updown.py — do not hand-edit.\n\n'
        "Deterministic GBDT replacing the reference's non-vendored "
        "XGBoost\nup-down booster (pdf_parser.py:43-63): 40 depth-3 "
        "trees, logistic\nloss, trained on the synthetic labeled layout "
        "corpus. Node form:\n(feature_idx, threshold, left, right); "
        "leaves are margin floats;\ndecision rule x[f] <= t goes left. "
        'Sum*0.3 is the logit."""\n\n'
        f"LEARNING_RATE = 0.3\n\nMETA = {{\n"
        f"    'train_pairs': {len(ytr)}, 'test_pairs': {len(yte)},\n"
        f"    'train_acc': {acc_tr:.4f}, 'heldout_acc': {acc_te:.4f},\n"
        f"    'rule_score_heldout_acc': {rule_te:.4f},\n"
        f"    'corpus_seed': 20260817, 'heldout_seed': 99990001,\n"
        f"}}\n\nTREES = {trees!r}\n"
    )
    out.write_text(body)
    print(f"wrote {out} ({len(body)} bytes, {len(trees)} trees)")


if __name__ == "__main__":
    main()
