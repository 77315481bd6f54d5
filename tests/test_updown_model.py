"""The trained W5 up-down booster (core/updown_model.py, produced by
tools/train_updown.py) — the occupant of the reference's XGBoost slot
(deepdoc/parser/pdf_parser.py:43-63). Pins: model structure, eval
determinism, the recorded held-out accuracies, and a FRESH-corpus
merge-decision agreement measurement (new seed, never seen in
training) showing the booster beats the hand-set rule_score."""

import importlib.util
import math
import os

from ragflow_spark.core import updown
from ragflow_spark.core.updown_model import LEARNING_RATE, META, TREES

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load_trainer():
    spec = importlib.util.spec_from_file_location(
        "train_updown", os.path.join(REPO, "tools", "train_updown.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_model_structure():
    assert len(TREES) == 40 and LEARNING_RATE == 0.3

    def walk(node, depth=0):
        assert depth <= 3
        if isinstance(node, tuple):
            f, t, left, right = node
            assert 0 <= f < 32 and isinstance(t, float)
            walk(left, depth + 1)
            walk(right, depth + 1)
        else:
            assert isinstance(node, float) and abs(node) < 5.0

    for tr in TREES:
        walk(tr)


def test_recorded_metrics_beat_rule_score():
    assert META["heldout_acc"] > META["rule_score_heldout_acc"] + 0.05
    assert META["heldout_acc"] >= 0.98
    assert META["test_pairs"] >= 5000


def test_eval_determinism_and_range():
    fea_join = [False, 0.3, 0, True, True, True, False, False, False, True,
                False, False, True, True, False, False, False, False, True,
                False, False, False, 0.0, 0.0, 0.1, 0, 0, False, 0, 0,
                False, False]
    fea_break = list(fea_join)
    fea_break[1] = 2.5       # big vertical gap
    fea_break[8] = True      # up ends a sentence
    fea_break[9] = fea_break[12] = fea_break[13] = fea_break[18] = False
    fea_break[15] = True     # down opens a bullet
    s_join = updown.booster_score(fea_join)
    s_break = updown.booster_score(fea_break)
    assert 0.0 < s_break < 0.5 < s_join < 1.0
    assert updown.booster_score(fea_join) == s_join  # pure function


def test_fresh_corpus_agreement():
    """Merge-decision agreement on a corpus generated with an unseen
    seed: the booster must beat rule_score and clear 0.97 — the measured
    W5 upgrade the model exists for."""
    trainer = _load_trainer()
    X, y = trainer.make_pairs(30, seed=555000777)
    assert len(y) > 1000
    boost_hits = sum(
        (updown.booster_score(list(x)) > 0.5) == (lab > 0.5)
        for x, lab in zip(X, y))
    rule_hits = sum(
        (updown.rule_score(list(x)) > 0.5) == (lab > 0.5)
        for x, lab in zip(X, y))
    boost_acc, rule_acc = boost_hits / len(y), rule_hits / len(y)
    assert boost_acc > rule_acc
    assert boost_acc >= 0.97


def test_concat_downward_defaults_to_booster():
    # untyped boxes: near "text" pairs resolve by the same-layoutno
    # shortcut UNSCORED (pdf_parser.py:500-507), so the scored path — the
    # one the booster owns — is exercised with layout_type unset
    up = {"text": "sentence that keeps going with a comma,", "x0": 72.0,
          "x1": 540.0, "top": 100.0, "bottom": 112.0, "page_number": 1,
          "R": 0}
    down = {"text": "and finishes here.", "x0": 72.0, "x1": 200.0,
            "top": 114.0, "bottom": 126.0, "page_number": 1, "R": 0}
    out = updown.concat_downward([dict(up), dict(down)], [12.0], [6.0])
    assert len(out) == 1 and "finishes here." in out[0]["text"]
    # margin math cross-check: default equals an explicit booster pass
    explicit = updown.concat_downward(
        [dict(up), dict(down)], [12.0], [6.0],
        predict=updown.booster_score)
    assert [b["text"] for b in out] == [b["text"] for b in explicit]


def test_margin_matches_literal_tree_walk():
    fea = [1.0] * 32
    m = 0.0
    for tr in TREES:
        node = tr
        while isinstance(node, tuple):
            f, t, left, right = node
            node = left if fea[f] <= t else right
        m += node
    expect = 1.0 / (1.0 + math.exp(-LEARNING_RATE * m))
    assert abs(updown.booster_score(fea) - expect) < 1e-12
