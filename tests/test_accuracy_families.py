"""Unit tests for the family accuracy harness metrics (the full reports are
generated offline and committed under docs/accuracy_*.json)."""

import numpy as np

from paddle_lite_tpu.tools.accuracy_families import (
    _edit_distance, _iou_xyxy, match_detections)


def _rows(dets):
    """[(label, score, x1, y1, x2, y2), ...] -> (k, 6) padded to 10."""
    out = np.full((10, 6), -1.0, np.float32)
    out[:, 1:] = 0.0
    for i, d in enumerate(dets):
        out[i] = d
    return out


def test_iou_matrix():
    a = np.array([[0, 0, 10, 10]], np.float64)
    b = np.array([[0, 0, 10, 10], [5, 5, 15, 15], [20, 20, 30, 30]],
                 np.float64)
    iou = _iou_xyxy(a, b)[0]
    assert abs(iou[0] - 1.0) < 1e-9
    assert abs(iou[1] - 25 / 175) < 1e-9
    assert iou[2] == 0.0


def test_match_detections_basic():
    ref = _rows([(1, 0.9, 0, 0, 10, 10), (2, 0.8, 20, 20, 30, 30)])
    got = _rows([(1, 0.85, 1, 1, 10, 10), (2, 0.7, 21, 21, 30, 30)])
    m = match_detections(ref, got, conf=0.5)
    assert m == {"matched": 2, "ref": 2, "got": 2}


def test_match_detections_label_flip_and_agnostic():
    ref = _rows([(1, 0.9, 0, 0, 10, 10)])
    got = _rows([(3, 0.9, 0, 0, 10, 10)])  # same box, flipped label
    assert match_detections(ref, got, conf=0.5)["matched"] == 0
    assert match_detections(ref, got, conf=0.5,
                            same_label=False)["matched"] == 1


def test_match_detections_threshold_robust():
    """A score dipping just under the threshold must still match (the
    candidate side is filtered at conf/2), and `got` counts at conf."""
    ref = _rows([(1, 0.30, 0, 0, 10, 10)])
    got = _rows([(1, 0.26, 0, 0, 10, 10)])
    m = match_detections(ref, got, conf=0.29)
    assert m["matched"] == 1
    assert m["got"] == 0  # below conf — counted only as candidate


def test_edit_distance():
    assert _edit_distance([], []) == 0
    assert _edit_distance([1, 2, 3], [1, 2, 3]) == 0
    assert _edit_distance([1, 2, 3], [1, 3]) == 1
    assert _edit_distance([1, 2], [2, 1]) == 2
    assert _edit_distance([], [5, 6]) == 2
