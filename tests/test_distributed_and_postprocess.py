"""Multi-host helpers (single-host + virtual-mesh paths) and DB postprocess."""

import jax
import numpy as np
import pytest

from paddle_lite_tpu.parallel import distributed
from paddle_lite_tpu.tools.db_postprocess import extract_boxes


def test_global_mesh_and_host_local_batch():
    mesh = distributed.global_mesh(tp=2)
    assert mesh.shape == {"data": 4, "model": 2}
    batch = {"image": np.arange(4 * 3, dtype=np.float32).reshape(4, 3)}
    out = distributed.host_local_batch(mesh, batch)
    arr = out["image"]
    assert arr.shape == (4, 3)
    np.testing.assert_array_equal(np.asarray(arr), batch["image"])
    assert distributed.is_primary()


def test_global_mesh_validates_tp():
    with pytest.raises(ValueError, match="divisible|exceeds"):
        distributed.global_mesh(tp=3)


def test_initialize_single_host_noop():
    distributed.initialize()  # no coordinator set -> no-op
    assert jax.process_count() == 1


def test_db_postprocess_extracts_boxes():
    p = np.zeros((40, 60), np.float32)
    p[5:15, 10:30] = 0.9   # strong box
    p[25:35, 40:55] = 0.8  # second box
    p[20:22, 2:4] = 0.9    # too small -> filtered by min_size
    boxes = extract_boxes(p, min_size=3)
    assert len(boxes) == 2
    b = boxes[0]
    assert b.score > 0.7
    # covers the seeded region (with unclip expansion)
    assert b.x1 <= 10 and b.x2 >= 29 and b.y1 <= 5 and b.y2 >= 14


def test_db_postprocess_empty():
    assert extract_boxes(np.zeros((10, 10), np.float32)) == []


def test_db_postprocess_score_filter():
    p = np.full((20, 20), 0.35, np.float32)  # above bin, below box thresh
    assert extract_boxes(p, bin_thresh=0.3, box_thresh=0.6) == []
