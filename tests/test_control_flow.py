"""Control-flow (subgraph / while / conditional_block) + RCNN-op tests."""

import numpy as np
import pytest

from paddle_lite_tpu import GraphBuilder, build_callable, stage_weights
from paddle_lite_tpu.core.types import Precision


def test_subgraph_op(rng):
    # nested graph: y = relu(x @ w)
    inner_b = GraphBuilder("inner", seed=1)
    ix = inner_b.input("ix", (2, 4))
    iy = inner_b.fc(ix, 3)
    iy = inner_b.act(iy, "relu")
    inner_b.mark_output(iy)
    inner = inner_b.build()

    b = GraphBuilder("outer")
    x = b.input("x", (2, 4))
    out = b.op("subgraph", {"Inputs": [x]}, attrs={"graph": inner},
               shape_args=[x], out_slots=("Outputs",))[0]
    b.mark_output(out)
    g = b.build()

    feed = {"x": rng.normal(size=(2, 4)).astype(np.float32)}
    got = np.asarray(build_callable(g)(stage_weights(g), feed)[out])
    ref = np.asarray(
        build_callable(inner)(stage_weights(inner), {"ix": feed["x"]})[
            inner.outputs[0]]
    )
    np.testing.assert_allclose(got, ref, rtol=1e-5)


def test_while_op_counts(rng):
    """while: state = (cond, x); block computes x+1 and cond = (x+1 < 5)."""
    bb = GraphBuilder("block")
    c_in = bb.input("cond_in", (1,), precision=Precision.BOOL)
    x_in = bb.input("x_in", (1,))
    one = bb.weight("one", np.ones((1,), np.float32))
    limit = bb.weight("limit", np.full((1,), 5.0, np.float32))
    nx = bb.eltwise(x_in, "one", "add")
    nc = bb.op("less_than", {"X": [nx], "Y": ["limit"]},
               shape_args=[nx, "limit"])[0]
    bb.mark_output(nc, nx)  # outputs align positionally with inputs
    block = bb.build()

    b = GraphBuilder("outer")
    cond0 = b.input("cond", (1,), precision=Precision.BOOL)
    x0 = b.input("x", (1,))
    outs = b.op("while", {"X": [cond0, x0]},
                attrs={"block": block, "cond_index": 0, "max_iters": 50},
                shape_args=[cond0, x0], out_slots=("Out",))
    b.mark_output(outs[1])
    g = b.build()

    got = build_callable(g)(stage_weights(g), {
        "cond": np.ones((1,), np.bool_),
        "x": np.zeros((1,), np.float32),
    })
    val = float(np.asarray(got[g.outputs[0]]).reshape(()))
    assert val == 5.0, val  # increments 0->5, loop exits when 5 < 5 is False


def test_roi_align(rng):
    from paddle_lite_tpu.core.builder import GraphBuilder

    b = GraphBuilder("t")
    x = b.input("x", (1, 8, 8, 2))
    rois = b.input("rois", (3, 4))
    out = b.op("roi_align", {"X": [x], "ROIs": [rois]},
               attrs={"pooled_height": 2, "pooled_width": 2,
                      "spatial_scale": 1.0, "sampling_ratio": 2},
               shape_args=[x, rois])[0]
    b.mark_output(out)
    g = b.build()
    # constant image -> every pooled value equals the constant
    xv = np.full((1, 8, 8, 2), 3.5, np.float32)
    rv = np.asarray([[0, 0, 4, 4], [2, 2, 6, 6], [1, 0, 7, 3]], np.float32)
    got = np.asarray(build_callable(g)(stage_weights(g),
                                       {"x": xv, "rois": rv})[out])
    assert got.shape == (3, 2, 2, 2)
    np.testing.assert_allclose(got, 3.5, rtol=1e-6)


def test_anchor_generator():
    b = GraphBuilder("t")
    x = b.input("x", (1, 4, 4, 8))
    a, v = b.op("anchor_generator", {"Input": [x]},
                attrs={"anchor_sizes": [32.0, 64.0],
                       "aspect_ratios": [0.5, 1.0, 2.0],
                       "stride": [16.0, 16.0]},
                shape_args=[x], out_slots=("Anchors", "Variances"))
    b.mark_output(a)
    g = b.build()
    got = np.asarray(build_callable(g)(stage_weights(g), {
        "x": np.zeros((1, 4, 4, 8), np.float32)})[a])
    assert got.shape == (4, 4, 6, 4)
    # ar=1, size=32 anchor at cell (0,0): centered at 8,8 with w=h=32
    centered = got[0, 0, 2]  # ratios ordered [0.5,1,2] x sizes [32,64]
    assert abs((centered[2] - centered[0]) - 32.0) < 1e-3
