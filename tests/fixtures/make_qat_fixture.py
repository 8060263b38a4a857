"""Regenerates tests/fixtures/qat_lenet/ — a PaddleSlim-style QAT fluid
model directory (committed bytes; the test loads the committed files, it
does NOT regenerate them, so the on-disk wire format is pinned)."""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))
from paddle_lite_tpu.formats import fluid as F  # noqa: E402


def build(seed=7):
    rng = np.random.default_rng(seed)
    prog = F.FluidProgram(blocks=[F.FluidBlock()])
    b = prog.main

    def var(name, shape, dtype=F.VT_FP32, persistable=False):
        b.vars[name] = F.FluidVar(name, shape=tuple(shape), dtype=dtype,
                                  persistable=persistable)

    w1 = rng.normal(0, 0.3, (6, 1, 5, 5)).astype(np.float32)
    w2 = rng.normal(0, 0.2, (16, 6, 3, 3)).astype(np.float32)
    fc_w = rng.normal(0, 0.1, (16 * 7 * 7, 10)).astype(np.float32)
    fc_b = rng.normal(0, 0.05, (10,)).astype(np.float32)
    params = {
        "conv1_w": w1,
        "conv2_w": w2,
        "fc_w": fc_w,
        "fc_b": fc_b,
        "in_scale1": np.asarray([2.0], np.float32),
        "in_scale2": np.asarray([4.0], np.float32),
        "w1_scales": np.abs(w1).max(axis=(1, 2, 3)).astype(np.float32),
        "w2_scales": np.abs(w2).max(axis=(1, 2, 3)).astype(np.float32),
    }
    for n, v in params.items():
        var(n, v.shape, persistable=True)
    shapes = {
        "img_q": (-1, 1, 28, 28), "c1": (-1, 6, 28, 28),
        "c1_dq": (-1, 6, 28, 28), "r1": (-1, 6, 28, 28),
        "p1": (-1, 6, 14, 14), "p1_q": (-1, 6, 14, 14),
        "c2": (-1, 16, 14, 14), "c2_dq": (-1, 16, 14, 14),
        "r2": (-1, 16, 14, 14), "p2": (-1, 16, 7, 7),
        "flat": (-1, 16 * 7 * 7), "mm": (-1, 10), "logits": (-1, 10),
        "probs": (-1, 10),
    }
    for n, s in shapes.items():
        var(n, s)
    pool_attrs = {"pooling_type": "max", "ksize": [2, 2], "strides": [2, 2],
                  "paddings": [0, 0], "global_pooling": False,
                  "ceil_mode": False, "exclusive": True}
    b.ops = [
        F.FluidOp("fake_quantize_range_abs_max",
                  {"X": ["image"], "InScale": ["in_scale1"]},
                  {"Out": ["img_q"]}, {"bit_length": 8}),
        F.FluidOp("conv2d", {"Input": ["img_q"], "Filter": ["conv1_w"]},
                  {"Output": ["c1"]},
                  {"strides": [1, 1], "paddings": [2, 2],
                   "dilations": [1, 1], "groups": 1}),
        F.FluidOp("fake_channel_wise_dequantize_max_abs",
                  {"X": ["c1"], "Scales": ["w1_scales"]},
                  {"Out": ["c1_dq"]}, {"quant_bits": [8]}),
        F.FluidOp("relu", {"X": ["c1_dq"]}, {"Out": ["r1"]}, {}),
        F.FluidOp("pool2d", {"X": ["r1"]}, {"Out": ["p1"]}, dict(pool_attrs)),
        F.FluidOp("fake_quantize_moving_average_abs_max",
                  {"X": ["p1"], "InScale": ["in_scale2"]},
                  {"Out": ["p1_q"]}, {"bit_length": 8}),
        F.FluidOp("conv2d", {"Input": ["p1_q"], "Filter": ["conv2_w"]},
                  {"Output": ["c2"]},
                  {"strides": [1, 1], "paddings": [1, 1],
                   "dilations": [1, 1], "groups": 1}),
        F.FluidOp("fake_channel_wise_dequantize_max_abs",
                  {"X": ["c2"], "Scales": ["w2_scales"]},
                  {"Out": ["c2_dq"]}, {"quant_bits": [8]}),
        F.FluidOp("relu", {"X": ["c2_dq"]}, {"Out": ["r2"]}, {}),
        F.FluidOp("pool2d", {"X": ["r2"]}, {"Out": ["p2"]}, dict(pool_attrs)),
        F.FluidOp("reshape2", {"X": ["p2"]}, {"Out": ["flat"]},
                  {"shape": [0, 16 * 7 * 7]}),
        F.FluidOp("mul", {"X": ["flat"], "Y": ["fc_w"]}, {"Out": ["mm"]},
                  {"x_num_col_dims": 1, "y_num_col_dims": 1}),
        F.FluidOp("elementwise_add", {"X": ["mm"], "Y": ["fc_b"]},
                  {"Out": ["logits"]}, {"axis": 1}),
        F.FluidOp("softmax", {"X": ["logits"]}, {"Out": ["probs"]},
                  {"axis": -1}),
    ]
    b.vars["feed"] = F.FluidVar("feed", kind=F.VT_FEED_MINIBATCH)
    b.vars["fetch"] = F.FluidVar("fetch", kind=F.VT_FETCH_LIST)
    var("image", (-1, 1, 28, 28))
    b.ops.insert(0, F.FluidOp("feed", {"X": ["feed"]}, {"Out": ["image"]},
                              {"col": 0}))
    b.ops.append(F.FluidOp("fetch", {"X": ["probs"]}, {"Out": ["fetch"]},
                           {"col": 0}))
    return prog, params


if __name__ == "__main__":
    prog, params = build()
    out = os.path.join(os.path.dirname(__file__), "qat_lenet")
    F.save_fluid_dir(out, prog, params)
    print("wrote", out)
