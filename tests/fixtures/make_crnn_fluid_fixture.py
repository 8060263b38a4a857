"""Regenerates tests/fixtures/crnn_fluid/ — a CRNN recognizer fluid
program WITH its sequence structure through the product front door
(VERDICT r3 missing #2 "or better: CRNN"): NCHW conv+bn+relu stack with
the CRNN-signature height-only pooling, height squeeze -> transpose into
a (N, T, C) sequence, per-direction input-projection ``mul``s, a
forward ``gru`` + a ``gru`` with ``is_reverse=True`` (the fluid
bidirectional pair), concat, the mul+add CTC head and softmax.

Sequences arrive DENSE (N, T, 3H) — the documented import contract for
the reference's LoD recurrences (SURVEY §5.7: raggedness is absorbed by
the bucketed batcher, not the graph).  tests/test_fluid_full_model.py
loads the committed bytes and asserts structure + output agreement
against a zoo-style twin whose recurrence runs through the engine's
fused ``bidirectional_gru`` op — proving the imported two-gru form and
the zoo's direction-vmapped form compute the same function.
"""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

H_IMG, W_IMG = 32, 64
HID = 32
CLASSES = 17  # 16 chars + blank


def make_params(seed=13):
    rng = np.random.default_rng(seed)
    p = {}

    def conv_w(name, oihw):
        fan_in = int(np.prod(oihw[1:]))
        p[name] = rng.normal(0, np.sqrt(2.0 / fan_in), oihw).astype(np.float32)

    def bn(name, ch):
        p[f"{name}_scale"] = (1 + 0.1 * rng.standard_normal(ch)).astype(np.float32)
        p[f"{name}_bias"] = (0.05 * rng.standard_normal(ch)).astype(np.float32)
        p[f"{name}_mean"] = (0.01 * rng.standard_normal(ch)).astype(np.float32)
        p[f"{name}_var"] = (1 + 0.1 * np.abs(rng.standard_normal(ch))).astype(np.float32)

    conv_w("c1_w", (16, 3, 3, 3))
    bn("bn1", 16)
    conv_w("c2_w", (32, 16, 3, 3))
    bn("bn2", 32)
    conv_w("c3_w", (48, 32, 3, 3))
    bn("bn3", 48)
    for d in ("fw", "bw"):
        p[f"proj_{d}"] = (rng.normal(0, np.sqrt(1.0 / 48), (48, 3 * HID))
                          .astype(np.float32))
        p[f"gru_{d}_w"] = (rng.normal(0, np.sqrt(1.0 / HID), (HID, 3 * HID))
                           .astype(np.float32))
        p[f"gru_{d}_b"] = (0.01 * rng.standard_normal(3 * HID)).astype(np.float32)
    p["fc_w"] = (rng.normal(0, np.sqrt(1.0 / (2 * HID)), (2 * HID, CLASSES))
                 .astype(np.float32))
    p["fc_b"] = (0.01 * rng.standard_normal(CLASSES)).astype(np.float32)
    return p


def build(seed=13):
    from paddle_lite_tpu.formats import fluid as F

    prog = F.FluidProgram(blocks=[F.FluidBlock()])
    b = prog.main
    params = make_params(seed)

    def var(name, shape=(), dtype=F.VT_FP32, persistable=False, kind=None):
        if kind is not None:
            b.vars[name] = F.FluidVar(name, kind=kind)
        else:
            b.vars[name] = F.FluidVar(name, shape=tuple(shape), dtype=dtype,
                                      persistable=persistable)

    for n, v in params.items():
        var(n, v.shape, persistable=True)

    T = W_IMG // 4  # 16 time steps after the two width poolings
    ops = []
    var("feed", kind=F.VT_FEED_MINIBATCH)
    var("fetch", kind=F.VT_FETCH_LIST)
    var("image", (-1, 3, H_IMG, W_IMG))
    ops.append(F.FluidOp("feed", {"X": ["feed"]}, {"Out": ["image"]},
                         {"col": 0}))

    def conv_bn_relu(x, name, w_name, bn_name, out_c, h, w, stride=1):
        var(f"{name}_c", (-1, out_c, h, w))
        var(f"{name}_bn", (-1, out_c, h, w))
        var(name, (-1, out_c, h, w))
        ops.extend([
            F.FluidOp("conv2d", {"Input": [x], "Filter": [w_name]},
                      {"Output": [f"{name}_c"]},
                      {"strides": [stride, stride], "paddings": [1, 1],
                       "dilations": [1, 1], "groups": 1}),
            F.FluidOp("batch_norm",
                      {"X": [f"{name}_c"], "Scale": [f"{bn_name}_scale"],
                       "Bias": [f"{bn_name}_bias"], "Mean": [f"{bn_name}_mean"],
                       "Variance": [f"{bn_name}_var"]},
                      {"Y": [f"{name}_bn"]}, {"epsilon": 1e-5}),
            F.FluidOp("relu", {"X": [f"{name}_bn"]}, {"Out": [name]}, {}),
        ])
        return name

    def pool(x, name, ksize, stride, c, h, w):
        var(name, (-1, c, h, w))
        ops.append(F.FluidOp(
            "pool2d", {"X": [x]}, {"Out": [name]},
            {"pooling_type": "max", "ksize": list(ksize),
             "strides": list(stride), "paddings": [0, 0],
             "global_pooling": False}))
        return name

    x = conv_bn_relu("image", "t1", "c1_w", "bn1", 16, 16, 32, stride=2)
    x = pool(x, "p1", (2, 2), (2, 2), 16, 8, 16)
    x = conv_bn_relu(x, "t2", "c2_w", "bn2", 32, 8, 16)
    x = pool(x, "p2", (2, 1), (2, 1), 32, 4, 16)  # height-only (CRNN mark)
    x = conv_bn_relu(x, "t3", "c3_w", "bn3", 48, 4, 16)
    x = pool(x, "p3", (4, 1), (4, 1), 48, 1, 16)  # squeeze height to 1

    var("sq", (-1, 48, T))
    var("seq", (-1, T, 48))
    ops.extend([
        F.FluidOp("squeeze2", {"X": [x]}, {"Out": ["sq"]}, {"axes": [2]}),
        F.FluidOp("transpose2", {"X": ["sq"]}, {"Out": ["seq"]},
                  {"axis": [0, 2, 1]}),
    ])

    hides = []
    for d, rev in (("fw", False), ("bw", True)):
        var(f"proj_{d}_o", (-1, T, 3 * HID))
        var(f"hid_{d}", (-1, T, HID))
        ops.extend([
            F.FluidOp("mul", {"X": ["seq"], "Y": [f"proj_{d}"]},
                      {"Out": [f"proj_{d}_o"]},
                      {"x_num_col_dims": 2, "y_num_col_dims": 1}),
            F.FluidOp("gru",
                      {"Input": [f"proj_{d}_o"], "Weight": [f"gru_{d}_w"],
                       "Bias": [f"gru_{d}_b"]},
                      {"Hidden": [f"hid_{d}"]},
                      {"is_reverse": rev, "gate_activation": "sigmoid",
                       "activation": "tanh"}),
        ])
        hides.append(f"hid_{d}")

    for n, s in [("rnn_out", (-1, T, 2 * HID)), ("fc_raw", (-1, T, CLASSES)),
                 ("logits", (-1, T, CLASSES)), ("probs", (-1, T, CLASSES))]:
        var(n, s)
    ops.extend([
        F.FluidOp("concat", {"X": hides}, {"Out": ["rnn_out"]}, {"axis": 2}),
        F.FluidOp("mul", {"X": ["rnn_out"], "Y": ["fc_w"]},
                  {"Out": ["fc_raw"]},
                  {"x_num_col_dims": 2, "y_num_col_dims": 1}),
        F.FluidOp("elementwise_add", {"X": ["fc_raw"], "Y": ["fc_b"]},
                  {"Out": ["logits"]}, {"axis": -1}),
        F.FluidOp("softmax", {"X": ["logits"]}, {"Out": ["probs"]},
                  {"axis": -1}),
        F.FluidOp("fetch", {"X": ["probs"]}, {"Out": ["fetch"]}, {"col": 0}),
    ])
    b.ops = ops
    return prog, params


if __name__ == "__main__":
    from paddle_lite_tpu.formats import fluid as F

    prog, params = build()
    out = os.path.join(os.path.dirname(__file__), "crnn_fluid")
    F.save_fluid_dir(out, prog, params)
    size = sum(os.path.getsize(os.path.join(out, f)) for f in os.listdir(out))
    print("wrote", out, f"({size/1e6:.2f} MB)")
