"""Regenerates tests/fixtures/qat_ssd_head/ — a PaddleSlim-style QAT fluid
model of a BASELINE-class SSD head (VERDICT r2 missing #5): two conv
feature taps, QAT fake-quant pairs around every conv, loc/conf heads with
the real paddle export layout (NCHW convs → transpose2 → reshape2 → concat
→ softmax → transpose to the fluid NMS's (N, C, M) score layout), prior_box
per tap, box_coder decode and multiclass_nms.

The committed bytes pin the wire format; tests load the committed files and
compare against a hand-built zoo twin op-for-op and output-for-output.

Activation scales are computed by running the float forward once (the same
data-derived scales PaddleSlim's QAT pass trains), so the int8 path the
fixture encodes is numerically meaningful, not just structurally.
"""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

NUM_CLASSES = 5
N_PRIORS = 4  # 1 (ar=1) + 2 (ar=2 + flip) + 1 (max_size)
IMG = 76


def make_weights(seed=11):
    rng = np.random.default_rng(seed)

    def kaiming(shape):  # OIHW
        fan_in = int(np.prod(shape[1:]))
        return rng.normal(0, np.sqrt(2.0 / fan_in), shape).astype(np.float32)

    w = {
        "conv1_w": kaiming((32, 3, 3, 3)),
        "conv2_w": kaiming((64, 32, 3, 3)),
        "loc1_w": kaiming((N_PRIORS * 4, 32, 3, 3)) * 0.1,
        "conf1_w": kaiming((N_PRIORS * NUM_CLASSES, 32, 3, 3)) * 2.0,
        "loc2_w": kaiming((N_PRIORS * 4, 64, 3, 3)) * 0.1,
        "conf2_w": kaiming((N_PRIORS * NUM_CLASSES, 64, 3, 3)) * 2.0,
    }
    return w


def float_forward_scales(w, seed=12):
    """Run the float forward in jax (CPU) to get per-conv-input activation
    abs-max — the scales a QAT/PTQ pass derives from data."""
    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    rng = np.random.default_rng(seed)
    x = rng.normal(size=(4, 3, IMG, IMG)).astype(np.float32)

    def conv(x_nchw, w_oihw, stride):
        return jax.lax.conv_general_dilated(
            x_nchw, w_oihw, (stride, stride), ((1, 1), (1, 1)),
            dimension_numbers=("NCHW", "OIHW", "NCHW"))

    t1 = np.maximum(np.asarray(conv(jnp.asarray(x), jnp.asarray(w["conv1_w"]), 2)), 0)
    t2 = np.maximum(np.asarray(conv(jnp.asarray(t1), jnp.asarray(w["conv2_w"]), 2)), 0)
    return {
        "in_scale_conv1": float(np.abs(x).max()),
        "in_scale_conv2": float(np.abs(t1).max()),
        "in_scale_loc1": float(np.abs(t1).max()),
        "in_scale_conf1": float(np.abs(t1).max()),
        "in_scale_loc2": float(np.abs(t2).max()),
        "in_scale_conf2": float(np.abs(t2).max()),
    }


def build(seed=11):
    from paddle_lite_tpu.formats import fluid as F

    prog = F.FluidProgram(blocks=[F.FluidBlock()])
    b = prog.main

    def var(name, shape=(), dtype=F.VT_FP32, persistable=False, kind=None):
        if kind is not None:
            b.vars[name] = F.FluidVar(name, kind=kind)
        else:
            b.vars[name] = F.FluidVar(name, shape=tuple(shape), dtype=dtype,
                                      persistable=persistable)

    w = make_weights(seed)
    scales = float_forward_scales(w)
    params = dict(w)
    for name, s in scales.items():
        params[name] = np.asarray([s], np.float32)
    for name in list(w):
        params[name.replace("_w", "_wsc")] = (
            np.abs(w[name]).max(axis=(1, 2, 3)).astype(np.float32))

    for n, v in params.items():
        var(n, v.shape, persistable=True)

    def conv_out(s):  # k=3, pad=1
        return (s + 2 - 3) // 2 + 1

    h1 = (conv_out(IMG),) * 2            # 38x38 tap
    h2 = (conv_out(conv_out(IMG)),) * 2  # 19x19 tap
    m1 = h1[0] * h1[1] * N_PRIORS
    m2 = h2[0] * h2[1] * N_PRIORS
    M = m1 + m2

    ops = []

    def qat_conv(name, x_var, w_name, out_c, h, stride):
        """fake_quantize → conv2d → fake_channel_wise_dequantize."""
        var(f"{name}_xq", (-1,) + tuple(b.vars[x_var].shape[1:]))
        var(f"{name}_raw", (-1, out_c, h[0], h[1]))
        var(f"{name}_dq", (-1, out_c, h[0], h[1]))
        ops.extend([
            F.FluidOp("fake_quantize_moving_average_abs_max",
                      {"X": [x_var], "InScale": [f"in_scale_{name}"]},
                      {"Out": [f"{name}_xq"]}, {"bit_length": 8}),
            F.FluidOp("conv2d",
                      {"Input": [f"{name}_xq"], "Filter": [w_name]},
                      {"Output": [f"{name}_raw"]},
                      {"strides": [stride, stride], "paddings": [1, 1],
                       "dilations": [1, 1], "groups": 1}),
            F.FluidOp("fake_channel_wise_dequantize_max_abs",
                      {"X": [f"{name}_raw"],
                       "Scales": [w_name.replace("_w", "_wsc")]},
                      {"Out": [f"{name}_dq"]}, {"quant_bits": [8]}),
        ])
        return f"{name}_dq"

    var("image", (-1, 3, IMG, IMG))
    c1 = qat_conv("conv1", "image", "conv1_w", 32, h1, 2)
    var("t1", (-1, 32) + h1)
    ops.append(F.FluidOp("relu", {"X": [c1]}, {"Out": ["t1"]}, {}))
    c2 = qat_conv("conv2", "t1", "conv2_w", 64, h2, 2)
    var("t2", (-1, 64) + h2)
    ops.append(F.FluidOp("relu", {"X": [c2]}, {"Out": ["t2"]}, {}))

    locs, confs, priors, pvars = [], [], [], []
    for i, (tap, cin, h, mi) in enumerate(
            [("t1", 32, h1, m1), ("t2", 64, h2, m2)], 1):
        loc = qat_conv(f"loc{i}", tap, f"loc{i}_w", N_PRIORS * 4, h, 1)
        conf = qat_conv(f"conf{i}", tap, f"conf{i}_w",
                        N_PRIORS * NUM_CLASSES, h, 1)
        for head, ch, out_d in ((loc, 4, f"loc{i}_r"),
                                (conf, NUM_CLASSES, f"conf{i}_r")):
            t_name = head + "_t"
            var(t_name, (-1, h[0], h[1], N_PRIORS * ch))
            var(out_d, (-1, mi, ch))
            ops.extend([
                F.FluidOp("transpose2", {"X": [head]}, {"Out": [t_name]},
                          {"axis": [0, 2, 3, 1]}),
                F.FluidOp("reshape2", {"X": [t_name]}, {"Out": [out_d]},
                          {"shape": [0, -1, ch]}),
            ])
        locs.append(f"loc{i}_r")
        confs.append(f"conf{i}_r")
        size = IMG * (0.2 if i == 1 else 0.45)
        var(f"pb{i}", h + (N_PRIORS, 4))
        var(f"pbv{i}", h + (N_PRIORS, 4))
        var(f"pr{i}", (mi, 4))
        var(f"prv{i}", (mi, 4))
        ops.extend([
            F.FluidOp("prior_box", {"Input": [tap], "Image": ["image"]},
                      {"Boxes": [f"pb{i}"], "Variances": [f"pbv{i}"]},
                      {"min_sizes": [size], "max_sizes": [size * 1.6],
                       "aspect_ratios": [2.0], "flip": True, "clip": True,
                       "variances": [0.1, 0.1, 0.2, 0.2]}),
            F.FluidOp("reshape2", {"X": [f"pb{i}"]}, {"Out": [f"pr{i}"]},
                      {"shape": [-1, 4]}),
            F.FluidOp("reshape2", {"X": [f"pbv{i}"]}, {"Out": [f"prv{i}"]},
                      {"shape": [-1, 4]}),
        ])
        priors.append(f"pr{i}")
        pvars.append(f"prv{i}")

    for n, s in [("loc_all", (-1, M, 4)), ("conf_all", (-1, M, NUM_CLASSES)),
                 ("probs", (-1, M, NUM_CLASSES)),
                 ("scores_cm", (-1, NUM_CLASSES, M)),
                 ("priors_all", (M, 4)), ("pvars_all", (M, 4)),
                 ("decoded", (-1, M, 4)), ("out", (-1, 100, 6))]:
        var(n, s)
    ops.extend([
        F.FluidOp("concat", {"X": locs}, {"Out": ["loc_all"]}, {"axis": 1}),
        F.FluidOp("concat", {"X": confs}, {"Out": ["conf_all"]}, {"axis": 1}),
        F.FluidOp("softmax", {"X": ["conf_all"]}, {"Out": ["probs"]},
                  {"axis": 2}),
        # fluid multiclass_nms consumes scores as (N, C, M)
        F.FluidOp("transpose2", {"X": ["probs"]}, {"Out": ["scores_cm"]},
                  {"axis": [0, 2, 1]}),
        F.FluidOp("concat", {"X": priors}, {"Out": ["priors_all"]},
                  {"axis": 0}),
        F.FluidOp("concat", {"X": pvars}, {"Out": ["pvars_all"]},
                  {"axis": 0}),
        F.FluidOp("box_coder",
                  {"PriorBox": ["priors_all"], "PriorBoxVar": ["pvars_all"],
                   "TargetBox": ["loc_all"]},
                  {"OutputBox": ["decoded"]},
                  {"code_type": "decode_center_size",
                   "box_normalized": True}),
        F.FluidOp("multiclass_nms",
                  {"BBoxes": ["decoded"], "Scores": ["scores_cm"]},
                  {"Out": ["out"]},
                  {"background_label": 0, "score_threshold": 0.01,
                   "nms_top_k": 400, "nms_threshold": 0.45,
                   "keep_top_k": 100}),
    ])

    var("feed", kind=F.VT_FEED_MINIBATCH)
    var("fetch", kind=F.VT_FETCH_LIST)
    ops.insert(0, F.FluidOp("feed", {"X": ["feed"]}, {"Out": ["image"]},
                            {"col": 0}))
    ops.append(F.FluidOp("fetch", {"X": ["out"]}, {"Out": ["fetch"]},
                         {"col": 0}))
    b.ops = ops
    return prog, params


if __name__ == "__main__":
    from paddle_lite_tpu.formats import fluid as F

    prog, params = build()
    out = os.path.join(os.path.dirname(__file__), "qat_ssd_head")
    F.save_fluid_dir(out, prog, params)
    print("wrote", out)
