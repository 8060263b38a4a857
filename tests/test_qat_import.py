"""QAT fake-quant graph import — quant_dequant_fuse pass tests.

Simulates what a PaddleSlim QAT export looks like to the reference
(``fake_quantize_*`` before conv inputs, ``fake_*dequantize*`` after
outputs, scales recorded in attrs/weights) and checks the fuser deletes the
fake ops, stamps scales, and quantizes weights per-channel."""

import numpy as np
import pytest

from paddle_lite_tpu import GraphBuilder, build_callable, stage_weights
from paddle_lite_tpu.core.pass_manager import PassManager
from paddle_lite_tpu.core.types import Precision


def _qat_graph(rng):
    """conv with fake_quant on input activation and channel-wise dequant on
    output (the PaddleSlim QAT pattern)."""
    b = GraphBuilder("qat", seed=61)
    x = b.input("x", (2, 8, 8, 4))
    # fake_quantize on the activation, scale attr = absmax (paddle stores
    # the *threshold*, i.e. scale*127)
    act_absmax = 4.0
    fq = b.op(
        "fake_quantize_moving_average_abs_max",
        {"X": [x]},
        attrs={"scale": act_absmax},
        shape_args=[x],
    )[0]
    w = rng.normal(0, 0.2, size=(1, 1, 4, 8)).astype(np.float32)
    wname = b.weight("conv.w", w)
    y = b.op(
        "conv2d",
        {"Input": [fq], "Filter": [wname]},
        attrs={"strides": [1, 1], "paddings": [0, 0], "dilations": [1, 1],
               "groups": 1},
        shape_args=[fq, wname],
        out_slots=("Output",),
    )[0]
    # paddle's Scales tensor holds the per-channel abs-max thresholds
    # (dequant multiplies by scales/127)
    w_absmax = np.abs(w).max(axis=(0, 1, 2))
    sname = b.weight("conv.w.scales", w_absmax.astype(np.float32))
    dq = b.op(
        "fake_channel_wise_dequantize_max_abs",
        {"X": [y], "Scales": [sname]},
        shape_args=[y],
    )[0]
    b.mark_output(dq)
    return b.build(), w


# fake ops need registry entries for graph building (they never execute —
# the fuse pass removes them before any run)
from paddle_lite_tpu.core.registry import OPS

for _fake in ("fake_quantize_moving_average_abs_max",
              "fake_channel_wise_dequantize_max_abs"):
    OPS.register(_fake, infer_shape=lambda attrs, in_shapes: [in_shapes[0]])


def test_quant_dequant_fuse(rng):
    g, w = _qat_graph(rng)
    PassManager(["quant_dequant_fuse"]).run(g)

    types = [op.op_type for op in g.ops]
    assert not any(t.startswith("fake_") for t in types)
    conv = next(op for op in g.ops if op.op_type == "conv2d")
    assert conv.attrs.get("enable_int8")

    # weight quantized per-channel with the recorded scales
    wq = g.weights[conv.input("Filter")]
    assert wq.dtype == np.int8
    wvar = g.vars[conv.input("Filter")]
    assert wvar.quant is not None and wvar.quant.per_channel
    scales = wvar.quant.scale_array()
    np.testing.assert_allclose(
        scales, np.abs(w).max(axis=(0, 1, 2)) / 127.0, rtol=1e-5)

    # input activation scale recorded from the fake-quant threshold
    in_var = g.vars[conv.input("Input")]
    assert in_var.quant is not None
    np.testing.assert_allclose(in_var.quant.scale[0], 4.0 / 127.0, rtol=1e-6)


def test_qat_graph_runs_int8_after_fuse(rng):
    g, w = _qat_graph(rng)
    PassManager(["quant_dequant_fuse", "precision_cast", "kernel_pick"]).run(g)
    feed = {"x": rng.normal(size=(2, 8, 8, 4)).astype(np.float32)}
    out = build_callable(g)(stage_weights(g), feed)
    got = np.asarray(out[g.outputs[0]])
    # int8 conv result close to the fp32 conv
    ref = np.einsum("nhwc,co->nhwo", feed["x"], w[0, 0])
    rel = np.abs(got - ref).max() / (np.abs(ref).max() + 1e-9)
    assert rel < 0.05, rel


# ---- the other fake-quant variants (VERDICT r1 #9 hardening) ---------------

for _fake in ("fake_quantize_range_abs_max", "fake_quantize_abs_max",
              "fake_dequantize_max_abs"):
    OPS.register(_fake, infer_shape=lambda attrs, in_shapes: [in_shapes[0]])


def _conv_graph_with_fakes(rng, *, in_scale_weight=None, in_scale_attr=None,
                           w_fake="channel_wise", w_scale_override=None):
    """conv with a chosen fake-quant input variant + dequant output variant."""
    b = GraphBuilder("qat_var", seed=7)
    x = b.input("x", (2, 6, 6, 4))
    ins = {"X": [x]}
    attrs = {"bit_length": 8}
    if in_scale_attr is not None:
        attrs["scale"] = in_scale_attr
        fq_type = "fake_quantize_moving_average_abs_max"
    else:
        sname = b.weight("in_scale", np.asarray([in_scale_weight], np.float32))
        ins["InScale"] = [sname]
        fq_type = "fake_quantize_range_abs_max"
    fq = b.op(fq_type, ins, attrs=attrs, shape_args=[x])[0]
    w = rng.normal(0, 0.2, size=(3, 3, 4, 8)).astype(np.float32)
    wname = b.weight("conv.w", w)
    y = b.op("conv2d", {"Input": [fq], "Filter": [wname]},
             attrs={"strides": [1, 1], "paddings": [1, 1],
                    "dilations": [1, 1], "groups": 1},
             shape_args=[fq, wname], out_slots=("Output",))[0]
    w_absmax = np.abs(w).max(axis=(0, 1, 2)).astype(np.float32)
    if w_fake == "channel_wise":
        sc = w_absmax if w_scale_override is None else w_scale_override
        s2 = b.weight("conv.w.scales", np.asarray(sc, np.float32))
        dq = b.op("fake_channel_wise_dequantize_max_abs",
                  {"X": [y], "Scales": [s2]}, shape_args=[y])[0]
    else:  # max_range variant: dequant divides by 127*127/absmax
        absmax = float(w_absmax.max()) if w_scale_override is None \
            else float(w_scale_override)
        dq = b.op("fake_dequantize_max_abs", {"X": [y]},
                  attrs={"max_range": 127.0 * 127.0 / absmax},
                  shape_args=[y])[0]
    b.mark_output(dq)
    return b.build(), w


def _fused_conv(g):
    PassManager(["quant_dequant_fuse", "precision_cast", "kernel_pick"]).run(g)
    return next(op for op in g.ops if op.op_type == "conv2d")


def _check_close_to_fp32(g, w, rng, in_scale=3.0, w_scales=None, tol=2e-3):
    """Compare against the QAT *semantic* reference: input clipped+rounded
    at the recorded scale, weights quantized with their scales — the int8
    program must reproduce that computation (up to fp association)."""
    feed = {"x": rng.normal(size=(2, 6, 6, 4)).astype(np.float32)}
    got = np.asarray(build_callable(g)(stage_weights(g), feed)[g.outputs[0]])
    import jax
    s_in = in_scale / 127.0
    xq = np.clip(np.round(feed["x"] / s_in), -127, 127) * s_in
    if w_scales is None:
        w_scales = np.abs(w).max(axis=(0, 1, 2))
    s_w = np.asarray(w_scales, np.float32) / 127.0
    wq = np.clip(np.round(w / s_w), -127, 127) * s_w
    ref = np.asarray(jax.lax.conv_general_dilated(
        xq.astype(np.float32), wq.astype(np.float32), (1, 1),
        ((1, 1), (1, 1)), dimension_numbers=("NHWC", "HWIO", "NHWC")))
    rel = np.abs(got - ref).max() / (np.abs(ref).max() + 1e-9)
    assert rel < tol, rel


def test_range_abs_max_inscale_weight(rng):
    """InScale-weight variant end-to-end on a 3x3 conv."""
    g, w = _conv_graph_with_fakes(rng, in_scale_weight=3.0)
    conv = _fused_conv(g)
    assert conv.attrs.get("enable_int8")
    in_q = g.vars[conv.input("Input")].quant
    np.testing.assert_allclose(in_q.scale[0], 3.0 / 127.0, rtol=1e-6)
    _check_close_to_fp32(g, w, rng)


def test_max_range_dequant_variant(rng):
    g, w = _conv_graph_with_fakes(rng, in_scale_attr=3.0, w_fake="max_range")
    conv = _fused_conv(g)
    assert conv.attrs.get("enable_int8")
    # per-tensor max_range scale expanded across all 8 output channels
    wq = g.vars[conv.input("Filter")].quant
    assert len(wq.scale) == 8
    _check_close_to_fp32(g, w, rng,
                         w_scales=np.full(8, np.abs(w).max(), np.float32))


def test_zero_scale_repaired_from_weights(rng):
    """A recorded 0.0 weight threshold must not be silently dropped: the
    fuser repairs it from the weight tensor (weight_quantization_preprocess
    behavior) and the conv still quantizes."""
    g, w = _conv_graph_with_fakes(rng, in_scale_attr=3.0,
                                  w_fake="channel_wise",
                                  w_scale_override=np.zeros(8))
    # zero per-channel thresholds: Scales tensor present but all-zero
    conv = _fused_conv(g)
    assert conv.attrs.get("enable_int8")
    wq = g.vars[conv.input("Filter")].quant
    assert np.all(wq.scale_array() > 0)
    _check_close_to_fp32(g, w, rng)
