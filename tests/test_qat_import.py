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
