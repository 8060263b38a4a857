"""Bias-correction tests: corrected int8 must beat uncorrected on models
where inputs have nonzero channel means (where the systematic shift lives)."""

import numpy as np
import pytest

from paddle_lite_tpu import GraphBuilder, QuantConfig, build_callable, stage_weights
from paddle_lite_tpu.tools.opt import optimize


def _model():
    b = GraphBuilder("m", seed=91)
    x = b.input("x", (4, 8, 8, 16))
    y = b.conv_bn_act(x, 32, 3, padding=1, act="relu")
    y = b.conv_bn_act(y, 32, 3, padding=1, depthwise=True, act="relu")
    y = b.conv_bn_act(y, 64, 1, act="relu")
    y = b.pool2d(y, "avg", global_pooling=True)
    y = b.reshape(y, (4, 64))
    y = b.fc(y, 10)
    b.mark_output(y)
    return b.build()


def _run(g, feed):
    return np.asarray(
        build_callable(g)(stage_weights(g), feed)[g.outputs[0]])


def test_bias_correction_reduces_error(rng):
    # inputs with strong per-channel offsets -> systematic quant bias
    offsets = rng.uniform(-1.5, 1.5, size=(16,)).astype(np.float32)

    def batch():
        return {"x": (rng.normal(size=(4, 8, 8, 16)) * 0.5 + offsets
                      ).astype(np.float32)}

    feed = batch()
    calib = [batch() for _ in range(4)]

    g_ref = _model()
    ref = _run(g_ref, feed)

    # bias correction targets the regime with a real systematic weight
    # residual: per-TENSOR weight quantization (per-channel residuals are
    # already centered and tiny — measured: correction is noise there,
    # which is why QuantConfig defaults it off)
    errs = {}
    for bc in (False, True):
        g = _model()
        optimize(g, quant=QuantConfig(bias_correction=bc,
                                      per_channel_weights=False),
                 calib_batches=calib)
        got = _run(g, feed)
        errs[bc] = float(np.abs(got - ref).mean())
    assert errs[True] < errs[False], errs


def test_bias_correction_creates_bias_when_missing(rng):
    b = GraphBuilder("m", seed=92)
    x = b.input("x", (2, 4, 4, 8))
    y = b.conv2d(x, 16, 1)  # no bias
    b.mark_output(y)
    g = b.build()
    optimize(g, quant=QuantConfig(bias_correction=True), calib_batches=[
        {"x": (rng.normal(size=(2, 4, 4, 8)) + 1.0).astype(np.float32)}
    ])
    conv = next(op for op in g.ops if op.op_type == "conv2d")
    assert conv.maybe_input("Bias"), "correction should add a bias input"
