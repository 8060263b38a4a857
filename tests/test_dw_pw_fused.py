"""Fused dw+pw block tests: kernel vs composed reference, pass formation,
and end-to-end numerics vs the unfused int8 graph."""

import numpy as np
import pytest

from paddle_lite_tpu import GraphBuilder, QuantConfig, build_callable, stage_weights
from paddle_lite_tpu.tools.opt import optimize


def _block_model(batch=2, hw=8, c=16, oc=32):
    b = GraphBuilder("m", seed=111)
    x = b.input("x", (batch, hw, hw, c))
    y = b.conv_bn_act(x, c, 3, padding=1, depthwise=True, act="relu")
    y = b.conv_bn_act(y, oc, 1, act="relu")
    y = b.conv_bn_act(y, oc, 3, padding=1, depthwise=True, act="relu")
    y = b.conv_bn_act(y, oc, 1, act="relu")
    y = b.pool2d(y, "avg", global_pooling=True)
    y = b.reshape(y, (batch, oc))
    y = b.fc(y, 10)
    b.mark_output(y)
    return b.build()


def _run(g, feed):
    return np.asarray(build_callable(g)(stage_weights(g), feed)[g.outputs[0]])


def test_dw_pw_fuse_pass_forms_and_matches(rng):
    feed = {"x": rng.normal(size=(2, 8, 8, 16)).astype(np.float32)}
    calib = [{"x": rng.normal(size=(2, 8, 8, 16)).astype(np.float32)}]

    g_ref = _block_model()
    optimize(g_ref, quant=QuantConfig(), calib_batches=calib)
    ref = _run(g_ref, feed)

    g = _block_model()
    optimize(g, quant=QuantConfig(), calib_batches=calib, fuse_dw_pw=True)
    types = [op.op_type for op in g.ops]
    assert types.count("fused_dw_pw") == 2, types
    assert "depthwise_conv2d" not in types
    got = _run(g, feed)
    # same int8 arithmetic up to requant rounding ties
    np.testing.assert_allclose(got, ref, rtol=1e-3, atol=2e-2)


def test_fused_kernel_pallas_vs_xla_impl(rng):
    """The pallas fused kernel (interpret) vs the composed-XLA impl."""
    feed = {"x": rng.normal(size=(1, 8, 8, 16)).astype(np.float32)}
    calib = [feed]
    g = _block_model(batch=1)
    optimize(g, quant=QuantConfig(), calib_batches=calib, fuse_dw_pw=True)
    fused = [op for op in g.ops if op.op_type == "fused_dw_pw"]
    assert fused and all(op.attrs.get("kernel") == "pallas" for op in fused)
    got_pallas = _run(g, feed)
    for op in fused:
        op.attrs["kernel"] = "xla"
    got_xla = _run(g, feed)
    np.testing.assert_allclose(got_pallas, got_xla, rtol=1e-3, atol=2e-2)


def test_fuse_skipped_when_dw_output_multiuse(rng):
    """A dw output consumed twice must not fuse (its tensor is needed)."""
    b = GraphBuilder("m", seed=112)
    x = b.input("x", (1, 8, 8, 16))
    y = b.conv_bn_act(x, 16, 3, padding=1, depthwise=True, act="relu")
    z1 = b.conv_bn_act(y, 32, 1, act="relu")
    z2 = b.conv_bn_act(y, 32, 1, act="relu")
    out = b.eltwise(z1, z2, "add")
    b.mark_output(out)
    g = b.build()
    optimize(g, quant=QuantConfig(),
             calib_batches=[{"x": rng.normal(size=(1, 8, 8, 16)).astype(np.float32)}],
             fuse_dw_pw=True)
    types = [op.op_type for op in g.ops]
    assert "fused_dw_pw" not in types
    assert "depthwise_conv2d" in types
