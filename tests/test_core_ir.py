"""Core IR + executor tests (arena-framework tier 2 analog: graph-built ops
vs numpy baselines)."""

import jax.numpy as jnp
import numpy as np
import pytest

from paddle_lite_tpu import Graph, GraphBuilder, build_callable, stage_weights


def test_builder_shapes():
    b = GraphBuilder("t")
    x = b.input("x", (2, 8, 8, 3))
    y = b.conv2d(x, 16, 3, stride=2, padding=1)
    assert b.g.vars[y].shape == (2, 4, 4, 16)
    y = b.pool2d(y, "max", ksize=2, stride=2)
    assert b.g.vars[y].shape == (2, 2, 2, 16)
    y = b.reshape(y, (2, -1))
    assert b.g.vars[y].shape == (2, 64)
    y = b.fc(y, 10)
    assert b.g.vars[y].shape == (2, 10)


def test_topological_order_and_exec(rng):
    b = GraphBuilder("t")
    x = b.input("x", (1, 4, 4, 2))
    c = b.conv2d(x, 4, 1)
    r = b.act(c, "relu")
    b.mark_output(r)
    g = b.build()
    order = [op.op_type for op in g.topological_order()]
    assert order == ["conv2d", "relu"]

    run = build_callable(g)
    xv = rng.normal(size=(1, 4, 4, 2)).astype(np.float32)
    out = run(stage_weights(g), {"x": xv})[r]
    w = g.weights[[k for k in g.weights if k.endswith(".w")][0]]
    ref = np.maximum(np.einsum("nhwc,co->nhwo", xv, w[0, 0]), 0)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-4, atol=1e-5)


def test_conv_matches_numpy_reference(rng):
    """conv2d vs a naive nested-loop reference (naive_math_impl.h analog)."""
    b = GraphBuilder("t")
    x = b.input("x", (1, 5, 5, 3))
    y = b.conv2d(x, 4, 3, stride=2, padding=1, bias=True)
    b.mark_output(y)
    g = b.build()
    xv = rng.normal(size=(1, 5, 5, 3)).astype(np.float32)
    w = g.weights[[k for k in g.weights if k.endswith(".w")][0]]
    bias = g.weights[[k for k in g.weights if k.endswith(".b")][0]]

    run = build_callable(g)
    out = np.asarray(run(stage_weights(g), {"x": xv})[y])

    xp = np.pad(xv, ((0, 0), (1, 1), (1, 1), (0, 0)))
    ref = np.zeros((1, 3, 3, 4), np.float32)
    for oh in range(3):
        for ow in range(3):
            patch = xp[0, oh * 2 : oh * 2 + 3, ow * 2 : ow * 2 + 3, :]
            ref[0, oh, ow] = np.tensordot(patch, w, axes=3) + bias
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-5)


def test_depthwise_conv(rng):
    b = GraphBuilder("t")
    x = b.input("x", (1, 6, 6, 4))
    y = b.conv2d(x, 4, 3, padding=1, depthwise=True)
    b.mark_output(y)
    g = b.build()
    xv = rng.normal(size=(1, 6, 6, 4)).astype(np.float32)
    out = np.asarray(build_callable(g)(stage_weights(g), {"x": xv})[y])
    assert out.shape == (1, 6, 6, 4)
    w = g.weights[[k for k in g.weights if k.endswith(".w")][0]]
    # naive depthwise at interior position
    xp = np.pad(xv, ((0, 0), (1, 1), (1, 1), (0, 0)))
    for c in range(4):
        ref = np.sum(xp[0, 2:5, 3:6, c] * w[:, :, 0, c])
        np.testing.assert_allclose(out[0, 2, 3, c], ref, rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("ptype", ["max", "avg"])
def test_pool(ptype, rng):
    b = GraphBuilder("t")
    x = b.input("x", (2, 4, 4, 3))
    y = b.pool2d(x, ptype, ksize=2, stride=2)
    b.mark_output(y)
    g = b.build()
    xv = rng.normal(size=(2, 4, 4, 3)).astype(np.float32)
    out = np.asarray(build_callable(g)(stage_weights(g), {"x": xv})[y])
    blocks = xv.reshape(2, 2, 2, 2, 2, 3)
    ref = blocks.max(axis=(2, 4)) if ptype == "max" else blocks.mean(axis=(2, 4))
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-6)


def test_eltwise_broadcast_axis(rng):
    b = GraphBuilder("t")
    x = b.input("x", (2, 3, 4, 5))
    yw = b.weight("yw", rng.normal(size=(3, 4)).astype(np.float32))
    z = b.eltwise(x, yw, "add", axis=1)
    b.mark_output(z)
    g = b.build()
    xv = rng.normal(size=(2, 3, 4, 5)).astype(np.float32)
    out = np.asarray(build_callable(g)(stage_weights(g), {"x": xv})[z])
    np.testing.assert_allclose(out, xv + g.weights["yw"][None, :, :, None], rtol=1e-6)


def test_graph_dump_runs():
    from paddle_lite_tpu.models import mobilenet_v1

    g = mobilenet_v1.build(batch=1, image_size=32)
    text = g.dump()
    assert "conv2d" in text and "depthwise_conv2d" in text
