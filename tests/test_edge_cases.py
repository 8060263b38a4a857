"""Edge-case coverage: grouped conv, int8 fallbacks, dilation, asymmetric
padding, batcher lifecycle."""

import numpy as np
import pytest

from paddle_lite_tpu import GraphBuilder, QuantConfig, build_callable, stage_weights
from paddle_lite_tpu.tools.opt import optimize


def _run(g, feed):
    return np.asarray(build_callable(g)(stage_weights(g), feed)[g.outputs[0]])


def test_grouped_conv(rng):
    """groups between 1 and C (neither dense nor depthwise)."""
    b = GraphBuilder("t", seed=121)
    x = b.input("x", (1, 6, 6, 8))
    y = b.conv2d(x, 16, 3, padding=1, groups=4)
    b.mark_output(y)
    g = b.build()
    xv = rng.normal(size=(1, 6, 6, 8)).astype(np.float32)
    out = _run(g, {"x": xv})
    assert out.shape == (1, 6, 6, 16)
    # group 0 output only depends on input channels 0-1
    w = g.weights[[k for k in g.weights if k.endswith(".w")][0]]
    xv2 = xv.copy()
    xv2[..., 2:] = 0  # zero all channels outside group 0
    out2 = _run(g, {"x": xv2})
    np.testing.assert_allclose(out[..., :4], out2[..., :4], rtol=1e-4,
                               atol=1e-5)


def test_dilated_conv(rng):
    b = GraphBuilder("t", seed=122)
    x = b.input("x", (1, 9, 9, 3))
    y = b.conv2d(x, 4, 3, padding=2, dilation=2)
    b.mark_output(y)
    g = b.build()
    out = _run(g, {"x": rng.normal(size=(1, 9, 9, 3)).astype(np.float32)})
    assert out.shape == (1, 9, 9, 4)


def test_asymmetric_padding(rng):
    b = GraphBuilder("t", seed=123)
    x = b.input("x", (1, 5, 5, 2))
    w = b.rand_weight("w", (3, 3, 2, 4))
    y = b.op("conv2d", {"Input": [x], "Filter": [w]},
             attrs={"strides": [1, 1], "paddings": [1, 0, 2, 1],
                    "dilations": [1, 1], "groups": 1},
             shape_args=[x, w], out_slots=("Output",))[0]
    b.mark_output(y)
    g = b.build()
    out = _run(g, {"x": rng.normal(size=(1, 5, 5, 2)).astype(np.float32)})
    # H: 5+1+0-3+1 = 4 ; W: 5+2+1-3+1 = 6
    assert out.shape == (1, 4, 6, 4)


def test_int8_grouped_conv_not_pallas(rng):
    """grouped int8 convs must stay on the XLA path (pallas GEMM mapping
    only covers groups=1 1x1)."""
    b = GraphBuilder("t", seed=124)
    x = b.input("x", (2, 8, 8, 8))
    y = b.conv2d(x, 16, 1, groups=4)
    y = b.act(y, "relu")
    b.mark_output(y)
    g = b.build()
    feed = {"x": rng.normal(size=(2, 8, 8, 8)).astype(np.float32)}
    ref = _run(g, feed)
    optimize(g, quant=QuantConfig(), calib_batches=[feed])
    conv = next(op for op in g.ops if op.op_type == "conv2d")
    assert conv.attrs.get("kernel") != "pallas"
    got = _run(g, feed)
    rel = np.abs(got - ref).max() / (np.abs(ref).max() + 1e-9)
    assert rel < 0.1


def test_batcher_close_then_submit_times_out():
    from paddle_lite_tpu.runtime.batcher import BatcherConfig, ContinuousBatcher
    from paddle_lite_tpu.runtime.predictor import create_predictor

    def factory(bucket):
        b = GraphBuilder("m", seed=125)
        x = b.input("x", (bucket, 4))
        y = b.fc(x, 2)
        b.mark_output(y)
        return create_predictor(b.build())

    batcher = ContinuousBatcher(factory, BatcherConfig(buckets=(1, 2)))
    f = batcher.submit({"x": np.zeros((4,), np.float32)})
    f.result(timeout=60)
    batcher.close()
    # post-close submits are not served (documented: restart the batcher)
    f2 = batcher.submit({"x": np.zeros((4,), np.float32)})
    with pytest.raises(Exception):
        f2.result(timeout=0.5)
