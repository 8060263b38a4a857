"""AOT export + program-dump tests."""

import numpy as np
import pytest

from paddle_lite_tpu import GraphBuilder, QuantConfig
from paddle_lite_tpu.formats import aot
from paddle_lite_tpu.tools import dump
from paddle_lite_tpu.tools.opt import optimize


def _model(rng):
    b = GraphBuilder("m", seed=71)
    x = b.input("x", (2, 8, 8, 8))
    y = b.conv_bn_act(x, 16, 1, act="relu")
    y = b.pool2d(y, "avg", global_pooling=True)
    y = b.reshape(y, (2, 16))
    y = b.fc(y, 4)
    b.mark_output(y)
    g = b.build()
    optimize(g, quant=QuantConfig(), calib_batches=[
        {"x": rng.normal(size=(2, 8, 8, 8)).astype(np.float32)}
    ])
    return g


def test_aot_roundtrip(tmp_path, rng):
    from paddle_lite_tpu import build_callable, stage_weights

    g = _model(rng)
    feed = {"x": rng.normal(size=(2, 8, 8, 8)).astype(np.float32)}
    ref = np.asarray(build_callable(g)(stage_weights(g), feed)[g.outputs[0]])

    path = str(tmp_path / "model.stablehlo")
    aot.save_compiled(g, path)
    run = aot.load_compiled_file(path)
    got = np.asarray(run(feed)[g.outputs[0]])
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-6)


def test_dumps(rng):
    g = _model(rng)
    text = dump.dump_graph(g)
    assert "conv2d" in text and "int8" in text
    dot = dump.dump_dot(g)
    assert dot.startswith("digraph") and "int8" in dot
    jaxpr = dump.dump_jaxpr(g)
    assert "conv_general_dilated" in jaxpr
    hlo = dump.dump_hlo(g)
    assert "convolution" in hlo
