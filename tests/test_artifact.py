"""Artifact (.nb analog) round-trip tests: save an optimized int8 graph via
the native C++ nbf library, reload, and verify bit-identical outputs — the
reference's opt-tool round-trip test pattern (save .nb → LightPredictor →
compare outputs, lite/api tests)."""

import os

import numpy as np
import pytest

from paddle_lite_tpu import GraphBuilder, QuantConfig
from paddle_lite_tpu.runtime.predictor import (Predictor, create_predictor,
                                               load_predictor)


def _small_model():
    b = GraphBuilder("m", seed=21)
    x = b.input("x", (2, 8, 8, 8))
    y = b.conv_bn_act(x, 16, 1, act="relu")
    y = b.conv_bn_act(y, 16, 3, padding=1, depthwise=True, act="relu6")
    y = b.pool2d(y, "avg", global_pooling=True)
    y = b.reshape(y, (2, 16))
    y = b.fc(y, 4)
    b.mark_output(y)
    return b.build()


def test_artifact_roundtrip_int8(tmp_path, rng):
    g = _small_model()
    batches = [{"x": rng.normal(size=(2, 8, 8, 8)).astype(np.float32)}]
    pred = create_predictor(g, quant=QuantConfig(), calib_batches=batches)
    feed = {"x": rng.normal(size=(2, 8, 8, 8)).astype(np.float32)}
    ref = np.asarray(pred.run(feed)[g.outputs[0]])

    path = str(tmp_path / "model.pnb")
    pred.save(path)
    assert os.path.getsize(path) > 0

    pred2 = load_predictor(path)
    got = np.asarray(pred2.run(feed)[pred2.output_names[0]])
    np.testing.assert_array_equal(got, ref)  # bit-identical: same weights+graph

    # int8 weights survived as int8 (packed storage, not re-quantized)
    assert any(w.dtype == np.int8 for w in pred2.graph.weights.values())


def test_artifact_corruption_detected(tmp_path, rng):
    g = _small_model()
    pred = create_predictor(
        g, quant=QuantConfig(),
        calib_batches=[{"x": rng.normal(size=(2, 8, 8, 8)).astype(np.float32)}],
    )
    path = str(tmp_path / "model.pnb")
    pred.save(path)
    # flip one byte inside the last weight blob
    data = bytearray(open(path, "rb").read())
    data[-7] ^= 0xFF
    open(path, "wb").write(bytes(data))
    with pytest.raises(IOError, match="corrupt|crc"):
        load_predictor(path)


def test_artifact_bad_magic(tmp_path):
    path = str(tmp_path / "junk.pnb")
    open(path, "wb").write(b"NOTANARTIFACT" * 10)
    with pytest.raises(IOError, match="bad artifact"):
        load_predictor(path)


def test_predictor_validates_inputs(rng):
    g = _small_model()
    pred = Predictor(g)
    with pytest.raises(ValueError, match="missing input"):
        pred.run({})
    with pytest.raises(ValueError, match="shape"):
        pred.run({"x": np.zeros((1, 4, 4, 8), np.float32)})
    with pytest.raises(ValueError, match="unexpected"):
        pred.run({"x": np.zeros((2, 8, 8, 8), np.float32), "y": np.zeros(3)})


def test_orbax_checkpoint_roundtrip(tmp_path, rng):
    from paddle_lite_tpu.formats import orbax_ckpt

    g = _small_model()
    pred = create_predictor(
        g, quant=QuantConfig(),
        calib_batches=[{"x": rng.normal(size=(2, 8, 8, 8)).astype(np.float32)}],
    )
    feed = {"x": rng.normal(size=(2, 8, 8, 8)).astype(np.float32)}
    ref = np.asarray(pred.run(feed)[g.outputs[0]])

    path = str(tmp_path / "ckpt")
    orbax_ckpt.save(g, path)
    g2 = orbax_ckpt.load(path)
    pred2 = Predictor(g2)
    got = np.asarray(pred2.run(feed)[pred2.output_names[0]])
    np.testing.assert_array_equal(got, ref)
    assert any(w.dtype == np.int8 for w in g2.weights.values())


def test_artifact_roundtrip_control_flow(tmp_path, rng):
    """Graphs with nested-graph attrs (while blocks) survive save/load."""
    from paddle_lite_tpu import GraphBuilder, build_callable, stage_weights
    from paddle_lite_tpu.core.types import Precision
    from paddle_lite_tpu.formats import artifact

    bb = GraphBuilder("block")
    c_in = bb.input("cond_in", (1,), precision=Precision.BOOL)
    x_in = bb.input("x_in", (1,))
    bb.weight("one", np.ones((1,), np.float32))
    bb.weight("limit", np.full((1,), 3.0, np.float32))
    nx = bb.eltwise(x_in, "one", "add")
    nc = bb.op("less_than", {"X": [nx], "Y": ["limit"]},
               shape_args=[nx, "limit"])[0]
    bb.mark_output(nc, nx)
    block = bb.build()

    b = GraphBuilder("outer")
    cond0 = b.input("cond", (1,), precision=Precision.BOOL)
    x0 = b.input("x", (1,))
    outs = b.op("while", {"X": [cond0, x0]},
                attrs={"block": block, "cond_index": 0, "max_iters": 10},
                shape_args=[cond0, x0], out_slots=("Out",))
    b.mark_output(outs[1])
    g = b.build()

    path = str(tmp_path / "cf.pnb")
    artifact.save(g, path)
    g2 = artifact.load(path)
    feed = {"cond": np.ones((1,), np.bool_), "x": np.zeros((1,), np.float32)}
    got = build_callable(g2)(stage_weights(g2), feed)
    assert float(np.asarray(got[g2.outputs[0]]).reshape(())) == 3.0
