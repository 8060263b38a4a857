"""Multi-device sharding tests on the 8-device virtual CPU mesh
(SURVEY §4's multi-host-on-CPU strategy)."""

import jax
import numpy as np
import pytest

from paddle_lite_tpu import GraphBuilder, QuantConfig
from paddle_lite_tpu.parallel import MeshConfig, ShardedPredictor
from paddle_lite_tpu.runtime.predictor import create_predictor
from paddle_lite_tpu.tools.opt import optimize


def _model(batch):
    b = GraphBuilder("m", seed=31)
    x = b.input("x", (batch, 8, 8, 16))
    y = b.conv_bn_act(x, 32, 1, act="relu")
    y = b.conv_bn_act(y, 32, 3, padding=1, depthwise=True, act="relu")
    y = b.conv_bn_act(y, 64, 1, act="relu")
    y = b.pool2d(y, "avg", global_pooling=True)
    y = b.reshape(y, (batch, 64))
    y = b.fc(y, 16)
    b.mark_output(y)
    return b.build()


@pytest.mark.parametrize("dp,tp", [(8, 1), (4, 2), (2, 4), (1, 8)])
def test_sharded_matches_single_device(dp, tp, rng):
    assert len(jax.devices()) >= 8
    g = _model(batch=8)
    batches = [{"x": rng.normal(size=(8, 8, 8, 16)).astype(np.float32)}]
    optimize(g, quant=QuantConfig(), calib_batches=batches)

    feed = {"x": rng.normal(size=(8, 8, 8, 16)).astype(np.float32)}
    from paddle_lite_tpu.runtime.predictor import Predictor

    # single-device reference (xla kernels for comparability)
    import copy

    ref_pred = Predictor(g)
    # strip pallas picks for an apples-to-apples int8 XLA comparison
    ref = np.asarray(ref_pred.run(feed)[g.outputs[0]])

    sp = ShardedPredictor(g, MeshConfig(data=dp, model=tp))
    got = np.asarray(jax.device_get(sp.run(feed)[g.outputs[0]]))
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)


def test_mesh_config_validation():
    with pytest.raises(ValueError, match="needs"):
        MeshConfig(data=64, model=4).build()


def test_tp_pallas_kernels_assigned_and_match(rng):
    """ShardedPredictor must route int8 fc/1x1-conv through the shard_map'd
    Pallas TP path (kernel tag "tp_pallas"), and the result must match the
    plain-GSPMD sharded run exactly."""
    g = _model(batch=8)
    batches = [{"x": rng.normal(size=(8, 8, 8, 16)).astype(np.float32)}]
    optimize(g, quant=QuantConfig(), calib_batches=batches)
    feed = {"x": rng.normal(size=(8, 8, 8, 16)).astype(np.float32)}

    import copy
    g_ref = copy.deepcopy(g)
    ref_sp = ShardedPredictor(g_ref, MeshConfig(data=2, model=4),
                              use_tp_pallas=False)
    ref = np.asarray(jax.device_get(ref_sp.run(feed)[g_ref.outputs[0]]))

    sp = ShardedPredictor(g, MeshConfig(data=2, model=4), use_tp_pallas=True)
    assert sp.n_tp_ops >= 2  # the 1x1 convs + fc
    tagged = [op.op_type for op in g.ops
              if op.attrs.get("kernel") == "tp_pallas"]
    assert "fc" in tagged and "conv2d" in tagged
    got = np.asarray(jax.device_get(sp.run(feed)[g.outputs[0]]))
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)
