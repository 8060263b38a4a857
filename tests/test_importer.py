"""Weight-importer parity tests: import a trained torch model's state_dict
and require our engine to reproduce torch's forward outputs — the genuine
"accuracy parity with the source framework" gate (reference analog: fluid
model load + golden-output integration tests, lite/api/*_test.cc)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402

from paddle_lite_tpu import GraphBuilder, QuantConfig, build_callable, stage_weights
from paddle_lite_tpu.formats.importer import import_state_dict, nchw_input_to_nhwc
from paddle_lite_tpu.tools.opt import optimize


def _torch_model():
    torch.manual_seed(0)
    m = tnn.Sequential(
        tnn.Conv2d(3, 16, 3, stride=2, padding=1, bias=False),
        tnn.BatchNorm2d(16),
        tnn.ReLU(),
        tnn.Conv2d(16, 16, 3, padding=1, groups=16, bias=False),  # depthwise
        tnn.BatchNorm2d(16),
        tnn.ReLU(),
        tnn.Conv2d(16, 32, 1, bias=False),
        tnn.BatchNorm2d(32),
        tnn.ReLU(),
        tnn.AdaptiveAvgPool2d(1),
        tnn.Flatten(),
        tnn.Linear(32, 10),
    )
    m.eval()
    # non-trivial BN stats
    with torch.no_grad():
        for mod in m.modules():
            if isinstance(mod, tnn.BatchNorm2d):
                mod.running_mean.normal_(0, 0.1)
                mod.running_var.uniform_(0.5, 1.5)
                mod.weight.normal_(1.0, 0.1)
                mod.bias.normal_(0, 0.1)
    return m


def _our_graph(batch):
    b = GraphBuilder("imported", seed=0)
    x = b.input("image", (batch, 16, 16, 3))
    y = b.conv_bn_act(x, 16, 3, stride=2, padding=1, act="relu")
    y = b.conv_bn_act(y, 16, 3, padding=1, depthwise=True, act="relu")
    y = b.conv_bn_act(y, 32, 1, act="relu")
    y = b.pool2d(y, "avg", global_pooling=True)
    y = b.reshape(y, (batch, 32))
    y = b.fc(y, 10)
    b.mark_output(y)
    return b.build()


def test_import_torch_state_dict_matches_forward(rng):
    m = _torch_model()
    g = _our_graph(batch=2)
    consumed = import_state_dict(g, m.state_dict())
    assert consumed == len([k for k in m.state_dict()
                            if not k.endswith("num_batches_tracked")])

    x = rng.normal(size=(2, 3, 16, 16)).astype(np.float32)
    with torch.no_grad():
        ref = m(torch.from_numpy(x)).numpy()
    out = build_callable(g)(stage_weights(g),
                            {"image": nchw_input_to_nhwc(x)})
    got = np.asarray(out[g.outputs[0]])
    np.testing.assert_allclose(got, ref, rtol=1e-3, atol=1e-4)


def test_imported_model_quantizes_with_small_delta(rng):
    """The accuracy contract measured on REAL (trained-ish) weights:
    int8 vs the source framework's fp32 outputs."""
    m = _torch_model()
    g = _our_graph(batch=4)
    import_state_dict(g, m.state_dict())
    x = rng.normal(size=(4, 3, 16, 16)).astype(np.float32)
    with torch.no_grad():
        ref = m(torch.from_numpy(x)).numpy()
    optimize(g, quant=QuantConfig(), calib_batches=[
        {"image": nchw_input_to_nhwc(
            rng.normal(size=(4, 3, 16, 16)).astype(np.float32))}
    ])
    out = build_callable(g)(stage_weights(g), {"image": nchw_input_to_nhwc(x)})
    got = np.asarray(out[g.outputs[0]])
    assert (got.argmax(-1) == ref.argmax(-1)).mean() == 1.0
    rel = np.abs(got - ref).max() / (np.abs(ref).max() + 1e-9)
    assert rel < 0.1, rel


def test_import_shape_mismatch_error(rng):
    g = _our_graph(batch=1)
    bad = {"w": np.zeros((7, 7, 7, 7), np.float32)}
    with pytest.raises(Exception, match="expected|ran out"):
        import_state_dict(g, bad)
