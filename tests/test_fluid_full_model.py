"""Full-model fluid front-door proof (VERDICT r3 missing #2): a COMPLETE
MobileNetV1 fluid program (13 depthwise-separable blocks, NCHW, bn+relu
chains, mul+add fc export form) loads through the fluid reader, converts,
quantizes, and agrees op-for-op and output-for-output with the zoo twin
(models/mobilenet_v1.build carrying the same weights)."""

import os

import numpy as np
import pytest

from paddle_lite_tpu.core.executor import build_callable, stage_weights
from paddle_lite_tpu.formats.fluid_convert import load_fluid_model
from paddle_lite_tpu.models import mobilenet_v1
from paddle_lite_tpu.tools.opt import optimize

FIXTURE = os.path.join(os.path.dirname(__file__), "fixtures", "mnv1_fluid")
BATCH = 2
IMG = 96
CLASSES = 100


def _load_params():
    from paddle_lite_tpu.formats.fluid import load_fluid_dir

    _, params = load_fluid_dir(FIXTURE)
    return params


def _run(g, feed):
    out = build_callable(g)(stage_weights(g), feed)
    return {k: np.asarray(v) for k, v in out.items()}


def _twin_graph(params, batch=BATCH):
    """The zoo builder's graph with the fixture's weights grafted in, in op
    order — the hand-built twin the imported model must reproduce."""
    g = mobilenet_v1.build(batch=batch, image_size=IMG, num_classes=CLASSES,
                          width_mult=0.25, seed=0)
    conv_names = (["conv1_w"]
                  + [w for i in range(1, 14) for w in (f"dw{i}_w", f"pw{i}_w")])
    bn_names = (["bn1"]
                + [n for i in range(1, 14) for n in (f"bn_dw{i}", f"bn_pw{i}")])
    ci = bi = 0
    for op in g.ops:
        if op.op_type in ("conv2d", "depthwise_conv2d"):
            w = params[conv_names[ci]]
            ci += 1
            g.weights[op.input("Filter")] = np.ascontiguousarray(
                np.transpose(w, (2, 3, 1, 0)))  # OIHW -> HWIO
        elif op.op_type == "batch_norm":
            base = bn_names[bi]
            bi += 1
            for slot, suffix in (("Scale", "scale"), ("Bias", "bias"),
                                 ("Mean", "mean"), ("Variance", "var")):
                g.weights[op.input(slot)] = params[f"{base}_{suffix}"]
        elif op.op_type == "fc":
            g.weights[op.input("W")] = params["fc_w"]
            g.weights[op.input("Bias")] = params["fc_b"]
    assert ci == 27 and bi == 27
    return g


@pytest.fixture(scope="module")
def imported():
    return load_fluid_model(FIXTURE, batch=BATCH)


def test_full_model_structure(imported):
    types = [op.op_type for op in imported.ops]
    assert types.count("conv2d") == 14          # stem + 13 pointwise
    assert types.count("depthwise_conv2d") == 13
    assert types.count("batch_norm") == 27
    assert types.count("relu") == 27
    assert types.count("pool2d") == 1
    assert types.count("mul") == 1
    assert types.count("softmax") == 1
    assert imported.inputs == ["image"]
    # depthwise filters arrive HWIO (3,3,1,C) with groups == C
    dw = next(op for op in imported.ops
              if op.op_type == "depthwise_conv2d")
    assert imported.vars[dw.input("Filter")].shape[:3] == (3, 3, 1)
    assert dw.attrs["groups"] == imported.vars[dw.input("Filter")].shape[3]


def test_fp32_output_matches_zoo_twin(imported, rng):
    params = _load_params()
    x_nchw = rng.normal(size=(BATCH, 3, IMG, IMG)).astype(np.float32)
    got = _run(imported, {"image": x_nchw})[imported.outputs[0]]
    twin = _twin_graph(params)
    ref = _run(twin, {"image": np.transpose(x_nchw, (0, 2, 3, 1)).copy()})[
        twin.outputs[0]]
    assert got.shape == ref.shape == (BATCH, CLASSES)
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)


def test_quantized_pipeline_matches_zoo_twin(rng):
    """import -> optimize(int8 PTQ) against the zoo twin through the SAME
    pipeline: identical int8 op counts and agreeing predictions."""
    from paddle_lite_tpu import QuantConfig

    params = _load_params()
    x_nchw = rng.normal(size=(BATCH, 3, IMG, IMG)).astype(np.float32)
    x_nhwc = np.transpose(x_nchw, (0, 2, 3, 1)).copy()

    g = load_fluid_model(FIXTURE, batch=BATCH)
    optimize(g, quant=QuantConfig(), calib_batches=[{"image": x_nchw}])
    twin = _twin_graph(params)
    optimize(twin, quant=QuantConfig(), calib_batches=[{"image": x_nhwc}])

    def int8_counts(gr):
        out = {}
        for op in gr.ops:
            if op.attrs.get("enable_int8"):
                out[op.op_type] = out.get(op.op_type, 0) + 1
        return out

    assert int8_counts(g) == int8_counts(twin)
    got = _run(g, {"image": x_nchw})[g.outputs[0]]
    ref = _run(twin, {"image": x_nhwc})[twin.outputs[0]]
    assert (np.argmax(got, -1) == np.argmax(ref, -1)).all()
    cos = (got * ref).sum() / (np.linalg.norm(got) * np.linalg.norm(ref))
    assert cos > 0.999
