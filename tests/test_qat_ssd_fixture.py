"""BASELINE-class fluid front-door proof (VERDICT r2 missing #5): the
committed PaddleSlim-style QAT SSD-head fixture loads through the fluid
reader, converts with the real paddle export layout (NCHW convs →
transpose2 → reshape2 → concat → softmax → (N,C,M) NMS scores), fuses its
fake-quant ops into int8 convs, and agrees with a hand-built zoo twin
op-for-op and output-for-output."""

import os

import numpy as np
import pytest

from paddle_lite_tpu.core.builder import GraphBuilder
from paddle_lite_tpu.core.executor import build_callable, stage_weights
from paddle_lite_tpu.formats.fluid_convert import load_fluid_model
from paddle_lite_tpu.tools.opt import optimize

FIXTURE = os.path.join(os.path.dirname(__file__), "fixtures", "qat_ssd_head")
BATCH = 2
IMG = 76
NUM_CLASSES = 5
N_PRIORS = 4


def _load_params():
    from paddle_lite_tpu.formats.fluid import load_fluid_dir

    _, params = load_fluid_dir(FIXTURE)
    return params


def _run(g, feed):
    out = build_callable(g)(stage_weights(g), feed)
    return {k: np.asarray(v) for k, v in out.items()}


def _twin_graph(params, batch=BATCH):
    """Hand-built NHWC zoo-style twin of the fixture program, same weights."""
    b = GraphBuilder("twin", seed=0)
    image = b.input("image", (batch, IMG, IMG, 3))

    def conv(x, wname, stride):
        w = b.weight(wname + ".hwio",
                     np.ascontiguousarray(
                         np.transpose(params[wname], (2, 3, 1, 0))))
        return b.op("conv2d", {"Input": [x], "Filter": [w]},
                    attrs={"strides": [stride, stride], "paddings": [1, 1],
                           "dilations": [1, 1], "groups": 1},
                    shape_args=[x, w], out_slots=("Output",))[0]

    t1 = b.act(conv(image, "conv1_w", 2), "relu")
    t2 = b.act(conv(t1, "conv2_w", 2), "relu")

    locs, confs, priors, pvars = [], [], [], []
    for i, tap in ((1, t1), (2, t2)):
        n, h, w_, _ = b.g.vars[tap].shape
        mi = h * w_ * N_PRIORS
        loc = conv(tap, f"loc{i}_w", 1)
        conf = conv(tap, f"conf{i}_w", 1)
        locs.append(b.reshape(loc, (n, mi, 4)))
        confs.append(b.reshape(conf, (n, mi, NUM_CLASSES)))
        size = IMG * (0.2 if i == 1 else 0.45)
        boxes, variances = b.op(
            "prior_box", {"Input": [tap], "Image": [image]},
            attrs={"min_sizes": [size], "max_sizes": [size * 1.6],
                   "aspect_ratios": [2.0], "flip": True, "clip": True,
                   "variances": [0.1, 0.1, 0.2, 0.2]},
            shape_args=[tap], out_slots=("Boxes", "Variances"))
        priors.append(b.reshape(boxes, (mi, 4)))
        pvars.append(b.reshape(variances, (mi, 4)))

    loc_all = b.concat(locs, axis=1)
    conf_all = b.concat(confs, axis=1)
    probs = b.softmax(conf_all, axis=-1)
    prior_all = b.concat(priors, axis=0)
    pvar_all = b.concat(pvars, axis=0)
    decoded = b.op(
        "box_coder",
        {"PriorBox": [prior_all], "PriorBoxVar": [pvar_all],
         "TargetBox": [loc_all]},
        attrs={"code_type": "decode_center_size", "box_normalized": True},
        shape_args=[prior_all, pvar_all, loc_all],
        out_slots=("OutputBox",))[0]
    out = b.op(
        "multiclass_nms", {"BBoxes": [decoded], "Scores": [probs]},
        attrs={"background_label": 0, "score_threshold": 0.01,
               "nms_top_k": 400, "nms_threshold": 0.45, "keep_top_k": 100},
        shape_args=[decoded, probs])[0]
    b.mark_output(out)
    return b.build()


@pytest.fixture(scope="module")
def fixture_graph():
    return load_fluid_model(FIXTURE, batch=BATCH)


def test_loads_and_structure(fixture_graph):
    g = fixture_graph
    assert g.inputs == ["image"]
    types = [op.op_type for op in g.ops]
    for t in ("conv2d", "prior_box", "box_coder", "multiclass_nms",
              "softmax", "concat"):
        assert t in types, t
    assert types.count("conv2d") == 6
    assert types.count("prior_box") == 2
    # QAT fake ops preserved for the fuse pass
    assert sum(t.startswith("fake_") for t in types) == 12


def test_fp32_matches_hand_built_twin(fixture_graph, rng):
    """Output-for-output agreement of the fluid-loaded graph (raw fp32 QAT
    semantics carry a quant round-trip; compare post-fuse fp32-equivalent
    path against the twin within int8 round-trip tolerance)."""
    params = _load_params()
    x_nchw = rng.normal(size=(BATCH, 3, IMG, IMG)).astype(np.float32)

    got = _run(fixture_graph, {"image": x_nchw})[fixture_graph.outputs[0]]
    twin = _twin_graph(params)
    ref = _run(twin, {"image": np.transpose(x_nchw, (0, 2, 3, 1)).copy()})[
        twin.outputs[0]]
    assert got.shape == ref.shape == (BATCH, 100, 6)
    # fake-quant round-trips perturb scores slightly; detections must agree
    from paddle_lite_tpu.tools.accuracy_families import match_detections

    for bi in range(BATCH):
        m = match_detections(ref[bi], got[bi], conf=0.1)
        assert m["ref"] > 0
        assert m["matched"] / m["ref"] > 0.95, m


def test_qat_fuse_yields_int8_graph(fixture_graph, rng):
    g = load_fluid_model(FIXTURE, batch=BATCH)
    optimize(g)  # QAT: calibration-free, scales from the fake ops
    assert not any(op.op_type.startswith("fake_") for op in g.ops)
    int8_convs = [op for op in g.ops
                  if op.op_type == "conv2d" and op.attrs.get("enable_int8")]
    assert len(int8_convs) == 6  # every conv carries QAT scales

    # per-channel weight scales match the stored abs-max
    params = _load_params()
    conv1 = int8_convs[0]
    wq = g.vars[conv1.input("Filter")].quant
    np.testing.assert_allclose(
        wq.scale_array(),
        np.abs(params["conv1_w"]).max(axis=(1, 2, 3)) / 127.0, rtol=1e-5)

    # int8 detections agree with the raw-QAT fp32 semantics
    x_nchw = rng.normal(size=(BATCH, 3, IMG, IMG)).astype(np.float32)
    ref = _run(fixture_graph, {"image": x_nchw})[fixture_graph.outputs[0]]
    got = _run(g, {"image": x_nchw})[g.outputs[0]]
    from paddle_lite_tpu.tools.accuracy_families import match_detections

    for bi in range(BATCH):
        m = match_detections(ref[bi], got[bi], conf=0.1)
        assert m["ref"] > 0
        assert m["matched"] / m["ref"] > 0.9, m
