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


# ---------------------------------------------------------------------------
# CRNN with its sequence structure (fw gru + reverse gru) — VERDICT r3 #2
# ---------------------------------------------------------------------------

CRNN_FIXTURE = os.path.join(os.path.dirname(__file__), "fixtures",
                            "crnn_fluid")
CRNN_T, CRNN_HID, CRNN_CLASSES = 16, 32, 17


def _crnn_params():
    from paddle_lite_tpu.formats.fluid import load_fluid_dir

    _, params = load_fluid_dir(CRNN_FIXTURE)
    return params


def _crnn_twin(params, batch=BATCH):
    """Zoo-style NHWC twin whose recurrence runs through the engine's
    fused ``bidirectional_gru`` (direction-vmapped) — the imported
    two-``gru`` form must compute the same function."""
    from paddle_lite_tpu.core.builder import GraphBuilder

    b = GraphBuilder("crnn_twin", seed=0)
    image = b.input("image", (batch, 32, 64, 3))

    def conv(x, wname, stride=1):
        w = b.weight(wname + ".hwio", np.ascontiguousarray(
            np.transpose(params[wname], (2, 3, 1, 0))))
        return b.op("conv2d", {"Input": [x], "Filter": [w]},
                    attrs={"strides": [stride, stride], "paddings": [1, 1],
                           "dilations": [1, 1], "groups": 1},
                    shape_args=[x, w], out_slots=("Output",))[0]

    def bn(x, base):
        names = {}
        for slot, suffix in (("Scale", "scale"), ("Bias", "bias"),
                             ("Mean", "mean"), ("Variance", "var")):
            names[slot] = b.weight(f"{base}_{suffix}.t",
                                   params[f"{base}_{suffix}"])
        return b.op("batch_norm", {"X": [x], **{k: [v] for k, v in
                                                names.items()}},
                    shape_args=[x], out_slots=("Y",))[0]

    x = b.act(bn(conv(image, "c1_w", 2), "bn1"), "relu")
    x = b.pool2d(x, "max", ksize=2, stride=2)
    x = b.act(bn(conv(x, "c2_w"), "bn2"), "relu")
    x = b.pool2d(x, "max", ksize=(2, 1), stride=(2, 1))
    x = b.act(bn(conv(x, "c3_w"), "bn3"), "relu")
    x = b.pool2d(x, "max", ksize=(4, 1), stride=(4, 1))
    n, h, w, c = b.g.vars[x].shape
    assert (h, w, c) == (1, CRNN_T, 48)
    seq = b.reshape(x, (n, w, c))

    projs, whs, biases = [], [], []
    for d in ("fw", "bw"):
        wp = b.weight(f"proj_{d}.t", params[f"proj_{d}"])
        projs.append(b.op("mul", {"X": [seq], "Y": [wp]},
                          attrs={"x_num_col_dims": 2, "y_num_col_dims": 1},
                          shape_args=[seq, wp])[0])
        whs.append(b.weight(f"gru_{d}_w.t", params[f"gru_{d}_w"]))
        biases.append(b.weight(f"gru_{d}_b.t", params[f"gru_{d}_b"]))
    rnn = b.op("bidirectional_gru",
               {"Input": [projs[0]], "InputRev": [projs[1]],
                "WeightFw": [whs[0]], "WeightBw": [whs[1]],
                "BiasFw": [biases[0]], "BiasBw": [biases[1]]},
               attrs={"gate_activation": "sigmoid", "activation": "tanh"},
               shape_args=[projs[0]], out_slots=("Hidden",))[0]
    wc = b.weight("fc_w.t", params["fc_w"])
    mm = b.op("mul", {"X": [rnn], "Y": [wc]},
              attrs={"x_num_col_dims": 2, "y_num_col_dims": 1},
              shape_args=[rnn, wc])[0]
    bc = b.weight("fc_b.t", params["fc_b"])
    logits = b.op("elementwise_add", {"X": [mm], "Y": [bc]},
                  attrs={"axis": -1}, shape_args=[mm, bc])[0]
    probs = b.op("softmax", {"X": [logits]}, attrs={"axis": -1},
                 shape_args=[logits])[0]
    b.mark_output(probs)
    return b.build()


@pytest.fixture(scope="module")
def crnn_imported():
    return load_fluid_model(CRNN_FIXTURE, batch=BATCH)


def test_crnn_sequence_structure(crnn_imported):
    types = [op.op_type for op in crnn_imported.ops]
    assert types.count("gru") == 2            # fw + reverse pair imported
    grus = [op for op in crnn_imported.ops if op.op_type == "gru"]
    assert sorted(bool(g.attrs.get("is_reverse")) for g in grus) == [False, True]
    assert types.count("conv2d") == 3
    assert types.count("pool2d") == 3         # incl. the height-only pools
    assert types.count("mul") == 3            # 2 projections + CTC head
    for g in grus:  # dense (N, T, 3H) sequence form (§5.7 contract)
        assert crnn_imported.vars[g.input("Input")].shape == (
            BATCH, CRNN_T, 3 * CRNN_HID)


def test_crnn_fp32_matches_bigru_twin(crnn_imported, rng):
    params = _crnn_params()
    x_nchw = rng.normal(size=(BATCH, 3, 32, 64)).astype(np.float32)
    got = _run(crnn_imported, {"image": x_nchw})[crnn_imported.outputs[0]]
    twin = _crnn_twin(params)
    ref = _run(twin, {"image": np.transpose(x_nchw, (0, 2, 3, 1)).copy()})[
        twin.outputs[0]]
    assert got.shape == ref.shape == (BATCH, CRNN_T, CRNN_CLASSES)
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=1e-5)


def test_crnn_quantized_pipeline_decodes_agree(crnn_imported, rng):
    from paddle_lite_tpu import QuantConfig

    x_nchw = rng.normal(size=(BATCH, 3, 32, 64)).astype(np.float32)
    g = load_fluid_model(CRNN_FIXTURE, batch=BATCH)
    optimize(g, quant=QuantConfig(), calib_batches=[{"image": x_nchw}])
    assert any(op.attrs.get("enable_int8") for op in g.ops)
    got = _run(g, {"image": x_nchw})[g.outputs[0]]
    ref = _run(crnn_imported, {"image": x_nchw})[crnn_imported.outputs[0]]
    # per-step argmax (the CTC greedy pre-collapse sequence) must agree
    assert (np.argmax(got, -1) == np.argmax(ref, -1)).mean() > 0.95
