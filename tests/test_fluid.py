"""Fluid ``__model__`` format: wire codec round-trip, LoDTensor params,
directory load, NCHW→NHWC conversion, and QAT fake-op import end-to-end.

The reference's primary input surface is ``LoadModelPb``
(lite/model_parser/model_parser.cc); these tests cover the same contract
with locally-generated fixture bytes (no network: fixtures are built with
the serializer, which is itself validated byte-level against the protobuf
wire rules in test_wire_roundtrip)."""

import numpy as np
import pytest

from paddle_lite_tpu.core.builder import GraphBuilder
from paddle_lite_tpu.core.executor import build_callable, stage_weights
from paddle_lite_tpu.formats import fluid as F
from paddle_lite_tpu.formats.fluid_convert import fluid_to_graph, load_fluid_model


# ---- fixture helpers --------------------------------------------------------

def _feed_fetch(block, in_name, in_shape, out_name):
    block.vars["feed"] = F.FluidVar("feed", kind=F.VT_FEED_MINIBATCH)
    block.vars["fetch"] = F.FluidVar("fetch", kind=F.VT_FETCH_LIST)
    block.vars[in_name] = F.FluidVar(in_name, shape=in_shape)
    block.ops.insert(0, F.FluidOp(
        "feed", {"X": ["feed"]}, {"Out": [in_name]}, {"col": 0}))
    block.ops.append(F.FluidOp(
        "fetch", {"X": [out_name]}, {"Out": ["fetch"]}, {"col": 0}))


def _var(block, name, shape, dtype=F.VT_FP32, persistable=False):
    block.vars[name] = F.FluidVar(name, shape=tuple(shape), dtype=dtype,
                                  persistable=persistable)


def small_cnn_program(rng):
    """conv(3x3,p1) + bias → relu → pool2x2 → flatten-ish reshape → mul →
    add(bias) → softmax, NCHW throughout (4,8,8,3 input)."""
    prog = F.FluidProgram(blocks=[F.FluidBlock()])
    b = prog.main
    params = {
        "conv_w": rng.normal(0, 0.2, (8, 3, 3, 3)).astype(np.float32),  # OIHW
        "conv_b": rng.normal(0, 0.1, (8,)).astype(np.float32),
        "fc_w": rng.normal(0, 0.1, (8 * 4 * 4, 10)).astype(np.float32),
        "fc_b": rng.normal(0, 0.1, (10,)).astype(np.float32),
    }
    for n, v in params.items():
        _var(b, n, v.shape, persistable=True)
    _var(b, "conv_out", (-1, 8, 8, 8))
    _var(b, "biased", (-1, 8, 8, 8))
    _var(b, "relu_out", (-1, 8, 8, 8))
    _var(b, "pool_out", (-1, 8, 4, 4))
    _var(b, "flat", (-1, 8 * 4 * 4))
    _var(b, "mul_out", (-1, 10))
    _var(b, "logits", (-1, 10))
    _var(b, "probs", (-1, 10))
    b.ops = [
        F.FluidOp("conv2d", {"Input": ["image"], "Filter": ["conv_w"]},
                  {"Output": ["conv_out"]},
                  {"strides": [1, 1], "paddings": [1, 1],
                   "dilations": [1, 1], "groups": 1}),
        F.FluidOp("elementwise_add", {"X": ["conv_out"], "Y": ["conv_b"]},
                  {"Out": ["biased"]}, {"axis": 1}),
        F.FluidOp("relu", {"X": ["biased"]}, {"Out": ["relu_out"]}, {}),
        F.FluidOp("pool2d", {"X": ["relu_out"]}, {"Out": ["pool_out"]},
                  {"pooling_type": "max", "ksize": [2, 2], "strides": [2, 2],
                   "paddings": [0, 0], "global_pooling": False,
                   "ceil_mode": False, "exclusive": True}),
        F.FluidOp("reshape2", {"X": ["pool_out"]}, {"Out": ["flat"]},
                  {"shape": [0, 8 * 4 * 4]}),
        F.FluidOp("mul", {"X": ["flat"], "Y": ["fc_w"]}, {"Out": ["mul_out"]},
                  {"x_num_col_dims": 1, "y_num_col_dims": 1}),
        F.FluidOp("elementwise_add", {"X": ["mul_out"], "Y": ["fc_b"]},
                  {"Out": ["logits"]}, {"axis": 1}),
        F.FluidOp("softmax", {"X": ["logits"]}, {"Out": ["probs"]},
                  {"axis": -1}),
    ]
    _feed_fetch(b, "image", (-1, 3, 8, 8), "probs")
    return prog, params


def reference_cnn_output(params, x_nchw):
    """Same network built natively (NHWC) with transformed weights."""
    gb = GraphBuilder("ref")
    x = gb.input("image", (x_nchw.shape[0], 8, 8, 3))
    w = gb.weight("w", np.transpose(params["conv_w"], (2, 3, 1, 0)))
    y = gb.op("conv2d", {"Input": [x], "Filter": [w],
                         "Bias": [gb.weight("b", params["conv_b"])]},
              attrs={"strides": [1, 1], "paddings": [1, 1],
                     "dilations": [1, 1], "groups": 1},
              shape_args=[x, w], out_slots=("Output",))[0]
    y = gb.act(y, "relu")
    y = gb.pool2d(y, "max", ksize=2, stride=2)
    # fluid flatten is NCHW-ordered: transpose back before reshaping
    y = gb.transpose(y, (0, 3, 1, 2))
    y = gb.reshape(y, (x_nchw.shape[0], 8 * 4 * 4))
    w2 = gb.weight("w2", params["fc_w"])
    y = gb.op("mul", {"X": [y], "Y": [w2]},
              attrs={"x_num_col_dims": 1, "y_num_col_dims": 1},
              shape_args=[y, w2])[0]
    y = gb.eltwise(y, gb.weight("b2", params["fc_b"]), "add")
    y = gb.softmax(y)
    gb.mark_output(y)
    g = gb.build()
    feed = {"image": np.transpose(x_nchw, (0, 2, 3, 1))}
    return np.asarray(build_callable(g)(stage_weights(g), feed)[g.outputs[0]])


# ---- tests -------------------------------------------------------------------

def test_wire_roundtrip(rng):
    prog, _ = small_cnn_program(rng)
    buf = F.serialize_program(prog)
    prog2 = F.parse_program(buf)
    assert len(prog2.main.ops) == len(prog.main.ops)
    for a, b in zip(prog.main.ops, prog2.main.ops):
        assert a.type == b.type
        assert a.inputs == b.inputs
        assert a.outputs == b.outputs
        for k, v in a.attrs.items():
            got = b.attrs[k]
            if isinstance(v, float):
                assert got == pytest.approx(v)
            elif isinstance(v, list) and v and isinstance(v[0], float):
                assert got == pytest.approx(v)
            else:
                assert got == v
    for name, var in prog.main.vars.items():
        v2 = prog2.main.vars[name]
        assert v2.shape == tuple(var.shape)
        assert v2.persistable == var.persistable
        assert v2.kind == var.kind


def test_lod_tensor_roundtrip(rng):
    for arr in (rng.normal(size=(3, 4, 5)).astype(np.float32),
                rng.integers(-100, 100, (7,)).astype(np.int64),
                rng.integers(-127, 127, (2, 3)).astype(np.int8),
                np.float32(3.5).reshape(())):
        buf = F.serialize_lod_tensor(np.asarray(arr))
        out, pos = F.parse_lod_tensor(buf)
        assert pos == len(buf)
        np.testing.assert_array_equal(out, arr)


def test_load_convert_run(rng, tmp_path):
    prog, params = small_cnn_program(rng)
    d = tmp_path / "model"
    F.save_fluid_dir(str(d), prog, params)
    g = load_fluid_model(str(d), batch=4)
    assert g.inputs == ["image"]
    x_nchw = rng.normal(size=(4, 3, 8, 8)).astype(np.float32)
    out = np.asarray(build_callable(g)(stage_weights(g),
                                       {"image": x_nchw})[g.outputs[0]])
    ref = reference_cnn_output(params, x_nchw)
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-5)


def test_per_var_param_files(rng, tmp_path):
    prog, params = small_cnn_program(rng)
    d = tmp_path / "model_pervar"
    F.save_fluid_dir(str(d), prog, params, combined=False)
    assert not (d / "params").exists()
    g = load_fluid_model(str(d), batch=2)
    x = rng.normal(size=(2, 3, 8, 8)).astype(np.float32)
    out = np.asarray(build_callable(g)(stage_weights(g),
                                       {"image": x})[g.outputs[0]])
    assert out.shape == (2, 10)
    np.testing.assert_allclose(out.sum(axis=-1), 1.0, rtol=1e-5)


def test_transpose_nhwc_noop_alias(rng, tmp_path):
    """SSD-head pattern: transpose2 NCHW→NHWC then reshape — the transpose
    must become a free assign (no data movement) on our NHWC tensor."""
    prog = F.FluidProgram(blocks=[F.FluidBlock()])
    b = prog.main
    params = {"w": rng.normal(0, 0.2, (12, 3, 1, 1)).astype(np.float32)}
    _var(b, "w", params["w"].shape, persistable=True)
    _var(b, "head", (-1, 12, 4, 4))
    _var(b, "head_t", (-1, 4, 4, 12))
    _var(b, "boxes", (-1, 48, 4))
    b.ops = [
        F.FluidOp("conv2d", {"Input": ["image"], "Filter": ["w"]},
                  {"Output": ["head"]},
                  {"strides": [1, 1], "paddings": [0, 0],
                   "dilations": [1, 1], "groups": 1}),
        F.FluidOp("transpose2", {"X": ["head"]}, {"Out": ["head_t"]},
                  {"axis": [0, 2, 3, 1]}),
        F.FluidOp("reshape2", {"X": ["head_t"]}, {"Out": ["boxes"]},
                  {"shape": [0, -1, 4]}),
    ]
    _feed_fetch(b, "image", (-1, 3, 4, 4), "boxes")
    g = fluid_to_graph(prog, params, batch=2)
    # exactly one physical transpose: the NCHW input cast. The head
    # transpose2 itself must be free (assign), not a data movement.
    assert sum(1 for op in g.ops if op.op_type == "transpose") == 1
    assert any(op.op_type == "assign" for op in g.ops)
    x = rng.normal(size=(2, 3, 4, 4)).astype(np.float32)
    out = np.asarray(build_callable(g)(stage_weights(g),
                                       {"image": x})[g.outputs[0]])
    # reference: manual NCHW conv + transpose + reshape
    import jax.numpy as jnp
    import jax
    ref = jax.lax.conv_general_dilated(
        x, np.transpose(params["w"], (2, 3, 1, 0)),
        (1, 1), "VALID", dimension_numbers=("NCHW", "HWIO", "NCHW"))
    ref = np.transpose(np.asarray(ref), (0, 2, 3, 1)).reshape(2, -1, 4)
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-5)


def test_qat_import_end_to_end(rng, tmp_path):
    """PaddleSlim-style QAT graph: fake_quantize on the conv input +
    channel-wise fake_dequantize on its output; after optimize() the fake
    ops are gone, the conv is enable_int8 with the recorded scales, and
    the output matches fp32 closely."""
    from paddle_lite_tpu import QuantConfig
    from paddle_lite_tpu.tools.opt import optimize

    w = rng.normal(0, 0.2, (8, 3, 3, 3)).astype(np.float32)  # OIHW
    w_absmax = np.abs(w).max(axis=(1, 2, 3)).astype(np.float32)  # per out-ch
    in_scale = np.asarray([2.5], np.float32)  # recorded absmax range

    prog = F.FluidProgram(blocks=[F.FluidBlock()])
    b = prog.main
    params = {
        "conv_w_q": w,  # QAT exports keep fp32 weights + recorded ranges
        "in_scale": in_scale,
        "w_scales": w_absmax,
    }
    for n, v in params.items():
        _var(b, n, v.shape, persistable=True)
    _var(b, "img_q", (-1, 3, 8, 8))
    _var(b, "conv_out", (-1, 8, 8, 8))
    _var(b, "conv_deq", (-1, 8, 8, 8))
    _var(b, "relu_out", (-1, 8, 8, 8))
    b.ops = [
        F.FluidOp("fake_quantize_moving_average_abs_max",
                  {"X": ["image"], "InScale": ["in_scale"]},
                  {"Out": ["img_q"]}, {"bit_length": 8}),
        F.FluidOp("conv2d", {"Input": ["img_q"], "Filter": ["conv_w_q"]},
                  {"Output": ["conv_out"]},
                  {"strides": [1, 1], "paddings": [1, 1],
                   "dilations": [1, 1], "groups": 1}),
        F.FluidOp("fake_channel_wise_dequantize_max_abs",
                  {"X": ["conv_out"], "Scales": ["w_scales"]},
                  {"Out": ["conv_deq"]}, {"quant_bits": [8]}),
        F.FluidOp("relu", {"X": ["conv_deq"]}, {"Out": ["relu_out"]}, {}),
    ]
    _feed_fetch(b, "image", (-1, 3, 8, 8), "relu_out")

    d = tmp_path / "qat"
    F.save_fluid_dir(str(d), prog, params)
    g = load_fluid_model(str(d), batch=2)

    x = (rng.normal(size=(2, 3, 8, 8)) * 0.8).astype(np.float32)
    # fp32 semantics of the QAT graph (quant-dequant roundtrip included)
    fp32_out = np.asarray(build_callable(g)(stage_weights(g),
                                            {"image": x})[g.outputs[0]])

    g2 = load_fluid_model(str(d), batch=2)
    optimize(g2)  # QAT path: calibration-free, scales from the fake ops
    assert not any(op.op_type.startswith("fake_") for op in g2.ops)
    convs = [op for op in g2.ops if op.op_type == "conv2d"]
    assert convs and convs[0].attrs.get("enable_int8")
    wq = g2.vars[convs[0].input("Filter")].quant
    np.testing.assert_allclose(wq.scale_array(), w_absmax / 127.0, rtol=1e-6)
    int8_out = np.asarray(build_callable(g2)(stage_weights(g2),
                                             {"image": x})[g2.outputs[0]])
    assert fp32_out.shape == int8_out.shape
    cos = float((fp32_out * int8_out).sum()
                / (np.linalg.norm(fp32_out) * np.linalg.norm(int8_out) + 1e-9))
    assert cos > 0.999


def test_committed_qat_fixture_end_to_end(rng):
    """The COMMITTED fluid QAT model dir (tests/fixtures/qat_lenet —
    generated once by make_qat_fixture.py, loaded from the pinned on-disk
    bytes) loads, optimizes calibration-free, and the int8 program tracks
    the QAT fp32 semantics."""
    import os

    from paddle_lite_tpu.tools.opt import optimize

    d = os.path.join(os.path.dirname(__file__), "fixtures", "qat_lenet")
    g = load_fluid_model(d, batch=2)
    x = (rng.normal(size=(2, 1, 28, 28)) * 0.7).astype(np.float32)
    fp32_out = np.asarray(build_callable(g)(stage_weights(g),
                                            {"image": x})[g.outputs[0]])

    g2 = load_fluid_model(d, batch=2)
    optimize(g2)  # QAT: scales come from the recorded fake-quant thresholds
    assert not any(op.op_type.startswith("fake_") for op in g2.ops)
    convs = [op for op in g2.ops if op.op_type == "conv2d"]
    assert len(convs) == 2
    # QAT graphs quantize exactly what training quantized — the PTQ
    # skip_stem_conv heuristic does not override recorded placements
    assert all(g2.weights[c.input("Filter")].dtype == np.int8 for c in convs)
    assert all(c.attrs.get("enable_int8") for c in convs)
    int8_out = np.asarray(build_callable(g2)(stage_weights(g2),
                                             {"image": x})[g2.outputs[0]])
    cos = float((fp32_out * int8_out).sum()
                / (np.linalg.norm(fp32_out) * np.linalg.norm(int8_out) + 1e-9))
    assert cos > 0.999
    assert (fp32_out.argmax(-1) == int8_out.argmax(-1)).mean() >= 0.5


def test_fluid_transformer_block_converts(rng):
    """Mini attention block: stack/matmul/softmax/transpose2/scale/
    layer_norm through the converter (ERNIE-family op coverage)."""
    prog = F.FluidProgram(blocks=[F.FluidBlock()])
    b = prog.main
    d_model, seq = 8, 4
    rng2 = np.random.default_rng(3)
    params = {
        "wq": rng2.normal(0, 0.2, (d_model, d_model)).astype(np.float32),
        "wk": rng2.normal(0, 0.2, (d_model, d_model)).astype(np.float32),
        "wv": rng2.normal(0, 0.2, (d_model, d_model)).astype(np.float32),
        "ln_g": np.abs(rng2.normal(1, 0.1, (d_model,))).astype(np.float32),
        "ln_b": rng2.normal(0, 0.05, (d_model,)).astype(np.float32),
    }
    for n, v in params.items():
        _var(b, n, v.shape, persistable=True)
    for n, s in [("q", (-1, seq, d_model)), ("k", (-1, seq, d_model)),
                 ("v", (-1, seq, d_model)), ("qk", (-1, seq, seq)),
                 ("qk_s", (-1, seq, seq)), ("attn", (-1, seq, seq)),
                 ("ctx", (-1, seq, d_model)), ("res", (-1, seq, d_model)),
                 ("ln", (-1, seq, d_model))]:
        _var(b, n, s)
    b.ops = [
        F.FluidOp("matmul", {"X": ["x"], "Y": ["wq"]}, {"Out": ["q"]}, {}),
        F.FluidOp("matmul", {"X": ["x"], "Y": ["wk"]}, {"Out": ["k"]}, {}),
        F.FluidOp("matmul", {"X": ["x"], "Y": ["wv"]}, {"Out": ["v"]}, {}),
        F.FluidOp("matmul", {"X": ["q"], "Y": ["k"]}, {"Out": ["qk"]},
                  {"transpose_Y": True}),
        F.FluidOp("scale", {"X": ["qk"]}, {"Out": ["qk_s"]},
                  {"scale": float(1 / np.sqrt(d_model)), "bias": 0.0}),
        F.FluidOp("softmax", {"X": ["qk_s"]}, {"Out": ["attn"]}, {"axis": -1}),
        F.FluidOp("matmul", {"X": ["attn"], "Y": ["v"]}, {"Out": ["ctx"]}, {}),
        F.FluidOp("elementwise_add", {"X": ["ctx"], "Y": ["x"]},
                  {"Out": ["res"]}, {"axis": -1}),
        F.FluidOp("layer_norm", {"X": ["res"], "Scale": ["ln_g"],
                                 "Bias": ["ln_b"]},
                  {"Y": ["ln"]}, {"begin_norm_axis": 2, "epsilon": 1e-5}),
    ]
    _feed_fetch(b, "x", (-1, seq, d_model), "ln")
    g = fluid_to_graph(prog, params, batch=2)
    x = rng.normal(size=(2, seq, d_model)).astype(np.float32)
    out = np.asarray(build_callable(g)(stage_weights(g),
                                       {"x": x})[g.outputs[0]])
    # numpy reference
    q, k, v = x @ params["wq"], x @ params["wk"], x @ params["wv"]
    qk = (q @ np.swapaxes(k, -1, -2)) / np.sqrt(d_model)
    attn = np.exp(qk - qk.max(-1, keepdims=True))
    attn /= attn.sum(-1, keepdims=True)
    res = attn @ v + x
    mu = res.mean(-1, keepdims=True)
    var = res.var(-1, keepdims=True)
    ref = (res - mu) / np.sqrt(var + 1e-5) * params["ln_g"] + params["ln_b"]
    np.testing.assert_allclose(out, ref, rtol=1e-3, atol=1e-4)
