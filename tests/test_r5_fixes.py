"""Round-5 regression tests: the r4 ADVICE fixes + the lane-packed int8
GEMM (int8_matmul.pack_factor — the MNv1 112px 32->64 pointwise fix)."""

import os

import jax.numpy as jnp
import numpy as np
import pytest

from paddle_lite_tpu.ops.kernels.int8_matmul import int8_matmul, pack_factor


# ---------------------------------------------------------------------------
# lane-packed int8 GEMM
# ---------------------------------------------------------------------------

def test_pack_factor_is_measured_out():
    # row-packing lost on-chip (relayout cost of the tiled int8 layout —
    # docs/mnv1_pw_r5.json); the helper documents the negative result
    assert pack_factor(802816, 32, 64) == 1


def test_int8_matmul_large_m_lane_starved(rng):
    """The MNv1-112px-class lane-starved shape (large M, K=32, N=64) must
    stay exact through the padding path."""
    m, k, n = 32768, 32, 64
    x_q = rng.integers(-127, 128, size=(m, k), dtype=np.int8)
    w_q = rng.integers(-127, 128, size=(k, n), dtype=np.int8)
    eff = rng.uniform(1e-3, 2e-3, size=(n,)).astype(np.float32)
    bias = rng.normal(size=(n,)).astype(np.float32)

    got = np.asarray(int8_matmul(x_q, w_q, eff, bias, interpret=True))
    ref = (x_q.astype(np.int32) @ w_q.astype(np.int32)).astype(np.float32)
    ref = ref * eff.reshape(1, -1) + bias.reshape(1, -1)
    assert got.shape == (m, n)
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-4)

    # requant path (int8 out), no bias
    got8 = np.asarray(int8_matmul(x_q, w_q, eff, None, act="relu",
                                  out_scale=0.05, interpret=True))
    ref8 = np.clip(np.round(np.maximum(
        (x_q.astype(np.int32) @ w_q.astype(np.int32)).astype(np.float32)
        * eff.reshape(1, -1), 0) / 0.05), -127, 127).astype(np.int8)
    assert got8.dtype == np.int8
    assert np.abs(got8.astype(np.int32) - ref8.astype(np.int32)).max() <= 1


# ---------------------------------------------------------------------------
# quant_depthwise width threshold (r5, the DBNet trunk knob)
# ---------------------------------------------------------------------------

def test_quant_depthwise_width_threshold(rng):
    """quant_depthwise=<int> quantizes only dw whose channel count is <=
    the threshold; True/False keep their old meaning."""
    from paddle_lite_tpu.core.builder import GraphBuilder
    from paddle_lite_tpu.quant.quantize_pass import QuantConfig
    from paddle_lite_tpu.tools.opt import optimize

    def build():
        b = GraphBuilder("m", seed=3)
        x = b.input("x", (2, 16, 16, 8))
        x = b.conv_bn_act(x, 16, 3, padding=1, act="relu")      # stem-ish
        x = b.conv_bn_act(x, 16, 3, padding=1, depthwise=True,
                          act="relu")                            # dw C=16
        x = b.conv_bn_act(x, 64, 1, act="relu")
        x = b.conv_bn_act(x, 64, 3, padding=1, depthwise=True,
                          act="relu")                            # dw C=64
        x = b.conv_bn_act(x, 64, 1, act="relu")
        b.mark_output(x)
        return b.build()

    feed = {"x": rng.normal(size=(2, 16, 16, 8)).astype(np.float32)}

    def dw_int8_widths(qdw):
        g = build()
        optimize(g, quant=QuantConfig(quant_depthwise=qdw),
                 calib_batches=[feed])
        return sorted(
            g.vars[op.input("Input")].shape[3]
            for op in g.ops
            if op.op_type == "depthwise_conv2d"
            and op.attrs.get("enable_int8"))

    assert dw_int8_widths(True) == [16, 64]
    assert dw_int8_widths(False) == []
    assert dw_int8_widths(16) == [16]
    assert dw_int8_widths(32) == [16]
    assert dw_int8_widths(64) == [16, 64]


def test_dw_pw_fuse_width_gate(rng):
    """dw_pw_fuse only fuses lane-starved blocks (C <= _FUSE_MAX_C)."""
    from paddle_lite_tpu.core.builder import GraphBuilder
    from paddle_lite_tpu.ops import fused as fused_mod
    from paddle_lite_tpu.quant.quantize_pass import QuantConfig
    from paddle_lite_tpu.tools.opt import optimize

    def build():
        b = GraphBuilder("m", seed=4)
        x = b.input("x", (2, 16, 16, 32))
        x = b.conv_bn_act(x, 32, 3, padding=1, depthwise=True, act="relu")
        x = b.conv_bn_act(x, 64, 1, act="relu")      # fusable, C=32
        x = b.conv_bn_act(x, 256, 1, act="relu")
        x = b.conv_bn_act(x, 256, 3, padding=1, depthwise=True, act="relu")
        x = b.conv_bn_act(x, 256, 1, act="relu")     # C=256: above the gate
        b.mark_output(x)
        return b.build()

    feed = {"x": rng.normal(size=(2, 16, 16, 32)).astype(np.float32)}
    old = fused_mod._FUSE_MAX_C
    try:
        fused_mod._FUSE_MAX_C = 128
        g = build()
        optimize(g, quant=QuantConfig(fuse_dw_pw=True), calib_batches=[feed])
        fused = [op for op in g.ops if op.op_type == "fused_dw_pw"]
        assert len(fused) == 1
        assert g.vars[fused[0].input("Input")].shape[3] == 32
    finally:
        fused_mod._FUSE_MAX_C = old


def test_conv1x1_dot_matches_conv_form(rng):
    """QuantConfig.conv1x1_dot lowers int8 1x1 convs as reshape+dot; the
    whole-model outputs must match the conv form exactly (same int32
    accumulation, same epilogue)."""
    from paddle_lite_tpu.core.executor import build_callable, stage_weights
    from paddle_lite_tpu.models import mobilenet_v1
    from paddle_lite_tpu.quant.quantize_pass import QuantConfig
    from paddle_lite_tpu.tools.opt import optimize

    feed = {"image": rng.normal(size=(2, 64, 64, 3)).astype(np.float32)}

    def run(dot):
        g = mobilenet_v1.build(batch=2, image_size=64, seed=0)
        optimize(g, quant=QuantConfig(conv1x1_dot=dot),
                 calib_batches=[feed])
        if dot:
            assert any(op.attrs.get("conv1x1_dot") for op in g.ops)
        return np.asarray(
            build_callable(g)(stage_weights(g), feed)[g.outputs[0]])

    a, b = run(False), run(True)
    np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-5)


# ---------------------------------------------------------------------------
# ADVICE r4: gru origin_mode must refuse loudly, not import wrong math
# ---------------------------------------------------------------------------

def test_fluid_gru_origin_mode_refused():
    from paddle_lite_tpu.formats.fluid import load_fluid_dir
    from paddle_lite_tpu.formats.fluid_convert import (FluidFormatError,
                                                       fluid_to_graph)

    fixture = os.path.join(os.path.dirname(__file__), "fixtures",
                           "crnn_fluid")
    prog, params = load_fluid_dir(fixture)
    grus = [op for op in prog.blocks[0].ops if op.type == "gru"]
    assert grus, "fixture lost its gru ops"
    for op in grus:
        op.attrs["origin_mode"] = True
    with pytest.raises(FluidFormatError, match="origin_mode"):
        fluid_to_graph(prog, params, batch=2)


# ---------------------------------------------------------------------------
# ADVICE r4: deconv_pack must not kron-rewrite a padded 1x1 sink conv
# ---------------------------------------------------------------------------

def test_deconv_pack_skips_padded_1x1_sink(rng):
    from paddle_lite_tpu.core.builder import GraphBuilder
    from paddle_lite_tpu.core.executor import build_callable, stage_weights
    from paddle_lite_tpu.core.pass_manager import PassManager

    def head(pad):
        b = GraphBuilder("m", seed=11)
        x = b.input("x", (2, 8, 8, 12))
        w = b.rand_weight("up.w", (2, 2, 12, 6))
        y = b.op("conv2d_transpose", {"Input": [x], "Filter": [w]},
                 attrs={"strides": [2, 2]}, shape_args=[x, w],
                 out_slots=("Output",))[0]
        w2 = b.rand_weight("pw.w", (1, 1, 6, 4))
        y = b.op("conv2d", {"Input": [y], "Filter": [w2]},
                 attrs={"strides": [1, 1], "paddings": [pad, pad],
                        "dilations": [1, 1], "groups": 1},
                 shape_args=[y, w2], out_slots=("Output",))[0]
        b.mark_output(y)
        return b.build()

    feed = {"x": rng.normal(size=(2, 8, 8, 12)).astype(np.float32)}

    # padded sink: the deconv still packs, but the conv must stay outside
    # the packed domain (spatial padding does not commute with the packing)
    g_ref, g_pk = head(1), head(1)
    PassManager(["deconv_pack"]).run(g_pk)
    types = [op.op_type for op in g_pk.ops]
    assert "conv2d_transpose" not in types
    assert "pixel_shuffle" in types
    # the padded 1x1 sink keeps its original (un-kroned) filter
    assert g_pk.weights["pw.w"].shape == (1, 1, 6, 4), \
        "padded 1x1 conv was pulled into the pack"
    a = np.asarray(build_callable(g_ref)(stage_weights(g_ref), feed)[
        g_ref.outputs[0]])
    bb = np.asarray(build_callable(g_pk)(stage_weights(g_pk), feed)[
        g_pk.outputs[0]])
    np.testing.assert_allclose(a, bb, rtol=1e-5, atol=1e-5)

    # unpadded sink still packs (regression guard for the guard): the
    # filter is kron-expanded into the packed domain
    g0 = head(0)
    PassManager(["deconv_pack"]).run(g0)
    assert g0.weights["pw.w"].shape == (1, 1, 4 * 6, 4 * 4)


# ---------------------------------------------------------------------------
# ADVICE r4: xla NMS kernel must handle the bucket* tier strings explicitly
# ---------------------------------------------------------------------------

def test_multiclass_nms_pallas_background_matches_xla(rng):
    """r5: background-class handling parity between the pallas and xla
    kernels for background at the front, middle, and end of the class
    axis, and background never appears in the output.  (A pre-NMS
    background SKIP was tried and reverted — the lane-padded class-axis
    slice cost more than the saved quadratic work; see detection.py.)"""
    from paddle_lite_tpu.core.executor import ExecutionContext
    from paddle_lite_tpu.ops.detection import (multiclass_nms_pallas,
                                               multiclass_nms_xla)

    class Op:
        op_type = "multiclass_nms"

        def __init__(self, **attrs):
            self.attrs = {"score_threshold": 0.01, "nms_top_k": 40,
                          "nms_threshold": 0.45, "keep_top_k": 20, **attrs}

        def input(self, s):
            return s

    N, M, C = 2, 120, 6
    centers = rng.uniform(0.1, 0.9, (N, M, 2))
    wh = rng.uniform(0.02, 0.3, (N, M, 2))
    boxes = jnp.asarray(np.concatenate([centers - wh / 2, centers + wh / 2],
                                       -1), jnp.float32)
    scores = jnp.asarray(rng.dirichlet(np.ones(C) * 0.2, (N, M)), jnp.float32)
    ins = {"BBoxes": [boxes], "Scores": [scores]}
    ctx = ExecutionContext(graph=None, platform="cpu", interpret=True)
    for bg in (0, 2, C - 1):
        a = multiclass_nms_xla(
            ctx, Op(background_label=bg, approx_top_k=False), ins)["Out"][0]
        b = multiclass_nms_pallas(
            ctx, Op(background_label=bg, approx_top_k=False), ins)["Out"][0]
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        got_labels = set(np.asarray(b)[..., 0].ravel().tolist())
        assert float(bg) not in got_labels


def test_multiclass_nms_xla_bucket_string_falls_back_to_approx(rng):
    from paddle_lite_tpu.core.executor import ExecutionContext
    from paddle_lite_tpu.ops.detection import multiclass_nms_xla

    class Op:
        op_type = "multiclass_nms"

        def __init__(self, **attrs):
            self.attrs = {"background_label": 0, "score_threshold": 0.01,
                          "nms_top_k": 40, "nms_threshold": 0.45,
                          "keep_top_k": 20, **attrs}

        def input(self, s):
            return s

    N, M, C = 2, 160, 5
    centers = rng.uniform(0.1, 0.9, (N, M, 2))
    wh = rng.uniform(0.02, 0.3, (N, M, 2))
    boxes = jnp.asarray(np.concatenate([centers - wh / 2, centers + wh / 2],
                                       -1), jnp.float32)
    scores = jnp.asarray(rng.dirichlet(np.ones(C) * 0.2, (N, M)), jnp.float32)
    ins = {"BBoxes": [boxes], "Scores": [scores]}
    ctx = ExecutionContext(graph=None, platform="cpu", interpret=True)

    via_string = multiclass_nms_xla(
        ctx, Op(approx_top_k="bucket3", bucket_candidates=176), ins)["Out"][0]
    via_true = multiclass_nms_xla(
        ctx, Op(approx_top_k=True), ins)["Out"][0]
    np.testing.assert_array_equal(np.asarray(via_string),
                                  np.asarray(via_true))
