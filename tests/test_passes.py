"""Fusion/elimination pass tests: each pass must preserve numerics exactly
(the MIR-pass equivalent of the reference's arena precision tests)."""

import numpy as np

from paddle_lite_tpu import GraphBuilder, build_callable, stage_weights
from paddle_lite_tpu.core.pass_manager import PassManager


def _run(g, feed):
    return {
        k: np.asarray(v)
        for k, v in build_callable(g)(stage_weights(g), feed).items()
    }


def _small_cnn():
    b = GraphBuilder("cnn", seed=3)
    x = b.input("x", (2, 8, 8, 3))
    y = b.conv_bn_act(x, 8, 3, stride=1, padding=1, act="relu")
    y = b.conv_bn_act(y, 8, 3, padding=1, depthwise=True, act="relu6")
    y2 = b.conv2d(y, 8, 1)
    y = b.eltwise(y, y2, "add")  # residual
    y = b.act(y, "relu")
    y = b.pool2d(y, "avg", global_pooling=True)
    y = b.reshape(y, (2, 8))
    y = b.fc(y, 5)
    b.mark_output(y)
    return b.build(), y


def test_conv_bn_fuse_preserves_numerics(rng):
    g, out = _small_cnn()
    feed = {"x": rng.normal(size=(2, 8, 8, 3)).astype(np.float32)}
    ref = _run(g, feed)[out]
    n_ops_before = len(g.ops)
    PassManager(["conv_bn_fuse"]).run(g)
    assert len(g.ops) == n_ops_before - 2
    assert not any(op.op_type == "batch_norm" for op in g.ops)
    got = _run(g, feed)[out]
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)


def test_full_fusion_pipeline(rng):
    g, out = _small_cnn()
    feed = {"x": rng.normal(size=(2, 8, 8, 3)).astype(np.float32)}
    ref = _run(g, feed)[out]
    PassManager(
        ["identity_elimination", "conv_bn_fuse", "conv_elementwise_fuse",
         "conv_activation_fuse", "fc_fuse"]
    ).run(g)
    types = [op.op_type for op in g.ops]
    assert "batch_norm" not in types
    assert "relu" not in types and "relu6" not in types
    # residual add fused into the 1x1 conv
    assert "elementwise_add" not in types
    got = _run(g, feed)[out]
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)


def test_conv_elementwise_bias_fuse(rng):
    b = GraphBuilder("t", seed=1)
    x = b.input("x", (1, 4, 4, 3))
    y = b.conv2d(x, 6, 1)
    bias = b.weight("cb", rng.normal(size=(6,)).astype(np.float32))
    y = b.eltwise(y, bias, "add")
    b.mark_output(y)
    g = b.build()
    feed = {"x": rng.normal(size=(1, 4, 4, 3)).astype(np.float32)}
    ref = _run(g, feed)[y]
    PassManager(["conv_elementwise_fuse"]).run(g)
    assert [op.op_type for op in g.ops] == ["conv2d"]
    assert g.ops[0].maybe_input("Bias")
    got = _run(g, feed)[g.outputs[0]]
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-6)


def test_fc_fuse(rng):
    b = GraphBuilder("t", seed=2)
    x = b.input("x", (4, 16))
    w = b.weight("w", rng.normal(size=(16, 8)).astype(np.float32))
    y = b.op("mul", {"X": [x], "Y": [w]},
             attrs={"x_num_col_dims": 1, "y_num_col_dims": 1},
             shape_args=[x, w])[0]
    bias = b.weight("b0", rng.normal(size=(8,)).astype(np.float32))
    y = b.eltwise(y, bias, "add")
    b.mark_output(y)
    g = b.build()
    feed = {"x": rng.normal(size=(4, 16)).astype(np.float32)}
    ref = _run(g, feed)[y]
    PassManager(["fc_fuse"]).run(g)
    assert [op.op_type for op in g.ops] == ["fc"]
    got = _run(g, feed)[g.outputs[0]]
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-6)


def test_identity_elimination(rng):
    b = GraphBuilder("t")
    x = b.input("x", (2, 4))
    y = b.op("dropout", {"X": [x]},
             attrs={"dropout_prob": 0.5,
                    "dropout_implementation": "upscale_in_train"},
             shape_args=[x])[0]
    y = b.op("scale", {"X": [y]}, attrs={"scale": 1.0, "bias": 0.0},
             shape_args=[y])[0]
    y = b.fc(y, 3)
    b.mark_output(y)
    g = b.build()
    feed = {"x": rng.normal(size=(2, 4)).astype(np.float32)}
    ref = _run(g, feed)[y]
    PassManager(["identity_elimination"]).run(g)
    assert [op.op_type for op in g.ops] == ["fc"]
    np.testing.assert_allclose(_run(g, feed)[g.outputs[0]], ref, rtol=1e-6)


def test_parallel_fc_fuse_numeric(rng):
    """QKV fusion: three sibling fcs on one input collapse to fc+split with
    identical outputs (fp32), and the ERNIE int8 pipeline still runs."""
    import jax
    import numpy as np
    from paddle_lite_tpu.core.executor import build_callable, stage_weights
    from paddle_lite_tpu.core.pass_manager import PassManager
    from paddle_lite_tpu.models import ernie_tiny

    def build():
        return ernie_tiny.build(batch=2, seq_len=8, hidden=32, n_layers=1,
                                n_heads=2, ffn_dim=64, vocab_size=50)

    feed = {"token_ids": rng.integers(0, 50, (2, 8)).astype(np.int32),
            "segment_ids": rng.integers(0, 4, (2, 8)).astype(np.int32)}

    g_ref = build()
    PassManager(["fc_fuse"]).run(g_ref)
    ref = build_callable(g_ref)(stage_weights(g_ref), feed)

    g = build()
    PassManager(["fc_fuse", "parallel_fc_fuse"]).run(g)
    n_fc_ref = sum(1 for op in g_ref.ops if op.op_type == "fc")
    n_fc = sum(1 for op in g.ops if op.op_type == "fc")
    assert n_fc < n_fc_ref  # q/k/v merged
    assert any(op.op_type == "split" for op in g.ops)
    got = build_callable(g)(stage_weights(g), feed)
    k = g.outputs[0]
    np.testing.assert_allclose(np.asarray(got[k]), np.asarray(ref[k]),
                               rtol=1e-5, atol=1e-5)

    # full int8 pipeline on the fused graph stays runnable + accurate-ish
    from paddle_lite_tpu import QuantConfig
    from paddle_lite_tpu.tools.opt import optimize
    g8 = build()
    optimize(g8, quant=QuantConfig(), calib_batches=[feed])
    out8 = build_callable(g8)(stage_weights(g8), feed)
    a = np.asarray(out8[g8.outputs[0]]).ravel()
    b = np.asarray(ref[k]).ravel()
    cos = float((a * b).sum() / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-12))
    assert cos > 0.99


def test_dag_pattern_matcher_se_block(rng):
    """DagPattern must find the SE diamond (multi-consumer x: pool AND mul)
    that the chain matcher cannot express."""
    from paddle_lite_tpu.core.pattern_matcher import DagPattern
    from paddle_lite_tpu.models import mobilenet_v3

    g = mobilenet_v3.build(batch=1, image_size=64)
    p = DagPattern()
    p.node("pool", "pool2d",
           where=lambda op: op.attrs.get("global_pooling", False))
    p.node("fc1", "conv2d")
    p.node("relu", "relu")
    p.node("fc2", "conv2d")
    p.node("gate", "hard_sigmoid")
    p.node("mul", "elementwise_mul")
    p.edge("pool", "fc1")
    p.edge("fc1", "relu")
    p.edge("relu", "fc2")
    p.edge("fc2", "gate")
    p.edge("gate", "mul", dst_slot="Y")
    matches = p.match(g)
    # MobileNetV3-Large has 8 SE blocks
    assert len(matches) == 8
    for m in matches:
        assert m["mul"].op_type == "elementwise_mul"
        # the data operand of the mul is the pool's own input (the diamond)
        assert m["pool"].input("X") == m["mul"].input("X")


def test_dag_pattern_slot_constraint(rng):
    """dst_slot must reject edges arriving in the wrong slot."""
    from paddle_lite_tpu.core.pattern_matcher import DagPattern
    from paddle_lite_tpu import GraphBuilder

    b = GraphBuilder("m")
    x = b.input("x", (1, 4))
    y = b.act(x, "sigmoid")
    z = b.eltwise(y, x, "mul")  # sigmoid output arrives in slot X
    b.mark_output(z)
    g = b.build()

    p = DagPattern()
    p.node("s", "sigmoid")
    p.node("m", "elementwise_mul")
    p.edge("s", "m", dst_slot="Y")
    assert p.match(g) == []
    p2 = DagPattern()
    p2.node("s", "sigmoid")
    p2.node("m", "elementwise_mul")
    p2.edge("s", "m", dst_slot="X")
    assert len(p2.match(g)) == 1


def test_deconv_pack_exact_and_structural(rng):
    """deconv_pack (spatial-in-lanes head packing): bit-exact rewrite of
    the DBNet-style 2x2s2 deconv chain, ending in ONE pixel_shuffle; the
    whole head runs at the pre-upsample resolution."""
    import numpy as np

    from paddle_lite_tpu.core.executor import build_callable, stage_weights
    from paddle_lite_tpu.core.pass_manager import PassManager
    from paddle_lite_tpu.models.ppocr import build_det

    g_ref = build_det(batch=1, image_size=64, seed=5)
    g_pk = build_det(batch=1, image_size=64, seed=5)
    PassManager(["deconv_pack"]).run(g_pk)

    types = [op.op_type for op in g_pk.ops]
    assert "conv2d_transpose" not in types       # both deconvs rewritten
    assert types.count("pixel_shuffle") == 1     # one unpack at the end
    ps = next(op for op in g_pk.ops if op.op_type == "pixel_shuffle")
    assert ps.attrs["upscale_factor"] == 4       # composed 2x2 -> block 4
    # the packed var before the unpack sits at 1/4 resolution, 16 lanes
    packed = g_pk.vars[ps.input("X")]
    out = g_pk.vars[ps.output("Out")]
    assert packed.shape[1] * 4 == out.shape[1]
    assert packed.shape[3] == 16 * out.shape[3]

    x = {"image": rng.normal(size=(1, 64, 64, 3)).astype(np.float32)}
    r_ref = build_callable(g_ref)(stage_weights(g_ref), x)
    r_pk = build_callable(g_pk)(stage_weights(g_pk), x)
    a = np.asarray(r_ref[g_ref.outputs[0]])
    b = np.asarray(r_pk[g_pk.outputs[0]])
    assert a.shape == b.shape
    np.testing.assert_array_equal(a, b)          # exact, not approximate


def test_deconv_pack_single_stage_with_bias_and_eligibility(rng):
    """Single 2x2s2 deconv with bias + trailing sigmoid packs to
    conv1x1 + pixel_shuffle(2); a 3x3s2 deconv (overlapping) and a
    wide-channel deconv (lanes already full) are left alone."""
    import numpy as np

    from paddle_lite_tpu.core.builder import GraphBuilder
    from paddle_lite_tpu.core.executor import build_callable, stage_weights
    from paddle_lite_tpu.core.pass_manager import PassManager

    def head(kernel, out_c, bias):
        b = GraphBuilder("m", seed=9)
        x = b.input("x", (2, 8, 8, 12))
        w = b.rand_weight("up.w", (kernel, kernel, 12, out_c))
        ins = {"Input": [x], "Filter": [w]}
        if bias:
            # deterministic: the shared rng fixture would give ref/packed
            # graphs different biases
            ins["Bias"] = [b.weight("up.b",
                                    (0.1 * np.arange(out_c)).astype(np.float32))]
        y = b.op("conv2d_transpose", ins,
                 attrs={"strides": [2, 2]}, shape_args=[x, w],
                 out_slots=("Output",))[0]
        y = b.act(y, "sigmoid")
        b.mark_output(y)
        return b.build()

    feed = {"x": rng.normal(size=(2, 8, 8, 12)).astype(np.float32)}

    # eligible: k=2, small channels, bias present
    g_ref, g_pk = head(2, 6, True), head(2, 6, True)
    PassManager(["deconv_pack"]).run(g_pk)
    types = [op.op_type for op in g_pk.ops]
    assert "conv2d_transpose" not in types and types.count("pixel_shuffle") == 1
    a = np.asarray(build_callable(g_ref)(stage_weights(g_ref), feed)[
        g_ref.outputs[0]])
    bb = np.asarray(build_callable(g_pk)(stage_weights(g_pk), feed)[
        g_pk.outputs[0]])
    np.testing.assert_array_equal(a, bb)

    # ineligible: overlapping kernel (k=3, s=2)
    g3 = head(3, 6, False)
    PassManager(["deconv_pack"]).run(g3)
    assert "conv2d_transpose" in [op.op_type for op in g3.ops]

    # ineligible: 4*oc > 128 (lanes already full — packing buys nothing)
    gw = head(2, 64, False)
    PassManager(["deconv_pack"]).run(gw)
    assert "conv2d_transpose" in [op.op_type for op in gw.ops]
