"""Pallas kernel tests vs jnp references (the reference's tier-1 math tests:
``lite/tests/math/gemm_int8_compute_test.cc`` pattern — shape sweep, compare
against a naive int8 ground truth).  On CPU these run the Pallas interpreter
(`interpret=True`) — the mock-backend analog of the arena baseline."""

import jax.numpy as jnp
import numpy as np
import pytest

from paddle_lite_tpu.ops.kernels.int8_matmul import int8_matmul


def _ref(x_q, w_q, eff, bias=None, act=None, out_scale=None):
    acc = x_q.astype(np.int32) @ w_q.astype(np.int32)
    y = acc.astype(np.float32) * eff.reshape(1, -1)
    if bias is not None:
        y = y + bias.reshape(1, -1)
    if act == "relu":
        y = np.maximum(y, 0)
    elif act == "relu6":
        y = np.clip(y, 0, 6)
    if out_scale is not None:
        return np.clip(np.round(y / out_scale), -127, 127).astype(np.int8)
    return y


def _rand_problem(rng, m, k, n):
    x_q = rng.integers(-127, 128, size=(m, k), dtype=np.int8)
    w_q = rng.integers(-127, 128, size=(k, n), dtype=np.int8)
    eff = rng.uniform(1e-3, 2e-3, size=(n,)).astype(np.float32)
    bias = rng.normal(size=(n,)).astype(np.float32)
    return x_q, w_q, eff, bias


@pytest.mark.parametrize(
    "m,k,n",
    [
        (8, 32, 32),        # tiny
        (128, 128, 128),    # one tile
        (256, 512, 256),    # multi-k
        (100, 96, 60),      # ragged everything (padding path)
        (12544, 64, 128),   # mobilenet-ish 1x1 conv shape
    ],
)
def test_int8_matmul_fp32_out(m, k, n, rng):
    x_q, w_q, eff, bias = _rand_problem(rng, m, k, n)
    got = np.asarray(int8_matmul(x_q, w_q, eff, bias, interpret=True))
    ref = _ref(x_q, w_q, eff, bias)
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-4)


def test_int8_matmul_relu_and_requant(rng):
    m, k, n = 64, 128, 96
    x_q, w_q, eff, bias = _rand_problem(rng, m, k, n)
    out_scale = 0.05
    got = np.asarray(
        int8_matmul(x_q, w_q, eff, bias, act="relu", out_scale=out_scale,
                    interpret=True)
    )
    ref = _ref(x_q, w_q, eff, bias, act="relu", out_scale=out_scale)
    assert got.dtype == np.int8
    # int8 requant: allow ±1 quantum on ties (round-to-even vs away-from-0)
    assert np.abs(got.astype(np.int32) - ref.astype(np.int32)).max() <= 1
    assert (got != ref).mean() < 0.02


def test_int8_matmul_no_bias(rng):
    x_q, w_q, eff, _ = _rand_problem(rng, 32, 64, 32)
    got = np.asarray(int8_matmul(x_q, w_q, eff, None, interpret=True))
    np.testing.assert_allclose(got, _ref(x_q, w_q, eff), rtol=1e-5, atol=1e-4)


def test_graph_level_pallas_matches_xla(rng):
    """Same optimized int8 graph run with pallas kernels vs pure XLA."""
    import numpy as np

    from paddle_lite_tpu import (GraphBuilder, QuantConfig, build_callable,
                                 stage_weights)
    from paddle_lite_tpu.tools.opt import optimize

    b = GraphBuilder("t", seed=11)
    x = b.input("x", (2, 8, 8, 32))
    y = b.conv_bn_act(x, 64, 1, act="relu")
    y = b.conv_bn_act(y, 64, 1, act="relu")
    y = b.pool2d(y, "avg", global_pooling=True)
    y = b.reshape(y, (2, 64))
    out = b.fc(y, 32)
    b.mark_output(out)
    g = b.build()
    optimize(g, quant=QuantConfig(), calib_batches=[
        {"x": rng.normal(size=(2, 8, 8, 32)).astype(np.float32)}
    ])
    # force the pallas impls (kernel_pick defaults to xla until the
    # on-device autotune cache has measurements — see autotune.choose_kernel)
    n_forced = 0
    for op in g.ops:
        if op.op_type in ("conv2d", "fc") and op.attrs.get("enable_int8"):
            op.attrs["kernel"] = "pallas"
            n_forced += 1
    assert n_forced >= 3

    feed = {"x": rng.normal(size=(2, 8, 8, 32)).astype(np.float32)}
    w = stage_weights(g)
    got_pallas = np.asarray(build_callable(g)(w, feed)[g.outputs[0]])
    for op in g.ops:
        op.attrs.pop("kernel", None)  # force default XLA impls
    got_xla = np.asarray(build_callable(g)(w, feed)[g.outputs[0]])
    # identical int8 arithmetic up to rounding-mode ties in the requant
    np.testing.assert_allclose(got_pallas, got_xla, rtol=1e-3, atol=1e-2)


def _dw_ref(x_q, w_q, eff, bias, act=None, out_scale=None):
    import jax
    import jax.numpy as jnp

    acc = jax.lax.conv_general_dilated(
        jnp.asarray(x_q), jnp.asarray(w_q), (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=x_q.shape[-1],
        preferred_element_type=jnp.int32)
    y = np.asarray(acc).astype(np.float32) * eff.reshape(1, 1, 1, -1)
    y = y + bias.reshape(1, 1, 1, -1)
    if act == "relu":
        y = np.maximum(y, 0)
    if out_scale is not None:
        return np.clip(np.round(y / out_scale), -127, 127).astype(np.int8)
    return y


@pytest.mark.parametrize("h,c", [(8, 128), (14, 64), (7, 200)])
def test_dw_pallas_kernel(h, c, rng):
    from paddle_lite_tpu.ops.kernels.depthwise import dw_conv3x3s1_int8

    x = rng.integers(-127, 128, (2, h, h, c), dtype=np.int8)
    w = rng.integers(-127, 128, (3, 3, 1, c), dtype=np.int8)
    eff = rng.uniform(1e-3, 2e-3, (c,)).astype(np.float32)
    bias = rng.normal(size=(c,)).astype(np.float32)

    got = np.asarray(dw_conv3x3s1_int8(x, w, eff, bias, interpret=True))
    ref = _dw_ref(x, w, eff, bias)
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-4)


def test_dw_pallas_requant(rng):
    from paddle_lite_tpu.ops.kernels.depthwise import dw_conv3x3s1_int8

    h, c = 8, 128
    x = rng.integers(-127, 128, (1, h, h, c), dtype=np.int8)
    w = rng.integers(-10, 10, (3, 3, 1, c), dtype=np.int8)
    eff = rng.uniform(1e-3, 2e-3, (c,)).astype(np.float32)
    bias = rng.normal(size=(c,)).astype(np.float32)
    got = np.asarray(dw_conv3x3s1_int8(x, w, eff, bias, act="relu",
                                       out_scale=0.05, interpret=True))
    ref = _dw_ref(x, w, eff, bias, act="relu", out_scale=0.05)
    assert got.dtype == np.int8
    assert np.abs(got.astype(np.int32) - ref.astype(np.int32)).max() <= 1


def test_dw_general_kernel_matches_xla(rng):
    """Generalized depthwise kernel (k in {3,5}, stride in {1,2}; stride-2
    via polyphase decomposition) vs the XLA lowering, interpret mode."""
    import jax
    import jax.numpy as jnp

    from paddle_lite_tpu.ops.kernels.depthwise import (dw_conv_int8,
                                                       supported_general)

    for k, s, h, c in [(3, 1, 12, 24), (3, 2, 12, 24), (5, 1, 14, 40),
                       (5, 2, 14, 40), (3, 2, 13, 130)]:
        x = rng.integers(-127, 128, (2, h, h, c)).astype(np.int8)
        w = rng.integers(-127, 128, (k, k, 1, c)).astype(np.int8)
        eff = rng.uniform(0.001, 0.01, c).astype(np.float32)
        bias = rng.normal(0, 0.1, c).astype(np.float32)
        pad = (k - 1) // 2
        assert supported_general(
            {"strides": [s, s], "paddings": [pad, pad]}, x.shape, w.shape)
        ref = jax.lax.conv_general_dilated(
            x.astype(np.int32), w.astype(np.int32), (s, s),
            ((pad, pad), (pad, pad)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=c)
        ref = np.maximum(np.asarray(ref).astype(np.float32) * eff + bias, 0)
        got = np.asarray(dw_conv_int8(
            jnp.asarray(x), jnp.asarray(w), eff, bias, stride=s, act="relu",
            interpret=True))
        np.testing.assert_allclose(got, ref, atol=1e-3)


def test_dw_multiplier2_not_eligible():
    """CRNN's stem uses multiplier-2 depthwise (filter out-channels = 2x
    input channels); the Pallas C->C tap layout cannot express it, and
    routing it there corrupted downstream shapes (found by the round-3
    in-model tune on ppocr_rec).  Both eligibility predicates must reject
    any filter whose last dim differs from the input channel count."""
    from paddle_lite_tpu.ops.kernels.depthwise import (supported,
                                                       supported_general)

    attrs = {"strides": [1, 1], "paddings": [1, 1]}
    x_shape, w2_shape = (8, 16, 160, 32), (3, 3, 1, 64)  # multiplier 2
    assert not supported(attrs, x_shape, w2_shape)
    assert not supported_general(attrs, x_shape, w2_shape)
    assert supported(attrs, x_shape, (3, 3, 1, 32))
    assert supported_general(attrs, x_shape, (3, 3, 1, 32))


def test_nms_kernel_matches_greedy_and_xla(rng):
    """Pallas VMEM NMS core vs (a) the sequential greedy numpy reference and
    (b) the XLA Jacobi fixed point — exact keep-set + score parity."""
    import jax.numpy as jnp

    from paddle_lite_tpu.ops.detection import _nms_single_class
    from paddle_lite_tpu.ops.kernels.nms import (nms_keep_scores,
                                                 nms_reference)

    G, K = 5, 96
    centers = rng.uniform(0.1, 0.9, (G, K, 2))
    wh = rng.uniform(0.02, 0.35, (G, K, 2))
    boxes = np.concatenate([centers - wh / 2, centers + wh / 2],
                           -1).astype(np.float32)
    scores = np.sort(rng.uniform(0, 1, (G, K)).astype(np.float32))[:, ::-1]
    scores = scores.copy()
    scores[:, K // 2:] *= 0.005  # half below the score threshold

    got = np.asarray(nms_keep_scores(jnp.asarray(boxes), jnp.asarray(scores),
                                     iou_t=0.45, score_t=0.01,
                                     interpret=True))
    ref = nms_reference(boxes, scores, iou_t=0.45, score_t=0.01)
    assert ((got > 0) == (ref > 0)).all()
    np.testing.assert_allclose(got, ref, rtol=1e-6)
    for gi in range(G):
        s_xla, _, _ = _nms_single_class(jnp.asarray(boxes[gi]),
                                        jnp.asarray(scores[gi]), 0.45, 0.01,
                                        K)
        np.testing.assert_array_equal(np.asarray(s_xla), got[gi])


def test_multiclass_nms_pallas_matches_xla_op(rng):
    """Full multiclass_nms op: pallas kernel output == xla kernel output
    (both exact/approx candidate selection)."""
    import jax.numpy as jnp

    from paddle_lite_tpu.core.executor import ExecutionContext
    from paddle_lite_tpu.ops.detection import (multiclass_nms_pallas,
                                               multiclass_nms_xla)

    class Op:
        op_type = "multiclass_nms"
        attrs = {"background_label": 0, "score_threshold": 0.01,
                 "nms_top_k": 40, "nms_threshold": 0.45, "keep_top_k": 20}

        def input(self, s):
            return s

    N, M, C = 3, 160, 6
    centers = rng.uniform(0.1, 0.9, (N, M, 2))
    wh = rng.uniform(0.02, 0.3, (N, M, 2))
    boxes = jnp.asarray(np.concatenate([centers - wh / 2, centers + wh / 2],
                                       -1), jnp.float32)
    scores = jnp.asarray(rng.dirichlet(np.ones(C) * 0.2, (N, M)), jnp.float32)
    ins = {"BBoxes": [boxes], "Scores": [scores]}
    ctx = ExecutionContext(graph=None, platform="cpu", interpret=True)
    for approx in (False, True):
        Op.attrs = dict(Op.attrs, approx_top_k=approx)
        a = multiclass_nms_xla(ctx, Op(), ins)["Out"][0]
        b = multiclass_nms_pallas(ctx, Op(), ins)["Out"][0]
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_multiclass_nms_bucket2_recovers_same_bucket_pairs(rng):
    """Top-2-per-bucket candidate selection (approx_top_k='bucket2'):
    at the SAME candidate count k, bucket2 keeps two distinct detections
    whose priors share one coarse bucket — the exact failure mode of the
    top-1 bucket tier — and otherwise matches the exact tier."""
    import jax.numpy as jnp

    from paddle_lite_tpu.core.executor import ExecutionContext
    from paddle_lite_tpu.ops.detection import (multiclass_nms_pallas,
                                               multiclass_nms_xla)

    N, M, C = 1, 160, 3
    # two well-separated strong boxes at adjacent prior slots 40 and 41:
    # with bucket@32 (bs=5) they share bucket 8; with bucket2@16 (bs=10,
    # k=32 candidates too) the second max recovers the pair
    boxes = np.tile(np.array([[0.4, 0.4, 0.5, 0.5]], np.float32), (M, 1))
    boxes[40] = [0.1, 0.1, 0.3, 0.3]
    boxes[41] = [0.6, 0.6, 0.9, 0.9]
    scores = np.zeros((M, C), np.float32)
    scores[:, 0] = 0.99  # background soaks the rest
    scores[40, 1] = 0.9
    scores[41, 1] = 0.8
    ins = {"BBoxes": [jnp.asarray(boxes)[None]],
           "Scores": [jnp.asarray(scores)[None]]}
    ctx = ExecutionContext(graph=None, platform="cpu", interpret=True)

    class Op:
        op_type = "multiclass_nms"

        def __init__(self, **attrs):
            self.attrs = {"background_label": 0, "score_threshold": 0.01,
                          "nms_top_k": 64, "nms_threshold": 0.45,
                          "keep_top_k": 8, **attrs}

        def input(self, s):
            return s

    def det_set(out):
        rows = np.asarray(out)[0]
        return {(round(r[1], 4), round(r[2], 2)) for r in rows if r[0] >= 0}

    exact = det_set(multiclass_nms_xla(
        ctx, Op(approx_top_k=False), ins)["Out"][0])
    top1 = det_set(multiclass_nms_pallas(
        ctx, Op(approx_top_k="bucket", bucket_candidates=32), ins)["Out"][0])
    top2 = det_set(multiclass_nms_pallas(
        ctx, Op(approx_top_k="bucket2", bucket_candidates=16), ins)["Out"][0])
    assert len(exact) == 2
    assert top2 == exact          # pair recovered at the same k
    assert len(top1) == 1         # the top-1 tier drops one of the pair


# The bigru Pallas kernel tests were removed in r5 with the kernel itself
# (ops/kernels/gru_scan.py): two rounds of measurement found no in-model
# win at any config (docs/bigru_sweep_r4.json, docs/crnn_long_r5.json);
# bidirectional_gru always runs the XLA scan now.
