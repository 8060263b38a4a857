"""Int8 PTQ across the full BASELINE model zoo (configs #3/#4/#5) — the
mixed-precision cases: SE blocks, detection heads, GRU recurrences, and
activation×activation attention matmuls."""

import numpy as np
import pytest

from paddle_lite_tpu import QuantConfig, build_callable, stage_weights
from paddle_lite_tpu.tools.opt import optimize


def _run(g, feed):
    return {k: np.asarray(v)
            for k, v in build_callable(g)(stage_weights(g), feed).items()}


def _cos(a, b):
    return np.sum(a * b) / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-12)


def test_mobilenet_v3_int8(rng):
    from paddle_lite_tpu.models import mobilenet_v3

    # compare logits (softmax amplifies int8 noise exponentially)
    g = mobilenet_v3.build(batch=2, image_size=64, num_classes=50, seed=5,
                           with_softmax=False)
    feed = {"image": rng.normal(size=(2, 64, 64, 3)).astype(np.float32)}
    ref = _run(g, feed)[g.outputs[0]]
    optimize(g, quant=QuantConfig(), calib_batches=[
        {"image": rng.normal(size=(2, 64, 64, 3)).astype(np.float32)}
        for _ in range(2)
    ])
    n_int8 = sum(1 for op in g.ops if op.attrs.get("enable_int8"))
    assert n_int8 >= 40, n_int8
    got = _run(g, feed)[g.outputs[0]]
    # MNv3 (hard_swish + SE) quantizes noisier than V1 — regression canary
    # thresholds, not an accuracy claim (that needs real weights)
    assert _cos(got, ref) > 0.96
    # top-1 must agree wherever the fp32 decision has real margin; random
    # 50-class logits have near-ties that flip on legitimate quant noise
    sorted_ref = np.sort(ref, axis=-1)
    margin = sorted_ref[:, -1] - sorted_ref[:, -2]
    decisive = margin > 0.1 * np.abs(ref).max()
    agree = got.argmax(-1) == ref.argmax(-1)
    assert agree[decisive].all(), (margin, agree)


def test_ssd_int8_runs(rng):
    from paddle_lite_tpu.models import ssd

    g = ssd.build(batch=1, image_size=300, num_classes=5, seed=6)
    feed = {"image": rng.normal(size=(1, 300, 300, 3)).astype(np.float32)}
    ref = _run(g, feed)[g.outputs[0]]
    optimize(g, quant=QuantConfig(), calib_batches=[feed])
    assert sum(1 for op in g.ops if op.attrs.get("enable_int8")) >= 30
    got = _run(g, feed)[g.outputs[0]]
    assert got.shape == ref.shape == (1, 100, 6)
    # detection head quantization keeps the same top boxes ordering loosely:
    # compare top-5 decoded box coordinates
    np.testing.assert_allclose(got[0, :5, 2:], ref[0, :5, 2:], atol=25.0)


def test_ernie_tiny_int8_attention_quantized(rng):
    from paddle_lite_tpu.models import ernie_tiny

    g = ernie_tiny.build(batch=2, seq_len=16, vocab_size=500, hidden=64,
                         n_layers=2, n_heads=4, ffn_dim=128, seed=7)
    feed = {
        "token_ids": rng.integers(0, 500, (2, 16)).astype(np.int32),
        "segment_ids": np.zeros((2, 16), np.int32),
    }
    ref = _run(g, feed)[g.outputs[0]]
    # act-act quant is off by default (measured slower on-chip); this test
    # exercises the capability explicitly
    optimize(g, quant=QuantConfig(quant_act_act_matmul=True), calib_batches=[
        {"token_ids": rng.integers(0, 500, (2, 16)).astype(np.int32),
         "segment_ids": np.zeros((2, 16), np.int32)}
    ])
    # the _dense mul+bias pairs fuse into fc ops before quantization
    int8_fcs = [op for op in g.ops
                if op.op_type == "fc" and op.attrs.get("enable_int8")]
    int8_matmuls = [op for op in g.ops
                    if op.op_type == "matmul" and op.attrs.get("enable_int8")]
    # per layer after parallel_fc_fuse: fused-qkv + out + 2 ffn = 4 fcs
    assert len(int8_fcs) >= 8
    assert any(op.op_type == "split" for op in g.ops)  # qkv split present
    assert len(int8_matmuls) >= 4  # act x act QK + PV per layer
    got = _run(g, feed)[g.outputs[0]]
    # binary classifier probabilities close
    np.testing.assert_allclose(got, ref, atol=0.06)


def test_ppocr_det_int8(rng):
    from paddle_lite_tpu.models import ppocr

    g = ppocr.build_det(batch=1, image_size=64, seed=8)
    feed = {"image": rng.normal(size=(1, 64, 64, 3)).astype(np.float32)}
    ref = _run(g, feed)[g.outputs[0]]
    optimize(g, quant=QuantConfig(), calib_batches=[feed])
    got = _run(g, feed)[g.outputs[0]]
    assert got.shape == ref.shape
    # probability maps stay close (sigmoid output, atol on [0,1] scale)
    assert np.abs(got - ref).mean() < 0.05


def test_ppocr_rec_int8(rng):
    from paddle_lite_tpu.models import ppocr

    g = ppocr.build_rec(batch=2, width=64, num_chars=50, seed=9)
    feed = {"image": rng.normal(size=(2, 32, 64, 3)).astype(np.float32)}
    ref = _run(g, feed)
    optimize(g, quant=QuantConfig(), calib_batches=[feed])
    # GRU input projections (mul) + ctc fc quantize; recurrence stays fp
    int8_muls = [op for op in g.ops
                 if op.op_type == "mul" and op.attrs.get("enable_int8")]
    assert len(int8_muls) >= 4
    got = _run(g, feed)
    probs_ref = ref[g.outputs[0]]
    probs_got = got[g.outputs[0]]
    assert _cos(probs_got, probs_ref) > 0.99
    # decoded strings identical on most positions
    dec_ref, dec_got = ref[g.outputs[1]], got[g.outputs[1]]
    assert (dec_ref == dec_got).mean() > 0.9
