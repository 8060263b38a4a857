"""Eval-harness tests: the top1-delta contract machinery on a model whose
int8 must agree with its own fp32."""

import numpy as np

from paddle_lite_tpu import GraphBuilder, QuantConfig
from paddle_lite_tpu.runtime.predictor import Predictor, create_predictor
from paddle_lite_tpu.tools.eval import evaluate, synthetic_dataset, top1_delta


def _model():
    b = GraphBuilder("m", seed=101)
    x = b.input("x", (4, 8, 8, 8))
    y = b.conv_bn_act(x, 16, 3, padding=1, act="relu")
    y = b.pool2d(y, "avg", global_pooling=True)
    y = b.reshape(y, (4, 16))
    y = b.fc(y, 10)
    b.mark_output(y)
    return b.build()


def test_evaluate_counts(rng):
    pred = Predictor(_model())
    data = list(synthetic_dataset("x", (4, 8, 8, 8), 10, batches=3))
    res = evaluate(pred, data)
    assert res.n == 12
    assert 0.0 <= res.top1 <= res.top5 <= 1.0


def test_top1_delta_int8_vs_fp32(rng):
    data = list(synthetic_dataset("x", (4, 8, 8, 8), 10, batches=3))
    fp32 = Predictor(_model())
    int8 = create_predictor(
        _model(), quant=QuantConfig(),
        calib_batches=[inputs for inputs, _ in data[:2]],
    )
    out = top1_delta(fp32, int8, data)
    # random-weight logits are nearly tied, so argmax flips on quantization
    # noise — the machinery check is that agreement is high and the deltas
    # are bounded (real-data accuracy gates live with the importer tests)
    assert out["prediction_agreement"] >= 0.7, out
    assert abs(out["top1_delta"]) <= 0.35, out
    assert out["n"] == 12


def test_latency_report_smoke(rng):
    """Prefix-differencing profiler runs and attributes every op (timings on
    the CPU backend are meaningless; the structure is what's under test)."""
    from paddle_lite_tpu.tools.profile import latency_report

    b = GraphBuilder("m", seed=103)
    x = b.input("x", (1, 4, 4, 4))
    y = b.conv_bn_act(x, 8, 1, act="relu")
    y = b.pool2d(y, "avg", global_pooling=True)
    b.mark_output(y)
    g = b.build()
    rows = latency_report(g, {"x": np.zeros((1, 4, 4, 4), np.float32)},
                          min_window=1e-4, reps=1)
    assert len(rows) == len(g.ops)
    assert all(r["ms"] >= 0 for r in rows)
    assert [r["op"] for r in rows][:1] == ["conv2d"]
    # parts sum to the whole by construction (isotonic-fitted attribution)
    assert abs(sum(r["ms"] for r in rows)
               - rows[-1]["cum_ms_fit"]) < 1e-9


def test_isotonic_fit_and_per_type_sums():
    """PAV fit: monotone, least-squares, and its diffs telescope — the r3
    over-counting came from rectifying negative noise diffs at zero."""
    from paddle_lite_tpu.tools.profile import _isotonic_fit, per_type_summary

    xs = [1.0, 3.0, 2.0, 2.5, 5.0, 4.0]
    fit = _isotonic_fit(xs)
    assert all(b >= a - 1e-12 for a, b in zip(fit, fit[1:]))  # monotone
    assert abs(fit[-1] - max(4.5, fit[-1])) < 1e-9
    # pooled blocks average their members: [1, (3,2,2.5)->2.5, (5,4)->4.5]
    assert np.allclose(fit, [1.0, 2.5, 2.5, 2.5, 4.5, 4.5])
    # already-monotone input is unchanged
    assert _isotonic_fit([0.5, 1.0, 2.0]) == [0.5, 1.0, 2.0]
    rows = [{"op": "a", "ms": d, "cum_ms_fit": c}
            for d, c in zip(np.diff([0.0] + fit), np.cumsum(np.diff([0.0] + fit)))]
    per_type = per_type_summary(rows)
    assert abs(sum(t["ms"] for t in per_type) - fit[-1]) < 1e-9


def test_bench_model_no_zoo_config(monkeypatch):
    """zoo_config=False must bypass the RECOMMENDED table entirely: the
    QuantConfig is built purely from explicit values (plain defaults —
    e.g. ppocr_det's quant_depthwise=False must NOT leak in)."""
    from paddle_lite_tpu.quant.quantize_pass import QuantConfig
    from paddle_lite_tpu.tools import benchmark

    seen = {}

    def fake_optimize(g, quant=None, calib_batches=None):
        seen["quant"] = quant
        raise RuntimeError("stop")  # skip the actual compile/measure

    monkeypatch.setattr("paddle_lite_tpu.tools.opt.optimize", fake_optimize)
    try:
        benchmark.bench_model("ppocr_det", batch=1, image_size=64,
                              with_fp32=False, zoo_config=False)
    except RuntimeError:
        pass
    assert seen["quant"] == QuantConfig()  # plain defaults, dw quantized
    try:
        benchmark.bench_model("ppocr_det", batch=1, image_size=64,
                              with_fp32=False, zoo_config=True)
    except RuntimeError:
        pass
    assert seen["quant"].quant_depthwise is False  # RECOMMENDED applied


def test_profiler_acceptance_evidence():
    """The committed on-chip acceptance snapshot (VERDICT r3 #6): per-op
    sums from the isotonic latency_report must match the independent
    whole-model iteration-delta within 10% on the three models whose
    attribution drove r3 decisions. Regenerate with
    tools/studies/profile_validate_r4.py on the TPU."""
    import json
    import os

    path = os.path.join(os.path.dirname(__file__), "..", "docs",
                        "profile_validate_r4.json")
    rows = json.load(open(path))
    models = {r["model"] for r in rows}
    assert {"mobilenet_v3", "ssd", "ernie_tiny"} <= models
    for r in rows:
        assert 0.9 < r["sum_over_whole"] < 1.1, r
        # and the fit telescopes: per-op sum == final prefix
        assert abs(r["per_op_sum_ms"] - r["final_prefix_ms"]) < 1e-6, r
