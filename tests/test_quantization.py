"""End-to-end PTQ int8 tests — the M1 milestone gate.

Without network access there are no pretrained ImageNet weights, so the
accuracy contract is measured as int8-vs-fp32 *agreement* on random-weight
models (top-1 match rate + output error), the strictest proxy available;
absolute top-1 deltas on real checkpoints use the same machinery via the
weight importer (``paddle_lite_tpu.formats.importer``).
"""

import numpy as np
import pytest

from paddle_lite_tpu import (
    CalibMethod,
    GraphBuilder,
    QuantConfig,
    build_callable,
    stage_weights,
)
from paddle_lite_tpu.core.types import Precision
from paddle_lite_tpu.models import mobilenet_v1
from paddle_lite_tpu.tools.opt import optimize


def _run(g, feed):
    return {
        k: np.asarray(v)
        for k, v in build_callable(g)(stage_weights(g), feed).items()
    }


def _calib_batches(rng, shape, n=4):
    return [{"x": rng.normal(size=shape).astype(np.float32)} for _ in range(n)]


def test_weight_per_channel_roundtrip(rng):
    from paddle_lite_tpu.quant.quantize_pass import quantize_weight_per_channel

    w = rng.normal(size=(3, 3, 8, 16)).astype(np.float32)
    q, scale = quantize_weight_per_channel(w, axis=3)
    assert q.dtype == np.int8 and scale.shape == (16,)
    deq = q.astype(np.float32) * scale.reshape(1, 1, 1, -1)
    # max error is half a quantum per channel
    err = np.abs(deq - w).max(axis=(0, 1, 2))
    assert np.all(err <= scale * 0.5 + 1e-7)


def test_small_cnn_int8_pipeline(rng):
    b = GraphBuilder("cnn", seed=5)
    x = b.input("x", (4, 16, 16, 3))
    y = b.conv_bn_act(x, 16, 3, stride=2, padding=1, act="relu")
    y = b.conv_bn_act(y, 16, 3, padding=1, depthwise=True, act="relu")
    y = b.conv_bn_act(y, 32, 1, act="relu")
    y = b.pool2d(y, "avg", global_pooling=True)
    y = b.reshape(y, (4, 32))
    out = b.fc(y, 10)
    b.mark_output(out)
    g = b.build()

    feed = {"x": rng.normal(size=(4, 16, 16, 3)).astype(np.float32)}
    ref = _run(g, feed)[out]

    optimize(g, quant=QuantConfig(), calib_batches=_calib_batches(rng, (4, 16, 16, 3)))

    # structural checks: int8 weights, quantize node at the graph entry,
    # int8 carried between conv ops
    conv_ops = [op for op in g.ops if op.op_type in ("conv2d", "depthwise_conv2d")]
    # stem conv (3-channel graph input) stays FLOAT by design — measured
    # 1.56x faster than an int8 stem (QuantConfig.skip_stem_conv); every
    # other conv runs int8 with int8 carried between them
    stem, rest = conv_ops[0], conv_ops[1:]
    assert not stem.attrs.get("enable_int8")
    assert g.weights[stem.input("Filter")].dtype == np.float32
    assert all(op.attrs.get("enable_int8") for op in rest)
    assert all(
        g.weights[op.input("Filter")].dtype == np.int8 for op in rest
    )
    # the float stem itself emits int8 (fused quantize epilogue via
    # out_scale) — no standalone quantize node needed anywhere
    assert stem.attrs.get("out_scale") is not None
    assert not any(op.op_type == "quantize" for op in g.ops)
    inter_conv = [op.attrs.get("out_scale") for op in rest[:-1]]
    assert all(s is not None for s in inter_conv), "conv chain should stay int8"

    got = _run(g, feed)[out]
    rel = np.abs(got - ref).max() / (np.abs(ref).max() + 1e-9)
    assert rel < 0.12, f"int8 output error too large: {rel}"
    assert (got.argmax(-1) == ref.argmax(-1)).mean() >= 0.75


@pytest.mark.parametrize("method", [CalibMethod.ABS_MAX, CalibMethod.PERCENTILE])
def test_mobilenet_v1_int8_agreement(method, rng):
    """The M1 gate: MobileNetV1 int8 top-1 agreement vs its own fp32."""
    g = mobilenet_v1.build(batch=4, image_size=64, num_classes=100, seed=7)
    feed = {"image": rng.normal(size=(4, 64, 64, 3)).astype(np.float32)}
    ref = _run(g, feed)
    ref_logits = ref[g.outputs[0]]

    optimize(
        g,
        quant=QuantConfig(method=method),
        calib_batches=[
            {"image": rng.normal(size=(4, 64, 64, 3)).astype(np.float32)}
            for _ in range(3)
        ],
    )
    got = _run(g, feed)[g.outputs[0]]

    # top-1 agreement on every sample + close probability vectors
    assert (got.argmax(-1) == ref_logits.argmax(-1)).mean() >= 0.75
    cos = np.sum(got * ref_logits) / (
        np.linalg.norm(got) * np.linalg.norm(ref_logits) + 1e-12
    )
    assert cos > 0.99, f"cosine {cos}"


def test_precision_cast_inserts_single_quantize(rng):
    """One shared quantize per var (calib_once semantics)."""
    b = GraphBuilder("t", seed=9)
    x = b.input("x", (2, 8, 8, 8))  # >4 channels: not a stem (stems stay fp)
    y1 = b.conv2d(x, 8, 1)
    y2 = b.conv2d(x, 8, 1)
    out = b.eltwise(y1, y2, "add")
    b.mark_output(out)
    g = b.build()
    optimize(g, quant=QuantConfig(),
             calib_batches=_calib_batches(rng, (2, 8, 8, 8), n=2))
    quants = [op for op in g.ops if op.op_type == "quantize"]
    assert len(quants) == 1  # both convs share the one quantized input


def test_entropy_observer_reasonable():
    from paddle_lite_tpu.quant.observers import EntropyObserver

    rng = np.random.default_rng(0)
    obs = EntropyObserver(bins=512)
    x = rng.normal(0, 1.0, size=50000)
    x[:5] = 40.0  # outliers that abs-max would follow
    amax = np.abs(x).max()
    obs.update_absmax(amax)
    hist, _ = np.histogram(np.abs(x), bins=512, range=(0, amax))
    obs.update_histogram(hist, amax)
    s = obs.scale()
    assert s * 127.0 < 20.0, "entropy calibration should clip the outliers"


def test_bf16_island_dtype(rng):
    """island_dtype='bfloat16': fp regions run bf16, public I/O stays fp32,
    accuracy within int8 tolerance, artifact round-trips the meta flag."""
    import jax.numpy as jnp

    from paddle_lite_tpu import QuantConfig
    from paddle_lite_tpu.core.executor import build_callable, stage_weights
    from paddle_lite_tpu.models import ernie_tiny
    from paddle_lite_tpu.tools.opt import optimize

    def build():
        return ernie_tiny.build(batch=2, seq_len=8, hidden=32, n_layers=1,
                                n_heads=2, ffn_dim=64, vocab_size=50)

    feed = {"token_ids": rng.integers(0, 50, (2, 8)).astype(np.int32),
            "segment_ids": rng.integers(0, 4, (2, 8)).astype(np.int32)}
    g32 = build()
    ref = build_callable(g32)(stage_weights(g32), feed)

    g = build()
    optimize(g, quant=QuantConfig(island_dtype="bfloat16"),
             calib_batches=[feed])
    assert g.meta["island_dtype"] == "bfloat16"
    w = stage_weights(g)
    assert any(np.asarray(v).dtype == jnp.bfloat16 for v in w.values())
    got = build_callable(g)(w, feed)
    k = g.outputs[0]
    out = np.asarray(got[k])
    assert out.dtype == np.float32  # public contract
    a, b = out.ravel(), np.asarray(ref[k]).ravel()
    cos = (a * b).sum() / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-12)
    assert cos > 0.995

    from paddle_lite_tpu.formats.artifact import graph_from_meta, graph_to_meta
    g2 = graph_from_meta(graph_to_meta(g))
    assert g2.meta["island_dtype"] == "bfloat16"


def test_kl_calibration_not_default_and_warns(rng):
    """Pin: abs_max is the default calibration; KL/entropy stays available
    (PaddleSlim parity) but warns — it measurably degrades accuracy on the
    measured zoo models (docs/ACCURACY.md)."""
    import warnings

    from paddle_lite_tpu import GraphBuilder, QuantConfig
    from paddle_lite_tpu.core.types import CalibMethod
    from paddle_lite_tpu.tools.opt import optimize

    assert QuantConfig().method is CalibMethod.ABS_MAX

    def build():
        b = GraphBuilder("t", seed=3)
        x = b.input("x", (2, 8, 8, 16))
        y = b.conv_bn_act(x, 32, 1, act="relu")
        b.mark_output(y)
        return b.build()

    feed = {"x": rng.normal(size=(2, 8, 8, 16)).astype(np.float32)}
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        optimize(build(), quant=QuantConfig(method=CalibMethod.ENTROPY),
                 calib_batches=[feed])
    assert any("ENTROPY" in str(w.message) for w in caught)

    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        optimize(build(), quant=QuantConfig(), calib_batches=[feed])
    assert not any("ENTROPY" in str(w.message) for w in caught)
