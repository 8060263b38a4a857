"""Model-zoo build + int8 pipeline smoke tests (integration tier 3 analog —
without pretrained weights the golden-value checks become int8-vs-fp32
agreement, see test_quantization for the strict gates)."""

import numpy as np
import pytest

from paddle_lite_tpu import QuantConfig, build_callable, stage_weights
from paddle_lite_tpu.tools.opt import optimize


def _run(g, feed):
    return {k: np.asarray(v)
            for k, v in build_callable(g)(stage_weights(g), feed).items()}


def test_resnet50_structure():
    from paddle_lite_tpu.models import resnet

    g = resnet.build(batch=1, image_size=64, num_classes=10)
    types = [op.op_type for op in g.ops]
    assert types.count("conv2d") == 53  # 1 stem + 16*3 bottleneck + 4 proj
    assert "elementwise_add" in types


def test_resnet50_int8_pipeline(rng):
    from paddle_lite_tpu.models import resnet

    g = resnet.build(batch=2, image_size=32, num_classes=10, seed=3)
    feed = {"image": rng.normal(size=(2, 32, 32, 3)).astype(np.float32)}
    ref = _run(g, feed)[g.outputs[0]]
    optimize(g, quant=QuantConfig(), calib_batches=[
        {"image": rng.normal(size=(2, 32, 32, 3)).astype(np.float32)}
    ])
    types = [op.op_type for op in g.ops]
    # every residual add fused into its expansion conv
    assert "elementwise_add" not in types
    assert "batch_norm" not in types
    got = _run(g, feed)[g.outputs[0]]
    cos = np.sum(got * ref) / (np.linalg.norm(got) * np.linalg.norm(ref) + 1e-12)
    assert cos > 0.98, cos


def test_zoo_recommended_quant():
    """The zoo config registry returns measured per-model QuantConfigs
    (docs/dbnet_dw_r3.json backs DBNet's dw=float; bench_rows_r3.jsonl
    backs the island choices); explicit overrides win; unknown models get
    plain defaults."""
    from paddle_lite_tpu.models.zoo_config import recommended_quant
    from paddle_lite_tpu.quant.quantize_pass import QuantConfig

    q = recommended_quant("ppocr_det")
    assert q.island_dtype == "float32" and q.quant_depthwise is False
    assert recommended_quant("mobilenet_v1") == QuantConfig()
    assert recommended_quant("ernie_tiny").island_dtype == "bfloat16"
    over = recommended_quant("ppocr_det", island_dtype="bfloat16")
    assert over.island_dtype == "bfloat16" and over.quant_depthwise is False
    assert recommended_quant("nonexistent_model") == QuantConfig()
