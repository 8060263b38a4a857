"""Autotune table tests: the kernel-pick pass consults measured winners."""

import json

import numpy as np
import pytest

from paddle_lite_tpu.ops.kernels import tune_cache
from paddle_lite_tpu.ops.kernels.tune_cache import _bucket, _key


def test_bucketing_is_coarse():
    assert _bucket(128) == 128
    assert _bucket(130) == 128
    assert _bucket(200) == 192
    assert _bucket(12544) == _bucket(12800)  # same half-octave bucket


def test_kernel_pick_consults_cache(tmp_path, monkeypatch, rng):
    from paddle_lite_tpu import GraphBuilder, QuantConfig
    from paddle_lite_tpu.tools.opt import optimize

    cache = tmp_path / "gemm.json"
    monkeypatch.setenv("PLT_TPU_AUTOTUNE_CACHE", str(cache))
    tune_cache._load.cache_clear()

    def build():
        b = GraphBuilder("t", seed=51)
        x = b.input("x", (4, 8, 8, 64))
        y = b.conv_bn_act(x, 128, 1, act="relu")
        b.mark_output(y)
        g = b.build()
        optimize(g, quant=QuantConfig(), calib_batches=[
            {"x": rng.normal(size=(4, 8, 8, 64)).astype(np.float32)}
        ])
        return g

    # no cache -> conservative xla
    g = build()
    conv = next(op for op in g.ops if op.op_type == "conv2d")
    assert conv.attrs.get("kernel") == "xla"

    # measured winner 'pallas' for this shape bucket -> picked
    m, k, n = 4 * 8 * 8, 64, 128
    cache.write_text(json.dumps({_key(m, k, n): "pallas"}))
    tune_cache._load.cache_clear()
    g = build()
    conv = next(op for op in g.ops if op.op_type == "conv2d")
    assert conv.attrs.get("kernel") == "pallas"
    tune_cache._load.cache_clear()


def test_measure_gemm_interpret_smoke(tmp_path, monkeypatch):
    """measure_gemm runs end-to-end on CPU (pallas interpret) and caches."""
    cache = tmp_path / "gemm.json"
    monkeypatch.setenv("PLT_TPU_AUTOTUNE_CACHE", str(cache))
    tune_cache._load.cache_clear()
    winner = tune_cache.measure_gemm(32, 64, 32, iters=2)
    assert winner in ("pallas", "xla")
    assert json.loads(cache.read_text())
    tune_cache._load.cache_clear()
