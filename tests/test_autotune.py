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


def test_validate_in_model_demotes_standalone_winner(tmp_path, monkeypatch, rng):
    """A standalone 'pallas' table win that loses in-model must be demoted
    (the BENCH_r02 -40% default-plan regression)."""
    from paddle_lite_tpu import GraphBuilder, QuantConfig
    from paddle_lite_tpu.tools.opt import optimize

    cache = tmp_path / "gemm.json"
    monkeypatch.setenv("PLT_TPU_AUTOTUNE_CACHE", str(cache))
    m, k, n = 4 * 8 * 8, 64, 128
    cache.write_text(json.dumps({_key(m, k, n): "pallas"}))
    tune_cache._load.cache_clear()

    b = GraphBuilder("t", seed=7)
    x = b.input("x", (4, 8, 8, 64))
    y = b.conv_bn_act(x, 128, 1, act="relu")
    b.mark_output(y)
    g = b.build()
    feed = {"x": rng.normal(size=(4, 8, 8, 64)).astype(np.float32)}
    optimize(g, quant=QuantConfig(), calib_batches=[feed])
    conv = next(op for op in g.ops if op.op_type == "conv2d")
    assert conv.attrs["kernel"] == "pallas"

    # fake whole-model measurement: the xla plan is 2x faster in-model
    def fake_measure(graph, _feed):
        return 100.0 if conv.attrs["kernel"] == "xla" else 50.0

    decisions = tune_cache.validate_in_model(g, feed, measure=fake_measure)
    assert decisions == {_key(m, k, n): "xla"}
    assert conv.attrs["kernel"] == "xla"          # graph flipped in place
    assert json.loads(cache.read_text())[_key(m, k, n)] == "xla"  # persisted
    tune_cache._load.cache_clear()


def test_validate_in_model_keeps_real_winner(tmp_path, monkeypatch, rng):
    """A Pallas pick that wins end-to-end by >1% survives validation."""
    from paddle_lite_tpu import GraphBuilder, QuantConfig
    from paddle_lite_tpu.tools.opt import optimize

    cache = tmp_path / "gemm.json"
    monkeypatch.setenv("PLT_TPU_AUTOTUNE_CACHE", str(cache))
    m, k, n = 4 * 8 * 8, 64, 128
    cache.write_text(json.dumps({_key(m, k, n): "pallas"}))
    tune_cache._load.cache_clear()

    b = GraphBuilder("t", seed=7)
    x = b.input("x", (4, 8, 8, 64))
    y = b.conv_bn_act(x, 128, 1, act="relu")
    b.mark_output(y)
    g = b.build()
    feed = {"x": rng.normal(size=(4, 8, 8, 64)).astype(np.float32)}
    optimize(g, quant=QuantConfig(), calib_batches=[feed])
    conv = next(op for op in g.ops if op.op_type == "conv2d")

    def fake_measure(graph, _feed):
        return 50.0 if conv.attrs["kernel"] == "xla" else 100.0

    decisions = tune_cache.validate_in_model(g, feed, measure=fake_measure)
    assert decisions == {_key(m, k, n): "pallas"}
    assert conv.attrs["kernel"] == "pallas"
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
