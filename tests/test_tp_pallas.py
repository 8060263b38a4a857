"""Tensor-parallel Pallas GEMM tests on the 8-device virtual mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from paddle_lite_tpu.parallel.tp_pallas import (column_parallel_int8_matmul,
                                                row_parallel_int8_matmul)


@pytest.fixture
def mesh():
    devs = np.asarray(jax.devices()[:8]).reshape(2, 4)
    return Mesh(devs, ("data", "model"))


def _problem(rng, m, k, n):
    x = rng.integers(-20, 20, (m, k), dtype=np.int8)
    w = rng.integers(-20, 20, (k, n), dtype=np.int8)
    eff = rng.uniform(1e-3, 2e-3, (n,)).astype(np.float32)
    bias = rng.normal(size=(n,)).astype(np.float32)
    ref = (x.astype(np.int32) @ w.astype(np.int32)).astype(np.float32) \
        * eff + bias
    return x, w, eff, bias, ref


def test_column_parallel(mesh, rng):
    m, k, n = 32, 64, 128
    x, w, eff, bias, ref = _problem(rng, m, k, n)
    out = column_parallel_int8_matmul(mesh, x, w, eff, bias, interpret=True)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-4, atol=1e-3)


def test_column_parallel_relu_requant(mesh, rng):
    m, k, n = 16, 32, 64
    x, w, eff, bias, ref = _problem(rng, m, k, n)
    ref_q = np.clip(np.round(np.maximum(ref, 0) / 0.05), -127, 127)
    out = column_parallel_int8_matmul(mesh, x, w, eff, bias, act="relu",
                                      out_scale=0.05, interpret=True)
    assert np.asarray(out).dtype == np.int8
    assert np.abs(np.asarray(out).astype(np.int32) - ref_q).max() <= 1


def test_row_parallel_psum(mesh, rng):
    m, k, n = 32, 64, 32
    x, w, eff, bias, ref = _problem(rng, m, k, n)
    out = row_parallel_int8_matmul(mesh, x, w, eff, bias, interpret=True)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-4, atol=1e-2)


def test_row_parallel_psum_scatter(mesh, rng):
    m, k, n = 32, 64, 32
    x, w, eff, bias, ref = _problem(rng, m, k, n)
    out = row_parallel_int8_matmul(mesh, x, w, eff, bias,
                                   scatter_batch=True, interpret=True)
    assert out.shape == (m, n)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-4, atol=1e-2)


def test_column_then_row_composition(mesh, rng):
    """Megatron MLP pattern: column-parallel up-proj + row-parallel
    down-proj — ONE collective for the pair."""
    m, k, h = 16, 32, 64
    x, w1, eff1, b1, mid_ref = _problem(rng, m, k, h)
    w2 = rng.integers(-20, 20, (h, k), dtype=np.int8)
    eff2 = rng.uniform(1e-3, 2e-3, (k,)).astype(np.float32)

    mid = column_parallel_int8_matmul(
        mesh, x, w1, eff1, b1, act="relu", out_scale=0.05, interpret=True)
    out = row_parallel_int8_matmul(mesh, np.asarray(mid), w2, eff2,
                                   interpret=True)
    mid_q = np.clip(np.round(np.maximum(mid_ref, 0) / 0.05), -127, 127)
    ref = (mid_q.astype(np.int32) @ w2.astype(np.int32)).astype(np.float32) * eff2
    np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-2, atol=0.5)


def test_column_parallel_validates_divisibility(mesh, rng):
    x = np.zeros((4, 8), np.int8)
    w = np.zeros((8, 10), np.int8)  # 10 % 4 != 0
    with pytest.raises(ValueError, match="divisible"):
        column_parallel_int8_matmul(mesh, x, w, np.ones(10, np.float32),
                                    interpret=True)
