"""r5 study: the MNv1 112px 32->64 pointwise GEMM (802816x32x64 at b64).

docs/r50_roofline_r4.json measured it at 534.5us = 17.6% of its bandwidth
roofline — 37% of the whole 1,434us MNv1 batch in ONE lane-starved GEMM
(K=32 underfeeds the 128-deep MXU 4x, N=64 pads every weight/output lane
tile 2x).  The r5 fix: row-packing (int8_matmul.pack_factor) — view P=4
contiguous pixels as one row of 128 values (free reshape) against a
block-diagonal (128, 256) weight, turning the problem into 200704x128x256,
a shape class measured at 124-165% of the same roofline.  Bit-exact.

This script races, on-chip:
  1. xla int8 1x1 conv        (the shipping path today: table says xla)
  2. xla int8 dot, unpacked   (measure_gemm's xla arm)
  3. xla int8 dot, packed     (does XLA alone benefit from the view?)
  4. pallas unpacked          (what the table raced before this round)
  5. pallas packed (auto)     (the new int8_matmul default for this shape)
then sweeps packed block tilings (persisted under the packed bucket key)
and finally runs tune_cache.measure_gemm to re-race & store the op-level
winner under the 786432x32x64 bucket.

Writes docs/mnv1_pw_r5.json.
"""
import os, time, json, functools

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])

from paddle_lite_tpu.ops.kernels.int8_matmul import (
    int8_matmul, _int8_matmul_impl, pack_factor)
from paddle_lite_tpu.ops.kernels.autotune import gemm_blocks
from paddle_lite_tpu.ops.kernels import tune_cache

M, K, N = 802816, 32, 64    # b64: 64*112*112 rows
P = pack_factor(M, K, N)
assert P == 4, P

rng = np.random.default_rng(0)
x = jax.device_put(rng.integers(-127, 128, (M, K), dtype=np.int8))
w = jax.device_put(rng.integers(-127, 128, (K, N), dtype=np.int8))
eff = jnp.asarray(rng.uniform(1e-3, 2e-3, (N,)).astype(np.float32))
bias = jnp.asarray(rng.normal(size=(N,)).astype(np.float32))
w4 = jnp.asarray(np.asarray(w).reshape(1, 1, K, N))

results = {}


def timed(name, one):
    t = tune_cache._time_one(one, x)
    gbps = M * (K + N) / t / 1e9
    print(f"{name:26s} {t*1e6:9.1f}us  {gbps:7.1f} GB/s", flush=True)
    results[name] = {"us": round(t * 1e6, 1), "gbps": round(gbps, 1)}
    return t


def one_conv_xla(xc):
    # the shipping conv2d_xla form: int8 conv + requant epilogue
    acc = jax.lax.conv_general_dilated(
        xc.reshape(64, 112, 112, K), w4, (1, 1), ((0, 0), (0, 0)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32)
    y = jnp.maximum(acc.astype(jnp.float32) * eff + bias, 0)
    return jnp.clip(jnp.round(y * 20.0), -127, 127).astype(jnp.int8
                    ).reshape(M, N)


def one_dot_xla(xc):
    acc = jnp.dot(xc, w, preferred_element_type=jnp.int32)
    y = jnp.maximum(acc.astype(jnp.float32) * eff + bias, 0)
    return jnp.clip(jnp.round(y * 20.0), -127, 127).astype(jnp.int8)


wp = jnp.kron(jnp.eye(P, dtype=jnp.int8), w)
effp, biasp = jnp.tile(eff, P), jnp.tile(bias, P)


def one_dot_xla_packed(xc):
    acc = jnp.dot(xc.reshape(M // P, K * P), wp,
                  preferred_element_type=jnp.int32)
    y = jnp.maximum(acc.astype(jnp.float32) * effp + biasp, 0)
    return jnp.clip(jnp.round(y * 20.0), -127, 127).astype(jnp.int8
                    ).reshape(M, N)


def one_pallas_unpacked(xc):
    b = gemm_blocks(M, K, N)
    return _int8_matmul_impl(
        xc, w, jnp.broadcast_to(eff, (N,)), bias, act="relu",
        act_attrs_tuple=None, out_scale=0.05, interpret=False,
        blocks=(b.bm, b.bk, b.bn))


def one_pallas_packed(xc):
    return int8_matmul(xc, w, eff, bias, act="relu", out_scale=0.05)


# correctness cross-check on a slice before burning chip time
ref = np.asarray(one_dot_xla(x[:4096]))  # shape (4096, N) — xla truth
got = np.asarray(one_pallas_packed(x))[:4096]
assert np.array_equal(ref, got), "packed pallas != xla int8 truth"
print("bit-exactness vs xla dot: OK", flush=True)

timed("xla_conv_1x1", one_conv_xla)
timed("xla_dot_unpacked", one_dot_xla)
timed("xla_dot_packed", one_dot_xla_packed)
timed("pallas_unpacked", one_pallas_unpacked)
timed("pallas_packed_auto", one_pallas_packed)

print("\nblock sweep on the packed problem:", flush=True)
best, best_t = tune_cache.sweep_gemm_blocks(M, K, N, verbose=True)
results["block_sweep"] = {"best": best, "us": round(best_t * 1e6, 1)}

# re-measure the packed path now that the block table has the swept winner
timed("pallas_packed_swept", one_pallas_packed)

print("\nop-level race (stores winner under the bucket key):", flush=True)
winner = tune_cache.measure_gemm(M, K, N, verbose=True)
results["table_winner"] = winner

out = "/root/repo/docs/mnv1_pw_r5.json"
json.dump(results, open(out, "w"), indent=1)
print("wrote", out, flush=True)
