"""Per-shape int8 GEMM roofline report (VERDICT r1 #5).

For every GEMM bucket the models actually use (the ``.autotune/gemm.json``
keys), measure BOTH implementations (fused Pallas kernel, XLA dot+epilogue)
with the hardened iteration-delta method and compare against the shape's
*analytic ceiling*:

    t_compute = 2·m·k·n / PEAK_INT8_OPS
    t_memory  = (m·k + k·n + m·n bytes, int8 in / int8-or-f32 out) / HBM_BW
    t_roof    = max(t_compute, t_memory)        # whichever bound binds

Small-K / small-N model shapes are HBM-bound: quoting "% of 394 TOPS" for
them is meaningless — the % -of-roofline column here uses the *binding*
ceiling, which is the honest form of BASELINE's ≥90% contract.

python -m paddle_lite_tpu.tools.gemm_roofline [--shapes MxKxN,...]
Writes JSON rows; docs/ROOFLINE.md carries the committed snapshot.
"""

from __future__ import annotations

import argparse
import functools
import json
import os
import time
from typing import Optional

import numpy as np

# TPU v5e (v5 lite) peaks
PEAK_INT8_OPS = 394e12
HBM_BW = 819e9


def measure_shape(m: int, k: int, n: int, *, out_int8: bool = True,
                  min_window: float = 0.3) -> dict:
    import jax
    import jax.numpy as jnp

    from ..ops.kernels.int8_matmul import int8_matmul

    rng = np.random.default_rng(0)
    x = jax.device_put(rng.integers(-127, 128, (m, k), dtype=np.int8))
    w = jax.device_put(rng.integers(-127, 128, (k, n), dtype=np.int8))
    eff = jnp.asarray(rng.uniform(1e-3, 2e-3, (n,)).astype(np.float32))
    bias = jnp.asarray(rng.normal(size=(n,)).astype(np.float32))
    interp = jax.default_backend() != "tpu"
    out_scale = 0.05 if out_int8 else None

    def one_pallas(xc):
        return int8_matmul(xc, w, eff, bias, act="relu", out_scale=out_scale,
                           interpret=interp)

    def one_xla(xc):
        acc = jnp.dot(xc, w, preferred_element_type=jnp.int32)
        y = jnp.maximum(acc.astype(jnp.float32) * eff + bias, 0)
        if out_int8:
            return jnp.clip(jnp.round(y * 20.0), -127, 127).astype(jnp.int8)
        return y

    def timed_per_iter(one) -> float:
        @jax.jit
        def looped(xc, iters):
            def body(i, carry):
                out = one(carry)
                # loop-carried dependency: fold one output element back into
                # the input so the body cannot be hoisted; runtime value is
                # xor'd twice per pair of iters but stays int8-valued
                return carry.at[0, 0].set(
                    jnp.bitwise_xor(carry[0, 0], out[0, 0].astype(jnp.int8)))

            final = jax.lax.fori_loop(0, iters, body, xc)
            return jnp.sum(final[0, :1].astype(jnp.int32))

        def t(it):
            t0 = time.perf_counter()
            float(jax.device_get(looped(x, jnp.int32(it))))
            return time.perf_counter() - t0

        t(1)
        loop = 64
        while True:
            d = float(np.median([t(1 + loop) - t(1) for _ in range(3)]))
            if d >= min_window or loop >= 1 << 22:
                break
            loop = min(max(int(loop * min_window * 1.3 / max(d, 1e-4)) + 1,
                           loop * 2), 1 << 22)
        deltas = [t(1 + loop) - t(1) for _ in range(5)]
        good = [v for v in deltas if v > min_window / 4] or deltas
        return float(np.median(good)) / loop

    t_p = timed_per_iter(one_pallas)
    t_x = timed_per_iter(one_xla)
    flops = 2.0 * m * k * n
    out_bytes = m * n * (1 if out_int8 else 4)
    mem_bytes = m * k + k * n + out_bytes
    t_compute = flops / PEAK_INT8_OPS
    t_memory = mem_bytes / HBM_BW
    t_roof = max(t_compute, t_memory)
    best = min(t_p, t_x)
    return {
        "shape": f"{m}x{k}x{n}",
        "bound": "compute" if t_compute >= t_memory else "memory",
        "roof_us": round(t_roof * 1e6, 2),
        "pallas_us": round(t_p * 1e6, 2),
        "xla_us": round(t_x * 1e6, 2),
        "pallas_tops": round(flops / t_p / 1e12, 1),
        "xla_tops": round(flops / t_x / 1e12, 1),
        "best_pct_of_roofline": round(100 * t_roof / best, 1),
        "winner": "pallas" if t_p < t_x else "xla",
    }


def main() -> None:
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])

    p = argparse.ArgumentParser()
    p.add_argument("--shapes", default=None,
                   help="MxKxN[,MxKxN...]; default: every GEMM bucket in "
                        ".autotune/gemm.json")
    p.add_argument("--fp32-out", action="store_true")
    args = p.parse_args()
    if args.shapes:
        shapes = [tuple(int(v) for v in s.split("x"))
                  for s in args.shapes.split(",")]
    else:
        from ..ops.kernels.tune_cache import _load

        shapes = sorted(
            tuple(int(v) for v in key.split("x"))
            for key in _load() if not key.startswith("dw"))
    for m, k, n in shapes:
        row = measure_shape(m, k, n, out_int8=not args.fp32_out)
        print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
