"""MobileNetV3 stem + global-pool microbenchmarks (VERDICT r3 task 2).

docs/roofline_mnv3_int8_b64.txt localizes 0.88 ms of the 1.79 ms b64 batch
in two ops that should cost ~0.07 ms combined:

- id=0 stem conv (3->16 k3 s2, hard_swish, fp32-in/int8-out): 0.599 ms vs
  0.063 roofline (9.5x).  MobileNetV1's stem (3->32, relu, same image) runs
  0.142 ms — so input bandwidth is NOT the limit.  Variables isolated here:
  activation (hard_swish vs relu), out-channels (16 vs 32), input dtype
  (fp32 vs bf16 pre-cast).
- id=181 global avg pool ((64,7,7,960) int8): 0.276 ms vs 0.004 roofline
  (73x).  Variables: int8-in vs fp32-in, reduce_window vs mean lowering.

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/studies/mnv3_stem_pool.py
"""
import functools
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])

B = 64


def bench(fn, x, reps=5):
    """iteration-delta on-device time of fn(x) (see bench.py)."""
    loop = 8

    @functools.partial(jax.jit, static_argnames=("iters",))
    def looped(a, iters):
        def body(i, carry):
            a_cur, acc = carry
            o = fn(a_cur)
            s = jnp.sum(jnp.square(o.astype(jnp.float32)))
            bump = (s > jnp.float32(3e38)).astype(a_cur.dtype)
            return a_cur + bump, acc + s

        _, acc = jax.lax.fori_loop(0, iters, body, (a, jnp.float32(0)))
        return acc

    def timed(it):
        t0 = time.perf_counter()
        float(jax.device_get(looped(x, it)))
        return time.perf_counter() - t0

    timed(1)
    while True:
        d = float(np.median([timed(1 + loop) - timed(1) for _ in range(3)]))
        if d >= 0.4 or loop >= 1 << 20:
            break
        loop = min(max(int(loop * 0.5 / max(d, 1e-3)) + 1, loop * 2), 1 << 20)
    deltas = [timed(1 + loop) - timed(1) for _ in range(reps)]
    good = [v for v in deltas if v > 0.1] or deltas
    return float(np.median(good)) / loop


def hard_swish(x):
    return x * jnp.clip(x + 3.0, 0.0, 6.0) / 6.0


def stem(x, w, act, out_int8=True):
    y = jax.lax.conv_general_dilated(
        x, w.astype(x.dtype), (2, 2), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    y = y.astype(jnp.float32)
    y = hard_swish(y) if act == "hswish" else jnp.maximum(y, 0)
    if out_int8:
        return jnp.clip(jnp.round(y * 20.0), -127, 127).astype(jnp.int8)
    return y


def main():
    rng = np.random.default_rng(0)
    x32 = jax.device_put(rng.normal(size=(B, 224, 224, 3)).astype(np.float32))
    xbf = jax.device_put(np.asarray(x32, np.float32).astype(jnp.bfloat16))

    print("== stem conv (b64, 224px, k3 s2) ==", flush=True)
    for cout in (16, 32):
        w = jnp.asarray(rng.normal(size=(3, 3, 3, cout)).astype(np.float32)
                        * 0.2)
        for act in ("hswish", "relu"):
            t = bench(lambda a, w=w, act=act: stem(a, w, act), x32)
            print(f"  fp32-in  c{cout:<3} {act:<7} int8-out: {t*1e6:7.1f} us",
                  flush=True)
        t = bench(lambda a, w=w: stem(a, w, "hswish"), xbf)
        print(f"  bf16-in  c{cout:<3} hswish  int8-out: {t*1e6:7.1f} us",
              flush=True)
    # space-to-depth variant: 224x224x3 s2 k3 -> 112x112x12 s1 k2... the
    # exact-equivalent is s2d to (112,112,12) + 2x2 stride-1? Not identical;
    # measure the plain NCHW-minor layout too
    w16 = jnp.asarray(rng.normal(size=(3, 3, 3, 16)).astype(np.float32) * 0.2)
    t = bench(lambda a: stem(a, w16, "hswish", out_int8=False), x32)
    print(f"  fp32-in  c16  hswish  fp32-out: {t*1e6:7.1f} us", flush=True)

    print("== global avg pool (64,7,7,960) ==", flush=True)
    p8 = jax.device_put(rng.integers(-127, 128, (B, 7, 7, 960),
                                     dtype=np.int8))
    p32 = jax.device_put(rng.normal(size=(B, 7, 7, 960)).astype(np.float32))

    def pool_mean_f32(a):
        return jnp.mean(a.astype(jnp.float32), axis=(1, 2), keepdims=True)

    def pool_sum_int(a):
        s = jnp.sum(a.astype(jnp.int32), axis=(1, 2), keepdims=True)
        return (s.astype(jnp.float32) / 49.0)

    def pool_reduce_window(a):
        acc = jax.lax.reduce_window(
            a.astype(jnp.float32), 0.0, jax.lax.add, (1, 7, 7, 1),
            (1, 1, 1, 1), "VALID")
        return acc / 49.0

    for name, fn, x in (("mean f32 on int8-in", pool_mean_f32, p8),
                        ("int32-sum on int8-in", pool_sum_int, p8),
                        ("reduce_window on int8-in", pool_reduce_window, p8),
                        ("mean f32 on f32-in", pool_mean_f32, p32),
                        ("reduce_window on f32-in", pool_reduce_window, p32)):
        t = bench(fn, x)
        print(f"  {name:<26}: {t*1e6:7.1f} us", flush=True)

    # and the pool as our op kernel lowers it inside a model-like context:
    # int8 pool -> 1x1 conv (the real tail)
    wfc = jnp.asarray(rng.normal(size=(1, 1, 960, 1280)).astype(np.float32)
                      * 0.05)

    def tail(a):
        p = jnp.mean(a.astype(jnp.float32), axis=(1, 2), keepdims=True)
        y = jax.lax.conv_general_dilated(
            p, wfc, (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return hard_swish(y)

    t = bench(tail, p8)
    print(f"  pool+1x1conv(1280) tail   : {t*1e6:7.1f} us", flush=True)


if __name__ == "__main__":
    main()
