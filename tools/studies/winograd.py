"""Winograd F(2,3) vs direct conv on the MXU — the measurement backing the
"winograd deliberately not implemented" claim (models/resnet.py docstring,
VERDICT r1 missing #5).

F(2,3): 4x4 input tiles, B^T d B / G g G^T transforms, 16 batched
(tiles x C) @ (C x K) matmuls, A^T Y A output transform. The batched
matmuls run bf16 on the MXU (the best case for Winograd — fp32 would only
widen the gap); direct conv is lax.conv_general_dilated in bf16 and int8.
Shapes: ResNet-50's four 3x3 stages at b32.

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools_scratch_winograd.py
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

# F(2x2, 3x3) transform matrices (Lavin & Gray 2015)
BT = np.array([[1, 0, -1, 0], [0, 1, 1, 0], [0, -1, 1, 0], [0, 1, 0, -1]],
              np.float32)
G = np.array([[1, 0, 0], [0.5, 0.5, 0.5], [0.5, -0.5, 0.5], [0, 0, 1]],
             np.float32)
AT = np.array([[1, 1, 1, 0], [0, 1, -1, -1]], np.float32)


def winograd_f23(x, w):
    """x (N,H,W,C) bf16, w (3,3,C,K) bf16 -> (N,H,W,K). Stride-1, pad SAME."""
    n, h, wd, c = x.shape
    k = w.shape[-1]
    h_in, w_in = h, wd
    if h % 2 or wd % 2:  # odd extents (ResNet 7x7 stage): pad, crop after
        x = jnp.pad(x, ((0, 0), (0, h % 2), (0, wd % 2), (0, 0)))
        n, h, wd, c = x.shape
    th, tw = h // 2, wd // 2
    # pad 2 on the trailing edge: the (i=3, j=3) tile-offset slices read
    # [3, 3+2*th) and dynamic_slice CLAMPS an out-of-bounds start (silently
    # shifting the whole slice); the extra row/col is never selected by the
    # stride-2 subsample, it only keeps the slice in bounds
    xp = jnp.pad(x, ((0, 0), (1, 2), (1, 2), (0, 0)))
    # extract 4x4 tiles with stride 2: (N, th, tw, 4, 4, C)
    tiles = jnp.stack([
        jax.lax.dynamic_slice_in_dim(
            jax.lax.dynamic_slice_in_dim(xp, i, 2 * th, axis=1), j, 2 * tw,
            axis=2).reshape(n, th, 2, tw, 2, c)[:, :, 0, :, 0]
        for i in range(4) for j in range(4)
    ], axis=-2).reshape(n, th, tw, 4, 4, c)
    bt = jnp.asarray(BT, x.dtype)
    v = jnp.einsum("ij,nthjkc,lk->nthilc", bt, tiles, bt)  # B^T d B
    g = jnp.asarray(G, jnp.float32)
    u = jnp.einsum("ij,jkco,lk->ilco", g, w.astype(jnp.float32), g)
    u = u.astype(x.dtype)
    # 16 batched matmuls: (16, N*th*tw, C) @ (16, C, K)
    v2 = v.transpose(3, 4, 0, 1, 2, 5).reshape(16, -1, c)
    m = jnp.einsum("bpc,bck->bpk", v2, u.reshape(16, c, k),
                   preferred_element_type=jnp.float32)
    m = m.reshape(4, 4, n, th, tw, k)
    at = jnp.asarray(AT, jnp.float32)
    # A^T m A; output order (n, t, i, w, l, c) interleaves tile row/col
    # directly — (t,i)→H and (w,l)→W merge in the reshape
    y = jnp.einsum("ij,jkntwc,lk->ntiwlc", at, m, at)
    return y.reshape(n, 2 * th, 2 * tw, k)[:, :h_in, :w_in]


def direct(x, w, pet):
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=pet)


def bench(fn, *args, reps=5):
    f = jax.jit(fn)
    out = f(*args)
    jax.block_until_ready(out)
    loop = 8

    @functools.partial(jax.jit, static_argnames=("iters",))
    def looped(a, w, iters):
        def body(i, carry):
            a_cur, acc = carry
            o = fn(a_cur, w)
            s = jnp.sum(jnp.square(o.astype(jnp.float32)))
            bump = (s > jnp.float32(3e38)).astype(a_cur.dtype)
            return a_cur + bump, acc + s

        _, acc = jax.lax.fori_loop(0, iters, body,
                                   (a, jnp.float32(0)))
        return acc

    def timed(it):
        t0 = time.perf_counter()
        float(jax.device_get(looped(args[0], args[1], it)))
        return time.perf_counter() - t0

    timed(1)
    while True:
        d = float(np.median([timed(1 + loop) - timed(1) for _ in range(3)]))
        if d >= 0.4 or loop >= 1 << 20:
            break
        loop = min(max(int(loop * 0.5 / max(d, 1e-3)) + 1, loop * 2), 1 << 20)
    deltas = [timed(1 + loop) - timed(1) for _ in range(reps)]
    good = [x for x in deltas if x > 0.1] or deltas
    return float(np.median(good)) / loop


SHAPES = [  # ResNet-50 3x3 stages, b32
    (32, 56, 56, 64, 64),
    (32, 28, 28, 128, 128),
    (32, 14, 14, 256, 256),
    (32, 7, 7, 512, 512),
]

rng = np.random.default_rng(0)
print(f"{'shape':<24} {'direct_bf16':>12} {'winograd_bf16':>14} "
      f"{'direct_int8':>12}  winner")
for n, h, wd, c, k in SHAPES:
    x32 = rng.normal(size=(n, h, wd, c)).astype(np.float32)
    w32 = (rng.normal(size=(3, 3, c, k)) * 0.1).astype(np.float32)
    x = jnp.asarray(x32, jnp.bfloat16)
    w = jnp.asarray(w32, jnp.bfloat16)
    xi = jnp.asarray(np.clip(x32 * 30, -127, 127).astype(np.int8))
    wi = jnp.asarray(np.clip(w32 * 300, -127, 127).astype(np.int8))

    # correctness sanity first (bf16 tolerance)
    yw = np.asarray(winograd_f23(x, w), np.float32)
    yd = np.asarray(direct(x, w, jnp.float32), np.float32)
    cos = float((yw * yd).sum() /
                (np.linalg.norm(yw) * np.linalg.norm(yd) + 1e-9))
    assert cos > 0.999, cos

    td = bench(lambda a, ww: direct(a, ww, jnp.float32), x, w)
    tw = bench(winograd_f23, x, w)
    ti = bench(lambda a, ww: direct(a, ww, jnp.int32), xi, wi)
    flops = 2 * n * h * wd * c * k * 9
    print(f"{(n,h,wd,c,k)!s:<24} {td*1e6:>10.1f}us {tw*1e6:>12.1f}us "
          f"{ti*1e6:>10.1f}us  "
          f"{'direct' if td <= tw else 'WINOGRAD'}"
          f"  (direct bf16 {flops/td/1e12:.0f} TFLOP/s)", flush=True)
