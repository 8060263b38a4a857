"""r4: piece-wise timing of the SHIPPED multiclass_nms path (bucket3@176,
k=528) at SSD b32 — selection (dense per-bucket top-3), the VMEM NMS
kernel, and the cross-class merge — so the r5 "NMS kernel is now the
bottleneck (3.78 of 6.40 ms)" item starts from the right sub-target.

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/studies/nms_pieces_r4.py
"""
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])

from paddle_lite_tpu.ops.detection import _nms_merge  # noqa: E402
from paddle_lite_tpu.ops.kernels.nms import nms_keep_scores  # noqa: E402

N, M, C = 32, 8732, 21
LOC, TOPN = 176, 3
K = LOC * TOPN
rng = np.random.default_rng(0)


def loop_time(fn, args, label, min_window=0.4):
    @jax.jit
    def looped(a, iters):
        def body(i, carry):
            out = fn(*carry)
            leaves = jax.tree.leaves(out)
            s = sum(jnp.sum(jnp.square(l.astype(jnp.float32))) for l in leaves)
            bump = (s > jnp.float32(3e38))
            return tuple(v + bump.astype(v.dtype) for v in carry)

        final = jax.lax.fori_loop(0, iters, body, a)
        return sum(jnp.sum(jnp.square(l.astype(jnp.float32)))
                   for l in jax.tree.leaves(final))

    args = tuple(jax.device_put(a) for a in args)

    def timed(it):
        t0 = time.perf_counter()
        float(jax.device_get(looped(args, jnp.int32(it))))
        return time.perf_counter() - t0

    timed(1)
    loop, d = 8, 0.0
    while True:
        d = float(np.median([timed(1 + loop) - timed(1) for _ in range(3)]))
        if d >= min_window or loop >= 1 << 20:
            break
        loop = min(max(int(loop * min_window * 1.3 / max(d, 1e-4)) + 1,
                       loop * 2), 1 << 20)
    per = d / loop
    print(f"{label:<28} {per*1e3:8.3f} ms/iter (loop={loop})", flush=True)
    return per


boxes = np.concatenate([
    rng.uniform(0.05, 0.8, (N, M, 2)),
    rng.uniform(0.0, 0.25, (N, M, 2))], -1).astype(np.float32)
boxes[..., 2:] += boxes[..., :2]
scores = rng.dirichlet(np.ones(C) * 0.15, (N, M)).astype(np.float32)


def select(bx, sc):
    """The bucket3 dense selection from ops/detection.py."""
    bs = -(-M // LOC)
    pad = LOC * bs - M
    sc_t = sc.transpose(0, 2, 1)
    if pad:
        sc_t = jnp.pad(sc_t, ((0, 0), (0, 0), (0, pad)),
                       constant_values=-1e30)
    sc_b = sc_t.reshape(N, C, LOC, bs)
    bx_pad = jnp.pad(bx, ((0, 0), (0, pad), (0, 0))) if pad else bx
    bx_b = bx_pad.reshape(N, 1, LOC, bs, 4)

    def bucket_max(sb):
        top = sb.max(axis=-1)
        sel = (sb == top[..., None])
        first = jnp.cumsum(sel, axis=-1) == 1
        onehot = sel & first
        cnd = jnp.sum(onehot.astype(jnp.float32)[..., None] * bx_b, axis=3)
        return top, onehot, cnd

    top_s, taken, cand = bucket_max(sc_b)
    tops, cands = [top_s], [cand]
    for _ in range(TOPN - 1):
        t_i, oh_i, c_i = bucket_max(jnp.where(taken, -jnp.inf, sc_b))
        taken = taken | oh_i
        tops.append(t_i)
        cands.append(c_i)
    return jnp.concatenate(tops, -1), jnp.concatenate(cands, 2)


def kernel(cand, top_s):
    return nms_keep_scores(cand.reshape(N * C, K, 4),
                           top_s.reshape(N * C, K),
                           iou_t=0.45, score_t=0.01)


def merge(kept, cand):
    m = jax.vmap(lambda s_all, c_all: _nms_merge(
        s_all, c_all, background=0, keep_top_k=100))
    return m(kept.reshape(N, C, K), cand)


top_s, cand = select(jnp.asarray(boxes), jnp.asarray(scores))
kept = kernel(cand, top_s)

loop_time(select, (jnp.asarray(boxes), jnp.asarray(scores)),
          f"select (bucket{TOPN}@{LOC})")
loop_time(kernel, (cand, top_s), f"nms kernel (k={K})")
loop_time(merge, (kept, cand), "merge (top_k over C*k)")
