"""Per-piece timing of the multiclass_nms pallas path at SSD shapes
(N=32, M=8732, C=21, k=400): candidate top-k+gather, the VMEM NMS kernel,
and the cross-class merge — each timed with the iteration-delta loop
(runtime-zero bump keeps inputs loop-variant).

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools_scratch_nms_pieces.py
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

N, M, C, K = 32, 8732, 21, 400
rng = np.random.default_rng(0)


def loop_time(fn, args, label, min_window=0.4):
    """Median per-iteration seconds of fn(*args) inside one jitted loop."""
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


def prep(bx, sc):
    def top_candidates(col, b1):
        top_s, idx = jax.lax.approx_max_k(col, K)
        return top_s, b1[idx]

    per_image = jax.vmap(top_candidates, in_axes=(1, None))
    top_s, cand = jax.vmap(per_image)(sc, bx)
    return top_s, cand


def kernel(cand, top_s):
    return nms_keep_scores(cand.reshape(N * C, K, 4),
                           top_s.reshape(N * C, K),
                           iou_t=0.45, score_t=0.01)


def merge(kept, cand):
    m = jax.vmap(lambda s_all, c_all: _nms_merge(
        s_all, c_all, background=0, keep_top_k=100))
    return m(kept.reshape(N, C, K), cand)


top_s, cand = prep(jnp.asarray(boxes), jnp.asarray(scores))
kept = kernel(cand, top_s)

loop_time(prep, (jnp.asarray(boxes), jnp.asarray(scores)), "prep (topk+gather)")
loop_time(kernel, (cand, top_s), "nms kernel")
loop_time(merge, (kept, cand), "merge")
