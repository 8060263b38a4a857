"""r5 NMS kernel restructure study (VERDICT r4 next-round #1).

The shipped kernel (ops/kernels/nms.py) at SSD shapes (G=672, k=528):
3.44 ms standalone — build ~1.8 ms (VMEM-write-bound on (k,k) f32
temporaries), ~6 Jacobi rounds x 0.19 ms, while machinery ~0.4 ms.

Variants raced here (all exact vs the shipped kernel on the same data):

  K0  shipped kernel (re-baseline)
  K1  VERDICT spec: round loop outside a column-tile loop — sup is
      REBUILT per round in (kp, 128) tiles and consumed immediately by
      the MXU matvec; (k,k) never materializes.  Trades the write bound
      for ~R x the VPU build compute.
  K2  Gauss-Seidel column sweeps: sup materialized ONCE (as shipped),
      but keep[] updates PER COLUMN TILE inside each sweep — fresher
      values propagate within a sweep, so sweeps << Jacobi rounds.
  K3  sorted-input forward block-substitution: candidates pre-sorted
      score-descending (precedence = constant iota triangle), one
      forward pass over column blocks, inner while per block resolves
      within-block chains against already-final predecessors.  Needs a
      sort+gather in the wrapper — measured separately (SORT row).

RESULT (docs/nms_kernel_r5.json): the restructure is CLOSED as
toolchain-blocked + wrapper-bound, with receipts —
  * K1 and K2 both CRASH the Mosaic compiler (tpu_compile_helper exit 1
    via remote-compile HTTP 500, reproduced on a quiet chip) — the
    column-tiled sup expressions inside/feeding a while_loop join the r4
    list of Mosaic-rejected NMS shapes (bf16/int8/i1 relayouts).
  * K3's wrapper is dead on arrival: sort+gather at (672, 640) costs
    3.24 ms — MORE than the entire shipped kernel (2.94 ms on this data).
  * The r4 decomposition already bounded the rebuild arithmetic: per-round
    rebuild trades a ~1.8 ms one-time write cost for ~R x 0.5-1.8 ms of
    VPU compute — a loss at the measured R~6.
The round-5 NMS wins shipped instead at the WRAPPER level: background
class dropped before the cores (-1/21 of the quadratic work, exact) and
an empty-instance guard in the kernel (real-data win; synthetic bench
data is dense so the headline row does not see it).
"""
import os, json, functools

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])
from jax.experimental import pallas as pl

from paddle_lite_tpu.ops.kernels.nms import nms_keep_scores
from paddle_lite_tpu.ops.kernels import tune_cache

N, C, K = 32, 21, 528
G = N * C
KP = 640           # padded candidate count: 5 x 128 lane tiles
NT = KP // 128
IOU_T, SCORE_T = 0.45, 0.01

rng = np.random.default_rng(0)
centers = rng.uniform(0.1, 0.9, (G, K, 2))
wh = rng.uniform(0.02, 0.3, (G, K, 2))
boxes = np.concatenate([centers - wh / 2, centers + wh / 2], -1).astype(
    np.float32)
scores = rng.uniform(0, 1, (G, K)).astype(np.float32)
scores[scores < 0.7] *= 0.01   # ~30% above threshold, SSD-ish density

# padded copies for the tiled variants (dummy slots: score -1e30, box 0)
boxes_p = np.zeros((G, KP, 4), np.float32)
boxes_p[:, :K] = boxes
scores_p = np.full((G, KP), -1e30, np.float32)
scores_p[:, :K] = scores

# sorted copies (kept for the SORT-cost measurement)
order = np.argsort(-scores_p, axis=1, kind="stable")


def _geom(b, s_row, k):
    x1c, y1c = b[:, 0:1], b[:, 1:2]
    x2c, y2c = b[:, 2:3], b[:, 3:4]
    wc = jnp.maximum(x2c - x1c, 0.0)
    hc = jnp.maximum(y2c - y1c, 0.0)
    areac = wc * hc
    return (x1c, y1c, x2c, y2c, areac,
            x1c.reshape(1, k), y1c.reshape(1, k),
            x2c.reshape(1, k), y2c.reshape(1, k), areac.reshape(1, k))


def _sup_tile(geom, s, s_col, t0, tw, *, sorted_prec):
    """(k, tw) suppression tile for columns [t0, t0+tw)."""
    (x1c, y1c, x2c, y2c, areac, x1r, y1r, x2r, y2r, arear) = geom
    k = x1c.shape[0]
    x1t, y1t = x1r[:, t0:t0 + tw], y1r[:, t0:t0 + tw]
    x2t, y2t = x2r[:, t0:t0 + tw], y2r[:, t0:t0 + tw]
    at = arear[:, t0:t0 + tw]
    ix = jnp.maximum(jnp.minimum(x2c, x2t) - jnp.maximum(x1c, x1t), 0.0)
    iy = jnp.maximum(jnp.minimum(y2c, y2t) - jnp.maximum(y1c, y1t), 0.0)
    inter = ix * iy
    union = areac + at - inter
    test = inter > IOU_T * union
    jj = jax.lax.broadcasted_iota(jnp.int32, (k, tw), 0)
    ii = jax.lax.broadcasted_iota(jnp.int32, (k, tw), 1) + t0
    if sorted_prec:
        prec = jj < ii
    else:
        st = s[:, t0:t0 + tw]
        prec = (s_col > st) | ((s_col == st) & (jj < ii))
    return jnp.where(prec & test, 1.0, 0.0)


# --- K1: rebuild tiles per round ------------------------------------------

def _k1_kernel(b_ref, s_ref, sc_ref, o_ref, *, k):
    b = b_ref[0]
    s = s_ref[0]
    s_col = sc_ref[0]
    geom = _geom(b, s, k)
    valid = (s > SCORE_T).astype(jnp.float32)

    def cond(st):
        keep, prev, it = st
        return jnp.logical_and(jnp.any(keep != prev), it < k)

    def body(st):
        keep, _, it = st
        hits = []
        for ti in range(NT):
            sup_t = _sup_tile(geom, s, s_col, ti * 128, 128,
                              sorted_prec=False)
            hits.append(jax.lax.dot(keep, sup_t,
                                    preferred_element_type=jnp.float32))
        hit = jnp.concatenate(hits, axis=1)
        return valid * (1.0 - jnp.minimum(hit, 1.0)), keep, it + jnp.int32(1)

    keep, _, _ = jax.lax.while_loop(
        cond, body, (valid, 1.0 - valid, jnp.int32(0)))
    o_ref[0] = s * keep


# --- K2: Gauss-Seidel column sweeps over materialized sup ------------------

def _k2_kernel(b_ref, s_ref, sc_ref, o_ref, *, k):
    b = b_ref[0]
    s = s_ref[0]
    s_col = sc_ref[0]
    geom = _geom(b, s, k)
    sup = jnp.concatenate(
        [_sup_tile(geom, s, s_col, ti * 128, 128, sorted_prec=False)
         for ti in range(NT)], axis=1)           # (k, k) once
    valid = (s > SCORE_T).astype(jnp.float32)

    def cond(st):
        keep, prev, it = st
        return jnp.logical_and(jnp.any(keep != prev), it < k)

    def body(st):
        keep, _, it = st
        prev = keep
        for ti in range(NT):
            t0 = ti * 128
            hit_t = jax.lax.dot(keep, sup[:, t0:t0 + 128],
                                preferred_element_type=jnp.float32)
            new_t = valid[:, t0:t0 + 128] * (1.0 - jnp.minimum(hit_t, 1.0))
            # dynamic_update_slice is unimplemented in Mosaic; static
            # slice + concat instead
            parts = ([keep[:, :t0]] if t0 else []) + [new_t]
            if t0 + 128 < keep.shape[1]:
                parts.append(keep[:, t0 + 128:])
            keep = jnp.concatenate(parts, axis=1)
        return keep, prev, it + jnp.int32(1)

    keep, _, _ = jax.lax.while_loop(
        cond, body, (valid, 1.0 - valid, jnp.int32(0)))
    o_ref[0] = s * keep


# K3 (sorted-input forward substitution) was DROPPED: the wrapper-side
# sort+gather alone measured 3.24 ms at (G=672, k=640) — more than the
# whole shipped kernel (see SORT row in docs/nms_kernel_r5.json).


def run_variant(kernel_fn, bx, sc):
    g, k, _ = bx.shape
    sf = sc.astype(jnp.float32)

    @jax.jit
    def fn(bxx, scc):
        scf = scc.astype(jnp.float32)
        out = pl.pallas_call(
            functools.partial(kernel_fn, k=k),
            grid=(g,),
            in_specs=[pl.BlockSpec((1, k, 4), lambda i: (i, 0, 0)),
                      pl.BlockSpec((1, 1, k), lambda i: (i, 0, 0)),
                      pl.BlockSpec((1, k, 1), lambda i: (i, 0, 0))],
            out_specs=pl.BlockSpec((1, 1, k), lambda i: (i, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((g, 1, k), jnp.float32),
        )(bxx, scf.reshape(g, 1, k), scf.reshape(g, k, 1))
        return out.reshape(g, k)
    return fn


results = {}
cand = jax.device_put(jnp.asarray(boxes))
sc = jax.device_put(jnp.asarray(scores))
cand_p = jax.device_put(jnp.asarray(boxes_p))
sc_p = jax.device_put(jnp.asarray(scores_p))

exact = np.asarray(nms_keep_scores(cand, sc, iou_t=IOU_T, score_t=SCORE_T))

variants = {
    "K1_tile_rebuild": (_k1_kernel, cand_p, sc_p, False),
    "K2_gauss_seidel": (_k2_kernel, cand_p, sc_p, False),
}

# correctness on-device first; record Mosaic rejections instead of dying
dead = set()
for name, (kfn, bx, scx, is_sorted) in variants.items():
    try:
        got = np.asarray(run_variant(kfn, bx, scx)(bx, scx))
    except Exception as e:
        msg = str(e).splitlines()[0][:200]
        print(f"{name}: COMPILE/RUN FAILED — {msg}", flush=True)
        results[name] = {"error": msg}
        dead.add(name)
        continue
    if is_sorted:
        # map back: got is in sorted order; exact is in original order
        back = np.zeros_like(got)
        np.put_along_axis(back, order, got, axis=1)
        got_cmp = back[:, :K]
    else:
        got_cmp = got[:, :K]
    ok = bool(((got_cmp > 0) == (exact > 0)).all()
              and np.allclose(got_cmp, exact, rtol=1e-6))
    print(f"{name}: exact={ok}", flush=True)
    results[name] = {"exact": ok}
    if not ok:
        dead.add(name)


def timeit(label, fn, bx, scx):
    import time
    @jax.jit
    def looped(b2, s2, iters):
        def body(i, carry):
            bb, ss = carry
            out = fn(bb, ss)
            t = jnp.sum(jnp.square(out))
            bump = (t > jnp.float32(3e38)).astype(jnp.float32)
            return bb + bump, ss + bump
        f = jax.lax.fori_loop(0, iters, body, (b2, s2))
        return jnp.sum(f[0][0, :1])

    def t(it):
        t0 = time.perf_counter()
        float(jax.device_get(looped(bx, scx, jnp.int32(it))))
        return time.perf_counter() - t0

    t(1)
    loop = 64
    while True:
        d = float(np.median([t(1 + loop) - t(1) for _ in range(3)]))
        if d >= 0.4 or loop >= 1 << 18:
            break
        loop = min(max(int(loop * 0.4 * 1.3 / max(d, 1e-4)) + 1, loop * 2),
                   1 << 18)
    d = float(np.median([t(1 + loop) - t(1) for _ in range(5)]))
    ms = d / loop * 1e3
    print(f"{label:20s} {ms:7.3f} ms/batch", flush=True)
    return round(ms, 3)


results["K0_shipped"] = {"ms": timeit(
    "K0_shipped",
    lambda b2, s2: nms_keep_scores(b2, s2, iou_t=IOU_T, score_t=SCORE_T),
    cand, sc)}
for name, (kfn, bx, scx, _) in variants.items():
    if name not in dead:
        results[name]["ms"] = timeit(name, run_variant(kfn, bx, scx),
                                     bx, scx)

# the K3 wrapper cost: sort + gather at (G, KP)
@jax.jit
def sort_gather(b2, s2):
    idx = jnp.argsort(-s2, axis=1, stable=True)
    ss = jnp.take_along_axis(s2, idx, axis=1)
    bs_ = jnp.take_along_axis(b2, idx[..., None], axis=1)
    return bs_, ss

results["SORT_gather"] = {"ms": timeit(
    "SORT_gather", lambda b2, s2: sort_gather(b2, s2)[0].sum(axis=(1, 2),
                                                            keepdims=True),
    cand_p, sc_p)}

out = "/root/repo/docs/nms_kernel_r5.json"
json.dump(results, open(out, "w"), indent=1)
print("wrote", out, flush=True)
