"""Pallas NMS core — the multiclass_nms hot loop as ONE VMEM-resident
kernel per (image, class) instance.

Why: the XLA lowering of the Jacobi greedy-NMS fixed point (see
ops/detection.py _nms_single_class) keeps the (k, k) IoU/suppression
matrices in HBM and re-reads them every round: at SSD-MobileNetV1 shapes
(b32, 21 classes, k=400) that is ~672 x 320 KB x ~5 rounds of traffic, and
the measured per-op profile attributes 7.6 ms of the 10.0 ms batch to the
NMS op alone. Here each grid program builds its instance's IoU once in
VMEM (~2 MB scratch), runs the fixed point to convergence without touching
HBM, and writes back only the (k,) kept-score vector. HBM traffic drops
from ~1 GB to ~10 MB per batch.

Semantics match ops/detection.py exactly (same Jacobi recurrence
``keep[i] = valid[i] and no kept j<i suppresses i``; candidates are
score-descending so the suppression matrix is the strict lower triangle of
the symmetric IoU test). Two micro-differences, both value-preserving:

- ``iou > t`` is evaluated as ``inter > t * union`` (no VPU divide;
  union >= 0 always, equality only at inter == union == 0 where both
  formulations say "no suppression").
- each round's "suppressed by a kept j" reduction runs as an f32 matvec
  ``S @ keep`` on the MXU instead of a masked any-reduce on the VPU.

Reference: lite/backends/arm/math/multiclass_nms (host scalar loops in the
reference; the TPU-native design replaces the data-dependent greedy scan
with a fixed-point of identical result).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def _nms_kernel(b_ref, s_ref, sc_ref, o_ref, *, iou_t: float, score_t: float,
                k: int):
    # NOTE (r5, measured): an empty-instance guard (`pl.when(any(s >
    # score_t))` around the whole body, zeros otherwise) was tried and
    # REVERTED — wrapping the body in a predicate cost ~10% whole-model on
    # SSD b32 (int8 5,002 -> 4,488 img/s) even though every bench instance
    # is non-empty: the branch defeats Mosaic's grid pipelining.  Sparse
    # real-data skipping would need a cheaper mechanism than a body-wide
    # predicate.
    b = b_ref[0]          # (k, 4) f32 candidate boxes (any order)
    s = s_ref[0]          # (1, k) f32 candidate scores; the (G, 1, k) and
    s_col = sc_ref[0]     # (k, 1) f32 duplicate — row and column layouts
    #                       both ride shapes whose last two block dims equal
    #                       the array's (Mosaic rule), and having both
    #                       avoids an in-kernel (1,k)->(k,1) relayout

    x1c, y1c = b[:, 0:1], b[:, 1:2]          # (k, 1)
    x2c, y2c = b[:, 2:3], b[:, 3:4]
    x1r, y1r = x1c.reshape(1, k), y1c.reshape(1, k)   # (1, k)
    x2r, y2r = x2c.reshape(1, k), y2c.reshape(1, k)

    wc = jnp.maximum(x2c - x1c, 0.0)
    hc = jnp.maximum(y2c - y1c, 0.0)
    areac = wc * hc                           # (k, 1)
    arear = areac.reshape(1, k)               # (1, k)

    ix = jnp.maximum(jnp.minimum(x2c, x2r) - jnp.maximum(x1c, x1r), 0.0)
    iy = jnp.maximum(jnp.minimum(y2c, y2r) - jnp.maximum(y1c, y1r), 0.0)
    inter = ix * iy                           # (k, k)
    union = areac + arear - inter
    # U[j, i] = "j would suppress i": greedy precedence is higher score
    # first, ties broken by lower slot index. Deriving precedence from the
    # score comparison (rather than assuming score-descending input and
    # using the iota triangle alone) lets candidates arrive UNSORTED — for
    # sorted input the matrix is identical to the strict upper triangle.
    # The fixed point runs entirely on (1, k) ROW vectors — Mosaic's vector
    # lowering has no lane-broadcast for (k, 1) columns inside while bodies
    # — with each round one (1,k)@(k,k) vec-mat product on the MXU.
    jlt = (jax.lax.broadcasted_iota(jnp.int32, (k, k), 0)
           < jax.lax.broadcasted_iota(jnp.int32, (k, k), 1))
    prec = (s_col > s) | ((s_col == s) & jlt)     # (k, k): row j beats col i
    sup = jnp.where(prec & (inter > iou_t * union), 1.0, 0.0)  # (k, k) f32

    valid = (s > score_t).astype(jnp.float32)   # (1, k)

    def cond(state):
        keep, prev, it = state
        return jnp.logical_and(jnp.any(keep != prev), it < k)

    def body(state):
        keep, _, it = state
        # suppressed[i] = any kept j<i with IoU>t  ==  (keep @ U)[i] > 0
        hit = jax.lax.dot(keep, sup,
                          preferred_element_type=jnp.float32)
        return valid * (1.0 - jnp.minimum(hit, 1.0)), keep, it + jnp.int32(1)

    keep, _, _ = jax.lax.while_loop(cond, body, (valid, 1.0 - valid,
                                                 jnp.int32(0)))
    o_ref[0] = s * keep


@functools.partial(jax.jit, static_argnames=("iou_t", "score_t", "interpret"))
def nms_keep_scores(cand_boxes, cand_scores, *, iou_t: float, score_t: float,
                    interpret: bool = False):
    """Batched greedy-NMS cores.

    cand_boxes: (G, k, 4) f32 per-instance candidates in ANY order (greedy
    precedence is by score, ties by slot index — for score-descending input
    this matches _nms_single_class exactly); cand_scores: (G, k) f32.
    Returns (G, k) f32 scores with suppressed/invalid entries zeroed.
    """
    from jax.experimental import pallas as pl

    g, k, _ = cand_boxes.shape
    scores_f = cand_scores.astype(jnp.float32)
    out = pl.pallas_call(
        functools.partial(_nms_kernel, iou_t=float(iou_t),
                          score_t=float(score_t), k=k),
        grid=(g,),
        in_specs=[
            pl.BlockSpec((1, k, 4), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, 1, k), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, k, 1), lambda i: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, 1, k), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((g, 1, k), jnp.float32),
        interpret=interpret,
    )(cand_boxes.astype(jnp.float32),
      scores_f.reshape(g, 1, k), scores_f.reshape(g, k, 1))
    return out.reshape(g, k)


def nms_reference(cand_boxes, cand_scores, *, iou_t, score_t):
    """Plain-numpy sequential greedy NMS (the arena baseline)."""
    g, k, _ = cand_boxes.shape
    out = np.zeros((g, k), np.float32)
    for gi in range(g):
        b = np.asarray(cand_boxes[gi], np.float64)
        s = np.asarray(cand_scores[gi], np.float64)
        area = np.maximum(b[:, 2] - b[:, 0], 0) * np.maximum(
            b[:, 3] - b[:, 1], 0)
        kept = []
        # greedy order: score-descending, ties by slot index (stable sort)
        for i in np.argsort(-s, kind="stable"):
            if s[i] <= score_t:
                continue
            ok = True
            for j in kept:
                ix = max(min(b[i, 2], b[j, 2]) - max(b[i, 0], b[j, 0]), 0.0)
                iy = max(min(b[i, 3], b[j, 3]) - max(b[i, 1], b[j, 1]), 0.0)
                inter = ix * iy
                union = area[i] + area[j] - inter
                if inter > iou_t * union:
                    ok = False
                    break
            if ok:
                kept.append(i)
                out[gi, i] = s[i]
    return out
