"""Long-tail fluid operator coverage, round 2 — the remainder of
``lite/operators/`` toward the reference's ~200-op surface: scatter/gather
family, index/slice variants, fill/range constants, extra activations,
pooling-with-index, matrix NMS, and misc tensor math.

Static-shape notes (TPU/XLA contract): ops whose fluid semantics are
value-dependent (``range``, ``linspace``, ``sequence_mask`` max length)
take their sizes from attrs — the importer folds constant inputs into
attrs; truly dynamic-shape ops (``where_index``/nonzero, ``unique``) are
intentionally unsupported (no static lowering exists; the five BASELINE
model families do not use them).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..core.registry import OPS
from .common import normalize_2d, normalize_paddings


def _same(attrs, in_shapes):
    return [in_shapes[0]]


def _reg(name, shape_fn, impl, **kw):
    OPS.register(name, infer_shape=shape_fn, **kw)
    OPS.get(name).impls["xla"] = impl


# ---- elementwise-unary long tail -------------------------------------------

def _unary(fn):
    def impl(ctx, op, ins):
        return {"Out": [fn(ins["X"][0], op.attrs)]}
    return impl


_reg("pow", _same, _unary(lambda x, a: jnp.power(x, a.get("factor", 1.0))))
_reg("increment", _same, _unary(lambda x, a: x + a.get("step", 1.0)))
_reg("thresholded_relu", _same,
     _unary(lambda x, a: jnp.where(x > a.get("threshold", 1.0), x, 0.0)))
_reg("brelu", _same,
     _unary(lambda x, a: jnp.clip(x, a.get("t_min", 0.0), a.get("t_max", 24.0))))
_reg("hard_shrink", _same,
     _unary(lambda x, a: jnp.where(jnp.abs(x) > a.get("threshold", 0.5), x, 0.0)))
_reg("softshrink", _same,
     _unary(lambda x, a: jnp.sign(x)
            * jnp.maximum(jnp.abs(x) - a.get("lambda", 0.5), 0.0)))
_reg("tanh_shrink", _same, _unary(lambda x, a: x - jnp.tanh(x)))
_reg("log_softmax", _same,
     _unary(lambda x, a: jax.nn.log_softmax(x, axis=int(a.get("axis", -1)))))
_reg("fill_any_like", _same,
     _unary(lambda x, a: jnp.full_like(x, a.get("value", 0.0))))
_reg("fill_zeros_like", _same, _unary(lambda x, a: jnp.zeros_like(x)))
_reg("clip_by_norm", _same,
     _unary(lambda x, a: x * jnp.minimum(
         1.0, a.get("max_norm", 1.0)
         / jnp.maximum(jnp.sqrt(jnp.sum(jnp.square(x))), 1e-12))))
_reg("lod_reset", _same, _unary(lambda x, a: x))  # dense tensors: identity

for _b, _fn in (("bitwise_and", jnp.bitwise_and), ("bitwise_or", jnp.bitwise_or),
                ("bitwise_xor", jnp.bitwise_xor)):
    def _mk(fn):
        def impl(ctx, op, ins):
            return {"Out": [fn(ins["X"][0], ins["Y"][0])]}
        return impl
    _reg(_b, _same, _mk(_fn), input_slots=("X", "Y"))
_reg("bitwise_not", _same, _unary(lambda x, a: jnp.bitwise_not(x)))


# ---- constants / ranges ------------------------------------------------------

def _range_shape(attrs, in_shapes):
    start, end, step = (float(attrs["start"]), float(attrs["end"]),
                        float(attrs.get("step", 1.0)))
    n = max(int(np.ceil((end - start) / step)), 0)
    return [(n,)]


def _range_impl(ctx, op, ins):
    a = op.attrs
    dt = jnp.dtype(a.get("dtype", "float32"))
    return {"Out": [jnp.arange(a["start"], a["end"], a.get("step", 1.0),
                               dtype=dt)]}


_reg("range", _range_shape, _range_impl)


def _linspace_shape(attrs, in_shapes):
    return [(int(attrs["num"]),)]


_reg("linspace", _linspace_shape,
     lambda ctx, op, ins: {"Out": [jnp.linspace(
         op.attrs["start"], op.attrs["stop"], int(op.attrs["num"]),
         dtype=jnp.dtype(op.attrs.get("dtype", "float32")))]})


def _fcbsl_shape(attrs, in_shapes):
    shape = [int(s) for s in attrs["shape"]]
    in_idx = int(attrs.get("input_dim_idx", 0))
    out_idx = int(attrs.get("output_dim_idx", 0))
    shape[out_idx] = in_shapes[0][in_idx]
    return [tuple(shape)]


def _fcbsl_impl(ctx, op, ins):
    out_shape = ctx.var_shape(op.output("Out"))
    dt = jnp.dtype(op.attrs.get("dtype", "float32"))
    return {"Out": [jnp.full(out_shape, op.attrs.get("value", 0.0), dtype=dt)]}


_reg("fill_constant_batch_size_like", _fcbsl_shape, _fcbsl_impl,
     input_slots=("Input",))


def _assign_value_shape(attrs, in_shapes):
    return [tuple(int(s) for s in attrs["shape"])]


def _assign_value_impl(ctx, op, ins):
    a = op.attrs
    if a.get("fp32_values"):
        vals = jnp.asarray(a["fp32_values"], jnp.float32)
    elif a.get("int32_values"):
        vals = jnp.asarray(a["int32_values"], jnp.int32)
    else:
        vals = jnp.asarray(a.get("int64_values", []), jnp.int64)
    return {"Out": [vals.reshape([int(s) for s in a["shape"]])]}


_reg("assign_value", _assign_value_shape, _assign_value_impl)


# ---- expand / tile variants ---------------------------------------------------

def _expand_v2_shape(attrs, in_shapes):
    x = list(in_shapes[0])
    target = [int(s) for s in attrs["shape"]]
    # align trailing; -1 keeps the input dim
    out = list(target)
    for i in range(1, len(x) + 1):
        if out[-i] == -1:
            out[-i] = x[-i]
    return [tuple(out)]


def _expand_v2_impl(ctx, op, ins):
    return {"Out": [jnp.broadcast_to(ins["X"][0],
                                     ctx.var_shape(op.output("Out")))]}


_reg("expand_v2", _expand_v2_shape, _expand_v2_impl)


def _expand_as_shape(attrs, in_shapes):
    return [in_shapes[1]]


_reg("expand_as_v2", _expand_as_shape,
     lambda ctx, op, ins: {"Out": [jnp.broadcast_to(ins["X"][0],
                                                    ins["Y"][0].shape)]},
     input_slots=("X", "Y"))


# ---- scatter / gather family ---------------------------------------------------

def _scatter_impl(ctx, op, ins):
    x, ids, upd = (jnp.asarray(ins["X"][0]), ins["Ids"][0],
                   ins["Updates"][0])
    ids = ids.reshape(-1).astype(jnp.int32)
    if op.attrs.get("overwrite", True):
        return {"Out": [x.at[ids].set(upd)]}
    return {"Out": [x.at[ids].add(upd)]}


_reg("scatter", _same, _scatter_impl, input_slots=("X", "Ids", "Updates"))


def _scatter_nd_add_impl(ctx, op, ins):
    x, idx, upd = (jnp.asarray(ins["X"][0]), ins["Index"][0],
                   ins["Updates"][0])
    return {"Out": [x.at[tuple(jnp.moveaxis(idx.astype(jnp.int32), -1, 0))]
                    .add(upd)]}


_reg("scatter_nd_add", _same, _scatter_nd_add_impl,
     input_slots=("X", "Index", "Updates"))


def _gather_nd_shape(attrs, in_shapes):
    x, idx = in_shapes[0], in_shapes[1]
    return [tuple(idx[:-1]) + tuple(x[idx[-1]:])]


def _gather_nd_impl(ctx, op, ins):
    x, idx = ins["X"][0], ins["Index"][0]
    return {"Out": [x[tuple(jnp.moveaxis(idx.astype(jnp.int32), -1, 0))]]}


_reg("gather_nd", _gather_nd_shape, _gather_nd_impl,
     input_slots=("X", "Index"))


def _index_select_shape(attrs, in_shapes):
    x = list(in_shapes[0])
    x[int(attrs.get("dim", 0))] = in_shapes[1][0]
    return [tuple(x)]


_reg("index_select", _index_select_shape,
     lambda ctx, op, ins: {"Out": [jnp.take(
         ins["X"][0], ins["Index"][0].astype(jnp.int32),
         axis=int(op.attrs.get("dim", 0)))]},
     input_slots=("X", "Index"))


# ---- slicing / reordering -------------------------------------------------------

def _strided_slice_shape(attrs, in_shapes):
    x = list(in_shapes[0])
    for ax, st, en, sd in zip(attrs["axes"], attrs["starts"], attrs["ends"],
                              attrs.get("strides", [1] * len(attrs["axes"]))):
        dim = x[ax]
        st = max(st + dim, 0) if st < 0 else min(st, dim)
        en = max(en + dim, -1) if en < 0 else min(en, dim)
        x[ax] = max(0, (en - st + (sd - (1 if sd > 0 else -1))) // sd)
    return [tuple(x)]


def _strided_slice_impl(ctx, op, ins):
    x = ins["X"][0]
    idx = [slice(None)] * x.ndim
    for ax, st, en, sd in zip(op.attrs["axes"], op.attrs["starts"],
                              op.attrs["ends"],
                              op.attrs.get("strides",
                                           [1] * len(op.attrs["axes"]))):
        idx[ax] = slice(st, en, sd)
    return {"Out": [x[tuple(idx)]]}


_reg("strided_slice", _strided_slice_shape, _strided_slice_impl)

_reg("flip", _same,
     lambda ctx, op, ins: {"Out": [jnp.flip(ins["X"][0],
                                            axis=tuple(op.attrs["axis"]))]})
_reg("reverse", _same,
     lambda ctx, op, ins: {"Out": [jnp.flip(ins["X"][0],
                                            axis=tuple(op.attrs["axis"]))]})
_reg("roll", _same,
     lambda ctx, op, ins: {"Out": [jnp.roll(
         ins["X"][0], [int(s) for s in op.attrs["shifts"]],
         axis=[int(a) for a in op.attrs["axis"]])]})


def _unbind_shape(attrs, in_shapes):
    x = list(in_shapes[0])
    axis = int(attrs.get("axis", 0)) % len(x)
    n = x[axis]
    rest = tuple(x[:axis] + x[axis + 1:])
    return [rest] * n


def _unbind_impl(ctx, op, ins):
    x = ins["X"][0]
    axis = int(op.attrs.get("axis", 0)) % x.ndim
    return {"Out": [jnp.squeeze(s, axis=axis)
                    for s in jnp.split(x, x.shape[axis], axis=axis)]}


_reg("unbind", _unbind_shape, _unbind_impl)


def _crop_shape(attrs, in_shapes):
    return [tuple(int(s) for s in attrs["shape"])]


def _crop_impl(ctx, op, ins):
    x = ins["X"][0]
    offs = [int(o) for o in op.attrs.get("offsets", [0] * x.ndim)]
    shape = [int(s) for s in op.attrs["shape"]]
    return {"Out": [jax.lax.dynamic_slice(x, offs, shape)]}


_reg("crop", _crop_shape, _crop_impl)
_reg("crop_tensor", _crop_shape, _crop_impl)


# ---- sort / argminmax ------------------------------------------------------------

def _argsort_shape(attrs, in_shapes):
    return [in_shapes[0], in_shapes[0]]


def _argsort_impl(ctx, op, ins):
    x = ins["X"][0]
    axis = int(op.attrs.get("axis", -1))
    if op.attrs.get("descending", False):
        idx = jnp.argsort(-x, axis=axis)
    else:
        idx = jnp.argsort(x, axis=axis)
    out = jnp.take_along_axis(x, idx, axis=axis)
    return {"Out": [out], "Indices": [idx.astype(jnp.int64)]}


OPS.register("argsort", infer_shape=_argsort_shape,
             output_slots=("Out", "Indices"))
OPS.get("argsort").impls["xla"] = _argsort_impl


def _argminmax_shape(attrs, in_shapes):
    x = list(in_shapes[0])
    axis = int(attrs.get("axis", -1)) % len(x)
    if attrs.get("keepdims", False):
        x[axis] = 1
        return [tuple(x)]
    return [tuple(x[:axis] + x[axis + 1:])]


_reg("arg_min", _argminmax_shape,
     lambda ctx, op, ins: {"Out": [jnp.argmin(
         ins["X"][0], axis=int(op.attrs.get("axis", -1)),
         keepdims=bool(op.attrs.get("keepdims", False))).astype(jnp.int64)]})


# ---- reductions / norms ------------------------------------------------------------

def _mean_shape(attrs, in_shapes):
    return [(1,)]


_reg("mean", _mean_shape,
     lambda ctx, op, ins: {"Out": [jnp.mean(ins["X"][0]).reshape(1)]})


def _size_shape(attrs, in_shapes):
    return [(1,)]


_reg("size", _size_shape,
     lambda ctx, op, ins: {"Out": [jnp.asarray(
         [np.prod(ins["Input"][0].shape)], jnp.int64)]},
     input_slots=("Input",))


def _p_norm_shape(attrs, in_shapes):
    x = list(in_shapes[0])
    axis = int(attrs.get("axis", -1)) % len(x)
    if attrs.get("keepdim", False):
        x[axis] = 1
        return [tuple(x)]
    return [tuple(x[:axis] + x[axis + 1:])]


def _p_norm_impl(ctx, op, ins):
    x = ins["X"][0]
    p = float(op.attrs.get("porder", 2.0))
    axis = int(op.attrs.get("axis", -1))
    keep = bool(op.attrs.get("keepdim", False))
    out = jnp.sum(jnp.abs(x) ** p, axis=axis, keepdims=keep) ** (1.0 / p)
    return {"Out": [out]}


_reg("p_norm", _p_norm_shape, _p_norm_impl)


def _cos_sim_shape(attrs, in_shapes):
    return [tuple(in_shapes[0][:-1]) + (1,)]


def _cos_sim_impl(ctx, op, ins):
    x, y = ins["X"][0], ins["Y"][0]
    num = jnp.sum(x * y, axis=-1, keepdims=True)
    den = (jnp.linalg.norm(x, axis=-1, keepdims=True)
           * jnp.linalg.norm(y, axis=-1, keepdims=True))
    return {"Out": [num / jnp.maximum(den, 1e-12)]}


_reg("cos_sim", _cos_sim_shape, _cos_sim_impl, input_slots=("X", "Y"))


# ---- matmul variants ---------------------------------------------------------------

def _bmm_shape(attrs, in_shapes):
    x, y = in_shapes[0], in_shapes[1]
    return [(x[0], x[1], y[2])]


_reg("bmm", _bmm_shape,
     lambda ctx, op, ins: {"Out": [jnp.matmul(
         ins["X"][0], ins["Y"][0],
         preferred_element_type=jnp.float32)]},
     input_slots=("X", "Y"))


# ---- channel-affine / shuffles -------------------------------------------------------

def _affine_channel_impl(ctx, op, ins):
    # NHWC: scale/bias broadcast over the trailing channel axis
    x, s, b = ins["X"][0], ins["Scale"][0], ins["Bias"][0]
    return {"Out": [x * s + b]}


_reg("affine_channel", _same, _affine_channel_impl,
     input_slots=("X", "Scale", "Bias"))


def _pixel_unshuffle_shape(attrs, in_shapes):
    n, h, w, c = in_shapes[0]
    r = int(attrs.get("downscale_factor", 2))
    return [(n, h // r, w // r, c * r * r)]


def _pixel_unshuffle_impl(ctx, op, ins):
    x = ins["X"][0]
    n, h, w, c = x.shape
    r = int(op.attrs.get("downscale_factor", 2))
    y = (x.reshape(n, h // r, r, w // r, r, c)
          .transpose(0, 1, 3, 2, 4, 5)
          .reshape(n, h // r, w // r, r * r * c))
    return {"Out": [y]}


_reg("pixel_unshuffle", _pixel_unshuffle_shape, _pixel_unshuffle_impl)


# ---- pad3d -----------------------------------------------------------------------------

def _pad3d_shape(attrs, in_shapes):
    n, d, h, w, c = in_shapes[0]
    p = attrs["paddings"]  # [front, back, top, bottom, left, right]
    return [(n, d + p[0] + p[1], h + p[2] + p[3], w + p[4] + p[5], c)]


def _pad3d_impl(ctx, op, ins):
    p = op.attrs["paddings"]
    cfg = ((0, 0), (p[0], p[1]), (p[2], p[3]), (p[4], p[5]), (0, 0))
    return {"Out": [jnp.pad(ins["X"][0], cfg,
                            constant_values=op.attrs.get("value", 0.0))]}


_reg("pad3d", _pad3d_shape, _pad3d_impl)


# ---- sequence_mask (dense) --------------------------------------------------------------

def _sequence_mask_shape(attrs, in_shapes):
    maxlen = int(attrs["maxlen"])  # static requirement (see module docstring)
    return [tuple(in_shapes[0]) + (maxlen,)]


def _sequence_mask_impl(ctx, op, ins):
    x = ins["X"][0]
    maxlen = int(op.attrs["maxlen"])
    ar = jnp.arange(maxlen)
    mask = ar[None, :] < x.reshape(-1, 1)
    dt = jnp.dtype(op.attrs.get("out_dtype", "float32"))
    return {"Y": [mask.reshape(tuple(x.shape) + (maxlen,)).astype(dt)]}


OPS.register("sequence_mask", infer_shape=_sequence_mask_shape,
             output_slots=("Y",))
OPS.get("sequence_mask").impls["xla"] = _sequence_mask_impl


# ---- max_pool2d_with_index ----------------------------------------------------------------

def _max_pool_index_shape(attrs, in_shapes):
    n, h, w, c = in_shapes[0]
    kh, kw = normalize_2d(attrs.get("ksize", (2, 2)))
    sh, sw = normalize_2d(attrs.get("strides", (kh, kw)))
    (ph0, ph1), (pw0, pw1) = normalize_paddings(attrs.get("paddings", (0, 0)))
    oh = (h + ph0 + ph1 - kh) // sh + 1
    ow = (w + pw0 + pw1 - kw) // sw + 1
    return [(n, oh, ow, c), (n, oh, ow, c)]


def _max_pool_index_impl(ctx, op, ins):
    """Max pool returning flat NCHW-style indices (h*W + w per channel,
    matching fluid's Mask semantics). Patches via
    ``conv_general_dilated_patches`` keep everything static-shape."""
    x = ins["X"][0]
    n, h, w, c = x.shape
    a = op.attrs
    kh, kw = normalize_2d(a.get("ksize", (2, 2)))
    sh, sw = normalize_2d(a.get("strides", (kh, kw)))
    pads = normalize_paddings(a.get("paddings", (0, 0)))
    patches = jax.lax.conv_general_dilated_patches(
        x, (kh, kw), (sh, sw), [pads[0], pads[1]],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    oh, ow = patches.shape[1], patches.shape[2]
    # patches channel order: (c, kh, kw)
    p = patches.reshape(n, oh, ow, c, kh * kw)
    out = jnp.max(p, axis=-1)
    k_idx = jnp.argmax(p, axis=-1)
    dh, dw = k_idx // kw, k_idx % kw
    oy = (jnp.arange(oh) * sh - pads[0][0]).reshape(1, oh, 1, 1)
    ox = (jnp.arange(ow) * sw - pads[1][0]).reshape(1, 1, ow, 1)
    flat = (oy + dh) * w + (ox + dw)
    return {"Out": [out], "Mask": [flat.astype(jnp.int32)]}


OPS.register("max_pool2d_with_index", infer_shape=_max_pool_index_shape,
             output_slots=("Out", "Mask"))
OPS.get("max_pool2d_with_index").impls["xla"] = _max_pool_index_impl


# ---- box_clip / matrix_nms (detection long tail) ---------------------------------------------

def _box_clip_impl(ctx, op, ins):
    boxes, im_info = ins["Input"][0], ins["ImInfo"][0]
    # im_info rows: (h, w, scale); boxes (..., 4) xyxy
    h = im_info[..., 0].reshape(-1, *([1] * (boxes.ndim - 1)))
    w = im_info[..., 1].reshape(-1, *([1] * (boxes.ndim - 1)))
    x1, y1, x2, y2 = jnp.split(boxes, 4, axis=-1)
    return {"Output": [jnp.concatenate([
        jnp.clip(x1, 0, w - 1), jnp.clip(y1, 0, h - 1),
        jnp.clip(x2, 0, w - 1), jnp.clip(y2, 0, h - 1)], axis=-1)]}


OPS.register("box_clip",
             infer_shape=lambda attrs, in_shapes: [in_shapes[0]],
             input_slots=("Input", "ImInfo"), output_slots=("Output",))
OPS.get("box_clip").impls["xla"] = _box_clip_impl


def _matrix_nms_shape(attrs, in_shapes):
    n, c, m = in_shapes[1]  # Scores (N, C, M)
    keep = int(attrs.get("keep_top_k", 100))
    if keep < 0:
        keep = c * m
    return [(n, keep, 6)]


def _matrix_nms_impl(ctx, op, ins):
    """Matrix NMS (decayed-score soft suppression) — unlike greedy NMS this
    is one dense matrix computation, a natural TPU fit: decay_ij =
    min over the IoU matrix transform, no sequential dependence."""
    bboxes, scores = ins["BBoxes"][0], ins["Scores"][0]
    a = op.attrs
    score_thr = float(a.get("score_threshold", 0.05))
    post_thr = float(a.get("post_threshold", 0.0))
    keep_top_k = int(a.get("keep_top_k", 100))
    gaussian = bool(a.get("use_gaussian", False))
    sigma = float(a.get("gaussian_sigma", 2.0))
    n, c, m = scores.shape
    if keep_top_k < 0:
        keep_top_k = c * m

    def area(b):
        return jnp.maximum(b[..., 2] - b[..., 0], 0) * \
            jnp.maximum(b[..., 3] - b[..., 1], 0)

    def iou(b):  # (M,4) -> (M,M)
        tl = jnp.maximum(b[:, None, :2], b[None, :, :2])
        br = jnp.minimum(b[:, None, 2:], b[None, :, 2:])
        inter = jnp.prod(jnp.maximum(br - tl, 0), axis=-1)
        ar = area(b)
        return inter / jnp.maximum(ar[:, None] + ar[None, :] - inter, 1e-10)

    tri = jnp.tril(jnp.ones((m, m), bool), k=-1)

    def per_class(boxes_b, scores_bc):
        # sort by score desc; suppression only from higher-scored boxes
        s = jnp.where(scores_bc >= score_thr, scores_bc, 0.0)
        order = jnp.argsort(-s)
        s = s[order]
        b = boxes_b[order]
        lower = jnp.where(tri, iou(b), 0.0)      # lower[j,i]=iou(j,i), i<j
        compensate = jnp.max(lower, axis=1)      # per box i: its own max iou
        if gaussian:
            decay_mat = jnp.exp(-(jnp.square(lower)
                                  - jnp.square(compensate)[None, :]) / sigma)
        else:
            decay_mat = ((1.0 - lower)
                         / jnp.maximum(1.0 - compensate[None, :], 1e-10))
        decay = jnp.min(jnp.where(tri, decay_mat, 1.0), axis=1)
        return decay * s, b

    # vmap classes within a batch item, then the batch
    per_image = jax.vmap(per_class, in_axes=(None, 0))  # over classes

    def one_image(boxes_b, scores_b):
        ds, bx = per_image(boxes_b, scores_b)    # (C, M), (C, M, 4)
        cl = jnp.broadcast_to(jnp.arange(c, dtype=jnp.float32)[:, None],
                              (c, m)).reshape(-1)
        sc = jnp.where(ds.reshape(-1) >= post_thr, ds.reshape(-1), 0.0)
        k = min(keep_top_k, sc.shape[0])
        top_s, top_i = jax.lax.top_k(sc, k)
        row = jnp.concatenate([
            cl[top_i][:, None], top_s[:, None],
            bx.reshape(-1, 4)[top_i]], axis=-1)
        if k < keep_top_k:
            row = jnp.pad(row, ((0, keep_top_k - k), (0, 0)),
                          constant_values=-1.0)
        return row

    return {"Out": [jax.vmap(one_image)(bboxes, scores)]}


OPS.register("matrix_nms", infer_shape=_matrix_nms_shape,
             input_slots=("BBoxes", "Scores"))
OPS.get("matrix_nms").impls["xla"] = _matrix_nms_impl


# ---- grid_sampler (TPS/STN rec models) -------------------------------------------------------

def _grid_sampler_shape(attrs, in_shapes):
    n, h, w, c = in_shapes[0]
    gh, gw = in_shapes[1][1], in_shapes[1][2]
    return [(n, gh, gw, c)]


def _grid_sampler_impl(ctx, op, ins):
    """Bilinear grid sample, zeros padding, align_corners per attr.
    Grid holds (x, y) in [-1, 1] (fluid convention)."""
    x, grid = ins["X"][0], ins["Grid"][0]
    n, h, w, c = x.shape
    align = bool(op.attrs.get("align_corners", True))
    gx, gy = grid[..., 0], grid[..., 1]
    if align:
        fx = (gx + 1) * 0.5 * (w - 1)
        fy = (gy + 1) * 0.5 * (h - 1)
    else:
        fx = ((gx + 1) * w - 1) * 0.5
        fy = ((gy + 1) * h - 1) * 0.5
    x0 = jnp.floor(fx)
    y0 = jnp.floor(fy)
    wx = fx - x0
    wy = fy - y0

    def sample(yy, xx):
        valid = ((yy >= 0) & (yy < h) & (xx >= 0) & (xx < w))
        yc = jnp.clip(yy, 0, h - 1).astype(jnp.int32)
        xc = jnp.clip(xx, 0, w - 1).astype(jnp.int32)
        batch = jnp.arange(n).reshape(n, 1, 1)
        v = x[batch, yc, xc]  # (N, gh, gw, C)
        return v * valid[..., None]

    v00 = sample(y0, x0)
    v01 = sample(y0, x0 + 1)
    v10 = sample(y0 + 1, x0)
    v11 = sample(y0 + 1, x0 + 1)
    wx = wx[..., None]
    wy = wy[..., None]
    out = (v00 * (1 - wx) * (1 - wy) + v01 * wx * (1 - wy)
           + v10 * (1 - wx) * wy + v11 * wx * wy)
    return {"Output": [out]}


OPS.register("grid_sampler", infer_shape=_grid_sampler_shape,
             input_slots=("X", "Grid"), output_slots=("Output",))
OPS.get("grid_sampler").impls["xla"] = _grid_sampler_impl


# ---- random (inference determinism: seeded) ---------------------------------------------------

def _rand_shape(attrs, in_shapes):
    return [tuple(int(s) for s in attrs["shape"])]


def _uniform_random_impl(ctx, op, ins):
    a = op.attrs
    key = jax.random.PRNGKey(int(a.get("seed", 0)))
    return {"Out": [jax.random.uniform(
        key, [int(s) for s in a["shape"]],
        minval=a.get("min", -1.0), maxval=a.get("max", 1.0))]}


def _gaussian_random_impl(ctx, op, ins):
    a = op.attrs
    key = jax.random.PRNGKey(int(a.get("seed", 0)))
    return {"Out": [a.get("mean", 0.0) + a.get("std", 1.0)
                    * jax.random.normal(key, [int(s) for s in a["shape"]])]}


_reg("uniform_random", _rand_shape, _uniform_random_impl)
_reg("gaussian_random", _rand_shape, _gaussian_random_impl)
