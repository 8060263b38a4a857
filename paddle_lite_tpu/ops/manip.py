"""Tensor-manipulation ops: reshape/transpose/concat/split/slice/pad/
interpolate/reduce/arg_max/topk/gather/lookup_table/… — the long tail of
``lite/operators/`` ("shape-ish" ops the reference ran on the host backend,
``lite/kernels/host/``).  All are direct jnp lowerings; XLA fuses or
copy-elides them, so none are perf-critical.

Int8 flows through shape-preserving ops unchanged (reshape/transpose/concat
of int8 tensors stay int8 when all operands share one scale — the
precision-cast pass guarantees that), matching the reference's practice of
keeping int8 chains unbroken across layout ops.
"""

from __future__ import annotations

from typing import List

import jax
import jax.numpy as jnp
import numpy as np

from ..core.registry import OPS
from .common import dequantize, normalize_2d


def _same(attrs, in_shapes):
    return [in_shapes[0]]


# ---- reshape family -------------------------------------------------------

@OPS.shape_fn("reshape")
def reshape_shape(attrs, in_shapes):
    x = in_shapes[0]
    shape = list(attrs["shape"])
    n = int(np.prod(x))
    for i, s in enumerate(shape):
        if s == 0:
            shape[i] = x[i]
    if -1 in shape:
        i = shape.index(-1)
        known = int(np.prod([s for s in shape if s != -1]))
        shape[i] = n // known
    return [tuple(shape)]


@OPS.kernel("reshape", "xla")
@OPS.kernel("reshape2", "xla")
def reshape_xla(ctx, op, ins):
    out_shape = ctx.var_shape(op.output("Out"))
    return {"Out": [ins["X"][0].reshape(out_shape)]}


OPS.register("reshape2", infer_shape=reshape_shape)


@OPS.shape_fn("flatten")
def flatten_shape(attrs, in_shapes):
    x = in_shapes[0]
    axis = int(attrs.get("axis", 1))
    lead = int(np.prod(x[:axis])) if axis else 1
    return [(lead, int(np.prod(x[axis:])))]


@OPS.kernel("flatten", "xla")
@OPS.kernel("flatten2", "xla")
def flatten_xla(ctx, op, ins):
    out_shape = ctx.var_shape(op.output("Out"))
    return {"Out": [ins["X"][0].reshape(out_shape)]}


OPS.register("flatten2", infer_shape=flatten_shape)


def _squeeze_shape(attrs, in_shapes):
    x = list(in_shapes[0])
    axes = attrs.get("axes", [])
    if axes:
        keep = [d for i, d in enumerate(x) if i not in [a % len(x) for a in axes]]
    else:
        keep = [d for d in x if d != 1]
    return [tuple(keep)]


OPS.register("squeeze", infer_shape=_squeeze_shape)
OPS.register("squeeze2", infer_shape=_squeeze_shape)


@OPS.kernel("squeeze", "xla")
@OPS.kernel("squeeze2", "xla")
def squeeze_xla(ctx, op, ins):
    return {"Out": [ins["X"][0].reshape(ctx.var_shape(op.output("Out")))]}


def _unsqueeze_shape(attrs, in_shapes):
    x = list(in_shapes[0])
    for a in sorted(attrs["axes"]):
        x.insert(a if a >= 0 else a + len(x) + 1, 1)
    return [tuple(x)]


OPS.register("unsqueeze", infer_shape=_unsqueeze_shape)
OPS.register("unsqueeze2", infer_shape=_unsqueeze_shape)


@OPS.kernel("unsqueeze", "xla")
@OPS.kernel("unsqueeze2", "xla")
def unsqueeze_xla(ctx, op, ins):
    return {"Out": [ins["X"][0].reshape(ctx.var_shape(op.output("Out")))]}


# ---- transpose / concat / split / stack / slice ---------------------------

@OPS.shape_fn("transpose")
def transpose_shape(attrs, in_shapes):
    x = in_shapes[0]
    return [tuple(x[a] for a in attrs["axis"])]


@OPS.kernel("transpose", "xla")
@OPS.kernel("transpose2", "xla")
def transpose_xla(ctx, op, ins):
    return {"Out": [jnp.transpose(ins["X"][0], op.attrs["axis"])]}


OPS.register("transpose2", infer_shape=transpose_shape)


@OPS.shape_fn("concat")
def concat_shape(attrs, in_shapes):
    axis = int(attrs.get("axis", 0))
    out = list(in_shapes[0])
    out[axis] = sum(s[axis] for s in in_shapes)
    return [tuple(out)]


@OPS.kernel("concat", "xla")
def concat_xla(ctx, op, ins):
    """fp32 concat, or — when quantize_pass assigned an int8 region — the
    reference's int8 concat (concat_compute.cc): every input requants to
    the common output scale in-register and the concatenated map never
    materializes in fp32."""
    xs = ins["X"]
    axis = int(op.attrs.get("axis", 0))
    out_scale = op.attrs.get("out_scale")
    if out_scale is not None and all(x.dtype == jnp.int8 for x in xs):
        parts = []
        for x, name in zip(xs, op.inputs["X"]):
            r = float(ctx.var_quant(name).scale[0]) / float(out_scale)
            if r == 1.0:
                parts.append(x)
            else:  # r <= 1 by construction (out scale is the max)
                parts.append(jnp.clip(
                    jnp.round(x.astype(jnp.float32) * r),
                    -127, 127).astype(jnp.int8))
        return {"Out": [jnp.concatenate(parts, axis=axis)]}
    fixed = []
    for x, name in zip(xs, op.inputs["X"]):
        if x.dtype == jnp.int8:
            x = dequantize(x, ctx.var_quant(name).scale[0])
        fixed.append(x)
    return {"Out": [jnp.concatenate(fixed, axis=axis)]}


@OPS.shape_fn("split")
def split_shape(attrs, in_shapes):
    x = list(in_shapes[0])
    axis = int(attrs.get("axis", 0))
    sections = attrs.get("sections")
    if sections:
        outs = []
        for s in sections:
            shp = list(x)
            shp[axis] = s
            outs.append(tuple(shp))
        return outs
    num = int(attrs["num"])
    shp = list(x)
    shp[axis] = x[axis] // num
    return [tuple(shp)] * num


@OPS.kernel("split", "xla")
def split_xla(ctx, op, ins):
    x = ins["X"][0]
    axis = int(op.attrs.get("axis", 0))
    sections = op.attrs.get("sections")
    if sections:
        idx = np.cumsum(sections)[:-1].tolist()
        return {"Out": jnp.split(x, idx, axis=axis)}
    return {"Out": jnp.split(x, int(op.attrs["num"]), axis=axis)}


@OPS.shape_fn("stack")
def stack_shape(attrs, in_shapes):
    axis = int(attrs.get("axis", 0))
    out = list(in_shapes[0])
    out.insert(axis if axis >= 0 else axis + len(out) + 1, len(in_shapes))
    return [tuple(out)]


@OPS.kernel("stack", "xla")
def stack_xla(ctx, op, ins):
    return {"Y": [jnp.stack(ins["X"], axis=int(op.attrs.get("axis", 0)))]}


@OPS.shape_fn("slice")
def slice_shape(attrs, in_shapes):
    x = list(in_shapes[0])
    for ax, st, en in zip(attrs["axes"], attrs["starts"], attrs["ends"]):
        dim = x[ax]
        st = max(st + dim, 0) if st < 0 else min(st, dim)
        en = max(en + dim, 0) if en < 0 else min(en, dim)
        x[ax] = max(en - st, 0)
    out = tuple(x)
    for ax in sorted(attrs.get("decrease_axis", []), reverse=True):
        out = out[:ax] + out[ax + 1:]
    return [out]


@OPS.kernel("slice", "xla")
def slice_xla(ctx, op, ins):
    x = ins["X"][0]
    idx = [slice(None)] * x.ndim
    for ax, st, en in zip(op.attrs["axes"], op.attrs["starts"], op.attrs["ends"]):
        idx[ax] = slice(st, en)
    y = x[tuple(idx)]
    dec = op.attrs.get("decrease_axis", [])
    if dec:
        y = y.reshape(ctx.var_shape(op.output("Out")))
    return {"Out": [y]}


@OPS.shape_fn("expand")
def expand_shape(attrs, in_shapes):
    x = in_shapes[0]
    times = attrs["expand_times"]
    return [tuple(d * t for d, t in zip(x, times))]


@OPS.kernel("expand", "xla")
def expand_xla(ctx, op, ins):
    return {"Out": [jnp.tile(ins["X"][0], op.attrs["expand_times"])]}


# ---- shuffle_channel / pad2d / interpolate --------------------------------

@OPS.shape_fn("shuffle_channel")
def shuffle_channel_shape(attrs, in_shapes):
    return [in_shapes[0]]


@OPS.kernel("shuffle_channel", "xla")
def shuffle_channel_xla(ctx, op, ins):
    x = ins["X"][0]  # NHWC
    g = int(op.attrs["group"])
    n, h, w, c = x.shape
    return {"Out": [x.reshape(n, h, w, g, c // g).swapaxes(3, 4).reshape(n, h, w, c)]}


@OPS.shape_fn("pad2d")
def pad2d_shape(attrs, in_shapes):
    n, h, w, c = in_shapes[0]
    p = attrs["paddings"]  # [top, bottom, left, right]
    return [(n, h + p[0] + p[1], w + p[2] + p[3], c)]


@OPS.kernel("pad2d", "xla")
def pad2d_xla(ctx, op, ins):
    x = ins["X"][0]
    t, b, l, r = op.attrs["paddings"]
    mode = op.attrs.get("mode", "constant")
    cfg = ((0, 0), (t, b), (l, r), (0, 0))
    if mode == "constant":
        return {"Out": [jnp.pad(x, cfg, constant_values=op.attrs.get("pad_value", 0.0))]}
    return {"Out": [jnp.pad(x, cfg, mode={"reflect": "reflect", "edge": "edge"}[mode])]}


def _interp_shape(attrs, in_shapes):
    n, h, w, c = in_shapes[0]
    if attrs.get("out_h", -1) > 0:
        return [(n, int(attrs["out_h"]), int(attrs["out_w"]), c)]
    s = attrs.get("scale", 2.0)
    return [(n, int(h * s), int(w * s), c)]


OPS.register("bilinear_interp", infer_shape=_interp_shape)
OPS.register("nearest_interp", infer_shape=_interp_shape)

# Integer-factor nearest upsample as broadcast+reshape instead of
# jax.image.resize's gather. Standalone/prefix profiling showed the gather
# ~4x off roofline; flag kept for in-model A/B (standalone wins can regress
# under fusion — see BASELINE.md autotuning-methodology note).
NEAREST_UPSAMPLE_BROADCAST = True


@OPS.kernel("bilinear_interp", "xla")
@OPS.kernel("nearest_interp", "xla")
def interp_xla(ctx, op, ins):
    x = ins["X"][0]
    method = ("bilinear" if op.op_type == "bilinear_interp" else "nearest")
    if x.dtype == jnp.int8 and not (
            method == "nearest"
            and ctx.var_precision(op.output("Out")).name == "INT8"):
        # nearest with an int8-assigned output is a pure int8 data movement
        # (scale-preserving passthrough); everything else dequantizes
        x = dequantize(x, ctx.var_quant(op.input("X")).scale[0])
    n, oh, ow, c = ctx.var_shape(op.output("Out"))
    if method == "bilinear" and op.attrs.get("align_corners", False):
        # jax.image has no align_corners; gather-based exact impl
        ih, iw = x.shape[1], x.shape[2]
        ys = jnp.linspace(0.0, ih - 1.0, oh)
        xs = jnp.linspace(0.0, iw - 1.0, ow)
        y0 = jnp.floor(ys).astype(jnp.int32)
        x0 = jnp.floor(xs).astype(jnp.int32)
        y1 = jnp.minimum(y0 + 1, ih - 1)
        x1 = jnp.minimum(x0 + 1, iw - 1)
        wy = (ys - y0)[None, :, None, None]
        wx = (xs - x0)[None, None, :, None]
        g = lambda yi, xi: x[:, yi][:, :, xi]
        out = (
            g(y0, x0) * (1 - wy) * (1 - wx)
            + g(y0, x1) * (1 - wy) * wx
            + g(y1, x0) * wy * (1 - wx)
            + g(y1, x1) * wy * wx
        )
        return {"Out": [out]}
    ih, iw = x.shape[1], x.shape[2]
    if (NEAREST_UPSAMPLE_BROADCAST and method == "nearest"
            and not op.attrs.get("align_corners", False)
            and oh % ih == 0 and ow % iw == 0):
        # Integer-factor nearest upsample == broadcast + reshape (out pixel
        # i reads in pixel floor(i/f) for align_corners=False — same map as
        # jax.image.resize/paddle). The gather-based resize lowering
        # measured ~4x off memory roofline at DBNet's FPN shapes; the
        # broadcast form is pure data movement XLA fuses with neighbors.
        fh, fw = oh // ih, ow // iw
        out = jnp.broadcast_to(x[:, :, None, :, None, :],
                               (x.shape[0], ih, fh, iw, fw, x.shape[3]))
        return {"Out": [out.reshape(x.shape[0], oh, ow, x.shape[3])]}
    out = jax.image.resize(x, (x.shape[0], oh, ow, x.shape[3]), method=method)
    return {"Out": [out]}


# ---- reductions / argmax / topk / gather ----------------------------------

def _reduce_shape(attrs, in_shapes):
    x = list(in_shapes[0])
    dims = attrs.get("dim", list(range(len(x))))
    dims = [d % len(x) for d in dims]
    if attrs.get("keep_dim"):
        return [tuple(1 if i in dims else d for i, d in enumerate(x))]
    out = tuple(d for i, d in enumerate(x) if i not in dims)
    return [out if out else (1,)]


_REDUCES = {
    "reduce_mean": jnp.mean,
    "reduce_sum": jnp.sum,
    "reduce_max": jnp.max,
    "reduce_min": jnp.min,
    "reduce_prod": jnp.prod,
}


def _make_reduce(name, fn):
    def impl(ctx, op, ins):
        x = ins["X"][0]
        if x.dtype == jnp.int8:
            x = dequantize(x, ctx.var_quant(op.input("X")).scale[0])
        dims = tuple(d % x.ndim for d in op.attrs.get("dim", range(x.ndim)))
        y = fn(x, axis=dims, keepdims=bool(op.attrs.get("keep_dim")))
        if y.ndim == 0:
            y = y.reshape((1,))
        return {"Out": [y]}

    impl.__name__ = f"{name}_impl"
    return impl


for _name, _fn in _REDUCES.items():
    OPS.register(_name, infer_shape=_reduce_shape)
    OPS.get(_name).impls["xla"] = _make_reduce(_name, _fn)


@OPS.shape_fn("arg_max")
def argmax_shape(attrs, in_shapes):
    x = list(in_shapes[0])
    axis = int(attrs.get("axis", -1)) % len(x)
    del x[axis]
    return [tuple(x) if x else (1,)]


@OPS.kernel("arg_max", "xla")
def argmax_xla(ctx, op, ins):
    x = ins["X"][0]
    return {"Out": [jnp.argmax(x, axis=int(op.attrs.get("axis", -1))).astype(jnp.int64)]}


@OPS.shape_fn("top_k")
def topk_shape(attrs, in_shapes):
    x = list(in_shapes[0])
    x[-1] = int(attrs["k"])
    return [tuple(x), tuple(x)]


@OPS.kernel("top_k", "xla")
def topk_xla(ctx, op, ins):
    v, i = jax.lax.top_k(ins["X"][0], int(op.attrs["k"]))
    return {"Out": [v], "Indices": [i.astype(jnp.int64)]}


@OPS.shape_fn("gather")
def gather_shape(attrs, in_shapes):
    x, idx = in_shapes[0], in_shapes[1]
    return [tuple(idx[:1]) + tuple(x[1:])]


@OPS.kernel("gather", "xla")
def gather_xla(ctx, op, ins):
    return {"Out": [jnp.take(ins["X"][0], ins["Index"][0].astype(jnp.int32), axis=0)]}


@OPS.shape_fn("lookup_table")
def lookup_table_shape(attrs, in_shapes):
    w, ids = in_shapes[0], in_shapes[1]
    out = tuple(ids)
    if out and out[-1] == 1:
        out = out[:-1]
    return [out + (w[-1],)]


@OPS.kernel("lookup_table", "xla")
@OPS.kernel("lookup_table_v2", "xla")
def lookup_table_xla(ctx, op, ins):
    w, ids = ins["W"][0], ins["Ids"][0]
    if ids.ndim and ids.shape[-1] == 1:
        ids = ids.squeeze(-1)
    return {"Out": [jnp.take(w, ids.astype(jnp.int32), axis=0)]}


OPS.register("lookup_table_v2", infer_shape=lookup_table_shape)


@OPS.shape_fn("fill_constant")
def fill_constant_shape(attrs, in_shapes):
    return [tuple(attrs["shape"])]


@OPS.kernel("fill_constant", "xla")
def fill_constant_xla(ctx, op, ins):
    return {"Out": [jnp.full(tuple(op.attrs["shape"]),
                             op.attrs.get("value", 0.0),
                             dtype=np.dtype(op.attrs.get("dtype", "float32")))]}


@OPS.shape_fn("shape")
def shape_shape(attrs, in_shapes):
    return [(len(in_shapes[0]),)]


@OPS.kernel("shape", "xla")
def shape_xla(ctx, op, ins):
    return {"Out": [jnp.asarray(ins["Input"][0].shape, jnp.int32)]}


@OPS.shape_fn("norm")
def norm_shape(attrs, in_shapes):
    return [in_shapes[0]]


@OPS.kernel("norm", "xla")
def norm_xla(ctx, op, ins):
    x = ins["X"][0]
    axis = int(op.attrs.get("axis", -1))
    eps = op.attrs.get("epsilon", 1e-10)
    n = jnp.sqrt(jnp.sum(jnp.square(x), axis=axis, keepdims=True) + eps)
    return {"Out": [x / n]}


@OPS.shape_fn("space_to_depth")
def space_to_depth_shape(attrs, in_shapes):
    n, h, w, c = in_shapes[0]
    bh, bw = attrs.get("blocks", (2, 2))
    return [(n, h // bh, w // bw, c * bh * bw)]


@OPS.kernel("space_to_depth", "xla")
def space_to_depth_xla(ctx, op, ins):
    """NHWC space-to-depth; output channel index = (bh, bw, c) flattened.
    Used by the stem_space_to_depth pass (passes/fusion.py) to turn the
    MXU-hostile 3-channel stem conv into a dense-K conv; scale-preserving
    (pure data movement), so it participates in int8 passthrough chains."""
    x = ins["X"][0]
    bh, bw = op.attrs.get("blocks", (2, 2))
    n, h, w, c = x.shape
    y = (x.reshape(n, h // bh, bh, w // bw, bw, c)
          .transpose(0, 1, 3, 2, 4, 5)
          .reshape(n, h // bh, w // bw, bh * bw * c))
    return {"Out": [y]}
