"""Long-tail op coverage: norm variants, paddle-2.x op aliases, misc tensor
ops — the remainder of the reference's ``lite/operators`` surface that the
importer may encounter beyond the core families.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..core.registry import OPS
from .manip import (_interp_shape, flatten_shape, interp_xla, reshape_shape,
                    reshape_xla)
from .nn import matmul_shape, matmul_xla


def _same(attrs, in_shapes):
    return [in_shapes[0]]


# ---- paddle 2.x aliases ---------------------------------------------------

OPS.register("matmul_v2", infer_shape=matmul_shape)
OPS.get("matmul_v2").impls["xla"] = matmul_xla
OPS.register("bilinear_interp_v2", infer_shape=_interp_shape)
OPS.get("bilinear_interp_v2").impls["xla"] = interp_xla
OPS.register("nearest_interp_v2", infer_shape=_interp_shape)
OPS.get("nearest_interp_v2").impls["xla"] = interp_xla


@OPS.shape_fn("flatten_contiguous_range")
def flatten_range_shape(attrs, in_shapes):
    x = list(in_shapes[0])
    start = int(attrs.get("start_axis", 1)) % len(x)
    stop = int(attrs.get("stop_axis", -1)) % len(x)
    mid = int(np.prod(x[start:stop + 1]))
    return [tuple(x[:start] + [mid] + x[stop + 1:])]


@OPS.kernel("flatten_contiguous_range", "xla")
def flatten_range_xla(ctx, op, ins):
    return {"Out": [ins["X"][0].reshape(ctx.var_shape(op.output("Out")))]}


# ---- normalization variants ----------------------------------------------

@OPS.shape_fn("group_norm")
def group_norm_shape(attrs, in_shapes):
    return [in_shapes[0]]


@OPS.kernel("group_norm", "xla")
def group_norm_xla(ctx, op, ins):
    x = ins["X"][0].astype(jnp.float32)  # NHWC
    scale = ins.get("Scale", [None])[0]
    bias = ins.get("Bias", [None])[0]
    groups = int(op.attrs.get("groups", 1))
    eps = op.attrs.get("epsilon", 1e-5)
    n, h, w, c = x.shape
    xg = x.reshape(n, h, w, groups, c // groups)
    mean = xg.mean(axis=(1, 2, 4), keepdims=True)
    var = jnp.square(xg - mean).mean(axis=(1, 2, 4), keepdims=True)
    y = ((xg - mean) * jax.lax.rsqrt(var + eps)).reshape(n, h, w, c)
    if scale is not None:
        y = y * scale
    if bias is not None:
        y = y + bias
    return {"Y": [y]}


@OPS.shape_fn("instance_norm")
def instance_norm_shape(attrs, in_shapes):
    return [in_shapes[0]]


@OPS.kernel("instance_norm", "xla")
def instance_norm_xla(ctx, op, ins):
    x = ins["X"][0].astype(jnp.float32)  # NHWC
    scale = ins.get("Scale", [None])[0]
    bias = ins.get("Bias", [None])[0]
    eps = op.attrs.get("epsilon", 1e-5)
    mean = x.mean(axis=(1, 2), keepdims=True)
    var = jnp.square(x - mean).mean(axis=(1, 2), keepdims=True)
    y = (x - mean) * jax.lax.rsqrt(var + eps)
    if scale is not None:
        y = y * scale
    if bias is not None:
        y = y + bias
    return {"Y": [y]}


# ---- misc tensor ops ------------------------------------------------------

@OPS.shape_fn("pixel_shuffle")
def pixel_shuffle_shape(attrs, in_shapes):
    n, h, w, c = in_shapes[0]
    r = int(attrs.get("upscale_factor", 2))
    return [(n, h * r, w * r, c // (r * r))]


@OPS.kernel("pixel_shuffle", "xla")
def pixel_shuffle_xla(ctx, op, ins):
    x = ins["X"][0]  # NHWC with C = r*r*Cout
    r = int(op.attrs.get("upscale_factor", 2))
    n, h, w, c = x.shape
    co = c // (r * r)
    y = x.reshape(n, h, w, r, r, co)
    y = y.transpose(0, 1, 3, 2, 4, 5)
    return {"Out": [y.reshape(n, h * r, w * r, co)]}


@OPS.shape_fn("unstack")
def unstack_shape(attrs, in_shapes):
    x = list(in_shapes[0])
    axis = int(attrs.get("axis", 0)) % len(x)
    num = x[axis]
    rest = tuple(x[:axis] + x[axis + 1:])
    return [rest] * num


@OPS.kernel("unstack", "xla")
def unstack_xla(ctx, op, ins):
    x = ins["X"][0]
    axis = int(op.attrs.get("axis", 0)) % x.ndim
    return {"Y": [jnp.squeeze(s, axis)
                  for s in jnp.split(x, x.shape[axis], axis=axis)]}


@OPS.shape_fn("expand_as")
def expand_as_shape(attrs, in_shapes):
    return [in_shapes[1]]


@OPS.kernel("expand_as", "xla")
def expand_as_xla(ctx, op, ins):
    return {"Out": [jnp.broadcast_to(ins["X"][0], ins["Y"][0].shape)]}


@OPS.shape_fn("tile")
def tile_shape(attrs, in_shapes):
    x = in_shapes[0]
    times = attrs["repeat_times"]
    return [tuple(d * t for d, t in zip(x, times))]


@OPS.kernel("tile", "xla")
def tile_xla(ctx, op, ins):
    return {"Out": [jnp.tile(ins["X"][0], op.attrs["repeat_times"])]}


@OPS.shape_fn("add_n")
def add_n_shape(attrs, in_shapes):
    return [in_shapes[0]]


@OPS.kernel("add_n", "xla")
@OPS.kernel("sum", "xla")
def add_n_xla(ctx, op, ins):
    xs = ins["X"]
    out = xs[0]
    for x in xs[1:]:
        out = out + x
    return {"Out": [out]}


OPS.register("sum", infer_shape=add_n_shape)


def _make_unary(name, fn):
    def impl(ctx, op, ins):
        return {"Out": [fn(ins["X"][0])]}

    impl.__name__ = f"{name}_impl"
    OPS.register(name, infer_shape=_same)
    OPS.get(name).impls["xla"] = impl


_make_unary("erf", jax.lax.erf)
_make_unary("sign", jnp.sign)
_make_unary("ceil", jnp.ceil)
_make_unary("round", jnp.round)
_make_unary("sin", jnp.sin)
_make_unary("cos", jnp.cos)


def _reduce_bool_shape(attrs, in_shapes):
    from .manip import _reduce_shape

    return _reduce_shape(attrs, in_shapes)


for _name, _fn in (("reduce_all", jnp.all), ("reduce_any", jnp.any)):
    def _impl(ctx, op, ins, _fn=_fn):
        x = ins["X"][0]
        dims = tuple(d % x.ndim for d in op.attrs.get("dim", range(x.ndim)))
        y = _fn(x, axis=dims, keepdims=bool(op.attrs.get("keep_dim")))
        if y.ndim == 0:
            y = y.reshape((1,))
        return {"Out": [y]}

    OPS.register(_name, infer_shape=_reduce_bool_shape)
    OPS.get(_name).impls["xla"] = _impl


@OPS.shape_fn("meshgrid")
def meshgrid_shape(attrs, in_shapes):
    dims = tuple(s[0] for s in in_shapes)
    return [dims] * len(in_shapes)


@OPS.kernel("meshgrid", "xla")
def meshgrid_xla(ctx, op, ins):
    outs = jnp.meshgrid(*ins["X"], indexing="ij")
    return {"Out": list(outs)}


@OPS.shape_fn("where")
def where_shape(attrs, in_shapes):
    return [in_shapes[1]]


@OPS.kernel("where", "xla")
def where_xla(ctx, op, ins):
    return {"Out": [jnp.where(ins["Condition"][0], ins["X"][0], ins["Y"][0])]}


@OPS.shape_fn("cumsum")
def cumsum_shape(attrs, in_shapes):
    return [in_shapes[0]]


@OPS.kernel("cumsum", "xla")
def cumsum_xla(ctx, op, ins):
    return {"Out": [jnp.cumsum(ins["X"][0], axis=int(op.attrs.get("axis", -1)))]}


@OPS.shape_fn("one_hot")
def one_hot_shape(attrs, in_shapes):
    return [tuple(in_shapes[0]) + (int(attrs["depth"]),)]


@OPS.kernel("one_hot", "xla")
@OPS.kernel("one_hot_v2", "xla")
def one_hot_xla(ctx, op, ins):
    return {"Out": [jax.nn.one_hot(ins["X"][0].astype(jnp.int32),
                                   int(op.attrs["depth"]))]}


OPS.register("one_hot_v2", infer_shape=one_hot_shape)


# ---- QAT fake-quant ops (PaddleSlim graphs) ---------------------------------
# Imported QAT graphs carry these; ``quant_dequant_fuse`` deletes them during
# optimize() and reuses their recorded scales.  They are registered with
# faithful fp32 impls (quantize-dequantize roundtrip — what the training
# graph computed) so an *unoptimized* imported QAT model still runs and can
# be diffed layer-by-layer against the fused int8 program.

def _fake_q_impl(ctx, op, ins):
    x = ins["X"][0]
    bits = int(op.attrs.get("bit_length", 8))
    qmax = float(2 ** (bits - 1) - 1)
    if "InScale" in ins:
        r = jnp.abs(ins["InScale"][0]).reshape(())
    elif "scale" in op.attrs:
        r = jnp.float32(op.attrs["scale"])
    else:
        r = jnp.max(jnp.abs(x))  # abs_max variant: dynamic range
    r = jnp.maximum(r.astype(jnp.float32), 1e-10)
    q = jnp.clip(jnp.round(x / r * qmax), -qmax, qmax)
    return {"Out": [q * (r / qmax)]}


def _fake_dq_impl(ctx, op, ins):
    # the paired fake_quantize already emitted dequantized values
    return {"Out": [ins["X"][0]]}


for _fq in ("fake_quantize_abs_max",
            "fake_quantize_range_abs_max",
            "fake_quantize_moving_average_abs_max",
            "fake_quantize_dequantize_moving_average_abs_max",
            "fake_quantize_dequantize_abs_max"):
    OPS.register(_fq, infer_shape=_same, input_slots=("X", "InScale"))
    OPS.get(_fq).impls["xla"] = _fake_q_impl

for _fdq in ("fake_dequantize_max_abs", "fake_channel_wise_dequantize_max_abs"):
    OPS.register(_fdq, infer_shape=_same, input_slots=("X", "Scales"))
    OPS.get(_fdq).impls["xla"] = _fake_dq_impl
