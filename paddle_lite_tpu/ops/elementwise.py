"""Elementwise/broadcast ops, scale, clip, cast — analog of
``lite/operators/elementwise_ops.cc`` + ``lite/kernels/arm/
elementwise_compute.cc`` and ``lite/backends/arm/math/elementwise.cc``.

Paddle's elementwise ops carry an ``axis`` attr describing where Y's dims
align into X's (Y is broadcast from that axis); numpy-style trailing
broadcast is the axis=-1 special case.  Int8 operands are dequantized to
fp32 first (the reference likewise ran fp32 eltwise between int8 islands via
calib ops); an ``out_scale`` attr requantizes the result.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..core.registry import OPS
from .common import apply_activation, dequantize, quantize


def _broadcast_shape(attrs, in_shapes):
    x, y = list(in_shapes[0]), list(in_shapes[1])
    axis = int(attrs.get("axis", -1))
    if axis == -1 or len(x) == len(y):
        out = list(np.broadcast_shapes(tuple(x), tuple(y)))
    else:
        # paddle axis semantics: y aligns to x at `axis`
        full = [1] * len(x)
        full[axis : axis + len(y)] = y
        out = list(np.broadcast_shapes(tuple(x), tuple(full)))
    return [tuple(out)]


def _align(x, y, axis: int):
    if axis == -1 or x.ndim == y.ndim:
        return y
    shape = [1] * x.ndim
    shape[axis : axis + y.ndim] = y.shape
    return y.reshape(shape)


_ELTWISE_FNS = {
    "elementwise_add": jnp.add,
    "elementwise_sub": jnp.subtract,
    "elementwise_mul": jnp.multiply,
    "elementwise_div": jnp.divide,
    "elementwise_max": jnp.maximum,
    "elementwise_min": jnp.minimum,
    "elementwise_pow": jnp.power,
    "elementwise_mod": jnp.mod,
    "elementwise_floordiv": jnp.floor_divide,
}


def _make_eltwise(name, fn):
    def impl(ctx, op, ins):
        x, y = ins["X"][0], ins["Y"][0]
        if x.dtype == jnp.int8:
            x = dequantize(x, ctx.var_quant(op.input("X")).scale[0])
        if y.dtype == jnp.int8:
            yq = ctx.var_quant(op.input("Y"))
            y = dequantize(y, yq.scale_array() if yq.per_channel else yq.scale[0],
                           axis=yq.axis)
        out = fn(x, _align(x, y, int(op.attrs.get("axis", -1))))
        out = apply_activation(out, op.attrs.get("fuse_act"), op.attrs.get("act_attrs"))
        out_scale = op.attrs.get("out_scale")
        if out_scale is not None:
            out = quantize(out, out_scale)
        return {"Out": [out]}

    impl.__name__ = f"{name}_impl"
    return impl


for _name, _fn in _ELTWISE_FNS.items():
    OPS.register(_name, infer_shape=_broadcast_shape, input_slots=("X", "Y"))
    OPS.get(_name).impls["xla"] = _make_eltwise(_name, _fn)


# ---- scale / clip / cast --------------------------------------------------

def _same_shape(attrs, in_shapes):
    return [in_shapes[0]]


@OPS.shape_fn("scale")
def scale_shape(attrs, in_shapes):
    return [in_shapes[0]]


@OPS.kernel("scale", "xla")
def scale_xla(ctx, op, ins):
    x = ins["X"][0]
    if x.dtype == jnp.int8:
        x = dequantize(x, ctx.var_quant(op.input("X")).scale[0])
    s = op.attrs.get("scale", 1.0)
    b = op.attrs.get("bias", 0.0)
    if op.attrs.get("bias_after_scale", True):
        return {"Out": [x * s + b]}
    return {"Out": [(x + b) * s]}


@OPS.shape_fn("clip")
def clip_shape(attrs, in_shapes):
    return [in_shapes[0]]


@OPS.kernel("clip", "xla")
def clip_xla(ctx, op, ins):
    x = ins["X"][0]
    return {"Out": [jnp.clip(x, op.attrs.get("min", 0.0), op.attrs.get("max", 1.0))]}


@OPS.shape_fn("cast")
def cast_shape(attrs, in_shapes):
    return [in_shapes[0]]


@OPS.kernel("cast", "xla")
def cast_xla(ctx, op, ins):
    dtype = np.dtype(op.attrs.get("out_dtype", "float32"))
    return {"Out": [ins["X"][0].astype(dtype)]}


# ---- comparison / logical ops (control-flow support: lite/operators/
# compare_op.cc, logical_op.cc) ---------------------------------------------

_COMPARE_FNS = {
    "less_than": jnp.less,
    "less_equal": jnp.less_equal,
    "greater_than": jnp.greater,
    "greater_equal": jnp.greater_equal,
    "equal": jnp.equal,
    "not_equal": jnp.not_equal,
}


def _make_compare(name, fn):
    def impl(ctx, op, ins):
        x, y = ins["X"][0], ins["Y"][0]
        return {"Out": [fn(x, _align(x, jnp.asarray(y), int(op.attrs.get("axis", -1))))]}

    impl.__name__ = f"{name}_impl"
    return impl


for _name, _fn in _COMPARE_FNS.items():
    OPS.register(_name, infer_shape=_broadcast_shape, input_slots=("X", "Y"))
    OPS.get(_name).impls["xla"] = _make_compare(_name, _fn)


_LOGICAL_FNS = {
    "logical_and": jnp.logical_and,
    "logical_or": jnp.logical_or,
    "logical_xor": jnp.logical_xor,
}

for _name, _fn in _LOGICAL_FNS.items():
    OPS.register(_name, infer_shape=_broadcast_shape, input_slots=("X", "Y"))
    OPS.get(_name).impls["xla"] = _make_compare(_name, _fn)


@OPS.shape_fn("logical_not")
def logical_not_shape(attrs, in_shapes):
    return [in_shapes[0]]


@OPS.kernel("logical_not", "xla")
def logical_not_xla(ctx, op, ins):
    return {"Out": [jnp.logical_not(ins["X"][0])]}
