"""Precision/plumbing ops: quantize / dequantize / calib, feed / fetch,
io_copy, layout.

These are the ops the reference's cast passes *insert* rather than ones that
come from models: ``calib`` (fp32↔int8, ``lite/kernels/arm/calib_compute.cc``),
``io_copy`` (host↔device, pointless on TPU — identity kept for graph parity)
and ``layout`` (NCHW↔NHWC, ``lite/kernels/arm/layout_compute.cc``).  Our
precision-cast pass inserts explicit ``quantize``/``dequantize`` nodes; under
XLA they fuse into the neighboring conv/matmul so they cost nothing unless
they sit on a genuine fp↔int8 island boundary.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..core.registry import OPS
from .common import dequantize as _dq
from .common import quantize as _q


def _same(attrs, in_shapes):
    return [in_shapes[0]]


@OPS.shape_fn("quantize")
def quantize_shape(attrs, in_shapes):
    return [in_shapes[0]]


@OPS.kernel("quantize", "xla")
def quantize_xla(ctx, op, ins):
    """fp32 -> int8 with the *output var's* recorded scale."""
    q = ctx.var_quant(op.output("Out"))
    return {"Out": [_q(ins["X"][0], q.scale[0])]}


@OPS.shape_fn("dequantize")
def dequantize_shape(attrs, in_shapes):
    return [in_shapes[0]]


@OPS.kernel("dequantize", "xla")
def dequantize_xla(ctx, op, ins):
    q = ctx.var_quant(op.input("X"))
    scale = q.scale_array() if q.per_channel else q.scale[0]
    return {"Out": [_dq(ins["X"][0], scale, axis=q.axis)]}


@OPS.shape_fn("calib")
def calib_shape(attrs, in_shapes):
    return [in_shapes[0]]


@OPS.kernel("calib", "xla")
def calib_xla(ctx, op, ins):
    """Bidirectional fp32<->int8 like the reference's CalibCompute: the
    direction is determined by the output var's precision."""
    x = ins["X"][0]
    if x.dtype == jnp.int8:
        q = ctx.var_quant(op.input("X"))
        return {"Out": [_dq(x, q.scale[0])]}
    q = ctx.var_quant(op.output("Out"))
    return {"Out": [_q(x, q.scale[0])]}


for _name in ("feed", "fetch", "io_copy", "io_copy_once", "assign"):
    OPS.register(_name, infer_shape=_same)

    def _identity(ctx, op, ins):
        return {"Out": [next(iter(ins.values()))[0]]}

    OPS.get(_name).impls["xla"] = _identity


@OPS.shape_fn("layout")
def layout_shape(attrs, in_shapes):
    x = in_shapes[0]
    if attrs.get("to", "nhwc") == "nhwc":  # NCHW -> NHWC
        return [(x[0], x[2], x[3], x[1])]
    return [(x[0], x[3], x[1], x[2])]


@OPS.kernel("layout", "xla")
def layout_xla(ctx, op, ins):
    x = ins["X"][0]
    if op.attrs.get("to", "nhwc") == "nhwc":
        return {"Out": [jnp.transpose(x, (0, 2, 3, 1))]}
    return {"Out": [jnp.transpose(x, (0, 3, 1, 2))]}
