"""Pallas-kernel implementations registered under the "pallas" kernel tag.

The reference's ``lite/kernels/arm/*_compute.cc`` were thin wrappers
selecting ``backends/arm/math`` kernels; likewise these are thin wrappers
that extract quant metadata from the graph and call the Pallas kernels in
this package.  The kernel-pick pass decides per-op whether an op runs here
or on the default XLA lowering; impls must still gracefully fall back when
runtime dtypes do not match the int8 contract (mirrors the reference's
kernel-alias fallback when a place mismatch sneaks through).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ...core.registry import OPS
from ..common import dequantize
from .int8_matmul import int8_matmul


def _quant_params(ctx, op, x_name, w_name):
    xq = ctx.var_quant(x_name)
    wq = ctx.var_quant(w_name)
    eff = np.float32(xq.scale[0]) * wq.scale_array()
    return eff


def _interp(ctx) -> bool:
    return ctx.interpret or ctx.platform != "tpu"


@OPS.kernel("fc", "pallas")
def fc_pallas(ctx, op, ins):
    x = ins["Input"][0]
    w = ins["W"][0]
    bias = ins.get("Bias", [None])[0]
    if x.dtype != jnp.int8 or w.dtype != jnp.int8:
        from ..nn import fc_xla

        return fc_xla(ctx, op, ins)
    attrs = op.attrs
    in_num_col_dims = int(attrs.get("in_num_col_dims", x.ndim - 1))
    lead = x.shape[:in_num_col_dims]
    x2 = x.reshape((-1, int(np.prod(x.shape[in_num_col_dims:]))))
    eff = _quant_params(ctx, op, op.input("Input"), op.input("W"))
    y = int8_matmul(
        x2, w, eff, bias,
        act=attrs.get("fuse_act"), act_attrs=attrs.get("act_attrs"),
        out_scale=attrs.get("out_scale"), interpret=_interp(ctx),
    )
    return {"Out": [y.reshape(lead + (w.shape[1],))]}


@OPS.kernel("mul", "pallas")
def mul_pallas(ctx, op, ins):
    x, w = ins["X"][0], ins["Y"][0]
    if x.dtype != jnp.int8 or w.dtype != jnp.int8:
        from ..nn import mul_xla

        return mul_xla(ctx, op, ins)
    attrs = op.attrs
    xd = int(attrs.get("x_num_col_dims", 1))
    yd = int(attrs.get("y_num_col_dims", 1))
    lead, tail = x.shape[:xd], w.shape[yd:]
    x2 = x.reshape((-1, int(np.prod(x.shape[xd:]))))
    w2 = w.reshape((int(np.prod(w.shape[:yd])), -1))
    eff = _quant_params(ctx, op, op.input("X"), op.input("Y"))
    y = int8_matmul(
        x2, w2, jnp.broadcast_to(jnp.asarray(eff), (w2.shape[1],)),
        act=attrs.get("fuse_act"), act_attrs=attrs.get("act_attrs"),
        out_scale=attrs.get("out_scale"), interpret=_interp(ctx),
    )
    return {"Out": [y.reshape(lead + tail)]}


@OPS.kernel("conv2d", "pallas")
def conv2d_pallas(ctx, op, ins):
    """1x1/stride-1/group-1 conv as the Pallas GEMM (the reference's
    ``conv_gemmlike`` path with im2col degenerating to a reshape)."""
    x = ins["Input"][0]
    w = ins["Filter"][0]
    bias = ins.get("Bias", [None])[0]
    residual = ins.get("ResidualData", [None])[0]
    kh, kw = w.shape[0], w.shape[1]
    ok = (
        x.dtype == jnp.int8
        and w.dtype == jnp.int8
        and kh == 1 and kw == 1
        and tuple(op.attrs.get("strides", (1, 1))) in ((1, 1),)
        and int(op.attrs.get("groups", 1)) == 1
        and residual is None
    )
    if not ok:
        from ..nn import conv2d_xla

        return conv2d_xla(ctx, op, ins)
    n, h, ww_, c = x.shape
    oc = w.shape[3]
    x2 = x.reshape((n * h * ww_, c))
    w2 = w.reshape((c, oc))
    eff = _quant_params(ctx, op, op.input("Input"), op.input("Filter"))
    y = int8_matmul(
        x2, w2, eff, bias,
        act=op.attrs.get("fuse_act"), act_attrs=op.attrs.get("act_attrs"),
        out_scale=op.attrs.get("out_scale"), interpret=_interp(ctx),
    )
    return {"Output": [y.reshape((n, h, ww_, oc))]}


@OPS.kernel("depthwise_conv2d", "pallas")
def depthwise_pallas(ctx, op, ins):
    """int8 depthwise (k in {3,5}, stride in {1,2}) via the Pallas VPU
    stencil kernel (stride 2 through polyphase decomposition)."""
    from . import depthwise
    from ..common import normalize_2d

    x = ins["Input"][0]
    w = ins["Filter"][0]
    bias = ins.get("Bias", [None])[0]
    residual = ins.get("ResidualData", [None])[0]
    ok = (
        x.dtype == jnp.int8
        and w.dtype == jnp.int8
        and residual is None
        and depthwise.supported_general(op.attrs, x.shape, w.shape)
    )
    if not ok:
        from ..nn import conv2d_xla

        return conv2d_xla(ctx, op, ins)
    xq = ctx.var_quant(op.input("Input"))
    wq = ctx.var_quant(op.input("Filter"))
    eff = np.float32(xq.scale[0]) * wq.scale_array()
    stride = normalize_2d(op.attrs.get("strides", (1, 1)))[0]
    y = depthwise.dw_conv_int8(
        x, w, eff, bias, stride=stride,
        act=op.attrs.get("fuse_act"), act_attrs=op.attrs.get("act_attrs"),
        out_scale=op.attrs.get("out_scale"), interpret=_interp(ctx),
    )
    return {"Output": [y]}
