"""`tp_pallas` kernel implementations — the serving integration of
``parallel/tp_pallas.py``.

Registered as a third kernel tag alongside "xla"/"pallas": when
:class:`ShardedPredictor` builds its callable with a mesh whose `model`
axis > 1, its kernel-assignment step retags int8 fc / mul / 1×1-conv ops
to "tp_pallas"; these impls run the fused int8 Pallas GEMM *per shard*
under ``shard_map`` (column-parallel: output-feature sharded, zero
collectives; the GSPMD partitioner handles every surrounding op).
Falls back to the plain xla impl when the op isn't int8 or no mesh is
present (e.g. the same graph traced single-device)."""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..core.registry import OPS
from .tp_pallas import column_parallel_int8_matmul


def _tp_ready(ctx, x, w):
    return (ctx.mesh is not None
            and ctx.mesh.shape.get(ctx.tp_axis, 1) > 1
            and x.dtype == jnp.int8 and w.dtype == jnp.int8)


def _eff_and_epilogue_args(ctx, op, x_name, w_name):
    xq = ctx.var_quant(x_name)
    wq = ctx.var_quant(w_name)
    eff = np.float32(xq.scale[0]) * wq.scale_array()
    return eff, op.attrs.get("fuse_act"), op.attrs.get("act_attrs"), \
        op.attrs.get("out_scale")


def _data_axis(ctx, m_rows: int):
    dp = ctx.dp_axis
    if dp is None or ctx.mesh.shape.get(dp, 1) <= 1:
        return None
    return dp if m_rows % ctx.mesh.shape[dp] == 0 else None


def fc_tp_pallas(ctx, op, ins):
    x = ins["Input"][0]
    w = ins["W"][0]
    if not _tp_ready(ctx, x, w):
        return OPS.get("fc").impls["xla"](ctx, op, ins)
    bias = ins.get("Bias", [None])[0]
    in_num_col_dims = int(op.attrs.get("in_num_col_dims", x.ndim - 1))
    lead = x.shape[:in_num_col_dims]
    x2 = x.reshape((-1, int(np.prod(x.shape[in_num_col_dims:]))))
    eff, act, act_attrs, out_scale = _eff_and_epilogue_args(
        ctx, op, op.input("Input"), op.input("W"))
    y = column_parallel_int8_matmul(
        ctx.mesh, x2, w, eff,
        None if bias is None else jnp.asarray(bias, jnp.float32),
        axis=ctx.tp_axis, data_axis=_data_axis(ctx, x2.shape[0]),
        act=act, act_attrs=act_attrs, out_scale=out_scale,
        interpret=ctx.interpret)
    return {"Out": [y.reshape(lead + (w.shape[1],))]}


def mul_tp_pallas(ctx, op, ins):
    x, w = ins["X"][0], ins["Y"][0]
    if not _tp_ready(ctx, x, w):
        return OPS.get("mul").impls["xla"](ctx, op, ins)
    xd = int(op.attrs.get("x_num_col_dims", 1))
    lead = x.shape[:xd]
    x2 = x.reshape((int(np.prod(lead) if lead else 1), -1))
    eff, act, act_attrs, out_scale = _eff_and_epilogue_args(
        ctx, op, op.input("X"), op.input("Y"))
    y = column_parallel_int8_matmul(
        ctx.mesh, x2, w.reshape(x2.shape[1], -1), eff, None,
        axis=ctx.tp_axis, data_axis=_data_axis(ctx, x2.shape[0]),
        act=act, act_attrs=act_attrs, out_scale=out_scale,
        interpret=ctx.interpret)
    return {"Out": [y.reshape(lead + (w.shape[-1],))]}


def conv1x1_tp_pallas(ctx, op, ins):
    """1×1 stride-1 conv as a column-parallel GEMM over the pixel rows."""
    x = ins["Input"][0]
    w = ins["Filter"][0]
    strides = [int(s) for s in op.attrs.get("strides", [1, 1])]
    is_1x1 = (w.shape[0] == 1 and w.shape[1] == 1 and strides == [1, 1]
              and int(op.attrs.get("groups", 1)) == 1)
    if not (_tp_ready(ctx, x, w) and is_1x1):
        return OPS.get("conv2d").impls["xla"](ctx, op, ins)
    bias = ins.get("Bias", [None])[0]
    residual = ins.get("ResidualData", [None])[0]
    if residual is not None:  # keep the fused-residual path in XLA
        return OPS.get("conv2d").impls["xla"](ctx, op, ins)
    n, h, wd, c = x.shape
    x2 = x.reshape(n * h * wd, c)
    w2 = w.reshape(c, -1)
    eff, act, act_attrs, out_scale = _eff_and_epilogue_args(
        ctx, op, op.input("Input"), op.input("Filter"))
    y = column_parallel_int8_matmul(
        ctx.mesh, x2, w2, eff,
        None if bias is None else jnp.asarray(bias, jnp.float32),
        axis=ctx.tp_axis, data_axis=_data_axis(ctx, x2.shape[0]),
        act=act, act_attrs=act_attrs, out_scale=out_scale,
        interpret=ctx.interpret)
    return {"Output": [y.reshape(n, h, wd, w2.shape[1])]}


OPS.get("fc").impls["tp_pallas"] = fc_tp_pallas
OPS.get("mul").impls["tp_pallas"] = mul_tp_pallas
OPS.get("conv2d").impls["tp_pallas"] = conv1x1_tp_pallas


def assign_tp_kernels(graph, mesh, *, tp_axis: str = "model") -> int:
    """Retag int8 matmul-family ops whose weights divide the model axis to
    the shard_map'd Pallas path. Returns the number of ops retagged."""
    parts = mesh.shape.get(tp_axis, 1)
    n = 0
    for op in graph.ops:
        if not op.attrs.get("enable_int8"):
            continue
        if op.op_type == "fc":
            w_shape = graph.vars[op.input("W")].shape
            ok = w_shape[1] % parts == 0
        elif op.op_type == "mul":
            w_shape = graph.vars[op.input("Y")].shape
            ok = w_shape[-1] % parts == 0
        elif op.op_type == "conv2d":
            w_shape = graph.vars[op.input("Filter")].shape
            ok = (w_shape[0] == 1 and w_shape[1] == 1
                  and w_shape[3] % parts == 0
                  and [int(s) for s in op.attrs.get("strides", [1, 1])] == [1, 1]
                  and int(op.attrs.get("groups", 1)) == 1
                  and not op.maybe_input("ResidualData"))
        else:
            continue
        if ok and parts > 1:
            op.attrs["kernel"] = "tp_pallas"
            n += 1
        elif op.attrs.get("kernel") == "pallas":
            op.attrs["kernel"] = "xla"  # GSPMD can't see inside pallas_call
    return n
