"""`fused_dw_pw` op — a depthwise(3x3,s1)+pointwise(1x1) int8 block fused
into one kernel launch (see ops/kernels/dw_pw_fused.py for the rationale),
plus the graph pass that forms it.

The pass runs after quantization (it needs the int8 marks, the dw requant
scale that becomes the *internal* precision boundary, and both weight
scales) and before precision-cast insertion.  Conditions: dw is int8
3x3/s1/SAME with a fused requant (``out_scale``), its output feeds ONLY the
1x1/s1/group-1 int8 conv, no residual operand on either.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..core.ir import Graph
from ..core.pass_manager import register_pass
from ..core.pattern_matcher import match_chain, op_of
from ..core.registry import OPS
from .common import apply_activation, quantize


@OPS.shape_fn("fused_dw_pw")
def fused_dw_pw_shape(attrs, in_shapes):
    n, h, w, _ = in_shapes[0]
    oc = in_shapes[1][3]  # PwFilter (1,1,C,O)
    return [(n, h, w, oc)]


@OPS.kernel("fused_dw_pw", "xla")
def fused_dw_pw_xla(ctx, op, ins):
    """Reference composition: dw conv + requant + pw conv, via XLA."""
    x = ins["Input"][0]
    dw_w = ins["DwFilter"][0]
    pw_w = ins["PwFilter"][0]
    dw_bias = ins.get("DwBias", [None])[0]
    pw_bias = ins.get("PwBias", [None])[0]
    attrs = op.attrs
    c = x.shape[-1]

    xq = ctx.var_quant(op.input("Input"))
    dwq = ctx.var_quant(op.input("DwFilter"))
    pwq = ctx.var_quant(op.input("PwFilter"))

    acc = jax.lax.conv_general_dilated(
        x, dw_w, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c, preferred_element_type=jnp.int32)
    y = acc.astype(jnp.float32) * (np.float32(xq.scale[0]) * dwq.scale_array())
    if dw_bias is not None:
        y = y + dw_bias
    y = apply_activation(y, attrs.get("dw_act"), attrs.get("dw_act_attrs"))
    dw_q = quantize(y, attrs["dw_out_scale"])

    acc2 = jax.lax.conv_general_dilated(
        dw_q, pw_w, (1, 1), ((0, 0), (0, 0)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32)
    z = acc2.astype(jnp.float32) * (
        np.float32(attrs["dw_out_scale"]) * pwq.scale_array())
    if pw_bias is not None:
        z = z + pw_bias
    z = apply_activation(z, attrs.get("pw_act"), attrs.get("pw_act_attrs"))
    if attrs.get("out_scale") is not None:
        z = quantize(z, attrs["out_scale"])
    return {"Output": [z]}


@OPS.kernel("fused_dw_pw", "pallas")
def fused_dw_pw_pallas(ctx, op, ins):
    from .kernels.dw_pw_fused import fused_dw_pw_int8

    x = ins["Input"][0]
    if x.dtype != jnp.int8:
        return fused_dw_pw_xla(ctx, op, ins)
    attrs = op.attrs
    xq = ctx.var_quant(op.input("Input"))
    dwq = ctx.var_quant(op.input("DwFilter"))
    pwq = ctx.var_quant(op.input("PwFilter"))
    y = fused_dw_pw_int8(
        x,
        ins["DwFilter"][0],
        np.float32(xq.scale[0]) * dwq.scale_array(),
        ins.get("DwBias", [None])[0],
        attrs["dw_out_scale"],
        ins["PwFilter"][0],
        np.float32(attrs["dw_out_scale"]) * pwq.scale_array(),
        ins.get("PwBias", [None])[0],
        dw_act=attrs.get("dw_act"), dw_act_attrs=attrs.get("dw_act_attrs"),
        pw_act=attrs.get("pw_act"), pw_act_attrs=attrs.get("pw_act_attrs"),
        pw_out_scale=attrs.get("out_scale"),
        interpret=ctx.interpret or ctx.platform != "tpu",
    )
    return {"Output": [y]}


# Fuse only lane-starved blocks (C <= this): the win is shedding the
# PHYSICALLY lane-padded intermediate's HBM round trip — an (M, 32) int8
# activation is stored as (M, 128) bytes, so the 112px MNv1 block measured
# 3.2x for the fused kernel, while full-lane blocks (28px+, C>=256) LOSE
# to XLA's own conv fusion (tools/studies/dwpw_r5.py).  In-model A/B in
# docs/dwpw_inmodel_r5.json.
_FUSE_MAX_C = 128


@register_pass("dw_pw_fuse")
def dw_pw_fuse(graph: Graph) -> None:
    from .kernels import depthwise

    for dw, pw in match_chain(
        graph, [op_of("depthwise_conv2d"), op_of("conv2d")]
    ):
        if not (dw.attrs.get("enable_int8") and pw.attrs.get("enable_int8")):
            continue
        if dw.attrs.get("out_scale") is None:
            continue  # dw output must be int8 (the internal boundary)
        x_name = dw.input("Input")
        if graph.vars[x_name].shape[3] > _FUSE_MAX_C:
            continue
        dw_w_var = graph.vars[dw.input("Filter")]
        if not depthwise.supported(dw.attrs, graph.vars[x_name].shape,
                                   dw_w_var.shape):
            continue
        pw_w = graph.vars[pw.input("Filter")]
        if pw_w.shape[0] != 1 or pw_w.shape[1] != 1:
            continue
        if tuple(pw.attrs.get("strides", (1, 1))) != (1, 1):
            continue
        if int(pw.attrs.get("groups", 1)) != 1:
            continue
        if dw.maybe_input("ResidualData") or pw.maybe_input("ResidualData"):
            continue

        inputs = {"Input": [x_name],
                  "DwFilter": [dw.input("Filter")],
                  "PwFilter": [pw.input("Filter")]}
        if dw.maybe_input("Bias"):
            inputs["DwBias"] = [dw.input("Bias")]
        if pw.maybe_input("Bias"):
            inputs["PwBias"] = [pw.input("Bias")]
        attrs = {
            "enable_int8": True,
            "kernel": "pallas",
            "dw_act": dw.attrs.get("fuse_act"),
            "dw_act_attrs": dw.attrs.get("act_attrs"),
            "dw_out_scale": dw.attrs["out_scale"],
            "pw_act": pw.attrs.get("fuse_act"),
            "pw_act_attrs": pw.attrs.get("act_attrs"),
        }
        if pw.attrs.get("out_scale") is not None:
            attrs["out_scale"] = pw.attrs["out_scale"]
        out_name = pw.output("Output")
        graph.remove_ops([dw, pw])
        graph.add_op("fused_dw_pw", inputs, {"Output": [out_name]}, attrs)
    graph.rebuild_links()
    graph.remove_unused_vars()
