"""Core NN ops: conv2d / depthwise / transpose-conv / fc / mul / matmul /
batch_norm / pool2d / softmax / layer_norm / prelu / dropout.

TPU-native re-design of the reference's op+kernel pairs in
``lite/operators/{conv_op,fc_op,matmul_op,batch_norm_op,pool_op,softmax_op,
layer_norm_op}.cc`` and ``lite/kernels/arm/{conv_compute,fc_compute,
matmul_compute,pool_compute,softmax_compute}.cc``.  The reference dispatched
conv to one of four hand strategies (depthwise / winograd / 3x3-direct /
im2col+gemm, see ``conv_compute.cc``); on TPU every conv lowers to
``lax.conv_general_dilated`` (XLA tiles it onto the MXU directly — winograd
is not profitable when the systolic array gives dense matmul at full rate) or
to the Pallas int8 GEMM for 1x1/im2col cases (see ``ops/kernels``).

Int8 semantics match the reference's ARM int8 kernels: int8×int8→int32
accumulation, then a fused epilogue of per-output-channel fp32 scale
(s_x·s_w[c]) + bias + activation + optional saturating requant to int8
(``gemm_prepacked_int8.cc`` epilogue).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..core.registry import OPS
from .common import (
    apply_activation,
    conv_out_size,
    dequantize,
    maybe_dequant_mixed,
    normalize_2d,
    normalize_paddings,
    quantize,
    requant_epilogue,
)

# ---------------------------------------------------------------------------
# conv2d / depthwise_conv2d
# ---------------------------------------------------------------------------

CONV_DN = ("NHWC", "HWIO", "NHWC")


def _conv_shape(attrs, in_shapes):
    (n, h, w, _), (kh, kw, _, oc) = in_shapes[0], in_shapes[1]
    sh, sw = normalize_2d(attrs.get("strides", (1, 1)))
    dh, dw = normalize_2d(attrs.get("dilations", (1, 1)))
    ph, pw = normalize_paddings(attrs.get("paddings", (0, 0)))
    return [(n, conv_out_size(h, kh, sh, ph, dh), conv_out_size(w, kw, sw, pw, dw), oc)]


@OPS.shape_fn("conv2d")
def conv2d_shape(attrs, in_shapes):
    return _conv_shape(attrs, in_shapes)


@OPS.shape_fn("depthwise_conv2d")
def dw_conv2d_shape(attrs, in_shapes):
    return _conv_shape(attrs, in_shapes)


def _conv_epilogue(ctx, op, acc, x_name, w_name, bias, residual, residual_name,
                   int8_acc: bool = False):
    """Shared conv/fc epilogue handling both fp32 and int8 accumulators.
    ``int8_acc`` marks a float-typed accumulator that nevertheless holds
    exact int8×int8 products (the bf16-compute depthwise path) and needs
    the int8 scale treatment."""
    attrs = op.attrs
    act = attrs.get("fuse_act")
    if acc.dtype == jnp.int32 or int8_acc:
        xq = ctx.var_quant(x_name)
        wq = ctx.var_quant(w_name)
        eff = np.float32(xq.scale[0]) * wq.scale_array()  # per-out-channel
        y = acc.astype(jnp.float32) * eff
    else:
        y = acc
    if bias is not None:
        y = y + bias.astype(jnp.float32)
    if residual is not None:
        if residual.dtype == jnp.int8:
            rq = ctx.var_quant(residual_name)
            residual = dequantize(residual, rq.scale[0])
        y = y + residual
    y = apply_activation(y, act, attrs.get("act_attrs"))
    out_scale = attrs.get("out_scale")
    if out_scale is not None:
        y = quantize(y, out_scale)
    return y


@OPS.kernel("conv2d", "xla")
@OPS.kernel("depthwise_conv2d", "xla")
def conv2d_xla(ctx, op, ins):
    x = ins["Input"][0]
    w = ins["Filter"][0]
    bias = ins.get("Bias", [None])[0]
    residual = ins.get("ResidualData", [None])[0]
    attrs = op.attrs
    strides = normalize_2d(attrs.get("strides", (1, 1)))
    dilations = normalize_2d(attrs.get("dilations", (1, 1)))
    padding = normalize_paddings(attrs.get("paddings", (0, 0)))
    groups = int(attrs.get("groups", 1))
    if op.op_type == "depthwise_conv2d":
        groups = x.shape[-1]

    x, w = maybe_dequant_mixed(ctx, x, op.input("Input"), w, op.input("Filter"))
    int8_path = x.dtype == jnp.int8 and w.dtype == jnp.int8
    # Depthwise int8 runs on the VPU (no MXU help) where int32 multiplies
    # are slower than float FMAs. dw_compute="bf16" keeps the int8 HBM
    # edges but computes in bf16: int8 values are exact in bf16 and
    # bf16×bf16→fp32 products/sums of a ≤7×7 window stay < 2^24, so the
    # accumulator is bit-identical to the int32 path.
    dw_bf16 = (int8_path and groups == x.shape[-1]
               and op.attrs.get("dw_compute") == "bf16")
    if dw_bf16:
        x, w = x.astype(jnp.bfloat16), w.astype(jnp.bfloat16)
    # XLA's CPU backend has no fast integer-conv path (measured ~55x slower
    # than fp32 Eigen convs; int8 *dot* is fast via oneDNN, and im2col
    # patches lower back to an int8 conv, so neither rescues it). On the
    # CPU platform — the test/calibration vehicle, not a deployment target
    # — compute int8 convs in fp32 and round: exact while |accum| < 2^24
    # (always, for depthwise windows; in practice, for dense convs), the
    # same float-accumulate ground-truth formulation the reference's own
    # int8 conv tests used (SURVEY §4 naive_math_impl).
    # Opt-in (attr "conv1x1_dot", study tools/studies/pw_dot_r5.py): lower
    # an int8 1x1/s1/group-1 conv as reshape+dot INSIDE the XLA graph —
    # unlike the Pallas conv-as-GEMM route this pays no custom-call
    # layout toll (XLA assigns layouts for the whole chain jointly).  On
    # the CPU test platform the int8 dot is also the fast path (oneDNN —
    # unlike int8 convs, see below), so this runs everywhere.
    if (attrs.get("conv1x1_dot") and int8_path and not dw_bf16
            and w.shape[0] == 1 and w.shape[1] == 1
            and strides == (1, 1) and groups == 1 and residual is None):
        n_, h_, w_sp, c_ = x.shape
        acc = jax.lax.dot(
            x.reshape(n_ * h_ * w_sp, c_), w.reshape(c_, -1),
            preferred_element_type=jnp.int32,
        ).reshape(n_, h_, w_sp, -1)
        y = _conv_epilogue(
            ctx, op, acc, op.input("Input"), op.input("Filter"),
            bias, residual, op.maybe_input("ResidualData"))
        return {"Output": [y]}
    cpu_f32 = int8_path and not dw_bf16 and ctx.platform == "cpu"
    if cpu_f32:
        x, w = x.astype(jnp.float32), w.astype(jnp.float32)
    acc = jax.lax.conv_general_dilated(
        x,
        w,
        window_strides=strides,
        padding=padding,
        rhs_dilation=dilations,
        dimension_numbers=CONV_DN,
        feature_group_count=groups,
        preferred_element_type=jnp.int32
        if (int8_path and not dw_bf16 and not cpu_f32)
        else jnp.float32,
    )
    if cpu_f32:
        acc = jnp.round(acc)
    y = _conv_epilogue(
        ctx, op, acc,
        op.input("Input"), op.input("Filter"),
        bias, residual,
        op.maybe_input("ResidualData"),
        int8_acc=dw_bf16 or cpu_f32,
    )
    return {"Output": [y]}


@OPS.shape_fn("conv2d_transpose")
def conv2d_transpose_shape(attrs, in_shapes):
    (n, h, w, _), (kh, kw, _, oc_per_g) = in_shapes[0], in_shapes[1]
    sh, sw = normalize_2d(attrs.get("strides", (1, 1)))
    dh, dw = normalize_2d(attrs.get("dilations", (1, 1)))
    (ph0, ph1), (pw0, pw1) = normalize_paddings(attrs.get("paddings", (0, 0)))
    groups = int(attrs.get("groups", 1))
    oph, opw = normalize_2d(attrs.get("output_padding", (0, 0)))
    oh = (h - 1) * sh - ph0 - ph1 + dh * (kh - 1) + 1 + oph
    ow = (w - 1) * sw - pw0 - pw1 + dw * (kw - 1) + 1 + opw
    return [(n, oh, ow, oc_per_g * groups)]


@OPS.kernel("conv2d_transpose", "xla")
def conv2d_transpose_xla(ctx, op, ins):
    x = ins["Input"][0]
    w = ins["Filter"][0]  # HWIO with I = in_channels/groups? stored HWOI-style
    bias = ins.get("Bias", [None])[0]
    attrs = op.attrs
    sh, sw = normalize_2d(attrs.get("strides", (1, 1)))
    dh, dw = normalize_2d(attrs.get("dilations", (1, 1)))
    (ph0, ph1), (pw0, pw1) = normalize_paddings(attrs.get("paddings", (0, 0)))
    oph, opw = normalize_2d(attrs.get("output_padding", (0, 0)))
    if x.dtype == jnp.int8:
        x = dequantize(x, ctx.var_quant(op.input("Input")).scale[0])
    if w.dtype == jnp.int8:
        wq = ctx.var_quant(op.input("Filter"))
        w = dequantize(w, wq.scale_array(), axis=wq.axis if wq.axis is not None else None)
    if x.dtype != w.dtype:  # bf16-island operand meets a dequantized fp32 one
        common = jnp.promote_types(x.dtype, w.dtype)
        x, w = x.astype(common), w.astype(common)
    kh, kw = w.shape[0], w.shape[1]
    groups = int(attrs.get("groups", 1))
    if (sh == kh and sw == kw and dh == dw == 1 and groups == 1
            and ph0 == ph1 == pw0 == pw1 == 0 and oph == opw == 0):
        # Non-overlapping deconv (kernel == stride, e.g. the DBNet head's
        # 2x2s2 upsamples): every input pixel independently emits a
        # (kh, kw) output block, so the op is exactly ONE (N*H*W, Ci) @
        # (Ci, kh*kw*Co) GEMM followed by depth-to-space. XLA's generic
        # lhs_dilation lowering measured ~14x off roofline at DBNet shapes
        # (0.86 ms for a 0.06 ms-roofline op, tools/studies/dbnet_bf16.py
        # probe); the MXU GEMM form is roofline-shaped.
        n, h, wd, ci = x.shape
        co = w.shape[3]
        wm = w.transpose(2, 0, 1, 3).reshape(ci, kh * kw * co)
        acc = jax.lax.dot(x.reshape(n * h * wd, ci), wm,
                          preferred_element_type=jnp.float32)
        acc = acc.reshape(n, h, wd, kh, kw, co)
        acc = acc.transpose(0, 1, 3, 2, 4, 5).reshape(n, h * kh, wd * kw, co)
        y = _conv_epilogue(ctx, op, acc, op.input("Input"),
                           op.input("Filter"), bias, None, None)
        return {"Output": [y]}
    # gradient-style transposed conv: lhs_dilation = stride
    pad_h = (dh * (kh - 1) - ph0, dh * (kh - 1) - ph1 + oph)
    pad_w = (dw * (kw - 1) - pw0, dw * (kw - 1) - pw1 + opw)
    # filter stored (kh, kw, in_c, out_c): spatial flip only — the gradient-
    # form conv already contracts over in_c in the I slot
    acc = jax.lax.conv_general_dilated(
        x,
        jnp.flip(w, axis=(0, 1)),
        window_strides=(1, 1),
        padding=(pad_h, pad_w),
        lhs_dilation=(sh, sw),
        rhs_dilation=(dh, dw),
        dimension_numbers=CONV_DN,
        feature_group_count=int(attrs.get("groups", 1)),
        preferred_element_type=jnp.float32,
    )
    y = _conv_epilogue(ctx, op, acc, op.input("Input"), op.input("Filter"),
                       bias, None, None)
    return {"Output": [y]}


# ---------------------------------------------------------------------------
# fc / mul / matmul
# ---------------------------------------------------------------------------

@OPS.shape_fn("fc")
def fc_shape(attrs, in_shapes):
    x, w = in_shapes[0], in_shapes[1]
    in_num_col_dims = int(attrs.get("in_num_col_dims", len(x) - 1))
    return [tuple(x[:in_num_col_dims]) + (w[1],)]


@OPS.kernel("fc", "xla")
def fc_xla(ctx, op, ins):
    x = ins["Input"][0]
    w = ins["W"][0]  # (K, O)
    bias = ins.get("Bias", [None])[0]
    attrs = op.attrs
    in_num_col_dims = int(attrs.get("in_num_col_dims", x.ndim - 1))
    lead = x.shape[:in_num_col_dims]
    x2 = x.reshape((-1, int(np.prod(x.shape[in_num_col_dims:]))))
    x2, w = maybe_dequant_mixed(ctx, x2, op.input("Input"), w, op.input("W"))
    int8_path = x2.dtype == jnp.int8 and w.dtype == jnp.int8
    acc = jnp.dot(
        x2, w, preferred_element_type=jnp.int32 if int8_path else jnp.float32
    )
    y = _conv_epilogue(ctx, op, acc, op.input("Input"), op.input("W"),
                       bias, None, None)
    return {"Out": [y.reshape(lead + (w.shape[1],))]}


@OPS.shape_fn("mul")
def mul_shape(attrs, in_shapes):
    x, y = in_shapes[0], in_shapes[1]
    xd = int(attrs.get("x_num_col_dims", 1))
    yd = int(attrs.get("y_num_col_dims", 1))
    return [tuple(x[:xd]) + tuple(y[yd:])]


@OPS.kernel("mul", "xla")
def mul_xla(ctx, op, ins):
    x, w = ins["X"][0], ins["Y"][0]
    attrs = op.attrs
    xd = int(attrs.get("x_num_col_dims", 1))
    yd = int(attrs.get("y_num_col_dims", 1))
    lead = x.shape[:xd]
    tail = w.shape[yd:]
    x2 = x.reshape((int(np.prod(lead) if lead else 1), -1))
    w2 = w.reshape((-1, int(np.prod(tail) if tail else 1)))
    x2, w2 = maybe_dequant_mixed(ctx, x2, op.input("X"), w2, op.input("Y"))
    int8_path = x2.dtype == jnp.int8 and w2.dtype == jnp.int8
    acc = jnp.dot(
        x2, w2, preferred_element_type=jnp.int32 if int8_path else jnp.float32
    )
    y = _conv_epilogue(ctx, op, acc, op.input("X"), op.input("Y"),
                       None, None, None)
    return {"Out": [y.reshape(lead + tail)]}


@OPS.shape_fn("matmul")
def matmul_shape(attrs, in_shapes):
    x = list(in_shapes[0])
    y = list(in_shapes[1])
    if attrs.get("transpose_X"):
        x[-1], x[-2] = x[-2], x[-1]
    if attrs.get("transpose_Y"):
        y[-1], y[-2] = y[-2], y[-1]
    batch = x[:-2] if len(x) >= len(y) else y[:-2]
    return [tuple(batch) + (x[-2], y[-1])]


@OPS.kernel("matmul", "xla")
def matmul_xla(ctx, op, ins):
    x, y = ins["X"][0], ins["Y"][0]
    attrs = op.attrs
    # dequant before any transpose so per-channel axes match storage layout
    x, y = maybe_dequant_mixed(ctx, x, op.input("X"), y, op.input("Y"))
    if attrs.get("transpose_X"):
        x = jnp.swapaxes(x, -1, -2)
    if attrs.get("transpose_Y"):
        y = jnp.swapaxes(y, -1, -2)
    int8_path = x.dtype == jnp.int8 and y.dtype == jnp.int8
    acc = jnp.matmul(
        x, y, preferred_element_type=jnp.int32 if int8_path else jnp.float32
    )
    if int8_path:
        xq = ctx.var_quant(op.input("X"))
        yq = ctx.var_quant(op.input("Y"))
        # activation×activation matmuls (attention) are per-tensor×per-tensor;
        # weight operands may carry per-channel scales along the output axis
        if yq.per_channel:
            eff = np.float32(xq.scale[0]) * yq.scale_array()
        else:
            eff = np.float32(xq.scale[0]) * np.float32(yq.scale[0])
        out = acc.astype(jnp.float32) * eff
    else:
        out = acc
    alpha = attrs.get("alpha", 1.0)
    if alpha != 1.0:
        out = out * alpha
    out = apply_activation(out, attrs.get("fuse_act"), attrs.get("act_attrs"))
    out_scale = attrs.get("out_scale")
    if out_scale is not None:
        out = quantize(out, out_scale)
    return {"Out": [out]}


# ---------------------------------------------------------------------------
# batch_norm (standalone; usually folded into conv by conv_bn_fuse)
# ---------------------------------------------------------------------------

@OPS.shape_fn("batch_norm")
def bn_shape(attrs, in_shapes):
    return [in_shapes[0]]


@OPS.kernel("batch_norm", "xla")
def batch_norm_xla(ctx, op, ins):
    x = ins["X"][0]
    scale = ins["Scale"][0]
    bias = ins["Bias"][0]
    mean = ins["Mean"][0]
    var = ins["Variance"][0]
    eps = op.attrs.get("epsilon", 1e-5)
    inv = jax.lax.rsqrt(var + eps) * scale
    return {"Y": [x * inv + (bias - mean * inv)]}


# ---------------------------------------------------------------------------
# pool2d
# ---------------------------------------------------------------------------

@OPS.shape_fn("pool2d")
def pool2d_shape(attrs, in_shapes):
    n, h, w, c = in_shapes[0]
    adaptive_1x1 = attrs.get("adaptive") and tuple(attrs.get("ksize") or ()) == (1, 1)
    if attrs.get("global_pooling") or adaptive_1x1:
        return [(n, 1, 1, c)]
    kh, kw = normalize_2d(attrs["ksize"])
    sh, sw = normalize_2d(attrs.get("strides", (1, 1)))
    (ph0, ph1), (pw0, pw1) = normalize_paddings(attrs.get("paddings", (0, 0)))
    if attrs.get("ceil_mode"):
        oh = -(-(h + ph0 + ph1 - kh) // sh) + 1
        ow = -(-(w + pw0 + pw1 - kw) // sw) + 1
    else:
        oh = (h + ph0 + ph1 - kh) // sh + 1
        ow = (w + pw0 + pw1 - kw) // sw + 1
    return [(n, oh, ow, c)]


@OPS.kernel("pool2d", "xla")
def pool2d_xla(ctx, op, ins):
    x = ins["X"][0]
    attrs = op.attrs
    ptype = attrs.get("pooling_type", "max")
    is_int8 = x.dtype == jnp.int8
    if attrs.get("global_pooling"):
        if ptype == "avg":
            if is_int8:
                s = jnp.sum(x.astype(jnp.int32), axis=(1, 2), keepdims=True)
                cnt = x.shape[1] * x.shape[2]
                y = jnp.clip(jnp.round(s / cnt), -127, 127).astype(jnp.int8)
            else:
                y = jnp.mean(x, axis=(1, 2), keepdims=True)
        else:
            y = jnp.max(x, axis=(1, 2), keepdims=True)
        return {"Out": [y]}

    kh, kw = normalize_2d(attrs["ksize"])
    sh, sw = normalize_2d(attrs.get("strides", (1, 1)))
    pads = normalize_paddings(attrs.get("paddings", (0, 0)))
    (ph0, ph1), (pw0, pw1) = pads
    if attrs.get("ceil_mode"):
        # extend right/bottom padding so the window grid covers the input
        n, h, w, c = x.shape
        oh = -(-(h + ph0 + ph1 - kh) // sh) + 1
        ow = -(-(w + pw0 + pw1 - kw) // sw) + 1
        ph1 = max(ph1, (oh - 1) * sh + kh - h - ph0)
        pw1 = max(pw1, (ow - 1) * sw + kw - w - pw0)
    window_pads = ((0, 0), (ph0, ph1), (pw0, pw1), (0, 0))

    if ptype == "max":
        init = jnp.iinfo(jnp.int8).min if is_int8 else -jnp.inf
        y = jax.lax.reduce_window(
            x, jnp.asarray(init, x.dtype), jax.lax.max,
            (1, kh, kw, 1), (1, sh, sw, 1), window_pads,
        )
    else:
        xa = x.astype(jnp.int32) if is_int8 else x
        s = jax.lax.reduce_window(
            xa, jnp.asarray(0, xa.dtype), jax.lax.add,
            (1, kh, kw, 1), (1, sh, sw, 1), window_pads,
        )
        if attrs.get("exclusive", True):
            ones = jnp.ones(x.shape[:3] + (1,), jnp.float32)
            cnt = jax.lax.reduce_window(
                ones, 0.0, jax.lax.add,
                (1, kh, kw, 1), (1, sh, sw, 1), window_pads,
            )
        else:
            cnt = float(kh * kw)
        if is_int8:
            y = jnp.clip(jnp.round(s / cnt), -127, 127).astype(jnp.int8)
        else:
            y = s / cnt
    return {"Out": [y]}


# ---------------------------------------------------------------------------
# softmax / layer_norm / dropout / prelu  (fp islands: never int8 — mirrors
# the reference keeping softmax/layernorm in fp within int8 models)
# ---------------------------------------------------------------------------

@OPS.shape_fn("softmax")
def softmax_shape(attrs, in_shapes):
    return [in_shapes[0]]


@OPS.kernel("softmax", "xla")
def softmax_xla(ctx, op, ins):
    x = ins["X"][0]
    axis = int(op.attrs.get("axis", -1))
    return {"Out": [jax.nn.softmax(x.astype(jnp.float32), axis=axis)]}


@OPS.shape_fn("layer_norm")
def layer_norm_shape(attrs, in_shapes):
    return [in_shapes[0]]


@OPS.kernel("layer_norm", "xla")
def layer_norm_xla(ctx, op, ins):
    x = ins["X"][0].astype(jnp.float32)
    scale = ins.get("Scale", [None])[0]
    bias = ins.get("Bias", [None])[0]
    attrs = op.attrs
    begin = int(attrs.get("begin_norm_axis", 1))
    axes = tuple(range(begin, x.ndim))
    mean = jnp.mean(x, axis=axes, keepdims=True)
    var = jnp.mean(jnp.square(x - mean), axis=axes, keepdims=True)
    y = (x - mean) * jax.lax.rsqrt(var + attrs.get("epsilon", 1e-5))
    if scale is not None:
        y = y * scale
    if bias is not None:
        y = y + bias
    return {"Y": [y]}


@OPS.shape_fn("dropout")
def dropout_shape(attrs, in_shapes):
    return [in_shapes[0]]


@OPS.kernel("dropout", "xla")
def dropout_xla(ctx, op, ins):
    # inference: downgrade_in_infer multiplies by (1-p); upscale_in_train is id
    x = ins["X"][0]
    impl = op.attrs.get("dropout_implementation", "downgrade_in_infer")
    if impl == "downgrade_in_infer":
        return {"Out": [x * (1.0 - float(op.attrs.get("dropout_prob", 0.0)))]}
    return {"Out": [x]}


@OPS.shape_fn("prelu")
def prelu_shape(attrs, in_shapes):
    return [in_shapes[0]]


@OPS.kernel("prelu", "xla")
def prelu_xla(ctx, op, ins):
    x = ins["X"][0]
    alpha = ins["Alpha"][0]
    mode = op.attrs.get("mode", "channel")
    if mode == "all":
        a = alpha.reshape(())
    elif mode == "channel":
        a = alpha.reshape((1,) * (x.ndim - 1) + (-1,))  # NHWC: channel last
    else:  # element
        a = alpha.reshape(x.shape[1:])
    return {"Out": [jnp.where(x >= 0, x, a * x)]}
