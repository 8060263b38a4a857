"""Shared helpers for op implementations.

The quantization helpers here are the jnp-level analog of Paddle-Lite's
``lite/backends/arm/math/type_trans.cc`` (fp32↔int8 round/saturate transforms
used by its ``calib`` kernels) and of the fused scale+bias+activation
epilogues of ``gemm_prepacked_int8.cc``.  They are written as plain jnp so
XLA fuses them into the neighboring matmul/conv — explicit kernels only
remain at fp↔int8 island boundaries, mirroring where the reference inserted
``calib`` ops.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core.types import QuantInfo

INT8_MIN, INT8_MAX = -127, 127  # symmetric: -127..127, matching reference


# ---- activations ----------------------------------------------------------

def apply_activation(x, act: Optional[str], attrs=None):
    """Fused-activation epilogue.

    Covers the set Paddle-Lite's ``conv_activation_fuse_pass`` folds into
    ``ConvParam`` (relu / relu6 / leaky_relu / hard_swish / hard_sigmoid /
    sigmoid / swish) plus the standalone activation ops.
    """
    if act is None or act == "" or act == "linear":
        return x
    attrs = attrs or {}
    if act == "relu":
        return jax.nn.relu(x)
    if act == "relu6":
        return jnp.clip(x, 0.0, 6.0)
    if act == "leaky_relu":
        alpha = attrs.get("alpha", 0.01)
        return jnp.where(x >= 0, x, alpha * x)
    if act == "sigmoid":
        return jax.nn.sigmoid(x)
    if act == "tanh":
        return jnp.tanh(x)
    if act == "swish":
        # paddle swish: x * sigmoid(beta * x)
        beta = attrs.get("beta", 1.0)
        return x * jax.nn.sigmoid(beta * x)
    if act == "hard_swish":
        # paddle hard_swish: x * min(max(x+offset,0), threshold) / scale
        thr = attrs.get("threshold", 6.0)
        scl = attrs.get("scale", 6.0)
        off = attrs.get("offset", 3.0)
        return x * jnp.clip(x + off, 0.0, thr) / scl
    if act == "hard_sigmoid":
        slope = attrs.get("slope", 0.2)
        off = attrs.get("offset", 0.5)
        return jnp.clip(slope * x + off, 0.0, 1.0)
    if act == "relu_clipped":
        return jnp.clip(x, 0.0, attrs.get("Relu_clipped_coef", 6.0))
    if act == "gelu":
        return jax.nn.gelu(x, approximate=attrs.get("approximate", False))
    if act == "exp":
        return jnp.exp(x)
    if act == "abs":
        return jnp.abs(x)
    if act == "sqrt":
        return jnp.sqrt(x)
    if act == "rsqrt":
        return jax.lax.rsqrt(x)
    if act == "square":
        return jnp.square(x)
    if act == "log":
        return jnp.log(x)
    if act == "floor":
        return jnp.floor(x)
    if act == "mish":
        return x * jnp.tanh(jax.nn.softplus(x))
    if act == "elu":
        return jax.nn.elu(x, alpha=attrs.get("alpha", 1.0))
    if act == "softplus":
        return jax.nn.softplus(x)
    if act == "softsign":
        return x / (1.0 + jnp.abs(x))
    if act == "silu":
        return jax.nn.silu(x)
    if act == "reciprocal":
        return 1.0 / x
    raise ValueError(f"unknown activation {act!r}")


# ---- quantization ---------------------------------------------------------

def quantize(x, scale, axis: Optional[int] = None):
    """fp32 -> int8, round-to-nearest-even, saturate (type_trans fp32→int8).

    `scale` is a scalar (per-tensor) or 1-D per-channel array along `axis`.
    """
    scale = jnp.asarray(scale, jnp.float32)
    if axis is not None and scale.ndim == 1:
        shape = [1] * x.ndim
        shape[axis] = -1
        scale = scale.reshape(shape)
    q = jnp.round(x / scale)
    return jnp.clip(q, INT8_MIN, INT8_MAX).astype(jnp.int8)


def dequantize(q, scale, axis: Optional[int] = None):
    """int8 -> fp32 (type_trans int8→fp32)."""
    scale = jnp.asarray(scale, jnp.float32)
    if axis is not None and scale.ndim == 1:
        shape = [1] * q.ndim
        shape[axis] = -1
        scale = scale.reshape(shape)
    return q.astype(jnp.float32) * scale


def requant_epilogue(
    acc_i32,
    *,
    effective_scale,  # s_x * s_w  (per-channel along last axis, or scalar)
    bias=None,  # fp32, broadcastable over last axis
    act: Optional[str] = None,
    act_attrs=None,
    out_scale: Optional[float] = None,  # if set, requantize output to int8
):
    """The int8 GEMM epilogue: int32 accum → fp32 scale → +bias → act →
    (optional) saturating int8 requant.  Fused structure mirrors the asm
    epilogue of ``gemm_prepacked_int8.cc`` (scale+bias+relu in-register);
    under XLA all of this fuses into the convolution/dot consumer.
    """
    y = acc_i32.astype(jnp.float32) * jnp.asarray(effective_scale, jnp.float32)
    if bias is not None:
        y = y + bias
    y = apply_activation(y, act, act_attrs)
    if out_scale is not None:
        return quantize(y, out_scale)
    return y


def effective_conv_scale(in_scale: float, weight_scales) -> np.ndarray:
    """Fold s_x * s_w[c] at graph-build time (PrepareForRun-analog: the
    reference pre-multiplied scales once in ``ConvCompute::PrepareForRun``)."""
    return np.float32(in_scale) * np.asarray(weight_scales, np.float32)


# ---- shape utilities ------------------------------------------------------

def normalize_2d(v, name: str = "value") -> Tuple[int, int]:
    if isinstance(v, int):
        return (v, v)
    t = tuple(int(x) for x in v)
    if len(t) == 1:
        return (t[0], t[0])
    if len(t) != 2:
        raise ValueError(f"{name} must have 1-2 entries, got {v}")
    return t


def normalize_paddings(paddings) -> Tuple[Tuple[int, int], Tuple[int, int]]:
    """Paddle conv paddings: [h, w] or [h0, h1, w0, w1] → ((h0,h1),(w0,w1))."""
    if isinstance(paddings, str):
        raise ValueError("string padding handled by caller")
    p = [int(x) for x in np.asarray(paddings).reshape(-1)]
    if len(p) == 1:
        p = p * 4
    if len(p) == 2:
        return ((p[0], p[0]), (p[1], p[1]))
    if len(p) == 4:
        return ((p[0], p[1]), (p[2], p[3]))
    raise ValueError(f"bad paddings {paddings}")


def conv_out_size(in_size: int, k: int, stride: int, pad: Tuple[int, int], dilation: int) -> int:
    eff_k = dilation * (k - 1) + 1
    return (in_size + pad[0] + pad[1] - eff_k) // stride + 1


def _unpack_w4(v, pack_axis: int):
    """Unpack W4 storage (two signed 4-bit values per int8 byte along
    ``pack_axis``; low nibble = even element) back to int8.  Shift/mask
    arithmetic only — the jnp int4 dtype is broken in this jax build."""
    import jax.numpy as jnp

    lo = ((v & jnp.int8(0xF)) ^ jnp.int8(8)) - jnp.int8(8)  # sign-extend
    hi = jnp.right_shift(v, 4).astype(jnp.int8)  # arithmetic shift
    st = jnp.stack([lo, hi], axis=pack_axis + 1)
    shp = list(v.shape)
    shp[pack_axis] *= 2
    return st.reshape(shp)


def maybe_dequant_mixed(ctx, a, a_name, b, b_name):
    """Mixed-precision operand repair for matmul-family ops.

    If exactly one operand is a quantized integer tensor — the weight-only
    storage mode (int8/int16 weights, fp32 activations; ``SaveModelNaive``'s
    quantize-on-save analog) or a partially-scaled QAT import — inline-
    dequantize it; XLA fuses the convert+scale into the consumer, so the
    HBM copy of the weight stays narrow. Both-int8 (the PTQ fast path) and
    both-float operands pass through untouched."""
    import jax.numpy as jnp

    int_types = (jnp.int8, jnp.int16)

    def deq(v, name):
        q = ctx.var_quant(name)
        if q is None:
            return v.astype(jnp.float32)
        if getattr(q, "pack_axis", None) is not None and q.bits == 4:
            v = _unpack_w4(v, q.pack_axis)
        return dequantize(v, q.scale_array() if q.per_channel else q.scale[0],
                          axis=q.axis)

    a_int = a.dtype in int_types
    b_int = b.dtype in int_types
    if a_int == b_int and a.dtype != jnp.int16 and b.dtype != jnp.int16:
        return a, b  # both-int8 or both-float: native paths handle these
    if a_int:
        a = deq(a, a_name)
    if b_int:
        b = deq(b, b_name)
    if a.dtype != b.dtype:
        common = jnp.promote_types(a.dtype, b.dtype)
        a, b = a.astype(common), b.astype(common)
    return a, b
