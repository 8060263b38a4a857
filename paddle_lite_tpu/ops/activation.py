"""Standalone activation ops — ``lite/operators/activation_ops.cc`` +
``lite/kernels/arm/activation_compute.cc`` analog.

Each is a one-liner over :func:`common.apply_activation`; under XLA they fuse
into their producer exactly the way the reference's
``conv_activation_fuse_pass`` fused them into conv params — the fusion pass
still exists here (it matters for the *int8* path, where the activation must
run inside the requant epilogue before saturation), but unfused fp32
activations cost nothing extra.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..core.registry import OPS
from .common import apply_activation

_SIMPLE_ACTS = [
    "relu", "relu6", "leaky_relu", "sigmoid", "tanh", "swish", "hard_swish",
    "hard_sigmoid", "relu_clipped", "gelu", "exp", "abs", "sqrt", "rsqrt",
    "square", "log", "floor", "mish", "elu", "softplus", "softsign", "silu",
    "reciprocal",
]


def _same_shape(attrs, in_shapes):
    return [in_shapes[0]]


def _make_impl(act_name):
    def impl(ctx, op, ins):
        x = ins["X"][0]
        if x.dtype == jnp.int8:
            q = ctx.var_quant(op.input("X"))
            x = x.astype(jnp.float32) * q.scale[0]
        return {"Out": [apply_activation(x, act_name, op.attrs)]}

    impl.__name__ = f"{act_name}_impl"
    return impl


for _name in _SIMPLE_ACTS:
    OPS.register(_name, infer_shape=_same_shape, input_slots=("X",))
    OPS.get(_name).impls["xla"] = _make_impl(_name)
