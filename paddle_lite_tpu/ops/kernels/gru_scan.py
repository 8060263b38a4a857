"""Pallas VMEM-resident bidirectional GRU recurrence.

CRNN's recurrence (hidden 48, T=80, both directions) is the textbook case
XLA's `lax.scan` handles worst on TPU: 80 sequential steps, each a pair of
(64,48)x(48,144)-class matmuls whose operands bounce through HBM every
step, plus loop bookkeeping — measured ~30-45% of the whole rec-model batch
(bf16 islands bought +45% in r1 mostly here).  The reference runs its GRUs
as ARM NEON loops over timesteps with weights resident in cache
(SURVEY §2.6 seq/RNN math, lite/backends/arm/math/sgemm + gru_compute);
the TPU-native equivalent of "weights stay in cache" is ONE Pallas kernel
holding the entire recurrence: input projections, hidden state, and both
direction weights live in VMEM for all T steps, the MXU runs the tiny
per-step matmuls back-to-back, and HBM sees exactly one read of x and one
write of the output sequence.

Layout: time-major (T, B, 3H) inputs (the bw input pre-flipped so both
directions scan forward); outputs (T, B, H) per direction, concatenated +
re-flipped by the caller.  All compute fp32 regardless of storage dtype.

Feasibility gate (`supported`): everything must fit VMEM — at CRNN's
(T=80, B=64, H=48) the padded footprint is ~7MB of the ~16MB budget.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _bigru_kernel(xfw_ref, xbw_ref, wfw_ref, wbw_ref, ofw_ref, obw_ref,
                  hfw_ref, hbw_ref, *, t: int, h: int):
    hfw_ref[:] = jnp.zeros_like(hfw_ref)
    hbw_ref[:] = jnp.zeros_like(hbw_ref)

    def step(i, _):
        def one(x_ref, h_ref, w_ref, o_ref):
            x_t = x_ref[pl.ds(i, 1)][0].astype(jnp.float32)
            hp = h_ref[:]
            w = w_ref[:].astype(jnp.float32)
            g = x_t[:, : 2 * h] + jax.lax.dot_general(
                hp, w[:, : 2 * h], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            u = jax.nn.sigmoid(g[:, :h])
            r = jax.nn.sigmoid(g[:, h:])
            c = jnp.tanh(x_t[:, 2 * h:] + jax.lax.dot_general(
                r * hp, w[:, 2 * h:], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32))
            hn = u * hp + (1.0 - u) * c
            h_ref[:] = hn
            o_ref[pl.ds(i, 1)] = hn.astype(o_ref.dtype)[None]

        one(xfw_ref, hfw_ref, wfw_ref, ofw_ref)
        one(xbw_ref, hbw_ref, wbw_ref, obw_ref)
        return 0

    jax.lax.fori_loop(0, t, step, 0)


def supported(t: int, b: int, three_h: int, itemsize: int,
              gate_act: str = "sigmoid", cand_act: str = "tanh") -> bool:
    if gate_act != "sigmoid" or cand_act != "tanh":
        return False
    h = three_h // 3

    def padded(*dims):
        d = list(dims)
        d[-1] = -(-d[-1] // 128) * 128
        d[-2] = -(-d[-2] // 8) * 8
        out = 1
        for v in d:
            out *= v
        return out

    vmem = (2 * padded(t, b, three_h) * itemsize      # x fw+bw
            + 2 * padded(t, b, h) * itemsize          # out fw+bw
            + 2 * padded(h, three_h) * itemsize       # weights
            + 2 * padded(b, h) * 4)                   # h scratch fp32
    return vmem <= 10 * 1024 * 1024


@functools.partial(jax.jit, static_argnames=("interpret",))
def bigru_pallas(x_fw, x_bw_flipped, w_fw, w_bw, *, interpret: bool = False):
    """x_* are time-major (T, B, 3H) with bias already added; the bw input
    is pre-flipped so both directions scan forward.  Returns
    (hs_fw, hs_bw_flipped), each (T, B, H) in x's dtype."""
    t, b, three_h = x_fw.shape
    h = three_h // 3
    out_shape = jax.ShapeDtypeStruct((t, b, h), x_fw.dtype)
    kernel = functools.partial(_bigru_kernel, t=t, h=h)
    return pl.pallas_call(
        kernel,
        in_specs=[
            pl.BlockSpec((t, b, three_h), lambda: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((t, b, three_h), lambda: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((h, three_h), lambda: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((h, three_h), lambda: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((t, b, h), lambda: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((t, b, h), lambda: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[out_shape, out_shape],
        scratch_shapes=[pltpu.VMEM((b, h), jnp.float32),
                        pltpu.VMEM((b, h), jnp.float32)],
        interpret=interpret,
    )(x_fw, x_bw_flipped, w_fw, w_bw)
