"""Sequence/RNN ops: gru / lstm / im2sequence / sequence_softmax /
ctc_greedy_decode — analog of ``lite/operators/{gru,lstm,im2sequence}_op.cc``
and ``lite/backends/arm/math/{gru_utils.h,lstm.cc}``.

TPU-native design decisions vs the reference:

- The reference used LoD (level-of-detail) ragged tensors to pack variable-
  length sequences; ragged shapes are jit-hostile, so sequences here are
  dense ``(batch, time, features)`` with an optional length mask — the
  bucketed-batch serving layer (runtime/batcher.py) is where raggedness is
  absorbed (SURVEY §5.7).
- Recurrences run under ``lax.scan`` (compiler-friendly control flow); the
  input-to-hidden projections for ALL timesteps are hoisted into one big
  (and int8-quantizable) matmul before the scan, leaving only the small
  hidden-to-hidden GEMM inside the sequential loop — the same split the
  reference's GRU kernel made (batched gate GEMM + pointwise recurrence).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..core.registry import OPS
from .common import apply_activation


# ---------------------------------------------------------------------------
# GRU — paddle convention: input X already holds x_t @ W_ih (3h per step)
# arranged [update, reset, candidate]; Weight is hidden-to-hidden (h, 3h).
# ---------------------------------------------------------------------------

@OPS.shape_fn("gru")
def gru_shape(attrs, in_shapes):
    b, t, three_h = in_shapes[0]
    h = three_h // 3
    return [(b, t, h)]


@OPS.kernel("gru", "xla")
def gru_xla(ctx, op, ins):
    x = ins["Input"][0]  # (B, T, 3H) precomputed input projections
    w = ins["Weight"][0]  # (H, 3H) — [:, :2H] gates, [:, 2H:] candidate
    bias = ins.get("Bias", [None])[0]  # (3H,)
    h0 = ins.get("H0", [None])[0]
    attrs = op.attrs
    gate_act = attrs.get("gate_activation", "sigmoid")
    cand_act = attrs.get("activation", "tanh")
    b_, t, three_h = x.shape
    h = three_h // 3
    if bias is not None:
        x = x + bias
    if attrs.get("is_reverse"):
        x = jnp.flip(x, axis=1)
    init = h0 if h0 is not None else jnp.zeros((b_, h), x.dtype)
    w_g = w[:, : 2 * h]
    w_c = w[:, 2 * h :]

    def step(h_prev, x_t):
        g = x_t[:, : 2 * h] + h_prev @ w_g
        u = apply_activation(g[:, :h], gate_act)
        r = apply_activation(g[:, h:], gate_act)
        c = apply_activation(x_t[:, 2 * h :] + (r * h_prev) @ w_c, cand_act)
        h_new = u * h_prev + (1.0 - u) * c
        return h_new, h_new

    _, hs = jax.lax.scan(step, init, jnp.swapaxes(x, 0, 1))
    out = jnp.swapaxes(hs, 0, 1)
    if attrs.get("is_reverse"):
        out = jnp.flip(out, axis=1)
    return {"Hidden": [out]}


# ---------------------------------------------------------------------------
# LSTM — X holds x_t @ W_ih (4H) as [input, forget, cell, output]
# ---------------------------------------------------------------------------

@OPS.shape_fn("lstm")
def lstm_shape(attrs, in_shapes):
    b, t, four_h = in_shapes[0]
    h = four_h // 4
    return [(b, t, h), (b, t, h)]


@OPS.kernel("lstm", "xla")
def lstm_xla(ctx, op, ins):
    x = ins["Input"][0]  # (B, T, 4H)
    w = ins["Weight"][0]  # (H, 4H)
    bias = ins.get("Bias", [None])[0]
    attrs = op.attrs
    b_, t, four_h = x.shape
    h = four_h // 4
    if bias is not None:
        x = x + bias[: 4 * h]
    if attrs.get("is_reverse"):
        x = jnp.flip(x, axis=1)
    gate_act = attrs.get("gate_activation", "sigmoid")
    cell_act = attrs.get("cell_activation", "tanh")
    cand_act = attrs.get("candidate_activation", "tanh")

    def step(carry, x_t):
        h_prev, c_prev = carry
        g = x_t + h_prev @ w
        i = apply_activation(g[:, :h], gate_act)
        f = apply_activation(g[:, h : 2 * h], gate_act)
        ct = apply_activation(g[:, 2 * h : 3 * h], cand_act)
        o = apply_activation(g[:, 3 * h :], gate_act)
        c_new = f * c_prev + i * ct
        h_new = o * apply_activation(c_new, cell_act)
        return (h_new, c_new), (h_new, c_new)

    init = (jnp.zeros((b_, h), x.dtype), jnp.zeros((b_, h), x.dtype))
    _, (hs, cs) = jax.lax.scan(step, init, jnp.swapaxes(x, 0, 1))
    out_h = jnp.swapaxes(hs, 0, 1)
    out_c = jnp.swapaxes(cs, 0, 1)
    if attrs.get("is_reverse"):
        out_h = jnp.flip(out_h, axis=1)
        out_c = jnp.flip(out_c, axis=1)
    return {"Hidden": [out_h], "Cell": [out_c]}


# ---------------------------------------------------------------------------
# im2sequence — CRNN's conv-features → sequence flattening
# ---------------------------------------------------------------------------

@OPS.shape_fn("im2sequence")
def im2sequence_shape(attrs, in_shapes):
    n, h, w, c = in_shapes[0]
    kh, kw = attrs.get("kernels", [1, 1])
    sh, sw = attrs.get("strides", [1, 1])
    oh = (h - kh) // sh + 1
    ow = (w - kw) // sw + 1
    return [(n, oh * ow, kh * kw * c)]


@OPS.kernel("im2sequence", "xla")
def im2sequence_xla(ctx, op, ins):
    x = ins["X"][0]
    attrs = op.attrs
    kh, kw = attrs.get("kernels", [1, 1])
    sh, sw = attrs.get("strides", [1, 1])
    patches = jax.lax.conv_general_dilated_patches(
        x, (kh, kw), (sh, sw), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )  # (N, OH, OW, C*KH*KW)
    n, oh, ow, d = patches.shape
    return {"Out": [patches.reshape(n, oh * ow, d)]}


# ---------------------------------------------------------------------------
# sequence_* (dense equivalents) and CTC greedy decode
# ---------------------------------------------------------------------------

@OPS.shape_fn("sequence_softmax")
def sequence_softmax_shape(attrs, in_shapes):
    return [in_shapes[0]]


@OPS.kernel("sequence_softmax", "xla")
def sequence_softmax_xla(ctx, op, ins):
    return {"Out": [jax.nn.softmax(ins["X"][0], axis=-1)]}


@OPS.shape_fn("sequence_reverse")
def sequence_reverse_shape(attrs, in_shapes):
    return [in_shapes[0]]


@OPS.kernel("sequence_reverse", "xla")
def sequence_reverse_xla(ctx, op, ins):
    return {"Y": [jnp.flip(ins["X"][0], axis=1)]}


@OPS.shape_fn("sequence_pool")
def sequence_pool_shape(attrs, in_shapes):
    b, t, d = in_shapes[0]
    return [(b, d)]


@OPS.kernel("sequence_pool", "xla")
def sequence_pool_xla(ctx, op, ins):
    x = ins["X"][0]
    ptype = op.attrs.get("pooltype", "MAX").upper()
    if ptype == "MAX":
        return {"Out": [jnp.max(x, axis=1)]}
    if ptype in ("AVERAGE", "AVG", "MEAN"):
        return {"Out": [jnp.mean(x, axis=1)]}
    if ptype == "SUM":
        return {"Out": [jnp.sum(x, axis=1)]}
    if ptype == "LAST":
        return {"Out": [x[:, -1]]}
    if ptype == "FIRST":
        return {"Out": [x[:, 0]]}
    raise ValueError(f"unknown pooltype {ptype}")


@OPS.shape_fn("ctc_greedy_decode")
def ctc_greedy_decode_shape(attrs, in_shapes):
    b, t, c = in_shapes[0]
    return [(b, t), (b,)]


@OPS.kernel("ctc_greedy_decode", "xla")
def ctc_greedy_decode_xla(ctx, op, ins):
    """Greedy CTC: argmax per step, collapse repeats, drop blanks.

    Fixed-shape output: (B, T) label ids padded with -1 + (B,) lengths —
    the dense analog of the reference's LoD-ragged ``ctc_align`` output.
    Implemented with a scan (compiler-friendly; no data-dependent shapes).
    """
    probs = ins["X"][0]  # (B, T, C), blank = C-1 by paddle OCR convention
    blank = int(op.attrs.get("blank", probs.shape[-1] - 1))
    ids = jnp.argmax(probs, axis=-1)  # (B, T)
    b, t = ids.shape

    prev = jnp.concatenate([jnp.full((b, 1), -1, ids.dtype), ids[:, :-1]], axis=1)
    keep = (ids != blank) & (ids != prev)

    def compact_row(row_ids, row_keep):
        def step(carry, xs):
            out, n = carry
            i, k = xs
            out = jax.lax.cond(
                k, lambda o: o.at[n].set(i), lambda o: o, out
            )
            return (out, n + k.astype(n.dtype)), None

        init = (jnp.full((t,), -1, row_ids.dtype), jnp.asarray(0, jnp.int32))
        (out, n), _ = jax.lax.scan(step, init, (row_ids, row_keep))
        return out, n

    out, lens = jax.vmap(compact_row)(ids, keep)
    return {"Out": [out], "Length": [lens]}


# ---------------------------------------------------------------------------
# bidirectional_gru — both directions advance in ONE scan step (vmap over
# the direction axis), halving the sequential depth vs two chained gru ops;
# the TPU-native improvement over the reference's separate fw/bw GRU kernels
# ---------------------------------------------------------------------------

@OPS.shape_fn("bidirectional_gru")
def bigru_shape(attrs, in_shapes):
    b, t, three_h = in_shapes[0]
    h = three_h // 3
    return [(b, t, 2 * h)]


@OPS.kernel("bidirectional_gru", "xla")
def bigru_xla(ctx, op, ins):
    x_fw = ins["Input"][0]      # (B, T, 3H) fw input projections
    x_bw = ins["InputRev"][0]   # (B, T, 3H) bw input projections (unflipped)
    w_fw = ins["WeightFw"][0]   # (H, 3H)
    w_bw = ins["WeightBw"][0]
    b_fw = ins.get("BiasFw", [None])[0]
    b_bw = ins.get("BiasBw", [None])[0]
    attrs = op.attrs
    gate_act = attrs.get("gate_activation", "sigmoid")
    cand_act = attrs.get("activation", "tanh")
    b_, t, three_h = x_fw.shape
    h = three_h // 3

    if b_fw is not None:
        x_fw = x_fw + b_fw
    if b_bw is not None:
        x_bw = x_bw + b_bw
    # direction axis: [fw, time-reversed bw]
    xs = jnp.stack([x_fw, jnp.flip(x_bw, axis=1)], axis=0)  # (2, B, T, 3H)
    ws = jnp.stack([w_fw, w_bw], axis=0)                     # (2, H, 3H)

    def one_direction(x_d, w_d):
        w_g = w_d[:, : 2 * h]
        w_c = w_d[:, 2 * h:]

        def step(h_prev, x_t):
            g = x_t[:, : 2 * h] + h_prev @ w_g
            u = apply_activation(g[:, :h], gate_act)
            r = apply_activation(g[:, h:], gate_act)
            c = apply_activation(x_t[:, 2 * h:] + (r * h_prev) @ w_c, cand_act)
            h_new = u * h_prev + (1.0 - u) * c
            return h_new, h_new

        init = jnp.zeros((b_, h), x_d.dtype)
        _, hs = jax.lax.scan(step, init, jnp.swapaxes(x_d, 0, 1))
        return jnp.swapaxes(hs, 0, 1)  # (B, T, H)

    outs = jax.vmap(one_direction)(xs, ws)  # (2, B, T, H)
    fw = outs[0]
    bw = jnp.flip(outs[1], axis=1)
    return {"Hidden": [jnp.concatenate([fw, bw], axis=-1)]}
