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


# No pallas kernel for bidirectional_gru: the VMEM-resident Pallas scan
# (ops/kernels/gru_scan.py, r2-r4) was DELETED in r5 after two rounds of
# measurement found no config where it ships a win — the r4 shape sweep
# (docs/bigru_sweep_r4.json) left exactly one standalone win region
# (T=400, b16, hidden 64), and the r5 in-model A/B on that very config
# (crnn_long, docs/crnn_long_r5.json) measured pallas 8,476 vs xla 8,489
# items/s — the standalone edge disappears inside the whole jitted model
# (the same standalone-vs-in-model lesson as depthwise and fused dw+pw).
# The XLA scan above is the shipped recurrence everywhere.


# ---------------------------------------------------------------------------
# gru_unit — one GRU step (the op the reference's while-based decoders chain;
# analog of lite/operators/gru_unit_op.cc). Same gate layout as `gru`.
# ---------------------------------------------------------------------------

@OPS.shape_fn("gru_unit")
def gru_unit_shape(attrs, in_shapes):
    b, three_h = in_shapes[0]
    h = three_h // 3
    return [(b, h), (b, h), (b, 2 * h)]


@OPS.kernel("gru_unit", "xla")
def gru_unit_xla(ctx, op, ins):
    x = ins["Input"][0]          # (B, 3H) x_t @ W_ih
    h_prev = ins["HiddenPrev"][0]  # (B, H)
    w = ins["Weight"][0]         # (H, 3H)
    bias = ins.get("Bias", [None])[0]
    attrs = op.attrs
    gate_act = attrs.get("gate_activation", "sigmoid")
    cand_act = attrs.get("activation", "tanh")
    h = h_prev.shape[-1]
    if bias is not None:
        x = x + bias
    g = x[:, : 2 * h] + h_prev @ w[:, : 2 * h]
    u = apply_activation(g[:, :h], gate_act)
    r = apply_activation(g[:, h:], gate_act)
    rh = r * h_prev
    c = apply_activation(x[:, 2 * h:] + rh @ w[:, 2 * h:], cand_act)
    h_new = u * h_prev + (1.0 - u) * c
    gates = jnp.concatenate([u, r], axis=-1)
    return {"Hidden": [h_new], "ResetHiddenPrev": [rh], "Gate": [gates]}


# ---------------------------------------------------------------------------
# sequence_expand / sequence_concat — dense analogs of the LoD ops (the
# raggedness itself is a non-goal, SURVEY §5.7: batches are dense+bucketed).
# ---------------------------------------------------------------------------

@OPS.shape_fn("sequence_expand")
def sequence_expand_shape(attrs, in_shapes):
    # X (B, 1, D) or (B, D) broadcast along the ref tensor's time axis
    x, y = in_shapes
    d = x[-1]
    return [(x[0], y[1], d)]


@OPS.kernel("sequence_expand", "xla")
def sequence_expand_xla(ctx, op, ins):
    """Dense semantics: each batch row of X is repeated along Y's time axis
    (the uniform-LoD case of the reference op; per-row ragged repeat counts
    are absorbed by the bucketed batcher)."""
    x = ins["X"][0]
    y = ins["Y"][0]
    t = y.shape[1]
    if x.ndim == 2:
        x = x[:, None, :]
    return {"Out": [jnp.broadcast_to(x, (x.shape[0], t, x.shape[-1]))]}


@OPS.shape_fn("sequence_concat")
def sequence_concat_shape(attrs, in_shapes):
    t = sum(s[1] for s in in_shapes)
    b, _, d = in_shapes[0]
    return [(b, t, d)]


@OPS.kernel("sequence_concat", "xla")
def sequence_concat_xla(ctx, op, ins):
    return {"Out": [jnp.concatenate(ins["X"], axis=1)]}


# ---------------------------------------------------------------------------
# beam_search — one decoder step (analog of lite/operators/beam_search_op.cc,
# used inside the reference's while-op decoders). Dense fixed-shape design:
# scores (B, beam, V) -> top-beam continuations per batch element, with
# finished beams (pre_ids == end_id) frozen by masking their expansion to a
# single end_id continuation. All shapes static; jit/vmap friendly.
# ---------------------------------------------------------------------------

@OPS.shape_fn("beam_search")
def beam_search_shape(attrs, in_shapes):
    b, beam, v = in_shapes[2]
    return [(b, beam), (b, beam), (b, beam)]


@OPS.kernel("beam_search", "xla")
def beam_search_xla(ctx, op, ins):
    pre_ids = ins["pre_ids"][0]        # (B, beam) int32
    pre_scores = ins["pre_scores"][0]  # (B, beam) accumulated log-probs
    probs = ins["scores"][0]           # (B, beam, V) next-token probabilities
    attrs = op.attrs
    end_id = int(attrs.get("end_id", 0))
    beam = probs.shape[1]
    v = probs.shape[-1]

    logp = jnp.log(jnp.maximum(probs, 1e-20))
    finished = pre_ids == end_id       # (B, beam)
    # finished beams contribute exactly one continuation: end_id, score kept
    keep_mask = jax.nn.one_hot(end_id, v, dtype=logp.dtype)  # (V,)
    cand = jnp.where(
        finished[..., None],
        jnp.where(keep_mask > 0, 0.0, -jnp.inf),
        logp,
    ) + pre_scores[..., None]          # (B, beam, V)

    flat = cand.reshape(cand.shape[0], beam * v)
    top_s, idx = jax.lax.top_k(flat, beam)       # (B, beam)
    parent = (idx // v).astype(jnp.int32)
    token = (idx % v).astype(jnp.int32)
    return {"selected_ids": [token], "selected_scores": [top_s],
            "parent_idx": [parent]}
