"""Control-flow / subgraph ops — analog of ``lite/operators/while_op.cc``,
``conditional_block_op.cc`` and the pass-inserted ``subgraph`` op
(``lite/kernels/npu/subgraph_compute`` pattern).

TPU-native semantics:

- ``subgraph``: attrs carry a nested :class:`Graph` (``"graph"``); the impl
  traces it inline — it fuses into the enclosing jit exactly like the rest
  of the model (the reference handed the region to a vendor compiler; XLA
  *is* our vendor compiler, so the op is an organizational boundary, not an
  execution one).  Input slot "Inputs" maps positionally onto the
  sub-graph's declared inputs, outputs likewise.
- ``while``: attrs carry a body ``Graph`` (``"block"``).  Runs under
  ``lax.while_loop`` with a fixed state signature: state var i enters the
  block as ``block.inputs[i]`` and is replaced by ``block.outputs[i]``
  (positional, same shapes/dtypes — the jit-compatible subset of the
  reference's dynamic while; a ``"max_iters"`` attr bounds the trip
  count).  The condition is the state var at index ``"cond_index"``
  (default 0 — a scalar-ish bool the block re-computes each iteration).
- ``conditional_block``: attrs carry ``"block"``; executes it when the
  scalar bool input "Cond" is true, else passes inputs through unchanged
  (shape contract: block outputs match its inputs) — ``lax.cond`` form.
"""

from __future__ import annotations

from typing import Dict, List

import jax
import jax.numpy as jnp

from ..core.registry import OPS


def _run_nested(ctx, nested_graph, env: Dict[str, jax.Array]) -> Dict[str, jax.Array]:
    """Trace a nested Graph with `env` providing its inputs + weights."""
    from ..core.executor import build_callable

    run = build_callable(nested_graph, platform=ctx.platform,
                         interpret=ctx.interpret)
    weights = {k: jnp.asarray(v) for k, v in nested_graph.weights.items()}
    inputs = {k: env[k] for k in nested_graph.inputs}
    return run(weights, inputs)


@OPS.shape_fn("subgraph")
def subgraph_shape(attrs, in_shapes):
    g = attrs["graph"]
    return [g.vars[n].shape for n in g.outputs]


@OPS.kernel("subgraph", "xla")
def subgraph_xla(ctx, op, ins):
    g = op.attrs["graph"]
    xs = ins.get("Inputs", [])
    env = dict(zip(g.inputs, xs))
    out = _run_nested(ctx, g, env)
    return {"Outputs": [out[n] for n in g.outputs]}


@OPS.shape_fn("while")
def while_shape(attrs, in_shapes):
    return list(in_shapes)  # state-in == state-out


@OPS.kernel("while", "xla")
def while_xla(ctx, op, ins):
    block = op.attrs["block"]
    cond_index = int(op.attrs.get("cond_index", 0))
    max_iters = int(op.attrs.get("max_iters", 1000))
    state_names = list(block.inputs)
    if len(block.outputs) != len(state_names):
        raise ValueError("while block must output one var per state input")
    xs = [jnp.asarray(x) for x in ins["X"]]
    state = (jnp.asarray(0, jnp.int32), tuple(xs))

    def cond(s):
        i, vals = s
        return jnp.logical_and(
            vals[cond_index].reshape(-1)[0].astype(jnp.bool_),
            i < max_iters,
        )

    def body(s):
        i, vals = s
        env = dict(zip(state_names, vals))
        out = _run_nested(ctx, block, env)
        new_vals = tuple(
            out[block.outputs[j]].astype(vals[j].dtype)
            for j in range(len(vals))
        )
        return (i + 1, new_vals)

    _, final = jax.lax.while_loop(cond, body, state)
    return {"Out": list(final)}


@OPS.shape_fn("conditional_block")
def conditional_block_shape(attrs, in_shapes):
    return list(in_shapes[1:])  # [cond, *state] -> state


@OPS.kernel("conditional_block", "xla")
def conditional_block_xla(ctx, op, ins):
    block = op.attrs["block"]
    cond = ins["Cond"][0].reshape(()).astype(jnp.bool_)
    xs = ins["Input"]
    state = dict(zip(block.inputs, xs))

    def true_fn(s):
        out = _run_nested(ctx, block, s)
        return tuple(out[n] for n in block.outputs)

    def false_fn(s):
        return tuple(s[n] for n in block.inputs)

    outs = jax.lax.cond(cond, true_fn, false_fn, state)
    return {"Out": list(outs)}


# ---------------------------------------------------------------------------
# split_lod_tensor / merge_lod_tensor — the reference's conditional-branch
# plumbing (lite/operators/{split,merge}_lod_tensor_op.cc): a row mask routes
# each batch row into a true- or false-branch tensor and merges results back.
# TPU-native dense semantics: both branches keep the full static row count
# (non-member rows zeroed on split) and merge is a row-wise select — the
# jit-compatible formulation; compute both branches, select per row.
# ---------------------------------------------------------------------------

def _row_mask(mask, like):
    m = mask.reshape(mask.shape[0], *([1] * (like.ndim - 1)))
    return m.astype(jnp.bool_)


@OPS.shape_fn("split_lod_tensor")
def split_lod_tensor_shape(attrs, in_shapes):
    return [in_shapes[0], in_shapes[0]]


@OPS.kernel("split_lod_tensor", "xla")
def split_lod_tensor_xla(ctx, op, ins):
    x = ins["X"][0]
    m = _row_mask(ins["Mask"][0], x)
    zero = jnp.zeros((), x.dtype)
    return {"OutTrue": [jnp.where(m, x, zero)],
            "OutFalse": [jnp.where(m, zero, x)]}


@OPS.shape_fn("merge_lod_tensor")
def merge_lod_tensor_shape(attrs, in_shapes):
    return [in_shapes[1]]  # [Mask, InTrue, InFalse]


@OPS.kernel("merge_lod_tensor", "xla")
def merge_lod_tensor_xla(ctx, op, ins):
    t = ins["InTrue"][0]
    f = ins["InFalse"][0]
    m = _row_mask(ins["Mask"][0], t)
    return {"Out": [jnp.where(m, t, f)]}
