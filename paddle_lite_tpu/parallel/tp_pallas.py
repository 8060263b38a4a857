"""Tensor-parallel int8 GEMM under shard_map — Pallas per shard, XLA
collectives between shards (the BASELINE's "shard_map'd Pallas int8 GEMM
with psum/reduce-scatter epilogues").

Two classic TP layouts (Megatron naming), composable back-to-back so the
collective only happens once per pair:

- **column parallel** (shard N): each device holds W[:, n_shard] and
  computes its output-feature slice with the full fused epilogue (bias/act/
  requant are per-output-feature → fully local).  No collective; output
  stays feature-sharded (feeds a row-parallel consumer).
- **row parallel** (shard K): each device holds W[k_shard, :] and x's
  feature shard, computes a partial int32 product, and the partial sums are
  combined with ``psum`` (replicated output) or ``psum_scatter``
  (batch-sharded output).  The epilogue must run AFTER the sum, so the
  per-shard kernel emits raw int32 and the epilogue applies post-collective
  — exactly the reduce-then-requant ordering the reference's epilogue-fused
  GEMM would need if it were distributed.

The collectives ride whatever interconnect the mesh axis maps to (ICI
intra-host — see parallel/distributed.global_mesh).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops.common import apply_activation
from ..ops.kernels.int8_matmul import int8_matmul


def _epilogue(acc_f32_or_i32, eff, bias, act, act_attrs, out_scale):
    y = acc_f32_or_i32.astype(jnp.float32) * eff
    if bias is not None:
        y = y + bias
    y = apply_activation(y, act, act_attrs)
    if out_scale is not None:
        return jnp.clip(jnp.round(y / out_scale), -127, 127).astype(jnp.int8)
    return y


def column_parallel_int8_matmul(
    mesh: Mesh,
    x,  # (M, K) int8, replicated over the model axis
    w,  # (K, N) int8 — will be sharded over N
    eff_scale,  # (N,) f32
    bias=None,
    *,
    axis: str = "model",
    data_axis: Optional[str] = None,
    act: Optional[str] = None,
    act_attrs=None,
    out_scale: Optional[float] = None,
    interpret: bool = False,
):
    """Returns the (M, N) result, feature-sharded over `axis` (and
    batch-sharded over `data_axis` when given — the DP×TP serving layout:
    each device runs the Pallas kernel on its own batch × feature tile,
    with no collective at all for the column layout)."""
    n_parts = mesh.shape[axis]
    n = w.shape[1]
    if n % n_parts:
        raise ValueError(f"N={n} not divisible by {axis}={n_parts}")

    def shard_fn(xs, ws, effs, biass):
        return int8_matmul(xs, ws, effs, biass, act=act, act_attrs=act_attrs,
                           out_scale=out_scale, interpret=interpret)

    fn = jax.shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(P(data_axis, None), P(None, axis), P(axis), P(axis)),
        out_specs=P(data_axis, axis),
        check_vma=False,
    )
    b = jnp.zeros((n,), jnp.float32) if bias is None else jnp.asarray(bias)
    return fn(x, w, jnp.asarray(eff_scale, jnp.float32), b)


def row_parallel_int8_matmul(
    mesh: Mesh,
    x,  # (M, K) int8, feature-sharded over `axis` (K split)
    w,  # (K, N) int8 — sharded over K
    eff_scale,  # (N,) f32
    bias=None,
    *,
    axis: str = "model",
    data_axis: Optional[str] = None,
    act: Optional[str] = None,
    act_attrs=None,
    out_scale: Optional[float] = None,
    scatter_batch: bool = False,
    interpret: bool = False,
):
    """Partial products per shard + psum (or psum_scatter over M when
    ``scatter_batch``); fused epilogue applied after the reduction."""
    k = w.shape[0]
    n_parts = mesh.shape[axis]
    if k % n_parts:
        raise ValueError(f"K={k} not divisible by {axis}={n_parts}")

    eff = jnp.asarray(eff_scale, jnp.float32)
    b = None if bias is None else jnp.asarray(bias, jnp.float32)

    def shard_fn(xs, ws):
        # raw int32 partials: epilogue must wait for the cross-shard sum
        partial = int8_matmul(
            xs, ws, jnp.ones((ws.shape[1],), jnp.float32), None,
            interpret=interpret,
        )  # f32 == exact int32 accumulate (values < 2^24 per shard-K block)
        if scatter_batch:
            total = jax.lax.psum_scatter(partial, axis, scatter_dimension=0,
                                         tiled=True)
        else:
            total = jax.lax.psum(partial, axis)
        return _epilogue(total, eff, b, act, act_attrs, out_scale)

    if scatter_batch:
        out_spec = P(axis, None) if data_axis is None \
            else P((data_axis, axis), None)
    else:
        out_spec = P(data_axis, None)
    fn = jax.shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(P(data_axis, axis), P(axis, None)),
        out_specs=out_spec,
        check_vma=False,
    )
    return fn(x, w)
