"""Profilers — analog of ``lite/core/profile/``.

- :func:`precision_report` ≈ ``precision_profiler.h`` (the key int8
  debugging tool): runs the fp32 graph and the quantized graph on the same
  inputs, captures every intermediate, and reports per-layer mean/std/absmax
  plus the int8-vs-fp32 delta — layer-wise quantization-error hunting.
- :func:`latency_report` ≈ ``profiler.{h,cc}`` (per-instruction timers):
  per-op cost attribution.  One jitted program has no per-instruction
  boundaries, so attribution is measured by *prefix timing*: jit the first k
  ops for increasing k (iteration-delta method, which the async dev tunnel
  requires) and difference consecutive prefixes.  Slower than a hook-based
  profiler but measures the real fused program; for kernel-level traces use
  ``jax.profiler`` / xprof directly.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional

import numpy as np

from ..core.executor import build_callable, stage_weights
from ..core.ir import Graph
from ..core.types import Precision


@dataclasses.dataclass
class LayerDelta:
    var: str
    op_type: str
    precision: str
    mean: float
    std: float
    absmax: float
    rel_err: float  # vs fp32 reference, max-normalized
    cos: float

    def row(self) -> str:
        return (f"{self.var:<32} {self.op_type:<18} {self.precision:<5} "
                f"mean={self.mean:+.4f} std={self.std:.4f} "
                f"absmax={self.absmax:.4f} rel={self.rel_err:.4f} "
                f"cos={self.cos:.5f}")


def _capture_all(graph: Graph, feed) -> Dict[str, np.ndarray]:
    caps: Dict[str, np.ndarray] = {}
    run = build_callable(
        graph, capture=lambda n, v: caps.__setitem__(n, np.asarray(v))
    )
    run(stage_weights(graph), feed)
    return caps


def precision_report(
    fp32_graph: Graph,
    int8_graph: Graph,
    feed: Dict[str, np.ndarray],
    *,
    top: Optional[int] = None,
) -> List[LayerDelta]:
    """Per-layer int8-vs-fp32 deltas; sorted worst-first when `top` given."""
    ref = _capture_all(fp32_graph, feed)
    got = _capture_all(int8_graph, feed)

    by_var_op = {}
    for op in int8_graph.ops:
        for n in op.output_names():
            by_var_op[n] = op.op_type

    out: List[LayerDelta] = []
    for name, val in got.items():
        v = int8_graph.vars.get(name)
        if v is None or v.is_weight:
            continue
        x = val.astype(np.float32)
        if v.precision == Precision.INT8 and v.quant is not None:
            x = x * np.float32(v.quant.scale[0])
        # compare against the fp32 var this one descends from (cast-inserted
        # vars are named <orig>.q8__k)
        ref_name = name.split(".q8__")[0]
        r = ref.get(ref_name)
        if r is None or np.shape(r) != np.shape(x):
            continue
        r = np.asarray(r, np.float32)
        denom = np.abs(r).max() + 1e-9
        rel = float(np.abs(x - r).max() / denom)
        cos = float(
            np.sum(x * r) / (np.linalg.norm(x) * np.linalg.norm(r) + 1e-12)
        )
        out.append(LayerDelta(
            var=name,
            op_type=by_var_op.get(name, "input"),
            precision=v.precision.value,
            mean=float(x.mean()),
            std=float(x.std()),
            absmax=float(np.abs(x).max()),
            rel_err=rel,
            cos=cos,
        ))
    if top:
        out.sort(key=lambda d: d.cos)
        out = out[:top]
    return out


def print_precision_report(fp32_graph, int8_graph, feed, top=None) -> None:
    rows = precision_report(fp32_graph, int8_graph, feed, top=top)
    print(f"{'var':<32} {'op':<18} prec  stats")
    for r in rows:
        print(r.row())


def latency_report(graph: Graph, feed: Dict[str, np.ndarray],
                   *, iters: int = 8) -> List[dict]:
    """Per-op cost via prefix differencing (see module docstring)."""
    import copy
    import functools
    import time

    import jax
    import jax.numpy as jnp

    order = graph.topological_order()
    weights = jax.device_put(stage_weights(graph))
    feed = jax.device_put(feed)

    from ..core.executor import ExecutionContext, _resolve_inputs
    from ..core.registry import OPS

    ctx = ExecutionContext(graph=graph, platform=jax.default_backend(),
                           interpret=jax.default_backend() != "tpu")

    def make_prefix(k: int):
        ops_k = order[:k]
        last_outs = order[k - 1].output_names()

        def sub(w, f):
            env = dict(w)
            for name in graph.inputs:
                env[name] = f[name]
            for op in ops_k:
                impl = OPS.get(op.op_type).impl_for(op.attrs.get("kernel"))
                outs = impl(ctx, op, _resolve_inputs(op, env))
                for slot, arrs in outs.items():
                    for n, a in zip(op.outputs.get(slot, []), arrs):
                        env[n] = a
            return {n: env[n] for n in last_outs}

        return sub

    results = []
    prev = 0.0
    for k in range(1, len(order) + 1):
        sub = make_prefix(k)

        @functools.partial(jax.jit, static_argnames=("it",))
        def looped(w, f, it, sub=sub):
            def body(i, acc):
                out = sub(w, f)
                return acc + sum(
                    jnp.sum(jnp.abs(v.astype(jnp.float32)))
                    for v in out.values()) * 1e-12

            return jax.lax.fori_loop(0, it, body, jnp.float32(0))

        def timed(it):
            t0 = time.perf_counter()
            float(jax.device_get(looped(weights, feed, it)))
            return time.perf_counter() - t0

        timed(1)
        timed(iters)
        dt = max(timed(iters) - timed(1), 0.0) / (iters - 1)
        results.append({
            "op": order[k - 1].op_type,
            "id": order[k - 1].id,
            "cum_ms": dt * 1e3,
            "ms": max(dt - prev, 0.0) * 1e3,
        })
        prev = dt
    return results
