"""Executor — traces an optimized Graph into ONE jittable JAX function.

Re-design of ``lite/core/program.{h,cc}`` (``RuntimeProgram::Run``'s
per-``Instruction`` interpreter loop).  On TPU the idiomatic equivalent of
"loop over instructions, launch kernels" is to *trace the whole graph once*
into a single function and hand it to ``jax.jit``: XLA then owns kernel
fusion, scheduling, and buffer reuse (subsuming the reference's
``memory_optimize_pass`` and per-backend sync logic).  The per-op Python loop
below runs only at trace time, not per inference.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, List, Optional

import jax
import numpy as np

from .ir import Graph, OpNode
from .registry import OPS


@dataclasses.dataclass
class ExecutionContext:
    """Per-trace context handed to every op impl.

    The reference's ``KernelContext``/``ARMContext`` carried thread counts and
    scratch workspaces (lite/core/context.h); the TPU analog carries platform
    identity (drives pallas-vs-interpret), the autotune table for Pallas block
    shapes (the "power mode" analog), and the graph for quant metadata lookup.
    """

    graph: Graph
    platform: str = "tpu"  # jax.default_backend() at trace time
    interpret: bool = False  # force Pallas interpreter mode (CPU tests)
    autotune: Optional[Dict[str, Any]] = None
    # dtype for non-int8 float regions (graph.meta["island_dtype"]): bf16
    # halves fp-island HBM traffic; matmul/conv accumulation and the
    # quantize/LN/softmax internals stay fp32 regardless
    island_dtype: Optional[Any] = None
    # multi-device serving (ShardedPredictor): the mesh + axis names the
    # "tp_pallas" kernel impls shard_map over; None = single-device trace
    mesh: Optional[Any] = None
    tp_axis: str = "model"
    dp_axis: Optional[str] = "data"

    def var_quant(self, name: str):
        return self.graph.vars[name].quant

    def var_shape(self, name: str):
        return self.graph.vars[name].shape

    def var_precision(self, name: str):
        return self.graph.vars[name].precision


def _resolve_inputs(op: OpNode, env: Dict[str, Any]) -> Dict[str, List[Any]]:
    return {
        slot: [env[n] for n in names]
        for slot, names in op.inputs.items()
        if names
    }


def build_callable(
    graph: Graph,
    *,
    platform: Optional[str] = None,
    interpret: Optional[bool] = None,
    capture: Optional[Callable[[str, Any], None]] = None,
    mesh: Optional[Any] = None,
) -> Callable[[Dict[str, Any], Dict[str, Any]], Dict[str, Any]]:
    """Return ``fn(weights, inputs) -> outputs`` ready for ``jax.jit``.

    ``weights``/``inputs``/``outputs`` are name-keyed dicts of arrays.
    ``capture`` (if given) is called with every intermediate (name, value) at
    trace time — the hook used by the calibration runner and the per-layer
    precision profiler (``lite/core/profile/precision_profiler.h`` analog).
    """
    import jax.numpy as jnp

    order = graph.topological_order()
    plat = platform or jax.default_backend()
    interp = (plat != "tpu") if interpret is None else interpret
    island = jnp.bfloat16 if graph.meta.get("island_dtype") == "bfloat16" else None
    ctx = ExecutionContext(graph=graph, platform=plat, interpret=interp,
                           island_dtype=island, mesh=mesh)

    def to_island(a):
        # cast fp32 values to the island dtype; XLA fuses the cast into the
        # producing kernel, so the HBM write itself becomes 2-byte
        if island is not None and getattr(a, "dtype", None) == jnp.float32:
            return a.astype(island)
        return a

    def run(weights: Dict[str, Any], inputs: Dict[str, Any]) -> Dict[str, Any]:
        env: Dict[str, Any] = {}
        env.update(weights)
        for name in graph.inputs:
            env[name] = to_island(jnp.asarray(inputs[name])) \
                if island is not None else inputs[name]
            if capture is not None:
                capture(name, env[name])
        for op in order:
            impl = OPS.get(op.op_type).impl_for(op.attrs.get("kernel"))
            outs = impl(ctx, op, _resolve_inputs(op, env))
            for slot, arrs in outs.items():
                for n, a in zip(op.outputs.get(slot, []), arrs):
                    env[n] = to_island(a)
                    if capture is not None:
                        capture(n, env[n])
        out = {n: env[n] for n in graph.outputs}
        if island is not None:  # public contract stays fp32
            out = {n: (v.astype(jnp.float32) if v.dtype == island else v)
                   for n, v in out.items()}
        return out

    return run


def stage_weights(graph: Graph) -> Dict[str, Any]:
    """Weights as a jit-ready pytree (host numpy; jit stages to device).

    With island_dtype set, fp32 weights are stored bf16 (int8 weights and
    the fp32 quant scales are untouched) — halves weight HBM footprint for
    the fp regions and keeps conv/matmul operand dtypes consistent."""
    if graph.meta.get("island_dtype") == "bfloat16":
        import jax.numpy as jnp

        return {
            k: (np.asarray(v).astype(jnp.bfloat16)
                if np.asarray(v).dtype == np.float32 else np.asarray(v))
            for k, v in graph.weights.items()
        }
    return {k: np.asarray(v) for k, v in graph.weights.items()}


def compile_graph(
    graph: Graph,
    *,
    donate_inputs: bool = False,
    platform: Optional[str] = None,
):
    """``jax.jit`` the traced graph. Returns (jitted_fn, weights).

    This is the ``GenRuntimeProgram`` + first-``Run`` analog; AOT
    serialization of the compiled executable (the ``.nb`` analog) lives in
    ``paddle_lite_tpu.formats.artifact``.
    """
    fn = build_callable(graph, platform=platform)
    weights = stage_weights(graph)
    jitted = jax.jit(fn)
    return jitted, weights
