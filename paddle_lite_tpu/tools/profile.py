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


def _isotonic_fit(xs: List[float]) -> List[float]:
    """Pool-adjacent-violators: the least-squares *monotone non-decreasing*
    fit of a sequence.  The cumulative-prefix cost curve is physically
    non-decreasing in k, but each point carries independent measurement
    noise; clipping negative consecutive diffs at zero (the old rule)
    rectifies that noise into a positive bias, so per-op sums exceeded the
    whole-model number (r3: MNv3 per-type sum 2.44 ms vs 1.79 ms measured
    whole-model).  Diffs of the PAV fit are non-negative AND telescope
    exactly to the final prefix's cost, so the parts sum to the whole by
    construction."""
    blocks: List[List[float]] = []  # [sum, count]
    for v in xs:
        blocks.append([float(v), 1.0])
        while (len(blocks) > 1
               and blocks[-2][0] * blocks[-1][1]
               > blocks[-1][0] * blocks[-2][1]):
            s, n = blocks.pop()
            blocks[-1][0] += s
            blocks[-1][1] += n
    out: List[float] = []
    for s, n in blocks:
        out.extend([s / n] * int(n))
    return out


def latency_report(graph: Graph, feed: Dict[str, np.ndarray],
                   *, min_window: float = 0.3, reps: int = 3,
                   ks: Optional[List[int]] = None,
                   progress=None) -> List[dict]:
    """Per-op cost via prefix differencing (see module docstring).

    Each prefix is timed with the hardened iteration-delta method (the same
    one ``tools/benchmark.device_throughput`` uses — see BASELINE.md note):
    the prefix runs inside one jitted ``fori_loop`` whose inputs are made
    loop-variant by a runtime-zero bump (so XLA cannot hoist the body), with
    a *dynamic* trip count (one compile per prefix, not per window size),
    auto-scaled until the window delta is ``min_window`` seconds (dwarfing
    the ~28ms async-tunnel RTT jitter), median of ``reps``.

    Per-op ``ms`` comes from differencing the *isotonic fit* of the
    cumulative curve (see :func:`_isotonic_fit`): row sums telescope to the
    final prefix's cost instead of accumulating rectified noise.  ``ms_raw``
    keeps the unfitted consecutive delta for debugging.

    ``ks``: optional list of prefix lengths (1-based, ascending) to measure —
    e.g. block boundaries — when per-op granularity is too slow; each row
    then attributes the cost of ops (ks[i-1], ks[i]].
    """
    import time

    import jax
    import jax.numpy as jnp

    order = graph.topological_order()
    weights = jax.device_put(stage_weights(graph))
    feed = jax.device_put(feed)

    from ..core.executor import ExecutionContext, _resolve_inputs
    from ..core.registry import OPS

    island = (jnp.bfloat16
              if graph.meta.get("island_dtype") == "bfloat16" else None)
    ctx = ExecutionContext(graph=graph, platform=jax.default_backend(),
                           interpret=jax.default_backend() != "tpu",
                           island_dtype=island)

    # last op index (1-based) consuming each var, for liveness at a prefix cut
    last_use = {}
    for idx, op_ in enumerate(order, 1):
        for n in op_.input_names():
            last_use[n] = idx
    graph_outputs = set(graph.outputs)

    def make_prefix(k: int):
        ops_k = order[:k]
        # the loop body must observe the prefix's LIVE frontier: every var
        # produced inside that is still needed after the cut (consumed by a
        # later op, or a graph output). Produced-but-unconsumed-in-prefix is
        # NOT sufficient: a shape-only consumer like prior_box (whose
        # outputs are data-independent constants) marks the backbone tap
        # "consumed", XLA folds the prior_box outputs, and the entire conv
        # chain dead-code-eliminates — the k=24 SSD prefix measured 0.002ms
        # under the old rule.
        produced = [n for op in ops_k for n in op.output_names()]
        frontier = [n for n in produced
                    if n in graph_outputs or last_use.get(n, 0) > k] or \
            order[k - 1].output_names()

        def to_island(a):
            # mirror build_callable's island cast: fp32 values run/store in
            # the island dtype (weights were already staged bf16)
            if island is not None and getattr(a, "dtype", None) == jnp.float32:
                return a.astype(island)
            return a

        def sub(w, f):
            env = dict(w)
            for name in graph.inputs:
                env[name] = to_island(f[name])
            for op in ops_k:
                impl = OPS.get(op.op_type).impl_for(op.attrs.get("kernel"))
                outs = impl(ctx, op, _resolve_inputs(op, env))
                for slot, arrs in outs.items():
                    for n, a in zip(op.outputs.get(slot, []), arrs):
                        env[n] = to_island(a)
            return {n: env[n] for n in frontier}

        return sub

    def make_looped(sub):
        @jax.jit
        def looped(w, f, iters):
            def body(i, carry):
                f_cur, acc = carry
                out = sub(w, f_cur)
                s = sum(jnp.sum(jnp.square(v.astype(jnp.float32)))
                        for v in out.values())
                # runtime-zero data-dependent bump: keeps every input
                # loop-variant so XLA cannot hoist the (loop-invariant)
                # prefix body out of the loop; false at run time
                bump = s > jnp.float32(3e38)
                f_cur = {
                    kk: (v ^ bump if v.dtype == jnp.bool_
                         else v + bump.astype(v.dtype))
                    for kk, v in f_cur.items()
                }
                return f_cur, acc + s

            _, acc = jax.lax.fori_loop(0, iters, body, (f, jnp.float32(0)))
            return acc

        return looped

    ks = list(ks) if ks is not None else list(range(1, len(order) + 1))
    results: List[dict] = []
    prev_cum = 0.0
    prev_k = 0
    est_per_iter = 1e-6  # refined from each measured prefix
    for k in ks:
        looped = make_looped(make_prefix(k))

        def timed(it):
            t0 = time.perf_counter()
            float(jax.device_get(looped(weights, feed, jnp.int32(it))))
            return time.perf_counter() - t0

        timed(1)  # compile (iters is dynamic: one compile per prefix)
        # Size the window from an estimate of this prefix's per-iteration
        # cost instead of growing a global loop count monotonically: a
        # slow-model prefix at a stale large loop makes single device calls
        # of tens of seconds (which once crashed the tunnel worker), while
        # a cheap prefix at a small loop drowns in RTT jitter. Seed with
        # the previous prefix's per-iter time (prefixes only grow), refine
        # with one short probe, then let the while-loop grow it if the
        # estimate was still low.
        probe = max(min(int(0.1 / est_per_iter), 4096), 8)
        d0 = max(timed(1 + probe) - timed(1), 1e-4)
        est_per_iter = max(d0 / probe, 1e-7)
        loop = min(max(int(min_window * 1.3 / est_per_iter) + 1, 8), 1 << 22)
        while True:
            d = float(np.median([timed(1 + loop) - timed(1)
                                 for _ in range(3)]))
            if d >= min_window or loop >= 1 << 22:
                break
            scale = (min_window * 1.3) / max(d, 1e-3)
            loop = min(max(int(loop * scale) + 1, loop * 2), 1 << 22)
        deltas = [timed(1 + loop) - timed(1) for _ in range(reps)]
        good = [x for x in deltas if x > min_window / 4]
        # max(..., 0): under host CPU starvation every delta can come out
        # negative (scheduling noise exceeds the window); per-iteration
        # time is physically non-negative, and a negative cum point would
        # push the isotonic fit's first diff below zero
        dt = max(float(np.median(good or deltas)), 0.0) / loop
        est_per_iter = max(dt, 1e-7)  # seed for the next prefix's window
        row = {
            "op": order[k - 1].op_type,
            "id": order[k - 1].id,
            "k": k,
            "n_ops": k - prev_k,
            "cum_ms": dt * 1e3,
            "ms_raw": (dt - prev_cum) * 1e3,
            "loop": loop,
        }
        results.append(row)
        if progress is not None:
            progress(row)
        prev_cum = dt
        prev_k = k
        # next prefix costs >= this one per iteration; pre-shrink the window
        loop = max(int(min_window * 1.3 / max(dt, 1e-7)), 8)
    # monotone fit of the cumulative curve -> per-op diffs that sum to the
    # final prefix cost (see _isotonic_fit)
    fit = _isotonic_fit([r["cum_ms"] for r in results])
    for i, r in enumerate(results):
        r["cum_ms_fit"] = fit[i]
        r["ms"] = fit[i] - (fit[i - 1] if i else 0.0)
    return results


def per_type_summary(rows: List[dict]) -> List[dict]:
    """Aggregate latency_report rows by op type, descending cost.  Sums are
    over the isotonic-fitted per-op ``ms``, so ``sum(t["ms"])`` equals the
    last row's ``cum_ms_fit`` — the whole-model prefix — by construction."""
    agg: Dict[str, dict] = {}
    for r in rows:
        a = agg.setdefault(r["op"], {"op": r["op"], "ms": 0.0, "rows": 0})
        a["ms"] += r["ms"]
        a["rows"] += 1
    return sorted(agg.values(), key=lambda a: -a["ms"])


def _main() -> None:
    """On-device per-op latency profile of a zoo model.

    python -m paddle_lite_tpu.tools.profile --model mobilenet_v3 --batch 64
    Writes one JSON row per prefix to --out (JSONL, incremental) so long
    profiles can be inspected while running.
    """
    import argparse
    import importlib
    import json
    import os

    import jax

    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])

    p = argparse.ArgumentParser()
    p.add_argument("--model", required=True)
    p.add_argument("--batch", type=int, default=64)
    p.add_argument("--image-size", type=int, default=224)
    p.add_argument("--seq-len", type=int, default=128)
    p.add_argument("--fp32", action="store_true", help="skip quantization")
    p.add_argument("--island-dtype", default="auto",
                   help="'auto' = the zoo's measured recommended config "
                        "(models/zoo_config.py), so the profile attributes "
                        "the configuration users actually serve")
    p.add_argument("--out", default=None)
    p.add_argument("--min-window", type=float, default=0.3)
    args = p.parse_args()

    from .. import QuantConfig
    from .opt import optimize

    from .benchmark import resolve_builder

    builder = resolve_builder(args.model)
    if args.model == "ernie_tiny":
        graph = builder(batch=args.batch, seq_len=args.seq_len)
    else:
        graph = builder(batch=args.batch, image_size=args.image_size)

    rng = np.random.default_rng(0)
    feed = {}
    for name in graph.inputs:
        shape = graph.vars[name].shape
        dt = graph.vars[name].precision.np_dtype
        if np.issubdtype(dt, np.integer):
            feed[name] = rng.integers(0, 100, shape).astype(dt)
        else:
            feed[name] = rng.normal(size=shape).astype(dt)
    if not args.fp32:
        from ..models.zoo_config import recommended_quant

        overrides = ({} if args.island_dtype == "auto"
                     else {"island_dtype": args.island_dtype})
        optimize(graph, quant=recommended_quant(args.model, **overrides),
                 calib_batches=[feed])

    out_path = args.out or f"/tmp/profile_{args.model}.jsonl"
    f = open(out_path, "w")

    def prog(row):
        f.write(json.dumps(row) + "\n")
        f.flush()
        print(f"k={row['k']:>3} {row['op']:<18} ms={row['ms_raw']:.4f} "
              f"cum={row['cum_ms']:.3f}", flush=True)

    rows = latency_report(graph, feed, min_window=args.min_window,
                          progress=prog)
    f.close()
    # rewrite with the isotonic-fitted attribution (the incremental rows
    # above lack it) + a per-type summary whose sum IS the whole model
    with open(out_path, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    total = rows[-1]["cum_ms_fit"] if rows else 0.0
    print(f"-- per-type (sums to the whole-model prefix {total:.3f} ms) --")
    for t in per_type_summary(rows):
        print(f"{t['op']:<20} {t['ms']:8.4f} ms  ({t['rows']} ops)")
    print("wrote", out_path)


if __name__ == "__main__":
    _main()
