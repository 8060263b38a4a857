"""Scaling-efficiency benchmark — BASELINE's ≥85% images/s efficiency from
1 chip to N (net-new vs the single-device reference).

Method: compile the int8 model under a DP(×TP) mesh of n devices with the
per-device batch held constant (weak scaling — the serving configuration),
measure images/s with the iteration-delta method, and report
``efficiency(n) = ips(n) / (n * ips(1))``.

On the 1-chip dev environment this runs on the virtual CPU mesh
(``jax.config.update("jax_num_cpu_devices", N)``), which validates the
sharding + collective program and gives a *proxy* efficiency (host CPU
"chips" share memory bandwidth, so absolute numbers are pessimistic); on a
real pod slice the same harness measures ICI-backed scaling.
"""

from __future__ import annotations

import functools
import json
import time
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..core.executor import build_callable, stage_weights
from ..parallel.sharding import MeshConfig, shard_inputs, shard_weights


def _throughput(graph, mesh_cfg: MeshConfig, batch: int, feed_base,
                loop: int = 8) -> float:
    mesh = mesh_cfg.build()
    fn = build_callable(graph)
    weights = shard_weights(graph, stage_weights(graph), mesh)
    feed = shard_inputs(graph, feed_base, mesh)
    out_name = graph.outputs[0]
    in_name = graph.inputs[0]

    @functools.partial(jax.jit, static_argnames=("iters",))
    def looped(w, f, iters):
        def body(i, carry):
            img, acc = carry
            out = fn(w, {in_name: img})[out_name]
            s = jnp.sum(out.astype(jnp.float32))
            return img + s * 1e-12, acc + s

        (_, acc) = jax.lax.fori_loop(
            0, iters, body, (f[in_name], jnp.float32(0)))
        return acc

    def timed(it):
        t0 = time.perf_counter()
        float(jax.device_get(looped(weights, feed, it)))
        return time.perf_counter() - t0

    timed(1)
    timed(1 + loop)
    dt = max(timed(1 + loop) - timed(1), 1e-9)
    return batch * loop / dt


def run_scaling(model_builder, *, per_device_batch: int = 16,
                image_size: int = 64, device_counts=(1, 2, 4, 8),
                tp: int = 1, quantize: bool = True) -> List[dict]:
    """Weak-scaling sweep. `model_builder(batch, image_size)` must return an
    UNOPTIMIZED graph; it is re-built per n (static shapes)."""
    from .. import QuantConfig
    from ..tools.opt import optimize

    results = []
    base_ips: Optional[float] = None
    rng = np.random.default_rng(0)
    for n in device_counts:
        if n > len(jax.devices()):
            break
        if n < tp or n % tp:
            continue  # mesh must factor as dp x tp
        dp = n // tp
        batch = per_device_batch * dp
        g = model_builder(batch=batch, image_size=image_size)
        feed = {g.inputs[0]: rng.normal(
            size=g.vars[g.inputs[0]].shape).astype(np.float32)}
        if quantize:
            optimize(g, quant=QuantConfig(), calib_batches=[feed])
            for op in g.ops:  # GSPMD path: XLA kernels (see ShardedPredictor)
                if op.attrs.get("kernel") == "pallas":
                    op.attrs["kernel"] = "xla"
        else:
            optimize(g)
        ips = _throughput(g, MeshConfig(data=dp, model=tp), batch, feed)
        if base_ips is None:
            base_ips = ips / n  # per-device at n = device_counts[0]
        eff = ips / (n * base_ips)
        row = {"devices": n, "dp": dp, "tp": tp, "batch": batch,
               "images_per_sec": round(ips, 1),
               "efficiency": round(eff, 3)}
        print(json.dumps(row), flush=True)  # incremental: long CPU runs
        results.append(row)
    return results


def main() -> None:
    import argparse
    import importlib
    import json

    p = argparse.ArgumentParser()
    p.add_argument("--model", default="mobilenet_v1")
    p.add_argument("--per-device-batch", type=int, default=16)
    p.add_argument("--image-size", type=int, default=64)
    p.add_argument("--tp", type=int, default=1)
    p.add_argument("--cpu-devices", type=int, default=0,
                   help="force an N-device virtual CPU mesh (testing)")
    args = p.parse_args()
    if args.cpu_devices:
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_num_cpu_devices", args.cpu_devices)
    mod = importlib.import_module(f"paddle_lite_tpu.models.{args.model}")
    res = run_scaling(mod.build, per_device_batch=args.per_device_batch,
                      image_size=args.image_size, tp=args.tp)
    print(json.dumps(res))


if __name__ == "__main__":
    main()
