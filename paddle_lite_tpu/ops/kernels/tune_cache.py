"""On-device autotune measurement cache.

The reference hard-coded per-SoC tuning tables in ``lite/core/device_info.cc``
(cache sizes → ARM block shapes); the TPU-native equivalent is measured:
:func:`measure_gemm` times the Pallas int8 GEMM against the XLA lowering for
a given (m, k, n) on the attached chip (iteration-delta method — the async
backend makes naive timing meaningless, see bench.py) and persists the
winner, keyed by shape bucket, in a JSON cache.  ``kernel_pick`` consults
:func:`lookup_gemm`; unmeasured shapes default to XLA.

Run ``python -m paddle_lite_tpu.tools.cli tune --model <m> --validate`` to
populate the cache for a model's shapes ahead of deployment (the opt-tool
analog of a tuning pass).

Standalone wins are NOT trusted as-is: a Pallas call is a fusion barrier XLA
cannot see through, so a kernel that wins per-op can lose in-model (measured:
the MobileNetV1 first pointwise conv bucket won standalone by 15% and cost
the whole model 40% — BENCH_r02).  :func:`validate_in_model` A/Bs every
Pallas table pick inside the WHOLE jitted model and demotes entries that do
not win end-to-end — the analog of the reference validating its per-SoC
tables against whole-model benchmarks before shipping
(lite/core/mir/static_kernel_pick_pass.cc picks the fastest kernel in the
real program, not in isolation).
"""

from __future__ import annotations

import functools
import json
import os
import time
from pathlib import Path
from typing import Dict, Optional, Tuple

_CACHE_ENV = "PLT_TPU_AUTOTUNE_CACHE"
_DEFAULT_CACHE = Path(__file__).resolve().parents[3] / ".autotune" / "gemm.json"


def _cache_path() -> Path:
    return Path(os.environ.get(_CACHE_ENV, str(_DEFAULT_CACHE)))


def _bucket(x: int) -> int:
    """Round to a coarse power-of-two-ish bucket so one measurement covers
    neighboring shapes."""
    if x <= 0:
        return 0
    b = 1
    while b * 2 <= x:
        b *= 2
    # two buckets per octave
    return b if x < b * 1.5 else int(b * 1.5)


def _key(m: int, k: int, n: int) -> str:
    return f"{_bucket(m)}x{_bucket(k)}x{_bucket(n)}"


@functools.lru_cache(maxsize=1)
def _load() -> Dict[str, str]:
    p = _cache_path()
    if p.exists():
        try:
            return json.loads(p.read_text())
        except (json.JSONDecodeError, OSError):
            return {}
    return {}


def lookup_gemm(m: int, k: int, n: int) -> Optional[str]:
    return _load().get(_key(m, k, n))


def lookup_blocks(m: int, k: int, n: int) -> Optional[Tuple[int, int, int]]:
    """Measured (bm, bk, bn) override for this bucket (sweep_gemm_blocks),
    or None to use the static heuristic (autotune.gemm_blocks)."""
    v = _load().get("blocks:" + _key(m, k, n))
    if not v:
        return None
    bm, bk, bn = (int(s) for s in v.split("x"))
    return (bm, bk, bn)


def _block_candidates(m: int, k: int, n: int):
    """Candidate (bm, bk, bn) tiles: VMEM-feasible, MXU-aligned, biased
    toward operand residency (whole-N / whole-K blocks minimize HBM
    re-streaming — at (3072, 512, 1024)-class shapes the fixed 512^3
    preference re-fetches X per N-tile and loses to XLA on pure DMA)."""
    def clamp_opts(dim, opts, mult):
        out = []
        for o in opts:
            o = min(o, dim)
            o = max(mult, (o // mult) * mult) if dim > mult else mult
            # pad-up cost: skip tiles more than 2x the dim
            if o <= 2 * dim and o not in out:
                out.append(o)
        return out

    cands = set()
    for bm in clamp_opts(m, (256, 512, 1024, 2048), 32):
        for bk in clamp_opts(k, (512, 1024, 2048), 128):
            for bn in clamp_opts(n, (256, 512, 1024, 2048), 128):
                # double-buffered operands + i32 acc + out tile, in bytes
                vmem = 2 * (bm * bk + bk * bn) + 4 * bm * bn + bm * bn
                if vmem <= 12 * 1024 * 1024:
                    cands.add((bm, bk, bn))
    return sorted(cands)


def sweep_gemm_blocks(m: int, k: int, n: int, *, verbose: bool = False,
                      persist: bool = True) -> Tuple[Tuple[int, int, int], float]:
    """Measure every candidate block tiling for this GEMM on-chip and cache
    the winner (the per-shape analog of the reference's per-SoC block-size
    tables in device_info.cc).  Returns (blocks, seconds_per_call)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from .int8_matmul import int8_matmul

    rng = np.random.default_rng(0)
    x = jax.device_put(rng.integers(-127, 128, (m, k), dtype=np.int8))
    w = jax.device_put(rng.integers(-127, 128, (k, n), dtype=np.int8))
    eff = jnp.asarray(rng.uniform(1e-3, 2e-3, (n,)).astype(np.float32))
    bias = jnp.asarray(rng.normal(size=(n,)).astype(np.float32))
    interp = jax.default_backend() != "tpu"

    best = None
    best_t = float("inf")
    for blocks in _block_candidates(m, k, n):
        def one(xc, blocks=blocks):
            return int8_matmul(xc, w, eff, bias, act="relu", out_scale=0.05,
                               interpret=interp, blocks=blocks)

        try:
            t = _time_one(one, x)
        except Exception as e:  # Mosaic rejects some tilings; skip them
            if verbose:
                print(f"  blocks {blocks}: failed ({type(e).__name__})",
                      flush=True)
            continue
        if verbose:
            f = 2 * m * k * n
            print(f"  blocks {blocks}: {t*1e6:.1f}us "
                  f"({f/t/1e12:.1f}T)", flush=True)
        if t < best_t:
            best, best_t = blocks, t
    if best is not None and persist:
        _store({"blocks:" + _key(m, k, n): "x".join(str(b) for b in best)})
    return best, best_t


def _store(entries: Dict[str, str]) -> None:
    p = _cache_path()
    p.parent.mkdir(parents=True, exist_ok=True)
    table = dict(_load())
    table.update(entries)
    p.write_text(json.dumps(table, indent=1, sort_keys=True))
    _load.cache_clear()


def _time_one(one, x, min_window: float = 0.25, n_iters: int = 16) -> float:
    """Hardened per-iter on-device time of ``one(x)`` for a 2-D int8 operand:
    dynamic trip count (one compile), window auto-scaled to >= min_window s,
    median-of-3 deltas — small shapes at ~3us/iter need thousands of
    iterations to dwarf the ~28ms tunnel-RTT jitter."""
    import time as _time

    import jax
    import jax.numpy as jnp
    import numpy as _np

    @jax.jit
    def looped(xc, it):
        def body(i, carry):
            out = one(carry)
            return carry.at[0, 0].set(
                jnp.bitwise_xor(carry[0, 0], out[0, 0].astype(carry.dtype)))

        final = jax.lax.fori_loop(0, it, body, xc)
        return jnp.sum(final[0, :1].astype(jnp.int32))

    def t(it):
        t0 = _time.perf_counter()
        float(jax.device_get(looped(x, jnp.int32(it))))
        return _time.perf_counter() - t0

    t(1)
    loop = max(n_iters, 16)
    while True:
        d = float(_np.median([t(1 + loop) - t(1) for _ in range(3)]))
        if d >= min_window or loop >= 1 << 22:
            break
        loop = min(max(int(loop * min_window * 1.3 / max(d, 1e-4)) + 1,
                       loop * 2), 1 << 22)
    deltas = [t(1 + loop) - t(1) for _ in range(3)]
    good = [v for v in deltas if v > min_window / 4] or deltas
    return float(_np.median(good)) / loop


def measure_gemm(m: int, k: int, n: int, *, iters: int = 16,
                 verbose: bool = False) -> str:
    """Time pallas vs xla for this problem on the current default device and
    cache the winner. Returns 'pallas' or 'xla'."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from .int8_matmul import int8_matmul

    rng = np.random.default_rng(0)
    x = jax.device_put(rng.integers(-127, 128, (m, k), dtype=np.int8))
    w = jax.device_put(rng.integers(-127, 128, (k, n), dtype=np.int8))
    eff = jnp.asarray(rng.uniform(1e-3, 2e-3, (n,)).astype(np.float32))
    bias = jnp.asarray(rng.normal(size=(n,)).astype(np.float32))
    interp = jax.default_backend() != "tpu"

    def one_pallas(xc):
        return int8_matmul(xc, w, eff, bias, act="relu", out_scale=0.05,
                           interpret=interp)

    def one_xla(xc):
        acc = jnp.dot(xc, w, preferred_element_type=jnp.int32)
        y = jnp.maximum(acc.astype(jnp.float32) * eff + bias, 0)
        return jnp.clip(jnp.round(y * 20.0), -127, 127).astype(jnp.int8)

    t_pallas = _time_one(one_pallas, x, n_iters=iters)
    t_xla = _time_one(one_xla, x, n_iters=iters)
    winner = "pallas" if t_pallas < t_xla else "xla"
    if verbose:
        f = 2 * m * k * n
        print(f"({m},{k},{n}) pallas {t_pallas*1e6:.1f}us "
              f"({f/t_pallas/1e12:.1f}T) xla {t_xla*1e6:.1f}us "
              f"({f/t_xla/1e12:.1f}T) -> {winner}")
    _store({_key(m, k, n): winner})
    return winner


def tune_graph(graph, *, verbose: bool = False,
               sweep_blocks: bool = False) -> Dict[str, str]:
    """Measure every Pallas-eligible problem in an optimized graph — GEMM
    buckets and general depthwise shapes (k∈{3,5}, s∈{1,2}).  With
    ``sweep_blocks``, each GEMM bucket first gets a measured block-shape
    sweep (the winner is what measure_gemm then races against XLA)."""
    from .autotune import _gemm_problem

    results: Dict[str, str] = {}
    seen = set()
    for op in graph.ops:
        if not op.attrs.get("enable_int8"):
            continue
        if op.op_type == "depthwise_conv2d":
            from . import depthwise
            from ..common import normalize_2d

            x = graph.vars[op.input("Input")]
            w = graph.vars[op.input("Filter")]
            if not depthwise.supported_general(op.attrs, x.shape, w.shape) \
                    or op.maybe_input("ResidualData"):
                continue
            k = w.shape[0]
            s = normalize_2d(op.attrs.get("strides", (1, 1)))[0]
            key = _dw_key(x.shape[1], x.shape[3], k, s)
            if key in seen:
                continue
            seen.add(key)
            try:
                results[key] = measure_dw(x.shape[0], x.shape[1], x.shape[3],
                                          k=k, s=s, verbose=verbose)
            except Exception as e:  # Mosaic/compile rejection → XLA
                if verbose:
                    print(f"  {key}: measure failed ({type(e).__name__}) "
                          "-> xla", flush=True)
                _store({key: "xla"})
                results[key] = "xla"
            continue
        prob = _gemm_problem(graph, op)
        if prob is None:
            continue
        key = _key(*prob)
        if key in seen:
            continue
        seen.add(key)
        try:
            if sweep_blocks:
                sweep_gemm_blocks(*prob, verbose=verbose)
            results[key] = measure_gemm(*prob, verbose=verbose)
        except Exception as e:  # Mosaic/compile rejection → XLA
            if verbose:
                print(f"  {key}: measure failed ({type(e).__name__}) -> xla",
                      flush=True)
            _store({key: "xla"})
            results[key] = "xla"
    return results


def _op_table_key(graph, op) -> Optional[str]:
    """The autotune-table key this op's kernel pick is governed by, or None
    for ops whose pick is not table-driven (e.g. the NMS Pallas kernel)."""
    from .autotune import _gemm_problem

    if op.op_type == "depthwise_conv2d":
        x = graph.vars[op.input("Input")]
        w = graph.vars[op.input("Filter")]
        from ..common import normalize_2d

        s = normalize_2d(op.attrs.get("strides", (1, 1)))[0]
        return _dw_key(x.shape[1], x.shape[3], w.shape[0], s)
    prob = _gemm_problem(graph, op)
    return _key(*prob) if prob else None


def validate_in_model(graph, feed, *, min_win: float = 1.01,
                      persist: bool = True, verbose: bool = False,
                      measure=None) -> Dict[str, str]:
    """End-to-end A/B of every Pallas table pick inside the whole model.

    ``graph`` must already be optimized (kernel_pick applied).  For each
    table bucket the pick routed to Pallas, the FULL jitted model is
    re-measured with that bucket demoted to XLA (greedy, one bucket at a
    time, keeping improvements).  Pallas survives only if the whole model is
    ``min_win``× faster with it — ties go to XLA, the fusion-friendly
    default.  Demotions are persisted to the table so ``optimize()`` emits
    the fast plan by default.  Returns {bucket_key: final_winner} for every
    Pallas bucket examined.
    """
    if measure is None:
        from ...tools.benchmark import device_throughput as measure

    groups: Dict[str, list] = {}
    for op in graph.ops:
        if op.attrs.get("kernel") != "pallas":
            continue
        key = _op_table_key(graph, op)
        if key is not None:
            groups.setdefault(key, []).append(op)
    if not groups:
        return {}

    best = measure(graph, feed)
    if verbose:
        print(f"in-model baseline (auto plan): {best:.1f} items/s", flush=True)
    decisions: Dict[str, str] = {}
    for key in sorted(groups):
        ops = groups[key]
        for op in ops:
            op.attrs["kernel"] = "xla"
        demoted = measure(graph, feed)
        if best > demoted * min_win:
            # pallas wins end-to-end by the required margin: restore it
            for op in ops:
                op.attrs["kernel"] = "pallas"
            decisions[key] = "pallas"
        else:
            decisions[key] = "xla"
            best = max(best, demoted)
        if verbose:
            print(f"  {key}: xla-demoted {demoted:.1f} items/s "
                  f"-> keep {decisions[key]}", flush=True)
    if persist:
        _store(decisions)
    return decisions


# bigru table keys (``bigru_*`` / ``bigru_f32_*``): RETIRED in r5 with the
# Pallas gru_scan kernel — two rounds of measurement (docs/bigru_sweep_r4
# .json, docs/crnn_long_r5.json) found no config where the kernel wins
# IN-MODEL; the ``bidirectional_gru`` op always runs the XLA scan now and
# stale table entries are simply never consulted.


def _dw_key(h: int, c: int, k: int = 3, s: int = 1) -> str:
    return f"dw{k}x{k}s{s}_{_bucket(h)}x{_bucket(c)}"


def lookup_dw(h: int, c: int, k: int = 3, s: int = 1) -> Optional[str]:
    return _load().get(_dw_key(h, c, k, s))


def measure_dw(batch: int, h: int, c: int, *, k: int = 3, s: int = 1,
               iters: int = 16, verbose: bool = False) -> str:
    """Time pallas-vs-xla int8 depthwise (k in {3,5}, stride in {1,2})."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from .depthwise import dw_conv_int8

    rng = np.random.default_rng(0)
    x = jax.device_put(rng.integers(-127, 128, (batch, h, h, c), dtype=np.int8))
    w = jax.device_put(rng.integers(-127, 128, (k, k, 1, c), dtype=np.int8))
    eff = jnp.asarray(rng.uniform(1e-3, 2e-3, (c,)).astype(np.float32))
    bias = jnp.asarray(rng.normal(size=(c,)).astype(np.float32))
    interp = jax.default_backend() != "tpu"
    pad = (k - 1) // 2

    def one_pallas(xc):
        return dw_conv_int8(xc, w, eff, bias, stride=s, act="relu",
                            out_scale=0.05, interpret=interp)

    def one_xla(xc):
        acc = jax.lax.conv_general_dilated(
            xc, w, (s, s), ((pad, pad), (pad, pad)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=c, preferred_element_type=jnp.int32)
        y = jnp.maximum(acc.astype(jnp.float32) * eff + bias, 0)
        return jnp.clip(jnp.round(y * 20.0), -127, 127).astype(jnp.int8)

    def timed_dw(one, n_iters, min_window: float = 0.25):
        @jax.jit
        def looped(xc, it):
            def body(i, carry):
                out = one(carry)
                return carry.at[0, 0, 0, 0].set(jnp.bitwise_xor(
                    carry[0, 0, 0, 0], out[0, 0, 0, 0].astype(carry.dtype)))

            return jnp.sum(jax.lax.fori_loop(0, it, body, xc)[0, 0, 0, :1]
                           .astype(jnp.int32))

        def t(it):
            t0 = time.perf_counter()
            float(jax.device_get(looped(x, jnp.int32(it))))
            return time.perf_counter() - t0

        t(1)
        import numpy as _np
        loop = max(n_iters, 16)
        while True:
            d = float(_np.median([t(1 + loop) - t(1) for _ in range(3)]))
            if d >= min_window or loop >= 1 << 22:
                break
            loop = min(max(int(loop * min_window * 1.3 / max(d, 1e-4)) + 1,
                           loop * 2), 1 << 22)
        deltas = [t(1 + loop) - t(1) for _ in range(3)]
        good = [v for v in deltas if v > min_window / 4] or deltas
        return float(_np.median(good)) / loop

    t_pallas = timed_dw(one_pallas, iters)
    t_xla = timed_dw(one_xla, iters)
    winner = "pallas" if t_pallas < t_xla else "xla"
    if verbose:
        bts = batch * h * h * c * (1 + 1 / (s * s))  # int8 in+out
        print(f"dw k{k}s{s} ({batch},{h},{c}) pallas {t_pallas*1e6:.1f}us "
              f"({bts/t_pallas/1e9:.0f}GB/s) xla {t_xla*1e6:.1f}us "
              f"({bts/t_xla/1e9:.0f}GB/s) -> {winner}", flush=True)
    _store({_dw_key(h, c, k, s): winner})
    return winner
