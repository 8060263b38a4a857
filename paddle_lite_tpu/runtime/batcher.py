"""Continuous batcher — request-level parallelism for serving.

Net-new vs the reference (SURVEY §2.9): Paddle-Lite's answer to concurrent
requests was "run one Predictor per thread"; the TPU-native answer is a
single sharded model fed by a continuous batcher: requests queue up, are
grouped into the smallest fitting *bucket* batch size (fixed buckets avoid
XLA recompiles — the static-shape analog of the reference's fixed-shape
``.nb`` programs), padded, executed as one device call, and the per-request
slices resolved back to their futures.

Single dispatcher thread owns the device stream (the jax queue is the only
shared state; one submitter thread = no data races — mirroring the
reference's one-predictor-one-thread contract, SURVEY §5.2).
"""

from __future__ import annotations

import dataclasses
import queue
import threading
import time
from concurrent.futures import Future
from typing import Any, Callable, Dict, List, Optional, Sequence

import jax
import numpy as np


@dataclasses.dataclass
class BatcherConfig:
    # int8's advantage needs compute-bound batches (measured: MobileNetV1
    # int8 LOSES to fp32 at b8 but wins 2x at b64 — BASELINE.md batch-size
    # note), so the bucket ladder reaches 64 and the batcher prefers the
    # largest fillable bucket
    buckets: Sequence[int] = (1, 2, 4, 8, 16, 32, 64)
    max_wait_ms: float = 2.0  # linger before dispatching a partial batch
    max_queue: int = 1024
    # Per-model measured best-batch table (runtime/batch_table.py): when
    # `model` names an entry in .autotune/batch.json, the ladder is capped
    # at that model's measured-throughput-optimal bucket (padding past the
    # peak only adds latency — e.g. DBNet peaks at b4, MobileNets at b64).
    model: Optional[str] = None
    autotune_dir: Optional[str] = None


@dataclasses.dataclass
class _Pending:
    inputs: Dict[str, np.ndarray]  # batch-1 arrays (leading dim 1)
    future: Future
    enqueued_at: float


class ContinuousBatcher:
    """Groups single-sample requests into bucketed device batches.

    ``predictor_factory(batch)`` must return a Predictor-like object whose
    ``run(inputs)`` takes/returns name-keyed arrays with leading batch dim
    == ``batch``.  Predictors are built lazily per bucket and cached (each
    is one compiled XLA program).
    """

    def __init__(
        self,
        predictor_factory: Callable[[int], Any],
        config: Optional[BatcherConfig] = None,
    ):
        self.config = config or BatcherConfig()
        if self.config.model is not None:
            from .batch_table import best_bucket

            best = best_bucket(self.config.model, self.config.buckets,
                               self.config.autotune_dir)
            if best is not None:
                capped = tuple(b for b in self.config.buckets if b <= best)
                if best not in capped:
                    # the measured peak can sit off the power-of-two ladder
                    # (ppocr_det peaks at b6 — docs/ppocr_b8_r5.json)
                    capped = capped + (best,)
                self.config = dataclasses.replace(self.config,
                                                  buckets=capped or (best,))
        self._factory = predictor_factory
        self._predictors: Dict[int, Any] = {}
        self._queue: "queue.Queue[_Pending]" = queue.Queue(self.config.max_queue)
        self._stop = threading.Event()
        self._thread = threading.Thread(target=self._loop, daemon=True,
                                        name="plt-batcher")
        self._thread.start()
        self.stats = {"batches": 0, "requests": 0, "padded_slots": 0}

    # ---- client API ------------------------------------------------------
    def submit(self, inputs: Dict[str, np.ndarray]) -> Future:
        """Submit one request (arrays WITHOUT the batch dim). Returns a
        Future resolving to name-keyed output arrays (batch dim stripped)."""
        f: Future = Future()
        batched = {k: np.asarray(v)[None, ...] for k, v in inputs.items()}
        self._queue.put(_Pending(batched, f, time.perf_counter()))
        return f

    def infer(self, inputs: Dict[str, np.ndarray], timeout: Optional[float] = None):
        return self.submit(inputs).result(timeout)

    def close(self) -> None:
        self._stop.set()
        self._thread.join(timeout=5)

    # ---- dispatcher ------------------------------------------------------
    def _bucket_for(self, n: int) -> int:
        if self.config.model is not None:
            from .batch_table import bucket_for

            b = bucket_for(self.config.model, n, self.config.buckets,
                           self.config.autotune_dir)
            if b is not None:
                # cliff-aware: the measured-fastest bucket >= n, which can
                # be LARGER than the smallest fit (padding past an XLA
                # batch-layout cliff is faster in absolute ms — see
                # batch_table.bucket_for)
                return b
        for b in sorted(self.config.buckets):
            if b >= n:
                return b
        return max(self.config.buckets)

    def _predictor(self, bucket: int):
        if bucket not in self._predictors:
            self._predictors[bucket] = self._factory(bucket)
        return self._predictors[bucket]

    def _collect(self) -> List[_Pending]:
        """Block for the first request, then linger up to max_wait_ms or
        until the largest bucket fills."""
        try:
            first = self._queue.get(timeout=0.05)
        except queue.Empty:
            return []
        batch = [first]
        max_b = max(self.config.buckets)
        deadline = time.perf_counter() + self.config.max_wait_ms / 1e3
        while len(batch) < max_b:
            remaining = deadline - time.perf_counter()
            if remaining <= 0:
                break
            try:
                batch.append(self._queue.get(timeout=remaining))
            except queue.Empty:
                break
        return batch

    def _loop(self) -> None:
        while not self._stop.is_set():
            batch = self._collect()
            if not batch:
                continue
            try:
                self._dispatch(batch)
            except Exception as e:  # fail-fast per batch, not per server
                for p in batch:
                    if not p.future.done():
                        p.future.set_exception(e)

    def _dispatch(self, batch: List[_Pending]) -> None:
        n = len(batch)
        bucket = self._bucket_for(n)
        pred = self._predictor(bucket)
        keys = batch[0].inputs.keys()
        stacked: Dict[str, np.ndarray] = {}
        for k in keys:
            arrs = [p.inputs[k] for p in batch]
            pad = bucket - n
            if pad:
                arrs = arrs + [np.zeros_like(arrs[0])] * pad
            stacked[k] = np.concatenate(arrs, axis=0)
        # async dispatch: hand device arrays to the futures without blocking
        # the dispatcher on a device->host readback — the next batch is
        # collected while this one computes (inter-batch pipelining); the
        # client's own np.asarray()/device_get is the sync point
        out = pred.run(stacked)
        for i, p in enumerate(batch):
            p.future.set_result({k: v[i] for k, v in out.items()})
        self.stats["batches"] += 1
        self.stats["requests"] += n
        self.stats["padded_slots"] += bucket - n
