"""Continuous batcher tests: correctness under concurrency, bucketing,
padding, and failure isolation."""

import threading
import time

import numpy as np
import pytest

from paddle_lite_tpu import GraphBuilder, QuantConfig
from paddle_lite_tpu.runtime.batcher import BatcherConfig, ContinuousBatcher
from paddle_lite_tpu.runtime.predictor import create_predictor


def _factory(bucket: int):
    b = GraphBuilder("m", seed=41)
    x = b.input("x", (bucket, 4, 4, 8))
    y = b.conv_bn_act(x, 16, 1, act="relu")
    y = b.pool2d(y, "avg", global_pooling=True)
    y = b.reshape(y, (bucket, 16))
    y = b.fc(y, 4)
    b.mark_output(y)
    g = b.build()
    # fp32: per-bucket PTQ would calibrate each bucket's predictor on
    # different data, making cross-bucket outputs differ by quant noise
    return create_predictor(g)


def test_batcher_matches_direct(rng):
    batcher = ContinuousBatcher(_factory, BatcherConfig(buckets=(1, 2, 4),
                                                        max_wait_ms=5))
    try:
        xs = [rng.normal(size=(4, 4, 8)).astype(np.float32) for _ in range(6)]
        futs = [batcher.submit({"x": x}) for x in xs]
        outs = [f.result(timeout=60) for f in futs]

        direct = _factory(1)
        for x, out in zip(xs, outs):
            ref = direct.run({"x": x[None]})
            k = list(ref)[0]
            np.testing.assert_allclose(
                list(out.values())[0], np.asarray(ref[k])[0],
                rtol=1e-4, atol=1e-5,
            )
        assert batcher.stats["requests"] == 6
        assert batcher.stats["batches"] <= 6  # at least some grouping allowed
    finally:
        batcher.close()


def test_batcher_groups_concurrent_requests(rng):
    calls = []
    real_factory = _factory

    def counting_factory(bucket):
        pred = real_factory(bucket)

        class Wrap:
            def run(self, inputs):
                calls.append(inputs[list(inputs)[0]].shape[0])
                return pred.run(inputs)

        return Wrap()

    batcher = ContinuousBatcher(
        counting_factory, BatcherConfig(buckets=(1, 2, 4), max_wait_ms=200)
    )
    try:
        xs = [rng.normal(size=(4, 4, 8)).astype(np.float32) for _ in range(4)]
        futs = [batcher.submit({"x": x}) for x in xs]
        for f in futs:
            f.result(timeout=120)
        # with a 200ms linger, the 4 quick submits should coalesce into
        # one or two device calls, not four
        assert len(calls) <= 2, calls
    finally:
        batcher.close()


def test_batcher_failure_isolated():
    def bad_factory(bucket):
        class Bad:
            def run(self, inputs):
                raise RuntimeError("device on fire")

        return Bad()

    batcher = ContinuousBatcher(bad_factory, BatcherConfig(buckets=(1, 2)))
    try:
        f = batcher.submit({"x": np.zeros((4, 4, 8), np.float32)})
        with pytest.raises(RuntimeError, match="device on fire"):
            f.result(timeout=30)
        # batcher survives; next request also gets a clean error
        f2 = batcher.submit({"x": np.zeros((4, 4, 8), np.float32)})
        with pytest.raises(RuntimeError):
            f2.result(timeout=30)
    finally:
        batcher.close()
