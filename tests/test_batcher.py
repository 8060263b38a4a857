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


def test_model_specific_bucket_cap(tmp_path, rng):
    """A measured best-batch table must cap the bucket ladder at the
    model's throughput-optimal size (VERDICT r1 #8)."""
    import json

    from paddle_lite_tpu.runtime.batch_table import best_bucket, save_entry
    from paddle_lite_tpu.runtime.batcher import BatcherConfig, ContinuousBatcher

    d = str(tmp_path)
    # DBNet-like profile: throughput peaks at b4
    save_entry("dbnet_like", {1: 300.0, 2: 500.0, 4: 900.0, 8: 700.0,
                              16: 650.0}, d)
    assert best_bucket("dbnet_like", (1, 2, 4, 8, 16), d) == 4

    built = []

    class Echo:
        def __init__(self, batch):
            self.batch = batch

        def run(self, inputs):
            return {"out": inputs["x"] * 2}

    def factory(batch):
        built.append(batch)
        return Echo(batch)

    cfg = BatcherConfig(buckets=(1, 2, 4, 8, 16), model="dbnet_like",
                        autotune_dir=d, max_wait_ms=20.0)
    b = ContinuousBatcher(factory, cfg)
    try:
        assert tuple(b.config.buckets) == (1, 2, 4)
        futs = [b.submit({"x": np.full((3,), i, np.float32)})
                for i in range(10)]
        outs = [f.result(timeout=10) for f in futs]
        for i, o in enumerate(outs):
            np.testing.assert_allclose(o["out"], np.full((3,), 2 * i))
        assert max(built) <= 4  # never over-batches past the measured peak
    finally:
        b.close()

    # unknown model: ladder untouched
    cfg2 = BatcherConfig(buckets=(1, 2, 4, 8, 16), model="never_measured",
                         autotune_dir=d)
    b2 = ContinuousBatcher(factory, cfg2)
    try:
        assert tuple(b2.config.buckets) == (1, 2, 4, 8, 16)
    finally:
        b2.close()


def test_predictor_clone_shares_weights(rng):
    """Predictor.clone: the reference's per-thread serving pattern — clones
    share staged device weights (same buffers) and produce identical
    outputs; run from multiple threads concurrently."""
    import threading

    from paddle_lite_tpu import GraphBuilder
    from paddle_lite_tpu.runtime.predictor import Predictor

    b = GraphBuilder("m", seed=3)
    x = b.input("x", (2, 8))
    y = b.fc(x, 4)
    b.mark_output(y)
    g = b.build()
    p = Predictor(g)
    feed = {"x": rng.normal(size=(2, 8)).astype(np.float32)}
    ref = np.asarray(p.run(feed)[g.outputs[0]])
    clones = [p.clone() for _ in range(4)]
    # device weight buffers are literally shared
    assert all(c._weights_on_device is p._weights_on_device for c in clones)

    outs = [None] * 4
    def work(i):
        outs[i] = np.asarray(clones[i].run(feed)[g.outputs[0]])
    ts = [threading.Thread(target=work, args=(i,)) for i in range(4)]
    [t.start() for t in ts]
    [t.join() for t in ts]
    for o in outs:
        np.testing.assert_array_equal(o, ref)


def test_cliff_aware_bucket_dispatch(tmp_path):
    """r5: dispatch routes n requests to the measured-FASTEST bucket >= n,
    which can be larger than the smallest fit — XLA's batch-dependent
    layout assignment makes some larger programs faster in absolute ms
    (MobileNetV3 b8 < b4; docs/mnv3_b4_r5.json)."""
    import numpy as np

    from paddle_lite_tpu.runtime.batch_table import bucket_for, save_entry
    from paddle_lite_tpu.runtime.batcher import BatcherConfig, ContinuousBatcher

    d = str(tmp_path)
    # MNv3-like: b8's program is faster in absolute ms than b4's
    # (ms = b/ips: b2 0.60, b4 1.12, b8 0.87, b64 1.79)
    save_entry("mnv3_like", {2: 3322.7, 4: 3580.8, 8: 9215.9,
                             64: 35680.3}, d)
    assert bucket_for("mnv3_like", 3, (1, 2, 4, 8, 16, 32, 64), d) == 8
    assert bucket_for("mnv3_like", 1, (1, 2, 4, 8, 16, 32, 64), d) == 2
    assert bucket_for("never_measured", 3, (1, 2, 4), d) is None

    built = []

    class Echo:
        def __init__(self, batch):
            self.batch = batch

        def run(self, inputs):
            return {"out": inputs["x"] * 2 + 0 * self.batch}

    b = ContinuousBatcher(
        lambda bb: built.append(bb) or Echo(bb),
        BatcherConfig(buckets=(1, 2, 4, 8, 16, 32, 64), model="mnv3_like",
                      autotune_dir=d, max_wait_ms=30.0))
    try:
        futs = [b.submit({"x": np.full((2,), i, np.float32)})
                for i in range(3)]
        for i, f in enumerate(futs):
            np.testing.assert_allclose(f.result(timeout=10)["out"],
                                       np.full((2,), 2 * i))
        # 3 requests must have dispatched through the b8 predictor
        assert 8 in built and 4 not in built
    finally:
        b.close()


def test_length_bucketer_routes_pads_and_batches(rng):
    """r5: LengthBucketer (the serving half of the §5.7 dense-batch
    raggedness contract) pads requests up to a length bucket, routes them
    to a per-length ContinuousBatcher, and supports a model-owned pad_fn
    (mask extension)."""
    import numpy as np

    from paddle_lite_tpu.runtime.batcher import BatcherConfig
    from paddle_lite_tpu.runtime.length_bucketer import LengthBucketer

    built = []

    class Echo:
        def __init__(self, batch, length):
            self.batch, self.length = batch, length

        def run(self, inputs):
            x = inputs["ids"]
            assert x.shape == (self.batch, self.length)
            return {"sum": x.sum(axis=1, keepdims=True)}

    lb = LengthBucketer(
        lambda b, l: built.append((b, l)) or Echo(b, l),
        length_buckets=(32, 64, 128),
        seq_axes={"ids": 0},
        batcher_config=BatcherConfig(buckets=(1, 2, 4), max_wait_ms=20.0))
    try:
        # lengths 20 and 30 share the 32 bucket (and can batch together);
        # 70 goes to 128
        f1 = lb.submit({"ids": np.ones((20,), np.float32)})
        f2 = lb.submit({"ids": np.full((30,), 2.0, np.float32)})
        f3 = lb.submit({"ids": np.ones((70,), np.float32)})
        assert f1.result(10)["sum"][0] == 20.0   # zero-padded to 32
        assert f2.result(10)["sum"][0] == 60.0
        assert f3.result(10)["sum"][0] == 70.0
        lengths_built = {l for _, l in built}
        assert lengths_built == {32, 128}
        assert lb.stats["padded_tokens"] == (32 - 20) + (32 - 30) + (128 - 70)
        # over-long request refuses loudly
        import pytest
        with pytest.raises(ValueError, match="exceeds"):
            lb.submit({"ids": np.ones((200,), np.float32)})
    finally:
        lb.close()

    # model-owned pad_fn: extend an attention mask alongside the ids
    built2 = []

    class MaskEcho:
        def __init__(self, batch, length):
            self.batch, self.length = batch, length

        def run(self, inputs):
            return {"n_real": inputs["mask"].sum(axis=1, keepdims=True)}

    def pad_with_mask(inputs, target):
        ids = np.asarray(inputs["ids"])
        n = ids.shape[0]
        return {"ids": np.pad(ids, (0, target - n)),
                "mask": np.pad(np.ones((n,), np.float32),
                               (0, target - n))}

    lb2 = LengthBucketer(
        lambda b, l: built2.append((b, l)) or MaskEcho(b, l),
        length_buckets=(16, 32), seq_axes={"ids": 0},
        pad_fn=pad_with_mask,
        batcher_config=BatcherConfig(buckets=(1, 2), max_wait_ms=20.0))
    try:
        f = lb2.submit({"ids": np.ones((10,), np.int32)})
        assert f.result(10)["n_real"][0] == 10.0
    finally:
        lb2.close()


def test_length_bucketer_serves_real_crnn(rng):
    """Length-bucketed CRNN serving through real Predictors: two strip
    widths land in different length buckets, run the actual compiled
    models, and produce the right time-axis extents (W/4)."""
    import numpy as np

    from paddle_lite_tpu.models.ppocr import build_rec
    from paddle_lite_tpu.runtime.batcher import BatcherConfig
    from paddle_lite_tpu.runtime.length_bucketer import LengthBucketer
    from paddle_lite_tpu.runtime.predictor import Predictor
    from paddle_lite_tpu.tools.opt import optimize

    def factory(batch, width):
        g = build_rec(batch=batch, width=width, num_chars=20, seed=0)
        optimize(g)
        return Predictor(g)

    lb = LengthBucketer(
        factory, length_buckets=(32, 64),
        seq_axes={"image": 1},   # (H, W, C) per request -> W is axis 1
        batcher_config=BatcherConfig(buckets=(1, 2), max_wait_ms=20.0))
    try:
        out_narrow = lb.infer(
            {"image": rng.normal(size=(32, 20, 3)).astype(np.float32)},
            timeout=120)
        out_wide = lb.infer(
            {"image": rng.normal(size=(32, 50, 3)).astype(np.float32)},
            timeout=120)
        def t_extent(out):
            # the CTC logits output: (T, num_chars+1) after the batch dim
            # was stripped by the batcher
            arrs = [v for v in out.values() if getattr(v, "ndim", 0) == 2]
            assert arrs, {k: getattr(v, "shape", None)
                          for k, v in out.items()}
            return arrs[0].shape[0]

        assert t_extent(out_narrow) == 32 // 4   # T = bucket32 / 4
        assert t_extent(out_wide) == 64 // 4     # T = bucket64 / 4
    finally:
        lb.close()


def test_batch_tune_merges_existing_rows(tmp_path, monkeypatch):
    """Re-tuning a subset of buckets must merge into the stored table, not
    wipe rows measured at other sizes (the cliff-aware dispatcher depends
    on the full table)."""
    import sys

    from paddle_lite_tpu.runtime.batch_table import load_table, save_entry
    from paddle_lite_tpu.tools import batch_tune

    d = str(tmp_path)
    save_entry("m", {4: 100.0, 8: 50.0, 16: 200.0}, d)

    def fake_bench(model, *, batch, **kw):
        return {"int8_items_per_sec": 999.0 + batch}

    monkeypatch.setattr(
        "paddle_lite_tpu.tools.benchmark.bench_model", fake_bench)
    monkeypatch.setattr(sys, "argv", [
        "batch_tune", "--model", "m", "--buckets", "8",
        "--autotune-dir", d])
    batch_tune.main()
    t = load_table(d)["m"]
    assert t == {"4": 100.0, "8": 1007.0, "16": 200.0}
