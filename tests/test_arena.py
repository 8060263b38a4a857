"""Arena-harness op tests — the tier-2 analog: every registered kernel of an
op vs a numpy baseline (lite/tests/kernels pattern)."""

import numpy as np
import pytest

from paddle_lite_tpu.testing import OpTestCase, run_arena
from paddle_lite_tpu.utils import device_info


def test_softmax_arena(rng):
    x = rng.normal(size=(4, 10)).astype(np.float32)

    def baseline(ins):
        v = ins["X"][0]
        e = np.exp(v - v.max(-1, keepdims=True))
        return {"Out": [e / e.sum(-1, keepdims=True)]}

    run_arena(OpTestCase("softmax", {"X": [x]}, {"axis": -1}), baseline)


def test_eltwise_add_arena(rng):
    x = rng.normal(size=(2, 3, 4)).astype(np.float32)
    y = rng.normal(size=(2, 3, 4)).astype(np.float32)
    run_arena(
        OpTestCase("elementwise_add", {"X": [x], "Y": [y]}),
        lambda ins: {"Out": [ins["X"][0] + ins["Y"][0]]},
    )


def test_transpose_arena(rng):
    x = rng.normal(size=(2, 3, 4)).astype(np.float32)
    run_arena(
        OpTestCase("transpose", {"X": [x]}, {"axis": [2, 0, 1]}),
        lambda ins: {"Out": [np.transpose(ins["X"][0], (2, 0, 1))]},
    )


def test_fc_arena_runs_both_kernels(rng):
    """fc has xla AND pallas impls — arena must exercise both (pallas falls
    back to xla on fp32 inputs, which is itself worth pinning)."""
    x = rng.normal(size=(4, 16)).astype(np.float32)
    w = rng.normal(size=(16, 8)).astype(np.float32)
    b = rng.normal(size=(8,)).astype(np.float32)
    results = run_arena(
        OpTestCase(
            "fc", {"Input": [x], "W": [w], "Bias": [b]},
            attrs={"in_num_col_dims": 1},
            weight_slots=("W", "Bias"),
            shape_arg_slots=("Input", "W"),
        ),
        lambda ins: {"Out": [ins["Input"][0] @ ins["W"][0] + ins["Bias"][0]]},
    )
    assert set(results) == {"xla", "pallas"}


def test_device_info():
    info = device_info.get()
    assert info.num_devices >= 1
    assert info.peak_int8_tops() > 0
    # roofline: 1 GFLOP pure-compute at peak must be faster than over HBM
    t = info.roofline_time_s(flops=1e9, bytes_moved=0)
    assert t > 0
