"""Arena tests for the long-tail ops (extra.py)."""

import numpy as np
import pytest

from paddle_lite_tpu.testing import OpTestCase, run_arena


def test_group_norm(rng):
    x = rng.normal(size=(2, 4, 4, 8)).astype(np.float32)

    def baseline(ins):
        v = ins["X"][0]
        n, h, w, c = v.shape
        g = 2
        vg = v.reshape(n, h, w, g, c // g)
        mean = vg.mean(axis=(1, 2, 4), keepdims=True)
        var = ((vg - mean) ** 2).mean(axis=(1, 2, 4), keepdims=True)
        return {"Y": [((vg - mean) / np.sqrt(var + 1e-5)).reshape(v.shape)]}

    run_arena(OpTestCase("group_norm", {"X": [x]}, {"groups": 2},
                         out_slots=("Y",), atol=1e-4), baseline)


def test_instance_norm(rng):
    x = rng.normal(size=(2, 4, 4, 3)).astype(np.float32)

    def baseline(ins):
        v = ins["X"][0]
        mean = v.mean(axis=(1, 2), keepdims=True)
        var = ((v - mean) ** 2).mean(axis=(1, 2), keepdims=True)
        return {"Y": [(v - mean) / np.sqrt(var + 1e-5)]}

    run_arena(OpTestCase("instance_norm", {"X": [x]}, out_slots=("Y",),
                         atol=1e-4), baseline)


def test_pixel_shuffle(rng):
    x = rng.normal(size=(1, 2, 3, 8)).astype(np.float32)

    def baseline(ins):
        v = ins["X"][0]
        n, h, w, c = v.shape
        r, co = 2, c // 4
        y = v.reshape(n, h, w, r, r, co).transpose(0, 1, 3, 2, 4, 5)
        return {"Out": [y.reshape(n, h * r, w * r, co)]}

    run_arena(OpTestCase("pixel_shuffle", {"X": [x]}, {"upscale_factor": 2}),
              baseline)


def test_cumsum_where_onehot(rng):
    x = rng.normal(size=(3, 5)).astype(np.float32)
    run_arena(OpTestCase("cumsum", {"X": [x]}, {"axis": 1}),
              lambda ins: {"Out": [np.cumsum(ins["X"][0], axis=1)]})

    cond = rng.random((3, 5)) > 0.5
    y = rng.normal(size=(3, 5)).astype(np.float32)
    run_arena(
        OpTestCase("where", {"Condition": [cond], "X": [x], "Y": [y]},
                   shape_arg_slots=("Condition", "X")),
        lambda ins: {"Out": [np.where(ins["Condition"][0], ins["X"][0],
                                      ins["Y"][0])]},
    )

    ids = rng.integers(0, 7, (4,)).astype(np.int32)
    run_arena(
        OpTestCase("one_hot", {"X": [ids]}, {"depth": 7}),
        lambda ins: {"Out": [np.eye(7, dtype=np.float32)[ins["X"][0]]]},
    )


def test_tile_expand_as_unstack(rng):
    x = rng.normal(size=(2, 3)).astype(np.float32)
    run_arena(OpTestCase("tile", {"X": [x]}, {"repeat_times": [2, 2]}),
              lambda ins: {"Out": [np.tile(ins["X"][0], (2, 2))]})

    big = np.zeros((4, 3), np.float32)
    run_arena(
        OpTestCase("expand_as", {"X": [x[:1]], "Y": [big]},
                   shape_arg_slots=("X", "Y")),
        lambda ins: {"Out": [np.broadcast_to(ins["X"][0], (4, 3))]},
    )

    run_arena(
        OpTestCase("unstack", {"X": [x]}, {"axis": 0}, out_slots=("Y",)),
        lambda ins: {"Y": [ins["X"][0][0], ins["X"][0][1]]},
    )


def test_erf_add_n(rng):
    import math

    x = rng.normal(size=(4,)).astype(np.float32)
    run_arena(OpTestCase("erf", {"X": [x]}, atol=1e-5),
              lambda ins: {"Out": [np.vectorize(math.erf)(ins["X"][0])
                                   .astype(np.float32)]})

    a, b, c = (rng.normal(size=(2, 2)).astype(np.float32) for _ in range(3))
    run_arena(OpTestCase("add_n", {"X": [a, b, c]},
                         shape_arg_slots=("X",)),
              lambda ins: {"Out": [sum(ins["X"])]})
