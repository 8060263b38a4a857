"""Arena tests for the round-2 long-tail ops (ops/longtail.py) — every op
vs a numpy baseline, the lite/tests/kernels pattern."""

import numpy as np
import pytest

from paddle_lite_tpu.testing import OpTestCase, run_arena


def test_pow_and_unaries(rng):
    x = np.abs(rng.normal(size=(3, 5))).astype(np.float32) + 0.1
    run_arena(OpTestCase("pow", {"X": [x]}, {"factor": 2.5}),
              lambda ins: {"Out": [ins["X"][0] ** 2.5]})
    run_arena(OpTestCase("increment", {"X": [x]}, {"step": 2.0}),
              lambda ins: {"Out": [ins["X"][0] + 2.0]})
    y = rng.normal(size=(4, 4)).astype(np.float32)
    run_arena(OpTestCase("thresholded_relu", {"X": [y]}, {"threshold": 0.3}),
              lambda ins: {"Out": [np.where(ins["X"][0] > 0.3, ins["X"][0], 0)]})
    run_arena(OpTestCase("brelu", {"X": [y]}, {"t_min": -0.5, "t_max": 0.5}),
              lambda ins: {"Out": [np.clip(ins["X"][0], -0.5, 0.5)]})
    run_arena(OpTestCase("hard_shrink", {"X": [y]}, {"threshold": 0.5}),
              lambda ins: {"Out": [np.where(np.abs(ins["X"][0]) > 0.5,
                                            ins["X"][0], 0)]})
    run_arena(OpTestCase("softshrink", {"X": [y]}, {"lambda": 0.3}),
              lambda ins: {"Out": [np.sign(ins["X"][0])
                                   * np.maximum(np.abs(ins["X"][0]) - 0.3, 0)]})
    run_arena(OpTestCase("tanh_shrink", {"X": [y]}),
              lambda ins: {"Out": [ins["X"][0] - np.tanh(ins["X"][0])]})


def test_log_softmax_and_mean(rng):
    x = rng.normal(size=(4, 7)).astype(np.float32)

    def ref_ls(ins):
        v = ins["X"][0]
        e = v - v.max(-1, keepdims=True)
        return {"Out": [e - np.log(np.exp(e).sum(-1, keepdims=True))]}

    run_arena(OpTestCase("log_softmax", {"X": [x]}, {"axis": -1}), ref_ls)
    run_arena(OpTestCase("mean", {"X": [x]}),
              lambda ins: {"Out": [np.asarray([ins["X"][0].mean()])]})


def test_fills_and_ranges(rng):
    x = rng.normal(size=(3, 4)).astype(np.float32)
    run_arena(OpTestCase("fill_any_like", {"X": [x]}, {"value": 7.0}),
              lambda ins: {"Out": [np.full_like(ins["X"][0], 7.0)]})
    run_arena(OpTestCase("fill_zeros_like", {"X": [x]}),
              lambda ins: {"Out": [np.zeros_like(ins["X"][0])]})
    run_arena(OpTestCase("range", {}, {"start": 2.0, "end": 10.0, "step": 2.0,
                                       "dtype": "float32"}),
              lambda ins: {"Out": [np.arange(2.0, 10.0, 2.0, np.float32)]})
    run_arena(OpTestCase("linspace", {}, {"start": 0.0, "stop": 1.0, "num": 5,
                                          "dtype": "float32"}),
              lambda ins: {"Out": [np.linspace(0, 1, 5, dtype=np.float32)]})
    run_arena(
        OpTestCase("fill_constant_batch_size_like", {"Input": [x]},
                   {"shape": [-1, 6], "value": 3.0, "input_dim_idx": 0,
                    "output_dim_idx": 0}),
        lambda ins: {"Out": [np.full((3, 6), 3.0, np.float32)]})
    run_arena(
        OpTestCase("assign_value", {}, {"shape": [2, 2],
                                        "fp32_values": [1.0, 2.0, 3.0, 4.0]}),
        lambda ins: {"Out": [np.asarray([[1, 2], [3, 4]], np.float32)]})


def test_expand_variants(rng):
    x = rng.normal(size=(1, 3, 1)).astype(np.float32)
    run_arena(OpTestCase("expand_v2", {"X": [x]}, {"shape": [2, -1, 4]}),
              lambda ins: {"Out": [np.broadcast_to(ins["X"][0], (2, 3, 4))]})
    y = np.zeros((2, 3, 4), np.float32)
    run_arena(OpTestCase("expand_as_v2", {"X": [x], "Y": [y]}),
              lambda ins: {"Out": [np.broadcast_to(ins["X"][0], (2, 3, 4))]})


def test_scatter_gather(rng):
    x = rng.normal(size=(6, 3)).astype(np.float32)
    ids = np.asarray([1, 4], np.int32)
    upd = rng.normal(size=(2, 3)).astype(np.float32)

    def ref_scatter(ins):
        out = ins["X"][0].copy()
        out[ids] = ins["Updates"][0]
        return {"Out": [out]}

    run_arena(OpTestCase("scatter", {"X": [x], "Ids": [ids], "Updates": [upd]},
                         {"overwrite": True}), ref_scatter)

    def ref_scatter_add(ins):
        out = ins["X"][0].copy()
        np.add.at(out, ids, ins["Updates"][0])
        return {"Out": [out]}

    run_arena(OpTestCase("scatter", {"X": [x], "Ids": [ids], "Updates": [upd]},
                         {"overwrite": False}), ref_scatter_add)

    idx = np.asarray([[0, 1], [3, 2]], np.int32)  # gather_nd (2,2) -> (2,)
    run_arena(OpTestCase("gather_nd", {"X": [x], "Index": [idx]}),
              lambda ins: {"Out": [ins["X"][0][idx[:, 0], idx[:, 1]]]})

    nd_idx = np.asarray([[1], [4]], np.int32)
    run_arena(
        OpTestCase("scatter_nd_add",
                   {"X": [x], "Index": [nd_idx], "Updates": [upd]}),
        ref_scatter_add)

    sel = np.asarray([2, 0], np.int32)
    run_arena(OpTestCase("index_select", {"X": [x], "Index": [sel]},
                         {"dim": 0}),
              lambda ins: {"Out": [ins["X"][0][sel]]})


def test_slicing_reordering(rng):
    x = rng.normal(size=(4, 6, 5)).astype(np.float32)
    run_arena(
        OpTestCase("strided_slice", {"X": [x]},
                   {"axes": [1, 2], "starts": [1, 0], "ends": [6, 5],
                    "strides": [2, 2]}),
        lambda ins: {"Out": [ins["X"][0][:, 1:6:2, 0:5:2]]})
    run_arena(OpTestCase("flip", {"X": [x]}, {"axis": [0, 2]}),
              lambda ins: {"Out": [np.flip(ins["X"][0], (0, 2))]})
    run_arena(OpTestCase("reverse", {"X": [x]}, {"axis": [1]}),
              lambda ins: {"Out": [np.flip(ins["X"][0], 1)]})
    run_arena(OpTestCase("roll", {"X": [x]}, {"shifts": [2], "axis": [1]}),
              lambda ins: {"Out": [np.roll(ins["X"][0], 2, 1)]})
    run_arena(OpTestCase("unbind", {"X": [x]}, {"axis": 0}),
              lambda ins: {"Out": list(ins["X"][0])})
    run_arena(OpTestCase("crop", {"X": [x]},
                         {"offsets": [1, 2, 0], "shape": [2, 3, 5]}),
              lambda ins: {"Out": [ins["X"][0][1:3, 2:5, :]]})


def test_sort_argminmax(rng):
    x = rng.normal(size=(3, 8)).astype(np.float32)

    def ref_argsort(ins):
        v = ins["X"][0]
        idx = np.argsort(-v, -1, kind="stable")
        return {"Out": [np.take_along_axis(v, idx, -1)],
                "Indices": [idx.astype(np.int64)]}

    run_arena(OpTestCase("argsort", {"X": [x]},
                         {"axis": -1, "descending": True},
                         out_slots=("Out", "Indices")), ref_argsort)
    run_arena(OpTestCase("arg_min", {"X": [x]}, {"axis": 1}),
              lambda ins: {"Out": [np.argmin(ins["X"][0], 1).astype(np.int64)]})


def test_norms_and_matmuls(rng):
    x = rng.normal(size=(2, 3, 4)).astype(np.float32)
    y = rng.normal(size=(2, 4, 5)).astype(np.float32)
    run_arena(OpTestCase("bmm", {"X": [x], "Y": [y]}),
              lambda ins: {"Out": [ins["X"][0] @ ins["Y"][0]]})
    run_arena(
        OpTestCase("p_norm", {"X": [x]}, {"porder": 2.0, "axis": -1,
                                          "keepdim": True}),
        lambda ins: {"Out": [np.linalg.norm(ins["X"][0], axis=-1,
                                            keepdims=True)]})
    z = rng.normal(size=(2, 3, 4)).astype(np.float32)

    def ref_cos(ins):
        a, b = ins["X"][0], ins["Y"][0]
        num = (a * b).sum(-1, keepdims=True)
        den = np.linalg.norm(a, axis=-1, keepdims=True) \
            * np.linalg.norm(b, axis=-1, keepdims=True)
        return {"Out": [num / np.maximum(den, 1e-12)]}

    run_arena(OpTestCase("cos_sim", {"X": [x], "Y": [z]}), ref_cos)
    v = rng.normal(size=(5,)).astype(np.float32)
    run_arena(OpTestCase("clip_by_norm", {"X": [v]}, {"max_norm": 1.0}),
              lambda ins: {"Out": [ins["X"][0] * min(
                  1.0, 1.0 / max(np.linalg.norm(ins["X"][0]), 1e-12))]})


def test_affine_pixel_pad(rng):
    x = rng.normal(size=(2, 4, 4, 6)).astype(np.float32)
    s = rng.normal(size=(6,)).astype(np.float32)
    b = rng.normal(size=(6,)).astype(np.float32)
    run_arena(OpTestCase("affine_channel",
                         {"X": [x], "Scale": [s], "Bias": [b]},
                         weight_slots=("Scale", "Bias"),
                         shape_arg_slots=("X",)),
              lambda ins: {"Out": [ins["X"][0] * s + b]})

    def ref_unshuffle(ins):
        v = ins["X"][0]
        n, h, w, c = v.shape
        return {"Out": [v.reshape(n, h // 2, 2, w // 2, 2, c)
                        .transpose(0, 1, 3, 2, 4, 5)
                        .reshape(n, h // 2, w // 2, 4 * c)]}

    run_arena(OpTestCase("pixel_unshuffle", {"X": [x]},
                         {"downscale_factor": 2}), ref_unshuffle)

    x5 = rng.normal(size=(1, 2, 3, 3, 2)).astype(np.float32)
    run_arena(
        OpTestCase("pad3d", {"X": [x5]},
                   {"paddings": [1, 0, 0, 1, 2, 0], "value": 0.0}),
        lambda ins: {"Out": [np.pad(ins["X"][0],
                                    ((0, 0), (1, 0), (0, 1), (2, 0), (0, 0)))]})


def test_sequence_mask_and_size(rng):
    lens = np.asarray([1, 3, 5], np.int64)

    def ref(ins):
        m = np.zeros((3, 5), np.float32)
        for i, l in enumerate(lens):
            m[i, :l] = 1.0
        return {"Y": [m]}

    run_arena(OpTestCase("sequence_mask", {"X": [lens]},
                         {"maxlen": 5, "out_dtype": "float32"},
                         out_slots=("Y",)), ref)
    x = rng.normal(size=(3, 4)).astype(np.float32)
    run_arena(OpTestCase("size", {"Input": [x]}),
              lambda ins: {"Out": [np.asarray([12], np.int64)]})


def test_max_pool2d_with_index(rng):
    x = rng.normal(size=(2, 6, 6, 3)).astype(np.float32)

    def ref(ins):
        v = ins["X"][0]
        n, h, w, c = v.shape
        oh = ow = h // 2
        out = np.zeros((n, oh, ow, c), np.float32)
        mask = np.zeros((n, oh, ow, c), np.int32)
        for b in range(n):
            for i in range(oh):
                for j in range(ow):
                    for ch in range(c):
                        win = v[b, 2 * i:2 * i + 2, 2 * j:2 * j + 2, ch]
                        k = int(np.argmax(win))
                        dh, dw = divmod(k, 2)
                        out[b, i, j, ch] = win[dh, dw]
                        mask[b, i, j, ch] = (2 * i + dh) * w + (2 * j + dw)
        return {"Out": [out], "Mask": [mask]}

    run_arena(OpTestCase("max_pool2d_with_index", {"X": [x]},
                         {"ksize": [2, 2], "strides": [2, 2],
                          "paddings": [0, 0]},
                         out_slots=("Out", "Mask")), ref)


def test_box_clip(rng):
    boxes = (rng.uniform(-20, 120, size=(2, 5, 4))).astype(np.float32)
    im_info = np.asarray([[50.0, 60.0, 1.0], [100.0, 80.0, 1.0]], np.float32)

    def ref(ins):
        b = ins["Input"][0].copy()
        for i, (h, w, _) in enumerate(im_info):
            b[i, :, 0] = np.clip(b[i, :, 0], 0, w - 1)
            b[i, :, 1] = np.clip(b[i, :, 1], 0, h - 1)
            b[i, :, 2] = np.clip(b[i, :, 2], 0, w - 1)
            b[i, :, 3] = np.clip(b[i, :, 3], 0, h - 1)
        return {"Output": [b]}

    run_arena(OpTestCase("box_clip", {"Input": [boxes], "ImInfo": [im_info]},
                         out_slots=("Output",),
                         shape_arg_slots=("Input",)), ref)


def test_matrix_nms_suppresses_duplicates(rng):
    """Two near-identical boxes: the lower-scored one's score must decay
    hard; a distant box must keep its score."""
    boxes = np.asarray([[
        [0, 0, 10, 10],
        [0.5, 0.5, 10.5, 10.5],  # heavy overlap with box 0
        [50, 50, 60, 60],        # disjoint
    ]], np.float32)
    scores = np.asarray([[[0.9, 0.8, 0.7]]], np.float32)  # one class
    from paddle_lite_tpu.core.builder import GraphBuilder
    from paddle_lite_tpu.core.executor import build_callable, stage_weights

    b = GraphBuilder("mnms")
    bb = b.input("BBoxes", (1, 3, 4))
    sc = b.input("Scores", (1, 1, 3))
    out = b.op("matrix_nms", {"BBoxes": [bb], "Scores": [sc]},
               attrs={"score_threshold": 0.0, "post_threshold": 0.0,
                      "keep_top_k": 3, "use_gaussian": False},
               shape_args=[bb, sc])[0]
    b.mark_output(out)
    g = b.build()
    res = np.asarray(build_callable(g)(stage_weights(g), {
        "BBoxes": boxes, "Scores": scores})[g.outputs[0]])[0]
    # rows: (class, score, x1, y1, x2, y2), sorted by decayed score
    assert res[0, 1] == pytest.approx(0.9, abs=1e-6)      # top box unsuppressed
    assert res[1, 1] == pytest.approx(0.7, abs=1e-6)      # disjoint box intact
    assert res[2, 1] < 0.25                               # duplicate decayed


def test_grid_sampler_identity(rng):
    x = rng.normal(size=(1, 4, 4, 2)).astype(np.float32)
    ys, xs = np.meshgrid(np.linspace(-1, 1, 4), np.linspace(-1, 1, 4),
                         indexing="ij")
    grid = np.stack([xs, ys], -1)[None].astype(np.float32)
    run_arena(
        OpTestCase("grid_sampler", {"X": [x], "Grid": [grid]},
                   {"align_corners": True}, out_slots=("Output",),
                   atol=1e-4),
        lambda ins: {"Output": [ins["X"][0]]})


def test_bitwise(rng):
    a = rng.integers(0, 256, (4,)).astype(np.int32)
    b = rng.integers(0, 256, (4,)).astype(np.int32)
    run_arena(OpTestCase("bitwise_and", {"X": [a], "Y": [b]}),
              lambda ins: {"Out": [a & b]})
    run_arena(OpTestCase("bitwise_or", {"X": [a], "Y": [b]}),
              lambda ins: {"Out": [a | b]})
    run_arena(OpTestCase("bitwise_xor", {"X": [a], "Y": [b]}),
              lambda ins: {"Out": [a ^ b]})
    run_arena(OpTestCase("bitwise_not", {"X": [a]}),
              lambda ins: {"Out": [~a]})


def test_seeded_randoms_are_deterministic():
    from paddle_lite_tpu.core.builder import GraphBuilder
    from paddle_lite_tpu.core.executor import build_callable, stage_weights

    for op_type in ("uniform_random", "gaussian_random"):
        b = GraphBuilder(op_type)
        out = b.op(op_type, {}, attrs={"shape": [3, 4], "seed": 7},
                   shape_args=[])[0]
        b.mark_output(out)
        g = b.build()
        r1 = np.asarray(build_callable(g)(stage_weights(g), {})[g.outputs[0]])
        r2 = np.asarray(build_callable(g)(stage_weights(g), {})[g.outputs[0]])
        assert r1.shape == (3, 4)
        np.testing.assert_array_equal(r1, r2)
