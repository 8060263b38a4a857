"""Tests for the RCNN/sequence long-tail ops: generate_proposals, gru_unit,
sequence_expand/concat, beam_search, split/merge_lod_tensor."""

import numpy as np

from paddle_lite_tpu.testing import OpTestCase, run_arena


def test_gru_unit(rng):
    b, h = 3, 8
    x = rng.normal(size=(b, 3 * h)).astype(np.float32)
    hp = rng.normal(size=(b, h)).astype(np.float32)
    w = (rng.normal(size=(h, 3 * h)) * 0.1).astype(np.float32)

    def baseline(ins):
        def sig(v):
            return 1.0 / (1.0 + np.exp(-v))

        g = ins["Input"][0][:, : 2 * h] + ins["HiddenPrev"][0] @ w[:, : 2 * h]
        u, r = sig(g[:, :h]), sig(g[:, h:])
        rh = r * ins["HiddenPrev"][0]
        c = np.tanh(ins["Input"][0][:, 2 * h:] + rh @ w[:, 2 * h:])
        h_new = u * ins["HiddenPrev"][0] + (1.0 - u) * c
        return {"Hidden": [h_new], "ResetHiddenPrev": [rh],
                "Gate": [np.concatenate([u, r], axis=-1)]}

    run_arena(
        OpTestCase("gru_unit",
                   {"Input": [x], "HiddenPrev": [hp], "Weight": [w]},
                   weight_slots=("Weight",),
                   shape_arg_slots=("Input", "HiddenPrev"),
                   out_slots=("Hidden", "ResetHiddenPrev", "Gate"),
                   atol=1e-5),
        baseline,
    )


def test_sequence_expand_and_concat(rng):
    x = rng.normal(size=(2, 1, 4)).astype(np.float32)
    y = rng.normal(size=(2, 5, 4)).astype(np.float32)
    run_arena(
        OpTestCase("sequence_expand", {"X": [x], "Y": [y]}),
        lambda ins: {"Out": [np.broadcast_to(ins["X"][0], (2, 5, 4)).copy()]},
    )

    a = rng.normal(size=(2, 3, 4)).astype(np.float32)
    b = rng.normal(size=(2, 2, 4)).astype(np.float32)
    run_arena(
        OpTestCase("sequence_concat", {"X": [a, b]}),
        lambda ins: {"Out": [np.concatenate(ins["X"], axis=1)]},
    )


def test_beam_search(rng):
    bsz, beam, v = 2, 3, 11
    end_id = 0
    pre_ids = np.array([[4, 0, 7], [5, 6, 0]], np.int32)  # one finished each
    pre_scores = (-rng.random((bsz, beam))).astype(np.float32)
    probs = rng.random((bsz, beam, v)).astype(np.float32)
    probs /= probs.sum(-1, keepdims=True)

    def baseline(ins):
        logp = np.log(np.maximum(probs, 1e-20))
        cand = np.where(
            (pre_ids == end_id)[..., None],
            np.where(np.arange(v) == end_id, 0.0, -np.inf),
            logp,
        ) + pre_scores[..., None]
        flat = cand.reshape(bsz, beam * v)
        idx = np.argsort(-flat, axis=1, kind="stable")[:, :beam]
        top = np.take_along_axis(flat, idx, axis=1).astype(np.float32)
        return {"selected_ids": [(idx % v).astype(np.int32)],
                "selected_scores": [top],
                "parent_idx": [(idx // v).astype(np.int32)]}

    run_arena(
        OpTestCase("beam_search",
                   {"pre_ids": [pre_ids], "pre_scores": [pre_scores],
                    "scores": [probs]},
                   {"end_id": end_id},
                   shape_arg_slots=("pre_ids", "pre_scores", "scores"),
                   out_slots=("selected_ids", "selected_scores",
                              "parent_idx"),
                   atol=1e-5),
        baseline,
    )


def test_split_merge_lod_tensor(rng):
    x = rng.normal(size=(4, 3)).astype(np.float32)
    mask = np.array([1, 0, 1, 0], np.int32)
    m = mask.astype(bool)[:, None]
    run_arena(
        OpTestCase("split_lod_tensor", {"X": [x], "Mask": [mask]},
                   shape_arg_slots=("X",),
                   out_slots=("OutTrue", "OutFalse")),
        lambda ins: {"OutTrue": [np.where(m, x, 0.0)],
                     "OutFalse": [np.where(m, 0.0, x)]},
    )
    t = rng.normal(size=(4, 3)).astype(np.float32)
    f = rng.normal(size=(4, 3)).astype(np.float32)
    run_arena(
        OpTestCase("merge_lod_tensor",
                   {"Mask": [mask], "InTrue": [t], "InFalse": [f]},
                   shape_arg_slots=("Mask", "InTrue")),
        lambda ins: {"Out": [np.where(m, t, f)]},
    )


def test_generate_proposals(rng):
    """Structural + numeric check against a numpy replica of the same
    fixed-shape masked pipeline (zero-score slots may order differently
    under top_k ties, so compare only live slots)."""
    import jax.numpy as jnp

    from paddle_lite_tpu.core.registry import OPS
    from paddle_lite_tpu.core.executor import ExecutionContext
    from paddle_lite_tpu.core.ir import OpNode

    n, h, w, a = 2, 4, 4, 3
    total = h * w * a
    pre_n, post_n, nms_t, min_size = 24, 8, 0.7, 4.0
    scores = rng.random((n, h, w, a)).astype(np.float32)
    deltas = (rng.normal(size=(n, h, w, a * 4)) * 0.2).astype(np.float32)
    im = np.array([[64.0, 64.0], [64.0, 64.0]], np.float32)
    # anchors: grid of boxes of varied size
    cy, cx = np.meshgrid(np.arange(h) * 16 + 8, np.arange(w) * 16 + 8,
                         indexing="ij")
    sizes = np.array([8, 16, 32], np.float32)
    anchors = np.stack([
        np.stack([cx - s / 2, cy - s / 2, cx + s / 2, cy + s / 2], -1)
        for s in sizes], axis=2).astype(np.float32)  # (H, W, A, 4)

    op = OpNode("generate_proposals", {}, {},
                {"pre_nms_topN": pre_n, "post_nms_topN": post_n,
                 "nms_thresh": nms_t, "min_size": min_size})
    out = OPS.get("generate_proposals").impls["xla"](
        ExecutionContext(graph=None, platform="cpu"), op,
        {"Scores": [jnp.asarray(scores)], "BboxDeltas": [jnp.asarray(deltas)],
         "ImShape": [jnp.asarray(im)], "Anchors": [jnp.asarray(anchors)]})
    rois = np.asarray(out["RpnRois"][0])
    probs = np.asarray(out["RpnRoiProbs"][0])
    assert rois.shape == (n, post_n, 4) and probs.shape == (n, post_n)

    flat_anchors = anchors.reshape(-1, 4)
    aw = flat_anchors[:, 2] - flat_anchors[:, 0] + 1.0
    ah = flat_anchors[:, 3] - flat_anchors[:, 1] + 1.0
    acx = flat_anchors[:, 0] + aw / 2
    acy = flat_anchors[:, 1] + ah / 2
    for i in range(n):
        s = scores[i].reshape(-1)
        d = deltas[i].reshape(-1, 4)
        order = np.argsort(-s)[: min(pre_n, total)]
        cx2 = d[order, 0] * aw[order] + acx[order]
        cy2 = d[order, 1] * ah[order] + acy[order]
        bw = np.exp(np.minimum(d[order, 2], 4.135)) * aw[order]
        bh = np.exp(np.minimum(d[order, 3], 4.135)) * ah[order]
        x1 = np.clip(cx2 - bw / 2, 0, 63)
        y1 = np.clip(cy2 - bh / 2, 0, 63)
        x2 = np.clip(cx2 + bw / 2, 0, 63)
        y2 = np.clip(cy2 + bh / 2, 0, 63)
        boxes = np.stack([x1, y1, x2, y2], -1)
        sc = np.where(((x2 - x1 + 1) >= min_size) & ((y2 - y1 + 1) >= min_size),
                      s[order], 0.0)
        # greedy NMS over top min(post_n, k)
        k2 = min(post_n, len(sc))
        o2 = np.argsort(-sc)[:k2]
        cand, cs = boxes[o2], sc[o2]
        keep = cs > 0
        for j in range(k2):
            if not keep[j]:
                continue
            for l in range(j + 1, k2):
                xx1 = max(cand[j, 0], cand[l, 0])
                yy1 = max(cand[j, 1], cand[l, 1])
                xx2 = min(cand[j, 2], cand[l, 2])
                yy2 = min(cand[j, 3], cand[l, 3])
                inter = max(xx2 - xx1, 0) * max(yy2 - yy1, 0)
                areaj = (cand[j, 2] - cand[j, 0]) * (cand[j, 3] - cand[j, 1])
                areal = (cand[l, 2] - cand[l, 0]) * (cand[l, 3] - cand[l, 1])
                iou = inter / max(areaj + areal - inter, 1e-10)
                if iou > nms_t:
                    keep[l] = False
        want_s = np.sort(np.where(keep, cs, 0.0))[::-1]
        live = want_s > 0
        got_s = probs[i][: len(want_s)]
        np.testing.assert_allclose(got_s[live], want_s[live], rtol=1e-4,
                                   atol=1e-5)
        # live rois must match the surviving boxes (same score order)
        want_boxes = cand[np.argsort(-np.where(keep, cs, 0.0),
                                     kind="stable")][live.nonzero()[0]]
        np.testing.assert_allclose(rois[i][live.nonzero()[0]], want_boxes,
                                   rtol=1e-4, atol=1e-4)
