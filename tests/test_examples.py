"""Smoke tests for the demo apps (examples/) at toy sizes — the demos are
part of the product surface (reference's ``lite/demo/cxx`` apps), so the
glue they exercise (cv preprocess → predictor → postprocess) must not rot.
"""

import importlib.util
import pathlib

import numpy as np

_EXAMPLES = pathlib.Path(__file__).resolve().parent.parent / "examples"


def _load(name):
    spec = importlib.util.spec_from_file_location(name,
                                                  _EXAMPLES / f"{name}.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_ocr_pipeline_tiny():
    ocr = _load("ocr_pipeline")
    det, rec = ocr.make_pipeline(det_size=160, rec_width=64, rec_batch=2,
                                 hidden=16)
    image = ocr.synthetic_document(320, 480, n_lines=3)
    results = ocr.recognize(det, rec, image, max_boxes=2)
    # random weights: boxes may or may not clear the score threshold, but
    # the pipeline must run end-to-end and produce well-formed results
    assert isinstance(results, list)
    for box, text in results:
        assert box.x2 >= box.x1 and box.y2 >= box.y1
        assert isinstance(text, str)


def test_ssd_detect_tiny():
    demo = _load("detect_ssd")
    pred = demo.make_predictor(image_size=150)
    image = np.random.default_rng(0).integers(
        0, 255, (240, 320, 3)).astype(np.uint8)
    dets = demo.detect(pred, image, score_thresh=0.0)
    for name, score, (x1, y1, x2, y2) in dets:
        assert 0.0 <= score <= 1.0
        assert isinstance(name, str)


def test_serve_ocr_strips_tiny():
    demo = _load("serve_ocr_strips")
    server = demo.make_server(width_buckets=(32, 64), num_chars=10,
                              hidden=16)
    rng = np.random.default_rng(0)
    try:
        futs = [server.submit({"image": rng.normal(
            size=(demo.HEIGHT, w, 3)).astype(np.float32)})
            for w in (20, 40, 60)]
        for f in futs:
            text = demo.decode(f.result(timeout=300))
            assert isinstance(text, str)
        assert server.stats["requests"] == 3
        assert server.stats["padded_tokens"] == (32 - 20) + (64 - 40) + (64 - 60)
    finally:
        server.close()
