"""Variable-length OCR strip serving: LengthBucketer + ContinuousBatcher.

Recognition strips arrive at arbitrary widths (aspect-preserving crops of
detected text lines).  Fixed-shape TPU programs cannot take ragged
batches, so the serving stack pads each strip UP to a width bucket and
routes it to a per-(width, batch)-bucket predictor — the dense-batch
absorption of the reference's LoD raggedness (SURVEY §5.7), both halves:
length bucketing (`runtime/length_bucketer.py`, r5) over count bucketing
(`runtime/batcher.py`).  CTC decoding is pad-robust (trailing background
columns decode to blanks), which is why width-padding is semantically
safe for CRNN — see the length_bucketer docstring for the mask seam that
models WITHOUT pad-robust heads need.

Run: PYTHONPATH=/root/repo:/root/.axon_site python examples/serve_ocr_strips.py
"""

from __future__ import annotations

import numpy as np

from paddle_lite_tpu.models.ppocr import build_rec
from paddle_lite_tpu.runtime.batcher import BatcherConfig
from paddle_lite_tpu.runtime.length_bucketer import LengthBucketer
from paddle_lite_tpu.runtime.predictor import Predictor
from paddle_lite_tpu.tools.opt import optimize

HEIGHT = 32
CHARSET = "abcdefghijklmnopqrstuvwxyz0123456789"


def make_server(width_buckets=(64, 128, 256), num_chars=len(CHARSET),
                hidden: int = 48) -> LengthBucketer:
    """Per-(width, batch)-bucket CRNN predictors behind a LengthBucketer."""

    def factory(batch: int, width: int) -> Predictor:
        g = build_rec(batch=batch, width=width, hidden=hidden,
                      num_chars=num_chars, seed=0)
        optimize(g)
        return Predictor(g)

    return LengthBucketer(
        factory,
        length_buckets=width_buckets,
        seq_axes={"image": 1},  # per-request strips are (H, W, 3)
        batcher_config=BatcherConfig(buckets=(1, 2, 4, 8), max_wait_ms=3.0),
    )


def decode(outputs: dict) -> str:
    ids = next(v for v in outputs.values() if v.ndim == 1)
    return "".join(CHARSET[int(c) % len(CHARSET)] for c in ids if c >= 0)


def main() -> None:
    server = make_server()
    rng = np.random.default_rng(0)
    widths = [50, 90, 120, 200, 60]  # ragged arrivals
    futures = [
        server.submit({"image": rng.normal(
            size=(HEIGHT, w, 3)).astype(np.float32)})
        for w in widths
    ]
    for w, f in zip(widths, futures):
        text = decode(f.result(timeout=600))
        print(f"strip w={w:4d} -> {text!r}")
    print("stats:", server.stats)
    server.close()


if __name__ == "__main__":
    main()
