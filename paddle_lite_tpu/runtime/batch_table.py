"""Per-model best-batch tables for the continuous batcher.

Measured on-device items/s per bucket size (the model×batch analog of the
``.autotune/gemm.json`` kernel table): int8's advantage needs compute-bound
batches (MobileNetV1 int8 loses to fp32 at b8, wins 2× at b64 —
BASELINE.md batch-size note), and some models peak *below* the largest
bucket (DBNet at b4), so the batcher should neither under- nor over-batch.

``python -m paddle_lite_tpu.tools.batch_tune --model mobilenet_v1`` measures
and stores the table; :class:`runtime.batcher.ContinuousBatcher` consumes it
via ``BatcherConfig(model=...)``.
"""

from __future__ import annotations

import json
import os
from typing import Dict, Optional

DEFAULT_DIR = os.path.join(os.path.dirname(__file__), "..", "..", ".autotune")


def _path(autotune_dir: Optional[str]) -> str:
    return os.path.join(autotune_dir or DEFAULT_DIR, "batch.json")


def load_table(autotune_dir: Optional[str] = None) -> Dict[str, Dict[str, float]]:
    p = _path(autotune_dir)
    if not os.path.isfile(p):
        return {}
    with open(p) as f:
        return json.load(f)


def save_entry(model: str, table: Dict[int, float],
               autotune_dir: Optional[str] = None) -> None:
    p = _path(autotune_dir)
    os.makedirs(os.path.dirname(p), exist_ok=True)
    all_t = load_table(autotune_dir)
    all_t[model] = {str(k): float(v) for k, v in table.items()}
    with open(p, "w") as f:
        json.dump(all_t, f, indent=1, sort_keys=True)


def best_bucket(model: str, buckets,
                autotune_dir: Optional[str] = None) -> Optional[int]:
    """Measured-throughput-optimal bucket for `model`; None when no
    measurement exists (caller keeps its default ladder).

    Considers EVERY measured batch, not just the caller's ladder: a
    throughput peak can sit off the power-of-two ladder (r5: ppocr_det
    peaks at b6 = 2,371 items/s between the b8-b10 layout cliff and b4 —
    docs/ppocr_b8_r5.json), and the batcher extends its ladder with the
    returned bucket when missing."""
    entry = load_table(autotune_dir).get(model)
    if not entry:
        return None
    known = {int(k): v for k, v in entry.items()}
    if not known:
        return None
    return max(known, key=known.get)


def bucket_for(model: str, n: int, buckets,
               autotune_dir: Optional[str] = None) -> Optional[int]:
    """Cliff-aware dispatch: the bucket serving ``n`` requests at the
    LOWEST absolute measured latency among buckets >= n.

    XLA's layout assignment is batch-dependent and non-monotone (r5:
    MobileNetV3's b8 program runs in 0.868 ms — FASTER in absolute ms
    than its b4 program's 1.117 ms, docs/mnv3_b4_r5.json; DBNet's b8-b10
    programs are a cliff, docs/ppocr_b8_r5.json), so "smallest bucket
    that fits" can be strictly worse than padding up past a cliff.
    ms(bucket) = bucket / measured_items_per_s.  Returns None when the
    model has no measured entry for any eligible bucket (caller falls
    back to smallest-fit)."""
    entry = load_table(autotune_dir).get(model)
    if not entry:
        return None
    cands = {b: b / float(entry[str(b)])
             for b in buckets if b >= n and str(b) in entry}
    if not cands:
        return None
    return min(cands, key=cands.get)
