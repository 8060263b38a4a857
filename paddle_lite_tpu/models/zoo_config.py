"""Measured per-model serving configs — the zoo's "fast plan IS the default
plan" registry.

The reference ships per-SoC tuned configs next to its model zoo (its
`lite/demo` configs pick kernel/precision per target); here the analog is a
per-model `QuantConfig` whose every non-default field is backed by an
on-device A/B committed under `docs/`:

- island_dtype: better of {float32, bfloat16} from the round-3 full
  re-measurement sweep (`docs/bench_rows_r3.jsonl`).
- quant_depthwise=False for DBNet: the round-3 ablation
  (`docs/mnv3_ablate_r3.json`) showed int8 depthwise is a net LOSS on
  dw-heavy trunks (the VPU has no int8 MAC, so int8 dw pays int32
  multiplies plus quant-boundary traffic); the DBNet sweep
  (`docs/dbnet_dw_r3.json`) measured dw=float at 1,830 items/s vs 1,632
  for dw=int8 — +12%, lifting DBNet to 1.27x its fp32 baseline.
  MobileNetV1 keeps dw quantized: there the ALL-int8 trunk wins by 2.3x
  (BASELINE.md "Note on autotuning methodology" — boundary traffic dwarfs
  the per-op effect when the neighbors are int8 1x1 convs at MNv1 widths).

`recommended_quant(model)` is consumed by tools/benchmark (island "auto"),
the examples, and anyone serving a zoo model; explicit kwargs override.
"""

from __future__ import annotations

from ..quant.quantize_pass import QuantConfig

# model name (as resolve_builder spells it) -> measured non-default fields
RECOMMENDED: dict = {
    "mobilenet_v1": {},                             # fp32 islands, all-int8
    "resnet": {},                                   # fp32 islands
    "mobilenet_v3": {},                             # fp32 islands (parity note)
    "ssd": {"island_dtype": "bfloat16"},
    # with dw unquantized the bf16-island edge disappears (1,845 fp32
    # islands vs 1,830 bf16 — the official r3 re-measure row); fp32 islands
    # + dw=float is the measured best
    "ppocr_det": {"quant_depthwise": False},
    "dbnet": {"quant_depthwise": False},
    "ppocr_rec": {"island_dtype": "bfloat16"},
    "crnn": {"island_dtype": "bfloat16"},
    # long-strip recognition (T=400, hidden=64), serve at b<=16 — measured
    # int8 8,489 vs fp32 6,025 lines/s (1.41x, docs/crnn_long_r5.json).
    # This config was also the bigru Pallas kernel's last-stand A/B: its
    # one standalone win region measured a TIE in-model, so the kernel was
    # deleted and the scan runs XLA everywhere.
    "ppocr_rec_long": {"island_dtype": "bfloat16"},
    "crnn_long": {"island_dtype": "bfloat16"},
    "ernie_tiny": {"island_dtype": "bfloat16"},
}


def recommended_quant(model: str, **overrides) -> QuantConfig:
    """The measured-best ``QuantConfig`` for a zoo model (see RECOMMENDED);
    unknown models get the plain defaults.  ``overrides`` win."""
    kw = dict(RECOMMENDED.get(model, {}))
    kw.update(overrides)
    return QuantConfig(**kw)
