"""Measure per-model throughput across batcher buckets and store the
best-batch table (``.autotune/batch.json`` — runtime/batch_table.py).

python -m paddle_lite_tpu.tools.batch_tune --model mobilenet_v1 \
    [--buckets 1,2,4,8,16,32,64] [--int8/--fp32]

Runs on the attached device (the TPU in the dev env) with the hardened
iteration-delta method; one bucket at a time.
"""

from __future__ import annotations

import argparse
import json
import os


def main() -> None:
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])

    from ..runtime.batch_table import load_table, save_entry
    from .benchmark import bench_model

    p = argparse.ArgumentParser()
    p.add_argument("--model", required=True)
    p.add_argument("--buckets", default="1,2,4,8,16,32,64")
    p.add_argument("--image-size", type=int, default=224)
    p.add_argument("--seq-len", type=int, default=128)
    p.add_argument("--fp32", action="store_true", help="measure fp32 instead")
    p.add_argument("--autotune-dir", default=None)
    args = p.parse_args()

    table = {}
    for b in (int(x) for x in args.buckets.split(",")):
        r = bench_model(args.model, batch=b, image_size=args.image_size,
                        seq_len=args.seq_len, int8=not args.fp32,
                        with_fp32=args.fp32)
        key = "fp32_items_per_sec" if args.fp32 else "int8_items_per_sec"
        table[b] = r[key]
        print(json.dumps({"bucket": b, "items_per_sec": r[key]}), flush=True)
    # MERGE into the existing entry: re-tuning a subset of buckets must not
    # wipe rows measured at other sizes (the cliff-aware dispatcher and the
    # off-ladder peaks depend on the full table)
    merged = {int(k): float(v)
              for k, v in load_table(args.autotune_dir)
              .get(args.model, {}).items()}
    merged.update(table)
    save_entry(args.model, merged, args.autotune_dir)
    best = max(merged, key=merged.get)
    print(json.dumps({"model": args.model, "best_bucket": best,
                      "table": merged}))


if __name__ == "__main__":
    main()
