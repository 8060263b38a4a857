"""Arena — op-level test harness (``lite/core/arena/framework.{h,cc}``).

The reference pattern: a ``TestCase`` supplies op attrs/inputs and a
``RunBaseline`` reference implementation; the ``Arena`` instantiates every
registered kernel matching the place under test and compares outputs within
a tolerance.  Here the "places" collapse to kernel tags ("xla", "pallas";
Pallas in interpreter mode off-TPU is the mock backend), and the baseline is
a plain numpy function.

Usage:

    case = OpTestCase(
        op_type="softmax",
        inputs={"X": [x]},
        attrs={"axis": -1},
        out_slots=("Out",),
    )
    run_arena(case, baseline=lambda ins: {"Out": [scipy_softmax(...)]})
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, List, Optional, Sequence

import numpy as np

from ..core.builder import GraphBuilder
from ..core.executor import build_callable, stage_weights
from ..core.ir import Graph
from ..core.registry import OPS
from ..core.types import Precision


@dataclasses.dataclass
class OpTestCase:
    op_type: str
    inputs: Dict[str, List[np.ndarray]]  # slot -> arrays (weights as inputs)
    attrs: Dict[str, Any] = dataclasses.field(default_factory=dict)
    out_slots: Sequence[str] = ("Out",)
    weight_slots: Sequence[str] = ()  # slots to register as weights
    shape_arg_slots: Optional[Sequence[str]] = None  # infer_shape arg order
    atol: float = 1e-5
    rtol: float = 1e-4


def _build(case: OpTestCase) -> Graph:
    b = GraphBuilder(f"arena_{case.op_type}")
    ins: Dict[str, List[str]] = {}
    shape_args: List[str] = []
    order = case.shape_arg_slots or list(case.inputs)
    names_by_slot: Dict[str, List[str]] = {}
    for slot, arrays in case.inputs.items():
        names = []
        for i, a in enumerate(arrays):
            name = f"{slot.lower()}_{i}"
            if slot in case.weight_slots:
                b.weight(name, np.asarray(a))
            else:
                prec = {np.dtype(np.int32): Precision.INT32,
                        np.dtype(np.int64): Precision.INT64}.get(
                            np.asarray(a).dtype, Precision.FP32)
                b.input(name, np.asarray(a).shape, precision=prec)
            names.append(name)
        ins[slot] = names
        names_by_slot[slot] = names
    for slot in order:
        shape_args.extend(names_by_slot.get(slot, []))
    outs = b.op(case.op_type, ins, attrs=case.attrs, shape_args=shape_args,
                out_slots=tuple(case.out_slots))
    b.mark_output(*outs)
    return b.build()


def run_arena(
    case: OpTestCase,
    baseline: Callable[[Dict[str, List[np.ndarray]]], Dict[str, List[np.ndarray]]],
    kernels: Optional[Sequence[str]] = None,
) -> Dict[str, Dict[str, np.ndarray]]:
    """Run every registered kernel of the op against `baseline`; assert
    closeness; return per-kernel outputs."""
    opdef = OPS.get(case.op_type)
    kernels = list(kernels or opdef.impls.keys())
    expected = baseline(case.inputs)

    g = _build(case)
    feed = {
        f"{slot.lower()}_{i}": np.asarray(a)
        for slot, arrays in case.inputs.items()
        if slot not in case.weight_slots
        for i, a in enumerate(arrays)
    }
    results: Dict[str, Dict[str, np.ndarray]] = {}
    for kernel in kernels:
        for op in g.ops:
            op.attrs["kernel"] = kernel
        out = build_callable(g)(stage_weights(g), feed)
        got_by_slot: Dict[str, np.ndarray] = {}
        idx = 0
        for slot in case.out_slots:
            n_slot = len(g.ops[0].outputs.get(slot, []))
            for j in range(n_slot):
                name = g.outputs[idx]
                got = np.asarray(out[name])
                want = np.asarray(expected[slot][j])
                np.testing.assert_allclose(
                    got, want, rtol=case.rtol, atol=case.atol,
                    err_msg=f"kernel={kernel} slot={slot}[{j}]")
                got_by_slot[f"{slot}[{j}]"] = got
                idx += 1
        results[kernel] = got_by_slot
    return results
