"""Operator registry — analog of ``lite/core/op_registry.{h,cc}``.

The reference registers, per op, one C++ ``OpLite`` subclass (shape checking
and param binding, ``lite/operators/``) and N ``KernelLite`` implementations
keyed by (target, precision, layout) (``lite/kernels/<backend>/``).  Here an
op registers:

- ``infer_shape(attrs, in_shapes) -> out_shapes`` — the ``InferShape`` analog
  (runs at graph-build time; shapes are static under jit), and
- one or more *implementations* keyed by a kernel tag ("xla" is the default
  pure-jnp/lax lowering; "pallas" is a hand kernel).  The kernel-pick pass
  (``paddle_lite_tpu.passes.kernel_pick``) stamps the chosen tag on the op
  node, mirroring ``static_kernel_pick_pass``.

Implementations are pure functions ``impl(ctx, op, inputs: dict[str, list
[Array]]) -> dict[str, list[Array]]`` traced by the executor into one jitted
program; they must be jit-safe (no data-dependent Python control flow).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, List, Optional, Sequence, Tuple

ShapeList = List[Tuple[int, ...]]
InferShapeFn = Callable[..., Any]
ImplFn = Callable[..., Dict[str, list]]


@dataclasses.dataclass
class OpDef:
    name: str
    infer_shape: Optional[InferShapeFn]
    impls: Dict[str, ImplFn] = dataclasses.field(default_factory=dict)
    # slots documented for importers/tools (not enforced)
    input_slots: Sequence[str] = ()
    output_slots: Sequence[str] = ("Out",)

    def impl_for(self, kernel: Optional[str]) -> ImplFn:
        if kernel and kernel in self.impls:
            return self.impls[kernel]
        if "xla" in self.impls:
            return self.impls["xla"]
        # single-impl ops
        return next(iter(self.impls.values()))


class OpRegistry:
    """Global op table (``KernelRegistry``/``OpLiteRegistry`` analog)."""

    def __init__(self) -> None:
        self._ops: Dict[str, OpDef] = {}

    def register(
        self,
        name: str,
        infer_shape: Optional[InferShapeFn] = None,
        input_slots: Sequence[str] = (),
        output_slots: Sequence[str] = ("Out",),
    ) -> OpDef:
        if name not in self._ops:
            self._ops[name] = OpDef(
                name=name,
                infer_shape=infer_shape,
                input_slots=input_slots,
                output_slots=output_slots,
            )
        elif infer_shape is not None:
            self._ops[name].infer_shape = infer_shape
        return self._ops[name]

    def kernel(self, op_name: str, kernel: str = "xla"):
        """Decorator: register an implementation for `op_name` under `kernel`.

        ``REGISTER_LITE_KERNEL(op, target, precision, layout, cls, alias)``
        analog — the (target, precision, layout) key collapses to the kernel
        tag because precision dispatch happens *inside* impls (they read the
        node's quant metadata), which is what lets XLA fuse across the
        int8/fp boundary instead of going through separate kernel objects.
        """

        def deco(fn: ImplFn) -> ImplFn:
            self.register(op_name).impls[kernel] = fn
            return fn

        return deco

    def shape_fn(self, op_name: str):
        """Decorator: register the InferShape function for `op_name`."""

        def deco(fn: InferShapeFn) -> InferShapeFn:
            self.register(op_name, infer_shape=fn)
            return fn

        return deco

    def get(self, name: str) -> OpDef:
        if name not in self._ops:
            raise KeyError(
                f"op {name!r} is not registered; known: {sorted(self._ops)}"
            )
        return self._ops[name]

    def __contains__(self, name: str) -> bool:
        return name in self._ops

    def names(self) -> List[str]:
        return sorted(self._ops)


OPS = OpRegistry()
