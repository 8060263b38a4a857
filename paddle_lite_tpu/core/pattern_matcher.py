"""Declarative subgraph pattern matching for fusion passes.

Analog of ``lite/core/mir/pattern_matcher.{h,cc}`` (PMPattern/PMNode) and the
high-level ``FuseBase`` API (``pattern_matcher_high_api.h``): fusion passes
describe a chain of ops and the matcher enumerates occurrences.  The
reference matches arbitrary DAG patterns; the fusers actually shipped all
match *linear producer→consumer chains with single-use intermediates*, so
that is what this implementation supports — it keeps every fusion pass a few
lines and trivially correct.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Dict, List, Optional, Sequence

from .ir import Graph, OpNode

Predicate = Callable[[OpNode], bool]


@dataclasses.dataclass
class OpPattern:
    """One position in a chain: op type(s) + optional extra predicate."""

    op_types: Sequence[str]
    where: Optional[Predicate] = None

    def matches(self, op: OpNode) -> bool:
        if op.op_type not in self.op_types:
            return False
        return True if self.where is None else self.where(op)


def match_chain(
    graph: Graph, patterns: Sequence[OpPattern]
) -> List[List[OpNode]]:
    """Find chains ``op0 -> op1 -> ... -> opN`` where each opK's first output
    feeds only opK+1 (single use, not a graph output).  Returns matched op
    lists; matches never share interior ops (greedy, first-come)."""
    chains: List[List[OpNode]] = []
    claimed: set = set()
    for op in graph.topological_order():
        if not patterns[0].matches(op) or id(op) in claimed:
            continue
        chain = [op]
        cur = op
        ok = True
        for pat in patterns[1:]:
            outs = cur.output_names()
            if len(outs) < 1:
                ok = False
                break
            out_var = graph.vars[outs[0]]
            if (
                len(out_var.use_ops) != 1
                or out_var.name in graph.outputs
            ):
                ok = False
                break
            nxt = out_var.use_ops[0]
            if not pat.matches(nxt) or id(nxt) in claimed:
                ok = False
                break
            chain.append(nxt)
            cur = nxt
        if ok:
            chains.append(chain)
            claimed.update(id(o) for o in chain)
    return chains


def op_of(types: Sequence[str] | str, where: Optional[Predicate] = None) -> OpPattern:
    if isinstance(types, str):
        types = (types,)
    return OpPattern(op_types=tuple(types), where=where)
