"""Collective-schedule auditing from compiled HLO.

The multi-chip scaling claim (docs/performance.md "Weak scaling") rests on
the FedAvg round program being embarrassingly parallel over the client
axis: local training partitions cleanly and the ONLY cross-device traffic
is the model-delta all-reduce plus scalar metric reductions. Round 3
discovered the opposite failure mode the hard way — the GSPMD
``in_shardings`` formulation silently compiled SIX per-step all-gathers of
client-folded conv tensors. This module turns that discovery into an
invariant: compile the real superstep over a virtual mesh, inventory every
collective op in the optimized HLO, and assert the schedule
(tests/test_collective_audit.py keeps it CI-enforced; VERDICT r3 #4).
"""

from __future__ import annotations

import re
from typing import List, NamedTuple

# match the HLO *opcode* (instructions are named after the JAX primitive,
# e.g. `%psum.7 = f32[] all-reduce(...)`; XLA may combine several psums
# into ONE tuple-typed all-reduce), including async -start forms
COLLECTIVE_RE = re.compile(
    r"=\s*(\([^)]*\)|[^\s(]+)\s+(all-reduce|all-gather|reduce-scatter"
    r"|collective-permute|all-to-all)(?:-start)?\(")
TYPE_RE = re.compile(r"(f64|f32|bf16|f16|s32|u32|s64|u64|pred|s8|u8)"
                     r"\[([\d,]*)\]")

_WIDTH = {"f64": 8, "s64": 8, "u64": 8, "f32": 4, "s32": 4, "u32": 4,
          "bf16": 2, "f16": 2, "pred": 1, "s8": 1, "u8": 1}


class Collective(NamedTuple):
    kind: str      # all-reduce | all-gather | ...
    out_type: str  # HLO result type text (may be a tuple type)
    nbytes: int    # total payload bytes of the result


def type_bytes(hlo_type: str) -> int:
    """Total bytes of an HLO type, incl. tuple types like (f32[8], ...)."""
    total = 0
    for m in TYPE_RE.finditer(hlo_type):
        n = 1
        for d in m.group(2).split(","):
            if d:
                n *= int(d)
        total += n * _WIDTH[m.group(1)]
    return total


def collective_inventory(hlo_text: str) -> List[Collective]:
    """Every collective op in an optimized-HLO dump, with payload sizes."""
    out = []
    for m in COLLECTIVE_RE.finditer(hlo_text):
        out_type, kind = m.group(1), m.group(2)
        out.append(Collective(kind, out_type, type_bytes(out_type)))
    return out
