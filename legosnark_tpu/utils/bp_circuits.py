"""BulletProofs/Bootle circuit size-metadata parser.

Port of `/root/reference/src/utils/bp_circuits.{h,cc}`: reads the
`=CIRC=` text format (n_gates, n_constraints, n_bits, then per-row
nonzero counts for WL/WR/WO). Used only for sizing experiments — no
gadget consumes it (SURVEY §2.1 row 7) — kept for capability parity.
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import List


@dataclass
class BPCircuit:
    """`bp_circuits.h:12-30`."""

    n_gates: int = 0
    n_constraints: int = 0
    n_bits: int = 0
    wl_row_nnz: List[int] = field(default_factory=list)
    wr_row_nnz: List[int] = field(default_factory=list)
    wo_row_nnz: List[int] = field(default_factory=list)

    @property
    def total_nnz(self) -> int:
        return (sum(self.wl_row_nnz) + sum(self.wr_row_nnz)
                + sum(self.wo_row_nnz))


def parse_next(lines, i: int):
    """`parseNextBPCirc` (`bp_circuits.cc:36-98`): parse one `=CIRC=`
    block starting at line index i; returns (circuit, next_index) or
    (None, len) at EOF."""
    n = len(lines)
    while i < n and lines[i].strip() != "=CIRC=":
        i += 1
    if i >= n:
        return None, n
    i += 1
    header = lines[i].split()
    circ = BPCircuit(n_gates=int(header[0]), n_constraints=int(header[1]),
                     n_bits=int(header[2]) if len(header) > 2 else 0)
    i += 1
    for attr in ("wl_row_nnz", "wr_row_nnz", "wo_row_nnz"):
        counts = [int(tok) for tok in lines[i].split()]
        setattr(circ, attr, counts)
        i += 1
    return circ, i


def read_from_file(path: str) -> List[BPCircuit]:
    """`BPCircuit::readFromFile` (`bp_circuits.cc:100-115`)."""
    with open(path) as fh:
        lines = fh.read().splitlines()
    out, i = [], 0
    while True:
        circ, i = parse_next(lines, i)
        if circ is None:
            return out
        out.append(circ)
