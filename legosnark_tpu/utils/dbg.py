"""Debug printing rails — `cpdbg` parity.

The reference hard-disables its debug printers with `#define NO_CPDBG`
(`/root/reference/src/utils/dbgutil.h:10,14-19`). Here the same rail is
a module flag; when enabled, values (field limbs, points, Fq12) print
as canonical integers via the host codec.
"""
from __future__ import annotations

import os

import numpy as np

from ..fields import limb as fl
from ..curve import bn254

ENABLED = bool(int(os.environ.get("LEGOSNARK_CPDBG", "0")))


def print_fr(label: str, v_mont) -> None:
    if not ENABLED:
        return
    v = np.asarray(v_mont)
    flat = v.reshape(-1, v.shape[-1])
    vals = [bn254.FR.from_mont_limbs(x) for x in flat[:8]]
    print(f"[cpdbg] {label}: {vals}{' ...' if flat.shape[0] > 8 else ''}")


def print_point(label: str, p) -> None:
    if not ENABLED:
        return
    from ..curve.group import g1_to_oracle
    try:
        print(f"[cpdbg] {label}: {g1_to_oracle(p)}")
    except Exception:
        print(f"[cpdbg] {label}: <unprintable point batch "
              f"shape={np.asarray(p.x).shape}>")


def print_matrix(label: str, m_mont) -> None:
    if not ENABLED:
        return
    m = np.asarray(m_mont)
    print(f"[cpdbg] {label}: matrix shape {m.shape[:-1]}")
    for row in m[:4]:
        print("   ", [bn254.FR.from_mont_limbs(x) for x in row[:4]])
