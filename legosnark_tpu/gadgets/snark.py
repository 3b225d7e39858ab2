"""Commit-and-prove input formatting — the `CPInputFmt` flow.

TPU-native equivalent of the reference's Snark/CPSnark input plumbing
(`/root/reference/src/gadgets/snark.h:47-97`):

  * `CPPIn {publicSlot, commSlot}` — the prover's view: public inputs
    plus full commitment openings (`snark.h:47-53`).
  * `CPVIn {publicIn, commIn}` — the verifier's view: public inputs
    plus bare commitments (`snark.h:55-62`).
  * `CPInputFmt::init / init_no_pub` — commit a vector-of-vectors under
    a shared `CommScheme` and split the two views (`snark.h:65-82`).

The abstract `Snark` base class (`snark.h:12-42`) dissolves into the
functional keygen/prove/verify module APIs of each gadget (SURVEY §7);
what remains here is the shared input flow those gadgets consume, built
on prototools.commit (the Pedersen CommScheme with knowledge legs).
"""
from __future__ import annotations

from typing import NamedTuple, Any, Sequence, Optional

import numpy as np

from ..prototools import commit as cs
from ..utils import rand as lrand


class CPPIn(NamedTuple):
    """Prover input bundle (`snark.h:47-53`)."""

    public_slot: Any                 # tuple of public Fr arrays [L, m]
    comm_slot: Sequence[cs.CommOut]  # full openings


class CPVIn(NamedTuple):
    """Verifier input bundle (`snark.h:55-62`)."""

    public_in: Any                   # tuple of public Fr arrays
    comm_in: Sequence[cs.Comm]       # bare commitments


def init(ck: cs.CommitmentKey, public: Sequence, vectors: Sequence,
         rng: Optional[np.random.Generator] = None):
    """Commit every vector (Montgomery [L, m]) and split prover/verifier
    views (`CPInputFmt::init`, `snark.h:76-82`). With an rng, each
    commitment gets fresh uniform blinding randomness; without, r = 0
    (the reference's behavior)."""
    outs = []
    for v in vectors:
        r = lrand.rand_fr_mont(rng, 1) if rng is not None else None
        outs.append(cs.commit(ck, v, r_mont=r))
    pin = CPPIn(tuple(public), tuple(outs))
    vin = CPVIn(tuple(public), tuple(o.c for o in outs))
    return pin, vin


def init_no_pub(ck: cs.CommitmentKey, vectors: Sequence,
                rng: Optional[np.random.Generator] = None):
    """`CPInputFmt::init_no_pub` (`snark.h:68-74`)."""
    return init(ck, (), vectors, rng)
