"""Pure-python mirror of queue sponge chains (host/test use)."""

from __future__ import annotations

from typing import List, Sequence

from ..ops.gf import MODULUS as P
from . import poseidon2_ref

RATE = poseidon2_ref.RATE
WIDTH = poseidon2_ref.WIDTH


def full_state_push(state: Sequence[int], encoding: Sequence[int]) -> List[int]:
    assert len(state) == WIDTH and len(encoding) == RATE
    s = [x % P for x in encoding] + [x % P for x in state[RATE:]]
    return poseidon2_ref.permutation(s)


def narrow_push(tail: Sequence[int], encoding: Sequence[int]) -> List[int]:
    assert len(tail) == 4
    enc = [x % P for x in encoding]
    enc += [0] * ((-len(enc)) % RATE)
    s = [0] * RATE + list(tail)
    for i in range(0, len(enc), RATE):
        s = poseidon2_ref.permutation(enc[i : i + RATE] + s[RATE:])
    return s[:4]


def simulate_chain(init: Sequence[int], encodings, execute=None) -> List[List[int]]:
    states = [list(init)]
    n = len(encodings)
    if execute is None:
        execute = [True] * n
    for enc, ex in zip(encodings, execute):
        if not ex:
            states.append(list(states[-1]))
        elif len(init) == WIDTH:
            states.append(full_state_push(states[-1], enc))
        else:
            states.append(narrow_push(states[-1], enc))
    return states
