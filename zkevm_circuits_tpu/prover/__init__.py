"""Prover layer (SURVEY §2.3 north star): polynomial commitment + STARK.

Built on ops/{ntt,merkle,fri,gf2}: `stark.py` proves that committed trace
columns satisfy a row-parallel transition AIR — the first real (surrogate-
free) proof in the stack.
"""

from .stark import AirSpec, StarkParams, StarkProof, prove, verify  # noqa: F401
from . import pipeline  # noqa: F401
