"""Goldilocks quadratic extension GF(p^2) = GF(p)[x] / (x^2 - 7).

Reference-parity role: boojum's `GoldilocksExt2` (the challenge field for the
FRI/permutation arguments of the future prover; SURVEY.md §2.3 lists the
2-word extension as part of the layer-0 substrate).  Non-residue W = 7 —
the standard Goldilocks extension used across the plonky2/boojum family.

Elements are pairs (c0, c1) of base-field GF vectors: a = c0 + c1*x.
All ops batch-parallel, built on ops/gf.py.
"""

from __future__ import annotations

import dataclasses

import jax

from . import gf
from .gf import GF

W_NONRESIDUE = 7


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class GF2:
    c0: GF
    c1: GF

    def tree_flatten(self):
        return (self.c0, self.c1), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    @property
    def shape(self):
        return self.c0.shape


def from_base(c0: GF) -> GF2:
    return GF2(c0, gf.zeros(c0.shape))


def zeros(shape=()) -> GF2:
    return GF2(gf.zeros(shape), gf.zeros(shape))


def ones(shape=()) -> GF2:
    return GF2(gf.ones(shape), gf.zeros(shape))


def add(a: GF2, b: GF2) -> GF2:
    return GF2(gf.add(a.c0, b.c0), gf.add(a.c1, b.c1))


def sub(a: GF2, b: GF2) -> GF2:
    return GF2(gf.sub(a.c0, b.c0), gf.sub(a.c1, b.c1))


def mul(a: GF2, b: GF2) -> GF2:
    """(a0 + a1 x)(b0 + b1 x) = a0b0 + W a1b1 + (a0b1 + a1b0) x."""
    t0 = gf.mul(a.c0, b.c0)
    t1 = gf.mul(a.c1, b.c1)
    c0 = gf.add(t0, gf.mul_const(t1, W_NONRESIDUE))
    # Karatsuba for the cross term: (a0+a1)(b0+b1) - t0 - t1
    cross = gf.mul(gf.add(a.c0, a.c1), gf.add(b.c0, b.c1))
    c1 = gf.sub(gf.sub(cross, t0), t1)
    return GF2(c0, c1)


def square(a: GF2) -> GF2:
    return mul(a, a)


def inv(a: GF2) -> GF2:
    """1 / (c0 + c1 x) = (c0 - c1 x) / (c0^2 - W c1^2)."""
    norm = gf.sub(gf.square(a.c0), gf.mul_const(gf.square(a.c1), W_NONRESIDUE))
    ninv = gf.inv(norm)
    return GF2(gf.mul(a.c0, ninv), gf.neg(gf.mul(a.c1, ninv)))


def equal(a: GF2, b: GF2):
    return gf.equal(a.c0, b.c0) & gf.equal(a.c1, b.c1)


class gf2_ref:
    """host mirror (pairs of python ints)."""

    P = gf.MODULUS

    @staticmethod
    def mul(a, b):
        a0, a1 = a
        b0, b1 = b
        P = gf.MODULUS
        return (
            (a0 * b0 + W_NONRESIDUE * a1 * b1) % P,
            (a0 * b1 + a1 * b0) % P,
        )

    @staticmethod
    def inv(a):
        a0, a1 = a
        P = gf.MODULUS
        norm = (a0 * a0 - W_NONRESIDUE * a1 * a1) % P
        ninv = pow(norm, P - 2, P)
        return (a0 * ninv % P, (P - a1) * ninv % P)
