"""Complete projective EC formulas over an abstract row-field implementation.

Renes–Costello–Batina Algorithms 7/8 for a = 0, b3 = 9 (BN254 G1) — the same
math as ops/curve.py (jnp arrays) and pallas_curve.py's original u16 bodies,
written once against a field namespace `F` so the Pallas kernels can run them
over either limb representation:

* F = pallas_curve's u16 core (16 rows of 16-bit limbs)
* F = ops.f15 (17 rows of 15-bit limbs — ~30% fewer VPU ops per mixed add)

`F` must provide: mont_mul, add_mod, sub_mod, dbl_mod, mul9, select,
is_zero, zero_rows(like). Reference analogue of the shared-template shape:
the MSL `ECPoint<Fp, A, Fr>` template instantiated per field
(src/metal/shader/curves/ec_point.h.metal:3-176).
"""

from __future__ import annotations


class _DualMask(tuple):
    """Pair of boolean masks (one per stream) supporting `&`."""

    def __and__(self, other):
        return _DualMask((self[0] & other[0], self[1] & other[1]))


class DualField:
    """Field namespace running TWO independent half-batch streams,
    interleaved at field-op granularity. Values are 2-tuples of the base
    namespace's row lists.

    Why: the TPU VPU is a 2-slot VLIW, and one dependent mont-mul chain
    cannot fill the second issue slot — measured on v5e (8192 lanes,
    artifacts/montmul_ilp{1,2}.log): a single chain runs 474.4 M mont-mul/s
    while two interleaved independent chains run 769.0 M/s, 1.022x off the
    dual-issue op-count roofline. Lanes in the MSM scan are independent by
    construction, so splitting a block into two half-blocks and tracing the
    EC formula once over the pair hands the scheduler a pairable second
    stream for every op. (The reference has no analogue — Metal GPUs hide
    latency with warps, not VLIW slots.)
    """

    def __init__(self, base):
        self.base = base

    def _map2(self, fn, *args):
        return (fn(*(a[0] for a in args)), fn(*(a[1] for a in args)))

    def mont_mul(self, a, b):
        return self._map2(self.base.mont_mul, a, b)

    def add_mod(self, a, b):
        return self._map2(self.base.add_mod, a, b)

    def sub_mod(self, a, b):
        return self._map2(self.base.sub_mod, a, b)

    def dbl_mod(self, a):
        return self._map2(self.base.dbl_mod, a)

    def mul9(self, a):
        return self._map2(self.base.mul9, a)

    def is_zero(self, a):
        return _DualMask((self.base.is_zero(a[0]), self.base.is_zero(a[1])))

    def select(self, mask, a, b):
        return (self.base.select(mask[0], a[0], b[0]),
                self.base.select(mask[1], a[1], b[1]))

    def zero_rows(self, like):
        return self._map2(self.base.zero_rows, like)


def proj_add(F, x1, y1, z1, x2, y2, z2):
    """Complete projective P + Q (RCB Algorithm 7, a = 0)."""
    t0 = F.mont_mul(x1, x2)
    t1 = F.mont_mul(y1, y2)
    t2 = F.mont_mul(z1, z2)
    a = F.mont_mul(F.add_mod(x1, y1), F.add_mod(x2, y2))
    b = F.mont_mul(F.add_mod(x1, z1), F.add_mod(x2, z2))
    c = F.mont_mul(F.add_mod(y1, z1), F.add_mod(y2, z2))
    t3 = F.sub_mod(F.sub_mod(a, t0), t1)
    t4 = F.sub_mod(F.sub_mod(c, t1), t2)
    y3t = F.sub_mod(F.sub_mod(b, t0), t2)
    t0 = F.add_mod(F.dbl_mod(t0), t0)
    t2 = F.mul9(t2)
    z3t = F.add_mod(t1, t2)
    t1 = F.sub_mod(t1, t2)
    y3p = F.mul9(y3t)
    x3 = F.sub_mod(F.mont_mul(t3, t1), F.mont_mul(t4, y3p))
    y3 = F.add_mod(F.mont_mul(t1, z3t), F.mont_mul(y3p, t0))
    z3 = F.add_mod(F.mont_mul(z3t, t4), F.mont_mul(t0, t3))
    return x3, y3, z3


def proj_madd(F, x1, y1, z1, x2, y2):
    """Complete projective P + affine Q (RCB Algorithm 8, a = 0); the (0, 0)
    affine infinity sentinel is handled by a trailing select."""
    inf_q = F.is_zero(x2) & F.is_zero(y2)
    t0 = F.mont_mul(x1, x2)
    t1 = F.mont_mul(y1, y2)
    a = F.mont_mul(F.add_mod(x1, y1), F.add_mod(x2, y2))
    d = F.mont_mul(y2, z1)
    e = F.mont_mul(x2, z1)
    t3 = F.sub_mod(F.sub_mod(a, t0), t1)
    t4 = F.add_mod(d, y1)
    y3t = F.add_mod(e, x1)
    t0 = F.add_mod(F.dbl_mod(t0), t0)
    t2 = F.mul9(z1)
    z3t = F.add_mod(t1, t2)
    t1 = F.sub_mod(t1, t2)
    y3p = F.mul9(y3t)
    x3 = F.sub_mod(F.mont_mul(t3, t1), F.mont_mul(t4, y3p))
    y3 = F.add_mod(F.mont_mul(t1, z3t), F.mont_mul(y3p, t0))
    z3 = F.add_mod(F.mont_mul(z3t, t4), F.mont_mul(t0, t3))
    x3 = F.select(inf_q, x1, x3)
    y3 = F.select(inf_q, y1, y3)
    z3 = F.select(inf_q, z1, z3)
    return x3, y3, z3
