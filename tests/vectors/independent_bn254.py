"""Independent BN254 G1 implementation for golden-vector generation.

This module is deliberately a SECOND, structurally different implementation
from `tpu_msm.utils.oracle` (which uses affine chord/tangent formulas): here
points are Jacobian (X, Y, Z) triples and addition/doubling use the standard
EFD Jacobian formulas, and the MSM is a bucket-array Pippenger (the shape of
the reference's pipeline, src/metal/msm.rs:189-217) rather than the oracle's
naive double-and-add sum. If the pipeline and the oracle shared a systematic
misconception (endianness, off-by-one in digit extraction, a wrong constant),
vectors generated from this module would disagree.

Every constant below is written as the published hex literal (EIP-196 /
alt_bn128 parameters), NOT imported from the tpu_msm package.
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

# Published alt_bn128 parameters (EIP-196; arkworks ark-bn254; halo2curves
# bn256 — all define the same curve y^2 = x^3 + 3 over Fp, group order r).
P = 0x30644E72E131A029B85045B68181585D97816A916871CA8D3C208C16D87CFD47
R_ORDER = 0x30644E72E131A029B85045B68181585D2833E84879B9709143E1F593F0000001
B = 3
GEN_AFF = (1, 2)

Jac = Optional[Tuple[int, int, int]]  # None = point at infinity
Aff = Optional[Tuple[int, int]]


def jac_double(pt: Jac) -> Jac:
    """dbl-2007-bl (EFD: g1p/jacobian doubling, a = 0)."""
    if pt is None:
        return None
    x1, y1, z1 = pt
    if y1 == 0:
        return None
    a = x1 * x1 % P
    b = y1 * y1 % P
    c = b * b % P
    d = 2 * ((x1 + b) * (x1 + b) - a - c) % P
    e = 3 * a % P
    f = e * e % P
    x3 = (f - 2 * d) % P
    y3 = (e * (d - x3) - 8 * c) % P
    z3 = 2 * y1 * z1 % P
    return (x3, y3, z3)


def jac_add(p1: Jac, p2: Jac) -> Jac:
    """add-2007-bl (EFD: general Jacobian-Jacobian addition)."""
    if p1 is None:
        return p2
    if p2 is None:
        return p1
    x1, y1, z1 = p1
    x2, y2, z2 = p2
    z1z1 = z1 * z1 % P
    z2z2 = z2 * z2 % P
    u1 = x1 * z2z2 % P
    u2 = x2 * z1z1 % P
    s1 = y1 * z2 * z2z2 % P
    s2 = y2 * z1 * z1z1 % P
    if u1 == u2:
        if (s1 + s2) % P == 0:
            return None
        return jac_double(p1)
    h = (u2 - u1) % P
    i = 4 * h * h % P
    j = h * i % P
    r = 2 * (s2 - s1) % P
    v = u1 * i % P
    x3 = (r * r - j - 2 * v) % P
    y3 = (r * (v - x3) - 2 * s1 * j) % P
    z3 = ((z1 + z2) * (z1 + z2) - z1z1 - z2z2) % P * h % P
    return (x3, y3, z3)


def jac_neg(pt: Jac) -> Jac:
    if pt is None:
        return None
    x, y, z = pt
    return (x, (-y) % P, z)


def to_affine(pt: Jac) -> Aff:
    if pt is None:
        return None
    x, y, z = pt
    if z % P == 0:
        return None
    zi = pow(z, P - 2, P)
    zi2 = zi * zi % P
    return (x * zi2 % P, y * zi2 * zi % P)


def from_affine(pt: Aff) -> Jac:
    if pt is None:
        return None
    return (pt[0], pt[1], 1)


def jac_mul(pt: Jac, k: int) -> Jac:
    """Left-to-right double-and-add (MSB first — the oracle goes LSB first)."""
    k %= R_ORDER
    if k == 0 or pt is None:
        return None
    acc: Jac = None
    for bit in bin(k)[2:]:
        acc = jac_double(acc)
        if bit == "1":
            acc = jac_add(acc, pt)
    return acc


def on_curve(pt: Aff) -> bool:
    if pt is None:
        return True
    x, y = pt
    return (y * y - x * x * x - B) % P == 0


def pippenger_msm(scalars: Sequence[int], points: Sequence[Aff], c: int = 8) -> Aff:
    """Bucket-array Pippenger MSM (the reference's algorithm shape:
    digit extraction -> per-bucket sums -> sum_b b*bucket_b -> Horner)."""
    num_windows = -(-256 // c)
    jpts = [from_affine(p) for p in points]
    window_sums: List[Jac] = []
    for w in range(num_windows):
        buckets: List[Jac] = [None] * ((1 << c) - 1)
        for s, jp in zip(scalars, jpts):
            d = (int(s) >> (c * w)) & ((1 << c) - 1)
            if d:
                buckets[d - 1] = jac_add(buckets[d - 1], jp)
        # sum_b (b+1) * buckets[b] via running suffix sums
        run: Jac = None
        tot: Jac = None
        for bk in reversed(buckets):
            run = jac_add(run, bk)
            tot = jac_add(tot, run)
        window_sums.append(tot)
    acc = window_sums[-1]
    for w in range(num_windows - 2, -1, -1):
        for _ in range(c):
            acc = jac_double(acc)
        acc = jac_add(acc, window_sums[w])
    return to_affine(acc)
