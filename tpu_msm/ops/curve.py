"""BN254 G1 elliptic-curve point arithmetic, vectorized and branchless.

TPU-native counterpart of the reference's `ECPoint<FpBN254, 0, u256>` template
(`src/metal/shader/curves/ec_point.h.metal:3-176`). Same math — Jacobian
coordinates, add-2007-bl / madd-2007-bl / dbl-2009-l — but where the reference
short-circuits exceptional cases with per-thread branches
(ec_point.h.metal:14-19,39-42), every operation here is **complete via
selects**: the generic formula, the doubling fallback, and the
infinity/negation cases are all computed (or masked) and combined with
`jnp.where`, because per-lane control flow does not vectorize on the VPU.

Representations (all limbs-first uint32, Montgomery form):
* Affine  `(x, y)` each (16, *batch); the point at infinity is (0, 0)
  (not on the curve since B=3, so it is a safe sentinel — the reference's
  halo2curves backend uses the same convention).
* Jacobian `(x, y, z)`; any z == 0 is infinity. The canonical infinity we
  produce is (1, 1, 0) in Montgomery form, matching ec_point.h.metal:75-77.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from tpu_msm.models import bn254
from tpu_msm.ops import field
from tpu_msm.ops.field import (
    add_mod, sub_mod, double_mod, mont_mul, mont_sqr, neg_mod,
)
from tpu_msm.ops import u256


class JacPoint(NamedTuple):
    x: jax.Array
    y: jax.Array
    z: jax.Array


class AffinePoint(NamedTuple):
    x: jax.Array
    y: jax.Array


def jac_infinity(batch_shape) -> JacPoint:
    one = field.one_mont(batch_shape)
    return JacPoint(one, one, field.zero(batch_shape))


def jac_is_infinity(p: JacPoint):
    return field.is_zero(p.z)


def affine_is_infinity(p: AffinePoint):
    return field.is_zero(p.x) & field.is_zero(p.y)


def affine_to_jac(p: AffinePoint) -> JacPoint:
    """Lift affine to Jacobian; the (0,0) infinity sentinel maps to z=0."""
    inf = affine_is_infinity(p)
    one = field.one_mont(p.x.shape[1:])
    z = field.select(inf, field.zero(p.x.shape[1:]), one)
    x = field.select(inf, one, p.x)
    y = field.select(inf, one, p.y)
    return JacPoint(x, y, z)


def select_point(cond, a, b):
    """Branchless per-lane point select (works for Jac and Affine tuples)."""
    return type(a)(*(u256.select(cond, fa, fb) for fa, fb in zip(a, b)))


def jac_neg(p: JacPoint) -> JacPoint:
    """Reference: ec_point.h.metal:102-104."""
    return JacPoint(p.x, neg_mod(p.y), p.z)


def jac_double(p: JacPoint) -> JacPoint:
    """dbl-2009-l for a = 0 (reference: ec_point.h.metal:141-175).

    Complete as-is: z=0 propagates to Z3 = 2*Y*Z = 0, and BN254 G1 has no
    2-torsion so y=0 never occurs on-curve. Independent field muls are
    stacked into 4 wide multiplies (see field.mont_mul_many).
    """
    xx, yy, yz = field.mont_mul_many([(p.x, p.x), (p.y, p.y), (p.y, p.z)])
    yyyy, t = field.mont_mul_many([(yy, yy), (add_mod(p.x, yy), add_mod(p.x, yy))])
    d = double_mod(sub_mod(sub_mod(t, xx), yyyy))
    e = add_mod(double_mod(xx), xx)  # 3*X^2
    f = mont_sqr(e)
    x3 = sub_mod(f, double_mod(d))
    g = mont_mul(e, sub_mod(d, x3))
    y3 = sub_mod(g, double_mod(double_mod(double_mod(yyyy))))
    z3 = double_mod(yz)
    return JacPoint(x3, y3, z3)


def _finalize_add(raw: JacPoint, dbl: JacPoint, p: JacPoint, q_jac: JacPoint,
                  inf_p, inf_q, h, r) -> JacPoint:
    """Shared exceptional-case select cascade for the complete adders."""
    both_finite = ~inf_p & ~inf_q
    h_zero = field.is_zero(h)
    r_zero = field.is_zero(r)
    # Equal points -> doubling; opposite points -> infinity.
    res = select_point(both_finite & h_zero & r_zero, dbl, raw)
    inf_mask = both_finite & h_zero & ~r_zero
    res = JacPoint(res.x, res.y,
                   field.select(inf_mask, field.zero(res.z.shape[1:]), res.z))
    res = select_point(inf_q, p, res)
    res = select_point(inf_p, q_jac, res)
    return res


def jac_add(p: JacPoint, q: JacPoint) -> JacPoint:
    """Complete Jacobian + Jacobian addition (add-2007-bl with select fixups).

    Reference: ec_point.h.metal:13-69 (branching version). The doubling
    fallback for the equal-points case is *fused* into the same six stacked
    multiplies as the generic formula, so completeness costs ~35% extra muls
    rather than a second full formula.
    """
    # Stage A
    z1z1, z2z2, xx, yy = field.mont_mul_many(
        [(p.z, p.z), (q.z, q.z), (p.x, p.x), (p.y, p.y)])
    # Stage B
    xpyy = add_mod(p.x, yy)
    u1, u2, zc1, zc2, yyyy, t = field.mont_mul_many(
        [(p.x, z2z2), (q.x, z1z1), (q.z, z2z2), (p.z, z1z1),
         (yy, yy), (xpyy, xpyy)])
    e = add_mod(double_mod(xx), xx)
    # Stage C
    s1, s2, f_dbl, y1z1 = field.mont_mul_many(
        [(p.y, zc1), (q.y, zc2), (e, e), (p.y, p.z)])
    h = sub_mod(u2, u1)
    r = double_mod(sub_mod(s2, s1))
    d = double_mod(sub_mod(sub_mod(t, xx), yyyy))
    x3d = sub_mod(f_dbl, double_mod(d))
    two_h = double_mod(h)
    zpz = add_mod(p.z, q.z)
    # Stage D
    i, rr, gd, zt = field.mont_mul_many(
        [(two_h, two_h), (r, r), (e, sub_mod(d, x3d)), (zpz, zpz)])
    # Stage E
    j, v = field.mont_mul_many([(h, i), (u1, i)])
    x3 = sub_mod(sub_mod(rr, j), double_mod(v))
    zh = sub_mod(sub_mod(zt, z1z1), z2z2)
    # Stage F
    w1, w2, z3 = field.mont_mul_many([(r, sub_mod(v, x3)), (s1, j), (zh, h)])
    y3 = sub_mod(w1, double_mod(w2))
    raw = JacPoint(x3, y3, z3)
    dbl = JacPoint(x3d,
                   sub_mod(gd, double_mod(double_mod(double_mod(yyyy)))),
                   double_mod(y1z1))
    return _finalize_add(raw, dbl, p, q,
                         jac_is_infinity(p), jac_is_infinity(q), h, r)


def jac_add_affine(p: JacPoint, q: AffinePoint) -> JacPoint:
    """Complete mixed addition Jacobian + affine (madd-2007-bl + selects).

    This is the hot-loop operation of the whole MSM (the per-pair bucket
    accumulation, reference kernel 2 at src/metal/shader/msm.h.metal:61-315,
    uses the generic add; mixed addition saves ~4 field muls per point).
    Doubling fallback fused into the same five stacked multiplies.
    """
    # Stage A
    z1z1, y2z1, xx, yy = field.mont_mul_many(
        [(p.z, p.z), (q.y, p.z), (p.x, p.x), (p.y, p.y)])
    # Stage B
    xpyy = add_mod(p.x, yy)
    u2, s2, yyyy, t = field.mont_mul_many(
        [(q.x, z1z1), (y2z1, z1z1), (yy, yy), (xpyy, xpyy)])
    h = sub_mod(u2, p.x)
    r = double_mod(sub_mod(s2, p.y))
    d = double_mod(sub_mod(sub_mod(t, xx), yyyy))
    e = add_mod(double_mod(xx), xx)
    # Stage C
    hh, rr, f_dbl, y1z1 = field.mont_mul_many(
        [(h, h), (r, r), (e, e), (p.y, p.z)])
    i = double_mod(double_mod(hh))
    x3d = sub_mod(f_dbl, double_mod(d))
    z1ph = add_mod(p.z, h)
    # Stage D
    j, v, gd, zt = field.mont_mul_many(
        [(h, i), (p.x, i), (e, sub_mod(d, x3d)), (z1ph, z1ph)])
    x3 = sub_mod(sub_mod(rr, j), double_mod(v))
    # Stage E
    w1, w2 = field.mont_mul_many([(r, sub_mod(v, x3)), (p.y, j)])
    y3 = sub_mod(w1, double_mod(w2))
    z3 = sub_mod(sub_mod(zt, z1z1), hh)
    raw = JacPoint(x3, y3, z3)
    dbl = JacPoint(x3d,
                   sub_mod(gd, double_mod(double_mod(double_mod(yyyy)))),
                   double_mod(y1z1))
    return _finalize_add(raw, dbl, p, affine_to_jac(q),
                         jac_is_infinity(p), affine_is_infinity(q), h, r)


# ---------------------------------------------------------------------------
# Scalar multiplication (reference: ec_point.h.metal:79-131).
# ---------------------------------------------------------------------------

def scalar_mul(p: JacPoint, scalar_limbs, num_bits: int = bn254.TOTAL_BITS) -> JacPoint:
    """Per-lane variable-base double-and-add: scalar_limbs is (16, *batch).

    MSB-to-LSB with a `fori_loop` so the trace holds one double + one add.
    """
    batch = p.z.shape[1:]

    def body(i, acc):
        bit_idx = jnp.uint32(num_bits - 1) - i.astype(jnp.uint32)
        limb = (bit_idx >> 4).astype(jnp.int32)
        bit = bit_idx & jnp.uint32(15)
        bit_set = (jnp.take(scalar_limbs, limb, axis=0) >> bit) & jnp.uint32(1)
        acc = jac_double(acc)
        added = jac_add(acc, p)
        return select_point(bit_set == 1, added, acc)

    init = jac_infinity(batch)
    return jax.lax.fori_loop(0, num_bits, body, init)


def mul_all_ones(p: JacPoint, c: int) -> JacPoint:
    """(2^c - 1) * p via c-1 rounds of acc = 2*acc + p (exponent is all ones).

    Used by the window reduction: window_sum = M * X(n) - sum_b X(s_b) with
    M = 2^c - 1 (see tpu_msm.ops.pippenger).
    """
    if c <= 1:
        return p

    def body(_, acc):
        return jac_add(jac_double(acc), p)

    return jax.lax.fori_loop(0, c - 1, body, p)


# ---------------------------------------------------------------------------
# Conversions and predicates (test/support surface).
# ---------------------------------------------------------------------------

def _inv_for_batch(z):
    """Elementwise Fermat inverse for narrow batches, Montgomery-trick batch
    inverse (~3 muls/element instead of ~380) when the batch is wide."""
    import math

    if math.prod(z.shape[1:]) > 16:
        return field.batch_inv_mont(z.reshape(z.shape[0], -1)).reshape(z.shape)
    return field.inv_mont(z)


def jac_to_affine(p: JacPoint) -> AffinePoint:
    """Normalize to affine (Montgomery coords); infinity -> (0, 0).

    Batched field inversion — not on the hot path (final result and
    tests only).
    """
    zinv = _inv_for_batch(p.z)
    zinv2 = mont_sqr(zinv)
    x = mont_mul(p.x, zinv2)
    y = mont_mul(p.y, mont_mul(zinv, zinv2))
    inf = jac_is_infinity(p)
    zero = field.zero(p.x.shape[1:])
    return AffinePoint(field.select(inf, zero, x), field.select(inf, zero, y))


def jac_eq(p: JacPoint, q: JacPoint):
    """Projective equality: X1*Z2^2 == X2*Z1^2 and Y1*Z2^3 == Y2*Z1^3."""
    z1z1 = mont_sqr(p.z)
    z2z2 = mont_sqr(q.z)
    x_eq = field.eq(mont_mul(p.x, z2z2), mont_mul(q.x, z1z1))
    y_eq = field.eq(
        mont_mul(p.y, mont_mul(q.z, z2z2)), mont_mul(q.y, mont_mul(p.z, z1z1))
    )
    inf_p = jac_is_infinity(p)
    inf_q = jac_is_infinity(q)
    return (inf_p & inf_q) | (~inf_p & ~inf_q & x_eq & y_eq)


def affine_on_curve(p: AffinePoint):
    """y^2 == x^3 + 3 in Montgomery form; infinity counts as on-curve."""
    b = field._const(bn254.B_MONT_LIMBS, p.x)
    lhs = mont_sqr(p.y)
    rhs = add_mod(mont_mul(mont_sqr(p.x), p.x), jnp.broadcast_to(b, p.x.shape))
    return field.eq(lhs, rhs) | affine_is_infinity(p)


def generator(batch_shape=()) -> AffinePoint:
    gx = jnp.broadcast_to(
        u256.from_const(bn254.GX_MONT_LIMBS, len(batch_shape)),
        (bn254.LIMBS, *batch_shape),
    )
    gy = jnp.broadcast_to(
        u256.from_const(bn254.GY_MONT_LIMBS, len(batch_shape)),
        (bn254.LIMBS, *batch_shape),
    )
    return AffinePoint(gx, gy)


# ---------------------------------------------------------------------------
# Complete homogeneous-projective arithmetic (Renes–Costello–Batina 2015,
# "Complete addition formulas for prime order elliptic curves", Algorithms
# 7/8 specialized to a = 0, b3 = 3b = 9). These formulas are COMPLETE by
# construction — one code path covers doubling, inverses, and the identity
# (0 : 1 : 0) with no per-lane branching at all, unlike the Jacobian ops
# above (and the reference's branching ECPoint, ec_point.h.metal:13-69).
# The MSM pipeline runs on these; the Jacobian ops remain for parity tests.
# ---------------------------------------------------------------------------

class ProjPoint(NamedTuple):
    x: jax.Array
    y: jax.Array
    z: jax.Array


def proj_infinity(batch_shape) -> ProjPoint:
    return ProjPoint(field.zero(batch_shape), field.one_mont(batch_shape),
                     field.zero(batch_shape))


def proj_is_infinity(p: ProjPoint):
    return field.is_zero(p.z)


def proj_neg(p: ProjPoint) -> ProjPoint:
    return ProjPoint(p.x, neg_mod(p.y), p.z)


def affine_to_proj(p: AffinePoint) -> ProjPoint:
    """(0, 0) affine sentinel -> (0 : 1 : 0)."""
    inf = affine_is_infinity(p)
    one = field.one_mont(p.x.shape[1:])
    zero = field.zero(p.x.shape[1:])
    return ProjPoint(p.x, field.select(inf, one, p.y),
                     field.select(inf, zero, one))


def _mul9(a):
    """9·a mod P via an add chain (b3 = 3b = 9 for BN254)."""
    return add_mod(double_mod(double_mod(double_mod(a))), a)


def proj_add(p: ProjPoint, q: ProjPoint) -> ProjPoint:
    """RCB Algorithm 7 (a = 0): complete projective addition, 12 muls in two
    stacked multiplies (field.mont_mul_many)."""
    t0, t1, t2, a, b, c = field.mont_mul_many([
        (p.x, q.x), (p.y, q.y), (p.z, q.z),
        (add_mod(p.x, p.y), add_mod(q.x, q.y)),
        (add_mod(p.x, p.z), add_mod(q.x, q.z)),
        (add_mod(p.y, p.z), add_mod(q.y, q.z)),
    ])
    t3 = sub_mod(sub_mod(a, t0), t1)        # X1Y2 + X2Y1
    t4 = sub_mod(sub_mod(c, t1), t2)        # Y1Z2 + Y2Z1
    y3t = sub_mod(sub_mod(b, t0), t2)       # X1Z2 + X2Z1
    t0 = add_mod(double_mod(t0), t0)        # 3·X1X2
    t2 = _mul9(t2)                          # b3·Z1Z2
    z3t = add_mod(t1, t2)
    t1 = sub_mod(t1, t2)
    y3p = _mul9(y3t)                        # b3·(X1Z2 + X2Z1)
    x3a, tt, y3a, u, v, w = field.mont_mul_many([
        (t4, y3p), (t3, t1), (y3p, t0), (t1, z3t), (t0, t3), (z3t, t4),
    ])
    return ProjPoint(sub_mod(tt, x3a), add_mod(u, y3a), add_mod(w, v))


def proj_madd(p: ProjPoint, q: AffinePoint) -> ProjPoint:
    """RCB Algorithm 8 (a = 0): complete mixed addition (q finite, Z2 = 1) —
    11 muls in two stacked multiplies; the (0, 0) infinity sentinel for q is
    handled by one trailing select."""
    t0, t1, a, d, e = field.mont_mul_many([
        (p.x, q.x), (p.y, q.y),
        (add_mod(p.x, p.y), add_mod(q.x, q.y)),
        (q.y, p.z), (q.x, p.z),
    ])
    t3 = sub_mod(sub_mod(a, t0), t1)        # X1Y2 + X2Y1
    t4 = add_mod(d, p.y)                    # Y1 + Y2Z1
    y3t = add_mod(e, p.x)                   # X1 + X2Z1
    t0 = add_mod(double_mod(t0), t0)        # 3·X1X2
    t2 = _mul9(p.z)                         # b3·Z1
    z3t = add_mod(t1, t2)
    t1 = sub_mod(t1, t2)
    y3p = _mul9(y3t)
    x3a, tt, y3a, u, v, w = field.mont_mul_many([
        (t4, y3p), (t3, t1), (y3p, t0), (t1, z3t), (t0, t3), (z3t, t4),
    ])
    out = ProjPoint(sub_mod(tt, x3a), add_mod(u, y3a), add_mod(w, v))
    return select_point(affine_is_infinity(q), ProjPoint(p.x, p.y, p.z), out)


def proj_double(p: ProjPoint) -> ProjPoint:
    """Complete doubling via self-addition (Alg 7 handles P + P exactly)."""
    return proj_add(p, p)


def proj_to_affine(p: ProjPoint) -> AffinePoint:
    """Normalize to affine Montgomery coords; infinity -> (0, 0)."""
    zinv = _inv_for_batch(p.z)
    x = mont_mul(p.x, zinv)
    y = mont_mul(p.y, zinv)
    inf = proj_is_infinity(p)
    zero = field.zero(p.x.shape[1:])
    return AffinePoint(field.select(inf, zero, x), field.select(inf, zero, y))


def proj_eq(p: ProjPoint, q: ProjPoint):
    """Projective equality: X1Z2 == X2Z1 and Y1Z2 == Y2Z1 (+ infinity cases)."""
    x_eq = field.eq(mont_mul(p.x, q.z), mont_mul(q.x, p.z))
    y_eq = field.eq(mont_mul(p.y, q.z), mont_mul(q.y, p.z))
    inf_p = proj_is_infinity(p)
    inf_q = proj_is_infinity(q)
    return (inf_p & inf_q) | (~inf_p & ~inf_q & x_eq & y_eq)
