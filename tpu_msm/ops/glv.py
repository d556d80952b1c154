"""GLV endomorphism decomposition for BN254 G1.

BN254 has CM discriminant -3, so G1 carries the cube-root endomorphism
phi(x, y) = (BETA * x, y) with phi(P) = LAMBDA * P for every P in the
(prime-order, cofactor-1) group. Splitting each 254-bit scalar k into
k = k1 + k2 * LAMBDA (mod r) with |k1|, |k2| < 2^127 lets the Pippenger
pipeline run 2n points over HALF the windows (8 instead of 16 at c = 16):
the scan stage's work is unchanged (2n x 8 = n x 16 mixed adds) but every
per-window fixed cost — lane-carry scan, bucket-boundary queries,
`ec_reduce`, Horner doublings, ~19% of the op count at log 20
(docs/PERF_NOTES.md) — halves.

The reference does not implement GLV (its msm.rs:121-234 windows the full
254-bit scalar); this is an allowed algorithmic improvement in the spirit of
SURVEY §7's signed-digit precedent, kept behind `MsmConfig.glv`.

Everything here is exact integer math:

* Import-time constants (LAMBDA, BETA, the lattice basis) are derived from
  r and P — cube roots via g^((m-1)/3), the basis via the classic
  extended-Euclid construction on (r, LAMBDA) — and VERIFIED at import:
  phi(G) == LAMBDA*G on the curve, both basis vectors in the GLV lattice,
  det == +r, and the worst-case |k_i| bounds (computed exactly, below)
  < 2^127.
* The decomposition is Babai round-off: q_i ~= round(k * |b_j| / r) via a
  272-bit fixed-point reciprocal, then k1 = k - q1*a1 - q2*a2 and
  k2 = -q1*b1 - q2*b2 exactly (any q error only grows |k_i|, never breaks
  k1 + k2*LAMBDA == k (mod r)). The fixed-point floor can be off by one
  from true rounding, which pushes the worst case to
  1.5 * (|a1| + |a2|) ~= 2^127.38 — over the 8-window budget — so ONE
  conditional lattice-vector correction per component (subtract
  sign(k1) * v2 when |k1| >= _THR, then sign(k2) * v1) restores a proven
  |k_i| < 2^127; every case endpoint is checked exactly at import (the
  _K1_FINAL/_K2_FINAL asserts).

Device path (`decompose_limbs`) is pure vectorized u256 limb arithmetic on
(16, N) arrays — six static-loop constant products (u256.mul_const; NOT
mul_full, whose outer-product+gather shape measured ~0.5 s at 2^20),
negligible against the pipeline's ~227M mont-muls at log 20. The host path
(`decompose_int`) mirrors it bit-for-bit for the oracle tests.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from tpu_msm.models import bn254
from tpu_msm.ops import u256

P = bn254.P
FR = bn254.FR


def _cube_root_of_unity(m: int) -> int:
    x = 2
    while True:
        w = pow(x, (m - 1) // 3, m)
        if w != 1:
            assert pow(w, 3, m) == 1
            return w
        x += 1


def _match_endomorphism():
    """Pick (LAMBDA, BETA) with phi(G) = LAMBDA*G, verified on the curve."""
    from tpu_msm.utils import oracle

    g = oracle.GEN
    for lam in (_cube_root_of_unity(FR),):
        for beta in (w := _cube_root_of_unity(P), w * w % P):
            if oracle.ec_mul(g, lam) == (beta * g[0] % P, g[1]):
                return lam, beta
    raise AssertionError("no (lambda, beta) pairing found")  # pragma: no cover


LAMBDA, BETA = _match_endomorphism()


def _short_basis():
    """Extended-Euclid GLV basis for the lattice {(x,y): x + y*L = 0 mod r}."""
    rs, ts = [FR, LAMBDA], [0, 1]
    while rs[-1] * rs[-1] >= FR:
        q = rs[-2] // rs[-1]
        rs.append(rs[-2] - q * rs[-1])
        ts.append(ts[-2] - q * ts[-1])
    a1, b1 = rs[-1], -ts[-1]
    cand_prev = (rs[-2], -ts[-2])
    q = rs[-2] // rs[-1]
    cand_next = (rs[-2] - q * rs[-1], -(ts[-2] - q * ts[-1]))
    a2, b2 = min(cand_prev, cand_next, key=lambda v: v[0] ** 2 + v[1] ** 2)
    return (a1, b1), (a2, b2)


(A1, B1), (A2, B2) = _short_basis()
DET = A1 * B2 - A2 * B1
assert DET == FR, "basis determinant must be +r"
for _a, _b in ((A1, B1), (A2, B2)):
    assert (_a + _b * LAMBDA) % FR == 0, "basis vector not in the GLV lattice"
assert A1 > 0 and B1 < 0 and A2 > 0 and B2 > 0  # sign layout the code bakes in

# 272-bit fixed-point reciprocals: q1 ~= k*B2/r, q2 ~= k*(-B1)/r (both >= 0).
_SHIFT = 272  # 17 u16 limbs — clean limb-aligned drop after mul_full
M1 = (B2 << _SHIFT) // FR
M2 = ((-B1) << _SHIFT) // FR

# Exact worst-case bound bookkeeping (all integer arithmetic):
# |q_i - round(k*mu_i)| <= 1 (floor-with-bias vs round, reciprocal truncation
# k*2^-272 <= 2^-18), so pre-correction |k1| <= 1.5*(A1+A2) (Babai 0.5 + q
# slop 1.0), same for |k2| with (|B1|+B2). One conditional correction by the
# vector whose LARGE component lives in that coordinate (v2 for k1, then v1
# for k2) when the magnitude reaches _THR. _THR sits 2^70 below 2^127 so the
# cross perturbations (the other vector's SMALL component: A1, B2 < 2^64)
# can never push an uncorrected value past 2^127 — the signed 8-window
# recode at c = 16 is exact only for magnitudes < 2^127 (a final carry out
# of window 7 would be lost). Every case bound below is checked exactly.
_THR = (1 << 127) - (1 << 70)
_PRE_K1 = 3 * (A1 + A2) // 2 + 1
_PRE_K2 = 3 * ((-B1) + B2) // 2 + 1
# k1 after its own correction (applied when |k1| >= _THR) ...
_K1_MID = max(_PRE_K1 - A2, A2 - _THR, _THR - 1)
# ... then perturbed by +-A1 when k2's correction fires:
_K1_FINAL = _K1_MID + A1
# k2 is perturbed by +-B2 by k1's correction BEFORE its own check:
_K2_MID = _PRE_K2 + B2
_K2_FINAL = max(_K2_MID - (-B1), (-B1) - _THR, _THR - 1)
assert _K1_FINAL < (1 << 127) and _K2_FINAL < (1 << 127)

# BETA in Montgomery form (the pipeline's point coordinates are Montgomery).
BETA_MONT = BETA * (1 << 256) % P


def decompose_int(k: int):
    """Host-exact mirror of `decompose_limbs` on one scalar. Returns
    (k1, k2) signed ints with k1 + k2*LAMBDA == k (mod r), |k_i| < 2^127
    (exact case analysis at the _THR asserts above)."""
    assert 0 <= k < FR
    bias = 1 << (_SHIFT - 1)
    q1 = (k * M1 + bias) >> _SHIFT
    q2 = (k * M2 + bias) >> _SHIFT
    k1 = k - q1 * A1 - q2 * A2
    k2 = -q1 * B1 - q2 * B2
    if abs(k1) >= _THR:  # correct with v2 (A2 is its large component)
        s = 1 if k1 >= 0 else -1
        k1 -= s * A2
        k2 -= s * B2
    if abs(k2) >= _THR:  # correct with v1 (B1 is its large component)
        s = 1 if k2 >= 0 else -1
        k1 -= s * A1
        k2 -= s * B1
    assert abs(k1) < 1 << 127 and abs(k2) < 1 << 127
    assert (k1 + k2 * LAMBDA - k) % FR == 0
    return k1, k2


# --- Device path ------------------------------------------------------------

def _const16(v: int):
    return u256.from_const(bn254.int_to_limbs(v, 16))


def _q_fixed(k_limbs, m_int: int):
    """floor((k*M + 2^271) / 2^272) as (16, N) limbs (M < 2^146: the
    26-limb product's columns come from static loops, the biased shift is
    a limb drop)."""
    n_out = 26  # 16 + 10 limbs covers k*M2 < 2^400
    prod = u256.mul_const(k_limbs, m_int, n_out)
    bias = np.zeros((n_out, 1), np.uint32)
    bias[16, 0] = 0x8000  # 2^271
    prod, _ = u256.add(prod, jnp.asarray(bias))
    pad = jnp.zeros((16 - (n_out - 17),) + prod.shape[1:], prod.dtype)
    return jnp.concatenate([prod[17:], pad])


def _neg(x):
    d, _ = u256.sub(jnp.zeros_like(x), x)
    return d


def _sign_mag(x):
    """Two's-complement (16, N) -> (negative?, magnitude)."""
    neg = u256.test_bit(x, 255) == 1
    return neg, u256.select(neg, _neg(x), x)


def _overflows(mag):
    """magnitude >= _THR ? (the correction threshold, see the bound notes)"""
    return u256.geq(mag, u256.from_const(bn254.int_to_limbs(_THR, 16)))


def _cond_correct(k1, k2, which, va, vb):
    """Subtract sign(k_which) * (va, vb) from (k1, k2) where |k_which| >= _THR."""
    kw = k1 if which == 0 else k2
    neg, mag = _sign_mag(kw)
    over = _overflows(mag)
    do_sub = over & ~neg
    do_add = over & neg
    for i, (k, vc) in enumerate(((k1, va), (k2, vb))):
        sub_v, _ = u256.sub(k, vc)
        add_v, _ = u256.add(k, vc)
        k = u256.select(do_sub, sub_v, u256.select(do_add, add_v, k))
        if i == 0:
            k1 = k
        else:
            k2 = k
    return k1, k2


def decompose_limbs(scalar_limbs):
    """(16, N) standard-form scalars (< r) -> (|k1|, neg1, |k2|, neg2):
    magnitude limb arrays (16, N) with limbs 8.. zero-ish (|k_i| < 2^127)
    and boolean negation masks (N,). Bit-exact mirror: decompose_int.
    All multiplies are static-loop constant products (_mul_const)."""
    q1 = _q_fixed(scalar_limbs, M1)
    q2 = _q_fixed(scalar_limbs, M2)

    a1c, a2c = _const16(A1), _const16(A2)
    b1n = _const16(-B1)  # |B1| (B1 < 0)
    b2c = _const16(B2)

    t1, _ = u256.add(u256.mul_const(q1, A1, 16), u256.mul_const(q2, A2, 16))
    k1, _ = u256.sub(scalar_limbs, t1)
    k2, _ = u256.sub(u256.mul_const(q1, -B1, 16), u256.mul_const(q2, B2, 16))

    k1, k2 = _cond_correct(k1, k2, 0, a2c, b2c)
    k1, k2 = _cond_correct(k1, k2, 1, a1c, _neg(b1n))

    neg1, mag1 = _sign_mag(k1)
    neg2, mag2 = _sign_mag(k2)
    return mag1, neg1, mag2, neg2
