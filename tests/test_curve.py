"""EC point-op tests vs the Python oracle.

Mirrors the reference's EC shader tests (src/metal/tests/test_bn254.rs:371-457:
bn254_add / bn254_scalar_mul incl. add_with_infinity_lhs/rhs and
infinity_plus_infinity edge cases).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tpu_msm.models import bn254
from tpu_msm.ops import curve, field
from tpu_msm.utils import interop, oracle

# Everything here executes XLA graphs (see conftest tier policy).
pytestmark = pytest.mark.device


def _to_affine_host(jac):
    return interop.jac_limbs_to_affine_points(*[np.asarray(v) for v in jac])


@pytest.fixture(scope="module")
def sample(rng):
    # Multiples of G incl. infinity (k=0), duplicates, near-order values.
    ks = [1, 2, 3, 5, 7, 11, 0, 1, 2, 12345, bn254.FR - 1, bn254.FR - 2] + [
        int(rng.randint(1, 1 << 30)) for _ in range(12)
    ]
    pts = [oracle.ec_mul(oracle.GEN, k) for k in ks]
    x, y = interop.affine_points_to_limbs(pts)
    aff = curve.AffinePoint(jnp.asarray(x), jnp.asarray(y))
    return ks, pts, aff


def test_interop_and_on_curve(sample):
    ks, pts, aff = sample
    assert bool(curve.affine_on_curve(aff).all())
    # Round-trip through the limb format.
    assert interop.limbs_to_affine_points(np.asarray(aff.x), np.asarray(aff.y)) == pts
    # A non-curve point is rejected.
    bad = curve.AffinePoint(field.one_mont((1,)), field.one_mont((1,)))
    assert not bool(curve.affine_on_curve(bad).any())


def test_affine_jac_round_trip(sample):
    _, pts, aff = sample
    jac = curve.affine_to_jac(aff)
    assert _to_affine_host(jac) == pts
    inf_mask = np.asarray(curve.jac_is_infinity(jac))
    assert [bool(m) for m in inf_mask] == [p is None for p in pts]


def test_double(sample):
    _, pts, aff = sample
    got = _to_affine_host(curve.jac_double(curve.affine_to_jac(aff)))
    assert got == [oracle.ec_double(p) for p in pts]


def test_full_add_all_edge_cases(sample):
    """Pairs p[i] + p[n-1-i] cover inf+finite, finite+inf, equal points
    (doubling fallback), and P + (-P) ... plus random pairs."""
    _, pts, aff = sample
    jac = curve.affine_to_jac(aff)
    jac_rev = curve.JacPoint(*(v[:, ::-1] for v in jac))
    got = _to_affine_host(curve.jac_add(jac, jac_rev))
    assert got == [oracle.ec_add(p, q) for p, q in zip(pts, pts[::-1])]
    # infinity + infinity
    inf = curve.jac_infinity((2,))
    assert _to_affine_host(curve.jac_add(inf, inf)) == [None, None]


def test_mixed_add_all_edge_cases(sample):
    _, pts, aff = sample
    jac = curve.affine_to_jac(aff)
    aff_rev = curve.AffinePoint(*(v[:, ::-1] for v in aff))
    got = _to_affine_host(curve.jac_add_affine(jac, aff_rev))
    assert got == [oracle.ec_add(p, q) for p, q in zip(pts, pts[::-1])]
    # P + (-P) = infinity for every lane
    neg = curve.AffinePoint(aff.x, field.neg_mod(aff.y))
    got = _to_affine_host(curve.jac_add_affine(jac, neg))
    assert got == [None if p is None else None for p in pts]
    # jac infinity + affine point = the point
    inf = curve.jac_infinity((aff.x.shape[1],))
    assert _to_affine_host(curve.jac_add_affine(inf, aff)) == pts


def test_neg(sample):
    _, pts, aff = sample
    got = _to_affine_host(curve.jac_neg(curve.affine_to_jac(aff)))
    assert got == [oracle.ec_neg(p) for p in pts]


def test_scalar_mul():
    base_ks = [5, 6, 7, 8]
    base = [oracle.ec_mul(oracle.GEN, k) for k in base_ks]
    bx, by = interop.affine_points_to_limbs(base)
    jac = curve.affine_to_jac(curve.AffinePoint(jnp.asarray(bx), jnp.asarray(by)))
    sc = [3, 0, bn254.FR - 1, (1 << 253) + 12345]
    res = jax.jit(curve.scalar_mul)(jac, jnp.asarray(interop.ints_to_limbs(sc)))
    assert _to_affine_host(res) == [oracle.ec_mul(p, k) for p, k in zip(base, sc)]


@pytest.mark.parametrize("c", [2, 8, 16])
def test_mul_all_ones(c):
    base = [oracle.ec_mul(oracle.GEN, k) for k in [5, 9]]
    bx, by = interop.affine_points_to_limbs(base)
    jac = curve.affine_to_jac(curve.AffinePoint(jnp.asarray(bx), jnp.asarray(by)))
    res = jax.jit(curve.mul_all_ones, static_argnums=1)(jac, c)
    assert _to_affine_host(res) == [oracle.ec_mul(p, (1 << c) - 1) for p in base]


def test_jac_eq(sample):
    _, pts, aff = sample
    jac = curve.affine_to_jac(aff)
    # Same point, different Z: scale by doubling then compare via jac_eq on
    # 2P representations from two formulas.
    d1 = curve.jac_double(jac)
    d2 = curve.jac_add(jac, jac)
    assert bool(curve.jac_eq(d1, d2).all())
    assert bool(curve.jac_eq(jac, jac).all())
    shifted = curve.JacPoint(*(v[:, ::-1] for v in jac))
    eqs = np.asarray(curve.jac_eq(jac, shifted))
    for i, e in enumerate(eqs):
        assert bool(e) == (pts[i] == pts[len(pts) - 1 - i])


# ---------------------------------------------------------------------------
# Complete projective (RCB) ops — the pipeline's production representation.
# ---------------------------------------------------------------------------

def _to_affine_proj_host(p):
    return interop.proj_limbs_to_affine_points(*[np.asarray(v) for v in p])


def test_proj_round_trip(sample):
    _, pts, aff = sample
    proj = curve.affine_to_proj(aff)
    assert _to_affine_proj_host(proj) == pts
    inf_mask = np.asarray(curve.proj_is_infinity(proj))
    assert [bool(m) for m in inf_mask] == [p is None for p in pts]


def test_proj_add_complete(sample):
    """One code path covers generic add, doubling (equal points), inverses,
    and the identity — RCB completeness."""
    _, pts, aff = sample
    proj = curve.affine_to_proj(aff)
    rev = curve.ProjPoint(*(v[:, ::-1] for v in proj))
    got = _to_affine_proj_host(curve.proj_add(proj, rev))
    assert got == [oracle.ec_add(p, q) for p, q in zip(pts, pts[::-1])]
    # self-add == doubling
    got = _to_affine_proj_host(curve.proj_double(proj))
    assert got == [oracle.ec_double(p) for p in pts]
    # P + (-P) = infinity
    got = _to_affine_proj_host(curve.proj_add(proj, curve.proj_neg(proj)))
    assert got == [None] * len(pts)


def test_proj_madd_complete(sample):
    _, pts, aff = sample
    proj = curve.affine_to_proj(aff)
    aff_rev = curve.AffinePoint(*(v[:, ::-1] for v in aff))
    got = _to_affine_proj_host(curve.proj_madd(proj, aff_rev))
    assert got == [oracle.ec_add(p, q) for p, q in zip(pts, pts[::-1])]
    neg = curve.AffinePoint(aff.x, field.neg_mod(aff.y))
    assert _to_affine_proj_host(curve.proj_madd(proj, neg)) == [None] * len(pts)
    # identity accumulator + affine point = the point
    inf = curve.proj_infinity((aff.x.shape[1],))
    assert _to_affine_proj_host(curve.proj_madd(inf, aff)) == pts


def test_proj_eq(sample):
    _, pts, aff = sample
    proj = curve.affine_to_proj(aff)
    d1 = curve.proj_double(proj)
    d2 = curve.proj_add(proj, proj)
    assert bool(curve.proj_eq(d1, d2).all())
    shifted = curve.ProjPoint(*(v[:, ::-1] for v in proj))
    eqs = np.asarray(curve.proj_eq(proj, shifted))
    for i, e in enumerate(eqs):
        assert bool(e) == (pts[i] == pts[len(pts) - 1 - i])
