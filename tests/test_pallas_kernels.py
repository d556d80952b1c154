"""Differential tests for the fused Pallas EC kernels (interpret mode).

The production Pallas path only activates on TPU at batch widths >= 1024
lanes, so the math-level suites (test_curve / test_pippenger) never execute
it on the CPU backend. These tests run every kernel in Pallas interpret mode
against the jnp curve ops on identical inputs — same differential pattern as
the reference's shader-vs-arkworks kernel tests (src/metal/tests/
test_bn254.rs:175-215), with the jnp path (itself oracle-tested) as the CPU
reference.

Edge coverage per lane batch: identity accumulators, affine infinity
sentinels, equal points (doubling path), and inverse points (cancellation) —
the cases the RCB formulas must absorb without branching.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

# Interpret mode traces the whole unrolled kernel (~10k ops) through XLA —
# minutes per test on a 1-core CPU host, seconds on TPU via Mosaic. Slow
# tier by default; `python -m tpu_msm.cli.profiler --check-kernels` runs the
# same differential checks against the real compiled kernels on TPU.
pytestmark = pytest.mark.slow

from tpu_msm.models import bn254
from tpu_msm.ops import curve, field
from tpu_msm.ops import pallas_curve as pc
from tpu_msm.ops.curve import AffinePoint, ProjPoint
from tpu_msm.utils import interop, oracle

LANES = 1024  # minimum valid kernel width


def _points(rng, n, with_inf=True):
    """n affine points as (16, n) limb arrays + the oracle point list."""
    ks = [int(rng.randint(1, 1 << 16)) for _ in range(n)]
    pts = [oracle.ec_mul(oracle.GEN, k) for k in ks]
    if with_inf:
        for i in range(0, n, 97):
            pts[i] = None
    x, y = interop.affine_points_to_limbs(pts)
    return jnp.asarray(x), jnp.asarray(y), pts


@pytest.fixture(scope="module")
def batches():
    rng = np.random.RandomState(1234)
    ax, ay, _ = _points(rng, LANES)
    bx, by, _ = _points(rng, LANES)
    # Lane groups exercising the complete-formula edges:
    #   [0:256)   generic adds (plus scattered infinities from _points)
    #   [256:384) equal points  -> doubling path
    #   [384:512) inverse points -> cancellation to infinity
    bx = bx.at[:, 256:384].set(ax[:, 256:384])
    by = by.at[:, 256:384].set(ay[:, 256:384])
    bx = bx.at[:, 384:512].set(ax[:, 384:512])
    by = by.at[:, 384:512].set(field.neg_mod(ay[:, 384:512]))
    return AffinePoint(ax, ay), AffinePoint(bx, by)


def _pk(a):
    return pc.pack_lanes(a)


def _unpk_proj(res):
    return ProjPoint(*(pc.unpack_lanes(r) for r in res))


def _assert_proj_equal(got: ProjPoint, want: ProjPoint):
    assert bool(jax.jit(curve.proj_eq)(got, want).all())


def test_pmadd_matches_jnp(batches):
    p_aff, q_aff = batches
    p = curve.affine_to_proj(p_aff)
    got = _unpk_proj(pc.pmadd_packed(
        _pk(p.x), _pk(p.y), _pk(p.z), _pk(q_aff.x), _pk(q_aff.y),
        interpret=True))
    _assert_proj_equal(got, curve.proj_madd(p, q_aff))


def test_pmadd_identity_acc(batches):
    _, q_aff = batches
    inf = curve.proj_infinity((LANES,))
    got = _unpk_proj(pc.pmadd_packed(
        _pk(inf.x), _pk(inf.y), _pk(inf.z), _pk(q_aff.x), _pk(q_aff.y),
        interpret=True))
    _assert_proj_equal(got, curve.affine_to_proj(q_aff))


def test_padd_matches_jnp(batches):
    p_aff, q_aff = batches
    p = curve.affine_to_proj(p_aff)
    q = curve.affine_to_proj(q_aff)
    got = _unpk_proj(pc.padd_packed(
        _pk(p.x), _pk(p.y), _pk(p.z), _pk(q.x), _pk(q.y), _pk(q.z),
        interpret=True))
    _assert_proj_equal(got, curve.proj_add(p, q))


def test_jacobian_madd_add_match_jnp(batches):
    p_aff, q_aff = batches
    pj = curve.affine_to_jac(p_aff)
    qj = curve.affine_to_jac(q_aff)
    got = pc.madd_packed(_pk(pj.x), _pk(pj.y), _pk(pj.z),
                         _pk(q_aff.x), _pk(q_aff.y), interpret=True)
    got = curve.JacPoint(*(pc.unpack_lanes(r) for r in got))
    want = curve.jac_add_affine(pj, q_aff)
    assert bool(jax.jit(curve.jac_eq)(got, want).all())

    got = pc.add_packed(_pk(pj.x), _pk(pj.y), _pk(pj.z),
                        _pk(qj.x), _pk(qj.y), _pk(qj.z), interpret=True)
    got = curve.JacPoint(*(pc.unpack_lanes(r) for r in got))
    want = curve.jac_add(pj, qj)
    assert bool(jax.jit(curve.jac_eq)(got, want).all())


STEPS = 3


def _stacked_steps(rng):
    """(16, STEPS, R, 128) coordinate stacks + per-step (16, LANES) lists."""
    xs, ys = [], []
    for _ in range(STEPS):
        x, y, _ = _points(rng, LANES)
        xs.append(x)
        ys.append(y)
    r = LANES // pc.LANE
    gx = jnp.stack([a.reshape(bn254.LIMBS, r, pc.LANE) for a in xs], axis=1)
    gy = jnp.stack([a.reshape(bn254.LIMBS, r, pc.LANE) for a in ys], axis=1)
    return gx, gy, xs, ys


def test_scan_madd_matches_stepwise():
    rng = np.random.RandomState(77)
    gx, gy, xs, ys = _stacked_steps(rng)
    ox, oy, oz = pc.scan_madd_packed(gx, gy, interpret=True)

    acc = curve.proj_infinity((LANES,))
    for k in range(STEPS):
        acc = curve.proj_madd(acc, AffinePoint(xs[k], ys[k]))
        got = ProjPoint(*(a[:, k].reshape(bn254.LIMBS, LANES)
                          for a in (ox, oy, oz)))
        _assert_proj_equal(got, acc)


def test_scan_madd_u16_matches_stepwise():
    from tpu_msm.ops.pippenger import pack_u16_rows

    rng = np.random.RandomState(79)
    _, _, xs, ys = _stacked_steps(rng)
    r = LANES // pc.LANE
    pgx = jnp.stack([pack_u16_rows(a).reshape(8, r, pc.LANE) for a in xs],
                    axis=1)
    pgy = jnp.stack([pack_u16_rows(a).reshape(8, r, pc.LANE) for a in ys],
                    axis=1)
    ys48 = pc.scan_madd_packed_u16(pgx, pgy, interpret=True)

    acc = curve.proj_infinity((LANES,))
    for k in range(STEPS):
        acc = curve.proj_madd(acc, AffinePoint(xs[k], ys[k]))
        flat = ys48[:, k].reshape(48, LANES)
        got = ProjPoint(flat[0:16], flat[16:32], flat[32:48])
        _assert_proj_equal(got, acc)


def test_scan_madd_u16_f15_matches_u16():
    """The 15-bit-limb scan kernel must be bit-identical to the u16 kernel
    on the same packed inputs (incl. an infinity-sentinel column)."""
    from tpu_msm.ops.pippenger import pack_u16_rows

    rng = np.random.RandomState(81)
    _, _, xs, ys = _stacked_steps(rng)
    # Force a (0, 0) infinity sentinel into step 1, lane 0.
    xs[1] = xs[1].at[:, 0].set(0)
    ys[1] = ys[1].at[:, 0].set(0)
    r = LANES // pc.LANE
    pgx = jnp.stack([pack_u16_rows(a).reshape(8, r, pc.LANE) for a in xs],
                    axis=1)
    pgy = jnp.stack([pack_u16_rows(a).reshape(8, r, pc.LANE) for a in ys],
                    axis=1)
    ref = pc.scan_madd_packed_u16(pgx, pgy, interpret=True)
    got = pc.scan_madd_packed_u16_f15(pgx, pgy, interpret=True)
    assert (np.asarray(ref) == np.asarray(got)).all()


def test_fold_add_matches_stepwise():
    rng = np.random.RandomState(78)
    gx, gy, xs, ys = _stacked_steps(rng)
    # Projective inputs with nontrivial Z: double each affine point.
    projs = [curve.proj_double(curve.affine_to_proj(AffinePoint(x, y)))
             for x, y in zip(xs, ys)]
    r = LANES // pc.LANE
    bx, by, bz = (jnp.stack([getattr(p, f).reshape(bn254.LIMBS, r, pc.LANE)
                             for p in projs], axis=1)
                  for f in ("x", "y", "z"))
    ox, oy, oz = pc.fold_add_packed(bx, by, bz, interpret=True)
    got = ProjPoint(*(a.reshape(bn254.LIMBS, LANES) for a in (ox, oy, oz)))

    acc = curve.proj_infinity((LANES,))
    for p in projs:
        acc = curve.proj_add(acc, p)
    _assert_proj_equal(got, acc)


def test_scan_madd_u16_mxu_matches_u16():
    """The MXU-REDC scan kernel (ops/fmxu.py) must be bit-identical to the
    u16 kernel on the same packed inputs (incl. an infinity sentinel)."""
    from tpu_msm.ops.pippenger import pack_u16_rows

    rng = np.random.RandomState(83)
    _, _, xs, ys = _stacked_steps(rng)
    xs[1] = xs[1].at[:, 0].set(0)
    ys[1] = ys[1].at[:, 0].set(0)
    r = LANES // pc.LANE
    pgx = jnp.stack([pack_u16_rows(a).reshape(8, r, pc.LANE) for a in xs],
                    axis=1)
    pgy = jnp.stack([pack_u16_rows(a).reshape(8, r, pc.LANE) for a in ys],
                    axis=1)
    ref = pc.scan_madd_packed_u16(pgx, pgy, interpret=True)
    got = pc.scan_madd_packed_u16_mxu(pgx, pgy, interpret=True)
    assert (np.asarray(ref) == np.asarray(got)).all()
