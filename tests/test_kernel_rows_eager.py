"""Eager differential test of the Jacobian Pallas-kernel row formulas.

Regression pin for the one red cell of the r3 full-tier TPU run
(artifacts/pytest_full.log: `test_jacobian_madd_add_match_jnp` F, then the
session timeout cut the traceback). Triage showed the row math is
bit-identical to the jnp reference on the exact failing fixture — the F was
an infra error in the tunneled interpret-mode run, not a math bug — and the
compiled kernel built from the same rows passed the on-hardware differential
check the same day (artifacts/kernel_check_tpu.log: madd_packed/add_packed
OK, 12/12 + summary).

This test keeps that triage alive *cheaply*: it evaluates `_madd_rows` /
`_add_rows` (the exact code the Pallas kernels trace) EAGERLY — no XLA
compile of the ~10k-op unrolled kernel, so it runs in the default host tier
where the interpret-mode variants need the slow tier (minutes of compile per
graph on a 1-core host). Same edge fixture as test_pallas_kernels.batches:
scattered infinities, equal points (doubling path), inverse points
(cancellation). Reference analogue: shader-vs-arkworks differential tests,
src/metal/tests/test_bn254.rs:175-215.
"""

import numpy as np
import jax
import jax.numpy as jnp

from tpu_msm.ops import curve, field
from tpu_msm.ops import pallas_curve as pc
from tpu_msm.ops.curve import AffinePoint
from tpu_msm.utils import interop, oracle

LANES = 256


def _edge_batches():
    """Edge-case affine batch pair, cheap to build: 32 distinct small
    multiples of G tiled to LANES (no per-lane Python ec_mul), then the
    same lane groups as test_pallas_kernels.batches scaled to 256 lanes:
    [64:128) equal -> doubling, [128:192) inverse -> cancellation,
    infinities every 29 lanes."""
    rng = np.random.RandomState(1234)

    def batch(seed_mult):
        base = []
        acc = oracle.ec_mul(oracle.GEN, seed_mult)
        step = oracle.ec_mul(oracle.GEN, 0xC0FFEE + seed_mult)
        for _ in range(32):
            base.append(acc)
            acc = oracle.ec_add(acc, step)
        perm = rng.permutation(LANES) % 32
        pts = [base[i] for i in perm]
        for i in range(0, LANES, 29):
            pts[i] = None  # affine infinity sentinel (0, 0)
        x, y = interop.affine_points_to_limbs(pts)
        return jnp.asarray(x), jnp.asarray(y)

    ax, ay = batch(3)
    bx, by = batch(11)
    bx = bx.at[:, 64:128].set(ax[:, 64:128])
    by = by.at[:, 64:128].set(ay[:, 64:128])
    bx = bx.at[:, 128:192].set(ax[:, 128:192])
    by = by.at[:, 128:192].set(field.neg_mod(ay[:, 128:192]))
    return AffinePoint(ax, ay), AffinePoint(bx, by)


def _rows(a):
    return [a[i] for i in range(16)]


def test_jacobian_rows_match_jnp_eager():
    p_aff, q_aff = _edge_batches()
    pj = curve.affine_to_jac(p_aff)
    qj = curve.affine_to_jac(q_aff)
    with jax.disable_jit():
        rx, ry, rz = pc._madd_rows(_rows(pj.x), _rows(pj.y), _rows(pj.z),
                                   _rows(q_aff.x), _rows(q_aff.y))
        got = curve.JacPoint(jnp.stack(rx), jnp.stack(ry), jnp.stack(rz))
        want = curve.jac_add_affine(pj, q_aff)
        eq = np.asarray(curve.jac_eq(got, want))
        assert eq.all(), f"madd rows diverge at lanes {np.where(~eq)[0][:8]}"

        rx, ry, rz = pc._add_rows(_rows(pj.x), _rows(pj.y), _rows(pj.z),
                                  _rows(qj.x), _rows(qj.y), _rows(qj.z))
        got = curve.JacPoint(jnp.stack(rx), jnp.stack(ry), jnp.stack(rz))
        want = curve.jac_add(pj, qj)
        eq = np.asarray(curve.jac_eq(got, want))
        assert eq.all(), f"add rows diverge at lanes {np.where(~eq)[0][:8]}"
