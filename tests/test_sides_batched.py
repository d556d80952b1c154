"""Differential test for the batched cross-window side stages.

`pippenger._sides_batched` re-implements the per-window tail (inter-lane
carry scan, bucket-boundary query adds, X(s_b) reduction, M*X(n) combine)
as full-width ops over ALL windows at once. This test builds the per-window
smalls with a pure-jnp emulation of `_window_heavy` (same sort, same scan
semantics via lax.scan, same segment starts and gathers) and checks that
_sides_batched's window sums are bit-identical to the proven per-window
`_msm_window` path on the same inputs.
"""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tpu_msm.models import bn254
from tpu_msm.ops import curve, field, pippenger
from tpu_msm.ops.curve import AffinePoint, ProjPoint
from tpu_msm.utils import interop, oracle
from tpu_msm.utils.config import MsmConfig, resolve_backend

pytestmark = pytest.mark.device


def _heavy_jnp(digits, negm, points, y_neg, n, cfg):
    """Pure-jnp mirror of _window_heavy for one window (lax.scan instead of
    the Pallas kernel; identical sort/starts/gather semantics)."""
    m = cfg.buckets_per_window()
    lanes = cfg.scan_lanes
    n_pad = digits.shape[0]
    steps = n_pad // lanes
    py_w = points.y if negm is None else jnp.where(negm[None, :], y_neg,
                                                   points.y)
    px_pad = jnp.pad(points.x, ((0, 0), (0, n_pad - n)))
    py_pad = jnp.pad(py_w, ((0, 0), (0, n_pad - n)))
    sorted_ops = jax.lax.sort(
        [digits] + [px_pad[i] for i in range(16)]
        + [py_pad[i] for i in range(16)], num_keys=1)
    sorted_digits = sorted_ops[0]
    gx = jnp.stack(sorted_ops[1:17]).reshape(16, lanes, steps)
    gy = jnp.stack(sorted_ops[17:33]).reshape(16, lanes, steps)

    def step(acc, xy):
        acc = curve.proj_madd(acc, AffinePoint(xy[0], xy[1]))
        return acc, acc

    _, ys = jax.lax.scan(step, curve.proj_infinity((lanes,)),
                         (jnp.moveaxis(gx, 2, 0), jnp.moveaxis(gy, 2, 0)))
    # ys: (steps, 16, lanes) per coord -> ys48 layout (48, steps, lanes)
    ys48 = jnp.concatenate([jnp.moveaxis(a, 0, 1) for a in ys], axis=0)

    bvals = jnp.arange(1, m + 1, dtype=sorted_digits.dtype)
    starts = jnp.searchsorted(sorted_digits, bvals, side="left",
                              method="scan").astype(jnp.int32)
    queries = jnp.concatenate([starts, jnp.full((1,), n, starts.dtype)])
    nq = m + 1
    qtarget = 4 * pippenger._PALLAS_MIN_WIDTH
    q_pad = -(-nq // qtarget) * qtarget - nq
    if q_pad:
        queries = jnp.concatenate(
            [queries, jnp.full((q_pad,), n, queries.dtype)])
    is_zero = queries == 0
    pos = jnp.maximum(queries, 1) - 1
    lq = (pos // steps).astype(jnp.int32)
    kq = (pos % steps).astype(jnp.int32)
    loc48 = ys48[:, kq, lq]
    totals = ys48[:, -1, :]
    return totals, loc48, lq, is_zero


def test_sides_batched_matches_per_window(rng):
    n = 128
    cfg = MsmConfig(window_bits=8, scan_lanes=8, reduce_fanout=64,
                    signed_digits=True, scalar_bits=24, backend="jnp",
                    segment_starts="ss_scan")
    ks = [int(rng.randint(1, 1 << 20)) for _ in range(n)]
    pts = [oracle.ec_mul(oracle.GEN, k) for k in ks]
    pts[5] = None
    scalars = [int(rng.randint(0, 1 << 24)) for _ in range(n)]
    scalars[3] = 0
    px, py = interop.affine_points_to_limbs(pts)
    sl = interop.ints_to_limbs(scalars)
    points = AffinePoint(jnp.asarray(px), jnp.asarray(py))
    slimbs = jnp.asarray(sl)

    # Reference: the proven per-window jnp path (window_sums as-is).
    want = pippenger.window_sums(points, slimbs, cfg)

    # Candidate: _sides_batched fed by the jnp heavy emulation.
    c2 = dataclasses.replace(cfg, backend=resolve_backend(cfg.backend))
    digits, negm = pippenger.signed_window_digits(slimbs, c2)
    m = c2.buckets_per_window()
    n_pad = -(-n // c2.scan_lanes) * c2.scan_lanes
    digits = jnp.pad(digits, ((0, 0), (0, n_pad - n)),
                     constant_values=jnp.uint32(m + 1))
    negm = jnp.pad(negm, ((0, 0), (0, n_pad - n)))
    y_neg = field.neg_mod(points.y)
    heavy = lambda dn: _heavy_jnp(dn[0], dn[1], points, y_neg, n, c2)
    smalls = jax.lax.map(heavy, (digits, negm))
    got = pippenger._sides_batched(*smalls, cfg=c2)

    eq = np.asarray(jax.jit(curve.proj_eq)(
        ProjPoint(*(x[:, :, 0].T for x in (got.x, got.y, got.z))),
        ProjPoint(*(x[:, :, 0].T for x in (want.x, want.y, want.z)))))
    assert eq.all()

    # And through to the final result vs the oracle.
    res = pippenger.horner_fold(got, c2.window_bits)
    [pt] = interop.proj_limbs_to_affine_points(
        np.asarray(res.x), np.asarray(res.y), np.asarray(res.z))
    assert pt == oracle.msm(scalars, pts)
