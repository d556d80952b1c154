"""Pippenger pipeline tests: per-stage oracles + end-to-end differential MSM.

Mirrors the reference's per-stage tests (prepare_buckets_indices.rs:132-219,
bucket_wise_accumulation.rs:226-659, sum_reduction.rs:260-356) and the e2e
suites (src/metal/msm.rs:509-691), with the Python oracle standing in for
arkworks/halo2curves.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tpu_msm import msm, msm_best, msm_device
from tpu_msm.models import bn254
from tpu_msm.ops import curve, pippenger
from tpu_msm.utils import interop, oracle
from tpu_msm.utils.config import MsmConfig, select_config

# Everything here executes XLA graphs (see conftest tier policy);
# select_config coverage lives in tests/test_dispatch.py (host tier).
pytestmark = pytest.mark.device

FR = bn254.FR


def _gen_points(ks):
    return [oracle.ec_mul(oracle.GEN, k) for k in ks]


def _rand_scalars(rng, n, full_range=True):
    if full_range:
        return [int.from_bytes(rng.bytes(32), "little") % FR for _ in range(n)]
    return [int(rng.randint(0, 1 << 30)) for _ in range(n)]


# ---------------------------------------------------------------------------
# Stage 1: window digit extraction
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("c", [4, 8, 13, 15, 16])
def test_window_digits(rng, c):
    scalars = _rand_scalars(rng, 17) + [0, 1, FR - 1, (1 << 14) + 1]
    # (1<<14)+1 is the reference's directed "breaking scalar"
    # (prepare_buckets_indices.rs:132-135).
    cfg = MsmConfig(window_bits=c)
    limbs = jnp.asarray(interop.ints_to_limbs(scalars))
    got = np.asarray(pippenger.window_digits(limbs, cfg))
    for i, s in enumerate(scalars):
        exp = oracle.window_digits(s, c, cfg.num_windows())
        assert [int(v) for v in got[:, i]] == exp, f"scalar {i}"


@pytest.mark.parametrize("c,sbits", [(4, 254), (8, 254), (16, 254), (8, 32), (16, 32)])
def test_signed_window_digits_recode(rng, c, sbits):
    """Signed recoding must be exact: sum_i d'_i 2^(c*i) == scalar, with
    |d'_i| <= 2^(c-1)."""
    scalars = ([int.from_bytes(rng.bytes(32), "little") % (1 << sbits)
                for _ in range(9)]
               + [0, 1, (1 << sbits) - 1, (1 << (c - 1)), (1 << c) - 1])
    cfg = MsmConfig(window_bits=c, scalar_bits=sbits, signed_digits=True)
    limbs = jnp.asarray(interop.ints_to_limbs(scalars))
    absd, neg = (np.asarray(a) for a in pippenger.signed_window_digits(limbs, cfg))
    half = 1 << (c - 1)
    assert (absd <= half).all()
    for i, s in enumerate(scalars):
        total = sum((-int(a) if ng else int(a)) << (c * w)
                    for w, (a, ng) in enumerate(zip(absd[:, i], neg[:, i])))
        assert total == s, f"scalar {i}: recode sums to {total}, want {s}"


# ---------------------------------------------------------------------------
# Stage 3+4 fused: per-window sum via the telescoped scan identity,
# checked against the bucket-based oracle window sum.
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("c,n,lanes,signed", [
    (4, 37, 8, False),
    (4, 37, 8, True),
    pytest.param(8, 100, 16, False, marks=pytest.mark.slow),
    pytest.param(8, 256, 64, True, marks=pytest.mark.slow),
])
def test_window_sum_vs_bucket_oracle(rng, c, n, lanes, signed):
    scalars = _rand_scalars(rng, n)
    # Force digit collisions and empty buckets: small digit space at c=4,
    # plus duplicated points.
    points = _gen_points(
        [int(rng.randint(1, 1 << 20)) for _ in range((n + 1) // 2)] * 2)[:n]
    cfg = MsmConfig(window_bits=c, scan_lanes=lanes, signed_digits=signed)
    x, y = interop.affine_points_to_limbs(points)
    slimbs = jnp.asarray(interop.ints_to_limbs(scalars))
    res = jax.jit(pippenger.msm_projective, static_argnums=2)(
        curve.AffinePoint(jnp.asarray(x), jnp.asarray(y)), slimbs, cfg
    )
    [got] = interop.proj_limbs_to_affine_points(*[np.asarray(v) for v in res])
    exp = oracle.pippenger(scalars, points, c)
    assert got == exp
    # Cross-check the oracle itself against the naive MSM.
    assert exp == oracle.msm(scalars, points)


@pytest.mark.parametrize("impl", ["ss_scan", "ss_sort", "ss_2level", "hist"])
def test_segment_starts_strategies_match(rng, impl):
    """All segment-start strategies (bincount / searchsorted scan /
    searchsorted sort / two-level / MXU histogram) must give bit-identical
    MSM results — they locate the same s_b positions in the sorted digit
    array."""
    n, c, lanes = 37, 4, 8
    scalars = _rand_scalars(rng, n) + [0, 0]  # zero digits exercise s_1 > 0
    points = _gen_points([int(rng.randint(1, 1 << 20)) for _ in range(n + 2)])
    x, y = interop.affine_points_to_limbs(points)
    slimbs = jnp.asarray(interop.ints_to_limbs(scalars))
    pts = curve.AffinePoint(jnp.asarray(x), jnp.asarray(y))
    f = jax.jit(pippenger.msm_projective, static_argnums=2)
    base = f(pts, slimbs, MsmConfig(window_bits=c, scan_lanes=lanes))
    alt = f(pts, slimbs,
            MsmConfig(window_bits=c, scan_lanes=lanes, segment_starts=impl))
    for a, b in zip(base, alt):
        assert (np.asarray(a) == np.asarray(b)).all()


def test_sort_impl_rank_matches(rng):
    """sort_impl="rank" (2-operand sort + row gather) must give bit-identical
    MSM results to the payload sort. On the jnp fallback path the knob is a
    no-op (that path already rank-sorts); the fused-path equivalence runs on
    the accelerator (plus the data-level check in tests/test_hist.py)."""
    n, c, lanes = 41, 4, 8
    scalars = _rand_scalars(rng, n)
    points = _gen_points([int(rng.randint(1, 1 << 20)) for _ in range(n)])
    x, y = interop.affine_points_to_limbs(points)
    slimbs = jnp.asarray(interop.ints_to_limbs(scalars))
    pts = curve.AffinePoint(jnp.asarray(x), jnp.asarray(y))
    f = jax.jit(pippenger.msm_projective, static_argnums=2)
    base = f(pts, slimbs, MsmConfig(window_bits=c, scan_lanes=lanes,
                                    signed_digits=True))
    alt = f(pts, slimbs, MsmConfig(window_bits=c, scan_lanes=lanes,
                                   signed_digits=True, sort_impl="rank"))
    for a, b in zip(base, alt):
        assert (np.asarray(a) == np.asarray(b)).all()


def test_window_batch_matches_sequential(rng):
    """lax.map batch_size (vmapped window groups) must be bit-identical to
    the sequential window loop."""
    n, c, lanes = 29, 4, 8
    scalars = _rand_scalars(rng, n)
    points = _gen_points([int(rng.randint(1, 1 << 20)) for _ in range(n)])
    x, y = interop.affine_points_to_limbs(points)
    slimbs = jnp.asarray(interop.ints_to_limbs(scalars))
    pts = curve.AffinePoint(jnp.asarray(x), jnp.asarray(y))
    f = jax.jit(pippenger.msm_projective, static_argnums=2)
    base = f(pts, slimbs, MsmConfig(window_bits=c, scan_lanes=lanes,
                                    signed_digits=True))
    alt = f(pts, slimbs, MsmConfig(window_bits=c, scan_lanes=lanes,
                                   signed_digits=True, window_batch=2))
    for a, b in zip(base, alt):
        assert (np.asarray(a) == np.asarray(b)).all()


def test_ec_reduce(rng):
    ks = [int(rng.randint(1, 1 << 20)) for _ in range(23)]
    pts = _gen_points(ks)
    x, y = interop.affine_points_to_limbs(pts)
    proj = curve.affine_to_proj(curve.AffinePoint(jnp.asarray(x), jnp.asarray(y)))
    red = jax.jit(pippenger.ec_reduce)(proj)
    [got] = interop.proj_limbs_to_affine_points(*[np.asarray(v) for v in red])
    assert got == oracle.ec_mul(oracle.GEN, sum(ks))


# ---------------------------------------------------------------------------
# End-to-end MSM differential tests (reference: msm.rs:509-691)
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("n", [
    1, 33,
    pytest.param(100, marks=pytest.mark.slow),
    128,
])
def test_msm_small_sizes(rng, n):
    scalars = _rand_scalars(rng, n)
    points = _gen_points([int(rng.randint(1, 1 << 25)) for _ in range(n)])
    cfg = MsmConfig(window_bits=8, scan_lanes=8)
    assert msm(points, scalars, cfg) == oracle.msm(scalars, points)


def test_msm_known_answer_triangle(rng):
    """sum_{i=1..n} i * G = (n(n+1)/2) * G — closed-form KAT."""
    n = 64
    points = [oracle.GEN] * n
    scalars = list(range(1, n + 1))
    exp = oracle.ec_mul(oracle.GEN, n * (n + 1) // 2)
    cfg = MsmConfig(window_bits=8, scan_lanes=16)
    assert msm(points, scalars, cfg) == exp


def test_msm_edge_vectors(rng):
    """Zero scalars, identity points, max scalar, duplicates (BASELINE.json
    acceptance vectors; reference edge tests at msm.rs:509-691)."""
    pts = _gen_points([3, 7, 9, 11, 13, 0, 17, 3])  # includes infinity, dup base
    scalars = [0, FR - 1, 1, 0, FR - 2, 5, 2, FR - 1]
    cfg = MsmConfig(window_bits=8, scan_lanes=8)
    assert msm(pts, scalars, cfg) == oracle.msm(scalars, pts)
    # Same workload through the signed-digit (balanced window) pipeline.
    cfg_s = MsmConfig(window_bits=8, scan_lanes=8, signed_digits=True)
    assert msm(pts, scalars, cfg_s) == oracle.msm(scalars, pts)
    # all-zero scalars
    assert msm_best([0] * 8, pts) is None
    # single max-scalar
    assert msm(pts[:1], [FR - 1], cfg) == oracle.ec_mul(pts[0], FR - 1)


def test_msm_best_zero_filtering(rng):
    n = 40
    pts = _gen_points([int(rng.randint(1, 1 << 20)) for _ in range(n)])
    scalars = _rand_scalars(rng, n)
    for i in range(0, n, 2):  # 50% zeros -> filter path engages
        scalars[i] = 0
    assert msm_best(scalars, pts) == oracle.msm(scalars, pts)


@pytest.mark.slow
def test_msm_c16_window_path(rng):
    """Exercise the c=16 (limb-aligned) window path on a small input."""
    n = 48
    scalars = _rand_scalars(rng, n)
    pts = _gen_points([int(rng.randint(1, 1 << 25)) for _ in range(n)])
    cfg = MsmConfig(window_bits=16, scan_lanes=8)
    assert msm(pts, scalars, cfg) == oracle.msm(scalars, pts)


def test_msm_determinism(rng):
    n = 33
    scalars = _rand_scalars(rng, n)
    pts = _gen_points([int(rng.randint(1, 1 << 25)) for _ in range(n)])
    cfg = MsmConfig(window_bits=8, scan_lanes=8)
    x, y = interop.affine_points_to_limbs(pts)
    slimbs = jnp.asarray(interop.ints_to_limbs(scalars))
    r1 = msm_device(jnp.asarray(x), jnp.asarray(y), slimbs, cfg)
    r2 = msm_device(jnp.asarray(x), jnp.asarray(y), slimbs, cfg)
    for a, b in zip(r1, r2):
        assert (np.asarray(a) == np.asarray(b)).all()  # bitwise identical


def test_select_config():
    assert select_config(16).scan_lanes <= 8


@pytest.mark.device
def test_segment_starts_2level_exact(rng):
    """_segment_starts('ss_2level') vs numpy on adversarial sorted arrays:
    empty buckets, all-one-digit, long runs crossing the 64-stride sample
    boundaries, and the m+1 padding sentinel."""
    import dataclasses

    m = 128
    cfg = MsmConfig(window_bits=8, signed_digits=False,
                    segment_starts="ss_2level")
    cases = [
        np.sort(rng.randint(0, m + 2, 1024)),
        np.zeros(1024, np.int64),                       # all digit 0
        np.full(1024, m, np.int64),                     # all digit m
        np.sort(np.repeat(rng.randint(0, m + 2, 16), 64)),  # 64-runs
        np.concatenate([np.zeros(1000, np.int64),
                        np.full(24, m + 1, np.int64)]),  # sentinel tail
    ]
    for d in cases:
        d32 = jnp.asarray(d.astype(np.uint32))
        got = np.asarray(pippenger._segment_starts(d32, m, cfg))
        want = np.searchsorted(d, np.arange(1, m + 1), side="left")
        assert (got == want).all()
