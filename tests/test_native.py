"""Native C++ CPU engine tests: differential vs the Python oracle, plus the
fixture store round-trip (reference: preprocess.rs:214-403 and the `check`
profiler mode, gpu_profiler.rs:143-172)."""

import numpy as np
import pytest

from tpu_msm.bindings import native
from tpu_msm.utils import interop, oracle, preprocess

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native engine not buildable"
)


def test_native_msm_vs_oracle(rng):
    n = 150
    ks = [int(rng.randint(1, 1 << 28)) for _ in range(n)]
    pts = [oracle.ec_mul(oracle.GEN, k) for k in ks]
    pts[3] = None  # infinity in the batch
    scalars = [int.from_bytes(rng.bytes(32), "little") % oracle.FR for _ in range(n)]
    scalars[0] = 0
    scalars[1] = oracle.FR - 1
    px, py = interop.affine_points_to_limbs(pts)
    sl = interop.ints_to_limbs(scalars)
    assert native.msm(px, py, sl) == oracle.msm(scalars, pts)


def test_native_msm_all_zero(rng):
    pts = [oracle.ec_mul(oracle.GEN, k + 1) for k in range(8)]
    px, py = interop.affine_points_to_limbs(pts)
    sl = interop.ints_to_limbs([0] * 8)
    assert native.msm(px, py, sl) is None


def test_native_ec_mul_batch_edges():
    sl = interop.ints_to_limbs([0, 1, 2, oracle.FR - 1, oracle.FR + 5])
    px, py = native.ec_mul_batch(oracle.GEN, sl)
    got = interop.limbs_to_affine_points(px, py)
    assert got[0] is None
    assert got[1] == oracle.GEN
    assert got[2] == oracle.ec_double(oracle.GEN)
    assert got[3] == oracle.ec_neg(oracle.GEN)  # (r-1)*G = -G
    # scalar >= r is NOT reduced by the native engine (double-and-add over
    # the raw 256-bit value); (r+5)*G = 5*G since G has order r.
    assert got[4] == oracle.ec_mul(oracle.GEN, 5)


def test_fixture_roundtrip(tmp_path, monkeypatch):
    monkeypatch.setenv("TPU_MSM_CACHE_DIR", str(tmp_path))
    a = preprocess.get_or_create_msm_instances(6, 2, seed=9)
    b = preprocess.get_or_create_msm_instances(6, 2, seed=9)  # cache hit
    assert len(a) == len(b) == 2
    for ia, ib in zip(a, b):
        np.testing.assert_array_equal(ia.px, ib.px)
        np.testing.assert_array_equal(ia.scalars, ib.scalars)
    # fixture points are valid curve points
    pts = interop.limbs_to_affine_points(a[0].px, a[0].py)
    assert all(oracle.is_on_curve(p) for p in pts[:8])


def test_native_vs_fixture_oracle_small(rng):
    """`check`-mode parity: native engine vs oracle on a fixture instance."""
    insts = preprocess.generate_msm_instances(5, 1, seed=11)
    inst = insts[0]
    got = native.msm(inst.px, inst.py, inst.scalars)
    want = oracle.msm(
        interop.limbs_to_ints(inst.scalars),
        interop.limbs_to_affine_points(inst.px, inst.py),
    )
    assert got == want
