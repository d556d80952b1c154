"""GLV endomorphism tests (ops/glv.py + the cfg.glv pipeline path).

The reference has no GLV (its windows cover the full 254-bit scalar,
src/metal/msm.rs:143-146); this is the framework's allowed algorithmic
improvement, so the burden of proof is higher: import-time exact bound
asserts live in the module, and these tests pin (a) the endomorphism
identity on the curve, (b) host/device decomposition equality with strict
|k_i| < 2^127 on edge scalars, and (c) end-to-end MSM equality vs the
oracle under cfg.glv.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tpu_msm.models import bn254
from tpu_msm.ops import glv
from tpu_msm.utils import interop, oracle


def test_endomorphism_identity(rng):
    """phi(P) = (BETA*x, y) == LAMBDA * P for random curve points."""
    for _ in range(8):
        k = int(rng.randint(1, 1 << 30))
        p = oracle.ec_mul(oracle.GEN, k)
        assert oracle.ec_mul(p, glv.LAMBDA) == (glv.BETA * p[0] % bn254.P,
                                                p[1])


def test_decompose_int_reconstructs(rng):
    ks = [0, 1, 2, bn254.FR - 1, bn254.FR - 2, glv.LAMBDA,
          (glv.LAMBDA + 1) % bn254.FR, glv._THR % bn254.FR,
          (glv.A2 * 3) % bn254.FR, (-glv.B1 * 5) % bn254.FR]
    ks += [int.from_bytes(rng.bytes(32), "little") % bn254.FR
           for _ in range(60)]
    for k in ks:
        k1, k2 = glv.decompose_int(k)  # asserts bounds + congruence itself
        assert (k1 + k2 * glv.LAMBDA) % bn254.FR == k


@pytest.mark.device
def test_decompose_limbs_matches_int(rng):
    ks = [0, 1, bn254.FR - 1, glv.LAMBDA, glv._THR % bn254.FR,
          (1 << 127), (1 << 254) % bn254.FR]
    ks += [int.from_bytes(rng.bytes(32), "little") % bn254.FR
           for _ in range(25)]
    sl = jnp.asarray(np.stack([bn254.int_to_limbs(k, 16) for k in ks],
                              axis=1))
    m1, n1, m2, n2 = jax.jit(glv.decompose_limbs)(sl)
    m1, n1, m2, n2 = (np.asarray(v) for v in (m1, n1, m2, n2))
    for j, k in enumerate(ks):
        k1, k2 = glv.decompose_int(k)
        g1 = bn254.limbs_to_int(m1[:, j]) * (-1 if n1[j] else 1)
        g2 = bn254.limbs_to_int(m2[:, j]) * (-1 if n2[j] else 1)
        assert (g1, g2) == (k1, k2), (j, hex(k))
        assert abs(g1) < 1 << 127 and abs(g2) < 1 << 127


@pytest.mark.device
def test_msm_glv_matches_oracle(rng):
    """Full pipeline under cfg.glv: 2n points, 8 windows, signed digits with
    GLV sign folding — result must equal the oracle MSM."""
    import dataclasses

    from tpu_msm.ops import pippenger
    from tpu_msm.ops.curve import AffinePoint
    from tpu_msm.utils.config import MsmConfig

    n = 64
    ks = [int(rng.randint(1, 1 << 22)) for _ in range(n)]
    pts = [oracle.ec_mul(oracle.GEN, k) for k in ks]
    pts[7] = None  # infinity point
    scalars = [int.from_bytes(rng.bytes(32), "little") % bn254.FR
               for _ in range(n)]
    scalars[3] = 0
    scalars[11] = bn254.FR - 1
    px, py = interop.affine_points_to_limbs(pts)
    sl = interop.ints_to_limbs(scalars)
    cfg = MsmConfig(window_bits=16, scan_lanes=16, signed_digits=True,
                    glv=True, backend="jnp")
    res = pippenger.msm_projective(
        AffinePoint(jnp.asarray(px), jnp.asarray(py)), jnp.asarray(sl), cfg)
    [got] = interop.proj_limbs_to_affine_points(
        np.asarray(res.x), np.asarray(res.y), np.asarray(res.z))
    assert got == oracle.msm(scalars, pts)


@pytest.mark.device
def test_msm_glv_matches_non_glv_bitwise(rng):
    """cfg.glv and the plain pipeline must agree exactly (same proj point not
    required — compare affine)."""
    import dataclasses

    from tpu_msm.ops import pippenger
    from tpu_msm.ops.curve import AffinePoint
    from tpu_msm.utils.config import MsmConfig

    n = 32
    pts = [oracle.ec_mul(oracle.GEN, int(rng.randint(1, 1 << 22)))
           for _ in range(n)]
    scalars = [int.from_bytes(rng.bytes(32), "little") % bn254.FR
               for _ in range(n)]
    px, py = interop.affine_points_to_limbs(pts)
    sl = interop.ints_to_limbs(scalars)
    base = MsmConfig(window_bits=16, scan_lanes=16, signed_digits=True,
                     backend="jnp")

    def run(cfg):
        res = pippenger.msm_projective(
            AffinePoint(jnp.asarray(px), jnp.asarray(py)),
            jnp.asarray(sl), cfg)
        [pt] = interop.proj_limbs_to_affine_points(
            np.asarray(res.x), np.asarray(res.y), np.asarray(res.z))
        return pt

    assert run(dataclasses.replace(base, glv=True)) == run(base)
