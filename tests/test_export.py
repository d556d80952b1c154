"""AOT export tests: serialize -> deserialize -> execute round trip
(the saved-executable story; reference analogue: the precompiled metallib
embedded at build time, build.rs:15-99 + state.rs:31)."""

import numpy as np
import jax.numpy as jnp
import pytest

from tpu_msm.bindings import export
from tpu_msm.utils import interop, oracle
from tpu_msm.utils.config import MsmConfig

pytestmark = pytest.mark.device  # executing the loaded artifact compiles XLA


def test_export_roundtrip_matches_oracle(rng, tmp_path):
    n = 32
    scalars = [int.from_bytes(rng.bytes(32), "little") % oracle.FR
               for _ in range(n)]
    points = [oracle.ec_mul(oracle.GEN, int(rng.randint(1, 1 << 20)))
              for _ in range(n)]
    px, py = interop.affine_points_to_limbs(points)
    sl = interop.ints_to_limbs(scalars)

    path = tmp_path / "msm.stablehlo.bin"
    cfg = MsmConfig(window_bits=8, scan_lanes=8, backend="jnp")
    data = export.export_msm(n, cfg, path=path)
    assert path.read_bytes() == data and len(data) > 1000

    fn = export.load_msm(path)
    res = fn(jnp.asarray(px), jnp.asarray(py), jnp.asarray(sl))
    [got] = interop.proj_limbs_to_affine_points(*[np.asarray(a) for a in res])
    assert got == oracle.msm(scalars, points)
