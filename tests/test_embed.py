"""Embedder-surface tests: the C ABI (native/tpu_msm_embed.cpp) end to end.

A non-Python host process (native/test_embed_main.c) links
libtpu_msm_embed.so, feeds wire-format bytes through tpu_msm_best, and we
check the result against the Python oracle — the role of the reference's
Swift benchmark app consuming the uniffi bindings
(src/ios_bindings.rs:6-26, ios-metal-benchmarker/ContentView.swift:79-139).
"""

import os
import shutil
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

from tpu_msm.models import bn254
from tpu_msm.utils import interop, oracle

NATIVE = Path(__file__).resolve().parent.parent / "native"


def _build_embed():
    if shutil.which("make") is None or shutil.which("g++") is None:
        pytest.skip("no native toolchain")
    r = subprocess.run(["make", "-C", str(NATIVE), "embed"],
                       capture_output=True, text=True)
    if r.returncode != 0:
        pytest.skip(f"embed build failed: {r.stderr[-500:]}")
    return NATIVE / "build" / "test_embed"


def _wire(scalars, points):
    """ints/affine-points -> (hex scalars line, hex points line)."""
    sl = interop.ints_to_limbs(scalars)
    px, py = interop.affine_points_to_limbs(points)  # Montgomery (wire form)
    sbytes = interop.to_h2c_bytes(sl).tobytes()
    pxy = np.stack([interop.to_h2c_bytes(px), interop.to_h2c_bytes(py)],
                   axis=1)  # (n, 2, 32)
    return sbytes.hex(), pxy.tobytes().hex()


def test_embed_c_abi_msm_matches_oracle(rng):
    driver = _build_embed()
    n = 24
    scalars = [int.from_bytes(rng.bytes(32), "little") % bn254.FR
               for _ in range(n - 2)] + [0, bn254.FR - 1]
    points = [oracle.ec_mul(oracle.GEN, int(rng.randint(1, 1 << 20)))
              for _ in range(n - 1)] + [None]
    shex, phex = _wire(scalars, points)

    env = dict(os.environ)
    env["PYTHONPATH"] = str(NATIVE.parent) + os.pathsep + env.get("PYTHONPATH", "")
    # The embedded interpreter must not try to claim the TPU tunnel.
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_PLATFORMS"] = "cpu"
    r = subprocess.run([str(driver), str(n)], input=f"{shex}\n{phex}\n",
                       capture_output=True, text=True, env=env, timeout=300)
    assert r.returncode == 0, f"driver failed: {r.stderr[-800:]}"
    out = bytes.fromhex(r.stdout.strip())
    assert len(out) == 64
    got_x = int.from_bytes(out[:32], "little")
    got_y = int.from_bytes(out[32:], "little")
    want = oracle.msm(scalars, points)
    assert want is not None and (got_x, got_y) == want


def test_embed_wire_roundtrip_zero():
    """All-zero scalars -> infinity encoding (0,0) through the wire shim
    (no subprocess: exercises msm_best_wire directly)."""
    from tpu_msm.bindings import embed

    scalars = [0, 0, 0]
    points = [oracle.ec_mul(oracle.GEN, k) for k in (2, 3, 4)]
    shex, phex = _wire(scalars, points)
    out = embed.msm_best_wire(bytes.fromhex(shex), bytes.fromhex(phex))
    assert out == bytes(64)
