"""Embedder-facing wire API: the Python half of the C ABI surface.

Reference parity: src/ios_bindings.rs:6-39 exports the GPU MSM to a Swift
host via uniffi; gen_ios_bindings.rs packages it as an xcframework. The TPU
equivalent is native/tpu_msm_embed.cpp — a C library that embeds CPython and
calls THIS module — so any C/C++/Swift/Rust host can invoke the device MSM
through a stable C ABI (`tpu_msm_init` / `tpu_msm_best` / `tpu_msm_benchmark`).

Wire formats (all little-endian, matching the h2c byte repr the reference
moves across its FFI — limbs_conversion.rs:239-280):

* scalars: n * 32 bytes, standard (non-Montgomery) form, value < r.
* points:  n * 64 bytes, affine (x, y), **Montgomery form** — the reference
  likewise ships host-repr Montgomery limbs across the boundary
  (limbs_conversion.rs:87-106: ark/h2c store field elements in Montgomery
  form and serialize them as-is). (0, 0) encodes the point at infinity.
* result:  64 bytes, affine (x, y) standard form; (0, 0) = infinity.

Only numpy enters/leaves here — no per-element Python loops on the hot
boundary (role of the reference's zero-copy cast, msm.rs:257-285).
"""

from __future__ import annotations

import time

import numpy as np

from tpu_msm.models import bn254
from tpu_msm.utils import interop


def msm_best_wire(scalars: bytes, points: bytes) -> bytes:
    """Wire-format adaptive MSM (C ABI backend for `tpu_msm_best`).

    scalars: n*32 bytes standard-form Fr; points: n*64 bytes Montgomery
    affine (x||y). Returns 64 bytes standard-form affine ((0,0) = infinity).
    """
    import tpu_msm

    if len(scalars) % 32 or len(points) % 64:
        raise ValueError("scalars must be n*32 bytes, points n*64 bytes")
    n = len(scalars) // 32
    if len(points) != 64 * n:
        raise ValueError(f"{n} scalars but {len(points) // 64} points")
    if n == 0:
        return bytes(64)
    sl = interop.from_h2c_bytes(np.frombuffer(scalars, np.uint8).reshape(n, 32))
    pxy = np.frombuffer(points, np.uint8).reshape(n, 2, 32)
    px = interop.from_h2c_bytes(pxy[:, 0])
    py = interop.from_h2c_bytes(pxy[:, 1])
    res = tpu_msm.msm_best(sl, (px, py))
    if res is None:
        return bytes(64)
    x, y = res
    return x.to_bytes(32, "little") + y.to_bytes(32, "little")


def benchmark_msm_best(log_n: int = 16, iters: int = 1) -> float:
    """Generate a random instance and time msm_best; returns mean
    milliseconds (parity with benchmark_h2c_metal_and_cpu_msm_best,
    src/ios_bindings.rs:6-16)."""
    import tpu_msm
    from tpu_msm.utils import preprocess

    [inst] = preprocess.get_or_create_msm_instances(log_n, 1)
    tpu_msm.msm_best(inst.scalars, (inst.px, inst.py))  # warm/compile
    t0 = time.perf_counter()
    for _ in range(iters):
        tpu_msm.msm_best(inst.scalars, (inst.px, inst.py))
    return (time.perf_counter() - t0) / max(iters, 1) * 1e3
