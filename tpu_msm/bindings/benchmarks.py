"""Embedder-facing benchmark entry points.

Parity with the reference's uniffi FFI surface (src/ios_bindings.rs:6-26),
which exports two functions for the Swift benchmark app: run the hybrid
GPU+CPU `msm_best` and the CPU-only MSM on freshly generated random
instances, returning milliseconds. Here the "device" is the TPU and the
CPU side is the native C++ engine; both run on the framework's fixture
instances so numbers are comparable with bench.py.
"""

from __future__ import annotations

import time

import numpy as np


def benchmark_tpu_msm_best(log_size: int, seed: int = 42) -> float:
    """Device MSM wall-time in milliseconds at 2^log_size random points
    (reference: benchmark_h2c_metal_and_cpu_msm_best, ios_bindings.rs:6-16).
    Compile time is excluded (one warm-up run)."""
    import jax.numpy as jnp

    from tpu_msm import msm_device
    from tpu_msm.utils import preprocess
    from tpu_msm.utils.config import select_config

    inst = preprocess.get_or_create_msm_instances(log_size, 1, seed=seed)[0]
    cfg = select_config(inst.size)
    px, py, sl = (jnp.asarray(inst.px), jnp.asarray(inst.py),
                  jnp.asarray(inst.scalars))
    res = msm_device(px, py, sl, cfg)
    np.asarray(res.x)  # warm-up + true sync
    t0 = time.perf_counter()
    res = msm_device(px, py, sl, cfg)
    np.asarray(res.x)
    return (time.perf_counter() - t0) * 1e3


def benchmark_cpu_msm_best(log_size: int, seed: int = 42) -> float:
    """Native C++ engine MSM wall-time in milliseconds
    (reference: benchmark_h2c_cpu_msm_best, ios_bindings.rs:18-26)."""
    from tpu_msm.bindings import native
    from tpu_msm.utils import preprocess

    inst = preprocess.get_or_create_msm_instances(log_size, 1, seed=seed)[0]
    t0 = time.perf_counter()
    native.msm_jacobian_limbs(inst.px, inst.py, inst.scalars)
    return (time.perf_counter() - t0) * 1e3
