"""Hybrid device + host-CPU MSM (reference: `gpu_with_cpu`,
src/metal/msm.rs:366-421).

The reference splits the input by a size-dependent static ratio, runs the
GPU pipeline on one part and `halo2curves::msm_best` on the other in a
second thread (synchronized by a condvar after the GPU's CPU-side sort),
then adds the two partial results. The TPU translation:

* the device part dispatches asynchronously (XLA enqueue returns
  immediately), so the native C++ engine (bindings/native.py, the
  halo2curves stand-in) runs on the host CONCURRENTLY with device compute —
  no condvar needed; the host fetch of the device result is the join.
* the split ratio mirrors the reference's ladder (device share 2/3 at
  >= 2^20, 1/2 at >= 2^18, 1/3 below; msm.rs:377-383) but is a config knob.
* partial results are EC-added on the host (2 points; oracle arithmetic).

On most TPU hosts the device alone wins (chips are fast, host cores few),
so `msm_best` does not route here by default — this is the architecture-
parity surface for deployments with real host cores, and `cli.profiler`
exposes it as the `hybrid` run mode (≙ the reference's `gpu_cpu`).
"""

from __future__ import annotations

import threading
from typing import Optional, Tuple

import numpy as np

Affine = Optional[Tuple[int, int]]


def device_share(n: int) -> float:
    """The reference's split ladder (msm.rs:377-383)."""
    if n >= 1 << 20:
        return 2 / 3
    if n >= 1 << 18:
        return 1 / 2
    return 1 / 3


def msm_hybrid(px, py, scalars, cfg=None, share: float | None = None) -> Affine:
    """MSM over (16, N) limb arrays, split between the device pipeline and
    the native C++ host engine. Returns the affine result (standard form).
    """
    import jax.numpy as jnp

    from tpu_msm import msm_device
    from tpu_msm.bindings import native
    from tpu_msm.utils import interop, oracle
    from tpu_msm.utils.config import select_config

    px = np.ascontiguousarray(np.asarray(px, dtype=np.uint32))
    py = np.ascontiguousarray(np.asarray(py, dtype=np.uint32))
    scalars = np.ascontiguousarray(np.asarray(scalars, dtype=np.uint32))
    n = px.shape[1]
    if n == 0:
        return None
    if not native.available():  # no toolchain: fall through to device-only
        share = 1.0
    if share is None:
        share = device_share(n)
    split = max(1, min(n, int(n * share)))

    cpu_result: list = [None]
    cpu_error: list = [None]

    def cpu_half():  # runs while the device computes its half
        try:
            if split < n:
                cpu_result[0] = native.msm(px[:, split:], py[:, split:],
                                           scalars[:, split:])
        except BaseException as e:  # re-raised on the caller thread below —
            # a swallowed failure would silently drop the CPU partial and
            # return a wrong result.
            cpu_error[0] = e

    t = threading.Thread(target=cpu_half)
    t.start()
    cfg_dev = cfg or select_config(split)
    res = msm_device(jnp.asarray(px[:, :split]), jnp.asarray(py[:, :split]),
                     jnp.asarray(scalars[:, :split]), cfg_dev)
    [dev_pt] = interop.proj_limbs_to_affine_points(
        np.asarray(res.x), np.asarray(res.y), np.asarray(res.z))
    t.join()
    if cpu_error[0] is not None:
        raise RuntimeError("hybrid CPU half failed") from cpu_error[0]
    return oracle.ec_add(dev_pt, cpu_result[0])
