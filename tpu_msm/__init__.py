"""tpu-msm: TPU-native multi-scalar multiplication over BN254 G1.

Brand-new JAX/XLA/Pallas framework with the capabilities of the Metal-GPU
reference (`ElusAegis/metal-msm-gpu-acceleration`): Pippenger MSM with
Montgomery limb arithmetic, complete Jacobian EC ops, host interop for
arkworks/halo2curves formats, fixtures, profiling CLI, and a multi-chip
sharded backend.

Public entry points (parity with the reference's crate surface,
src/metal/mod.rs:7 re-exporting `msm_best`):

    msm_best(scalars, points)   adaptive dispatcher (msm.rs:423-507 analogue)
    msm(points, scalars)        direct device MSM, host-friendly args
    msm_device(...)             jit-compiled device pipeline on limb arrays
"""

from __future__ import annotations

import functools
from typing import List, Optional, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from tpu_msm.models import bn254
from tpu_msm.ops import pippenger
from tpu_msm.ops.curve import AffinePoint, ProjPoint
from tpu_msm.utils import interop
from tpu_msm.utils.config import MsmConfig, select_config

__version__ = "0.1.0"

Affine = Optional[Tuple[int, int]]

# Zero-filter threshold: reference filters zero scalars when >= 30% are zero
# (src/metal/msm.rs:447-507). Our window reduction absorbs zero digits for
# free, but dropping them still shrinks the scan, so the behavior is kept.
ZERO_FILTER_THRESHOLD = 0.30

# Below this size the adaptive dispatcher uses the native C++ host engine
# instead of the device (reference: size < 2^17 -> pure CPU
# halo2curves::msm_best, src/metal/msm.rs:440-444; our crossover is lower
# because the TPU pipeline amortizes better). Override: TPU_MSM_CPU_THRESHOLD.
import os as _os

CPU_THRESHOLD = int(_os.environ.get("TPU_MSM_CPU_THRESHOLD", 1 << 13))


@functools.partial(jax.jit, static_argnames=("cfg",))
def msm_device(px, py, scalar_limbs, cfg: MsmConfig) -> ProjPoint:
    """Jitted device MSM on limb arrays. px/py: (16, N) Montgomery affine
    coords; scalar_limbs: (16, N) standard form. Returns ProjPoint (16, 1)."""
    return pippenger.msm_projective(AffinePoint(px, py), scalar_limbs, cfg)


def msm(
    points,
    scalars,
    cfg: MsmConfig | None = None,
) -> Affine:
    """Host-friendly MSM: oracle-style points/scalars in, affine point out.

    points: list of (x, y) int tuples (None = infinity) OR an
            (x_limbs, y_limbs) pair of (16, N) Montgomery limb arrays.
    scalars: list of ints OR a (16, N) standard-form limb array.
    """
    if isinstance(points, (list, tuple)) and len(points) == 2 and hasattr(points[0], "shape"):
        px, py = points
    else:
        px, py = interop.affine_points_to_limbs(points)
    if hasattr(scalars, "shape"):
        slimbs = scalars
    else:
        slimbs = interop.ints_to_limbs([s % bn254.FR for s in scalars])
    # Shape bucketing: XLA compiles per static shape, so pad N up to the next
    # power of two (>= 32) with zero scalars on the infinity point — both are
    # absorbed for free by the window reduction. The reference has no
    # analogue (Metal kernels take dynamic sizes); this is the idiomatic XLA
    # answer to recompile churn.
    n = px.shape[1]
    n_pad = max(32, 1 << (n - 1).bit_length())
    if n_pad != n:
        pad = ((0, 0), (0, n_pad - n))
        px, py, slimbs = (np.pad(np.asarray(a), pad) for a in (px, py, slimbs))
        n = n_pad
    if cfg is None:
        cfg = select_config(n)
    res = msm_device(jnp.asarray(px), jnp.asarray(py), jnp.asarray(slimbs), cfg)
    [pt] = interop.proj_limbs_to_affine_points(
        np.asarray(res.x), np.asarray(res.y), np.asarray(res.z)
    )
    return pt


def msm_best(scalars: Sequence[int], points: Sequence[Affine]) -> Affine:
    """Adaptive MSM dispatcher (reference: msm_best, src/metal/msm.rs:423-507).

    Argument order matches the reference (scalars first). Filters zero scalars
    when they exceed the 30% threshold, then runs the size-selected config.
    """
    scalars = [s % bn254.FR for s in scalars]
    if len(scalars) != len(points):
        raise ValueError("scalars and points must have equal length")
    n = len(scalars)
    if n == 0:
        return None
    num_zeros = sum(1 for s in scalars if s == 0)
    if num_zeros >= ZERO_FILTER_THRESHOLD * n and num_zeros < n:
        kept = [(s, p) for s, p in zip(scalars, points) if s != 0]
        scalars = [s for s, _ in kept]
        points = [p for _, p in kept]
    elif num_zeros == n:
        return None
    if len(scalars) < CPU_THRESHOLD:
        from tpu_msm.bindings import native

        if native.available():
            px, py = interop.affine_points_to_limbs(points)
            return native.msm(px, py, interop.ints_to_limbs(scalars))
    return msm(points, scalars)
