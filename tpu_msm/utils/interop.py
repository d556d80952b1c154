"""Host <-> device data interop: Python ints / arkworks / halo2curves limb
formats <-> the framework's little-endian u16-limb arrays.

TPU-native counterpart of `src/metal/abstraction/limbs_conversion.rs:7-390`
(`ToLimbs`/`FromLimbs`/`ScalarGPU`/`PointGPU` and the Ark*/H2* impls). The
reference serializes as **big-endian 8x32-bit** limbs (limbs_conversion.rs:
87-106 for ark, 239-280 for h2c byte-reversal); our device format is
little-endian 16x16-bit limbs-first (see tpu_msm.ops.u256). This module holds
the only code that knows both formats, exactly as limbs_conversion.rs is the
reference's single bridging point.

Vectorized numpy throughout — the reference parallelizes conversion with
rayon (limbs_conversion.rs:20-41); here one numpy pass over the whole batch
does the same job.
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import numpy as np

from tpu_msm.models import bn254
from tpu_msm.models.bn254 import LIMBS, LIMB_BITS, P, R

Affine = Optional[Tuple[int, int]]


# ---------------------------------------------------------------------------
# Python ints <-> u16-limb device arrays (shape (16, n))
# ---------------------------------------------------------------------------

def ints_to_limbs(values: Sequence[int]) -> np.ndarray:
    """List of ints (< 2^256) -> (16, n) uint32 little-endian u16 limbs."""
    n = len(values)
    # Via the bytes representation for speed: (n, 32) uint8 -> (16, n) uint16.
    buf = np.frombuffer(
        b"".join(int(v).to_bytes(32, "little") for v in values), dtype="<u2"
    ).reshape(n, LIMBS)
    return np.ascontiguousarray(buf.T).astype(np.uint32)


def limbs_to_ints(limbs: np.ndarray) -> List[int]:
    """(k, n) limb array -> list of Python ints (any limb count k).

    Fast path for canonical (< 2^16) limbs goes through one bytes buffer —
    a single int.from_bytes per element instead of k Python ops (the exit
    analogue of the reference's zero-copy readback, msm.rs:330-343)."""
    limbs = np.asarray(limbs)
    k, n = limbs.shape
    if n and limbs.max(initial=0) < (1 << LIMB_BITS):
        data = np.ascontiguousarray(limbs.T.astype("<u2")).tobytes()
        step = 2 * k
        return [int.from_bytes(data[j * step:(j + 1) * step], "little")
                for j in range(n)]
    limbs = limbs.astype(np.uint64)
    out = [0] * n
    for i in range(k - 1, -1, -1):
        row = limbs[i]
        for j in range(n):
            out[j] = (out[j] << LIMB_BITS) | int(row[j])
    return out


# ---------------------------------------------------------------------------
# Montgomery-form host conversion (vectorized, no device round-trip needed)
# ---------------------------------------------------------------------------

def fp_ints_to_mont_limbs(values: Sequence[int]) -> np.ndarray:
    """Standard-form field ints -> Montgomery-form (16, n) limbs."""
    return ints_to_limbs([v * R % P for v in values])


def mont_limbs_to_fp_ints(limbs: np.ndarray) -> List[int]:
    rinv = pow(R, -1, P)
    return [v * rinv % P for v in limbs_to_ints(limbs)]


# ---------------------------------------------------------------------------
# Affine points <-> device arrays. Infinity sentinel: (0, 0).
# ---------------------------------------------------------------------------

def affine_points_to_limbs(points: Sequence[Affine], mont: bool = True):
    """Oracle points -> (x_limbs, y_limbs), each (16, n), Montgomery by default."""
    xs = [0 if p is None else p[0] for p in points]
    ys = [0 if p is None else p[1] for p in points]
    if mont:
        xs = [x * R % P for x in xs]
        ys = [y * R % P for y in ys]
    return ints_to_limbs(xs), ints_to_limbs(ys)


def limbs_to_affine_points(x_limbs, y_limbs, mont: bool = True) -> List[Affine]:
    xs = limbs_to_ints(np.asarray(x_limbs))
    ys = limbs_to_ints(np.asarray(y_limbs))
    if mont:
        rinv = pow(R, -1, P)
        xs = [x * rinv % P for x in xs]
        ys = [y * rinv % P for y in ys]
    return [None if x == 0 and y == 0 else (x, y) for x, y in zip(xs, ys)]


def proj_limbs_to_affine_points(x_limbs, y_limbs, z_limbs) -> List[Affine]:
    """Device homogeneous-projective (Montgomery) -> oracle affine points,
    on the host: x = X/Z, y = Y/Z (infinity iff Z == 0). The projective
    counterpart of jac_limbs_to_affine_points (same host-side-readback role
    as the reference's final_accumulation.rs:5-16)."""
    rinv = pow(R, -1, P)
    xs = [v * rinv % P for v in limbs_to_ints(np.asarray(x_limbs))]
    ys = [v * rinv % P for v in limbs_to_ints(np.asarray(y_limbs))]
    zs = [v * rinv % P for v in limbs_to_ints(np.asarray(z_limbs))]
    out: List[Affine] = []
    for x, y, z in zip(xs, ys, zs):
        if z == 0:
            out.append(None)
        else:
            zinv = pow(z, P - 2, P)
            out.append((x * zinv % P, y * zinv % P))
    return out


def jac_limbs_to_affine_points(x_limbs, y_limbs, z_limbs) -> List[Affine]:
    """Device Jacobian (Montgomery) -> oracle affine points, on the host.

    Host-side normalization (Python pow for the inverse) so tests never pay
    the device's unrolled inv_mont graph; mirrors the reference reading back
    `res_buffer` and folding on the CPU (final_accumulation.rs:5-16).
    """
    rinv = pow(R, -1, P)
    xs = [v * rinv % P for v in limbs_to_ints(np.asarray(x_limbs))]
    ys = [v * rinv % P for v in limbs_to_ints(np.asarray(y_limbs))]
    zs = [v * rinv % P for v in limbs_to_ints(np.asarray(z_limbs))]
    out: List[Affine] = []
    for x, y, z in zip(xs, ys, zs):
        if z == 0:
            out.append(None)
        else:
            zinv = pow(z, P - 2, P)
            out.append((x * zinv * zinv % P, y * zinv * zinv * zinv % P))
    return out


# ---------------------------------------------------------------------------
# Reference wire formats (parity with limbs_conversion.rs).
# ---------------------------------------------------------------------------

def to_ark_u32_limbs(limbs: np.ndarray) -> np.ndarray:
    """Our (16, n) u16 limbs -> reference big-endian (n, 8) u32 limbs.

    ark format: limbs[0] = most-significant 32 bits
    (limbs_conversion.rs:87-106)."""
    limbs = np.asarray(limbs, dtype=np.uint32)
    n = limbs.shape[1]
    out = np.zeros((n, 8), dtype=np.uint32)
    for j in range(8):
        lo = limbs[2 * (7 - j)]
        hi = limbs[2 * (7 - j) + 1]
        out[:, j] = (hi << np.uint32(16)) | lo
    return out


def from_ark_u32_limbs(ark: np.ndarray) -> np.ndarray:
    """Reference big-endian (n, 8) u32 limbs -> our (16, n) u16 limbs."""
    ark = np.asarray(ark, dtype=np.uint32)
    n = ark.shape[0]
    out = np.zeros((LIMBS, n), dtype=np.uint32)
    for j in range(8):
        out[2 * (7 - j)] = ark[:, j] & np.uint32(0xFFFF)
        out[2 * (7 - j) + 1] = ark[:, j] >> np.uint32(16)
    return out


def to_h2c_bytes(limbs: np.ndarray) -> np.ndarray:
    """Our (16, n) limbs -> (n, 32) little-endian bytes (halo2curves repr;
    the reference reaches this via byte reversal, limbs_conversion.rs:239-280)."""
    limbs16 = np.asarray(limbs, dtype=np.uint32).astype(np.uint16)
    return np.ascontiguousarray(limbs16.T).view(np.uint8).reshape(-1, 32)


def from_h2c_bytes(data: np.ndarray) -> np.ndarray:
    """(n, 32) little-endian bytes -> our (16, n) limbs."""
    data = np.ascontiguousarray(np.asarray(data, dtype=np.uint8))
    limbs16 = data.view("<u2").reshape(-1, LIMBS)
    return np.ascontiguousarray(limbs16.T).astype(np.uint32)
