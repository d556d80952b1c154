"""ctypes bindings to the native C++ CPU MSM engine (native/msm_cpu.cpp).

Counterpart of the reference's FFI surface (src/ios_bindings.rs uses uniffi to
export Rust to Swift; here the direction is C++ -> Python via ctypes, per the
TPU framework's layering: JAX for device compute, C++ for host compute).

The shared library is built on first use with `make -C native` (mirroring the
reference's build.rs compiling shaders at build time) and cached; set
TPU_MSM_NATIVE_DIR to point at a prebuilt tree.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from pathlib import Path
from typing import List, Optional, Tuple

import numpy as np

from tpu_msm.models import bn254

_REPO_ROOT = Path(__file__).resolve().parents[2]
_NATIVE_DIR = Path(os.environ.get("TPU_MSM_NATIVE_DIR", _REPO_ROOT / "native"))

_lib: Optional[ctypes.CDLL] = None
# Initialization-only lock: the engine itself is reentrant (msm_cpu.cpp holds
# no global mutable state — every call works on caller-owned buffers), so
# concurrent msm() calls after load need no serialization. This is the
# designed-in answer to the reference's global GPU mutex (msm.rs:250-255),
# which exists because ITS concurrent MSMs once corrupted results.
_load_lock = threading.Lock()

Affine = Optional[Tuple[int, int]]


class NativeBuildError(RuntimeError):
    pass


def _build() -> Path:
    so = _NATIVE_DIR / "build" / "libtpu_msm_cpu.so"
    src = _NATIVE_DIR / "msm_cpu.cpp"
    if so.exists() and src.exists() and so.stat().st_mtime >= src.stat().st_mtime:
        return so
    try:
        subprocess.run(
            ["make", "-C", str(_NATIVE_DIR)],
            check=True, capture_output=True, text=True,
        )
    except (subprocess.CalledProcessError, FileNotFoundError) as e:
        detail = getattr(e, "stderr", "") or str(e)
        raise NativeBuildError(f"native engine build failed: {detail}") from e
    return so


def _load() -> ctypes.CDLL:
    global _lib
    if _lib is None:
        with _load_lock:
            if _lib is not None:
                return _lib
            lib = ctypes.CDLL(str(_build()))
            u32p = ctypes.POINTER(ctypes.c_uint32)
            lib.tpu_msm_cpu_msm.argtypes = [
                u32p, u32p, u32p, ctypes.c_size_t, u32p]
            lib.tpu_msm_cpu_to_affine.argtypes = [u32p, u32p]
            lib.tpu_msm_cpu_ec_mul_batch.argtypes = [
                u32p, u32p, ctypes.c_size_t, u32p, u32p]
            lib.tpu_msm_cpu_abi_version.restype = ctypes.c_int
            assert lib.tpu_msm_cpu_abi_version() == 1
            _lib = lib
    return _lib


def available() -> bool:
    try:
        _load()
        return True
    except (NativeBuildError, OSError):
        return False


def _as_u32(a) -> np.ndarray:
    arr = np.ascontiguousarray(np.asarray(a), dtype=np.uint32)
    return arr


def _ptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32))


def msm_jacobian_limbs(px, py, scalars) -> np.ndarray:
    """(16, n) limb arrays -> (48,) u32 Jacobian result limbs (Montgomery)."""
    lib = _load()
    px, py, scalars = _as_u32(px), _as_u32(py), _as_u32(scalars)
    n = px.shape[1]
    out = np.zeros(48, dtype=np.uint32)
    lib.tpu_msm_cpu_msm(_ptr(px), _ptr(py), _ptr(scalars), n, _ptr(out))
    return out


def msm(px, py, scalars) -> Affine:
    """Full CPU MSM on framework limb arrays -> affine int point (or None)."""
    from tpu_msm.utils import interop

    xyz = msm_jacobian_limbs(px, py, scalars)
    lib = _load()
    xy = np.zeros(32, dtype=np.uint32)
    lib.tpu_msm_cpu_to_affine(_ptr(xyz), _ptr(xy))
    if not xy.any():
        return None
    [pt] = interop.limbs_to_affine_points(
        xy[:16].reshape(16, 1), xy[16:].reshape(16, 1)
    )
    return pt


def ec_mul_batch(base: Affine, scalars) -> Tuple[np.ndarray, np.ndarray]:
    """out[j] = scalars[j] * base; scalars is a (16, n) standard-form limb
    array; returns Montgomery affine (px, py) limb arrays (16, n)."""
    from tpu_msm.utils import interop

    lib = _load()
    scalars = _as_u32(scalars)
    n = scalars.shape[1]
    bx, by = interop.affine_points_to_limbs([base])
    base_xy = np.concatenate([bx[:, 0], by[:, 0]]).astype(np.uint32)
    out_px = np.zeros((bn254.LIMBS, n), dtype=np.uint32)
    out_py = np.zeros((bn254.LIMBS, n), dtype=np.uint32)
    lib.tpu_msm_cpu_ec_mul_batch(_ptr(base_xy), _ptr(scalars), n,
                                 _ptr(out_px), _ptr(out_py))
    return out_px, out_py
