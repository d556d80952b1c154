"""Streaming (chunked) MSM for sizes whose working set exceeds HBM.

At log 24 the fused pipeline's transient working set (17-operand sorted
payload + the (48, steps, lanes) prefix-scan output) is several GB per
window — too large to keep whole on a 16 GB v5e alongside double buffering.
Window sums are linear over the (point, digit) multiset, so the fix is the
same decomposition the mesh layer uses across chips (parallel/sharded.py),
applied sequentially on ONE chip: stream fixed-size chunks from the host,
accumulate per-window partial sums on device, Horner-fold once at the end.

The reference handles growth by letting unified-memory buffers grow and
splitting work with the CPU (src/metal/msm.rs:366-421); chunking like this
is the TPU-native equivalent for beyond-HBM sizes. Host->device transfers
overlap the previous chunk's compute via XLA async dispatch.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from tpu_msm.models import bn254
from tpu_msm.ops import curve, pippenger
from tpu_msm.ops.curve import AffinePoint, ProjPoint
from tpu_msm.utils.config import MsmConfig, select_config


@functools.partial(jax.jit, static_argnames=("cfg",))
def _chunk_window_sums(px, py, slimbs, cfg: MsmConfig) -> ProjPoint:
    return pippenger.window_sums(AffinePoint(px, py), slimbs, cfg)


@jax.jit
def _accumulate(acc: ProjPoint, ws: ProjPoint) -> ProjPoint:
    # (W, 16, 1) batched EC add — limb axis is axis 1, so vmap over windows.
    return jax.vmap(curve.proj_add)(acc, ws)


@functools.partial(jax.jit, static_argnames=("c",))
def _finish(wsums: ProjPoint, c: int) -> ProjPoint:
    return pippenger.horner_fold(wsums, c)


# Inputs up to this many bytes stay resident in HBM (chunk the TRANSIENTS,
# not the inputs): 3 coords+scalars at 2^24 are 3 GB of a 16 GB v5e, while
# the per-window transients (17-operand sorted payload + 48-row prefix
# scan) are what overflow. Re-streaming inputs per chunk costs a full
# host->device pass per MSM — measured 109.8 kpts/s at log 24 over the
# tunneled link vs ~1.8 Mpts/s compute (artifacts/bench_log24.log, r3).
_RESIDENT_INPUT_BYTES = 6 << 30


def msm_streamed(px, py, scalars, cfg: MsmConfig | None = None,
                 chunk_log: int = 20, resident: bool | None = None) -> ProjPoint:
    """MSM over host (16, N) limb arrays, chunked at 2^chunk_log points.

    px/py Montgomery affine coords, scalars standard form (numpy). N is
    padded up to a chunk multiple with zero scalars on the infinity point
    (absorbed by the window reduction). Exactly one compiled graph per
    chunk shape regardless of N. Returns the ProjPoint (16, 1) result.

    resident=True keeps the whole input on device and runs the chunked
    pipeline over device slices (one host->device pass total; the chunking
    bounds the per-window transient working set). resident=False re-streams
    every chunk from the host (for inputs that exceed HBM headroom). The
    default picks by input size (_RESIDENT_INPUT_BYTES). Inputs that are
    already jax device arrays skip the host pass entirely (and imply
    resident).
    """
    on_device = isinstance(px, jax.Array) and not isinstance(px, np.ndarray)
    if not on_device:
        px = np.ascontiguousarray(np.asarray(px, dtype=np.uint32))
        py = np.ascontiguousarray(np.asarray(py, dtype=np.uint32))
        scalars = np.ascontiguousarray(np.asarray(scalars, dtype=np.uint32))
    n = px.shape[1]
    chunk = 1 << chunk_log
    if n <= chunk:
        cfg = cfg or select_config(n)
        res = _chunk_window_sums(jnp.asarray(px), jnp.asarray(py),
                                 jnp.asarray(scalars), cfg)
        return _finish(res, cfg.window_bits)

    cfg = cfg or select_config(chunk)
    pad = (-n) % chunk
    if pad:
        pad_spec = ((0, 0), (0, pad))
        mod = jnp if on_device else np
        px = mod.pad(px, pad_spec)
        py = mod.pad(py, pad_spec)
        scalars = mod.pad(scalars, pad_spec)
        n += pad
    if resident is None:
        resident = on_device or 3 * px.nbytes <= _RESIDENT_INPUT_BYTES
    if resident:
        dpx, dpy, dsl = (jnp.asarray(a) for a in (px, py, scalars))

    acc = None
    for lo in range(0, n, chunk):
        if resident:
            ws = _chunk_window_sums(
                jax.lax.slice_in_dim(dpx, lo, lo + chunk, axis=1),
                jax.lax.slice_in_dim(dpy, lo, lo + chunk, axis=1),
                jax.lax.slice_in_dim(dsl, lo, lo + chunk, axis=1), cfg)
        else:
            ws = _chunk_window_sums(
                jnp.asarray(px[:, lo:lo + chunk]),
                jnp.asarray(py[:, lo:lo + chunk]),
                jnp.asarray(scalars[:, lo:lo + chunk]), cfg)
        acc = ws if acc is None else _accumulate(acc, ws)
    return _finish(acc, cfg.window_bits)
