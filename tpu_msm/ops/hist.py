"""Bucket segment starts via an MXU histogram — the round-5 replacement for
the searchsorted stage.

The pipeline needs s_b = #{i : digit_i < b} for every bucket b = 1..m (the
reference binary-searches these per threadgroup,
/root/reference/src/metal/shader/msm.h.metal:119-131). The r4 trace showed
the vectorized binary search ('ss_scan') costing ~157 ms of the 403 ms
e2e at 2^20 — 20 gather rounds x 33k queries x 16 windows, and TPU gather
cost is per-element (artifacts/trace_log20_r4b.log, docs/PERF_NOTES.md).

This module computes the same counts with ZERO gathers and ZERO scatters:

    s_b = cumsum(hist)[b-1],   hist[d] = #{i : digit_i == d}

and the histogram is a matrix product. Split each digit d = 256*hi + lo;
then

    hist2d[h, l] = sum_i [hi_i == h] * [lo_i == l]  =  A^T B

with A = onehot(hi) (n, H) and B = onehot(lo) (n, 256). One-hot entries are
0/1 (exact in bfloat16) and per-chunk partial products are < chunk size, so
f32 MXU accumulation is exact; the running total accumulates in int32.
Digits never need to be sorted — the histogram is order-free, which also
takes this stage OFF the sort's critical path.

Cost at 2^20, m = 2^15 (signed c=16): 129x256xn MACs ~= 35 G MACs/window —
~0.4 ms of MXU time vs ~10 ms of searchsorted gathers. Two code paths:

* `segment_starts_hist`        — plain jnp (any backend; XLA materializes
                                 the one-hots in HBM: ~0.8 GB streamed).
* `segment_starts_hist_pallas` — fused kernel: one-hots built per 2048-digit
                                 chunk in VMEM, dot on the MXU, int32
                                 accumulator in VMEM scratch. No HBM
                                 traffic beyond reading the digits once.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Digits per grid step of the fused kernel. VMEM per step: A^T (H, 2048) +
# B (2048, 256) bf16 + f32 partial + i32 accumulator — ~2 MB at H=136.
CHUNK = 2048


def _nhi(m: int) -> int:
    """Rows of the hi one-hot: hi = digit >> 8 for digits in [0, m+1]."""
    return ((m + 1) >> 8) + 1


def _counts_to_starts(counts, m: int):
    """hist[0..m-1] -> s_b = #{digits < b} for b = 1..m, int32 (m,)."""
    return jnp.cumsum(counts[:m].astype(jnp.int32))


def segment_starts_hist(digits, m: int):
    """s_b for b = 1..m from UNSORTED (n,) uint32 digits (values <= m+1;
    the value m+1 is the padding sentinel, counted by no query). Plain-XLA
    path: exact on every backend."""
    h = _nhi(m)
    hi = (digits >> jnp.uint32(8)).astype(jnp.int32)
    lo = (digits & jnp.uint32(0xFF)).astype(jnp.int32)
    a = (hi[:, None] == jnp.arange(h, dtype=jnp.int32)[None, :]).astype(
        jnp.bfloat16)
    b = (lo[:, None] == jnp.arange(256, dtype=jnp.int32)[None, :]).astype(
        jnp.bfloat16)
    hist2d = jax.lax.dot_general(
        a, b, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32)
    return _counts_to_starts(hist2d.reshape(-1), m)


def _hist_kernel(dr_ref, dc_ref, o_ref, acc):
    """One grid step: histogram CHUNK digits into the (H, 256) accumulator.

    dr_ref: (1, 1, CHUNK) digits (row layout, feeds the hi one-hot);
    dc_ref: (1, CHUNK, 1) the same digits (column layout, feeds the lo
    one-hot) — two host-side views of one array so both one-hots broadcast
    against an iota without any in-kernel transpose."""
    h = acc.shape[0]

    @pl.when(pl.program_id(0) == 0)
    def _():
        acc[...] = jnp.zeros(acc.shape, jnp.int32)

    hi = (dr_ref[0] >> jnp.uint32(8)).astype(jnp.int32)   # (1, CHUNK)
    lo = (dc_ref[0] & jnp.uint32(0xFF)).astype(jnp.int32)  # (CHUNK, 1)
    a_t = (hi == jax.lax.broadcasted_iota(
        jnp.int32, (h, CHUNK), 0)).astype(jnp.bfloat16)      # (H, CHUNK)
    b = (lo == jax.lax.broadcasted_iota(
        jnp.int32, (CHUNK, 256), 1)).astype(jnp.bfloat16)    # (CHUNK, 256)
    part = jax.lax.dot_general(
        a_t, b, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    acc[...] += part.astype(jnp.int32)

    @pl.when(pl.program_id(0) == pl.num_programs(0) - 1)
    def _():
        o_ref[...] = acc[...]


@functools.partial(jax.jit, static_argnames=("m", "interpret"))
def digit_hist_pallas(digits, m: int, interpret: bool = False):
    """(n,) uint32 digits (n % CHUNK == 0, values <= m+1) -> (H*256,) int32
    histogram, fused one-hot + MXU dot per 2048-digit chunk."""
    n = digits.shape[0]
    assert n % CHUNK == 0, n
    h = -(-_nhi(m) // 8) * 8  # sublane-align the hi axis
    steps = n // CHUNK
    # 3-D layouts whose TRAILING TWO dims equal the block's (Mosaic requires
    # the last two block dims divisible by (8, 128) or equal to the array's;
    # leading dims may be blocked by 1 freely).
    dr = digits.reshape(steps, 1, CHUNK)
    dc = digits.reshape(steps, CHUNK, 1)
    out = pl.pallas_call(
        _hist_kernel,
        grid=(steps,),
        in_specs=[
            pl.BlockSpec((1, 1, CHUNK), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, CHUNK, 1), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((h, 256), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((h, 256), jnp.int32),
        scratch_shapes=[pltpu.VMEM((h, 256), jnp.int32)],
        interpret=interpret,
    )(dr, dc)
    return out.reshape(-1)


def segment_starts_hist_pallas(digits, m: int, interpret: bool = False):
    """Fused-kernel variant of segment_starts_hist (n % 2048 == 0)."""
    return _counts_to_starts(digit_hist_pallas(digits, m, interpret), m)


def _hist_kernel2(dr_ref, o_ref, acc):
    """Row-layout-only variant: both one-hots build from the (1, CHUNK) row
    and the dot contracts on the SHARED chunk axis (A^T at (H, CHUNK) times
    B^T at (256, CHUNK), contracting dim 1 with dim 1 — a transposed-RHS
    matmul the MXU handles natively). Removes the (steps, CHUNK, 1) column
    input whose T(8,128)-tiled relayout cost 0.82 ms/window at 2^20 — more
    than the kernel itself (trace r5: reshape.4538, hist.py dc view)."""
    h = acc.shape[0]

    @pl.when(pl.program_id(0) == 0)
    def _():
        acc[...] = jnp.zeros(acc.shape, jnp.int32)

    d = dr_ref[0].astype(jnp.int32)                        # (1, CHUNK)
    a_t = ((d >> 8) == jax.lax.broadcasted_iota(
        jnp.int32, (h, CHUNK), 0)).astype(jnp.bfloat16)    # (H, CHUNK)
    b_t = ((d & 255) == jax.lax.broadcasted_iota(
        jnp.int32, (256, CHUNK), 0)).astype(jnp.bfloat16)  # (256, CHUNK)
    part = jax.lax.dot_general(
        a_t, b_t, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    acc[...] += part.astype(jnp.int32)

    @pl.when(pl.program_id(0) == pl.num_programs(0) - 1)
    def _():
        o_ref[...] = acc[...]


@functools.partial(jax.jit, static_argnames=("m", "interpret"))
def digit_hist_pallas2(digits, m: int, interpret: bool = False):
    """Row-input-only digit histogram (see _hist_kernel2)."""
    n = digits.shape[0]
    assert n % CHUNK == 0, n
    h = -(-_nhi(m) // 8) * 8
    steps = n // CHUNK
    dr = digits.reshape(steps, 1, CHUNK)
    out = pl.pallas_call(
        _hist_kernel2,
        grid=(steps,),
        in_specs=[pl.BlockSpec((1, 1, CHUNK), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((h, 256), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((h, 256), jnp.int32),
        scratch_shapes=[pltpu.VMEM((h, 256), jnp.int32)],
        interpret=interpret,
    )(dr)
    return out.reshape(-1)


def segment_starts_hist_pallas2(digits, m: int, interpret: bool = False):
    """Row-input variant of segment_starts_hist_pallas."""
    return _counts_to_starts(digit_hist_pallas2(digits, m, interpret), m)
