"""TPU-native Pippenger MSM pipeline.

Counterpart of the reference's five-stage pipeline (src/metal/msm.rs:189-217):

  reference (Metal GPU + CPU)                this module (one jitted graph)
  -------------------------------            ------------------------------
  1. prepare_buckets_indices kernel          window_digits(): limb-aligned
     (msm.h.metal:17-59)                     digit extraction, no pair list
  2. CPU rayon sort (sort_buckets.rs)        lax.sort_key_val on device
  3. bucket_wise_accumulation kernel         vectorized EC inclusive prefix
     (msm.h.metal:61-315)                    scan over sorted points
  4. sum_reduction kernels                   telescoped window reduction
     (msm.h.metal:319-562)                   (identity below), no buckets
  5. CPU final_accumulation Horner fold      on-device Horner fori_loop

The bucket matrix never materializes. With points sorted by digit, let X(p)
be the EC prefix sum of the first p sorted points and s_b the first position
of digit b. Since bucket_b = X(s_{b+1}) - X(s_b), the window sum telescopes:

    sum_{b=1}^{M} b * bucket_b  =  M * X(n) - sum_{b=1}^{M} X(s_b),   M = 2^c-1

Two bonuses fall out: zero-digit points cancel automatically (they sit before
s_1, appearing M times in M*X(n) and once in each of the M subtracted terms),
so no sentinel filtering is needed (the reference emits/filters 0xFFFFFFFF
sentinels, msm.h.metal:50-57); and there is no segmented accumulation at all,
which was the reference's bug farm (the three minimized regression cases in
bucket_wise_accumulation.rs:386-487).

The prefix scan runs as `scan_lanes` independent sequential lane scans (one
vectorized complete mixed-add per step) plus a log-depth inter-lane carry
scan — the structural cousin of the reference's thread-sequential scan with
boundary merge (msm.h.metal:169-297), minus the boundary special cases.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp

from tpu_msm.models import bn254
from tpu_msm.ops import curve, field, u256
from tpu_msm.ops.curve import AffinePoint, ProjPoint
from tpu_msm.utils.config import MsmConfig, resolve_backend, select_config


def _ceil_log2(x: int) -> int:
    return max(0, (x - 1).bit_length())


# ---------------------------------------------------------------------------
# EC-op backend dispatch: wide batches go to the fused Pallas kernels
# (tpu_msm.ops.pallas_curve — VMEM-resident, ~33x faster per scan step than
# the XLA-fused jnp path on TPU); narrow batches and the CPU backend use the
# jnp ops (Pallas kernels need the lane count to be a multiple of 1024).
# ---------------------------------------------------------------------------

_PALLAS_MIN_WIDTH = 1024

# Widest lane count the whole-stage fused kernels (scan_madd_packed /
# fold_add_packed) accept: VMEM must hold 3 accumulator coords + in/out
# blocks with double buffering (~7 MB at 8192 lanes, 16 MB/core budget).
_FUSED_MAX_LANES = 8192


def _use_pallas(backend: str, width: int) -> bool:
    return (backend == "pallas" and width >= _PALLAS_MIN_WIDTH
            and width % _PALLAS_MIN_WIDTH == 0)


def ec_madd(acc: ProjPoint, pt: AffinePoint, backend: str,
            impl: str = "u16") -> ProjPoint:
    """Complete projective mixed add (RCB), dispatched on batch width."""
    if _use_pallas(backend, acc.x.shape[-1]):
        from tpu_msm.ops import pallas_curve as pc

        res = pc.pmadd_packed(
            pc.pack_lanes(acc.x), pc.pack_lanes(acc.y), pc.pack_lanes(acc.z),
            pc.pack_lanes(pt.x), pc.pack_lanes(pt.y), impl=impl)
        return ProjPoint(*(pc.unpack_lanes(r) for r in res))
    return curve.proj_madd(acc, pt)


def ec_add(p: ProjPoint, q: ProjPoint, backend: str,
           impl: str = "u16") -> ProjPoint:
    """Complete projective add (RCB), dispatched on batch width."""
    if _use_pallas(backend, p.x.shape[-1]):
        from tpu_msm.ops import pallas_curve as pc

        res = pc.padd_packed(
            pc.pack_lanes(p.x), pc.pack_lanes(p.y), pc.pack_lanes(p.z),
            pc.pack_lanes(q.x), pc.pack_lanes(q.y), pc.pack_lanes(q.z),
            impl=impl)
        return ProjPoint(*(pc.unpack_lanes(r) for r in res))
    return curve.proj_add(p, q)


def window_digits(scalar_limbs, cfg: MsmConfig):
    """(16, N) standard-form scalar limbs -> (W, N) uint32 window digits.

    Stage-1 analogue (prepare_buckets_indices, msm.h.metal:17-59) — but with
    c = 16 the digits *are* the limbs and with c = 8 they are limb halves, so
    extraction is free; other widths use cross-limb bit extraction.
    """
    c = cfg.window_bits
    w = cfg.num_windows()
    if c == bn254.LIMB_BITS:
        return scalar_limbs[:w]
    if c == 8:
        lo = scalar_limbs & jnp.uint32(0xFF)
        hi = scalar_limbs >> jnp.uint32(8)
        full = jnp.stack([lo, hi], axis=1).reshape(
            2 * bn254.LIMBS, *scalar_limbs.shape[1:])
        return full[:w]
    return jnp.stack(
        [u256.extract_bits(scalar_limbs, i * c, min(c, 256 - i * c)) for i in range(w)]
    )


def signed_window_digits(scalar_limbs, cfg: MsmConfig):
    """(16, N) scalar limbs -> (W, N) |digit| uint32 + (W, N) negation mask.

    Balanced (signed) window recoding: each unsigned digit d in [0, 2^c)
    plus the incoming carry becomes d' = d + carry - 2^c (and carry 1) when
    d + carry > 2^(c-1), else d' = d + carry (carry 0). Digits satisfy
    |d'| <= 2^(c-1) and sum_i d'_i 2^(c*i) == scalar exactly. The final
    carry lands in the headroom window cfg.num_windows() provides
    (ceil((scalar_bits+1)/c)).
    """
    c = cfg.window_bits
    w = cfg.num_windows()
    half = jnp.uint32(1 << (c - 1))
    full = jnp.uint32(1 << c)
    raw = window_digits(scalar_limbs,
                        dataclasses.replace(cfg, signed_digits=False))
    zero = jnp.zeros_like(raw[0])
    carry = zero
    abs_rows, neg_rows = [], []
    for i in range(w):
        d = (raw[i] if i < raw.shape[0] else zero) + carry
        neg = d > half
        abs_rows.append(jnp.where(neg, full - d, d))
        neg_rows.append(neg)
        carry = neg.astype(jnp.uint32)
    return jnp.stack(abs_rows), jnp.stack(neg_rows)


def _lane_inclusive_scan(totals: ProjPoint, lanes: int, backend: str = "jnp",
                         impl: str = "u16") -> ProjPoint:
    """Hillis–Steele inclusive EC scan across the lane axis (last axis)."""
    lane_idx = jnp.arange(lanes)

    def level(i, t):
        sh = jnp.left_shift(jnp.int32(1), i)
        rolled = ProjPoint(*(jnp.roll(a, sh, axis=-1) for a in t))
        added = ec_add(t, rolled, backend, impl)
        return curve.select_point(lane_idx >= sh, added, t)

    return jax.lax.fori_loop(0, _ceil_log2(lanes), level, totals)


def _sequential_fold(pts: ProjPoint, lanes: int, steps: int, backend: str = "jnp",
                     impl: str = "u16") -> ProjPoint:
    """EC-sum `steps` groups of points down to one group: (16, lanes*steps)
    -> (16, lanes). Point→lane grouping differs between the two paths, which
    is fine — every caller reduces over the lane axis afterwards."""
    if _use_pallas(backend, lanes) and lanes <= _FUSED_MAX_LANES:
        from tpu_msm.ops import pallas_curve as pc

        r = lanes // pc.LANE
        arrs = [a.reshape(bn254.LIMBS, steps, r, pc.LANE) for a in pts]
        res = pc.fold_add_packed(*arrs, impl=impl)
        return ProjPoint(*(a.reshape(bn254.LIMBS, lanes) for a in res))
    grouped = ProjPoint(*(a.reshape(bn254.LIMBS, lanes, steps) for a in pts))

    def body(k, acc):
        nxt = ProjPoint(*(a[:, :, k] for a in grouped))
        return ec_add(acc, nxt, backend, impl)

    return jax.lax.fori_loop(0, steps, body, curve.proj_infinity((lanes,)))


def _roll_reduce(pts: ProjPoint, width: int, backend: str,
                 impl: str = "u16") -> ProjPoint:
    """EC-sum of (16, width) -> (16, 1) via log2(width) full-width rolled
    adds (after level k, lane i holds the wrapped sum of lanes [i, i+2^k);
    lane 0 ends with the total). Fixed width at every level — one Pallas
    kernel shape instead of a shrinking-shape cascade."""
    def level(i, t):
        sh = jnp.left_shift(jnp.int32(1), i)
        rolled = ProjPoint(*(jnp.roll(a, -sh, axis=-1) for a in t))
        return ec_add(t, rolled, backend, impl)

    out = jax.lax.fori_loop(0, _ceil_log2(width), level, pts)
    return ProjPoint(*(a[..., :1] for a in out))


def ec_reduce(pts: ProjPoint, fanout: int = 256, backend: str = "jnp",
              impl: str = "u16") -> ProjPoint:
    """EC-sum of a (16, B) batch of Jacobian points -> (16, 1).

    Sequential folds down to `fanout` lanes, then a fixed-width rolled tree.
    Equivalent role to the reference's two-stage sum_reduction tree
    (msm.h.metal:319-562).
    """
    b = pts.x.shape[-1]
    b_pad = 1 << _ceil_log2(max(b, 1))
    if b_pad != b:
        inf = curve.proj_infinity((b_pad - b,))
        pts = ProjPoint(*(jnp.concatenate([a, i], axis=-1) for a, i in zip(pts, inf)))
        b = b_pad
    if b > fanout:
        pts = _sequential_fold(pts, fanout, b // fanout, backend, impl)
        b = fanout
    return _roll_reduce(pts, b, backend, impl)


def _segment_starts(sorted_digits, m: int, cfg: MsmConfig):
    """Exact bucket segment starts s_b = #{i: sorted_digits[i] < b} for
    b = 1..m, by the cfg-selected strategy (all exact; autotuned):
    histogram+cumsum ('bincount'), vectorized binary search ('ss_scan' /
    'ss_sort' — jnp.searchsorted method scan/sort), a two-level search
    ('ss_2level'): level 1 binary-searches a stride-64 sample (log2(n/64)
    gather rounds over a 64x smaller array — plain ss_scan's full-array
    rounds measured ~10 ms/window at 2^20, docs/PERF_NOTES.md), level 2
    gathers each query's 64-wide candidate block once and counts < b
    vectorized; exact because samples[j-1] < b <= samples[j] brackets s_b
    into ((j-1)*64, j*64] on a sorted array; or the MXU histogram ('hist' /
    'hist_cols', ops/hist.py — one-hot matmul + cumsum, zero gathers/
    scatters; the only strategy that does NOT need the digits sorted).
    'hist' is the row-input kernel (digit_hist_pallas2): both one-hots
    build from the (1, CHUNK) row and the dot contracts chunk-dim against
    chunk-dim, so the pipeline feeds it ONE (steps, 1, CHUNK) view — the
    r5 trace showed the two-view variant's (steps, CHUNK, 1) column input
    costing 0.82 ms/window of T(8,128) relayout (reshape.4538), more than
    the kernel itself; 'hist_cols' keeps that two-view kernel for A/B."""
    if cfg.segment_starts in ("hist", "hist_cols"):
        from tpu_msm.ops import hist

        if (cfg.backend == "pallas"
                and sorted_digits.shape[0] % hist.CHUNK == 0):
            if cfg.segment_starts == "hist":
                return hist.segment_starts_hist_pallas2(sorted_digits, m)
            return hist.segment_starts_hist_pallas(sorted_digits, m)
        return hist.segment_starts_hist(sorted_digits, m)
    if cfg.segment_starts == "bincount":
        counts = jnp.bincount(sorted_digits, length=m + 2)
        cum = jnp.cumsum(counts)
        return cum[:m].astype(jnp.int32)
    if cfg.segment_starts == "ss_2level":
        stride = 64
        if sorted_digits.shape[0] % stride == 0:
            samples = sorted_digits[::stride]
            bvals = jnp.arange(1, m + 1, dtype=sorted_digits.dtype)
            j = jnp.searchsorted(samples, bvals, side="left",
                                 method="scan").astype(jnp.int32)
            lo = jnp.maximum(j * stride - stride, 0)
            idx = lo[:, None] + jnp.arange(stride, dtype=jnp.int32)[None, :]
            block = sorted_digits[idx]                  # (m, 64) gather
            cnt = jnp.sum((block < bvals[:, None]).astype(jnp.int32), axis=1)
            return lo + cnt
        # n not stride-aligned (tiny inputs): plain scan search is exact
    method = "sort" if cfg.segment_starts == "ss_sort" else "scan"
    bvals = jnp.arange(1, m + 1, dtype=sorted_digits.dtype)
    return jnp.searchsorted(sorted_digits, bvals, side="left",
                            method=method).astype(jnp.int32)


def _sorted_scan_inputs(digits, ppx, ppy_w, lanes: int, steps: int,
                        sort_impl: str):
    """Digit-sort the u16-packed coordinates into the scan kernel's
    (8, steps, r, LANE) layout. Two strategies, identical results (both
    sorts are stable on the same key, so the permutation is the same):

    * "payload": ONE 17-operand lax.sort carrying digits + both packed
      coordinate sets through the comparator network (no gathers).
    * "rank": 2-operand (digit, position) sort_key_val + ONE
      embedding-style row gather of the point-major (n, 16) coordinate
      array + layout transposes. 8.5x less data through the comparator
      network; pays one gather of 64 B rows instead.

    Returns (sorted_digits, sgx, sgy)."""
    from tpu_msm.ops import pallas_curve as pc

    n_pad = digits.shape[0]
    r = lanes // pc.LANE
    if sort_impl == "rank":
        idx0 = jnp.arange(n_pad, dtype=jnp.int32)
        sorted_digits, sorted_idx = jax.lax.sort_key_val(digits, idx0)
        rows_t = jnp.concatenate([ppx, ppy_w], axis=0).T      # (n_pad, 16)
        g = jnp.take(rows_t, sorted_idx, axis=0).T            # (16, n_pad)
        gt = g.reshape(16, lanes, steps)
        sgx = jnp.moveaxis(gt[:8], 1, 2).reshape(8, steps, r, pc.LANE)
        sgy = jnp.moveaxis(gt[8:], 1, 2).reshape(8, steps, r, pc.LANE)
        return sorted_digits, sgx, sgy
    sorted_ops = jax.lax.sort(
        [digits] + [ppx[i] for i in range(8)] + [ppy_w[i] for i in range(8)],
        num_keys=1)
    sorted_digits = sorted_ops[0]
    sgx = jnp.moveaxis(jnp.stack(sorted_ops[1:9]).reshape(8, lanes, steps),
                       1, 2).reshape(8, steps, r, pc.LANE)
    sgy = jnp.moveaxis(jnp.stack(sorted_ops[9:17]).reshape(8, lanes, steps),
                       1, 2).reshape(8, steps, r, pc.LANE)
    return sorted_digits, sgx, sgy


def _window_heavy(digits_negm, ppx, ppy, n: int, cfg: MsmConfig):
    """Per-window HEAVY stages of the fused path: 17-operand payload sort,
    whole-window fused scan, segment starts, and the two big-array reads
    (bucket-boundary gather from ys48, last-step lane totals). Returns only
    small per-window arrays; everything O(n)-sized dies here. The cheap
    per-window tails are batched across ALL windows afterwards
    (_sides_batched) — 16x wider vector ops and 16x fewer kernel dispatches
    than running them inside the window loop (the side stages measured ~half
    of e2e at 2^20 while being ~19% of the op count: dispatch/width
    overhead, not math — probe_rtt/probe_sides artifacts)."""
    from tpu_msm.ops import pallas_curve as pc

    digits, negm = digits_negm
    m = cfg.buckets_per_window()
    n_pad = digits.shape[0]
    lanes = cfg.scan_lanes
    steps = n_pad // lanes

    ppy_w = ppy[0] if negm is None else jnp.where(negm[None, :], ppy[1], ppy[0])
    sorted_digits, sgx, sgy = _sorted_scan_inputs(
        digits, ppx, ppy_w, lanes, steps, cfg.sort_impl)
    scan_kernel = {"f15": pc.scan_madd_packed_u16_f15,
                   "f15d": functools.partial(
                       pc.scan_madd_packed_u16_f15d,
                       step_batch=cfg.scan_step_batch),
                   "mxu": pc.scan_madd_packed_u16_mxu}.get(
                       cfg.field_impl, pc.scan_madd_packed_u16)
    # Keep ys48 FLAT (48, steps*lanes) and index it with one fused flat
    # index instead of the logical (48, steps, lanes)[:, kq, lq] gather:
    # the r5 trace showed XLA feeding the 3-D gather through a
    # {2,1,0}->{2,0,1} relayout copy of the whole 400 MB array
    # (copy.3696 + reshape.4537, ~19.6 ms of the 375 ms e2e at 2^20).
    # The flat view leaves the scan kernel's native row-major layout in
    # place; position p's (step k, lane l) prefix lives at column
    # k*lanes + l.
    ys48 = scan_kernel(sgx, sgy).reshape(48, steps * lanes)

    # 'hist' is order-free: feed the UNSORTED digits so the starts
    # computation has no data dependency on the sort at all.
    starts = _segment_starts(
        digits if cfg.segment_starts == "hist" else sorted_digits, m, cfg)
    queries = jnp.concatenate([starts, jnp.full((1,), n, starts.dtype)])
    nq = m + 1
    q_pad = -(-nq // (4 * _PALLAS_MIN_WIDTH)) * (4 * _PALLAS_MIN_WIDTH) - nq
    if q_pad:
        queries = jnp.concatenate(
            [queries, jnp.full((q_pad,), n, queries.dtype)])
    is_zero = queries == 0
    pos = jnp.maximum(queries, 1) - 1
    lq = (pos // steps).astype(jnp.int32)
    kq = (pos % steps).astype(jnp.int32)
    loc48 = ys48[:, kq * lanes + lq]       # (48, Q) prefix at each query
    totals = ys48[:, (steps - 1) * lanes:]  # (48, lanes) lane totals
    return totals, loc48, lq, is_zero


def _win_roll(a, wins: int, sh, axis_last_len: int):
    """jnp.roll along the last axis WITHIN each of `wins` equal segments of
    a (..., wins*axis_last_len) array (window-boundary-respecting roll)."""
    shp = a.shape
    b = a.reshape(shp[:-1] + (wins, axis_last_len))
    b = jnp.roll(b, sh, axis=-1)
    return b.reshape(shp)


def _sides_batched(totals48, loc48, lq, is_zero, cfg: MsmConfig) -> ProjPoint:
    """All windows' side stages as full-width batched ops. Inputs are the
    stacked per-window smalls from _window_heavy: totals48 (W, 48, L),
    loc48 (W, 48, Q), lq (W, Q), is_zero (W, Q). Returns (W, 16, 1) window
    sums — projectively equal to the per-window path (same point; the
    fanout clamp `_FUSED_MAX_LANES // w` below can change the EC-add
    association vs ec_reduce, so coordinates are not bitwise identical —
    test_sides_batched checks proj_eq). Lanes never cross window
    boundaries."""
    w, _, lanes = totals48.shape
    q = loc48.shape[-1]
    m = cfg.buckets_per_window()
    backend = cfg.backend
    impl = "f15" if cfg.field_impl == "mxu" else cfg.field_impl
    c = cfg.window_bits

    # Inter-lane inclusive scan, all windows at once: rounds on (16, W*L)
    # with window-local rolls.
    flat = ProjPoint(totals48[:, 0:16], totals48[:, 16:32],
                     totals48[:, 32:48])  # (W, 16, L)
    t = ProjPoint(*(jnp.moveaxis(a, 1, 0).reshape(16, w * lanes)
                    for a in flat))
    lane_idx = jnp.tile(jnp.arange(lanes), w)

    def level(i, tt):
        sh = jnp.left_shift(jnp.int32(1), i)
        rolled = ProjPoint(*(_win_roll(a, w, sh, lanes) for a in tt))
        added = ec_add(tt, rolled, backend, impl)
        return curve.select_point(lane_idx >= sh, added, tt)

    inc = jax.lax.fori_loop(0, _ceil_log2(lanes), level, t)
    carry = curve.select_point(
        lane_idx >= 1,
        ProjPoint(*(_win_roll(a, w, 1, lanes) for a in inc)),
        curve.proj_infinity((w * lanes,)))  # exclusive inter-lane carries

    # Lane-carry gather at the query lanes, per window, then ONE wide add.
    car = ProjPoint(*(jnp.take_along_axis(
        a.reshape(16, w, lanes), lq[None, :, :], axis=2).reshape(16, w * q)
        for a in carry))
    local = ProjPoint(
        *(jnp.moveaxis(loc48[:, s], 1, 0).reshape(16, w * q)
          for s in (slice(0, 16), slice(16, 32), slice(32, 48))))
    xvals = ec_add(car, local, backend, impl)
    xvals = curve.select_point(is_zero.reshape(-1),
                               curve.proj_infinity((w * q,)), xvals)

    xv = ProjPoint(*(a.reshape(16, w, q) for a in xvals))
    x_n = ProjPoint(*(a[:, :, m] for a in xv))            # (16, W)
    # Pad each window's X(s_b) batch to a power of two with infinities
    # (unsigned mode has m = 2^c - 1; ec_reduce did this internally on the
    # per-window path).
    m_pad = 1 << _ceil_log2(max(m, 1))
    x_starts = ProjPoint(*(a[:, :, :m] for a in xv))      # (16, W, m)
    if m_pad != m:
        inf = curve.proj_infinity((w, m_pad - m))
        x_starts = ProjPoint(*(jnp.concatenate([a, i], axis=-1)
                               for a, i in zip(x_starts, inf)))
    m = m_pad
    x_starts = ProjPoint(*(a.reshape(16, w * m) for a in x_starts))

    # Per-window EC reduction of the X(s_b) batch, all windows in one fused
    # fold + one window-local rolled tree.
    fanout = max(128, min(cfg.reduce_fanout, _FUSED_MAX_LANES // w))
    fanout = 1 << (fanout.bit_length() - 1)  # window-local rolled tree
    # and the m//fanout grouping both require a power of two
    pts = x_starts
    if m > fanout:
        # group within windows: (16, W, fanout, m/fanout) -> lanes W*fanout
        grouped = ProjPoint(*(a.reshape(16, w, fanout, m // fanout)
                              .reshape(16, w * fanout, m // fanout)
                              for a in (b.reshape(16, w, m) for b in pts)))
        lanes_f = w * fanout
        steps_f = m // fanout
        if _use_pallas(backend, lanes_f) and lanes_f <= _FUSED_MAX_LANES:
            from tpu_msm.ops import pallas_curve as pc

            rr = lanes_f // pc.LANE
            arrs = [jnp.moveaxis(a, 2, 1).reshape(16, steps_f, rr, pc.LANE)
                    for a in grouped]
            res = pc.fold_add_packed(*arrs, impl=impl)
            pts = ProjPoint(*(a.reshape(16, lanes_f) for a in res))
        else:
            def body(k, acc):
                nxt = ProjPoint(*(a[:, :, k] for a in grouped))
                return ec_add(acc, nxt, backend, impl)

            pts = jax.lax.fori_loop(0, steps_f, body,
                                    curve.proj_infinity((lanes_f,)))
        width = fanout
    else:
        width = m

    def rlevel(i, tt):
        sh = jnp.left_shift(jnp.int32(1), i)
        rolled = ProjPoint(*(_win_roll(a, w, -sh, width) for a in tt))
        return ec_add(tt, rolled, backend, impl)

    red = jax.lax.fori_loop(0, _ceil_log2(width), rlevel, pts)
    sum_starts = ProjPoint(*(a.reshape(16, w, width)[:, :, 0] for a in red))

    # window_sum = M * X(n) - sum_b X(s_b), the M-multiple batched over all
    # windows at once (width W instead of per-window width 1).
    if cfg.signed_digits:
        mx = _mul_pow2(x_n, c - 1, backend)
    else:
        mx = _mul_all_ones(x_n, c, backend)
    out = ec_add(mx, curve.proj_neg(sum_starts), backend)  # (16, W)
    return ProjPoint(*(jnp.moveaxis(a, 1, 0)[:, :, None] for a in out))


def _msm_window(digits_negm, px, py, n: int, cfg: MsmConfig) -> ProjPoint:
    """Window sum for one window — the jnp/CPU fallback path (the fused
    Pallas path runs _window_heavy per window + _sides_batched across
    windows). Returns (16, 1).

    digits_negm: (digits, negm) — (n_pad,) this window's digits (padding
    positions carry the m+1 sentinel) and, in signed-digit mode, the
    (n_pad,) negation mask (else None). px, py: ((16, n+1), 2-tuple of
    (16, n+1)) coordinates with an appended infinity column (py = (y, P-y)).
    """
    digits, negm = digits_negm
    side_impl = "f15" if cfg.field_impl == "mxu" else cfg.field_impl
    c = cfg.window_bits
    m = cfg.buckets_per_window()
    n_pad = digits.shape[0]
    lanes = cfg.scan_lanes
    steps = n_pad // lanes
    backend = cfg.backend

    # Stage-2 analogue (the reference sorts (bucket, point_idx) pairs on the
    # CPU and binary-searches segments, sort_buckets.rs:19-30).
    if negm is None:
        py_w = py[0]
    else:
        negm_cols = jnp.concatenate(
            [negm[:n], jnp.zeros((1,), bool)])  # infinity column: plain
        py_w = jnp.where(negm_cols[None, :], py[1], py[0])
    idx0 = jnp.arange(n_pad, dtype=jnp.int32)
    idx0 = jnp.where(idx0 >= n, n, idx0)  # pads hit the infinity column
    sorted_digits, sorted_idx = jax.lax.sort_key_val(digits, idx0)
    perm = jnp.moveaxis(sorted_idx.reshape(lanes, steps), 1, 0).reshape(-1)
    gx = jnp.take(px, perm, axis=1).reshape(bn254.LIMBS, steps, lanes)
    gy = jnp.take(py_w, perm, axis=1).reshape(bn254.LIMBS, steps, lanes)

    def step(acc, pt_xy):
        sx, sy = pt_xy
        acc = ec_madd(acc, AffinePoint(sx, sy), backend)
        return acc, acc

    _, ys_s = jax.lax.scan(
        step, curve.proj_infinity((lanes,)),
        (jnp.moveaxis(gx, 1, 0), jnp.moveaxis(gy, 1, 0)))
    ys = ProjPoint(*(jnp.moveaxis(a, 0, 1) for a in ys_s))
    # ys: ProjPoint of (16, steps, lanes) — per-lane inclusive local scans.

    totals = ProjPoint(*(a[:, -1] for a in ys))
    inc = _lane_inclusive_scan(totals, lanes, backend, side_impl)
    lane_idx = jnp.arange(lanes)
    carry = curve.select_point(
        lane_idx >= 1,
        ProjPoint(*(jnp.roll(a, 1, axis=-1) for a in inc)),
        curve.proj_infinity((lanes,)),
    )  # exclusive inter-lane carries

    # Bucket segment starts: s_b = #\{i : sorted_digits[i] < b\} for b = 1..M
    # (the reference binary-searches per threadgroup, msm.h.metal:119-131).
    # Digit value m+1 is the padding sentinel; it sorts last and is counted
    # by no query.
    starts = _segment_starts(sorted_digits, m, cfg)
    queries = jnp.concatenate(
        [starts, jnp.full((1,), n, starts.dtype)])  # s_1..s_M, n

    is_zero = queries == 0
    pos = jnp.maximum(queries, 1) - 1
    lq = (pos // steps).astype(jnp.int32)
    kq = (pos % steps).astype(jnp.int32)
    local = ProjPoint(*(a[:, kq, lq] for a in ys))  # (16, M+1)
    lane_carry = ProjPoint(*(a[:, lq] for a in carry))
    xvals = ec_add(lane_carry, local, backend, side_impl)
    xvals = curve.select_point(is_zero,
                               curve.proj_infinity((queries.shape[0],)), xvals)

    x_n = ProjPoint(*(a[:, m:m + 1] for a in xvals))     # X(n), batch (1,)
    x_starts = ProjPoint(*(a[:, :m] for a in xvals))     # X(s_b), b = 1..M
    sum_starts = ec_reduce(x_starts, cfg.reduce_fanout, backend,
                           side_impl)

    # window_sum = M * X(n) - sum_b X(s_b). Signed mode: M = 2^(c-1), a
    # pure doubling chain; unsigned: M = 2^c - 1 all-ones.
    if cfg.signed_digits:
        mx = _mul_pow2(x_n, c - 1, backend)
    else:
        mx = _mul_all_ones(x_n, c, backend)
    return ec_add(mx, curve.proj_neg(sum_starts), backend)


def window_sums(points: AffinePoint, scalar_limbs, cfg: MsmConfig) -> ProjPoint:
    """Per-window sums Σ_b b·bucket_b for every window. Returns (W, 16, 1).

    This is the shardable core: window sums are linear over the multiset of
    (point, digit) pairs, so per-chip partial window sums EC-add to the global
    ones (the seam `tpu_msm.parallel` reduces across the device mesh).
    Reference analogue: stages 1-4 of exec_metal_commands (msm.rs:189-213).
    """
    n = points.x.shape[1]
    if scalar_limbs.shape[1] != n:
        raise ValueError(
            f"points ({n}) and scalars ({scalar_limbs.shape[1]}) differ in count")
    glv_neg = None
    if cfg.glv:
        # GLV split (ops/glv.py): 2n points x half the windows. The halves'
        # signs fold into the signed-digit negation masks below; scalars
        # must be canonical (< r) for the |k_i| < 2^127 bound.
        if not cfg.signed_digits or cfg.scalar_bits != 254:
            raise ValueError("glv requires signed_digits and scalar_bits=254")
        from tpu_msm.ops import glv

        m1, s1, m2, s2 = glv.decompose_limbs(scalar_limbs)
        phix = field.mont_mul_const(points.x, glv.BETA_MONT)
        points = AffinePoint(jnp.concatenate([points.x, phix], 1),
                             jnp.concatenate([points.y, points.y], 1))
        scalar_limbs = jnp.concatenate([m1, m2], axis=1)
        glv_neg = jnp.concatenate([s1, s2])
        cfg = dataclasses.replace(cfg, glv=False, scalar_bits=127)
        n = 2 * n
    c = cfg.window_bits
    w = cfg.num_windows()
    lanes = min(cfg.scan_lanes, 1 << _ceil_log2(max(n, 1)))
    steps = -(-n // lanes)
    n_pad = lanes * steps
    cfg = dataclasses.replace(cfg, scan_lanes=lanes,
                              backend=resolve_backend(cfg.backend))

    m = cfg.buckets_per_window()
    if cfg.signed_digits:
        digits, negm = signed_window_digits(scalar_limbs, cfg)  # (W, N) each
        if glv_neg is not None:  # negative GLV half: negate every digit
            negm = negm ^ glv_neg[None, :]
        y_neg = field.neg_mod(points.y)  # negated points for negative digits
    else:
        digits = window_digits(scalar_limbs, cfg)  # (W, N)
        negm = y_neg = None
    if n_pad != n:
        # Padding: sentinel digit m+1 (sorts last, dropped bin); the padded
        # positions carry the infinity point — both absorbed by the window
        # reduction.
        digits = jnp.pad(digits, ((0, 0), (0, n_pad - n)),
                         constant_values=jnp.uint32(m + 1))
        if negm is not None:
            negm = jnp.pad(negm, ((0, 0), (0, n_pad - n)))
    # Appended infinity column backs the padded indices (jnp fallback path).
    px = jnp.concatenate([points.x, field.zero((1,))], axis=1)
    py = (jnp.concatenate([points.y, field.zero((1,))], axis=1),
          None if y_neg is None
          else jnp.concatenate([y_neg, field.zero((1,))], axis=1))
    if _use_pallas(cfg.backend, lanes) and lanes <= _FUSED_MAX_LANES:
        # u16-pair-packed coordinates, zero-padded to n_pad ((0,0) affine
        # sentinel = infinity). Packed once here, sorted per window.
        ppx = jnp.pad(pack_u16_rows(points.x), ((0, 0), (0, n_pad - n)))
        ppy = (jnp.pad(pack_u16_rows(points.y), ((0, 0), (0, n_pad - n))),
               None if y_neg is None
               else jnp.pad(pack_u16_rows(y_neg), ((0, 0), (0, n_pad - n))))
    else:
        ppx = ppy = None

    if ppx is not None:
        # Fused path: heavy per-window stages inside the loop (their big
        # arrays die per window), cheap tails batched over ALL windows
        # (16x wider ops, 16x fewer dispatches — see _sides_batched).
        heavy = functools.partial(_window_heavy, ppx=ppx, ppy=ppy, n=n,
                                  cfg=cfg)
        if negm is None:
            smalls = jax.lax.map(lambda d: heavy((d, None)), digits)
        else:
            smalls = jax.lax.map(heavy, (digits, negm))
        return _sides_batched(*smalls, cfg=cfg)

    window_fn = functools.partial(_msm_window, px=px, py=py, n=n, cfg=cfg)
    # batch_size > 1 vmaps the window body over groups of windows (cross-
    # window overlap at the cost of k-times the stage working set); lax.map
    # requires the batch to divide the window count, so fall back when not.
    bs = cfg.window_batch if w % max(cfg.window_batch, 1) == 0 else 1
    kwargs = {"batch_size": bs} if bs > 1 else {}
    if negm is None:
        return jax.lax.map(lambda d: window_fn((d, None)), digits, **kwargs)
    return jax.lax.map(window_fn, (digits, negm), **kwargs)


def pack_u16_rows(a):
    """(16, N) canonical u16 rows -> (8, N): row 2i in the low 16 bits of
    packed row i, row 2i+1 in the high 16 bits."""
    return a[0::2] | (a[1::2] << jnp.uint32(16))


def _mul_pow2(p: ProjPoint, k: int, backend: str) -> ProjPoint:
    """2^k · p via k complete self-adds (signed-digit window weight)."""

    def body(_, acc):
        return ec_add(acc, acc, backend)

    return jax.lax.fori_loop(0, k, body, p)


def _mul_all_ones(p: ProjPoint, c: int, backend: str) -> ProjPoint:
    """(2^c - 1)·p via c-1 rounds of acc = 2·acc + p (all-ones exponent);
    doubling is a complete self-add (curve.proj_double)."""
    if c <= 1:
        return p

    def body(_, acc):
        return ec_add(ec_add(acc, acc, backend), p, backend)

    return jax.lax.fori_loop(0, c - 1, body, p)


def horner_fold(wsums: ProjPoint, c: int) -> ProjPoint:
    """Fold (W, 16, 1) window sums into the MSM result: top window first,
    c doublings between windows (reference: final_accumulation.rs:19-39 —
    there a CPU loop over readback; here an on-device fori_loop)."""
    w = wsums.x.shape[0]

    def horner(i, acc):
        widx = w - 2 - i

        def dbl(_, a):
            return curve.proj_double(a)

        acc = jax.lax.fori_loop(0, c, dbl, acc)
        nxt = ProjPoint(*(jax.lax.dynamic_index_in_dim(a, widx, 0, keepdims=False)
                         for a in wsums))
        return curve.proj_add(acc, nxt)

    top = ProjPoint(*(a[-1] for a in wsums))
    return jax.lax.fori_loop(0, w - 1, horner, top)


def msm_projective(points: AffinePoint, scalar_limbs, cfg: MsmConfig | None = None) -> ProjPoint:
    """Full MSM: sum_i scalars[i] * points[i] as a projective point, batch (1,).

    points: AffinePoint of (16, N) Montgomery-form coords ((0,0) = infinity).
    scalar_limbs: (16, N) standard-form scalars.
    Jit-traceable end to end; the reference equivalent is metal_msm / the
    exec_metal_commands chain (src/metal/msm.rs:189-234).
    """
    if cfg is None:
        cfg = select_config(points.x.shape[1])
    return horner_fold(window_sums(points, scalar_limbs, cfg), cfg.window_bits)


# Historical name from the Jacobian-based pipeline; the result is now a
# homogeneous-projective ProjPoint (RCB complete formulas).
msm_jacobian = msm_projective
