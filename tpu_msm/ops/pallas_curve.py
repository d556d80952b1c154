"""Fused Pallas TPU kernels for the EC hot ops (mixed add / full add).

Why these exist: the jnp compute path (tpu_msm.ops.curve) expresses each
field multiply as an outer product + gather + carry pass over (16, batch)
arrays. XLA materializes the (16, 32, k, batch) intermediates to HBM — at
8192 lanes that is ~100+ MB of spill traffic per Montgomery multiply, and
the measured scan step runs ~45x off the VPU roofline (840 ms per 2^20-point
window at log-20). These kernels fuse one complete EC operation per
pallas_call: every intermediate lives in vregs/VMEM and HBM traffic drops to
the operands themselves (~512 B per lane).

Design (same math as ops/curve.py and the reference's Metal EC templates,
src/metal/shader/curves/ec_point.h.metal:13-175 — TPU-native shape):

* **Row representation**: a 256-bit element is a Python list of 16 uint32
  arrays of shape (8, 128) — one per 16-bit limb, each exactly one VPU tile.
  The limb "axis" is unrolled at trace time: no limb-axis slicing, gathers,
  or concatenates anywhere (the patterns XLA:CPU/TPU handled badly).
* **Eager canonical arithmetic**: every field value keeps limbs < 2^16 and
  value < P. Carry/borrow propagation is a 16-step sequential ripple — cheap
  inside a fused kernel (3 vreg ops per limb), unlike in the XLA graph.
  This mirrors the reference's per-thread schoolbook loops
  (unsigned_int.h.metal:77-165) at (8,128)-tile width.
* **Completeness via selects** with the doubling fallback computed in the
  same kernel (policy identical to ops/curve.py).

Array layout at the pallas_call boundary: (16, R, 128) uint32, R a multiple
of 8; block (16, 8, 128) over grid R/8. `pack_lanes`/`unpack_lanes` convert
from the pipeline's (16, N) layout (N a multiple of 1024).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpu_msm.models import bn254

import numpy as np

# numpy scalars: trace-time literals, NOT captured jax arrays (pallas kernels
# reject captured constants).
MASK = np.uint32(0xFFFF)
B16 = np.uint32(0x10000)
_U1 = np.uint32(1)
NROWS = 16
SUBLANES = 8
LANE = 128
TILE = SUBLANES * LANE  # 1024 lanes per grid step


def _const_rows(value: int):
    return [np.uint32((value >> (16 * i)) & 0xFFFF) for i in range(NROWS)]


_P_ROWS = _const_rows(bn254.P)
_PINV_ROWS = _const_rows((-pow(bn254.P, -1, 1 << 256)) % (1 << 256))
_ONE_MONT_ROWS = _const_rows((1 << 256) % bn254.P)  # Montgomery 1


# ---------------------------------------------------------------------------
# Field arithmetic on canonical rows (lists of 16 (8,128) u32 tiles, < 2^16
# per row, value < P).
# ---------------------------------------------------------------------------

def _ripple(cols):
    """Sequential exact carry propagation. cols[k] < 2^31 allowed.
    Returns (canonical rows, final carry)."""
    out = []
    c = None
    for v in cols:
        if c is not None:
            v = v + c
        out.append(v & MASK)
        c = v >> 16
    return out, c


def _sub_rows(a, b):
    """a - b over 16 rows (two's complement); returns (rows, borrow in {0,1})."""
    out = []
    bor = None
    for x, y in zip(a, b):
        v = x - y + B16 if bor is None else x - y - bor + B16
        out.append(v & MASK)
        bor = _U1 - (v >> 16)
    return out, bor


def _select(mask, a, b):
    return [jnp.where(mask, x, y) for x, y in zip(a, b)]


def _is_zero(a):
    z = a[0] == 0
    for r in a[1:]:
        z = z & (r == 0)
    return z


def _cond_sub_p(rows):
    """rows - P if rows >= P (requires rows < 2P as a value in 16 limbs)."""
    d, bor = _sub_rows(rows, _P_ROWS)
    return _select(bor == 0, d, rows)


def add_mod(a, b):
    """(a + b) mod P, canonical in/out. Sum < 2P fits 16 limbs."""
    s, _ = _ripple([x + y for x, y in zip(a, b)])
    return _cond_sub_p(s)


def sub_mod(a, b):
    """(a - b) mod P, canonical in/out."""
    d, bor = _sub_rows(a, b)
    dp, _ = _ripple([x + y for x, y in zip(d, _P_ROWS)])
    return _select(bor == 1, dp, d)


def dbl_mod(a):
    return add_mod(a, a)


def neg_mod(a):
    d, _ = _sub_rows(_P_ROWS, a)
    return _select(_is_zero(a), a, d)


def _conv_full(a, b_rows, nb):
    """Schoolbook convolution of 16 canonical rows with nb constant-or-row
    multiplicands; returns 16+nb ripple-resolved rows (carry structurally 0
    for full products < 2^(16*(16+nb)))."""
    nout = NROWS + nb
    lo = [None] * nout
    hi = [None] * (nout + 1)
    for i in range(NROWS):
        ai = a[i]
        for j in range(nb):
            p = ai * b_rows[j]
            k = i + j
            pl = p & MASK
            ph = p >> 16
            lo[k] = pl if lo[k] is None else lo[k] + pl
            hi[k + 1] = ph if hi[k + 1] is None else hi[k + 1] + ph
    cols = []
    for k in range(nout):
        v = lo[k]
        h = hi[k]
        if v is None:
            v = h
        elif h is not None:
            v = v + h
        cols.append(v)
    rows, _ = _ripple(cols)
    return rows


def _mul_lo16(t, c_rows):
    """Low 16 rows of t * c (canonical t, constant c), mod 2^256."""
    lo = [None] * NROWS
    hi = [None] * NROWS
    for i in range(NROWS):
        ti = t[i]
        for j in range(NROWS - i):
            p = ti * c_rows[j]
            k = i + j
            pl = p & MASK
            lo[k] = pl if lo[k] is None else lo[k] + pl
            if k + 1 < NROWS:
                ph = p >> 16
                hi[k + 1] = ph if hi[k + 1] is None else hi[k + 1] + ph
    cols = []
    for k in range(NROWS):
        v = lo[k]
        if hi[k] is not None:
            v = v + hi[k]
        cols.append(v)
    rows, _ = _ripple(cols)
    return rows


def mont_mul(a, b):
    """Montgomery product a*b*R^-1 mod P of canonical rows, result < P.

    Full product then one-shot REDC (m = t_lo * (-P^-1) mod 2^256;
    out = (t + m*P) >> 256, conditional subtract). Row analogue of the
    reference's CIOS (fp_bn254.h.metal:237-290) and field.mont_mul."""
    t = _conv_full(a, b, NROWS)  # 32 rows
    m = _mul_lo16(t, _PINV_ROWS)
    mp = _conv_full(m, _P_ROWS, NROWS)  # 32 rows
    rows, _ = _ripple([x + y for x, y in zip(t, mp)])
    # (t + m*P) / 2^256 < 2P fits the high 16 limbs; low 16 are zero.
    return _cond_sub_p(rows[NROWS:])


def mont_sqr(a):
    return mont_mul(a, a)


def _zero_rows(like):
    return [jnp.zeros_like(like) for _ in range(NROWS)]


def _bcast_rows(c_rows, like):
    return [jnp.full_like(like, c) for c in c_rows]


# ---------------------------------------------------------------------------
# EC formulas on rows (complete via selects, doubling fused).
# ---------------------------------------------------------------------------

def _dbl_core(x1, y1, z1):
    """dbl-2009-l pieces shared by both adders (reference:
    ec_point.h.metal:141-175)."""
    xx = mont_sqr(x1)
    yy = mont_sqr(y1)
    yyyy = mont_sqr(yy)
    t = mont_sqr(add_mod(x1, yy))
    d = dbl_mod(sub_mod(sub_mod(t, xx), yyyy))
    e = add_mod(dbl_mod(xx), xx)
    f = mont_sqr(e)
    xd = sub_mod(f, dbl_mod(d))
    yd = sub_mod(mont_mul(e, sub_mod(d, xd)),
                 dbl_mod(dbl_mod(dbl_mod(yyyy))))
    zd = mont_mul(dbl_mod(y1), z1)
    return xd, yd, zd


def _finalize(raw, dbl, p, q, inf_p, inf_q, h_zero, r_zero):
    use_dbl = h_zero & r_zero & ~inf_p & ~inf_q
    ox = _select(use_dbl, dbl[0], raw[0])
    oy = _select(use_dbl, dbl[1], raw[1])
    oz = _select(use_dbl, dbl[2], raw[2])
    inf_mask = h_zero & ~r_zero & ~inf_p & ~inf_q
    oz = _select(inf_mask, _zero_rows(oz[0]), oz)
    ox = _select(inf_q, p[0], ox)
    oy = _select(inf_q, p[1], oy)
    oz = _select(inf_q, p[2], oz)
    ox = _select(inf_p, q[0], ox)
    oy = _select(inf_p, q[1], oy)
    oz = _select(inf_p, q[2], oz)
    return ox, oy, oz


def _madd_rows(x1, y1, z1, x2, y2):
    """Complete mixed addition (madd-2007-bl + fused doubling fallback).
    jnp analogue: curve.jac_add_affine; affine infinity sentinel (0, 0)."""
    inf_q = _is_zero(x2) & _is_zero(y2)
    inf_p = _is_zero(z1)

    z1z1 = mont_sqr(z1)
    u2 = mont_mul(x2, z1z1)
    s2 = mont_mul(y2, mont_mul(z1, z1z1))
    h = sub_mod(u2, x1)
    rhalf = sub_mod(s2, y1)
    h_zero = _is_zero(h)
    r_zero = _is_zero(rhalf)
    r = dbl_mod(rhalf)

    hh = mont_sqr(h)
    i = dbl_mod(dbl_mod(hh))
    j = mont_mul(h, i)
    v = mont_mul(x1, i)
    rr = mont_sqr(r)
    x3 = sub_mod(sub_mod(rr, j), dbl_mod(v))
    y3 = sub_mod(mont_mul(r, sub_mod(v, x3)), dbl_mod(mont_mul(y1, j)))
    z3 = sub_mod(sub_mod(mont_sqr(add_mod(z1, h)), z1z1), hh)

    dblp = _dbl_core(x1, y1, z1)
    one = _bcast_rows(_ONE_MONT_ROWS, x2[0])
    q_jac = (x2, y2, _select(inf_q, _zero_rows(x2[0]), one))
    return _finalize((x3, y3, z3), dblp, (x1, y1, z1), q_jac,
                     inf_p, inf_q, h_zero, r_zero)


def _add_rows(x1, y1, z1, x2, y2, z2):
    """Complete Jacobian + Jacobian (add-2007-bl + fused doubling).
    jnp analogue: curve.jac_add."""
    inf_p = _is_zero(z1)
    inf_q = _is_zero(z2)

    z1z1 = mont_sqr(z1)
    z2z2 = mont_sqr(z2)
    u1 = mont_mul(x1, z2z2)
    u2 = mont_mul(x2, z1z1)
    s1 = mont_mul(y1, mont_mul(z2, z2z2))
    s2 = mont_mul(y2, mont_mul(z1, z1z1))
    h = sub_mod(u2, u1)
    rhalf = sub_mod(s2, s1)
    h_zero = _is_zero(h)
    r_zero = _is_zero(rhalf)
    r = dbl_mod(rhalf)

    i = mont_sqr(dbl_mod(h))
    j = mont_mul(h, i)
    v = mont_mul(u1, i)
    rr = mont_sqr(r)
    x3 = sub_mod(sub_mod(rr, j), dbl_mod(v))
    y3 = sub_mod(mont_mul(r, sub_mod(v, x3)), dbl_mod(mont_mul(s1, j)))
    zh = sub_mod(sub_mod(mont_sqr(add_mod(z1, z2)), z1z1), z2z2)
    z3 = mont_mul(zh, h)

    dblp = _dbl_core(x1, y1, z1)
    return _finalize((x3, y3, z3), dblp, (x1, y1, z1), (x2, y2, z2),
                     inf_p, inf_q, h_zero, r_zero)


# ---------------------------------------------------------------------------
# pallas_call wrappers.
# ---------------------------------------------------------------------------

def pack_lanes(a):
    """(16, N) -> (16, N//128, 128); N must be a multiple of 1024."""
    n = a.shape[1]
    assert n % TILE == 0, n
    return a.reshape(16, n // LANE, LANE)


def unpack_lanes(a):
    return a.reshape(16, a.shape[1] * LANE)


def _rows_of(val):
    return [val[i] for i in range(NROWS)]


def _madd_kernel(accx, accy, accz, ptx, pty, ox, oy, oz):
    rx, ry, rz = _madd_rows(
        _rows_of(accx[...]), _rows_of(accy[...]), _rows_of(accz[...]),
        _rows_of(ptx[...]), _rows_of(pty[...]))
    ox[...] = jnp.stack(rx)
    oy[...] = jnp.stack(ry)
    oz[...] = jnp.stack(rz)


def _add_kernel(ax, ay, az, bx, by, bz, ox, oy, oz):
    rx, ry, rz = _add_rows(
        _rows_of(ax[...]), _rows_of(ay[...]), _rows_of(az[...]),
        _rows_of(bx[...]), _rows_of(by[...]), _rows_of(bz[...]))
    ox[...] = jnp.stack(rx)
    oy[...] = jnp.stack(ry)
    oz[...] = jnp.stack(rz)


def _spec(sub: int):
    return pl.BlockSpec((NROWS, sub, LANE), lambda i: (0, i, 0),
                        memory_space=pltpu.VMEM)


def _pick_sub(r: int, sub: int | None):
    """Block height: requested, or the largest power-of-two divisor of r up
    to 32 sublanes (more independent work per vector op -> fewer pipeline
    stalls from the ripple chains)."""
    if sub is not None:
        return sub
    s = SUBLANES
    while s * 2 <= 32 and r % (s * 2) == 0:
        s *= 2
    return s


@functools.partial(jax.jit, static_argnames=("interpret", "sub"))
def madd_packed(accx, accy, accz, ptx, pty, interpret: bool = False,
                sub: int | None = None):
    """Complete mixed add on packed (16, R, 128) uint32 arrays."""
    s = _pick_sub(accx.shape[1], sub)
    grid = (accx.shape[1] // s,)
    shape = jax.ShapeDtypeStruct(accx.shape, jnp.uint32)
    out = pl.pallas_call(
        _madd_kernel,
        grid=grid,
        in_specs=[_spec(s)] * 5,
        out_specs=[_spec(s)] * 3,
        out_shape=[shape] * 3,
        interpret=interpret,
    )(accx, accy, accz, ptx, pty)
    return tuple(out)


@functools.partial(jax.jit, static_argnames=("interpret", "sub"))
def add_packed(ax, ay, az, bx, by, bz, interpret: bool = False,
               sub: int | None = None):
    """Complete Jacobian add on packed (16, R, 128) uint32 arrays."""
    s = _pick_sub(ax.shape[1], sub)
    grid = (ax.shape[1] // s,)
    shape = jax.ShapeDtypeStruct(ax.shape, jnp.uint32)
    out = pl.pallas_call(
        _add_kernel,
        grid=grid,
        in_specs=[_spec(s)] * 6,
        out_specs=[_spec(s)] * 3,
        out_shape=[shape] * 3,
        interpret=interpret,
    )(ax, ay, az, bx, by, bz)
    return tuple(out)


# ---------------------------------------------------------------------------
# Complete homogeneous-projective kernels (Renes–Costello–Batina Algorithms
# 7/8, a = 0, b3 = 9 — see curve.py proj_add/proj_madd for the jnp analogue
# and the derivation). One code path, no doubling fallback, no infinity
# select cascade: ~40% fewer multiplies than the Jacobian kernels above and
# a much simpler select structure. The MSM pipeline runs on these.
# ---------------------------------------------------------------------------

def _mul9_rows(a):
    """9·a mod P via an add chain."""
    return add_mod(dbl_mod(dbl_mod(dbl_mod(a))), a)


# The u16 field namespace consumed by the shared RCB formulas (ec_rows.py);
# ops.f15 exposes the same surface for the 15-bit-limb core.
import types as _types  # noqa: E402

from tpu_msm.ops import ec_rows as _ec  # noqa: E402

F16 = _types.SimpleNamespace(
    mont_mul=mont_mul, add_mod=add_mod, sub_mod=sub_mod, dbl_mod=dbl_mod,
    mul9=_mul9_rows, select=_select, is_zero=_is_zero, zero_rows=_zero_rows)


def _proj_add_rows(x1, y1, z1, x2, y2, z2):
    return _ec.proj_add(F16, x1, y1, z1, x2, y2, z2)


def _proj_madd_rows(x1, y1, z1, x2, y2):
    """Mixed addition; the (0, 0) affine infinity sentinel is handled by a
    trailing select."""
    return _ec.proj_madd(F16, x1, y1, z1, x2, y2)


def _pmadd_kernel(px_, py_, pz_, qx_, qy_, ox, oy, oz):
    rx, ry, rz = _proj_madd_rows(
        _rows_of(px_[...]), _rows_of(py_[...]), _rows_of(pz_[...]),
        _rows_of(qx_[...]), _rows_of(qy_[...]))
    ox[...] = jnp.stack(rx)
    oy[...] = jnp.stack(ry)
    oz[...] = jnp.stack(rz)


def _padd_kernel(ax, ay, az, bx, by, bz, ox, oy, oz):
    rx, ry, rz = _proj_add_rows(
        _rows_of(ax[...]), _rows_of(ay[...]), _rows_of(az[...]),
        _rows_of(bx[...]), _rows_of(by[...]), _rows_of(bz[...]))
    ox[...] = jnp.stack(rx)
    oy[...] = jnp.stack(ry)
    oz[...] = jnp.stack(rz)


def _f15_in(ref):
    """u16 block ref -> 17 f15 rows (kernel-boundary conversion, ~3 ops/row)."""
    from tpu_msm.ops import f15

    return f15.from_u16_rows(_rows_of(ref[...]))


def _f15_out(rows):
    from tpu_msm.ops import f15

    return jnp.stack(f15.to_u16_rows(rows))


def _pmadd_f15_kernel(px_, py_, pz_, qx_, qy_, ox, oy, oz):
    from tpu_msm.ops import f15

    rx, ry, rz = _ec.proj_madd(f15, _f15_in(px_), _f15_in(py_), _f15_in(pz_),
                               _f15_in(qx_), _f15_in(qy_))
    ox[...], oy[...], oz[...] = _f15_out(rx), _f15_out(ry), _f15_out(rz)


def _padd_f15_kernel(ax, ay, az, bx, by, bz, ox, oy, oz):
    from tpu_msm.ops import f15

    rx, ry, rz = _ec.proj_add(f15, _f15_in(ax), _f15_in(ay), _f15_in(az),
                              _f15_in(bx), _f15_in(by), _f15_in(bz))
    ox[...], oy[...], oz[...] = _f15_out(rx), _f15_out(ry), _f15_out(rz)


# --- Dual-stream (f15d) variants: the block's sublanes are split into two
# independent halves and the formula is traced once over the pair
# (ec_rows.DualField) so every field op has a pairable twin for the VPU's
# second VLIW issue slot. Bit-exact vs the single-stream kernels (disjoint
# lanes, same math); measured basis in artifacts/montmul_ilp{1,2}.log.

def _dual_halves(ref):
    h = ref.shape[1] // 2
    return (slice(None, h), slice(h, None))


def _dual_f15_in(ref, halves):
    from tpu_msm.ops import f15

    return tuple(f15.from_u16_rows([ref[i, s] for i in range(NROWS)])
                 for s in halves)


def _dual_f15_out(d):
    from tpu_msm.ops import f15

    u0, u1 = f15.to_u16_rows(d[0]), f15.to_u16_rows(d[1])
    return jnp.stack([jnp.concatenate([a, b], axis=0)
                      for a, b in zip(u0, u1)])


def _pmadd_f15d_kernel(px_, py_, pz_, qx_, qy_, ox, oy, oz):
    from tpu_msm.ops import f15
    from tpu_msm.ops.ec_rows import DualField

    hs = _dual_halves(px_)
    rx, ry, rz = _ec.proj_madd(
        DualField(f15), _dual_f15_in(px_, hs), _dual_f15_in(py_, hs),
        _dual_f15_in(pz_, hs), _dual_f15_in(qx_, hs), _dual_f15_in(qy_, hs))
    ox[...], oy[...], oz[...] = (_dual_f15_out(r) for r in (rx, ry, rz))


def _padd_f15d_kernel(ax, ay, az, bx, by, bz, ox, oy, oz):
    from tpu_msm.ops import f15
    from tpu_msm.ops.ec_rows import DualField

    hs = _dual_halves(ax)
    rx, ry, rz = _ec.proj_add(
        DualField(f15), _dual_f15_in(ax, hs), _dual_f15_in(ay, hs),
        _dual_f15_in(az, hs), _dual_f15_in(bx, hs), _dual_f15_in(by, hs),
        _dual_f15_in(bz, hs))
    ox[...], oy[...], oz[...] = (_dual_f15_out(r) for r in (rx, ry, rz))


# ---------------------------------------------------------------------------
# Whole-stage fused kernels. The stepwise wrappers above launch one
# pallas_call per scan/fold step, so the EC accumulator round-trips HBM on
# every step and each step pays launch + XLA-loop overhead. TPU Pallas
# executes the grid sequentially on one core with scratch persisting across
# grid steps — so an entire lax.scan/fori_loop collapses into ONE pallas_call
# with the accumulator in VMEM scratch (reference analogue: the per-thread
# sequential pair scan of bucket_wise_accumulation, msm.h.metal:169-212,
# which likewise keeps its accumulator in registers across the loop).
# ---------------------------------------------------------------------------

def _init_acc_inf(ax, ay, az):
    """Set scratch accumulator to the identity (0 : 1 : 0) on grid step 0."""

    @pl.when(pl.program_id(0) == 0)
    def _():
        ax[...] = jnp.zeros(ax.shape, jnp.uint32)
        az[...] = jnp.zeros(az.shape, jnp.uint32)
        ay[...] = jnp.stack(
            [jnp.full(ay.shape[1:], c, jnp.uint32) for c in _ONE_MONT_ROWS])


def _scan_madd_kernel(gx_ref, gy_ref, ox, oy, oz, ax, ay, az):
    _init_acc_inf(ax, ay, az)
    rx, ry, rz = _proj_madd_rows(
        _rows_of(ax[...]), _rows_of(ay[...]), _rows_of(az[...]),
        _rows_of(gx_ref[:, 0]), _rows_of(gy_ref[:, 0]))
    sx, sy, sz = jnp.stack(rx), jnp.stack(ry), jnp.stack(rz)
    ax[...], ay[...], az[...] = sx, sy, sz
    ox[:, 0], oy[:, 0], oz[:, 0] = sx, sy, sz


@functools.partial(jax.jit, static_argnames=("interpret",))
def scan_madd_packed(gx, gy, interpret: bool = False):
    """Inclusive EC prefix scan (complete projective mixed add) over the
    step axis: one pallas_call, accumulator resident in VMEM scratch.

    gx, gy: (16, steps, R, 128) uint32 affine coords, R*128 independent
    lanes. Returns (ys_x, ys_y, ys_z) of the same shape — ys[:, k] is the
    running sum of gx/gy[:, 0..k] per lane.

    Limbs-leading layout so a row-major (16, N) coordinate array reshapes in
    for free (steps on axis 1) — the step-leading variant forced a 64 MB
    XLA transpose per operand per window.
    """
    _, steps, r, _ = gx.shape
    shape = jax.ShapeDtypeStruct(gx.shape, jnp.uint32)
    spec = pl.BlockSpec((NROWS, 1, r, LANE), lambda i: (0, i, 0, 0),
                        memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        _scan_madd_kernel,
        grid=(steps,),
        in_specs=[spec] * 2,
        out_specs=[spec] * 3,
        out_shape=[shape] * 3,
        scratch_shapes=[pltpu.VMEM((NROWS, r, LANE), jnp.uint32)] * 3,
        interpret=interpret,
    )(gx, gy)
    return tuple(out)


def _unpack_pairs(packed):
    """8 u16-pair-packed rows -> 16 canonical u16 rows (in u32 lanes)."""
    rows = []
    for p in packed:
        rows.append(p & MASK)
        rows.append(p >> 16)
    return rows


def _scan_madd_u16_kernel(gx_ref, gy_ref, oys, ax, ay, az):
    _init_acc_inf(ax, ay, az)
    gx, gy = gx_ref[:, 0], gy_ref[:, 0]
    qx = _unpack_pairs([gx[i] for i in range(8)])
    qy = _unpack_pairs([gy[i] for i in range(8)])
    rx, ry, rz = _proj_madd_rows(
        _rows_of(ax[...]), _rows_of(ay[...]), _rows_of(az[...]), qx, qy)
    sx, sy, sz = jnp.stack(rx), jnp.stack(ry), jnp.stack(rz)
    ax[...], ay[...], az[...] = sx, sy, sz
    oys[:, 0] = jnp.concatenate([sx, sy, sz], axis=0)


@functools.partial(jax.jit, static_argnames=("interpret",))
def scan_madd_packed_u16(gx, gy, interpret: bool = False):
    """Inclusive EC prefix scan over u16-pair-packed affine inputs.

    gx, gy: (8, steps, R, 128) uint32, each element two 16-bit limbs
    (row 2i in the low half, row 2i+1 in the high half — see
    pippenger's pack helper). Unpacking happens in VMEM, so the packed
    form halves the input DMA bytes AND lets the host sort carry each
    coordinate as 8 sort operands instead of 16 (one 17-operand
    lax.sort moves digits + both packed coordinates in one pass —
    variadic sort cost is flat in operand count on TPU).

    Returns ONE stacked (48, steps, R, 128) array: rows 0:16 X, 16:32 Y,
    32:48 Z of the running per-lane prefix sums — a single array so the
    downstream bucket-boundary lookup is one gather instead of three.
    """
    _, steps, r, _ = gx.shape
    out_shape = jax.ShapeDtypeStruct((3 * NROWS, steps, r, LANE), jnp.uint32)
    in_spec = pl.BlockSpec((8, 1, r, LANE), lambda i: (0, i, 0, 0),
                           memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((3 * NROWS, 1, r, LANE), lambda i: (0, i, 0, 0),
                            memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _scan_madd_u16_kernel,
        grid=(steps,),
        in_specs=[in_spec] * 2,
        out_specs=out_spec,
        out_shape=out_shape,
        scratch_shapes=[pltpu.VMEM((NROWS, r, LANE), jnp.uint32)] * 3,
        interpret=interpret,
    )(gx, gy)


def f15_scan_step(acc15, gx_packed, gy_packed):
    """One 15-bit-core scan step on plain row lists (eagerly testable —
    the exact compute the Pallas kernel below runs per grid step).

    acc15: (x_rows, y_rows, z_rows), each 17 f15 rows. gx/gy_packed: 8
    u16-pair-packed rows of the affine point. Returns (new_acc15, out48) —
    out48 = 48 canonical u16 rows (X||Y||Z), the kernel's wire format.
    """
    from tpu_msm.ops import f15

    qx = f15.from_u16_rows(_unpack_pairs(gx_packed))
    qy = f15.from_u16_rows(_unpack_pairs(gy_packed))
    rx, ry, rz = _ec.proj_madd(f15, acc15[0], acc15[1], acc15[2], qx, qy)
    out48 = [row for r in (rx, ry, rz) for row in f15.to_u16_rows(r)]
    return (rx, ry, rz), out48


def _scan_madd_u16_f15_kernel(gx_ref, gy_ref, oys, ax, ay, az):
    """15-bit-limb variant of _scan_madd_u16_kernel: identical in/out wire
    format (u16-pair-packed inputs, 48 u16-row output), accumulator kept in
    the 17×15-bit representation in VMEM scratch (ops.f15 — ~30% fewer VPU
    ops per mixed add than the u16 core)."""
    from tpu_msm.ops import f15

    @pl.when(pl.program_id(0) == 0)
    def _():
        ax[...] = jnp.zeros(ax.shape, jnp.uint32)
        az[...] = jnp.zeros(az.shape, jnp.uint32)
        ay[...] = jnp.stack(
            [jnp.full(ay.shape[1:], c, jnp.uint32) for c in f15.ONE_MONT_ROWS])

    gx, gy = gx_ref[:, 0], gy_ref[:, 0]
    acc = tuple([ref[i] for i in range(f15.NROWS)] for ref in (ax, ay, az))
    (rx, ry, rz), out48 = f15_scan_step(
        acc, [gx[i] for i in range(8)], [gy[i] for i in range(8)])
    ax[...], ay[...], az[...] = jnp.stack(rx), jnp.stack(ry), jnp.stack(rz)
    oys[:, 0] = jnp.stack(out48)


@functools.partial(jax.jit, static_argnames=("interpret",))
def scan_madd_packed_u16_f15(gx, gy, interpret: bool = False):
    """Drop-in replacement for scan_madd_packed_u16 running the 15-bit-limb
    field core (see ops/f15.py). Same signature, same bit-exact output."""
    from tpu_msm.ops import f15

    _, steps, r, _ = gx.shape
    out_shape = jax.ShapeDtypeStruct((3 * NROWS, steps, r, LANE), jnp.uint32)
    in_spec = pl.BlockSpec((8, 1, r, LANE), lambda i: (0, i, 0, 0),
                           memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((3 * NROWS, 1, r, LANE), lambda i: (0, i, 0, 0),
                            memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _scan_madd_u16_f15_kernel,
        grid=(steps,),
        in_specs=[in_spec] * 2,
        out_specs=out_spec,
        out_shape=out_shape,
        scratch_shapes=[pltpu.VMEM((f15.NROWS, r, LANE), jnp.uint32)] * 3,
        interpret=interpret,
    )(gx, gy)


def _scan_madd_u16_f15d_kernel(gx_ref, gy_ref, oys, ax, ay, az):
    """Dual-stream variant of _scan_madd_u16_f15_kernel: the lane block is
    split into two independent sublane halves and the EC formula is traced
    once over the pair (ec_rows.DualField), so every field op has a pairable
    twin for the VPU's second VLIW issue slot. Identical wire format and
    bit-exact output (the streams never interact — pure elementwise math on
    disjoint lanes). Measured basis: one dependent mont-mul chain 474.4 M/s
    vs two interleaved chains 769.0 M/s on v5e
    (artifacts/montmul_ilp{1,2}.log)."""
    from tpu_msm.ops import f15
    from tpu_msm.ops.ec_rows import DualField

    @pl.when(pl.program_id(0) == 0)
    def _():
        ax[...] = jnp.zeros(ax.shape, jnp.uint32)
        az[...] = jnp.zeros(az.shape, jnp.uint32)
        ay[...] = jnp.stack(
            [jnp.full(ay.shape[1:], c, jnp.uint32) for c in f15.ONE_MONT_ROWS])

    gx, gy = gx_ref[:, 0], gy_ref[:, 0]
    h = gx.shape[-2] // 2
    halves = (slice(None, h), slice(h, None))

    def dual_from_packed(g):
        return tuple(f15.from_u16_rows(_unpack_pairs([g[i, s] for i in range(8)]))
                     for s in halves)

    qx, qy = dual_from_packed(gx), dual_from_packed(gy)
    accx, accy, accz = (
        tuple([ref[i, s] for i in range(f15.NROWS)] for s in halves)
        for ref in (ax, ay, az))
    rx, ry, rz = _ec.proj_madd(DualField(f15), accx, accy, accz, qx, qy)

    def join(d):
        return [jnp.concatenate([a, b], axis=0) for a, b in zip(d[0], d[1])]

    ax[...], ay[...], az[...] = (jnp.stack(join(r)) for r in (rx, ry, rz))
    out48 = []
    for r in (rx, ry, rz):
        out48.extend(join((f15.to_u16_rows(r[0]), f15.to_u16_rows(r[1]))))
    oys[:, 0] = jnp.stack(out48)


def _make_scan_f15d_batched_kernel(k: int):
    """Dual-stream scan kernel body handling `k` sequential scan steps per
    grid step. Why: the 1-step kernel measured 121 us/grid-step at 4096
    lanes against a 56 us dual-issue compute bound (artifacts/scan_probe.log
    — and f15 == f15d there, so the VPU was NOT the limiter): per-step
    DMA/launch overhead dominated. Batching k steps amortizes it; the
    per-step madd math is unchanged and the accumulator still lives in VMEM
    scratch across the whole window."""

    def kernel(gx_ref, gy_ref, oys, ax, ay, az):
        from tpu_msm.ops import f15
        from tpu_msm.ops.ec_rows import DualField

        @pl.when(pl.program_id(0) == 0)
        def _():
            ax[...] = jnp.zeros(ax.shape, jnp.uint32)
            az[...] = jnp.zeros(az.shape, jnp.uint32)
            ay[...] = jnp.stack([jnp.full(ay.shape[1:], c, jnp.uint32)
                                 for c in f15.ONE_MONT_ROWS])

        h = gx_ref.shape[-2] // 2
        halves = (slice(None, h), slice(h, None))
        acc = tuple(
            tuple([ref[i, s] for i in range(f15.NROWS)] for s in halves)
            for ref in (ax, ay, az))

        def join(d):
            return [jnp.concatenate([a, b], axis=0)
                    for a, b in zip(d[0], d[1])]

        for j in range(k):
            gx, gy = gx_ref[:, j], gy_ref[:, j]
            qx, qy = (tuple(
                f15.from_u16_rows(_unpack_pairs([g[i, s] for i in range(8)]))
                for s in halves) for g in (gx, gy))
            acc = _ec.proj_madd(DualField(f15), *acc, qx, qy)
            out48 = []
            for r_ in acc:
                out48.extend(join((f15.to_u16_rows(r_[0]),
                                   f15.to_u16_rows(r_[1]))))
            oys[:, j] = jnp.stack(out48)
        ax[...], ay[...], az[...] = (jnp.stack(join(r_)) for r_ in acc)

    return kernel


@functools.partial(jax.jit, static_argnames=("interpret", "step_batch"))
def scan_madd_packed_u16_f15d(gx, gy, interpret: bool = False,
                              step_batch: int = 1):
    """Drop-in replacement for scan_madd_packed_u16 running the 15-bit-limb
    core as two interleaved half-blocks (see _scan_madd_u16_f15d_kernel).
    Requires >= 16 sublanes (2048 lanes) so each half keeps whole (8, 128)
    vregs; callers fall back to the single-stream kernel below that.
    `step_batch` > 1 processes that many scan steps per grid step (same
    math; amortizes per-grid-step DMA/launch overhead — see
    _make_scan_f15d_batched_kernel)."""
    from tpu_msm.ops import f15

    _, steps, r, _ = gx.shape
    if r < 16:
        return scan_madd_packed_u16_f15(gx, gy, interpret=interpret)
    k = step_batch if step_batch >= 1 and steps % step_batch == 0 else 1
    out_shape = jax.ShapeDtypeStruct((3 * NROWS, steps, r, LANE), jnp.uint32)
    in_spec = pl.BlockSpec((8, k, r, LANE), lambda i: (0, i, 0, 0),
                           memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((3 * NROWS, k, r, LANE), lambda i: (0, i, 0, 0),
                            memory_space=pltpu.VMEM)
    kernel = (_scan_madd_u16_f15d_kernel if k == 1
              else _make_scan_f15d_batched_kernel(k))
    return pl.pallas_call(
        kernel,
        grid=(steps // k,),
        in_specs=[in_spec] * 2,
        out_specs=out_spec,
        out_shape=out_shape,
        scratch_shapes=[pltpu.VMEM((f15.NROWS, r, LANE), jnp.uint32)] * 3,
        interpret=interpret,
    )(gx, gy)


def _scan_madd_u16_mxu_kernel(gpinv_ref, gp_ref, gx_ref, gy_ref, oys,
                              ax, ay, az):
    """MXU-REDC variant of _scan_madd_u16_f15_kernel: same 15-bit-limb
    accumulator and wire format, but each mont-mul's two constant
    convolutions run as int8 matmuls on the MXU (ops/fmxu.py). The packed
    group matrices arrive as kernel inputs (Pallas rejects captured
    constants)."""
    from tpu_msm.ops import f15, fmxu

    @pl.when(pl.program_id(0) == 0)
    def _():
        ax[...] = jnp.zeros(ax.shape, jnp.uint32)
        az[...] = jnp.zeros(az.shape, jnp.uint32)
        ay[...] = jnp.stack(
            [jnp.full(ay.shape[1:], c, jnp.uint32) for c in f15.ONE_MONT_ROWS])

    F = fmxu.make_namespace(gpinv_ref[...], gp_ref[...])
    gx, gy = gx_ref[:, 0], gy_ref[:, 0]
    qx = f15.from_u16_rows(_unpack_pairs([gx[i] for i in range(8)]))
    qy = f15.from_u16_rows(_unpack_pairs([gy[i] for i in range(8)]))
    acc = tuple([ref[i] for i in range(f15.NROWS)] for ref in (ax, ay, az))
    rx, ry, rz = _ec.proj_madd(F, acc[0], acc[1], acc[2], qx, qy)
    out48 = [row for r in (rx, ry, rz) for row in f15.to_u16_rows(r)]
    ax[...], ay[...], az[...] = jnp.stack(rx), jnp.stack(ry), jnp.stack(rz)
    oys[:, 0] = jnp.stack(out48)


@functools.partial(jax.jit, static_argnames=("interpret",))
def scan_madd_packed_u16_mxu(gx, gy, interpret: bool = False):
    """Drop-in replacement for scan_madd_packed_u16 with the MXU-REDC field
    core (see ops/fmxu.py). Same signature, same bit-exact output."""
    from tpu_msm.ops import f15, fmxu

    _, steps, r, _ = gx.shape
    out_shape = jax.ShapeDtypeStruct((3 * NROWS, steps, r, LANE), jnp.uint32)
    in_spec = pl.BlockSpec((8, 1, r, LANE), lambda i: (0, i, 0, 0),
                           memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((3 * NROWS, 1, r, LANE), lambda i: (0, i, 0, 0),
                            memory_space=pltpu.VMEM)
    mat_specs = [pl.BlockSpec(m.shape, lambda i: (0, 0),
                              memory_space=pltpu.VMEM)
                 for m in (fmxu.G_PINV_PACKED, fmxu.G_P_PACKED)]
    return pl.pallas_call(
        _scan_madd_u16_mxu_kernel,
        grid=(steps,),
        in_specs=mat_specs + [in_spec] * 2,
        out_specs=out_spec,
        out_shape=out_shape,
        scratch_shapes=[pltpu.VMEM((f15.NROWS, r, LANE), jnp.uint32)] * 3,
        interpret=interpret,
    )(jnp.asarray(fmxu.G_PINV_PACKED), jnp.asarray(fmxu.G_P_PACKED), gx, gy)


def _fold_add_kernel(bx, by, bz, ox, oy, oz, ax, ay, az):
    _init_acc_inf(ax, ay, az)
    rx, ry, rz = _proj_add_rows(
        _rows_of(ax[...]), _rows_of(ay[...]), _rows_of(az[...]),
        _rows_of(bx[:, 0]), _rows_of(by[:, 0]), _rows_of(bz[:, 0]))
    sx, sy, sz = jnp.stack(rx), jnp.stack(ry), jnp.stack(rz)
    ax[...], ay[...], az[...] = sx, sy, sz
    ox[...], oy[...], oz[...] = sx, sy, sz


def _fold_add_f15_kernel(bx, by, bz, ox, oy, oz, ax, ay, az):
    from tpu_msm.ops import f15

    @pl.when(pl.program_id(0) == 0)
    def _():
        ax[...] = jnp.zeros(ax.shape, jnp.uint32)
        az[...] = jnp.zeros(az.shape, jnp.uint32)
        ay[...] = jnp.stack(
            [jnp.full(ay.shape[1:], c, jnp.uint32) for c in f15.ONE_MONT_ROWS])

    rx, ry, rz = _ec.proj_add(
        f15,
        [ax[i] for i in range(f15.NROWS)],
        [ay[i] for i in range(f15.NROWS)],
        [az[i] for i in range(f15.NROWS)],
        f15.from_u16_rows(_rows_of(bx[:, 0])),
        f15.from_u16_rows(_rows_of(by[:, 0])),
        f15.from_u16_rows(_rows_of(bz[:, 0])))
    ax[...], ay[...], az[...] = jnp.stack(rx), jnp.stack(ry), jnp.stack(rz)
    ox[...], oy[...], oz[...] = _f15_out(rx), _f15_out(ry), _f15_out(rz)


def _fold_add_f15d_kernel(bx, by, bz, ox, oy, oz, ax, ay, az):
    """Dual-stream fold: accumulator halves in f15 scratch, formula traced
    once over the pair (see _pmadd_f15d_kernel)."""
    from tpu_msm.ops import f15
    from tpu_msm.ops.ec_rows import DualField

    @pl.when(pl.program_id(0) == 0)
    def _():
        ax[...] = jnp.zeros(ax.shape, jnp.uint32)
        az[...] = jnp.zeros(az.shape, jnp.uint32)
        ay[...] = jnp.stack(
            [jnp.full(ay.shape[1:], c, jnp.uint32) for c in f15.ONE_MONT_ROWS])

    h = ax.shape[1] // 2
    halves = (slice(None, h), slice(h, None))
    accx, accy, accz = (
        tuple([ref[i, s] for i in range(f15.NROWS)] for s in halves)
        for ref in (ax, ay, az))

    def din(ref):
        return tuple(
            f15.from_u16_rows([ref[i, 0, s] for i in range(NROWS)])
            for s in halves)

    rx, ry, rz = _ec.proj_add(DualField(f15), accx, accy, accz,
                              din(bx), din(by), din(bz))

    def join(d):
        return jnp.stack([jnp.concatenate([a, b], axis=0)
                          for a, b in zip(d[0], d[1])])

    ax[...], ay[...], az[...] = join(rx), join(ry), join(rz)
    ox[...], oy[...], oz[...] = (_dual_f15_out(r) for r in (rx, ry, rz))


@functools.partial(jax.jit, static_argnames=("interpret", "impl"))
def fold_add_packed(bx, by, bz, interpret: bool = False, impl: str = "u16"):
    """EC-sum over the step axis (complete projective add): one pallas_call,
    accumulator in VMEM scratch.

    bx/by/bz: (16, steps, R, 128) projective points (limbs-leading — a
    row-major (16, N) batch reshapes in for free). Returns the
    (16, R, 128) per-lane sums over the step axis. impl="f15" keeps the
    accumulator in the 15-bit-limb core (ops/f15.py), same wire format.
    """
    from tpu_msm.ops import f15

    _, steps, r, _ = bx.shape
    if impl == "f15d" and r < 16:
        impl = "f15"  # halves must keep whole (8, 128) vregs
    acc_rows = f15.NROWS if impl in ("f15", "f15d") else NROWS
    kernel = {"f15": _fold_add_f15_kernel,
              "f15d": _fold_add_f15d_kernel}.get(impl, _fold_add_kernel)
    in_spec = pl.BlockSpec((NROWS, 1, r, LANE), lambda i: (0, i, 0, 0),
                           memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((NROWS, r, LANE), lambda i: (0, 0, 0),
                            memory_space=pltpu.VMEM)
    shape = jax.ShapeDtypeStruct((NROWS, r, LANE), jnp.uint32)
    out = pl.pallas_call(
        kernel,
        grid=(steps,),
        in_specs=[in_spec] * 3,
        out_specs=[out_spec] * 3,
        out_shape=[shape] * 3,
        scratch_shapes=[pltpu.VMEM((acc_rows, r, LANE), jnp.uint32)] * 3,
        interpret=interpret,
    )(bx, by, bz)
    return tuple(out)


@functools.partial(jax.jit, static_argnames=("interpret", "sub", "impl"))
def pmadd_packed(px_, py_, pz_, qx_, qy_, interpret: bool = False,
                 sub: int | None = None, impl: str = "u16"):
    """Complete projective mixed add on packed (16, R, 128) uint32 arrays."""
    s = _pick_sub(px_.shape[1], sub)
    if impl == "f15d" and s < 16:
        impl = "f15"  # halves must keep whole (8, 128) vregs
    grid = (px_.shape[1] // s,)
    shape = jax.ShapeDtypeStruct(px_.shape, jnp.uint32)
    out = pl.pallas_call(
        {"f15": _pmadd_f15_kernel,
         "f15d": _pmadd_f15d_kernel}.get(impl, _pmadd_kernel),
        grid=grid,
        in_specs=[_spec(s)] * 5,
        out_specs=[_spec(s)] * 3,
        out_shape=[shape] * 3,
        interpret=interpret,
    )(px_, py_, pz_, qx_, qy_)
    return tuple(out)


@functools.partial(jax.jit, static_argnames=("interpret", "sub", "impl"))
def padd_packed(ax, ay, az, bx, by, bz, interpret: bool = False,
                sub: int | None = None, impl: str = "u16"):
    """Complete projective add on packed (16, R, 128) uint32 arrays."""
    s = _pick_sub(ax.shape[1], sub)
    if impl == "f15d" and s < 16:
        impl = "f15"  # halves must keep whole (8, 128) vregs
    grid = (ax.shape[1] // s,)
    shape = jax.ShapeDtypeStruct(ax.shape, jnp.uint32)
    out = pl.pallas_call(
        {"f15": _padd_f15_kernel,
         "f15d": _padd_f15d_kernel}.get(impl, _padd_kernel),
        grid=grid,
        in_specs=[_spec(s)] * 6,
        out_specs=[_spec(s)] * 3,
        out_shape=[shape] * 3,
        interpret=interpret,
    )(ax, ay, az, bx, by, bz)
    return tuple(out)
