"""MXU-assisted 15-bit-limb field core: REDC's constant multiplies as int8
matmuls.

One Montgomery multiply is three limb convolutions: t = a·b, m = t_lo·(-P^-1)
mod 2^255, and m·P. The second and third multiply per-lane data by FIXED
constants — i.e. each output column is a fixed linear combination of the
input limbs, which is exactly a (nout × 17) @ (17 × lanes) matrix product.
The VPU pays ~780 vector ops per constant convolution (ops/f15.py); the MXU
does the same contraction as five int8 matmuls with exact int32
accumulation, in a unit with ~100x the integer throughput. Only the a·b
convolution (both operands per-lane) stays on the VPU.

Exactness scheme (everything integer, no rounding anywhere):

* A 15-bit limb v splits into three 7-bit pieces v = d0 + 2^7·d1 + 2^14·d2
  (d0, d1 ≤ 127, d2 ≤ 1 — all fit int8 comfortably; two signed-int8 pieces
  canNOT cover [0, 2^15), max 127·256+127 = 32639). The constant's limbs
  split the same way into banded matrices M0/M1/M2 with
  Mt[k][j] = piece_t(const_limb[k−j]).
* col_k = Σ_j v_j·c_{k−j} = Σ_g 2^(7g)·O_g, g = s+t ∈ [0, 4], where
  O_g = Σ_{s+t=g} Mt@ds — five matmuls (the cross terms concatenate into
  one each: O_1 = [M0|M1]@[d1;d0], etc.). Every O_g entry is a sum of
  ≤ 3·17 int8×int8 products — exact in int32, and non-negative.
* Column recombination keeps everything < 2^28 in the 15-bit radix:
  2^14·O_2 = 2^15·(O_2>>1) + 2^14·(O_2&1) pushes the even half into the
  next column; 2^21·O_3 -> (O_3<<6) and 2^28·O_4 -> (O_4<<13) go to the
  next column likewise (O_3 ≤ 34·127, O_4 ≤ 17 — the top pieces are the
  1-bit d2/c2). Truncation at column 17 for the m step drops only
  multiples of 2^255 (≡ 0 in the mod-2^255 product). Columns stay
  unsigned, so the standard u32 ripple finishes the job.

The result is bit-identical to f15.mont_mul — this module re-exports the
rest of the f15 namespace, so it drops into the shared RCB formulas
(ec_rows.py) as `F` unchanged. Reference analogue: none — the reference's
Metal GPU has no matrix unit; this is TPU-first design (the MXU is where
v5e keeps ~99% of its integer throughput).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from tpu_msm.models import bn254
from tpu_msm.ops import f15
from tpu_msm.ops.f15 import (  # noqa: F401  (re-exported field namespace)
    NROWS, BITS, MASK, B15, GROUP, const_rows, P_ROWS, PINV_ROWS,
    ONE_MONT_ROWS, from_u16_rows, to_u16_rows, ripple, sub_rows, select,
    is_zero, zero_rows, bcast_rows, cond_sub_p, add_mod, sub_mod, dbl_mod,
    neg_mod, mul9, _conv_cols, _halve,
)

_PINV_INT = (-pow(bn254.P, -1, 1 << 255)) % (1 << 255)
_PIECES = 3  # 15 bits = 7 + 7 + 1


def _limbs(value: int, n: int):
    return [(value >> (BITS * i)) & int(MASK) for i in range(n)]


def _banded(limbs, nout: int):
    """Three banded int8 matrices (nout, 17): Mt[k][j] = 7-bit piece t of
    limbs[k-j]."""
    ms = [np.zeros((nout, NROWS), np.int8) for _ in range(_PIECES)]
    for k in range(nout):
        for j in range(NROWS):
            d = k - j
            if 0 <= d < len(limbs):
                for t in range(_PIECES):
                    ms[t][k, j] = (limbs[d] >> (7 * t)) & 0x7F
    return ms


def _group_matrices(ms):
    """Concatenated per-group matrices: G[g] applied to the stacked data
    pieces gives O_g = Σ_{s+t=g} Mt @ ds in ONE matmul per group."""
    out = []
    for g in range(2 * _PIECES - 1):
        parts = [ms[t] for t in range(_PIECES) if 0 <= g - t < _PIECES]
        out.append(np.concatenate(parts, axis=1))
    return out


# Pallas kernels cannot capture constant arrays — they arrive as kernel
# inputs. Pack the five group matrices into ONE int8 operand per constant
# (static column slices recover the groups): (nout, 17+34+51+34+17 = 153).
_G_WIDTHS = [NROWS * len([t for t in range(_PIECES) if 0 <= g - t < _PIECES])
             for g in range(2 * _PIECES - 1)]
G_PINV_PACKED = np.concatenate(
    _group_matrices(_banded(_limbs(_PINV_INT, NROWS), NROWS)), axis=1)
G_P_PACKED = np.concatenate(
    _group_matrices(_banded(_limbs(bn254.P, NROWS), 2 * NROWS)), axis=1)


def _const_mul_cols(rows, packed, nout: int):
    """Unsigned u32 columns (15-bit radix) of (canonical rows) · constant.

    rows: 17 canonical u32 arrays (< 2^15) of identical shape S. `packed`:
    the (nout, 153) int8 concatenation of the five group matrices. Returns
    `nout` u32 arrays of shape S, each < 2^28; Σ cols[k]·2^(15k) equals the
    product (truncated to nout columns — exact for nout=34, mod 2^255 for
    nout=17 since column 17 carries weight 2^255).
    """
    shape = rows[0].shape
    d = [[((r >> np.uint32(7 * t)) & np.uint32(0x7F)).astype(jnp.int8)
          for r in rows] for t in range(_PIECES)]
    x = [jnp.stack(dt).reshape(NROWS, -1) for dt in d]
    o = []
    off = 0
    for g, w in enumerate(_G_WIDTHS):
        # Data stack order mirrors _group_matrices: piece t pairs with
        # data piece g - t, t ascending.
        gm = packed[:, off:off + w]
        off += w
        xs = [x[g - t] for t in range(_PIECES) if 0 <= g - t < _PIECES]
        xg = xs[0] if len(xs) == 1 else jnp.concatenate(xs, axis=0)
        og = jnp.dot(gm, xg, preferred_element_type=jnp.int32)
        o.append(og.reshape((nout,) + shape).astype(jnp.uint32))
    cols = []
    for k in range(nout):
        # col_k collects: O0[k] + 2^7 O1[k] + 2^14 (O2[k] & 1)
        #               + carried-from-k-1: (O2>>1) + O3<<6 + O4<<13.
        c = o[0][k] + (o[1][k] << np.uint32(7))
        c = c + ((o[2][k] & np.uint32(1)) << np.uint32(14))
        if k > 0:
            c = c + (o[2][k - 1] >> np.uint32(1))
            c = c + (o[3][k - 1] << np.uint32(6))
            c = c + (o[4][k - 1] << np.uint32(13))
        cols.append(c)
    # Dropped at k = nout: for nout=34 the top-column carries are
    # structurally zero (O2/O3/O4[33] have no in-range band entries); for
    # nout=17 they carry weight 2^255 ≡ 0 in the truncated product.
    return cols


def mont_mul(a, b, gpinv=None, gp=None):
    """Montgomery product a·b·2^-256 mod P — bit-identical to f15.mont_mul,
    with the two constant convolutions of REDC on the MXU.

    gpinv/gp: the packed group matrices as arrays (kernel refs pass their
    loaded values; eager/XLA callers may omit them)."""
    if gpinv is None:
        gpinv = jnp.asarray(G_PINV_PACKED)
    if gp is None:
        gp = jnp.asarray(G_P_PACKED)
    t_cols = _conv_cols(a, b, NROWS)  # 34 raw u32 columns (< 2^21)
    t_lo, _ = ripple(t_cols[:NROWS])
    m_cols = _const_mul_cols(t_lo, gpinv, NROWS)
    m, _ = ripple(m_cols)
    mp_cols = _const_mul_cols(m, gp, 2 * NROWS)
    comb = [t + mp for t, mp in zip(t_cols, mp_cols)]  # < 2^21 + 2^28: fits
    rows, _ = ripple(comb)  # low 17 rows are structurally zero
    return _halve(cond_sub_p(rows[NROWS:]))


def mont_sqr(a, gpinv=None, gp=None):
    return mont_mul(a, a, gpinv=gpinv, gp=gp)


def make_namespace(gpinv, gp):
    """The ec_rows field namespace with the packed matrices bound — for use
    INSIDE Pallas kernels, where the matrices arrive as kernel inputs."""
    import functools
    import types

    return types.SimpleNamespace(
        NROWS=NROWS, ONE_MONT_ROWS=ONE_MONT_ROWS,
        mont_mul=functools.partial(mont_mul, gpinv=gpinv, gp=gp),
        mont_sqr=functools.partial(mont_sqr, gpinv=gpinv, gp=gp),
        add_mod=add_mod, sub_mod=sub_mod, dbl_mod=dbl_mod, mul9=mul9,
        select=select, is_zero=is_zero, zero_rows=zero_rows,
        from_u16_rows=from_u16_rows, to_u16_rows=to_u16_rows)
