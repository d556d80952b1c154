"""15-bit-limb field arithmetic for the Pallas TPU kernels.

The u16-row representation (pallas_curve.py) pays 5 VPU ops per limb product:
every u16·u16 product must be split into lo/hi halves immediately (a single
product already fills u32). With 15-bit limbs a product is < 2^30, so FOUR
raw products accumulate in one u32 before a split — the schoolbook
convolution drops from 5 ops/product to ~2.7, and one Montgomery multiply
from ~3.7k to ~2.4k VPU ops (~34% less). The EC formulas (ec_rows.py) are
representation-agnostic, so the whole mixed-add scan kernel gets ~30%
cheaper. Same math as the reference's 8×u32 CIOS (fp_bn254.h.metal:237-290),
re-shaped a second time for the VPU's u32 lanes.

Representation: a field element is a list of 17 uint32 arrays ("rows"), each
holding one 15-bit limb (little-endian), value < P. 17·15 = 255 bits.

Montgomery semantics are IDENTICAL to the u16 core (form v = x·2^256 mod P):
REDC runs at 2^255 (one full 17-limb block) and a final exact halving
restores the 2^256 scaling — `mont_mul(a, b) = a·b·2^-256 mod P`, bit-for-bit
the same function as pallas_curve.mont_mul. Values convert between the u16
and 15-bit row forms losslessly (`from_u16_rows` / `to_u16_rows`).

Everything here is plain jnp-on-arrays: usable inside Pallas kernels and
directly (interpret-style) in tests.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from tpu_msm.models import bn254

NROWS = 17
BITS = 15
MASK = np.uint32((1 << BITS) - 1)
B15 = np.uint32(1 << BITS)
_U1 = np.uint32(1)

# Products of 15-bit limbs are < 2^30: 4 fit in u32 (4·(2^15-1)^2 < 2^32).
GROUP = 4


def const_rows(value: int):
    return [np.uint32((value >> (BITS * i)) & int(MASK)) for i in range(NROWS)]


P_ROWS = const_rows(bn254.P)
PINV_ROWS = const_rows((-pow(bn254.P, -1, 1 << 255)) % (1 << 255))
ONE_MONT_ROWS = const_rows((1 << 256) % bn254.P)  # Montgomery 1 (R = 2^256)


# ---------------------------------------------------------------------------
# Row-form conversions (lossless; static bit re-slicing, ~3 ops per row).
# ---------------------------------------------------------------------------

def from_u16_rows(u16):
    """16 canonical u16 rows -> 17 canonical 15-bit rows."""
    out = []
    for j in range(NROWS):
        lo_bit = BITS * j
        k, s = lo_bit >> 4, lo_bit & 15
        v = u16[k] >> np.uint32(s)
        if s > 1 and k + 1 < 16:  # top (15 - (16 - s)) bits come from row k+1
            v = v | (u16[k + 1] << np.uint32(16 - s))
        out.append(v & MASK)
    return out


def to_u16_rows(r15):
    """17 canonical 15-bit rows -> 16 canonical u16 rows."""
    out = []
    for j in range(16):
        lo_bit = 16 * j
        k, s = lo_bit // BITS, lo_bit % BITS
        v = r15[k] >> np.uint32(s)
        if k + 1 < NROWS:
            v = v | (r15[k + 1] << np.uint32(BITS - s))
        if k + 2 < NROWS and BITS - s < 16 and 2 * BITS - s < 16:
            v = v | (r15[k + 2] << np.uint32(2 * BITS - s))
        out.append(v & np.uint32(0xFFFF))
    return out


# ---------------------------------------------------------------------------
# Canonical arithmetic (rows < 2^15, value < P).
# ---------------------------------------------------------------------------

def ripple(cols):
    """Sequential exact carry propagation; cols[k] < 2^31 allowed."""
    out = []
    c = None
    for v in cols:
        if c is not None:
            v = v + c
        out.append(v & MASK)
        c = v >> BITS
    return out, c


def sub_rows(a, b):
    out = []
    bor = None
    for x, y in zip(a, b):
        v = x - y + B15 if bor is None else x - y - bor + B15
        out.append(v & MASK)
        bor = _U1 - (v >> BITS)
    return out, bor


def select(mask, a, b):
    return [jnp.where(mask, x, y) for x, y in zip(a, b)]


def is_zero(a):
    z = a[0] == 0
    for r in a[1:]:
        z = z & (r == 0)
    return z


def zero_rows(like):
    return [jnp.zeros_like(like) for _ in range(NROWS)]


def bcast_rows(c_rows, like):
    return [jnp.full_like(like, c) for c in c_rows]


def cond_sub_p(rows):
    d, bor = sub_rows(rows, P_ROWS)
    return select(bor == 0, d, rows)


def add_mod(a, b):
    s, _ = ripple([x + y for x, y in zip(a, b)])
    return cond_sub_p(s)


def sub_mod(a, b):
    d, bor = sub_rows(a, b)
    dp, _ = ripple([x + y for x, y in zip(d, P_ROWS)])
    return select(bor == 1, dp, d)


def dbl_mod(a):
    return add_mod(a, a)


def neg_mod(a):
    d, _ = sub_rows(P_ROWS, a)
    return select(is_zero(a), a, d)


def mul9(a):
    return add_mod(dbl_mod(dbl_mod(dbl_mod(a))), a)


# ---------------------------------------------------------------------------
# Multiplication: schoolbook convolution with grouped-by-4 raw accumulation.
# ---------------------------------------------------------------------------

def _conv_cols(a, b_rows, nb, max_col=None):
    """Raw (unrippled) columns of a (17 rows) times b (nb rows/constants).

    Products accumulate raw in groups of GROUP (sum < 2^32), each group is
    split once into a 15-bit lo part and a carry part for the next column.
    Returns na+nb column values, each < 2^21 — ripple()-ready. `max_col`
    truncates (for mod-2^255 low products).
    """
    nout = NROWS + nb if max_col is None else max_col
    lo = [None] * nout
    hi = [None] * (nout + 1)
    groups = [[] for _ in range(nout)]
    for i in range(NROWS):
        ai = a[i]
        for j in range(nb):
            k = i + j
            if k >= nout:
                continue
            groups[k].append((ai, b_rows[j]))
    for k in range(nout):
        for g0 in range(0, len(groups[k]), GROUP):
            g = None
            for x, y in groups[k][g0:g0 + GROUP]:
                p = x * y
                g = p if g is None else g + p
            gl = g & MASK
            gh = g >> BITS
            lo[k] = gl if lo[k] is None else lo[k] + gl
            if k + 1 < nout + 1:
                hi[k + 1] = gh if hi[k + 1] is None else hi[k + 1] + gh
    cols = []
    for k in range(nout):
        v = lo[k]
        h = hi[k] if k < len(hi) else None
        if v is None:
            v = h if h is not None else np.uint32(0)
        elif h is not None:
            v = v + h
        cols.append(v)
    return cols


def _halve(rows):
    """Exact v/2 mod P for canonical v: (v + odd·P) >> 1."""
    odd = (rows[0] & _U1) != 0
    vp, _ = ripple([x + y for x, y in zip(rows, P_ROWS)])
    h = select(odd, vp, rows)
    out = []
    for j in range(NROWS):
        v = h[j] >> _U1
        if j + 1 < NROWS:
            v = v | ((h[j + 1] & _U1) << np.uint32(BITS - 1))
        out.append(v)
    return out


def mont_mul_conv(a, b):
    """Montgomery product a·b·2^-256 mod P of canonical rows, result < P.

    REDC at 2^255 (m = t_lo·(-P^-1) mod 2^255; (t + mP) >> 255) then one
    exact halving to restore the u16 core's 2^256 scaling. The final sum
    ripples ONCE over the raw t and m·P columns combined (their per-column
    sums stay < 2^22), instead of three separate full ripples.

    Superseded as the production multiplier by `mont_mul_cios` below
    (measured +10% on v5e: 474.4 -> 524.0 M mul/s single-chain, 769.0 ->
    809.2 M dual-chain, artifacts/montmul_*ilp*.log); kept as the
    differential pin for it (test_f15.py).
    """
    t_cols = _conv_cols(a, b, NROWS)  # 34 raw columns
    t_lo, _ = ripple(t_cols[:NROWS])  # canonical low block (value t mod 2^255)
    m_cols = _conv_cols(t_lo, PINV_ROWS, NROWS, max_col=NROWS)
    m, _ = ripple(m_cols)
    mp_cols = _conv_cols(m, P_ROWS, NROWS)  # 34 raw columns
    comb = [x + y for x, y in zip(t_cols, mp_cols)]
    rows, _ = ripple(comb)  # low 17 rows are structurally zero
    return _halve(cond_sub_p(rows[NROWS:]))


def mont_mul_cios(a, b):
    """Bit-identical alternative to `mont_mul_conv` with word-serial REDC (CIOS,
    the shape of the reference's u32 CIOS, fp_bn254.h.metal:237-290, re-cut
    for 15-bit limbs).

    Instead of materializing the full 17-limb m = t_lo·(-P^-1) mod 2^255
    (a 153-mul truncated convolution plus its own ripple), each m digit is
    produced word-by-word from the running column value using only
    pinv0 = (-P^-1) mod 2^15, and the m_j·P products are consumed by the
    same grouped raw accumulation as `_conv_cols`. Saves ~14% of the VPU
    ops of a mont-mul (no m-conv, no m ripple, the low half of t+mP
    resolves inside the digit chain) and shortens the serial spine (the
    ~5-op/word digit chain replaces two full 17-word ripples). Measured on
    hardware by benches/montmul_benchmark.py --impls f15c.
    """
    t_cols = _conv_cols(a, b, NROWS)  # 34 raw columns, each < 2^22
    pinv0 = PINV_ROWS[0]
    zero = jnp.zeros_like(a[0])
    ncols = 2 * NROWS
    # Pending m_j * P_d product operands per output column (filled as the
    # m digits become known; flushed in GROUP-sized raw batches).
    pending = [[] for _ in range(ncols)]
    extra = [None] * ncols  # group carries + digit-chain spill per column

    def _acc(k, v):
        extra[k] = v if extra[k] is None else extra[k] + v

    def _flush(k, v):
        """Add column k's pending products to v in groups of GROUP; group
        carries go one column up. Returns the updated column value."""
        for g0 in range(0, len(pending[k]), GROUP):
            g = None
            for x, y in pending[k][g0:g0 + GROUP]:
                p = x * y
                g = p if g is None else g + p
            v = v + (g & MASK)
            if k + 1 < ncols:
                _acc(k + 1, g >> BITS)
        return v

    carry = None
    for k in range(NROWS):
        v = t_cols[k]
        if extra[k] is not None:
            v = v + extra[k]
        v = _flush(k, v)
        if carry is not None:
            v = v + carry
        mk = ((v & MASK) * pinv0) & MASK
        v = v + mk * P_ROWS[0]  # low 15 bits of v are now structurally zero
        carry = v >> BITS
        for d in range(1, NROWS):
            pending[k + d].append((mk, P_ROWS[d]))
    # High half: grouped products + t columns + the digit chain's carry.
    hi = []
    for k in range(NROWS, ncols):
        v = t_cols[k] if k < len(t_cols) else zero
        if extra[k] is not None:
            v = v + extra[k]
        v = _flush(k, v)
        if k == NROWS:
            v = v + carry
        hi.append(v)
    rows, _ = ripple(hi)  # (t + m*P) >> 255 < 2P: no carry out of row 16
    return _halve(cond_sub_p(rows))


# Production multiplier: the word-serial CIOS REDC (see measurements above).
mont_mul = mont_mul_cios


def mont_sqr(a):
    return mont_mul(a, a)
