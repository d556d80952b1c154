"""Vectorized 256-bit unsigned integer arithmetic on u16 limbs in uint32 lanes.

TPU-native counterpart of the reference's `UnsignedInteger<8>` template
(`src/metal/shader/arithmetics/unsigned_int.h.metal:6-310`). Design differs
deliberately from the reference's big-endian 8x32-bit limbs:

* **16 little-endian limbs of 16 bits**, each stored in a uint32 lane. A
  16x16-bit product fits *exactly* in uint32 (max 0xFFFE0001), so schoolbook
  multiplication needs no 64-bit type (TPUs have none) and no mulhi.
* **Limbs-first layout**: arrays have shape ``(LIMBS, *batch)``. Elementwise
  ops act on ``(*batch,)`` slices, which XLA tiles onto full 8x128 VPU tiles;
  a limbs-last layout would pad the 16-wide minor axis to 128 lanes and waste
  7/8 of the VPU.
* Multiplication is computed as an outer product of limb vectors followed by
  one gather that aligns anti-diagonals and a single carry-propagation pass,
  instead of the reference's sequential schoolbook loop
  (unsigned_int.h.metal:131-165) — far fewer XLA ops for the same multiply
  count, and every op is a wide vector op.

All functions are shape-polymorphic over the batch dims and jit-safe.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from tpu_msm.models.bn254 import LIMBS, LIMB_BITS, LIMB_MASK

U32 = jnp.uint32
_MASK = np.uint32(LIMB_MASK)
_BASE = np.uint32(LIMB_MASK + 1)


def zeros(batch_shape, limbs: int = LIMBS):
    return jnp.zeros((limbs, *batch_shape), dtype=U32)


def from_const(limbs_np: np.ndarray, batch_ndim: int = 1):
    """Constant limb vector -> broadcastable (LIMBS, 1, 1, ...) jnp array."""
    arr = jnp.asarray(limbs_np, dtype=U32)
    return arr.reshape(arr.shape[0], *([1] * batch_ndim))


def _shift_up(x, d: int):
    """Shift limb rows toward higher indices by d, filling with zeros.
    (The value moved into limb k comes from limb k-d.) Implemented as a
    single lax.pad with negative high-edge padding — one XLA op instead of
    the zeros+slice+concatenate triple, which XLA:CPU turned into a
    standalone fusion kernel per instance (compile-time killer)."""
    pad_cfg = [(d, -d, 0)] + [(0, 0, 0)] * (x.ndim - 1)
    return jax.lax.pad(x, jnp.zeros((), x.dtype), pad_cfg)


def _resolve_carries(s, extra_bits: int):
    """Exact carry resolution of per-limb sums s[k] < 2^(16+extra_bits).

    Returns (limbs, carry_out) such that sum_k s[k]*2^(16k) ==
    sum_k limbs[k]*2^(16k) + carry_out*2^(16n), with limbs < 2^16.

    One relaxation pass folds the multi-bit carries down to {0,1}; the
    remaining single-bit ripple is resolved in closed form with cumulative
    scans instead of a Kogge-Stone ladder: with generate g, propagate p in
    {0,1} and q = cumsum(1-p), the carry out of limb k is

        c[k] = OR_{j<=k} ( g[j] AND p[j+1..k] ) = [ cummax(g*(q+1))[k] == q[k]+1 ]

    because p[j+1..k] all set iff q[j] == q[k]. Two scans + elementwise ops —
    no limb-axis slicing at all (the ladder's ~10 shifted slices each became
    a separate fusion kernel on XLA:CPU, dominating compile time).
    """
    if extra_bits > 0:
        lo = s & _MASK
        hi = s >> LIMB_BITS  # < 2^extra_bits
        s = lo + _shift_up(hi, 1)  # < 2^16 + 2^extra_bits
        top_carry = hi[-1]
    else:
        top_carry = jnp.zeros(s.shape[1:], dtype=U32)
    g = s >> LIMB_BITS  # in {0, 1}
    r = s & _MASK
    p = (r == _MASK).astype(U32)
    q = jnp.cumsum(jnp.uint32(1) - p, axis=0, dtype=U32)
    marks = jax.lax.cummax(g * (q + jnp.uint32(1)), axis=0)
    c = (marks == q + jnp.uint32(1)).astype(U32)
    cin = _shift_up(c, 1)
    out = (r + cin) & _MASK
    return out, c[-1] + top_carry


def add(a, b):
    """Full add with carry. Returns (sum_limbs, carry_out).

    Reference analogue: unsigned_int.h.metal:77-104 (add with carry).
    """
    return _resolve_carries(a + b, extra_bits=1)


def sub(a, b):
    """a - b mod 2^(16n). Returns (diff_limbs, borrow_out in {0,1}).

    Computed as a + ~b + 1 (two's complement add); borrow = 1 - carry_out.
    Reference analogue: unsigned_int.h.metal:106-129 (sub with borrow).
    """
    n = a.shape[0]
    one_at_0 = np.zeros((n,) + (1,) * max(len(jnp.broadcast_shapes(a.shape[1:], b.shape[1:])), 0), dtype=np.uint32)
    one_at_0[0] = 1
    s = a + (_MASK - b) + jnp.asarray(one_at_0)
    limbs, carry = _resolve_carries(s, extra_bits=1)
    return limbs, jnp.uint32(1) - carry


def geq(a, b):
    """a >= b, elementwise over batch. Reference: unsigned_int.h.metal:234-268."""
    _, bor = sub(a, b)
    return bor == 0


def is_zero(a):
    return jnp.all(a == 0, axis=0)


def eq(a, b):
    return jnp.all(a == b, axis=0)


def select(cond, a, b):
    """Branchless limb-wise select; cond has batch shape."""
    return jnp.where(cond[None], a, b)


# ---------------------------------------------------------------------------
# Multiplication via outer product + anti-diagonal gather + one carry pass.
# ---------------------------------------------------------------------------

def _antidiag_index(n_rows: int, n_cols_out: int, n_cols_pad: int) -> np.ndarray:
    """Static gather indices aligning anti-diagonals into columns.

    Q[i, k] = P_pad[i, (k - i) mod n_cols_pad]; entries with k-i outside
    [0, n_rows) hit the zero-padded region of P_pad.
    """
    i = np.arange(n_rows)[:, None]
    k = np.arange(n_cols_out)[None, :]
    return ((k - i) % n_cols_pad).astype(np.int32)


_IDX_FULL = _antidiag_index(LIMBS, 2 * LIMBS, 2 * LIMBS)   # (16, 32)
_IDX_LO = _antidiag_index(LIMBS, LIMBS, 2 * LIMBS)         # (16, 16)


def _column_sums(a, b, idx: np.ndarray):
    """Sum_i a_i * b_{k-i} for each output column k (no carry propagation).

    Each 16x16-bit partial product fits uint32; its low/high 16-bit halves are
    accumulated separately so column sums stay < 2^21 (16 terms of < 2^16).
    Returns (cols_lo, cols_hi) of shape (idx.shape[1], *batch); the true
    column value is cols_lo[k] + cols_hi[k-1] handled by the caller.
    """
    batch_shape = jnp.broadcast_shapes(a.shape[1:], b.shape[1:])
    p = a[:, None] * b[None, :]                      # (16, nb, *batch)
    pad = 2 * LIMBS - p.shape[1]
    p = jnp.pad(p, [(0, 0), (0, pad)] + [(0, 0)] * len(batch_shape))
    plo = p & _MASK
    phi = p >> LIMB_BITS
    jidx = jnp.asarray(idx).reshape(idx.shape + (1,) * len(batch_shape))
    qlo = jnp.take_along_axis(plo, jidx, axis=1)
    qhi = jnp.take_along_axis(phi, jidx, axis=1)
    return qlo.sum(axis=0), qhi.sum(axis=0)


def _carry_propagate(cols, n_out: int):
    """Resolve <2^22 column sums into canonical u16 limbs. Returns (limbs, carry)."""
    assert cols.shape[0] == n_out
    return _resolve_carries(cols, extra_bits=6)


def mul_full(a, b):
    """Full 256x256 -> 512-bit product, shape (32, *batch).

    Reference analogue: unsigned_int.h.metal:131-165 (schoolbook mul).
    """
    clo, chi = _column_sums(a, b, _IDX_FULL)
    # col[k] = clo[k] + chi[k-1]; both < 2^21 so the sum fits easily.
    cols = clo + jnp.concatenate([jnp.zeros_like(chi[:1]), chi[:-1]], axis=0)
    limbs, carry = _carry_propagate(cols, 2 * LIMBS)
    # a*b < 2^512 exactly fits 32 limbs; carry is structurally zero.
    del carry
    return limbs


def mul_lo(a, b):
    """Low 256 bits of the product (mod 2^256), shape (16, *batch)."""
    clo, chi = _column_sums(a, b, _IDX_LO)
    cols = clo + jnp.concatenate([jnp.zeros_like(chi[:1]), chi[:-1]], axis=0)
    limbs, _ = _carry_propagate(cols, LIMBS)
    return limbs


def mul_const(a, b_int: int, n_out: int):
    """(16, *batch) limbs times an integer CONSTANT -> n_out limbs, exact
    mod 2^(16*n_out).

    Static per-limb loops: `mul_full` materializes a (16, 32, *batch)
    padded outer product and gathers anti-diagonals — fine at test widths,
    catastrophic at 2^20 (the GLV decomposition's first autotune row spent
    ~0.5 s here, artifacts/autotune_r4b.log). With b known at trace time
    this emits ~16*nb vectorized mult/mask/shift/adds on the batch rows and
    no large intermediate at all; zero limbs of b are skipped."""
    nb = -(-max(b_int.bit_length(), 1) // LIMB_BITS)
    lo = [None] * n_out
    hi = [None] * n_out
    for j in range(nb):
        bj = np.uint32((b_int >> (LIMB_BITS * j)) & 0xFFFF)
        if bj == 0:
            continue
        for i in range(LIMBS):
            k = i + j
            if k >= n_out:
                break
            p = a[i] * bj
            pl = p & _MASK
            lo[k] = pl if lo[k] is None else lo[k] + pl
            if k + 1 < n_out:
                ph = p >> np.uint32(LIMB_BITS)
                hi[k + 1] = ph if hi[k + 1] is None else hi[k + 1] + ph
    zero = jnp.zeros_like(a[0])
    cols = jnp.stack([
        (lo[k] if lo[k] is not None else zero)
        + (hi[k] if hi[k] is not None else zero) for k in range(n_out)])
    limbs, _ = _carry_propagate(cols, n_out)
    return limbs


# ---------------------------------------------------------------------------
# Shifts and bit extraction (reference: unsigned_int.h.metal:186-309).
# ---------------------------------------------------------------------------

def shl(a, k: int):
    """Logical left shift by static k bits (mod 2^(16*n))."""
    n = a.shape[0]
    limb_off, bit_off = divmod(k, LIMB_BITS)
    rows = []
    for i in range(n):
        lo_src = i - limb_off
        hi_src = i - limb_off - 1
        v = jnp.zeros(a.shape[1:], dtype=U32)
        if 0 <= lo_src < n:
            v = v | ((a[lo_src] << bit_off) & _MASK)
        if bit_off and 0 <= hi_src < n:
            v = v | (a[hi_src] >> (LIMB_BITS - bit_off))
        rows.append(v)
    return jnp.stack(rows)


def shr(a, k: int):
    """Logical right shift by static k bits."""
    n = a.shape[0]
    limb_off, bit_off = divmod(k, LIMB_BITS)
    rows = []
    for i in range(n):
        lo_src = i + limb_off
        hi_src = i + limb_off + 1
        v = jnp.zeros(a.shape[1:], dtype=U32)
        if 0 <= lo_src < n:
            v = v | (a[lo_src] >> bit_off)
        if bit_off and 0 <= hi_src < n:
            v = v | ((a[hi_src] << (LIMB_BITS - bit_off)) & _MASK)
        rows.append(v)
    return jnp.stack(rows)


def test_bit(a, k: int):
    """Bit k of each batch element (static k). Reference: :272-283."""
    limb, bit = divmod(k, LIMB_BITS)
    return (a[limb] >> bit) & jnp.uint32(1)


def extract_bits(a, start: int, width: int):
    """Bits [start, start+width) as a uint32 batch array (width <= 16).

    Reference analogue: unsigned_int.h.metal:285-309 (extract_bits) and the
    window fragment extraction in the prepare kernel (msm.h.metal:33-41).
    """
    assert width <= 32 - LIMB_BITS + 1 or width <= LIMB_BITS
    limb, bit = divmod(start, LIMB_BITS)
    v = a[limb] >> bit
    take_hi = LIMB_BITS - bit < width and limb + 1 < a.shape[0]
    if take_hi:
        v = v | (a[limb + 1] << (LIMB_BITS - bit))
    return v & jnp.uint32((1 << width) - 1)
