"""15-bit-limb field core tests (ops/f15.py) — differential vs Python ints.

Same oracle pattern as test_field.py for the u16 core (reference analogue:
shader-op unit tests vs arkworks, src/metal/tests/test_bn254.rs:237-296).
All eager small-array jnp: no XLA pipeline compiles, host-tier fast.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from tpu_msm.models import bn254
from tpu_msm.ops import ec_rows, f15
from tpu_msm.ops import pallas_curve as pc
from tpu_msm.utils import oracle

P = bn254.P
R = 1 << 256


def _to_rows(vals):
    """list of ints -> 17-row f15 representation (batch = len(vals))."""
    return [jnp.asarray([(v >> (15 * j)) & 0x7FFF for v in vals], jnp.uint32)
            for j in range(f15.NROWS)]


def _from_rows(rows):
    out = [0] * int(rows[0].shape[0])
    for j in range(len(rows) - 1, -1, -1):
        col = np.asarray(rows[j])
        for i in range(len(out)):
            out[i] = (out[i] << 15) | int(col[i])
    return out


def _to_u16(vals):
    return [jnp.asarray([(v >> (16 * j)) & 0xFFFF for v in vals], jnp.uint32)
            for j in range(16)]


def _from_u16(rows):
    out = [0] * int(rows[0].shape[0])
    for j in range(len(rows) - 1, -1, -1):
        col = np.asarray(rows[j])
        for i in range(len(out)):
            out[i] = (out[i] << 16) | int(col[i])
    return out


def _rand_fp(rng, k):
    return [int.from_bytes(rng.bytes(32), "little") % P for _ in range(k)]


def test_row_conversions_roundtrip(rng):
    vals = _rand_fp(rng, 16) + [0, 1, P - 1]
    r15 = f15.from_u16_rows(_to_u16(vals))
    assert _from_rows(r15) == vals
    back = f15.to_u16_rows(r15)
    assert _from_u16(back) == vals


def test_f15_mont_mul_vs_ints(rng):
    a = _rand_fp(rng, 12) + [0, 1, P - 1, 1]
    b = _rand_fp(rng, 12) + [P - 1, 0, P - 1, 1]
    got = _from_rows(f15.mont_mul(_to_rows(a), _to_rows(b)))
    want = [x * y * pow(R, -1, P) % P for x, y in zip(a, b)]
    assert got == want


def test_f15_add_sub_neg_mul9_halve(rng):
    a = _rand_fp(rng, 10) + [0, P - 1]
    b = _rand_fp(rng, 10) + [0, 1]
    ra, rb = _to_rows(a), _to_rows(b)
    assert _from_rows(f15.add_mod(ra, rb)) == [(x + y) % P for x, y in zip(a, b)]
    assert _from_rows(f15.sub_mod(ra, rb)) == [(x - y) % P for x, y in zip(a, b)]
    assert _from_rows(f15.neg_mod(ra)) == [(-x) % P for x in a]
    assert _from_rows(f15.mul9(ra)) == [9 * x % P for x in a]
    assert _from_rows(f15._halve(ra)) == [x * pow(2, -1, P) % P for x in a]


def test_f15_scan_step_matches_u16_pipeline(rng):
    """Three eager f15 scan steps (the exact per-grid-step compute of
    pallas_curve._scan_madd_u16_f15_kernel, incl. the packed-input unpack,
    the infinity init, and the u16 wire output) vs curve.proj_madd."""
    import jax.numpy as jnp_

    from tpu_msm.ops import curve
    from tpu_msm.ops.curve import AffinePoint
    from tpu_msm.ops.pippenger import pack_u16_rows
    from tpu_msm.utils import interop

    ks = [[3, 7], [5, 0], [11, 2]]  # step 1 lane 1: infinity sentinel
    steps_pts = [[oracle.ec_mul(oracle.GEN, k) if k else None for k in row]
                 for row in ks]
    acc = (f15.bcast_rows([np.uint32(0)] * f15.NROWS, jnp_.zeros(2, jnp_.uint32)),
           f15.bcast_rows(f15.ONE_MONT_ROWS, jnp_.zeros(2, jnp_.uint32)),
           f15.bcast_rows([np.uint32(0)] * f15.NROWS, jnp_.zeros(2, jnp_.uint32)))
    ref_acc = curve.proj_infinity((2,))
    for pts in steps_pts:
        x, y = interop.affine_points_to_limbs(pts)
        gx = pack_u16_rows(jnp_.asarray(x))
        gy = pack_u16_rows(jnp_.asarray(y))
        acc, out48 = pc.f15_scan_step(acc, [gx[i] for i in range(8)],
                                      [gy[i] for i in range(8)])
        ref_acc = curve.proj_madd(
            ref_acc, AffinePoint(jnp_.asarray(x), jnp_.asarray(y)))
        got = np.stack([np.asarray(r) for r in out48])
        want = np.concatenate([np.asarray(a) for a in ref_acc])
        assert (got == want).all()


def test_f15_proj_madd_matches_u16_core(rng):
    """The shared RCB formulas over F15 must agree bit-for-bit with the u16
    core on the same points (incl. doubling, negation, and infinity cases)."""
    k1 = [3, 5, 9, 9, 1, 7]
    k2 = [4, 11, 9, oracle.FR - 9, 2, 0]  # equal, inverse, and zero cases
    p1 = [oracle.ec_mul(oracle.GEN, k) for k in k1]
    p2 = [oracle.ec_mul(oracle.GEN, k) if k else None for k in k2]
    to_m = lambda v: v * (R % P) % P
    x1 = _to_u16([to_m(p[0]) for p in p1])
    y1 = _to_u16([to_m(p[1]) for p in p1])
    z1 = _to_u16([to_m(1)] * len(p1))
    x2 = _to_u16([to_m(p[0]) if p else 0 for p in p2])
    y2 = _to_u16([to_m(p[1]) if p else 0 for p in p2])

    r16 = ec_rows.proj_madd(pc.F16, x1, y1, z1, x2, y2)
    r15 = ec_rows.proj_madd(
        f15, f15.from_u16_rows(x1), f15.from_u16_rows(y1),
        f15.from_u16_rows(z1), f15.from_u16_rows(x2), f15.from_u16_rows(y2))
    for a, b in zip(r16, (f15.to_u16_rows(r) for r in r15)):
        assert _from_u16(a) == _from_u16(b)
    # Sanity vs the oracle on the generic lane 0: (k1+k2)·G
    got = _from_u16(r16[0])[0], _from_u16(r16[1])[0], _from_u16(r16[2])[0]
    rinv = pow(R, -1, P)
    x, y, z = (v * rinv % P for v in got)
    zi = pow(z, P - 2, P)
    assert (x * zi % P, y * zi % P) == oracle.ec_mul(oracle.GEN, k1[0] + k2[0])


def test_f15_proj_add_matches_u16_core(rng):
    """Full projective add (nontrivial z on both sides, plus equal and
    infinite operands) — F15 vs F16 bit-identity."""
    k1 = [3, 6, 6, 0]
    k2 = [4, 6, 0, 5]
    to_m = lambda v: v * (R % P) % P

    def proj(ks):
        # z = 2 (Montgomery): scale affine coords by 2, 4 to get (2x:2y... )
        # homogeneous (X:Y:Z) = (x*z : y*z : z) for z = 3.
        xs, ys_, zs = [], [], []
        for k in ks:
            if k == 0:
                xs.append(0); ys_.append(to_m(1)); zs.append(0)
            else:
                x, y = oracle.ec_mul(oracle.GEN, k)
                xs.append(to_m(x * 3 % P)); ys_.append(to_m(y * 3 % P))
                zs.append(to_m(3))
        return _to_u16(xs), _to_u16(ys_), _to_u16(zs)

    p1 = proj(k1)
    p2 = proj(k2)
    r16 = ec_rows.proj_add(pc.F16, *p1, *p2)
    r15 = ec_rows.proj_add(f15, *(f15.from_u16_rows(a) for a in p1),
                           *(f15.from_u16_rows(a) for a in p2))
    for a, b in zip(r16, (f15.to_u16_rows(r) for r in r15)):
        assert _from_u16(a) == _from_u16(b)


def test_fmxu_mont_mul_matches_f15(rng):
    """The MXU-REDC core (ops/fmxu.py) must be bit-identical to f15: the
    constant convolutions become int8 matmuls with exact int32 accumulation
    plus 15-bit-radix column redistribution — same function, different unit."""
    from tpu_msm.ops import fmxu

    vals_a = _rand_fp(rng, 16) + [0, 1, P - 1, (1 << 254) % P]
    vals_b = _rand_fp(rng, 16) + [P - 1, 1, P - 1, P - 2]
    a, b = _to_rows(vals_a), _to_rows(vals_b)
    got = fmxu.mont_mul(a, b)
    want = f15.mont_mul(a, b)
    for g, w in zip(got, want):
        assert (np.asarray(g) == np.asarray(w)).all()


def test_fmxu_proj_madd_matches_f15(rng):
    """Full RCB mixed add through the fmxu namespace (the exact compute the
    mxu scan kernel runs per grid step) vs the f15 namespace."""
    import jax

    from tpu_msm.ops import fmxu

    k = 8
    pts = [oracle.ec_mul(oracle.GEN, int(rng.randint(1, 1 << 20)))
           for _ in range(k)]
    qts = [oracle.ec_mul(oracle.GEN, int(rng.randint(1, 1 << 20)))
           for _ in range(k)]
    to_mont = lambda v: (v << 256) % P
    x1 = _to_rows([to_mont(p[0]) for p in pts])
    y1 = _to_rows([to_mont(p[1]) for p in pts])
    z1 = _to_rows([to_mont(1)] * k)
    x2 = _to_rows([to_mont(q[0]) for q in qts])
    y2 = _to_rows([to_mont(q[1]) for q in qts])
    F = fmxu.make_namespace(jnp.asarray(fmxu.G_PINV_PACKED),
                            jnp.asarray(fmxu.G_P_PACKED))
    got = ec_rows.proj_madd(F, x1, y1, z1, x2, y2)
    want = ec_rows.proj_madd(f15, x1, y1, z1, x2, y2)
    for gc, wc in zip(got, want):
        for g, w in zip(gc, wc):
            assert (np.asarray(g) == np.asarray(w)).all()


def test_mont_mul_cios_matches_conv(rng):
    """The production word-serial CIOS REDC (f15.mont_mul = mont_mul_cios)
    must be bit-identical to the convolution-REDC multiplier it replaced
    (mont_mul_conv) — including the 0 / 1 / P-1 corners."""
    vals_a = [0, 1, P - 1] + [int.from_bytes(rng.bytes(32), "little") % P
                              for _ in range(5)]
    vals_b = [P - 1, 0, 1] + [int.from_bytes(rng.bytes(32), "little") % P
                              for _ in range(5)]
    a = [jnp.asarray([(v >> (15 * i)) & 0x7FFF for v in vals_a], jnp.uint32)
         for i in range(f15.NROWS)]
    b = [jnp.asarray([(v >> (15 * i)) & 0x7FFF for v in vals_b], jnp.uint32)
         for i in range(f15.NROWS)]
    got = f15.mont_mul_cios(a, b)
    want = f15.mont_mul_conv(a, b)
    for g, w in zip(got, want):
        assert (np.asarray(g) == np.asarray(w)).all()
    for j, (va, vb) in enumerate(zip(vals_a, vals_b)):
        v = sum(int(np.asarray(got[i])[j]) << (15 * i)
                for i in range(f15.NROWS))
        assert v == va * vb * pow(1 << 256, -1, P) % P


def test_dual_field_matches_single(rng):
    """ec_rows.DualField (two interleaved half-batch streams — the VLIW
    dual-issue kernel layout) must be bit-identical to the single-stream
    namespace on the concatenated batch: same formula, disjoint lanes."""
    from tpu_msm.ops.ec_rows import DualField

    k1 = [3, 5, 9, 9, 1, 7, 13, 2]
    k2 = [4, 11, 9, oracle.FR - 9, 2, 0, 6, 8]  # incl. double/inverse/inf
    p1 = [oracle.ec_mul(oracle.GEN, k) for k in k1]
    p2 = [oracle.ec_mul(oracle.GEN, k) if k else None for k in k2]
    to_m = lambda v: v * (R % P) % P
    x1 = f15.from_u16_rows(_to_u16([to_m(p[0]) for p in p1]))
    y1 = f15.from_u16_rows(_to_u16([to_m(p[1]) for p in p1]))
    z1 = f15.from_u16_rows(_to_u16([to_m(1)] * len(p1)))
    x2 = f15.from_u16_rows(_to_u16([to_m(p[0]) if p else 0 for p in p2]))
    y2 = f15.from_u16_rows(_to_u16([to_m(p[1]) if p else 0 for p in p2]))

    single = ec_rows.proj_madd(f15, x1, y1, z1, x2, y2)
    h = len(k1) // 2
    split = lambda rows: ([r[:h] for r in rows], [r[h:] for r in rows])
    dual = ec_rows.proj_madd(DualField(f15), split(x1), split(y1),
                             split(z1), split(x2), split(y2))
    for s, d in zip(single, dual):
        joined = [np.concatenate([np.asarray(a), np.asarray(b)])
                  for a, b in zip(d[0], d[1])]
        for sr, dr in zip(s, joined):
            assert (np.asarray(sr) == dr).all()
