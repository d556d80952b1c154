"""BN254 base-field Fp arithmetic in Montgomery form, vectorized over batches.

TPU-native counterpart of the reference's `FpBN254`
(`src/metal/shader/fields/fp_bn254.h.metal:25-291`). Differences by design:

* The reference interleaves multiply and reduction limb-by-limb (CIOS,
  fp_bn254.h.metal:237-290) because each GPU thread is scalar. Here we use
  **full-product multiplication followed by one-shot Montgomery REDC**: the
  full product and `m = T_lo * (-P^-1) mod 2^256` are outer-product column
  sums (one wide gather + vector reduce each), and `(T + m*P) >> 256` needs a
  single carry-propagation pass. Fewer sequential dependencies, and all heavy
  ops are full-width VPU vector ops over the batch.
* Reduction is branchless (select-based conditional subtract), matching the
  reference's branchless add (fp_bn254.h.metal:225-230).
* Inversion/pow use static-exponent square-and-multiply (the reference uses a
  303-mult addchain, fp_bn254.h.metal:116-208; we pay ~380 mults but keep the
  code generic — inversion is never on the hot path).

Element representation: uint32 array of shape (16, *batch), canonical
Montgomery form in [0, P). See `tpu_msm.ops.u256` for the limb layout.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from tpu_msm.models import bn254
from tpu_msm.models.bn254 import LIMBS, LIMB_BITS
from tpu_msm.ops import u256
from tpu_msm.ops.u256 import U32, _carry_propagate, _column_sums, _IDX_FULL

_MASK = np.uint32(bn254.LIMB_MASK)


def _const(limbs_np, like):
    """Broadcast a constant limb vector against `like`'s batch dims."""
    return u256.from_const(limbs_np, batch_ndim=like.ndim - 1)


def p_limbs(like):
    return _const(bn254.P_LIMBS, like)


def const_mont(value: int):
    """(16, 1) limb array of an integer constant (caller supplies Montgomery
    form when the consumer expects it — e.g. glv.BETA_MONT)."""
    return u256.from_const(bn254.int_to_limbs(value, LIMBS))


def zero(batch_shape):
    return jnp.zeros((LIMBS, *batch_shape), dtype=U32)


def one_mont(batch_shape):
    """Montgomery one = R mod P (reference: fp_bn254.h.metal:91-94)."""
    return jnp.broadcast_to(
        u256.from_const(bn254.R_MOD_P_LIMBS, len(batch_shape)),
        (LIMBS, *batch_shape),
    )


def cond_sub_p(a):
    """a - P if a >= P else a (branchless). Reference: fp_bn254.h.metal:225-230."""
    d, bor = u256.sub(a, p_limbs(a))
    return u256.select(bor == 0, d, a)


def add_mod(a, b):
    """(a + b) mod P for a, b in [0, P). Sum < 2P < 2^255: no limb overflow."""
    s, _ = u256.add(a, b)
    return cond_sub_p(s)


def sub_mod(a, b):
    """(a - b) mod P. Reference: fp_bn254.h.metal:232-234."""
    d, bor = u256.sub(a, b)
    d_fix, _ = u256.add(d, p_limbs(a))
    return u256.select(bor == 1, d_fix, d)


def neg_mod(a):
    """(-a) mod P, with -0 = 0. Reference: fp_bn254.h.metal:210-212."""
    d, _ = u256.sub(p_limbs(a), a)
    return u256.select(u256.is_zero(a), a, d)


def double_mod(a):
    return add_mod(a, a)


def redc(t):
    """Montgomery reduction: t (32, *batch) < P*2^256  ->  t*2^-256 mod P.

    m = (t mod 2^256) * (-P^-1) mod 2^256; result = (t + m*P) >> 256, then one
    conditional subtract. The m*P column sums are merged with t's limbs before
    the single carry pass.
    """
    batch = t.shape[1:]
    m = u256.mul_lo(t[:LIMBS], _const(bn254.P_INV_NEG_LIMBS, t))
    clo, chi = _column_sums(m, _const(bn254.P_LIMBS, t), _IDX_FULL)
    cols = clo + jnp.concatenate([jnp.zeros_like(chi[:1]), chi[:-1]], axis=0)
    cols = cols + t  # t limbs < 2^16; column sums stay < 2^22.
    limbs, carry = _carry_propagate(cols, 2 * LIMBS)
    # Low 16 limbs are structurally zero; the value is limbs[16:], < 2P.
    del carry
    return cond_sub_p(limbs[LIMBS:])


def mont_mul(a, b):
    """Montgomery product a*b*R^-1 mod P (reference CIOS: fp_bn254.h.metal:237-290)."""
    return redc(u256.mul_full(a, b))


def mont_mul_const(a, c_int: int):
    """Montgomery product of a (16, N) batch with an integer CONSTANT
    (caller supplies the Montgomery form, e.g. glv.BETA_MONT).

    Same math as mont_mul, but every multiply is a static-loop constant
    product (u256.mul_const): mont_mul's mul_full materializes a
    (16, 32, N) outer product + anti-diagonal gather, measured ~0.5 s at
    N = 2^20 in the first GLV row (artifacts/autotune_r4b.log); this shape
    is a few thousand flat vector ops."""
    t = u256.mul_const(a, c_int, 32)
    m = u256.mul_const(t[:LIMBS], bn254.limbs_to_int(bn254.P_INV_NEG_LIMBS),
                       LIMBS)
    mp = u256.mul_const(m, bn254.P, 32)
    s, _ = u256.add(t, mp)  # low 16 limbs structurally zero
    return cond_sub_p(s[LIMBS:])


def mont_mul_many(pairs):
    """Compute many independent Montgomery products as ONE stacked multiply.

    `pairs` is a list of (a, b) with identical shapes; the operands are
    stacked along a fresh axis so the whole group costs a single traced
    mont_mul (one outer product, one gather, one carry resolve). This is how
    the EC formulas keep their traced-op count low and their VPU ops wide —
    the TPU answer to the reference's per-thread sequential field muls.
    """
    a = jnp.stack([p[0] for p in pairs], axis=1)
    b = jnp.stack([p[1] for p in pairs], axis=1)
    prod = mont_mul(a, b)
    return [prod[:, i] for i in range(len(pairs))]


def mont_sqr(a):
    return mont_mul(a, a)


def to_mont(a):
    """Standard form -> Montgomery form (multiply by R^2)."""
    return mont_mul(a, _const(bn254.R2_MOD_P_LIMBS, a))


def from_mont(a):
    """Montgomery form -> standard form (REDC of the zero-extended value)."""
    t = jnp.concatenate([a, jnp.zeros_like(a)], axis=0)
    return redc(t)


def pow_fixed(a, exponent: int):
    """a^exponent (Montgomery in/out) for a static Python-int exponent.

    Left-to-right square-and-multiply, unrolled at trace time.
    Reference analogue: fp_bn254.h.metal:100-114 (pow by squaring).
    """
    if exponent == 0:
        return one_mont(a.shape[1:])
    acc = a
    for bit in bin(exponent)[3:]:  # skip leading '1'
        acc = mont_sqr(acc)
        if bit == "1":
            acc = mont_mul(acc, a)
    return acc


def inv_mont(a):
    """Modular inverse via Fermat (a^(P-2)); inverse of 0 is 0.

    Reference analogue: the addchain inverse at fp_bn254.h.metal:116-208.
    """
    return pow_fixed(a, bn254.P - 2)


def batch_inv_mont(a):
    """Batched modular inverse (Montgomery trick): (16, N) -> (16, N) with
    ~3 Montgomery muls per element plus ONE Fermat inversion, vs ~380 muls
    per element for elementwise inv_mont. Zeros invert to zero.

    prefix/suffix products run as log-depth jax.lax.associative_scan over
    mont_mul (Montgomery-form values compose exactly: mont(a,b) = (ab)·R).
    The reference has no batch inverse (its inverse is the per-thread
    addchain, fp_bn254.h.metal:116-208); this is the vectorized equivalent
    that makes on-device batch affine normalization practical.
    """
    import jax

    zero_mask = u256.is_zero(a)
    safe = u256.select(zero_mask, one_mont(a.shape[1:]), a)
    prefix = jax.lax.associative_scan(mont_mul, safe, axis=1)
    suffix = jax.lax.associative_scan(mont_mul, safe, axis=1, reverse=True)
    total_inv = inv_mont(prefix[:, -1])
    ones = one_mont((1, *a.shape[2:]))
    pre = jnp.concatenate([ones, prefix[:, :-1]], axis=1)   # prod_{j<i}
    suf = jnp.concatenate([suffix[:, 1:], ones], axis=1)    # prod_{j>i}
    t = jnp.broadcast_to(jnp.expand_dims(total_inv, 1), a.shape)
    inv = mont_mul(mont_mul(pre, suf), t)
    return u256.select(zero_mask, zero(a.shape[1:]), inv)


def sqrt_mont(a):
    """Candidate square root a^((P+1)/4) (P = 3 mod 4). Caller must verify
    sqrt^2 == a; used by the on-device random-point sampler."""
    return pow_fixed(a, bn254.SQRT_EXP)


def is_zero(a):
    return u256.is_zero(a)


def eq(a, b):
    """Equality of canonical-form elements is limb-wise equality."""
    return u256.eq(a, b)


def select(cond, a, b):
    return u256.select(cond, a, b)
