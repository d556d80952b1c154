"""Property-based tests (hypothesis) — the counterpart of the reference's
proptest layer (SURVEY §4; e.g. test_bn254.rs's proptest! blocks over u256 /
Fp ops, prepare_buckets_indices.rs:172-219's randomized window sweeps).

Everything here is host-fast: eager jnp on tiny batches or pure numpy,
differentially checked against Python big-int arithmetic. Heavier randomized
pipeline sweeps live in the device tier; these catch representation-level
bugs (carry chains, masks, wire formats, recoding) across the input space
rather than at hand-picked points.
"""

import numpy as np
import jax.numpy as jnp
from hypothesis import given, settings, strategies as st

from tpu_msm.models import bn254
from tpu_msm.ops import f15, u256
from tpu_msm.ops import pallas_curve as pc
from tpu_msm.utils import interop

P = bn254.P
U256 = st.integers(min_value=0, max_value=(1 << 256) - 1)
FP = st.integers(min_value=0, max_value=P - 1)

_SET = settings(max_examples=25, deadline=None)


def _limbs(vals):
    return jnp.asarray(interop.ints_to_limbs(vals))


def _ints(a):
    return interop.limbs_to_ints(np.asarray(a))


# ---------------------------------------------------------------------------
# u256 limb ops vs Python ints (≙ test_unsigned_integer.h.metal proptests)
# ---------------------------------------------------------------------------

@_SET
@given(U256, U256)
def test_u256_add_sub(a, b):
    ra, rb = _limbs([a]), _limbs([b])
    s, carry = u256.add(ra, rb)
    assert _ints(s)[0] == (a + b) % (1 << 256)
    assert int(np.asarray(carry)[0]) == (a + b) >> 256
    d, borrow = u256.sub(ra, rb)
    assert _ints(d)[0] == (a - b) % (1 << 256)
    assert int(np.asarray(borrow)[0]) == (1 if a < b else 0)


@_SET
@given(U256, U256)
def test_u256_mul_full(a, b):
    t = u256.mul_full(_limbs([a]), _limbs([b]))
    got = _ints(t)[0]
    assert got == a * b


@_SET
@given(U256, st.integers(min_value=0, max_value=255),
       st.integers(min_value=1, max_value=16))
def test_u256_extract_bits(v, start, width):
    width = min(width, 256 - start)
    got = int(np.asarray(u256.extract_bits(_limbs([v]), start, width))[0])
    assert got == (v >> start) & ((1 << width) - 1)


@_SET
@given(U256, U256)
def test_u256_compare(a, b):
    ra, rb = _limbs([a]), _limbs([b])
    assert bool(np.asarray(u256.geq(ra, rb))[0]) == (a >= b)
    assert bool(np.asarray(u256.eq(ra, rb))[0]) == (a == b)
    assert bool(np.asarray(u256.is_zero(ra))[0]) == (a == 0)


# ---------------------------------------------------------------------------
# f15 core vs Python ints (the 15-bit rows are the production scan kernel)
# ---------------------------------------------------------------------------

def _rows15(v):
    return [jnp.asarray([(v >> (15 * j)) & 0x7FFF], jnp.uint32)
            for j in range(f15.NROWS)]


def _row15_int(rows):
    out = 0
    for j in range(len(rows) - 1, -1, -1):
        out = (out << 15) | int(np.asarray(rows[j])[0])
    return out


@_SET
@given(FP, FP)
def test_f15_mont_mul_property(a, b):
    got = _row15_int(f15.mont_mul(_rows15(a), _rows15(b)))
    assert got == a * b * pow(1 << 256, -1, P) % P


@_SET
@given(FP, FP)
def test_f15_add_sub_property(a, b):
    assert _row15_int(f15.add_mod(_rows15(a), _rows15(b))) == (a + b) % P
    assert _row15_int(f15.sub_mod(_rows15(a), _rows15(b))) == (a - b) % P


@_SET
@given(FP)
def test_f15_row_roundtrip(a):
    u16 = [jnp.asarray([(a >> (16 * j)) & 0xFFFF], jnp.uint32)
           for j in range(16)]
    r15 = f15.from_u16_rows(u16)
    assert _row15_int(r15) == a
    back = f15.to_u16_rows(r15)
    got = 0
    for j in range(15, -1, -1):
        got = (got << 16) | int(np.asarray(back[j])[0])
    assert got == a


# ---------------------------------------------------------------------------
# Signed window recoding exactness across window widths (≙ the reference's
# proptest over window_size 2..25, prepare_buckets_indices.rs:172-219)
# ---------------------------------------------------------------------------

@_SET
@given(st.integers(min_value=0, max_value=bn254.FR - 1),
       st.integers(min_value=2, max_value=16))
def test_signed_recode_exact(scalar, c):
    from tpu_msm.ops import pippenger
    from tpu_msm.utils.config import MsmConfig

    cfg = MsmConfig(window_bits=c, signed_digits=True)
    absd, neg = (np.asarray(a)
                 for a in pippenger.signed_window_digits(_limbs([scalar]), cfg))
    assert (absd <= (1 << (c - 1))).all()
    total = sum((-int(a) if ng else int(a)) << (c * w)
                for w, (a, ng) in enumerate(zip(absd[:, 0], neg[:, 0])))
    assert total == scalar


# ---------------------------------------------------------------------------
# Wire formats round-trip (≙ limbs_conversion.rs:469-640 proptests)
# ---------------------------------------------------------------------------

@_SET
@given(st.lists(U256, min_size=1, max_size=5))
def test_wire_formats_roundtrip(vals):
    limbs = interop.ints_to_limbs(vals)
    assert (interop.from_ark_u32_limbs(interop.to_ark_u32_limbs(limbs))
            == limbs).all()
    assert (interop.from_h2c_bytes(interop.to_h2c_bytes(limbs)) == limbs).all()
    assert interop.limbs_to_ints(limbs) == vals