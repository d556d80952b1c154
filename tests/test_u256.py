"""Limb-arithmetic unit tests vs Python big ints.

Mirrors the reference's shader-op unit tests
(src/metal/tests/test_unsigned_integer.h.metal driven by
src/metal/tests/test_bn254.rs:99-161): add/sub/mul/shl/shr differentially
tested against an independent big-int implementation, on randomized and
directed inputs.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from tpu_msm.models import bn254
from tpu_msm.ops import u256
from tpu_msm.utils import interop

# Everything here executes XLA graphs (see conftest tier policy).
pytestmark = pytest.mark.device

N = 64


def _rand_ints(rng, n=N, bits=256):
    out = []
    for _ in range(n):
        out.append(int.from_bytes(rng.bytes(bits // 8), "little"))
    return out


DIRECTED = [
    0,
    1,
    2**16 - 1,
    2**16,
    2**255,
    2**256 - 1,
    bn254.P,
    bn254.P - 1,
    bn254.FR,
    (1 << 14) + 1,  # the reference's "breaking scalar" regression value
    #   (src/metal/msm/prepare_buckets_indices.rs:132-135)
]


@pytest.fixture(scope="module")
def pairs(rng):
    xs = _rand_ints(rng) + DIRECTED
    ys = DIRECTED + _rand_ints(rng)
    a = jnp.asarray(interop.ints_to_limbs(xs))
    b = jnp.asarray(interop.ints_to_limbs(ys))
    return xs, ys, a, b


def test_add(pairs):
    xs, ys, a, b = pairs
    s, c = u256.add(a, b)
    got = interop.limbs_to_ints(np.asarray(s))
    for i, (x, y) in enumerate(zip(xs, ys)):
        assert got[i] + (int(c[i]) << 256) == x + y


def test_sub(pairs):
    xs, ys, a, b = pairs
    d, bor = u256.sub(a, b)
    got = interop.limbs_to_ints(np.asarray(d))
    for i, (x, y) in enumerate(zip(xs, ys)):
        assert got[i] == (x - y) % 2**256
        assert int(bor[i]) == (1 if x < y else 0)


def test_mul_full(pairs):
    xs, ys, a, b = pairs
    m = u256.mul_full(a, b)
    got = interop.limbs_to_ints(np.asarray(m[:16]))
    got_hi = interop.limbs_to_ints(np.asarray(m[16:]))
    for i, (x, y) in enumerate(zip(xs, ys)):
        assert got[i] + (got_hi[i] << 256) == x * y


def test_mul_lo(pairs):
    xs, ys, a, b = pairs
    m = u256.mul_lo(a, b)
    got = interop.limbs_to_ints(np.asarray(m))
    for i, (x, y) in enumerate(zip(xs, ys)):
        assert got[i] == (x * y) % 2**256


@pytest.mark.parametrize("k", [0, 1, 7, 15, 16, 17, 31, 32, 100, 255])
def test_shifts(pairs, k):
    xs, _, a, _ = pairs
    sl = interop.limbs_to_ints(np.asarray(u256.shl(a, k)))
    sr = interop.limbs_to_ints(np.asarray(u256.shr(a, k)))
    for i, x in enumerate(xs):
        assert sl[i] == (x << k) % 2**256
        assert sr[i] == x >> k


def test_compare_and_zero(pairs):
    xs, ys, a, b = pairs
    ge = np.asarray(u256.geq(a, b))
    eq = np.asarray(u256.eq(a, b))
    for i, (x, y) in enumerate(zip(xs, ys)):
        assert bool(ge[i]) == (x >= y)
        assert bool(eq[i]) == (x == y)
    assert bool(u256.is_zero(jnp.zeros((16, 3), jnp.uint32)).all())


def test_extract_bits(pairs):
    xs, _, a, _ = pairs
    for start, width in [(0, 16), (16, 16), (240, 16), (4, 8), (13, 15), (250, 6)]:
        got = np.asarray(u256.extract_bits(a, start, width))
        for i, x in enumerate(xs):
            assert int(got[i]) == (x >> start) & ((1 << width) - 1)


def test_test_bit(pairs):
    xs, _, a, _ = pairs
    for k in [0, 1, 15, 16, 130, 255]:
        got = np.asarray(u256.test_bit(a, k))
        for i, x in enumerate(xs):
            assert int(got[i]) == (x >> k) & 1
