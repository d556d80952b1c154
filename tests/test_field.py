"""Montgomery field-op tests vs Python big-int arithmetic.

Mirrors the reference's Fp shader tests (src/metal/tests/test_bn254.rs:237-296:
fp_bn254_{add,sub,mul,neg,pow} differentially vs arkworks).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from tpu_msm.models import bn254
from tpu_msm.ops import field
from tpu_msm.utils import interop

# Everything here executes XLA graphs (see conftest tier policy).
pytestmark = pytest.mark.device

P = bn254.P
R = bn254.R
N = 48

DIRECTED = [0, 1, 2, P - 1, P - 2, (P - 1) // 2, R % P, (P + 1) // 2]


@pytest.fixture(scope="module")
def elems(rng):
    xs = [int.from_bytes(rng.bytes(32), "little") % P for _ in range(N)] + DIRECTED
    ys = DIRECTED + [int.from_bytes(rng.bytes(32), "little") % P for _ in range(N)]
    am = jnp.asarray(interop.fp_ints_to_mont_limbs(xs))
    bm = jnp.asarray(interop.fp_ints_to_mont_limbs(ys))
    return xs, ys, am, bm


def _check(mont_arr, expect_fn, xs, ys):
    got = interop.mont_limbs_to_fp_ints(np.asarray(mont_arr))
    for i, (x, y) in enumerate(zip(xs, ys)):
        assert got[i] == expect_fn(x, y), f"elem {i}"


def test_mont_round_trip(elems):
    xs, _, am, _ = elems
    back = interop.limbs_to_ints(np.asarray(field.from_mont(am)))
    assert back == xs
    again = field.to_mont(jnp.asarray(interop.ints_to_limbs(xs)))
    assert interop.limbs_to_ints(np.asarray(again)) == [x * R % P for x in xs]


def test_add_sub_neg(elems):
    xs, ys, am, bm = elems
    _check(field.add_mod(am, bm), lambda x, y: (x + y) % P, xs, ys)
    _check(field.sub_mod(am, bm), lambda x, y: (x - y) % P, xs, ys)
    _check(field.neg_mod(am), lambda x, y: (-x) % P, xs, ys)
    _check(field.double_mod(am), lambda x, y: 2 * x % P, xs, ys)


def test_mul_sqr(elems):
    xs, ys, am, bm = elems
    _check(field.mont_mul(am, bm), lambda x, y: x * y % P, xs, ys)
    _check(field.mont_sqr(am), lambda x, y: x * x % P, xs, ys)


def test_pow(elems):
    xs, _, am, _ = elems
    for e in [0, 1, 2, 3, 65537]:
        _check(field.pow_fixed(am, e), lambda x, y, e=e: pow(x, e, P), xs, xs)


def test_inv(elems):
    xs, _, am, _ = elems
    am4 = am[:, :6]
    got = interop.mont_limbs_to_fp_ints(np.asarray(field.inv_mont(am4)))
    for i in range(6):
        assert got[i] == (pow(xs[i], P - 2, P))


def test_batch_inv(elems):
    """Montgomery-trick batch inverse == Fermat inverse, zeros -> zero."""
    xs, _, am, _ = elems
    batch = jnp.concatenate([am[:, :7], field.zero((2,)), am[:, 7:9]], axis=1)
    vals = xs[:7] + [0, 0] + xs[7:9]
    got = interop.mont_limbs_to_fp_ints(np.asarray(field.batch_inv_mont(batch)))
    for i, x in enumerate(vals):
        assert got[i] == (pow(x, P - 2, P) if x else 0), f"elem {i}"
    # width-1 degenerate case
    one = interop.mont_limbs_to_fp_ints(
        np.asarray(field.batch_inv_mont(am[:, :1])))
    assert one[0] == pow(xs[0], P - 2, P)


def test_sqrt(elems):
    xs, _, am, _ = elems
    sq = field.mont_sqr(am[:, :6])
    root = field.sqrt_mont(sq)
    back = interop.mont_limbs_to_fp_ints(np.asarray(field.mont_sqr(root)))
    for i in range(6):
        assert back[i] == xs[i] * xs[i] % P


def test_select_eq_zero(elems):
    xs, ys, am, bm = elems
    cond = jnp.asarray(np.arange(am.shape[1]) % 2 == 0)
    sel = interop.mont_limbs_to_fp_ints(np.asarray(field.select(cond, am, bm)))
    for i, (x, y) in enumerate(zip(xs, ys)):
        assert sel[i] == (x if i % 2 == 0 else y)
    assert bool(field.is_zero(field.zero((3,))).all())
    assert not bool(field.is_zero(field.one_mont((3,))).any())
