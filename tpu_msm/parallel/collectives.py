"""EC-sum collectives over a mesh axis.

`lax.psum` only sums ring elements lane-wise; the EC group operation is the
RCB complete addition, so the cross-chip reduction of per-chip partial
window sums needs a hand-built collective. Two shapes are provided:

* gather-tree (parallel.sharded._tree_reduce_last): all_gather the (W, 16, 1)
  partials (~6 KB/chip over ICI), then every chip folds the SAME fixed
  balanced tree — replicas are bit-identical by construction.

* ppermute binomial tree (this module): reduce-to-chip-0 via log2(D)
  `lax.ppermute` rounds, then a binomial broadcast back — the classic
  psum-shaped butterfly-free collective. Every chip ends up with chip 0's
  bytes, so replicas are again bit-identical, and the payload per hop is a
  single point set instead of the gathered D× array. Matters only when W·D
  grows (log-24 sharded configs); both are provided and tested.

The reference has no counterpart (single GPU; its "collective" is a condvar
over unified memory, src/metal/msm.rs:306-312) — this is the distributed
layer SURVEY.md §5.8 mandates.
"""

from __future__ import annotations

import jax
from jax import lax

from tpu_msm.ops import curve
from tpu_msm.ops.curve import ProjPoint


def _ceil_log2(x: int) -> int:
    return max(0, (x - 1).bit_length())


def ec_all_reduce(pt: ProjPoint, axis_name: str, axis_size: int) -> ProjPoint:
    """EC all-reduce of a per-chip ProjPoint along `axis_name`.

    pt arrays must be LIMBS-FIRST (leading axis = 16): the curve ops
    broadcast their limb constants against axis 0, so a (W, 16, 1)
    window-sum layout must be transposed before calling (enforced below —
    the silent-corruption shape (W=16) is indistinguishable, so the check
    is on the leading axis).

    Binomial-tree reduce to chip 0 (fixed association order — the same
    deterministic-tree requirement as sharded._tree_reduce_last) followed by
    a binomial broadcast; 2*ceil(log2(D)) ppermute hops riding ICI. Works
    for any axis size. Inside shard_map only.
    """
    from tpu_msm.models import bn254

    if pt.x.shape[0] != bn254.LIMBS:
        raise ValueError(
            f"ec_all_reduce needs limbs-first arrays (leading axis "
            f"{bn254.LIMBS}), got {pt.x.shape}; moveaxis the limb axis to 0")
    idx = lax.axis_index(axis_name)
    levels = _ceil_log2(axis_size)

    # Reduce: at round k senders are idx ≡ stride (mod 2*stride), each
    # sending to idx - stride; receivers fold the received point on top.
    for k in range(levels):
        stride = 1 << k
        perm = [(s, s - stride) for s in range(stride, axis_size, 2 * stride)]
        recv = ProjPoint(*(lax.ppermute(a, axis_name, perm) for a in pt))
        receives = (idx % (2 * stride) == 0) & (idx + stride < axis_size)
        pt = curve.select_point(receives, curve.proj_add(pt, recv), pt)

    # Broadcast chip 0's result: holders double each round (0 -> 0,4 -> ...).
    for k in reversed(range(levels)):
        stride = 1 << k
        perm = [(d - stride, d) for d in range(stride, axis_size, 2 * stride)]
        recv = ProjPoint(*(lax.ppermute(a, axis_name, perm) for a in pt))
        got = idx % (2 * stride) == stride
        pt = curve.select_point(got, recv, pt)
    return pt
