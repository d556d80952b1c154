"""MXU-histogram segment starts (ops/hist.py) vs the numpy oracle, plus the
payload-vs-rank sort-layout equivalence (pippenger._sorted_scan_inputs).

The histogram replaces the searchsorted stage (r4's #1 measured cost; the
reference's per-threadgroup binary search,
/root/reference/src/metal/shader/msm.h.metal:119-131). Exactness argument:
one-hot entries are 0/1 (exact in bfloat16), per-chunk partials are < chunk
size so f32 MXU accumulation is exact, and the running total is int32.
These tests execute only tiny matmul/sort graphs — no EC math — so they
stay in the default (host) tier.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from tpu_msm.ops import hist


def _oracle_starts(digits, m):
    return np.searchsorted(np.sort(digits), np.arange(1, m + 1), side="left")


@pytest.mark.parametrize("m,n", [
    (1 << 15, 4096),     # signed c=16 bucket count
    (255, 2048),         # unsigned c=8
    (127, 100),          # n not CHUNK-aligned: jnp path only
    (1 << 15, hist.CHUNK * 3),
])
def test_hist_starts_match_oracle(rng, m, n):
    digits = rng.randint(0, m + 2, size=n).astype(np.uint32)  # incl sentinel
    ref = _oracle_starts(digits, m)
    got = np.asarray(hist.segment_starts_hist(jnp.asarray(digits), m))
    assert (got == ref).all()
    if n % hist.CHUNK == 0:
        for fn in (hist.segment_starts_hist_pallas,
                   hist.segment_starts_hist_pallas2):
            got_p = np.asarray(fn(jnp.asarray(digits), m, interpret=True))
            assert (got_p == ref).all()


@pytest.mark.parametrize("fill", [0, "sentinel", "max_digit"])
def test_hist_starts_degenerate(fill):
    """All-equal digit arrays: every bucket boundary collapses to 0 or n."""
    m, n = 1 << 15, hist.CHUNK
    val = {"sentinel": m + 1, "max_digit": m}.get(fill, 0)
    digits = np.full(n, val, np.uint32)
    ref = _oracle_starts(digits, m)
    for f in (hist.segment_starts_hist,
              lambda d, mm: hist.segment_starts_hist_pallas(
                  d, mm, interpret=True),
              lambda d, mm: hist.segment_starts_hist_pallas2(
                  d, mm, interpret=True)):
        assert (np.asarray(f(jnp.asarray(digits), m)) == ref).all()


@pytest.mark.parametrize("lanes,steps", [(128, 4), (256, 2)])
def test_sorted_scan_inputs_rank_matches_payload(rng, lanes, steps):
    """The 2-operand rank sort + row gather must produce bit-identical scan
    inputs to the 17-operand payload sort (both are stable on the same key,
    so the permutation is identical). Pure u32 data — no EC graphs."""
    from tpu_msm.ops import pippenger

    n_pad = lanes * steps
    digits = jnp.asarray(
        rng.randint(0, 1 << 16, size=n_pad).astype(np.uint32))
    ppx = jnp.asarray(rng.randint(0, 1 << 32, size=(8, n_pad), dtype=np.uint64)
                      .astype(np.uint32))
    ppy = jnp.asarray(rng.randint(0, 1 << 32, size=(8, n_pad), dtype=np.uint64)
                      .astype(np.uint32))
    base = pippenger._sorted_scan_inputs(digits, ppx, ppy, lanes, steps,
                                         "payload")
    alt = pippenger._sorted_scan_inputs(digits, ppx, ppy, lanes, steps,
                                        "rank")
    for a, b in zip(base, alt):
        assert (np.asarray(a) == np.asarray(b)).all()


def test_scan_step_batch_validation():
    """ADVICE r4: scan_step_batch <= 0 must be rejected at config time, and
    the kernel wrapper must clamp rather than divide by zero."""
    from tpu_msm.utils.config import MsmConfig

    with pytest.raises(ValueError):
        MsmConfig(scan_step_batch=0)
    with pytest.raises(ValueError):
        MsmConfig(scan_step_batch=-2)
    with pytest.raises(ValueError):
        MsmConfig(segment_starts="nope")
    with pytest.raises(ValueError):
        MsmConfig(sort_impl="nope")
