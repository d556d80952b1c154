"""Thread-safety tests: concurrent msm_best / native-engine callers must all
get correct results.

Reference analogue: the `parallel_runs` concurrency-stress mode of
gpu_profiler (src/bin/gpu_profiler.rs:57-63,102-132) and the #[ignore]'d
`test_msm_gpu_parallel` (src/metal/msm.rs:526-529) — the reference needed a
global mutex (msm.rs:250-255) because concurrent GPU MSMs once corrupted
results. This framework's concurrent path has two pieces of shared state:
the JAX jit/compile caches (thread-safe by JAX's contract) and the ctypes
native engine (reentrant: no global mutable state in msm_cpu.cpp). These
tests pin that down instead of trusting it.
"""

import threading

import numpy as np
import pytest

import tpu_msm
from tpu_msm import msm_best
from tpu_msm.models import bn254
from tpu_msm.utils import interop, oracle

N_THREADS = 8


def _instances(rng, count, n):
    """`count` distinct small MSM instances + their oracle results."""
    out = []
    for _ in range(count):
        ks = [int(rng.randint(1, 1 << 22)) for _ in range(n)]
        pts = [oracle.ec_mul(oracle.GEN, k) for k in ks]
        scalars = [int.from_bytes(rng.bytes(32), "little") % bn254.FR
                   for _ in range(n)]
        px, py = interop.affine_points_to_limbs(pts)
        sl = interop.ints_to_limbs(scalars)
        out.append((px, py, sl, oracle.msm(scalars, pts)))
    return out


def _hammer(fn, args_list):
    """Run fn over args_list, one thread per element, all released at once.
    Returns results in order; re-raises the first thread failure."""
    results = [None] * len(args_list)
    errors = []
    gate = threading.Barrier(len(args_list))

    def worker(i):
        try:
            gate.wait()
            results[i] = fn(*args_list[i])
        except Exception as e:  # noqa: BLE001 - surfaced below
            errors.append(e)

    threads = [threading.Thread(target=worker, args=(i,))
               for i in range(len(args_list))]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    if errors:
        raise errors[0]
    return results


def _require_native():
    from tpu_msm.bindings import native

    if not native.available():
        pytest.skip("native engine unavailable (no toolchain)")


def test_native_engine_concurrent(rng):
    """N threads through the raw ctypes boundary simultaneously, distinct
    inputs: every result must match its own oracle."""
    _require_native()
    from tpu_msm.bindings import native

    insts = _instances(rng, N_THREADS, 64)
    got = _hammer(native.msm, [(px, py, sl) for px, py, sl, _ in insts])
    for res, (_, _, _, want) in zip(got, insts):
        assert res == want


def test_msm_best_concurrent_small(rng):
    """N concurrent msm_best callers below CPU_THRESHOLD (native-engine
    dispatch): the full production entry, zero filter and all."""
    _require_native()
    insts = _instances(rng, N_THREADS, 48)
    got = _hammer(msm_best, [(sl, (px, py)) for px, py, sl, _ in insts])
    for res, (_, _, _, want) in zip(got, insts):
        assert res == want


@pytest.mark.device
def test_msm_best_concurrent_device(rng):
    """Concurrent msm_best callers ABOVE the device threshold: shared jit
    cache + device execution under thread pressure. Fewer threads — each
    call is a device MSM."""
    old = tpu_msm.CPU_THRESHOLD
    tpu_msm.CPU_THRESHOLD = 16  # force the device path at a test-sized n
    try:
        insts = _instances(rng, 4, 96)
        got = _hammer(msm_best, [(sl, (px, py)) for px, py, sl, _ in insts])
        for res, (_, _, _, want) in zip(got, insts):
            assert res == want
    finally:
        tpu_msm.CPU_THRESHOLD = old
