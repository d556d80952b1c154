"""MSM profiler CLI — parity with the reference's `gpu_profiler` binary
(src/bin/gpu_profiler.rs:17-172).

Usage (positional args mirror the reference's
`log_instance_size num_instances run_mode retries parallel_runs`):

    python -m tpu_msm.cli.profiler 20 5 tpu 10
    python -m tpu_msm.cli.profiler 16 3 check 1
    python -m tpu_msm.cli.profiler 16 2 best 2 4   # concurrency stress

`parallel_runs > 1` is the reference's concurrency-stress mode
(gpu_profiler.rs:57-63,102-132): each instance is split into that many
chunks, every chunk runs on its own thread after a random 0-50 ms delay, and
the EC sum of the chunk results is asserted equal to the single-threaded
result of the same mode. The reference added this because concurrent GPU
MSMs once corrupted results (hence its global mutex, msm.rs:250-255); here
it exercises the two pieces of shared state on the concurrent path — the
JAX jit/compile caches and the ctypes native engine.

Run modes (reference modes gpu | gpu_cpu | best_gpu | cpu | check,
gpu_profiler.rs:143-172, mapped to the TPU architecture):

    tpu      device MSM on the default platform        (≙ "gpu")
    sharded  mesh-sharded MSM over all visible devices (≙ "gpu_cpu" — the
             reference's heterogeneous split becomes multi-chip sharding)
    best     adaptive dispatcher msm_best              (≙ "best_gpu")
    cpu      native C++ host engine                    (≙ "cpu")
    check    run tpu AND cpu, assert identical results (≙ "check")
    stream   chunked streaming MSM (beyond-HBM sizes; ops/streaming.py)
    hybrid   device + native-CPU split (≙ "gpu_cpu"; tpu_msm/hybrid.py)

Per-stage timing goes through the standard `logging` module (reference uses
log::debug timers, msm.rs:193-215): set TPU_MSM_LOG=debug or -v.
"""

from __future__ import annotations

import argparse
import logging
import sys
import time

import numpy as np

log = logging.getLogger("tpu_msm.profiler")


def _run_tpu(inst, cfg):
    import jax
    import jax.numpy as jnp

    from tpu_msm import msm_device

    res = msm_device(
        jnp.asarray(inst.px), jnp.asarray(inst.py), jnp.asarray(inst.scalars), cfg
    )
    _sync(res)
    return res


def _sync(res):
    """True device sync: on the tunneled TPU platform block_until_ready
    returns at enqueue time (same caveat as bench.py), so timings must end
    with a (tiny) device->host fetch that cannot complete before the
    compute does."""
    np.asarray(res.x.ravel()[0:1])
    return res


def _run_sharded(inst, cfg):
    import jax

    from tpu_msm.ops.curve import AffinePoint
    from tpu_msm.parallel import sharded
    import jax.numpy as jnp

    res = sharded.msm_sharded(
        AffinePoint(jnp.asarray(inst.px), jnp.asarray(inst.py)),
        jnp.asarray(inst.scalars),
        cfg=cfg,
    )
    _sync(res)
    return res


def _run_cpu(inst):
    from tpu_msm.bindings import native

    return native.msm(inst.px, inst.py, inst.scalars)


def _run_best(inst):
    """The real adaptive dispatcher on the numpy production boundary
    (reference best_gpu mode runs msm_best, gpu_profiler.rs:143-172)."""
    from tpu_msm import msm_best

    return msm_best(inst.scalars, (inst.px, inst.py))


def _run_hybrid(inst, cfg):
    from tpu_msm.hybrid import msm_hybrid

    return msm_hybrid(inst.px, inst.py, inst.scalars, cfg)


def _run_stream(inst, cfg, chunk_log: int = 20):
    import jax

    from tpu_msm.ops import streaming

    res = streaming.msm_streamed(inst.px, inst.py, inst.scalars, cfg,
                                 chunk_log=chunk_log)
    _sync(res)
    return res


def _jac_to_affine(res):
    from tpu_msm.utils import interop

    [pt] = interop.proj_limbs_to_affine_points(
        np.asarray(res.x), np.asarray(res.y), np.asarray(res.z)
    )
    return pt


def _run_parallel(inst, cfg, mode: str, k: int):
    """Concurrency-stress run (reference: gpu_profiler.rs:102-132): split the
    instance into `k` chunks, run every chunk on its own thread after a
    random 0-50 ms delay, EC-sum the chunk results. Returns the combined
    affine point; raises if any thread fails. MSM is linear over (point,
    scalar) pairs, so the combined result must equal the single-threaded
    one — the assert lives in the caller's timing loop."""
    import random
    import threading

    from tpu_msm.utils import oracle, preprocess

    n = inst.px.shape[1]
    bounds = [round(i * n / k) for i in range(k + 1)]
    results = [None] * k
    errors = []

    def worker(i):
        try:
            time.sleep(random.uniform(0, 0.05))
            lo, hi = bounds[i], bounds[i + 1]
            sub = preprocess.MsmInstance(
                inst.px[:, lo:hi], inst.py[:, lo:hi], inst.scalars[:, lo:hi])
            if mode == "tpu":
                results[i] = _jac_to_affine(_run_tpu(sub, cfg))
            elif mode == "best":
                results[i] = _run_best(sub)
            else:
                results[i] = _run_cpu(sub)
        except Exception as e:  # pragma: no cover - surfaced via RuntimeError
            errors.append((i, repr(e)))

    threads = [threading.Thread(target=worker, args=(i,)) for i in range(k)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    if errors:
        raise RuntimeError(f"parallel chunk(s) failed: {errors}")
    acc = None
    for r in results:
        acc = oracle.ec_add(acc, r)
    return acc


def check_kernels() -> int:
    """Differential-check every Pallas EC kernel against the jnp curve ops on
    the current default device. Same checks as tests/test_pallas_kernels.py,
    but against the real compiled kernels (the CPU suite can only afford
    interpret mode, which is itself minutes-slow per kernel on small hosts).
    """
    import jax
    import jax.numpy as jnp

    from tpu_msm.models import bn254
    from tpu_msm.ops import curve, field
    from tpu_msm.ops import pallas_curve as pc
    from tpu_msm.ops.curve import AffinePoint, JacPoint, ProjPoint
    from tpu_msm.utils import interop, oracle

    lanes = 1024
    rng = np.random.RandomState(5150)

    def points(n):
        ks = [int(rng.randint(1, 1 << 16)) for _ in range(n)]
        pts = [oracle.ec_mul(oracle.GEN, k) for k in ks]
        for i in range(0, n, 97):  # sprinkle infinities
            pts[i] = None
        x, y = interop.affine_points_to_limbs(pts)
        return jnp.asarray(x), jnp.asarray(y)

    ax, ay = points(lanes)
    bx, by = points(lanes)
    # Edge lanes: equal points (doubling) and inverses (cancellation).
    bx = bx.at[:, 256:384].set(ax[:, 256:384])
    by = by.at[:, 256:384].set(ay[:, 256:384])
    bx = bx.at[:, 384:512].set(ax[:, 384:512])
    by = by.at[:, 384:512].set(field.neg_mod(ay[:, 384:512]))
    p_aff, q_aff = AffinePoint(ax, ay), AffinePoint(bx, by)
    pk = pc.pack_lanes

    failures = []

    def verify(name, got, want, eq):
        ok = bool(np.asarray(jax.jit(eq)(got, want)).all())
        log.info("kernel %-18s %s", name, "OK" if ok else "MISMATCH")
        if not ok:
            failures.append(name)

    p = curve.affine_to_proj(p_aff)
    q = curve.affine_to_proj(q_aff)
    res = pc.pmadd_packed(pk(p.x), pk(p.y), pk(p.z), pk(q_aff.x), pk(q_aff.y))
    verify("pmadd_packed", ProjPoint(*(pc.unpack_lanes(r) for r in res)),
           curve.proj_madd(p, q_aff), curve.proj_eq)

    res = pc.padd_packed(pk(p.x), pk(p.y), pk(p.z), pk(q.x), pk(q.y), pk(q.z))
    verify("padd_packed", ProjPoint(*(pc.unpack_lanes(r) for r in res)),
           curve.proj_add(p, q), curve.proj_eq)

    pj = curve.affine_to_jac(p_aff)
    qj = curve.affine_to_jac(q_aff)
    res = pc.madd_packed(pk(pj.x), pk(pj.y), pk(pj.z), pk(q_aff.x), pk(q_aff.y))
    verify("madd_packed", JacPoint(*(pc.unpack_lanes(r) for r in res)),
           curve.jac_add_affine(pj, q_aff), curve.jac_eq)

    res = pc.add_packed(pk(pj.x), pk(pj.y), pk(pj.z), pk(qj.x), pk(qj.y), pk(qj.z))
    verify("add_packed", JacPoint(*(pc.unpack_lanes(r) for r in res)),
           curve.jac_add(pj, qj), curve.jac_eq)

    steps = 3
    r = lanes // pc.LANE
    sx, sy = zip(*(points(lanes) for _ in range(steps)))
    gx = jnp.stack([a.reshape(bn254.LIMBS, r, pc.LANE) for a in sx], axis=1)
    gy = jnp.stack([a.reshape(bn254.LIMBS, r, pc.LANE) for a in sy], axis=1)
    ox, oy, oz = pc.scan_madd_packed(gx, gy)
    acc = curve.proj_infinity((lanes,))
    ok = True
    for k in range(steps):
        acc = curve.proj_madd(acc, AffinePoint(sx[k], sy[k]))
        got = ProjPoint(*(a[:, k].reshape(bn254.LIMBS, lanes)
                          for a in (ox, oy, oz)))
        ok &= bool(np.asarray(jax.jit(curve.proj_eq)(got, acc)).all())
    log.info("kernel %-18s %s", "scan_madd_packed", "OK" if ok else "MISMATCH")
    if not ok:
        failures.append("scan_madd_packed")

    from tpu_msm.ops.pippenger import pack_u16_rows

    pgx = jnp.stack([pack_u16_rows(a).reshape(8, r, pc.LANE) for a in sx],
                    axis=1)
    pgy = jnp.stack([pack_u16_rows(a).reshape(8, r, pc.LANE) for a in sy],
                    axis=1)
    ys48 = pc.scan_madd_packed_u16(pgx, pgy)
    acc = curve.proj_infinity((lanes,))
    ok = True
    for k in range(steps):
        acc = curve.proj_madd(acc, AffinePoint(sx[k], sy[k]))
        flat = ys48[:, k].reshape(48, lanes)
        got = ProjPoint(flat[0:16], flat[16:32], flat[32:48])
        ok &= bool(np.asarray(jax.jit(curve.proj_eq)(got, acc)).all())
    log.info("kernel %-18s %s", "scan_madd_packed_u16", "OK" if ok else "MISMATCH")
    if not ok:
        failures.append("scan_madd_packed_u16")

    # 15-bit-limb core: must be bit-identical to the u16 kernels (ops/f15.py).
    ys48_f15 = pc.scan_madd_packed_u16_f15(pgx, pgy)
    ok = bool((np.asarray(ys48) == np.asarray(ys48_f15)).all())
    log.info("kernel %-18s %s", "scan_madd_u16_f15", "OK" if ok else "MISMATCH")
    if not ok:
        failures.append("scan_madd_u16_f15")

    # MXU-REDC core (ops/fmxu.py): likewise bit-identical by construction.
    ys48_mxu = pc.scan_madd_packed_u16_mxu(pgx, pgy)
    ok = bool((np.asarray(ys48) == np.asarray(ys48_mxu)).all())
    log.info("kernel %-18s %s", "scan_madd_u16_mxu", "OK" if ok else "MISMATCH")
    if not ok:
        failures.append("scan_madd_u16_mxu")

    # Dual-stream f15 core (ec_rows.DualField): bit-identical by construction
    # (disjoint lane halves, same math). lanes=1024 -> r=8 would fall back to
    # the single-stream kernel, so check at 2048 lanes.
    wide = 2048
    wr = wide // pc.LANE
    wx, wy = zip(*(points(wide) for _ in range(steps)))
    wgx = jnp.stack([pack_u16_rows(a).reshape(8, wr, pc.LANE) for a in wx],
                    axis=1)
    wgy = jnp.stack([pack_u16_rows(a).reshape(8, wr, pc.LANE) for a in wy],
                    axis=1)
    ys48_w = pc.scan_madd_packed_u16_f15(wgx, wgy)
    ys48_d = pc.scan_madd_packed_u16_f15d(wgx, wgy)
    ok = bool((np.asarray(ys48_w) == np.asarray(ys48_d)).all())
    log.info("kernel %-18s %s", "scan_madd_u16_f15d", "OK" if ok else "MISMATCH")
    if not ok:
        failures.append("scan_madd_u16_f15d")

    res = pc.pmadd_packed(pk(p.x), pk(p.y), pk(p.z), pk(q_aff.x), pk(q_aff.y),
                          impl="f15")
    verify("pmadd_packed_f15", ProjPoint(*(pc.unpack_lanes(r) for r in res)),
           curve.proj_madd(p, q_aff), curve.proj_eq)
    res = pc.padd_packed(pk(p.x), pk(p.y), pk(p.z), pk(q.x), pk(q.y), pk(q.z),
                         impl="f15")
    verify("padd_packed_f15", ProjPoint(*(pc.unpack_lanes(r) for r in res)),
           curve.proj_add(p, q), curve.proj_eq)

    projs = [curve.proj_double(curve.affine_to_proj(AffinePoint(x, y)))
             for x, y in zip(sx, sy)]
    bx_, by_, bz_ = (jnp.stack([getattr(pt, f).reshape(bn254.LIMBS, r, pc.LANE)
                                for pt in projs], axis=1)
                     for f in ("x", "y", "z"))
    fx, fy, fz = pc.fold_add_packed(bx_, by_, bz_)
    acc = curve.proj_infinity((lanes,))
    for pt in projs:
        acc = curve.proj_add(acc, pt)
    verify("fold_add_packed",
           ProjPoint(*(a.reshape(bn254.LIMBS, lanes) for a in (fx, fy, fz))),
           acc, curve.proj_eq)
    fx, fy, fz = pc.fold_add_packed(bx_, by_, bz_, impl="f15")
    verify("fold_add_f15",
           ProjPoint(*(a.reshape(bn254.LIMBS, lanes) for a in (fx, fy, fz))),
           acc, curve.proj_eq)

    # MXU histogram segment starts (ops/hist.py): fused one-hot + dot kernel
    # must match a numpy cumulative histogram exactly.
    from tpu_msm.ops import hist

    m = 1 << 15
    dig = rng.randint(0, m + 2, size=hist.CHUNK * 8).astype(np.uint32)
    want = np.searchsorted(np.sort(dig), np.arange(1, m + 1), side="left")
    got = np.asarray(hist.segment_starts_hist_pallas(jnp.asarray(dig), m))
    ok = bool((got == want).all())
    log.info("kernel %-18s %s", "digit_hist", "OK" if ok else "MISMATCH")
    if not ok:
        failures.append("digit_hist")

    if failures:
        log.error("kernel check FAILED: %s", ", ".join(failures))
        return 1
    log.info("all Pallas kernels match the jnp reference ✓")
    return 0


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("log_instance_size", type=int, nargs="?")
    ap.add_argument("num_instances", type=int, nargs="?", default=1)
    ap.add_argument("run_mode", nargs="?", default="tpu",
                    choices=["tpu", "sharded", "best", "cpu", "check", "stream", "hybrid"])
    ap.add_argument("retries", type=int, nargs="?", default=1)
    ap.add_argument("parallel_runs", type=int, nargs="?", default=1,
                    help="concurrency stress: split each instance into this "
                         "many chunks run on concurrent threads with random "
                         "0-50 ms start delays; asserts the EC sum matches "
                         "the single-threaded result "
                         "(reference gpu_profiler.rs:57-63,102-132)")
    ap.add_argument("-v", "--verbose", action="store_true")
    ap.add_argument("--check-kernels", action="store_true",
                    help="differential-check the Pallas kernels on this "
                         "device and exit")
    args = ap.parse_args(argv)

    if args.check_kernels:
        logging.basicConfig(
            level=logging.DEBUG if args.verbose else logging.INFO,
            format="%(asctime)s %(name)s %(levelname)s %(message)s",
        )
        return check_kernels()
    if args.log_instance_size is None:
        ap.error("log_instance_size is required unless --check-kernels")

    logging.basicConfig(
        level=logging.DEBUG if args.verbose else logging.INFO,
        format="%(asctime)s %(name)s %(levelname)s %(message)s",
    )

    from tpu_msm.utils import preprocess
    from tpu_msm.utils.config import enable_persistent_cache, select_config

    enable_persistent_cache()

    n = 1 << args.log_instance_size
    cfg = select_config(n)
    log.info("generating/loading %d instance(s) of size 2^%d",
             args.num_instances, args.log_instance_size)
    instances = preprocess.get_or_create_msm_instances(
        args.log_instance_size, args.num_instances
    )

    # Device run modes: place the instance arrays in HBM ONCE, before the
    # timing loop (5 instances at 2^20 are < 1 GB of a 16 GB v5e). The
    # reference's unified-memory buffers are on-device by construction
    # (msm.rs:250-312); re-feeding host arrays per run times the tunnel's
    # host->device link instead of the chip (measured 9.8 s/run vs 0.57 s
    # compute at 2^20). jnp.asarray on an already-placed array is a no-op.
    if args.run_mode in ("tpu", "sharded", "stream"):
        import jax.numpy as jnp

        instances = [
            preprocess.MsmInstance(jnp.asarray(i.px), jnp.asarray(i.py),
                                   jnp.asarray(i.scalars))
            for i in instances
        ]

    expected = None
    if args.parallel_runs > 1:
        if args.run_mode not in ("tpu", "best", "cpu"):
            ap.error("parallel_runs > 1 supports run modes tpu | best | cpu")
        # Per-instance single-threaded reference results. For device modes
        # the native engine is the reference (running the full-size device
        # graph would add a fresh server-side compile this mode never uses);
        # chunk-shaped graphs are warmed below, excluded from timing.
        log.info("parallel_runs=%d: computing single-threaded references",
                 args.parallel_runs)
        expected = [_run_cpu(inst) if args.run_mode != "best"
                    else _run_best(inst) for inst in instances]
        if args.run_mode == "tpu":
            n0 = instances[0].px.shape[1]
            b = [round(i * n0 / args.parallel_runs)
                 for i in range(args.parallel_runs + 1)]
            for lo, hi in {(b[i], b[i + 1]) for i in range(args.parallel_runs)}:
                sub = preprocess.MsmInstance(
                    instances[0].px[:, lo:hi], instances[0].py[:, lo:hi],
                    instances[0].scalars[:, lo:hi])
                _run_tpu(sub, cfg)  # warm each distinct chunk shape
    # Warm-up compile (excluded from timing, like criterion's warmup).
    elif args.run_mode in ("tpu", "check"):
        _run_tpu(instances[0], cfg)
    elif args.run_mode == "best":
        _run_best(instances[0])
    elif args.run_mode == "sharded":
        _run_sharded(instances[0], cfg)
    elif args.run_mode == "stream":
        _run_stream(instances[0], cfg)
    elif args.run_mode == "hybrid":
        _run_hybrid(instances[0], cfg)

    total = 0.0
    runs = 0
    for retry in range(args.retries):
        for i, inst in enumerate(instances):
            t0 = time.perf_counter()
            if args.parallel_runs > 1:
                got = _run_parallel(inst, cfg, args.run_mode,
                                    args.parallel_runs)
                if got != expected[i]:
                    log.error("CONCURRENCY MISMATCH at instance %d: "
                              "parallel=%s single=%s", i, got, expected[i])
                    return 1
            elif args.run_mode == "tpu":
                _run_tpu(inst, cfg)
            elif args.run_mode == "sharded":
                _run_sharded(inst, cfg)
            elif args.run_mode == "best":
                _run_best(inst)
            elif args.run_mode == "cpu":
                _run_cpu(inst)
            elif args.run_mode == "stream":
                _run_stream(inst, cfg)
            elif args.run_mode == "hybrid":
                _run_hybrid(inst, cfg)
            elif args.run_mode == "check":
                got = _jac_to_affine(_run_tpu(inst, cfg))
                want = _run_cpu(inst)
                if got != want:
                    log.error("MISMATCH at instance %d: tpu=%s cpu=%s", i, got, want)
                    return 1
                log.info("instance %d: tpu == cpu ✓", i)
            dt = time.perf_counter() - t0
            total += dt
            runs += 1
            log.debug("retry %d instance %d: %.1f ms", retry, i, dt * 1e3)

    if args.parallel_runs > 1:
        log.info("parallel stress: %d runs x %d concurrent chunks, all "
                 "results == single-threaded ✓", runs, args.parallel_runs)
    log.info("Total Execution Time: %.1f ms", total * 1e3)
    log.info("Average Execution Time: %.1f ms (%d runs, %.2f Mpoints/s)",
             total / runs * 1e3, runs, n * runs / total / 1e6)
    return 0


if __name__ == "__main__":
    sys.exit(main())
