// Native CPU MSM engine for BN254 G1 — the host-side counterpart of the
// reference's CPU path (halo2curves::msm::msm_best, used by msm_best's
// below-threshold dispatch and by `gpu_with_cpu`, src/metal/msm.rs:366-444).
//
// Role in the TPU framework:
//   * the CPU half of the adaptive dispatcher (small inputs never pay a
//     device round-trip),
//   * the fast differential-check reference for `check` mode at sizes where
//     the pure-Python oracle is unusable (gpu_profiler.rs:143-172 parity).
//
// Algorithm: Pippenger bucket method, the same five conceptual stages as the
// reference pipeline (msm.rs:189-217), collapsed into a classic CPU loop:
// window digits -> bucket accumulation (Jacobian mixed adds) -> running-sum
// window reduction -> Horner fold. Field arithmetic is 4x64-bit CIOS
// Montgomery multiplication (the reference's 8x32 CIOS, fp_bn254.h.metal:
// 237-290, widened to the host's 64-bit multiplier).
//
// Exposed C ABI (consumed by tpu_msm/bindings/native.py via ctypes):
//   arrays are the framework's limb-major (16, n) uint32 layout —
//   value j's u16 limb i lives at a[i*n + j]; coordinates Montgomery form,
//   scalars standard form.

#include <cstdint>
#include <cstdlib>
#include <cstring>
#include <thread>
#include <vector>

#include "bn254_constants.h"

typedef unsigned __int128 u128;
typedef uint64_t u64;
typedef uint32_t u32;

namespace {

// ---------------------------------------------------------------------------
// Fp: 4x64 little-endian limbs, Montgomery form.
// ---------------------------------------------------------------------------

struct Fp {
  u64 v[4];
};

inline bool fp_is_zero(const Fp &a) {
  return (a.v[0] | a.v[1] | a.v[2] | a.v[3]) == 0;
}

inline bool fp_eq(const Fp &a, const Fp &b) {
  return a.v[0] == b.v[0] && a.v[1] == b.v[1] && a.v[2] == b.v[2] &&
         a.v[3] == b.v[3];
}

inline bool geq_p(const Fp &a) {
  for (int i = 3; i >= 0; --i) {
    if (a.v[i] > BN254_P[i]) return true;
    if (a.v[i] < BN254_P[i]) return false;
  }
  return true;  // equal
}

inline void sub_p(Fp &a) {
  u128 bor = 0;
  for (int i = 0; i < 4; ++i) {
    u128 d = (u128)a.v[i] - BN254_P[i] - bor;
    a.v[i] = (u64)d;
    bor = (d >> 64) & 1;
  }
}

inline Fp fp_add(const Fp &a, const Fp &b) {
  Fp r;
  u128 c = 0;
  for (int i = 0; i < 4; ++i) {
    c += (u128)a.v[i] + b.v[i];
    r.v[i] = (u64)c;
    c >>= 64;
  }
  // a + b < 2P < 2^255: no carry out of limb 3; one conditional subtract.
  if (geq_p(r)) sub_p(r);
  return r;
}

inline Fp fp_sub(const Fp &a, const Fp &b) {
  Fp r;
  u128 bor = 0;
  for (int i = 0; i < 4; ++i) {
    u128 d = (u128)a.v[i] - b.v[i] - bor;
    r.v[i] = (u64)d;
    bor = (d >> 64) & 1;
  }
  if (bor) {
    u128 c = 0;
    for (int i = 0; i < 4; ++i) {
      c += (u128)r.v[i] + BN254_P[i];
      r.v[i] = (u64)c;
      c >>= 64;
    }
  }
  return r;
}

inline Fp fp_neg(const Fp &a) {
  if (fp_is_zero(a)) return a;
  Fp r;
  u128 bor = 0;
  for (int i = 0; i < 4; ++i) {
    u128 d = (u128)BN254_P[i] - a.v[i] - bor;
    r.v[i] = (u64)d;
    bor = (d >> 64) & 1;
  }
  return r;
}

inline Fp fp_dbl(const Fp &a) { return fp_add(a, a); }

// CIOS Montgomery multiplication (64-bit analogue of fp_bn254.h.metal:237-290).
inline Fp fp_mul(const Fp &a, const Fp &b) {
  u64 t[5] = {0, 0, 0, 0, 0};
  for (int i = 0; i < 4; ++i) {
    // t += a[i] * b
    u128 c = 0;
    for (int j = 0; j < 4; ++j) {
      c += (u128)t[j] + (u128)a.v[i] * b.v[j];
      t[j] = (u64)c;
      c >>= 64;
    }
    u64 t4 = (u64)((u128)t[4] + c);
    // m = t[0] * (-P^-1) mod 2^64; t = (t + m*P) >> 64
    u64 m = t[0] * BN254_INV64;
    c = (u128)t[0] + (u128)m * BN254_P[0];
    c >>= 64;
    for (int j = 1; j < 4; ++j) {
      c += (u128)t[j] + (u128)m * BN254_P[j];
      t[j - 1] = (u64)c;
      c >>= 64;
    }
    c += t4;
    t[3] = (u64)c;
    t[4] = (u64)(c >> 64);
  }
  Fp r = {{t[0], t[1], t[2], t[3]}};
  if (t[4] || geq_p(r)) sub_p(r);
  return r;
}

inline Fp fp_sqr(const Fp &a) { return fp_mul(a, a); }

Fp fp_pow(const Fp &a, const u64 *e, int nlimbs) {
  Fp one = {{BN254_R[0], BN254_R[1], BN254_R[2], BN254_R[3]}};
  Fp acc = one;
  bool started = false;
  for (int i = nlimbs - 1; i >= 0; --i) {
    for (int b = 63; b >= 0; --b) {
      if (started) acc = fp_sqr(acc);
      if ((e[i] >> b) & 1) {
        if (started) acc = fp_mul(acc, a);
        else { acc = a; started = true; }
      }
    }
  }
  return started ? acc : one;
}

Fp fp_inv(const Fp &a) {
  u64 e[4];
  for (int i = 0; i < 4; ++i) e[i] = BN254_P[i];
  e[0] -= 2;  // P - 2 (P is odd, no borrow)
  return fp_pow(a, e, 4);
}

// ---------------------------------------------------------------------------
// G1 in Jacobian coordinates (Montgomery-form field elements).
// ---------------------------------------------------------------------------

struct Jac {
  Fp x, y, z;
};

struct Aff {
  Fp x, y;
  bool inf;
};

inline Jac jac_infinity() {
  Jac p;
  std::memcpy(p.x.v, BN254_R, sizeof p.x.v);
  std::memcpy(p.y.v, BN254_R, sizeof p.y.v);
  std::memset(p.z.v, 0, sizeof p.z.v);
  return p;
}

inline bool jac_is_inf(const Jac &p) { return fp_is_zero(p.z); }

// dbl-2009-l (reference: ec_point.h.metal:141-175).
Jac jac_dbl(const Jac &p) {
  if (jac_is_inf(p)) return p;
  Fp a = fp_sqr(p.x);
  Fp b = fp_sqr(p.y);
  Fp c = fp_sqr(b);
  Fp t = fp_sqr(fp_add(p.x, b));
  Fp d = fp_dbl(fp_sub(fp_sub(t, a), c));
  Fp e = fp_add(fp_dbl(a), a);
  Fp f = fp_sqr(e);
  Jac r;
  r.x = fp_sub(f, fp_dbl(d));
  r.y = fp_sub(fp_mul(e, fp_sub(d, r.x)), fp_dbl(fp_dbl(fp_dbl(c))));
  r.z = fp_dbl(fp_mul(p.y, p.z));
  return r;
}

// add-2007-bl with exceptional-case branches (CPU: branches are free;
// reference: ec_point.h.metal:13-69).
Jac jac_add(const Jac &p, const Jac &q) {
  if (jac_is_inf(p)) return q;
  if (jac_is_inf(q)) return p;
  Fp z1z1 = fp_sqr(p.z);
  Fp z2z2 = fp_sqr(q.z);
  Fp u1 = fp_mul(p.x, z2z2);
  Fp u2 = fp_mul(q.x, z1z1);
  Fp s1 = fp_mul(p.y, fp_mul(q.z, z2z2));
  Fp s2 = fp_mul(q.y, fp_mul(p.z, z1z1));
  Fp h = fp_sub(u2, u1);
  Fp rr = fp_sub(s2, s1);
  if (fp_is_zero(h)) {
    if (fp_is_zero(rr)) return jac_dbl(p);
    return jac_infinity();
  }
  Fp i = fp_sqr(fp_dbl(h));
  Fp j = fp_mul(h, i);
  Fp r2 = fp_dbl(rr);
  Fp v = fp_mul(u1, i);
  Jac out;
  out.x = fp_sub(fp_sub(fp_sqr(r2), j), fp_dbl(v));
  out.y = fp_sub(fp_mul(r2, fp_sub(v, out.x)), fp_dbl(fp_mul(s1, j)));
  Fp zz = fp_sub(fp_sub(fp_sqr(fp_add(p.z, q.z)), z1z1), z2z2);
  out.z = fp_mul(zz, h);
  return out;
}

// madd-2007-bl mixed addition (the bucket-accumulation hot loop).
Jac jac_add_affine(const Jac &p, const Aff &q) {
  if (q.inf) return p;
  if (jac_is_inf(p)) {
    Jac r;
    r.x = q.x;
    r.y = q.y;
    std::memcpy(r.z.v, BN254_R, sizeof r.z.v);
    return r;
  }
  Fp z1z1 = fp_sqr(p.z);
  Fp u2 = fp_mul(q.x, z1z1);
  Fp s2 = fp_mul(q.y, fp_mul(p.z, z1z1));
  Fp h = fp_sub(u2, p.x);
  Fp rr = fp_sub(s2, p.y);
  if (fp_is_zero(h)) {
    if (fp_is_zero(rr)) return jac_dbl(p);
    return jac_infinity();
  }
  Fp hh = fp_sqr(h);
  Fp i = fp_dbl(fp_dbl(hh));
  Fp j = fp_mul(h, i);
  Fp r2 = fp_dbl(rr);
  Fp v = fp_mul(p.x, i);
  Jac out;
  out.x = fp_sub(fp_sub(fp_sqr(r2), j), fp_dbl(v));
  out.y = fp_sub(fp_mul(r2, fp_sub(v, out.x)), fp_dbl(fp_mul(p.y, j)));
  out.z = fp_sub(fp_sub(fp_sqr(fp_add(p.z, h)), z1z1), hh);
  return out;
}

// ---------------------------------------------------------------------------
// Limb-format bridge: framework (16, n) u16-in-u32 <-> 4x64.
// ---------------------------------------------------------------------------

inline Fp load_fp(const u32 *a, size_t n, size_t j) {
  Fp r;
  for (int k = 0; k < 4; ++k) {
    u64 v = 0;
    for (int s = 3; s >= 0; --s) v = (v << 16) | (u64)(u32)a[(4 * k + s) * n + j];
    r.v[k] = v;
  }
  return r;
}

inline void store_fp(u32 *out, const Fp &a, int offset) {
  for (int k = 0; k < 4; ++k)
    for (int s = 0; s < 4; ++s)
      out[offset + 4 * k + s] = (u32)((a.v[k] >> (16 * s)) & 0xFFFF);
}

// ---------------------------------------------------------------------------
// Pippenger (reference pipeline collapsed to the classic CPU formulation).
// ---------------------------------------------------------------------------

int pick_window(size_t n) {
  // ~log2(n) - 3, clamped; same spirit as the reference's heuristic
  // (msm.rs:135-141) without the GPU's shared-memory constraints.
  int c = 3;
  while (((size_t)1 << (c + 3)) < n && c < 16) ++c;
  return c;
}

// Thread count: TPU_MSM_CPU_THREADS override, else hardware concurrency.
// The role model (halo2curves::msm::msm_best) is rayon-parallel; here the
// natural parallel axis is windows — each window owns its bucket array, so
// per-window sums need no synchronization at all (unlike the reference's
// boundary-merge machinery, msm.h.metal:229-297).
unsigned thread_count(size_t work_items) {
  unsigned n = std::thread::hardware_concurrency();
  if (const char *env = std::getenv("TPU_MSM_CPU_THREADS")) {
    long v = std::atol(env);
    if (v > 0) n = (unsigned)v;
  }
  if (n < 1) n = 1;
  if ((size_t)n > work_items) n = (unsigned)work_items;
  return n;
}

// Static round-robin parallel for: fn(item_index) for 0 <= i < n_items.
template <typename F>
void parallel_for(size_t n_items, F fn) {
  unsigned nt = thread_count(n_items);
  if (nt <= 1) {
    for (size_t i = 0; i < n_items; ++i) fn(i);
    return;
  }
  std::vector<std::thread> threads;
  threads.reserve(nt);
  for (unsigned t = 0; t < nt; ++t)
    threads.emplace_back([=] {
      for (size_t i = t; i < n_items; i += nt) fn(i);
    });
  for (auto &th : threads) th.join();
}

}  // namespace

extern "C" {

// MSM over the framework's (16, n) limb-major arrays. out_xyz: 48 u32
// (Jacobian x,y,z, 16 u16-in-u32 limbs each, Montgomery form).
void tpu_msm_cpu_msm(const u32 *px, const u32 *py, const u32 *scalars,
                     size_t n, u32 *out_xyz) {
  int c = pick_window(n);
  int num_windows = (254 + c - 1) / c;
  size_t nbuckets = ((size_t)1 << c) - 1;

  std::vector<Aff> pts(n);
  for (size_t j = 0; j < n; ++j) {
    pts[j].x = load_fp(px, n, j);
    pts[j].y = load_fp(py, n, j);
    pts[j].inf = fp_is_zero(pts[j].x) && fp_is_zero(pts[j].y);
  }
  // Scalars: 16 u16 limbs -> 4 u64 limbs, standard form.
  std::vector<u64> sc(4 * n);
  for (size_t j = 0; j < n; ++j) {
    Fp s = load_fp(scalars, n, j);
    for (int k = 0; k < 4; ++k) sc[4 * j + k] = s.v[k];
  }

  // Per-window sums in parallel (each window owns its buckets; no shared
  // state), then a sequential Horner fold — the same split as the device
  // pipeline (window_sums / horner_fold in tpu_msm/ops/pippenger.py).
  std::vector<Jac> wsums(num_windows);
  parallel_for((size_t)num_windows, [&](size_t wi) {
    int w = (int)wi;
    std::vector<Jac> buckets(nbuckets, jac_infinity());
    int start = w * c;
    for (size_t j = 0; j < n; ++j) {
      // digit = bits [start, start+c) of scalar j
      int limb = start >> 6, bit = start & 63;
      u64 frag = sc[4 * j + limb] >> bit;
      if (bit + c > 64 && limb + 1 < 4) frag |= sc[4 * j + limb + 1] << (64 - bit);
      u64 digit = frag & (((u64)1 << c) - 1);
      if (digit) buckets[digit - 1] = jac_add_affine(buckets[digit - 1], pts[j]);
    }
    // running-sum reduction: sum_b (b+1) * buckets[b]
    Jac running = jac_infinity(), wsum = jac_infinity();
    for (size_t b = nbuckets; b-- > 0;) {
      running = jac_add(running, buckets[b]);
      wsum = jac_add(wsum, running);
    }
    wsums[wi] = wsum;
  });
  Jac acc = wsums[num_windows - 1];
  for (int w = num_windows - 2; w >= 0; --w) {
    for (int d = 0; d < c; ++d) acc = jac_dbl(acc);
    acc = jac_add(acc, wsums[w]);
  }
  store_fp(out_xyz, acc.x, 0);
  store_fp(out_xyz, acc.y, 16);
  store_fp(out_xyz, acc.z, 32);
}

// Normalize one Jacobian point (48 u32 limbs) to affine (32 u32 limbs);
// infinity -> all-zero. Both Montgomery form.
void tpu_msm_cpu_to_affine(const u32 *xyz, u32 *out_xy) {
  Fp x, y, z;
  u32 tmp[16];
  auto load1 = [&](const u32 *src) {
    Fp r;
    for (int k = 0; k < 4; ++k) {
      u64 v = 0;
      for (int s = 3; s >= 0; --s) v = (v << 16) | (u64)src[4 * k + s];
      r.v[k] = v;
    }
    return r;
  };
  (void)tmp;
  x = load1(xyz);
  y = load1(xyz + 16);
  z = load1(xyz + 32);
  if (fp_is_zero(z)) {
    std::memset(out_xy, 0, 32 * sizeof(u32));
    return;
  }
  Fp zi = fp_inv(z);
  Fp zi2 = fp_sqr(zi);
  Fp ax = fp_mul(x, zi2);
  Fp ay = fp_mul(y, fp_mul(zi, zi2));
  store_fp(out_xy, ax, 0);
  store_fp(out_xy, ay, 16);
}

// Batch double-and-add scalar mul: out[j] = scalars[j] * (base_x, base_y),
// affine out. Used by fixtures/tests for fast point generation.
void tpu_msm_cpu_ec_mul_batch(const u32 *base_xy, const u32 *scalars, size_t n,
                              u32 *out_px, u32 *out_py) {
  Aff base;
  {
    Fp bx, by;
    for (int k = 0; k < 4; ++k) {
      u64 vx = 0, vy = 0;
      for (int s = 3; s >= 0; --s) {
        vx = (vx << 16) | (u64)base_xy[4 * k + s];
        vy = (vy << 16) | (u64)base_xy[16 + 4 * k + s];
      }
      bx.v[k] = vx;
      by.v[k] = vy;
    }
    base.x = bx;
    base.y = by;
    base.inf = fp_is_zero(bx) && fp_is_zero(by);
  }
  parallel_for(n, [&](size_t j) {
    Fp s = load_fp(scalars, n, j);
    Jac acc = jac_infinity();
    for (int i = 3; i >= 0; --i)
      for (int b = 63; b >= 0; --b) {
        acc = jac_dbl(acc);
        if ((s.v[i] >> b) & 1) acc = jac_add_affine(acc, base);
      }
    if (jac_is_inf(acc)) {
      for (int k = 0; k < 16; ++k) {
        out_px[k * n + j] = 0;
        out_py[k * n + j] = 0;
      }
      return;
    }
    Fp zi = fp_inv(acc.z);
    Fp zi2 = fp_sqr(zi);
    Fp ax = fp_mul(acc.x, zi2);
    Fp ay = fp_mul(acc.y, fp_mul(zi, zi2));
    for (int k = 0; k < 4; ++k)
      for (int s2 = 0; s2 < 4; ++s2) {
        out_px[(4 * k + s2) * n + j] = (u32)((ax.v[k] >> (16 * s2)) & 0xFFFF);
        out_py[(4 * k + s2) * n + j] = (u32)((ay.v[k] >> (16 * s2)) & 0xFFFF);
      }
  });
}

int tpu_msm_cpu_abi_version() { return 1; }

}  // extern "C"
