/* Smoke driver for the C ABI embedder surface (role of the reference's
 * SwiftUI benchmark app consuming the uniffi bindings,
 * ios-metal-benchmarker/ContentView.swift:79-139 — a non-Python host
 * invoking the MSM through the exported boundary).
 *
 * Reads from argv: n, then n*32-byte scalars and n*64-byte points as hex on
 * stdin (two lines), calls tpu_msm_best, prints the 64-byte result as hex.
 * tests/test_embed.py drives it and checks against the Python oracle.
 */
#include <stdint.h>
#include <stdio.h>
#include <stdlib.h>
#include <string.h>

extern int tpu_msm_init(void);
extern int tpu_msm_best(const uint8_t* scalars, const uint8_t* points,
                        size_t n, uint8_t out[64]);
extern void tpu_msm_shutdown(void);

static int read_hex_line(uint8_t* buf, size_t nbytes) {
  for (size_t i = 0; i < nbytes; i++) {
    unsigned v;
    if (scanf("%2x", &v) != 1) return -1;
    buf[i] = (uint8_t)v;
  }
  return 0;
}

int main(int argc, char** argv) {
  if (argc != 2) {
    fprintf(stderr, "usage: %s <n>  (hex scalars then hex points on stdin)\n",
            argv[0]);
    return 2;
  }
  size_t n = (size_t)strtoul(argv[1], NULL, 10);
  uint8_t* scalars = malloc(n * 32);
  uint8_t* points = malloc(n * 64);
  uint8_t out[64];
  if (!scalars || !points) return 2;
  if (read_hex_line(scalars, n * 32) || read_hex_line(points, n * 64)) {
    fprintf(stderr, "bad hex input\n");
    return 2;
  }
  if (tpu_msm_init() != 0) {
    fprintf(stderr, "tpu_msm_init failed\n");
    return 3;
  }
  int rc = tpu_msm_best(scalars, points, n, out);
  if (rc != 0) {
    fprintf(stderr, "tpu_msm_best rc=%d\n", rc);
    return 4;
  }
  for (int i = 0; i < 64; i++) printf("%02x", out[i]);
  printf("\n");
  tpu_msm_shutdown();
  free(scalars);
  free(points);
  return 0;
}
