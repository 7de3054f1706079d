/* Minimal C host-model demo, mirroring `c_wrapper/pprts.c`:
 * init -> set optical properties -> solve -> print mean fluxes. */

#include "tenstream_tpu.h"
#include <stdio.h>
#include <stdlib.h>

int main(void) {
  const int nz = 8, nx = 8, ny = 8;
  float dz[8];
  for (int k = 0; k < nz; ++k) dz[k] = 100.0f;

  if (tenstream_tpu_init(nz, nx, ny, 100.0, 100.0, dz, 180.0, 40.0, "2str"))
    return 1;

  int ncell = nz * nx * ny;
  int nlev = (nz + 1) * nx * ny;
  float *kabs = calloc(ncell, sizeof(float));
  float *ksca = calloc(ncell, sizeof(float));
  float *g = calloc(ncell, sizeof(float));
  for (int i = 0; i < ncell; ++i) {
    kabs[i] = 1e-4f;
    ksca[i] = 1e-3f;
    g[i] = 0.5f;
  }
  if (tenstream_tpu_set_optical_properties(0.2, kabs, ksca, g, NULL)) return 2;
  if (tenstream_tpu_solve(0, 1, 1364.0)) return 3;

  float *edir = calloc(nlev, sizeof(float));
  float *edn = calloc(nlev, sizeof(float));
  float *eup = calloc(nlev, sizeof(float));
  float *abso = calloc(ncell, sizeof(float));
  if (tenstream_tpu_get_result(edir, edn, eup, abso)) return 4;

  double m_toa = 0, m_sfc = 0, m_up = 0;
  for (int i = 0; i < nx * ny; ++i) {
    m_toa += edir[i];
    m_sfc += edir[nz * nx * ny + i];
    m_up += eup[i];
  }
  printf("edir TOA %.2f sfc %.2f, eup TOA %.2f W/m2\n", m_toa / (nx * ny),
         m_sfc / (nx * ny), m_up / (nx * ny));

  tenstream_tpu_destroy(1);
  free(kabs); free(ksca); free(g);
  free(edir); free(edn); free(eup); free(abso);
  return 0;
}
