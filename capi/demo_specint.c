/* Full-spectrum C host demo, mirroring `c_wrapper/pprts_rrtmg.c`:
 * hand the solver a host-model slab (plev/tlev + a liquid cloud) and
 * get broadband LW+SW fluxes / heating on the merged grid back. */

#include "tenstream_tpu.h"
#include <stdio.h>
#include <stdlib.h>

int main(void) {
  const int nz = 10, nx = 6, ny = 6;
  int nlev = (nz + 1) * nx * ny;
  int nlay = nz * nx * ny;
  float *plev = malloc(nlev * sizeof(float));
  float *tlev = malloc(nlev * sizeof(float));
  float *lwc = calloc(nlay, sizeof(float));
  float *reliq = malloc(nlay * sizeof(float));

  /* ~100 m layers near the surface: p from a crude hydrostatic profile,
   * TOA-first ordering, Pa */
  for (int k = 0; k <= nz; ++k) {
    float z = (float)(nz - k) * 100.0f;
    float p = 101325.0f * (1.0f - 2.25577e-5f * z);
    float t = 288.15f - 0.0065f * z;
    for (int i = 0; i < nx * ny; ++i) {
      plev[k * nx * ny + i] = p;
      tlev[k * nx * ny + i] = t;
    }
  }
  for (int i = 0; i < nlay; ++i) reliq[i] = 10.0f;
  /* a cloud block at layers 4..5 in the middle of the domain [g/kg] */
  for (int k = 4; k <= 5; ++k)
    for (int i = 2; i < 4; ++i)
      for (int j = 2; j < 4; ++j)
        lwc[(k * nx + i) * ny + j] = 0.3f;

  int nz_merged = 0;
  const float *edir, *edn, *eup, *abso;
  if (tenstream_tpu_specint(nz, nx, ny, 100.0, 100.0, 180.0, 40.0,
                            0.1, 0.25, "ecckd", "2str", plev, tlev, lwc,
                            reliq, NULL, NULL, 1, 1, &nz_merged, &edir, &edn,
                            &eup, &abso))
    return 1;

  double toa_up = 0, sfc_dn = 0, sfc_dir = 0;
  int ncol = nx * ny;
  for (int i = 0; i < ncol; ++i) {
    toa_up += eup[i] / ncol;
    sfc_dn += edn[nz_merged * ncol + i] / ncol;
    sfc_dir += edir[nz_merged * ncol + i] / ncol;
  }
  printf("specint: nz_merged=%d  TOA up (OLR+SWup) %.1f  sfc edn %.1f  "
         "sfc edir %.1f W/m2\n", nz_merged, toa_up, sfc_dn, sfc_dir);
  tenstream_tpu_destroy(1);
  return (nz_merged > nz && toa_up > 50.0 && sfc_dir > 10.0) ? 0 : 2;
}
