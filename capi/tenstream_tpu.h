/* C API for the tenstream_tpu solver.
 *
 * Parity: reference `c_wrapper/f2c_pprts.h` — the C interface host models
 * (LES/NWP codes) use to drive the solver:
 *   pprts_f2c_init / pprts_f2c_set_global_optical_properties /
 *   pprts_f2c_solve / pprts_f2c_get_result / pprts_f2c_destroy
 *   (`c_wrapper/f2c_pprts.h:48-53`, semantics documented :21-85).
 *
 * This implementation embeds CPython and drives the JAX solver; the
 * heavy numerics run on the TPU exactly as from Python.  All arrays are
 * C-contiguous float32 with the layouts documented per call.
 */

#ifndef TENSTREAM_TPU_CAPI_H
#define TENSTREAM_TPU_CAPI_H

#ifdef __cplusplus
extern "C" {
#endif

/* Initialize the runtime and the solver.
 *  nz, nx, ny : grid dimensions (z = TOA..surface layers)
 *  dx, dy     : horizontal grid spacing [m]
 *  dz1d       : layer thicknesses [m], length nz (TOA first)
 *  phi0,theta0: sun azimuth/zenith [deg] (reference angle convention)
 *  solver_name: stream scheme, e.g. "3_10" or "2str"
 * Returns 0 on success. */
int tenstream_tpu_init(int nz, int nx, int ny, double dx, double dy,
                       const float *dz1d, double phi0, double theta0,
                       const char *solver_name);

/* Set per-cell optical properties; arrays are (nz, nx, ny) C-order,
 * planck is (nz+1, nx, ny) or NULL for solar-only. */
int tenstream_tpu_set_optical_properties(double albedo, const float *kabs,
                                         const float *ksca, const float *g,
                                         const float *planck);

/* Run a solve; edirTOA is the TOA direct irradiance [W/m2]. */
int tenstream_tpu_solve(int lthermal, int lsolar, double edirTOA);

/* Fetch results; edir/edn/eup are (nz+1, nx, ny), abso is (nz, nx, ny),
 * all W/m2 resp. W/m3.  Any pointer may be NULL to skip. */
int tenstream_tpu_get_result(float *edir, float *edn, float *eup, float *abso);

/* Full-spectrum (gas-optics) heating-rate solve — reference
 * `f2c_pprts_rrtmg` (`c_wrapper/f2c_pprts_rrtm.F90:48-161`): the host
 * slab (nz layers) is merged with the background atmosphere and the
 * broadband LW/SW result comes back on the MERGED grid.  Out pointers
 * reference library-owned buffers (valid until the next specint call or
 * destroy), shaped (*nz_merged+1, nx, ny) for fluxes and
 * (*nz_merged, nx, ny) for abso, C-order float32.
 *  plev, tlev  : (nz+1, nx, ny) level pressure [Pa] / temperature [K],
 *                TOA first (deviation from the reference: Pa, TOA-first)
 *  lwc, reliq  : (nz, nx, ny) liquid water [g/kg] / eff. radius [um], or NULL
 *  iwc, reice  : ice water / eff. radius, or NULL
 *  specint     : "ecckd" | "repwvl" | "rrtmg_sw" | "synthck" | "gray"
 *  solver_name : stream scheme, e.g. "3_10", or "2str"
 * Self-contained: no prior tenstream_tpu_init needed. */
int tenstream_tpu_specint(int nz, int nx, int ny, double dx, double dy,
                          double phi0, double theta0,
                          double albedo_thermal, double albedo_solar,
                          const char *specint, const char *solver_name,
                          const float *plev, const float *tlev,
                          const float *lwc, const float *reliq,
                          const float *iwc, const float *reice,
                          int lthermal, int lsolar, int *nz_merged,
                          const float **edir, const float **edn,
                          const float **eup, const float **abso);

/* Tear down the solver (and optionally the embedded interpreter). */
int tenstream_tpu_destroy(int finalize_runtime);

#ifdef __cplusplus
}
#endif

#endif /* TENSTREAM_TPU_CAPI_H */
