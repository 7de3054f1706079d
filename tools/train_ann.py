"""Train the ANN transfer-coefficient backend on a LUT and save it.

Parity: reference `misc/LUT_to_ANN.py` + `src_ANN/Calc_ANN.py` (offline
ffnet training of the 3_10 net consumed by `src/optprop_ANN.F90`).
Here the net is trained in-process on TPU and persisted as npz via
`AnnOptProp.save`; `PprtsSolver` accepts the loaded net anywhere it
accepts an `OptProp` table backend.

Usage:
    python tools/train_ann.py --lut data/luts/LUT_3_10_production.npz \
        --out data/ann/ANN_3_10_production.npz \
        [--hidden 128,128,128] [--epochs 150] [--batch 8192]

Prints train losses plus a held-out-style report: max/mean abs error of
the net vs the LUT on a random off-grid sample cloud (the metric that
matters — interpolation quality BETWEEN grid points, not memorization).
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--lut", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--hidden", default="128,128,128")
    ap.add_argument("--epochs", type=int, default=150)
    ap.add_argument("--batch", type=int, default=8192)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    from tenstream_tpu.optprop.ann import AnnOptProp
    from tenstream_tpu.optprop.facade import OptProp
    from tenstream_tpu.optprop.lut import LUT

    lut = LUT.load(args.lut)
    hidden = tuple(int(h) for h in args.hidden.split(","))
    t0 = time.time()
    ann = AnnOptProp(lut, hidden=hidden, epochs=args.epochs, batch=args.batch,
                     seed=args.seed)
    print(f"trained in {time.time() - t0:.1f}s: "
          f"dir_loss {ann.dir_loss:.3e} diff_loss {ann.diff_loss:.3e}")

    # off-grid generalization report vs multilinear LUT interpolation
    opp = OptProp(lut)
    rng = np.random.default_rng(1)
    n = 4096
    fa = lut.diff_axes
    tau = np.exp(rng.uniform(np.log(fa.tau[0] + 1e-12), np.log(fa.tau[-1]), n)).astype(np.float32)
    w0 = rng.uniform(fa.w0[0], fa.w0[-1], n).astype(np.float32)
    asp = np.exp(rng.uniform(np.log(fa.aspect[0]), np.log(fa.aspect[-1]), n)).astype(np.float32)
    g = rng.uniform(fa.g[0], fa.g[-1], n).astype(np.float32)
    c_lut = np.asarray(opp.diff_coeffs(tau, w0, g, asp))
    c_ann = np.asarray(ann.diff_coeffs(tau, w0, g, asp))
    err = np.abs(c_lut - c_ann)
    print(f"diff off-grid vs LUT-interp: mean |err| {err.mean():.3e} "
          f"max {err.max():.3e}")

    # the facade pre-slices the angle axes per solve, so evaluate at a
    # handful of fixed off-grid sun positions
    da = lut.dir_axes
    m = n // 4
    tau = np.exp(rng.uniform(np.log(da.tau[0] + 1e-12), np.log(da.tau[-1]), m)).astype(np.float32)
    w0 = rng.uniform(da.w0[0], da.w0[-1], m).astype(np.float32)
    asp = np.exp(rng.uniform(np.log(da.aspect[0]), np.log(da.aspect[-1]), m)).astype(np.float32)
    g = rng.uniform(da.g[0], da.g[-1], m).astype(np.float32)
    errs = {"dir2dir": [], "dir2diff": []}
    for phi, theta in ((12.0, 23.0), (37.0, 48.0), (71.0, 66.0), (84.0, 11.0)):
        t_lut, s_lut = opp.dir_coeffs(tau, w0, g, asp, phi, theta)
        t_ann, s_ann = ann.dir_coeffs(tau, w0, g, asp, phi, theta)
        errs["dir2dir"].append(np.abs(np.asarray(t_lut) - np.asarray(t_ann)))
        errs["dir2diff"].append(np.abs(np.asarray(s_lut) - np.asarray(s_ann)))
    for name, es in errs.items():
        e = np.concatenate([x.ravel() for x in es])
        print(f"{name} off-grid vs LUT-interp: mean |err| {e.mean():.3e} "
              f"max {e.max():.3e}")

    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    ann.save(args.out)
    print(f"saved -> {args.out} ({os.path.getsize(args.out) / 1e3:.1f} kB)")


if __name__ == "__main__":
    main()
