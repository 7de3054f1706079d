"""Neural-network transfer-coefficient backend (LUT alternative).

Parity: reference `src/optprop_ANN.F90` — an MLP predicting the 3_10
transfer coefficients from (tau, w0, aspect, g[, phi, theta]), selected
with `-pprts_use_ANN` and inferenced through the external fornado
library.  Here the net is a small flax MLP trained directly on a
generated LUT (the reference trains offline with ffnet,
`misc/LUT_to_ANN.py`); inference is a fused matmul stack — a natural fit
for the MXU, replacing the gather-heavy table interpolation.

API-compatible with `OptProp` (`dir_coeffs` / `diff_coeffs`), so
`PprtsSolver` takes either backend.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from tenstream_tpu.core.types import ireals
from tenstream_tpu.optprop.facade import _diff_dst_permutation
from tenstream_tpu.optprop.lut import LUT
from tenstream_tpu.streams import StreamScheme, get_scheme


def _mlp_init(key, sizes: Sequence[int]):
    params = []
    for i in range(len(sizes) - 1):
        key, k1 = jax.random.split(key)
        w = jax.random.normal(k1, (sizes[i], sizes[i + 1])) * np.sqrt(2.0 / sizes[i])
        params.append((w.astype(jnp.float32), jnp.zeros((sizes[i + 1],), jnp.float32)))
    return params


def _mlp_apply(params, x):
    for w, b in params[:-1]:
        x = jax.nn.gelu(x @ w + b)
    w, b = params[-1]
    return jax.nn.sigmoid(x @ w + b)  # coefficients live in [0, 1]


def _features(tau, w0, aspect, g, phi=None, theta=None):
    f = [
        jnp.log10(jnp.maximum(tau, 1e-12)),
        w0,
        jnp.log(jnp.maximum(aspect, 1e-3)),
        g,
    ]
    if phi is not None:
        f += [phi / 90.0, theta / 90.0]
    return jnp.stack([jnp.broadcast_to(v, jnp.shape(f[0])) for v in f], axis=-1)


def _train(key, X, Y, hidden=(64, 64), epochs=400, lr=3e-3):
    import optax

    sizes = [X.shape[-1], *hidden, Y.shape[-1]]
    params = _mlp_init(key, sizes)
    opt = optax.adam(lr)
    state = opt.init(params)

    @jax.jit
    def step(params, state):
        def loss(p):
            return jnp.mean((_mlp_apply(p, X) - Y) ** 2)

        l, grads = jax.value_and_grad(loss)(params)
        updates, state2 = opt.update(grads, state)
        return optax.apply_updates(params, updates), state2, l

    for _ in range(epochs):
        params, state, l = step(params, state)
    return params, float(l)


class AnnOptProp:
    """MLP coefficient backend trained on a LUT."""

    def __init__(self, lut: LUT, scheme: Optional[StreamScheme] = None,
                 hidden=(64, 64), epochs=400, seed=0):
        self.scheme = scheme or get_scheme(lut.scheme)
        nd, nf = self.scheme.ndir, self.scheme.ndiff
        key = jax.random.PRNGKey(seed)
        k1, k2 = jax.random.split(key)

        da = lut.dir_axes
        grids = np.meshgrid(da.tau, da.w0, da.aspect, da.g, da.phi, da.theta, indexing="ij")
        Xd = np.asarray(
            _features(*[jnp.asarray(gr.ravel(), ireals) for gr in grids])
        )
        Yd = np.concatenate(
            [
                lut.dir2dir.reshape(-1, nd * nd),
                lut.dir2diff.reshape(-1, nd * nf),
            ],
            axis=-1,
        ).astype(np.float32)
        self._dir_params, self.dir_loss = _train(
            k1, jnp.asarray(Xd), jnp.asarray(Yd), hidden, epochs
        )

        fa = lut.diff_axes
        grids = np.meshgrid(fa.tau, fa.w0, fa.aspect, fa.g, indexing="ij")
        Xf = np.asarray(_features(*[jnp.asarray(gr.ravel(), ireals) for gr in grids]))
        Yf = lut.diff2diff.reshape(-1, nf * nf).astype(np.float32)
        self._diff_params, self.diff_loss = _train(
            k2, jnp.asarray(Xf), jnp.asarray(Yf), hidden, epochs
        )

    # facade-compatible API -------------------------------------------------
    def dir_coeffs(self, tauz, w0, g, aspect, phi_deg, theta_deg,
                   switch_x=False, switch_y=False) -> Tuple[jnp.ndarray, jnp.ndarray]:
        nd, nf = self.scheme.ndir, self.scheme.ndiff
        X = _features(tauz, w0, aspect, g,
                      jnp.asarray(phi_deg, ireals), jnp.asarray(theta_deg, ireals))
        Y = _mlp_apply(self._dir_params, X)
        c_dd = Y[..., : nd * nd].reshape(X.shape[:-1] + (nd, nd))
        c_df = Y[..., nd * nd :].reshape(X.shape[:-1] + (nd, nf))
        if switch_x or switch_y:
            perm = _diff_dst_permutation(self.scheme, switch_x, switch_y)
            c_df = c_df[..., :, perm]
        # stream dims lead (facade convention, see OptProp.dir_coeffs)
        return jnp.moveaxis(c_dd, (-2, -1), (0, 1)), jnp.moveaxis(c_df, (-2, -1), (0, 1))

    def diff_coeffs(self, tauz, w0, g, aspect) -> jnp.ndarray:
        nf = self.scheme.ndiff
        X = _features(tauz, w0, aspect, g)
        Y = _mlp_apply(self._diff_params, X)
        return jnp.moveaxis(Y.reshape(X.shape[:-1] + (nf, nf)), (-2, -1), (0, 1))
