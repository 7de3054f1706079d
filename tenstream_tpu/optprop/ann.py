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


def _train(key, X, Y, hidden=(64, 64), epochs=400, lr=3e-3, batch=None):
    """Full-batch adam when `batch` is None (small mockup tables in
    tests); shuffled minibatch adam + cosine decay for production-size
    tables (hundreds of thousands of rows)."""
    import optax

    sizes = [X.shape[-1], *hidden, Y.shape[-1]]
    key, kinit = jax.random.split(key)
    params = _mlp_init(kinit, sizes)
    n = X.shape[0]

    if batch is None or batch >= n:
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

    steps_per_epoch = n // batch
    sched = optax.cosine_decay_schedule(lr, epochs * steps_per_epoch, alpha=1e-2)
    opt = optax.adam(sched)
    state = opt.init(params)

    @jax.jit
    def epoch_step(params, state, key):
        perm = jax.random.permutation(key, n)

        def body(carry, idx):
            params, state = carry
            xb, yb = X[idx], Y[idx]

            def loss(p):
                return jnp.mean((_mlp_apply(p, xb) - yb) ** 2)

            l, grads = jax.value_and_grad(loss)(params)
            updates, state2 = opt.update(grads, state)
            return (optax.apply_updates(params, updates), state2), l

        idxs = perm[: steps_per_epoch * batch].reshape(steps_per_epoch, batch)
        (params, state), ls = jax.lax.scan(body, (params, state), idxs)
        return params, state, ls.mean()

    for _ in range(epochs):
        key, ke = jax.random.split(key)
        params, state, l = epoch_step(params, state, ke)
    return params, float(l)


class AnnOptProp:
    """MLP coefficient backend trained on a LUT.

    Trained nets persist via `save`/`load` (the reference ships trained
    nets as netCDF consumed by `ANN_init`, `src/optprop_ANN.F90:178-189`;
    training happens offline in `misc/LUT_to_ANN.py` — here
    `tools/train_ann.py`)."""

    def __init__(self, lut: Optional[LUT], scheme: Optional[StreamScheme] = None,
                 hidden=(64, 64), epochs=400, seed=0, batch=None):
        if lut is None:  # constructed by load()
            self.scheme = scheme
            return
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
            k1, jnp.asarray(Xd), jnp.asarray(Yd), hidden, epochs, batch=batch
        )

        fa = lut.diff_axes
        grids = np.meshgrid(fa.tau, fa.w0, fa.aspect, fa.g, indexing="ij")
        Xf = np.asarray(_features(*[jnp.asarray(gr.ravel(), ireals) for gr in grids]))
        Yf = lut.diff2diff.reshape(-1, nf * nf).astype(np.float32)
        self._diff_params, self.diff_loss = _train(
            k2, jnp.asarray(Xf), jnp.asarray(Yf), hidden, epochs, batch=batch
        )

    # persistence ------------------------------------------------------------
    def save(self, path: str) -> None:
        """Write trained params to npz (layer arrays + scheme + losses)."""
        arrs = {"scheme": np.asarray(self.scheme.name)}
        for tag, params, loss in (
            ("dir", self._dir_params, self.dir_loss),
            ("diff", self._diff_params, self.diff_loss),
        ):
            arrs[f"{tag}_nlayers"] = np.asarray(len(params))
            arrs[f"{tag}_loss"] = np.asarray(loss)
            for i, (w, b) in enumerate(params):
                arrs[f"{tag}_w{i}"] = np.asarray(w)
                arrs[f"{tag}_b{i}"] = np.asarray(b)
        np.savez_compressed(path, **arrs)

    @classmethod
    def load(cls, path: str) -> "AnnOptProp":
        z = np.load(path)
        self = cls(None, scheme=get_scheme(str(z["scheme"])))
        for tag in ("dir", "diff"):
            params = [
                (jnp.asarray(z[f"{tag}_w{i}"]), jnp.asarray(z[f"{tag}_b{i}"]))
                for i in range(int(z[f"{tag}_nlayers"]))
            ]
            setattr(self, f"_{tag}_params", params)
            setattr(self, f"{tag}_loss", float(z[f"{tag}_loss"]))
        return self

    # facade-compatible API -------------------------------------------------
    def dir_coeffs(self, tauz, w0, g, aspect, phi_deg, theta_deg,
                   switch_x=False, switch_y=False) -> Tuple[jnp.ndarray, jnp.ndarray]:
        nd, nf = self.scheme.ndir, self.scheme.ndiff
        X = _features(tauz, w0, aspect, g,
                      jnp.asarray(phi_deg, ireals), jnp.asarray(theta_deg, ireals))
        Y = _mlp_apply(self._dir_params, X)
        from tenstream_tpu.boxmc.direct_transmission import (
            dir2dir_analytic,
            supports_scheme,
        )

        if supports_scheme(self.scheme.name):
            # exact closed-form direct backbone, same as the LUT facade —
            # the net only ever carries the scattered source term
            c_dd = dir2dir_analytic(
                self.scheme.name, tauz, aspect, phi_deg, theta_deg
            ).astype(ireals)
            c_dd = jnp.moveaxis(c_dd, (-2, -1), (0, 1))
        else:
            c_dd = jnp.moveaxis(
                Y[..., : nd * nd].reshape(X.shape[:-1] + (nd, nd)), (-2, -1), (0, 1)
            )
        c_df = jnp.moveaxis(
            Y[..., nd * nd:].reshape(X.shape[:-1] + (nd, nf)), (-2, -1), (0, 1)
        )
        if switch_x or switch_y:
            # sun-octant unfolding identical to OptProp.dir_coeffs: p on
            # both dir dims, p/q on dir2diff src/dst
            q = _diff_dst_permutation(self.scheme, switch_x, switch_y)
            p = self.scheme.dir_switch_perm(switch_x, switch_y)
            c_dd = c_dd[p, :][:, p]
            c_df = c_df[p, :][:, q]
        return c_dd, c_df

    def diff_coeffs(self, tauz, w0, g, aspect) -> jnp.ndarray:
        nf = self.scheme.ndiff
        X = _features(tauz, w0, aspect, g)
        Y = _mlp_apply(self._diff_params, X)
        return jnp.moveaxis(Y.reshape(X.shape[:-1] + (nf, nf)), (-2, -1), (0, 1))
