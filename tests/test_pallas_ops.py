"""Fused Pallas diffuse-operator kernel — element-exact equivalence
with the XLA gather->einsum->scatter path (interpret mode on CPU)."""

import numpy as np
import pytest

import jax.numpy as jnp

from tenstream_tpu.pprts.operators import gather_diff_src, scatter_diff_dst
from tenstream_tpu.pprts.pallas_ops import (
    diffuse_apply_pallas,
    prepare_coeff_pallas,
)
from tenstream_tpu.streams import get_scheme


@pytest.mark.parametrize("name", ["1_2", "3_6", "3_10", "3_16", "8_18"])
def test_kernel_matches_xla(name):
    s = get_scheme(name)
    nd = s.ndiff
    nz, nx, ny = 5, 8, 16
    rng = np.random.default_rng(42)
    coeff = jnp.asarray(rng.random((nd, nd, nz, nx, ny)) * 0.1, jnp.float32)
    x = jnp.asarray(rng.random((nd, nz + 1, nx, ny)), jnp.float32)

    ref = scatter_diff_dst(
        s, jnp.einsum("sdkij,skij->dkij", coeff, gather_diff_src(s, x)), nz
    )
    out = diffuse_apply_pallas(s, prepare_coeff_pallas(coeff), x, tx=4, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-6)


def test_kernel_bf16_coeffs():
    s = get_scheme("3_10")
    nd, nz, nx, ny = 10, 6, 8, 16
    rng = np.random.default_rng(1)
    coeff = jnp.asarray(rng.random((nd, nd, nz, nx, ny)) * 0.1, jnp.bfloat16)
    x = jnp.asarray(rng.random((nd, nz + 1, nx, ny)), jnp.float32)
    ref = scatter_diff_dst(
        s,
        jnp.einsum(
            "sdkij,skij->dkij", coeff.astype(jnp.float32), gather_diff_src(s, x)
        ),
        nz,
    )
    out = diffuse_apply_pallas(s, prepare_coeff_pallas(coeff), x, tx=2, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-2, atol=2e-3)
