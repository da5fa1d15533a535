"""Pallas kernel correctness (interpret mode on CPU; compiled on TPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mercury_tpu.core.geometry import build_geometry
from mercury_tpu.dsp import ops
from mercury_tpu.dsp.pallas_kernels import mix_fir_decimate


@pytest.mark.parametrize("stride", [1, 2, 4])
def test_fused_mix_fir_decimate(stride):
    g = build_geometry(0, with_pre_eq=False)
    rng = np.random.default_rng(0)
    pb = jnp.asarray(rng.standard_normal((3, 8192)).astype(np.float32))
    taps = jnp.asarray(g.fir_rx_ts.astype(np.float32))
    out = mix_fir_decimate(pb, taps, g.fs, g.fc, stride=stride, interpret=True)
    t = jnp.arange(8192, dtype=jnp.float32)
    ph = (2 * np.pi * g.fc / g.fs) * t
    iq = pb * np.float32(np.sqrt(2)) * (jnp.cos(ph) + 1j * jnp.sin(ph))
    ref = ops.fir_same(iq, taps)[:, ::stride]
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-5, rtol=1e-4)
