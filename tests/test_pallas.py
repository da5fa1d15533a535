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
    # the kernel's oscillator is host-built with float64 phase; match it
    t = np.arange(8192, dtype=np.float64)
    ph = (2 * np.pi * g.fc / g.fs) * t
    osc = (np.sqrt(2) * (np.cos(ph) + 1j * np.sin(ph))).astype(np.complex64)
    iq = pb * jnp.asarray(osc)
    ref = ops.fir_same(iq, taps)[:, ::stride]
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-5, rtol=1e-4)


@pytest.mark.parametrize("stride", [2, 4])
def test_fir_same_strided_mm(stride):
    """Banded-Toeplitz matmul FIR (MXU path) == direct strided conv."""
    g = build_geometry(0, with_pre_eq=False)
    rng = np.random.default_rng(1)
    x = jnp.asarray((rng.standard_normal((3, 9173))
                     + 1j * rng.standard_normal((3, 9173))).astype(np.complex64))
    taps = jnp.asarray(g.fir_rx_ts.astype(np.float32))
    a = ops.fir_same_strided(x, taps, stride)
    b = ops.fir_same_strided_mm(x, taps, stride)
    assert a.shape == b.shape
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_fir_decimate_mm():
    """MXU decimating segment FIR == conv fir_decimate_segment."""
    g = build_geometry(0, with_pre_eq=False)
    rng = np.random.default_rng(2)
    seg = jnp.asarray(rng.standard_normal((3, 2311)).astype(np.float32))
    taps = jnp.asarray(g.fir_rx_data.astype(np.float32))
    a = ops.fir_decimate_segment(seg, taps, 4)
    n_out = (seg.shape[-1] - (taps.shape[0] - 1)) // 4
    b = ops.fir_decimate_mm(seg, taps, 4, n_out)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)
