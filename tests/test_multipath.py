"""Watterson HF fading channel tests (BASELINE config: multipath + AWGN)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mercury_tpu.channel import sim
from mercury_tpu.core.geometry import build_geometry
from mercury_tpu.modem.rx import RxChain
from mercury_tpu.modem.tx import TxChain


def _run(cfg, preset, esn0, b=8, seed=42):
    g = build_geometry(cfg)
    tx, rx = TxChain(g), RxChain(g)
    rng = np.random.default_rng(0)
    payload = rng.integers(0, 256, (b, g.frame_bytes)).astype(np.uint8)
    frames = np.asarray(tx.transmit(payload))
    faded = sim.watterson(frames, **sim.WATTERSON_PRESETS[preset], seed=seed)
    delay = ((g.preamble_nsymb + 2) * g.nofdm + 50) * g.interp
    buf = sim.awgn_passband(jax.random.key(esn0),
                            jnp.asarray(faded.astype(np.float32)),
                            sim.sigma_for_esn0(esn0), delay,
                            g.nofdm * g.buffer_nsymb * g.interp)
    res = rx.receive(buf)
    ok = (np.asarray(res.payload) == payload).all(1)
    return 1 - ok.mean()


@pytest.mark.parametrize("preset,esn0", [("good", 8), ("moderate", 10), ("poor", 14)])
def test_config0_survives_watterson(preset, esn0):
    """BPSK 1/16 with LS estimation is the fading workhorse: decodes through
    all CCIR-style Watterson presets."""
    assert _run(0, preset, esn0) <= 0.125


def test_config9_slow_fading():
    """QPSK 8/16 handles slow (good) fading at moderate SNR; fast fading
    exceeds the frame-wide LS window's tracking (same limitation as the
    reference's 21x21 LS window — gearshift backs off instead)."""
    assert _run(9, "good", 18) <= 0.125


def test_fading_process_statistics():
    rng = np.random.default_rng(1)
    h = sim._fading_process(48000 * 4, 48000.0, 0.5, rng)
    # unit mean power, substantial variation (Rayleigh fading)
    assert abs(np.mean(np.abs(h) ** 2) - 1.0) < 0.35
    assert np.abs(h).min() < 0.5 < np.abs(h).max()
