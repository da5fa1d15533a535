"""MFSK punctured control frames (reference: telecom_system.cc:2968-2994)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mercury_tpu.channel import sim
from mercury_tpu.core.geometry import build_geometry
from mercury_tpu.modem.rx import RxChain
from mercury_tpu.modem.tx import TxChain


@pytest.mark.parametrize("cfg,snr,nsymb_expected", [(100, -12, 240), (101, -10, 175)])
def test_ctrl_frame_loopback(cfg, snr, nsymb_expected):
    g = build_geometry(cfg)
    assert g.ctrl_nsymb == nsymb_expected
    tx, rx = TxChain(g, ctrl=True), RxChain(g, ctrl=True)
    rng = np.random.default_rng(0)
    payload = rng.integers(0, 256, (4, g.frame_bytes)).astype(np.uint8)
    frames = np.asarray(tx.transmit(payload))
    # ctrl frames are shorter than data frames
    assert frames.shape[1] == g.nofdm * (g.preamble_nsymb + nsymb_expected) * g.interp
    assert frames.shape[1] < g.total_frame_size
    sigma = sim.sigma_for_channel_snr(frames[0], snr, g.fs, g.bandwidth)
    delay = (g.preamble_nsymb + 2) * g.nofdm * g.interp
    buf = sim.awgn_passband(jax.random.key(cfg), jnp.asarray(frames), sigma,
                            delay, g.nofdm * g.buffer_nsymb * g.interp)
    res = rx.receive(buf)
    assert np.asarray(res.crc_ok).all()
    assert (np.asarray(res.payload) == payload).all()


def test_ctrl_rejected_for_ofdm():
    g = build_geometry(0)
    with pytest.raises(ValueError):
        TxChain(g, ctrl=True)
    with pytest.raises(ValueError):
        RxChain(g, ctrl=True)


def test_ctrl_rejected_for_robust2():
    g = build_geometry(102)   # rate 1/4 cannot tolerate puncturing
    with pytest.raises(ValueError):
        TxChain(g, ctrl=True)
