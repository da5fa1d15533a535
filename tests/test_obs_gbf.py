"""GBF decoder, baseband BER harness, and observability diagnostics."""

import jax.numpy as jnp
import numpy as np
import pytest

from mercury_tpu.channel.ber import BerHarness
from mercury_tpu.fec import ldpc
from mercury_tpu.fec.tables import load_code
from mercury_tpu.obs import Metrics, rx_diagnostics, waterfall


def test_gbf_decodes_light_noise():
    code = load_code(1)
    rng = np.random.default_rng(5)
    u = rng.integers(0, 2, (4, code.k))
    cw = np.asarray(ldpc.encode(code, jnp.asarray(u)))
    # GBF is the cheap decoder: usable threshold is far above SPA's
    sigma = 0.35
    y = (1 - 2 * cw) + sigma * rng.standard_normal(cw.shape)
    llr = (2 / sigma ** 2 * y).astype(np.float32)
    bits, iters, ok = ldpc.decode_gbf(jnp.asarray(llr), 1)
    assert np.asarray(ok).all()
    assert (np.asarray(bits)[:, :code.k] == u).all()


def test_gbf_clean_zero_iters():
    code = load_code(8)
    u = np.zeros((2, code.k), dtype=np.int64)
    cw = np.asarray(ldpc.encode(code, jnp.asarray(u)))
    llr = ((1 - 2 * cw) * 9.0).astype(np.float32)
    _b, iters, ok = ldpc.decode_gbf(jnp.asarray(llr), 8)
    assert np.asarray(ok).all() and (np.asarray(iters) == 0).all()


def test_baseband_ber_harness():
    h = BerHarness(0, batch=8)
    p = h.run_point_baseband(2.0, 8)    # comfortably above threshold
    assert p.fer == 0.0
    with pytest.raises(ValueError):
        BerHarness(100, batch=4).run_point_baseband(0.0, 4)


def test_metrics_registry():
    m = Metrics()
    m.count("frames")
    m.count("frames", 2)
    m.gauge("snr", 12.5)
    with m.timer("decode"):
        pass
    rep = m.report()
    assert "frames: 3" in rep and "snr: 12.5" in rep and "decode" in rep


def test_rx_diagnostics():
    import jax

    from mercury_tpu.channel import sim
    from mercury_tpu.core.geometry import build_geometry
    from mercury_tpu.modem.rx import RxChain
    from mercury_tpu.modem.tx import TxChain

    g = build_geometry(9)
    tx, rx = TxChain(g), RxChain(g)
    payload = np.arange(g.frame_bytes, dtype=np.uint8)[None]
    frame = tx.transmit(payload)
    buf = sim.awgn_passband(jax.random.key(0), frame, sim.sigma_for_esn0(14),
                            7000, g.nofdm * g.buffer_nsymb * g.interp)
    d = rx_diagnostics(rx, np.asarray(buf)[0])
    assert d["crc_ok"]
    assert d["constellation"].shape == (g.n_data,)
    assert d["channel_mag"].shape == (g.nsymb, g.nc)
    assert d["sync_metric"].max() > 0.7
    assert d["waterfall"].shape[1] == 257
