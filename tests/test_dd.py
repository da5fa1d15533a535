"""Decision-directed channel re-estimation (RxChain dd=...).

The DD second pass treats the re-encoded decoded codeword as a pilot on
every data cell and re-estimates the channel with a weighted box window
(modem/rx.py _dd_demod). The reference has no equivalent — its estimator is
strictly pilot-driven (ofdm.cc:1266-1451). Two regimes are covered here:

- AWGN: DD closes the (small) estimation-noise component at the high-order
  QAM modes; selection keeps every frame whose first BP pass converged, so
  FER can only improve (up to CRC false positives).
- Fading: a NARROW time window tracks the channel inside a frame — the
  dense virtual-pilot lattice affords a ~5-symbol window that the sparse
  pilot lattice cannot support. This lifts the Watterson moderate/poor OFDM
  floors (docs/fading_r2.md) by an order of magnitude.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mercury_tpu.channel import sim
from mercury_tpu.core.geometry import build_geometry
from mercury_tpu.fec import ldpc
from mercury_tpu.modem import psk
from mercury_tpu.modem.rx import RxChain
from mercury_tpu.modem.tx import TxChain


def test_dd_auto_policy():
    assert RxChain(build_geometry(16)).dd          # 32QAM: on
    assert RxChain(build_geometry(11)).dd          # 8PSK: on
    assert not RxChain(build_geometry(9)).dd       # QPSK: off
    assert not RxChain(build_geometry(0)).dd       # BPSK: off
    assert not RxChain(build_geometry(100)).dd     # MFSK: off
    # the reference's ZF estimator has no ramp model -> DD unavailable
    assert not RxChain(build_geometry(16, estimator="reference")).dd
    with pytest.raises(ValueError):
        RxChain(build_geometry(16, estimator="reference"), dd=True)
    with pytest.raises(ValueError):
        RxChain(build_geometry(100), dd=True)
    with pytest.raises(ValueError):
        RxChain(build_geometry(16), dd_window=(4, 9))


def _bb_grid(g, tx, bits, esn0_db, key):
    """TX grid + AWGN at the baseband-harness convention (no sync chain)."""
    from mercury_tpu.dsp import ops

    b = bits.shape[0]
    code = tx.code
    u = jnp.concatenate([bits, bits[:, : g.n_virtual]], -1)
    cw = ldpc.encode(code, u)
    tx_bits = jnp.concatenate([bits, cw[:, code.k:]], -1)
    syms = psk.mod(jnp.take(tx_bits, jnp.asarray(g.bit_perm), -1), tx._const)
    syms = jnp.take(syms, jnp.asarray(g.tf_perm), -1)
    flat = jnp.zeros((b, g.nsymb * g.nc), jnp.complex64)
    flat = flat.at[:, jnp.asarray(g.data_cells)].set(syms.astype(jnp.complex64))
    flat = flat.at[:, jnp.asarray(g.pilot_cells)].set(
        g.pilot_seq.astype(np.complex64)[None])
    norm = float(np.sqrt(g.nfft))
    td = ops.ofdm_mod(flat.reshape(b, g.nsymb, g.nc), jnp.asarray(g.pad_map),
                      g.nfft, g.ngi) / norm
    sigma = 10 ** (-esn0_db / 20.0)
    k1, k2 = jax.random.split(key)
    noise = (sigma / np.float32(np.sqrt(2))) * (
        jax.random.normal(k1, td.shape) + 1j * jax.random.normal(k2, td.shape))
    return ops.ofdm_demod((td + noise) * norm, jnp.asarray(g.pad_map),
                          g.nfft, g.ngi)


def test_bb_decode_bits_matches_manual_when_dd_off():
    g = build_geometry(9)
    tx = TxChain(g)
    rx = RxChain(g)                    # dd auto-off for QPSK
    assert not rx.dd
    rng = np.random.default_rng(5)
    n_real = g.n_bits - g.ldpc_p
    bits = jnp.asarray(rng.integers(0, 2, (16, n_real)).astype(np.int32))
    grid = _bb_grid(g, tx, bits, 4.0, jax.random.key(1))
    got = rx.bb_decode_bits(grid)
    llr, _s, _m, _d = rx.decode_ofdm(grid)
    lln = jnp.concatenate([llr[..., :n_real], llr[..., : g.n_virtual],
                           llr[..., n_real: n_real + g.ldpc_p]], -1)
    want, _i, _c = ldpc.decode(lln.astype(jnp.float32), g.spec.ldpc_rate_num)
    np.testing.assert_array_equal(np.asarray(got),
                                  np.asarray(want[:, :n_real]))


def test_dd_never_hurts_and_helps_at_threshold():
    """cfg11 (8PSK 8/16) near its waterfall: the DD pass re-decodes only the
    frames whose first BP pass failed to converge, so frame errors can only
    go down; at this operating point it measurably recovers frames."""
    g = build_geometry(11)
    tx = TxChain(g)
    rx = RxChain(g)                    # dd auto-on
    assert rx.dd
    rng = np.random.default_rng(11)
    n_real = g.n_bits - g.ldpc_p
    bits = jnp.asarray(rng.integers(0, 2, (96, n_real)).astype(np.int32))
    grid = _bb_grid(g, tx, bits, 4.5, jax.random.key(3))

    llr, (flat, slope, *_rest) = rx._ofdm_llr(grid)
    lln = jnp.concatenate([llr[..., :n_real], llr[..., : g.n_virtual],
                           llr[..., n_real: n_real + g.ldpc_p]], -1)
    b1, _i, conv1 = ldpc.decode(lln.astype(jnp.float32), g.spec.ldpc_rate_num)
    err1 = np.asarray(jnp.any(b1[:, :n_real] != bits, -1))

    got = np.asarray(rx.bb_decode_bits(grid))
    err_dd = np.asarray((got != np.asarray(bits)).any(-1))

    conv1 = np.asarray(conv1)
    # converged rows are untouched
    np.testing.assert_array_equal(err_dd[conv1], err1[conv1])
    assert err_dd.sum() <= err1.sum()
    assert err_dd.sum() < err1.sum()   # and at least one frame recovered


def test_dd_tracking_lifts_fading_floor():
    """QPSK 8/16 under Watterson 'moderate' (1 ms, 0.5 Hz) at +12 dB channel
    SNR: the frame-wide pilot estimator cannot follow the fading inside the
    multi-second frame (FER floor ~0.2, docs/fading_r2.md); a DD pass with a
    5-symbol window tracks it."""
    g = build_geometry(9)
    tx = TxChain(g)
    rx_plain = RxChain(g)
    rx_dd = RxChain(g, dd=True, dd_window=(5, 9), dd_passes=2)
    rng = np.random.default_rng(1234)
    b = 32
    payload = rng.integers(0, 256, (b, g.frame_bytes)).astype(np.uint8)
    pb = np.asarray(tx.transmit(payload), np.float64)
    faded = sim.watterson(pb, fs=g.fs, seed=77,
                          **sim.WATTERSON_PRESETS["moderate"])
    sigma = sim.sigma_for_channel_snr(pb[0], 12.0, g.fs, g.bandwidth)
    delay = ((g.preamble_nsymb + 2) * g.nofdm + 50) * g.interp
    buf = sim.awgn_passband(jax.random.key(21),
                            jnp.asarray(faded, jnp.float32), sigma, delay,
                            g.nofdm * g.buffer_nsymb * g.interp)
    buf = jnp.asarray(buf, jnp.float32)
    fer = {}
    for name, rx in (("plain", rx_plain), ("dd", rx_dd)):
        res = rx.receive(buf)
        good = (np.asarray(res.crc_ok)
                & (np.asarray(res.payload) == payload).all(-1))
        fer[name] = 1.0 - good.mean()
    assert fer["dd"] < fer["plain"]
    assert fer["dd"] <= 0.10
    assert fer["plain"] >= 0.15        # the floor the DD pass is lifting


def test_link_channel_fading_is_continuous_and_fair():
    """link.sim ChannelModel fading: deterministic per seed, time-coherent
    (the tap process is sampled at the block's simulated-time position, so
    fades persist across blocks), unit mean power, and the AWGN sigma is
    computed from the PRE-fading power (a deep fade must lower the
    instantaneous SNR, not re-normalize the noise)."""
    from mercury_tpu.link.sim import ChannelModel

    x = np.sin(2 * np.pi * 1500 / 48000 * np.arange(48000 * 30)
               ).astype(np.float32)
    cm = ChannelModel(snr_db=None, fading="moderate", seed=3)
    cm.now_s = 0.0
    y = cm.apply(x)
    p = (np.asarray(y, np.float64).reshape(30, 48000) ** 2).mean(-1)
    p_db = 10 * np.log10(p / 0.5)
    assert p_db.max() - p_db.min() > 6.0         # it actually fades
    assert abs(10 * np.log10(p.mean() / 0.5)) < 2.0   # ~unit mean power
    # determinism + time-coherence: same (seed, now_s) -> same realization
    cm2 = ChannelModel(snr_db=None, fading="moderate", seed=3)
    cm2.now_s = 10.0
    y2 = cm2.apply(x[:48000])
    # interior window: the block head differs by the delayed path's
    # zero-padding (d ≈ 48 samples) and Hilbert edge effects
    np.testing.assert_allclose(np.asarray(y2[4800:-4800]),
                               np.asarray(y[10 * 48000 + 4800:
                                            11 * 48000 - 4800]),
                               atol=2e-2)
    # noise level is set by the clean TX power, not the faded power: with
    # identical rng seeds the added noise must be IDENTICAL with and
    # without fading (subtract the deterministic faded/clean signal out)
    x1 = x[:48000]
    cm0 = ChannelModel(snr_db=None, fading="moderate", seed=3)
    cm0.now_s = 0.0
    faded = np.asarray(cm0.apply(x1), np.float64)
    cm3 = ChannelModel(snr_db=10.0, fading="moderate", seed=3)
    cm3.now_s = 0.0
    cm4 = ChannelModel(snr_db=10.0, fading=None, seed=3)
    n3 = np.asarray(cm3.apply(x1), np.float64) - faded
    n4 = np.asarray(cm4.apply(x1), np.float64) - np.asarray(x1, np.float64)
    assert abs(float(n3.std() / n4.std()) - 1.0) < 0.02
