"""Legacy GI-based sync metrics (reference cl_ofdm::time_sync /
symbol_sync) — value parity against direct transcriptions of the
reference loops (ofdm.cc:1659-1733, 2188-2266)."""

import jax.numpy as jnp
import numpy as np

from mercury_tpu.core.geometry import build_geometry
from mercury_tpu.modem import sync
from mercury_tpu.modem.tx import TxChain


def _ref_time_sync_metric(x, nfft, ngi, ts_nsymb):
    """Direct transcription of the reference loop (interp rate 1)."""
    s = nfft + ngi
    n_cand = len(x) - s
    out = np.zeros(n_cand)
    for i in range(n_cand):
        corr = na = nb = 0.0
        for j in range(ts_nsymb):
            base = i + j * s
            if base + ngi + nfft > len(x):
                continue
            a = x[base: base + ngi]
            b = x[base + nfft: base + nfft + ngi]
            corr += np.sum(a.real * b.real + a.imag * b.imag)
            na += np.sum(a.real ** 2 + a.imag ** 2)
            nb += np.sum(b.real ** 2 + b.imag ** 2)
        out[i] = corr / np.sqrt(max(na * nb, 1e-30))
    return out


def test_gi_time_sync_parity_and_peak():
    g = build_geometry(0, with_pre_eq=False)
    rng = np.random.default_rng(0)
    # frame-like signal: cyclic-prefixed random symbols + noise floor
    nsym = 6
    td = rng.standard_normal((nsym, g.nfft)) + 1j * rng.standard_normal((nsym, g.nfft))
    sym = np.concatenate([td[:, -g.ngi:], td], axis=1).reshape(-1)
    delay = 37
    x = 0.01 * (rng.standard_normal(delay + len(sym) + 200)
                + 1j * rng.standard_normal(delay + len(sym) + 200))
    x[delay: delay + len(sym)] += sym
    x = x.astype(np.complex64)

    met = np.asarray(sync.gi_time_sync_metric(jnp.asarray(x[None]), g,
                                              decim=g.interp, ts_nsymb=4))[0]
    ref = _ref_time_sync_metric(x, g.nfft, g.ngi, 4)
    n = min(len(met), len(ref))
    np.testing.assert_allclose(met[:n], ref[:n], atol=2e-4)
    # the GI metric is ambiguous modulo one symbol period when the signal
    # holds more symbols than ts_nsymb (why the reference superseded it
    # with the Schmidl-Cox preamble search) — check symbol-aligned lock
    s_len = g.nfft + g.ngi
    peak = int(np.argmax(met[:n]))
    assert min((peak - delay) % s_len, (delay - peak) % s_len) <= 2


def test_gi_symbol_sync_matches_direct():
    g = build_geometry(0, with_pre_eq=False)
    rng = np.random.default_rng(1)
    nsymb = 5
    frame = (rng.standard_normal(nsymb * g.nofdm)
             + 1j * rng.standard_normal(nsymb * g.nofdm)).astype(np.complex64)
    met = np.asarray(sync.gi_symbol_sync_metric(jnp.asarray(frame[None]), g))[0]
    half = g.nfft // 2
    for i in range(nsymb):
        a = frame[i * g.nofdm: i * g.nofdm + half]
        b = frame[i * g.nofdm + half: i * g.nofdm + 2 * half]
        corr = np.sum(a.real * b.real + a.imag * b.imag)
        ref = abs(corr) / np.sqrt(np.sum(np.abs(a) ** 2) * np.sum(np.abs(b) ** 2))
        np.testing.assert_allclose(met[i], ref, atol=1e-5)


def test_gi_time_sync_finds_real_frame():
    """The legacy metric locates a real TX frame's start on clean baseband."""
    g = build_geometry(0, with_pre_eq=False)
    tx = TxChain(g)
    rng = np.random.default_rng(2)
    payload = rng.integers(0, 256, (1, g.frame_bytes)).astype(np.uint8)
    pb = np.asarray(tx.transmit(payload))[0]
    # mix to baseband at base rate via the RX chain's front end
    from mercury_tpu.modem.rx import RxChain
    rx = RxChain(g)
    delay = 400
    buf = np.zeros(g.nofdm * g.buffer_nsymb * g.interp, np.float32)
    buf[delay: delay + len(pb)] = pb
    import jax
    bb = jax.jit(lambda p: rx.to_baseband(p, 0.0, data_fir=False))(buf[None])
    bb4 = np.asarray(bb)[:, ::g.interp]
    met = np.asarray(sync.gi_time_sync_metric(jnp.asarray(bb4), g,
                                              decim=g.interp))[0]
    found = int(np.argmax(met)) * g.interp
    # GI correlation peaks at the first data symbol boundary modulo Nofdm;
    # accept any symbol-aligned position consistent with the frame placement
    assert (found - delay) % (g.nofdm * g.interp) <= 8 or \
           (delay - found) % (g.nofdm * g.interp) <= 8
