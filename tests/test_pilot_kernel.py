"""Parity of the fused pilot-candidate scoring kernel (pallas, interpret
mode on CPU) against sync.pilot_rescore's XLA formulation — the TPU
production path for the deep-acquisition pilot arbitration (round 5;
the XLA per-candidate slice-gather measured element-rate-bound on chip)."""

import jax
import jax.numpy as jnp
import numpy as np

from mercury_tpu.modem import sync


def test_pilot_kernel_matches_xla():
    rng = np.random.default_rng(3)
    b, m, f_n, nsym, s_d = 4, 9, 13, 5, 136
    mf_s, ts_dec = 2, 4
    n_ts = 6000
    bb = (rng.standard_normal((b, n_ts))
          + 1j * rng.standard_normal((b, n_ts))).astype(np.complex64)
    cand = (rng.integers(0, 200, (b, m)) * (mf_s * ts_dec)).astype(np.int32)
    fidx = rng.integers(0, f_n, (b, m)).astype(np.int32)
    base = (rng.standard_normal((nsym, s_d))
            + 1j * rng.standard_normal((nsym, s_d))).astype(np.complex64)
    t = np.arange(s_d)
    bank = np.stack([base * np.exp(-1j * 2 * np.pi * f * 1e-4 * t)[None]
                     for f in range(f_n)]).astype(np.complex64)
    args = (jnp.asarray(bb), jnp.asarray(cand), jnp.asarray(fidx), bank,
            mf_s, ts_dec, 48)
    ref = np.asarray(sync.pilot_rescore(*args, use_pallas=False))
    got = np.asarray(sync.pilot_rescore(*args, use_pallas=True))
    np.testing.assert_allclose(got, ref, rtol=2e-5, atol=1e-5)


def test_pilot_kernel_silence_guard():
    """Silent rows must score ~0, not explode on the normalized metric."""
    b, m, f_n, nsym, s_d = 2, 3, 2, 4, 136
    bank = (np.ones((f_n, nsym, s_d)) + 0j).astype(np.complex64)
    bb = jnp.zeros((b, 4000), jnp.complex64)
    cand = jnp.zeros((b, m), jnp.int32)
    fidx = jnp.zeros((b, m), jnp.int32)
    out = np.asarray(sync.pilot_rescore(bb, cand, fidx, bank, 2, 4, 0,
                                        use_pallas=True))
    assert np.all(np.abs(out) < 1e-3), out


def test_deep_mf_max_matches_bank_scores():
    """In-kernel max/argmax over the hypothesis axis == XLA max of the full
    score surface (interpret mode)."""
    rng = np.random.default_rng(5)
    b, a, lp, s_d = 3, 5, 2, 136
    seg_len = 2 * 700 + lp * s_d
    seg = (rng.standard_normal((b, seg_len))
           + 1j * rng.standard_normal((b, seg_len))).astype(np.complex64)
    base = (rng.standard_normal((lp, s_d))
            + 1j * rng.standard_normal((lp, s_d))).astype(np.complex64)
    t = np.arange(s_d)
    bank = np.stack([base * np.exp(-1j * 2 * np.pi * f * 2e-4 * t)[None]
                     for f in range(a)]).astype(np.complex64)
    smax, sarg = sync.coherent_scan_max(jnp.asarray(seg), bank, 700,
                                        use_pallas=True)
    score = np.asarray(sync.bank_scores(jnp.asarray(seg), bank, 700))
    np.testing.assert_allclose(np.asarray(smax), score.max(1),
                               rtol=2e-4, atol=2e-4)
    # argmax can differ only where two rows tie within tolerance
    agree = (np.asarray(sarg) == score.argmax(1))
    assert agree.mean() > 0.99, agree.mean()
