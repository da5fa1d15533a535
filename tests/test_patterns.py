"""ACK/BREAK tone-pattern signaling tests (detection, false alarm,
cross-pattern rejection) mirroring the reference's ack_pattern_detection_test
(telecom_system.cc:1712-1802)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mercury_tpu.channel import sim
from mercury_tpu.core.geometry import build_geometry
from mercury_tpu.modem.patterns import PatternSignaler


@pytest.fixture(scope="module")
def sig():
    return PatternSignaler(build_geometry(0))


def _buffer(sig, pattern, snr_db, key, b=4):
    g = sig.geom
    delay = 2 * g.nofdm * g.interp
    buf_len = sig.passband_samples + 2 * delay
    p_sig = np.mean(pattern ** 2)
    sigma = np.sqrt(2.0 * p_sig * (g.fs / 2) /
                    (10 ** (snr_db / 10.0) * g.bandwidth)) / np.sqrt(2.0)
    frames = jnp.tile(jnp.asarray(pattern, jnp.float32)[None], (b, 1))
    return sim.awgn_passband(key, frames, float(sigma), delay, buf_len)


def test_ack_detected_at_operating_snr(sig):
    buf = _buffer(sig, sig.ack_passband, -5.0, jax.random.key(0))
    metric, matched = sig.detect_ack(buf)
    assert (np.asarray(metric) >= sig.threshold).all()
    assert (np.asarray(matched) >= 8).all()


def test_ack_metric_parity_weak_signal(sig):
    """Metric statistics match the reference's own ack_pattern_detection_test
    (measured via golden_gen acktest 100): mean 0.98 at -13 dB, 4.67 at -5 dB.
    ROBUST_0's threshold 0.65 gives partial detection at -13 dB in both
    implementations; the ARQ layer's ACK repetition covers the misses."""
    g = build_geometry(100)
    s100 = PatternSignaler(g)
    for snr, ref_mean in [(-13.0, 0.978), (-5.0, 4.671)]:
        buf = _buffer(s100, s100.ack_passband, snr, jax.random.key(1), b=8)
        metric, _ = s100.detect_ack(buf)
        m = float(np.asarray(metric).mean())
        assert ref_mean * 0.6 <= m <= ref_mean * 1.4, (snr, m, ref_mean)


def test_no_false_alarm_on_noise(sig):
    g = sig.geom
    delay = 2 * g.nofdm * g.interp
    buf_len = sig.passband_samples + 2 * delay
    noise = 0.1 * jax.random.normal(jax.random.key(2), (8, buf_len))
    metric, _ = sig.detect_ack(noise)
    assert (np.asarray(metric) < sig.threshold).all(), np.asarray(metric)


def test_break_not_detected_as_ack(sig):
    """The g=5/g=7 Welch-Costas sequences collide at 2 of 16 hop positions
    ((5*7^-1)^p = 8^p = 1 mod 17 at p=0,8), so the RAW cross metric reaches
    ~1.0 >= threshold at high SNR (measured: docs/pattern_detect_r5.json) —
    the matched-count >= NSYMB/2 gate (reference arq_common.cc:2582-2583)
    is what rejects the cross pattern, not the metric threshold."""
    buf = _buffer(sig, sig.break_passband, 0.0, jax.random.key(3))
    ack_metric, ack_matched = sig.detect_ack(buf)
    brk_metric, brk_matched = sig.detect_break(buf)
    # true pattern: detected by the full gate
    assert (np.asarray(brk_metric) >= sig.threshold).all()
    assert (np.asarray(brk_matched) >= 8).all()
    # cross pattern: metric alone may cross threshold; the gate must reject
    assert (np.asarray(ack_matched) < 8).all(), np.asarray(ack_matched)
    assert (np.asarray(ack_metric) < np.asarray(brk_metric) * 0.5).all()


def test_break_while_awaiting_ack_not_swallowed():
    """Commander awaiting an ACK checks the ACK detector FIRST; without the
    matched-count gate a high-SNR BREAK waveform cross-fires it (metric
    ~1.0 >= 0.65) and the emergency BREAK is swallowed as a false ACK.
    Drive ArqNode._pattern_hit directly with a clean BREAK window."""
    from mercury_tpu.link import protocol as P
    from mercury_tpu.link.node import ArqNode

    node = ArqNode("PP5XX", P.COMMANDER)
    pat = node._pat
    buf = np.asarray(_buffer(pat, pat.break_passband, 5.0,
                             jax.random.key(9), b=1))[0]
    assert not node._pattern_hit(pat.detect_ack, buf)
    assert node._pattern_hit(pat.detect_break, buf)
