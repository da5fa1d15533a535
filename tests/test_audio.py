"""Audio I/O engine: three-thread architecture over device backends
(reference source/audioio parity — playback/capture/capture-prep threads,
virtual-cable loopback, gated ALSA)."""

import time

import numpy as np
import pytest

from mercury_tpu.native.audio import AlsaDevice, AudioIO, LoopbackDevice


def test_loopback_device_cable():
    a, b = LoopbackDevice.pair()
    a.write(np.arange(10, dtype=np.float32))
    got = b.read(10)
    np.testing.assert_array_equal(got, np.arange(10, dtype=np.float32))
    # partial reads keep the remainder
    a.write(np.arange(7, dtype=np.float32))
    assert len(b.read(3)) == 3
    np.testing.assert_array_equal(b.read(4), np.arange(3, 7, dtype=np.float32))


def test_audioio_end_to_end_window():
    """TX samples pushed with tx_transfer travel playback thread -> cable ->
    capture thread -> capture-prep sliding window, symbol-aligned."""
    a_dev, b_dev = LoopbackDevice.pair()
    symbol_len, nsymb = 1088, 8
    rng = np.random.default_rng(0)
    tx = rng.standard_normal(symbol_len * 4).astype(np.float32)

    io = AudioIO(playback_dev=a_dev, capture_dev=b_dev,
                 symbol_len=symbol_len, window_nsymb=nsymb, block=512)
    io.start()
    try:
        io.arm(4)                       # expect 4 symbol periods
        io.tx_transfer(tx)
        deadline = time.monotonic() + 5.0
        ready = False
        while time.monotonic() < deadline and not ready:
            win, ready = io.rx_window()
            time.sleep(0.02)
        assert ready, "capture-prep window never became ready"
        # the last 4 symbols of the window must be exactly the TX samples
        np.testing.assert_allclose(win[-len(tx):], tx, atol=1e-6)
    finally:
        io.stop()


def test_audioio_gains():
    a_dev, b_dev = LoopbackDevice.pair()
    io = AudioIO(playback_dev=a_dev, capture_dev=b_dev, symbol_len=256,
                 window_nsymb=4, tx_gain_db=6.0, block=256)
    try:
        io.tx_transfer(np.ones(10, np.float32))
        chunk = io.playback_buffer.read(10, timeout_ms=100)
        np.testing.assert_allclose(chunk, 10 ** (6 / 20.0), rtol=1e-6)
    finally:
        io.playback_dev.close()


def test_alsa_gated_cleanly():
    """Without libasound the ALSA backend must raise a clear RuntimeError
    (and list_devices must return empty), not crash."""
    import ctypes.util
    if ctypes.util.find_library("asound") is None:
        assert AlsaDevice.list_devices() == []
        with pytest.raises(RuntimeError, match="libasound"):
            AlsaDevice()
    else:
        assert isinstance(AlsaDevice.list_devices(), list)


def test_pulse_oss_gated_cleanly():
    """Pulse and OSS backends raise clear RuntimeErrors when their subsystem
    is absent (and construct when present — exercised on audio-full hosts)."""
    import ctypes.util
    import os

    from mercury_tpu.native.audio import OssDevice, PulseDevice

    if (ctypes.util.find_library("pulse-simple") is None
            and ctypes.util.find_library("libpulse-simple") is None):
        with pytest.raises(RuntimeError, match="libpulse-simple"):
            PulseDevice()
    if not os.path.exists("/dev/dsp"):
        with pytest.raises(RuntimeError, match="OSS"):
            OssDevice()


def test_open_audio_device_probe_order():
    """auto probe reports every backend's reason when none is available, and
    named selection routes to the right class."""
    from mercury_tpu.native import audio

    try:
        dev = audio.open_audio_device("auto")
    except RuntimeError as e:
        msg = str(e)
        assert "alsa:" in msg and "pulse:" in msg and "oss:" in msg
    else:  # host actually has audio
        dev.close()
    with pytest.raises(KeyError):
        audio.open_audio_device("wasapi")


def test_burst_transport_segments_on_silence():
    from mercury_tpu.native.audio import AudioBurstTransport
    a_dev, b_dev = LoopbackDevice.pair()
    io = AudioIO(playback_dev=a_dev, capture_dev=b_dev, symbol_len=256,
                 window_nsymb=4, block=512, use_window=False)
    io.start()
    try:
        t = AudioBurstTransport(io, squelch=1e-3, hang_samples=2048)
        rng = np.random.default_rng(1)
        burst = (0.5 * rng.standard_normal(6000)).astype(np.float32)
        t.transmit(np.concatenate([burst, np.zeros(8000, np.float32)]))
        deadline = time.monotonic() + 5.0
        got = None
        while time.monotonic() < deadline and got is None:
            got = t.capture()
            time.sleep(0.02)
        assert got is not None, "burst never emitted"
        # the emitted burst must contain the signal (leading-silence trim
        # keeps a small margin; trailing hang silence may be included)
        assert len(got) >= 6000
        np.testing.assert_allclose(got[:6000], burst, atol=1e-6)
    finally:
        io.stop()
