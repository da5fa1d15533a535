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


def test_tune_tone():
    """TUNE replaces the playback stream with a 1500 Hz sine at 0.9
    amplitude (x TX gain), phase-continuous across blocks, and queued TX
    audio is discarded while tuning (reference audioio.c:589-594,
    gui_state.h:242-247)."""
    a_dev, b_dev = LoopbackDevice.pair()
    io = AudioIO(playback_dev=a_dev, capture_dev=b_dev, symbol_len=256,
                 window_nsymb=4, block=480, use_window=False)
    io.tx_transfer(np.ones(1000, np.float32))     # queued TX to be eaten
    io.set_tune(True)
    io._stop.set()                                 # single manual iterations
    io._stop.clear()
    # run three playback iterations by hand (thread-free determinism)
    tune_w = 2.0 * np.pi * 1500.0 / io.fs
    for _ in range(3):
        io.playback_buffer.read(io.block, timeout_ms=0)
        idx = io._tune_idx + np.arange(io.block)
        tone = (0.9 * np.sin(tune_w * idx)).astype(np.float32)
        io._tune_idx += io.block
        io.playback_dev.write(tone * io.tx_gain)
    got = b_dev.read(3 * 480)
    t = np.arange(3 * 480)
    expect = (0.9 * np.sin(2 * np.pi * 1500.0 / 48000.0 * t)).astype(np.float32)
    np.testing.assert_allclose(got, expect, atol=1e-6)
    # spectral check: dominant bin at 1500 Hz
    spec = np.abs(np.fft.rfft(got * np.hanning(len(got))))
    f_peak = np.argmax(spec) * 48000.0 / len(got)
    assert abs(f_peak - 1500.0) < 48000.0 / len(got) * 2
    io.set_tune(False)
    assert not io.tune_active


def test_tune_tone_through_thread():
    """The live playback thread emits the tone when tune is active."""
    a_dev, b_dev = LoopbackDevice.pair()
    io = AudioIO(playback_dev=a_dev, capture_dev=b_dev, symbol_len=256,
                 window_nsymb=4, block=480, use_window=False)
    io.set_tune(True)
    io.start()
    try:
        deadline = time.monotonic() + 3.0
        got = np.zeros(0, np.float32)
        while time.monotonic() < deadline and len(got) < 2000:
            got = np.concatenate([got, b_dev.read(480)])
            time.sleep(0.01)
        assert len(got) >= 2000
        seg = got[:1920]
        spec = np.abs(np.fft.rfft(seg * np.hanning(len(seg))))
        f_peak = np.argmax(spec) * 48000.0 / len(seg)
        assert abs(f_peak - 1500.0) < 50.0
        assert 0.85 <= np.max(np.abs(seg)) <= 0.91
    finally:
        io.stop()


@pytest.fixture(scope="module")
def alsa_stub(tmp_path_factory, monkeypatch_module=None):
    """Build the libasound contract stub and point AlsaDevice at it
    (VERDICT r3 item 8: exercise the ALSA backend beyond clean failure)."""
    import ctypes.util
    import pathlib
    import subprocess

    src = pathlib.Path(__file__).parent / "alsa_stub" / "alsa_stub.c"
    so = tmp_path_factory.mktemp("alsa") / "libasound_stub.so"
    subprocess.run(["gcc", "-O1", "-shared", "-fPIC", str(src),
                    "-o", str(so)], check=True)
    log = so.parent / "transcript.log"
    orig = ctypes.util.find_library

    def fake_find(name):
        if name == "asound":
            return str(so)
        return orig(name)

    ctypes.util.find_library = fake_find
    import os
    os.environ["ALSA_STUB_LOG"] = str(log)
    import ctypes as _ct
    ctrl = _ct.CDLL(str(so))
    yield {"so": str(so), "log": log, "ctrl": ctrl}
    ctypes.util.find_library = orig
    os.environ.pop("ALSA_STUB_LOG", None)


def test_alsa_contract_params_and_loopback(alsa_stub):
    """AlsaDevice against the libasound contract stub: correct open/set
    params on the wire (FLOAT_LE interleaved at the requested rate),
    stereo MONO routing duplicates the mono signal, and samples written by
    the playback PCM come back through the capture PCM."""
    alsa_stub["ctrl"].alsa_stub_reset()
    alsa_stub["log"].write_text("")
    play = AlsaDevice("stub0", capture=False, rate=48000, channels=2)
    cap = AlsaDevice("stub0", capture=True, rate=48000, channels=2)
    tx = np.linspace(-0.5, 0.5, 480).astype(np.float32)
    assert play.write(tx) == 480
    got = cap.read(480)
    np.testing.assert_allclose(got, tx, atol=1e-7)   # MONO mean of dup
    play.close()
    cap.close()
    t = alsa_stub["log"].read_text()
    assert "open name=stub0 stream=0" in t           # playback stream
    assert "open name=stub0 stream=1" in t           # capture stream
    # FLOAT_LE=14, RW_INTERLEAVED=3, 2ch @ 48 kHz — the reference's
    # device contract (audioio.c format negotiation)
    assert "set_params format=14 access=3 channels=2 rate=48000" in t
    assert t.count("close") == 2


def test_alsa_contract_channel_routing(alsa_stub):
    """LEFT/RIGHT routing zeroes the other arm on the wire; capture of a
    LEFT-routed signal through the RIGHT arm is silent."""
    from mercury_tpu.native.audio import LEFT, RIGHT

    alsa_stub["ctrl"].alsa_stub_reset()
    play = AlsaDevice("stub0", capture=False, channels=2, channel=LEFT)
    cap_r = AlsaDevice("stub0", capture=True, channels=2, channel=RIGHT)
    cap_r2 = AlsaDevice("stub0", capture=True, channels=2, channel=LEFT)
    tx = np.ones(100, np.float32)
    play.write(tx)
    got_r = cap_r.read(100)
    np.testing.assert_array_equal(got_r, np.zeros(100, np.float32))
    play.write(tx)
    got_l = cap_r2.read(100)
    np.testing.assert_array_equal(got_l, tx)
    for d in (play, cap_r, cap_r2):
        d.close()


def test_alsa_contract_xrun_recovery(alsa_stub):
    """A writei xrun (-EPIPE) triggers snd_pcm_recover and a retry that
    delivers the frames (reference audioio.c underrun handling)."""
    alsa_stub["ctrl"].alsa_stub_reset()
    play = AlsaDevice("stub0", capture=False, channels=1)
    cap = AlsaDevice("stub0", capture=True, channels=1)
    alsa_stub["ctrl"].alsa_stub_arm_xrun()
    tx = np.arange(64, dtype=np.float32)
    assert play.write(tx) == 64                      # retry succeeded
    assert alsa_stub["ctrl"].alsa_stub_recover_calls() == 1
    np.testing.assert_array_equal(cap.read(64), tx)
    play.close()
    cap.close()


def test_alsa_contract_device_listing(alsa_stub):
    assert "stubpcm0" in AlsaDevice.list_devices()


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
