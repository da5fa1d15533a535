"""Full-system integration: ARQ session over the audio engine.

Two ArqNodes connected through the three-thread AudioIO engine and
LoopbackDevice virtual cables with additive noise — the reference's
VB-Audio-cable loopback topology (SURVEY §4.2), driven end-to-end:

    node A --poll()--> tx_transfer --> playback thread --> cable (+noise)
      --> capture thread --> AudioBurstTransport (energy squelch)
      --> node B.on_samples() --> full RX chain -> ACK back the same way

This exercises the real sample path (rings, threads, burst segmentation)
rather than LinkSimulator's direct delivery.
"""

import time

import numpy as np
import pytest

from mercury_tpu.link import protocol as P
from mercury_tpu.link.node import ArqConfig, ArqNode
from mercury_tpu.native.audio import AudioBurstTransport, AudioIO, LoopbackDevice


def _noisy(sigma, seed):
    rng = np.random.default_rng(seed)

    def f(x):
        return x + rng.normal(0.0, sigma, len(x)).astype(np.float32)

    return f


@pytest.mark.timeout(600)
def test_arq_over_audio_loopback():
    payload = bytes(np.random.default_rng(3).integers(0, 256, 60)
                    .astype(np.uint8))
    cfg = ArqConfig(init_configuration=0, gear_shift_on=False, batch_size=2)
    ev = []
    node_a = ArqNode("VE3XYZ", P.COMMANDER, cfg,
                     on_event=lambda e: ev.append("C " + e))
    node_b = ArqNode("N0CALL", P.RESPONDER, cfg,
                     on_event=lambda e: ev.append("R " + e))

    # cable 1: A speaks -> B hears; cable 2: B speaks -> A hears
    c1a, c1b = LoopbackDevice.pair(channel_fn=_noisy(2e-3, 1))
    c2a, c2b = LoopbackDevice.pair(channel_fn=_noisy(2e-3, 2))
    io_a = AudioIO(playback_dev=c1a, capture_dev=c2b, symbol_len=1088,
                   window_nsymb=4, block=1024, use_window=False)
    io_b = AudioIO(playback_dev=c2a, capture_dev=c1b, symbol_len=1088,
                   window_nsymb=4, block=1024, use_window=False)
    io_a.start()
    io_b.start()
    # squelch between the noise floor (2e-3) and the TX burst RMS (~0.15)
    t_a = AudioBurstTransport(io_a, squelch=0.02, hang_samples=4096)
    t_b = AudioBurstTransport(io_b, squelch=0.02, hang_samples=4096)

    try:
        node_a.send_data(payload)
        node_a.connect("N0CALL")

        now = 0.0          # virtual link clock (ms), advanced by airtime
        deadline = time.monotonic() + 420.0

        def shuttle(io_src, t_dst, node_dst, block, now_ms):
            io_src.tx_transfer(block)
            t_end = time.monotonic() + 10.0
            while time.monotonic() < t_end:
                burst = t_dst.capture()
                if burst is not None:
                    assert len(burst) >= len(block) // 2, (
                        "burst truncated by the squelch segmentation")
                    node_dst.on_samples(burst, now_ms)
                    return
                time.sleep(0.02)
            raise AssertionError("burst never emerged from the capture path")

        while time.monotonic() < deadline:
            progressed = False
            for src, io_src, t_dst, dst in (
                    (node_a, io_a, t_b, node_b),
                    (node_b, io_b, t_a, node_a)):
                for block in src.poll(now):
                    airtime = 1000.0 * len(block) / 48000.0
                    now += airtime + 300.0
                    shuttle(io_src, t_dst, dst, np.asarray(block), now)
                    progressed = True
            if len(node_b.fifo_rx) >= len(payload):
                break
            if not progressed:
                now += 200.0
        assert node_b.received() == payload
        assert node_a.link_status == P.CONNECTED
        assert any("CONNECTED" in e for e in ev)
    finally:
        io_a.stop()
        io_b.stop()
