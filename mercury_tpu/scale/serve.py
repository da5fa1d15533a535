"""Serving pool: many independent radio channels, one batched RX dispatch.

The deployment story behind the throughput numbers (docs/throughput_r3.json:
one chip sustains tens of thousands of real-time 48 kHz channels) needs a
runtime object that actually aggregates independent capture streams into
batched receive calls — per-channel dispatch would burn the ~2.6 ms
dispatch floor per channel and cap a chip at a few hundred channels.

StreamPool owns N per-channel sliding windows (the native C++ window,
reference audioio.c:999-1069 protocol) and, on each step, decodes EVERY
armed channel in ONE jitted batched receive. Per-channel anti-re-decode
arming follows the reference's frames_to_read arithmetic
(arq_common.cc:2690-2730).

    pool = StreamPool(build_geometry(9), n_channels=256)
    pool.feed(ch, chunk)            # any chunk size, per channel
    for ch, res in pool.step():     # one batched dispatch for all ready
        if res.crc_ok: ...
"""

from __future__ import annotations

import numpy as np

from mercury_tpu.core.geometry import ModeGeometry
from mercury_tpu.modem.rx import RxChain, RxResult
from mercury_tpu.native import SlidingWindow


class StreamPool:
    def __init__(self, geom: ModeGeometry, n_channels: int,
                 rx: RxChain | None = None):
        self.geom = geom
        self.rx = rx or RxChain(geom)
        g = geom
        self.buf_len = g.nofdm * g.buffer_nsymb * g.interp
        self.sym_len = g.nofdm * g.interp
        self.frame_syms = g.nsymb + g.preamble_nsymb
        self.n_channels = n_channels
        self.windows = [SlidingWindow(self.buf_len, self.sym_len)
                        for _ in range(n_channels)]
        for w in self.windows:
            w.arm(g.buffer_nsymb)
        self._residual = [np.zeros(0, np.float32) for _ in range(n_channels)]
        self.frames_decoded = 0
        self.batched_dispatches = 0

    def feed(self, channel: int, samples: np.ndarray) -> None:
        """Push capture audio for one channel (any chunk size); whole
        symbols go into the sliding window, a sub-symbol tail is held."""
        r = np.concatenate([self._residual[channel],
                            np.asarray(samples, np.float32)])
        n_full = len(r) // self.sym_len * self.sym_len
        chunk, self._residual[channel] = r[:n_full], r[n_full:]
        w = self.windows[channel]
        for pos in range(0, len(chunk), self.sym_len):
            w.push(chunk[pos: pos + self.sym_len])

    def step(self) -> list[tuple[int, RxResult]]:
        """Decode every channel whose window countdown elapsed, in ONE
        batched receive dispatch. Returns (channel, single-row RxResult)
        pairs for channels that decoded a frame; non-decoding ready
        channels are re-armed a few symbols ahead."""
        ready = [c for c in range(self.n_channels) if self.windows[c].ready]
        if not ready:
            return []
        rows = np.stack([self.windows[c].snapshot()[0] for c in ready])
        res = self.rx.receive(rows)
        self.batched_dispatches += 1
        ok = np.asarray(res.crc_ok)
        delays = np.asarray(res.delay)
        out: list[tuple[int, RxResult]] = []
        for i, c in enumerate(ready):
            if ok[i]:
                row = RxResult(*(np.asarray(x)[i: i + 1]
                                 for x in (res.payload, res.crc_ok,
                                           res.delay, res.freq_offset,
                                           res.snr_db, res.iters,
                                           res.sync_metric, res.mean_h)))
                out.append((c, row))
                self.frames_decoded += 1
                consumed = (int(delays[i]) // self.sym_len) + self.frame_syms
                self.windows[c].arm(max(consumed, 1))
            else:
                self.windows[c].arm(4)
        return out
