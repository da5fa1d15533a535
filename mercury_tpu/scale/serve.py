"""Serving pool: many independent radio channels, one batched RX dispatch.

The deployment story behind the throughput numbers (docs/throughput_r3.json:
one chip sustains tens of thousands of real-time 48 kHz channels) needs a
runtime object that actually aggregates independent capture streams into
batched receive calls — per-channel dispatch would burn the ~2.6 ms
dispatch floor per channel and cap a chip at a few hundred channels.

StreamPool owns a native [n_channels, window_len] circular window pool
(native/runtime.cc rt_pool — the vectorized form of the reference's
capture-prep protocol, audioio.c:999-1069): feeding is bulk memcpy into
per-channel rings (no per-symbol Python loop, no memmove shifting), and
each step linearizes EVERY ready channel into contiguous rows in one
native pass, then decodes them in ONE jitted batched receive. Per-channel
anti-re-decode arming follows the reference's frames_to_read arithmetic
(arq_common.cc:2690-2730).

Batch shapes are bucketed to powers of two so the number of distinct
compiled programs is log2(n_channels), not one per ready-count.

    pool = StreamPool(build_geometry(9), n_channels=1024)
    pool.feed(ch, chunk)            # any chunk size, per channel
    pool.feed_block(chunk_block)    # or all channels at once, one call
    for ch, res in pool.step():     # one batched dispatch for all ready
        if res.crc_ok: ...

Measured end-to-end (feed -> gather -> H2D -> decode -> D2H -> arm):
tools/serve_bench.py -> docs/serve_r4.json.
"""

from __future__ import annotations

import numpy as np

from mercury_tpu.core.geometry import ModeGeometry
from mercury_tpu.modem.rx import RxChain, RxResult
from mercury_tpu.native import WindowPool


class DeviceStreamPool:
    """Device-resident serving pool: the per-channel windows LIVE IN HBM.

    StreamPool moves the full [R, window] rows host->device every step —
    1.5x the ingest bytes (window/chunk overlap) plus a host gather. For
    uniform-block serving (aggregated SDR front-ends delivering one
    [C, chunk] block per tick), this pool keeps the window state on the
    device: feed_block uploads ONLY the new chunk (the information-
    theoretic minimum H2D traffic) and a jitted donated-buffer update
    rolls the window pool in HBM; step() decodes a bucket of ready rows
    gathered ON DEVICE. Countdown/arming bookkeeping (scalars per
    channel) stays on the host, mirroring the capture-prep protocol
    (reference audioio.c:999-1069 / arq_common.cc:2690-2730).

    Requires every feed_block to carry a whole number of symbols (the
    ragged/partial-symbol case is StreamPool's job).
    """

    def __init__(self, geom: ModeGeometry, n_channels: int,
                 rx: RxChain | None = None, idle_rearm: int = 4):
        import jax
        import jax.numpy as jnp

        self.geom = geom
        self.rx = rx or RxChain(geom)
        g = geom
        self.buf_len = g.nofdm * g.buffer_nsymb * g.interp
        self.sym_len = g.nofdm * g.interp
        self.frame_syms = g.nsymb + g.preamble_nsymb
        self.n_channels = n_channels
        self.idle_rearm = idle_rearm
        self._jnp = jnp
        self.windows = jnp.zeros((n_channels, self.buf_len), jnp.float32)
        self._ftr = np.full(n_channels, g.buffer_nsymb, np.int64)
        self._ready = np.zeros(n_channels, bool)
        self.frames_decoded = 0
        self.batched_dispatches = 0
        self.rows_dispatched = 0

        def _update(windows, chunk):
            n = chunk.shape[-1]
            return jnp.concatenate([windows[:, n:], chunk], axis=-1)

        # donate the window buffer: the roll happens in place in HBM
        self._update = jax.jit(_update, donate_argnums=0)

        @jax.jit
        def _gather(windows, idx):
            return jnp.take(windows, idx, axis=0)

        self._gather = _gather

    def feed_block(self, block: np.ndarray) -> None:
        """One [n_channels, k*sym_len] capture block -> single H2D upload
        + donated in-HBM window roll; countdown advances k symbols."""
        jnp = self._jnp
        assert block.shape[0] == self.n_channels
        assert block.shape[1] % self.sym_len == 0, \
            "DeviceStreamPool feeds whole symbols (use StreamPool for ragged)"
        k = block.shape[1] // self.sym_len
        self.windows = self._update(self.windows,
                                    jnp.asarray(block, jnp.float32))
        self._ready |= self._ftr <= k
        self._ftr = np.maximum(self._ftr - k, 0)

    def step(self) -> list[tuple[int, RxResult]]:
        jnp = self._jnp
        chans = np.flatnonzero(self._ready)
        r = len(chans)
        if r == 0:
            return []
        bucket = min(StreamPool._bucket(r), self.n_channels)
        idx = np.zeros(bucket, np.int32)
        idx[:r] = chans
        rows = self._gather(self.windows, jnp.asarray(idx))
        res = self.rx.receive(rows)
        self.batched_dispatches += 1
        self.rows_dispatched += r
        ok = np.asarray(res.crc_ok)[:r]
        delays = np.asarray(res.delay)[:r]
        fields = tuple(np.asarray(x) for x in
                       (res.payload, res.crc_ok, res.delay, res.freq_offset,
                        res.snr_db, res.iters, res.sync_metric, res.mean_h))
        out: list[tuple[int, RxResult]] = []
        for i in range(r):
            c = int(chans[i])
            if ok[i]:
                out.append((c, RxResult(*(f[i: i + 1] for f in fields))))
                self._ftr[c] = max(int(delays[i]) // self.sym_len
                                   + self.frame_syms, 1)
            else:
                self._ftr[c] = self.idle_rearm
            self._ready[c] = False
        self.frames_decoded += len(out)
        return out


class FusedDevicePool:
    """Serving pool with ONE host-visible dispatch and ONE D2H per round.

    The round-4 measurement (docs/serve_r4.json) showed the serving loop
    orders of magnitude below the kernel rate with the decomposition
    stopping at "tunnel H2D". This pool removes every other host-visible
    round-trip so the budget has exactly three line items a bench can
    measure and sum (tools/serve_bench.py --budget):

      1. H2D: the new chunk (the information-theoretic minimum ingest)
      2. one fused dispatch: window roll + full-batch receive + in-graph
         frames_to_read arming (the reference capture-prep countdown,
         audioio.c:999-1069 / arq_common.cc:2690-2730 — here as a donated
         int32 vector in HBM)
      3. one packed D2H: payload bytes + crc + delay + freq + snr + iters
         bitcast into a single uint8 row per channel

    Differences vs DeviceStreamPool: every channel is decoded every round
    (no gather/bucketing — in lockstep uniform-block serving all channels
    are ready each round anyway, and skipping the gather removes a
    dispatch); non-ready rows are decoded-and-masked in-graph. next_block
    (double buffering) uploads round r+1's chunk right after round r's
    dispatch is issued, so on a real PCIe path the transfer runs under the
    decode (through the serialized axon tunnel it measures the same).
    """

    def __init__(self, geom: ModeGeometry, n_channels: int,
                 rx: RxChain | None = None, idle_rearm: int = 4):
        import functools

        import jax
        import jax.numpy as jnp

        self.geom = geom
        self.rx = rx or RxChain(geom)
        g = geom
        self.buf_len = g.nofdm * g.buffer_nsymb * g.interp
        self.sym_len = g.nofdm * g.interp
        self.frame_syms = g.nsymb + g.preamble_nsymb
        self.n_channels = n_channels
        self.idle_rearm = idle_rearm
        self.frame_bytes = g.frame_bytes
        self._jax = jax
        self._jnp = jnp
        self.windows = jnp.zeros((n_channels, self.buf_len), jnp.float32)
        self.ftr = jnp.full((n_channels,), g.buffer_nsymb, jnp.int32)
        self._pending = None
        self.frames_decoded = 0
        self.batched_dispatches = 0
        sym_len, frame_syms, idle = self.sym_len, self.frame_syms, idle_rearm
        rx_chain = self.rx

        @functools.partial(jax.jit, donate_argnums=(0, 1))
        def _round(windows, ftr, chunk):
            n = chunk.shape[-1]
            k = n // sym_len
            win2 = jnp.concatenate([windows[:, n:], chunk], axis=-1)
            ready = ftr <= k
            res = rx_chain.receive_fn(win2)
            ok = res.crc_ok & ready
            rearm = jnp.where(ok, res.delay // sym_len + frame_syms, idle)
            ftr2 = jnp.where(ready, jnp.maximum(rearm, 1),
                             jnp.maximum(ftr - k, 0))

            def b4(x, dt):          # [C] scalar field -> 4 uint8 columns
                return jax.lax.bitcast_convert_type(
                    x.astype(dt)[:, None], jnp.uint8).reshape(-1, 4)

            packed = jnp.concatenate([
                res.payload.astype(jnp.uint8),
                ok.astype(jnp.uint8)[:, None],
                b4(res.delay, jnp.int32),
                b4(res.freq_offset, jnp.float32),
                b4(res.snr_db, jnp.float32),
                b4(res.iters, jnp.int32),
                b4(res.sync_metric, jnp.float32),
            ], axis=-1)
            return win2, ftr2, packed

        self._round = _round

    def prefetch(self, block: np.ndarray) -> None:
        """Start uploading the NEXT round's chunk (double buffering)."""
        self._pending = self._jax.device_put(
            self._jnp.asarray(block, self._jnp.float32))

    def round(self, block: np.ndarray, next_block: np.ndarray = None):
        """One serving round. Returns the packed on-device result array
        [C, frame_bytes+21]; unpack() reads it to host in one D2H."""
        jnp = self._jnp
        assert block.shape[0] == self.n_channels
        assert block.shape[1] % self.sym_len == 0, \
            "FusedDevicePool feeds whole symbols"
        chunk = self._pending if self._pending is not None else \
            self._jax.device_put(jnp.asarray(block, jnp.float32))
        self._pending = None
        self.windows, self.ftr, packed = self._round(self.windows, self.ftr,
                                                     chunk)
        self.batched_dispatches += 1
        if next_block is not None:
            # issue the next upload while the round computes (async
            # dispatch: _round's results have not been fetched yet)
            self.prefetch(next_block)
        return packed

    def unpack(self, packed) -> list[tuple[int, RxResult]]:
        """ONE D2H of the packed result block -> per-channel RxResults."""
        fb = self.frame_bytes
        # single D2H; ascontiguousarray because the axon relay can hand
        # back a tiled/strided layout for larger arrays, and the .view
        # reinterprets below need byte-contiguous rows (observed at 256
        # channels in round 5: "last axis must be contiguous")
        flat = np.ascontiguousarray(np.asarray(packed))
        payload = flat[:, :fb]
        ok = flat[:, fb].astype(bool)
        off = fb + 1
        delay = flat[:, off:off + 4].view(np.int32)[:, 0]
        freq = flat[:, off + 4:off + 8].view(np.float32)[:, 0]
        snr = flat[:, off + 8:off + 12].view(np.float32)[:, 0]
        iters = flat[:, off + 12:off + 16].view(np.int32)[:, 0]
        metric = flat[:, off + 16:off + 20].view(np.float32)[:, 0]
        out = []
        for c in np.flatnonzero(ok):
            i = int(c)
            out.append((i, RxResult(
                payload[i: i + 1], ok[i: i + 1], delay[i: i + 1],
                freq[i: i + 1], snr[i: i + 1], iters[i: i + 1],
                metric[i: i + 1], np.zeros(1, np.float32))))
        self.frames_decoded += len(out)
        return out


class StreamPool:
    def __init__(self, geom: ModeGeometry, n_channels: int,
                 rx: RxChain | None = None, idle_rearm: int = 4):
        self.geom = geom
        self.rx = rx or RxChain(geom)
        g = geom
        self.buf_len = g.nofdm * g.buffer_nsymb * g.interp
        self.sym_len = g.nofdm * g.interp
        self.frame_syms = g.nsymb + g.preamble_nsymb
        self.n_channels = n_channels
        self.idle_rearm = idle_rearm
        self.pool = WindowPool(n_channels, self.buf_len, self.sym_len)
        arm0 = np.full(n_channels, g.buffer_nsymb, np.int32)
        self.pool.arm_many(np.arange(n_channels, dtype=np.int32), arm0)
        self.frames_decoded = 0
        self.batched_dispatches = 0
        self.rows_dispatched = 0

    def feed(self, channel: int, samples: np.ndarray) -> None:
        """Push capture audio for one channel (any chunk size; partial
        symbols are staged natively until a full symbol accumulates)."""
        self.pool.feed(channel, samples)

    def feed_block(self, block: np.ndarray) -> None:
        """Push one [n_channels, n] block of capture audio — a single
        native call for the whole pool tick."""
        self.pool.feed_block(block)

    @staticmethod
    def _bucket(n: int) -> int:
        b = 1
        while b < n:
            b *= 2
        return b

    def step(self) -> list[tuple[int, RxResult]]:
        """Decode every channel whose window countdown elapsed, in ONE
        batched receive dispatch (rows padded to a power-of-two bucket so
        compiled batch shapes are bounded). Returns (channel, single-row
        RxResult) pairs for channels that decoded a frame; non-decoding
        ready channels are re-armed a few symbols ahead."""
        rows, chans = self.pool.gather_ready()
        r = len(chans)
        if r == 0:
            return []
        bucket = min(self._bucket(r), self.n_channels)
        if bucket > r:
            rows = np.concatenate(
                [rows, np.zeros((bucket - r, self.buf_len), np.float32)])
        res = self.rx.receive(rows)
        self.batched_dispatches += 1
        self.rows_dispatched += r
        ok = np.asarray(res.crc_ok)[:r]
        delays = np.asarray(res.delay)[:r]
        fields = tuple(np.asarray(x) for x in
                       (res.payload, res.crc_ok, res.delay, res.freq_offset,
                        res.snr_db, res.iters, res.sync_metric, res.mean_h))
        out: list[tuple[int, RxResult]] = []
        rearm = np.empty(r, np.int32)
        for i in range(r):
            if ok[i]:
                out.append((int(chans[i]),
                            RxResult(*(f[i: i + 1] for f in fields))))
                rearm[i] = max(int(delays[i]) // self.sym_len
                               + self.frame_syms, 1)
            else:
                rearm[i] = self.idle_rearm
        self.frames_decoded += len(out)
        self.pool.arm_many(chans, rearm)
        return out
