"""Observability: metrics registry + RX diagnostics arrays.

Replaces the reference's printf tracing and ImGui visual feeds
(SURVEY §5: [OFDM-SYNC]/[CHAN-EST]/[GEARSHIFT] logs, waterfall/constellation
GUI taps) with structured counters/timers and notebook-friendly arrays.
"""

from __future__ import annotations

import time
from collections import defaultdict
from contextlib import contextmanager
from dataclasses import dataclass, field

import numpy as np


class Metrics:
    """Process-wide counters, gauges, and stage timers."""

    def __init__(self):
        self.counters: dict[str, int] = defaultdict(int)
        self.gauges: dict[str, float] = {}
        self.timings: dict[str, list[float]] = defaultdict(list)

    def count(self, name: str, inc: int = 1) -> None:
        self.counters[name] += inc

    def gauge(self, name: str, value: float) -> None:
        self.gauges[name] = value

    @contextmanager
    def timer(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.timings[name].append(time.perf_counter() - t0)

    def report(self) -> str:
        lines = ["== counters =="]
        for k in sorted(self.counters):
            lines.append(f"  {k}: {self.counters[k]}")
        lines.append("== gauges ==")
        for k in sorted(self.gauges):
            lines.append(f"  {k}: {self.gauges[k]:.4g}")
        lines.append("== timings (ms: mean / p50 / max / n) ==")
        for k in sorted(self.timings):
            t = np.array(self.timings[k]) * 1000
            lines.append(f"  {k}: {t.mean():.2f} / {np.median(t):.2f} / "
                         f"{t.max():.2f} / {len(t)}")
        return "\n".join(lines)


METRICS = Metrics()


def waterfall(samples: np.ndarray, fs: float = 48000.0, nfft: int = 512,
              hop: int = 256) -> tuple[np.ndarray, np.ndarray]:
    """Spectrogram array (dB) for waterfall display (reference:
    gui/waterfall.cc 512-pt FFT feed). Returns (spec [frames, nfft//2+1],
    freqs)."""
    samples = np.asarray(samples, dtype=np.float64)
    n_frames = max((len(samples) - nfft) // hop + 1, 0)
    win = np.hanning(nfft)
    rows = np.empty((n_frames, nfft // 2 + 1))
    for i in range(n_frames):
        seg = samples[i * hop: i * hop + nfft] * win
        rows[i] = 20 * np.log10(np.abs(np.fft.rfft(seg)) + 1e-12)
    return rows, np.fft.rfftfreq(nfft, 1 / fs)


def rx_diagnostics(rx_chain, pb_buffer: np.ndarray) -> dict:
    """One-shot RX diagnostics for notebooks: sync-metric curve, detected
    delay, equalized constellation points, channel magnitude over the frame
    grid, waterfall. (The arrays the reference feeds to its GUI.)"""
    import jax.numpy as jnp

    from mercury_tpu.modem import sync as sync_mod

    g = rx_chain.geom
    buf = jnp.asarray(np.asarray(pb_buffer, np.float32)[None])
    bb = rx_chain.to_baseband(buf, 0.0, data_fir=False)
    out: dict = {}
    if not g.spec.is_mfsk:
        met, _cfo = sync_mod.schmidl_cox_metric(bb, g)
        out["sync_metric"] = np.asarray(met)[0]
    res = rx_chain.receive(buf)
    delay = int(np.asarray(res.delay)[0])
    out.update(delay=delay, crc_ok=bool(np.asarray(res.crc_ok)[0]),
               snr_db=float(np.asarray(res.snr_db)[0]),
               freq_offset=float(np.asarray(res.freq_offset)[0]))
    # equalized constellation + channel estimate
    bb_d = rx_chain.to_baseband(buf, float(np.asarray(res.freq_offset)[0]),
                                data_fir=True)
    frame = rx_chain.extract_frame(bb_d, jnp.asarray([delay], jnp.int32))
    grid = rx_chain.demod_grid(frame)
    if not g.spec.is_mfsk:
        eq, variance, mean_h, _vf = rx_chain.grid_stats(grid)
        data = np.asarray(jnp.take(eq, jnp.asarray(g.data_cells), axis=-1))[0]
        out["constellation"] = data
        y_pil = jnp.take(grid.reshape(1, -1), jnp.asarray(g.pilot_cells), axis=-1)
        h = (y_pil.real @ jnp.asarray(g.est_op, jnp.float32).T) + \
            1j * (y_pil.imag @ jnp.asarray(g.est_op, jnp.float32).T)
        out["channel_mag"] = np.abs(np.asarray(h)[0]).reshape(g.nsymb, g.nc)
        out["pilot_variance"] = float(np.asarray(variance)[0])
    else:
        out["tone_energy"] = np.abs(np.asarray(grid)[0]) ** 2
    out["waterfall"], out["waterfall_freqs"] = waterfall(pb_buffer)
    return out
