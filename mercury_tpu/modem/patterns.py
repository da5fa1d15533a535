"""ACK/BREAK tone-pattern signaling (reference: telecom_system.cc:1589-1709).

A universal, config-independent MFSK instance (M=16, 1 stream, centered in
the 50-carrier band) transmits 16-symbol Welch-Costas tone patterns: ACK
(p=17, g=5) and BREAK (p=17, g=7). Detection is an order-aware energy
matched filter over symbol-aligned windows (sync.pattern_detect_metric).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from mercury_tpu.core import hostdsp
from mercury_tpu.core.geometry import ModeGeometry, mfsk_params
from mercury_tpu.dsp import ops
from mercury_tpu.modem import mfsk as mfsk_mod
from mercury_tpu.modem import sync


class PatternSignaler:
    """TX + detection for the ACK and BREAK patterns of one mode geometry."""

    def __init__(self, geom: ModeGeometry, real_dtype=jnp.float32):
        self.geom = geom
        self.real_dtype = real_dtype
        # dedicated ack_mfsk: M=16, 1 stream, for ALL modes (telecom_system.cc:3003-3006)
        self.ack_mfsk = mfsk_params(16, geom.nc, 1)
        self.passband_samples = (self.ack_mfsk.ack_pattern_nsymb
                                 * geom.nofdm * geom.interp)
        # per-mode detection threshold (telecom_system.cc:3010-3019)
        self.threshold = 0.65 if geom.spec.config == 100 else 1.0
        self._fir_data = jnp.asarray(geom.fir_rx_data).astype(real_dtype)

    # ------------------------------------------------------------------
    def _passband(self, tones: np.ndarray) -> np.ndarray:
        """Host-side pattern synthesis (static waveform, computed once)."""
        g = self.geom
        grid = mfsk_mod.pattern_grid(self.ack_mfsk, g.nc, tones)
        nsymb = grid.shape[0]
        td = np.concatenate([
            hostdsp.symbol_mod(grid[s], g.nfft, g.ngi, 1) for s in range(nsymb)])
        power_norm = np.sqrt(g.nfft * g.interp)
        boost = np.sqrt(g.nc / self.ack_mfsk.nstreams) * 10 ** (-2.0 / 20.0)
        td = td / power_norm * np.sqrt(0.1) * boost
        pb = hostdsp.baseband_to_passband(td, g.fs, g.fc, np.sqrt(2.0), g.interp, 0)
        return hostdsp.peak_clip(pb, 10.0)

    @functools.cached_property
    def ack_passband(self) -> np.ndarray:
        return self._passband(self.ack_mfsk.ack_tones)

    @functools.cached_property
    def break_passband(self) -> np.ndarray:
        return self._passband(self.ack_mfsk.break_tones)

    # ------------------------------------------------------------------
    def _detect(self, pb_buffer: jnp.ndarray, tones: np.ndarray):
        g = self.geom
        n = pb_buffer.shape[-1]
        t = jnp.arange(n, dtype=self.real_dtype)
        ph = (2 * np.pi * g.fc / g.fs) * t
        iq = pb_buffer.astype(self.real_dtype) * np.sqrt(2.0) * (
            jnp.cos(ph) + 1j * jnp.sin(ph))
        bb = ops.fir_same(iq, self._fir_data)
        met, cnt = sync.pattern_detect_metric(bb, g, tones, self.ack_mfsk)
        best = jnp.argmax(met, axis=-1)
        metric = jnp.take_along_axis(met, best[:, None], axis=-1)[:, 0]
        matched = jnp.take_along_axis(cnt, best[:, None], axis=-1)[:, 0]
        return metric, matched

    @functools.cached_property
    def _detect_ack_jit(self):
        return jax.jit(lambda pb: self._detect(pb, self.ack_mfsk.ack_tones))

    @functools.cached_property
    def _detect_break_jit(self):
        return jax.jit(lambda pb: self._detect(pb, self.ack_mfsk.break_tones))

    def detect_ack(self, pb_buffer):
        """Returns (metric [B], matched_symbols [B]); detection when metric
        >= self.threshold."""
        return self._detect_ack_jit(jnp.asarray(pb_buffer))

    def detect_break(self, pb_buffer):
        return self._detect_break_jit(jnp.asarray(pb_buffer))
