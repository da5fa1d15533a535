"""Pure-numpy vector kernels behind the gr-mercury OOT blocks.

Each kernel maps [n_items, vlen_in] -> [n_items, vlen_out], the exact
per-item semantics of the reference OOT module's C++ work functions
(reference: tests/gr-hermes_ofdm/lib/*_impl.cc):

  zero_pad / zero_depad   zero_padder_impl.cc:63-94  (Nc -> Nfft bin map)
  gi_add / gi_remove      gi_adder_impl.cc:72-85     (cyclic prefix)
  frame / deframe         framer_impl.cc             (pilot lattice)

The framer/deframer source their lattice from mercury_tpu's ModeGeometry
(PRNG-exact vs the reference pilot configurator, core/geometry.py), so a
flowgraph built from these blocks carries the SAME frame the modem
transmits — the property the reference's OOT module enforces by
duplicating its configurator in C++ and exit(0)-ing on mismatch.
"""

from __future__ import annotations

import numpy as np


def zero_pad(x: np.ndarray, nc: int, nfft: int,
             start_shift: int = 1) -> np.ndarray:
    """[N, Nc] carriers -> [N, Nfft] FFT bins: negative-frequency half
    (first Nc/2 carriers) into the top bins, positive half starting at bin
    `start_shift`. The modem proper nulls DC (start_shift=1, the ofdm.cc
    `start_shift` convention that ModeGeometry.pad_map encodes); the
    reference's crude test block packs from bin 0 (zero_padder_impl.cc) —
    pass start_shift=0 for that layout."""
    x = np.asarray(x).reshape(-1, nc)
    out = np.zeros((x.shape[0], nfft), x.dtype)
    half = nc // 2
    out[:, nfft - half:] = x[:, :half]
    out[:, start_shift: start_shift + nc - half] = x[:, half:]
    return out


def zero_depad(x: np.ndarray, nc: int, nfft: int,
               start_shift: int = 1) -> np.ndarray:
    """[N, Nfft] -> [N, Nc]: inverse of zero_pad."""
    x = np.asarray(x).reshape(-1, nfft)
    half = nc // 2
    return np.concatenate(
        [x[:, nfft - half:],
         x[:, start_shift: start_shift + nc - half]], axis=1)


def gi_add(x: np.ndarray, nfft: int, ngi: int) -> np.ndarray:
    """[N, Nfft] -> [N, Nfft+Ngi]: cyclic prefix (tail Ngi samples)."""
    x = np.asarray(x).reshape(-1, nfft)
    return np.concatenate([x[:, nfft - ngi:], x], axis=1)


def gi_remove(x: np.ndarray, nfft: int, ngi: int) -> np.ndarray:
    """[N, Nfft+Ngi] -> [N, Nfft]."""
    x = np.asarray(x).reshape(-1, nfft + ngi)
    return x[:, ngi:]


class FrameLattice:
    """Pilot lattice of one mercury config, shared by framer/deframer.

    Built from mercury_tpu's ModeGeometry: data cells (row-major over the
    [Nsymb, Nc] grid), pilot cells and the boosted pilot sequence are the
    modem's own (telecom_system.cc:1804-1876 / ofdm.cc:904-1238 parity)."""

    def __init__(self, config: int, pilot_density: int | None = None):
        from mercury_tpu.core.geometry import build_geometry
        from mercury_tpu.core.modes import HIGH_DENSITY

        g = build_geometry(config, HIGH_DENSITY if pilot_density is None
                           else pilot_density, with_pre_eq=False)
        if g.spec.is_mfsk:
            raise ValueError("framer/deframer are OFDM-only blocks")
        self.geom = g
        self.nc, self.nsymb = g.nc, g.nsymb
        ncell = g.nc * g.nsymb
        del ncell
        self.pilot_cells = np.asarray(g.pilot_cells, np.int64)
        self.pilot_vals = np.asarray(g.pilot_seq)
        # the modem's own data walk (frame_types == DATA, row-major) —
        # excludes pilot AND config cells, exactly like the reference
        # framer's nData check (framer_impl.cc constructor)
        self.data_cells = np.asarray(g.data_cells, np.int64)
        self.ndata = len(self.data_cells)

    def frame(self, x: np.ndarray) -> np.ndarray:
        """[N, Ndata] data carriers -> [N, Nc*Nsymb] frame grid."""
        x = np.asarray(x).reshape(-1, self.ndata)
        out = np.zeros((x.shape[0], self.nc * self.nsymb), np.complex64)
        out[:, self.data_cells] = x
        out[:, self.pilot_cells] = self.pilot_vals[None]
        return out

    def deframe(self, x: np.ndarray) -> np.ndarray:
        """[N, Nc*Nsymb] frame grid -> [N, Ndata] data carriers."""
        x = np.asarray(x).reshape(-1, self.nc * self.nsymb)
        return x[:, self.data_cells]
