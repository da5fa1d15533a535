"""gr-mercury: GNU Radio out-of-tree blocks over the mercury-tpu modem.

The reference ships `tests/gr-hermes_ofdm/` — six C++ GR blocks
(zero_padder/depadder, gi_adder/remover, framer/deframer) so channel
experiments can be composed as flowgraphs (OFDM_test.grc). This module is
the same surface as a MODERN GR python OOT: when `gnuradio` is importable
every factory returns a real `gr.sync_block` (vector-in/vector-out,
usable from GRC via the YAML files in `gr_mercury/grc/`); without
gnuradio the same classes run standalone with an identical
`work(input_items, output_items)` contract, so the DSP and the tests do
not depend on a GR install. The per-item math lives in
`gr_mercury/kernels.py` and is parity-tested against mercury_tpu's own
ops (tests/test_gr_blocks.py).

Example (either environment):

    from gr_mercury import blocks
    fr = blocks.framer(config=1)           # lattice from ModeGeometry
    pad = blocks.zero_padder(fr.lattice.nc, 512)

With GNU Radio, connect them like any vector block:

    tb.connect(src, fr, pad, fft, gi, chan, ...)
"""

from __future__ import annotations

import numpy as np

from . import kernels

try:  # real GNU Radio runtime, when present
    from gnuradio import gr as _gr
    HAVE_GNURADIO = True
    _Base = _gr.sync_block
except ImportError:  # standalone: same work() contract, no scheduler
    HAVE_GNURADIO = False

    class _Base:                                    # type: ignore[no-redef]
        def __init__(self, name=None, in_sig=None, out_sig=None):
            self.name = name
            self.in_sig = in_sig
            self.out_sig = out_sig

        def __call__(self, x: np.ndarray) -> np.ndarray:
            """Standalone convenience: push [N, vlen_in] through work()."""
            dtype, vlen = self.out_sig[0]
            x = np.asarray(x)
            out = np.empty((x.shape[0], vlen), dtype)
            n = self.work([x], [out])
            return out[:n]


def _sig(vlen: int):
    return [(np.complex64, int(vlen))]


class zero_padder(_Base):
    """[Nc] carrier vectors -> [Nfft] FFT-bin vectors
    (reference: zero_padder_impl.cc:63-94)."""

    def __init__(self, nc: int, nfft: int):
        _Base.__init__(self, name="mercury_zero_padder",
                       in_sig=_sig(nc), out_sig=_sig(nfft))
        self.nc, self.nfft = int(nc), int(nfft)

    def work(self, input_items, output_items):
        out = output_items[0]
        n = len(out)
        out[:] = kernels.zero_pad(np.asarray(input_items[0])[:n],
                                  self.nc, self.nfft)
        return n


class zero_depadder(_Base):
    def __init__(self, nc: int, nfft: int):
        _Base.__init__(self, name="mercury_zero_depadder",
                       in_sig=_sig(nfft), out_sig=_sig(nc))
        self.nc, self.nfft = int(nc), int(nfft)

    def work(self, input_items, output_items):
        out = output_items[0]
        n = len(out)
        out[:] = kernels.zero_depad(np.asarray(input_items[0])[:n],
                                    self.nc, self.nfft)
        return n


class gi_adder(_Base):
    """[Nfft] -> [Nfft+Ngi] cyclic prefix (gi_adder_impl.cc:72-85)."""

    def __init__(self, nfft: int, ngi: int):
        _Base.__init__(self, name="mercury_gi_adder",
                       in_sig=_sig(nfft), out_sig=_sig(nfft + ngi))
        self.nfft, self.ngi = int(nfft), int(ngi)

    def work(self, input_items, output_items):
        out = output_items[0]
        n = len(out)
        out[:] = kernels.gi_add(np.asarray(input_items[0])[:n],
                                self.nfft, self.ngi)
        return n


class gi_remover(_Base):
    def __init__(self, nfft: int, ngi: int):
        _Base.__init__(self, name="mercury_gi_remover",
                       in_sig=_sig(nfft + ngi), out_sig=_sig(nfft))
        self.nfft, self.ngi = int(nfft), int(ngi)

    def work(self, input_items, output_items):
        out = output_items[0]
        n = len(out)
        out[:] = kernels.gi_remove(np.asarray(input_items[0])[:n],
                                   self.nfft, self.ngi)
        return n


class framer(_Base):
    """[Ndata] data carriers -> [Nc*Nsymb] frame grid with the modem's own
    pilot lattice (framer_impl.cc semantics; lattice from ModeGeometry)."""

    def __init__(self, config: int, pilot_density: int | None = None):
        self.lattice = kernels.FrameLattice(config, pilot_density)
        _Base.__init__(self, name="mercury_framer",
                       in_sig=_sig(self.lattice.ndata),
                       out_sig=_sig(self.lattice.nc * self.lattice.nsymb))

    def work(self, input_items, output_items):
        out = output_items[0]
        n = len(out)
        out[:] = self.lattice.frame(np.asarray(input_items[0])[:n])
        return n


class deframer(_Base):
    def __init__(self, config: int, pilot_density: int | None = None):
        self.lattice = kernels.FrameLattice(config, pilot_density)
        _Base.__init__(self, name="mercury_deframer",
                       in_sig=_sig(self.lattice.nc * self.lattice.nsymb),
                       out_sig=_sig(self.lattice.ndata))

    def work(self, input_items, output_items):
        out = output_items[0]
        n = len(out)
        out[:] = self.lattice.deframe(np.asarray(input_items[0])[:n])
        return n
