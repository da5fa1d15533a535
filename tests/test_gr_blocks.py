"""gr-mercury OOT block tests: per-item kernel parity against the modem's
own ops, round-trips, and the GR work() contract (reference module:
tests/gr-hermes_ofdm/lib/*_impl.cc)."""

import numpy as np
import pytest

from gr_mercury import blocks
from gr_mercury.kernels import FrameLattice, gi_add, zero_pad

from mercury_tpu.core.geometry import build_geometry
from mercury_tpu.dsp import ops


@pytest.fixture(scope="module")
def geom():
    return build_geometry(1, with_pre_eq=False)


def test_zero_pad_matches_modem_pad_map(geom):
    """zero_pad's bin layout must equal the modem's pad_map scatter."""
    rng = np.random.default_rng(0)
    x = (rng.standard_normal((3, geom.nc))
         + 1j * rng.standard_normal((3, geom.nc))).astype(np.complex64)
    padded = zero_pad(x, geom.nc, geom.nfft)
    via_map = np.zeros((3, geom.nfft), np.complex64)
    via_map[:, np.asarray(geom.pad_map)] = x
    np.testing.assert_allclose(padded, via_map, rtol=0, atol=0)


def test_pad_gi_roundtrip(geom):
    rng = np.random.default_rng(1)
    x = (rng.standard_normal((4, geom.nc))
         + 1j * rng.standard_normal((4, geom.nc))).astype(np.complex64)
    pad = blocks.zero_padder(geom.nc, geom.nfft)
    depad = blocks.zero_depadder(geom.nc, geom.nfft)
    gia = blocks.gi_adder(geom.nfft, geom.ngi)
    gir = blocks.gi_remover(geom.nfft, geom.ngi)
    y = gir(gia(pad(x)))
    np.testing.assert_allclose(depad(y), x)
    # cyclic-prefix property: first Ngi samples == last Ngi samples
    td = gia(pad(x))
    np.testing.assert_allclose(td[:, :geom.ngi], td[:, -geom.ngi:])


def test_gi_matches_ofdm_mod(geom):
    """zero_pad + IFFT + gi_add == the modem's ofdm_mod for one symbol."""
    rng = np.random.default_rng(2)
    x = (rng.standard_normal((2, geom.nc))
         + 1j * rng.standard_normal((2, geom.nc))).astype(np.complex64)
    # modem convention: unnormalized IFFT (ofdm.cc:375-376 parity)
    td = np.fft.ifft(zero_pad(x, geom.nc, geom.nfft), axis=-1) * geom.nfft
    ours = gi_add(td, geom.nfft, geom.ngi)
    theirs = np.asarray(ops.ofdm_mod(x[:, None, :], geom.pad_map,
                                     geom.nfft, geom.ngi))
    np.testing.assert_allclose(ours, theirs.reshape(ours.shape), atol=1e-4)


def test_framer_lattice_is_modems(geom):
    lat = FrameLattice(1)
    rng = np.random.default_rng(3)
    x = (rng.standard_normal((2, lat.ndata))
         + 1j * rng.standard_normal((2, lat.ndata))).astype(np.complex64)
    grid = lat.frame(x)
    # pilots land on the geometry's pilot cells with the boosted sequence
    np.testing.assert_allclose(
        grid[:, np.asarray(geom.pilot_cells)],
        np.broadcast_to(np.asarray(geom.pilot_seq), (2, geom.n_pilots)))
    # deframe inverts
    np.testing.assert_allclose(lat.deframe(grid), x)
    # framer block counts match the reference's nData==Ndata invariant
    assert lat.ndata == len(geom.data_cells)


def test_work_contract():
    """The GR work(input_items, output_items) contract (what the gnuradio
    scheduler calls when HAVE_GNURADIO)."""
    pad = blocks.zero_padder(8, 16)
    x = np.arange(16, dtype=np.complex64).reshape(2, 8)
    out = np.zeros((2, 16), np.complex64)
    n = pad.work([x], [out])
    assert n == 2
    assert (out[:, 0] == 0).all()            # DC null (start_shift=1)
    assert (out[:, 1] == x[:, 4]).all()      # positive half from bin 1
    assert (out[:, -4:] == x[:, :4]).all()   # negative half at the top


def test_grc_yaml_files_present():
    import os
    here = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "gr_mercury", "grc")
    files = sorted(os.listdir(here))
    assert [f for f in files if f.endswith(".block.yml")] == [
        "mercury_deframer.block.yml", "mercury_framer.block.yml",
        "mercury_gi_adder.block.yml", "mercury_gi_remover.block.yml",
        "mercury_zero_depadder.block.yml", "mercury_zero_padder.block.yml"]
