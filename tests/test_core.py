"""Core parity tests: PRNG, mode geometry, pilot/preamble/dispersal sequences,
FIR designs, pre-equalization probe — all against reference golden vectors."""

import numpy as np
import pytest

from mercury_tpu.core.geometry import build_geometry
from mercury_tpu.core.prng import GlibcRandom

ALL_CFGS = list(range(17)) + [100, 101, 102]
OFDM_CFGS = list(range(17))


@pytest.mark.parametrize("seed", [0, 1, 42])
def test_prng_bit_exact(golden, seed):
    ref = golden(f"prng_seed{seed}")
    assert (GlibcRandom(seed).draw(2000) == ref).all()


@pytest.mark.parametrize("cfg", ALL_CFGS)
def test_geometry_scalars(golden, cfg):
    g = build_geometry(cfg, with_pre_eq=False)
    ref = golden(f"cfg{cfg}_geom")
    assert g.nc == ref[1] and g.nfft == ref[2] and g.nofdm == ref[3]
    assert g.ngi == ref[4] and g.nsymb == ref[5] and g.preamble_nsymb == ref[6]
    assert g.n_data == ref[7] and g.n_bits == ref[8]
    assert g.buffer_nsymb == ref[9] and g.interp == ref[10]
    assert g.total_frame_size == ref[11]
    assert g.n_pilots == ref[14]
    assert g.ldpc_k == ref[18] and g.ldpc_p == ref[19]
    assert g.bit_block == ref[20] and g.tf_block == ref[21]
    assert g.time_sync_nsymb == ref[26]

    params = golden(f"cfg{cfg}_params")
    assert g.bandwidth == pytest.approx(params[0])
    assert g.fs == pytest.approx(params[1])
    assert g.fc == pytest.approx(params[2])


@pytest.mark.parametrize("cfg", ALL_CFGS)
def test_frame_maps(golden, cfg):
    g = build_geometry(cfg, with_pre_eq=False)
    assert (golden(f"cfg{cfg}_frame_types") == g.frame_types).all()
    assert (golden(f"cfg{cfg}_preamble_types") == g.preamble_types).all()
    np.testing.assert_allclose(golden(f"cfg{cfg}_pilot_seq"), g.pilot_seq, atol=0)
    np.testing.assert_allclose(golden(f"cfg{cfg}_preamble_vals"), g.preamble_vals, atol=0)
    assert (golden(f"cfg{cfg}_dispersal") == g.dispersal).all()


@pytest.mark.parametrize("cfg", [0, 7, 10, 13, 16])
def test_fir_designs(golden, cfg):
    g = build_geometry(cfg, with_pre_eq=False)
    for name, mine in [("fir_rx_data", g.fir_rx_data), ("fir_rx_ts", g.fir_rx_ts),
                       ("fir_tx1", g.fir_tx1), ("fir_tx2", g.fir_tx2)]:
        ref = golden(f"cfg{cfg}_{name}")
        np.testing.assert_allclose(ref, mine, atol=1e-15)


@pytest.mark.parametrize("cfg", [0, 7, 13])
def test_pre_equalization(golden, cfg):
    g = build_geometry(cfg, with_pre_eq=True)
    ref = golden(f"cfg{cfg}_pre_eq")
    np.testing.assert_allclose(ref, g.pre_eq, rtol=1e-12, atol=1e-12)


@pytest.mark.parametrize("cfg", [100, 101, 102])
def test_mfsk_params(golden, cfg):
    g = build_geometry(cfg, with_pre_eq=False)
    geom = golden(f"cfg{cfg}_mfsk_geom")
    m = g.mfsk
    assert m.m == geom[0] and m.nbits == geom[1] and m.nstreams == geom[2]
    assert m.tone_hop_step == geom[3]
    assert g.spec.ctrl_nbits == geom[5] and g.ctrl_nsymb == geom[6]
    assert (golden(f"cfg{cfg}_mfsk_stream_offsets") == m.stream_offsets).all()
    assert (golden(f"cfg{cfg}_mfsk_preamble_tones") == m.preamble_tones[:geom[4]]).all()
    assert (golden(f"cfg{cfg}_mfsk_ack_tones") == m.ack_tones).all()
    assert (golden(f"cfg{cfg}_mfsk_break_tones") == m.break_tones).all()
