"""Core parity tests: PRNG, mode geometry, pilot/preamble/dispersal sequences,
FIR designs, pre-equalization probe — all against reference golden vectors."""

import numpy as np
import pytest

from mercury_tpu.core.geometry import build_geometry
from mercury_tpu.core.modes import HIGH_DENSITY, LOW_DENSITY
from mercury_tpu.core.prng import GlibcRandom

ALL_CFGS = list(range(17)) + [100, 101, 102]
OFDM_CFGS = list(range(17))
# both pilot densities, tagged as in the golden store (cfgN / cfgNld)
CFG_DENS = [(c, HIGH_DENSITY) for c in ALL_CFGS] + \
           [(c, LOW_DENSITY) for c in ALL_CFGS]


def tag(cfg, density):
    return f"cfg{cfg}ld" if density == LOW_DENSITY else f"cfg{cfg}"


@pytest.mark.parametrize("seed", [0, 1, 42])
def test_prng_bit_exact(golden, seed):
    ref = golden(f"prng_seed{seed}")
    assert (GlibcRandom(seed).draw(2000) == ref).all()


@pytest.mark.parametrize("cfg,density", CFG_DENS)
def test_geometry_scalars(golden, cfg, density):
    g = build_geometry(cfg, density, with_pre_eq=False)
    ref = golden(f"{tag(cfg, density)}_geom")
    assert g.nc == ref[1] and g.nfft == ref[2] and g.nofdm == ref[3]
    assert g.ngi == ref[4] and g.nsymb == ref[5] and g.preamble_nsymb == ref[6]
    assert g.n_data == ref[7] and g.n_bits == ref[8]
    assert g.buffer_nsymb == ref[9] and g.interp == ref[10]
    assert g.total_frame_size == ref[11]
    assert g.n_pilots == ref[14]
    assert g.ldpc_k == ref[18] and g.ldpc_p == ref[19]
    assert g.bit_block == ref[20] and g.tf_block == ref[21]
    assert g.time_sync_nsymb == ref[26]

    params = golden(f"{tag(cfg, density)}_params")
    assert g.bandwidth == pytest.approx(params[0])
    assert g.fs == pytest.approx(params[1])
    assert g.fc == pytest.approx(params[2])
    # rate/duration parameters (reference calculate_parameters)
    assert g.ldpc_real_cr == pytest.approx(params[4], rel=1e-12)
    assert g.tf_seconds == pytest.approx(params[7], rel=1e-12)
    assert g.rb == pytest.approx(params[8], rel=1e-12)
    assert g.rbc == pytest.approx(params[9], rel=1e-12)


# documented per-density net bitrates (reference common_defines.h:150-189)
_BPS_HIGH = [71.3, 156.1, 241.0, 325.8, 410.6, 495.5, 665.2, 762.6, 920.2,
             1235.3, 1353.7, 1818.1, 2261.4, 2470.6, 3389.7, 4361.3, 5664.7]
_BPS_LOW = [84.2, 184.5, 284.8, 385.0, 485.3, 585.6, 786.1, 889.7, 1073.5,
            1441.2, 1353.7, 1818.1, 2654.7, 2882.4, 3389.7, 5088.2, 5664.7]


@pytest.mark.parametrize("density,table", [(HIGH_DENSITY, _BPS_HIGH),
                                           (LOW_DENSITY, _BPS_LOW)])
def test_documented_bitrates(density, table):
    """Net bitrates per config match the documented per-density tables
    (common_defines.h:150-189) to their printed precision."""
    for cfg in OFDM_CFGS:
        g = build_geometry(cfg, density, with_pre_eq=False)
        assert g.rbc == pytest.approx(table[cfg], abs=0.05), (cfg, density)


@pytest.mark.parametrize("cfg,density", CFG_DENS)
def test_frame_maps(golden, cfg, density):
    g = build_geometry(cfg, density, with_pre_eq=False)
    t = tag(cfg, density)
    assert (golden(f"{t}_frame_types") == g.frame_types).all()
    assert (golden(f"{t}_preamble_types") == g.preamble_types).all()
    np.testing.assert_allclose(golden(f"{t}_pilot_seq"), g.pilot_seq, atol=0)
    np.testing.assert_allclose(golden(f"{t}_preamble_vals"), g.preamble_vals, atol=0)
    assert (golden(f"{t}_dispersal") == g.dispersal).all()


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
