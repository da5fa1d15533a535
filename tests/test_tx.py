"""TX chain parity: payload bytes -> passband samples must match the
reference transmit_byte output (float64 round-off tolerance) for every mode,
both unfiltered (NO_FILTER_MESSAGE) and FIR-filtered (SINGLE_MESSAGE)."""

import jax.numpy as jnp
import numpy as np
import pytest

from mercury_tpu.core.geometry import build_geometry
from mercury_tpu.modem.tx import TxChain

ALL_CFGS = list(range(17)) + [100, 101, 102]


@pytest.fixture(scope="module")
def chains():
    cache = {}

    def get(cfg):
        if cfg not in cache:
            cache[cfg] = TxChain(build_geometry(cfg), real_dtype=jnp.float64)
        return cache[cfg]

    return get


@pytest.mark.parametrize("cfg", ALL_CFGS)
def test_tx_passband_parity(golden, chains, cfg):
    chain = chains(cfg)
    payload = golden(f"cfg{cfg}_payload_bytes").astype(np.uint8)
    nofilter = np.asarray(chain.transmit(payload[None], filtered=False))[0]
    single = np.asarray(chain.transmit(payload[None], filtered=True))[0]
    np.testing.assert_allclose(nofilter, golden(f"cfg{cfg}_tx_passband_nofilter"),
                               atol=5e-10)
    np.testing.assert_allclose(single, golden(f"cfg{cfg}_tx_passband_single"),
                               atol=5e-10)


def test_tx_batched_consistency(chains):
    """A batch of identical payloads must produce identical frames."""
    chain = chains(0)
    payload = np.arange(10, dtype=np.uint8)
    batch = np.tile(payload, (3, 1))
    out = np.asarray(chain.transmit(batch, filtered=True))
    assert out.shape == (3, chain.geom.total_frame_size)
    np.testing.assert_array_equal(out[0], out[1])
    np.testing.assert_array_equal(out[0], out[2])
