"""FEC parity tests: LDPC encode bit-exactness per rate, SPA decode
correction behaviour, interleaver/dispersal round trips."""

import jax.numpy as jnp
import numpy as np
import pytest

from mercury_tpu.core.geometry import build_geometry, interleaver_perm
from mercury_tpu.fec import ldpc
from mercury_tpu.fec.tables import load_code

CFG_RATE = {0: 1, 1: 2, 2: 3, 3: 4, 4: 5, 5: 6, 6: 8, 9: 8, 12: 14, 15: 14}


@pytest.mark.parametrize("cfg,rate", sorted(CFG_RATE.items()))
def test_ldpc_encode_bit_exact(golden, cfg, rate):
    code = load_code(rate)
    bits_in = golden(f"cfg{cfg}_ldpc_in")
    enc_ref = golden(f"cfg{cfg}_ldpc_enc")
    enc = ldpc.encode(code, jnp.asarray(bits_in)[None])[0]
    assert (np.asarray(enc) == enc_ref).all()


@pytest.mark.parametrize("rate", [1, 4, 8, 14])
def test_spa_decode_corrects_noise(rate):
    code = load_code(rate)
    rng = np.random.default_rng(7)
    u = rng.integers(0, 2, (8, code.k))
    cw = np.asarray(ldpc.encode(code, jnp.asarray(u)))
    # noise level scaled per rate: low-rate codes tolerate much more
    sigma = {1: 1.5, 4: 1.0, 8: 0.75, 14: 0.45}[rate]
    y = (1 - 2 * cw) + sigma * rng.standard_normal(cw.shape)
    llr = (2 / sigma ** 2 * y).astype(np.float32)
    bits, iters, ok = ldpc.decode(jnp.asarray(llr), rate)
    assert np.asarray(ok).all()
    assert (np.asarray(bits)[:, :code.k] == u).all()


@pytest.mark.parametrize("rate", [1, 4, 8, 14])
def test_minsum_decode_corrects_noise(rate):
    """Offset min-sum corrects the same noise levels the SPA test uses."""
    code = load_code(rate)
    rng = np.random.default_rng(7)
    u = rng.integers(0, 2, (8, code.k))
    cw = np.asarray(ldpc.encode(code, jnp.asarray(u)))
    sigma = {1: 1.5, 4: 1.0, 8: 0.75, 14: 0.45}[rate]
    y = (1 - 2 * cw) + sigma * rng.standard_normal(cw.shape)
    llr = (2 / sigma ** 2 * y).astype(np.float32)
    bits, iters, ok = ldpc.decode(jnp.asarray(llr), rate, algo="minsum")
    assert np.asarray(ok).all()
    assert (np.asarray(bits)[:, :code.k] == u).all()


def test_minsum_ber_close_to_spa():
    """At a near-threshold noise level, offset min-sum frame errors stay
    within ~2x of SPA (the documented ~0.1-0.2 dB penalty), on the same
    noise realizations."""
    code = load_code(8)
    rng = np.random.default_rng(11)
    b = 64
    u = rng.integers(0, 2, (b, code.k))
    cw = np.asarray(ldpc.encode(code, jnp.asarray(u)))
    sigma = 0.87
    y = (1 - 2 * cw) + sigma * rng.standard_normal(cw.shape)
    llr = (2 / sigma ** 2 * y).astype(np.float32)
    bits_s, _i, _ok = ldpc.decode(jnp.asarray(llr), 8)
    bits_m, _i, _ok = ldpc.decode(jnp.asarray(llr), 8, algo="minsum")
    fe_spa = int(((np.asarray(bits_s)[:, :code.k] != u).sum(-1) > 0).sum())
    fe_ms = int(((np.asarray(bits_m)[:, :code.k] != u).sum(-1) > 0).sum())
    assert 0 < fe_spa < b          # the point is genuinely near threshold
    assert fe_ms <= max(2 * fe_spa, fe_spa + 4)


def test_spa_decode_clean_zero_iters():
    code = load_code(1)
    u = np.ones((2, code.k), dtype=np.int64)
    cw = np.asarray(ldpc.encode(code, jnp.asarray(u)))
    llr = (1 - 2 * cw).astype(np.float32) * 10
    _bits, iters, ok = ldpc.decode(jnp.asarray(llr), 1)
    assert np.asarray(ok).all() and (np.asarray(iters) == 0).all()


def test_interleaver_roundtrip():
    g = build_geometry(0, with_pre_eq=False)
    x = np.arange(g.n_bits)
    inter = x[g.bit_perm]
    deinter = inter[g.bit_iperm]
    assert (deinter == x).all()
    # reference semantics: out[j*nBlocks+i] = in[i*block+j]
    block = g.bit_block
    nblocks = g.n_bits // block
    ref = np.empty_like(x)
    for i in range(nblocks):
        for j in range(block):
            ref[j * nblocks + i] = x[i * block + j]
    ref[nblocks * block:] = x[nblocks * block:]
    assert (inter == ref).all()


def test_bf16_messages_ber_close():
    """bf16 message storage (the TPU bandwidth option) stays within ~2x of
    f32 min-sum frame errors at a near-threshold noise level, on the same
    noise realizations."""
    import jax.numpy as jnp

    code = load_code(8)
    rng = np.random.default_rng(13)
    b = 64
    u = rng.integers(0, 2, (b, code.k))
    cw = np.asarray(ldpc.encode(code, jnp.asarray(u)))
    sigma = 0.87
    y = (1 - 2 * cw) + sigma * rng.standard_normal(cw.shape)
    llr = (2 / sigma ** 2 * y).astype(np.float32)
    _b32, _i, ok32 = ldpc.decode(jnp.asarray(llr), 8, algo="minsum")
    _b16, _i, ok16 = ldpc.decode(jnp.asarray(llr), 8, algo="minsum",
                                 msg_dtype=jnp.bfloat16)
    fe32 = int((~np.asarray(ok32)).sum())
    fe16 = int((~np.asarray(ok16)).sum())
    assert fe16 <= max(2 * fe32, fe32 + 3), (fe32, fe16)
    # and at a comfortable SNR it corrects everything, bit-exactly
    y2 = (1 - 2 * cw) + 0.6 * rng.standard_normal(cw.shape)
    llr2 = (2 / 0.36 * y2).astype(np.float32)
    bits, _i, ok = ldpc.decode(jnp.asarray(llr2), 8, algo="minsum",
                               msg_dtype=jnp.bfloat16)
    assert np.asarray(ok).all()
    assert (np.asarray(bits)[:, :code.k] == u).all()
