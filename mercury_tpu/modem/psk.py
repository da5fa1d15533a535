"""PSK/QAM mapping and max-log soft demapping (reference: psk.cc:259-326)."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def mod(bits: jnp.ndarray, constellation: jnp.ndarray) -> jnp.ndarray:
    """bits [..., n*log2M] {0,1} -> symbols [..., n]. MSB-first grouping."""
    m = constellation.shape[0]
    nbits = int(np.log2(m))
    groups = bits.reshape(*bits.shape[:-1], -1, nbits)
    powers = jnp.asarray(2 ** np.arange(nbits)[::-1].copy(), dtype=jnp.int32)
    idx = jnp.sum(groups.astype(jnp.int32) * powers, axis=-1)
    return jnp.take(constellation, idx, axis=0)


def demod(symbols: jnp.ndarray, constellation: jnp.ndarray,
          variance: jnp.ndarray) -> jnp.ndarray:
    """Max-log LLRs, scaled by 1/variance (reference: psk.cc:278-326).

    symbols: [..., n]; variance: broadcastable to [..., 1] (per-frame scalar).
    Returns LLRs [..., n*log2M] with the reference's ordering: output bit j of
    a symbol corresponds to constellation index bit (log2M-1-j), i.e. MSB
    first — identical to the TX grouping.
    """
    m = constellation.shape[0]
    nbits = int(np.log2(m))
    d = jnp.abs(symbols[..., None] - constellation) ** 2      # [..., n, M]
    idx = np.arange(m)
    llrs = []
    for k in range(nbits):            # k = mask bit position (LSB..MSB)
        mask = (idx >> k) & 1
        d0 = jnp.min(jnp.where(jnp.asarray(mask == 0), d, jnp.inf), axis=-1)
        d1 = jnp.min(jnp.where(jnp.asarray(mask == 1), d, jnp.inf), axis=-1)
        llrs.append(d1 - d0)
    # reference emits LLR[nBits-1-j]: bit order MSB-first
    llr = jnp.stack(llrs[::-1], axis=-1)                      # [..., n, nbits]
    variance = jnp.asarray(variance)
    inv_var = jnp.reshape(1.0 / variance, variance.shape + (1,) * (llr.ndim - variance.ndim))
    llr = llr * inv_var
    return llr.reshape(*symbols.shape[:-1], -1)


def demod_full(symbols: jnp.ndarray, constellation: jnp.ndarray,
               variance: jnp.ndarray,
               la: jnp.ndarray | None = None) -> jnp.ndarray:
    """Full log-MAP demapping with optional per-bit priors (BICM-ID).

    Proper marginalization over the constellation (log-sum-exp instead of
    the max-log min-distance of demod()), with the decoder's extrinsic
    LLRs folded in as symbol priors — the demapper-decoder iteration the
    reference's chain has no counterpart for (psk.cc:278-326 is one-shot
    max-log). Sign convention matches demod(): LLR = log P(bit=0)/P(bit=1).

    symbols: [..., n]; variance broadcastable per frame; la: per-bit priors
    [..., n, log2M] MSB-first (same order as the output) or None.
    Returns [..., n*log2M]: EXTRINSIC LLRs (la subtracted) when la is
    given, full LLRs otherwise.
    """
    m = constellation.shape[0]
    nbits = int(np.log2(m))
    d = jnp.abs(symbols[..., None] - constellation) ** 2      # [..., n, M]
    variance = jnp.asarray(variance)
    inv_var = jnp.reshape(1.0 / variance,
                          variance.shape + (1,) * (d.ndim - 1 - variance.ndim))
    s = -d * inv_var[..., None]
    idx = np.arange(m)
    # bit_tab[k, j]: bit j (MSB-first) of constellation index k
    bit_tab = ((idx[:, None] >> (nbits - 1 - np.arange(nbits))[None, :])
               & 1).astype(np.float32)                        # [M, nbits]
    if la is not None:
        # symmetric prior score: +la/2 where bit=0, -la/2 where bit=1
        s = s + jnp.einsum("...nj,kj->...nk", la,
                           jnp.asarray(0.5 - bit_tab))
    llrs = []
    for j in range(nbits):
        mask = bit_tab[:, j] == 0
        s0 = jax.nn.logsumexp(jnp.where(jnp.asarray(mask), s, -jnp.inf),
                              axis=-1)
        s1 = jax.nn.logsumexp(jnp.where(jnp.asarray(~mask), s, -jnp.inf),
                              axis=-1)
        llrs.append(s0 - s1)
    llr = jnp.stack(llrs, axis=-1)                            # [..., n, nbits]
    if la is not None:
        llr = llr - la
    return llr.reshape(*symbols.shape[:-1], -1)
