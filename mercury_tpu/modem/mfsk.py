"""Non-coherent MFSK modulation for the ROBUST modes (reference: mfsk.cc).

One-hot tone placement over OFDM subcarriers with coprime tone hopping,
Gray bit mapping, and energy-detection soft demod with out-of-band noise
estimation and LLR clamping at ±5.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from mercury_tpu.core.geometry import MfskParams


def _gray_decode_matrix(nbits: int) -> np.ndarray:
    """index-from-bits helper: bits (MSB first) -> gray-decoded tone index."""
    m = 1 << nbits
    idx = np.arange(m)
    # gray -> binary: b = g ^ (g>>1) ^ (g>>2) ...
    b = idx.copy()
    for shift in range(1, nbits):
        b ^= idx >> shift
    return b


def mod(bits: jnp.ndarray, p: MfskParams, nc: int, nsymb: int,
        dtype=jnp.complex64) -> jnp.ndarray:
    """bits [..., nsymb*nstreams*nbits] -> carrier grid [..., nsymb, nc].

    Reference: cl_mfsk::mod (mfsk.cc:251-302). Amplitude sqrt(Nc/nStreams)
    on the active tone of each stream; tone hopping (idx + s*hop) % M.
    """
    amp = float(np.sqrt(nc / p.nstreams))  # python float: keeps grid dtype
    bps = p.nbits * p.nstreams
    groups = bits.reshape(*bits.shape[:-1], nsymb, p.nstreams, p.nbits)
    powers = jnp.asarray(2 ** np.arange(p.nbits)[::-1].copy(), dtype=jnp.int32)
    raw_idx = jnp.sum(groups.astype(jnp.int32) * powers, axis=-1)  # [..., S, st]
    gray = jnp.asarray(_gray_decode_matrix(p.nbits), dtype=jnp.int32)
    tone = jnp.take(gray, raw_idx, axis=0)
    hop = (np.arange(nsymb) * p.tone_hop_step) % p.m
    actual = (tone + jnp.asarray(hop, dtype=jnp.int32)[:, None]) % p.m
    grid = jnp.zeros((*bits.shape[:-1], nsymb, nc), dtype=dtype)
    for st in range(p.nstreams):
        oh = (actual[..., st, None] == jnp.arange(p.m)).astype(grid.dtype) * amp
        off = int(p.stream_offsets[st])
        grid = grid.at[..., off:off + p.m].add(oh)
    return grid


def preamble_grid(p: MfskParams, nc: int, pre_nsymb: int) -> np.ndarray:
    """Known preamble tones, same tone in every stream (mfsk.cc:172-193)."""
    amp = np.sqrt(nc / p.nstreams)
    grid = np.zeros((pre_nsymb, nc), dtype=np.complex128)
    for s in range(pre_nsymb):
        tone = int(p.preamble_tones[s % len(p.preamble_tones)])
        for st in range(p.nstreams):
            grid[s, int(p.stream_offsets[st]) + tone] = amp
    return grid


def pattern_grid(p: MfskParams, nc: int, tones: np.ndarray) -> np.ndarray:
    """ACK/BREAK tone pattern: 16 symbols with hopping (mfsk.cc:196-247)."""
    amp = np.sqrt(nc / p.nstreams)
    nsymb = p.ack_pattern_nsymb
    grid = np.zeros((nsymb, nc), dtype=np.complex128)
    for s in range(nsymb):
        base = int(tones[s % len(tones)])
        actual = (base + s * p.tone_hop_step) % p.m
        for st in range(p.nstreams):
            grid[s, int(p.stream_offsets[st]) + actual] = amp
    return grid


def demod(fft_grid: jnp.ndarray, p: MfskParams, nc: int, nsymb: int,
          soft: str = "maxlog", exp_scale: float = 1.0,
          clamp: float = 5.0, noise_pool: bool = False) -> jnp.ndarray:
    """Energy-detection soft demod -> LLRs [..., nsymb*nstreams*nbits].

    Reference: cl_mfsk::demod (mfsk.cc:305-390): noise variance from bins
    outside all stream bands, per-bit max-log over tone energies, scale
    1/(2*sigma^2), clamp ±5. fft_grid: [..., nsymb, nc].

    soft="sumexp" replaces the max-log tone arbitration with the proper
    noncoherent marginalization LLR_k = LSE_{m:bit=0}(c*E_m) -
    LSE_{m:bit=1}(c*E_m) (log-sum-exp over the 2^(nbits-1) tones on each
    side) — at M=32 / rate 1/16 the max over 16 near-threshold energies
    throws away real evidence; the marginalized form recovers ~0.5 dB at
    the ROBUST_0 waterfall (docs/ladder_floor_r4.md) and is the RX-side
    improvement the documented -13 dB threshold actually requires
    (the reference build itself only reaches -12.5 with max-log).
    """
    energy = jnp.abs(fft_grid) ** 2                            # [..., S, Nc]
    band_start = int(p.stream_offsets[0])
    band_end = int(p.stream_offsets[-1]) + p.m
    k = np.arange(nc)
    noise_mask_np = (k < band_start) | (k >= band_end)
    n_noise = int(noise_mask_np.sum())
    noise_mask = jnp.asarray(noise_mask_np)
    if n_noise > 0:
        noise_var = jnp.sum(jnp.where(noise_mask, energy, 0.0), axis=-1) / n_noise
    else:
        noise_var = jnp.full(energy.shape[:-1], 1e-30, energy.dtype)
    if noise_pool:
        # frame-pooled noise estimate: the per-symbol estimate averages
        # only ~Nc-M out-of-band bins (high-variance at 18 bins for
        # ROBUST_0); the channel noise floor is stationary across one
        # frame, so pooling over the symbol axis cuts the estimator
        # variance ~nsymb-fold without losing anything the per-symbol
        # estimate could track
        noise_var = jnp.mean(noise_var, axis=-1, keepdims=True)
        noise_var = jnp.broadcast_to(noise_var,
                                     (*noise_var.shape[:-1], nsymb))
    noise_var = jnp.maximum(noise_var, 1e-30)
    llr_scale = np.float32(exp_scale) / (2.0 * noise_var)      # [..., S]

    hop = (np.arange(nsymb) * p.tone_hop_step) % p.m
    gray_of = np.arange(p.m) ^ (np.arange(p.m) >> 1)           # TX gray mapping
    llr_streams = []
    for st in range(p.nstreams):
        off = int(p.stream_offsets[st])
        e_raw = energy[..., off:off + p.m]                     # [..., S, M]
        # reverse hopping: E[data_tone m] = E_raw[(m + hop) % M]
        gather = (np.arange(p.m)[None, :] + hop[:, None]) % p.m  # [S, M]
        e = jnp.take_along_axis(
            e_raw, jnp.broadcast_to(jnp.asarray(gather), e_raw.shape), axis=-1)
        bit_llrs = []
        for kbit in range(p.nbits):
            mask = (gray_of >> (p.nbits - 1 - kbit)) & 1
            if soft == "sumexp":
                # same likelihood exponent as the reference's max-log scale
                # (E/(2*sigma^2)), marginalized instead of maximized
                ce = e * llr_scale[..., None]
                l1 = jax.scipy.special.logsumexp(
                    jnp.where(jnp.asarray(mask == 1), ce, -jnp.inf), axis=-1)
                l0 = jax.scipy.special.logsumexp(
                    jnp.where(jnp.asarray(mask == 0), ce, -jnp.inf), axis=-1)
                bit_llrs.append(l0 - l1)
            else:
                e1 = jnp.max(jnp.where(jnp.asarray(mask == 1), e, -jnp.inf),
                             axis=-1)
                e0 = jnp.max(jnp.where(jnp.asarray(mask == 0), e, -jnp.inf),
                             axis=-1)
                bit_llrs.append((e0 - e1) * llr_scale)
        llr_streams.append(jnp.stack(bit_llrs, axis=-1))       # [..., S, nbits]
    llr = jnp.stack(llr_streams, axis=-2)                      # [..., S, st, nbits]
    llr = jnp.clip(llr, -float(clamp), float(clamp))
    return llr.reshape(*fft_grid.shape[:-2], -1)
