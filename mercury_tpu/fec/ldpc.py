"""Batched LDPC encode/decode on TPU.

Encoder: the IRA back-substitution (reference: ldpc.cc:111-132) is linear over
GF(2), so it is precompiled into a dense generator block G [P, K] and executed
as a single matmul mod 2 — MXU-friendly and exactly equivalent.

Decoder: sum-product (tanh/atanh) belief propagation, vectorized over a batch
of codewords, mirroring the reference SPA message schedule
(ldpc_decoder_SPA.cc:25-218): flooding check update with exclusive tanh
products, variable update, syndrome early-exit. Per-codeword convergence is
tracked with a mask (lockstep batch); messages of converged codewords freeze.

Message layout follows the reference: R and Q live on the *variable side* as
[N, Vw] slots; the check update gathers Q via (C, V_pos) edge indices and
scatters R back to the same slots (each edge written exactly once).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from mercury_tpu.fec.tables import LdpcCode, load_code


def encode(code: LdpcCode, info_bits: jnp.ndarray) -> jnp.ndarray:
    """info_bits [..., K] in {0,1} -> codeword [..., N]. Matmul on the MXU."""
    g = jnp.asarray(code.gen, dtype=jnp.float32)
    u = info_bits.astype(jnp.float32)
    parity = jnp.mod(u @ g.T, 2.0)
    return jnp.concatenate([info_bits.astype(jnp.int32),
                            parity.astype(jnp.int32)], axis=-1)


@functools.partial(jax.jit, static_argnames=("rate_num", "max_iter", "eta"))
def decode_gbf(llr: jnp.ndarray, rate_num: int, max_iter: int = 50,
               eta: float = 0.5):
    """Batched gradient bit-flipping decode (reference:
    ldpc_decoder_GBF.cc:25-120): per iteration, each variable accumulates
    delta = sum(2*syndrome-1) over its checks; variables with positive delta
    get their LLR pushed toward a flip by eta*delta. Much cheaper than SPA,
    used as the low-complexity alternative.
    """
    code = load_code(rate_num)
    n, p = code.n, code.p
    c_idx = jnp.asarray(np.where(code.c_idx < 0, 0, code.c_idx))
    c_mask = jnp.asarray(code.c_idx >= 0)
    llr = llr.astype(jnp.float32)
    b = llr.shape[0]

    def syndrome(bits):
        g = jnp.take(bits, c_idx, axis=1) * c_mask[None]
        return jnp.sum(g, axis=-1) % 2

    def body(state):
        llr_t, done, iters, it = state
        bits = (llr_t < 0).astype(jnp.int32)
        synd = syndrome(bits)                                  # [B, P]
        conv = jnp.all(synd == 0, axis=-1)
        # delta[v] += (2*synd[i]-1) for each check i adjacent to v
        contrib = (2 * synd - 1).astype(jnp.float32)           # [B, P]
        delta = jnp.zeros((b, n + 1), dtype=jnp.float32)
        scatter_idx = jnp.where(c_mask, c_idx, n)
        delta = delta.at[:, scatter_idx.reshape(-1)].add(
            jnp.repeat(contrib, c_idx.shape[1], axis=-1).reshape(b, -1))
        delta = delta[:, :n]
        step = (delta > 0) * (2 * (llr_t < 0) - 1) * delta * eta
        llr_new = llr_t + step
        llr_t = jnp.where((done | conv)[:, None], llr_t, llr_new)
        iters = jnp.where(conv & ~done, it, iters)
        done = done | conv
        return llr_t, done, iters, it + 1

    def cond(state):
        _l, done, _i, it = state
        return (it <= max_iter) & ~jnp.all(done)

    bits0 = (llr < 0).astype(jnp.int32)
    clean0 = jnp.all(syndrome(bits0) == 0, axis=-1)
    iters0 = jnp.where(clean0, 0, max_iter + 1)
    state = (llr, clean0, iters0, jnp.int32(1))
    llr_t, done, iters, _ = jax.lax.while_loop(cond, body, state)
    bits = (llr_t < 0).astype(jnp.int32)
    return bits, iters.astype(jnp.int32), done


# Normalized-min-sum scale per rate, calibrated at each rate's FER~0.3
# threshold against SPA on the same noise realizations (see
# tests/test_fec.py::test_minsum_ber_close_to_spa): low-rate IRA codes with
# their mostly-degree-3 checks need alpha near 1, high-rate near 0.7.
_MINSUM_ALPHA = {1: 0.95, 2: 0.925, 3: 0.9, 4: 0.85, 5: 0.75, 6: 0.75,
                 8: 0.7, 14: 0.7}


@functools.partial(jax.jit,
                   static_argnames=("rate_num", "max_iter", "algo", "beta",
                                    "alpha", "msg_dtype"))
def decode(llr: jnp.ndarray, rate_num: int, max_iter: int = 50,
           algo: str = "spa", beta: float = 0.0, alpha: float | None = None,
           msg_dtype=None):
    """Batched BP decode (SPA or offset min-sum check update).

    Args:
      llr: [B, N] float32 input LLRs (positive -> bit 0, like the reference).
      rate_num: LDPC rate numerator (rate = rate_num/16).
      max_iter: iteration cap (reference default 50).
      algo: "spa" — tanh/atanh sum-product, bit-behavior parity with the
        reference (ldpc_decoder_SPA.cc:25-218); "minsum" — normalized
        offset min-sum: R = sign_excl * clip(alpha*(min_excl - beta), 8.7).
        The min-sum update replaces the transcendental tanh/arctanh +
        exclusive cumprods with two min-reductions and a sign product —
        far less VPU work per edge (BASELINE "LDPC min-sum kernel"); costs
        ~0.2-0.4 dB vs SPA at FER~0.3 with the per-rate alpha table
        (measured in tests/test_fec.py::test_minsum_ber_close_to_spa).
      beta: min-sum offset (ignored for SPA).
      alpha: min-sum normalization; None picks the calibrated per-rate value.
      msg_dtype: storage dtype for the Q/R message tensors (None = float32).
        jnp.bfloat16 halves the HBM traffic of the edge-permutation gathers
        that bind this loop on TPU (docs/roofline_r2.md); the check/variable
        arithmetic still runs in float32 — only the carried state and the
        gathered operands are narrowed. BER impact is measured in
        tests/test_fec.py::test_bf16_messages_ber_close.

    Returns:
      bits [B, N] int32 hard decisions, iters [B] int32 (0 = clean on arrival,
      max_iter+1 = no convergence), ok [B] bool (syndrome satisfied).
    """
    code = load_code(rate_num)
    n, p, cw, vw = code.n, code.p, code.cw, code.vw
    if alpha is None:
        alpha = _MINSUM_ALPHA.get(rate_num, 0.75)

    c_idx = jnp.asarray(np.where(code.c_idx < 0, 0, code.c_idx))
    c_mask = jnp.asarray(code.c_idx >= 0)
    v_mask = jnp.asarray(code.v_idx >= 0)                      # [N, Vw]
    # flat index of each check edge into the variable-side [N*Vw] slots
    vpos = np.where(code.v_pos < 0, 0, code.v_pos)
    edge_flat_np = np.where(code.c_idx >= 0,
                            code.c_idx * vw + vpos, n * vw)
    edge_flat = jnp.asarray(edge_flat_np)                      # [P, Cw]
    # variable-side gather map: for edge (v, k) with check i = V[v,k], the
    # slot c of v within C[i] — so R_var[v,k] = R_check[i, c] is a gather
    # instead of a scatter (cheaper on both VPU and CPU)
    c_slot = np.zeros((n, vw), dtype=np.int64)
    ci, cc = np.nonzero(code.c_idx >= 0)
    # invert (check, slot) -> variable edge: for each check edge, record its
    # slot at the variable side position
    var_of_edge = code.c_idx[ci, cc]
    vpos_of_edge = code.v_pos[ci, cc]
    c_slot[var_of_edge, vpos_of_edge] = ci * cw + cc
    var_edge_flat = jnp.asarray(
        np.where(code.v_idx >= 0, c_slot, p * cw))             # [N, Vw]

    llr = llr.astype(jnp.float32)
    mdt = jnp.float32 if msg_dtype is None else msg_dtype
    b = llr.shape[0]

    def syndrome(bits):
        g = jnp.take(bits, c_idx, axis=1) * c_mask[None]       # [B, P, Cw]
        return jnp.sum(g, axis=-1) % 2                          # [B, P]

    bits0 = (llr < 0).astype(jnp.int32)
    clean0 = jnp.all(syndrome(bits0) == 0, axis=-1)            # [B]

    q0 = jnp.where(v_mask[None], llr[:, :, None], 0.0).astype(mdt)  # [B, N, Vw]

    def body(state):
        q, llr_tot, done, iters, it = state
        qf = q.reshape(b, n * vw)
        qe = jnp.take(qf, edge_flat.reshape(-1), axis=1
                      ).reshape(b, p, cw).astype(jnp.float32)
        if algo == "minsum":
            # offset min-sum: R = sign_excl * max(min_excl - beta, 0).
            # Exclusive min via (min1, min2, first-occurrence-of-min mask);
            # exclusive sign via the total sign product times the edge's own
            # sign (sign in {+-1}). Deliberately argmin- and inf-free: an
            # argmin over an inf-masked [B, P, Cw] inside this while_loop
            # SIGSEGVs the TPU compiler for B > 1 (reproduced on v5e), and
            # the big-finite sentinel gives identical results since the
            # message clamp below caps at 8.7 anyway. The eq-mask form is
            # also tie-robust (a tied-min edge keeps min1 as its exclusive
            # min, which is exactly right).
            big = jnp.float32(3.0e38)
            absq = jnp.where(c_mask[None], jnp.abs(qe), big)
            min1 = jnp.min(absq, axis=-1, keepdims=True)        # [B, P, 1]
            eq = absq == min1
            is_min = eq & (jnp.cumsum(eq.astype(jnp.int32), axis=-1) == 1)
            min2 = jnp.min(jnp.where(is_min, big, absq), axis=-1,
                           keepdims=True)
            excl_min = jnp.where(is_min, min2, min1)
            # clamp to the SPA's effective arctanh bound (±8.7): without it
            # min-sum messages grow without bound through graph cycles and
            # the duplicated virtual-bit structure, and the decoder diverges
            excl_min = jnp.clip(alpha * jnp.maximum(excl_min - beta, 0.0),
                                0.0, 8.7)
            # exclusive sign via integer bit parity: sign_excl[j] =
            # (-1)^(parity of negative edges excluding j). Sign bits are
            # exact in int32, and this sidesteps a float sign product —
            # jnp.prod over the [B, P, Cw] sign tensor SIGSEGVs the TPU
            # compiler inside this while_loop (reproduced on v5e; the
            # parity form compiles everywhere and is cheaper anyway)
            sbit = (c_mask[None] & (qe < 0)).astype(jnp.int32)
            par = jnp.sum(sbit, axis=-1, keepdims=True)         # [B, P, 1]
            sign_excl = (1 - 2 * ((par - sbit) & 1)).astype(llr.dtype)
            r_vals = jnp.where(c_mask[None], sign_excl * excl_min, 0.0)
        else:
            t = jnp.where(c_mask[None], jnp.tanh(0.5 * qe), 1.0)
            # exclusive product via forward/backward cumulative products
            fwd = jnp.concatenate([jnp.ones((b, p, 1), llr.dtype), jnp.cumprod(t, axis=-1)[..., :-1]], axis=-1)
            bwd_in = jnp.flip(t, axis=-1)
            bwd = jnp.concatenate([jnp.ones((b, p, 1), llr.dtype), jnp.cumprod(bwd_in, axis=-1)[..., :-1]], axis=-1)
            bwd = jnp.flip(bwd, axis=-1)
            prod_excl = jnp.clip(fwd * bwd, -0.9999999, 0.9999999)
            r_vals = 2.0 * jnp.arctanh(prod_excl)               # [B, P, Cw]
        # redistribute check messages to the variable side: gather via the
        # inverse edge map on TPU (scatters are slow there), scatter on CPU
        # (measured faster on host)
        if jax.default_backend() == "cpu":
            r_flat = jnp.zeros((b, n * vw + 1), dtype=mdt)
            r_flat = r_flat.at[:, edge_flat.reshape(-1)].set(
                r_vals.reshape(b, -1).astype(mdt))
            r_new = r_flat[:, : n * vw].reshape(b, n, vw).astype(jnp.float32)
        else:
            r_pad = jnp.concatenate(
                [r_vals.reshape(b, -1), jnp.zeros((b, 1), llr.dtype)],
                axis=-1).astype(mdt)
            r_new = jnp.take(r_pad, var_edge_flat.reshape(-1),
                             axis=1).reshape(b, n, vw).astype(jnp.float32)
        llr_new = llr + jnp.sum(jnp.where(v_mask[None], r_new, 0.0), axis=-1)
        bits = (llr_new < 0).astype(jnp.int32)
        conv = jnp.all(syndrome(bits) == 0, axis=-1)
        q_new = jnp.where(v_mask[None], llr_new[:, :, None] - r_new,
                          0.0).astype(mdt)
        # freeze converged/done codewords
        keep = done[:, None, None]
        q = jnp.where(keep, q, q_new)
        llr_tot = jnp.where(done[:, None], llr_tot, llr_new)
        iters = jnp.where(conv & ~done, it + 1, iters)
        done = done | conv
        return q, llr_tot, done, iters, it + 1

    def cond(state):
        _q, _l, done, _i, it = state
        return (it < max_iter) & ~jnp.all(done)

    iters0 = jnp.where(clean0, 0, max_iter + 1)
    state = (q0, llr, clean0, iters0, jnp.int32(0))
    q, llr_tot, done, iters, _ = jax.lax.while_loop(cond, body, state)

    bits = (llr_tot < 0).astype(jnp.int32)
    return bits, iters.astype(jnp.int32), done
