"""Layout experiment: batch-minor ([edges, B]) LDPC BP vs the production
batch-major ([B, edges]) formulation, timed on the real chip.

Hypothesis (docs/roofline_r2.md): the BP loop is bound by gather
*element-issue* rate, not HBM bytes (bf16 messages moved wall time ~3%).
If true, a layout with the batch as the contiguous minor dimension should
be far faster: a row gather of [E', B] issues E' addresses for E'*B
elements (256x fewer addresses per element at B=256), and every vector
op runs at full 128-lane occupancy instead of Cw/128.

Run: python tools/ldpc_layout_exp.py [rate_num] [batch] [iters]
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from mercury_tpu.fec.tables import load_code
from mercury_tpu.fec import ldpc


def build_transposed(rate_num: int, max_iter: int, algo: str = "spa"):
    code = load_code(rate_num)
    n, p, cw, vw = code.n, code.p, code.cw, code.vw
    alpha = ldpc._MINSUM_ALPHA.get(rate_num, 0.75)

    c_idx_np = np.where(code.c_idx < 0, 0, code.c_idx)
    c_mask = jnp.asarray(code.c_idx >= 0)                       # [P, Cw]
    v_mask = jnp.asarray(code.v_idx >= 0)                       # [N, Vw]
    vpos = np.where(code.v_pos < 0, 0, code.v_pos)
    edge_flat = jnp.asarray(np.where(code.c_idx >= 0,
                                     code.c_idx * vw + vpos, n * vw))  # [P,Cw]
    c_slot = np.zeros((n, vw), dtype=np.int64)
    ci, cc = np.nonzero(code.c_idx >= 0)
    c_slot[code.c_idx[ci, cc], code.v_pos[ci, cc]] = ci * cw + cc
    var_edge_flat = jnp.asarray(
        np.where(code.v_idx >= 0, c_slot, p * cw))              # [N, Vw]
    c_idx_flat = jnp.asarray(c_idx_np)                          # [P, Cw]

    @functools.partial(jax.jit, static_argnames=())
    def decode_t(llr):
        """llr [B, N] -> bits [B, N], iters [B], ok [B]. Internally [*, B]."""
        b = llr.shape[0]
        llr_t = llr.astype(jnp.float32).T                       # [N, B]

        def syndrome_t(bits_t):                                 # bits_t [N,B]
            g = jnp.take(bits_t, c_idx_flat.reshape(-1), axis=0
                         ).reshape(p, cw, b) * c_mask[:, :, None]
            return jnp.sum(g, axis=1) % 2                       # [P, B]

        bits0 = (llr_t < 0).astype(jnp.int32)
        clean0 = jnp.all(syndrome_t(bits0) == 0, axis=0)        # [B]

        # q lives as [N*Vw (+1 pad), B]
        q0 = jnp.where(v_mask[:, :, None], llr_t[:, None, :], 0.0
                       ).reshape(n * vw, b)

        def body(state):
            q, llr_tot, done, iters, it = state
            qpad = jnp.concatenate([q, jnp.zeros((1, b), jnp.float32)], axis=0)
            qe = jnp.take(qpad, edge_flat.reshape(-1), axis=0
                          ).reshape(p, cw, b)
            if algo == "minsum":
                big = jnp.float32(3.0e38)
                absq = jnp.where(c_mask[:, :, None], jnp.abs(qe), big)
                min1 = jnp.min(absq, axis=1, keepdims=True)
                eq = absq == min1
                is_min = eq & (jnp.cumsum(eq.astype(jnp.int32), axis=1) == 1)
                min2 = jnp.min(jnp.where(is_min, big, absq), axis=1,
                               keepdims=True)
                excl_min = jnp.where(is_min, min2, min1)
                excl_min = jnp.clip(alpha * excl_min, 0.0, 8.7)
                sbit = (c_mask[:, :, None] & (qe < 0)).astype(jnp.int32)
                par = jnp.sum(sbit, axis=1, keepdims=True)
                sign_excl = (1 - 2 * ((par - sbit) & 1)).astype(jnp.float32)
                r_vals = jnp.where(c_mask[:, :, None], sign_excl * excl_min,
                                   0.0)
            else:
                t = jnp.where(c_mask[:, :, None], jnp.tanh(0.5 * qe), 1.0)
                fwd = jnp.concatenate(
                    [jnp.ones((p, 1, b), jnp.float32),
                     jnp.cumprod(t, axis=1)[:, :-1]], axis=1)
                bwd = jnp.flip(jnp.concatenate(
                    [jnp.ones((p, 1, b), jnp.float32),
                     jnp.cumprod(jnp.flip(t, axis=1), axis=1)[:, :-1]],
                    axis=1), axis=1)
                prod_excl = jnp.clip(fwd * bwd, -0.9999999, 0.9999999)
                r_vals = 2.0 * jnp.arctanh(prod_excl)           # [P, Cw, B]
            r_pad = jnp.concatenate(
                [r_vals.reshape(p * cw, b), jnp.zeros((1, b), jnp.float32)],
                axis=0)
            r_new = jnp.take(r_pad, var_edge_flat.reshape(-1), axis=0
                             ).reshape(n, vw, b)
            llr_new = llr_t + jnp.sum(
                jnp.where(v_mask[:, :, None], r_new, 0.0), axis=1)   # [N, B]
            bits = (llr_new < 0).astype(jnp.int32)
            conv = jnp.all(syndrome_t(bits) == 0, axis=0)
            q_new = jnp.where(v_mask[:, :, None],
                              llr_new[:, None, :] - r_new, 0.0
                              ).reshape(n * vw, b)
            keep = done[None, :]
            q = jnp.where(keep, q, q_new)
            llr_tot = jnp.where(done[None, :], llr_tot, llr_new)
            iters = jnp.where(conv & ~done, it + 1, iters)
            done = done | conv
            return q, llr_tot, done, iters, it + 1

        def cond(state):
            _q, _l, done, _i, it = state
            return (it < max_iter) & ~jnp.all(done)

        iters0 = jnp.where(clean0, 0, max_iter + 1)
        state = (q0, llr_t, clean0, iters0, jnp.int32(0))
        q, llr_tot, done, iters, _ = jax.lax.while_loop(cond, body, state)
        return (llr_tot < 0).astype(jnp.int32).T, iters.astype(jnp.int32), done

    return decode_t


def make_llrs(rate_num, batch, esn0_db, seed=0):
    code = load_code(rate_num)
    rng = np.random.default_rng(seed)
    info = rng.integers(0, 2, size=(batch, code.k)).astype(np.int32)
    cw = np.asarray(ldpc.encode(load_code(rate_num), jnp.asarray(info)))
    sym = 1.0 - 2.0 * cw
    sigma = 10 ** (-esn0_db / 20) / np.sqrt(2)
    y = sym + sigma * rng.standard_normal(sym.shape)
    return (2.0 / sigma ** 2 * y).astype(np.float32)


def main():
    rate = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 256
    max_iter = int(sys.argv[3]) if len(sys.argv) > 3 else 50
    # Two operating points: a threshold-ish SNR for a correctness
    # cross-check, and a well-below-threshold one where every codeword runs
    # the full iteration budget — the BP-bound regime the roofline measures
    # (iteration cost without the dispatch floor diluting it).
    esn0 = {1: -10.0, 2: -8.5, 4: -6.0, 8: -4.0, 14: -1.0}.get(rate, -4.0)
    llr = jnp.asarray(make_llrs(rate, batch, esn0))
    llr_ok = jnp.asarray(make_llrs(rate, batch, esn0 + 6.0, seed=1))

    for algo in ("spa", "minsum"):
        base = functools.partial(ldpc.decode, rate_num=rate,
                                 max_iter=max_iter, algo=algo)
        trans = build_transposed(rate, max_iter, algo)

        outs = {}
        for name, fn in (("batch-major", base), ("batch-minor", trans)):
            bits, iters, ok = fn(llr)
            bits.block_until_ready()
            it_avg = float(jnp.mean(jnp.minimum(iters, max_iter)))
            t0 = time.perf_counter()
            reps = 5
            for _ in range(reps):
                bits, iters, ok = fn(llr)
            bits.block_until_ready()
            dt = (time.perf_counter() - t0) / reps
            per_it = dt / max(it_avg, 1e-9) * 1e3
            print(f"rate {rate}/16 {algo:7s} {name:12s}: {dt*1e3:8.2f} ms "
                  f"({it_avg:5.1f} it avg, {per_it:6.3f} ms/it, "
                  f"ok={int(jnp.sum(ok))}/{batch})", flush=True)
            outs[name] = fn(llr_ok)
        # correctness cross-check at a decodable SNR: both layouts must
        # produce identical hard decisions, iteration counts, and ok flags
        for a, b in zip(outs["batch-major"], outs["batch-minor"]):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        print(f"rate {rate}/16 {algo:7s} layouts agree "
              f"(ok={int(jnp.sum(outs['batch-minor'][2]))}/{batch})",
              flush=True)


if __name__ == "__main__":
    main()
