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

import dataclasses
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


def _check_node_update(qe, c_mask, algo: str, alpha: float, beta: float):
    """Check-node message update on [B, P, Cw] edge messages.

    Shared by the flooding (`decode`) and matmul-redistribution (`decode_mm`)
    schedules. Returns R values masked to 0 on padded edges. The SPA branch is
    the reference's tanh/atanh update (ldpc_decoder_SPA.cc:127-210); min-sum
    is the normalized offset variant. Both are written argmin-, inf- and
    float-sign-product-free: those forms SIGSEGV the TPU compiler inside a
    while_loop at B > 1 (reproduced on v5e).
    """
    b, p, _cw = qe.shape
    dt = qe.dtype
    if algo == "minsum":
        # offset min-sum: R = sign_excl * clip(alpha*(min_excl - beta), 8.7).
        # Exclusive min via (min1, min2, first-occurrence-of-min mask) — the
        # eq-mask form is tie-robust (a tied-min edge keeps min1 as its
        # exclusive min, which is exactly right).
        big = jnp.float32(3.0e38)
        absq = jnp.where(c_mask[None], jnp.abs(qe), big)
        min1 = jnp.min(absq, axis=-1, keepdims=True)            # [B, P, 1]
        eq = absq == min1
        is_min = eq & (jnp.cumsum(eq.astype(jnp.int32), axis=-1) == 1)
        min2 = jnp.min(jnp.where(is_min, big, absq), axis=-1, keepdims=True)
        excl_min = jnp.where(is_min, min2, min1)
        # clamp to the SPA's effective arctanh bound (±8.7): without it
        # min-sum messages grow without bound through graph cycles and the
        # duplicated virtual-bit structure, and the decoder diverges
        excl_min = jnp.clip(alpha * jnp.maximum(excl_min - beta, 0.0),
                            0.0, 8.7)
        # exclusive sign via integer bit parity: sign_excl[j] =
        # (-1)^(parity of negative edges excluding j)
        sbit = (c_mask[None] & (qe < 0)).astype(jnp.int32)
        par = jnp.sum(sbit, axis=-1, keepdims=True)             # [B, P, 1]
        sign_excl = (1 - 2 * ((par - sbit) & 1)).astype(dt)
        r_vals = sign_excl * excl_min
    else:
        t = jnp.where(c_mask[None], jnp.tanh(0.5 * qe), 1.0)
        # exclusive product via forward/backward cumulative products
        fwd = jnp.concatenate(
            [jnp.ones((b, p, 1), dt), jnp.cumprod(t, axis=-1)[..., :-1]],
            axis=-1)
        bwd = jnp.concatenate(
            [jnp.ones((b, p, 1), dt),
             jnp.cumprod(jnp.flip(t, axis=-1), axis=-1)[..., :-1]], axis=-1)
        bwd = jnp.flip(bwd, axis=-1)
        prod_excl = jnp.clip(fwd * bwd, -0.9999999, 0.9999999)
        r_vals = 2.0 * jnp.arctanh(prod_excl)                   # [B, P, Cw]
    return jnp.where(c_mask[None], r_vals, 0.0)


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
        r_vals = _check_node_update(qe, c_mask, algo, alpha, beta)
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


# ---------------------------------------------------------------------------
# Matmul-redistribution BP (flooding or layered schedule)
#
# The flooding decoder above moves its messages with 9,600-element edge
# permutations; docs/roofline_r2.md measures those gathers at a ~0.4 ms/it
# plateau that is insensitive to both message width (bf16: ~3%) and address
# count (batch-minor: ~5%) — a fixed engine cost XLA cannot amortize. The
# formulation below replaces BOTH redistribution directions with MXU matmuls
# against static one-hot edge-incidence matrices: gathering Q is
# llr_tot @ Aᵀ and scattering the posterior delta is delta @ A, where
# A[e, v] = 1 iff edge e touches variable v. One nonzero per row makes the
# matmul an exact selection (up to the operand dtype), the syndrome check
# becomes bits @ H with exact small-integer counts, and the only remaining
# gather in the loop is gone entirely.
#
# The same machinery gives a *layered* (serial-C / grouped-shuffled) schedule
# for free: partition the checks into L layers and update the posterior after
# each layer, so later layers see fresher messages — the classic ~2x
# convergence speedup over flooding (each sweep costs the same total matmul
# work). n_layers=1 degenerates to EXACTLY the flooding schedule (q = prior
# posterior minus own R; posterior += sum of new R), so one implementation
# serves both. Layers are balanced, and variable-disjoint where feasible
# (least-loaded-feasible coloring); when a requested L is below the disjoint
# bound the schedule is "grouped shuffled" BP — intra-layer conflicts simply
# see one-sweep-stale messages, which only affects convergence rate, never
# correctness (the delta scatter is additive).
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class _LayerPlan:
    n_layers: int
    pl: int                     # checks per layer (padded)
    c_idx: np.ndarray           # [L, Pl, Cw] check -> variable (-1 pad)
    c_mask: np.ndarray          # [L, Pl, Cw] bool
    incidence: np.ndarray       # [L, Pl*Cw, N] float32 one-hot edge->var
    h_counts: np.ndarray        # [N, L*Pl] float32 variable->check incidence


def _assign_layers(c_idx: np.ndarray, n_layers: int) -> list[list[int]]:
    """Balanced layer assignment: each check goes to the least-loaded layer
    that shares none of its variables (disjoint), falling back to the
    least-loaded layer outright when no disjoint one fits (grouped-shuffled).
    Checks are placed in descending-degree order for better packing."""
    p = c_idx.shape[0]
    varsets = [frozenset(int(v) for v in row if v >= 0) for row in c_idx]
    order = sorted(range(p), key=lambda i: -len(varsets[i]))
    cap = -(-p // n_layers)
    used: list[set] = [set() for _ in range(n_layers)]
    members: list[list[int]] = [[] for _ in range(n_layers)]
    for i in order:
        open_layers = [l for l in range(n_layers) if len(members[l]) < cap]
        disjoint = [l for l in open_layers if not (varsets[i] & used[l])]
        pool = disjoint or open_layers
        l = min(pool, key=lambda j: len(members[j]))
        used[l] |= varsets[i]
        members[l].append(i)
    return members


@functools.lru_cache(maxsize=None)
def _default_layers(rate_num: int) -> int:
    """Smallest L admitting a balanced variable-disjoint partition (searched
    from the max variable degree upward; pure-layered convergence needs
    disjointness, and balance keeps the padding waste ~1%)."""
    code = load_code(rate_num)
    c_rows = [frozenset(int(v) for v in row if v >= 0) for row in code.c_idx]
    p = len(c_rows)
    for n_layers in range(int(code.deg.max()), p + 1):
        members = _assign_layers(code.c_idx, n_layers)
        ok = True
        for layer in members:
            seen: set = set()
            for i in layer:
                if c_rows[i] & seen:
                    ok = False
                    break
                seen |= c_rows[i]
            if not ok:
                break
        if ok:
            return n_layers
    return p


@functools.lru_cache(maxsize=None)
def _layer_plan(rate_num: int, n_layers: int | None) -> _LayerPlan:
    code = load_code(rate_num)
    if n_layers is None:
        n_layers = _default_layers(rate_num)
    p, cw, n = code.p, code.cw, code.n
    members = ([list(range(p))] if n_layers == 1
               else _assign_layers(code.c_idx, n_layers))
    pl = max(len(m) for m in members)
    c_idx = np.full((n_layers, pl, cw), -1, dtype=np.int32)
    for l, m in enumerate(members):
        c_idx[l, : len(m)] = code.c_idx[m]
    c_mask = c_idx >= 0
    incidence = np.zeros((n_layers, pl * cw, n), dtype=np.float32)
    li, ei, si = np.nonzero(c_mask)
    incidence[li, ei * cw + si, c_idx[li, ei, si]] = 1.0
    # variable -> check incidence for the syndrome matmul (counts <= Cw are
    # exact in bf16); padded layer rows give all-zero columns -> even parity
    h_counts = incidence.reshape(n_layers * pl * cw, n).T.reshape(
        n, n_layers, pl, cw).sum(axis=-1).reshape(n, n_layers * pl)
    h_counts = np.ascontiguousarray(h_counts, dtype=np.float32)
    return _LayerPlan(n_layers=n_layers, pl=pl, c_idx=c_idx, c_mask=c_mask,
                      incidence=incidence, h_counts=h_counts)


def _mm(a, b, contract, mm_dtype):
    """dot_general on the given contraction dims with f32 accumulation."""
    return jax.lax.dot_general(
        a.astype(mm_dtype), b.astype(mm_dtype),
        (contract, ((), ())), preferred_element_type=jnp.float32)


@functools.partial(jax.jit,
                   static_argnames=("rate_num", "max_iter", "algo", "beta",
                                    "alpha", "n_layers", "mm_dtype", "soft"))
def decode_mm(llr: jnp.ndarray, rate_num: int, max_iter: int = 50,
              algo: str = "spa", beta: float = 0.0,
              alpha: float | None = None, n_layers: int | None = None,
              mm_dtype=jnp.bfloat16, soft: bool = False):
    """Batched BP decode with matmul message redistribution.

    Same contract as `decode` (llr [B, N] -> bits, iters, ok) with the edge
    permutations of the flooding decoder replaced by one-hot incidence
    matmuls on the MXU (see the block comment above), and an optional layered
    schedule:

      n_layers=None  -> smallest balanced variable-disjoint partition
                        (layered BP: posterior refreshed after each layer,
                        ~2x fewer sweeps than flooding at threshold SNR)
      n_layers=1     -> exactly the flooding schedule
      n_layers=k     -> k balanced layers (grouped-shuffled if k is below the
                        disjoint bound)

    `iters` counts full sweeps (all checks updated once), directly comparable
    to `decode`'s iteration count. mm_dtype is the matmul operand dtype: the
    incidence side is exact 0/1 in bf16; the data side (posterior / delta)
    is rounded to bf16 per sweep, measured BER-neutral like the flooding
    decoder's bf16 message store (tests/test_fec.py).
    """
    if algo not in ("spa", "minsum"):
        raise ValueError("algo must be 'spa' or 'minsum'")
    if alpha is None:
        alpha = _MINSUM_ALPHA.get(rate_num, 0.75)
    plan = _layer_plan(rate_num, n_layers)
    nl, pl = plan.n_layers, plan.pl
    code = load_code(rate_num)
    n, cw = code.n, code.cw
    incidence = jnp.asarray(plan.incidence, dtype=mm_dtype)  # [L, Pl*Cw, N]
    c_mask = jnp.asarray(plan.c_mask)                        # [L, Pl, Cw]
    h_counts = jnp.asarray(plan.h_counts, dtype=mm_dtype)    # [N, L*Pl]

    llr = llr.astype(jnp.float32)
    b = llr.shape[0]

    def syndrome_ok(llr_tot):
        bits = (llr_tot < 0)
        cnt = _mm(bits, h_counts, ((1,), (0,)), mm_dtype)      # [B, L*Pl]
        return jnp.all(cnt.astype(jnp.int32) % 2 == 0, axis=-1)

    def sweep(llr_tot, r_msgs):
        def layer_step(carry, xs):
            llr_c, r_c = carry
            inc_l, mask_l, li = xs       # [Pl*Cw, N], [Pl, Cw], scalar
            r_old = jax.lax.dynamic_slice(
                r_c, (li, jnp.int32(0), jnp.int32(0), jnp.int32(0)),
                (1, b, pl, cw))[0]                            # [B, Pl, Cw]
            q = _mm(llr_c, inc_l, ((1,), (1,)), mm_dtype
                    ).reshape(b, pl, cw) - r_old
            r_new = _check_node_update(q, mask_l, algo, alpha, beta)
            delta = (r_new - r_old).reshape(b, pl * cw)
            llr_c = llr_c + _mm(delta, inc_l, ((1,), (0,)), mm_dtype)
            r_c = jax.lax.dynamic_update_slice(
                r_c, r_new[None], (li, jnp.int32(0), jnp.int32(0),
                                   jnp.int32(0)))
            return (llr_c, r_c), None
        (llr_tot, r_msgs), _ = jax.lax.scan(
            layer_step, (llr_tot, r_msgs),
            (incidence, c_mask, jnp.arange(nl, dtype=jnp.int32)))
        return llr_tot, r_msgs

    clean0 = syndrome_ok(llr)

    def body(state):
        llr_tot, r_msgs, done, iters, it = state
        llr_new, r_new = sweep(llr_tot, r_msgs)
        conv = syndrome_ok(llr_new)
        llr_tot = jnp.where(done[:, None], llr_tot, llr_new)
        r_msgs = jnp.where(done[None, :, None, None], r_msgs, r_new)
        iters = jnp.where(conv & ~done, it + 1, iters)
        done = done | conv
        return llr_tot, r_msgs, done, iters, it + 1

    def cond(state):
        _l, _r, done, _i, it = state
        return (it < max_iter) & ~jnp.all(done)

    # tie the message store's sharding type to the input: under shard_map
    # a plain zeros carry is 'replicated' while the scan threads it
    # together with the varying llr, and tracing rejects the mismatch
    # (vma rules). The where-marker is exactly 0 but data-dependent (and
    # NaN-safe, unlike llr*0 if an LLR were ever +-inf).
    vary0 = jnp.where(llr[:, :1] > 0, 0.0, 0.0)           # [B, 1], == 0
    r0 = (jnp.zeros((nl, b, pl, cw), dtype=jnp.float32)
          + vary0[None, :, :, None])
    iters0 = jnp.where(clean0, 0, max_iter + 1)
    state = (llr, r0, clean0, iters0, jnp.int32(0))
    llr_tot, _r, done, iters, _ = jax.lax.while_loop(cond, body, state)
    bits = (llr_tot < 0).astype(jnp.int32)
    if soft:
        # posterior total LLRs — the BICM-ID feedback path reads the
        # decoder extrinsic as (llr_tot - llr_in) per codeword position
        return bits, iters.astype(jnp.int32), done, llr_tot
    return bits, iters.astype(jnp.int32), done
