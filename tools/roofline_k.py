#!/usr/bin/env python
"""Amortized per-stage roofline: kernel time WITHOUT the dispatch floor.

Round-2's per-stage rows (docs/roofline_r2.json) were honest about being
dispatch-latency-floored: every sub-3 ms stage read 2.6-3.0 ms through the
axon tunnel, so "roofline fraction" per kernel was inferred, not measured
(round-2 verdict weak #3). This tool measures each hot stage inside a
`lax.fori_loop` that applies it K times with a genuine data dependency
(the carry absorbs a 1e-30-scaled reduction of the stage output, so XLA
can neither elide nor overlap iterations into one), then divides by K —
one dispatch amortized over K kernel executions.

Writes docs/roofline_r3.json. Run on the chip:
    python tools/roofline_k.py [K]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PEAK_MXU_BF16 = 197e12      # FLOP/s (TPU v5e, scaling-book)
PEAK_HBM = 819e9            # B/s

BATCH = 256
CFG = 9


def main() -> int:
    import jax

    if os.environ.get("JAX_PLATFORMS", "").strip().lower() == "cpu":
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np
    from jax import lax

    from mercury_tpu.channel import sim
    from mercury_tpu.core.geometry import build_geometry
    from mercury_tpu.dsp import ops
    from mercury_tpu.modem.tx import TxChain

    k = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    platform = jax.devices()[0].platform
    g = build_geometry(CFG)
    tx = TxChain(g)
    rng = np.random.default_rng(0)
    buf_len = g.nofdm * g.buffer_nsymb * g.interp

    seq = [0]

    def timed_k(stage, x, reps=5):
        """Wall time per stage application, amortized over k in-graph
        iterations. `stage` maps a real carry tensor to any pytree; the
        carry absorbs sum(outputs)*1e-30 to force iteration dependency.

        Every timed call gets a bit-level-perturbed input and ends on a
        small D2H transfer: the relay executes asynchronously after a
        stall (block_until_ready is not a barrier) and content-caches
        identical executions — both observed round 3."""
        def body(_i, c):
            out = stage(c)
            s = sum(jnp.sum(jnp.abs(o).astype(jnp.float32))
                    for o in jax.tree_util.tree_leaves(out))
            return c + (s * 1e-30).astype(c.dtype)

        loop = jax.jit(lambda x0: lax.fori_loop(0, k, body, x0))
        one = jax.jit(lambda x0: body(0, x0))

        def run(fn):
            seq[0] += 1
            t0 = time.perf_counter()
            out = fn(x + jnp.float32(seq[0] * 1e-7).astype(x.dtype))
            np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[:8])
            return time.perf_counter() - t0

        run(loop)
        run(one)
        ts_l, ts_1 = [], []
        for _ in range(reps):
            ts_l.append(run(loop))
            ts_1.append(run(one))
        # subtract the single-shot time to cancel entry/exit + barrier
        # work, then divide by the extra K-1 applications: pure marginal
        # kernel time
        return max(min(ts_l) - min(ts_1), 1e-9) / (k - 1), min(ts_1)

    results = {"meta": {"platform": platform, "batch": BATCH, "config": CFG,
                        "k": k,
                        "method": "fori_loop amortization: (t(K) - t(1)) / "
                                  "(K-1), dispatch floor cancels",
                        "peak_mxu_bf16_tflops": PEAK_MXU_BF16 / 1e12,
                        "peak_hbm_gbps": PEAK_HBM / 1e9},
               "stages": []}

    def record(name, secs, t1, flops, bytes_, note=""):
        fr_m = flops / secs / PEAK_MXU_BF16
        fr_h = bytes_ / secs / PEAK_HBM
        axis = "mxu" if fr_m >= fr_h else "hbm"
        if max(fr_m, fr_h) > 1.5:
            # impossible fraction: the K-loop landed below the tunnel's
            # measurement resolution for this stage — record it as such
            # instead of quoting a super-roofline rate
            note = (note + " BELOW-RESOLUTION (amortized time not "
                           "resolvable through the tunnel)").strip()
        results["stages"].append({
            "stage": name, "ms_per_apply": round(secs * 1e3, 4),
            "single_dispatch_ms": round(t1 * 1e3, 3),
            "gflops_per_s": round(flops / secs / 1e9, 1),
            "gbytes_per_s": round(bytes_ / secs / 1e9, 1),
            "binding_axis": axis,
            "roofline_fraction": round(max(fr_m, fr_h), 4),
            "note": note})
        print(f"{name:30s} {secs*1e3:9.4f} ms/apply (1-shot {t1*1e3:7.3f})"
              f"  {flops/secs/1e9:9.1f} GF/s {bytes_/secs/1e9:8.1f} GB/s"
              f"  {axis}:{max(fr_m, fr_h):6.1%}  {note}", flush=True)

    # stage inputs
    payload = rng.integers(0, 256, (BATCH, g.frame_bytes)).astype(np.uint8)
    frames = tx.transmit(payload)
    delay = ((g.preamble_nsymb + 2) * g.nofdm + 50) * g.interp
    buf = jnp.asarray(sim.awgn_passband(jax.random.key(1), frames,
                                        sim.sigma_for_esn0(12.0), delay,
                                        buf_len), jnp.float32)

    # --- sync FIR + mixer (strided banded-Toeplitz MXU) ---
    ntaps = len(g.fir_rx_ts)
    ts_taps = g.fir_rx_ts.astype(np.float32)
    w = 2 * np.pi * g.fc / g.fs

    def fir_mix(x):
        return ops.fir_same_strided_mix_mm(x, ts_taps, g.interp, w,
                                           float(np.sqrt(2.0)))
    n_out = buf_len // g.interp
    t, t1 = timed_k(fir_mix, buf)
    record("sync FIR+mix (MXU toeplitz)", t, t1,
           2 * 2 * ntaps * n_out * BATCH,
           4 * BATCH * (buf_len + 2 * n_out), f"taps={ntaps}")

    # --- Schmidl-Cox box sums (on |bb|^2) ---
    bb_abs = jnp.abs(jax.jit(fir_mix)(buf)) ** 2

    def sc(x):
        return ops.box_sum_valid(x, g.nfft // 2, x.shape[-1] - g.nfft,
                                 use_mm=True)
    n_o = bb_abs.shape[-1] - g.nfft
    t, t1 = timed_k(sc, bb_abs)
    record("SC box-sum (MXU)", t, t1, 2 * (g.nfft // 2) * n_o * BATCH,
           4 * BATCH * (bb_abs.shape[-1] + n_o), f"L={g.nfft//2}")

    # --- data FIR polyphase decimate (complex built in-graph: the axon
    # backend cannot transfer complex host<->device) ---
    seg_len = (g.nofdm * (g.nsymb + g.preamble_nsymb) * g.interp
               + len(g.fir_rx_data) - 1)
    seg2 = jnp.asarray(rng.standard_normal(
        (2, BATCH, seg_len)).astype(np.float32))
    data_taps = jnp.asarray(g.fir_rx_data.astype(np.float32))

    def dec(x2):
        return ops.fir_decimate_segment(x2[0] + 1j * x2[1], data_taps,
                                        g.interp)
    n_out = (seg_len - (len(g.fir_rx_data) - 1)) // g.interp
    t, t1 = timed_k(dec, seg2)
    record("data FIR decimate (MXU)", t, t1,
           2 * 2 * len(g.fir_rx_data) * n_out * BATCH,
           8 * BATCH * (seg_len + n_out), f"taps={len(g.fir_rx_data)}")

    # --- OFDM demod (FFT-256 + depad) ---
    sym2 = jnp.asarray(rng.standard_normal(
        (2, BATCH, g.nsymb, g.nofdm)).astype(np.float32))
    pad_map = jnp.asarray(g.pad_map)

    def demod(x2):
        return ops.ofdm_demod(x2[0] + 1j * x2[1], pad_map, g.nfft, g.ngi)
    t, t1 = timed_k(demod, sym2)
    record("OFDM demod (FFT-256)", t, t1,
           BATCH * g.nsymb * 5 * g.nfft * np.log2(g.nfft),
           8 * BATCH * g.nsymb * (g.nofdm + g.nc),
           f"{g.nsymb} sym x {g.nfft}")

    # --- channel estimation matmul ---
    yp2 = jnp.asarray(rng.standard_normal(
        (2, BATCH, g.n_pilots)).astype(np.float32))
    est_op = jnp.asarray(g.est_op).astype(jnp.float32)

    def est(y2):
        return (y2[0] @ est_op.T, y2[1] @ est_op.T)
    cells = est_op.shape[0]
    t, t1 = timed_k(est, yp2)
    record("channel est (dense op MXU)", t, t1,
           2 * 2 * BATCH * g.n_pilots * cells,
           4 * (g.n_pilots * cells + BATCH * 2 * (g.n_pilots + cells)),
           f"[{cells},{g.n_pilots}]")

    # --- one BP sweep (check update + both redistributions) ---
    from mercury_tpu.fec import ldpc as ldpc_mod
    from mercury_tpu.fec.tables import load_code
    code = load_code(g.spec.ldpc_rate_num)
    n_edges = int((np.asarray(code.c_idx) >= 0).sum())
    llr = jnp.asarray(rng.standard_normal(
        (BATCH, code.n)).astype(np.float32))

    def bp_sweep(x):
        bits, iters, ok = ldpc_mod.decode(x, g.spec.ldpc_rate_num,
                                          max_iter=1)
        return bits.astype(jnp.float32)
    t, t1 = timed_k(bp_sweep, llr, reps=3)
    record("BP flooding sweep (1 iter)", t, t1,
           30 * n_edges * BATCH,       # tanh/atanh-dominated, rough count
           3 * 4 * n_edges * BATCH, f"edges={n_edges}")

    # --- deep-sync global matched filter (CONFIG_0 acquisition), A/B:
    # jnp.fft (XLA generic FFT lowering) vs ops.fft_mm (MXU Cooley-Tukey
    # matmuls). This stage dominates the CONFIG_0-4 deep-sync RX programs.
    from mercury_tpu.modem import sync as sync_mod
    from mercury_tpu.modem.rx import RxChain

    g0 = build_geometry(0)
    rx0 = RxChain(g0, deep_sync=True)
    lp, s_tmpl = rx0._mf_templates.shape
    ts_dec = g0.interp
    mf_d = 2 * ts_dec if s_tmpl % (2 * ts_dec) == 0 else ts_dec
    mf_s = mf_d // ts_dec
    s_d = s_tmpl // mf_d
    tmpl_d = np.ascontiguousarray(rx0._mf_templates[:, ::mf_d])
    grid_h = int(round(120.0 / 15.0))            # cfo_range="wide" profile
    grid_f = np.arange(-grid_h, grid_h + 1) * 15.0
    t_tmpl = np.arange(tmpl_d.shape[-1], dtype=np.float64) * mf_d
    bank_g = np.stack([
        tmpl_d * np.exp(-1j * (2 * np.pi / g0.fs) * f * t_tmpl)[None]
        for f in grid_f]).astype(np.complex64)
    a_rows = bank_g.shape[0]
    buf0_len = g0.nofdm * g0.buffer_nsymb * g0.interp
    n_gd = (buf0_len // ts_dec) // mf_s
    win_g = (n_gd - lp * s_d) // 2
    seg_len_g = 2 * win_g + lp * s_d
    nfft2 = 1
    while nfft2 < seg_len_g:
        nfft2 *= 2
    segg2 = jnp.asarray(rng.standard_normal(
        (2, BATCH, seg_len_g)).astype(np.float32))
    zeros_b = jnp.zeros(BATCH, jnp.int32)
    n_tr = BATCH * (1 + a_rows * lp)             # fwd + per-bank inverse
    for engine, name in (("fft", "deep MF corr (jnp.fft)"),
                         ("fft_mm", "deep MF corr (fft_mm MXU)"),
                         ("pallas", "deep MF fused (pallas VMEM)")):
        def mf(x2, _e=engine):
            seg = x2[0] + 1j * x2[1]
            _d, s = sync_mod.matched_filter_refine_bank(
                seg, zeros_b, bank_g, win_g, use_mm=False,
                use_fft_mm=(_e == "fft_mm"), use_pallas=(_e == "pallas"))
            return s
        if engine == "fft":   # radix-2 butterfly count
            flops = n_tr * 5 * nfft2 * np.log2(nfft2)
        elif engine == "fft_mm":  # 2 matmul passes x 3 Karatsuba matmuls
            flops = n_tr * 2 * 3 * 2 * nfft2 * 128
        else:                 # kernel: 4-matmul complex, inverse only + fwd
            flops = (BATCH * a_rows * lp * 2 * 4 * 2 * nfft2 * 128
                     + BATCH * 2 * 3 * 2 * nfft2 * 128)
        if engine == "pallas":
            # reads xf per (row, a) revisit + bank + score write
            bytes_ = 4 * (2 * BATCH * nfft2 * a_rows
                          + 2 * a_rows * lp * nfft2
                          + BATCH * a_rows * (2 * win_g + 1))
        else:
            bytes_ = 8 * BATCH * (1 + 2 * a_rows * lp) * nfft2
        t, t1 = timed_k(mf, segg2, reps=3)
        record(name, t, t1, flops, bytes_,
               f"A={a_rows} Lp={lp} nfft={nfft2}")

    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "docs", "roofline_r3.json")
    with open(path, "w") as f:
        json.dump(results, f, indent=1)
    print(f"wrote {path}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
