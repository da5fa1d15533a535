#!/usr/bin/env python
"""Per-stage roofline measurement on the TPU (VERDICT r1 #6 / BASELINE
"FFT, polyphase filter, and LDPC min-sum kernels at speed-of-light").

Micro-benchmarks each hot RX stage as its own jitted program, counts its
arithmetic and HBM traffic analytically from the shapes, and reports the
achieved fraction of the chip's roofline on the binding axis. Writes
docs/roofline_r2.json; docs/roofline_r2.md is the human-readable analysis.

Peaks (TPU v5e, per chip; jax-ml.github.io/scaling-book): 197 TFLOP/s bf16
MXU, ~0.5x for f32-accumulated bf16x3, 819 GB/s HBM.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PEAK_MXU_BF16 = 197e12      # FLOP/s
PEAK_HBM = 819e9            # B/s

BATCH = 256
CFG = 9


def timed(fn, *args, reps=10):
    import jax

    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps


def main() -> int:
    import jax

    if os.environ.get("JAX_PLATFORMS", "").strip().lower() == "cpu":
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from mercury_tpu.core.geometry import build_geometry
    from mercury_tpu.dsp import ops
    from mercury_tpu.fec import ldpc
    from mercury_tpu.fec.tables import load_code
    from mercury_tpu.modem.rx import RxChain
    from mercury_tpu.modem.tx import TxChain
    from mercury_tpu.channel import sim

    platform = jax.devices()[0].platform
    g = build_geometry(CFG)
    rx = RxChain(g)
    tx = TxChain(g)
    rng = np.random.default_rng(0)
    buf_len = g.nofdm * g.buffer_nsymb * g.interp
    results = {"meta": {"platform": platform, "batch": BATCH, "config": CFG,
                        "peak_mxu_bf16_tflops": PEAK_MXU_BF16 / 1e12,
                        "peak_hbm_gbps": PEAK_HBM / 1e9},
               "stages": []}

    def record(name, secs, flops, bytes_, axis, note=""):
        ach_f = flops / secs
        ach_b = bytes_ / secs
        frac = (ach_f / PEAK_MXU_BF16 if axis == "mxu" else ach_b / PEAK_HBM)
        results["stages"].append({
            "stage": name, "ms": round(secs * 1e3, 3),
            "gflops_per_s": round(ach_f / 1e9, 1),
            "gbytes_per_s": round(ach_b / 1e9, 1),
            "binding_axis": axis,
            "roofline_fraction": round(frac, 4), "note": note})
        print(f"{name:28s} {secs*1e3:8.3f} ms  {ach_f/1e9:9.1f} GF/s "
              f"{ach_b/1e9:8.1f} GB/s  {axis}:{frac:6.1%}  {note}",
              flush=True)

    # ---------------- full RX (context line) ----------------
    payload = rng.integers(0, 256, (BATCH, g.frame_bytes)).astype(np.uint8)
    frames = tx.transmit(payload)
    delay = ((g.preamble_nsymb + 2) * g.nofdm + 50) * g.interp
    buf = jnp.asarray(sim.awgn_passband(jax.random.key(1), frames,
                                        sim.sigma_for_esn0(12.0), delay,
                                        buf_len), jnp.float32)
    t_full = timed(rx.receive, buf)
    print(f"full receive: {t_full*1e3:.2f} ms "
          f"({BATCH*buf_len/t_full/1e6:.0f} Msamples/s)", flush=True)
    results["meta"]["full_rx_ms"] = round(t_full * 1e3, 3)
    results["meta"]["full_rx_msamples_s"] = round(BATCH * buf_len / t_full / 1e6, 1)

    # ---------------- TS FIR + mixer (strided banded-Toeplitz MXU) --------
    ntaps = len(g.fir_rx_ts)
    ts_taps = g.fir_rx_ts.astype(np.float32)     # host constant (folded)
    fir_fn = jax.jit(lambda x: ops.fir_same_strided_mix_mm(
        x, ts_taps, g.interp, 2 * np.pi * g.fc / g.fs, float(np.sqrt(2.0))))
    t = timed(fir_fn, buf)
    n_out = buf_len // g.interp
    # complex taps x real input: 2 real matmuls over the band
    flops = 2 * 2 * ntaps * n_out * BATCH
    bytes_ = 4 * BATCH * (buf_len + 2 * n_out)
    record("sync FIR+mix (MXU toeplitz)", t, flops, bytes_, "mxu",
           f"taps={ntaps} decim={g.interp}")

    # ---------------- Schmidl-Cox box sums ----------------
    bb = fir_fn(buf)
    sc_fn = jax.jit(lambda x: ops.box_sum_valid(
        jnp.abs(x) ** 2, g.nfft // 2, x.shape[-1] - g.nfft, use_mm=True))
    t = timed(sc_fn, bb)
    n_o = bb.shape[-1] - g.nfft
    flops = 2 * (g.nfft // 2) * n_o * BATCH
    bytes_ = 8 * BATCH * bb.shape[-1] + 4 * BATCH * n_o
    record("SC box-sum (MXU)", t, flops, bytes_, "mxu", f"L={g.nfft//2}")

    # ---------------- data FIR polyphase decimate ----------------
    seg_len = g.nofdm * (g.nsymb + g.preamble_nsymb) * g.interp + len(g.fir_rx_data) - 1
    seg_r = jnp.asarray(rng.standard_normal((BATCH, seg_len)).astype(np.float32))
    seg_i = jnp.asarray(rng.standard_normal((BATCH, seg_len)).astype(np.float32))
    # complexify on-device: axon cannot transfer complex arrays host<->device
    dec_fn = jax.jit(lambda xr, xi: ops.fir_decimate_segment(
        xr + 1j * xi, jnp.asarray(g.fir_rx_data.astype(np.float32)),
        g.interp))
    t = timed(dec_fn, seg_r, seg_i)
    n_out = (seg_len - (len(g.fir_rx_data) - 1)) // g.interp
    flops = 2 * 2 * len(g.fir_rx_data) * n_out * BATCH   # complex in, real taps
    bytes_ = 8 * BATCH * seg_len + 8 * BATCH * n_out
    record("data FIR decimate (MXU)", t, flops, bytes_, "mxu",
           f"taps={len(g.fir_rx_data)}")

    # ---------------- OFDM demod (FFT) ----------------
    sym_r = jnp.asarray(rng.standard_normal(
        (BATCH, g.nsymb, g.nofdm)).astype(np.float32))
    sym_i = jnp.asarray(rng.standard_normal(
        (BATCH, g.nsymb, g.nofdm)).astype(np.float32))
    fft_fn = jax.jit(lambda xr, xi: ops.ofdm_demod(
        xr + 1j * xi, jnp.asarray(g.pad_map), g.nfft, g.ngi))
    t = timed(fft_fn, sym_r, sym_i)
    flops = BATCH * g.nsymb * 5 * g.nfft * np.log2(g.nfft)
    bytes_ = 8 * BATCH * g.nsymb * (g.nofdm + g.nc)
    record("OFDM demod (FFT-256)", t, flops, bytes_, "hbm",
           f"{g.nsymb} sym x {g.nfft}")

    # ---------------- channel estimation matmul ----------------
    yp_r = jnp.asarray(rng.standard_normal(
        (BATCH, g.n_pilots)).astype(np.float32))
    yp_i = jnp.asarray(rng.standard_normal(
        (BATCH, g.n_pilots)).astype(np.float32))
    est_op = jnp.asarray(g.est_op).astype(jnp.float32)
    est_fn = jax.jit(lambda yr, yi: (yr @ est_op.T) + 1j * (yi @ est_op.T))
    t = timed(est_fn, yp_r, yp_i)
    cells = est_op.shape[0]
    flops = 2 * 2 * BATCH * g.n_pilots * cells
    bytes_ = 4 * (g.n_pilots * cells + BATCH * (2 * g.n_pilots + 2 * cells))
    record("channel est (dense op MXU)", t, flops, bytes_, "mxu",
           f"[{cells},{g.n_pilots}]")

    # ---------------- LDPC decode: SPA vs min-sum ----------------
    code = load_code(g.spec.ldpc_rate_num)
    n_edges = int((np.asarray(code.c_idx) >= 0).sum())
    u = rng.integers(0, 2, (BATCH, code.k))
    cw = np.asarray(ldpc.encode(code, jnp.asarray(u)))
    sigma = 0.9
    y = (1 - 2 * cw) + sigma * rng.standard_normal(cw.shape)
    llr = jnp.asarray((2 / sigma ** 2 * y).astype(np.float32))
    for algo in ("spa", "minsum"):
        try:
            fn = jax.jit(lambda x, a=algo: ldpc.decode(x, g.spec.ldpc_rate_num,
                                                       algo=a))
            bits, iters, ok = fn(llr)
            mean_iters = float(jnp.mean(jnp.clip(iters, 0, 50)))
            t = timed(fn, llr)
        except Exception as e:   # keep the rest of the report on any failure
            print(f"LDPC {algo}: FAILED ({str(e)[:100]})", flush=True)
            results["stages"].append({"stage": f"LDPC {algo}",
                                      "error": str(e)[:200]})
            continue
        # per iteration: gather Q, check update, scatter R, var update
        per_edge_flops = 24 if algo == "spa" else 10
        iters_run = max(mean_iters, 1.0)
        flops = BATCH * n_edges * per_edge_flops * iters_run
        bytes_ = BATCH * iters_run * 4 * (
            4 * code.n * code.vw        # Q read, R write, Q write, R read
            + 2 * code.p * code.cw)     # edge gather/scatter traffic
        record(f"LDPC {algo} ({iters_run:.0f} it avg)", t, flops, bytes_,
               "hbm", f"edges={n_edges}")
        results["stages"][-1]["mean_iters"] = round(mean_iters, 1)

    out = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..",
                       "docs", "roofline_r2.json")
    with open(out, "w") as f:
        json.dump(results, f, indent=1)
    print("wrote", out)
    return 0


if __name__ == "__main__":
    sys.exit(main())
