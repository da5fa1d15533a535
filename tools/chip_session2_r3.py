#!/usr/bin/env python
"""Second consolidated on-chip session (round 3): the fused deep-MF Pallas
kernel, end to end.

ONE process, self-bounded (tunnel etiquette). Steps, in value order:
  1. deep_mf_score compile/run smoke at CONFIG_0 shapes (catches Mosaic
     lowering issues in ~2 min instead of failing a 2-min RX compile late)
  2. CONFIG_0/4 deep throughput with the kernel (same RxChain also checks
     threshold quality at the FER~0.1 point — no extra compile, SNR is data)
  3. tools/roofline_k.py -> docs/roofline_r3.json with the 3-engine deep-MF
     A/B (jnp.fft vs fft_mm vs pallas)
  4. bench.py headline (CONFIG_9; also covers the demod dft_mm auto-on)
  5. remaining deep rows (CONFIG_1-3) if budget allows

Usage: python tools/chip_session2_r3.py [budget_minutes]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

T0 = time.time()
BUDGET_S = (float(sys.argv[1]) if len(sys.argv) > 1 else 80.0) * 60.0
DOCS = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "docs")


def remaining() -> float:
    return BUDGET_S - (time.time() - T0)


def step(name: str, need_s: float) -> bool:
    left = remaining()
    print(f"\n=== {name} (need ~{need_s:.0f}s, {left:.0f}s left) ===",
          flush=True)
    if left < need_s:
        print(f"SKIP {name}: budget exhausted", flush=True)
        return False
    return True


def deep_rows(cfgs, table_path):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from mercury_tpu.channel import sim
    from mercury_tpu.core.geometry import build_geometry
    from mercury_tpu.modem.rx import RxChain
    from mercury_tpu.modem.tx import TxChain

    rows = {}
    for cfg in cfgs:
        if not step(f"deep cfg{cfg} (pallas)", 6 * 60):
            break
        try:
            g = build_geometry(cfg)
            tx, rx = TxChain(g), RxChain(g)
            assert rx.deep_sync
            rng = np.random.default_rng(0)
            B = 256
            payload = rng.integers(0, 256, (B, g.frame_bytes)
                                   ).astype(np.uint8)
            frames = tx.transmit(payload)
            buf_len = g.nofdm * g.buffer_nsymb * g.interp
            delay = ((g.preamble_nsymb + 2) * g.nofdm + 50) * g.interp
            buf = sim.awgn_passband(jax.random.key(1), frames,
                                    sim.sigma_for_esn0(30.0), delay, buf_len)
            buf = jnp.asarray(buf, jnp.float32)
            t_c = time.perf_counter()
            res = rx.receive(buf)
            jax.block_until_ready(res.payload)
            compile_s = time.perf_counter() - t_c
            reps = 10
            t0 = time.perf_counter()
            for _ in range(reps):
                res = rx.receive(buf)
            jax.block_until_ready(res.payload)
            dt = time.perf_counter() - t0
            ok = np.asarray(res.crc_ok)
            sps = B * buf_len * reps / dt
            row = {"config": cfg, "deep_sync": True, "batch": B,
                   "buf_len": buf_len, "frame_bytes": g.frame_bytes,
                   "msamples_per_s": round(sps / 1e6, 1),
                   "decode_goodput_mbit_s": round(
                       int(ok.sum()) * g.frame_bytes * 8 * reps / dt / 1e6, 1),
                   "realtime_channels": int(sps // 48000),
                   "crc_ok_frac": round(float(ok.mean()), 4),
                   "ms_per_call": round(dt / reps * 1e3, 3),
                   "compile_s": round(compile_s, 1),
                   "note": "fused deep-MF pallas kernel (round-3)"}
            print(json.dumps(row), flush=True)
            rows[(cfg, True)] = row
            if cfg == 0:
                # threshold quality at the recorded FER~0.1 point — same
                # program, only the input data changes
                buf_t = sim.awgn_passband(jax.random.key(5), frames,
                                          sim.sigma_for_esn0(-3.75), delay,
                                          buf_len)
                res_t = rx.receive(jnp.asarray(buf_t, jnp.float32))
                ok_t = np.asarray(res_t.crc_ok)
                print(json.dumps({
                    "check": "cfg0_threshold_minus3.75dB_pallas",
                    "decoded": int(ok_t.sum()), "batch": B,
                    "fer": round(1.0 - ok_t.mean(), 4),
                    "cpu_f32_reference_fer": 0.078,
                }), flush=True)
        except Exception as e:          # noqa: BLE001
            print(f"deep cfg{cfg} FAILED: {type(e).__name__}: {e}",
                  flush=True)
            break
    if rows:
        with open(table_path) as f:
            table = json.load(f)
        for row in table["per_mode"]:
            key = (row["config"], row["deep_sync"])
            if key in rows:
                row.clear()
                row.update(rows.pop(key))
        for r in rows.values():
            table["per_mode"].append(r)
        with open(table_path, "w") as f:
            json.dump(table, f, indent=1)
        print(f"updated {table_path}", flush=True)


def main() -> int:
    # 1. kernel smoke at production shapes, tiny batch
    if step("deep_mf_score smoke", 5 * 60):
        try:
            import numpy as np
            import jax
            import jax.numpy as jnp

            from mercury_tpu.dsp.pallas_kernels import deep_mf_score

            rng = np.random.default_rng(0)
            a, lp, s = 17, 4, 136
            win = 7140
            seg_len = 2 * win + lp * s
            seg2 = rng.standard_normal((2, 8, seg_len)).astype(np.float32)
            bank = (rng.standard_normal((a, lp, s))
                    + 1j * rng.standard_normal((a, lp, s))
                    ).astype(np.complex64)

            @jax.jit
            def run(x2):
                return deep_mf_score(x2[0] + 1j * x2[1], bank, win, 16384)
            out = run(jnp.asarray(seg2))
            jax.block_until_ready(out)
            print(f"smoke OK: score shape {out.shape}", flush=True)
        except Exception as e:          # noqa: BLE001
            print(f"SMOKE FAILED — pallas kernel does not lower on TPU: "
                  f"{type(e).__name__}: {e}", flush=True)
            print("Aborting deep measurements; flip use_pallas default off.",
                  flush=True)
            return 1

    # 2. deep rows 0 and 4 + threshold
    table_path = os.path.join(DOCS, "throughput_r3.json")
    deep_rows([0, 4], table_path)

    # 3. rooflines (3-engine deep MF A/B)
    if step("roofline_k", 28 * 60):
        try:
            import tools.roofline_k as rk
            sys.argv = [sys.argv[0]]
            rk.main()
        except Exception as e:          # noqa: BLE001
            print(f"roofline_k FAILED: {type(e).__name__}: {e}", flush=True)

    # 4. bench headline (covers demod dft_mm at CONFIG_9)
    if step("bench headline", 8 * 60):
        try:
            import bench
            bench.worker("tpu")
        except (Exception, SystemExit) as e:   # noqa: BLE001
            # worker() raises SystemExit(3) on a persistent timing artifact
            # (not an Exception subclass) — catch it too so steps 5+ still run
            print(f"bench FAILED: {type(e).__name__}: {e}", flush=True)

    # 5. remaining deep rows
    deep_rows([1, 2, 3], table_path)

    print(f"\nsession2 done in {time.time() - T0:.0f}s", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
