#!/usr/bin/env python
"""Round-4 on-chip session: c2f deep-sync throughput (CONFIG_0-4 + cfg0
full-profile A/B + the cfg3 healthy re-measure), on-chip threshold FER for
the c2f path, bench.py headline, and the StreamPool end-to-end serving
benchmark.

All timings use the difference-of-chains + D2H-barrier method (the relay
executes asynchronously after a stall and content-caches identical
executions — see bench.py / docs/round3.md). A sanity probe gates the
session: if a known ~10 ms workload reads <3 ms the relay is in the
degraded state and timing rows are refused (FER rows are value-correct
either way and still recorded).

Runs with an IN-PYTHON budget and exits cleanly (never timeout-kill a TPU
client — the relay wedges for hours). Results are written incrementally:
  docs/throughput_r4.json   (deep rows)
  docs/deep_c2f_r4.json     (on-chip FER + A/B)
  docs/serve_r4.json        (via tools/serve_bench.py, channels 64..1024)

Usage: python tools/chip_session_r4.py [budget_minutes]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

T0 = time.time()
BUDGET_S = (float(sys.argv[1]) if len(sys.argv) > 1 else 150.0) * 60.0
DOCS = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "docs")
B = 256


def left() -> float:
    return BUDGET_S - (time.time() - T0)


def main() -> int:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from mercury_tpu.channel import sim
    from mercury_tpu.core.geometry import build_geometry
    from mercury_tpu.modem.rx import RxChain
    from mercury_tpu.modem.tx import TxChain

    platform = jax.devices()[0].platform
    print(f"platform: {platform}", flush=True)

    seq = [0]

    def rx_chain(rx, x, n):
        t0 = time.perf_counter()
        r = None
        for _ in range(n):
            seq[0] += 1
            r = rx.receive(x + jnp.float32(seq[0] * 1e-7))
        np.asarray(r.payload[:1, :4])
        return time.perf_counter() - t0, r

    def diff_ms(rx, x, n=5):
        rx_chain(rx, x, 1)
        t_n, _ = rx_chain(rx, x, n)
        t_2n, res = rx_chain(rx, x, 2 * n)
        return max(t_2n - t_n, 1e-9) / n * 1e3, res

    rng = np.random.default_rng(0)

    # ---- 1. sanity probe: cfg9 full RX at batch 256 is a ~10 ms-class
    # program on this chip; <3 ms means the relay is in the degraded
    # non-blocking state -> wait it out (no kills), finally refuse timings
    g9 = build_geometry(9)
    tx9, rx9 = TxChain(g9), RxChain(g9)
    pay9 = rng.integers(0, 256, (B, g9.frame_bytes)).astype(np.uint8)
    buf_len9 = g9.nofdm * g9.buffer_nsymb * g9.interp
    delay9 = ((g9.preamble_nsymb + 2) * g9.nofdm + 50) * g9.interp
    buf9 = jnp.asarray(sim.awgn_passband(
        jax.random.key(1), tx9.transmit(pay9), sim.sigma_for_esn0(30.0),
        delay9, buf_len9), jnp.float32)
    timings_ok = False
    for attempt in range(6):
        ms9, _ = diff_ms(rx9, buf9, n=4)
        print(f"sanity probe cfg9: {ms9:.2f} ms/call", flush=True)
        if ms9 >= 3.0:
            timings_ok = True
            break
        if left() < 1200:
            break
        print("degraded-relay artifact — waiting 120 s", flush=True)
        time.sleep(120)
    if not timings_ok:
        print("WARNING: relay timing artifact persisted; timing rows will "
              "NOT be recorded (FER rows still will)", flush=True)

    # ---- 2. deep rows: CONFIG_0-4 under c2f + cfg0 under the full
    # profile (A/B), difference-of-chains; incremental write
    table = {"meta": {"platform": platform, "reps": 5, "esn0_db": 30.0,
                      "batch": B, "deep_profile": "c2f",
                      "provenance":
                          "round-4 c2f deep rows, difference-of-chains + "
                          "D2H barrier; non-deep rows are unchanged "
                          "programs — see docs/throughput_r3.json"},
             "per_mode": []}

    def save_table():
        with open(os.path.join(DOCS, "throughput_r4.json"), "w") as f:
            json.dump(table, f, indent=1)

    jobs = ([(c, "c2f") for c in range(5)] + [(0, "full"), (3, "full")])
    for cfg, prof in jobs:
        if left() < 600 or not timings_ok:
            print(f"skip cfg{cfg} {prof} (budget/timings)", flush=True)
            continue
        try:
            g = build_geometry(cfg)
            tx, rx = TxChain(g), RxChain(g, deep_profile=prof)
            pay = rng.integers(0, 256, (B, g.frame_bytes)).astype(np.uint8)
            buf_len = g.nofdm * g.buffer_nsymb * g.interp
            delay = ((g.preamble_nsymb + 2) * g.nofdm + 50) * g.interp
            buf = jnp.asarray(sim.awgn_passband(
                jax.random.key(1), tx.transmit(pay),
                sim.sigma_for_esn0(30.0), delay, buf_len), jnp.float32)
            t_c = time.perf_counter()
            r0 = rx.receive(buf)
            np.asarray(r0.payload[:1, :4])
            compile_s = time.perf_counter() - t_c
            ms, res = diff_ms(rx, buf, n=5)
            ok = np.asarray(res.crc_ok)
            if ms < 3.0:
                print(f"cfg{cfg} {prof}: {ms:.2f} ms below sanity floor — "
                      "NOT recorded", flush=True)
                continue
            row = {"config": cfg, "deep_sync": True, "deep_profile": prof,
                   "batch": B, "buf_len": buf_len,
                   "frame_bytes": g.frame_bytes,
                   "msamples_per_s": round(B * buf_len / (ms / 1e3) / 1e6, 1),
                   "decode_goodput_mbit_s": round(
                       int(ok.sum()) * g.frame_bytes * 8 / (ms / 1e3) / 1e6, 1),
                   "realtime_channels": int(B * buf_len / (ms / 1e3) // 48000),
                   "crc_ok_frac": round(float(ok.mean()), 4),
                   "ms_per_call": round(ms, 3),
                   "compile_s": round(compile_s, 1)}
            table["per_mode"].append(row)
            save_table()
            print(json.dumps(row), flush=True)
        except Exception as e:          # noqa: BLE001
            print(f"cfg{cfg} {prof} FAILED: {type(e).__name__}: {e}",
                  flush=True)

    # ---- 3. bench.py headline (in-process, cfg9 program already warm in
    # a separate executable cache entry)
    if left() > 900:
        try:
            import bench
            bench.worker("tpu")
        except (Exception, SystemExit) as e:    # noqa: BLE001
            print(f"bench FAILED: {type(e).__name__}: {e}", flush=True)

    # ---- 4. on-chip threshold FER for the c2f path (pallas kernel active
    # on TPU): cfg0 passband threshold point at 1024 frames
    fer_out = {"meta": {"platform": platform,
                        "point_db": -3.75, "frames": 1024}}
    if left() > 900:
        try:
            from mercury_tpu.channel.ber import BerHarness

            h = BerHarness(0, batch=128, deep_profile="c2f")
            t0 = time.time()
            p = h.run_point(-3.75, 1024)
            fer_out["c2f_fer"] = round(p.fer, 4)
            print(f"on-chip cfg0 c2f FER @-3.75: {p.fer:.4f} "
                  f"({time.time()-t0:.0f}s)", flush=True)
            with open(os.path.join(DOCS, "deep_c2f_r4.json"), "w") as f:
                json.dump(fer_out, f, indent=1)
        except Exception as e:          # noqa: BLE001
            print(f"on-chip FER FAILED: {type(e).__name__}: {e}", flush=True)

    # ---- 5. StreamPool end-to-end serving benchmark
    if left() > 1200:
        try:
            import tools.serve_bench as sb
            sys.argv = [sys.argv[0], "--channels", "64", "256", "1024",
                        "--rounds", "6"]
            sb.main()
        except (Exception, SystemExit) as e:    # noqa: BLE001
            print(f"serve_bench FAILED: {type(e).__name__}: {e}", flush=True)

    print(f"session_r4 done in {time.time() - T0:.0f}s", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
