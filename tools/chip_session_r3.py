#!/usr/bin/env python
"""One consolidated on-chip measurement session (round 3).

Runs, in ONE process (tunnel etiquette: a single client, no external kills,
self-bounded wall clock):
  1. tools/roofline_k.py main  -> docs/roofline_r3.json (amortized per-stage
     rooflines incl. the deep-sync MF jnp.fft vs fft_mm A/B)
  2. deep-sync mode throughput (CONFIG_0-4 + CONFIG_0 deep-off) with the
     MXU matmul-FFT correlation -> updates those rows in
     docs/throughput_r3.json in place (non-deep rows' programs are
     untouched by the change and keep their recorded values)
  3. CONFIG_0 threshold-quality check at the FER~0.1 point (the bf16-matmul
     arbitration must not cost sensitivity vs the CPU f32 result)

Usage: python tools/chip_session_r3.py [budget_minutes]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

T0 = time.time()
BUDGET_S = (float(sys.argv[1]) if len(sys.argv) > 1 else 75.0) * 60.0


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


def main() -> int:
    # 1. amortized rooflines (writes docs/roofline_r3.json)
    if step("roofline_k", 25 * 60):
        try:
            import tools.roofline_k as rk
            sys.argv = [sys.argv[0]]    # rk.main reads argv[1] as its K
            rk.main()
        except Exception as e:          # noqa: BLE001 - keep session alive
            print(f"roofline_k FAILED: {type(e).__name__}: {e}", flush=True)

    # 2. deep-sync throughput rows
    docs = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "docs", "throughput_r3.json")
    from tools.throughput_table import measure
    new_rows = {}
    for cfg, deep in [(0, None), (1, None), (2, None), (3, None), (4, None),
                      (0, False)]:
        label = f"cfg{cfg}{'_nodeep' if deep is False else ''}"
        if not step(f"throughput {label}", 6 * 60):
            break
        try:
            r = measure(cfg, 256, 10, deep_sync=deep)
            new_rows[(cfg, r["deep_sync"])] = r
            print(json.dumps(r), flush=True)
        except Exception as e:          # noqa: BLE001
            print(f"measure({label}) FAILED: {type(e).__name__}: {e}",
                  flush=True)
    if new_rows:
        with open(docs) as f:
            table = json.load(f)
        for row in table["per_mode"]:
            key = (row["config"], row["deep_sync"])
            if key in new_rows:
                row.update(new_rows.pop(key))
                row["note"] = "fft_mm deep-sync correlation (round-3 update)"
        for r in new_rows.values():     # rows not previously in the table
            r["note"] = "fft_mm deep-sync correlation (round-3 update)"
            table["per_mode"].append(r)
        with open(docs, "w") as f:
            json.dump(table, f, indent=1)
        print(f"updated {docs}", flush=True)

    # 3. threshold-quality check at the CONFIG_0 passband FER~0.1 point
    if step("cfg0 threshold quality", 8 * 60):
        try:
            import jax
            import jax.numpy as jnp
            import numpy as np

            from mercury_tpu.channel import sim
            from mercury_tpu.core.geometry import build_geometry
            from mercury_tpu.modem.rx import RxChain
            from mercury_tpu.modem.tx import TxChain

            g = build_geometry(0)
            tx, rx = TxChain(g), RxChain(g, deep_sync=True)
            rng = np.random.default_rng(11)
            B = 256
            payload = rng.integers(0, 256, (B, g.frame_bytes)).astype(np.uint8)
            frames = tx.transmit(payload)
            buf_len = g.nofdm * g.buffer_nsymb * g.interp
            delay = ((g.preamble_nsymb + 2) * g.nofdm + 37) * g.interp
            buf = sim.awgn_passband(jax.random.key(5), frames,
                                    sim.sigma_for_esn0(-3.75), delay, buf_len)
            res = rx.receive(jnp.asarray(buf, jnp.float32))
            ok = np.asarray(res.crc_ok)
            print(json.dumps({
                "check": "cfg0_threshold_minus3.75dB",
                "decoded": int(ok.sum()), "batch": B,
                "fer": round(1.0 - ok.sum() / B, 4),
                "cpu_f32_reference_fer": 0.086,
            }), flush=True)
        except Exception as e:          # noqa: BLE001
            print(f"threshold check FAILED: {type(e).__name__}: {e}",
                  flush=True)

    print(f"\nsession done in {time.time() - T0:.0f}s", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
