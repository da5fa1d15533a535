#!/usr/bin/env python
"""Headline benchmark: RX samples/s/chip (full demod + LDPC decode).

Runs the complete per-mode RX program (mixer + FIR + sync + channel est +
equalize + demap + LDPC BP + CRC) on a batch of capture buffers and measures
passband samples processed per second on one chip.

Baseline: the reference C++ modem's receive_byte throughput on this host's
CPU (tools/golden_gen rxbench 9 -> 1.77 Msamples/s single thread).
vs_baseline is the speedup over that.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

The main process only orchestrates: the measurement runs in a subprocess so a
wedged TPU tunnel (this environment's axon relay can hang after an aborted
session) times out cleanly and falls back to the CPU backend rather than
hanging the driver.
"""

import json
import os
import subprocess
import sys
import time

REFERENCE_CPU_SAMPLES_PER_S = 1.77e6  # tools/golden_gen rxbench 9 10 (this host)
CFG = 9            # QPSK 8/16 — mid-ladder workhorse mode
BATCH = 256        # past the dispatch-latency knee (throughput ~flat 128-256)
REPS = 10
TPU_TIMEOUT_S = 2700   # generous: stalls observed at 10-25 min; the worker
                       # is never killed at this deadline (see run_worker),
                       # only abandoned — killing a TPU client mid-claim can
                       # wedge the axon relay for hours


def worker(platform: str) -> None:
    import jax

    if platform == "cpu":
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from mercury_tpu.channel import sim
    from mercury_tpu.core.geometry import build_geometry
    from mercury_tpu.modem.rx import RxChain
    from mercury_tpu.modem.tx import TxChain
    import numpy as np

    g = build_geometry(CFG)
    tx, rx = TxChain(g), RxChain(g)
    rng = np.random.default_rng(0)
    payload = rng.integers(0, 256, (BATCH, g.frame_bytes)).astype(np.uint8)
    frames = tx.transmit(payload)
    buf_len = g.nofdm * g.buffer_nsymb * g.interp
    delay = ((g.preamble_nsymb + 2) * g.nofdm + 50) * g.interp
    buf = sim.awgn_passband(jax.random.key(1), frames, sim.sigma_for_esn0(12.0),
                            delay, buf_len)
    buf = jnp.asarray(buf, dtype=jnp.float32)

    res = rx.receive(buf)           # compile + warmup
    ok = np.asarray(res.crc_ok)
    if not ok.all():
        print(f"warning: only {int(ok.sum())}/{BATCH} decoded in warmup",
              file=sys.stderr)
    jax.block_until_ready(res.payload)

    # Robust timing: after a compile stall the axon relay can stop blocking
    # on completion (block_until_ready returns early — a ~8 ms-class call
    # reads ~0.2 ms) and it content-caches repeated identical executions.
    # Defeat both by construction: give every rep a distinct input (a
    # float-bit-level perturbation far below the channel noise floor) and
    # use a small D2H transfer as the completion barrier (the relay must
    # produce real bytes); time chains of N and 2N reps and difference
    # them so the barrier/dispatch overhead cancels.
    seq = [0]

    def run_chain(n: int) -> float:
        t0 = time.perf_counter()
        r = None
        for _ in range(n):
            seq[0] += 1
            r = rx.receive(buf + jnp.float32(seq[0] * 1e-7))
        np.asarray(r.payload[:1, :4])          # D2H barrier
        return time.perf_counter() - t0

    run_chain(1)                               # warm the perturbed path
    t_n = run_chain(REPS)
    t_2n = run_chain(2 * REPS)
    dt = max(t_2n - t_n, 1e-9)                 # = REPS real calls

    # plausibility guard: a batch-256 full-RX call cannot beat ~2 ms on
    # this chip; if even the differenced timing is absurd, wait the relay
    # out and finally fall back rather than record an impossible rate
    tries = 0
    while platform == "tpu" and dt / REPS * 1e3 < 2.0 and tries < 5:
        print(f"timing artifact ({dt/REPS*1e3:.3f} ms/call) — waiting for "
              "the relay to settle", file=sys.stderr)
        time.sleep(90)
        t_n = run_chain(REPS)
        t_2n = run_chain(2 * REPS)
        dt = max(t_2n - t_n, 1e-9)
        tries += 1
    if platform == "tpu" and dt / REPS * 1e3 < 2.0:
        # Emit no JSON: the orchestrator treats a silent TPU worker as
        # tunnel-down and falls back to the CPU measurement, whose
        # "platform": "cpu" field already documents that situation —
        # strictly better than recording an impossible rate.
        print("artifact persisted; refusing to record (last sane capture: "
              "docs/throughput_r3.json)", file=sys.stderr)
        raise SystemExit(3)

    sps = BATCH * buf_len * REPS / dt
    # scaling prediction from the analytic communication account
    # (scale/analysis.py; the compiled-collective audit in
    # tests/test_scale.py proves channel-parallel RX contains ZERO
    # collectives, so its 1-chip -> 2-host efficiency is 100% by
    # construction; time-sharded RX moves one frame halo per shard block)
    from mercury_tpu.scale import analysis
    pred = analysis.predicted_efficiency(sps / 1e6, g)
    print(json.dumps({
        "metric": "rx_demod_ldpc_samples_per_sec_per_chip",
        "value": round(sps / 1e6, 3),
        "unit": "Msamples/s",
        "vs_baseline": round(sps / REFERENCE_CPU_SAMPLES_PER_S, 2),
        "platform": platform,
        "scaling": {
            "channel_parallel_collective_bytes": 0,
            "channel_parallel_2host_efficiency": 1.0,
            "time_sharded_halo_bytes_per_block":
                pred["time_sharded_rx"]["comm_bytes_per_block"],
            "time_sharded_2host_eff_serialized_dcn":
                pred["time_sharded_rx"]["efficiency_serialized"],
            "time_sharded_2host_eff_overlapped_dcn":
                pred["time_sharded_rx"]["efficiency_overlapped"],
        },
    }))


def audit_worker() -> None:
    """Structural overlap audit (CPU, 2 virtual devices): compile the
    double-buffered stream RX and machine-check from the HLO that the halo
    collective-permute is dependency-free against the decode (the overlap
    is compiled in, not modeled). Prints one JSON line."""
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from mercury_tpu.core.geometry import build_geometry
    from mercury_tpu.modem.rx import RxChain
    from mercury_tpu.scale import analysis, shard

    g = build_geometry(16, with_pre_eq=False)   # smallest frame geometry
    rx = RxChain(g)
    n_dev, k_blocks = 2, 2
    mesh = shard.make_mesh(n_dev, axis="t")
    n_local = g.nofdm * g.buffer_nsymb * g.interp
    x = jnp.zeros((1, k_blocks, n_dev * n_local), jnp.float32)
    run = shard.time_sharded_receive_stream(rx, mesh, n_blocks=k_blocks,
                                            time_axis="t")
    rep = analysis.audit_overlap_structure(run, x)
    print(json.dumps({
        "overlap_compiled": bool(rep.get("overlap_compiled")),
        "halo_permute_bytes": rep.get("halo_permute_bytes"),
        "body_heavy_ops": rep.get("body_heavy_ops"),
    }))


def run_worker(platform: str, timeout: int) -> str | None:
    # No-kill policy: killing a TPU client mid-compile/claim can wedge the
    # axon relay for hours (.claude/skills/verify/SKILL.md). Poll with a
    # generous deadline; past it, ABANDON the child (leave it to finish and
    # exit on its own) and fall back — never terminate it.
    import tempfile

    env = dict(os.environ)
    out_f = tempfile.NamedTemporaryFile("w+", suffix=f"_bench_{platform}.out",
                                        delete=False)
    err_f = tempfile.NamedTemporaryFile("w+", suffix=f"_bench_{platform}.err",
                                        delete=False)
    mode = ("--audit-worker" if platform == "audit" else "--worker")
    argv = [sys.executable, os.path.abspath(__file__), mode]
    if mode == "--worker":
        argv.append(platform)
    else:
        env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "")
                            + " --xla_force_host_platform_device_count=2")
    p = subprocess.Popen(
        argv, stdout=out_f, stderr=err_f, text=True, env=env,
        cwd=os.path.dirname(os.path.abspath(__file__)))
    deadline = time.time() + timeout
    while p.poll() is None and time.time() < deadline:
        time.sleep(5)
    if p.poll() is None:
        print(f"bench worker ({platform}) exceeded {timeout}s — abandoned "
              f"(pid {p.pid} left to exit on its own; output {out_f.name})",
              file=sys.stderr)
        return None
    out_f.flush()
    err_f.flush()
    with open(out_f.name) as f:
        stdout = f.read()
    with open(err_f.name) as f:
        stderr = f.read()
    # normal exit: the captures have been read — remove them (they are kept
    # only for abandoned workers, where the child still owns the handles)
    for fobj in (out_f, err_f):
        fobj.close()
        try:
            os.unlink(fobj.name)
        except OSError:
            pass
    for line in stdout.splitlines():
        if line.startswith("{"):
            return line
    print(stderr[-2000:], file=sys.stderr)
    return None


def main() -> int:
    if len(sys.argv) > 1 and sys.argv[1] == "--audit-worker":
        audit_worker()
        return 0
    if len(sys.argv) > 2 and sys.argv[1] == "--worker":
        worker(sys.argv[2])
        return 0
    want_cpu = os.environ.get("JAX_PLATFORMS", "").strip().lower() == "cpu"
    line = None
    if not want_cpu:
        line = run_worker("tpu", TPU_TIMEOUT_S)
    if line is None:
        line = run_worker("cpu", TPU_TIMEOUT_S)
    if line is None:
        print(json.dumps({"metric": "rx_demod_ldpc_samples_per_sec_per_chip",
                          "value": 0.0, "unit": "Msamples/s",
                          "vs_baseline": 0.0, "error": "all backends failed"}))
        return 1
    # structural overlap audit (CPU, quick): proves the double-buffered
    # halo exchange of time_sharded_receive_stream is compiled in, so the
    # overlapped (not serialized) efficiency is the applicable 2-host number
    audit_line = run_worker("audit", 900)
    try:
        rec = json.loads(line)
        audit = json.loads(audit_line) if audit_line else {
            "overlap_compiled": None}
        if "scaling" in rec:
            rec["scaling"]["time_sharded_overlap_compiled"] = (
                audit.get("overlap_compiled"))
            rec["scaling"]["overlap_evidence"] = (
                "scale/shard.py:time_sharded_receive_stream double-buffered "
                "halo scan; HLO audit scale/analysis.py:"
                "audit_overlap_structure (halo permute of "
                f"{audit.get('halo_permute_bytes')} B dependency-free "
                f"against {audit.get('body_heavy_ops')} decode ops)")
        line = json.dumps(rec)
    except (json.JSONDecodeError, TypeError):
        pass
    print(line)
    return 0


if __name__ == "__main__":
    sys.exit(main())
