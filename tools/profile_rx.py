#!/usr/bin/env python
"""Per-stage timing of the RX chain on the active backend.

Breaks receive() into its pipeline stages and times each jitted piece
separately to find where the samples/s budget goes.
"""

import time
import sys

import jax
import jax.numpy as jnp
import numpy as np

from mercury_tpu.channel import sim
from mercury_tpu.core.geometry import build_geometry
from mercury_tpu.dsp import ops
from mercury_tpu.fec import ldpc
from mercury_tpu.modem import sync
from mercury_tpu.modem.rx import RxChain
from mercury_tpu.modem.tx import TxChain

CFG = int(sys.argv[1]) if len(sys.argv) > 1 else 9
BATCH = int(sys.argv[2]) if len(sys.argv) > 2 else 32
REPS = 10


def timeit(name, fn, *args):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(REPS):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / REPS
    print(f"{name:34s} {dt*1e3:9.3f} ms")
    return out, dt


def main():
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
    print(f"cfg={CFG} batch={BATCH} buf_len={buf_len} "
          f"({BATCH*buf_len/1e6:.2f} Msamples/iter)")

    _, t_total = timeit("receive() total", rx.receive, buf)

    mix_fn = jax.jit(lambda pb: rx.mix(pb, 0.0))
    iq, t_mix = timeit("mix (full buffer)", mix_fn, buf)

    fir2_fn = jax.jit(lambda x: ops.fir_same_strided(x, rx._fir_ts, 2))
    bb2, t_fir = timeit("fir_same_strided /2 (TS)", fir2_fn, iq)

    sc_fn = jax.jit(lambda x: sync.schmidl_cox_metric(x, g, decim=2))
    (met, cfo), t_sc = timeit("schmidl_cox_metric", sc_fn, bb2)

    dly = jnp.full((BATCH,), delay, jnp.int32)
    ext_fn = jax.jit(lambda x, d: rx.extract_frame_decimated(x, d, rx.active_nsymb))
    dec0, t_ext = timeit("extract_frame_decimated", ext_fn, iq, dly)

    dg_fn = jax.jit(rx.demod_grid)
    grid, t_dg = timeit("demod_grid", dg_fn, dec0)

    gs_fn = jax.jit(rx.grid_stats)
    _, t_gs = timeit("grid_stats (1 hyp)", gs_fn, grid)

    do_fn = jax.jit(rx.decode_ofdm)
    (llr, _, _, _), t_do = timeit("decode_ofdm (est+eq+demap)", do_fn, grid)

    lp_fn = jax.jit(rx.llr_to_payload)
    _, t_lp = timeit("llr_to_payload (LDPC+CRC)", lp_fn, llr)

    llr_n = jnp.concatenate([
        llr[..., : g.n_real], llr[..., : g.n_virtual],
        llr[..., g.n_real: g.n_real + g.ldpc_p]], axis=-1).astype(jnp.float32)
    dec_fn = jax.jit(lambda l: ldpc.decode(l, g.spec.ldpc_rate_num))
    _, t_ldpc = timeit("ldpc.decode alone", dec_fn, llr_n)

    sps = BATCH * buf_len / t_total
    print(f"\nreceive() = {sps/1e6:.1f} Msamples/s")
    known = t_mix + t_fir + t_sc + t_ext + t_dg + t_lp
    print(f"stage sum (1-hyp path) = {known*1e3:.2f} ms vs total {t_total*1e3:.2f} ms")


if __name__ == "__main__":
    main()
