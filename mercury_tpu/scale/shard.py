"""Multi-chip scaling: channel-parallel and time-parallel sharding.

The reference modem is single-process pthreads (SURVEY §2.7); distribution is
new design here. Two first-class axes:

- **channels** ('ch'): independent capture buffers / codewords — pure data
  parallelism via NamedSharding; zero communication.
- **time** ('t'): one long capture stream split across chips — overlap-save:
  each shard needs a halo of (preamble+frame) samples from its right
  neighbour for sync windows and FIR tails, exchanged with ppermute over ICI.

At multi-host scale the two compose on a 2-D mesh ('dcn', 'ch'):
independent streams data-parallel over the slow DCN axis (zero collectives
cross slice), each stream time-sharded over the fast ICI axis so the only
communication — halo ppermute — stays on ICI (make_mesh_2d +
time_sharded_receive(batch_axis='dcn')).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from mercury_tpu.dsp import ops
from mercury_tpu.modem.rx import RxResult


def make_mesh(n_devices: int | None = None, axis: str = "ch") -> Mesh:
    devs = jax.devices()
    n = n_devices or len(devs)
    return Mesh(np.array(devs[:n]), (axis,))


def make_mesh_2d(n_outer: int, n_inner: int,
                 axes: tuple[str, str] = ("dcn", "ch")) -> Mesh:
    """2-D mesh [n_outer, n_inner] with the OUTER axis laid across the slow
    interconnect (DCN / host boundaries) and the INNER axis across ICI.

    On a real multi-slice TPU deployment jax.experimental.mesh_utils
    assigns devices so that inner-axis neighbours share a slice (collectives
    on the inner axis ride ICI); on a single slice — or the virtual CPU
    mesh — a plain reshape gives the same logical topology.
    """
    devs = jax.devices()
    if n_outer * n_inner > len(devs):
        raise ValueError(f"mesh {n_outer}x{n_inner} needs more than the "
                         f"{len(devs)} available devices")
    n_slices = len({getattr(d, "slice_index", 0) for d in devs})
    if n_slices > 1:
        from jax.experimental import mesh_utils
        arr = mesh_utils.create_hybrid_device_mesh(
            (1, n_inner), (n_outer, 1), devices=devs[: n_outer * n_inner])
        arr = arr.reshape(n_outer, n_inner)
    else:
        arr = np.array(devs[: n_outer * n_inner]).reshape(n_outer, n_inner)
    return Mesh(arr, axes)


def shard_batch(mesh: Mesh, x, axis: str = "ch"):
    """Place a [B, ...] array with the batch axis sharded over the mesh."""
    return jax.device_put(x, NamedSharding(mesh, P(axis)))


def channel_parallel_receive(rx_chain, mesh: Mesh, axis: str = "ch"):
    """Wrap RxChain.receive as an SPMD program over the channel axis.

    Built with shard_map, so each chip runs the unmodified single-chip
    receive program on its rows and a cross-device op is impossible by
    construction (the local program names no mesh axes) — the compiled HLO
    contains zero collectives, asserted in
    tests/test_scale.py::test_channel_parallel_compiles_to_zero_collectives.
    (The earlier jit+in_shardings formulation let the GSPMD partitioner
    insert all-gathers around FFT custom-calls on the CPU backend and an
    all-reduce for the decision-directed batch gate; shard_map keeps the DD
    gate per-shard, which is also the better policy.)
    """
    def local(pb):
        return rx_chain.receive_fn(pb)

    return jax.jit(jax.shard_map(local, mesh=mesh, in_specs=P(axis),
                                 out_specs=P(axis)))


def weak_scaling_curve(rx_chain, device_counts=(1, 2, 4, 8),
                       reps: int = 3) -> list[dict]:
    """Weak-scaling measurement over the channel axis: one capture buffer
    per device, samples/s vs device count, efficiency vs 1 device
    (BASELINE: ">=80% linear samples/s scaling"). On the virtual CPU mesh
    the absolute numbers share host cores — the curve tracks that the SPMD
    partitioning itself introduces no serialization or collectives; on a
    real multi-chip slice the same code measures true scaling."""
    import time

    g = rx_chain.geom
    buf_len = g.nofdm * g.buffer_nsymb * g.interp
    rng = np.random.default_rng(0)
    avail = len(jax.devices())
    out = []
    base = None
    for d in device_counts:
        if d > avail:
            break
        mesh = make_mesh(d)
        buf = rng.standard_normal((d, buf_len)).astype(np.float32)
        run = channel_parallel_receive(rx_chain, mesh)
        x = shard_batch(mesh, jnp.asarray(buf))
        res = run(x)
        jax.block_until_ready(res.payload)          # compile + warmup
        t0 = time.perf_counter()
        for _ in range(reps):
            res = run(x)
        jax.block_until_ready(res.payload)
        dt = (time.perf_counter() - t0) / reps
        sps = d * buf_len / dt
        if base is None:
            base = sps
        out.append({"devices": d, "msamples_per_s": round(sps / 1e6, 2),
                    "efficiency_vs_linear": round(sps / (base * d), 3)})
    return out


def halo_exchange(x_shard: jnp.ndarray, left: int, right: int,
                  axis_name: str) -> jnp.ndarray:
    """Overlap-save halo exchange inside shard_map: prepend `left` samples
    from the left neighbour's tail and append `right` samples from the right
    neighbour's head. Stream edges receive zeros (non-cyclic ppermute).
    [..., n_local] -> [..., left + n_local + right], over ICI."""
    n_dev = jax.lax.axis_size(axis_name)
    parts = []
    if left > 0:
        tail = x_shard[..., -left:]
        perm = [(i, i + 1) for i in range(n_dev - 1)]   # send tail rightward
        parts.append(jax.lax.ppermute(tail, axis_name, perm))
    parts.append(x_shard)
    if right > 0:
        head = x_shard[..., :right]
        perm = [(i + 1, i) for i in range(n_dev - 1)]   # send head leftward
        parts.append(jax.lax.ppermute(head, axis_name, perm))
    return jnp.concatenate(parts, axis=-1)


def time_sharded_receive(rx_chain, mesh: Mesh, time_axis: str = "t",
                         halo: int | None = None,
                         batch_axis: str | None = None):
    """Full RX over one long capture stream time-sharded across chips.

    The TPU-native analogue of the reference's sliding capture window
    (audioio.c:999-1069) at pod scale: the stream [B, N] is split along time
    over the mesh; every chip extends its slice with a right halo (one frame
    + margin) from its neighbour via ppermute, runs the complete receive
    program (sync + CFO + demod + LDPC) on the extended window, and claims
    only frames that *start* inside its own slice — a frame seam never splits
    a decode. receive_fn returns one frame per window, so each slice must
    contain at most ONE frame start (slice length on the order of the frame
    spacing); denser streams belong to modem.stream.StreamReceiver.

    Returns a jitted f(pb [B, N]) -> RxResult with leading shard axis
    [n_dev, B]; `delay` is globalized to stream sample offsets and `crc_ok`
    is False for chips that found no frame of their own.

    batch_axis: on a 2-D mesh (make_mesh_2d), additionally shard the stream
    batch over this (DCN) axis — independent streams per host group, each
    time-sharded over its group's ICI axis; the halo/dedupe ppermutes name
    only `time_axis`, so no collective ever crosses the DCN boundary.
    """
    g = rx_chain.geom
    frame_interp = (g.nofdm * (rx_chain.active_nsymb + g.preamble_nsymb)
                    * g.interp)
    if halo is None:
        halo = frame_interp + 2 * g.nofdm * g.interp

    sym_interp = g.nofdm * g.interp

    def local(pb):                                   # pb [B, n_local]
        n_local = pb.shape[-1]
        ext = halo_exchange(pb, 0, halo, time_axis)
        # candidates are restricted to starts inside the local slice — the
        # halo only completes local frames, it never donates its own
        res = rx_chain.receive_fn(ext, sync_limit=n_local)
        own = res.delay < n_local
        shard0 = jax.lax.axis_index(time_axis) * n_local
        claim = res.crc_ok & own
        gd = res.delay + shard0                      # global frame start
        # seam dedupe: a frame within MF-grid quantization of the boundary
        # can decode on both sides — the left shard wins, the right one
        # drops its duplicate (detected by near-equal global delay)
        n_dev = jax.lax.axis_size(time_axis)
        perm = [(i, i + 1) for i in range(n_dev - 1)]
        l_claim = jax.lax.ppermute(claim, time_axis, perm)
        l_delay = jax.lax.ppermute(gd, time_axis, perm)
        dup = l_claim & (jnp.abs(l_delay - gd) < sym_interp)
        claim = claim & ~dup
        return RxResult(
            payload=res.payload[None],
            crc_ok=claim[None],
            delay=gd[None],
            freq_offset=res.freq_offset[None],
            snr_db=res.snr_db[None],
            iters=res.iters[None],
            sync_metric=res.sync_metric[None],
            mean_h=res.mean_h[None])

    shard_fn = jax.shard_map(local, mesh=mesh,
                             in_specs=P(batch_axis, time_axis),
                             out_specs=P(time_axis, batch_axis))
    return jax.jit(shard_fn)


def time_sharded_fir(mesh: Mesh, taps: np.ndarray, time_axis: str = "t"):
    """Streaming FIR over a time-sharded signal with overlap-save halos.

    Returns a jitted f(x [B, N]) -> [B, N] with N sharded across the mesh;
    each chip convolves its slice extended by exact halos from both
    neighbours, so the result is bit-identical to the unsharded convolution
    (the TPU-native analogue of the reference's sliding capture window,
    SURVEY §5 long-context note).
    """
    ntaps = len(taps)
    center = (ntaps - 1) // 2
    left, right = center, ntaps - 1 - center
    taps_j = jnp.asarray(taps, dtype=jnp.float32)

    def local(x):
        ext = halo_exchange(x, left, right, time_axis)
        full = ops.fir_same(ext, taps_j)
        return full[..., left: left + x.shape[-1]]

    shard_fn = jax.shard_map(
        local, mesh=mesh,
        in_specs=P(None, time_axis), out_specs=P(None, time_axis))
    return jax.jit(shard_fn)
