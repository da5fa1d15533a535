"""Multi-chip scaling: channel-parallel and time-parallel sharding.

The reference modem is single-process pthreads (SURVEY §2.7); distribution is
new design here. Two first-class axes:

- **channels** ('ch'): independent capture buffers / codewords — pure data
  parallelism via NamedSharding; zero communication.
- **time** ('t'): one long capture stream split across chips — overlap-save:
  each shard needs a halo of (preamble+frame) samples from its right
  neighbour for sync windows and FIR tails, exchanged with ppermute over ICI.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from mercury_tpu.dsp import ops


def make_mesh(n_devices: int | None = None, axis: str = "ch") -> Mesh:
    devs = jax.devices()
    n = n_devices or len(devs)
    return Mesh(np.array(devs[:n]), (axis,))


def shard_batch(mesh: Mesh, x, axis: str = "ch"):
    """Place a [B, ...] array with the batch axis sharded over the mesh."""
    return jax.device_put(x, NamedSharding(mesh, P(axis)))


def channel_parallel_receive(rx_chain, mesh: Mesh, axis: str = "ch"):
    """Wrap RxChain.receive as an SPMD program over the channel axis.

    The per-chip program is identical to single-chip receive; XLA partitions
    every stage (FIR conv, FFTs, estimation matmul, LDPC BP) along the batch
    dimension with no collectives — linear scaling by construction.
    """
    spec = NamedSharding(mesh, P(axis))
    return jax.jit(rx_chain.receive_fn, in_shardings=(spec,))


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
