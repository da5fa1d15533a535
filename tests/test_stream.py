"""Streaming receiver + batch-overlap TX tests."""

import numpy as np
import pytest

from mercury_tpu.core.geometry import build_geometry
from mercury_tpu.modem.rx import RxChain
from mercury_tpu.modem.stream import StreamReceiver
from mercury_tpu.modem.tx import TxChain


def test_stream_receiver_multiple_frames():
    """Three frames separated by gaps in one continuous stream, fed in
    audio-callback-sized chunks, all decoded in order."""
    g = build_geometry(9)
    tx = TxChain(g)
    payloads = np.stack([np.full(g.frame_bytes, 10 * i, np.uint8)
                         for i in range(1, 4)])
    frames = np.asarray(tx.transmit(payloads))
    gap = np.zeros(30000, np.float32)
    rng = np.random.default_rng(0)
    stream = np.concatenate(
        [gap] + sum([[f.astype(np.float32), gap] for f in frames], []))
    stream = stream + 0.002 * rng.standard_normal(len(stream)).astype(np.float32)

    rx = StreamReceiver(g)
    got = []
    for pos in range(0, len(stream), 480):     # 10 ms chunks
        for res in rx.feed(stream[pos: pos + 480]):
            got.append(np.asarray(res.payload)[0])
    # flush with silence so trailing frames can surface
    for _ in range(200):
        for res in rx.feed(np.zeros(480, np.float32)):
            got.append(np.asarray(res.payload)[0])
    assert len(got) == 3, f"decoded {len(got)} of 3 frames"
    for i, p in enumerate(got):
        assert (p == payloads[i]).all()


def test_transmit_batch_overlap_filtering():
    """Batch TX filters the concatenated stream; each frame still decodes,
    and interior frames match single-frame filtering away from edges."""
    g = build_geometry(6)
    tx, rx = TxChain(g), RxChain(g)
    payloads = np.stack([np.full(g.frame_bytes, 7 * (i + 1), np.uint8)
                         for i in range(3)])
    batch = np.asarray(tx.transmit_batch(payloads))
    assert batch.shape == (3, g.total_frame_size)
    buf_len = g.nofdm * g.buffer_nsymb * g.interp
    stream = batch.reshape(-1)
    for k in range(3):
        # window exactly one frame (back-to-back identical frames are
        # ambiguous to argmax sync; the link layer isolates the first frame
        # the same way — see ArqNode._receive_frames)
        win = np.zeros(buf_len, np.float32)
        chunk = stream[k * g.total_frame_size: (k + 1) * g.total_frame_size]
        win[: len(chunk)] = chunk
        res = rx.receive(win[None])
        assert bool(np.asarray(res.crc_ok)[0])
        assert (np.asarray(res.payload)[0] == payloads[k]).all()
    with pytest.raises(ValueError):
        tx.transmit_batch(np.zeros((2, 3), np.uint8))

def test_device_stream_pool_serving():
    """DeviceStreamPool keeps windows in device memory: uniform
    symbol-aligned blocks feed via a single upload + donated roll, ready
    rows gather on device, and every channel's frame decodes."""
    import jax
    from mercury_tpu.scale.serve import DeviceStreamPool

    jax.clear_caches()
    g = build_geometry(16)
    tx = TxChain(g)
    n_ch = 4
    pool = DeviceStreamPool(g, n_ch)
    rng = np.random.default_rng(3)
    payloads = rng.integers(0, 256, (n_ch, g.frame_bytes)).astype(np.uint8)
    frames = np.asarray(tx.transmit(payloads))
    sym = pool.sym_len
    total = pool.buf_len + 8 * sym
    streams = (2e-3 * rng.standard_normal((n_ch, total))).astype(np.float32)
    for c in range(n_ch):
        lead = (2 + c) * sym
        streams[c, lead: lead + frames.shape[1]] += frames[c]
    got: dict[int, bytes] = {}
    # feed in uniform 3-symbol blocks, stepping after each
    blk = 3 * sym
    for pos in range(0, total - blk + 1, blk):
        pool.feed_block(streams[:, pos: pos + blk])
        for c, res in pool.step():
            got.setdefault(c, bytes(np.asarray(res.payload)[0]))
        if len(got) == n_ch:
            break
    assert sorted(got) == list(range(n_ch))
    for c in range(n_ch):
        assert got[c] == bytes(payloads[c])
    assert pool.batched_dispatches < n_ch * 3
    with pytest.raises(AssertionError):
        pool.feed_block(streams[:, :sym + 1])     # ragged feed rejected


def test_stream_pool_batched_serving():
    """StreamPool multiplexes independent channels into batched dispatches:
    every channel's frame decodes, payloads match per channel, and the
    whole pool used far fewer receive dispatches than channels."""
    import jax
    from mercury_tpu.scale.serve import StreamPool

    jax.clear_caches()
    g = build_geometry(16)           # smallest frame -> fast CPU test
    tx = TxChain(g)
    n_ch = 6
    pool = StreamPool(g, n_ch)
    rng = np.random.default_rng(2)
    payloads = rng.integers(0, 256, (n_ch, g.frame_bytes)).astype(np.uint8)
    frames = np.asarray(tx.transmit(payloads))
    buf_len = pool.buf_len
    got: dict[int, bytes] = {}
    for c in range(n_ch):
        # noise lead-in of channel-dependent length, then the frame
        lead = 3000 + 257 * c
        stream = (2e-3 * rng.standard_normal(lead + buf_len)
                  ).astype(np.float32)
        stream[lead: lead + frames.shape[1]] += frames[c]
        pool.feed(c, stream)
    for _ in range(40):
        for c, res in pool.step():
            got.setdefault(c, bytes(np.asarray(res.payload)[0]))
        if len(got) == n_ch:
            break
    assert sorted(got) == list(range(n_ch))
    for c in range(n_ch):
        assert got[c] == bytes(payloads[c])
    assert pool.batched_dispatches < n_ch   # genuinely batched
