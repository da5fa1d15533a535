"""Native runtime tests: ring buffer, sliding capture window, shm IPC —
including a streaming end-to-end decode through the native window."""

import threading

import numpy as np
import pytest

from mercury_tpu.native import SampleRing, ShmPayloadRing, SlidingWindow


def test_ring_roundtrip():
    r = SampleRing(1024)
    x = np.arange(300, dtype=np.float32)
    assert r.write(x) == 300
    assert len(r) == 300
    got = r.read(300)
    np.testing.assert_array_equal(got, x)
    assert len(r) == 0


def test_ring_overflow_truncates():
    r = SampleRing(100)
    x = np.ones(150, dtype=np.float32)
    assert r.write(x) == 100
    assert r.write(x) == 0


def test_ring_blocking_read_across_threads():
    r = SampleRing(48000)
    result = {}

    def reader():
        result["data"] = r.read(1000, timeout_ms=2000)

    t = threading.Thread(target=reader)
    t.start()
    r.write(np.full(1000, 7.0, dtype=np.float32))
    t.join(timeout=3)
    assert len(result["data"]) == 1000
    assert (result["data"] == 7.0).all()


def test_sliding_window_protocol():
    """frames_to_read counts down one symbol period per shift; data_ready
    latches at zero; further shifts count n_under (reference capture-prep
    protocol, audioio.c:999-1069)."""
    sym = 16
    w = SlidingWindow(window_len=8 * sym, symbol_len=sym)
    w.arm(frames_to_read=3)
    for k in range(3):
        w.push(np.full(sym, float(k + 1), dtype=np.float32))
    assert w.ready
    snap, ready = w.snapshot()
    assert ready
    # last three symbols of the window are the pushes, in order
    np.testing.assert_array_equal(snap[-sym:], 3.0)
    np.testing.assert_array_equal(snap[-2 * sym: -sym], 2.0)
    assert w.n_under == 0
    w.push(np.full(sym, 9.0, dtype=np.float32))   # consumer busy -> under
    assert w.n_under == 1


def test_window_pool_matches_sliding_window():
    """WindowPool (vectorized rt_pool) reproduces SlidingWindow semantics
    per channel: countdown per committed symbol, ready latch, n_under on
    extra shifts, linearized gather content identical to the scalar
    window's snapshot — including partial-symbol staging across feeds."""
    from mercury_tpu.native import WindowPool

    sym, nsym, n_ch = 16, 8, 5
    pool = WindowPool(n_ch, window_len=nsym * sym, symbol_len=sym)
    refs = [SlidingWindow(window_len=nsym * sym, symbol_len=sym)
            for _ in range(n_ch)]
    rng = np.random.default_rng(3)
    pool.arm_many(np.arange(n_ch, dtype=np.int32),
                  np.full(n_ch, 3, np.int32))
    for r in refs:
        r.arm(3)
    # ragged feeds with non-symbol-aligned chunk sizes
    for c in range(n_ch):
        total = 3 * sym + (7 * c) % sym          # channel c: partial tail
        data = rng.standard_normal(total).astype(np.float32)
        pos = 0
        for chunk in (total // 3, total // 3, total - 2 * (total // 3)):
            pool.feed(c, data[pos: pos + chunk])
            refs[c].push(data[pos: pos + chunk])
            pos += chunk
    assert pool.ready_count == n_ch
    rows, ids = pool.gather_ready()
    assert sorted(ids.tolist()) == list(range(n_ch))
    for r_i, c in enumerate(ids):
        snap, ready = refs[c].snapshot()
        assert ready
        np.testing.assert_array_equal(rows[r_i], snap)
    # extra commits while ready -> n_under, matching the scalar window
    pool.feed(0, np.zeros(2 * sym, np.float32))
    refs[0].push(np.zeros(2 * sym, np.float32))
    assert pool.n_under(0) == refs[0].n_under == 2
    # re-arm clears ready
    pool.arm(0, 2)
    assert pool.ready_count == n_ch - 1


def test_window_pool_feed_block():
    """feed_block feeds every channel its row of one [C, n] block in a
    single native call, equivalent to per-channel feeds."""
    from mercury_tpu.native import WindowPool

    sym, nsym, n_ch = 32, 4, 3
    a = WindowPool(n_ch, nsym * sym, sym)
    b = WindowPool(n_ch, nsym * sym, sym)
    rng = np.random.default_rng(4)
    a.arm_many(np.arange(n_ch, dtype=np.int32), np.full(n_ch, 2, np.int32))
    b.arm_many(np.arange(n_ch, dtype=np.int32), np.full(n_ch, 2, np.int32))
    blk = rng.standard_normal((n_ch, 2 * sym + 5)).astype(np.float32)
    a.feed_block(blk)
    for c in range(n_ch):
        b.feed(c, blk[c])
    ra, ia = a.gather_ready()
    rb, ib = b.gather_ready()
    np.testing.assert_array_equal(ia, ib)
    np.testing.assert_array_equal(ra, rb)


def test_shm_ipc_roundtrip():
    a = ShmPayloadRing("/mtpu-test", 4096, create=True)
    try:
        b = ShmPayloadRing("/mtpu-test", 4096, create=False)
        msg = b"payload across processes" * 10
        assert a.write(msg) == len(msg)
        assert len(b) == len(msg)
        assert b.read(len(msg)) == msg
    finally:
        a.close()


def test_streaming_decode_through_native_window():
    """Feed a TX frame through the native sliding window in audio-sized
    chunks and decode from window snapshots — the streaming RX path."""
    from mercury_tpu.core.geometry import build_geometry
    from mercury_tpu.modem.rx import RxChain
    from mercury_tpu.modem.tx import TxChain

    g = build_geometry(9)
    tx, rx = TxChain(g), RxChain(g)
    payload = np.arange(g.frame_bytes, dtype=np.uint8)[None]
    frame = np.asarray(tx.transmit(payload))[0]

    buf_len = g.nofdm * g.buffer_nsymb * g.interp
    sym_len = g.nofdm * g.interp
    w = SlidingWindow(buf_len, sym_len)
    w.arm(frames_to_read=g.buffer_nsymb)

    stream = np.concatenate([np.zeros(3 * sym_len, np.float32),
                             frame.astype(np.float32),
                             np.zeros(buf_len, np.float32)])
    chunk = 480  # 10 ms of audio per push
    decoded = False
    for pos in range(0, len(stream), chunk):
        w.push(stream[pos: pos + chunk])
        if w.ready:
            snap, _ = w.snapshot()
            res = rx.receive(snap[None])
            if bool(np.asarray(res.crc_ok)[0]):
                assert (np.asarray(res.payload)[0] == payload[0]).all()
                decoded = True
                break
            w.arm(frames_to_read=4)   # slide 4 more symbols and retry
    assert decoded


def test_sanitized_selftest(tmp_path):
    """Build the native runtime's RT_SELFTEST main under ASan+UBSan and run
    it: the ring / sliding-window / shm protocols must be clean under the
    sanitizers (the reference's build.sh asan/ubsan modes, README.md:60-67)."""
    import pathlib
    import shutil
    import subprocess

    if shutil.which("g++") is None:
        import pytest
        pytest.skip("no g++ toolchain")
    src = (pathlib.Path(__file__).resolve().parents[1]
           / "mercury_tpu" / "native" / "runtime.cc")
    exe = tmp_path / "rt_selftest"
    subprocess.run(
        ["g++", "-std=c++17", "-O1", "-g", "-fsanitize=address,undefined",
         "-fno-sanitize-recover=all", "-DRT_SELFTEST", str(src),
         "-o", str(exe), "-lpthread", "-lrt"],
        check=True)
    out = subprocess.run([str(exe)], capture_output=True, text=True,
                         timeout=120)
    assert out.returncode == 0, out.stderr[-2000:]
    assert "rt_selftest OK" in out.stdout
