"""ARQ link-layer integration tests: two nodes over the simulated channel
(replaces the reference's virtual-audio-cable loopback tests, SURVEY §4.2)."""

import numpy as np
import pytest

from mercury_tpu.link import protocol as P
from mercury_tpu.link.node import ArqConfig, ArqNode
from mercury_tpu.link.sim import ChannelModel, LinkSimulator


def _session(init_cfg, snr_db, payload_len, gear=True, robust=False,
             batch=3, max_sim_s=1800, seed=0):
    cfg = ArqConfig(init_configuration=init_cfg, gear_shift_on=gear,
                    robust_enabled=robust, batch_size=batch)
    events = []
    cmd = ArqNode("VE3XYZ", P.COMMANDER, cfg, on_event=lambda e: events.append("C " + e))
    rsp = ArqNode("N0CALL", P.RESPONDER, cfg, on_event=lambda e: events.append("R " + e))
    sim = LinkSimulator(cmd, rsp, ChannelModel(snr_db=snr_db, seed=seed))
    payload = bytes(np.random.default_rng(seed).integers(0, 256, payload_len)
                    .astype(np.uint8))
    cmd.send_data(payload)
    cmd.connect("N0CALL")
    t = sim.run(max_sim_s=max_sim_s,
                until=lambda: len(rsp.fifo_rx) >= payload_len)
    return cmd, rsp, payload, rsp.received(), events, t


def test_protocol_roundtrips():
    assert P.callsign_unpack(P.callsign_pack("VE3XYZ")) == "VE3XYZ"
    assert P.callsign_unpack(P.callsign_pack("N0C")) == "N0C"
    m = P.Message(type=P.DATA_SHORT, id=7, sequence=2, length=3, data=b"abc")
    frame = P.serialize(m, 0x42)
    back = P.deserialize(frame, 10)
    assert back.type == P.DATA_SHORT and back.id == 7 and back.data[:3] == b"abc"
    assert P.crc8(b"N0CALL") == P.crc8(b"N0CALL")
    assert P.crc8(b"N0CALL") != P.crc8(b"N0CALX")


def test_connect_and_transfer():
    cmd, rsp, sent, got, events, t = _session(0, 15, 120, gear=False)
    assert got == sent
    assert cmd.link_status == P.CONNECTED
    assert any("CONNECTED VE3XYZ" in e for e in events)
    assert cmd.stats.blocks_acked == cmd.stats.blocks_sent


def test_gearshift_climbs_ladder():
    cmd, rsp, sent, got, events, t = _session(0, 25, 2500, gear=True)
    assert got == sent
    assert cmd.stats.gearshift_ups >= 3
    assert cmd.current_configuration > 2
    assert rsp.current_configuration == cmd.current_configuration


def test_break_recovery_on_bad_channel():
    """Start far above the channel's capacity: the emergency BREAK must fire,
    both sides coordinate at the ladder floor, and delivery completes."""
    cmd, rsp, sent, got, events, t = _session(13, 7, 300, gear=True, seed=2)
    assert got == sent
    assert cmd.stats.breaks_sent >= 1
    assert any("BREAK" in e for e in events)


def test_turboshift_probes_ladder():
    """Turboshift sprints up the ladder with 1-frame probes right after
    connect, settling at the channel's capacity before data flows."""
    cfg = ArqConfig(init_configuration=0, gear_shift_on=True,
                    robust_enabled=False, batch_size=3, turboshift=True)
    events = []
    a = ArqNode("VE3XYZ", P.COMMANDER, cfg, on_event=lambda e: events.append(e))
    b = ArqNode("N0CALL", P.RESPONDER, cfg)
    sim = LinkSimulator(a, b, ChannelModel(snr_db=14, seed=4))
    payload = bytes(np.random.default_rng(0).integers(0, 256, 400).astype(np.uint8))
    a.send_data(payload)
    a.connect("N0CALL")
    sim.run(max_sim_s=1800, until=lambda: len(b.fifo_rx) >= len(payload))
    assert b.received() == payload
    assert any("TURBO DONE" in e for e in events)
    assert a.current_configuration >= 8      # sprinted well past CONFIG_0
    assert a.current_configuration == b.current_configuration


def test_switch_role_bidirectional():
    cfg = ArqConfig(init_configuration=6, gear_shift_on=False, batch_size=3)
    a = ArqNode("VE3XYZ", P.COMMANDER, cfg)
    b = ArqNode("N0CALL", P.RESPONDER, cfg)
    sim = LinkSimulator(a, b, ChannelModel(snr_db=20))
    fwd = bytes(np.random.default_rng(1).integers(0, 256, 150).astype(np.uint8))
    rev = bytes(np.random.default_rng(2).integers(0, 256, 120).astype(np.uint8))
    a.send_data(fwd)
    b.send_data(rev)
    a.connect("N0CALL")
    sim.run(max_sim_s=600, until=lambda: len(b.fifo_rx) >= len(fwd))
    assert b.received() == fwd
    a.switch_role()
    sim.run(max_sim_s=600, until=lambda: len(a.fifo_rx) >= len(rev))
    assert a.received() == rev
    assert a.role == P.RESPONDER and b.role == P.COMMANDER


def test_repeat_last_ack_recovers_lost_ack():
    """A dropped ACK pattern is recovered via REPEAT_LAST_ACK
    (reference: datalink_defines.h:83). Because the repeated pattern is
    indistinguishable from a re-ACK of the PREVIOUS block (the case where our
    block was lost entirely), the commander retransmits the block once under
    the same sequence number; the responder dedupes it — delivered exactly
    once, acked exactly once."""
    cfg = ArqConfig(init_configuration=6, gear_shift_on=False, batch_size=2)
    a = ArqNode("VE3XYZ", P.COMMANDER, cfg)
    b = ArqNode("N0CALL", P.RESPONDER, cfg)
    # blocks: 0=START ctrl, 1=conn ACK, 2=data block, 3=data ACK (dropped)
    sim = LinkSimulator(a, b, ChannelModel(snr_db=20, drop_blocks=(3,)))
    payload = b"Q" * 150
    a.send_data(payload)
    a.connect("N0CALL")
    sim.run(max_sim_s=600,
            until=lambda: a.stats.blocks_acked >= 1 and not a.fifo_tx
            and not a._block_msgs)
    assert b.received() == payload            # no duplicate delivery
    assert a.stats.blocks_acked == 1
    assert a.stats.blocks_sent == 2           # one dedup'd retransmit


def test_keepalive_and_link_timeout():
    cfg = ArqConfig(init_configuration=6, gear_shift_on=False,
                    link_timeout_ms=60000)
    a = ArqNode("VE3XYZ", P.COMMANDER, cfg)
    b = ArqNode("N0CALL", P.RESPONDER, cfg)
    sim = LinkSimulator(a, b, ChannelModel(snr_db=20))
    a.connect("N0CALL")
    sim.run(max_sim_s=200)          # idle well past link_timeout
    assert a.link_status == P.CONNECTED and b.link_status == P.CONNECTED

    class DeadChannel(ChannelModel):
        def apply(self, s):
            idx = self._block_counter
            self._block_counter += 1
            if idx >= 2:            # everything after the handshake vanishes
                return np.zeros_like(s, dtype=np.float32)
            return super().apply(s)

    c = ArqNode("VE3XYZ", P.COMMANDER, cfg)
    d = ArqNode("N0CALL", P.RESPONDER, cfg)
    sim2 = LinkSimulator(c, d, DeadChannel(snr_db=20))
    c.connect("N0CALL")
    sim2.run(max_sim_s=900)
    assert d.link_status == P.LISTENING      # responder re-listens
    assert c.link_status == P.DROPPED        # commander gives up


def test_link_timeout_reconnect_resumes_transfer():
    """A total channel outage longer than the link timeout does not kill the
    transfer: the commander auto-reconnects at the initial configuration
    (reference: arq_common.cc:1216-1260) and the remaining data is delivered
    after the channel recovers."""
    cfg = ArqConfig(init_configuration=6, gear_shift_on=False, batch_size=2,
                    link_timeout_ms=20000)

    def snr_at(t_s):
        return -30.0 if 10.0 <= t_s < 45.0 else 20.0   # 35 s dead air

    a = ArqNode("VE3XYZ", P.COMMANDER, cfg)
    b = ArqNode("N0CALL", P.RESPONDER, cfg)
    sim = LinkSimulator(a, b, ChannelModel(snr_schedule=snr_at, seed=7))
    payload = bytes(np.random.default_rng(5).integers(0, 256, 400).astype(np.uint8))
    a.send_data(payload)
    a.connect("N0CALL")
    sim.run(max_sim_s=600, until=lambda: len(b.fifo_rx) >= len(payload))
    assert b.received() == payload
    assert a.link_status == P.CONNECTED


def test_wrong_callsign_no_connect():
    cfg = ArqConfig(init_configuration=0, gear_shift_on=False)
    cmd = ArqNode("VE3XYZ", P.COMMANDER, cfg)
    rsp = ArqNode("W1AAA", P.RESPONDER, cfg)   # not the callsign we dial
    sim = LinkSimulator(cmd, rsp, ChannelModel(snr_db=20))
    cmd.connect("N0CALL")
    sim.run(max_sim_s=120)
    assert rsp.link_status == P.LISTENING
    assert cmd.link_status != P.CONNECTED


def test_selective_ack_resends_only_missing_frame():
    """A 5-message block with exactly one corrupted frame is recovered by an
    ACK_MULTI/ACK_RANGE selective acknowledgement: the commander retransmits
    exactly the one missing message, not the whole block (VERDICT r1 #2;
    reference: arq_responder.cc:487-631, arq_commander.cc:897-1133)."""
    cfg = ArqConfig(init_configuration=6, gear_shift_on=False, batch_size=5)
    a = ArqNode("VE3XYZ", P.COMMANDER, cfg)
    b = ArqNode("N0CALL", P.RESPONDER, cfg)
    frame_len = a.geom.total_frame_size

    def kill_frame_2(idx, samples):
        # block 2 is the first data block (0=START ctrl, 1=conn-ack pattern);
        # zero message id=2's span inside the concatenated batch
        if idx == 2:
            samples = samples.copy()
            samples[2 * frame_len: 3 * frame_len] = 0.0
        return samples

    sim = LinkSimulator(a, b, ChannelModel(snr_db=20, mutilate=kill_frame_2))
    payload = bytes(np.random.default_rng(9).integers(0, 256, 5 * a.max_data_length)
                    .astype(np.uint8))
    a.send_data(payload)
    a.connect("N0CALL")
    sim.run(max_sim_s=900, until=lambda: len(b.fifo_rx) >= len(payload))
    assert b.received() == payload
    assert a.stats.resent_data == 1              # exactly ONE frame resent
    assert b.stats.selective_acks_sent >= 1
    assert a.stats.selective_acks_received >= 1
    assert a.stats.blocks_acked >= 1


def test_gearshift_down_on_success_rate():
    """Persistent partial frame loss drives the block success rate below the
    45% threshold: the commander downshifts ONE ladder step via SET_CONFIG —
    no BREAK, no drop to the floor (VERDICT r1 #3; reference:
    datalink_config.cc:48-49, arq_commander.cc:1353-1370)."""
    cfg = ArqConfig(init_configuration=8, gear_shift_on=True,
                    robust_enabled=False, batch_size=3,
                    frame_shift_threshold=100)   # keep upshift out of the way
    a = ArqNode("VE3XYZ", P.COMMANDER, cfg)
    b = ArqNode("N0CALL", P.RESPONDER, cfg)

    state = {"downshifted": False}
    chan = ChannelModel(snr_db=20)

    def lossy_until_downshift(idx, samples):
        # corrupt 2 of 3 data frames in every commander data block until the
        # commander moves off config 8 — success 1-2/3 = 33% < 45% forces
        # the one-step downshift
        if chan.src is not a:
            return samples               # responder ACK frames pass clean
        if a.current_configuration != 8:
            state["downshifted"] = True
            return samples
        frame_len = a.geom.total_frame_size
        n_frames = int(round(len(samples) / frame_len))
        if n_frames < 4:                 # control frames / resends pass
            return samples
        samples = samples.copy()
        samples[0:frame_len] = 0.0
        samples[frame_len:2 * frame_len] = 0.0
        return samples

    chan.mutilate = lossy_until_downshift
    sim = LinkSimulator(a, b, chan)
    # three full blocks: the first completes lossily (33% success), the
    # downshift fires before the second, the rest flow clean at config 7
    payload = bytes(np.random.default_rng(3).integers(0, 256, 9 * a.max_data_length)
                    .astype(np.uint8))
    a.send_data(payload)
    a.connect("N0CALL")
    sim.run(max_sim_s=1800, until=lambda: len(b.fifo_rx) >= len(payload))
    assert b.received() == payload
    assert state["downshifted"]
    assert a.stats.gearshift_downs >= 1
    assert a.stats.breaks_sent == 0              # graceful, not a BREAK
    assert a.current_configuration == 7          # exactly one step down
    assert b.current_configuration == a.current_configuration


def test_failed_upshift_doubles_threshold_and_steps_back():
    """An upshift whose first data block gets no answer triggers an immediate
    one-step BREAK-down and doubles the shift threshold (VERDICT r1 #5;
    reference: arq_commander.cc:1000-1045 frame_gearshift_just_applied,
    frame_shift_threshold *= 2)."""
    cfg = ArqConfig(init_configuration=6, gear_shift_on=True,
                    robust_enabled=False, batch_size=2,
                    frame_shift_threshold=2)
    a = ArqNode("VE3XYZ", P.COMMANDER, cfg)
    b = ArqNode("N0CALL", P.RESPONDER, cfg)

    def ceiling_at_6(idx, samples):
        # any transmission while the commander sits above config 6 vanishes
        # (the channel can't pass the denser mode)
        if a.current_configuration > 6:
            return np.zeros_like(samples)
        return samples

    sim = LinkSimulator(a, b, ChannelModel(snr_db=20, mutilate=ceiling_at_6))
    payload = bytes(np.random.default_rng(4).integers(0, 256, 8 * a.max_data_length)
                    .astype(np.uint8))
    a.send_data(payload)
    a.connect("N0CALL")
    sim.run(max_sim_s=2400, until=lambda: len(b.fifo_rx) >= len(payload))
    assert b.received() == payload
    assert a.frame_shift_threshold >= 4          # doubled at least once
    assert a.stats.breaks_sent >= 1
    assert a.current_configuration == 6          # recovered one step below 7
    assert b.current_configuration == 6


def test_snr_seeded_turboshift_jumps():
    """With a strong channel, the turboshift seeds its first candidate from
    the responder-reported SNR via the get_configuration ladder instead of
    climbing step by step (VERDICT r1 #3; reference SNR_BASED gearshift,
    telecom_system.cc:3036-3106)."""
    cfg = ArqConfig(init_configuration=0, gear_shift_on=True,
                    robust_enabled=False, batch_size=3, turboshift=True)
    events = []
    a = ArqNode("VE3XYZ", P.COMMANDER, cfg, on_event=lambda e: events.append(e))
    b = ArqNode("N0CALL", P.RESPONDER, cfg)
    sim = LinkSimulator(a, b, ChannelModel(snr_db=25, seed=6))
    payload = bytes(np.random.default_rng(8).integers(0, 256, 300).astype(np.uint8))
    a.send_data(payload)
    a.connect("N0CALL")
    sim.run(max_sim_s=1800, until=lambda: len(b.fifo_rx) >= len(payload))
    assert b.received() == payload
    assert any(e.startswith("TURBO SEED") for e in events)
    assert a.current_configuration >= 8
    assert a.current_configuration == b.current_configuration
    # seeding means few SET probes: seeded jump + at most a couple of
    # incremental confirms, not the full 15-step ladder
    assert a.stats.gearshift_ups <= 6


def test_arq_node_state_hygiene():
    """VERDICT r1 #8: every state field initialized in __init__ — no lazy
    getattr(self, ...) defaults anywhere in the module."""
    import inspect

    import mercury_tpu.link.node as node_mod

    src = inspect.getsource(node_mod)
    assert "getattr(self" not in src


def test_reverse_turboshift_after_switch_role():
    """After SWITCH_ROLE the new commander probes the ladder in its own
    (previously untested) direction before sending its queued data."""
    cfg = ArqConfig(init_configuration=4, gear_shift_on=True,
                    robust_enabled=False, batch_size=3, turboshift=True)
    events = []
    a = ArqNode("VE3XYZ", P.COMMANDER, cfg)
    b = ArqNode("N0CALL", P.RESPONDER, cfg,
                on_event=lambda e: events.append("B " + e))
    sim = LinkSimulator(a, b, ChannelModel(snr_db=16, seed=3))
    fwd = bytes(np.random.default_rng(1).integers(0, 256, 200).astype(np.uint8))
    rev = bytes(np.random.default_rng(2).integers(0, 256, 200).astype(np.uint8))
    a.send_data(fwd)
    b.send_data(rev)
    a.connect("N0CALL")
    sim.run(max_sim_s=1200, until=lambda: len(b.fifo_rx) >= len(fwd))
    assert b.received() == fwd
    a.switch_role()
    sim.run(max_sim_s=1800, until=lambda: len(a.fifo_rx) >= len(rev))
    assert a.received() == rev
    # the reverse direction must not be stuck at the initial config: either
    # it probed upward itself (TURBO START), was pre-negotiated (REVERSE
    # CONFIG), or the link already sat high enough that no probe was needed
    # (forward turbo reached the ladder top before the switch)
    probed = any("B TURBO START" in e or "REVERSE CONFIG" in e
                 for e in events)
    assert probed or b.current_configuration >= 8
    assert b.current_configuration > 4
    assert a.current_configuration == b.current_configuration


def test_idle_channel_signal_measurement():
    """Noise-only capture windows must produce a dBm measure and feed the
    responder's noise-floor EMA (reference idle measurement,
    arq_common.cc:1714-1736 / telecom_system.cc:1520-1541); a real frame on
    top of that noise must read well above the floor."""
    rsp = ArqNode("N0CALL", P.RESPONDER, ArqConfig(init_configuration=0))
    g = rsp.geom
    buf_len = g.nofdm * g.buffer_nsymb * g.interp
    rng = np.random.default_rng(0)
    sigma = 0.003
    for i in range(4):
        rsp.on_samples(sigma * rng.standard_normal(buf_len)
                       .astype(np.float32), float(i))
    assert rsp.signal_dbm is not None and rsp.noise_floor_dbm is not None
    floor = rsp.noise_floor_dbm
    # doubling the noise amplitude moves the measured window by ~6 dB
    rsp.on_samples(2 * sigma * rng.standard_normal(buf_len)
                   .astype(np.float32), 5.0)
    assert rsp.signal_dbm == pytest.approx(floor + 6.0, abs=1.5)
    # a transmitted frame in the window reads far above the noise floor
    from mercury_tpu.modem.tx import TxChain
    tx = TxChain(g)
    payload = rng.integers(0, 256, (1, g.frame_bytes)).astype(np.uint8)
    pb = np.asarray(tx.transmit(payload)).reshape(-1)
    win = sigma * rng.standard_normal(buf_len).astype(np.float32)
    win[1000:1000 + len(pb)] += pb.astype(np.float32)
    rsp.on_samples(win, 6.0)
    assert rsp.signal_dbm - floor > 15.0
    # and the idle estimate seeds TEST_CONNECTION when no frame decoded yet
    rsp.snr_local = None
    m = rsp._make_test_connection()
    import struct as _s
    snr = _s.unpack("<f", m.data[1:5])[0]
    assert snr > 10.0


def test_receive_frames_tolerates_transport_jitter():
    """Sibling frames of a batch shifted by up to +-200 samples from their
    nominal frame_len slots must still decode (per-frame matched-filter
    re-sync) — a transport that pads or coalesces blocks must not break the
    fixed-slot decode (reference drift tolerance, arq_common.cc:2690-2730)."""
    from mercury_tpu.modem.tx import TxChain
    cfg = ArqConfig(init_configuration=1)
    rsp = ArqNode("N0CALL", P.RESPONDER, cfg)
    rsp.link_status = P.CONNECTED
    g = rsp.geom
    tx = TxChain(g)
    rng = np.random.default_rng(3)
    msgs = []
    frames = []
    for i in range(3):
        chunk = bytes(rng.integers(0, 256, 10).astype(np.uint8))
        m = P.Message(type=P.DATA_SHORT, id=i, sequence=7, length=len(chunk),
                      data=chunk)
        msgs.append(m)
        payload = P.serialize(m, rsp.connection_id)
        buf = np.zeros(g.frame_bytes, np.uint8)
        buf[: len(payload)] = np.frombuffer(payload, np.uint8)
        frames.append(np.asarray(tx.transmit_batch(buf[None])).reshape(-1))
    frame_len = g.total_frame_size
    jitter = [0, +180, -170]     # per-frame offset from the nominal slot
    stream = np.zeros(3 * frame_len + 400, np.float32)
    for k, f in enumerate(frames):
        at = k * frame_len + (jitter[k] if k else 0)
        stream[at: at + len(f)] += f.astype(np.float32)
    assert rsp._receive_frames(stream[: 3 * frame_len], 0.0) in (True, False)
    assert sorted(rsp._rx_msgs) == [0, 1, 2]
    for i, m in enumerate(msgs):
        got = rsp._rx_msgs[i]
        assert got.data[: got.length] == m.data
