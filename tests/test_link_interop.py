"""Link-layer wire interop against the REFERENCE's own serializer.

The golden `link_*` vectors are produced by tools/golden_gen/link_gen.cc,
which drives cl_arq_controller::send / add_message_control in the reference
tree (arq_common.cc:2025-2102, arq_commander.cc:287-369) and dumps the exact
frame bytes (plus the passband of two frames). These tests prove:

  * the repo's serializer emits byte-identical frames (stock framing),
  * the repo parses reference-emitted frames into the right fields,
  * the repo RX chain decodes the reference's transmitted passband down to
    the identical link frame (full-stack TX-side interop),
  * a repo responder in wire-compat mode consumes a stock commander's frame
    sequence and delivers the stream, and a compat commander emits the stock
    framing flow (duplicate controls, batch-position sequence numbers,
    separate 1-byte BLOCK_END).
"""

import dataclasses

import numpy as np
import pytest

from mercury_tpu.core.geometry import build_geometry
from mercury_tpu.link import protocol as P
from mercury_tpu.link.node import ArqConfig, ArqNode
from mercury_tpu.link.sim import ChannelModel, LinkSimulator
from mercury_tpu.modem.rx import RxChain

CID = 0x2A          # connection id link_gen stages for the connected session


def _golden_bytes(golden, name):
    return bytes(golden(name).astype(np.uint8))


# ---------------------------------------------------------------------------
# byte-identity: repo serializer vs reference serializer
# ---------------------------------------------------------------------------

def test_data_long_bytes_identical(golden):
    ref = _golden_bytes(golden, "link_data_long_bytes")
    payload = bytes((i * 7 + 1) & 0xFF for i in range(18))
    m = P.Message(type=P.DATA_LONG, id=3, sequence=2,
                  length=len(payload), data=payload)
    assert P.serialize(m, CID) == ref


def test_data_short_bytes_identical(golden):
    ref = _golden_bytes(golden, "link_data_short_bytes")
    payload = bytes(0xA0 + i for i in range(11))
    m = P.Message(type=P.DATA_SHORT, id=4, sequence=0,
                  length=len(payload), data=payload)
    assert P.serialize(m, CID) == ref


def test_start_connection_bytes_identical(golden):
    """The repo's connect() payload (code + CRC8(dest) + packed callsign,
    node.py commander path) against the reference's add_message_control
    START_CONNECTION branch. Sent pre-connection at BROADCAST_ID."""
    ref = _golden_bytes(golden, "link_start_connection_bytes")
    data = bytes([P.START_CONNECTION, P.crc8(b"PY2ABC")]) \
        + P.callsign_pack("PP5XX")
    m = P.Message(type=P.CONTROL, length=len(data), data=data, sequence=0)
    assert P.serialize(m, P.BROADCAST_ID) == ref


def test_test_connection_bytes_identical(golden):
    import struct
    ref = _golden_bytes(golden, "link_test_connection_bytes")
    data = bytes([P.TEST_CONNECTION]) + struct.pack("<f", 7.25)
    m = P.Message(type=P.CONTROL, length=len(data), data=data)
    assert P.serialize(m, P.BROADCAST_ID) == ref


def test_set_config_bytes_identical(golden):
    """Stock SET_CONFIG payload [code, forward, reverse]
    (arq_commander.cc:319-341) — the wire_compat emission layout."""
    ref = _golden_bytes(golden, "link_set_config_bytes")
    data = bytes([P.SET_CONFIG, 8, 6])
    m = P.Message(type=P.CONTROL, length=len(data), data=data)
    assert P.serialize(m, P.BROADCAST_ID) == ref


@pytest.mark.parametrize("name,code", [
    ("link_block_end_bytes", P.BLOCK_END),
    ("link_keep_alive_bytes", P.KEEP_ALIVE),
    ("link_close_connection_bytes", P.CLOSE_CONNECTION),
    ("link_switch_role_bytes", P.SWITCH_ROLE),
    ("link_repeat_last_ack_bytes", P.REPEAT_LAST_ACK),
    ("link_file_end_bytes", P.FILE_END_),
])
def test_single_byte_controls_identical(golden, name, code):
    ref = _golden_bytes(golden, name)
    m = P.Message(type=P.CONTROL, length=1, data=bytes([code]))
    assert P.serialize(m, P.BROADCAST_ID) == ref


def test_ack_multi_bytes_identical(golden):
    """Responder ACK_MULTI payload [nAck, id...]
    (arq_responder.cc:523-547)."""
    ref = _golden_bytes(golden, "link_ack_multi_bytes")
    ids = [0, 2, 5]
    m = P.Message(type=P.ACK_MULTI, sequence=0, length=1 + len(ids),
                  data=bytes([len(ids)] + ids))
    assert P.serialize(m, CID) == ref


def test_ack_control_bytes_identical(golden):
    """Stock ACK_CONTROL echoes the acked control code, length 1
    (arq_responder.cc:223 + the receive-path copy)."""
    ref = _golden_bytes(golden, "link_ack_control_bytes")
    m = P.Message(type=P.ACK_CONTROL, length=1,
                  data=bytes([P.TEST_CONNECTION]))
    assert P.serialize(m, CID) == ref


# ---------------------------------------------------------------------------
# parse direction: reference bytes -> repo fields
# ---------------------------------------------------------------------------

def test_parse_reference_data_long(golden):
    ref = _golden_bytes(golden, "link_data_long_bytes")
    m = P.deserialize(ref, max_data_length=18)
    assert m.type == P.DATA_LONG and m.id == 3 and m.sequence == 2
    assert m.data == bytes((i * 7 + 1) & 0xFF for i in range(18))


def test_parse_reference_start_connection(golden):
    ref = _golden_bytes(golden, "link_start_connection_bytes")
    m = P.deserialize(ref, max_data_length=18)
    assert m.type == P.CONTROL and m.data[0] == P.START_CONNECTION
    assert m.data[1] == P.crc8(b"PY2ABC")
    assert P.callsign_unpack(m.data[2:7]) == "PP5XX"


def test_parse_reference_ack_multi(golden):
    ref = _golden_bytes(golden, "link_ack_multi_bytes")
    m = P.deserialize(ref, max_data_length=18)
    assert m.type == P.ACK_MULTI
    n = m.data[0]
    assert list(m.data[1:1 + n]) == [0, 2, 5]


# ---------------------------------------------------------------------------
# full-stack: the reference's transmitted passband decodes to the identical
# link frame through the repo RX chain
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def rx1():
    return RxChain(build_geometry(1))


@pytest.mark.parametrize("name", ["link_data_long", "link_start_connection"])
def test_rx_decodes_reference_link_passband(golden, rx1, name):
    g = build_geometry(1)
    pb = golden(f"{name}_passband").astype(np.float32)
    buf_len = g.nofdm * g.buffer_nsymb * g.interp
    delay = 3000
    rng = np.random.default_rng(5)
    buf = (1e-4 * rng.standard_normal(buf_len)).astype(np.float32)
    buf[delay: delay + len(pb)] += pb
    res = rx1.receive(buf[None])
    assert bool(np.asarray(res.crc_ok)[0])
    frame = bytes(np.asarray(res.payload)[0].astype(np.uint8))
    ref = _golden_bytes(golden, f"{name}_bytes")
    assert frame[: len(ref)] == ref
    assert all(b == 0 for b in frame[len(ref):])   # reference zero-padding


# ---------------------------------------------------------------------------
# FSM interop: a stock commander's frame sequence into a compat responder
# ---------------------------------------------------------------------------

def _mk_responder(**kw):
    cfg = ArqConfig(init_configuration=1, wire_compat=True, **kw)
    return ArqNode("PY2ABC", P.RESPONDER, cfg)


def test_compat_responder_consumes_stock_session(golden):
    """START_CONNECTION (reference bytes) -> stock DATA batch (sequence =
    batch position) -> stock 1-byte BLOCK_END: the stream must land in
    fifo_rx in id order, with pattern acks queued at each step."""
    rsp = _mk_responder()
    now = 0.0
    rsp._on_frame(_golden_bytes(golden, "link_start_connection_bytes"), now)
    assert rsp.link_status == P.CONNECTED
    assert rsp.destination_call_sign == "PP5XX"
    assert rsp._pending_ack            # pattern ack queued

    chunks = [bytes(range(10)), bytes(range(10, 18))]
    for i, chunk in enumerate(chunks):
        m = P.Message(type=P.DATA_SHORT, id=i, sequence=i,  # stock: seq = pos
                      length=len(chunk), data=chunk)
        rsp._on_frame(P.serialize(m, CID), now)
    assert len(rsp._rx_msgs) == 2      # batch-position seqs must not void

    for seq in range(2):               # stock duplicate pair
        be = P.Message(type=P.CONTROL, length=1, sequence=seq,
                       data=bytes([P.BLOCK_END]))
        rsp._on_frame(P.serialize(be, CID), now)
    assert bytes(rsp.fifo_rx) == b"".join(chunks)   # delivered exactly once


def test_compat_responder_stock_set_config(golden):
    """The stock 3-byte SET_CONFIG (reference bytes, forward=8 reverse=6)
    must schedule the forward switch and record the reverse config."""
    rsp = _mk_responder()
    rsp._on_frame(_golden_bytes(golden, "link_start_connection_bytes"), 0.0)
    rsp._on_frame(_golden_bytes(golden, "link_set_config_bytes"), 1.0)
    assert rsp._pending_new_config == 8
    assert rsp._pending_reverse_cfg == 6
    assert rsp._pending_probe_revert == rsp.current_configuration


# ---------------------------------------------------------------------------
# compat commander emission flow (stock framing out)
# ---------------------------------------------------------------------------

def test_compat_commander_emits_stock_flow():
    cfg = ArqConfig(init_configuration=1, wire_compat=True, batch_size=3)
    cmd = ArqNode("PP5XX", P.COMMANDER, cfg)
    sent_batches = []

    def record(msgs):
        sent_batches.append([dataclasses.replace(m) for m in msgs])
        return np.zeros(16, dtype=np.float32)
    cmd._modulate_batch = record

    cmd.connect("PY2ABC")
    cmd.poll(0.0)
    # control duplicated with stock batch-position sequence numbers
    assert [m.sequence for m in sent_batches[-1]] == [0, 1]
    assert all(m.data[0] == P.START_CONNECTION for m in sent_batches[-1])

    cmd._on_ack_pattern(1.0)           # connection acked
    assert cmd.link_status == P.CONNECTED
    cmd.send_data(bytes(range(40)))
    cmd.poll(2.0)
    data_batch = sent_batches[-1]
    # stock: sequence = batch position, and no BLOCK_END rides the batch
    assert [m.sequence for m in data_batch] == list(range(len(data_batch)))
    assert all(m.type in (P.DATA_LONG, P.DATA_SHORT) for m in data_batch)

    cmd._on_ack_pattern(3.0)           # data pattern-acked
    cmd.poll(4.0)                      # -> separate stock BLOCK_END pair
    be_batch = sent_batches[-1]
    assert [m.sequence for m in be_batch] == [0, 1]
    assert all(m.type == P.CONTROL and m.data == bytes([P.BLOCK_END])
               and m.length == 1 for m in be_batch)

    cmd._on_ack_pattern(5.0)           # BLOCK_END acked -> block complete
    assert cmd.stats.blocks_acked == 1
    assert not cmd._block_msgs


# ---------------------------------------------------------------------------
# end-to-end: two compat nodes over the simulated channel
# ---------------------------------------------------------------------------

def test_wire_compat_end_to_end_session():
    cfg = ArqConfig(init_configuration=1, gear_shift_on=False,
                    wire_compat=True, batch_size=3)
    cmd = ArqNode("PP5XX", P.COMMANDER, cfg)
    rsp = ArqNode("PY2ABC", P.RESPONDER, cfg)
    sim = LinkSimulator(cmd, rsp, ChannelModel(snr_db=15, seed=1))
    payload = bytes(np.random.default_rng(1).integers(0, 256, 150)
                    .astype(np.uint8))
    cmd.send_data(payload)
    cmd.connect("PY2ABC")
    sim.run(max_sim_s=1800, until=lambda: len(rsp.fifo_rx) >= len(payload))
    assert rsp.received() == payload
    assert cmd.stats.blocks_acked == cmd.stats.blocks_sent
