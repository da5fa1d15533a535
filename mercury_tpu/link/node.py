"""ARQ node: commander/responder state machines over the batched PHY.

Wire-compatible with the reference's data-link layer (frame headers,
START_CONNECTION handshake with callsign CRC8, SET_CONFIG gearshift, pattern
ACKs, BREAK emergency drop — source/datalink_layer/arq_*.cc), with a
deliberately tightened block-ACK rule: the responder only pattern-ACKs a data
block when EVERY message of the block decoded (the reference ACKs whatever
arrived when BLOCK_END lands, which can drop frames silently under partial
loss). The commander's per-block retransmission covers misses either way.

The node is clock-agnostic: `poll(now_ms)` advances timers and returns
passband blocks to transmit; `on_samples()` delivers capture audio. The
simulation harness (link.sim) drives two nodes through the channel model with
a simulated clock; a real-time transport can drive the same node off a sound
card or socket.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable

import numpy as np

from mercury_tpu.core.geometry import build_geometry
from mercury_tpu.core.modes import FULL_CONFIG_LADDER, ROBUST_0
from mercury_tpu.link import protocol as P
from mercury_tpu.modem.patterns import PatternSignaler
from mercury_tpu.modem.rx import RxChain
from mercury_tpu.modem.tx import TxChain


@dataclass
class ArqConfig:
    """Link defaults (reference: datalink_config.cc:25-65)."""
    init_configuration: int = 0
    ack_configuration: int = 0
    gear_shift_on: bool = True
    robust_enabled: bool = True
    batch_size: int = 5
    n_messages: int = 20
    n_resends: int = 20
    link_timeout_ms: int = 30000
    ptt_on_delay_ms: int = 100
    ptt_off_delay_ms: int = 200
    frame_shift_threshold: int = 3
    emergency_nack_threshold: int = 2
    turboshift: bool = False      # probe the ladder upward right after connect


@dataclass
class LinkStats:
    sent_data: int = 0
    acked_data: int = 0
    received_data: int = 0
    resent_data: int = 0
    blocks_sent: int = 0
    blocks_acked: int = 0
    gearshift_ups: int = 0
    gearshift_downs: int = 0
    breaks_sent: int = 0


class _PhyCache:
    """Per-config PHY chain cache shared between nodes in one process."""
    _cache: dict = {}

    @classmethod
    def get(cls, cfg: int):
        if cfg not in cls._cache:
            g = build_geometry(cfg)
            cls._cache[cfg] = (g, TxChain(g), RxChain(g), PatternSignaler(g))
        return cls._cache[cfg]


class ArqNode:
    """One end of an ARQ link."""

    def __init__(self, call_sign: str, role: int,
                 config: ArqConfig | None = None,
                 on_event: Callable[[str], None] | None = None):
        self.cfg = config or ArqConfig()
        self.call_sign = call_sign.upper()
        self.role = role
        self.on_event = on_event or (lambda s: None)
        self.stats = LinkStats()

        self.link_status = P.LISTENING if role == P.RESPONDER else P.IDLE
        self.connection_status = P.IDLE
        self.connection_id = P.BROADCAST_ID
        self.destination_call_sign = ""

        self.fifo_tx = bytearray()
        self.fifo_rx = bytearray()

        self._set_config(self.cfg.init_configuration)

        # pending TX block state (commander)
        self._block_msgs: list[P.Message] = []
        self._await_ack_kind: str | None = None   # 'data' | 'control'
        self._await_deadline = 0.0
        self._pending_control: P.Message | None = None
        self._resends_left = self.cfg.n_resends
        self.consecutive_data_acks = 0
        self.frame_shift_threshold = self.cfg.frame_shift_threshold
        self._gear_pending: int | None = None
        self.emergency_nacks = 0
        self._last_now = 0.0

        # turboshift probe state (reference: arq_commander.cc:1135-1167;
        # desync-safe variant — see _poll_turbo)
        self._turbo_active = False
        self._turbo_rendezvous = self.cfg.init_configuration
        self._turbo_candidate: int | None = None
        self._turbo_stage: str | None = None      # 'set' | 'test'
        self._probe_deadline: float | None = None  # responder-side revert
        self._probe_revert_cfg: int | None = None

        # responder RX block state
        self._rx_msgs: dict[int, P.Message] = {}

        self._capture: np.ndarray | None = None

    # ------------------------------------------------------------------
    def _requeue_block(self) -> None:
        """Push un-ACKed block data back to the front of the TX FIFO so it is
        re-framed for the (possibly different) new frame size (reference
        push_front restore, arq_commander.cc:1113-1120)."""
        if getattr(self, "_block_msgs", None):
            restored = b"".join(m.data[: m.length] for m in self._block_msgs)
            self.fifo_tx[:0] = restored
            self._block_msgs = []

    def _set_config(self, config: int) -> None:
        if getattr(self, "current_configuration", None) == config:
            return
        self._requeue_block()
        if getattr(self, "_rx_msgs", None):
            self._rx_msgs.clear()   # partial frames of the old config are void
        self.current_configuration = config
        g, tx, rx, pat = _PhyCache.get(config)
        self.geom, self._tx, self._rx, self._pat = g, tx, rx, pat
        self.max_data_length = g.frame_bytes - P.MAX_HEADER_LEN
        self.frame_ms = 1000.0 * g.total_frame_size / g.fs
        self.ack_pattern_ms = 1000.0 * self._pat.passband_samples / g.fs
        # ack timeout covers batch TX + pattern + PTT turnarounds
        # (reference: arq_common.cc:715-725)
        self.ack_timeout_ms = ((self.cfg.batch_size + 1) * self.frame_ms
                               + self.ack_pattern_ms
                               + 4 * self.cfg.ptt_on_delay_ms
                               + 4 * self.cfg.ptt_off_delay_ms + 1500)

    # ------------------------------------------------------------------
    # application API
    def send_data(self, data: bytes) -> None:
        self.fifo_tx.extend(data)

    def received(self) -> bytes:
        out = bytes(self.fifo_rx)
        self.fifo_rx.clear()
        return out

    def connect(self, destination: str) -> None:
        assert self.role == P.COMMANDER
        self.destination_call_sign = destination.upper()
        self.link_status = P.CONNECTING
        self._tx_off = 0                 # fresh stream
        self._resume_connect = False

    # ------------------------------------------------------------------
    # modulation helpers
    def _modulate_batch(self, messages: list[P.Message]) -> np.ndarray:
        """Serialize messages and modulate them into one passband block
        (batch-overlap TX filtering, reference send_batch)."""
        frames = []
        for m in messages:
            payload = P.serialize(m, self.connection_id)
            buf = np.zeros(self.geom.frame_bytes, dtype=np.uint8)
            buf[: len(payload)] = np.frombuffer(payload, np.uint8)
            frames.append(buf)
        batch = np.stack(frames)
        pb = np.asarray(self._tx.transmit_batch(batch))
        return pb.reshape(-1)

    def _start_wait(self, kind: str, now: float) -> None:
        self._await_ack_kind = kind
        self._await_deadline = now + self.ack_timeout_ms

    # ------------------------------------------------------------------
    # capture handling
    def on_samples(self, samples: np.ndarray, now: float) -> None:
        """Deliver a received passband block; the node decodes according to
        its state."""
        self._last_now = now
        if self._await_ack_kind is not None:
            # expecting an ACK pattern
            metric, _ = self._pat.detect_ack(samples[None])
            if float(np.asarray(metric)[0]) >= self._pat.threshold:
                self._on_ack_pattern(now)
                return
            # also watch for BREAK while waiting
            bmetric, _ = self._pat.detect_break(samples[None])
            if float(np.asarray(bmetric)[0]) >= self._pat.threshold:
                self._on_break_detected(now)
            return

        if self.role == P.RESPONDER or self.link_status == P.CONNECTED:
            decoded_before = self.stats.received_data
            got_ctrl = self._receive_frames(samples, now)
            if (self.role == P.RESPONDER
                    and self.stats.received_data == decoded_before
                    and not got_ctrl):
                # nothing decoded — check for an emergency BREAK pattern
                # (reference: arq_common.cc:2855-2869)
                bmetric, _ = self._pat.detect_break(samples[None])
                if float(np.asarray(bmetric)[0]) >= self._pat.threshold:
                    self._on_break_detected(now)

    def _receive_frames(self, samples: np.ndarray, now: float) -> None:
        """Decode every frame in a delivered block: run full sync on a window
        containing only the first frame (the Schmidl-Cox argmax is ambiguous
        when several back-to-back frames sit in one window), then batch-decode
        the remaining frames at their contiguous offsets in one jitted call."""
        g = self.geom
        buf_len = g.nofdm * g.buffer_nsymb * g.interp
        frame_len = g.total_frame_size
        n_frames = int(round(len(samples) / frame_len))
        if n_frames < 1:
            return False

        first = np.zeros(buf_len, dtype=np.float32)
        first[: min(frame_len, len(samples))] = samples[:frame_len]
        res0 = self._rx.receive(first[None])
        if not bool(np.asarray(res0.crc_ok)[0]):
            return False
        t0 = int(np.asarray(res0.delay)[0]) + 8   # undo the early-sampling bias
        self._on_frame(bytes(np.asarray(res0.payload)[0]), now)
        if n_frames == 1:
            return True

        margin = 64
        rows = np.zeros((n_frames - 1, buf_len), dtype=np.float32)
        for k in range(1, n_frames):
            start = t0 + k * frame_len - margin
            chunk = samples[max(start, 0): start + buf_len]
            rows[k - 1, : len(chunk)] = chunk
        import jax.numpy as jnp
        delays = np.full(n_frames - 1, margin - 8, dtype=np.int32)
        freqs = np.full(n_frames - 1, float(np.asarray(res0.freq_offset)[0]),
                        dtype=np.float32)
        payloads, crc_ok, _i, _s, _mh = self._rx.decode_at_jit(
            jnp.asarray(rows), jnp.asarray(delays), jnp.asarray(freqs))
        ok = np.asarray(crc_ok)
        pl = np.asarray(payloads)
        for k in range(n_frames - 1):
            if ok[k]:
                self._on_frame(bytes(pl[k]), now)
        return True

    # ------------------------------------------------------------------
    # frame/state handling
    def _on_frame(self, payload: bytes, now: float) -> None:
        msg = P.deserialize(payload, self.max_data_length)
        if msg is None:
            return
        # ANY decoded frame from the peer refreshes the link timer — without
        # this, a long control-only phase (turboshift climb, gearshift
        # negotiation) trips the 30 s supervision timeout mid-session
        self._last_peer_activity = now
        if msg.type in (P.DATA_LONG, P.DATA_SHORT):
            if self.link_status == P.CONNECTED:
                self._rx_msgs[msg.id] = msg
                self.stats.received_data += 1
                # a fresh/resent block invalidates the repeatable last ACK
                self._had_acked_block = False
        elif msg.type == P.CONTROL:
            self._on_control(msg, now)

    def _on_control(self, msg: P.Message, now: float) -> None:
        code = msg.data[0]
        if code == P.START_CONNECTION and self.role == P.RESPONDER \
                and self.link_status in (P.LISTENING, P.CONNECTION_RECEIVED,
                                         P.CONNECTED):
            # CONNECTED case: the commander timed out and is re-connecting
            # (reference link-timeout auto-reconnect) — re-sync instead of
            # ignoring it, or the two ends deadlock until our own timeout
            if msg.data[1] == P.crc8(self.call_sign.encode()):
                self.destination_call_sign = P.callsign_unpack(msg.data[2:7])
                self._rx_msgs.clear()
                self._had_acked_block = False
                if msg.sequence == 0:      # fresh session (not a reconnect)
                    self._rx_off = 0
                self.link_status = P.CONNECTED
                self._last_peer_activity = now
                self.on_event(f"CONNECTED {self.destination_call_sign}")
                self._queue_pattern_ack(now)
        elif code == P.BLOCK_END and self.role == P.RESPONDER \
                and self.link_status == P.CONNECTED:
            expected = msg.data[1]
            off = int.from_bytes(msg.data[2:6], "little") \
                if len(msg.data) >= 6 else 0
            if len(self._rx_msgs) == expected and expected > 0:
                # Dedupe by STREAM BYTE OFFSET, not sequence number: an
                # offset survives resends, link-timeout reconnects, and
                # config changes that reframe the same bytes — a sequence
                # number does not (a requeued block gets a new seq, so a
                # delivered-but-unACKed block would be delivered twice).
                blob = b"".join(self._rx_msgs[mid].data[: self._rx_msgs[mid].length]
                                for mid in sorted(self._rx_msgs))
                rx_off = getattr(self, "_rx_off", 0)
                end = off + len(blob)
                if end <= rx_off:
                    pass                      # pure duplicate: re-ACK only
                elif off <= rx_off:
                    self.fifo_rx.extend(blob[rx_off - off:])  # new tail only
                    self._rx_off = end
                else:
                    # offset gap: we are a fresh responder joining a resumed
                    # stream — accept from here
                    self.fifo_rx.extend(blob)
                    self._rx_off = end
                self._rx_msgs.clear()
                self._had_acked_block = True
                self._queue_pattern_ack(now)
            else:
                # incomplete block: withhold the ACK. The commander resends
                # the ENTIRE block, so stale partial messages must not
                # survive (they could satisfy a later, smaller block count
                # after a config change and deliver mixed garbage).
                self._rx_msgs.clear()
        elif code == P.TEST_CONNECTION and self.link_status == P.CONNECTED:
            self._probe_deadline = None       # probe frame decoded: success
            self._queue_pattern_ack(now)
        elif code == P.SET_CONFIG and self.role == P.RESPONDER:
            fwd = msg.data[1]
            self._queue_pattern_ack(now, new_config=fwd)
            # every config switch (gearshift or turbo probe) arms the revert
            # deadline: if our ACK is lost the commander stays on the old
            # config, and without a revert the two ends desync permanently
            self._pending_probe_revert = int(msg.data[2])
        elif code == P.SWITCH_ROLE and self.role == P.RESPONDER \
                and self.link_status == P.CONNECTED:
            # become the commander after acking (reference:
            # arq_responder.cc:764-770, arq_commander.cc turboshift/finish)
            self._queue_pattern_ack(now)
            self._pending_role = P.COMMANDER
        elif code == P.KEEP_ALIVE and self.link_status == P.CONNECTED:
            self._last_peer_activity = now
            self._queue_pattern_ack(now)
        elif code == P.REPEAT_LAST_ACK and self.role == P.RESPONDER:
            # the commander missed our ACK — repeat the pattern only if we
            # actually ACKed the last block (reference: repeating_last_ack,
            # arq_responder.cc:797-801); otherwise stay silent so the
            # commander's next timeout triggers a data resend
            if getattr(self, "_had_acked_block", False):
                self._queue_pattern_ack(now)
        elif code in (P.FILE_START, P.FILE_END_, P.PIPE_OPEN, P.PIPE_CLOSE) \
                and self.role == P.RESPONDER and self.link_status == P.CONNECTED:
            name = {P.FILE_START: "FILE START", P.FILE_END_: "FILE END",
                    P.PIPE_OPEN: "PIPE OPEN", P.PIPE_CLOSE: "PIPE CLOSE"}[code]
            self.on_event(name)
            self._queue_pattern_ack(now)
        elif code == P.CLOSE_CONNECTION:
            self._queue_pattern_ack(now)
            self.link_status = P.DISCONNECTING
            self.on_event("DISCONNECTED")

    def _queue_pattern_ack(self, now: float, new_config: int | None = None) -> None:
        self._pending_ack = True
        self._pending_new_config = new_config

    def _on_ack_pattern(self, now: float) -> None:
        kind = self._await_ack_kind
        self._await_ack_kind = None
        self._last_peer_activity = now
        if kind == "data":
            if getattr(self, "_tried_repeat", False):
                # ambiguous: the pattern answers our REPEAT_LAST_ACK, which
                # re-ACKs the last block the responder DELIVERED — if our
                # current block was lost entirely, that is the PREVIOUS
                # block, and treating it as an ACK would silently drop data.
                # Resend the current block under the same sequence number:
                # the responder dedupes it if it did deliver it.
                # (emergency_nacks is NOT reset: if the data path stays dead
                # while ACKs get through, the BREAK ladder still escalates.)
                self._tried_repeat = False
                self._resends_left = self.cfg.n_resends
                return
            self._tx_off = (getattr(self, "_block_off", 0)
                            + sum(m.length for m in self._block_msgs))
            for m in self._block_msgs:
                m.status = P.ACKED
                self.stats.acked_data += 1
            self._block_msgs = []
            self.stats.blocks_acked += 1
            self.consecutive_data_acks += 1
            self.emergency_nacks = 0
            self._tried_repeat = False
            self._resends_left = self.cfg.n_resends
        elif kind == "control":
            code = (self._pending_control.data[0]
                    if self._pending_control else None)
            if code == P.START_CONNECTION:
                self.link_status = P.CONNECTED
                self.on_event(f"CONNECTED {self.destination_call_sign}")
                if self.cfg.turboshift and self.cfg.gear_shift_on:
                    self._turbo_active = True
                    self._turbo_rendezvous = self.current_configuration
                    self._turbo_candidate = self._ladder_up()
                    self._turbo_stage = None
                    if self._turbo_candidate == self._turbo_rendezvous:
                        self._turbo_active = False   # already at ladder top
                    else:
                        self.on_event("TURBO START")
            elif code == P.SET_CONFIG and self._turbo_stage == "set":
                # turbo probe: responder switched — test at the candidate
                self._set_config(self._turbo_candidate)
                self._turbo_stage = "test"
            elif code == P.TEST_CONNECTION and self._turbo_stage == "test":
                # candidate works: it becomes the new rendezvous
                self._turbo_rendezvous = self._turbo_candidate
                self.stats.gearshift_ups += 1
                self.on_event(f"TURBO OK {self.current_configuration}")
                self._turbo_candidate = self._ladder_up()
                self._turbo_stage = None
                if self._turbo_candidate == self._turbo_rendezvous:
                    self._turbo_active = False
                    self.on_event(f"TURBO DONE {self.current_configuration}")
            elif code == P.SET_CONFIG and self._gear_pending is not None:
                self._set_config(self._gear_pending)
                self.stats.gearshift_ups += 1
                self.on_event(f"GEARSHIFT {self.current_configuration}")
                self._gear_pending = None
                self.consecutive_data_acks = 0
            elif code == P.SWITCH_ROLE:
                self.role = P.RESPONDER
                self._rx_off = 0          # peer starts a fresh TX stream
                self.on_event("ROLE RESPONDER")
            elif code == P.CLOSE_CONNECTION:
                self.link_status = P.IDLE
                self.on_event("DISCONNECTED")
            self._pending_control = None
            self._resends_left = self.cfg.n_resends

    def _ladder_floor(self) -> int:
        return ROBUST_0 if self.cfg.robust_enabled else 0

    def _on_break_detected(self, now: float) -> None:
        # responder side of emergency BREAK: drop to the ladder floor for
        # coordination (reference: arq_commander.cc:42-187 BREAK FSM)
        floor = self._ladder_floor()
        if self.current_configuration != floor:
            self._set_config(floor)
            self.on_event(f"BREAK->CONFIG {floor}")

    # ------------------------------------------------------------------
    # main poll: returns list of passband blocks to transmit
    def poll(self, now: float) -> list[np.ndarray]:
        self._last_now = now
        out: list[np.ndarray] = []

        # responder: flush pending pattern ACK
        if getattr(self, "_pending_ack", False):
            self._pending_ack = False
            out.append(self._pat.ack_passband.astype(np.float32))
            if self._pending_new_config is not None:
                self._set_config(int(self._pending_new_config))
                self.on_event(f"GEARSHIFT {self.current_configuration}")
                self._pending_new_config = None
                if getattr(self, "_pending_probe_revert", None) is not None:
                    self._probe_revert_cfg = self._pending_probe_revert
                    # must outlast the commander's control-ack timeout plus
                    # the probe frame itself, or the two sides desync
                    self._probe_deadline = (now + self.ack_timeout_ms
                                            + 3 * self.frame_ms + 2000)
                    self._pending_probe_revert = None
            if getattr(self, "_pending_role", None) is not None:
                self.role = self._pending_role
                self._pending_role = None
                if self.role == P.COMMANDER:
                    self._tx_off = 0      # our TX stream starts fresh
                self.on_event(f"ROLE {'COMMANDER' if self.role == P.COMMANDER else 'RESPONDER'}")
                if (self.role == P.COMMANDER and self.cfg.turboshift
                        and self.cfg.gear_shift_on):
                    # reverse-direction probe: this node has never transmitted
                    # data on the link, so the channel in its direction is
                    # untested (HF paths are asymmetric) — probe the ladder
                    # upward exactly like the post-connect turboshift
                    # (reference: arq_commander.cc:1135-1167 runs whenever the
                    # commander role is assumed, not only at connect)
                    self._turbo_active = True
                    self._turbo_rendezvous = self.current_configuration
                    self._turbo_candidate = self._ladder_up()
                    self._turbo_stage = None
                    if self._turbo_candidate == self._turbo_rendezvous:
                        self._turbo_active = False   # already at ladder top
                    else:
                        self.on_event("TURBO START")
            return out

        # responder-side turbo revert: commander fell back to the rendezvous
        if (self._probe_deadline is not None and now > self._probe_deadline):
            self._probe_deadline = None
            if self._probe_revert_cfg is not None:
                self._set_config(self._probe_revert_cfg)
                self.on_event(f"TURBO REVERT {self.current_configuration}")
                self._probe_revert_cfg = None

        # link supervision (reference link_timeout, arq_common.cc:1216-1260)
        if self.link_status == P.CONNECTED:
            last = getattr(self, "_last_peer_activity", None)
            if last is None:
                self._last_peer_activity = last = now
            if now - last > self.cfg.link_timeout_ms:
                if self.role == P.RESPONDER:
                    # back to listening at the initial config so a
                    # re-connecting commander can reach us
                    self.link_status = P.LISTENING
                    self._rx_msgs.clear()
                    self._had_acked_block = False
                    self._set_config(self.cfg.init_configuration)
                    self.on_event("LINK TIMEOUT")
                else:
                    # reference behavior (arq_common.cc:1216-1260): the
                    # commander auto-reconnects at the initial configuration;
                    # un-ACKed data goes back to the TX FIFO
                    self._requeue_block()
                    self._await_ack_kind = None
                    self._pending_control = None
                    self._gear_pending = None
                    self._turbo_active = False
                    self._turbo_stage = None
                    self._tried_repeat = False
                    self.emergency_nacks = 0
                    self._resends_left = self.cfg.n_resends
                    self._set_config(self.cfg.init_configuration)
                    self.link_status = P.CONNECTING
                    self._resume_connect = True   # keep stream offsets
                    self._last_peer_activity = now
                    self.on_event("LINK TIMEOUT - RECONNECTING")
                return out

        if self.role != P.COMMANDER:
            return out

        # ack timeout handling
        if self._await_ack_kind is not None:
            if now < self._await_deadline:
                return out
            kind = self._await_ack_kind
            self._await_ack_kind = None
            if kind == "control" and self._turbo_stage is not None:
                # turbo probe failed: settle at the rendezvous config
                self._pending_control = None
                self._set_config(self._turbo_rendezvous)
                self._turbo_active = False
                self._turbo_stage = None
                self.on_event(f"TURBO DONE {self.current_configuration}")
                return out
            if kind == "control" and self._gear_pending is not None:
                # gearshift proposal unACKed: drop it and stay on the old
                # config — do NOT resend (the responder may have switched and
                # will revert via its deadline; resending at the old config
                # while it listens on the new one would desync the link)
                self._pending_control = None
                self._gear_pending = None
                self.consecutive_data_acks = 0
                return out
            self._resends_left -= 1
            self.consecutive_data_acks = 0
            if kind == "data":
                if not getattr(self, "_tried_repeat", False):
                    # maybe only the ACK was lost: ask the responder to
                    # repeat it before re-sending the whole block
                    # (reference REPEAT_LAST_ACK, datalink_defines.h:83)
                    self._tried_repeat = True
                    ctrl = P.Message(type=P.CONTROL, length=1,
                                     data=bytes([P.REPEAT_LAST_ACK]))
                    out.append(self._modulate_batch([ctrl]))
                    self._start_wait("data", now)
                    return out
                self._tried_repeat = False
                self.emergency_nacks += 1
                if (self.cfg.gear_shift_on
                        and self.emergency_nacks >= self.cfg.emergency_nack_threshold):
                    return [self._emergency_break(now)]
            if self._resends_left <= 0:
                self.link_status = P.DROPPED
                self.on_event("LINK FAILED")
                return out
            # fall through to retransmit below

        if self.link_status == P.CONNECTING and self._pending_control is None:
            data = bytes([P.START_CONNECTION,
                          P.crc8(self.destination_call_sign.encode())]) \
                + P.callsign_pack(self.call_sign)
            # the CONTROL header's (otherwise unused) sequence byte carries
            # the resume flag: 1 = link-timeout reconnect, keep stream
            # offsets; 0 = fresh session, responder resets its RX offset
            self._pending_control = P.Message(
                type=P.CONTROL, length=len(data), data=data,
                sequence=1 if getattr(self, "_resume_connect", False) else 0)

        # turboshift probe driver
        if (self.link_status == P.CONNECTED and self._turbo_active
                and self._pending_control is None):
            if self._turbo_stage is None:
                data = bytes([P.SET_CONFIG, self._turbo_candidate & 0xFF,
                              self._turbo_rendezvous & 0xFF, 1])
                self._pending_control = P.Message(type=P.CONTROL,
                                                  length=len(data), data=data)
            elif self._turbo_stage == "test":
                self._pending_control = P.Message(
                    type=P.CONTROL, length=1, data=bytes([P.TEST_CONNECTION]))

        if self._pending_control is not None:
            if self._turbo_active and self._turbo_stage is None:
                self._turbo_stage = "set"
            out.append(self._modulate_batch([self._pending_control]))
            self._start_wait("control", now)
            return out

        if self.link_status != P.CONNECTED:
            return out

        # gearshift proposal
        if (self.cfg.gear_shift_on and self._gear_pending is None
                and self.consecutive_data_acks >= self.frame_shift_threshold):
            nxt = self._ladder_up()
            if nxt != self.current_configuration:
                self._gear_pending = nxt
                data = bytes([P.SET_CONFIG, nxt & 0xFF, self.current_configuration & 0xFF])
                self._pending_control = P.Message(type=P.CONTROL,
                                                  length=len(data), data=data)
                out.append(self._modulate_batch([self._pending_control]))
                self._start_wait("control", now)
                return out
            self.consecutive_data_acks = 0

        # idle keep-alive (reference KEEP_ALIVE, datalink_defines.h:75)
        if (self.link_status == P.CONNECTED and not self.fifo_tx
                and not self._block_msgs and self._pending_control is None
                and now - self._last_peer_activity > self.cfg.link_timeout_ms / 3):
            self._pending_control = P.Message(type=P.CONTROL, length=1,
                                              data=bytes([P.KEEP_ALIVE]))
            out.append(self._modulate_batch([self._pending_control]))
            self._start_wait("control", now)
            return out

        # data block
        if self._block_msgs or self.fifo_tx:
            if not self._block_msgs:
                self._assemble_block()
            batch = list(self._block_msgs)
            count = len(batch)
            # BLOCK_END carries the message count and the block's byte
            # offset in the TX stream so the responder can exactly dedupe a
            # retransmit of a block whose ACK was lost — even across
            # reconnects and config changes that reframe the bytes
            # (extension over the reference, which can deliver duplicates in
            # that scenario)
            batch.append(P.Message(
                type=P.CONTROL, length=6,
                data=bytes([P.BLOCK_END, count])
                + int(self._block_off).to_bytes(4, "little")))
            out.append(self._modulate_batch(batch))
            self.stats.sent_data += count
            self.stats.blocks_sent += 1
            self._start_wait("data", now)
            return out

        return out

    def _assemble_block(self) -> None:
        # stream offset of this block's first byte: fifo_tx[0] always sits at
        # _tx_off (ACKed bytes advance it; requeued bytes return to the front)
        self._block_off = getattr(self, "_tx_off", 0)
        self._block_msgs = []
        mid = 0
        while self.fifo_tx and mid < self.cfg.batch_size:
            chunk = bytes(self.fifo_tx[: self.max_data_length])
            del self.fifo_tx[: len(chunk)]
            mtype = P.DATA_LONG if len(chunk) == self.max_data_length else P.DATA_SHORT
            self._block_msgs.append(
                P.Message(type=mtype, id=mid, length=len(chunk), data=chunk))
            mid += 1

    def _ladder_up(self) -> int:
        ladder = FULL_CONFIG_LADDER if self.cfg.robust_enabled else list(range(16))
        if self.current_configuration in ladder:
            i = ladder.index(self.current_configuration)
            if i + 1 < len(ladder):
                return ladder[i + 1]
        return self.current_configuration

    def _emergency_break(self, now: float) -> np.ndarray:
        """Send the BREAK pattern and drop to the ladder floor for
        coordination (reference: arq_commander.cc:42-187). Gearshift climbs
        back up from there once blocks flow again."""
        self.emergency_nacks = 0
        self.stats.breaks_sent += 1
        self.stats.gearshift_downs += 1
        pattern = self._pat.break_passband.astype(np.float32)
        self._set_config(self._ladder_floor())
        self.on_event(f"BREAK -> {self.current_configuration}")
        return pattern

    def send_marker(self, code: int) -> None:
        """Queue a FILE_START/FILE_END/PIPE_OPEN/PIPE_CLOSE control marker."""
        assert code in (P.FILE_START, P.FILE_END_, P.PIPE_OPEN, P.PIPE_CLOSE)
        self._pending_control = P.Message(type=P.CONTROL, length=1,
                                          data=bytes([code]))

    def switch_role(self) -> None:
        """Hand the commander role to the peer (reference SWITCH_ROLE,
        datalink_defines.h:80) so it can transmit its queued data."""
        assert self.role == P.COMMANDER and self.link_status == P.CONNECTED
        self._pending_control = P.Message(type=P.CONTROL, length=1,
                                          data=bytes([P.SWITCH_ROLE]))

    def disconnect(self) -> list[np.ndarray]:
        data = bytes([P.CLOSE_CONNECTION])
        self._pending_control = P.Message(type=P.CONTROL, length=1, data=data)
        self.link_status = P.DISCONNECTING
        return []
