"""Randomized ARQ property fuzz (round-2 verdict item 8).

The commander/responder FSM has ~30 interacting state fields; these tests
drive 1000 randomized episodes of commander<->responder traffic through a
SYMBOLIC channel that drops, duplicates and reorders individual frames
(the failure modes of arq_common.cc:1101-1517's world) and assert the
protocol invariants:

  * every delivered stream byte is delivered exactly once, in order
    (received() is always a prefix of the sent payload);
  * a surviving link delivers the whole payload;
  * a dead channel ends in a clean DROP/timeout, never an exception;
  * after quiescence on a clean channel both ends agree on the config.

The PHY is bypassed: modulation/pattern methods are patched to emit tagged
message bundles and delivery calls the node's own frame/ack handlers — the
exact code paths on_samples dispatches into — so the fuzz exercises the
full FSM (blocks, selective acks, REPEAT_LAST_ACK, gearshift, BREAK
ladder, reconnect) at ~1000x real time.
"""

import dataclasses

import numpy as np
import pytest

from mercury_tpu.link import protocol as P
from mercury_tpu.link.node import ArqConfig, ArqNode


class _Tag:
    """Stands in for a passband block; survives astype/append untouched."""

    def __init__(self, kind, msgs=None):
        self.kind = kind
        self.msgs = msgs or []

    def astype(self, _dtype):
        return self


class _PatShim:
    ack_passband = _Tag("ack_pattern")
    break_passband = _Tag("break")
    threshold = 1.0


def _patch(node: ArqNode) -> None:
    node._modulate_batch = lambda msgs: _Tag(
        "frames", [dataclasses.replace(m) for m in msgs])
    node._modulate_ack_frame = lambda m: _Tag(
        "ack_frame", [dataclasses.replace(m)])
    node._pat = _PatShim()
    orig = node._set_config

    def set_cfg(c, _orig=orig, _n=node):
        _orig(c)
        _n._pat = _PatShim()          # real _set_config re-installs the PHY
    node._set_config = set_cfg


def tx_cfg_of(node: ArqNode) -> int:
    return node.current_configuration


def _deliver(tag: _Tag, rx: ArqNode, now: float, rng, p_loss, p_dup,
             p_reorder, sender: ArqNode) -> None:
    if tag.kind == "break":
        # BREAK tone: loud, but still a channel event — small loss chance
        if rng.random() > p_loss / 2:
            rx._on_break_detected(now)
        return
    if tag.kind == "ack_pattern":
        if rx._await_ack_kind is not None and rng.random() > p_loss:
            rx._on_ack_pattern(now)
        return
    if tag.kind == "ack_frame":
        if rx._await_ack_kind is not None:
            for m in tag.msgs:
                if rng.random() > p_loss:
                    rx._on_ack_frame(m, now)
        return
    # data/control frames: per-frame loss, duplication, reorder — exactly
    # what a fading channel + retransmits can produce
    if rx._await_ack_kind is not None:
        return                        # a waiting commander ignores frames
    if not (rx.role == P.RESPONDER or rx.link_status == P.CONNECTED):
        return
    if tx_cfg_of(sender) != tx_cfg_of(rx):
        # config desync: a frame modulated at one config cannot decode at
        # another (different frame geometry/CRC) — the real PHY drops it
        return
    frames = [m for m in tag.msgs if rng.random() > p_loss]
    all_decoded = len(frames) == len(tag.msgs)
    frames += [m for m in frames if rng.random() < p_dup]
    if len(frames) > 1 and rng.random() < p_reorder:
        rng.shuffle(frames)
    before = rx.stats.received_data
    for m in frames:
        rx._on_frame(P.serialize(m, sender.connection_id), now)
    if (rx.cfg.wire_compat and rx.role == P.RESPONDER
            and rx.stats.received_data > before and all_decoded):
        # on_samples queues the stock data-batch pattern ack (only when
        # every frame slot of the window decoded — node.py on_samples); the
        # symbolic channel bypasses on_samples, so emulate that hook here
        rx._queue_pattern_ack(now)


def _episode(seed: int) -> dict:
    rng = np.random.default_rng(seed)
    p_loss = float(rng.choice([0.0, 0.05, 0.15, 0.3]))
    p_dup = float(rng.choice([0.0, 0.05, 0.15]))
    p_reorder = float(rng.choice([0.0, 0.3]))
    cfg = ArqConfig(init_configuration=int(rng.choice([0, 1, 5, 9])),
                    gear_shift_on=bool(rng.random() < 0.7),
                    robust_enabled=False,
                    batch_size=int(rng.integers(1, 5)),
                    wire_compat=bool(rng.random() < 0.25))
    cmd = ArqNode("VE3XYZ", P.COMMANDER, cfg)
    rsp = ArqNode("N0CALL", P.RESPONDER, cfg)
    _patch(cmd)
    _patch(rsp)
    # record each BLOCK_END delivery separately: the stock wire (no
    # count/offset in BLOCK_END) can legitimately re-deliver the last block
    # when its final ack is lost across a reconnect — the documented stock
    # weakness the repo's extended framing fixes — so compat episodes are
    # judged block-delivery-wise
    deliveries = []
    orig_be = rsp._on_block_end

    def be(msg, now, _o=orig_be):
        pre = len(rsp.fifo_rx)
        _o(msg, now)
        if len(rsp.fifo_rx) > pre:
            deliveries.append(bytes(rsp.fifo_rx[pre:]))
    rsp._on_block_end = be
    n_bytes = int(rng.integers(20, 400))
    payload = bytes(rng.integers(0, 256, n_bytes).astype(np.uint8))
    cmd.send_data(payload)
    cmd.connect("N0CALL")

    now = 0.0
    done_at = None
    for _step in range(3000):
        for tx_node, rx_node in ((cmd, rsp), (rsp, cmd)):
            for tag in tx_node.poll(now):
                _deliver(tag, rx_node, now, rng, p_loss, p_dup, p_reorder,
                         tx_node)
            now += 700.0
        if cmd.link_status == P.DROPPED:
            break
        if (len(rsp.fifo_rx) >= n_bytes and not cmd._block_msgs
                and not cmd.fifo_tx):
            if done_at is None:
                done_at = now
            elif now - done_at > 5000:
                break                 # a few quiescent polls after delivery
    got = rsp.received()
    # deduped stream: collapse stock re-deliveries of the most recent block
    stream = b""
    for d in deliveries:
        if cfg.wire_compat and stream.endswith(d):
            continue                  # stock duplicate of the last block
        stream += d
    return {"seed": seed, "p_loss": p_loss, "payload": payload, "got": got,
            "stream": stream, "compat": cfg.wire_compat,
            "cmd": cmd, "rsp": rsp}


SEEDS = list(range(1000))


@pytest.mark.parametrize("chunk", range(20))
def test_fuzz_arq_invariants(chunk):
    """50 episodes per chunk x 20 chunks = 1000 randomized episodes."""
    for seed in SEEDS[chunk * 50: (chunk + 1) * 50]:
        r = _episode(seed)
        payload, cmd = r["payload"], r["cmd"]
        # native framing: exactly-once, in-order — the raw received stream
        # is a prefix of the sent payload. Stock compat framing: same after
        # collapsing re-deliveries of the most recent block (the stock
        # BLOCK_END carries no identity, so a lost final ack across a
        # reconnect legitimately re-delivers — the weakness the extended
        # framing exists to fix).
        stream = r["stream"] if r["compat"] else r["got"]
        assert stream == payload[: len(stream)], \
            f"seed {seed}: delivery corrupted (loss={r['p_loss']})"
        # a clean channel must always deliver everything exactly once
        if r["p_loss"] == 0.0:
            assert r["got"] == payload, \
                f"seed {seed}: loss-free episode failed"
            assert cmd.link_status != P.DROPPED


def test_fuzz_clean_channel_config_agreement():
    """On a loss-free channel with gearshift, both ends must agree on the
    configuration after quiescence."""
    for seed in (2001, 2002, 2003, 2004, 2005):
        rng = np.random.default_rng(seed)
        cfg = ArqConfig(init_configuration=0, gear_shift_on=True,
                        robust_enabled=False, batch_size=3)
        cmd = ArqNode("VE3XYZ", P.COMMANDER, cfg)
        rsp = ArqNode("N0CALL", P.RESPONDER, cfg)
        _patch(cmd)
        _patch(rsp)
        payload = bytes(rng.integers(0, 256, 600).astype(np.uint8))
        cmd.send_data(payload)
        cmd.connect("N0CALL")
        now = 0.0
        for _ in range(2000):
            for a, b in ((cmd, rsp), (rsp, cmd)):
                for tag in a.poll(now):
                    _deliver(tag, b, now, rng, 0.0, 0.0, 0.0, a)
                now += 700.0
            if len(rsp.fifo_rx) >= len(payload) and not cmd.fifo_tx \
                    and not cmd._block_msgs:
                break
        assert rsp.received() == payload
        assert cmd.current_configuration == rsp.current_configuration
