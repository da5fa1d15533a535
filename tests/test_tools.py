"""Tooling: link-log forensics analyzer (reference analyze_turboshift_log.py
parity — event timeline, turbo phases, breaks, reconnects, residency)."""

import sys

sys.path.insert(0, "/root/repo/tools")

from analyze_link_log import analyze, parse_lines, render  # noqa: E402

LOG = """\
   1.50 RSP: CONNECTED VE3TPU
   2.10 CMD: CONNECTED N0CALL
   2.10 CMD: TURBO START
   3.60 RSP: GEARSHIFT 1
   6.40 CMD: TURBO OK 1
   9.00 CMD: TURBO DONE 1
  20.00 CMD: BREAK -> 0
  21.00 RSP: BREAK->CONFIG 0
  55.00 CMD: LINK TIMEOUT - RECONNECTING
"""


def test_parse_and_analyze():
    a = analyze(parse_lines(LOG.splitlines()))
    assert a["n_events"] == 9
    assert a["connect_s"] == 1.5
    assert len(a["turbo_phases"]) == 1
    ph = a["turbo_phases"][0]
    assert ph["final_config"] == 1 and len(ph["steps"]) == 1
    assert abs(ph["duration_s"] - 6.9) < 1e-9
    assert len(a["breaks"]) == 2
    assert len(a["reconnects"]) == 1
    # residency: RSP sat at cfg1 from 3.6 until BREAK->0 at 21.0
    assert abs(a["config_residency_s"]["RSP"][1] - 17.4) < 0.01
    text = render(a)
    assert "turbo #0" in text and "reconnects at" in text


def test_ignores_non_event_lines():
    noise = ["garbage line", "sim 72.2s: 300/300 bytes (OK)", ""]
    a = analyze(parse_lines(noise + LOG.splitlines()))
    assert a["n_events"] == 9


def test_flowgraph_blocks_roundtrip():
    """examples/flowgraph.py (the GNU Radio OOT module's stand-in):
    the padder/IFFT/GI/framer block chain round-trips carriers through an
    AWGN splice at the expected EVM."""
    import examples.flowgraph as fg_mod

    assert fg_mod.main() == 0
