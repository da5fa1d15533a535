"""Terminal dashboard (ImGui GUI stand-in): pure render-function checks."""

import numpy as np

from mercury_tpu.dashboard import (Dashboard, level_dbfs, render_constellation,
                                   render_vu, render_waterfall)


def test_waterfall_render_shapes():
    spec = np.random.default_rng(0).uniform(-80, -20, (30, 257))
    lines = render_waterfall(spec, width=40, height=10, color=False)
    assert len(lines) == 10 and all(len(l) == 40 for l in lines)
    colored = render_waterfall(spec, width=8, height=2, color=True)
    assert all(l.endswith("\x1b[0m") for l in colored)


def test_waterfall_empty():
    lines = render_waterfall(np.zeros((0, 257)), width=16, height=4)
    assert len(lines) == 4


def test_constellation_marks_points():
    pts = np.array([1 + 0j, -1 + 0j, 0 + 1j, 0 - 1j, 1 + 0j])
    lines = render_constellation(pts, size=17)
    assert len(lines) == 17
    joined = "\n".join(lines)
    assert "o" in joined or "@" in joined   # repeated point upgraded


def test_vu_and_level():
    assert render_vu(0.0).count("#") == 30
    assert render_vu(-60.0).count("#") == 0
    x = np.full(1000, 1.0, np.float32)
    assert abs(level_dbfs(x)) < 0.1


def test_dashboard_frame_composes():
    d = Dashboard(width=32, color=False)
    d.update_samples(np.random.default_rng(1).standard_normal(48000)
                     .astype(np.float32))
    out = d.frame({"config": 9, "link_status": "CONNECTED", "snr_db": 12.3,
                   "cfo_hz": -1.5, "buffer_tx": 42, "throughput_bps": 950.0,
                   "rx_level_dbfs": -12.0, "ptt": True},
                  constellation=np.array([0.7 + 0.7j, -0.7 - 0.7j]))
    assert "cfg=  9" in out and "CONNECTED" in out and "PTT" in out
    assert "waterfall" in out and "constellation" in out


def test_frame_renders_signal_dbm():
    d = Dashboard(width=64, color=False)
    out = d.frame({"config": 9, "link_status": "DECODED", "snr_db": 12.0,
                   "cfo_hz": 1.0, "signal_dbm": -37.2,
                   "noise_floor_dbm": -58.9})
    assert "SIG" in out and "-37.2 dBm" in out
    assert "noise floor" in out and "S/N +21.7 dB" in out
    # no noise floor yet: renders placeholder, no crash
    out2 = d.frame({"signal_dbm": -40.0})
    assert "--" in out2


def test_visual_monitor_renders_headless(tmp_path):
    """The matplotlib visual monitor (gui.py — the ImGui window's
    counterpart) renders waterfall + constellation + VU + readouts from
    real samples and writes a snapshot, headless (Agg)."""
    from mercury_tpu.gui import VisualMonitor

    rng = np.random.default_rng(0)
    t = np.arange(48000)
    samples = (0.2 * np.sin(2 * np.pi * 1500.0 / 48000.0 * t)
               + 0.01 * rng.standard_normal(len(t))).astype(np.float32)
    const = (rng.choice([-1, 1], 200) + 1j * rng.choice([-1, 1], 200)
             ) / np.sqrt(2)
    mon = VisualMonitor()
    mon.update(samples, const, {"config": 9, "link_status": "DECODED",
                                "snr_db": 12.5, "cfo_hz": -3.2,
                                "signal_dbm": -60.0,
                                "noise_floor_dbm": -90.0})
    mon.update(samples[:4096])              # incremental update path
    out = tmp_path / "mon.png"
    mon.snapshot(str(out))
    mon.close()
    assert out.exists() and out.stat().st_size > 20000
