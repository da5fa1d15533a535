"""VARA-compatible TCP API integration test: two servers bridged by the
in-process pair transport, driven through raw sockets like a Winlink client."""

import socket
import time

import numpy as np
import pytest

from mercury_tpu.link.node import ArqConfig
from mercury_tpu.link.tcp_api import ArqTcpServer
from mercury_tpu.link.transport import PairTransport


def _recv_lines(sock, timeout=5.0):
    sock.settimeout(timeout)
    buf = b""
    try:
        while b"\r" not in buf:
            chunk = sock.recv(4096)
            if not chunk:
                break
            buf += chunk
    except socket.timeout:
        pass
    return [l.decode() for l in buf.split(b"\r") if l]


@pytest.mark.timeout(300)
def test_tcp_api_end_to_end():
    pair = PairTransport()
    cfg = ArqConfig(init_configuration=0, gear_shift_on=False, batch_size=2)
    srv_a = ArqTcpServer(base_port=17002, config=cfg, transport=pair.a)
    srv_b = ArqTcpServer(base_port=17012, config=cfg, transport=pair.b)
    srv_a.start()
    srv_b.start()
    time.sleep(0.5)

    ctl_a = socket.create_connection(("127.0.0.1", 17002))
    dat_a = socket.create_connection(("127.0.0.1", 17003))
    ctl_b = socket.create_connection(("127.0.0.1", 17012))
    dat_b = socket.create_connection(("127.0.0.1", 17013))

    try:
        ctl_b.sendall(b"MYCALL N0CALL\r")
        assert "OK" in _recv_lines(ctl_b)
        ctl_b.sendall(b"LISTEN ON\r")
        assert "OK" in _recv_lines(ctl_b)

        ctl_a.sendall(b"CONNECT VE3XYZ N0CALL\r")
        lines = []
        deadline = time.time() + 5
        while time.time() < deadline and "PENDING" not in lines:
            lines += _recv_lines(ctl_a, 1.0)
        assert "OK" in lines and "PENDING" in lines

        # wait for CONNECTED on both control sockets
        deadline = time.time() + 120
        a_conn = b_conn = False
        while time.time() < deadline and not (a_conn and b_conn):
            a_conn = a_conn or any("CONNECTED" in l for l in _recv_lines(ctl_a, 1.0))
            b_conn = b_conn or any("CONNECTED" in l for l in _recv_lines(ctl_b, 1.0))
        assert a_conn and b_conn, "no CONNECTED event on control sockets"

        # push payload through the data port
        payload = b"TCP API ROUNDTRIP " * 3
        dat_a.sendall(payload)
        got = b""
        dat_b.settimeout(2.0)
        deadline = time.time() + 150
        while time.time() < deadline and len(got) < len(payload):
            try:
                chunk = dat_b.recv(8192)
                if chunk:
                    got += chunk
            except socket.timeout:
                pass
        assert got[: len(payload)] == payload

        # BUFFER TX query
        ctl_a.sendall(b"BUFFER TX\r")
        lines = _recv_lines(ctl_a)
        assert any(l.startswith("BUFFER") for l in lines)
    finally:
        for s in (ctl_a, dat_a, ctl_b, dat_b):
            s.close()
        srv_a.stop()
        srv_b.stop()


def test_runtime_control_commands():
    """Runtime control surface (reference GUI capability parity: LDPC
    iteration slider, gain sliders, config/gearshift changes while running
    — gui_main.cc:452-1124, setup_dialog.cc:203-455) over the TCP API."""
    pair = PairTransport()
    cfg = ArqConfig(init_configuration=0, gear_shift_on=True, batch_size=2)
    srv = ArqTcpServer(base_port=17202, config=cfg, transport=pair.a)
    replies = []
    srv._reply = replies.append

    srv._handle_command("STATUS")
    assert replies[-1].startswith("STATUS link=")
    assert "load=" in replies[-1] and "buftx=" in replies[-1]

    srv._handle_command("LDPCITER 25")
    assert replies[-1] == "OK"
    assert srv.node._rx.ldpc_max_iter == 25
    srv._handle_command("LDPCITER 9999")
    assert replies[-1] == "WRONG"

    srv._handle_command("TXGAIN -6")
    assert replies[-1] == "OK"
    assert srv.transport.tx_gain == pytest.approx(10 ** (-6 / 20))
    srv._handle_command("RXGAIN 3")
    assert replies[-1] == "OK"
    assert srv.transport.rx_gain == pytest.approx(10 ** (3 / 20))

    srv._handle_command("GEARSHIFT OFF")
    assert replies[-1] == "OK" and srv.node.cfg.gear_shift_on is False
    srv._handle_command("GEARSHIFT ON")
    assert srv.node.cfg.gear_shift_on is True

    srv._handle_command("SETCONFIG 3")      # idle/listening: direct switch
    assert replies[-1] == "OK"
    assert srv.node.current_configuration == 3

    srv._handle_command("SIGNAL")
    assert replies[-1].startswith("SIGNAL ")
