"""Live ingest: socket/FIFO sources feeding the SPSC ring, drop accounting,
the rtl_tcp client, and a live end-to-end scanner run.

The reference's defining I/O property is live driver-thread sources with
back-pressure-by-drop (reference: src/rtlsource.cc:133-145,
src/firfilter.hh:219-226); io/live.py is that contract over a wire.
"""

import socket
import struct
import threading
import time

import numpy as np
import pytest

from libsdr_tpu.native import LivePump, RingBuffer


def u8_to_c64(u8):
    f = (u8.astype(np.float32) - 128.0) / 128.0
    return (f[0::2] + 1j * f[1::2]).astype(np.complex64)


def wait_until(cond, timeout=5.0):
    t0 = time.perf_counter()
    while not cond():
        if time.perf_counter() - t0 > timeout:
            raise TimeoutError("condition not met")
        time.sleep(0.01)


# ---------------------------------------------------------------------------
# Pump-level: TCP listen/connect, UDP, FIFO, drop accounting
# ---------------------------------------------------------------------------

def test_tcp_listen_stream_blocks(rng):
    """Push topology: a client connects to the pump and streams u8 IQ; the
    consumer sees the exact bytes as complex blocks, zero drops, EOS on
    close (final partial block zero-padded)."""
    from libsdr_tpu.io.live import LiveStats, _block_loop

    block = 4096
    data = rng.integers(0, 256, size=2 * int(3.5 * block), dtype=np.uint8)

    ring = RingBuffer(1 << 20)
    pump = LivePump.tcp_listen(0, ring, frame=2)
    port = pump.port
    assert port > 0

    def writer():
        with socket.create_connection(("127.0.0.1", port), timeout=5) as s:
            s.sendall(data.tobytes())

    t = threading.Thread(target=writer)
    t.start()
    # Drive the shared block loop directly on the already-started pump.
    stats = LiveStats()

    def convert(raw):
        return u8_to_c64(raw.view(np.uint8))

    def to_block(blk, pad_to=None):
        if pad_to is not None and len(blk) < pad_to:
            z = np.zeros(pad_to, np.complex64)
            z[:len(blk)] = blk
            return z
        return blk

    blocks = list(_block_loop(ring, pump, block, 1, convert, stats,
                              None, to_block))
    t.join()

    assert len(blocks) == 4  # 3 full + 1 padded partial
    got = np.concatenate(blocks)
    want = u8_to_c64(data)
    np.testing.assert_array_equal(got[:len(want)], want)
    np.testing.assert_array_equal(got[len(want):], 0)
    assert stats.bytes_in == len(data)
    assert stats.bytes_dropped == 0


def test_tcp_connect_pull(rng):
    """Pull topology (rtl_tcp-style): a server owns the wire, the pump
    connects and drains it."""
    from libsdr_tpu.io.live import LiveStats, stream_live_iq

    data = rng.integers(0, 256, size=32768, dtype=np.uint8)
    srv = socket.socket()
    srv.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
    srv.bind(("127.0.0.1", 0))
    srv.listen(1)
    port = srv.getsockname()[1]

    def server():
        c, _ = srv.accept()
        c.sendall(data.tobytes())
        c.close()

    t = threading.Thread(target=server)
    t.start()
    stats = LiveStats()
    blocks = list(stream_live_iq(f"tcp://127.0.0.1:{port}", 2048,
                                 stats=stats))
    t.join()
    srv.close()
    got = np.concatenate(blocks)
    want = u8_to_c64(data)
    np.testing.assert_array_equal(got[:len(want)], want)
    assert stats.bytes_in == len(data)
    assert stats.bytes_dropped == 0


def test_udp_datagrams(rng):
    """Datagram sink: payloads land in order (loopback), idle timeout ends
    the stream (UDP has no EOS)."""
    from libsdr_tpu.io.live import LiveStats, stream_live_iq

    stats = LiveStats()
    gen = stream_live_iq("udp://:0", 1024, stats=stats, timeout=1.0)
    port = stats.port   # ephemeral :0 bind resolved by the pump
    assert port > 0
    # 4.5 blocks: UDP has no EOS, so the trailing half block must arrive
    # via the idle-timeout drain (zero-padded), not be discarded.
    data = rng.integers(0, 256, size=9216, dtype=np.uint8)
    s = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
    for off in range(0, len(data), 2048):
        s.sendto(data[off:off + 2048].tobytes(), ("127.0.0.1", port))
        time.sleep(0.005)  # keep loopback datagrams ordered/undropped
    blocks = list(gen)
    s.close()
    assert len(blocks) == 5  # 4 full + 1 timeout-drained padded partial
    got = np.concatenate(blocks)
    want = u8_to_c64(data)
    np.testing.assert_array_equal(got[:len(want)], want)
    np.testing.assert_array_equal(got[len(want):], 0)
    assert stats.bytes_in == len(data)


def test_fifo_source(tmp_path, rng):
    """Named-pipe wire: writer opens/writes/closes; EOS follows the close
    (but NOT the empty pre-writer window)."""
    import os

    from libsdr_tpu.io.live import LiveStats, stream_live_iq

    path = str(tmp_path / "wire.fifo")
    os.mkfifo(path)
    data = rng.integers(0, 256, size=16384, dtype=np.uint8)

    def writer():
        time.sleep(0.2)  # pump must survive the no-writer window
        with open(path, "wb") as f:
            f.write(data.tobytes())

    t = threading.Thread(target=writer)
    t.start()
    stats = LiveStats()
    blocks = list(stream_live_iq(f"fifo://{path}", 2048, stats=stats))
    t.join()
    got = np.concatenate(blocks)
    np.testing.assert_array_equal(got[:len(data) // 2], u8_to_c64(data))
    assert stats.bytes_in == len(data)


def test_drop_accounting_frame_aligned():
    """The back-pressure-by-drop contract (reference: firfilter.hh:219-226):
    a full ring discards the overflow, COUNTS it, and never splits an IQ
    frame — pair alignment survives arbitrary drop points."""
    cap = 1 << 12
    ring = RingBuffer(cap)
    pump = LivePump.tcp_listen(0, ring, frame=2, chunk=1 << 10)
    # Pattern: even byte 0xAA (re), odd byte 0x55 (im).
    n = 1 << 16
    data = np.empty(n, np.uint8)
    data[0::2], data[1::2] = 0xAA, 0x55

    with socket.create_connection(("127.0.0.1", pump.port), timeout=5) as s:
        s.sendall(data.tobytes())  # nobody consumes: the ring must overflow
    wait_until(lambda: ring.eos)
    # all wire bytes accounted: kept + dropped == sent
    kept = ring.available
    assert pump.bytes_in == n
    assert pump.bytes_dropped == n - kept
    assert pump.bytes_dropped > 0
    # frame alignment: every surviving pair is still (0xAA, 0x55)
    out = ring.take(kept - kept % 2)
    assert out is not None
    np.testing.assert_array_equal(out[0::2], 0xAA)
    np.testing.assert_array_equal(out[1::2], 0x55)
    pump.stop()
    ring.close()


def test_drop_accounting_python_fallback(monkeypatch, rng):
    """Same contract on the pure-Python pump (no native library)."""
    import libsdr_tpu.native as native

    monkeypatch.setattr(native, "_lib", None)
    monkeypatch.setattr(native, "_tried", True)  # get_lib() -> None

    ring = RingBuffer(1 << 12)
    assert ring._lib is None
    pump = LivePump.tcp_listen(0, ring, frame=2, chunk=1 << 10)
    n = 1 << 15
    data = np.empty(n, np.uint8)
    data[0::2], data[1::2] = 0xAA, 0x55
    with socket.create_connection(("127.0.0.1", pump.port), timeout=5) as s:
        s.sendall(data.tobytes())
    wait_until(lambda: ring.eos)
    kept = ring.available
    assert pump.bytes_in == n
    assert pump.bytes_dropped == n - kept
    assert pump.bytes_dropped > 0
    out = ring.take(kept - kept % 2)
    np.testing.assert_array_equal(out[0::2], 0xAA)
    np.testing.assert_array_equal(out[1::2], 0x55)
    pump.stop()


# ---------------------------------------------------------------------------
# rtl_tcp protocol client
# ---------------------------------------------------------------------------

def _fake_rtl_tcp_server(burst_a: bytes, burst_b: bytes, cmds: list):
    """Minimal rtl_tcp: RTL0 header, stream burst_a once the ctor's
    rate+freq commands arrive, burst_b after a RETUNE (3rd command), then
    close — exercising the tune / stream / retune / stream cycle."""
    srv = socket.socket()
    srv.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
    srv.bind(("127.0.0.1", 0))
    srv.listen(1)
    port = srv.getsockname()[1]

    def run():
        c, _ = srv.accept()
        c.sendall(b"RTL0" + struct.pack(">II", 5, 29))  # R820T, 29 gains
        c.settimeout(0.05)
        buf = b""
        deadline = time.perf_counter() + 15.0
        sent_a = sent_b = False
        while time.perf_counter() < deadline:
            try:
                got = c.recv(4096)
                if not got:
                    break
                buf += got
                while len(buf) >= 5:
                    cmds.append(struct.unpack(">BI", buf[:5]))
                    buf = buf[5:]
            except socket.timeout:
                pass
            if not sent_a and len(cmds) >= 2:  # rate+freq arrived: stream
                c.sendall(burst_a)
                sent_a = True
            if not sent_b and len(cmds) >= 3:  # the retune
                c.sendall(burst_b)
                sent_b = True
            if sent_b:
                break
        c.close()
        srv.close()

    t = threading.Thread(target=run, daemon=True)
    t.start()
    return port, t


def test_rtl_tcp_source_retune_restream(rng):
    """Tune -> stream -> retune -> stream again on ONE RTLTCPSource: the
    first blocks() generator ending (idle timeout) must leave the
    connection, ring, and tuner usable — only close() tears down."""
    from libsdr_tpu.io.live import RTLTCPSource

    burst_a = rng.integers(0, 256, size=8192, dtype=np.uint8)
    burst_b = rng.integers(0, 256, size=8192, dtype=np.uint8)
    cmds: list = []
    port, t = _fake_rtl_tcp_server(burst_a.tobytes(), burst_b.tobytes(),
                                   cmds)

    src = RTLTCPSource("127.0.0.1", port, sample_rate=1_024_000,
                       frequency=144_800_000)
    assert src.tuner_type == 5 and src.tuner_gain_count == 29
    got_a = np.concatenate(list(src.blocks(2048, timeout=1.0)))
    np.testing.assert_array_equal(got_a[:len(burst_a) // 2],
                                  u8_to_c64(burst_a))
    # the generator ended on timeout; the source must still be usable
    src.set_frequency(145_000_000)      # retune -> server sends burst B
    got_b = np.concatenate(list(src.blocks(2048, timeout=2.0)))
    np.testing.assert_array_equal(got_b[:len(burst_b) // 2],
                                  u8_to_c64(burst_b))
    src.close()
    t.join(timeout=5)
    assert (0x02, 1_024_000) in cmds
    assert (0x01, 144_800_000) in cmds
    assert (0x01, 145_000_000) in cmds
    assert src.stats.bytes_in >= len(burst_a) + len(burst_b)


# ---------------------------------------------------------------------------
# End-to-end: the scanner decoding POCSAG from a live local wire
# ---------------------------------------------------------------------------

def test_scanner_live_end_to_end(tmp_path):
    """VERDICT r4 item 3's done-bar: the wideband scanner runs end-to-end
    from a live local wire (FIFO) and decodes the page, with drop/sustained
    accounting on the stream."""
    import os

    from libsdr_tpu.apps import scanner
    from tests.test_apps import _pocsag_iq

    m = 16
    ch_bw = 25_000.0
    fs = m * ch_bw
    n = int(fs * 1.0)
    narrow = _pocsag_iq(ch_bw, text="LIVE WIRE", address=99)
    t_ax = np.arange(n) / fs
    idx = np.minimum((np.arange(n) / m).astype(np.int64), len(narrow) - 1)
    wide = (0.6 * narrow[idx] * np.exp(2j * np.pi * (5 * fs / m) * t_ax)
            ).astype(np.complex64)
    inter = np.empty(2 * n, np.float32)
    inter[0::2], inter[1::2] = wide.real, wide.imag
    u8 = np.clip(np.round(inter * 128.0 + 128.0), 0, 255).astype(np.uint8)

    path = str(tmp_path / "antenna.fifo")
    os.mkfifo(path)

    def antenna():
        with open(path, "wb") as f:
            f.write(u8.tobytes())

    th = threading.Thread(target=antenna)
    th.start()
    found = scanner.main(["--live", f"fifo://{path}", "--rate", str(fs),
                          "--channels", str(m)])
    th.join()
    assert 5 in found
    assert found[5][0].address == 99
    assert found[5][0].as_text().startswith("LIVE WIRE")


def test_throughput_drop_metrics():
    from libsdr_tpu.core.runtime import Throughput
    from libsdr_tpu.io.live import LiveStats

    th = Throughput()
    th.add(900)
    th.add_dropped(100)
    assert th.drop_fraction == pytest.approx(0.1)
    assert "dropped" in th.report()

    st = LiveStats(bytes_in=2000, bytes_dropped=200)
    th2 = Throughput()
    th2.add(900)
    th2.update_from(st)
    assert th2.dropped == 100
    assert th2.drop_fraction == pytest.approx(0.1)


def test_aprs_service_live_fifo(tmp_path):
    """Always-on APRS deployment: live s16 AFSK audio wire -> incremental
    decode -> spot stored (and pushed to /ws subscribers) while serving."""
    import os

    from libsdr_tpu.apps import aprs_service
    from libsdr_tpu.ops import siggen
    from libsdr_tpu.decode import ax25_frame_bits
    from tests.test_apps import _nrzi

    fs = 24_000
    frame_bits = ax25_frame_bits(
        "N0CALL", "APRS", b"=5230.10N/01323.60E-LiveWire", n_flags=50)
    audio = siggen.fsk_modulate(fs, _nrzi(frame_bits), 1202.0,
                                1200.0, 2200.0).real
    audio = np.concatenate([audio, np.zeros(4000, np.float32)])
    s16 = np.clip(0.8 * audio * 32767.0, -32768, 32767).astype(np.int16)

    path = str(tmp_path / "afsk.fifo")
    os.mkfifo(path)

    def antenna():
        with open(path, "wb") as f:
            f.write(s16.tobytes())

    t = threading.Thread(target=antenna)
    t.start()
    store = aprs_service.main(["--live", f"fifo://{path}",
                               "--rate", str(fs), "--port", "0",
                               "--block-size", "12000"])
    t.join()
    spots = store.spots()
    assert spots and abs(spots[0]["latitude"] - (52 + 30.10 / 60)) < 1e-4
    assert spots[0]["comment"] == "LiveWire"


def test_scanner_live_bf16(tmp_path):
    """scanner --live --bf16: the u8 wire streams as bf16 planes straight
    into the PFB front end from a live FIFO."""
    import os

    from libsdr_tpu.apps import scanner
    from tests.test_apps import _pocsag_iq

    m = 16
    ch_bw = 25_000.0
    fs = m * ch_bw
    n = int(fs * 1.0)
    narrow = _pocsag_iq(ch_bw, text="BF16 LIVE", address=33)
    t_ax = np.arange(n) / fs
    idx = np.minimum((np.arange(n) / m).astype(np.int64), len(narrow) - 1)
    wide = (0.6 * narrow[idx] * np.exp(2j * np.pi * (2 * fs / m) * t_ax)
            ).astype(np.complex64)
    inter = np.empty(2 * n, np.float32)
    inter[0::2], inter[1::2] = wide.real, wide.imag
    u8 = np.clip(np.round(inter * 128.0 + 128.0), 0, 255).astype(np.uint8)

    path = str(tmp_path / "wire.fifo")
    os.mkfifo(path)

    def antenna():
        with open(path, "wb") as f:
            f.write(u8.tobytes())

    t = threading.Thread(target=antenna)
    t.start()
    found = scanner.main(["--live", f"fifo://{path}", "--rate", str(fs),
                          "--channels", str(m), "--bf16"])
    t.join()
    assert 2 in found
    assert found[2][0].address == 33
    assert found[2][0].as_text().startswith("BF16 LIVE")


def test_multimode_live_fifo(tmp_path):
    """Multimode bank from a live wire: a mixed POCSAG+RTTY band streamed
    over a FIFO decodes both channels (--map single-chip path)."""
    import os

    from libsdr_tpu.apps import multimode
    from tests.test_apps import make_mixed_band

    m = 16
    fs = m * 24_000.0
    active = {2: "pocsag", 9: "rtty"}
    wide = make_mixed_band(active, m)
    inter = np.empty(2 * len(wide), np.float32)
    inter[0::2], inter[1::2] = wide.real, wide.imag
    u8 = np.clip(np.round(inter * 128.0 + 128.0), 0, 255).astype(np.uint8)

    path = str(tmp_path / "band.fifo")
    os.mkfifo(path)

    def antenna():
        with open(path, "wb") as f:
            f.write(u8.tobytes())

    t = threading.Thread(target=antenna)
    t.start()
    found = multimode.main(["--live", f"fifo://{path}", "--rate", str(fs),
                            "--channels", str(m),
                            "--map", "2:pocsag,9:rtty"])
    t.join()
    assert found[2][0] == "pocsag" and found[2][1][0].address == 99
    assert found[9][0] == "rtty" and "RY MULTI" in found[9][1]


def test_timeout_watches_wire_progress_not_blocks(rng):
    """--live-timeout must measure time with NO WIRE BYTES, not time since
    the last full block: a healthy low-rate wire that needs longer than
    the timeout to fill one block keeps streaming."""
    from libsdr_tpu.io.live import LiveStats, stream_live_iq

    srv = socket.socket()
    srv.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
    srv.bind(("127.0.0.1", 0))
    srv.listen(1)
    port = srv.getsockname()[1]
    data = rng.integers(0, 256, size=8192, dtype=np.uint8)

    def server():
        c, _ = srv.accept()
        # trickle 1 KB every 150 ms: a 2048-sample (4 KB) block takes
        # ~0.6 s > the 0.4 s timeout, but bytes never stop flowing
        for off in range(0, len(data), 1024):
            c.sendall(data[off:off + 1024].tobytes())
            time.sleep(0.15)
        c.close()
        srv.close()

    t = threading.Thread(target=server)
    t.start()
    stats = LiveStats()
    blocks = list(stream_live_iq(f"tcp://127.0.0.1:{port}", 2048,
                                 stats=stats, timeout=0.4))
    t.join()
    assert sum(len(b) for b in blocks) * 2 == len(data)
    assert stats.bytes_in == len(data)


def test_native_tcp_connect_resolves_hostname(rng):
    """The native pump must resolve hostnames (getaddrinfo), not just
    IPv4 literals — README documents tcp://radiohost:1234."""
    from libsdr_tpu.native import get_lib

    if get_lib() is None:
        pytest.skip("native library unavailable")
    data = rng.integers(0, 256, size=4096, dtype=np.uint8)
    srv = socket.socket()
    srv.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
    srv.bind(("127.0.0.1", 0))
    srv.listen(1)
    port = srv.getsockname()[1]

    def server():
        c, _ = srv.accept()
        c.sendall(data.tobytes())
        c.close()
        srv.close()

    t = threading.Thread(target=server)
    t.start()
    ring = RingBuffer(1 << 20)
    pump = LivePump.tcp_connect("localhost", port, ring)
    t.join()
    wait_until(lambda: ring.eos)
    got = ring.take(len(data))
    np.testing.assert_array_equal(got, data)
    pump.stop()
    ring.close()


def test_drop_contract_under_racing_consumer():
    """Stress the SPSC ring + drop accounting under a real race: frames
    carry sequence numbers, a slow consumer drains while the wire blasts.
    Invariants: every surviving frame is intact (no byte shears), sequence
    numbers are strictly increasing (drops are gaps, never reorders), and
    kept + dropped == sent exactly."""
    frame = 4  # u16 seq + u16 checksum-ish complement
    n_frames = 200_000
    seq = np.arange(n_frames, dtype=np.uint16)
    wire = np.empty((n_frames, 2), np.uint16)
    wire[:, 0] = seq
    wire[:, 1] = ~seq
    data = wire.view(np.uint8).reshape(-1)

    ring = RingBuffer(1 << 14)
    pump = LivePump.tcp_listen(0, ring, frame=frame, chunk=1 << 12)
    port = pump.port

    kept = []

    def writer():
        with socket.create_connection(("127.0.0.1", port), timeout=10) as s:
            s.sendall(data.tobytes())

    t = threading.Thread(target=writer)
    t.start()
    # racing consumer: drain in odd-sized frame-multiples with tiny naps
    while True:
        out = ring.take(37 * frame)
        if out is None:
            if ring.eos:
                n = ring.available - ring.available % frame
                if n:
                    out = ring.take(n)
                    if out is not None:
                        kept.append(out)
                break
            time.sleep(0.0002)
            continue
        kept.append(out)
    t.join()

    got = np.concatenate(kept).view(np.uint16).reshape(-1, 2)
    assert np.array_equal(got[:, 1], (~got[:, 0]).astype(np.uint16)), \
        "frame sheared across a drop boundary"
    seqs = got[:, 0].astype(np.int64)
    # strictly increasing (uint16 wraps every 65536 frames; unwrap)
    unwrapped = seqs + 65536 * np.cumsum(
        np.concatenate([[0], (np.diff(seqs) < -32768).astype(np.int64)]))
    assert np.all(np.diff(unwrapped) > 0), "reordered or duplicated frames"
    assert pump.bytes_in == len(data)
    assert pump.bytes_dropped == len(data) - got.shape[0] * frame
    pump.stop()
    ring.close()


def test_tx_wire_to_live_rx_loopback():
    """Full live TX -> RX loopback between the transmitter and a live
    receiver: `tx pocsag --wire tcp://...` pushes the u8 rtl_sdr wire into
    a tcp-listen live source, and the POCSAG chain decodes the page."""
    from libsdr_tpu.apps import tx
    from libsdr_tpu.apps.chains import pocsag_front_end, run_bit_chain
    from libsdr_tpu.decode import pocsag_decode_bits
    from libsdr_tpu.io.live import LiveStats, stream_live_iq

    fs = 240_000.0
    block = 48_000
    stats = LiveStats()
    gen = stream_live_iq("tcp-listen://:0", block, stats=stats)
    port = stats.port
    assert port > 0

    t = threading.Thread(target=tx.main, args=(
        ["pocsag", "--wire", f"tcp://127.0.0.1:{port}",
         "--address", "77", "--text", "LOOPBACK", "--fs", str(fs)],))
    t.start()
    iq = np.concatenate(list(gen))
    t.join()
    assert stats.bytes_dropped == 0

    fe = pocsag_front_end(fs, block, fc=0.0)
    msgs = pocsag_decode_bits(run_bit_chain(fe, iq))
    assert msgs and msgs[0].address == 77
    assert msgs[0].as_text().startswith("LOOPBACK")
