"""APRS web service (reference: cmd/ APRSApplication + src/http.{hh,cc}).

The reference ships a tiny threaded HTTP/1.1 server with JSON handlers
(reference: src/http.cc:141-210) used by its APRS map app
(cmd/aprsapplication.cc:10-60: static page, /spots JSON, /update push).
Python's stdlib ThreadingHTTPServer provides the same thread-per-connection
model, so the service here is the decoded-spot store + JSON endpoints.

The reference's server also carries a protocol-upgrade hook plus a SHA-1
implementation intended for websocket push (src/http.hh:87-621 +
src/sha1.cc — never wired up to a handler there); here the upgrade is
actually implemented: ``GET /ws`` performs the RFC 6455 handshake
(Sec-WebSocket-Accept = base64(sha1(key + GUID))) and the connection then
receives every stored spot followed by each newly decoded/pushed spot as
a JSON text frame.
"""

from __future__ import annotations

import base64
import hashlib
import json
import queue
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import List

from libsdr_tpu.decode.aprs import APRSDecoder, APRSMessage

# RFC 6455 §1.3 handshake GUID (the constant the reference's sha1.cc was
# shipped for).
_WS_GUID = "258EAFA5-E914-47DA-95CA-C5AB0DC85B11"


def ws_accept(key: str) -> str:
    """Sec-WebSocket-Accept for a client key (RFC 6455 §4.2.2)."""
    digest = hashlib.sha1((key + _WS_GUID).encode("ascii")).digest()
    return base64.b64encode(digest).decode("ascii")


def ws_frame(opcode: int, payload: bytes) -> bytes:
    """One unmasked server->client frame (RFC 6455 §5.2)."""
    n = len(payload)
    if n < 126:
        head = bytes([0x80 | opcode, n])
    elif n < 1 << 16:
        head = bytes([0x80 | opcode, 126]) + n.to_bytes(2, "big")
    else:
        head = bytes([0x80 | opcode, 127]) + n.to_bytes(8, "big")
    return head + payload


def ws_text_frame(payload: bytes) -> bytes:
    """One unmasked server->client text frame (RFC 6455 §5.2)."""
    return ws_frame(0x1, payload)


def ws_parse_frames(buf: bytes):
    """Parse complete (possibly masked) frames from ``buf``; returns
    ([(opcode, payload), ...], unconsumed_rest) (RFC 6455 §5.2-5.3)."""
    frames = []
    while len(buf) >= 2:
        opcode = buf[0] & 0x0F
        masked = bool(buf[1] & 0x80)
        n = buf[1] & 0x7F
        off = 2
        if n == 126:
            if len(buf) < 4:
                break
            n = int.from_bytes(buf[2:4], "big")
            off = 4
        elif n == 127:
            if len(buf) < 10:
                break
            n = int.from_bytes(buf[2:10], "big")
            off = 10
        need = off + (4 if masked else 0) + n
        if len(buf) < need:
            break
        if masked:
            mask = buf[off:off + 4]
            raw = buf[off + 4:need]
            payload = bytes(b ^ mask[i % 4] for i, b in enumerate(raw))
        else:
            payload = buf[off:need]
        frames.append((opcode, payload))
        buf = buf[need:]
    return frames, buf


def _load_page() -> bytes:
    """The static map page served at '/' (parity with the reference's baked
    page: cmd/aprsapplication.cc:13-16 + cmake/LinkResources.cmake; here a
    self-contained SVG map with /spots polling, no external dependencies)."""
    import os
    path = os.path.join(os.path.dirname(__file__), "aprs_map.html")
    with open(path, "rb") as f:
        return f.read()


_PAGE = _load_page()


class APRSStore:
    """Thread-safe store of decoded spots
    (reference: cmd/aprsapplication.cc:24-40)."""

    def __init__(self) -> None:
        self._lock = threading.Lock()
        self._spots: List[dict] = []
        self._subs: List[queue.Queue] = []

    def subscribe(self) -> "queue.Queue[dict]":
        """Register a live-push subscriber: the queue is pre-loaded with
        every stored spot and then receives each new one.  Bounded — a
        stalled client drops its OLDEST pending spots rather than growing
        the server's memory without limit."""
        q: queue.Queue = queue.Queue(maxsize=4096)
        with self._lock:
            for s in self._spots[-4096:]:
                q.put(s)
            self._subs.append(q)
        return q

    def unsubscribe(self, q: queue.Queue) -> None:
        with self._lock:
            if q in self._subs:
                self._subs.remove(q)

    def _append(self, spot: dict) -> None:
        with self._lock:
            self._spots.append(spot)
            for q in self._subs:
                try:
                    q.put_nowait(spot)
                except queue.Full:      # slow consumer: drop its oldest
                    try:
                        q.get_nowait()
                    except queue.Empty:
                        pass
                    try:
                        q.put_nowait(spot)
                    except queue.Full:
                        pass

    def add(self, msg: APRSMessage) -> None:
        spot = {
            "from": str(msg.ax25.frm),
            "to": str(msg.ax25.to),
            "via": [str(v) for v in msg.ax25.via],
            "comment": msg.comment,
        }
        if msg.has_location:
            spot.update(latitude=msg.latitude, longitude=msg.longitude,
                        symbol=msg.symbol)
        if msg.has_time and msg.time is not None:
            spot["time"] = msg.time.isoformat()
        self._append(spot)

    def add_spot(self, spot: dict) -> None:
        """Append an externally-pushed spot (the REST /update path)."""
        self._append(spot)

    def spots(self) -> List[dict]:
        with self._lock:
            return list(self._spots)


def make_handler(store: APRSStore):
    class Handler(BaseHTTPRequestHandler):
        protocol_version = "HTTP/1.1"

        def do_GET(self):  # noqa: N802
            if self.path == "/ws":
                self._serve_websocket()
                return
            if self.path == "/spots":
                body = json.dumps(store.spots()).encode()
                ctype = "application/json"
            elif self.path == "/":
                body, ctype = _PAGE, "text/html"
            else:
                self.send_error(404)
                return
            self.send_response(200)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_POST(self):  # noqa: N802
            # /update: push a spot from an external source (the reference's
            # DelegateJSONHandler REST push, cmd/aprsapplication.cc:43-60).
            if self.path != "/update":
                self.send_error(404)
                return
            try:
                n = int(self.headers.get("Content-Length", "0"))
            except ValueError:
                self.send_error(400)
                return
            if not (0 < n <= 1 << 20):  # bound attacker-controlled reads
                self.send_error(413 if n > 1 << 20 else 400)
                return
            try:
                spot = json.loads(self.rfile.read(n))
            except Exception:
                self.send_error(400)
                return
            if not isinstance(spot, dict):
                self.send_error(400)
                return
            store.add_spot(spot)
            self.send_response(204)
            self.end_headers()

        def _serve_websocket(self):
            # RFC 6455 server handshake + spot push (the upgrade path the
            # reference's http.hh protocol hook + sha1.cc were built for).
            key = self.headers.get("Sec-WebSocket-Key")
            upgrade = (self.headers.get("Upgrade") or "").lower()
            if upgrade != "websocket" or not key:
                self.send_error(400, "websocket upgrade required")
                return
            self.send_response(101, "Switching Protocols")
            self.send_header("Upgrade", "websocket")
            self.send_header("Connection", "Upgrade")
            self.send_header("Sec-WebSocket-Accept", ws_accept(key))
            self.end_headers()
            self.close_connection = True
            q = store.subscribe()
            # Full-duplex loop: push queued spots, AND read the socket so
            # client control frames are honored — Ping gets a Pong and
            # Close gets the closing-handshake reply (RFC 6455 §5.5.1-2);
            # a write-only handler would leave a browser's close() hanging
            # in CLOSING until its timeout.  Reads poll via select() so
            # SENDS stay blocking — a socket-wide timeout would also abort
            # any write that stalls > the poll interval, defeating the
            # slow-consumer handling.
            import select

            # A client may pipeline frames in the same TCP segment as the
            # upgrade request; those bytes sit in rfile's read-ahead
            # buffer, invisible to select()/recv().  Drain them first
            # (non-blocking: read1 returns buffered bytes, and raises
            # BlockingIOError only when the buffer is empty).
            inbuf = b""
            try:
                self.connection.setblocking(False)
                try:
                    inbuf = self.rfile.read1(65536) or b""
                except (BlockingIOError, ValueError):
                    pass
            finally:
                self.connection.setblocking(True)
            try:
                while True:
                    try:
                        while True:
                            spot = q.get_nowait()
                            self.wfile.write(
                                ws_text_frame(json.dumps(spot).encode()))
                    except queue.Empty:
                        pass
                    self.wfile.flush()
                    r, _, _ = select.select([self.connection], [], [], 0.25)
                    if r:
                        data = self.connection.recv(4096)
                        if not data:
                            break              # client hung up
                        inbuf += data
                    elif not inbuf:
                        continue
                    frames, inbuf = ws_parse_frames(inbuf)
                    # Only <=125-byte control frames are expected from the
                    # client; a giant claimed frame length (or endless
                    # unparseable bytes) must not grow inbuf unboundedly.
                    if len(inbuf) > 1 << 16:
                        break
                    done = False
                    for opcode, payload in frames:
                        if opcode == 0x8:      # Close: echo + finish
                            self.wfile.write(ws_frame(0x8, payload[:125]))
                            self.wfile.flush()
                            done = True
                            break
                        if opcode == 0x9:      # Ping -> Pong, same payload
                            # clamp: control frames must be <=125 bytes
                            # (RFC 6455 §5.5), even echoing an oversized ping
                            self.wfile.write(ws_frame(0xA, payload[:125]))
                            self.wfile.flush()
                    if done:
                        break
            except (BrokenPipeError, ConnectionResetError, OSError):
                pass           # client went away; thread is a daemon
            finally:
                store.unsubscribe(q)

        def log_message(self, *a):  # quiet
            pass

    return Handler


def serve(store: APRSStore, port: int = 8080) -> ThreadingHTTPServer:
    httpd = ThreadingHTTPServer(("0.0.0.0", port), make_handler(store))
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    return httpd


def _serve_live(args):
    """Live serving loop: s16 AFSK audio wire -> incremental bit front end
    -> streaming APRS decode -> websocket push as spots arrive (the
    always-on deployment of the reference's cmd/ app; live source analog:
    src/portaudio.cc PortSource driver thread)."""
    import numpy as np

    from libsdr_tpu.apps.chains import afsk_front_end
    from libsdr_tpu.core import cplx
    from libsdr_tpu.core.ragged import Ragged, compact
    from libsdr_tpu.io.live import LiveStats, stream_live_audio

    store = APRSStore()
    httpd = serve(store, args.port)
    print(f"live APRS on :{args.port} (GET /spots, ws /ws) "
          f"from {args.live}")
    fe = afsk_front_end(args.rate, args.block_size)
    step = fe.compile()
    carry = fe.init_carry()
    dec = APRSDecoder()
    stats = LiveStats()
    n_pushed = 0
    try:
        for blk in stream_live_audio(args.live, args.block_size,
                                     stats=stats,
                                     timeout=args.live_timeout):
            carry, y = step(carry, cplx.as_block(blk))
            bits = compact(Ragged(np.asarray(y.data), np.asarray(y.valid)))
            dec.process(bits)
            while n_pushed < len(dec.aprs_messages):
                store.add(dec.aprs_messages[n_pushed])  # wakes /ws queues
                n_pushed += 1
    except KeyboardInterrupt:
        pass
    finally:
        httpd.shutdown()
    print(f"live done: {n_pushed} spots, {stats.bytes_in} bytes in, "
          f"{stats.bytes_dropped} dropped "
          f"({100 * stats.drop_fraction:.2f}%)")
    return store


def main(argv=None):
    import numpy as np

    from libsdr_tpu.apps.chains import afsk_front_end, run_bit_chain
    from libsdr_tpu.utils.options import (add_source_args, common_parser,
                                          load_source)

    p = common_parser("APRS web service (reference: cmd/)")
    add_source_args(p)
    p.add_argument("--port", type=int, default=8080)
    p.add_argument("--oneshot", action="store_true",
                   help="decode the file, print spots JSON, exit")
    p.add_argument("--live",
                   help="live s16 AFSK audio wire instead of a file "
                        "(tcp://h:p, tcp-listen://:p, udp://:p, "
                        "fifo:///path) — requires --rate; spots stream to "
                        "/ws websocket clients as they decode")
    p.add_argument("--live-timeout", type=float, default=None,
                   help="stop after this many seconds with no wire data")
    args = p.parse_args(argv)

    if args.live:
        if not args.rate:
            raise SystemExit("--live requires --rate")
        return _serve_live(args)

    audio, fs = load_source(args)
    if np.iscomplexobj(audio):
        raise SystemExit("aprs_service expects demodulated AFSK audio")
    store = APRSStore()
    fe = afsk_front_end(fs, args.block_size)
    bits = run_bit_chain(fe, audio.astype(np.float32))
    dec = APRSDecoder()
    dec.process(bits)
    for m in dec.aprs_messages:
        store.add(m)
    if args.oneshot:
        print(json.dumps(store.spots(), indent=2))
        return store
    httpd = serve(store, args.port)
    print(f"serving {len(store.spots())} spots on :{args.port} "
          "(GET /spots); Ctrl-C to stop")
    try:
        threading.Event().wait()
    except KeyboardInterrupt:
        httpd.shutdown()
    return store


if __name__ == "__main__":
    main()
