"""APRS web service (reference: cmd/ APRSApplication + src/http.{hh,cc}).

The HTTP machinery lives in the reusable ``utils/http.py`` library (the
analog of the reference's src/http.hh:87-621 Handler/StaticHandler/
DelegateJSONHandler surface plus a WORKING RFC 6455 websocket upgrade —
the reference shipped the hook + sha1.cc but never wired them); this app
is the decoded-spot store + its endpoint wiring
(cmd/aprsapplication.cc:10-60: static map page, /spots JSON, /update
push, live /ws spot stream).
"""

from __future__ import annotations

import json
import queue
import threading
from typing import List

from libsdr_tpu.decode.aprs import APRSDecoder, APRSMessage
from libsdr_tpu.utils.http import (JSONHandler, StaticHandler,  # noqa: F401
                                   WebSocket, WebSocketHandler,
                                   serve_handlers, ws_accept, ws_frame,
                                   ws_parse_frames, ws_text_frame)

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


def _ws_spot_stream(store: APRSStore):
    """/ws session: push every stored spot, then each new one, while the
    library's poll answers Ping/Close (the upgrade-hook use case the
    reference's http.hh + sha1.cc were shipped for)."""

    def on_open(ws: WebSocket) -> None:
        q = store.subscribe()
        try:
            while True:
                try:
                    while True:
                        ws.send_json(q.get_nowait())
                except queue.Empty:
                    pass
                if ws.poll(0.25) is None:
                    break
        finally:
            store.unsubscribe(q)

    return on_open


def handlers_for(store: APRSStore):
    """The app's endpoint table (reference: cmd/aprsapplication.cc:13-60),
    expressed in the utils/http handler library."""
    return [
        StaticHandler("/", _PAGE, "text/html"),
        JSONHandler("/spots", get=store.spots),
        JSONHandler("/update", post=store.add_spot, post_status=204),
        WebSocketHandler("/ws", _ws_spot_stream(store)),
    ]


def serve(store: APRSStore, port: int = 8080):
    """Start the service on ``port`` (0 = ephemeral); returns the httpd."""
    return serve_handlers(handlers_for(store), port)


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
