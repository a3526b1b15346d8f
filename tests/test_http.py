"""utils/http library tests — the reusable server surface on its own
(reference: src/http.hh:87-621 Server/Handler/StaticHandler/
DelegateJSONHandler + the protocol-upgrade hook), proving a second
consumer needs no code from apps/aprs_service."""

import base64
import hashlib
import json
import socket
import urllib.error
import urllib.request

from libsdr_tpu.utils.http import (JSONHandler, StaticHandler,
                                   WebSocketHandler, serve_handlers,
                                   ws_accept, ws_parse_frames,
                                   ws_text_frame)


def test_http_library_dispatch_and_json():
    seen = []
    httpd = serve_handlers([
        StaticHandler("/", b"<html>hi</html>"),
        StaticHandler("/data.bin", b"\x00\x01", "application/octet-stream"),
        JSONHandler("/items", get=lambda: ["a", "b"],
                    post=lambda obj: seen.append(obj) or {"n": len(seen)}),
    ], port=0)
    port = httpd.server_address[1]
    try:
        with urllib.request.urlopen(f"http://127.0.0.1:{port}/") as r:
            assert r.read() == b"<html>hi</html>"
            assert r.headers.get_content_type() == "text/html"
        with urllib.request.urlopen(f"http://127.0.0.1:{port}/data.bin") as r:
            assert r.read() == b"\x00\x01"
            assert r.headers.get_content_type() == "application/octet-stream"
        with urllib.request.urlopen(f"http://127.0.0.1:{port}/items") as r:
            assert json.loads(r.read()) == ["a", "b"]
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/items", method="POST",
            data=json.dumps({"x": 1}).encode())
        with urllib.request.urlopen(req) as r:
            assert json.loads(r.read()) == {"n": 1}
        assert seen == [{"x": 1}]
        # unknown path -> 404; malformed JSON -> 400 (never reaches the
        # delegate)
        for path, data, want in (("/nope", None, 404),
                                 ("/items", b"{broken", 400)):
            try:
                urllib.request.urlopen(urllib.request.Request(
                    f"http://127.0.0.1:{port}{path}",
                    method="POST" if data else "GET", data=data))
                assert False, path
            except urllib.error.HTTPError as e:
                assert e.code == want, (path, e.code)
        assert seen == [{"x": 1}]
    finally:
        httpd.shutdown()


def test_http_library_websocket_echo():
    """A non-APRS websocket consumer: server echoes each client text frame
    uppercased, via the library's WebSocket poll/send surface."""

    def on_open(ws):
        # drive entirely off poll(): control frames handled in-library,
        # data frames returned for the app
        while True:
            frames = ws.poll(0.1)
            if frames is None:
                break
            for opcode, payload in frames:
                if opcode == 0x1:
                    ws.send_text(payload.decode().upper())

    httpd = serve_handlers([WebSocketHandler("/echo", on_open)], port=0)
    port = httpd.server_address[1]
    key = base64.b64encode(b"0123456789abcdef").decode()
    s = socket.create_connection(("127.0.0.1", port), timeout=10)
    try:
        s.sendall((f"GET /echo HTTP/1.1\r\nHost: x\r\n"
                   "Upgrade: websocket\r\nConnection: Upgrade\r\n"
                   f"Sec-WebSocket-Key: {key}\r\n\r\n").encode())
        buf = b""
        while b"\r\n\r\n" not in buf:
            buf += s.recv(4096)
        head, _, rest = buf.partition(b"\r\n\r\n")
        assert b"101" in head.splitlines()[0]
        assert ws_accept(key).encode() in head

        mask = b"\x01\x02\x03\x04"
        payload = bytes(b ^ mask[i % 4] for i, b in enumerate(b"ping me"))
        s.sendall(bytes([0x81, 0x80 | len(payload)]) + mask + payload)
        data = rest
        while True:
            frames, data = ws_parse_frames(data)
            if frames:
                break
            data += s.recv(4096)
        assert frames[0] == (0x1, b"PING ME")
    finally:
        s.close()
        httpd.shutdown()


def test_ws_frame_roundtrip_sizes():
    """Frame encoder/parser agree across the 7-bit/16-bit/64-bit length
    encodings (RFC 6455 §5.2)."""
    for n in (0, 1, 125, 126, 65535, 65536):
        frames, rest = ws_parse_frames(ws_text_frame(b"x" * n))
        assert rest == b"" and frames == [(0x1, b"x" * n)]


def test_ws_accept_rfc_example():
    """RFC 6455 §1.3's worked handshake example."""
    assert (ws_accept("dGhlIHNhbXBsZSBub25jZQ==")
            == "s3pPLMBiTxaQ9kYGzzhZRbK+xOo=")
    # and the general formula
    key = "abc"
    want = base64.b64encode(hashlib.sha1(
        (key + "258EAFA5-E914-47DA-95CA-C5AB0DC85B11").encode()).digest())
    assert ws_accept(key).encode() == want
