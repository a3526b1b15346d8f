"""Native runtime tests: converters, SPSC ring buffer, file pump ingest
(reference idiom: test/buffertest.cc RawRingBuffer put/take/wraparound)."""

import numpy as np
import pytest

from libsdr_tpu import native
from libsdr_tpu.io.ingest import stream_raw_iq


def test_native_builds():
    assert native.available(), "g++ toolchain present in image; build failed"


def test_u8_converter_matches_numpy(rng):
    src = rng.integers(0, 256, 2048).astype(np.uint8)
    re, im = native.u8_iq_to_planar(src)
    want = (src.astype(np.float32) - 128.0) / 128.0
    np.testing.assert_allclose(re, want[0::2], atol=1e-7)
    np.testing.assert_allclose(im, want[1::2], atol=1e-7)


def test_s16_converter_matches_numpy(rng):
    src = rng.integers(-32768, 32768, 2048).astype(np.int16)
    re, im = native.s16_iq_to_planar(src)
    want = src.astype(np.float32) / 32768.0
    np.testing.assert_allclose(re, want[0::2], atol=1e-7)
    np.testing.assert_allclose(im, want[1::2], atol=1e-7)


def test_ring_buffer_put_take_wraparound(rng):
    """Mirrors the reference's RawRingBuffer test (test/buffertest.cc)."""
    ring = native.RingBuffer(256)
    data = rng.integers(0, 256, 100).astype(np.uint8)
    assert ring.put(data) == 100
    assert ring.available == 100
    out = ring.take(100)
    np.testing.assert_array_equal(out, data)
    # wraparound: fill repeatedly past the capacity boundary
    for _ in range(10):
        d = rng.integers(0, 256, 200).astype(np.uint8)
        assert ring.put(d) == 200
        np.testing.assert_array_equal(ring.take(200), d)
    # over-capacity put is rejected
    big = np.zeros(300, np.uint8)
    assert ring.put(big) == 0
    # under-filled take is rejected
    assert ring.take(10) is None
    ring.close()


def test_file_pump_ingest(tmp_path, rng):
    """End-to-end native ingest: raw u8 IQ file -> pump thread -> ring ->
    framed complex blocks."""
    n_pairs = 100_000
    raw = rng.integers(0, 256, 2 * n_pairs).astype(np.uint8)
    path = tmp_path / "capture.bin"
    raw.tofile(path)

    block = 16_384
    blocks = list(stream_raw_iq(str(path), block))
    total = np.concatenate(blocks)
    want_f = (raw.astype(np.float32) - 128.0) / 128.0
    want = want_f[0::2] + 1j * want_f[1::2]
    assert len(total) >= n_pairs
    np.testing.assert_allclose(total[:n_pairs].real, want.real, atol=1e-7)
    np.testing.assert_allclose(total[:n_pairs].imag, want.imag, atol=1e-7)
    # padding after EOF is zero
    assert np.all(total[n_pairs:] == 0)


def test_native_pocsag_decoder_matches_python():
    """The C++ batch POCSAG FSM produces identical messages to the Python
    decoder, including BCH-repaired errors and multi-batch payloads."""
    import numpy as np
    import pytest
    from libsdr_tpu import native
    from libsdr_tpu.decode import (POCSAGDecoder, pocsag_decode_bits,
                                   pocsag_encode_batch)

    if native.get_lib() is None:
        pytest.skip("native library unavailable")
    rng = np.random.default_rng(7)
    bits = np.concatenate([
        pocsag_encode_batch(address=4242, function=1,
                            text="NATIVE PARITY CHECK 0123456789 " * 3),
        pocsag_encode_batch(address=7, function=3, text="second page"),
    ])
    # inject a repairable 2-bit error into one codeword region
    corrupt = bits.copy()
    corrupt[700] ^= 1
    corrupt[705] ^= 1
    for stream in (bits, corrupt):
        py = POCSAGDecoder().process(stream)
        nat = pocsag_decode_bits(stream)
        assert len(py) == len(nat) and len(py) >= 2
        for a, b in zip(py, nat):
            assert (a.address, a.function, a.bits, a.payload) == \
                   (b.address, b.function, b.bits, b.payload)
            assert a.best_decode() == b.best_decode()


def test_native_ax25_deframer_matches_python():
    """The C++ HDLC deframer produces identical frames to the Python
    decoder, including bit-stuffing, aborts, and CRC rejection."""
    import numpy as np
    import pytest
    from libsdr_tpu import native
    from libsdr_tpu.decode import (AX25Decoder, ax25_decode_bits,
                                   ax25_frame_bits)

    if native.get_lib() is None:
        pytest.skip("native library unavailable")
    rng = np.random.default_rng(3)
    stream = np.concatenate([
        (rng.random(200) > 0.5).astype(np.uint8),      # noise before lock
        ax25_frame_bits("N0CALL", "APRS", b"!4903.50N/07201.75W-x", n_flags=8),
        np.ones(9, np.uint8),                          # abort (7+ ones)
        ax25_frame_bits("K1ABC", "WIDE2", b"\x7e\x7d stuffing \xff" * 5,
                        via=["WIDE1"], n_flags=6),
        (rng.random(64) > 0.5).astype(np.uint8),
    ])
    # corrupt a copy mid-frame: CRC must reject identically in both
    bad = stream.copy()
    bad[260] ^= 1
    for bits in (stream, bad):
        py = AX25Decoder()
        py.process(bits)
        nat = ax25_decode_bits(bits)
        assert len(py.messages) == len(nat)
        for a, b in zip(py.messages, nat):
            assert (str(a.frm), str(a.to), a.payload,
                    [str(v) for v in a.via]) == \
                   (str(b.frm), str(b.to), b.payload,
                    [str(v) for v in b.via])
    assert len(AX25Decoder().process(stream)) == 2


def test_u8_to_bf16_converter_lossless(tmp_path):
    """Native u8 -> bf16-plane converter: bit-lossless for every u8 value
    (bf16 holds (v-128)/128 exactly), and the streaming bf16 ingest path
    yields planar blocks matching the f32 path."""
    import jax.numpy as jnp
    from libsdr_tpu.native import u8_iq_to_planar, u8_iq_to_planar_bf16

    src = np.arange(512, dtype=np.uint8)  # every value, interleaved IQ
    re32, im32 = u8_iq_to_planar(src)
    re16, im16 = u8_iq_to_planar_bf16(src)
    np.testing.assert_array_equal(
        np.asarray(re16).view(jnp.bfloat16).astype(np.float32), re32)
    np.testing.assert_array_equal(
        np.asarray(im16).view(jnp.bfloat16).astype(np.float32), im32)

    # streaming ingest parity
    from libsdr_tpu.io.ingest import stream_raw_iq, stream_raw_iq_bf16
    rng = np.random.default_rng(3)
    cap = tmp_path / "cap.bin"
    data = rng.integers(0, 256, size=2 * 3000, dtype=np.uint8)
    data.tofile(cap)
    blocks32 = list(stream_raw_iq(str(cap), 1024))
    blocks16 = list(stream_raw_iq_bf16(str(cap), 1024))
    assert len(blocks32) == len(blocks16)
    for b32, b16 in zip(blocks32, blocks16):
        np.testing.assert_array_equal(
            np.asarray(b16.re).astype(np.float32), b32.real)
        np.testing.assert_array_equal(
            np.asarray(b16.im).astype(np.float32), b32.imag)


def test_u8_wire_to_planes_device_matches_host_lut(tmp_path):
    """ON-DEVICE wire conversion (io/ingest.u8_wire_to_planes) is
    bit-identical to the native host LUT (u8_iq_to_planar_bf16) for every
    u8 value — the wire-upload pump path (VERDICT r4 item 3) decodes the
    exact same planes as the host-converted path."""
    import jax.numpy as jnp

    from libsdr_tpu.io.ingest import stream_raw_iq_u8, u8_wire_to_planes
    from libsdr_tpu.native import u8_iq_to_planar_bf16

    src = np.arange(512, dtype=np.uint8)  # every value, interleaved IQ
    re_h, im_h = u8_iq_to_planar_bf16(src)
    dev = u8_wire_to_planes(jnp.asarray(src), jnp.bfloat16)
    np.testing.assert_array_equal(
        np.asarray(dev.re).view(np.uint16),
        np.asarray(re_h).view(np.uint16))
    np.testing.assert_array_equal(
        np.asarray(dev.im).view(np.uint16),
        np.asarray(im_h).view(np.uint16))

    # raw-wire streaming: yields the exact bytes, padded with 128 (wire
    # zero) on the final partial block
    rng = np.random.default_rng(5)
    cap = tmp_path / "cap.u8"
    data = rng.integers(0, 256, size=2 * 2500, dtype=np.uint8)
    data.tofile(cap)
    blocks = list(stream_raw_iq_u8(str(cap), 1024))
    assert [len(b) for b in blocks] == [2048, 2048, 2048]
    got = np.concatenate(blocks)
    np.testing.assert_array_equal(got[:len(data)], data)
    np.testing.assert_array_equal(got[len(data):],
                                  np.full(2 * 3 * 1024 - len(data), 128))
