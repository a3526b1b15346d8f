"""Core runtime tests: spec propagation, pipeline compile, streaming driver.
Mirrors the reference's testing idiom — drive nodes with synthetic buffers and
inspect captured output (reference: test/coreutilstest.cc:12-75)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from libsdr_tpu import Pipeline, Processor, StreamSpec
from libsdr_tpu.core import ConfigError, run_pipeline, stream_blocks
from libsdr_tpu.core.block import Lambda
from libsdr_tpu.ops.utils import (Cast, Deinterleave, Interleave, RealPart,
                                  Scale, SignedToUnsigned, ToComplex,
                                  UnsignedToSigned)


def test_spec_propagation():
    spec = StreamSpec(jnp.float32, 48000, 1024)
    p = Pipeline([ToComplex(), RealPart(), Scale(2.0)])
    out = p.bind(spec)
    assert out.dtype == jnp.float32
    assert out.block_size == 1024
    assert float(out.sample_rate) == 48000


def test_dtype_validation_raises():
    spec = StreamSpec(jnp.complex64, 48000, 1024)
    with pytest.raises(ConfigError):
        Pipeline([ToComplex()]).bind(spec)  # complex input to ToComplex


def test_pipeline_step_and_driver(rng):
    spec = StreamSpec(jnp.float32, 8000, 256)
    p = Pipeline([Scale(0.5), Lambda(lambda x: x + 1.0)])
    p.bind(spec)
    x = rng.normal(size=4 * 256).astype(np.float32)
    _, y = run_pipeline(p, stream_blocks(x, 256))
    np.testing.assert_allclose(y, 0.5 * x + 1.0, rtol=1e-6)


def test_chunks_per_dispatch_matches_single(rng):
    """K-blocks-per-dispatch (the unrolled chunked step) is bit-identical
    to one-block-at-a-time streaming, including a trailing partial group
    and a stateful (FIR tail) carry."""
    from libsdr_tpu.ops import FIRFilter

    spec = StreamSpec(jnp.float32, 8000, 256)
    x = rng.normal(size=7 * 256).astype(np.float32)

    def run(k):
        p = Pipeline([FIRFilter(order=17, kind="lowpass", fu=1500.0),
                      Scale(0.5)])
        p.bind(spec)
        _, y = run_pipeline(p, stream_blocks(x, 256), chunks_per_dispatch=k)
        return np.asarray(y)

    y1 = run(1)
    # XLA fuses the scan body slightly differently than the standalone
    # step, so allow 1-ulp float drift (measured max 1.2e-7 absolute).
    np.testing.assert_allclose(y1, run(3), atol=3e-7)  # 2 groups + 1 tail
    np.testing.assert_allclose(y1, run(7), atol=3e-7)  # one dispatch

    # ragged output path (bit-sync PLL) through the same knob
    from libsdr_tpu.ops import ASKDetector, BitStream

    def run_bits(k):
        p = Pipeline([ASKDetector(), BitStream(1000.0, mode="normal")])
        p.bind(StreamSpec(jnp.float32, 8000, 256))
        _, bits = run_pipeline(p, stream_blocks(x, 256),
                               chunks_per_dispatch=k)
        return np.asarray(bits)

    np.testing.assert_array_equal(run_bits(1), run_bits(3))


def test_compile_chunked_modes_agree(rng):
    """Both chunked modes — 'unroll' (tuple-of-blocks, production) and
    'scan' (K-stacked lax.scan, kept for measurement) — match K repeated
    single steps on a stateful carry."""
    from libsdr_tpu.ops import FIRFilter

    spec = StreamSpec(jnp.float32, 8000, 256)
    p = Pipeline([FIRFilter(order=17, kind="lowpass", fu=1500.0)])
    p.bind(spec)
    xs = [rng.normal(size=256).astype(np.float32) for _ in range(3)]

    c = p.init_carry()
    step = p.compile()
    singles = []
    for x in xs:
        c, y = step(c, x)
        singles.append(np.asarray(y))

    _, ys_u = p.compile_chunked("unroll")(p.init_carry(), tuple(xs))
    _, ys_s = p.compile_chunked("scan")(p.init_carry(), jnp.stack(xs))
    for i in range(3):
        np.testing.assert_allclose(singles[i], np.asarray(ys_u[i]),
                                   atol=3e-7)
        np.testing.assert_allclose(singles[i], np.asarray(ys_s[i]),
                                   atol=3e-7)


def test_stream_blocks_pads_final_block():
    x = np.arange(10, dtype=np.float32)
    blocks = list(stream_blocks(x, 4))
    assert len(blocks) == 3
    np.testing.assert_array_equal(blocks[2], [8, 9, 0, 0])


def test_unsigned_signed_roundtrip():
    """Reference idiom test (test/coreutilstest.cc:12-40): cast nodes."""
    spec = StreamSpec(jnp.uint8, 8000, 8)
    p = Pipeline([UnsignedToSigned(), SignedToUnsigned()])
    out = p.bind(spec)
    assert out.dtype == jnp.uint8
    x = jnp.arange(8, dtype=jnp.uint8) * 30
    _, y = p.apply(p.init_carry(), x)
    np.testing.assert_array_equal(np.asarray(y), np.asarray(x))


def test_interleave_deinterleave():
    """Reference: test/coreutilstest.cc Interleave + src/combine.hh:216-227."""
    spec = StreamSpec(jnp.float32, 1000, 16, channels=(3,))
    inter = Interleave(3)
    out = inter.bind(spec)
    assert out.block_size == 48 and float(out.sample_rate) == 3000
    x = np.arange(48, dtype=np.float32).reshape(3, 16)
    _, y = inter.apply((), jnp.asarray(x))
    # out[n*3+k] == in[k, n]
    y = np.asarray(y)
    for k in range(3):
        np.testing.assert_array_equal(y[k::3], x[k])
    de = Deinterleave(3)
    de.bind(out)
    _, z = de.apply((), jnp.asarray(y))
    np.testing.assert_array_equal(np.asarray(z), x)


def test_carry_streaming_equals_oneshot(rng):
    """Block-size invariance: processing in 8 blocks == one big block.
    This is the core overlap-save contract."""
    from libsdr_tpu.ops.fir import FIRFilter
    x = rng.normal(size=2048).astype(np.float32)
    for blocks, bs in [(1, 2048), (8, 256)]:
        spec = StreamSpec(jnp.float32, 48000, bs)
        f = FIRFilter(order=31, kind="lowpass", fu=4000)
        f.bind(spec)
        carry = f.init_carry()
        ys = []
        for i in range(blocks):
            carry, y = f.apply(carry, jnp.asarray(x[i * bs:(i + 1) * bs]))
            ys.append(np.asarray(y))
        if blocks == 1:
            ref = np.concatenate(ys)
        else:
            np.testing.assert_allclose(np.concatenate(ys), ref, atol=1e-5)


def test_channel_batching(rng):
    """Leading channel dims broadcast: (4, B) == 4x independent (B,)."""
    from libsdr_tpu.ops.fir import FIRFilter
    x = rng.normal(size=(4, 512)).astype(np.float32)
    spec_multi = StreamSpec(jnp.float32, 48000, 512, channels=(4,))
    f = FIRFilter(order=21, kind="lowpass", fu=4000)
    f.bind(spec_multi)
    _, y_multi = f.apply(f.init_carry(), jnp.asarray(x))
    spec_one = StreamSpec(jnp.float32, 48000, 512)
    for c in range(4):
        f1 = FIRFilter(order=21, kind="lowpass", fu=4000)
        f1.bind(spec_one)
        _, y1 = f1.apply(f1.init_carry(), jnp.asarray(x[c]))
        np.testing.assert_allclose(np.asarray(y_multi)[c], np.asarray(y1),
                                   atol=1e-6)


def test_tee_combine_join(rng):
    """Fan-out + join: Tee branches recombined on a channel axis
    (reference: src/combine.hh Combine/CombineSink)."""
    from libsdr_tpu.core.graph import Combine, Tee
    spec = StreamSpec(jnp.float32, 8000, 64)
    tee = Tee([Scale(1.0), Scale(-1.0)])
    tee.bind(spec)
    comb = Combine(2)
    comb.bind(tee.branch_specs[0])
    x = rng.normal(size=64).astype(np.float32)
    c, ys = tee.apply(tee.init_carry(), jnp.asarray(x))
    _, stacked = comb.apply((), ys)
    assert comb.out_spec.channels == (2,)
    np.testing.assert_allclose(np.asarray(stacked)[0], x, atol=1e-6)
    np.testing.assert_allclose(np.asarray(stacked)[1], -x, atol=1e-6)


def test_debug_sinks(rng, capsys):
    from libsdr_tpu.ops.debug import BitDump, DebugStore, TextDump
    store = DebugStore()
    store(np.arange(4.0))
    store(np.arange(4.0) + 4)
    np.testing.assert_array_equal(store.concatenated(), np.arange(8.0))
    TextDump()(np.asarray([1.5, 2.5]))
    BitDump()(np.asarray([1, 0, 1]))
    out = capsys.readouterr().out
    assert "1.5 2.5" in out and "1 0 1" in out


def test_checkpoint_resume(tmp_path, rng):
    """Checkpoint/resume: restart from block N continues bit-identically
    (a capability the reference lacks; SURVEY.md section 5)."""
    from libsdr_tpu.core.checkpoint import load_checkpoint, save_checkpoint
    from libsdr_tpu.ops.fir import FIRFilter
    spec = StreamSpec(jnp.float32, 48000, 256)
    x = rng.normal(size=8 * 256).astype(np.float32)

    def make():
        p = Pipeline([FIRFilter(order=31, kind="lowpass", fu=4000)])
        p.bind(spec)
        return p

    # full run
    p = make()
    carry = p.init_carry()
    outs = []
    for i in range(8):
        carry, y = p.apply(carry, jnp.asarray(x[i * 256:(i + 1) * 256]))
        outs.append(np.asarray(y))
        if i == 3:
            save_checkpoint(str(tmp_path / "ck.npz"), carry, i + 1)
    full = np.concatenate(outs)

    # resume from block 4
    p2 = make()
    carry2, pos, _ = load_checkpoint(str(tmp_path / "ck.npz"), p2.init_carry())
    assert pos == 4
    outs2 = []
    for i in range(pos, 8):
        carry2, y = p2.apply(carry2, jnp.asarray(x[i * 256:(i + 1) * 256]))
        outs2.append(np.asarray(y))
    np.testing.assert_array_equal(np.concatenate(outs2), full[4 * 256:])


def test_reblock():
    from libsdr_tpu.core.runtime import reblock
    blocks = [np.arange(5.0), np.arange(5.0, 12.0), np.arange(12.0, 13.0)]
    out = list(reblock(iter(blocks), 4))
    np.testing.assert_array_equal(np.concatenate(out), np.arange(12.0))
    assert all(b.shape[-1] == 4 for b in out)


def test_autocast_and_proxy(rng):
    from libsdr_tpu.core.block import Proxy
    from libsdr_tpu.ops.utils import AutoCast
    spec = StreamSpec(jnp.int16, 8000, 16)
    p = Pipeline([AutoCast(), Proxy()])
    out = p.bind(spec)
    assert out.dtype == jnp.float32
    x = jnp.asarray(rng.integers(-32768, 32767, 16), jnp.int16)
    _, y = p.apply(p.init_carry(), x)
    np.testing.assert_allclose(np.asarray(y),
                               np.asarray(x, np.float32) / 32768.0, atol=1e-6)


def test_fuse_nco_into_fm_demod(rng):
    """The graph fusion pass (core/fuse.py) deletes the NCO in front of a
    quadrature FMDemod / AMDemod; outputs must be exactly-equal in math
    (float-tight here) to the unfused graph."""
    from libsdr_tpu.core import cplx
    from libsdr_tpu.ops import AMDemod, FMDemod, FreqShift, IQBaseBand

    fs, n, bs = 96000, 4096, 2048
    x = (rng.normal(size=n) + 1j * rng.normal(size=n)).astype(np.complex64)

    def run(stages, optimize):
        p = Pipeline(list(stages), optimize=optimize)
        p.bind(StreamSpec(jnp.complex64, fs, bs))
        carry = p.init_carry()
        outs = []
        for i in range(n // bs):
            carry, y = p.apply(carry, cplx.as_block(x[i * bs:(i + 1) * bs]))
            outs.append(cplx.to_numpy(y))
        return p, np.concatenate(outs, axis=-1)

    # FreqShift -> FMDemod: shift dropped, rotation folded
    p1, y_fused = run([FreqShift(1200.0), FMDemod()], True)
    assert len(p1.stages) == 1 and isinstance(p1.stages[0], FMDemod)
    _, y_ref = run([FreqShift(1200.0), FMDemod()], False)
    np.testing.assert_allclose(y_fused, y_ref, atol=1e-4)

    # IQBaseBand -> FMDemod: output-rate NCO skipped
    bb = lambda: IQBaseBand(fc=12000, width=8000, order=16, decim=4,
                            design="textbook")
    p2, y_fused = run([bb(), FMDemod()], True)
    assert p2.stages[0].fold_nco
    _, y_ref = run([bb(), FMDemod()], False)
    np.testing.assert_allclose(y_fused, y_ref, atol=1e-4)

    # FreqShift -> AMDemod: |x| rotation-invariant, shift dropped
    p3, y_fused = run([FreqShift(700.0), AMDemod()], True)
    assert len(p3.stages) == 1 and isinstance(p3.stages[0], AMDemod)
    _, y_ref = run([FreqShift(700.0), AMDemod()], False)
    np.testing.assert_allclose(y_fused, y_ref, atol=1e-4)


def test_streaming_wav_writer(tmp_path):
    """Block-at-a-time WAV writing matches one-shot write (the reference's
    WavSink close-finalized header contract, src/wavfile.hh:81-105)."""
    from libsdr_tpu.io import WavWriter, read_wav, write_wav
    rng = np.random.default_rng(0)
    x = (rng.normal(size=10_000) * 0.1).astype(np.float32)
    p1, p2 = tmp_path / "stream.wav", tmp_path / "oneshot.wav"
    with WavWriter(str(p1), rate=8000) as w:
        for i in range(0, len(x), 1024):
            w.write(x[i:i + 1024])
    write_wav(str(p2), x, 8000)
    a, ra = read_wav(str(p1))
    b, rb = read_wav(str(p2))
    assert ra == rb == 8000
    np.testing.assert_array_equal(a, b)


def test_fuse_state_resets_on_rebind():
    """Fusion decisions must not leak when a stage instance is reused in a
    different pipeline (the rotation would add a false frequency offset)."""
    from libsdr_tpu.core import cplx
    from libsdr_tpu.ops import FMDemod, FreqShift

    rng = np.random.default_rng(5)
    x = (rng.normal(size=512) + 1j * rng.normal(size=512)).astype(np.complex64)
    fm = FMDemod()
    p1 = Pipeline([FreqShift(1200.0), fm])
    p1.bind(StreamSpec(jnp.complex64, 48000, 512))
    assert fm._rot is not None
    # Reuse the same demod WITHOUT a shift: the folded rotation must clear.
    p2 = Pipeline([fm])
    p2.bind(StreamSpec(jnp.complex64, 48000, 512))
    assert fm._rot is None and fm._pending_rot_freqs == []
    _, y = p2.apply(p2.init_carry(), cplx.as_block(x))
    ref = np.angle(np.asarray(x) * np.conj(
        np.concatenate([[1.0 + 0j], np.asarray(x)[:-1]])))
    np.testing.assert_allclose(np.asarray(y), ref.astype(np.float32),
                               atol=1e-4)


def test_profiling_helpers(tmp_path):
    """jax.profiler tracing + the host-side stage timer (SURVEY.md §5)."""
    import os
    from libsdr_tpu.utils.profiling import StageTimer, trace

    t = StageTimer()
    with t.region("work"):
        y = jnp.ones((64, 64)) @ jnp.ones((64, 64))
        jax.block_until_ready(y)
    rep = t.report()
    assert rep["work"]["calls"] == 1 and rep["work"]["total_s"] > 0

    d = tmp_path / "prof"
    with trace(str(d)):
        y = jnp.ones((64, 64)) @ jnp.ones((64, 64))
        jax.block_until_ready(y)
    files = [f for _, _, fs in os.walk(d) for f in fs]
    assert files, "profiler produced no trace files"


def test_pipeline_switch_stages_preserves_front_end(rng):
    """Live demod switching (the reference's runtime graph surgery,
    examples/sdr_rec.cc + node.cc:87-114): switching [IQBaseBand -> FMDemod
    -> FMDeemph] to [IQBaseBand -> AMDemod] mid-stream transplants the
    front-end FIR state, so post-switch output equals a continuous AM
    pipeline that processed the whole stream."""
    import jax.numpy as jnp
    from libsdr_tpu import Pipeline, StreamSpec
    from libsdr_tpu.core import cplx
    from libsdr_tpu.ops import AMDemod, FMDemod, FMDeemph, IQBaseBand

    fs, block, n_blocks = 96000.0, 9600, 4

    def bb():
        return IQBaseBand(fc=12000, width=9000, order=48, decim=4,
                          design="textbook")

    x = (rng.normal(size=(n_blocks, block))
         + 1j * rng.normal(size=(n_blocks, block))).astype(np.complex64)

    # switched pipeline: FM for blocks 0-1, then live switch to AM
    p = Pipeline([bb(), FMDemod(), FMDeemph()])
    p.bind(StreamSpec(np.complex64, fs, block))
    c = p.init_carry()
    for b in range(2):
        c, _ = p.apply(c, cplx.as_block(x[b]))
    c = p.switch_stages([bb(), AMDemod()], c)
    outs_sw = []
    for b in range(2, n_blocks):
        c, y = p.apply(c, cplx.as_block(x[b]))
        outs_sw.append(np.asarray(y))

    # continuous AM pipeline over the whole stream
    q = Pipeline([bb(), AMDemod()])
    q.bind(StreamSpec(np.complex64, fs, block))
    cq = q.init_carry()
    outs_am = []
    for b in range(n_blocks):
        cq, y = q.apply(cq, cplx.as_block(x[b]))
        outs_am.append(np.asarray(y))

    np.testing.assert_allclose(np.concatenate(outs_sw),
                               np.concatenate(outs_am[2:]), rtol=1e-5,
                               atol=1e-6)
    # and the new structure compiles/streams on
    step = p.compile()
    c, y = step(c, cplx.as_block(x[0]))
    assert np.asarray(y).shape[-1] == block // 4
