"""I/O (reference layer L7: src/wavfile.hh, src/utils.hh Stream*, plus the
live sources src/rtlsource.cc / src/portaudio.cc — here a live *wire*:
io.live)."""

from libsdr_tpu.io.live import (LiveStats, RTLTCPSource, stream_live_iq,
                                stream_live_iq_bf16)
from libsdr_tpu.io.wav import (WavWriter, read_raw_iq, read_wav, read_wav_iq,
                               write_raw, write_wav, write_wav_iq)

__all__ = ["WavWriter", "read_raw_iq", "read_wav", "read_wav_iq",
           "write_raw", "write_wav", "write_wav_iq",
           "LiveStats", "RTLTCPSource", "stream_live_iq",
           "stream_live_iq_bf16"]
