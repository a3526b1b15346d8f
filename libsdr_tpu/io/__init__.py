"""File I/O (reference layer L7: src/wavfile.hh, src/utils.hh Stream*)."""

from libsdr_tpu.io.wav import (WavWriter, read_raw_iq, read_wav, read_wav_iq,
                               write_raw, write_wav, write_wav_iq)

__all__ = ["WavWriter", "read_raw_iq", "read_wav", "read_wav_iq",
           "write_raw", "write_wav", "write_wav_iq"]
