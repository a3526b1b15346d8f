"""File I/O (reference layer L7: src/wavfile.hh, src/utils.hh Stream*)."""

from libsdr_tpu.io.wav import read_wav, write_wav, read_wav_iq, write_wav_iq

__all__ = ["read_wav", "write_wav", "read_wav_iq", "write_wav_iq"]
