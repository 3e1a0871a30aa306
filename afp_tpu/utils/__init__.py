"""Utilities: WAV I/O, structured logging."""
from .wavio import (read_wav, read_wav_pcm16, write_wav,
                    write_wav_pcm16)

__all__ = ["read_wav", "read_wav_pcm16", "write_wav",
           "write_wav_pcm16"]
