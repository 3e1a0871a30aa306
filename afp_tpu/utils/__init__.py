"""Utilities: WAV I/O, structured logging."""
from .wavio import read_wav, write_wav

__all__ = ["read_wav", "write_wav"]
