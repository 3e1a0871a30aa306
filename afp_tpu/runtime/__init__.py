"""Host runtime: native ring buffers/pacer, block dispatcher, simulated
stream driver, device enumeration."""
from .asrc import AsrcFrontend
from .audio import AudioStream, audio_available
from .devices import format_devices, list_devices
from .dispatcher import BlockDispatcher, FaultInjector, SimulatedStream
from .host import BlockRing, Pacer, native_available
from .serving import RingServer

__all__ = [
    "AudioStream", "audio_available",
    "AsrcFrontend",
    "BlockRing", "Pacer", "native_available",
    "BlockDispatcher", "SimulatedStream", "FaultInjector",
    "RingServer",
    "list_devices", "format_devices",
]
