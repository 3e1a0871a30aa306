"""L5 control plane: headless equalizer controller (GUI-optional)."""
from .controller import DEFAULT_CONFIG, EqualizerController

__all__ = ["EqualizerController", "DEFAULT_CONFIG"]
