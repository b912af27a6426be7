"""mozjpeg_tpu — a TPU-native JPEG engine with mozjpeg's capability set."""
from . import _jaxcache  # noqa: F401  (enable persistent XLA cache)

from .codec.config import EncoderConfig, Profile, DCTMethod  # noqa: F401
from .codec.encoder import encode  # noqa: F401
from .codec.decoder import decode  # noqa: F401

__version__ = "0.1.0"
