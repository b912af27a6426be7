"""mozjpeg_tpu — a TPU-native JPEG engine with mozjpeg's capability set."""
import os as _os

# Some platform plugins (axon) register their backend regardless of the
# JAX_PLATFORMS environment variable; applying it through the config API
# before first backend use makes `JAX_PLATFORMS=cpu python ...` behave as
# documented.
if _os.environ.get("JAX_PLATFORMS"):
    import jax as _jax
    try:
        # only re-assert the env value if the config still carries it as
        # its default — a script that already called
        # jax.config.update("jax_platforms", ...) wins.  Plugins may
        # prepend themselves to the default (e.g. "axon,cpu" for
        # JAX_PLATFORMS=cpu), so compare as an ordered subset.
        _env = _os.environ["JAX_PLATFORMS"]
        _cur = (_jax.config.jax_platforms or "").split(",")
        if set(_env.split(",")) <= set(_cur):
            _jax.config.update("jax_platforms", _env)
    except Exception:
        pass

from . import _jaxcache  # noqa: F401  (enable persistent XLA cache)

__version__ = "0.1.0"

__all__ = ["EncoderConfig", "Profile", "DCTMethod", "encode", "decode",
           "encode_many", "decode_many"]


def __getattr__(name):
    # lazy exports (PEP 562): keep `import mozjpeg_tpu` free of device
    # backend initialization so host-only tools (wrjpgcom, rdjpgcom)
    # don't touch the TPU runtime
    if name in ("EncoderConfig", "Profile", "DCTMethod"):
        from .codec import config
        return getattr(config, name)
    if name in ("encode", "encode_many"):
        from .codec import encoder
        return getattr(encoder, name)
    if name == "decode_many":
        from .codec import decoder
        return decoder.decode_many
    if name == "decode":
        from .codec.decoder import decode
        return decode
    raise AttributeError(name)
