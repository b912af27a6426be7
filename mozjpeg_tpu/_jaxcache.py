"""Enable persistent XLA compilation cache (imported by mozjpeg_tpu)."""
import os

import jax

_dir = os.environ.get("MOZJPEG_TPU_JAX_CACHE",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), ".jax_cache"))
try:
    os.makedirs(_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", _dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
except Exception:  # cache is best-effort
    pass
