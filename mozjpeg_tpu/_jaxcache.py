"""Enable persistent XLA compilation cache (imported by mozjpeg_tpu)."""
import hashlib
import os

import jax


def _machine_tag() -> str:
    """CPU-feature fingerprint: XLA:CPU AOT cache entries are machine-
    feature specific, and loading one compiled on a different host warns
    (and may SIGILL). Scope the cache per feature set."""
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith("flags"):
                    return hashlib.sha1(
                        " ".join(sorted(line.split()))
                        .encode()).hexdigest()[:12]
    except OSError:
        pass
    import platform
    return platform.machine()


def _platform_tag() -> str:
    """Scope the cache per requested platform: XLA:CPU AOT entries
    record compile-time machine features (incl. internal tuning flags
    like +prefer-no-scatter) and loading them from a session that ran
    with a different platform mix spams feature-mismatch warnings."""
    return (os.environ.get("JAX_PLATFORMS")
            or jax.config.jax_platforms or "auto").split(",")[0]


_dir = os.environ.get("MOZJPEG_TPU_JAX_CACHE",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), ".jax_cache",
                          _machine_tag() + "-" + _platform_tag()))
if os.environ.get("MOZJPEG_TPU_JAX_CACHE") == "off":
    # no persistent cache at all (the multichip dryrun: XLA:CPU AOT
    # entries carry axon-influenced tuning flags the loader rejects
    # noisily on every load — and can SIGSEGV — even same-process)
    _dir = None
try:
    if _dir is not None:
        os.makedirs(_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", _dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs",
                          0.5)
except Exception:  # cache is best-effort
    pass


def ensure_backend(probe_timeout=25.0, cache_ttl=300.0):
    """Fall back to CPU when the accelerator plugin is registered but its
    device is unreachable (a dead TPU tunnel makes jax.devices() hang, not
    raise). Probes in a subprocess with a timeout and caches the verdict,
    because backend init in-process is not recoverable once it hangs. The
    codec's integer compute paths are backend-exact, so CPU results are
    identical."""
    import subprocess
    import sys
    import tempfile
    import time

    if jax.config.jax_platforms == "cpu":
        return
    cache = os.path.join(tempfile.gettempdir(), "mozjpeg_tpu_backend_probe")
    verdict = None
    try:
        st = os.stat(cache)
        if time.time() - st.st_mtime < cache_ttl:
            verdict = open(cache).read().strip()
    except OSError:
        pass
    if verdict is None:
        try:
            r = subprocess.run(
                [sys.executable, "-c", "import jax; jax.devices()"],
                timeout=probe_timeout, capture_output=True)
            verdict = "ok" if r.returncode == 0 else "cpu"
        except subprocess.TimeoutExpired:
            verdict = "cpu"
        try:
            with open(cache, "w") as f:
                f.write(verdict)
        except OSError:
            pass
    if verdict != "ok":
        jax.config.update("jax_platforms", "cpu")
