"""Attachment-class probe: is the accelerator locally attached?

The device search/emission engines (codec/scanopt_dev.py, ops/bitpack.py
emission) trade device compute for deleted host<->device transfers. On a
REMOTE attachment (this repo's tunnel: ~25-50 ms per sync, tens of MB/s)
the r4 transport download already deleted the transfer they existed to
delete, so they lose; on a LOCAL attachment (PCIe/ICI: microsecond
syncs, GB/s) the host cores become the scarce resource and the device
engines win. The `deployment` config knob resolves through this probe:

  auto   -> "local" iff the default backend is a real TPU AND a tiny
            device round trip completes in < 2 ms (PCIe-class)
  local  -> force the device engines on
  remote -> force them off

Probed once per process (the answer cannot change under a running
process; a worker restart re-imports anyway).
"""
from __future__ import annotations

import functools
import os
import time


@functools.lru_cache(maxsize=1)
def sync_latency_ms() -> float:
    """Best-of-3 tiny device->host sync latency in milliseconds."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    try:
        d = jnp.zeros(8, jnp.int32) + 1
        d.block_until_ready()
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            np.asarray(d)
            best = min(best, time.perf_counter() - t0)
        return best * 1e3
    except Exception:
        return float("inf")


@functools.lru_cache(maxsize=1)
def is_local_tpu() -> bool:
    """True when a real TPU is attached at PCIe/ICI-class latency."""
    env = os.environ.get("MJ_DEPLOYMENT", "").lower()
    if env == "local":
        return True
    if env == "remote":
        return False
    import jax
    if jax.default_backend() != "tpu":
        return False
    return sync_latency_ms() < 2.0
