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
    """Best-of-2 4 MB device->host transfer time in milliseconds.

    A BANDWIDTH-sized probe, not a tiny sync: remote tunnels answer tiny
    syncs in ~1 ms (pipelined), which fooled the first version of this
    probe into classifying the bench tunnel as local and turning the
    device engines on (a 6x pipeline regression). 4 MB over PCIe/ICI is
    ~1-3 ms; over a tens-of-MB/s tunnel it is >100 ms — unfakeable."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    try:
        best = float("inf")
        for i in range(2):
            # a FRESH array each round: jax caches the host copy of a
            # device array after the first conversion, which made a
            # repeat measurement read back in ~0.1 ms on any attachment
            d = jnp.zeros(1 << 20, jnp.int32) + i    # 4 MB
            d.block_until_ready()
            t0 = time.perf_counter()
            np.asarray(d)
            best = min(best, time.perf_counter() - t0)
        return best * 1e3
    except Exception:
        return float("inf")


@functools.lru_cache(maxsize=1)
def is_local_tpu() -> bool:
    """True when a real TPU is attached at PCIe/ICI-class bandwidth."""
    env = os.environ.get("MJ_DEPLOYMENT", "").lower()
    if env == "local":
        return True
    if env == "remote":
        return False
    import jax
    if jax.default_backend() != "tpu":
        return False
    return sync_latency_ms() < 20.0                 # 4 MB in < 20 ms
