"""Host<->device transfer helpers.

The axon TPU tunnel has pathological device-to-host paths for some 2D
layouts (observed: (1024,1536) int16 took 160 s vs 85 ms flattened).
Always round-trip through a flat 1D copy.
"""
import jax.numpy as jnp
import numpy as np


def to_host(x) -> np.ndarray:
    shape = x.shape
    return np.asarray(jnp.reshape(x, (-1,))).reshape(shape)
