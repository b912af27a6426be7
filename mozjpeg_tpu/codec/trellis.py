"""Trellis quantization (placeholder — implemented in a later milestone)."""


def trellis_optimize(planes, raw, qtables, geom, cfg):
    return planes
