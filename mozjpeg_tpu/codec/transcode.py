"""Lossless transcoding: read/write coefficient arrays + DCT-domain
transforms (the jpegtran feature set).

Parity reference: /root/reference/jdtrans.c (jpeg_read_coefficients),
/root/reference/jctrans.c (jpeg_write_coefficients), /root/reference/transupp.c
(do_flip_h/do_flip_v/do_rot_90/180/270/do_transpose/do_transverse/do_crop).
The reference walks block arrays with nested loops; here each transform is a
handful of whole-plane array ops (reverse, transpose, sign flips).

All transforms operate on zigzag-order coefficient planes (bh, bw, 64) and
are exact (pure permutations + sign flips of coefficients).
"""
from __future__ import annotations

import dataclasses
from typing import List, Optional, Tuple

import numpy as np

from .. import consts
from . import marker
from .config import EncoderConfig, Profile

# natural-order index grids for sign flips
_NAT_ROW = np.arange(64) // 8
_NAT_COL = np.arange(64) % 8
# zigzag <-> natural converters for (…, 64) zigzag planes
_ZZ = consts.JPEG_ZIGZAG
_ZZ_INV = np.argsort(_ZZ)
# transpose permutation in zigzag space: natural (r,c) -> (c,r)
_TRANSPOSE_NAT = (_NAT_COL * 8 + _NAT_ROW)
_TRANSPOSE_ZZ = _ZZ_INV[_TRANSPOSE_NAT[_ZZ]]
# sign masks in zigzag space
_SIGN_ODD_COL = np.where(_NAT_COL[_ZZ] % 2 == 1, -1, 1).astype(np.int16)
_SIGN_ODD_ROW = np.where(_NAT_ROW[_ZZ] % 2 == 1, -1, 1).astype(np.int16)


@dataclasses.dataclass
class CoefImage:
    """A decoded JPEG held as coefficient planes (lossless workspace)."""
    jp: marker.ParsedJpeg
    planes: List[np.ndarray]          # per comp (bh_pad, bw_pad, 64) zigzag

    @property
    def width(self):
        return self.jp.width

    @property
    def height(self):
        return self.jp.height


def read_coefficients(data: bytes) -> CoefImage:
    from .decoder import decode_coefficients
    jp = marker.parse(data)
    if jp.arithmetic:
        from . import arith
        planes = arith.decode_coefficients_arith(jp, data)
    else:
        planes = decode_coefficients(jp, data)
    return CoefImage(jp, planes)


def _comp_geom(jp, ci):
    c = jp.components[ci]
    max_h, max_v = jp.max_h, jp.max_v
    cw = -(-jp.width * c.h // max_h)
    ch = -(-jp.height * c.v // max_v)
    return c, -(-cw // 8), -(-ch // 8)


def flip_h(ci_img: CoefImage) -> CoefImage:
    """Horizontal flip with jpegtran -trim semantics (transupp.c do_flip_h):
    the width is trimmed to a full-iMCU multiple, then block columns reverse
    and odd natural columns flip sign."""
    import copy
    jp = copy.deepcopy(ci_img.jp)
    imcu_w = 8 * jp.max_h
    new_w = jp.width - jp.width % imcu_w if jp.width % imcu_w else jp.width
    jp.width = new_w
    out = []
    for ci, c in enumerate(jp.components):
        bw_keep = new_w * c.h // jp.max_h // 8
        p = ci_img.planes[ci][:, :bw_keep]
        q = p[:, ::-1] * _SIGN_ODD_COL[None, None, :]
        out.append(np.ascontiguousarray(q))
    return CoefImage(jp, out)


def flip_v(ci_img: CoefImage) -> CoefImage:
    """Vertical flip with -trim semantics."""
    import copy
    jp = copy.deepcopy(ci_img.jp)
    imcu_h = 8 * jp.max_v
    new_h = jp.height - jp.height % imcu_h if jp.height % imcu_h else jp.height
    jp.height = new_h
    out = []
    for ci, c in enumerate(jp.components):
        bh_keep = new_h * c.v // jp.max_v // 8
        p = ci_img.planes[ci][:bh_keep]
        q = p[::-1] * _SIGN_ODD_ROW[None, None, :]
        out.append(np.ascontiguousarray(q))
    return CoefImage(jp, out)


def _transpose_planes(ci_img: CoefImage) -> Tuple[marker.ParsedJpeg,
                                                  List[np.ndarray]]:
    import copy
    jp = copy.deepcopy(ci_img.jp)
    jp.width, jp.height = ci_img.jp.height, ci_img.jp.width
    # quantization tables transpose with the basis
    # (transupp.c transpose_critical_parameters)
    jp.qtables = {k: np.ascontiguousarray(v.T) for k, v in jp.qtables.items()}
    jp.scan_qtables = [{k: np.ascontiguousarray(v.T) for k, v in d.items()}
                       for d in jp.scan_qtables]
    out = []
    for ci, c in enumerate(jp.components):
        c.h, c.v = c.v, c.h
        p = ci_img.planes[ci]
        q = np.transpose(p, (1, 0, 2))[:, :, _TRANSPOSE_ZZ]
        out.append(np.ascontiguousarray(q))
    return jp, out


def transpose(ci_img: CoefImage) -> CoefImage:
    jp, planes = _transpose_planes(ci_img)
    return CoefImage(jp, planes)


def rot90(ci_img: CoefImage) -> CoefImage:
    """90 degrees clockwise = transpose + horizontal flip."""
    return flip_h(transpose(ci_img))


def rot270(ci_img: CoefImage) -> CoefImage:
    """270 degrees clockwise = transpose + vertical flip."""
    return flip_v(transpose(ci_img))


def rot180(ci_img: CoefImage) -> CoefImage:
    return flip_v(flip_h(ci_img))


def transverse(ci_img: CoefImage) -> CoefImage:
    """Transpose across the anti-diagonal."""
    return flip_v(flip_h(transpose(ci_img)))


def crop(ci_img: CoefImage, x: int, y: int, w: int, h: int) -> CoefImage:
    """iMCU-aligned crop (x, y snapped down like jpegtran)."""
    import copy
    jp = ci_img.jp
    ax = x - x % (8 * jp.max_h)
    ay = y - y % (8 * jp.max_v)
    w = min(w + (x - ax), jp.width - ax)
    h = min(h + (y - ay), jp.height - ay)
    jp2 = copy.deepcopy(jp)
    jp2.width, jp2.height = w, h
    out = []
    for ci, c in enumerate(jp.components):
        bx = ax * c.h // jp.max_h // 8
        by = ay * c.v // jp.max_v // 8
        cw = -(-w * c.h // jp.max_h)
        ch = -(-h * c.v // jp.max_v)
        bw, bh = -(-cw // 8), -(-ch // 8)
        out.append(np.ascontiguousarray(
            ci_img.planes[ci][by:by + bh, bx:bx + bw]))
    return CoefImage(jp2, out)


def wipe(ci_img: CoefImage, x: int, y: int, w: int, h: int,
         fill: str = "gray") -> CoefImage:
    """Zero (gray) the blocks covering the region (jpegtran -wipe)."""
    jp = ci_img.jp
    out = []
    for ci, c in enumerate(jp.components):
        p = ci_img.planes[ci].copy()
        bx0 = x * c.h // jp.max_h // 8
        by0 = y * c.v // jp.max_v // 8
        bx1 = -(-(x + w) * c.h // jp.max_h // 8)
        by1 = -(-(y + h) * c.v // jp.max_v // 8)
        p[by0:by1, bx0:bx1] = 0
        out.append(p)
    return CoefImage(jp, out)


def drop(dst: CoefImage, src: CoefImage, x: int, y: int) -> CoefImage:
    """Insert src's blocks into dst at (x, y) (jpegtran -drop).

    Requires compatible sampling; quant tables are taken from dst (like
    jpegtran when tables match)."""
    jp = dst.jp
    out = []
    for ci, c in enumerate(jp.components):
        p = dst.planes[ci].copy()
        s = src.planes[ci]
        bx = x * c.h // jp.max_h // 8
        by = y * c.v // jp.max_v // 8
        sh = min(s.shape[0], p.shape[0] - by)
        sw = min(s.shape[1], p.shape[1] - bx)
        p[by:by + sh, bx:bx + sw] = s[:sh, :sw]
        out.append(p)
    return CoefImage(jp, out)


TRANSFORMS = {
    "none": lambda c: c,
    "flip_h": flip_h,
    "flip_v": flip_v,
    "transpose": transpose,
    "transverse": transverse,
    "rot90": rot90,
    "rot180": rot180,
    "rot270": rot270,
}


def copy_marker_list(jp, option: str = "comments"):
    """Select saved COM/APPn markers per jpegtran -copy semantics
    (transupp.c:2346-2392 jcopy_markers_execute); JFIF APP0 and Adobe
    APP14 duplicates are dropped (the writer regenerates its own)."""
    out = []
    for code, payload in jp.markers:
        is_com = code == 0xFE
        is_app = 0xE0 <= code <= 0xEF
        if not (is_com or is_app):
            continue
        is_icc = code == 0xE2 and payload[:12] == b"ICC_PROFILE\x00"
        if option == "none":
            continue
        if option == "comments" and not is_com:
            continue
        if option == "icc" and not is_icc:
            continue
        if option == "all_except_icc" and is_icc:
            continue
        if code == 0xE0 and payload[:5] == b"JFIF\x00":
            continue          # writer emits its own JFIF
        if code == 0xEE and payload[:5] == b"Adobe":
            continue          # writer emits its own Adobe APP14
        out.append((code, payload))
    return out


def write_coefficients(ci_img: CoefImage,
                       config: Optional[EncoderConfig] = None,
                       copy_markers: str = "comments") -> bytes:
    """Entropy-code coefficient planes into a JPEG (jpeg_write_coefficients
    + the jpegtran output stack: optimize_scans over existing coefficients
    is exactly the jpegrescan use case)."""
    from . import pipeline
    from .encoder import _phase_entropy, make_qtables
    if config is None:
        config = EncoderConfig()
    cfg = config.resolved()
    jp = ci_img.jp
    ncomps = len(jp.components)
    samp = [(c.h, c.v) for c in jp.components]
    mcus_x, mcus_y, comps = pipeline.geometry(jp.width, jp.height, samp)
    geom = (mcus_x, mcus_y, comps)

    # re-pad planes to MCU-padded dims with dummy DC fill
    from ..ops import layout as _layout
    import jax.numpy as jnp
    planes = []
    for ci, g in enumerate(comps):
        p = ci_img.planes[ci][:g.bh, :g.bw]
        padded = np.asarray(_layout.add_dummy_blocks_t(
            jnp.asarray(np.ascontiguousarray(
                p.reshape(-1, 64).T.astype(np.int16))),
            g.bw, g.bh, g.bw_pad, g.bh_pad, g.h, g.v))
        planes.append(np.ascontiguousarray(padded.T.reshape(
            g.bh_pad, g.bw_pad, 64)))

    qtables = [jp.qtables.get(0, np.ones((8, 8), np.uint16)),
               jp.qtables.get(1, jp.qtables.get(0,
                                                np.ones((8, 8), np.uint16)))]
    restart = cfg.restart_interval
    from .decoder import _jpeg_colorspace
    extra = copy_marker_list(jp, copy_markers) if copy_markers else None
    return _phase_entropy(jp.width, jp.height, geom, planes, qtables,
                          config, cfg, ncomps, restart,
                          _jpeg_colorspace(jp), extra)


def perfect_possible(jp, op: str) -> bool:
    """jpegtran -perfect: a transform is lossless-perfect iff no edge
    trimming would occur (transupp.c)."""
    imcu_w, imcu_h = 8 * jp.max_h, 8 * jp.max_v
    w_ok = jp.width % imcu_w == 0
    h_ok = jp.height % imcu_h == 0
    need_w = op in ("flip_h", "rot90", "rot180", "transverse")
    need_h = op in ("flip_v", "rot180", "rot270", "transverse")
    return (w_ok or not need_w) and (h_ok or not need_h)


def transform(data: bytes, op: str = "none",
              config: Optional[EncoderConfig] = None,
              copy_markers: str = "comments",
              perfect: bool = False) -> bytes:
    """One-call lossless transform: parse -> transform -> re-encode."""
    img = read_coefficients(data)
    if perfect and not perfect_possible(img.jp, op):
        raise ValueError("transformation is not perfect")
    if op.startswith("crop:"):
        x, y, w, h = (int(v) for v in op[5:].split(","))
        img = crop(img, x, y, w, h)
    elif op in TRANSFORMS:
        img = TRANSFORMS[op](img)
    else:
        raise ValueError("unknown transform %r" % op)
    return write_coefficients(img, config, copy_markers)
