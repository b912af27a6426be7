"""Fast-path device pipeline in coefficient-major layout.

Two jitted programs bound by device-resident arrays (nothing large crosses
the tunnel between them):

  P1: image -> per comp {q_real (64,N) i16, raw (64,N) i32, norm (N,) f32,
      ac-first hist (256,)} — raw/q stay on device for P2.
  P2: trellis (AC DP + DC chains, all comps, one dispatch) -> final padded
      planes (64, Npad) i16 (downloaded once, flattened, for host entropy).

Block data lives as (64, N) / (8, 8, N) with the block index in the TPU lane
dimension — the (..., 8, 8) layout would leave 120 of 128 lanes idle.
"""
from __future__ import annotations

import functools
from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .. import consts
from ..ops import color, dct, dering, layout, quant, sample, symbols
from ..utils.xfer import to_host
from .pipeline import CompGeom, geometry


def _comp_plane(p, g: CompGeom, max_h: int, max_v: int, h2: int,
                smoothing: int = 0):
    if smoothing:
        # context mode (jcprepct.c pre_process_context): input rows are
        # duplicated through the FULL iMCU height before downsampling, so
        # the two-stage (downsample-then-replicate) padding does not apply
        if g.h == max_h and g.v == max_v:
            p = sample.smooth_fullsize(p, smoothing)
        elif g.h * 2 == max_h and g.v * 2 == max_v:
            p = sample.downsample_h2v2_smooth(p, smoothing)
        elif g.h * 2 == max_h and g.v == max_v:
            # h2v1 keeps its biased kernel even when smoothing is on
            # (jcsample.c:499-507: smoothok=FALSE, no smooth variant)
            p = sample.downsample_h2v1(p)
        elif g.h < max_h or g.v < max_v:
            p = sample.downsample_int(p, max_h // g.h, max_v // g.v)
        return p[: g.bh_pad * 8, : g.bw_pad * 8]
    if g.v < max_v:
        p = p[:h2]
    hexp, vexp = max_h // g.h, max_v // g.v
    if (hexp, vexp) == (2, 2):
        p = sample.downsample_h2v2(p)
    elif (hexp, vexp) == (2, 1):
        p = sample.downsample_h2v1(p)
    elif (hexp, vexp) != (1, 1):
        # jcsample has no special 1x2 kernel: every other ratio
        # (1x2, 4x1, 1x4, 4x2, ...) uses the plain int average
        p = sample.downsample_int(p, hexp, vexp)
    p = layout.pad_plane(p, g.bh_pad * 8, g.bw_pad * 8)
    return p[: g.bh_pad * 8, : g.bw_pad * 8]


def _natural_order_positions():
    """zigzag position of natural index i, for the norm accumulation order."""
    return np.argsort(consts.JPEG_ZIGZAG)


_ZZ_OF_NAT = _natural_order_positions()

_QTBL_CACHE = {}


def _dev_qtbl(t: np.ndarray):
    key = t.tobytes()
    if key not in _QTBL_CACHE:
        if len(_QTBL_CACHE) >= 256:      # bound: varying tables would
            _QTBL_CACHE.clear()          # otherwise leak device arrays
        _QTBL_CACHE[key] = jnp.asarray(t.reshape(8, 8, 1))
    return _QTBL_CACHE[key]


def _norm_seq(raw_zz):
    """Sequential f32 norm accumulation in NATURAL index order (exact C)."""
    n = raw_zz.shape[1]
    terms = raw_zz.astype(jnp.float32) ** 2            # (64, N)

    def step(c, i):
        return c + terms[i], None

    order = jnp.asarray(_ZZ_OF_NAT[1:], dtype=jnp.int32)
    acc, _ = jax.lax.scan(step, jnp.zeros((n,), jnp.float32), order,
                          )
    return acc


@functools.partial(jax.jit, static_argnums=(1, 2, 3, 4, 5, 6, 7, 8, 9, 10))
def _p1(rgb, mcus_x: int, mcus_y: int, geom: tuple, dering_on: bool,
        precision: int = 8, colorspace: str = "ycbcr",
        qt_slots: tuple = None, smoothing: int = 0,
        dct_method: str = "islow", ris: tuple = None,
        qts81=None, dts81=None):
    """qts81: per-component (8, 8, 1) device quant tables; dts81:
    per-component scaled divisor tables for the ifast method."""
    """Per comp (q_zz, raw_zz) device arrays + ONE packed small array
    [norms as f32-bits | hists as int32] for a single host transfer."""
    gl = geom[0]
    max_h, max_v = gl.h, gl.v
    h = rgb.shape[0]
    ph, pw = mcus_y * 8 * max_v, mcus_x * 8 * max_h
    h2 = -(-h // max_v) * max_v
    if colorspace == "ycck":
        ycck = color.cmyk_to_ycck(rgb, precision)
        planes = [layout.pad_plane(ycck[..., i], ph, pw)
                  for i in range(len(geom))]
    elif colorspace in ("rgb", "cmyk"):
        # null conversion: components stored directly (jccolor.c:723)
        planes = [layout.pad_plane(rgb[..., i], ph, pw)
                  for i in range(len(geom))]
    elif rgb.ndim == 3:
        ycc = color.rgb_to_ycc(rgb, precision)
        planes = [layout.pad_plane(ycc[..., i], ph, pw)
                  for i in range(len(geom))]
    else:
        planes = [layout.pad_plane(rgb, ph, pw)]
    if qt_slots is None:
        qt_slots = (0,) + (1,) * (len(geom) - 1)
    out = []
    for ci, g in enumerate(geom):
        p = _comp_plane(planes[ci], g, max_h, max_v, h2, smoothing)
        # real blocks only, raster order, coefficient-major
        blocks = layout.blockify_t(
            p[: g.bh * 8, : g.bw * 8].astype(jnp.int32)
            - (1 << (precision - 1)))
        q81 = qts81[ci]
        if dering_on and dct_method != "float":
            # the reference's dering threshold is 255-CENTERJSAMPLE (literal
            # 8-bit constant) at EVERY data precision (jcdctmgr.c:419)
            szz = layout.to_zigzag_t(blocks)
            szz = dering.dering_t(szz, q81[0, 0, 0])
            blocks = layout.from_zigzag_t(szz)
        if dct_method == "ifast":
            sc = dct.fdct_ifast_t(blocks)              # AAN-scaled
            qz = dct.quantize_ifast_t(sc, dts81[ci])
            coeffs = dct.rescale_ifast_t(sc)           # nominal-range raw
        elif dct_method == "float":
            fblocks = blocks.astype(jnp.float32)
            if dering_on:
                fzz = layout.to_zigzag_t(fblocks)
                fzz = dering.dering_float_t(fzz, q81[0, 0, 0])
                fblocks = layout.from_zigzag_t(fzz)
            sc = dct.fdct_float_t(fblocks)
            qz = dct.quantize_float_t(sc, dts81[ci])
            coeffs = dct.rescale_float_t(sc)
        else:
            pass1_bits = 2 if precision == 8 else 1    # jfdctint.c:80-86
            coeffs = dct.fdct_islow_t(blocks, pass1_bits)
            qz = quant.quantize_islow_t(coeffs, q81)
        if dering_on:
            # post-dering clamp to +-(2^(precision+2)-1) (jcdctmgr.c:706,764)
            maxc = (1 << (precision + 2)) - 1
            qz = jnp.clip(qz, -maxc, maxc)
        q_zz = layout.to_zigzag_t(qz)                  # (64, N) int16
        raw_zz = layout.to_zigzag_t(coeffs)            # (64, N) int32
        norm = _norm_seq(raw_zz)
        achist = symbols.ac_first_histogram_t(
            q_zz, ri=(ris[ci] if ris else 0))
        out.append((q_zz, raw_zz, norm, achist))
    # pack all small outputs into one int32 buffer (one tunnel round trip)
    small = jnp.concatenate(
        [jax.lax.bitcast_convert_type(o[2], jnp.int32) for o in out]
        + [o[3] for o in out])
    return [o[:2] for o in out], small


@functools.partial(jax.jit, static_argnums=(1, 2))
def _pad_for_entropy(q_zz, g: CompGeom, transpose: bool = True):
    """(64, N real) -> flattened (Npad*64,) int16 in (bh_pad, bw_pad, 64)
    block-major order for the host entropy engine."""
    zp = layout.add_dummy_blocks_t(q_zz, g.bw, g.bh, g.bw_pad, g.bh_pad,
                                   g.h, g.v)
    # (64, Npad) -> (Npad, 64) flat
    return jnp.transpose(zp, (1, 0)).reshape(-1)


def run_p1(image: np.ndarray, samp: List[Tuple[int, int]], qtables,
           dering_on: bool, grayscale: bool = False, precision: int = 8,
           colorspace: str = "ycbcr", qt_slots: tuple = None,
           smoothing: int = 0, dct_method: str = "islow",
           ris: tuple = None):
    """-> (geom, [(q_zz, raw_zz)] device arrays, small_dev packed array).

    Unpack small_dev with unpack_small() when the host needs norms/hists."""
    h, w = image.shape[:2]
    mcus_x, mcus_y, geom = geometry(w, h, samp)
    if qt_slots is None:
        qt_slots = (0,) + (1,) * (len(geom) - 1)
        if len(qtables) < 2:
            qt_slots = (0,) * len(geom)
    qts81 = tuple(_dev_qtbl(np.asarray(qtables[s])) for s in qt_slots)
    dts81 = None
    if dct_method == "ifast":
        from ..ops import dct as _dct
        dts81 = tuple(
            jnp.asarray(_dct.ifast_divisors(qtables[s]).reshape(8, 8, 1))
            for s in qt_slots)
    elif dct_method == "float":
        from ..ops import dct as _dct
        dts81 = tuple(
            jnp.asarray(_dct.float_divisors(qtables[s]).reshape(8, 8, 1))
            for s in qt_slots)
    res, small = _p1(jnp.asarray(image), mcus_x, mcus_y, tuple(geom),
                     dering_on, precision, colorspace, qt_slots, smoothing,
                     dct_method, ris, qts81=qts81, dts81=dts81)
    return (mcus_x, mcus_y, geom), res, small


def unpack_small(geom, small_dev):
    """One host transfer -> ([norm f32 per comp], [achist i32 per comp])."""
    _, _, comps = geom
    buf = np.asarray(small_dev)
    norms, hists = [], []
    off = 0
    for g in comps:
        n = g.bh * g.bw
        norms.append(buf[off:off + n].view(np.float32))
        off += n
    for g in comps:
        hists.append(buf[off:off + 256])
        off += 256
    return norms, hists


@functools.partial(jax.jit, static_argnums=(1,))
def _pack_all(planes_t, geoms):
    """Concat every comp's padded plane into ONE flat int16 buffer."""
    return jnp.concatenate(
        [_pad_for_entropy(q, g) for q, g in zip(planes_t, geoms)])


def download_planes(geom, comp_results) -> List[np.ndarray]:
    return download_final(geom, [r[0] for r in comp_results])


def download_final(geom, planes_t) -> List[np.ndarray]:
    """Final planes -> host [(bh_pad, bw_pad, 64) int16]: ONE flat
    transfer for all comps (the tunnel charges ~25 ms latency per array
    and has pathological 2D int16 paths)."""
    _, _, comps = geom
    flat = np.asarray(_pack_all(tuple(planes_t), tuple(comps)))
    out = []
    off = 0
    for g in comps:
        n = g.bh_pad * g.bw_pad * 64
        out.append(flat[off:off + n].reshape(g.bh_pad, g.bw_pad, 64))
        off += n
    return out


# ---------------------------------------------------------------------------
# Batched variants: a group of same-shape images in ONE dispatch and ONE
# transfer each way. Image blocks are concatenated along the lane dimension
# (N' = B*N) so every downstream kernel (trellis included) runs unchanged.
# All kernels operate on REAL blocks only; iMCU dummy blocks
# (jccoefct.c:197-214,322-345 repeat-DC fill) are synthesized AFTER the
# coefficient download (add_dummy_blocks_host) so arbitrary image
# dimensions ride this path (r5 — the r4 16-alignment cliff is gone).
# ---------------------------------------------------------------------------

def batchable(geom) -> bool:
    """Every geometry batches since r5 (dummy blocks are host-synthesized
    post-download; the batched trellis DC chain slices phases per image)."""
    del geom
    return True


def add_dummy_blocks_host(plane: np.ndarray, g: CompGeom) -> np.ndarray:
    """(bh, bw, 64) real-block plane -> (bh_pad, bw_pad, 64) with iMCU
    dummy blocks: DC of the row's last real block for dummy columns,
    per-MCU-column repeated DC for dummy rows, zero AC — the host numpy
    twin of ops/layout.add_dummy_blocks_t (jccoefct.c:300-347)."""
    if g.bw == g.bw_pad and g.bh == g.bh_pad:
        return plane
    out = np.zeros((g.bh_pad, g.bw_pad, 64), plane.dtype)
    out[:g.bh, :g.bw] = plane
    if g.bw < g.bw_pad:
        out[:g.bh, g.bw:, 0] = plane[:, g.bw - 1, 0:1]
    if g.bh < g.bh_pad:
        src = out[g.bh - 1, :, 0].reshape(g.bw_pad // g.h, g.h)[:, -1]
        out[g.bh:, :, 0] = np.repeat(src, g.h)[None, :]
    return out


@functools.partial(jax.jit,
                   static_argnums=(1, 2, 3, 4, 5, 6, 7, 8, 9, 10))
def _p1_batch(rgbs, mcus_x: int, mcus_y: int, geom: tuple, dering_on: bool,
              precision: int = 8, ris: tuple = None, smoothing: int = 0,
              dct_method: str = "islow", cs: str = "ycbcr",
              qt_slots: tuple = None, qts81=None, dts81=None):
    if qt_slots is None:
        qt_slots = (0,) + (1,) * (len(geom) - 1)

    def one(rgb):
        return _p1.__wrapped__(rgb, mcus_x, mcus_y, geom, dering_on,
                               precision, cs, qt_slots, smoothing,
                               dct_method, ris, qts81, dts81)

    res, smalls = jax.vmap(one)(rgbs)
    b = rgbs.shape[0]
    merged = []
    for (q_zz, raw_zz) in res:                  # (B, 64, N) each
        q2 = jnp.moveaxis(q_zz, 0, 1).reshape(64, -1)
        r2 = jnp.moveaxis(raw_zz, 0, 1).reshape(64, -1)
        merged.append((q2, r2))
    return merged, smalls.reshape(-1)           # one small buffer for all B


def _divisor_tables(qtables, qt_slots, dct_method):
    """Per-slot ifast/float divisor tables (None for islow)."""
    if dct_method == "ifast":
        from ..ops import dct as _dct
        return tuple(
            jnp.asarray(_dct.ifast_divisors(qtables[s]).reshape(8, 8, 1))
            for s in qt_slots)
    if dct_method == "float":
        from ..ops import dct as _dct
        return tuple(
            jnp.asarray(_dct.float_divisors(qtables[s]).reshape(8, 8, 1))
            for s in qt_slots)
    return None


def run_p1_batch(images: np.ndarray, samp, qtables, dering_on: bool,
                 precision: int = 8, ris: tuple = None,
                 smoothing: int = 0, dct_method: str = "islow",
                 cs: str = "ycbcr", qt_slots: tuple = None):
    """images (B, H, W, C) -> (geom, [(q,raw) with N'=B*N], smalls (B,...))."""
    b, h, w = images.shape[:3]
    mcus_x, mcus_y, geom = geometry(w, h, samp)
    if qt_slots is None:
        qt_slots = tuple(0 if i == 0 else 1 for i in range(len(geom)))
    qts81 = tuple(_dev_qtbl(np.asarray(
        qtables[min(s_, len(qtables) - 1)])) for s_ in qt_slots)
    dts81 = _divisor_tables(qtables, qt_slots, dct_method)
    from ..utils import xfer
    xfer.add_h2d(images.nbytes)
    res, small = _p1_batch(jnp.asarray(images), mcus_x, mcus_y, tuple(geom),
                           dering_on, precision, ris, smoothing,
                           dct_method, cs, tuple(qt_slots),
                           qts81=qts81, dts81=dts81)
    return (mcus_x, mcus_y, geom), res, small


def unpack_small_batch(geom, small_dev, b: int):
    """-> per image ([norms per comp], [hists per comp])."""
    _, _, comps = geom
    buf = np.asarray(small_dev).reshape(b, -1)
    out = []
    for i in range(b):
        norms, hists = [], []
        off = 0
        for g in comps:
            n = g.bh * g.bw
            norms.append(buf[i, off:off + n].view(np.float32))
            off += n
        for g in comps:
            hists.append(buf[i, off:off + 256])
            off += 256
        out.append((norms, hists))
    return out


@functools.partial(jax.jit, static_argnums=(1, 2))
def _pack_all_batch(planes_t, geoms, b: int):
    """Per comp (64, B*N) planes -> ONE flat int16 buffer ordered
    [image0: comp0 blocks, comp1, ...][image1: ...]."""
    per_image = []
    for i in range(b):
        for q, g in zip(planes_t, geoms):
            n = g.bh * g.bw
            sl = q[:, i * n:(i + 1) * n]
            per_image.append(jnp.transpose(sl, (1, 0)).reshape(-1))
    return jnp.concatenate(per_image)


def split_flat_batch(geom, flat: np.ndarray, b: int):
    _, _, comps = geom
    out = []
    off = 0
    for i in range(b):
        planes = []
        for g in comps:
            n = g.bh * g.bw * 64
            planes.append(flat[off:off + n].reshape(g.bh, g.bw, 64))
            off += n
        out.append(planes)
    return out


def download_final_batch(geom, planes_t, b: int):
    """-> [per image [(bh, bw, 64) planes per comp]] via one transfer."""
    _, _, comps = geom
    flat = np.asarray(_pack_all_batch(tuple(planes_t), tuple(comps), b))
    out = []
    off = 0
    for i in range(b):
        planes = []
        for g in comps:
            n = g.bh * g.bw * 64
            planes.append(flat[off:off + n].reshape(g.bh, g.bw, 64))
            off += n
        out.append(planes)
    return out

@functools.partial(jax.jit, static_argnums=(1, 2, 3, 4, 5))
def _p1_raw(planes, geom: tuple, dering_on: bool, precision: int = 8,
            ris: tuple = None, dct_method: str = "islow", qts81=None,
            dts81=None):
    """Raw-YUV variant of _p1 (jpeg_write_raw_data path): the caller
    supplies already-subsampled component planes padded to the block
    grid; color conversion and downsampling are skipped."""
    out = []
    for ci, g in enumerate(geom):
        p = planes[ci]
        blocks = layout.blockify_t(
            p[: g.bh * 8, : g.bw * 8].astype(jnp.int32)
            - (1 << (precision - 1)))
        q81 = qts81[ci]
        if dering_on and dct_method != "float":
            szz = layout.to_zigzag_t(blocks)
            szz = dering.dering_t(szz, q81[0, 0, 0])
            blocks = layout.from_zigzag_t(szz)
        if dct_method == "ifast":
            sc = dct.fdct_ifast_t(blocks)
            qz = dct.quantize_ifast_t(sc, dts81[ci])
            coeffs = dct.rescale_ifast_t(sc)
        elif dct_method == "float":
            fblocks = blocks.astype(jnp.float32)
            if dering_on:
                fzz = layout.to_zigzag_t(fblocks)
                fzz = dering.dering_float_t(fzz, q81[0, 0, 0])
                fblocks = layout.from_zigzag_t(fzz)
            sc = dct.fdct_float_t(fblocks)
            qz = dct.quantize_float_t(sc, dts81[ci])
            coeffs = dct.rescale_float_t(sc)
        else:
            pass1_bits = 2 if precision == 8 else 1
            coeffs = dct.fdct_islow_t(blocks, pass1_bits)
            qz = quant.quantize_islow_t(coeffs, q81)
        if dering_on:
            maxc = (1 << (precision + 2)) - 1
            qz = jnp.clip(qz, -maxc, maxc)
        q_zz = layout.to_zigzag_t(qz)
        raw_zz = layout.to_zigzag_t(coeffs)
        norm = _norm_seq(raw_zz)
        achist = symbols.ac_first_histogram_t(
            q_zz, ri=(ris[ci] if ris else 0))
        out.append((q_zz, raw_zz, norm, achist))
    small = jnp.concatenate(
        [jax.lax.bitcast_convert_type(o[2], jnp.int32) for o in out]
        + [o[3] for o in out])
    return [o[:2] for o in out], small


def run_p1_raw(planes, width: int, height: int, samp, qtables,
               dering_on: bool, precision: int = 8,
               qt_slots: tuple = None, ris: tuple = None,
               dct_method: str = "islow"):
    """planes: per-comp uint8 arrays with tjPlaneWidth/Height dims
    (PAD(width, max_h) * h / max_h etc.). Rows and columns beyond the
    plane replicate the last row/column out to the block grid (verified
    against tj3CompressFromYUV8's edge blocks)."""
    mcus_x, mcus_y, geom = geometry(width, height, samp)
    if qt_slots is None:
        qt_slots = (0,) + (1,) * (len(geom) - 1)
        if len(qtables) < 2:
            qt_slots = (0,) * len(geom)
    qts81 = tuple(_dev_qtbl(np.asarray(qtables[s])) for s in qt_slots)
    dts81 = None
    if dct_method == "ifast":
        from ..ops import dct as _dct
        dts81 = tuple(
            jnp.asarray(_dct.ifast_divisors(qtables[s]).reshape(8, 8, 1))
            for s in qt_slots)
    elif dct_method == "float":
        from ..ops import dct as _dct
        dts81 = tuple(
            jnp.asarray(_dct.float_divisors(qtables[s]).reshape(8, 8, 1))
            for s in qt_slots)
    padded = []
    for ci, g in enumerate(geom):
        pl = np.asarray(planes[ci])
        ph, pw = pl.shape
        buf = np.zeros((g.bh * 8, g.bw * 8), pl.dtype)
        ch, cw = min(ph, g.bh * 8), min(pw, g.bw * 8)
        buf[:ch, :cw] = pl[:ch, :cw]
        if cw < g.bw * 8:
            buf[:ch, cw:] = buf[:ch, cw - 1:cw]
        if ch < g.bh * 8:
            buf[ch:] = buf[ch - 1:ch]
        padded.append(jnp.asarray(buf))
    res, small = _p1_raw(tuple(padded), tuple(geom), dering_on, precision,
                         ris, dct_method, qts81=qts81, dts81=dts81)
    return (mcus_x, mcus_y, geom), res, small



@functools.partial(jax.jit, static_argnums=(1, 2, 3, 4, 5))
def _p1_batch_pre(bufs, geom: tuple, dering_on: bool, precision: int = 8,
                  ris: tuple = None, dct_method: str = "islow",
                  qts81=None, dts81=None):
    """Batched p1 from host-prepared YCbCr planes (native/prep.cpp):
    bufs (B, total_bytes) uint8 = per image [Y | Cb | Cr] edge-padded
    planes. Skips color conversion and downsampling on device — the
    host did them (bit-exact) to halve the tunnel upload."""
    sizes = [g.bh_pad * 8 * g.bw_pad * 8 for g in geom]

    def one(buf):
        planes = []
        off = 0
        for g, n in zip(geom, sizes):
            planes.append(buf[off:off + n].reshape(g.bh_pad * 8,
                                                   g.bw_pad * 8))
            off += n
        return _p1_raw.__wrapped__(tuple(planes), geom, dering_on,
                                   precision, ris, dct_method, qts81,
                                   dts81)

    res, smalls = jax.vmap(one)(bufs)
    merged = []
    for (q_zz, raw_zz) in res:
        q2 = jnp.moveaxis(q_zz, 0, 1).reshape(64, -1)
        r2 = jnp.moveaxis(raw_zz, 0, 1).reshape(64, -1)
        merged.append((q2, r2))
    return merged, smalls.reshape(-1)


@functools.partial(jax.jit, static_argnums=(3, 4, 5, 6, 7, 8, 9))
def _p1_batch_packed(hdrs, flat, bases, nwh: int, total: int,
                     geom: tuple, dering_on: bool, precision: int = 8,
                     ris: tuple = None, dct_method: str = "islow",
                     qts81=None, dts81=None):
    """Batched p1 from plane-packed uploads (ops/planepack.py format):
    hdrs (B, nwh) u32 nibble widths, flat (capT,) u32 = every image's
    payload concatenated with no per-image padding, bases (B,) i32 word
    offsets. The device expands the ~0.6-1.0 B/px stream back to the
    exact prepped planes, then runs the raw p1 — byte-identical to
    _p1_batch_pre with ~40% of its upload bytes."""
    from ..ops import planepack
    sizes = [g.bh_pad * 8 * g.bw_pad * 8 for g in geom]
    nst = -(-total // planepack.T)

    def one(hdr, base):
        widths = planepack._widths_from_words(hdr, nst)
        stream = planepack.expand_stream(flat, widths, total, base)
        planes = []
        off = 0
        for g, n in zip(geom, sizes):
            planes.append(stream[off:off + n].reshape(g.bh_pad * 8,
                                                      g.bw_pad * 8))
            off += n
        return _p1_raw.__wrapped__(tuple(planes), geom, dering_on,
                                   precision, ris, dct_method, qts81,
                                   dts81)

    res, smalls = jax.vmap(one)(hdrs, bases)
    merged = []
    for (q_zz, raw_zz) in res:
        q2 = jnp.moveaxis(q_zz, 0, 1).reshape(64, -1)
        r2 = jnp.moveaxis(raw_zz, 0, 1).reshape(64, -1)
        merged.append((q2, r2))
    return merged, smalls.reshape(-1)


def run_p1_batch_packed(images, samp, qtables, dering_on: bool,
                        precision: int = 8, ris: tuple = None,
                        dct_method: str = "islow"):
    """Host C++ prep + plane pack -> one compressed upload -> device
    expand + batched p1. Byte-identical to run_p1_batch_pre."""
    import os as _os
    from ..native import lib, u8p, u32p
    from ..ops import planepack
    b = len(images)
    h, w = images[0].shape[:2]
    mcus_x, mcus_y, geom = geometry(w, h, samp)
    q81 = [_dev_qtbl(np.asarray(t)) for t in qtables[:2]]
    qts81 = tuple(q81[0 if i == 0 else min(1, len(q81) - 1)]
                  for i in range(len(geom)))
    gy, gc = geom[0], geom[1]
    pw_y, ph_y = gy.bw_pad * 8, gy.bh_pad * 8
    pw_c, ph_c = gc.bw_pad * 8, gc.bh_pad * 8
    total = ph_y * pw_y + 2 * ph_c * pw_c
    nst = -(-total // planepack.T)
    nwh = -(-nst // 8)
    nt = max(1, (_os.cpu_count() or 4) - 1)
    stream = np.empty(total, np.uint8)
    widths = np.empty((b, nst), np.uint8)
    words = np.empty((b, nst * 4 + 4), np.uint32)
    nws = []
    for i, img in enumerate(images):
        rgb = np.ascontiguousarray(img)
        yp = stream[:ph_y * pw_y]
        cbp = stream[ph_y * pw_y:ph_y * pw_y + ph_c * pw_c]
        crp = stream[ph_y * pw_y + ph_c * pw_c:]
        lib.mj_prep_ycc(rgb.ctypes.data_as(u8p), w, h,
                        samp[0][0], samp[0][1],
                        pw_y, ph_y, pw_c, ph_c,
                        yp.ctypes.data_as(u8p), cbp.ctypes.data_as(u8p),
                        crp.ctypes.data_as(u8p), nt)
        nws.append(int(lib.mj_plane_pack(
            stream.ctypes.data_as(u8p), total,
            widths[i].ctypes.data_as(u8p),
            words[i].ctypes.data_as(u32p), nt)))
    bases = np.zeros(b, np.int32)
    bases[1:] = np.cumsum(nws[:-1])
    capt = max(1, -(-int(sum(nws)) // 8192) * 8192)   # one bucket/group
    flat = np.empty(capt, np.uint32)
    off = 0
    for i in range(b):
        flat[off:off + nws[i]] = words[i, :nws[i]]
        off += nws[i]
    flat[off:] = 0
    hdrs = planepack.widths_to_words_host(widths)
    from ..utils import xfer
    xfer.add_h2d(flat.nbytes + hdrs.nbytes + bases.nbytes)
    qt_slots = tuple(0 if i == 0 else 1 for i in range(len(geom)))
    dts81 = _divisor_tables(qtables, qt_slots, dct_method)
    merged, small = _p1_batch_packed(jnp.asarray(hdrs),
                                     jnp.asarray(flat),
                                     jnp.asarray(bases), nwh, total,
                                     tuple(geom), dering_on, precision,
                                     ris, dct_method, qts81, dts81)
    return (mcus_x, mcus_y, geom), merged, small


def run_p1_batch_pre(images, samp, qtables, dering_on: bool,
                     precision: int = 8, ris: tuple = None,
                     dct_method: str = "islow"):
    """Host color+downsample (multithreaded C++) -> one packed uint8
    upload -> batched p1. Byte-identical results to run_p1_batch."""
    import os as _os
    from ..native import lib, u8p
    b = len(images)
    h, w = images[0].shape[:2]
    mcus_x, mcus_y, geom = geometry(w, h, samp)
    q81 = [_dev_qtbl(np.asarray(t)) for t in qtables[:2]]
    qts81 = tuple(q81[0 if i == 0 else min(1, len(q81) - 1)]
                  for i in range(len(geom)))
    gy, gc = geom[0], geom[1]
    pw_y, ph_y = gy.bw_pad * 8, gy.bh_pad * 8
    pw_c, ph_c = gc.bw_pad * 8, gc.bh_pad * 8
    total = ph_y * pw_y + 2 * ph_c * pw_c
    bufs = np.empty((b, total), np.uint8)
    nt = max(1, (_os.cpu_count() or 4) - 1)
    for i, img in enumerate(images):
        rgb = np.ascontiguousarray(img)
        yp = bufs[i, :ph_y * pw_y]
        cbp = bufs[i, ph_y * pw_y:ph_y * pw_y + ph_c * pw_c]
        crp = bufs[i, ph_y * pw_y + ph_c * pw_c:]
        lib.mj_prep_ycc(rgb.ctypes.data_as(u8p), w, h,
                        samp[0][0], samp[0][1],
                        pw_y, ph_y, pw_c, ph_c,
                        yp.ctypes.data_as(u8p), cbp.ctypes.data_as(u8p),
                        crp.ctypes.data_as(u8p), nt)
    from ..utils import xfer
    xfer.add_h2d(bufs.nbytes)
    qt_slots = tuple(0 if i == 0 else 1 for i in range(len(geom)))
    dts81 = _divisor_tables(qtables, qt_slots, dct_method)
    merged, small = _p1_batch_pre(jnp.asarray(bufs), tuple(geom),
                                  dering_on, precision, ris, dct_method,
                                  qts81, dts81)
    return (mcus_x, mcus_y, geom), merged, small
