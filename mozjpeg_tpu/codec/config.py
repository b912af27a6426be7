"""Encoder configuration — mirrors mozjpeg's parameter surface.

Defaults follow jpeg_set_defaults with JCP_MAX_COMPRESSION
(/root/reference/jcparam.c:387-518): progressive + trellis + optimize_scans +
optimized Huffman + overshoot deringing + quant table 3 (ImageMagick).
"""
from __future__ import annotations

import os

import dataclasses
import enum
from typing import Optional, Sequence, Tuple


class Profile(enum.Enum):
    MAX_COMPRESSION = "max"    # mozjpeg default
    FASTEST = "fastest"        # libjpeg-turbo-compatible ("-revert")


def quality_default_subsampling(quality: float) -> Tuple[int, int]:
    """cjpeg -quality subsampling heuristic (rdswitch.c:562-570):
    >=90 -> 4:4:4, >=80 -> 4:2:2, else 4:2:0."""
    if quality >= 90:
        return (1, 1)
    if quality >= 80:
        return (2, 1)
    return (2, 2)


class DCTMethod(enum.Enum):
    ISLOW = "islow"
    IFAST = "ifast"
    FLOAT = "float"


@dataclasses.dataclass
class EncoderConfig:
    # single rating, or a per-quant-table sequence "N,M" like cjpeg
    # (rdswitch.c:526-560 set_quality_ratings)
    quality: object = 75.0
    profile: Profile = Profile.MAX_COMPRESSION

    # data precision (8 or 12 for lossy; jcmaster.c:1093 forces optimized
    # Huffman coding above 8 bits, and arithmetic falls back to Huffman)
    precision: int = 8

    # colorspace / sampling
    subsampling: Tuple[int, int] = (2, 2)   # (h, v) for luma; chroma 1x1
    # declared SOF sampling factors for single-component grayscale: cjpeg's
    # set_sample_factors writes into comp 0 even for grayscale
    # (rdswitch.c:610-642), so -sample and the q>=80 "2x1" heuristic
    # (rdswitch.c:565-570) change the SOF byte while geometry stays
    # full-resolution (factors are relative to the component max).
    # None = the jpeg_set_colorspace default, 1x1 (jcparam.c:593).
    gray_sample: Optional[Tuple[int, int]] = None
    grayscale: bool = False
    # None = auto (gray input -> grayscale, 3ch -> ycbcr, 4ch -> cmyk);
    # explicit: "ycbcr" | "grayscale" | "rgb" | "cmyk" | "ycck"
    # (jcparam.c:548-566 jpeg_default_colorspace)
    colorspace: Optional[str] = None

    # entropy
    progressive: Optional[bool] = None      # None = profile default
    optimize_coding: Optional[bool] = None  # Huffman table optimization
    optimize_scans: Optional[bool] = None   # jpegrescan-style scan search
    arithmetic: bool = False
    restart_interval: int = 0               # in MCUs
    restart_in_rows: int = 0                # in MCU rows (converted later)
    icc: Optional[bytes] = None             # embedded ICC profile (-icc)
    dc_scan_opt_mode: int = 0
    # JFIF density (unit, X, Y): unit 0=aspect, 1=dpi, 2=dots/cm;
    # BMP inputs propagate pels-per-meter here (rdbmp.c:515-519)
    density: tuple = (0, 1, 1)
    # cjpeg -nojfif: suppress the JFIF APP0 marker (cjpeg.c:709-710)
    write_jfif: bool = True

    # quantization
    quant_tbl_idx: Optional[int] = None     # None = profile default (3 or 0)
    force_baseline: bool = False            # cjpeg default (-baseline sets True)
    smoothing_factor: int = 0
    # raw basic tables (-qtables file): replace slots 0..n-1 before quality
    # scaling (rdswitch.c:84-137 read_quant_tables)
    base_quant_tables: Optional[Sequence] = None
    # per-component quant slot override (-qslots, rdswitch.c:576-610)
    qslots: Optional[Sequence[int]] = None

    # trellis (mozjpeg extension params, jcext.c / jpeglib.h:321-355)
    trellis_quant: Optional[bool] = None
    trellis_quant_dc: bool = True
    trellis_eob_opt: bool = False
    trellis_q_opt: bool = False
    use_lambda_weight_tbl: bool = True
    use_scans_in_trellis: bool = False
    trellis_freq_split: int = 8
    trellis_num_loops: int = 1
    trellis_delta_dc_weight: float = 0.0
    lambda_log_scale1: float = 14.75
    lambda_log_scale2: float = 16.5

    # deringing
    overshoot_deringing: Optional[bool] = None

    dct_method: DCTMethod = DCTMethod.ISLOW

    # custom scan script: list of (comps tuple, Ss, Se, Ah, Al)
    scan_script: Optional[Sequence] = None

    # emit entropy data (sequential and all progressive scan kinds) with
    # the on-device restart-parallel bit packers (ops/bitpack.py) instead
    # of the serial host engine; byte-identical output (no reference
    # analog — SURVEY.md §2.6). None = auto: on for TPU backends, off on
    # CPU where the serial C++ engine wins.
    device_entropy: Optional[bool] = None

    # run the optimize_scans candidate search on device (two batched
    # programs for all ~130 candidate variants; codec/scanopt_dev.py)
    # instead of per-candidate host encoding. Byte-identical output.
    # None = auto: on for TPU backends (where it avoids downloading the
    # coefficient planes), off on CPU where the threaded host engine wins.
    device_scanopt: Optional[bool] = None

    # attachment class for the device-vs-host engine trade (r5):
    #   "auto"   -> probe (utils/attachment.py): local iff real TPU with
    #               < 2 ms sync latency
    #   "local"  -> device search/emission engines ON (scanopt_dev +
    #               device entropy): host cores are the scarce resource
    #   "remote" -> engines OFF: the transport download already deleted
    #               the transfer they existed to delete, and the full
    #               candidate sweep costs bottleneck device time
    # MJ_DEPLOYMENT env overrides "auto".
    deployment: str = "auto"

    # download coefficient planes for host entropy as [nonzero masks |
    # compacted values] (ops/sparsepack.py) instead of dense (64, N)
    # int16 — ~10x fewer transferred elements on the remote TPU tunnel.
    # Falls back to dense automatically on capacity overflow.
    # None = auto: on for TPU backends.
    sparse_download: Optional[bool] = None

    # run RGB->YCbCr + chroma downsampling on host CPU (native/prep.cpp,
    # bit-exact) so the batched path uploads 1.5 B/px instead of 3.
    # None = auto: on for TPU backends (tunnel-bandwidth-bound).
    host_prep: Optional[bool] = None

    # pack the prepped-plane upload with the lossless per-subtile-width
    # plane codec (ops/planepack.py + native/planepack.cpp): ~0.6-1.0
    # B/px over the tunnel instead of 1.5, expanded on device before p1.
    # Byte-identical output. None = auto: on for TPU backends.
    plane_pack: Optional[bool] = None

    # download coefficients for host entropy as a device-Huffman-packed
    # transport stream (~0.15 B/px, ops/transport.py + native
    # mj_transport_decode) instead of the sparse masks+values layout
    # (~1.0 B/px). Byte-identical final output (the coefficients are).
    # Falls back to the sparse download on capacity overflow.
    # None = auto: on for TPU backends (tunnel-D2H-bound).
    coef_transport: Optional[bool] = None

    def resolved(self) -> "ResolvedConfig":
        if self.precision not in (8, 12):
            raise ValueError(
                "lossy data precision must be 8 or 12 (16 is lossless-only), "
                "got %r" % (self.precision,))
        maxc = self.profile == Profile.MAX_COMPRESSION
        deep = self.precision > 8
        return ResolvedConfig(
            quality=self.quality,
            precision=self.precision,
            subsampling=self.subsampling,
            gray_sample=self.gray_sample,
            grayscale=self.grayscale,
            colorspace=self.colorspace,
            progressive=(self.progressive if self.progressive is not None
                         else maxc),
            optimize_coding=(True if deep else
                             (self.optimize_coding
                              if self.optimize_coding is not None else maxc)),
            optimize_scans=(self.optimize_scans
                            if self.optimize_scans is not None else maxc),
            arithmetic=self.arithmetic and not deep,
            restart_interval=self.restart_interval,
            restart_in_rows=self.restart_in_rows,
            icc=self.icc,
            dc_scan_opt_mode=self.dc_scan_opt_mode,
            density=self.density,
            write_jfif=self.write_jfif,
            quant_tbl_idx=(self.quant_tbl_idx
                           if self.quant_tbl_idx is not None
                           else (3 if maxc else 0)),
            force_baseline=self.force_baseline,
            smoothing_factor=self.smoothing_factor,
            base_quant_tables=self.base_quant_tables,
            qslots=tuple(self.qslots) if self.qslots else None,
            trellis_quant=(self.trellis_quant
                           if self.trellis_quant is not None else maxc),
            trellis_quant_dc=self.trellis_quant_dc,
            trellis_eob_opt=self.trellis_eob_opt,
            trellis_q_opt=self.trellis_q_opt,
            use_lambda_weight_tbl=self.use_lambda_weight_tbl,
            use_scans_in_trellis=self.use_scans_in_trellis,
            trellis_freq_split=self.trellis_freq_split,
            trellis_num_loops=self.trellis_num_loops,
            trellis_delta_dc_weight=self.trellis_delta_dc_weight,
            lambda_log_scale1=self.lambda_log_scale1,
            lambda_log_scale2=self.lambda_log_scale2,
            overshoot_deringing=(self.overshoot_deringing
                                 if self.overshoot_deringing is not None
                                 else maxc),
            dct_method=self.dct_method,
            scan_script=self.scan_script,
            device_entropy=_auto_device_entropy(self.device_entropy,
                                                self.deployment),
            device_scanopt=_auto_device_scanopt(self.device_scanopt,
                                                self.deployment),
            sparse_download=_auto_backend_flag(self.sparse_download,
                                               "MJ_SPARSE_DL"),
            host_prep=_auto_backend_flag(self.host_prep, "MJ_HOST_PREP"),
            plane_pack=_auto_backend_flag(self.plane_pack,
                                          "MJ_PLANEPACK"),
            coef_transport=_auto_backend_flag(self.coef_transport,
                                              "MJ_COEF_TRANSPORT"),
        )


@dataclasses.dataclass
class ResolvedConfig:
    quality: float
    precision: int
    subsampling: Tuple[int, int]
    gray_sample: Optional[Tuple[int, int]]
    grayscale: bool
    colorspace: Optional[str]
    progressive: bool
    optimize_coding: bool
    optimize_scans: bool
    arithmetic: bool
    restart_interval: int
    restart_in_rows: int
    icc: Optional[bytes]
    density: tuple
    write_jfif: bool
    dc_scan_opt_mode: int
    quant_tbl_idx: int
    force_baseline: bool
    smoothing_factor: int
    base_quant_tables: Optional[Sequence]
    qslots: Optional[Tuple[int, ...]]
    trellis_quant: bool
    trellis_quant_dc: bool
    trellis_eob_opt: bool
    trellis_q_opt: bool
    use_lambda_weight_tbl: bool
    use_scans_in_trellis: bool
    trellis_freq_split: int
    trellis_num_loops: int
    trellis_delta_dc_weight: float
    lambda_log_scale1: float
    lambda_log_scale2: float
    overshoot_deringing: bool
    dct_method: DCTMethod
    scan_script: Optional[Sequence]
    device_entropy: bool
    device_scanopt: bool
    sparse_download: bool
    host_prep: bool
    plane_pack: bool
    coef_transport: bool


def _deployment_local(deployment: str) -> bool:
    d = (deployment or "auto").lower()
    if d == "local":
        return True
    if d == "remote":
        return False
    from ..utils import attachment
    return attachment.is_local_tpu()


def _auto_device_entropy(flag, deployment: str = "auto"):
    if flag is not None:
        return bool(flag)
    env = os.environ.get("MJ_DEVICE_ENTROPY", "auto").lower()
    if env in ("0", "false", "off"):
        return False
    if env in ("1", "true", "on"):
        return True
    # auto (r5): ON for locally-attached TPUs, where per-scan dispatches
    # are microseconds and host cores are the scarce resource; OFF on
    # remote attachments — measured there (docs/perf_notes.md):
    # per-candidate device emission costs one ~33 ms table upload +
    # dispatch round trip per scan, 5x slower than the threaded host
    # engine. The batched fused-scanopt path (codec/scanopt_dev.py) is
    # where device entropy pays off, selected separately below.
    return _deployment_local(deployment)


def _auto_device_scanopt(flag, deployment: str = "auto"):
    if flag is not None:
        return bool(flag)
    env = os.environ.get("MJ_DEVICE_SCANOPT", "auto").lower()
    if env in ("0", "false", "off"):
        return False
    if env in ("1", "true", "on"):
        return True
    # auto (r5): ON for locally-attached TPUs (deployment="local" or the
    # <2 ms sync-latency probe), OFF on remote attachments. The device
    # search is byte-exact and runs stably on the chip, but it LOSES
    # structurally on remote tunnels: its reason to exist was deleting
    # the coefficient D2H, and the r4 transport download
    # (ops/transport.py) already shrank that to ~0.17 B/px with
    # ~35 ms/group of device work — while the full ~130-candidate device
    # sweep costs more device time than the pipeline's bottleneck stage
    # and the threaded host search runs in parallel on otherwise-idle
    # cores (~50 ms/group). On local attachments those tunnel terms
    # vanish and the sweep replaces host-core work with idle device
    # time (scripts/engine_tradeoff.py measures the cross-over).
    return _deployment_local(deployment)


def _auto_backend_flag(flag, env_name):
    if flag is not None:
        return bool(flag)
    env = os.environ.get(env_name, "auto").lower()
    if env in ("0", "false", "off"):
        return False
    if env in ("1", "true", "on"):
        return True
    import jax
    return jax.default_backend() == "tpu"
