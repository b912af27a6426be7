"""Pallas TPU kernel for the AC trellis DP.

The XLA lax.scan formulation re-streams the (64, N) azd/acc tensors from HBM
on every one of the 63 DP steps (~6 ms/step profiled). This kernel keeps the
whole DP state resident in VMEM per lane-chunk: inputs are read once,
outputs written once, and the 63-step loop runs on-chip with the DP state
carried through a fori_loop.

The i-loop is ROLLED (lax.fori_loop), not unrolled: the unrolled 63x10
variant cost ~13 s to trace and ~21 s to XLA-compile per process, which
dominated warm-start latency. Rolling requires only dynamic SUBLANE slices
(row i of x/qval/azd, rows [64-i, 128-i) of the rate table) — cheap on
Mosaic — while the k candidate loop stays unrolled (10 steps).

Exact-semantics notes (must match quantize_trellis, jcdctmgr.c:936-1329):
  - tie-breaking is first-minimum in (j, k) lexicographic order, implemented
    as min-of-(flat-index)-where-cost-equals-min;
  - float products feeding adds are guarded with minimum(x, 3e38) so Mosaic
    cannot FMA-contract away C's per-product rounding;
  - 1/(q*q) arrives host-computed (IEEE f32): TPU's reciprocal-based f32
    divide is 1 ulp off for some quant values (codec/trellis.py _recip2_np);
  - the (run, size) rate table is data-independent per image. Because the
    rate of a j->i transition depends only on run = i-1-j and the bit
    length k+1, it is stored run-indexed as (128, 16) f32 with
    rr[t, k] = rate(run = 63-t) for t < 64 and BIG for t >= 64; step i
    reads rows [64-i, 128-i) so entry j of the slice is rate(i-1-j).

Grid: (B, n_img/LANES). Outputs acc/run_start/best_val/qval/azd stay on
device; the EOB decision and path walk remain cheap XLA ops outside.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import os as _os

KMAX = 10
RR_K = 16         # lane-padded k dimension of the run-rate table
BIGF = 1e38
LANES = int(_os.environ.get("MJ_TRELLIS_LANES", "512"))


def _frnd(x):
    # literal (not a traced constant) so pallas kernels can close over it
    return jnp.minimum(x, 3.0e38)


def _make_kernel(Ss: int, Se: int):
    def kernel(qtbl_ref, ltbl_ref, rr_ref, raw_ref, lam_ref,
               nb_ref, ei_ref, azd_ref):
        L = raw_ref.shape[1]
        raw = raw_ref[:, :]
        x = jnp.abs(raw)
        q8 = qtbl_ref[:, :] << 3                       # (64, 1)
        qval = jnp.minimum((x + (q8 >> 1)) // q8, 1023)

        ltbl = ltbl_ref[:, :]                          # (64, 1)
        lam = lam_ref[:, :]                            # (1, L)

        pos = jax.lax.broadcasted_iota(jnp.int32, (64, 1), 0)
        in_band = (pos >= Ss) & (pos <= Se)
        zdist = _frnd(_frnd((x * x).astype(jnp.float32) * lam) * ltbl)
        zterm = jnp.where(in_band, zdist, 0.0)

        # sequential f32 prefix (band only), unrolled
        rows = [zterm[0:1, :]]
        run = rows[0]
        for i in range(1, 64):
            run = run + zterm[i:i + 1, :]
            rows.append(run)
        azd = jnp.concatenate(rows, axis=0)            # (64, L)
        azd_ref[:, :] = azd        # VMEM scratch: the DP body row-slices it

        j_iota = jax.lax.broadcasted_iota(jnp.int32, (64, 1), 0)
        j_nonzero = (qval != 0) & in_band              # (64, L)
        start_mask = j_iota == (Ss - 1)

        acc0 = jnp.where(start_mask, 0.0,
                         jnp.float32(BIGF)) + jnp.zeros((1, L), jnp.float32)
        rs0 = jnp.zeros((64, L), jnp.int32)
        bv0 = jnp.zeros((64, L), jnp.int32)

        def body(i, st):
            # Mosaic has no dynamic_slice on VALUES; rows are re-read from
            # the input/output REFS with pl.ds (x/qval/nc re-derived from
            # the raw row — identical integer math to the full-tensor
            # precompute above)
            acc, rs, bv = st
            x_i = jnp.abs(raw_ref[pl.ds(i, 1), :])     # (1, L)
            q8_i = qtbl_ref[pl.ds(i, 1), :] << 3       # (1, 1)
            qval_i = jnp.minimum((x_i + (q8_i >> 1)) // q8_i, 1023)
            nc_i = jnp.where(qval_i > 0,
                             32 - jax.lax.clz(jnp.maximum(qval_i, 1)), 0)
            azd_im1 = azd_ref[pl.ds(i - 1, 1), :]      # (1, L)
            ltbl_i = ltbl_ref[pl.ds(i, 1), :]          # (1, 1)
            rate_i = rr_ref[0, pl.ds(64 - i, 64), :]   # (64, RR_K)
            tail = (azd_im1 - azd) + acc               # (64, L)
            j_ok = (j_nonzero | start_mask) & (j_iota < i)

            # k-candidates fold ELEMENTWISE (strict < keeps the smallest k
            # on ties), then ONE j-reduction after the loop. This is
            # exactly the first-minimum flat-index (j*KMAX+k) tie-break of
            # the two-reductions-per-k formulation — smallest j among the
            # min-cost pairs, then the smallest k within that j — but it
            # cuts the sublane reductions per DP step from 2*KMAX to 3
            # (reductions were ~2/3 of the kernel's step time).
            # Degenerate rows (every candidate invalid, bestc stays BIGF)
            # keep bestcand's init 0 where the old per-k formulation kept
            # cand_0; the divergence is confined to rows whose acc stays
            # BIGF, which the EOB argmin and path walk can never select,
            # so final outputs are identical.
            bestc = jnp.full((64, L), jnp.float32(BIGF))
            bestk = jnp.zeros((64, L), jnp.int32)
            bestcand = jnp.zeros((64, L), jnp.int32)
            for k in range(KMAX):
                cand_k = jnp.where(nc_i == k + 1, qval_i, (2 << k) - 1)
                delta = cand_k * q8_i - x_i
                cdist_k = _frnd(_frnd((delta * delta).astype(jnp.float32)
                                      * lam) * ltbl_i)
                rate_jk = rate_i[:, k:k + 1]           # (64, 1)
                cost_k = (rate_jk + cdist_k) + tail
                valid = (j_ok & (k < nc_i) & (qval_i != 0)
                         & (rate_jk < jnp.float32(BIGF)))
                cost_k = jnp.where(valid, cost_k, jnp.float32(BIGF))
                upd = cost_k < bestc
                bestc = jnp.where(upd, cost_k, bestc)
                bestk = jnp.where(upd, k, bestk)
                bestcand = jnp.where(upd, cand_k + jnp.zeros((64, 1),
                                                             jnp.int32),
                                     bestcand)
            minval = jnp.min(bestc, axis=0, keepdims=True)      # (1, L)
            flat = j_iota * KMAX + bestk                        # (64, L)
            jflat = jnp.where(bestc == minval, flat, 64 * KMAX)
            minidx = jnp.min(jflat, axis=0, keepdims=True)      # (1, L)
            # flat indices are distinct per j, so the winner row is unique
            csel = jnp.where(jflat == minidx, bestcand,
                             jnp.int32(1 << 30))
            mincand = jnp.min(csel, axis=0, keepdims=True)      # (1, L)

            new_acc_i = jnp.where(qval_i != 0, minval, jnp.float32(BIGF))
            row_i = j_iota == i                        # select row i
            acc = jnp.where(row_i, new_acc_i, acc)
            rs = jnp.where(row_i, minidx // KMAX, rs)
            bv = jnp.where(row_i, mincand, bv)
            return acc, rs, bv

        acc, rs, bv = jax.lax.fori_loop(Ss, Se + 1, body, (acc0, rs0, bv0))

        # ---- end selection + path walk, ALL IN VMEM (r5): the XLA tail
        # used to re-stream acc/rs/bv/azd from HBM and the 63-step walk's
        # 64-way row select cost ~35 ms/group on its own ----
        azd_Se = azd[Se:Se + 1, :]                       # (1, L)
        # EOB code length rides in rate-LUT row 127 (never read by the
        # DP: step i slices rows [64-i, 128-i) with i >= 1)
        eobl = rr_ref[0, 127:128, 0:1].reshape(1, 1)
        end_wo = (acc + azd_Se) - azd                    # (64, L)
        end_cost = end_wo + jnp.where(pos < Se, eobl,
                                      jnp.float32(0.0))
        end_cost = jnp.where(j_nonzero, end_cost, jnp.float32(BIGF))
        end_cost = jnp.where(j_iota == (Ss - 1), azd_Se + eobl, end_cost)
        mn = jnp.min(end_cost, axis=0, keepdims=True)
        jsel = jnp.where(end_cost == mn,
                         j_iota + jnp.zeros((1, L), jnp.int32), 64)
        last = jnp.min(jsel, axis=0, keepdims=True)      # (1, L) first-min

        def wbody(step, st):
            cur, keep = st
            hit = j_iota == cur                          # one row per lane
            on = cur >= Ss
            keep = keep | jnp.where(hit & on, 1, 0)
            nxt = jnp.sum(jnp.where(hit, rs, 0), axis=0, keepdims=True)
            cur = jnp.where(on, nxt, Ss - 1)
            return cur, keep

        keep0 = jnp.zeros((64, L), jnp.int32)
        _, keep = jax.lax.fori_loop(0, Se - Ss + 1, wbody, (last, keep0))
        kept = (keep != 0) & j_nonzero
        sign = jnp.where(raw < 0, -1, 1)
        nb_ref[:, :] = jnp.where(kept, bv * sign, 0)

        # eob-opt side info: [czero, skip, has_eob, 0...] as (8, L) f32
        heob = ((last < Se).astype(jnp.float32)
                + (last == (Ss - 1)).astype(jnp.float32))
        end_wo_adj = jnp.where(j_iota == (Ss - 1), azd_Se, end_wo)
        skip = jnp.sum(jnp.where(j_iota == last, end_wo_adj,
                                 jnp.float32(0.0)), axis=0, keepdims=True)
        skip = jnp.where(last == (Ss - 1), azd_Se, skip)
        zr = jnp.zeros((1, L), jnp.float32)
        ei_ref[:, :] = jnp.concatenate(
            [azd_Se, skip, heob, zr, zr, zr, zr, zr], axis=0)

    return kernel


def build_rate_lut(ac_si: np.ndarray, Ss: int, Se: int) -> np.ndarray:
    """Run-indexed rate table (128, RR_K) f32 for the Pallas DP:
    [t, k] = rate of a transition with run = 63-t and bit-length k+1
    (= ehufsi[16*(run&15)+k+1] + (k+1) + (run>>4)*zrl_len), BIG where
    invalid (code length 0, run>=16 without a ZRL code, t>=64, k>=KMAX).
    Step i slices rows [64-i, 128-i) so slice[j] = rate(run = i-1-j);
    rows t>=64 (run<0, i.e. j>=i) stay BIG. Band bounds don't enter the
    table: the kernel's j_ok mask enforces them."""
    del Ss, Se
    lut = np.full((128, RR_K), BIGF, np.float32)
    lut[127, 0] = float(ac_si[0])      # EOB length for the in-kernel tail
    zrl_len = int(ac_si[0xF0])
    for r in range(64):
        if (r >> 4) and zrl_len == 0:
            continue
        run_bits = (r >> 4) * zrl_len
        for k in range(KMAX):
            cl = int(ac_si[16 * (r & 15) + k + 1])
            if cl == 0:
                continue
            lut[63 - r, k] = (cl + (k + 1)) + run_bits
    return lut


@functools.partial(jax.jit, static_argnums=(5, 6, 7, 8))
def trellis_ac_dp_pallas(raw, qtbl_zz, ltbl, rate_luts, lam,
                         Ss: int, Se: int, n_img: int,
                         interpret: bool = False):
    """raw (64, N) int32 image-major (N = B*n_img, n_img % LANES == 0);
    ltbl (64,) f32 host-IEEE 1/(q*q); rate_luts (B, 128, RR_K) f32 with
    the EOB code length stashed at [b, 127, 0]; lam (N,) f32.
    -> (new_band (64, N) int32 signed kept values — 0 elsewhere in
    band — and eob-info (8, N) f32 rows [czero, skip, has_eob, 0...])."""
    N = raw.shape[1]
    B = rate_luts.shape[0]
    chunks = n_img // LANES
    grid = (B, chunks)

    def col(b, c):
        return (0, b * chunks + c)

    out = pl.pallas_call(
        _make_kernel(Ss, Se),
        grid=grid,
        in_specs=[
            pl.BlockSpec((64, 1), lambda b, c: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((64, 1), lambda b, c: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 128, RR_K), lambda b, c: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((64, LANES), col, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, LANES), col, memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((64, LANES), col, memory_space=pltpu.VMEM),
            pl.BlockSpec((8, LANES), col, memory_space=pltpu.VMEM),
        ],
        out_shape=[jax.ShapeDtypeStruct((64, N), jnp.int32),
                   jax.ShapeDtypeStruct((8, N), jnp.float32)],
        scratch_shapes=[pltpu.VMEM((64, LANES), jnp.float32)],
        interpret=interpret,
    )(qtbl_zz.reshape(64, 1).astype(jnp.int32),
      ltbl.reshape(64, 1).astype(jnp.float32), rate_luts,
      raw, lam.reshape(1, -1))
    return out
