"""Trellis quantization — batched TPU reformulation of mozjpeg's
rate-distortion Viterbi (/root/reference/jcdctmgr.c:936-1330 quantize_trellis).

The reference runs an O(63^2 x candidates) scalar DP per block, sequentially
per block row. Here:
  - The AC DP is a fixed-shape dense DP batched over EVERY block of a
    component at once (lax.scan over the 63 zigzag steps; each step is a
    (blocks, 64, K) vector min). The reference's data-dependent j-loop skip
    (`coef_blocks[]==0`) is equivalent to masking positions whose
    round-nearest qval is zero, so the dense form is exact.
  - The DC DP (up to 9 candidates, chained through a block row with lastDC
    reset per iMCU row, /root/reference/jccoefct.c:417-419) is a batched
    lax.scan over row position: all block rows of the same phase (row index
    mod v) in parallel, phases sequenced to carry lastDC exactly like the
    reference.

Rate tables follow the reference's pass sequence exactly: with
optimize_coding, each component's AC table is the optimal table generated
from its own round-nearest AC-first statistics (jcmaster.c pass machinery);
DC tables remain the standard ones during trellis passes.
"""
from __future__ import annotations

import functools
from typing import List

import jax
import jax.numpy as jnp
import numpy as np

from .. import consts
from ..entropy import encode as entenc
from ..entropy.huffman import HuffTable, derive_codes
from ..ops import symbols as _symbols

KMAX = 10          # max AC candidates: NBITS(1023) = 10
DC_CAND_MAX = 9    # DC_TRELLIS_MAX_CANDIDATES
BIG = np.float32(1e38)   # np, not jnp: a module-level device array
# would be captured as a hoisted constant in every trace (perf_notes)
AC_SLAB = 16384    # blocks per AC-DP slab (bounds the (N,64,K) buffers)


def _nbits(v):
    """JPEG_NBITS for nonnegative int32 arrays (0 -> 0)."""
    v = v.astype(jnp.int32)
    return jnp.where(v > 0, 32 - jax.lax.clz(jnp.maximum(v, 1)), 0)


def _frnd(x):
    """Rounding barrier for f32 products that feed adds.

    XLA:TPU contracts `a*b + c` into an FMA (one rounding); the C
    reference rounds every f32 product separately, and a single knife-
    edge cost tie then flips a trellis decision (seen as a 1-coefficient
    divergence at q92 on the real chip). minimum() is the identity for
    every finite cost here but blocks the contraction. XLA:CPU does not
    contract, so guarded and unguarded CPU outputs are identical."""
    return jnp.minimum(x, np.float32(3.0e38))


@functools.lru_cache(maxsize=1)
def _recip2_np():
    """IEEE f32 table of 1/(q*q) for q in [0, 32767].

    TPU f32 division is reciprocal-based and lands 1 ulp off the IEEE
    quotient for some quant values (measured on v5e: q=22,35,...), while
    the C reference divides in IEEE f32 — a knife-edge trellis cost tie
    then flips a coefficient decision. All 1/(q*q) lambda tables are
    therefore looked up from this host-built (numpy, IEEE) table instead
    of divided on device; multiplication IS bit-exact on TPU. 32767 is
    libjpeg's quant-entry ceiling (jcparam.c jpeg_add_quant_table)."""
    q = np.arange(32768, dtype=np.float32)
    with np.errstate(divide="ignore"):
        return np.float32(1.0) / (q * q)


def _ltbl_lookup(qvals):
    """1/(q*q) per entry, IEEE-exact on every backend (see _recip2_np).

    The table is COPIED per trace so jax embeds it as an inline literal:
    re-using one numpy object across traces lets jax capture the cached
    device array as a hoisted constant, and a re-trace after cache
    clearing then produces executables whose parameter list no longer
    matches the dispatch path ("supplied N buffers but compiled program
    expected M", jax 0.9.0)."""
    return jnp.asarray(_recip2_np().copy())[qvals.astype(jnp.int32)]


@functools.partial(jax.jit, static_argnums=(5, 6))
def trellis_dc_rows(raw_dc, last_dc0, q0, dc_si, lam_dc, nc: int,
                    maxq: int = 1023, delta_w: float = 0.0,
                    above_raw=None, above_dc=None):
    """DC trellis over a batch of independent block rows.

    raw_dc: (R, L) int32 unquantized DC (x8); last_dc0: (R,) int32 initial
    predictor per row; q0: () int32; dc_si: (256,) int32; lam_dc: (R, L)
    float32 (= lambda * 1/q0^2).  Returns ((R, L) int32 chosen quantized DC,
    (R,) int32 final DC per row).
    """
    R, L = raw_dc.shape
    q8 = q0 * 8
    sign = jnp.where(raw_dc < 0, -1, 1)
    x = jnp.abs(raw_dc)
    qval = (x + q8 // 2) // q8
    ks = jnp.arange(nc)
    cand_mag = jnp.clip(qval[..., None] - nc // 2 + ks, -maxq, maxq)
    delta = cand_mag * q8 - x[..., None]
    dist = _frnd((delta * delta).astype(jnp.float32) * lam_dc[..., None])
    cand = cand_mag * sign[..., None]                   # (R, L, nc) signed
    if delta_w > 0.0 and above_raw is not None:
        # vertical-gradient distortion (jcdctmgr.c:1069-1084): compare the
        # original and reconstructed DC gradients against the row above
        vd = ((above_raw - raw_dc)[..., None]
              - (above_dc[..., None] * q8 - cand * q8))
        vdist = _frnd((vd * vd).astype(jnp.float32) * lam_dc[..., None])
        dist = dist + _frnd(jnp.float32(delta_w) * (vdist - dist))

    dc_si_f = dc_si.astype(jnp.float32)

    def trans_cost(d):
        # dc_si_f[b] as a 17-way select over static scalars: a traced
        # gather costs ~8.7 ns/element on TPU and this runs once per DP
        # step per candidate pair (|delta| <= 2*maxq so b <= 16)
        b = _nbits(jnp.abs(d))
        out = b.astype(jnp.float32)
        for k in range(17):
            out = out + jnp.where(b == k, dc_si_f[k], jnp.float32(0))
        return out

    def step(acc, t):
        cand_t = cand[:, t, :]
        dist_t = dist[:, t, :]
        prev = cand[:, jnp.maximum(t - 1, 0), :]
        cost = trans_cost(cand_t[:, None, :] - prev[:, :, None]) \
            + dist_t[:, None, :] + acc[:, :, None]       # (R, l_prev, k)
        bt = jnp.argmin(cost, axis=1).astype(jnp.int32)
        new_acc = jnp.min(cost, axis=1)
        acc0 = trans_cost(cand_t - last_dc0[:, None]) + dist_t
        new_acc = jnp.where(t == 0, acc0, new_acc)
        bt = jnp.where(t == 0, 0, bt)
        return new_acc, bt

    acc, bts = jax.lax.scan(step, jnp.zeros((R, nc), jnp.float32),
                            jnp.arange(L), unroll=4)
    best = jnp.argmin(acc, axis=1).astype(jnp.int32)

    def back(cur, t):
        val = jnp.take_along_axis(cand[:, t, :], cur[:, None], axis=1)[:, 0]
        nxt = jnp.take_along_axis(bts[t], cur[:, None], axis=1)[:, 0]
        nxt = jnp.where(t == 0, cur, nxt)
        return nxt, val

    _, vals = jax.lax.scan(back, best, jnp.arange(L - 1, -1, -1),
                           unroll=4)
    out = jnp.flip(jnp.moveaxis(vals, 0, 1), axis=1)    # (R, L)
    return out, out[:, -1]


def get_num_dc_candidates(q0: int) -> int:
    return min(DC_CAND_MAX, (2 + 60 // q0) | 1)


# ---------------------------------------------------------------------------
# Coefficient-major fast path: one dispatch for all components (AC DP + DC
# chains inside a single jitted program; raw/q arrive as device arrays from
# pipeline_t.P1 — nothing large crosses the host boundary).
# ---------------------------------------------------------------------------

def _trellis_ac_t(raw, qcoef, qtbl_zz, ac_si, lam, Ss: int, Se: int,
                  kmax: int = KMAX, maxq: int = 1023, bw: int = 0,
                  eob_opt: bool = False):
    """Transposed trellis_ac: raw/qcoef (64, N); same exact semantics.

    ac_si: (B, 256) per-image AC code lengths, N = B * n_img (image-major).
    Candidate values/distances are computed inside the DP step from row
    slices — precomputing (64, K, N) tensors made every scan step stream
    them from HBM (profiled at ~60% of trellis time).
    """
    N = raw.shape[1]
    B = ac_si.shape[0]
    n_img = N // B
    pos = jnp.arange(64)[:, None]                      # (64, 1)
    in_band = (pos >= Ss) & (pos <= Se)

    x = jnp.abs(raw)
    sign = jnp.where(raw < 0, -1, 1)
    q8_v = qtbl_zz.astype(jnp.int32) << 3              # (64,)
    q8 = q8_v[:, None]
    qval = jnp.minimum((x + (q8 >> 1)) // q8, maxq)    # (64, N)

    ltbl = _ltbl_lookup(qtbl_zz)                       # (64,)

    zdist = _frnd(_frnd((x * x).astype(jnp.float32) * lam[None, :])
                  * ltbl[:, None])
    zterm = jnp.where(in_band, zdist, 0.0)

    def azd_step(c, i):
        c = c + zterm[i]
        return c, c

    _, azd = jax.lax.scan(azd_step, jnp.zeros((N,), jnp.float32),
                          jnp.arange(64), unroll=4)   # (64, N)
    azd_prev = jnp.concatenate(
        [jnp.zeros((1, N), jnp.float32), azd[:-1]], axis=0)

    nc = _nbits(qval)                                  # (64, N)
    kv = jnp.arange(kmax)                              # (K,)
    cand_bits_f = (kv + 1).astype(jnp.float32)

    ac_si_f = ac_si.astype(jnp.float32)                # (B, 256)
    zrl_bits_l = jnp.repeat(ac_si_f[:, 0xF0], n_img)   # (N,)
    zrl_ok_l = jnp.repeat(ac_si[:, 0xF0] > 0, n_img)

    j_idx = jnp.arange(64)
    j_is_start = (j_idx == (Ss - 1))[:, None]
    j_nonzero = (qval != 0) & in_band
    j_valid_static = j_is_start | j_nonzero            # (64, N)

    init_acc = jnp.where(j_is_start, jnp.float32(0), BIG) + jnp.zeros((1, N))

    def step(acc, i):
        # per-position candidate set computed from row slices
        x_i = x[i]                                     # (N,)
        qval_i = qval[i]
        nc_i = nc[i]
        cand_i = jnp.where(kv[:, None] == nc_i[None, :] - 1,
                           qval_i[None, :], ((2 << kv) - 1)[:, None])
        cand_ok_i = kv[:, None] < nc_i[None, :]        # (K, N)
        delta = cand_i * q8_v[i] - x_i[None, :]
        # _frnd forbids FMA contraction of the product chain into the
        # cost add (C rounds each f32 product; see ops/dering.py)
        cdist_i = _frnd(_frnd((delta * delta).astype(jnp.float32)
                              * lam[None, :]) * ltbl[i])   # (K, N)

        run = i - 1 - j_idx                            # (64,)
        run_ok = ((run >= 0)[:, None]
                  & ((run < 16)[:, None] | zrl_ok_l[None, :]))
        run_bits = jnp.where((run >= 16)[:, None],
                             (run >> 4).astype(jnp.float32)[:, None]
                             * zrl_bits_l[None, :], 0.0)
        sym_idx = (16 * (run & 15))[:, None] + (kv + 1)[None, :]
        coef_len = ac_si_f[:, sym_idx]                 # (B, 64, K)
        coef_len = jnp.repeat(jnp.transpose(coef_len, (1, 2, 0)),
                              n_img, axis=2)           # (64, K, N)
        coef_ok = coef_len > 0
        rate = (coef_len + cand_bits_f[None, :, None]
                + run_bits[:, None, :])

        tail = (azd_prev[i][None, :] - azd) + acc      # (64, N)
        cost = (rate + cdist_i[None, :, :]) + tail[:, None, :]
        valid = ((j_valid_static & (j_idx < i)[:, None])[:, None, :]
                 & run_ok[:, None, :]
                 & coef_ok & cand_ok_i[None, :, :]
                 & (qval_i != 0)[None, None, :])
        cost = jnp.where(valid, cost, BIG)

        flat = cost.reshape(64 * kmax, N)
        arg = jnp.argmin(flat, axis=0)
        best = jnp.take_along_axis(flat, arg[None, :], axis=0)[0]
        bj = (arg // kmax).astype(jnp.int32)
        bk = arg % kmax
        val = jnp.take_along_axis(cand_i, bk[None, :], axis=0)[0]

        new_acc_i = jnp.where(qval_i != 0, best, BIG)
        acc = acc.at[i].set(new_acc_i)
        return acc, (bj, val)

    acc, (runstart_h, val_h) = jax.lax.scan(step, init_acc,
                                            jnp.arange(Ss, Se + 1))
    steps = Se - Ss + 1
    run_start = jnp.zeros((64, N), jnp.int32).at[Ss:Se + 1].set(runstart_h)
    best_val = jnp.zeros((64, N), jnp.int32).at[Ss:Se + 1].set(val_h)

    azd_Se = azd[Se]
    eob_len = jnp.repeat(ac_si_f[:, 0], n_img)[None, :]  # (1, N)
    end_wo_eob = (acc + azd_Se[None, :]) - azd           # cost without EOB
    end_cost = end_wo_eob + jnp.where(pos < Se, eob_len, 0.0)
    end_cost = jnp.where(j_nonzero, end_cost, BIG)
    end_cost = end_cost.at[Ss - 1].set(azd_Se + eob_len[0])
    last_idx = jnp.argmin(end_cost, axis=0).astype(jnp.int32)

    # path reconstruction: carry only the cursor; the membership mask is
    # reduced from the emitted cursor trail afterwards (a carried (64, N)
    # bool accumulated per-step profiled as ~370 ms of buffer copies)
    def walk(cur, _):
        nxt = jnp.take_along_axis(run_start,
                                  jnp.maximum(cur, 0)[None, :], axis=0)[0]
        nxt = jnp.where(cur >= Ss, nxt, Ss - 1)
        return nxt, cur

    _, curs = jax.lax.scan(walk, last_idx, None, length=steps,
                           unroll=4)  # (steps, N)
    curs_valid = jnp.where(curs >= Ss, curs, 64)       # 64 = out of range
    keep = jnp.any(curs_valid[:, None, :] == j_idx[None, :, None], axis=0)
    keep = keep & j_nonzero

    new_band = jnp.where(keep, best_val * sign, 0).astype(jnp.int16)
    out = jnp.where(in_band, new_band, qcoef)
    if not eob_opt:
        return out
    # --- trellis_eob_opt (jcdctmgr.c:981-996,1224-1297): a second DP over
    # whole blocks per block row, replacing trailing/isolated nonzero
    # blocks by progressive EOB runs when cheaper ---
    czero = azd_Se                                       # (N,) all-zero cost
    skip = jnp.take_along_axis(
        end_wo_eob.at[Ss - 1].set(azd_Se), last_idx[None, :], axis=0)[0]
    skip = jnp.where(last_idx == Ss - 1, czero, skip)    # best_cost_skip
    has_eob = ((last_idx < Se).astype(jnp.int32)
               + (last_idx == Ss - 1).astype(jnp.int32))  # 0/1/2
    keep_blk = _eob_block_dp(
        czero.reshape(-1, bw), skip.reshape(-1, bw),
        has_eob.reshape(-1, bw),
        jnp.repeat(ac_si_f, (N // bw) // B, axis=0))      # (R, bw) bool
    keep_blk = keep_blk.reshape(-1)                       # (N,)
    return jnp.where(in_band & ~keep_blk[None, :],
                     jnp.int16(0), out)


def _eob_block_dp(czero, skip, has_eob, ac_si_f):
    """Block-level EOB-run DP over each block row (R rows, L blocks).

    Mirrors jcdctmgr.c:1224-1297 exactly: float adds in C's order, first
    minimum wins, EOBn cost = ehufsi[16*nbits] + nbits."""
    R, L = czero.shape
    iidx = jnp.arange(L + 1)

    def eobrun_cost(run):
        # EOBn symbol length as a 16-way select over static columns
        # (run < 32768 so nb <= 15): the take_along_axis gather here ran
        # once per DP step and dominated the block-DP's device time
        nb = jnp.where(run > 0,
                       32 - jax.lax.clz(jnp.maximum(run, 1)), 0)
        out = nb.astype(jnp.float32)
        for k in range(16):
            out = out + jnp.where(nb == k, ac_si_f[:, 16 * k][:, None],
                                  jnp.float32(0))
        return out

    def step(carry, b):
        azbc, abc, req, brs = carry
        azbc_b = azbc[:, b]                              # azbc[bi]
        azbc = azbc.at[:, b + 1].set(azbc_b + czero[:, b])
        req_i = req                                      # (R, L+1)
        run = (b - iidx)[None, :] + req_i                # zero_block_run
        # C order: cost = skip; += azbc[bi]; -= azbc[i]; += abc[i]; += rate
        cost = (((skip[:, b][:, None] + azbc_b[:, None])
                 - azbc[:, : L + 1]) + abc) + eobrun_cost(run)
        valid = ((iidx <= b)[None, :] & (req_i != 2)
                 & (has_eob[:, b] != 2)[:, None])
        cost = jnp.where(valid, cost, BIG)
        arg = jnp.argmin(cost, axis=1).astype(jnp.int32)
        best = jnp.take_along_axis(cost, arg[:, None], axis=1)[:, 0]
        nz = has_eob[:, b] != 2
        abc = abc.at[:, b + 1].set(jnp.where(nz, best, BIG))
        brs = brs.at[:, b].set(jnp.where(nz, arg, 0))
        req = req.at[:, b + 1].set(has_eob[:, b])
        return (azbc, abc, req, brs), None

    azbc0 = jnp.zeros((R, L + 1), jnp.float32)
    abc0 = jnp.zeros((R, L + 1), jnp.float32)
    req0 = jnp.zeros((R, L + 1), jnp.int32)
    brs0 = jnp.zeros((R, L), jnp.int32)
    (azbc, abc, req, brs), _ = jax.lax.scan(
        step, (azbc0, abc0, req0, brs0), jnp.arange(L), unroll=4)

    # final EOB-run to the end of the row (jcdctmgr.c:1258-1276)
    run = (L - iidx)[None, :] + req
    fcost = (azbc[:, L][:, None] - azbc) + eobrun_cost(run)
    fcost = jnp.where(req != 2, fcost, BIG)
    last = jnp.argmin(fcost, axis=1).astype(jnp.int32) - 1  # last_block

    def walk(lb, b):
        kept = b == lb
        lb = jnp.where(kept, brs[:, b] - 1, lb)
        return lb, kept

    _, kept_rev = jax.lax.scan(walk, last, jnp.arange(L - 1, -1, -1),
                               unroll=4)
    return jnp.flip(jnp.moveaxis(kept_rev, 0, 1), axis=1)  # (R, L)


def _trellis_dc_t(raw_dc, last_dc0, q0, dc_si, lam_dc, nc: int,
                  maxq: int = 1023, delta_w: float = 0.0,
                  above_raw=None, above_dc=None):
    """Same DP as trellis_dc_rows (already verified) for use inside the
    combined jit; raw_dc (R, L)."""
    return trellis_dc_rows.__wrapped__(raw_dc, last_dc0, q0, dc_si,
                                       lam_dc, nc, maxq, delta_w,
                                       above_raw, above_dc)


@functools.lru_cache(maxsize=64)
def make_trellis_all_t(geoms, q0s, bands, dc_on: bool, ncands,
                       batch: int = 1, precision: int = 8,
                       eob_opt: bool = False, delta_w: float = 0.0,
                       use_pallas: bool = False, interpret: bool = False,
                       dev_tables: bool = False, dev_first=None):
    """Build a single jitted program running trellis for every component
    (cached per configuration — a fresh closure per call would recompile).

    geoms: tuple of CompGeom; bands: ((Ss, Se), ...) static; ncands:
    per-comp DC candidate counts (static). use_pallas selects the VMEM-
    resident Pallas kernel for the AC DP (8-bit precision only; see
    ac_impl_flags) — identical outputs either way.

    dev_tables: build the per-image AC rate tables INSIDE the program
    from device-resident AC-first histograms (ops/tablegen.py) instead
    of taking host-built tables in `packed` — run(raws, qs, packed,
    hists) with hists a tuple of (B, 256) int32 arrays; removes the
    host tablegen from the dispatch critical path (optimize_coding
    semantics only).

    dev_first: (lambda_log_scale1, lambda_log_scale2) — compute the
    per-block lambdas (ops/softfloat.py bit-exact f64 emulation) AND the
    loop-1 AC rate tables from the p1 `small` buffer INSIDE the program:
    run(raws, qs, packed, smalls) where packed carries only the static
    [dc_si | qtbl_zz] parts and smalls is the (B*stride,) int32 p1
    sidecar — the host never syncs norms/hists (optimize_coding only)."""
    geoms = tuple(geoms)
    kmax = precision + 2           # NBITS((1 << max_coef_bits) - 1)
    maxq = (1 << (precision + 2)) - 1
    use_pallas = use_pallas and precision == 8

    nlam = [batch * g.bh * g.bw for g in geoms]
    ncs = [g.bh * g.bw for g in geoms]
    stride = sum(ncs) + 256 * len(geoms)

    @jax.jit
    def run(raws, qs, packed, smalls=None, hists=None):
        # packed (int32 1D): [lam bits/comp + ac_si (B,256)/comp unless
        # dev_first | dc_si | qtbl_zz]
        off = 0
        lams, ac_sis, dc_sis, qtbl_zzs = [], [], [], []
        if dev_first is not None:
            from ..ops import softfloat as _sf
            sm = smalls.reshape(batch, stride)
            noff = 0
            for n_c in ncs:
                norms = jax.lax.bitcast_convert_type(
                    sm[:, noff:noff + n_c], jnp.float32)
                lams.append(_sf.lambda_from_norm_t.__wrapped__(
                    norms.reshape(-1), dev_first[0], dev_first[1]))
                noff += n_c
            if not dev_tables:
                from ..ops import tablegen as _tg
                # ONE stacked tablegen for all comps: the Annex-K merge
                # is a ~200-iteration device while_loop whose cost is
                # iteration overhead, not vector width — stacking cut
                # the fused program ~16 ms/group (r5)
                h_all = jnp.concatenate(
                    [sm[:, noff + ci * 256: noff + (ci + 1) * 256]
                     for ci in range(len(geoms))], axis=0)
                si_all = _tg.trellis_rate_tables_t.__wrapped__(h_all)
                for ci in range(len(geoms)):
                    ac_sis.append(si_all[ci * batch:(ci + 1) * batch])
        else:
            for n in nlam:
                lams.append(jax.lax.bitcast_convert_type(
                    packed[off:off + n], jnp.float32))
                off += n
        if dev_tables:
            from ..ops import tablegen as _tg
            h_all = jnp.concatenate([hists[ci]
                                     for ci in range(len(geoms))], axis=0)
            si_all = _tg.trellis_rate_tables_t.__wrapped__(h_all)
            for ci in range(len(geoms)):
                ac_sis.append(si_all[ci * batch:(ci + 1) * batch])
        elif dev_first is None:
            for _ in geoms:
                ac_sis.append(
                    packed[off:off + batch * 256].reshape(batch, 256))
                off += batch * 256
        for lst, sz in ((dc_sis, 256), (qtbl_zzs, 64)):
            for _ in geoms:
                lst.append(packed[off:off + sz])
                off += sz
        outs = []
        luts_all = None
        if use_pallas:
            # ONE stacked LUT build for all comps (rate_lut_dev ignores
            # the band bounds; the gather amortizes 3x)
            luts_all = rate_lut_dev(jnp.concatenate(ac_sis, axis=0),
                                    0, 63, kmax)
        for ci, g in enumerate(geoms):
            raw = raws[ci]
            new_q = qs[ci]
            lam = lams[ci]
            for (ss, se) in bands:
                if use_pallas:
                    lut = luts_all[ci * batch:(ci + 1) * batch]
                    new_q = _trellis_ac_pallas(raw, new_q, qtbl_zzs[ci],
                                               lut, ac_sis[ci], lam, ss, se,
                                               bw=g.bw, eob_opt=eob_opt,
                                               interpret=interpret)
                else:
                    new_q = _trellis_ac_t(raw, new_q, qtbl_zzs[ci],
                                          ac_sis[ci], lam, ss, se,
                                          kmax=kmax, maxq=maxq, bw=g.bw,
                                          eob_opt=eob_opt)
            if dc_on:
                q0 = qtbl_zzs[ci][0]
                ltbl0 = _ltbl_lookup(qtbl_zzs[ci][0])
                # phase decomposition is PER IMAGE (leading batch axis):
                # with bh % v != 0 (dummy-row geometry, jccoefct.c:322)
                # a flat (batch*bh, bw) stride-v slice would mix phases
                # across image boundaries
                lam_dc_full = (lam * ltbl0).reshape(batch, g.bh, g.bw)
                raw_dc = raw[0].reshape(batch, g.bh, g.bw)
                v = g.v
                dc_rows = []                 # per phase (batch, nph, bw)
                prev = None                  # (batch, nph_prev)
                for p in range(v):
                    rr = raw_dc[:, p::v]
                    ll = lam_dc_full[:, p::v]
                    nph = rr.shape[1]
                    init = (jnp.zeros(batch * nph, jnp.int32) if p == 0
                            else prev[:, :nph].reshape(-1))
                    ar = ad = None
                    if delta_w > 0.0 and p > 0:
                        # row above = phase p-1 of the same iMCU row
                        ar = raw_dc[:, p - 1::v][:, :nph] \
                            .reshape(-1, g.bw)
                        ad = dc_rows[p - 1][:, :nph].reshape(-1, g.bw)
                    dc, fin = _trellis_dc_t(rr.reshape(-1, g.bw), init,
                                            q0, dc_sis[ci],
                                            ll.reshape(-1, g.bw),
                                            ncands[ci], maxq=maxq,
                                            delta_w=delta_w,
                                            above_raw=ar, above_dc=ad)
                    dc_rows.append(dc.reshape(batch, nph, g.bw))
                    prev = fin.reshape(batch, nph)
                # interleave phases back into row order
                dc_all = jnp.zeros((batch, g.bh, g.bw), jnp.int32)
                for p in range(v):
                    dc_all = dc_all.at[:, p::v].set(dc_rows[p])
                new_q = new_q.at[0].set(
                    dc_all.reshape(-1).astype(jnp.int16))
            outs.append(new_q)
        return tuple(outs)

    return run


@functools.lru_cache(maxsize=32)
def make_band_hist_t(ss: int, se: int, batch: int = 1, ris: tuple = None):
    """Jitted per-band AC-first histograms from the CURRENT coefficient
    state — the reference's trellis stats passes regather per scan band
    after the previous band's requantization (jcmaster.c:444-460
    select_scan_parameters + huff_opt_pass)."""

    @jax.jit
    def run(qs):
        outs = []
        for ci, q in enumerate(qs):                    # (64, B*n)
            ri = ris[ci] if ris else 0
            if batch == 1:
                outs.append(
                    _symbols.ac_first_histogram_t(q, ss, se, ri)[None])
            else:
                qb = q.reshape(64, batch, -1)
                outs.append(jax.vmap(
                    lambda a, _ri=ri: _symbols.ac_first_histogram_t(
                        a, ss, se, _ri),
                    in_axes=1)(qb))
        return tuple(outs)

    return run


def lambda_from_norm(norm_sum: np.ndarray, s1: float, s2: float) -> np.ndarray:
    """Host lambda from the device-computed sequential f32 norm SUM."""
    norm = norm_sum / np.float32(63.0)
    if s2 > 0:
        lam = (np.float64(2.0) ** s1) / (np.float64(2.0) ** s2
                                         + norm.astype(np.float64))
    else:
        lam = np.full(norm.shape, np.float64(2.0) ** (s1 - 12.0))
    return lam.astype(np.float32)


def trellis_tables_from_hist(achist: np.ndarray, tbl_slot: int,
                             optimize_coding: bool):
    """Rate tables for the trellis pass from a device AC-first histogram."""
    from ..codec.encoder import STD_TABLES
    if optimize_coding:
        f = np.zeros(257, np.int64)
        f[:256] = achist.astype(np.int64)
        for run in range(16):
            for size in range(12):
                f[16 * run + size] += 1
        ac_tbl = entenc.gen_optimal_table(f)
    else:
        ac_tbl = STD_TABLES[(1, tbl_slot)]
    dc_tbl = STD_TABLES[(0, tbl_slot)]
    _, ac_si = derive_codes(ac_tbl)
    _, dc_si = derive_codes(dc_tbl)
    return ac_si.astype(np.int32), dc_si.astype(np.int32)


def pack_trellis_inputs(lams, ac_sis, dc_sis, qtbl_zzs) -> np.ndarray:
    """Host-side packing matching make_trellis_all_t's run(packed) layout."""
    parts = [np.asarray(l, np.float32).view(np.int32).ravel() for l in lams]
    parts += [np.asarray(a, np.int32).ravel() for a in ac_sis]
    parts += [np.asarray(d, np.int32).ravel() for d in dc_sis]
    parts += [np.asarray(q, np.int32).ravel() for q in qtbl_zzs]
    return np.concatenate(parts)


def rate_lut_dev(ac_si, Ss: int, Se: int, kmax: int):
    """Device-side run-indexed rate table for the Pallas DP.

    ac_si (B, 256) int32 code lengths -> (B, 128, RR_K) f32 where
    [b, 63-run, k] = ehufsi[16*(run&15) + k+1] + (k+1) + (run>>4)*zrl_len,
    BIG where invalid (code length 0, run>=16 without a ZRL code, row
    t>=64 i.e. run<0, or k >= kmax) -- the same table build_rate_lut
    constructs on host (ops/pallas_trellis.py), as one gather so it runs
    inside the jit. The DP step at position i slices rows [64-i, 128-i);
    band bounds are enforced by the kernel's j_ok mask, not the table."""
    from ..ops.pallas_trellis import RR_K
    del Ss, Se
    ac_si_f = ac_si.astype(jnp.float32)                  # (B, 256)
    tt = jnp.arange(128)[:, None]                        # table row
    kk = jnp.arange(RR_K)[None, :]                       # k (bit length-1)
    r = 63 - tt                                          # run (<0 for t>=64)
    rpos = jnp.maximum(r, 0)
    sym = 16 * (rpos & 15) + kk + 1                      # (128, RR_K)
    cl = ac_si_f[:, sym]                                 # (B, 128, RR_K)
    zrl = ac_si_f[:, 0xF0][:, None, None]                # (B, 1, 1)
    rb = (rpos >> 4).astype(jnp.float32)[None] * zrl
    ok = ((r >= 0) & (kk < kmax))[None] & (cl > 0) \
        & ((r < 16)[None] | (zrl > 0))
    lut = jnp.where(ok, (cl + (kk + 1).astype(jnp.float32)[None]) + rb,
                    BIG)
    # EOB code length rides at [b, 127, 0] for the in-kernel end
    # selection (build_rate_lut does the same on host)
    return lut.at[:, 127, 0].set(ac_si_f[:, 0])


def ac_impl_flags(precision: int):
    """(use_pallas, interpret) for the AC trellis DP.

    Defaults to the Pallas kernel on real TPU backends at 8-bit precision
    (the kernel is KMAX=10/maxq=1023 specific); MJ_TRELLIS_PALLAS=0 forces
    the XLA scan formulation, =1 forces Pallas (interpret mode off-TPU,
    for testing)."""
    import os
    env = os.environ.get("MJ_TRELLIS_PALLAS", "auto").lower()
    if env in ("0", "false", "off"):
        return (False, False)
    backend = jax.default_backend()
    if env in ("1", "true", "on", "interpret"):
        return (precision == 8, backend != "tpu")
    return (precision == 8 and backend == "tpu", False)


def _trellis_ac_pallas(raw, qcoef, qtbl_zz, rate_luts, ac_si, lam,
                       Ss: int, Se: int, bw: int = 0,
                       eob_opt: bool = False, interpret: bool = False):
    """AC trellis via the Pallas DP kernel + the same XLA EOB/walk tail as
    _trellis_ac_t (exact-identical semantics, 8-bit precision only).

    raw/qcoef (64, N) image-major with N = B*n_img; per-image block counts
    are padded on the fly to the kernel LANES multiple (all-zero columns
    are inert: qval 0 rows never win and out-of-band copy-through restores
    qcoef)."""
    from ..ops import pallas_trellis as pt
    N = raw.shape[1]
    B = ac_si.shape[0]
    n_img = N // B
    lanes = pt.LANES
    n_pad = -(-n_img // lanes) * lanes

    raw_p, lam_p = raw, lam
    if n_pad != n_img:
        raw_p = jnp.pad(raw.reshape(64, B, n_img),
                        ((0, 0), (0, 0), (0, n_pad - n_img))) \
            .reshape(64, B * n_pad)
        lam_p = jnp.pad(lam.reshape(B, n_img),
                        ((0, 0), (0, n_pad - n_img))).reshape(-1)
    ac_si_f = ac_si.astype(jnp.float32)
    # end selection, path walk and keep-masking all run IN the kernel
    # (r5): the XLA tail re-streamed five (64, N) outputs from HBM and
    # its 63-step walk alone cost ~35 ms/group
    new_band, ei = pt.trellis_ac_dp_pallas(
        raw_p, qtbl_zz, _ltbl_lookup(qtbl_zz), rate_luts,
        lam_p, Ss, Se, n_pad, interpret)
    if n_pad != n_img:
        new_band = new_band.reshape(64, B, n_pad)[:, :, :n_img] \
            .reshape(64, N)
        ei = ei.reshape(8, B, n_pad)[:, :, :n_img].reshape(8, N)

    pos = jnp.arange(64)[:, None]
    in_band = (pos >= Ss) & (pos <= Se)
    out = jnp.where(in_band, new_band.astype(jnp.int16), qcoef)
    if not eob_opt:
        return out
    czero = ei[0]                                        # (N,)
    skip = ei[1]
    has_eob = ei[2].astype(jnp.int32)                    # 0/1/2
    keep_blk = _eob_block_dp(
        czero.reshape(-1, bw), skip.reshape(-1, bw),
        has_eob.reshape(-1, bw),
        jnp.repeat(ac_si_f, (N // bw) // B, axis=0))      # (R, bw) bool
    keep_blk = keep_blk.reshape(-1)                       # (N,)
    return jnp.where(in_band & ~keep_blk[None, :],
                     jnp.int16(0), out)


# ---------------------------------------------------------------------------
# Arithmetic-coding trellis (quantize_trellis_arith, jcdctmgr.c:1333-1667).
#
# The master control starts the arithmetic entropy coder fresh for every
# trellis pass (jcmaster.c:698 start_pass resets the statistics bins), so
# jget_arith_rates always snapshots the state-0 probabilities: every rate
# bin carries the same two values r0/r1 derived from Qe(state 0) = 0x5A1D.
# Candidates are {qval, qval-1}; the AC rate is truncated to an INTEGER
# (`int rate;` jcdctmgr.c) before the distortion add.
# ---------------------------------------------------------------------------

def arith_state0_rates():
    """(r0, r1) float32 = -log2 P(decision) at coder state 0, with C's
    float/double mixing (jcarith.c:953-971)."""
    import math
    p_lps = np.float32((0x5A1D) / 46340.95)
    prob0 = np.float32(1.0 - np.float64(p_lps))
    r0 = np.float32(-math.log(np.float64(prob0)) / math.log(2.0))
    r1 = np.float32(-math.log(np.float64(p_lps)) / math.log(2.0))
    return float(r0), float(r1)


def _arith_ac_row_maker(Ss: int, Se: int, ac_K: int = 5):
    """Jitted AC trellis for one block row with ADAPTIVE rate tables
    (quantize_trellis_arith): ac_rates (256, 2) from the coder states."""

    @jax.jit
    def run(raw, qcoef, qtbl_zz, lam, ac_rates):
        N = raw.shape[1]
        pos = jnp.arange(64)[:, None]
        in_band = (pos >= Ss) & (pos <= Se)
        x = jnp.abs(raw)
        sign = jnp.where(raw < 0, -1, 1)
        q8_v = qtbl_zz.astype(jnp.int32) << 3
        q8 = q8_v[:, None]
        qval = (x + (q8 >> 1)) // q8                    # no clamp (arith)

        ltbl = _ltbl_lookup(qtbl_zz)
        zdist = _frnd(_frnd((x * x).astype(jnp.float32) * lam[None, :])
                      * ltbl[:, None])
        zterm = jnp.where(in_band, zdist, 0.0)

        def azd_step(c, i):
            c = c + zterm[i]
            return c, c

        _, azd = jax.lax.scan(azd_step, jnp.zeros((N,), jnp.float32),
                              jnp.arange(64))
        azd_prev = jnp.concatenate(
            [jnp.zeros((1, N), jnp.float32), azd[:-1]], axis=0)

        j_idx = jnp.arange(64)
        j_is_start = (j_idx == (Ss - 1))[:, None]
        j_nonzero = (qval != 0) & in_band
        j_valid_static = j_is_start | j_nonzero
        r_eob_j = ac_rates[3 * jnp.minimum(j_idx, 63), 0][:, None]

        init_acc = jnp.where(j_is_start, jnp.float32(0), BIG) \
            + jnp.zeros((1, N))
        init_A = jnp.zeros((64, 1), jnp.float32) + jnp.zeros((1, N))
        MAXNB = 14

        def coef_bits(v, i):
            vd = v - 1
            nb = _nbits(vd)
            st0 = 3 * (i - 1) + 2
            stl = jnp.where(i <= ac_K, 189, 217)
            cb = jnp.full(v.shape, jnp.float32(1.0))      # sign bit
            a1 = ac_rates[st0, 1]
            cb = cb + jnp.where(vd >= 1, a1, 0.0)
            cb = cb + jnp.where(vd >= 2, a1, 0.0)
            for k in range(3, MAXNB + 1):
                cb = cb + jnp.where(nb >= k, ac_rates[stl + (k - 3), 1],
                                    0.0)
            # final 0-decision state depends on nb
            nbv = jnp.arange(MAXNB + 1)
            zf_tab = jnp.where(nbv <= 1, ac_rates[st0, 0],
                               ac_rates[jnp.minimum(stl + nbv - 2, 255), 0])
            m_state = jnp.where(nbv <= 1, st0 + 14,
                                jnp.minimum(stl + nbv - 2, 241) + 14)
            m0_tab = ac_rates[m_state, 0]
            m1_tab = ac_rates[m_state, 1]
            cb = cb + zf_tab[nb]
            m0 = m0_tab[nb]
            m1 = m1_tab[nb]
            for p in range(MAXNB - 2, -1, -1):
                live = p <= nb - 2
                bit = (vd >> p) & 1
                cb = cb + jnp.where(live, jnp.where(bit == 1, m1, m0), 0.0)
            return cb

        def step(carry, i):
            acc, A = carry
            z_add = ac_rates[3 * jnp.maximum(i - 2, 0) + 1, 0]
            A = jnp.where((j_idx == i - 1)[:, None], r_eob_j, A + z_add)
            run_bits = A + ac_rates[3 * (i - 1) + 1, 1]

            qval_i = qval[i]
            x_i = x[i]
            tail = (azd_prev[i][None, :] - azd) + acc
            costs = []
            for cand, okc in ((qval_i, qval_i != 0),
                              (qval_i - 1, qval_i > 1)):
                delta = cand * q8_v[i] - x_i
                cdist = _frnd(_frnd((delta * delta).astype(jnp.float32)
                                    * lam) * ltbl[i])
                cb = coef_bits(jnp.maximum(cand, 1), i)
                rate = (cb[None, :] + run_bits).astype(jnp.int32) \
                    .astype(jnp.float32)        # `int rate` truncation
                cost = (rate + cdist[None, :]) + tail
                valid = ((j_valid_static & (j_idx < i)[:, None])
                         & okc[None, :])
                costs.append(jnp.where(valid, cost, BIG))
            # first minimum in the reference's (j, candidate) iteration
            # order (jcdctmgr.c:1552-1599: j outer, candidate inner,
            # strict less-than)
            flat = jnp.stack(costs, axis=1).reshape(128, N)
            arg = jnp.argmin(flat, axis=0)
            best = jnp.take_along_axis(flat, arg[None, :], axis=0)[0]
            bj = (arg // 2).astype(jnp.int32)
            bval = jnp.where(arg % 2 == 0, qval_i, qval_i - 1)
            new_acc_i = jnp.where(qval_i != 0, best, BIG)
            acc = acc.at[i].set(new_acc_i)
            return (acc, A), (bj, bval)

        (acc, _), (runstart_h, val_h) = jax.lax.scan(
            step, (init_acc, init_A), jnp.arange(Ss, Se + 1))
        steps = Se - Ss + 1
        run_start = jnp.zeros((64, N), jnp.int32) \
            .at[Ss:Se + 1].set(runstart_h)
        best_val = jnp.zeros((64, N), jnp.int32).at[Ss:Se + 1].set(val_h)

        azd_Se = azd[Se]
        eob_i = ac_rates[3 * jnp.minimum(jnp.maximum(pos[:, 0] - 1, 0), 63),
                         1][:, None]
        end_cost = ((acc + azd_Se[None, :]) - azd) \
            + jnp.where(pos < Se, eob_i, 0.0)
        end_cost = jnp.where(j_nonzero, end_cost, BIG)
        end_cost = end_cost.at[Ss - 1].set(azd_Se + ac_rates[0, 1])
        last_idx = jnp.argmin(end_cost, axis=0).astype(jnp.int32)

        def walk(cur, _):
            nxt = jnp.take_along_axis(
                run_start, jnp.maximum(cur, 0)[None, :], axis=0)[0]
            nxt = jnp.where(cur >= Ss, nxt, Ss - 1)
            return nxt, cur

        _, curs = jax.lax.scan(walk, last_idx, None, length=steps)
        curs_valid = jnp.where(curs >= Ss, curs, 64)
        keep = jnp.any(curs_valid[:, None, :] == j_idx[None, :, None],
                       axis=0)
        keep = keep & j_nonzero
        new_band = jnp.where(keep, best_val * sign, 0).astype(jnp.int16)
        return jnp.where(in_band, new_band, qcoef)

    return run


@functools.lru_cache(maxsize=8)
def _arith_ac_row(Ss, Se, ac_K=5):
    return _arith_ac_row_maker(Ss, Se, ac_K)


@functools.partial(jax.jit, static_argnums=(4,))
def _arith_dc_row(raw_dc, last_dc0, q0, dc_rates, nc: int, lam_dc=None):
    """DC trellis for one block row with adaptive rates and per-candidate
    context tracking (quantize_trellis_arith DC section)."""
    L = raw_dc.shape[0]
    q8 = q0 * 8
    sign = jnp.where(raw_dc < 0, -1, 1)
    x = jnp.abs(raw_dc)
    qval = (x + q8 // 2) // q8
    ks = jnp.arange(nc)
    cand_mag = qval[:, None] - nc // 2 + ks              # (L, nc), no clamp
    delta_q = cand_mag * q8 - x[:, None]
    dist = _frnd((delta_q * delta_q).astype(jnp.float32) * lam_dc[:, None])
    cand = cand_mag * sign[:, None]
    MAXNB = 15
    dcl = dc_rates[20:20 + MAXNB, 1]                     # ladder states

    def dc_bits_ctx(d, st0):
        """Rate walk + new context for delta d with start state st0."""
        nz = d != 0
        neg = d < 0
        ad = jnp.abs(d)
        vd = jnp.maximum(ad - 1, 0)
        nb = _nbits(vd)
        bits = jnp.where(nz, dc_rates[st0, 1], dc_rates[st0, 0])
        bits = bits + jnp.where(nz, jnp.where(neg, dc_rates[st0 + 1, 1],
                                              dc_rates[st0 + 1, 0]), 0.0)
        st1 = st0 + 2 + neg.astype(jnp.int32)
        bits = bits + jnp.where(nz & (vd >= 1), dc_rates[st1, 1], 0.0)
        for k in range(2, MAXNB + 1):
            bits = bits + jnp.where(nz & (nb >= k), dcl[k - 2], 0.0)
        stf = jnp.where(vd == 0, st1,
                        jnp.where(nb == 1, 20, 20 + nb - 1))
        bits = bits + jnp.where(nz, dc_rates[stf, 0], 0.0)
        stm = stf + 14
        m0 = dc_rates[stm, 0]
        m1 = dc_rates[stm, 1]
        for p in range(MAXNB - 2, -1, -1):
            live = nz & (p <= nb - 2)
            bit = (vd >> p) & 1
            bits = bits + jnp.where(live, jnp.where(bit == 1, m1, m0), 0.0)
        # context update (dc_L=0, dc_U=1 defaults): m>1 <=> nb>=2
        base = jnp.where(neg, 8, 4)
        ctx = jnp.where(nz, base + jnp.where(nb >= 2, 8, 0), 0)
        return bits, ctx

    def step(carry, t):
        acc, ctx = carry                                  # (nc,), (nc,)
        cand_t = cand[t]                                  # (nc,)
        dist_t = dist[t]
        prev = cand[jnp.maximum(t - 1, 0)]
        d = cand_t[None, :] - prev[:, None]               # (l, k)
        bits, newctx = dc_bits_ctx(d, ctx[:, None])
        cost = (bits + dist_t[None, :]) + acc[:, None]
        # first block: pred = last_dc0, state 0
        d0 = cand_t - last_dc0
        bits0, ctx0 = dc_bits_ctx(d0, jnp.zeros((nc,), jnp.int32) * 0)
        cost0 = bits0 + dist_t
        bt = jnp.argmin(cost, axis=0).astype(jnp.int32)
        new_acc = jnp.min(cost, axis=0)
        sel_ctx = jnp.take_along_axis(newctx, bt[None, :], axis=0)[0]
        new_acc = jnp.where(t == 0, cost0, new_acc)
        sel_ctx = jnp.where(t == 0, ctx0, sel_ctx)
        bt = jnp.where(t == 0, 0, bt)
        return (new_acc, sel_ctx), bt

    acc0 = jnp.zeros((nc,), jnp.float32)
    ctx0 = jnp.zeros((nc,), jnp.int32)
    (acc, _), bts = jax.lax.scan(step, (acc0, ctx0), jnp.arange(L))
    best = jnp.argmin(acc).astype(jnp.int32)

    def back(cur, t):
        val = cand[t, cur]
        nxt = jnp.where(t == 0, cur, bts[t, cur])
        return nxt, val

    _, vals = jax.lax.scan(back, best, jnp.arange(L - 1, -1, -1))
    out = jnp.flip(vals)
    return out, out[-1]


def arith_trellis_comps(ncomps: int, loops: int, bands: bool):
    """Which (comp, band) pairs the reference's arithmetic trellis passes
    actually quantize.  Arithmetic forces optimize_coding off
    (jcmaster.c:1088) and the resulting pass/scan bookkeeping only ever
    selects component 0 (and, with use_scans_in_trellis, only the first
    frequency band) — verified empirically against an instrumented
    reference build; chroma stays round-nearest.  Repeat passes over the
    same component are fixed points, so one visit suffices."""
    del ncomps, loops
    return [(0, 0)]
