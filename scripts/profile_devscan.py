#!/usr/bin/env python
"""Profile the device-scanopt batch path on the live backend."""
import os, sys, time
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
import numpy as np
import jax
from mozjpeg_tpu.utils import ppm
from mozjpeg_tpu import EncoderConfig, encode_many

B = int(os.environ.get("B", "4"))
names = ["kodak_like_768x512_%d.ppm" % (i % 4 + 1) for i in range(B)]
corpus = [ppm.read(os.path.join(REPO, "corpus", n)) for n in names]
# make images distinct so nothing dedupes
for i, im in enumerate(corpus):
    corpus[i] = np.roll(im, i * 13, axis=1).copy()
mp = sum(i.shape[0] * i.shape[1] for i in corpus) / 1e6
print("backend:", jax.default_backend(), "B =", B, file=sys.stderr)

cfg = EncoderConfig(quality=75, device_scanopt=True)
t0 = time.perf_counter(); out = encode_many(corpus, cfg)
print("cold: %.1f s" % (time.perf_counter()-t0), file=sys.stderr)
for r in range(3):
    t0 = time.perf_counter(); out = encode_many(corpus, cfg)
    dt = time.perf_counter()-t0
    print("warm: %.2f s -> %.2f MP/s" % (dt, mp/dt), file=sys.stderr)

# phase-level
from mozjpeg_tpu.codec import encoder as E, pipeline_t, trellis, scanopt_dev
from mozjpeg_tpu import consts
import jax.numpy as jnp
cfg_o = cfg
cfgr = cfg.resolved()
_, cfgr, cs, ncomps, samp, qt = E._resolve(corpus[0], cfg, {})
stack = np.stack(corpus)
for rep in range(2):
    t0 = time.perf_counter()
    geom, merged, smalls = pipeline_t.run_p1_batch(stack, samp, qt, cfgr.overshoot_deringing, cfgr.precision)
    jax.block_until_ready(smalls)
    t1 = time.perf_counter(); print("p1_batch+small: %.1f ms" % ((t1-t0)*1e3), file=sys.stderr)
    b = len(corpus)
    per_img = pipeline_t.unpack_small_batch(geom, smalls, b)
    mcus_x, mcus_y, comps = geom
    lams, ac_sis, dc_sis, qtblzz, ncands = [], [], [], [], []
    for ci in range(ncomps):
        lam_imgs, ac_tbl_imgs = [], []
        slot = 0 if ci == 0 else 1
        for (norms, hists) in per_img:
            lam_imgs.append(trellis.lambda_from_norm(norms[ci], cfgr.lambda_log_scale1, cfgr.lambda_log_scale2))
            ac_si, dc_si = trellis.trellis_tables_from_hist(hists[ci], slot, True)
            ac_tbl_imgs.append(ac_si)
        lams.append(np.concatenate(lam_imgs)); ac_sis.append(np.stack(ac_tbl_imgs)); dc_sis.append(dc_si)
        qz = np.asarray(qt[0] if ci == 0 else qt[1]).reshape(64)[consts.JPEG_ZIGZAG].astype(np.int32)
        qtblzz.append(qz); ncands.append(trellis.get_num_dc_candidates(int(qz[0])))
    packed = jnp.asarray(trellis.pack_trellis_inputs(lams, ac_sis, dc_sis, qtblzz))
    t2 = time.perf_counter(); print("host tablegen+upload: %.1f ms" % ((t2-t1)*1e3), file=sys.stderr)
    upal, uint = trellis.ac_impl_flags(cfgr.precision)
    tcomps = E._trellis_comps(cfgr, cs, comps)
    run = trellis.make_trellis_all_t(tuple(tcomps), None, ((1,63),), cfgr.trellis_quant_dc,
                                     tuple(ncands), batch=b, precision=8,
                                     eob_opt=cfgr.trellis_eob_opt,
                                     delta_w=float(cfgr.trellis_delta_dc_weight),
                                     use_pallas=upal, interpret=uint)
    finals = run(tuple(m[1] for m in merged), tuple(m[0] for m in merged), packed)
    jax.block_until_ready(finals)
    t3 = time.perf_counter(); print("trellis: %.1f ms" % ((t3-t2)*1e3), file=sys.stderr)
    prog = scanopt_dev._sizes_program(ncomps, cfgr.dc_scan_opt_mode, tuple(comps), b, mcus_x, mcus_y)
    sidecar_dev = prog(finals)
    sidecar = np.asarray(sidecar_dev)
    t4 = time.perf_counter(); print("PROG-SIZES+download %.2fMB: %.1f ms" % (sidecar.nbytes/1e6, (t4-t3)*1e3), file=sys.stderr)
    outs = scanopt_dev.encode_batch_scans(
        [im.shape[1] for im in corpus], [im.shape[0] for im in corpus],
        geom, finals, qt, cfgr, ncomps, b)
    t5 = time.perf_counter(); print("full scanopt_dev (incl sizes again): %.1f ms" % ((t5-t4)*1e3), file=sys.stderr)
    print("total: %.1f ms -> %.2f MP/s" % ((t5-t0)*1e3, mp/(t5-t0)), file=sys.stderr)
