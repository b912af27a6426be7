#!/usr/bin/env python
"""Profile the batched encode path phase by phase, plus host-emit scanopt."""
import os, sys, time
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np
import jax
from mozjpeg_tpu.utils import ppm
from mozjpeg_tpu import EncoderConfig, encode_many

names = ["kodak_like_768x512_%d.ppm" % i for i in (1, 2, 3, 4)]
corpus = [ppm.read(os.path.join(REPO, "corpus", n)) for n in names]
print("backend:", jax.default_backend(), file=sys.stderr)

# --- current default (device_entropy auto) ---
config = EncoderConfig(quality=75)
t0 = time.perf_counter(); out1 = encode_many(corpus, config)
print("cold batched (dev-entropy): %.1f s" % (time.perf_counter()-t0), file=sys.stderr)
t0 = time.perf_counter(); out1 = encode_many(corpus, config)
print("warm batched (dev-entropy): %.2f s" % (time.perf_counter()-t0), file=sys.stderr)

# --- host entropy ---
config2 = EncoderConfig(quality=75, device_entropy=False)
t0 = time.perf_counter(); out2 = encode_many(corpus, config2)
print("cold batched (host-entropy): %.1f s" % (time.perf_counter()-t0), file=sys.stderr)
for _ in range(3):
    t0 = time.perf_counter(); out2 = encode_many(corpus, config2)
    dt = time.perf_counter()-t0
mp = sum(i.shape[0]*i.shape[1] for i in corpus)/1e6
print("warm batched (host-entropy): %.2f s -> %.2f MP/s" % (dt, mp/dt), file=sys.stderr)
print("byte equal:", all(a==b for a,b in zip(out1,out2)), file=sys.stderr)

# phase-level on the batch path
from mozjpeg_tpu.codec import encoder as E, pipeline_t, trellis
cfg_o = config2
cfg = config2.resolved()
_, cfgr, cs, ncomps, samp, qt = E._resolve(corpus[0], config2, {})
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
    from mozjpeg_tpu import consts
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
    import jax.numpy as jnp
    packed = jnp.asarray(trellis.pack_trellis_inputs(lams, ac_sis, dc_sis, qtblzz))
    t2 = time.perf_counter(); print("host tablegen: %.1f ms" % ((t2-t1)*1e3), file=sys.stderr)
    upal, uint = trellis.ac_impl_flags(cfgr.precision)
    tcomps = E._trellis_comps(cfgr, cs, comps)
    run = trellis.make_trellis_all_t(tuple(tcomps), None, ((1,63),), cfgr.trellis_quant_dc,
                                     tuple(ncands), batch=b, precision=8,
                                     eob_opt=cfgr.trellis_eob_opt,
                                     delta_w=float(cfgr.trellis_delta_dc_weight),
                                     use_pallas=upal, interpret=uint)
    finals = run(tuple(m[1] for m in merged), tuple(m[0] for m in merged), packed)
    jax.block_until_ready(finals)
    t3 = time.perf_counter(); print("trellis dispatch+wait: %.1f ms" % ((t3-t2)*1e3), file=sys.stderr)
    flat_dev = pipeline_t._pack_all_batch(tuple(finals), tuple(comps), b)
    jax.block_until_ready(flat_dev)
    t4 = time.perf_counter(); print("pack: %.1f ms" % ((t4-t3)*1e3), file=sys.stderr)
    flat_h = np.asarray(flat_dev)
    t5 = time.perf_counter(); print("download %.1fMB: %.1f ms" % (flat_h.nbytes/1e6, (t5-t4)*1e3), file=sys.stderr)
    per_image_planes = pipeline_t.split_flat_batch(geom, flat_h, b)
    restart = 0
    from concurrent.futures import ThreadPoolExecutor
    with ThreadPoolExecutor(max_workers=4) as ex:
        futs = [ex.submit(E._phase_entropy, img.shape[1], img.shape[0], geom,
                          planes, qt, cfg_o, cfgr, ncomps, restart)
                for img, planes in zip(corpus, per_image_planes)]
        outs = [f.result() for f in futs]
    t6 = time.perf_counter(); print("host entropy x4 (4 threads): %.1f ms" % ((t6-t5)*1e3), file=sys.stderr)
    print("total: %.1f ms -> %.2f MP/s" % ((t6-t0)*1e3, mp/(t6-t0)), file=sys.stderr)

# single-image scanopt host cost, serial, for reference
from mozjpeg_tpu.entropy import encode as entenc
t0 = time.perf_counter()
E._phase_entropy(corpus[0].shape[1], corpus[0].shape[0], geom, per_image_planes[0], qt, cfg_o, cfgr, ncomps, 0)
print("scanopt 1 image 1 thread: %.1f ms" % ((time.perf_counter()-t0)*1e3), file=sys.stderr)
