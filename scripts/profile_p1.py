#!/usr/bin/env python
"""Break down p1 (color/sample/DCT/quant/norm/hist) on the live backend."""
import os, sys, time
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
import numpy as np
import jax, jax.numpy as jnp
from mozjpeg_tpu.utils import ppm
from mozjpeg_tpu.ops import color, sample, layout, dct, quant, dering, symbols
from mozjpeg_tpu.codec import pipeline_t

print("backend:", jax.default_backend(), file=sys.stderr)
B = 8
img = ppm.read(os.path.join(REPO, "corpus", "kodak_like_768x512_1.ppm"))
stack = jnp.asarray(np.stack([img] * B))

def _force(r):
    leaves = jax.tree_util.tree_leaves(r)
    np.asarray(jnp.sum(leaves[0].astype(jnp.float32)).reshape(1))

def bench(label, fn, *args, reps=10):
    _force(fn(*args))
    t0 = time.perf_counter()
    rs = [fn(*args) for _ in range(reps)]
    _force(rs[-1])
    dt = time.perf_counter() - t0
    t1 = time.perf_counter(); _force(rs[-1]); sync = time.perf_counter() - t1
    print("%-40s %8.2f ms" % (label, (dt - sync)/reps*1e3), file=sys.stderr)
    return rs[-1]

# full p1 batch
qt = [np.ones((8, 8), np.uint32) * 16, np.ones((8, 8), np.uint32) * 17]
f_all = jax.jit(lambda s: pipeline_t._p1_batch(
    s, 96, 64, tuple(pipeline_t.geometry(768, 512, [(2, 2), (1, 1), (1, 1)])[2]),
    True, 8, None, qts81=tuple(jnp.asarray(np.asarray(t).reshape(8, 8, 1)) for t in (qt[0], qt[1], qt[1]))))
bench("p1_batch full (B=8)", f_all, stack)

# parts (single image ops vmapped)
rgb = stack
bench("rgb_to_ycc (B=8)", jax.jit(jax.vmap(lambda x: color.rgb_to_ycc(x, 8))), rgb)
ycc = jax.vmap(lambda x: color.rgb_to_ycc(x, 8))(rgb)
y = ycc[..., 0]
bench("downsample_h2v2 (B=8)", jax.jit(jax.vmap(sample.downsample_h2v2)), y)
bench("blockify_t (B=8 Y)", jax.jit(jax.vmap(
    lambda p: layout.blockify_t(p.astype(jnp.int32) - 128))), y)
blocks = jax.vmap(lambda p: layout.blockify_t(p.astype(jnp.int32) - 128))(y)
bench("to_zigzag_t (B=8 Y)", jax.jit(jax.vmap(layout.to_zigzag_t)), blocks)
q81 = jnp.asarray(np.ones((8, 8, 1), np.int32) * 16)
bench("dering_t (B=8 Y)", jax.jit(jax.vmap(
    lambda b: dering.dering_t(layout.to_zigzag_t(b), q81[0, 0, 0]))), blocks)
bench("fdct_islow_t (B=8 Y)", jax.jit(jax.vmap(
    lambda b: dct.fdct_islow_t(b, 2))), blocks)
co = jax.vmap(lambda b: dct.fdct_islow_t(b, 2))(blocks)
bench("quantize_islow_t (B=8 Y)", jax.jit(jax.vmap(
    lambda c: quant.quantize_islow_t(c, q81))), co)
qz = jax.vmap(lambda c: quant.quantize_islow_t(c, q81))(co)
zz = jax.vmap(layout.to_zigzag_t)(qz)
raw = jax.vmap(layout.to_zigzag_t)(co)
bench("_norm_seq (B=8 Y)", jax.jit(jax.vmap(pipeline_t._norm_seq)), raw)
bench("ac_first_histogram_t (B=8 Y)", jax.jit(jax.vmap(
    lambda z: symbols.ac_first_histogram_t(z, 1, 63, 0))), zz)

# trellis at B=8
from mozjpeg_tpu.codec import trellis, encoder as E
from mozjpeg_tpu import consts, EncoderConfig
cfgr = EncoderConfig().resolved()
geom = pipeline_t.geometry(768, 512, [(2, 2), (1, 1), (1, 1)])
comps = tuple(geom[2])
merged, smalls = pipeline_t._p1_batch(stack, 96, 64, comps, True, 8, None,
    qts81=tuple(jnp.asarray(np.asarray(t).reshape(8, 8, 1)) for t in (qt[0], qt[1], qt[1])))
per_img = pipeline_t.unpack_small_batch((96, 64, comps), smalls, B)
lams, ac_sis, dc_sis, qtblzz, ncands = [], [], [], [], []
for ci in range(3):
    lam_imgs, ac_tbl_imgs = [], []
    for (norms, hists) in per_img:
        lam_imgs.append(trellis.lambda_from_norm(norms[ci], 14.75, 16.5))
        ac_si, dc_si = trellis.trellis_tables_from_hist(hists[ci], 0 if ci == 0 else 1, True)
        ac_tbl_imgs.append(ac_si)
    lams.append(np.concatenate(lam_imgs)); ac_sis.append(np.stack(ac_tbl_imgs)); dc_sis.append(dc_si)
    qz_ = np.asarray(qt[0] if ci == 0 else qt[1]).reshape(64)[consts.JPEG_ZIGZAG].astype(np.int32)
    qtblzz.append(qz_); ncands.append(trellis.get_num_dc_candidates(int(qz_[0])))
packed = jnp.asarray(trellis.pack_trellis_inputs(lams, ac_sis, dc_sis, qtblzz))
for upal, label in ((True, "pallas"), (False, "xla")):
    run = trellis.make_trellis_all_t(comps, None, ((1, 63),), True,
                                     tuple(ncands), batch=B, precision=8,
                                     eob_opt=False, delta_w=0.0,
                                     use_pallas=upal, interpret=False)
    bench("trellis all comps B=8 (%s)" % label, run,
          tuple(m[1] for m in merged), tuple(m[0] for m in merged), packed)
