// Decode-side host helpers for the batched/pipelined decode path.
//
// 1) Sparse coefficient UPLOAD packing (the mirror of entropy.cpp
//    mj_sparse_expand, which serves the encode-side download): quantized
//    planes are ~90% zero, and the remote-TPU tunnel charges per byte, so
//    the host packs [per-block 64-bit nonzero masks | superblock-compacted
//    values] and the device expands with one-hot matmuls
//    (ops/sparsepack.py expand_dev).
//
// 2) Post-render upsample + color conversion: the device returns
//    subsampled YCbCr sample planes (1.5 B/px for 4:2:0 instead of 3 B/px
//    RGB) and the host finishes with the exact integer fancy/replicate
//    upsample (reference: jdsample.c h2v2_fancy_upsample:316,
//    h2v1_fancy_upsample:276, int_upsample:244) and YCbCr->RGB
//    (jdcolor.c ycc_rgb_convert, build_ycc_rgb_table:215) — the same math
//    as ops/sample.py / ops/color.py, which are pinned bit-exact vs djpeg
//    by tests/. This is the decode twin of prep.cpp's encode-side prep.
//    mj_post_ycc is this framework's MERGED upsample+color path
//    (jdmerge.c h2v1/h2v2_merged_upsample:305,350): one streaming pass
//    per output row upsamples the chroma rows and converts to RGB in the
//    same loop — no intermediate full-size chroma planes are ever
//    materialized.
#include <cstdint>
#include <cstring>

namespace {

// --- sparse pack ---------------------------------------------------------

inline uint64_t block_mask(const int16_t* blk) {
  uint64_t m = 0;
  for (int k = 0; k < 64; k++)
    if (blk[k]) m |= (uint64_t)1 << k;
  return m;
}

}  // namespace

// planes: (nblocks, 64) int16 zigzag, block-major (image-major, components
// in order, raster blocks; zero-padded to a multiple of g).
// out_counts: per-superblock nonzero totals (nblocks/g entries).
// Returns the max per-superblock count; the caller picks the smallest
// static capacity bucket >= max (no device-side overflow possible).
extern "C" long mj_sparse_count(const int16_t* planes, long nblocks, int g,
                                int32_t* out_counts) {
  const long S = nblocks / g;
  long maxc = 0;
  for (long s = 0; s < S; s++) {
    int32_t c = 0;
    const int16_t* p = planes + s * (long)g * 64;
    for (long k = 0; k < (long)g * 64; k++) c += (p[k] != 0);
    out_counts[s] = c;
    if (c > maxc) maxc = c;
  }
  return maxc;
}

// Pack masks + superblock value slabs. vals slab for superblock s holds its
// blocks' nonzero values in (block, zigzag) order starting at s*cap_sb;
// unused slots stay zero. Caller guarantees cap_sb >= max superblock count
// (via mj_sparse_count); returns -(s+1) if that is violated.
extern "C" long mj_sparse_pack(const int16_t* planes, long nblocks, int g,
                               int cap_sb, uint32_t* out_masks,
                               int16_t* out_vals) {
  const long S = nblocks / g;
  memset(out_vals, 0, (size_t)S * cap_sb * sizeof(int16_t));
  for (long s = 0; s < S; s++) {
    int16_t* v = out_vals + s * (long)cap_sb;
    long used = 0;
    for (int j = 0; j < g; j++) {
      const long b = s * g + j;
      const int16_t* blk = planes + b * 64;
      uint64_t m = block_mask(blk);
      out_masks[b * 2] = (uint32_t)m;
      out_masks[b * 2 + 1] = (uint32_t)(m >> 32);
      while (m) {
        int k = __builtin_ctzll(m);
        if (used >= cap_sb) return -(s + 1);
        v[used++] = blk[k];
        m &= m - 1;
      }
    }
  }
  return 0;
}

// --- post-render upsample + color ---------------------------------------

namespace {

constexpr int SCALEBITS = 16;
constexpr int ONE_HALF = 1 << (SCALEBITS - 1);
constexpr int FIX_1_40200 = 91881;
constexpr int FIX_1_77200 = 116130;
constexpr int FIX_0_34414 = 22554;
constexpr int FIX_0_71414 = 46802;

inline uint8_t clamp255(int v) {
  return (uint8_t)(v < 0 ? 0 : (v > 255 ? 255 : v));
}

// Fancy 2x horizontal upsample of one row (jdsample.c:276-306 semantics;
// ops/sample.py upsample_h2v1_fancy): writes min(2*cw, width) samples.
inline void fancy_h2_row(const int* in, long cw, long width, int* out,
                         int add_even, int add_odd, int shift,
                         int first, int last) {
  long n = 2 * cw < width ? 2 * cw : width;
  for (long j = 0; j < n; j++) {
    long i = j >> 1;
    int v;
    if (j == 0)
      v = first;
    else if (j == 2 * cw - 1)
      v = last;
    else if ((j & 1) == 0)
      v = (3 * in[i] + in[i - 1] + add_even) >> shift;
    else
      v = (3 * in[i] + in[i + 1] + add_odd) >> shift;
    out[j] = v;
  }
}

// Build the upsampled chroma row r (length >= width) into `row`.
// mode: 0 none, 1 h2v1 fancy, 2 h2v2 fancy, 3 int replicate.
void chroma_row(const uint8_t* pl, long ch, long cw, int mode, int hexp,
                int vexp, long r, long width, int* row, int* tmp) {
  switch (mode) {
    case 0: {
      for (long j = 0; j < width; j++) row[j] = pl[r * cw + j];
      break;
    }
    case 1: {
      const uint8_t* in = pl + r * cw;
      for (long j = 0; j < cw; j++) tmp[j] = in[j];
      fancy_h2_row(tmp, cw, width, row, 1, 2, 2, tmp[0], tmp[cw - 1]);
      break;
    }
    case 2: {
      long ir = r >> 1;
      long far = (r & 1) ? (ir + 1 < ch ? ir + 1 : ch - 1)
                         : (ir > 0 ? ir - 1 : 0);
      const uint8_t* a = pl + ir * cw;
      const uint8_t* b = pl + far * cw;
      for (long j = 0; j < cw; j++) tmp[j] = 3 * a[j] + b[j];
      fancy_h2_row(tmp, cw, width, row, 8, 7, 4, (tmp[0] * 4 + 8) >> 4,
                   (tmp[cw - 1] * 4 + 7) >> 4);
      break;
    }
    default: {  // int replicate (jdsample.c int_upsample)
      const uint8_t* in = pl + (r / vexp) * cw;
      for (long j = 0; j < width; j++) row[j] = in[j / hexp];
      break;
    }
  }
}

}  // namespace

// y: (yh, yw) full-size luma samples; cb/cr: (ch, cw) chroma samples.
// out: (height, width, 3) RGB. Requires yw >= width, yh >= height and the
// upsampled chroma to cover (height, width) (callers pass the natural
// component dims). Single image; callers parallelize across images.
extern "C" void mj_post_ycc(const uint8_t* y, long yh, long yw,
                            const uint8_t* cb, const uint8_t* cr, long ch,
                            long cw, int mode, int hexp, int vexp,
                            long height, long width, uint8_t* out) {
  (void)yh;
  int* ub = new int[2 * cw + width + 2];
  int* ur = new int[2 * cw + width + 2];
  int* tmp = new int[cw > width ? cw : width];
  for (long r = 0; r < height; r++) {
    chroma_row(cb, ch, cw, mode, hexp, vexp, r, width, ub, tmp);
    chroma_row(cr, ch, cw, mode, hexp, vexp, r, width, ur, tmp);
    const uint8_t* yrow = y + r * yw;
    uint8_t* o = out + r * width * 3;
    for (long j = 0; j < width; j++) {
      int yv = yrow[j];
      int cbv = ub[j] - 128;
      int crv = ur[j] - 128;
      o[3 * j + 0] = clamp255(yv + ((FIX_1_40200 * crv + ONE_HALF) >> SCALEBITS));
      o[3 * j + 1] = clamp255(
          yv + ((-FIX_0_34414 * cbv - FIX_0_71414 * crv + ONE_HALF) >>
                SCALEBITS));
      o[3 * j + 2] = clamp255(yv + ((FIX_1_77200 * cbv + ONE_HALF) >> SCALEBITS));
    }
  }
  delete[] ub;
  delete[] ur;
  delete[] tmp;
}
