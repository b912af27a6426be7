// Lossless sample-plane pack for the tunnel: left-predicted deltas,
// zigzag-mapped, packed per 16-sample subtile at the subtile's exact
// bit width (0..8 bits/sample, 4-bit header nibble per subtile).
//
// The remote attachment moves ~20-70 MB/s; prepped YCbCr planes are the
// encode pipeline's last 1.5 B/px upload and the decode pipeline's last
// 1.5 B/px download. Measured on the bench corpus (grainy mosaics —
// delta entropy 4.35 bits): ~0.94 B/px total, lossless; smoother photos
// pack tighter. The device twin (ops/planepack.py) packs/expands the
// same layout bit-for-bit with dense vector ops. Format, per image:
//
//   stream   = concatenated padded sample planes, 1-D uint8
//   delta[i] = (s[i] - s[i-1]) mod 256   (s[-1] = 128)
//   z[i]     = int8 zigzag of delta      (0,1,255 -> 0,2,1)
//   subtiles of 16 samples (tail zero-padded); per subtile
//   w        = nbits(max z) in 0..8
//   payload  = ceil(16*w/32) u32 words; sample k occupies bits
//              [k*w, k*w+w) of the subtile's big-endian bit window
//   header   = per-subtile width nibble (2 per byte, even subtile in
//              the high nibble) + total word count
#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

namespace {

inline uint8_t zz_of(uint8_t d8) {
  int8_t ds = (int8_t)d8;
  return (uint8_t)((ds << 1) ^ (ds >> 7));
}

inline uint8_t un_zz(uint8_t z) {
  return (uint8_t)((z >> 1) ^ (uint8_t)(-(int)(z & 1)));
}

inline int nbits8(uint8_t v) {
  return v ? 32 - __builtin_clz((uint32_t)v) : 0;
}

constexpr int T = 16;
const int WPS[9] = {0, 1, 1, 2, 2, 3, 3, 4, 4};  // words per subtile

}  // namespace

extern "C" {

// samples (total,) u8 -> widths (nst,) u8 (one byte per subtile here;
// nibble packing happens at the wire), words (<= nst*4) u32.
// Returns the word count. nst = (total + 15) / 16.
long mj_plane_pack(const uint8_t* samples, long total, uint8_t* widths,
                   uint32_t* words, int nthreads) {
  long nst = (total + T - 1) / T;
  std::vector<uint8_t> z((size_t)nst * T, 0);
  auto zrange = [&](long a, long b) {
    for (long i = a; i < b && i < total; i++) {
      uint8_t prev = i ? samples[i - 1] : 128;
      z[i] = zz_of((uint8_t)(samples[i] - prev));
    }
  };
  if (nthreads > 1 && total > (1 << 16)) {
    std::vector<std::thread> ts;
    long step = (total + nthreads - 1) / nthreads;
    for (int t = 0; t < nthreads; t++)
      ts.emplace_back(zrange, t * step, (t + 1) * step);
    for (auto& t : ts) t.join();
  } else {
    zrange(0, total);
  }
  long off = 0;
  for (long t = 0; t < nst; t++) {
    const uint8_t* zt = z.data() + t * T;
    uint8_t mx = 0;
    for (int k = 0; k < T; k++) mx = zt[k] > mx ? zt[k] : mx;
    int w = nbits8(mx);
    widths[t] = (uint8_t)w;
    if (w) {
      int nw = WPS[w];
      uint32_t acc[4] = {0, 0, 0, 0};
      for (int k = 0; k < T; k++) {
        int bo = k * w, i0 = bo >> 5, sh = bo & 31;
        uint32_t v = zt[k] & ((1u << w) - 1);
        if (sh + w <= 32) {
          acc[i0] |= v << (32 - sh - w);
        } else {
          int w2 = w - (32 - sh);
          acc[i0] |= v >> w2;
          acc[i0 + 1] |= v << (32 - w2);
        }
      }
      for (int j = 0; j < nw; j++) words[off + j] = acc[j];
      off += nw;
    }
  }
  return off;
}

// widths (nst,) u8 + words -> samples (total,) u8 (the exact inverse).
long mj_plane_expand(const uint8_t* widths, const uint32_t* words,
                     long nst, long total, uint8_t* samples) {
  uint8_t prev = 128;
  long i = 0, off = 0;
  for (long t = 0; t < nst; t++) {
    int w = widths[t];
    if (w > 8) return 1;
    int lim = (int)(total - i < T ? total - i : T);
    if (w == 0) {
      for (int k = 0; k < lim; k++) samples[i + k] = prev;
    } else {
      const uint32_t* tw = words + off;
      off += WPS[w];
      for (int k = 0; k < lim; k++) {
        int bo = k * w, i0 = bo >> 5, sh = bo & 31;
        uint32_t v;
        if (sh + w <= 32) {
          v = (tw[i0] >> (32 - sh - w)) & ((1u << w) - 1);
        } else {
          int w2 = w - (32 - sh);
          v = ((tw[i0] << w2) | (tw[i0 + 1] >> (32 - w2)))
              & ((1u << w) - 1);
        }
        prev = (uint8_t)(prev + un_zz((uint8_t)v));
        samples[i + k] = prev;
      }
    }
    i += lim;
    if (i >= total) break;
  }
  return 0;
}

}  // extern "C"
