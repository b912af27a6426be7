// Host-side RGB -> padded YCbCr planes with chroma downsampling.
//
// The remote-attached TPU tunnel moves ~20-50 MB/s of uint8 pixels; RGB
// input is 3 bytes/pixel but the encoder only consumes 1.5 (4:2:0). Doing
// the (cheap, exactly-integer) color conversion + downsample on host CPU
// halves the upload. Bit-exact against ops/color.py rgb_to_ycc
// (jccolor.c:214-241 semantics) and ops/sample.py downsample_h2v2/h2v1
// (jcsample.c bias patterns), including the edge-replication padding of
// ops/layout.py pad_plane.

#include <cstdint>
#include <thread>
#include <vector>

namespace {

constexpr int SCALEBITS = 16;
constexpr int ONE_HALF = 1 << (SCALEBITS - 1);
constexpr int CTR = 128 << SCALEBITS;

inline int FIX(double x) { return (int)(x * (1 << SCALEBITS) + 0.5); }

const int F29900 = FIX(0.29900), F58700 = FIX(0.58700),
          F11400 = FIX(0.11400), F16874 = FIX(0.16874),
          F33126 = FIX(0.33126), F50000 = FIX(0.50000),
          F41869 = FIX(0.41869), F08131 = FIX(0.08131);

inline void ycc(const uint8_t* p, int& y, int& cb, int& cr) {
  int r = p[0], g = p[1], b = p[2];
  y = (F29900 * r + F58700 * g + F11400 * b + ONE_HALF) >> SCALEBITS;
  cb = (-F16874 * r - F33126 * g + F50000 * b + CTR + ONE_HALF - 1)
       >> SCALEBITS;
  cr = (F50000 * r - F41869 * g - F08131 * b + CTR + ONE_HALF - 1)
       >> SCALEBITS;
}

struct Job {
  const uint8_t* rgb;
  int w, h;
  int hs, vs;                 // chroma subsample factors (2,2 / 2,1 / 1,1)
  int pw_y, ph_y, pw_c, ph_c;
  uint8_t *Y, *Cb, *Cr;
};

void run_rows(const Job& j, int y0, int y1) {
  // Y plane rows (edge-replicated to the padded grid)
  for (int py = y0; py < y1 && py < j.ph_y; py++) {
    int sy = py < j.h ? py : j.h - 1;
    const uint8_t* row = j.rgb + (long)sy * j.w * 3;
    uint8_t* out = j.Y + (long)py * j.pw_y;
    int yv, cbv, crv;
    for (int px = 0; px < j.w && px < j.pw_y; px++) {
      ycc(row + px * 3, yv, cbv, crv);
      out[px] = (uint8_t)yv;
    }
    uint8_t last = out[(j.w < j.pw_y ? j.w : j.pw_y) - 1];
    for (int px = j.w; px < j.pw_y; px++) out[px] = last;
  }
}

void run_chroma_rows(const Job& j, int cy0, int cy1) {
  // chroma planes in downsampled coordinates; source coords clamp to the
  // image edge (pad_plane replication happens BEFORE downsampling)
  auto cb_at = [&](int sy, int sx, int& cbv, int& crv) {
    if (sy >= j.h) sy = j.h - 1;
    if (sx >= j.w) sx = j.w - 1;
    int yv;
    ycc(j.rgb + ((long)sy * j.w + sx) * 3, yv, cbv, crv);
  };
  const int cw = (j.w + j.hs - 1) / j.hs;   // real downsampled width
  const int ch = (j.h + j.vs - 1) / j.vs;
  (void)cw;
  for (int cy = cy0; cy < cy1 && cy < j.ph_c; cy++) {
    // rows beyond the real downsampled height replicate the last real
    // DOWNSAMPLED row (pad_plane runs after the downsample); columns use
    // their true parity bias over edge-clamped SOURCE samples (pad_plane
    // pads the source width before the downsample)
    int sy = (cy < ch ? cy : ch - 1) * j.vs;
    uint8_t* ocb = j.Cb + (long)cy * j.pw_c;
    uint8_t* ocr = j.Cr + (long)cy * j.pw_c;
    for (int cx = 0; cx < j.pw_c; cx++) {
      int sx = cx * j.hs;                   // cb_at clamps each sample
      int cb00, cr00;
      if (j.hs == 2 && j.vs == 2) {
        int cb01, cb10, cb11, cr01, cr10, cr11;
        cb_at(sy, sx, cb00, cr00);
        cb_at(sy, sx + 1, cb01, cr01);
        cb_at(sy + 1, sx, cb10, cr10);
        cb_at(sy + 1, sx + 1, cb11, cr11);
        int bias = (cx & 1) ? 2 : 1;
        ocb[cx] = (uint8_t)((cb00 + cb01 + cb10 + cb11 + bias) >> 2);
        ocr[cx] = (uint8_t)((cr00 + cr01 + cr10 + cr11 + bias) >> 2);
      } else if (j.hs == 2 && j.vs == 1) {
        int cb01, cr01;
        cb_at(sy, sx, cb00, cr00);
        cb_at(sy, sx + 1, cb01, cr01);
        int bias = (cx & 1) ? 1 : 0;
        ocb[cx] = (uint8_t)((cb00 + cb01 + bias) >> 1);
        ocr[cx] = (uint8_t)((cr00 + cr01 + bias) >> 1);
      } else {                              // 1x1
        cb_at(sy, sx, cb00, cr00);
        ocb[cx] = (uint8_t)cb00;
        ocr[cx] = (uint8_t)cr00;
      }
    }
  }
}

}  // namespace

extern "C" long mj_prep_ycc(const uint8_t* rgb, int w, int h,
                            int hs, int vs,
                            int pw_y, int ph_y, int pw_c, int ph_c,
                            uint8_t* Y, uint8_t* Cb, uint8_t* Cr,
                            int nthreads) {
  Job j{rgb, w, h, hs, vs, pw_y, ph_y, pw_c, ph_c, Y, Cb, Cr};
  if (nthreads < 1) nthreads = 1;
  if (nthreads == 1) {
    run_rows(j, 0, ph_y);
    run_chroma_rows(j, 0, ph_c);
    return 0;
  }
  std::vector<std::thread> ts;
  int step = (ph_y + nthreads - 1) / nthreads;
  for (int t = 0; t < nthreads; t++)
    ts.emplace_back(run_rows, std::cref(j), t * step, (t + 1) * step);
  for (auto& t : ts) t.join();
  ts.clear();
  step = (ph_c + nthreads - 1) / nthreads;
  for (int t = 0; t < nthreads; t++)
    ts.emplace_back(run_chroma_rows, std::cref(j), t * step,
                    (t + 1) * step);
  for (auto& t : ts) t.join();
  return 0;
}
