// Host (CPU) encode engine: islow FDCT + overshoot deringing + trellis
// quantization, scalar per block, threaded over block rows.
//
// This is the LOW-LATENCY twin of the device pipeline: a serial
// `encode()` on a remote-attached TPU pays two ~25-50 ms tunnel round
// trips plus program dispatch per image, which caps it near 3 MP/s no
// matter how fast the chip is; the host engine encodes a single image in
// ~tens of ms with zero warmup. Byte-identical by construction to the
// device path — the float semantics below mirror ops/dct.py,
// ops/dering.py and codec/trellis.py exactly (which are themselves
// byte-exact vs the reference /root/reference/jcdctmgr.c) — and pinned
// by tests that diff the two engines across the config matrix.
//
// Float exactness rules (see codec/trellis.py _frnd): every f32 product
// must round before feeding an add, so this translation unit relies on
// -ffp-contract=off (native/build.py BASE_FLAGS) to forbid FMA
// contraction; all accumulations follow the same operand order as the
// device formulation.

#include <cmath>
#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

namespace {

constexpr float BIGF = 1e38f;

inline int nbits(int32_t v) {  // JPEG_NBITS for v >= 0
  return v > 0 ? 32 - __builtin_clz((uint32_t)v) : 0;
}

// ---------------------------------------------------------------------
// islow forward DCT (LLM fixed point, CONST_BITS=13 / PASS1_BITS=2;
// semantics of ops/dct.py fdct_islow == /root/reference/jfdctint.c)
// ---------------------------------------------------------------------

constexpr int CONST_BITS = 13;
constexpr int F_0_298631336 = 2446, F_0_390180644 = 3196,
              F_0_541196100 = 4433, F_0_765366865 = 6270,
              F_0_899976223 = 7373, F_1_175875602 = 9633,
              F_1_501321110 = 12299, F_1_847759065 = 15137,
              F_1_961570560 = 16069, F_2_053119869 = 16819,
              F_2_562915447 = 20995, F_3_072711026 = 25172;

inline int32_t descale(int32_t x, int n) {
  return (x + (1 << (n - 1))) >> n;
}

// one 1-D pass over d[0..7]; pass1: shift_even = PASS1_BITS (left shift),
// pass2: shift_even < 0 -> descale by -shift_even
void fdct_pass(int32_t* d, int stride, int shift_even, int descale_n) {
  int32_t tmp0 = d[0 * stride] + d[7 * stride];
  int32_t tmp7 = d[0 * stride] - d[7 * stride];
  int32_t tmp1 = d[1 * stride] + d[6 * stride];
  int32_t tmp6 = d[1 * stride] - d[6 * stride];
  int32_t tmp2 = d[2 * stride] + d[5 * stride];
  int32_t tmp5 = d[2 * stride] - d[5 * stride];
  int32_t tmp3 = d[3 * stride] + d[4 * stride];
  int32_t tmp4 = d[3 * stride] - d[4 * stride];

  int32_t tmp10 = tmp0 + tmp3, tmp13 = tmp0 - tmp3;
  int32_t tmp11 = tmp1 + tmp2, tmp12 = tmp1 - tmp2;

  if (shift_even >= 0) {
    d[0 * stride] = (tmp10 + tmp11) << shift_even;
    d[4 * stride] = (tmp10 - tmp11) << shift_even;
  } else {
    d[0 * stride] = descale(tmp10 + tmp11, -shift_even);
    d[4 * stride] = descale(tmp10 - tmp11, -shift_even);
  }

  int32_t z1 = (tmp12 + tmp13) * F_0_541196100;
  d[2 * stride] = descale(z1 + tmp13 * F_0_765366865, descale_n);
  d[6 * stride] = descale(z1 + tmp12 * (-F_1_847759065), descale_n);

  z1 = tmp4 + tmp7;
  int32_t z2 = tmp5 + tmp6;
  int32_t z3 = tmp4 + tmp6;
  int32_t z4 = tmp5 + tmp7;
  int32_t z5 = (z3 + z4) * F_1_175875602;

  tmp4 *= F_0_298631336;
  tmp5 *= F_2_053119869;
  tmp6 *= F_3_072711026;
  tmp7 *= F_1_501321110;
  z1 *= -F_0_899976223;
  z2 *= -F_2_562915447;
  z3 = z3 * (-F_1_961570560) + z5;
  z4 = z4 * (-F_0_390180644) + z5;

  d[7 * stride] = descale(tmp4 + z1 + z3, descale_n);
  d[5 * stride] = descale(tmp5 + z2 + z4, descale_n);
  d[3 * stride] = descale(tmp6 + z2 + z3, descale_n);
  d[1 * stride] = descale(tmp7 + z1 + z4, descale_n);
}

void fdct_islow(int32_t* b, int pass1_bits) {
  for (int r = 0; r < 8; r++)
    fdct_pass(b + 8 * r, 1, pass1_bits, CONST_BITS - pass1_bits);
  for (int c = 0; c < 8; c++)
    fdct_pass(b + c, 8, -pass1_bits, CONST_BITS + pass1_bits);
}

// natural index of zigzag position i (jpeg_natural_order)
const int ZZ[64] = {
    0,  1,  8,  16, 9,  2,  3,  10, 17, 24, 32, 25, 18, 11, 4,  5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6,  7,  14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63};

// zigzag position of natural index n (for the norm accumulation order)
struct ZOfNat {
  int z[64];
  ZOfNat() {
    for (int i = 0; i < 64; i++) z[ZZ[i]] = i;
  }
};
const ZOfNat Z_OF_NAT;

// ---------------------------------------------------------------------
// overshoot deringing on zigzag samples (ops/dering.py semantics ==
// /root/reference/jcdctmgr.c:416-498 preprocess_deringing)
// ---------------------------------------------------------------------

constexpr int MAXS = 127;  // 255 - CENTERJSAMPLE

void dering_block(int32_t* s /*64, zigzag, centered*/, int q0) {
  bool m[64];
  int32_t total = 0;
  int cnt = 0;
  for (int i = 0; i < 64; i++) {
    total += s[i];
    m[i] = s[i] >= MAXS;
    cnt += m[i];
  }
  if (cnt == 0 || cnt == 64) return;
  int headroom = (MAXS * 64 - total) / cnt;  // trunc toward zero, like C
  int cap = 2 * q0 < 31 ? 2 * q0 : 31;
  if (headroom < cap) cap = headroom;
  int maxovershoot = MAXS + cap;

  int a = 0;
  while (a < 64) {
    if (!m[a]) {
      a++;
      continue;
    }
    int b = a;
    while (b < 64 && m[b]) b++;
    // edge samples with the device's hold/seed clamping
    int f1 = a > 0 ? s[a - 1] : s[0];
    int f2 = a >= 2 ? s[a - 2] : s[0];
    int l1 = b < 64 ? s[b] : s[63];
    int l2 = b + 1 < 64 ? s[b + 1] : s[63];
    int fslope = f1 - f2 > MAXS - f1 ? f1 - f2 : MAXS - f1;
    int lslope = l1 - l2 > MAXS - l1 ? l1 - l2 : MAXS - l1;
    if (a == 0) fslope = lslope;
    if (b == 64) lslope = fslope;  // a==0 && b==64 means cnt==64: skipped
    int length = b - a;
    float step = 1.0f / (float)(length + 1);
    int32_t tan1 = fslope * length;
    int32_t tan2 = -lslope * length;
    float t = 0.0f;
    for (int i = a; i < b; i++) {
      t = (i == a) ? step : t + step;
      float t2 = t * t;
      float t3 = t2 * t;
      float cf1 = (2.0f * t3 - 3.0f * t2) + 1.0f;
      float cf2 = -2.0f * t3 + 3.0f * t2;
      float cf3 = (t3 - 2.0f * t2) + t;
      float cf4 = t3 - t2;
      float val = (((float)MAXS * cf1 + (float)tan1 * cf3)
                   + (float)MAXS * cf2)
                  + (float)tan2 * cf4;
      int nv = (int)std::ceil(val);
      s[i] = nv < maxovershoot ? nv : maxovershoot;
    }
    a = b;
  }
}

// ---------------------------------------------------------------------
// p1: samples -> dering -> FDCT -> quantize; per-block zigzag outputs
// ---------------------------------------------------------------------

struct P1Job {
  const uint8_t* plane;  // padded sample plane, stride pw
  int pw, bw, bh;
  const int32_t* qtbl_zz;  // 64, zigzag order
  int dering_on, precision;
  int16_t* q_zz;    // (bw*bh, 64)
  int32_t* raw_zz;  // (bw*bh, 64)
  float* norms;     // (bw*bh,)
};

void p1_rows(const P1Job& j, int r0, int r1) {
  const int center = 1 << (j.precision - 1);
  const int pass1_bits = j.precision == 8 ? 2 : 1;
  const int maxc = (1 << (j.precision + 2)) - 1;
  int32_t blk[64], zzs[64];
  for (int br = r0; br < r1 && br < j.bh; br++) {
    for (int bc = 0; bc < j.bw; bc++) {
      const uint8_t* src = j.plane + (long)br * 8 * j.pw + bc * 8;
      for (int y = 0; y < 8; y++)
        for (int x = 0; x < 8; x++)
          blk[y * 8 + x] = (int32_t)src[y * j.pw + x] - center;
      if (j.dering_on) {
        for (int i = 0; i < 64; i++) zzs[i] = blk[ZZ[i]];
        dering_block(zzs, j.qtbl_zz[0]);
        for (int i = 0; i < 64; i++) blk[ZZ[i]] = zzs[i];
      }
      fdct_islow(blk, pass1_bits);
      long n = (long)br * j.bw + bc;
      int16_t* q = j.q_zz + n * 64;
      int32_t* raw = j.raw_zz + n * 64;
      for (int i = 0; i < 64; i++) {
        int32_t c = blk[ZZ[i]];
        raw[i] = c;
        int32_t qv = j.qtbl_zz[i] << 3;
        int32_t a = c < 0 ? -c : c;
        int32_t mag = (a + (qv >> 1)) / qv;
        if (j.dering_on && mag > maxc) mag = maxc;
        q[i] = (int16_t)(c < 0 ? -mag : mag);
      }
      // sequential f32 norm in NATURAL index order (pipeline_t._norm_seq)
      float acc = 0.0f;
      for (int ni = 1; ni < 64; ni++) {
        float rf = (float)raw[Z_OF_NAT.z[ni]];
        float term = rf * rf;
        acc += term;
      }
      j.norms[n] = acc;
    }
  }
}

// ---------------------------------------------------------------------
// AC-first histogram (ops/symbols.py ac_first_histogram_t semantics ==
// jcphuff.c encode_mcu_AC_first gather, incl. EOB runs + 0x7FFF flush)
// ---------------------------------------------------------------------

void hist_seg(const int16_t* q, long n0, long n1, int Ss, int Se,
              int32_t* hist) {
  int32_t eobrun = 0;
  auto flush = [&]() {
    if (eobrun > 0) {
      hist[(nbits(eobrun) - 1) << 4]++;
      eobrun = 0;
    }
  };
  for (long b = n0; b < n1; b++) {
    const int16_t* z = q + b * 64;
    int r = 0;
    for (int i = Ss; i <= Se; i++) {
      int v = z[i];
      if (v == 0) {
        r++;
        continue;
      }
      flush();
      while (r > 15) {
        hist[0xF0]++;
        r -= 16;
      }
      hist[(r << 4) | nbits(v < 0 ? -v : v)]++;
      r = 0;
    }
    if (r > 0) {
      eobrun++;
      if (eobrun == 0x7FFF) flush();
    }
  }
  flush();
}

// ---------------------------------------------------------------------
// AC trellis DP per block (codec/trellis.py _trellis_ac_t semantics ==
// /root/reference/jcdctmgr.c:936 quantize_trellis AC part)
// ---------------------------------------------------------------------

struct ACJob {
  const int32_t* raw_zz;  // (n, 64)
  int16_t* q_zz;          // (n, 64) round-nearest in, trellised out
  long n;
  int bw;
  const int32_t* qtbl_zz;
  const float* lam;      // (n,)
  const int32_t* ac_si;  // 256 code lengths
  int Ss, Se, eob_opt, kmax, maxq;
  // eob_opt side outputs per block
  float* czero;   // (n,)
  float* skip;    // (n,)
  int32_t* heob;  // (n,) 0/1/2
};

void ac_block(const ACJob& j, long b, const float* ltbl) {
  const int32_t* raw = j.raw_zz + b * 64;
  int16_t* qout = j.q_zz + b * 64;
  const float lam = j.lam[b];
  const float zrl_bits = (float)j.ac_si[0xF0];
  const bool zrl_ok = j.ac_si[0xF0] > 0;

  int32_t x[64], qval[64], sgn[64];
  int nc[64];
  float azd[64];  // inclusive prefix of in-band zdist
  float prev_azd = 0.0f;
  for (int i = 0; i < 64; i++) {
    int32_t r = raw[i];
    sgn[i] = r < 0 ? -1 : 1;
    int32_t a = r < 0 ? -r : r;
    x[i] = a;
    int32_t q8 = j.qtbl_zz[i] << 3;
    int32_t qv = (a + (q8 >> 1)) / q8;
    qval[i] = qv < j.maxq ? qv : j.maxq;
    nc[i] = nbits(qval[i]);
    float zd = ((float)(a * a) * lam) * ltbl[i];
    float zterm = (i >= j.Ss && i <= j.Se) ? zd : 0.0f;
    prev_azd = prev_azd + zterm;
    azd[i] = prev_azd;
  }

  float acc[64];
  int run_start[64];
  int32_t best_val[64];
  for (int i = 0; i < 64; i++) {
    acc[i] = BIGF;
    run_start[i] = 0;
    best_val[i] = 0;
  }
  acc[j.Ss - 1] = 0.0f;

  for (int i = j.Ss; i <= j.Se; i++) {
    if (qval[i] == 0) continue;  // acc stays BIG
    int32_t q8 = j.qtbl_zz[i] << 3;
    float best = BIGF;
    int bj = 0;
    int32_t bv = 0;
    float azd_im1 = i > 0 ? azd[i - 1] : 0.0f;
    for (int jj = j.Ss - 1; jj < i; jj++) {
      if (jj != j.Ss - 1 && (qval[jj] == 0 || jj < j.Ss)) continue;
      if (acc[jj] >= BIGF) continue;
      int run = i - 1 - jj;
      if (run >= 16 && !zrl_ok) continue;
      float run_bits =
          run >= 16 ? (float)(run >> 4) * zrl_bits : 0.0f;
      float tail = (azd_im1 - azd[jj]) + acc[jj];
      int sym_base = 16 * (run & 15);
      for (int k = 0; k < nc[i] && k < j.kmax; k++) {
        int32_t cand = (k == nc[i] - 1) ? qval[i] : (2 << k) - 1;
        int32_t coef_len = j.ac_si[sym_base + k + 1];
        if (coef_len <= 0) continue;
        int32_t delta = cand * q8 - x[i];
        float cdist = ((float)(delta * delta) * lam) * ltbl[i];
        float rate = ((float)coef_len + (float)(k + 1)) + run_bits;
        float cost = (rate + cdist) + tail;
        if (cost < best) {
          best = cost;
          bj = jj;
          bv = cand;
        }
      }
    }
    acc[i] = best;
    run_start[i] = bj;
    best_val[i] = bv;
  }

  // end selection (EOB appended unless the path ends at Se)
  float azd_Se = azd[j.Se];
  float eob_len = (float)j.ac_si[0];
  float bestc = BIGF;
  int last_idx = 0;
  for (int jj = 0; jj < 64; jj++) {
    float c;
    if (jj == j.Ss - 1) {
      c = azd_Se + eob_len;
    } else if (jj >= j.Ss && jj <= j.Se && qval[jj] != 0
               && acc[jj] < BIGF) {
      c = (acc[jj] + azd_Se) - azd[jj];
      if (jj < j.Se) c += eob_len;
    } else {
      continue;
    }
    if (c < bestc) {
      bestc = c;
      last_idx = jj;
    }
  }

  if (j.eob_opt) {
    j.czero[b] = azd_Se;
    float sk;
    if (last_idx == j.Ss - 1)
      sk = azd_Se;
    else
      sk = (acc[last_idx] + azd_Se) - azd[last_idx];
    j.skip[b] = sk;
    j.heob[b] = (last_idx < j.Se ? 1 : 0) + (last_idx == j.Ss - 1 ? 1 : 0);
  }

  // walk the chosen path; positions outside it zero within the band
  bool keep[64] = {false};
  int cur = last_idx;
  while (cur >= j.Ss) {
    keep[cur] = true;
    cur = run_start[cur];
  }
  for (int i = j.Ss; i <= j.Se; i++)
    qout[i] = keep[i] ? (int16_t)(best_val[i] * sgn[i]) : (int16_t)0;
}

void ac_rows(const ACJob& j, const float* ltbl, long b0, long b1) {
  for (long b = b0; b < b1 && b < j.n; b++) ac_block(j, b, ltbl);
}

// block-level EOB-run DP per block row (trellis.py _eob_block_dp ==
// jcdctmgr.c:1224-1297), applied after the per-block DP
void eob_row(const ACJob& j, long row) {
  const int L = j.bw;
  const long base = row * L;
  std::vector<float> azbc(L + 1), abc(L + 1);
  std::vector<int> req(L + 1), brs(L);
  azbc[0] = 0.0f;
  abc[0] = 0.0f;
  req[0] = 0;
  auto eobrun_cost = [&](int run) {
    int nb = run > 0 ? 32 - __builtin_clz((uint32_t)run) : 0;
    return (float)nb + (float)j.ac_si[16 * nb];
  };
  for (int b = 0; b < L; b++) {
    azbc[b + 1] = azbc[b] + j.czero[base + b];
    int he = j.heob[base + b];
    if (he != 2) {
      float best = BIGF;
      int arg = 0;
      for (int i = 0; i <= b; i++) {
        if (req[i] == 2) continue;
        int run = b - i + req[i];
        float cost = (((j.skip[base + b] + azbc[b]) - azbc[i]) + abc[i])
                     + eobrun_cost(run);
        if (cost < best) {
          best = cost;
          arg = i;
        }
      }
      abc[b + 1] = best;
      brs[b] = arg;
    } else {
      abc[b + 1] = BIGF;
      brs[b] = 0;
    }
    req[b + 1] = he;
  }
  float best = BIGF;
  int argl = 0;
  for (int i = 0; i <= L; i++) {
    if (req[i] == 2) continue;
    float cost = (azbc[L] - azbc[i]) + eobrun_cost(L - i + req[i]);
    if (cost < best) {
      best = cost;
      argl = i;
    }
  }
  int lb = argl - 1;
  std::vector<bool> kept(L, false);
  for (int b = L - 1; b >= 0; b--) {
    if (b == lb) {
      kept[b] = true;
      lb = brs[b] - 1;
    }
  }
  for (int b = 0; b < L; b++) {
    if (kept[b]) continue;
    int16_t* z = j.q_zz + (base + b) * 64;
    for (int i = j.Ss; i <= j.Se; i++) z[i] = 0;
  }
}

// ---------------------------------------------------------------------
// DC trellis (codec/trellis.py trellis_dc_rows semantics ==
// jcdctmgr.c:1044-1118 + backtrack :1308-1327), chained per iMCU row
// ---------------------------------------------------------------------

struct DCJob {
  const int32_t* raw_zz;  // (n, 64) — DC at [.., 0]
  int16_t* q_zz;
  int bw, bh, v;
  int q0;
  const int32_t* dc_si;  // 17 lengths used (|delta| <= 2*maxq)
  const float* lam;      // (n,) per-block lambda
  int nc, maxq;
  float delta_w;
};

void dc_imcu_row(const DCJob& j, int ri) {
  const int32_t q8 = j.q0 * 8;
  const float ltbl0 = 1.0f / ((float)j.q0 * (float)j.q0);
  const int L = j.bw;
  const int nc = j.nc;
  std::vector<int32_t> cand((long)L * nc);
  std::vector<float> dist((long)L * nc), acc(nc), nacc(nc);
  std::vector<int> bts((long)L * nc);
  std::vector<int32_t> prev_dc(L);  // chosen DC of the previous phase row
  std::vector<int32_t> prev_raw(L);
  int32_t last_dc0 = 0;

  auto trans_cost = [&](int32_t d) {
    int b = nbits(d < 0 ? -d : d);
    return (float)b + (float)j.dc_si[b];
  };

  for (int p = 0; p < j.v; p++) {
    int br = ri * j.v + p;
    if (br >= j.bh) break;
    const long base = (long)br * L;
    for (int t = 0; t < L; t++) {
      int32_t r = j.raw_zz[(base + t) * 64];
      int32_t sg = r < 0 ? -1 : 1;
      int32_t xa = r < 0 ? -r : r;
      int32_t qv = (xa + q8 / 2) / q8;
      float lamdc = j.lam[base + t] * ltbl0;
      for (int k = 0; k < nc; k++) {
        int32_t mag = qv - nc / 2 + k;
        if (mag < -j.maxq) mag = -j.maxq;
        if (mag > j.maxq) mag = j.maxq;
        int32_t delta = mag * q8 - xa;
        float d = (float)(delta * delta) * lamdc;
        int32_t cd = mag * sg;
        if (j.delta_w > 0.0f && p > 0) {
          int32_t ar = prev_raw[t];
          int32_t vd = (ar - r) - (prev_dc[t] * q8 - cd * q8);
          float vdist = (float)(vd * vd) * lamdc;
          d = d + j.delta_w * (vdist - d);
        }
        cand[(long)t * nc + k] = cd;
        dist[(long)t * nc + k] = d;
      }
    }
    for (int t = 0; t < L; t++) {
      if (t == 0) {
        for (int k = 0; k < nc; k++) {
          acc[k] = trans_cost(cand[k] - last_dc0) + dist[k];
          bts[k] = 0;
        }
        continue;
      }
      for (int k = 0; k < nc; k++) {
        float best = BIGF;
        int bl = 0;
        for (int l = 0; l < nc; l++) {
          float c = (trans_cost(cand[(long)t * nc + k]
                                - cand[(long)(t - 1) * nc + l])
                     + dist[(long)t * nc + k])
                    + acc[l];
          if (c < best) {
            best = c;
            bl = l;
          }
        }
        nacc[k] = best;
        bts[(long)t * nc + k] = bl;
      }
      std::swap(acc, nacc);
    }
    float best = BIGF;
    int cur = 0;
    for (int k = 0; k < nc; k++)
      if (acc[k] < best) {
        best = acc[k];
        cur = k;
      }
    for (int t = L - 1; t >= 0; t--) {
      int32_t val = cand[(long)t * nc + cur];
      j.q_zz[(base + t) * 64] = (int16_t)val;
      prev_dc[t] = val;
      prev_raw[t] = j.raw_zz[(base + t) * 64];
      cur = bts[(long)t * nc + cur];
    }
    last_dc0 = prev_dc[L - 1];
  }
}

template <typename F>
void run_threads(long total, int nthreads, F f) {
  if (nthreads <= 1 || total <= 1) {
    f(0L, total);
    return;
  }
  std::vector<std::thread> ts;
  long step = (total + nthreads - 1) / nthreads;
  for (int t = 0; t < nthreads; t++) {
    long a = t * step, b = a + step < total ? a + step : total;
    if (a >= total) break;
    ts.emplace_back([&, a, b]() { f(a, b); });
  }
  for (auto& t : ts) t.join();
}

}  // namespace

extern "C" {

long mj_host_p1(const uint8_t* plane, int pw, int bw, int bh,
                const int32_t* qtbl_zz, int dering_on, int precision,
                int16_t* q_zz, int32_t* raw_zz, float* norms,
                int nthreads) {
  P1Job j{plane, pw, bw, bh, qtbl_zz, dering_on, precision,
          q_zz,  raw_zz, norms};
  run_threads(bh, nthreads,
              [&](long a, long b) { p1_rows(j, (int)a, (int)b); });
  return 0;
}

long mj_hist_ac_first(const int16_t* q_zz, long n, int Ss, int Se,
                      long ri, int32_t* hist) {
  std::memset(hist, 0, 256 * sizeof(int32_t));
  if (ri > 0 && ri < n) {
    for (long s = 0; s < n; s += ri)
      hist_seg(q_zz, s, s + ri < n ? s + ri : n, Ss, Se, hist);
  } else {
    hist_seg(q_zz, 0, n, Ss, Se, hist);
  }
  return 0;
}

long mj_host_trellis_ac(const int32_t* raw_zz, int16_t* q_zz, long n,
                        int bw, const int32_t* qtbl_zz, const float* lam,
                        const int32_t* ac_si, int Ss, int Se,
                        int eob_opt, int kmax, int maxq, int nthreads) {
  std::vector<float> czero, skip;
  std::vector<int32_t> heob;
  if (eob_opt) {
    czero.resize(n);
    skip.resize(n);
    heob.resize(n);
  }
  ACJob j{raw_zz, q_zz,  n,       bw,
          qtbl_zz, lam,  ac_si,   Ss,
          Se,      eob_opt, kmax, maxq,
          eob_opt ? czero.data() : nullptr,
          eob_opt ? skip.data() : nullptr,
          eob_opt ? heob.data() : nullptr};
  float ltbl[64];
  for (int i = 0; i < 64; i++) {
    float q = (float)qtbl_zz[i];
    ltbl[i] = 1.0f / (q * q);
  }
  run_threads(n, nthreads,
              [&](long a, long b) { ac_rows(j, ltbl, a, b); });
  if (eob_opt) {
    long rows = n / bw;
    run_threads(rows, nthreads, [&](long a, long b) {
      for (long r = a; r < b; r++) eob_row(j, r);
    });
  }
  return 0;
}

long mj_host_trellis_dc(const int32_t* raw_zz, int16_t* q_zz, int bw,
                        int bh, int v, int q0, const int32_t* dc_si,
                        const float* lam, int nc, int maxq,
                        float delta_w, int nthreads) {
  DCJob j{raw_zz, q_zz, bw, bh, v, q0, dc_si, lam, nc, maxq, delta_w};
  long nrows = (bh + v - 1) / v;
  run_threads(nrows, nthreads, [&](long a, long b) {
    for (long r = a; r < b; r++) dc_imcu_row(j, (int)r);
  });
  return 0;
}

}  // extern "C"

// ---------------------------------------------------------------------
// Arithmetic-coding trellis (quantize_trellis_arith semantics; scalar
// twins of codec/trellis.py _arith_ac_row / _arith_dc_row).
//
// The adaptive rate feedback makes this pass irreducibly row-serial:
// the coder trains on row k's chosen coefficients before row k+1's
// rates are snapshotted. The device formulation therefore paid one
// host<->device round trip per block row (~25-50 ms each on a remote
// attachment); on host the whole loop is native and round-trip-free.
// ---------------------------------------------------------------------

namespace {

constexpr int AC_MAXNB = 14;
constexpr int DC_MAXNB = 15;

inline float r_ac(const float* r, int s, int b) { return r[s * 2 + b]; }

// rate walk for coefficient value v (>=1) at zigzag index i
float arith_coef_bits(const float* ar, int32_t v, int i, int ac_K) {
  int32_t vd = v - 1;
  int nb = nbits(vd);
  int st0 = 3 * (i - 1) + 2;
  int stl = i <= ac_K ? 189 : 217;
  float a1 = r_ac(ar, st0, 1);
  float cb = 1.0f;  // sign bit
  if (vd >= 1) cb = cb + a1;
  if (vd >= 2) cb = cb + a1;
  for (int k = 3; k <= AC_MAXNB; k++)
    if (nb >= k) cb = cb + r_ac(ar, stl + (k - 3), 1);
  int zf_state = nb <= 1 ? st0 : (stl + nb - 2 < 255 ? stl + nb - 2 : 255);
  int m_state = (nb <= 1 ? st0 + 14
                         : (stl + nb - 2 < 241 ? stl + nb - 2 : 241) + 14);
  cb = cb + r_ac(ar, zf_state, 0);
  float m0 = r_ac(ar, m_state, 0), m1 = r_ac(ar, m_state, 1);
  for (int p = AC_MAXNB - 2; p >= 0; p--) {
    if (p <= nb - 2) cb = cb + (((vd >> p) & 1) ? m1 : m0);
  }
  return cb;
}

struct ArithACJob {
  const int32_t* raw;  // (n, 64)
  int16_t* q;
  long n;
  const int32_t* qtbl_zz;
  const float* lam;
  const float* ar;  // (256, 2)
  int Ss, Se, ac_K;
};

void arith_ac_block(const ArithACJob& j, long b, const float* ltbl) {
  const int32_t* raw = j.raw + b * 64;
  int16_t* qout = j.q + b * 64;
  const float lam = j.lam[b];

  int32_t x[64], qval[64], sgn[64];
  float azd[64];
  float prev_azd = 0.0f;
  for (int i = 0; i < 64; i++) {
    int32_t r = raw[i];
    sgn[i] = r < 0 ? -1 : 1;
    int32_t a = r < 0 ? -r : r;
    x[i] = a;
    int32_t q8 = j.qtbl_zz[i] << 3;
    qval[i] = (a + (q8 >> 1)) / q8;  // no clamp (arith)
    float zd = ((float)(a * a) * lam) * ltbl[i];
    prev_azd = prev_azd + ((i >= j.Ss && i <= j.Se) ? zd : 0.0f);
    azd[i] = prev_azd;
  }

  float acc[64], A[64];
  int run_start[64];
  int32_t best_val[64];
  for (int i = 0; i < 64; i++) {
    acc[i] = BIGF;
    A[i] = 0.0f;
    run_start[i] = 0;
    best_val[i] = 0;
  }
  acc[j.Ss - 1] = 0.0f;

  for (int i = j.Ss; i <= j.Se; i++) {
    // run-length rate accumulator per j (adaptive zero rates)
    float z_add = r_ac(j.ar, 3 * (i - 2 > 0 ? i - 2 : 0) + 1, 0);
    for (int jj = 0; jj < 64; jj++) {
      if (jj == i - 1)
        A[jj] = r_ac(j.ar, 3 * (jj < 63 ? jj : 63), 0);
      else
        A[jj] = A[jj] + z_add;
    }
    if (qval[i] == 0) continue;
    int32_t q8 = j.qtbl_zz[i] << 3;
    float rb_base = r_ac(j.ar, 3 * (i - 1) + 1, 1);
    float azd_im1 = i > 0 ? azd[i - 1] : 0.0f;
    float best = BIGF;
    int bj = 0;
    int32_t bv = 0;
    int32_t cands[2] = {qval[i], qval[i] - 1};
    float cdistv[2], cbv[2];
    bool okc[2] = {qval[i] != 0, qval[i] > 1};
    for (int c = 0; c < 2; c++) {
      if (!okc[c]) continue;
      int32_t delta = cands[c] * q8 - x[i];
      cdistv[c] = ((float)(delta * delta) * lam) * ltbl[i];
      cbv[c] = arith_coef_bits(j.ar, cands[c] >= 1 ? cands[c] : 1, i,
                               j.ac_K);
    }
    for (int jj = j.Ss - 1; jj < i; jj++) {
      if (jj != j.Ss - 1 && (jj < j.Ss || qval[jj] == 0)) continue;
      if (acc[jj] >= BIGF) continue;
      float run_bits = A[jj] + rb_base;
      float tail = (azd_im1 - azd[jj]) + acc[jj];
      for (int c = 0; c < 2; c++) {
        if (!okc[c]) continue;
        float rate = (float)(int32_t)(cbv[c] + run_bits);  // `int rate`
        float cost = (rate + cdistv[c]) + tail;
        if (cost < best) {
          best = cost;
          bj = jj;
          bv = cands[c];
        }
      }
    }
    acc[i] = best;
    run_start[i] = bj;
    best_val[i] = bv;
  }

  float azd_Se = azd[j.Se];
  float bestc = BIGF;
  int last_idx = 0;
  for (int jj = 0; jj < 64; jj++) {
    float c;
    if (jj == j.Ss - 1) {
      c = azd_Se + r_ac(j.ar, 0, 1);
    } else if (jj >= j.Ss && jj <= j.Se && qval[jj] != 0
               && acc[jj] < BIGF) {
      c = (acc[jj] + azd_Se) - azd[jj];
      if (jj < j.Se) {
        int e = jj - 1 > 0 ? jj - 1 : 0;
        c = c + r_ac(j.ar, 3 * (e < 63 ? e : 63), 1);
      }
    } else {
      continue;
    }
    if (c < bestc) {
      bestc = c;
      last_idx = jj;
    }
  }
  bool keep[64] = {false};
  int cur = last_idx;
  while (cur >= j.Ss) {
    keep[cur] = true;
    cur = run_start[cur];
  }
  for (int i = j.Ss; i <= j.Se; i++)
    qout[i] = keep[i] ? (int16_t)(best_val[i] * sgn[i]) : (int16_t)0;
}

}  // namespace

extern "C" {

long mj_host_arith_ac_row(const int32_t* raw, int16_t* q, long n,
                          const int32_t* qtbl_zz, const float* lam,
                          const float* ac_rates, int Ss, int Se,
                          int ac_K, int nthreads) {
  ArithACJob j{raw, q, n, qtbl_zz, lam, ac_rates, Ss, Se, ac_K};
  float ltbl[64];
  for (int i = 0; i < 64; i++) {
    float qv = (float)qtbl_zz[i];
    ltbl[i] = 1.0f / (qv * qv);
  }
  run_threads(n, nthreads, [&](long a, long b) {
    for (long k = a; k < b; k++) arith_ac_block(j, k, ltbl);
  });
  return 0;
}

// DC trellis for one block row with adaptive rates + per-candidate
// context tracking. raw/q are (n, 64) block-major; L blocks in the row.
long mj_host_arith_dc_row(const int32_t* raw, int16_t* q, long L,
                          int q0, const float* dc_rates /* (64, 2) */,
                          int nc, const float* lam_dc /* (L,) lam*ltbl0 */,
                          int last_dc0, int32_t* final_dc) {
  const int32_t q8 = q0 * 8;
  auto r_dc = [&](int s, int b) { return dc_rates[s * 2 + b]; };

  auto dc_bits_ctx = [&](int32_t d, int st0, float* bits_out,
                         int* ctx_out) {
    bool nz = d != 0;
    bool neg = d < 0;
    int32_t ad = d < 0 ? -d : d;
    int32_t vd = ad - 1 > 0 ? ad - 1 : 0;
    int nb = nbits(vd);
    float bits = nz ? r_dc(st0, 1) : r_dc(st0, 0);
    if (nz) bits = bits + (neg ? r_dc(st0 + 1, 1) : r_dc(st0 + 1, 0));
    int st1 = st0 + 2 + (neg ? 1 : 0);
    if (nz && vd >= 1) bits = bits + r_dc(st1, 1);
    for (int k = 2; k <= DC_MAXNB; k++)
      if (nz && nb >= k) bits = bits + r_dc(20 + (k - 2), 1);
    int stf = vd == 0 ? st1 : (nb == 1 ? 20 : 20 + nb - 1);
    if (nz) bits = bits + r_dc(stf, 0);
    int stm = stf + 14;
    float m0 = r_dc(stm, 0), m1 = r_dc(stm, 1);
    for (int p = DC_MAXNB - 2; p >= 0; p--) {
      if (nz && p <= nb - 2) bits = bits + (((vd >> p) & 1) ? m1 : m0);
    }
    *bits_out = bits;
    *ctx_out = nz ? ((neg ? 8 : 4) + (nb >= 2 ? 8 : 0)) : 0;
  };

  std::vector<int32_t> cand((size_t)L * nc);
  std::vector<float> dist((size_t)L * nc);
  std::vector<int> bts((size_t)L * nc);
  for (long t = 0; t < L; t++) {
    int32_t r = raw[t * 64];
    int32_t sg = r < 0 ? -1 : 1;
    int32_t xa = r < 0 ? -r : r;
    int32_t qv = (xa + q8 / 2) / q8;
    for (int k = 0; k < nc; k++) {
      int32_t mag = qv - nc / 2 + k;  // no clamp (arith)
      int32_t dq = mag * q8 - xa;
      cand[t * nc + k] = mag * sg;
      dist[t * nc + k] = (float)(dq * dq) * lam_dc[t];
    }
  }
  std::vector<float> acc(nc), nacc(nc);
  std::vector<int> ctx(nc, 0), nctx(nc);
  for (long t = 0; t < L; t++) {
    if (t == 0) {
      for (int k = 0; k < nc; k++) {
        float bits;
        int c;
        dc_bits_ctx(cand[k] - last_dc0, 0, &bits, &c);
        acc[k] = bits + dist[k];
        ctx[k] = c;
        bts[k] = 0;
      }
      continue;
    }
    for (int k = 0; k < nc; k++) {
      float best = BIGF;
      int bl = 0, bc = 0;
      for (int l = 0; l < nc; l++) {
        float bits;
        int c;
        dc_bits_ctx(cand[t * nc + k] - cand[(t - 1) * nc + l], ctx[l],
                    &bits, &c);
        float cost = (bits + dist[t * nc + k]) + acc[l];
        if (cost < best) {
          best = cost;
          bl = l;
          bc = c;
        }
      }
      nacc[k] = best;
      nctx[k] = bc;
      bts[t * nc + k] = bl;
    }
    std::swap(acc, nacc);
    std::swap(ctx, nctx);
  }
  float best = BIGF;
  int cur = 0;
  for (int k = 0; k < nc; k++)
    if (acc[k] < best) {
      best = acc[k];
      cur = k;
    }
  int32_t fin = cand[(L - 1) * nc + cur];
  for (long t = L - 1; t >= 0; t--) {
    q[t * 64] = (int16_t)cand[t * nc + cur];
    cur = bts[t * nc + cur];
  }
  *final_dc = fin;
  return 0;
}

}  // extern "C"

// ---------------------------------------------------------------------
// Host render: dequantize + islow inverse DCT + wraparound range limit
// (scalar twin of ops/dct.py idct_islow == jidctint.c + jdmaster.c
// prepare_range_limit_table). Serves the serial decode() latency path:
// the device render pays two tunnel round trips per image.
// ---------------------------------------------------------------------

namespace {

// one 1-D inverse LLM pass over d[0..7] (strided), descale by n
void idct_pass(int32_t* d, int stride, int n) {
  int32_t z2 = d[2 * stride], z3 = d[6 * stride];
  int32_t z1 = (z2 + z3) * F_0_541196100;
  int32_t tmp2 = z1 + z3 * (-F_1_847759065);
  int32_t tmp3 = z1 + z2 * F_0_765366865;

  z2 = d[0 * stride];
  z3 = d[4 * stride];
  int32_t tmp0 = (z2 + z3) << CONST_BITS;
  int32_t tmp1 = (z2 - z3) << CONST_BITS;

  int32_t tmp10 = tmp0 + tmp3, tmp13 = tmp0 - tmp3;
  int32_t tmp11 = tmp1 + tmp2, tmp12 = tmp1 - tmp2;

  int32_t t0 = d[7 * stride], t1 = d[5 * stride];
  int32_t t2 = d[3 * stride], t3 = d[1 * stride];
  z1 = t0 + t3;
  z2 = t1 + t2;
  z3 = t0 + t2;
  int32_t z4 = t1 + t3;
  int32_t z5 = (z3 + z4) * F_1_175875602;

  t0 *= F_0_298631336;
  t1 *= F_2_053119869;
  t2 *= F_3_072711026;
  t3 *= F_1_501321110;
  z1 *= -F_0_899976223;
  z2 *= -F_2_562915447;
  z3 = z3 * (-F_1_961570560) + z5;
  z4 = z4 * (-F_0_390180644) + z5;

  t0 = t0 + z1 + z3;
  t1 = t1 + z2 + z4;
  t2 = t2 + z2 + z3;
  t3 = t3 + z1 + z4;

  d[0 * stride] = descale(tmp10 + t3, n);
  d[7 * stride] = descale(tmp10 - t3, n);
  d[1 * stride] = descale(tmp11 + t2, n);
  d[6 * stride] = descale(tmp11 - t2, n);
  d[2 * stride] = descale(tmp12 + t1, n);
  d[5 * stride] = descale(tmp12 - t1, n);
  d[3 * stride] = descale(tmp13 + t0, n);
  d[4 * stride] = descale(tmp13 - t0, n);
}

inline uint8_t range_limit8(int32_t v) {
  int32_t idx = v & 1023;
  if (idx < 128) return (uint8_t)(idx + 128);
  if (idx < 512) return 255;
  if (idx < 896) return 0;
  return (uint8_t)(idx - 896);
}

struct RenderJob {
  const int16_t* zz;  // (bh*bw, 64) zigzag coefficients
  const int32_t* qtbl;  // 64, natural order
  int bw, bh, ph, pw;
  uint8_t* out;  // (ph, pw)
};

void render_rows(const RenderJob& j, int r0, int r1) {
  constexpr int PASS1 = 2;
  int32_t blk[64];
  for (int br = r0; br < r1 && br < j.bh; br++) {
    int oy = br * 8;
    int ny = j.ph - oy < 8 ? j.ph - oy : 8;
    if (ny <= 0) continue;
    for (int bc = 0; bc < j.bw; bc++) {
      const int16_t* z = j.zz + ((long)br * j.bw + bc) * 64;
      for (int i = 0; i < 64; i++) {
        int nat = ZZ[i];
        blk[nat] = (int32_t)z[i] * j.qtbl[nat];
      }
      for (int c = 0; c < 8; c++)
        idct_pass(blk + c, 8, CONST_BITS - PASS1);
      for (int r = 0; r < 8; r++)
        idct_pass(blk + 8 * r, 1, CONST_BITS + PASS1 + 3);
      int ox = bc * 8;
      int nx = j.pw - ox < 8 ? j.pw - ox : 8;
      for (int y = 0; y < ny; y++) {
        uint8_t* dst = j.out + (long)(oy + y) * j.pw + ox;
        for (int x = 0; x < nx; x++)
          dst[x] = range_limit8(blk[y * 8 + x]);
      }
    }
  }
}

}  // namespace

extern "C" long mj_host_render(const int16_t* zz, const int32_t* qtbl,
                               int bw, int bh, int ph, int pw,
                               uint8_t* out, int nthreads) {
  RenderJob j{zz, qtbl, bw, bh, ph, pw, out};
  run_threads(bh, nthreads,
              [&](long a, long b) { render_rows(j, (int)a, (int)b); });
  return 0;
}
