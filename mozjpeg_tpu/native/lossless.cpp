// Lossless JPEG (ITU-T T.81 process 14): predictors 1-7 + point transform
// + Huffman difference coding. Parity references (semantics):
// /root/reference/jclossls.c, jdlossls.c, jclhuff.c, jdlhuff.c.
//
// Scope: 1x1-sampled components (the standard lossless layout), optional
// restart intervals in MCU rows are not yet wired (restart_interval = 0).

#include <cstdint>
#include <cstring>

namespace {

struct BitW {
  uint8_t* out; long cap, pos; uint64_t acc; int nbits; bool ovf;
  void init(uint8_t* o, long c) { out = o; cap = c; pos = 0; acc = 0;
                                  nbits = 0; ovf = false; }
  inline void putb(uint8_t b) { if (pos >= cap) { ovf = true; return; }
                                out[pos++] = b; }
  inline void put(uint32_t code, int size) {
    acc |= (uint64_t)(code & ((1u << size) - 1)) << (64 - nbits - size);
    nbits += size;
    while (nbits >= 8) {
      uint8_t b = (uint8_t)(acc >> 56);
      putb(b);
      if (b == 0xFF) putb(0x00);
      acc <<= 8; nbits -= 8;
    }
  }
  void flush() {
    if (nbits > 0) {
      int pad = 8 - (nbits & 7);
      if (pad != 8) put(0x7F, pad);
      while (nbits >= 8) {
        uint8_t b = (uint8_t)(acc >> 56);
        putb(b);
        if (b == 0xFF) putb(0x00);
        acc <<= 8; nbits -= 8;
      }
    }
  }
};

struct BitR {
  const uint8_t* data; long len, pos; uint64_t acc; int nbits; bool marker;
  void init(const uint8_t* d, long l) { data = d; len = l; pos = 0; acc = 0;
                                        nbits = 0; marker = false; }
  inline void fill() {
    while (nbits <= 56) {
      if (marker || pos >= len) { nbits += 8; continue; }
      uint8_t b = data[pos];
      if (b == 0xFF) {
        if (pos + 1 < len && data[pos + 1] == 0x00) pos += 2;
        else { marker = true; nbits += 8; continue; }
      } else pos += 1;
      acc |= (uint64_t)b << (56 - nbits);
      nbits += 8;
    }
  }
  inline int get(int n) {
    if (n == 0) return 0;
    if (nbits < n) fill();
    int v = (int)(acc >> (64 - n));
    acc <<= n; nbits -= n;
    return v;
  }
};

static inline int predict(int pred_sel, int Ra, int Rb, int Rc) {
  switch (pred_sel) {
    case 1: return Ra;
    case 2: return Rb;
    case 3: return Rc;
    case 4: return Ra + Rb - Rc;
    case 5: return Ra + ((Rb - Rc) >> 1);
    case 6: return Rb + ((Ra - Rc) >> 1);
    case 7: return (Ra + Rb) >> 1;
  }
  return 0;
}

}  // namespace

extern "C" {

// planes: per comp uint16 (height, width) row-major, samples ALREADY point-
// transformed (>> Pt) by the caller.  Interleaved 1x1 MCU order.
// Emit (gather==0) or count (gather!=0, counts int64[4*257]).
long mj_lossless_encode(const uint16_t* const* planes, int ncomp,
                        int width, int height, int pred_sel, int precision,
                        int Pt, const int32_t* dc_tbl_idx,
                        const uint32_t* ehufco, const uint8_t* ehufsi,
                        uint8_t* out, long cap, int64_t* counts,
                        int gather) {
  BitW bw; bw.init(out, cap);
  const int initial = 1 << (precision - Pt - 1);

  for (int y = 0; y < height; y++) {
    for (int x = 0; x < width; x++) {
      for (int ci = 0; ci < ncomp; ci++) {
        const uint16_t* p = planes[ci];
        int samp = p[(long)y * width + x];
        int pred;
        if (y == 0)
          pred = (x == 0) ? initial : p[x - 1];          // 1-D row 0
        else if (x == 0)
          pred = p[(long)(y - 1) * width];               // Rb
        else {
          int Ra = p[(long)y * width + x - 1];
          int Rb = p[(long)(y - 1) * width + x];
          int Rc = p[(long)(y - 1) * width + x - 1];
          pred = predict(pred_sel, Ra, Rb, Rc);
        }
        int temp = samp - pred;
        int temp2;
        if (temp & 0x8000) {
          temp = (-temp) & 0x7FFF;
          if (temp == 0) temp = 0x8000;
          temp2 = ~temp;
        } else {
          temp &= 0x7FFF;
          temp2 = temp;
        }
        int nbits = 0;
        int t = temp;
        while (t) { nbits++; t >>= 1; }
        int tbl = dc_tbl_idx[ci];
        if (gather) {
          counts[tbl * 257 + nbits]++;
        } else {
          bw.put(ehufco[tbl * 256 + nbits], ehufsi[tbl * 256 + nbits]);
          if (nbits && nbits != 16)
            bw.put((uint32_t)temp2, nbits);
        }
      }
    }
  }
  if (!gather) bw.flush();
  return bw.ovf ? -1 : bw.pos;
}

// Decode into planes (point-transformed domain; caller applies << Pt).
long mj_lossless_decode(const uint8_t* data, long len,
                        uint16_t* const* planes, int ncomp,
                        int width, int height, int pred_sel, int precision,
                        int Pt, const int32_t* dc_tbl_idx,
                        const int32_t* mincode, const int64_t* maxcode,
                        const int32_t* valptr, const uint8_t* vals) {
  BitR br; br.init(data, len);
  const int initial = 1 << (precision - Pt - 1);

  for (int y = 0; y < height; y++) {
    for (int x = 0; x < width; x++) {
      for (int ci = 0; ci < ncomp; ci++) {
        uint16_t* p = planes[ci];
        int tbl = dc_tbl_idx[ci];
        const int64_t* mx = maxcode + tbl * 18;
        const int32_t* mn = mincode + tbl * 17;
        const int32_t* vp = valptr + tbl * 17;
        const uint8_t* vl = vals + tbl * 256;
        int code = br.get(1);
        int l = 1;
        while (code > mx[l]) {
          code = (code << 1) | br.get(1);
          if (++l > 16) return -1;
        }
        int s = vl[vp[l] + (code - mn[l])];
        int diff;
        if (s == 0) diff = 0;
        else if (s == 16) diff = 32768;
        else {
          int v = br.get(s);
          diff = (v < (1 << (s - 1))) ? v - (1 << s) + 1 : v;
        }
        int pred;
        if (y == 0)
          pred = (x == 0) ? initial : p[x - 1];
        else if (x == 0)
          pred = p[(long)(y - 1) * width];
        else {
          int Ra = p[(long)y * width + x - 1];
          int Rb = p[(long)(y - 1) * width + x];
          int Rc = p[(long)(y - 1) * width + x - 1];
          pred = predict(pred_sel, Ra, Rb, Rc);
        }
        p[(long)y * width + x] = (uint16_t)((pred + diff) & 0xFFFF);
      }
    }
  }
  return br.pos;
}

}  // extern "C"
