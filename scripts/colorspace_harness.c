/* Colorspace + API-only-knob encode harness against the reference
 * library (mozjpeg's libjpeg API): the oracle for configurations no
 * cjpeg switch reaches — CMYK/YCCK/RGB colorspaces and the trellis
 * flag set (trellis_eob_opt / trellis_q_opt / use_scans_in_trellis).
 *
 * usage: colorspace_harness W H {rgb|cmyk|ycck|ycbcr} QUALITY [flags...]
 *   raw interleaved samples on stdin (W*H*3 for rgb/ycbcr, W*H*4 for
 *   cmyk/ycck), finished JPEG on stdout.
 * flags: baseline   - JCP_FASTEST profile (sequential, no extras)
 *        fastcrush  - optimize_scans off
 *        reprogress - re-run jpeg_simple_progression after the
 *                     colorspace change (per-component scan script)
 *        notrellis / notrellis-dc / noovershoot / arith
 *        eobopt / qopt / bands - the API-only trellis knobs
 *
 * Build: scripts/build_harnesses.sh (gcc against .refbuild).
 * (Reimplemented in round 4: the original binary's source was lost —
 * tests/test_features.py defines the contract.)
 */
#include <stdio.h>
#include <stdlib.h>
#include <string.h>
#include "jpeglib.h"

int main(int argc, char **argv) {
  if (argc < 5) { fprintf(stderr, "usage: see header\n"); return 2; }
  int w = atoi(argv[1]), h = atoi(argv[2]);
  const char *cs = argv[3];
  int quality = atoi(argv[4]);
  int ncomp = (!strcmp(cs, "cmyk") || !strcmp(cs, "ycck")) ? 4 : 3;

  size_t n = (size_t)w * h * ncomp;
  unsigned char *buf = malloc(n);
  if (fread(buf, 1, n, stdin) != n) {
    fprintf(stderr, "short input\n");
    return 1;
  }

  struct jpeg_compress_struct cinfo;
  struct jpeg_error_mgr jerr;
  cinfo.err = jpeg_std_error(&jerr);
  jpeg_create_compress(&cinfo);
  unsigned char *out = NULL;
  unsigned long outlen = 0;
  jpeg_mem_dest(&cinfo, &out, &outlen);
  cinfo.image_width = w;
  cinfo.image_height = h;
  cinfo.input_components = ncomp;
  cinfo.in_color_space = ncomp == 4 ? JCS_CMYK : JCS_RGB;
  jpeg_set_defaults(&cinfo);
  if (!strcmp(cs, "rgb")) jpeg_set_colorspace(&cinfo, JCS_RGB);
  else if (!strcmp(cs, "cmyk")) jpeg_set_colorspace(&cinfo, JCS_CMYK);
  else if (!strcmp(cs, "ycck")) jpeg_set_colorspace(&cinfo, JCS_YCCK);

  int reprogress = 0;
  for (int i = 5; i < argc; i++) {
    if (!strcmp(argv[i], "baseline")) {
      jpeg_c_set_int_param(&cinfo, JINT_COMPRESS_PROFILE, JCP_FASTEST);
      jpeg_set_defaults(&cinfo);  /* re-wire profile defaults */
      if (!strcmp(cs, "rgb")) jpeg_set_colorspace(&cinfo, JCS_RGB);
      else if (!strcmp(cs, "cmyk")) jpeg_set_colorspace(&cinfo, JCS_CMYK);
      else if (!strcmp(cs, "ycck")) jpeg_set_colorspace(&cinfo, JCS_YCCK);
    } else if (!strcmp(argv[i], "fastcrush")) {
      jpeg_c_set_bool_param(&cinfo, JBOOLEAN_OPTIMIZE_SCANS, FALSE);
    } else if (!strcmp(argv[i], "reprogress")) {
      reprogress = 1;
    } else if (!strcmp(argv[i], "notrellis")) {
      jpeg_c_set_bool_param(&cinfo, JBOOLEAN_TRELLIS_QUANT, FALSE);
    } else if (!strcmp(argv[i], "notrellis-dc")) {
      jpeg_c_set_bool_param(&cinfo, JBOOLEAN_TRELLIS_QUANT_DC, FALSE);
    } else if (!strcmp(argv[i], "noovershoot")) {
      jpeg_c_set_bool_param(&cinfo, JBOOLEAN_OVERSHOOT_DERINGING, FALSE);
    } else if (!strcmp(argv[i], "eobopt")) {
      jpeg_c_set_bool_param(&cinfo, JBOOLEAN_TRELLIS_EOB_OPT, TRUE);
    } else if (!strcmp(argv[i], "qopt")) {
      jpeg_c_set_bool_param(&cinfo, JBOOLEAN_TRELLIS_Q_OPT, TRUE);
    } else if (!strcmp(argv[i], "bands")) {
      jpeg_c_set_bool_param(&cinfo, JBOOLEAN_USE_SCANS_IN_TRELLIS, TRUE);
    } else if (!strcmp(argv[i], "arith")) {
      cinfo.arith_code = TRUE;
    } else {
      fprintf(stderr, "bad flag %s\n", argv[i]);
      return 2;
    }
  }
  jpeg_set_quality(&cinfo, quality, TRUE);
  if (reprogress && cinfo.scan_info != NULL)
    jpeg_simple_progression(&cinfo);

  jpeg_start_compress(&cinfo, TRUE);
  while (cinfo.next_scanline < cinfo.image_height) {
    JSAMPROW row = buf + (size_t)cinfo.next_scanline * w * ncomp;
    jpeg_write_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_compress(&cinfo);
  jpeg_destroy_compress(&cinfo);
  fwrite(out, 1, outlen, stdout);
  return 0;
}
