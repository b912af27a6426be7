/* Full-encode harness for API-only mozjpeg knobs (no cjpeg flag exists).
 *
 * usage: encode_harness in.ppm quality out.jpg [BOOL:<id>=0|1 ...]
 *        [INT:<id>=v ...] [FLOAT:<id>=v ...] [progressive=0|1]
 * ids are the numeric values of J_BOOLEAN_PARAM / J_INT_PARAM /
 * J_FLOAT_PARAM (jpeglib.h:321-347).
 *
 * Build: gcc -O2 -I/root/reference -I.refbuild scripts/encode_harness.c
 *        -L.refbuild -ljpeg -Wl,-rpath,'$ORIGIN/../.refbuild' -lm
 *        -o .bench/encode_harness
 */
#include <stdio.h>
#include <stdlib.h>
#include <string.h>
#include "jpeglib.h"

static unsigned char *read_ppm(const char *path, int *w, int *h) {
  FILE *f = fopen(path, "rb");
  if (!f) { perror(path); exit(1); }
  int maxv, c;
  if (fscanf(f, "P6 %d %d %d", w, h, &maxv) != 3) { exit(1); }
  c = fgetc(f); (void)c;
  unsigned char *buf = malloc((size_t)*w * *h * 3);
  if (fread(buf, 3, (size_t)*w * *h, f) != (size_t)*w * *h) exit(1);
  fclose(f);
  return buf;
}

int main(int argc, char **argv) {
  if (argc < 4) { fprintf(stderr, "usage: see header\n"); return 2; }
  int w, h;
  unsigned char *rgb = read_ppm(argv[1], &w, &h);
  int quality = atoi(argv[2]);

  struct jpeg_compress_struct cinfo;
  struct jpeg_error_mgr jerr;
  cinfo.err = jpeg_std_error(&jerr);
  jpeg_create_compress(&cinfo);
  FILE *out = fopen(argv[3], "wb");
  if (!out) { perror(argv[3]); return 1; }
  jpeg_stdio_dest(&cinfo, out);
  cinfo.image_width = w;
  cinfo.image_height = h;
  cinfo.input_components = 3;
  cinfo.in_color_space = JCS_RGB;
  jpeg_set_defaults(&cinfo);
  for (int i = 4; i < argc; i++) {
    int id, iv; float fv;
    if (sscanf(argv[i], "BOOL:%d=%d", &id, &iv) == 2)
      jpeg_c_set_bool_param(&cinfo, (J_BOOLEAN_PARAM)id, iv);
    else if (sscanf(argv[i], "INT:%d=%d", &id, &iv) == 2)
      jpeg_c_set_int_param(&cinfo, (J_INT_PARAM)id, iv);
    else if (sscanf(argv[i], "FLOAT:%d=%f", &id, &fv) == 2)
      jpeg_c_set_float_param(&cinfo, (J_FLOAT_PARAM)id, fv);
    else if (!strcmp(argv[i], "progressive=0")) {
      cinfo.num_scans = 0; cinfo.scan_info = NULL;
    } else { fprintf(stderr, "bad arg %s\n", argv[i]); return 2; }
  }
  jpeg_set_quality(&cinfo, quality, 0);
  /* regenerate the scan script for the current optimize_scans flag
   * (cjpeg re-runs jpeg_simple_progression after -fastcrush/-revert) */
  if (cinfo.scan_info != NULL)
    jpeg_simple_progression(&cinfo);
  jpeg_start_compress(&cinfo, 1);
  while (cinfo.next_scanline < cinfo.image_height) {
    JSAMPROW row = rgb + (size_t)cinfo.next_scanline * w * 3;
    jpeg_write_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_compress(&cinfo);
  jpeg_destroy_compress(&cinfo);
  fclose(out);
  return 0;
}
