/* Decode harness against the reference library: JPEG on stdin, raw
 * interleaved output samples (default output colorspace) on stdout,
 * "W H C" on stderr.  The oracle for decode paths djpeg's CLI cannot
 * express directly (CMYK/YCCK/RGB-colorspace streams to raw samples).
 *
 * Build: scripts/build_harnesses.sh.
 * (Reimplemented in round 4: the original binary's source was lost —
 * tests/test_features.py defines the contract.)
 */
#include <stdio.h>
#include <stdlib.h>
#include "jpeglib.h"

int main(void) {
  unsigned char *in = NULL;
  size_t cap = 1 << 20, len = 0;
  in = malloc(cap);
  size_t r;
  while ((r = fread(in + len, 1, cap - len, stdin)) > 0) {
    len += r;
    if (len == cap) {
      cap *= 2;
      in = realloc(in, cap);
    }
  }

  struct jpeg_decompress_struct cinfo;
  struct jpeg_error_mgr jerr;
  cinfo.err = jpeg_std_error(&jerr);
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, in, len);
  jpeg_read_header(&cinfo, TRUE);
  jpeg_start_decompress(&cinfo);
  int w = cinfo.output_width, h = cinfo.output_height;
  int c = cinfo.output_components;
  unsigned char *row = malloc((size_t)w * c);
  while (cinfo.output_scanline < cinfo.output_height) {
    JSAMPROW rp = row;
    jpeg_read_scanlines(&cinfo, &rp, 1);
    fwrite(row, 1, (size_t)w * c, stdout);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  fprintf(stderr, "%d %d %d", w, h, c);
  return 0;
}
