/* Ground-truth harness: calls the reference's quantize_trellis directly.
 *
 * stdin (binary):
 *   int32 num_blocks, int32 trellis_quant_dc, int32 ncomp_rows (rows)
 *   uint16 qtbl[64] (natural order)
 *   uint8 dc_bits[17], dc_nvals:int32, dc_vals[nvals]
 *   uint8 ac_bits[17], ac_nvals:int32, ac_vals[nvals]
 *   then per row: int16 src[num_blocks][64] (natural order), int16 last_dc_in
 * stdout: per row: int16 coef[num_blocks][64] (natural), int16 last_dc_out
 *
 * Build (from repo root):
 *   gcc -O2 -I/root/reference -I.refbuild scripts/trellis_harness.c \
 *       .refbuild/CMakeFiles/turbojpeg.dir/*.o -lm -o .bench/trellis_harness
 */
#define JPEG_INTERNALS
#include <stdio.h>
#include <stdlib.h>
#include <string.h>
#include "jinclude.h"
#include "jpeglib.h"   /* pulls jpegint.h via JPEG_INTERNALS */
#include "jchuff.h"

extern void quantize_trellis(j_compress_ptr cinfo, c_derived_tbl *dctbl,
                             c_derived_tbl *actbl, JBLOCKROW coef_blocks,
                             JBLOCKROW src, JDIMENSION num_blocks,
                             JQUANT_TBL *qtbl, double *norm_src,
                             double *norm_coef, JCOEF *last_dc_val,
                             JBLOCKROW coef_blocks_above, JBLOCKROW src_above);

static struct jpeg_error_mgr jerr;

static void readn(void *p, size_t n) {
  if (fread(p, 1, n, stdin) != n) { fprintf(stderr, "short read\n"); exit(1); }
}

int main(void) {
  struct jpeg_compress_struct cinfo;
  cinfo.err = jpeg_std_error(&jerr);
  jpeg_create_compress(&cinfo);
  cinfo.input_components = 3;
  cinfo.in_color_space = JCS_RGB;
  jpeg_set_defaults(&cinfo);

  int32_t num_blocks, dc_on, nrows;
  readn(&num_blocks, 4);
  readn(&dc_on, 4);
  readn(&nrows, 4);
  cinfo.master->trellis_quant_dc = dc_on;
  cinfo.Ss = 1;
  cinfo.Se = 63;

  JQUANT_TBL *qtbl = jpeg_alloc_quant_table((j_common_ptr)&cinfo);
  readn(qtbl->quantval, 64 * 2);

  JHUFF_TBL *dtbl = jpeg_alloc_huff_table((j_common_ptr)&cinfo);
  int32_t nv;
  readn(dtbl->bits, 17);
  readn(&nv, 4);
  readn(dtbl->huffval, nv);
  JHUFF_TBL *atbl = jpeg_alloc_huff_table((j_common_ptr)&cinfo);
  readn(atbl->bits, 17);
  readn(&nv, 4);
  readn(atbl->huffval, nv);

  cinfo.dc_huff_tbl_ptrs[0] = dtbl;
  cinfo.ac_huff_tbl_ptrs[0] = atbl;
  c_derived_tbl *ddtbl = NULL, *datbl = NULL;
  jpeg_make_c_derived_tbl(&cinfo, TRUE, 0, &ddtbl);
  jpeg_make_c_derived_tbl(&cinfo, FALSE, 0, &datbl);

  JBLOCKROW src = malloc(sizeof(JBLOCK) * num_blocks);
  JBLOCKROW coef = malloc(sizeof(JBLOCK) * num_blocks);
  double norm_src[64] = {0}, norm_coef[64] = {0};

  for (int r = 0; r < nrows; r++) {
    JCOEF last_dc;
    readn(src, sizeof(JBLOCK) * num_blocks);
    readn(&last_dc, 2);
    memset(coef, 0, sizeof(JBLOCK) * num_blocks);
    quantize_trellis(&cinfo, ddtbl, datbl, coef, src,
                     (JDIMENSION)num_blocks, qtbl, norm_src, norm_coef,
                     &last_dc, NULL, NULL);
    fwrite(coef, 1, sizeof(JBLOCK) * num_blocks, stdout);
    fwrite(&last_dc, 1, 2, stdout);
  }
  fflush(stdout);
  return 0;
}
