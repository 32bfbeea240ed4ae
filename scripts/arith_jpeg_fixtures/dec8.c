/* Decode a JPEG from stdin at scale 1/8 to an 8-bit PGM on stdout.
 * The 1/8-scale output is libjpeg's jpeg_idct_1x1 per 8x8 block —
 * DESCALE(DC*Q[0], 3) + 128 — i.e. exactly the DC-only reconstruction
 * the pure-Python DC legs produce, making this the external oracle for
 * tests/test_jpeg_dc_sweep.py. Color inputs decode with
 * out_color_space = JCS_GRAYSCALE (the Y component), matching the
 * decoder's luma contract. Build: gcc -O2 -o dec8 dec8.c -ljpeg */
#include <stdio.h>
#include <stdlib.h>
#include <jpeglib.h>

int main(void) {
  size_t cap = 1 << 20, len = 0, r;
  unsigned char *buf = malloc(cap);
  while ((r = fread(buf + len, 1, cap - len, stdin)) > 0) {
    len += r;
    if (len == cap) { cap *= 2; buf = realloc(buf, cap); }
  }
  struct jpeg_decompress_struct cinfo;
  struct jpeg_error_mgr jerr;
  cinfo.err = jpeg_std_error(&jerr);
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, buf, len);
  jpeg_read_header(&cinfo, TRUE);
  cinfo.scale_num = 1;
  cinfo.scale_denom = 8;
  cinfo.out_color_space = JCS_GRAYSCALE;
  jpeg_start_decompress(&cinfo);
  int w = cinfo.output_width, h = cinfo.output_height;
  printf("P5\n%d %d\n255\n", w, h);
  unsigned char *row = malloc((size_t)w * cinfo.output_components);
  while (cinfo.output_scanline < cinfo.output_height) {
    JSAMPROW rp = row;
    jpeg_read_scanlines(&cinfo, &rp, 1);
    fwrite(row, 1, (size_t)w, stdout);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  return 0;
}
