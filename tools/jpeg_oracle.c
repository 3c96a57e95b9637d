/* TEST-ONLY differential oracle for the pure-Python JPEG codec work
 * (same role as tools/webp_oracle.py for VP8): drive the system
 * libjpeg through its public API to
 *
 *   encode <w> <h> <comps> <quality> <arith> <restart_rows> <subsamp>
 *       raw pixels on stdin (w*h*comps bytes, RGB or gray)
 *       -> JPEG bytes on stdout (arith=1 -> SOF9 arithmetic coding)
 *
 *   coefs
 *       JPEG bytes on stdin -> exact quantized DCT coefficients on
 *       stdout: "ncomp\n" then per component "wb hb\n" followed by
 *       wb*hb*64 little-endian int16 in block-raster, natural
 *       (row-major 8x8) order.  This isolates the ENTROPY layer:
 *       two decoders agree here iff their arithmetic/Huffman decode
 *       is bit-exact, independent of IDCT rounding.
 *
 * Production code stays pure Python; this compiles on demand in the
 * test environment (skipped where gcc/libjpeg are absent — committed
 * goldens carry the evidence there).
 */
#include <stdio.h>
#include <stdlib.h>
#include <string.h>
#include <jpeglib.h>

static unsigned char *read_all(FILE *f, unsigned long *n) {
  unsigned long cap = 1 << 20, len = 0;
  unsigned char *buf = malloc(cap);
  size_t got;
  while ((got = fread(buf + len, 1, cap - len, f)) > 0) {
    len += got;
    if (len == cap) { cap <<= 1; buf = realloc(buf, cap); }
  }
  *n = len;
  return buf;
}

static int do_encode(int argc, char **argv) {
  int w = atoi(argv[2]), h = atoi(argv[3]), comps = atoi(argv[4]);
  int quality = atoi(argv[5]), arith = atoi(argv[6]);
  int restart_rows = atoi(argv[7]), subsamp = atoi(argv[8]);
  int progressive = argc > 9 ? atoi(argv[9]) : 0;
  unsigned long rawlen, sz = 0;
  unsigned char *raw = read_all(stdin, &rawlen), *buf = NULL;
  struct jpeg_compress_struct cinfo;
  struct jpeg_error_mgr jerr;

  if (rawlen < (unsigned long)w * h * comps) { fprintf(stderr, "short input\n"); return 2; }
  cinfo.err = jpeg_std_error(&jerr);
  jpeg_create_compress(&cinfo);
  jpeg_mem_dest(&cinfo, &buf, &sz);
  cinfo.image_width = w;
  cinfo.image_height = h;
  cinfo.input_components = comps;
  cinfo.in_color_space = comps == 1 ? JCS_GRAYSCALE : JCS_RGB;
  jpeg_set_defaults(&cinfo);
  cinfo.arith_code = arith ? TRUE : FALSE;
  jpeg_set_quality(&cinfo, quality, TRUE);
  if (comps == 3) {
    cinfo.comp_info[0].h_samp_factor = subsamp;
    cinfo.comp_info[0].v_samp_factor = subsamp;
    cinfo.comp_info[1].h_samp_factor = 1;
    cinfo.comp_info[1].v_samp_factor = 1;
    cinfo.comp_info[2].h_samp_factor = 1;
    cinfo.comp_info[2].v_samp_factor = 1;
  }
  cinfo.restart_in_rows = restart_rows;
  if (progressive)
    jpeg_simple_progression(&cinfo); /* + arith=1 -> SOF10 */
  jpeg_start_compress(&cinfo, TRUE);
  while (cinfo.next_scanline < cinfo.image_height) {
    JSAMPROW row = raw + (size_t)cinfo.next_scanline * w * comps;
    jpeg_write_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_compress(&cinfo);
  jpeg_destroy_compress(&cinfo);
  fwrite(buf, 1, sz, stdout);
  return 0;
}

static int do_coefs(void) {
  unsigned long len;
  unsigned char *data = read_all(stdin, &len);
  struct jpeg_decompress_struct cinfo;
  struct jpeg_error_mgr jerr;
  jvirt_barray_ptr *coefs;
  int ci;

  cinfo.err = jpeg_std_error(&jerr);
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, data, len);
  jpeg_read_header(&cinfo, TRUE);
  coefs = jpeg_read_coefficients(&cinfo);
  printf("%d\n", cinfo.num_components);
  for (ci = 0; ci < cinfo.num_components; ci++) {
    jpeg_component_info *comp = cinfo.comp_info + ci;
    JDIMENSION wb = comp->width_in_blocks, hb = comp->height_in_blocks;
    JDIMENSION by;
    printf("%u %u\n", wb, hb);
    fflush(stdout);
    for (by = 0; by < hb; by++) {
      JBLOCKARRAY rows = (*cinfo.mem->access_virt_barray)
          ((j_common_ptr)&cinfo, coefs[ci], by, 1, FALSE);
      /* JCOEF is 16-bit; dump the row of blocks verbatim (natural
       * order: libjpeg's entropy decoders store via
       * jpeg_natural_order). */
      fwrite(rows[0], sizeof(JCOEF), (size_t)wb * DCTSIZE2, stdout);
      fflush(stdout);
    }
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  return 0;
}

int main(int argc, char **argv) {
  if (argc >= 9 && strcmp(argv[1], "encode") == 0)
    return do_encode(argc, argv);
  if (argc >= 2 && strcmp(argv[1], "coefs") == 0)
    return do_coefs();
  fprintf(stderr,
          "usage: jpeg_oracle encode w h comps quality arith "
          "restart_rows subsamp < raw > jpg\n"
          "       jpeg_oracle coefs < jpg > dump\n");
  return 2;
}
