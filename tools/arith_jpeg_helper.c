/* Interop test helper for sparkfuse's arithmetic-coded JPEG support.
 *
 * Compiled at TEST time against the system libjpeg (libjpeg-turbo) when
 * gcc + jpeglib.h are present (tests skip otherwise); never shipped as a
 * runtime dependency.  It gives the pytest suite a FOREIGN implementation
 * to interoperate with:
 *   enc  W H NC QUALITY SUBSAMP RESTART PROG in.raw out.jpg
 *        - encode raw 8-bit pixels (gray or RGB rows) with arith_code=TRUE
 *          (SOF9, or SOF10 when PROG=1)
 *   dec  in.jpg out.raw
 *        - decode any JPEG libjpeg accepts; prints "W H NC" on stdout
 *   coef in.jpg out.bin
 *        - dump the QUANTIZED coefficient planes (the entropy layer's
 *          exact content, immune to IDCT rounding differences): prints
 *          "NC" then per component "ci wblocks hblocks", writes each
 *          block's 64 little-endian int16 values in row-major block order
 */
#include <stdio.h>
#include <stdlib.h>
#include <string.h>
#include <jpeglib.h>

static void die(const char *msg) { fprintf(stderr, "%s\n", msg); exit(2); }

int main(int argc, char **argv)
{
  if (argc < 2) die("usage: enc|dec|coef ...");

  if (!strcmp(argv[1], "enc")) {
    if (argc != 11) die("enc W H NC QUALITY SUBSAMP RESTART PROG in out");
    int W = atoi(argv[2]), H = atoi(argv[3]), NC = atoi(argv[4]);
    int quality = atoi(argv[5]), sub = atoi(argv[6]), rst = atoi(argv[7]);
    int prog = atoi(argv[8]);
    long n = (long)W * H * NC;
    unsigned char *buf = malloc(n);
    FILE *fi = fopen(argv[9], "rb");
    if (!fi || fread(buf, 1, n, fi) != (size_t)n) die("short raw input");
    fclose(fi);
    struct jpeg_compress_struct cinfo;
    struct jpeg_error_mgr jerr;
    cinfo.err = jpeg_std_error(&jerr);
    jpeg_create_compress(&cinfo);
    FILE *fo = fopen(argv[10], "wb");
    if (!fo) die("cannot open output");
    jpeg_stdio_dest(&cinfo, fo);
    cinfo.image_width = W;
    cinfo.image_height = H;
    cinfo.input_components = NC;
    cinfo.in_color_space = NC == 1 ? JCS_GRAYSCALE : JCS_RGB;
    jpeg_set_defaults(&cinfo);
    jpeg_set_quality(&cinfo, quality, TRUE);
    cinfo.arith_code = TRUE;
    cinfo.restart_interval = rst;
    if (NC == 3) {
      cinfo.comp_info[0].h_samp_factor = sub;
      cinfo.comp_info[0].v_samp_factor = sub;
    }
    if (prog)
      jpeg_simple_progression(&cinfo);
    jpeg_start_compress(&cinfo, TRUE);
    while (cinfo.next_scanline < cinfo.image_height) {
      JSAMPROW row = buf + (long)cinfo.next_scanline * W * NC;
      jpeg_write_scanlines(&cinfo, &row, 1);
    }
    jpeg_finish_compress(&cinfo);
    jpeg_destroy_compress(&cinfo);
    fclose(fo);
    free(buf);
    return 0;
  }

  /* dec / coef share the decompress setup */
  FILE *fi = fopen(argv[2], "rb");
  if (!fi) die("cannot open input jpeg");
  struct jpeg_decompress_struct cinfo;
  struct jpeg_error_mgr jerr;
  cinfo.err = jpeg_std_error(&jerr);
  jpeg_create_decompress(&cinfo);
  jpeg_stdio_src(&cinfo, fi);
  jpeg_read_header(&cinfo, TRUE);

  if (!strcmp(argv[1], "coef")) {
    jvirt_barray_ptr *coefs = jpeg_read_coefficients(&cinfo);
    printf("%d\n", cinfo.num_components);
    FILE *fo = fopen(argv[3], "wb");
    if (!fo) die("cannot open output");
    for (int ci = 0; ci < cinfo.num_components; ci++) {
      jpeg_component_info *comp = cinfo.comp_info + ci;
      printf("%d %d %d\n", ci, (int)comp->width_in_blocks,
             (int)comp->height_in_blocks);
      for (JDIMENSION by = 0; by < comp->height_in_blocks; by++) {
        JBLOCKARRAY rows = (*cinfo.mem->access_virt_barray)(
            (j_common_ptr)&cinfo, coefs[ci], by, 1, FALSE);
        for (JDIMENSION bx = 0; bx < comp->width_in_blocks; bx++)
          for (int k = 0; k < DCTSIZE2; k++) {
            short v = (short)rows[0][bx][k];
            unsigned char le[2] = { (unsigned char)(v & 0xFF),
                                    (unsigned char)((v >> 8) & 0xFF) };
            fwrite(le, 1, 2, fo);
          }
      }
    }
    fclose(fo);
    jpeg_finish_decompress(&cinfo);
  } else if (!strcmp(argv[1], "dec")) {
    jpeg_start_decompress(&cinfo);
    int W = cinfo.output_width, H = cinfo.output_height;
    int NC = cinfo.output_components;
    unsigned char *buf = malloc((long)W * H * NC);
    while (cinfo.output_scanline < cinfo.output_height) {
      JSAMPROW row = buf + (long)cinfo.output_scanline * W * NC;
      jpeg_read_scanlines(&cinfo, &row, 1);
    }
    jpeg_finish_decompress(&cinfo);
    printf("%d %d %d\n", W, H, NC);
    FILE *fo = fopen(argv[3], "wb");
    if (!fo) die("cannot open output");
    fwrite(buf, 1, (long)W * H * NC, fo);
    fclose(fo);
    free(buf);
  } else {
    die("unknown mode");
  }
  jpeg_destroy_decompress(&cinfo);
  fclose(fi);
  return 0;
}
