/* Minimal libjpeg reference helper for cross-checking the pure-NumPy
 * JPEG codec in pg_cjk_parser_spark/ops/multimodal.py against the
 * canonical implementation.  Compiled on demand by the test suite
 * (skipped when gcc or libjpeg is unavailable).
 *
 * Usage:
 *   jpeg_ref_helper decode            < in.jpg  > "W H\n" + raw gray
 *   jpeg_ref_helper encode W H Q MODE < raw     > out.jpg
 *     MODE: gray (raw = W*H gray), 444 or 420 (raw = W*H*3 RGB);
 *     prefix "prog-" (prog-gray / prog-444 / prog-420) emits a
 *     progressive (SOF2) stream via jpeg_simple_progression
 */
#include <stdio.h>
#include <stdlib.h>
#include <string.h>
#include <jpeglib.h>

static unsigned char *read_all(FILE *f, unsigned long *n) {
    unsigned long cap = 1 << 16, len = 0;
    unsigned char *buf = malloc(cap);
    size_t got;
    while ((got = fread(buf + len, 1, cap - len, f)) > 0) {
        len += got;
        if (len == cap) { cap *= 2; buf = realloc(buf, cap); }
    }
    *n = len;
    return buf;
}

static int do_decode(void) {
    struct jpeg_decompress_struct cinfo;
    struct jpeg_error_mgr jerr;
    unsigned long n;
    unsigned char *data = read_all(stdin, &n);

    cinfo.err = jpeg_std_error(&jerr);
    jpeg_create_decompress(&cinfo);
    jpeg_mem_src(&cinfo, data, n);
    jpeg_read_header(&cinfo, TRUE);
    cinfo.out_color_space = JCS_GRAYSCALE; /* luma = Y plane */
    jpeg_start_decompress(&cinfo);
    printf("%u %u\n", cinfo.output_width, cinfo.output_height);
    {
        unsigned char *row = malloc(cinfo.output_width);
        while (cinfo.output_scanline < cinfo.output_height) {
            jpeg_read_scanlines(&cinfo, &row, 1);
            fwrite(row, 1, cinfo.output_width, stdout);
        }
        free(row);
    }
    jpeg_finish_decompress(&cinfo);
    jpeg_destroy_decompress(&cinfo);
    free(data);
    return 0;
}

static int do_encode(int w, int h, int q, const char *mode) {
    struct jpeg_compress_struct cinfo;
    struct jpeg_error_mgr jerr;
    int progressive = strncmp(mode, "prog-", 5) == 0;
    int gray;
    if (progressive)
        mode += 5;
    gray = strcmp(mode, "gray") == 0;
    int ch = gray ? 1 : 3;
    unsigned long need = (unsigned long)w * h * ch, n;
    unsigned char *raw = read_all(stdin, &n);
    unsigned char *out = NULL;
    unsigned long outn = 0;
    int y;

    if (n < need) { fprintf(stderr, "short raw input\n"); return 2; }
    cinfo.err = jpeg_std_error(&jerr);
    jpeg_create_compress(&cinfo);
    jpeg_mem_dest(&cinfo, &out, &outn);
    cinfo.image_width = w;
    cinfo.image_height = h;
    cinfo.input_components = ch;
    cinfo.in_color_space = gray ? JCS_GRAYSCALE : JCS_RGB;
    jpeg_set_defaults(&cinfo);
    jpeg_set_quality(&cinfo, q, TRUE);
    if (!gray) {
        int sub = strcmp(mode, "420") == 0;
        cinfo.comp_info[0].h_samp_factor = sub ? 2 : 1;
        cinfo.comp_info[0].v_samp_factor = sub ? 2 : 1;
        cinfo.comp_info[1].h_samp_factor = 1;
        cinfo.comp_info[1].v_samp_factor = 1;
        cinfo.comp_info[2].h_samp_factor = 1;
        cinfo.comp_info[2].v_samp_factor = 1;
    }
    if (progressive)
        jpeg_simple_progression(&cinfo);
    jpeg_start_compress(&cinfo, TRUE);
    for (y = 0; y < h; y++) {
        JSAMPROW row = raw + (unsigned long)y * w * ch;
        jpeg_write_scanlines(&cinfo, &row, 1);
    }
    jpeg_finish_compress(&cinfo);
    fwrite(out, 1, outn, stdout);
    jpeg_destroy_compress(&cinfo);
    free(raw);
    return 0;
}

int main(int argc, char **argv) {
    if (argc >= 2 && strcmp(argv[1], "decode") == 0)
        return do_decode();
    if (argc >= 6 && strcmp(argv[1], "encode") == 0)
        return do_encode(atoi(argv[2]), atoi(argv[3]), atoi(argv[4]),
                         argv[5]);
    fprintf(stderr, "usage: %s decode|encode W H Q MODE\n", argv[0]);
    return 2;
}
