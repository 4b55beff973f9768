/* Minimal libwebp reference helper for cross-checking the pure-NumPy
 * VP8L (lossless WebP) decoder in pg_cjk_parser_spark/ops/
 * multimodal.py against the canonical implementation.  The container
 * ships libwebp.so.7 but no dev headers, so the public-ABI
 * prototypes are declared by hand; the test suite compiles this on
 * demand linking the .so directly and skips when unavailable.
 *
 * Usage:
 *   webp_ref_helper encode W H < raw RGBA  > lossless .webp
 *   webp_ref_helper decode          < .webp > "W H\n" + raw RGBA
 */
#include <stdio.h>
#include <stdlib.h>
#include <string.h>
#include <stddef.h>

extern size_t WebPEncodeLosslessRGBA(const unsigned char *rgba, int w,
                                     int h, int stride,
                                     unsigned char **output);
extern unsigned char *WebPDecodeRGBA(const unsigned char *data,
                                     size_t size, int *w, int *h);
extern void WebPFree(void *ptr);

static unsigned char *read_all(FILE *f, size_t *n) {
    size_t cap = 1 << 16, len = 0, got;
    unsigned char *buf = malloc(cap);
    while ((got = fread(buf + len, 1, cap - len, f)) > 0) {
        len += got;
        if (len == cap) { cap *= 2; buf = realloc(buf, cap); }
    }
    *n = len;
    return buf;
}

int main(int argc, char **argv) {
    if (argc >= 4 && !strcmp(argv[1], "encode")) {
        int w = atoi(argv[2]), h = atoi(argv[3]);
        size_t n, out_n;
        unsigned char *rgba = read_all(stdin, &n), *out = NULL;
        if ((long)n < (long)w * h * 4) return 2;
        out_n = WebPEncodeLosslessRGBA(rgba, w, h, w * 4, &out);
        if (!out_n || !out) return 3;
        fwrite(out, 1, out_n, stdout);
        WebPFree(out);
        free(rgba);
        return 0;
    }
    if (argc >= 2 && !strcmp(argv[1], "decode")) {
        size_t n;
        int w = 0, h = 0;
        unsigned char *data = read_all(stdin, &n);
        unsigned char *px = WebPDecodeRGBA(data, n, &w, &h);
        if (!px) return 3;
        printf("%d %d\n", w, h);
        fwrite(px, 1, (size_t)w * h * 4, stdout);
        WebPFree(px);
        free(data);
        return 0;
    }
    fprintf(stderr, "usage: %s encode W H | decode\n", argv[0]);
    return 64;
}
