/* Minimal libtiff reference helper for cross-checking the pure-NumPy
 * TIFF decoder in pg_cjk_parser_spark/ops/multimodal.py against the
 * canonical implementation.  The container ships libtiff.so.6 but no
 * dev headers, so the handful of public-ABI prototypes used here are
 * declared by hand; the test suite compiles this on demand, linking
 * the .so directly, and skips when gcc or the library is missing.
 *
 * Usage:
 *   tiff_ref_helper decode <file>                > "W H SPP\n" + raw samples
 *   tiff_ref_helper encode <file> W H SPP COMP PRED < raw samples
 *     COMP: 1 = none, 5 = LZW, 32773 = PackBits;  PRED: 1 or 2
 */
#include <stdio.h>
#include <stdlib.h>
#include <string.h>

typedef struct tiff TIFF;
extern TIFF *TIFFOpen(const char *, const char *);
extern void TIFFClose(TIFF *);
extern int TIFFGetField(TIFF *, unsigned int, ...);
extern int TIFFSetField(TIFF *, unsigned int, ...);
extern int TIFFReadScanline(TIFF *, void *, unsigned int, unsigned short);
extern int TIFFWriteScanline(TIFF *, void *, unsigned int, unsigned short);

#define TAG_WIDTH 256
#define TAG_LENGTH 257
#define TAG_BPS 258
#define TAG_COMP 259
#define TAG_PHOTO 262
#define TAG_SPP 277
#define TAG_RPS 278
#define TAG_PLANAR 284
#define TAG_PRED 317

static int do_decode(const char *path) {
    TIFF *t = TIFFOpen(path, "r");
    unsigned int w = 0, h = 0, row;
    unsigned short spp = 1, bps = 8;
    unsigned char *buf;
    if (!t) return 1;
    TIFFGetField(t, TAG_WIDTH, &w);
    TIFFGetField(t, TAG_LENGTH, &h);
    TIFFGetField(t, TAG_SPP, &spp);
    TIFFGetField(t, TAG_BPS, &bps);
    if (bps != 8) { fprintf(stderr, "bps %d\n", bps); return 2; }
    printf("%u %u %u\n", w, h, (unsigned)spp);
    buf = malloc((size_t)w * spp);
    for (row = 0; row < h; row++) {
        if (TIFFReadScanline(t, buf, row, 0) < 0) return 3;
        fwrite(buf, 1, (size_t)w * spp, stdout);
    }
    free(buf);
    TIFFClose(t);
    return 0;
}

static int do_encode(const char *path, int w, int h, int spp,
                     int comp, int pred) {
    TIFF *t = TIFFOpen(path, "w");
    unsigned char *buf = malloc((size_t)w * spp);
    int row;
    if (!t) return 1;
    TIFFSetField(t, TAG_WIDTH, (unsigned int)w);
    TIFFSetField(t, TAG_LENGTH, (unsigned int)h);
    TIFFSetField(t, TAG_BPS, (unsigned short)8);
    TIFFSetField(t, TAG_SPP, (unsigned short)spp);
    TIFFSetField(t, TAG_COMP, (unsigned short)comp);
    TIFFSetField(t, TAG_PHOTO, (unsigned short)(spp >= 3 ? 2 : 1));
    TIFFSetField(t, TAG_PLANAR, (unsigned short)1);
    TIFFSetField(t, TAG_RPS, (unsigned int)(h > 4 ? 4 : h)); /* multi-strip */
    if ((comp == 5 || comp == 8) && pred == 2)
        TIFFSetField(t, TAG_PRED, (unsigned short)2);
    for (row = 0; row < h; row++) {
        if (fread(buf, 1, (size_t)w * spp, stdin) != (size_t)w * spp)
            return 2;
        if (TIFFWriteScanline(t, buf, row, 0) < 0) return 3;
    }
    free(buf);
    TIFFClose(t);
    return 0;
}

int main(int argc, char **argv) {
    if (argc >= 3 && !strcmp(argv[1], "decode"))
        return do_decode(argv[2]);
    if (argc >= 8 && !strcmp(argv[1], "encode"))
        return do_encode(argv[2], atoi(argv[3]), atoi(argv[4]),
                         atoi(argv[5]), atoi(argv[6]), atoi(argv[7]));
    fprintf(stderr, "usage: %s decode <f> | encode <f> W H SPP COMP PRED\n",
            argv[0]);
    return 64;
}
