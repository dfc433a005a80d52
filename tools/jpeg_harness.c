/* Test harness driving the SYSTEM libjpeg (the independent implementation)
 * for cross-checking the engine's pure-Python JPEG codec — in particular
 * the T.81 arithmetic (SOF9) entropy coder in sources/jpeg_arith.py, whose
 * state table is already byte-verified against this library's exported
 * jpeg_aritab but whose STREAMS had never met a libjpeg-produced stream.
 *
 * Modes (all byte streams on stdin/stdout, errors exit(1) via the default
 * error manager — this runs as a subprocess under pytest):
 *
 *   encode <w> <h> <ncomp> <quality> <arith01>
 *       raw 8-bit pixels (gray or interleaved RGB) -> JPEG. arith=1 gives
 *       a real libjpeg SOF9 sequential arithmetic stream with libjpeg's
 *       own quant tables and default 4:2:0 subsampling for color.
 *   decode
 *       JPEG -> 12-byte header (w, h, ncomp as LE uint32) + raw pixels
 *       (libjpeg's reference pixel output for tolerance comparisons).
 *   transcode <arith01>
 *       JPEG -> JPEG with IDENTICAL quantized DCT coefficients
 *       (jpeg_read_coefficients -> jpeg_write_coefficients), entropy layer
 *       switched to arithmetic (1) or optimized Huffman (0). Lossless at
 *       the coefficient level, so engine-decoded pixels of input and
 *       output must be BIT-IDENTICAL — an exact oracle for the arithmetic
 *       entropy layer in both directions.
 *
 * Compiled on demand by tests/test_jpeg_arith_libjpeg.py (env-gated on
 * gcc + jpeglib.h); not part of the shipped package.
 */
#include <stdio.h>
#include <stdlib.h>
#include <string.h>
#include <jpeglib.h>

static void die(const char *msg) {
    fprintf(stderr, "jpeg_harness: %s\n", msg);
    exit(1);
}

static unsigned char *read_stream(FILE *f, unsigned long *len) {
    unsigned long cap = 1 << 20, n = 0;
    unsigned char *buf = malloc(cap);
    if (!buf) die("oom");
    for (;;) {
        size_t got = fread(buf + n, 1, cap - n, f);
        n += got;
        if (got == 0) break;
        if (n == cap) {
            cap *= 2;
            buf = realloc(buf, cap);
            if (!buf) die("oom");
        }
    }
    *len = n;
    return buf;
}

static void put_u32(unsigned long v) {
    unsigned char b[4] = {v & 255, (v >> 8) & 255, (v >> 16) & 255,
                          (v >> 24) & 255};
    fwrite(b, 1, 4, stdout);
}

static int mode_encode(int w, int h, int ncomp, int quality, int arith) {
    struct jpeg_compress_struct cinfo;
    struct jpeg_error_mgr jerr;
    unsigned long need = (unsigned long)w * h * ncomp, len;
    unsigned char *raw = read_stream(stdin, &len);
    if (len != need) die("raw pixel byte count mismatch");
    cinfo.err = jpeg_std_error(&jerr);
    jpeg_create_compress(&cinfo);
    jpeg_stdio_dest(&cinfo, stdout);
    cinfo.image_width = w;
    cinfo.image_height = h;
    cinfo.input_components = ncomp;
    cinfo.in_color_space = ncomp == 3 ? JCS_RGB : JCS_GRAYSCALE;
    jpeg_set_defaults(&cinfo);
    jpeg_set_quality(&cinfo, quality, TRUE);
    cinfo.arith_code = arith ? TRUE : FALSE;
    jpeg_start_compress(&cinfo, TRUE);
    while (cinfo.next_scanline < cinfo.image_height) {
        JSAMPROW row = raw + (unsigned long)cinfo.next_scanline * w * ncomp;
        jpeg_write_scanlines(&cinfo, &row, 1);
    }
    jpeg_finish_compress(&cinfo);
    jpeg_destroy_compress(&cinfo);
    free(raw);
    return 0;
}

static int mode_decode(int fancy) {
    struct jpeg_decompress_struct cinfo;
    struct jpeg_error_mgr jerr;
    cinfo.err = jpeg_std_error(&jerr);
    jpeg_create_decompress(&cinfo);
    jpeg_stdio_src(&cinfo, stdin);
    jpeg_read_header(&cinfo, TRUE);
    /* fancy=0 -> box chroma upsampling, the engine decoder's method; the
     * default triangular filter differs by design, not by bug */
    cinfo.do_fancy_upsampling = fancy ? TRUE : FALSE;
    jpeg_start_decompress(&cinfo);
    put_u32(cinfo.output_width);
    put_u32(cinfo.output_height);
    put_u32(cinfo.output_components);
    {
        unsigned long stride =
            (unsigned long)cinfo.output_width * cinfo.output_components;
        unsigned char *row = malloc(stride);
        if (!row) die("oom");
        while (cinfo.output_scanline < cinfo.output_height) {
            JSAMPROW r = row;
            jpeg_read_scanlines(&cinfo, &r, 1);
            fwrite(row, 1, stride, stdout);
        }
        free(row);
    }
    jpeg_finish_decompress(&cinfo);
    jpeg_destroy_decompress(&cinfo);
    return 0;
}

static int mode_transcode(int arith) {
    struct jpeg_decompress_struct srcinfo;
    struct jpeg_compress_struct dstinfo;
    struct jpeg_error_mgr jsrcerr, jdsterr;
    jvirt_barray_ptr *coefs;
    srcinfo.err = jpeg_std_error(&jsrcerr);
    jpeg_create_decompress(&srcinfo);
    dstinfo.err = jpeg_std_error(&jdsterr);
    jpeg_create_compress(&dstinfo);
    jpeg_stdio_src(&srcinfo, stdin);
    jpeg_read_header(&srcinfo, TRUE);
    coefs = jpeg_read_coefficients(&srcinfo);
    jpeg_copy_critical_parameters(&srcinfo, &dstinfo);
    dstinfo.arith_code = arith ? TRUE : FALSE;
    if (!arith) dstinfo.optimize_coding = TRUE;
    jpeg_stdio_dest(&dstinfo, stdout);
    jpeg_write_coefficients(&dstinfo, coefs);
    jpeg_finish_compress(&dstinfo);
    jpeg_destroy_compress(&dstinfo);
    jpeg_finish_decompress(&srcinfo);
    jpeg_destroy_decompress(&srcinfo);
    return 0;
}

int main(int argc, char **argv) {
    if (argc >= 7 && !strcmp(argv[1], "encode"))
        return mode_encode(atoi(argv[2]), atoi(argv[3]), atoi(argv[4]),
                           atoi(argv[5]), atoi(argv[6]));
    if (argc >= 2 && !strcmp(argv[1], "decode"))
        return mode_decode(argc >= 3 ? atoi(argv[2]) : 1);
    if (argc >= 3 && !strcmp(argv[1], "transcode"))
        return mode_transcode(atoi(argv[2]));
    die("usage: encode w h ncomp quality arith | decode | transcode arith");
    return 1;
}
