/* make_arith — transcode a JPEG to arithmetic entropy coding.
 *
 * The jpegtran -arithmetic analog, used once to mint
 * tests/fixtures/*_arith.jpg (the coefficients are copied verbatim, so
 * the arithmetic twin decodes to byte-identical DCT tensors — the
 * fixture gate in tests/test_io.py).  Reference decodes whatever
 * libjpeg decodes (jpeg.c:49); this proves our reader handles
 * arithmetic-coded streams end-to-end.
 *
 * Build: gcc -O2 -o /tmp/make_arith tools/make_arith.c -ljpeg
 * Run:   /tmp/make_arith in.jpg out_arith.jpg
 */
#include <stdio.h>
#include <stdlib.h>
#include <jpeglib.h>

int main(int argc, char **argv)
{
    if (argc != 3) {
        fprintf(stderr, "usage: %s in.jpg out.jpg\n", argv[0]);
        return 2;
    }
    FILE *in = fopen(argv[1], "rb");
    if (!in) { perror("open in"); return 1; }
    FILE *out = fopen(argv[2], "wb");
    if (!out) { perror("open out"); return 1; }

    struct jpeg_decompress_struct src;
    struct jpeg_compress_struct dst;
    struct jpeg_error_mgr jerr_s, jerr_d;

    src.err = jpeg_std_error(&jerr_s);
    jpeg_create_decompress(&src);
    jpeg_stdio_src(&src, in);
    jpeg_read_header(&src, TRUE);
    jvirt_barray_ptr *coefs = jpeg_read_coefficients(&src);
    if (!coefs) { fprintf(stderr, "read_coefficients failed\n"); return 1; }

    dst.err = jpeg_std_error(&jerr_d);
    jpeg_create_compress(&dst);
    jpeg_copy_critical_parameters(&src, &dst);
    dst.arith_code = TRUE;           /* the point of this program */
    dst.optimize_coding = FALSE;
    jpeg_stdio_dest(&dst, out);
    jpeg_write_coefficients(&dst, coefs);
    jpeg_finish_compress(&dst);
    jpeg_destroy_compress(&dst);
    jpeg_finish_decompress(&src);
    jpeg_destroy_decompress(&src);
    fclose(in);
    fclose(out);
    return 0;
}
