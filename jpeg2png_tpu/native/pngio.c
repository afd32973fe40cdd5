/* _pngio — native PNG encoder for jpeg2png_tpu.
 *
 * libpng-backed equivalent of the reference's writer (reference:
 * png.c:20-78): 8/16-bit RGB or grayscale, no interlace, big-endian
 * 16-bit samples.  Used by io/png_writer.py when available (the pure
 * zlib Python encoder is the fallback); encoding runs without the GIL
 * so batched runs overlap PNG output with the next solve.
 *
 * encode(pixels_bytes, height, width, channels, bits) -> bytes
 *   pixels: packed row-major samples, 16-bit values big-endian.
 */

#define PY_SSIZE_T_CLEAN
#include <Python.h>

#include <setjmp.h>
#include <stdlib.h>
#include <string.h>

#include <png.h>

struct sink {
    unsigned char *buf;
    size_t len;
    size_t cap;
    int oom;
};

static void sink_write(png_structp png, png_bytep data, png_size_t n) {
    struct sink *s = (struct sink *)png_get_io_ptr(png);
    if (s->oom) return;
    if (s->len + n > s->cap) {
        size_t cap = s->cap ? s->cap * 2 : 65536;
        while (cap < s->len + n) cap *= 2;
        unsigned char *nb = realloc(s->buf, cap);
        if (!nb) { s->oom = 1; return; }
        s->buf = nb;
        s->cap = cap;
    }
    memcpy(s->buf + s->len, data, n);
    s->len += n;
}

static void sink_flush(png_structp png) { (void)png; }

static PyObject *
encode(PyObject *self, PyObject *args)
{
    (void)self;
    Py_buffer pix;
    unsigned height, width, channels, bits;
    if (!PyArg_ParseTuple(args, "y*IIII", &pix, &height, &width,
                          &channels, &bits)) {
        return NULL;
    }
    if ((channels != 1 && channels != 3) || (bits != 8 && bits != 16)) {
        PyBuffer_Release(&pix);
        return PyErr_Format(PyExc_ValueError,
                            "channels must be 1 or 3, bits 8 or 16");
    }
    const size_t stride = (size_t)width * channels * (bits / 8);
    if ((size_t)pix.len != stride * height) {
        PyBuffer_Release(&pix);
        return PyErr_Format(PyExc_ValueError,
                            "pixel buffer is %zd bytes, expected %zu",
                            pix.len, stride * height);
    }

    struct sink s = {NULL, 0, 0, 0};
    volatile int failed = 0;
    png_structp png = NULL;
    png_infop info = NULL;
    png_bytep * volatile rows = NULL;

    Py_BEGIN_ALLOW_THREADS
    png = png_create_write_struct(PNG_LIBPNG_VER_STRING, NULL, NULL, NULL);
    info = png ? png_create_info_struct(png) : NULL;
    rows = malloc(sizeof(png_bytep) * height);
    if (!png || !info || !rows || setjmp(png_jmpbuf(png))) {
        failed = 1;
    } else {
        for (unsigned i = 0; i < height; i++) {
            rows[i] = (png_bytep)pix.buf + (size_t)i * stride;
        }
        png_set_write_fn(png, &s, sink_write, sink_flush);
        png_set_IHDR(png, info, width, height, bits,
                     channels == 3 ? PNG_COLOR_TYPE_RGB
                                   : PNG_COLOR_TYPE_GRAY,
                     PNG_INTERLACE_NONE, PNG_COMPRESSION_TYPE_BASE,
                     PNG_FILTER_TYPE_BASE);
        png_write_info(png, info);
        png_write_image(png, (png_bytepp)rows);
        png_write_end(png, info);
        if (s.oom) failed = 1;
    }
    Py_END_ALLOW_THREADS

    if (png) png_destroy_write_struct(&png, info ? &info : NULL);
    free(rows);
    PyBuffer_Release(&pix);

    if (failed) {
        free(s.buf);
        return PyErr_Format(PyExc_ValueError, "libpng encode failed");
    }
    PyObject *out = PyBytes_FromStringAndSize((const char *)s.buf,
                                              (Py_ssize_t)s.len);
    free(s.buf);
    return out;
}

static PyMethodDef methods[] = {
    {"encode", encode, METH_VARARGS,
     "encode(pixels, height, width, channels, bits) -> PNG bytes"},
    {NULL, NULL, 0, NULL},
};

static struct PyModuleDef module = {
    PyModuleDef_HEAD_INIT, "_pngio",
    "Native PNG encoder (libpng-backed).",
    -1, methods, NULL, NULL, NULL, NULL,
};

PyMODINIT_FUNC
PyInit__pngio(void)
{
    return PyModule_Create(&module);
}
