/* _jpegio — native JPEG DCT-coefficient reader for jpeg2png_tpu.
 *
 * TPU-native equivalent of the reference's codec boundary
 * (reference: jpeg.c:22-80): reads the *raw quantized DCT coefficients*
 * and quantization tables via libjpeg's jpeg_read_coefficients without
 * ever pixel-decoding, so the accelerator receives the exact integer
 * lattice the optimizer needs.  Handles baseline, progressive and
 * (with libjpeg-turbo) arithmetic-coded streams; entropy decode is
 * sequential/branchy and stays on the host CPU by design
 * (SURVEY.md §7 "hard parts" #4).
 *
 * Returns plain bytes + shape metadata; the Python wrapper
 * (io/jpeg_reader.py) turns them into numpy arrays, keeping this file
 * free of the numpy C API.
 */

#define PY_SSIZE_T_CLEAN
#include <Python.h>

#include <setjmp.h>
#include <stdio.h>
#include <string.h>

#include <jpeglib.h>
#include <jerror.h>

#define MAX_WARNINGS 8

struct err_mgr {
    struct jpeg_error_mgr pub;
    jmp_buf env;
    char msg[JMSG_LENGTH_MAX];
    /* corrupt-data warnings collected during decode (the reference
     * prints these through die_output_message and keeps going,
     * jpeg.c:14-19); we collect here — plain C buffer writes, safe in
     * the no-GIL decode region — and surface them on the result */
    int n_warnings;
    char warnings[MAX_WARNINGS][JMSG_LENGTH_MAX];
};

static void on_error_exit(j_common_ptr cinfo) {
    struct err_mgr *err = (struct err_mgr *)cinfo->err;
    (*cinfo->err->format_message)(cinfo, err->msg);
    longjmp(err->env, 1);
}

static void on_emit_message(j_common_ptr cinfo, int msg_level) {
    struct err_mgr *err = (struct err_mgr *)cinfo->err;
    if (msg_level < 0) {
        /* warning (e.g. "Corrupt JPEG data", "Premature end of JPEG
         * file"): the file still decodes, but the caller should know */
        if (err->n_warnings < MAX_WARNINGS) {
            (*cinfo->err->format_message)(
                cinfo, err->warnings[err->n_warnings]);
        }
        err->n_warnings++;
        cinfo->err->num_warnings++;   /* keep libjpeg's own counter */
    }
    /* trace messages (msg_level > 0) stay suppressed */
}

static PyObject *
read_coefficients(PyObject *self, PyObject *args)
{
    (void)self;
    Py_buffer buf;
    if (!PyArg_ParseTuple(args, "y*", &buf)) {
        return NULL;
    }

    struct jpeg_decompress_struct d;
    struct err_mgr err;
    /* volatile: assigned between setjmp and a potential longjmp */
    PyObject * volatile components = NULL;
    PyObject *result = NULL;

    d.err = jpeg_std_error(&err.pub);
    err.pub.error_exit = on_error_exit;
    err.pub.emit_message = on_emit_message;
    err.n_warnings = 0;

    if (setjmp(err.env)) {
        jpeg_destroy_decompress(&d);
        Py_XDECREF(components);
        PyBuffer_Release(&buf);
        PyErr_Format(PyExc_ValueError, "libjpeg error: %s", err.msg);
        return NULL;
    }

    jpeg_create_decompress(&d);
    jpeg_mem_src(&d, (const unsigned char *)buf.buf, (unsigned long)buf.len);
    jpeg_read_header(&d, TRUE);

    const unsigned image_h = d.image_height;
    const unsigned image_w = d.image_width;
    const int ncomp = d.num_components;

    if (ncomp < 1 || ncomp > 4) {
        jpeg_destroy_decompress(&d);
        PyBuffer_Release(&buf);
        return PyErr_Format(PyExc_ValueError,
                            "unsupported number of components: %d", ncomp);
    }

    /* quant tables first, with the reference's validation
     * (jpeg.c:36-47): slot index sane, table present, no zero entries */
    uint16_t quant[4][DCTSIZE2];
    for (int c = 0; c < ncomp; c++) {
        int tno = d.comp_info[c].quant_tbl_no;
        if (tno < 0 || tno >= NUM_QUANT_TBLS) {
            jpeg_destroy_decompress(&d);
            PyBuffer_Release(&buf);
            return PyErr_Format(PyExc_ValueError,
                                "weird jpeg: invalid quant_tbl_no");
        }
        JQUANT_TBL *t = d.quant_tbl_ptrs[tno];
        if (!t) {
            jpeg_destroy_decompress(&d);
            PyBuffer_Release(&buf);
            return PyErr_Format(PyExc_ValueError,
                                "weird jpeg: no quant table pointer");
        }
        for (int j = 0; j < DCTSIZE2; j++) {
            if (t->quantval[j] == 0) {
                jpeg_destroy_decompress(&d);
                PyBuffer_Release(&buf);
                return PyErr_Format(PyExc_ValueError,
                                    "invalid quantization table");
            }
            quant[c][j] = t->quantval[j];
        }
    }

    /* full entropy decode of all scans into virtual coefficient arrays.
     * This is the expensive host-side stage for big/progressive files;
     * drop the GIL so a thread pool can decode a batch in parallel
     * (the reference gets this from its OpenMP file loop,
     * jpeg2png.c:330-337).  A libjpeg error during the no-GIL region
     * longjmps to a scoped setjmp that only sets a flag — Python C API
     * calls must wait until the GIL is re-acquired. */
    jvirt_barray_ptr * volatile coef_arrays = NULL;
    volatile int decode_failed = 0;
    Py_BEGIN_ALLOW_THREADS
    if (setjmp(err.env)) {
        decode_failed = 1;
    } else {
        coef_arrays = jpeg_read_coefficients(&d);
    }
    Py_END_ALLOW_THREADS
    /* re-arm the GIL-held error handler for the copy loop below */
    if (decode_failed || setjmp(err.env)) {
        jpeg_destroy_decompress(&d);
        Py_XDECREF(components);
        PyBuffer_Release(&buf);
        PyErr_Format(PyExc_ValueError, "libjpeg error: %s", err.msg);
        return NULL;
    }
    if (!coef_arrays) {
        jpeg_destroy_decompress(&d);
        PyBuffer_Release(&buf);
        return PyErr_Format(PyExc_ValueError, "failed to read coefficients");
    }

    components = PyList_New(0);
    if (!components) {
        jpeg_destroy_decompress(&d);
        PyBuffer_Release(&buf);
        return NULL;
    }

    for (int c = 0; c < ncomp; c++) {
        jpeg_component_info *ci = &d.comp_info[c];
        const unsigned nby = ci->height_in_blocks;
        const unsigned nbx = ci->width_in_blocks;
        /* replication factors, named as in the reference (jpeg.c:57-58):
         * w_samp = how many full-res columns one coef pixel covers */
        const unsigned w_samp = (unsigned)(d.max_h_samp_factor / ci->h_samp_factor);
        const unsigned h_samp = (unsigned)(d.max_v_samp_factor / ci->v_samp_factor);

        /* dimension consistency (jpeg.c:59-64) */
        if (nby != (image_h / h_samp + 7) / 8 ||
            nbx != (image_w / w_samp + 7) / 8) {
            jpeg_destroy_decompress(&d);
            Py_DECREF(components);
            PyBuffer_Release(&buf);
            return PyErr_Format(PyExc_ValueError,
                                "jpeg invalid coef size for component %d", c);
        }
        if (nby == 0 || nbx == 0 ||
            (size_t)nby * nbx > SIZE_MAX / (DCTSIZE2 * sizeof(int16_t))) {
            jpeg_destroy_decompress(&d);
            Py_DECREF(components);
            PyBuffer_Release(&buf);
            return PyErr_Format(PyExc_ValueError, "jpeg too big");
        }

        const Py_ssize_t nbytes =
            (Py_ssize_t)nby * nbx * DCTSIZE2 * (Py_ssize_t)sizeof(int16_t);
        PyObject *data = PyBytes_FromStringAndSize(NULL, nbytes);
        if (!data) {
            jpeg_destroy_decompress(&d);
            Py_DECREF(components);
            PyBuffer_Release(&buf);
            return NULL;
        }
        int16_t *out = (int16_t *)PyBytes_AS_STRING(data);

        /* copy block rows out of the virtual array: block (by, bx) lands
         * at out[(by*nbx + bx)*64], coefficients in natural order */
        for (unsigned by = 0; by < nby; by++) {
            JBLOCKARRAY rows = (*d.mem->access_virt_barray)(
                (j_common_ptr)&d, coef_arrays[c], by, 1, FALSE);
            for (unsigned bx = 0; bx < nbx; bx++) {
                memcpy(out, rows[0][bx], DCTSIZE2 * sizeof(int16_t));
                out += DCTSIZE2;
            }
        }

        PyObject *qbytes = PyBytes_FromStringAndSize(
            (const char *)quant[c], DCTSIZE2 * sizeof(uint16_t));
        PyObject *entry = qbytes
            ? Py_BuildValue("{s:I,s:I,s:I,s:I,s:N,s:N}",
                            "nby", nby, "nbx", nbx,
                            "h_samp", h_samp, "w_samp", w_samp,
                            "data", data, "quant", qbytes)
            : NULL;
        if (!entry || PyList_Append(components, entry) < 0) {
            Py_XDECREF(entry);
            if (!qbytes) Py_DECREF(data);
            jpeg_destroy_decompress(&d);
            Py_DECREF(components);
            PyBuffer_Release(&buf);
            return NULL;
        }
        Py_DECREF(entry);
    }

    const int progressive = d.progressive_mode;
    jpeg_destroy_decompress(&d);
    PyBuffer_Release(&buf);

    /* decode-time warnings (capped at MAX_WARNINGS texts; the count
     * beyond the cap is visible as n_warnings) */
    PyObject *warnings = PyList_New(0);
    if (!warnings) {
        Py_DECREF(components);
        return NULL;
    }
    int kept = err.n_warnings < MAX_WARNINGS ? err.n_warnings
                                             : MAX_WARNINGS;
    for (int i = 0; i < kept; i++) {
        PyObject *s = PyUnicode_FromString(err.warnings[i]);
        if (!s || PyList_Append(warnings, s) < 0) {
            Py_XDECREF(s);
            Py_DECREF(warnings);
            Py_DECREF(components);
            return NULL;
        }
        Py_DECREF(s);
    }

    result = Py_BuildValue("{s:I,s:I,s:i,s:N,s:N,s:i}",
                           "height", image_h, "width", image_w,
                           "progressive", progressive,
                           "components", components,
                           "warnings", warnings,
                           "n_warnings", err.n_warnings);
    return result;
}

static PyMethodDef methods[] = {
    {"read_coefficients", read_coefficients, METH_VARARGS,
     "read_coefficients(jpeg_bytes) -> dict with height, width and a "
     "list of per-component dicts (nby, nbx, h_samp, w_samp, data "
     "int16-LE bytes in block-major order, quant uint16-LE bytes)."},
    {NULL, NULL, 0, NULL},
};

static struct PyModuleDef module = {
    PyModuleDef_HEAD_INIT, "_jpegio",
    "Native JPEG DCT-coefficient reader (libjpeg-backed).",
    -1, methods, NULL, NULL, NULL, NULL,
};

PyMODINIT_FUNC
PyInit__jpegio(void)
{
    return PyModule_Create(&module);
}
