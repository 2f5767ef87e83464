// Native EXR reader bridge via OpenEXRCore (the C API of libOpenEXR).
//
// The pure-Python codec (sbmc_tpu/utils/exr.py) covers NONE/ZIP/ZIPS — the
// formats this framework writes. Reading *foreign* EXRs (e.g. the
// reference's precomputed evaluation renders, which use PIZ/PXR24/DWA
// compression) needs a full decoder; this extension binds the system
// libOpenEXRCore for that, exposed as an optional fast path in exr.read.
//
// API: read(path: str) -> (channel_names: list[str],
//                          planes: list[bytes (float32)], height, width)

#include <Python.h>

#include <cstdint>
#include <cstring>
#include <string>
#include <vector>

#include <OpenEXR/openexr.h>

namespace {

struct Reader {
  exr_context_t ctx = nullptr;
  ~Reader() {
    if (ctx) exr_finish(&ctx);
  }
};

PyObject* SetError(const char* what, exr_result_t rv) {
  PyErr_Format(PyExc_ValueError, "exr: %s (%s)", what,
               exr_get_default_error_message(rv));
  return nullptr;
}

PyObject* Read(PyObject*, PyObject* args) {
  const char* path;
  if (!PyArg_ParseTuple(args, "s", &path)) return nullptr;

  Reader r;
  exr_context_initializer_t init = EXR_DEFAULT_CONTEXT_INITIALIZER;
  exr_result_t rv = exr_start_read(&r.ctx, path, &init);
  if (rv != EXR_ERR_SUCCESS) return SetError("open failed", rv);

  exr_attr_box2i_t dw;
  rv = exr_get_data_window(r.ctx, 0, &dw);
  if (rv != EXR_ERR_SUCCESS) return SetError("no data window", rv);
  int64_t width = (int64_t)dw.max.x - dw.min.x + 1;
  int64_t height = (int64_t)dw.max.y - dw.min.y + 1;

  const exr_attr_chlist_t* chlist = nullptr;
  rv = exr_get_channels(r.ctx, 0, &chlist);
  if (rv != EXR_ERR_SUCCESS) return SetError("no channels", rv);
  int nch = chlist->num_channels;

  exr_storage_t storage;
  rv = exr_get_storage(r.ctx, 0, &storage);
  if (rv != EXR_ERR_SUCCESS || (storage != EXR_STORAGE_SCANLINE &&
                                storage != EXR_STORAGE_TILED)) {
    PyErr_SetString(PyExc_NotImplementedError,
                    "only scanline/tiled single-part EXRs are supported");
    return nullptr;
  }

  // Output float32 planes, one per channel.
  std::vector<std::vector<float>> planes(
      nch, std::vector<float>((size_t)width * height));

  int32_t scanlines_per_chunk = 1;
  rv = exr_get_scanlines_per_chunk(r.ctx, 0, &scanlines_per_chunk);

  bool ok = true;
  std::string err;
  Py_BEGIN_ALLOW_THREADS;
  if (storage == EXR_STORAGE_SCANLINE) {
    exr_chunk_info_t cinfo;
    exr_decode_pipeline_t dec;
    bool dec_init = false;
    for (int y = dw.min.y; y <= dw.max.y && ok;
         y += scanlines_per_chunk) {
      rv = exr_read_scanline_chunk_info(r.ctx, 0, y, &cinfo);
      if (rv != EXR_ERR_SUCCESS) { ok = false; err = "chunk info"; break; }
      if (!dec_init) {
        rv = exr_decoding_initialize(r.ctx, 0, &cinfo, &dec);
        if (rv != EXR_ERR_SUCCESS) { ok = false; err = "dec init"; break; }
        dec_init = true;
      } else {
        rv = exr_decoding_update(r.ctx, 0, &cinfo, &dec);
        if (rv != EXR_ERR_SUCCESS) { ok = false; err = "dec update"; break; }
      }
      // Point each channel at our float32 plane (OpenEXRCore converts).
      for (int c = 0; c < dec.channel_count; ++c) {
        exr_coding_channel_info_t& ch = dec.channels[c];
        int64_t row0 = (int64_t)cinfo.start_y - dw.min.y;
        ch.decode_to_ptr =
            (uint8_t*)(planes[c].data() + row0 * width);
        ch.user_pixel_stride = sizeof(float);
        ch.user_line_stride = (int32_t)(width * sizeof(float));
        ch.user_bytes_per_element = sizeof(float);
        ch.user_data_type = EXR_PIXEL_FLOAT;
      }
      if (y == dw.min.y) {
        rv = exr_decoding_choose_default_routines(r.ctx, 0, &dec);
        if (rv != EXR_ERR_SUCCESS) { ok = false; err = "routines"; break; }
      }
      rv = exr_decoding_run(r.ctx, 0, &dec);
      if (rv != EXR_ERR_SUCCESS) { ok = false; err = "decode run"; break; }
    }
    if (dec_init) exr_decoding_destroy(r.ctx, &dec);
  } else {
    ok = false;
    err = "tiled reading not wired";
  }
  Py_END_ALLOW_THREADS;

  if (!ok) {
    PyErr_Format(PyExc_ValueError, "exr decode failed at %s", err.c_str());
    return nullptr;
  }

  PyObject* names = PyList_New(nch);
  PyObject* datas = PyList_New(nch);
  for (int c = 0; c < nch; ++c) {
    PyList_SetItem(names, c,
                   PyUnicode_FromString(chlist->entries[c].name.str));
    PyList_SetItem(datas, c,
                   PyBytes_FromStringAndSize(
                       (const char*)planes[c].data(),
                       (Py_ssize_t)(planes[c].size() * sizeof(float))));
  }
  return Py_BuildValue("(NNll)", names, datas, (long)height, (long)width);
}

PyMethodDef kMethods[] = {
    {"read", Read, METH_VARARGS,
     "Read an EXR file -> (names, float32 planes, h, w)."},
    {nullptr, nullptr, 0, nullptr},
};

PyModuleDef kModule = {PyModuleDef_HEAD_INIT, "_fastexr",
                       "OpenEXRCore reader bridge", -1, kMethods};

}  // namespace

PyMODINIT_FUNC PyInit__fastexr(void) { return PyModule_Create(&kModule); }
