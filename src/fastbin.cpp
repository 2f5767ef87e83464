// Native fast decoder for the sbmc .bin sample-tile format.
//
// Plays the role of the reference's native data path (the C++ SampleRecord
// reader/writer inside the PBRT patch plus python-lz4): a single-pass,
// multithreaded parser that LZ4-frame-decompresses every per-sample block
// of a tile directly into caller-provided buffers, bypassing the Python
// per-block loop. Exposed as a CPython extension (built by
// sbmc_tpu/data/_native.py with g++, linked against the system liblz4).
//
// Layout decoded (reference: sbmc/datasets.py:501-739 and the format doc in
// sbmc_tpu/data/bin_format.py):
//   [int32 nbytes][lz4 frame] x (1 pixel block + sample_count sample blocks)
// where each sample frame contains, contiguously: float32 sample features,
// float32 path probabilities, float32 light directions, int16 bounce masks.

#include <Python.h>

#include <cstdint>
#include <cstring>
#include <string>
#include <thread>
#include <vector>

// liblz4 frame API (prototypes declared here: the image ships the shared
// library but not the headers).
extern "C" {
typedef struct LZ4F_dctx_s LZ4F_dctx;
size_t LZ4F_createDecompressionContext(LZ4F_dctx** dctx, unsigned version);
size_t LZ4F_freeDecompressionContext(LZ4F_dctx* dctx);
size_t LZ4F_decompress(LZ4F_dctx* dctx, void* dst, size_t* dstSize,
                       const void* src, size_t* srcSize, const void* opts);
unsigned LZ4F_isError(size_t code);
const char* LZ4F_getErrorName(size_t code);
}

namespace {

constexpr unsigned kLz4fVersion = 100;

// Decompress one complete LZ4 frame into exactly dst_size bytes.
bool DecompressFrame(const uint8_t* src, size_t src_size, uint8_t* dst,
                     size_t dst_size, std::string* err) {
  LZ4F_dctx* ctx = nullptr;
  size_t rc = LZ4F_createDecompressionContext(&ctx, kLz4fVersion);
  if (LZ4F_isError(rc)) {
    *err = LZ4F_getErrorName(rc);
    return false;
  }
  size_t src_off = 0, dst_off = 0;
  bool ok = true;
  while (src_off < src_size && dst_off < dst_size) {
    size_t dst_n = dst_size - dst_off;
    size_t src_n = src_size - src_off;
    rc = LZ4F_decompress(ctx, dst + dst_off, &dst_n, src + src_off, &src_n,
                         nullptr);
    if (LZ4F_isError(rc)) {
      *err = LZ4F_getErrorName(rc);
      ok = false;
      break;
    }
    src_off += src_n;
    dst_off += dst_n;
    if (rc == 0) break;  // frame complete
  }
  LZ4F_freeDecompressionContext(ctx);
  if (ok && dst_off != dst_size) {
    *err = "decompressed size mismatch";
    ok = false;
  }
  return ok;
}

struct Block {
  const uint8_t* src;
  size_t src_size;
};

// decode_sample_blocks(data: bytes, offset: int, n_samples: int,
//                      feat_bytes: int, p_bytes: int, ld_bytes: int,
//                      bt_bytes: int, feats: buffer, p: buffer,
//                      ld: buffer, bt: buffer, n_threads: int) -> int
//
// Scans the [int32 size][frame] chain starting at `offset`, decompresses
// the first `n_samples` blocks in parallel, splitting each decoded payload
// into the four destination buffers (which must be C-contiguous and sized
// n_samples * <section>_bytes). Returns the file offset after the last
// parsed block.
PyObject* DecodeSampleBlocks(PyObject*, PyObject* args) {
  Py_buffer data, feats, p, ld, bt;
  Py_ssize_t offset, n_samples, feat_b, p_b, ld_b, bt_b, n_threads;
  if (!PyArg_ParseTuple(args, "y*nnnnnny*y*y*y*n", &data, &offset,
                        &n_samples, &feat_b, &p_b, &ld_b, &bt_b, &feats, &p,
                        &ld, &bt, &n_threads)) {
    return nullptr;
  }
  const uint8_t* base = static_cast<const uint8_t*>(data.buf);
  const Py_ssize_t total = data.len;
  const size_t payload = static_cast<size_t>(feat_b + p_b + ld_b + bt_b);

  std::vector<Block> blocks;
  Py_ssize_t off = offset;
  bool parse_ok = true;
  for (Py_ssize_t s = 0; s < n_samples; ++s) {
    if (off + 4 > total) {
      parse_ok = false;
      break;
    }
    int32_t nbytes;
    std::memcpy(&nbytes, base + off, 4);
    off += 4;
    if (nbytes < 0 || off + nbytes > total) {
      parse_ok = false;
      break;
    }
    blocks.push_back({base + off, static_cast<size_t>(nbytes)});
    off += nbytes;
  }

  if (!parse_ok ||
      feats.len < static_cast<Py_ssize_t>(n_samples) * feat_b ||
      p.len < static_cast<Py_ssize_t>(n_samples) * p_b ||
      ld.len < static_cast<Py_ssize_t>(n_samples) * ld_b ||
      bt.len < static_cast<Py_ssize_t>(n_samples) * bt_b) {
    PyBuffer_Release(&data);
    PyBuffer_Release(&feats);
    PyBuffer_Release(&p);
    PyBuffer_Release(&ld);
    PyBuffer_Release(&bt);
    PyErr_SetString(PyExc_ValueError,
                    parse_ok ? "destination buffers too small"
                             : "truncated .bin sample chain");
    return nullptr;
  }

  std::vector<std::string> errors(n_samples);
  std::vector<uint8_t> ok(n_samples, 1);

  auto work = [&](Py_ssize_t begin, Py_ssize_t end) {
    std::vector<uint8_t> scratch(payload);
    for (Py_ssize_t s = begin; s < end; ++s) {
      std::string err;
      if (!DecompressFrame(blocks[s].src, blocks[s].src_size, scratch.data(),
                           payload, &err)) {
        errors[s] = err;
        ok[s] = 0;
        continue;
      }
      const uint8_t* cur = scratch.data();
      std::memcpy(static_cast<uint8_t*>(feats.buf) + s * feat_b, cur, feat_b);
      cur += feat_b;
      std::memcpy(static_cast<uint8_t*>(p.buf) + s * p_b, cur, p_b);
      cur += p_b;
      std::memcpy(static_cast<uint8_t*>(ld.buf) + s * ld_b, cur, ld_b);
      cur += ld_b;
      std::memcpy(static_cast<uint8_t*>(bt.buf) + s * bt_b, cur, bt_b);
    }
  };

  Py_ssize_t nt = n_threads;
  if (nt < 1) nt = 1;
  if (nt > n_samples) nt = n_samples > 0 ? n_samples : 1;

  Py_BEGIN_ALLOW_THREADS;
  if (nt == 1) {
    work(0, n_samples);
  } else {
    std::vector<std::thread> threads;
    Py_ssize_t chunk = (n_samples + nt - 1) / nt;
    for (Py_ssize_t t = 0; t < nt; ++t) {
      Py_ssize_t begin = t * chunk;
      Py_ssize_t end = begin + chunk < n_samples ? begin + chunk : n_samples;
      if (begin >= end) break;
      threads.emplace_back(work, begin, end);
    }
    for (auto& th : threads) th.join();
  }
  Py_END_ALLOW_THREADS;

  PyBuffer_Release(&data);
  PyBuffer_Release(&feats);
  PyBuffer_Release(&p);
  PyBuffer_Release(&ld);
  PyBuffer_Release(&bt);

  for (Py_ssize_t s = 0; s < n_samples; ++s) {
    if (!ok[s]) {
      PyErr_Format(PyExc_ValueError, "lz4 decode failed for sample %zd: %s",
                   static_cast<ssize_t>(s), errors[s].c_str());
      return nullptr;
    }
  }
  return PyLong_FromSsize_t(off);
}

// decompress(data: bytes, expected_size: int) -> bytes
PyObject* Decompress(PyObject*, PyObject* args) {
  Py_buffer data;
  Py_ssize_t expected;
  if (!PyArg_ParseTuple(args, "y*n", &data, &expected)) return nullptr;
  PyObject* out = PyBytes_FromStringAndSize(nullptr, expected);
  if (!out) {
    PyBuffer_Release(&data);
    return nullptr;
  }
  std::string err;
  bool ok;
  Py_BEGIN_ALLOW_THREADS;
  ok = DecompressFrame(static_cast<const uint8_t*>(data.buf), data.len,
                       reinterpret_cast<uint8_t*>(PyBytes_AS_STRING(out)),
                       expected, &err);
  Py_END_ALLOW_THREADS;
  PyBuffer_Release(&data);
  if (!ok) {
    Py_DECREF(out);
    PyErr_SetString(PyExc_ValueError, err.c_str());
    return nullptr;
  }
  return out;
}

PyMethodDef kMethods[] = {
    {"decode_sample_blocks", DecodeSampleBlocks, METH_VARARGS,
     "Parallel LZ4-frame decode of a tile's sample blocks."},
    {"decompress", Decompress, METH_VARARGS,
     "Decompress one LZ4 frame of known size."},
    {nullptr, nullptr, 0, nullptr},
};

PyModuleDef kModule = {PyModuleDef_HEAD_INIT, "_fastbin",
                       "Native .bin tile decoder", -1, kMethods};

}  // namespace

PyMODINIT_FUNC PyInit__fastbin(void) { return PyModule_Create(&kModule); }
