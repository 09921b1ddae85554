// io_core: native I/O helpers for ramsesgpu_tpu.
//
// The reference's entire I/O layer is C++ (VTI assembly in
// HydroRunBase.cpp:2520-2681, base64/raw appended encodings, GUI min/max
// reductions in glutGui/minmax.cuh, cnpy npz packing). This library is the
// TPU framework's native counterpart for the host-side hot paths:
//
//   - vti_appended_blob : assemble the appended-data section of a .vti file
//                         (size headers + field payloads) in one pass
//   - base64_encode     : VTK base64 encoding for ascii-safe .vti payloads
//   - field_minmax      : multi-field min/max scan (PNG contrast, history)
//   - interleave_faces  : extract the six domain faces of a [v,z,y,x] cube
//
// Exposed through a plain C ABI consumed via ctypes (no pybind11 in this
// environment). Build: see native/build.sh (g++ -O3 -march=native -fPIC).
#include <cstdint>
#include <cstring>
#include <algorithm>
#include <thread>
#include <vector>

extern "C" {

// Assemble VTK appended raw payload: for each field, a uint32 byte-count
// header followed by the field bytes. Returns total bytes written.
// fields: array of pointers; sizes: per-field byte counts; out must hold
// sum(sizes) + 4*n_fields bytes.
int64_t vti_appended_blob(const char** fields, const int64_t* sizes,
                          int32_t n_fields, char* out) {
  int64_t off = 0;
  for (int32_t i = 0; i < n_fields; ++i) {
    uint32_t n = static_cast<uint32_t>(sizes[i]);
    std::memcpy(out + off, &n, 4);
    off += 4;
    std::memcpy(out + off, fields[i], sizes[i]);
    off += sizes[i];
  }
  return off;
}

// Standard base64; returns encoded length. out must hold 4*ceil(n/3).
int64_t base64_encode(const uint8_t* in, int64_t n, char* out) {
  static const char tbl[] =
      "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz0123456789+/";
  int64_t o = 0;
  int64_t i = 0;
  for (; i + 2 < n; i += 3) {
    uint32_t v = (in[i] << 16) | (in[i + 1] << 8) | in[i + 2];
    out[o++] = tbl[(v >> 18) & 63];
    out[o++] = tbl[(v >> 12) & 63];
    out[o++] = tbl[(v >> 6) & 63];
    out[o++] = tbl[v & 63];
  }
  if (i < n) {
    uint32_t v = in[i] << 16;
    if (i + 1 < n) v |= in[i + 1] << 8;
    out[o++] = tbl[(v >> 18) & 63];
    out[o++] = tbl[(v >> 12) & 63];
    out[o++] = (i + 1 < n) ? tbl[(v >> 6) & 63] : '=';
    out[o++] = '=';
  }
  return o;
}

// Min/max per field over a [n_fields, n_cells] float32 buffer, threaded.
void field_minmax(const float* data, int64_t n_cells, int32_t n_fields,
                  float* mins, float* maxs) {
  auto worker = [&](int32_t f) {
    const float* p = data + static_cast<int64_t>(f) * n_cells;
    float lo = p[0], hi = p[0];
    for (int64_t c = 1; c < n_cells; ++c) {
      lo = std::min(lo, p[c]);
      hi = std::max(hi, p[c]);
    }
    mins[f] = lo;
    maxs[f] = hi;
  };
  std::vector<std::thread> ts;
  for (int32_t f = 0; f < n_fields; ++f) ts.emplace_back(worker, f);
  for (auto& t : ts) t.join();
}

// Extract the six faces of a [n_var, nz, ny, nx] float32 cube into six
// contiguous buffers (xmin/xmax: [n_var, nz, ny]; ymin/ymax: [n_var, nz, nx];
// zmin/zmax: [n_var, ny, nx]) — the native twin of copyFaces.cuh.
void extract_faces(const float* u, int32_t n_var, int32_t nz, int32_t ny,
                   int32_t nx, float* xmin, float* xmax, float* ymin,
                   float* ymax, float* zmin, float* zmax) {
  const int64_t plane = static_cast<int64_t>(ny) * nx;
  const int64_t cube = static_cast<int64_t>(nz) * plane;
  for (int32_t v = 0; v < n_var; ++v) {
    const float* base = u + v * cube;
    for (int32_t k = 0; k < nz; ++k) {
      for (int32_t j = 0; j < ny; ++j) {
        const float* row = base + k * plane + static_cast<int64_t>(j) * nx;
        xmin[(static_cast<int64_t>(v) * nz + k) * ny + j] = row[0];
        xmax[(static_cast<int64_t>(v) * nz + k) * ny + j] = row[nx - 1];
      }
      std::memcpy(ymin + (static_cast<int64_t>(v) * nz + k) * nx,
                  base + k * plane, sizeof(float) * nx);
      std::memcpy(ymax + (static_cast<int64_t>(v) * nz + k) * nx,
                  base + k * plane + static_cast<int64_t>(ny - 1) * nx,
                  sizeof(float) * nx);
    }
    std::memcpy(zmin + static_cast<int64_t>(v) * plane, base,
                sizeof(float) * plane);
    std::memcpy(zmax + static_cast<int64_t>(v) * plane,
                base + static_cast<int64_t>(nz - 1) * plane,
                sizeof(float) * plane);
  }
}

}  // extern "C"
