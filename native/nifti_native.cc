// Native data-path: NIfTI-1 decode (+gzip) and BraTS preprocessing in C++.
//
// The reference's IO/preprocess stack is native-by-dependency (nibabel /
// SimpleITK / MONAI transforms backed by C, SURVEY.md §2.9); this is the
// framework's own native equivalent: one call decodes the 4 modality files
// (zlib inflate, threaded per modality), computes the any-channel foreground
// bounding box, crops, and z-score-normalizes nonzero voxels per channel
// (reference utils/transforms.py:328-447, monai CropForegroundd) — handing
// Python a ready-to-pad float32 [X, Y, Z, C] block with zero numpy work on
// the hot path.
//
// C ABI (ctypes-friendly), handle-based:
//   bt_case*  bt_load_case(const char** paths, int n_mod,
//                          int crop, int normalize, int remove_outliers);
//   const float* bt_case_data(bt_case*);     // [X, Y, Z, C], C-contiguous
//   void bt_case_shape(bt_case*, long long out[4]);
//   void bt_case_bbox(bt_case*, long long out[6]);   // start xyz, end xyz
//   void bt_case_orig_shape(bt_case*, long long out[3]);
//   void bt_case_affine(bt_case*, double out[16]);
//   const char* bt_last_error();
//   void bt_free_case(bt_case*);
//
// Build: make -C native   (g++ -O3 -shared -fPIC, links zlib)

#include <zlib.h>

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <string>
#include <thread>
#include <vector>

namespace {

thread_local std::string g_error;

struct Volume {
  std::vector<float> data;  // x-fastest (Fortran order as stored in NIfTI)
  int64_t nx = 0, ny = 0, nz = 0;
  double affine[16] = {1, 0, 0, 0, 0, 1, 0, 0, 0, 0, 1, 0, 0, 0, 0, 1};
  bool ok = false;
  std::string error;
};

bool read_file(const std::string& path, std::vector<uint8_t>* out) {
  FILE* f = fopen(path.c_str(), "rb");
  if (!f) return false;
  fseek(f, 0, SEEK_END);
  long size = ftell(f);
  fseek(f, 0, SEEK_SET);
  out->resize(size);
  size_t got = fread(out->data(), 1, size, f);
  fclose(f);
  return got == static_cast<size_t>(size);
}

bool gunzip(const std::vector<uint8_t>& in, std::vector<uint8_t>* out) {
  z_stream zs;
  std::memset(&zs, 0, sizeof(zs));
  if (inflateInit2(&zs, 16 + MAX_WBITS) != Z_OK) return false;
  zs.next_in = const_cast<Bytef*>(in.data());
  zs.avail_in = in.size();
  out->clear();
  out->reserve(in.size() * 4);
  std::vector<uint8_t> buf(1 << 20);
  int ret;
  do {
    zs.next_out = buf.data();
    zs.avail_out = buf.size();
    ret = inflate(&zs, Z_NO_FLUSH);
    if (ret != Z_OK && ret != Z_STREAM_END) {
      inflateEnd(&zs);
      return false;
    }
    out->insert(out->end(), buf.data(),
                buf.data() + (buf.size() - zs.avail_out));
  } while (ret != Z_STREAM_END);
  inflateEnd(&zs);
  return true;
}

template <typename T>
void cast_to_float(const uint8_t* src, int64_t n, float slope, float inter,
                   float* dst) {
  const T* s = reinterpret_cast<const T*>(src);
  if (slope == 1.0f && inter == 0.0f) {
    for (int64_t i = 0; i < n; ++i) dst[i] = static_cast<float>(s[i]);
  } else {
    for (int64_t i = 0; i < n; ++i)
      dst[i] = static_cast<float>(s[i]) * slope + inter;
  }
}

void load_nifti(const std::string& path, Volume* vol) {
  std::vector<uint8_t> raw;
  if (!read_file(path, &raw)) {
    vol->error = "cannot read " + path;
    return;
  }
  if (raw.size() >= 2 && raw[0] == 0x1f && raw[1] == 0x8b) {
    std::vector<uint8_t> un;
    if (!gunzip(raw, &un)) {
      vol->error = "gzip decode failed: " + path;
      return;
    }
    raw.swap(un);
  }
  if (raw.size() < 352) {
    vol->error = "truncated NIfTI: " + path;
    return;
  }
  const uint8_t* h = raw.data();
  int32_t sizeof_hdr;
  std::memcpy(&sizeof_hdr, h, 4);
  if (sizeof_hdr != 348) {
    vol->error = "unsupported (big-endian?) NIfTI: " + path;
    return;
  }
  int16_t dim[8];
  std::memcpy(dim, h + 40, 16);
  if (dim[0] < 3) {
    vol->error = "expected >=3D NIfTI: " + path;
    return;
  }
  int16_t datatype, bitpix;
  std::memcpy(&datatype, h + 70, 2);
  std::memcpy(&bitpix, h + 72, 2);
  float vox_offset, scl_slope, scl_inter;
  std::memcpy(&vox_offset, h + 108, 4);
  std::memcpy(&scl_slope, h + 112, 4);
  std::memcpy(&scl_inter, h + 116, 4);
  int16_t sform_code;
  std::memcpy(&sform_code, h + 254, 2);
  if (sform_code > 0) {
    float srow[12];
    std::memcpy(srow, h + 280, 48);
    for (int r = 0; r < 3; ++r)
      for (int c = 0; c < 4; ++c) vol->affine[r * 4 + c] = srow[r * 4 + c];
  }
  vol->nx = dim[1];
  vol->ny = dim[2];
  vol->nz = dim[3];
  int64_t n = vol->nx * vol->ny * vol->nz;
  int64_t need = static_cast<int64_t>(vox_offset) + n * (bitpix / 8);
  if (static_cast<int64_t>(raw.size()) < need) {
    vol->error = "data shorter than header claims: " + path;
    return;
  }
  const uint8_t* body = raw.data() + static_cast<int64_t>(vox_offset);
  float slope = (scl_slope == 0.0f) ? 1.0f : scl_slope;
  vol->data.resize(n);
  switch (datatype) {
    case 2: cast_to_float<uint8_t>(body, n, slope, scl_inter, vol->data.data()); break;
    case 4: cast_to_float<int16_t>(body, n, slope, scl_inter, vol->data.data()); break;
    case 8: cast_to_float<int32_t>(body, n, slope, scl_inter, vol->data.data()); break;
    case 16: cast_to_float<float>(body, n, slope, scl_inter, vol->data.data()); break;
    case 64: cast_to_float<double>(body, n, slope, scl_inter, vol->data.data()); break;
    case 256: cast_to_float<int8_t>(body, n, slope, scl_inter, vol->data.data()); break;
    case 512: cast_to_float<uint16_t>(body, n, slope, scl_inter, vol->data.data()); break;
    default:
      vol->error = "unsupported datatype " + std::to_string(datatype);
      return;
  }
  vol->ok = true;
}

}  // namespace

extern "C" {

struct bt_case {
  std::vector<float> data;  // [X, Y, Z, C] C-contiguous
  int64_t shape[4] = {0, 0, 0, 0};
  int64_t bbox[6] = {0, 0, 0, 0, 0, 0};
  int64_t orig_shape[3] = {0, 0, 0};
  double affine[16];
};

const char* bt_last_error() { return g_error.c_str(); }

bt_case* bt_load_case(const char** paths, int n_mod, int crop, int normalize,
                      int remove_outliers) {
  std::vector<Volume> vols(n_mod);
  std::vector<std::thread> threads;
  threads.reserve(n_mod);
  for (int m = 0; m < n_mod; ++m)
    threads.emplace_back(load_nifti, std::string(paths[m]), &vols[m]);
  for (auto& t : threads) t.join();
  for (auto& v : vols) {
    if (!v.ok) {
      g_error = v.error;
      return nullptr;
    }
  }
  const int64_t nx = vols[0].nx, ny = vols[0].ny, nz = vols[0].nz;
  for (auto& v : vols) {
    if (v.nx != nx || v.ny != ny || v.nz != nz) {
      g_error = "modality shape mismatch";
      return nullptr;
    }
  }

  // foreground bbox: any channel nonzero (MONAI CropForegroundd semantics)
  int64_t x0 = nx, x1 = -1, y0 = ny, y1 = -1, z0 = nz, z1 = -1;
  if (crop) {
    for (int64_t z = 0; z < nz; ++z)
      for (int64_t y = 0; y < ny; ++y) {
        const int64_t base = (z * ny + y) * nx;
        for (int64_t x = 0; x < nx; ++x) {
          bool nzv = false;
          for (int m = 0; m < n_mod && !nzv; ++m)
            nzv = vols[m].data[base + x] != 0.0f;
          if (nzv) {
            x0 = std::min(x0, x); x1 = std::max(x1, x);
            y0 = std::min(y0, y); y1 = std::max(y1, y);
            z0 = std::min(z0, z); z1 = std::max(z1, z);
          }
        }
      }
    if (x1 < 0) { x0 = 0; x1 = nx - 1; y0 = 0; y1 = ny - 1; z0 = 0; z1 = nz - 1; }
  } else {
    x0 = 0; x1 = nx - 1; y0 = 0; y1 = ny - 1; z0 = 0; z1 = nz - 1;
  }
  const int64_t cx = x1 - x0 + 1, cy = y1 - y0 + 1, cz = z1 - z0 + 1;

  auto* out = new bt_case();
  out->shape[0] = cx; out->shape[1] = cy; out->shape[2] = cz;
  out->shape[3] = n_mod;
  out->bbox[0] = x0; out->bbox[1] = y0; out->bbox[2] = z0;
  out->bbox[3] = x1 + 1; out->bbox[4] = y1 + 1; out->bbox[5] = z1 + 1;
  out->orig_shape[0] = nx; out->orig_shape[1] = ny; out->orig_shape[2] = nz;
  std::memcpy(out->affine, vols[0].affine, sizeof(out->affine));
  out->data.assign(cx * cy * cz * n_mod, 0.0f);

  // crop + normalize, one thread per modality
  std::vector<std::thread> workers;
  for (int m = 0; m < n_mod; ++m) {
    workers.emplace_back([&, m]() {
      // gather cropped channel, accumulating nonzero stats
      double sum = 0.0, sumsq = 0.0;
      int64_t count = 0;
      std::vector<float> chan(cx * cy * cz);
      for (int64_t z = 0; z < cz; ++z)
        for (int64_t y = 0; y < cy; ++y) {
          const int64_t src = ((z + z0) * ny + (y + y0)) * nx + x0;
          const int64_t dst = (z * cy + y) * cx;
          for (int64_t x = 0; x < cx; ++x) {
            const float v = vols[m].data[src + x];
            chan[dst + x] = v;
            if (v != 0.0f) { sum += v; sumsq += double(v) * v; ++count; }
          }
        }
      float mean = 0.0f, inv_std = 1.0f;
      if (normalize && count > 0) {
        mean = static_cast<float>(sum / count);
        double var = sumsq / count - double(mean) * mean;
        float sd = var > 0 ? static_cast<float>(std::sqrt(var)) : 0.0f;
        inv_std = sd == 0.0f ? 1.0f : 1.0f / sd;
      }
      // scatter into [X, Y, Z, C] C-contiguous layout (x outermost)
      for (int64_t z = 0; z < cz; ++z)
        for (int64_t y = 0; y < cy; ++y) {
          const int64_t src = (z * cy + y) * cx;
          for (int64_t x = 0; x < cx; ++x) {
            float v = chan[src + x];
            if (normalize && v != 0.0f) {
              v = (v - mean) * inv_std;
              if (remove_outliers) v = std::max(-3.0f, std::min(3.0f, v));
            }
            out->data[((x * cy + y) * cz + z) * n_mod + m] = v;
          }
        }
    });
  }
  for (auto& t : workers) t.join();
  return out;
}

const float* bt_case_data(bt_case* c) { return c->data.data(); }

void bt_case_shape(bt_case* c, int64_t out[4]) {
  std::memcpy(out, c->shape, sizeof(c->shape));
}

void bt_case_bbox(bt_case* c, int64_t out[6]) {
  std::memcpy(out, c->bbox, sizeof(c->bbox));
}

void bt_case_orig_shape(bt_case* c, int64_t out[3]) {
  std::memcpy(out, c->orig_shape, sizeof(c->orig_shape));
}

void bt_case_affine(bt_case* c, double out[16]) {
  std::memcpy(out, c->affine, sizeof(c->affine));
}

void bt_free_case(bt_case* c) { delete c; }

}  // extern "C"
