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
// Two implementations share the ABI (round 4, VERDICT r3 #8):
//   * default: FUSED pipeline — inflate → one combined stats+bbox scan on
//     the RAW typed body (no full-volume fp32 materialization) → one tiled
//     cast+normalize+transpose pass into the output block. ~2 passes over
//     the data instead of v1's ~5; the (x,z)-tiled transpose keeps both the
//     strided source reads and the interleaved destination writes
//     cache-resident. Matters on 1-vCPU serving hosts where decode cannot
//     overlap compute (docs/BENCHMARKS.md "CLI inference").
//   * BRATS21_DECODE_V1=1: the round-2 implementation (cast-everything
//     first), kept for A/B measurement.
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
#include <cstdlib>
#include <cstring>
#include <string>
#include <thread>
#include <vector>

namespace {

thread_local std::string g_error;

// ---------------------------------------------------------------------------
// shared: file read + gunzip + header parse
// ---------------------------------------------------------------------------

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

// Raw decoded NIfTI: typed body bytes + header fields (fused path works on
// this without materializing a full fp32 volume).
struct RawNifti {
  std::vector<uint8_t> bytes;  // whole (inflated) file
  int64_t nx = 0, ny = 0, nz = 0;
  int64_t offset = 0;          // vox_offset
  int16_t datatype = 0;
  float slope = 1.0f, inter = 0.0f;
  double affine[16] = {1, 0, 0, 0, 0, 1, 0, 0, 0, 0, 1, 0, 0, 0, 0, 1};
  bool ok = false;
  std::string error;
};

void load_raw(const std::string& path, RawNifti* r) {
  if (!read_file(path, &r->bytes)) {
    r->error = "cannot read " + path;
    return;
  }
  if (r->bytes.size() >= 2 && r->bytes[0] == 0x1f && r->bytes[1] == 0x8b) {
    std::vector<uint8_t> un;
    if (!gunzip(r->bytes, &un)) {
      r->error = "gzip decode failed: " + path;
      return;
    }
    r->bytes.swap(un);
  }
  if (r->bytes.size() < 352) {
    r->error = "truncated NIfTI: " + path;
    return;
  }
  const uint8_t* h = r->bytes.data();
  int32_t sizeof_hdr;
  std::memcpy(&sizeof_hdr, h, 4);
  if (sizeof_hdr != 348) {
    r->error = "unsupported (big-endian?) NIfTI: " + path;
    return;
  }
  int16_t dim[8];
  std::memcpy(dim, h + 40, 16);
  if (dim[0] < 3) {
    r->error = "expected >=3D NIfTI: " + path;
    return;
  }
  int16_t bitpix;
  std::memcpy(&r->datatype, h + 70, 2);
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
    for (int rr = 0; rr < 3; ++rr)
      for (int c = 0; c < 4; ++c) r->affine[rr * 4 + c] = srow[rr * 4 + c];
  }
  r->nx = dim[1];
  r->ny = dim[2];
  r->nz = dim[3];
  r->offset = static_cast<int64_t>(vox_offset);
  r->slope = (scl_slope == 0.0f) ? 1.0f : scl_slope;
  r->inter = scl_inter;
  int64_t n = r->nx * r->ny * r->nz;
  if (static_cast<int64_t>(r->bytes.size()) < r->offset + n * (bitpix / 8)) {
    r->error = "data shorter than header claims: " + path;
    return;
  }
  r->ok = true;
}

template <typename T>
inline float cast_one(const T* s, int64_t i, float slope, float inter) {
  return static_cast<float>(s[i]) * slope + inter;
}

// ---------------------------------------------------------------------------
// fused path (default): stats+bbox on the raw body, then ONE tiled
// cast/normalize/transpose pass into the interleaved output
// ---------------------------------------------------------------------------

struct ChanScan {
  int64_t x0, x1, y0, y1, z0, z1;  // this channel's nonzero bbox
  double sum = 0.0, sumsq = 0.0;
  int64_t count = 0;
};

template <typename T>
void scan_channel(const RawNifti& r, ChanScan* cs) {
  const T* s = reinterpret_cast<const T*>(r.bytes.data() + r.offset);
  const int64_t nx = r.nx, ny = r.ny, nz = r.nz;
  cs->x0 = nx; cs->x1 = -1; cs->y0 = ny; cs->y1 = -1; cs->z0 = nz; cs->z1 = -1;
  for (int64_t z = 0; z < nz; ++z)
    for (int64_t y = 0; y < ny; ++y) {
      const int64_t base = (z * ny + y) * nx;
      int64_t row_min = -1, row_max = -1;
      for (int64_t x = 0; x < nx; ++x) {
        const float v = cast_one<T>(s, base + x, r.slope, r.inter);
        if (v != 0.0f) {
          cs->sum += v;
          cs->sumsq += double(v) * v;
          ++cs->count;
          if (row_min < 0) row_min = x;
          row_max = x;
        }
      }
      if (row_min >= 0) {
        cs->x0 = std::min(cs->x0, row_min);
        cs->x1 = std::max(cs->x1, row_max);
        cs->y0 = std::min(cs->y0, y);
        cs->y1 = std::max(cs->y1, y);
        cs->z0 = std::min(cs->z0, z);
        cs->z1 = std::max(cs->z1, z);
      }
    }
}

// one (x,z)-tiled cast+normalize+transpose pass for one modality:
// src Fortran [nx,ny,nz] typed, dst C-contiguous [cx,cy,cz,n_mod]
template <typename T>
void emit_channel(const RawNifti& r, int m, int n_mod, int64_t x0, int64_t y0,
                  int64_t z0, int64_t cx, int64_t cy, int64_t cz,
                  bool normalize, bool remove_outliers, float mean,
                  float inv_std, float* dst) {
  const T* s = reinterpret_cast<const T*>(r.bytes.data() + r.offset);
  const int64_t nx = r.nx, ny = r.ny;
  constexpr int64_t BX = 32, BZ = 32;   // tile: keeps src rows + dst
                                        // z-runs in L1/L2 on both sides
  for (int64_t xb = 0; xb < cx; xb += BX) {
    const int64_t xe = std::min(xb + BX, cx);
    for (int64_t zb = 0; zb < cz; zb += BZ) {
      const int64_t ze = std::min(zb + BZ, cz);
      for (int64_t y = 0; y < cy; ++y) {
        for (int64_t z = zb; z < ze; ++z) {
          const int64_t src_base = ((z + z0) * ny + (y + y0)) * nx + x0;
          for (int64_t x = xb; x < xe; ++x) {
            float v = cast_one<T>(s, src_base + x, r.slope, r.inter);
            if (normalize && v != 0.0f) {
              v = (v - mean) * inv_std;
              if (remove_outliers) v = std::max(-3.0f, std::min(3.0f, v));
            }
            dst[((x * cy + y) * cz + z) * n_mod + m] = v;
          }
        }
      }
    }
  }
}

template <typename Fn>
bool with_dtype(int16_t datatype, Fn&& fn) {
  switch (datatype) {
    case 2: fn(uint8_t{}); return true;
    case 4: fn(int16_t{}); return true;
    case 8: fn(int32_t{}); return true;
    case 16: fn(float{}); return true;
    case 64: fn(double{}); return true;
    case 256: fn(int8_t{}); return true;
    case 512: fn(uint16_t{}); return true;
    default: return false;
  }
}

// ---------------------------------------------------------------------------
// v1 path (BRATS21_DECODE_V1=1): cast-everything-first reference
// implementation from round 2, kept for A/B measurement
// ---------------------------------------------------------------------------

struct Volume {
  std::vector<float> data;  // x-fastest (Fortran order as stored in NIfTI)
  int64_t nx = 0, ny = 0, nz = 0;
  double affine[16] = {1, 0, 0, 0, 0, 1, 0, 0, 0, 0, 1, 0, 0, 0, 0, 1};
  bool ok = false;
  std::string error;
};

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

void load_nifti_v1(const std::string& path, Volume* vol) {
  RawNifti r;
  load_raw(path, &r);
  if (!r.ok) {
    vol->error = r.error;
    return;
  }
  vol->nx = r.nx;
  vol->ny = r.ny;
  vol->nz = r.nz;
  std::memcpy(vol->affine, r.affine, sizeof(vol->affine));
  const int64_t n = r.nx * r.ny * r.nz;
  vol->data.resize(n);
  const uint8_t* body = r.bytes.data() + r.offset;
  bool known = with_dtype(r.datatype, [&](auto tag) {
    using T = decltype(tag);
    cast_to_float<T>(body, n, r.slope, r.inter, vol->data.data());
  });
  if (!known) {
    vol->error = "unsupported datatype " + std::to_string(r.datatype);
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

static bt_case* load_case_v1(const char** paths, int n_mod, int crop,
                             int normalize, int remove_outliers) {
  std::vector<Volume> vols(n_mod);
  std::vector<std::thread> threads;
  threads.reserve(n_mod);
  for (int m = 0; m < n_mod; ++m)
    threads.emplace_back(load_nifti_v1, std::string(paths[m]), &vols[m]);
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

static bt_case* load_case_fused(const char** paths, int n_mod, int crop,
                                int normalize, int remove_outliers) {
  std::vector<RawNifti> raws(n_mod);
  std::vector<ChanScan> scans(n_mod);
  std::vector<std::string> scan_err(n_mod);
  std::vector<std::thread> threads;
  threads.reserve(n_mod);
  for (int m = 0; m < n_mod; ++m) {
    threads.emplace_back([&, m]() {
      load_raw(paths[m], &raws[m]);
      if (!raws[m].ok) return;
      bool known = with_dtype(raws[m].datatype, [&](auto tag) {
        using T = decltype(tag);
        scan_channel<T>(raws[m], &scans[m]);
      });
      if (!known)
        scan_err[m] = "unsupported datatype "
                      + std::to_string(raws[m].datatype);
    });
  }
  for (auto& t : threads) t.join();
  for (int m = 0; m < n_mod; ++m) {
    if (!raws[m].ok) { g_error = raws[m].error; return nullptr; }
    if (!scan_err[m].empty()) { g_error = scan_err[m]; return nullptr; }
  }
  const int64_t nx = raws[0].nx, ny = raws[0].ny, nz = raws[0].nz;
  for (auto& r : raws) {
    if (r.nx != nx || r.ny != ny || r.nz != nz) {
      g_error = "modality shape mismatch";
      return nullptr;
    }
  }

  // any-channel bbox = union of per-channel nonzero bboxes
  int64_t x0 = nx, x1 = -1, y0 = ny, y1 = -1, z0 = nz, z1 = -1;
  if (crop) {
    for (auto& cs : scans) {
      if (cs.count == 0) continue;
      x0 = std::min(x0, cs.x0); x1 = std::max(x1, cs.x1);
      y0 = std::min(y0, cs.y0); y1 = std::max(y1, cs.y1);
      z0 = std::min(z0, cs.z0); z1 = std::max(z1, cs.z1);
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
  std::memcpy(out->affine, raws[0].affine, sizeof(out->affine));
  out->data.resize(cx * cy * cz * n_mod);

  std::vector<std::thread> workers;
  for (int m = 0; m < n_mod; ++m) {
    workers.emplace_back([&, m]() {
      float mean = 0.0f, inv_std = 1.0f;
      if (normalize && scans[m].count > 0) {
        mean = static_cast<float>(scans[m].sum / scans[m].count);
        double var = scans[m].sumsq / scans[m].count - double(mean) * mean;
        float sd = var > 0 ? static_cast<float>(std::sqrt(var)) : 0.0f;
        inv_std = sd == 0.0f ? 1.0f : 1.0f / sd;
      }
      with_dtype(raws[m].datatype, [&](auto tag) {
        using T = decltype(tag);
        emit_channel<T>(raws[m], m, n_mod, x0, y0, z0, cx, cy, cz,
                        normalize != 0, remove_outliers != 0, mean, inv_std,
                        out->data.data());
      });
    });
  }
  for (auto& t : workers) t.join();
  return out;
}

bt_case* bt_load_case(const char** paths, int n_mod, int crop, int normalize,
                      int remove_outliers) {
  const char* v1 = std::getenv("BRATS21_DECODE_V1");
  if (v1 && v1[0] == '1')
    return load_case_v1(paths, n_mod, crop, normalize, remove_outliers);
  return load_case_fused(paths, n_mod, crop, normalize, remove_outliers);
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
