// texgs native IO: fast COLMAP-binary and PLY parsing.
//
// The runtime counterpart of the reference's native layer (its kernels are
// CUDA; ours are Pallas — this library covers the host-side data path:
// sparse-reconstruction parsing and point-cloud IO, the hot spots when
// loading large scenes).  Exposed through a plain C ABI consumed via
// ctypes (texgs/data/native.py); the pure-Python parsers in
// texgs/data/colmap.py and texgs/io/ply.py remain the reference twins and
// the fallback.
//
// Build: python native/build.py   (emits libtexgs_io.so next to this file)

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <string>
#include <vector>

namespace {

struct Reader {
  FILE* f = nullptr;
  bool ok = true;
  explicit Reader(const char* path) { f = std::fopen(path, "rb"); ok = f != nullptr; }
  ~Reader() { if (f) std::fclose(f); }
  template <typename T>
  T read() {
    T v{};
    if (ok && std::fread(&v, sizeof(T), 1, f) != 1) ok = false;
    return v;
  }
  void skip(long n) { if (ok && std::fseek(f, n, SEEK_CUR) != 0) ok = false; }
};

// COLMAP camera-model id -> parameter count (models.h of COLMAP).
int model_params(int model_id) {
  static const int counts[] = {3, 4, 4, 5, 8, 8, 12, 5, 4, 5, 12};
  if (model_id < 0 || model_id > 10) return -1;
  return counts[model_id];
}

}  // namespace

extern "C" {

// ---------------------------------------------------------------- points3D
// Returns the number of points (or -1 on error).  Caller passes capacity;
// call once with xyz=nullptr to query the count.
long colmap_points3d_count(const char* path) {
  Reader r(path);
  if (!r.ok) return -1;
  uint64_t n = r.read<uint64_t>();
  return r.ok ? static_cast<long>(n) : -1;
}

long colmap_read_points3d(const char* path, double* xyz, uint8_t* rgb,
                          double* err, long capacity) {
  Reader r(path);
  if (!r.ok) return -1;
  uint64_t n = r.read<uint64_t>();
  if (!r.ok) return -1;
  long count = 0;
  for (uint64_t i = 0; i < n && count < capacity; ++i) {
    r.read<uint64_t>();  // point id
    double x = r.read<double>(), y = r.read<double>(), z = r.read<double>();
    uint8_t cr = r.read<uint8_t>(), cg = r.read<uint8_t>(), cb = r.read<uint8_t>();
    double e = r.read<double>();
    uint64_t track_len = r.read<uint64_t>();
    r.skip(static_cast<long>(track_len) * 8);
    if (!r.ok) return -1;
    xyz[count * 3 + 0] = x; xyz[count * 3 + 1] = y; xyz[count * 3 + 2] = z;
    rgb[count * 3 + 0] = cr; rgb[count * 3 + 1] = cg; rgb[count * 3 + 2] = cb;
    err[count] = e;
    ++count;
  }
  return count;
}

// ------------------------------------------------------------------ images
// Packs per-image: id(int32), camera_id(int32), qvec(4 f64), tvec(3 f64),
// name (fixed 256 bytes, NUL padded).
long colmap_images_count(const char* path) {
  Reader r(path);
  if (!r.ok) return -1;
  uint64_t n = r.read<uint64_t>();
  return r.ok ? static_cast<long>(n) : -1;
}

long colmap_read_images(const char* path, int32_t* ids, int32_t* camera_ids,
                        double* qvecs, double* tvecs, char* names,
                        long capacity) {
  Reader r(path);
  if (!r.ok) return -1;
  uint64_t n = r.read<uint64_t>();
  if (!r.ok) return -1;
  long count = 0;
  for (uint64_t i = 0; i < n && count < capacity; ++i) {
    int32_t image_id = r.read<int32_t>();
    double q[4], t[3];
    for (double& v : q) v = r.read<double>();
    for (double& v : t) v = r.read<double>();
    int32_t camera_id = r.read<int32_t>();
    std::string name;
    while (r.ok) {
      char c = r.read<char>();
      if (c == '\0') break;
      name.push_back(c);
    }
    uint64_t n_pts = r.read<uint64_t>();
    r.skip(static_cast<long>(n_pts) * 24);
    if (!r.ok) return -1;
    ids[count] = image_id;
    camera_ids[count] = camera_id;
    std::memcpy(qvecs + count * 4, q, sizeof(q));
    std::memcpy(tvecs + count * 3, t, sizeof(t));
    std::memset(names + count * 256, 0, 256);
    std::strncpy(names + count * 256, name.c_str(), 255);
    ++count;
  }
  return count;
}

// ----------------------------------------------------------------- cameras
// Packs per-camera: id(int32), model_id(int32), width(int64), height(int64),
// params (8 f64, zero padded).
long colmap_read_cameras(const char* path, int32_t* ids, int32_t* model_ids,
                         int64_t* widths, int64_t* heights, double* params,
                         long capacity) {
  Reader r(path);
  if (!r.ok) return -1;
  uint64_t n = r.read<uint64_t>();
  if (!r.ok) return -1;
  long count = 0;
  for (uint64_t i = 0; i < n && count < capacity; ++i) {
    int32_t cam_id = r.read<int32_t>();
    int32_t model_id = r.read<int32_t>();
    uint64_t w = r.read<uint64_t>();
    uint64_t h = r.read<uint64_t>();
    int np = model_params(model_id);
    if (np < 0) return -1;
    double p[12] = {0};
    for (int j = 0; j < np; ++j) p[j] = r.read<double>();
    if (!r.ok) return -1;
    ids[count] = cam_id;
    model_ids[count] = model_id;
    widths[count] = static_cast<int64_t>(w);
    heights[count] = static_cast<int64_t>(h);
    std::memcpy(params + count * 8, p, 8 * sizeof(double));
    ++count;
  }
  return count;
}

// -------------------------------------------------------------------- PLY
// Binary-little-endian float32 x/y/z (+optional u8 rgb, f32 normals) fast
// path.  Returns count, fills has_rgb/has_normal flags.
long ply_read_xyz(const char* path, float* xyz, float* colors, float* normals,
                  long capacity, int* has_rgb, int* has_normal) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return -1;
  char line[512];
  long n = -1;
  bool in_vertex = false;
  std::vector<std::pair<std::string, int>> props;  // name, byte size
  bool binary_le = false;
  while (std::fgets(line, sizeof(line), f)) {
    std::string s(line);
    if (s.rfind("format", 0) == 0) {
      binary_le = s.find("binary_little_endian") != std::string::npos;
    } else if (s.rfind("element vertex", 0) == 0) {
      n = std::strtol(s.c_str() + 14, nullptr, 10);
      in_vertex = true;
    } else if (s.rfind("element", 0) == 0) {
      in_vertex = false;
    } else if (s.rfind("property", 0) == 0 && in_vertex) {
      char type[64], name[64];
      if (std::sscanf(s.c_str(), "property %63s %63s", type, name) == 2) {
        int size = 0;
        std::string t(type);
        if (t == "float" || t == "float32" || t == "int" || t == "uint" ||
            t == "int32" || t == "uint32") size = 4;
        else if (t == "double" || t == "float64") size = 8;
        else if (t == "uchar" || t == "char" || t == "uint8" || t == "int8") size = 1;
        else if (t == "short" || t == "ushort") size = 2;
        else { std::fclose(f); return -1; }  // lists unsupported here
        props.emplace_back(name, (t == "float" || t == "float32") ? -size : size);
        // negative size marks float32 (the only type we load directly)
      }
    } else if (s.rfind("end_header", 0) == 0) {
      break;
    }
  }
  if (!binary_le || n < 0) { std::fclose(f); return -1; }

  long stride = 0;
  struct Field { long off; int size; bool f32; bool u8; };
  Field fx{-1,0,false,false}, fy{-1,0,false,false}, fz{-1,0,false,false};
  Field fr{-1,0,false,false}, fg{-1,0,false,false}, fb{-1,0,false,false};
  Field fnx{-1,0,false,false}, fny{-1,0,false,false}, fnz{-1,0,false,false};
  for (auto& pr : props) {
    int size = pr.second < 0 ? -pr.second : pr.second;
    bool is_f32 = pr.second < 0;
    Field fld{stride, size, is_f32, size == 1};
    if (pr.first == "x") fx = fld; else if (pr.first == "y") fy = fld;
    else if (pr.first == "z") fz = fld;
    else if (pr.first == "red") fr = fld; else if (pr.first == "green") fg = fld;
    else if (pr.first == "blue") fb = fld;
    else if (pr.first == "nx") fnx = fld; else if (pr.first == "ny") fny = fld;
    else if (pr.first == "nz") fnz = fld;
    stride += size;
  }
  if (fx.off < 0 || fy.off < 0 || fz.off < 0 || !fx.f32) {
    std::fclose(f); return -1;
  }
  *has_rgb = (fr.off >= 0 && fr.u8) ? 1 : 0;
  *has_normal = (fnx.off >= 0 && fnx.f32) ? 1 : 0;

  std::vector<char> buf(static_cast<size_t>(stride) * 4096);
  long count = 0;
  while (count < n && count < capacity) {
    long batch = std::min<long>(4096, std::min<long>(n - count, capacity - count));
    if (std::fread(buf.data(), stride, batch, f) != static_cast<size_t>(batch)) break;
    for (long i = 0; i < batch; ++i) {
      const char* row = buf.data() + i * stride;
      std::memcpy(xyz + (count + i) * 3 + 0, row + fx.off, 4);
      std::memcpy(xyz + (count + i) * 3 + 1, row + fy.off, 4);
      std::memcpy(xyz + (count + i) * 3 + 2, row + fz.off, 4);
      if (*has_rgb) {
        colors[(count + i) * 3 + 0] = static_cast<uint8_t>(row[fr.off]) / 255.0f;
        colors[(count + i) * 3 + 1] = static_cast<uint8_t>(row[fg.off]) / 255.0f;
        colors[(count + i) * 3 + 2] = static_cast<uint8_t>(row[fb.off]) / 255.0f;
      }
      if (*has_normal) {
        std::memcpy(normals + (count + i) * 3 + 0, row + fnx.off, 4);
        std::memcpy(normals + (count + i) * 3 + 1, row + fny.off, 4);
        std::memcpy(normals + (count + i) * 3 + 2, row + fnz.off, 4);
      }
    }
    count += batch;
  }
  std::fclose(f);
  return count;
}

}  // extern "C"
