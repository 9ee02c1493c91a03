// Native batch CDR decoders for bag staging (C ABI, loaded via ctypes).
//
// Mirrors fl_slam_tpu/io/cdr.py (the authoritative Python implementation,
// against which this is tested) for the three ROS 2 wire formats the
// pipeline consumes. Host-side bag staging decodes tens of thousands of
// messages per run; doing it in C++ keeps the 100x-real-time replay target
// from being bottlenecked by Python per-message overhead.
//
// Build: ./build_native.sh  ->  fl_slam_tpu/io/libgcio.so

#include <cstdint>
#include <cstring>

namespace {

struct Cursor {
  const uint8_t* buf;
  int64_t size;
  int64_t off;   // absolute offset; alignment origin is byte 4
  bool ok;

  explicit Cursor(const uint8_t* b, int64_t n) : buf(b), size(n), off(4), ok(true) {
    if (n < 4 || (b[1] != 0x01 && b[1] != 0x03)) ok = false;  // require LE
  }
  void align(int64_t n) {
    int64_t rel = off - 4;
    off += ((n - (rel % n)) % n);
  }
  bool need(int64_t n) {
    if (!ok || off + n > size) { ok = false; return false; }
    return true;
  }
  uint8_t u8() {
    if (!need(1)) return 0;
    return buf[off++];
  }
  uint32_t u32() {
    align(4);
    if (!need(4)) return 0;
    uint32_t v;
    std::memcpy(&v, buf + off, 4);
    off += 4;
    return v;
  }
  int32_t i32() { return static_cast<int32_t>(u32()); }
  double f64() {
    align(8);
    if (!need(8)) return 0.0;
    double v;
    std::memcpy(&v, buf + off, 8);
    off += 8;
    return v;
  }
  void f64n(double* out, int64_t n) {
    align(8);
    if (!need(8 * n)) return;
    std::memcpy(out, buf + off, 8 * n);
    off += 8 * n;
  }
  void skip_f64n(int64_t n) {
    align(8);
    if (need(8 * n)) off += 8 * n;
  }
  void skip_string() {
    uint32_t n = u32();
    if (need(n)) off += n;
  }
  double header_stamp() {
    int32_t sec = i32();
    uint32_t nsec = u32();
    skip_string();
    return static_cast<double>(sec) + 1e-9 * static_cast<double>(nsec);
  }
};

}  // namespace

extern "C" {

// out: (n, 7) row-major [stamp, gx, gy, gz, ax, ay, az]. Returns #decoded.
int64_t gcio_decode_imu_batch(const uint8_t* blob, const int64_t* offsets,
                              const int64_t* sizes, int64_t n, double* out) {
  int64_t done = 0;
  for (int64_t i = 0; i < n; ++i) {
    Cursor c(blob + offsets[i], sizes[i]);
    double* row = out + i * 7;
    row[0] = c.header_stamp();
    c.skip_f64n(4);   // orientation
    c.skip_f64n(9);
    c.f64n(row + 1, 3);
    c.skip_f64n(9);
    c.f64n(row + 4, 3);
    c.skip_f64n(9);
    if (c.ok) ++done;
  }
  return done;
}

// out: (n, 86) row-major
// [stamp, pos(3), quat_xyzw(4), pose_cov(36), vel(3), omega(3), twist_cov(36)]
int64_t gcio_decode_odom_batch(const uint8_t* blob, const int64_t* offsets,
                               const int64_t* sizes, int64_t n, double* out) {
  int64_t done = 0;
  for (int64_t i = 0; i < n; ++i) {
    Cursor c(blob + offsets[i], sizes[i]);
    double* row = out + i * 86;
    row[0] = c.header_stamp();
    c.skip_string();          // child_frame_id
    c.f64n(row + 1, 3);       // position
    c.f64n(row + 4, 4);       // quaternion
    c.f64n(row + 8, 36);      // pose covariance
    c.f64n(row + 44, 3);      // linear velocity
    c.f64n(row + 47, 3);      // angular velocity
    c.f64n(row + 50, 36);     // twist covariance
    if (c.ok) ++done;
  }
  return done;
}

// Parse one PointCloud2 and extract x/y/z (f32), per-point time (f32, field
// "time" or "t"; 0 if absent) and ring (u16 -> int32, -1 if absent).
// Returns the number of points written (<= cap), or -1 on malformed input.
int64_t gcio_decode_pointcloud2(const uint8_t* buf, int64_t size,
                                double* stamp_out, float* xyz_out,
                                float* time_out, int32_t* ring_out,
                                int64_t cap) {
  Cursor c(buf, size);
  if (!c.ok) return -1;
  stamp_out[0] = c.header_stamp();
  uint32_t height = c.u32();
  uint32_t width = c.u32();
  uint32_t n_fields = c.u32();

  int32_t off_x = -1, off_y = -1, off_z = -1, off_t = -1, off_ring = -1;
  uint8_t dt_t = 0, dt_ring = 0;
  char name[64];
  for (uint32_t f = 0; f < n_fields && c.ok; ++f) {
    uint32_t len = c.u32();
    uint32_t copy = len < 63 ? len : 63;
    if (!c.need(len)) break;
    std::memcpy(name, c.buf + c.off, copy);
    name[copy] = 0;
    c.off += len;
    uint32_t foff = c.u32();
    uint8_t fdt = c.u8();
    c.u32();  // count
    if (!std::strcmp(name, "x")) off_x = foff;
    else if (!std::strcmp(name, "y")) off_y = foff;
    else if (!std::strcmp(name, "z")) off_z = foff;
    else if (!std::strcmp(name, "time") || !std::strcmp(name, "t") ||
             !std::strcmp(name, "timestamp")) { off_t = foff; dt_t = fdt; }
    else if (!std::strcmp(name, "ring")) { off_ring = foff; dt_ring = fdt; }
  }
  uint8_t big = c.u8();
  uint32_t point_step = c.u32();
  c.u32();  // row_step
  uint32_t data_len = c.u32();
  if (!c.ok || big || off_x < 0 || off_y < 0 || off_z < 0 || point_step == 0)
    return -1;
  if (!c.need(data_len)) return -1;
  const uint8_t* data = c.buf + c.off;

  int64_t n = static_cast<int64_t>(height) * width;
  if (n > static_cast<int64_t>(data_len / point_step))
    n = data_len / point_step;
  if (n > cap) n = cap;

  for (int64_t i = 0; i < n; ++i) {
    const uint8_t* p = data + i * point_step;
    std::memcpy(xyz_out + 3 * i + 0, p + off_x, 4);
    std::memcpy(xyz_out + 3 * i + 1, p + off_y, 4);
    std::memcpy(xyz_out + 3 * i + 2, p + off_z, 4);
    float t = 0.0f;
    if (off_t >= 0) {
      if (dt_t == 7) {                       // FLOAT32
        std::memcpy(&t, p + off_t, 4);
      } else if (dt_t == 8) {                // FLOAT64
        double td;
        std::memcpy(&td, p + off_t, 8);
        t = static_cast<float>(td);
      } else if (dt_t == 6) {                // UINT32 (nanosec offsets)
        uint32_t tn;
        std::memcpy(&tn, p + off_t, 4);
        t = static_cast<float>(tn) * 1e-9f;
      }
    }
    time_out[i] = t;
    int32_t r = -1;
    if (off_ring >= 0) {
      if (dt_ring == 4) {                    // UINT16
        uint16_t rv;
        std::memcpy(&rv, p + off_ring, 2);
        r = rv;
      } else if (dt_ring == 2) {             // UINT8
        r = p[off_ring];
      }
    }
    ring_out[i] = r;
  }
  return n;
}

}  // extern "C"
