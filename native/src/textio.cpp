// Native host runtime: fast text-format map I/O + PLY export.
//
// TPU-native counterpart of the reference's C++ host I/O layer (map text
// checkpoint parsing in src/Utility.cpp:106-236 and exporters in
// src/ORB_SLAM2/System.cc:884-1120). Exposed through a minimal C ABI consumed
// from Python via ctypes (no pybind11 dependency).
//
// bundle.txt layout (see io/mapio.py docstring):
//   K P
//   per-KF: "0 0 0", 3 rows of R, 1 row of t          (5 lines, 15 floats)
//   per-point: xyz, "r g b", "nobs (kf kp u v)*"

#include <cctype>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <vector>

namespace {

struct Bundle {
  int64_t K = 0, P = 0, M = 0;
  std::vector<float> R;        // K*9
  std::vector<float> t;        // K*3
  std::vector<float> xyz;      // P*3
  std::vector<int32_t> off;    // P+1
  std::vector<int32_t> obs_kf; // M
  std::vector<int32_t> obs_kp; // M
  std::vector<float> obs_uv;   // M*2
};

// Single-pass whitespace tokenizer over an in-memory buffer: ~10x faster than
// iostream-based parsing for the multi-MB map files.
class Scanner {
 public:
  Scanner(const char* p, size_t n) : p_(p), end_(p + n) {}
  bool next(double* out) {
    while (p_ < end_ && std::isspace((unsigned char)*p_)) ++p_;
    if (p_ >= end_) return false;
    char* q = nullptr;
    *out = std::strtod(p_, &q);
    if (q == p_) return false;
    p_ = q;
    return true;
  }

 private:
  const char* p_;
  const char* end_;
};

}  // namespace

extern "C" {

void* ssn_bundle_open(const char* path) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return nullptr;
  std::fseek(f, 0, SEEK_END);
  long n = std::ftell(f);
  std::fseek(f, 0, SEEK_SET);
  std::vector<char> buf(n + 1);
  if (std::fread(buf.data(), 1, n, f) != (size_t)n) {
    std::fclose(f);
    return nullptr;
  }
  std::fclose(f);
  buf[n] = '\0';

  Scanner sc(buf.data(), n);
  double v;
  auto* b = new Bundle();
  if (!sc.next(&v)) { delete b; return nullptr; }
  b->K = (int64_t)v;
  if (!sc.next(&v)) { delete b; return nullptr; }
  b->P = (int64_t)v;
  b->R.resize(b->K * 9);
  b->t.resize(b->K * 3);
  for (int64_t i = 0; i < b->K; ++i) {
    for (int j = 0; j < 3; ++j) sc.next(&v);  // "0 0 0" line
    for (int j = 0; j < 9; ++j) { sc.next(&v); b->R[i * 9 + j] = (float)v; }
    for (int j = 0; j < 3; ++j) { sc.next(&v); b->t[i * 3 + j] = (float)v; }
  }
  b->xyz.resize(b->P * 3);
  b->off.resize(b->P + 1);
  b->off[0] = 0;
  for (int64_t j = 0; j < b->P; ++j) {
    for (int a = 0; a < 3; ++a) { sc.next(&v); b->xyz[j * 3 + a] = (float)v; }
    for (int a = 0; a < 3; ++a) sc.next(&v);  // color
    if (!sc.next(&v)) { delete b; return nullptr; }
    int64_t nobs = (int64_t)v;
    for (int64_t a = 0; a < nobs; ++a) {
      double kf, kp, u, vv;
      sc.next(&kf); sc.next(&kp); sc.next(&u); sc.next(&vv);
      b->obs_kf.push_back((int32_t)kf);
      b->obs_kp.push_back((int32_t)kp);
      b->obs_uv.push_back((float)u);
      b->obs_uv.push_back((float)vv);
    }
    b->off[j + 1] = (int32_t)b->obs_kf.size();
  }
  b->M = (int64_t)b->obs_kf.size();
  return b;
}

void ssn_bundle_counts(void* h, int64_t* out) {
  auto* b = static_cast<Bundle*>(h);
  out[0] = b->K;
  out[1] = b->P;
  out[2] = b->M;
}

void ssn_bundle_fill(void* h, float* R, float* t, float* xyz, int32_t* off,
                     int32_t* obs_kf, int32_t* obs_kp, float* obs_uv) {
  auto* b = static_cast<Bundle*>(h);
  std::memcpy(R, b->R.data(), b->R.size() * sizeof(float));
  std::memcpy(t, b->t.data(), b->t.size() * sizeof(float));
  std::memcpy(xyz, b->xyz.data(), b->xyz.size() * sizeof(float));
  std::memcpy(off, b->off.data(), b->off.size() * sizeof(int32_t));
  std::memcpy(obs_kf, b->obs_kf.data(), b->obs_kf.size() * sizeof(int32_t));
  std::memcpy(obs_kp, b->obs_kp.data(), b->obs_kp.size() * sizeof(int32_t));
  std::memcpy(obs_uv, b->obs_uv.data(), b->obs_uv.size() * sizeof(float));
}

void ssn_bundle_close(void* h) { delete static_cast<Bundle*>(h); }

int ssn_write_ply(const char* path, const float* xyz, const uint8_t* rgb,
                  int64_t n) {
  FILE* f = std::fopen(path, "wb");
  if (!f) return 1;
  std::fprintf(f,
               "ply\nformat binary_little_endian 1.0\nelement vertex %lld\n"
               "property float x\nproperty float y\nproperty float z\n"
               "property uchar red\nproperty uchar green\nproperty uchar blue\n"
               "end_header\n",
               (long long)n);
  for (int64_t i = 0; i < n; ++i) {
    std::fwrite(xyz + i * 3, sizeof(float), 3, f);
    std::fwrite(rgb + i * 3, sizeof(uint8_t), 3, f);
  }
  std::fclose(f);
  return 0;
}

}  // extern "C"
