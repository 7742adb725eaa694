// Native Velodyne scan -> camera-frame range image projection.
//
// Host-side counterpart of the reference's lidar input synthesis
// (src/Utility.cpp:374-419 GetRangeImageFromBinaryFile + :452-496
// projectPointCloud): read a KITTI .bin scan, transform into the camera
// frame, project with pinhole intrinsics, z-buffer the nearest return per
// pixel, store Euclidean range (the quantity the engine backprojects with
// the range/sqrt(x^2+y^2+1) rule). Python binding in io/native.py; the
// NumPy implementation in io/datasets.py remains the fallback.

#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <vector>

extern "C" {

// Tr: row-major [3,4] velo->cam; K: {fx, fy, cx, cy}.
// out: [height*width] float32 range image (0 = no return).
// Returns number of points projected, or -1 on read failure.
int64_t ssn_velodyne_range_image(const char* path, const float* Tr,
                                 const float* K, int64_t width,
                                 int64_t height, float min_z, float* out) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return -1;
  std::fseek(f, 0, SEEK_END);
  const long nbytes = std::ftell(f);
  std::fseek(f, 0, SEEK_SET);
  const int64_t n = nbytes / (4 * sizeof(float));
  std::vector<float> pts(n * 4);
  if (std::fread(pts.data(), sizeof(float), n * 4, f) != (size_t)(n * 4)) {
    std::fclose(f);
    return -1;
  }
  std::fclose(f);

  std::memset(out, 0, (size_t)width * height * sizeof(float));
  const float fx = K[0], fy = K[1], cx = K[2], cy = K[3];
  int64_t kept = 0;
  for (int64_t i = 0; i < n; ++i) {
    const float x = pts[i * 4], y = pts[i * 4 + 1], z = pts[i * 4 + 2];
    const float px = Tr[0] * x + Tr[1] * y + Tr[2] * z + Tr[3];
    const float py = Tr[4] * x + Tr[5] * y + Tr[6] * z + Tr[7];
    const float pz = Tr[8] * x + Tr[9] * y + Tr[10] * z + Tr[11];
    if (pz <= min_z) continue;
    const int64_t u = (int64_t)(fx * px / pz + cx);
    const int64_t v = (int64_t)(fy * py / pz + cy);
    if (u < 0 || u >= width || v < 0 || v >= height) continue;
    const float rng = std::sqrt(px * px + py * py + pz * pz);
    float& cell = out[v * width + u];
    if (cell == 0.0f || rng < cell) cell = rng;  // nearest return wins
    ++kept;
  }
  return kept;
}

}  // extern "C"
