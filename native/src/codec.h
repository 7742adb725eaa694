// Internal image codec API shared by imagecodec.cpp (C ABI) and loader.cpp
// (threaded prefetch pipeline). Not exported.
#pragma once

#include <cstddef>
#include <cstdint>
#include <vector>

namespace ssn {

// A decoded raster: row-major, c in {1,3}, depth in {8,16}. 16-bit samples
// are stored native-endian (little on x86) as uint16 in `data`.
struct DecodedImage {
  int64_t h = 0, w = 0, c = 0;
  int depth = 8;
  std::vector<uint8_t> data;

  size_t sample_bytes() const { return depth == 16 ? 2 : 1; }
  size_t size_bytes() const { return (size_t)h * w * c * sample_bytes(); }
};

// Decode a PNG / JPEG / PNM (P5/P6) file by magic-byte sniffing.
// Alpha channels are stripped; palettes expanded to RGB; 16-bit is preserved
// only for grayscale (depth maps) and truncated to 8-bit for color.
bool decode_file(const char* path, DecodedImage* out);

// 8/16-bit gray or 8-bit RGB PNG writer (16-bit written big-endian per spec).
bool encode_png(const char* path, const void* data, int64_t h, int64_t w,
                int64_t c, int depth);

}  // namespace ssn
