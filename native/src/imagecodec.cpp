// Native image codec: PNG (libpng), JPEG (libjpeg), PNM decode + PNG encode.
//
// TPU-native counterpart of the reference's host-side image I/O, which goes
// through OpenCV imgcodecs (cv::imread in examples/rgbd_tum.cpp:79-80 and
// examples/label_instance_rgbd.cpp:84-88, cv::imwrite debug dumps in
// src/MaskRCNN.cpp:646, src/DoN.cpp:490). The framework decodes on the host
// in C++ and ships ready pixel buffers to the TPU; Python binds these through
// ctypes (semantic_slam_tpu/io/native.py) with a PIL fallback.

#include "codec.h"

#include <cctype>
#include <csetjmp>
#include <cstdio>
#include <cstring>

#include <jpeglib.h>
#include <png.h>

namespace ssn {
namespace {

// ---------------------------------------------------------------------------
// PNG
// ---------------------------------------------------------------------------

bool decode_png(FILE* f, DecodedImage* out) {
  png_structp png =
      png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr, nullptr, nullptr);
  if (!png) return false;
  png_infop info = png_create_info_struct(png);
  if (!info) {
    png_destroy_read_struct(&png, nullptr, nullptr);
    return false;
  }
  if (setjmp(png_jmpbuf(png))) {
    png_destroy_read_struct(&png, &info, nullptr);
    return false;
  }
  png_init_io(png, f);
  png_read_info(png, info);

  const png_byte color_type = png_get_color_type(png, info);
  const png_byte bit_depth = png_get_bit_depth(png, info);

  if (color_type == PNG_COLOR_TYPE_PALETTE) png_set_palette_to_rgb(png);
  if (color_type == PNG_COLOR_TYPE_GRAY && bit_depth < 8)
    png_set_expand_gray_1_2_4_to_8(png);
  if (png_get_valid(png, info, PNG_INFO_tRNS)) png_set_tRNS_to_alpha(png);
  png_set_strip_alpha(png);
  bool keep16 = false;
  if (bit_depth == 16) {
    if (color_type == PNG_COLOR_TYPE_GRAY ||
        color_type == PNG_COLOR_TYPE_GRAY_ALPHA) {
      keep16 = true;  // 16-bit depth maps (TUM) keep raw values
      png_set_swap(png);  // PNG is big-endian on the wire; we want native LE
    } else {
      png_set_strip_16(png);
    }
  }
  png_read_update_info(png, info);

  out->h = png_get_image_height(png, info);
  out->w = png_get_image_width(png, info);
  out->c = png_get_channels(png, info);
  out->depth = keep16 ? 16 : 8;
  const size_t rowbytes = png_get_rowbytes(png, info);
  out->data.resize(rowbytes * out->h);
  std::vector<png_bytep> rows(out->h);
  for (int64_t y = 0; y < out->h; ++y) rows[y] = out->data.data() + y * rowbytes;
  png_read_image(png, rows.data());
  png_destroy_read_struct(&png, &info, nullptr);
  return out->c == 1 || out->c == 3;
}

// ---------------------------------------------------------------------------
// JPEG
// ---------------------------------------------------------------------------

struct JpegErr {
  jpeg_error_mgr pub;
  std::jmp_buf jb;
};

void jpeg_error_trampoline(j_common_ptr cinfo) {
  std::longjmp(reinterpret_cast<JpegErr*>(cinfo->err)->jb, 1);
}

bool decode_jpeg(FILE* f, DecodedImage* out) {
  jpeg_decompress_struct cinfo;
  JpegErr jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = jpeg_error_trampoline;
  if (setjmp(jerr.jb)) {
    jpeg_destroy_decompress(&cinfo);
    return false;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_stdio_src(&cinfo, f);
  jpeg_read_header(&cinfo, TRUE);
  cinfo.out_color_space =
      cinfo.num_components == 1 ? JCS_GRAYSCALE : JCS_RGB;
  jpeg_start_decompress(&cinfo);
  out->h = cinfo.output_height;
  out->w = cinfo.output_width;
  out->c = cinfo.output_components;
  out->depth = 8;
  const size_t rowbytes = (size_t)out->w * out->c;
  out->data.resize(rowbytes * out->h);
  while (cinfo.output_scanline < cinfo.output_height) {
    JSAMPROW row = out->data.data() + (size_t)cinfo.output_scanline * rowbytes;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  return true;
}

// ---------------------------------------------------------------------------
// PNM (binary P5 gray / P6 rgb; 8- or 16-bit big-endian samples)
// ---------------------------------------------------------------------------

bool pnm_token(FILE* f, long* out) {
  int ch;
  for (;;) {
    ch = std::fgetc(f);
    if (ch == '#') {
      while (ch != EOF && ch != '\n') ch = std::fgetc(f);
    } else if (ch == EOF) {
      return false;
    } else if (!std::isspace(ch)) {
      break;
    }
  }
  long v = 0;
  while (ch != EOF && std::isdigit(ch)) {
    v = v * 10 + (ch - '0');
    ch = std::fgetc(f);
  }
  *out = v;
  return true;
}

bool decode_pnm(FILE* f, DecodedImage* out) {
  int p = std::fgetc(f), kind = std::fgetc(f);
  if (p != 'P' || (kind != '5' && kind != '6')) return false;
  long w, h, maxval;
  if (!pnm_token(f, &w) || !pnm_token(f, &h) || !pnm_token(f, &maxval))
    return false;
  out->w = w;
  out->h = h;
  out->c = kind == '6' ? 3 : 1;
  out->depth = maxval > 255 ? 16 : 8;
  out->data.resize(out->size_bytes());
  if (std::fread(out->data.data(), 1, out->data.size(), f) != out->data.size())
    return false;
  if (out->depth == 16) {  // PNM 16-bit is big-endian
    uint16_t* p16 = reinterpret_cast<uint16_t*>(out->data.data());
    const size_t n = out->data.size() / 2;
    for (size_t i = 0; i < n; ++i) p16[i] = (uint16_t)((p16[i] >> 8) | (p16[i] << 8));
  }
  return true;
}

}  // namespace

bool decode_file(const char* path, DecodedImage* out) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return false;
  unsigned char magic[8] = {0};
  size_t got = std::fread(magic, 1, 8, f);
  std::rewind(f);
  bool ok = false;
  if (got >= 8 && !std::memcmp(magic, "\x89PNG\r\n\x1a\n", 8)) {
    ok = decode_png(f, out);
  } else if (got >= 2 && magic[0] == 0xFF && magic[1] == 0xD8) {
    ok = decode_jpeg(f, out);
  } else if (got >= 2 && magic[0] == 'P' && (magic[1] == '5' || magic[1] == '6')) {
    ok = decode_pnm(f, out);
  }
  std::fclose(f);
  return ok;
}

bool encode_png(const char* path, const void* data, int64_t h, int64_t w,
                int64_t c, int depth) {
  if ((c != 1 && c != 3) || (depth != 8 && depth != 16)) return false;
  if (depth == 16 && c != 1) return false;
  FILE* f = std::fopen(path, "wb");
  if (!f) return false;
  png_structp png =
      png_create_write_struct(PNG_LIBPNG_VER_STRING, nullptr, nullptr, nullptr);
  png_infop info = png ? png_create_info_struct(png) : nullptr;
  if (!info || setjmp(png_jmpbuf(png))) {
    if (png) png_destroy_write_struct(&png, info ? &info : nullptr);
    std::fclose(f);
    return false;
  }
  png_init_io(png, f);
  png_set_IHDR(png, info, w, h, depth,
               c == 3 ? PNG_COLOR_TYPE_RGB : PNG_COLOR_TYPE_GRAY,
               PNG_INTERLACE_NONE, PNG_COMPRESSION_TYPE_DEFAULT,
               PNG_FILTER_TYPE_DEFAULT);
  png_write_info(png, info);
  if (depth == 16) png_set_swap(png);  // native LE -> big-endian wire order
  const size_t rowbytes = (size_t)w * c * (depth == 16 ? 2 : 1);
  const uint8_t* base = static_cast<const uint8_t*>(data);
  for (int64_t y = 0; y < h; ++y)
    png_write_row(png, const_cast<png_bytep>(base + y * rowbytes));
  png_write_end(png, nullptr);
  png_destroy_write_struct(&png, &info);
  std::fclose(f);
  return true;
}

}  // namespace ssn

// ---------------------------------------------------------------------------
// C ABI (ctypes)
// ---------------------------------------------------------------------------

extern "C" {

void* ssn_image_open(const char* path) {
  auto* im = new ssn::DecodedImage();
  if (!ssn::decode_file(path, im)) {
    delete im;
    return nullptr;
  }
  return im;
}

void ssn_image_info(void* h, int64_t* out) {
  auto* im = static_cast<ssn::DecodedImage*>(h);
  out[0] = im->h;
  out[1] = im->w;
  out[2] = im->c;
  out[3] = im->depth;
}

void ssn_image_fill(void* h, void* dst) {
  auto* im = static_cast<ssn::DecodedImage*>(h);
  std::memcpy(dst, im->data.data(), im->size_bytes());
}

void ssn_image_close(void* h) { delete static_cast<ssn::DecodedImage*>(h); }

int ssn_write_png(const char* path, const void* data, int64_t h, int64_t w,
                  int64_t c, int depth) {
  return ssn::encode_png(path, data, h, w, c, depth) ? 0 : 1;
}

}  // extern "C"
