// Minimal stb_image-compatible shim backed by libpng — implements just
// stbi_load / stbi_image_free as used by the reference texture loader
// (texture.h:62,115).  All reference assets are PNGs.  Missing files return
// nullptr exactly like stb_image, which triggers the reference's magenta
// missing-texture sentinel (texture.h:117-131).
#pragma once

#include <png.h>

#include <csetjmp>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <vector>

typedef unsigned char stbi_uc;

static inline stbi_uc* stbi_load(const char* filename, int* x, int* y,
                                 int* channels_in_file, int desired_channels) {
  FILE* f = std::fopen(filename, "rb");
  if (!f) return nullptr;

  png_structp png =
      png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr, nullptr, nullptr);
  if (!png) {
    std::fclose(f);
    return nullptr;
  }
  png_infop info = png_create_info_struct(png);
  if (!info || setjmp(png_jmpbuf(png))) {
    png_destroy_read_struct(&png, &info, nullptr);
    std::fclose(f);
    return nullptr;
  }
  png_init_io(png, f);
  png_read_info(png, info);

  png_uint_32 w = png_get_image_width(png, info);
  png_uint_32 h = png_get_image_height(png, info);
  int color_type = png_get_color_type(png, info);
  int bit_depth = png_get_bit_depth(png, info);

  // normalize to 8-bit RGB or RGBA (stb_image-equivalent transforms)
  if (bit_depth == 16) png_set_strip_16(png);
  if (color_type == PNG_COLOR_TYPE_PALETTE) png_set_palette_to_rgb(png);
  if (color_type == PNG_COLOR_TYPE_GRAY && bit_depth < 8)
    png_set_expand_gray_1_2_4_to_8(png);
  if (png_get_valid(png, info, PNG_INFO_tRNS)) png_set_tRNS_to_alpha(png);
  if (color_type == PNG_COLOR_TYPE_GRAY ||
      color_type == PNG_COLOR_TYPE_GRAY_ALPHA)
    png_set_gray_to_rgb(png);
  png_read_update_info(png, info);

  int src_channels = int(png_get_channels(png, info));
  size_t rowbytes = png_get_rowbytes(png, info);
  stbi_uc* raw = static_cast<stbi_uc*>(std::malloc(rowbytes * h));
  std::vector<png_bytep> rows(h);
  for (png_uint_32 j = 0; j < h; ++j) rows[j] = raw + j * rowbytes;
  png_read_image(png, rows.data());
  png_destroy_read_struct(&png, &info, nullptr);
  std::fclose(f);

  int out_channels = desired_channels > 0 ? desired_channels : src_channels;
  *x = int(w);
  *y = int(h);
  *channels_in_file = src_channels;

  if (out_channels == src_channels) return raw;

  stbi_uc* out =
      static_cast<stbi_uc*>(std::malloc(size_t(w) * h * out_channels));
  for (size_t p = 0; p < size_t(w) * h; ++p) {
    const stbi_uc* s = raw + p * src_channels;
    stbi_uc* dpx = out + p * out_channels;
    for (int c = 0; c < out_channels; ++c)
      dpx[c] = c < src_channels ? s[c] : (c == 3 ? 255 : s[src_channels - 1]);
  }
  std::free(raw);
  return out;
}

static inline void stbi_image_free(void* p) { std::free(p); }
