// Minimal stb_image_write-compatible shim backed by libpng — implements
// stbi_write_png as used by the reference render output (main.cpp:237).
#pragma once

#include <png.h>

#include <csetjmp>
#include <cstdio>
#include <vector>

static inline int stbi_write_png(const char* filename, int w, int h, int comp,
                                 const void* data, int stride_bytes) {
  FILE* f = std::fopen(filename, "wb");
  if (!f) return 0;
  png_structp png =
      png_create_write_struct(PNG_LIBPNG_VER_STRING, nullptr, nullptr, nullptr);
  png_infop info = png ? png_create_info_struct(png) : nullptr;
  if (!png || !info || setjmp(png_jmpbuf(png))) {
    if (png) png_destroy_write_struct(&png, &info);
    std::fclose(f);
    return 0;
  }
  png_init_io(png, f);
  int color = comp == 1   ? PNG_COLOR_TYPE_GRAY
              : comp == 2 ? PNG_COLOR_TYPE_GRAY_ALPHA
              : comp == 3 ? PNG_COLOR_TYPE_RGB
                          : PNG_COLOR_TYPE_RGBA;
  png_set_IHDR(png, info, w, h, 8, color, PNG_INTERLACE_NONE,
               PNG_COMPRESSION_TYPE_DEFAULT, PNG_FILTER_TYPE_DEFAULT);
  png_write_info(png, info);
  const unsigned char* bytes = static_cast<const unsigned char*>(data);
  if (stride_bytes == 0) stride_bytes = w * comp;
  std::vector<png_bytep> rows(h);
  for (int j = 0; j < h; ++j)
    rows[j] = const_cast<png_bytep>(bytes + size_t(j) * stride_bytes);
  png_write_image(png, rows.data());
  png_write_end(png, nullptr);
  png_destroy_write_struct(&png, &info);
  std::fclose(f);
  return 1;
}
