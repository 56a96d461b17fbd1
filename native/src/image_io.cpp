// Native image encoding: PNG (zlib) and PPM writers.
//
// TPU-native rebuild of the reference's presentation path: instead of
// blitting the frame buffer into an SDL surface/texture each frame
// (reference: main.cpp:337-359), a headless TPU renderer exports frames to
// disk. The per-pixel u8 conversion the reference does unclamped via
// SDL_MapRGB(val*255) (main.cpp:345) happens on-device (ops/tonemap.py);
// this library receives ready u8 RGB rows and encodes them off the Python
// heap at C++ speed.
//
// Exposed C ABI (loaded via ctypes from raytracer_tpu/io/native.py):
//   rt_write_png(path, rgb, width, height) -> 0 on success
//   rt_write_ppm(path, rgb, width, height) -> 0 on success

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <vector>

#include <zlib.h>

namespace {

void put_be32(std::vector<uint8_t>& v, uint32_t x) {
  v.push_back(uint8_t(x >> 24));
  v.push_back(uint8_t(x >> 16));
  v.push_back(uint8_t(x >> 8));
  v.push_back(uint8_t(x));
}

uint32_t crc32_of(const uint8_t* data, size_t n, uint32_t seed = 0) {
  return uint32_t(::crc32(seed, data, uInt(n)));
}

void write_chunk(FILE* f, const char type[4], const std::vector<uint8_t>& payload) {
  std::vector<uint8_t> head;
  put_be32(head, uint32_t(payload.size()));
  fwrite(head.data(), 1, 4, f);
  fwrite(type, 1, 4, f);
  if (!payload.empty()) fwrite(payload.data(), 1, payload.size(), f);
  std::vector<uint8_t> crcbuf(type, type + 4);
  crcbuf.insert(crcbuf.end(), payload.begin(), payload.end());
  std::vector<uint8_t> crc;
  put_be32(crc, crc32_of(crcbuf.data(), crcbuf.size()));
  fwrite(crc.data(), 1, 4, f);
}

}  // namespace

extern "C" {

// rgb: row-major u8, 3 bytes/pixel, height*width*3 bytes.
int rt_write_png(const char* path, const uint8_t* rgb, int width, int height) {
  if (!path || !rgb || width <= 0 || height <= 0) return 1;

  // Filtered scanlines: filter byte 0 (None) + raw RGB per row.
  const size_t stride = size_t(width) * 3;
  std::vector<uint8_t> raw;
  raw.reserve((stride + 1) * size_t(height));
  for (int y = 0; y < height; ++y) {
    raw.push_back(0);
    raw.insert(raw.end(), rgb + y * stride, rgb + (y + 1) * stride);
  }

  uLongf bound = compressBound(uLong(raw.size()));
  std::vector<uint8_t> compressed(bound);
  if (compress2(compressed.data(), &bound, raw.data(), uLong(raw.size()), 6) != Z_OK)
    return 2;
  compressed.resize(bound);

  FILE* f = fopen(path, "wb");
  if (!f) return 3;
  static const uint8_t magic[8] = {137, 80, 78, 71, 13, 10, 26, 10};
  fwrite(magic, 1, 8, f);

  std::vector<uint8_t> ihdr;
  put_be32(ihdr, uint32_t(width));
  put_be32(ihdr, uint32_t(height));
  ihdr.push_back(8);   // bit depth
  ihdr.push_back(2);   // color type: truecolor RGB
  ihdr.push_back(0);   // compression
  ihdr.push_back(0);   // filter
  ihdr.push_back(0);   // interlace
  write_chunk(f, "IHDR", ihdr);
  write_chunk(f, "IDAT", compressed);
  write_chunk(f, "IEND", {});
  fclose(f);
  return 0;
}

int rt_write_ppm(const char* path, const uint8_t* rgb, int width, int height) {
  if (!path || !rgb || width <= 0 || height <= 0) return 1;
  FILE* f = fopen(path, "wb");
  if (!f) return 3;
  fprintf(f, "P6\n%d %d\n255\n", width, height);
  fwrite(rgb, 1, size_t(width) * size_t(height) * 3, f);
  fclose(f);
  return 0;
}

}  // extern "C"
