// Terminal frame presenter: RGB frame -> ANSI truecolor half-block string.
//
// The reference presents frames in an SDL2 window (main.cpp:177-232,
// 337-359); a remote TPU host has no display, so the interactive-viewer
// equivalent renders frames into the terminal with 24-bit ANSI color,
// packing two pixel rows per text row via the upper-half-block glyph
// (U+2580: foreground = top pixel, background = bottom pixel). This also
// resurrects the Sprint-1 "ASCII art" presentation the reference README
// describes (README.md:28-37).
//
// C ABI:
//   rt_term_frame(rgb, width, height, out, out_cap) -> bytes written (or
//     negative on error); `out` receives a NUL-terminated string of ANSI
//     escape sequences, height/2 (+1 if odd) text rows.
//   rt_term_frame_size(width, height) -> worst-case bytes needed.

#include <cstdint>
#include <cstdio>
#include <cstring>

extern "C" {

long rt_term_frame_size(int width, int height) {
  // Per half-block: ESC[38;2;R;G;Bm ESC[48;2;R;G;Bm + 3-byte glyph <= 44.
  long rows = (height + 1) / 2;
  return rows * (long(width) * 44 + 8) + 16;
}

long rt_term_frame(const uint8_t* rgb, int width, int height, char* out,
                   long out_cap) {
  if (!rgb || !out || width <= 0 || height <= 0) return -1;
  const long need = rt_term_frame_size(width, height);
  if (out_cap < need) return -2;

  char* p = out;
  const size_t stride = size_t(width) * 3;
  for (int y = 0; y < height; y += 2) {
    const uint8_t* top = rgb + size_t(y) * stride;
    const uint8_t* bot = (y + 1 < height) ? rgb + size_t(y + 1) * stride : nullptr;
    for (int x = 0; x < width; ++x) {
      const uint8_t* t = top + size_t(x) * 3;
      if (bot) {
        const uint8_t* b = bot + size_t(x) * 3;
        p += sprintf(p, "\x1b[38;2;%d;%d;%dm\x1b[48;2;%d;%d;%dm\xe2\x96\x80",
                     t[0], t[1], t[2], b[0], b[1], b[2]);
      } else {
        p += sprintf(p, "\x1b[38;2;%d;%d;%dm\x1b[49m\xe2\x96\x80", t[0], t[1],
                     t[2]);
      }
    }
    p += sprintf(p, "\x1b[0m\n");
  }
  *p = '\0';
  return long(p - out);
}

}  // extern "C"
