// Minimal headless SDL2 stub: just enough API for the reference tracer's
// main.cpp to run unmodified. On the first SDL_RenderPresent the current
// surface is dumped to REF_GOLDEN_OUT (env var, default /tmp/ref_golden.ppm)
// and an SDL_QUIT event is queued so the program tears down normally.
#pragma once
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>

typedef uint8_t Uint8;
typedef uint32_t Uint32;

#define SDL_INIT_VIDEO 0x20
#define SDL_WINDOWPOS_UNDEFINED 0x1FFF0000
#define SDL_WINDOW_SHOWN 0x4
#define SDL_RENDERER_ACCELERATED 0x2
#define SDL_QUIT 0x100
#define SDL_KEYDOWN 0x300
enum {
  SDLK_UP = 1073741906, SDLK_DOWN, SDLK_LEFT, SDLK_RIGHT,
  SDLK_a = 'a', SDLK_s = 's', SDLK_d = 'd', SDLK_w = 'w',
  SDLK_q = 'q', SDLK_r = 'r',
};

struct SDL_PixelFormat { Uint32 Rmask, Gmask, Bmask, Amask; };
struct SDL_Surface {
  void *pixels; int w, h, pitch; SDL_PixelFormat *format;
};
struct SDL_Window { int dummy; };
struct SDL_Renderer { int dummy; };
struct SDL_Texture { int dummy; };
struct SDL_Keysym { int sym; };
struct SDL_KeyboardEvent { SDL_Keysym keysym; };
struct SDL_Event { Uint32 type; SDL_KeyboardEvent key; };

namespace sdl_stub {
inline SDL_Surface *&live_surface() { static SDL_Surface *s = nullptr; return s; }
inline int &frames_presented() { static int n = 0; return n; }
inline bool &quit_queued() { static bool q = false; return q; }

inline Uint32 shift_of(Uint32 mask) {
  Uint32 s = 0; while (mask && !(mask & 1)) { mask >>= 1; ++s; } return s;
}

inline void dump_surface(SDL_Surface *s) {
  const char *path = getenv("REF_GOLDEN_OUT");
  if (!path) path = "/tmp/ref_golden.ppm";
  FILE *f = fopen(path, "wb");
  if (!f) return;
  fprintf(f, "P6\n%d %d\n255\n", s->w, s->h);
  Uint32 rs = shift_of(s->format->Rmask), gs = shift_of(s->format->Gmask),
         bs = shift_of(s->format->Bmask);
  for (int y = 0; y < s->h; ++y) {
    const Uint32 *row = (const Uint32 *)((const Uint8 *)s->pixels + y * s->pitch);
    for (int x = 0; x < s->w; ++x) {
      Uint32 p = row[x];
      Uint8 rgb[3] = {
        (Uint8)((p & s->format->Rmask) >> rs),
        (Uint8)((p & s->format->Gmask) >> gs),
        (Uint8)((p & s->format->Bmask) >> bs),
      };
      fwrite(rgb, 1, 3, f);
    }
  }
  fclose(f);
  fprintf(stderr, "[sdl-stub] dumped %dx%d surface to %s\n", s->w, s->h, path);
}
}  // namespace sdl_stub

inline int SDL_Init(Uint32) { return 0; }
inline const char *SDL_GetError() { return "stub"; }
inline SDL_Window *SDL_CreateWindow(const char *, int, int, int, int, Uint32) {
  return new SDL_Window();
}
inline SDL_Surface *SDL_CreateRGBSurface(Uint32, int w, int h, int,
                                         Uint32 Rm, Uint32 Gm, Uint32 Bm,
                                         Uint32 Am) {
  SDL_Surface *s = new SDL_Surface();
  s->w = w; s->h = h; s->pitch = w * 4;
  s->pixels = calloc((size_t)w * h, 4);
  s->format = new SDL_PixelFormat{Rm, Gm, Bm, Am};
  sdl_stub::live_surface() = s;
  return s;
}
inline SDL_Renderer *SDL_CreateRenderer(SDL_Window *, int, Uint32) {
  return new SDL_Renderer();
}
inline Uint32 SDL_MapRGBA(const SDL_PixelFormat *f, Uint8 r, Uint8 g, Uint8 b,
                          Uint8 a) {
  return ((Uint32)r * (f->Rmask / 0xFF) & f->Rmask) |
         ((Uint32)g * (f->Gmask / 0xFF) & f->Gmask) |
         ((Uint32)b * (f->Bmask / 0xFF) & f->Bmask) |
         (f->Amask ? ((Uint32)a * (f->Amask / 0xFF) & f->Amask) : 0);
}
inline Uint32 SDL_MapRGB(const SDL_PixelFormat *f, Uint8 r, Uint8 g, Uint8 b) {
  return SDL_MapRGBA(f, r, g, b, 0xFF);
}
inline SDL_Texture *SDL_CreateTextureFromSurface(SDL_Renderer *, SDL_Surface *) {
  return new SDL_Texture();
}
inline int SDL_RenderClear(SDL_Renderer *) { return 0; }
inline int SDL_RenderCopy(SDL_Renderer *, SDL_Texture *, const void *,
                          const void *) { return 0; }
inline void SDL_RenderPresent(SDL_Renderer *) {
  if (++sdl_stub::frames_presented() == 1 && sdl_stub::live_surface()) {
    sdl_stub::dump_surface(sdl_stub::live_surface());
    sdl_stub::quit_queued() = true;
  }
}
inline int SDL_PollEvent(SDL_Event *e) {
  if (sdl_stub::quit_queued()) {
    sdl_stub::quit_queued() = false;
    e->type = SDL_QUIT;
    return 1;
  }
  return 0;
}
inline void SDL_DestroyTexture(SDL_Texture *) {}
inline void SDL_DestroyRenderer(SDL_Renderer *) {}
inline void SDL_DestroyWindow(SDL_Window *) {}
inline void SDL_FreeSurface(SDL_Surface *) {}
inline void SDL_Quit() {}
