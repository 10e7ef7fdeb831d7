// Native image writer — the C++ L7 layer.
//
// The reference writes ASCII P3 with `fprintf("%d %d %d ")` after an int
// truncation (cpu/printer.c:3-18). Python string formatting of a megapixel
// image is the slow part of writeout; this does the same byte-exact
// formatting with a hand-rolled itoa into one buffer + single write.

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <string>
#include <vector>

extern "C" {

// image: (h*w*3) floats in [0,255]; truncated toward zero like the C cast.
// Returns 0 on success, -1 on IO error.
int32_t rgt_write_ppm(const char* path, const float* image, int64_t w,
                      int64_t h) {
  std::string out;
  out.reserve((size_t)(w * h * 12 + 32));
  char head[64];
  std::snprintf(head, sizeof(head), "P3\n%lld %lld\n255\n", (long long)w,
                (long long)h);
  out += head;
  char buf[16];
  for (int64_t i = 0; i < w * h * 3; ++i) {
    int v = (int)image[i];  // C float->int truncates toward zero
    char* p = buf;
    if (v < 0) {
      *p++ = '-';
      v = -v;
    }
    if (v >= 100) {
      *p++ = (char)('0' + v / 100);
      *p++ = (char)('0' + (v / 10) % 10);
      *p++ = (char)('0' + v % 10);
    } else if (v >= 10) {
      *p++ = (char)('0' + v / 10);
      *p++ = (char)('0' + v % 10);
    } else {
      *p++ = (char)('0' + v);
    }
    *p++ = ' ';
    out.append(buf, (size_t)(p - buf));
  }
  FILE* f = std::fopen(path, "wb");
  if (!f) return -1;
  size_t n = std::fwrite(out.data(), 1, out.size(), f);
  std::fclose(f);
  return n == out.size() ? 0 : -1;
}

}  // extern "C"
