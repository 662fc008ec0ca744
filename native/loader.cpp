// Native batch image loader for edgegan_tpu.
//
// The reference's host pipeline decodes every PNG synchronously with
// scipy/PIL inside the train loop (reference
// edgegan/utils/data/dataset.py:58-67). At TPU step times (~2 ms) that
// Python-side decode dominates wall-clock. This loader decodes a whole
// batch in parallel with std::thread, entirely outside the GIL
// (called via ctypes), and reproduces the reference's exact transform
// for the no-resize case:
//
//   scipy.misc.imread  -> float array of 8-bit samples
//   scipy.misc.imresize -> bytescale: stretch [min,max] -> [0,255]
//                          uint8 (the contrast-stretch quirk), then an
//                          identity PIL resize
//   /127.5 - 1          -> float32 in [-1, 1]
//
// Images whose decoded size differs from the expected size are
// reported back so Python can fall back to the PIL path (bit-exact
// PIL bilinear is deliberately not re-implemented here).
//
// Build: g++ -O3 -shared -fPIC -o libedgegan_loader.so loader.cpp -lpng -lpthread

#include <png.h>

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <thread>
#include <vector>

namespace {

// Decode one PNG into 8-bit RGB. Returns false on any mismatch/error.
bool decode_png_rgb(const char* path, int expect_h, int expect_w,
                    std::vector<uint8_t>* out) {
  FILE* fp = std::fopen(path, "rb");
  if (!fp) return false;
  png_byte header[8];
  if (std::fread(header, 1, 8, fp) != 8 || png_sig_cmp(header, 0, 8)) {
    std::fclose(fp);
    return false;
  }
  png_structp png =
      png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr, nullptr, nullptr);
  if (!png) {
    std::fclose(fp);
    return false;
  }
  png_infop info = png_create_info_struct(png);
  if (!info || setjmp(png_jmpbuf(png))) {
    png_destroy_read_struct(&png, &info, nullptr);
    std::fclose(fp);
    return false;
  }
  png_init_io(png, fp);
  png_set_sig_bytes(png, 8);
  png_read_info(png, info);

  const int w = png_get_image_width(png, info);
  const int h = png_get_image_height(png, info);
  if (h != expect_h || w != expect_w) {
    png_destroy_read_struct(&png, &info, nullptr);
    std::fclose(fp);
    return false;
  }
  // Normalize every color layout to 8-bit RGB.
  png_byte color = png_get_color_type(png, info);
  png_byte depth = png_get_bit_depth(png, info);
  if (depth == 16) png_set_strip_16(png);
  if (color == PNG_COLOR_TYPE_PALETTE) png_set_palette_to_rgb(png);
  if (color == PNG_COLOR_TYPE_GRAY && depth < 8) png_set_expand_gray_1_2_4_to_8(png);
  if (png_get_valid(png, info, PNG_INFO_tRNS)) png_set_tRNS_to_alpha(png);
  if (color == PNG_COLOR_TYPE_GRAY || color == PNG_COLOR_TYPE_GRAY_ALPHA)
    png_set_gray_to_rgb(png);
  if (color & PNG_COLOR_MASK_ALPHA) png_set_strip_alpha(png);
  png_read_update_info(png, info);
  if (png_get_rowbytes(png, info) != static_cast<size_t>(w) * 3) {
    png_destroy_read_struct(&png, &info, nullptr);
    std::fclose(fp);
    return false;
  }

  out->resize(static_cast<size_t>(h) * w * 3);
  std::vector<png_bytep> rows(h);
  for (int y = 0; y < h; ++y) rows[y] = out->data() + static_cast<size_t>(y) * w * 3;
  png_read_image(png, rows.data());
  png_destroy_read_struct(&png, &info, nullptr);
  std::fclose(fp);
  return true;
}

// bytescale (scipy): stretch [min,max] -> [0,255], round like scipy
// (add 0.4999 then truncate toward zero on the clipped value), then
// map to [-1, 1] via /127.5 - 1.
void transform_into(const std::vector<uint8_t>& rgb, float* dst) {
  uint8_t lo = 255, hi = 0;
  for (uint8_t v : rgb) {
    if (v < lo) lo = v;
    if (v > hi) hi = v;
  }
  float cscale = static_cast<float>(hi) - static_cast<float>(lo);
  if (cscale == 0.0f) cscale = 1.0f;
  const float scale = 255.0f / cscale;
  for (size_t i = 0; i < rgb.size(); ++i) {
    float s = (static_cast<float>(rgb[i]) - lo) * scale + 0.4999f;
    if (s < 0.0f) s = 0.0f;
    if (s > 255.0f) s = 255.0f;
    const uint8_t b = static_cast<uint8_t>(s);
    dst[i] = static_cast<float>(b) / 127.5f - 1.0f;
  }
}

}  // namespace

extern "C" {

// Decode `n` PNGs into out[n, h, w, 3] float32. Returns the number of
// failures; fail_mask[i] is set to 1 for images Python must fall back
// on (wrong size / not a PNG / decode error).
int edgegan_decode_batch(const char** paths, int n, int expect_h,
                         int expect_w, float* out, uint8_t* fail_mask,
                         int n_threads) {
  if (n_threads < 1) n_threads = 1;
  const size_t stride = static_cast<size_t>(expect_h) * expect_w * 3;
  std::vector<int> failures(n_threads, 0);

  auto worker = [&](int t) {
    std::vector<uint8_t> rgb;
    for (int i = t; i < n; i += n_threads) {
      if (decode_png_rgb(paths[i], expect_h, expect_w, &rgb)) {
        transform_into(rgb, out + stride * i);
        fail_mask[i] = 0;
      } else {
        fail_mask[i] = 1;
        ++failures[t];
      }
    }
  };

  std::vector<std::thread> threads;
  threads.reserve(n_threads);
  for (int t = 0; t < n_threads; ++t) threads.emplace_back(worker, t);
  for (auto& th : threads) th.join();

  int total = 0;
  for (int f : failures) total += f;
  return total;
}

}  // extern "C"
