// radnerf_io — native host-side IO runtime for radnerf_tpu.
//
// The reference framework leans on torch DataLoader workers + imageio for
// image decode (datasets/color_utils.py read_image); its training-time
// loader runs with num_workers=0 so decode/assembly sits on the Python hot
// path at startup. This C++ runtime provides:
//   - threaded PNG/JPEG decode (libpng/libjpeg) with alpha blending,
//     border unpadding and bilinear resize, writing straight into a
//     caller-provided float32 ray-store buffer (zero Python-side copies);
//   - a C ABI consumed via ctypes (no pybind11 in this image).
//
// Build: make -C native   (produces libradnerf_io.so)

#include <cstddef>
#include <cstdio>

#include <jpeglib.h>
#include <png.h>

#include <atomic>
#include <cmath>
#include <csetjmp>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <string>
#include <thread>
#include <vector>

namespace {

struct Image {
  std::vector<float> data;  // H*W*C, [0,1]
  int w = 0, h = 0, c = 0;
};

bool decode_png(const char* path, Image* out) {
  FILE* fp = fopen(path, "rb");
  if (!fp) return false;
  png_byte header[8];
  if (fread(header, 1, 8, fp) != 8 || png_sig_cmp(header, 0, 8)) {
    fclose(fp);
    return false;
  }
  png_structp png =
      png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr, nullptr, nullptr);
  png_infop info = png_create_info_struct(png);
  if (setjmp(png_jmpbuf(png))) {
    png_destroy_read_struct(&png, &info, nullptr);
    fclose(fp);
    return false;
  }
  png_init_io(png, fp);
  png_set_sig_bytes(png, 8);
  png_read_info(png, info);
  int w = png_get_image_width(png, info);
  int h = png_get_image_height(png, info);
  png_byte color = png_get_color_type(png, info);
  png_byte depth = png_get_bit_depth(png, info);
  if (depth == 16) png_set_strip_16(png);
  if (color == PNG_COLOR_TYPE_PALETTE) png_set_palette_to_rgb(png);
  if (color == PNG_COLOR_TYPE_GRAY && depth < 8)
    png_set_expand_gray_1_2_4_to_8(png);
  if (png_get_valid(png, info, PNG_INFO_tRNS)) png_set_tRNS_to_alpha(png);
  if (color == PNG_COLOR_TYPE_GRAY || color == PNG_COLOR_TYPE_GRAY_ALPHA)
    png_set_gray_to_rgb(png);
  png_read_update_info(png, info);
  int channels = png_get_channels(png, info);
  std::vector<png_byte> row(png_get_rowbytes(png, info));
  out->w = w;
  out->h = h;
  out->c = channels;
  out->data.resize(size_t(w) * h * channels);
  for (int y = 0; y < h; y++) {
    png_read_row(png, row.data(), nullptr);
    float* dst = out->data.data() + size_t(y) * w * channels;
    for (int i = 0; i < w * channels; i++) dst[i] = row[i] / 255.0f;
  }
  png_destroy_read_struct(&png, &info, nullptr);
  fclose(fp);
  return true;
}

struct JpegErr {
  jpeg_error_mgr mgr;
  jmp_buf jb;
};

void jpeg_err_exit(j_common_ptr cinfo) {
  JpegErr* e = reinterpret_cast<JpegErr*>(cinfo->err);
  longjmp(e->jb, 1);
}

bool decode_jpeg(const char* path, Image* out) {
  FILE* fp = fopen(path, "rb");
  if (!fp) return false;
  jpeg_decompress_struct cinfo;
  JpegErr jerr;
  cinfo.err = jpeg_std_error(&jerr.mgr);
  jerr.mgr.error_exit = jpeg_err_exit;
  if (setjmp(jerr.jb)) {
    jpeg_destroy_decompress(&cinfo);
    fclose(fp);
    return false;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_stdio_src(&cinfo, fp);
  jpeg_read_header(&cinfo, TRUE);
  cinfo.out_color_space = JCS_RGB;
  jpeg_start_decompress(&cinfo);
  int w = cinfo.output_width, h = cinfo.output_height,
      c = cinfo.output_components;
  out->w = w;
  out->h = h;
  out->c = c;
  out->data.resize(size_t(w) * h * c);
  std::vector<JSAMPLE> row(size_t(w) * c);
  JSAMPROW rp = row.data();
  for (int y = 0; y < h; y++) {
    jpeg_read_scanlines(&cinfo, &rp, 1);
    float* dst = out->data.data() + size_t(y) * w * c;
    for (int i = 0; i < w * c; i++) dst[i] = row[i] / 255.0f;
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  fclose(fp);
  return true;
}

// alpha handling (color_utils.py:27-31), unpad, bilinear resize, flatten
void postprocess(const Image& img, int out_w, int out_h, int blend_a,
                 int unpad, float* dst) {
  int w = img.w - 2 * unpad, h = img.h - 2 * unpad;
  const float* src = img.data.data();
  auto texel = [&](int x, int y, float rgb[3]) {
    x += unpad;
    y += unpad;
    const float* p = src + (size_t(y) * img.w + x) * img.c;
    if (img.c == 4) {
      float a = p[3];
      if (blend_a) {
        rgb[0] = p[0] * a + (1 - a);
        rgb[1] = p[1] * a + (1 - a);
        rgb[2] = p[2] * a + (1 - a);
      } else {
        rgb[0] = p[0] * a;
        rgb[1] = p[1] * a;
        rgb[2] = p[2] * a;
      }
    } else if (img.c >= 3) {
      rgb[0] = p[0];
      rgb[1] = p[1];
      rgb[2] = p[2];
    } else {
      rgb[0] = rgb[1] = rgb[2] = p[0];
    }
  };
  if (w == out_w && h == out_h) {
    for (int y = 0; y < out_h; y++)
      for (int x = 0; x < out_w; x++)
        texel(x, y, dst + (size_t(y) * out_w + x) * 3);
    return;
  }
  float sx = float(w) / out_w, sy = float(h) / out_h;
  for (int y = 0; y < out_h; y++) {
    float fy = (y + 0.5f) * sy - 0.5f;
    int y0 = (int)floorf(fy);
    float wy = fy - y0;
    int y1 = y0 + 1;
    y0 = y0 < 0 ? 0 : (y0 >= h ? h - 1 : y0);
    y1 = y1 < 0 ? 0 : (y1 >= h ? h - 1 : y1);
    for (int x = 0; x < out_w; x++) {
      float fx = (x + 0.5f) * sx - 0.5f;
      int x0 = (int)floorf(fx);
      float wx = fx - x0;
      int x1 = x0 + 1;
      x0 = x0 < 0 ? 0 : (x0 >= w ? w - 1 : x0);
      x1 = x1 < 0 ? 0 : (x1 >= w ? w - 1 : x1);
      float c00[3], c01[3], c10[3], c11[3];
      texel(x0, y0, c00);
      texel(x1, y0, c01);
      texel(x0, y1, c10);
      texel(x1, y1, c11);
      float* o = dst + (size_t(y) * out_w + x) * 3;
      for (int k = 0; k < 3; k++) {
        float top = c00[k] * (1 - wx) + c01[k] * wx;
        float bot = c10[k] * (1 - wx) + c11[k] * wx;
        o[k] = top * (1 - wy) + bot * wy;
      }
    }
  }
}

bool has_suffix(const std::string& s, const char* suf) {
  size_t n = strlen(suf);
  if (s.size() < n) return false;
  std::string tail = s.substr(s.size() - n);
  for (auto& ch : tail) ch = tolower(ch);
  return tail == suf;
}

}  // namespace

extern "C" {

// Decode `n` images (paths as NUL-separated blob) into `out`
// (n, out_h*out_w, 3) float32, using `n_threads` workers.
// Returns the number of successfully decoded images.
int radnerf_load_images(const char* paths_blob, int n, int out_w, int out_h,
                        int blend_a, int unpad, int n_threads, float* out) {
  std::vector<const char*> paths;
  const char* p = paths_blob;
  for (int i = 0; i < n; i++) {
    paths.push_back(p);
    p += strlen(p) + 1;
  }
  std::atomic<int> next(0), ok(0);
  auto worker = [&]() {
    Image img;
    while (true) {
      int i = next.fetch_add(1);
      if (i >= n) return;
      std::string path = paths[i];
      bool good = false;
      img.data.clear();
      if (has_suffix(path, ".png"))
        good = decode_png(path.c_str(), &img);
      else if (has_suffix(path, ".jpg") || has_suffix(path, ".jpeg"))
        good = decode_jpeg(path.c_str(), &img);
      if (!good) continue;
      postprocess(img, out_w, out_h, blend_a, unpad,
                  out + size_t(i) * out_w * out_h * 3);
      ok.fetch_add(1);
    }
  };
  int nt = n_threads > 0 ? n_threads : (int)std::thread::hardware_concurrency();
  if (nt < 1) nt = 1;
  std::vector<std::thread> threads;
  for (int t = 0; t < nt; t++) threads.emplace_back(worker);
  for (auto& t : threads) t.join();
  return ok.load();
}

// Morton-3D encode for the occupancy-grid export path (CPU twin of
// vren.morton3D; raymarching.cu:35-50 semantics).
void radnerf_morton3d(const int32_t* coords, int n, int32_t* out) {
  for (int i = 0; i < n; i++) {
    uint32_t r = 0;
    for (int b = 0; b < 10; b++)
      for (int d = 0; d < 3; d++)
        r |= ((coords[i * 3 + d] >> b) & 1u) << (3 * b + d);
    out[i] = (int32_t)r;
  }
}

}  // extern "C"
