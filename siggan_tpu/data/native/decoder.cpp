// Native image decode + resize for the input pipeline.
//
// The reference leans on PIL's C codecs through 4 DataLoader worker
// processes (data_loader_signatures.py:302). Here the host-side hot path is
// a small C++ library: libpng/libjpeg decode -> grayscale -> bilinear resize
// -> uint8, with a pthread batch API so a directory of scans decodes in
// parallel without Python in the loop. Python binds via ctypes
// (siggan_tpu/data/native/loader.py); everything falls back to PIL when the
// library is not built.
//
// C ABI:
//   int sig_decode(const char* path, unsigned char* out, int target_size);
//       -> 0 ok, negative error codes below.
//   int sig_decode_batch(const char** paths, int n, unsigned char* out,
//                        int target_size, int n_threads, int* statuses);
//       -> number of successful decodes; per-file status in `statuses`.
//
// Build: g++ -O2 -shared -fPIC decoder.cpp -lpng -ljpeg -lpthread
//        -o libsigdecode.so   (driven by build.py)

#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <csetjmp>
#include <cmath>
#include <vector>
#include <thread>
#include <atomic>

#include <png.h>
#include <jpeglib.h>

namespace {

constexpr int ERR_OPEN = -1;
constexpr int ERR_FORMAT = -2;
constexpr int ERR_DECODE = -3;
constexpr int ERR_ARGS = -4;

struct Image {
  int w = 0, h = 0, channels = 0;
  std::vector<unsigned char> pixels;  // interleaved
};

// ---------------------------------------------------------------- PNG ----
bool decode_png(FILE* f, Image* img) {
  png_structp png =
      png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr, nullptr, nullptr);
  if (!png) return false;
  png_infop info = png_create_info_struct(png);
  if (!info) {
    png_destroy_read_struct(&png, nullptr, nullptr);
    return false;
  }
  // `rows` must outlive a libpng longjmp: locals constructed AFTER
  // setjmp are skipped by the jump (destructor never runs -> leak on
  // every corrupt PNG). Declare it before the jump point.
  std::vector<png_bytep> rows;
  if (setjmp(png_jmpbuf(png))) {
    png_destroy_read_struct(&png, &info, nullptr);
    return false;
  }
  png_init_io(png, f);
  png_read_info(png, info);

  png_uint_32 w = png_get_image_width(png, info);
  png_uint_32 h = png_get_image_height(png, info);
  int color = png_get_color_type(png, info);
  int depth = png_get_bit_depth(png, info);

  if (depth == 16) png_set_strip_16(png);
  if (color == PNG_COLOR_TYPE_PALETTE) png_set_palette_to_rgb(png);
  if (color == PNG_COLOR_TYPE_GRAY && depth < 8) png_set_expand_gray_1_2_4_to_8(png);
  if (png_get_valid(png, info, PNG_INFO_tRNS)) png_set_tRNS_to_alpha(png);
  png_set_strip_alpha(png);
  png_read_update_info(png, info);

  int channels = png_get_channels(png, info);
  img->w = (int)w;
  img->h = (int)h;
  img->channels = channels;
  img->pixels.resize((size_t)w * h * channels);
  rows.resize(h);
  for (png_uint_32 y = 0; y < h; ++y)
    rows[y] = img->pixels.data() + (size_t)y * w * channels;
  png_read_image(png, rows.data());
  png_destroy_read_struct(&png, &info, nullptr);
  return true;
}

// --------------------------------------------------------------- JPEG ----
struct JpegErr {
  jpeg_error_mgr mgr;
  jmp_buf jmp;
};

void jpeg_err_exit(j_common_ptr cinfo) {
  JpegErr* err = reinterpret_cast<JpegErr*>(cinfo->err);
  longjmp(err->jmp, 1);
}

bool decode_jpeg(FILE* f, Image* img) {
  jpeg_decompress_struct cinfo;
  JpegErr jerr;
  cinfo.err = jpeg_std_error(&jerr.mgr);
  jerr.mgr.error_exit = jpeg_err_exit;
  if (setjmp(jerr.jmp)) {
    jpeg_destroy_decompress(&cinfo);
    return false;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_stdio_src(&cinfo, f);
  jpeg_read_header(&cinfo, TRUE);
  // CMYK/YCCK scans would reach to_gray's RGB luma formula with 4
  // channels of the wrong colorspace — have libjpeg hand us RGB (or keep
  // native grayscale), matching what PIL's convert("L") sees.
  if (cinfo.jpeg_color_space == JCS_CMYK ||
      cinfo.jpeg_color_space == JCS_YCCK) {
    jpeg_destroy_decompress(&cinfo);
    return false;  // rare; the per-file PIL fallback converts correctly
  }
  if (cinfo.num_components != 1) cinfo.out_color_space = JCS_RGB;
  jpeg_start_decompress(&cinfo);
  img->w = cinfo.output_width;
  img->h = cinfo.output_height;
  img->channels = cinfo.output_components;
  img->pixels.resize((size_t)img->w * img->h * img->channels);
  while ((int)cinfo.output_scanline < img->h) {
    unsigned char* row =
        img->pixels.data() + (size_t)cinfo.output_scanline * img->w * img->channels;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  return true;
}

// ---------------------------------------------------- gray + resize ----
// PIL convert("L") exact integer arithmetic (ImagingConvert.c L24 macro):
// L = (R*19595 + G*38470 + B*7471 + 0x8000) >> 16.
void to_gray(const Image& img, std::vector<unsigned char>* gray) {
  gray->resize((size_t)img.w * img.h);
  const unsigned char* p = img.pixels.data();
  if (img.channels == 1) {
    std::memcpy(gray->data(), p, gray->size());
    return;
  }
  int c = img.channels;
  for (size_t i = 0; i < gray->size(); ++i) {
    const unsigned char* px = p + i * c;
    (*gray)[i] = (unsigned char)(
        (px[0] * 19595u + px[1] * 38470u + px[2] * 7471u + 0x8000u) >> 16);
  }
}

// PIL-style BILINEAR resize: separable triangle filter whose support scales
// with the downscale ratio (antialiased), half-pixel centers — the exact
// scheme Image.resize(..., BILINEAR) uses, so native and PIL paths produce
// matching training data.
struct Taps {
  std::vector<int> xmin, xlen;
  std::vector<float> weights;  // padded to max_len per output
  int max_len = 0;
};

Taps precompute_taps(int in_size, int out_size) {
  Taps t;
  double scale = (double)in_size / out_size;
  double support = scale < 1.0 ? 1.0 : scale;  // triangle support * scale
  int max_len = (int)std::ceil(support) * 2 + 1;
  t.max_len = max_len;
  t.xmin.resize(out_size);
  t.xlen.resize(out_size);
  t.weights.assign((size_t)out_size * max_len, 0.0f);
  double ss = 1.0 / (scale < 1.0 ? 1.0 : scale);
  for (int x = 0; x < out_size; ++x) {
    double center = (x + 0.5) * scale;
    int xmin = (int)(center - support + 0.5);
    if (xmin < 0) xmin = 0;
    int xmax = (int)(center + support + 0.5);
    if (xmax > in_size) xmax = in_size;
    double total = 0.0;
    for (int k = xmin; k < xmax; ++k) {
      double d = std::fabs((k + 0.5 - center) * ss);
      double w = d < 1.0 ? 1.0 - d : 0.0;
      t.weights[(size_t)x * max_len + (k - xmin)] = (float)w;
      total += w;
    }
    if (total > 0) {
      for (int k = 0; k < xmax - xmin; ++k)
        t.weights[(size_t)x * max_len + k] /= (float)total;
    }
    t.xmin[x] = xmin;
    t.xlen[x] = xmax - xmin;
  }
  return t;
}

void resize_bilinear(const std::vector<unsigned char>& src, int sw, int sh,
                     unsigned char* dst, int tw, int th) {
  if (sw == tw && sh == th) {
    std::memcpy(dst, src.data(), (size_t)tw * th);
    return;
  }
  Taps tx = precompute_taps(sw, tw);
  Taps ty = precompute_taps(sh, th);
  // horizontal pass (float intermediate), then vertical
  std::vector<float> tmp((size_t)sh * tw);
  for (int y = 0; y < sh; ++y) {
    const unsigned char* row = src.data() + (size_t)y * sw;
    for (int x = 0; x < tw; ++x) {
      const float* w = tx.weights.data() + (size_t)x * tx.max_len;
      float acc = 0.0f;
      for (int k = 0; k < tx.xlen[x]; ++k) acc += row[tx.xmin[x] + k] * w[k];
      tmp[(size_t)y * tw + x] = acc;
    }
  }
  for (int y = 0; y < th; ++y) {
    const float* w = ty.weights.data() + (size_t)y * ty.max_len;
    for (int x = 0; x < tw; ++x) {
      float acc = 0.0f;
      for (int k = 0; k < ty.xlen[y]; ++k)
        acc += tmp[(size_t)(ty.xmin[y] + k) * tw + x] * w[k];
      float v = acc + 0.5f;
      dst[(size_t)y * tw + x] =
          (unsigned char)(v < 0 ? 0 : (v > 255 ? 255 : v));
    }
  }
}

int decode_one(const char* path, unsigned char* out, int target_size) {
  if (!path || !out || target_size <= 0) return ERR_ARGS;
  FILE* f = std::fopen(path, "rb");
  if (!f) return ERR_OPEN;
  unsigned char magic[4] = {0};
  if (std::fread(magic, 1, 4, f) != 4) {
    std::fclose(f);
    return ERR_FORMAT;
  }
  std::rewind(f);
  Image img;
  bool ok = false;
  if (magic[0] == 0x89 && magic[1] == 'P') {
    ok = decode_png(f, &img);
  } else if (magic[0] == 0xFF && magic[1] == 0xD8) {
    ok = decode_jpeg(f, &img);
  } else {
    std::fclose(f);
    return ERR_FORMAT;
  }
  std::fclose(f);
  if (!ok || img.w <= 0 || img.h <= 0) return ERR_DECODE;
  std::vector<unsigned char> gray;
  to_gray(img, &gray);
  resize_bilinear(gray, img.w, img.h, out, target_size, target_size);
  return 0;
}

}  // namespace

extern "C" {

int sig_decode(const char* path, unsigned char* out, int target_size) {
  return decode_one(path, out, target_size);
}

int sig_decode_batch(const char** paths, int n, unsigned char* out,
                     int target_size, int n_threads, int* statuses) {
  if (n <= 0) return 0;
  if (n_threads <= 0) n_threads = 1;
  if (n_threads > n) n_threads = n;
  std::atomic<int> next(0), ok_count(0);
  const size_t stride = (size_t)target_size * target_size;
  auto worker = [&]() {
    for (;;) {
      int i = next.fetch_add(1);
      if (i >= n) return;
      int st = decode_one(paths[i], out + stride * i, target_size);
      if (statuses) statuses[i] = st;
      if (st == 0) ok_count.fetch_add(1);
    }
  };
  std::vector<std::thread> threads;
  for (int t = 0; t < n_threads; ++t) threads.emplace_back(worker);
  for (auto& t : threads) t.join();
  return ok_count.load();
}

}  // extern "C"
