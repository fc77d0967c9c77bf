// Native image decode for the input pipeline.
//
// The reference feeds its trainer through 32 torchvision DataLoader worker
// processes (reference configs/dcmcs3di.yaml:15) whose hot work is PNG
// decode. Here decode is a thin C library driven from Python threads:
// ctypes calls release the GIL, so a thread pool gets true parallelism
// without worker processes. For random crops (reference utils/data.py:69-73)
// the PNG path stops inflating at the last needed row.
//
// API (all return 0 on success, negative error codes otherwise):
//   ct_image_info(path, &width, &height)
//   ct_decode_rgb8(path, out, out_size)            // full RGB8 image
//   ct_decode_crop_rgb8(path, top, left, h, w, out, out_size)
//
// Build: make -C native   (produces native/libctimageio.so)

#include <cstdio>
#include <cstdint>
#include <cstring>
#include <csetjmp>
#include <vector>

#include <png.h>
#include <jpeglib.h>

namespace {

constexpr int kErrOpen = -1;
constexpr int kErrFormat = -2;
constexpr int kErrDecode = -3;
constexpr int kErrBounds = -4;

struct File {
  FILE* f = nullptr;
  explicit File(const char* path) { f = fopen(path, "rb"); }
  ~File() {
    if (f) fclose(f);
  }
};

bool is_png(FILE* f) {
  unsigned char sig[8];
  if (fread(sig, 1, 8, f) != 8) return false;
  fseek(f, 0, SEEK_SET);
  return png_sig_cmp(sig, 0, 8) == 0;
}

struct PngReader {
  png_structp png = nullptr;
  png_infop info = nullptr;
  ~PngReader() {
    if (png) png_destroy_read_struct(&png, info ? &info : nullptr, nullptr);
  }
  // Returns 0 and leaves the reader positioned for row reads of RGB8.
  int open(FILE* f) {
    png = png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr, nullptr,
                                 nullptr);
    if (!png) return kErrDecode;
    info = png_create_info_struct(png);
    if (!info) return kErrDecode;
    if (setjmp(png_jmpbuf(png))) return kErrDecode;
    png_init_io(png, f);
    png_read_info(png, info);

    // Normalize every layout to 8-bit RGB.
    png_byte color = png_get_color_type(png, info);
    png_byte depth = png_get_bit_depth(png, info);
    if (depth == 16) png_set_strip_16(png);
    if (color == PNG_COLOR_TYPE_PALETTE) png_set_palette_to_rgb(png);
    if (color == PNG_COLOR_TYPE_GRAY && depth < 8)
      png_set_expand_gray_1_2_4_to_8(png);
    if (png_get_valid(png, info, PNG_INFO_tRNS)) png_set_tRNS_to_alpha(png);
    if (color == PNG_COLOR_TYPE_GRAY || color == PNG_COLOR_TYPE_GRAY_ALPHA)
      png_set_gray_to_rgb(png);
    if (color & PNG_COLOR_MASK_ALPHA) png_set_strip_alpha(png);
    if (png_get_valid(png, info, PNG_INFO_tRNS)) png_set_strip_alpha(png);
    png_read_update_info(png, info);
    return 0;
  }
};

int decode_png(FILE* f, int64_t top, int64_t left, int64_t crop_h,
               int64_t crop_w, uint8_t* out, int64_t out_size) {
  PngReader r;
  int rc = r.open(f);
  if (rc) return rc;
  if (setjmp(png_jmpbuf(r.png))) return kErrDecode;

  const int64_t width = png_get_image_width(r.png, r.info);
  const int64_t height = png_get_image_height(r.png, r.info);
  if (crop_h < 0) {  // full image
    top = 0;
    left = 0;
    crop_h = height;
    crop_w = width;
  }
  if (top < 0 || left < 0 || top + crop_h > height || left + crop_w > width)
    return kErrBounds;
  if (out_size < crop_h * crop_w * 3) return kErrBounds;

  const bool interlaced =
      png_get_interlace_type(r.png, r.info) != PNG_INTERLACE_NONE;
  std::vector<uint8_t> row(static_cast<size_t>(width) * 3);

  if (interlaced) {
    // Rare; decode whole image then crop.
    png_set_interlace_handling(r.png);
    std::vector<uint8_t> img(static_cast<size_t>(width) * height * 3);
    std::vector<png_bytep> rows(height);
    for (int64_t y = 0; y < height; ++y) rows[y] = img.data() + y * width * 3;
    png_read_image(r.png, rows.data());
    for (int64_t y = 0; y < crop_h; ++y)
      memcpy(out + y * crop_w * 3, img.data() + ((top + y) * width + left) * 3,
             static_cast<size_t>(crop_w) * 3);
    return 0;
  }

  // Sequential rows: skip leading rows, copy the crop, stop early.
  for (int64_t y = 0; y < top + crop_h; ++y) {
    png_read_row(r.png, row.data(), nullptr);
    if (y >= top)
      memcpy(out + (y - top) * crop_w * 3, row.data() + left * 3,
             static_cast<size_t>(crop_w) * 3);
  }
  return 0;
}

struct JpegErr {
  jpeg_error_mgr mgr;
  jmp_buf jmp;
};

void jpeg_err_exit(j_common_ptr cinfo) {
  auto* err = reinterpret_cast<JpegErr*>(cinfo->err);
  longjmp(err->jmp, 1);
}

int decode_jpeg(FILE* f, int64_t top, int64_t left, int64_t crop_h,
                int64_t crop_w, uint8_t* out, int64_t out_size) {
  jpeg_decompress_struct cinfo;
  JpegErr jerr;
  cinfo.err = jpeg_std_error(&jerr.mgr);
  jerr.mgr.error_exit = jpeg_err_exit;
  if (setjmp(jerr.jmp)) {
    jpeg_destroy_decompress(&cinfo);
    return kErrDecode;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_stdio_src(&cinfo, f);
  jpeg_read_header(&cinfo, TRUE);
  cinfo.out_color_space = JCS_RGB;
  jpeg_start_decompress(&cinfo);

  const int64_t width = cinfo.output_width;
  const int64_t height = cinfo.output_height;
  if (crop_h < 0) {
    top = 0;
    left = 0;
    crop_h = height;
    crop_w = width;
  }
  if (top < 0 || left < 0 || top + crop_h > height || left + crop_w > width ||
      out_size < crop_h * crop_w * 3) {
    jpeg_abort_decompress(&cinfo);
    jpeg_destroy_decompress(&cinfo);
    return kErrBounds;
  }

  std::vector<uint8_t> row(static_cast<size_t>(width) * 3);
  uint8_t* rowp = row.data();
  for (int64_t y = 0; y < top + crop_h; ++y) {
    jpeg_read_scanlines(&cinfo, &rowp, 1);
    if (y >= top)
      memcpy(out + (y - top) * crop_w * 3, row.data() + left * 3,
             static_cast<size_t>(crop_w) * 3);
  }
  jpeg_abort_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  return 0;
}

}  // namespace

extern "C" {

int ct_image_info(const char* path, int64_t* width, int64_t* height) {
  File file(path);
  if (!file.f) return kErrOpen;
  if (is_png(file.f)) {
    PngReader r;
    int rc = r.open(file.f);
    if (rc) return rc;
    *width = png_get_image_width(r.png, r.info);
    *height = png_get_image_height(r.png, r.info);
    return 0;
  }
  // JPEG fallback.
  jpeg_decompress_struct cinfo;
  JpegErr jerr;
  cinfo.err = jpeg_std_error(&jerr.mgr);
  jerr.mgr.error_exit = jpeg_err_exit;
  if (setjmp(jerr.jmp)) {
    jpeg_destroy_decompress(&cinfo);
    return kErrFormat;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_stdio_src(&cinfo, file.f);
  jpeg_read_header(&cinfo, TRUE);
  *width = cinfo.image_width;
  *height = cinfo.image_height;
  jpeg_destroy_decompress(&cinfo);
  return 0;
}

int ct_decode_rgb8(const char* path, uint8_t* out, int64_t out_size) {
  File file(path);
  if (!file.f) return kErrOpen;
  if (is_png(file.f)) return decode_png(file.f, 0, 0, -1, -1, out, out_size);
  return decode_jpeg(file.f, 0, 0, -1, -1, out, out_size);
}

int ct_decode_crop_rgb8(const char* path, int64_t top, int64_t left,
                        int64_t crop_h, int64_t crop_w, uint8_t* out,
                        int64_t out_size) {
  File file(path);
  if (!file.f) return kErrOpen;
  if (is_png(file.f))
    return decode_png(file.f, top, left, crop_h, crop_w, out, out_size);
  return decode_jpeg(file.f, top, left, crop_h, crop_w, out, out_size);
}

}  // extern "C"
