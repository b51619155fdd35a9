// fdn_native: host-side image pipeline (decode + pad + crop + augment +
// normalize) as one C call per sample, plus a threaded batch assembler.
//
// Role in the framework: the reference's data path is Python cv2 +
// torch DataLoader workers (basicsr/data/paired_image_dataset.py:97-131,
// basicsr/data/prefetch_dataloader.py); this is the TPU rebuild's native
// equivalent — the decode/augment runs outside the GIL and writes the
// final float32 NHWC training batch directly into a caller-owned buffer
// (no per-sample numpy intermediates, no Python-side copies).
//
// Numerics contract (tested in tests/test_native_loader.py):
//   * PNG decode is bit-identical to cv2.imread(IMREAD_COLOR) + BGR->RGB;
//   * JPEG decode uses libjpeg JDCT_ISLOW (cv2's default IDCT) — baseline
//     JPEGs match cv2 exactly, tests tolerate ±1 LSB elsewhere;
//   * reflect-pad is cv2.BORDER_REFLECT_101;
//   * crop/flip/rot90 match data/transforms.py exactly (same index math);
//   * normalize is u8/255.0f in f32.
//
// Build: fdn_tip2025_tpu/native/build.py (g++ -O3 -shared, links
// libpng + libjpeg). Python bindings: fdn_tip2025_tpu/native/__init__.py
// via ctypes (no pybind11 in this image).

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <csetjmp>
#include <string>
#include <thread>
#include <vector>

#include <jpeglib.h>
#include <png.h>

namespace {

// ---------------------------------------------------------------- errors
thread_local char g_err[256];

void set_err(const char* msg) {
  std::snprintf(g_err, sizeof(g_err), "%s", msg);
}

// ------------------------------------------------------------ PNG decode
// Memory source: all decoding is buffer-based; the file entry points
// read the bytes once and reuse this path (identical decode either way,
// and it is what the FDNPack single-file dataset feeds directly).
struct MemSrc {
  const uint8_t* data;
  size_t size;
  size_t pos;
};

void png_mem_read(png_structp png, png_bytep out, png_size_t n) {
  MemSrc* src = static_cast<MemSrc*>(png_get_io_ptr(png));
  if (src->pos + n > src->size) {
    png_error(png, "read past end of buffer");
    return;
  }
  std::memcpy(out, src->data + src->pos, n);
  src->pos += n;
}

bool decode_png_mem(const uint8_t* data, size_t size,
                    std::vector<uint8_t>* rgb, int* h, int* w) {
  png_structp png = png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr,
                                           nullptr, nullptr);
  png_infop info = png ? png_create_info_struct(png) : nullptr;
  if (!png || !info) {
    if (png) png_destroy_read_struct(&png, &info, nullptr);
    set_err("png alloc failed");
    return false;
  }
  if (setjmp(png_jmpbuf(png))) {
    png_destroy_read_struct(&png, &info, nullptr);
    set_err("png decode error");
    return false;
  }
  MemSrc src{data, size, 0};
  png_set_read_fn(png, &src, png_mem_read);
  png_read_info(png, info);
  // Normalize to 8-bit RGB exactly like cv2.IMREAD_COLOR: strip 16->8,
  // palette->rgb, gray->rgb, drop alpha.
  png_set_strip_16(png);
  png_set_strip_alpha(png);
  png_set_palette_to_rgb(png);
  if (png_get_color_type(png, info) == PNG_COLOR_TYPE_GRAY &&
      png_get_bit_depth(png, info) < 8) {
    png_set_expand_gray_1_2_4_to_8(png);
  }
  png_set_gray_to_rgb(png);
  png_read_update_info(png, info);
  const int H = static_cast<int>(png_get_image_height(png, info));
  const int W = static_cast<int>(png_get_image_width(png, info));
  if (png_get_rowbytes(png, info) != static_cast<size_t>(W) * 3) {
    png_destroy_read_struct(&png, &info, nullptr);
    set_err("png: unexpected rowbytes after normalization");
    return false;
  }
  rgb->resize(static_cast<size_t>(H) * W * 3);
  std::vector<png_bytep> rows(H);
  for (int y = 0; y < H; ++y)
    rows[y] = rgb->data() + static_cast<size_t>(y) * W * 3;
  png_read_image(png, rows.data());
  png_read_end(png, nullptr);
  png_destroy_read_struct(&png, &info, nullptr);
  *h = H;
  *w = W;
  return true;
}

// ----------------------------------------------------------- JPEG decode
struct JpegErr {
  jpeg_error_mgr mgr;
  jmp_buf jmp;
};

void jpeg_err_exit(j_common_ptr cinfo) {
  JpegErr* e = reinterpret_cast<JpegErr*>(cinfo->err);
  longjmp(e->jmp, 1);
}

bool decode_jpeg_mem(const uint8_t* data, size_t size,
                     std::vector<uint8_t>* rgb, int* h, int* w) {
  jpeg_decompress_struct cinfo;
  JpegErr jerr;
  cinfo.err = jpeg_std_error(&jerr.mgr);
  jerr.mgr.error_exit = jpeg_err_exit;
  if (setjmp(jerr.jmp)) {
    jpeg_destroy_decompress(&cinfo);
    set_err("jpeg decode error");
    return false;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, const_cast<unsigned char*>(data),
               static_cast<unsigned long>(size));
  jpeg_read_header(&cinfo, TRUE);
  cinfo.out_color_space = JCS_RGB;
  cinfo.dct_method = JDCT_ISLOW;  // cv2/libjpeg-turbo default: exact match
  jpeg_start_decompress(&cinfo);
  const int H = static_cast<int>(cinfo.output_height);
  const int W = static_cast<int>(cinfo.output_width);
  rgb->resize(static_cast<size_t>(H) * W * 3);
  while (cinfo.output_scanline < cinfo.output_height) {
    JSAMPROW row =
        rgb->data() + static_cast<size_t>(cinfo.output_scanline) * W * 3;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  *h = H;
  *w = W;
  return true;
}

bool decode_any_mem(const uint8_t* data, size_t size,
                    std::vector<uint8_t>* rgb, int* h, int* w) {
  if (size >= 4 && data[0] == 0x89 && data[1] == 'P') {
    return decode_png_mem(data, size, rgb, h, w);
  }
  if (size >= 2 && data[0] == 0xFF && data[1] == 0xD8) {
    return decode_jpeg_mem(data, size, rgb, h, w);
  }
  set_err("unsupported image format (PNG/JPEG only)");
  return false;
}

bool read_file(const char* path, std::vector<uint8_t>* bytes) {
  FILE* f = std::fopen(path, "rb");
  if (!f) {
    set_err("fopen failed");
    return false;
  }
  std::fseek(f, 0, SEEK_END);
  const long n = std::ftell(f);
  if (n < 0) {
    std::fclose(f);
    set_err("ftell failed");
    return false;
  }
  std::fseek(f, 0, SEEK_SET);
  bytes->resize(static_cast<size_t>(n));
  const bool ok =
      std::fread(bytes->data(), 1, bytes->size(), f) == bytes->size();
  std::fclose(f);
  if (!ok) set_err("short read");
  return ok;
}

bool decode_any(const char* path, std::vector<uint8_t>* rgb, int* h,
                int* w) {
  std::vector<uint8_t> bytes;
  if (!read_file(path, &bytes)) return false;
  return decode_any_mem(bytes.data(), bytes.size(), rgb, h, w);
}

// -------------------------------------------- pad + crop + augment + f32
// reflect-101 index: mirror without repeating the border pixel.
inline int reflect101(int i, int n) {
  if (n == 1) return 0;
  const int period = 2 * (n - 1);
  i %= period;
  if (i < 0) i += period;
  return (i < n) ? i : period - i;
}

// Writes a (crop, crop, 3) f32 RGB tile from the reflect-padded source.
// Augment order matches data/transforms.py augment_pair: hflip, then
// vflip, then transpose(1,0,2). Output index (y, x) pulls from the
// cropped tile at (ys, xs) derived by inverting those ops.
void emit_crop(const uint8_t* src, int H, int W, int top, int left,
               int crop, bool do_h, bool do_v, bool do_r, float* out) {
  for (int y = 0; y < crop; ++y) {
    for (int x = 0; x < crop; ++x) {
      // position inside the cropped tile, before augmentation
      int ty = y, tx = x;
      if (do_r) {  // out = tile.T  =>  tile index (x, y)
        ty = x;
        tx = y;
      }
      if (do_v) ty = crop - 1 - ty;
      if (do_h) tx = crop - 1 - tx;
      const int sy = reflect101(top + ty, H);
      const int sx = reflect101(left + tx, W);
      const uint8_t* p = src + (static_cast<size_t>(sy) * W + sx) * 3;
      float* o = out + (static_cast<size_t>(y) * crop + x) * 3;
      // divide (not multiply-by-reciprocal): bit-identical to numpy's
      // u8.astype(f32)/255.0 (tests assert exact equality)
      o[0] = p[0] / 255.0f;
      o[1] = p[1] / 255.0f;
      o[2] = p[2] / 255.0f;
    }
  }
}

struct SampleSpec {
  const char* lq_path;
  const char* gt_path;
  int top, left, crop;
  int do_h, do_v, do_r;
};

bool load_pair_decoded(const std::vector<uint8_t>& lq, int lh, int lw,
                       const std::vector<uint8_t>& gt, int gh, int gw,
                       const SampleSpec& s, float* lq_out, float* gt_out) {
  if (lh != gh || lw != gw) {
    set_err("lq/gt size mismatch (scale != 1 unsupported in native path)");
    return false;
  }
  emit_crop(lq.data(), lh, lw, s.top, s.left, s.crop, s.do_h, s.do_v,
            s.do_r, lq_out);
  emit_crop(gt.data(), gh, gw, s.top, s.left, s.crop, s.do_h, s.do_v,
            s.do_r, gt_out);
  return true;
}

bool load_pair_impl(const SampleSpec& s, float* lq_out, float* gt_out) {
  std::vector<uint8_t> lq, gt;
  int lh, lw, gh, gw;
  if (!decode_any(s.lq_path, &lq, &lh, &lw)) return false;
  if (!decode_any(s.gt_path, &gt, &gh, &gw)) return false;
  return load_pair_decoded(lq, lh, lw, gt, gh, gw, s, lq_out, gt_out);
}

}  // namespace

extern "C" {

const char* fdn_last_error() { return g_err; }

// Peek image dimensions without a full decode (PNG IHDR / JPEG SOF).
// Returns 0 on success.
int fdn_image_dims(const char* path, int* h, int* w) {
  FILE* f = std::fopen(path, "rb");
  if (!f) {
    set_err("fopen failed");
    return 1;
  }
  unsigned char buf[32];
  size_t n = std::fread(buf, 1, sizeof(buf), f);
  if (n >= 24 && buf[0] == 0x89 && buf[1] == 'P') {
    *w = (buf[16] << 24) | (buf[17] << 16) | (buf[18] << 8) | buf[19];
    *h = (buf[20] << 24) | (buf[21] << 16) | (buf[22] << 8) | buf[23];
    std::fclose(f);
    return 0;
  }
  if (n >= 2 && buf[0] == 0xFF && buf[1] == 0xD8) {
    // walk JPEG segments for SOF0..SOF15 (excluding DHT/DAC/RST/...)
    std::fseek(f, 2, SEEK_SET);
    unsigned char m[9];
    while (std::fread(m, 1, 4, f) == 4) {
      if (m[0] != 0xFF) break;
      const int marker = m[1];
      const int len = (m[2] << 8) | m[3];
      if (marker >= 0xC0 && marker <= 0xCF && marker != 0xC4 &&
          marker != 0xC8 && marker != 0xCC) {
        if (std::fread(m, 1, 5, f) != 5) break;
        *h = (m[1] << 8) | m[2];
        *w = (m[3] << 8) | m[4];
        std::fclose(f);
        return 0;
      }
      if (len < 2 || std::fseek(f, len - 2, SEEK_CUR) != 0) break;
    }
    std::fclose(f);
    set_err("jpeg: SOF not found");
    return 1;
  }
  std::fclose(f);
  set_err("unsupported image format (PNG/JPEG only)");
  return 1;
}

// Full decode -> f32 RGB [0,1] into out (caller sized h*w*3 from
// fdn_image_dims). Returns 0 on success.
int fdn_decode_f32(const char* path, float* out, int h, int w) {
  std::vector<uint8_t> rgb;
  int H, W;
  if (!decode_any(path, &rgb, &H, &W)) return 1;
  if (H != h || W != w) {
    set_err("dims changed between peek and decode");
    return 1;
  }
  const size_t n = static_cast<size_t>(H) * W * 3;
  for (size_t i = 0; i < n; ++i) out[i] = rgb[i] / 255.0f;
  return 0;
}

// One training sample: decode pair, reflect-pad (implicit, via reflected
// indexing), crop at (top, left), augment, normalize. lq_out/gt_out are
// (crop, crop, 3) f32. Returns 0 on success.
int fdn_load_pair(const char* lq_path, const char* gt_path, int top,
                  int left, int crop, int do_h, int do_v, int do_r,
                  float* lq_out, float* gt_out) {
  SampleSpec s{lq_path, gt_path, top, left, crop, do_h, do_v, do_r};
  return load_pair_impl(s, lq_out, gt_out) ? 0 : 1;
}

// In-memory variants: encoded bytes instead of paths (the FDNPack
// single-file dataset path — data/pack.py entries are the original
// encoded bytes, so decode is identical to the file path).

// Dims from an encoded buffer (PNG IHDR / JPEG SOF walk). Returns 0 on
// success.
int fdn_image_dims_mem(const uint8_t* data, size_t size, int* h, int* w) {
  if (size >= 24 && data[0] == 0x89 && data[1] == 'P') {
    *w = (data[16] << 24) | (data[17] << 16) | (data[18] << 8) | data[19];
    *h = (data[20] << 24) | (data[21] << 16) | (data[22] << 8) | data[23];
    return 0;
  }
  if (size >= 4 && data[0] == 0xFF && data[1] == 0xD8) {
    size_t p = 2;
    while (p + 4 <= size) {
      if (data[p] != 0xFF) break;
      const int marker = data[p + 1];
      const int len = (data[p + 2] << 8) | data[p + 3];
      if (marker >= 0xC0 && marker <= 0xCF && marker != 0xC4 &&
          marker != 0xC8 && marker != 0xCC) {
        if (p + 9 > size) break;
        *h = (data[p + 5] << 8) | data[p + 6];
        *w = (data[p + 7] << 8) | data[p + 8];
        return 0;
      }
      if (len < 2) break;
      p += 2 + len;
    }
    set_err("jpeg: SOF not found");
    return 1;
  }
  set_err("unsupported image format (PNG/JPEG only)");
  return 1;
}

// Pair from encoded buffers: same pad/crop/augment/normalize contract as
// fdn_load_pair. Returns 0 on success.
int fdn_load_pair_mem(const uint8_t* lq_data, size_t lq_size,
                      const uint8_t* gt_data, size_t gt_size, int top,
                      int left, int crop, int do_h, int do_v, int do_r,
                      float* lq_out, float* gt_out) {
  std::vector<uint8_t> lq, gt;
  int lh, lw, gh, gw;
  if (!decode_any_mem(lq_data, lq_size, &lq, &lh, &lw)) return 1;
  if (!decode_any_mem(gt_data, gt_size, &gt, &gh, &gw)) return 1;
  SampleSpec s{nullptr, nullptr, top, left, crop, do_h, do_v, do_r};
  return load_pair_decoded(lq, lh, lw, gt, gh, gw, s, lq_out, gt_out)
             ? 0
             : 1;
}

// Threaded batch assembly: fills (B, crop, crop, 3) lq/gt buffers.
// Per-sample params are parallel int arrays. Returns 0 if every sample
// loaded, else the 1-based index of the first failed sample.
int fdn_load_batch(int batch, const char** lq_paths, const char** gt_paths,
                   const int* tops, const int* lefts, int crop,
                   const int* hs, const int* vs, const int* rs,
                   float* lq_out, float* gt_out, int num_threads) {
  if (num_threads <= 0) {
    num_threads = static_cast<int>(std::thread::hardware_concurrency());
    if (num_threads <= 0) num_threads = 1;
  }
  if (num_threads > batch) num_threads = batch;
  const size_t stride = static_cast<size_t>(crop) * crop * 3;
  std::vector<int> fail(num_threads, 0);
  // g_err is thread_local; workers copy their first error here so the
  // main thread's fdn_last_error() reports it
  std::vector<std::string> errs(num_threads);
  auto worker = [&](int t) {
    for (int i = t; i < batch; i += num_threads) {
      SampleSpec s{lq_paths[i], gt_paths[i], tops[i],   lefts[i],
                   crop,        hs[i],       vs[i],     rs[i]};
      if (!load_pair_impl(s, lq_out + stride * i, gt_out + stride * i)) {
        if (!fail[t]) {
          fail[t] = i + 1;
          errs[t] = g_err;
        }
      }
    }
  };
  if (num_threads == 1) {
    worker(0);
  } else {
    std::vector<std::thread> ts;
    ts.reserve(num_threads);
    for (int t = 0; t < num_threads; ++t) ts.emplace_back(worker, t);
    for (auto& th : ts) th.join();
  }
  for (int t = 0; t < num_threads; ++t) {
    if (fail[t]) {
      set_err(errs[t].c_str());
      return fail[t];
    }
  }
  return 0;
}

}  // extern "C"
