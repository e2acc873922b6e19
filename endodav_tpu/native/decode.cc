// Native image-decode pipeline for the data layer.
//
// The reference feeds its DataLoader workers through PIL/cv2
// (datasets/mono_dataset.py:51-57, scared_video_dataset.py:31-75); on a
// low-core training host the Python-side decode becomes the step
// bottleneck once the device step shrinks (DESIGN.md "Native C++ runtime
// components").  This library decodes PNG/JPEG frames and SCARED
// float-TIFF depth maps in C++ (libpng simplified API / libjpeg /
// libtiff) with an std::thread batch fan-out, and is called from Python
// via ctypes — every call releases the GIL, so the Loader's worker
// threads get true parallelism.
//
// API contract (all return 0 on success, negative on failure):
//   edt_image_size(path, &h, &w)              probe PNG/JPEG dimensions
//   edt_decode_rgb(path, out, h, w)           decode to RGB8 [h, w, 3]
//   edt_decode_rgb_batch(paths, n, out, h, w, threads)
//                                             n frames of identical size
//   edt_tiff_size(path, &h, &w)               probe TIFF dimensions
//   edt_decode_tiff_f32(path, out, h, w)      first channel as f32 [h, w]
//   edt_decode_tiff_f32_batch(paths, n, out, h, w, threads)

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <atomic>
#include <thread>
#include <vector>

#include <jpeglib.h>
#include <png.h>
#include <tiffio.h>
#include <csetjmp>

namespace {

bool has_magic(const char* path, const unsigned char* magic, int n) {
  FILE* f = fopen(path, "rb");
  if (!f) return false;
  unsigned char buf[8] = {0};
  size_t got = fread(buf, 1, static_cast<size_t>(n), f);
  fclose(f);
  return got == static_cast<size_t>(n) && memcmp(buf, magic, n) == 0;
}

bool is_png(const char* path) {
  static const unsigned char sig[4] = {0x89, 'P', 'N', 'G'};
  return has_magic(path, sig, 4);
}

bool is_jpeg(const char* path) {
  static const unsigned char sig[2] = {0xFF, 0xD8};
  return has_magic(path, sig, 2);
}

// ---------- PNG (simplified libpng API) ----------

int png_size(const char* path, int* h, int* w) {
  png_image image;
  memset(&image, 0, sizeof image);
  image.version = PNG_IMAGE_VERSION;
  if (!png_image_begin_read_from_file(&image, path)) return -2;
  *h = static_cast<int>(image.height);
  *w = static_cast<int>(image.width);
  png_image_free(&image);
  return 0;
}

int png_decode_rgb(const char* path, unsigned char* out, int h, int w) {
  png_image image;
  memset(&image, 0, sizeof image);
  image.version = PNG_IMAGE_VERSION;
  if (!png_image_begin_read_from_file(&image, path)) return -2;
  if (static_cast<int>(image.height) != h || static_cast<int>(image.width) != w) {
    png_image_free(&image);
    return -3;
  }
  image.format = PNG_FORMAT_RGB;  // libpng converts gray/palette/16-bit/alpha
  if (!png_image_finish_read(&image, nullptr, out, 0 /* tight stride */, nullptr)) {
    png_image_free(&image);
    return -4;
  }
  return 0;
}

// ---------- JPEG ----------

struct JpegErr {
  jpeg_error_mgr mgr;
  jmp_buf jb;
};

void jpeg_err_exit(j_common_ptr cinfo) {
  longjmp(reinterpret_cast<JpegErr*>(cinfo->err)->jb, 1);
}

int jpeg_run(const char* path, unsigned char* out, int h, int w, int* oh, int* ow) {
  FILE* f = fopen(path, "rb");
  if (!f) return -1;
  jpeg_decompress_struct cinfo;
  JpegErr err;
  cinfo.err = jpeg_std_error(&err.mgr);
  err.mgr.error_exit = jpeg_err_exit;
  if (setjmp(err.jb)) {
    jpeg_destroy_decompress(&cinfo);
    fclose(f);
    return -4;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_stdio_src(&cinfo, f);
  jpeg_read_header(&cinfo, TRUE);
  cinfo.out_color_space = JCS_RGB;
  if (!out) {  // probe only
    *oh = static_cast<int>(cinfo.image_height);
    *ow = static_cast<int>(cinfo.image_width);
    jpeg_destroy_decompress(&cinfo);
    fclose(f);
    return 0;
  }
  jpeg_start_decompress(&cinfo);
  if (static_cast<int>(cinfo.output_height) != h ||
      static_cast<int>(cinfo.output_width) != w ||
      cinfo.output_components != 3) {
    jpeg_abort_decompress(&cinfo);
    jpeg_destroy_decompress(&cinfo);
    fclose(f);
    return -3;
  }
  while (cinfo.output_scanline < cinfo.output_height) {
    unsigned char* row = out + static_cast<size_t>(cinfo.output_scanline) * w * 3;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  fclose(f);
  return 0;
}

// ---------- TIFF (SCARED scene_points float32) ----------
//
// Behavior contract: reproduce cv2.imread(path, 3)[0:h, :, 0] (reference
// datasets/scared_video_dataset.py:52).  cv2 returns BGR, so its channel
// 0 is the *last* sample stored in the file — for 3-sample scene_points
// (x, y, z) that is the z/depth plane, NOT sample 0.  We therefore copy
// sample spp-1.

int tiff_decode_f32(const char* path, float* out, int h, int w, int* oh, int* ow) {
  TIFFSetWarningHandler(nullptr);
  TIFF* tif = TIFFOpen(path, "r");
  if (!tif) return -1;
  uint32_t th = 0, tw = 0;
  uint16_t spp = 1, bps = 32, fmt = SAMPLEFORMAT_IEEEFP, planar = PLANARCONFIG_CONTIG;
  TIFFGetField(tif, TIFFTAG_IMAGELENGTH, &th);
  TIFFGetField(tif, TIFFTAG_IMAGEWIDTH, &tw);
  TIFFGetFieldDefaulted(tif, TIFFTAG_SAMPLESPERPIXEL, &spp);
  TIFFGetFieldDefaulted(tif, TIFFTAG_BITSPERSAMPLE, &bps);
  TIFFGetFieldDefaulted(tif, TIFFTAG_SAMPLEFORMAT, &fmt);
  TIFFGetFieldDefaulted(tif, TIFFTAG_PLANARCONFIG, &planar);
  if (!out) {
    *oh = static_cast<int>(th);
    *ow = static_cast<int>(tw);
    TIFFClose(tif);
    return 0;
  }
  if (static_cast<int>(th) < h || static_cast<int>(tw) != w ||
      bps != 32 || fmt != SAMPLEFORMAT_IEEEFP) {
    TIFFClose(tif);
    return -3;
  }
  const uint16_t want = static_cast<uint16_t>(spp - 1);  // cv2 BGR channel 0
  std::vector<float> row(static_cast<size_t>(tw) * spp);
  for (int y = 0; y < h; ++y) {
    // For PLANARCONFIG_SEPARATE the 4th arg selects the sample plane;
    // for CONTIG libtiff requires 0 and the row interleaves samples.
    uint16_t plane_arg = (planar == PLANARCONFIG_SEPARATE) ? want : 0;
    if (TIFFReadScanline(tif, row.data(), y, plane_arg) < 0) {
      TIFFClose(tif);
      return -4;
    }
    if (planar == PLANARCONFIG_CONTIG && spp > 1) {
      for (int x = 0; x < w; ++x)
        out[static_cast<size_t>(y) * w + x] = row[static_cast<size_t>(x) * spp + want];
    } else {
      memcpy(out + static_cast<size_t>(y) * w, row.data(), sizeof(float) * w);
    }
  }
  TIFFClose(tif);
  return 0;
}

template <typename Fn>
int run_batch(int n, int threads, Fn&& fn) {
  if (threads < 1) threads = 1;
  if (threads > n) threads = n;
  std::atomic<int> next(0), fail(0);
  auto work = [&] {
    for (int i = next.fetch_add(1); i < n; i = next.fetch_add(1)) {
      if (fn(i) != 0) fail.store(i + 1);
    }
  };
  if (threads == 1) {
    work();
  } else {
    std::vector<std::thread> pool;
    pool.reserve(threads);
    for (int t = 0; t < threads; ++t) pool.emplace_back(work);
    for (auto& t : pool) t.join();
  }
  return fail.load() ? -fail.load() : 0;
}

}  // namespace

extern "C" {

int edt_image_size(const char* path, int* h, int* w) {
  if (is_png(path)) return png_size(path, h, w);
  if (is_jpeg(path)) return jpeg_run(path, nullptr, 0, 0, h, w);
  return -9;
}

int edt_decode_rgb(const char* path, unsigned char* out, int h, int w) {
  if (is_png(path)) return png_decode_rgb(path, out, h, w);
  if (is_jpeg(path)) {
    int oh, ow;
    return jpeg_run(path, out, h, w, &oh, &ow);
  }
  return -9;
}

int edt_decode_rgb_batch(const char** paths, int n, unsigned char* out,
                         int h, int w, int threads) {
  size_t frame = static_cast<size_t>(h) * w * 3;
  return run_batch(n, threads, [&](int i) {
    return edt_decode_rgb(paths[i], out + frame * i, h, w);
  });
}

int edt_tiff_size(const char* path, int* h, int* w) {
  return tiff_decode_f32(path, nullptr, 0, 0, h, w);
}

int edt_decode_tiff_f32(const char* path, float* out, int h, int w) {
  int oh, ow;
  return tiff_decode_f32(path, out, h, w, &oh, &ow);
}

int edt_decode_tiff_f32_batch(const char** paths, int n, float* out,
                              int h, int w, int threads) {
  size_t frame = static_cast<size_t>(h) * w;
  return run_batch(n, threads, [&](int i) {
    return edt_decode_tiff_f32(paths[i], out + frame * i, h, w);
  });
}

}  // extern "C"
