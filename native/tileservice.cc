// tileservice: native host-side tile I/O for tpumil.
//
// The reference's host pipeline is PIL/OpenSlide inside Python processes
// (deepzoom_tiler.py TileWorker, compute_feats.py DataLoader). On a TPU VM
// the host must decode tens of thousands of JPEG patches per second to keep
// the chips fed; this library provides:
//   * a thread-pooled JPEG batch decoder (libjpeg) writing straight into a
//     caller-owned contiguous buffer (zero Python-side copies),
//   * JPEG encode (tile writing),
//   * a pyramidal TIFF reader (libtiff, tiled and stripped layouts),
//   * the FIND_EDGES background-energy filter (3x3 kernel, PIL-compatible
//     zero-padding-free edge handling).
//
// Exposed as a C ABI consumed via ctypes (tpumil/utils/native.py).

#include <algorithm>
#include <atomic>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <functional>
#include <thread>
#include <vector>

#include <jpeglib.h>
#include <setjmp.h>
#include <tiffio.h>

namespace {

struct JpegErr {
  jpeg_error_mgr mgr;
  jmp_buf jb;
};

void jpeg_err_exit(j_common_ptr cinfo) {
  JpegErr* err = reinterpret_cast<JpegErr*>(cinfo->err);
  longjmp(err->jb, 1);
}

// Decode one JPEG file to RGB. Returns 0 on success. Output dims via w/h;
// caller passes a buffer of capacity cap_w*cap_h*3 and we fail if larger.
int decode_jpeg_file(const char* path, uint8_t* out, int cap_w, int cap_h,
                     int* out_w, int* out_h) {
  FILE* f = fopen(path, "rb");
  if (!f) return -1;
  jpeg_decompress_struct cinfo;
  JpegErr jerr;
  cinfo.err = jpeg_std_error(&jerr.mgr);
  jerr.mgr.error_exit = jpeg_err_exit;
  if (setjmp(jerr.jb)) {
    jpeg_destroy_decompress(&cinfo);
    fclose(f);
    return -2;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_stdio_src(&cinfo, f);
  jpeg_read_header(&cinfo, TRUE);
  cinfo.out_color_space = JCS_RGB;
  jpeg_start_decompress(&cinfo);
  int w = cinfo.output_width, h = cinfo.output_height;
  if (w > cap_w || h > cap_h) {
    jpeg_abort_decompress(&cinfo);
    jpeg_destroy_decompress(&cinfo);
    fclose(f);
    return -3;
  }
  std::vector<uint8_t> row(w * 3);
  for (int y = 0; y < h; ++y) {
    uint8_t* rp = row.data();
    jpeg_read_scanlines(&cinfo, &rp, 1);
    memcpy(out + static_cast<size_t>(y) * w * 3, row.data(), w * 3);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  fclose(f);
  *out_w = w;
  *out_h = h;
  return 0;
}

// Bilinear resize RGB uint8 (src w0 x h0 -> dst w1 x h1).
void resize_bilinear(const uint8_t* src, int w0, int h0, uint8_t* dst, int w1,
                     int h1) {
  for (int y = 0; y < h1; ++y) {
    float fy = (h1 > 1) ? (static_cast<float>(y) * (h0 - 1) / (h1 - 1)) : 0.f;
    int y0 = static_cast<int>(fy);
    int y1 = std::min(y0 + 1, h0 - 1);
    float wy = fy - y0;
    for (int x = 0; x < w1; ++x) {
      float fx = (w1 > 1) ? (static_cast<float>(x) * (w0 - 1) / (w1 - 1)) : 0.f;
      int x0 = static_cast<int>(fx);
      int x1 = std::min(x0 + 1, w0 - 1);
      float wx = fx - x0;
      for (int c = 0; c < 3; ++c) {
        float v00 = src[(static_cast<size_t>(y0) * w0 + x0) * 3 + c];
        float v01 = src[(static_cast<size_t>(y0) * w0 + x1) * 3 + c];
        float v10 = src[(static_cast<size_t>(y1) * w0 + x0) * 3 + c];
        float v11 = src[(static_cast<size_t>(y1) * w0 + x1) * 3 + c];
        float v = v00 * (1 - wy) * (1 - wx) + v01 * (1 - wy) * wx +
                  v10 * wy * (1 - wx) + v11 * wy * wx;
        dst[(static_cast<size_t>(y) * w1 + x) * 3 + c] =
            static_cast<uint8_t>(v + 0.5f);
      }
    }
  }
}

void run_pool(int n_items, int n_threads, const std::function<void(int)>& fn) {
  std::atomic<int> next(0);
  auto worker = [&]() {
    for (;;) {
      int i = next.fetch_add(1);
      if (i >= n_items) break;
      fn(i);
    }
  };
  int nt = std::max(1, std::min(n_threads, n_items));
  std::vector<std::thread> threads;
  threads.reserve(nt);
  for (int t = 0; t < nt; ++t) threads.emplace_back(worker);
  for (auto& th : threads) th.join();
}

}  // namespace

extern "C" {

// Decode n JPEGs into out[n, size, size, 3] uint8. err[i] = 0 on success.
// Returns count of successes. to_float_out: optional float32 buffer (same
// layout) scaled to [0, 1]; pass nullptr to skip. allow_resize: when 0, a
// source whose size differs from `size` gets err -4 instead of a native
// bilinear resize (the caller re-decodes via PIL so resampling is identical
// with or without this library).
int ts_decode_batch(const char** paths, int n, int size, uint8_t* out,
                    float* to_float_out, int* err, int n_threads,
                    int allow_resize) {
  constexpr int kCap = 4096;  // max source dimension
  std::atomic<int> ok(0);
  run_pool(n, n_threads, [&](int i) {
    // thread-local scratch: one allocation per thread, not per image
    thread_local std::vector<uint8_t> buf;
    if (buf.size() < static_cast<size_t>(kCap) * kCap * 3)
      buf.resize(static_cast<size_t>(kCap) * kCap * 3);
    int w = 0, h = 0;
    int rc = decode_jpeg_file(paths[i], buf.data(), kCap, kCap, &w, &h);
    uint8_t* dst = out + static_cast<size_t>(i) * size * size * 3;
    if (rc == 0 && !allow_resize && (w != size || h != size)) {
      rc = -4;  // caller resamples via PIL for cross-path parity
    }
    if (rc == 0) {
      if (w == size && h == size) {
        // decode wrote rows at stride w*3 == size*3
        memcpy(dst, buf.data(), static_cast<size_t>(size) * size * 3);
      } else {
        // compact rows (decode used stride w*3 from row 0.. already compact)
        resize_bilinear(buf.data(), w, h, dst, size, size);
      }
      if (to_float_out) {
        float* fd = to_float_out + static_cast<size_t>(i) * size * size * 3;
        const size_t count = static_cast<size_t>(size) * size * 3;
        for (size_t k = 0; k < count; ++k) fd[k] = dst[k] * (1.0f / 255.0f);
      }
      ok.fetch_add(1);
    } else {
      memset(dst, 0, static_cast<size_t>(size) * size * 3);
    }
    if (err) err[i] = rc;
  });
  return ok.load();
}

// Encode an RGB image to a JPEG file. Returns 0 on success.
int ts_encode_jpeg(const uint8_t* img, int w, int h, int quality,
                   const char* path) {
  FILE* f = fopen(path, "wb");
  if (!f) return -1;
  jpeg_compress_struct cinfo;
  JpegErr jerr;
  cinfo.err = jpeg_std_error(&jerr.mgr);
  jerr.mgr.error_exit = jpeg_err_exit;
  if (setjmp(jerr.jb)) {
    jpeg_destroy_compress(&cinfo);
    fclose(f);
    return -2;
  }
  jpeg_create_compress(&cinfo);
  jpeg_stdio_dest(&cinfo, f);
  cinfo.image_width = w;
  cinfo.image_height = h;
  cinfo.input_components = 3;
  cinfo.in_color_space = JCS_RGB;
  jpeg_set_defaults(&cinfo);
  jpeg_set_quality(&cinfo, quality, TRUE);
  jpeg_start_compress(&cinfo, TRUE);
  while (cinfo.next_scanline < cinfo.image_height) {
    const uint8_t* row = img + static_cast<size_t>(cinfo.next_scanline) * w * 3;
    JSAMPROW rp = const_cast<JSAMPROW>(row);
    jpeg_write_scanlines(&cinfo, &rp, 1);
  }
  jpeg_finish_compress(&cinfo);
  jpeg_destroy_compress(&cinfo);
  fclose(f);
  return 0;
}

// FIND_EDGES energy per image: mean over channels of sum(clip(8c - sum of
// 8-neighbors, 0, 255)) / (size*size), matching PIL's behavior of leaving a
// 1-pixel border equal to the convolution with edge replication... PIL
// actually skips the border (keeps original pixels); we reproduce PIL's
// measured behavior: border pixels contribute their original value.
void ts_edge_energy(const uint8_t* imgs, int n, int size, float* out,
                    int n_threads) {
  run_pool(n, n_threads, [&](int i) {
    const uint8_t* im = imgs + static_cast<size_t>(i) * size * size * 3;
    double sum = 0.0;
    for (int c = 0; c < 3; ++c) {
      for (int y = 0; y < size; ++y) {
        for (int x = 0; x < size; ++x) {
          double v;
          if (y == 0 || x == 0 || y == size - 1 || x == size - 1) {
            v = im[(static_cast<size_t>(y) * size + x) * 3 + c];
          } else {
            int acc = 8 * im[(static_cast<size_t>(y) * size + x) * 3 + c];
            for (int dy = -1; dy <= 1; ++dy)
              for (int dx = -1; dx <= 1; ++dx) {
                if (dy == 0 && dx == 0) continue;
                acc -= im[(static_cast<size_t>(y + dy) * size + x + dx) * 3 + c];
              }
            v = std::min(255, std::max(0, acc));
          }
          sum += v;
        }
      }
    }
    out[i] = static_cast<float>(sum / 3.0 / (static_cast<double>(size) * size));
  });
}

// ---- pyramidal TIFF reader -------------------------------------------------

struct TiffHandle {
  TIFF* tif;
  std::vector<int> dir_by_level;    // directory index per level (area desc)
  std::vector<uint32_t> widths, heights;
  // FIFO cache of decoded source tiles: region reads at DeepZoom tile sizes
  // (224) overlap the underlying TIFF tiles (256), so without a cache every
  // source tile is JPEG-decoded ~3-4x. Keyed by (level, ty, tx).
  struct CachedTile {
    uint64_t key;
    std::vector<uint32_t> px;
  };
  std::vector<CachedTile> cache;
  size_t cache_bytes = 0;
  // byte-bounded, not entry-bounded: scanner tiles range from 240 to 1024
  // px, so a fixed entry count would hold 4 MB..256 MB depending on file
  static constexpr size_t kCacheBytes = 32u << 20;  // 32 MB per open handle

  const std::vector<uint32_t>* cache_get(uint64_t key) const {
    for (const auto& c : cache)
      if (c.key == key) return &c.px;
    return nullptr;
  }
  void cache_put(uint64_t key, std::vector<uint32_t>&& px) {
    const size_t sz = px.size() * sizeof(uint32_t);
    if (sz > kCacheBytes) return;  // never cache a tile bigger than the cap
    cache_bytes += sz;
    cache.push_back({key, std::move(px)});
    while (cache_bytes > kCacheBytes) {  // FIFO eviction by bytes
      cache_bytes -= cache.front().px.size() * sizeof(uint32_t);
      cache.erase(cache.begin());
    }
  }
};

void* ts_tiff_open(const char* path) {
  TIFF* tif = TIFFOpen(path, "r");
  if (!tif) return nullptr;
  auto* h = new TiffHandle;
  h->tif = tif;
  struct Dir { int idx; uint32_t w, hh; };
  std::vector<Dir> dirs;
  int idx = 0;
  do {
    uint32_t w = 0, hh = 0;
    TIFFGetField(tif, TIFFTAG_IMAGEWIDTH, &w);
    TIFFGetField(tif, TIFFTAG_IMAGELENGTH, &hh);
    dirs.push_back({idx, w, hh});
    ++idx;
  } while (TIFFReadDirectory(tif));
  std::sort(dirs.begin(), dirs.end(), [](const Dir& a, const Dir& b) {
    return static_cast<uint64_t>(a.w) * a.hh > static_cast<uint64_t>(b.w) * b.hh;
  });
  for (const auto& d : dirs) {
    h->dir_by_level.push_back(d.idx);
    h->widths.push_back(d.w);
    h->heights.push_back(d.hh);
  }
  return h;
}

void ts_tiff_close(void* handle) {
  auto* h = static_cast<TiffHandle*>(handle);
  if (!h) return;
  TIFFClose(h->tif);
  delete h;
}

int ts_tiff_levels(void* handle) {
  return static_cast<TiffHandle*>(handle)->dir_by_level.size();
}

// Copy the full-res directory's ImageDescription (objective power metadata
// lives here by Aperio convention) into buf. Returns length or 0.
int ts_tiff_description(void* handle, char* buf, int buflen) {
  auto* h = static_cast<TiffHandle*>(handle);
  TIFFSetDirectory(h->tif, h->dir_by_level[0]);
  char* desc = nullptr;
  if (!TIFFGetField(h->tif, TIFFTAG_IMAGEDESCRIPTION, &desc) || !desc) return 0;
  int n = static_cast<int>(strlen(desc));
  n = std::min(n, buflen - 1);
  memcpy(buf, desc, n);
  buf[n] = '\0';
  return n;
}

void ts_tiff_dims(void* handle, int level, int* w, int* hh) {
  auto* h = static_cast<TiffHandle*>(handle);
  *w = h->widths[level];
  *hh = h->heights[level];
}

// Read a w x hh RGB region at (x, y) in level pixels. Returns 0 on success.
int ts_tiff_read_region(void* handle, int level, int x, int y, int w, int hh,
                        uint8_t* out) {
  auto* h = static_cast<TiffHandle*>(handle);
  if (level < 0 || level >= static_cast<int>(h->dir_by_level.size())) return -1;
  TIFFSetDirectory(h->tif, h->dir_by_level[level]);
  TIFF* tif = h->tif;
  uint32_t img_w = h->widths[level], img_h = h->heights[level];
  memset(out, 0, static_cast<size_t>(w) * hh * 3);

  if (TIFFIsTiled(tif)) {
    uint32_t tw = 0, th = 0;
    TIFFGetField(tif, TIFFTAG_TILEWIDTH, &tw);
    TIFFGetField(tif, TIFFTAG_TILELENGTH, &th);
    // clamp BOTH coordinates before the unsigned division — a negative y
    // would wrap to a huge uint32 and skip the loop entirely
    for (uint32_t ty = (std::max(0, y) / th) * th; ty < static_cast<uint32_t>(y + hh) && ty < img_h; ty += th) {
      for (uint32_t tx = (std::max(0, x) / tw) * tw; tx < static_cast<uint32_t>(x + w) && tx < img_w; tx += tw) {
        uint64_t key = (static_cast<uint64_t>(level) << 48)
                     | (static_cast<uint64_t>(ty / th) << 24) | (tx / tw);
        const std::vector<uint32_t>* cached = h->cache_get(key);
        std::vector<uint32_t> fresh;
        if (!cached) {
          fresh.resize(static_cast<size_t>(tw) * th);
          if (!TIFFReadRGBATile(tif, tx, ty, fresh.data())) continue;
          h->cache_put(key, std::move(fresh));
          cached = h->cache_get(key);
          // cache_put declines tiles larger than the cap (leaving `fresh`
          // intact, as its early return precedes the move); read from the
          // local buffer instead of dereferencing the failed lookup
          if (!cached) cached = &fresh;
        }
        const std::vector<uint32_t>& tile = *cached;
        // RGBA tile is bottom-up
        for (uint32_t ry = 0; ry < th; ++ry) {
          int gy = static_cast<int>(ty + ry);
          int oy = gy - y;
          if (oy < 0 || oy >= hh || gy >= static_cast<int>(img_h)) continue;
          for (uint32_t rx = 0; rx < tw; ++rx) {
            int gx = static_cast<int>(tx + rx);
            int ox = gx - x;
            if (ox < 0 || ox >= w || gx >= static_cast<int>(img_w)) continue;
            uint32_t px = tile[(th - 1 - ry) * tw + rx];
            uint8_t* dst = out + (static_cast<size_t>(oy) * w + ox) * 3;
            dst[0] = TIFFGetR(px);
            dst[1] = TIFFGetG(px);
            dst[2] = TIFFGetB(px);
          }
        }
      }
    }
  } else {
    // stripped: read the whole image once via RGBA (acceptable for small
    // levels; tiled is the production path)
    std::vector<uint32_t> img(static_cast<size_t>(img_w) * img_h);
    if (!TIFFReadRGBAImageOriented(tif, img_w, img_h, img.data(),
                                   ORIENTATION_TOPLEFT, 0))
      return -2;
    for (int oy = 0; oy < hh; ++oy) {
      int gy = y + oy;
      if (gy < 0 || gy >= static_cast<int>(img_h)) continue;
      for (int ox = 0; ox < w; ++ox) {
        int gx = x + ox;
        if (gx < 0 || gx >= static_cast<int>(img_w)) continue;
        uint32_t px = img[static_cast<size_t>(gy) * img_w + gx];
        uint8_t* dst = out + (static_cast<size_t>(oy) * w + ox) * 3;
        dst[0] = TIFFGetR(px);
        dst[1] = TIFFGetG(px);
        dst[2] = TIFFGetB(px);
      }
    }
  }
  return 0;
}

// 1 iff the level's directory uses a tiled layout (the production fast path;
// stripped directories decode whole pages per read and should be served by
// the caching PIL backend instead — see tpumil/data/slide.py).
int ts_tiff_is_tiled(void* handle, int level) {
  auto* h = static_cast<TiffHandle*>(handle);
  if (level < 0 || level >= static_cast<int>(h->dir_by_level.size())) return 0;
  TIFFSetDirectory(h->tif, h->dir_by_level[level]);
  return TIFFIsTiled(h->tif) ? 1 : 0;
}

// Write a tiled JPEG-compressed pyramidal TIFF (the layout of real scanner
// output, e.g. Aperio .svs) from a full-resolution RGB buffer. Levels are
// 2x box-downsampled. Returns 0 on success. Used to synthesize realistic
// benchmark/test slides without scanner data.
int ts_write_tiled_pyramid(const char* path, const uint8_t* img, int w,
                           int h, int tile, int levels, int quality,
                           const char* desc) {
  TIFF* tif = TIFFOpen(path, "w");
  if (!tif) return -1;
  std::vector<uint8_t> cur(img, img + static_cast<size_t>(w) * h * 3);
  int lw = w, lh = h;
  std::vector<uint8_t> tbuf(static_cast<size_t>(tile) * tile * 3);
  for (int lv = 0; lv < levels; ++lv) {
    TIFFSetField(tif, TIFFTAG_IMAGEWIDTH, static_cast<uint32_t>(lw));
    TIFFSetField(tif, TIFFTAG_IMAGELENGTH, static_cast<uint32_t>(lh));
    TIFFSetField(tif, TIFFTAG_SAMPLESPERPIXEL, 3);
    TIFFSetField(tif, TIFFTAG_BITSPERSAMPLE, 8);
    TIFFSetField(tif, TIFFTAG_PLANARCONFIG, PLANARCONFIG_CONTIG);
    TIFFSetField(tif, TIFFTAG_PHOTOMETRIC, PHOTOMETRIC_RGB);
    TIFFSetField(tif, TIFFTAG_COMPRESSION, COMPRESSION_JPEG);
    TIFFSetField(tif, TIFFTAG_JPEGQUALITY, quality);
    TIFFSetField(tif, TIFFTAG_TILEWIDTH, static_cast<uint32_t>(tile));
    TIFFSetField(tif, TIFFTAG_TILELENGTH, static_cast<uint32_t>(tile));
    if (lv == 0 && desc && desc[0])
      TIFFSetField(tif, TIFFTAG_IMAGEDESCRIPTION, desc);
    if (lv > 0) TIFFSetField(tif, TIFFTAG_SUBFILETYPE, FILETYPE_REDUCEDIMAGE);
    for (int ty = 0; ty < lh; ty += tile) {
      for (int tx = 0; tx < lw; tx += tile) {
        memset(tbuf.data(), 0, tbuf.size());
        int ch = std::min(tile, lh - ty), cw = std::min(tile, lw - tx);
        for (int ry = 0; ry < ch; ++ry)
          memcpy(&tbuf[(static_cast<size_t>(ry) * tile) * 3],
                 &cur[(static_cast<size_t>(ty + ry) * lw + tx) * 3],
                 static_cast<size_t>(cw) * 3);
        if (TIFFWriteTile(tif, tbuf.data(), tx, ty, 0, 0) < 0) {
          TIFFClose(tif);
          return -2;
        }
      }
    }
    if (!TIFFWriteDirectory(tif)) {
      TIFFClose(tif);
      return -3;
    }
    if (lv + 1 < levels) {  // 2x box downsample for the next level
      int nw = std::max(1, lw / 2), nh = std::max(1, lh / 2);
      std::vector<uint8_t> nxt(static_cast<size_t>(nw) * nh * 3);
      for (int yy = 0; yy < nh; ++yy)
        for (int xx = 0; xx < nw; ++xx)
          for (int c = 0; c < 3; ++c) {
            int y0 = 2 * yy, x0 = 2 * xx;
            int y1 = std::min(y0 + 1, lh - 1), x1 = std::min(x0 + 1, lw - 1);
            int s = cur[(static_cast<size_t>(y0) * lw + x0) * 3 + c]
                  + cur[(static_cast<size_t>(y0) * lw + x1) * 3 + c]
                  + cur[(static_cast<size_t>(y1) * lw + x0) * 3 + c]
                  + cur[(static_cast<size_t>(y1) * lw + x1) * 3 + c];
            nxt[(static_cast<size_t>(yy) * nw + xx) * 3 + c] =
                static_cast<uint8_t>((s + 2) / 4);
          }
      cur.swap(nxt);
      lw = nw;
      lh = nh;
    }
  }
  TIFFClose(tif);
  return 0;
}

}  // extern "C"
