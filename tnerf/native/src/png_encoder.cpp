// Native PNG encoder + multithreaded batch writer.
//
// Completes the native image-IO layer: the reference vendors
// stb_image_write.h (included at main.cu:19-21 but never called — the
// intended render-output capability); tnerf renders test splits and
// dress-rehearsal exports as PNG, so the encode hot path lives in C++
// like the decoder's (zlib deflate + scanline filtering), exposed via
// the same C ABI / ctypes pattern (tnerf/native/png.py).  The batch API
// writes frames on a thread pool — export is deflate-bound and
// embarrassingly parallel across files.
//
// Output: 8-bit RGB (color type 2) or RGBA (6), non-interlaced, one
// IDAT chunk, per-scanline filter chosen by the standard
// minimum-sum-of-absolute-differences heuristic.
//
// Build: tnerf/native/build.py  ->  libtnerf_native.so

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <thread>
#include <vector>

#include <zlib.h>

namespace {

constexpr uint8_t kSig[8] = {137, 80, 78, 71, 13, 10, 26, 10};

inline void put_be32(uint8_t* p, uint32_t v) {
  p[0] = uint8_t(v >> 24);
  p[1] = uint8_t(v >> 16);
  p[2] = uint8_t(v >> 8);
  p[3] = uint8_t(v);
}

void append_chunk(std::vector<uint8_t>* out, const char type[4],
                  const uint8_t* body, uint32_t len) {
  size_t at = out->size();
  out->resize(at + 12 + len);
  uint8_t* p = out->data() + at;
  put_be32(p, len);
  std::memcpy(p + 4, type, 4);
  if (len) std::memcpy(p + 8, body, len);
  uint32_t crc = uint32_t(
      crc32(crc32(0L, p + 4, 4), p + 8, len));
  put_be32(p + 8 + len, crc);
}

inline int paeth(int a, int b, int c) {
  int p = a + b - c;
  int pa = p > a ? p - a : a - p;
  int pb = p > b ? p - b : b - p;
  int pc = p > c ? p - c : c - p;
  if (pa <= pb && pa <= pc) return a;
  if (pb <= pc) return b;
  return c;
}

// Filter one scanline with type f into dst[stride]; prev may be null
// (first row: up/average/paeth treat it as zeros per the PNG spec).
void filter_row(uint8_t f, const uint8_t* row, const uint8_t* prev,
                size_t stride, int bpp, uint8_t* dst) {
  for (size_t i = 0; i < stride; ++i) {
    int x = row[i];
    int a = i >= size_t(bpp) ? row[i - bpp] : 0;
    int b = prev ? prev[i] : 0;
    int c = (prev && i >= size_t(bpp)) ? prev[i - bpp] : 0;
    int v;
    switch (f) {
      case 0: v = x; break;
      case 1: v = x - a; break;
      case 2: v = x - b; break;
      case 3: v = x - ((a + b) >> 1); break;
      default: v = x - paeth(a, b, c); break;
    }
    dst[i] = uint8_t(v & 0xff);
  }
}

// Mirror of the decoder-side bound (tnerf/native/png.py MAX_DIM): reject
// absurd dimensions before allocating filter/deflate buffers.
constexpr uint32_t kMaxDim = 32768;

// Encode data[h][w][channels] u8 into a PNG byte stream. 0 on success.
int encode_png(const uint8_t* data, uint32_t w, uint32_t h, int channels,
               int level, std::vector<uint8_t>* out) {
  if (!data || w == 0 || h == 0 || w > kMaxDim || h > kMaxDim) return -1;
  if (channels != 3 && channels != 4) return -2;
  const size_t stride = size_t(w) * channels;

  // Filtered image: each scanline prefixed by its filter byte, filter
  // picked by minimum sum of absolute (signed) residuals.
  std::vector<uint8_t> filt(h * (stride + 1));
  std::vector<uint8_t> trial(stride);
  for (uint32_t y = 0; y < h; ++y) {
    const uint8_t* row = data + size_t(y) * stride;
    const uint8_t* prev = y ? data + size_t(y - 1) * stride : nullptr;
    uint8_t* dst = filt.data() + size_t(y) * (stride + 1);
    uint64_t best = ~0ull;
    for (uint8_t f = 0; f < 5; ++f) {
      filter_row(f, row, prev, stride, channels, trial.data());
      uint64_t score = 0;
      for (size_t i = 0; i < stride; ++i) {
        int8_t s = int8_t(trial[i]);
        score += uint64_t(s < 0 ? -s : s);
      }
      if (score < best) {
        best = score;
        dst[0] = f;
        std::memcpy(dst + 1, trial.data(), stride);
      }
    }
  }

  uLongf zcap = compressBound(uLong(filt.size()));
  std::vector<uint8_t> zbuf(zcap);
  if (compress2(zbuf.data(), &zcap, filt.data(), uLong(filt.size()),
                level) != Z_OK)
    return -3;
  if (zcap > 0x7fffffffu) return -7;  // one IDAT chunk: length is u32

  out->clear();
  out->reserve(zcap + 64);
  out->insert(out->end(), kSig, kSig + 8);
  uint8_t ihdr[13];
  put_be32(ihdr, w);
  put_be32(ihdr + 4, h);
  ihdr[8] = 8;                               // bit depth
  ihdr[9] = channels == 4 ? 6 : 2;           // color type
  ihdr[10] = ihdr[11] = ihdr[12] = 0;        // deflate, adaptive, no interlace
  append_chunk(out, "IHDR", ihdr, 13);
  append_chunk(out, "IDAT", zbuf.data(), uint32_t(zcap));
  append_chunk(out, "IEND", nullptr, 0);
  return 0;
}

int write_file(const char* path, const std::vector<uint8_t>& buf) {
  FILE* f = std::fopen(path, "wb");
  if (!f) return -4;
  size_t wr = std::fwrite(buf.data(), 1, buf.size(), f);
  if (std::fclose(f) != 0) return -5;
  return wr == buf.size() ? 0 : -5;
}

}  // namespace

extern "C" {

// Encode data[w*h*channels] u8 to `path`. channels: 3 (RGB) or 4 (RGBA);
// level: zlib 0-9 (-1 = default). 0 on success.
int tnerf_png_encode(const char* path, const uint8_t* data, uint32_t w,
                     uint32_t h, int channels, int level) {
  // No C++ exception may cross the C ABI (ctypes callers / pool
  // threads would std::terminate): turn bad_alloc etc. into a status.
  try {
    std::vector<uint8_t> buf;
    int rc = encode_png(data, w, h, channels,
                        level < 0 ? Z_DEFAULT_COMPRESSION : level, &buf);
    if (rc != 0) return rc;
    return write_file(path, buf);
  } catch (...) {
    return -6;
  }
}

// Encode n same-sized frames data[n*w*h*channels] on a thread pool.
// Returns 0 if ALL succeeded, else the first nonzero per-file status
// (and writes per-file statuses).
int tnerf_png_encode_batch(const char** paths, int n, const uint8_t* data,
                           uint32_t w, uint32_t h, int channels,
                           int num_threads, int level, int* statuses) {
  if (n <= 0) return 0;
  if (num_threads <= 0)
    num_threads = int(std::thread::hardware_concurrency());
  if (num_threads > n) num_threads = n;
  const size_t frame = size_t(w) * h * size_t(channels);
  std::vector<std::thread> pool;
  std::vector<int> st(n, 0);
  for (int t = 0; t < num_threads; ++t) {
    pool.emplace_back([&, t]() {
      for (int i = t; i < n; i += num_threads) {
        st[i] = tnerf_png_encode(paths[i], data + frame * size_t(i), w, h,
                                 channels, level);
      }
    });
  }
  for (auto& th : pool) th.join();
  int rc = 0;
  for (int i = 0; i < n; ++i) {
    if (statuses) statuses[i] = st[i];
    if (st[i] != 0 && rc == 0) rc = st[i];
  }
  return rc;
}

}  // extern "C"
