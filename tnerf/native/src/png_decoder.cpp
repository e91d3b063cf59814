// Native PNG decoder + multithreaded batch loader.
//
// TPU-framework equivalent of the reference's native image-loading layer
// (loader/data_loader.cpp + vendored stb_image.h): the decode hot path
// stays in C++ (zlib inflate + scanline unfiltering), exposed to Python
// via a C ABI consumed with ctypes (tnerf/native/png.py).  Unlike the
// reference's sequential per-file loop (data_loader.cpp:34-84), the batch
// API decodes files on a thread pool — dataset load is IO/inflate-bound
// and embarrassingly parallel across files.
//
// Supported: 8-bit greyscale / RGB / palette / grey+alpha / RGBA,
// non-interlaced (NeRF-synthetic data is 8-bit RGBA non-interlaced).
// Output is always RGBA8.
//
// Build: tnerf/native/build.py  ->  libtnerf_native.so

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <string>
#include <thread>
#include <vector>

#include <zlib.h>

namespace {

constexpr uint8_t kPngSig[8] = {137, 80, 78, 71, 13, 10, 26, 10};

inline uint32_t be32(const uint8_t* p) {
  return (uint32_t(p[0]) << 24) | (uint32_t(p[1]) << 16) |
         (uint32_t(p[2]) << 8) | uint32_t(p[3]);
}

struct Ihdr {
  uint32_t width = 0, height = 0;
  uint8_t bit_depth = 0, color_type = 0, interlace = 0;
};

int channels_for(uint8_t color_type) {
  switch (color_type) {
    case 0: return 1;  // grey
    case 2: return 3;  // rgb
    case 3: return 1;  // palette index
    case 4: return 2;  // grey+alpha
    case 6: return 4;  // rgba
    default: return 0;
  }
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

// Parse chunks; collect IHDR, PLTE, tRNS, concatenated IDAT.
bool parse_chunks(const uint8_t* data, size_t len, Ihdr* ihdr,
                  std::vector<uint8_t>* idat, std::vector<uint8_t>* plte,
                  std::vector<uint8_t>* trns) {
  if (len < 8 || std::memcmp(data, kPngSig, 8) != 0) return false;
  size_t off = 8;
  bool saw_ihdr = false;
  while (off + 8 <= len) {
    uint32_t clen = be32(data + off);
    const uint8_t* type = data + off + 4;
    const uint8_t* body = data + off + 8;
    if (off + 12 + size_t(clen) > len) return false;
    if (!std::memcmp(type, "IHDR", 4)) {
      if (clen < 13) return false;
      ihdr->width = be32(body);
      ihdr->height = be32(body + 4);
      ihdr->bit_depth = body[8];
      ihdr->color_type = body[9];
      ihdr->interlace = body[12];
      saw_ihdr = true;
    } else if (!std::memcmp(type, "IDAT", 4)) {
      idat->insert(idat->end(), body, body + clen);
    } else if (!std::memcmp(type, "PLTE", 4)) {
      plte->assign(body, body + clen);
    } else if (!std::memcmp(type, "tRNS", 4)) {
      trns->assign(body, body + clen);
    } else if (!std::memcmp(type, "IEND", 4)) {
      break;
    }
    off += 12 + clen;  // len + type + body + crc (crc unchecked: trusted data)
  }
  return saw_ihdr && !idat->empty();
}

bool inflate_all(const std::vector<uint8_t>& in, std::vector<uint8_t>* out) {
  z_stream zs;
  std::memset(&zs, 0, sizeof(zs));
  if (inflateInit(&zs) != Z_OK) return false;
  zs.next_in = const_cast<Bytef*>(in.data());
  zs.avail_in = static_cast<uInt>(in.size());
  zs.next_out = out->data();
  zs.avail_out = static_cast<uInt>(out->size());
  int rc = inflate(&zs, Z_FINISH);
  inflateEnd(&zs);
  return rc == Z_STREAM_END && zs.avail_out == 0;
}

// Decode one PNG from memory into caller-provided RGBA8 buffer.
// Returns 0 on success, negative error codes otherwise.
int decode_rgba(const uint8_t* data, size_t len, uint8_t* out,
                uint32_t out_w, uint32_t out_h) {
  Ihdr h;
  std::vector<uint8_t> idat, plte, trns;
  if (!parse_chunks(data, len, &h, &idat, &plte, &trns)) return -2;
  if (h.width != out_w || h.height != out_h) return -3;
  if (h.bit_depth != 8) return -4;     // 8-bit only
  if (h.interlace != 0) return -5;     // no Adam7
  int ch = channels_for(h.color_type);
  if (ch == 0) return -6;

  const size_t stride = size_t(h.width) * ch;
  std::vector<uint8_t> raw((stride + 1) * h.height);
  if (!inflate_all(idat, &raw)) return -7;

  // Unfilter in place into `img`.
  std::vector<uint8_t> img(stride * h.height);
  const uint8_t* prev = nullptr;
  for (uint32_t y = 0; y < h.height; ++y) {
    const uint8_t* src = raw.data() + y * (stride + 1);
    uint8_t filter = src[0];
    ++src;
    uint8_t* dst = img.data() + y * stride;
    switch (filter) {
      case 0:
        std::memcpy(dst, src, stride);
        break;
      case 1:  // sub
        for (size_t i = 0; i < stride; ++i)
          dst[i] = uint8_t(src[i] + (i >= size_t(ch) ? dst[i - ch] : 0));
        break;
      case 2:  // up
        for (size_t i = 0; i < stride; ++i)
          dst[i] = uint8_t(src[i] + (prev ? prev[i] : 0));
        break;
      case 3:  // average
        for (size_t i = 0; i < stride; ++i) {
          int a = i >= size_t(ch) ? dst[i - ch] : 0;
          int b = prev ? prev[i] : 0;
          dst[i] = uint8_t(src[i] + ((a + b) >> 1));
        }
        break;
      case 4:  // paeth
        for (size_t i = 0; i < stride; ++i) {
          int a = i >= size_t(ch) ? dst[i - ch] : 0;
          int b = prev ? prev[i] : 0;
          int c = (prev && i >= size_t(ch)) ? prev[i - ch] : 0;
          dst[i] = uint8_t(src[i] + paeth(a, b, c));
        }
        break;
      default:
        return -8;
    }
    prev = dst;
  }

  // Expand to RGBA8.
  const size_t n = size_t(h.width) * h.height;
  switch (h.color_type) {
    case 6:  // rgba
      std::memcpy(out, img.data(), n * 4);
      break;
    case 2:  // rgb
      for (size_t i = 0; i < n; ++i) {
        out[i * 4 + 0] = img[i * 3 + 0];
        out[i * 4 + 1] = img[i * 3 + 1];
        out[i * 4 + 2] = img[i * 3 + 2];
        out[i * 4 + 3] = 255;
      }
      break;
    case 0:  // grey
      for (size_t i = 0; i < n; ++i) {
        uint8_t g = img[i];
        out[i * 4 + 0] = out[i * 4 + 1] = out[i * 4 + 2] = g;
        out[i * 4 + 3] = 255;
      }
      break;
    case 4:  // grey+alpha
      for (size_t i = 0; i < n; ++i) {
        uint8_t g = img[i * 2];
        out[i * 4 + 0] = out[i * 4 + 1] = out[i * 4 + 2] = g;
        out[i * 4 + 3] = img[i * 2 + 1];
      }
      break;
    case 3: {  // palette
      if (plte.empty()) return -9;
      size_t ncol = plte.size() / 3;
      for (size_t i = 0; i < n; ++i) {
        size_t idx = img[i];
        if (idx >= ncol) return -10;
        out[i * 4 + 0] = plte[idx * 3 + 0];
        out[i * 4 + 1] = plte[idx * 3 + 1];
        out[i * 4 + 2] = plte[idx * 3 + 2];
        out[i * 4 + 3] = idx < trns.size() ? trns[idx] : 255;
      }
      break;
    }
    default:
      return -6;
  }
  return 0;
}

bool read_file(const char* path, std::vector<uint8_t>* buf) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return false;
  std::fseek(f, 0, SEEK_END);
  long sz = std::ftell(f);
  std::fseek(f, 0, SEEK_SET);
  if (sz <= 0) {
    std::fclose(f);
    return false;
  }
  buf->resize(size_t(sz));
  size_t rd = std::fread(buf->data(), 1, size_t(sz), f);
  std::fclose(f);
  return rd == size_t(sz);
}

}  // namespace

extern "C" {

// Probe width/height (and validate signature/IHDR). 0 on success.
int tnerf_png_info(const char* path, uint32_t* w, uint32_t* hgt) {
  std::vector<uint8_t> buf;
  if (!read_file(path, &buf)) return -1;
  if (buf.size() < 33 || std::memcmp(buf.data(), kPngSig, 8)) return -2;
  if (std::memcmp(buf.data() + 12, "IHDR", 4)) return -2;
  *w = be32(buf.data() + 16);
  *hgt = be32(buf.data() + 20);
  return 0;
}

// Decode one file into out[w*h*4] RGBA8. 0 on success.
int tnerf_png_decode(const char* path, uint8_t* out, uint32_t w, uint32_t h) {
  std::vector<uint8_t> buf;
  if (!read_file(path, &buf)) return -1;
  return decode_rgba(buf.data(), buf.size(), out, w, h);
}

// Decode n same-sized files on a thread pool into out[n*w*h*4].
// paths: array of n C strings. Returns 0 if ALL succeeded, else the
// first nonzero per-file status (and writes per-file statuses).
int tnerf_png_decode_batch(const char** paths, int n, uint8_t* out,
                           uint32_t w, uint32_t h, int num_threads,
                           int* statuses) {
  if (n <= 0) return 0;
  if (num_threads <= 0)
    num_threads = int(std::thread::hardware_concurrency());
  if (num_threads > n) num_threads = n;
  const size_t frame = size_t(w) * h * 4;
  std::vector<std::thread> pool;
  std::vector<int> st(n, 0);
  for (int t = 0; t < num_threads; ++t) {
    pool.emplace_back([&, t]() {
      for (int i = t; i < n; i += num_threads) {
        st[i] = tnerf_png_decode(paths[i], out + frame * size_t(i), w, h);
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
