// Native PNG codec for the dataset loader (grayscale decode / encode).
//
// The reference's data tier is Julia FileIO/ImageIO (src/Datasets.jl:54-65);
// this framework's native IO tier decodes the bundled (true, noisy) PNG
// pairs without any Python imaging dependency: chunk parsing + zlib inflate
// + scanline unfiltering here, ctypes bindings in native/__init__.py, with
// PIL as the pure-Python fallback/oracle.
//
// Supported: bit depth 8/16; color types 0 (gray), 2 (RGB), 4 (gray+alpha),
// 6 (RGBA); no interlacing.  RGB converts to luma with ITU-R 601 weights to
// match PIL's convert("L") oracle.  Encode writes 8-bit grayscale,
// filter 0, one IDAT.

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <vector>

#include <zlib.h>

namespace {

struct Reader {
  const uint8_t* p;
  size_t n;
  size_t off = 0;
  bool ok = true;

  uint32_t u32() {
    if (off + 4 > n) { ok = false; return 0; }
    uint32_t v = (uint32_t(p[off]) << 24) | (uint32_t(p[off + 1]) << 16) |
                 (uint32_t(p[off + 2]) << 8) | uint32_t(p[off + 3]);
    off += 4;
    return v;
  }
  const uint8_t* bytes(size_t k) {
    if (off + k > n) { ok = false; return nullptr; }
    const uint8_t* q = p + off;
    off += k;
    return q;
  }
};

int paeth(int a, int b, int c) {
  int pp = a + b - c;
  int pa = abs(pp - a), pb = abs(pp - b), pc = abs(pp - c);
  if (pa <= pb && pa <= pc) return a;
  if (pb <= pc) return b;
  return c;
}

bool inflate_all(const std::vector<uint8_t>& in, std::vector<uint8_t>& out) {
  z_stream zs;
  memset(&zs, 0, sizeof(zs));
  if (inflateInit(&zs) != Z_OK) return false;
  zs.next_in = const_cast<Bytef*>(in.data());
  zs.avail_in = static_cast<uInt>(in.size());
  uint8_t buf[1 << 16];
  int ret;
  do {
    zs.next_out = buf;
    zs.avail_out = sizeof(buf);
    ret = inflate(&zs, Z_NO_FLUSH);
    if (ret != Z_OK && ret != Z_STREAM_END) {
      inflateEnd(&zs);
      return false;
    }
    out.insert(out.end(), buf, buf + (sizeof(buf) - zs.avail_out));
  } while (ret != Z_STREAM_END);
  inflateEnd(&zs);
  return true;
}

}  // namespace

extern "C" {

// Returns 0 on success; *out is malloc'd row-major (rows*cols) in [0,1].
int png_read_gray(const char* path, double** out, int* rows, int* cols) {
  FILE* f = fopen(path, "rb");
  if (!f) return -1;
  fseek(f, 0, SEEK_END);
  long sz = ftell(f);
  fseek(f, 0, SEEK_SET);
  if (sz < 8) {  // unseekable stream (ftell = -1) or impossibly small file
    fclose(f);
    return -2;
  }
  std::vector<uint8_t> data(sz);
  if (fread(data.data(), 1, sz, f) != static_cast<size_t>(sz)) {
    fclose(f);
    return -2;
  }
  fclose(f);

  static const uint8_t magic[8] = {137, 80, 78, 71, 13, 10, 26, 10};
  if (sz < 8 || memcmp(data.data(), magic, 8) != 0) return -3;

  Reader r{data.data(), static_cast<size_t>(sz), 8};
  uint32_t W = 0, H = 0;
  int bit_depth = 0, color_type = 0, interlace = 0;
  std::vector<uint8_t> idat;

  while (r.ok && r.off < r.n) {
    uint32_t len = r.u32();
    const uint8_t* type = r.bytes(4);
    if (!r.ok) return -4;
    const uint8_t* payload = r.bytes(len);
    if (!r.ok) return -4;
    r.u32();  // CRC (unchecked; zlib adler catches corruption downstream)
    if (memcmp(type, "IHDR", 4) == 0) {
      if (len < 13) return -5;
      W = (uint32_t(payload[0]) << 24) | (uint32_t(payload[1]) << 16) |
          (uint32_t(payload[2]) << 8) | payload[3];
      H = (uint32_t(payload[4]) << 24) | (uint32_t(payload[5]) << 16) |
          (uint32_t(payload[6]) << 8) | payload[7];
      bit_depth = payload[8];
      color_type = payload[9];
      interlace = payload[12];
    } else if (memcmp(type, "IDAT", 4) == 0) {
      idat.insert(idat.end(), payload, payload + len);
    } else if (memcmp(type, "IEND", 4) == 0) {
      break;
    }
  }
  if (W == 0 || H == 0 || interlace != 0) return -6;
  const bool subbyte = bit_depth < 8;
  if (bit_depth != 8 && bit_depth != 16 && !(subbyte && color_type == 0))
    return -7;
  if (subbyte && bit_depth != 1 && bit_depth != 2 && bit_depth != 4)
    return -7;

  int channels;
  switch (color_type) {
    case 0: channels = 1; break;
    case 2: channels = 3; break;
    case 4: channels = 2; break;
    case 6: channels = 4; break;
    default: return -8;
  }

  std::vector<uint8_t> raw;
  if (!inflate_all(idat, raw)) return -9;

  // filtering operates on whole bytes; bpp = ceil(bits per pixel / 8)
  const size_t bits_per_pixel = static_cast<size_t>(channels) * bit_depth;
  const size_t bpp = subbyte ? 1 : bits_per_pixel / 8;
  const size_t stride = subbyte ? (bits_per_pixel * W + 7) / 8 : bpp * W;
  if (raw.size() < H * (stride + 1)) return -10;

  // Unfilter scanlines in place into `img`.
  std::vector<uint8_t> img(H * stride);
  for (uint32_t y = 0; y < H; ++y) {
    uint8_t filter = raw[y * (stride + 1)];
    const uint8_t* src = raw.data() + y * (stride + 1) + 1;
    uint8_t* dst = img.data() + y * stride;
    const uint8_t* up = y ? img.data() + (y - 1) * stride : nullptr;
    for (size_t x = 0; x < stride; ++x) {
      int a = x >= bpp ? dst[x - bpp] : 0;
      int b = up ? up[x] : 0;
      int c = (up && x >= bpp) ? up[x - bpp] : 0;
      int v = src[x];
      switch (filter) {
        case 0: break;
        case 1: v += a; break;
        case 2: v += b; break;
        case 3: v += (a + b) / 2; break;
        case 4: v += paeth(a, b, c); break;
        default: return -11;
      }
      dst[x] = static_cast<uint8_t>(v);
    }
  }

  double* result = static_cast<double*>(malloc(sizeof(double) * W * H));
  if (!result) return -12;
  if (subbyte) {  // 1/2/4-bit grayscale, MSB-first packing
    const double sub_scale = 1.0 / ((1 << bit_depth) - 1);
    for (uint32_t y = 0; y < H; ++y) {
      const uint8_t* row = img.data() + y * stride;
      for (uint32_t x = 0; x < W; ++x) {
        size_t bit_off = static_cast<size_t>(x) * bit_depth;
        uint8_t byte = row[bit_off >> 3];
        int shift = 8 - bit_depth - static_cast<int>(bit_off & 7);
        int v = (byte >> shift) & ((1 << bit_depth) - 1);
        result[y * W + x] = v * sub_scale;
      }
    }
    *out = result;
    *rows = static_cast<int>(H);
    *cols = static_cast<int>(W);
    return 0;
  }
  const double scale = bit_depth == 8 ? 1.0 / 255.0 : 1.0 / 65535.0;
  const int step = bit_depth / 8;
  for (uint32_t y = 0; y < H; ++y) {
    const uint8_t* row = img.data() + y * stride;
    for (uint32_t x = 0; x < W; ++x) {
      const uint8_t* px = row + x * bpp;
      auto sample = [&](int ch) -> double {
        const uint8_t* s = px + ch * step;
        int v = bit_depth == 8 ? s[0] : ((s[0] << 8) | s[1]);
        return v * scale;
      };
      double g;
      if (channels >= 3) {
        // ITU-R 601 luma (PIL convert("L"))
        g = 0.299 * sample(0) + 0.587 * sample(1) + 0.114 * sample(2);
      } else {
        g = sample(0);  // gray / gray+alpha: first channel
      }
      result[y * W + x] = g;
    }
  }
  *out = result;
  *rows = static_cast<int>(H);
  *cols = static_cast<int>(W);
  return 0;
}

void png_free(double* p) { free(p); }

// Writes an 8-bit grayscale PNG (values clamped to [0,1]).  0 on success.
int png_write_gray(const char* path, const double* img, int rows, int cols) {
  const uint32_t W = cols, H = rows;
  std::vector<uint8_t> raw(H * (W + 1));
  for (uint32_t y = 0; y < H; ++y) {
    raw[y * (W + 1)] = 0;  // filter 0
    for (uint32_t x = 0; x < W; ++x) {
      double v = img[y * W + x];
      if (!(v >= 0.0)) v = 0.0;  // also catches NaN (comparison false)
      if (v > 1.0) v = 1.0;
      raw[y * (W + 1) + 1 + x] = static_cast<uint8_t>(v * 255.0 + 0.5);
    }
  }

  uLongf comp_bound = compressBound(raw.size());
  std::vector<uint8_t> comp(comp_bound);
  if (compress2(comp.data(), &comp_bound, raw.data(), raw.size(),
                Z_BEST_SPEED) != Z_OK)
    return -1;
  comp.resize(comp_bound);

  FILE* f = fopen(path, "wb");
  if (!f) return -2;

  auto be32 = [](uint32_t v, uint8_t* b) {
    b[0] = v >> 24; b[1] = v >> 16; b[2] = v >> 8; b[3] = v;
  };
  auto write_chunk = [&](const char* type, const uint8_t* payload,
                         uint32_t len) {
    uint8_t hdr[8];
    be32(len, hdr);
    memcpy(hdr + 4, type, 4);
    fwrite(hdr, 1, 8, f);
    if (len) fwrite(payload, 1, len, f);
    uLong crc = crc32(0L, Z_NULL, 0);
    crc = crc32(crc, hdr + 4, 4);
    if (len) crc = crc32(crc, payload, len);
    uint8_t crcb[4];
    be32(static_cast<uint32_t>(crc), crcb);
    fwrite(crcb, 1, 4, f);
  };

  static const uint8_t magic[8] = {137, 80, 78, 71, 13, 10, 26, 10};
  fwrite(magic, 1, 8, f);
  uint8_t ihdr[13];
  be32(W, ihdr);
  be32(H, ihdr + 4);
  ihdr[8] = 8;   // bit depth
  ihdr[9] = 0;   // grayscale
  ihdr[10] = ihdr[11] = ihdr[12] = 0;
  write_chunk("IHDR", ihdr, 13);
  write_chunk("IDAT", comp.data(), static_cast<uint32_t>(comp.size()));
  write_chunk("IEND", nullptr, 0);
  fclose(f);
  return 0;
}

}  // extern "C"
