// Native host-runtime kernels for the TPU registration framework.
//
// The reference gets its host runtime from PCL/Boost C++ (PCD codec:
// pcl::io::loadPCDFile at src/prob_point_cloud_registration_ex.cc:111-136;
// voxel filter: pcl::VoxelGrid at src/prob_point_cloud_registration.cc:24-41).
// These are fresh implementations of the same roles for the data-loading path
// that feeds device arrays: an LZF codec for PCD binary_compressed bodies and
// a hash-grid centroid voxel downsample. Exposed extern "C" for ctypes.
//
// Build: g++ -O3 -shared -fPIC -std=c++17 pcr_native.cpp -o libpcr_native.so

#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

extern "C" {

// ---------------------------------------------------------------------------
// LZF codec (PCD binary_compressed body format).
// Stream grammar: ctrl < 32 => literal run of ctrl+1 bytes;
// else back-reference of length (ctrl>>5)+2 (+ext byte when ctrl>>5 == 7),
// offset ((ctrl & 0x1f) << 8 | next_byte) + 1.
// ---------------------------------------------------------------------------

// Returns 0 on success, negative on corrupt stream / size mismatch.
int pcr_lzf_decompress(const uint8_t* in, uint64_t in_len, uint8_t* out,
                       uint64_t out_len) {
  uint64_t i = 0, o = 0;
  while (i < in_len && o < out_len) {
    uint32_t ctrl = in[i++];
    if (ctrl < 32) {  // literal run
      uint32_t run = ctrl + 1;
      if (i + run > in_len || o + run > out_len) return -1;
      std::memcpy(out + o, in + i, run);
      i += run;
      o += run;
    } else {  // back-reference
      uint32_t len = ctrl >> 5;
      if (len == 7) {
        if (i >= in_len) return -2;
        len += in[i++];
      }
      len += 2;
      if (i >= in_len) return -3;
      uint64_t ref_off = ((ctrl & 0x1f) << 8) + in[i++] + 1;
      if (ref_off > o) return -4;
      if (o + len > out_len) return -5;
      uint64_t ref = o - ref_off;
      for (uint32_t k = 0; k < len; ++k) out[o + k] = out[ref + k];
      o += len;
    }
  }
  // Tolerate trailing input once the expected output is complete — the
  // Python fallback stops at out_len too, so behavior is toolchain-independent.
  return (o == out_len) ? 0 : -6;
}

// Greedy hash-chain LZF encoder (liblzf-style parameters, written fresh).
// Returns compressed size, or 0 if out_cap is too small (caller should fall
// back to storing literals; PCL accepts any valid LZF stream).
uint64_t pcr_lzf_compress(const uint8_t* in, uint64_t in_len, uint8_t* out,
                          uint64_t out_cap) {
  if (in_len == 0) return 0;
  constexpr uint32_t kHashLog = 16;
  constexpr uint32_t kHashSize = 1u << kHashLog;
  constexpr uint32_t kMaxOff = 1 << 13;      // 8192: 5 offset bits + 8
  constexpr uint32_t kMaxRef = 264;          // 7 + 255 + 2
  constexpr uint32_t kMaxLit = 32;
  std::vector<int64_t> htab(kHashSize, -1);

  auto hash3 = [&](uint64_t p) -> uint32_t {
    uint32_t v = (uint32_t(in[p]) << 16) | (uint32_t(in[p + 1]) << 8) |
                 uint32_t(in[p + 2]);
    return ((v * 2654435761u) >> (32 - kHashLog)) & (kHashSize - 1);
  };

  uint64_t i = 0, o = 0;
  uint64_t lit_start = 0;
  uint32_t lit = 0;

  auto flush_literals = [&](uint64_t end) -> bool {
    while (lit > 0) {
      uint32_t run = lit < kMaxLit ? lit : kMaxLit;
      if (o + 1 + run > out_cap) return false;
      out[o++] = run - 1;
      std::memcpy(out + o, in + end - lit, run);
      o += run;
      lit -= run;
    }
    return true;
  };

  while (i + 2 < in_len) {
    uint32_t h = hash3(i);
    int64_t ref = htab[h];
    htab[h] = int64_t(i);
    uint64_t off = (ref >= 0) ? i - uint64_t(ref) : kMaxOff + 1;
    if (ref >= 0 && off <= kMaxOff && off > 0 && in[ref] == in[i] &&
        in[ref + 1] == in[i + 1] && in[ref + 2] == in[i + 2]) {
      // Extend the match.
      uint32_t len = 3;
      uint64_t max_len = in_len - i;
      if (max_len > kMaxRef) max_len = kMaxRef;
      while (len < max_len && in[ref + len] == in[i + len]) ++len;
      if (!flush_literals(i)) return 0;
      uint32_t enc_len = len - 2;
      uint64_t enc_off = off - 1;
      if (enc_len < 7) {
        if (o + 2 > out_cap) return 0;
        out[o++] = uint8_t((enc_off >> 8) | (enc_len << 5));
      } else {
        if (o + 3 > out_cap) return 0;
        out[o++] = uint8_t((enc_off >> 8) | (7u << 5));
        out[o++] = uint8_t(enc_len - 7);
      }
      out[o++] = uint8_t(enc_off & 0xff);
      // Seed the hash table through the match region (cheap, improves ratio).
      uint64_t stop = i + len;
      ++i;
      while (i < stop && i + 2 < in_len) {
        htab[hash3(i)] = int64_t(i);
        ++i;
      }
      i = stop;
      lit_start = i;
    } else {
      ++lit;
      ++i;
    }
  }
  lit += uint32_t(in_len - i);
  if (!flush_literals(in_len)) return 0;
  (void)lit_start;
  return o;
}

// ---------------------------------------------------------------------------
// Voxel-grid centroid downsample (pcl::VoxelGrid semantics: one point per
// occupied cubic leaf = centroid; output ordered by ascending linear voxel
// index, x fastest). Open-addressing hash on the linear voxel id.
// ---------------------------------------------------------------------------

namespace {
struct Cell {
  int64_t key;
  double sx, sy, sz;
  uint32_t count;
};
}  // namespace

// Computes centroids; writes at most n rows into out (xyz float64,
// row-major) and the corresponding linear voxel ids into keys_out.
// Returns the number of occupied voxels, or -1 on error. Caller sorts by
// key to get PCL's output order (done on the Python side with argsort).
int64_t pcr_voxel_downsample(const double* pts, int64_t n, double leaf,
                             double* out, int64_t* keys_out) {
  if (n <= 0 || leaf <= 0) return -1;
  // Bounding box for non-negative grid coordinates.
  double mn[3] = {pts[0], pts[1], pts[2]};
  for (int64_t p = 1; p < n; ++p)
    for (int d = 0; d < 3; ++d)
      if (pts[3 * p + d] < mn[d]) mn[d] = pts[3 * p + d];
  int64_t minijk[3];
  for (int d = 0; d < 3; ++d)
    minijk[d] = int64_t(std::floor(mn[d] / leaf));

  // Grid dims from max coordinate (for the linear index ordering).
  int64_t dims[2] = {1, 1};
  {
    int64_t mx[3] = {INT64_MIN, INT64_MIN, INT64_MIN};
    for (int64_t p = 0; p < n; ++p)
      for (int d = 0; d < 3; ++d) {
        int64_t c = int64_t(std::floor(pts[3 * p + d] / leaf)) - minijk[d];
        if (c > mx[d]) mx[d] = c;
      }
    dims[0] = mx[0] + 1;
    dims[1] = mx[1] + 1;
  }

  uint64_t cap = 1;
  while (cap < uint64_t(n) * 2) cap <<= 1;
  std::vector<Cell> table(cap);
  for (auto& c : table) c.key = -1;
  const uint64_t mask = cap - 1;

  int64_t n_cells = 0;
  for (int64_t p = 0; p < n; ++p) {
    double x = pts[3 * p], y = pts[3 * p + 1], z = pts[3 * p + 2];
    int64_t i = int64_t(std::floor(x / leaf)) - minijk[0];
    int64_t j = int64_t(std::floor(y / leaf)) - minijk[1];
    int64_t k = int64_t(std::floor(z / leaf)) - minijk[2];
    int64_t key = i + j * dims[0] + k * dims[0] * dims[1];
    uint64_t slot = (uint64_t(key) * 0x9e3779b97f4a7c15ull) & mask;
    while (true) {
      Cell& c = table[slot];
      if (c.key == key) {
        c.sx += x; c.sy += y; c.sz += z; ++c.count;
        break;
      }
      if (c.key < 0) {
        c.key = key; c.sx = x; c.sy = y; c.sz = z; c.count = 1;
        ++n_cells;
        break;
      }
      slot = (slot + 1) & mask;
    }
  }

  int64_t w = 0;
  for (uint64_t s = 0; s < cap; ++s) {
    const Cell& c = table[s];
    if (c.key < 0) continue;
    out[3 * w] = c.sx / c.count;
    out[3 * w + 1] = c.sy / c.count;
    out[3 * w + 2] = c.sz / c.count;
    keys_out[w] = c.key;
    ++w;
  }
  return n_cells;
}

}  // extern "C"
