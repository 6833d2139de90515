// tricolo_native: host-side data-loading runtime (C++, ctypes ABI).
//
// The reference's load path (npz decode + dense->sparse conversion for every
// model of a split, general_dataset.py:30-69) is the framework's host-side
// throughput bottleneck (SURVEY.md "hard parts" iv: the input pipeline must
// keep a TPU slice fed). This library fuses the three hot steps in native
// code:
//
//   1. ZIP central-directory parse of the .npz archive,
//   2. raw-deflate inflate of the voxel .npy member (zlib),
//   3. one linear sweep over the (4, D, D, D) RGBA grid emitting the packed
//      u32 (flat-site, rgb) words the device scatter consumes
//      (tricolo_tpu/data/device_prep.py) -- sorted and unique by
//      construction.
//
// Also exposes a gzip-NRRD payload decoder for the offline preprocessing
// pipeline. Pure C ABI; bound via ctypes (no pybind11 in this image).

#include <zlib.h>

#include <algorithm>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <string>
#include <thread>
#include <vector>

namespace {

// Run f(b0, b1) over [0, batch) split across worker threads. Thread count:
// TRICOLO_NATIVE_THREADS env if set, else hardware_concurrency — the
// windowing/densify sweeps run in the prefetch thread and are trivially
// sample-parallel (each sample writes only its own output rows).
template <typename F>
void parallel_batches(int64_t batch, F f) {
  int64_t n = 0;
  if (const char* env = std::getenv("TRICOLO_NATIVE_THREADS")) {
    n = std::atoll(env);
  }
  if (n <= 0) n = static_cast<int64_t>(std::thread::hardware_concurrency());
  n = std::max<int64_t>(1, std::min(n, batch));
  if (n == 1) {
    f(static_cast<int64_t>(0), batch);
    return;
  }
  std::vector<std::thread> workers;
  const int64_t chunk = (batch + n - 1) / n;
  for (int64_t t = 0; t < n; ++t) {
    const int64_t b0 = t * chunk;
    const int64_t b1 = std::min(batch, b0 + chunk);
    if (b0 >= b1) break;
    workers.emplace_back([&f, b0, b1] { f(b0, b1); });
  }
  for (auto& w : workers) w.join();
}

void set_err(char* err, int errlen, const std::string& msg) {
  if (err && errlen > 0) {
    std::snprintf(err, errlen, "%s", msg.c_str());
  }
}

struct FileBuf {
  std::vector<uint8_t> data;
  bool ok = false;
};

FileBuf read_file(const char* path) {
  FileBuf out;
  FILE* f = std::fopen(path, "rb");
  if (!f) return out;
  std::fseek(f, 0, SEEK_END);
  long size = std::ftell(f);
  std::fseek(f, 0, SEEK_SET);
  out.data.resize(static_cast<size_t>(size));
  out.ok = size >= 0 &&
           std::fread(out.data.data(), 1, out.data.size(), f) == out.data.size();
  std::fclose(f);
  return out;
}

uint16_t rd16(const uint8_t* p) { return static_cast<uint16_t>(p[0] | (p[1] << 8)); }
uint32_t rd32(const uint8_t* p) {
  return static_cast<uint32_t>(p[0]) | (static_cast<uint32_t>(p[1]) << 8) |
         (static_cast<uint32_t>(p[2]) << 16) | (static_cast<uint32_t>(p[3]) << 24);
}

constexpr uint32_t kEocdSig = 0x06054b50;
constexpr uint32_t kCdSig = 0x02014b50;
constexpr uint32_t kLocalSig = 0x04034b50;

struct ZipMember {
  size_t data_offset = 0;
  size_t comp_size = 0;
  size_t uncomp_size = 0;
  uint16_t method = 0;  // 0 stored, 8 deflate
  bool found = false;
};

// Locate a member via the central directory (sizes there are reliable even
// when local headers defer to data descriptors).
ZipMember zip_find(const std::vector<uint8_t>& zip, const std::string& name) {
  ZipMember out;
  if (zip.size() < 22) return out;
  // EOCD: scan backwards over the (possibly comment-extended) tail.
  size_t eocd = std::string::npos;
  size_t scan_start = zip.size() >= (1 << 16) + 22 ? zip.size() - (1 << 16) - 22 : 0;
  for (size_t i = zip.size() - 22 + 1; i-- > scan_start;) {
    if (rd32(&zip[i]) == kEocdSig) {
      eocd = i;
      break;
    }
  }
  if (eocd == std::string::npos) return out;
  uint16_t n_entries = rd16(&zip[eocd + 10]);
  size_t cd_offset = rd32(&zip[eocd + 16]);

  size_t pos = cd_offset;
  for (uint16_t i = 0; i < n_entries; ++i) {
    if (pos + 46 > zip.size() || rd32(&zip[pos]) != kCdSig) return out;
    uint16_t method = rd16(&zip[pos + 10]);
    uint32_t comp_size = rd32(&zip[pos + 20]);
    uint32_t uncomp_size = rd32(&zip[pos + 24]);
    uint16_t name_len = rd16(&zip[pos + 28]);
    uint16_t extra_len = rd16(&zip[pos + 30]);
    uint16_t comment_len = rd16(&zip[pos + 32]);
    uint32_t local_offset = rd32(&zip[pos + 42]);
    std::string entry_name(reinterpret_cast<const char*>(&zip[pos + 46]), name_len);
    if (entry_name == name) {
      // Local header gives the true data offset (its extra field can differ
      // in length from the central one).
      if (local_offset + 30 > zip.size() || rd32(&zip[local_offset]) != kLocalSig) {
        return out;
      }
      uint16_t lname = rd16(&zip[local_offset + 26]);
      uint16_t lextra = rd16(&zip[local_offset + 28]);
      out.data_offset = local_offset + 30 + lname + lextra;
      out.comp_size = comp_size;
      out.uncomp_size = uncomp_size;
      out.method = method;
      out.found = true;
      return out;
    }
    pos += 46 + name_len + extra_len + comment_len;
  }
  return out;
}

bool inflate_raw(const uint8_t* src, size_t src_len, uint8_t* dst, size_t dst_len) {
  z_stream strm{};
  if (inflateInit2(&strm, -MAX_WBITS) != Z_OK) return false;
  strm.next_in = const_cast<uint8_t*>(src);
  strm.avail_in = static_cast<uInt>(src_len);
  strm.next_out = dst;
  strm.avail_out = static_cast<uInt>(dst_len);
  int rc = inflate(&strm, Z_FINISH);
  inflateEnd(&strm);
  return rc == Z_STREAM_END && strm.total_out == dst_len;
}

// Parse the .npy header; returns data offset within buf, fills dims (C
// order), checks dtype is uint8 ('|u1') and C contiguity.
bool npy_parse_u8(const std::vector<uint8_t>& buf, size_t* data_offset,
                  std::vector<int64_t>* dims, std::string* err) {
  if (buf.size() < 10 || std::memcmp(buf.data(), "\x93NUMPY", 6) != 0) {
    *err = "not an npy payload";
    return false;
  }
  uint8_t major = buf[6];
  size_t header_len, header_off;
  if (major == 1) {
    header_len = rd16(&buf[8]);
    header_off = 10;
  } else {
    header_len = rd32(&buf[8]);
    header_off = 12;
  }
  std::string header(reinterpret_cast<const char*>(&buf[header_off]), header_len);
  if (header.find("'|u1'") == std::string::npos &&
      header.find("'uint8'") == std::string::npos) {
    *err = "npy dtype is not uint8: " + header;
    return false;
  }
  if (header.find("'fortran_order': True") != std::string::npos) {
    *err = "fortran-order npy not supported";
    return false;
  }
  size_t lp = header.find('(');
  size_t rp = header.find(')', lp);
  if (lp == std::string::npos || rp == std::string::npos) {
    *err = "npy shape not found";
    return false;
  }
  dims->clear();
  std::string shape = header.substr(lp + 1, rp - lp - 1);
  const char* p = shape.c_str();
  while (*p) {
    char* end;
    long v = std::strtol(p, &end, 10);
    if (end == p) break;
    dims->push_back(v);
    p = end;
    while (*p == ',' || *p == ' ') ++p;
  }
  *data_offset = header_off + header_len;
  return true;
}

}  // namespace

extern "C" {

// Version tag so the Python binding can detect stale builds.
int32_t tricolo_native_abi_version() { return 8; }

// Packed (flat, rgb) words -> dense (B, D, D, D) u32 grid (zero elsewhere).
// The host half of the data.voxel_transfer=dense path: runs per batch in
// the prefetch thread, so it must outpace the device step (~180 ms in
// numpy put_along_axis on one core vs <40 ms here). `flat` uses the fixed
// 256-stride-per-axis host packing; 0xFFFFFFFF entries are padding.
void tricolo_packed_to_dense(const uint32_t* flat, const uint32_t* rgb,
                             int64_t batch, int64_t n_points, int64_t d,
                             uint32_t* grid) {
  const int64_t d3 = d * d * d;
  parallel_batches(batch, [=](int64_t b0, int64_t b1) {
    std::memset(grid + b0 * d3, 0,
                static_cast<size_t>(b1 - b0) * d3 * sizeof(uint32_t));
    for (int64_t b = b0; b < b1; ++b) {
      const uint32_t* f = flat + b * n_points;
      const uint32_t* c = rgb + b * n_points;
      uint32_t* g = grid + b * d3;
      for (int64_t i = 0; i < n_points; ++i) {
        const uint32_t word = f[i];
        if (word == 0xFFFFFFFFu) break;  // padding is trailing by contract
        const int64_t x = (word >> 16) & 0xFF;
        const int64_t y = (word >> 8) & 0xFF;
        const int64_t z = word & 0xFF;
        // Out-of-range coordinates (e.g. a packed cache built at a larger
        // voxel_size) are skipped — the numpy fallback raises and the
        // device scatter drops them; a heap write here would corrupt
        // memory.
        if (x >= d || y >= d || z >= d) continue;
        g[(x * d + y) * d + z] = c[i];
      }
    }
  });
}

// Packed (flat, rgb) words -> halo'd window rows: (batch*tg^3, s^3) u32
// with s = tile + 2*halo, plus a per-tile center-occupancy byte map
// (batch*tg^3). Window (wa,wb,wc) of a sample covers grid coordinates
// [w*tile - halo, w*tile + tile + halo) per axis (zeros past the grid
// border); a site therefore lands in up to 8 windows (its home tile plus
// face/edge/corner halos of neighbors). This is the host half of the
// data.voxel_transfer=windowed path: the device-side halo'd tile gather
// has no fast XLA/Mosaic formulation (PERF.md round 3), so the prefetch
// thread materializes the windows while packing. Row/intra ordering
// matches ops/tile_sparse.py: row = b*tg^3 + ((wa*tg)+wb)*tg + wc,
// offset = (la*s + lb)*s + lc with axis a = (word >> 16).
void tricolo_packed_to_windowed(const uint32_t* flat, const uint32_t* rgb,
                                int64_t batch, int64_t n_points, int64_t d,
                                int64_t tile, int64_t halo, uint32_t* rows,
                                uint8_t* tile_occ) {
  const int64_t tg = d / tile;
  const int64_t s = tile + 2 * halo;
  const int64_t s3 = s * s * s;
  const int64_t tiles_per_sample = tg * tg * tg;
  parallel_batches(batch, [=](int64_t b0, int64_t b1) {
    std::memset(rows + b0 * tiles_per_sample * s3, 0,
                static_cast<size_t>(b1 - b0) * tiles_per_sample * s3 *
                    sizeof(uint32_t));
    std::memset(tile_occ + b0 * tiles_per_sample,
                0, static_cast<size_t>(b1 - b0) * tiles_per_sample);
    for (int64_t b = b0; b < b1; ++b) {
      const uint32_t* f = flat + b * n_points;
      const uint32_t* c = rgb + b * n_points;
      uint32_t* r = rows + b * tiles_per_sample * s3;
      uint8_t* occ = tile_occ + b * tiles_per_sample;
      for (int64_t i = 0; i < n_points; ++i) {
        const uint32_t word = f[i];
        if (word == 0xFFFFFFFFu) break;  // padding is trailing by contract
        const int64_t v[3] = {(word >> 16) & 0xFF, (word >> 8) & 0xFF,
                              word & 0xFF};
        if (v[0] >= d || v[1] >= d || v[2] >= d) continue;  // malformed
        // Per axis: the home window, plus a neighbor within halo reach.
        int64_t w_opts[3][2];
        int n_opts[3];
        for (int axis = 0; axis < 3; ++axis) {
          const int64_t home = v[axis] / tile;
          const int64_t mod = v[axis] % tile;
          n_opts[axis] = 0;
          w_opts[axis][n_opts[axis]++] = home;
          if (mod < halo && home > 0) w_opts[axis][n_opts[axis]++] = home - 1;
          if (mod >= tile - halo && home + 1 < tg)
            w_opts[axis][n_opts[axis]++] = home + 1;
        }
        const int64_t home_tile =
            ((v[0] / tile) * tg + v[1] / tile) * tg + v[2] / tile;
        occ[home_tile] = 1;
        for (int ia = 0; ia < n_opts[0]; ++ia)
          for (int ib = 0; ib < n_opts[1]; ++ib)
            for (int ic = 0; ic < n_opts[2]; ++ic) {
              const int64_t wa = w_opts[0][ia], wb = w_opts[1][ib],
                            wc = w_opts[2][ic];
              const int64_t la = v[0] - (wa * tile - halo);
              const int64_t lb = v[1] - (wb * tile - halo);
              const int64_t lc = v[2] - (wc * tile - halo);
              r[((wa * tg + wb) * tg + wc) * s3 + (la * s + lb) * s + lc] =
                  c[i];
            }
      }
    }
  });
}

// Compacted windowed transfer, PER-SAMPLE layout: window rows for ONLY
// each sample's first `k` active tiles (ascending tile id within the
// sample — the same nonzero(size=k) truncation rule the device applies).
// The per-sample axis is the point: under a data-parallel mesh the rows
// shard with their samples, so the tile->grid scatter stays shard-local
// (ops/tile_sparse.scatter_tiles_ps). Outputs:
//   rows      (batch, k, s^3) u32 — zeroed, active windows written
//   local_ids (batch, k) i32      — tile ids in [0, tg^3), padded tg^3
//   counts    (batch,) i32        — each sample's TOTAL active tiles
//     (callers compare against k: count > k means truncation)
// Fully sample-parallel — no cross-sample pass exists in this layout.
void tricolo_packed_to_windowed_compact(
    const uint32_t* flat, const uint32_t* rgb, int64_t batch,
    int64_t n_points, int64_t d, int64_t tile, int64_t halo, int64_t k,
    uint32_t* rows, int32_t* local_ids, int32_t* counts) {
  const int64_t tg = d / tile;
  const int64_t s = tile + 2 * halo;
  const int64_t s3 = s * s * s;
  const int64_t tiles_per_sample = tg * tg * tg;
  parallel_batches(batch, [=](int64_t b0, int64_t b1) {
    std::vector<int32_t> slot(static_cast<size_t>(tiles_per_sample));
    for (int64_t b = b0; b < b1; ++b) {
      const uint32_t* f = flat + b * n_points;
      const uint32_t* c = rgb + b * n_points;
      uint32_t* r = rows + b * k * s3;
      int32_t* ids = local_ids + b * k;
      // Pass 1: this sample's per-tile center occupancy (slot = -1/-2).
      std::fill(slot.begin(), slot.end(), -1);
      for (int64_t i = 0; i < n_points; ++i) {
        const uint32_t word = f[i];
        if (word == 0xFFFFFFFFu) break;  // padding is trailing by contract
        const int64_t x = (word >> 16) & 0xFF;
        const int64_t y = (word >> 8) & 0xFF;
        const int64_t z = word & 0xFF;
        if (x >= d || y >= d || z >= d) continue;  // malformed
        slot[(x / tile) * tg * tg + (y / tile) * tg + z / tile] = -2;
      }
      // Slot assignment: ascending tile id -> row slot, first k winners.
      int64_t total = 0;
      for (int64_t t = 0; t < tiles_per_sample; ++t) {
        if (slot[static_cast<size_t>(t)] == -2) {
          if (total < k) {
            slot[static_cast<size_t>(t)] = static_cast<int32_t>(total);
            ids[total] = static_cast<int32_t>(t);
          } else {
            slot[static_cast<size_t>(t)] = -1;  // over-budget: dropped
          }
          ++total;
        }
      }
      counts[b] = static_cast<int32_t>(total);
      for (int64_t j = std::min(total, k); j < k; ++j) {
        ids[j] = static_cast<int32_t>(tiles_per_sample);  // "no tile"
      }
      std::memset(r, 0, static_cast<size_t>(k) * s3 * sizeof(uint32_t));
      // Pass 2: scatter each site into its home window and the halo bands
      // of active neighbor windows.
      for (int64_t i = 0; i < n_points; ++i) {
        const uint32_t word = f[i];
        if (word == 0xFFFFFFFFu) break;
        const int64_t v[3] = {(word >> 16) & 0xFF, (word >> 8) & 0xFF,
                              word & 0xFF};
        if (v[0] >= d || v[1] >= d || v[2] >= d) continue;
        int64_t w_opts[3][2];
        int n_opts[3];
        for (int axis = 0; axis < 3; ++axis) {
          const int64_t home = v[axis] / tile;
          const int64_t mod = v[axis] % tile;
          n_opts[axis] = 0;
          w_opts[axis][n_opts[axis]++] = home;
          if (mod < halo && home > 0) w_opts[axis][n_opts[axis]++] = home - 1;
          if (mod >= tile - halo && home + 1 < tg)
            w_opts[axis][n_opts[axis]++] = home + 1;
        }
        for (int ia = 0; ia < n_opts[0]; ++ia)
          for (int ib = 0; ib < n_opts[1]; ++ib)
            for (int ic = 0; ic < n_opts[2]; ++ic) {
              const int64_t wa = w_opts[0][ia], wb = w_opts[1][ib],
                            wc = w_opts[2][ic];
              const int32_t row = slot[(wa * tg + wb) * tg + wc];
              if (row < 0) continue;  // inactive or over-budget tile
              const int64_t la = v[0] - (wa * tile - halo);
              const int64_t lb = v[1] - (wb * tile - halo);
              const int64_t lc = v[2] - (wc * tile - halo);
              r[static_cast<int64_t>(row) * s3 + (la * s + lb) * s + lc] =
                  c[i];
            }
      }
    }
  });
}

// Dense (4, D, D, D) u8 RGBA C-order grid -> packed words. Returns the
// occupied-site count (may exceed n_cap; only n_cap entries are written).
int64_t tricolo_dense_rgba_to_packed(const uint8_t* grid, int64_t d,
                                     uint32_t* flat, uint32_t* rgb,
                                     int64_t n_cap) {
  const int64_t d3 = d * d * d;
  const uint8_t* r_plane = grid;
  const uint8_t* g_plane = grid + d3;
  const uint8_t* b_plane = grid + 2 * d3;
  const uint8_t* a_plane = grid + 3 * d3;
  int64_t count = 0;
  // Single linear sweep in site order -> output sorted & unique for free.
  for (int64_t site = 0; site < d3; ++site) {
    if (a_plane[site]) {
      if (count < n_cap) {
        const uint32_t x = static_cast<uint32_t>(site / (d * d));
        const uint32_t y = static_cast<uint32_t>((site / d) % d);
        const uint32_t z = static_cast<uint32_t>(site % d);
        flat[count] = (x * 256u + y) * 256u + z;
        // Bit 24 = occupancy flag (reference active-site rule is alpha>0,
        // so pure-black occupied voxels must stay distinguishable from
        // empty space in the packed word).
        rgb[count] = static_cast<uint32_t>(r_plane[site]) |
                     (static_cast<uint32_t>(g_plane[site]) << 8) |
                     (static_cast<uint32_t>(b_plane[site]) << 16) |
                     (1u << 24);
      }
      ++count;
    }
  }
  return count;
}

// Read + decompress an npz member into caller-provided buffer. Returns the
// uncompressed size, or -1 on error. Query size first with out=nullptr.
int64_t tricolo_npz_read(const char* path, const char* member, uint8_t* out,
                         int64_t out_cap, char* err, int32_t errlen) {
  FileBuf file = read_file(path);
  if (!file.ok) {
    set_err(err, errlen, std::string("cannot read file: ") + path);
    return -1;
  }
  std::string member_name = std::string(member) + ".npy";
  ZipMember zm = zip_find(file.data, member_name);
  if (!zm.found) zm = zip_find(file.data, member);
  if (!zm.found) {
    set_err(err, errlen, std::string("member not found: ") + member);
    return -1;
  }
  if (zm.data_offset + zm.comp_size > file.data.size()) {
    set_err(err, errlen, "corrupt zip: member overruns file");
    return -1;
  }
  if (out == nullptr) return static_cast<int64_t>(zm.uncomp_size);
  if (out_cap < static_cast<int64_t>(zm.uncomp_size)) {
    set_err(err, errlen, "output buffer too small");
    return -1;
  }
  const uint8_t* src = file.data.data() + zm.data_offset;
  if (zm.method == 0) {
    std::memcpy(out, src, zm.uncomp_size);
  } else if (zm.method == 8) {
    if (!inflate_raw(src, zm.comp_size, out, zm.uncomp_size)) {
      set_err(err, errlen, "deflate stream corrupt");
      return -1;
    }
  } else {
    set_err(err, errlen, "unsupported zip compression method");
    return -1;
  }
  return static_cast<int64_t>(zm.uncomp_size);
}

// Fused: npz member -> npy parse -> packed sparse voxels. Returns occupied
// count (clamped writes at n_cap), fills *d_out with the grid size, or -1.
int64_t tricolo_load_npz_voxels_packed(const char* path, const char* member,
                                       uint32_t* flat, uint32_t* rgb,
                                       int64_t n_cap, int64_t* d_out,
                                       char* err, int32_t errlen) {
  int64_t size = tricolo_npz_read(path, member, nullptr, 0, err, errlen);
  if (size < 0) return -1;
  std::vector<uint8_t> payload(static_cast<size_t>(size));
  if (tricolo_npz_read(path, member, payload.data(), size, err, errlen) < 0) {
    return -1;
  }
  size_t data_offset;
  std::vector<int64_t> dims;
  std::string perr;
  if (!npy_parse_u8(payload, &data_offset, &dims, &perr)) {
    set_err(err, errlen, perr);
    return -1;
  }
  if (dims.size() != 4 || dims[0] != 4 || dims[1] != dims[2] ||
      dims[2] != dims[3]) {
    set_err(err, errlen, "expected (4, D, D, D) RGBA voxel grid");
    return -1;
  }
  const int64_t d = dims[1];
  if (static_cast<int64_t>(payload.size() - data_offset) < 4 * d * d * d) {
    set_err(err, errlen, "npy payload truncated");
    return -1;
  }
  if (d_out) *d_out = d;
  return tricolo_dense_rgba_to_packed(payload.data() + data_offset, d, flat,
                                      rgb, n_cap);
}

// Decode a gzip stream (NRRD payloads) into caller buffer; returns
// decompressed size or -1. Query with out=nullptr is unsupported (gzip has
// no reliable size field for >4GB); pass expected capacity.
int64_t tricolo_gzip_decode(const uint8_t* src, int64_t src_len, uint8_t* out,
                            int64_t out_cap) {
  z_stream strm{};
  if (inflateInit2(&strm, 16 + MAX_WBITS) != Z_OK) return -1;
  strm.next_in = const_cast<uint8_t*>(src);
  strm.avail_in = static_cast<uInt>(src_len);
  strm.next_out = out;
  strm.avail_out = static_cast<uInt>(out_cap);
  int rc = inflate(&strm, Z_FINISH);
  int64_t total = static_cast<int64_t>(strm.total_out);
  inflateEnd(&strm);
  return rc == Z_STREAM_END ? total : -1;
}

}  // extern "C"
