// Native .pgen record decoder: the hot host-side path of the reader.
//
// Mirrors the role of the reference's pgenlib_read.cc inner loops
// (ParseAndApplyDifflist / Plink1 translation / LD-diff application,
// 2.0/include/pgenlib_read.cc) for hardcall decoding of record types 0-7
// per /root/reference/pgen_spec/pgen_spec.tex:345-466.  Exposed via ctypes;
// plink_tpu/io/pgen_read.py falls back to its vectorized-numpy
// implementation when this library is unavailable.
//
// Build: g++ -O3 -shared -fPIC -o libpgen_decode.so pgen_decode.cc

#include <array>
#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

namespace {

inline int sample_id_width(int64_t sample_ct) {
  if (sample_ct <= (1LL << 8)) return 1;
  if (sample_ct <= (1LL << 16)) return 2;
  if (sample_ct <= (1LL << 24)) return 3;
  return 4;
}

inline uint64_t decode_varint(const uint8_t* buf, int64_t* off) {
  uint64_t val = 0;
  int shift = 0;
  for (;;) {
    uint8_t b = buf[(*off)++];
    val |= static_cast<uint64_t>(b & 0x7F) << shift;
    if (!(b & 0x80)) return val;
    shift += 7;
  }
}

inline void set_code(uint8_t* row, uint32_t sid, uint8_t val) {
  const uint32_t byte = sid >> 2;
  const uint32_t shift = (sid & 3) * 2;
  row[byte] = static_cast<uint8_t>(
      (row[byte] & ~(3u << shift)) | (static_cast<uint32_t>(val) << shift));
}

// Decode one difflist starting at *off, applying genotype patches to row
// (if row != nullptr).  Returns 0 on success.
int apply_difflist(const uint8_t* buf, int64_t* off, int64_t sample_ct,
                   uint8_t* row) {
  const uint64_t len = decode_varint(buf, off);
  if (len == 0) return 0;
  const int64_t group_ct = static_cast<int64_t>((len + 63) / 64);
  const int width = sample_id_width(sample_ct);
  const int64_t leaders_off = *off;
  *off += group_ct * width;
  *off += group_ct - 1;  // per-group byte sizes (sequential decode skips)
  const int64_t geno_off = *off;
  *off += static_cast<int64_t>((len + 3) / 4);
  // delta varints follow; walk groups
  uint64_t idx_in_list = 0;
  for (int64_t g = 0; g < group_ct; ++g) {
    // group leader
    uint64_t sid = 0;
    const uint8_t* lp = buf + leaders_off + g * width;
    for (int k = 0; k < width; ++k) sid |= static_cast<uint64_t>(lp[k]) << (8 * k);
    const uint64_t group_end =
        (g + 1 < group_ct) ? (g + 1) * 64ULL : len;
    for (uint64_t j = g * 64ULL; j < group_end; ++j) {
      if (j != static_cast<uint64_t>(g) * 64ULL) {
        sid += decode_varint(buf, off);
      }
      const uint8_t gval =
          (buf[geno_off + (j >> 2)] >> ((j & 3) * 2)) & 3;
      if (row) set_code(row, static_cast<uint32_t>(sid), gval);
      (void)idx_in_list;
    }
  }
  return 0;
}

// category swap 0<->2 for LD-inverted records (keeps 1 and 3)
void build_invert_table(uint8_t* table) {
  for (int b = 0; b < 256; ++b) {
    int out = 0;
    for (int s = 0; s < 8; s += 2) {
      int c = (b >> s) & 3;
      if (c == 0) c = 2;
      else if (c == 2) c = 0;
      out |= c << s;
    }
    table[b] = static_cast<uint8_t>(out);
  }
}

}  // namespace

extern "C" {

// Decode hardcalls for a batch of variable-width records.
//  buf        raw record bytes (records [0, vct) concatenated)
//  rel        int64[vct+1] record offsets into buf
//  vrtypes    uint8[vct]
//  sample_ct  N
//  ld_base    uint8[nb] in/out: rolling last-non-LD decoded row
//  ld_valid   int64* in/out: 1 if ld_base is valid on entry/exit
//  out        uint8[vct*nb]
// Returns 0 on success, negative error code otherwise.
int pgen_decode_block(const uint8_t* buf, const int64_t* rel,
                      const uint8_t* vrtypes, int64_t vct, int64_t sample_ct,
                      uint8_t* ld_base, int64_t* ld_valid, uint8_t* out) {
  const int64_t nb = (sample_ct + 3) / 4;
  // C++11 magic static: thread-safe one-time init (callers include the
  // multithreaded pgen_decode_block_mt workers).
  static const std::array<uint8_t, 256> invert_table = [] {
    std::array<uint8_t, 256> t{};
    build_invert_table(t.data());
    return t;
  }();
  const uint8_t tail_keep =
      (sample_ct & 3) ? static_cast<uint8_t>((1u << (2 * (sample_ct & 3))) - 1)
                      : 0xFF;
  for (int64_t i = 0; i < vct; ++i) {
    uint8_t* row = out + i * nb;
    int64_t off = rel[i];
    const int main = vrtypes[i] & 7;
    switch (main) {
      case 0: {
        std::memcpy(row, buf + off, nb);
        break;
      }
      case 1: {
        const uint8_t pair_code = buf[off++];
        uint8_t low, high;
        switch (pair_code) {
          case 1: low = 0; high = 1; break;
          case 2: low = 0; high = 2; break;
          case 3: low = 0; high = 3; break;
          case 5: low = 1; high = 2; break;
          case 6: low = 1; high = 3; break;
          case 9: low = 2; high = 3; break;
          default: return -2;
        }
        // expand 1 bit -> 2 bits; 4 genotypes per output byte
        const uint8_t* bits = buf + off;
        off += (sample_ct + 7) / 8;
        // two-entry nibble lookup: each input nibble (4 samples) -> 1 byte
        uint8_t lut[16];
        for (int v = 0; v < 16; ++v) {
          int o = 0;
          for (int s = 0; s < 4; ++s) {
            o |= ((v >> s) & 1 ? high : low) << (2 * s);
          }
          lut[v] = static_cast<uint8_t>(o);
        }
        for (int64_t b = 0; b < nb; ++b) {
          const uint8_t in = bits[b >> 1];
          row[b] = lut[(b & 1) ? (in >> 4) : (in & 0x0F)];
        }
        row[nb - 1] &= tail_keep;  // padding genotypes decode to 0
        if (apply_difflist(buf, &off, sample_ct, row)) return -3;
        break;
      }
      case 2:
      case 3: {
        if (!*ld_valid) return -4;
        std::memcpy(row, ld_base, nb);
        if (apply_difflist(buf, &off, sample_ct, row)) return -3;
        if (main == 3) {
          for (int64_t b = 0; b < nb; ++b) row[b] = invert_table[row[b]];
        }
        break;
      }
      case 4:
      case 6:
      case 7: {
        const uint8_t fill = (main == 4) ? 0x00 : (main == 6 ? 0xAA : 0xFF);
        std::memset(row, fill, nb);
        row[nb - 1] &= tail_keep;
        if (apply_difflist(buf, &off, sample_ct, row)) return -3;
        break;
      }
      default:
        return -5;
    }
    if (main != 2 && main != 3) {
      std::memcpy(ld_base, row, nb);
      *ld_valid = 1;
    }
  }
  return 0;
}

// Translate PLINK1 .bed bytes to pgen encoding in place-copy form.
void bed_to_pgen_bytes(const uint8_t* in, int64_t n, uint8_t* out) {
  static const std::array<uint8_t, 256> table = [] {
    std::array<uint8_t, 256> t{};
    const uint8_t map2[4] = {2, 3, 1, 0};
    for (int b = 0; b < 256; ++b) {
      int o = 0;
      for (int s = 0; s < 8; s += 2) o |= map2[(b >> s) & 3] << s;
      t[b] = static_cast<uint8_t>(o);
    }
    return t;
  }();
  for (int64_t i = 0; i < n; ++i) out[i] = table[in[i]];
}

}  // extern "C"


// Multithreaded block decode: partitions the variant range at LD-chain
// starts (records with main type not in {2,3}) so each worker owns whole
// chains and needs no cross-thread ld_base.  Segment 0 uses the caller's
// rolling ld_base for chains continuing from the previous block.
extern "C" int pgen_decode_block_mt(const uint8_t* buf, const int64_t* rel,
                                    const uint8_t* vrtypes, int64_t vct,
                                    int64_t sample_ct, uint8_t* ld_base,
                                    int64_t* ld_valid, uint8_t* out,
                                    int nthreads) {
  const int64_t nb = (sample_ct + 3) / 4;
  if (nthreads <= 1 || vct < 64) {
    return pgen_decode_block(buf, rel, vrtypes, vct, sample_ct, ld_base,
                             ld_valid, out);
  }
  // collect chain starts
  std::vector<int64_t> starts;
  starts.reserve(1024);
  for (int64_t i = 0; i < vct; ++i) {
    const int m = vrtypes[i] & 7;
    if (m != 2 && m != 3) starts.push_back(i);
  }
  if (starts.size() < 2) {
    return pgen_decode_block(buf, rel, vrtypes, vct, sample_ct, ld_base,
                             ld_valid, out);
  }
  int T = nthreads;
  if (static_cast<int64_t>(starts.size()) < T) T = static_cast<int>(starts.size());
  std::vector<int64_t> seg(T + 1);
  seg[0] = 0;
  for (int t = 1; t < T; ++t) {
    seg[t] = starts[(starts.size() * t) / T];
  }
  seg[T] = vct;
  std::vector<int> rcs(T, 0);
  std::vector<std::vector<uint8_t>> bases(T);
  std::vector<int64_t> valids(T, 0);
  std::vector<std::thread> threads;
  for (int t = 0; t < T; ++t) {
    threads.emplace_back([&, t]() {
      bases[t].resize(nb);
      int64_t lv = 0;
      uint8_t* lb = bases[t].data();
      if (t == 0) {
        std::memcpy(lb, ld_base, nb);
        lv = *ld_valid;
      }
      rcs[t] = pgen_decode_block(buf, rel + seg[t], vrtypes + seg[t],
                                 seg[t + 1] - seg[t], sample_ct, lb, &lv,
                                 out + seg[t] * nb);
      valids[t] = lv;
    });
  }
  for (auto& th : threads) th.join();
  for (int t = 0; t < T; ++t) {
    if (rcs[t]) return rcs[t];
  }
  for (int t = T - 1; t >= 0; --t) {
    if (valids[t]) {
      std::memcpy(ld_base, bases[t].data(), nb);
      *ld_valid = 1;
      break;
    }
  }
  return 0;
}
