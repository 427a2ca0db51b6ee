// rANS range coder (16-bit precision) — the native entropy-coding backend.
//
// Replaces the reference's torchac C++ arithmetic coder
// (/root/reference/code/modelv2/eval_selfcontained_entropy.py:48,62,96,116):
// encodes/decodes integer symbols against per-row integer CDF tables computed
// on TPU. Design:
//   * 64-bit rANS state, 32-bit renormalization words (rans64 construction).
//   * PROB_BITS = 16: CDF rows are uint32[L+1], cdf[0] = 0, cdf[L] = 65536,
//     every symbol interval non-empty (the table builder guarantees freq >= 1,
//     which makes every symbol decodable).
//   * Per-symbol CDF-row indirection: row_idx[i] selects the CDF row for
//     symbol i (per-channel tables for the hyperprior / global-parameter mode,
//     per-element tables for spatial-parameter mode). NULL row_idx = row 0.
//   * N-way interleaved states (encode/decode symmetric round-robin) to hide
//     the division dependency chain; INTERLEAVE=4 measured fastest on the
//     host CPUs paired with TPU v5e.
//   * Encode division by reciprocal multiplication: per-(row,symbol) tables
//     carry a Granlund–Montgomery branch-free magic (exact floor(x/freq) for
//     all 64-bit x), replacing the 64-bit hardware divide on the hot path.
//     Built per stream when rows are reused enough to amortize (per-channel
//     tables are; per-element tables fall back to the divide).
//   * Decode symbol lookup: a slot->symbol bucket LUT (SlotLut) narrows the
//     per-symbol binary search to a ~2-symbol span under the same
//     amortization gate.
//   * BATCH entry points encode/decode B independent streams (one per image)
//     in ONE native call over contiguous u8 or i32 symbol planes — the
//     production codec path; removes per-image Python/ctypes/thread overhead
//     (this host exposes a single core, so batching beats threading).
//
// Compiled with: g++ -O3 -march=native (see codec/rans.py).

#include <cstdint>
#include <cstring>
#include <vector>

namespace {

constexpr uint32_t PROB_BITS = 16;
constexpr uint32_t PROB_SCALE = 1u << PROB_BITS;
constexpr uint64_t RANS_L = 1ull << 31;  // lower bound of the state interval

struct Encoder {
  // Words are emitted back-to-front; buf grows from the end.
  std::vector<uint32_t> words;

  inline void put(uint64_t &x, uint32_t start, uint32_t freq) {
    const uint64_t x_max = static_cast<uint64_t>(freq) << 47;
    if (x >= x_max) {
      words.push_back(static_cast<uint32_t>(x));
      x >>= 32;
    }
    x = ((x / freq) << PROB_BITS) + (x % freq) + start;
  }
};

// Granlund–Montgomery branch-free unsigned division by a precomputed
// invariant divisor: exact floor(x / freq) for ALL uint64 x. For
// freq = 2^k the plain shift is used instead (pow2 flag).
struct EncSym {
  uint64_t m;      // magic = floor(2^(64+sh) / freq) + 1, stored mod 2^64
  uint32_t start;
  uint32_t freq;
  uint8_t sh;      // ceil(log2(freq))
  uint8_t pow2;    // freq is a power of two -> q = x >> sh
};

inline uint64_t div_bf(uint64_t x, uint64_t m, uint8_t sh) {
  const uint64_t q1 = static_cast<uint64_t>(
      (static_cast<unsigned __int128>(x) * m) >> 64);
  return (q1 + ((x - q1) >> 1)) >> (sh - 1);
}

// Build per-(row,symbol) encode entries. O(n_rows * L); gate on reuse.
void build_enc_table(const uint32_t *cdfs, int64_t n_rows, int64_t L,
                     std::vector<EncSym> &tab) {
  tab.resize(static_cast<size_t>(n_rows) * L);
  for (int64_t r = 0; r < n_rows; ++r) {
    const uint32_t *row = cdfs + r * (L + 1);
    EncSym *dst = tab.data() + r * L;
    for (int64_t s = 0; s < L; ++s) {
      EncSym e;
      e.start = row[s];
      e.freq = row[s + 1] - row[s];
      if (e.freq == 0) e.freq = 1;  // guarded upstream; stay safe
      if ((e.freq & (e.freq - 1)) == 0) {
        e.pow2 = 1;
        e.sh = static_cast<uint8_t>(__builtin_ctz(e.freq));
        e.m = 0;
      } else {
        e.pow2 = 0;
        // freq >= 3 here, so sh = ceil(log2(freq)) >= 2 and sh-1 >= 1.
        e.sh = static_cast<uint8_t>(64 - __builtin_clzll(
            static_cast<uint64_t>(e.freq) - 1));
        const unsigned __int128 num =
            static_cast<unsigned __int128>(1) << (64 + e.sh);
        e.m = static_cast<uint64_t>(num / e.freq) + 1;
      }
      dst[s] = e;
    }
  }
}

inline void put_tab(Encoder &enc, uint64_t &x, const EncSym &e) {
  const uint64_t x_max = static_cast<uint64_t>(e.freq) << 47;
  if (x >= x_max) {
    enc.words.push_back(static_cast<uint32_t>(x));
    x >>= 32;
  }
  const uint64_t q = e.pow2 ? (x >> e.sh) : div_bf(x, e.m, e.sh);
  x = (q << PROB_BITS) + (x - q * e.freq) + e.start;
}

inline uint32_t cdf_find(const uint32_t *row, int64_t L, uint32_t slot) {
  // Largest s with row[s] <= slot; row has L+1 entries, row[L] = 65536.
  int64_t lo = 0, hi = L;  // invariant: row[lo] <= slot < row[hi]
  while (hi - lo > 1) {
    const int64_t mid = (lo + hi) >> 1;
    if (row[mid] <= slot) lo = mid; else hi = mid;
  }
  return static_cast<uint32_t>(lo);
}

// Slot->symbol bucket LUT: lut[b] = symbol containing the first slot of
// bucket b. The answer for any slot in bucket b lies in [lut[b], lut[b+1]],
// so the per-symbol binary search shrinks from log2(L) iterations over the
// whole row to ~1-2 over an L/B-symbol span. B adapts to how many symbols
// each row decodes: the build is O(B + L) per row and only pays off when a
// row is reused (per-channel tables decode H*W symbols per row; per-element
// tables decode one symbol per row and skip the LUT entirely).
struct SlotLut {
  std::vector<uint16_t> t;  // n_rows x (B + 1)
  int shift = PROB_BITS;    // slot >> shift = bucket
  int64_t b = 0;            // bucket count B

  // avg = symbols decoded per row; build only if it amortizes.
  bool init(const uint32_t *cdfs, int64_t n_rows, int64_t L, int64_t avg) {
    if (avg < 32 || L >= (1 << 16)) return false;
    // B: power of two, ~L/B in [2, 4] symbols per bucket, capped so the
    // build stays well under the decode work it saves.
    int64_t want = 1;
    while (want * 2 <= avg / 2 && want * 2 <= 4096) want *= 2;
    if (want < 16) return false;
    b = want;
    shift = PROB_BITS - __builtin_ctzll(static_cast<uint64_t>(b));
    t.resize(static_cast<size_t>(n_rows) * (b + 1));
    for (int64_t r = 0; r < n_rows; ++r) {
      const uint32_t *row = cdfs + r * (L + 1);
      uint16_t *lut = t.data() + r * (b + 1);
      int64_t s = 0;
      for (int64_t bk = 0; bk < b; ++bk) {
        const uint32_t slot = static_cast<uint32_t>(bk << shift);
        while (row[s + 1] <= slot) ++s;
        lut[bk] = static_cast<uint16_t>(s);
      }
      lut[b] = static_cast<uint16_t>(L - 1);
    }
    return true;
  }

  inline uint32_t find(const uint32_t *row, const uint16_t *lut,
                       uint32_t slot) const {
    int64_t lo = lut[slot >> shift];
    int64_t hi = static_cast<int64_t>(lut[(slot >> shift) + 1]) + 1;
    while (hi - lo > 1) {
      const int64_t mid = (lo + hi) >> 1;
      if (row[mid] <= slot) lo = mid; else hi = mid;
    }
    return static_cast<uint32_t>(lo);
  }
};

// ---------------------------------------------------------------------------
// Stream cores, templated over the symbol element type (int32 / uint8).
// ---------------------------------------------------------------------------

template <typename SymT>
int64_t encode_stream(const SymT *symbols, int64_t n, const uint32_t *cdfs,
                      int64_t L, int64_t n_rows, const int32_t *row_idx,
                      int n_states, std::vector<EncSym> &tab_scratch,
                      uint8_t *out, int64_t out_cap) {
  const int64_t stride = L + 1;
  uint64_t state[8];
  for (int k = 0; k < n_states; ++k) state[k] = RANS_L;

  Encoder enc;
  enc.words.reserve(static_cast<size_t>(n / 2 + 8));

  // Reciprocal table only when rows are reused enough to amortize the
  // O(n_rows * L) build (per-channel tables; NOT spatial per-element).
  const bool use_tab = n_rows * L <= n;
  if (use_tab) build_enc_table(cdfs, n_rows, L, tab_scratch);

  // rANS encodes in reverse; state k handles symbols with i % n_states == k.
  if (use_tab) {
    const EncSym *tab = tab_scratch.data();
    for (int64_t i = n - 1; i >= 0; --i) {
      const int64_t s = static_cast<int64_t>(symbols[i]);
      if (s < 0 || s >= L) return -1;
      const int64_t r = row_idx ? static_cast<int64_t>(row_idx[i]) : 0;
      put_tab(enc, state[i % n_states], tab[r * L + s]);
    }
  } else {
    for (int64_t i = n - 1; i >= 0; --i) {
      const int64_t s = static_cast<int64_t>(symbols[i]);
      if (s < 0 || s >= L) return -1;
      const uint32_t *row =
          cdfs + (row_idx ? static_cast<int64_t>(row_idx[i]) * stride : 0);
      enc.put(state[i % n_states], row[s], row[s + 1] - row[s]);
    }
  }

  // Flush states (2 words each). The word vector is reversed on output, so
  // append lo-then-hi from the highest state index down: the decoder then
  // streams state0_hi, state0_lo, state1_hi, ...
  for (int k = n_states - 1; k >= 0; --k) {
    enc.words.push_back(static_cast<uint32_t>(state[k]));
    enc.words.push_back(static_cast<uint32_t>(state[k] >> 32));
  }

  const int64_t n_bytes = static_cast<int64_t>(enc.words.size()) * 4;
  if (n_bytes > out_cap) return -1;
  // Reverse word order so the decoder streams forward.
  uint32_t *dst = reinterpret_cast<uint32_t *>(out);
  const size_t w = enc.words.size();
  for (size_t j = 0; j < w; ++j) dst[j] = enc.words[w - 1 - j];
  return n_bytes;
}

template <typename SymT>
int64_t decode_stream(const uint8_t *in, int64_t in_len, const uint32_t *cdfs,
                      int64_t L, int64_t n_rows, const int32_t *row_idx,
                      int n_states, SymT *out_symbols, int64_t n) {
  const int64_t stride = L + 1;
  if (in_len < 8 * n_states || (in_len & 3)) return -1;
  const uint32_t *ptr = reinterpret_cast<const uint32_t *>(in);
  const uint32_t *end = ptr + in_len / 4;

  uint64_t state[8];
  for (int k = 0; k < n_states; ++k) {
    const uint64_t hi = *ptr++;
    const uint64_t lo = *ptr++;
    state[k] = (hi << 32) | lo;
  }

  if (n_rows < 1) n_rows = 1;
  if (!row_idx) n_rows = 1;  // only row 0 is ever touched
  SlotLut lut;
  const bool use_lut = lut.init(cdfs, n_rows, L, n / n_rows);

  for (int64_t i = 0; i < n; ++i) {
    uint64_t &x = state[i % n_states];
    const uint32_t slot = static_cast<uint32_t>(x) & (PROB_SCALE - 1);
    const int64_t r = row_idx ? static_cast<int64_t>(row_idx[i]) : 0;
    const uint32_t *row = cdfs + r * stride;
    const uint32_t s =
        use_lut ? lut.find(row, lut.t.data() + r * (lut.b + 1), slot)
                : cdf_find(row, L, slot);
    const uint32_t start = row[s];
    const uint32_t freq = row[s + 1] - row[s];
    x = freq * (x >> PROB_BITS) + slot - start;
    if (x < RANS_L) {
      if (ptr >= end) return -1;
      x = (x << 32) | *ptr++;
    }
    out_symbols[i] = static_cast<SymT>(s);
  }
  return 0;
}

inline int clamp_states(int32_t n) { return n < 1 ? 1 : (n > 8 ? 8 : n); }

}  // namespace

extern "C" {

// Encode n symbols (values in [0, L)) against uint32 CDF rows of length L+1.
// row_idx: per-symbol row index into cdfs (NULL => all use row 0).
// Returns the number of bytes written to out (<= out_cap), or -1 on overflow
// / invalid symbol.
int64_t rans_encode(const int32_t *symbols, int64_t n, const uint32_t *cdfs,
                    int64_t L, const int32_t *row_idx, int32_t n_states_i,
                    uint8_t *out, int64_t out_cap) {
  std::vector<EncSym> scratch;
  // n_rows is not part of this legacy signature; derive a safe reuse bound
  // from the row indices only when amortization is plausible.
  int64_t n_rows = 1;
  if (row_idx) {
    for (int64_t i = 0; i < n; ++i)
      if (static_cast<int64_t>(row_idx[i]) >= n_rows)
        n_rows = static_cast<int64_t>(row_idx[i]) + 1;
  }
  return encode_stream(symbols, n, cdfs, L, n_rows, row_idx,
                       clamp_states(n_states_i), scratch, out, out_cap);
}

// Decode n symbols. n_rows = number of CDF rows in cdfs (used to size the
// slot->symbol LUT; pass 1 when row_idx is NULL). Returns 0 on success,
// -1 on malformed input.
int64_t rans_decode(const uint8_t *in, int64_t in_len, const uint32_t *cdfs,
                    int64_t L, const int32_t *row_idx, int64_t n_rows,
                    int32_t n_states_i, int32_t *out_symbols, int64_t n) {
  return decode_stream(in, in_len, cdfs, L, n_rows, row_idx,
                       clamp_states(n_states_i), out_symbols, n);
}

// --- batch API -------------------------------------------------------------
//
// B independent streams in one call (one per image). Layout:
//   symbols: concatenated planes; stream i = [sym_off[i], sym_off[i+1]).
//            u8 plane when sym_is_u8 != 0 (the y wire format), else int32.
//   cdfs:    concatenated uint32 words; stream i's table starts at word
//            cdf_off[i] and holds n_rows rows of length Ls[i] + 1.
//   row_idx: ONE shared per-element row map (length = max stream length;
//            all streams in a batch have equal shapes in practice). NULL =>
//            row 0 for every symbol.
//   out:     stream i writes at [i * out_stride, ...); out_len[i] = bytes.
// Returns 0, or -1 on any stream failure (out_len[i] = -1 marks which).
int64_t rans_encode_batch(const void *symbols, int32_t sym_is_u8,
                          const int64_t *sym_off, int64_t B,
                          const uint32_t *cdfs, const int64_t *cdf_off,
                          const int32_t *Ls, int64_t n_rows,
                          const int32_t *row_idx, int32_t n_states_i,
                          uint8_t *out, int64_t out_stride,
                          int64_t *out_len) {
  const int n_states = clamp_states(n_states_i);
  std::vector<EncSym> scratch;
  int64_t rc = 0;
  for (int64_t i = 0; i < B; ++i) {
    const int64_t lo = sym_off[i], n = sym_off[i + 1] - lo;
    const uint32_t *tab = cdfs + cdf_off[i];
    int64_t got;
    if (sym_is_u8) {
      got = encode_stream(static_cast<const uint8_t *>(symbols) + lo, n, tab,
                          Ls[i], n_rows, row_idx, n_states, scratch,
                          out + i * out_stride, out_stride);
    } else {
      got = encode_stream(static_cast<const int32_t *>(symbols) + lo, n, tab,
                          Ls[i], n_rows, row_idx, n_states, scratch,
                          out + i * out_stride, out_stride);
    }
    out_len[i] = got;
    if (got < 0) rc = -1;
  }
  return rc;
}

// Batch decode: stream i's payload at in + in_off[i], length
// in_off[i+1] - in_off[i]; symbols written to out at [sym_off[i], ...).
// out is u8 when sym_is_u8 != 0 (requires Ls[i] <= 256), else int32.
int64_t rans_decode_batch(const uint8_t *in, const int64_t *in_off, int64_t B,
                          const uint32_t *cdfs, const int64_t *cdf_off,
                          const int32_t *Ls, int64_t n_rows,
                          const int32_t *row_idx, int32_t n_states_i,
                          void *out, int32_t sym_is_u8,
                          const int64_t *sym_off) {
  const int n_states = clamp_states(n_states_i);
  for (int64_t i = 0; i < B; ++i) {
    const int64_t lo = sym_off[i], n = sym_off[i + 1] - lo;
    if (sym_is_u8 && Ls[i] > 256) return -1;
    const uint32_t *tab = cdfs + cdf_off[i];
    int64_t rc;
    if (sym_is_u8) {
      rc = decode_stream(in + in_off[i], in_off[i + 1] - in_off[i], tab,
                         Ls[i], n_rows, row_idx, n_states,
                         static_cast<uint8_t *>(out) + lo, n);
    } else {
      rc = decode_stream(in + in_off[i], in_off[i + 1] - in_off[i], tab,
                         Ls[i], n_rows, row_idx, n_states,
                         static_cast<int32_t *>(out) + lo, n);
    }
    if (rc != 0) return -1;
  }
  return 0;
}

// Upper bound on the encoded size for n symbols (worst case ~32 bits/symbol
// plus state flush).
int64_t rans_max_bytes(int64_t n, int32_t n_states) {
  return 4 * (n + 4) + 8 * (n_states < 1 ? 1 : n_states);
}

}  // extern "C"
