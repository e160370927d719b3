// Native host runtime: diagonal-scan RLE entropy coding + residual-line
// serialization.
//
// The TPU device produces fixed-shape quantized-coefficient arrays; turning
// them into the reference's variable-length text bitstream (entropy_encoder_
// frame, Encoder.py:1522-1542, RLE per block Encoder.py:1086-1131) is pure
// host work and the slowest non-device stage of the pipeline when done in
// Python.  This translation unit emits the exact same bytes the Python twin
// (streamoptima_tpu/bitstream.py) produces, including the numpy>=2
// "np.int64(v)" scalar reprs the reference's file format exhibits.
//
// Built by streamoptima_tpu/native/__init__.py with g++ -O3 at first import;
// all entry points are plain C ABI for ctypes.

#include <cstdint>
#include <cstring>
#include <vector>

namespace {

// Diagonal (anti-diagonal raster) visit order, the k-loop of
// Encoder.py:1086-1131: start (0,k) for k<n else (k-n+1, n-1), walk
// down-left.  Flat indices into a row-major n*n block.
std::vector<int32_t> diag_indices(int n) {
  std::vector<int32_t> order;
  order.reserve(n * n);
  for (int k = 0; k < 2 * n - 1; ++k) {
    int i = k < n ? 0 : k - n + 1;
    int j = k < n ? k : n - 1;
    while (i < n && j >= 0) {
      order.push_back(i * n + j);
      ++i;
      --j;
    }
  }
  return order;
}

struct Writer {
  char* buf;
  int64_t cap;
  int64_t len = 0;
  bool overflow = false;

  inline void put(char c) {
    if (len >= cap) { overflow = true; return; }
    buf[len++] = c;
  }
  inline void puts(const char* s) {
    while (*s) put(*s++);
  }
  inline void put_int(int64_t v) {
    char tmp[24];
    int t = 0;
    bool neg = v < 0;
    uint64_t u = neg ? (uint64_t)(-(v + 1)) + 1 : (uint64_t)v;
    do { tmp[t++] = '0' + (char)(u % 10); u /= 10; } while (u);
    if (neg) put('-');
    while (t) put(tmp[--t]);
  }
};

// RLE-encode one block's diagonal sequence and append its Python-list text
// ("[a, b, c]"); values wrapped as np.int64(v) when numpy_repr (run headers
// and zero counts stay plain, matching rle_encode_block in core/zigzag.py).
void emit_block(Writer& w, const int64_t* block, const std::vector<int32_t>& idx,
                bool numpy_repr) {
  const int total = (int)idx.size();
  w.put('[');
  bool first = true;
  auto sep = [&]() {
    if (!first) w.puts(", ");
    first = false;
  };
  int run_start = -1;  // start of current nonzero run in seq order
  int run_len = 0;
  int zero_count = 0;
  bool emitted_nonzero = false;
  // local copy of the sequence values for the pending nonzero run
  std::vector<int64_t> run_vals;
  run_vals.reserve(total);
  for (int s = 0; s < total; ++s) {
    int64_t v = block[idx[s]];
    if (v != 0) {
      if (run_vals.empty() && zero_count) {
        sep();
        w.put_int(zero_count);
        zero_count = 0;
      }
      run_vals.push_back(v);
    } else {
      if (!run_vals.empty()) {
        sep();
        w.put_int(-(int64_t)run_vals.size());
        for (int64_t rv : run_vals) {
          w.puts(", ");
          if (numpy_repr) { w.puts("np.int64("); w.put_int(rv); w.put(')'); }
          else w.put_int(rv);
        }
        run_vals.clear();
        emitted_nonzero = true;
      }
      ++zero_count;
    }
  }
  if (!run_vals.empty()) {
    sep();
    w.put_int(-(int64_t)run_vals.size());
    for (int64_t rv : run_vals) {
      w.puts(", ");
      if (numpy_repr) { w.puts("np.int64("); w.put_int(rv); w.put(')'); }
      else w.put_int(rv);
    }
    emitted_nonzero = true;
  }
  if (zero_count) {
    sep();
    w.put('0');
  }
  (void)run_start; (void)run_len; (void)emitted_nonzero;
  w.put(']');
}

}  // namespace

extern "C" {

// Serialize one frame's residual line (entropy_encoder_frame twin).
//   qtc_full:  nb * bs * bs  int64 (row-major blocks)
//   qtc_quads: nb * 4 * sbs * sbs int64 (sbs = bs/2, Z-order quads)
//   split:     nb bytes (0 = full block, 1 = quads)
// Writes into out[0..cap); returns bytes written, or -1 on overflow.
int64_t encode_residual_line(const int64_t* qtc_full, const int64_t* qtc_quads,
                             const uint8_t* split, int64_t nb, int32_t bs,
                             int32_t numpy_repr, char* out, int64_t cap) {
  const int sbs = bs / 2;
  const std::vector<int32_t> idx_full = diag_indices(bs);
  const std::vector<int32_t> idx_sub = diag_indices(sbs);
  Writer w{out, cap};
  for (int64_t i = 0; i < nb; ++i) {
    if (i) w.put(';');
    if (split[i] == 0) {
      w.puts("0'(");
      emit_block(w, qtc_full + i * bs * bs, idx_full, numpy_repr);
      w.put(')');
    } else {
      w.puts("1'(");
      for (int q = 0; q < 4; ++q) {
        if (q) w.put(',');
        emit_block(w, qtc_quads + ((i * 4) + q) * sbs * sbs, idx_sub, numpy_repr);
      }
      w.put(')');
    }
    if (w.overflow) return -1;
  }
  return w.overflow ? -1 : w.len;
}

// Batch RLE encode: concatenated encoded lists + per-block offsets.
//   blocks: nblocks * n * n int64.  out sized >= nblocks * (2*n*n + 1).
//   offsets: nblocks + 1 entries.  Returns total encoded length.
int64_t rle_encode_blocks(const int64_t* blocks, int64_t nblocks, int32_t n,
                          int64_t* out, int64_t* offsets) {
  const std::vector<int32_t> idx = diag_indices(n);
  const int total = n * n;
  int64_t pos = 0;
  std::vector<int64_t> run_vals;
  run_vals.reserve(total);
  for (int64_t b = 0; b < nblocks; ++b) {
    offsets[b] = pos;
    const int64_t* blk = blocks + b * total;
    run_vals.clear();
    int zero_count = 0;
    for (int s = 0; s < total; ++s) {
      int64_t v = blk[idx[s]];
      if (v != 0) {
        if (run_vals.empty() && zero_count) {
          out[pos++] = zero_count;
          zero_count = 0;
        }
        run_vals.push_back(v);
      } else {
        if (!run_vals.empty()) {
          out[pos++] = -(int64_t)run_vals.size();
          for (int64_t rv : run_vals) out[pos++] = rv;
          run_vals.clear();
        }
        ++zero_count;
      }
    }
    if (!run_vals.empty()) {
      out[pos++] = -(int64_t)run_vals.size();
      for (int64_t rv : run_vals) out[pos++] = rv;
    }
    if (zero_count) out[pos++] = 0;
  }
  offsets[nblocks] = pos;
  return pos;
}

// Batch RLE decode (entropy_decoder_block twin, decoder.py:548-586).
//   data/offsets as produced above; out_blocks: nblocks * n * n int64 zeroed
//   by the callee.
void rle_decode_blocks(const int64_t* data, const int64_t* offsets,
                       int64_t nblocks, int32_t n, int64_t* out_blocks) {
  const std::vector<int32_t> idx = diag_indices(n);
  const int total = n * n;
  for (int64_t b = 0; b < nblocks; ++b) {
    int64_t* blk = out_blocks + b * total;
    std::memset(blk, 0, sizeof(int64_t) * total);
    int64_t i = offsets[b];
    const int64_t end = offsets[b + 1];
    int s = 0;
    while (i < end && s < total) {
      int64_t c = data[i];
      if (c < 0) {
        for (int64_t k = 0; k < -c && s < total; ++k)
          blk[idx[s++]] = data[i + 1 + k];
        i += -c;
      } else {
        if (c == 0) break;
        s += (int)c;  // run of zeros (already zeroed)
      }
      ++i;
    }
  }
}

}  // extern "C"
