// tpuseg native sparsity library.
//
// C++ implementations of the mask-generation hot loops and sparse-format
// packing. The reference delegated its sparse execution to external CUDA
// kernels fed by text dumps (SURVEY.md §2.2 native-code ledger); on TPU the
// execution lives in XLA/Pallas, and this library covers the host-side
// runtime work around it: scoring/pruning loops that are Python-slow for
// large layers and config sweeps, and BSR packing for the Pallas kernel.
//
// Semantics mirror tpuseg/sparsity/{block,rmb}.py exactly (which in turn
// mirror /root/reference/pruners/); parity is enforced by
// tests/test_native.py.
//
// Build: python -m tpuseg.native_build   (g++ -O3 -shared -fPIC)

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

extern "C" {

// Per-block |sum| meta matrix with ceil-padded edges.
// mat: (rows, cols) row-major f32; out: (nrb, ncb) f64.
void block_abs_sums(const float* mat, int64_t rows, int64_t cols, int64_t bh,
                    int64_t bw, double* out) {
  const int64_t nrb = (rows + bh - 1) / bh;
  const int64_t ncb = (cols + bw - 1) / bw;
  std::memset(out, 0, sizeof(double) * nrb * ncb);
  for (int64_t r = 0; r < rows; ++r) {
    const int64_t rb = r / bh;
    const float* row = mat + r * cols;
    double* orow = out + rb * ncb;
    for (int64_t c = 0; c < cols; ++c) {
      orow[c / bw] += std::fabs(static_cast<double>(row[c]));
    }
  }
}

// Magnitude block pruning (base case of BlockPruner.prune_tensor_as_block):
// keep blocks whose |sum| is strictly greater than the k-th smallest where
// k = max(0, int(sparsity * nblocks) - 1).  mask out: (rows, cols) f32 0/1.
void prune_block_mask(const float* mat, int64_t rows, int64_t cols,
                      int64_t bh, int64_t bw, double sparsity, float* mask) {
  const int64_t nrb = (rows + bh - 1) / bh;
  const int64_t ncb = (cols + bw - 1) / bw;
  if (sparsity <= 0.0) {
    std::fill(mask, mask + rows * cols, 1.0f);
    return;
  }
  std::vector<double> meta(nrb * ncb);
  if (bh == 1 && bw == 1) {
    for (int64_t i = 0; i < rows * cols; ++i)
      meta[i] = static_cast<double>(mat[i]);
  } else {
    block_abs_sums(mat, rows, cols, bh, bw, meta.data());
  }
  std::vector<double> sorted(meta.size());
  for (size_t i = 0; i < meta.size(); ++i) sorted[i] = std::fabs(meta[i]);
  int64_t k = static_cast<int64_t>(sparsity * (double)meta.size()) - 1;
  if (k < 0) k = 0;
  std::nth_element(sorted.begin(), sorted.begin() + k, sorted.end());
  const double thresh = sorted[k];
  std::memset(mask, 0, sizeof(float) * rows * cols);
  for (int64_t rb = 0; rb < nrb; ++rb) {
    for (int64_t cb = 0; cb < ncb; ++cb) {
      if (std::fabs(meta[rb * ncb + cb]) > thresh) {
        const int64_t r0 = rb * bh, r1 = std::min(rows, (rb + 1) * bh);
        const int64_t c0 = cb * bw, c1 = std::min(cols, (cb + 1) * bw);
        for (int64_t r = r0; r < r1; ++r)
          std::fill(mask + r * cols + c0, mask + r * cols + c1, 1.0f);
      }
    }
  }
}

// RMB pruning (RmbPruner.prune_tensor_as_rmb semantics).
// mat is modified in place (claimed blocklets zeroed), mask written 0/1.
// blocklets described by (bl_bh[i], bl_bw[i], bl_count[i]) x n_types.
// Outer sparsity spo: per row-block keep blocks with score strictly above
// the k-th smallest in that row (k = int(spo*ncb) - 1).
void rmb_prune(float* mat, int64_t rows, int64_t cols, int64_t bh, int64_t bw,
               double spo, const int64_t* bl_bh, const int64_t* bl_bw,
               const int64_t* bl_count, int64_t n_types, float* mask) {
  const int64_t nrb = rows / bh;
  const int64_t ncb = cols / bw;
  std::memset(mask, 0, sizeof(float) * rows * cols);

  std::vector<uint8_t> keep(nrb * ncb, 1);
  if (spo > 0.0) {
    std::vector<double> meta(nrb * ncb);
    // |mat| fast path only when BOTH block dims are 1 (meta is nrb*ncb;
    // with e.g. bh=2,bw=1 the old `||` gate wrote rows*cols elements —
    // heap overflow — and mis-scored blocks)
    if (bh == 1 && bw == 1) {
      for (int64_t i = 0; i < rows * cols; ++i)
        meta[i] = std::fabs(static_cast<double>(mat[i]));
    } else {
      block_abs_sums(mat, rows, cols, bh, bw, meta.data());
    }
    const int64_t k = static_cast<int64_t>(spo * (double)ncb) - 1;
    if (k >= 0) {
      std::vector<double> rowbuf(ncb);
      for (int64_t rb = 0; rb < nrb; ++rb) {
        for (int64_t cb = 0; cb < ncb; ++cb)
          rowbuf[cb] = std::fabs(meta[rb * ncb + cb]);
        std::vector<double> sorted(rowbuf);
        std::nth_element(sorted.begin(), sorted.begin() + k, sorted.end());
        const double thresh = sorted[k];
        for (int64_t cb = 0; cb < ncb; ++cb)
          if (meta[rb * ncb + cb] <= thresh) keep[rb * ncb + cb] = 0;
      }
    }
  }

  for (int64_t rb = 0; rb < nrb; ++rb) {
    for (int64_t cb = 0; cb < ncb; ++cb) {
      if (!keep[rb * ncb + cb]) continue;
      float* loc = mat + (rb * bh) * cols + cb * bw;  // strided (bh, bw)
      for (int64_t t = 0; t < n_types; ++t) {
        const int64_t tbh = bl_bh[t], tbw = bl_bw[t];
        const int64_t bl_nrb = bh / tbh, bl_ncb = bw / tbw;
        for (int64_t rep = 0; rep < bl_count[t]; ++rep) {
          for (int64_t brb = 0; brb < bl_nrb; ++brb) {
            // score each blocklet column by |sum|
            double best = -1.0;
            int64_t best_cb = 0;
            for (int64_t bcb = 0; bcb < bl_ncb; ++bcb) {
              double s = 0.0;
              for (int64_t r = 0; r < tbh; ++r) {
                const float* p = loc + (brb * tbh + r) * cols + bcb * tbw;
                for (int64_t c = 0; c < tbw; ++c)
                  s += std::fabs(static_cast<double>(p[c]));
              }
              if (s > best) {
                best = s;
                best_cb = bcb;
              }
            }
            // claim it: zero values, set mask
            for (int64_t r = 0; r < tbh; ++r) {
              float* p = loc + (brb * tbh + r) * cols + best_cb * tbw;
              float* m = mask + ((rb * bh) + brb * tbh + r) * cols +
                         cb * bw + best_cb * tbw;
              for (int64_t c = 0; c < tbw; ++c) {
                p[c] = 0.0f;
                m[c] = 1.0f;
              }
            }
          }
        }
      }
    }
  }
}

// BSR packing: given a (rows, cols) f32 masked weight matrix and block
// shape, emit rowptr (nrb+1), colidx (<= nrb*ncb) and packed value tiles
// (nnzb, bm, bk).  Returns nnzb.  Caller allocates worst-case buffers.
int64_t bsr_pack(const float* wm, int64_t rows, int64_t cols, int64_t bm,
                 int64_t bk, int32_t* rowptr, int32_t* colidx, float* vals) {
  const int64_t nrb = rows / bm;
  const int64_t ncb = cols / bk;
  int64_t nnzb = 0;
  rowptr[0] = 0;
  for (int64_t rb = 0; rb < nrb; ++rb) {
    for (int64_t cb = 0; cb < ncb; ++cb) {
      bool any = false;
      for (int64_t r = 0; r < bm && !any; ++r) {
        const float* p = wm + (rb * bm + r) * cols + cb * bk;
        for (int64_t c = 0; c < bk; ++c)
          if (p[c] != 0.0f) {
            any = true;
            break;
          }
      }
      if (any) {
        colidx[nnzb] = static_cast<int32_t>(cb);
        float* dst = vals + nnzb * bm * bk;
        for (int64_t r = 0; r < bm; ++r)
          std::memcpy(dst + r * bk, wm + (rb * bm + r) * cols + cb * bk,
                      sizeof(float) * bk);
        ++nnzb;
      }
    }
    rowptr[rb + 1] = static_cast<int32_t>(nnzb);
  }
  return nnzb;
}

}  // extern "C"
