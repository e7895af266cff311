// Native host runtime for parfastaai_tpu: the C++/OpenMP pieces of the
// pipeline that stay on the host CPU next to the TPU compute path.
//
// The reference implements its entire hot path in C++/OpenMP
// (include/pfaai/ds_helper.hpp, algorithm_impl.hpp); in this framework the
// O(G^2) work lives on the TPU and only two host loops remain hot:
//
//   * jaccard_finish_f64 — the exact-parity f64 finish: for each genome pair,
//     accumulate S += cnt / (T_A + T_B - cnt) and N += [cnt > 0] over
//     proteins in ascending index order — the reference's E-block walk order
//     (E sorted by (G_A, G_B, proteinIndex), interface.hpp:103-111;
//     accumulation loop algorithm_impl.hpp:240-271).  Sequential-in-p per
//     pair => bit-for-bit f64 parity; OpenMP across pairs (pairs are
//     independent, matching the reference's pair distribution,
//     algorithm_impl.hpp:100-120).
//
//   * unpack_presence — ETL scatter of the SQLite '{SCP}_tetras' genome-id
//     blobs into the dense genome x tetramer presence matrix (the TPU-native
//     replacement for constructF, ds_helper.hpp:126-162).
//
// Exposed with C linkage for ctypes (no pybind11 in this environment).

#include <cstdint>

extern "C" {

// counts: (P, n) int32 row-major; ta/tb: (P, n) int32 — T[p, denom_a/b[i]]
// already gathered per pair.  Outputs s (n) f64 and nshared (n) int32.
void jaccard_finish_f64(const int32_t* counts, const int32_t* ta,
                        const int32_t* tb, int64_t P, int64_t n, double* s,
                        int32_t* nshared) {
#pragma omp parallel for schedule(static)
  for (int64_t i = 0; i < n; ++i) {
    double acc = 0.0;
    int32_t cnt_shared = 0;
    for (int64_t p = 0; p < P; ++p) {
      const int64_t idx = p * n + i;
      const int32_t c = counts[idx];
      if (c > 0) {
        acc += static_cast<double>(c) /
               static_cast<double>(static_cast<int64_t>(ta[idx]) + tb[idx] - c);
        ++cnt_shared;
      }
    }
    s[i] = acc;
    nshared[i] = cnt_shared;
  }
}

// gids: concatenated int32 genome-id blobs of one protein's '_tetras' rows
// (column-major concatenation: column j owns gids[col_offsets[j] ..
// col_offsets[j+1])).  Writes m[g * K + j] = 1 for each id g in column j.
void unpack_presence(const int32_t* gids, const int64_t* col_offsets,
                     int64_t ncols, uint8_t* m, int64_t K) {
#pragma omp parallel for schedule(static)
  for (int64_t j = 0; j < ncols; ++j) {
    for (int64_t k = col_offsets[j]; k < col_offsets[j + 1]; ++k) {
      m[static_cast<int64_t>(gids[k]) * K + j] = 1;
    }
  }
}

}  // extern "C"
