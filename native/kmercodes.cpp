// Rolling 2-bit k-mer extraction with ambiguity validity mask.
//
// Replaces the numpy k-pass shift-or loop (pav_tpu/kmer.py kmer_codes
// fallback): one pass over the sequence instead of k full-array passes —
// the dominant host cost of the inversion density scans on repeat-rich
// input (hundreds of ref_kmer_set calls per haplotype).
//
// Semantics match the numpy fallback exactly: ambiguous bases (code > 3)
// contribute 0 bits to the rolling value, and every window covering one is
// marked invalid.
//
// Build: part of libpavnative.so (see pav_tpu/native.py).

#include <cstdint>

extern "C" {

void kmer_codes(const uint8_t* codes, int64_t n, int32_t k,
                uint64_t* out_kmers, uint8_t* out_valid) {
    const int64_t n_kmers = n - k + 1;
    if (n_kmers <= 0) return;
    const uint64_t mask = (k < 32) ? ((1ULL << (2 * k)) - 1) : ~0ULL;

    uint64_t fwd = 0;
    int64_t valid_run = 0;  // consecutive unambiguous bases ending at i
    for (int64_t i = 0; i < n; ++i) {
        const uint8_t c = codes[i];
        if (c < 4) {
            fwd = ((fwd << 2) | c) & mask;
            ++valid_run;
        } else {
            fwd = (fwd << 2) & mask;  // ambiguous base contributes 0 bits
            valid_run = 0;
        }
        const int64_t kpos = i - k + 1;
        if (kpos < 0) continue;
        out_kmers[kpos] = fwd;
        out_valid[kpos] = valid_run >= k ? 1 : 0;
    }
}

}  // extern "C"
