// Native minimizer-index lookup: open-addressing hash table over the unique
// minimizer hashes, replacing a 25-deep random-access binary search per query
// (the dominant host cost of anchor collection at chromosome scale).
//
// The table stores an int64 row index into the index's unique-hash arrays;
// empty slots hold EMPTY. Keys are already avalanched (splitmix-style
// finalizer in the sketcher), so the low bits index directly.

#include <cstdint>

namespace {
constexpr uint64_t kEmpty = 0xFFFFFFFFFFFFFFFFull;  // never a minimizer hash
}

extern "C" {

// Build the probe table. table_keys/table_vals have size 1 << log2_size and
// must be pre-filled with kEmpty / -1 by the caller.
void index_build(const uint64_t* uniq_hashes, int64_t n_uniq,
                 uint64_t* table_keys, int64_t* table_vals, int32_t log2_size) {
    const uint64_t mask = (1ull << log2_size) - 1;
    for (int64_t i = 0; i < n_uniq; ++i) {
        uint64_t slot = uniq_hashes[i] & mask;
        while (table_keys[slot] != kEmpty) slot = (slot + 1) & mask;
        table_keys[slot] = uniq_hashes[i];
        table_vals[slot] = i;
    }
}

// Pass 1: per-query hit counts (0 when absent or count > max_occ) plus the
// resolved flat start row, so pass 2 never touches the probe table again
// (halves the random-access volume of anchor collection).
void index_count(const uint64_t* table_keys, const int64_t* table_vals,
                 int32_t log2_size, const int64_t* uniq_counts,
                 const int64_t* uniq_starts,
                 const uint64_t* qh, int64_t nq, int64_t max_occ,
                 int64_t* out_counts, int64_t* out_starts) {
    const uint64_t mask = (1ull << log2_size) - 1;
    // Each probe is a random access into a table far larger than L2; issuing
    // the next queries' first-slot loads ahead hides most of the miss
    // latency (queries are independent).
    constexpr int64_t kPD = 16;
    for (int64_t i = 0; i < nq; ++i) {
        if (i + kPD < nq) {
            const uint64_t ps = qh[i + kPD] & mask;
            __builtin_prefetch(&table_keys[ps]);
            __builtin_prefetch(&table_vals[ps]);
        }
        const uint64_t h = qh[i];
        uint64_t slot = h & mask;
        int64_t row = -1;
        while (true) {
            const uint64_t key = table_keys[slot];
            if (key == h) { row = table_vals[slot]; break; }
            if (key == kEmpty) break;
            slot = (slot + 1) & mask;
        }
        int64_t c = row >= 0 ? uniq_counts[row] : 0;
        const bool keep = c > 0 && c <= max_occ;
        out_counts[i] = keep ? c : 0;
        out_starts[i] = keep ? uniq_starts[row] : -1;
    }
}

// Pass 2: fill hit rows. out_offsets = exclusive prefix sum of out_counts;
// out_qidx/out_flat sized to the total; starts resolved by pass 1. flat =
// index into the index's hash-sorted chrom/pos/strand arrays.
void index_fill(const int64_t* starts, int64_t nq,
                const int64_t* out_counts, const int64_t* out_offsets,
                int64_t* out_qidx, int64_t* out_flat) {
    for (int64_t i = 0; i < nq; ++i) {
        const int64_t c = out_counts[i];
        if (c == 0) continue;
        const int64_t start = starts[i];
        int64_t o = out_offsets[i];
        for (int64_t j = 0; j < c; ++j) {
            out_qidx[o + j] = i;
            out_flat[o + j] = start + j;
        }
    }
}

// Pass 2 (fused): emit complete anchor rows — strand-transformed query
// position, reference position, chromosome, and relative orientation — so the
// host skips four 30M-element numpy passes per chromosome-scale contig.
// Start rows come resolved from pass 1 (out_starts); no table probes here.
// Outputs are int32 (contigs and chromosomes < 2 Gbp): halves the write
// traffic of the largest transient arrays in planning.
void index_fill_anchors(const int64_t* starts, const int64_t* qpos,
                        const int8_t* qstrand, int64_t nq, int64_t qlen,
                        int32_t k, const int64_t* counts,
                        const int64_t* offsets, const int32_t* idx_chrom,
                        const int64_t* idx_pos, const int8_t* idx_strand,
                        int32_t* out_qpos, int32_t* out_rpos,
                        int32_t* out_chrom, uint8_t* out_rev) {
    constexpr int64_t kPD = 16;
    for (int64_t i = 0; i < nq; ++i) {
        if (i + kPD < nq && counts[i + kPD] != 0) {
            const int64_t ps = starts[i + kPD];
            __builtin_prefetch(&idx_pos[ps]);
            __builtin_prefetch(&idx_chrom[ps]);
            __builtin_prefetch(&idx_strand[ps]);
        }
        const int64_t c = counts[i];
        if (c == 0) continue;
        const int64_t start = starts[i];
        const int64_t qp = qpos[i];
        const int8_t qs = qstrand[i];
        int64_t o = offsets[i];
        for (int64_t j = 0; j < c; ++j) {
            const int64_t flat = start + j;
            const uint8_t rev = idx_strand[flat] != qs;
            out_qpos[o + j] = static_cast<int32_t>(rev ? qlen - qp - k : qp);
            out_rpos[o + j] = static_cast<int32_t>(idx_pos[flat]);
            out_chrom[o + j] = idx_chrom[flat];
            out_rev[o + j] = rev;
        }
    }
}

}  // extern "C"
