// Native minimizer sketching: rolling 2-bit k-mers, canonical-strand hashing,
// and monotonic-deque window minima in one pass over the sequence.
//
// Replaces the numpy multi-pass pipeline (k shift-or passes + window filters)
// for the host seeding stage; ~50x fewer memory passes. Semantics match
// pav_tpu.align.aligner.index.minimizers: windows touching ambiguous bases
// never win; a position is emitted when it is the minimum of at least one
// window (ties emit all tying positions).
//
// Build: part of libpavchain.so (see pav_tpu/native.py).

#include <cstdint>
#include <vector>

namespace {

inline uint64_t mix64(uint64_t x) {
    x ^= x >> 33;
    x *= 0xFF51AFD7ED558CCDULL;
    x ^= x >> 33;
    x *= 0xC4CEB9FE1A85EC53ULL;
    x ^= x >> 33;
    return x;
}

}  // namespace

extern "C" {

// Returns the number of minimizers written. Output arrays must have room for
// n entries (callers allocate n-sized buffers; actual count ~2n/(w+1)).
int64_t minimizer_sketch(const uint8_t* codes, int64_t n, int32_t k, int32_t w,
                         int64_t* out_pos, uint64_t* out_hash,
                         uint8_t* out_strand) {
    if (n < k) return 0;
    const int64_t n_kmers = n - k + 1;
    const uint64_t mask = (k < 32) ? ((1ULL << (2 * k)) - 1) : ~0ULL;
    const int shift_rc = 2 * (k - 1);

    // Rolling window of (hash, pos, strand) as a monotonic deque of indices
    // into ring buffers.
    std::vector<uint64_t> ring_hash(w);
    std::vector<int64_t> ring_pos(w);
    std::vector<uint8_t> ring_strand(w);
    std::vector<int32_t> deque_idx(w + 1);
    int dq_head = 0, dq_tail = 0;  // [head, tail)
    const int dq_cap = w + 1;
    // Conditional wraps instead of modulo: %w / %(w+1) are div-unit ops and
    // this loop runs once per base of a multi-Gbp genome.
    auto wrap_inc = [dq_cap](int x) { ++x; return x == dq_cap ? 0 : x; };
    auto wrap_dec = [dq_cap](int x) { return x == 0 ? dq_cap - 1 : x - 1; };

    uint64_t fwd = 0, rc = 0;
    int64_t valid_run = 0;  // consecutive unambiguous bases ending here
    int64_t count = 0;
    int64_t last_emitted_pos = -1;
    int slot = 0;           // ring slot of the current kpos (kpos % w)

    for (int64_t i = 0; i < n; ++i) {
        const uint8_t c = codes[i];
        if (c < 4) {
            fwd = ((fwd << 2) | c) & mask;
            rc = (rc >> 2) | (static_cast<uint64_t>(3 - c) << shift_rc);
            ++valid_run;
        } else {
            fwd = 0; rc = 0; valid_run = 0;
        }

        const int64_t kpos = i - k + 1;  // k-mer start position
        if (kpos < 0) continue;

        uint64_t h;
        uint8_t strand;
        if (valid_run >= k) {
            const uint64_t canon = fwd < rc ? fwd : rc;
            strand = rc < fwd ? 1 : 0;
            h = mix64(canon);
        } else {
            h = ~0ULL;  // invalid window: never wins
            strand = 0;
        }

        // Pop stale entries BEFORE the ring slot is overwritten below (the
        // slot being written is exactly the one whose entry leaves the window).
        while (dq_head != dq_tail
               && ring_pos[deque_idx[dq_head]] <= kpos - w) {
            dq_head = wrap_inc(dq_head);
        }

        ring_hash[slot] = h;
        ring_pos[slot] = kpos;
        ring_strand[slot] = strand;
        // Maintain monotonic increasing hash from front to back; keep ties so
        // every tying position can be emitted.
        while (dq_head != dq_tail) {
            const int back = wrap_dec(dq_tail);
            if (ring_hash[deque_idx[back]] > h) {
                dq_tail = back;
            } else {
                break;
            }
        }
        deque_idx[dq_tail] = slot;
        dq_tail = wrap_inc(dq_tail);
        ++slot;
        if (slot == w) slot = 0;

        // Emit window minima once a full window exists.
        if (kpos >= w - 1) {
            // All deque entries from the front with the minimal hash.
            const uint64_t min_h = ring_hash[deque_idx[dq_head]];
            if (min_h != ~0ULL) {
                for (int it = dq_head; it != dq_tail; it = wrap_inc(it)) {
                    const int s = deque_idx[it];
                    if (ring_hash[s] != min_h) break;
                    if (ring_pos[s] > last_emitted_pos) {
                        out_pos[count] = ring_pos[s];
                        out_hash[count] = min_h;
                        out_strand[count] = ring_strand[s];
                        ++count;
                        last_emitted_pos = ring_pos[s];
                    }
                }
            }
        }
    }
    return count;
}

}  // extern "C"
